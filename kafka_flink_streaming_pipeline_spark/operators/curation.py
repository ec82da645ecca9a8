"""End-to-end training-data curation pipeline — the operators composed
the way a real 100 TB curation run chains them:

    corpus → exact dedup (fingerprint keepers)
           → quality scoring (token/stopword heuristics)
           → quality threshold filter
           → curated output (id, fingerprint, token count, score)

Each stage is the already-oracle-checked operator (operators/dedup.py,
operators/text.py); this plan proves they compose into one Catalyst
plan — one scan of the corpus feeds both the fingerprint aggregation
and the quality projection, the join keys on the deduped keeper ids,
and the filter lands before the join's probe side. No Python anywhere.

At scale: dedup's groupBy(fingerprint) is the only wide stage; quality
scoring is scan-side expressions; the keeper join is a self-join on
doc_id that AQE turns into a broadcast once the dedup side has been
reduced. Late-stage ops (near-dup LSH, embedding filters) slot in as
further joins on the same keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.operators.dedup import dedup_exact
from kafka_flink_streaming_pipeline_spark.operators.text import quality_scores
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec

_QUALITY_T = 0.25


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    keepers = dedup_exact(spark, sf_dir).select(
        "fingerprint", F.col("keeper_doc_id").alias("doc_id"), "n_copies"
    )
    quality = quality_scores(spark, sf_dir).select(
        "doc_id", "n_tokens", "quality_score"
    )
    return (
        keepers.join(quality, "doc_id")
        .filter(F.col("quality_score") >= _QUALITY_T)
        .select("doc_id", "fingerprint", "n_copies", "n_tokens", "quality_score")
    )  # unsorted: curated output is corpus-sized at scale


_CURATION_ORACLE = f"""
WITH keepers AS (
  SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
         min(doc_id) AS doc_id,
         count(*) AS n_copies
  FROM documents
  GROUP BY fingerprint
),
quality AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '[a-z0-9]+')) AS n_tokens,
         length(regexp_extract_all(text, '\\b(the|a|of|and|to|in|is|it)\\b')) AS n_stops
  FROM documents
),
scored AS (
  SELECT doc_id, n_tokens,
         round((1.0 - coalesce(round(CAST(n_stops AS DOUBLE) / nullif(n_tokens, 0), 6), 1.0))
               * CAST(least(n_tokens, 200) AS DOUBLE) / 200.0, 6) AS quality_score
  FROM quality
)
SELECT k.doc_id, k.fingerprint, k.n_copies, s.n_tokens, s.quality_score
FROM keepers k JOIN scored s USING (doc_id)
WHERE s.quality_score >= {_QUALITY_T}
ORDER BY k.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "curation_pipeline": QuerySpec(
        "curation_pipeline",
        curation_pipeline,
        _CURATION_ORACLE,
        "composed dedup → quality → filter curation run",
    ),
}
