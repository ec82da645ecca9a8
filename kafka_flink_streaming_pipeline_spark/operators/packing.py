"""Sequence-shaping operators for LLM training-data preparation:
chunking, sequence packing, and eval-set decontamination.

Three steps every large-scale training pipeline runs between "curated
corpus" and "tokenized batches", expressed as pure Catalyst plans (no
Python in the row path, every output column integer or md5 hex — no
float contract at all):

- `corpus_chunk_windows`: overlapping fixed-size word windows per doc
  (the retrieval/embedding chunker). Map-side only: sequence +
  transform + slice on the pre-split words array, zero shuffles.
- `corpus_pack_sequences`: concat-then-chop packing (every doc mapped
  to its token interval in a fixed-budget sequence stream — the
  GPT-style "pack documents back-to-back, cut every B tokens" layout).
  The global running token sum is a two-level distributed prefix sum,
  NOT a single-partition window scan.
- `curation_decontaminate`: n-gram overlap of every train doc against
  a held-out eval set (benchmark decontamination, as practiced since
  GPT-2/GPT-3's 8-gram checks): count shared 3-word shingles, flag
  docs over the hit threshold.

Scale notes (100 TB): chunking is embarrassingly parallel. Packing's
only wide stages are one bucket aggregation (|corpus|/64 rows) and one
tiny window over bucket totals; each extra prefix-sum level divides
the windowed row count by the bucket width again, so depth grows
logarithmically — the two coded levels cover ~10^9 docs (written as a
loop, adding a third level is the same two operators over a 64x
smaller frame). Decontamination joins the corpus shingle stream
against the DISTINCT eval shingle set, which is small by construction
(eval sets are fixed-size) and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.operators.dedup import (
    _DOC_SHINGLES_SQL,
    _doc_shingles,
    _docs_parallel,
)
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec

_CHUNK = 24  # words per chunk (small enough that testdata docs, 27-72
_STRIDE = 16  # words, produce 1-4 overlapping chunks; 8-word overlap)

_PACK_BUDGET = 256  # tokens per packed training sequence
_PACK_BUCKET = 64  # docs per prefix-sum bucket (one level = 64x fan-in)

_EVAL_MOD = 97  # doc_id % 97 == 0 -> held-out eval doc (stand-in split)
_CONTAM_HITS = 3  # shared distinct 3-shingles at/over which a doc is flagged


def corpus_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunks per document — the chunker that
    feeds an embedding/RAG index. Chunk k covers words
    [1 + k*stride, min(1 + k*stride + chunk - 1, n)] (1-based), with
    n_chunks = 1 + ceil(max(0, n - chunk) / stride) — ceil, so the
    final (possibly short) chunk always reaches the last word; written
    as floor((x + stride - 1) / stride), all integer arithmetic, so
    the chunk inventory is bit-identical across engines.
    Output: (doc_id, chunk_idx, chunk_start, chunk_len, chunk_md5).
    One projection + one explode; no shuffle, no Python."""
    d = _docs_parallel(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    n = F.size("ws")
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - _CHUNK, F.lit(0)) + F.lit(_STRIDE - 1)) / F.lit(_STRIDE)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.alias("chunk_idx"),
            (k * _STRIDE + 1).alias("chunk_start"),
            F.least(n - k * _STRIDE, F.lit(_CHUNK)).alias("chunk_len"),
            F.md5(
                F.concat_ws(
                    " ", F.slice("ws", k * _STRIDE + 1, _CHUNK)
                ).cast("binary")
            ).alias("chunk_md5"),
        ),
    )
    return d.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_idx", "c.chunk_start", "c.chunk_len", "c.chunk_md5"
    )  # corpus-sized chunk inventory, unsorted


CHUNK_WINDOWS_ORACLE = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
c AS (
  SELECT doc_id, len(ws) AS n, ws,
         unnest(range(0, 1 + CAST(floor((greatest(len(ws) - {_CHUNK}, 0)
                                         + {_STRIDE - 1})
                                        / {_STRIDE}) AS INTEGER))) AS chunk_idx
  FROM d
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(chunk_idx * {_STRIDE} + 1 AS INTEGER) AS chunk_start,
       CAST(least(n - chunk_idx * {_STRIDE}, {_CHUNK}) AS INTEGER) AS chunk_len,
       md5(array_to_string(ws[chunk_idx * {_STRIDE} + 1 :
                              chunk_idx * {_STRIDE} + {_CHUNK}], ' ')) AS chunk_md5
FROM c
"""


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chop sequence packing: documents laid back-to-back
    in doc_id order and cut every {_PACK_BUDGET} tokens. Each doc's
    token interval is [cum - n, cum); it lands in sequences
    floor((cum - n) / B) .. floor((cum - 1) / B), spanning a cut iff
    those differ. Output (doc_id, n_tokens, seq_first, seq_last,
    spans_boundary) — the map from corpus to training-batch layout.

    The running sum is a DISTRIBUTED two-level prefix sum, not one
    global window scan: per-bucket (doc_id div {_PACK_BUCKET}) running
    sums in parallel, then a running sum over the per-bucket totals —
    a frame {_PACK_BUCKET}x smaller. Every level divides the
    single-window row count by {_PACK_BUCKET} again; two levels cover
    ~10^9 docs, and a third is the same pair of operators."""
    cum = F.col("cum")
    return (
        _pack_cum(spark, sf_dir)
        .select(
            "doc_id",
            "n_tokens",
            F.floor((cum - F.col("n_tokens")) / _PACK_BUDGET)
            .cast("long")
            .alias("seq_first"),
            F.floor((cum - 1) / _PACK_BUDGET).cast("long").alias("seq_last"),
        )
        .withColumn("spans_boundary", F.col("seq_first") != F.col("seq_last"))
    )  # corpus-sized doc->sequence map, unsorted


def _pack_cum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, cum) — the doc-id-ordered running token sum
    via the two-level distributed prefix sum (shared by the packer and
    the shard interleaver; the plan is identical to the inline version
    corpus_pack_sequences always had, so registered values are
    unchanged)."""
    toks = _docs_parallel(spark, sf_dir).select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.floor(F.col("doc_id") / _PACK_BUCKET).alias("bucket"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = toks.withColumn("cum_local", F.sum("n_tokens").over(w_in))
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("btotal"))
        .select(
            "bucket",
            F.coalesce(F.sum("btotal").over(w_b), F.lit(0)).alias("offset"),
        )
    )
    return local.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "n_tokens",
        (F.col("cum_local") + F.col("offset")).alias("cum"),
    )


PACK_SEQUENCES_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(floor((cum - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS seq_first,
       CAST(floor((cum - 1) / {_PACK_BUDGET}) AS BIGINT) AS seq_last,
       floor((cum - n_tokens) / {_PACK_BUDGET})
         != floor((cum - 1) / {_PACK_BUDGET}) AS spans_boundary
FROM c
"""


_N_SHARDS = 8  # training output shards


def dataset_interleave_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The final 'write the training shards' step: every packed
    sequence (from `corpus_pack_sequences`'s concat-then-chop layout)
    is assigned to one of {_N_SHARDS} output shards by a deterministic
    md5 hash of its sequence id — the interleaved sharding that keeps
    each shard an unbiased sample of the corpus (sequential sharding
    would put all early docs in shard 0). Output per shard: sequences,
    docs touched, EXACT token mass (each doc's contribution to
    sequence s is min(cum, (s+1)B) − max(cum−n, sB) — the interval
    intersection, so token mass conserves to the corpus exactly), and
    the integer-ppm token share.

    Plan shape at 100 TB: the running sum is the shared two-level
    prefix sum; each doc explodes to its (usually 1-2) overlapping
    sequences; one hash-agg by shard (8 groups, map-side combinable)
    plus a broadcast 1-row total. Nothing is sorted globally and the
    sequence→shard map is a pure hash — adding a shard never reshuffles
    history by more than 1/{_N_SHARDS} of sequences (the md5-mod
    device, not round-robin on arrival order)."""
    B = _PACK_BUDGET
    iv = _pack_cum(spark, sf_dir)
    expanded = iv.select(
        "doc_id",
        "n_tokens",
        "cum",
        F.explode(
            F.sequence(
                F.expr(f"(cum - n_tokens) DIV {B}"), F.expr(f"(cum - 1) DIV {B}")
            )
        ).alias("s"),
    )
    contrib = F.least(F.col("cum"), (F.col("s") + 1) * B) - F.greatest(
        F.col("cum") - F.col("n_tokens"), F.col("s") * B
    )
    shard = (
        F.conv(F.substring(F.md5(F.col("s").cast("string")), 1, 4), 16, 10).cast(
            "int"
        )
        % _N_SHARDS
    )
    total = iv.agg(F.sum("n_tokens").alias("t"))
    return (
        expanded.select(
            shard.cast("bigint").alias("shard"),
            "doc_id",
            "s",
            contrib.cast("bigint").alias("tok"),
        )
        .groupBy("shard")
        .agg(
            F.countDistinct("s").alias("n_seqs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "shard",
            "n_seqs",
            "n_docs",
            "n_tokens",
            F.expr("n_tokens * 1000000 DIV t").alias("token_share_ppm"),
        )
        .orderBy("shard")
    )


INTERLEAVE_SHARDS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
),
expanded AS (
  SELECT doc_id, n_tokens, cum, CAST(u.s AS BIGINT) AS s
  FROM c, unnest(range((cum - n_tokens) // {_PACK_BUDGET},
                       (cum - 1) // {_PACK_BUDGET} + 1)) AS u(s)
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM t),
contrib AS (
  SELECT CAST(CAST(('0x' || substr(md5(CAST(s AS VARCHAR)), 1, 4)) AS INTEGER)
              % {_N_SHARDS} AS BIGINT) AS shard,
         doc_id, s,
         least(cum, (s + 1) * {_PACK_BUDGET})
           - greatest(cum - n_tokens, s * {_PACK_BUDGET}) AS tok
  FROM expanded
)
SELECT shard,
       CAST(count(DISTINCT s) AS BIGINT) AS n_seqs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(tok) AS BIGINT) * 1000000 // t AS token_share_ppm
FROM contrib CROSS JOIN tot
GROUP BY shard, t
ORDER BY shard
"""


def curation_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >=
    {_CONTAM_HITS} distinct 3-word shingles with the held-out eval set
    (doc_id % {_EVAL_MOD} == 0 stands in for the benchmark corpus).
    The train shingle stream joins the DISTINCT eval shingle set —
    small by construction, broadcast — then one count per doc; a LEFT
    join back gives every train doc a verdict (n_eval_hits = 0 rows
    included). Output: (doc_id, n_shingles, n_eval_hits,
    contaminated)."""
    sh = _doc_shingles(spark, sf_dir)
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    train = sh.filter(~is_eval)
    eval_shingles = sh.filter(is_eval).select("shingle").distinct()
    hits = (
        train.join(F.broadcast(eval_shingles), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_eval_hits"))
    )
    per_doc = train.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return per_doc.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_eval_hits", F.lit(0)).alias("n_eval_hits"),
        (F.coalesce("n_eval_hits", F.lit(0)) >= _CONTAM_HITS).alias("contaminated"),
    )  # corpus-sized verdicts, unsorted


DECONTAMINATE_ORACLE = f"""
WITH sh AS ({_DOC_SHINGLES_SQL}),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = 0),
train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % {_EVAL_MOD} != 0),
hits AS (
  SELECT doc_id, count(*) AS n_eval_hits
  FROM train JOIN ev USING (shingle)
  GROUP BY doc_id
),
per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id)
SELECT p.doc_id, p.n_shingles,
       coalesce(h.n_eval_hits, 0) AS n_eval_hits,
       coalesce(h.n_eval_hits, 0) >= {_CONTAM_HITS} AS contaminated
FROM per_doc p LEFT JOIN hits h ON p.doc_id = h.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "dataset_interleave_shards": QuerySpec(
        "dataset_interleave_shards",
        dataset_interleave_shards,
        INTERLEAVE_SHARDS_ORACLE,
        f"md5-interleaved assignment of packed sequences to {_N_SHARDS} "
        "training shards with exact per-shard token mass (interval "
        "intersection) and integer-ppm shares",
    ),
    "corpus_chunk_windows": QuerySpec(
        "corpus_chunk_windows",
        corpus_chunk_windows,
        CHUNK_WINDOWS_ORACLE,
        "overlapping word-window chunk inventory (RAG/embedding chunker)",
    ),
    "corpus_pack_sequences": QuerySpec(
        "corpus_pack_sequences",
        corpus_pack_sequences,
        PACK_SEQUENCES_ORACLE,
        "concat-then-chop token packing via distributed two-level prefix sum",
    ),
    "curation_decontaminate": QuerySpec(
        "curation_decontaminate",
        curation_decontaminate,
        DECONTAMINATE_ORACLE,
        "eval-set 3-shingle overlap decontamination verdicts per train doc",
    ),
}
