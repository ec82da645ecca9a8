"""Corpus-preparation operators for a training-data pipeline.

Chunking, PII redaction, deterministic sampling and embedding
normalization — the row-transforming stages that sit between raw
ingest and dataset assembly (operators/datasets.py). Everything here
is pure Catalyst expressions (generators, regex, higher-order array
functions): zero Python UDFs, so the operators run JVM-side inside
whole-stage codegen and scale linearly with input splits.

Scale notes:
- chunking is a generator (explode of a sequence) — output rows never
  pass through the driver and never shuffle: chunks are written where
  they are produced. At 100 TB the 1→N expansion multiplies bytes, so
  the chunker must not be followed by a global sort (guarded repo-wide
  by test_corpus_sized_outputs_have_no_global_sort).
- redaction/sampling are stateless row maps: they pipeline into the
  scan with no exchange at any scale.
- the deterministic hash sample replaces rand()-based sampling, whose
  output changes with partitioning and retries — on a 1000-executor
  run with task retries, rand() sampling is NOT exactly-once; a pure
  key hash is.
- l2-normalization uses transform/aggregate higher-order functions:
  the 64-float arrays stay packed in Tungsten UnsafeArrayData, no
  per-element row explosion. The fold is left-to-right, which makes
  the double sum deterministic and engine-identical (cf. the
  fold-order-exact pandas scorer in operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions.core import det_round
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

# --- overlapping document chunking ----------------------------------------

_CHUNK_LEN = 200
_CHUNK_STRIDE = 150  # 50-char overlap between consecutive chunks


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character windows per document.

    The context-window chunker every LLM data pipeline needs: doc →
    ceil(n_chars / stride) chunks of ≤200 chars, 50-char overlap so no
    span is split across a boundary without a copy that contains it.
    explode(sequence(...)) is a Catalyst generator: the expansion is
    computed inline per input split.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(0, CAST(n_chars - 1 AS INT), {_CHUNK_STRIDE})")
            ).alias("off"),
            "text",
        )
        .select(
            "doc_id",
            F.expr(f"off div {_CHUNK_STRIDE}").alias("chunk_id"),
            F.expr(f"substring(text, off + 1, {_CHUNK_LEN})").alias("chunk"),
            F.expr(f"length(substring(text, off + 1, {_CHUNK_LEN}))").alias("chunk_len"),
        )
    )


DOC_CHUNK_ORACLE = f"""
WITH offs AS (
  SELECT doc_id, text,
         unnest(generate_series(0, CAST(n_chars - 1 AS BIGINT), {_CHUNK_STRIDE})) AS off
  FROM documents
)
SELECT doc_id,
       off // {_CHUNK_STRIDE} AS chunk_id,
       substr(text, CAST(off + 1 AS INT), {_CHUNK_LEN}) AS chunk,
       length(substr(text, CAST(off + 1 AS INT), {_CHUNK_LEN})) AS chunk_len
FROM offs
"""


# --- PII-style redaction ---------------------------------------------------

_REDACT_RE = "[0-9]{2,}"  # multi-digit runs (ids, counters) — same dialect in RE2/Java


def pii_redact_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact digit runs from the event payload, keeping a match count.

    Stand-in for PII scrubbing (emails/phones/ids): a stateless
    regexp_replace over the payload column. The regex is restricted to
    syntax with identical semantics in Java regex (Spark) and RE2
    (DuckDB), and the replacement count is carried so downstream
    auditing can sample high-redaction rows.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.regexp_replace("props", _REDACT_RE, "<NUM>").alias("props_redacted"),
        F.regexp_count("props", F.lit(_REDACT_RE)).alias("n_redacted"),
    )


PII_REDACT_ORACLE = f"""
SELECT event_id,
       regexp_replace(props, '{_REDACT_RE}', '<NUM>', 'g') AS props_redacted,
       length(regexp_extract_all(props, '{_REDACT_RE}')) AS n_redacted
FROM events
"""


# --- deterministic Bernoulli sample ---------------------------------------

_SAMPLE_PCT = 10


def sample_orders_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of orders by key hash.

    md5(o_orderkey) first 4 hex chars mod 100 < 10 — a pure function
    of the key (same idiom as the train/val/test splitter in
    operators/datasets.py), so the sample is reproducible across
    engines, partitionings, task retries and reruns, unlike
    df.sample(), which is none of those under retry.
    """
    o = load_table(spark, sf_dir, "orders")
    bucket = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10).cast(
        "int"
    ) % 100
    return o.filter(bucket < _SAMPLE_PCT).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").alias("totalprice"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


SAMPLE_ORDERS_ORACLE = f"""
SELECT o_orderkey, o_custkey,
       o_totalprice AS totalprice,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM orders
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4)) AS INTEGER) % 100
      < {_SAMPLE_PCT}
"""


# --- embedding L2 normalization -------------------------------------------


def embedding_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalize embeddings with higher-order array functions.

    transform → cast each float to double; aggregate → left-to-right
    fold of the squared sum (deterministic order ⇒ bit-identical to
    the single-threaded oracle); transform again → divide through by
    the norm. The arrays never unpack into rows.
    """
    e = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(F.col("sq"))
    # unit_vec ships as comma-joined MICRO-UNIT INTEGERS (floor(x*1e6)):
    # array cells are unhashable in a pandas-based canonicalizer (the
    # driver's), and fixed-POINT truncation of bit-identical doubles is
    # engine-stable — unlike %.6f printing, whose half-way ties round
    # HALF_UP in Java but half-even in DuckDB's printf (a dyadic value
    # like 0.0078125 formats as 007813 vs 007812).
    unit = F.transform("embedding", lambda x: x.cast("double") / norm)
    return (
        e.select("vec_id", "embedding", sq_sum.alias("sq"))
        .select(
            "vec_id",
            norm.alias("l2_norm"),
            F.array_join(
                F.transform(
                    unit,
                    lambda x: F.floor(x * F.lit(1_000_000.0)).cast("long").cast("string"),
                ),
                ",",
            ).alias("unit_vec"),
        )
    )


EMBED_L2_ORACLE = """
WITH sq AS (
  SELECT vec_id, embedding,
         list_reduce(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
           (a, b) -> a + b) AS sqsum
  FROM embeddings
)
SELECT vec_id,
       sqrt(sqsum) AS l2_norm,
       array_to_string(
         list_transform(embedding,
           x -> CAST(CAST(floor(CAST(x AS DOUBLE) / sqrt(sqsum) * 1000000.0) AS BIGINT)
                     AS VARCHAR)),
         ',') AS unit_vec
FROM sq
"""


# --- benchmark decontamination --------------------------------------------


def decontaminate_against_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop training documents whose exact text appears in an eval set.

    Test-set decontamination — the step that keeps benchmark answers
    out of training data. The 'eval set' stand-in is every 97th
    document (an external benchmark table would slot into the same
    plan); matching is by md5 text fingerprint, so the broadcast side
    carries 16-byte hashes, never document bodies. At 100 TB this is a
    broadcast ANTI join: one corpus scan, zero shuffle, eval set on
    every executor. Near-dup decontamination composes the same way
    from the MinHash pair stream in operators/dedup.py.
    """
    d = load_table(spark, sf_dir, "documents")
    eval_fps = (
        d.filter(F.col("doc_id") % 97 == 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    return (
        d.withColumn("fp", F.md5("text"))
        .join(F.broadcast(eval_fps), "fp", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
    )


DECONTAMINATE_ORACLE = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE md5(text) NOT IN (
  SELECT md5(text) FROM documents WHERE doc_id % 97 = 0
)
"""


# --- per-group z-score standardization ------------------------------------


def zscore_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer z-score of order totals from EXACT decimal moments.

    Feature standardization at scale has a determinism trap: stddev
    over doubles depends on accumulation order, so a naive
    stddev_samp() differs run-to-run under repartitioning. Here both
    moments are exact decimal sums (sum and sum-of-squares — Σx² of
    2-decimal values is exact in DECIMAL(38,4)), converted to double
    ONCE, then var = (Σx² − (Σx)²/n)/(n−1) in fixed double order —
    bit-identical under any partitioning and to the oracle. The
    per-customer moment table is tiny → broadcast join-back, fact side
    never shuffles after its one aggregation.
    """
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    per_cust = (
        o.groupBy(F.col("o_custkey").alias("g_custkey"))
        .agg(
            F.sum(dec).cast("double").alias("s1"),
            F.sum(dec * dec).cast("double").alias("s2"),
            F.count("*").alias("n"),
        )
        .filter(F.col("n") >= 2)
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = (F.col("o_totalprice").cast("decimal(18,2)").cast("double") - F.col("s1") / F.col("n")) / F.sqrt(var)
    return (
        o.join(F.broadcast(per_cust), o.o_custkey == F.col("g_custkey"))
        .filter(var > 0)
        .select("o_orderkey", "o_custkey", det_round(z, 6).alias("zscore"))
    )


ZSCORE_ORACLE = """
WITH m AS (
  SELECT o_custkey AS g_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
                  CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
         count(*) AS n
  FROM orders
  GROUP BY o_custkey
  HAVING count(*) >= 2
)
SELECT o_orderkey, o_custkey,
       (floor(((CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) * 1000000.0 + 0.5) / 1000000.0) AS zscore
FROM orders JOIN m ON o_custkey = g_custkey
WHERE (s2 - s1 * s1 / n) / (n - 1) > 0
"""


# --- weighted sampling (Efraimidis–Spirakis exponential race) --------------

_WSAMPLE_K = 100
_U_DENOM = float(1 << 60)


def sample_docs_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted top-k sample of the corpus without replacement:
    the Efraimidis–Spirakis A-ES scheme (IPL 2006) in its exponential
    form — each doc draws u ~ U(0,1) DETERMINISTICALLY from md5(doc_id)
    (60 hash bits → uniform), races with key −ln(u)/w, and the k
    smallest keys win. P(selection) ∝ weight (here n_chars: prefer
    longer docs), yet the draw is a pure function of the key — same
    sample across engines, partitionings and task retries, which
    rand()-weighted sampling cannot promise. Plan: a stateless map +
    global top-k (TakeOrderedAndProject) — no shuffle of the corpus,
    only k rows move. The same race key also works per-group
    (row_number over a group window) for stratified weighted draws."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(_U_DENOM)
    race = -F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", F.col("n_chars").alias("weight"), race.alias("race_key"))
        .orderBy("race_key", "doc_id")
        .limit(_WSAMPLE_K)
        .select("doc_id", "weight", det_round(F.col("race_key"), 10).alias("race_key"))
    )


_STRAT_K = 10


def sample_docs_weighted_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language weighted draw — the balanced-mixture sampler: the
    same A-ES race key, ranked INSIDE each language with a row_number
    window, top-10 per stratum. Equal allocation per language no matter
    how skewed the corpus mix is, weights still biasing within the
    stratum. One hash shuffle on lang; every stratum's state is its
    top-k."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
            "double"
        )
        + F.lit(1.0)
    ) / F.lit(_U_DENOM)
    race = -F.log(u) / F.col("n_chars")
    w = Window.partitionBy("lang").orderBy("race_key", "doc_id")
    return (
        d.select(
            "lang", "doc_id", F.col("n_chars").alias("weight"), race.alias("race_key")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRAT_K)
        .select("lang", "doc_id", "weight", det_round(F.col("race_key"), 10).alias("race_key"), "rn")
        .orderBy("lang", "rn")
    )


SAMPLE_STRATIFIED_ORACLE = f"""
WITH raced AS (
  SELECT lang, doc_id, n_chars AS weight,
         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
             / {_U_DENOM}) / n_chars AS race_key
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, weight, race_key,
         row_number() OVER (PARTITION BY lang ORDER BY race_key, doc_id) AS rn
  FROM raced
)
SELECT lang, doc_id, weight, (floor((race_key) * 10000000000.0 + 0.5) / 10000000000.0) AS race_key, rn
FROM ranked
WHERE rn <= {_STRAT_K}
ORDER BY lang, rn
"""


SAMPLE_WEIGHTED_ORACLE = f"""
WITH raced AS (
  SELECT doc_id, n_chars AS weight,
         -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
             / {_U_DENOM}) / n_chars AS race_key
  FROM documents
)
SELECT doc_id, weight, (floor((race_key) * 10000000000.0 + 0.5) / 10000000000.0) AS race_key
FROM raced
ORDER BY race_key, doc_id
LIMIT {_WSAMPLE_K}
"""


# --- token-budget sequence packing -----------------------------------------

_PACK_BUDGET = 2048


def pack_docs_to_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign documents to fixed token-budget
    packs per language, the assembly step that turns a curated corpus
    into training sequences. Deterministic contract: docs are laid out
    in doc_id order within each language, est_tokens = ceil(n_chars/4)
    (the byte-proxy; swap in the real tokenizer's counts upstream), and
    a doc belongs to the pack where its span STARTS —
    pack = floor(preceding_cumsum / budget). Plan: one running-sum
    window partitioned by lang (a single hash shuffle of |docs| skinny
    rows) + one partial agg per pack; integer arithmetic end to end, so
    the packing is bit-identical on any engine. At 100 TB the window
    partitions by lang shard key — add a date/bucket column to the
    partition key to bound per-partition state."""
    d = load_table(spark, sf_dir, "documents")
    est = F.ceil(F.col("n_chars") / F.lit(4)).cast("long")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = d.select(
        "lang",
        "doc_id",
        est.alias("est_tokens"),
        F.coalesce(F.sum(est).over(w), F.lit(0)).alias("prior"),
    ).withColumn("pack_id", F.floor(F.col("prior") / F.lit(_PACK_BUDGET)))
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("est_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang", "pack_id")
    )


PACK_ORACLE = f"""
WITH est AS (
  SELECT lang, doc_id, CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_tokens
  FROM documents
),
packed AS (
  SELECT lang, doc_id, est_tokens,
         coalesce(sum(est_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM est
)
SELECT lang, CAST(floor(prior / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
       count(*) AS n_docs,
       CAST(sum(est_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM packed
GROUP BY 1, 2
ORDER BY lang, pack_id
"""


# --- per-user ordered event sequences (SFT export) --------------------------

_SEQ_MAX = 32


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model training export: each user's event-type history in
    strict (ts, event_id) order, truncated to the first `_SEQ_MAX`
    steps, plus the untruncated length. The rank-before-collect idiom
    (cf. listagg_top_customers): a row_number window bounds every
    group to ≤32 rows BEFORE collect_list, so the collected arrays are
    fixed-size no matter how hot a user is — an unbounded collect is a
    per-group OOM at scale. The explicit array_sort on the carried rank
    makes element order a contract (collect order is
    partition-dependent)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.groupBy("user_id")
        .agg(
            F.count("*").alias("seq_len"),
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") <= _SEQ_MAX,
                                F.struct("rn", "event_type"),
                            )
                        )
                    ),
                    lambda s: s["event_type"],
                ),
            ).alias("seq"),
        )
        .orderBy("user_id")
    )


USER_SEQ_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id,
       count(*) AS seq_len,
       string_agg(CASE WHEN rn <= {_SEQ_MAX} THEN event_type END, '|' ORDER BY rn)
         AS seq
FROM ranked
GROUP BY user_id
ORDER BY user_id
"""


# --- temperature (alpha) mixture sampling ----------------------------------

_TEMP_TARGET = 200  # target total docs in the tempered mixture


def sample_docs_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (the multilingual
    "alpha-sampling" of multilingual-LM data pipelines, T = 0.5):
    per-source sampling probability ∝ (n_source)^T, flattening the
    head so low-resource sources are over-represented relative to
    their raw share.

    100 TB shape: NO per-group sort and NO rank window — each doc's
    admission is one md5-bucket comparison against its source's
    broadcast micro-rate, i.e. the same map-side hash-threshold
    pattern as `dataset_split_assign`. All arithmetic is integer-exact
    cross-engine: sqrt is IEEE-correctly-rounded (the one transcendental
    both engines agree on bit-for-bit — the reason T is fixed at 0.5
    rather than a pow() knob), scaled to integer micro-units, and the
    admission test is CROSS-MULTIPLIED (bucket·denom·n < M·s·1e6) in
    decimal(38,0)/HUGEINT so there is no division to round at all.
    Expected sample size per source is target·sqrt-share (binomial, as
    any rate-based sampler); the draw is a pure function of doc_id."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return temperature_sample(d, _TEMP_TARGET)


def temperature_sample(d: DataFrame, target: int) -> DataFrame:
    """T=0.5 tempered sample of any (doc_id, source) frame — see
    `sample_docs_temperature` for the mechanics. Flattening is
    property-tested on a skewed synthetic corpus
    (`test_temperature_sampling_flattens_head`); the registered entry's
    oracle covers exactness on the driver testdata."""
    cnt = d.groupBy("source").agg(F.count("*").alias("n"))
    sc = cnt.select(
        "source",
        "n",
        F.floor(F.sqrt("n") * 1_000_000 + F.lit(0.5)).cast("long").alias("s"),
    )
    denom = sc.agg(F.sum("s").alias("denom"))
    rates = F.broadcast(sc.crossJoin(F.broadcast(denom)))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1_000_000
    )
    dec = "decimal(38,0)"
    return (
        d.join(rates, "source")
        .withColumn("bucket", bucket)
        .filter(
            F.col("bucket").cast(dec) * F.col("denom").cast(dec) * F.col("n").cast(dec)
            < F.lit(target).cast(dec)
            * F.col("s").cast(dec)
            * F.lit(1_000_000).cast(dec)
        )
        .select("source", "doc_id")
    )  # sampled subset: corpus-sized at scale, unsorted


SAMPLE_TEMPERATURE_ORACLE = f"""
WITH d AS (SELECT doc_id, source FROM documents),
cnt AS (SELECT source, count(*) AS n FROM d GROUP BY source),
sc AS (SELECT source, n, CAST(floor(sqrt(n) * 1000000 + 0.5) AS BIGINT) AS s FROM cnt),
den AS (SELECT sum(s) AS denom FROM sc)
SELECT d.source, d.doc_id
FROM d JOIN sc USING (source) CROSS JOIN den
WHERE CAST(CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 1000000 AS HUGEINT) * CAST(den.denom AS HUGEINT) * CAST(sc.n AS HUGEINT)
      < CAST({_TEMP_TARGET} AS HUGEINT) * CAST(sc.s AS HUGEINT) * CAST(1000000 AS HUGEINT)
"""


# --- deterministic global shuffle manifest ---------------------------------

_SHUFFLE_SHARDS = 8


def corpus_shuffle_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training dataloader's shuffle, decided by the ENGINE once and
    reproducibly: every doc gets a (shard, pos) address — shard from one
    md5 slice, position from a DIFFERENT slice of the same digest ranked
    within the shard — so the global read order is a pure function of
    doc identity. This is what an epoch-0 data order ships as at 100 TB
    (a manifest, not a shuffled copy): any trainer, resumed run, or
    audit re-derives the exact order with no RNG state, and a re-shuffle
    is a constant change (salt the hash input), not a data move.

    Plan: one hash shuffle on shard (8 keys here; thousands at scale)
    + a within-shard rank — NO global sort: the output is corpus-sized,
    so ordering is left to the consumer's shard/pos addressing (the
    driver compare is order-insensitive; `pos` IS the order). Distinct
    hash slices for shard and rank keep shard assignment and in-shard
    order statistically independent; doc_id tiebreaks exact collisions
    on the 8-hex rank slice."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % _SHUFFLE_SHARDS)
    rank_key = F.substring(h, 5, 8)
    w = Window.partitionBy("shard").orderBy("rank_key", "doc_id")
    return (
        d.select("doc_id", shard.alias("shard"), rank_key.alias("rank_key"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("shard", "pos", "doc_id")
    )  # unsorted: corpus-sized manifest, (shard,pos) is the addressing


SHUFFLE_MANIFEST_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER)
           % {_SHUFFLE_SHARDS} AS shard,
         substr(md5(CAST(doc_id AS VARCHAR)), 5, 8) AS rank_key
  FROM documents
)
SELECT shard, 
       CAST(row_number() OVER (PARTITION BY shard ORDER BY rank_key, doc_id)
            AS BIGINT) AS pos,
       doc_id
FROM h
"""


def corpus_release_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card numbers plus a REPRODUCIBILITY DIGEST — what a
    corpus release ships so any consumer can verify they trained on
    exactly this data: per (source, split), doc count, token mass,
    char mass, and an order-insensitive content digest (bit_xor of a
    60-bit md5 slice of each doc's text — substr(md5, 1, 15) is 15 hex
    chars; 16 would need sign-bit handling in the BIGINT cast). XOR is
    commutative and associative, so the digest is independent of
    partitioning, task order, and engine — one corrupted, dropped, or
    added doc flips it
    with probability 1 − 2⁻⁶⁰ (and identical TEXTS cancel pairwise
    under xor, which is exactly the right sensitivity for a release
    digest: it certifies content+multiplicity-parity, with the exact
    counts beside it catching even-multiplicity edits). Split
    membership is the standing md5-bucket device, so the manifest is
    itself reproducible from raw data alone. One aggregation, map-side
    combinable — at 100 TB this is a single pass."""
    return manifest_partial(
        load_table(spark, sf_dir, "documents")
    ).orderBy("source", "split")


def manifest_partial(docs: DataFrame) -> DataFrame:
    """The manifest aggregation over ANY (doc_id, source, text) frame —
    shared by the batch entry above and the streaming incremental
    maintenance job (`streaming/jobs.py manifest_stream_job`). Every
    output column is batch-DECOMPOSABLE (counts and sums add, xor
    digests xor), which is the whole reason the streaming job can
    maintain the manifest from per-batch partials without ever
    re-scanning the corpus."""
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        _split_name,
    )

    return (
        docs.select(
            "source",
            _split_name(F.col("doc_id")).alias("split"),
            F.regexp_count("text", F.lit(r"[a-z0-9]+")).alias("nt"),
            F.length("text").alias("nc"),
            F.expr(
                "cast(conv(substr(md5(text), 1, 15), 16, 10) as bigint)"
            ).alias("h"),
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
            F.sum("nc").cast("bigint").alias("n_chars"),
            F.expr("bit_xor(h)").alias("content_digest"),
        )
    )


RELEASE_MANIFEST_ORACLE = """
WITH t AS (
  SELECT source,
         CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
              ELSE 'test' END AS split,
         length(regexp_extract_all(text, '[a-z0-9]+')) AS nt,
         length(text) AS nc,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT source, text,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS INTEGER) % 100 AS b
    FROM documents
  )
)
SELECT source, split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       bit_xor(h) AS content_digest
FROM t
GROUP BY source, split
ORDER BY source, split
"""


QUERIES: dict[str, QuerySpec] = {
    "corpus_release_manifest": QuerySpec(
        "corpus_release_manifest",
        corpus_release_manifest,
        RELEASE_MANIFEST_ORACLE,
        "dataset-card manifest per (source, split): counts, token/char "
        "mass, order-insensitive xor content digest",
    ),
    "corpus_shuffle_manifest": QuerySpec(
        "corpus_shuffle_manifest",
        corpus_shuffle_manifest,
        SHUFFLE_MANIFEST_ORACLE,
        "deterministic epoch-0 shuffle manifest: md5-derived (shard, pos) "
        "address per doc, no RNG state",
    ),
    "sample_docs_temperature": QuerySpec(
        "sample_docs_temperature",
        sample_docs_temperature,
        SAMPLE_TEMPERATURE_ORACLE,
        "T=0.5 alpha-sampling mixture: sqrt-share micro-rates, map-side hash admission",
    ),
    "sample_docs_weighted": QuerySpec(
        "sample_docs_weighted",
        sample_docs_weighted,
        SAMPLE_WEIGHTED_ORACLE,
        "Efraimidis-Spirakis weighted top-k sample, deterministic hash draws",
    ),
    "sample_docs_weighted_stratified": QuerySpec(
        "sample_docs_weighted_stratified",
        sample_docs_weighted_stratified,
        SAMPLE_STRATIFIED_ORACLE,
        "per-language equal-allocation weighted draw (A-ES race inside each stratum)",
    ),
    "pack_docs_to_budget": QuerySpec(
        "pack_docs_to_budget",
        pack_docs_to_budget,
        PACK_ORACLE,
        "token-budget sequence packing: running-sum window + per-pack rollup",
    ),
    "user_event_sequences": QuerySpec(
        "user_event_sequences",
        user_event_sequences,
        USER_SEQ_ORACLE,
        "bounded per-user ordered event sequences (rank-before-collect)",
    ),
    "decontaminate_against_eval": QuerySpec(
        "decontaminate_against_eval",
        decontaminate_against_eval,
        DECONTAMINATE_ORACLE,
        "benchmark decontamination: broadcast fingerprint anti join",
    ),
    "zscore_order_totals": QuerySpec(
        "zscore_order_totals",
        zscore_order_totals,
        ZSCORE_ORACLE,
        "per-group z-score from exact decimal moments",
    ),
    "doc_chunk_overlap": QuerySpec(
        "doc_chunk_overlap",
        doc_chunk_overlap,
        DOC_CHUNK_ORACLE,
        "overlapping char-window chunker (explode generator)",
    ),
    "pii_redact_props": QuerySpec(
        "pii_redact_props",
        pii_redact_props,
        PII_REDACT_ORACLE,
        "regex redaction with match counts",
    ),
    "sample_orders_hash": QuerySpec(
        "sample_orders_hash",
        sample_orders_hash,
        SAMPLE_ORDERS_ORACLE,
        "deterministic key-hash Bernoulli sample",
    ),
    "embedding_l2_normalize": QuerySpec(
        "embedding_l2_normalize",
        embedding_l2_normalize,
        EMBED_L2_ORACLE,
        "higher-order-function unit normalization",
    ),
}
