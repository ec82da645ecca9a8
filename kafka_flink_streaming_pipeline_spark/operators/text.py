"""Text-analysis operators over the `documents` table.

Training-data pipeline surface (north-star extensions beyond the
reference, SURVEY.md §7 step 7): language ID, quality scoring, token
counting, document fingerprinting. Everything is built from JVM-side
Catalyst expressions (regexp_count / md5 / split) — no Python in the
row path — so these run at full whole-stage-codegen speed over 100 TB
of text, and every one is DuckDB-oracle-checkable.

All ratios divide exact integer counts once, so doubles are bit-equal
across engines regardless of partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.functions.core import det_round
from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

# word-boundary marker lists per language (tiny stopword heuristic;
# the operator contract is determinism, not linguistic accuracy)
_LANG_MARKERS = {
    "en": r"\b(the|a|is|of|and)\b",
    "fr": r"\b(le|la|les|et|un)\b",
    "es": r"\b(el|los|y|una|es)\b",
    "de": r"\b(der|die|das|und|ein)\b",
    "zh": r"(的|是|了)",
}
_STOPWORDS = r"\b(the|a|of|and|to|in|is|it)\b"
_TOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"  # BPE-ish: word / number / symbol


# --- quality scoring ------------------------------------------------------


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.regexp_count("text", F.lit(r"[a-z0-9]+"))
    stops = F.regexp_count("text", F.lit(_STOPWORDS))
    ratio = det_round(stops.cast("double") / F.nullif(n_tokens, F.lit(0)), 6)
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        ratio.alias("stopword_ratio"),
        det_round(
            (F.lit(1.0) - F.coalesce(ratio, F.lit(1.0)))
            * F.least(n_tokens, F.lit(200)).cast("double")
            / 200.0,
            6,
        ).alias("quality_score"),
    )  # unsorted per-doc scores (corpus-sized at scale)


QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         length(text) AS n_chars_actual,
         length(regexp_extract_all(text, '[a-z0-9]+')) AS n_tokens,
         length(regexp_extract_all(text, '{_STOPWORDS}')) AS n_stops
  FROM documents
)
SELECT doc_id, n_chars_actual, n_tokens,
       (floor((CAST(n_stops AS DOUBLE) / nullif(n_tokens, 0)) * 1000000.0 + 0.5) / 1000000.0) AS stopword_ratio,
       (floor(((1.0 - coalesce((floor((CAST(n_stops AS DOUBLE) / nullif(n_tokens, 0)) * 1000000.0 + 0.5) / 1000000.0), 1.0)) * CAST(least(n_tokens, 200) AS DOUBLE) / 200.0) * 1000000.0 + 0.5) / 1000000.0) AS quality_score
FROM t
ORDER BY doc_id
"""


def quality_cte(name: str = "q") -> str:
    """The per-doc quality scoring as a named CTE fragment —
    ``<name> AS (<QUALITY_ORACLE>)`` — for every composing oracle
    (curation pipelines, gap-fill profile, split assignment, the
    token-budget chain). One definition site means a tokenization or
    scoring change can never drift a SUBSET of the composites
    (r6 verdict stretch ask #7); the flattened-composition rule those
    oracles follow is: instantiate this exactly ONCE per query."""
    return f"{name} AS ({QUALITY_ORACLE})"


# --- language ID (n-gram/stopword heuristic) ------------------------------


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scores = {k: F.regexp_count("text", F.lit(v)) for k, v in _LANG_MARKERS.items()}
    s = d.select("doc_id", "lang", *[scores[k].alias(f"s_{k}") for k in _LANG_MARKERS])
    # fixed precedence en > fr > es > de > zh on score ties, mirrored in SQL
    pred = (
        F.when(
            (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_zh")),
            "en",
        )
        .when(
            (F.col("s_fr") >= F.col("s_es"))
            & (F.col("s_fr") >= F.col("s_de"))
            & (F.col("s_fr") >= F.col("s_zh")),
            "fr",
        )
        .when((F.col("s_es") >= F.col("s_de")) & (F.col("s_es") >= F.col("s_zh")), "es")
        .when(F.col("s_de") >= F.col("s_zh"), "de")
        .otherwise("zh")
    )
    return (
        s.select("lang", pred.alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted_lang")
    )


_mk = _LANG_MARKERS
LANGID_ORACLE = f"""
WITH s AS (
  SELECT lang,
         length(regexp_extract_all(text, '{_mk["en"]}')) AS s_en,
         length(regexp_extract_all(text, '{_mk["fr"]}')) AS s_fr,
         length(regexp_extract_all(text, '{_mk["es"]}')) AS s_es,
         length(regexp_extract_all(text, '{_mk["de"]}')) AS s_de,
         length(regexp_extract_all(text, '{_mk["zh"]}')) AS s_zh
  FROM documents
),
p AS (
  SELECT lang,
         CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
              WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
              WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
              WHEN s_de >= s_zh THEN 'de'
              ELSE 'zh' END AS predicted_lang
  FROM s
)
SELECT lang, predicted_lang, count(*) AS n
FROM p
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""


# --- token counting (whitespace + BPE-ish regex) --------------------------


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split(F.col("text"), r"\s+"))
    bpe_tokens = F.regexp_count("text", F.lit(_TOKEN_RE))
    per_doc = d.select("source", ws_tokens.alias("wt"), bpe_tokens.alias("bt"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("wt").alias("sum_ws_tokens"),
            F.sum("bt").alias("sum_bpe_tokens"),
            det_round(F.sum("bt").cast("double") / F.count("*"), 2).alias("avg_bpe_tokens"),
        )
        .orderBy("source")
    )


TOKEN_ORACLE = f"""
WITH t AS (
  SELECT source,
         length(string_split_regex(text, '\\s+')) AS wt,
         length(regexp_extract_all(text, '{_TOKEN_RE}')) AS bt
  FROM documents
)
SELECT source, count(*) AS docs,
       CAST(sum(wt) AS BIGINT) AS sum_ws_tokens,
       CAST(sum(bt) AS BIGINT) AS sum_bpe_tokens,
       (floor((CAST(sum(bt) AS DOUBLE) / count(*)) * 100.0 + 0.5) / 100.0) AS avg_bpe_tokens
FROM t
GROUP BY source
ORDER BY source
"""


# --- document fingerprinting ---------------------------------------------


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined fingerprint: md5 over the normalized text
    (lowercased, all non-alphanumerics stripped) — robust to whitespace
    and punctuation differences; the exact-dedup operator groups on it."""
    d = load_table(spark, sf_dir, "documents")
    normalized = F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]", "")
    return d.select(
        "doc_id", F.md5(normalized.cast("binary")).alias("fingerprint")
    )  # unsorted per-doc fingerprints


FINGERPRINT_ORACLE = """
SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint
FROM documents
ORDER BY doc_id
"""


# --- corpus vocabulary (tf / df) ------------------------------------------


def vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term frequency and document frequency —
    the first pass of any tokenizer/vocab build over a training corpus.
    One explode + one two-metric aggregation; at 100 TB the map-side
    partial agg collapses each partition to its local vocab before the
    shuffle, so the exchange carries |vocab| rows, not |tokens|."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        words.groupBy("word")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
    )  # unsorted: vocabulary can be huge at scale


VOCABULARY_ORACLE = f"""
WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
SELECT word, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM w
GROUP BY word
"""


_ZIPF_KS = (1, 10, 100, 1000)


def zipf_head_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-sizing diagnostic: what share of the corpus token
    mass the top-K types cover, for K in {_ZIPF_KS} — the curve every
    tokenizer/vocab budget decision reads (Zipf's law says the head is
    almost everything; THIS corpus's actual curve says where to cut)::

        k | n_types | covered_tokens | total_tokens | share_ppm

    n_types ≤ k when the vocabulary is smaller than the cut. Rank is
    (tf DESC, word ASC) — the tiebreak makes the frontier engine-exact
    — and share_ppm is the two-step BIGINT division.

    At 100 TB: the vocab aggregation's exchange is |vocab| rows (the
    map-side partial collapse), the ranked prefix sums run on the
    |vocab|-row frame, and the output is 4 rows. The full sort of the
    vocab frame is the one cost — bounded by the Zipf-distributed type
    count, not the corpus."""
    vocab = vocabulary(spark, sf_dir).select("word", "tf")
    w = Window.orderBy(F.desc("tf"), F.asc("word"))
    ranked = vocab.select(
        "tf", F.row_number().over(w).alias("rk")
    )
    total = ranked.agg(
        F.sum("tf").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("v_size"),
    )
    ks = spark.createDataFrame([(k,) for k in _ZIPF_KS], "k BIGINT")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("bigint").alias("n_types"),
            F.sum("tf").cast("bigint").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "n_types",
            "covered_tokens",
            "total_tokens",
            F.expr(
                "(covered_tokens DIV total_tokens) * 1000000"
                " + ((covered_tokens % total_tokens) * 1000000) DIV total_tokens"
            ).alias("share_ppm"),
        )
        .orderBy("k")
    )


ZIPF_HEAD_SHARE_ORACLE = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
vocab AS (SELECT word, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY word),
ranked AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, word ASC) AS rk FROM vocab
),
total AS (
  SELECT CAST(sum(tf) AS BIGINT) AS total_tokens FROM ranked
),
ks AS (SELECT unnest(ARRAY{list(_ZIPF_KS)}) AS k),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(tf) AS BIGINT) AS covered_tokens
  FROM ranked JOIN ks ON rk <= k
  GROUP BY k
)
SELECT CAST(k AS BIGINT) AS k, n_types, covered_tokens, total_tokens,
       CAST((covered_tokens // total_tokens) * 1000000
            + ((covered_tokens % total_tokens) * 1000000) // total_tokens
            AS BIGINT) AS share_ppm
FROM agg, total
ORDER BY k
"""


# --- Gopher-style quality rule battery ------------------------------------

_MIN_WORDS, _MIN_MWL, _MAX_MWL = 10, 3.0, 10.0
_MAX_SYMBOL_RATIO = 0.1


def gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based document filter in the style of the Gopher/MassiveText
    heuristics (word-count bounds, mean-word-length band, symbol ratio,
    stopword presence), each as an independent boolean plus the
    conjunction. All rules are Catalyst regex/arithmetic — one pass
    over the corpus, no shuffle, codegen throughout; the per-rule
    booleans let a curation job report WHY documents were dropped
    (rule ablation) without re-scanning."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.regexp_count("text", F.lit(r"[a-z0-9]+"))
    # char-CLASS counts via single-pass `translate` instead of regex
    # traversals (r13, guide §1.2 per-task work): translate(text, S, '')
    # deletes exactly the chars in S, so length arithmetic reproduces
    # the regexp_replace counts bit-for-bit — # alnum chars and # chars
    # outside [a-z0-9 ] — without the regex engine.
    _ALNUM = "abcdefghijklmnopqrstuvwxyz0123456789"
    word_chars = F.length("text") - F.length(F.translate("text", _ALNUM, ""))
    symbols = F.length(F.translate("text", _ALNUM + " ", ""))
    # the stopword RULE only needs existence, not the count: rlike
    # stops at the first match instead of scanning the whole doc
    r_stop = F.col("text").rlike(_STOPWORDS)
    mwl = det_round(word_chars.cast("double") / F.nullif(n_words, F.lit(0)), 6)
    sym_ratio = det_round(symbols.cast("double") / F.nullif(n_words, F.lit(0)), 6)
    r_words = n_words >= _MIN_WORDS
    r_mwl = (mwl >= _MIN_MWL) & (mwl <= _MAX_MWL)
    r_sym = sym_ratio < _MAX_SYMBOL_RATIO
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        r_words.alias("rule_min_words"),
        r_mwl.alias("rule_word_len"),
        r_sym.alias("rule_symbols"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_mwl & r_sym & r_stop).alias("pass_all"),
    )


GOPHER_RULES_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         length(regexp_extract_all(text, '[a-z0-9]+')) AS n_words,
         length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS word_chars,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS symbols,
         length(regexp_extract_all(text, '{_STOPWORDS}')) AS n_stops
  FROM documents
),
m AS (
  SELECT doc_id, n_words,
         (floor((CAST(word_chars AS DOUBLE) / nullif(n_words, 0)) * 1000000.0 + 0.5) / 1000000.0) AS mean_word_len,
         (floor((CAST(symbols AS DOUBLE) / nullif(n_words, 0)) * 1000000.0 + 0.5) / 1000000.0) AS symbol_ratio,
         n_stops
  FROM t
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio,
       n_words >= {_MIN_WORDS} AS rule_min_words,
       mean_word_len >= {_MIN_MWL} AND mean_word_len <= {_MAX_MWL} AS rule_word_len,
       symbol_ratio < {_MAX_SYMBOL_RATIO} AS rule_symbols,
       n_stops > 0 AS rule_stopwords,
       (n_words >= {_MIN_WORDS}) AND (mean_word_len >= {_MIN_MWL})
         AND (mean_word_len <= {_MAX_MWL}) AND (symbol_ratio < {_MAX_SYMBOL_RATIO})
         AND (n_stops > 0) AS pass_all
FROM m
"""


# --- BM25 keyword ranking --------------------------------------------------

_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS = ("spark", "join", "window")


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 query term — the
    full scored frame, reused by `bm25_search` (top-20 report) and the
    hybrid retrieval pipeline (`operators/similarity.py
    hybrid_retrieval_rerank`, which takes a wider candidate set).

    Plan shape for 100 TB: the token stream is filtered to the query
    terms BEFORE the tf aggregation, so the shuffle carries only
    matching (doc, term) pairs — a vanishing fraction of the corpus.
    Per-term document frequencies and the corpus scalars (N, avgdl) are
    tiny aggregates broadcast back; the only |docs|-sized intermediate
    is the doc-length table, joined on doc_id. Scores are rounded to 4
    decimals so the float sum's addend order can't leak into the hash
    (exact parts — tf, df, dl — are all integers).
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select("doc_id", F.split("text", " ").alias("toks"))
    doclen = docs.select("doc_id", F.size("toks").alias("dl"))
    scalars = doclen.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(_BM25_TERMS)))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("ndf"))
    idf = F.log(
        (F.col("n_docs") - F.col("ndf") + 0.5) / (F.col("ndf") + 0.5) + 1.0
    )
    denom = F.col("cnt") + _BM25_K1 * (
        1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("cnt") * (_BM25_K1 + 1.0) / denom
    return (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(scalars))
        .groupBy("doc_id")
        .agg(det_round(F.sum(contrib), 4).alias("bm25"))
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword ranking (Robertson/Sparck Jones, the lexical-search
    baseline every corpus pipeline keeps next to its ANN index): the
    scored frame from `bm25_scores`, top-20."""
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


BM25_SCORES_SQL = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
doclen AS (SELECT doc_id, length(toks) AS dl FROM d),
s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
tok AS (SELECT doc_id, unnest(toks) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok
       WHERE term IN ('spark', 'join', 'window') GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS ndf FROM tf GROUP BY term)
SELECT tf.doc_id,
       (floor((sum(ln((n_docs - ndf + 0.5) / (ndf + 0.5) + 1.0)
                 * cnt * ({_BM25_K1} + 1.0)
                 / (cnt + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))))
              * 10000.0 + 0.5) / 10000.0)
         AS bm25
FROM tf
JOIN df USING (term)
JOIN doclen USING (doc_id)
CROSS JOIN s
GROUP BY tf.doc_id
"""

BM25_ORACLE = f"""
SELECT * FROM ({BM25_SCORES_SQL})
ORDER BY bm25 DESC, doc_id
LIMIT 20
"""


# --- within-document repetition (the Gopher repetition signals) -----------

#: admission thresholds — top-1-gram share, top-2-gram share, and the
#: duplicate-word fraction (1 - distinct/total); Gopher-style bounds
#: adapted to the whitespace corpus (no line structure → n-gram form)
_MAX_TOP_WORD_SHARE = 0.15
_MAX_TOP_BIGRAM_SHARE = 0.08
_MAX_DUP_WORD_FRAC = 0.70


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile — the Gopher repetition
    filters (top n-gram share, duplicated-content fraction) in their
    n-gram form (this corpus has no line structure). Two aggregation
    passes shuffled on (doc_id, gram): per-gram counts, then per-doc
    maxima/totals — both keyed on the document, so at 100 TB this
    partitions like any per-doc scoring job (no cross-document data
    movement at all). The O(len²)-per-doc alternative (higher-order
    functions computing the mode inside the array column) would skip
    the shuffle but melts on long documents; the shuffle form is
    length-robust."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    words = d.select("doc_id", F.explode("ws").alias("g"))
    wstats = (
        words.groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_words"),
            F.count("*").alias("n_distinct_words"),
            F.max("n").alias("top_word_n"),
        )
    )
    n = F.size("ws")
    bigram_idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                bigram_idx,
                lambda i: F.concat_ws(
                    " ", F.element_at("ws", i), F.element_at("ws", i + 1)
                ),
            )
        ).alias("g"),
    )
    bstats = (
        bigrams.groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
        .groupBy("doc_id")
        .agg(F.sum("n").alias("n_bigrams"), F.max("n").alias("top_bigram_n"))
    )
    top_word_share = det_round(
        F.col("top_word_n").cast("double") / F.col("n_words"), 6
    )
    top_bigram_share = det_round(
        F.col("top_bigram_n").cast("double") / F.col("n_bigrams"), 6
    )
    dup_word_frac = det_round(
        F.lit(1.0)
        - F.col("n_distinct_words").cast("double") / F.col("n_words"),
        6,
    )
    r_word = top_word_share <= _MAX_TOP_WORD_SHARE
    # vacuously true for docs with < 2 words (no bigrams exist): the
    # LEFT join keeps them — an admission filter must give every doc a
    # verdict, never silently drop the short ones
    r_bigram = F.coalesce(top_bigram_share <= _MAX_TOP_BIGRAM_SHARE, F.lit(True))
    r_dup = dup_word_frac <= _MAX_DUP_WORD_FRAC
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            top_word_share.alias("top_word_share"),
            top_bigram_share.alias("top_bigram_share"),
            dup_word_frac.alias("dup_word_frac"),
            r_word.alias("rule_top_word"),
            r_bigram.alias("rule_top_bigram"),
            r_dup.alias("rule_dup_words"),
            (r_word & r_bigram & r_dup).alias("pass_repetition"),
        )
    )  # corpus-sized per-doc output: no global sort


REPETITION_ORACLE = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
w AS (
  SELECT doc_id, unnest(ws) AS g FROM d
),
wstats AS (
  SELECT doc_id, sum(n) AS n_words, count(*) AS n_distinct_words,
         max(n) AS top_word_n
  FROM (SELECT doc_id, g, count(*) AS n FROM w GROUP BY doc_id, g)
  GROUP BY doc_id
),
b AS (
  SELECT doc_id,
         unnest(CASE WHEN len(ws) >= 2
                     THEN list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i+1])
                     ELSE CAST([] AS VARCHAR[]) END) AS g
  FROM d
),
bstats AS (
  SELECT doc_id, sum(n) AS n_bigrams, max(n) AS top_bigram_n
  FROM (SELECT doc_id, g, count(*) AS n FROM b GROUP BY doc_id, g)
  GROUP BY doc_id
),
j AS (
  SELECT w.doc_id, CAST(w.n_words AS BIGINT) AS n_words,
         (floor((CAST(w.top_word_n AS DOUBLE) / w.n_words) * 1000000.0 + 0.5) / 1000000.0) AS top_word_share,
         (floor((CAST(b.top_bigram_n AS DOUBLE) / b.n_bigrams) * 1000000.0 + 0.5) / 1000000.0) AS top_bigram_share,
         (floor((1.0 - CAST(w.n_distinct_words AS DOUBLE) / w.n_words) * 1000000.0 + 0.5) / 1000000.0) AS dup_word_frac
  FROM wstats w LEFT JOIN bstats b ON w.doc_id = b.doc_id
)
SELECT doc_id, n_words, top_word_share, top_bigram_share, dup_word_frac,
       top_word_share <= {_MAX_TOP_WORD_SHARE} AS rule_top_word,
       coalesce(top_bigram_share <= {_MAX_TOP_BIGRAM_SHARE}, TRUE) AS rule_top_bigram,
       dup_word_frac <= {_MAX_DUP_WORD_FRAC} AS rule_dup_words,
       (top_word_share <= {_MAX_TOP_WORD_SHARE}
        AND coalesce(top_bigram_share <= {_MAX_TOP_BIGRAM_SHARE}, TRUE)
        AND dup_word_frac <= {_MAX_DUP_WORD_FRAC}) AS pass_repetition
FROM j
"""


# --- unigram language-model scoring (model-free perplexity proxy) ----------


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram cross-entropy against the corpus's own
    unigram distribution — the model-free stand-in for the KenLM-style
    perplexity filters production curation runs apply (a doc whose
    words are corpus-typical scores low; gibberish and off-distribution
    text scores high). avg_nll = mean over the doc's word occurrences
    of −ln(count(w)/N), in nats.

    Plan shape at 100 TB: the unigram table is one map-side-combinable
    groupBy(word) (Zipf-bounded: |vocab| ≪ |corpus|), N is a broadcast
    scalar, and each doc's score is a join on word + one groupBy(doc).
    Cross-engine hashing discipline: each word's NLL is rounded ONCE to
    integer micro-nats (the BM25-idf precedent — a last-ulp ln()
    disagreement cannot survive 1e-6 rounding), the per-doc sum is an
    exact integer sum (partition-order independent), and the average
    divides once at the end."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    uni = words.groupBy("word").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("n_total"))
    nll_micro = F.floor(
        F.log(F.col("n_total").cast("double") / F.col("c")) * 1_000_000 + F.lit(0.5)
    ).cast("long")
    scored = (
        words.join(uni, "word")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nll_micro.alias("nll_u"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_words"), F.sum("nll_u").alias("s"))
        .select(
            "doc_id",
            "n_words",
            det_round(F.col("s") / (F.lit(1_000_000.0) * F.col("n_words")), 6).alias(
                "avg_nll"
            ),
        )
    )  # corpus-sized per-doc output, unsorted


UNIGRAM_LOGPROB_ORACLE = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
uni AS (SELECT word, count(*) AS c FROM words GROUP BY word),
tot AS (SELECT sum(c) AS n_total FROM uni),
scored AS (
  SELECT w.doc_id,
         CAST(floor(ln(CAST(t.n_total AS DOUBLE) / u.c) * 1000000 + 0.5) AS BIGINT)
           AS nll_u
  FROM words w JOIN uni u USING (word) CROSS JOIN tot t
)
SELECT doc_id, count(*) AS n_words,
       (floor((sum(nll_u) / (1000000.0 * count(*))) * 1000000.0 + 0.5) / 1000000.0) AS avg_nll
FROM scored GROUP BY doc_id
"""


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed BIGRAM
    language model estimated on the corpus itself — one modeling step
    past `text_unigram_logprob` toward the KenLM n-gram scorers CCNet
    runs (KenLM is not in this container; a 2-gram model with Laplace
    smoothing is the standard in-engine formulation).
    Per bigram occurrence: nll = ln((c(w1) + V) / (c(w1,w2) + 1)),
    V = unigram vocabulary size — rounded ONCE to integer micro-nats
    (the transcendental-rounding discipline), per-doc sum exact
    integer, one floor division at the end. Docs shorter than 2 words
    would drop out (none in testdata).

    Plan shape at 100 TB: bigram extraction is map-side (adjacent
    pairs from the pre-split words array — no self-join on position);
    the bigram-TYPE table is Zipf-bounded like the vocab, so the
    expensive exchanges carry |bigram vocab| rows; V is a broadcast
    1-row aggregate; the corpus-sized stream pays one hash join
    against the scored type table and one per-doc aggregation."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    doc_bigrams = d.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(ws) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(ws) - 1),
                    lambda i: F.struct(
                        F.element_at(ws, i).alias("w1"),
                        F.element_at(ws, i + 1).alias("w2"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    uni = (
        d.select(F.explode(ws).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    btypes = (
        doc_bigrams.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.floor(
                F.log((F.col("c1") + F.col("v")).cast("double") / (F.col("c12") + 1))
                * 1_000_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nll_u"),
        )
    )
    return (
        doc_bigrams.join(btypes, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("nll_u").alias("s"))
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("s DIV n_bigrams").alias("nll_avg_micro"),
        )
    )  # corpus-sized per-doc output, unsorted


BIGRAM_LOGPROB_ORACLE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
doc_bigrams AS (
  SELECT doc_id, ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i AS INTEGER) + 1] AS w2
  FROM d, unnest(range(1, len(ws))) AS u(i)
),
uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(ws) AS w1 FROM d)
  GROUP BY w1
),
vocab AS (SELECT count(*) AS v FROM uni),
btypes AS (
  SELECT b.w1, b.w2,
         CAST(floor(ln(CAST(u.c1 + t.v AS DOUBLE) / (count(*) + 1)) * 1000000 + 0.5)
              AS BIGINT) AS nll_u
  FROM doc_bigrams b JOIN uni u USING (w1) CROSS JOIN vocab t
  GROUP BY b.w1, b.w2, u.c1, t.v
)
SELECT db.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(s.nll_u) AS BIGINT) // count(*) AS nll_avg_micro
FROM doc_bigrams db JOIN btypes s ON db.w1 = s.w1 AND db.w2 = s.w2
GROUP BY db.doc_id
"""


_BPE_TOPK = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core counting step of BPE tokenizer training (Sennrich et
    al. ACL 2016): frequency of every ADJACENT SYMBOL PAIR over the
    corpus at the character stage — the pair ranked first is the merge
    a BPE trainer would perform next. Output: the top {_BPE_TOPK}
    pairs (rank, a, b, n), ranked with an explicit (a, b) tiebreak so
    the frontier is exact in both engines; counts are plain BIGINTs.

    Why this is feasible at 100 TB (and why BPE training is): pair
    counting runs over the WORD-FREQUENCY TABLE, not the corpus — the
    corpus collapses to its Zipf-bounded vocabulary first (map-side
    partial agg; the exchange carries |vocab| rows), then pairs
    explode per DISTINCT word (Σ len(word)−1 over the vocab) with each
    pair weighted by the word's corpus frequency. A real trainer
    iterates merge → recount; every iteration is this same
    vocab-not-corpus-sized job, which is the published reason BPE
    scales."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    w = F.col("word")
    pairs = wf.select(
        "freq",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.struct(
                    w.substr(i, F.lit(1)).alias("a"),
                    w.substr(i + 1, F.lit(1)).alias("b"),
                ),
            )
        ).alias("p"),
    )
    top = (
        pairs.groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.desc("n"), "a", "b")
        .limit(_BPE_TOPK)
    )
    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("n"), "a", "b"))
        .cast("bigint")
        .alias("rank"),
        "a",
        "b",
        "n",
    )


BPE_PAIR_ORACLE = f"""
WITH wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) >= 2
  GROUP BY word
),
pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 1) AS a,
         substr(word, CAST(i AS INTEGER) + 1, 1) AS b,
         freq
  FROM wf, unnest(range(1, length(word))) AS t(i)
),
top AS (
  SELECT a, b, CAST(sum(freq) AS BIGINT) AS n
  FROM pairs
  GROUP BY a, b
  ORDER BY n DESC, a, b
  LIMIT {_BPE_TOPK}
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, a, b) AS BIGINT) AS rank,
       a, b, n
FROM top
ORDER BY rank
"""


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty — the corpus-ordering curve data
    curators plot before deciding how much more of a source to crawl:
    for each doc, the share of its distinct 3-gram shingles whose
    FIRST corpus occurrence (min doc_id) is this doc. A source whose
    late documents stop contributing novel n-grams is exhausted (more
    of it only teaches the model to repeat); a flat-high curve means
    fresh text. Shares the dedup family's shingle stream
    (`dedup._doc_shingles`) so "novel" can never drift from what the
    near-dup operators consider the same text.

    Plan shape: shingle postings → ONE groupBy(shingle) min(doc_id)
    (map-side combinable — the same shuffle profile as the dedup
    inverted index) → join back on shingle → per-doc counts. Linear
    at 100 TB; no windows, no driver loops. Docs with <3 words have
    no shingles and report novelty_ppm = -1 (distinguishable from a
    true 0 — all shingles previously seen)."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        _doc_shingles,
    )

    sh = _doc_shingles(spark, sf_dir)  # distinct (doc_id, shingle)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per = (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.expr(
            "CAST(CASE WHEN coalesce(n_shingles, 0) > 0"
            "          THEN coalesce(n_novel, 0) * 1000000 DIV n_shingles"
            "          ELSE -1 END AS BIGINT)"
        ).alias("novelty_ppm"),
    )  # unsorted per-doc report (corpus-sized at scale)


def _ngram_novelty_oracle() -> str:
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        _DOC_SHINGLES_SQL,
    )

    return f"""
WITH sh AS ({_DOC_SHINGLES_SQL}),
fst AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle),
per AS (
  SELECT s.doc_id, count(*) AS n_shingles,
         sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM sh s JOIN fst f USING (shingle)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
       CAST(coalesce(p.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN coalesce(p.n_shingles, 0) > 0
                 THEN coalesce(p.n_novel, 0) * 1000000 // p.n_shingles
                 ELSE -1 END AS BIGINT) AS novelty_ppm
FROM documents d LEFT JOIN per p USING (doc_id)
ORDER BY d.doc_id
"""


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source VOCABULARY overlap — the domain-similarity
    matrix a mixture designer reads before assigning source weights
    (two sources with near-identical vocabularies are one domain and
    shouldn't be double-weighted; a near-zero overlap flags a
    different language or a parsing failure): for every source pair,
    the exact Jaccard of their distinct word sets in integer ppm.

    Plan: distinct (source, word) postings (one shuffle, map-side
    partial), per-source vocab sizes (dimension-sized, broadcast
    back), and a postings self-join on word whose output is bounded
    by |vocab|·|sources|² pairs worst-case with |sources| small and
    fixed — the shuffle key is the word, so at 100 TB this is the
    same profile as the dedup inverted index. Jaccard is the
    two-step pure-BIGINT ppm (no doubles anywhere)."""
    d = load_table(spark, sf_dir, "documents")
    dw = d.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    sizes = dw.groupBy("source").agg(F.count("*").cast("bigint").alias("n_vocab"))
    a = dw.select(F.col("source").alias("source_a"), "word")
    b = dw.select(F.col("source").alias("source_b"), "word")
    common = (
        a.join(b, "word")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.withColumnRenamed("source", "source_a")), "source_a"
        )
        .withColumnRenamed("n_vocab", "na")
        .join(F.broadcast(sizes.withColumnRenamed("source", "source_b")), "source_b")
        .withColumnRenamed("n_vocab", "nb")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.expr(
                "CAST(n_common * 1000000 DIV (na + nb - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_VOCAB_OVERLAP_ORACLE = """
WITH dw AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS word
  FROM documents
),
sizes AS (SELECT source, count(*) AS n_vocab FROM dw GROUP BY source),
common AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM dw a JOIN dw b ON b.word = a.word AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT c.source_a, c.source_b,
       CAST(c.n_common AS BIGINT) AS n_common,
       CAST(c.n_common * 1000000 // (sa.n_vocab + sb.n_vocab - c.n_common)
            AS BIGINT) AS jaccard_ppm
FROM common c
JOIN sizes sa ON sa.source = c.source_a
JOIN sizes sb ON sb.source = c.source_b
ORDER BY c.source_a, c.source_b
"""


QUERIES: dict[str, QuerySpec] = {
    "profile_source_vocab_overlap": QuerySpec(
        "profile_source_vocab_overlap",
        source_vocab_overlap,
        SOURCE_VOCAB_OVERLAP_ORACLE,
        "pairwise source vocabulary Jaccard (ppm) — the domain-"
        "similarity matrix behind mixture-weight decisions",
    ),
    "text_ngram_novelty": QuerySpec(
        "text_ngram_novelty",
        ngram_novelty,
        _ngram_novelty_oracle(),
        "per-doc share of 3-gram shingles first seen in that doc "
        "(source-exhaustion / novelty curve over the dedup family's "
        "shingle stream)",
    ),
    "text_zipf_head_share": QuerySpec(
        "text_zipf_head_share",
        zipf_head_share,
        ZIPF_HEAD_SHARE_ORACLE,
        "token-mass coverage of the top-K vocabulary types "
        "(K=1/10/100/1000) — the vocab-budget curve",
    ),
    "tokenizer_bpe_pair_counts": QuerySpec(
        "tokenizer_bpe_pair_counts",
        bpe_pair_counts,
        BPE_PAIR_ORACLE,
        "BPE training's merge-pair count over the Zipf-bounded vocab "
        "(top adjacent symbol pairs, corpus-frequency weighted)",
    ),
    "text_bigram_logprob": QuerySpec(
        "text_bigram_logprob",
        bigram_logprob,
        BIGRAM_LOGPROB_ORACLE,
        "per-doc cross-entropy under an add-one-smoothed corpus bigram LM "
        "(KenLM-style scorer, integer micro-nats)",
    ),
    "text_unigram_logprob": QuerySpec(
        "text_unigram_logprob",
        unigram_logprob,
        UNIGRAM_LOGPROB_ORACLE,
        "per-doc unigram cross-entropy (model-free perplexity-filter proxy)",
    ),
    "text_repetition_stats": QuerySpec(
        "text_repetition_stats",
        repetition_stats,
        REPETITION_ORACLE,
        "Gopher repetition signals: top n-gram share + duplicate-word fraction",
    ),
    "text_bm25_search": QuerySpec(
        "text_bm25_search",
        bm25_search,
        BM25_ORACLE,
        "BM25 keyword top-20: term-filtered tf shuffle, broadcast df + corpus scalars",
    ),
    "text_gopher_rules": QuerySpec(
        "text_gopher_rules",
        gopher_rules,
        GOPHER_RULES_ORACLE,
        "Gopher-style rule battery with per-rule ablation booleans",
    ),
    "text_vocabulary": QuerySpec(
        "text_vocabulary", vocabulary, VOCABULARY_ORACLE, "corpus vocab tf/df"
    ),
    "text_quality_scores": QuerySpec(
        "text_quality_scores", quality_scores, QUALITY_ORACLE, "per-doc quality metrics"
    ),
    "text_langid_confusion": QuerySpec(
        "text_langid_confusion", langid_confusion, LANGID_ORACLE, "language-ID heuristic"
    ),
    "text_token_stats": QuerySpec(
        "text_token_stats", token_stats, TOKEN_ORACLE, "token counting per source"
    ),
    "text_fingerprints": QuerySpec(
        "text_fingerprints", fingerprints, FINGERPRINT_ORACLE, "content fingerprint"
    ),
}
