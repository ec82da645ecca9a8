"""BPE tokenizer TRAINING and APPLICATION (Sennrich et al., ACL 2016):
the iterative merge loop and the tokenizer it produces — not just one
pair-count pass.

`tokenizer_bpe_pair_counts` (operators/text.py) witnesses the counting
step; this module runs the actual training iteration N times over the
corpus vocabulary and emits the learned merge table — the `merges.txt`
a BPE trainer ships — plus the corpus compression curve, and then
TOKENIZES the corpus with the learned merges:

    tokenizer_bpe_train: round | a | b | n | corpus_tokens_after
    tokenizer_bpe_apply: doc_id | n_words | n_char_tokens | n_bpe_tokens

Algorithm, identical text in both engines:

1. Collapse the corpus to its word-frequency table (map-side partial
   agg; the exchange carries |vocab| rows — the published reason BPE
   training scales: every later step is vocab-sized, not corpus-sized).
2. Symbol state per word = space-joined symbol string, initialised to
   its characters ("table" -> "t a b l e").
3. Per round: count adjacent symbol pairs weighted by word frequency;
   pick argmax with an explicit (n DESC, a, b) tiebreak so both
   engines choose the same pair; rewrite every word's symbol string by
   the standard greedy left-to-right merge; report the corpus token
   count after the rewrite (Σ freq · |symbols|, the compression curve
   a tokenizer-training run plots).
4. Apply: each document's token count under the trained tokenizer is
   one join of its word stream against the final word → symbol-count
   table (1-char words, excluded from training by the length filter,
   are single tokens by definition).

The merge rewrite is a LEFT FOLD over the token list with a string
accumulator (Spark `F.aggregate`, DuckDB `list_reduce` with a
prepended sentinel): if the accumulator ends with " "||a and the next
token equals b, replace that trailing a with a||b, else append the
token. This reproduces exact greedy BPE semantics — consecutive
overlapping occurrences ("a a a a" under (a,a) -> "aa aa") and no
false prefix merges ("q ab abc" under (a,b) stays) — which plain
string replace() cannot (its consumed boundary space skips every
second occurrence in a run).

Determinism contract: every output column is VARCHAR or BIGINT; the
only ordering device is the (n DESC, a, b) tiebreak on ASCII-lowercase
symbols — no floats, no rounding, no hash functions.

Scale notes (100 TB): the corpus is touched once per query (the vocab
collapse; the apply join streams it a second time against the
Zipf-bounded vocab map — broadcast when the vocab fits, shuffle-on-word
otherwise). Each of the N rounds is explode + hash-agg + a 1-row
TakeOrdered over the vocab, with the 1-row best pair broadcast back.
The per-round `localCheckpoint` truncates the lineage so the plan
stays O(1) per round instead of doubling (best_r and syms_r would
otherwise each re-embed syms_{r-1}). The fold is an interpreted
higher-order function, but it runs over |vocab| rows x ~word-length
tokens — far off the corpus-sized hot path.

Reference scope: the reference pipeline (flink-jobs/*.sql) has no
tokenizer trainer; this is part of the training-data-pipeline
extension surface (SURVEY.md §2 LLM ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.plans import QuerySpec
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

_TRAIN_ROUNDS = 6


def _merge_fold(sym_col, a_col, b_col):
    """Greedy left-to-right BPE merge of pair (a, b) over a
    space-joined symbol string; returns the rewritten string
    (space-prefixed — callers ltrim)."""
    return F.aggregate(
        F.split(sym_col, " "),
        F.lit(""),
        lambda acc, x: F.when(
            acc.endswith(F.concat(F.lit(" "), a_col)) & (x == b_col),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.length(a_col)),
                a_col,
                b_col,
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-symbol-pair counts over the vocab symbol state,
    weighted by word frequency. Single-token words contribute nothing
    (guarded sequence — Spark's sequence(1, 0) would DESCEND)."""
    t = F.split("sym", " ")
    pairs = syms.select(
        "freq",
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("a"),
                        F.element_at(t, i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy("p.a", "p.b").agg(F.sum("freq").alias("n"))


def _train_state(
    spark: SparkSession, sf_dir: str
) -> tuple[list[DataFrame], DataFrame]:
    """Run the merge loop. Returns ([per-round 1-row merge DataFrames
    with the post-rewrite corpus token count], final (word, freq, sym)
    state). Everything localCheckpointed — vocab-sized frames."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    syms = wf.select(
        "word",
        "freq",
        F.rtrim(F.regexp_replace("word", "(.)", "$1 ")).alias("sym"),
    ).localCheckpoint()

    bests: list[DataFrame] = []
    for r in range(1, _TRAIN_ROUNDS + 1):
        best = (
            _pair_counts(syms)
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .localCheckpoint()
        )
        syms = (
            syms.crossJoin(F.broadcast(best.select("a", "b")))
            .select(
                "word",
                "freq",
                F.ltrim(_merge_fold(F.col("sym"), F.col("a"), F.col("b"))).alias(
                    "sym"
                ),
            )
            .localCheckpoint()
        )
        tokens_after = syms.agg(
            F.sum(F.col("freq") * F.size(F.split("sym", " ")))
            .cast("bigint")
            .alias("corpus_tokens_after")
        )
        bests.append(
            best.select(
                F.lit(r).cast("bigint").alias("round"), "a", "b", "n"
            ).crossJoin(F.broadcast(tokens_after))
        )
    return bests, syms


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run {_TRAIN_ROUNDS} BPE merge rounds; return the merge table
    (round, a, b, n, corpus_tokens_after) — the head of the trained
    tokenizer's merge list plus the compression curve."""
    bests, _ = _train_state(spark, sf_dir)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out.orderBy("round")


def bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the trained merges: per doc, the
    word count, the character-stage token count (Σ len(word) over
    trainable words + 1 per short word), and the BPE token count under
    the final symbol state. The per-word symbol counts come from ONE
    join of the corpus word stream against the (word → |symbols|)
    map; 1-char words (below the trainer's length filter) count one
    token each in both columns."""
    _, syms = _train_state(spark, sf_dir)
    vocab = syms.select(
        "word", F.size(F.split("sym", " ")).alias("n_syms")
    )
    d = load_table(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return (
        words.join(vocab, "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(
                F.when(F.length("word") >= 2, F.length("word")).otherwise(1)
            )
            .cast("bigint")
            .alias("n_char_tokens"),
            F.sum(F.coalesce("n_syms", F.lit(1))).cast("bigint").alias(
                "n_bpe_tokens"
            ),
        )
    )  # corpus-sized per-doc output, unsorted


def bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language — BPE tokens per whitespace
    word, THE multilingual tokenizer-QA number (a language whose
    fertility runs 2-3× the corpus mean pays that multiple in context
    window and training FLOPs; the metric that motivates per-language
    vocab allocations)::

        lang | n_docs | n_words | n_bpe_tokens | fertility_milli | vs_char_ppm

    fertility_milli = tokens-per-word ×1000; vs_char_ppm = BPE tokens
    as a share of the character-stage count (the compression the
    learned merges bought, per language). Both pure-BIGINT two-step
    divisions. Same one-join shape as `tokenizer_bpe_apply`, grouped
    by the document's language instead of doc_id — at 100 TB the wide
    exchange is still keyed on the Zipf-bounded vocab."""
    _, syms = _train_state(spark, sf_dir)
    vocab = syms.select("word", F.size(F.split("sym", " ")).alias("n_syms"))
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    )
    return (
        words.join(vocab, "word", "left")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_words"),
            F.sum(
                F.when(F.length("word") >= 2, F.length("word")).otherwise(1)
            )
            .cast("bigint")
            .alias("n_char_tokens"),
            F.sum(F.coalesce("n_syms", F.lit(1))).cast("bigint").alias(
                "n_bpe_tokens"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_bpe_tokens",
            F.expr(
                "(n_bpe_tokens DIV n_words) * 1000"
                " + ((n_bpe_tokens % n_words) * 1000) DIV n_words"
            ).alias("fertility_milli"),
            F.expr(
                "(n_bpe_tokens DIV n_char_tokens) * 1000000"
                " + ((n_bpe_tokens % n_char_tokens) * 1000000) DIV n_char_tokens"
            ).alias("vs_char_ppm"),
        )
        .orderBy("lang")
    )


def _syms_ctes(rounds: int) -> str:
    """The shared stage-unrolled DuckDB training pipeline: wf → syms_0
    → (pc_r, best_r, syms_r, tok_r) per round. Same vocab collapse,
    same guarded pair extraction, same (n DESC, a, b) argmax, same
    list_reduce greedy fold (sentinel-prepended so the accumulator is
    the space-prefixed joined string from the first real token on)."""
    parts = [
        r"""WITH wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) >= 2
  GROUP BY word
),
syms_0 AS (
  SELECT word, freq, rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym FROM wf
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
pc_{r} AS (
  SELECT t.toks[CAST(u.i AS INTEGER)] AS a,
         t.toks[CAST(u.i AS INTEGER) + 1] AS b,
         CAST(sum(t.freq) AS BIGINT) AS n
  FROM (SELECT freq, string_split(sym, ' ') AS toks FROM syms_{r - 1}) t,
       unnest(range(1, len(t.toks))) AS u(i)
  GROUP BY 1, 2
),
best_{r} AS (SELECT a, b, n FROM pc_{r} ORDER BY n DESC, a, b LIMIT 1),
syms_{r} AS (
  SELECT s.word, s.freq,
         ltrim(list_reduce(
           list_prepend('', string_split(s.sym, ' ')),
           (acc, x) -> CASE
             WHEN ends_with(acc, ' ' || b.a) AND x = b.b
             THEN substr(acc, 1, length(acc) - length(b.a)) || b.a || b.b
             ELSE acc || ' ' || x END
         )) AS sym
  FROM syms_{r - 1} s CROSS JOIN best_{r} b
),
tok_{r} AS (
  SELECT CAST(sum(freq * len(string_split(sym, ' '))) AS BIGINT)
           AS corpus_tokens_after
  FROM syms_{r}
)"""
        )
    return "".join(parts)


def _bpe_train_oracle(rounds: int = _TRAIN_ROUNDS) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, a, b, n, corpus_tokens_after "
        f"FROM best_{r} CROSS JOIN tok_{r}"
        for r in range(1, rounds + 1)
    )
    return _syms_ctes(rounds) + "\n" + union + "\nORDER BY round"


def _bpe_apply_oracle(rounds: int = _TRAIN_ROUNDS) -> str:
    return (
        _syms_ctes(rounds)
        + f""",
vocab AS (
  SELECT word, len(string_split(sym, ' ')) AS n_syms FROM syms_{rounds}
),
dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(CASE WHEN length(dw.word) >= 2 THEN length(dw.word) ELSE 1 END)
            AS BIGINT) AS n_char_tokens,
       CAST(sum(coalesce(v.n_syms, 1)) AS BIGINT) AS n_bpe_tokens
FROM dw LEFT JOIN vocab v USING (word)
GROUP BY dw.doc_id
"""
    )


def _bpe_fertility_oracle(rounds: int = _TRAIN_ROUNDS) -> str:
    return (
        _syms_ctes(rounds)
        + f""",
vocab AS (
  SELECT word, len(string_split(sym, ' ')) AS n_syms FROM syms_{rounds}
),
dw AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
),
agg AS (
  SELECT dw.lang,
         CAST(count(DISTINCT dw.doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN length(dw.word) >= 2 THEN length(dw.word) ELSE 1 END)
              AS BIGINT) AS n_char_tokens,
         CAST(sum(coalesce(v.n_syms, 1)) AS BIGINT) AS n_bpe_tokens
  FROM dw LEFT JOIN vocab v USING (word)
  GROUP BY dw.lang
)
SELECT lang, n_docs, n_words, n_bpe_tokens,
       CAST((n_bpe_tokens // n_words) * 1000
            + ((n_bpe_tokens % n_words) * 1000) // n_words AS BIGINT)
         AS fertility_milli,
       CAST((n_bpe_tokens // n_char_tokens) * 1000000
            + ((n_bpe_tokens % n_char_tokens) * 1000000) // n_char_tokens
            AS BIGINT) AS vs_char_ppm
FROM agg
ORDER BY lang
"""
    )


QUERIES: dict[str, QuerySpec] = {
    "tokenizer_fertility": QuerySpec(
        "tokenizer_fertility",
        bpe_fertility,
        _bpe_fertility_oracle(),
        "per-language tokenizer fertility (BPE tokens per word, x1000) "
        "+ compression vs the character stage, under the trained merges",
    ),
    "tokenizer_bpe_train": QuerySpec(
        "tokenizer_bpe_train",
        bpe_train,
        _bpe_train_oracle(),
        f"BPE tokenizer training: {_TRAIN_ROUNDS} merge rounds over the "
        "Zipf-bounded vocab (argmax pair + greedy left-to-right fold "
        "per round); emits the learned merge table and compression curve",
    ),
    "tokenizer_bpe_apply": QuerySpec(
        "tokenizer_bpe_apply",
        bpe_apply,
        _bpe_apply_oracle(),
        "tokenize the corpus with the trained BPE merges: per-doc word, "
        "character-stage and BPE token counts via one join against the "
        "final word→symbol-count map",
    ),
}
