"""BPE tokenizer TRAINING (Sennrich et al., ACL 2016): the iterative
merge loop, not just one pair-count pass.

`tokenizer_bpe_pair_counts` (operators/text.py) witnesses the counting
step; this module runs the actual training iteration N times over the
corpus vocabulary and emits the learned merge table — the `merges.txt`
a BPE trainer ships:

    round | a | b | n        (merge round, merged pair, its count)

Algorithm, identical text in both engines:

1. Collapse the corpus to its word-frequency table (map-side partial
   agg; the exchange carries |vocab| rows — the published reason BPE
   training scales: every later step is vocab-sized, not corpus-sized).
2. Symbol state per word = space-joined symbol string, initialised to
   its characters ("table" -> "t a b l e").
3. Per round: count adjacent symbol pairs weighted by word frequency;
   pick argmax with an explicit (n DESC, a, b) tiebreak so both
   engines choose the same pair; rewrite every word's symbol string by
   the standard greedy left-to-right merge.

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

Scale notes (100 TB): the corpus is touched once (step 1); each of the
N rounds is explode + hash-agg + a 1-row TakeOrdered over the
Zipf-bounded vocab, with the 1-row best pair broadcast back. The
per-round `localCheckpoint` truncates the lineage so the plan stays
O(1) per round instead of doubling (best_r and syms_r would otherwise
each re-embed syms_{r-1}). The fold is an interpreted higher-order
function, but it runs over |vocab| rows x ~word-length tokens — far
off the corpus-sized hot path.

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


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run {_TRAIN_ROUNDS} BPE merge rounds; return the merge table
    (round, a, b, n) — the head of the trained tokenizer's merge
    list."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    syms = wf.select(
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
        bests.append(best.select(F.lit(r).cast("bigint").alias("round"), "a", "b", "n"))
        if r < _TRAIN_ROUNDS:
            syms = (
                syms.crossJoin(F.broadcast(best.select("a", "b")))
                .select(
                    "freq",
                    F.ltrim(
                        _merge_fold(F.col("sym"), F.col("a"), F.col("b"))
                    ).alias("sym"),
                )
                .localCheckpoint()
            )

    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out.orderBy("round")


def _bpe_train_oracle(rounds: int = _TRAIN_ROUNDS) -> str:
    """Stage-unrolled DuckDB twin: same vocab collapse, same guarded
    pair extraction, same (n DESC, a, b) argmax, same list_reduce
    greedy fold (sentinel-prepended so the accumulator is the
    space-prefixed joined string from the first real token on)."""
    parts = [
        r"""WITH wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE length(word) >= 2
  GROUP BY word
),
syms_0 AS (
  SELECT freq, rtrim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym FROM wf
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
  SELECT s.freq,
         ltrim(list_reduce(
           list_prepend('', string_split(s.sym, ' ')),
           (acc, x) -> CASE
             WHEN ends_with(acc, ' ' || b.a) AND x = b.b
             THEN substr(acc, 1, length(acc) - length(b.a)) || b.a || b.b
             ELSE acc || ' ' || x END
         )) AS sym
  FROM syms_{r - 1} s CROSS JOIN best_{r} b
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, a, b, n FROM best_{r}"
        for r in range(1, rounds + 1)
    )
    parts.append("\n" + union + "\nORDER BY round")
    return "".join(parts)


QUERIES: dict[str, QuerySpec] = {
    "tokenizer_bpe_train": QuerySpec(
        "tokenizer_bpe_train",
        bpe_train,
        _bpe_train_oracle(),
        f"BPE tokenizer training: {_TRAIN_ROUNDS} merge rounds over the "
        "Zipf-bounded vocab (argmax pair + greedy left-to-right fold "
        "per round); emits the learned merge table",
    ),
}
