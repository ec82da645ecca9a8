"""Materialize the CORPUS RELEASE report — the late-round-6 operators
composed the way a training-data release review consumes them, one
artifact per sign-off question:

  documents ─┬─► tokenizer: learned BPE merges + compression  → bpe_merges.parquet
             │     curve, and per-doc token counts under them → bpe_tokens.parquet
             ├─► CCNet head/middle/tail perplexity buckets    → ccnet_buckets.parquet
             ├─► bigram-LM doc scores (outlier docs surface)  → bigram_scores.parquet
             └─► Bloom span-contamination ingest gate         → bloom_gate.parquet
  events    ──► k-anonymity profile of the QI triple          → k_anonymity.parquet
  embeddings ─► Matryoshka truncation-recall curve            → matryoshka.parquet
  documents ─┬─► per-language tokenizer fertility             → fertility.parquet
             ├─► quality-classifier calibration (ECE terms)   → calibration.parquet
             └─► temperature (n^alpha) mixing weights         → mixture.parquet
  all tables ─► right-to-be-forgotten erasure audit           → erasure.parquet

Every one of these is a registered, driver-oracle-checked query — this
example only composes and writes them, then prints the one-line
verdicts a release review reads first: the tokenizer's compression
ratio, how much token mass sits in the perplexity head, how many
incoming docs the contamination gate would block, whether any
quasi-identifier bucket pins individual users, and how many dims the
vector store needs to keep 90% recall.

Run:  python examples/corpus_release_report.py \
          [--sf-dir /root/testdata/sf0.01] [--out /tmp/kfsp_release]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default="/tmp/kfsp_release")
    args = p.parse_args()

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
    )
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_ccnet_buckets,
    )
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        dedup_bloom_gate,
    )
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        matryoshka_recall,
    )
    from kafka_flink_streaming_pipeline_spark.operators.text import bigram_logprob
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _k_anonymity

    spark = get_spark("kfsp-release-report")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)

    merges = bpe_train(spark, args.sf_dir)
    merges.write.mode("overwrite").parquet(str(out / "bpe_merges.parquet"))
    curve = merges.orderBy("round").collect()
    toks = bpe_apply(spark, args.sf_dir)
    toks.write.mode("overwrite").parquet(str(out / "bpe_tokens.parquet"))
    tot = toks.agg(
        F.sum("n_char_tokens").alias("c"), F.sum("n_bpe_tokens").alias("b")
    ).first()
    print(
        f"tokenizer: {len(curve)} merges learned "
        f"({', '.join(r.a + '+' + r.b for r in curve)}); corpus "
        f"{tot.c} char-tokens -> {tot.b} BPE tokens "
        f"({tot.b * 100 // tot.c}% of character stage)"
    )

    ccnet = curation_ccnet_buckets(spark, args.sf_dir)
    ccnet.write.mode("overwrite").parquet(str(out / "ccnet_buckets.parquet"))
    rows = ccnet.collect()
    head = sum(r.n_tokens for r in rows if r.bucket == "head")
    total = sum(r.n_tokens for r in rows)
    print(f"ccnet: {head * 100 // total}% of token mass in the head bucket "
          f"across {len({r.lang for r in rows})} languages")

    bg = bigram_logprob(spark, args.sf_dir)
    bg.write.mode("overwrite").parquet(str(out / "bigram_scores.parquet"))
    worst = bg.orderBy(F.desc("nll_avg_micro")).first()
    print(f"bigram LM: most off-distribution doc {worst.doc_id} "
          f"(avg nll {worst.nll_avg_micro / 1e6:.3f} nats)")

    gate = dedup_bloom_gate(spark, args.sf_dir)
    gate.write.mode("overwrite").parquet(str(out / "bloom_gate.parquet"))
    g = gate.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("contaminated"), 1).otherwise(0)).alias("blocked"),
        F.sum("n_bloom_hits").alias("bh"),
        F.sum("n_true_hits").alias("th"),
    ).first()
    print(f"bloom gate: {g.blocked}/{g.n} incoming docs blocked "
          f"({g.th} true span hits, {g.bh - g.th} bloom false positives)")

    kanon = _k_anonymity(spark, args.sf_dir)
    kanon.write.mode("overwrite").parquet(str(out / "k_anonymity.parquet"))
    risky = [r for r in kanon.collect() if r.min_users == 1]
    print(
        "k-anonymity: "
        + (
            f"{sum(r.n_rows for r in risky)} rows in buckets that pin a "
            f"single user ({', '.join(r.class_size for r in risky)})"
            if risky
            else "no bucket pins a single user"
        )
    )

    mrl = matryoshka_recall(spark, args.sf_dir)
    mrl.write.mode("overwrite").parquet(str(out / "matryoshka.parquet"))
    curve = mrl.orderBy("dim").collect()
    keep = [r.dim for r in curve if r.recall_ppm >= 900_000]
    print(
        "matryoshka: recall curve "
        + " ".join(f"d{r.dim}={r.recall_ppm / 1e4:.0f}%" for r in curve)
        + (f"; {min(keep)} dims keep 90% recall" if keep else "")
    )

    # second-session additions: fertility, calibration, mixing, erasure
    from kafka_flink_streaming_pipeline_spark.operators.bpe import bpe_fertility
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_classifier_calibration,
    )
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        dataset_mixture_temperature,
    )
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _erasure_audit

    fert = bpe_fertility(spark, args.sf_dir)
    fert.write.mode("overwrite").parquet(str(out / "fertility.parquet"))
    frows = fert.collect()
    hi = max(frows, key=lambda r: r.fertility_milli)
    print(
        "fertility: "
        + " ".join(f"{r.lang}={r.fertility_milli / 1000:.2f}" for r in frows)
        + f" tokens/word; {hi.lang} pays the most context per word"
    )

    cal = curation_classifier_calibration(spark, args.sf_dir)
    cal.write.mode("overwrite").parquet(str(out / "calibration.parquet"))
    crows = cal.collect()
    n_all = sum(r.n_docs for r in crows)
    ece = sum(r.n_docs * r.abs_gap_ppm for r in crows) // n_all
    print(f"calibration: classifier ECE {ece / 1e4:.1f}% over "
          f"{len(crows)} occupied score deciles")

    mix = dataset_mixture_temperature(spark, args.sf_dir)
    mix.write.mode("overwrite").parquet(str(out / "mixture.parquet"))
    mrows = mix.collect()
    up = [r.source for r in mrows if r.epochs_milli > 1000]
    print(f"mixing: alpha=1/2 upsamples {len(up)}/{len(mrows)} sources "
          f"(max effective epochs "
          f"{max(r.epochs_milli for r in mrows) / 1000:.2f})")

    era = _erasure_audit(spark, args.sf_dir)
    era.write.mode("overwrite").parquet(str(out / "erasure.parquet"))
    erows = era.collect()
    print("erasure: "
          + ", ".join(f"{r.table_name} {r.n_erased}/{r.n_rows}" for r in erows)
          + " rows touched by the forget-set cascade")
    print("done")


if __name__ == "__main__":
    main()
