"""Run the full training-data curation pipeline and materialize its
artifacts — the operators composed exactly as the registered (and
driver-oracle-checked) queries compose them, but written OUT the way a
production run hands off to a training job:

    documents ─┬─► near-dup pair graph (banded LSH, session-shared)
               ├─► duplication profile           → dup_profile.parquet
               ├─► keep-best survivors + quality gate + split
               │        (curation_pipeline_v2)   → survivors/split=*/
               ├─► token budget per split        → token_budget.parquet
               ├─► split-leakage contamination   → leakage.parquet
               ├─► eval-overlap decontamination  → decontamination.parquet
               ├─► packed-sequence interval map  → packed_sequences.parquet
               └─► RAG/embedding chunk inventory → chunks.parquet

The survivor table is written PARTITIONED BY split, so a training
reader opens exactly its split's files (partition pruning) — the same
layout contract as the engine's other partitioned writers. Because all
four outputs compose the one session-shared LSH labeling, the whole
run builds the pair graph once.

Run:  python examples/curation_end_to_end.py \
          [--sf-dir /root/testdata/sf0.01] [--out /tmp/kfsp_curated]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default="/tmp/kfsp_curated")
    args = p.parse_args()

    from kafka_flink_streaming_pipeline_spark import get_spark
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_pipeline_v2,
        curation_token_budget,
    )
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        dedup_cluster_size_profile,
        split_leakage_check_lsh,
    )

    spark = get_spark("kfsp-curation-run")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)

    profile = dedup_cluster_size_profile(spark, args.sf_dir)
    profile.write.mode("overwrite").parquet(str(out / "dup_profile.parquet"))
    dup_rows = {r.cluster_size: r.dup_frac for r in profile.collect()}
    print(f"duplication profile: {dup_rows}")

    survivors = curation_pipeline_v2(spark, args.sf_dir)
    (
        survivors.repartition("split")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(str(out / "survivors"))
    )
    print(f"survivors written partitioned by split → {out / 'survivors'}")

    budget = curation_token_budget(spark, args.sf_dir)
    budget.write.mode("overwrite").parquet(str(out / "token_budget.parquet"))
    for r in budget.collect():
        print(
            f"  {r.split:<6} docs={r.n_docs:<8} tokens={r.n_tokens:<10} "
            f"share_ppm={r.token_share_ppm}"
        )

    leakage = split_leakage_check_lsh(spark, args.sf_dir)
    leakage.write.mode("overwrite").parquet(str(out / "leakage.parquet"))
    n_leaks = sum(r.n_pairs for r in leakage.collect() if r.leaks)
    print(f"cross-split near-dup pairs remaining: {n_leaks}")

    # sequence shaping (operators/packing.py): the handoff from
    # "curated corpus" to "tokenized batches" — eval-overlap verdicts,
    # the doc -> packed-sequence interval map, and the chunk inventory
    # an embedding/RAG indexer consumes
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.packing import (
        corpus_chunk_windows,
        corpus_pack_sequences,
        curation_decontaminate,
    )

    decon = curation_decontaminate(spark, args.sf_dir)
    decon.write.mode("overwrite").parquet(str(out / "decontamination.parquet"))
    n_contam = decon.filter(F.col("contaminated")).count()
    print(f"decontamination: {n_contam} train docs share eval 3-shingles")

    packed = corpus_pack_sequences(spark, args.sf_dir)
    packed.write.mode("overwrite").parquet(str(out / "packed_sequences.parquet"))
    n_seqs = packed.agg(F.max("seq_last")).first()[0] + 1
    print(f"sequence packing: corpus chops into {n_seqs} fixed-budget sequences")

    chunks = corpus_chunk_windows(spark, args.sf_dir)
    chunks.write.mode("overwrite").parquet(str(out / "chunks.parquet"))
    print(f"chunk inventory: {chunks.count()} overlapping windows written")

    # run reports (the late round-5 operators): where the tokens went,
    # what the source mix looks like, and whether the LSH edges the
    # whole run rested on are trustworthy — written next to the output
    # the way a production run keeps its audit trail
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_filter_audit,
    )
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        dedup_lsh_calibration,
    )
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _source_mix

    audit = curation_filter_audit(spark, args.sf_dir)
    audit.write.mode("overwrite").parquet(str(out / "filter_audit.parquet"))
    for r in audit.collect():
        print(f"  audit {r.reasons:<32} docs={r.n_docs:<7} tokens={r.n_tokens}")

    mix = _source_mix(spark, args.sf_dir)
    mix.write.mode("overwrite").parquet(str(out / "source_mix.parquet"))
    print(f"source mix: {mix.count()} sources profiled")

    calib = dedup_lsh_calibration(spark, args.sf_dir)
    calib.write.mode("overwrite").parquet(str(out / "lsh_calibration.parquet"))
    for r in calib.collect():
        print(
            f"  lsh bucket {r.bucket}: recall_ppm={r.recall_ppm} "
            f"mean_abs_err_ppm={r.mean_abs_err_ppm} "
            f"sample_ppm={r.sample_ppm}"
        )

    # domain tilt (round 6): DSIR importance weights against the eval
    # split's distribution, and the top-k selection a targeted
    # fine-tuning mix would take
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_dsir_select,
        curation_dsir_weights,
    )

    weights = curation_dsir_weights(spark, args.sf_dir)
    weights.write.mode("overwrite").parquet(str(out / "dsir_weights.parquet"))
    sel = curation_dsir_select(spark, args.sf_dir)
    sel.write.mode("overwrite").parquet(str(out / "dsir_selected.parquet"))
    top = sel.orderBy("rank").limit(3).collect()
    print(
        "dsir: top target-domain docs "
        + ", ".join(f"#{r.rank} doc {r.doc_id} (w={r.log_w_micro}µ)" for r in top)
    )
    print("done")


if __name__ == "__main__":
    main()
