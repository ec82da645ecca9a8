"""Semantic properties of the sequence-shaping operators
(operators/packing.py) that the oracle equality gate can't see:
chunk windows must tile every word, packing must partition the token
stream exactly, decontamination must flag known-contaminated docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.operators.packing import (
    _CHUNK,
    _CONTAM_HITS,
    _PACK_BUDGET,
    _STRIDE,
    corpus_chunk_windows,
    corpus_pack_sequences,
    curation_decontaminate,
)
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
from tests.conftest import SF_CORRECT


def test_chunk_windows_cover_every_word_and_overlap(spark):
    """Consecutive chunks overlap by CHUNK - STRIDE words, the first
    chunk starts at word 1, and the last chunk reaches the final word
    of each doc — no word is left out of all chunks."""
    chunks = corpus_chunk_windows(spark, SF_CORRECT)
    docs = load_table(spark, SF_CORRECT, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.min("chunk_start").alias("first_start"),
        F.max(F.col("chunk_start") + F.col("chunk_len") - 1).alias("last_end"),
        F.max("chunk_idx").alias("max_idx"),
        F.count("*").alias("n_chunks"),
    )
    j = per_doc.join(docs, "doc_id")
    assert j.filter(F.col("first_start") != 1).count() == 0
    assert j.filter(F.col("last_end") != F.col("n")).count() == 0
    assert j.filter(F.col("n_chunks") != F.col("max_idx") + 1).count() == 0
    # at least one multi-chunk doc at this SF, and strides line up
    assert chunks.filter(F.col("chunk_idx") > 0).count() > 0
    stride_ok = chunks.filter(
        F.col("chunk_start") != F.col("chunk_idx") * _STRIDE + 1
    )
    assert stride_ok.count() == 0
    assert chunks.filter(F.col("chunk_len") > _CHUNK).count() == 0


def test_pack_sequences_partition_token_stream(spark):
    """Every token index lands in exactly one sequence: per-doc
    intervals are contiguous in doc_id order (next doc's first token
    is the previous cumulative total), totals match, and seq ids are
    floor(interval / budget)."""
    packed = corpus_pack_sequences(spark, SF_CORRECT).orderBy("doc_id").collect()
    cum = 0
    for r in packed:
        assert r.seq_first == cum // _PACK_BUDGET, r
        assert r.seq_last == (cum + r.n_tokens - 1) // _PACK_BUDGET, r
        assert r.spans_boundary == (r.seq_first != r.seq_last), r
        cum += r.n_tokens
    assert cum == sum(r.n_tokens for r in packed)
    # the pack must actually cut sequences at this SF
    assert any(r.spans_boundary for r in packed)


def test_decontaminate_flags_eval_copy(spark):
    """A train doc whose shingles ARE an eval doc's shingles (the eval
    doc's own text re-labeled) must be flagged; verdict counts cover
    every train doc with >= 1 shingle."""
    out = curation_decontaminate(spark, SF_CORRECT)
    docs = load_table(spark, SF_CORRECT, "documents")
    n_train_with_shingles = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .filter(F.size(F.split("text", " ")) >= 3)
        .count()
    )
    assert out.count() == n_train_with_shingles
    # hits are bounded by the doc's own shingle count
    assert out.filter(F.col("n_eval_hits") > F.col("n_shingles")).count() == 0
    flagged = out.filter(F.col("contaminated"))
    assert flagged.count() == out.filter(
        F.col("n_eval_hits") >= _CONTAM_HITS
    ).count()


def test_interleave_shards_conserves_tokens(spark):
    """Shard interleaving invariants: the per-shard token masses sum
    EXACTLY to the corpus token count (the interval-intersection math
    loses nothing at sequence boundaries); every sequence lands in
    exactly one shard (Σ n_seqs = number of distinct sequences); and
    the ppm shares close to 1e6 within floor rounding."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.packing import (
        corpus_pack_sequences,
        dataset_interleave_shards,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from tests.conftest import SF_CORRECT

    rows = dataset_interleave_shards(spark, SF_CORRECT).collect()
    docs = load_table(spark, SF_CORRECT, "documents")
    total = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert sum(r.n_tokens for r in rows) == total

    packs = corpus_pack_sequences(spark, SF_CORRECT)
    n_seqs = (
        packs.select(
            F.explode(F.sequence("seq_first", "seq_last")).alias("s")
        )
        .distinct()
        .count()
    )
    assert sum(r.n_seqs for r in rows) == n_seqs

    share = sum(r.token_share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000
