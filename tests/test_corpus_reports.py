"""Semantic invariants for the round-5 corpus-report operators
(`dedup_lsh_calibration`, `profile_source_mix`, `curation_filter_audit`)
beyond the oracle-parity gate (tests/test_oracle_parity.py covers the
value-exactness of all three automatically): conservation laws the
reports must satisfy against their own input corpus.
"""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def test_lsh_calibration_bounds(spark):
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        dedup_lsh_calibration,
        exact_ngram_pairs,
    )

    rows = dedup_lsh_calibration(spark, SF_CORRECT).collect()
    assert rows, "calibration report is empty"
    n_true_total = sum(r.n_true for r in rows)
    assert n_true_total == exact_ngram_pairs(spark, SF_CORRECT).count()
    for r in rows:
        assert 5 <= r.bucket <= 9  # exact threshold 0.5 floors the bucket
        assert 0 <= r.n_found <= r.n_true
        assert 0 <= r.recall_ppm <= 1_000_000
        if r.n_found == 0:
            assert r.mean_abs_err_ppm is None
        else:
            # 12 permutations resolve jaccard to 1/12 steps: the mean
            # error can never exceed one full unit (1e6 ppm)
            assert 0 <= r.mean_abs_err_ppm <= 1_000_000


def test_lsh_calibration_full_sample_at_testdata_scale(spark):
    """Below the cap the report must be exhaustive and say so:
    sample_ppm == 1e6 on the testdata corpus (500 docs < 20k cap)."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        dedup_lsh_calibration,
    )

    rows = dedup_lsh_calibration(spark, SF_CORRECT).collect()
    assert all(r.sample_ppm == 1_000_000 for r in rows)


def test_lsh_calibration_self_caps_above_threshold(spark, monkeypatch):
    """Above the doc cap the exact side must shrink to the md5-bucket
    sample, the emitted sample_ppm must state the applied fraction,
    and every sampled true pair must exist in the full exact graph
    (the sample is a restriction, never a distortion)."""
    import kafka_flink_streaming_pipeline_spark.operators.dedup as D

    monkeypatch.setattr(D, "_CAL_MAX_DOCS", 100)
    rows = D.dedup_lsh_calibration(spark, SF_CORRECT).collect()
    # corpus is 500 docs -> keep = 100*10000//500 = 2000 buckets = 20%
    assert all(r.sample_ppm == 200_000 for r in rows)
    sampled_true = sum(r.n_true for r in rows)
    full_true = D.exact_ngram_pairs(spark, SF_CORRECT).count()
    assert 0 < sampled_true < full_true
    for r in rows:
        assert 0 <= r.n_found <= r.n_true
        assert 0 <= r.recall_ppm <= 1_000_000


def test_source_mix_conserves_corpus(spark):
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _source_mix
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    docs = load_table(spark, SF_CORRECT, "documents")
    rows = _source_mix(spark, SF_CORRECT).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        assert 0 <= r.dup_ppm < 1_000_000
        assert 0 <= r.mean_quality_ppm <= 1_000_000
        assert 0 < r.top_lang_ppm <= 1_000_000
        assert r.top_lang is not None


def test_percentile_disc_cross_engine_pin(spark, duck):
    """Pin the Spark percentile_disc ≡ DuckDB quantile_disc equivalence
    the adaptive gate relies on, across every group-size residue mod 4
    (where the two discrete-quantile definitions could diverge)."""
    for n in range(1, 26):
        vals = list(range(1, n + 1))
        s = (
            spark.createDataFrame([(v,) for v in vals], "v int")
            .selectExpr(
                "CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS BIGINT) p"
            )
            .collect()[0]
            .p
        )
        d = duck.execute(
            f"SELECT CAST(quantile_disc(v, 0.25) AS BIGINT) FROM (SELECT unnest({vals}) v)"
        ).fetchone()[0]
        assert s == d, f"n={n}: spark {s} != duckdb {d}"


def test_adaptive_gate_invariants(spark):
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_adaptive_quality_gate,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = curation_adaptive_quality_gate(spark, SF_CORRECT).collect()
    docs = load_table(spark, SF_CORRECT, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.threshold_ppm <= 1_000_000
        # P25 cutoff keeps at least 75% of the source (ties can only add)
        assert r.n_pass * 4 >= r.n_docs * 3
        assert r.n_pass <= r.n_docs
        assert r.pass_ppm == r.n_pass * 1_000_000 // r.n_docs


def test_ann_recall_report_invariants(spark):
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        sim_ann_recall_report,
    )

    rows = {r.method: r for r in sim_ann_recall_report(spark, SF_CORRECT).collect()}
    assert set(rows) == {
        "ivf_nprobe1",
        "ivf_nprobe2",
        "ivf_kmeans",
        "lsh_multiprobe",
        "pq_adc_refine",
    }
    for r in rows.values():
        assert 0 <= r.total_hits <= r.total_truth
        assert r.recall_ppm == r.total_hits * 1_000_000 // r.total_truth
        assert r.n_queries >= 1
    # widening the probe can only add candidates: nprobe2 ⊇ nprobe1
    assert rows["ivf_nprobe2"].total_hits >= rows["ivf_nprobe1"].total_hits
    # the registered PQ shape (ADC shortlist + exact refine) must beat
    # single-cell IVF on the isotropic driver embeddings — the measured
    # finding PERF.md documents; guard it here as a floor
    assert rows["pq_adc_refine"].recall_ppm >= rows["ivf_nprobe1"].recall_ppm


def test_rrf_fusion_invariants(spark):
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        _HYBRID_K,
        _HYBRID_RECALL,
        hybrid_retrieval_rrf,
    )

    rows = hybrid_retrieval_rrf(spark, SF_CORRECT).collect()
    assert len(rows) == _HYBRID_K
    assert [r.fused_rank for r in rows] == list(range(1, _HYBRID_K + 1))
    assert len({r.doc_id for r in rows}) == _HYBRID_K
    for r in rows:
        assert r.r_bm25 is not None or r.r_cosine is not None
        for rank in (r.r_bm25, r.r_cosine):
            assert rank is None or 1 <= rank <= _HYBRID_RECALL
    # a doc on BOTH lists must outrank a doc appearing on one list at
    # a worse position in that list: verify monotonicity of the score
    # the ordering used (recompute it here from the integer ranks)
    def score(r):
        return (1.0 / (60.0 + r.r_bm25) if r.r_bm25 else 0.0) + (
            1.0 / (60.0 + r.r_cosine) if r.r_cosine else 0.0
        )

    scores = [score(r) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_category_drift_invariants(spark):
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _category_drift
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = _category_drift(spark, SF_CORRECT).collect()
    ev = load_table(spark, SF_CORRECT, "events")
    n_days = ev.selectExpr("count(DISTINCT date_format(ts, 'yyyy-MM-dd'))").first()[0]
    assert len(rows) == n_days - 1  # first day has no predecessor
    days = [r.day for r in rows]
    assert days == sorted(days)
    for r in rows:
        # L1 over two ppm share vectors is bounded by 2e6 and is at
        # least |top mover|; share vectors each sum to ~1e6
        assert 0 <= r.l1_ppm <= 2_000_000
        assert abs(r.top_delta_ppm) <= r.l1_ppm
        assert r.n_types >= 1 and r.top_type


def test_filter_audit_conserves_corpus_and_matches_v2(spark):
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_filter_audit,
        curation_pipeline_v2,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = curation_filter_audit(spark, SF_CORRECT).collect()
    n_docs_total = sum(r.n_docs for r in rows)
    assert n_docs_total == load_table(spark, SF_CORRECT, "documents").count()
    by_reason = {r.reasons: r.n_docs for r in rows}
    allowed = {"exact_dup", "near_dup", "low_quality"}
    for reasons in by_reason:
        if reasons != "kept":
            parts = reasons.split(",")
            assert set(parts) <= allowed
            assert parts == sorted(parts, key=["exact_dup", "near_dup", "low_quality"].index)
    # the audit's survivor count must equal the v2 pipeline's output:
    # v2 keeps LSH-component keepers passing the quality gate, i.e.
    # audit rows without near_dup and without low_quality
    survivors = sum(
        n
        for reasons, n in by_reason.items()
        if "near_dup" not in reasons and "low_quality" not in reasons
    )
    assert survivors == curation_pipeline_v2(spark, SF_CORRECT).count()


def test_dsir_weights_tilt_toward_target(spark):
    """DSIR semantics (Xie et al. 2023): docs IN the target split must
    score a higher mean log importance weight than the rest — their
    own bigrams define the target distribution, so the tilt is the
    technique working. Also: weights exist for every doc with >= 2
    words, and n_feats == n_words - 1 for single-spaced text."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_dsir_weights,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    w = curation_dsir_weights(spark, SF_CORRECT)
    docs = load_table(spark, SF_CORRECT, "documents")
    n_multi = docs.filter(F.size(F.split("text", " ")) >= 2).count()
    assert w.count() == n_multi

    joined = w.withColumn("is_tgt", F.col("doc_id") % 97 == 0)
    means = {
        r.is_tgt: r.m
        for r in joined.groupBy("is_tgt")
        .agg(F.avg("log_w_micro").alias("m"))
        .collect()
    }
    assert means[True] > means[False]

    chk = (
        w.join(docs.select("doc_id", F.size(F.split("text", " ")).alias("nw")), "doc_id")
        .filter(F.col("n_feats") != F.col("nw") - 1)
        .count()
    )
    assert chk == 0


def test_dsir_resample_tilts_toward_target(spark):
    """End-to-end DSIR invariants (r7): the resampled mixture report
    (a) accounts for exactly the K drawn docs with exact ppm shares,
    (b) draws with P ∝ exp(log_w), so the selected docs' mean log
    weight must exceed the candidate pool's mean — the tilt the
    resampling exists to produce, and (c) its corpus shares describe
    the non-target pool (sum to 1e6 within floor slack)."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        _DSIR_K,
        curation_dsir_resample,
        curation_dsir_weights,
    )

    mix = curation_dsir_resample(spark, SF_CORRECT).collect()
    assert sum(r["n_sel"] for r in mix) == _DSIR_K
    for r in mix:
        assert r["sel_share_ppm"] == r["n_sel"] * 1_000_000 // _DSIR_K
    n_src = len(mix)
    # corpus shares are floors of an exhaustive partition of the pool
    # IF every source is represented in the sample; with K=100 over a
    # handful of sources that holds on the driver testdata
    share_sum = sum(r["corpus_share_ppm"] for r in mix)
    assert 1_000_000 - n_src <= share_sum <= 1_000_000

    pool = curation_dsir_weights(spark, SF_CORRECT).filter(
        F.col("doc_id") % 97 != 0
    )
    pool_mean = pool.agg(F.avg("log_w_micro")).collect()[0][0]
    sel_mean = sum(r["sum_log_w_micro"] for r in mix) / _DSIR_K
    assert sel_mean > pool_mean


def test_bpe_pair_counts_conservation(spark):
    """BPE pair-count invariants: the ranked list is strictly ordered
    by (n desc, a, b); every count is positive; and the TOTAL pair
    mass over all pairs equals sum over word occurrences of
    (len(word)-1) — conservation against the corpus itself (computed
    here independently of the operator's vocab-table route)."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.text import (
        _BPE_TOPK,
        bpe_pair_counts,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = bpe_pair_counts(spark, SF_CORRECT).collect()
    assert len(rows) == _BPE_TOPK
    keys = [(-r.n, r.a, r.b) for r in rows]
    assert keys == sorted(keys)
    assert all(r.n > 0 and len(r.a) == 1 and len(r.b) == 1 for r in rows)

    docs = load_table(spark, SF_CORRECT, "documents")
    total_mass = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .agg(F.sum(F.length("w") - 1))
        .first()[0]
    )
    # full (un-truncated) pair mass via the operator's own route
    wf = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    vocab_mass = wf.agg(F.sum((F.length("word") - 1) * F.col("freq"))).first()[0]
    assert vocab_mass == total_mass


def test_packed_adc_equals_skinny_adc(spark):
    """The round-6 packed-layout rewrite claims the ADC sums are the
    IDENTICAL integers the skinny (vec_id, m, code) join+groupBy
    produced — that equivalence is what lets every PQ oracle survive
    the rewrite unchanged. Pin it: recompute ADC the skinny way here
    and compare to `_packed_adc_scores` exactly, all queries, all
    candidates."""
    from pyspark.sql import functions as F

    import kafka_flink_streaming_pipeline_spark.operators.similarity as S
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    e = load_table(spark, SF_CORRECT, "embeddings")
    qsub = S._pq_subvecs(
        S._pq_normalized(e).filter(F.col("vec_id") < S._N_QUERIES)
    ).select(F.col("vec_id").alias("query_id"), "m", F.col("sv").alias("qv"))
    lut = qsub.join(S._pq_anchors(spark, SF_CORRECT), "m").select(
        "query_id",
        "m",
        "anchor_id",
        F.floor(S._dot(F.col("qv"), F.col("av")) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("long")
        .alias("dot_micro"),
    )
    codes = S._pq_codes(spark, SF_CORRECT)
    skinny = (
        codes.join(
            F.broadcast(lut),
            (codes["m"] == lut["m"]) & (codes["code"] == lut["anchor_id"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dot_micro").alias("adc_micro"))
    )
    packed = S._packed_adc_scores(
        S._pq_codes_packed(spark, SF_CORRECT), S._pq_query_lut_arrays(lut)
    )
    s_rows = {(r.query_id, r.vec_id): r.adc_micro for r in skinny.collect()}
    p_rows = {(r.query_id, r.vec_id): r.adc_micro for r in packed.collect()}
    assert s_rows == p_rows
    assert len(s_rows) > 0


def test_bpe_train_fold_and_round1(spark):
    """BPE trainer invariants. (a) The greedy merge fold reproduces
    exact BPE semantics on the cases plain string-replace gets wrong:
    consecutive overlapping runs merge greedily ("a a a a" under (a,a)
    -> "aa aa") and a pair never merges into the PREFIX of a longer
    symbol ("q ab abc" under (a,b) unchanged). (b) Round 1 of the
    trainer equals rank 1 of tokenizer_bpe_pair_counts — the two
    operators share the counting semantics by construction. (c) The
    merge table is one row per round, counts positive, and every
    later-round merge symbol is buildable from earlier merges (symbol
    length > 1 implies it appeared as some earlier round's a||b or is
    a single char)."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.bpe import (
        _TRAIN_ROUNDS,
        _merge_fold,
        bpe_train,
    )
    from kafka_flink_streaming_pipeline_spark.operators.text import bpe_pair_counts

    cases = spark.createDataFrame(
        [("a a a a",), ("a b a b x",), ("q ab abc",), ("b a b",)], ["sym"]
    )
    got = {
        r.sym: r.m
        for r in cases.select(
            "sym",
            F.ltrim(_merge_fold(F.col("sym"), F.lit("a"), F.lit("b"))).alias("m"),
        ).collect()
    }
    assert got["a b a b x"] == "ab ab x"
    assert got["q ab abc"] == "q ab abc"
    assert got["b a b"] == "b ab"
    got_aa = {
        r.sym: r.m
        for r in cases.select(
            "sym",
            F.ltrim(_merge_fold(F.col("sym"), F.lit("a"), F.lit("a"))).alias("m"),
        ).collect()
    }
    assert got_aa["a a a a"] == "aa aa"

    merges = bpe_train(spark, SF_CORRECT).collect()
    assert [r.round for r in merges] == list(range(1, _TRAIN_ROUNDS + 1))
    assert all(r.n > 0 for r in merges)

    top1 = bpe_pair_counts(spark, SF_CORRECT).filter("rank = 1").first()
    assert (merges[0].a, merges[0].b, merges[0].n) == (top1.a, top1.b, top1.n)

    known = {r.a + r.b for r in merges}
    for r in merges:
        for s in (r.a, r.b):
            assert len(s) == 1 or s in known, s

    # compression curve: each round strictly shrinks the corpus, and a
    # merge of pair-count n performs at most n merges (overlapping
    # occurrences in a run merge greedily, so possibly fewer)
    toks = [r.corpus_tokens_after for r in merges]
    for prev, cur, r in zip(toks, toks[1:], merges[1:]):
        assert 0 < prev - cur <= r.n

    # train <-> apply conservation: summing per-doc BPE tokens equals
    # the final corpus token count plus one token per short
    # (sub-length-filter) word occurrence
    from pyspark.sql import functions as F2

    from kafka_flink_streaming_pipeline_spark.operators.bpe import bpe_apply
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    total_bpe = bpe_apply(spark, SF_CORRECT).agg(
        F2.sum("n_bpe_tokens")
    ).first()[0]
    short = (
        load_table(spark, SF_CORRECT, "documents")
        .select(F2.explode(F2.split("text", " ")).alias("w"))
        .filter(F2.length("w") < 2)
        .count()
    )
    assert total_bpe == toks[-1] + short


def test_ccnet_buckets_invariants(spark):
    """CCNet bucketing invariants at sf0.01: (a) token mass and doc
    count conserve per language; (b) the buckets are ordered — every
    head doc scores <= every middle doc <= every tail doc (ranges
    don't interleave); (c) the cut is by token mass: each of head and
    middle holds at least a third of the language's tokens minus one
    boundary document's worth."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_ccnet_buckets,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = curation_ccnet_buckets(spark, SF_CORRECT).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r

    docs = load_table(spark, SF_CORRECT, "documents")
    truth = {
        r.lang: (r.nd, r.nt)
        for r in docs.select(
            "lang", "doc_id", F.size(F.split("text", " ")).alias("nw")
        )
        .groupBy("lang")
        .agg(F.count("*").alias("nd"), F.sum("nw").alias("nt"))
        .collect()
    }
    max_doc = docs.select(F.max(F.size(F.split("text", " ")))).first()[0]

    for lang, bs in by_lang.items():
        nd, nt = truth[lang]
        assert sum(b.n_docs for b in bs.values()) == nd
        assert sum(b.n_tokens for b in bs.values()) == nt
        order = [bs[k] for k in ("head", "middle", "tail") if k in bs]
        for lo, hi in zip(order, order[1:]):
            assert lo.nll_max_micro <= hi.nll_min_micro
        for k in ("head", "middle"):
            if k in bs:
                assert bs[k].n_tokens >= nt // 3 - max_doc


def test_bloom_gate_no_false_negatives(spark):
    """Bloom-gate invariants. At the registered filter size:
    n_true_hits <= n_bloom_hits <= n_spans per doc, and the set of
    contaminated docs (plus their exact true-hit counts) agrees with
    the ground-truth span join — and is non-empty, so the witness has
    real signal. With a deliberately undersized 1024-bit filter the
    gate must EXHIBIT false positives (n_bloom_hits > n_true_hits
    somewhere) yet still report the identical true hits — the
    no-false-negative property is structural, not a sizing
    accident."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        _SPAN_W,
        _docs_parallel,
        dedup_bloom_gate,
        dedup_bloom_gate_impl,
    )

    rows = dedup_bloom_gate(spark, SF_CORRECT).collect()
    assert all(0 <= r.n_true_hits <= r.n_bloom_hits <= r.n_spans for r in rows)
    assert all(r.contaminated == (r.n_true_hits >= 1) for r in rows)

    d = _docs_parallel(spark, SF_CORRECT).select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    nn = F.size("ws")
    idx = F.when(nn >= _SPAN_W, F.sequence(F.lit(1), nn - (_SPAN_W - 1))).otherwise(
        F.array().cast("array<int>")
    )
    spans = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("ws"), i + j) for j in range(_SPAN_W)]
        ),
    )
    doc_spans = d.select("doc_id", F.explode(spans).alias("s")).distinct()
    truth = {
        (r.doc_id, r.n)
        for r in doc_spans.filter(F.col("doc_id") % 3 == 0)
        .join(
            doc_spans.filter(F.col("doc_id") % 3 != 0).select("s").distinct(),
            "s",
            "left_semi",
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {(r.doc_id, r.n_true_hits) for r in rows if r.n_true_hits > 0} == truth
    assert len(truth) > 0  # real contamination signal at test scale

    tiny = dedup_bloom_gate_impl(spark, SF_CORRECT, m_bits=1024, k=2).collect()
    assert {(r.doc_id, r.n_true_hits) for r in tiny if r.n_true_hits > 0} == truth
    assert any(r.n_bloom_hits > r.n_true_hits for r in tiny)  # FPs exhibited


def test_bigram_logprob_invariants(spark):
    """Bigram-LM scorer invariants: one row per doc, n_bigrams equals
    word count minus one, and every score is a non-negative integer
    (add-one smoothing guarantees c1 + V > c12 + 1, so each term's ln
    is positive)."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.text import bigram_logprob
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    out = bigram_logprob(spark, SF_CORRECT)
    docs = load_table(spark, SF_CORRECT, "documents")
    assert out.count() == docs.count()
    bad = (
        out.join(
            docs.select("doc_id", F.size(F.split("text", " ")).alias("nw")), "doc_id"
        )
        .filter(
            (F.col("n_bigrams") != F.col("nw") - 1) | (F.col("nll_avg_micro") < 0)
        )
        .count()
    )
    assert bad == 0


def test_k_anonymity_conserves_rows(spark):
    """K-anonymity profile invariants: row mass conserves to the
    events table, ppm shares sum to ~1e6 (floor rounding loses at
    most one ppm per bucket), every bucket's min_users >= 1, and the
    singleton bucket (if present) has min_users == 1."""
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _k_anonymity
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = _k_anonymity(spark, SF_CORRECT).collect()
    n_events = load_table(spark, SF_CORRECT, "events").count()
    assert sum(r.n_rows for r in rows) == n_events
    share = sum(r.row_share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= share <= 1_000_000
    for r in rows:
        assert r.min_users >= 1
        assert r.n_classes >= 1
        if r.class_size == "1":
            assert r.min_users == 1


def test_matryoshka_recall_invariants(spark):
    """Matryoshka report invariants: one row per evaluated dim; hits
    bounded by truth; the full-width row is structurally perfect
    (truncation to 64 of 64 dims IS the truth ranking, same tiebreak);
    and ppm arithmetic is the exact integer division."""
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        _MRL_DIMS,
        matryoshka_recall,
    )

    rows = {r.dim: r for r in matryoshka_recall(spark, SF_CORRECT).collect()}
    assert set(rows) == set(_MRL_DIMS)
    for r in rows.values():
        assert 0 <= r.total_hits <= r.total_truth
        assert r.recall_ppm == r.total_hits * 1_000_000 // r.total_truth
    assert rows[64].total_hits == rows[64].total_truth


def test_quality_classifier_training_dynamics(spark):
    """In-engine logistic-regression invariants: one row per GD step;
    confusion counts partition the corpus at every step; step 1 is
    structural (w=0 gives p=0.5 for every doc, so at the 0.5 threshold
    everything is predicted positive: tp = n_pos, fp = n_neg); and
    with the rare positive class the bias descends monotonically
    toward the base-rate logit."""
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        _CLF_STEPS,
        curation_quality_classifier,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = curation_quality_classifier(spark, SF_CORRECT).collect()
    assert [r.step for r in rows] == list(range(1, _CLF_STEPS + 1))

    docs = load_table(spark, SF_CORRECT, "documents")
    n = docs.count()
    n_pos = docs.filter("doc_id % 97 = 0").count()
    for r in rows:
        assert r.tp + r.fp + r.fn + r.tn == n
    assert (rows[0].tp, rows[0].fp, rows[0].fn, rows[0].tn) == (
        n_pos,
        n - n_pos,
        0,
        0,
    )
    biases = [r.w_bias_micro for r in rows]
    assert all(b < 0 for b in biases)
    assert biases == sorted(biases, reverse=True)


def test_psi_drift_invariants(spark):
    """PSI report invariants: every term is non-negative (structural:
    (a-b) and ln((a+1)/(b+1)) share a sign), each period's ppm shares
    close to 1e6 within floor rounding, and the total PSI is finite
    and small on a stationary synthetic stream (the generator draws
    both halves from the same distribution — PSI < 0.1, the standard
    'stable' reading)."""
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _psi_drift

    rows = _psi_drift(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.psi_term_micro >= 0
    for col in ("ref_ppm", "cur_ppm"):
        share = sum(getattr(r, col) for r in rows)
        assert 1_000_000 - len(rows) <= share <= 1_000_000
    assert sum(r.psi_term_micro for r in rows) < 100_000  # PSI < 0.1


def test_bbit_report_invariants(spark):
    """b-bit minwise report invariants: deciles valid, counts
    positive, the mean absolute error is bounded by the estimator's
    range (2e6 ppm), overestimates never exceed the pair count — and
    a PERFECT pair (all 12 minima equal, full est 1.0) must have all
    12 bits equal, so the b=1 estimator is exact there (checked by
    recomputing the estimator on an identical-text pair)."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        _N_PERM,
        _doc_shingles,
        _minhash_sigs_columnar,
        dedup_minhash_bbit,
    )

    rows = dedup_minhash_bbit(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0 <= r.decile <= 9
        assert r.n_pairs > 0
        assert 0 <= r.mean_abs_err_ppm <= 2_000_000
        assert 0 <= r.n_overestimated <= r.n_pairs

    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    sh = dup.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(F.split("text", " ")) - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(F.split("text", " "), i),
                    F.element_at(F.split("text", " "), i + 1),
                    F.element_at(F.split("text", " "), i + 2),
                ),
            )
        ).alias("shingle"),
    )
    sigs = _minhash_sigs_columnar(sh).collect()
    s1, s2 = sorted(sigs, key=lambda r: r.doc_id)
    assert all(
        getattr(s1, f"h{p}") == getattr(s2, f"h{p}") for p in range(_N_PERM)
    )  # identical docs -> identical minima -> identical bits -> b-bit exact


def test_kmeans_train_invariants(spark):
    """Lloyd's monotonicity on the integer contract: round 1 moves
    every vector; inertia never increases across rounds beyond the
    integer-mean rounding slack (each centroid dim is floor-rounded by
    <1 micro unit, which perturbs a squared distance by at most
    2·|xm−cm|+1 per dim); the shift keeps every xm non-negative so
    Spark DIV == DuckDB // throughout."""
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        _KM_ROUNDS,
        _KM_SHIFT,
        _km_points,
        sim_kmeans_centroids,
        sim_kmeans_train,
    )

    pts = _km_points(spark, SF_CORRECT)
    lo, hi, n_vec = (
        pts.agg(
            F.min("xm"), F.max("xm"), F.countDistinct("vec_id")
        ).collect()[0]
    )
    assert lo >= 0, "shift must land every micro dim in the non-negative domain"
    assert hi < 2 * _KM_SHIFT

    rows = sim_kmeans_train(spark, SF_CORRECT).collect()
    assert [r.iter for r in rows] == list(range(1, _KM_ROUNDS + 1))
    assert rows[0].n_moved == n_vec  # round 1 assigns everything
    # rounding slack: n_vec points x 64 dims x (2*2*SHIFT + 1) micro^2,
    # expressed in milli units (the report's scale), conservatively
    slack = n_vec * 64 * (4 * _KM_SHIFT + 1) // 1000 + n_vec
    for a, b in zip(rows, rows[1:]):
        assert b.inertia_milli <= a.inertia_milli + slack
        assert 0 <= b.n_moved <= n_vec

    cents = sim_kmeans_centroids(spark, SF_CORRECT).collect()
    assert 1 <= len(cents) <= 8
    assert sum(c.n_members for c in cents) == n_vec
    for c in cents:
        vals = c.centroid_csv.split(",")
        assert len(vals) == 64
        assert all(v.lstrip("-").isdigit() for v in vals)


def test_mixture_temperature_invariants(spark):
    """Temperature mixing sanity: weights sum to 1e6 within floor
    slack, allocations sum to at most the budget (one corpus pass),
    and the alpha=1/2 tilt points the right way — the biggest source
    is subsampled relative to the smallest (fewer effective epochs)."""
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        dataset_mixture_temperature,
    )

    rows = dataset_mixture_temperature(spark, SF_CORRECT).collect()
    assert len(rows) >= 2
    t_total = sum(r.n_tokens for r in rows)
    assert 1_000_000 - len(rows) <= sum(r.weight_ppm for r in rows) <= 1_000_000
    assert sum(r.alloc_tokens for r in rows) <= t_total
    biggest = max(rows, key=lambda r: r.n_tokens)
    smallest = min(rows, key=lambda r: r.n_tokens)
    if biggest.n_tokens > smallest.n_tokens:
        assert biggest.epochs_milli < smallest.epochs_milli
        assert biggest.epochs_milli < 1000 < smallest.epochs_milli


def test_classifier_calibration_invariants(spark):
    """Calibration report conservation: bucket counts sum to the
    corpus, every rate is a valid ppm, the gap is exactly
    |mean_pred - actual|, and mean_pred lies inside its decile's score
    range (deciles are defined BY the score)."""
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_classifier_calibration,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = curation_classifier_calibration(spark, SF_CORRECT).collect()
    docs = load_table(spark, SF_CORRECT, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r.decile <= 9
        assert 0 <= r.mean_pred_ppm <= 1_000_000
        assert 0 <= r.actual_ppm <= 1_000_000
        assert r.abs_gap_ppm == abs(r.mean_pred_ppm - r.actual_ppm)
        lo = r.decile * 100_000
        hi = 1_000_000 if r.decile == 9 else (r.decile + 1) * 100_000 - 1
        # integer floor mean of values in [lo, hi] stays in [lo, hi]
        assert lo <= r.mean_pred_ppm <= hi


def test_embedding_drift_invariants(spark):
    """Drift profile structure: one row per dimension, means inside
    the micro-unit range of the actual data, delta consistent with the
    two means (the report's own arithmetic), and near-zero drift on
    the synthetic store (both halves are the same distribution)."""
    from kafka_flink_streaming_pipeline_spark.plans.profiling import (
        _EMB_DIM,
        _embedding_drift,
    )

    rows = _embedding_drift(spark, SF_CORRECT).collect()
    assert [r.dim for r in rows] == list(range(_EMB_DIM))
    for r in rows:
        assert -2_000_000 < r.mean_ref_micro < 2_000_000
        assert -2_000_000 < r.mean_cur_micro < 2_000_000
        assert r.abs_delta_micro == abs(r.mean_cur_micro - r.mean_ref_micro)
    # stationary synthetic store: per-dim mean shift stays small
    assert max(r.abs_delta_micro for r in rows) < 200_000


def test_erasure_audit_cascade_consistency(spark):
    """The audit's counts must equal what the delete would remove:
    anti-join survivors + erased == total per table, and the orders
    and lineitem hops agree with independently computed cascades."""
    from kafka_flink_streaming_pipeline_spark.plans.profiling import _erasure_audit
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    rows = {r.table_name: r for r in _erasure_audit(spark, SF_CORRECT).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    cust = load_table(spark, SF_CORRECT, "customer")
    orders = load_table(spark, SF_CORRECT, "orders")
    li = load_table(spark, SF_CORRECT, "lineitem")
    assert rows["customer"].n_rows == cust.count()
    assert rows["customer"].n_erased == cust.filter("c_custkey % 97 = 0").count()
    blocked_orders = orders.filter("o_custkey % 97 = 0")
    assert rows["orders"].n_erased == blocked_orders.count()
    li_erased = li.join(
        blocked_orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    ).count()
    assert rows["lineitem"].n_erased == li_erased
    for r in rows.values():
        assert 0 <= r.n_erased <= r.n_rows
        assert r.erased_ppm == r.n_erased * 1_000_000 // r.n_rows


def test_fertility_conserves_apply_counts(spark):
    """The per-language fertility rollup must conserve the per-doc
    apply counts exactly (same vocab join, different GROUP BY), and
    every fertility must be >= 1000 milli (a word is at least one
    token)."""
    from kafka_flink_streaming_pipeline_spark.operators.bpe import (
        bpe_apply,
        bpe_fertility,
    )

    frows = bpe_fertility(spark, SF_CORRECT).collect()
    arows = bpe_apply(spark, SF_CORRECT).collect()
    assert sum(r.n_words for r in frows) == sum(r.n_words for r in arows)
    assert sum(r.n_bpe_tokens for r in frows) == sum(r.n_bpe_tokens for r in arows)
    for r in frows:
        assert r.fertility_milli >= 1000
        assert 0 < r.vs_char_ppm <= 1_000_000
        assert r.fertility_milli == r.n_bpe_tokens * 1000 // r.n_words


def test_mixture_apply_achieves_target_epochs(spark):
    """The materialized mixture must land near the computed target:
    per source, achieved epochs within the fractional-draw sampling
    noise of epochs_milli (binomial over n docs — use a generous 4-sigma
    bound), floor(epochs) repeats guaranteed (achieved >= floor part),
    and token mass consistent with the doc expansion."""
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        dataset_mixture_apply,
        dataset_mixture_temperature,
    )

    target = {r.source: r for r in dataset_mixture_temperature(spark, SF_CORRECT).collect()}
    rows = dataset_mixture_apply(spark, SF_CORRECT).collect()
    assert set(r.source for r in rows) == set(target)
    for r in rows:
        t = target[r.source]
        floor_part = t.epochs_milli // 1000
        # structural per-source bounds: every doc gets its floor copies
        # unconditionally, the fractional admit adds at most one more
        assert (
            floor_part * r.n_docs
            <= r.expanded_docs
            <= (floor_part + 1) * r.n_docs
        )
        assert r.unique_docs <= r.n_docs
        assert r.expanded_docs >= r.unique_docs
    # the statistical check is corpus-level (a fixed md5 draw can
    # cluster within one small source; across 500 docs it can't):
    # total admitted ~ sum of independent Bernoullis
    exp_admit = sum(
        target[r.source].epochs_milli % 1000 * r.n_docs / 1000 for r in rows
    )
    var = sum(
        (target[r.source].epochs_milli % 1000 / 1000)
        * (1 - target[r.source].epochs_milli % 1000 / 1000)
        * r.n_docs
        for r in rows
    )
    got_admit = sum(
        r.expanded_docs - (target[r.source].epochs_milli // 1000) * r.n_docs
        for r in rows
    )
    assert abs(got_admit - exp_admit) <= 4 * var**0.5 + 1


def test_zipf_head_share_monotone(spark):
    """Coverage is monotone in K, shares are valid ppm, counts
    conserve against the vocabulary, and the head is heavy (top-1000
    covers more than top-1 by construction on any non-degenerate
    corpus)."""
    from kafka_flink_streaming_pipeline_spark.operators.text import (
        vocabulary,
        zipf_head_share,
    )

    rows = zipf_head_share(spark, SF_CORRECT).collect()
    assert [r.k for r in rows] == [1, 10, 100, 1000]
    v = vocabulary(spark, SF_CORRECT)
    v_size, v_tokens = v.count(), v.agg({"tf": "sum"}).first()[0]
    for r in rows:
        assert r.n_types == min(r.k, v_size)
        assert r.total_tokens == v_tokens
        assert 0 < r.share_ppm <= 1_000_000
        assert r.share_ppm == r.covered_tokens * 1_000_000 // r.total_tokens
    for a, b in zip(rows, rows[1:]):
        assert b.covered_tokens >= a.covered_tokens
    if v_size >= 1000:
        assert rows[-1].covered_tokens > rows[0].covered_tokens


def test_threshold_sweep_monotone(spark):
    """Raising the cutoff can only shrink the kept set: n_pass and
    tokens_kept are non-increasing in the threshold; every count
    conserves against the corpus; the pipeline's own 0.25 gate lies
    between the 0.2 and 0.3 sweep points by construction."""
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        curation_threshold_sweep,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = curation_threshold_sweep(spark, SF_CORRECT).collect()
    assert [r.threshold_ppm for r in rows] == list(range(100_000, 1_000_000, 100_000))
    n = load_table(spark, SF_CORRECT, "documents").count()
    for r in rows:
        assert r.n_docs == n
        assert 0 <= r.n_pass <= n
        assert r.pass_ppm == r.n_pass * 1_000_000 // n
    for a, b in zip(rows, rows[1:]):
        assert b.n_pass <= a.n_pass
        assert b.tokens_kept <= a.tokens_kept


def test_release_manifest_digest_properties(spark):
    """The release digest must (a) reconcile with the split-assignment
    counts, (b) be reproducible run-to-run, and (c) flip when any
    single document's TEXT changes — checked by recomputing the same
    xor digest independently in Python over the parquet bytes."""
    import hashlib

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators.corpus import (
        corpus_release_manifest,
    )
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        _TRAIN_PCT,
        _VAL_PCT,
        dataset_split_assign,
    )

    rows = corpus_release_manifest(spark, SF_CORRECT).collect()
    again = corpus_release_manifest(spark, SF_CORRECT).collect()
    assert rows == again  # deterministic

    split_totals: dict[str, int] = {}
    for r in rows:
        split_totals[r["split"]] = split_totals.get(r["split"], 0) + r["n_docs"]
    assign = {
        (r["split"], r["lang"]): r["docs"]
        for r in dataset_split_assign(spark, SF_CORRECT).collect()
    }
    for split in ("train", "val", "test"):
        assert split_totals[split] == sum(
            v for (s, _), v in assign.items() if s == split
        )

    # independent Python recomputation of one (source, split) digest
    t = pq.read_table(f"{SF_CORRECT}/documents.parquet")
    docs = list(zip(t.column("doc_id").to_pylist(),
                    t.column("source").to_pylist(),
                    t.column("text").to_pylist()))

    def split_of(vid: int) -> str:
        b = int(hashlib.md5(str(vid).encode()).hexdigest()[:4], 16) % 100
        return (
            "train"
            if b < _TRAIN_PCT
            else ("val" if b < _TRAIN_PCT + _VAL_PCT else "test")
        )

    target = rows[0]
    expect = 0
    for vid, src, text in docs:
        if src == target["source"] and split_of(vid) == target["split"]:
            expect ^= int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
    assert target["content_digest"] == expect

    # flipping one doc's text flips exactly its group's digest
    mutated = spark.createDataFrame(
        [
            (vid, text + " x" if vid == docs[0][0] else text, "en", src, len(text))
            for vid, src, text in docs
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    import tempfile

    out = tempfile.mkdtemp()
    mutated.coalesce(1).write.mode("overwrite").parquet(out + "/documents.parquet")
    mut_rows = {
        (r["source"], r["split"]): r["content_digest"]
        for r in corpus_release_manifest(spark, out).collect()
    }
    base_rows = {(r["source"], r["split"]): r["content_digest"] for r in rows}
    changed = {k for k in base_rows if base_rows[k] != mut_rows.get(k)}
    vid0, src0, _ = docs[0]
    assert changed == {(src0, split_of(vid0))}


def test_ngram_novelty_planted_duplicates(spark, tmp_path):
    """Novelty semantics on a planted corpus: an exact duplicate of an
    earlier doc is 0-novel, fresh text is fully novel, first occurrence
    attributes to the SMALLEST doc_id, short docs report the -1
    sentinel, and novel counts conserve (sum of n_novel == distinct
    corpus shingles)."""
    from kafka_flink_streaming_pipeline_spark.operators.text import (
        ngram_novelty,
    )

    docs = [
        (1, "alpha beta gamma delta", "en", "web", 22),     # 2 shingles, all novel
        (2, "alpha beta gamma delta", "en", "web", 22),     # exact dup → 0 novel
        (3, "epsilon zeta eta theta iota", "en", "web", 27),# fresh → all novel
        (4, "beta gamma delta", "en", "web", 16),           # 1 shingle, seen in doc 1
        (5, "tiny doc", "en", "web", 8),                    # <3 words → sentinel
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(sf + "/documents.parquet")

    rows = {r["doc_id"]: r for r in ngram_novelty(spark, sf).collect()}
    assert rows[1]["n_shingles"] == 2 and rows[1]["novelty_ppm"] == 1_000_000
    assert rows[2]["n_shingles"] == 2 and rows[2]["n_novel"] == 0
    assert rows[2]["novelty_ppm"] == 0
    assert rows[3]["novelty_ppm"] == 1_000_000
    assert rows[4]["n_shingles"] == 1 and rows[4]["n_novel"] == 0
    assert rows[5]["n_shingles"] == 0 and rows[5]["novelty_ppm"] == -1
    # conservation: every distinct corpus shingle is novel exactly once
    assert sum(r["n_novel"] for r in rows.values()) == 2 + 3 + 1 + 0 - 1
    # (doc1's 2 + doc3's 3; doc4's shingle and doc2's are re-seen) = 5
    assert sum(r["n_novel"] for r in rows.values()) == 5


def test_int8_topk_agreement_invariants(spark):
    """Quantization-QA report invariants at sf0.01: one row per fixed
    query, overlap bounded by k, ppm consistent with the integer
    two-step rule, and — on the real fixture — int8 preserves most of
    the float top-10 (the property that justifies serving from the
    quantized store; the exact overlap value is pinned by the DuckDB
    oracle in test_oracle_parity)."""
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        _N_QUERIES,
        _TOP_K,
        int8_topk_agreement,
    )

    rows = int8_topk_agreement(spark, SF_CORRECT).collect()
    assert [r["query_id"] for r in rows] == list(range(_N_QUERIES))
    for r in rows:
        assert 0 <= r["n_common"] <= _TOP_K
        assert r["overlap_ppm"] == r["n_common"] * 1_000_000 // _TOP_K
    # int8 should agree with float on the clear majority of neighbors
    assert sum(r["n_common"] for r in rows) >= _N_QUERIES * _TOP_K // 2


def test_diversity_sample_invariants(spark):
    """Keeper-list semantics at sf0.01: at least one keeper per
    occupied cell, never more than max(1, n_cell DIV 5), ranks are
    1..k_cell contiguous, and keepers are the cell's TOP-quality docs
    (no kept doc may be outranked by a dropped doc of the same cell —
    verified via the global quality order)."""
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        _DIV_KEEP_DENOM,
        diversity_sample,
    )

    rows = diversity_sample(spark, SF_CORRECT).collect()
    assert rows
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["centroid_id"], []).append(r)
    for cell, kept in by_cell.items():
        ranks = sorted(r["rank_in_cell"] for r in kept)
        assert ranks == list(range(1, len(ranks) + 1))
        # kept set is closed under the (qppm desc, doc_id asc) order
        ordered = sorted(kept, key=lambda r: (-r["qppm"], r["doc_id"]))
        assert [r["rank_in_cell"] for r in ordered] == ranks
    # global: cells partition the kept docs (no doc kept twice)
    doc_ids = [r["doc_id"] for r in rows]
    assert len(doc_ids) == len(set(doc_ids))
    # keep fraction is ~1/denom of the corpus: per cell keep is
    # max(1, n DIV denom), so the total sits within one flooring
    # (±1 per cell) of the exact 1/denom share
    n_corpus = 500
    n_cells = len(by_cell)
    assert (
        n_corpus // _DIV_KEEP_DENOM - n_cells
        <= len(rows)
        <= n_corpus // _DIV_KEEP_DENOM + n_cells
    )


def test_source_vocab_overlap_invariants(spark):
    """Matrix semantics at sf0.01: one row per unordered source pair,
    jaccard bounded by [0, 1e6], ppm consistent with the two-step
    integer rule, and symmetric by construction (source_a < source_b)."""
    from kafka_flink_streaming_pipeline_spark.operators.text import (
        source_vocab_overlap,
    )
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    rows = source_vocab_overlap(spark, SF_CORRECT).collect()
    sources = sorted(
        r["source"]
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("source")
        .distinct()
        .collect()
    )
    n = len(sources)
    assert len(rows) == n * (n - 1) // 2
    for r in rows:
        assert r["source_a"] < r["source_b"]
        assert 0 <= r["jaccard_ppm"] <= 1_000_000
        assert r["n_common"] >= 0


def test_moore_lewis_planted_domain(spark, tmp_path):
    """Selection semantics on a planted corpus: docs made of the
    target domain's (min(source)) characteristic words score negative
    Δ and are selected; docs of pure out-of-domain vocabulary score
    positive Δ and are rejected; Δ of a doc whose words appear ONLY
    in-domain is strictly more negative than a mixed doc's."""
    from kafka_flink_streaming_pipeline_spark.operators.curation import (
        moore_lewis_select,
    )

    docs = [
        # source "a_domain" sorts first → the target domain
        (1, "quark gluon lepton boson quark gluon", "en", "a_domain", 40),
        (2, "quark boson quark lepton gluon boson", "en", "a_domain", 40),
        (3, "quark gluon lepton", "en", "web", 19),          # pure in-domain words
        (4, "apple banana cherry date apple banana", "en", "web", 40),
        (5, "quark apple gluon banana", "en", "web", 24),    # mixed
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    )
    sf = str(tmp_path)
    df.coalesce(1).write.mode("overwrite").parquet(sf + "/documents.parquet")

    rows = {r["doc_id"]: r for r in moore_lewis_select(spark, sf).collect()}
    assert rows[3]["selected"] and rows[3]["avg_delta_nll"] < 0
    assert not rows[4]["selected"] and rows[4]["avg_delta_nll"] > 0
    assert rows[3]["avg_delta_nll"] < rows[5]["avg_delta_nll"] < rows[4]["avg_delta_nll"]
    # in-domain docs select themselves (standard Moore-Lewis behavior)
    assert rows[1]["selected"] and rows[2]["selected"]
