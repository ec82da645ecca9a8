"""Semantic invariants of the r9 late additions — `hybrid_retrieval_mmr`
and `dedup_soft_reweight` — beyond the oracle hash-compare (which checks
cross-engine agreement, not that the math means what the docstring
claims).

MMR (Carbonell & Goldstein 1998) invariants:
- rank 1 is the pure-relevance argmax (empty picked set → the paper's
  convention drops the penalty term, so round 1's score ordering is
  λ·rel ≡ rel ordering);
- picks are distinct candidates;
- pick-time MMR scores are non-increasing FROM RANK 2 ON: each
  candidate's max-sim-to-picked only ever grows once it exists, so the
  pool's best achievable score cannot increase between penalized
  rounds. Rank 1 carries no penalty term and maxsim may be NEGATIVE
  (anti-similar candidates get boosted, per the paper), so rank 2's
  score may legitimately exceed rank 1's.

SoftDedup (He et al., ACL 2024) invariants:
- every document appears exactly once;
- singleton components carry weight exactly 1_000_000 ppm;
- per component, sum(weight_ppm) = size·(1e6 DIV size) — within one
  comp_size of 1e6 from below (integer-DIV floor), i.e. each component
  contributes ~one document of expected mass.
"""

from __future__ import annotations

from collections import defaultdict

from tests.conftest import SF_CORRECT


def test_mmr_greedy_invariants(spark):
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        _MMR_K,
        hybrid_retrieval_mmr,
    )

    rows = hybrid_retrieval_mmr(spark, SF_CORRECT).collect()
    by_q = defaultdict(list)
    for r in rows:
        by_q[r.query_id].append(r)
    assert len(by_q) == 5
    # int8 relevance top-1 (same scoring layout, symmetric codes differ
    # from topk_cosine_int8's asymmetric float-query side — so recompute
    # rank-1 from the MMR output itself: rank 1 must have max rel6)
    for q, picks in by_q.items():
        picks.sort(key=lambda r: r.rank)
        assert [p.rank for p in picks] == list(range(1, _MMR_K + 1))
        assert len({p.cand_id for p in picks}) == _MMR_K
        assert picks[0].rel6 == max(p.rel6 for p in picks), q
        scores = [p.mmr6 for p in picks]
        assert all(a >= b for a, b in zip(scores[1:], scores[2:])), (q, scores)


def test_mmr_ann_same_greedy_contract(spark):
    """The ANN-armed variant returns the same shape under the same
    greedy contract (ranks 1..K per query, distinct picks, pick scores
    non-increasing from rank 2), and its picks agree with the exact anchor's in
    aggregate — the shortlist is approximate, the reranker identical,
    so disagreement is bounded by ADC shortlist recall. Measured on the
    driver testdata: per-query overlap 5/5/2/7/7 of 10 — one query sits
    in a tight cluster where ADC collapses within-cluster order (the
    documented `sim_topk_cosine_pq` behavior), so the floor is a
    MAJORITY ACROSS ALL PICKS plus per-query non-disjointness, not a
    per-query majority."""
    from kafka_flink_streaming_pipeline_spark.operators.similarity import (
        _MMR_K,
        hybrid_retrieval_mmr,
        hybrid_retrieval_mmr_ann,
    )

    exact = defaultdict(set)
    for r in hybrid_retrieval_mmr(spark, SF_CORRECT).collect():
        exact[r.query_id].add(r.cand_id)
    by_q = defaultdict(list)
    for r in hybrid_retrieval_mmr_ann(spark, SF_CORRECT).collect():
        by_q[r.query_id].append(r)
    assert set(by_q) == set(exact)
    total_overlap = 0
    for q, picks in by_q.items():
        picks.sort(key=lambda r: r.rank)
        assert [p.rank for p in picks] == list(range(1, _MMR_K + 1))
        assert len({p.cand_id for p in picks}) == _MMR_K
        scores = [p.mmr6 for p in picks]
        assert all(a >= b for a, b in zip(scores[1:], scores[2:])), (q, scores)
        overlap = len({p.cand_id for p in picks} & exact[q])
        assert overlap >= 1, q
        total_overlap += overlap
    # Pinned snapshot (single source of truth — r11 ADVICE retired the
    # 40% floor it subsumed): both arms are deterministic on fixed
    # testdata, so ANY drift (26 -> 25 as much as 26 -> 20) is a
    # behavior change that should be seen, not absorbed by a floor.
    # Re-baseline deliberately when testdata is regenerated or the ANN
    # shortlist parameters change; sanity context: 26/50 picks overlap
    # the exact arm at this SF (the semantic contract — same greedy
    # core, per-query overlap >= 1, monotone mmr6, exact rank ladder —
    # is asserted above and is scale-independent).
    assert total_overlap == 26, total_overlap


def test_soft_reweight_mass_conservation(spark):
    from kafka_flink_streaming_pipeline_spark.operators.datasets import (
        dedup_soft_reweight,
    )

    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    rows = dedup_soft_reweight(spark, SF_CORRECT).collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    # full corpus coverage, not just uniqueness-on-the-survivors: the
    # labeling seeds every doc and nothing downstream may drop rows
    assert len(rows) == load_table(spark, SF_CORRECT, "documents").count()
    comp_mass = defaultdict(int)
    comp_size = {}
    for r in rows:
        assert r.weight_ppm == 1_000_000 // r.comp_size
        comp_mass[r.component_id] += r.weight_ppm
        comp_size[r.component_id] = r.comp_size
    assert any(s > 1 for s in comp_size.values()), "testdata lost its near-dups"
    for cid, mass in comp_mass.items():
        assert 1_000_000 - comp_size[cid] < mass <= 1_000_000, cid


def test_semantic_cap_bounds_pairwise_groups(spark):
    """The r11 cap claim: after the 2xLCG high-bits re-split, no
    pairwise group (centroid_id, sub_id) materially exceeds
    `_SEM_CELL_CAP` — multinomial balance, not worst-case 1-cell
    concentration. 2x slack absorbs binomial variance at tiny cell
    counts; the sub-cell count per cell must be exactly
    ceil(|cell|/CAP)."""
    import math

    from pyspark.sql import functions as F

    from kafka_flink_streaming_pipeline_spark.operators import similarity as S
    from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

    e = load_table(spark, SF_CORRECT, "embeddings")
    n = e.count()
    k = int(min(65536, max(1, math.ceil(math.sqrt(n / S._SEM_PAIR_WEIGHT)))))
    wn = e.select(
        "vec_id",
        "embedding",
        F.sqrt(S._dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    m = S._ivf_assign(wn, k=k).select("vec_id", "centroid_id")
    sizes = m.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.ceil(F.count(F.lit(1)) / F.lit(float(S._SEM_CELL_CAP))).alias("n_sub"),
    )
    for r in sizes.collect():
        assert r.n_sub == math.ceil(r.cnt / S._SEM_CELL_CAP), r
    x = F.col("vec_id") % F.lit(4294967296)
    for _ in range(2):
        x = (x * F.lit(S._SEM_HASH_MULT) + F.lit(S._SEM_HASH_INC)) % F.lit(4294967296)
    sub = m.join(F.broadcast(sizes), "centroid_id").withColumn(
        "sub_id", F.shiftright(x, 16) % F.col("n_sub")
    )
    max_group = (
        sub.groupBy("centroid_id", "sub_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_group <= 2 * S._SEM_CELL_CAP, max_group
