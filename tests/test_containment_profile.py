"""Invariant tests pinning `dedup_containment_profile` to its
candidate set (the estimated-containment decile rollup added in r11 as
the scale-battery face of `dedup_containment_lsh`)."""

from __future__ import annotations

from tests.conftest import SF_CORRECT


def test_containment_profile_conserves_pair_mass(spark):
    """Invariants that pin the profile to its candidate set:
    - sum(n_pairs) == 2 * |LSH candidate pairs| (each pair contributes
      exactly one directed row per side, unthresholded),
    - every decile in [0, 9],
    - n_contained_docs <= n_pairs per decile, and
    - sum_containment_ppm sits inside the decile's ppm bounds
      (bucket 9 is open-topped: the jaccard->containment inversion is
      capped at min(c1,c2)/c_self <= ... <= c_other/c_self, so ppm can
      exceed 1e6 only via the det-round half-up, never the cap)."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        dedup_containment_profile,
        dedup_minhash_lsh,
    )

    rows = dedup_containment_profile(spark, SF_CORRECT).collect()
    n_cand = dedup_minhash_lsh(spark, SF_CORRECT).count()
    assert sum(r.n_pairs for r in rows) == 2 * n_cand
    for r in rows:
        assert 0 <= r.decile <= 9
        assert 1 <= r.n_contained_docs <= r.n_pairs
        lo, hi = r.decile * 100_000, (r.decile + 1) * 100_000
        assert r.sum_containment_ppm >= lo * r.n_pairs
        if r.decile < 9:
            assert r.sum_containment_ppm < hi * r.n_pairs


def test_containment_bounded_subset_of_anchor(spark):
    """The bounded variant (estimate-screened exact verify, r12) must be
    a SUBSET of the unscreened anchor `dedup_containment_lsh` with
    IDENTICAL containment values on the surviving rows — the screen may
    only remove rows (estimate undershoot), never change or add one.
    At this SF the screen margin loses nothing (subset == equal), which
    also exercises the screen's pass path end-to-end."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        dedup_containment_bounded,
        dedup_containment_lsh,
    )

    anchor = {
        (r.contained_doc, r.container_doc): r.containment
        for r in dedup_containment_lsh(spark, SF_CORRECT).collect()
    }
    bounded = {
        (r.contained_doc, r.container_doc): r.containment
        for r in dedup_containment_bounded(spark, SF_CORRECT).collect()
    }
    assert bounded, "screen must admit the high-containment pairs"
    assert set(bounded) <= set(anchor)
    for k, v in bounded.items():
        assert v == anchor[k], k
    # measured at this SF: the 0.8 estimate screen admits every >=0.9
    # exact pair (no recall loss at oracle scale) — a deliberate
    # change-detector like the MMR overlap pin
    assert set(bounded) == set(anchor)
