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
