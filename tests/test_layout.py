"""Z-order layout: parquet footer min/max stats must prune files on
EVERY clustered column, not just the sort column.

Methodology: write `orders` twice — linear-sorted on o_custkey (the
reference's one-access-path layout) and Morton-clustered on
(o_custkey, o_totalprice) — then, WITHOUT reading any data, count how
many files a narrow band predicate on each column could skip using
only footer statistics (exactly what Spark's parquet reader does with
min/max row-group stats at scan time)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from kafka_flink_streaming_pipeline_spark.operators.layout import (
    write_linear_sorted,
    write_zordered,
)
from kafka_flink_streaming_pipeline_spark.sources.batch import load_table

from .conftest import SF_CORRECT

N_FILES = 16


def _overlapping_files(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files) — footer
    stats only, no data pages touched."""
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert files, path
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin = min(
            md.row_group(g).column(_col_idx(md, column)).statistics.min
            for g in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(g).column(_col_idx(md, column)).statistics.max
            for g in range(md.num_row_groups)
        )
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit, len(files)


def _col_idx(md, name: str) -> int:
    for i in range(md.num_columns):
        if md.row_group(0).column(i).path_in_schema == name:
            return i
    raise KeyError(name)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    orders = load_table(spark, SF_CORRECT, "orders")
    linear = str(base / "linear")
    zorder = str(base / "zorder")
    write_linear_sorted(orders, "o_custkey", linear, N_FILES)
    write_zordered(orders, ["o_custkey", "o_totalprice"], zorder, N_FILES)
    # band predicates: ~2%-selectivity, placed at the 40th percentile —
    # off the median, where a band would straddle the top Morton bit
    # boundary and overlap cells on both sides of the curve's main fold
    row = (
        orders.selectExpr(
            "percentile_disc(0.40) WITHIN GROUP (ORDER BY o_custkey) AS ck_lo",
            "percentile_disc(0.42) WITHIN GROUP (ORDER BY o_custkey) AS ck_hi",
            "percentile_disc(0.40) WITHIN GROUP (ORDER BY o_totalprice) AS tp_lo",
            "percentile_disc(0.42) WITHIN GROUP (ORDER BY o_totalprice) AS tp_hi",
        )
        .collect()[0]
    )
    return linear, zorder, row


def test_zorder_prunes_secondary_column(layouts):
    """The layout's whole point: a band on o_totalprice — invisible to
    the linear custkey sort — must prune most z-ordered files."""
    linear, zorder, b = layouts
    lin_hit, lin_n = _overlapping_files(linear, "o_totalprice", b.tp_lo, b.tp_hi)
    z_hit, z_n = _overlapping_files(zorder, "o_totalprice", b.tp_lo, b.tp_hi)
    assert lin_n == z_n == N_FILES
    # linear-by-custkey files each span ~the full price range: no pruning
    assert lin_hit >= N_FILES - 1
    # 16 files ≈ a 4x4 Morton grid: a narrow band touches ~one row of cells
    assert z_hit <= N_FILES // 2
    assert z_hit < lin_hit


def test_zorder_still_prunes_primary_column(layouts):
    """Clustering must not give up the first column entirely: a custkey
    band still skips files (worse than the dedicated sort, better than
    nothing)."""
    linear, zorder, b = layouts
    lin_hit, _ = _overlapping_files(linear, "o_custkey", b.ck_lo, b.ck_hi)
    z_hit, _ = _overlapping_files(zorder, "o_custkey", b.ck_lo, b.ck_hi)
    assert lin_hit <= 2  # dedicated sort: near-perfect pruning
    # partial locality: custkey holds the even (lower) interleave bits,
    # so its cells are finer than the file split — expect roughly half
    # the files skipped, never none (measured 6-8/16 across band spots)
    assert z_hit <= 10
    assert z_hit < N_FILES


def test_zorder_preserves_rows(spark, layouts):
    """Layout changes nothing about content: same rows, same count."""
    linear, zorder, _ = layouts
    orders = load_table(spark, SF_CORRECT, "orders")
    z = spark.read.parquet(zorder)
    assert z.count() == orders.count()
    assert sorted(z.columns) == sorted(orders.columns)
    assert z.exceptAll(orders).count() == 0
