"""Z-order (Morton-curve) multi-dimensional data layout.

The reference lays data out for exactly ONE access path: Hive-style
`platform=/event_date=` directories with rows time-sorted inside each
partition (`notebooks/preprocess.ipynb` cell 11,
`streaming/kafka_stream_producer.py:242-259`). That gives perfect
pruning on the partition keys and nothing on any other column — a
second query dimension (e.g. "orders for this price band") must scan
every file.

Z-ordering is the standard lakehouse answer (Delta/Iceberg OPTIMIZE
ZORDER): interleave the bits of several columns into one Morton key and
range-partition + sort files by it, so every clustered column gets
*partial* locality and parquet min/max footer stats prune files on ANY
of them. This module implements it with pure Catalyst expressions:

1. each column is min-max scaled to a `bits`-wide integer grid using a
   broadcast 1-row bounds aggregate (one extra pass; at 100 TB the
   bounds can come from footer stats instead — same plan downstream);
2. the Morton key is built by bit interleaving (`shiftright`/`&`/
   `shiftleft`/`|` — JVM-side, whole-stage codegen, no UDF);
3. `repartitionByRange(n_files, z)` + `sortWithinPartitions(z)` writes
   files whose per-column min/max ranges are hypercubes instead of
   full-range stripes.

Everything is a narrow map-side expression except the single range
shuffle — the same shuffle a linear sort would pay. Verified by
`tests/test_layout.py`, which reads the parquet footers back and counts
how many files a band predicate on EACH clustered column can skip.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[Column, DataFrame]:
    """Morton (Z-curve) key over `cols`: min-max scale each column onto a
    2^bits grid (broadcast 1-row bounds), then interleave the bits.
    Total key width = bits * len(cols) and must fit in 63 bits."""
    assert bits * len(cols) <= 63, "Morton key must fit a signed long"
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    )
    grid = float((1 << bits) - 1)

    def scaled(c: str) -> Column:
        lo, hi = F.col(f"_lo_{c}"), F.col(f"_hi_{c}")
        rng = hi - lo
        return (
            F.when(rng <= 0, F.lit(0))
            .otherwise(F.floor((F.col(c).cast("double") - lo) / rng * grid))
            .cast("long")
        )

    cells = [scaled(c) for c in cols]
    z = reduce(
        lambda acc, term: acc.bitwiseOR(term),
        (
            F.shiftleft(
                F.shiftright(cell, i).bitwiseAND(F.lit(1)),
                i * len(cols) + j,
            )
            for i in range(bits)
            for j, cell in enumerate(cells)
        ),
        F.lit(0).cast("long"),
    )
    return z, bounds


def write_zordered(
    df: DataFrame, cols: list[str], out_dir: str, n_files: int, bits: int = 16
) -> None:
    """Write `df` as `n_files` parquet files clustered on the Morton key
    of `cols`. One range shuffle (the same cost as a linear sort); the
    broadcast bounds join is map-side."""
    z, bounds = morton_key(df, cols, bits)
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", *[c for c in bounds.columns])
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def write_linear_sorted(df: DataFrame, col: str, out_dir: str, n_files: int) -> None:
    """The single-column baseline layout (what the reference's
    time-sorted files do): range-partition + sort on one column."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
