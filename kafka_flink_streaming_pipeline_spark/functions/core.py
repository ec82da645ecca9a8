"""Exact-semantics scalar function layer (reference §2.8, F1-F18).

Every scalar expression the reference uses, re-expressed as built-in
Catalyst expressions (JVM-side, whole-stage-codegen'd — zero Python in
the hot path, matching the reference's zero-UDF surface, SURVEY.md
§2.10). Keeping these in one module pins the semantics the oracle tests
depend on: the epoch anchor, the `yyyyMMddHHmm` redis key format, the
`>`-delimited geo split, and the CASE traffic-source decode.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_flink_streaming_pipeline_spark.session import EPOCH_ANCHOR_MS


def event_time_from_offset(timestamp_ms: Column) -> Column:
    """F1: `TO_TIMESTAMP_LTZ(timestamp + 1465876799998, 3)`
    (events_postgres_sink.sql:21) → absolute event time."""
    return F.timestamp_millis(timestamp_ms + F.lit(EPOCH_ANCHOR_MS))


def geo_part(geo: Column, n: int) -> Column:
    """F8: `split_part(geo_location, '>', n)` (flink-analysis.sql:61-63).

    Postgres split_part returns '' for missing parts; Spark's
    ``split_part`` matches that, so 1- and 2-part geo values behave
    identically.
    """
    return F.split_part(geo, F.lit(">"), F.lit(n))


def decode_traffic_source(src: Column) -> Column:
    """P7: CASE decode 1/2/3 → Desktop/Mobile/Tablet else Other
    (flink-analysis.sql:80-85)."""
    return (
        F.when(src == 1, "Desktop")
        .when(src == 2, "Mobile")
        .when(src == 3, "Tablet")
        .otherwise("Other")
    )


def redis_feature_key(uuid: Column, window_end: Column) -> Column:
    """F3/F4: `CONCAT('feat:user:{', uuid, '}:', DATE_FORMAT(win_end,
    'yyyyMMddHHmm'))` (redis_sink copy.sql:172-174). The `{...}` hash
    tag keeps one user's feature rows on one Redis-cluster slot."""
    return F.concat(
        F.lit("feat:user:{"),
        uuid.cast("string"),
        F.lit("}:"),
        F.date_format(window_end, "yyyyMMddHHmm"),
    )


def synth_geo(event_type: Column, user_id: Column, k: Column) -> Column:
    """Deterministic `CC>STATE>DMA`-shaped geo string for the driver
    testdata (which has no geo column). Built identically in the DuckDB
    oracle so split_part semantics (flink-analysis.sql:61-63) are
    exercised end-to-end on real grouped data."""
    return F.concat_ws(
        ">",
        F.upper(F.substring(event_type, 1, 2)),
        (user_id % 5).cast("string"),
        (k % 10).cast("string"),
    )


def det_round(col: Column, digits: int = 6) -> Column:
    """Environment-proof replacement for ``F.round`` on DOUBLE output
    columns that the driver value-hashes.

    ``round(x, n)`` is implemented differently per engine — Spark goes
    through BigDecimal HALF_UP on the shortest decimal string repr,
    DuckDB computes ``std::round(x * 10^n) / 10^n`` — so near-tie
    quotients can hash-diverge across environments even when the input
    double is bit-identical (observed on ``curation_token_budget`` in
    the r4 driver run). ``floor(x * 10^n + 0.5) / 10^n`` uses only
    IEEE-754 ops (multiply, add, floor, divide), each of which is
    bit-deterministic for identical input bits on every engine, so the
    Spark plan and the DuckDB oracle provably agree. Semantics are
    round-half-up for positive values (half-toward-+inf for negatives).

    VALID MAGNITUDE DOMAIN: the agreement proof needs |x·10^digits| <
    2^53 (≈9.0e15) — above that, (a) Spark's BIGINT ``floor`` result is
    no longer exactly representable when converted back to DOUBLE while
    DuckDB floors in DOUBLE throughout, and past 2^63 Spark's LONG
    overflows outright (ANSI error / wraparound) where DuckDB stays
    finite. At the default digits=6 that bounds |x| < ~9.0e9; at
    digits=10, |x| < ~9.0e5. Every current call site rounds ratios,
    cosines, z-scores or per-group means — all orders of magnitude
    inside the domain; a new call site rounding raw token/revenue SUMS
    must scale into micro-units (integer arithmetic) instead, per the
    repo's micro-unit discipline. The boundary behavior is pinned by
    ``tests/test_det_round.py::test_det_round_domain_boundary``.

    The SQL-side twin is :func:`det_round_sql`; every hashed double
    column must use the pair in lockstep.
    """
    p = float(10**digits)
    return F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)


def det_round_sql(expr: str, digits: int = 6) -> str:
    """DuckDB-side twin of :func:`det_round` — inline SQL string.

    Spark's ``floor`` returns BIGINT and DuckDB's returns DOUBLE, but
    BIGINT→DOUBLE conversion is exact below 2^53 so the final division
    yields identical bits in both engines.
    """
    p = f"{float(10 ** digits):.1f}"
    return f"(floor(({expr}) * {p} + 0.5) / {p})"
