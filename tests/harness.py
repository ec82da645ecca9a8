"""Local replica of the driver's correctness gate.

The driver runs each `queries()[name]` on Spark at sf0.01 and the
matching `oracle_sql()[name]` on DuckDB, then compares row count, schema
(columns sorted by name) and an order-insensitive value hash. This
harness performs the same comparison with exact value equality so every
mismatch the driver would flag is caught in `pytest` first.
"""

from __future__ import annotations

import datetime
import decimal
import math

from pyspark.sql import DataFrame


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = sorted(tuple(_canon(r[i]) for i in order) for r in rows)
    return sorted_cols, out


def compare(spark_df: DataFrame, duck_con, oracle_sql: str, name: str = "?") -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sc, sr = canon_rows(s_cols, s_rows)
    dc, dr = canon_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: columns spark={sc} duckdb={dc}"
    if sr != dr:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diffs}")
