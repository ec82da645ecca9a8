"""The Spark SQL twin of every battery query must produce exactly the
DataFrame plan's rows (sorted columns + canonical values) — proving the
SQL migration surface and the DataFrame API are the same engine, and
that the 1-row max-timestamp CTE still broadcasts when written as SQL."""

from __future__ import annotations

import pytest

from kafka_flink_streaming_pipeline_spark.plans import merged
from kafka_flink_streaming_pipeline_spark.plans.sql_twins import SPARK_SQL, run_sql_twin

from tests.conftest import SF_CORRECT
from tests.harness import canon_rows

ALL = merged()


@pytest.mark.parametrize("name", sorted(SPARK_SQL))
def test_sql_twin_matches_dataframe_plan(spark, name):
    df = ALL[name].build(spark, SF_CORRECT)
    sql_df = run_sql_twin(spark, SF_CORRECT, name)
    a = canon_rows(df.columns, [tuple(r) for r in df.collect()])
    b = canon_rows(sql_df.columns, [tuple(r) for r in sql_df.collect()])
    assert a == b


def test_sql_twin_max_ts_still_broadcasts(spark):
    """Catalyst must see through the SQL formulation: the 1-row latest
    CTE joins as a broadcast, never a shuffle of the fact side."""
    plan = (
        run_sql_twin(spark, SF_CORRECT, "q2_top_docs_6h")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
