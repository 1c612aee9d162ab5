"""Unit tests for the relational core (SURVEY §2.2-2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_to_parquet_spark.operators import (
    chained_dim_joins,
    distinct_values,
    drop_columns,
    filter_not_null,
    left_broadcast_join,
    project,
    sort_limit,
    union_by_name,
)


def test_project_and_drop(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id int, s string, v double")
    assert project(df, ["id", "v"]).columns == ["id", "v"]
    assert drop_columns(df, ["s", "not_there"]).columns == ["id", "v"]


def test_filter_not_null(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "id int, s string")
    assert filter_not_null(df, "s").count() == 1


def test_union_by_name_ragged(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, 3.5)], "id int, b double")
    out = union_by_name([a, b]).orderBy("id").collect()
    assert len(out) == 2
    assert out[0].a == "x" and out[0].b is None
    assert out[1].a is None and out[1].b == 3.5


def test_distinct_sort_limit(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "b"), (2, "a"), (3, "a")], "id int, g string"
    )
    assert distinct_values(df, ["g"]).count() == 2
    top = sort_limit(df, ["id"], ascending=False, limit=2).collect()
    assert [r.id for r in top] == [3, 2]


def test_broadcast_join_plan_and_result(spark):
    fact = spark.createDataFrame([(1, "a"), (2, "b"), (3, None)], "id int, g string")
    dim = spark.createDataFrame([("a", 10), ("b", 20)], "g string, g_key int")
    out = left_broadcast_join(fact, dim, "g").orderBy("id")
    rows = out.collect()
    assert [r.g_key for r in rows] == [10, 20, None]
    # physical plan must be a broadcast hash join (no shuffle of the fact side)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chained_dim_joins(spark):
    fact = spark.createDataFrame([(1, "a", "x")], "id int, g string, h string")
    dg = spark.createDataFrame([("a", 1)], "g string, g_key int")
    dh = spark.createDataFrame([("x", 7)], "h string, h_key int")
    row = chained_dim_joins(fact, [(dg, "g"), (dh, "h")]).collect()[0]
    assert row.g_key == 1 and row.h_key == 7


def test_union_requires_input():
    import pytest

    with pytest.raises(ValueError):
        union_by_name([])


def test_null_on_fail_cast_edge_cases(spark):
    """F1 parity: as.numeric edge cases — whitespace, scientific, garbage."""
    df = spark.createDataFrame(
        [("1.5",), (" 2.5 ",), ("1e5",), ("abc",), ("",), ("12.3.4",), (None,)],
        "s string",
    )
    vals = [
        r.v for r in df.select(F.col("s").try_cast("double").alias("v")).collect()
    ]
    assert vals == [1.5, 2.5, 100000.0, None, None, None, None]


def test_rate_limit_flags_semantics(spark):
    """Window boundary, same-second peers, and per-key isolation."""
    from datetime import datetime

    from xml_to_parquet_spark.operators.window import rate_limit_flags

    def t(s):
        return datetime(2024, 1, 1, 0, 0, s)

    rows = [
        # user a: 3 events in one second -> peers, all counted together
        ("a", t(0)), ("a", t(0)), ("a", t(0)),
        # 10s window, limit 3: event at t=9 is IN the window (range
        # covers [0, 9]) -> count 4 -> throttled
        ("a", t(9)),
        # t=10 is OUTSIDE the [1, 10] window's... the first 3 left at
        # t >= 10 (range [1,10] excludes t=0) -> count 2 with t=9
        ("a", t(10)),
        # user b independent
        ("b", t(9)),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {
        (r.k, r.ts.second, r.win_count, r.throttled)
        for r in rate_limit_flags(df, "k", "ts", limit=3, window_s=10)
        .collect()
    }
    assert ("a", 0, 3, False) in got
    assert ("a", 9, 4, True) in got
    assert ("a", 10, 2, False) in got
    assert ("b", 9, 1, False) in got


def test_rate_limit_flags_same_second_verdict_is_shared(spark):
    """All events in one second get the same verdict regardless of
    partitioning (RANGE peers, not ROWS order)."""
    from datetime import datetime

    from xml_to_parquet_spark.operators.window import rate_limit_flags

    rows = [("u", datetime(2024, 1, 1, 0, 0, 5))] * 5
    df = spark.createDataFrame(
        rows, "k string, ts timestamp"
    ).repartition(4)
    out = rate_limit_flags(df, "k", "ts", limit=3, window_s=60).collect()
    assert {(r.win_count, r.throttled) for r in out} == {(5, True)}


def test_rate_limit_flags_validates(spark):
    import pytest

    from xml_to_parquet_spark.operators.window import rate_limit_flags

    df = spark.createDataFrame([("u",)], "k string").withColumn(
        "ts", F.current_timestamp()
    )
    with pytest.raises(ValueError, match="limit"):
        rate_limit_flags(df, "k", "ts", limit=0, window_s=10)
