from __future__ import annotations

from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.range_join import range_join_binned


def _bands(spark, rows):
    return spark.createDataFrame(rows, "band_name string, lo double, hi double")


def test_interval_semantics_lo_inclusive_hi_exclusive(spark):
    fact = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 4.9, 5.0, 9.99, 10.0, 15.0])],
        "id long, v double",
    )
    bands = _bands(spark, [("a", 0.0, 5.0), ("b", 5.0, 10.0)])
    out = range_join_binned(fact, bands, "v", bin_width=3.0)
    got = {(r["id"], r["band_name"]) for r in out.collect()}
    # 0.0,4.9 -> a ; 5.0 (lo inclusive), 9.99 -> b ; 10.0, 15.0 -> none
    assert got == {(0, "a"), (1, "a"), (2, "b"), (3, "b")}


def test_overlapping_bands_emit_one_row_each(spark):
    fact = spark.createDataFrame([(1, 7.0)], "id long, v double")
    bands = _bands(spark, [("wide", 0.0, 100.0), ("narrow", 6.0, 8.0)])
    out = range_join_binned(fact, bands, "v", bin_width=10.0)
    assert {r["band_name"] for r in out.collect()} == {"wide", "narrow"}


def test_plan_is_hash_join_not_nested_loop(spark):
    fact = spark.range(1000).withColumn("v", F.col("id").cast("double"))
    bands = _bands(spark, [("a", 0.0, 300.0), ("b", 300.0, 1000.0)])
    plan = range_join_binned(fact, bands, "v", bin_width=100.0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
