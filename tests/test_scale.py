"""Scale-pattern tests: bucketed co-located joins, salting, dim merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from xml_to_parquet_spark.operators.scale import (
    merge_dimension,
    salted_grouped_sum,
    write_bucketed,
)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf — managed tables land in the session
    # default (spark-warehouse under cwd); dropped in the finally block
    a = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("w", F.col("id") * 3)
    write_bucketed(a, "t_bucket_a", ["id"], n_buckets=8, sort_cols=["id"])
    write_bucketed(b, "t_bucket_b", ["id"], n_buckets=8, sort_cols=["id"])
    ta, tb = spark.table("t_bucket_a"), spark.table("t_bucket_b")
    # force a non-broadcast plan so bucketing (not broadcast) does the work
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, on="id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_salted_grouped_sum_matches_direct(spark):
    rows = [("hot", float(i % 7)) for i in range(5000)] + [
        ("cold", 1.5),
        ("cold", 2.5),
    ]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    salted = {
        r["k"]: (r["v_sum"], r["n"])
        for r in salted_grouped_sum(df, ["k"], ["v"], n_salts=8).collect()
    }
    direct = {
        r["k"]: (float(r["s"]), r["n"])
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert salted == direct


def test_merge_dimension_preserves_and_extends(spark):
    existing = spark.createDataFrame(
        [(1, "accessories"), (2, "electronics")], "category_key int, category string"
    )
    new = spark.createDataFrame(
        [("electronics",), ("home",), ("garden",), (None,)], "category string"
    )
    merged = {
        r["category"]: r["category_key"]
        for r in merge_dimension(existing, new, "category").collect()
    }
    # existing keys untouched; new values keyed after max, sorted
    assert merged == {
        "accessories": 1,
        "electronics": 2,
        "garden": 3,
        "home": 4,
    }


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from xml_to_parquet_spark.sinks.writers import compact_parquet

    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    # simulate streaming accretion: 16 tiny files
    spark.range(0, 1600).repartition(16).write.parquet(src)
    import os

    n_before = sum(
        1 for f in os.listdir(src) if f.endswith(".parquet")
    )
    assert n_before == 16
    n_after = compact_parquet(spark, src, out, target_file_bytes=1 << 30)
    assert n_after == 1
    assert spark.read.parquet(out).count() == 1600


def test_zorder_layout_tightens_file_ranges(spark, tmp_path):
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.scale import write_zordered, zorder_key

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_id", "user_id"
    )
    plain, zed = str(tmp_path / "plain"), str(tmp_path / "zed")
    ev.repartition(8).write.parquet(plain)
    write_zordered(ev, zed, "user_id", "event_id", n_files=8)

    def avg_range(path, col):
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("r"))
        )
        rows = per_file.collect()
        return sum(r.r for r in rows) / len(rows)

    # z-ordered files cluster BOTH dimensions at once — a single-column
    # sort could only tighten one; hash layout tightens neither. 8 files
    # split 2-D z-space ~√8 per dimension (unevenly along the curve).
    assert avg_range(zed, "user_id") < 0.75 * avg_range(plain, "user_id")
    assert avg_range(zed, "event_id") < 0.6 * avg_range(plain, "event_id")

    # the key itself is exact integer math: monotone bit interleave
    r = (
        spark.range(1)
        .select(zorder_key(F.lit(3), F.lit(5), bits=4).alias("z"))
        .collect()[0]
    )
    # a=0b0011, b=0b0101 -> interleave (b_i a_i): 0b100111 = 39
    assert r.z == 39


def test_upsert_by_key_update_wins_ties(spark):
    from xml_to_parquet_spark.operators.scale import upsert_by_key

    base = spark.createDataFrame(
        [(1, 10, "old"), (2, 10, "keep")], "k long, ver long, v string"
    )
    upd = spark.createDataFrame([(1, 10, "new"), (3, 5, "ins")],
                                "k long, ver long, v string")
    got = {r.k: r.v for r in upsert_by_key(base, upd, ["k"], "ver").collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}  # equal ver: update wins


def test_scd2_apply_history(spark):
    from xml_to_parquet_spark.operators.scale import scd2_apply

    dim = spark.createDataFrame(
        [(1, "A", "2020-01-01", None), (2, "B", "2020-01-01", None)],
        "key int, value string, valid_from string, valid_to string",
    ).selectExpr("key", "value", "CAST(valid_from AS DATE) valid_from",
                 "CAST(valid_to AS DATE) valid_to")
    ch = spark.createDataFrame([(1, "A2"), (3, "C")], "key int, value string")
    rows = sorted(
        ((r.key, r.value, str(r.valid_from), str(r.valid_to))
         for r in scd2_apply(dim, ch, "key", "value", "2024-01-01").collect())
    )
    assert rows == [
        (1, "A", "2020-01-01", "2024-01-01"),   # closed old version
        (1, "A2", "2024-01-01", "None"),        # new open version
        (2, "B", "2020-01-01", "None"),         # untouched
        (3, "C", "2024-01-01", "None"),         # brand-new key
    ]


def test_scd2_apply_null_valued_open_row(spark):
    """A NULL-valued open row receiving a real update must be closed and
    re-opened, not silently dropped (`!=` against NULL is NULL, which
    passes neither filter branch without eqNullSafe)."""
    from xml_to_parquet_spark.operators.scale import scd2_apply

    dim = spark.createDataFrame(
        [(1, None, "2020-01-01", None), (2, None, "2020-01-01", None)],
        "key int, value string, valid_from string, valid_to string",
    ).selectExpr("key", "value", "CAST(valid_from AS DATE) valid_from",
                 "CAST(valid_to AS DATE) valid_to")
    ch = spark.createDataFrame([(1, "X")], "key int, value string")
    rows = sorted(
        ((r.key, str(r.value), str(r.valid_from), str(r.valid_to))
         for r in scd2_apply(dim, ch, "key", "value", "2024-01-01").collect())
    )
    assert rows == [
        (1, "None", "2020-01-01", "2024-01-01"),  # NULL version closed
        (1, "X", "2024-01-01", "None"),           # new open version
        (2, "None", "2020-01-01", "None"),        # untouched NULL row kept
    ]


def test_skew_report_finds_hot_key_and_salt(spark):
    from xml_to_parquet_spark.operators.scale import skew_report

    rows = [("hot",)] * 1000 + [(f"k{i}",) for i in range(50)]
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, ["k"], target_rows_per_task=300, top_n=3).collect()
    assert out[0]["k"] == "hot"
    assert out[0]["cnt"] == 1000
    assert out[0]["salt_factor"] == 4  # ceil(1000/300)
    assert out[0]["share_ppm"] == 1000 * 1_000_000 // 1050
    assert all(r["cnt"] == 1 and r["salt_factor"] == 1 for r in out[1:])


def test_refresh_grouped_agg_insert_delete_identity(spark, tmp_path):
    """Incremental maintenance == full recompute, including the DELETE
    path (overwrite diff) and group birth/death across refreshes."""
    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.scale import (
        materialize_grouped_agg,
        refresh_grouped_agg,
    )
    from xml_to_parquet_spark.sinks.publish import publish_parquet

    root = str(tmp_path / "mv")
    rows_v1 = [(1, "a", 10.0), (2, "a", 5.5), (3, "b", 2.25)]
    # v2 drops row 2, changes row 3's value, births group c, kills no one
    rows_v2 = [(1, "a", 10.0), (3, "b", 9.75), (4, "c", 1.0)]
    schema = "id long, grp string, val double"
    publish_parquet(spark.createDataFrame(rows_v1, schema), root)
    publish_parquet(spark.createDataFrame(rows_v2, schema), root)

    prev = materialize_grouped_agg(
        spark.createDataFrame(rows_v1, schema), ["grp"], "val"
    )
    got = {
        r.grp: (r.n, float(r.m_sum))
        for r in refresh_grouped_agg(
            spark, root, prev, ["grp"], "val", v_from=1
        ).collect()
    }
    full = {
        r.grp: (r.n, float(r.m_sum))
        for r in materialize_grouped_agg(
            spark.createDataFrame(rows_v2, schema), ["grp"], "val"
        ).collect()
    }
    assert got == full
    assert got["a"] == (1, 10.0)  # delete path shrank the group
    assert got["c"] == (1, 1.0)   # group born in the delta

    # group death: v3 removes every 'c' row -> the group must vanish
    rows_v3 = [(1, "a", 10.0), (3, "b", 9.75)]
    publish_parquet(spark.createDataFrame(rows_v3, schema), root)
    prev2 = materialize_grouped_agg(
        spark.createDataFrame(rows_v2, schema), ["grp"], "val"
    )
    got3 = {
        r.grp: (r.n, float(r.m_sum))
        for r in refresh_grouped_agg(
            spark, root, prev2, ["grp"], "val", v_from=2, v_to=3
        ).collect()
    }
    assert "c" not in got3 and got3["b"] == (1, 9.75)


def test_join_cardinality_estimate_unbiased_shape(spark):
    import pyspark.sql.functions as F

    from xml_to_parquet_spark.operators.scale import (
        join_cardinality_estimate,
    )

    # 200 keys; left has i%7+1 rows per key, right i%3+1 — join size
    # Σ (i%7+1)(i%3+1), a correlated-frequency case row sampling
    # systematically underestimates
    left = (
        spark.range(200)
        .select(
            F.col("id").alias("orderkey"),
            F.explode(F.sequence(F.lit(1), F.col("id") % 7 + 1)).alias("x"),
        )
        .select("orderkey")
    )
    right = (
        spark.range(200)
        .select(
            F.col("id").alias("orderkey"),
            F.explode(F.sequence(F.lit(1), F.col("id") % 3 + 1)).alias("x"),
        )
        .select("orderkey")
    )
    row = join_cardinality_estimate(
        left, right, "orderkey", rate=0.25
    ).collect()[0]
    exact = sum((i % 7 + 1) * (i % 3 + 1) for i in range(200))
    assert row.exact_pairs == exact
    # one fixed deterministic draw at 25% of 200 keys: generous bound
    assert abs(row.est_pairs - exact) / exact < 0.5
    assert row.sampled_keys > 0
    assert row.err_ppm == abs(row.est_pairs - exact) * 10**6 // exact


def test_join_cardinality_estimate_partition_invariant(spark):
    import pyspark.sql.functions as F

    from xml_to_parquet_spark.operators.scale import (
        join_cardinality_estimate,
    )

    left = spark.range(500).select((F.col("id") % 100).alias("k"))
    right = spark.range(300).select((F.col("id") % 100).alias("k"))
    rows = [
        tuple(
            join_cardinality_estimate(
                left.repartition(p), right.repartition(p * 2 + 1), "k",
                rate=0.2,
            ).collect()[0]
        )
        for p in (1, 7)
    ]
    assert rows[0] == rows[1]


def test_zonemap_skip_lossless_and_zorder_wins(spark):
    """On a uniform 2-D grid, every matching row must live in a scanned
    file under EVERY layout (losslessness), and the Z-layout must scan
    fewer files than either single-column layout for a 2-D box."""
    from xml_to_parquet_spark.operators.scale import zonemap_skip_report

    n = 64
    df = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rep = {
        r["layout"]: r
        for r in zonemap_skip_report(
            df, "x", "y", log2_files=5, bits=8
        ).collect()
    }
    # direct count of the box the operator builds: middle 3/8..5/8 band
    lo = (n - 1) * 3 // 8
    hi = (n - 1) * 5 // 8
    direct = df.filter(
        F.col("x").between(lo, hi) & F.col("y").between(lo, hi)
    ).count()
    for r in rep.values():
        assert r["rows_matching"] == direct
        assert r["rows_scanned"] >= r["rows_matching"]
        assert r["files_scanned"] <= r["n_files"]
    assert rep["zorder"]["files_scanned"] < rep["bycol_a"]["files_scanned"]
    assert rep["zorder"]["files_scanned"] < rep["bycol_b"]["files_scanned"]
    assert rep["zorder"]["rows_scanned"] < rep["bycol_a"]["rows_scanned"]


def test_zonemap_skip_duckdb_replay(spark):
    import duckdb

    from xml_to_parquet_spark.operators.scale import (
        zonemap_skip_report,
        zonemap_skip_report_sql,
    )

    df = spark.range(5000).select(
        (F.col("id") * 37 % 1013).alias("u"),
        (F.col("id") * 91 % 677).alias("v"),
    )
    got = [
        tuple(r)
        for r in zonemap_skip_report(
            df, "u", "v", log2_files=4, bits=6
        ).collect()
    ]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        zonemap_skip_report_sql("t", "u", "v", log2_files=4, bits=6)
    ).fetchall()
    assert got == want


def test_zonemap_skip_excludes_nulls_and_validates(spark):
    import pytest

    from xml_to_parquet_spark.operators.scale import zonemap_skip_report

    df = spark.createDataFrame(
        [(1, 1), (2, None), (None, 3), (4, 4), (5, 5), (6, 6), (7, 7),
         (8, 8)],
        "x long, y long",
    )
    rep = zonemap_skip_report(df, "x", "y", log2_files=1, bits=4).collect()
    assert all(r["rows_total"] == 6 for r in rep)  # 2 null rows dropped
    with pytest.raises(ValueError, match="log2_files"):
        zonemap_skip_report(df, "x", "y", log2_files=9, bits=8)
