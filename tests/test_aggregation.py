"""Unit tests for aggregation operators (SURVEY §2.4, §2.5)."""

from __future__ import annotations

from xml_to_parquet_spark.operators import (
    count_by_group,
    grouped_multi_agg,
    surrogate_keys,
)


def test_grouped_multi_agg_naming_and_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "g string, m double"
    )
    out = grouped_multi_agg(df, ["g"], ["m"]).orderBy("g").collect()
    assert set(out[0].asDict()) == {
        "g", "m_sum", "m_avg", "m_min", "m_max", "m_count"
    }
    a = out[0]
    assert (a.m_sum, a.m_avg, a.m_min, a.m_max, a.m_count) == (4.0, 2.0, 1.0, 3.0, 2)


def test_count_by_group(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "g string")
    got = {r.g: r.n for r in count_by_group(df, ["g"]).collect()}
    assert got == {"a": 2, "b": 1}


def test_grouped_percentiles_exact_vs_approx(spark):
    from xml_to_parquet_spark.operators.aggregation import grouped_percentiles

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    spec = {"l_extendedprice": [0.5, 0.9]}
    exact = {
        r.l_returnflag: (r.l_extendedprice_p50, r.l_extendedprice_p90)
        for r in grouped_percentiles(li, ["l_returnflag"], spec).collect()
    }
    approx = {
        r.l_returnflag: (r.l_extendedprice_p50, r.l_extendedprice_p90)
        for r in grouped_percentiles(
            li, ["l_returnflag"], spec, approx=True
        ).collect()
    }
    assert set(exact) == set(approx)
    for g in exact:
        for e, a in zip(exact[g], approx[g]):
            # near-unique measure: sketch must land within 5% of exact
            assert abs(a - e) / abs(e) < 0.05


def test_surrogate_keys_global_dense_sorted(spark):
    df = spark.createDataFrame(
        [("electronics",), ("accessories",), ("electronics",), (None,)],
        "category string",
    )
    rows = surrogate_keys(df, "category").orderBy("category_key").collect()
    # sorted values → dense 1-based keys; nulls excluded (P3 then W1)
    assert [(r.category_key, r.category) for r in rows] == [
        (1, "accessories"),
        (2, "electronics"),
    ]


def test_funnel_stages_strict_first_occurrence_order(spark):
    """Funnel semantics pinned: a stage counts only when its FIRST
    qualifying occurrence is strictly after the previous stage's; a
    user who clicks before ever viewing does not convert; equal
    timestamps do not advance the funnel; later re-views don't reset."""
    import datetime as dt

    from xml_to_parquet_spark.operators.aggregation import funnel_stages

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: view(1) -> click(2) -> purchase(3): full conversion
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        # u2: click BEFORE view -> stops at view
        (2, "click", t(1)), (2, "view", t(2)),
        # u3: view and click at the SAME ts -> strict > fails
        (3, "view", t(5)), (3, "click", t(5)),
        # u4: view -> click, purchase BEFORE click -> stops at click
        (4, "view", t(1)), (4, "purchase", t(2)), (4, "click", t(4)),
        # u5: never views -> not even in stage 1
        (5, "purchase", t(1)),
        # u6: first click precedes first view, but a LATER click follows
        # the view -> the funnel uses first-qualifying AFTER, so u6's
        # click at t(6) > view t(3) counts
        (6, "click", t(1)), (6, "view", t(3)), (6, "click", t(6)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    got = {
        r.stage: (r.n_users, r.conv_ppm)
        for r in funnel_stages(
            df, stages=["view", "click", "purchase"]
        ).collect()
    }
    assert got["view"] == (5, 1_000_000)      # u1..u4, u6
    assert got["click"] == (3, 600_000)       # u1, u4, u6
    assert got["purchase"] == (1, 200_000)    # u1 only


def test_cohort_retention_known_matrix(spark):
    from datetime import datetime

    from xml_to_parquet_spark.operators.aggregation import cohort_retention

    # cohort day 0: users 1,2,3 (user 3 returns day 1; user 1 returns
    # day 2); cohort day 1: user 4 (never returns). Multiple events in
    # one bucket count once (distinct activity).
    rows = [
        (1, datetime(2024, 1, 1, 9)), (2, datetime(2024, 1, 1, 10)),
        (3, datetime(2024, 1, 1, 11)), (3, datetime(2024, 1, 1, 12)),
        (3, datetime(2024, 1, 2, 9)),
        (1, datetime(2024, 1, 3, 9)), (1, datetime(2024, 1, 3, 10)),
        (4, datetime(2024, 1, 2, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_start[:10], r.bucket_offset): (
            r.cohort_n, r.active_n, r.retention_ppm
        )
        for r in cohort_retention(df, bucket="1 day").collect()
    }
    assert out[("2024-01-01", 0)] == (3, 3, 10**6)  # offset-0 sanity row
    assert out[("2024-01-01", 1)] == (3, 1, 10**6 // 3)
    assert out[("2024-01-01", 2)] == (3, 1, 10**6 // 3)
    assert out[("2024-01-02", 0)] == (1, 1, 10**6)
    assert ("2024-01-02", 1) not in out  # user 4 never returned
    assert len(out) == 4


def test_cohort_retention_partition_invariant(spark):
    from xml_to_parquet_spark.operators.aggregation import cohort_retention

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    res = [
        [
            (r.cohort_start, r.bucket_offset, r.cohort_n, r.active_n,
             r.retention_ppm)
            for r in cohort_retention(
                ev.repartition(p), bucket="1 hour", max_offset=6
            ).collect()
        ]
        for p in (1, 7)
    ]
    assert res[0] == res[1] and len(res[0]) > 3


def test_event_transitions_known_matrix(spark):
    from datetime import datetime

    from xml_to_parquet_spark.operators.aggregation import event_transitions

    # user 1: A -> B -> A (pairs A->B, B->A); user 2: A -> A (pair A->A);
    # user 3: single event, no successor, emits nothing. Rows 4 and 5 of
    # user 1 share a timestamp — event_id breaks the tie, so the order is
    # B(4) then A(5), not ts-nondeterministic.
    rows = [
        (1, datetime(2024, 1, 1, 9), 1, "A"),
        (2, datetime(2024, 1, 1, 9), 2, "A"),
        (2, datetime(2024, 1, 1, 10), 3, "A"),
        (1, datetime(2024, 1, 1, 10), 4, "B"),
        (1, datetime(2024, 1, 1, 10), 5, "A"),
        (3, datetime(2024, 1, 1, 9), 6, "C"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r.src, r.dst): (r.n, r.row_total, r.p_ppm)
        for r in event_transitions(df).collect()
    }
    assert out == {
        ("A", "B"): (1, 2, 500_000),
        ("A", "A"): (1, 2, 500_000),
        ("B", "A"): (1, 1, 1_000_000),
    }


def test_event_transitions_partition_invariant(spark):
    from xml_to_parquet_spark.operators.aggregation import event_transitions

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    res = [
        [
            (r.src, r.dst, r.n, r.row_total, r.p_ppm)
            for r in event_transitions(ev.repartition(p)).collect()
        ]
        for p in (1, 7)
    ]
    assert res[0] == res[1] and len(res[0]) > 0
    # row-conditional probabilities must sum to <= 1e6 per src (integer
    # truncation loses at most (n_dst - 1) ppm per row)
    import collections

    sums = collections.Counter()
    for src, _dst, _n, _tot, p in res[0]:
        sums[src] += p
    assert all(1_000_000 - 30 <= s <= 1_000_000 for s in sums.values())


def test_robust_group_stats_hand_computed(spark):
    from xml_to_parquet_spark.operators.aggregation import (
        robust_group_stats,
    )

    # group g: 10 values, trim 10% per side -> k=1: drop 1.0 and 100.0
    vals = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "grp string, v double"
    )
    r = robust_group_stats(df, ["grp"], "v", trim_ppm=100_000).collect()[0]
    assert r["n"] == 10 and r["k"] == 1
    assert r["mean"] == sum(vals) / 10
    kept = sorted(vals)[1:-1]
    assert r["trimmed_mean"] == sum(kept) / 8
    # winsorize: 1.0 -> 2.0 (rank k+1 value), 100.0 -> 8.0 (rank n-k)
    wins = [2.0] + kept + [8.0]
    assert r["winsorized_mean"] == sum(wins) / 10


def test_robust_group_stats_tie_at_cut_is_invariant(spark):
    """Ties straddling the cut: any k-smallest multiset is the same
    values, so the result must not depend on partitioning/order."""
    from xml_to_parquet_spark.operators.aggregation import (
        robust_group_stats,
    )

    vals = [5.0, 5.0, 5.0, 1.0, 9.0]  # k=1 at 200000 ppm
    base = [("g", v) for v in vals]
    a = robust_group_stats(
        spark.createDataFrame(base, "grp string, v double").repartition(1),
        ["grp"], "v", trim_ppm=200_000,
    ).collect()
    b = robust_group_stats(
        spark.createDataFrame(base[::-1], "grp string, v double")
        .repartition(7),
        ["grp"], "v", trim_ppm=200_000,
    ).collect()
    assert a == b
    assert a[0]["trimmed_mean"] == 5.0  # drop 1.0 and 9.0


def test_robust_group_stats_degenerate_group_returns_null(spark):
    from xml_to_parquet_spark.operators.aggregation import (
        robust_group_stats,
    )

    df = spark.createDataFrame(
        [("tiny", 1.0), ("tiny", 2.0)]
        + [("big", float(i)) for i in range(10)],
        "grp string, v double",
    )
    rows = {
        r["grp"]: r
        for r in robust_group_stats(
            df, ["grp"], "v", trim_ppm=500_000
        ).collect()
    }
    # tiny: n=2, k=1, 2k >= n -> nothing survives the cut
    assert rows["tiny"]["trimmed_mean"] is None
    assert rows["tiny"]["winsorized_mean"] is None
    assert rows["tiny"]["mean"] == 1.5
    # big: n=10, k=5 -> also degenerate (exactly 2k = n)
    assert rows["big"]["trimmed_mean"] is None


def test_robust_group_stats_duckdb_replay(spark):
    import duckdb

    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.aggregation import (
        robust_group_stats,
        robust_group_stats_sql,
    )

    df = spark.range(500).select(
        (F.col("id") % 7).cast("string").alias("grp"),
        ((F.col("id") * 137 % 9973) / 100.0).alias("v"),
    )
    got = [
        tuple(r)
        for r in robust_group_stats(df, ["grp"], "v", 80_000).collect()
    ]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        robust_group_stats_sql("t", ["grp"], "v", 80_000)
    ).fetchall()
    assert got == want


def test_group_normalize_hand_checked(spark):
    from xml_to_parquet_spark.operators.aggregation import (
        group_normalize,
    )

    rows = [("g", 1, 10), ("g", 2, 20), ("g", 3, 20), ("g", 4, 40)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    got = {
        r.id: r for r in group_normalize(df, ["grp"], "v", "id").collect()
    }
    # ranks: 10->1, 20->2 (shared), 40->4; n=4 -> pct = (rk-1)/3
    assert got[1].pct_rank_ppm == 0
    assert got[2].pct_rank_ppm == 1_000_000 * 1 // 3
    assert got[3].pct_rank_ppm == got[2].pct_rank_ppm  # tie shares
    assert got[4].pct_rank_ppm == 1_000_000
    # minmax over span [10, 40]
    assert got[1].minmax_ppm == 0
    assert got[2].minmax_ppm == 1_000_000 * 10 // 30
    assert got[4].minmax_ppm == 1_000_000


def test_group_normalize_degenerate_groups_are_zero(spark):
    from xml_to_parquet_spark.operators.aggregation import (
        group_normalize,
    )

    rows = [("solo", 1, 5), ("flat", 2, 7), ("flat", 3, 7)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    got = {
        r.id: r for r in group_normalize(df, ["grp"], "v", "id").collect()
    }
    assert (got[1].pct_rank_ppm, got[1].minmax_ppm) == (0, 0)
    assert (got[2].pct_rank_ppm, got[2].minmax_ppm) == (0, 0)
    assert (got[3].pct_rank_ppm, got[3].minmax_ppm) == (0, 0)


def test_group_normalize_duckdb_replay(spark):
    import duckdb

    from pyspark.sql import functions as F

    from xml_to_parquet_spark.operators.aggregation import (
        group_normalize,
        group_normalize_sql,
    )

    df = spark.range(4000).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.col("id").alias("rid"),
        ((F.col("id") * 131 % 10007) / 4.0).alias("v"),  # fractional
    )
    got = [
        tuple(r)
        for r in group_normalize(df, ["grp"], "v", "rid").collect()
    ]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        group_normalize_sql("t", ["grp"], "v", "rid")
    ).fetchall()
    assert got == want
