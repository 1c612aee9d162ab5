"""Constraint suite (functions/constraints.py): metric exactness, band
semantics, null handling, ref integrity, empty-table behavior, and the
one-scan plan shape."""

from __future__ import annotations

import duckdb
import pytest

from xml_to_parquet_spark.functions import constraints as C


def _report(spark, df, checks, dims=None):
    rows = C.constraint_report(df, checks, dims=dims).collect()
    return {r["constraint"]: r for r in rows}


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 30, "FI"),
            (2, "bob", 200, "SE"),  # age out of range
            (3, None, 25, "FI"),  # null name
            (4, "dave", 40, "XX"),  # country not in dim
            (4, "eve", 35, None),  # duplicate id, null country
        ],
        "id long, name string, age long, country string",
    )


@pytest.fixture(scope="module")
def countries(spark):
    return spark.createDataFrame(
        [("FI",), ("SE",), ("NO",)], "code string"
    )


def test_rate_metrics_exact(spark, people):
    rep = _report(
        spark,
        people,
        [
            C.not_null("name"),
            C.in_range("age", 0, 120),
            C.matches("name", "^[a-z]+$"),
            C.member_of("country", ["FI", "SE", "NO"]),
        ],
    )
    assert rep["name_not_null"]["metric_ppm"] == 800_000
    assert rep["age_in_range"]["metric_ppm"] == 800_000
    # null name fails the regex (CASE -> else 0), 4/5 match
    assert rep["name_matches"]["metric_ppm"] == 800_000
    # XX and NULL both outside the member set: 3/5
    assert rep["country_member_of"]["metric_ppm"] == 600_000
    assert not rep["name_not_null"]["passed"]


def test_band_semantics(spark, people):
    rep = _report(
        spark,
        people,
        [
            C.not_null("name", min_ppm=800_000, name="lenient"),
            C.not_null("name", min_ppm=800_001, name="strict"),
        ],
    )
    assert rep["lenient"]["passed"] is True
    assert rep["strict"]["passed"] is False


def test_distinctness_and_ref(spark, people, countries):
    rep = _report(
        spark,
        people,
        [
            C.unique("id"),
            C.unique("name"),
            C.ref_integrity("country", "countries", "code"),
        ],
        dims={"countries": countries},
    )
    # ids: {1,2,3,4} distinct over 5 rows
    assert rep["id_unique"]["metric_ppm"] == 800_000
    # names: 4 distinct non-null over 5 rows
    assert rep["name_unique"]["metric_ppm"] == 800_000
    # country: FI/SE/FI pass, NULL passes (RI ignores nulls), XX fails
    assert rep["country_in_countries"]["metric_ppm"] == 800_000
    assert not rep["country_in_countries"]["passed"]


def test_empty_table_never_vouches(spark, people):
    empty = people.limit(0)
    rep = _report(spark, empty, [C.not_null("name"), C.unique("id")])
    for r in rep.values():
        assert r["metric_ppm"] is None
        assert r["passed"] is False


def test_duplicate_names_rejected(spark, people):
    with pytest.raises(ValueError, match="duplicate check names"):
        C.constraint_report(
            people, [C.not_null("name"), C.not_null("name")]
        )


def test_missing_dim_rejected(spark, people):
    with pytest.raises(ValueError, match="needs dims"):
        C.constraint_report(
            people, [C.ref_integrity("country", "countries", "code")]
        )


def test_sql_twin_matches_spark(spark, people, countries):
    checks = [
        C.not_null("name"),
        C.in_range("age", 0, 120),
        C.member_of("country", ["FI", "SE", "NO"]),
        C.unique("id"),
        C.ref_integrity("country", "countries", "code"),
    ]
    got = [
        tuple(r)
        for r in C.constraint_report(
            people, checks, dims={"countries": countries}
        ).collect()
    ]
    con = duckdb.connect()
    con.register("people", people.toPandas())
    con.register("countries", countries.toPandas())
    want = con.execute(
        C.constraint_report_sql("people", checks)
    ).fetchall()
    assert got == want


def test_one_scan_plan(spark, people, countries):
    """Rate+ref checks compile to a single scan of the fact: the plan
    has exactly one people-side scan (ExistingRDD here) and the dim
    join is broadcast, never a shuffle of the fact."""
    rep = C.constraint_report(
        people,
        [
            C.not_null("name"),
            C.in_range("age", 0, 120),
            C.ref_integrity("country", "countries", "code"),
        ],
        dims={"countries": countries},
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_functional_dep_metrics(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("a", 1, "x"),
            ("a", 2, "x"),  # violates id->v (majority v=1 twice)
            ("b", 3, "y"),
            ("b", 3, None),  # NULL rhs is a value: grp->v still holds
        ],
        "id string, v long, grp string",
    )
    rep = _report(
        spark,
        df,
        [
            C.functional_dep("id", "v"),
            C.functional_dep("grp", "v", name="grp_v"),
            C.functional_dep(("id", "grp"), "v", name="composite"),
        ],
    )
    # id->v: a's majority v=1 (2 of 3), b's majority v=3 (2) -> 4/5
    assert rep["id_determines_v"]["metric_ppm"] == 800_000
    assert rep["id_determines_v"]["passed"] is False
    # grp->v identical groups here
    assert rep["grp_v"]["metric_ppm"] == 800_000
    assert rep["composite"]["metric_ppm"] == 800_000


def test_functional_dep_holds_exactly(spark, people):
    rep = _report(spark, people, [C.functional_dep("name", "age")])
    # every name (incl. the NULL name group, one row) maps to one age
    assert rep["name_determines_age"]["metric_ppm"] == 1_000_000
    assert rep["name_determines_age"]["passed"] is True


def test_functional_dep_rejects_rhs_in_lhs(spark):
    with pytest.raises(ValueError, match="cannot appear"):
        C.functional_dep(("a", "b"), "b")


def test_functional_dep_duckdb_replay(spark, people):
    checks = [
        C.functional_dep("name", "age"),
        C.functional_dep("id", "country", name="id_country"),
        C.not_null("name"),
    ]
    got = [tuple(r) for r in C.constraint_report(people, checks).collect()]
    con = duckdb.connect()
    con.register("people", people.toPandas())
    want = con.execute(
        C.constraint_report_sql("people", checks)
    ).fetchall()
    assert got == want


def test_functional_dep_empty_table(spark, people):
    rep = _report(spark, people.limit(0), [C.functional_dep("id", "age")])
    r = rep["id_determines_age"]
    assert r["metric_ppm"] is None and r["passed"] is False
