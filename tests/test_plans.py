"""Tests for schema analyzer + star transformer (SURVEY §2.4 A1, §3.3).

The fixture mirrors the reference's products example shape
(FIXTURES.md §A1): id/category/brand attributes + price/quantity/rating
children, expected dims {accessories→1, electronics→2}, {Apple→1, Samsung→2}.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml_to_parquet_spark.plans import (
    analyze_schema,
    build_star_schema,
    classify_profile,
    profile_columns,
    validate_star_schema,
)


_PRODUCT_ROWS = [
    ("1", "electronics", "Samsung", "Galaxy S21", "799.99", "50", "4.5"),
    ("2", "electronics", "Apple", "iPhone 13", "999.99", "30", "4.8"),
    ("3", "accessories", "Samsung", "Charger", "29.99", "200", None),
]
_PRODUCT_SCHEMA = (
    "id string, category string, brand string, name string, "
    "price string, quantity string, rating string"
)


def _big_products(spark):
    """96 rows in a handful of partitions (not a union tower of 128)."""
    return spark.createDataFrame(_PRODUCT_ROWS * 32, _PRODUCT_SCHEMA)


@pytest.fixture(scope="module")
def products_df(spark):
    # same shape as the reference's products.xml records (values are ours)
    return spark.createDataFrame(_PRODUCT_ROWS, _PRODUCT_SCHEMA)


def test_profile_metrics(spark, products_df):
    prof = {r["column"]: r for r in profile_columns(products_df).collect()}
    p = prof["price"]
    assert p["n_rows"] == 3 and p["nonnull_count"] == 3
    assert p["unique_count"] == 3
    assert p["numeric_ratio"] == 1.0
    r = prof["rating"]
    assert r["nonnull_count"] == 2
    assert abs(r["null_ratio"] - 1 / 3) < 1e-12
    assert prof["category"]["sample_values"] == "accessories|electronics"
    assert prof["brand"]["unique_count"] == 2


def test_classification_ladder(spark, products_df):
    cat = analyze_schema(products_df)
    assert cat["id"]["classification"] == "identifier"
    assert cat["price"]["classification"] == "measure"
    assert cat["quantity"]["classification"] == "measure"
    assert cat["rating"]["classification"] == "measure"
    # 2 distinct of 3 rows: fails the <10% rule at this tiny size → not a
    # dimension by the strict ladder; verify ladder order on a bigger frame
    cat_big = analyze_schema(_big_products(spark))
    assert cat_big["category"]["classification"] == "dimension"
    assert cat_big["brand"]["classification"] == "dimension"
    # 3 distinct names over 96 rows < 10% → low-cardinality dimension
    assert cat_big["name"]["classification"] == "dimension"


def test_data_type_rules(spark):
    df = spark.createDataFrame(
        [("1.0", "x" * 150, "7a"), ("2.5", "y" * 150, "8b"), ("abc", "z", "9")],
        "mixed string, long string, coded string",
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["mixed"]["data_type"] == "mixed_numeric"  # 2/3 numeric
    assert prof["long"]["data_type"] == "text"  # mean_length > 100


def test_analyze_fast_path_equals_dataframe_path(spark):
    """analyze_schema's driver-side reshape must match the DataFrame
    profile (classify_profile∘profile_columns) field-for-field, including
    the NULL-ratio edge (all-null column) and ladder fallthroughs."""
    df = spark.createDataFrame(
        [
            ("1", "electronics", None, "1.5", "x" * 150),
            ("2", "electronics", None, "abc", "y" * 150),
            ("3", "accessories", None, "2.5", "z"),
        ],
        "id string, category string, empty string, mixed string, "
        "long string",
    )
    want = {
        r["column"]: r.asDict()
        for r in classify_profile(profile_columns(df)).collect()
    }
    got = analyze_schema(df)
    assert set(got) == set(want)
    for c, info in got.items():
        for k, v in info.items():
            assert v == want[c][k], (c, k, v, want[c][k])


def test_star_schema_golden(spark, products_df):
    big = _big_products(spark)
    catalog = analyze_schema(big)
    star = build_star_schema(big, catalog, id_column="id", batch_id="t1")

    # dims: global sorted keys — FIXTURES.md §A1 golden values
    cat_rows = star.dimensions["category"].orderBy("category_key").collect()
    assert [(r.category_key, r.category) for r in cat_rows] == [
        (1, "accessories"),
        (2, "electronics"),
    ]
    brand_rows = star.dimensions["brand"].orderBy("brand_key").collect()
    assert [(r.brand_key, r.brand) for r in brand_rows] == [
        (1, "Apple"),
        (2, "Samsung"),
    ]
    assert cat_rows[0].is_active is True and cat_rows[0].created_date is not None

    fact = star.fact
    assert "category" not in fact.columns and "category_key" in fact.columns
    assert dict(fact.dtypes)["price"] == "double"
    assert fact.filter(F.col("batch_id") == "t1").count() == 96
    one = fact.filter((F.col("id") == "1")).limit(1).collect()[0]
    assert (one.category_key, one.brand_key, one.price) == (2, 2, 799.99)

    assert validate_star_schema(star) == {"fact": [], "dimensions": []}


def test_star_schema_no_measures_gets_record_count(spark):
    df = spark.createDataFrame([("1", "a"), ("2", "b")], "id string, g string")
    catalog = {
        "id": {"classification": "identifier"},
        "g": {"classification": "dimension"},
    }
    star = build_star_schema(df, catalog, include_audit=False)
    assert "record_count" in star.fact.columns
    assert star.fact.agg(F.sum("record_count")).collect()[0][0] == 2


def test_star_fact_never_shuffled(spark, products_df):
    """The star build's physical plan must attach keys via broadcast joins."""
    catalog = {
        "id": {"classification": "identifier"},
        "category": {"classification": "dimension"},
        "brand": {"classification": "dimension"},
        "price": {"classification": "measure"},
    }
    star = build_star_schema(products_df, catalog, include_audit=False)
    plan = star.fact._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
