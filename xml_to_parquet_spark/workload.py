"""Query catalog: every SURVEY.md §2 operator as a (Spark, oracle-SQL) pair.

Each entry couples a PySpark DataFrame program with the ANSI-SQL string that
DuckDB runs over the same parquet tables. The driver hash-compares the two at
sf0.01 (order-insensitive, columns sorted by name), so:

- every computed column is aliased identically on both sides
- floating-point aggregates use exact DECIMAL arithmetic internally and cast
  to double at the end (see operators/aggregation.py) — bit-identical across
  engines and partitionings
- timestamps returned to the driver are formatted to strings to dodge
  ns-vs-us physical-type mismatches between Spark and DuckDB parquet readers

Queries whose semantics are not SQL-expressible (MinHash LSH, SimHash, true
streaming) register with ``oracle=None`` → the driver records a rows-only
check.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xml_to_parquet_spark.catalog import load_table
from xml_to_parquet_spark.operators.aggregation import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    grouped_multi_agg,
    grouped_multi_agg_sql,
)
from xml_to_parquet_spark.operators.relational import (
    chained_dim_joins,
    distinct_values,
    sort_limit,
    union_by_name,
)
from xml_to_parquet_spark.operators.window import surrogate_keys


@dataclass(frozen=True)
class QuerySpec:
    """One catalog entry: Spark program + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship star query (SURVEY §7 step 1): lineitem ⋈ orders ⋈ customer ⋈
# nation ⋈ region, filter, group by region, exact-decimal revenue.
# Exercises S7, P1-P3, J1/J3, A2, O1. All dim joins broadcast → the fact
# table is never shuffled for the joins, only for the final small groupBy.
# ---------------------------------------------------------------------------

def q_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    joined = (
        lineitem.filter(F.col("l_shipdate") < F.lit("1998-09-01").cast("timestamp"))
        .join(orders, on=F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer), on=F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(nation), on=F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), on=F.col("n_regionkey") == F.col("r_regionkey"))
    )
    revenue = (
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
        )
        .cast("double")
        .alias("revenue")
    )
    return (
        joined.groupBy("r_name")
        .agg(revenue, F.count(F.lit(1)).alias("n_rows"))
        .orderBy("r_name")
    )


_Q_STAR_REVENUE_SQL = """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY r_name
ORDER BY r_name
"""


# ---------------------------------------------------------------------------
# A2: grouped multi-measure agg with {col}_{fn} naming
# (reference aggregate_fact_data, star_transformer.R:148-165)
# ---------------------------------------------------------------------------

def q_grouped_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return grouped_multi_agg(
        li,
        group_cols=["l_returnflag", "l_linestatus"],
        measure_cols=["l_quantity", "l_extendedprice", "l_discount"],
    ).orderBy("l_returnflag", "l_linestatus")


_Q_GROUPED_MULTI_AGG_SQL = grouped_multi_agg_sql(
    "lineitem",
    group_cols=["l_returnflag", "l_linestatus"],
    measure_cols=["l_quantity", "l_extendedprice", "l_discount"],
    order=True,
)


# ---------------------------------------------------------------------------
# A3: count-by-group (validation summary / README lineage queries)
# ---------------------------------------------------------------------------

def q_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), davg("value", "value_avg"))
        .orderBy("event_type")
    )


_Q_COUNT_BY_GROUP_SQL = f"""
SELECT event_type, COUNT(*) AS n, {davg_sql('value', 'value_avg')}
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# P1/P3/F1: projection + null-safe predicate + cast-null-on-fail
# ---------------------------------------------------------------------------

def q_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderstatus") == "F")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("o_orderpriority").alias("priority"),
        )
    )


_Q_PROJECT_FILTER_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority AS priority
FROM orders WHERE o_orderstatus = 'F' AND o_totalprice IS NOT NULL
"""


# ---------------------------------------------------------------------------
# U2 + O1/O2: distinct, sort, deterministic limit (tie-broken)
# ---------------------------------------------------------------------------

def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return distinct_values(li, ["l_returnflag", "l_linestatus"]).orderBy(
        "l_returnflag", "l_linestatus"
    )


_Q_DISTINCT_SQL = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # limit after a total order (price desc, key asc tiebreak) → deterministic
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


_Q_SORT_LIMIT_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# U1: union-by-name with ragged schemas (rbindlist(fill=TRUE) parity)
# ---------------------------------------------------------------------------

def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    b = cust.filter(F.col("c_custkey") % 2 == 1).select(
        "c_custkey", "c_mktsegment"
    )
    return union_by_name([a, b]).orderBy("c_custkey")


_Q_UNION_BY_NAME_SQL = """
SELECT c_custkey, c_name, c_acctbal, NULL AS c_mktsegment
FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT c_custkey, NULL AS c_name, NULL AS c_acctbal, c_mktsegment
FROM customer WHERE c_custkey % 2 = 1
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# W1: global surrogate keys (sorted row_number) over a dimension column
# ---------------------------------------------------------------------------

def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return surrogate_keys(cust, "c_mktsegment").orderBy("c_mktsegment_key")


_Q_SURROGATE_KEYS_SQL = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS INT) AS c_mktsegment_key,
       c_mktsegment
FROM (SELECT DISTINCT c_mktsegment FROM customer WHERE c_mktsegment IS NOT NULL)
ORDER BY c_mktsegment_key
"""


# ---------------------------------------------------------------------------
# J1+J3+W1: star build — attach dim surrogate keys to a fact slice, then
# aggregate by key. This is the reference's core transform as one plan.
# ---------------------------------------------------------------------------

def q_star_dim_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dim_rf = surrogate_keys(li, "l_returnflag")
    dim_ls = surrogate_keys(li, "l_linestatus")
    fact = chained_dim_joins(
        li.select("l_orderkey", "l_quantity", "l_returnflag", "l_linestatus"),
        [(dim_rf, "l_returnflag"), (dim_ls, "l_linestatus")],
    )
    return (
        fact.groupBy("l_returnflag_key", "l_linestatus_key")
        .agg(dsum("l_quantity", "qty_sum"), F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag_key", "l_linestatus_key")
    )


_Q_STAR_DIM_KEYS_SQL = f"""
WITH dim_rf AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_returnflag) AS INT) AS l_returnflag_key,
         l_returnflag
  FROM (SELECT DISTINCT l_returnflag FROM lineitem WHERE l_returnflag IS NOT NULL)
), dim_ls AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_linestatus) AS INT) AS l_linestatus_key,
         l_linestatus
  FROM (SELECT DISTINCT l_linestatus FROM lineitem WHERE l_linestatus IS NOT NULL)
)
SELECT l_returnflag_key, l_linestatus_key,
       {dsum_sql('l_quantity', 'qty_sum')}, COUNT(*) AS n
FROM lineitem
LEFT JOIN dim_rf USING (l_returnflag)
LEFT JOIN dim_ls USING (l_linestatus)
GROUP BY l_returnflag_key, l_linestatus_key
ORDER BY l_returnflag_key, l_linestatus_key
"""


# ---------------------------------------------------------------------------
# F1: null-on-failure numeric coercion (as.numeric parity) — cast a string
# column to double; unparseable → NULL. Exercised on p_type (never numeric)
# and on a JSON-extracted field (always numeric).
# ---------------------------------------------------------------------------

def q_cast_null_on_fail(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            # ANSI-safe null-on-fail coercion: reference as.numeric parity
            F.col("p_type").try_cast("double").alias("type_as_num"),
            F.col("p_size").cast("double").alias("size_as_num"),
        )
        .orderBy("p_partkey")
    )


_Q_CAST_NULL_SQL = """
SELECT p_partkey,
       TRY_CAST(p_type AS DOUBLE) AS type_as_num,
       CAST(p_size AS DOUBLE) AS size_as_num
FROM part ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# F4/F5: regex match + capture-group extract (comment business-key pattern)
# ---------------------------------------------------------------------------

def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_type").rlike("^[A-Z]+"))
        .select(
            "p_partkey",
            F.regexp_extract(F.col("p_type"), r"^([A-Z]+)", 1).alias("type_head"),
        )
        .groupBy("type_head")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("type_head")
    )


_Q_REGEX_EXTRACT_SQL = """
SELECT regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head, COUNT(*) AS n
FROM part WHERE regexp_matches(p_type, '^[A-Z]+')
GROUP BY type_head ORDER BY type_head
"""


# ---------------------------------------------------------------------------
# P7: conditional classification ladder (case_when parity,
# schema_analyzer.R:29-43 shape)
# ---------------------------------------------------------------------------

def q_conditional_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    cls = (
        F.when(F.col("p_size") >= 40, F.lit("large"))
        .when(F.col("p_size") >= 20, F.lit("medium"))
        .when(F.col("p_size") >= 5, F.lit("small"))
        .otherwise(F.lit("tiny"))
    )
    return (
        part.select(cls.alias("size_class"), "p_retailprice")
        .groupBy("size_class")
        .agg(F.count(F.lit(1)).alias("n"), dsum("p_retailprice", "price_sum"))
        .orderBy("size_class")
    )


_Q_CONDITIONAL_SQL = f"""
SELECT CASE WHEN p_size >= 40 THEN 'large'
            WHEN p_size >= 20 THEN 'medium'
            WHEN p_size >= 5 THEN 'small'
            ELSE 'tiny' END AS size_class,
       COUNT(*) AS n, {dsum_sql('p_retailprice', 'price_sum')}
FROM part GROUP BY size_class ORDER BY size_class
"""


# ---------------------------------------------------------------------------
# JSON path extraction over events.props (F-family extension; the reference
# stringifies nested data — here we keep fidelity instead)
# ---------------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.count(F.col("k")).alias("k_count"),
        )
        .orderBy("event_type")
    )


_Q_JSON_EXTRACT_SQL = """
SELECT event_type,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_count
FROM events GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# A1/A4: one-pass schema profiling + classification (the engine's catalog).
# Profiled columns restricted to string/int (double→varchar rendering differs
# across engines; see profile_oracle_sql docstring).
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]


def q_profile_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xml_to_parquet_spark.plans.schema_analyzer import (
        classify_profile,
        profile_columns,
    )

    cust = _t(spark, sf_dir, "customer")
    return classify_profile(profile_columns(cust, _PROFILE_COLS)).orderBy(
        "column"
    )


def _profile_oracle() -> str:
    from xml_to_parquet_spark.plans.schema_analyzer import profile_oracle_sql

    return profile_oracle_sql("customer", _PROFILE_COLS) + ' ORDER BY "column"'


# ---------------------------------------------------------------------------
# Star transformer end-to-end (J1/J3/W1/P2/F1/A6): catalog-driven star build
# over part, returning the fact with attached surrogate keys.
# ---------------------------------------------------------------------------

def q_star_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from xml_to_parquet_spark.plans.star_transformer import build_star_schema

    part = _t(spark, sf_dir, "part")
    catalog = {
        "p_partkey": {"classification": "identifier"},
        "p_brand": {"classification": "dimension"},
        "p_retailprice": {"classification": "measure"},
        "p_size": {"classification": "measure"},
    }
    star = build_star_schema(
        part, catalog, id_column="p_partkey", include_audit=False
    )
    return star.fact.select(
        "p_partkey", "p_retailprice", "p_size", "p_brand_key"
    ).orderBy("p_partkey")


_Q_STAR_BUILD_SQL = """
WITH dim_brand AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY p_brand) AS INT) AS p_brand_key, p_brand
  FROM (SELECT DISTINCT p_brand FROM part WHERE p_brand IS NOT NULL)
)
SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice,
       CAST(p_size AS DOUBLE) AS p_size, p_brand_key
FROM part LEFT JOIN dim_brand USING (p_brand)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, QuerySpec] = {
    "q01_star_revenue": QuerySpec(
        q_star_revenue, _Q_STAR_REVENUE_SQL, "flagship 5-way star join + agg"
    ),
    "q02_grouped_multi_agg": QuerySpec(
        q_grouped_multi_agg, _Q_GROUPED_MULTI_AGG_SQL, "A2 {col}_{fn} agg"
    ),
    "q03_count_by_group": QuerySpec(
        q_count_by_group, _Q_COUNT_BY_GROUP_SQL, "A3 count-by-group"
    ),
    "q04_project_filter": QuerySpec(
        q_project_filter, _Q_PROJECT_FILTER_SQL, "P1/P3 projection+filter"
    ),
    "q05_distinct": QuerySpec(q_distinct, _Q_DISTINCT_SQL, "U2 distinct"),
    "q06_sort_limit": QuerySpec(
        q_sort_limit, _Q_SORT_LIMIT_SQL, "O1/O2 sort+limit"
    ),
    "q07_union_by_name": QuerySpec(
        q_union_by_name, _Q_UNION_BY_NAME_SQL, "U1 ragged union"
    ),
    "q08_surrogate_keys": QuerySpec(
        q_surrogate_keys, _Q_SURROGATE_KEYS_SQL, "W1 surrogate keys"
    ),
    "q09_star_dim_keys": QuerySpec(
        q_star_dim_keys, _Q_STAR_DIM_KEYS_SQL, "J1/J3/W1 star build"
    ),
    "q10_cast_null_on_fail": QuerySpec(
        q_cast_null_on_fail, _Q_CAST_NULL_SQL, "F1 null-on-fail cast"
    ),
    "q11_regex_extract": QuerySpec(
        q_regex_extract, _Q_REGEX_EXTRACT_SQL, "F4/F5 regex"
    ),
    "q12_conditional_classify": QuerySpec(
        q_conditional_classify, _Q_CONDITIONAL_SQL, "P7 case ladder"
    ),
    "q13_json_extract": QuerySpec(
        q_json_extract, _Q_JSON_EXTRACT_SQL, "JSON path extraction"
    ),
    "q14_profile_classify": QuerySpec(
        q_profile_classify, _profile_oracle(), "A1/A4 schema profiling"
    ),
    "q15_star_build": QuerySpec(
        q_star_build, _Q_STAR_BUILD_SQL, "catalog-driven star transform"
    ),
}
