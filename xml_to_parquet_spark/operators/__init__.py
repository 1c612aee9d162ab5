from xml_to_parquet_spark.operators.relational import (
    project,
    drop_columns,
    filter_not_null,
    union_by_name,
    distinct_values,
    sort_limit,
    left_broadcast_join,
    chained_dim_joins,
)
from xml_to_parquet_spark.operators.aggregation import (
    dsum,
    davg,
    grouped_multi_agg,
    grouped_percentiles,
    count_by_group,
)
from xml_to_parquet_spark.operators.window import grouped_topk, surrogate_keys

__all__ = [
    "project",
    "drop_columns",
    "filter_not_null",
    "union_by_name",
    "distinct_values",
    "sort_limit",
    "left_broadcast_join",
    "chained_dim_joins",
    "dsum",
    "davg",
    "grouped_multi_agg",
    "grouped_percentiles",
    "count_by_group",
    "grouped_topk",
    "surrogate_keys",
]
