"""Table loading for the driver's synthetic parquet tables.

Tables (one parquet per table under an sf dir, see /root/repo/TESTDATA.md):
    region nation customer supplier part orders lineitem events
    documents embeddings
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet carries TIMESTAMP(NANOS), unreadable by Spark
        # without this legacy conf; runtime-settable, so self-defend here —
        # the session may be driver-provided without our session defaults
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): with nanosAsLong it arrives as a
    # raw long of ns-since-epoch — convert to a microsecond timestamp. Must
    # be integer division (`div`): epoch-ns (~1.7e18) exceeds 2^53, so a
    # float divide rounds the low microsecond bits on ~1.5% of rows.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Newer testdata writes ts as plain parquet TIMESTAMP(MICROS) without
    # isAdjustedToUTC, which Spark 4 reads as TIMESTAMP_NTZ. Event-time
    # operators (watermarks) require TIMESTAMP; the NTZ→LTZ cast interprets
    # the wall clock in the session timezone and date_format renders it back
    # in the same zone, so formatted output round-trips identically to
    # DuckDB's naive TIMESTAMP regardless of what the session zone is.
    if name == "events" and isinstance(
        df.schema["ts"].dataType, T.TimestampNTZType
    ):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so spark.sql() can reference it."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
