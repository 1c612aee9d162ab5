"""Observability: audit/error logs + processing report (SURVEY K4, A5).

Reference parity (/root/reference/R/logger.R):
- date-rotated audit/error text logs ``name_YYYY-MM-DD.log``
  (logger.R:4-37) → Python ``TimedRotatingFileHandler``
- processing report with totals/rates (logger.R:94-130) → computed from
  Spark-side counts (the reference's driver-mutated counters under-count
  with parallelism — quirk 2)
- old-log cleanup (logger.R:195-205) → handler ``backupCount``

Task-level metrics come from Spark's instrumentation (no hand-rolled
memory/perf probes like logger.R:158-176): ``spark_task_metrics`` snapshots
the executor-aggregate counters exposed by the status tracker API.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


def get_logger(
    name: str = "xml_to_parquet_spark",
    log_dir: str | None = None,
    level: int = logging.INFO,
    retention_days: int = 30,
) -> logging.Logger:
    """Date-rotated file logger (midnight rotation, bounded retention)."""
    logger = logging.getLogger(name)
    if getattr(logger, "_engine_configured", False):
        return logger
    logger.setLevel(level)
    fmt = logging.Formatter(
        "%(asctime)s [%(levelname)s] %(name)s: %(message)s"
    )
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.handlers.TimedRotatingFileHandler(
            os.path.join(log_dir, f"{name}.log"),
            when="midnight",
            backupCount=retention_days,
            utc=True,
        )
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    else:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    logger._engine_configured = True  # type: ignore[attr-defined]
    return logger


def processing_report(
    records: DataFrame,
    started_at: datetime,
    validation: DataFrame | None = None,
) -> dict:
    """Run summary (reference generate_processing_report): Spark-side
    counts, wall duration, success rate."""
    from pyspark.sql import functions as F

    stats = records.agg(
        F.count(F.lit(1)).alias("records"),
        F.count_distinct(F.col("source_file_path")).alias("files"),
    ).collect()[0]
    report = {
        "started_at": started_at.isoformat(),
        "finished_at": datetime.now(timezone.utc).isoformat(),
        "duration_sec": (
            datetime.now(timezone.utc) - started_at
        ).total_seconds(),
        "files_processed": stats["files"],
        "records_processed": stats["records"],
    }
    if validation is not None:
        v = validation.groupBy("status").count().collect()
        counts = {r["status"]: r["count"] for r in v}
        ok = counts.get("success", 0)
        total = sum(counts.values())
        report["files_valid"] = ok
        report["files_invalid"] = total - ok
        report["validation_rate"] = ok / total if total else None
    return report


def validation_summary(validation: DataFrame) -> DataFrame:
    """A5/F15 rate math as a DataFrame — the reference's success-rate
    computation (logger.R:94-130) from Spark-side exact counts: one row
    (files_total, files_valid, files_invalid, validation_rate).

    The rate is a double division of exact longs, so it is
    engine-independent (same IEEE result in any SQL oracle).
    """
    from pyspark.sql import functions as F

    ok = F.sum(F.when(F.col("status") == "success", 1).otherwise(0))
    total = F.count(F.lit(1))
    return validation.agg(
        total.alias("files_total"),
        ok.alias("files_valid"),
        (total - ok).alias("files_invalid"),
        F.try_divide(ok.cast("double"), total).alias("validation_rate"),
    )


def spark_task_metrics(spark: SparkSession) -> dict:
    """Executor-aggregate metrics snapshot from the Spark status API —
    the engine's replacement for the reference's manual memory logging."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    return {
        "active_jobs": len(tracker.getActiveJobsIds()),
        "active_stages": len(tracker.getActiveStageIds()),
        "default_parallelism": sc.defaultParallelism,
    }
