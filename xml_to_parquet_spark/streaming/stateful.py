"""Custom stateful streaming operator: event sessionization.

SURVEY §2.9 parity-plus via the ``applyInPandasWithState`` escape hatch —
the canonical example of an operator Spark's built-in windowed aggs can't
express (session windows keyed by inactivity gaps with custom per-session
outputs).

Semantics: events for a user belong to one session while consecutive
events are within ``gap`` seconds; a session emits (user_id,
session_start, session_end, n_events, value_sum) when closed by the
inactivity timeout (streaming) or end-of-input (batch helper).

Scale: state is one open session per user; the state store shards by
user_id across executors. Timeouts bound state lifetime.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)
_STATE_SCHEMA = "start long, last long, n long, vsum double"


def sessionize_stateful(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Streaming sessionization over a streaming DataFrame with columns
    (user_id long, ts timestamp, value double).

    Uses applyInPandasWithState with processing-time timeouts: a session
    closes after ``gap_seconds`` without new events for that user.
    """
    def fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        vals = rows["value"].tolist()
        if state.exists:
            start, last, n, vsum = state.get
        else:
            start, last, n, vsum = ts_us[0], ts_us[0], 0, 0.0

        out = []
        gap_us = gap_seconds * 1_000_000
        for t, v in zip(ts_us, vals):
            if n > 0 and t - last > gap_us:
                out.append((user_id, start, last, n, vsum))
                start, n, vsum = t, 0, 0.0
            last = t
            n += 1
            vsum += float(v)
        state.update((start, last, n, vsum))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [
                        pd.Timestamp(o[1], unit="us") for o in out
                    ],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "value_sum": [o[4] for o in out],
                }
            )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin of the sessionizer — pure window expressions, same
    session definition, used to cross-check the stateful operator.

    session id = running count of gap-breaks per user (classic
    lag/cumsum sessionization); fully SQL-expressible.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("user_id").orderBy("ts")
    gap_break = (
        F.col("ts").cast("long")
        - F.lag(F.col("ts").cast("long"), 1).over(w)
        > gap_seconds
    ).cast("int")
    sess = events.select(
        "user_id", "ts", "value",
        F.sum(F.coalesce(gap_break, F.lit(0))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .drop("session_id")
    )
