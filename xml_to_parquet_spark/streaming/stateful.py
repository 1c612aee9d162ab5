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

import os
import sys
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# transformWithStateInPandas speaks a protobuf state protocol between the
# JVM and its Python state server. A real `protobuf` installation is used
# when present; in this container (no pip installs, no network) the shim
# runtime under xml_to_parquet_spark/_pbshim supplies the slice of the
# public wire format the state protocol needs (r6, VERDICT r5 item 7 —
# previously this twin was import-gated and never executed here).

_PBSHIM_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "_pbshim"
)


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable — preferring a real
    installation, falling back to the bundled shim — and, when a session
    is given, expose the shim to the Python WORKER processes (the state
    protocol runs there, not in the driver). Returns False only when
    neither is usable.

    Worker plumbing note (measured, r6): the streaming python runner
    builds the worker's PYTHONPATH from sparkPythonPath plus the
    PYTHONPATH entry of the UDF's ``envVars`` — the JVM's own inherited
    environment is NOT merged, so setting os.environ on the driver is
    not enough. ``envVars`` is populated from ``sc.environment``, so the
    shim directory is injected there (picked up by every UDF wrapped
    afterwards); ``addPyFile`` covers the regular task-worker path too.
    The spark-core jar sitting on the worker path yields only a
    NAMESPACE ``google.protobuf`` portion (its embedded .proto files) —
    a regular package later on the path always wins resolution."""
    try:
        import google.protobuf

        real = not (
            getattr(google.protobuf, "__file__", None) or ""
        ).startswith(_PBSHIM_DIR)
    except ImportError:
        real = False
        if _PBSHIM_DIR not in sys.path:
            sys.path.insert(0, _PBSHIM_DIR)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:  # pragma: no cover - shim broken/missing
            return False
    if spark is not None and not real:
        sc = spark.sparkContext
        env_pp = sc.environment.get("PYTHONPATH", "")
        # CAUTION (r8, found by driver_sim): when sc.environment carries
        # no PYTHONPATH, workers inherit a default that keeps this REPO
        # importable; setting the entry REPLACES that default, so a
        # pbshim-only value breaks every LATER UDF that unpickles a
        # by-reference module function (a46 ran → a34's mapInPandas died
        # with ModuleNotFoundError on a bare driver session). Always
        # carry the package root alongside the shim.
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        have = env_pp.split(os.pathsep) if env_pp else []
        add = [p for p in (pkg_root, _PBSHIM_DIR) if p not in have]
        if add:
            sc.environment["PYTHONPATH"] = os.pathsep.join(have + add)
        import hashlib
        import tempfile
        import zipfile

        # content-addressed zip name: a fixed path would let a STALE shim
        # (earlier round, other checkout, concurrent worktree) ship to
        # workers while the driver runs the current code
        sources = sorted(
            os.path.join(root, fn)
            for root, _dirs, files in os.walk(_PBSHIM_DIR)
            for fn in files
            if fn.endswith(".py")
        )
        digest = hashlib.md5(
            b"\0".join(open(f, "rb").read() for f in sources)
        ).hexdigest()[:12]
        zpath = os.path.join(
            tempfile.gettempdir(), f"pbshim_google_{digest}.zip"
        )
        if not os.path.exists(zpath):
            # write to a unique temp file and rename into place: a
            # concurrent session computing the same digest must never
            # observe (and addPyFile) a partially-written zip
            fd, tmp = tempfile.mkstemp(
                suffix=".zip", dir=os.path.dirname(zpath)
            )
            try:
                with os.fdopen(fd, "wb") as fh, zipfile.ZipFile(
                    fh, "w"
                ) as zf:
                    for full in sources:
                        zf.write(full, os.path.relpath(full, _PBSHIM_DIR))
                os.replace(tmp, zpath)  # atomic on POSIX
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
        sc.addPyFile(zpath)
    return True


HAS_TWS_PROTO = ensure_protobuf()

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

    from xml_to_parquet_spark.session import _ship_package

    _ship_package(events.sparkSession)
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


def sessionize_tws(
    events: DataFrame,
    gap_seconds: int = 1800,
    register_timers: bool = True,
) -> DataFrame:
    """Sessionization on the MODERN stateful API
    (``transformWithStateInPandas``, Spark 4): same semantics as
    :func:`sessionize_stateful`, expressed as a ``StatefulProcessor``
    with explicit ValueState + processing-time timers.

    Why both exist: ``applyInPandasWithState`` is the legacy single-shot
    escape hatch; transformWithState is its successor — composable typed
    state (value/list/map), explicit timer registry, initial-state
    bootstrap, TTL — the API new pipelines should target. Keeping the
    two implementations semantically identical (same fold, same emit
    rules) is itself a regression check on the migration path.

    Requires ``google.protobuf`` in the Python worker environment (the
    state protocol is protobuf-framed): a real installation when present,
    else the bundled shim runtime, which ``ensure_protobuf`` ships to the
    workers here.
    """
    if not ensure_protobuf(events.sparkSession):  # pragma: no cover
        raise RuntimeError(
            "transformWithStateInPandas needs google.protobuf and neither "
            "a real installation nor the bundled shim is importable"
        )
    # transformWithState keeps each state variable in its own column
    # family — only the RocksDB provider supports that (the HDFS-backed
    # default refuses). Session-level on purpose: the conf is read when
    # the QUERY starts (in the caller), and RocksDB is the provider a
    # production stateful deployment runs anyway.
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = gap_seconds * 1_000_000
    gap_ms = gap_seconds * 1000

    def _emit(user_id: int, closed: list) -> Iterator[pd.DataFrame]:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [
                    pd.Timestamp(c[0], unit="us") for c in closed
                ],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "value_sum": [c[3] for c in closed],
            }
        )

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timer_values):
            (user_id,) = key
            pdf = pd.concat(list(rows)).sort_values("ts")
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            vals = pdf["value"].tolist()
            if self._state.exists():
                start, last, n, vsum = self._state.get()
            else:
                start, last, n, vsum = ts_us[0], ts_us[0], 0, 0.0
            closed = []
            for t, v in zip(ts_us, vals):
                if n > 0 and t - last > gap_us:
                    closed.append((start, last, n, vsum))
                    start, n, vsum = t, 0, 0.0
                last = t
                n += 1
                vsum += float(v)
            self._state.update((start, last, n, vsum))
            if register_timers:
                # one live timer per key: re-arm the inactivity deadline
                for old in self._handle.listTimers():
                    self._handle.deleteTimer(old)
                self._handle.registerTimer(
                    timer_values.getCurrentProcessingTimeInMs() + gap_ms
                )
            if closed:
                yield from _emit(user_id, closed)

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            (user_id,) = key
            if self._state.exists():
                start, last, n, vsum = self._state.get()
                self._state.clear()
                yield from _emit(user_id, [(start, last, n, vsum)])

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(),
            outputStructType=SESSION_SCHEMA,
            outputMode="append",
            timeMode="ProcessingTime",
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
