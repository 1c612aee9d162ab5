"""proc_tree_cpu_ms (r12, VERDICT r11 item 3): the load-insensitive
per-query metric the bench sidecar records next to wall time. These
tests pin the three properties bench.py relies on: self CPU is counted,
reaped-child CPU is counted exactly once (via the parent's cutime), and
absent roots degrade to 0 instead of raising."""

import os
import subprocess
import sys
import time

import pytest

from xml_to_parquet_spark.logging_utils import _proc_stat_cpu, proc_tree_cpu_ms

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/proc"), reason="requires Linux /proc"
)


def _burn(ms: float) -> None:
    t0 = time.process_time()
    while (time.process_time() - t0) * 1000.0 < ms:
        sum(i * i for i in range(1000))


def test_self_cpu_counted_and_monotonic():
    c0 = proc_tree_cpu_ms()
    assert c0 is not None and c0 > 0
    _burn(80)
    c1 = proc_tree_cpu_ms()
    # clock-tick granularity is 10ms at CLK_TCK=100; 80ms of burn must
    # show up as at least a few ticks
    assert c1 - c0 >= 30, (c0, c1)


def test_reaped_child_cpu_counted_once():
    # a child that burns CPU and EXITS before the second snapshot is
    # only visible through the kernel folding its time into our
    # cutime/cstime at reap — the exact mechanism the docstring claims
    c0 = proc_tree_cpu_ms()
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0 = time.process_time()\n"
            "while (time.process_time() - t0) < 0.15:\n"
            "    sum(i * i for i in range(1000))\n",
        ],
        check=True,
    )
    c1 = proc_tree_cpu_ms()
    # the child burned >=150ms; interpreter startup adds more. Require
    # a conservative floor so scheduler noise can't flake the test.
    assert c1 - c0 >= 100, (c0, c1)


def test_live_child_cpu_counted():
    # a STILL-RUNNING descendant is found via the ppid walk, not cutime
    c0 = proc_tree_cpu_ms()
    p = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0 = time.process_time()\n"
            "while (time.process_time() - t0) < 0.15:\n"
            "    sum(i * i for i in range(1000))\n"
            "time.sleep(5)\n",
        ],
    )
    try:
        deadline = time.time() + 10
        while time.time() < deadline:
            c1 = proc_tree_cpu_ms()
            if c1 - c0 >= 100:
                break
            time.sleep(0.05)
        assert c1 - c0 >= 100, (c0, c1)
    finally:
        p.kill()
        p.wait()


def test_absent_root_returns_zero_not_error():
    # PID namespaces top out well below 2^22 by default; this pid
    # cannot exist, and the walk must degrade to "no tree members"
    assert proc_tree_cpu_ms(2**22 + 12345) == 0.0


def test_proc_stat_parser_handles_own_stat():
    ppid, own, reaped = _proc_stat_cpu(os.getpid())
    assert ppid > 0
    assert own >= 0 and reaped >= 0


def test_proc_stat_parser_vanished_pid():
    assert _proc_stat_cpu(2**22 + 12345) is None


def test_engine_cpu_self_only_monotonic_without_spark():
    # no SparkSession and no java child: engine_cpu_ms degrades to this
    # process's own utime+stime — monotonic under load by construction
    from xml_to_parquet_spark.logging_utils import engine_cpu_ms

    c0 = engine_cpu_ms(None)
    assert c0 is not None and c0 > 0
    _burn(80)
    c1 = engine_cpu_ms(None)
    assert c1 - c0 >= 30, (c0, c1)


def test_engine_cpu_never_negative_across_child_churn():
    # the exact hazard that broke the tree walk: a child accumulating
    # CPU then dying must never make the metric go backwards
    from xml_to_parquet_spark.logging_utils import engine_cpu_ms

    c0 = engine_cpu_ms(None)
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import time\n"
            "t0 = time.process_time()\n"
            "while (time.process_time() - t0) < 0.2:\n"
            "    sum(i * i for i in range(1000))\n",
        ],
        check=True,
    )
    c1 = engine_cpu_ms(None)
    assert c1 >= c0  # child CPU excluded, never subtracted


def test_local_jvm_pid_finds_java_child_or_none():
    from xml_to_parquet_spark.logging_utils import _local_jvm_pid

    pid = _local_jvm_pid(None)
    assert pid is None or pid > 0


def test_engine_cpu_counts_jvm_work(spark):
    # with a live session the JVM pid must resolve (gateway proc or
    # /proc child scan) and a Spark job's CPU must show up in the delta
    # even though the python side mostly waits
    from xml_to_parquet_spark.logging_utils import _local_jvm_pid, engine_cpu_ms

    assert _local_jvm_pid(spark) is not None
    c0 = engine_cpu_ms(spark)
    spark.range(0, 3_000_000, 1, 8).selectExpr(
        "sum(pmod(xxhash64(id), 1000000007)) AS s"
    ).collect()
    c1 = engine_cpu_ms(spark)
    assert c1 - c0 >= 50, (c0, c1)  # JVM burned CPU; python mostly slept
