"""Gate-tooling unit tests (no Spark session needed).

Pins the ADVICE-r12 fix to tools/gate.py's benign-error allowlist: only
the documented accumulator stop race — the DAGScheduler "Failed to
update accumulator" ERROR line WITH "non-existent accumulator" in the
following stack-trace lines — is allowlisted. Any other ERROR line,
including a genuine accumulator-update failure with a different cause,
must stay red.
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from gate import classify_error_lines  # noqa: E402

STOP_RACE = (
    "26/08/16 17:00:01 ERROR DAGScheduler: Failed to update accumulator "
    "12345 (internal.metrics.executorRunTime) for task 7\n"
    "org.apache.spark.SparkException: attempted to access non-existent "
    "accumulator 12345\n"
    "\tat org.apache.spark.util.AccumulatorContext$.get(...)\n"
)

REAL_ACCUM_FAILURE = (
    "26/08/16 17:00:02 ERROR DAGScheduler: Failed to update accumulator "
    "999 (my.custom.Metric) for task 3\n"
    "java.io.NotSerializableException: my.custom.Metric\n"
    "\tat java.io.ObjectOutputStream.writeObject0(...)\n"
)

OTHER_ERROR = (
    "26/08/16 17:00:03 ERROR TaskSetManager: Task 0 in stage 5.0 failed "
    "4 times; aborting job\n"
)


def test_stop_race_is_allowlisted_and_auditable():
    errs, benign = classify_error_lines(STOP_RACE)
    assert errs == []
    assert len(benign) == 1
    assert "Failed to update accumulator" in benign[0]


def test_real_accumulator_failure_stays_red():
    # Same ERROR-line prefix, different cause on the trace lines: the
    # pre-fix regex (line-only match) silently allowlisted this.
    errs, benign = classify_error_lines(REAL_ACCUM_FAILURE)
    assert benign == []
    assert len(errs) == 1


def test_unrelated_error_line_stays_red():
    errs, benign = classify_error_lines(OTHER_ERROR)
    assert benign == []
    assert len(errs) == 1


def test_mixed_stream_classifies_each_independently():
    errs, benign = classify_error_lines(
        STOP_RACE + REAL_ACCUM_FAILURE + OTHER_ERROR
    )
    assert len(benign) == 1
    assert len(errs) == 2


def test_cause_must_be_near_the_error_line():
    # "non-existent accumulator" 20 lines later belongs to some other
    # event — the look-ahead window is a few trace lines only.
    txt = (
        "26/08/16 17:00:04 ERROR DAGScheduler: Failed to update "
        "accumulator 1 (x) for task 0\n"
        + "java.lang.RuntimeException: boom\n" * 10
        + "... non-existent accumulator 1\n"
    )
    errs, benign = classify_error_lines(txt)
    assert benign == []
    assert len(errs) == 1
