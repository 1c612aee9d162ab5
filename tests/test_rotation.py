"""Window-rotation policy tests (VERDICT r10 item 3): the stalest-first
driver window must be mechanical, idempotent, and alarmed — coverage
debt across the 50-slot window cannot accumulate silently."""

import os
import sys

TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
sys.path.insert(0, TOOLS)

import rotation_report as rr  # noqa: E402
import rotate_window as rw  # noqa: E402


def test_window_matches_stalest_first_policy():
    # the alarm accepts a one-round lag (the window is chosen before
    # the next CORRECTNESS file lands), so assert through it rather
    # than re-deriving the equality here
    rows = rr.build_rows()
    failures, _ = rr.staleness_alarm(rows)
    assert not [f for f in failures if "deviates" in f], failures
    assert rr.PINNED in {r["entry"] for r in rows if r["in_window"]}


def test_rotate_window_idempotent_when_policy_holds():
    # immediately after a rotation the plan must be empty — renames
    # happen once per round, not on every invocation. When a new
    # CORRECTNESS file has landed since the last rotation (one-round
    # lag), a non-empty plan is the expected prompt to rotate; in that
    # state applying the plan twice must still be a fixed point.
    plan = rw.plan_renames()
    if plan:
        failures, warnings = rr.staleness_alarm(rr.build_rows())
        assert not failures, (plan, failures)
        assert any("lags" in w for w in warnings), (plan, warnings)


def test_staleness_alarm_no_failures_on_current_tree():
    failures, _warnings = rr.staleness_alarm(rr.build_rows())
    assert failures == []


def test_staleness_alarm_fires_on_stalled_rotation():
    # synthetic: an entry green under the policy era, now out of the
    # window, >STALE_BOUND stale, and NOT scheduled by the next rotation
    # -> must be a FAILURE, not a warning. Poison the row directly (the
    # alarm reads last_green_round from rows) and keep the victim out of
    # desired_window by making it the FRESHEST green among the
    # out-of-window entries.
    import pytest

    rows = rr.build_rows()
    latest = max(r["last_driver_round"] or 0 for r in rows)
    stale_round = latest - rr.STALE_BOUND
    if stale_round < rr.ADOPTION_ROUND - rr.STALE_BOUND:
        pytest.skip("history too short for the post-adoption branch")
    want = rr.desired_window(rows)
    victim = next(
        (
            r
            for r in rows
            if not r["in_window"]
            and r["entry"] not in want
            and r["green_rounds"] > 0
        ),
        None,
    )
    if victim is None:  # lag state can put every stale entry in want
        pytest.skip("no out-of-window entry outside the next window")
    victim["last_green_round"] = stale_round  # stale by BOUND+1
    failures, _ = rr.staleness_alarm(rows)
    assert any(victim["entry"] in f for f in failures)


def test_coverage_appendix_current():
    """The COVERAGE.md slug appendix must list every catalog key with
    correct window membership (rotate_window regenerates it; this
    catches a rotation committed without the regen)."""
    cov = open(os.path.join(os.path.dirname(TOOLS), "COVERAGE.md")).read()
    keys = rr.catalog_keys()
    window = set(keys[:rr.WINDOW])
    for k in keys:
        slug = k.split("_", 1)[1]
        expected = f"| {slug} | {k} | {'yes' if k in window else ''} |"
        assert expected in cov, f"stale appendix row for {k}"


def test_desired_window_prefers_never_checked():
    rows = rr.build_rows()
    want = rr.desired_window(rows)
    for r in rows:
        if r["last_driver_round"] is None:
            assert r["entry"] in want, (
                f"never-driver-checked entry {r['entry']} must be in "
                f"the window"
            )
