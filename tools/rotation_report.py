#!/usr/bin/env python
"""Driver-window rotation dashboard (VERDICT-r8 item 7).

The external driver verifies only the first 50 catalog keys in sorted
order (all a-names sort before q-names), so which entries get a fresh
CORRECTNESS row each round is decided purely by naming. Rotation used to
be hand-tracked in CHANGES notes; this report makes it mechanical and
auditable:

  entry | slug | in window? | last driver round | green rounds | depth

* identity across renames is the SLUG (the part after the first '_') —
  every rename in repo history preserved it (a40 <- q21, a38 <- q14, ...);
* "depth" is the measured full-catalog bench seconds from the newest
  BENCH_r*.json that carries the slug (a streaming/iterative entry costs
  seconds, a single groupBy costs tenths) — a proxy the judge can re-run,
  not a hand-assigned opinion;
* the suggested swap pairs NEVER-driver-checked entries (deepest first)
  with the stalest, shallowest, longest-green window residents.

Usage: python tools/rotation_report.py [--json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def catalog_keys() -> list[str]:
    """Current catalog keys without importing pyspark (regex over the
    QUERIES literal keeps this runnable in a bare venv)."""
    src = open(os.path.join(REPO, "xml_to_parquet_spark/workload.py")).read()
    block = src[src.index("QUERIES: dict[str, QuerySpec] = {"):]
    keys = re.findall(r'^    "([aq]\d+_[a-z0-9_]+)": QuerySpec', block, re.M)
    return sorted(set(keys))


def slug(key: str) -> str:
    return key.split("_", 1)[1]


def driver_history() -> dict[str, list[tuple[int, bool]]]:
    out: dict[str, list[tuple[int, bool]]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k, v in json.load(open(f)).items():
            ok = bool(
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ) and not v.get("err")
            out.setdefault(slug(k), []).append((rnd, ok))
    return out


def bench_depth() -> dict[str, float]:
    depth: dict[str, float] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))) + [
        os.path.join(REPO, "BENCH_LOCAL_FULL.json")
    ]:
        if not os.path.exists(f):
            continue
        try:
            d = json.load(open(f))
        except ValueError:
            # driver bench files wrap the JSON line in a "tail" blob
            txt = open(f).read()
            m = re.search(r'\{"metric".*\}', txt)
            if not m:
                continue
            d = json.loads(m.group(0))
        tail = d.get("tail", "")
        m = re.search(r'\{"metric".*\}', tail) if tail else None
        q = (json.loads(m.group(0)) if m else d).get("queries", {})
        for k, v in q.items():
            if isinstance(v, (int, float)):
                depth[slug(k)] = float(v)  # newest file wins
    return depth


def build_rows(max_round: int | None = None):
    """Catalog rows; ``max_round`` restricts driver history to rounds
    <= it (used to reconstruct the view the CURRENT window was chosen
    under, before the latest CORRECTNESS file landed)."""
    keys = catalog_keys()
    hist = driver_history()
    if max_round is not None:
        hist = {
            s: [(r, ok) for r, ok in h if r <= max_round]
            for s, h in hist.items()
        }
    depth = bench_depth()
    window = set(keys[:WINDOW])
    rows = []
    for k in keys:
        s = slug(k)
        h = hist.get(s, [])
        greens = [r for r, ok in h if ok]
        rows.append(
            {
                "entry": k,
                "slug": s,
                "in_window": k in window,
                "last_driver_round": max((r for r, _ in h), default=None),
                "last_green_round": max(greens, default=None),
                "green_rounds": len(greens),
                "depth_sec": depth.get(s),
            }
        )
    return rows


PINNED = "q01_star_revenue"  # flagship: always in the window

# Round the stalest-first window policy was adopted (r11, VERDICT r10
# item 3). Entries last driver-green BEFORE (ADOPTION_ROUND - STALE_BOUND)
# are pre-policy debt: the policy serves them stalest-first within
# ceil((N-1)/49) rounds, so the staleness alarm exempts them until their
# first post-adoption green. Entries green since then that exceed
# STALE_BOUND mean rotation STALLED -> gate failure.
ADOPTION_ROUND = 11
STALE_BOUND = 4


def desired_window(rows) -> set[str]:
    """The debt-minimizing 50-slot window: the flagship + the 49 stalest
    entries by last driver-GREEN round (never-green first, then oldest
    green; ties broken by SLUG for determinism). Ranking by GREEN, not
    by last checked, keeps this aligned with the staleness alarm: a
    persistently-red entry stays prioritized for re-exposure instead of
    rotating out as 'fresh' and wedging the stall detector.

    r12: bench depth was REMOVED from the tie-break. It made the policy
    window a function of whichever BENCH file is newest — committing a
    fresh sidecar mid-round reshuffled the ties among same-round
    entries and flipped the 'correct' window out from under an
    already-executed rotation (gate RED with no rotation debt at all).
    Depth stays in the report and in ``suggest`` as advisory signal;
    the POLICY depends only on the CORRECTNESS history + the catalog,
    which change exactly once per round.
    tools/rotate_window.py renames keys to realize this set;
    tools/gate.py fails if the live window deviates."""

    def staleness_key(r):
        never = r["last_green_round"] is None
        return (
            0 if never else 1,
            r["last_green_round"] or 0,
            r["slug"],
        )

    rest = sorted(
        (r for r in rows if r["entry"] != PINNED), key=staleness_key
    )
    return {PINNED} | {r["entry"] for r in rest[: WINDOW - 1]}


def staleness_alarm(rows) -> tuple[list[str], list[str]]:
    """Returns (failures, warnings) for the gate's rotation stage.

    Projected staleness at the NEXT driver round R+1: in-window entries
    get a fresh row then (0); out-of-window entries age to
    R+1 - last_green. Failures: (a) the live window deviates from
    desired_window (avoidable debt — rotation not executed), (b) an
    entry that has gone green since ADOPTION_ROUND - STALE_BOUND is
    nonetheless >STALE_BOUND stale (rotation stalled). Pre-policy debt
    still draining under stalest-first is a warning, not a failure."""
    live = {r["entry"] for r in rows if r["in_window"]}
    want = desired_window(rows)
    failures, warnings = [], []
    latest = max(
        (r["last_driver_round"] or 0 for r in rows), default=0
    )
    if live != want:
        # one-round lag is legitimate: right after the driver lands
        # CORRECTNESS_r{N}, the live window was chosen under the
        # r{N-1} view and the next builder round rotates it first
        # thing — accept the window that was optimal under that view.
        # (The reconstruction uses the CURRENT catalog and bench depths;
        # if entries or bench files landed since the window was chosen
        # the comparison can miss, but the remedy is the same either
        # way and is named in the failure message.)
        prev_view = desired_window(build_rows(max_round=latest - 1))
        if live == prev_view:
            warnings.append(
                f"window lags the r{latest} CORRECTNESS by one round "
                f"(chosen under the r{latest - 1} view) — run "
                f"tools/rotate_window.py"
            )
        else:
            miss = sorted(want - live)
            extra = sorted(live - want)
            failures.append(
                f"window deviates from stalest-first policy: "
                f"missing {miss[:6]}{'...' if len(miss) > 6 else ''}, "
                f"holds {extra[:6]}{'...' if len(extra) > 6 else ''} "
                f"— run tools/rotate_window.py"
            )
    nxt = latest + 1
    for r in rows:
        if r["in_window"]:
            continue  # goes green at round nxt
        last_green = r["last_green_round"]
        if last_green is None:
            failures.append(
                f"{r['entry']}: never driver-green and NOT in the window"
            )
            continue
        stale = nxt - last_green
        if stale > STALE_BOUND:
            if r["entry"] in want:
                # the next rotation serves it — scheduled, not stalled
                # (only reachable in the accepted one-round-lag state;
                # once the window IS the policy window, in-window
                # entries never reach this branch)
                warnings.append(
                    f"{r['entry']}: {stale} rounds stale but scheduled "
                    f"for the next rotation"
                )
            elif last_green >= ADOPTION_ROUND - STALE_BOUND:
                failures.append(
                    f"{r['entry']}: {stale} rounds since last driver "
                    f"green (r{last_green}) — rotation stalled"
                )
            else:
                warnings.append(
                    f"{r['entry']}: pre-policy debt, {stale} rounds "
                    f"since r{last_green} (draining stalest-first)"
                )
    return failures, warnings


def suggest(rows, n_pairs=17):
    never = sorted(
        (
            r
            for r in rows
            if r["last_driver_round"] is None and not r["in_window"]
        ),
        key=lambda r: -(r["depth_sec"] or 0.0),
    )
    # retire: in-window, >=3 green driver rounds, shallowest+stalest first
    retire = sorted(
        (
            r
            for r in rows
            if r["in_window"]
            and r["green_rounds"] >= 3
            and r["entry"] != "q01_star_revenue"  # flagship stays
        ),
        key=lambda r: (r["depth_sec"] or 0.0, -(r["green_rounds"])),
    )
    return list(zip(never[:n_pairs], retire[: len(never[:n_pairs])]))


def main() -> int:
    rows = build_rows()
    pairs = suggest(rows)
    if "--json" in sys.argv:
        print(json.dumps({"rows": rows, "suggest": [
            {"promote": a["entry"], "retire": b["entry"]} for a, b in pairs
        ]}, indent=1))
        return 0
    hdr = f"{'entry':34} {'win':3} {'last_r':6} {'greens':6} {'depth_s':7}"
    print(hdr)
    print("-" * len(hdr))
    for r in sorted(
        rows, key=lambda r: (r["last_driver_round"] or 0, -(r["depth_sec"] or 0))
    ):
        print(
            f"{r['entry']:34} {'*' if r['in_window'] else ' ':3} "
            f"{r['last_driver_round'] or '-':>6} {r['green_rounds']:>6} "
            f"{'' if r['depth_sec'] is None else f'{r_depth(r):.2f}':>7}"
        )
    print()
    print("suggested swaps (promote <- retire):")
    for a, b in pairs:
        print(
            f"  {a['entry']:34} (depth {a['depth_sec'] or 0:.2f}s)  <-  "
            f"{b['entry']} (green x{b['green_rounds']}, "
            f"{b['depth_sec'] or 0:.2f}s)"
        )
    return 0


def r_depth(r) -> float:
    return r["depth_sec"] or 0.0


if __name__ == "__main__":
    raise SystemExit(main())
