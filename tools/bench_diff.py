#!/usr/bin/env python
"""Era-normalized bench diff (r10, VERDICT r9 item 6).

Same-code full-catalog walls drift 108-136s across eras of this VM, so a
raw per-query diff between two bench files mostly measures the box, not
the code. bench.py now stamps each run with an ``era`` block — a fixed
calibration micro-job (range → xxhash64 → sum, min-of-5, in ms) timed
before and after the sweep, plus loadavg. This tool diffs two bench
JSONs slug-matched and, when both carry the marker, scales the older
run's per-query times by the calibration ratio so the printed deltas are
code deltas, not era deltas.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N] [--wall]

Accepts bench.py sidecars (BENCH_LOCAL_FULL*.json) and driver BENCH_r*.json
files (whose JSON line may be wrapped in a "tail" blob).

When BOTH files carry a ``queries_cpu`` map (r12+ sidecars: per-query
process-tree CPU seconds), the diff uses it INSTEAD of wall time — CPU
time does not stretch with box load, so no era normalization is needed
and the delta is a code delta by construction. ``--wall`` forces the
legacy wall-time diff.
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict) and isinstance(d.get("parsed"), dict) \
            and "queries" in d["parsed"]:
        return d["parsed"]
    if isinstance(d, dict) and isinstance(d.get("tail"), str):
        raw = d["tail"]
    # driver files wrap the printed line inside a tail blob — take the
    # last {...} that parses and has "queries"
    for m in reversed(re.findall(r"\{.*\}", raw)):
        try:
            cand = json.loads(m)
        except json.JSONDecodeError:
            continue
        if isinstance(cand, dict) and "queries" in cand:
            return cand
    raise SystemExit(f"no bench JSON with 'queries' found in {path}")


def slug(key: str) -> str:
    return key.split("_", 1)[1]


def cal_ms(d: dict) -> float | None:
    era = d.get("era") or {}
    vals = [
        era.get("cal_ms_start"),
        era.get("cal_ms_mid"),  # r11: mature-JVM mid-sweep bracket
        era.get("cal_ms_end"),
    ]
    vals = [v for v in vals if isinstance(v, (int, float))]
    return min(vals) if vals else None


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else int(args.pop())
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load_bench(args[0]), load_bench(args[1])
    use_cpu = (
        "--wall" not in sys.argv
        and old.get("queries_cpu")
        and new.get("queries_cpu")
    )
    if use_cpu:
        scale = 1.0
        marker = "CPU-time diff (process-tree CPU sec; load-insensitive)"
        o = {slug(k): v for k, v in old["queries_cpu"].items()}
        n = {slug(k): v for k, v in new["queries_cpu"].items()}
    else:
        co, cn = cal_ms(old), cal_ms(new)
        scale = (cn / co) if (co and cn) else 1.0
        marker = (
            f"era scale {scale:.3f} (cal {co:.0f}ms -> {cn:.0f}ms)"
            if (co and cn)
            else "NO era marker on both sides - raw diff (era noise included)"
        )
        o = {slug(k): v for k, v in old["queries"].items()}
        n = {slug(k): v for k, v in new["queries"].items()}
    common = sorted(set(o) & set(n))
    rows = [(s, o[s] * scale, n[s], n[s] - o[s] * scale) for s in common]
    rows.sort(key=lambda r: r[3])
    print(marker)
    print(
        f"{len(common)} shared slugs | only-old: {len(set(o) - set(n))} "
        f"| only-new: {len(set(n) - set(o))}"
    )
    print(f"{'slug':<28}{'old*scale':>10}{'new':>8}{'delta':>8}")
    shown = rows[:top] + ([("...", 0, 0, 0)] if len(rows) > 2 * top else [])
    shown += rows[-top:] if len(rows) > top else []
    for s, os_, ns_, d in shown:
        if s == "...":
            print("  ...")
            continue
        print(f"{s:<28}{os_:>10.3f}{ns_:>8.3f}{d:>+8.3f}")
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    tot_o_raw = sum(o[s] for s in common)
    print(
        f"shared total: {tot_o:.1f}s (old, era-normalized) -> "
        f"{tot_n:.1f}s (new): {tot_n - tot_o:+.1f}s"
    )
    print(
        f"shared total RAW: {tot_o_raw:.1f}s (old) -> {tot_n:.1f}s "
        f"(new): {tot_n - tot_o_raw:+.1f}s"
    )
    if scale != 1.0:
        # the calibration job is pure CPU/codegen; query walls include
        # fixed-latency components (streaming triggers, Python worker
        # startup, commit fsyncs) that do NOT scale with CPU era. The
        # truth is bracketed by the two totals: RAW assumes zero era
        # drift, NORMALIZED assumes every second is CPU-era-scaled.
        print(
            "note: normalized assumes fully CPU-bound walls; raw "
            "assumes no era drift — real code deltas lie between."
        )


if __name__ == "__main__":
    main()
