#!/usr/bin/env python
"""Mechanically realize the stalest-first driver window (VERDICT r10
item 3).

The external driver verifies the first 50 catalog keys in sorted order,
so window membership is decided purely by key naming (a-prefix sorts
before q-prefix; the pinned flagship ``q01_star_revenue`` is the
smallest q-key). This tool renames ``QUERIES`` keys in
``xml_to_parquet_spark/workload.py`` so the live window equals
``rotation_report.desired_window`` — the flagship + the 49 stalest
entries. Identity across renames is the SLUG (everything after the
first underscore), which every rename preserves; bench.py and the
plan-audit tools resolve entries by slug, so workload.py is the only
file a rotation touches.

Naming rules enforced here (and relied on by the window arithmetic):

* in-window keys get ``a`` + a FRESH number above every a-number ever
  used (live catalog + all CORRECTNESS files + the committed
  a_high_water) — any a-key sorts before any q-key regardless of digit
  count, so membership only needs "is an a-key", never the number;
* out-of-window keys get ``q`` + a fresh number above every q-number
  ever used (every such key sorts after ``q01_...`` because ``q0`` <
  ``q1``.. holds positionally and q01 is the minimal q-key);
* keys already on the correct side keep their exact name (minimal diff).

Fresh-on-both-sides is the ADVICE-r11 rule: a freed number (a- OR q-)
reassigned to a different slug corrupts number-based lookups in the
historical CHANGES/CORRECTNESS paper trail. Historical files therefore
resolve identity by SLUG, never by number; the high-water marks in
rotation_names.json make number freshness durable even for names that
never reached a CORRECTNESS file.

Usage::

    python tools/rotate_window.py            # rewrite workload.py
    python tools/rotate_window.py --dry-run  # print the rename plan
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import rotation_report as rr  # noqa: E402

WORKLOAD = os.path.join(rr.REPO, "xml_to_parquet_spark/workload.py")
HWM_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "rotation_names.json"
)


def plan_renames() -> list[tuple[str, str]]:
    rows = rr.build_rows()
    want = rr.desired_window(rows)
    keys = [r["entry"] for r in rows]
    stay_a = {k for k in keys if k in want and k.startswith("a")}
    stay_q = {
        k for k in keys if k not in want and k.startswith("q")
    } | {rr.PINNED}
    # Both sides get numbers above EVERY number of that prefix ever
    # used, not just the live ones: entries retired together age
    # together and are promoted together ~3 rounds later, which would
    # free their numbers for that same round's counterparts — a freed
    # number reassigned to a different slug corrupts the
    # CHANGES/CORRECTNESS paper trail (ADVICE r11: the a27<->q143 swap
    # did exactly this on the a-side, which the old code left
    # unguarded). Numbers that never reach a CORRECTNESS file are made
    # durable by the committed high-water marks (rotation_names.json);
    # the CORRECTNESS scan stays as defense-in-depth. Live catalog keys
    # on both sides (stay_a/stay_q AND the keys about to be renamed
    # away) are counted too, so a freshly-freed number can never be
    # reissued within the same plan.
    import glob
    import json

    used_a_nums = {
        int(k[1:].split("_")[0]) for k in keys if k.startswith("a")
    }
    used_q_nums = {
        int(k[1:].split("_")[0]) for k in keys if k.startswith("q")
    }
    for f in glob.glob(os.path.join(rr.REPO, "CORRECTNESS_r*.json")):
        for k in json.load(open(f)):
            num = k[1:].split("_")[0]
            if num.isdigit():
                (used_a_nums if k.startswith("a") else used_q_nums).add(
                    int(num)
                )
    if os.path.exists(HWM_FILE):
        hwm = json.load(open(HWM_FILE))
        used_q_nums.add(hwm.get("q_high_water", 0))
        used_a_nums.add(hwm.get("a_high_water", 0))
    renames: list[tuple[str, str]] = []
    for k in sorted(keys):
        if k == rr.PINNED:
            continue
        slug = k.split("_", 1)[1]
        if k in want and k.startswith("q"):
            n = max(used_a_nums, default=1) + 1
            used_a_nums.add(n)
            renames.append((k, f"a{n:02d}_{slug}"))
        elif k not in want and k.startswith("a"):
            n = max(used_q_nums, default=1) + 1
            used_q_nums.add(n)
            renames.append((k, f"q{n:03d}_{slug}"))
    return renames


def apply(renames: list[tuple[str, str]]) -> None:
    import json

    src = open(WORKLOAD).read()
    for old, new in renames:
        pat = f'"{old}": QuerySpec('
        if src.count(pat) != 1:
            raise SystemExit(
                f"expected exactly one QuerySpec key {old!r}, "
                f"found {src.count(pat)}"
            )
        src = src.replace(pat, f'"{new}": QuerySpec(')
    open(WORKLOAD, "w").write(src)
    prev = {}
    if os.path.exists(HWM_FILE):
        prev = json.load(open(HWM_FILE))
    marks = {
        "q_high_water": prev.get("q_high_water", 0),
        "a_high_water": prev.get("a_high_water", 0),
    }
    for _, new in renames:
        side = "a_high_water" if new.startswith("a") else "q_high_water"
        marks[side] = max(marks[side], int(new[1:].split("_")[0]))
    with open(HWM_FILE, "w") as fh:
        json.dump(marks, fh)
    regen_coverage_appendix()


APPENDIX_HEADER = "## Appendix: slug -> current key"


def regen_coverage_appendix() -> None:
    """COVERAGE.md's tables keep the key names from the round each row
    was written; this appendix is the live resolver. Regenerated on
    every rotation so it can't go stale (catalog_keys() re-reads
    workload.py from disk on every call, so the just-applied renames
    are picked up without any reload)."""
    keys = rr.catalog_keys()
    window = set(keys[:rr.WINDOW])
    cov_path = os.path.join(rr.REPO, "COVERAGE.md")
    if not os.path.exists(cov_path):
        return
    body = open(cov_path).read()
    cut = body.find(APPENDIX_HEADER)
    if cut != -1:
        body = body[:cut].rstrip() + "\n"
    lines = [
        "",
        f"{APPENDIX_HEADER} (generated by tools/rotate_window.py)",
        "",
        "| slug | current key | in driver window |",
        "|---|---|---|",
    ]
    for k in sorted(keys, key=lambda k: k.split("_", 1)[1]):
        s = k.split("_", 1)[1]
        lines.append(
            f"| {s} | {k} | {'yes' if k in window else ''} |"
        )
    open(cov_path, "w").write(body + "\n".join(lines) + "\n")


def main() -> int:
    if "--regen-appendix" in sys.argv:
        regen_coverage_appendix()
        print("COVERAGE.md slug appendix regenerated")
        return 0
    renames = plan_renames()
    if not renames:
        print("window already matches the stalest-first policy")
        return 0
    for old, new in renames:
        arrow = "PROMOTE" if new.startswith("a") else "retire "
        print(f"  {arrow}  {old:36} -> {new}")
    if "--dry-run" in sys.argv:
        return 0
    apply(renames)
    print(f"rewrote {len(renames)} keys in {WORKLOAD}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
