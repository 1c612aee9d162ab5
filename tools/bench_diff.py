#!/usr/bin/env python
"""Era-normalized bench diff (r10, VERDICT r9 item 6; signal classes r13).

Same-code full-catalog walls drift 108-136s across eras of this VM, so a
raw per-query diff between two bench files mostly measures the box, not
the code. bench.py stamps each run with an ``era`` block — a fixed
calibration micro-job (range → xxhash64 → sum, min-of-5, in ms) timed
before/mid/after the sweep, plus loadavg. This tool diffs two bench
JSONs slug-matched and, when both carry the marker, scales the older
run's per-query times by the calibration ratio so the printed deltas are
code deltas, not era deltas.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N] [--wall]

Accepts bench.py sidecars (BENCH_LOCAL_FULL*.json) and driver BENCH_r*.json
files (whose JSON line may be wrapped in a "tail" blob).

Two per-query signals, chosen PER SLUG (VERDICT r12 item 2):

* ``cpu`` — ``queries_cpu`` (self+JVM CPU seconds). Load-insensitive, so
  no era normalization is needed and the delta is a code delta by
  construction. Used for every slug whose hot path runs in the JVM.
* ``wall`` — era-normalized wall seconds. Used for the Arrow-batched
  pandas-kernel slugs (``PANDAS_KERNEL_SLUGS``): their compute runs in
  python WORKER processes, which the monotonic self+JVM CPU counter
  deliberately excludes (see logging_utils.engine_cpu_ms — the full
  process-tree walk produced negative deltas under worker-daemon
  churn), so a CPU diff on these slugs is blind to kernel regressions
  (observed cpu/wall as low as 0.27 on mojibake_deep).

``--wall`` forces the legacy wall-time diff for every slug.

CPU is only trusted when BOTH sidecars stamp the same ``cpu_metric``
variant (ADVICE r12: early-r12 sidecars measured process-tree CPU, the
current ones self+JVM own-time; diffing across variants silently
compares incompatible scopes). Absent or mismatched stamps fall back to
wall for all slugs, with a warning.
"""

from __future__ import annotations

import json
import re
import sys

# Slugs whose hot path is an Arrow-batched python-worker kernel
# (mapInPandas / applyInPandas(WithState) / pandas_udf over binary or
# text payloads). For these the self+JVM CPU signal under-reports the
# actual compute — wall-with-era is the primary delta. Pinned by
# tests/test_gate.py: every slug must resolve in workload.KEY_BY_SLUG.
# Multi-job publish-machinery slugs whose per-run CPU carries real
# run-to-run variance even on a quiet box (shm publish fsyncs,
# change-feed compaction, GC timing). Measured floor (SCALING.md
# "CPU-noise floor for multi-job entries", r13): min-of-3 sidecar CPU
# values move up to ~0.3 s between identical same-code sessions —
# deltas inside ±0.5 s on these rows are box noise, not code deltas.
MULTI_JOB_CPU_NOISE = {
    "incremental_agg": 0.5,
    "pmi_pairs": 0.5,
}

PANDAS_KERNEL_SLUGS = frozenset({
    "mojibake_deep",       # text.py chardet-style deep scan kernel
    "pack_nosplit",        # sampling.py applyInPandas bin packing
    "batch_score",         # inference.py mapInPandas forward pass
    "byte_features",       # inference.py byte-histogram kernel
    "multimodal_decode",   # multimodal.py image decode kernel
    "multimodal_resize",   # multimodal.py resize kernel
    "netpbm_real",         # multimodal.py real PPM/PGM decoder
    "audio_fp_dedup",      # multimodal.py audio fingerprint kernel
    "image_phash_dedup",   # multimodal.py dHash/pHash kernel
    "sessionize_tws",      # stateful.py applyInPandasWithState
})


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


def cpu_compatible(old: dict, new: dict) -> tuple[bool, str]:
    """Whether the two sidecars' CPU maps may be diffed against each
    other (ADVICE r12). Returns (ok, reason)."""
    if not (old.get("queries_cpu") and new.get("queries_cpu")):
        return False, "queries_cpu absent on one side"
    vo, vn = old.get("cpu_metric"), new.get("cpu_metric")
    if vo is None or vn is None:
        return False, (
            "cpu_metric stamp absent "
            f"(old={vo!r}, new={vn!r}) - scopes unverifiable"
        )
    if vo != vn:
        return False, f"cpu_metric variants differ ({vo!r} vs {vn!r})"
    return True, f"cpu_metric={vo}"


def signal_for_slug(s: str, cpu_ok: bool, force_wall: bool) -> str:
    """'cpu' or 'wall' — the primary delta signal for one slug."""
    if force_wall or not cpu_ok:
        return "wall"
    return "wall" if s in PANDAS_KERNEL_SLUGS else "cpu"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else int(args.pop())
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = load_bench(args[0]), load_bench(args[1])
    force_wall = "--wall" in sys.argv
    cpu_ok, cpu_reason = cpu_compatible(old, new)
    if not force_wall and not cpu_ok:
        print(f"warning: CPU diff unavailable ({cpu_reason}); "
              f"falling back to wall time for all slugs")

    co, cn = cal_ms(old), cal_ms(new)
    scale = (cn / co) if (co and cn) else 1.0
    era_note = (
        f"era scale {scale:.3f} (cal {co:.0f}ms -> {cn:.0f}ms)"
        if (co and cn)
        else "NO era marker on both sides - raw wall (era noise included)"
    )
    ow = {slug(k): v for k, v in old["queries"].items()}
    nw = {slug(k): v for k, v in new["queries"].items()}
    oc = {slug(k): v for k, v in (old.get("queries_cpu") or {}).items()}
    nc = {slug(k): v for k, v in (new.get("queries_cpu") or {}).items()}

    common = sorted(set(ow) & set(nw))
    rows = []
    n_cpu = n_wall = 0
    for s in common:
        sig = signal_for_slug(s, cpu_ok, force_wall)
        if sig == "cpu" and s in oc and s in nc:
            rows.append((s, "cpu", oc[s], nc[s], nc[s] - oc[s]))
            n_cpu += 1
        else:
            rows.append(
                (s, "wall", ow[s] * scale, nw[s], nw[s] - ow[s] * scale)
            )
            n_wall += 1
    rows.sort(key=lambda r: r[4])
    if cpu_ok and not force_wall:
        print(
            f"signal classes: cpu ({n_cpu} JVM-bound slugs, "
            f"{cpu_reason}, load-insensitive) | wall ({n_wall} "
            f"pandas-kernel slugs, {era_note})"
        )
    else:
        print(f"wall diff for all {len(rows)} slugs | {era_note}")
    print(
        f"{len(common)} shared slugs | only-old: {len(set(ow) - set(nw))} "
        f"| only-new: {len(set(nw) - set(ow))}"
    )
    print(f"{'slug':<28}{'sig':>5}{'old*':>10}{'new':>8}{'delta':>8}")
    shown = rows[:top] + (
        [("...", "", 0, 0, 0)] if len(rows) > 2 * top else []
    )
    shown += rows[-top:] if len(rows) > top else []
    for s, sig, os_, ns_, d in shown:
        if s == "...":
            print("  ...")
            continue
        band = ""
        noise = MULTI_JOB_CPU_NOISE.get(s)
        if sig == "cpu" and noise is not None:
            band = (
                f"  ±{noise:g}"
                + (" (within noise)" if abs(d) <= noise else "")
            )
        print(f"{s:<28}{sig:>5}{os_:>10.3f}{ns_:>8.3f}{d:>+8.3f}{band}")
    for cls in ("cpu", "wall"):
        cls_rows = [r for r in rows if r[1] == cls]
        if not cls_rows:
            continue
        tot_o = sum(r[2] for r in cls_rows)
        tot_n = sum(r[3] for r in cls_rows)
        print(
            f"{cls} total ({len(cls_rows)} slugs): {tot_o:.1f}s -> "
            f"{tot_n:.1f}s: {tot_n - tot_o:+.1f}s"
        )
    wall_rows = [r for r in rows if r[1] == "wall"]
    if wall_rows and scale != 1.0:
        raw_o = sum(ow[r[0]] for r in wall_rows)
        tot_n = sum(r[3] for r in wall_rows)
        # the calibration job is pure CPU/codegen; query walls include
        # fixed-latency components (streaming triggers, Python worker
        # startup, commit fsyncs) that do NOT scale with CPU era. The
        # truth is bracketed: RAW assumes zero era drift, NORMALIZED
        # assumes every second is CPU-era-scaled.
        print(
            f"wall total RAW (no era scaling): {raw_o:.1f}s -> "
            f"{tot_n:.1f}s: {tot_n - raw_o:+.1f}s — real wall deltas "
            f"lie between raw and normalized."
        )


if __name__ == "__main__":
    main()
