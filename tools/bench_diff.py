#!/usr/bin/env python3
"""Cross-round bench regression guard (r6 VERDICT item 4).

Compares two bench artifacts and names the real movers, separating them
from host noise. Accepts either artifact shape:

  - a driver capture  BENCH_r{N}.json  ({"parsed": {stdout line}}), 1dp
    minima, full or short query keys;
  - the repo sidecar  bench_out.json   (2dp minima + "queries_median").

Usage:
  python3 tools/bench_diff.py OLD.json NEW.json [-o REGRESSIONS.md]
                              [--band 0.40] [--floor 0.15]

Noise model: a query is a regression when

  new > old * (1 + band) + spread_old + spread_new + floor

where `band` defaults to this host's observed ±40% run variance,
`spread` is the per-query (median - min) gap when the artifact carries
medians (0 otherwise — single-sample artifacts get only the global
band), and `floor` absorbs the 1dp rendering granularity plus scheduler
jitter on sub-0.2s queries. Improvements use the mirrored test. The
r5->r6 text-family inflation (0.1 -> 0.77s) clears this bar at the
default settings; a 0.1 -> 0.2s wobble does not.

Applied retroactively to BENCH_r05 vs BENCH_r06 this emits exactly the
movers the r6 judge flagged by hand — see REGRESSIONS.md.
"""
import argparse
import json
import sys


# inverse of Bench.famAbbrev (the late-r7 stdout key rename, extended r8
# with the full seeded map — a missing entry silently shrinks the
# "common" roster by failing to restore that family's keys).
# Auto-assigned chars (digits etc.) can't be known statically; the
# sidecar carries full names, so diff against bench_out.json when a
# driver capture contains unrecognized single-char families.
FAM_EXPAND = {"a": "agg", "d": "dedup", "f": "filter", "m": "multimodal",
              "p": "sample", "s": "sim", "w": "stream", "t": "text",
              "h": "tpch", "i": "tier",
              "z": "sessionize", "e": "delete", "o": "store", "x": "index",
              "g": "ingest", "l": "layout", "b": "approx", "u": "window",
              "n": "moving", "c": "pivot", "k": "ntile", "v": "vec",
              "y": "ts", "r": "range", "j": "join"}


def load(path):
    """Return (minima, medians, total) with full q_* key names, from any
    artifact vintage: sidecar ("queries", full names), r7 driver capture
    ("queries", q_-stripped keys), or late-r7 driver capture ("q",
    family-abbreviated keys)."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    queries = d.get("queries") if isinstance(d.get("queries"), dict) else d.get("q")
    if not isinstance(queries, dict):
        sys.exit(f"{path}: no usable 'queries'/'q' object")

    def full(k):
        if k.startswith("q_"):
            return k
        head, sep, rest = k.partition("_")
        if sep and head in FAM_EXPAND:
            k = FAM_EXPAND[head] + "_" + rest
        return "q_" + k

    mins = {full(k): float(v) for k, v in queries.items()}
    meds = {full(k): float(v) for k, v in d.get("queries_median", {}).items()}
    cal = d.get("cal_median")
    # cal_parts identifies the calibration workload's shape (r11). Older
    # artifacts with cal but no cal_parts are the r10 vintage: hard-coded
    # 32 partitions.
    parts = int(d.get("cal_parts", 32))
    return mins, meds, float(d.get("value", sum(mins.values()))), \
        (float(cal) if cal is not None else None), parts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("-o", "--out", default=None, help="write a markdown report")
    ap.add_argument("--band", type=float, default=0.40,
                    help="relative noise band (default 0.40 = this host)")
    ap.add_argument("--floor", type=float, default=0.15,
                    help="absolute noise floor in seconds")
    args = ap.parse_args()

    old_min, old_med, old_total, old_cal, old_parts = load(args.old)
    new_min, new_med, new_total, new_cal, new_parts = load(args.new)

    # host-speed normalization (r10 VERDICT item): cal_median is a
    # fixed-work pure-CPU sample, so the cross-round ratio is the host
    # noise factor — divide it out of the NEW side (minima, medians AND
    # the headline total) before applying the noise band. Applied ONLY
    # when both artifacts ran the SAME-SHAPED calibration (cal_parts
    # match): across a shape boundary the ratio conflates code vintage
    # with host speed. Artifacts older than r10 carry no calibration;
    # the diff then falls back to the raw ±band model.
    same_shape = old_parts == new_parts
    cal_usable = (old_cal is not None and new_cal is not None
                  and old_cal > 0 and new_cal > 0)
    cal_factor = (new_cal / old_cal) if (cal_usable and same_shape) else 1.0
    if cal_factor != 1.0:
        new_min = {q: v / cal_factor for q, v in new_min.items()}
        new_med = {q: v / cal_factor for q, v in new_med.items()}
        new_total = new_total / cal_factor

    common = sorted(set(old_min) & set(new_min))
    added = sorted(set(new_min) - set(old_min))
    removed = sorted(set(old_min) - set(new_min))

    regressions, improvements = [], []
    for q in common:
        o, n = old_min[q], new_min[q]
        spread = (old_med.get(q, o) - o) + (new_med.get(q, n) - n)
        if n > o * (1 + args.band) + spread + args.floor:
            regressions.append((q, o, n))
        elif o > n * (1 + args.band) + spread + args.floor:
            improvements.append((q, o, n))

    def ratio(t):
        return t[2] / t[1] if t[1] > 0 else float("inf")

    regressions.sort(key=ratio, reverse=True)
    improvements.sort(key=lambda t: ratio(t))

    lines = []
    lines.append(f"# Bench diff: {args.old} -> {args.new}")
    lines.append("")
    common_old = sum(old_min[q] for q in common)
    common_new = sum(new_min[q] for q in common)
    lines.append(f"Totals: {old_total:.2f}s -> {new_total:.2f}s "
                 f"(common {len(common)} queries: "
                 f"{common_old:.2f}s -> {common_new:.2f}s). "
                 f"Noise model: band ±{args.band:.0%}, floor "
                 f"{args.floor}s, plus per-query min-median spread "
                 f"where the artifact carries medians.")
    if cal_factor != 1.0:
        lines.append("")
        lines.append(
            f"Host-speed calibration: cal_median {old_cal:.2f}s -> "
            f"{new_cal:.2f}s; NEW times (and total) divided by "
            f"{cal_factor:.2f} before banding (a uniform shift is the "
            f"host, not the code).")
    elif old_cal is None or new_cal is None:
        lines.append("")
        lines.append("No calibration in one/both artifacts (pre-r10 "
                     "vintage): raw band only.")
    elif not cal_usable:
        lines.append("")
        lines.append(f"Calibration present but unusable (cal_median "
                     f"{old_cal} / {new_cal} — a zero means a truncated "
                     f"calibration run): raw band only.")
    elif not same_shape:
        lines.append("")
        lines.append(f"Calibration NOT applied: workload shapes differ "
                     f"(cal_parts {old_parts} vs {new_parts}) — the "
                     f"ratio would conflate code vintage with host "
                     f"speed. Raw band only.")
    lines.append("")
    if added:
        lines.append(f"Roster +{len(added)}: " + ", ".join(added))
    if removed:
        lines.append(f"Roster -{len(removed)}: " + ", ".join(removed))
    if added or removed:
        lines.append("")

    def table(title, rows):
        lines.append(f"## {title} ({len(rows)})")
        lines.append("")
        if not rows:
            lines.append("none outside the noise band")
        else:
            lines.append("| query | old s | new s | ratio |")
            lines.append("|---|---|---|---|")
            for q, o, n in rows:
                lines.append(f"| {q} | {o:.2f} | {n:.2f} | {n / o:.1f}x |")
        lines.append("")

    table("Regressions", regressions)
    table("Improvements", improvements)

    report = "\n".join(lines)
    if args.out:
        with open(args.out, "w") as f:
            f.write(report + "\n")
    print(report)
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
