#!/usr/bin/env python3
"""Wall-ratio table between two graft Bench JSONs (e.g. sf1 vs sf0.1).

Usage:
    python3 tools/bench_ratio.py <bench_big.json> <bench_small.json> \
        [--flag RATIO]

Prints every query's wall at both scales and the ratio big/small,
sorted descending, flagging ratios above --flag (default 3.0) — the
SCALE.md adjudication input: on a 10x data step, a ratio well above
~10x means the plan is superlinear and needs a mechanism writeup.
Queries present in only one file are listed separately (board drift).

--calibrate additionally drift-normalizes the ratios using the fixed
host-speed probe each Bench run embeds ("calibration": cpu_1t_sec /
cpu_mt_sec / shuffle_sec — see graft.Calibrate). The correction factor
is the geometric mean of the three probe ratios big/small: a CROSS-
ROUND comparison on a drifted host (r14 forensics: 1.6-2.3x uniform
slowdown on unchanged code) then reads ~1.0x for unchanged plans
instead of the raw host ratio. Within-session A/Bs don't need it.
"""
import argparse
import json


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d.get("queries", {}), d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("big")
    ap.add_argument("small")
    ap.add_argument("--flag", type=float, default=3.0)
    ap.add_argument("--calibrate", action="store_true",
                    help="drift-correct using the embedded host probe")
    args = ap.parse_args()
    big, bmeta = load(args.big)
    small, smeta = load(args.small)
    for name, meta in (("big", bmeta), ("small", smeta)):
        if meta.get("contended"):
            print(f"WARNING: {name} bench self-reports contended:true — "
                  "ratios unreliable")
        if meta.get("gate") and meta["gate"].get("enabled") \
                and not meta["gate"].get("passed"):
            print(f"WARNING: {name} bench ran with the quiet-host gate "
                  f"unmet after {meta['gate'].get('attempts')} attempts")
    # board-mismatch guard (ADVICE r15): a filtered board's TOTAL must
    # never be read against a full board's — the skip/only sets now land
    # in the JSON, so diverging boards warn loudly here
    bskip = set(bmeta.get("skipped") or [])
    sskip = set(smeta.get("skipped") or [])
    if bskip != sskip:
        print(f"WARNING: boards differ — skipped(big)={sorted(bskip)} vs "
              f"skipped(small)={sorted(sskip)}; compare per-query ratios "
              "and the shared-total line only, never the headline totals")
    for name, meta in (("big", bmeta), ("small", smeta)):
        if meta.get("only"):
            print(f"NOTE: {name} is a SPARK_GRAFT_ONLY family run "
                  f"({len(meta['only'])} queries)")
    drift = 1.0
    if args.calibrate:
        cb, cs = bmeta.get("calibration"), smeta.get("calibration")
        if not cb or not cs:
            print("WARNING: --calibrate requested but a file has no "
                  "calibration field (pre-r15 bench) — using drift=1.0")
        else:
            axes = ("cpu_1t_sec", "cpu_mt_sec", "shuffle_sec")
            ratios = [cb[a] / cs[a] for a in axes if cs.get(a)]
            drift = 1.0
            for r in ratios:
                drift *= r
            drift **= 1.0 / len(ratios)
            per_axis = ", ".join(f"{a}={cb[a] / cs[a]:.2f}" for a in axes)
            print(f"calibration drift big/small: {drift:.3f} ({per_axis}) — "
                  "big walls divided by this below")
        big = {q: v / drift for q, v in big.items()}
    shared = sorted(set(big) & set(small),
                    key=lambda q: big[q] / max(small[q], 1e-9), reverse=True)
    flagged = 0
    print(f"{'query':42s} {'big_s':>9s} {'small_s':>9s} {'ratio':>7s}")
    for q in shared:
        r = big[q] / max(small[q], 1e-9)
        mark = " <<<" if r > args.flag else ""
        if mark:
            flagged += 1
        print(f"{q:42s} {big[q]:9.2f} {small[q]:9.2f} {r:7.2f}{mark}")
    only_big = sorted(set(big) - set(small))
    only_small = sorted(set(small) - set(big))
    if only_big:
        print(f"only in {args.big}: {', '.join(only_big)}")
    if only_small:
        print(f"only in {args.small}: {', '.join(only_small)}")
    tb, ts = sum(big[q] for q in shared), sum(small[q] for q in shared)
    print(f"shared {len(shared)} queries: total {tb:.1f}s vs {ts:.1f}s "
          f"(x{tb / ts:.2f}); {flagged} above x{args.flag}")


if __name__ == "__main__":
    main()
