#!/usr/bin/env python3
"""Diff a driver BENCH_r{N}.json against the canonical baseline table.

Replaces the manual per-round gate-math prose (VERDICT r7 item 4):
reads the per-query seconds from a BENCH_r{N}.json (or a raw bench.py
JSON line) and diffs them row-by-row against BASELINE_TABLE.json — the
machine-readable copy of BASELINE.md's canonical best-of-3 table.

Usage:
    python bench_diff.py                 # latest BENCH_r*.json in cwd
    python bench_diff.py BENCH_r08.json  # a specific driver record
    python bench.py | python bench_diff.py -   # pipe a fresh run

Interpretation (from BASELINE.md): the baseline is best-of-3 full
invocations on a quiet box; a driver record is ONE invocation on a
possibly-loaded box, so uniform 1.0-1.3x per-row ratios are box
variance. Investigate only movers above MOVER_RATIO (default 1.5x,
override with --threshold), per the driver-methodology reference row.

Exit status: 0 when no mover exceeds the threshold, 1 otherwise —
usable as a per-round gate.
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys


def load_bench(path: str) -> tuple[dict[str, float], float, str, dict]:
    """Return (per-query secs, total, label, full record) from a bench
    record. Accepts the driver's BENCH_r{N}.json wrapper (``parsed``
    key), a raw bench.py JSON line, or '-' for stdin (last
    JSON-looking line)."""
    if path == "-":
        lines = [ln for ln in sys.stdin.read().splitlines() if ln.lstrip().startswith("{")]
        if not lines:
            raise SystemExit("bench_diff: no JSON line on stdin")
        rec = json.loads(lines[-1])
        label = "<stdin>"
    else:
        with open(path) as f:
            rec = json.load(f)
        label = path
    if "parsed" in rec:  # driver wrapper
        rec = rec["parsed"]
    return dict(rec["queries"]), float(rec["value"]), label, rec


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("bench", nargs="?", default=None,
                    help="BENCH_r{N}.json, raw bench.py output, or '-' (default: latest BENCH_r*.json)")
    ap.add_argument("--baseline", default="BASELINE_TABLE.json")
    ap.add_argument("--threshold", type=float, default=1.5,
                    help="per-row mover ratio to flag (default 1.5)")
    args = ap.parse_args(argv)

    path = args.bench
    if path is None:
        cands = sorted(glob.glob("BENCH_r*.json"),
                       key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
        if not cands:
            raise SystemExit("bench_diff: no BENCH_r*.json found and no path given")
        path = cands[-1]

    bench, total, label, bench_rec = load_bench(path)
    with open(args.baseline) as f:
        base = json.load(f)
    base_q: dict[str, float] = base["queries"]

    common = [q for q in base_q if q in bench]
    new_rows = [q for q in bench if q not in base_q]
    gone_rows = [q for q in base_q if q not in bench]

    sub_bench = sum(bench[q] for q in common)
    sub_base = sum(base_q[q] for q in common)

    print(f"bench_diff: {label} vs {args.baseline} "
          f"({len(common)} common rows, threshold {args.threshold}x)")
    canary = bench_rec.get("canary_sec")
    if canary is not None:
        par = bench_rec.get("parallel_canary_sec")
        par_s = f", {par}s 32-proc parallel" if par is not None else ""
        print(f"  box canaries: {canary}s single-thread CPU{par_s} "
              f"(healthy ~1.2-1.4s each; elevated => host contention, "
              f"discount movers; see BASELINE.md)")
    print(f"  total(bench)={total:.2f}s  comparable subtotal: "
          f"{sub_bench:.2f}s vs baseline {sub_base:.2f}s  "
          f"ratio {sub_bench / sub_base:.2f}x "
          f"(band: single-run totals <= {base.get('single_invocation_band_max', 37.0)}s are box variance)")
    if new_rows:
        print(f"  rows NOT in baseline (record them in BASELINE.md/BASELINE_TABLE.json): "
              + ", ".join(f"{q}={bench[q]:.3f}s" for q in sorted(new_rows)))
    if gone_rows:
        print(f"  baseline rows MISSING from bench: " + ", ".join(sorted(gone_rows)))

    movers = sorted(((bench[q] / base_q[q], q) for q in common if base_q[q] > 0),
                    reverse=True)
    flagged = [(r, q) for r, q in movers if r >= args.threshold]
    if flagged:
        print(f"  MOVERS >= {args.threshold}x:")
        for r, q in flagged:
            print(f"    {q}: {bench[q]:.3f}s vs {base_q[q]:.3f}s = {r:.2f}x")
    else:
        r, q = movers[0]
        print(f"  movers >= {args.threshold}x: none "
              f"(largest: {q} {bench[q]:.3f}s vs {base_q[q]:.3f}s = {r:.2f}x)")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
