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


# Scalar keys bench.py emits alongside the queries dict. The mid-dict
# recovery fallback must never scavenge these as "queries" (a tail that
# starts AFTER the queries dict's closing brace contains only them).
NON_QUERY_KEYS = frozenset({
    "metric", "value", "unit", "sf", "cpus", "box_degraded",
    "canary_pre_sec", "parallel_canary_pre_sec",
    "canary_sec", "parallel_canary_sec",
})


def recover_from_tail(tail: str) -> dict:
    """Reconstruct a bench record from the driver wrapper's truncated
    ``tail`` string.

    A driver wrapper carries ``"parsed": null`` whenever the bench JSON
    line outgrew the driver's 2000-char ``tail`` keep (the real r05/
    r12/r13 artifacts; earlier, shorter records parsed fine — and the
    crashed r02's tail is a traceback, rejected upstream). The tail's
    HEAD is what's cut — the ``"queries": {...}`` span and the trailing
    scalars (canaries, box_degraded, sf, cpus) survive, so the record
    is recoverable: per-query secs from the queries span (or, if the
    cut landed inside it, the surviving suffix of entries), scalars by
    per-key regex, and the total as sum(queries) only when ``"value"``
    sat in the destroyed head (pre-r14 key order; VERDICT r13 item
    2)."""
    rec: dict = {}
    # Regions the record-level scalars are searched in. A headline
    # query literally named "value"/"cpus"/etc. would be misread as a
    # record scalar if the search saw INSIDE the queries span (ADVICE
    # r14) — so once the span is located, scalars are searched after
    # it first (r14+ key order), then before it (pre-r14 key order put
    # metric/value at the head, which a mild truncation can leave
    # intact), and never inside it.
    scalar_regions = [tail]
    m = re.search(r'"queries":\s*(\{[^{}]*\})', tail)
    if m:
        rec["queries"] = json.loads(m.group(1))
        scalar_regions = [tail[m.end():], tail[:m.start()]]
    else:
        # Truncation landed INSIDE the queries dict: the tail opens
        # mid-entry. Parse the surviving complete entries up to the
        # dict's closing brace (flat string->number pairs only),
        # dropping record-level scalar keys — their presence means the
        # first '}' was NOT the queries dict's close (the whole span
        # was destroyed) and nothing query-shaped actually survived.
        end = tail.find("}")
        if end != -1:
            entries = {
                k: float(v)
                for k, v in re.findall(
                    r'"([^"]+)":\s*(-?\d+(?:\.\d+)?)', tail[:end]
                )
            }
            scavenged = set(entries) & NON_QUERY_KEYS
            if entries and not scavenged:
                rec["queries"] = entries
                scalar_regions = [tail[end:]]
    for key, cast in (
        ("metric", str), ("unit", str),
        ("value", float), ("sf", float), ("cpus", int),
        ("canary_pre_sec", float), ("parallel_canary_pre_sec", float),
        ("canary_sec", float), ("parallel_canary_sec", float),
    ):
        pat = (r'"%s":\s*"([^"]*)"' if cast is str
               else r'"%s":\s*(-?\d+(?:\.\d+)?)') % re.escape(key)
        for region in scalar_regions:
            km = re.search(pat, region)
            if km:
                rec[key] = cast(km.group(1))
                break
    for region in scalar_regions:
        bm = re.search(r'"box_degraded":\s*(true|false)', region)
        if bm:
            rec["box_degraded"] = bm.group(1) == "true"
            break
    return rec


def load_bench(path: str) -> tuple[dict[str, float], float, str, dict]:
    """Return (per-query secs, total, label, full record) from a bench
    record. Accepts the driver's BENCH_r{N}.json wrapper (``parsed``
    key — recovered from the truncated ``tail`` when parsed is null,
    which happens whenever the bench line outgrows the driver's
    2000-char keep), a raw bench.py JSON line, or '-' for stdin (last
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
        parsed = rec["parsed"]
        if parsed is None:
            rc = rec.get("rc")
            if rc not in (0, None):
                # a crashed run's tail is a traceback, not a truncated
                # record — never scavenge numbers out of one (the r2
                # artifact is exactly this shape)
                raise SystemExit(
                    f"bench_diff: {label} is a FAILED bench run "
                    f"(rc={rc}); its tail is a traceback, nothing to "
                    f"diff")
            parsed = recover_from_tail(rec.get("tail") or "")
            if "queries" not in parsed or not parsed["queries"]:
                raise SystemExit(
                    f"bench_diff: {label} has parsed=null and no "
                    f"recoverable queries dict in its tail")
            label += " (recovered from truncated tail)"
        rec = parsed
    queries = {k: float(v) for k, v in rec["queries"].items()}
    if rec.get("value") is not None:
        total = float(rec["value"])
    else:
        # "value" sat in the truncation-destroyed head of older bench.py
        # output (key order fixed in r14): the per-row sum IS the total.
        total = round(sum(queries.values()), 3)
    return queries, total, label, rec


def canary_scale(rec: dict) -> float:
    """Degraded-box adjustment factor for the mover band (>= 1.0).

    Healthy reference (BASELINE.md): the single-thread canary reads
    ~1.2-1.4 s and the 32-proc parallel canary reads ABOUT THE SAME —
    on a box with 32 real cores the parallel burns don't queue.  When
    the parallel canary exceeds CANARY_DEGRADED_RATIO x the single
    reading, the container is getting fewer effective cores than
    advertised (late r8 measured 2.29 s vs 1.3 s => ~18/32 cores) and
    every multi-core Spark stage inflates by roughly that same factor
    — so the mover threshold is widened multiplicatively by
    parallel/single, capped at CANARY_SCALE_CAP so a catatonic box
    can't waive the gate entirely.  A bench record with elevated
    canaries thereby self-adjudicates numerically (VERDICT r8 item 6)
    instead of needing prose in BASELINE.md.
    """
    ratio = 0.0
    for single_key, par_key in (
        ("canary_pre_sec", "parallel_canary_pre_sec"),  # before the run
        ("canary_sec", "parallel_canary_sec"),  # after (original keys)
    ):
        single = rec.get(single_key)
        par = rec.get(par_key)
        if single and par and single > 0 and par > PARALLEL_HEALTHY_MAX_SEC:
            # Both conditions: the ratio says the cores queued AND the
            # parallel canary's ABSOLUTE reading is itself slow.  A
            # fast single canary (r11 measured 0.755 s on the round's
            # quietest box) can push the ratio past the threshold while
            # the parallel read sits inside the healthy band — that box
            # delivers its cores, and widening the band there would
            # mask real movers, the opposite failure.
            ratio = max(ratio, par / single)  # worse pair wins
    if ratio <= CANARY_DEGRADED_RATIO:
        return 1.0
    return min(ratio, CANARY_SCALE_CAP)


# Parallel/single canary ratio above which the box counts as degraded
# (healthy ratio ~1.0; late-r8's half-cores episode measured ~1.8).
CANARY_DEGRADED_RATIO = 1.6
# A parallel canary at or under this absolute reading is healthy no
# matter what the ratio says (healthy band ~1.2-1.4 s; late-r8's
# degraded episode measured 2.29-2.49 s).
PARALLEL_HEALTHY_MAX_SEC = 1.7
# Never widen the mover band by more than this factor.
CANARY_SCALE_CAP = 2.0
# A contended-baseline row gates anyway when the current box is healthy
# and its ratio reaches this multiple of the effective threshold
# (1.5x band * 2.0 = 3.0x — far beyond denominator noise).
CONTENDED_ESCALATE_FACTOR = 2.0


def box_degraded(rec: dict) -> bool:
    """True when either canary pair in a bench record trips the
    degraded-box rule (parallel reading above PARALLEL_HEALTHY_MAX_SEC
    AND parallel/single above CANARY_DEGRADED_RATIO). bench.py embeds
    this verdict as ``box_degraded`` in its own JSON line so a
    BENCH_r{N}.json is self-describing for gate math (VERDICT r12
    item 8); bench_diff recomputes it from the canaries and flags any
    disagreement (a record produced by an older bench.py simply lacks
    the key)."""
    return canary_scale(rec) > 1.0


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

    if not common:
        raise SystemExit(
            f"bench_diff: ZERO common rows between {label} and "
            f"{args.baseline} — wrong file, or a renamed headline set; "
            f"bench has {len(bench)} rows, baseline {len(base_q)}")

    zero_base = sorted(q for q in common if base_q[q] <= 0)
    if zero_base:
        print(f"  WARNING: baseline rows with 0.0s (excluded from mover "
              f"math — fix BASELINE_TABLE.json): " + ", ".join(zero_base))

    # Zero-baseline rows are excluded from BOTH subtotal sums, matching
    # the mover-math exclusion and the warning text above — otherwise
    # the bench side contributes full time against a 0s baseline and
    # silently inflates the printed closing ratio.
    comparable = [q for q in common if base_q[q] > 0]
    sub_bench = sum(bench[q] for q in comparable)
    sub_base = sum(base_q[q] for q in comparable)
    if sub_base <= 0:
        raise SystemExit(
            f"bench_diff: comparable-subtotal baseline is 0s across "
            f"{len(common)} common rows — {args.baseline} is broken")

    scale = canary_scale(bench_rec)
    eff_threshold = round(args.threshold * scale, 3)

    print(f"bench_diff: {label} vs {args.baseline} "
          f"({len(common)} common rows, threshold {args.threshold}x"
          + (f" -> {eff_threshold}x canary-adjusted" if scale > 1.0 else "")
          + ")")
    canary = bench_rec.get("canary_sec")
    if canary is not None:
        par = bench_rec.get("parallel_canary_sec")
        par_s = f", {par}s 32-proc parallel" if par is not None else ""
        pre = bench_rec.get("canary_pre_sec")
        pre_par = bench_rec.get("parallel_canary_pre_sec")
        pre_s = (f"; pre-run {pre}s/{pre_par}s"
                 if pre is not None and pre_par is not None else "")
        print(f"  box canaries: {canary}s single-thread CPU{par_s}{pre_s} "
              f"(healthy ~1.2-1.4s each; elevated => host contention, "
              f"discount movers; see BASELINE.md)")
        if scale > 1.0:
            ratios = [
                bench_rec[p] / bench_rec[s]
                for s, p in (("canary_pre_sec", "parallel_canary_pre_sec"),
                             ("canary_sec", "parallel_canary_sec"))
                if bench_rec.get(s) and bench_rec.get(p)
                and bench_rec[p] > PARALLEL_HEALTHY_MAX_SEC
            ]
            print(f"  box DEGRADED: worst parallel/single pair = "
                  f"{max(ratios):.2f}x > "
                  f"{CANARY_DEGRADED_RATIO}x — mover band widened "
                  f"{scale:.2f}x to {eff_threshold}x")
    # self-describing record check: bench.py embeds its own verdict.
    # Deliberately OUTSIDE the canary-presence block — a record that
    # claims box_degraded while lacking canary readings is exactly the
    # mismatched-versions condition this warning exists for.
    rec_flag = bench_rec.get("box_degraded")
    if rec_flag is not None and rec_flag != box_degraded(bench_rec):
        print(f"  WARNING: record says box_degraded={rec_flag} but "
              f"canary math says {box_degraded(bench_rec)} — "
              f"mismatched bench.py/bench_diff.py versions?")
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
    # Rows whose baseline denominator was recorded under box contention
    # (BASELINE_TABLE.json "contended_rows": optimistic best-of-few on a
    # degraded box — VERDICT r12 minor watch item): a high ratio there
    # is as likely a small denominator as a real regression, so they
    # print as advisory and never fail the gate. Re-record on a
    # healthy-canary box to clear the annotation.
    contended = set(base.get("contended_rows", []))
    # A contended-baseline row escalates back to gating when the
    # CURRENT record's box is MEASURED healthy AND the ratio is extreme
    # (>= CONTENDED_ESCALATE_FACTOR x the effective band): a small
    # contended denominator explains ~1.5-2x readings, but a healthy
    # box reading >= 3x is a real regression no denominator noise can
    # produce — without this, contended rows never gate at any ratio
    # until someone re-records the baseline (ADVICE r13). "Measured"
    # is load-bearing: a record with NO canary probes also yields
    # scale 1.0, but unknown box health must not escalate — that is
    # exactly the ambiguity the contended annotation exists to absorb.
    has_canaries = any(
        bench_rec.get(s) and bench_rec.get(p)
        for s, p in (("canary_pre_sec", "parallel_canary_pre_sec"),
                     ("canary_sec", "parallel_canary_sec"))
    )
    escalate = scale == 1.0 and has_canaries
    esc_threshold = round(CONTENDED_ESCALATE_FACTOR * eff_threshold, 3)
    flagged = [(r, q) for r, q in movers
               if r >= eff_threshold and q not in contended]
    escalated = [(r, q) for r, q in movers
                 if escalate and r >= esc_threshold and q in contended]
    advisory = [(r, q) for r, q in movers
                if r >= eff_threshold and q in contended
                and (r, q) not in escalated]
    if escalated:
        print(f"  ESCALATED movers on contended-baseline rows (healthy "
              f"box, ratio >= {esc_threshold}x — gating; re-record the "
              f"denominator or fix the regression):")
        for r, q in escalated:
            print(f"    {q}: {bench[q]:.3f}s vs {base_q[q]:.3f}s = {r:.2f}x")
    if advisory:
        print(f"  advisory movers on CONTENDED-baseline rows (not gating "
              f"below {esc_threshold}x-on-healthy-box; re-record the "
              f"denominator):")
        for r, q in advisory:
            print(f"    {q}: {bench[q]:.3f}s vs {base_q[q]:.3f}s = {r:.2f}x")
    if flagged:
        print(f"  MOVERS >= {eff_threshold}x:")
        for r, q in flagged:
            print(f"    {q}: {bench[q]:.3f}s vs {base_q[q]:.3f}s = {r:.2f}x")
    elif movers:
        # "largest" from gate-eligible (non-contended) rows only —
        # otherwise an advisory row above the threshold would be named
        # in the same breath as "none", a self-contradictory summary
        clean = [(r, q) for r, q in movers if q not in contended]
        if clean:
            r, q = clean[0]
            print(f"  movers >= {eff_threshold}x: none "
                  f"(largest: {q} {bench[q]:.3f}s vs {base_q[q]:.3f}s "
                  f"= {r:.2f}x)")
        else:
            print(f"  movers >= {eff_threshold}x: none "
                  f"(largest gate-eligible row: n/a — every comparable "
                  f"row is contended-advisory)")
    else:
        print(f"  movers >= {eff_threshold}x: no comparable rows with a "
              f"nonzero baseline — see WARNING above")
    return 1 if (flagged or escalated) else 0


if __name__ == "__main__":
    sys.exit(main())
