"""Unit tests for bench_diff's gate math — the canary-scaled mover
band (VERDICT r8 item 6) and the degenerate-input guards (ADVICE r8).

The scaling rule under test: a bench record whose 32-proc parallel
canary exceeds CANARY_DEGRADED_RATIO x its single-thread canary ran on
a degraded box (fewer effective cores than advertised), so the mover
threshold is widened by parallel/single, capped at CANARY_SCALE_CAP.
"""

from __future__ import annotations

import json

import pytest

import bench_diff


class TestCanaryScale:
    def test_missing_canaries_no_adjustment(self):
        assert bench_diff.canary_scale({}) == 1.0
        assert bench_diff.canary_scale({"canary_sec": 1.3}) == 1.0
        assert bench_diff.canary_scale({"parallel_canary_sec": 2.5}) == 1.0

    def test_healthy_box_no_adjustment(self):
        # parallel ≈ single: all advertised cores are real
        assert bench_diff.canary_scale(
            {"canary_sec": 1.3, "parallel_canary_sec": 1.35}) == 1.0

    def test_boundary_ratio_not_degraded(self):
        # exactly at the threshold ratio is still "healthy"
        rec = {"canary_sec": 1.0,
               "parallel_canary_sec": bench_diff.CANARY_DEGRADED_RATIO}
        assert bench_diff.canary_scale(rec) == 1.0

    def test_degraded_box_scales_by_ratio(self):
        # late-r8 episode shape: 2.49s parallel vs 1.4s single = 1.78x
        rec = {"canary_sec": 1.4, "parallel_canary_sec": 2.49}
        assert bench_diff.canary_scale(rec) == pytest.approx(2.49 / 1.4)

    def test_scale_capped(self):
        # a catatonic box cannot waive the gate entirely
        rec = {"canary_sec": 1.0, "parallel_canary_sec": 50.0}
        assert bench_diff.canary_scale(rec) == bench_diff.CANARY_SCALE_CAP

    def test_zero_single_canary_no_adjustment(self):
        assert bench_diff.canary_scale(
            {"canary_sec": 0, "parallel_canary_sec": 2.0}) == 1.0


def _write(tmp_path, name, obj):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


class TestMainGuards:
    def test_zero_common_rows_exits_with_message(self, tmp_path):
        bench = _write(tmp_path, "bench.json",
                       {"queries": {"qa": 1.0}, "value": 1.0})
        base = _write(tmp_path, "base.json",
                      {"queries": {"qb": 1.0}})
        with pytest.raises(SystemExit, match="ZERO common rows"):
            bench_diff.main([bench, "--baseline", base])

    def test_zero_baseline_row_flagged_not_dropped(self, tmp_path, capsys):
        bench = _write(tmp_path, "bench.json",
                       {"queries": {"qa": 1.0, "qb": 2.0}, "value": 3.0})
        base = _write(tmp_path, "base.json",
                      {"queries": {"qa": 0.0, "qb": 1.9}})
        rc = bench_diff.main([bench, "--baseline", base])
        out = capsys.readouterr().out
        assert "WARNING: baseline rows with 0.0s" in out and "qa" in out
        assert rc == 0  # qb at 1.05x is not a mover
        # the zero-baseline row is excluded from BOTH subtotal sums
        # (ADVICE r9): qa's 1.0s bench time must not inflate the ratio
        # (2.0/1.9 = 1.05x, not 3.0/1.9 = 1.58x)
        assert "2.00s vs baseline 1.90s  ratio 1.05x" in out

    def test_all_zero_baseline_exits(self, tmp_path):
        bench = _write(tmp_path, "bench.json",
                       {"queries": {"qa": 1.0}, "value": 1.0})
        base = _write(tmp_path, "base.json", {"queries": {"qa": 0.0}})
        with pytest.raises(SystemExit, match="baseline is 0s"):
            bench_diff.main([bench, "--baseline", base])

    def test_degraded_canaries_widen_band(self, tmp_path, capsys):
        # 1.8x mover on a 2.0x-degraded box: flagged at the default
        # 1.5x band, waived at the canary-adjusted 3.0x band.
        bench = _write(tmp_path, "bench.json",
                       {"queries": {"qa": 1.8}, "value": 1.8,
                        "canary_sec": 1.2, "parallel_canary_sec": 2.49})
        base = _write(tmp_path, "base.json", {"queries": {"qa": 1.0}})
        rc = bench_diff.main([bench, "--baseline", base])
        out = capsys.readouterr().out
        assert "box DEGRADED" in out and "widened" in out
        assert rc == 0

    def test_healthy_canaries_keep_band(self, tmp_path, capsys):
        bench = _write(tmp_path, "bench.json",
                       {"queries": {"qa": 1.8}, "value": 1.8,
                        "canary_sec": 1.25, "parallel_canary_sec": 1.3})
        base = _write(tmp_path, "base.json", {"queries": {"qa": 1.0}})
        rc = bench_diff.main([bench, "--baseline", base])
        out = capsys.readouterr().out
        assert "MOVERS >= 1.5x" in out
        assert rc == 1

    def test_worse_of_pre_post_canary_pairs_wins(self):
        # pre healthy, post degraded: the post pair must set the scale
        rec = {"canary_pre_sec": 1.3, "parallel_canary_pre_sec": 1.35,
               "canary_sec": 1.3, "parallel_canary_sec": 2.3}
        assert bench_diff.canary_scale(rec) == pytest.approx(2.3 / 1.3)
        # degraded pre, healthy post: pre pair still wins
        rec = {"canary_pre_sec": 1.0, "parallel_canary_pre_sec": 1.9,
               "canary_sec": 1.3, "parallel_canary_sec": 1.35}
        assert bench_diff.canary_scale(rec) == pytest.approx(1.9)


class TestParallelAbsoluteGuard:
    def test_fast_single_with_healthy_parallel_not_degraded(self):
        # r11 closing-run shape: single 0.755s (unusually FAST),
        # parallel 1.581s (inside the healthy absolute band) —
        # ratio 2.09x but the box delivers its cores; widening the
        # band here would mask real movers.
        rec = {"canary_sec": 0.755, "parallel_canary_sec": 1.581,
               "canary_pre_sec": 0.938, "parallel_canary_pre_sec": 1.607}
        assert bench_diff.canary_scale(rec) == 1.0

    def test_slow_parallel_still_degrades(self):
        # genuine contention: parallel well above the healthy band
        rec = {"canary_sec": 1.3, "parallel_canary_sec": 2.49}
        assert bench_diff.canary_scale(rec) == pytest.approx(2.49 / 1.3)

    def test_mixed_pairs_only_slow_parallel_counts(self):
        # pre pair is a fast-single artifact, post pair is real steal:
        # scale must come from the post pair only
        rec = {"canary_pre_sec": 0.8, "parallel_canary_pre_sec": 1.65,
               "canary_sec": 1.3, "parallel_canary_sec": 2.6}
        assert bench_diff.canary_scale(rec) == pytest.approx(2.6 / 1.3)


class TestBoxDegradedField:
    def test_box_degraded_mirrors_canary_scale(self):
        # VERDICT r12 item 8: the record-level verdict is exactly
        # "canary_scale would widen the band"
        healthy = {"canary_sec": 1.3, "parallel_canary_sec": 1.4}
        steal = {"canary_sec": 1.3, "parallel_canary_sec": 2.49}
        assert bench_diff.box_degraded(healthy) is False
        assert bench_diff.box_degraded(steal) is True

    def test_bench_diff_flags_stale_embedded_verdict(self, tmp_path, capsys):
        # a record claiming healthy while its canaries say degraded
        # (mismatched bench.py/bench_diff versions) must print a warning
        import json
        bench = {"value": 10.0, "queries": {"q": 10.0},
                 "canary_sec": 1.3, "parallel_canary_sec": 2.6,
                 "box_degraded": False}
        base = {"queries": {"q": 10.0}}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        bench_diff.main([str(bp), "--baseline", str(tp)])
        out = capsys.readouterr().out
        assert "box_degraded=False" in out and "canary math says True" in out

    def test_bench_diff_silent_on_consistent_verdict(self, tmp_path, capsys):
        import json
        bench = {"value": 10.0, "queries": {"q": 10.0},
                 "canary_sec": 1.3, "parallel_canary_sec": 2.6,
                 "box_degraded": True}
        base = {"queries": {"q": 10.0}}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        bench_diff.main([str(bp), "--baseline", str(tp)])
        assert "mismatched bench.py" not in capsys.readouterr().out


class TestContendedRows:
    def test_contended_row_mover_is_advisory_not_gating(self, tmp_path, capsys):
        # a >threshold ratio on a row whose baseline was recorded under
        # contention prints as advisory and exits 0; the same ratio on
        # a clean row gates (exit 1)
        import json
        bench = {"value": 3.0, "queries": {"clean": 1.0, "contended": 2.0}}
        base = {"queries": {"clean": 1.0, "contended": 1.0},
                "contended_rows": ["contended"]}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        rc = bench_diff.main([str(bp), "--baseline", str(tp)])
        out = capsys.readouterr().out
        assert rc == 0 and "advisory movers on CONTENDED" in out

    def test_clean_row_mover_still_gates(self, tmp_path, capsys):
        import json
        bench = {"value": 3.0, "queries": {"clean": 2.0, "contended": 1.0}}
        base = {"queries": {"clean": 1.0, "contended": 1.0},
                "contended_rows": ["contended"]}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        rc = bench_diff.main([str(bp), "--baseline", str(tp)])
        assert rc == 1 and "MOVERS" in capsys.readouterr().out

    def test_none_summary_largest_excludes_contended(self, tmp_path, capsys):
        # when the only above-threshold row is contended (advisory),
        # the "none (largest: ...)" line must not name it
        import json
        bench = {"value": 3.2, "queries": {"clean": 1.2, "contended": 2.0}}
        base = {"queries": {"clean": 1.0, "contended": 1.0},
                "contended_rows": ["contended"]}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        rc = bench_diff.main([str(bp), "--baseline", str(tp)])
        out = capsys.readouterr().out
        assert rc == 0
        assert "largest: clean" in out and "largest: contended" not in out

    def test_extreme_ratio_on_healthy_box_escalates_to_gating(
            self, tmp_path, capsys):
        # ADVICE r13: a contended row can't stay advisory forever — on a
        # HEALTHY box (canaries fine) a ratio >= 2x the band (3.0x) is a
        # real regression no denominator noise produces. Must gate.
        import json
        bench = {"value": 4.2, "queries": {"clean": 1.0, "contended": 3.2},
                 "canary_sec": 1.3, "parallel_canary_sec": 1.35}
        base = {"queries": {"clean": 1.0, "contended": 1.0},
                "contended_rows": ["contended"]}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        rc = bench_diff.main([str(bp), "--baseline", str(tp)])
        out = capsys.readouterr().out
        assert rc == 1 and "ESCALATED movers on contended" in out

    def test_extreme_ratio_without_canaries_stays_advisory(
            self, tmp_path, capsys):
        # a record with NO canary probes has UNKNOWN box health: that
        # must not count as "healthy" for escalation (canary_scale
        # returns 1.0 for missing probes too)
        import json
        bench = {"value": 4.2, "queries": {"clean": 1.0, "contended": 3.2}}
        base = {"queries": {"clean": 1.0, "contended": 1.0},
                "contended_rows": ["contended"]}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        rc = bench_diff.main([str(bp), "--baseline", str(tp)])
        out = capsys.readouterr().out
        assert rc == 0 and "ESCALATED" not in out
        assert "advisory movers on CONTENDED" in out

    def test_extreme_ratio_on_degraded_box_stays_advisory(
            self, tmp_path, capsys):
        # same 3.2x ratio but the box itself is degraded: contention
        # explains both sides, so the row stays advisory (exit 0).
        import json
        bench = {"value": 4.2, "queries": {"clean": 1.0, "contended": 3.2},
                 "canary_sec": 1.3, "parallel_canary_sec": 2.6}
        base = {"queries": {"clean": 1.0, "contended": 1.0},
                "contended_rows": ["contended"]}
        bp = tmp_path / "bench.json"; bp.write_text(json.dumps(bench))
        tp = tmp_path / "base.json"; tp.write_text(json.dumps(base))
        rc = bench_diff.main([str(bp), "--baseline", str(tp)])
        out = capsys.readouterr().out
        assert rc == 0 and "ESCALATED" not in out
        assert "advisory movers on CONTENDED" in out


def _driver_wrapper(tmp_path, name, bench_record, tail_chars=2000):
    """Build a driver-faithful BENCH_r{N}.json wrapper: rc=0,
    parsed=null, tail = the LAST `tail_chars` chars of the JSON line
    (head-truncated, exactly the r1-r13 artifact shape)."""
    line = json.dumps(bench_record) + "\n"
    wrapper = {"n": 55, "rc": 0, "cpus": 32, "sf": 0.1,
               "tail": line[-tail_chars:], "parsed": None}
    p = tmp_path / name
    p.write_text(json.dumps(wrapper))
    return str(p)


class TestTruncatedTailRecovery:
    """VERDICT r13 item 2: every real driver BENCH_r{N}.json carries
    parsed=null + a 2000-char head-truncated tail; load_bench must
    recover the record instead of crashing on rec["parsed"]["queries"].
    """

    def _record(self, n_queries=60):
        # old (pre-r14) key order: metric/value FIRST, i.e. in the
        # truncation-destroyed head — the worst case for recovery
        return {
            "metric": "headline_queries_total_wall",
            "value": round(sum(0.1 * (i % 7 + 1) for i in range(n_queries)), 3),
            "unit": "sec",
            "queries": {f"q_{i:03d}_{'x' * 20}": round(0.1 * (i % 7 + 1), 3)
                        for i in range(n_queries)},
            "sf": 0.1, "cpus": 32,
            "canary_pre_sec": 1.064, "parallel_canary_pre_sec": 2.382,
            "canary_sec": 1.097, "parallel_canary_sec": 2.124,
            "box_degraded": True,
        }

    def test_full_queries_span_survives(self, tmp_path):
        rec = self._record(40)  # head cut lands before "queries"
        path = _driver_wrapper(tmp_path, "BENCH_r99.json", rec)
        queries, total, label, out_rec = bench_diff.load_bench(path)
        assert queries == rec["queries"]
        # "value" was in the destroyed head: total = sum of rows
        assert total == pytest.approx(sum(rec["queries"].values()), abs=1e-6)
        assert "recovered from truncated tail" in label
        # trailing scalars recovered for canary gate math
        assert out_rec["canary_sec"] == 1.097
        assert out_rec["parallel_canary_pre_sec"] == 2.382
        assert out_rec["box_degraded"] is True
        assert bench_diff.canary_scale(out_rec) > 1.0

    def test_truncation_inside_queries_keeps_surviving_entries(self, tmp_path):
        rec = self._record(120)  # big enough that the cut lands mid-dict
        full = json.dumps(rec) + "\n"
        # precondition: the 2000-char tail starts INSIDE the queries
        # dict (its opening brace is in the destroyed head)
        assert full.index('"queries"') < len(full) - 2000
        path = _driver_wrapper(tmp_path, "BENCH_r98.json", rec)
        queries, total, label, out_rec = bench_diff.load_bench(path)
        # a strict suffix of the entries survives, none invented
        assert 0 < len(queries) < 120
        for k, v in queries.items():
            assert rec["queries"][k] == pytest.approx(v)
        assert total == pytest.approx(sum(queries.values()), abs=1e-3)
        assert out_rec["box_degraded"] is True

    def test_parsed_non_null_wrapper_unchanged(self, tmp_path):
        rec = {"value": 1.0, "queries": {"qa": 1.0}}
        p = tmp_path / "BENCH_r97.json"
        p.write_text(json.dumps({"rc": 0, "tail": "junk", "parsed": rec}))
        queries, total, label, _ = bench_diff.load_bench(str(p))
        assert queries == {"qa": 1.0} and total == 1.0
        assert "recovered" not in label

    def test_scalars_only_tail_never_scavenged_as_queries(self, tmp_path):
        # a tail that starts AFTER the queries dict's closing brace
        # contains only record-level scalars; the mid-dict fallback
        # must refuse to fabricate a queries dict out of them
        p = tmp_path / "BENCH_r93.json"
        p.write_text(json.dumps({
            "rc": 0, "parsed": None,
            "tail": ('ry": 0.5}, "sf": 0.1, "cpus": 32, '
                     '"canary_pre_sec": 1.0, "parallel_canary_pre_sec": '
                     '1.3, "canary_sec": 1.1, "parallel_canary_sec": 1.3,'
                     ' "metric": "headline_queries_total_wall", '
                     '"value": 38.2, "unit": "sec", "box_degraded": '
                     'false}')[len('ry": 0.5}, '):]}))
        # tail deliberately begins at '"sf": ...' — queries span gone
        with pytest.raises(SystemExit, match="no.*recoverable queries"):
            bench_diff.load_bench(str(p))

    def test_scalar_regexes_anchored_after_queries_span(self, tmp_path):
        # ADVICE r14: with queries FIRST in the key order, a headline
        # query literally named "value"/"cpus" must not be misread as
        # the record scalar — scalar searches anchor AFTER the span.
        rec = {
            "queries": {"value": 9.9, "cpus": 8.8, "q_real": 0.5},
            "sf": 0.1, "cpus": 32,
            "metric": "headline_queries_total_wall",
            "value": 19.2, "unit": "sec",
        }
        path = _driver_wrapper(tmp_path, "BENCH_r92.json", rec)
        queries, total, _, out_rec = bench_diff.load_bench(path)
        assert queries == rec["queries"]
        assert total == 19.2 and out_rec["cpus"] == 32  # record scalars

    def test_pre_r14_head_scalars_still_recovered(self, tmp_path):
        # pre-r14 key order put metric/value BEFORE queries; a mild
        # truncation leaves them intact in the head region — the
        # anchoring must fall back there, never inside the span
        rec = {
            "metric": "headline_queries_total_wall",
            "value": 42.5, "unit": "sec",
            "queries": {"value": 9.9, "qa": 1.0},
            "sf": 0.1,
        }
        path = _driver_wrapper(tmp_path, "BENCH_r91.json", rec)
        queries, total, _, out_rec = bench_diff.load_bench(path)
        assert queries == rec["queries"]
        assert total == 42.5  # the recorded head value, not 9.9/sum
        assert out_rec["metric"] == "headline_queries_total_wall"

    def test_unrecoverable_tail_exits_with_message(self, tmp_path):
        # rc=0 (the run "succeeded") but the tail holds nothing usable
        p = tmp_path / "BENCH_r96.json"
        p.write_text(json.dumps({"rc": 0, "tail": "no json here at all",
                                 "parsed": None}))
        with pytest.raises(SystemExit, match="no.*recoverable queries"):
            bench_diff.load_bench(str(p))

    def test_new_bench_key_order_keeps_total_in_tail(self, tmp_path):
        # r14 bench.py emits queries FIRST and metric/value LAST: after
        # the same truncation, "value" now survives and is used as-is.
        rec = self._record(120)
        reordered = {k: rec[k] for k in
                     ("queries", "sf", "cpus", "canary_pre_sec",
                      "parallel_canary_pre_sec", "canary_sec",
                      "parallel_canary_sec", "metric", "value", "unit",
                      "box_degraded")}
        path = _driver_wrapper(tmp_path, "BENCH_r95.json", reordered)
        queries, total, _, out_rec = bench_diff.load_bench(path)
        assert total == rec["value"]  # not a sum fallback
        assert out_rec["metric"] == "headline_queries_total_wall"

    def test_every_historical_driver_artifact_loads_or_is_failed_run(self):
        # regression over the REAL r1-r13 wrappers in the repo root:
        # every rc=0 record loads (parsed directly or recovered from
        # its tail), and crashed runs (rc!=0, traceback tail) are
        # rejected with the failed-run message instead of scavenged.
        import glob
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        paths = sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")))
        if not paths:
            pytest.skip("no driver artifacts present")
        for p in paths:
            rc = json.load(open(p)).get("rc")
            if rc not in (0, None):
                with pytest.raises(SystemExit, match="FAILED bench run"):
                    bench_diff.load_bench(p)
                continue
            queries, total, label, rec = bench_diff.load_bench(p)
            assert queries and total > 0
            if rec.get("value") is not None:
                # total taken verbatim from the record; with the r14
                # key order a truncated tail can keep "value" while
                # losing the OLDEST queries entries, so sum(partial
                # queries) may legitimately undershoot the total
                assert total == float(rec["value"])
                assert sum(queries.values()) <= total * 1.001
            else:
                # "value" destroyed (pre-r14 key order): the sum IS
                # the total by construction
                assert total == pytest.approx(
                    sum(queries.values()), rel=0.02)

    def test_failed_run_wrapper_rejected_even_with_plausible_tail(self, tmp_path):
        # rc!=0 must short-circuit BEFORE tail scavenging, even if the
        # traceback happens to contain a queries-shaped span
        p = tmp_path / "BENCH_r94.json"
        p.write_text(json.dumps({
            "rc": 1, "parsed": None,
            "tail": 'error after "queries": {"qa": 1.0} was printed'}))
        with pytest.raises(SystemExit, match="FAILED bench run"):
            bench_diff.load_bench(str(p))

    def test_real_driver_artifact_end_to_end(self, capsys):
        # the documented invocation that crashed pre-r14:
        # python bench_diff.py BENCH_r13.json (run from the repo root).
        # Diffed against a FROZEN r13-era baseline snapshot
        # (tests/fixtures/), not the live BASELINE_TABLE.json: the live
        # table moves whenever a row is legitimately re-recorded after a
        # real code change (r17 re-recorded six rows), so a historical
        # artifact can only be mover-free against the baseline of its
        # own era (VERDICT r17 item 1).
        import os
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench = os.path.join(repo, "BENCH_r13.json")
        base = os.path.join(
            repo, "tests", "fixtures", "BASELINE_TABLE_r13_frozen.json")
        if not os.path.exists(bench):
            pytest.skip("BENCH_r13.json not present")
        rc = bench_diff.main([bench, "--baseline", base])
        out = capsys.readouterr().out
        assert rc == 0  # r13 verdict: zero gating movers, box degraded
        assert "recovered from truncated tail" in out
        assert "box DEGRADED" in out
