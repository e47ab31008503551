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
