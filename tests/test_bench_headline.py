"""The bench headline line must stay parseable by the driver.

Round-4 regression: bench.py embedded every leg record in the final JSON
line ("configs"), the line outgrew the driver's 2,000-char tail capture,
and BENCH_r04.json carried ``parsed: null`` — the round's headline number
was unrecoverable from the artifact of record. These tests pin the fix:
the final line is compact (< 1,500 chars) for any realistic headline
record, never embeds per-leg records, and stays valid JSON.
"""

import json
import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, "/root/repo")
    import bench as mod
    return mod


def _maximal_headline():
    """A headline record with EVERY optional field populated at worst-case
    width (long floats, degraded reason, recipe strings)."""
    return {
        "metric": "lfc_int4_qat_images_per_sec_per_chip",
        "value": 123456789.1,
        "unit": "images/sec/chip",
        "reps": 15,
        "vs_baseline": 1.2345,
        "vs_baseline_mean": 1.2345,
        "ratio_spread": 0.6039,
        "mfu": 0.0736,
        "roofline_frac": 0.2329,
        "bound": "latency",
        "roofline_frac_measured": 0.7434,
        "hbm_bw_measured_gbs": 110.4,
        "legs_completed": 12,
        "recipe": "steady_state_migrated_scales",
        "degraded": True,
        "degraded_reason": "device unresponsive (3 probes over ~11.5 "
                           "min failed)",
        # a stowaway configs array must be stripped, not serialized
        "configs": [{"metric": "x" * 400, "value": 1.0}] * 20,
    }


def test_headline_line_is_compact(bench):
    line = bench.headline_line(_maximal_headline())
    assert len(line) < bench.HEADLINE_MAX_CHARS
    assert len(line) < 1500  # the driver tail budget is 2,000; margin


def test_headline_line_never_embeds_configs(bench):
    parsed = json.loads(bench.headline_line(_maximal_headline()))
    assert "configs" not in parsed
    assert parsed["metric"] == "lfc_int4_qat_images_per_sec_per_chip"
    assert parsed["value"] == 123456789.1
    assert parsed["hbm_bw_measured_gbs"] == 110.4


def test_headline_line_survives_pathological_width(bench):
    head = _maximal_headline()
    head["degraded_reason"] = "x" * 5000  # would blow the cap -> core schema
    parsed = json.loads(bench.headline_line(head))
    assert len(bench.headline_line(head)) < bench.HEADLINE_MAX_CHARS
    assert {"metric", "value", "unit", "vs_baseline"} <= set(parsed)


def test_emit_reports_median_of_paired_ratios(bench):
    """vs_baseline is the MEDIAN of per-rep paired ratios — robust to one
    slow relay window (round-4: cnv_int8pc spread 0.60 made the min-based
    ratio swing)."""
    items = 100.0
    # qat twin: steady 1.0s reps; fp twin: one poisoned 3.0s rep
    qat_dts = [1.0, 1.0, 1.0, 1.0, 1.0]
    fp_dts = [1.0, 1.0, 3.0, 1.0, 1.0]

    class FakeRun(bench.ScannedRun):
        def __init__(self, dts):
            super().__init__(run_once=lambda: None, items_per_run=items)
            self._dts = list(dts)

        def timed_reps(self, repeats=None, interleave_with=None):
            out = []
            for dt in self._dts:
                other = None
                if interleave_with is not None:
                    other = interleave_with._dts.pop(0)
                out.append((dt, other))
            self._dts = qat_dts * 3  # refills for adaptive extra rounds
            if interleave_with is not None:
                interleave_with._dts = fp_dts * 3
            return out

    rec = bench._emit("t", "u", FakeRun(qat_dts), FakeRun(fp_dts))
    # median paired ratio is 1.0 (only one rep was poisoned); the MEAN
    # would read 1.4
    assert rec["vs_baseline"] == 1.0
    assert rec["vs_baseline_mean"] > 1.3
    # spread 2.0 > 0.15 target -> adaptive rep escalation engaged
    assert rec["reps"] > len(qat_dts)
