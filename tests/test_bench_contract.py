"""Contract tests for bench.py's driver-facing JSON line.

The round driver captures only the LAST 2000 characters of bench stdout and
parses the JSON line out of that window — a longer line gets clipped at the
front and recorded as ``parsed: null`` (this happened in round 1 with a
2140-char line). These tests pin the emit path without starting Spark.
"""

from __future__ import annotations

import json

import bench


def _fake_timings(n: int = 80) -> dict[str, float]:
    t = {f"q{i:02d}_some_longish_query_name_{i}": round(0.1 + i * 0.013, 3) for i in range(n)}
    for h in bench.HEADLINE:
        t[h] = 1.234
    return t


def _payload(timings: dict[str, float]) -> dict:
    inline = {k: timings[k] for k in bench.HEADLINE if k in timings}
    return {
        "metric": "batch_suite_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": inline,
        "n_queries": len(timings),
        "other_queries_sec": 100.0,
        "detail": "BENCH_DETAIL.json",
        "sf": 0.1,
        "streaming_trigger_ms": {
            k: {
                "batch_mean_ms": 201.66,
                "trigger_mean_ms": 473.21,
                # r11 shape: min-of-3 for every config incl. stateful
                "pass_batch_means_ms": [201.66, 214.32, 209.87],
            }
            for k in ("append", "update", "stateful_update")
        },
        "baseline_trigger_ms": {"append_mean": 70.40, "update_mean": 82.97},
        "method": "min3x20s,skip3,1part vs 1x639trig in-callback",
        "calibration": {"jvm_range_agg_sec": 1.234, "py_loop_sec": 0.567},
        "calibration_normalized": {
            "suite_wall_r9_jvm_units_sec": 212.345,
            "host_slowdown_vs_r9": 1.399,
            "ref_jvm_range_agg_sec": bench.R9_JVM_REF_SEC,
        },
    }


def test_emitted_line_fits_driver_tail_window(capsys):
    bench.emit(_payload(_fake_timings()))
    line = capsys.readouterr().out.strip()
    assert len(line) < 2000, f"bench line {len(line)} chars would be clipped by the driver"
    parsed = json.loads(line)
    assert parsed["metric"] == "batch_suite_wall"
    assert parsed["queries"]  # headline subset survived


def test_emit_trims_oversized_query_dict(capsys):
    payload = _payload(_fake_timings())
    # Poison the inline dict with enough bulk to overflow the budget.
    payload["queries"] = {f"pad_{i}_{'x' * 40}": 1.0 for i in range(100)}
    bench.emit(payload)
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.MAX_LINE
    json.loads(line)  # still valid JSON after trimming


def test_headline_names_are_real_catalog_queries():
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans import REGISTRY

    missing = [h for h in bench.HEADLINE if h not in REGISTRY]
    assert not missing, f"HEADLINE names not in catalog: {missing}"


# ---------------------------------------------------------------------------
# Multi-point calibration (r12 VERDICT item 1): the r12 official normalized
# wall read 338.5 (a 52% phantom regression) because the single pre-suite
# probe ran during a neighbor burst that ended before the suite started.
# These tests pin the nearest-probe normalization math without Spark.
# ---------------------------------------------------------------------------


def test_probe_positions_every_50_plus_end():
    assert bench.probe_positions(192) == [0, 50, 100, 150, 192]
    # a would-be probe within every//2 of the end merges into the end probe
    assert bench.probe_positions(210) == [0, 50, 100, 150, 210]
    # tiny suites: just start + end
    assert bench.probe_positions(50) == [0, 50]
    assert bench.probe_positions(12) == [0, 12]


def test_nearest_probe_index_boundaries_and_ties():
    pos = [0, 50, 100, 150, 192]
    assert bench.nearest_probe_index(pos, 0) == 0
    assert bench.nearest_probe_index(pos, 24) == 0  # center 24.5 -> probe 0
    assert bench.nearest_probe_index(pos, 25) == 1  # center 25.5 -> probe 50
    assert bench.nearest_probe_index(pos, 99) == 2
    assert bench.nearest_probe_index(pos, 191) == 4


def test_per_query_slowdowns_track_mid_run_host_shift():
    # Host runs 2x slower for the middle probe's neighborhood only: queries
    # nearest that probe get a 2x slowdown factor, the rest stay at 1x.
    s = bench.per_query_slowdowns(
        [0, 2, 4], [1.0, 2.0, 1.0], 4, cold_start_sec=bench.R9_JVM_REF_SEC
    )
    assert s == [1.0, 2.0, 2.0, 1.0]
    # cold-start anchor scales every factor uniformly (the r9 convention)
    s2 = bench.per_query_slowdowns(
        [0, 2, 4], [1.0, 2.0, 1.0], 4, cold_start_sec=2 * bench.R9_JVM_REF_SEC
    )
    assert s2 == [2.0, 4.0, 4.0, 2.0]


def test_per_query_slowdowns_phantom_regression_killed():
    # The r12 failure mode: the pre-suite probe and the suite see different
    # host speeds, so single-point normalization scales every query by a
    # factor that no longer applies. With multi-point probes the warm drift
    # corrects it: probes after the shift read 2x the start warm value, so
    # queries that ran 2x slower normalize back to their quiet-host walls.
    raw = [1.0, 2.0, 2.0, 2.0]  # host slowed 2x after the first query
    s = bench.per_query_slowdowns(
        [0, 2, 4], [0.2, 0.4, 0.4], 4, cold_start_sec=bench.R9_JVM_REF_SEC
    )
    assert s == [1.0, 2.0, 2.0, 2.0]
    normalized = sum(r / f for r, f in zip(raw, s))
    assert abs(normalized - 4.0) < 1e-9  # every query normalizes back to 1.0


def test_probe_spread_confidence_flag():
    spread, conf = bench.probe_spread([1.0, 1.1, 1.05])
    assert conf == "high" and spread == 1.1
    spread, conf = bench.probe_spread([1.0, 1.3])
    assert conf == "low" and spread == 1.3


def test_emit_with_multipoint_calibration_fits_tail_window(capsys):
    payload = _payload(_fake_timings())
    payload["calibration_normalized"] = {
        "suite_wall_r9_jvm_units_sec": 212.345,
        "suite_wall_r9_jvm_units_range_sec": [205.1, 240.9],
        "host_slowdown_vs_r9": 1.399,
        "probe_py_sec": [0.291, 0.302, 0.287, 0.31, 0.295],
        "probe_warm_jvm_sec": [0.182, 0.171, 0.19, 0.177, 0.185],
        "probe_spread": 1.08,
        "normalized_confidence": "high",
        "ref_jvm_range_agg_sec": bench.R9_JVM_REF_SEC,
    }
    bench.emit(payload)
    line = capsys.readouterr().out.strip()
    assert len(line) <= bench.MAX_LINE
    parsed = json.loads(line)
    assert parsed["queries"], "headline queries trimmed away by calibration bulk"
    assert parsed["calibration_normalized"]["normalized_confidence"] == "high"


def test_drift_series_is_one_statistic():
    """r13 ADVICE: probe 0 (calibrate, min-of-3 py shots) and every
    mid-suite probe must be the SAME estimator -- a min-of-2 mid-suite
    default made drift ratios structurally biased upward. Pin the
    probe_py_loop default to 3 shots and that it actually takes them."""
    import inspect

    sig = inspect.signature(bench.probe_py_loop)
    assert sig.parameters["shots"].default == 3
    shots = bench.probe_py_loop()
    assert len(shots) == 3
    assert all(s > 0 for s in shots)
