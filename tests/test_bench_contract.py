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
