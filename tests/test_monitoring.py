"""M7: REST job-progress polling (Modelo/Crear modelo.ipynb cells 9-10).

Runs in a SUBPROCESS because the shared test session keeps the UI off
(spark.ui.enabled=false for startup speed) and one JVM allows one
SparkContext; the child session enables the UI and polls itself during a
short als.fit.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import json
from pyspark.sql import SparkSession

from modelorecomendacion_analisisspark_streaming_mas_spark.ml.progress import RestJobPoller
from modelorecomendacion_analisisspark_streaming_mas_spark.ml.recommend import (
    build_als, ratings_from_testdata,
)

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4055")
    .appName("m7-progress")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
ratings = ratings_from_testdata(spark, "/root/testdata/sf0.001")
with RestJobPoller(spark, interval_s=0.1) as poller:
    build_als(rank=8, max_iter=8).fit(ratings)
print(json.dumps({
    "samples": len(poller.samples),
    "running": len(poller.running_samples()),
    "max_jobs": max((s["n_jobs"] for s in poller.samples), default=0),
}))
"""


def test_rest_job_poller_observes_fit():
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    stats = json.loads(out.stdout.strip().splitlines()[-1])
    # als.fit at 8 iterations launches dozens of jobs; the poller must have
    # sampled the API and caught at least one job mid-flight.
    assert stats["samples"] > 0
    assert stats["max_jobs"] > 0
    assert stats["running"] >= 1, stats


def test_rest_job_poller_refuses_uiless_session(spark):
    from modelorecomendacion_analisisspark_streaming_mas_spark.ml.progress import RestJobPoller

    if spark.sparkContext.uiWebUrl:
        pytest.skip("UI enabled in this session; refusal path not applicable")
    with pytest.raises(RuntimeError, match="spark.ui.enabled"):
        RestJobPoller(spark)
