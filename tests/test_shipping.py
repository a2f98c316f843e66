"""Executors must be able to import the package without relying on the
driver's cwd: catalog queries ship the package zip via ``sc.addPyFile``
(shipping.py). The regression this pins: a plain SparkSession built from a
foreign cwd running a Pandas-UDF-bearing catalog query used to crash every
Python worker with ModuleNotFoundError -- exactly the driver's conditions,
and what ``spark-submit --py-files`` solves on a real cluster."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    f"""
    import sys
    sys.path.insert(0, {REPO_ROOT!r})
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    # mapInPandas stage: deserializing the UDF on a worker imports the
    # package; fails without addPyFile when cwd is not the repo root.
    rows = e.queries()["mm02_image_features"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "mm02 returned no rows"
    print("SHIPPED_OK", len(rows))
    """
)


def test_pandas_udf_catalog_query_runs_from_foreign_cwd(tmp_path):
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-3000:]}"
    assert "SHIPPED_OK" in r.stdout


def test_cli_list_and_run_verify():
    """__main__ CLI: list filters by prefix; run --verify reproduces the
    driver's oracle compare from the shell (exit 0 on MATCH)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-m", "modelorecomendacion_analisisspark_streaming_mas_spark",
         "list", "q01"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0 and "q01_pricing_summary" in out.stdout

    out = subprocess.run(
        [sys.executable, "-m", "modelorecomendacion_analisisspark_streaming_mas_spark",
         "run", "q01_pricing_summary", "--verify"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "verify: MATCH" in out.stdout
