from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from modelorecomendacion_analisisspark_streaming_mas_spark import get_spark  # noqa: E402
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mras-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the same views the driver pre-registers."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for order-insensitive comparison: columns sorted by
    name, rows sorted by every column, index reset."""
    df = df[sorted(df.columns)]
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    a, b = canon(spark_df), canon(oracle_df)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name or "query")
    # Driver-faithful value hash: rendered values must agree too (catches
    # e.g. DuckDB HUGEINT sums surfacing as float64 vs Spark's int64).
    ha = a.to_csv(index=False, float_format="%.6f")
    hb = b.to_csv(index=False, float_format="%.6f")
    assert ha == hb, f"{name}: rendered value hash differs (dtype/format divergence)"
