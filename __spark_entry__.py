"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's top-100 ->
explode -> per-group rank pipeline, Explorativa/Explorativa2.ipynb cells
2-3, re-expressed on the testdata star schema). ``queries()`` /
``oracle_sql()`` expose the full catalog in
``modelorecomendacion_analisisspark_streaming_mas_spark.plans``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from modelorecomendacion_analisisspark_streaming_mas_spark.plans import (  # noqa: E402
    REGISTRY,
    oracle_map,
    query_map,
)

FLAGSHIP = "q02_flagship_top_tokens"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twins; omitted keys get rows-only checks."""
    return oracle_map()
