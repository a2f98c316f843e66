"""pandas-on-Spark facade (SURVEY section 2.13 entry point 1: the reference
implements its ETL three ways -- pandas, pandas-on-Spark, PySpark). The
PySpark DataFrame library is the engine; this facade exposes the same
cleaned tables as pandas-on-Spark frames for users of that dialect
(Explorativa/Explorativa1_ps_pandas.ipynb), e.g. ``.apply``/``.map``-style
element work (U2) without leaving Spark execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_pandas_on_spark(df: DataFrame):
    """Engine DataFrame -> pandas-on-Spark frame (zero-copy plan reuse;
    downstream .groupby/.value_counts etc. still run on Spark)."""
    return df.pandas_api()


def movielens_ps_pipeline(spark, movies_path: str, users_path: str, ratings_path: str):
    """The Explorativa1_ps_pandas surface: same ETL, pandas-on-Spark views."""
    from .movielens import etl_pipeline

    return {k: to_pandas_on_spark(v) for k, v in etl_pipeline(
        spark, movies_path, users_path, ratings_path
    ).items()}
