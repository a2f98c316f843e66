"""Storage-layout queries: clustered (range-partitioned, sorted) parquet
writes and the data skipping they buy.

At 100 TB the write layout IS the read optimizer: a table range-
partitioned and sorted on its hot predicate column gives every file (and
every row group inside it) a narrow min/max envelope, so a selective
scan prunes most of the data from the parquet FOOTERS alone -- before a
single data page is read. This is the poor-man's z-order: one
clustering dimension, zero extra dependencies, pure Spark.

q50 proves the round-trip is lossless (layout must never change query
results); tests/test_layout.py proves the skipping itself by reading the
row-group statistics of the files q50 wrote and counting how few
envelopes overlap the filter window (vs ~all of them for the unsorted
original layout).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import register

# One clustered copy per (sf_dir) per process, reclaimed at exit
# (same lifecycle pattern as streamq's replay staging).
_CLUSTERED: dict[str, str] = {}


@atexit.register
def _cleanup_clustered() -> None:
    for d in _CLUSTERED.values():
        shutil.rmtree(d, ignore_errors=True)
    _CLUSTERED.clear()


def write_clustered(
    df: DataFrame, path: str, range_col: str, n_partitions: int = 8
) -> None:
    """Range-partition on ``range_col`` (one disjoint value range per
    output file) and sort within each partition (monotone row groups
    inside each file -> tight per-row-group min/max stats)."""
    (
        df.repartitionByRange(n_partitions, F.col(range_col))
        .sortWithinPartitions(range_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def clustered_lineitem_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _CLUSTERED:
        d = tempfile.mkdtemp(prefix="mras_clustered_")
        write_clustered(load_table(spark, sf_dir, "lineitem"), d, "l_shipdate")
        _CLUSTERED[sf_dir] = d
    return _CLUSTERED[sf_dir]


# --------------------------------------------------------------------------
# q50: clustered-layout round trip. Write lineitem clustered on
# l_shipdate, read it back through the narrow 1996Q1 window (the filter
# lands in PushedFilters and, thanks to the layout, skips all but the
# overlapping files/row groups), and aggregate. The oracle runs on the
# ORIGINAL table: layout must be invisible to results.
# --------------------------------------------------------------------------


@register(
    "q50_clustered_scan_pruning",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
GROUP BY l_returnflag
""",
)
def q50_clustered_scan_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = clustered_lineitem_dir(spark, sf_dir)
    li = spark.read.parquet(d)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )
