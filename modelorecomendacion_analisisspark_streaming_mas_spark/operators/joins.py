"""Join operators beyond plain equi-joins (SURVEY section 2.4's "not
present" row): as-of (most-recent-prior-event) attribution.

The as-of join is implemented as the UNION + running ``last(ignorenulls)``
window pattern rather than a range join: one shuffle on the partition key,
state bounded by the window frame, and -- critically at 100 TB -- no
per-row range probe. This is the canonical Spark shape for
"latest left-row at or before each right-row".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_attribute(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    left_id: str,
    right_id: str,
    out_col: str = "attributed_id",
) -> DataFrame:
    """For each row of ``right``, attach the id of the most recent ``left``
    row with the same ``on`` key and ts <= right.ts (ties broken by id
    order). Returns right's (right_id, on, ts) + ``out_col`` (nullable)."""
    l_tag = left.select(
        F.col(on), F.col(ts), F.col(left_id).alias("_lid"), F.lit(None).cast("long").alias("_rid")
    )
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(None).cast("long").alias("_lid"), F.col(right_id).alias("_rid")
    )
    tagged = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.coalesce("_lid", "_rid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(out_col, F.last("_lid", ignorenulls=True).over(w))
        .filter(F.col("_rid").isNotNull())
        .select(F.col("_rid").alias(right_id), on, ts, out_col)
    )
