"""Ranking / top-K operators (SURVEY.md sections 2.6-2.7: W1, W2, O1-O5).

Scale notes (100 TB):
  * ``top_k`` lowers to ``TakeOrderedAndProject`` -- each task keeps a
    size-k heap, the driver merges k-per-partition; no global sort.
  * ``grouped_top_k`` is the canonical partitioned ranking window
    (Explorativa/Explorativa2.ipynb:195) -- one shuffle on the partition
    keys, per-group state is O(group size).
  * ``global_rank`` reproduces the reference's UNpartitioned
    ``row_number().over(Window.orderBy(...))``
    (Explorativa/Explorativa2.ipynb:133-139). That window funnels every row
    through ONE partition; fine for a pre-aggregated few-thousand-row
    result, catastrophic on a raw fact table. It therefore requires the
    caller to bound the input via ``limit`` first (enforced here by ranking
    only the top ``limit`` rows via TakeOrdered semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """O3: global top-k. Include a unique tie-break column in ``order`` when
    downstream comparison must be deterministic."""
    return df.orderBy(*order).limit(k)


def grouped_top_k(
    df: DataFrame,
    partition_by: list[str],
    order: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """W2: per-group top-k via ``row_number`` over a partitioned window."""
    w = Window.partitionBy(*partition_by).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "posicion",
    limit: int = 10_000,
) -> DataFrame:
    """W1, made scale-safe: rank rows globally but only after a
    ``TakeOrderedAndProject`` bound, so the single-partition window only
    ever sees ``limit`` rows regardless of input size."""
    bounded = df.orderBy(*order).limit(limit)
    w = Window.orderBy(*order)
    return bounded.withColumn(rank_col, F.row_number().over(w))
