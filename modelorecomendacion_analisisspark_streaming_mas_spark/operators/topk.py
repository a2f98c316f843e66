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


def striped_global_row_number(
    df: DataFrame,
    order: list[Column],
    stripe: Column,
    rank_col: str = "rn",
    total_col: str | None = None,
    max_stripes: int = 4096,
) -> DataFrame:
    """Exact global ``row_number`` over an UNBOUNDED input without the
    single-partition window funnel (two-level rank).

    ``stripe`` must COARSEN the total order: for any two rows a, b,
    ``stripe(a) < stripe(b)`` implies a sorts before b under ``order``,
    and stripe values must be plain str/int/float so the driver-side
    ascending sort agrees with Spark's. Typical stripes: a fixed hex
    prefix of an md5 sort key (uniform by construction), or a
    ``width_bucket`` over the leading numeric sort column.

    Plan shape at scale: ONE hash shuffle of the data keyed on the
    stripe (the partitioned ranking window -- per-stripe state only),
    plus a stripe-count aggregate whose result is collected -- bounded
    by ``max_stripes`` rows, enforced with a loud failure, never
    O(input). The per-stripe offsets come back as a broadcast join.

    If ``total_col`` is given, the total row count (already known from
    the stripe counts -- no extra scan) is attached as a literal column.
    """
    s = df.withColumn("_stripe", stripe)
    counts = (
        s.groupBy("_stripe").agg(F.count(F.lit(1)).alias("_n")).take(max_stripes + 1)
    )
    if len(counts) > max_stripes:
        raise ValueError(
            f"striped_global_row_number: >{max_stripes} stripes; widen the "
            "stripe (coarser prefix / fewer buckets) so offsets stay "
            "driver-bounded"
        )
    if any(row["_stripe"] is None for row in counts):
        raise ValueError(
            "striped_global_row_number: stripe expression produced NULL for "
            "some rows (e.g. a null sort key, or width_bucket on a "
            "degenerate min==max domain); make the stripe total -- coalesce "
            "nulls into a dedicated bucket or filter them first"
        )
    acc = 0
    offsets = []
    for row in sorted(counts, key=lambda r: r["_stripe"]):
        offsets.append((row["_stripe"], acc))
        acc += row["_n"]
    out_empty = s.drop("_stripe")
    if not offsets:  # empty input: schema-stable empty result
        out_empty = out_empty.withColumn(rank_col, F.lit(0).cast("long"))
        if total_col is not None:
            out_empty = out_empty.withColumn(total_col, F.lit(0).cast("long"))
        return out_empty
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, ["_stripe", "_offset"])
    w = Window.partitionBy("_stripe").orderBy(*order)
    out = (
        s.join(F.broadcast(off_df), "_stripe")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_offset")).cast("long"))
        .drop("_stripe", "_offset")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out
