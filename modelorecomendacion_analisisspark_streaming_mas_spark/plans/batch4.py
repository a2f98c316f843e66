"""Batch coverage round 4: the remaining "not present" join shapes and the
Spark-4 surface the reference predates.

* q32 full outer join (SURVEY 2.4 "not present" row)
* q33 grouped Arrow UDF regression (applyInPandas -- SURVEY 2.12 "not
  present": pandas grouped-map; oracle = DuckDB's regr_slope/intercept)
* q34 correlated LATERAL subquery with per-row ORDER/LIMIT (SQL:2016
  lateral, Spark 4 + DuckDB both support it natively)
* q35 unpivot/melt (DataFrame.unpivot -> Expand; oracle = UNION ALL)
* q36 listagg WITHIN GROUP (Spark 4.0 ANSI string agg)
* q37 VARIANT ingestion (parse_json + variant_get, Spark 4's
  semi-structured type; shredded access beats re-parsing JSON strings)
* q38 robust stats: median / mode / percentile_disc
* q39 Python UDTF (Spark 4 table function) chunking documents, LATERAL
  correlated -- the tokenizer-/chunker-shaped primitive of an LLM data
  pipeline as a first-class table function

Scale notes: q32's two pre-aggregations shrink both sides before the
full-outer shuffle (aggregate-then-join, never join-then-aggregate).
q33 broadcasts nothing and shuffles once on p_brand; the per-group solve
is O(1) numpy. q34's lateral is de-correlated by Catalyst into a ranked
window, not a per-row re-scan. q37 parses JSON once into VARIANT's binary
form; repeated path access is then structural, not string re-parsing.
q39's UDTF runs Arrow-batched; one Python worker pass per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import cents_sum_spark

from ..sources.readers import load_table
from .catalog import money_sum_spark, grid_mean_spark, grid_mean_sql, money_mean_sql, money_mean_spark, register, try_json_k_sql


@register(
    "q32_full_outer_nation_coverage",
    oracle="""
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_rich_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
), s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_rich_supp
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(c.n_rich_cust, 0) AS n_rich_cust,
       coalesce(s.n_rich_supp, 0) AS n_rich_supp
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
""",
)
def q32_full_outer_nation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregations (rich customers vs rich
    suppliers per nation). Aggregate-then-join: both sides shrink to
    <=25 rows before the join, so the full-outer exchange is trivial
    regardless of fact cardinality."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_rich_supp"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_rich_cust", F.lit(0)).alias("n_rich_cust"),
            F.coalesce("n_rich_supp", F.lit(0)).alias("n_rich_supp"),
        )
    )


@register(
    "q33_group_regression",
    oracle="""
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p_brand
""",
)
def q33_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Arrow UDF (applyInPandas): per-brand OLS of extended
    price on quantity, checked against DuckDB's regr_slope/regr_intercept.
    One shuffle on p_brand; each group's closed-form solve is O(n) numpy
    inside the Arrow batch -- the pattern for per-entity model fits at
    scale (no driver loop, no collect)."""
    import numpy as np
    import pandas as pd

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_brand", "l_quantity", "l_extendedprice"
    )

    # no type hints: under postponed annotations they reach PySpark as
    # strings, and the eval-type inference warns on every registration
    def ols(key, pdf):
        x = pdf["l_quantity"].to_numpy(dtype=np.float64)
        y = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
        n = len(x)
        sx, sy = x.sum(), y.sum()
        sxx, sxy = (x * x).sum(), (x * y).sum()
        denom = n * sxx - sx * sx
        if denom == 0.0:  # single row / constant x: regr_slope is NULL
            slope, intercept = None, None
        else:
            slope = (n * sxy - sx * sy) / denom
            intercept = round((sy - slope * sx) / n, 4)
            slope = round(slope, 4)
        return pd.DataFrame(
            {
                "p_brand": [key[0]],
                "n": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return joined.groupBy("p_brand").applyInPandas(
        ols, schema="p_brand string, n bigint, slope double, intercept double"
    )


_LATERAL_SQL = """
SELECT n.n_name, u.c_name, u.c_acctbal
FROM {nation} n,
LATERAL (
  SELECT c_name, c_acctbal FROM {customer} c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) u
"""


@register("q34_lateral_top_customers", oracle=_LATERAL_SQL.format(nation="nation", customer="customer"))
def q34_lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-outer-row ORDER BY/LIMIT: each
    nation's top-2 customers by balance. Catalyst de-correlates this into
    a partitioned rank + filter (one pass over customer), not a per-nation
    re-scan -- the same physical shape as the W2 top-k pattern."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_q34")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_q34")
    return spark.sql(_LATERAL_SQL.format(nation="nation_q34", customer="customer_q34"))


@register(
    "q35_unpivot_segment_metrics",
    oracle=f"""
WITH agg AS (
  SELECT c_mktsegment,
         (sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 1e2) AS sum_bal,
         {money_mean_sql('c_acctbal')} AS avg_bal,
         round(min(c_acctbal), 2) AS min_bal,
         round(max(c_acctbal), 2) AS max_bal
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment, 'sum_bal' AS metric, sum_bal AS value FROM agg
UNION ALL SELECT c_mktsegment, 'avg_bal', avg_bal FROM agg
UNION ALL SELECT c_mktsegment, 'min_bal', min_bal FROM agg
UNION ALL SELECT c_mktsegment, 'max_bal', max_bal FROM agg
""",
)
def q35_unpivot_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long via DataFrame.unpivot (melt): per-segment balance
    metrics unpivoted to (segment, metric, value) rows. Lowers to a single
    Expand over the 5-row aggregate -- no join, no repeated scan (the
    UNION ALL oracle re-reads; Expand does not)."""
    agg = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            money_sum_spark("c_acctbal").alias("sum_bal"),
            # integer-cents mean (see catalog.money_mean_spark)
            money_mean_spark("c_acctbal").alias("avg_bal"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )
    return agg.unpivot(
        ids=["c_mktsegment"],
        values=["sum_bal", "avg_bal", "min_bal", "max_bal"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "q36_listagg_region_nations",
    oracle="""
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_nations,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r_name
""",
)
def q36_listagg_region_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI listagg WITHIN GROUP (Spark 4.0): deterministic ordered string
    aggregation per region. The explicit ORDER BY inside the aggregate is
    what makes the result hash-stable across partitionings -- an unordered
    collect_list would be nondeterministic under shuffle."""
    load_table(spark, sf_dir, "region").createOrReplaceTempView("region_q36")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_q36")
    return spark.sql(
        """
        SELECT r_name,
               count(*) AS n_nations,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS nations
        FROM region_q36 r JOIN nation_q36 n ON n.n_regionkey = r.r_regionkey
        GROUP BY r_name
        """
    )


@register(
    "q37_variant_event_props",
    oracle=f"""
SELECT CAST({try_json_k_sql("props", "INT")} // 10 AS INT) AS k_decile,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min({try_json_k_sql("props", "INT")}) AS INT) AS k_min,
       CAST(max({try_json_k_sql("props", "INT")}) AS INT) AS k_max
FROM events
GROUP BY 1
""",
)
def q37_variant_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via the VARIANT type (Spark 4):
    try_parse_json once into VARIANT's binary-shredded form, then typed
    path access with try_variant_get. At scale this is the schema-on-read
    pattern for heterogeneous event payloads -- parse once, access
    structurally, no per-query JSON string re-parsing. The try_ variants
    are the production forms: real streams carry malformed payloads
    (r15 jsonx axis) and the non-try forms RAISE mid-job on the first
    truncated record; policy = anything VARIANT refuses yields NULL
    (catalog.try_json_k_sql is the oracle twin)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "q38_robust_stats",
    oracle="""
SELECT l_returnflag,
       round(CAST(median(l_extendedprice) AS DOUBLE), 3) AS median_price,
       CAST(mode(least(l_linenumber, 3)) AS BIGINT) AS mode_linegroup,
       round(CAST(quantile_disc(l_quantity, 0.25) AS DOUBLE), 2) AS q25_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def q38_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group statistics: exact median, mode, and discrete
    25th percentile.

    Hash-stability notes: an even-count median of 2-decimal prices is the
    mean of two such values -- ALWAYS ending in .xx0/.xx5 -- so rounding
    at 2 decimals would sit exactly on the round-half boundary where
    Spark's and DuckDB's double rounding can disagree; rounding at 3 is
    exact (the value has at most 3 decimals). mode() is only stable when
    the maximum is unique, and the synthetic linenumbers are near-uniform,
    so the mode is taken over least(l_linenumber, 3): the collapsed bucket
    holds ~5/7 of rows, dominant by construction. percentile_disc returns
    an actual data value (no interpolation), so the engines agree exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_q38")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(CAST(median(l_extendedprice) AS DOUBLE), 3) AS median_price,
               CAST(mode(least(l_linenumber, 3)) AS BIGINT) AS mode_linegroup,
               round(CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS DOUBLE), 2) AS q25_qty
        FROM lineitem_q38
        GROUP BY l_returnflag
        """
    )


@register(
    "q40_gap_fill_daily",
    oracle="""
WITH b AS (
  SELECT event_type, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY event_type
), spine AS (
  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM b
), daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n, (sum(CASE WHEN (abs(value) <= 1000000000000.0) THEN CAST(round(value * 100) AS BIGINT) END) / 1e2) AS v
  FROM events GROUP BY 1, 2
)
SELECT s.event_type,
       strftime(s.day, '%Y-%m-%d') AS day,
       coalesce(d.n, 0) AS n,
       coalesce(last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY s.event_type ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS v_filled
FROM spine s LEFT JOIN daily d ON d.event_type = s.event_type AND d.day = s.day
""",
)
def q40_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar densification + forward fill, the imputation pattern of a
    feature/training pipeline: per event_type, a complete daily spine via
    sequence()+explode, left-joined to daily aggregates, gaps carried
    forward with last(..., ignorenulls=True) over an unbounded-preceding
    frame. The spine generation is an O(|keys| x days) Generate -- no
    driver loop -- and the fill is one partitioned window, no self-join."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    bounds = ev.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"), cents_sum_spark("value").alias("v")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce(F.last("v", ignorenulls=True).over(w), F.lit(0.0)).alias("v_filled"),
        )
    )


@register(
    "q41_range_frame_trailing_spend",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS INT) AS day,
       CAST(count(*) OVER w AS BIGINT) AS n_28d,
       (sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w / 1e2) AS spend_28d
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey
  ORDER BY CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS INT)
  RANGE BETWEEN 27 PRECEDING AND CURRENT ROW
)
""",
)
def q41_range_frame_trailing_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based window): per customer, order count and
    spend over the trailing 28 DAYS -- not the trailing 28 rows. The frame
    is defined on the day offset, so same-day peer rows always aggregate
    together and the result is deterministic under any tie order (a ROWS
    frame would not be). One shuffle on the partition key; the frame scan
    is a single sorted pass per partition."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("day"))
        .rangeBetween(-27, Window.currentRow)
    )
    return (
        orders.select("o_orderkey", "o_custkey", day.alias("day"), "o_totalprice")
        .select(
            "o_orderkey",
            "o_custkey",
            "day",
            F.count(F.lit(1)).over(w).alias("n_28d"),
            # exact cents window sum (r13 money-sum discipline)
            (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w) / F.lit(1e2)).alias("spend_28d"),
        )
    )


@register(
    "q42_try_arithmetic",
    oracle=f"""
WITH t AS (
  SELECT c_mktsegment,
         TRY_CAST(CAST(c_custkey AS VARCHAR) ||
                  CASE WHEN c_custkey % 7 = 0 THEN 'x' ELSE '' END AS BIGINT) AS parsed,
         CASE WHEN c_custkey % 10 = 0 THEN NULL
              ELSE c_acctbal / (c_custkey % 10) END AS ratio
  FROM customer
)
SELECT c_mktsegment,
       CAST(count(*) FILTER (WHERE parsed IS NULL) AS BIGINT) AS n_bad,
       CAST(sum(parsed) AS BIGINT) AS sum_parsed,
       {grid_mean_sql('ratio', 252000, 2)} AS avg_ratio
FROM t GROUP BY c_mktsegment
""",
)
def q42_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling: Spark 4 runs ANSI mode by default, where a
    bad cast or division by zero FAILS the job -- try_cast/try_divide are
    the row-level null-on-error escape valves (the dirty-data path of any
    large ingest). Every 7th customer key gets a poisoned numeric string;
    every 10th hits a zero divisor. The oracle mirrors the null semantics
    with portable CASE/TRY_CAST."""
    cust = load_table(spark, sf_dir, "customer")
    poisoned = F.concat(
        F.col("c_custkey").cast("string"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("x")).otherwise(F.lit("")),
    )
    t = cust.select(
        "c_mktsegment",
        poisoned.try_cast("bigint").alias("parsed"),
        F.try_divide(F.col("c_acctbal"), F.nullif(F.col("c_custkey") % 10, F.lit(0))).alias(
            "ratio"
        ),
    )
    return t.groupBy("c_mktsegment").agg(
        F.count(F.when(F.col("parsed").isNull(), 1)).alias("n_bad"),
        F.sum("parsed").alias("sum_parsed"),
        # ratio = cents/d, d in 1..9: exact on the 1/252000 grid
        # (100 * lcm(1..9)) -> integer-grid mean (r11, t14 lesson)
        grid_mean_spark("ratio", 252000, 2).alias("avg_ratio"),
    )


@register(
    "q43_bitmap_distinct",
    oracle="""
SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
FROM lineitem GROUP BY l_returnflag
""",
)
def q43_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmap buckets (Spark 4
    bitmap_* aggregates): values hash into fixed-size bucket bitmaps
    (bitmap_bucket_number / bitmap_bit_position), per-bucket bitmaps OR
    together under partial aggregation, and the final count is a sum of
    popcounts. Unlike count(DISTINCT) -- a full shuffle of every distinct
    value -- the shuffle carries one 4KB bitmap per (group, bucket), and
    the partials are STORABLE: materialize them daily and re-aggregate
    across any date range without touching raw data. Verified exact
    against the count(DISTINCT) oracle."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_partkey")
    buckets = li.groupBy(
        "l_returnflag", F.bitmap_bucket_number(F.col("l_partkey")).alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position(F.col("l_partkey"))).alias("bm"))
    return buckets.groupBy("l_returnflag").agg(
        F.sum(F.bitmap_count("bm")).alias("n_parts")
    )


@register("q44_hll_sketch_distinct", oracle=None, rows_only=True)
def q44_hll_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL (Spark 4 hll_sketch_agg / hll_union):
    approximate distinct customers per priority, plus a MERGED sketch
    across two disjoint date halves via hll_union -- the re-aggregatable
    form approx_count_distinct lacks (HLL++ there returns a number;
    sketches return state you can store and union later, the 100 TB
    rollup pattern). Estimates are implementation-defined -> rows-only
    check here; the error bound vs exact is pinned in
    tests/test_batch_queries.py::test_hll_sketch_error.

    ROWS-ONLY BY CONSTRUCTION: CORRECTNESS_r0N reports `err: no_oracle`
    for this entry every round it is sampled -- by design (DataSketches
    HLL binary sketches are not reproducible in DuckDB), not a failure.
    q24_distinct_counts is the exact-count twin.

    SELF-VALIDATING (r15, same upgrade as the ALS family): every row
    carries rel_err (the merged-sketch estimate vs the in-engine EXACT
    distinct for that priority) and err_ok (rel_err <= 5%; the lgK=12
    default's expected error is ~1.6%). err_ok=false RAISES, so the
    driver's rows-only record certifies the sketch's accuracy contract,
    not just rows>0."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey", "o_orderdate"
    )
    half = F.when(F.year("o_orderdate") < 1996, "early").otherwise("late")
    halves = orders.groupBy("o_orderpriority", half.alias("half")).agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = halves.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_custs")
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.count_distinct("o_custkey").alias("_exact")
    )
    out = (
        merged.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "approx_custs",
            F.when(
                F.col("_exact") > 0,
                F.round(
                    F.abs(F.col("approx_custs") - F.col("_exact"))
                    / F.col("_exact"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rel_err"),
        )
        .withColumn("err_ok", F.col("rel_err") <= 0.05)
        .orderBy("o_orderpriority")
    )
    bad = out.filter(~F.col("err_ok")).count()
    assert bad == 0, f"q44 self-validation failed: {bad} priorities exceed 5% rel_err"
    return out


_RECURSIVE_SQL = """
WITH RECURSIVE mo(mi, hi){maxrec} AS (
  SELECT mn, mx FROM (
    SELECT CAST(min(year(o_orderdate) * 12 + month(o_orderdate)) AS INT) AS mn,
           CAST(max(year(o_orderdate) * 12 + month(o_orderdate)) AS INT) AS mx
    FROM {orders}
  )
  UNION ALL
  SELECT mi + 1, hi FROM mo WHERE mi < hi
),
monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS mi,
         CAST(count(*) AS BIGINT) AS n_orders,
         (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 1e2) AS revenue
  FROM {orders} GROUP BY 1
)
SELECT mo.mi, coalesce(m.n_orders, 0) AS n_orders,
       coalesce(m.revenue, 0.0) AS revenue
FROM mo LEFT JOIN monthly m ON m.mi = mo.mi
"""


# Engine-side recursion ceiling: Spark 4 defaults WITH RECURSIVE to 100
# levels and q45's depth is the data's month span -- ~85 on sane orders,
# but a single year-2262 order date (r14 timex axis) stretches it to
# thousands and the query dies RECURSION_LEVEL_LIMIT_EXCEEDED while
# DuckDB runs the identical SQL fine. 120_000 months (10k years) covers
# the full representable date range, so the spine is bounded by the TYPE,
# not by a magic number; the clause is Spark-only dialect (DuckDB has no
# recursion cap to raise).
_Q45_MAX_LEVELS = 120_000


@register("q45_recursive_month_spine", oracle=_RECURSIVE_SQL.format(orders="orders", maxrec=""))
def q45_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.0's recursive CTE): a complete month spine
    unrolled by linear recursion from the min to the max order month --
    the bounds ride along in the working table so the recursive term
    needs no subquery -- left-joined to monthly aggregates. The oracle is
    the IDENTICAL recursive SQL in DuckDB (minus the Spark-only MAX
    RECURSION LEVEL clause, see _Q45_MAX_LEVELS). Recursion depth = month
    span (~85 on sane dates), each step a one-row working set: the engine
    executes it as an iterative union, not a self-join explosion."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_q45")
    return spark.sql(
        _RECURSIVE_SQL.format(
            orders="orders_q45",
            maxrec=f" MAX RECURSION LEVEL {_Q45_MAX_LEVELS}",
        )
    )


@register(
    "q46_array_hof_top3",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey,
         CAST(count(*) AS BIGINT) AS n_items,
         list_sort(list(l_extendedprice), 'DESC') AS prices,
         sum(l_extendedprice) AS total
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey, n_items,
       round(list_aggregate(prices[1:3], 'sum'), 2) AS top3_sum,
       round(list_aggregate(prices[1:3], 'sum') / total, 4) AS top3_share
FROM per_order
""",
)
def q46_array_hof_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions as first-class relational surface:
    collect per-order prices, sort descending (array_sort + comparator),
    slice the top 3, fold with aggregate() -- all inside whole-stage
    codegen, no Python and no second shuffle (the per-group sort happens
    inside already-grouped rows, unlike a window rank which would shuffle
    again). Slicing 3 sorted doubles is order-deterministic, so the fold
    is bit-stable and hash-matches DuckDB's list_aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.reverse(F.array_sort(F.collect_list("l_extendedprice"))).alias("prices"),
        F.sum("l_extendedprice").alias("total"),
    )
    top3_sum = F.aggregate(
        F.slice("prices", 1, 3), F.lit(0.0), lambda acc, x: acc + x
    )
    return per_order.select(
        "l_orderkey",
        "n_items",
        F.round(top3_sum, 2).alias("top3_sum"),
        F.round(top3_sum / F.col("total"), 4).alias("top3_share"),
    )


@register(
    "q47_map_type_roundtrip",
    oracle="""
WITH per_nation AS (
  SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_cust
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY r_name, n_name
), per_region AS (
  SELECT r_name, CAST(sum(n_cust) AS BIGINT) AS total
  FROM per_nation GROUP BY r_name
)
SELECT p.r_name, p.n_name,
       round(100.0 * p.n_cust / t.total, 2) AS pct
FROM per_nation p JOIN per_region t USING (r_name)
""",
)
def q47_map_type_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface beyond P6's literal lookup: build a real
    map per region (map_from_entries over collected nation counts),
    rewrite values with the map HOF transform_values (count -> percent of
    the region total, computed from aggregate() over map_values), then
    explode back to rows. The map never leaves the executor -- one shuffle
    to group, everything else is per-row expression work -- and the oracle
    states the same result relationally, pinning that the map round-trip
    loses nothing."""
    cust = load_table(spark, sf_dir, "customer").select("c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    per_nation = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    as_map = per_nation.groupBy("r_name").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("n_name", "n_cust")))
        ).alias("m")
    )
    total = F.aggregate(F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    pcts = as_map.select(
        "r_name",
        F.transform_values(
            "m", lambda k, v: F.round(100.0 * v / total, 2)
        ).alias("m"),
    )
    return pcts.select("r_name", F.explode("m").alias("n_name", "pct"))


@register(
    "q48_training_data_pipeline",
    oracle=r"""
WITH fp AS (
  SELECT doc_id, lang, source, text,
         ('0x'||substr(md5(lower(regexp_replace(trim(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))),1,15))::UBIGINT::BIGINT AS f
  FROM documents
), keep AS (
  SELECT min(doc_id) AS doc_id FROM fp GROUP BY f
), kept AS (
  SELECT fp.* FROM fp JOIN keep USING (doc_id)
), q AS (
  SELECT lang, source, doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' ')))::DOUBLE
           / len(string_split(text, ' ')) AS dr
  FROM kept
), filt AS (
  SELECT * FROM q WHERE n_tokens >= 20 AND dr >= 0.5
)
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(*) FILTER (
         WHERE (('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,8))::UBIGINT)::BIGINT % 10 = 0
       ) AS BIGINT) AS n_sampled
FROM filt GROUP BY lang, source
""",
)
def q48_training_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The operators COMPOSED as one end-to-end training-data pipeline:
    exact dedup (min doc_id per normalized fingerprint, aggregate-then-
    semi-join so the payload never shuffles twice) -> quality gate
    (token count + distinct-token ratio) -> deterministic 10% md5-hash
    sample count, rolled up per (lang, source) -- corpus curation as a
    single declarative plan, every stage oracle-verified through the
    same portable md5 hashing the standalone d01/t01/q28 queries pin."""
    from ..functions.text import (
        distinct_token_count,
        doc_fingerprint,
        md5_hash32,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "lang", "source", "text", doc_fingerprint(F.col("text")).alias("f")
    )
    keep = fp.groupBy("f").agg(F.min("doc_id").alias("doc_id"))
    kept = fp.join(keep.select("doc_id"), "doc_id")
    q = kept.select(
        "lang",
        "source",
        "doc_id",
        token_count("text").alias("n_tokens"),
        (distinct_token_count("text") / token_count("text")).alias("dr"),
    )
    filt = q.filter((F.col("n_tokens") >= 20) & (F.col("dr") >= 0.5))
    sampled = (md5_hash32(F.col("doc_id").cast("string")) % 10 == 0).cast("int")
    return filt.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(sampled).cast("long").alias("n_sampled"),
    )


@register(
    "q39_udtf_doc_chunks",
    # per-IDENTITY aggregation: the engine's LATERAL fan-out groups by
    # doc_id, so duplicate doc rows (r13 dupx) sum into one row per id --
    # the oracle aggregates identically (identical on duplicate-free data)
    oracle="""
SELECT doc_id,
       CAST(sum(ceil(length(text) / 80.0)) AS BIGINT) AS n_chunks,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM documents
WHERE length(text) > 0
GROUP BY doc_id
""",
)
def q39_udtf_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): fixed-width document chunker
    via a TABLE-argument call -- the chunking primitive of an LLM-training
    pipeline as a first-class relational operator. The oracle recomputes
    chunk counts arithmetically from text length, so the UDTF's row
    fan-out is value-checked end to end. Arrow-batched: one Python worker
    pass per partition, not per row.

    TABLE argument, NOT a correlated LATERAL: the lateral form joins each
    emitted chunk row back to its PARENT row, duplicating the raw text
    per chunk -- O(len^2) bytes per document, found by the r13 longstr
    variant (a 1 MiB doc emits ~13k chunks x 1 MiB of parent payload and
    the query ran for hours). The TABLE-argument UDTF emits its own key,
    so nothing fans out but the 80-char pieces."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_id int, piece string")
    class Chunk80:
        def eval(self, row):
            text = row.text
            if not text:
                return
            for i in range(0, len(text), 80):
                yield (row.doc_id, i // 80, text[i : i + 80])

    spark.udtf.register("chunk80", Chunk80)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents_q39")
    return spark.sql(
        """
        SELECT c.doc_id,
               count(*) AS n_chunks,
               sum(length(c.piece)) AS n_chars
        FROM chunk80(TABLE(
          SELECT doc_id, text FROM documents_q39 WHERE length(text) > 0
        )) c
        GROUP BY c.doc_id
        """
    )
