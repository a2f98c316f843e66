"""Extended batch coverage: grouping sets (rollup/cube) and the as-of
attribution join -- operators the reference lacks but a complete engine
needs (SURVEY sections 2.4/2.5 'not present' rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_attribute
from ..sources.readers import load_table
from .catalog import (
    disc_money_sum_spark,
    disc_money_sum_sql,
    money_mean_sql,
    money_mean_spark,
    money_sum_spark,
    money_sum_sql,
    register,
)


@register(
    "q19_rollup_orders",
    oracle=f"""
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       {money_sum_sql('o_totalprice')} AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def q19_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # SQL standard (and DuckDB): grouping sets containing () yield ONE
    # grand-total row even over an EMPTY relation; Spark's Expand-based
    # rollup yields zero rows there (r12 empty-tables hostile variant).
    # A limit-1 probe special-cases the empty relation without touching
    # the single Expand+HashAggregate plan real data takes.
    if orders.isEmpty():
        return spark.createDataFrame(
            [(None, None, 0, None)],
            "o_orderpriority string, o_orderstatus string, n long, revenue double",
        )
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum_spark("o_totalprice").alias("revenue"),
    )


@register(
    "q20_cube_lineitem",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       (sum(CAST(round(l_quantity * 100) AS BIGINT)) / 1e2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q20_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    if li.isEmpty():  # SQL-standard () grouping set on empty (see q19)
        return spark.createDataFrame(
            [(None, None, 0, None)],
            "l_returnflag string, l_linestatus string, n long, sum_qty double",
        )
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum_spark("l_quantity").alias("sum_qty"),
    )


@register(
    "q21_asof_click_attribution",
    oracle="""
WITH tagged AS (
  SELECT user_id, ts,
         CASE WHEN event_type = 'click' THEN event_id END AS _lid,
         CASE WHEN event_type = 'purchase' THEN event_id END AS _rid
  FROM events WHERE event_type IN ('click', 'purchase')
), attributed AS (
  SELECT *,
         last_value(_lid IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, COALESCE(_lid, _rid)
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS attributed_id
  FROM tagged
)
SELECT _rid AS purchase_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       attributed_id
FROM attributed WHERE _rid IS NOT NULL
""",
)
def q21_asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-click attribution: each purchase joined as-of to the user's most
    recent preceding click (operators/joins.py union+window pattern)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof_attribute(
        clicks, purchases, on="user_id", ts="ts", left_id="event_id", right_id="event_id"
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        "attributed_id",
    )


# --------------------------------------------------------------------------
# q22/q23: skew-mitigation operators -- salted two-phase aggregation and
# salted replicated join. The oracles are the UNSALTED equivalents: salting
# must be result-invisible.
# --------------------------------------------------------------------------


@register(
    "q22_salted_group_count",
    oracle="""
SELECT l_returnflag, count(*) AS n,
       (sum(CAST(round(l_quantity * 100) AS BIGINT)) / 1e2) AS qty
FROM lineitem GROUP BY l_returnflag
""",
)
def q22_salted_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_group_count

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        # integerize BEFORE the two-phase salted sum: long partials are
        # exact in any salt/partition order (r13 money-sum discipline)
        "_qty_c", F.round(F.col("l_quantity") * 100).cast("long")
    )
    out = salted_group_count(
        li, "l_returnflag", salt_from=["l_orderkey", "l_linenumber"], sum_col="_qty_c"
    )
    return out.select(
        "l_returnflag", "n", (F.col("sum__qty_c") / F.lit(1e2)).alias("qty")
    )


@register(
    "q23_salted_join_revenue",
    oracle=f"""
SELECT p.p_brand, count(*) AS n_lines,
       {disc_money_sum_sql('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
""",
)
def q23_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_broadcast_explode_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"), "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_discount",
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), "p_brand"
    )
    joined = salted_broadcast_explode_join(
        li, part, key="k", salt_from=["l_orderkey", "l_linenumber"], n_salts=8
    )
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        disc_money_sum_spark().alias("revenue"),
    )


# --------------------------------------------------------------------------
# q24: distinct-count aggregations. Exact countDistinct carries the oracle;
# approx_count_distinct (HLL++) is engine-specific and is bounded within 5%
# of exact by tests/test_batch_queries.py::test_approx_distinct_error.
# --------------------------------------------------------------------------


@register(
    "q24_distinct_counts",
    oracle="""
SELECT o_orderpriority,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
)
def q24_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------------
# q25: pivot (groupBy().pivot() with a pinned value list -- at scale ALWAYS
# pin values: the two-pass distinct-discovery variant scans the fact twice).
# --------------------------------------------------------------------------


@register(
    "q25_pivot_status",
    oracle="""
SELECT o_orderpriority,
       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F,
       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O,
       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P
FROM orders GROUP BY o_orderpriority
""",
)
def q25_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )


# --------------------------------------------------------------------------
# q26: analytic ranking family -- dense_rank / percent_rank / ntile /
# cume_dist in one partitioned window (SURVEY 2.6 extension surface).
# --------------------------------------------------------------------------


@register(
    "q26_rank_family",
    oracle="""
SELECT o_orderpriority, o_orderkey,
       CAST(dense_rank()   OVER w AS BIGINT) AS drank,
       round(percent_rank() OVER w, 6)       AS prank,
       CAST(ntile(4)       OVER w AS BIGINT) AS quartile,
       round(cume_dist()   OVER w, 6)        AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def q26_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.dense_rank().over(w).cast("long").alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


# --------------------------------------------------------------------------
# q27: lag/lead analytics over each customer's order sequence (SURVEY 2.6
# "not present" row -- analytic offsets + date arithmetic).
# --------------------------------------------------------------------------


@register(
    "q27_lag_lead_orders",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(o_totalprice - lag(o_totalprice) OVER w, 2)  AS delta_prev,
       round(lead(o_totalprice) OVER w - o_totalprice, 2) AS delta_next,
       CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                      CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def q27_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("delta_prev"),
        F.round(F.lead("o_totalprice").over(w) - F.col("o_totalprice"), 2).alias("delta_next"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).cast("long").alias(
            "days_since_prev"
        ),
    )


# --------------------------------------------------------------------------
# q28: DETERMINISTIC hash sampling -- the reproducible twin of q17's
# Bernoulli sample(). At 100 TB, rerunnable pipelines sample by content
# hash (stable across runs, engines, partitionings), not by RNG; the
# md5-bucket filter also pushes into the scan stage. Exact oracle (the
# portable md5 hash is bit-identical in DuckDB).
# --------------------------------------------------------------------------


@register(
    "q28_hash_sample_stats",
    oracle=f"""
SELECT o_orderstatus,
       count(*) AS n_orders,
       {money_mean_sql('o_totalprice')} AS avg_price,
       {money_sum_sql('o_totalprice')} AS sum_price
FROM orders
WHERE (('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::UBIGINT)::BIGINT % 10 = 0
GROUP BY o_orderstatus
""",
)
def q28_hash_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import md5_hash32

    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(md5_hash32(F.col("o_orderkey").cast("string")) % 10 == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # integer-cents mean (see catalog.money_mean_spark)
            money_mean_spark("o_totalprice").alias("avg_price"),
            money_sum_spark("o_totalprice").alias("sum_price"),
        )
    )
