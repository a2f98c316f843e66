"""Extended batch coverage: grouping sets (rollup/cube) and the as-of
attribution join -- operators the reference lacks but a complete engine
needs (SURVEY sections 2.4/2.5 'not present' rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import asof_attribute
from ..sources.readers import load_table
from .catalog import register


@register(
    "q19_rollup_orders",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def q19_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "q20_cube_lineitem",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q20_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
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
