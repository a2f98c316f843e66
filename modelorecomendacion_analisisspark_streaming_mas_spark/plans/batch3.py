"""Batch coverage round 3: semi/anti joins (EXISTS / NOT EXISTS) and
explicit GROUPING SETS -- the remaining 'not present' join/agg shapes from
SURVEY sections 2.4/2.5 that q19/q20 (rollup/cube) did not yet pin.

Scale notes: left_semi/left_anti build the same hash/sort-merge plans as
inner joins but never materialize right columns (smaller shuffle payload);
both auto-broadcast when the filtered right side is small. GROUPING SETS
lowers to a single Expand + one hash aggregate -- one scan regardless of
how many sets are requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .catalog import money_sum_spark, register


@register(
    "q29_semi_anti_customers",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers,
       (sum(CAST(round(c_acctbal * 100) AS BIGINT)) / 1e2) AS sum_bal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
""",
)
def q29_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one order but no URGENT order, per segment:
    left_semi (EXISTS) chained with left_anti (NOT EXISTS). Neither join
    carries right-side columns through the shuffle."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum_spark("c_acctbal").alias("sum_bal"),
        )
    )


@register(
    "q30_grouping_sets",
    oracle="""
SELECT coalesce(o_orderpriority, 'ALL') AS pri,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n,
       (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 1e2) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
""",
)
def q30_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by-priority, by-status, grand total) in one
    Expand+HashAggregate pass over a single scan. coalesce('ALL') keeps the
    set-marker rows distinguishable (neither column holds real NULLs)."""
    orders = load_table(spark, sf_dir, "orders")
    if orders.isEmpty():  # SQL-standard () grouping set on empty (see q19)
        return spark.createDataFrame(
            [("ALL", "ALL", 0, None)],
            "pri string, status string, n long, sum_price double",
        )
    orders.createOrReplaceTempView("orders_q30")
    return spark.sql(
        """
        SELECT coalesce(o_orderpriority, 'ALL') AS pri,
               coalesce(o_orderstatus, 'ALL') AS status,
               count(*) AS n,
       (sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 1e2) AS sum_price
        FROM orders_q30
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@register(
    "q31_small_qty_revenue",
    oracle="""
SELECT p_brand, count(*) AS n_lines,
       round((sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 1e2) / 7.0, 2) AS avg_weekly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey)
GROUP BY p_brand
""",
)
def q31_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below half their part's average quantity
    (correlated scalar subquery). Catalyst de-correlates it into one
    aggregate-then-join pass -- the per-part average is a single shuffled
    aggregate reused across all probe rows, never a re-executed subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    li.createOrReplaceTempView("lineitem_q31")
    part.createOrReplaceTempView("part_q31")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_lines,
               round((sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 1e2) / 7.0, 2) AS avg_weekly
        FROM lineitem_q31 l JOIN part_q31 p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
            SELECT 0.5 * avg(l2.l_quantity) FROM lineitem_q31 l2
            WHERE l2.l_partkey = l.l_partkey)
        GROUP BY p_brand
        """
    )
