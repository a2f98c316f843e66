"""Bucketed co-located joins (the SURVEY section 4 'pre-partitioning'
scale lever): two tables bucketed on the join key must join WITHOUT a
shuffle exchange, and produce identical results to the shuffled join."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf -- managed tables land in
    # ./spark-warehouse (gitignored). The in-memory catalog forgets tables
    # between sessions but their directories persist: clear leftovers or
    # saveAsTable fails with LOCATION_ALREADY_EXISTS.
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bkt", "ord_bkt"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bkt")
    )
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("ord_bkt")
    )
    return spark.table("li_bkt"), spark.table("ord_bkt")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li, orders = bucketed
    # disable broadcast so the join strategy decision is about shuffles
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_shuffled_join(spark, sf_dir, bucketed):
    li, orders = bucketed
    bucketed_out = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain_li = load_table(spark, sf_dir, "lineitem")
    plain_orders = load_table(spark, sf_dir, "orders")
    plain_out = (
        plain_li.join(plain_orders, plain_li.l_orderkey == plain_orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = {(r["o_custkey"], r["n"]) for r in bucketed_out.collect()}
    b = {(r["o_custkey"], r["n"]) for r in plain_out.collect()}
    assert a == b
