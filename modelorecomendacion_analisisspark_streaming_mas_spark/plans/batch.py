"""Batch query catalog (SURVEY.md section 2) over the driver testdata.

Each query re-expresses a reference operator pattern on the TPC-H-ish star
schema (FIXTURES.md section 7 mapping: part/customer = movies/users dims,
lineitem/orders = ratings fact, events = streams) and carries a DuckDB
oracle twin.

Determinism rules (see plans/catalog.py): identical aliases both sides,
doubles rounded after aggregation, rankings always tie-broken by a unique
key, computed integers cast to BIGINT on both sides.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import cents_sum_spark

from ..functions.etl import (
    collect_lookup_map,
    map_lookup,
    range_lookup_join,
    ts_to_ddmmyyyy,
    when_chain,
)
from ..operators.topk import global_rank, grouped_top_k, top_k
from ..sources.readers import load_table
from .catalog import (
    disc_money_sum_spark,
    disc_money_sum_sql,
    grid_mean_spark,
    grid_mean_sql,
    money_mean_sql,
    money_mean_spark,
    money_sum_spark,
    money_sum_sql,
    register,
    try_json_k_sql,
)

# --------------------------------------------------------------------------
# q01: TPC-H Q1-shaped pricing summary.
# Operators: A1/A2 groupBy+agg, A4 mean, A6 count, F7 arithmetic, P3 filter.
# Reference pattern: groupBy(...).agg(count) chains
# (Explorativa/Explorativa2.ipynb:137-139) + F.mean (:357).
# Scale: partial+final hash agg, filter pushed to parquet scan; one shuffle
# on a low-cardinality key (6 groups) -- optimal.
# --------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       (sum(CAST(round(l_quantity * 100) AS BIGINT)) / 1e2) AS sum_qty,
       {money_sum_sql('l_extendedprice')}                   AS sum_base_price,
       {disc_money_sum_sql()}                               AS sum_disc_price,
       {grid_mean_sql('l_quantity', 1, 2)}                  AS avg_qty,
       {grid_mean_sql('l_discount', 100, 4)}                AS avg_disc,
       count(*)                                             AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # exact grid sums (r13: engine-order double sums flip cents
            # under multiplicity/scale -- catalog.money_sum_spark)
            money_sum_spark("l_quantity").alias("sum_qty"),
            money_sum_spark("l_extendedprice").alias("sum_base_price"),
            disc_money_sum_spark().alias("sum_disc_price"),
            # integer-grid means (quantities integral, discounts 2dp):
            # engine-independent at exact half-units (r11, t14 lesson)
            grid_mean_spark("l_quantity", 1, 2).alias("avg_qty"),
            grid_mean_spark("l_discount", 100, 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q02: FLAGSHIP -- the reference's ETL -> join -> top-100 -> explode ->
# per-group rank pipeline (Explorativa/Explorativa2.ipynb cells 2-3:
# top-100 movies by rating count, explode genres, per-genre rank) mapped to
# parts/lineitem: per-part line count, top-100 parts, explode p_name
# tokens, per-token top-3.
# Operators: J1 fact-dim join, A2 agg+alias, O3 sort+limit (TakeOrdered),
# L1/L2 explode, W2 partitioned row_number, P1 projection.
# Scale: aggregate BEFORE the join (fact collapses to one row per part, so
# the join input is dim-sized); dim side broadcast; the ranking window only
# ever sees 100*tokens rows.
# --------------------------------------------------------------------------


@register(
    "q02_flagship_top_tokens",
    oracle="""
WITH cnt AS (
  SELECT l_partkey, count(*) AS num_lines FROM lineitem GROUP BY l_partkey
), top100 AS (
  SELECT p.p_partkey, p.p_name, c.num_lines
  FROM cnt c JOIN part p ON p.p_partkey = c.l_partkey
  ORDER BY c.num_lines DESC, p.p_partkey
  LIMIT 100
), tok AS (
  SELECT p_partkey, p_name, num_lines, unnest(string_split(p_name, ' ')) AS token
  FROM top100
)
SELECT token, p_partkey, p_name, num_lines,
       CAST(ROW_NUMBER() OVER (PARTITION BY token ORDER BY num_lines DESC, p_partkey) AS BIGINT) AS rn
FROM tok
QUALIFY rn <= 3
""",
)
def q02_flagship_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")

    cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("num_lines"))
    top100 = top_k(
        cnt.join(F.broadcast(part), cnt.l_partkey == part.p_partkey).select(
            "p_partkey", "p_name", "num_lines"
        ),
        100,
        F.desc("num_lines"),
        F.asc("p_partkey"),
    )
    tok = top100.select(
        "p_partkey", "p_name", "num_lines", F.explode(F.split("p_name", " ")).alias("token")
    )
    ranked = grouped_top_k(
        tok, ["token"], [F.desc("num_lines"), F.asc("p_partkey")], k=3, rank_col="rn"
    )
    return ranked.select(
        "token", "p_partkey", "p_name", "num_lines", F.col("rn").cast("long").alias("rn")
    )


# --------------------------------------------------------------------------
# q03: global ranking with position column -- the reference's unpartitioned
# row_number (W1, Explorativa/Explorativa2.ipynb:133-139), made scale-safe
# by bounding through TakeOrdered first (operators/topk.py:global_rank).
# --------------------------------------------------------------------------


@register(
    "q03_global_rank_customers",
    oracle="""
WITH oc AS (
  SELECT o_custkey, count(*) AS num_orders FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, oc.num_orders,
       CAST(ROW_NUMBER() OVER (ORDER BY oc.num_orders DESC, c.c_custkey) AS BIGINT) AS posicion
FROM oc JOIN customer c ON c.c_custkey = oc.o_custkey
QUALIFY posicion <= 100
""",
)
def q03_global_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("num_orders"))
    joined = oc.join(customer, oc.o_custkey == customer.c_custkey).select(
        "c_custkey", "c_name", "num_orders"
    )
    ranked = global_rank(
        joined, [F.desc("num_orders"), F.asc("c_custkey")], rank_col="posicion", limit=100
    )
    return ranked.withColumn("posicion", F.col("posicion").cast("long"))


# --------------------------------------------------------------------------
# q04: multi-hop star join (J1: ratings ⋈ movies ⋈ users denormalization,
# Explorativa/Explorativa1_pyspark.ipynb:362-365) -- fact joined through
# orders -> customer -> nation -> region, revenue per region/nation.
# Scale: nation/region broadcast; lineitem⋈orders co-shuffled on orderkey;
# AQE converts the customer join to broadcast when it fits.
# --------------------------------------------------------------------------


@register(
    "q04_star_join_revenue",
    oracle=f"""
SELECT r.r_name, n.n_name,
       count(*)                                              AS num_lines,
       {disc_money_sum_sql('l.l_extendedprice', 'l.l_discount')} AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q04_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    region = load_table(spark, sf_dir, "region")

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("num_lines"),
        # exact 1e-4-grid revenue sum: the r13 dupx sweep caught the
        # double sum flipping a cent between engines at x10 multiplicity
        disc_money_sum_spark().alias("revenue"),
    )


# --------------------------------------------------------------------------
# q05: CASE WHEN bucketing (P4/P5 -- the age-bin chains at
# app3/live_counts.py:52-61 and Explorativa1_pyspark.ipynb:258-266) applied
# to customer balances, counted per bucket x segment.
# --------------------------------------------------------------------------

BALANCE_BINS = [
    (None, 0.0, "negative"),
    (0.0, 2500.0, "low"),
    (2500.0, 7500.0, "mid"),
    (7500.0, None, "high"),
]


@register(
    "q05_balance_buckets",
    oracle=f"""
SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
            WHEN c_acctbal < 2500 THEN 'low'
            WHEN c_acctbal < 7500 THEN 'mid'
            ELSE 'high' END      AS balance_bin,
       c_mktsegment,
       count(*)                  AS n_customers,
       {money_mean_sql('c_acctbal')} AS avg_balance
FROM customer
GROUP BY balance_bin, c_mktsegment
""",
)
def q05_balance_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    binned = customer.withColumn("balance_bin", when_chain(F.col("c_acctbal"), BALANCE_BINS))
    return binned.groupBy("balance_bin", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        # integer-cents mean, no double round() (see catalog.money_mean_spark)
        money_mean_spark("c_acctbal").alias("avg_balance"),
    )


# --------------------------------------------------------------------------
# q06: literal-map lookup (P6: occupation code -> label via create_map +
# element_at, Explorativa1_pyspark.ipynb:252-256,283). The tiny region dim
# is collected to a driver dict (5 rows) exactly like the reference's
# hardcoded dict, then applied as a map literal.
# --------------------------------------------------------------------------


@register(
    "q06_map_lookup_regions",
    # the engine side is a LOOKUP (collected key->name map: one value per
    # key by construction), so the oracle joins a DEDUPED dim -- under
    # duplicate dim rows (the r13 dupx variant) a raw join would fan each
    # nation out x(copies), which lookup semantics never do. Identical on
    # key-unique dims.
    oracle="""
SELECT r.r_name AS region_name, count(*) AS n_nations
FROM nation n
JOIN (SELECT DISTINCT r_regionkey, r_name FROM region) r
  ON n.n_regionkey = r.r_regionkey
GROUP BY region_name
""",
)
def q06_map_lookup_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    # Guarded collect: fails loudly toward a broadcast join if the dim
    # ever outgrows map-literal territory (functions/etl.py).
    mapping = {
        int(k): v
        for k, v in collect_lookup_map(region, "r_regionkey", "r_name").items()
    }
    return (
        nation.withColumn("region_name", map_lookup(mapping, "n_regionkey"))
        .groupBy("region_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


# --------------------------------------------------------------------------
# q07: regex/string ETL (F1 regexp_extract, F3 split, P2 withColumn, P7
# cast -- the title-year/genre ETL at Explorativa1_pyspark.ipynb:90-94)
# applied to part: brand number extraction + name tokenization.
# --------------------------------------------------------------------------


@register(
    "q07_regex_brand_etl",
    oracle=f"""
SELECT CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS BIGINT) AS brand_num,
       count(*)                                         AS n_parts,
       count(DISTINCT string_split(p_name, ' ')[1])     AS n_first_words,
       {money_mean_sql('p_retailprice')} AS avg_price
FROM part
GROUP BY brand_num
""",
)
def q07_regex_brand_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    etl = part.withColumn(
        "brand_num", F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("long")
    ).withColumn("first_word", F.element_at(F.split("p_name", " "), 1))
    return etl.groupBy("brand_num").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("first_word").alias("n_first_words"),
        # prices are money (exactly 2dp): integer-cents mean with integer
        # half-away rounding -- engine-independent by construction, where
        # round(avg(x), 2) diverges under drift both via engine-order
        # double sums AND via the two engines' round() at exact
        # half-cents (see catalog.money_mean_spark)
        money_mean_spark("p_retailprice").alias("avg_price"),
    )


# --------------------------------------------------------------------------
# q08: date formatting (F4: epoch -> dd/MM/yyyy string,
# Explorativa1_pyspark.ipynb:360 -- the reference keeps dates as strings)
# -- daily event rollup keyed by the formatted string.
# --------------------------------------------------------------------------


@register(
    "q08_daily_events",
    oracle="""
SELECT strftime(ts, '%d/%m/%Y') AS day_str,
       event_type,
       count(*)                  AS n_events,
       (sum(CASE WHEN (abs(value) <= 1000000000000.0) THEN CAST(round(value * 100) AS BIGINT) END) / 1e2)      AS sum_value
FROM events
GROUP BY day_str, event_type
""",
)
def q08_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("day_str", ts_to_ddmmyyyy("ts"))
        .groupBy("day_str", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            cents_sum_spark("value").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# q09: quantiles (A5: approxQuantile median with error 0.0 at
# Explorativa/Explorativa2.ipynb:358 == the exact percentile; expressed with
# F.percentile so the oracle's quantile_cont matches bit-for-bit after
# rounding).
# --------------------------------------------------------------------------


@register(
    "q09_quantiles",
    oracle=f"""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4)      AS median_qty,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
       {grid_mean_sql('l_extendedprice', 100, 4)}    AS mean_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q09_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        # 2dp money on the integer grid (r11, t14 lesson)
        grid_mean_spark("l_extendedprice", 100, 4).alias("mean_price"),
    )


# --------------------------------------------------------------------------
# q10: exact key-dedup (A7: dropDuplicates(['userId','filmId']) before ALS,
# Modelo/Crear modelo.ipynb:89) -- distinct (order, part) pairs, then a
# deterministic histogram so the surviving-row lottery can't affect values.
# --------------------------------------------------------------------------


@register(
    "q10_dedup_pairs_histogram",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), per_order AS (
  SELECT l_orderkey, count(*) AS parts_per_order FROM pairs GROUP BY l_orderkey
)
SELECT parts_per_order, count(*) AS num_orders
FROM per_order
GROUP BY parts_per_order
""",
)
def q10_dedup_pairs_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_orderkey", "l_partkey").dropDuplicates(["l_orderkey", "l_partkey"])
    per_order = pairs.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("parts_per_order"))
    return per_order.groupBy("parts_per_order").agg(F.count(F.lit(1)).alias("num_orders"))


# --------------------------------------------------------------------------
# q11: set operations (O8 unionByName for the vertex sets at
# GraphFrames_prueba/Explorativa3.ipynb:94; intersect/except are the
# SURVEY 2.7 "not present but built-in" row) over nation-key sets.
# --------------------------------------------------------------------------


@register(
    "q11_set_ops_nationkeys",
    oracle="""
SELECT 'union' AS op, count(*) AS n
FROM (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect', count(*)
FROM (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except', count(*)
FROM (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
""",
)
def q11_set_ops_nationkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k")).distinct()
    parts = [
        ("union", c.unionByName(s).distinct()),
        ("intersect", c.intersect(s)),
        ("except", c.exceptAll(s)),
    ]
    counted = [
        df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(tag).alias("op"), "n")
        for tag, df in parts
    ]
    return reduce(lambda a, b: a.unionByName(b), counted)


# --------------------------------------------------------------------------
# q12: null handling (P8: fillna({'state':'Other'}) at
# Explorativa1_pyspark.ipynb:287, dropna at Modelo/Crear modelo.ipynb:85)
# -- customers left-joined to order counts, nulls filled, bucketed.
# --------------------------------------------------------------------------


@register(
    "q12_null_fill_activity",
    oracle="""
WITH oc AS (
  SELECT o_custkey, count(*) AS num_orders FROM orders GROUP BY o_custkey
), j AS (
  SELECT c.c_mktsegment, COALESCE(oc.num_orders, 0) AS num_orders
  FROM customer c LEFT JOIN oc ON c.c_custkey = oc.o_custkey
)
SELECT c_mktsegment,
       CASE WHEN num_orders = 0 THEN 'inactive'
            WHEN num_orders < 10 THEN 'light'
            ELSE 'heavy' END AS activity,
       count(*) AS n_customers
FROM j
GROUP BY c_mktsegment, activity
""",
)
def q12_null_fill_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    oc = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("num_orders"))
    joined = customer.join(oc, customer.c_custkey == oc.o_custkey, "left").na.fill(
        {"num_orders": 0}
    )
    binned = joined.withColumn(
        "activity",
        F.when(F.col("num_orders") == 0, "inactive")
        .when(F.col("num_orders") < 10, "light")
        .otherwise("heavy"),
    )
    return binned.groupBy("c_mktsegment", "activity").agg(F.count(F.lit(1)).alias("n_customers"))


# --------------------------------------------------------------------------
# q13: global top-k (O3: orderBy(desc).limit at
# Explorativa/Explorativa2.ipynb:190, app/spark_stream.py:31) -- lowers to
# TakeOrderedAndProject: per-task heaps, no global sort, driver merges k.
# --------------------------------------------------------------------------


@register(
    "q13_top_orders",
    oracle="""
SELECT o_orderkey, round(o_totalprice, 2) AS total, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q13_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top_k(orders, 100, F.desc("o_totalprice"), F.asc("o_orderkey")).select(
        "o_orderkey", F.round("o_totalprice", 2).alias("total"), "o_orderpriority"
    )


# --------------------------------------------------------------------------
# q14: analytic windows with frames (SURVEY 2.6 "not present" row -- the
# lag/lead + rowsBetween extension surface): per-customer running spend and
# previous-order price. Frame order is fully deterministic (date, orderkey)
# so sequential summation matches the oracle bit-for-bit.
# --------------------------------------------------------------------------


@register(
    "q14_running_spend",
    oracle="""
SELECT o_custkey, o_orderkey,
       (sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w / 1e2) AS running_spend,
       round(lag(o_totalprice, 1, 0.0) OVER w, 2) AS prev_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q14_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_frame = (
        Window.partitionBy("o_custkey")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy("o_custkey").orderBy(*order_cols)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # exact cents running sum per frame (r13 money-sum discipline)
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w_frame) / F.lit(1e2)).alias("running_spend"),
        F.round(F.lag("o_totalprice", 1, 0.0).over(w_lag), 2).alias("prev_price"),
    )


# --------------------------------------------------------------------------
# q15: JSON extraction (F5: from_json over Kafka bytes,
# app/spark_stream.py:27, app3/live_counts.py:48-49) -- the events table's
# props JSON parsed with an explicit schema, aggregated per event type.
# --------------------------------------------------------------------------


@register(
    "q15_json_props",
    oracle=f"""
SELECT event_type,
       count(*)                                               AS n,
       {grid_mean_sql(try_json_k_sql("props", "BIGINT"), 1, 2)} AS avg_k,
       max({try_json_k_sql("props", "BIGINT")}) AS max_k
FROM events
GROUP BY event_type
""",
)
def q15_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # try-VARIANT semantics, not bare from_json: Spark 4 under ANSI mode
    # RAISES on malformed records in from_json, and real event streams
    # carry malformed payloads (r15 jsonx axis: truncated, duplicate-key,
    # lone-surrogate...). Policy: anything VARIANT refuses -> NULL k,
    # mirrored in the oracle by catalog.try_json_k_sql.
    parsed = events.withColumn(
        "k", F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        grid_mean_spark("k", 1, 2).alias("avg_k"),
        F.max("k").alias("max_k"),
    )


# --------------------------------------------------------------------------
# q16: per-group top-k (W2: per-genre best movie,
# Explorativa/Explorativa2.ipynb:195) -- top-5 customers by spend within
# each market segment.
# --------------------------------------------------------------------------


@register(
    "q16_segment_top_customers",
    oracle="""
WITH spend AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend_c
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment, c.c_custkey, c.c_name,
       s.spend_c / 1e2 AS spend,
       CAST(ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                               ORDER BY s.spend_c DESC, c.c_custkey) AS BIGINT) AS rn
FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
QUALIFY rn <= 5
""",
)
def q16_segment_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rank on the EXACT integer cents sum, not the float sum: two
    # customers with mathematically equal spend would otherwise land one
    # ulp apart per engine (each sums in its own order), swapping rn
    # before the c_custkey tie-break can fire -- the t04/q62 rank-tie
    # class (r11), caught here by the r12 window-sort-key lint. The
    # display divides the exact cents by 1e2, which both engines round
    # to the same nearest double.
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("spend_c")
    )
    joined = spend.join(customer, spend.o_custkey == customer.c_custkey)
    ranked = grouped_top_k(
        joined, ["c_mktsegment"], [F.desc("spend_c"), F.asc("c_custkey")], k=5, rank_col="rn"
    )
    return ranked.select(
        "c_mktsegment",
        "c_custkey",
        "c_name",
        (F.col("spend_c") / F.lit(1e2)).alias("spend"),
        F.col("rn").cast("long").alias("rn"),
    )


# --------------------------------------------------------------------------
# q17: sampling (O6/O7: df.sample before graph algos at
# GraphFrames_prueba/Explorativa3.ipynb:361; randomSplit at Modelo/Crear
# modelo.ipynb:93). Seeded but engine-specific -> no SQL oracle (driver
# records a rows-only check); the pytest suite asserts statistical bounds.
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# q18: range-table lookup join (U1 re-expressed: the reference's
# zip_to_state Python UDF, Explorativa1_pyspark.ipynb:268-287, becomes a
# broadcast non-equi join against an in-memory range table -- S11 + P8).
# --------------------------------------------------------------------------

TIERS = [
    (0.0, 2500.0, "bronze"),
    (2500.0, 5000.0, "silver"),
    (5000.0, 8000.0, "gold"),
    (8000.0, 1.0e18, "platinum"),
]


@register(
    "q18_range_lookup_tiers",
    oracle="""
WITH tiers(tlow, thigh, tier) AS (
  VALUES (0.0, 2500.0, 'bronze'), (2500.0, 5000.0, 'silver'),
         (5000.0, 8000.0, 'gold'), (8000.0, 1e18, 'platinum')
)
SELECT c.c_mktsegment, COALESCE(t.tier, 'Other') AS tier, count(*) AS n
FROM customer c
LEFT JOIN tiers t ON c.c_acctbal >= t.tlow AND c.c_acctbal < t.thigh
GROUP BY c.c_mktsegment, tier
""",
)
def q18_range_lookup_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    tiers = spark.createDataFrame(TIERS, "tlow double, thigh double, tier string")  # S11
    tiered = range_lookup_join(
        customer,
        "c_acctbal",
        tiers,
        "tlow",
        "thigh",
        "tier",
        out_col="tier",
        default="Other",  # negative balances match no range
        high_exclusive=True,
    )
    return tiered.groupBy("c_mktsegment", "tier").agg(F.count(F.lit(1)).alias("n"))


@register("q17_sample_stats", oracle=None, rows_only=True)
def q17_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6/O7: Bernoulli sample + randomSplit row accounting.

    ROWS-ONLY BY CONSTRUCTION: CORRECTNESS_r0N reports `err: no_oracle`
    for this entry every round it is sampled -- by design (Spark's
    XORShiftRandom Bernoulli draw is not reproducible in DuckDB), not a
    failure. q28_hash_sample_stats is the deterministic hash-sample twin
    (hash-exact r5); tests pin the sample-rate bounds.

    SELF-VALIDATING (r15, same upgrade as the ALS family): every row
    carries split_ok (train + test == total, exact), frac_ok (the 5%
    Bernoulli draw lands within 6 binomial sigmas of its expectation --
    vacuous below 100 rows where the CI is wider than the range), and
    seed_stable (re-drawing with the same seed reproduces the count
    exactly). Any False RAISES, so the driver's rows-only record now
    certifies the sampling contract, not just rows>0."""
    # narrow projection: the four counts only need one column's pages
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    sampled = li.sample(withReplacement=False, fraction=0.05, seed=42)
    train, test = li.randomSplit([0.8, 0.2], seed=42)
    n_total = li.count()
    n_sample = sampled.count()
    n_train, n_test = train.count(), test.count()
    split_ok = n_train + n_test == n_total
    sigma = (n_total * 0.05 * 0.95) ** 0.5
    frac_ok = n_total < 100 or abs(n_sample - 0.05 * n_total) <= 6 * sigma + 1
    seed_stable = (
        li.sample(withReplacement=False, fraction=0.05, seed=42).count() == n_sample
    )
    assert split_ok and frac_ok and seed_stable, (
        f"q17 self-validation failed: split_ok={split_ok} frac_ok={frac_ok} "
        f"seed_stable={seed_stable} (total={n_total}, sample={n_sample})"
    )
    return spark.createDataFrame(
        [
            ("sample_5pct", n_sample, split_ok, frac_ok, seed_stable),
            ("split_train", n_train, split_ok, frac_ok, seed_stable),
            ("split_test", n_test, split_ok, frac_ok, seed_stable),
            ("total", n_total, split_ok, frac_ok, seed_stable),
        ],
        "subset string, n long, split_ok boolean, frac_ok boolean, seed_stable boolean",
    )
