"""Relational query suite over the TPC-H-ish star schema.

Each query is written with the declarative DataFrame API so Catalyst
handles predicate pushdown, column pruning, join reordering and
broadcast selection. ``ORACLE`` holds the DuckDB-SQL twin of every
query (same aliases, same decimal-exact aggregation) for the driver's
correctness gate.

Scale notes (100 TB): dimension tables (region/nation/supplier/
customer/part at TPC-H ratios) are broadcast by Catalyst under the
32 MB threshold — at larger scale AQE converts eligible sort-merge
joins to broadcast at runtime. Fact-fact joins (orders ⋈ lineitem)
shuffle on the join key; AQE skew-join splits oversized partitions.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..functions import DEC, davg, dsum, sql_davg, sql_dsum

# revenue expression, identical double arithmetic in both engines
_REV = "l_extendedprice * (1.0 - l_discount)"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: scan → filter → grouped multi-agg.

    Parity: classic TPC-H Q1 shape (filter cutoff adapted to the
    generated date range).
    """
    # fan_out: scan-stage exact-decimal partial agg is the whole query;
    # a layout-starved scan serializes it (catalog._fan_out, guide §2.2)
    li = load(spark, sf_dir, "lineitem", fan_out=True)
    disc_price = _rev()
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= "2000-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped-orders revenue: 3-way join + agg + deterministic top-10."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking via EXISTS (left-semi join)."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    # proxy for commit-date lateness: any line shipped after the order date
    li = load(spark, sf_dir, "lineitem")
    late = orders.join(
        li, (F.col("o_orderkey") == F.col("l_orderkey")) & (F.col("l_shipdate") > F.col("o_orderdate")), "left_semi"
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: 6-way join, dims broadcast."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")))
        .groupBy("n_name")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-only filter + sum; showcases parquet predicate pushdown."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations, by year."""
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year (no partsupp in the
    schema, so profit = discounted revenue)."""
    part = load(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(dsum(_rev(), "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting: top 20 customers by lost revenue."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-10-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: urgent vs non-urgent line counts by
    return flag (shipmode substitute)."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_shipdate") < "2001-01-01")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of order counts per customer (double aggregation,
    left outer join keeps zero-order customers)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share for one month."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1998-09-01") & (F.col("l_shipdate") < "1998-10-01")
    )
    rev = _rev().cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        (F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double")).alias("promo_revenue")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue: agg + max-join."""
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(dsum(_rev(), "total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(mx, F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier counts per brand/type/size, excluding one brand and
    low-balance suppliers (anti-join + count distinct). Uses lineitem
    as the part↔supplier relation (schema has no partsupp)."""
    part = load(spark, sf_dir, "part").where(F.col("p_brand") != "Brand#5")
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_supp = load(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 100.0)
    return (
        li.join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue: join against per-part avg qty."""
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    li = load(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("l_quantity")).alias("aq")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("aq"))
        .agg((F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: having-filtered agg joined back to
    customer/orders; deterministic top 100."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "sum_qty"))
        .where(F.col("sum_qty") > 300.0)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q19_disjunct_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate join (brand/size/quantity triples)."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(1, 15)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 20)) & (F.col("l_quantity").between(10, 25)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 30)) & (F.col("l_quantity").between(20, 35)))
    )
    return joined.where(cond).agg(dsum(_rev(), "revenue"))


def q22_global_sales_opp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average balance and no orders, per nation
    (anti-join + scalar subquery)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("c_acctbal")).alias("ab")
    )
    return (
        cust.join(avg_bal)
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("n_name")
    )


def w1_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window rank: top-3 customers by order revenue per nation."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    rev = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(dsum("o_totalprice", "revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.col("c_custkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .select("n_name", "rk", "c_custkey", "c_name", "revenue")
        .orderBy("n_name", "rk")
    )


def w2_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with a running cumulative sum (window over an
    aggregate; single global window is fine — 12×years rows)."""
    orders = load(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        monthly.withColumn("monthly_revenue", F.col("rev_dec").cast("double"))
        .withColumn("running_revenue", F.sum("rev_dec").over(w).cast("double"))
        .select("month", "monthly_revenue", "running_revenue")
        .orderBy("month")
    )


def w4_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: lag window over the monthly
    aggregate; growth ratio from two decimal-exact doubles."""
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    w = Window.orderBy("month")
    return (
        monthly.withColumn("monthly_revenue", F.col("rev_dec").cast("double"))
        .withColumn("prev_revenue", F.lag("rev_dec").over(w).cast("double"))
        .withColumn(
            "mom_growth",
            F.when(
                F.col("prev_revenue").isNotNull(),
                (F.col("monthly_revenue") - F.col("prev_revenue"))
                / F.col("prev_revenue"),
            ),
        )
        .select("month", "monthly_revenue", "prev_revenue", "mom_growth")
        .orderBy("month")
    )


def gsets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (not the rollup/cube lattice): totals
    by returnflag alone, by linestatus alone, and the grand total, in
    one pass via the SQL front-end."""
    from ..catalog import register_all
    from ..functions import sql_dsum

    register_all(spark, sf_dir)
    # grouping-sets Expand + decimal partial agg runs in the scan
    # stage: fan the lineitem scan out (measured win; guide §2.2) —
    # under a QUERY-LOCAL view name, so the session-global 'lineitem'
    # view other spark.sql consumers resolve is never left carrying
    # this query's extra exchange (r14 ADVICE: the overwrite leaked
    # the repartition into every later 'lineitem' reader)
    load(spark, sf_dir, "lineitem", fan_out=True).createOrReplaceTempView(
        "lineitem_fan"
    )
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_extendedprice', 'revenue')},
               COUNT(*) AS n_lines
        FROM lineitem_fan
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """)


def w3_moving_avg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving average over the last 4 events (rows frame)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return (
        ev.withColumn(
            "moving_avg",
            F.sum(F.col("value").cast(DEC)).over(w).cast("double")
            / F.count("value").over(w),
        )
        .select("event_id", "user_id", "ts", "moving_avg")
        .orderBy("event_id")
    )


def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity by linestatus × returnflag (explicit pivot
    values keep the plan static — required for 100 TB planning)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("A", "qty_a")
        .withColumnRenamed("N", "qty_n")
        .withColumnRenamed("R", "qty_r")
        .orderBy("l_linestatus")
    )


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over region→nation revenue."""
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(dsum("o_totalprice", "revenue"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation"),
            "revenue",
        )
        .orderBy("region", "nation")
    )


def semi_anti_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi vs left-anti join: parts ever/never ordered."""
    part = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").select("l_partkey")
    ordered = part.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
    never = part.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_anti")
    return (
        ordered.select(F.lit("ordered").alias("bucket"), "p_partkey")
        .unionAll(never.select(F.lit("never_ordered").alias("bucket"), "p_partkey"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("bucket")
    )


def union_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union + distinct across two key sources."""
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    ords = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return cust.unionAll(ords).distinct().agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("k").alias("key_sum")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2 shape, adapted: the
    supply relation is derived from lineitem since the generated
    schema has no partsupp — cost = MIN(l_extendedprice) per
    (part, supplier), an order-independent aggregate)."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").where(F.col("p_size") <= 15)
    li = load(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    eligible = (
        region.join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(supply, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
    )
    w = Window.partitionBy("p_partkey").orderBy("supplycost", "s_suppkey")
    return (
        eligible.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("p_partkey", "p_brand", "s_name", "n_name", "supplycost", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(100)
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share per year: conditional-sum ratio over a
    6-way join (TPC-H Q8 shape; no partsupp needed)."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    li = load(spark, sf_dir, "lineitem")
    vol = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n_cust, F.col("cn_key") == F.col("c_nationkey"))
        .join(region, F.col("r_regionkey") == F.col("cn_region"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n_supp, F.col("sn_key") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _rev().alias("volume"),
            F.col("supp_nation"),
        )
    )
    china_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
    return (
        vol.groupBy("o_year")
        .agg(
            (
                F.sum(china_vol.cast(DEC)).cast("double")
                / F.sum(F.col("volume").cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (TPC-H Q11 shape, adapted): per-part shipped
    value by CHINA-based suppliers, kept when above 1% of the total —
    a scalar aggregate subquery broadcast against the grouped set."""
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    value_rows = (
        nation.join(supp, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(li, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", "l_extendedprice")
    )
    per_part = value_rows.groupBy("l_partkey").agg(dsum("l_extendedprice", "part_value"))
    total = value_rows.agg(
        dsum("l_extendedprice", "total_value"),
        F.countDistinct("l_partkey").cast("double").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") * F.col("n_parts") > F.col("total_value") * 2.0)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping excess volume of promo parts (TPC-H Q20
    shape, adapted): per (part, supplier) shipped quantity above a
    threshold → left-semi join back to suppliers in a nation."""
    part = load(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    supp = load(spark, sf_dir, "supplier")
    heavy = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
        .where(F.col("qty") > 40.0)
        .select("l_suppkey")
    )
    return (
        supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone delayed multi-supplier orders (TPC-H Q21
    shape; lateness proxy: last line shipped > 60 days after the order
    date since the schema has no commit/receipt dates). Window counts
    replace the classic EXISTS / NOT EXISTS pair — one shuffle on
    o_orderkey instead of two correlated joins."""
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    per_os = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)).cast("int")
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    culprit = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    return (
        culprit.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over returnflag x linestatus (all 4 levels
    of subtotals in one pass — partial aggregation handles the
    expansion map-side)."""
    # fan_out: cube's 4x Expand + decimal partial agg rides the scan
    # stage — parallelize it when the layout cannot (guide §2.2)
    li = load(spark, sf_dir, "lineitem", fan_out=True)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum(_rev(), "revenue"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    )


def sql1_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-API surface: same Catalyst plan as the DataFrame path,
    entered through spark.sql over registered views (catalog
    register_all) — the engine supports both front-ends."""
    from ..catalog import register_all
    from ..functions import sql_dsum

    register_all(spark, sf_dir)
    return spark.sql(f"""
        SELECT n_name, {sql_dsum(_REV, 'revenue')}, COUNT(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """)


def setops_customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations: customers appearing in both
    early and late order periods vs early-only."""
    orders = load(spark, sf_dir, "orders")
    early = orders.where(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    late = orders.where(F.col("o_orderdate") >= "1997-01-01").select("o_custkey")
    both = early.intersect(late).select(F.lit("both").alias("bucket"), "o_custkey")
    # subtract == SQL EXCEPT (set semantics); exceptAll would leave
    # multi-order customers behind (multiset difference)
    only_early = early.subtract(late).select(
        F.lit("early_only").alias("bucket"), "o_custkey"
    )
    return (
        both.unionByName(only_early)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_customers"), F.sum("o_custkey").alias("key_sum"))
        .orderBy("bucket")
    )


def setops_multiset_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference): per-customer order
    occurrences in the early period minus late-period occurrences —
    a customer with 3 early + 1 late orders keeps 2 rows (contrast
    with ``subtract``'s set semantics in setops_customer_activity)."""
    orders = load(spark, sf_dir, "orders")
    early = orders.where(F.col("o_orderdate") < "1997-01-01").select("o_custkey")
    late = orders.where(F.col("o_orderdate") >= "1997-01-01").select("o_custkey")
    return (
        early.exceptAll(late)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_excess"))
        .orderBy("o_custkey")
    )


def w5_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: per market segment, rank every
    customer's balance with ntile(4)/percent_rank/cume_dist (ordering
    fully tie-broken by c_custkey so every rank is deterministic),
    then summarize each quartile. One shuffle on c_mktsegment; the
    per-quartile rollup reuses the same partitioning."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    r = cust.select(
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return (
        r.groupBy("c_mktsegment", F.col("quartile").cast("bigint").alias("quartile"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
            F.min("pr").alias("min_pr"),
            F.max("pr").alias("max_pr"),
            F.max("cd").alias("max_cd"),
        )
        .orderBy("c_mktsegment", "quartile")
    )


def q23_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over parts: the price/size tradeoff frontier —
    no other part is both cheaper-or-equal and larger-or-equal with
    one strict. Distributed two-phase plan in operators/skyline.py
    (per-batch local skyline prune → tiny global resolve; the O(n²)
    NOT EXISTS formulation survives only as the DuckDB twin)."""
    from ..catalog import table_rows
    from ..operators.skyline import skyline

    part = load(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")
    # scale-adaptive resolve fan-in (r14 opt): the intermediate tree
    # level exists to cap the single-task resolve when MANY local-prune
    # tasks emit candidates; derive it from the catalog row estimate
    # (the adaptive-LSH discipline) instead of a flat 32 — a tiny input
    # skips the level (fanout<=1), a 100 TB scan gets the full fan-in.
    # Any fanout yields the identical skyline (dominance pruning is
    # safe on any candidate partitioning — operators/skyline.py).
    fanout = min(64, max(1, table_rows(sf_dir, "part") // 250_000))
    return skyline(
        part, minimize=("p_retailprice",), maximize=("p_size",), fanout=fanout
    ).orderBy("p_partkey")


def dq1_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders
    (operators/profile.py::constraint_report — the deequ-style
    companion to d15's profiling): five named constraints evaluated in
    ONE aggregation pass — key uniqueness, not-null, accepted values,
    a numeric upper bound, and a date window. The bound and window are
    deliberately breached by the data so both ``ok`` branches carry
    signal. Null-safe: a null in a checked column counts as a
    violation."""
    from ..operators.profile import constraint_report

    orders = load(spark, sf_dir, "orders")
    row_checks = [
        ("custkey_not_null", F.col("o_custkey").isNull()),
        (
            "status_accepted",
            F.coalesce(
                ~F.col("o_orderstatus").isin("O", "F", "P"), F.lit(True)
            ),
        ),
        (
            "totalprice_le_300k",
            F.coalesce(F.col("o_totalprice") > 300000.0, F.lit(True)),
        ),
        (
            "orderdate_in_window",
            F.coalesce(
                (F.col("o_orderdate") < F.lit("1995-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")),
                F.lit(True),
            ),
        ),
    ]
    return constraint_report(
        orders, row_checks, unique_checks=(("orderkey_unique", ["o_orderkey"]),)
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "dq1_constraint_report": dq1_constraint_report,
    "q23_skyline_parts": q23_skyline_parts,
    "w5_rank_distribution": w5_rank_distribution,
    "setops_customer_activity": setops_customer_activity,
    "setops_multiset_except": setops_multiset_except,
    "sql1_revenue_by_nation": sql1_revenue_by_nation,
    "cube_revenue": cube_revenue,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q11_important_stock": q11_important_stock,
    "q20_excess_shipments": q20_excess_shipments,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q12_priority_shipping": q12_priority_shipping,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q16_brand_counts": q16_brand_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_disjunct_filter": q19_disjunct_filter,
    "q22_global_sales_opp": q22_global_sales_opp,
    "w1_top_customers_per_nation": w1_top_customers_per_nation,
    "w2_running_revenue": w2_running_revenue,
    "w4_mom_growth": w4_mom_growth,
    "gsets_revenue": gsets_revenue,
    "w3_moving_avg_events": w3_moving_avg_events,
    "pivot_returnflag": pivot_returnflag,
    "rollup_revenue": rollup_revenue,
    "semi_anti_parts": semi_anti_parts,
    "union_dedup_keys": union_dedup_keys,
}


ORACLE = {
    "dq1_constraint_report": """
        WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders),
        v AS (
          SELECT 'custkey_not_null' AS check_name,
                 CAST((SELECT COUNT(*) FROM orders
                       WHERE o_custkey IS NULL) AS BIGINT) AS n_violations
          UNION ALL
          SELECT 'orderdate_in_window',
                 CAST((SELECT COUNT(*) FROM orders
                       WHERE COALESCE(o_orderdate < TIMESTAMP '1995-01-01'
                          OR o_orderdate >= TIMESTAMP '2001-01-01', TRUE))
                   AS BIGINT)
          UNION ALL
          SELECT 'orderkey_unique',
                 (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                  FROM orders)
          UNION ALL
          SELECT 'status_accepted',
                 CAST((SELECT COUNT(*) FROM orders
                       WHERE COALESCE(o_orderstatus NOT IN ('O', 'F', 'P'),
                                      TRUE)) AS BIGINT)
          UNION ALL
          SELECT 'totalprice_le_300k',
                 CAST((SELECT COUNT(*) FROM orders
                       WHERE COALESCE(o_totalprice > 300000.0, TRUE))
                   AS BIGINT))
        SELECT check_name, n_rows, n_violations, n_violations = 0 AS ok
        FROM v, n ORDER BY check_name
    """,
    "q23_skyline_parts": """
        SELECT p_partkey, p_size, p_retailprice
        FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_retailprice <= p.p_retailprice
            AND q.p_size >= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        ORDER BY p_partkey
    """,
    "w5_rank_distribution": """
        WITH r AS (
          SELECT c_mktsegment, c_acctbal,
                 CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                 percent_rank() OVER w AS pr,
                 cume_dist() OVER w AS cd
          FROM customer
          WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
        SELECT c_mktsegment, quartile, COUNT(*) AS n_cust,
               MIN(c_acctbal) AS min_acctbal, MAX(c_acctbal) AS max_acctbal,
               MIN(pr) AS min_pr, MAX(pr) AS max_pr, MAX(cd) AS max_cd
        FROM r GROUP BY c_mktsegment, quartile
        ORDER BY c_mktsegment, quartile
    """,
    "w4_mom_growth": """
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
          FROM orders GROUP BY 1
        )
        SELECT CAST(month AS TIMESTAMP) AS month,
               CAST(rev_dec AS DOUBLE) AS monthly_revenue,
               CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
               CASE WHEN lag(rev_dec) OVER (ORDER BY month) IS NOT NULL
                    THEN (CAST(rev_dec AS DOUBLE)
                          - CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE))
                         / CAST(lag(rev_dec) OVER (ORDER BY month) AS DOUBLE)
               END AS mom_growth
        FROM monthly ORDER BY month
    """,
    "gsets_revenue": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    "setops_multiset_except": """
        WITH diff AS (
          SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
          EXCEPT ALL
          SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        SELECT o_custkey, COUNT(*) AS n_excess
        FROM diff GROUP BY o_custkey ORDER BY o_custkey
    """,
    "setops_customer_activity": """
        WITH early AS (
          SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        late AS (
          SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        tagged AS (
          SELECT 'both' AS bucket, o_custkey FROM
            (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)
          UNION ALL
          SELECT 'early_only', o_custkey FROM
            (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late))
        SELECT bucket, COUNT(*) AS n_customers, CAST(SUM(o_custkey) AS BIGINT) AS key_sum
        FROM tagged GROUP BY bucket ORDER BY bucket
    """,
    "sql1_revenue_by_nation": f"""
        SELECT n_name, {sql_dsum(_REV, 'revenue')}, COUNT(*) AS n_lines
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "cube_revenue": f"""
        SELECT l_returnflag, l_linestatus, {sql_dsum(_REV, 'revenue')},
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag, l_linestatus
    """,
    "q2_min_cost_supplier": """
        WITH supply AS (
          SELECT l_partkey, l_suppkey, MIN(l_extendedprice) AS supplycost
          FROM lineitem GROUP BY l_partkey, l_suppkey),
        eligible AS (
          SELECT p_partkey, p_brand, s_name, n_name, supplycost, s_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY p_partkey
                                    ORDER BY supplycost, s_suppkey) AS rk
          FROM region
          JOIN nation ON n_regionkey = r_regionkey
          JOIN supplier ON s_nationkey = n_nationkey
          JOIN supply ON l_suppkey = s_suppkey
          JOIN part ON p_partkey = l_partkey
          WHERE r_name = 'ASIA' AND p_size <= 15)
        SELECT p_partkey, p_brand, s_name, n_name, supplycost, s_acctbal
        FROM eligible WHERE rk = 1
        ORDER BY s_acctbal DESC, p_partkey
        LIMIT 100
    """,
    "q8_market_share": f"""
        WITH vol AS (
          SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                 {_REV} AS volume, n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON p_partkey = l_partkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON n1.n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n1.n_regionkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <= TIMESTAMP '1997-12-31')
        SELECT o_year,
               CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                  ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
        FROM vol GROUP BY o_year ORDER BY o_year
    """,
    "q11_important_stock": """
        WITH value_rows AS (
          SELECT l_partkey, l_extendedprice
          FROM nation
          JOIN supplier ON s_nationkey = n_nationkey
          JOIN lineitem ON l_suppkey = s_suppkey
          WHERE n_name = 'NATION_3'),
        per_part AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS part_value
          FROM value_rows GROUP BY l_partkey),
        total AS (
          SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
                 CAST(COUNT(DISTINCT l_partkey) AS DOUBLE) AS n_parts
          FROM value_rows)
        SELECT l_partkey, part_value
        FROM per_part, total
        WHERE part_value * n_parts > total_value * 2.0
        ORDER BY part_value DESC, l_partkey
    """,
    "q20_excess_shipments": """
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
          AND s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 40.0)
        ORDER BY s_suppkey
    """,
    "q21_waiting_suppliers": """
        WITH per_os AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                          THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
          GROUP BY l_orderkey, l_suppkey),
        flagged AS (
          SELECT *, COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
                 SUM(late) OVER (PARTITION BY l_orderkey) AS n_late
          FROM per_os)
        SELECT s_name, COUNT(*) AS numwait
        FROM flagged JOIN supplier ON s_suppkey = l_suppkey
        WHERE late = 1 AND n_supp >= 2 AND n_late = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity', 'sum_qty')},
               {sql_dsum('l_extendedprice', 'sum_base_price')},
               {sql_dsum(_REV, 'sum_disc_price')},
               {sql_dsum(f'{_REV} * (1.0 + l_tax)', 'sum_charge')},
               {sql_davg('l_quantity', 'avg_qty')},
               {sql_davg('l_extendedprice', 'avg_price')},
               {sql_davg('l_discount', 'avg_disc')},
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {sql_dsum(_REV, 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q5_local_supplier": f"""
        SELECT n_name, {sql_dsum(_REV, 'revenue')}
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q6_forecast_revenue": f"""
        SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT supp_nation, cust_nation, l_year, {sql_dsum('volume', 'revenue')}
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                 {_REV} AS volume
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        ) shipping
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               {sql_dsum(_REV, 'sum_profit')}
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, o_year
        ORDER BY n_name, o_year DESC
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name, {sql_dsum(_REV, 'revenue')}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-10-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q12_priority_shipping": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '2000-01-01'
          AND l_shipdate < TIMESTAMP '2001-01-01'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST({_REV} AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
               / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1998-09-01'
          AND l_shipdate < TIMESTAMP '1998-10-01'
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
          SELECT l_suppkey, {sql_dsum(_REV, 'total_revenue')}
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
    "q16_brand_counts": """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 100.0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    "q17_small_qty_revenue": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (
          SELECT l_partkey AS ap_partkey,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(l_quantity) AS aq
          FROM lineitem GROUP BY l_partkey
        ) a ON a.ap_partkey = l_partkey
        WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * aq
    """,
    "q18_large_orders": f"""
        WITH big AS (
          SELECT l_orderkey, {sql_dsum('l_quantity', 'sum_qty')}
          FROM lineitem GROUP BY l_orderkey
          HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 300.0
        )
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q19_disjunct_filter": f"""
        SELECT {sql_dsum(_REV, 'revenue')}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 35)
    """,
    "q22_global_sales_opp": f"""
        SELECT n_name, COUNT(*) AS numcust, {sql_dsum('c_acctbal', 'totacctbal')}
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
        ORDER BY n_name
    """,
    "w1_top_customers_per_nation": f"""
        WITH rev AS (
          SELECT n_name, c_custkey, c_name, {sql_dsum('o_totalprice', 'revenue')}
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name, c_custkey, c_name
        )
        SELECT n_name, rk, c_custkey, c_name, revenue FROM (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS BIGINT) AS rk
          FROM rev
        ) WHERE rk <= 3
        ORDER BY n_name, rk
    """,
    "w2_running_revenue": """
        WITH monthly AS (
          SELECT date_trunc('month', o_orderdate) AS month,
                 SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
          FROM orders GROUP BY 1
        )
        SELECT CAST(month AS TIMESTAMP) AS month,
               CAST(rev_dec AS DOUBLE) AS monthly_revenue,
               CAST(SUM(rev_dec) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
        FROM monthly ORDER BY month
    """,
    "w3_moving_avg_events": """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
                 / COUNT(value) OVER w AS moving_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY event_id
    """,
    "pivot_returnflag": """
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN l_returnflag='A' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_a,
               CAST(SUM(CASE WHEN l_returnflag='N' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_n,
               CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,6)) END) AS DOUBLE) AS qty_r
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "rollup_revenue": f"""
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               {sql_dsum('o_totalprice', 'revenue')}
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation
    """,
    "semi_anti_parts": """
        SELECT bucket, COUNT(*) AS n_parts FROM (
          SELECT 'ordered' AS bucket, p_partkey FROM part
          WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
          UNION ALL
          SELECT 'never_ordered' AS bucket, p_partkey FROM part
          WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        ) GROUP BY bucket ORDER BY bucket
    """,
    "union_dedup_keys": """
        SELECT COUNT(*) AS n_keys, CAST(SUM(k) AS BIGINT) AS key_sum FROM (
          SELECT DISTINCT k FROM (
            SELECT c_custkey AS k FROM customer
            UNION ALL SELECT o_custkey AS k FROM orders))
    """,
}
