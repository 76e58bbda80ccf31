"""Relational analytics suite — TPC-H queries adapted to the testdata
schema (no partsupp; trimmed columns; timestamps for dates).

Reference parity note: the reference repo is an orchestrator with no
query engine (SURVEY.md §1); this suite is the analytics surface
mandated by BASELINE.json, built idiomatic-Spark: DataFrame API,
broadcast dimension joins, decimal-exact money math
(functions/money.py), no UDFs anywhere.

Scale notes per query docstring. Global invariants:
* nation/region/supplier/part joins are broadcast (asserted in
  tests/test_plans.py) — at 100 TB these stay < broadcast threshold.
* fact-fact joins (orders⋈lineitem) are equi sort-merge joins on the
  natural key; AQE coalesces/splits post-shuffle partitions.
* every aggregate is map-side partial by construction (hash agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.money import (
    dec,
    money_sum,
    rate,
    sql_money_sum,
    sum_to_double,
)

# Shared money expressions. rate() keeps the per-row product at
# decimal precision ≤ 18 → Spark's compact-long decimal fast path.
_DISC_PRICE = f"{dec('l_extendedprice')} * {rate('1 - l_discount')}"
_CHARGE = (
    f"{dec('l_extendedprice')} * {rate('1 - l_discount')} * {rate('1 + l_tax')}"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary report.

    Scale: single scan of lineitem with shipdate pushdown; hash agg on
    a 6-value group key -> map-side combine reduces 100 TB to KBs
    before the (tiny) shuffle. No join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sum_qty = sum_to_double("sum(" + dec("l_quantity") + ")")
    sum_price = sum_to_double("sum(" + dec("l_extendedprice") + ")")
    sum_disc = sum_to_double("sum(" + dec("l_discount") + ")")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-08-06").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec("l_quantity"), "sum_qty"),
            money_sum(dec("l_extendedprice"), "sum_base_price"),
            money_sum(_DISC_PRICE, "sum_disc_price"),
            money_sum(_CHARGE, "sum_charge"),
            F.expr(f"{sum_qty} / count(*)").alias("avg_qty"),
            F.expr(f"{sum_price} / count(*)").alias("avg_price"),
            F.expr(f"{sum_disc} / count(*)").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one segment.

    Scale: customer filter first (segment selectivity ~1/5), then
    orders⋈lineitem sort-merge on o_orderkey; top-k via TakeOrdered —
    no global sort materialization. Deterministic tiebreak on
    (revenue desc, o_orderdate, l_orderkey) so LIMIT is stable.
    """
    cutoff = F.lit("1996-03-15").cast("timestamp")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(money_sum(_DISC_PRICE, "revenue"))
        .withColumn("o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders (one quarter) with at least one late-shipped
    line, counted per priority. EXISTS -> left-semi join.

    Scale: semi-join shuffles only orderkeys; the lineitem side is
    pre-filtered by the correlated predicate pushed into the join.
    """
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).where(F.col("l_shipdate") > F.col("o_orderdate")).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue where customer and supplier share a nation,
    one region, one year.

    Scale: region/nation/supplier broadcast; the only big shuffles are
    orders⋈customer and lineitem⋈orders on their natural keys. The
    c_nationkey = s_nationkey constraint rides along as a post-join
    filter on broadcast columns.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(_DISC_PRICE, "revenue"))
    )


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: scan-heavy filtered aggregate.

    Scale: the whole query is one parquet scan with all three
    predicates pushed down + 2-column pruning (asserted in
    test_plans.py) and a map-side-combined scalar agg. The canonical
    'is pushdown working' probe.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(money_sum(f"{dec('l_extendedprice')} * {dec('l_discount')}", "revenue"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by year.

    Scale: both nation maps broadcast; fact joins are the usual
    orders/customer/lineitem equi-joins. Year extraction stays in
    codegen.
    """
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(money_sum(_DISC_PRICE, "revenue"))
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (no partsupp): profit by supplier nation and year for
    PROMO-type parts.

    Scale: part+supplier+nation broadcast; single big shuffle =
    lineitem⋈orders. LIKE on p_type evaluated on the broadcast side.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(money_sum(_DISC_PRICE, "sum_profit"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by returned-item revenue, one
    quarter.

    Scale: orders quarter filter prunes before the lineitem join;
    nation broadcast; top-k avoids a global sort. Tiebreak on
    c_custkey keeps LIMIT deterministic.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(_DISC_PRICE, "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer (left outer join so
    zero-order customers count).

    Scale: the first agg shuffles on o_custkey (high cardinality, well
    distributed); the second agg's key (a small count) is low-
    cardinality but the input is already tiny.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from PROMO parts in one month.

    Scale: part broadcast; conditional agg is one pass. Final ratio
    divides two exact decimal sums cast to double (deterministic).
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = (
        "sum(case when p_type = 'PROMO' then "
        f"{_DISC_PRICE} else cast(0 as decimal(18,6)) end)"
    )
    total = sum_to_double(f"sum({_DISC_PRICE})")
    return joined.agg(
        F.expr(f"{sum_to_double(promo)} * 100 / {total}").alias("promo_revenue")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max revenue in one quarter.

    Scale: revenue agg shuffles on l_suppkey; the max is a broadcast
    scalar join back. Revenue equality is safe because the sums are
    decimal-exact. Supplier dim broadcast.
    """
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(_DISC_PRICE, "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == F.col("m"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers whose single order exceeds a quantity
    threshold.

    Scale: the HAVING subquery is an agg on l_orderkey then a semi
    join — both shuffle on the same key, so Catalyst reuses the
    exchange. Threshold tuned (150) to the synthetic qty distribution.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum(dec("l_quantity"), "sum_qty"))
        .where(F.col("sum_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive brand/size/quantity predicates.

    Scale: part broadcast; the OR-of-ANDs predicate evaluates post-
    join in codegen. Catalyst extracts the common l_partkey equi-key
    so this is NOT a cartesian (asserted in test_plans.py).
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & (F.col("p_size").between(1, 50))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return j.where(cond).agg(money_sum(_DISC_PRICE, "revenue"))


def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted): high-balance customers who never placed an
    urgent order, by nation. (In this synthetic data every customer
    has *some* order, so the anti-join targets urgent orders to stay
    a meaningful NOT EXISTS.)

    Scale: the avg-acctbal scalar is a broadcast; the NOT EXISTS is a
    left-anti join shuffling only custkeys; nation broadcast.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    nation = load_table(spark, sf_dir, "nation")
    sum_bal = sum_to_double("sum(" + dec("c_acctbal") + ")")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        # exact decimal sum -> exact double, then one FP division:
        # identical in both engines
        F.expr(f"{sum_bal} / count(*)").alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            money_sum(dec("c_acctbal"), "totacctbal"),
        )
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted): NATION_5 suppliers' share of ASIA-region
    revenue by order year — the share-of-total-within-group shape
    (ratio of a conditional decimal sum to the total).

    Scale: same star join as q5; the share is two exact sums in one
    agg pass.
    """
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    snation = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(snation), F.col("s_nationkey") == F.col("s_nk"))
    )
    nat_rev = (
        "sum(case when supp_nation = 'NATION_5' then "
        f"{_DISC_PRICE} else cast(0 as decimal(13,4)) end)"
    )
    tot_rev = f"sum({_DISC_PRICE})"
    return joined.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.round(
            F.expr(f"{sum_to_double(nat_rev)} / {sum_to_double(tot_rev)}"), 6
        ).alias("mkt_share")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (adapted): lost revenue from small-quantity orders —
    lineitems under 50%% of their part's average quantity, for one
    brand. The correlated-aggregate-per-key shape.

    Scale: the per-part avg is an agg + broadcast-back; Catalyst
    reuses the lineitem scan for both sides.
    """
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.expr(
            f"{sum_to_double('sum(' + dec('l_quantity') + ')')} / count(*)"
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.expr(sum_to_double("sum(" + dec("l_extendedprice") + ")"))
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


QUERIES = {
    "q8_market_share": q8_market_share,
    "q17_small_quantity": q17_small_quantity,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales": q22_global_sales,
}

_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1 - l_discount AS DECIMAL(18,6))"
)
_SQL_CHARGE = _SQL_DISC_PRICE + " * CAST(1 + l_tax AS DECIMAL(18,6))"

ORACLE = {
    "q8_market_share": f"""
        WITH j AS (
            SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                   n2.n_name AS supp_nation,
                   {_SQL_DISC_PRICE} AS dp
            FROM lineitem, orders, customer, nation n1, region, supplier,
                 nation n2
            WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
              AND c_nationkey = n1.n_nationkey
              AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
              AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
        )
        SELECT o_year,
               round(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5'
                                        THEN dp ELSE CAST(0 AS DECIMAL(13,4))
                                   END) AS DECIMAL(38,6)) AS DOUBLE)
                     / CAST(CAST(SUM(dp) AS DECIMAL(38,6)) AS DOUBLE), 6)
                 AS mkt_share
        FROM j GROUP BY o_year
    """,
    "q17_small_quantity": """
        WITH pp AS (
            SELECT l_partkey AS pk,
                   CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(8,2)))
                        AS DECIMAL(38,6)) AS DOUBLE) / COUNT(*) AS avg_qty
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)))
                     AS DECIMAL(38,6)) AS DOUBLE) / 7.0, 6) AS avg_yearly
        FROM lineitem, part, pp
        WHERE l_partkey = p_partkey AND l_partkey = pp.pk
          AND p_brand = 'Brand#1'
          AND l_quantity < 0.5 * pp.avg_qty
    """,
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_money_sum('CAST(l_quantity AS DECIMAL(18,6))')} AS sum_qty,
               {sql_money_sum('CAST(l_extendedprice AS DECIMAL(18,6))')} AS sum_base_price,
               {sql_money_sum(_SQL_DISC_PRICE)} AS sum_disc_price,
               {sql_money_sum(_SQL_CHARGE)} AS sum_charge,
               {sql_money_sum('CAST(l_quantity AS DECIMAL(18,6))')} / COUNT(*) AS avg_qty,
               {sql_money_sum('CAST(l_extendedprice AS DECIMAL(18,6))')} / COUNT(*) AS avg_price,
               {sql_money_sum('CAST(l_discount AS DECIMAL(18,6))')} / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-08-06'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": f"""
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_orderpriority,
               {sql_money_sum(_SQL_DISC_PRICE)} AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1996-03-15'
          AND l_shipdate  > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01'
          AND o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q5_local_supplier_volume": f"""
        SELECT n_name, {sql_money_sum(_SQL_DISC_PRICE)} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "q6_revenue_forecast": """
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q7_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               EXTRACT(year FROM l_shipdate) AS l_year,
               {sql_money_sum(_SQL_DISC_PRICE)} AS revenue
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation,
               EXTRACT(year FROM o_orderdate) AS o_year,
               {sql_money_sum(_SQL_DISC_PRICE)} AS sum_profit
        FROM lineitem, part, supplier, nation, orders
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
          AND s_nationkey = n_nationkey AND l_orderkey = o_orderkey
          AND p_type = 'PROMO'
        GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {sql_money_sum(_SQL_DISC_PRICE)} AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND c_nationkey = n_nationkey
          AND l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-10-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT OUTER JOIN orders
                ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
              GROUP BY c_custkey) c_orders
        GROUP BY c_count
    """,
    "q14_promo_effect": f"""
        SELECT {sql_money_sum(f'''CASE WHEN p_type = 'PROMO'
                             THEN {_SQL_DISC_PRICE}
                             ELSE CAST(0 AS DECIMAL(18,6)) END''')} * 100
               / {sql_money_sum(_SQL_DISC_PRICE)} AS promo_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    "q15_top_supplier": f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   {sql_money_sum(_SQL_DISC_PRICE)} AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, revenue
        WHERE s_suppkey = supplier_no
          AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "q18_large_volume_customer": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               o_totalprice, sum_qty
        FROM customer, orders,
             (SELECT l_orderkey,
                     CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) > 150) big
        WHERE o_orderkey = big.l_orderkey AND c_custkey = o_custkey
    """,
    "q19_discounted_revenue": f"""
        SELECT {sql_money_sum(_SQL_DISC_PRICE)} AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND ((p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1  AND 11)
            OR (p_brand = 'Brand#7'  AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 30))
    """,
    "q22_global_sales": """
        SELECT n_name, COUNT(*) AS numcust,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS totacctbal
        FROM customer, nation
        WHERE c_nationkey = n_nationkey
          AND c_acctbal > (SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)
                                  / COUNT(*)
                           FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY n_name
    """,
}
