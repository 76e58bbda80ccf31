"""Extended relational operators beyond the TPC-H-adapted core:
pivot, cube / grouping sets, set operations, exact distinct counts,
windowed customer lifetime value, per-group top-N over joins.

Scale notes: pivot/cube/grouping-sets are single-shuffle expand+agg
plans with bounded key spaces; set ops compile to hash
aggregates/joins on pruned columns; the LTV window partitions on the
natural high-cardinality key (custkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.money import dec, money_sum, sum_to_double

_STATUSES = ("F", "O", "P")  # o_orderstatus domain


def orders_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority × status (explicit pivot
    values so the plan is a single expand+agg, no extra pass to
    discover the domain).

    Scale: one shuffle on o_orderpriority (5 keys); counts combine
    map-side.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", list(_STATUSES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "o_orderpriority",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
    )


def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations in
    one expand+agg pass."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        money_sum(dec("o_totalprice"), "sum_price"),
    )


def orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((status), (priority)) — the general
    form rollup/cube compile to."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    total = sum_to_double(f"sum({dec('o_totalprice')})")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders, {total} AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


def customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT: customers in the BUILDING segment vs
    customers with an urgent order — emitted as a tagged union so one
    result covers both set operators.

    Scale: both compile to shuffle joins on the pruned custkey column
    only.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    both = building.intersect(urgent).withColumn("set_op", F.lit("both"))
    only_building = building.exceptAll(urgent).withColumn(
        "set_op", F.lit("building_only")
    )
    return both.unionByName(only_building)


def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts over lineitem (the expensive
    one big data always asks for).

    Scale: count(distinct x) expands per aggregate; at 100 TB swap in
    approx_count_distinct (HLL, map-side mergeable, no expand) — kept
    exact here because the oracle must agree bit-for-bit.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_status"),
    )


def customer_ltv_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime value: per-order running total and order
    sequence number over each customer's history.

    Scale: one shuffle on o_custkey; state per task = one customer's
    orders. The decimal running sum converts per row (exact in both
    engines).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
        F.expr(
            f"cast(cast(sum({dec('o_totalprice')}) over "
            f"(partition by o_custkey order by o_orderdate, o_orderkey "
            f"rows between unbounded preceding and current row) "
            f"as decimal(38,6)) as double)"
        ).alias("ltv"),
    )


def top_parts_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by revenue per supplier nation: join + agg +
    windowed top-N (the canonical 'leaderboard per group' shape).

    Scale: part/supplier/nation broadcast; one shuffle for the agg,
    exchange reused by the window (same key).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "l_partkey")
        .agg(
            money_sum(
                f"{dec('l_extendedprice')} * {dec('1 - l_discount')}", "revenue"
            )
        )
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), "l_partkey")
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("n_name", "rk", "l_partkey", "revenue")
    )


def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO as a batch operator: apply an update/insert
    changeset to ``orders`` with copy-on-write semantics (matched rows
    replaced, new keys inserted, everything else carried over), then
    summarize the merged state per status.

    The changeset is derived deterministically so the oracle can build
    the identical one: keys ≡ 3 (mod 7) get their price doubled and
    status ``'U'``; keys ≡ 1 (mod 13) also arrive as brand-new orders
    (key shifted by 10^8) with status ``'N'``.

    Scale: the Spark plan is the canonical distributed merge —
    ``target LEFT ANTI JOIN changeset`` on the key plus a union (one
    shuffle on the high-cardinality key, AQE-splittable; a sorted/
    bucketed target turns it into a zero-exchange merge, see
    sources/formats.py write_bucketed). No driver-side state; the
    changeset can be arbitrarily large.
    """
    # decimal(12,2): wide enough for a doubled TPC-H totalprice
    # (~1.1M > decimal(8,2)'s domain), still compact-long in codegen
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("cast(o_totalprice as decimal(12,2))").alias("o_totalprice"),
        "o_orderstatus",
    )
    updates = orders.where("o_orderkey % 7 = 3").select(
        "o_orderkey",
        F.expr("cast(o_totalprice * 2 as decimal(12,2))").alias(
            "o_totalprice"
        ),
        F.lit("U").alias("o_orderstatus"),
    )
    inserts = orders.where("o_orderkey % 13 = 1").select(
        (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
        F.col("o_totalprice"),
        F.lit("N").alias("o_orderstatus"),
    )
    # checkpoint the changeset: it is referenced twice (anti-join
    # probe + union) and each lazy reference re-embedded its two
    # filtered orders scans — 5 orders scans per plan (r11 audit).
    # Materializing the changeset is also the honest merge shape: a
    # real MERGE's changeset arrives as its own table.
    changeset = updates.unionByName(inserts).localCheckpoint()
    merged = orders.join(
        changeset.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(changeset)
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        money_sum("o_totalprice", "sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def orders_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance by partial-aggregate algebra:
    the pre-cutoff BASE aggregate and the newly-arrived DELTA
    partition aggregate are merged by re-aggregating their
    (count, sum) partials — the base data is never re-scanned.
    Averages derive from merged partials at read time (avg is not
    re-aggregable; count+sum are).

    At 100 TB this is THE nightly-rollup pattern: the base agg is a
    stored table of keyspace size; each increment touches only the
    new partition. Here both sides derive from the same table split
    on a date cutoff so the DuckDB oracle (one full aggregate) proves
    the merge algebra exact.
    """
    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.expr(f"sum({dec('o_totalprice')})").alias("_psum"),
        )

    base = partial(orders.where("o_orderdate < timestamp '1999-01-01'"))
    delta = partial(orders.where("o_orderdate >= timestamp '1999-01-01'"))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n").alias("n_orders"),
            F.expr(sum_to_double("sum(_psum)")).alias("sum_price"),
            (
                F.expr(sum_to_double("sum(_psum)")) / F.sum("n")
            ).alias("avg_price"),
        )
    )


def customer_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history build: collapse a
    change stream into versioned validity windows
    (effective_from/effective_to/is_current) — the warehouse pattern
    for tracking dimension attributes over time.

    The change stream is each customer's order priority observed at
    order dates (the natural per-customer attribute timeline in this
    schema). Consecutive identical values collapse into one version;
    `lead()` closes each window at the next change.

    Scale: one shuffle on the dimension key, two window passes —
    history builds are embarrassingly parallel per key; no joins.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    stream = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.col("o_orderpriority").alias("attr"),
    ).withColumn("_prev", F.lag("attr").over(w))
    changes = stream.where(
        F.col("_prev").isNull() | (F.col("attr") != F.col("_prev"))
    )
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.row_number().over(wc).alias("version"),
        "attr",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("effective_from"),
        F.date_format(F.lead("o_orderdate").over(wc), "yyyy-MM-dd").alias(
            "effective_to"
        ),
        F.lead("o_orderdate").over(wc).isNull().alias("is_current"),
    )


def orders_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-spend decile summary WITHOUT a global sort: exact
    percentile cutoffs (p10..p90) are computed in one aggregate,
    broadcast as a 9-element literal, and every customer is binned
    by counting cutoffs below its spend — a pure map.

    A naive NTILE(10) OVER (ORDER BY spend) funnels the whole table
    through ONE window task; this two-pass cutoff form is the shape
    that survives 100 TB (tiny agg -> broadcast -> map + 10-row agg).
    Cutoffs are 6dp-rounded so the Spark/DuckDB interpolations agree;
    customer spends are 2-decimal, so no spend lands within 1e-6 of a
    rounded cutoff except when the interpolation hits a data point
    exactly — which both engines compute exactly (frac = 0).

    Output: (decile, n_customers, decile_spend, min_spend, max_spend).
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.expr(
            f"cast(sum({dec('o_totalprice')}) as decimal(38,6))"
        ).alias("spend_dec")
    )
    spend = spend.withColumn("spend", F.col("spend_dec").cast("double"))
    qs = ", ".join(f"{q / 10:.1f}" for q in range(1, 10))
    cuts = spend.agg(
        F.expr(
            f"transform(percentile(spend, array({qs})), c -> round(c, 6))"
        ).alias("cs")
    )
    binned = spend.crossJoin(F.broadcast(cuts)).select(
        "spend_dec",
        (F.expr("size(filter(cs, c -> spend > c))") + 1).alias("decile"),
    )
    return binned.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.expr(sum_to_double("sum(spend_dec)")).alias("decile_spend"),
        F.expr("cast(min(spend_dec) as double)").alias("min_spend"),
        F.expr("cast(max(spend_dec) as double)").alias("max_spend"),
    )


def lineitem_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile per order month: the
    operational-SLA view (is fulfillment drifting?) over the ONE
    fact-fact join in the schema (lineitem ⋈ orders on orderkey).

    Determinism: latencies are exact integer day differences;
    min/max/sum are integer aggregates; the mean is one 6dp IEEE
    division.

    Scale: THE canonical big join — two fact tables equi-joined on
    orderkey.  Neither side broadcasts; the plan is a shuffled
    hash/sort-merge join (AQE picks), and at 100 TB both sides would
    be bucketed by orderkey to pre-co-locate it
    (sources/formats.bucketed_join shows that variant).  The month
    agg after the join is map-side combined into ~84 groups.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).cast("long").alias("lat_days"),
    )
    return j.groupBy("order_month").agg(
        F.count("*").cast("long").alias("n_lineitems"),
        F.min("lat_days").cast("long").alias("min_days"),
        F.max("lat_days").cast("long").alias("max_days"),
        F.round(
            F.sum("lat_days").cast("double") / F.count("*"), 6
        ).alias("mean_days"),
    )


QUERIES = {
    "lineitem_ship_latency": lineitem_ship_latency,
    "orders_spend_deciles": orders_spend_deciles,
    "customer_scd2": customer_scd2,
    "orders_incremental_agg": orders_incremental_agg,
    "orders_merge_upsert": orders_merge_upsert,
    "orders_pivot_status": orders_pivot_status,
    "orders_cube": orders_cube,
    "orders_grouping_sets": orders_grouping_sets,
    "customer_set_ops": customer_set_ops,
    "distinct_counts": distinct_counts,
    "customer_ltv_window": customer_ltv_window,
    "top_parts_per_nation": top_parts_per_nation,
}

_SQL_SUM_PRICE = (
    "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)"
)
_SQL_REV = (
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) "
    "* CAST(1 - l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE)"
)

ORACLE = {
    "lineitem_ship_latency": """
        SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
               CAST(COUNT(*) AS BIGINT) AS n_lineitems,
               CAST(MIN(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)))
                    AS BIGINT) AS min_days,
               CAST(MAX(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)))
                    AS BIGINT) AS max_days,
               round(CAST(SUM(date_diff('day',
                                        CAST(o.o_orderdate AS DATE),
                                        CAST(l.l_shipdate AS DATE)))
                          AS DOUBLE) / COUNT(*), 6) AS mean_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1
    """,
    "orders_spend_deciles": """
        WITH spend AS (
            SELECT o_custkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                        AS DECIMAL(38,6)) AS spend_dec
            FROM orders GROUP BY o_custkey
        ), cuts AS (
            SELECT list_transform(
                       quantile_cont(CAST(spend_dec AS DOUBLE),
                           [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                       c -> round(c, 6)) AS cs
            FROM spend
        ), binned AS (
            SELECT s.spend_dec,
                   1 + len(list_filter(c.cs,
                           x -> CAST(s.spend_dec AS DOUBLE) > x)) AS decile
            FROM spend s, cuts c
        )
        SELECT decile, COUNT(*) AS n_customers,
               CAST(CAST(SUM(spend_dec) AS DECIMAL(38,6)) AS DOUBLE)
                 AS decile_spend,
               CAST(MIN(spend_dec) AS DOUBLE) AS min_spend,
               CAST(MAX(spend_dec) AS DOUBLE) AS max_spend
        FROM binned GROUP BY decile
    """,
    "customer_scd2": """
        WITH stream AS (
            SELECT o_custkey, o_orderdate, o_orderkey,
                   o_orderpriority AS attr,
                   lag(o_orderpriority) OVER w AS prev
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
        ), changes AS (
            SELECT * FROM stream WHERE prev IS NULL OR attr <> prev
        )
        SELECT o_custkey AS custkey,
               row_number() OVER wc AS version,
               attr,
               strftime(o_orderdate, '%Y-%m-%d') AS effective_from,
               strftime(lead(o_orderdate) OVER wc, '%Y-%m-%d')
                 AS effective_to,
               lead(o_orderdate) OVER wc IS NULL AS is_current
        FROM changes
        WINDOW wc AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
    """,
    "orders_incremental_agg": f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               {_SQL_SUM_PRICE} AS sum_price,
               {_SQL_SUM_PRICE} / COUNT(*) AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
    "orders_merge_upsert": """
        WITH t AS (
            SELECT o_orderkey,
                   CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
                   o_orderstatus
            FROM orders
        ), changeset AS (
            SELECT o_orderkey,
                   CAST(o_totalprice * 2 AS DECIMAL(12,2)) AS o_totalprice,
                   'U' AS o_orderstatus
            FROM t WHERE o_orderkey % 7 = 3
            UNION ALL
            SELECT o_orderkey + 100000000, o_totalprice, 'N'
            FROM t WHERE o_orderkey % 13 = 1
        ), merged AS (
            SELECT * FROM t
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changeset)
            UNION ALL
            SELECT * FROM changeset
        )
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(CAST(SUM(o_totalprice) AS DECIMAL(38,6)) AS DOUBLE)
                 AS sum_price,
               MIN(o_orderkey) AS min_key,
               MAX(o_orderkey) AS max_key
        FROM merged GROUP BY o_orderstatus
    """,
    "orders_pivot_status": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        FROM orders GROUP BY o_orderpriority
    """,
    "orders_cube": f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders, {_SQL_SUM_PRICE} AS sum_price
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "orders_grouping_sets": f"""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders, {_SQL_SUM_PRICE} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
    "customer_set_ops": """
        WITH building AS (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ), urgent AS (
            SELECT DISTINCT o_custkey AS c_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT'
        )
        SELECT c_custkey, 'both' AS set_op
        FROM (SELECT c_custkey FROM building
              INTERSECT SELECT c_custkey FROM urgent)
        UNION ALL
        SELECT c_custkey, 'building_only' AS set_op
        FROM (SELECT c_custkey FROM building
              EXCEPT ALL SELECT c_custkey FROM urgent)
    """,
    "distinct_counts": """
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps,
               COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status
        FROM lineitem
    """,
    "customer_ltv_window": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
               row_number() OVER w AS order_seq,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(38,6)) AS DOUBLE) AS ltv
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "top_parts_per_nation": f"""
        WITH rev AS (
            SELECT n_name, l_partkey, {_SQL_REV} AS revenue
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
            GROUP BY n_name, l_partkey
        )
        SELECT n_name, rk, l_partkey, revenue FROM (
            SELECT n_name, l_partkey, revenue,
                   row_number() OVER (PARTITION BY n_name
                                      ORDER BY revenue DESC, l_partkey) AS rk
            FROM rev) t
        WHERE rk <= 3
    """,
}
