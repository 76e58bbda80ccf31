"""Data-quality / validation operators — the checks every ingestion
pipeline runs before promoting a batch (the generalized form of the
reference's verify_batch gate).

* ``dq_orphan_check`` — referential integrity: child keys without a
  parent, per relationship (anti-join counts).
* ``dq_null_profile`` — per-column null/blank counts over lineitem
  (one pass, conditional aggs).
* ``dq_value_ranges`` — domain assertions as data: min/max/violation
  counts for the business rules this engine's money math relies on
  (2dp, |x| < 10^6 — see functions/money.py).

Scale: each is one scan + bounded agg or a key-pruned anti-join;
these run as pre-commit gates on every batch at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table


def dq_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphaned-foreign-key counts for every edge of the star schema —
    ONE lazy job, not five driver-blocking counts: all audits
    schedule together and the audit composes into larger plans
    without extra actions.

    Each child table is scanned ONCE for all of its outgoing FK
    edges (round-10 plan audit: the per-edge anti-join form scanned
    lineitem — the 100 TB fact — three times in one plan): the child
    left-joins every parent's DISTINCT key projection and one agg
    counts the unmatched rows per edge; ``stack`` reshapes the counts
    into the per-relationship rows. A left-join null count equals the
    anti-join count only when parent keys are unique, so the parent
    projections are distinct-ed — a no-op shuffle-wise for real PK
    parents (and dq_uniqueness audits that invariant separately),
    but it keeps this audit exact even on dup-keyed inputs.

    Scale: lineitem 1 scan (was 3); small parents (part, supplier,
    nation) broadcast via AQE; the orders-side join shuffles both
    sides once — the same cost the anti-join paid.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    def _missing(ckey: str, pkey: str) -> F.Column:
        # unmatched = parent key NULL after the left join; a NULL
        # child key never matches either — same as the anti-join
        return F.coalesce(
            F.sum(F.col(pkey).isNull().cast("long")), F.lit(0)
        )

    li_counts = (
        li.join(
            orders.select("o_orderkey").distinct(),
            li.l_orderkey == F.col("o_orderkey"),
            "left",
        )
        .join(
            part.select("p_partkey").distinct(),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .join(
            supp.select("s_suppkey").distinct(),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
        .agg(
            _missing("l_orderkey", "o_orderkey").alias("c_ord"),
            _missing("l_partkey", "p_partkey").alias("c_part"),
            _missing("l_suppkey", "s_suppkey").alias("c_supp"),
        )
        .select(
            F.expr(
                "stack(3, "
                "'lineitem.l_orderkey->orders', c_ord, "
                "'lineitem.l_partkey->part', c_part, "
                "'lineitem.l_suppkey->supplier', c_supp"
                ") AS (relationship, n_orphans)"
            )
        )
    )
    ord_counts = (
        orders.select("o_custkey")
        .join(
            cust.select("c_custkey").distinct(),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .agg(_missing("o_custkey", "c_custkey").alias("n_orphans"))
        .select(
            F.lit("orders.o_custkey->customer").alias("relationship"),
            "n_orphans",
        )
    )
    cust_counts = (
        cust.select("c_nationkey")
        .join(
            nation.select("n_nationkey").distinct(),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .agg(_missing("c_nationkey", "n_nationkey").alias("n_orphans"))
        .select(
            F.lit("customer.c_nationkey->nation").alias("relationship"),
            "n_orphans",
        )
    )
    return li_counts.unionByName(ord_counts).unionByName(cust_counts)


def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null + blank-string counts per lineitem column, one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for f in li.schema.fields:
        aggs.append(
            F.sum(F.col(f.name).isNull().cast("bigint")).alias(f"null_{f.name}")
        )
    string_cols = [f.name for f in li.schema.fields if f.dataType.simpleString() == "string"]
    for c in string_cols:
        aggs.append(
            F.sum((F.trim(F.col(c)) == "").cast("bigint")).alias(f"blank_{c}")
        )
    return li.agg(*aggs)


def dq_value_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-rule audit for the money columns: 2-decimal + bound
    checks (the invariants functions/money.py's narrow decimals
    assume — violated rows would silently round, so they gate)."""
    li = load_table(spark, sf_dir, "lineitem")

    def rule(col, bound):
        non2dp = F.sum(
            (F.abs(F.col(col) * 100 - F.round(F.col(col) * 100)) > 1e-6)
            .cast("bigint")
        )
        oob = F.sum((F.abs(F.col(col)) >= bound).cast("bigint"))
        return [
            non2dp.alias(f"non2dp_{col}"),
            oob.alias(f"oob_{col}"),
        ]

    return li.agg(
        *rule("l_extendedprice", 1_000_000),
        *rule("l_discount", 1),
        *rule("l_tax", 1),
        *rule("l_quantity", 1_000_000),
    )


_K_ANON = 5


def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment): group sizes plus an at-risk flag for
    groups smaller than k=5 — the privacy gate a dataset release
    runs before publishing joinable attributes.

    Scale: one map-side-combined agg on the quasi-identifier key
    (bounded cardinality: |nations| × |segments|).

    Output: (c_nationkey, c_mktsegment, k, at_risk).
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("k"),
        (F.count("*") < _K_ANON).cast("int").alias("at_risk"),
    )


_UNIQ_KEYS = [
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
]


def dq_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit across every keyed table: row
    count vs distinct-key count and the duplicate rate — the first
    DQ gate of any ingest (a join against a dup-keyed dimension
    silently fans out downstream row counts).

    One lazy union of per-table aggregates (the dq_orphan_check
    shape): all audits schedule together, each is a single
    scan+agg with map-side partial distinct.

    Scale: COUNT(DISTINCT key) shuffles the key space once per
    table; for hot-keyed 100 TB facts swap in the salted two-phase
    variant (functions/skew.salted_distinct_count) or
    approx_count_distinct with the same output shape.
    """
    out = None
    for table, key in _UNIQ_KEYS:
        t = load_table(spark, sf_dir, table)
        agg = t.agg(
            F.count("*").cast("long").alias("n_rows"),
            F.countDistinct(key).cast("long").alias("n_keys"),
        ).select(
            F.lit(table).alias("table_name"),
            F.lit(key).alias("key_col"),
            "n_rows",
            "n_keys",
            F.round(
                (F.col("n_rows") - F.col("n_keys")) / F.col("n_rows"), 6
            ).alias("dup_rate"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


QUERIES = {
    "dq_uniqueness": dq_uniqueness,
    "dq_orphan_check": dq_orphan_check,
    "dq_k_anonymity": dq_k_anonymity,
    "dq_null_profile": dq_null_profile,
    "dq_value_ranges": dq_value_ranges,
}


def _null_profile_sql() -> str:
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ]
    strings = ["l_returnflag", "l_linestatus"]
    parts = [
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS null_{c}"
        for c in cols
    ] + [
        f"CAST(SUM(CASE WHEN trim({c}) = '' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS blank_{c}"
        for c in strings
    ]
    return "SELECT " + ", ".join(parts) + " FROM lineitem"


def _value_ranges_sql() -> str:
    parts = []
    for col, bound in [
        ("l_extendedprice", 1_000_000),
        ("l_discount", 1),
        ("l_tax", 1),
        ("l_quantity", 1_000_000),
    ]:
        parts.append(
            f"CAST(SUM(CASE WHEN abs({col} * 100 - round({col} * 100)) > 1e-6 "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS non2dp_{col}"
        )
        parts.append(
            f"CAST(SUM(CASE WHEN abs({col}) >= {bound} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS oob_{col}"
        )
    return "SELECT " + ", ".join(parts) + " FROM lineitem"


ORACLE = {
    "dq_uniqueness": " UNION ALL ".join(
        f"""
        SELECT '{table}' AS table_name, '{key}' AS key_col,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_keys,
               round((COUNT(*) - COUNT(DISTINCT {key})) / COUNT(*), 6)
                 AS dup_rate
        FROM {table}
        """
        for table, key in _UNIQ_KEYS
    ),
    "dq_k_anonymity": f"""
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS k,
               CASE WHEN COUNT(*) < {_K_ANON} THEN 1 ELSE 0 END AS at_risk
        FROM customer GROUP BY c_nationkey, c_mktsegment
    """,
    "dq_orphan_check": """
        SELECT 'lineitem.l_orderkey->orders' AS relationship,
               (SELECT COUNT(*) FROM lineitem
                WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
                 AS n_orphans
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_partkey NOT IN (SELECT p_partkey FROM part))
        UNION ALL
        SELECT 'lineitem.l_suppkey->supplier',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
        UNION ALL
        SELECT 'orders.o_custkey->customer',
               (SELECT COUNT(*) FROM orders
                WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               (SELECT COUNT(*) FROM customer
                WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
    """,
    "dq_null_profile": _null_profile_sql(),
    "dq_value_ranges": _value_ranges_sql(),
}
