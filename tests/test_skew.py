"""Salted join produces exactly the plain join's result."""

from __future__ import annotations

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.functions.skew import salted_join
from tests.conftest import SF_SMOKE


def test_salted_join_equals_plain_join(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_linenumber"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    plain = li.join(orders, "o_orderkey")
    salted = salted_join(li, orders, "o_orderkey", n_salt=8)
    key = lambda r: (r["o_orderkey"], r["l_linenumber"])  # noqa: E731
    assert sorted(
        ((r.o_orderkey, r.l_linenumber, r.l_quantity, r.o_orderpriority)
         for r in salted.collect())
    ) == sorted(
        ((r.o_orderkey, r.l_linenumber, r.l_quantity, r.o_orderpriority)
         for r in plain.collect())
    )


def test_salted_left_join_keeps_unmatched(spark):
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    urgent = load_table(spark, SF_SMOKE, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey", "o_orderpriority")
    plain = orders.join(urgent, "o_orderkey", "left")
    salted = salted_join(orders, urgent, "o_orderkey", n_salt=4, how="left")
    assert salted.count() == plain.count()
    assert (
        salted.where(F.col("o_orderpriority").isNull()).count()
        == plain.where(F.col("o_orderpriority").isNull()).count()
    )

def test_salted_join_rejects_right_and_full(spark):
    import pytest

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    dim = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="not supported"):
            salted_join(orders, dim, "o_orderkey", how=how)


def test_salted_distinct_count_equals_plain(spark):
    from aichemy_data_pipelines_spark.functions.skew import (
        salted_distinct_count,
    )

    events = load_table(spark, SF_SMOKE, "events")
    got = {
        r.event_type: (r.n_distinct, r.n_rows)
        for r in salted_distinct_count(
            events, "event_type", "user_id", n_salt=16
        ).collect()
    }
    want = {
        r.event_type: (r.n_distinct, r.n_rows)
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_distinct"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert got == want
