"""Format round-trips, partitioned sinks with dynamic overwrite,
bucketed join without Exchange."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from aichemy_data_pipelines_spark.catalog import load_table
from aichemy_data_pipelines_spark.plans.explain import formatted_plan
from aichemy_data_pipelines_spark.sources.formats import (
    bucketed_join,
    read_csv,
    read_json,
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


def test_csv_json_roundtrip(spark, tmp_path):
    nation = load_table(spark, SF_SMOKE, "nation")
    csv_p, json_p = str(tmp_path / "n_csv"), str(tmp_path / "n_json")
    nation.write.mode("overwrite").option("header", "true").csv(csv_p)
    nation.write.mode("overwrite").json(json_p)
    schema = "n_nationkey int, n_name string, n_regionkey int"
    got_csv = read_csv(spark, csv_p, schema)
    got_json = read_json(spark, json_p, schema)
    want = sorted(map(tuple, nation.collect()))
    assert sorted(map(tuple, got_csv.collect())) == want
    assert sorted(map(tuple, got_json.collect())) == want


def test_partitioned_write_and_dynamic_overwrite(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["status"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("status=")
    ) == ["status=F", "status=O", "status=P"]
    # partition pruning reaches the file listing
    pruned = spark.read.parquet(path).where(F.col("status") == "F")
    plan = formatted_plan(pruned)
    assert "PartitionFilters" in plan and "status" in plan
    # dynamic overwrite replaces ONLY the partitions present in df
    only_f = orders.where(F.col("status") == "F").limit(10)
    write_partitioned(only_f, path, ["status"])
    got = spark.read.parquet(path)
    assert got.where("status = 'F'").count() == 10
    assert (
        got.where("status = 'O'").count()
        == orders.where("status = 'O'").count()
    )


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    import re
    import shutil

    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, sort_by="o_orderkey")
    # disable broadcast so the planner actually uses the bucketing (at
    # this tiny SF it would rather broadcast; at fact-fact scale it
    # can't)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = formatted_plan(joined)
        # shuffle nodes print as bare 'Exchange (n)'; BroadcastExchange
        # is a different node name
        shuffles = re.findall(r"(?<!Broadcast)Exchange \(\d", plan)
        assert not shuffles, f"bucketed join still shuffles:\n{plan}"
        want = orders.join(li, "o_orderkey").count()
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
