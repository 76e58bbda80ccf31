from __future__ import annotations

import pytest

from aichemy_data_pipelines_spark.functions.sizing import GB, recommend_conf


def test_100tb_plan_shape():
    plan = recommend_conf(100 * 1000 * GB)
    assert 200_000 < plan.scan_tasks < 500_000
    assert 100_000 < plan.shuffle_partitions < 300_000
    assert plan.executors_recommended > 50
    # a 10x tighter SLA needs ~10x the executors
    fast = recommend_conf(100 * 1000 * GB, target_stage_minutes=3.0)
    assert fast.executors_recommended >= 9 * plan.executors_recommended
    assert plan.conf["spark.sql.adaptive.enabled"] == "true"


def test_small_input_floors():
    plan = recommend_conf(10 * 1024 * 1024)
    assert plan.scan_tasks == 1
    assert plan.shuffle_partitions == 1
    assert plan.executors_recommended >= 1


def test_monotonic_in_input():
    a = recommend_conf(1 * GB)
    b = recommend_conf(100 * GB)
    assert b.scan_tasks > a.scan_tasks
    assert b.shuffle_partitions >= a.shuffle_partitions


def test_rejects_nonpositive():
    with pytest.raises(ValueError):
        recommend_conf(0)
