"""Bucketed co-located join: the plan proof that pre-bucketing removes
the join shuffle entirely."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_de_final_project_spark.sources.registry import load_tables, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = spark.conf.get("spark.sql.warehouse.dir", "")
    t = load_tables(
        spark, "/root/testdata/sf0.001", ("orders", "customer"),
        register_views=False,
    )
    write_bucketed(t["orders"], "orders_b", "o_custkey", 8)
    write_bucketed(
        t["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "customer_b", "o_custkey", 8,
    )
    yield "orders_b", "customer_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    _ = wh


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    ob, cb = bucketed_tables
    # disable auto-broadcast so the alternative would be a shuffled SMJ
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(ob).join(spark.table(cb), "o_custkey")
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain(spark, bucketed_tables):
    ob, cb = bucketed_tables
    t = load_tables(
        spark, "/root/testdata/sf0.001", ("orders", "customer"),
        register_views=False,
    )
    plain = (
        t["orders"]
        .join(
            t["customer"].withColumnRenamed("c_custkey", "o_custkey"),
            "o_custkey",
        )
        .count()
    )
    assert spark.table(ob).join(spark.table(cb), "o_custkey").count() == plain
