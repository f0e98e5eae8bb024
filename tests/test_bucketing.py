"""Bucketed co-located join: the plan must contain NO Exchange — both sides
read pre-partitioned by the bucket spec."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.plans import count_nodes, physical_plan
from tigerbeetle_cdc_nats_spark.registry import events_table
from tigerbeetle_cdc_nats_spark.session import load_table
from tigerbeetle_cdc_nats_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    ev = events_table(spark, "/root/testdata/sf0.001").withColumnRenamed(
        "user_id", "account_id")
    cust = load_table(spark, "/root/testdata/sf0.001", "customer") \
        .withColumnRenamed("c_custkey", "account_id")
    write_bucketed(ev, "ev_bucketed", "account_id", buckets=8,
                   path=str(warehouse / "ev"))
    write_bucketed(cust, "cust_bucketed", "account_id", buckets=8,
                   path=str(warehouse / "cust"))
    yield
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS cust_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the sort-merge path (the big-big regime bucketing exists for).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "ev_bucketed", "cust_bucketed",
                               "account_id")
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert count_nodes(joined, "Exchange") == 0  # co-located: no shuffle
        # Same result as the plain join.
        ev = events_table(spark, "/root/testdata/sf0.001")
        cust = load_table(spark, "/root/testdata/sf0.001", "customer")
        expected = ev.join(cust, ev.user_id == cust.c_custkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_unbucketed_same_join_shuffles(spark, bucketed):
    """Control: the identical join over plain parquet needs exchanges."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ev = events_table(spark, "/root/testdata/sf0.001").withColumnRenamed(
            "user_id", "account_id")
        cust = load_table(spark, "/root/testdata/sf0.001", "customer") \
            .withColumnRenamed("c_custkey", "account_id")
        joined = ev.join(cust, on="account_id")
        assert count_nodes(joined, "Exchange") >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
