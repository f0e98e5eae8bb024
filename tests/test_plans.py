"""Physical-plan regression tests: the properties that make these operators
survive a 100x scale-up are asserted, not assumed.

Each test states the scale argument it protects.
"""

from __future__ import annotations

import pytest

from tigerbeetle_cdc_nats_spark import registry
from tigerbeetle_cdc_nats_spark.operators.scan import (
    cdc_incremental_scan,
    timestamp_range_filter,
)
from tigerbeetle_cdc_nats_spark.plans import (
    count_nodes,
    physical_plan,
    pushed_filters,
)
from tigerbeetle_cdc_nats_spark.session import load_table

QUERIES = registry.all_queries()


def plan_of(spark, sf_dir, name: str) -> str:
    return physical_plan(QUERIES[name].fn(spark, sf_dir))


def test_incremental_scan_is_heap_topk_not_global_sort(spark, sf_dir):
    """orderBy+limit must compile to TakeOrderedAndProject (per-partition
    k-heap) — a global Sort+Exchange would shuffle the whole 100 TB tail."""
    plan = plan_of(spark, sf_dir, "cdc_incremental_scan")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_raw_cursor_filter_pushes_to_parquet(spark, sf_dir):
    """On the raw engine path (no oracle ts-shim) the cursor predicate must
    reach the parquet scan for row-group min/max pruning."""
    ev = load_table(spark, sf_dir, "events")
    df = cdc_incremental_scan(ev, cursor=1705000000000000000)
    assert any("GreaterThanOrEqual(ts" in f for f in pushed_filters(df))
    df2 = timestamp_range_filter(ev, 1, 2)
    fs = pushed_filters(df2)
    assert any("GreaterThanOrEqual(ts" in f for f in fs)
    assert any("LessThanOrEqual(ts" in f for f in fs)


def test_topk_uses_heap(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "top_k_by_amount")
    assert "TakeOrderedAndProject" in plan


@pytest.mark.parametrize("name", [
    "event_enrichment_join",
    "left_enrichment_join",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "knn_bruteforce_cosine",
])
def test_dim_joins_broadcast(spark, sf_dir, name):
    """Dimension joins must broadcast — a sort-merge join would shuffle the
    fact side (the 100 TB side) for a MB-scale dim."""
    plan = plan_of(spark, sf_dir, name)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name,expected_hinted", [
    ("q3_shipping_priority", 0),   # customer/orders/lineitem all SF-scaled
    ("q5_nation_revenue", 2),      # only nation + region are fixed-size
    ("q14_promo_revenue", 0),      # part is SF-scaled
    ("top_suppliers_by_revenue", 0),  # supplier is SF-scaled
])
def test_no_forced_broadcast_of_sf_scaled_tables(spark, sf_dir, name,
                                                 expected_hinted):
    """Explicit F.broadcast bypasses the autoBroadcast threshold, so a hint
    on an SF-scaled table (customer/supplier/part/orders) OOMs executors at
    100 TB. With the threshold disabled, the only BroadcastHashJoins left in
    the plan are the hinted ones — there must be exactly as many as there
    are fixed-size dims (nation=25/region=5 rows at ANY SF), never more.
    AQE still promotes small filtered sides to broadcast at runtime."""
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES[name].fn(spark, sf_dir)
        n_bhj = count_nodes(df, "BroadcastHashJoin")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert n_bhj == expected_hinted


def test_q3_filters_pushed_to_scans(spark, sf_dir):
    fs = " ".join(pushed_filters(QUERIES["q3_shipping_priority"].fn(spark, sf_dir)))
    assert "GreaterThan(l_shipdate" in fs
    assert "LessThan(o_orderdate" in fs
    assert "EqualTo(c_mktsegment" in fs


def test_q1_single_shuffle_partial_agg(spark, sf_dir):
    """Q1 must partial-aggregate map-side: two HashAggregates around exactly
    one Exchange — at 100 TB the shuffle carries 6 groups, not 600M rows."""
    df = QUERIES["q1_pricing_summary"].fn(spark, sf_dir)
    assert count_nodes(df, "HashAggregate") == 2
    assert count_nodes(df, "Exchange") == 1


def test_scan_prunes_columns(spark, sf_dir):
    """A 2-column projection must not read all 16 lineitem columns."""
    df = QUERIES["q1_pricing_summary"].fn(spark, sf_dir)
    plan = physical_plan(df)
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m and "l_orderkey" not in m[0]  # unused columns pruned from scan


def test_asof_join_no_range_explosion(spark, sf_dir):
    """The as-of join must be the union-merge form: no nested-loop or
    cartesian product anywhere in the plan (hot keys would explode)."""
    plan = plan_of(spark, sf_dir, "asof_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_jaccard_join_is_salted_equality_join(spark, sf_dir):
    """Pair generation must be an equality join on (block, salt) — never a
    cartesian product. At tiny SF Catalyst rightly broadcasts the doc table;
    with broadcast disabled (the 100 TB regime, where the corpus exceeds any
    broadcast threshold) the plan must fall back to a shuffled equality join
    on the pinned (block, salt) partitioning."""
    plan = plan_of(spark, sf_dir, "ngram_jaccard_dedup")
    assert "CartesianProduct" not in plan
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan_big = plan_of(spark, sf_dir, "ngram_jaccard_dedup")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "CartesianProduct" not in plan_big
    assert "SortMergeJoin" in plan_big or "ShuffledHashJoin" in plan_big


def test_minhash_lsh_is_equality_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "minhash_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_is_equality_join(spark, sf_dir):
    """The bucketized range join must plan as an equality join on the grain
    bucket — a naive interval join nests loops over the whole 100 TB side."""
    plan = plan_of(spark, sf_dir, "range_join_windows")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
