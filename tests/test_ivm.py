"""Edge cases of the weighted IVM algebra (operators/ivm.py) on tiny
hand-computed inputs: full retraction drops the key, dimension moves
re-attribute whole new totals, and the delta path equals naive recompute.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators import ivm


def _fact(spark, rows):
    return spark.createDataFrame(rows, "k long, v long, w int")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "k long, g string")


def test_full_retraction_drops_key(spark):
    base = ivm.weighted_fact_partials(
        _fact(spark, [(1, 10, 1), (2, 5, 1)]), "k", "v")
    delta = ivm.weighted_fact_partials(
        _fact(spark, [(1, 10, -1)]), "k", "v")
    merged = {r["k"]: (r["n"], r["m"])
              for r in ivm.merge_partials(base, delta, "k").collect()}
    assert merged == {2: (1, 5)}  # key 1's support reached zero


def test_rollup_counts_keys_not_rows(spark):
    parts = spark.createDataFrame([(1, 3, 30), (2, 2, 20), (3, 1, 7)],
                                  "k long, n long, m long")
    dim = _dim(spark, [(1, "a"), (2, "a"), (3, "b")])
    out = {r["g"]: (r["n_events"], r["sum_cents"], r["n_users"])
           for r in ivm.rollup_to_groups(parts, dim, "k", "g").collect()}
    assert out == {"a": (5, 50, 2), "b": (1, 7, 1)}


def test_group_delta_equals_naive_diff(spark):
    # Old facts: k1 two rows, k2 one row. Delta: insert for k1, full
    # retraction of k2's row, insert for new key k3. Dim: k1 moves a->b.
    old = _fact(spark, [(1, 10, 1), (1, 20, 1), (2, 5, 1)])
    du_rows = _fact(spark, [(1, 7, 1), (2, 5, -1), (3, 100, 1)])
    dim_old = _dim(spark, [(1, "a"), (2, "a"), (3, "b")])
    dim_new = _dim(spark, [(1, "b"), (2, "a"), (3, "b")])

    u_old = ivm.weighted_fact_partials(old, "k", "v")
    du = ivm.weighted_fact_partials(du_rows, "k", "v")
    got = {r["g"]: (r["d_events"], r["d_cents"])
           for r in ivm.group_delta(u_old, du, dim_old, dim_new,
                                    "k", "g").collect()}

    # Naive: V_old = {a: (3, 35), b: (0, 0)};
    # V_new (k1->b 3 rows 37, k2 gone, k3->b 1 row 100) = {b: (4, 137)}.
    assert got == {"a": (-3, -35), "b": (4, 137)}


def test_delta_path_matches_full_recompute(spark):
    # Randomized-but-deterministic slightly larger case.
    old = _fact(spark, [(k, (k * 7) % 13, 1) for k in range(40)])
    du_rows = _fact(
        spark,
        [(k, (k * 7) % 13, -1) for k in range(0, 40, 5)]      # deletes
        + [(k, (k * 3) % 11, 1) for k in range(30, 60)])       # inserts
    dim_old = _dim(spark, [(k, f"g{k % 3}") for k in range(60)])
    dim_new = _dim(spark, [(k, f"g{(k % 3) + (1 if k % 4 == 0 else 0)}")
                           for k in range(60)])

    u_old = ivm.weighted_fact_partials(old, "k", "v")
    du = ivm.weighted_fact_partials(du_rows, "k", "v")
    u_new = ivm.merge_partials(u_old, du, "k")
    incremental = {r["g"]: (r["n_events"], r["sum_cents"], r["n_users"])
                   for r in ivm.rollup_to_groups(u_new, dim_new,
                                                 "k", "g").collect()}

    survivors = old.unionByName(du_rows)
    naive_parts = (survivors.groupBy("k")
                   .agg(F.sum("w").alias("n"),
                        F.sum(F.col("w") * F.col("v")).alias("m"))
                   .where(F.col("n") != 0))
    naive = {r["g"]: (r["n_events"], r["sum_cents"], r["n_users"])
             for r in ivm.rollup_to_groups(naive_parts, dim_new,
                                           "k", "g").collect()}
    assert incremental == naive


def test_group_delta_asymmetric_dim_keys(spark):
    """Keys present in only ONE dim snapshot still balance the delta:
    V_old + ΔV == V_new (round-4 advisory: inner joins dropped them)."""
    # k1 stays in group a; k3 is NEW in dim_new (arrives with facts);
    # k2 is DELETED from dim_new while keeping fact support.
    old = _fact(spark, [(1, 10, 1), (2, 5, 1)])
    du_rows = _fact(spark, [(3, 100, 1), (2, 1, 1)])
    dim_old = _dim(spark, [(1, "a"), (2, "a")])
    dim_new = _dim(spark, [(1, "a"), (3, "b")])

    u_old = ivm.weighted_fact_partials(old, "k", "v")
    du = ivm.weighted_fact_partials(du_rows, "k", "v")
    got = {r["g"]: (r["d_events"], r["d_cents"])
           for r in ivm.group_delta(u_old, du, dim_old, dim_new,
                                    "k", "g").collect()}

    # V_old = {a: (2, 15)}  (k1 10 + k2 5)
    # V_new = rollup(u_new, dim_new) = {a: (1, 10), b: (1, 100)}
    # ΔV must be {a: (-1, -5), b: (1, 100)}.
    assert got == {"a": (-1, -5), "b": (1, 100)}

    # And it matches the naive recompute exactly.
    u_new = ivm.merge_partials(u_old, du, "k")
    v_new = {r["g"]: (r["n_events"], r["sum_cents"])
             for r in ivm.rollup_to_groups(u_new, dim_new,
                                           "k", "g").collect()}
    v_old = {r["g"]: (r["n_events"], r["sum_cents"])
             for r in ivm.rollup_to_groups(u_old, dim_old,
                                           "k", "g").collect()}
    applied = dict(v_old)
    for g, (dn, dm) in got.items():
        n0, m0 = applied.get(g, (0, 0))
        applied[g] = (n0 + dn, m0 + dm)
    applied = {g: v for g, v in applied.items() if v != (0, 0)}
    assert applied == v_new


def test_merge_partials_mismatched_retraction_fails_loudly(spark):
    """A retraction whose measure differs from the insert it cancels must
    raise, not silently lose the residual money."""
    import pytest

    base = ivm.weighted_fact_partials(_fact(spark, [(1, 10, 1)]), "k", "v")
    bad = ivm.weighted_fact_partials(_fact(spark, [(1, 7, -1)]), "k", "v")
    with pytest.raises(Exception, match="(?i)mismatched retraction|assert"):
        ivm.merge_partials(base, bad, "k").collect()
    # A balanced retraction still merges cleanly.
    good = ivm.weighted_fact_partials(_fact(spark, [(1, 10, -1)]), "k", "v")
    assert ivm.merge_partials(base, good, "k").count() == 0
