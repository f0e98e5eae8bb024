"""Incremental view maintenance (IVM) with retraction weights.

The reference publishes an ordered change stream and leaves materialized
views to consumers (runner.go:425-466, README.md:55-61). The operators in
``operators/changelog.py`` maintain *append-only* aggregates; this module
closes the remaining gap: views that must absorb **deletes / corrections**
(weight −1 rows) and **dimension changes**, i.e. the full multiset-algebra
form of view maintenance (weighted rows, as in differential dataflow and
SQL-standard delta processing).

Model: every delta row carries an integer weight ``w`` (+1 insert, −1
retraction). A view ``V = γ_{g; Σw, Σw·m}(F ⋈ D)`` is maintained in two
levels:

1. **Key-level fact partials** ``U(key) = γ_{key; Σw, Σw·m}(F)`` — the
   stored base. A refresh touches ONLY the delta: ``U' = merge(U, γ(ΔF))``,
   dropping keys whose support (Σw) reaches 0.
2. **Dimension join + rollup** ``V' = γ_{g}(U' ⋈ D')`` — the join input is
   |keys| aggregated rows, never |fact|, so a dimension change (re-mapping
   keys to groups) re-aggregates partials instead of re-scanning the fact.

This two-level split is what makes the view maintainable at 100 TB: refresh
cost is O(|ΔF| + |keys|) regardless of fact size. Everything is
integer-exact (counts and money cents), so merging partials is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def weighted_fact_partials(fact: DataFrame, key: str,
                           measure_expr: str,
                           weight_col: str = "w") -> DataFrame:
    """γ_{key; Σw, Σw·measure}: map-side-combinable weighted partials.

    ``fact`` rows carry integer weight ``weight_col`` (+1/−1); the output is
    one row per key with signed support ``n`` and signed measure ``m``.
    """
    w = F.col(weight_col)
    return fact.groupBy(key).agg(
        F.sum(w).alias("n"),
        F.sum(w * F.expr(measure_expr)).alias("m"),
    )


def merge_partials(base: DataFrame, delta: DataFrame, key: str) -> DataFrame:
    """Merge two key-level partial states by re-aggregating their union,
    dropping keys whose support hits zero (the multiset is empty again).

    A key may only be dropped when its measure also nets to zero: a
    malformed correction stream (retraction carrying a different measure
    than the insert it cancels) would otherwise silently lose money. The
    filter asserts ``m == 0`` on every dropped key, so an imbalance fails
    the job loudly instead of vanishing (integer-exact guarantee).

    Union + one hash aggregation — identical partitioning to the base
    aggregation, so at scale AQE/bucketing can keep this shuffle-free on
    the stored side.
    """
    merged = base.unionByName(delta).groupBy(key).agg(
        F.sum("n").alias("n"), F.sum("m").alias("m"))
    imbalance = F.assert_true(
        F.col("m") == 0,
        F.concat(F.lit("merge_partials: key dropped at support 0 with "
                       "non-zero measure m="), F.col("m").cast("string"),
                 F.lit(" — mismatched retraction in the delta stream")))
    # ONE CaseWhen (branches evaluate lazily and the optimizer cannot
    # split or reorder a single expression, unlike an AND conjunction):
    # n != 0 -> keep; n == 0 -> the assert fires on m != 0, else drop
    # (assert_true yields NULL when it passes -> isNotNull() is false).
    keep = F.when(F.col("n") != 0, F.lit(True)).otherwise(
        imbalance.isNotNull())
    return merged.where(keep)


def rollup_to_groups(partials: DataFrame, dim: DataFrame, key: str,
                     group: str) -> DataFrame:
    """V' = γ_{group; Σn, Σm, count(keys)}(U' ⋈ D').

    ``dim`` must be functional (exactly one row per key) — the effective
    post-delta dimension state. The join sees |keys| rows on both sides.
    """
    joined = partials.join(dim, key)
    return joined.groupBy(group).agg(
        F.sum("n").alias("n_events"),
        F.sum("m").alias("sum_cents"),
        F.count("*").alias("n_users"),
    )


def group_delta(partials_old: DataFrame, delta_partials: DataFrame,
                dim_old: DataFrame, dim_new: DataFrame, key: str,
                group: str) -> DataFrame:
    """The signed group-level change ΔV, computed FROM THE DELTAS ONLY.

    Algebra (per key k, old group g, new group g'):
      a) ΔU(k) attributed to g            — fact changes under the old dim;
      b) for keys with g' ≠ g: −U'(k)→g and +U'(k)→g'  — the move of the
         key's entire *new* total.
    Sum over (a)+(b): g receives ΔU − (U+ΔU) = −U and g' receives U+ΔU —
    exactly V'_new − V_old. Keys with g' = g contribute only (a).

    The two dim snapshots need NOT cover the same key set (each must still
    be functional): the old/new mappings are full-outer-joined, so a key
    present only in ``dim_new`` (new dimension member arriving with its
    first facts) is a pure insert of U'(k) into g', and a key deleted from
    ``dim_new`` is a full removal of its old contribution from g (part (a)
    credited ΔU to g, part (b) retracts U' = U+ΔU, netting −U). A key in
    NEITHER snapshot is unmapped on both sides of the view and correctly
    contributes nothing.

    Emitted as (group, d_events, d_cents) with zero-change groups dropped —
    a retraction/insert stream a downstream consumer can apply.
    """
    du = delta_partials
    u_new = merge_partials(partials_old, du, key)

    # (a) fact deltas under the old dimension mapping.
    part_a = (du.join(dim_old, key)
              .select(F.col(group), F.col("n"), F.col("m")))

    # (b) moved keys: whole new totals re-attributed old→new. Full outer
    # so asymmetric key domains become pure inserts/removals instead of
    # silently dropping out of the delta (V_old + ΔV must equal V_new).
    moved = (dim_old.withColumnRenamed(group, "_g_old")
             .join(dim_new.withColumnRenamed(group, "_g_new"), [key],
                   "full_outer")
             .where(~F.col("_g_old").eqNullSafe(F.col("_g_new"))))
    moved_u = u_new.join(moved, key)
    part_b = (
        moved_u.where(F.col("_g_old").isNotNull())
        .select(F.col("_g_old").alias(group),
                (-F.col("n")).alias("n"), (-F.col("m")).alias("m"))
        .unionByName(
            moved_u.where(F.col("_g_new").isNotNull())
            .select(F.col("_g_new").alias(group),
                    F.col("n"), F.col("m")))
    )

    out = (part_a.unionByName(part_b)
           .groupBy(group)
           .agg(F.sum("n").alias("d_events"), F.sum("m").alias("d_cents")))
    return out.where((F.col("d_events") != 0) | (F.col("d_cents") != 0))
