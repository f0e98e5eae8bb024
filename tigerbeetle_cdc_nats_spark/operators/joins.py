"""Join operators (SURVEY.md §2.3).

The reference consumes events pre-joined by TigerBeetle (transfer ⋈ debit
account ⋈ credit account, message.go:70-77); these operators reproduce that
capability over normalized tables, Spark-first:

- Equi/left/semi/anti joins are plain ``DataFrame.join`` — Catalyst picks
  broadcast vs sort-merge; dimensions under ``session.SMALL_DIMS`` get an
  explicit ``F.broadcast`` hint so a 100 TB fact side never shuffles for a
  MB-scale dim.
- The as-of join (latest dim snapshot at fact time — the temporal semantics
  of the embedded ``*_account.timestamp`` fields, message.go:67) is the
  union-merge formulation: tag both sides, one shuffle on the key, sort by
  (ts, side), carry the last snapshot forward with ``last(ignorenulls)``.
  That is O(n log n) with a SINGLE shuffle and no range-explosion — the
  ranked-join formulation (join on key + ts<=ts then row_number) explodes to
  |events|x|snapshots| per key before filtering, which dies at scale on hot
  keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def enrichment_join(facts: DataFrame, dim: DataFrame, on, *,
                    how: str = "inner", broadcast_dim: bool = True) -> DataFrame:
    """Fact-side-preserving join with an (optionally broadcast) dimension —
    the reconstruction of TigerBeetle's pre-join (SURVEY.md §2.3 J1/J2)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=on, how=how)


def semi_join(facts: DataFrame, dim: DataFrame, on) -> DataFrame:
    return facts.join(dim, on=on, how="left_semi")


def anti_join(facts: DataFrame, dim: DataFrame, on) -> DataFrame:
    return facts.join(dim, on=on, how="left_anti")


def asof_join(facts: DataFrame, snapshots: DataFrame, key: str,
              fact_ts: str, snap_ts: str,
              snap_cols: dict[str, str]) -> DataFrame:
    """Left as-of join: for each fact row, the latest snapshot with
    ``snap_ts <= fact_ts`` on the same key; facts without a prior snapshot
    keep NULL snapshot columns.

    ``snap_cols`` maps snapshot column -> output alias. Output = all fact
    columns + ``<alias>_ts`` (snapshot time) + aliased snapshot columns.

    Implementation: union-merge (single shuffle on ``key``), not a ranked
    range-join — see module docstring for the scale argument.
    """
    out_ts = "asof_ts"
    fact_names = facts.columns

    snaps = snapshots.select(
        F.col(key).alias(key),
        F.col(snap_ts).alias("_merge_ts"),
        F.col(snap_ts).alias(out_ts),
        *[F.col(src).alias(dst) for src, dst in snap_cols.items()],
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
          for c in fact_names if c != key],
    )
    fact_side = facts.select(
        F.col(key),
        F.col(fact_ts).alias("_merge_ts"),
        F.lit(None).cast(snapshots.schema[snap_ts].dataType).alias(out_ts),
        *[F.lit(None).cast(snapshots.schema[src].dataType).alias(dst)
          for src, dst in snap_cols.items()],
        F.lit(1).alias("_side"),
        *[F.col(c) for c in fact_names if c != key],
    )

    # Snapshots sort before facts at equal ts (side 0 < 1) => inclusive <=.
    w = (
        Window.partitionBy(key)
        .orderBy("_merge_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last(out_ts, ignorenulls=True).over(w).alias(out_ts)] + [
        F.last(dst, ignorenulls=True).over(w).alias(dst)
        for dst in snap_cols.values()
    ]
    merged = snaps.unionByName(fact_side).select(
        key, "_merge_ts", "_side", *carried,
        *[c for c in fact_names if c != key],
    )
    return merged.where(F.col("_side") == 1).drop("_merge_ts", "_side")


def salted_skew_join(facts: DataFrame, dim: DataFrame, key: str, *,
                     salt: int = 16, salt_src: str = "event_id") -> DataFrame:
    """Hot-key replicate join: salt the fact side into ``salt`` sub-keys and
    explode the (replicable) dim side once per salt value, joining on
    (key, salt) so one hot key spreads over ``salt`` reducer tasks.

    This is the manual form of AQE's skew-join split for when the skew is
    *known ahead of time* (the reference's event_type has 5 values over the
    whole stream — every shuffle partition of a plain key join would land on
    5 tasks no matter the cluster size). The dim side must be small enough
    to replicate ``salt``x — the usual case, since skewed joins are
    fact-to-mid-size-dim. The join is hinted ``shuffle_hash``: broadcast
    wouldn't skew in the first place (this operator is for dims past the
    broadcast threshold), and sort-merge would re-sort the replicated side.
    """
    salted_facts = facts.withColumn(
        "_salt", (F.col(salt_src) % salt).cast("int"))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.lit(list(range(salt)))))
    joined = salted_facts.join(
        salted_dim.hint("shuffle_hash"), on=[key, "_salt"], how="inner")
    return joined.drop("_salt")
