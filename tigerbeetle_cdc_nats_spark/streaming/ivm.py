"""Streaming incremental view maintenance with retraction weights.

The batch algebra lives in ``operators/ivm.py``; this module runs it
continuously over a stream of weighted delta rows (w=+1 inserts, w=−1
deletes/corrections) — the consumer-side maintenance loop for a view that
must absorb corrections, downstream of the reference's at-least-once event
stream (runner.go:442-462).

Why foreachBatch instead of a plain streaming aggregation: a SUM-based
aggregation cannot *drop* zero-support keys from its state, and replaying
a micro-batch after a crash would double-count the weights (SUM is not
idempotent, unlike the max-of-struct view in streaming/materialize.py).
The foreachBatch form is the production shape (what a MERGE INTO sink
does):

- each micro-batch's delta partials merge with the stored key partials
  (``merge_partials`` — re-aggregate the union, drop support-0 keys);
- the merged state is written to a NEW versioned directory
  ``state_dir/v{batch_id}`` and the version pointer advances only then;
- **replay idempotence** comes from the batch id: a replayed batch finds
  its version directory already present and skips the merge — the
  classic transactional-sink dedup contract of foreachBatch.

State size is |live keys| rows — the floor for any delete-aware view.
At scale the versioned-directory swap is what table formats (Delta,
Iceberg) implement natively; plain parquet + version pointer keeps the
same atomicity on any filesystem with atomic rename.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from tigerbeetle_cdc_nats_spark.operators import ivm

_SCHEMA = "k long, n long, m long"

#: Marker file binding a state_dir to the streaming query that owns it.
_OWNER_MARKER = "_query_id"


def _latest_version(state_dir: str) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    vs = [int(d[1:]) for d in os.listdir(state_dir)
          if d.startswith("v") and d[1:].isdigit()
          and os.path.exists(os.path.join(state_dir, d, "_SUCCESS"))]
    return max(vs) if vs else None


def list_versions(state_dir: str) -> list[int]:
    """Committed state versions, oldest first (only _SUCCESS-marked)."""
    if not os.path.isdir(state_dir):
        return []
    return sorted(int(d[1:]) for d in os.listdir(state_dir)
                  if d.startswith("v") and d[1:].isdigit()
                  and os.path.exists(os.path.join(state_dir, d, "_SUCCESS")))


def read_state(spark: SparkSession, state_dir: str,
               version: int | None = None) -> DataFrame:
    """Merged partials at a version (default: latest). Because every batch
    writes a NEW _SUCCESS-marked directory and never rewrites an old one,
    the version history doubles as snapshot time travel — read the view
    exactly as it stood after any past batch (the Delta/Iceberg
    `VERSION AS OF` semantics on plain parquet). Empty before the first
    batch; asking for an uncommitted version raises."""
    if version is None:
        version = _latest_version(state_dir)
        if version is None:
            return spark.createDataFrame([], _SCHEMA)
    elif version not in list_versions(state_dir):
        raise ValueError(f"no committed state version v{version} "
                         f"in {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"v{version}"))


def prune_versions(state_dir: str, keep_last: int) -> list[int]:
    """Drop all but the newest ``keep_last`` committed versions (disk is
    otherwise |live keys| x number-of-batches and grows without bound).
    Returns the pruned version numbers. Time travel remains available for
    the retained window; reading a pruned version raises via read_state's
    committed-version check."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the live state)")
    import shutil

    versions = list_versions(state_dir)
    pruned = versions[:-keep_last]
    for v in pruned:
        shutil.rmtree(os.path.join(state_dir, f"v{v}"), ignore_errors=True)
    return pruned


def _stream_identity(checkpoint: str) -> str:
    """Identity of the streaming run that owns a checkpoint: the query id
    Structured Streaming writes to ``{checkpoint}/metadata`` at first
    start (stable across restarts, fresh when the checkpoint is deleted),
    falling back to the checkpoint path before the query has started."""
    meta = os.path.join(checkpoint, "metadata")
    try:
        with open(meta, encoding="utf-8") as fh:
            return str(json.load(fh)["id"])
    except (OSError, ValueError, KeyError):
        return os.path.abspath(checkpoint)


def ivm_sink(state_dir: str, key: str = "k", measure_expr: str = "m",
             weight_col: str = "w", checkpoint: str | None = None,
             retain_versions: int | None = None):
    """foreachBatch function maintaining weighted key partials in
    ``state_dir``. Input rows: (key, measure, weight).

    When ``checkpoint`` is given, the state_dir is bound to that
    checkpoint's query id via a marker file: batch ids restart at 0 after
    a checkpoint reset, so without the binding a reset checkpoint over
    kept state would find ``v0/_SUCCESS`` present and silently skip
    genuinely new data as a "replay". A mismatched marker fails fast.

    ``retain_versions``: keep only the newest N committed versions after
    each batch (None = unbounded history / full time travel).
    """

    def process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if checkpoint is not None:
            ident = _stream_identity(checkpoint)
            marker = os.path.join(state_dir, _OWNER_MARKER)
            if os.path.exists(marker):
                with open(marker, encoding="utf-8") as fh:
                    owner = fh.read().strip()
                if owner != ident:
                    raise RuntimeError(
                        f"ivm_sink: state_dir {state_dir} belongs to "
                        f"stream {owner!r} but this query is {ident!r} — "
                        f"the checkpoint was reset while state was kept; "
                        f"replay skip on batch ids would drop data. Clear "
                        f"the state_dir or restore the checkpoint.")
            else:
                os.makedirs(state_dir, exist_ok=True)
                with open(marker, "w", encoding="utf-8") as fh:
                    fh.write(ident)
        out = os.path.join(state_dir, f"v{batch_id}")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            return  # replayed batch: already merged — idempotent skip
        delta = ivm.weighted_fact_partials(batch, key, measure_expr,
                                           weight_col=weight_col)
        if key != "k":
            delta = delta.withColumnRenamed(key, "k")
        merged = ivm.merge_partials(read_state(spark, state_dir),
                                    delta, "k")
        merged.write.mode("overwrite").parquet(out)
        if retain_versions is not None:
            prune_versions(state_dir, retain_versions)

    return process


def run_ivm_stream(deltas: DataFrame, state_dir: str, checkpoint: str,
                   key: str = "k", measure_expr: str = "m",
                   weight_col: str = "w",
                   retain_versions: int | None = None):
    """Wire a weighted-delta stream into the IVM sink (availableNow —
    drains what exists, then stops; call repeatedly for a long-lived
    pipeline or swap the trigger for processingTime)."""
    return (deltas.writeStream
            .foreachBatch(ivm_sink(state_dir, key, measure_expr,
                                   weight_col, checkpoint=checkpoint,
                                   retain_versions=retain_versions))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
