"""Custom stateful streaming operators via ``applyInPandasWithState``
(north star: "applyInPandasWithState for custom stateful operators").

Two operators the reference's domain implies but Spark has no built-in for:

- ``running_balances``: per-account running debit/credit totals carried
  across micro-batches — the streaming re-derivation of the balance fields
  TigerBeetle embeds in every account snapshot
  (/root/reference/message.go:56-68).
- ``rate_limited_counts``: per-key fixed-window event admission with a
  carried window counter — the streaming generalization of the reference's
  fixed 1 s rate limiter (runner.go:750-793).

State is one small tuple per key (GroupState), so state size is bounded by
key cardinality, not event volume; timeouts evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BALANCE_STATE_SCHEMA = "debits_cents LONG, credits_cents LONG, n_events LONG"
BALANCE_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("debits_posted_cents", T.LongType()),
    T.StructField("credits_posted_cents", T.LongType()),
    T.StructField("n_events", T.LongType()),
])

RATE_STATE_SCHEMA = "window_start LONG, admitted LONG"
RATE_OUTPUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("window_start", T.LongType()),
    T.StructField("n_admitted", T.LongType()),
    T.StructField("n_throttled", T.LongType()),
])

NS_PER_SECOND = 1_000_000_000


def _balance_fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    debits, credits, n = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        cents = (pdf["value"] * 100).apply(lambda v: int(v // 1))
        debits += int(cents[pdf["event_type"] == "purchase"].sum())
        credits += int(cents[pdf["event_type"] == "view"].sum())
        n += len(pdf)
    state.update((debits, credits, n))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "debits_posted_cents": [debits],
        "credits_posted_cents": [credits],
        "n_events": [n],
    })


def running_balances(events: DataFrame) -> DataFrame:
    """Streaming per-account balance accumulator. Input: the raw events
    stream (event_id, ts, user_id, event_type, value, props)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _balance_fn,
            outputStructType=BALANCE_OUTPUT_SCHEMA,
            stateStructType=BALANCE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _rate_fn(key, pdfs: Iterator, state: GroupState, limit: int,
             window_ns: int) -> Iterator:
    import pandas as pd

    window_start, admitted = state.get if state.exists else (-1, 0)
    out: dict[str, list] = {k: [] for k in
                            ("user_id", "window_start", "n_admitted",
                             "n_throttled")}
    throttled = 0
    for pdf in pdfs:
        for ts in sorted(int(t) for t in pdf["ts"]):
            w = ts - ts % window_ns
            if w != window_start:
                if window_start >= 0:
                    out["user_id"].append(key[0])
                    out["window_start"].append(window_start)
                    out["n_admitted"].append(admitted)
                    out["n_throttled"].append(throttled)
                window_start, admitted, throttled = w, 0, 0
            if admitted < limit:
                admitted += 1
            else:
                throttled += 1
    state.update((window_start, admitted))
    out["user_id"].append(key[0])
    out["window_start"].append(window_start)
    out["n_admitted"].append(admitted)
    out["n_throttled"].append(throttled)
    yield pd.DataFrame(out)


def rate_limited_counts(events: DataFrame, limit: int = 4096,
                        window_ns: int = NS_PER_SECOND) -> DataFrame:
    """Streaming per-key fixed-window admission counter (the reference's
    limiter semantics, runner.go:750-793, generalized per key)."""

    def fn(key, pdfs, state):
        return _rate_fn(key, pdfs, state, limit, window_ns)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=RATE_OUTPUT_SCHEMA,
            stateStructType=RATE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HH_STATE_SCHEMA = "items ARRAY<LONG>, counts ARRAY<LONG>, errs ARRAY<LONG>"
HH_OUTPUT_SCHEMA = T.StructType([
    T.StructField("shard", T.LongType()),
    T.StructField("item", T.LongType()),
    T.StructField("est_count", T.LongType()),
    T.StructField("max_err", T.LongType()),
])

#: Tracked items per shard summary — state is O(capacity) per shard
#: forever, regardless of stream volume or item cardinality.
HH_CAPACITY = 64


def _hh_merge(summary: dict, errs: dict, item: int, c: int,
              capacity: int) -> None:
    """SpaceSaving batch-increment: known items add exactly; a new item
    over capacity evicts the current minimum and inherits its count as
    the error bound (Metwally et al.'s update generalized to +c). Ties
    evict the smallest (count, item) for cross-run determinism."""
    if item in summary:
        summary[item] += c
        return
    if len(summary) < capacity:
        summary[item] = c
        errs[item] = 0
        return
    evict = min(summary, key=lambda k: (summary[k], k))
    floor = summary.pop(evict)
    errs.pop(evict, None)
    summary[item] = floor + c
    errs[item] = floor


def _hh_fn(key, pdfs: Iterator, state: GroupState,
           capacity: int = HH_CAPACITY) -> Iterator:
    import pandas as pd

    if state.exists:
        items, counts, errbs = state.get
        summary = dict(zip(items, counts))
        errs = dict(zip(items, errbs))
    else:
        summary, errs = {}, {}
    for pdf in pdfs:
        vc = pdf["user_id"].value_counts()
        # sorted item order makes eviction sequences deterministic
        for item in sorted(int(i) for i in vc.index):
            _hh_merge(summary, errs, item, int(vc[item]), capacity)
    keys = sorted(summary)
    state.update((
        [int(k) for k in keys],
        [int(summary[k]) for k in keys],
        [int(errs.get(k, 0)) for k in keys],
    ))
    yield pd.DataFrame({
        "shard": [key[0]] * len(keys),
        "item": keys,
        "est_count": [summary[k] for k in keys],
        "max_err": [errs.get(k, 0) for k in keys],
    })


def streaming_heavy_hitters(events: DataFrame, *,
                            n_shards: int = 32) -> DataFrame:
    """Streaming heavy hitters: one SpaceSaving summary per shard carried
    across micro-batches — the streaming twin of the batch CMS/heavy-
    hitter sketches (operators/sketches.py).

    Scale shape: state per shard is a FIXED-capacity (item, count, err)
    summary — memory is O(n_shards * capacity) forever, independent of
    event volume and item cardinality (the property exact per-key
    streaming counts lack). Shards parallelize the merge; the classic
    SpaceSaving guarantees hold per shard (true_count <= est_count <=
    true_count + max_err, and any item with shard frequency >
    shard_volume / capacity is guaranteed tracked); a driver-side
    roll-up sums per-item est_count/max_err across shards for the global
    view, exactly like merging CMS rows."""
    shard = (F.col("user_id") % n_shards).cast("long").alias("shard")
    return (
        events.select(shard, "user_id")
        .groupBy("shard")
        .applyInPandasWithState(
            _hh_fn,
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
