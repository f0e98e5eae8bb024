"""Bounded-memory streaming dedup: a Bloom-filter dedup window held in
``applyInPandasWithState`` state.

The reference delegates duplicate suppression to JetStream's server-side
msg-id dedup window (Nats-Msg-Id ``<cluster>/<timestamp>``,
/root/reference/runner.go:595-605; window configured at runner.go:172-184).
Spark's own ``dropDuplicates`` within a watermark keeps every id it has
seen in state — exact, but state grows with the number of DISTINCT ids in
the window, which at 100 TB/day of events is the biggest state store in
the job. This operator trades exactness for a hard memory bound the same
way a production dedup tier does: per shard, a fixed ``m``-bit Bloom
filter remembers ids forever at O(m) bytes; duplicates are always dropped
(no false negatives on "seen"), and a false positive drops a genuinely
new row with probability that stays tiny until the filter saturates — the
right trade under at-least-once delivery, where a dropped re-delivery is
the common case being optimized.

Sharding: rows are grouped by a hash shard of the id, so filter memory and
CPU spread across the cluster; each shard's filter is independent, and the
state row is an ``m/64``-element long array (BINARY-packed by Arrow).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: Per-shard filter geometry: 2^16 bits (8 KiB) x 3 hashes. With the
#: default 32 shards that is 256 KiB of total dedup state for ~2% false
#: positives at ~6k distinct ids/shard; production sizing scales m with the
#: expected distinct-id volume per shard (state cost stays O(shards * m)).
M_BITS = 1 << 16
K_HASHES = 3
N_SHARDS = 32

STATE_SCHEMA = "words ARRAY<LONG>, n_batches LONG"


def _out_schema(id_col: str) -> T.StructType:
    return T.StructType([
        T.StructField(id_col, T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("first_seen_batch", T.LongType()),
    ])


def _dedup_fn(key, pdfs: Iterator, state: GroupState,
              id_col: str) -> Iterator:
    import pandas as pd

    import hashlib

    if state.exists:
        stored_words, batch_no = state.get
        words = list(stored_words)
    else:
        words, batch_no = [0] * (M_BITS // 64), 0
    out_ids: list[str] = []
    for pdf in pdfs:
        for val in pdf[id_col].astype(str):
            # k positions via double hashing over a stable digest (python's
            # hash() is per-process salted, md5 is not)
            h = int.from_bytes(
                hashlib.md5(val.encode()).digest()[:8], "big")
            h2 = int.from_bytes(
                hashlib.md5((val + "#").encode()).digest()[:8], "big")
            positions = [(h + i * h2) % M_BITS for i in range(K_HASHES)]
            if all(words[p // 64] >> (p % 64) & 1 for p in positions):
                continue  # seen (or false positive): drop
            for p in positions:
                words[p // 64] |= 1 << (p % 64)
            out_ids.append(val)
    state.update((words, batch_no + 1))
    yield pd.DataFrame({
        id_col: out_ids,
        "shard": [key[0]] * len(out_ids),
        "first_seen_batch": [batch_no] * len(out_ids),
    })


def bloom_dedup(stream: DataFrame, id_col: str = "msg_id") -> DataFrame:
    """First-occurrence ids from a stream, deduped against a per-shard
    Bloom window. Output: (id_col, shard, first_seen_batch)."""
    sharded = stream.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(N_SHARDS))
        .cast("int"))
    return sharded.groupBy("shard").applyInPandasWithState(
        lambda key, pdfs, state: _dedup_fn(key, pdfs, state, id_col),
        outputStructType=_out_schema(id_col),
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
