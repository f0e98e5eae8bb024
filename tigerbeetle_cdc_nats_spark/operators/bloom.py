"""Bit-packed Bloom-filter semi-join prefilter, pure DataFrame ops.

The 100 TB problem this solves: a selective dimension predicate (e.g.
"urgent orders only") should prune the *fact* scan before the fact side
pays the join shuffle. Spark's own runtime row-level filtering does this
internally with ``BloomFilterAggregate``, but that expression is not
exposed to SQL/PySpark (``bloom_filter_agg`` is analyzer-internal), so
this module builds the same structure out of public primitives:

- **build**: hash every build-side key with ``k`` seeded ``xxhash64``
  calls, bit-pack the positions into 64-bit words with
  ``groupBy(word).agg(bit_or(mask))`` — a map-side-combinable aggregation
  producing at most ``m/64`` rows (a few thousand), independent of build
  cardinality.
- **probe**: ``k`` *broadcast* left joins word→mask (each a few KB), then
  an AND over the bit tests. No shuffle touches the fact table; the whole
  probe is map-side, whole-stage-codegen'd, and rows failing the filter
  never reach the exact join that follows.

Because Bloom filters have no false negatives, composing
``bloom_prefilter -> exact semi join`` is result-identical to the exact
semi join alone — which is what makes the operator oracle-checkable.

Reference parity note: the reference has no joins at all (SURVEY.md §2.3
"absent"); this is part of the engine's own relational surface, motivated
by runner.go's dedup-window membership test (runner.go:595-605) scaled to
fact-table cardinalities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Default filter geometry: 2^17 bits / 3 hashes keeps the false-positive
#: rate under ~1% up to ~10k build keys (p ≈ (1 - e^{-kn/m})^k). At real
#: scale callers size m from the build-side count estimate — the builder
#: cost is O(k·n) hashes plus a ≤ m/64-row aggregate either way.
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 3


def _positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k seeded 64-bit hash positions in [0, m_bits). Seeds are injected as
    extra hash inputs (xxhash64 is variadic), which is how you derive a
    hash family from one function without leaving codegen."""
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(keys: DataFrame, key: str,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> DataFrame:
    """Aggregate a build-side key column into packed bloom words
    ``(word: bigint, mask: bigint)``.

    One narrow projection + one tiny aggregation; the groupBy key space is
    ``m_bits/64`` regardless of input size, so partial aggregation collapses
    almost everything map-side.
    """
    kc = F.col(key)
    pos = F.explode(F.array(*_positions(kc, k, m_bits))).alias("pos")
    return (
        keys.select(pos)
        .select(F.expr("pos DIV 64").alias("word"),
                # F.shiftleft only takes a literal shift; the SQL form
                # accepts a column shift and stays in codegen
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
                .alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_probe(probe: DataFrame, key: str, words: DataFrame,
                m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K) -> DataFrame:
    """Keep only probe rows whose key might be in the filter (no false
    negatives; false positives pass and must be resolved by an exact join).

    Each of the ``k`` membership tests is a broadcast left join on the
    packed word index — the fact side stays un-shuffled. The word index is
    persisted because the per-test column renames give the three broadcast
    subtrees different canonical forms, defeating ReusedExchange — without
    it the build-side scan+aggregate would run k times.
    """
    from pyspark import StorageLevel

    words = words.persist(StorageLevel.MEMORY_AND_DISK)
    out = probe
    keep = F.lit(True)
    for i, pos in enumerate(_positions(F.col(key), k, m_bits)):
        w = (words.withColumnRenamed("word", f"_bw{i}")
             .withColumnRenamed("mask", f"_bm{i}"))
        out = out.withColumn(f"_bp{i}", pos).join(
            F.broadcast(w),
            F.expr(f"_bp{i} DIV 64") == F.col(f"_bw{i}"),
            "left")
        keep = keep & (
            F.expr(f"shiftright(coalesce(_bm{i}, CAST(0 AS BIGINT)),"
                   f" CAST(_bp{i} % 64 AS INT)) & 1") == F.lit(1))
    drop = [c for i in range(k) for c in (f"_bp{i}", f"_bw{i}", f"_bm{i}")]
    return out.where(keep).drop(*drop)
