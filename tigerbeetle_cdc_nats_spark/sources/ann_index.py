"""Persisted ANN index layout: the embedding corpus written bucket-partitioned.

The ANN queries (queries_similarity) bucket the corpus per session; at
100 TB the bucketing IS the index and must be a stored artifact, not a
per-query computation. This module writes the corpus partitioned by its
LSH bucket (and, for IVF, by cell) so that:

- a query vector's candidate fetch reads ONLY its bucket's files —
  partition pruning turns the candidate scan from O(corpus) to
  O(corpus / 2^planes) at the FILE level, before any row is decoded;
- multi-probe reads (bucket + 1-bit-flip neighbors) become an IN filter
  over partition values — still pruned;
- index rebuilds are incremental per partition (new vectors append to
  their bucket's directory).

The bucket derivation is the same deterministic hyperplane expression the
queries use (operators/similarity.bucket_col), so a stored index and an
in-session bucketing agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tigerbeetle_cdc_nats_spark.operators import similarity as sim


def write_ann_index(embeddings: DataFrame, path: str,
                    planes: list[list[float]], *,
                    vec_col: str = "embedding", dim: int | None = None,
                    mode: str = "overwrite") -> None:
    """Bucket-partitioned index: one partition directory per LSH bucket."""
    (sim.signature_cols(embeddings, [planes], vec_col, dim,
                        bucket_names=["bucket"])
     .write.mode(mode).partitionBy("bucket").parquet(path))


def append_ann_index(new_vectors: DataFrame, path: str,
                     planes: list[list[float]], *,
                     vec_col: str = "embedding",
                     dim: int | None = None) -> None:
    """Incremental maintenance: new vectors append into their bucket's
    partition directory (same deterministic plane set as the original
    build — the caller owns plane-set versioning); existing partitions
    are untouched, so a daily embedding batch costs O(|delta|)."""
    write_ann_index(new_vectors, path, planes, vec_col=vec_col, dim=dim,
                    mode="append")


def read_ann_index(spark: SparkSession, path: str) -> DataFrame:
    from tigerbeetle_cdc_nats_spark.session import configure

    configure(spark)
    return spark.read.parquet(path)


def probe_buckets(index: DataFrame, buckets: list[int]) -> DataFrame:
    """Candidate fetch for a (multi-)probe set: an IN filter on the
    partition column — prunes to |buckets| directories at the file level."""
    return index.where(F.col("bucket").isin([int(b) for b in buckets]))
