"""Similarity search over embedding columns (BASELINE.json north star).

Two tiers, mirroring how ANN works at 100 TB:
- ``knn_bruteforce``: exact cosine top-k. The query side is tiny and
  broadcast; candidates stream through map-side — one TakeOrderedAndProject
  per query, no shuffle of the candidate set. Correct baseline; O(Q x N).
- ``lsh_buckets`` / ``ann_lsh``: random-hyperplane LSH — candidates are
  found via an EQUALITY join on the bucket id, so the 100 TB candidate set
  is hash-partitioned once and each query only touches its bucket. This is
  the IVF/LSH scale path; recall is tunable via bits/tables.

Dot products run as ``zip_with``+``aggregate`` fold over the array column —
JVM codegen, Arrow-free, no Python. Similarities are exposed as
``FLOOR(cos * 1e6)`` BIGINTs: floating accumulation is sequential on both
engines and the integer floor makes results hash-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SIM_SCALE = 1_000_000


def _fold_dot(a: Column, b: Column) -> Column:
    """Sequential left fold of sum(a[i]*b[i]) in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim_e6(a: Column, b: Column) -> Column:
    """FLOOR(cosine(a, b) * 1e6) as BIGINT (hash-stable cross-engine)."""
    dot = _fold_dot(a, b)
    na = F.sqrt(_fold_dot(a, a))
    nb = F.sqrt(_fold_dot(b, b))
    return F.floor(dot / (na * nb) * SIM_SCALE).cast("long")


def norm_col(vec: Column) -> Column:
    """sqrt(v . v) — precompute per VECTOR before a pair join so each
    candidate pair folds one dot product instead of three. The array fold
    is Catalyst's interpreted path, so cutting folds 3x is a measured ~2x
    on the pair stage; the reused norm is the same sequential fold, so
    FLOOR(cos*1e6) results are bit-identical to cosine_sim_e6."""
    return F.sqrt(_fold_dot(vec, vec))


def cosine_sim_e6_prenorm(a: Column, b: Column,
                          na: Column, nb: Column) -> Column:
    """cosine_sim_e6 with both norms precomputed via norm_col."""
    return F.floor(_fold_dot(a, b) / (na * nb) * SIM_SCALE).cast("long")


def sql_dot(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def sql_cosine_e6(a: str, b: str) -> str:
    return (
        f"CAST(FLOOR({sql_dot(a, b)} / "
        f"(sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})) * {SIM_SCALE}) AS BIGINT)"
    )


def knn_bruteforce(embeddings: DataFrame, query_ids, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k neighbors for each query id (excluding self)."""
    q = embeddings.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"),
        norm_col(F.col(vec_col)).alias("q_n"),
    )
    from tigerbeetle_cdc_nats_spark.session import ensure_parallelism

    c = ensure_parallelism(embeddings.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"),
        norm_col(F.col(vec_col)).alias("c_n"),
    ))
    sim = cosine_sim_e6_prenorm(F.col("q_emb"), F.col("c_emb"),
                                F.col("q_n"), F.col("c_n"))
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("c_id"))
        .select("q_id", "c_id", sim.alias("sim_e6"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e6").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim_e6", "rank")
    )


def planes_for_corpus(corpus_size: int, *, target_bucket: int = 256,
                      min_planes: int = 4, max_planes: int = 30) -> int:
    """Hyperplane count scaled to the corpus: 2^planes buckets sized so the
    expected bucket population stays ~``target_bucket`` — making the
    within-bucket exact scoring O(n * target_bucket) TOTAL instead of the
    O(n^2 / 2^planes) a FIXED plane count degrades to as n grows (a
    quadratic term wearing a constant-factor hat). Registered queries pin
    8 planes so their oracles stay byte-identical; scale deployments pass
    ``hyperplanes(planes_for_corpus(n), dim)``."""
    import math

    n = max(int(corpus_size), 1)
    return min(max_planes,
               max(min_planes, math.ceil(math.log2(max(n / target_bucket, 2)))))


def hyperplanes(n_planes: int = 8, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (3-decimal literals so both
    engines parse bit-identical doubles)."""
    planes = []
    for j in range(n_planes):
        row = []
        for d in range(dim):
            v = ((j * dim + d) * 2654435761) % 2001
            row.append(round((v - 1000) / 1000.0, 3))
        planes.append(row)
    return planes


def lsh_buckets(embeddings: DataFrame, planes: list[list[float]],
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Sign-random-projection bucket id per vector: bit j = (v . plane_j) > 0."""
    bucket = None
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_fold_dot(F.col(vec_col), arr) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select(
        F.col(id_col), F.col(vec_col), bucket.cast("long").alias("bucket")
    )


def ann_lsh(embeddings: DataFrame, query_ids, planes: list[list[float]],
            k: int = 5, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: exact cosine, but only within the query's LSH
    bucket (equality join on bucket — the scale path)."""
    b = lsh_buckets(embeddings, planes, id_col, vec_col).withColumn(
        "_n", norm_col(F.col(vec_col)))
    q = b.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb"),
        F.col("bucket").alias("q_bucket"), F.col("_n").alias("q_n"),
    )
    c = b.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_emb"),
        F.col("bucket").alias("c_bucket"), F.col("_n").alias("c_n"),
    )
    sim = cosine_sim_e6_prenorm(F.col("q_emb"), F.col("c_emb"),
                                F.col("q_n"), F.col("c_n"))
    scored = (
        c.join(F.broadcast(q), (F.col("q_bucket") == F.col("c_bucket"))
               & (F.col("q_id") != F.col("c_id")))
        .select("q_id", "c_id", sim.alias("sim_e6"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim_e6").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("q_id", "c_id", "sim_e6", "rank")
    )


def sql_plane_literal(plane: list[float]) -> str:
    return "[" + ", ".join(f"{x:.3f}" for x in plane) + "]"


def sql_bucket(planes: list[list[float]], vec: str = "embedding") -> str:
    terms = [
        f"CASE WHEN {sql_dot(vec, sql_plane_literal(p))} > 0 "
        f"THEN {1 << j} ELSE 0 END"
        for j, p in enumerate(planes)
    ]
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
