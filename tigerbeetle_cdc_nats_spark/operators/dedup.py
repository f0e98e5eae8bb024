"""Deduplication operators for the training-data pipeline surface
(BASELINE.json north star): exact, n-gram Jaccard, MinHash+LSH, SimHash.

Cross-engine determinism: every hash is derived from md5 (identical in Spark
and DuckDB); 60-bit integers come from the first 15 hex digits via base
conversion (`F.conv` == DuckDB `CAST('0x'||... AS BIGINT)` — verified equal).

Scale design:
- exact: hash-partition on the content hash; one shuffle, no sort.
- n-gram Jaccard: pairwise only WITHIN a blocking key (here: source) — the
  all-pairs form is O(n^2) and intentionally not offered.
- MinHash: signatures are per-row maps (no shuffle); the LSH band join is
  the scale path — candidate pairs come from equality joins on (band,
  bucket), never from a cross join. 16 hashes x 8 bands of 2 detects
  Jaccard >~ 0.5 pairs with high probability.
- SimHash: one explode + one groupBy(doc) — linear, shuffle keyed by doc_id.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window, functions as F

from tigerbeetle_cdc_nats_spark.session import ensure_parallelism

MINHASH_K = 16
MINHASH_BANDS = 8  # rows-per-band = MINHASH_K / MINHASH_BANDS = 2
SIMHASH_BITS = 60  # md5-prefix hash width

#: Universal-hash family for MinHash permutations: h_i(x) = (a_i*x + b_i) mod P
#: over the 31-bit reduction of the base shingle hash. One md5 per shingle
#: total — the 16 permutations are pure integer arithmetic (the md5-per-
#: permutation form was 16x the hash work for no statistical benefit).
MINHASH_P = 2147483647  # 2^31 - 1
MINHASH_A = tuple((2 * i + 1) * 12582917 % MINHASH_P for i in range(MINHASH_K))
MINHASH_B = tuple((i * 4256249 + 1) % MINHASH_P for i in range(MINHASH_K))


def hash60(c: Column) -> Column:
    """60-bit integer hash of a string column (md5-prefix, cross-engine)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of a space-joined text column."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)])  # noqa: E731
    return F.when(F.size(toks) >= n,
                  F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def sql_word_shingles(expr: str = "text", n: int = 3) -> str:
    # DuckDB lists are 1-indexed: grams i = 1 .. len-(n-1).
    toks = f"str_split({expr}, ' ')"
    gram = " || ' ' || ".join(f"{toks}[CAST(i + {j} AS INT)]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> {gram})) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def word_shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct 60-bit hashes of the word n-grams. Downstream set ops run on
    long arrays (an order of magnitude cheaper than string arrays; the
    2^-60 collision rate is immaterial for near-dup detection and identical
    on both engines)."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)])  # noqa: E731
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(idx, lambda i: hash60(gram(i)))),
    ).otherwise(F.array().cast("array<long>"))


def sql_word_shingle_hashes(expr: str = "text", n: int = 3) -> str:
    toks = f"str_split({expr}, ' ')"
    gram = " || ' ' || ".join(f"{toks}[CAST(i + {j} AS INT)]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> {sql_hash60(f'({gram})')})) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact content dedup: hash-group on md5(text); keeper = min id per
    group. One shuffle on the content hash — scales linearly."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h)
    return docs.select(
        F.col(id_col),
        h.alias("content_hash"),
        F.min(id_col).over(w).alias("keeper_id"),
    ).withColumn(
        "is_dup", (F.col(id_col) != F.col("keeper_id")).cast("int")
    )


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", k: int = MINHASH_K) -> DataFrame:
    """k-permutation MinHash signature per doc over word-3-gram shingles.

    One md5 per shingle (``word_shingle_hashes``), then k universal-hash
    permutations as pure integer arithmetic — per-row map, no shuffle. The
    shingle array is materialized as a column first so codegen evaluates it
    once, not once per permutation.
    """
    base = ensure_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    ).select(
        "doc_id", word_shingle_hashes(F.col("_t")).alias("sh")
    ).where(F.size("sh") > 0)
    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * (h % MINHASH_P) + F.lit(b)) % MINHASH_P

    perms = [
        F.array_min(F.transform(F.col("sh"), perm(MINHASH_A[i], MINHASH_B[i])))
        for i in range(k)
    ]
    return base.select("doc_id", F.array(*perms).alias("sig"))


def minhash_candidate_pairs(sigs: DataFrame, bands: int = MINHASH_BANDS,
                            k: int = MINHASH_K) -> DataFrame:
    """LSH banding: bucket = md5 of each band's signature slice; candidate
    pairs share (band, bucket). Equality join — the 100 TB path."""
    rows_per_band = k // bands
    band = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sigs.select("doc_id", "sig", band).select(
        "doc_id",
        "band",
        F.concat_ws(",", *[
            F.element_at("sig", (F.col("band") * rows_per_band + j + 1)
                         .cast("int")).cast("string")
            for j in range(rows_per_band)
        ]).alias("bucket"),
        "sig",
    )
    # The self-join references the banded/signature subtree twice and Spark's
    # exchange-reuse rule does not fire across the two join inputs (verified
    # in the recorded plan: two full Scan->Generate subtrees). Materialize the
    # banded side ONCE — MEMORY_AND_DISK so a 100 TB corpus spills instead of
    # recomputing every MinHash signature per join side. The count() is
    # deliberate eager materialization: without it the two join-side stages
    # launch concurrently and race to fill the cache, computing most
    # partitions twice anyway.
    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    banded.count()
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = (
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda v: v))
        / F.lit(float(k))
    )
    return pairs.select("doc_a", "doc_b", est.alias("est_jaccard"))


def ngram_jaccard_pairs(docs: DataFrame, *, block_col: str = "source",
                        text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.05, salt: int = 8) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs within a blocking key.

    Blocking keeps this from being an all-pairs cross join. The pair join is
    additionally SALTED: the left side is replicated across ``salt``
    sub-keys and the right side hashes to one of them, so per-block pair
    work spreads over block_count x salt tasks instead of serializing on the
    handful of block keys. Both sides are explicitly repartitioned on
    (block, salt) with a pinned partition count — an explicit repartition is
    not coalesced by AQE, which would otherwise merge these compute-heavy
    but byte-light partitions onto one core.
    """
    base = ensure_parallelism(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(block_col).alias("block"),
            F.col(text_col).alias("_t"),
        )
    ).select(
        "doc_id", "block", word_shingle_hashes(F.col("_t")).alias("sh")
    ).where(F.size("sh") > 0).withColumn("n_sh", F.size("sh"))

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    a = base.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).repartition(parallelism, "block", "salt")
    b = base.withColumn(
        "salt", (F.col("doc_id") % salt).cast("int")
    ).repartition(parallelism, "block", "salt")

    a, b = a.alias("a"), b.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    paired = (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.salt") == F.col("b.salt"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.cast("bigint").alias("n_inter"),
            # arrays are distinct: |A u B| = |A| + |B| - |A n B| (no second
            # array traversal)
            (F.col("a.n_sh") + F.col("b.n_sh") - inter).cast("bigint")
            .alias("n_union"),
        )
    )
    return paired.select(
        "doc_a", "doc_b", "n_inter", "n_union",
        (F.col("n_inter") / F.col("n_union")).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """60-bit SimHash over distinct tokens: bit i of the fingerprint is set
    when the +1/-1 vote sum of token-hash bit i is positive.

    One explode + one groupBy — linear in corpus size.
    """
    toks = F.explode(F.array_distinct(F.split(F.col("_t"), " "))).alias("tok")
    exploded = ensure_parallelism(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    ).select("doc_id", toks)
    hashed = exploded.select("doc_id", hash60(F.col("tok")).alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy("doc_id").agg(*votes)
    fp = None
    for i in range(bits):
        term = F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return agg.select("doc_id", fp.cast("long").alias("simhash"))


def sql_simhash(docs_sql: str, bits: int = SIMHASH_BITS) -> str:
    """DuckDB oracle for :func:`simhash` (same votes, same bit rule)."""
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits)
    )
    return f"""
toks AS (SELECT doc_id, unnest(list_distinct(str_split(text, ' '))) AS tok
         FROM ({docs_sql})),
hashed AS (SELECT doc_id, {sql_hash60('tok')} AS h FROM toks),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM votes"""
