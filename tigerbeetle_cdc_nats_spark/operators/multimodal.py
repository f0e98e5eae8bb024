"""Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata. The
container has no media libraries, so the actual decode is STUBBED (raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic pseudo-decode) — but the Spark-side plumbing is real:
``mapInPandas`` with an explicit output schema, Arrow batch transfer, and a
1->N row fan-out (frame sampling), exactly the shape a real decoder plugs
into.

Scale notes: ``mapInPandas`` streams Arrow batches — constant memory per
task regardless of corpus size; binary payloads never pass through the
driver. Partitioning is inherited from the scan, so a 100 TB media table
fans out embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("frame_hash", T.StringType(), False),
])


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the opaque media column: UTF-8 bytes of the text. With
    real data this is the raw image/audio blob read from object storage."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_media(payload: bytes, *, fake: bool = False) -> dict:
    """Decode one media blob. Real decode requires an image/audio library
    that is not installed here — STUB."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; pass fake=True for the deterministic stub"
        )
    return {"n_bytes": len(payload), "n_frames": len(payload) % 4 + 1}


def frame_sample(docs_with_payload: DataFrame, *, fake: bool = True) -> DataFrame:
    """1->N frame sampling via ``mapInPandas``: each doc yields
    ``n_bytes % 4 + 1`` pseudo-frames with a deterministic per-frame hash.

    The iterator-of-batches form keeps memory bounded per Arrow batch.
    """

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in
                                    ("doc_id", "frame_id", "n_bytes", "frame_hash")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = decode_media(bytes(payload), fake=fake)
                for f_id in range(meta["n_frames"]):
                    out["doc_id"].append(int(doc_id))
                    out["frame_id"].append(f_id)
                    out["n_bytes"].append(meta["n_bytes"])
                    out["frame_hash"].append(
                        hashlib.md5(f"{doc_id}:{f_id}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    from tigerbeetle_cdc_nats_spark.session import ensure_parallelism

    return ensure_parallelism(
        docs_with_payload.select("doc_id", "payload")
    ).mapInPandas(extract, schema=FRAME_SCHEMA)


def media_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Typed metadata over the opaque binary column — pure Column exprs
    (size, content digest, magic prefix)."""
    return docs_with_payload.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("sha256"),
        F.hex(F.substring(F.col("payload"), 1, 4)).alias("magic_hex"),
    )


#: Feature-extraction geometry: n_dims segments of chunk_bytes each.
FEATURE_DIMS = 8
FEATURE_CHUNK = 16

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("features", T.ArrayType(T.LongType()), False),
])


def feature_vectors(docs_with_payload: DataFrame,
                    n_dims: int = FEATURE_DIMS,
                    chunk: int = FEATURE_CHUNK) -> DataFrame:
    """Binary -> fixed-width feature vector via ``mapInPandas`` — the
    embed-the-media stage of a multimodal pipeline. A real model plugs in
    where the deterministic stub is (md5 of byte segments, mod 1000);
    everything around it — Arrow batch streaming over BINARY, bounded
    memory, fixed output width — is the production shape. The stub is
    byte-deterministic, so the whole path is oracle-checkable (the corpus
    payloads are ASCII text bytes, making byte and character offsets
    coincide for the SQL mirror)."""
    import pandas as pd

    def extract(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                v = []
                for j in range(n_dims):
                    seg = b[j * chunk:(j + 1) * chunk]
                    h = hashlib.md5(seg).hexdigest()[:15]
                    v.append(int(h, 16) % 1000)
                feats.append(v)
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "features": feats})

    from tigerbeetle_cdc_nats_spark.session import ensure_parallelism

    return (ensure_parallelism(
        docs_with_payload.select("doc_id", "payload"))
        .mapInPandas(extract, schema=FEATURE_SCHEMA))
