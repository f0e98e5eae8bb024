"""File-format sources/sinks (S6) and the injected-transport NATS sink."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.config import CdcConfig, validate
from tigerbeetle_cdc_nats_spark.registry import events_table
from tigerbeetle_cdc_nats_spark.schemas import EVENTS_SCHEMA
from tigerbeetle_cdc_nats_spark.sources.formats import (
    read_jsonl,
    stream_parquet,
    write_jsonl,
    write_parquet,
)
from tigerbeetle_cdc_nats_spark.sources.nats_sink import (
    HEADER_COLS,
    NatsSinkConfig,
    make_nats_sink,
)
from tigerbeetle_cdc_nats_spark.streaming.pipeline import transform_events


def test_jsonl_roundtrip(spark, tmp_path):
    src = events_table(spark, "/root/testdata/sf0.001").limit(100)
    path = str(tmp_path / "ev.jsonl")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, EVENTS_SCHEMA)
    assert back.count() == 100
    a = src.agg(F.sum(F.col("ts").cast("decimal(38,0)"))).first()[0]
    b = back.agg(F.sum(F.col("ts").cast("decimal(38,0)"))).first()[0]
    assert a == b


def test_stream_real_testdata_through_pipeline(spark, tmp_path):
    """Streaming smoke over the actual driver testdata parquet."""
    cfg = validate(CdcConfig(cluster_id="2"))
    # streaming file sources require a directory; stage the real testdata
    # file into one
    import shutil
    srcdir = str(tmp_path / "src")
    os.makedirs(srcdir)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(srcdir, "events.parquet"))
    stream = stream_parquet(spark, srcdir, EVENTS_SCHEMA,
                            max_files_per_trigger=1)
    out = str(tmp_path / "out")
    q = (
        transform_events(stream, cfg)
        .writeStream
        .foreachBatch(lambda df, b: df.drop("event_time")
                      .write.mode("append").parquet(out))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    sink = spark.read.parquet(out)
    assert sink.count() == 1000
    assert sink.select("msg_id").distinct().count() == 1000
    assert sink.where(~F.col("subject").startswith("tigerbeetle.cdc.")).count() == 0


def test_nats_sink_with_injected_transport(spark, tmp_path):
    """The JetStream sink shape, with transport injected: every row is
    published once with subject, dedup msg id, and the 5 routing headers
    (runner.go:586-605)."""
    outdir = str(tmp_path / "published")
    os.makedirs(outdir)

    def publish(subject: str, msg_id: str, headers: dict, payload: bytes):
        # executor-side: append one JSON line per publish to a per-pid file
        fname = os.path.join(outdir, f"{os.getpid()}.jsonl")
        with open(fname, "a") as f:
            f.write(json.dumps({
                "subject": subject, "msg_id": msg_id,
                "headers": headers, "n": len(payload),
            }) + "\n")

    cfg = validate(CdcConfig(cluster_id="3"))
    batch = transform_events(
        spark.read.schema(EVENTS_SCHEMA)
        .parquet("/root/testdata/sf0.001/events.parquet"), cfg
    ).drop("event_time").limit(50)

    sink = make_nats_sink(NatsSinkConfig(max_pending=8), publish=publish)
    sink(batch, batch_id=0)

    published = []
    for f in glob.glob(os.path.join(outdir, "*.jsonl")):
        with open(f) as fh:
            published += [json.loads(line) for line in fh]
    assert len(published) == 50
    assert len({p["msg_id"] for p in published}) == 50
    sample = published[0]
    assert sample["subject"].startswith("tigerbeetle.cdc.")
    assert set(HEADER_COLS) | {"Nats-Msg-Id"} == set(sample["headers"])
    assert sample["n"] > 500  # full envelope payload


def test_csv_and_orc_roundtrip(spark, tmp_path):
    from pyspark.sql import types as T

    from tigerbeetle_cdc_nats_spark.sources.formats import (
        read_csv,
        read_orc,
        write_csv,
        write_orc,
    )

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    rows = [(1, "a", 1.5), (2, "b,c", -2.0), (3, None, 0.0)]
    df = spark.createDataFrame(rows, schema)

    csv_dir = str(tmp_path / "csv")
    write_csv(df, csv_dir, mode="overwrite")
    got_csv = sorted(map(tuple, read_csv(spark, csv_dir, schema).collect()))
    assert got_csv == sorted(rows)

    orc_dir = str(tmp_path / "orc")
    write_orc(df, orc_dir, mode="overwrite")
    got_orc = sorted(map(tuple, read_orc(spark, orc_dir).collect()))
    assert got_orc == sorted(rows)
