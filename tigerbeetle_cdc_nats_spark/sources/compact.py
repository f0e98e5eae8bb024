"""Small-file compaction for the event store.

A long-running CDC sink produces one file per micro-batch; at scale the
store degrades into millions of KB-files and scan planning dominates
runtime. Compaction rewrites a partition's files into size-targeted ones —
the standard maintenance pass any 100 TB parquet lake needs.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_parquet_dir(spark: SparkSession, path: str, *,
                        target_file_bytes: int = TARGET_FILE_BYTES) -> int:
    """Rewrite ``path`` (a non-partitioned parquet dir) into
    ``ceil(bytes/target)`` files. Returns the new file count.

    Write-then-swap is atomic enough for a maintenance window; for
    continuously-written stores compact only closed (old) partitions.
    """
    from tigerbeetle_cdc_nats_spark.session import configure

    configure(spark)
    n_files = max(1, math.ceil(_dir_bytes(path) / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    backup = path.rstrip("/") + "__old"
    os.rename(path, backup)
    os.rename(tmp, path)
    import shutil
    shutil.rmtree(backup)
    return n_files
