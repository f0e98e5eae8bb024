#!/usr/bin/env python
"""Text-verdict MEGA-tier soak (round-11 judge item #5): the grid-salted
equi-join (queries_dedup._text_verdict_mega) is tier-bit-equality tested
at unit scale; this measures its task-distribution win at soak scale.

Recipe: ONE boilerplate cluster of ``P`` near-identical docs (every doc
re-derives doc 0's word list + a doc-unique tail token — the
gen_clustered_documents hot recipe), so each of the MINHASH_BANDS band
buckets holds the whole cluster and the tier's exact pair volume is
bands x C(P, 2). The tier is then timed at descending ``scan_cap``
values: ``scan_cap >= P`` gives n_split=1 (the unsalted baseline — one
join task per band bucket, bands tasks total), smaller caps grid-salt
the same pair volume over ``ceil(P/scan_cap)`` x bands tasks. The pair
volume is IDENTICAL in every configuration — only the task distribution
changes — and the outputs are asserted bit-equal.

This is the scaled-down shape of the production claim: a degenerate
65,537+-population bucket under the default scan_cap spreads its pop^2
over ceil(pop/65536) tasks instead of serializing on one. (The default
cap itself would need a >65k-doc single cluster — a ~2e10-comparison
pair volume no single-node soak can execute; distributing a fixed
~5e8-comparison volume over 1 -> s tasks measures the same mechanism.)

Usage: python scripts/mega_tier_soak.py [P] [s1 s2 ...]
Defaults: P=8192, splits 1 4 16. Prints one JSON report; record in
SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tigerbeetle_cdc_nats_spark.operators import dedup as dd  # noqa: E402
from tigerbeetle_cdc_nats_spark.queries_dedup import (  # noqa: E402
    _text_verdict_mega,
)
from tigerbeetle_cdc_nats_spark.session import get_spark  # noqa: E402

VOCAB = ("key agg row scan slow fast table value part hash merge batch "
         "spark line sort window query big small stream "
         "join group order limit union merge sortkey spill page cache "
         "block shard salt probe build fold census tier plan task").split()


def _cluster(spark, n: int):
    """n near-identical docs: doc 0's 60-word list + a unique tail."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), F.lit(60)),
        lambda j: F.element_at(
            vocab, (F.pmod(F.hash(j), F.lit(len(VOCAB))) + 1).cast("int")))
    return (spark.range(n).withColumnRenamed("id", "doc_id")
            .select("doc_id",
                    F.concat(F.array_join(words, " "), F.lit(" v"),
                             F.pmod(F.col("doc_id"), F.lit(997)))
                    .alias("text")))


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    p = args[0] if args else 8192
    splits = args[1:] or [1, 4, 16]
    spark = get_spark(app_name="mega-tier-soak")
    banded = dd.banded_buckets(dd.minhash_signatures(_cluster(spark, p)))
    pops = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_pop"))
    sized = banded.join(F.broadcast(pops), ["band", "bucket"]).persist()
    n_rows = sized.count()
    max_pop = pops.agg(F.max("_pop")).first()[0]
    report = {
        "cluster": p, "banded_rows": n_rows, "max_pop": int(max_pop),
        "pair_volume": dd.MINHASH_BANDS * p * (p - 1) // 2, "runs": {},
    }
    baseline = None
    for s in splits:
        scan_cap = max(1, (p + s - 1) // s)
        rep = _text_verdict_mega(sized.where(F.col("_pop") > 64),
                                 scan_cap)
        t0 = time.perf_counter()
        rep.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        rows = sorted(map(tuple, rep.collect()))
        if baseline is None:
            baseline = rows
        else:
            assert rows == baseline, f"salted tier diverged at s={s}"
        report["runs"][s] = {
            "scan_cap": scan_cap,
            "tasks_per_bucket": s,
            "wall_s": round(dt, 2),
            "speedup_vs_s1": (round(report["runs"][splits[0]]["wall_s"]
                                    / dt, 2)
                              if splits[0] in report["runs"] else 1.0),
        }
        print(f"s={s:<3} scan_cap={scan_cap:<6} wall={dt:7.2f}s",
              file=sys.stderr)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
