#!/usr/bin/env python
"""Optimization probe (guide §1): per-query timing split into plan-build
(Python-side construction: metadata reads, index opens) vs execution
(noop-materialize), plus the formatted physical plan, for a chosen set of
queries. Usage:

    python scripts/opt_probe.py [--sf DIR] [--reps N] [--plans OUTDIR] \
        [--suffix TAG] [query ...]        # default: all queries

Prints one line per query: name, best exec sec, best build sec, and writes
``<plans>/<query>_<suffix>.txt`` with the explain("formatted") output when
--plans is given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tigerbeetle_cdc_nats_spark import registry
from tigerbeetle_cdc_nats_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=0,
                    help="probe the N slowest queries from BENCH_LOCAL.json")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-probe")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    qs = registry.all_queries()
    names = args.queries or sorted(qs)
    if args.top:
        import json
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench = json.load(open(os.path.join(here, "BENCH_LOCAL.json")))
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        names = [n for n, _ in ranked[:args.top] if n in qs]
        names += [n for n in qs if n not in bench["queries"]]

    # Warm JVM + stored indexes exactly like bench.py so numbers compare.
    try:
        qs[names[0]].fn(spark, args.sf).count()
    except Exception:
        pass
    from tigerbeetle_cdc_nats_spark.sources.prebuild import ensure_indexes
    ensure_indexes(spark, args.sf)

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    rows = []
    for name in names:
        q = qs[name]
        best_build = best_exec = float("inf")
        df = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = q.fn(spark, args.sf)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"opt-probe:{name}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            best_build = min(best_build, t1 - t0)
            best_exec = min(best_exec, t2 - t1)
        rows.append((name, best_exec, best_build))
        print(f"{best_exec:7.3f} exec {best_build:7.3f} build  {name}",
              flush=True)
        if args.plans and df is not None:
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"),
                      "w", encoding="utf-8") as fh:
                fh.write(buf.getvalue())
    rows.sort(key=lambda r: -r[1])
    print("== slowest by exec ==")
    for name, ex, bd in rows[:25]:
        print(f"{ex:7.3f} exec {bd:7.3f} build  {name}")
    print(f"total exec {sum(r[1] for r in rows):.2f}  "
          f"total build {sum(r[2] for r in rows):.2f}  n={len(rows)}")
    spark.stop()


if __name__ == "__main__":
    main()
