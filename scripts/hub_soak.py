#!/usr/bin/env python
"""Hub-degree soak for the triangle census (round-6 VERDICT item #3).

Builds planted power-law-hub near-dup graphs — one hub of degree D plus a
linear number of background triangles — and measures, per size:

- ``enum_wedges``: the wedge volume the degree-ordered enumeration
  actually materializes (sum C(outdeg, 2));
- ``formula_wedges``: the true wedge count sum C(deg, 2) (what an
  id-ordered enumeration can degenerate to at a hub: C(D, 2) = O(D^2));
- wall time of the full census.

The claim under test: enum_wedges stays O(edges) while formula_wedges
grows O(D^2), and census time scales with the former. Prints one JSON
line per size; paste the table into SCALE.md.

Usage: python scripts/hub_soak.py [D ...]    (default: 1000 4000 16000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.operators.graph import (
    degree_oriented,
    oriented_wedges,
    triangle_census,
)
from tigerbeetle_cdc_nats_spark.session import get_spark


def hub_graph(spark, d: int):
    """One hub (id 0) with d leaves, plus d/10 disjoint background
    triangles — a caricature of a boilerplate page near-duplicating a
    large slice of a web corpus."""
    leaves = spark.range(1, d + 1).select(
        F.lit(0).cast("long").alias("doc_a"), F.col("id").alias("doc_b"))
    base = 10_000_000
    tri = spark.range(d // 10).select(
        (base + F.col("id") * 3).alias("x"))
    tri_edges = (
        tri.select(F.col("x").alias("doc_a"), (F.col("x") + 1).alias("doc_b"))
        .unionByName(tri.select(F.col("x").alias("doc_a"),
                                (F.col("x") + 2).alias("doc_b")))
        .unionByName(tri.select((F.col("x") + 1).alias("doc_a"),
                                (F.col("x") + 2).alias("doc_b")))
    )
    return leaves.unionByName(tri_edges)


def main() -> int:
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 4000, 16000]
    spark = get_spark("hub-soak", shuffle_partitions=32)
    for d in sizes:
        e = hub_graph(spark, d).persist()
        n_edges = e.count()
        oriented, _deg = degree_oriented(e)
        enum_wedges = oriented_wedges(oriented).count()
        t0 = time.time()
        row = triangle_census(e).first()
        dt = time.time() - t0
        print(json.dumps({
            "hub_degree": d,
            "n_edges": n_edges,
            "enum_wedges": enum_wedges,
            "formula_wedges": int(row["n_wedges"]),
            "n_triangles": int(row["n_triangles"]),
            "census_sec": round(dt, 2),
        }))
        e.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
