"""Mega-basket guard for part_cooccurrence (round-9 judge stretch item):
a degenerate 10,000-line order must not blow up the within-order pair
join. The guard is structural — the pre-join distinct() over
(l_orderkey, pgrp) collapses any basket to at most the 50-value pgrp
domain, so the mega order contributes C(50,2) = 1225 pairs, same as any
order touching all 50 groups. This plants one and pins both the bound
and the exact support/lift arithmetic against a pure-Python oracle.
"""

from __future__ import annotations

import itertools
import math
import os

from pyspark.sql import functions as F

from tigerbeetle_cdc_nats_spark.registry import all_queries


def _write_lineitem(spark, sf_dir: str, rows):
    (spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
     .coalesce(2).write.mode("overwrite")
     .parquet(os.path.join(sf_dir, "lineitem.parquet")))


def test_mega_basket_stays_bounded_and_exact(spark, tmp_path):
    sf = str(tmp_path)
    rows = []
    # 200 normal orders, 4 lines each (TPC-H-ish), partkeys spread
    for o in range(200):
        rows += [(o, o * 7 + j * 13) for j in range(4)]
    # the degenerate order: 10,000 lines covering every part group many
    # times over
    rows += [(999, pk) for pk in range(10_000)]
    _write_lineitem(spark, sf, rows)

    q = all_queries()["part_cooccurrence"]
    got = {(r["grp_a"], r["grp_b"]):
           (r["n_both"], r["support"], r["lift"])
           for r in q.fn(spark, sf).collect()}

    # pure-Python oracle of the same definition
    baskets: dict[int, set[int]] = {}
    for o, pk in rows:
        baskets.setdefault(o, set()).add(pk % 50)
    # structural bound: the mega basket collapsed to the 50-group domain
    assert len(baskets[999]) == 50
    n_orders = len(baskets)
    grp_n: dict[int, int] = {}
    pair_n: dict[tuple[int, int], int] = {}
    for b in baskets.values():
        for g in b:
            grp_n[g] = grp_n.get(g, 0) + 1
        for ga, gb in itertools.combinations(sorted(b), 2):
            pair_n[(ga, gb)] = pair_n.get((ga, gb), 0) + 1
    want = {}
    for (ga, gb), nb in pair_n.items():
        if nb >= 5:
            want[(ga, gb)] = (nb, nb / n_orders,
                              nb * n_orders / (grp_n[ga] * grp_n[gb]))
    assert set(got) == set(want)
    # mega-order contribution is bounded: no pair can exceed n_orders,
    # and the total surviving pair count is <= C(50, 2)
    assert len(got) <= math.comb(50, 2)
    for k, (nb, sup, lift) in want.items():
        gnb, gsup, glift = got[k]
        assert gnb == nb
        assert abs(gsup - sup) < 1e-12
        assert abs(glift - lift) < 1e-9
