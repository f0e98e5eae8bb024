"""Out-of-bounds oracles must emit the impossible sentinel row.

The bound-guarded similarity oracles (embedding_near_dup & family) are
valid only while the corpus is below their baked geometry's widening
point. Before round 9 they emitted ZERO rows past the bound — which
compares green against a Spark side that also happens to return zero
rows (e.g. a widened corpus with no pair clearing cosine 0.3), silently
skipping verification. Now they emit exactly one (-1, -1, -1) sentinel
(vec ids are always >= 0, so no real Spark result — including the empty
one — can ever hash-equal it). These tests drive the REGISTERED oracle
SQL through DuckDB on synthetic out-of-bounds corpora and assert the
sentinel, and on an in-bounds corpus assert it is absent.
"""

from __future__ import annotations

import duckdb
import pytest

from tigerbeetle_cdc_nats_spark import registry

# every query module must be imported so the registry is populated
import tigerbeetle_cdc_nats_spark.queries_similarity  # noqa: F401


def _con_with_embeddings(sql: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS {sql}")
    return con


def _uniform_corpus(n: int) -> str:
    """Hash-derived dim-64 uniforms, the soak generator's recipe."""
    return f"""
    SELECT i AS vec_id,
      list_transform(range(1, 65),
        d -> CAST((CAST(hash(i * 67 + d) % 2001 AS DOUBLE) - 1000)
                  / 1000.0 AS FLOAT)) AS embedding,
      CAST(i % 10 AS BIGINT) AS label
    FROM range({n}) t(i)"""


def _hot_corpus(n: int) -> str:
    """All vectors IDENTICAL: one LSH bucket holds the whole corpus, so
    maxpop == n while n_vec stays small (near-identical isn't enough —
    a plane whose coefficient sum is near zero can still split it)."""
    return f"""
    SELECT i AS vec_id,
      list_transform(range(1, 65), d -> CAST(1.0 AS FLOAT)) AS embedding,
      CAST(0 AS BIGINT) AS label
    FROM range({n}) t(i)"""


SENTINEL = (-1, -1, -1)


def test_near_dup_sentinel_fires_on_hot_bucket():
    # 300 near-identical vectors: n_vec=300 (in bounds), maxpop=300 > 256
    oracle = registry.all_queries()["embedding_near_dup"].oracle
    con = _con_with_embeddings(_hot_corpus(300))
    rows = con.execute(oracle).fetchall()
    assert rows == [SENTINEL]


def test_near_dup_adaptive_sentinel_fires_past_widening_point():
    oracle = registry.all_queries()["embedding_near_dup_adaptive"].oracle
    con = _con_with_embeddings(_uniform_corpus(16385))
    rows = con.execute(oracle).fetchall()
    assert rows == [SENTINEL]


def test_near_dup_sentinel_absent_in_bounds():
    # small uniform corpus: bounds hold, sentinel must NOT appear (the
    # real pair arm may or may not emit rows; none may be the sentinel)
    oracle = registry.all_queries()["embedding_near_dup"].oracle
    con = _con_with_embeddings(_uniform_corpus(500))
    rows = con.execute(oracle).fetchall()
    assert SENTINEL not in rows


@pytest.mark.parametrize("name", [
    "embedding_near_dup", "embedding_near_dup_adaptive",
    "embedding_near_dup_multitable",
    "embedding_near_dup_multitable_adaptive",
    "embedding_near_dup_skewsafe", "semdedup", "dup_method_agreement",
])
def test_every_bound_guarded_oracle_has_a_sentinel_arm(name):
    oracle = registry.all_queries()[name].oracle
    assert "UNION ALL" in oracle
    assert "-1" in oracle.split("UNION ALL")[-1]
