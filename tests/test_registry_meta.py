"""Registry-level invariants protecting the driver contract."""

from __future__ import annotations

import importlib.util
import os

from tigerbeetle_cdc_nats_spark import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_oracle_keys_subset_of_queries():
    mod = _entry_module()
    qs, oracles = mod.queries(), mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # almost everything is oracle-checked; rows-only is the rare exception
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"approx_distinct_sketch"}


def test_oracles_reference_only_registered_views():
    """Oracle SQL must use the driver's pre-registered views, never file
    paths (the driver registers: region nation customer supplier part
    orders lineitem events documents embeddings)."""
    for name, q in registry.all_queries().items():
        if q.oracle:
            assert "read_parquet" not in q.oracle, name
            assert "/root/" not in q.oracle, name


def test_every_query_nonempty_at_smoke_sf(spark):
    """The driver smoke-checks entry() for >=0 rows; we hold ourselves to
    >=1 row for every registered query at sf0.001 (an accidentally-empty
    result would vacuously 'match' a broken oracle)."""
    for name, q in sorted(registry.all_queries().items()):
        n = q.fn(spark, "/root/testdata/sf0.001").count()
        assert n >= 1, f"{name} returned 0 rows at smoke SF"


def test_entry_returns_rows(spark):
    mod = _entry_module()
    assert mod.entry(spark).count() > 0


def test_driver_sample_rotation_prefers_unsampled_queries():
    """The driver records the first 50 queries() entries each round; the
    rotation must put every never-yet-sampled query there (29 remain
    after r07 — fewer than 50, so ALL must land in the head) followed by
    the stale-red re-records, so CORRECTNESS artifacts finish coverage
    and refresh every red row this round."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    assert len(names) >= 190
    fresh = [n for n in names
             if n not in entry._SAMPLED_IN_PRIOR_ROUNDS]
    assert len(fresh) <= 50
    assert names[:len(fresh)] == fresh
    n_prio = len(entry._PRIORITY_RERECORD)
    assert len(fresh) + n_prio <= 50
    assert (tuple(names[len(fresh):len(fresh) + n_prio])
            == entry._PRIORITY_RERECORD)
    # rotation reorders but never drops/duplicates; oracles stay attached
    from tigerbeetle_cdc_nats_spark import registry

    reg = registry.all_queries()
    assert set(names) == set(reg)
    assert len(names) == len(reg)
    assert set(oracles) == {n for n, q in reg.items()
                            if q.oracle is not None}


def test_no_nonscalar_output_columns(spark):
    """The driver's pandas canonicalizer cannot factorize array/struct/map
    cells (the r07 approx_distinct_sketch red row: 'unhashable type:
    numpy.ndarray'); every registered query must emit scalar columns
    only — long (id, index, value) form instead of arrays."""
    bad = []
    for name, q in sorted(registry.all_queries().items()):
        df = q.fn(spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "struct", "map")):
                bad.append((name, f.name, t))
    assert bad == []
