"""Registry-level invariants protecting the driver contract."""

from __future__ import annotations

import importlib.util
import json
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


def test_every_query_nonempty_at_smoke_sf(spark, sf_dir):
    """The driver smoke-checks entry() for >=0 rows; we hold ourselves to
    >=1 row for every registered query at sf0.001 (an accidentally-empty
    result would vacuously 'match' a broken oracle)."""
    for name, q in sorted(registry.all_queries().items()):
        n = q.fn(spark, sf_dir).count()
        assert n >= 1, f"{name} returned 0 rows at smoke SF"


def test_entry_returns_rows(spark):
    mod = _entry_module()
    assert mod.entry(spark).count() > 0


def test_driver_sample_rotation_is_stalest_first():
    """The driver records the first 50 queries() entries each round; the
    rotation orders by artifact staleness (never-recorded / red-last-
    record first, then ascending latest-recorded round) so every query's
    CORRECTNESS record refreshes within ~registry/50 rounds (round-8
    judge item #3: head-50 == the 50 stalest records)."""
    import __spark_entry__ as entry

    names = list(entry.queries())
    oracles = entry.oracle_sql()
    assert len(names) >= 190
    age = entry._record_age()
    assert age is not None  # artifacts are committed with the repo
    ordered_ages = [age.get(n, 0) for n in names]
    assert ordered_ages == sorted(ordered_ages)
    # the head-50 must be strictly no fresher than everything behind it
    assert max(ordered_ages[:50]) <= min(ordered_ages[50:])
    # rotation reorders but never drops/duplicates; oracles stay attached
    from tigerbeetle_cdc_nats_spark import registry

    reg = registry.all_queries()
    assert set(names) == set(reg)
    assert len(names) == len(reg)
    assert set(oracles) == {n for n, q in reg.items()
                            if q.oracle is not None}


def test_record_age_demotes_red_records(tmp_path, monkeypatch):
    """A query whose LATEST artifact row is red gets age 0 (re-recorded
    next round); 'no_oracle' counts as working-as-designed, not red."""
    import __spark_entry__ as entry

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "b": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "b": {"rows_match": False, "schema_match": True,
              "hash_match": False, "err": None},
        "c": {"rows_match": True, "schema_match": None,
              "hash_match": None, "err": "no_oracle"},
    }))
    monkeypatch.setattr(entry.os.path, "abspath",
                        lambda p: str(tmp_path / "x.py"))
    age = entry._record_age()
    assert age == {"a": 1, "b": 0, "c": 2}


def test_no_nonscalar_output_columns(spark, sf_dir):
    """The driver's pandas canonicalizer cannot factorize array/struct/map
    cells (the r07 approx_distinct_sketch red row: 'unhashable type:
    numpy.ndarray'); every registered query must emit scalar columns
    only — long (id, index, value) form instead of arrays."""
    bad = []
    for name, q in sorted(registry.all_queries().items()):
        df = q.fn(spark, sf_dir)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "struct", "map")):
                bad.append((name, f.name, t))
    assert bad == []
