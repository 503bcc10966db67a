"""Driver-mimic correctness gate: every queries() entry vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01)."""

import sys

import pytest


def test_all_queries_match_oracles(ray_session, testdata_dir):
    from tests.oracle_compare import run_all

    results = run_all(testdata_dir)
    failures = {
        name: probs
        for name, probs in results.items()
        if probs and not probs[0].startswith("(rows-only")
    }
    assert not failures, f"oracle mismatches: {failures}"
    assert len(results) >= 12


def test_entry_smoke(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    ds = E.entry()
    df = ds.to_pandas() if hasattr(ds, "to_pandas") else ds
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "pos", "member"}
    # flagship invariant: probing the corpus against itself → all member
    assert df["member"].all()
