"""Fault-tolerant JSONL source: policies, projection, drift, tallies."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from bloomfilter_multithread_ray.sources.jsonl import read_jsonl


@pytest.fixture()
def jsonl_file(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"id": 1, "text": "alpha", "score": 0.5, "ok": True},
        {"id": 2, "text": "beta"},                       # drift: missing keys
        {"id": 3, "text": "gamma", "extra": [1, 2]},     # extra key ignored
        {"id": 4, "text": "delta", "score": 2},          # int -> float cast
    ]
    lines = [json.dumps(r) for r in rows]
    lines.insert(2, "{truncated")                        # malformed
    lines.insert(4, "[1, 2, 3]")                         # non-object
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_skip_policy_counts_bad(ray_session, jsonl_file):
    ds = read_jsonl(jsonl_file, {"id": "int", "text": "str",
                                 "score": "float", "ok": "bool"})
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    data = df[df.id.notna()]  # tally-only rows have null fields
    assert list(data.id) == [1, 2, 3, 4]
    assert data.score.fillna(-1).tolist() == [0.5, -1, -1, 2.0]
    assert int(df._bad.sum()) == 2  # the two malformed lines


def test_keep_policy_dead_letters(ray_session, jsonl_file):
    df = read_jsonl(jsonl_file, {"id": "int"}, on_error="keep").to_pandas()
    good = df[df._error.isna()]
    dead = df[df._error.notna()]
    assert sorted(good.id) == [1, 2, 3, 4]
    assert len(dead) == 2 and dead._raw.str.len().gt(0).all()
    assert dead.id.isna().all()


def test_raise_policy_and_validation(ray_session, jsonl_file):
    with pytest.raises(Exception, match="bad JSONL line"):
        read_jsonl(jsonl_file, {"id": "int"}, on_error="raise").to_pandas()
    with pytest.raises(ValueError, match="on_error"):
        read_jsonl(jsonl_file, {"id": "int"}, on_error="explode")
    with pytest.raises(ValueError, match="columns"):
        read_jsonl(jsonl_file, {"id": "uuid"})


def test_nested_values_policy(ray_session, tmp_path):
    p = tmp_path / "n.jsonl"
    p.write_text(json.dumps({"id": 1, "meta": {"a": 1}}) + "\n")
    # default: nested under a projected column is malformed
    df = read_jsonl(str(p), {"id": "int", "meta": "str"}).to_pandas()
    assert int(df._bad.sum()) == 1
    # json_strings: re-encoded deterministically
    df2 = read_jsonl(str(p), {"id": "int", "meta": "str"},
                     json_strings=True).to_pandas()
    assert df2.meta.iloc[0] == json.dumps({"a": 1}, sort_keys=True)


def test_round_trip_matches_duckdb(ray_session, tmp_path):
    import duckdb

    rng = np.random.default_rng(0)
    rows = [{"id": int(i), "v": float(rng.random()), "s": f"w{i % 9}"}
            for i in range(500)]
    p = tmp_path / "big.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    ds = read_jsonl(str(p), {"id": "int", "v": "float", "s": "str"})
    got = (
        ds.to_pandas().drop(columns=["_bad"])
        .sort_values("id").reset_index(drop=True)
    )
    want = duckdb.connect().execute(
        f"SELECT id, v, s FROM read_json_auto('{p}') ORDER BY id"
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
