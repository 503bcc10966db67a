"""Distributed constraint validation: planted violations of every rule
kind, SQL cross-checks, empty input."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines.validate import check


def test_all_rule_kinds_planted(ray_session):
    df = pd.DataFrame({
        "id": [1, 2, 2, 4, 5, 5, 5],                       # dups: 2x2 + 3x5 = 5 rows
        "v": pd.array([10, None, 300, -5, 50, 60, None], dtype="Int64"),
        "tag": ["a", "b", "zz", "a", None, "b", "a"],
        "fk": pd.array([1, 2, 9, None, 1, 8, 2], dtype="Int64"),  # 9, 8 orphaned
    })
    ref = ray.data.from_pandas(pd.DataFrame({"rid": [1, 2, 3]}))
    out = check(
        ray.data.from_pandas(df).repartition(3),
        [
            ("not_null", "v"),
            ("range", "v", 0, 100),
            ("accepted", "tag", ["a", "b"]),
            ("unique", ["id"]),
            ("foreign_key", "fk", ref, "rid"),
        ],
    ).set_index("rule")["violations"]
    assert out["not_null(v)"] == 2
    # range: nulls violate (2) + 300 + -5 = 4
    assert out["range(v,0,100)"] == 4
    # accepted: "zz" + null = 2
    assert out["accepted(tag)"] == 2
    # unique: rows participating in duplicate groups
    assert out["unique(id)"] == 5
    # fk: 9 and 8 orphaned; nulls exempt
    assert out["foreign_key(fk->rid)"] == 2


def test_clean_data_and_empty(ray_session):
    df = pd.DataFrame({"id": np.arange(10, dtype="int64"),
                       "v": np.arange(10, dtype="int64")})
    out = check(
        ray.data.from_pandas(df),
        [("not_null", "v"), ("range", "v", 0, 100), ("unique", ["id"])],
    )
    assert (out.violations == 0).all()
    with pytest.raises(ValueError, match="unknown rule"):
        check(ray.data.from_pandas(df), [("median", "v")])


def test_multi_col_unique_and_unbounded_range(ray_session):
    df = pd.DataFrame({
        "a": [1, 1, 1, 2], "b": [1, 1, 2, 2],
        "v": np.array([-10, 5, 10**12, 7], dtype="int64"),
    })
    out = check(
        ray.data.from_pandas(df).repartition(2),
        [("unique", ["a", "b"]), ("range", "v", 0, None), ("range", "v", None, 100)],
    ).set_index("rule")["violations"]
    assert out["unique(a,b)"] == 2
    assert out["range(v,0,None)"] == 1      # only -10
    assert out["range(v,None,100)"] == 1    # only 1e12
