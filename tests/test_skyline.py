"""Skyline operator: brute-force cross-checks in 2/3/4 dims, duplicate
and tie semantics, null drops, maximize orientation, partition
invariance, merge property (local frontiers lose nothing)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines.skyline import _sfs, skyline


def _brute(M):
    """Indices of non-dominated rows of oriented (min) matrix M."""
    n = len(M)
    keep = []
    for i in range(n):
        dominated = False
        for j in range(n):
            if j != i and (M[j] <= M[i]).all() and (M[j] < M[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    return np.array(keep, dtype=np.int64)


@pytest.mark.parametrize("dims", [2, 3, 4])
def test_sfs_kernel_matches_brute_force(dims):
    rng = np.random.default_rng(dims)
    M = rng.integers(0, 12, size=(300, dims)).astype(np.float64)  # many ties
    assert np.array_equal(_sfs(M), _brute(M))


def test_sfs_duplicates_all_survive():
    M = np.array([[1.0, 5.0], [1.0, 5.0], [2.0, 6.0]])
    assert np.array_equal(_sfs(M), [0, 1])  # dup optimals kept, dominated dropped


def _ds_of(df, blocks):
    return ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)


def test_pipeline_matches_brute_force_both_partitionings(ray_session):
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "id": np.arange(2000, dtype=np.int64),
            "cost": rng.integers(0, 50, 2000).astype(np.float64),
            "perf": rng.integers(0, 50, 2000).astype(np.float64),
            "weight": rng.integers(0, 50, 2000).astype(np.float64),
        }
    )
    M = np.column_stack([df.cost, -df.perf, df.weight])
    want = set(df.id.iloc[_brute(M)])
    for blocks in (1, 7):
        out = skyline(
            _ds_of(df, blocks), ["cost", "perf", "weight"], maximize=["perf"]
        ).to_pandas()
        assert set(out.id) == want
        assert list(out.columns) == ["id", "cost", "perf", "weight"]


def test_null_rows_dropped(ray_session):
    df = pd.DataFrame(
        {"id": [1, 2, 3], "a": [5.0, None, 0.0], "b": [1.0, 0.0, 2.0]}
    )
    out = skyline(_ds_of(df, 2), ["a", "b"]).to_pandas()
    # row 2 (null a) dropped; rows 1 and 3 mutually non-dominated
    assert set(out.id) == {1, 3}


def test_single_column_is_min_or_max(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3, 4], "v": [3.0, 1.0, 1.0, 9.0]})
    assert set(skyline(_ds_of(df, 2), ["v"]).to_pandas().id) == {2, 3}
    assert set(
        skyline(_ds_of(df, 2), ["v"], maximize=["v"]).to_pandas().id
    ) == {4}


def test_validation(ray_session):
    ds = ray.data.from_items([{"a": 1}])
    with pytest.raises(ValueError, match="at least one"):
        skyline(ds, [])
    with pytest.raises(ValueError, match="maximize"):
        skyline(ds, ["a"], maximize=["b"])
