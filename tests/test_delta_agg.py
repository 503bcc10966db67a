"""Incremental grouped-aggregate store: delta folds, exactly-once
replay, crash repair, spec pinning."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines import delta_agg as DA

AGGS = {
    "n": ("count", None),
    "s": ("sum", "v"),
    "mn": ("min", "v"),
    "mx": ("max", "v"),
    "avg": ("mean", "v"),
}


def _truth(df):
    out = (
        df.groupby("u")
        .agg(n=("v", "count"), s=("v", "sum"), mn=("v", "min"),
             mx=("v", "max"), avg=("v", "mean"))
        .reset_index()
        .sort_values("u")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def _state(store):
    return (
        DA.read_aggregate(store)
        .to_pandas()[["u", "n", "s", "mn", "mx", "avg"]]
        .sort_values("u")
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )


def test_incremental_equals_one_shot(ray_session, tmp_path):
    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"u": rng.integers(0, 41, 3000), "v": rng.integers(-500, 500, 3000).astype("int64")}
    )
    store = str(tmp_path / "inc")
    # three deltas, arbitrary split; second introduces brand-new keys
    parts = [df.iloc[:1000], df.iloc[1000:1100], df.iloc[1100:]]
    for i, p in enumerate(parts):
        rep = DA.merge_aggregate(
            store, ray.data.from_pandas(p).repartition(3), "u", AGGS,
            num_partitions=8, delta_id=f"d{i}",
        )
        assert rep.updated.any()
    pd.testing.assert_frame_equal(_state(store), _truth(df), check_dtype=False)


def test_replay_skips_applied_partitions(ray_session, tmp_path):
    df = pd.DataFrame({"u": np.arange(100) % 7, "v": np.arange(100, dtype="int64")})
    store = str(tmp_path / "replay")
    DA.merge_aggregate(store, ray.data.from_pandas(df), "u", AGGS,
                       num_partitions=4, delta_id="a")
    rep = DA.merge_aggregate(store, ray.data.from_pandas(df), "u", AGGS,
                             num_partitions=4, delta_id="a")
    assert rep.skipped.all()
    pd.testing.assert_frame_equal(_state(store), _truth(df), check_dtype=False)


def test_crash_repair_updates_only_stale_partition(ray_session, tmp_path):
    import pyarrow.parquet as pq

    df = pd.DataFrame({"u": np.arange(200) % 11, "v": np.arange(200, dtype="int64")})
    d1, d2 = df.iloc[:120], df.iloc[120:]
    store = str(tmp_path / "repair")
    DA.merge_aggregate(store, ray.data.from_pandas(d1), "u", AGGS,
                       num_partitions=4, delta_id="d1")
    DA.merge_aggregate(store, ray.data.from_pandas(d2), "u", AGGS,
                       num_partitions=4, delta_id="d2")
    truth = _state(store)
    # simulate a torn d2: one partition reverts to its pre-d2 state by
    # re-applying d1-only content — rebuild it in a scratch store
    scratch = str(tmp_path / "scratch")
    DA.merge_aggregate(scratch, ray.data.from_pandas(d1), "u", AGGS,
                       num_partitions=4, delta_id="d1")
    victim = "part=2"
    old = pq.read_table(os.path.join(scratch, victim, "agg.parquet"))
    pq.write_table(old, os.path.join(store, victim, "agg.parquet"))
    # repair: replay d2 — ONLY the stale partition updates
    rep = DA.merge_aggregate(store, ray.data.from_pandas(d2), "u", AGGS,
                             num_partitions=4, delta_id="d2")
    touched = rep[rep.updated]
    assert touched.part.tolist() == [2]
    pd.testing.assert_frame_equal(_state(store), truth, check_dtype=False)


def test_untouched_partitions_do_no_io(ray_session, tmp_path):
    df = pd.DataFrame({"u": np.arange(64, dtype="int64"), "v": np.ones(64, dtype="int64")})
    store = str(tmp_path / "io")
    DA.merge_aggregate(store, ray.data.from_pandas(df), "u", AGGS, num_partitions=8)
    mtimes = {
        d: os.path.getmtime(os.path.join(store, d, "agg.parquet"))
        for d in os.listdir(store) if d.startswith("part=")
    }
    # a one-key delta touches exactly one partition
    one = pd.DataFrame({"u": np.array([5], dtype="int64"), "v": np.array([9], dtype="int64")})
    rep = DA.merge_aggregate(store, ray.data.from_pandas(one), "u", AGGS, num_partitions=8)
    assert len(rep) == 1
    changed = [
        d for d in mtimes
        if os.path.getmtime(os.path.join(store, d, "agg.parquet")) != mtimes[d]
    ]
    assert changed == [f"part={int(rep.part.iloc[0])}"]


def test_spec_pinned_by_manifest(ray_session, tmp_path):
    df = pd.DataFrame({"u": np.arange(10) % 3, "v": np.arange(10, dtype="int64")})
    store = str(tmp_path / "spec")
    DA.merge_aggregate(store, ray.data.from_pandas(df), "u", AGGS, num_partitions=4)
    with pytest.raises(ValueError, match="spec mismatch"):
        DA.merge_aggregate(store, ray.data.from_pandas(df), "u", AGGS, num_partitions=8)
    with pytest.raises(ValueError, match="spec mismatch"):
        DA.merge_aggregate(
            store, ray.data.from_pandas(df), "u", {"n": ("count", None)}, num_partitions=4
        )


def test_multi_key_and_empty_delta(ray_session, tmp_path):
    df = pd.DataFrame(
        {
            "u": np.arange(60) % 5,
            "g": (np.arange(60) % 3).astype("int64"),
            "v": np.arange(60, dtype="int64"),
        }
    )
    store = str(tmp_path / "mk")
    aggs = {"n": ("count", None), "s": ("sum", "v")}
    DA.merge_aggregate(store, ray.data.from_pandas(df.iloc[:30]), ["u", "g"], aggs,
                       num_partitions=4)
    DA.merge_aggregate(store, ray.data.from_pandas(df.iloc[30:]), ["u", "g"], aggs,
                       num_partitions=4)
    got = (
        DA.read_aggregate(store).to_pandas()
        .sort_values(["u", "g"]).reset_index(drop=True)[["u", "g", "n", "s"]]
    )
    exp = (
        df.groupby(["u", "g"]).agg(n=("v", "count"), s=("v", "sum")).reset_index()
        .sort_values(["u", "g"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n": "int64"}), exp.astype({"n": "int64"}),
                                  check_dtype=False)
    rep = DA.merge_aggregate(
        store, ray.data.from_pandas(df.iloc[:0]), ["u", "g"], aggs, num_partitions=4
    )
    assert len(rep) == 0
