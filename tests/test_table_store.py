"""Range-clustered table store: write/scan round trips, directory
pruning, split-boundary consistency, nulls, resume."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines import table_store as TS


@pytest.fixture()
def tmp_store(tmp_path):
    return str(tmp_path / "store")


def _df(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.permutation(n).astype("int64"),
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )


def test_round_trip_and_pruning(ray_session, tmp_store):
    df = _df()
    man = TS.write_clustered(
        ray.data.from_pandas(df).repartition(8), tmp_store, "k", num_ranges=16
    )
    assert man.n_rows.sum() == len(df)
    assert len(man) == 16

    # unbounded scan returns everything, no synthetic rid column
    back = TS.read_clustered(tmp_store).to_pandas()
    assert sorted(back.columns) == ["k", "v"]
    pd.testing.assert_frame_equal(
        back.sort_values("k").reset_index(drop=True),
        df.sort_values("k").reset_index(drop=True),
        check_dtype=False,
    )

    # bounded scan prunes directories AND matches the exact filter
    m = TS.read_manifest(tmp_store)
    lo, hi = 1000, 1999
    rids = TS.select_ranges(m, lo, hi)
    assert 0 < len(rids) < 16
    got = TS.read_clustered(tmp_store, lo=lo, hi=hi).to_pandas()
    exp = df[(df.k >= lo) & (df.k <= hi)]
    pd.testing.assert_frame_equal(
        got.sort_values("k").reset_index(drop=True),
        exp.sort_values("k").reset_index(drop=True),
        check_dtype=False,
    )


def test_split_boundary_values_never_pruned(ray_session, tmp_store):
    df = _df(2000, seed=1)
    TS.write_clustered(
        ray.data.from_pandas(df).repartition(4), tmp_store, "k", num_ranges=8
    )
    m = TS.read_manifest(tmp_store)
    # probe every split point itself: lo == hi == boundary must return
    # exactly the boundary rows (searchsorted-right on both sides)
    for s in m["splits"]:
        got = TS.read_clustered(tmp_store, lo=s, hi=s).to_pandas()
        assert len(got) == int((df.k == s).sum()), s


def test_columns_projection_and_bound_col(ray_session, tmp_store):
    df = _df(1000, seed=2)
    TS.write_clustered(ray.data.from_pandas(df), tmp_store, "k", num_ranges=4)
    got = TS.read_clustered(tmp_store, lo=100, hi=300, columns=["v"]).to_pandas()
    assert list(got.columns) == ["v"]  # cluster col rode only for the filter
    assert len(got) == int(((df.k >= 100) & (df.k <= 300)).sum())


def test_nulls_cluster_to_range_zero(ray_session, tmp_store):
    df = pd.DataFrame(
        {
            "k": pd.array([1, 2, None, 50, None, 99], dtype="Int64"),
            "v": np.arange(6, dtype="int64"),
        }
    )
    TS.write_clustered(ray.data.from_pandas(df), tmp_store, "k", num_ranges=3)
    # unbounded scan keeps null-keyed rows
    assert TS.read_clustered(tmp_store).count() == 6
    # a bounded scan never admits NULL (SQL comparison semantics)
    got = TS.read_clustered(tmp_store, lo=0, hi=1000).to_pandas()
    assert len(got) == 4 and got["k"].notna().all()


def test_timestamp_kind_and_out_of_range(ray_session, tmp_store):
    ev = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet", columns=["event_id", "ts"]
    )
    TS.write_clustered(ev, tmp_store, "ts", num_ranges=8)
    m = TS.read_manifest(tmp_store)
    assert m["kind"] == "timestamp_us"
    full = TS.read_clustered(tmp_store).count()
    assert full == ev.count()
    # fully out-of-range scan: zero rows, schema preserved
    got = TS.read_clustered(tmp_store, lo="2030-01-01", hi="2030-02-01")
    df = got.to_pandas()
    assert len(df) == 0
    assert TS.select_ranges(m, "2030-01-01", "2030-02-01") == []


def test_resume_rewrites_only_missing_ranges(ray_session, tmp_store):
    df = _df(2000, seed=3)
    ds = ray.data.from_pandas(df).repartition(4)
    man1 = TS.write_clustered(ds, tmp_store, "k", num_ranges=8)
    assert not man1.skipped.any()
    # simulate a torn run: drop one range dir, re-run with skip_existing
    victim = int(man1.rid.iloc[3])
    shutil.rmtree(os.path.join(tmp_store, f"rid={victim}"))
    man2 = TS.write_clustered(ds, tmp_store, "k", num_ranges=8)
    by_rid = man2.set_index("rid")["skipped"]
    assert not by_rid.loc[victim]
    assert by_rid.drop(index=victim).all()
    # store complete again
    assert TS.read_clustered(tmp_store).count() == len(df)


def test_float_kind_and_bad_type(ray_session, tmp_store):
    df = pd.DataFrame({"x": np.linspace(0, 1, 500), "v": np.arange(500)})
    TS.write_clustered(ray.data.from_pandas(df), tmp_store, "x", num_ranges=4)
    m = TS.read_manifest(tmp_store)
    assert m["kind"] == "float"
    got = TS.read_clustered(tmp_store, lo=0.25, hi=0.5).to_pandas()
    exp = df[(df.x >= 0.25) & (df.x <= 0.5)]
    assert len(got) == len(exp)
    with pytest.raises(Exception, match="numeric or timestamp"):
        TS.write_clustered(
            ray.data.from_pandas(pd.DataFrame({"s": ["a", "b"]})),
            tmp_store + "_s",
            "s",
        )
