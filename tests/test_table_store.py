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


# ------------------------------------------------ co-partitioned bucket store
def _bk(tmp_path, name):
    return str(tmp_path / name)


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_bucketed_join_matches_pandas(ray_session, tmp_path, how):
    rng = np.random.default_rng(11)
    L = pd.DataFrame({"k": rng.integers(0, 300, 5000).astype("int64"),
                      "lv": np.arange(5000, dtype="int64")})
    R = pd.DataFrame({"k": np.arange(0, 250, dtype="int64"),
                      "rv": np.arange(250, dtype="int64") * 3,
                      "lv": np.arange(250, dtype="int64")})  # collides -> suffix
    lp, rp = _bk(tmp_path, "l"), _bk(tmp_path, "r")
    TS.write_bucketed(ray.data.from_pandas(L).repartition(5), lp, "k", num_buckets=8)
    TS.write_bucketed(ray.data.from_pandas(R).repartition(2), rp, "k", num_buckets=8)
    got = TS.bucketed_join(lp, rp, how=how).to_pandas()
    if how in ("inner", "left"):
        exp = L.merge(R.rename(columns={"rv": "rv", "lv": "lv_r"}), on="k", how=how)
        assert sorted(got.columns) == sorted(["k", "lv", "rv", "lv_r"])
    elif how == "semi":
        exp = L[L.k.isin(R.k)]
    else:
        exp = L[~L.k.isin(R.k)]
    cols = sorted(got.columns)
    ga = got[cols].sort_values(cols).reset_index(drop=True).astype("float64")
    ea = exp[cols].sort_values(cols).reset_index(drop=True).astype("float64")
    pd.testing.assert_frame_equal(ga.fillna(-1), ea.fillna(-1), check_dtype=False)


def test_bucketed_join_validation_and_pruning(ray_session, tmp_path):
    L = pd.DataFrame({"k": np.arange(20, dtype="int64"), "a": np.arange(20, dtype="int64"),
                      "b": np.arange(20, dtype="int64") * 2})
    R = pd.DataFrame({"kk": np.arange(10, dtype="int64"), "c": np.arange(10, dtype="int64")})
    lp, rp, rp2 = _bk(tmp_path, "l"), _bk(tmp_path, "r"), _bk(tmp_path, "r2")
    TS.write_bucketed(ray.data.from_pandas(L), lp, "k", num_buckets=4)
    TS.write_bucketed(ray.data.from_pandas(R), rp, "kk", num_buckets=4)
    TS.write_bucketed(ray.data.from_pandas(R), rp2, "kk", num_buckets=8)
    with pytest.raises(ValueError, match="co-partitioned"):
        TS.bucketed_join(lp, rp2)
    with pytest.raises(ValueError, match="inner/left"):
        TS.bucketed_join(lp, rp, how="full")
    # column pruning: key rides along, only requested columns emitted
    got = TS.bucketed_join(lp, rp, columns=["a"], right_columns=["c"]).to_pandas()
    assert sorted(got.columns) == ["a", "c", "k"]
    assert len(got) == 10


def test_bucketed_join_disjoint_keys_typed_empty(ray_session, tmp_path):
    L = pd.DataFrame({"k": np.arange(0, 10, dtype="int64"), "lv": np.arange(10, dtype="int64")})
    R = pd.DataFrame({"k": np.arange(100, 110, dtype="int64"), "rv": np.arange(10, dtype="int64")})
    lp, rp = _bk(tmp_path, "l"), _bk(tmp_path, "r")
    TS.write_bucketed(ray.data.from_pandas(L), lp, "k", num_buckets=4)
    TS.write_bucketed(ray.data.from_pandas(R), rp, "k", num_buckets=4)
    out = TS.bucketed_join(lp, rp, how="inner")
    # every task emits a TYPED empty table, so the Dataset keeps its
    # schema (Ray's to_pandas still drops columns on all-empty data —
    # the repo-wide caveat — so assert on the Dataset schema)
    assert sorted(out.schema().names) == ["k", "lv", "rv"]
    assert out.count() == 0


def test_bucketed_null_keys_and_resume(ray_session, tmp_path):
    import os

    L = pd.DataFrame({"k": pd.array([1, None, 2, None, 3], dtype="Int64"),
                      "lv": np.arange(5, dtype="int64")})
    R = pd.DataFrame({"k": np.arange(1, 3, dtype="int64"), "rv": np.arange(2, dtype="int64")})
    lp, rp = _bk(tmp_path, "l"), _bk(tmp_path, "r")
    m1 = TS.write_bucketed(ray.data.from_pandas(L), lp, "k", num_buckets=4)
    TS.write_bucketed(ray.data.from_pandas(R), rp, "k", num_buckets=4)
    # null keys never match (inner) / survive (anti)
    assert len(TS.bucketed_join(lp, rp, how="inner").to_pandas()) == 2
    anti = TS.bucketed_join(lp, rp, how="anti").to_pandas()
    assert sorted(anti.lv.tolist()) == [1, 3, 4]
    # resume: wipe one bucket, re-write skips the rest
    victim = int(m1.bucket.iloc[0])
    import shutil
    shutil.rmtree(os.path.join(lp, f"bucket={victim}"))
    m2 = TS.write_bucketed(ray.data.from_pandas(L), lp, "k", num_buckets=4)
    by = m2.set_index("bucket")["skipped"]
    assert not by.loc[victim] and by.drop(index=victim).all()


# --------------------------------------------------------------- snapshot diff
def test_snapshot_diff_classes_and_nulls(ray_session):
    old = pd.DataFrame({"k": [1, 2, 3, 4, 5],
                        "v": np.array([10, 20, 30, 40, 50], dtype="int64"),
                        "s": ["a", "b", "c", "d", None]})
    new = pd.DataFrame({"k": [2, 3, 4, 5, 6],
                        "v": np.array([20, 31, 40, 50, 60], dtype="int64"),
                        "s": ["b", "c", "d", None, "f"]})
    from bloomfilter_multithread_ray.pipelines.table_store import snapshot_diff

    out = snapshot_diff(
        ray.data.from_pandas(old).repartition(2),
        ray.data.from_pandas(new).repartition(3), "k",
    ).to_pandas().set_index("k")["change"]
    assert out.to_dict() == {1: "removed", 3: "modified", 6: "added"}
    # null == null compares unchanged (IS DISTINCT FROM semantics)
    full = snapshot_diff(
        ray.data.from_pandas(old), ray.data.from_pandas(new), "k",
        include_unchanged=True,
    ).to_pandas()
    assert (full.set_index("k")["change"].loc[5]) == "unchanged"
    # null -> value IS a modification
    new2 = new.copy(); new2.loc[new2.k == 5, "s"] = "x"
    out2 = snapshot_diff(
        ray.data.from_pandas(old), ray.data.from_pandas(new2), "k",
    ).to_pandas().set_index("k")["change"]
    assert out2.loc[5] == "modified"


def test_snapshot_diff_composite_key_and_compare_subset(ray_session):
    old = pd.DataFrame({"a": [1, 1, 2], "b": [1, 2, 1],
                        "v": np.array([5, 6, 7], dtype="int64"),
                        "noise": ["x", "y", "z"]})
    new = old.copy()
    new.loc[(new.a == 1) & (new.b == 2), "v"] = 60      # real change
    new["noise"] = ["p", "q", "r"]                       # ignored below
    from bloomfilter_multithread_ray.pipelines.table_store import snapshot_diff

    out = snapshot_diff(
        ray.data.from_pandas(old), ray.data.from_pandas(new), ["a", "b"],
        compare_cols=["v"],
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0][["a", "b", "change"]].tolist() == [1, 2, "modified"]
    with pytest.raises(ValueError, match="no compare columns"):
        snapshot_diff(
            ray.data.from_pandas(old[["a", "b"]]),
            ray.data.from_pandas(new[["a", "b"]]), ["a", "b"],
        )


# ------------------------------------------------------------ clustered append
def test_append_clustered_merges_and_scans(ray_session, tmp_store):
    df = _df(2000, seed=5)
    base, delta = df.iloc[:1500], df.iloc[1500:]
    TS.write_clustered(ray.data.from_pandas(base).repartition(4), tmp_store, "k",
                       num_ranges=8)
    rep = TS.append_clustered(ray.data.from_pandas(delta).repartition(2), tmp_store,
                              delta_id="d1")
    assert rep.n_added.sum() == len(delta)
    # full scan sees everything; bounded scans stay exact after append
    assert TS.read_clustered(tmp_store).count() == len(df)
    got = TS.read_clustered(tmp_store, lo=100, hi=700).to_pandas()
    assert len(got) == int(((df.k >= 100) & (df.k <= 700)).sum())
    # replay is a no-op on every touched range
    rep2 = TS.append_clustered(ray.data.from_pandas(delta).repartition(2), tmp_store,
                               delta_id="d1")
    assert rep2.skipped.all()
    assert TS.read_clustered(tmp_store).count() == len(df)


def test_append_clustered_widens_zone_maps(ray_session, tmp_store):
    base = pd.DataFrame({"k": np.arange(100, 200, dtype="int64"),
                         "v": np.zeros(100, dtype="int64")})
    TS.write_clustered(ray.data.from_pandas(base), tmp_store, "k", num_ranges=4)
    # out-of-range keys extend the FIRST and LAST ranges (frozen splits)
    delta = pd.DataFrame({"k": np.array([5, 500], dtype="int64"),
                          "v": np.zeros(2, dtype="int64")})
    TS.append_clustered(ray.data.from_pandas(delta), tmp_store)
    m = TS.read_manifest(tmp_store)
    rids = TS.select_ranges(m, 400, 600)
    assert len(rids) == 1  # widened top range now admits the probe
    got = TS.read_clustered(tmp_store, lo=400, hi=600).to_pandas()
    assert got["k"].tolist() == [500]
    assert TS.read_clustered(tmp_store, lo=0, hi=10).to_pandas()["k"].tolist() == [5]


def test_append_clustered_kind_mismatch(ray_session, tmp_store):
    base = pd.DataFrame({"k": np.arange(50, dtype="int64"), "v": np.zeros(50, dtype="int64")})
    TS.write_clustered(ray.data.from_pandas(base), tmp_store, "k", num_ranges=2)
    bad = pd.DataFrame({"k": np.linspace(0, 1, 10), "v": np.zeros(10, dtype="int64")})
    with pytest.raises(Exception, match="kind"):
        TS.append_clustered(ray.data.from_pandas(bad), tmp_store)


# ---- Bloom file-skipping index ----

def _bidx_df(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "ts": np.arange(n, dtype="int64"),          # cluster key
            "eid": rng.permutation(n).astype("int64"),  # lookup key, uncorrelated
            "name": [f"u{i % 97}é" for i in range(n)],
            "v": rng.integers(0, 100, n).astype("int64"),
        }
    )


def test_bloom_index_zero_false_negatives(ray_session, tmp_store):
    df = _bidx_df()
    TS.write_clustered(ray.data.from_pandas(df).repartition(6), tmp_store, "ts", num_ranges=16)
    TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 16)
    keys = [0, 17, 1234, 3999, 2718]
    ds, stats = TS.bloom_pruned_lookup(tmp_store, "eid", keys, columns=["eid", "v"])
    got = ds.to_pandas().sort_values("eid").reset_index(drop=True)
    want = (
        df[df.eid.isin(keys)][["eid", "v"]]
        .sort_values("eid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert stats["ranges_total"] == 16
    # uncorrelated unique keys: each lives in exactly one range; FPR at
    # 2^16 bits over 250 keys/range is ~0 -> heavy pruning guaranteed
    assert stats["ranges_read"] <= len(keys) + 1


def test_bloom_index_absent_key_reads_nothing(ray_session, tmp_store):
    df = _bidx_df(1000)
    TS.write_clustered(ray.data.from_pandas(df).repartition(4), tmp_store, "ts", num_ranges=8)
    TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 16)
    ds, stats = TS.bloom_pruned_lookup(tmp_store, "eid", [10_000_000])
    assert len(ds.to_pandas()) == 0
    assert stats["ranges_read"] <= 1  # 0 modulo a (tiny-FPR) false positive


def test_bloom_index_string_key(ray_session, tmp_store):
    df = _bidx_df(1500)
    TS.write_clustered(ray.data.from_pandas(df).repartition(4), tmp_store, "ts", num_ranges=8)
    TS.build_bloom_index(tmp_store, "name", num_bits=1 << 16)
    keys = ["u3é", "u95é"]
    ds, stats = TS.bloom_pruned_lookup(tmp_store, "name", keys, columns=["name", "eid"])
    got = ds.to_pandas()
    want = df[df.name.isin(keys)][["name", "eid"]]
    assert sorted(got.eid) == sorted(want.eid)
    # every range holds every frequent name -> no pruning possible, no FNs
    assert stats["ranges_read"] == stats["ranges_total"]


def test_bloom_index_validation_and_nulls(ray_session, tmp_store):
    df = _bidx_df(500)
    df.loc[3, "eid"] = pd.NA
    df["eid"] = df["eid"].astype("Int64")
    TS.write_clustered(ray.data.from_pandas(df).repartition(2), tmp_store, "ts", num_ranges=4)
    rep = TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 14)
    assert bool(rep.has_null.any())  # the null key row is recorded, not hashed
    with pytest.raises(ValueError, match="null lookup"):
        TS.bloom_pruned_lookup(tmp_store, "eid", [1, None])
    with pytest.raises(ValueError, match="empty"):
        TS.bloom_pruned_lookup(tmp_store, "eid", [])
    with pytest.raises(TypeError, match="unsupported"):
        TS.build_bloom_index(tmp_store, "v2") if False else TS._key_hash_array(
            __import__("pyarrow").array([1.5, 2.5])
        )


# ---- offline compaction ----

def test_compact_scan_equality_and_sidecar_fold(ray_session, tmp_store):
    rng = np.random.default_rng(12)
    df = pd.DataFrame(
        {"k": rng.permutation(12000).astype("int64"),
         "eid": rng.permutation(12000).astype("int64"),
         "v": rng.integers(0, 100, 12000).astype("int64")}
    )
    TS.write_clustered(ray.data.from_pandas(df).repartition(6), tmp_store, "k", num_ranges=24)
    TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 15)
    before_b = TS.read_clustered(tmp_store, lo=2000, hi=7000).to_pandas()
    rep = TS.compact_clustered(tmp_store, target_rows=2500)
    assert len(rep) < 24 and rep.merged_from.sum() == 24
    assert list(rep.rid) == list(range(len(rep)))  # dense renumbering
    after_b = TS.read_clustered(tmp_store, lo=2000, hi=7000).to_pandas()
    key = lambda x: x.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(before_b), key(after_b))
    assert len(TS.read_clustered(tmp_store).to_pandas()) == 12000
    # bloom sidecar folded: zero FN on keys from formerly-distinct ranges
    ds, stats = TS.bloom_pruned_lookup(tmp_store, "eid", [0, 6000, 11999])
    assert sorted(ds.to_pandas().eid) == [0, 6000, 11999]
    assert stats["ranges_total"] == len(rep)
    # zone maps stay consistent with the new splits
    man = TS.read_manifest(tmp_store)
    assert len(man["splits"]) == len(rep) - 1
    for r in man["ranges"]:
        assert r["n_rows"] == int(rep.n_rows[r["rid"]])


def test_compact_noop_when_target_small(ray_session, tmp_store):
    df = _df(3000, seed=5)
    TS.write_clustered(ray.data.from_pandas(df).repartition(4), tmp_store, "k", num_ranges=8)
    before = TS.read_clustered(tmp_store, lo=100, hi=900).to_pandas()
    rep = TS.compact_clustered(tmp_store, target_rows=1)  # nothing can merge
    assert (rep.merged_from == 1).all()
    after = TS.read_clustered(tmp_store, lo=100, hi=900).to_pandas()
    key = lambda x: x.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(before), key(after))


def test_compact_preserves_null_cluster_rows(ray_session, tmp_store):
    df = _df(2000, seed=9)
    df.loc[:9, "k"] = pd.NA
    df["k"] = df["k"].astype("Int64")
    TS.write_clustered(ray.data.from_pandas(df).repartition(3), tmp_store, "k", num_ranges=8)
    assert len(TS.read_clustered(tmp_store).to_pandas()) == 2000
    TS.compact_clustered(tmp_store, target_rows=600)
    full = TS.read_clustered(tmp_store).to_pandas()
    assert len(full) == 2000 and full.k.isna().sum() == 10


# ---- upsert (MERGE INTO, key == cluster col) ----

def test_upsert_replaces_and_inserts(ray_session, tmp_store):
    base = _df(4000, seed=1)
    TS.write_clustered(ray.data.from_pandas(base).repartition(4), tmp_store, "k", num_ranges=8)
    # delta: replace 100 existing keys with v+1000, insert 50 new keys
    delta = pd.concat([
        base.iloc[:100].assign(v=lambda d: d.v + 1000),
        pd.DataFrame({"k": np.arange(4000, 4050, dtype="int64"),
                      "v": np.full(50, -7, dtype="int64")}),
    ])
    rep = TS.upsert_clustered(ray.data.from_pandas(delta).repartition(3), tmp_store)
    assert int(rep.n_replaced.sum()) == 100 and int(rep.n_inserted.sum()) == 50
    got = TS.read_clustered(tmp_store).to_pandas().sort_values("k").reset_index(drop=True)
    want = (
        pd.concat([base[~base.k.isin(delta.k)], delta])
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # zone maps widened: new max key visible to a bounded scan
    top = TS.read_clustered(tmp_store, lo=4040).to_pandas()
    assert sorted(top.k) == list(range(4040, 4050))


def test_upsert_exactly_once_and_validation(ray_session, tmp_store):
    base = _df(1000, seed=2)
    TS.write_clustered(ray.data.from_pandas(base).repartition(2), tmp_store, "k", num_ranges=4)
    delta = base.iloc[:10].assign(v=0)
    TS.upsert_clustered(ray.data.from_pandas(delta), tmp_store, delta_id="d1")
    rep2 = TS.upsert_clustered(ray.data.from_pandas(delta), tmp_store, delta_id="d1")
    assert rep2.skipped.all()  # replay is a no-op
    assert len(TS.read_clustered(tmp_store).to_pandas()) == 1000
    dup = pd.DataFrame({"k": [1, 1], "v": [5, 6]})
    with pytest.raises(Exception, match="duplicate keys"):
        TS.upsert_clustered(ray.data.from_pandas(dup), tmp_store)
    nul = pd.DataFrame({"k": pd.array([None], dtype="Int64"), "v": [1]})
    with pytest.raises(Exception, match="null keys"):
        TS.upsert_clustered(ray.data.from_pandas(nul), tmp_store)


# ---- z-order store: pruned scans on either column ----

def test_zorder_scan_equality_and_pruning_both_dims(ray_session, tmp_store):
    rng = np.random.default_rng(7)
    n = 30000
    df = pd.DataFrame(
        {"ts": rng.integers(0, 1_000_000, n).astype("int64"),
         "uid": rng.integers(0, 10_000, n).astype("int64"),
         "v": rng.integers(0, 100, n).astype("int64")}
    )
    TS.write_zordered(ray.data.from_pandas(df).repartition(6), tmp_store,
                      ("ts", "uid"), num_ranges=64)
    for col, lo, hi in (("ts", 100_000, 160_000), ("uid", 2000, 2600)):
        ds, stats = TS.read_zordered_where(tmp_store, col, lo, hi)
        got = ds.to_pandas().sort_values(["ts", "uid", "v"]).reset_index(drop=True)
        want = (
            df[(df[col] >= lo) & (df[col] <= hi)]
            .sort_values(["ts", "uid", "v"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["ts", "uid", "v"]], want, check_dtype=False)
        # ~6% selectivity must prune meaningfully on EITHER dim —
        # the whole point vs a single-column cluster
        assert stats["ranges_read"] < stats["ranges_total"] // 2, (col, stats)
    # column pruning drops __z and unrequested columns
    ds2, _ = TS.read_zordered_where(tmp_store, "uid", 0, 100, columns=["uid"])
    assert list(ds2.to_pandas().columns) == ["uid"]


def test_zorder_unbounded_and_empty_and_validation(ray_session, tmp_store):
    df = pd.DataFrame(
        {"ts": np.arange(1000, dtype="int64"),
         "uid": np.arange(1000, dtype="int64")[::-1].copy(),
         "v": np.ones(1000, dtype="int64")}
    )
    TS.write_zordered(ray.data.from_pandas(df).repartition(2), tmp_store,
                      ("ts", "uid"), num_ranges=8)
    full, _ = TS.read_zordered_where(tmp_store, "ts")
    assert len(full.to_pandas()) == 1000
    empty, stats = TS.read_zordered_where(tmp_store, "uid", 5_000_000, 6_000_000)
    assert len(empty.to_pandas()) == 0 and stats["ranges_read"] == 0
    with pytest.raises(ValueError, match="stats column"):
        TS.read_zordered_where(tmp_store, "v", 0, 1)


def test_zorder_box_scan_tighter_than_1d(ray_session, tmp_store):
    rng = np.random.default_rng(3)
    n = 30000
    df = pd.DataFrame(
        {"ts": rng.integers(0, 1_000_000, n).astype("int64"),
         "uid": rng.integers(0, 10_000, n).astype("int64"),
         "v": rng.integers(0, 100, n).astype("int64")}
    )
    TS.write_zordered(ray.data.from_pandas(df).repartition(5), tmp_store,
                      ("ts", "uid"), num_ranges=64)
    box = {"ts": (100_000, 300_000), "uid": (1000, 3000)}
    ds, stats = TS.read_zordered_box(tmp_store, box)
    got = ds.to_pandas().sort_values(["ts", "uid", "v"]).reset_index(drop=True)
    want = (
        df[(df.ts >= 100_000) & (df.ts <= 300_000)
           & (df.uid >= 1000) & (df.uid <= 3000)]
        .sort_values(["ts", "uid", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["ts", "uid", "v"]], want, check_dtype=False)
    _, s_ts = TS.read_zordered_where(tmp_store, "ts", *box["ts"])
    _, s_uid = TS.read_zordered_where(tmp_store, "uid", *box["uid"])
    assert stats["ranges_read"] <= min(s_ts["ranges_read"], s_uid["ranges_read"])
    # open-sided bound + validation
    half, _ = TS.read_zordered_box(tmp_store, {"uid": (9900, None)})
    assert (half.to_pandas().uid >= 9900).all()
    with pytest.raises(ValueError, match="stats columns"):
        TS.read_zordered_box(tmp_store, {"v": (0, 1)})
    with pytest.raises(ValueError, match="empty bounds"):
        TS.read_zordered_box(tmp_store, {})


def test_ingest_invalidates_bloom_sidecars(ray_session, tmp_store):
    """Append/upsert add keys the Bloom sidecar never saw — keeping it
    would turn zero-FN lookups into silent false negatives, so ingest
    must delete the sidecar and lookups must fail loudly until
    build_bloom_index re-runs."""
    df = _bidx_df(2000)
    TS.write_clustered(ray.data.from_pandas(df).repartition(4), tmp_store, "ts", num_ranges=8)
    TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 14)
    ds, _ = TS.bloom_pruned_lookup(tmp_store, "eid", [5])
    assert len(ds.to_pandas()) == 1
    delta = pd.DataFrame({"ts": [99999], "eid": [777777], "name": ["zz"], "v": [1]})
    TS.append_clustered(ray.data.from_pandas(delta), tmp_store)
    with pytest.raises(FileNotFoundError):
        TS.bloom_pruned_lookup(tmp_store, "eid", [777777])
    # rebuild restores zero-FN including the new key
    TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 14)
    ds2, _ = TS.bloom_pruned_lookup(tmp_store, "eid", [777777])
    assert list(ds2.to_pandas().eid) == [777777]


def test_compact_folds_zorder_stats(ray_session, tmp_store):
    rng = np.random.default_rng(5)
    n = 20000
    df = pd.DataFrame(
        {"ts": rng.integers(0, 1_000_000, n).astype("int64"),
         "uid": rng.integers(0, 10_000, n).astype("int64"),
         "v": rng.integers(0, 100, n).astype("int64")}
    )
    TS.write_zordered(ray.data.from_pandas(df).repartition(4), tmp_store,
                      ("ts", "uid"), num_ranges=32)
    before = TS.read_zordered_where(tmp_store, "uid", 2000, 2500)[0].to_pandas()
    TS.compact_clustered(tmp_store, target_rows=2500)
    ds, stats = TS.read_zordered_where(tmp_store, "uid", 2000, 2500)
    after = ds.to_pandas()
    key = lambda x: x.sort_values(["ts", "uid", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(before)[["ts", "uid", "v"]], key(after)[["ts", "uid", "v"]]
    )
    assert stats["ranges_total"] < 32  # sidecar tracked the new layout


# ---- compaction crash-safety: generation commit + delta-replay union ----

def test_compact_unions_applied_delta_ids(ray_session, tmp_store):
    """A compacted file's applied_delta_ids must be the UNION of its
    members' (pa.concat_tables keeps only the first member's schema
    metadata) — otherwise an already-absorbed delta replays after
    compaction and duplicates rows."""
    df = _df(4000, seed=21)
    TS.write_clustered(
        ray.data.from_pandas(df).repartition(4), tmp_store, "k", num_ranges=8
    )
    delta = pd.DataFrame(
        {"k": np.arange(4000, 4040, dtype="int64"),
         "v": np.full(40, 7, dtype="int64")}
    )
    rep1 = TS.append_clustered(ray.data.from_pandas(delta), tmp_store, delta_id="d1")
    assert not rep1.skipped.any()
    total = len(TS.read_clustered(tmp_store).to_pandas())
    assert total == 4040
    TS.compact_clustered(tmp_store, target_rows=4100)  # everything merges
    # replay of d1 after compaction must be a no-op (skipped), not a dup
    rep2 = TS.append_clustered(ray.data.from_pandas(delta), tmp_store, delta_id="d1")
    assert rep2.skipped.all()
    assert len(TS.read_clustered(tmp_store).to_pandas()) == total


def test_compact_generation_commit_and_cleanup(ray_session, tmp_store):
    """Compaction stages everything under g{K} and the manifest replace
    is the commit point; the old generation is removed only after, and
    a second compaction retires g{K} in turn."""
    df = _df(6000, seed=22)
    TS.write_clustered(
        ray.data.from_pandas(df).repartition(4), tmp_store, "k", num_ranges=12
    )
    TS.compact_clustered(tmp_store, target_rows=1500)
    man = TS.read_manifest(tmp_store)
    assert man["gen"] == 1
    assert os.path.isdir(os.path.join(tmp_store, "g1"))
    # old gen-0 rid dirs are gone (cleanup ran post-commit)
    assert not [d for d in os.listdir(tmp_store) if d.startswith("rid=")]
    full = TS.read_clustered(tmp_store).to_pandas()
    assert len(full) == 6000
    TS.compact_clustered(tmp_store, target_rows=6500)
    man2 = TS.read_manifest(tmp_store)
    assert man2["gen"] == 2
    assert not os.path.exists(os.path.join(tmp_store, "g1"))
    assert len(TS.read_clustered(tmp_store).to_pandas()) == 6000


def test_torn_compact_staging_is_ignored_then_discarded(ray_session, tmp_store):
    """Uncommitted staging under g1 (torn previous compaction) must not
    affect reads — the manifest still points at gen 0 — and the next
    compaction must discard it rather than adopt stale files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = _df(3000, seed=23)
    TS.write_clustered(
        ray.data.from_pandas(df).repartition(3), tmp_store, "k", num_ranges=6
    )
    # fake a torn compaction: garbage staged file, manifest untouched
    os.makedirs(os.path.join(tmp_store, "g1", "rid=0"), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([-1], pa.int64()), "v": pa.array([-1], pa.int64())}),
        os.path.join(tmp_store, "g1", "rid=0", "part.parquet"),
    )
    before = TS.read_clustered(tmp_store).to_pandas()
    assert len(before) == 3000 and (before.v >= 0).all()  # garbage invisible
    TS.compact_clustered(tmp_store, target_rows=1200)
    after = TS.read_clustered(tmp_store).to_pandas()
    assert len(after) == 3000 and (after.v >= 0).all()  # garbage discarded


def test_bloom_lookup_all_absent_keeps_schema(ray_session, tmp_store):
    """All-pruned lookups must return a TYPED empty dataset (real
    schema), so callers can still select/sort the documented columns."""
    df = _bidx_df(2000)
    TS.write_clustered(
        ray.data.from_pandas(df).repartition(4), tmp_store, "ts", num_ranges=8
    )
    TS.build_bloom_index(tmp_store, "eid", num_bits=1 << 16)
    ds, stats = TS.bloom_pruned_lookup(
        tmp_store, "eid", [10_000_000, 10_000_001], columns=["name", "v"]
    )
    if stats["ranges_read"] == 0:  # all-pruned (Bloom FP could read one)
        sch = ds.schema()
        assert sch is not None
        for c in ("eid", "name", "v"):
            assert c in sch.names
        # selectable/sortable like any non-empty result (the old
        # zero-COLUMN empty made these raise KeyError)
        out = ds.select_columns(["name", "v"]).sort("v").take_all()
        assert out == []


# ----------------------------------------------- round-5 hardening
def test_snapshot_diff_null_column_modification_detected(ray_session):
    """(NULL, 5) -> (NULL, 7) must classify as modified — per-column
    null encoding in the fingerprint (a whole-tuple null encoding
    collapsed every null-bearing row to one fingerprint)."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.table_store import snapshot_diff

    old = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2], np.int64),
         "a": pd.array([None, "x"], dtype="string"),
         "b": np.array([5, 6], np.int64)}))
    new = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2], np.int64),
         "a": pd.array([None, "x"], dtype="string"),
         "b": np.array([7, 6], np.int64)}))
    out = snapshot_diff(
        old, new, "k", include_unchanged=True
    ).to_pandas().sort_values("k")
    assert list(out["change"]) == ["modified", "unchanged"]


def test_zordered_unbounded_scan_keeps_all_null_ranges(
    ray_session, tmp_path
):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.table_store import (
        read_zordered_where, write_zordered,
    )

    n = 40
    df = pd.DataFrame(
        {"x": pd.array([None] * 10 + list(range(n - 10)), dtype="Int64"),
         "y": np.arange(n, dtype=np.int64),
         "v": np.arange(n, dtype=np.int64)}
    )
    p = str(tmp_path / "zs")
    write_zordered(rd.from_pandas(df), p, ("x", "y"), num_ranges=4)
    # unbounded: every row returns, including the null-x rows
    full, _ = read_zordered_where(p, "x", columns=["v"])
    assert sorted(full.to_pandas()["v"]) == list(range(n))
    # bounded: null-x rows never match
    bounded, _ = read_zordered_where(p, "x", lo=0, columns=["v"])
    assert len(bounded.to_pandas()) == n - 10


def test_clustered_fully_pruned_scan_schema_consistent(
    ray_session, tmp_path
):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.table_store import (
        read_clustered, write_clustered,
    )

    df = pd.DataFrame({"k": np.arange(20, dtype=np.int64),
                       "v": np.arange(20, dtype=np.int64)})
    p = str(tmp_path / "cs")
    write_clustered(rd.from_pandas(df), p, "k", num_ranges=4)
    nonempty = read_clustered(p, lo=0, hi=5, columns=["v"])
    pruned = read_clustered(p, lo=1000, hi=2000, columns=["v"])
    assert nonempty.schema().names == ["v"]
    # the bug: a fully-pruned scan leaked the cluster column "k";
    # Ray may drop the schema of an all-empty dataset entirely, so
    # accept that — just never the stray column
    sch = pruned.schema()
    assert sch is None or sch.names == ["v"]
    assert pruned.count() == 0
