"""Cuckoo filter: zero-FN / FPR-bound / retraction invariants,
serialization round-trip, merge, loud overflow, and the partitioned
retract pipeline vs the from-spec sequential reimplementation."""

import numpy as np
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _keys(n, start=0):
    from bloomfilter_multithread_ray.functions.hashing import splitmix64

    return splitmix64(np.arange(start, start + n, dtype=np.uint64))


def test_zero_fn_and_fpr_bound():
    from bloomfilter_multithread_ray.state import CuckooFilter

    keys = _keys(40_000)
    cf = CuckooFilter(num_buckets=1 << 14, bucket_size=4)  # load ~0.61
    cf.update_hashes(keys)
    assert cf.contains(keys).all()  # zero false negatives
    neg = _keys(200_000, start=10_000_000)
    fpr = float(cf.contains(neg).mean())
    assert fpr <= cf.fpr_bound() * 1.5 + 1e-4, (fpr, cf.fpr_bound())
    assert cf.n_items == 40_000


def test_delete_restores_headroom_and_keeps_zero_fn():
    from bloomfilter_multithread_ray.state import CuckooFilter

    keys = _keys(30_000)
    cf = CuckooFilter(num_buckets=1 << 14, bucket_size=4)
    cf.update_hashes(keys)
    ok = cf.delete_hashes(keys[:15_000])
    assert ok.all()
    assert cf.contains(keys[15_000:]).all()  # kept items: zero FN
    # deleted items re-test positive only at tag-collision probability
    assert float(cf.contains(keys[:15_000]).mean()) < 0.01
    assert cf.n_items == 15_000


def test_serialize_roundtrip_and_merge():
    from bloomfilter_multithread_ray.state import CuckooFilter
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    keys = _keys(5_000)
    cf = CuckooFilter(num_buckets=1 << 12)
    cf.update_hashes(keys)
    back = deserialize_sketch(cf.serialize())
    assert (back.slots == cf.slots).all() and back.n_items == cf.n_items

    a = CuckooFilter(num_buckets=1 << 12)
    b = CuckooFilter(num_buckets=1 << 12)
    a.update_hashes(keys[:2_500])
    b.update_hashes(keys[2_500:])
    a.merge(b)
    assert a.contains(keys).all()
    assert a.n_items == 5_000


def test_overflow_fails_loudly():
    from bloomfilter_multithread_ray.state import CuckooFilter

    cf = CuckooFilter(num_buckets=4, bucket_size=2, max_kicks=50)
    with pytest.raises(RuntimeError, match="full"):
        cf.update_hashes(_keys(64))
    with pytest.raises(ValueError):
        CuckooFilter(num_buckets=1000)  # not a power of two


def test_wave_insert_equals_membership_of_sequential():
    """The vectorized wave build and a per-item sequential build may
    differ in slot LAYOUT but must agree on membership (a fingerprint
    always lands in one of its two buckets)."""
    from bloomfilter_multithread_ray.state import CuckooFilter

    keys = np.sort(_keys(3_000))
    wave = CuckooFilter(num_buckets=1 << 10, bucket_size=4)
    wave.update_hashes(keys)
    seq = CuckooFilter(num_buckets=1 << 10, bucket_size=4)
    for k in keys:  # force the per-item path
        seq.update_hashes(np.array([k], dtype=np.uint64))
    probe = np.concatenate([keys, _keys(20_000, start=5_000_000)])
    assert (wave.contains(probe) == seq.contains(probe)).all()


def test_cuckoo_retract_pipeline_matches_independent_impl(ray_session):
    import sys

    sys.path.insert(0, "tests")
    import pyarrow.parquet as pq
    from independent_pipelines import indep_cuckoo_retract

    from bloomfilter_multithread_ray.pipelines import analytics as A

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text", "source"])
    got = A.cuckoo_retract(ds, retract_source="src7")
    got2 = A.cuckoo_retract(ds.repartition(7), retract_source="src7")
    pd.testing.assert_frame_equal(got, got2)

    d = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"])
    ref = indep_cuckoo_retract(
        d.column("text").to_pylist(), d.column("source").to_pylist(), "src7"
    )
    pd.testing.assert_frame_equal(got, ref)
    # the invariants themselves
    assert got.loc[0, "kept_contained"] == got.loc[0, "kept_total"]
    assert got.loc[0, "retracted_contained"] <= got.loc[0, "retracted_total"]
