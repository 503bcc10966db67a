"""Bottom-k (KMV) sketch: inverse-mix identity, merge == single pass
under random re-partitioning, KMV estimate error, roundtrip, and the
SketchAgg path."""

import numpy as np
import pyarrow as pa
import pytest

from bloomfilter_multithread_ray.functions.hashing import splitmix64
from bloomfilter_multithread_ray.state import BottomKSample
from bloomfilter_multithread_ray.state.base import deserialize_sketch
from bloomfilter_multithread_ray.state.kmv import inverse_splitmix64


def test_inverse_splitmix64_bijection():
    x = np.random.default_rng(0).integers(0, 1 << 63, 200_000).astype(np.uint64)
    assert np.array_equal(inverse_splitmix64(splitmix64(x)), x)


@pytest.mark.parametrize("n,k", [(100, 256), (5_000, 64), (100_000, 512)])
def test_estimate_within_kmv_bound(n, k):
    s = BottomKSample(k)
    s.update_items(np.arange(n))
    if n < k:
        assert s.estimate() == n  # exact below capacity
    else:
        rel = abs(s.estimate() - n) / n
        assert rel <= 4 * s.rel_error(), (rel, s.rel_error())


def test_merge_equals_single_pass_random_splits():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 1 << 40, 30_000)
    one = BottomKSample(128)
    one.update_items(ids)
    for _ in range(5):
        parts = np.array_split(rng.permutation(ids), rng.integers(2, 9))
        acc = BottomKSample(128)
        for p in parts:
            s = BottomKSample(128)
            s.update_items(p)
            acc.merge(s)
        assert np.array_equal(acc.hashes, one.hashes)


def test_roundtrip_and_sample_ids():
    s = BottomKSample(32)
    s.update_items(np.arange(1000))
    r = deserialize_sketch(s.serialize())
    assert np.array_equal(r.hashes, s.hashes)
    ids = set(r.sample_ids().tolist())
    assert ids <= set(range(1000)) and len(ids) == 32


def test_sketch_agg_path():
    from bloomfilter_multithread_ray.stages.sketch_agg import SketchAgg

    agg = SketchAgg(lambda: BottomKSample(64), on="gh")
    ids = np.arange(10_000, dtype=np.uint64)
    acc = None
    for lo in range(0, len(ids), 1000):
        block = pa.table({"gh": pa.array(splitmix64(ids[lo : lo + 1000]))})
        acc = agg.combine(acc, agg.aggregate_block(block))
    got = deserialize_sketch(agg.finalize(acc))
    direct = BottomKSample(64)
    direct.update_items(ids)
    assert np.array_equal(got.hashes, direct.hashes)


def test_kmv_overlap_estimation_partial_sets():
    """Jaccard estimation via bottom-k union sampling: planted overlap
    of 1/3 must be recovered within the KMV error bound."""
    rng = np.random.default_rng(9)
    common = rng.integers(0, 1 << 40, 20_000)
    only_a = rng.integers(1 << 41, 1 << 42, 20_000)
    only_b = rng.integers(1 << 43, 1 << 44, 20_000)
    a, b = BottomKSample(1024), BottomKSample(1024)
    a.update_items(np.concatenate([common, only_a]))
    b.update_items(np.concatenate([common, only_b]))
    union = BottomKSample(1024)
    union.merge(deserialize_sketch(a.serialize())).merge(deserialize_sketch(b.serialize()))
    ub = union.sample_hashes()
    jac = (np.isin(ub, a.sample_hashes()) & np.isin(ub, b.sample_hashes())).mean()
    true = len(np.unique(common)) / len(
        np.unique(np.concatenate([common, only_a, only_b]))
    )
    assert abs(jac - true) <= 5 * a.rel_error(), (jac, true)
