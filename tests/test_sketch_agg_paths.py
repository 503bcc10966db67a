"""SketchAgg sparse-partial machinery: every accumulator-state
transition (sparse raw / sparse counted / dense / mixed) must produce
the same final sketch as a direct single-pass build."""

import numpy as np
import pyarrow as pa
import pytest

from bloomfilter_multithread_ray.stages.sketch_agg import (
    PartialMergeAgg,
    SketchAgg,
    make_partial_combiner,
)
from bloomfilter_multithread_ray.state import BloomFilter, CountMinSketch, HyperLogLog
from bloomfilter_multithread_ray.state.base import deserialize_sketch

RNG = np.random.default_rng(7)
HASHES = RNG.integers(0, 1 << 63, size=5000, dtype=np.uint64)
# Zipf-ish duplication so CMS multiplicities matter
DUPED = np.concatenate([HASHES, HASHES[:2000], HASHES[:500]])


def _via_agg(agg, hashes, n_chunks):
    """Simulate Ray's aggregate: per-chunk aggregate_block -> combine chain."""
    chunks = np.array_split(RNG.permutation(hashes), n_chunks)
    acc = None
    for ch in chunks:
        block = pa.table({"gh": pa.array(ch, pa.uint64())})
        acc = agg.combine(acc, agg.aggregate_block(block))
    return deserialize_sketch(agg.finalize(acc))


@pytest.mark.parametrize("bits", [1 << 10, 1 << 22])  # small forces dense early
@pytest.mark.parametrize("n_chunks", [1, 3, 17])
def test_bloom_agg_equals_single_pass(bits, n_chunks):
    direct = BloomFilter(bits, 4)
    direct.update_hashes(DUPED)
    got = _via_agg(SketchAgg(lambda: BloomFilter(bits, 4), on="gh"), DUPED, n_chunks)
    assert np.array_equal(got.bits, direct.bits)
    assert got.n_added == direct.n_added


@pytest.mark.parametrize("width", [64, 1 << 16])  # small width forces dense early
@pytest.mark.parametrize("n_chunks", [1, 4, 13])
def test_cms_agg_preserves_multiplicities(width, n_chunks):
    direct = CountMinSketch(width=width, depth=4)
    direct.update_hashes(DUPED)
    got = _via_agg(SketchAgg(lambda: CountMinSketch(width=width, depth=4), on="gh"), DUPED, n_chunks)
    assert np.array_equal(got.counts, direct.counts)
    assert got.total == direct.total


def test_hll_agg_equals_single_pass():
    direct = HyperLogLog(12)
    direct.update_hashes(DUPED)
    got = _via_agg(SketchAgg(lambda: HyperLogLog(12), on="gh"), DUPED, 9)
    assert np.array_equal(got.registers, direct.registers)


def test_partial_combiner_plus_merge_agg_roundtrip():
    """The two-stage build path (map-side combiner -> PartialMergeAgg)
    equals direct per-partition construction, for set- and
    count-semantics families alike."""
    parts = (HASHES % np.uint64(5)).astype(np.int32)
    for factory, attr in [
        (lambda: BloomFilter(1 << 12, 4), "bits"),
        (lambda: CountMinSketch(width=256, depth=3), "counts"),
    ]:
        combiner = make_partial_combiner(factory)
        agg = PartialMergeAgg(factory)
        accs = {}
        for lo in range(0, len(HASHES), 700):  # several "blocks"
            batch = pa.table(
                {"part": pa.array(parts[lo : lo + 700]),
                 "gh": pa.array(HASHES[lo : lo + 700], pa.uint64())}
            )
            out = combiner(batch)
            for p, blob in zip(out.column("part").to_pylist(), out.column("partial").to_pylist()):
                accs[p] = agg.combine(accs.get(p), blob)
        for p in np.unique(parts):
            got = deserialize_sketch(agg.finalize(accs[int(p)]))
            direct = factory()
            direct.update_hashes(HASHES[parts == p])
            assert np.array_equal(getattr(got, attr), getattr(direct, attr)), p
