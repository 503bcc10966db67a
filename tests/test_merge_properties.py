"""Merge associativity / commutativity under arbitrary re-partitioning
(north_rule: "merge associativity checked by comparing single-pass vs.
arbitrarily re-partitioned merge orders"), property-based via hypothesis.

Item sketches (Bloom/HLL/CMS/MinHash) must match the single-pass sketch
BITWISE for any split + any merge tree. Value sketches (TDigest/KLL)
are associative up to their rank-error bound (merging is itself lossy),
so they are checked against the bound instead.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bloomfilter_multithread_ray.functions.hashing import splitmix64
from bloomfilter_multithread_ray.state import (
    KLL,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    MinHash,
    TDigest,
)

N_ITEMS = 5_000
HASHES = splitmix64(np.arange(N_ITEMS, dtype=np.uint64))


def _random_partition(data, cut_fracs):
    cuts = sorted({int(f * len(data)) for f in cut_fracs})
    return [p for p in np.split(data, cuts) if len(p)]


def _tree_merge(sketches, order, rng_seed):
    """Merge in a random binary-tree order driven by `order`."""
    rng = np.random.default_rng(rng_seed)
    pool = list(sketches)
    if order:
        rng.shuffle(pool)
    while len(pool) > 1:
        i = int(rng.integers(0, len(pool) - 1))
        a = pool.pop(i)
        b = pool.pop(int(rng.integers(0, len(pool))))
        pool.append(a.merge(b))
    return pool[0]


ITEM_FAMILIES = {
    "bloom": (lambda: BloomFilter(1 << 14, 4), lambda s: s.bits),
    "hll": (lambda: HyperLogLog(12), lambda s: s.registers),
    "cms": (lambda: CountMinSketch(width=1 << 10, depth=4), lambda s: s.counts),
    "minhash": (lambda: MinHash(64), lambda s: s.sig),
}


@settings(max_examples=25, deadline=None)
@given(
    family=st.sampled_from(sorted(ITEM_FAMILIES)),
    cut_fracs=st.lists(st.floats(0.01, 0.99), min_size=1, max_size=12),
    shuffle=st.booleans(),
    tree_seed=st.integers(0, 2**16),
)
def test_item_sketch_merge_associativity(family, cut_fracs, shuffle, tree_seed):
    make, state = ITEM_FAMILIES[family]
    single = make()
    single.update_hashes(HASHES)
    shards = []
    for part in _random_partition(HASHES, cut_fracs):
        s = make()
        s.update_hashes(part)
        shards.append(s)
    merged = _tree_merge(shards, shuffle, tree_seed)
    assert np.array_equal(state(single), state(merged))


@settings(max_examples=10, deadline=None)
@given(
    cut_fracs=st.lists(st.floats(0.01, 0.99), min_size=1, max_size=8),
    tree_seed=st.integers(0, 2**16),
)
def test_value_sketch_merge_within_bound(cut_fracs, tree_seed):
    rng = np.random.default_rng(42)
    x = rng.normal(0, 1, 20_000)
    xs = np.sort(x)
    for make, tol in ((lambda: TDigest(200), 0.02), (lambda: KLL(200), 0.035)):
        shards = []
        for part in _random_partition(x, cut_fracs):
            s = make()
            s.update_values(part)
            shards.append(s)
        merged = _tree_merge(shards, True, tree_seed)
        for q in (0.1, 0.5, 0.9):
            est = merged.quantile(q)
            lo = np.searchsorted(xs, est, side="left") / len(x)
            hi = np.searchsorted(xs, est, side="right") / len(x)
            assert max(lo - q, q - hi, 0.0) < tol


def test_misra_gries_merge_associativity_random_trees():
    """MG bound holds under arbitrary merge trees / partition cuts
    (north-rule merge-associativity criterion for the new family)."""
    import numpy as np

    from bloomfilter_multithread_ray.state import MisraGries
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    rng = np.random.default_rng(17)
    items = np.repeat([f"w{i}" for i in range(80)], (400 / np.arange(1, 81)).astype(int))
    rng.shuffle(items)
    true = {k: int(v) for k, v in zip(*np.unique(items, return_counts=True))}
    n, cap = len(items), 10
    for seed in range(5):
        r = np.random.default_rng(seed)
        cuts = np.sort(r.choice(np.arange(1, n), size=6, replace=False))
        parts = np.split(items, cuts)
        sketches = []
        for p in parts:
            s = MisraGries(cap)
            if len(p):
                s.update_items(p)
            sketches.append(s)
        # random merge tree
        while len(sketches) > 1:
            i = int(r.integers(0, len(sketches) - 1))
            sketches[i].merge(deserialize_sketch(sketches.pop(i + 1).serialize()))
        m = sketches[0]
        assert m.n_total == n
        assert m.error_bound() <= n // (cap + 1)
        for k, t in true.items():
            c = m.estimate(k)
            assert c <= t <= c + m.error_bound(), (seed, k)
