"""Register-blocked Bloom filter: invariants, the partition-correlation
regression, and the distributed blocked store/probe path."""

import numpy as np
import pytest

import ray.data


def _keys(n, start=0):
    from bloomfilter_multithread_ray.functions.hashing import splitmix64

    return splitmix64(np.arange(start, start + n, dtype=np.uint64))


def test_zero_fn_fpr_and_roundtrip():
    from bloomfilter_multithread_ray.state import BlockedBloomFilter
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    keys = _keys(500_000)
    bf = BlockedBloomFilter(3 * (1 << 22), 4)
    bf.update_hashes(keys)
    assert bf.contains(keys).all()
    neg = _keys(500_000, start=9_000_000)
    fpr = float(bf.contains(neg).mean())
    assert fpr < 0.01, fpr
    back = deserialize_sketch(bf.serialize())
    assert (back.words == bf.words).all() and back.n_added == bf.n_added
    assert back.contains(keys).all()

    a = BlockedBloomFilter(1 << 16, 4)
    b = BlockedBloomFilter(1 << 16, 4)
    a.update_hashes(keys[:1000])
    b.update_hashes(keys[1000:2000])
    a.merge(b)
    assert a.contains(keys[:2000]).all()


def test_heavy_duplication_stays_exact():
    """The iterative fancy-OR insert must not lose bits when many keys
    share a word (the lost-update hazard of plain fancy |=)."""
    from bloomfilter_multithread_ray.state import BlockedBloomFilter

    bf = BlockedBloomFilter(1 << 10, 4)  # 16 words: extreme collisions
    keys = _keys(50_000) % np.uint64(300)
    bf.update_hashes(keys)
    assert bf.contains(keys).all()


def test_word_index_decorrelated_from_partition_routing():
    """REGRESSION: widx must not share bits with partition_of(h, P) —
    the first cut used h % n_words with n_words % 64 == 0, so each
    partition's keys reached only n_words/64 words and saturated them
    (FPR -> 1.0 in the partitioned store, invisible to single-filter
    tests)."""
    from bloomfilter_multithread_ray.functions.hashing import partition_of
    from bloomfilter_multithread_ray.state import BlockedBloomFilter

    keys = _keys(2_000_000)
    pk = keys[partition_of(keys, 64) == 0]  # one partition's keys
    bf = BlockedBloomFilter(3 * (1 << 21), 4)
    bf.update_hashes(pk)
    # word usage must cover (nearly) the whole table, not 1/64 of it
    used = int((bf.words != 0).sum())
    assert used > bf.n_words * 0.2, (used, bf.n_words)
    neg = _keys(100_000, start=77_000_000)
    negp = neg[partition_of(neg, 64) == 0]
    assert float(bf.contains(negp).mean()) < 0.01


def test_blocked_store_build_probe_path(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa

    from bloomfilter_multithread_ray.pipelines import bloom as B
    from bloomfilter_multithread_ray.sources.sequences import (
        generate_query_table,
        generate_sequences_table,
    )

    corpus = generate_sequences_table(400, seed=23)
    store = str(tmp_path / "store")
    B.build_and_store(
        ray.data.from_arrow(corpus), store,
        k=4, num_partitions=16, bits_per_partition=3 * (1 << 18),
        num_hashes=4, variant="blocked",
    )
    shards, man = B.load_sketch_store(store)
    assert man["variant"] == "blocked"
    from bloomfilter_multithread_ray.state import BlockedBloomFilter

    assert all(isinstance(s, BlockedBloomFilter) for s in shards.values())

    probe = B.probe_bloom(
        ray.data.from_arrow(generate_query_table(corpus, 200, seed=24)),
        shards, k=4, num_partitions=16, concurrency=2,
    ).to_pandas()
    assert B.LAST_PROBE_PATH == "blocked_matrix"
    pos = probe[probe.doc_id.str.startswith("doc-")]
    neg = probe[probe.doc_id.str.startswith("neg-")]
    assert bool(pos.member.all())  # zero false negatives
    assert float(neg.member.mean()) < 0.05  # real FPR, not saturation

    with pytest.raises(ValueError):
        B.build_and_store(
            ray.data.from_arrow(corpus), str(tmp_path / "x"),
            k=4, num_partitions=16, bits_per_partition=1 << 18,
            variant="wat",
        )
