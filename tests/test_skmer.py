"""Minimizer-partitioned super-k-gram build (pipelines/skmer.py) —
run-length segmentation correctness, zero false negatives through the
minimizer-routed probe, and parity of the per-partition gram sets with
a direct numpy computation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from bloomfilter_multithread_ray.functions.hashing import (
    UINT64,
    kgram_hashes_flat,
    splitmix64,
)
from bloomfilter_multithread_ray.pipelines.skmer import (
    _segment_rows_fn,
    build_partitioned_bloom_skmer,
    kgram_minimizer_parts,
)

K, P = 4, 16


def _corpus(n_docs=50, seed=3, vocab=200):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_docs):
        n = int(rng.integers(0, 40))  # includes rows shorter than k
        rows.append(
            {"doc_id": i, "tokens": rng.integers(0, vocab, n).astype(np.int32)}
        )
    return rows


def _flat(rows):
    flat = np.concatenate([r["tokens"] for r in rows]) if rows else np.empty(0, np.int32)
    offs = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r["tokens"]) for r in rows], out=offs[1:])
    return flat, offs


def test_minimizer_parts_align_with_gram_hashes():
    rows = _corpus()
    flat, offs = _flat(rows)
    gh, row_idx, pos = kgram_hashes_flat(flat, offs, K)
    part, g = kgram_minimizer_parts(flat, offs, K, P)
    assert len(part) == len(gh) == len(g)
    # gram start index == row start + pos for every gram
    assert np.array_equal(g, offs[row_idx] + pos)
    # partition equals the direct definition: min splitmix64(tok) % P
    u = splitmix64(flat.astype(UINT64))
    for i in np.random.default_rng(0).choice(len(g), size=min(200, len(g)), replace=False):
        s = int(g[i])
        assert part[i] == int(u[s : s + K].min() % np.uint64(P))


def test_segments_reconstruct_exact_gram_multiset():
    """Rehashing the shipped super-k-gram runs yields EXACTLY the
    per-partition gram multisets of the original corpus."""
    rows = _corpus(seed=11)
    flat, offs = _flat(rows)
    gh, _, _ = kgram_hashes_flat(flat, offs, K)
    part, _ = kgram_minimizer_parts(flat, offs, K, P)

    t = pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
         "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.int32()))}
    )
    seg = _segment_rows_fn(K, P, "tokens")(t)
    sp = seg.column("part").to_numpy(zero_copy_only=False)
    sflat, soffs = (
        seg.column("toks").combine_chunks().flatten().to_numpy(zero_copy_only=False),
        seg.column("toks").combine_chunks().offsets.to_numpy(zero_copy_only=False),
    )
    got: dict[int, list] = {}
    for i in range(len(sp)):
        toks = sflat[soffs[i] : soffs[i + 1]]
        hs, _, _ = kgram_hashes_flat(toks, np.array([0, len(toks)]), K)
        got.setdefault(int(sp[i]), []).extend(hs.tolist())
    want: dict[int, list] = {}
    for p_, h_ in zip(part, gh):
        want.setdefault(int(p_), []).append(int(h_))
    assert set(got) == set(want)
    for p_ in want:
        assert sorted(got[p_]) == sorted(want[p_])


def test_skmer_build_zero_fn_and_fpr(ray_session):
    from bloomfilter_multithread_ray.pipelines.bloom import probe_bloom
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    rows = _corpus(n_docs=80, seed=5)
    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
         "tokens": pa.array([r["tokens"] for r in rows], pa.list_(pa.int32()))}
    )).repartition(4)
    sk = build_partitioned_bloom_skmer(
        ds, k=K, num_partitions=P, bits_per_partition=1 << 16
    ).to_pandas()
    shards = {int(p): deserialize_sketch(b) for p, b in zip(sk["part"], sk["sketch"])}

    # zero false negatives through the minimizer-routed probe
    probe = probe_bloom(
        ds, shards, k=K, num_partitions=P, partition_mode="minimizer", concurrency=2
    ).to_pandas()
    flat, offs = _flat(rows)
    n_grams = sum(max(0, len(r["tokens"]) - K + 1) for r in rows)
    assert len(probe) == n_grams
    assert probe["member"].all()

    # negatives (disjoint vocab) mostly reject
    neg_rows = [
        {"doc_id": 1000 + i, "tokens": np.random.default_rng(i).integers(10_000, 20_000, 30).astype(np.int32)}
        for i in range(20)
    ]
    neg = rd.from_arrow(pa.table(
        {"doc_id": pa.array([r["doc_id"] for r in neg_rows], pa.int64()),
         "tokens": pa.array([r["tokens"] for r in neg_rows], pa.list_(pa.int32()))}
    ))
    pneg = probe_bloom(
        neg, shards, k=K, num_partitions=P, partition_mode="minimizer", concurrency=2
    ).to_pandas()
    assert pneg["member"].mean() < 0.05

    # hash-routed probe of a minimizer store is NOT valid — and the
    # mode must be explicit
    with pytest.raises(ValueError, match="partition_mode"):
        probe_bloom(ds, shards, k=K, num_partitions=P, partition_mode="banana")


def test_short_and_empty_rows_emit_nothing():
    t = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "tokens": pa.array(
             [np.array([], np.int32), np.array([1, 2], np.int32),
              np.array([3, 4, 5], np.int32)],
             pa.list_(pa.int32()),
         )}
    )
    seg = _segment_rows_fn(K, P, "tokens")(t)
    assert seg.num_rows == 0
    part, g = kgram_minimizer_parts(*_flat(
        [{"tokens": np.array([], np.int32)}, {"tokens": np.array([1, 2], np.int32)}]
    ), K, P)
    assert len(part) == 0 and len(g) == 0


def test_minimizer_probe_rejects_canonical(ray_session):
    import pytest

    from bloomfilter_multithread_ray.pipelines.bloom import BloomProbe, probe_bloom
    from bloomfilter_multithread_ray.state import BloomFilter

    shards = {0: BloomFilter(1 << 10, 2)}
    with pytest.raises(ValueError, match="canonical"):
        BloomProbe(shards, k=3, num_partitions=1, canonical=True,
                   partition_mode="minimizer")
    with pytest.raises(ValueError, match="canonical"):
        probe_bloom(None, shards, k=3, num_partitions=1, complement="dna",
                    partition_mode="minimizer")


def test_skmer_store_manifest_records_partition_fn(ray_session, tmp_path):
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.pipelines.skmer import build_and_store_skmer

    rng = np.random.default_rng(3)
    toks = [rng.integers(0, 30, 20).astype(np.int32).tolist() for _ in range(40)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "tokens": pa.array(toks, pa.list_(pa.int32()))})
    )
    store = str(tmp_path / "skmer_store")
    build_and_store_skmer(ds, store, k=4, num_partitions=8,
                          bits_per_partition=1 << 16)
    cfg = json.load(open(f"{store}/manifest.json"))
    assert cfg["partition_fn"] == "minimizer"

    # zero false negatives when probed in the matching mode
    from bloomfilter_multithread_ray.pipelines.bloom import (
        load_sketch_store,
        probe_bloom,
    )

    shards, manifest = load_sketch_store(store)
    assert manifest["partition_fn"] == "minimizer"
    out = probe_bloom(ds, shards, k=4, num_partitions=8,
                      partition_mode="minimizer", concurrency=2)
    df = out.to_pandas()
    assert df["member"].all()
