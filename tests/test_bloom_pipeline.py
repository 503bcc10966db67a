"""End-to-end flagship pipeline tests (FIXTURES.md F2/F3).

Includes the golden reference-parity fixture: the SARS-CoV-2 genome
tokenized with the reference's 2-bit code, queried with the 3,850-token
prefix — probe output must be all-ones in position order (the
reference's entire implicit correctness story, SURVEY §5.1).
"""

import numpy as np
import pyarrow as pa
import pytest

from bloomfilter_multithread_ray.pipelines import (
    build_and_store,
    build_partitioned_bloom,
    load_sketch_store,
    probe_bloom,
)
from bloomfilter_multithread_ray.sources import (
    fasta_to_table,
    generate_query_table,
    generate_sequences_table,
)
from bloomfilter_multithread_ray.stages.sketch_agg import sketch_rows_to_dict

REF_FASTA = "/root/reference/inputs/sars-cov-2.fasta"
REF_QUERY = "/root/reference/inputs/query.txt"


@pytest.fixture(scope="module")
def corpus_table():
    return generate_sequences_table(300, seed=42)


def test_fasta_parity_tokenization():
    tbl = fasta_to_table(REF_FASTA)
    assert tbl.num_rows == 1
    assert tbl.column("doc_id")[0].as_py() == "NC_045512.2"
    toks = np.asarray(tbl.column("tokens")[0].as_py())
    assert len(toks) == 29903  # reference fixture scale (BASELINE.md)
    assert set(np.unique(toks)) <= {0, 1, 2, 3}
    q = fasta_to_table(REF_QUERY)
    qt = np.asarray(q.column("tokens")[0].as_py())
    assert len(qt) == 3850
    # per-row token-array equality invariant (input_hint): query is a
    # verbatim prefix of the corpus sequence
    assert np.array_equal(qt, toks[: len(qt)])


def test_genome_parity_end_to_end(ray_session, tmp_path):
    """Reference pipeline A+B: build on genome, probe prefix → all ones."""
    ray = ray_session
    k = 31
    corpus = ray.data.from_arrow(fasta_to_table(REF_FASTA))
    # q=3 partitions and 65,536 bits/shard mirror the reference config
    # (src/main.cpp:73-75); num_hashes=1 is the parity mode
    sk = build_partitioned_bloom(
        corpus, k=k, num_partitions=3, bits_per_partition=65536, num_hashes=1
    )
    shards = sketch_rows_to_dict(sk.take_all())
    assert set(shards) == {0, 1, 2}

    query = ray.data.from_arrow(fasta_to_table(REF_QUERY))
    res = probe_bloom(query, shards, k=k, num_partitions=3).sort("pos")
    out = res.take_all()
    assert len(out) == 3850 - k + 1  # 3,820 k-mers
    assert all(r["member"] for r in out), "false negative on inserted k-mer"
    assert [r["pos"] for r in out] == list(range(3820))


def test_synthetic_build_probe_fpr(ray_session, corpus_table, tmp_path):
    """F2: copies → all member; disjoint-vocab rows → FPR within bound."""
    ray = ray_session
    k = 8
    P = 16
    bits = 1 << 18
    corpus = ray.data.from_arrow(corpus_table)
    sk = build_partitioned_bloom(
        corpus, k=k, num_partitions=P, bits_per_partition=bits, num_hashes=4
    )
    rows = sk.take_all()
    shards = sketch_rows_to_dict(rows)
    assert len(shards) == P

    qt = generate_query_table(corpus_table, 200, seed=43)
    query = ray.data.from_arrow(qt)
    res = probe_bloom(query, shards, k=k, num_partitions=P).to_pandas()

    truth = {r["doc_id"]: r["expect_member"] for r in qt.select(["doc_id", "expect_member"]).to_pylist()}
    res["expect"] = res["doc_id"].map(truth)
    pos_part = res[res["expect"]]
    assert pos_part["member"].all(), "zero-false-negative invariant broken"

    neg_part = res[~res["expect"]]
    # per-shard n unknown here; bound with total distinct inserted spread over P
    n_grams = int(sum(max(0, n - k + 1) for n in corpus_table.column("n_tok").to_pylist()))
    from bloomfilter_multithread_ray.state import BloomFilter

    bf = BloomFilter(bits, 4)
    bound = bf.theoretical_fpr(n_grams // P)  # distinct per shard <= total/P approx
    fpr = float(neg_part["member"].mean())
    assert fpr <= max(3 * bound, 0.01), f"fpr {fpr} vs bound {bound}"


def test_store_roundtrip_and_metrics(ray_session, corpus_table, tmp_path):
    ray = ray_session
    store = str(tmp_path / "store")
    corpus = ray.data.from_arrow(corpus_table)
    build_and_store(
        corpus, store, k=8, num_partitions=4, bits_per_partition=1 << 16, num_hashes=4
    )
    shards, manifest = load_sketch_store(store)
    assert manifest["algo"] == "bloom" and manifest["num_partitions"] == 4
    assert set(shards) == {0, 1, 2, 3}
    # lineage metrics present in the store parquet
    import pyarrow.parquet as pq

    t = pq.read_table(f"{store}/sketches")
    assert {"part", "sketch", "n_added", "fill_ratio"} <= set(t.column_names)
    n_grams = int(sum(max(0, n - 8 + 1) for n in corpus_table.column("n_tok").to_pylist()))
    assert sum(t.column("n_added").to_pylist()) == n_grams


def test_salted_build_equals_unsalted(ray_session, corpus_table):
    """Salting is a physical-balance knob, not a semantic one: the
    un-salted merged store must equal the plain build bitwise."""
    ray = ray_session
    kw = dict(k=8, num_partitions=8, bits_per_partition=1 << 14, num_hashes=4)
    plain = sketch_rows_to_dict(
        build_partitioned_bloom(ray.data.from_arrow(corpus_table), **kw).take_all()
    )
    salted = sketch_rows_to_dict(
        build_partitioned_bloom(
            ray.data.from_arrow(corpus_table), salt_bits=2, **kw
        ).take_all()
    )
    assert set(plain) == set(salted)
    for p in plain:
        assert np.array_equal(plain[p].bits, salted[p].bits), f"part {p} differs"


def test_routed_probe_equals_broadcast(tmp_path):
    from bloomfilter_multithread_ray.pipelines.bloom import (
        build_and_store,
        load_sketch_store,
        probe_bloom,
        probe_bloom_routed,
    )
    from bloomfilter_multithread_ray.sources.sequences import write_sequences_parquet
    import ray.data

    corpus = str(tmp_path / "corpus")
    write_sequences_parquet(corpus, 300, seed=21, rows_per_file=100)
    store = str(tmp_path / "store")
    cfg = dict(k=4, num_partitions=8, bits_per_partition=1 << 16)
    build_and_store(ray.data.read_parquet(corpus, columns=["tokens"]), store, **cfg)
    shards, _ = load_sketch_store(store)
    ds = ray.data.read_parquet(corpus, columns=["doc_id", "tokens"])
    a = (
        probe_bloom(ds, shards, k=4, num_partitions=8, concurrency=2)
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    ds2 = ray.data.read_parquet(corpus, columns=["doc_id", "tokens"])
    b = (
        probe_bloom_routed(ds2, store, k=4, num_partitions=8)
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert a.member.all()  # probing the build corpus: zero false negatives


def test_store_rebuild_is_crash_safe(tmp_path):
    """Interrupting a rebuild must not leave a manifest pointing at
    deleted sketches: the marker is removed before the clear."""
    import os

    from bloomfilter_multithread_ray.pipelines.bloom import build_and_store
    from bloomfilter_multithread_ray.sources.sequences import write_sequences_parquet
    import ray.data

    corpus = str(tmp_path / "corpus")
    write_sequences_parquet(corpus, 100, seed=41, rows_per_file=100)
    store = str(tmp_path / "store")
    cfg = dict(k=4, num_partitions=4, bits_per_partition=1 << 14)
    build_and_store(ray.data.read_parquet(corpus, columns=["tokens"]), store, **cfg)
    assert os.path.exists(f"{store}/manifest.json")
    # second build over the same path: the old marker must be gone the
    # moment the old sketches are cleared (simulated by checking order
    # via a fresh rebuild completing cleanly and remaining loadable)
    build_and_store(ray.data.read_parquet(corpus, columns=["tokens"]), store, **cfg)
    from bloomfilter_multithread_ray.pipelines.bloom import load_sketch_store

    shards, manifest = load_sketch_store(store)
    assert len(shards) == 4 and manifest["num_partitions"] == 4
