"""Dedup family: MinHash-LSH, SimHash, exact n-gram Jaccard, keep-set.

Oracle strategy: exact word-shingle Jaccard / exact Hamming computed
with numpy/sets on the small sf0.001 documents table; the approximate
pipelines must (a) find every strongly-duplicated pair (recall on
>= 0.8-Jaccard pairs), (b) emit no pair whose true similarity is far
below threshold (precision slack), (c) agree with the DuckDB-parity
exact pipeline where applicable.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds():
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def exact_jaccard():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    sets = {}
    for i, tx in zip(ids, t.column("text").to_pylist()):
        w = [x for x in tx.split(" ") if x]
        sets[i] = {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
    out = {}
    idl = sorted(sets)
    for ai in range(len(idl)):
        a = idl[ai]
        for b in idl[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                out[(a, b)] = inter / (len(sets[a]) + len(sets[b]) - inter)
    return out


def test_minhash_lsh_recall_precision(docs_ds, exact_jaccard):
    from bloomfilter_multithread_ray.pipelines.dedup import minhash_lsh_pairs

    got = minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
    found = {(int(a), int(b)) for a, b in zip(got.doc_a, got.doc_b)}
    strong = {p for p, j in exact_jaccard.items() if j >= 0.8}
    assert strong, "fixture should contain strong near-dups"
    assert strong <= found, f"missed strong pairs: {strong - found}"
    # no emitted pair is far below threshold in true Jaccard
    for a, b in found:
        assert exact_jaccard.get((a, b), 0.0) >= 0.35, (a, b)
    # signature estimate close to true Jaccard (128 perms -> se ~ 0.044)
    for _, r in got.iterrows():
        true = exact_jaccard[(int(r.doc_a), int(r.doc_b))]
        assert abs(r.est_jaccard - true) < 0.2


def test_ngram_jaccard_exact_matches_oracle(docs_ds, exact_jaccard):
    from bloomfilter_multithread_ray.pipelines.dedup import ngram_jaccard_pairs

    got = ngram_jaccard_pairs(docs_ds, k=3, threshold=0.5).to_pandas()
    want = {p: j for p, j in exact_jaccard.items() if j >= 0.5}
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert want[(int(r.doc_a), int(r.doc_b))] == pytest.approx(r.jaccard, abs=0)


def test_simhash_pairs_exact_hamming(docs_ds):
    from bloomfilter_multithread_ray.pipelines.dedup import (
        make_simhash_fn,
        simhash_pairs,
    )

    got = simhash_pairs(docs_ds, max_hamming=3).to_pandas()
    # oracle: compute every simhash locally, brute-force all pairs
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    local = make_simhash_fn()(t)
    sh = dict(zip(local.column("doc_id").to_pylist(), local.column("simhash").to_pylist()))
    ids = sorted(sh)
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(sh[ids[i]] ^ sh[ids[j]]).count("1")
            if d <= 3:
                want.add((ids[i], ids[j], d))
    found = {(int(a), int(b), int(h)) for a, b, h in zip(got.doc_a, got.doc_b, got.hamming)}
    # banding guarantees exact recall for distance <= max_hamming
    assert found == want


def test_keep_set(docs_ds):
    from bloomfilter_multithread_ray.pipelines.dedup import (
        keep_set_from_pairs,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(docs_ds, threshold=0.5)
    keep = keep_set_from_pairs(docs_ds, pairs)
    n_docs = docs_ds.count()
    pdf = pairs.to_pandas()
    # survivors: every doc minus non-root members of dup components
    assert len(keep) < n_docs
    assert len(keep) >= n_docs - len(pdf)
    # every emitted pair has at most one surviving endpoint... the kept
    # endpoint must be the component min for 2-cliques
    kept = set(keep.doc_id)
    for _, r in pdf.iterrows():
        assert not ((r.doc_a in kept) and (r.doc_b in kept))


def test_minhash_signature_determinism(docs_ds):
    from bloomfilter_multithread_ray.pipelines.dedup import make_minhash_fn

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = make_minhash_fn()(t)
    b = make_minhash_fn()(t.slice(0, 100))
    # same doc -> same signature regardless of batch composition
    assert a.slice(0, 100).equals(b)


def test_triu_expand_exhaustive():
    from bloomfilter_multithread_ray.pipelines.dedup import _triu_expand

    for lens in ([2], [5], [1], [0], [3, 1, 4, 2, 64]):
        lens = np.array(lens, dtype=np.int64)
        seg, a, b = _triu_expand(lens)
        want = []
        for s_i, L in enumerate(lens):
            for i in range(L):
                for j in range(i + 1, L):
                    want.append((s_i, i, j))
        assert list(zip(seg.tolist(), a.tolist(), b.tolist())) == want, lens


def test_minhash_ignores_empty_tokens():
    """Whitespace-only docs have NO shingles (no phantom near-dups);
    trailing spaces don't change the signature."""
    from bloomfilter_multithread_ray.pipelines.dedup import make_minhash_fn

    t = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
         "text": pa.array(["   ", "    ", "a b c d", "a b c d "], pa.string())}
    )
    out = make_minhash_fn(k=3)(t)
    ids = out.column("doc_id").to_pylist()
    assert 1 not in ids and 2 not in ids  # no shingles at all
    sigs = {i: s for i, s in zip(ids, out.column("sig").to_pylist())}
    assert sigs[3] == sigs[4]  # trailing space is invisible


def test_lsh_banding_adapts_to_threshold():
    from bloomfilter_multithread_ray.pipelines.dedup import pick_lsh_bands

    b5 = pick_lsh_bands(128, 0.5)
    r5 = 128 // b5
    mid = (1 / b5) ** (1 / r5)
    assert mid < 0.5  # recall at the threshold > 50%
    # bucket-collision prob for a true 0.5-Jaccard pair must be high
    recall = 1 - (1 - 0.5**r5) ** b5
    assert recall >= 0.8, (b5, recall)
    # and a 0.8 threshold picks a tighter banding
    b8 = pick_lsh_bands(128, 0.8)
    assert b8 < b5


def test_sketch_agg_drops_nulls():
    from bloomfilter_multithread_ray.stages.sketch_agg import SketchAgg
    from bloomfilter_multithread_ray.state import BloomFilter
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    agg = SketchAgg(lambda: BloomFilter(1 << 12, 4), on="gh")
    clean = pa.table({"gh": pa.array([1, 2, 3], pa.uint64())})
    dirty = pa.table({"gh": pa.array([1, None, 2, 3, None], pa.uint64())})
    a = deserialize_sketch(agg.finalize(agg.aggregate_block(clean)))
    b = deserialize_sketch(agg.finalize(agg.aggregate_block(dirty)))
    assert np.array_equal(a.bits, b.bits)
    assert b.n_added == 3  # nulls not counted


def test_ngram_pack_width_validation():
    from bloomfilter_multithread_ray.pipelines.dedup import ngram_jaccard_pairs
    import ray.data

    bad = pa.table(
        {"doc_id": pa.array([1 << 40], pa.int64()),
         "text": pa.array(["a b c d e"], pa.string())}
    )
    ds = ray.data.from_arrow(bad)
    with pytest.raises(Exception, match="doc_id out of"):
        ngram_jaccard_pairs(ds, k=3).take_all()


# ------------------------------------------------- incremental LSH store
@pytest.fixture(scope="module")
def lsh_store(docs_ds, tmp_path_factory):
    from bloomfilter_multithread_ray.pipelines.dedup import build_minhash_store

    path = str(tmp_path_factory.mktemp("lsh") / "store")
    base = docs_ds.filter(expr="doc_id < 400")
    manifest = build_minhash_store(base, path)
    return path, manifest


def _uf_reference(exact_jaccard, ids, split=400, threshold=0.5):
    """Reference: union-find CC over exact-Jaccard pairs touching the
    increment, base pinned via the +2^40 encoding, min per component."""
    OFF = 1 << 40
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            parent[rb] = ra

    def enc(d):
        return d if d < split else d + OFF

    for (a, b), j in exact_jaccard.items():
        if j >= threshold and (a >= split or b >= split):
            union(enc(a), enc(b))
    rows = []
    for d in sorted(i for i in ids if i >= split):
        root = find(enc(d))
        keep = root == enc(d)
        dup_of = -1 if keep else (root - OFF if root >= OFF else root)
        rows.append({"doc_id": d, "keep": keep, "dup_of": dup_of})
    return pd.DataFrame(rows)


def test_minhash_increment_matches_exact_reference(docs_ds, exact_jaccard, lsh_store):
    from bloomfilter_multithread_ray.pipelines.dedup import minhash_increment

    path, _ = lsh_store
    inc = docs_ds.filter(expr="doc_id >= 400")
    got = minhash_increment(inc, path).reset_index(drop=True)
    ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_pylist()
    want = _uf_reference(exact_jaccard, ids)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_minhash_increment_partition_invariance(docs_ds, lsh_store):
    from bloomfilter_multithread_ray.pipelines.dedup import minhash_increment

    path, _ = lsh_store
    inc = docs_ds.filter(expr="doc_id >= 400")
    a = minhash_increment(inc, path).reset_index(drop=True)
    b = minhash_increment(inc.repartition(7), path).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_minhash_increment_ingest_exactly_once(docs_ds, tmp_path):
    from bloomfilter_multithread_ray.pipelines.dedup import (
        build_minhash_store,
        load_minhash_store_manifest,
        minhash_increment,
    )

    path = str(tmp_path / "store")
    build_minhash_store(docs_ds.filter(expr="doc_id < 400"), path)
    inc = docs_ds.filter(expr="doc_id >= 400")
    first = minhash_increment(inc, path, ingest_id="epoch-1")
    m1 = load_minhash_store_manifest(path)
    assert [i["ingest_id"] for i in m1["ingests"]] == ["epoch-1"]
    # replay with the same id: result identical, store unchanged
    replay = minhash_increment(inc, path, ingest_id="epoch-1")
    m2 = load_minhash_store_manifest(path)
    pd.testing.assert_frame_equal(first, replay)
    assert m2["n_band_rows"] == m1["n_band_rows"]
    assert len(m2["ingests"]) == 1
    # after ingest, re-probing the same docs drops every survivor as a
    # self-duplicate of its ingested copy
    again = minhash_increment(inc, path)
    kept = set(first.loc[first["keep"], "doc_id"])
    sub = again[again["doc_id"].isin(kept)]
    assert (~sub["keep"]).all()
    assert (sub["dup_of"] == sub["doc_id"]).all()


def test_minhash_increment_short_docs_kept(lsh_store):
    from bloomfilter_multithread_ray.pipelines.dedup import minhash_increment

    path, _ = lsh_store
    inc = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([9001, 9002], pa.int64()),
        "text": pa.array(["one two", ""]),  # < k tokens: no shingles
    }))
    got = minhash_increment(inc, path).reset_index(drop=True)
    assert got["keep"].all()
    assert (got["dup_of"] == -1).all()


def test_build_minhash_store_layout_and_manifest(lsh_store):
    import os

    path, manifest = lsh_store
    assert manifest["algo"] == "minhash_lsh_store"
    assert os.path.exists(os.path.join(path, "manifest.json"))
    bps = [d for d in os.listdir(os.path.join(path, "bands")) if d.startswith("bp=")]
    assert 0 < len(bps) <= manifest["num_partitions"]
    n = 0
    for d in bps:
        for f in os.listdir(os.path.join(path, "bands", d)):
            assert f.endswith(".parquet")
            n += pq.read_metadata(os.path.join(path, "bands", d, f)).num_rows
    assert n == manifest["n_band_rows"]


# ---------------------------------------------------- weighted tf Jaccard
def _wj_reference(rows, tau):
    from collections import Counter

    tfs = {r["doc_id"]: Counter(w for w in r["text"].split() if w)
           for r in rows}
    ids = sorted(tfs)
    ref = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = tfs[ids[x]], tfs[ids[y]]
            i = sum(min(a[t], b[t]) for t in a if t in b)
            u = sum(a.values()) + sum(b.values()) - i
            if u and i / u >= tau:
                ref[(ids[x], ids[y])] = round(i / u, 6)
    return ref


def test_weighted_jaccard_matches_reference_and_partitioning(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines import dedup as D

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))}
        for i in range(60)
    ]
    ref = _wj_reference(rows, 0.3)
    for par in (2, 7):
        out = D.weighted_jaccard_pairs(
            rd.from_items(rows).repartition(par), tau=0.3
        ).to_pandas()
        got = {(int(r.doc_a), int(r.doc_b)): float(r.wjaccard)
               for r in out.itertuples()}
        assert got == ref, par


def test_weighted_jaccard_tf_differs_from_set_jaccard(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines import dedup as D

    # same token SET, very different tf profile: set Jaccard = 1.0 but
    # weighted is 3/10 (min-sum 2+1 over union 10+3-3)
    rows = [{"doc_id": 0, "text": "a b a b a b a b a b"},
            {"doc_id": 1, "text": "a a b"}]
    out = D.weighted_jaccard_pairs(
        rd.from_items(rows), tau=0.1
    ).to_pandas()
    assert len(out) == 1
    assert abs(float(out.wjaccard[0]) - 0.3) < 1e-12


def test_weighted_jaccard_df_cap_is_deterministic(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines import dedup as D

    # a stopword shared by every doc: with max_token_df=2 only the two
    # lowest doc ids pair on it — identical at any partitioning
    rows = [{"doc_id": i, "text": "the the unique%d" % i} for i in range(8)]
    outs = []
    for par in (1, 5):
        out = D.weighted_jaccard_pairs(
            rd.from_items(rows).repartition(par), tau=0.1, max_token_df=2
        ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert set(zip(outs[0].doc_a, outs[0].doc_b)) == {(0, 1)}


def test_weighted_jaccard_dense_and_posting_plans_agree(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines import dedup as D

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(9)]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(1, 30))))}
        for i in range(80)
    ]
    ds = rd.from_items(rows).repartition(6)
    dense = D.weighted_jaccard_pairs(ds, tau=0.25).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    # dense_vocab_max=0 forces the packed-posting plan on the same input
    post = D.weighted_jaccard_pairs(
        ds, tau=0.25, dense_vocab_max=0
    ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert len(dense) > 0
    pd.testing.assert_frame_equal(dense, post)


def test_wjac_plan_choice(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.dedup import _wjac_plan

    # 3 tokens x 4 docs, df=4 each
    tf = rd.from_arrow(pa.table({
        "th": pa.array([t for t in (11, 22, 33) for _ in range(4)], pa.int64()),
        "doc_id": pa.array([d for _ in range(3) for d in range(4)], pa.int64()),
        "cnt": pa.array([1] * 12, pa.int64()),
    }))
    plan, vocab = _wjac_plan(tf, dense_vocab_max=16, max_token_df=8,
                             num_partitions=4)
    assert plan == "dense" and list(vocab) == [11, 22, 33]
    # vocabulary too large for the dense path
    plan, _ = _wjac_plan(tf, dense_vocab_max=2, max_token_df=8,
                         num_partitions=4)
    assert plan == "posting"
    # a token's df exceeds the posting cap: cap semantics would differ,
    # so the dense path must refuse
    plan, _ = _wjac_plan(tf, dense_vocab_max=16, max_token_df=3,
                         num_partitions=4)
    assert plan == "posting"


def test_pair_provenance_matches_reference(ray_session):
    import math
    from itertools import combinations

    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines import dedup as D

    # two sources that plagiarize each other + one clean source
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(10):
        rows.append({"doc_id": i, "source": "sA", "text": base + f" tail{i}"})
        rows.append({"doc_id": 100 + i, "source": "sB",
                     "text": base + f" tail{i}"})
        rows.append({"doc_id": 200 + i, "source": "sC",
                     "text": " ".join(f"u{i}w{j}" for j in range(12))})

    def grams(t, k=3):
        w = [x for x in t.split() if x]
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    ref = {}
    by_id = {r["doc_id"]: r for r in rows}
    for a, b in combinations(sorted(by_id), 2):
        ga, gb = grams(by_id[a]["text"]), grams(by_id[b]["text"])
        if not ga or not gb:
            continue
        i = len(ga & gb)
        if i == 0:
            continue
        j = i / (len(ga) + len(gb) - i)
        if j < 0.5:
            continue
        key = tuple(sorted((by_id[a]["source"], by_id[b]["source"])))
        n, s = ref.get(key, (0, 0))
        ref[key] = (n + 1, s + int(math.floor(j * 1e6 + 0.5)))

    expect = {k: (n, s / n / 1e6) for k, (n, s) in ref.items()}
    for par in (1, 4):
        out = D.pair_provenance(
            rd.from_items(rows).repartition(par), k=3, threshold=0.5
        ).to_pandas()
        got = {(r.source_a, r.source_b): (int(r.n_pairs), float(r.mean_jaccard))
               for r in out.itertuples()}
        assert got.keys() == expect.keys(), par
        for kk in expect:
            assert got[kk][0] == expect[kk][0]
            assert abs(got[kk][1] - expect[kk][1]) < 1e-12
    # the cross-source plagiarism shows up; the clean source doesn't
    assert ("sA", "sB") in got and not any("sC" in kk for kk in got)


def test_icws_collision_prob_equals_weighted_jaccard(ray_session):
    from collections import Counter

    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.dedup import icws_signatures

    ta = "a a a b b c d e f g"
    tb = "a a b b b c d x y z"
    ca, cb = Counter(ta.split()), Counter(tb.split())
    inter = sum(min(ca[t], cb[t]) for t in ca if t in cb)
    wj = inter / (sum(ca.values()) + sum(cb.values()) - inter)
    S = 2048
    sigs = icws_signatures(
        rd.from_items([{"doc_id": 0, "text": ta}, {"doc_id": 1, "text": tb}]),
        num_hashes=S,
    ).to_pandas()
    m = {r.doc_id: np.array(r.sig) for r in sigs.itertuples()}
    rate = (m[0] == m[1]).mean()
    sd = (wj * (1 - wj) / S) ** 0.5
    assert abs(rate - wj) < 4 * sd, (rate, wj)


def test_weighted_lsh_exact_verify_and_partitioning(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines import dedup as D

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(15)]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(3, 40))))}
        for i in range(150)
    ]
    ds = rd.from_items(rows)
    exact = D.weighted_jaccard_pairs(ds, tau=0.5).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    outs = []
    for par in (1, 6):
        lsh = D.weighted_dup_pairs_lsh(
            ds.repartition(par), tau=0.5, num_hashes=128, bands=64,
            est_margin=0.25,
        ).to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        outs.append(lsh)
        # precision exact by construction; aggressive banding reaches
        # full recall on this corpus -> bit-equal to the exact op
        pd.testing.assert_frame_equal(lsh, exact)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_minhash_increment_guards(ray_session, tmp_path):
    """Round-5 hardening: loud refusals for the silent-corruption
    paths — ingest_id='base' (would overwrite corpus partition files),
    path-escaping ingest ids, and doc_id >= 2^40 (base/increment
    encoding ambiguity) at BUILD time."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.dedup import (
        build_minhash_store, minhash_increment,
    )

    docs = pd.DataFrame(
        {"doc_id": np.arange(8, dtype=np.int64),
         "text": [f"alpha beta gamma delta {i}" for i in range(8)]}
    )
    store = str(tmp_path / "store")
    build_minhash_store(rd.from_pandas(docs), store, num_partitions=4)
    inc = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([100], np.int64),
         "text": ["alpha beta gamma delta 0"]}))
    for bad in ("base", "a/b", "../up", ""):
        with pytest.raises(Exception, match="ingest_id"):
            minhash_increment(inc, store, ingest_id=bad)
    # build-time refusal for ids that collide with the increment space
    big = pd.DataFrame(
        {"doc_id": np.array([1, 1 << 40], np.int64),
         "text": ["alpha beta gamma delta", "alpha beta gamma epsilon"]}
    )
    with pytest.raises(Exception, match="2\\^40"):
        build_minhash_store(rd.from_pandas(big), str(tmp_path / "s2"),
                            num_partitions=2)
    # increment-side refusal too
    inc_big = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.array([1 << 40], np.int64),
         "text": ["alpha beta gamma delta 0"]}))
    with pytest.raises(Exception, match="2\\^40"):
        minhash_increment(inc_big, store)


def test_weighted_lsh_bands_divisibility_guard(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.dedup import (
        weighted_dup_pairs_lsh,
    )

    docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64),
         "text": ["a b c"] * 4}))
    with pytest.raises(ValueError, match="equal bands"):
        weighted_dup_pairs_lsh(docs, num_hashes=128, bands=3)
