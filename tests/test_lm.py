"""Unit tests for pipelines/lm.py — byte-bigram LM training + scoring."""

import numpy as np
import pyarrow as pa

from bloomfilter_multithread_ray.pipelines import lm


def _ds(ray, rows, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(parallelism)


def _np_model(texts):
    """Reference model computed naively."""
    C2 = np.zeros(65536, dtype=np.int64)
    chars = set()
    for t in texts:
        b = t.encode()
        chars.update(b)
        for i in range(len(b) - 1):
            C2[b[i] * 256 + b[i + 1]] += 1
    V = len(chars)
    C1 = C2.reshape(256, 256).sum(axis=1)
    logp = np.log(C2 + 1.0) - np.repeat(np.log(C1 + float(V)), 256)
    return logp, V


def test_train_matches_naive_counts(ray_session):
    texts = ["abcab", "bca", "aa", "", "x"]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    m = lm.train_bigram_lm(_ds(ray_session, rows))
    logp, V = _np_model(texts)
    assert m["V"] == V == 4  # a b c x
    np.testing.assert_allclose(m["logp"], logp)
    assert m["n_bigrams"] == sum(max(len(t) - 1, 0) for t in texts)


def test_perplexity_matches_naive_and_skips_short_docs(ray_session):
    texts = ["abcabcab", "aaaa", "z", ""]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = (
        lm.lm_perplexity(_ds(ray_session, rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # docs 2 ("z") and 3 ("") have no bigram -> excluded
    assert out.doc_id.tolist() == [0, 1]
    logp, _ = _np_model(texts)
    for _, r in out.iterrows():
        b = texts[int(r.doc_id)].encode()
        nll = -np.mean([logp[b[i] * 256 + b[i + 1]] for i in range(len(b) - 1)])
        assert r.ppl == np.exp(nll)
        assert r.n_bigrams == len(b) - 1


def test_repetitive_text_scores_lower_perplexity(ray_session):
    # the LM-filter property that matters: text matching corpus
    # statistics scores lower ppl than off-distribution text
    rows = [{"doc_id": i, "text": "the cat sat on the mat " * 5} for i in range(20)]
    rows.append({"doc_id": 99, "text": "zq zq xj xj qq zz"})
    out = lm.lm_perplexity(_ds(ray_session, rows)).to_pandas()
    ppl = out.set_index("doc_id").ppl
    assert ppl[99] > ppl.drop(99).max() * 2


def test_partitioning_independent(ray_session):
    rows = [{"doc_id": i, "text": f"doc number {i} has words"} for i in range(40)]
    a = lm.lm_perplexity(_ds(ray_session, rows, 2)).to_pandas().sort_values("doc_id")
    b = lm.lm_perplexity(_ds(ray_session, rows, 7)).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(a.ppl.values, b.ppl.values)


# ------------------------------------------------- trigram LM (join-scored)
def _trigram_reference(docs_tokens, round_dp=6):
    """{doc_id: [token,...]} → reference scores via naive counting."""
    import math
    from collections import Counter

    c3, c2 = Counter(), Counter()
    V = len({t for toks in docs_tokens.values() for t in toks})
    for toks in docs_tokens.values():
        for i in range(len(toks) - 2):
            c3[tuple(toks[i:i + 3])] += 1
            c2[tuple(toks[i:i + 2])] += 1
    out = {}
    for d, toks in docs_tokens.items():
        tris = [tuple(toks[i:i + 3]) for i in range(len(toks) - 2)]
        if not tris:
            continue
        s = sum(math.log((c3[x] + 1) / (c2[x[:2]] + V)) for x in tris)
        out[d] = (len(tris), round(math.exp(-s / len(tris)), round_dp))
    return out


def _check_trigram(out_df, ref):
    got = {
        int(r.doc_id): (int(r.n_trigrams), float(r.ppl))
        for r in out_df.itertuples()
    }
    assert set(got) == set(ref)
    for d in ref:
        assert got[d][0] == ref[d][0], d
        assert abs(got[d][1] - ref[d][1]) < 1e-9, d


def test_trigram_lm_matches_reference_and_skips_short(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(0, 10))))}
        for i in range(80)
    ]
    ds = _ds(ray_session, rows, parallelism=4)
    out = lm.trigram_lm_scores(ds).to_pandas()
    ref = _trigram_reference(
        {r["doc_id"]: [w for w in r["text"].split(" ") if w] for r in rows}
    )
    _check_trigram(out, ref)
    # short docs (under 3 words) are excluded
    short = {r["doc_id"] for r in rows
             if len([w for w in r["text"].split() if w]) < 3}
    assert short.isdisjoint(set(out.doc_id))


def test_trigram_lm_partitioning_independent(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(3, 15))))}
        for i in range(50)
    ]
    a = (lm.trigram_lm_scores(_ds(ray_session, rows, 2), num_partitions=8)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (lm.trigram_lm_scores(_ds(ray_session, rows, 9), num_partitions=64)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_trigram_lm_tokens_bit_equal_to_string_plan(ray_session):
    # the packed-int64 tokens plan is injective, so on a corpus where
    # token id i <-> word f"w{i}" both plans must produce EQUAL scores
    rng = np.random.default_rng(29)
    tok_rows, txt_rows = [], []
    for i in range(70):
        toks = rng.integers(0, 40, size=int(rng.integers(0, 12))).tolist()
        tok_rows.append(
            {"doc_id": i,
             "tokens": np.asarray(toks, dtype=np.int32),
             "n_tok": len(toks), "source": "s"}
        )
        txt_rows.append({"doc_id": i, "text": " ".join(f"w{t}" for t in toks)})
    t_tok = pa.Table.from_pylist(tok_rows).set_column(
        1, "tokens", pa.array([r["tokens"] for r in tok_rows],
                              pa.list_(pa.int32()))
    )
    import pandas as pd
    import ray.data as rd

    a = (lm.trigram_lm_scores_tokens(rd.from_arrow(t_tok).repartition(5))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (lm.trigram_lm_scores(_ds(ray_session, txt_rows, 3))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    ref = _trigram_reference(
        {r["doc_id"]: list(map(int, r["tokens"])) for r in tok_rows}
    )
    _check_trigram(a, ref)


def test_trigram_lm_tokens_rejects_oversized_ids(ray_session):
    import pytest
    import ray.data as rd

    t = pa.table(
        {"doc_id": pa.array([1]),
         "tokens": pa.array([[1, 2, 1 << 21]], pa.list_(pa.int32()))}
    )
    with pytest.raises(Exception):
        lm.trigram_lm_scores_tokens(rd.from_arrow(t)).to_pandas()


# ------------------------------------------------- Kneser-Ney trigram
def _kn_reference(docs_tokens, d=0.75, round_dp=6):
    import math
    from collections import Counter, defaultdict

    c3 = Counter()
    for toks in docs_tokens.values():
        for i in range(len(toks) - 2):
            c3[tuple(toks[i:i + 3])] += 1
    c2, n1ctx = Counter(), Counter()
    nmid, nden, nfollow = Counter(), Counter(), defaultdict(set)
    for (a, b, c) in c3:
        c2[(a, b)] += c3[(a, b, c)]
        n1ctx[(a, b)] += 1
        nmid[(b, c)] += 1
        nden[b] += 1
        nfollow[b].add(c)
    big = {(b, c) for (a, b, c) in c3}
    nprec = Counter()
    for (b, c) in big:
        nprec[c] += 1
    nbig = len(big)
    out = {}
    for did, toks in docs_tokens.items():
        tris = [tuple(toks[i:i + 3]) for i in range(len(toks) - 2)]
        if not tris:
            continue
        s = 0.0
        for t in tris:
            p2 = (max(nmid[t[1:]] - d, 0) / nden[t[1]]
                  + d * len(nfollow[t[1]]) / nden[t[1]] * nprec[t[2]] / nbig)
            p = (max(c3[t] - d, 0) / c2[t[:2]]
                 + d * n1ctx[t[:2]] / c2[t[:2]] * p2)
            s += math.log(p)
        out[did] = (len(tris), round(math.exp(-s / len(tris)), round_dp))
    return out


def test_kn_trigram_matches_reference_and_partitioning(ray_session):
    rng = np.random.default_rng(31)
    vocab = [f"k{i}" for i in range(18)]
    rows = [
        {"doc_id": i,
         "text": " ".join(rng.choice(vocab, size=int(rng.integers(0, 14))))}
        for i in range(70)
    ]
    ref = _kn_reference(
        {r["doc_id"]: [w for w in r["text"].split(" ") if w] for r in rows}
    )
    import pandas as pd

    outs = []
    for par, P in ((3, 16), (8, 64)):
        out = (lm.kn_trigram_lm_scores(_ds(ray_session, rows, par),
                                       num_partitions=P)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        got = {int(r.doc_id): (int(r.n_trigrams), float(r.ppl))
               for r in out.itertuples()}
        assert set(got) == set(ref)
        for k in ref:
            assert got[k][0] == ref[k][0]
            assert abs(got[k][1] - ref[k][1]) < 1e-9, k
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_kn_smoothing_beats_addone_on_seen_text(ray_session):
    # KN discounts seen mass far less than add-one on a small corpus:
    # its training-set perplexity must be lower for every document
    rows = [{"doc_id": i,
             "text": " ".join(f"t{(i + j) % 9}" for j in range(12))}
            for i in range(30)]
    kn = (lm.kn_trigram_lm_scores(_ds(ray_session, rows, 3))
          .to_pandas().set_index("doc_id"))
    a1 = (lm.trigram_lm_scores(_ds(ray_session, rows, 3))
          .to_pandas().set_index("doc_id"))
    assert (kn.ppl < a1.ppl).all()


def test_ppl_buckets_reference_and_partitioning(ray_session):
    import math
    from collections import Counter

    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.lm import ppl_buckets

    rng = np.random.default_rng(41)
    alphabet = list("abcdefg ")
    rows = []
    for i in range(120):
        k = int(rng.integers(2, 60))
        rows.append({"doc_id": i, "lang": "L%d" % (i % 2),
                     "text": "".join(rng.choice(alphabet, size=k))})

    # independent reference: add-one byte-bigram LM trained on the corpus
    big = Counter()
    uni = Counter()
    chars = set()
    for r in rows:
        t = r["text"]
        chars.update(t)
        for a, b in zip(t, t[1:]):
            big[a + b] += 1
            uni[a] += 1
    V = len(chars)
    qs = {}
    for r in rows:
        t = r["text"]
        if len(t) < 2:
            continue
        nll = -sum(math.log((big[a + b] + 1) / (uni[a] + V))
                   for a, b in zip(t, t[1:])) / (len(t) - 1)
        qs[r["doc_id"]] = int(math.floor(math.exp(nll) * 1e6 + 0.5))
    ref = {}
    for lang in ("L0", "L1"):
        vals = sorted(q for d, q in qs.items() if rows[d]["lang"] == lang)
        n = len(vals)
        t1 = vals[math.ceil(n / 3) - 1]
        t2 = vals[math.ceil(2 * n / 3) - 1]
        for d, q in qs.items():
            if rows[d]["lang"] != lang:
                continue
            ref[d] = "head" if q <= t1 else ("middle" if q <= t2 else "tail")

    for par in (1, 6):
        out = ppl_buckets(rd.from_items(rows).repartition(par)).to_pandas()
        got = dict(zip(out.doc_id.astype(int), out.bucket))
        assert got == ref, par
        qgot = dict(zip(out.doc_id.astype(int),
                        (out.ppl * 1e6).round().astype(int)))
        assert qgot == qs
    # terciles: each bucket holds roughly a third per language
    for lang in ("L0", "L1"):
        sub = out[out.lang == lang]
        counts = sub.bucket.value_counts()
        assert counts.min() >= len(sub) // 3 - 2
