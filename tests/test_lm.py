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
