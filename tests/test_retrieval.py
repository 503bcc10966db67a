"""BM25 retrieval: planted-corpus checks against hand-computed scores."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bloomfilter_multithread_ray.pipelines.retrieval import bm25_search


def _write_docs(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    pq.write_table(t, d / "documents.parquet")
    return str(d)


def _bm25_ref(texts, query, k1=1.2, b=0.75):
    """Independent plain-python BM25 with the same quantization."""
    import math

    docs = [t.split() for t in texts]
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    for t in sorted(set(query.split())):
        df = sum(1 for d in docs if t in d)
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(docs):
            tf = d.count(t)
            if tf == 0:
                continue
            u = (1e9 * idf) * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + (b * len(d)) / avgdl)
            )
            out[i] = out.get(i, 0) + int(np.trunc(u + 0.5))
    return {i: s / 1e9 for i, s in out.items() if s > 0}


def test_bm25_matches_reference_scorer(ray_session, tmp_path):
    texts = [
        "alpha beta gamma alpha",
        "beta beta delta",
        "gamma gamma gamma alpha beta",
        "delta epsilon",
        "zeta eta",
    ]
    sf = _write_docs(tmp_path, texts)
    q = "alpha beta"
    got = bm25_search(sf, queries=(q,), topk=10)
    want = _bm25_ref(texts, q)
    assert set(got["doc_id"]) == set(want)
    for _, row in got.iterrows():
        assert row["score"] == want[row["doc_id"]], row["doc_id"]
    # sorted by score desc, doc_id asc
    s = got["score"].to_numpy()
    assert (s[:-1] >= s[1:]).all()


def test_bm25_rare_term_outranks_common(ray_session, tmp_path):
    # 'rare' appears once; 'common' in every doc — the rare-term doc
    # must outrank docs matched only via the common term
    texts = ["common rare", "common x", "common y", "common z"]
    sf = _write_docs(tmp_path, texts)
    got = bm25_search(sf, queries=("common rare",), topk=4)
    assert got.iloc[0]["doc_id"] == 0
    assert len(got) == 4  # every doc contains 'common'


def test_bm25_no_match_and_topk_cap(ray_session, tmp_path):
    texts = ["a b", "c d", "e f"]
    sf = _write_docs(tmp_path, texts)
    got = bm25_search(sf, queries=("zzz", "a"), topk=2)
    # 'zzz' matches nothing -> absent; 'a' matches exactly doc 0
    assert list(got["query"].unique()) == ["a"]
    assert list(got["doc_id"]) == [0]


def test_bm25_empty_and_multirow_docs(ray_session, tmp_path):
    # empty text and consecutive-space text exercise the offsets kernel
    texts = ["", "a  a a", " a "]
    sf = _write_docs(tmp_path, texts)
    got = bm25_search(sf, queries=("a",), topk=10)
    assert list(got["doc_id"]) == [1, 2]  # tf=3 beats tf=1


def test_bm25_all_empty_corpus(ray_session, tmp_path):
    sf = _write_docs(tmp_path, ["", "  ", ""])
    got = bm25_search(sf, queries=("a",), topk=5)
    assert len(got) == 0
    assert list(got.columns) == ["query", "doc_id", "score"]
