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


# ------------------------------------ TF-IDF cosine + RRF hybrid search
def _tfidf_ref(texts, query):
    """Independent plain-python query-projected TF-IDF cosine with the
    engine's per-term 1e-9 quantization discipline."""
    import math

    docs = [t.split() for t in texts]
    n = len(docs)
    qtoks = query.split()
    qcnt = {t: qtoks.count(t) for t in set(qtoks)}
    live = {}
    for t in qcnt:
        df = sum(1 for d in docs if t in d)
        if df > 0:
            live[t] = math.log(n / df)
    qq = sum(int(np.trunc(1e9 * (qcnt[t] * idf) * (qcnt[t] * idf) + 0.5))
             for t, idf in live.items())
    out = {}
    for i, d in enumerate(docs):
        num = dd = 0
        for t, idf in live.items():
            tf = d.count(t)
            num += int(np.trunc(1e9 * (tf * idf) * (qcnt[t] * idf) + 0.5))
            dd += int(np.trunc(1e9 * (tf * idf) * (tf * idf) + 0.5))
        if num > 0:
            cos = num / (math.sqrt(dd) * math.sqrt(qq))
            out[i] = int(np.trunc(1e9 * cos + 0.5)) / 1e9
    return out


def test_tfidf_cosine_matches_reference(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.retrieval import (
        tfidf_cosine_search,
    )

    texts = [
        "bloom filter scan fast scan",
        "hash join merge join join",
        "window sort order by window",
        "scan scan scan scan scan scan",
        "filter bloom",
        "unrelated words entirely here",
        "",
    ]
    sf = _write_docs(tmp_path, texts)
    q = "bloom filter scan"
    got = tfidf_cosine_search(sf, [q], topk=10)
    ref = _tfidf_ref(texts, q)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got["doc_id"].tolist() == [i for i, _ in want]
    assert got["score"].tolist() == [s for _, s in want]
    # the all-scan doc is pure-projection cosine 1.0 only if the query
    # were one term; with three terms it cannot beat the exact-mix doc
    assert got["doc_id"].iloc[0] == 0


def test_tfidf_absent_terms_and_df0(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.retrieval import (
        tfidf_cosine_search,
    )

    texts = ["alpha beta", "beta gamma", "gamma alpha"]
    sf = _write_docs(tmp_path, texts)
    # 'zzz' has df=0 -> excluded from both vectors; query reduces to beta
    got = tfidf_cosine_search(sf, ["beta zzz"], topk=10)
    ref = _tfidf_ref(texts, "beta zzz")
    assert got["doc_id"].tolist() == sorted(ref, key=lambda i: (-ref[i], i))
    # all-absent query -> no rows
    none = tfidf_cosine_search(sf, ["zzz qqq"], topk=10)
    assert none.empty


def test_rrf_hybrid_fusion(ray_session, tmp_path):
    """Fused ranking == plain-python RRF over the two reference
    rankings; membership in only one list still scores."""
    from bloomfilter_multithread_ray.pipelines.retrieval import (
        rrf_hybrid_search,
    )

    texts = [
        "bloom filter scan fast scan",
        "hash join merge join join",
        "window sort order by window",
        ("bloom filter scan " * 30).strip(),
        "filter",
        "unrelated words entirely here",
        "bloom bloom bloom bloom bloom bloom bloom bloom",
    ]
    # top-3 lists diverge by construction: BM25's length penalty keeps
    # doc 4 out but admits the term-spam doc 6; projected cosine does
    # the opposite (verified in the reference scorers below)
    sf = _write_docs(tmp_path, texts)
    queries = ["bloom filter scan"]
    got = rrf_hybrid_search(sf, queries, k_sys=3, rrf_k=60, topk=10)

    bm = _bm25_ref(texts, queries[0])
    tf = _tfidf_ref(texts, queries[0])
    rb = {i: r + 1 for r, (i, _) in enumerate(
        sorted(bm.items(), key=lambda kv: (-kv[1], kv[0]))[:3])}
    rt = {i: r + 1 for r, (i, _) in enumerate(
        sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:3])}
    fused = {}
    for i in set(rb) | set(rt):
        v = (1.0 / (60.0 + rb[i]) if i in rb else 0.0) + (
            1.0 / (60.0 + rt[i]) if i in rt else 0.0)
        fused[i] = int(np.trunc(v * 1e9 + 0.5))
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got["doc_id"].tolist() == [i for i, _ in want]
    assert (got["rrf"] * 1e9).round().astype(int).tolist() == [
        s for _, s in want]
    # docs in one list only carry rank 0 for the other system
    only_one = got[(got["rank_bm25"] == 0) | (got["rank_tfidf"] == 0)]
    assert len(only_one) > 0
