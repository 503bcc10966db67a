"""Sparse lexical retrieval: distributed BM25 top-k search.

The at-100-TB retrieval shape for a FIXED, small query set (the common
curation case: decontamination probes, eval-set leak checks, targeted
corpus audits): the query terms broadcast into every task, the corpus
text NEVER moves, and only O(batches × terms) stat partials plus
O(batches × queries × k) top-k candidate rows ever leave the workers.
Two streaming passes over the corpus (BM25 needs global df/avgdl before
any document can be scored — same macro-structure as the reference's
build-then-probe phases, src/main.cpp:124-149: a small global state is
derived first, then a map-only scoring pass consults it).

Exactness discipline: each (doc, term) score is quantized to int64
1e-9 units half-AWAY-from-zero BEFORE summing over the query's terms
(the embedding-covariance trick, similarity.py), so per-document
scores are bit-identical at any partitioning and reproducible by a
DuckDB oracle applying the same quantization. The only cross-engine
float risk is ``ln`` itself (both sides evaluate the identical
double expression).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.text import flat_nonempty_with_offsets

DEFAULT_QUERIES = (
    "hash join merge",
    "window sort order",
    "bloom filter scan",
)


def _term_tf_matrix(flat: pa.Array, offs: np.ndarray, terms: list[str]) -> np.ndarray:
    """(rows × terms) term-frequency matrix from the flat token array.

    One vectorized equality scan per term (|terms| is a handful by
    contract); per-row segment sums via cumsum-gather, which is safe
    for empty rows (unlike reduceat).
    """
    import pyarrow.compute as pc

    n_rows = len(offs) - 1
    tf = np.zeros((n_rows, len(terms)), dtype=np.int64)
    for j, term in enumerate(terms):
        m = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        c = np.concatenate([[0], np.cumsum(m.astype(np.int64))])
        tf[:, j] = c[offs[1:]] - c[offs[:-1]]
    return tf


def _corpus_term_stats(ds, terms):
    """ONE corpus stats pass shared by :func:`bm25_search` and
    :func:`tfidf_cosine_search`: (N docs, Σdl, df per query term) as
    tiny int64 partials — TF-IDF's stats are a strict subset of
    BM25's, so the hybrid RRF query computes this once instead of
    paying two identical corpus scans."""
    from ray.data.aggregate import Sum

    def stat_partials(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        tf = _term_tf_matrix(flat, offs, terms)
        row = {
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "sum_dl": pa.array([int(offs[-1])], pa.int64()),
        }
        present = (tf > 0).sum(axis=0).astype(np.int64)
        for i in range(len(terms)):
            row[f"df_{i}"] = pa.array([int(present[i])], pa.int64())
        return pa.table(row)

    aggs = [Sum("n_docs", alias_name="n_docs"), Sum("sum_dl", alias_name="sum_dl")]
    aggs += [Sum(f"df_{i}", alias_name=f"df_{i}") for i in range(len(terms))]
    stats = ds.map_batches(
        stat_partials, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*aggs)
    n_docs = int(stats["n_docs"] or 0)
    sum_dl = int(stats["sum_dl"] or 0)
    df_t = np.array([int(stats[f"df_{i}"] or 0) for i in range(len(terms))],
                    np.int64)
    return n_docs, sum_dl, df_t


def bm25_search(
    sf_dir: str,
    queries: Sequence[str] = DEFAULT_QUERIES,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
    _stats: "tuple | None" = None,
) -> pd.DataFrame:
    """BM25 top-k documents per query → (query, doc_id, score).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) (the Lucene/Okapi
    non-negative variant); N counts ALL documents, dl counts a
    document's non-empty tokens. Documents scoring 0 (no query term
    present) are excluded. Ties break by doc_id ascending; score is
    the exact int64 1e-9-unit sum divided once at the end.
    """
    from .relational import read

    q_terms = [q.split() for q in queries]
    terms = sorted({t for qt in q_terms for t in qt})
    t_idx = {t: i for i, t in enumerate(terms)}
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    # ---- pass A: global stats (shared kernel; precomputed by RRF)
    n_docs, sum_dl, df_t = (_stats if _stats is not None
                            else _corpus_term_stats(ds, terms))
    # sum_dl == 0 (every document empty) would make avgdl 0 and the
    # scoring denominator 0/0-NaN; no document can match anyway
    if n_docs == 0 or sum_dl == 0:
        return pd.DataFrame(
            {"query": pd.Series(dtype=object), "doc_id": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64)}
        )
    avgdl = sum_dl / n_docs
    # identical double expression on both sides: ln(1 + (N-df+0.5)/(df+0.5))
    idf = np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))

    # ---- pass B: map-only scoring + per-block per-query local top-k
    k1_, b_, tk = float(k1), float(b), int(topk)
    q_cols = [np.array([t_idx[t] for t in qt], np.int64) for qt in q_terms]

    def score_block(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        tf = _term_tf_matrix(flat, offs, terms).astype(np.float64)
        dl = (offs[1:] - offs[:-1]).astype(np.float64)
        # denominator shape (rows, terms); expression order mirrors the
        # SQL oracle exactly: tf*(k1+1) / (tf + k1*(1 - b + (b*dl)/avgdl))
        denom_row = k1_ * (1.0 - b_ + (b_ * dl) / avgdl)
        u = (1e9 * idf)[None, :] * (tf * (k1_ + 1.0)) / (tf + denom_row[:, None])
        s_u9 = np.trunc(u + 0.5).astype(np.int64)  # half-away; u >= 0
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_s = [], [], []
        for qi, cols in enumerate(q_cols):
            s = s_u9[:, cols].sum(axis=1)
            pos = np.flatnonzero(s > 0)
            if len(pos) > tk:  # local top-k: keep only possible winners
                order = np.lexsort((doc_id[pos], -s[pos]))
                keep = pos[order[:tk]]
            else:
                keep = pos
            out_q.append(np.full(len(keep), qi, np.int64))
            out_d.append(doc_id[keep])
            out_s.append(s[keep])
        return pa.table(
            {"qi": pa.array(np.concatenate(out_q) if out_q else np.array([], np.int64)),
             "doc_id": pa.array(np.concatenate(out_d) if out_d else np.array([], np.int64)),
             "s_u9": pa.array(np.concatenate(out_s) if out_s else np.array([], np.int64))}
        )

    cands = pd.DataFrame(
        ds.map_batches(score_block, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    if cands.empty:
        return pd.DataFrame(
            {"query": pd.Series(dtype=object), "doc_id": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64)}
        )
    cands["query"] = [queries[i] for i in cands["qi"]]
    cands = cands.sort_values(
        ["query", "s_u9", "doc_id"], ascending=[True, False, True]
    )
    cands = cands.groupby("query", sort=True).head(tk)
    out = pd.DataFrame(
        {
            "query": cands["query"],
            "doc_id": cands["doc_id"].astype(np.int64),
            "score": cands["s_u9"] / 1e9,
        }
    )
    return out.reset_index(drop=True)


def tfidf_cosine_search(
    sf_dir: str,
    queries: Sequence[str] = DEFAULT_QUERIES,
    *,
    topk: int = 10,
    _stats: "tuple | None" = None,
) -> pd.DataFrame:
    """Query-projected TF-IDF cosine top-k per query →
    (query, doc_id, score).

    idf(t) = ln(N / df); terms absent from the corpus (df = 0) are
    excluded from BOTH the document and the query vector. Vectors are
    projected onto the query's term set (the classic cheap cosine for
    small fixed query sets — the full-corpus-norm cosine would need a
    token-keyed shuffle; this one is two streaming passes like BM25).
    Each per-term product is quantized to int64 1e-9 units half-away
    BEFORE the order-free integer sum, so per-document scores are
    bit-identical at any partitioning; the cosine is then evaluated
    once per (query, doc) as num / (sqrt(dd) * sqrt(qq)) — the exact
    double expression the DuckDB oracle mirrors. Docs with num 0 are
    excluded; ties break by doc_id ascending.
    """
    from .relational import read

    q_terms = [q.split() for q in queries]
    terms = sorted({t for qt in q_terms for t in qt})
    t_idx = {t: i for i, t in enumerate(terms)}
    ds = read(sf_dir, "documents", columns=["doc_id", "text"])

    # stats pass: shared kernel (precomputed by the RRF composition —
    # TF-IDF needs only (N, df), a subset of the shared output)
    n_docs, _sum_dl, df_t = (_stats if _stats is not None
                             else _corpus_term_stats(ds, terms))
    empty = pd.DataFrame(
        {"query": pd.Series(dtype=object), "doc_id": pd.Series(dtype=np.int64),
         "score": pd.Series(dtype=np.float64)}
    )
    if n_docs == 0:
        return empty
    live = df_t > 0
    idf = np.zeros(len(terms), dtype=np.float64)
    idf[live] = np.log(n_docs / df_t[live].astype(np.float64))

    # per-query unique projected columns + query term frequencies,
    # restricted to df>0 terms; qq = Σ trunc(1e9*(qtf*idf)^2 + 0.5)
    q_cols, q_qtf, q_qq = [], [], []
    for qt in q_terms:
        uq, cnt = np.unique(qt, return_counts=True)
        cols = np.array([t_idx[t] for t in uq], np.int64)
        keep = live[cols]
        cols, cnt = cols[keep], cnt[keep]
        q_cols.append(cols)
        q_qtf.append(cnt.astype(np.float64))
        qv = cnt.astype(np.float64) * idf[cols]
        q_qq.append(int(np.trunc(1e9 * qv * qv + 0.5).astype(np.int64).sum()))

    tk = int(topk)

    def score_block(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        tf = _term_tf_matrix(flat, offs, terms).astype(np.float64)
        w = tf * idf[None, :]
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_s = [], [], []
        for qi, cols in enumerate(q_cols):
            if len(cols) == 0 or q_qq[qi] == 0:
                continue
            wq = w[:, cols]
            num = np.trunc(
                1e9 * wq * (q_qtf[qi] * idf[cols])[None, :] + 0.5
            ).astype(np.int64).sum(axis=1)
            dd = np.trunc(1e9 * wq * wq + 0.5).astype(np.int64).sum(axis=1)
            # num and dd quantize independently, so num > 0 with
            # dd == 0 is reachable (tiny idf: w*q_w rounds to 1 while
            # w*w rounds to 0); without the dd guard the cosine is
            # inf, trunc -> INT64_MIN, and -s overflows the top-k
            # lexsort, ranking the garbage doc FIRST
            pos = np.flatnonzero((num > 0) & (dd > 0))
            cos = num[pos] / (np.sqrt(dd[pos].astype(np.float64))
                              * np.sqrt(float(q_qq[qi])))
            s = np.trunc(1e9 * cos + 0.5).astype(np.int64)
            if len(pos) > tk:
                order = np.lexsort((doc_id[pos], -s))
                sel = order[:tk]
                pos, s = pos[sel], s[sel]
            out_q.append(np.full(len(pos), qi, np.int64))
            out_d.append(doc_id[pos])
            out_s.append(s)
        if not out_q:
            return pa.table({"qi": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "s_u9": pa.array([], pa.int64())})
        return pa.table(
            {"qi": pa.array(np.concatenate(out_q)),
             "doc_id": pa.array(np.concatenate(out_d)),
             "s_u9": pa.array(np.concatenate(out_s))}
        )

    cands = pd.DataFrame(
        ds.map_batches(score_block, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    if cands.empty:
        return empty
    cands["query"] = [queries[i] for i in cands["qi"]]
    cands = cands.sort_values(
        ["query", "s_u9", "doc_id"], ascending=[True, False, True]
    )
    cands = cands.groupby("query", sort=True).head(tk)
    return pd.DataFrame(
        {"query": cands["query"], "doc_id": cands["doc_id"].astype(np.int64),
         "score": cands["s_u9"] / 1e9}
    ).reset_index(drop=True)


def rrf_hybrid_search(
    sf_dir: str,
    queries: Sequence[str] = DEFAULT_QUERIES,
    *,
    k_sys: int = 20,
    rrf_k: int = 60,
    topk: int = 10,
) -> pd.DataFrame:
    """Hybrid search via reciprocal rank fusion (Cormack-Clarke-
    Buettcher, SIGIR'09): fuse the BM25 and TF-IDF-cosine top-``k_sys``
    lists per query with  rrf(d) = Σ_sys 1/(rrf_k + rank_sys(d))  →
    per-query top-``topk`` {query, doc_id, rrf, rank_bm25, rank_tfidf}
    (absent-from-a-list docs contribute 0 for that system; rank 0 in
    the output marks absence).

    Scale shape: both underlying searches are the two-streaming-pass
    map-only scorers (corpus text never moves); fusion touches only
    the O(queries × k_sys) candidate lists — driver-side by design.
    Determinism: ranks are integer positions in (s_u9 DESC, doc_id)
    order; the fused score is the two-term float sum bm + tf evaluated
    in that fixed order, quantized to 1e-9 — bitwise reproducible by
    the DuckDB oracle applying the identical expression.
    """
    def ranked(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query", "score", "doc_id"],
                            ascending=[True, False, True]).copy()
        df["r"] = df.groupby("query", sort=False).cumcount() + 1
        return df[df["r"] <= int(k_sys)][["query", "doc_id", "r"]]

    # ONE shared stats pass feeds both scorers (3 corpus scans, not 4)
    from .relational import read

    terms = sorted({t for q in queries for t in q.split()})
    stats = _corpus_term_stats(
        read(sf_dir, "documents", columns=["doc_id", "text"]), terms)
    bm = ranked(bm25_search(sf_dir, queries, topk=int(k_sys), _stats=stats))
    tf = ranked(tfidf_cosine_search(sf_dir, queries, topk=int(k_sys),
                                    _stats=stats))
    fused = bm.merge(tf, on=["query", "doc_id"], how="outer",
                     suffixes=("_bm", "_tf"))
    rb = fused["r_bm"].fillna(0).to_numpy(np.int64)
    rt = fused["r_tf"].fillna(0).to_numpy(np.int64)
    kk = float(rrf_k)
    rrf = (np.where(rb > 0, 1.0 / (kk + rb), 0.0)
           + np.where(rt > 0, 1.0 / (kk + rt), 0.0))
    fused["rrf"] = np.trunc(rrf * 1e9 + 0.5).astype(np.int64) / 1e9
    fused["rank_bm25"] = rb
    fused["rank_tfidf"] = rt
    fused = fused.sort_values(["query", "rrf", "doc_id"],
                              ascending=[True, False, True])
    fused = fused.groupby("query", sort=True).head(int(topk))
    return fused[["query", "doc_id", "rrf", "rank_bm25", "rank_tfidf"]].astype(
        {"doc_id": np.int64}
    ).reset_index(drop=True)
