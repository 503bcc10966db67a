"""Persisted term-partitioned inverted index + partition-pruned BM25
lookup — the serving complement of :func:`retrieval.bm25_search`.

``bm25_search`` scans the corpus once per query batch (right when the
queries are known up front); the inverted index is the other
production shape: build ONCE over the 100-TB corpus, then answer
ad-hoc queries touching ONLY the partitions the query terms hash to —
the same partition-pruned-probe discipline as the Bloom-sidecar store
(`table_store.bloom_pruned_lookup`) and the MinHash store
(`dedup.minhash_increment`). Reference analog: the probe loads only
its partition's filter (src/main.cpp:120), applied to postings.

Layout::

    {store}/terms/tp={p}/part.parquet   rows {term, doc_id, tf, dl}
    {store}/manifest.json               committed LAST (tmp + atomic
                                        replace) — a crashed build
                                        leaves no readable store

Postings are denormalized with the document length (``dl``) — the
standard search-index trade: +8 bytes/posting buys lookups that never
join a doc-length table, so a query touches |q| partitions, full stop.
All global stats BM25 needs (N, Σdl) live in the manifest; per-term
``df`` is exact from the term's own partition (every posting of a term
lands in one partition by construction).

Scoring is bit-identical to ``bm25_search``: same idf/tf expression
shapes, per-posting contributions quantized to 1e-9 int64 half-away,
exact integer sums — so the SAME DuckDB oracle template checks both.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings
from ..stages.text import flat_nonempty_with_offsets

if TYPE_CHECKING:
    from ray.data import Dataset


def _manifest_path(store_path: str) -> str:
    return os.path.join(store_path, "manifest.json")


def build_inverted_index(
    docs: "Dataset",
    store_path: str,
    *,
    num_partitions: int = 32,
) -> dict:
    """One streaming pass: corpus → persisted term-partitioned postings.

    Per-batch kernel emits complete (term, doc_id, tf, dl) rows (a
    document is one row, so its term frequencies never split across
    batches); postings shuffle ONCE on ``hash(term) % P`` — the only
    wide step, O(distinct (doc, term)) skinny rows, text never moves.
    Corpus stats (N docs, Σdl) fold as per-batch partials into the
    manifest, which commits LAST (tmp + atomic replace).
    """
    P = int(num_partitions)
    if os.path.exists(store_path):
        shutil.rmtree(store_path)
    terms_dir = os.path.join(store_path, "terms")
    os.makedirs(terms_dir, exist_ok=True)

    def postings(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        dl = (offs[1:] - offs[:-1]).astype(np.int64)
        did = np.repeat(doc_id, dl)
        t = pa.table({"term": flat, "doc_id": pa.array(did)})
        tf = t.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        # dl rides each posting (denormalized); map doc_id -> dl via
        # positional searchsorted on the batch's (sorted-unique) ids
        ids = tf.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(doc_id, kind="stable")
        pos = order[np.searchsorted(doc_id[order], ids)]
        h = hash_strings(tf.column("term"))
        return pa.table(
            {
                "term": tf.column("term"),
                "doc_id": tf.column("doc_id"),
                "tf": tf.column("count_all").cast(pa.int64()),
                "dl": pa.array(dl[pos]),
                "tp": pa.array((h % np.uint64(P)).astype(np.int32)),
            }
        )

    def stat_partials(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        return pa.table(
            {"n_docs": pa.array([batch.num_rows], pa.int64()),
             "sum_dl": pa.array([int(offs[-1])], pa.int64())}
        )

    from ray.data.aggregate import Sum

    stats = docs.map_batches(
        stat_partials, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_dl", alias_name="sum_dl"))
    n_docs = int(stats["n_docs"] or 0)
    sum_dl = int(stats["sum_dl"] or 0)

    def write_partition(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        tp = int(g.column("tp")[0].as_py())
        d = os.path.join(terms_dir, f"tp={tp}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part.parquet")
        tmp = path + ".tmp"
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        tm = g.column("term").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, tm))
        pq.write_table(g.drop_columns(["tp"]).take(pa.array(order)), tmp)
        os.replace(tmp, path)
        return pa.table({"tp": pa.array([tp], pa.int32()),
                         "n_rows": pa.array([g.num_rows], pa.int64())})

    parts = (
        docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(write_partition, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = {
        "algo": "inverted_index",
        "num_partitions": P,
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "n_postings": int(parts["n_rows"].sum()) if len(parts) else 0,
        "partitions": sorted(int(x) for x in parts["tp"]) if len(parts) else [],
    }
    tmp = _manifest_path(store_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(store_path))
    return manifest


def inverted_lookup(
    store_path: str,
    queries: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 10,
) -> pd.DataFrame:
    """BM25 top-k per query against a persisted index, reading ONLY the
    partitions the query terms hash to → (query, doc_id, score).

    At P=32 a 3-term query touches ≤ 3/32 of the postings bytes no
    matter how big the corpus is; the parquet row filter on ``term``
    prunes within each touched partition (postings are term-sorted →
    row-group pruning). df per term is exact from the read rows (a
    term's postings are all in its partition); N/Σdl come from the
    manifest. Scoring, quantization, tie-breaks are bit-identical to
    :func:`retrieval.bm25_search` (pytest-pinned), docs scoring 0
    excluded.
    """
    import ray.data

    with open(_manifest_path(store_path)) as f:
        man = json.load(f)
    if man.get("algo") != "inverted_index":
        raise ValueError(f"not an inverted index store: {store_path}")
    P = int(man["num_partitions"])
    n_docs, sum_dl = int(man["n_docs"]), int(man["sum_dl"])

    q_terms = [q.split() for q in queries]
    terms = sorted({t for qt in q_terms for t in qt})
    empty = pd.DataFrame(
        {"query": pd.Series(dtype=object), "doc_id": pd.Series(dtype=np.int64),
         "score": pd.Series(dtype=np.float64)}
    )
    if not terms or n_docs == 0 or sum_dl == 0:
        return empty
    avgdl = sum_dl / n_docs

    tps = sorted({int(h % np.uint64(P)) for h in hash_strings(terms)})
    paths = [
        p for tp in tps
        if os.path.exists(p := os.path.join(store_path, "terms", f"tp={tp}", "part.parquet"))
    ]
    if not paths:
        return empty

    import pyarrow.dataset as pads

    rows = ray.data.read_parquet(
        paths,
        columns=["term", "doc_id", "tf", "dl"],
        filter=pads.field("term").isin(terms),
    )

    # df per term: skinny grouped count over the pruned read
    from .agg import grouped_agg

    dfs = grouped_agg(rows, ["term"], {"df": ("count", None)}).to_pandas()
    # all-empty Datasets lose their schema through to_pandas (known
    # Ray footgun) — an all-absent term set must still return typed empty
    if dfs.empty or "term" not in dfs.columns:
        return empty
    df_map = dict(zip(dfs["term"], dfs["df"].astype(np.int64)))
    t_idx = {t: i for i, t in enumerate(terms)}
    df_t = np.array([df_map.get(t, 0) for t in terms], np.int64)
    idf = np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))

    # broadcast-size query metadata rides the task closure: per posting
    # compute the quantized contribution for every query containing the
    # term (a term may appear in several queries)
    term_qis: dict[str, list[int]] = {}
    for qi, qt in enumerate(q_terms):
        for t in qt:  # multiplicity kept: a term repeated in a query
            term_qis.setdefault(t, []).append(qi)  # contributes per copy
    k1_, b_ = float(k1), float(b)

    def contrib(t: pa.Table) -> pa.Table:
        tm = t.column("term").to_numpy(zero_copy_only=False)
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        ti = np.array([t_idx[x] for x in tm], np.int64)
        denom_row = k1_ * (1.0 - b_ + (b_ * dl) / avgdl)
        u = (1e9 * idf)[ti] * (tf * (k1_ + 1.0)) / (tf + denom_row)
        s_u9 = np.trunc(u + 0.5).astype(np.int64)  # half-away; u >= 0
        reps = np.array([len(term_qis[x]) for x in tm], np.int64)
        qi = np.concatenate([term_qis[x] for x in tm]) if len(tm) else np.array([], np.int64)
        return pa.table(
            {"qi": pa.array(qi.astype(np.int64)),
             "doc_id": pa.array(np.repeat(did, reps)),
             "s_u9": pa.array(np.repeat(s_u9, reps))}
        )

    scored = grouped_agg(
        rows.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True),
        ["qi", "doc_id"],
        {"s_u9": ("sum", "s_u9")},
    ).to_pandas()
    if scored.empty or "s_u9" not in scored.columns:
        return empty
    scored = scored[scored["s_u9"] > 0]
    if scored.empty:
        return empty
    scored["query"] = [queries[i] for i in scored["qi"]]
    scored = scored.sort_values(
        ["query", "s_u9", "doc_id"], ascending=[True, False, True]
    )
    scored = scored.groupby("query", sort=True).head(int(topk))
    out = pd.DataFrame(
        {"query": scored["query"],
         "doc_id": scored["doc_id"].astype(np.int64),
         "score": scored["s_u9"].astype(np.int64) / 1e9}
    )
    return out.reset_index(drop=True)
