"""Distributed quality-classifier training (logistic regression).

The fastText-style "quality classifier" stage of an LLM data pipeline
(label a slice of the corpus as in-domain, train a linear model on
cheap per-document features, score everything) expressed Ray-Data
first: features are the vectorized `doc_quality` statistics, training
is full-batch gradient descent with the iterate-broadcast shape of
`kmeans_lloyd` (the driver holds O(d) weights; each iteration is one
map over the feature Dataset plus an exact integer sum).

Determinism at any partitioning: every per-sample gradient is
quantized to int64 fixed-point (scale 2^20) BEFORE summation, so the
cross-block sum is exact integer arithmetic — the same property the
money-column discipline gives tpch_q1 — and the learned weights are
bit-identical however Ray blocks the input (tested against a
single-process numpy reference).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    from ray.data import Dataset

_Q = float(1 << 20)  # fixed-point gradient scale
FEATURES = ("bias", "log_ntok", "avg_tok_len", "ttr", "stop_ratio")


def _doc_features(batch: pa.Table, label_source: str) -> pa.Table:
    """documents -> {x0..x4, y} feature rows (map-only, vectorized)."""
    import pyarrow.compute as pc

    from ..stages.quality import make_quality_fn

    # pre-drop zero-token docs so the quality rows align 1:1 with source
    # (make_quality_fn filters them internally)
    batch = batch.filter(
        pc.not_equal(pc.utf8_trim(batch.column("text"), " "), "")
    )
    q = make_quality_fn(round_dp=None)(batch)
    n_tok = q.column("n_tok").to_numpy(zero_copy_only=False).astype(np.float64)
    src = batch.column("source").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "x1": np.log1p(n_tok),
            "x2": q.column("avg_tok_len").to_numpy(zero_copy_only=False),
            "x3": q.column("ttr").to_numpy(zero_copy_only=False),
            "x4": q.column("stop_ratio").to_numpy(zero_copy_only=False),
            "y": (src == label_source).astype(np.float64),
        }
    )


def _xy(t: pa.Table):
    X = np.column_stack(
        [np.ones(t.num_rows)]
        + [t.column(c).to_numpy(zero_copy_only=False) for c in ("x1", "x2", "x3", "x4")]
    )
    y = t.column("y").to_numpy(zero_copy_only=False)
    return np.nan_to_num(X), y


def _grad_partial(t: pa.Table, w: np.ndarray) -> pa.Table:
    """one int64 row: quantized gradient sums + loss + count."""
    X, y = _xy(t)
    z = X @ w
    p = 1.0 / (1.0 + np.exp(-z))
    # per-sample quantize, THEN sum (exact int64 -> order-independent)
    g = X * (p - y)[:, None]
    gi = np.rint(g * _Q).astype(np.int64).sum(axis=0)
    eps = 1e-12
    loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    li = int(np.rint(loss * _Q).astype(np.int64).sum())
    cols = {f"g{j}": pa.array([int(gi[j])], pa.int64()) for j in range(len(w))}
    cols["loss_q"] = pa.array([li], pa.int64())
    cols["n"] = pa.array([t.num_rows], pa.int64())
    return pa.table(cols)


def train_quality_classifier(
    docs: "Dataset",
    *,
    label_source: str = "src0",
    iters: int = 30,
    lr: float = 0.5,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Train on all documents; returns one row {n, accuracy rounded,
    tp, fp, tn, fn, w_bias..w_stop_ratio rounded, final_loss rounded}."""
    feats = docs.map_batches(
        lambda t: _doc_features(t, label_source),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    d = 5
    w = np.zeros(d, dtype=np.float64)
    n_total = feats.count()
    loss_q = 0
    for _ in range(iters):
        cur = w.copy()
        parts = feats.map_batches(
            lambda t: _grad_partial(t, cur),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()
        gsum = np.array(
            [int(parts[f"g{j}"].sum()) for j in range(d)], dtype=np.float64
        )
        loss_q = int(parts["loss_q"].sum())
        w = w - lr * (gsum / _Q) / max(n_total, 1)

    def confusion(t: pa.Table) -> pa.Table:
        X, y = _xy(t)
        pred = (X @ w) > 0
        yb = y > 0.5
        return pa.table(
            {
                "tp": pa.array([int(np.sum(pred & yb))], pa.int64()),
                "fp": pa.array([int(np.sum(pred & ~yb))], pa.int64()),
                "tn": pa.array([int(np.sum(~pred & ~yb))], pa.int64()),
                "fn": pa.array([int(np.sum(~pred & yb))], pa.int64()),
            }
        )

    cm = feats.map_batches(confusion, batch_format="pyarrow").to_pandas().sum()
    out = {
        "n": np.int64(n_total),
        "tp": np.int64(cm["tp"]),
        "fp": np.int64(cm["fp"]),
        "tn": np.int64(cm["tn"]),
        "fn": np.int64(cm["fn"]),
        "accuracy": round(float(cm["tp"] + cm["tn"]) / max(n_total, 1), round_dp),
        "final_loss": round(loss_q / _Q / max(n_total, 1), round_dp),
    }
    for name, val in zip(FEATURES, w):
        out[f"w_{name}"] = round(float(val), round_dp)
    return pd.DataFrame([out])


def reference_train(
    X: np.ndarray, y: np.ndarray, *, iters: int = 30, lr: float = 0.5
) -> np.ndarray:
    """Single-process reference with the SAME quantization contract
    (used by tests to pin the distributed result)."""
    w = np.zeros(X.shape[1], dtype=np.float64)
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        g = X * (p - y)[:, None]
        gi = np.rint(g * _Q).astype(np.int64).sum(axis=0)
        w = w - lr * (gi.astype(np.float64) / _Q) / max(n, 1)
    return w


# ------------------------------------------------------------------ DSIR
def _md5_bucket(grams, B: int) -> np.ndarray:
    """SQL-reproducible feature bucket: lower 8 md5 digest bytes
    (little-endian, == DuckDB ``md5_number_lower``) mod ``B``.

    Python md5 runs only over the DISTINCT grams of a batch (the
    callers dedupe first), so the per-batch cost is O(distinct
    features), not O(tokens); at web scale swap a vectorized hash in
    via the ``bucket_fn`` parameter of :func:`dsir_scores` (the md5
    choice here buys an exact DuckDB oracle).
    """
    import hashlib

    out = np.empty(len(grams), dtype=np.int64)
    for k, g in enumerate(grams):
        out[k] = int.from_bytes(
            hashlib.md5(g.encode()).digest()[8:16], "little"
        ) % B
    return out


def dsir_scores(
    docs: "Dataset",
    *,
    target_source: str,
    n_buckets: int = 1024,
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
    bucket_fn=None,
    round_dp: int = 6,
) -> "Dataset":
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") over hashed word-BIGRAM
    features: score(d) = Σ_g c_g(d)·[ln p̂_target(b(g)) − ln p̂_raw(b(g))],
    with add-one smoothing over ``n_buckets`` hashed buckets. The
    target distribution is estimated from the docs whose
    ``source_col`` equals ``target_source``; the raw distribution from
    the whole corpus. High scores = most target-like raw docs — the
    standard "select pretraining data that looks like my domain" op.

    Scale shape: pass 1 streams (bucket, cnt_raw, cnt_tgt) partials
    per batch (grams deduped per batch before hashing) into a fixed-B
    grouped fold — the model is B rows of integers, O(n_buckets)
    driver state riding the task closure (never a corpus-sized
    broadcast). Pass 2 is map-only: per-doc gram counts × the λ
    lookup vector, one np.dot per batch. Text never shuffles; both
    passes are single sweeps. Output ``{id_col, dsir_score}``.
    """
    from ..stages.text import flat_nonempty_with_offsets
    from .agg import grouped_agg

    B = int(n_buckets)
    bucket = bucket_fn or _md5_bucket

    def _doc_gram_buckets(batch: pa.Table):
        """per-batch: (doc ordinal row ids, bucket ids, counts)."""
        flat, offs = flat_nonempty_with_offsets(batch, text_col)
        counts = np.diff(offs)
        if len(flat) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        toks = flat.to_numpy(zero_copy_only=False)
        row = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # bigrams: adjacent token pairs within a row
        keep = np.ones(len(toks), dtype=bool)
        last = offs[1:] - 1  # last token of each row starts no bigram
        keep[last[last >= 0]] = False  # (empty leading rows would hit -1)
        lhs = np.flatnonzero(keep)
        if len(lhs) == 0:
            z = np.empty(0, dtype=np.int64)
            return z, z, z
        grams = np.char.add(
            np.char.add(toks[lhs].astype("U"), " "), toks[lhs + 1].astype("U")
        )
        grow = row[lhs]
        ug, inv = np.unique(grams, return_inverse=True)
        ub = bucket(ug, B)
        # fold to (row, bucket) counts
        key = grow * B + ub[inv]
        uk, cnt = np.unique(key, return_counts=True)
        return uk // B, uk % B, cnt.astype(np.int64)

    def hist_partial(batch: pa.Table) -> pa.Table:
        rows, bks, cnt = _doc_gram_buckets(batch)
        if len(bks) == 0:
            return pa.table({"b": pa.array([], pa.int64()),
                             "c_raw": pa.array([], pa.int64()),
                             "c_tgt": pa.array([], pa.int64())})
        src = batch.column(source_col).to_numpy(zero_copy_only=False)
        is_t = (src[rows] == target_source)
        ub, inv = np.unique(bks, return_inverse=True)
        c_raw = np.zeros(len(ub), dtype=np.int64)
        c_tgt = np.zeros(len(ub), dtype=np.int64)
        np.add.at(c_raw, inv, cnt)
        np.add.at(c_tgt, inv, np.where(is_t, cnt, 0))
        return pa.table({"b": pa.array(ub), "c_raw": pa.array(c_raw),
                         "c_tgt": pa.array(c_tgt)})

    hist = grouped_agg(
        docs.map_batches(hist_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        "b", {"c_raw": ("sum", "c_raw"), "c_tgt": ("sum", "c_tgt")},
        num_partitions=8,
    ).to_pandas()

    lam = np.zeros(B, dtype=np.float64)
    c_raw = np.zeros(B, dtype=np.int64)
    c_tgt = np.zeros(B, dtype=np.int64)
    if len(hist):
        c_raw[hist["b"].to_numpy()] = hist["c_raw"].to_numpy()
        c_tgt[hist["b"].to_numpy()] = hist["c_tgt"].to_numpy()
    T_raw, T_tgt = int(c_raw.sum()), int(c_tgt.sum())
    lam = (
        np.log((c_tgt + 1.0) / (T_tgt + B))
        - np.log((c_raw + 1.0) / (T_raw + B))
    )

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        rows, bks, cnt = _doc_gram_buckets(batch)
        s = np.zeros(len(ids), dtype=np.float64)
        if len(bks):
            np.add.at(s, rows, cnt * lam[bks])
        return pa.table({id_col: pa.array(ids),
                         "dsir_score": pa.array(np.round(s, round_dp))})

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
