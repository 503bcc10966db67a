"""Byte-bigram language-model perplexity scoring — the CCNet/C4-style
"LM quality filter" stage of a training-data pipeline: train a tiny
n-gram model ON the corpus, then score every document's perplexity
under it; downstream curation drops the high-perplexity tail.

Two streaming passes, the broadcast-small-side pattern throughout:

  1. TRAIN — per-batch byte-bigram histograms (one ``np.bincount``
     over the batch's concatenated utf8 buffer; sparse {code, cnt}
     rows out) → fixed-partition ``grouped_agg`` sum → the driver
     folds ≤ 65536 rows into the add-one-smoothed log-probability
     table (512 KB of float64).
  2. SCORE — the table broadcasts once (``ray.put``); a map-only pass
     computes each document's mean negative log-likelihood with one
     table lookup + ``reduceat`` per batch. No shuffle; output
     streams.

The model is explicitly a BYTE bigram model (utf8 buffer, not code
points) — on the ASCII fixtures this equals a char bigram model,
which is what the DuckDB oracle (substr-based) computes.

Reference analog: build-then-probe over the same corpus
(`src/main.cpp` phase 1/2) — train IS the build of a small state, and
scoring IS the probe, broadcast instead of sharded because the state
is 512 KB, not gigabytes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:
    from ray.data import Dataset


def _flat_utf8(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column → (flat uint8 bytes, int64 row offsets into
    it, both offset/slice-correct). Zero-copy views of Arrow buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        odt, osz = np.int64, 8
    else:
        odt, osz = np.int32, 4
    bufs = col.buffers()
    offs = np.frombuffer(
        bufs[1], dtype=odt, count=len(col) + 1, offset=col.offset * osz
    ).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offs


def _bigram_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """(codes, row_lens_in_bigrams): codes = 256*b1 + b2 of every
    within-row consecutive byte pair, concatenated row-major."""
    data, offs = _flat_utf8(col)
    if len(offs) < 2 or offs[-1] - offs[0] < 2:
        return np.empty(0, np.int64), np.maximum(np.diff(offs) - 1, 0)
    lo, hi = offs[0], offs[-1]
    d = data[lo:hi].astype(np.int64)
    pair = d[:-1] * 256 + d[1:]  # includes cross-row junk pairs
    # drop position j when j+1 starts a new row (j == row_end - 1)
    keep = np.ones(len(pair), dtype=bool)
    ends = offs[1:-1] - lo - 1  # last byte index of each non-final row
    # bound both sides: an empty FIRST row gives -1, and a trailing
    # empty row puts a boundary at len(pair) (no pair starts there)
    keep[ends[(ends >= 0) & (ends < len(pair))]] = False
    m = np.maximum(np.diff(offs) - 1, 0)  # bigrams per row
    return pair[keep], m


def train_bigram_lm(docs: "Dataset", *, num_partitions: int = 16) -> dict:
    """Corpus-wide bigram counts → smoothed model dict:
    {"logp": float64[65536], "V": int, "n_bigrams": int}.

    ``p(b2|b1) = (C[b1b2] + 1) / (C1[b1] + V)`` with V = number of
    distinct BYTES occurring anywhere in the corpus (add-one
    smoothing over the observed alphabet).
    """
    from .agg import grouped_agg

    def hist(t: pa.Table) -> pa.Table:
        codes, _ = _bigram_codes(t.column("text"))
        data, offs = _flat_utf8(t.column("text"))
        cnt2 = np.bincount(codes, minlength=1)
        nz = np.flatnonzero(cnt2)
        uni = np.bincount(data[offs[0]:offs[-1]], minlength=256)
        unz = np.flatnonzero(uni)
        return pa.table(
            {
                # unigram rows ride along with negative codes: -1-byte
                "code": pa.array(
                    np.concatenate([nz.astype(np.int64), -1 - unz.astype(np.int64)])
                ),
                "cnt": pa.array(
                    np.concatenate([cnt2[nz].astype(np.int64), uni[unz].astype(np.int64)])
                ),
            }
        )

    counts = (
        grouped_agg(
            docs.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
            "code",
            {"cnt": ("sum", "cnt")},
            num_partitions=num_partitions,
        )
        .to_pandas()
    )
    code = counts["code"].to_numpy()
    cnt = counts["cnt"].to_numpy()
    bi = code >= 0
    C2 = np.zeros(65536, dtype=np.int64)
    C2[code[bi]] = cnt[bi]
    V = int((~bi).sum())  # distinct bytes observed
    C1 = C2.reshape(256, 256).sum(axis=1)  # bigram starts per byte
    logp = np.log(C2 + 1.0) - np.repeat(np.log(C1 + float(V)), 256)
    return {"logp": logp, "V": V, "n_bigrams": int(C2.sum())}


def lm_perplexity(docs: "Dataset", model: dict | None = None) -> "Dataset":
    """Score documents under the (self- or externally-) trained bigram
    model → {doc_id, n_bigrams, ppl} with ppl = exp(mean NLL).
    Documents with no bigram (len < 2) are excluded (their NLL is
    undefined — same rows a SQL join over bigrams drops).
    """
    import ray

    if model is None:
        model = train_bigram_lm(docs)
    logp_ref = ray.put(model["logp"])

    def score(t: pa.Table) -> pa.Table:
        logp = ray.get(logp_ref)
        codes, m = _bigram_codes(t.column("text"))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(m)[:-1]])
        has = m > 0
        s = np.add.reduceat(logp[codes], starts[has]) if has.any() else np.empty(0)
        ppl = np.exp(-s / m[has])
        return pa.table(
            {"doc_id": pa.array(ids[has]),
             "n_bigrams": pa.array(m[has].astype(np.int64)),
             "ppl": pa.array(ppl)}
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
