"""Text quality / language-ID / fingerprint stages (training-data ops).

- :func:`make_quality_fn` — per-document quality features, fully
  vectorized (pyarrow.compute + reduceat); float outputs are single
  divisions rounded to 6 dp so the DuckDB oracle matches bit-for-bit.
- :class:`LangId` — character-bigram-profile language classifier as an
  actor-pool stage: the per-language profile matrix is fit once from a
  small labeled sample (broadcast via ``ray.put``), each batch is one
  sparse-count matmul. A heuristic — accuracy is asserted on separable
  synthetic fixtures in tests, not on the (label-independent) testdata.
- :func:`make_fingerprint_fn` — winnowing document fingerprints
  (Schleimer et al. 2003): min rolling-gram hash per sliding window,
  deduplicated; robust to local edits, used for copy detection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import UINT64, hash_strings, splitmix64
from .text import split_tokens

STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def _row_layout(batch: pa.Table, col: str = "text"):
    """tokenized batch → (flat nonempty tokens, row offsets into them).

    Thin alias of the shared chunk-offset-safe kernel (one copy rule)."""
    from .text import flat_nonempty_with_offsets

    return flat_nonempty_with_offsets(batch, col)


def make_quality_fn(col: str = "text", id_col: str = "doc_id", round_dp: int | None = 6):
    """batch → {doc_id, n_tok, avg_tok_len, ttr, stop_ratio}.

    ttr = type-token ratio (distinct/total); all ratios are one double
    division, rounded to ``round_dp`` dp (DuckDB-oracle parity for the
    per-doc display query). Pass ``round_dp=None`` for raw ratios —
    consumers that GATE or AVERAGE on a ratio must use the unrounded
    value (a doc within ~5e-7 of a threshold would otherwise diverge
    from an oracle that gates unrounded). Rows with zero tokens are
    dropped (same ``WHERE len(w) > 0`` on the SQL side).
    """

    def _r(x: np.ndarray) -> np.ndarray:
        # half-up (ratios are >= 0), matching DuckDB ROUND: these are
        # small-denominator rationals (k/n_tok), so exact .5 decimal
        # boundaries DO occur (e.g. odd k, n_tok = 128 terminates at
        # digit 7) — np.round's half-even would diverge from the oracle
        if round_dp is None:
            return x
        q = 10.0 ** round_dp
        return np.trunc(x * q + 0.5) / q

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = _row_layout(batch, col)
        counts = np.diff(offs)
        nz = counts > 0
        starts = offs[:-1][nz]
        tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        sum_len = np.add.reduceat(tok_len, starts) if len(flat) else np.empty(0, np.int64)
        # distinct tokens per row via (row, hash) pair dedup
        row_of = np.repeat(np.arange(len(counts)), counts)
        h = hash_strings(flat)
        pair = np.stack([row_of, h.astype(np.int64)], axis=1)
        uniq_rows = np.unique(pair, axis=0)[:, 0] if len(flat) else np.empty(0, np.int64)
        n_distinct = np.bincount(uniq_rows.astype(np.int64), minlength=len(counts))[nz]
        stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n_stop = np.add.reduceat(stop, starts) if len(flat) else np.empty(0, np.int64)
        n = counts[nz].astype(np.float64)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids = ids.filter(pa.array(nz))
        return pa.table(
            {
                "doc_id": ids,
                "n_tok": pa.array(counts[nz].astype(np.int32)),
                "avg_tok_len": pa.array(_r(sum_len / n)),
                "ttr": pa.array(_r(n_distinct / n)),
                "stop_ratio": pa.array(_r(n_stop / n)),
            }
        )

    return fn


# ------------------------------------------------------------------ lang id
_NBUCKETS = 1 << 12


def _char_bigram_counts(texts: pa.Array) -> "tuple[np.ndarray, np.ndarray]":
    """Hashed char-bigram counts per row → (rows × _NBUCKETS sparse-ish
    dense matrix, utf-8 byte row lengths). Reads the Arrow string
    buffers zero-copy via the shared ``_flat_utf8`` kernel — no
    ``to_pandas`` / Python-string round-trip in the stage."""
    import pyarrow.compute as pc

    from ..pipelines.lm import _flat_utf8

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if texts.null_count:
        texts = pc.fill_null(texts, "")  # nulls count as empty rows
    data, offs = _flat_utf8(texts)
    lengths = np.diff(offs)
    n = len(offs) - 1
    flat = data[offs[0] : offs[-1]]
    if flat.size < 2:
        return np.zeros((n, _NBUCKETS), dtype=np.float64), lengths
    big = flat[:-1].astype(np.uint64) << UINT64(8) | flat[1:].astype(np.uint64)
    bucket = (splitmix64(big) % UINT64(_NBUCKETS)).astype(np.int64)
    # row of each bigram start; bigrams spanning a row boundary dropped
    pos = np.arange(flat.size - 1, dtype=np.int64) + offs[0]
    row = np.searchsorted(offs, pos, side="right") - 1
    valid = pos + 1 < offs[row + 1]
    # one bincount over flat (row, bucket) keys — much faster than a
    # scattered np.add.at into the dense matrix
    flat_keys = row[valid] * _NBUCKETS + bucket[valid]
    mat = np.bincount(flat_keys, minlength=n * _NBUCKETS).reshape(n, _NBUCKETS)
    return mat.astype(np.float64), lengths


def fit_langid_profiles(sample_texts, sample_langs) -> tuple[np.ndarray, list]:
    """Per-language L2-normalized char-bigram profile matrix."""
    mat, _ = _char_bigram_counts(pa.array(list(sample_texts), pa.string()))
    langs = sorted(set(sample_langs))
    P = np.zeros((len(langs), _NBUCKETS))
    la = np.asarray(list(sample_langs))
    for i, lang in enumerate(langs):
        P[i] = mat[la == lang].sum(axis=0)
    P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    return P, langs


class LangId:
    """Actor-pool classifier: profiles fetched once per actor."""

    def __init__(self, profiles_ref, col: str = "text", id_col: str = "doc_id"):
        import ray

        self.P, self.langs = (
            ray.get(profiles_ref) if not isinstance(profiles_ref, tuple) else profiles_ref
        )
        self.col, self.id_col = col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat, _ = _char_bigram_counts(batch.column(self.col))
        norm = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sim = (mat / norm) @ self.P.T
        pred = np.asarray(self.langs)[sim.argmax(axis=1)]
        ids = batch.column(self.id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                "doc_id": ids,
                "lang_pred": pa.array(pred, pa.string()),
                "lang_score": pa.array(np.round(sim.max(axis=1), 6)),
            }
        )


def lang_id_pipeline(ds, sample_texts, sample_langs, concurrency: int = 2):
    """documents → {doc_id, lang_pred, lang_score} via broadcast profiles."""
    import ray

    ref = ray.put(fit_langid_profiles(sample_texts, sample_langs))
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs=dict(profiles_ref=ref),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


# -------------------------------------------------------------- fingerprint
def make_fingerprint_fn(
    k: int = 4, window: int = 5, col: str = "text", id_col: str = "doc_id"
):
    """batch → {doc_id, fp: list<uint64>, fp_min: uint64}.

    Winnowing: hash word k-grams, slide a ``window``-wide window over
    the gram-hash stream keeping each window's min, deduplicated per
    doc. Guarantees any shared run of ``window + k - 1`` tokens
    between two docs shares a fingerprint.

    Fully vectorized across the batch: ONE ``sliding_window_view``
    min over the flat gram stream with row-boundary masking (a window
    is valid iff its first and last gram share a row), short rows
    (< window grams) folded in via a per-row ``minimum.reduceat`` —
    no per-row Python loop (the batch analog of the per-doc loop this
    replaced; same outputs, asserted in tests).
    """
    from numpy.lib.stride_tricks import sliding_window_view

    from ..functions.hashing import kgram_hashes_flat

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = _row_layout(batch, col)
        wh = hash_strings(flat)
        gh, row_idx, _ = kgram_hashes_flat(wh, offs, k)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n_rows = batch.num_rows
        # per-row gram counts / starts (row_idx is sorted)
        cnt = np.bincount(row_idx, minlength=n_rows).astype(np.int64) if len(gh) else np.zeros(n_rows, np.int64)
        row_start = np.concatenate([[0], np.cumsum(cnt)])[:-1]
        pick_rows, pick_vals = [], []
        # rows with 1..window grams contribute their single global min;
        # reduceat runs over ALL nonzero rows (its segments span start
        # to next-listed start, so listing only the short rows would
        # bleed across row boundaries), then short rows are selected
        nz = cnt > 0
        short = (cnt > 0) & (cnt <= window)
        if short.any():
            row_mins = np.minimum.reduceat(gh, row_start[nz])
            pick_rows.append(np.flatnonzero(short))
            pick_vals.append(row_mins[short[nz]])
        # rows with > window grams: stream-wide window mins, masked to
        # windows that sit entirely inside one row
        if len(gh) >= window:
            mins = sliding_window_view(gh, window).min(axis=1)
            valid = row_idx[: len(mins)] == row_idx[window - 1 :]
            long_row = cnt[row_idx[: len(mins)]] > window
            m = valid & long_row
            pick_rows.append(row_idx[: len(mins)][m])
            pick_vals.append(mins[m])
        if pick_rows:
            rows = np.concatenate(pick_rows)
            vals = np.concatenate(pick_vals).astype(UINT64)
            order = np.lexsort((vals, rows))
            rows, vals = rows[order], vals[order]
            keep = np.ones(len(rows), dtype=bool)  # dedupe (row, val)
            keep[1:] = (rows[1:] != rows[:-1]) | (vals[1:] != vals[:-1])
            rows, vals = rows[keep], vals[keep]
        else:
            rows = np.empty(0, dtype=np.int64)
            vals = np.empty(0, dtype=UINT64)
        per_row = np.bincount(rows, minlength=n_rows)
        offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(per_row, out=offsets[1:])
        # values are row-major and ascending per row → min is first
        fp_min = np.zeros(n_rows, dtype=UINT64)
        has = per_row > 0
        fp_min[has] = vals[offsets[:-1][has]]
        return pa.table(
            {
                "doc_id": ids,
                "fp": pa.ListArray.from_arrays(pa.array(offsets), pa.array(vals)),
                "fp_min": pa.array(fp_min),
            }
        )

    return fn
