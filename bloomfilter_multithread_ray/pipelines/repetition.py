"""Repetition-based quality filters and substring-level dedup.

Two corpus-curation operators from the public LLM-data literature,
re-expressed Ray-Data-first over the `documents` table:

- ``gopher_repetition``: the Gopher repetition rules (Rae et al. 2021,
  "Scaling Language Models", Table A1) adapted to a word stream with no
  line structure: per-document top n-gram coverage (fraction of tokens
  covered by the single most frequent n-gram, n=2..4) and duplicate
  n-gram fraction (fraction of n-gram INSTANCES whose gram occurs more
  than once in the document, n=5). Map-only — every document is one
  row, so all statistics are per-batch vectorized numpy with ZERO
  shuffle; at 100 TB this is embarrassingly parallel.

- ``substring_dedup``: cross-document duplicated-window detection in
  the spirit of Lee et al. 2022 ("Deduplicating Training Data Makes
  Language Models Better") ExactSubstr: every length-L token window is
  hashed; a window is a duplicate if it occurs in >= 2 DISTINCT
  documents. Per document: total windows, duplicated windows, duplicate
  fraction. Two fixed-P shuffles (gram-keyed, then doc-keyed); the text
  itself never moves — only (doc_id, gram-hash, count) partials, which
  the per-batch combiner collapses to one row per distinct gram per
  document (documents are whole rows, so per-doc counts are exact at
  the map side).

Reference analog: the same window-hash machinery as the Bloom build
(`src/SkmerExtractor.cpp:76-159` windows; here `kgram_hashes_flat`),
pointed at curation instead of membership.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings, kgram_hashes_flat, partition_of

if TYPE_CHECKING:
    from ray.data import Dataset


def _word_hash_rows(batch: pa.Table, col: str = "text"):
    """batch -> (flat word hashes, row offsets) with empties dropped
    (shared chunk-offset-safe kernel: stages.text.flat_nonempty_with_offsets)."""
    from ..stages.text import flat_nonempty_with_offsets

    flat, offs = flat_nonempty_with_offsets(batch, col)
    return hash_strings(flat), offs


def _per_row_gram_stats(wh, offs, n):
    """(max gram count, duplicate instances, total instances) per row.

    One lexsort over (row, gram-hash), then run-length segments; all
    reductions are `np.{maximum,add}.reduceat` over row boundaries.
    Rows with fewer than n tokens have zero grams (zeros returned).
    """
    nrows = len(offs) - 1
    gh, row_idx, _ = kgram_hashes_flat(wh, offs, n)
    maxc = np.zeros(nrows, dtype=np.int64)
    dup = np.zeros(nrows, dtype=np.int64)
    tot = np.zeros(nrows, dtype=np.int64)
    if len(gh) == 0:
        return maxc, dup, tot
    order = np.lexsort((gh, row_idx))
    r, g = row_idx[order], gh[order]
    new = np.empty(len(g), dtype=bool)
    new[0] = True
    new[1:] = (r[1:] != r[:-1]) | (g[1:] != g[:-1])
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(g)))  # per distinct (row, gram)
    rg_row = r[starts]
    row_new = np.empty(len(rg_row), dtype=bool)
    row_new[0] = True
    row_new[1:] = rg_row[1:] != rg_row[:-1]
    row_starts = np.flatnonzero(row_new)
    rows_present = rg_row[row_starts]
    maxc[rows_present] = np.maximum.reduceat(cnt, row_starts)
    dup[rows_present] = np.add.reduceat(np.where(cnt > 1, cnt, 0), row_starts)
    tot[rows_present] = np.add.reduceat(cnt, row_starts)
    return maxc, dup, tot


# Gopher-like gates, calibrated so they actually split this corpus
# (Gopher's own 0.20/0.18/0.16/... thresholds assume web text).
GOPHER_GATES = {"top2": 0.10, "top3": 0.08, "top4": 0.06, "dup5": 0.10}


def gopher_repetition(
    docs: "Dataset",
    *,
    gates: dict | None = None,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Per-document Gopher-style repetition statistics + keep gate.

    Columns: doc_id, n_tok, top2_frac, top3_frac, top4_frac, dup5_frac,
    keep. top{n}_frac = (count of the most frequent n-gram) * n / n_tok;
    dup5_frac = (5-gram instances whose gram occurs > once in the doc)
    / (total 5-gram instances). Gates compare the ROUNDED values so the
    SQL oracle's boundary behavior is bit-identical.
    """
    g = dict(GOPHER_GATES, **(gates or {}))

    def fn(batch: pa.Table) -> pa.Table:
        wh, offs = _word_hash_rows(batch)
        n_tok = np.diff(offs).astype(np.int64)
        cols: dict = {"doc_id": batch.column("doc_id"), "n_tok": n_tok}
        safe_tok = np.maximum(n_tok, 1).astype(np.float64)
        keep = n_tok > 0
        for n in (2, 3, 4):
            maxc, _, _ = _per_row_gram_stats(wh, offs, n)
            frac = np.round(maxc * n / safe_tok, round_dp)
            cols[f"top{n}_frac"] = frac
            keep &= frac <= g[f"top{n}"]
        _, dup, tot = _per_row_gram_stats(wh, offs, 5)
        frac5 = np.round(dup / np.maximum(tot, 1), round_dp)
        cols["dup5_frac"] = frac5
        keep &= frac5 <= g["dup5"]
        cols["keep"] = keep
        return pa.table(cols)

    out = docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def gopher_gate(
    docs: "Dataset",
    *,
    gates: dict | None = None,
    round_dp: int = 6,
) -> "Dataset":
    """Streaming FILTER form of :func:`gopher_repetition`: pass through
    only the rows the Gopher gate keeps (n_tok > 0 and every ROUNDED
    repetition fraction within its gate), with ALL input columns
    preserved. Map-only — the composition stage a curation chain uses,
    where the per-doc statistics report is not wanted, only the
    surviving documents. Same kernel, same rounded-boundary semantics
    as the report (SQL-oracle bit-identical).
    """
    g = dict(GOPHER_GATES, **(gates or {}))

    def fn(batch: pa.Table) -> pa.Table:
        wh, offs = _word_hash_rows(batch)
        n_tok = np.diff(offs).astype(np.int64)
        safe_tok = np.maximum(n_tok, 1).astype(np.float64)
        keep = n_tok > 0
        for n in (2, 3, 4):
            maxc, _, _ = _per_row_gram_stats(wh, offs, n)
            keep &= np.round(maxc * n / safe_tok, round_dp) <= g[f"top{n}"]
        _, dup, tot = _per_row_gram_stats(wh, offs, 5)
        keep &= np.round(dup / np.maximum(tot, 1), round_dp) <= g["dup5"]
        return batch.filter(pa.array(keep))

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def substring_dedup(
    docs: "Dataset",
    *,
    window: int = 8,
    num_partitions: int = 64,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Cross-document duplicated-window stats per document.

    A length-``window`` token window is a duplicate iff its gram occurs
    in >= 2 distinct documents. Returns {doc_id, n_windows,
    dup_windows, dup_frac} for every document with at least one window
    (n_tok >= window), sorted by doc_id.

    Scale shape: map emits one (doc_id, gh, cnt) row per DISTINCT gram
    per document (exact at map side — a document is one row); the
    gram-keyed fixed-P groupby marks grams seen in >= 2 docs and folds
    each partition to per-doc (dup, total) partials; a doc-keyed
    grouped sum finishes. Text never shuffles.
    """
    from .agg import grouped_agg

    P = int(num_partitions)

    def gram_rows(batch: pa.Table) -> pa.Table:
        wh, offs = _word_hash_rows(batch)
        gh, row_idx, _ = kgram_hashes_flat(wh, offs, window)
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(gh) == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "gh": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        # per-batch combine: one row per distinct (doc, gram)
        key_doc = doc[row_idx]
        order = np.lexsort((gh, key_doc))
        d, g = key_doc[order], gh[order]
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.append(starts, len(g)))
        gd, dd = g[starts], d[starts]
        return pa.table(
            {
                "part": partition_of(gd, P).astype(np.int32),
                "gh": gd,
                "doc_id": dd,
                "cnt": cnt,
            }
        )

    def partition_fold(group: pa.Table) -> pa.Table:
        gh = group.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False)
        # rows are (doc, gram)-distinct -> occurrences per gh = #docs
        order = np.argsort(gh, kind="stable")
        gs = gh[order]
        new = np.empty(len(gs), dtype=bool)
        if len(gs):
            new[0] = True
            new[1:] = gs[1:] != gs[:-1]
        ndocs_per_gram = np.diff(np.append(np.flatnonzero(new), len(gs)))
        gram_id = np.cumsum(new) - 1
        is_dup_sorted = ndocs_per_gram[gram_id] >= 2
        is_dup = np.empty(len(gs), dtype=bool)
        is_dup[order] = is_dup_sorted
        df = pd.DataFrame(
            {
                "doc_id": doc,
                "dup": np.where(is_dup, cnt, 0),
                "tot": cnt,
            }
        )
        agg = df.groupby("doc_id", sort=False).sum().reset_index()
        return pa.table(
            {
                "doc_id": pa.array(agg["doc_id"].to_numpy(dtype=np.int64)),
                "dup": pa.array(agg["dup"].to_numpy(dtype=np.int64)),
                "tot": pa.array(agg["tot"].to_numpy(dtype=np.int64)),
            }
        )

    grams = docs.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    partials = grams.groupby("part").map_groups(partition_fold, batch_format="pyarrow")
    sums = grouped_agg(
        partials,
        "doc_id",
        {"dup_windows": ("sum", "dup"), "n_windows": ("sum", "tot")},
        num_partitions=32,
    )
    df = sums.to_pandas()
    df["dup_frac"] = (df["dup_windows"] / df["n_windows"]).round(round_dp)
    df = df[["doc_id", "n_windows", "dup_windows", "dup_frac"]]
    return df.sort_values("doc_id").reset_index(drop=True)
