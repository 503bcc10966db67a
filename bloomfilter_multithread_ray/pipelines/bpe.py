"""Distributed byte-level BPE merge learning (Sennrich et al. 2016;
byte-level per GPT-2) over the `documents` corpus.

Scale shape: the corpus collapses ONCE to the distinct-word table
{tok, cnt} (one grouped_agg shuffle — the standard BPE trick: merges
depend only on word frequencies, and the distinct vocabulary is
millions of rows even at 100 TB). Each merge iteration is then
iterate-broadcast over that vocab-scale Dataset, exactly like
kmeans_lloyd: a map computes per-batch adjacent-pair partial counts,
one fixed-P grouped sum + local top-1 reduces to the argmax pair
(O(1) driver state), and a map rewrites the symbol sequences with the
merged pair. Text never re-tokenizes; the driver holds only the merge
rules.

Greedy left-to-right non-overlapping application inside a word
("aaaa" + (a,a) -> "aa","aa") is resolved vectorized: within each run
of consecutive match positions, every other match applies (parity
rule == greedy order).

Reference analog: the same combine-locally / merge-small-state shape
as the Bloom build's partial counters (src/main.cpp thread partials).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    from ray.data import Dataset


def word_counts(docs: "Dataset", *, num_partitions: int = 32) -> "Dataset":
    """documents -> distinct {tok, cnt} (per-batch combine + fixed-P sum)."""
    from ..stages.text import make_explode_token_counts_fn
    from .agg import grouped_agg

    partials = docs.map_batches(
        make_explode_token_counts_fn(), batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_agg(
        partials, "tok", {"cnt": ("sum", "cnt")}, num_partitions=num_partitions
    )


# byte -> unicode bijection (latin-1): every raw byte becomes exactly
# one code point, so multi-byte UTF-8 input stays byte-level BPE (the
# GPT-2 trick, minus the printability remapping) while all symbol
# arrays remain valid Arrow strings
_BYTE_LUT = pa.array([chr(i) for i in range(256)], pa.string())


def _to_symbols(batch: pa.Table) -> pa.Table:
    """{tok, cnt} -> {syms: list<string>, cnt}: one latin-1 symbol per
    raw BYTE of the word (byte-level BPE's initial alphabet).

    Vectorized: the utf8 value buffer is viewed as one uint8 array and
    gathered through the 256-entry byte->char dictionary. No per-word
    Python loop.
    """
    import pyarrow.compute as pc

    from .lm import _flat_utf8

    toks = batch.column("tok")
    data, offs = _flat_utf8(toks)
    o0 = int(offs[0])
    total = int(offs[-1] - o0)
    seg = data[o0 : o0 + total]
    flat = pc.take(_BYTE_LUT, pa.array(seg.astype(np.int32)))
    syms = pa.ListArray.from_arrays(pa.array(offs - o0, pa.int32()), flat)
    return pa.table({"syms": syms, "cnt": batch.column("cnt")})


def _flat_syms(batch: pa.Table):
    """syms list column -> (flat symbol Array, relative int64 offsets);
    slice-safe: the values array is re-sliced to the rows present."""
    syms = batch.column("syms")
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    o0 = int(offs[0])
    flat = syms.values.slice(o0, int(offs[-1] - o0))
    return flat, offs - o0


def _pair_partials(batch: pa.Table) -> pa.Table:
    """per-batch {l, r, c} partial counts of adjacent symbol pairs,
    weighted by word count; vectorized (arrow slices + pandas C hash)."""
    flat, offs = _flat_syms(batch)
    cnt = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(flat)
    if n < 2:
        return pa.table(
            {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
    lens = np.diff(offs)
    # adjacency positions i where (i, i+1) are in the same row
    boundary = np.zeros(n - 1, dtype=bool)
    boundary[offs[1:-1] - 1] = True  # last position of each row
    valid = ~boundary
    left = flat.slice(0, n - 1).filter(pa.array(valid))
    right = flat.slice(1).filter(pa.array(valid))
    w = np.repeat(cnt, np.maximum(lens - 1, 0))
    df = pd.DataFrame(
        {"l": left.to_pandas(), "r": right.to_pandas(), "c": w}
    ).groupby(["l", "r"], sort=False).sum().reset_index()
    return pa.table(
        {"l": pa.array(df["l"], pa.string()), "r": pa.array(df["r"], pa.string()),
         "c": pa.array(df["c"].to_numpy(dtype=np.int64))}
    )


def _greedy_apply_positions(match: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlap: in each run of consecutive
    match positions, keep every other one (parity within the run)."""
    idx = np.flatnonzero(match)
    if len(idx) == 0:
        return idx
    run_start = np.empty(len(idx), dtype=bool)
    run_start[0] = True
    run_start[1:] = np.diff(idx) > 1
    run_id = np.cumsum(run_start) - 1
    first = idx[run_start][run_id]
    return idx[(idx - first) % 2 == 0]


def make_apply_merge_fn(left: str, right: str):
    merged = left + right

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = _flat_syms(batch)
        n = len(flat)
        if n >= 2:
            m = (
                np.asarray(pc.equal(flat.slice(0, n - 1), left))
                & np.asarray(pc.equal(flat.slice(1), right))
            )
            m[offs[1:-1] - 1] = False  # never across word boundaries
            apply_at = _greedy_apply_positions(m)
        else:
            apply_at = np.empty(0, dtype=np.int64)
        if len(apply_at) == 0:
            return batch.select(["syms", "cnt"])
        vals = flat.to_numpy(zero_copy_only=False).astype(object)
        vals[apply_at] = merged
        keep = np.ones(n, dtype=bool)
        keep[apply_at + 1] = False
        new_flat = vals[keep]
        per_row = np.zeros(len(offs) - 1, dtype=np.int64)
        rows_of = np.searchsorted(offs, apply_at, side="right") - 1
        np.add.at(per_row, rows_of, 1)
        new_offs = np.concatenate(([0], np.cumsum(np.diff(offs) - per_row)))
        syms = pa.ListArray.from_arrays(
            pa.array(new_offs, pa.int32()), pa.array(new_flat, pa.string())
        )
        return pa.table({"syms": syms, "cnt": batch.column("cnt")})

    return fn


def _top_pair(pairs: "Dataset") -> tuple[str, str, int] | None:
    """argmax by (count DESC, l ASC, r ASC) — partition-independent."""
    from .agg import grouped_agg

    summed = grouped_agg(pairs, ["l", "r"], {"c": ("sum", "c")}, num_partitions=16)

    def local_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        df = t.to_pandas().sort_values(
            ["c", "l", "r"], ascending=[False, True, True]
        )
        return pa.Table.from_pandas(df.head(1), preserve_index=False)

    cands = summed.map_batches(local_top, batch_format="pyarrow").take_all()
    if not cands:
        return None
    best = min(cands, key=lambda r: (-r["c"], r["l"], r["r"]))
    return best["l"], best["r"], int(best["c"])


def bpe_merges(
    docs: "Dataset", *, num_merges: int = 8, num_partitions: int = 32
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merge rules; returns
    {step, left, right, pair_count} (deterministic tie-break)."""
    words = word_counts(docs, num_partitions=num_partitions).map_batches(
        _to_symbols, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    rules = []
    for step in range(1, num_merges + 1):
        pairs = words.map_batches(
            _pair_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        top = _top_pair(pairs)
        if top is None or top[2] < 2:
            break
        l, r, c = top
        rules.append({"step": step, "left": l, "right": r, "pair_count": c})
        words = words.map_batches(
            make_apply_merge_fn(l, r), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
    return pd.DataFrame(rules, columns=["step", "left", "right", "pair_count"])


def bpe_top_pairs(docs: "Dataset", *, topk: int = 20) -> pd.DataFrame:
    """Top-k adjacent byte pairs (the first-merge candidate list),
    SQL-oracle-able: {l, r, pair_count} by (count DESC, l, r)."""
    from .agg import grouped_agg

    words = word_counts(docs).map_batches(
        _to_symbols, batch_format="pyarrow", zero_copy_batch=True
    )
    pairs = words.map_batches(
        _pair_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    summed = grouped_agg(pairs, ["l", "r"], {"c": ("sum", "c")}, num_partitions=16)

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["c", "l", "r"], ascending=[False, True, True]
        )
        return pa.Table.from_pandas(df.head(topk), preserve_index=False)

    cands = pd.DataFrame(
        summed.map_batches(local_top, batch_format="pyarrow").take_all()
    )
    cands = cands.sort_values(
        ["c", "l", "r"], ascending=[False, True, True]
    ).head(topk)
    cands = cands.rename(columns={"c": "pair_count"}).reset_index(drop=True)
    return cands[["l", "r", "pair_count"]]


def bpe_encode_stats(
    docs: "Dataset", *, num_merges: int = 8, num_partitions: int = 32
) -> pd.DataFrame:
    """Learn ``num_merges`` rules, APPLY them to the corpus, and report
    the tokenizer's effect: one row {num_merges, words, symbols_before,
    symbols_after, compression}.

    The encode pass is the learn loop's apply stage re-used: merge
    rules broadcast implicitly in the map closures, the distinct-word
    table rewrites in place, and corpus-level totals are exact int64
    sums of per-word symbol counts weighted by word frequency (the
    corpus text itself is touched exactly once, by word_counts).
    """
    words = word_counts(docs, num_partitions=num_partitions).map_batches(
        _to_symbols, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def totals(t: pa.Table) -> pa.Table:
        _, offs = _flat_syms(t)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"syms": pa.array([int((np.diff(offs) * cnt).sum())], pa.int64()),
             "words": pa.array([int(cnt.sum())], pa.int64())}
        )

    def total_of(ds):
        df = ds.map_batches(
            totals, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        return int(df["syms"].sum()), int(df["words"].sum())

    before, nwords = total_of(words)
    applied = 0
    for _ in range(num_merges):
        pairs = words.map_batches(
            _pair_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        top = _top_pair(pairs)
        if top is None or top[2] < 2:
            break
        l, r, _c = top
        words = words.map_batches(
            make_apply_merge_fn(l, r), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        applied += 1
    after, _ = total_of(words)
    return pd.DataFrame(
        [{"num_merges": np.int64(applied), "words": np.int64(nwords),
          "symbols_before": np.int64(before), "symbols_after": np.int64(after),
          # half-up (ratio of two ints > 0, so exact .5 boundaries can
          # occur), matching the oracle's DuckDB ROUND — not round()'s
          # half-even
          "compression": float(np.trunc(before / max(after, 1) * 1e6
                                        + 0.5) / 1e6)}]
    )
