"""Text-analysis stages over a `text: string` column.

All vectorized pyarrow.compute: tokenize (single-space split), explode
to token rows with per-batch partial counting (pre-aggregation before
any groupby shuffle — SURVEY §7 step 4), token hashing for the sketch
pipelines, and per-document stats. These are the text-table entry
points into the same sketch machinery the tokens-table pipelines use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings


def split_tokens(batch: pa.Table, col: str = "text") -> pa.ListArray:
    """text column → list<string> of words (single-space split, empties dropped)."""
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    toks = pc.split_pattern(arr, " ")
    # NOTE: may contain empty strings (consecutive/leading spaces);
    # consumers that need `WHERE tok <> ''` semantics filter the flat
    # values themselves.
    return toks


def make_explode_token_counts_fn(col: str = "text"):
    """batch → {tok: string, cnt: int64} partial counts (per-batch combine).

    The per-batch ``np.unique`` collapse is the combiner that keeps the
    downstream ``groupby("tok").sum("cnt")`` shuffle proportional to
    *distinct* tokens per batch, not total tokens.
    """

    def fn(batch: pa.Table) -> pa.Table:
        toks = split_tokens(batch, col)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = pc.value_counts(flat)  # stays in Arrow memory, no per-str objects
        return pa.table(
            {"tok": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    return fn


def _flat_nonempty_with_counts(batch: pa.Table, col: str):
    """tokenized batch → (flat NON-EMPTY tokens, per-row counts).

    The shared row-alignment kernel for the grouped token feeds: the
    empty-token filter must shift the row offsets consistently (the
    `offs - offs[0]` slice normalization carries the chunk-offset fix
    from round 1 — keep every consumer on this one copy).
    """
    toks = split_tokens(batch, col)
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    ne = np.asarray(nonempty).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(ne)])
    return flat, np.diff(cum[offs])


def flat_nonempty_with_offsets(batch: pa.Table, col: str = "text"):
    """tokenized batch → (flat NON-EMPTY token Array, int64 row offsets
    into it).

    Offsets variant of ``_flat_nonempty_with_counts`` — the SAME
    chunk-offset-safe empty-token shift (keep every consumer on these
    two kernels; see the alignment note above). Used by the window/gram
    consumers (repetition filters, substring dedup, co-occurrence
    edges, source vocabularies).
    """
    toks = split_tokens(batch, col)
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    ne = np.asarray(nonempty).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(ne)])
    return flat.filter(nonempty), cum[offs]


def make_explode_token_counts_by_fn(by_col: str = "source", col: str = "text"):
    """batch → {by, tok, cnt} partial counts per (group, token)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        flat, counts = _flat_nonempty_with_counts(batch, col)
        by = batch.column(by_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({by_col: np.repeat(by, counts), "tok": np.asarray(flat)})
        # dropna=False: a NULL group is a group (SQL GROUP BY semantics)
        agg = df.groupby([by_col, "tok"], sort=False, dropna=False).size().reset_index(name="cnt")
        return pa.table(
            {by_col: pa.array(agg[by_col], pa.string()),
             "tok": pa.array(agg["tok"], pa.string()),
             "cnt": pa.array(agg["cnt"].to_numpy(dtype=np.int64))}
        )

    return fn


def make_unique_tokens_fn(col: str = "text"):
    """batch → {tok} with per-batch dedupe (shrinks the distinct shuffle)."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = split_tokens(batch, col)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"tok": pc.unique(flat)})

    return fn


def make_token_hash_fn(col: str = "text", seed: int = 0):
    """batch → {gh: uint64} one hash per word occurrence (sketch feed)."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = split_tokens(batch, col)
        flat = pc.list_flatten(toks)
        flat = flat.filter(pc.not_equal(flat, ""))
        return pa.table({"gh": hash_strings(flat, seed=seed)})

    return fn


# BPE-ish lexer: letter runs | digit runs | single non-space symbol —
# the "whitespace + a BPE-ish regex" token-counting pair. RE2 syntax,
# evaluated by Arrow here and by DuckDB (also RE2) in the oracle, so
# counts match exactly.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def make_regex_token_count_fn(
    pattern: str = BPE_ISH_PATTERN, col: str = "text", id_col: str = "doc_id"
):
    """batch → {doc_id, n_tok_re}: tokens per doc under a regex lexer.

    Fully Arrow-vectorized: ``pc.count_substring_regex`` counts
    non-overlapping leftmost matches (same semantics as DuckDB's
    ``len(regexp_extract_all(...))``) — no per-row Python regex calls.
    """

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = pc.count_substring_regex(arr, pattern)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids, "n_tok_re": pc.cast(n, pa.int32())})

    return fn


def make_doc_token_stats_fn(col: str = "text", id_col: str = "doc_id"):
    """batch → {doc_id, n_tok} per-document token counts."""

    def fn(batch: pa.Table) -> pa.Table:
        toks = split_tokens(batch, col)
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        # count non-empty tokens per row via offsets
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        ne = np.asarray(nonempty).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(ne)])
        n_tok = (cum[offs[1:]] - cum[offs[:-1]]).astype(np.int32)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids, "n_tok": pa.array(n_tok, pa.int32())})

    return fn


def make_word_kgram_hash_fn(
    k: int,
    num_partitions: int,
    col: str = "text",
    id_col: str = "doc_id",
    with_identity: bool = False,
):
    """batch → word k-gram (shingle) hashes: {part, gh[, doc_id, pos]}.

    Word-shingle analog of the tokens-table k-gram stage: hash each
    word, then window-hash the per-doc word-hash stream. Feeds text
    dedup (MinHash shingles) and text membership pipelines.
    """
    from ..functions.hashing import kgram_hashes_flat, partition_of

    def fn(batch: pa.Table) -> pa.Table:
        toks = split_tokens(batch, col)
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        offs_all = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs_all = offs_all - offs_all[0]
        ne = np.asarray(nonempty).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(ne)])
        offs = cum[offs_all]  # empties dropped: same token set as every
        # other consumer and the SQL oracles (whitespace runs invisible)
        wh = hash_strings(flat)
        gh, row_idx, pos = kgram_hashes_flat(wh, offs, k)
        part = partition_of(gh, num_partitions)
        cols: dict[str, object] = {"part": part, "gh": gh}
        if with_identity:
            ids = batch.column(id_col)
            if isinstance(ids, pa.ChunkedArray):
                ids = ids.combine_chunks()
            cols["doc_id"] = ids.take(pa.array(row_idx, type=pa.int64()))
            cols["pos"] = pa.array(pos, pa.int32())
        return pa.table(cols)

    return fn


def make_unique_tokens_by_fn(by_col: str = "source", col: str = "text"):
    """batch → {by, tok} distinct pairs per batch (grouped-distinct feed)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pandas as pd

        toks = split_tokens(batch, col)
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        ne = np.asarray(nonempty).astype(np.int64)
        cum = np.concatenate([[0], np.cumsum(ne)])
        counts = np.diff(cum[offs])
        by = batch.column(by_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {by_col: np.repeat(by, counts), "tok": np.asarray(flat)}
        ).drop_duplicates()
        return pa.table(
            {by_col: pa.array(df[by_col], pa.string()), "tok": pa.array(df["tok"], pa.string())}
        )

    return fn


def make_token_hash_by_fn(by_col: str = "source", col: str = "text", seed: int = 0):
    """batch → {by, gh} one hash per occurrence, tagged with the group."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_nonempty_with_counts(batch, col)
        by = batch.column(by_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {by_col: pa.array(np.repeat(by, counts), pa.string()),
             "gh": hash_strings(flat, seed=seed)}
        )

    return fn
