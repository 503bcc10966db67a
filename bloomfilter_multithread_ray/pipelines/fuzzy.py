"""Fuzzy string matching: all vocabulary token pairs within edit
distance 1 (entity-resolution / typo-clustering primitive).

Scale shape (SymSpell-style deletion-neighborhood blocking, exact for
distance <= 1): every distinct token emits hashes of itself and its
single-character-deletion variants; two tokens at Levenshtein distance
<= 1 ALWAYS share at least one variant (substitution at i -> both share
the delete-at-i string; insert/delete -> one IS the other's deletion
variant), so candidate generation is one token-keyed fixed-P shuffle of
O(len) variant rows per token — never an all-pairs product. Inside each
bucket partition, candidate pairs are verified with an exact
banded-Levenshtein kernel vectorized ACROSS pairs (the DP loop runs
over string positions, numpy over the pair axis). A final pair-keyed
dedup collapses multi-bucket hits.

The corpus never shuffles — only the distinct vocabulary (the BPE
module's compression observation applied to fuzzy matching).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash_strings


def _edit_distance_leq1(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized exact check dist(a[i], b[i]) <= 1 for object-str arrays.

    Length difference 0 -> allow exactly one substitution; difference
    1 -> allow one insertion (match with one skip on the longer side).
    O(maxlen) numpy passes over the pair axis — no per-pair Python DP.
    """
    la = np.char.str_len(a.astype(str))
    lb = np.char.str_len(b.astype(str))
    out = np.zeros(len(a), dtype=bool)
    if len(a) == 0:
        return out
    diff = np.abs(la - lb)
    eq = a == b
    out |= eq

    def codepoints(arr: np.ndarray, width: int) -> np.ndarray:
        """(n, width) uint32 codepoint matrix, zero-padded."""
        return (
            arr.astype(f"U{width}").view(np.uint32).reshape(len(arr), width)
        )

    # same length: hamming distance <= 1
    same = (diff == 0) & ~eq
    if same.any():
        w = max(int(la[same].max()), 1)
        Av = codepoints(a[same].astype(str), w)
        Bv = codepoints(b[same].astype(str), w)
        out[np.flatnonzero(same)[(Av != Bv).sum(axis=1) <= 1]] = True

    # length differs by one: longer == shorter with ONE char inserted
    ins = diff == 1
    if ins.any():
        idx = np.flatnonzero(ins)
        a_long = la[idx] > lb[idx]
        longer = np.where(a_long, a[idx], b[idx]).astype(str)
        shorter = np.where(a_long, b[idx], a[idx]).astype(str)
        Lmax = max(int(np.char.str_len(longer).max()), 1)
        Lv = codepoints(longer, Lmax)
        Sv = codepoints(shorter, Lmax)
        slen = np.char.str_len(shorter)
        pos = np.arange(Lmax)[None, :]
        valid = pos < slen[:, None]
        neq = (Lv != Sv) & valid
        # first mismatch position (slen if the whole prefix matches)
        first = np.where(neq.any(axis=1), neq.argmax(axis=1), slen)
        # after skipping longer[first], the tails must match:
        # longer[first+1 + t] == shorter[first + t] for all remaining t
        Lv_shift = np.pad(Lv, ((0, 0), (0, 1)))[:, 1:]  # longer shifted left
        tail_bad = (Lv_shift != Sv) & valid & (pos >= first[:, None])
        out[idx[~tail_bad.any(axis=1)]] = True
    return out


def _deletion_variants(tok: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(variant hash, token index) rows: each token + its 1-deletions.

    Vectorized by deletion position: pass p builds tok[:p] + tok[p+1:]
    for every token with len > p via numpy char slicing.
    """
    toks = tok.astype(str)
    lens = np.char.str_len(toks)
    hv = [hash_strings(pa.array(toks, pa.string()))]
    ti = [np.arange(len(toks), dtype=np.int64)]
    w = int(lens.max()) if len(lens) else 0
    if w:
        # codepoint matrix once; each deletion position drops one column
        # (trailing \0 padding reads back as end-of-string)
        M = toks.astype(f"U{w}").view(np.uint32).reshape(len(toks), w)
        zero = np.zeros((len(toks), 1), dtype=np.uint32)
        for p in range(w):
            has = lens > p
            Mp = np.concatenate([M[has, :p], M[has, p + 1 :], zero[has]], axis=1)
            variants = np.ascontiguousarray(Mp).view(f"U{w}").ravel()
            hv.append(hash_strings(pa.array(variants, pa.string())))
            ti.append(np.flatnonzero(has).astype(np.int64))
    return np.concatenate(hv), np.concatenate(ti)


def fuzzy_token_pairs(
    docs, *, num_partitions: int = 32, min_len: int = 3
) -> pd.DataFrame:
    """All distinct-token pairs (a < b) at Levenshtein distance <= 1
    (tokens shorter than ``min_len`` excluded — near-everything matches
    at tiny lengths). Output: {tok_a, tok_b, dist} sorted."""
    from ..stages.text import make_unique_tokens_fn
    from .agg import grouped_agg

    P = int(num_partitions)

    def variant_rows(batch: pa.Table) -> pa.Table:
        toks = batch.column("tok").to_numpy(zero_copy_only=False)
        keep = np.char.str_len(toks.astype(str)) >= min_len
        toks = toks[keep]
        if len(toks) == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 "vh": pa.array([], pa.uint64()),
                 "tok": pa.array([], pa.string())}
            )
        vh, ti = _deletion_variants(toks)
        return pa.table(
            {"part": pa.array((vh % np.uint64(P)).astype(np.int32)),
             "vh": pa.array(vh),
             "tok": pa.array(toks[ti], pa.string())}
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"vh": g.column("vh").to_numpy(zero_copy_only=False),
             "tok": g.column("tok").to_pandas()}
        ).drop_duplicates()
        m = df.merge(df, on="vh")
        m = m[m["tok_x"] < m["tok_y"]].drop_duplicates(["tok_x", "tok_y"])
        if len(m) == 0:
            return pa.table(
                {"tok_a": pa.array([], pa.string()),
                 "tok_b": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        a = m["tok_x"].to_numpy(dtype=object)
        b = m["tok_y"].to_numpy(dtype=object)
        ok = _edit_distance_leq1(a, b)
        return pa.table(
            {"tok_a": pa.array(a[ok], pa.string()),
             "tok_b": pa.array(b[ok], pa.string()),
             "c": pa.array(np.ones(int(ok.sum()), dtype=np.int64))}
        )

    vocab = docs.map_batches(
        make_unique_tokens_fn(), batch_format="pyarrow", zero_copy_batch=True
    )
    # exact-distinct the vocabulary (per-batch unique is only partial)
    vocab = grouped_agg(vocab, "tok", {"n": ("count", None)}, num_partitions=16)

    pairs = (
        vocab.map_batches(variant_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair can surface in several variant buckets -> global dedup
    dedup = grouped_agg(
        pairs, ["tok_a", "tok_b"], {"c": ("sum", "c")}, num_partitions=8
    ).to_pandas()
    if dedup.empty:
        # typed empty frame (Ray/pandas drop dtypes on empty results)
        return pd.DataFrame(
            {"tok_a": pd.Series(dtype=object), "tok_b": pd.Series(dtype=object),
             "dist": pd.Series(dtype=np.int64)}
        )
    out = dedup[["tok_a", "tok_b"]].copy()
    # pairs are strictly tok_a < tok_b, so the verified distance is 1
    out["dist"] = np.ones(len(out), dtype=np.int64)
    return out.sort_values(["tok_a", "tok_b"]).reset_index(drop=True)
