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
import pyarrow.compute as pc

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


# ---------------------------------------------- sorted-neighborhood pairs
def sorted_neighborhood_pairs(
    ds: "Dataset",
    key_col: str,
    id_col: str,
    *,
    window: int = 5,
    num_ranges: int = 32,
    sample_per_block: int = 256,
) -> pd.DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo SIGMOD'95):
    all id pairs within ``window`` ROWS of each other in the global
    (key, id) sort order → {id_a, id_b, gap} with gap = rank_b -
    rank_a in [1, window]. The classic entity-resolution candidate
    generator for keys where lexicographic neighbors are likely
    duplicates (normalized names/titles/prefixes).

    Fully distributed total order with O(ranges) driver state:

      1. split points from a distributed stride sample of the key
         (each block contributes <= sample_per_block values);
      2. one range shuffle: rid = searchsorted(splits, key) — equal
         keys land in ONE range, so a per-range lexsort((id, key)) is
         a global sort; per-range counts fold to prefix offsets on
         the driver (O(ranges) ints) and global rank = offset +
         local position;
      3. because global ranks are DENSE consecutive ints, the
         neighbor join needs no search: each row routes to rank
         buckets g = rank // window and g-1, bucket g owns pairs
         whose smaller rank sits in [g*w, (g+1)*w) and sees every
         partner rank < (g+2)*w — pairs materialize once, by
         construction, with pure arithmetic (np.repeat + cumsum
         offsets) per bucket.

    Null keys are dropped (SQL ORDER BY semantics do not apply to
    candidate blocking; filter upstream if nulls must pair). The id
    column must be unique — it is the sort tiebreak that makes the
    order (and therefore the pair set) deterministic at any
    partitioning (tested).
    """
    import pyarrow.compute as pc

    w = int(window)
    B = int(num_ranges)
    if w < 1:
        raise ValueError("sorted_neighborhood_pairs: window must be >= 1")

    keyed = ds.map_batches(
        lambda t: t.select([key_col, id_col]).filter(pc.is_valid(t.column(key_col))),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    # --- stride-sampled string split points (driver folds scalars) ---
    cap = int(sample_per_block)

    def samp(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column(key_col).to_pylist(), dtype=object)
        if len(v) > cap:
            v = v[np.linspace(0, len(v) - 1, cap).astype(np.int64)]
        return pa.table({"v": pa.array(v, pa.string())})

    sdf = keyed.map_batches(samp, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if sdf.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "gap": pd.Series(dtype=np.int64)})
    v = np.sort(sdf["v"].to_numpy(dtype=object))
    qpos = np.linspace(0, len(v) - 1, B + 1)[1:-1].astype(np.int64)
    splits = np.unique(v[qpos])

    def route(t: pa.Table) -> pa.Table:
        k = np.asarray(t.column(key_col).to_pylist(), dtype=object)
        rid = np.searchsorted(splits, k, side="right").astype(np.int32)
        return t.append_column("__rid", pa.array(rid))

    bucketed = keyed.map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    hdf = bucketed.map_batches(
        lambda t: pa.table({
            "b": pa.array(np.arange(len(splits) + 1, dtype=np.int64)),
            "n": pa.array(np.bincount(
                t.column("__rid").to_numpy(zero_copy_only=False),
                minlength=len(splits) + 1).astype(np.int64)),
        }),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    counts = np.zeros(len(splits) + 1, dtype=np.int64)
    np.add.at(counts, hdf["b"].to_numpy(), hdf["n"].to_numpy())
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())

    def rank_range(g: pa.Table) -> pa.Table:
        b = int(g.column("__rid")[0].as_py())
        k = np.asarray(g.column(key_col).to_pylist(), dtype=object)
        i = g.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((i, k))
        rank = offsets[b] + np.arange(len(k), dtype=np.int64)
        return pa.table({"rank": pa.array(rank),
                         "id": pa.array(i[order].astype(np.int64))})

    ranked = bucketed.groupby("__rid").map_groups(rank_range, batch_format="pyarrow")

    def to_pair_buckets(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        i = t.column("id").to_numpy(zero_copy_only=False)
        g = r // w
        # copy 1: own bucket (owner + partner); copy 2: previous bucket
        # (partner for its owners); bucket -1 rows never own or pair
        gg = np.concatenate([g, g - 1])
        rr = np.concatenate([r, r])
        ii = np.concatenate([i, i])
        keep = gg >= 0
        return pa.table({"g": pa.array(gg[keep]), "rank": pa.array(rr[keep]),
                         "id": pa.array(ii[keep])})

    def pair_kernel(t: pa.Table) -> pa.Table:
        gval = int(t.column("g")[0].as_py())
        r = t.column("rank").to_numpy(zero_copy_only=False)
        i = t.column("id").to_numpy(zero_copy_only=False)
        order = np.argsort(r, kind="stable")
        r, i = r[order], i[order]
        base = gval * w
        owners = (r >= base) & (r < base + w)
        # ranks in this bucket are the consecutive ints [base, hi]
        hi = int(r[-1])
        ro = r[owners]
        cnt = np.minimum(w, hi - ro).astype(np.int64)
        nz = cnt > 0  # the global max rank owns no pairs — drop before
        ro, cnt = ro[nz], cnt[nz]  # the cumsum-reset (zero segments break it)
        pos = ro - int(r[0])  # position of each owner in the sorted array
        total = int(cnt.sum())
        if total == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "gap": pa.array([], pa.int64())})
        # partner offsets 1..cnt per owner via the repeat/cumsum idiom
        step = np.ones(total, dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        step[starts] = np.concatenate([[1], 1 - cnt[:-1]])
        offs = np.cumsum(step)
        a_pos = np.repeat(pos, cnt)
        return pa.table({"id_a": pa.array(i[a_pos]),
                         "id_b": pa.array(i[a_pos + offs]),
                         "gap": pa.array(offs)})

    pairs = (
        ranked.map_batches(to_pair_buckets, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .map_groups(pair_kernel, batch_format="pyarrow")
    )
    df = pairs.to_pandas()
    if df.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                             "id_b": pd.Series(dtype=np.int64),
                             "gap": pd.Series(dtype=np.int64)})
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    del n_total
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------- general edit-distance (<= d) join
def _codepoint_matrix(arr: np.ndarray, width: int) -> np.ndarray:
    return arr.astype(f"U{width}").view(np.uint32).reshape(len(arr), width)


def _edit_distances(a: np.ndarray, b: np.ndarray, d: int) -> np.ndarray:
    """Exact Levenshtein distance per pair, clamped to d+1 past the
    threshold. Banded DP (Ukkonen band 2d+1) vectorized ACROSS pairs:
    the loops run over string positions × band offsets (O(maxlen·d)
    numpy passes), never over pairs. For a given row i and band offset
    k the b-column j = i+k−d is FIXED, so the substitution-cost column
    compare is one full-array slice — no per-pair gathers in the hot
    loop."""
    n = len(a)
    INF = d + 1
    out = np.full(n, INF, dtype=np.int64)
    if n == 0:
        return out
    a = a.astype(str)
    b = b.astype(str)
    la = np.char.str_len(a)
    lb = np.char.str_len(b)
    cand = np.abs(la - lb) <= d
    if not cand.any():
        return out
    ai, bi = a[cand], b[cand]
    lai, lbi = la[cand], lb[cand]
    m = len(ai)
    W = max(int(lai.max()), int(lbi.max()), 1)
    A = _codepoint_matrix(ai, W)
    B = _codepoint_matrix(bi, W)
    width = 2 * d + 1
    ans = np.full(m, INF, dtype=np.int64)
    kans = lbi - lai + d  # band offset of each pair's answer cell
    dp = np.full((width, m), INF, dtype=np.int64)
    for k in range(d, width):  # row 0: dp[0][j] = j
        j = k - d
        dp[k] = np.minimum(j, np.where(j <= lbi, j, INF))
    sel0 = lai == 0
    if sel0.any():
        ans[sel0] = np.minimum(lbi[sel0], INF)
    for i in range(1, int(lai.max()) + 1):
        ndp = np.full((width, m), INF, dtype=np.int64)
        for k in range(width):
            j = i + k - d
            if j < 0:
                continue
            best = np.full(m, INF, dtype=np.int64)
            if k + 1 < width:
                best = np.minimum(best, dp[k + 1] + 1)  # delete a[i-1]
            if k > 0:
                best = np.minimum(best, ndp[k - 1] + 1)  # insert b[j-1]
            if j == 0:
                best = np.minimum(best, i)  # left edge: i deletions
            elif j - 1 < B.shape[1]:  # past B's width every pair has j > lbi
                cost = (A[:, i - 1] != B[:, j - 1]).astype(np.int64)
                best = np.minimum(best, dp[k] + cost)  # substitute/match
            invalid = (j > lbi) | (i > lai)
            best[invalid] = INF
            ndp[k] = np.minimum(best, INF)
        dp = ndp
        fin = lai == i
        if fin.any():
            ans[fin] = dp[kans[fin], np.flatnonzero(fin)]
    out[np.flatnonzero(cand)] = ans
    return out


def _deletion_variants_d(
    tok: np.ndarray, d: int
) -> tuple[np.ndarray, np.ndarray]:
    """(variant hash, token index) for ALL deletion variants of depth
    ≤ d (SymSpell neighborhood: ed(a,b) ≤ d ⇒ the two neighborhoods
    intersect). Vectorized by deletion-position tuple: O(maxlen^d)
    passes, each a column-drop over the codepoint matrix."""
    toks = tok.astype(str)
    lens = np.char.str_len(toks)
    hv = [hash_strings(pa.array(toks, pa.string()))]
    ti = [np.arange(len(toks), dtype=np.int64)]
    w = int(lens.max()) if len(lens) else 0

    def emit(drop: tuple[int, ...]) -> None:
        has = lens > max(drop)
        if not has.any():
            return
        keep_cols = [c for c in range(w) if c not in drop]
        M = _codepoint_matrix(toks[has], w)
        pad = np.zeros((int(has.sum()), len(drop)), dtype=np.uint32)
        Mp = np.concatenate([M[:, keep_cols], pad], axis=1)
        variants = np.ascontiguousarray(Mp).view(f"U{w}").ravel()
        hv.append(hash_strings(pa.array(variants, pa.string())))
        ti.append(np.flatnonzero(has).astype(np.int64))

    if w:
        for p in range(w):
            emit((p,))
        if d >= 2:
            for p in range(w):
                for q in range(p + 1, w):
                    emit((p, q))
        if d >= 3:
            raise ValueError("edit_distance_pairs supports max_dist <= 2")
    return np.concatenate(hv), np.concatenate(ti)


def edit_distance_pairs(
    ds,
    id_col: str,
    str_col: str,
    *,
    max_dist: int = 2,
    min_len: int = 1,
    num_partitions: int = 32,
    max_len: int = 64,
    pairs_only: bool = False,
    sink_path: "str | None" = None,
) -> pd.DataFrame:
    """Similarity JOIN on edit distance: all id pairs (id_a < id_b)
    whose strings are within Levenshtein distance ``max_dist`` (0, 1 or
    2), with the EXACT distance per pair → {id_a, id_b, dist}.

    Two output-cost escape hatches for when the expanded pair list is
    the expensive part (each distinct value pair multiplies into
    n_a × n_b id pairs):

    - ``pairs_only=True`` returns the VALUE-level result
      {val_a, val_b, dist, n_pairs} — one row per verified distinct
      value pair (plus one per duplicated value at dist 0) with the
      COUNT of id pairs it would expand to; the id expansion never
      runs, so the result is candidate-sized, not output-sized.
    - ``sink_path=...`` runs the full expansion but STREAMS it to
      partitioned parquet at that path instead of collecting one
      driver frame; returns a one-row summary {n_pairs}. This is the
      100-TB shape — the driver never holds the pair list.

    Scale shape (fuzzy_token_pairs generalized): only the DISTINCT
    values travel — candidate generation is one value-keyed fixed-P
    shuffle of the depth-≤d deletion neighborhood (SymSpell blocking:
    never an all-pairs product), per-bucket candidates verify through
    the banded pair-vectorized DP, a pair-keyed dedup collapses
    multi-bucket hits, and id expansion is two broadcast-friendly
    hash joins of the (tiny) verified value-pair list against the
    (value → id) map plus within-value id pairs for duplicates
    (dist 0). Strings longer than ``max_len`` are dropped with the
    same honesty rule as the interval join's replication guard — the
    d=2 neighborhood is O(len²) variants, so unbounded lengths belong
    in a shingle-based join (ngram_jaccard), not this one.
    """
    if max_dist not in (0, 1, 2):
        raise ValueError(f"max_dist must be 0, 1 or 2, got {max_dist}")
    from .agg import grouped_agg
    from .join import hash_join

    P = int(num_partitions)

    def val_rows(t: pa.Table) -> pa.Table:
        s = t.column(str_col)
        if pa.types.is_null(s.type):
            return pa.table({"val": pa.array([], pa.string()),
                             "id": pa.array([], pa.int64())})
        ids = pc.cast(t.column(id_col), pa.int64())
        keep = pc.and_(
            pc.invert(pc.is_null(s)),
            pc.and_(
                pc.greater_equal(pc.utf8_length(s), min_len),
                pc.less_equal(pc.utf8_length(s), max_len),
            ),
        )
        keep = pc.fill_null(keep, False)
        return pa.table({"val": pc.cast(s, pa.string()).filter(keep),
                         "id": ids.filter(keep)})

    vals = ds.map_batches(val_rows, batch_format="pyarrow", zero_copy_batch=True)
    vals = vals.materialize()  # reused: distinct + id expansion + dup pairs
    distinct = grouped_agg(vals, "val", {"n": ("count", None)}, num_partitions=P)

    def variant_rows(t: pa.Table) -> pa.Table:
        v = t.column("val").to_numpy(zero_copy_only=False)
        if len(v) == 0 or max_dist == 0:
            return pa.table({"part": pa.array([], pa.int32()),
                             "vh": pa.array([], pa.uint64()),
                             "val": pa.array([], pa.string())})
        vh, ti = _deletion_variants_d(v, max_dist)
        return pa.table(
            {"part": pa.array((vh % np.uint64(P)).astype(np.int32)),
             "vh": pa.array(vh),
             "val": pa.array(v[ti], pa.string())}
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"vh": g.column("vh").to_numpy(zero_copy_only=False),
             "val": g.column("val").to_pandas()}
        ).drop_duplicates()
        m = df.merge(df, on="vh")
        m = m[m["val_x"] < m["val_y"]].drop_duplicates(["val_x", "val_y"])
        empty = pa.table(
            {"val_a": pa.array([], pa.string()),
             "val_b": pa.array([], pa.string()),
             "dist": pa.array([], pa.int64())}
        )
        if len(m) == 0:
            return empty
        a = m["val_x"].to_numpy(dtype=object)
        b = m["val_y"].to_numpy(dtype=object)
        dist = _edit_distances(a, b, max_dist)
        ok = dist <= max_dist
        return pa.table(
            {"val_a": pa.array(a[ok], pa.string()),
             "val_b": pa.array(b[ok], pa.string()),
             "dist": pa.array(dist[ok])}
        )

    import ray.data  # noqa: F401  (Dataset ops below)

    vpairs = (
        distinct.map_batches(variant_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    vpairs = grouped_agg(  # multi-bucket dedup; dist identical per pair
        vpairs, ["val_a", "val_b"], {"dist": ("min", "dist")}, num_partitions=8
    )

    if pairs_only:
        # value-level aggregate: attach per-value id counts (two
        # broadcast-friendly joins of the tiny verified pair list
        # against the distinct-count table) — ids never expand
        s1 = hash_join(vpairs, distinct, on="val_a", right_on="val",
                       how="inner", num_partitions=8, broadcast="auto")
        s2 = hash_join(s1, distinct, on="val_b", right_on="val",
                       how="inner", num_partitions=8, broadcast="auto")

        def stat_rows(t: pa.Table) -> pa.Table:
            na = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            nb = t.column("n_r").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"val_a": t.column("val_a"), "val_b": t.column("val_b"),
                 "dist": pc.cast(t.column("dist"), pa.int64()),
                 "n_pairs": pa.array(na * nb)}
            )

        def dup_stats(t: pa.Table) -> pa.Table:
            n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = n >= 2
            v = pc.cast(t.column("val"), pa.string()).filter(pa.array(keep))
            n = n[keep]
            return pa.table(
                {"val_a": v, "val_b": v,
                 "dist": pa.array(np.zeros(len(n), dtype=np.int64)),
                 "n_pairs": pa.array(n * (n - 1) // 2)}
            )

        stats = s2.map_batches(
            stat_rows, batch_format="pyarrow", zero_copy_batch=True
        ).union(distinct.map_batches(
            dup_stats, batch_format="pyarrow", zero_copy_batch=True))
        sdf = stats.to_pandas()
        if sdf.empty:
            return pd.DataFrame(
                {"val_a": pd.Series(dtype=object),
                 "val_b": pd.Series(dtype=object),
                 "dist": pd.Series(dtype=np.int64),
                 "n_pairs": pd.Series(dtype=np.int64)}
            )
        sdf = sdf.astype({"dist": np.int64, "n_pairs": np.int64})
        return sdf.sort_values(["val_a", "val_b"]).reset_index(drop=True)[
            ["val_a", "val_b", "dist", "n_pairs"]
        ]

    # id expansion: value pair -> all (id_a, id_b) cross pairs
    e1 = hash_join(vpairs, vals, on="val_a", right_on="val",
                   how="inner", num_partitions=P, broadcast="auto", suffix="_l")
    e2 = hash_join(e1, vals, on="val_b", right_on="val",
                   how="inner", num_partitions=P, broadcast="auto", suffix="_r")

    def orient(t: pa.Table) -> pa.Table:
        ia = t.column("id").to_numpy(zero_copy_only=False)
        ib = t.column("id_r").to_numpy(zero_copy_only=False)
        dist = t.column("dist").to_numpy(zero_copy_only=False)
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                         "dist": pa.array(dist.astype(np.int64))})

    cross = e2.map_batches(orient, batch_format="pyarrow", zero_copy_batch=True)

    # duplicates of the SAME value: within-group id pairs at dist 0
    def dup_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("id").to_numpy(zero_copy_only=False))
        k = len(ids)
        if k < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        iu, ju = np.triu_indices(k, 1)
        return pa.table({"id_a": pa.array(ids[iu]), "id_b": pa.array(ids[ju]),
                         "dist": pa.array(np.zeros(len(iu), dtype=np.int64))})

    dups = vals.groupby("val").map_groups(dup_pairs, batch_format="pyarrow")
    if sink_path is not None:
        import ray.data as rd

        cross.union(dups).write_parquet(sink_path)
        n = rd.read_parquet(sink_path, columns=["id_a"]).count()
        return pd.DataFrame({"n_pairs": np.array([n], dtype=np.int64)})
    out = cross.union(dups).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"id_a": pd.Series(dtype=np.int64), "id_b": pd.Series(dtype=np.int64),
             "dist": pd.Series(dtype=np.int64)}
        )
    out = out.astype({"id_a": np.int64, "id_b": np.int64, "dist": np.int64})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ------------------------------------- Jaro-Winkler similarity join
def _jaro_winkler(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact Jaro-Winkler similarity per pair, vectorized ACROSS the
    pair axis (loops run over string positions only).

    Pinned semantics (verified against DuckDB's implementation on edge
    cases — empty strings, window-0 transposition blindness, boost
    threshold, prefix cap):

    - either side empty -> 0.0 (including both empty);
    - match window  w = max(0, max(la, lb)//2 - 1); a char of ``a`` at
      position i matches the LOWEST unmatched equal char of ``b`` in
      [i-w, i+w] (the classic greedy flagging order);
    - transpositions t = (# positions where the k-th matched char of a
      differs from the k-th matched char of b) / 2;
    - J = (m/la + m/lb + (m - t)/m) / 3, 0 when m == 0;
    - Winkler boost ONLY when J > 0.7 (strict):
      JW = J + min(prefix, 4) * 0.1 * (1 - J).
    """
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    a = a.astype(str)
    b = b.astype(str)
    la = np.char.str_len(a)
    lb = np.char.str_len(b)
    live = (la > 0) & (lb > 0)
    if not live.any():
        return out
    a, b, la, lb = a[live], b[live], la[live], lb[live]
    W = int(max(la.max(), lb.max()))
    A = _codepoint_matrix(a, W)
    B = _codepoint_matrix(b, W)
    pos = np.arange(W)[None, :]
    validB = pos < lb[:, None]
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    matchedB = np.zeros(B.shape, dtype=bool)
    matchA = np.full(A.shape, -1, dtype=np.int32)  # b-index per a-pos
    for i in range(W):
        active = i < la
        if not active.any():
            break
        cand = (
            (B == A[:, i][:, None])
            & ~matchedB
            & validB
            & (pos >= (i - w)[:, None])
            & (pos <= (i + w)[:, None])
            & active[:, None]
        )
        has = cand.any(axis=1)
        j = cand.argmax(axis=1)
        matchA[has, i] = j[has]
        matchedB[has, j[has]] = True

    mmask = matchA >= 0
    m = mmask.sum(axis=1)
    # k-th matched char of a (in a order) vs k-th matched of b (b order)
    SA = np.zeros(A.shape, dtype=np.uint32)
    SB = np.zeros(B.shape, dtype=np.uint32)
    ra = np.cumsum(mmask, axis=1) - 1
    rows, cols = np.nonzero(mmask)
    SA[rows, ra[rows, cols]] = A[rows, cols]
    rb = np.cumsum(matchedB, axis=1) - 1
    rows, cols = np.nonzero(matchedB)
    SB[rows, rb[rows, cols]] = B[rows, cols]
    # DuckDB/rapidfuzz convention pinned empirically: the mismatched
    # matched-position count FLOORS when halved (odd counts round down)
    t = ((SA != SB) & (pos < m[:, None])).sum(axis=1) // 2

    ms = np.where(m == 0, 1, m).astype(np.float64)  # guard /0; J forced 0
    J = (m / la + m / lb + (m - t) / ms) / 3.0
    J[m == 0] = 0.0
    # common prefix length, capped at 4 and at min(la, lb)
    k4 = min(4, W)
    pref_eq = (A[:, :k4] == B[:, :k4]) & (pos[:, :k4] < np.minimum(la, lb)[:, None])
    ell = np.cumprod(pref_eq, axis=1).sum(axis=1)
    JW = np.where(J > 0.7, J + ell * 0.1 * (1.0 - J), J)
    out[np.flatnonzero(live)] = JW
    return out


def jaro_winkler_pairs(
    ds,
    str_col: str,
    *,
    tau: float = 0.88,
    num_partitions: int = 32,
    min_len: int = 1,
    max_len: int = 64,
) -> pd.DataFrame:
    """Similarity JOIN on Jaro-Winkler: all DISTINCT value pairs
    (val_a < val_b) with JW(val_a, val_b) >= tau, the exact similarity
    (6 dp) and the id-pair count each would expand to
    -> {val_a, val_b, jw, n_pairs}.

    Scale shape — exact sub-quadratic blocking via the AllPairs-style
    character prefix filter (Bayardo et al., WWW'07), adapted to Jaro
    through the matching-character bound:

      JW >= tau  =>  J >= j_min = (tau - 0.4) / 0.6   (boost adds at
                     most 0.4*(1-J), so JW <= 0.6*J + 0.4 always)
      J >= j_min =>  m >= ceil(alpha * max(la, lb)),
                     alpha = 3*j_min - 2   (the other two Jaro terms
                     are each <= 1)
      m <= |char-multiset intersection|    (Jaro matching is injective
                     on equal characters)

    so any qualifying pair shares >= ceil(alpha*len) multiset elements
    (char, occurrence-index). Each distinct value sorts its elements by
    ascending EXACT global character frequency (rarest first — the
    AllPairs ordering that keeps buckets small) and emits only its
    first  len - ceil(alpha*len) + 1  elements as signatures; a
    qualifying pair always shares a signature (prefix-filter theorem),
    so candidate generation is one signature-keyed fixed-P shuffle of
    O(len) rows per DISTINCT value — never an all-pairs product, and
    the corpus itself never shuffles (only the vocabulary does).
    Candidates pass a pair length filter (alpha*max <= min) and verify
    through the pair-vectorized exact kernel; a pair-keyed dedup
    collapses multi-signature hits. When tau <= 0.8 (alpha <= 0) the
    prefix degenerates to the whole multiset — still exact, no pruning;
    this join is built for the high-tau near-match regime.

    Strings outside [min_len, max_len] are dropped (same honesty rule
    as edit_distance_pairs: signature volume is O(len) per value, and
    long-text similarity belongs in the shingle joins).
    """
    from .agg import grouped_agg
    from .join import hash_join

    P = int(num_partitions)
    j_min = (float(tau) - 0.4) / 0.6
    alpha = max(0.0, 3.0 * j_min - 2.0)

    def val_rows(t: pa.Table) -> pa.Table:
        s = t.column(str_col)
        if pa.types.is_null(s.type):
            return pa.table({"val": pa.array([], pa.string())})
        keep = pc.and_(
            pc.invert(pc.is_null(s)),
            pc.and_(
                pc.greater_equal(pc.utf8_length(s), min_len),
                pc.less_equal(pc.utf8_length(s), max_len),
            ),
        )
        keep = pc.fill_null(keep, False)
        return pa.table({"val": pc.cast(s, pa.string()).filter(keep)})

    vals = ds.map_batches(val_rows, batch_format="pyarrow", zero_copy_batch=True)
    distinct = grouped_agg(vals, "val", {"n": ("count", None)}, num_partitions=P)
    distinct = distinct.materialize()  # reused: signatures + n_pairs join

    # exact global char frequencies over the DISTINCT vocabulary (the
    # AllPairs rarest-first ordering) — alphabet-sized driver fold
    def char_counts(t: pa.Table) -> pa.Table:
        v = t.column("val").to_numpy(zero_copy_only=False).astype(str)
        if len(v) == 0:
            return pa.table({"cp": pa.array([], pa.uint32()),
                             "cnt": pa.array([], pa.int64())})
        W = int(np.char.str_len(v).max())
        M = _codepoint_matrix(v, max(W, 1))
        cp, cnt = np.unique(M[M != 0], return_counts=True)
        return pa.table({"cp": pa.array(cp.astype(np.uint32)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    freq_tbl = grouped_agg(
        distinct.map_batches(char_counts, batch_format="pyarrow",
                             zero_copy_batch=True),
        "cp", {"cnt": ("sum", "cnt")}, num_partitions=8,
    ).to_pandas()
    freq: dict[int, int] = dict(
        zip(freq_tbl["cp"].astype(np.uint64), freq_tbl["cnt"].astype(np.int64))
    )

    def signature_rows(t: pa.Table) -> pa.Table:
        v = t.column("val").to_numpy(zero_copy_only=False).astype(str)
        empty = pa.table({"part": pa.array([], pa.int32()),
                          "sig": pa.array([], pa.uint64()),
                          "val": pa.array([], pa.string())})
        if len(v) == 0:
            return empty
        L = np.char.str_len(v)
        W = int(L.max())
        M = _codepoint_matrix(v, W).astype(np.uint64)
        valid = np.arange(W)[None, :] < L[:, None]
        # occurrence index of each char within its row (multiset tag):
        # sort row chars, rank within equal runs, scatter back
        order = np.argsort(np.where(valid, M, np.uint64(2**32)), axis=1,
                           kind="stable")
        srt = np.take_along_axis(M, order, axis=1)
        newrun = np.ones(srt.shape, dtype=bool)
        newrun[:, 1:] = srt[:, 1:] != srt[:, :-1]
        runpos = np.arange(W)[None, :] - np.maximum.accumulate(
            np.where(newrun, np.arange(W)[None, :], 0), axis=1
        )
        occ = np.zeros(M.shape, dtype=np.uint64)
        np.put_along_axis(occ, order, runpos.astype(np.uint64), axis=1)
        # composite sort key: (global freq asc, cp, occ); invalid -> max
        fr = np.vectorize(lambda c: freq.get(int(c), 0), otypes=[np.uint64])(M)
        key = (fr << np.uint64(27)) | (M << np.uint64(6)) | occ
        key = np.where(valid, key, np.uint64(0xFFFFFFFFFFFFFFFF))
        key.sort(axis=1)
        # alpha is float-computed (5*(tau-0.8) lands at 0.4+2e-17 for
        # tau=0.88); subtract an epsilon far above float error but far
        # below the 1/L granularity so equality-at-tau pairs survive
        # blocking (the exact kernel still decides membership)
        o_req = np.maximum(np.ceil(alpha * L - 1e-9).astype(np.int64), 1)
        plen = L - o_req + 1  # prefix-filter length (>= 1)
        pmask = (np.arange(W)[None, :] < plen[:, None]) & np.sort(
            valid, axis=1
        )[:, ::-1]
        rows, cols = np.nonzero(pmask)
        sig = key[rows, cols] & np.uint64((1 << 27) - 1)  # (cp, occ) element
        from ..functions.hashing import splitmix64

        mixed = splitmix64(sig)
        return pa.table(
            {"part": pa.array((mixed % np.uint64(P)).astype(np.int32)),
             "sig": pa.array(mixed),
             "val": pa.array(v[rows], pa.string())}
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table({"val_a": pa.array([], pa.string()),
                          "val_b": pa.array([], pa.string()),
                          "jw": pa.array([], pa.float64())})
        df = pd.DataFrame(
            {"sig": g.column("sig").to_numpy(zero_copy_only=False),
             "val": g.column("val").to_pandas()}
        ).drop_duplicates()
        m = df.merge(df, on="sig")
        m = m[m["val_x"] < m["val_y"]].drop_duplicates(["val_x", "val_y"])
        if len(m) == 0:
            return empty
        a = m["val_x"].to_numpy(dtype=object)
        b = m["val_y"].to_numpy(dtype=object)
        la = np.char.str_len(a.astype(str))
        lb = np.char.str_len(b.astype(str))
        # m<=min; +1e-9 so boundary pairs (alpha*max == min exactly in
        # rational arithmetic) are not dropped by float round-up
        ok = alpha * np.maximum(la, lb) <= np.minimum(la, lb) + 1e-9
        a, b = a[ok], b[ok]
        if len(a) == 0:
            return empty
        jw = _jaro_winkler(a, b)
        hit = jw >= tau
        return pa.table({"val_a": pa.array(a[hit], pa.string()),
                         "val_b": pa.array(b[hit], pa.string()),
                         "jw": pa.array(jw[hit])})

    vpairs = (
        distinct.map_batches(signature_rows, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # multi-signature dedup; jw identical per pair (same kernel inputs)
    vpairs = grouped_agg(
        vpairs, ["val_a", "val_b"], {"jw": ("min", "jw")}, num_partitions=8
    )
    s1 = hash_join(vpairs, distinct, on="val_a", right_on="val",
                   how="inner", num_partitions=8, broadcast="auto")
    s2 = hash_join(s1, distinct, on="val_b", right_on="val",
                   how="inner", num_partitions=8, broadcast="auto")
    out = s2.to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"val_a": pd.Series(dtype=object), "val_b": pd.Series(dtype=object),
             "jw": pd.Series(dtype=np.float64),
             "n_pairs": pd.Series(dtype=np.int64)}
        )
    # half-up at 6dp (jw >= 0), matching DuckDB ROUND and the repo's
    # pinned trunc(x*1e6 + 0.5) convention — not np.round's half-even
    out["jw"] = np.trunc(out["jw"].to_numpy(np.float64) * 1e6 + 0.5) / 1e6
    out["n_pairs"] = (out["n"].astype(np.int64) * out["n_r"].astype(np.int64))
    return out.sort_values(["val_a", "val_b"]).reset_index(drop=True)[
        ["val_a", "val_b", "jw", "n_pairs"]
    ]


def _closure_labels(
    pairs: pd.DataFrame,
    *,
    closure: str = "auto",
    distributed_above: int = 200_000,
    cc_local_cutoff: int = 2_000_000,
) -> pd.DataFrame:
    """Transitive closure of a (val_a, val_b) string pair list →
    {val, entity} (entity = lexicographically smallest member) for
    every value appearing in a pair.

    ``closure="driver"`` is the small-side fast path (Python
    union-find — fine while the matched-pair list is vocabulary-small);
    ``"distributed"`` maps the pair vocabulary to dense sorted int ids
    and routes through :func:`graph.connected_components` (min-ID
    component label == lexicographic-min name under the sorted-rank
    mapping), which itself escalates from a single vectorized kernel
    to alternating star-contraction rounds; ``"auto"`` switches to the
    distributed path above ``distributed_above`` pairs — the dup-heavy
    100-TB names-column regime where "vocabulary-bounded" stops being
    a small-side guarantee.
    """
    if closure == "auto":
        closure = "distributed" if len(pairs) > distributed_above else "driver"
    if closure == "driver":
        parent: dict = {}

        def find(x: str) -> str:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs[["val_a", "val_b"]].itertuples(index=False):
            ra, rb = find(a), find(b)
            if ra != rb:  # lexicographic min as the canonical root
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        vals = pd.unique(pairs[["val_a", "val_b"]].to_numpy().ravel())
        return pd.DataFrame({"val": vals, "entity": [find(v) for v in vals]})
    if closure != "distributed":
        raise ValueError(f"unknown closure {closure!r}")
    import ray.data as rd

    from .graph import connected_components

    vocab = np.unique(pairs[["val_a", "val_b"]].to_numpy().ravel())
    idx = pd.Series(np.arange(len(vocab), dtype=np.int64), index=vocab)
    id_pairs = rd.from_arrow(pa.table(
        {"doc_a": pa.array(idx[pairs["val_a"]].to_numpy(np.int64)),
         "doc_b": pa.array(idx[pairs["val_b"]].to_numpy(np.int64))}
    ))
    comp = connected_components(
        id_pairs, local_cutoff=cc_local_cutoff
    ).to_pandas()
    return pd.DataFrame({"val": vocab[comp["node"].to_numpy(np.int64)],
                         "entity": vocab[comp["comp"].to_numpy(np.int64)]})


def entity_resolution(
    ds,
    str_col: str,
    *,
    tau: float = 0.88,
    num_partitions: int = 32,
    closure: str = "auto",
    cc_local_cutoff: int = 2_000_000,
) -> pd.DataFrame:
    """Name-based entity resolution → {entity, n_names, n_parts}: all
    DISTINCT values whose Jaro-Winkler similarity reaches ``tau`` link
    into one entity (transitive closure), identified by its
    lexicographically smallest member name; only multi-name entities
    report (singletons are every other distinct value). n_parts is
    the total ROW count the entity's names expand to.

    Composition shape: the heavy lifting is
    :func:`jaro_winkler_pairs` (exact sub-quadratic AllPairs
    char-prefix blocking — the corpus never shuffles, only the
    vocabulary does) plus one grouped count for per-name row counts;
    the closure over the MATCHED-PAIR list (vocabulary-bounded by
    construction, never rows) runs through :func:`_closure_labels` —
    driver union-find on the small side, distributed
    connected-components star contraction above 200k pairs (the
    dup-heavy regime where the matched-pair list is exactly what
    grows). Replayed in SQL by a recursive reachability fixpoint
    (exact for any component diameter).
    """
    from .agg import grouped_agg

    pairs = jaro_winkler_pairs(ds, str_col, tau=tau,
                               num_partitions=num_partitions)

    def val_rows(t: pa.Table) -> pa.Table:
        s = t.column(str_col)
        if pa.types.is_null(s.type):
            return pa.table({"val": pa.array([], pa.string())})
        keep = pc.invert(pc.is_null(s))
        return pa.table({"val": pc.cast(s, pa.string()).filter(keep)})

    counts = grouped_agg(
        ds.map_batches(val_rows, batch_format="pyarrow", zero_copy_batch=True),
        "val", {"n": ("count", None)}, num_partitions=8,
    ).to_pandas()
    empty = pd.DataFrame(
        {"entity": pd.Series(dtype=object),
         "n_names": pd.Series(dtype=np.int64),
         "n_parts": pd.Series(dtype=np.int64)}
    )
    if pairs.empty or counts.empty:
        return empty

    lab = _closure_labels(pairs, closure=closure,
                          cc_local_cutoff=cc_local_cutoff)
    # names the closure never touched stay singletons and drop under
    # the n_names >= 2 filter
    ent = pd.Series(lab["entity"].to_numpy(), index=lab["val"].to_numpy())
    counts["entity"] = counts["val"].map(ent).fillna(counts["val"])
    out = counts.groupby("entity").agg(
        n_names=("val", "count"), n_parts=("n", "sum")).reset_index()
    out = out[out["n_names"] >= 2].astype(
        {"n_names": np.int64, "n_parts": np.int64})
    return out.sort_values("entity").reset_index(drop=True)
