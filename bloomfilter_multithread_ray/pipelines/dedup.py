"""Document deduplication pipelines (training-data-pipeline widening).

Five dedup families over the `documents` table, all expressed
Ray-Data-first:

- exact duplicate removal (see ``relational.dedup_exact_documents``) —
  hash-partitioned groupby on content;
- **MinHash + LSH** near-dup: shingle → per-doc MinHash signature
  (vectorized ``np.minimum.reduceat``) → band-bucket groupby →
  in-bucket pair verification by signature agreement. No broadcast of
  per-doc state: band rows carry their signature, so every stage is a
  plain shuffle (scales to arbitrary corpus size; shuffle volume =
  bands × sig bytes per doc);
- **SimHash** near-dup: 64-bit weighted token fingerprint; pairs with
  Hamming distance <= d found by pigeonhole banding into d+1 chunks
  (a pair within distance d must agree exactly on >= 1 chunk);
- **exact n-gram Jaccard** pairs: distinct-shingle inverted index →
  per-gram pair expansion (the candidate join) → pairwise intersection
  counts → Jaccard against exact set sizes via ``Dataset.join``.
  DuckDB-oracle-checkable (deterministic floats: one int division);
- **embedding cosine** near-dup: see ``similarity.embedding_dup_pairs``.

Scale notes (100 TB): every stage here shuffles by a content-derived
key (band bucket, simhash chunk, gram) — the same-shard invariant of
the reference's minimizer routing (``src/SkmerExtractor.cpp:164``).
Hot buckets (e.g. a boilerplate gram shared by millions of docs) are
capped at ``max_bucket`` with a deterministic sample — the
documented trade: candidate recall within a pathological bucket, never
correctness of emitted pairs. The keep-set runs fully distributed via
``graph.connected_components`` (pointer-jumping label propagation) +
``graph.keep_set_distributed`` (anti join); the driver union-find in
:func:`keep_set_from_pairs` remains as the small-scale cross-check
(equality asserted in tests/test_graph.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import UINT64, hash_strings, kgram_hashes_flat, splitmix64
from ..stages.text import flat_nonempty_with_offsets

if TYPE_CHECKING:
    from ray.data import Dataset


# ------------------------------------------------------------------ shingles
def _half_up(x: np.ndarray, dp: int) -> np.ndarray:
    """Half-up decimal rounding (values are >= 0), matching DuckDB
    ROUND: weighted-Jaccard values are small-denominator rationals
    (int intersection over int union after weight quantization), so
    exact .5 decimal boundaries genuinely occur — e.g. 77/128 =
    0.6015625, where np.round's half-even gives 0.601562 but the
    oracle's ROUND gives 0.601563."""
    q = 10.0 ** dp
    return np.trunc(x * q + 0.5) / q


def _doc_gram_hashes(batch: pa.Table, k: int, col: str = "text"):
    """batch → (gram hashes, row index per gram).

    Word-k-gram (shingle) hashes per document, via the same windowed
    polynomial kernel the flagship uses for token k-grams. Empty
    tokens (consecutive/leading spaces) are dropped BEFORE windowing —
    the same token set every other pipeline and the SQL oracles use,
    so whitespace-only docs have no shingles at all.
    """
    # shared chunk-offset-safe kernel (one copy rule — see
    # stages/text.py alignment note)
    flat, offs = flat_nonempty_with_offsets(batch, col)
    wh = hash_strings(flat)
    gh, row_idx, _ = kgram_hashes_flat(wh, offs, k)
    return gh, row_idx


def _triu_expand(lens: np.ndarray):
    """Vectorized within-segment pair expansion (shared kernel).

    For segments of sizes ``lens`` laid out contiguously, returns
    (seg, a, b): the segment ordinal and LOCAL (a < b) indices of every
    unordered pair, in deterministic (segment, a, b) order — the
    closed-form triangular unranking, exhaustively verified in
    tests/test_dedup.py.
    """
    lens = np.asarray(lens, dtype=np.int64)
    npairs = (lens * (lens - 1)) // 2
    total = int(npairs.sum())
    if total == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e, e
    seg = np.repeat(np.arange(len(lens)), npairs)
    pair_start = np.concatenate([[0], np.cumsum(npairs)])
    local = np.arange(total, dtype=np.int64) - pair_start[seg]
    L = lens[seg]
    M = (L * (L - 1)) // 2
    rev = M - 1 - local
    a = (L - 2 - ((np.sqrt(8.0 * rev + 1.0) - 1.0) // 2)).astype(np.int64)
    b = (local - a * (L - 1) + a * (a - 1) // 2 + a + 1).astype(np.int64)
    return seg, a, b


def make_minhash_fn(k: int = 3, num_perm: int = 128, col: str = "text", id_col: str = "doc_id"):
    """batch → {doc_id, sig: fixed_size_list<uint64>[num_perm]}.

    Vectorized MinHash: one splitmix64 re-seed pass + one
    ``np.minimum.reduceat`` per permutation over the batch's flat gram
    hashes. Docs with fewer than k tokens have no shingles and are
    dropped (they cannot near-duplicate anything under this measure).
    """
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=UINT64) * UINT64(0x9E3779B97F4A7C15))

    def fn(batch: pa.Table) -> pa.Table:
        gh, row_idx = _doc_gram_hashes(batch, k, col)
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if len(gh) == 0:
            sig_t = pa.list_(pa.uint64(), num_perm)
            return pa.table({"doc_id": ids.slice(0, 0), "sig": pa.array([], sig_t)})
        # row boundaries within the gram stream (row_idx is sorted)
        starts = np.flatnonzero(np.diff(row_idx, prepend=-1))
        rows_present = row_idx[starts]
        sig = np.empty((len(starts), num_perm), dtype=UINT64)
        for p in range(num_perm):
            sig[:, p] = np.minimum.reduceat(splitmix64(gh ^ seeds[p]), starts)
        sig_arr = pa.FixedSizeListArray.from_arrays(pa.array(sig.reshape(-1)), num_perm)
        return pa.table(
            {"doc_id": ids.take(pa.array(rows_present, pa.int64())), "sig": sig_arr}
        )

    return fn


def minhash_signatures(ds: "Dataset", k: int = 3, num_perm: int = 128) -> "Dataset":
    return ds.map_batches(
        make_minhash_fn(k, num_perm), batch_format="pyarrow", zero_copy_batch=True
    )


# ------------------------------------------------------------------ LSH
def _band_rows_fn(bands: int, rows_per_band: int):
    """{doc_id, sig} → one row per (doc, band): {bkey, doc_id, sig}.

    ``bkey`` mixes the band index into the band-slice hash so one
    groupby covers all bands. Signatures travel with the band rows —
    in-bucket verification then needs no side lookup (no broadcast).
    """
    num_perm = bands * rows_per_band

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"bkey": pa.array([], pa.uint64()),
                 "doc_id": batch.column("doc_id"),
                 "sig": batch.column("sig")}
            )
        sig_col = batch.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sig = np.asarray(sig_col.values).reshape(n, num_perm).astype(UINT64)
        keys = np.empty((bands, n), dtype=UINT64)
        with np.errstate(over="ignore"):
            for b in range(bands):
                acc = np.full(n, UINT64(b + 1), dtype=UINT64)
                for r in range(rows_per_band):
                    acc = splitmix64(acc ^ sig[:, b * rows_per_band + r])
                keys[b] = acc
        doc_rep = pa.concat_arrays([pa.array(np.arange(n, dtype=np.int64))] * bands)
        return pa.table(
            {
                "bkey": pa.array(keys.reshape(-1)),
                "doc_id": batch.column("doc_id").combine_chunks().take(doc_rep),
                "sig": sig_col.take(doc_rep),
            }
        )

    return fn


def _partition_bucket_pairs_fn(threshold: float, num_perm: int, max_bucket: int):
    """One shuffle partition (many buckets) → verified pairs, vectorized.

    Groups arrive partitioned by ``bkey % P``; inside, buckets are
    segments of the bkey-sorted rows. Pair expansion reuses the
    triangular unranking kernel; signature-agreement estimation is one
    (pairs × num_perm) comparison.
    """

    def fn(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
        n = group.num_rows
        if n < 2:
            return empty
        bkey = group.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sig_col = group.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sig = np.asarray(sig_col.values).reshape(n, num_perm)
        # sort by (bucket, doc); dedupe docs repeated within a bucket
        order = np.lexsort((ids, bkey))
        bkey, ids, sig = bkey[order], ids[order], sig[order]
        same_as_prev = np.zeros(n, dtype=bool)
        same_as_prev[1:] = (bkey[1:] == bkey[:-1]) & (ids[1:] == ids[:-1])
        bkey, ids, sig = bkey[~same_as_prev], ids[~same_as_prev], sig[~same_as_prev]
        n = len(ids)
        starts = np.flatnonzero(np.diff(bkey, prepend=bkey[0] + np.uint64(1)))
        lens = np.diff(np.concatenate([starts, [n]]))
        # cap bucket size deterministically (doc-sorted)
        pos = np.arange(n) - np.repeat(starts, lens)
        keep = pos < max_bucket
        ids, sig = ids[keep], sig[keep]
        lens = np.minimum(lens, max_bucket)
        offs = np.concatenate([[0], np.cumsum(lens)])
        seg, a, b = _triu_expand(lens)
        if len(seg) == 0:
            return empty
        base = offs[seg]
        ia, ib = base + a, base + b
        # verify in bounded chunks: the (pairs x num_perm) comparison
        # matrix would be unbounded on duplicate-heavy partitions
        CHUNK = 1 << 20
        out_a, out_b, out_e = [], [], []
        for lo in range(0, len(ia), CHUNK):
            ca, cb = ia[lo : lo + CHUNK], ib[lo : lo + CHUNK]
            est = (sig[ca] == sig[cb]).mean(axis=1)
            hit = est >= threshold
            out_a.append(ids[ca[hit]])
            out_b.append(ids[cb[hit]])
            out_e.append(est[hit])
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a)),
                "doc_b": pa.array(np.concatenate(out_b)),
                "est_jaccard": pa.array(np.concatenate(out_e)),
            }
        )

    return fn


def pick_lsh_bands(num_perm: int, threshold: float) -> int:
    """Bands whose s-curve midpoint (1/b)^(1/r) sits just BELOW the
    threshold, so a true threshold-Jaccard pair collides in >= 1 band
    with high probability (recall at the threshold > 50%, rising
    steeply above it). Chooses among divisors of num_perm."""
    best, best_gap = num_perm, float("inf")
    target = 0.85 * threshold
    for b in range(1, num_perm + 1):
        if num_perm % b:
            continue
        r = num_perm // b
        mid = (1.0 / b) ** (1.0 / r)
        gap = abs(mid - target)
        if gap < best_gap:
            best, best_gap = b, gap
    return best


def minhash_lsh_pairs(
    docs: "Dataset",
    *,
    k: int = 3,
    num_perm: int = 128,
    bands: int | None = None,
    threshold: float = 0.5,
    max_bucket: int = 256,
    dedupe: bool = True,
) -> "Dataset":
    """Near-duplicate pairs by MinHash-LSH → {doc_a, doc_b, est_jaccard}.

    ``dedupe=False`` skips the final pair-dedup groupby (a full
    sort-shuffle): a pair surfacing in several bands is then emitted
    once per band. Consumers with multiset-tolerant semantics —
    connected components / keep-set construction — save that shuffle.

    ``bands`` defaults to :func:`pick_lsh_bands`: tuned so the LSH
    s-curve midpoint sits below ``threshold`` (e.g. threshold=0.5,
    num_perm=128 → 32 bands × 4 rows, midpoint 0.42 → ~87% bucket
    recall at 0.5-Jaccard, >99.9% at 0.7). A fixed 16×8 banding
    (midpoint 0.71) would silently miss ~94% of 0.5-Jaccard pairs.
    """
    if bands is None:
        bands = pick_lsh_bands(num_perm, threshold)
    if num_perm % bands:
        raise ValueError("num_perm must divide into equal bands")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(docs, k, num_perm)
    band_rows = sigs.map_batches(
        _band_rows_fn(bands, rows_per_band), batch_format="pyarrow", zero_copy_batch=True
    )

    # shuffle by bkey % P (fixed partition count), not one group per
    # bucket: Ray pays per-GROUP overhead, pathological at millions of
    # buckets; within a partition buckets are vectorized segments
    P_SHUF = 64

    def add_bp(batch: pa.Table) -> pa.Table:
        bk = batch.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        return batch.append_column("bp", pa.array((bk % np.uint64(P_SHUF)).astype(np.int32)))

    pairs = (
        band_rows.map_batches(add_bp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bp")
        .map_groups(
            _partition_bucket_pairs_fn(threshold, num_perm, max_bucket),
            batch_format="pyarrow",
        )
    )
    if not dedupe:
        return pairs
    # same pair can surface in several bands → dedupe on the pair key.
    # Fixed-P pair-hash shuffle + vectorized unique kernel (same plan
    # as minhash_increment's: Ray's multi-key aggregate machinery is
    # ~10x slower on this skinny-row shape, measured at 20x sf0.1);
    # max est per pair matches the old Max aggregate exactly.
    from ..functions.hashing import splitmix64

    def add_pp(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(da.view(np.uint64)) ^ splitmix64(~db.view(np.uint64))
        return batch.append_column(
            "pp", pa.array((h % np.uint64(P_SHUF)).astype(np.int32))
        )

    def unique_pairs(g: pa.Table) -> pa.Table:
        da = g.column("doc_a").to_numpy(zero_copy_only=False)
        db = g.column("doc_b").to_numpy(zero_copy_only=False)
        est = g.column("est_jaccard").to_numpy(zero_copy_only=False)
        order = np.lexsort((-est, db, da))
        da, db, est = da[order], db[order], est[order]
        first = np.ones(len(da), dtype=bool)
        first[1:] = (da[1:] != da[:-1]) | (db[1:] != db[:-1])
        return pa.table(
            {"doc_a": pa.array(da[first]), "doc_b": pa.array(db[first]),
             "est_jaccard": pa.array(est[first])}
        )

    return (
        pairs.map_batches(add_pp, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pp")
        .map_groups(unique_pairs, batch_format="pyarrow")
    )


def keep_set_from_pairs(docs: "Dataset", pairs: "Dataset", id_col: str = "doc_id"):
    """Duplicate-cluster keep-set: keep the min doc_id per component.
    Returns a pandas DataFrame {doc_id} of survivors.

    Thin wrapper over :func:`.graph.keep_set_distributed` (hash-
    partitioned connected components + anti join) — the driver
    union-find this signature used to run is gone, so no caller can
    reach a driver-side ``take_all`` over the pair list by accident;
    only the small SURVIVOR id list materializes, for the pandas
    return shape."""
    import pandas as pd

    from .graph import keep_set_distributed

    kept = keep_set_distributed(docs, pairs, id_col=id_col)
    out = kept.to_pandas().sort_values(id_col).reset_index(drop=True)
    return pd.DataFrame({id_col: out[id_col].astype("int64")})


# ------------------------------------------------------------------ simhash
def make_simhash_fn(col: str = "text", id_col: str = "doc_id"):
    """batch → {doc_id, simhash: uint64} (64-bit weighted token fingerprint).

    bit_i(doc) = sign of sum over token occurrences of (+1 if bit_i of
    token hash else -1); fully vectorized: 64 masked weighted sums via
    ``np.add.reduceat`` on the batch's flat token-hash stream.
    """

    def fn(batch: pa.Table) -> pa.Table:
        # shared chunk-offset-safe kernel (one copy rule)
        flat, offs = flat_nonempty_with_offsets(batch, col)
        h = hash_strings(flat)
        n_rows = len(offs) - 1
        counts = np.diff(offs)
        sim = np.zeros(n_rows, dtype=UINT64)
        nz = counts > 0
        starts = offs[:-1][nz]
        bits = np.zeros((len(starts), 64), dtype=np.int64)
        for i in range(64):
            b = ((h >> UINT64(i)) & UINT64(1)).astype(np.int64)
            bits[:, i] = np.add.reduceat(b, starts) if len(h) else 0
        half = counts[nz][:, None] / 2.0
        word = np.zeros(len(starts), dtype=UINT64)
        for i in range(64):
            word |= (bits[:, i] > half[:, 0]).astype(UINT64) << UINT64(i)
        sim[nz] = word
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({"doc_id": ids, "simhash": pa.array(sim)})

    return fn


def simhash_pairs(docs: "Dataset", *, max_hamming: int = 3, max_bucket: int = 512) -> "Dataset":
    """Pairs with simhash Hamming distance <= max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into
    ``max_hamming + 1`` chunks; any pair within the distance agrees on
    at least one full chunk, so groupby(chunk value ⊕ chunk index)
    finds every such pair (exact recall, then exact verification on
    the carried fingerprints). The banding/verify engine is shared
    with every other 64-bit fingerprint family (media pHash) via
    :func:`hamming_fingerprint_pairs`.
    """
    sims = docs.map_batches(
        make_simhash_fn(), batch_format="pyarrow", zero_copy_batch=True
    )
    return hamming_fingerprint_pairs(
        sims, id_col="doc_id", fp_col="simhash",
        max_hamming=max_hamming, max_bucket=max_bucket,
    )


def hamming_fingerprint_pairs(
    fps: "Dataset",
    *,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket: int = 512,
) -> "Dataset":
    """{id, 64-bit fingerprint} rows → pairs with Hamming distance
    <= ``max_hamming`` as {doc_a, doc_b, hamming} (ids int64, each
    unordered pair once, exact distances).

    The generic pigeonhole-banding engine extracted from
    :func:`simhash_pairs` (same guarantees: exact recall for
    d <= max_hamming from the max_hamming+1 chunk split, exact
    verification on carried fingerprints, fixed-P shuffle of skinny
    band rows, deterministic ``max_bucket`` cap, per-pair Min fold so
    multi-band hits emit once).
    """
    chunks = max_hamming + 1
    width = 64 // chunks
    mask = UINT64((1 << width) - 1)

    def band_fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sh = batch.column(fp_col).to_numpy(zero_copy_only=False).astype(UINT64)
        ids = batch.column(id_col).combine_chunks()
        keys, doc_rep = [], []
        for c in range(chunks):
            chunk = (sh >> UINT64(c * width)) & mask
            keys.append(splitmix64(chunk ^ (UINT64(c + 1) << UINT64(56))))
            doc_rep.append(np.arange(n, dtype=np.int64))
        rep = pa.array(np.concatenate(doc_rep))
        return pa.table(
            {
                "ckey": pa.array(np.concatenate(keys)),
                "doc_id": ids.take(rep),
                "simhash": pa.array(np.concatenate([sh] * chunks)),
            }
        )

    def partition_bucket_fn(group: pa.Table) -> pa.Table:
        """One ckey-hash partition → exact-Hamming-verified pairs,
        vectorized over all its buckets (segments of the sorted rows)."""
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int32())}
        )
        n = group.num_rows
        if n < 2:
            return empty
        ckey = group.column("ckey").to_numpy(zero_copy_only=False).astype(UINT64)
        ids = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sh = group.column("simhash").to_numpy(zero_copy_only=False).astype(UINT64)
        order = np.lexsort((ids, ckey))
        ckey, ids, sh = ckey[order], ids[order], sh[order]
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (ckey[1:] == ckey[:-1]) & (ids[1:] == ids[:-1])
        ckey, ids, sh = ckey[~dup], ids[~dup], sh[~dup]
        n = len(ids)
        starts = np.flatnonzero(np.diff(ckey, prepend=ckey[0] + UINT64(1)))
        lens = np.diff(np.concatenate([starts, [n]]))
        pos = np.arange(n) - np.repeat(starts, lens)
        keep = pos < max_bucket
        ids, sh = ids[keep], sh[keep]
        lens = np.minimum(lens, max_bucket)
        offs = np.concatenate([[0], np.cumsum(lens)])
        seg, a, b = _triu_expand(lens)
        if len(seg) == 0:
            return empty
        base = offs[seg]
        ia, ib = base + a, base + b
        x = sh[ia] ^ sh[ib]
        ham = np.zeros(len(x), dtype=np.int32)
        for i in range(64):
            ham += ((x >> UINT64(i)) & UINT64(1)).astype(np.int32)
        hit = ham <= max_hamming
        return pa.table(
            {"doc_a": pa.array(ids[ia[hit]]), "doc_b": pa.array(ids[ib[hit]]),
             "hamming": pa.array(ham[hit])}
        )

    banded = fps.map_batches(band_fn, batch_format="pyarrow", zero_copy_batch=True)

    P_SHUF = 64  # fixed partitions; buckets = vectorized segments within

    def add_cp(batch: pa.Table) -> pa.Table:
        ck = batch.column("ckey").to_numpy(zero_copy_only=False).astype(UINT64)
        return batch.append_column("cp", pa.array((ck % UINT64(P_SHUF)).astype(np.int32)))

    pairs = (
        banded.map_batches(add_cp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cp")
        .map_groups(partition_bucket_fn, batch_format="pyarrow")
    )
    # pair dedup (min hamming per pair) via the fixed-P pair-hash
    # shuffle + unique kernel — same ~10x-vs-multi-key-aggregate
    # rationale as minhash_lsh_pairs/minhash_increment
    from ..functions.hashing import splitmix64

    def add_pp(batch: pa.Table) -> pa.Table:
        da = batch.column("doc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(da.view(np.uint64)) ^ splitmix64(~db.view(np.uint64))
        return batch.append_column(
            "pp", pa.array((h % np.uint64(P_SHUF)).astype(np.int32))
        )

    def unique_pairs(g: pa.Table) -> pa.Table:
        da = g.column("doc_a").to_numpy(zero_copy_only=False)
        db = g.column("doc_b").to_numpy(zero_copy_only=False)
        ham = g.column("hamming").to_numpy(zero_copy_only=False)
        order = np.lexsort((ham, db, da))
        da, db, ham = da[order], db[order], ham[order]
        first = np.ones(len(da), dtype=bool)
        first[1:] = (da[1:] != da[:-1]) | (db[1:] != db[:-1])
        return pa.table(
            {"doc_a": pa.array(da[first]), "doc_b": pa.array(db[first]),
             "hamming": pa.array(ham[first])}
        )

    return (
        pairs.map_batches(add_pp, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("pp")
        .map_groups(unique_pairs, batch_format="pyarrow")
    )


# ---------------------------------------------------------- exact n-gram jaccard
def ngram_jaccard_pairs(
    docs: "Dataset",
    *,
    k: int = 3,
    threshold: float = 0.5,
    max_gram_df: int = 64,
    measure: str = "jaccard",
) -> "Dataset":
    """Word-k-gram Jaccard pairs >= threshold (DuckDB-checkable).

    ``measure="containment"`` switches the final score to max
    containment i / min(|A|, |B|) — the asymmetric near-superset
    detector (a short doc quoted/embedded inside a long one scores
    ~1.0 where Jaccard stays near |A|/|B|); output column becomes
    ``containment``. Same two-shuffle plan either way — only the one
    float expression in the finalize kernel differs.

    Inverted index {gram_hash, doc_id, n_grams} (distinct per doc, each
    row carrying its doc's exact set size) → per-gram pair expansion
    (the candidate join) → partition-vectorized intersection counts →
    Jaccard = i / (|A| + |B| - i). Join-free: two shuffles total, both
    keyed on content-derived keys. Exact up to 64-bit shingle-hash
    collisions (P[any] ~ n_grams² / 2^65 — the same stance as
    dedup_exact; the DuckDB oracle compares over gram STRINGS and has
    matched bit-for-bit on every fixture).

    ``max_gram_df`` caps pair expansion per gram — a gram shared by
    every doc (boilerplate) would otherwise emit O(df²) rows. Capped
    grams can only LOWER candidate recall for pairs whose *every*
    shared gram is boilerplate; with the default no cap binds on the
    test tables (asserted in tests), keeping SQL parity exact.
    """
    # defined BEFORE the UDF closures below so the closure cells are
    # filled even if a caller pickles the UDFs eagerly
    _NBITS = 21  # n_grams < 2^21; doc ids < 2^31 (fixture assumption)
    P_SHUF = 64
    if measure not in ("jaccard", "containment"):
        raise ValueError(f"unknown measure {measure!r}")
    out_col = "jaccard" if measure == "jaccard" else "containment"

    def gram_rows(batch: pa.Table) -> pa.Table:
        # vectorized shingle hashes (shared kernel), distinct per doc
        gh, row_idx = _doc_gram_hashes(batch, k, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(gh) == 0:
            return pa.table(
                {"gh": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "n_grams": pa.array([], pa.int64())}
            )
        pairs = np.unique(
            np.stack([row_idx, gh.view(np.int64)], axis=1), axis=0
        )
        rows, ghs = pairs[:, 0], pairs[:, 1]
        per_row = np.bincount(rows, minlength=batch.num_rows).astype(np.int64)
        out_ids = ids[rows]
        if out_ids.size and not (0 <= out_ids.min() and out_ids.max() < (1 << 31)):
            raise ValueError("doc_id out of [0, 2^31) — pair packing would corrupt")
        if per_row.max(initial=0) >= (1 << _NBITS):
            raise ValueError("n_grams >= 2^21 — pair packing would corrupt")
        return pa.table(
            {
                "gh": pa.array(ghs),
                "doc_id": pa.array(out_ids),
                "n_grams": pa.array(per_row[rows]),
            }
        )

    gram_ds = docs.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)

    # Both wide steps below are hash-partitioned map_groups over a
    # FIXED number of partitions (not one group per gram / per pair):
    # Ray's aggregate layer pays Python-level cost per GROUP, which is
    # pathological at ~1M pair groups (measured 15s at sf0.1); with 64
    # hash partitions each group call is one vectorized numpy kernel
    # over ~1/64th of the rows (measured ~2s). Same-hash => same
    # partition keeps co-location exact.

    def pack(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ns = batch.column("n_grams").to_numpy(zero_copy_only=False).astype(np.int64)
        gh = batch.column("gh").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"gp": pa.array(np.abs(gh) % P_SHUF),
             "gh": pa.array(gh),
             "packed": pa.array((ids << _NBITS) | ns)}
        )

    def partition_pairs(group: pa.Table) -> pa.Table:
        """All grams whose hash lands in this partition → partial pair
        counts, one vectorized pass (dedup, segment, triu-unrank)."""
        empty = pa.table(
            {"pair": pa.array([], pa.int64()), "i": pa.array([], pa.int64()),
             "nanb": pa.array([], pa.int64())}
        )
        gh = group.column("gh").to_numpy(zero_copy_only=False).astype(np.int64)
        packed = group.column("packed").to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (gram, doc) postings, sorted by (gram, doc)
        uniq = np.unique(np.stack([gh, packed], axis=1), axis=0)
        gh, packed = uniq[:, 0], uniq[:, 1]
        seg_starts = np.flatnonzero(np.diff(gh, prepend=gh[0] - 1)) if len(gh) else np.array([], np.int64)
        if len(seg_starts) == 0:
            return empty
        lens = np.diff(np.concatenate([seg_starts, [len(gh)]]))
        # cap posting lists (deterministic: lists are doc-sorted)
        pos = np.arange(len(gh)) - np.repeat(seg_starts, lens)
        keep = pos < max_gram_df
        packed = packed[keep]
        lens = np.minimum(lens, max_gram_df)
        offs = np.concatenate([[0], np.cumsum(lens)])
        seg_of_pair, a, b = _triu_expand(lens)
        if len(seg_of_pair) == 0:
            return empty
        base = offs[seg_of_pair]
        pa_packed, pb_packed = packed[base + a], packed[base + b]
        ids_a, na = pa_packed >> _NBITS, pa_packed & ((1 << _NBITS) - 1)
        ids_b, nb = pb_packed >> _NBITS, pb_packed & ((1 << _NBITS) - 1)
        pair = (ids_a << 31) | ids_b
        nanb = (na << _NBITS) | nb
        upair, inv, cnt = np.unique(pair, return_inverse=True, return_counts=True)
        first = np.zeros(len(upair), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(pair) - 1, -1, -1)
        return pa.table(
            {"pair": pa.array(upair), "i": pa.array(cnt.astype(np.int64)),
             "nanb": pa.array(nanb[first])}
        )

    partials = (
        gram_ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gp")
        .map_groups(partition_pairs, batch_format="pyarrow")
    )

    def add_pp(batch: pa.Table) -> pa.Table:
        pair = batch.column("pair").to_numpy(zero_copy_only=False)
        return batch.append_column("pp", pa.array((np.abs(pair) % P_SHUF)))

    def finalize_partition(group: pa.Table) -> pa.Table:
        pair = group.column("pair").to_numpy(zero_copy_only=False).astype(np.int64)
        i = group.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        nanb = group.column("nanb").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pair, kind="stable")
        pair, i, nanb = pair[order], i[order], nanb[order]
        starts = np.flatnonzero(np.diff(pair, prepend=pair[0] - 1)) if len(pair) else np.array([], np.int64)
        if len(starts) == 0:
            return pa.table(
                {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                 out_col: pa.array([], pa.float64())}
            )
        isum = np.add.reduceat(i, starts)
        upair, unanb = pair[starts], nanb[starts]
        na = (unanb >> _NBITS).astype(np.float64)
        nb = (unanb & ((1 << _NBITS) - 1)).astype(np.float64)
        if measure == "jaccard":
            jac = isum.astype(np.float64) / (na + nb - isum)
        else:  # max containment: the smaller set's coverage
            jac = isum.astype(np.float64) / np.minimum(na, nb)
        hit = jac >= threshold
        return pa.table(
            {"doc_a": pa.array((upair >> 31)[hit]),
             "doc_b": pa.array((upair & ((1 << 31) - 1))[hit]),
             out_col: pa.array(jac[hit])}
        )

    return (
        partials.map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(finalize_partition, batch_format="pyarrow")
    )


# ------------------------------------------------- incremental LSH index
# A persisted near-dup index plus an increment probe: the production
# shape for "dedup today's crawl against the 100-TB corpus". The store
# holds the corpus's banded MinHash rows hash-partitioned on
# bkey % num_partitions; an increment computes its own band rows, reads
# ONLY the store partitions its bucket keys land in, verifies
# signature agreement in-bucket, and resolves survivors by connected
# components with the corpus docs pinned (an increment doc loses to ANY
# corpus doc in its component, and to the lowest-id increment doc in an
# all-new component). Cost is O(increment x bands + colliding bucket
# rows) — never a corpus pass, never base-base pair work (the kernel
# expands only base x new and new x new pairs). Reference analog: the
# probe loads only its partition's filter (src/main.cpp:120), applied
# to the near-dup index instead of the Bloom store.

_INC_OFFSET = np.int64(1) << np.int64(40)  # increment-id encoding for CC


def _minhash_manifest_path(store_path: str) -> str:
    import os

    return os.path.join(store_path, "manifest.json")


def load_minhash_store_manifest(store_path: str) -> dict:
    import json

    with open(_minhash_manifest_path(store_path)) as f:
        return json.load(f)


def build_minhash_store(
    docs: "Dataset",
    store_path: str,
    *,
    k: int = 3,
    num_perm: int = 128,
    threshold: float = 0.5,
    bands: int | None = None,
    max_bucket: int = 256,
    num_partitions: int = 64,
) -> dict:
    """One streaming pass: corpus → persisted banded-MinHash index.

    Layout: ``{store}/bands/bp={p}/part-base.parquet`` rows
    {bkey: uint64, doc_id: int64, sig: fsl<uint64, num_perm>}, manifest
    committed LAST (tmp + atomic replace), so a crashed build leaves no
    readable store. Rebuilds in place (full-refresh semantics — the
    incremental path is :func:`minhash_increment` with ``ingest_id``).
    """
    import json
    import os
    import shutil

    if bands is None:
        bands = pick_lsh_bands(num_perm, threshold)
    if num_perm % bands:
        raise ValueError("num_perm must divide into equal bands")
    P = int(num_partitions)

    if os.path.exists(store_path):
        shutil.rmtree(store_path)
    bands_dir = os.path.join(store_path, "bands")
    os.makedirs(bands_dir, exist_ok=True)

    band_rows = minhash_signatures(docs, k, num_perm).map_batches(
        _band_rows_fn(bands, num_perm // bands),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def add_bp(batch: pa.Table) -> pa.Table:
        bk = batch.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if len(ids) and (int(ids.min()) < 0
                         or int(ids.max()) >= _INC_OFFSET):
            raise ValueError(
                "corpus doc_id outside [0, 2^40) — minhash_increment's "
                "base/increment encoding would misclassify it")
        return batch.append_column(
            "bp", pa.array((bk % np.uint64(P)).astype(np.int32))
        )

    def write_partition(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        bp = int(g.column("bp")[0].as_py())
        d = os.path.join(bands_dir, f"bp={bp}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part-base.parquet")
        tmp = path + ".tmp"
        # deterministic row order inside the file (bkey, doc_id)
        bk = g.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        pq.write_table(g.drop_columns(["bp"]).take(pa.array(order)), tmp)
        os.replace(tmp, path)
        return pa.table({"bp": pa.array([bp], pa.int32()),
                         "n_rows": pa.array([g.num_rows], pa.int64())})

    parts = (
        band_rows.map_batches(add_bp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bp")
        .map_groups(write_partition, batch_format="pyarrow")
        .to_pandas()
    )
    manifest = {
        "algo": "minhash_lsh_store",
        "k": k, "num_perm": num_perm, "bands": bands,
        "threshold": threshold, "max_bucket": max_bucket,
        "num_partitions": P,
        "n_band_rows": int(parts["n_rows"].sum()) if len(parts) else 0,
        "ingests": [],
    }
    tmp = _minhash_manifest_path(store_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _minhash_manifest_path(store_path))
    return manifest


def _probe_pairs_fn(threshold: float, num_perm: int, max_bucket: int):
    """Partition kernel: mixed base+increment bucket rows → verified
    pairs on ENCODED ids (base = doc_id, increment = doc_id + 2^40).

    Expands base x new (cross) and new x new (triangular) pairs only —
    base x base work, the quadratic term at corpus scale, never
    happens. Per-class deterministic ``max_bucket`` cap (id-sorted)."""

    def fn(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"enc_a": pa.array([], pa.int64()), "enc_b": pa.array([], pa.int64()),
             "est_jaccard": pa.array([], pa.float64())}
        )
        n = group.num_rows
        if n < 2:
            return empty
        bkey = group.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        enc = group.column("enc").to_numpy(zero_copy_only=False).astype(np.int64)
        isnew = (enc >= _INC_OFFSET).astype(np.int8)
        sig_col = group.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        sig = np.asarray(sig_col.values).reshape(n, num_perm)
        order = np.lexsort((enc, isnew, bkey))
        bkey, enc, isnew, sig = bkey[order], enc[order], isnew[order], sig[order]
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (bkey[1:] == bkey[:-1]) & (enc[1:] == enc[:-1])
        bkey, enc, isnew, sig = bkey[~dup], enc[~dup], isnew[~dup], sig[~dup]
        n = len(enc)
        if n < 2:
            return empty
        starts = np.flatnonzero(np.diff(bkey, prepend=bkey[0] + np.uint64(1)))
        lens = np.diff(np.concatenate([starts, [n]]))
        seg_of = np.repeat(np.arange(len(starts)), lens)
        nn = np.add.reduceat(isnew.astype(np.int64), starts)
        nb = lens - nn
        # per-class positions; cap each class at max_bucket (id-sorted)
        pos = np.arange(n) - starts[seg_of]
        pos_class = np.where(isnew == 1, pos - nb[seg_of], pos)
        keep = pos_class < max_bucket
        enc, isnew, sig = enc[keep], isnew[keep], sig[keep]
        nbc = np.minimum(nb, max_bucket)
        nnc = np.minimum(nn, max_bucket)
        clens = nbc + nnc
        offs = np.concatenate([[0], np.cumsum(clens)])
        # cross pairs: every (base i, new j) per bucket
        cross = nbc * nnc
        ccum = np.concatenate([[0], np.cumsum(cross)])
        tc = int(ccum[-1])
        ia_list, ib_list = [], []
        if tc:
            seg = np.repeat(np.arange(len(cross)), cross)
            local = np.arange(tc, dtype=np.int64) - ccum[seg]
            i = local // nnc[seg]
            j = local - i * nnc[seg]
            ia_list.append(offs[seg] + i)
            ib_list.append(offs[seg] + nbc[seg] + j)
        # new-new pairs: triangular within the bucket's new block
        seg2, a2, b2 = _triu_expand(nnc)
        if len(seg2):
            base2 = offs[seg2] + nbc[seg2]
            ia_list.append(base2 + a2)
            ib_list.append(base2 + b2)
        if not ia_list:
            return empty
        ia = np.concatenate(ia_list)
        ib = np.concatenate(ib_list)
        CHUNK = 1 << 20
        out_a, out_b, out_e = [], [], []
        for lo in range(0, len(ia), CHUNK):
            ca, cb = ia[lo : lo + CHUNK], ib[lo : lo + CHUNK]
            est = (sig[ca] == sig[cb]).mean(axis=1)
            hit = est >= threshold
            out_a.append(enc[ca[hit]])
            out_b.append(enc[cb[hit]])
            out_e.append(est[hit])
        return pa.table(
            {"enc_a": pa.array(np.concatenate(out_a)),
             "enc_b": pa.array(np.concatenate(out_b)),
             "est_jaccard": pa.array(np.concatenate(out_e))}
        )

    return fn


def minhash_increment(
    new_docs: "Dataset",
    store_path: str,
    *,
    ingest_id: str | None = None,
) -> "pd.DataFrame":
    """Dedup an increment against a persisted :func:`build_minhash_store`
    index → {doc_id, keep, dup_of} for every increment doc (dup_of is
    the component representative when dropped — the matching corpus
    doc, or the surviving lower-id increment doc — and -1 when kept).

    Semantics (CC keep-set with the corpus pinned): an increment doc is
    dropped iff its near-dup component (over verified base-new and
    new-new pairs) contains any corpus doc, or a lower-id increment
    doc. Increment docs with < k tokens have no shingles and are
    trivially kept, matching the batch pipeline's convention.

    ``ingest_id`` (optional) appends the SURVIVORS' band rows to the
    store exactly once so the next increment deduplicates against them
    too. Replays with the same id are fully idempotent at ANY crash
    point: the probe excludes this ingest's own part files (so the
    result is computed against the pre-ingest store state), part
    writes are atomic overwrites, and the manifest — updated last —
    gates the append (already-recorded id = probe only, no rewrite).
    """
    import os

    import pandas as pd
    import ray.data

    from .graph import connected_components

    m = load_minhash_store_manifest(store_path)
    k, num_perm, bands = m["k"], m["num_perm"], m["bands"]
    threshold, max_bucket, P = m["threshold"], m["max_bucket"], m["num_partitions"]
    if ingest_id is not None:
        import re as _re

        # "base" would overwrite the corpus partition files; path
        # separators would escape the partition directory
        if ingest_id == "base" or not _re.fullmatch(
                r"[A-Za-z0-9][A-Za-z0-9_.\-]*", ingest_id):
            raise ValueError(
                f"invalid ingest_id {ingest_id!r}: must match "
                f"[A-Za-z0-9][A-Za-z0-9_.-]* and may not be 'base' "
                f"(reserved for the corpus partition files)")
    already_ingested = ingest_id is not None and ingest_id in [
        i["ingest_id"] for i in m.get("ingests", [])
    ]

    # no materialize: band_rows (below) is the single consumer and is
    # itself materialized — pinning the full signature set here only
    # held object-store memory and inserted a barrier
    sigs = minhash_signatures(new_docs, k, num_perm)
    band_rows = sigs.map_batches(
        _band_rows_fn(bands, num_perm // bands),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def add_bp_enc(batch: pa.Table) -> pa.Table:
        bk = batch.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and ids.min() < 0:
            raise ValueError("minhash_increment requires non-negative doc ids")
        if len(ids) and ids.max() >= _INC_OFFSET:
            raise ValueError(
                "increment doc_id >= 2^40 — the base/increment encoding "
                "(enc = id + 2^40) would be ambiguous")
        return pa.table(
            {"bkey": batch.column("bkey"),
             "enc": pa.array(ids + _INC_OFFSET),
             "sig": batch.column("sig"),
             "bp": pa.array((bk % np.uint64(P)).astype(np.int32))}
        )

    new_rows = band_rows.map_batches(
        add_bp_enc, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # partition pruning: each bp group's task reads ONLY its store
    # partition's files, in place (the corpus band rows are ALREADY
    # hash-partitioned on disk — routing them through a groupby would
    # re-shuffle ~bands x sig bytes of CORPUS data per increment; the
    # only shuffle left is of the increment's own rows). One store
    # partition must fit in a task heap: size num_partitions at build
    # time so corpus_band_rows / num_partitions stays heap-sized.
    uniq_bp = (
        new_rows.select_columns(["bp"]).unique("bp")
        if new_rows.count() else []
    )
    need_bp = sorted(int(b) for b in (uniq_bp or []))
    skip_file = f"part-{ingest_id}.parquet" if ingest_id is not None else None
    paths_by_bp: dict[int, list[str]] = {}
    for bp in need_bp:
        d = os.path.join(store_path, "bands", f"bp={bp}")
        if os.path.isdir(d):
            paths_by_bp[bp] = [
                os.path.join(d, f) for f in sorted(os.listdir(d))
                # a replay of THIS ingest id must probe the pre-ingest
                # store state: its own (possibly torn) part files are
                # excluded, so the result is identical no matter where
                # a crashed previous attempt stopped, and the rewrite
                # below is a safe overwrite
                if f.endswith(".parquet") and f != skip_file
            ]

    kernel = _probe_pairs_fn(threshold, num_perm, max_bucket)

    def probe_partition(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        bp = int(g.column("bp")[0].as_py())
        tbls = [g.select(["bkey", "enc", "sig"])]
        for p in paths_by_bp.get(bp, []):
            base = pq.read_table(p, columns=["bkey", "doc_id", "sig"])
            bids = base.column("doc_id").to_numpy(zero_copy_only=False)
            if len(bids) and int(bids.max()) >= _INC_OFFSET:
                raise ValueError(
                    f"store {p} holds doc_id >= 2^40 — it would decode "
                    f"as an increment row (base/increment encoding)")
            tbls.append(
                pa.table({"bkey": base.column("bkey"),
                          "enc": base.column("doc_id"),
                          "sig": base.column("sig")})
            )
        out = kernel(pa.concat_tables(tbls))
        if out.num_rows <= 1:
            return out
        # in-partition pair dedup (a pair re-verifies once per
        # colliding band; CC needs it once) — keep the max estimate
        ea = out.column("enc_a").to_numpy(zero_copy_only=False)
        eb = out.column("enc_b").to_numpy(zero_copy_only=False)
        est = out.column("est_jaccard").to_numpy(zero_copy_only=False)
        order = np.lexsort((-est, eb, ea))
        ea, eb, est = ea[order], eb[order], est[order]
        first = np.ones(len(ea), dtype=bool)
        first[1:] = (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])
        return pa.table(
            {"enc_a": pa.array(ea[first]), "enc_b": pa.array(eb[first]),
             "est_jaccard": pa.array(est[first])}
        )

    raw_pairs = (
        new_rows.groupby("bp")
        .map_groups(probe_partition, batch_format="pyarrow")
    ).materialize()

    # global pair dedup before CC: the same pair is re-found by every
    # band that collides (up to `bands` times, scattered across
    # partitions) — deduping keeps the CC edge list at the true pair
    # count instead of ~bands x it. Fixed-P pair-hash shuffle + a
    # vectorized unique kernel (Ray's multi-key aggregate machinery is
    # ~10x slower on this skinny-row shape, measured at 20x sf0.1).
    from ..functions.hashing import splitmix64

    def add_pp(batch: pa.Table) -> pa.Table:
        ea = batch.column("enc_a").to_numpy(zero_copy_only=False).astype(np.int64)
        eb = batch.column("enc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ea.view(np.uint64)) ^ splitmix64(~eb.view(np.uint64))
        return batch.append_column(
            "pp", pa.array((h % np.uint64(P)).astype(np.int32))
        )

    def unique_pairs(g: pa.Table) -> pa.Table:
        ea = g.column("enc_a").to_numpy(zero_copy_only=False)
        eb = g.column("enc_b").to_numpy(zero_copy_only=False)
        est = g.column("est_jaccard").to_numpy(zero_copy_only=False)
        order = np.lexsort((-est, eb, ea))
        ea, eb, est = ea[order], eb[order], est[order]
        first = np.ones(len(ea), dtype=bool)
        first[1:] = (ea[1:] != ea[:-1]) | (eb[1:] != eb[:-1])
        return pa.table(
            {"enc_a": pa.array(ea[first]), "enc_b": pa.array(eb[first]),
             "est_jaccard": pa.array(est[first])}
        )

    pairs = (
        raw_pairs.map_batches(add_pp, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("pp")
        .map_groups(unique_pairs, batch_format="pyarrow")
        .materialize()
        if raw_pairs.count()
        else raw_pairs
    )

    comp = connected_components(pairs, cols=("enc_a", "enc_b"))

    def to_drops(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False).astype(np.int64)
        cmp_ = t.column("comp").to_numpy(zero_copy_only=False).astype(np.int64)
        sel = (node >= int(_INC_OFFSET)) & (node != cmp_)
        node, cmp_ = node[sel], cmp_[sel]
        return pa.table(
            {"doc_id": pa.array(node - int(_INC_OFFSET)),
             "dup_of": pa.array(np.where(cmp_ >= int(_INC_OFFSET),
                                         cmp_ - int(_INC_OFFSET), cmp_))}
        )

    lab = comp.map_batches(
        to_drops, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if lab.empty:
        # Ray drops the schema of all-empty datasets through to_pandas
        lab = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                            "dup_of": pd.Series([], dtype=np.int64)})
    drops = lab
    all_ids = new_docs.select_columns(["doc_id"]).to_pandas()["doc_id"].astype(np.int64)
    out = pd.DataFrame({"doc_id": np.sort(all_ids.to_numpy())})
    out = out.merge(drops, on="doc_id", how="left")
    out["keep"] = out["dup_of"].isna()
    out["dup_of"] = out["dup_of"].fillna(-1).astype(np.int64)

    if ingest_id is not None and not already_ingested:
        _ingest_survivors(store_path, m, new_rows, out, ingest_id)
    return out[["doc_id", "keep", "dup_of"]]


def _ingest_survivors(store_path, manifest, new_rows, result, ingest_id) -> None:
    """Append survivors' band rows to the store partitions, exactly
    once (manifest records the ingest id; commit is manifest-last)."""
    import json
    import os

    import ray

    kept = set(result.loc[result["keep"], "doc_id"].astype(np.int64).tolist())
    kept_ref = ray.put(kept)

    def write_kept(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        ks = ray.get(kept_ref)
        bp = int(g.column("bp")[0].as_py())
        enc = g.column("enc").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = enc - int(_INC_OFFSET)
        sel = np.flatnonzero(np.isin(ids, np.fromiter(ks, dtype=np.int64,
                                                      count=len(ks))))
        if len(sel) == 0:
            return pa.table({"bp": pa.array([bp], pa.int32()),
                             "n_rows": pa.array([0], pa.int64())})
        bk = g.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)[sel]
        order = sel[np.lexsort((ids[sel], bk))]
        sub = pa.table(
            {"bkey": g.column("bkey").take(pa.array(order)),
             "doc_id": pa.array(ids[order]),
             "sig": g.column("sig").combine_chunks().take(pa.array(order))}
        )
        d = os.path.join(store_path, "bands", f"bp={bp}")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{ingest_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(sub, tmp)
        os.replace(tmp, path)
        return pa.table({"bp": pa.array([bp], pa.int32()),
                         "n_rows": pa.array([sub.num_rows], pa.int64())})

    counts = new_rows.groupby("bp").map_groups(
        write_kept, batch_format="pyarrow"
    ).to_pandas()
    manifest["ingests"].append(
        {"ingest_id": ingest_id, "n_band_rows": int(counts["n_rows"].sum())}
    )
    manifest["n_band_rows"] += int(counts["n_rows"].sum())
    tmp = _minhash_manifest_path(store_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _minhash_manifest_path(store_path))


def _wjac_plan(
    tf: "Dataset", *, dense_vocab_max: int, max_token_df: int,
    num_partitions: int,
):
    """Choose the exact weighted-Jaccard plan from token statistics.

    Returns ``("dense", vocab)`` — ``vocab`` a sorted int64 numpy
    array of every distinct token hash — when the vocabulary is small
    (≤ ``dense_vocab_max``) and no token's row count can exceed
    ``max_token_df`` (row count ≥ true df, so the check is
    conservative: the posting cap provably never bites and the two
    plans are bit-identical). Otherwise ``("posting", None)``.
    The dense-path vocab is O(dense_vocab_max) driver state — the
    grouped token table only materializes after the count gate.
    """
    from .agg import grouped_agg

    g = grouped_agg(
        tf, "th", {"df": ("count", "doc_id")}, num_partitions=num_partitions
    ).materialize()
    if g.count() > int(dense_vocab_max):
        return "posting", None
    import ray

    tabs = [t for t in ray.get(list(g.to_arrow_refs())) if t.num_rows]
    if not tabs:
        return "dense", np.empty(0, dtype=np.int64)
    t = pa.concat_tables(tabs)
    if pc.max(t.column("df")).as_py() > int(max_token_df):
        return "posting", None
    vocab = np.sort(t.column("th").to_numpy(zero_copy_only=False).astype(np.int64))
    return "dense", vocab


def _wjac_dense(
    tf: "Dataset", vocab: np.ndarray, *, tau: float, round_dp: int,
    max_blocks: int,
):
    """Dense tf-matrix block-nested exact weighted-Jaccard pairs.

    Docs become dense int64 tf vectors over the sorted ``vocab``
    (one doc-keyed shuffle of the skinny tf rows, which also
    collapses cross-batch partials); the corpus materializes once as
    ≤ ``max_blocks`` Arrow blocks; one task per unordered block pair
    computes Σmin / (sa + sb − Σmin) for every cross pair via chunked
    ``np.minimum`` broadcasting and emits only τ-qualifying rows.
    Bit-identical to the posting plan (same float64 division, same
    pre-round threshold) — pinned by tests.
    """
    import ray
    import ray.data

    V = int(len(vocab))
    NBP = 64

    def add_bp(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("bp", pa.array(doc % NBP))

    def densify(group: pa.Table) -> pa.Table:
        th = group.column("th").to_numpy(zero_copy_only=False).astype(np.int64)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(doc) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "v": pa.array([], pa.list_(pa.int64(), V)),
            })
        col = np.searchsorted(vocab, th)
        if not np.array_equal(vocab[col], th):  # loud: token outside vocab
            raise AssertionError("dense wjaccard: token hash not in vocab")
        udoc, row = np.unique(doc, return_inverse=True)
        M = np.zeros((len(udoc), V), dtype=np.int64)
        np.add.at(M, (row, col), cnt)  # sums cross-batch partials
        vec = pa.FixedSizeListArray.from_arrays(
            pa.array(M.reshape(-1), pa.int64()), V
        )
        return pa.table({"doc_id": pa.array(udoc), "v": vec})

    mat = (
        tf.map_batches(add_bp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bp")
        .map_groups(densify, batch_format="pyarrow")
        .materialize()
    )
    if mat.num_blocks() > max_blocks:
        mat = mat.repartition(max_blocks).materialize()
    refs = list(mat.to_arrow_refs())
    nb = len(refs)
    refs_ref = ray.put(refs)
    ij = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
         "wjaccard": pa.array([], pa.float64())}
    )

    class BlockPair:
        def __init__(self):
            self.refs = ray.get(refs_ref)
            self._cache: dict = {}

        def _block(self, i: int):
            if i not in self._cache:
                if len(self._cache) > 2:
                    self._cache.clear()
                t: pa.Table = ray.get(self.refs[i])
                if t.num_rows == 0 or "doc_id" not in t.column_names:
                    # schemaless empty groupby output block
                    z = np.empty(0, dtype=np.int64)
                    self._cache[i] = (z, np.empty((0, 1), dtype=np.int64), z)
                    return self._cache[i]
                ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
                arr = t.column("v")
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                M = np.asarray(arr.flatten(), dtype=np.int64).reshape(
                    len(ids), arr.type.list_size
                )
                self._cache[i] = (ids, M, M.sum(axis=1))
            return self._cache[i]

        def __call__(self, batch: pa.Table) -> pa.Table:
            outs = []
            for i, j in zip(
                batch.column("i").to_pylist(), batch.column("j").to_pylist()
            ):
                ai, Mi, si = self._block(int(i))
                aj, Mj, sj = self._block(int(j))
                if len(ai) == 0 or len(aj) == 0:
                    continue
                Vd = Mi.shape[1]
                chunk = max(1, (1 << 22) // max(1, len(aj) * max(1, Vd)))
                for s in range(0, len(ai), chunk):
                    e = min(s + chunk, len(ai))
                    inter = np.minimum(Mi[s:e, None, :], Mj[None, :, :]).sum(axis=2)
                    wj = inter / (si[s:e, None] + sj[None, :] - inter)
                    mask = wj >= tau
                    rr, cc = np.nonzero(mask)
                    if int(i) == int(j):
                        # each unordered within-block pair once; ids
                        # in a block are unique so position order works
                        keep = (s + rr) < cc
                        rr, cc = rr[keep], cc[keep]
                    if len(rr) == 0:
                        continue
                    a, b = ai[s + rr], aj[cc]
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    outs.append(pa.table({
                        "doc_a": pa.array(lo), "doc_b": pa.array(hi),
                        "wjaccard": pa.array(_half_up(wj[rr, cc], round_dp)),
                    }))
            if not outs:
                return empty
            return pa.concat_tables(outs)

    return ray.data.from_items(ij).map_batches(
        BlockPair, batch_format="pyarrow", batch_size=1, concurrency=8
    )


def weighted_jaccard_pairs(
    docs: "Dataset",
    *,
    tau: float = 0.3,
    max_token_df: int = 4096,
    num_partitions: int = 64,
    round_dp: int = 6,
    dense_vocab_max: int = 4096,
    max_blocks: int = 32,
) -> "Dataset":
    """EXACT tf-weighted (generalized) Jaccard near-dup pairs →
    ``{doc_a, doc_b, wjaccard}`` with ``doc_a < doc_b`` and
    ``wJ = Σ min(tf_a, tf_b) / Σ max(tf_a, tf_b) >= tau``.

    Weighted Jaccard is the right measure when documents repeat
    boilerplate tokens — set Jaccard saturates, tf-weighting does not
    (for integer tf it equals plain Jaccard over occurrence-expanded
    multisets; ICWS [Ioffe 2010] is the real-valued generalization).

    Two exact plans, chosen by the corpus's token statistics:

    * **Packed-posting** (default; the web-scale shape) — the same
      join-free plan as the exact n-gram kernel, with counts:
      per-batch (doc, token, tf) partials → token-hash fixed-P
      partitions collapse cross-batch partials and expand per-token
      posting pairs with contribution ``min(tf_a, tf_b)`` (posting
      lists doc-sorted and capped at ``max_token_df`` — the
      deterministic high-DF guard; stopword-dominated pairs are the
      quadratic term at corpus scale); a pair-keyed fixed-P fold sums
      intersections; two skinny hash-joins attach the per-doc
      total-tf sizes (denominator ``wa + wb - inter``). Text never
      shuffles — only (hash, id, count) rows. Cost is Σ_t df_t², so
      a DEGENERATE small vocabulary (every token near-universal)
      explodes it: V tokens × df≈n docs ⇒ V·n²/2 posting pairs.

    * **Dense tf-matrix block-nested self-join** — taken
      automatically when the distinct-token count ≤
      ``dense_vocab_max`` AND no token's df exceeds ``max_token_df``
      (so the cap provably never bites and both plans are
      bit-identical). Docs become dense int64 tf vectors over the
      sorted vocab; the corpus materializes once as ≤ ``max_blocks``
      Arrow blocks; one task per unordered block pair computes
      Σmin / (sa + sb − Σmin) for all cross pairs with chunked
      ``np.minimum`` broadcasting and emits only the τ-qualifying
      rows — no pair-partial shuffle at all (the 193M-row exchange
      the posting plan pays on a 31-token corpus disappears).

    Both plans produce identical rows (order differs; consumers
    sort). ``_wjac_plan`` exposes the choice for tests.
    """
    from .agg import grouped_agg

    P = int(num_partitions)
    TAU = float(tau)

    def tf_rows(batch: pa.Table) -> pa.Table:
        from ..stages.text import flat_nonempty_with_offsets

        flat, offs = flat_nonempty_with_offsets(batch, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        if len(flat) == 0:
            return pa.table(
                {"th": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        th = hash_strings(flat).view(np.int64)
        doc = np.repeat(ids, counts)
        key = np.stack([doc, th], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        if uniq[:, 0].size and not (
            0 <= uniq[:, 0].min() and uniq[:, 0].max() < (1 << 31)
        ):
            raise ValueError("doc_id out of [0, 2^31) — pair packing would corrupt")
        return pa.table(
            {"th": pa.array(uniq[:, 1]), "doc_id": pa.array(uniq[:, 0]),
             "cnt": pa.array(cnt.astype(np.int64))}
        )

    tf = docs.map_batches(
        tf_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    plan, vocab = _wjac_plan(
        tf, dense_vocab_max=dense_vocab_max, max_token_df=max_token_df,
        num_partitions=P,
    )
    if plan == "dense":
        return _wjac_dense(
            tf, vocab, tau=TAU, round_dp=round_dp, max_blocks=max_blocks
        )

    from .join import hash_join

    sizes = grouped_agg(tf, "doc_id", {"wsz": ("sum", "cnt")}, num_partitions=P)

    def add_tp(batch: pa.Table) -> pa.Table:
        th = batch.column("th").to_numpy(zero_copy_only=False)
        return batch.append_column("tp", pa.array(np.abs(th) % P))

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pair": pa.array([], pa.int64()), "i": pa.array([], pa.int64())}
        )
        th = group.column("th").to_numpy(zero_copy_only=False).astype(np.int64)
        doc = group.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = group.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        # collapse cross-batch partials: sum cnt per (token, doc)
        order = np.lexsort((doc, th))
        th, doc, cnt = th[order], doc[order], cnt[order]
        new = np.empty(len(th), dtype=bool)
        if len(th) == 0:
            return empty
        new[0] = True
        new[1:] = (th[1:] != th[:-1]) | (doc[1:] != doc[:-1])
        starts = np.flatnonzero(new)
        cnt = np.add.reduceat(cnt, starts)
        th, doc = th[starts], doc[starts]
        # per-token posting segments (doc-sorted), capped
        seg_starts = np.flatnonzero(np.diff(th, prepend=th[0] - 1))
        lens = np.diff(np.concatenate([seg_starts, [len(th)]]))
        pos = np.arange(len(th)) - np.repeat(seg_starts, lens)
        keep = pos < max_token_df
        doc, cnt = doc[keep], cnt[keep]
        lens = np.minimum(lens, max_token_df)
        offs = np.concatenate([[0], np.cumsum(lens)])
        seg_of_pair, a, b = _triu_expand(lens)
        if len(seg_of_pair) == 0:
            return empty
        base = offs[seg_of_pair]
        da, db = doc[base + a], doc[base + b]
        contrib = np.minimum(cnt[base + a], cnt[base + b])
        pair = (da << 31) | db  # postings doc-sorted => da < db
        # partial per-pair fold: one sort + reduceat (int64-exact and
        # far faster than unique(return_inverse) + np.add.at)
        order2 = np.argsort(pair, kind="stable")
        ps, cs = pair[order2], contrib[order2]
        starts2 = np.flatnonzero(np.diff(ps, prepend=ps[0] - 1))
        upair = ps[starts2]
        isum = np.add.reduceat(cs, starts2)
        return pa.table({"pair": pa.array(upair), "i": pa.array(isum)})

    partials = (
        tf.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(partition_pairs, batch_format="pyarrow")
    )

    inter = grouped_agg(partials, "pair", {"inter": ("sum", "i")},
                        num_partitions=P)

    def unpack(t: pa.Table) -> pa.Table:
        pair = t.column("pair").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"doc_a": pa.array(pair >> 31),
             "doc_b": pa.array(pair & ((1 << 31) - 1)),
             "inter": t.column("inter")}
        )

    pairs = inter.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True)

    def ren(c_old: str, c_new: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [c_new if c == c_old else c for c in t.column_names]
            )
        return fn

    sa = sizes.map_batches(ren("doc_id", "doc_a"), batch_format="pyarrow",
                           zero_copy_batch=True)
    sb = sizes.map_batches(ren("doc_id", "doc_b"), batch_format="pyarrow",
                           zero_copy_batch=True)
    sb = sb.map_batches(ren("wsz", "wsz_b"), batch_format="pyarrow",
                        zero_copy_batch=True)
    j = hash_join(pairs, sa, on="doc_a", broadcast="auto", num_partitions=P)
    j = hash_join(j, sb, on="doc_b", broadcast="auto", num_partitions=P)

    def finish(t: pa.Table) -> pa.Table:
        i = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        wa = t.column("wsz").to_numpy(zero_copy_only=False).astype(np.float64)
        wb = t.column("wsz_b").to_numpy(zero_copy_only=False).astype(np.float64)
        wj = i / (wa + wb - i)
        keep = wj >= TAU
        return pa.table(
            {"doc_a": t.column("doc_a").filter(pa.array(keep)),
             "doc_b": t.column("doc_b").filter(pa.array(keep)),
             "wjaccard": pa.array(_half_up(wj[keep], round_dp))}
        )

    return j.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def pair_provenance(
    docs: "Dataset",
    *,
    k: int = 3,
    threshold: float = 0.5,
    source_col: str = "source",
    round_dp: int = 6,
) -> "Dataset":
    """Near-dup PROVENANCE matrix → ``{source_a, source_b, n_pairs,
    mean_jaccard}`` (source_a <= source_b lexicographically): which
    sources copy from which — the "is crawl X mirroring crawl Y?"
    audit every multi-source corpus assembly needs before mixing
    weights are chosen.

    Composition of proven parts: exact word-k-gram Jaccard pairs
    (:func:`ngram_jaccard_pairs`, join-free posting kernel), two
    skinny doc-keyed hash joins attach the endpoints' sources
    (broadcast="auto" at fixture size, co-partitioned at scale), one
    normalized (source_a, source_b)-keyed fold. Pairs stream —
    nothing corpus-sized materializes; output is O(sources²) rows.
    ``mean_jaccard`` averages pair scores QUANTIZED to int64 at 1e-6
    half-away-from-zero (the repo's exactness convention: the int sum
    is partition-invariant and the SQL mirror — ``TRUNC(j*1e6+0.5)``
    — reproduces it bit-for-bit).
    """
    from .agg import grouped_agg
    from .join import hash_join

    pairs = ngram_jaccard_pairs(docs, k=k, threshold=threshold)
    src = docs.select_columns(["doc_id", source_col])

    def ren(old: str, new: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.rename_columns(
                [new if c == old else c for c in t.column_names]
            )
        return fn

    sa = src.map_batches(ren("doc_id", "doc_a"), batch_format="pyarrow",
                         zero_copy_batch=True)
    sa = sa.map_batches(ren(source_col, "sa"), batch_format="pyarrow",
                        zero_copy_batch=True)
    sb = src.map_batches(ren("doc_id", "doc_b"), batch_format="pyarrow",
                         zero_copy_batch=True)
    sb = sb.map_batches(ren(source_col, "sb"), batch_format="pyarrow",
                        zero_copy_batch=True)
    j = hash_join(pairs, sa, on="doc_a", broadcast="auto")
    j = hash_join(j, sb, on="doc_b", broadcast="auto")

    def norm(t: pa.Table) -> pa.Table:
        a = t.column("sa").to_numpy(zero_copy_only=False)
        b = t.column("sb").to_numpy(zero_copy_only=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        jac = t.column("jaccard").to_numpy(zero_copy_only=False)
        jq = np.floor(jac * 1e6 + 0.5).astype(np.int64)  # jaccard > 0
        return pa.table({
            "source_a": pa.array(lo, pa.string()),
            "source_b": pa.array(hi, pa.string()),
            "j": pa.array(jq),
        })

    g = grouped_agg(
        j.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True),
        ["source_a", "source_b"],
        {"n_pairs": ("count", "j"), "jsum": ("sum", "j")},
        num_partitions=16,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_pairs").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("jsum").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "source_a": t.column("source_a"),
            "source_b": t.column("source_b"),
            "n_pairs": t.column("n_pairs"),
            "mean_jaccard": pa.array(s / n / 1e6),
        })

    return g.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _wjac_tf_rows_fn(text_col: str = "text"):
    """batch → per-batch (doc_id, token-hash, tf) partials {doc_id,
    th, c} — the skinny weighted-feature rows both weighted-Jaccard
    plans and the LSH verifier consume (a doc spanning batches ships
    split partials; consumers SUM per (doc_id, th) before use)."""

    def fn(batch: pa.Table) -> pa.Table:
        from ..stages.text import flat_nonempty_with_offsets

        flat, offs = flat_nonempty_with_offsets(batch, text_col)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "th": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64())}
            )
        th = hash_strings(flat).view(np.int64)
        doc = np.repeat(ids, counts)
        key = np.stack([doc, th], axis=1)
        uniq, cnt = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {"doc_id": pa.array(uniq[:, 0]), "th": pa.array(uniq[:, 1]),
             "c": pa.array(cnt.astype(np.int64))}
        )

    return fn


# ---------------------------------------------------- ICWS weighted MinHash
def make_icws_fn(
    num_hashes: int = 128, seed: int = 0,
    text_col: str = "text", id_col: str = "doc_id",
):
    """batch → {doc_id, sig: fixed_size_list<uint64>[num_hashes]} of
    ICWS weighted-MinHash components (Ioffe 2010, "Improved Consistent
    Sampling, Weighted Minhash and L1 Sketching"): two documents'
    components collide with probability EXACTLY their tf-weighted
    Jaccard, the way plain MinHash components collide with set
    Jaccard — the sub-quadratic candidate generator for
    :func:`weighted_jaccard_pairs`' measure.

    Per hash k, feature g with weight w ≥ 1: r, c ~ Gamma(2,1) and
    β ~ U(0,1] derive purely from splitmix64(g ⊕ seed_k,i) (nothing
    ships, any partitioning reproduces them); t = ⌊ln w / r + β⌋,
    ln a = ln c − r(t − β) − r; the doc's component is the argmin-a
    feature packed with its t (ties break to the lowest feature hash
    — a total order, so the argmin is deterministic even on float
    ties). All draws/argmins are vectorized per batch with two
    ``minimum.reduceat`` passes per hash; docs with no tokens are
    dropped (they cannot near-duplicate anything).
    """
    S = int(num_hashes)
    base = splitmix64(
        np.arange(S * 6, dtype=UINT64) * UINT64(0x9E3779B97F4A7C15)
        ^ UINT64(seed * 0x10001 + 1)
    )
    TWO53 = float(1 << 53)

    def _u(th: np.ndarray, b: np.uint64) -> np.ndarray:
        return ((splitmix64(th ^ b) >> UINT64(11)).astype(np.float64) + 1.0) / TWO53

    def fn(batch: pa.Table) -> pa.Table:
        from ..stages.text import flat_nonempty_with_offsets

        sig_t = pa.list_(pa.uint64(), S)
        ids_col = batch.column(id_col)
        if isinstance(ids_col, pa.ChunkedArray):
            ids_col = ids_col.combine_chunks()
        flat, offs = flat_nonempty_with_offsets(batch, text_col)
        counts = np.diff(offs)
        if len(flat) == 0:
            return pa.table({id_col: ids_col.slice(0, 0),
                             "sig": pa.array([], sig_t)})
        th_all = hash_strings(flat)  # uint64
        row_all = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # distinct (row, token) with tf counts, (row, th)-sorted
        order = np.lexsort((th_all, row_all))
        rows_s, th_s = row_all[order], th_all[order]
        new = np.empty(len(rows_s), dtype=bool)
        new[0] = True
        new[1:] = (rows_s[1:] != rows_s[:-1]) | (th_s[1:] != th_s[:-1])
        starts = np.flatnonzero(new)
        cnt = np.diff(np.concatenate([starts, [len(rows_s)]]))
        rows_d, th_d = rows_s[starts], th_s[starts]
        seg_starts = np.flatnonzero(np.diff(rows_d, prepend=-1))
        docs_present = rows_d[seg_starts]
        nseg = len(seg_starts)
        seg_lens = np.diff(np.concatenate([seg_starts, [len(rows_d)]]))
        seg_of = np.repeat(np.arange(nseg, dtype=np.int64), seg_lens)
        rowpos = np.arange(len(rows_d), dtype=np.int64)
        lnw = np.log(cnt.astype(np.float64))
        sig = np.empty((nseg, S), dtype=UINT64)
        for k in range(S):
            u0 = _u(th_d, base[6 * k + 0])
            u1 = _u(th_d, base[6 * k + 1])
            r = np.maximum(-np.log(u0 * u1), 1e-12)  # Gamma(2,1), clipped
            u2 = _u(th_d, base[6 * k + 2])
            u3 = _u(th_d, base[6 * k + 3])
            c = np.maximum(-np.log(u2 * u3), 1e-300)
            beta = _u(th_d, base[6 * k + 4])
            t = np.floor(lnw / r + beta)
            lna = np.log(c) - r * (t - beta) - r
            m = np.minimum.reduceat(lna, seg_starts)
            first = np.minimum.reduceat(
                np.where(lna == m[seg_of], rowpos, np.iinfo(np.int64).max),
                seg_starts,
            )
            t_sel = t[first].astype(np.int64).astype(UINT64)
            sig[:, k] = splitmix64(
                th_d[first] ^ splitmix64(t_sel ^ base[6 * k + 5])
            )
        return pa.table({
            id_col: ids_col.take(pa.array(docs_present, pa.int64())),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1)), S
            ),
        })

    return fn


def icws_signatures(
    ds: "Dataset", *, num_hashes: int = 128, seed: int = 0,
    text_col: str = "text",
) -> "Dataset":
    return ds.map_batches(
        make_icws_fn(num_hashes, seed, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def weighted_dup_pairs_lsh(
    docs: "Dataset",
    *,
    tau: float = 0.3,
    num_hashes: int = 128,
    bands: int | None = None,
    seed: int = 0,
    est_margin: float = 0.15,
    max_bucket: int = 4096,
    num_partitions: int = 64,
    round_dp: int = 6,
) -> "Dataset":
    """Sub-quadratic tf-weighted Jaccard near-dup pairs → ``{doc_a,
    doc_b, wjaccard}`` (EXACT scores on LSH candidates) — the
    100-TB path for :func:`weighted_jaccard_pairs`' measure, which is
    inherently Σdf² / O(n²) in exact form.

    Three stages, each bounded: (1) ICWS signatures (collision prob
    per component = weighted Jaccard exactly — Ioffe 2010), banded
    into buckets by the SAME machinery as MinHash-LSH (band rows
    carry signatures; bucket-pair expansion capped at ``max_bucket``
    doc-sorted); candidates keep an in-bucket signature-agreement
    estimate ≥ ``tau − est_margin`` (est sd = √(J(1−J)/S) ≈ 0.044 at
    S=128, so the margin costs ~0 recall and prunes far-below-τ
    noise). (2) EXACT verification of the deduped candidate list:
    two candidate-bounded hash joins against the per-doc tf table
    (composite (doc, token) key on the right side) sum
    min(tf_a, tf_b) per pair; (3) two skinny size joins finish
    wJ = i/(wa+wb−i) ≥ τ — precision is exact by construction,
    recall is the banding s-curve (tunable via ``bands``). Text never
    shuffles; nothing corpus-quadratic materializes.
    """
    from .agg import grouped_agg
    from .join import hash_join

    S = int(num_hashes)
    B = bands if bands is not None else pick_lsh_bands(S, float(tau))
    if S % B:
        raise ValueError(
            f"num_hashes ({S}) must divide into equal bands ({B}) — "
            f"same contract as minhash_lsh_pairs")
    rpb = S // B
    P = int(num_partitions)

    sigs = icws_signatures(docs, num_hashes=S, seed=seed)
    band_rows = sigs.map_batches(
        _band_rows_fn(B, rpb), batch_format="pyarrow", zero_copy_batch=True
    )

    def add_bp(t: pa.Table) -> pa.Table:
        bk = t.column("bkey").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("bp", pa.array((bk % np.uint64(P)).astype(np.int64)))

    cand = (
        band_rows.map_batches(add_bp, batch_format="pyarrow",
                              zero_copy_batch=True)
        .groupby("bp")
        .map_groups(
            _partition_bucket_pairs_fn(
                max(0.0, float(tau) - float(est_margin)), S, max_bucket
            ),
            batch_format="pyarrow",
        )
    )
    # dedupe candidates across buckets/bands
    cand = grouped_agg(
        cand, ["doc_a", "doc_b"], {"nb": ("count", "est_jaccard")},
        num_partitions=P,
    ).select_columns(["doc_a", "doc_b"])

    # exact verification against the per-doc tf table
    tf = grouped_agg(
        docs.map_batches(_wjac_tf_rows_fn("text"), batch_format="pyarrow",
                         zero_copy_batch=True),
        ["doc_id", "th"], {"cnt": ("sum", "c")}, num_partitions=P,
    ).materialize()
    sizes = grouped_agg(tf, "doc_id", {"wsz": ("sum", "cnt")},
                        num_partitions=P)

    def ren(pairs_):
        def fn(t: pa.Table) -> pa.Table:
            names = [dict(pairs_).get(c, c) for c in t.column_names]
            return t.rename_columns(names)
        return fn

    ta = tf.map_batches(ren([("doc_id", "doc_a"), ("cnt", "ca")]),
                        batch_format="pyarrow", zero_copy_batch=True)
    tb = tf.map_batches(ren([("doc_id", "doc_b"), ("cnt", "cb")]),
                        batch_format="pyarrow", zero_copy_batch=True)
    j1 = hash_join(cand, ta, on="doc_a", broadcast="auto", num_partitions=P)
    j2 = hash_join(j1, tb, on=["doc_b", "th"], broadcast="auto",
                   num_partitions=P)

    def add_min(t: pa.Table) -> pa.Table:
        ca = t.column("ca").to_numpy(zero_copy_only=False)
        cb = t.column("cb").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": t.column("doc_a"), "doc_b": t.column("doc_b"),
            "m": pa.array(np.minimum(ca, cb).astype(np.int64)),
        })

    inter = grouped_agg(
        j2.map_batches(add_min, batch_format="pyarrow", zero_copy_batch=True),
        ["doc_a", "doc_b"], {"inter": ("sum", "m")}, num_partitions=P,
    )
    sa = sizes.map_batches(ren([("doc_id", "doc_a"), ("wsz", "wa")]),
                           batch_format="pyarrow", zero_copy_batch=True)
    sb = sizes.map_batches(ren([("doc_id", "doc_b"), ("wsz", "wb")]),
                           batch_format="pyarrow", zero_copy_batch=True)
    out = hash_join(inter, sa, on="doc_a", broadcast="auto", num_partitions=P)
    out = hash_join(out, sb, on="doc_b", broadcast="auto", num_partitions=P)

    TAU = float(tau)

    def finish(t: pa.Table) -> pa.Table:
        i = t.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        wa = t.column("wa").to_numpy(zero_copy_only=False).astype(np.float64)
        wb = t.column("wb").to_numpy(zero_copy_only=False).astype(np.float64)
        wj = i / (wa + wb - i)
        keep = wj >= TAU
        return pa.table({
            "doc_a": t.column("doc_a").filter(pa.array(keep)),
            "doc_b": t.column("doc_b").filter(pa.array(keep)),
            "wjaccard": pa.array(_half_up(wj[keep], round_dp)),
        })

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- content-defined chunking
_GEAR = splitmix64(np.arange(1, 257, dtype=UINT64))
_CDC_B = UINT64(0x9E3779B97F4A7C15)
_CDC_BINV = UINT64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _cdc_chunker_fn(min_size: int, avg_bits: int, max_size: int, P: int):
    """batch → one skinny row per content-defined chunk:
    {cp, chash, clen, okey, source}.

    Gear CDC (Xia et al. 2016, FastCDC's base rolling hash): the gear
    hash h_i = (h_{i-1} << 1) + gear[b_i] mod 2^64 iterated from the
    DOC start (no reset at chunk cuts — h only ever depends on the
    last 64 bytes, so the iteration and the windowed form coincide);
    position i is a cut candidate when (h_i & (2^avg_bits − 1)) == 0.
    Greedy selection: the next cut is the first candidate giving
    chunk length ≥ min_size, forced at max_size, and the doc tail is
    always its own final chunk. Only the low avg_bits+1 shifted
    gear terms can touch the masked bits, so the candidate mask is
    avg_bits+1 vectorized shifted adds — never a per-byte loop; the
    greedy cut selection vectorizes ACROSS docs and loops only over
    the chunk ordinal (≤ doc_len/min_size rounds per batch).

    Chunk identity: splitmix64 of the content polynomial
    Σ (b_t+1)·B^(len−1−t) mod 2^64, evaluated for all chunks at once
    from one modular prefix sum (B odd ⇒ invertible; range hash =
    B^(r−1)·(S_r − S_l)). Identity is (chash, clen); production would
    byte-verify groups — documented 64-bit-collision trade.
    """
    from .lm import _flat_utf8

    mask = UINT64((1 << avg_bits) - 1)

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if texts.null_count:
            texts = pc.fill_null(texts, "")
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        src = t.column("source")
        data, offs = _flat_utf8(texts)
        flat = data[offs[0]: offs[-1]].astype(UINT64)
        offs0 = offs - offs[0]
        nrows = len(offs0) - 1
        lens = np.diff(offs0)
        N = len(flat)
        empty = pa.table({
            "cp": pa.array([], pa.int64()), "chash": pa.array([], pa.int64()),
            "clen": pa.array([], pa.int64()), "okey": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
        })
        if N == 0:
            return empty
        if int(lens.max()) >= (1 << 21) or (len(ids) and ids.max() >= (1 << 42)):
            raise ValueError("doc too long / id too large for okey encoding")
        g = _GEAR[flat.astype(np.int64)]
        row_of = np.repeat(np.arange(nrows, dtype=np.int64), lens)
        pos = np.arange(N, dtype=np.int64) - offs0[:-1][row_of]
        # low-bit gear accumulator: only shifts <= avg_bits survive & mask
        acc = np.zeros(N, dtype=UINT64)
        with np.errstate(over="ignore"):
            for j in range(min(avg_bits + 1, int(lens.max()))):
                m = pos[j:] >= j
                contrib = (g[: N - j] << UINT64(j))
                tgt = acc[j:]
                tgt[m] += contrib[m]
                acc[j:] = tgt
        cand_pos = np.flatnonzero((acc & mask) == UINT64(0))
        # greedy cuts, vectorized across docs per chunk ordinal
        starts = offs0[:-1].astype(np.int64).copy()
        ends = offs0[1:].astype(np.int64)
        rows_all, cs_all, ce_all = [], [], []
        act = np.flatnonzero(starts < ends)
        while len(act):
            s, e = starts[act], ends[act]
            limit = np.minimum(s + max_size - 1, e - 1)
            lo = np.searchsorted(cand_pos, s + min_size - 1, side="left")
            c = np.where(lo < len(cand_pos),
                         cand_pos[np.minimum(lo, len(cand_pos) - 1)],
                         np.int64(1) << 62)
            cut = np.where(c <= limit, c, limit)
            rows_all.append(act)
            cs_all.append(s)
            ce_all.append(cut)
            starts[act] = cut + 1
            act = act[cut + 1 < e]
        rows = np.concatenate(rows_all)
        cs = np.concatenate(cs_all)
        ce = np.concatenate(ce_all)
        # polynomial range hashes from one modular prefix scan
        with np.errstate(over="ignore"):
            binv_pow = np.concatenate(
                [[UINT64(1)], np.cumprod(np.full(N - 1, _CDC_BINV, dtype=UINT64))]
            ) if N > 1 else np.array([1], dtype=UINT64)
            b_pow = np.concatenate(
                [[UINT64(1)], np.cumprod(np.full(N - 1, _CDC_B, dtype=UINT64))]
            ) if N > 1 else np.array([1], dtype=UINT64)
            S = np.zeros(N + 1, dtype=UINT64)
            S[1:] = np.cumsum((flat + UINT64(1)) * binv_pow)
            chash = splitmix64(b_pow[ce] * (S[ce + 1] - S[cs]))
        clen = ce - cs + 1
        coff = cs - offs0[:-1][rows]
        okey = ids[rows] * (np.int64(1) << 21) + coff
        cp = (splitmix64(chash ^ UINT64(0xA24BAED4963EE407)) % UINT64(P)).astype(np.int64)
        return pa.table({
            "cp": pa.array(cp), "chash": pa.array(chash.view(np.int64)),
            "clen": pa.array(clen), "okey": pa.array(okey),
            "source": src.take(pa.array(rows, pa.int64())),
        })

    return fn


def _cdc_partition_fold(t: pa.Table) -> pa.Table:
    """One chash partition → per-source partial stats. All instances
    of a chunk co-locate here, so the owner (min okey) and the dup
    flags of every instance are exact within the task."""
    chash = t.column("chash").to_numpy(zero_copy_only=False)
    clen = t.column("clen").to_numpy(zero_copy_only=False)
    okey = t.column("okey").to_numpy(zero_copy_only=False)
    src = t.column("source").dictionary_encode().combine_chunks()
    codes = np.asarray(src.indices, dtype=np.int64)
    labels = src.dictionary.to_pylist()
    order = np.lexsort((okey, clen, chash))
    ch, cl, ok, cd = chash[order], clen[order], okey[order], codes[order]
    new = np.ones(len(ch), dtype=bool)
    new[1:] = (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])
    # owner instance = first of each (chash, clen) run (min okey)
    dup = ~new
    nsrc = len(labels)
    out = pa.table({
        "source": pa.array(labels, pa.string()),
        "n_chunks": pa.array(np.bincount(cd, minlength=nsrc).astype(np.int64)),
        "bytes_total": pa.array(np.bincount(cd, weights=cl, minlength=nsrc).astype(np.int64)),
        "n_dup_chunks": pa.array(np.bincount(cd[dup], minlength=nsrc).astype(np.int64)),
        "bytes_dup": pa.array(np.bincount(cd[dup], weights=cl[dup], minlength=nsrc).astype(np.int64)),
    })
    return out


def cdc_chunk_stats(
    read_docs,
    *,
    min_size: int = 16,
    avg_bits: int = 5,
    max_size: int = 128,
    num_partitions: int = 64,
):
    """Content-defined-chunking dedup audit → per-source
    {source, n_chunks, bytes_total, n_dup_chunks, bytes_dup}.

    The storage-level dedup the crawl cache / WARC store runs: CDC
    boundaries survive insertions (a byte edit moves only the chunks
    it touches, unlike fixed-size blocks), so shared chunks measure
    byte-level redundancy ACROSS near-identical documents that exact
    doc-hash dedup cannot see. A chunk instance is a duplicate when an
    identical chunk (same content hash + length) occurs earlier in
    (doc_id, offset) order anywhere in the corpus; bytes_dup is the
    storage a chunk store would save.

    Scale shape: the chunker is map-only (text never shuffles; one
    skinny ~40-byte row per chunk); dedup is ONE fixed-P shuffle of
    those rows on an independent splitmix re-mix of the content hash
    (partition-correlation gotcha) + a per-partition vectorized fold;
    the driver folds O(P × sources) partials. Reference analog: the
    same-shard invariant of minimizer routing
    (``src/SkmerExtractor.cpp:164``) — identical content
    deterministically co-locates.
    """
    import pandas as pd

    ds = read_docs().map_batches(
        _cdc_chunker_fn(min_size, avg_bits, max_size, num_partitions),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    parts = ds.groupby("cp").map_groups(
        lambda t: _cdc_partition_fold(t.drop_columns(["cp"])),
        batch_format="pyarrow",
    ).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "n_chunks": pd.Series([], dtype=np.int64),
            "bytes_total": pd.Series([], dtype=np.int64),
            "n_dup_chunks": pd.Series([], dtype=np.int64),
            "bytes_dup": pd.Series([], dtype=np.int64),
        })
    out = (parts.groupby("source", as_index=False)
           [["n_chunks", "bytes_total", "n_dup_chunks", "bytes_dup"]].sum()
           .sort_values("source").reset_index(drop=True))
    for c in ("n_chunks", "bytes_total", "n_dup_chunks", "bytes_dup"):
        out[c] = out[c].astype(np.int64)
    return out
