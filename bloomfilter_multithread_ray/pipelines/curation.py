"""Training-corpus curation operators: benchmark decontamination,
stratified sampling, token-budget source mixing, stopword
normalization.

These are the LLM-data-pipeline widening of the reference's
membership-filter pattern (`src/SkmerSplitter.cpp:91-151` probe = "is
this item in the reference set?"): decontamination asks the same
question at document granularity against a benchmark corpus, and the
sampling/mixing operators are the deterministic selection counterpart
(reference analog: the hash-derived routing `src/SkmerExtractor.cpp:164`
— content-derived pseudo-randomness instead of RNG state, so results
are partitioning- and concurrency-independent).

All wide steps follow the repo's fixed-partition shuffle discipline
(BASELINE.md "wide-operator scale pattern"): fine-grained keys (gram,
pair) shuffle on ``hash % P`` with fixed small P and run one
vectorized kernel per partition; only bounded keys (source) become
real Ray groups.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import splitmix64
from ..stages.quality import STOPWORDS
from ..stages.text import _flat_nonempty_with_counts

if TYPE_CHECKING:
    from ray.data import Dataset

_NBITS = 21  # n_grams < 2^21; doc ids < 2^31 (fixture assumption)
_BENCH_BIT = 62  # side flag above the id field in the packed posting
P_SHUF = 64


# ------------------------------------------------------- decontamination
def decontaminate_pairs(
    docs: "Dataset",
    *,
    bench_source: str = "src0",
    k: int = 3,
    threshold: float = 0.5,
    max_gram_df: int = 64,
) -> "Dataset":
    """Benchmark decontamination: (candidate, benchmark) document pairs
    whose word-k-gram CONTAINMENT — |grams(cand) ∩ grams(bench)| /
    |grams(cand)| — meets ``threshold``. Candidates are every document
    NOT in ``bench_source``; the benchmark set is ``bench_source``.

    Containment (not Jaccard) is the decontamination metric: a short
    benchmark item fully embedded in a long training document must
    flag, however large the training doc is.

    Scale shape — the cross-side variant of ``ngram_jaccard_pairs``'
    join-free inverted index (two content-keyed fixed-P shuffles):

      1. distinct (gram, doc) postings with the side flag packed into
         bit 62 of the posting int (sort order then puts candidates
         before benchmarks inside each gram segment for free);
      2. shuffle on ``|gram_hash| % P``; per partition one vectorized
         kernel expands each gram's candidate×benchmark cross product
         (never candidate×candidate — df caps apply per side);
      3. shuffle partial pair counts on ``|pair| % P``; containment =
         Σi / n_cand per pair, threshold filter.

    ``max_gram_df`` caps each SIDE's posting list per gram
    (deterministic: lists are doc-sorted). A capped gram can only
    lower recall for pairs whose every shared gram is boilerplate; the
    default cap is asserted non-binding on the fixtures so SQL parity
    stays exact.
    """
    from .dedup import _doc_gram_hashes

    bench = str(bench_source)

    def gram_rows(batch: pa.Table) -> pa.Table:
        gh, row_idx = _doc_gram_hashes(batch, k, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        is_b = pc.equal(batch.column("source"), bench).to_numpy(zero_copy_only=False)
        empty = pa.table(
            {"gh": pa.array([], pa.int64()), "packed": pa.array([], pa.int64())}
        )
        if len(gh) == 0:
            return empty
        # distinct (gram, doc) postings within the batch (combiner)
        uniq = np.unique(np.stack([row_idx, gh.view(np.int64)], axis=1), axis=0)
        rows, ghs = uniq[:, 0], uniq[:, 1]
        per_row = np.bincount(rows, minlength=batch.num_rows).astype(np.int64)
        out_ids = ids[rows]
        if out_ids.size and not (0 <= out_ids.min() and out_ids.max() < (1 << 31)):
            raise ValueError("doc_id out of [0, 2^31) — pair packing would corrupt")
        if per_row.max(initial=0) >= (1 << _NBITS):
            raise ValueError(f"n_grams >= 2^{_NBITS} — pair packing would corrupt")
        packed = (
            (is_b[rows].astype(np.int64) << _BENCH_BIT)
            | (out_ids << _NBITS)
            | per_row[rows]
        )
        return pa.table({"gh": pa.array(ghs), "packed": pa.array(packed)})

    def add_gp(batch: pa.Table) -> pa.Table:
        gh = batch.column("gh").to_numpy(zero_copy_only=False)
        return batch.append_column("gp", pa.array(np.abs(gh) % P_SHUF))

    def partition_cross_pairs(group: pa.Table) -> pa.Table:
        """All grams hashed into this partition → partial (cand, bench)
        intersection counts, one vectorized pass."""
        empty = pa.table(
            {"pair": pa.array([], pa.int64()), "i": pa.array([], pa.int64()),
             "n_cand": pa.array([], pa.int64())}
        )
        gh = group.column("gh").to_numpy(zero_copy_only=False).astype(np.int64)
        packed = group.column("packed").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(gh) == 0:
            return empty
        # global distinct + sort by (gram, side, doc): bench bit is the
        # top payload bit, so candidates precede benchmarks per gram
        uniq = np.unique(np.stack([gh, packed], axis=1), axis=0)
        gh, packed = uniq[:, 0], uniq[:, 1]
        side = (packed >> _BENCH_BIT).astype(np.int64)
        # per-(gram, side) run positions → deterministic df cap per side
        run_key_change = np.diff(gh, prepend=gh[0] - 1).astype(bool) | np.diff(
            side, prepend=-1
        ).astype(bool)
        run_starts = np.flatnonzero(run_key_change)
        run_lens = np.diff(np.concatenate([run_starts, [len(gh)]]))
        pos_in_run = np.arange(len(gh)) - np.repeat(run_starts, run_lens)
        keep = pos_in_run < max_gram_df
        gh, packed, side = gh[keep], packed[keep], side[keep]
        if len(gh) == 0:
            return empty
        # per-gram segment geometry after the cap
        seg_starts = np.flatnonzero(np.diff(gh, prepend=gh[0] - 1))
        seg_lens = np.diff(np.concatenate([seg_starts, [len(gh)]]))
        seg_of_post = np.repeat(np.arange(len(seg_starts)), seg_lens)
        nb = np.bincount(seg_of_post, weights=side, minlength=len(seg_starts)).astype(
            np.int64
        )
        nc = seg_lens - nb
        t = nc * nb  # cross-product size per gram
        total = int(t.sum())
        if total == 0:
            return empty
        offs_t = np.concatenate([[0], np.cumsum(t)])
        rep = np.repeat(np.arange(len(t)), t)
        p = np.arange(total, dtype=np.int64) - offs_t[rep]
        c_idx = seg_starts[rep] + p % nc[rep]
        b_idx = seg_starts[rep] + nc[rep] + p // nc[rep]
        idmask = (1 << 31) - 1
        cand_packed, bench_packed = packed[c_idx], packed[b_idx]
        cand_id = (cand_packed >> _NBITS) & idmask
        bench_id = (bench_packed >> _NBITS) & idmask
        n_cand = cand_packed & ((1 << _NBITS) - 1)
        pair = (cand_id << 31) | bench_id
        upair, inv, cnt = np.unique(pair, return_inverse=True, return_counts=True)
        first = np.zeros(len(upair), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(pair) - 1, -1, -1)
        return pa.table(
            {"pair": pa.array(upair), "i": pa.array(cnt.astype(np.int64)),
             "n_cand": pa.array(n_cand[first])}
        )

    def add_pp(batch: pa.Table) -> pa.Table:
        pair = batch.column("pair").to_numpy(zero_copy_only=False)
        return batch.append_column("pp", pa.array(np.abs(pair) % P_SHUF))

    def finalize(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "bench_id": pa.array([], pa.int64()),
             "containment": pa.array([], pa.float64())}
        )
        pair = group.column("pair").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pair) == 0:
            return empty
        i = group.column("i").to_numpy(zero_copy_only=False).astype(np.int64)
        n_cand = group.column("n_cand").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pair, kind="stable")
        pair, i, n_cand = pair[order], i[order], n_cand[order]
        starts = np.flatnonzero(np.diff(pair, prepend=pair[0] - 1))
        isum = np.add.reduceat(i, starts)
        upair, uncand = pair[starts], n_cand[starts]
        containment = isum.astype(np.float64) / uncand.astype(np.float64)
        hit = containment >= threshold
        return pa.table(
            {"doc_id": pa.array((upair >> 31)[hit]),
             "bench_id": pa.array((upair & ((1 << 31) - 1))[hit]),
             "containment": pa.array(containment[hit])}
        )

    return (
        docs.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_gp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gp")
        .map_groups(partition_cross_pairs, batch_format="pyarrow")
        .map_batches(add_pp, batch_format="pyarrow")
        .groupby("pp")
        .map_groups(finalize, batch_format="pyarrow")
    )


# ------------------------------------------------ deterministic sampling
def _mix_ids(batch: pa.Table, cols: list[str]) -> pa.Table:
    """project ``cols`` + append h = splitmix64(doc_id) (bijective on
    int64, so ordering by h is a total order — no tiebreak needed)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
    t = batch.select(cols)
    return t.append_column("h", pa.array(splitmix64(ids)))


def stratified_sample(docs: "Dataset", *, per_source: int = 5) -> pd.DataFrame:
    """Deterministic stratified sample: the ``per_source`` smallest
    ``splitmix64(doc_id)`` values per source — a uniform random-looking
    draw that is reproducible and independent of partitioning.

    Scale shape: per-batch partial bottom-k per source (the combiner —
    each batch forwards ≤ k rows per source it saw), then one shuffle
    keyed on source (bounded group count: sources are an O(100)
    catalog, never a fine-grained key) with a vectorized final
    bottom-k per group. Driver result is O(sources × k).
    """
    kk = int(per_source)

    def partial(batch: pa.Table) -> pa.Table:
        t = _mix_ids(batch, ["source", "doc_id"])
        df = t.to_pandas().sort_values("h").groupby("source", sort=False).head(kk)
        return pa.table(
            {"source": pa.array(df["source"], pa.string()),
             "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
             "h": pa.array(df["h"].to_numpy(np.uint64))}
        )

    def final(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("h").head(kk)
        return pa.Table.from_pandas(df, preserve_index=False).select(
            ["source", "doc_id", "h"]
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )
    return (
        out.to_pandas().sort_values(["source", "h"]).reset_index(drop=True)
    )


def mix_to_budget(docs: "Dataset", *, budget_tokens: int = 500) -> pd.DataFrame:
    """Token-budget corpus mixing: per source, admit documents in
    deterministic ``splitmix64(doc_id)`` order until the source's token
    budget is reached. A document is admitted iff the tokens admitted
    before it are still under budget (so one document may overflow the
    budget — the standard greedy prefix rule, and the SQL-checkable
    one: running-sum-before < budget).

    Scale shape: the map pass computes {source, doc_id, n_tok, h}
    (token counts per batch, vectorized); the only wide step keys on
    source (bounded catalog) and runs one sort+cumsum kernel per
    group. Output is the admitted plan — O(admitted docs), the thing a
    downstream training-data writer consumes.
    """
    B = int(budget_tokens)

    def stats(batch: pa.Table) -> pa.Table:
        _, counts = _flat_nonempty_with_counts(batch, "text")
        t = _mix_ids(batch, ["source", "doc_id"])
        return t.append_column("n_tok", pa.array(counts.astype(np.int64)))

    def admit(g: pa.Table) -> pa.Table:
        df = g.to_pandas().sort_values("h")
        cum_before = df["n_tok"].cumsum().shift(fill_value=0)
        df = df[cum_before < B]
        return pa.table(
            {"source": pa.array(df["source"], pa.string()),
             "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
             "n_tok": pa.array(df["n_tok"].to_numpy(np.int64)),
             "h": pa.array(df["h"].to_numpy(np.uint64))}
        )

    out = (
        docs.map_batches(stats, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .map_groups(admit, batch_format="pyarrow")
    )
    return out.to_pandas().sort_values(["source", "h"]).reset_index(drop=True)


# --------------------------------------------------- text normalization
def normalize_text(docs: "Dataset") -> "Dataset":
    """Stopword-removal normalization (map-only): text → cleaned text
    with stopwords and empty tokens dropped, plus kept/removed counts.
    The whole batch stays in Arrow — flat token filter + offset
    rebuild + ``binary_join``; no per-row Python.

    At scale this is the shape of every tokenize-normalize-rewrite
    pass (lowercasing, unicode NFC, boilerplate stripping): pure
    ``map_batches``, no shuffle, output streamed to the sink.
    """
    stop_set = pa.array(list(STOPWORDS))

    def clean(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_nonempty_with_counts(batch, "text")
        is_stop = pc.is_in(flat, value_set=stop_set).to_numpy(zero_copy_only=False)
        n_rows = batch.num_rows
        row_of = np.repeat(np.arange(n_rows), counts)
        n_stop = np.bincount(row_of, weights=is_stop, minlength=n_rows).astype(np.int64)
        kept_mask = ~is_stop
        kept_counts = counts - n_stop
        new_offs = np.concatenate([[0], np.cumsum(kept_counts)]).astype(np.int32)
        kept_flat = flat.filter(pa.array(kept_mask))
        lists = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept_flat)
        clean_text = pc.binary_join(lists, " ")
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "clean_text": clean_text,
             "n_kept": pa.array(kept_counts.astype(np.int64)),
             "n_removed": pa.array(n_stop)}
        )

    return docs.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------- epoch shuffle / global rank
def global_rank_uniform(
    keyed: "Dataset", *, key_col: str = "h", num_buckets: int = 64
) -> "Dataset":
    """Distributed row_number (0-based, ascending by ``key_col``) for a
    UNIFORMLY-distributed uint64 key — the total-order primitive behind
    epoch shuffling, deterministic train/eval splits, and resumable
    sharded writes.

    Because the key is uniform, its top bits ARE the range partitioner
    (no sampling pass needed): bucket = h >> (64 - log2 B).

      pass 1: per-batch bucket histogram → driver folds B ints into
              prefix offsets (O(B) driver state, never O(rows));
      pass 2: shuffle on bucket, per-bucket sort + ``offset + arange``.

    Input is materialized once (key + payload only — callers project
    first) so the histogram pass doesn't recompute upstream; blocks
    spill to the object store at scale rather than living on the
    driver.
    """
    B = int(num_buckets)
    if B < 2 or B & (B - 1):
        raise ValueError("num_buckets must be a power of two >= 2")
    shift = np.uint64(64 - (B.bit_length() - 1))

    payload = [c for c in keyed.schema().names if c != key_col]

    def add_bucket(t: pa.Table) -> pa.Table:
        h = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column("__b", pa.array((h >> shift).astype(np.int32)))

    bucketed = keyed.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def hist(t: pa.Table) -> pa.Table:
        b = t.column("__b").to_numpy(zero_copy_only=False)
        return pa.table(
            {"b": pa.array(np.arange(B, dtype=np.int64)),
             "n": pa.array(np.bincount(b, minlength=B).astype(np.int64))}
        )

    hdf = bucketed.map_batches(
        hist, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    counts = np.zeros(B, dtype=np.int64)
    np.add.at(counts, hdf["b"].to_numpy(), hdf["n"].to_numpy())
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def rank_bucket(g: pa.Table) -> pa.Table:
        b = int(g.column("__b")[0].as_py())
        h = g.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(h, kind="stable")
        cols = {"rank": pa.array(offsets[b] + np.arange(len(h), dtype=np.int64)),
                key_col: pa.array(h[order])}
        for c in payload:
            cols[c] = g.column(c).combine_chunks().take(pa.array(order))
        return pa.table(cols)

    return bucketed.groupby("__b").map_groups(rank_bucket, batch_format="pyarrow")


def epoch_shuffle_plan(
    docs: "Dataset", *, epoch: int = 0, num_buckets: int = 64
) -> "Dataset":
    """Deterministic epoch-shuffle plan: {rank, h, doc_id} where rank
    is the document's 0-based position in epoch ``epoch``'s global
    training order — ``splitmix64(doc_id XOR seed(epoch))`` order, a
    distinct uniform permutation per epoch that is reproducible and
    independent of partitioning, cluster size, and run count (unlike
    ``Dataset.random_shuffle``). Downstream writers consume the plan
    as the shard assignment: shard = rank // shard_size.
    """
    from ..functions.hashing import hash64_ints

    seed = int(splitmix64(np.uint64(epoch + 1)))

    def key(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"h": pa.array(hash64_ints(ids, seed=seed)),
             "doc_id": pa.array(ids.astype(np.int64))}
        )

    keyed = docs.select_columns(["doc_id"]).map_batches(
        key, batch_format="pyarrow", zero_copy_batch=True
    )
    return global_rank_uniform(keyed, key_col="h", num_buckets=num_buckets)


# --------------------------------------------- split / shard assignment
def assign_splits(
    docs: "Dataset",
    *,
    val_permille: int = 50,
    test_permille: int = 50,
    seed: int = 0,
) -> "Dataset":
    """Deterministic train/val/test assignment: {doc_id, bucket, split}
    with ``bucket = splitmix64(doc_id XOR seed) % 1000`` — buckets
    [0, test) → test, [test, test+val) → val, rest → train.

    Content-keyed (map-only, no shuffle, no RNG state): a document's
    split never changes when the corpus grows, is re-partitioned, or
    is re-read — the property that keeps eval sets stable across
    pipeline re-runs, which ``Dataset.random_shuffle``-style splits
    do not have.
    """
    from ..functions.hashing import hash64_ints

    tp, vp = int(test_permille), int(val_permille)
    if tp < 0 or vp < 0 or tp + vp > 1000:
        raise ValueError("permille bounds must be >= 0 and sum <= 1000")

    def fn(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        b = (hash64_ints(ids, seed=seed) % np.uint64(1000)).astype(np.int64)
        split = np.where(b < tp, "test", np.where(b < tp + vp, "val", "train"))
        return pa.table(
            {"doc_id": pa.array(ids.astype(np.int64)),
             "bucket": pa.array(b),
             "split": pa.array(split)}
        )

    return docs.select_columns(["doc_id"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def write_training_shards(
    docs: "Dataset",
    out_dir: str,
    *,
    epoch: int = 0,
    shard_size: int = 1000,
    num_partitions: int = P_SHUF,
    skip_existing: bool = True,
) -> pd.DataFrame:
    """Materialize epoch ``epoch``'s training order as resumable
    parquet shards: ``{out_dir}/shard={s}/part.parquet`` holds ranks
    ``[s*shard_size, (s+1)*shard_size)`` sorted by rank. Returns the
    manifest {shard, n_docs, rank_min, rank_max, skipped}.

    Scale shape: the epoch-shuffle plan (rank per doc) joins back to
    the payload on ``doc_id`` (shuffle equi-join — both sides are
    corpus-sized), shards route on ``shard % P`` (FIXED Ray group
    count; a group task writes every shard hashed to it, so millions
    of shards never mean millions of Ray groups), and each shard is
    exactly one file written atomically (tmp + rename). A re-run
    with ``skip_existing`` rewrites only missing shards — the failed
    run's completed partitions are skipped, never re-shuffled into
    different contents, because rank assignment is deterministic.
    """
    import os

    from .join import hash_join

    S = int(shard_size)
    P = int(num_partitions)
    os.makedirs(out_dir, exist_ok=True)

    plan = epoch_shuffle_plan(docs, epoch=epoch)
    joined = hash_join(plan, docs, on="doc_id", num_partitions=P)

    def add_shard(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy(zero_copy_only=False)
        shard = (r // S).astype(np.int64)
        t = t.append_column("shard", pa.array(shard))
        return t.append_column("sp", pa.array((shard % P).astype(np.int32)))

    def write_partition(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        shard = g.column("shard").to_numpy(zero_copy_only=False)
        rank = g.column("rank").to_numpy(zero_copy_only=False)
        rows = []
        for s in np.unique(shard):
            sel = np.flatnonzero(shard == s)
            sel = sel[np.argsort(rank[sel], kind="stable")]
            sub = g.drop_columns(["sp"]).take(pa.array(sel))
            d = os.path.join(out_dir, f"shard={int(s)}")
            path = os.path.join(d, "part.parquet")
            skipped = skip_existing and os.path.exists(path)
            if not skipped:
                os.makedirs(d, exist_ok=True)
                tmp = path + ".tmp"
                pq.write_table(sub, tmp)
                os.replace(tmp, path)  # atomic publish: no torn shards
            rows.append(
                {"shard": int(s), "n_docs": len(sel),
                 "rank_min": int(rank[sel].min()), "rank_max": int(rank[sel].max()),
                 "skipped": bool(skipped)}
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("shard", pa.int64()), ("n_docs", pa.int64()),
                 ("rank_min", pa.int64()), ("rank_max", pa.int64()),
                 ("skipped", pa.bool_())]
            ),
        )

    manifest = (
        joined.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sp")
        .map_groups(write_partition, batch_format="pyarrow")
    )
    return manifest.to_pandas().sort_values("shard").reset_index(drop=True)


# ------------------------------------------- end-to-end curation chain
def full_curation_report(
    sf_dir: str,
    *,
    min_tok: int = 20,
    max_tok: int = 5000,
    min_ttr: float = 0.2,
    bench_source: str = "src0",
    val_permille: int = 50,
    test_permille: int = 50,
) -> pd.DataFrame:
    """The whole training-data chain as ONE streaming composition —
    quality gate → benchmark-decontamination drop → exact dedup →
    train/val/test assignment → per-split report
    {split, n_docs, total_tok}.

    Every stage is an operator this repo ships individually (same
    thresholds, same kernels); the composition exists to prove the
    stages chain the way a 100 TB curation job runs them:

      1. gate: map-only filter on unrounded quality ratios
         (``make_quality_fn``), benchmark docs excluded from training;
      2. decontaminate: the pair list from
         :func:`decontaminate_pairs` anti-joins in
         (``hash_join(how="anti")`` — a shuffle semi-join, never a
         driver id-set broadcast);
      3. dedup: keep min doc_id per content hash INSIDE fixed hash
         partitions;
      4. split: content-keyed permille buckets (:func:`assign_splits`
         rule, inline so the split column rides the same stream);
      5. report: tiny ``grouped_agg``.
    """
    from ..functions.hashing import hash64_ints, hash_strings
    from ..stages.quality import _row_layout, make_quality_fn
    from .agg import grouped_agg
    from .join import hash_join
    from .relational import read

    P = P_SHUF
    bench = str(bench_source)
    qfn = make_quality_fn(round_dp=None)
    docs = read(sf_dir, "documents", ["doc_id", "text", "source"])

    def features(t: pa.Table) -> pa.Table:
        _, offs = _row_layout(t)
        t = t.filter(pa.array(np.diff(offs) > 0))
        t = t.filter(pc.not_equal(t.column("source"), bench))
        q = qfn(t)
        h = hash_strings(t.column("text").combine_chunks()).view(np.int64)
        return q.append_column("h", pa.array(h))

    def gate_and_key(t: pa.Table) -> pa.Table:
        n = t.column("n_tok").to_numpy(zero_copy_only=False)
        ttr = t.column("ttr").to_numpy(zero_copy_only=False)
        t = t.filter(
            pa.array((n >= min_tok) & (n <= max_tok) & (ttr >= min_ttr))
        )
        h = t.column("h").to_numpy(zero_copy_only=False)
        t = t.select(["doc_id", "n_tok", "h"])
        return t.append_column("hp", pa.array((np.abs(h) % P).astype(np.int32)))

    gated = docs.map_batches(
        features, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(gate_and_key, batch_format="pyarrow", zero_copy_batch=True)

    contaminated = decontaminate_pairs(
        docs, bench_source=bench, k=3, threshold=0.5
    ).select_columns(["doc_id"])
    clean = hash_join(
        gated, contaminated, on="doc_id", how="anti", num_partitions=16
    )

    def keep_min_per_hash(g: pa.Table) -> pa.Table:
        h = g.column("h").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h))
        first = np.zeros(len(h), dtype=bool)
        if len(h):
            first[order] = np.diff(h[order], prepend=h[order[0]] - 1) != 0
        return g.filter(pa.array(first))

    kept = clean.groupby("hp").map_groups(
        keep_min_per_hash, batch_format="pyarrow"
    )

    tp, vp = int(test_permille), int(val_permille)

    def add_split(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        b = (hash64_ints(ids) % np.uint64(1000)).astype(np.int64)
        split = np.where(b < tp, "test", np.where(b < tp + vp, "val", "train"))
        return pa.table(
            {"split": pa.array(split), "n_tok": t.column("n_tok")}
        )

    rep = grouped_agg(
        kept.map_batches(add_split, batch_format="pyarrow", zero_copy_batch=True),
        "split",
        {"n_docs": ("count", None), "total_tok": ("sum", "n_tok")},
    ).to_pandas()
    rep["total_tok"] = rep["total_tok"].astype("int64")
    return rep.sort_values("split").reset_index(drop=True)


# ------------------------------------------- full pretraining curation
def pretrain_curation(
    docs: "Dataset",
    *,
    gates: dict | None = None,
    line_sep: str = " ",
    line_min_frac: "tuple[int, int]" = (19, 20),
    minhash_threshold: float = 0.5,
    val_permille: int = 50,
    test_permille: int = 50,
    shard_dir: "str | None" = None,
    shard_size: int = 200,
    stats_out: "dict | None" = None,
) -> pd.DataFrame:
    """The 100-TB pretraining-data chain as ONE streaming composition —
    Gopher repetition gate → corpus line dedup (boilerplate rewrite)
    → MinHash-LSH near-dup keep-set → train/val/test assignment →
    per-split report {split, n_docs, total_tok} (n_tok counted on the
    REWRITTEN text).

    Distinct from :func:`full_curation_report` (quality ratios +
    benchmark decontamination + EXACT dedup): this is the repetition /
    boilerplate / NEAR-dup chain — together they cover both halves of
    a production curation stack. Every stage is an operator this repo
    ships individually (same kernels, same thresholds, each with its
    own oracle); the composition proves they chain the way the real
    job runs them, and its own SQL oracle re-derives the whole chain.

    Scale shape: the gate is map-only; line dedup moves segment hashes
    only (text never shuffles); MinHash moves signatures and the
    keep-set moves ids; text travels exactly once — into the final
    semi-join that materializes the survivors. With ``shard_dir`` the
    survivors stream STRAIGHT to a split-partitioned parquet staging
    area (one pass; resumable), the train split is re-read from
    staging (column-pruned, never recomputed) into
    :func:`write_training_shards`, and the report is computed from the
    staged ``n_tok`` column — the driver never holds the corpus.
    """
    from ..functions.hashing import hash64_ints
    from ..stages.text import flat_nonempty_with_offsets
    from .agg import grouped_agg
    from .dedup import minhash_lsh_pairs
    from .graph import keep_set_distributed
    from .join import hash_join
    from .repetition import gopher_gate

    tp, vp = int(test_permille), int(val_permille)
    if tp < 0 or vp < 0 or tp + vp > 1000:
        raise ValueError("permille bounds must be >= 0 and sum <= 1000")

    # gated is materialized because line_dedup consumes its input in
    # FOUR passes (doc count, line-hash pairs, ref rows, rewrite join)
    # — lazily each pass would re-run the gate from the source read
    gated = gopher_gate(
        docs.select_columns(["doc_id", "text"]), gates=gates
    ).materialize()
    # materialized once: the LSH pair pass, the keep-set anti-join and
    # the survivor semi-join all consume these rows — lazily they would
    # each re-run the line-dedup chain
    rewritten = line_dedup(
        gated, sep=line_sep, min_frac=line_min_frac
    ).select_columns(["doc_id", "text"]).materialize()
    # dedupe=False: the CC keep-set tolerates duplicate edges, skipping
    # the pair-dedup sort-shuffle (same survivors, one less all-to-all)
    pairs = minhash_lsh_pairs(rewritten, threshold=minhash_threshold, dedupe=False)
    kept_ids = keep_set_distributed(rewritten, pairs, num_partitions=16)
    kept = hash_join(
        rewritten, kept_ids, on="doc_id", how="semi",
        num_partitions=16, broadcast="auto",
    )

    def add_split_tok(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        _, offs = flat_nonempty_with_offsets(t, "text")
        n_tok = np.diff(offs).astype(np.int64)
        b = (hash64_ints(ids) % np.uint64(1000)).astype(np.int64)
        split = np.where(b < tp, "test", np.where(b < tp + vp, "val", "train"))
        return pa.table(
            {"doc_id": pa.array(ids), "text": t.column("text"),
             "split": pa.array(split), "n_tok": pa.array(n_tok)}
        )

    tagged = kept.map_batches(
        add_split_tok, batch_format="pyarrow", zero_copy_batch=True
    )

    if shard_dir is not None:
        import os

        import ray.data as rd

        import shutil

        staging = os.path.join(shard_dir, "staging")
        # a torn previous run leaves UUID-named partials behind;
        # write_parquet appends, so stale files would double-count the
        # report and duplicate docs in the shards — wipe first
        shutil.rmtree(staging, ignore_errors=True)
        tagged.write_parquet(staging, partition_cols=["split"])
        if stats_out is not None:
            # full operator-chain execution stats of the curation pass
            # (gate / segment-hash shuffles / signature bands / CC /
            # semi-join / sink) for shuffle-volume audits
            stats_out["curation_write"] = tagged.stats()
        train_dir = os.path.join(staging, "split=train")
        if os.path.isdir(train_dir):
            write_training_shards(
                rd.read_parquet(train_dir, columns=["doc_id", "text", "n_tok"]),
                os.path.join(shard_dir, "train"),
                epoch=0, shard_size=shard_size,
            )
        # report from the staged sink: column-pruned read-back, the
        # curation chain itself never re-executes
        tagged = rd.read_parquet(staging, columns=["split", "n_tok"])

    rep = grouped_agg(
        tagged.select_columns(["split", "n_tok"]),
        "split",
        {"n_docs": ("count", None), "total_tok": ("sum", "n_tok")},
    ).to_pandas()
    if rep.empty:
        return pd.DataFrame(
            {"split": pd.Series(dtype=object),
             "n_docs": pd.Series(dtype="int64"),
             "total_tok": pd.Series(dtype="int64")}
        )
    rep["total_tok"] = rep["total_tok"].astype("int64")
    return rep.sort_values("split").reset_index(drop=True)


# ---------------------------------------------------- split leakage check
def split_leakage(
    docs: "Dataset",
    *,
    val_permille: int = 50,
    test_permille: int = 50,
    seed: int = 0,
) -> "Dataset":
    """Train/test leakage detector → {group_min_id, n_train,
    n_heldout}: content groups (identical text) that appear in BOTH
    the train split and a held-out split (val/test) under
    :func:`assign_splits`' assignment, keyed by the group's smallest
    doc_id. Zero rows is the healthy state; every row is a leaked
    document group.

    Note the design point this check exists to demonstrate: because
    ``assign_splits`` keys on doc_id, two documents with IDENTICAL
    text can land in different splits — dedup must run BEFORE
    splitting (as :func:`full_curation_report` orders it), and this
    operator is the audit that catches pipelines that split first.

    One content-keyed fixed-P shuffle; text never travels (64-bit
    content hash), output is O(leaked groups).

    ``val_permille``/``test_permille`` must match the values passed to
    :func:`assign_splits` for the pipeline under audit — the train
    boundary is derived (``bucket >= test + val``), not hardcoded.
    """
    from ..functions.hashing import hash64_ints, hash_strings

    tp, vp = int(test_permille), int(val_permille)
    if tp < 0 or vp < 0 or tp + vp > 1000:
        raise ValueError(f"invalid permilles: test={tp} val={vp}")
    train_lo = tp + vp  # buckets [0,tp)=test, [tp,tp+vp)=val, rest=train

    def keyed(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        b = (hash64_ints(ids, seed=seed) % np.uint64(1000)).astype(np.int64)
        h = hash_strings(t.column("text").combine_chunks()).view(np.int64)
        return pa.table(
            {"h": pa.array(h),
             "doc_id": pa.array(ids),
             "is_train": pa.array(b >= train_lo),
             "hp": pa.array((np.abs(h) % P_SHUF).astype(np.int32))}
        )

    def leaked(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"h": g.column("h").to_numpy(zero_copy_only=False),
             "doc_id": g.column("doc_id").to_numpy(zero_copy_only=False),
             "t": g.column("is_train").to_numpy(zero_copy_only=False).astype(np.int64)}
        )
        agg = df.groupby("h").agg(
            n_train=("t", "sum"), n=("t", "count"), group_min_id=("doc_id", "min")
        ).reset_index()
        agg["n_heldout"] = agg["n"] - agg["n_train"]
        bad = agg[(agg["n_train"] > 0) & (agg["n_heldout"] > 0)]
        return pa.table(
            {"group_min_id": pa.array(bad["group_min_id"].to_numpy(np.int64)),
             "n_train": pa.array(bad["n_train"].to_numpy(np.int64)),
             "n_heldout": pa.array(bad["n_heldout"].to_numpy(np.int64))}
        )

    return (
        docs.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(leaked, batch_format="pyarrow")
    )


# ------------------------------------------------------ corpus line dedup
def line_dedup(
    docs: "Dataset",
    *,
    sep: str = "\n",
    min_docs: int = 2,
    min_frac: tuple[int, int] | None = None,
    num_partitions: int = 64,
    id_col: str = "doc_id",
    col: str = "text",
    broadcast: bool | str = "auto",
) -> "Dataset":
    """Corpus-level exact segment deduplication (CCNet/RefinedWeb-style
    line dedup): REWRITE every document, dropping each ``sep``-separated
    segment whose exact content occurs in >= ``min_docs`` distinct
    documents (or, with ``min_frac=(num, den)``, in >= num/den of the
    corpus — the boilerplate/high-DF removal form).  Removal applies to
    ALL occurrences (partitioning-independent; no canonical-survivor
    tie-break needed).  Empty segments are never counted or removed, so
    separator structure is preserved and text round-trips exactly.

    Returns a Dataset ``{id_col, col (rewritten), n_removed}``.

    Scale shape (text never shuffles): pass 1 streams the corpus and
    emits per-batch-DISTINCT (segment-hash, doc) pairs — a doc is one
    row, so batch-distinct is globally distinct — into a fixed-P
    grouped count; hashes over the threshold form the duplicated-
    segment set.  Pass 2 re-streams the corpus emitting (hash, doc,
    seg_idx) instance refs, semi-joins them against the duplicated set
    (hash-keyed fixed-P), folds the surviving refs to one
    (doc, removal-index-list) row per affected document, and joins that
    small table back to the documents with ``broadcast="auto"`` — in
    the common case (removals fit plasma) the rewrite is MAP-ONLY over
    the corpus.  The rewrite kernel is fully vectorized: split →
    flat keep-mask → rebuilt ListArray → ``pc.binary_join``.
    """
    from ..functions.hashing import hash_strings
    from .agg import _partition_of_keys, grouped_agg
    from .join import hash_join

    P = int(num_partitions)

    if min_frac is not None:
        f_num, f_den = int(min_frac[0]), int(min_frac[1])
        n_docs = docs.count()
    else:
        f_num = f_den = n_docs = None

    src = docs.select_columns([id_col, col])

    def _segments(t: pa.Table):
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        segs = pc.split_pattern(arr, sep)
        counts = pc.list_value_length(segs).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(segs)  # offset-safe (values respecting slices)
        ne = pc.not_equal(flat, "")
        ne_np = np.asarray(ne)
        doc = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return segs, counts, flat, ne_np, doc

    def pair_rows(t: pa.Table) -> pa.Table:
        _, counts, flat, ne_np, doc = _segments(t)
        doc_rep = np.repeat(doc, counts)[ne_np]
        if len(doc_rep) == 0:
            return pa.table({"lh": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64())})
        lh = hash_strings(flat.filter(pa.array(ne_np))).view(np.int64)
        order = np.lexsort((lh, doc_rep))
        d, h = doc_rep[order], lh[order]
        first = np.r_[True, (d[1:] != d[:-1]) | (h[1:] != h[:-1])]
        return pa.table({"lh": h[first], "doc_id": d[first]})

    df_counts = grouped_agg(
        src.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True),
        "lh", {"nd": ("count", None)}, num_partitions=P,
    )
    if min_frac is not None:
        thr_num, thr_den = n_docs * f_num, f_den
    else:
        thr_num, thr_den = int(min_docs), 1

    dup = df_counts.map_batches(
        lambda t: t.filter(pa.array(
            t["nd"].to_numpy(zero_copy_only=False) * thr_den >= thr_num
        )).select(["lh"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def ref_rows(t: pa.Table) -> pa.Table:
        _, counts, flat, ne_np, doc = _segments(t)
        total = int(counts.sum())
        if total == 0:
            return pa.table({"lh": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "seg_idx": pa.array([], pa.int64())})
        starts = np.r_[np.int64(0), np.cumsum(counts)[:-1]]
        seg_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        doc_rep = np.repeat(doc, counts)
        keep = ne_np
        lh = hash_strings(flat.filter(pa.array(keep))).view(np.int64)
        return pa.table({"lh": lh, "doc_id": doc_rep[keep],
                         "seg_idx": seg_idx[keep]})

    removals = hash_join(
        src.map_batches(ref_rows, batch_format="pyarrow", zero_copy_batch=True),
        dup, on="lh", how="semi", num_partitions=P,
    ).select_columns(["doc_id", "seg_idx"])

    def tag(t: pa.Table) -> pa.Table:
        gp = _partition_of_keys(t, ["doc_id"], P)
        return t.append_column("__gp", pa.array(gp))

    def collect(g: pa.Table) -> pa.Table:
        # removal indices pack into a little-endian int64 BINARY blob
        # per doc (a list<int64> column would break the broadcast join:
        # pyarrow's acero join rejects nested types)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        i = g["seg_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((i, d))
        d_s, i_s = d[order], i[order]
        starts = np.flatnonzero(np.r_[True, d_s[1:] != d_s[:-1]])
        bounds = np.r_[starts, len(d_s)]
        buf = i_s.astype("<i8").tobytes()
        rm = pa.array(
            [buf[8 * lo: 8 * hi] for lo, hi in zip(bounds[:-1], bounds[1:])],
            pa.binary(),
        )
        return pa.table({"doc_id": pa.array(d_s[starts], pa.int64()), "rm": rm})

    per_doc = (
        removals.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(collect, batch_format="pyarrow")
    ).materialize()  # affected-docs table; consumed by the join build
    # side anyway — and a no-dup corpus leaves it ALL-empty, where Ray
    # drops the schema (repo-wide gotcha): take the identity path
    if per_doc.count() == 0:
        return src.map_batches(
            lambda t: t.append_column(
                "n_removed", pa.array(np.zeros(len(t), np.int64))
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    joined = hash_join(
        src, per_doc, on=id_col, right_on="doc_id", how="left",
        broadcast=broadcast, num_partitions=P,
    )

    def rewrite(t: pa.Table) -> pa.Table:
        segs, counts, flat, _ne, _doc = _segments(t)
        rm = t["rm"]
        if isinstance(rm, pa.ChunkedArray):
            rm = rm.combine_chunks()
        rm = pc.fill_null(rm, b"")
        rm_len = (
            pc.binary_length(rm).to_numpy(zero_copy_only=False).astype(np.int64) // 8
        )
        rm_flat = np.frombuffer(b"".join(rm.to_pylist()), dtype="<i8").astype(np.int64)
        rm_row = np.repeat(np.arange(len(t), dtype=np.int64), rm_len)
        starts = np.r_[np.int64(0), np.cumsum(counts)[:-1]]
        keep = np.ones(len(flat), dtype=bool)
        keep[starts[rm_row] + rm_flat] = False
        new_counts = counts - rm_len
        new_offsets = np.r_[np.int64(0), np.cumsum(new_counts)].astype(np.int32)
        new_la = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), flat.filter(pa.array(keep))
        )
        return pa.table({
            id_col: t[id_col],
            col: pc.binary_join(new_la, sep),
            "n_removed": rm_len,
        })

    return joined.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------ multi-pattern phrase match
def _prefix_free_groups(phrases: list[str]) -> list[list[str]]:
    """Partition phrases into groups where NO phrase is a prefix of
    another — within such a group one length-sorted lookahead
    alternation finds every occurrence (two phrases can only collide
    at the same start position when one is the other's prefix).
    Greedy first-fit; typical blocklists need 1-2 groups."""
    groups: list[list[str]] = []
    for p in sorted(set(phrases)):
        for g in groups:
            if not any(q.startswith(p) or p.startswith(q) for q in g):
                g.append(p)
                break
        else:
            groups.append([p])
    return groups


def phrase_match(
    docs: "Dataset",
    phrases: "list[str]",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "Dataset":
    """Blocklist / multi-pattern substring search → ``{doc_id,
    phrase}``: one row per (document, phrase) where the phrase occurs
    ANYWHERE in the text (SQL ``position(phrase IN text) > 0``
    semantics, overlaps included).

    Scale shape: the phrase set ships ONCE via the object store and
    each actor compiles its scan regexes in ``__init__`` (the brief's
    stateful-actor-pool pattern); per batch each document is scanned
    once per prefix-free phrase group with a zero-width-lookahead
    alternation — C-speed multi-pattern scan (the regex-alternation
    Aho-Corasick stand-in), overlap-exact because phrases that can
    collide at one start position (prefix chains) land in different
    groups. Null texts never match.
    """
    import re

    import ray

    if not phrases:
        raise ValueError("phrase_match: empty phrase list")
    if any(p == "" for p in phrases):
        raise ValueError("phrase_match: empty-string phrase")
    ref = ray.put(_prefix_free_groups(list(phrases)))

    class Matcher:
        def __init__(self):
            groups = ray.get(ref)
            self.pats = [
                re.compile("(?=(" + "|".join(
                    re.escape(p) for p in sorted(g, key=len, reverse=True)
                ) + "))")
                for g in groups
            ]

        def __call__(self, t: pa.Table) -> pa.Table:
            ids_out: list = []
            ph_out: list[str] = []
            texts = t.column(text_col).to_pylist()
            ids = t.column(id_col).to_pylist()
            for did, txt in zip(ids, texts):
                if txt is None:
                    continue
                hits: set[str] = set()
                for pat in self.pats:
                    for m in pat.finditer(txt):
                        hits.add(m.group(1))
                if hits:
                    ids_out.extend([did] * len(hits))
                    ph_out.extend(sorted(hits))
            return pa.table(
                {id_col: pa.array(ids_out, t.column(id_col).type),
                 "phrase": pa.array(ph_out, pa.string())}
            )

    return docs.map_batches(
        Matcher, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    )


# ----------------------------------------------------- sequence packing
def pack_sequences(
    docs: "Dataset",
    *,
    seq_len: int = 512,
    seed: int = 0,
    num_partitions: int = P_SHUF,
) -> pd.DataFrame:
    """Concat-and-chunk sequence packing: lay every document out on one
    global token tape in deterministic ``splitmix64(doc_id XOR seed)``
    order (the hash order doubles as the training-time document
    shuffle) and cut the tape every ``seq_len`` tokens, letting a
    document straddle a cut. Per document: its global token offset
    ``tok_start``, the training sequence its first token lands in
    (``seq_id``), the offset within that sequence (``off_in_seq``) and
    how many sequences it spans (``n_seqs``; 0 for empty documents).
    This is the standard GPT-style packing plan — the thing a
    fixed-context trainer consumes to build batches with zero padding
    except the final tail.

    Scale shape — a distributed ordered PREFIX SUM over the hash
    order, no global sort operator:

      1. map pass: {doc_id, n_tok, okey, rpart} — token counts
         vectorized per batch; ``rpart = okey >> (64 - log2(P))`` is a
         RANGE partition (top bits), so ranges are contiguous spans of
         the global order and splitmix64's uniformity balances them.
         Text never leaves the read — only 24-byte rows shuffle. The
         skinny table materializes once and feeds both passes.
      2. per-range token sums via per-batch combine (each batch
         forwards ≤ P partial rows) → P rows on the driver → exclusive
         prefix offsets, O(P) driver state.
      3. one ``groupby(rpart)`` pass: sort the range by okey
         (splitmix64 is bijective on uint64 — a total order, no
         tiebreak), local exclusive cumsum + the range's offset, then
         the seq_id/off arithmetic vectorized.

    Partition-count invariance: ``rpart`` uses the okey's TOP bits, so
    any power-of-two P yields the same global order and byte-identical
    output (pytest-pinned at P=8 vs P=64). One range's skinny rows
    must fit a task heap — size P so n_docs×24B / P stays heap-sized.

    Reference analog: the deterministic content-hash routing of
    `src/SkmerExtractor.cpp:164` applied to corpus layout instead of
    filter sharding.
    """
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    P = int(num_partitions)
    if P < 2 or (P & (P - 1)):
        raise ValueError("num_partitions must be a power of two >= 2")
    shift = np.uint64(64 - int(P).bit_length() + 1)  # 64 - log2(P)
    sd = np.uint64(seed)

    def stats(batch: pa.Table) -> pa.Table:
        _, counts = _flat_nonempty_with_counts(batch, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        okey = splitmix64(ids ^ sd)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_tok": pa.array(counts.astype(np.int64)),
             "okey": pa.array(okey),
             "rpart": pa.array((okey >> shift).astype(np.int32))}
        )

    def range_sums(batch: pa.Table) -> pa.Table:
        rp = batch.column("rpart").to_numpy(zero_copy_only=False)
        nt = batch.column("n_tok").to_numpy(zero_copy_only=False)
        s = np.zeros(P, dtype=np.int64)
        np.add.at(s, rp, nt)
        nz = np.flatnonzero(s)
        return pa.table(
            {"rpart": pa.array(nz.astype(np.int32)), "s": pa.array(s[nz])}
        )

    skinny = docs.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    sums = (
        skinny.map_batches(range_sums, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("rpart").sum("s")
        .take_all()
    )
    per_range = np.zeros(P, dtype=np.int64)
    for r in sums:
        per_range[int(r["rpart"])] = int(r["sum(s)"])
    offsets = np.concatenate(([0], np.cumsum(per_range)[:-1]))

    def pack_range(g: pa.Table) -> pa.Table:
        rp = int(g.column("rpart")[0].as_py())
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")  # bijective hash: no ties
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)[order]
        nt = g.column("n_tok").to_numpy(zero_copy_only=False)[order]
        start = int(offsets[rp]) + np.concatenate(
            ([0], np.cumsum(nt[:-1]))
        ).astype(np.int64)
        seq_id = start // L
        n_seqs = np.where(
            nt == 0, 0, (start + np.maximum(nt, 1) - 1) // L - seq_id + 1
        ).astype(np.int64)
        return pa.table(
            {"doc_id": pa.array(ids),
             "n_tok": pa.array(nt),
             "tok_start": pa.array(start),
             "seq_id": pa.array(seq_id),
             "off_in_seq": pa.array(start % L),
             "n_seqs": pa.array(n_seqs)}
        )

    out = skinny.groupby("rpart").map_groups(
        pack_range, batch_format="pyarrow"
    ).to_pandas()
    if not len(out):
        return pd.DataFrame(
            {c: pd.Series(dtype=np.int64)
             for c in ["doc_id", "n_tok", "tok_start", "seq_id",
                       "off_in_seq", "n_seqs"]}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def materialize_packed_sequences(
    docs: "Dataset",
    *,
    seq_len: int = 512,
    seed: int = 0,
    num_partitions: int = P_SHUF,
) -> "Dataset":
    """Materialize the packed training sequences themselves →
    ``{seq_id, n_tok, text}`` — the trainer-ready complement of
    ``pack_sequences`` (which emits only the per-document PLAN). Same
    tape: documents in ``splitmix64(doc_id XOR seed)`` order, cut every
    ``seq_len`` tokens; every sequence is exactly ``seq_len`` tokens
    except the global tail.

    Scale shape — the corpus text shuffles ONCE, plus an O(P·seq_len)
    fix-up:

      1. skinny pass: per-range token sums (per-batch combine, ≤ P
         rows/batch) → O(P) driver exclusive offsets, exactly as in
         ``pack_sequences``. Range = ``okey >> (64 - log2(P))`` — top
         bits, so ranges are contiguous spans of the global tape.
      2. ONE ``groupby(rpart)`` over the documents: each range sorts
         its docs by okey (bijective hash — total order), lays its
         contiguous token span [a, b) locally, and cuts it at the
         global seq_len boundaries. Every sequence whose L tokens lie
         entirely inside the range is emitted COMPLETE here; only the
         head/tail boundary sequences (≤ 2 per range, < 2·seq_len
         tokens) leave as partial segments ``{seq_id, off, text}``.
      3. fix-up: the ≤ 2P partial segments group by seq_id and
         concatenate in off order — tiny by construction.

    Partition-count invariance: any power-of-two P yields the same
    tape, so output is identical (pytest-pinned). The assembled stream
    materializes once (it IS the product — at the 100-TB scale point
    the full rows would stream straight to a partitioned sink instead;
    the boundary fix-up stays O(P·seq_len) regardless).

    Reference analog: positional reassembly of probe answers
    (`src/main.cpp` ordered merge) applied to corpus layout.
    """
    import ray.data

    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    P = int(num_partitions)
    if P < 2 or (P & (P - 1)):
        raise ValueError("num_partitions must be a power of two >= 2")
    shift = np.uint64(64 - int(P).bit_length() + 1)
    sd = np.uint64(seed)

    def range_sums(batch: pa.Table) -> pa.Table:
        _, counts = _flat_nonempty_with_counts(batch, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        rp = (splitmix64(ids ^ sd) >> shift).astype(np.int64)
        s = np.zeros(P, dtype=np.int64)
        np.add.at(s, rp, counts.astype(np.int64))
        nz = np.flatnonzero(s)
        return pa.table(
            {"rpart": pa.array(nz.astype(np.int32)), "s": pa.array(s[nz])}
        )

    sums = (
        docs.map_batches(range_sums, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("rpart").sum("s")
        .take_all()
    )
    per_range = np.zeros(P, dtype=np.int64)
    for r in sums:
        per_range[int(r["rpart"])] = int(r["sum(s)"])
    offsets = np.concatenate(([0], np.cumsum(per_range)[:-1]))

    def add_keys(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        okey = splitmix64(ids ^ sd)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "text": batch.column("text"),
             "okey": pa.array(okey),
             "rpart": pa.array((okey >> shift).astype(np.int32))}
        )

    def _empty() -> pa.Table:
        return pa.table(
            {"seq_id": pa.array([], pa.int64()),
             "n_tok": pa.array([], pa.int64()),
             "off": pa.array([], pa.int64()),
             "text": pa.array([], pa.string()),
             "full": pa.array([], pa.bool_())}
        )

    from ..stages.text import flat_nonempty_with_offsets

    def assemble(g: pa.Table) -> pa.Table:
        rp = int(g.column("rpart")[0].as_py())
        ok = g.column("okey").to_numpy(zero_copy_only=False)
        g = g.take(pa.array(np.argsort(ok, kind="stable")))
        flat, _ = flat_nonempty_with_offsets(g, "text")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        n = len(flat)
        if n == 0:
            return _empty()
        a = int(offsets[rp])
        b = a + n
        first_seq, last_seq = a // L, (b - 1) // L
        cuts = np.arange(first_seq + 1, last_seq + 1, dtype=np.int64) * L - a
        segs = np.concatenate(([0], cuts, [n]))
        lens = np.diff(segs)
        seq_ids = np.arange(first_seq, last_seq + 1, dtype=np.int64)
        txt = pc.binary_join(
            pa.LargeListArray.from_arrays(pa.array(segs), flat), " "
        )
        return pa.table(
            {"seq_id": pa.array(seq_ids),
             "n_tok": pa.array(lens),
             "off": pa.array((a + segs[:-1]) % L),
             "text": pc.cast(txt, pa.string()),
             "full": pa.array(lens == L)}
        )

    assembled = (
        docs.map_batches(add_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("rpart")
        .map_groups(assemble, batch_format="pyarrow")
        .materialize()
    )

    def keep_full(t: pa.Table) -> pa.Table:
        t = t.filter(t.column("full"))
        return t.select(["seq_id", "n_tok", "text"])

    def keep_parts(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("full")))

    full = assembled.map_batches(
        keep_full, batch_format="pyarrow", zero_copy_batch=True
    )

    def fix(g: pa.Table) -> pa.Table:
        off = g.column("off").to_numpy(zero_copy_only=False)
        order = np.argsort(off, kind="stable")
        g = g.take(pa.array(order))
        off = off[order]
        nt = g.column("n_tok").to_numpy(zero_copy_only=False)
        if off[0] != 0 or not np.array_equal(
            off[1:], (off[:-1] + nt[:-1])
        ):
            raise ValueError("boundary segments do not tile the sequence")
        txt = " ".join(g.column("text").to_pylist())
        return pa.table(
            {"seq_id": g.column("seq_id").slice(0, 1),
             "n_tok": pa.array([int(nt.sum())], pa.int64()),
             "text": pa.array([txt], pa.string())}
        )

    fixed = (
        assembled.map_batches(
            keep_parts, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("seq_id")
        .map_groups(fix, batch_format="pyarrow")
    )
    return full.union(fixed)


def mix_temperature(
    docs: "Dataset",
    *,
    alpha: float = 0.5,
    budget_tokens: int = 100_000,
    seed: int = 0,
) -> pd.DataFrame:
    """Temperature-based source mixing (Pile/DoReMi-style): source s
    with ``n_s`` total tokens gets a token target ``t_s = round(budget
    · n_s^α / Σ n^α)`` — α < 1 up-weights small sources — and every
    document receives an integer repeat count ``n_repeats``: a base of
    ``t_s // n_s`` epochs for the whole source plus ONE extra epoch
    for the greedy splitmix64-ordered prefix of docs whose
    running-token-sum-before is still under the remainder ``t_s %
    n_s`` (the same SQL-checkable prefix rule as
    :func:`mix_to_budget`). Output: {doc_id, source, n_tok,
    n_repeats}, the repeat plan a training-shard writer consumes.

    All epoch math is INTEGER (floor-div / mod of the int targets), so
    the result is bit-exact under any partitioning; the single float
    step (the α-power weights) collapses into the rounded int targets.

    Scale shape: one skinny per-source token-sum agg (bounded source
    catalog → driver holds O(sources) targets), then one
    source-keyed groupby whose per-group kernel is a sort + cumsum —
    text never shuffles, only {source, doc_id, n_tok, h} rows.
    """
    from .agg import grouped_agg

    a = float(alpha)
    B = int(budget_tokens)
    sd = np.uint64(seed)

    def stats(batch: pa.Table) -> pa.Table:
        _, counts = _flat_nonempty_with_counts(batch, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "source": batch.column("source"),
             "n_tok": pa.array(counts.astype(np.int64)),
             "h": pa.array(splitmix64(ids ^ sd))}
        )

    skinny = docs.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    totals = grouped_agg(
        skinny, "source", {"n": ("sum", "n_tok")}
    ).to_pandas()
    n = totals["n"].to_numpy().astype(np.float64)
    pw = np.power(n, a)
    # half-up matching the oracle's DuckDB ROUND: B*pw/sum hits exact
    # .5 for dyadic power ratios (e.g. perfect-square token totals
    # 1:3969 -> 100000/64 = 1562.5), where np.round's half-even differs
    ts = np.trunc(B * pw / pw.sum() + 0.5).astype(np.int64)
    plan = {
        s: (int(t // tot), int(t % tot))
        for s, t, tot in zip(totals["source"], ts, totals["n"])
        if tot > 0
    }

    def assign(g: pa.Table) -> pa.Table:
        src = g.column("source")[0].as_py()
        base, rem = plan.get(src, (0, 0))
        h = g.column("h").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")  # bijective hash: no ties
        g = g.take(pa.array(order))
        nt = g.column("n_tok").to_numpy(zero_copy_only=False)
        before = np.concatenate(([0], np.cumsum(nt[:-1])))
        reps = base + (before < rem).astype(np.int64)
        return pa.table(
            {"doc_id": g.column("doc_id"),
             "source": g.column("source"),
             "n_tok": g.column("n_tok"),
             "n_repeats": pa.array(reps)}
        )

    out = (
        skinny.groupby("source")
        .map_groups(assign, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype=np.int64),
             "source": pd.Series(dtype=object),
             "n_tok": pd.Series(dtype=np.int64),
             "n_repeats": pd.Series(dtype=np.int64)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


def strip_template_prefix(
    docs: "Dataset",
    *,
    min_frac: float = 0.3,
    max_len: int = 16,
    num_partitions: int = P_SHUF,
) -> tuple[pd.DataFrame, "Dataset"]:
    """Per-source boilerplate HEADER removal: discover, for every
    source, the longest token prefix shared by at least ``min_frac``
    of its documents (the modal L-prefix; ties break to the
    lexicographically smallest prefix) and strip it from the documents
    that carry it. Returns ``(templates, rewritten)``: a per-source
    template table {source, tpl_len, template, n_match} (tpl_len 0 =
    no template found) and the rewritten corpus {doc_id, source,
    stripped, text} — the crawl-pipeline op for scraped page headers.

    Deterministic end-to-end: modal counts are exact grouped
    aggregates; the only driver state is O(sources) templates.

    Scale shape: one skinny pass emits (source, L, prefix) rows for
    L ≤ max_len with per-batch combine (≤ max_len rows per doc, text
    never shuffles); a fixed-P grouped agg counts candidates; a
    source-keyed fold picks the longest qualifying modal prefix; one
    broadcast-free map pass rewrites (templates ride the task closure
    — O(sources) bytes). At web scale the prefix strings would be
    hashed with a verify pass; strings here keep the SQL oracle exact.
    """
    from .agg import grouped_agg

    f = float(min_frac)
    ML = int(max_len)

    def prefix_rows(batch: pa.Table) -> pa.Table:
        # incremental vectorized prefixes: pfx_L = pfx_{L-1} + " " + tok_L
        # (one Arrow binary_join_element_wise per length — no row loop)
        from ..stages.text import flat_nonempty_with_offsets

        flat, offs = flat_nonempty_with_offsets(batch, "text")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        src = batch.column("source").to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        outs_s, outs_l, outs_p = [], [], []
        active = np.flatnonzero(counts >= 1)
        if len(active):
            pfx = flat.take(pa.array(offs[:-1][active]))
            for L in range(1, ML + 1):
                outs_s.append(src[active])
                outs_l.append(np.full(len(active), L, dtype=np.int64))
                outs_p.append(np.asarray(pfx))
                nxt = counts[active] >= L + 1
                if L == ML or not nxt.any():
                    break
                active = active[nxt]
                tok = flat.take(pa.array(offs[:-1][active] + L))
                pfx = pc.binary_join_element_wise(
                    pfx.take(pa.array(np.flatnonzero(nxt))), tok, " "
                )
        if not outs_s:
            return pa.table(
                {"source": pa.array([], pa.string()),
                 "L": pa.array([], pa.int64()),
                 "pfx": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        import pandas as pd_

        df = pd_.DataFrame(
            {"source": np.concatenate(outs_s),
             "L": np.concatenate(outs_l),
             "pfx": np.concatenate(outs_p)}
        )
        g = df.groupby(["source", "L", "pfx"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    cand = grouped_agg(
        docs.map_batches(prefix_rows, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["source", "L", "pfx"], {"n": ("sum", "c")},
        num_partitions=int(num_partitions),
    )

    ndocs = grouped_agg(docs, "source", {"nd": ("count", None)}).to_pandas()
    need = {r.source: int(np.ceil(f * r.nd)) for r in ndocs.itertuples()}

    def pick(g: pa.Table) -> pa.Table:
        src = g.column("source")[0].as_py()
        thr = max(need.get(src, 1), 1)
        df = g.to_pandas()
        df = df[df["n"] >= thr]
        if not len(df):
            return pa.table(
                {"source": pa.array([src]), "tpl_len": pa.array([0], pa.int64()),
                 "template": pa.array([""]), "n_match": pa.array([0], pa.int64())}
            )
        Lmax = int(df["L"].max())
        best = df[df["L"] == Lmax].sort_values(["n", "pfx"],
                                               ascending=[False, True]).iloc[0]
        return pa.table(
            {"source": pa.array([src]), "tpl_len": pa.array([Lmax], pa.int64()),
             "template": pa.array([str(best["pfx"])]),
             "n_match": pa.array([int(best["n"])], pa.int64())}
        )

    templates = (
        cand.groupby("source").map_groups(pick, batch_format="pyarrow")
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    tpl = {r.source: (int(r.tpl_len), r.template)
           for r in templates.itertuples() if int(r.tpl_len) > 0}

    def strip(batch: pa.Table) -> pa.Table:
        # vectorized match + rewrite: per SOURCE (bounded catalog) a
        # token-column equality check; the rewrite drops matched heads
        # by masking the flat token array and re-cutting offsets
        from ..stages.text import flat_nonempty_with_offsets

        flat, offs = flat_nonempty_with_offsets(batch, "text")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        words = np.asarray(flat)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        n = batch.num_rows
        drop = np.zeros(n, dtype=np.int64)
        for s, (L, template) in tpl.items():
            rows = np.flatnonzero((src == s) & (counts >= L))
            if not len(rows):
                continue
            toks = template.split(" ")
            idx = offs[:-1][rows][:, None] + np.arange(L)[None, :]
            w = words[idx]
            match = np.logical_and.reduce(
                [w[:, j] == toks[j] for j in range(L)]
            )
            drop[rows[match]] = L
        keep = np.ones(len(words), dtype=bool)
        hit = np.flatnonzero(drop > 0)
        if len(hit):
            lens = drop[hit]
            head = np.repeat(offs[:-1][hit], lens) + (
                np.arange(int(lens.sum()))
                - np.repeat(np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
            )
            keep[head] = False
        new_offs = np.concatenate(([0], np.cumsum(counts - drop)))
        txt = pc.binary_join(
            pa.LargeListArray.from_arrays(
                pa.array(new_offs), flat.filter(pa.array(keep))
            ),
            " ",
        )
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "source": batch.column("source"),
             "stripped": pa.array(drop > 0),
             "text": pc.cast(txt, pa.string())}
        )

    rewritten = docs.map_batches(strip, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return templates, rewritten


# --------------------------------------------------------------- PII scrub
# (name, RE2 pattern, replacement). Applied IN ORDER: each pattern's
# count and replacement run on the output of the previous one, so
# n_<name> is the number of replacements actually performed (an email
# whose local part looks like a phone number counts once, as email).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IPV4>"),
)


def redact_pii(
    docs: "Dataset",
    *,
    text_col: str = "text",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> "Dataset":
    """Regex PII redaction (emails, phone numbers, IPv4 addresses) —
    the C4/FineWeb-style scrub every public-crawl pipeline runs.

    Map-only and fully vectorized: each pattern is one Arrow RE2
    kernel pass (``count_substring_regex`` then
    ``replace_substring_regex``) over the batch's string column — no
    per-row Python, no state, no shuffle, so the stage streams at
    reader speed at any corpus size. Patterns apply in declared
    order; counts reflect replacements actually performed (see
    ``PII_PATTERNS``). DuckDB's regex engine is also RE2, so the
    semantics are SQL-oracle-exact (``regexp_replace(..., 'g')`` /
    ``len(regexp_extract_all(...))``).

    Returns the input columns with ``text_col`` rewritten plus one
    int64 ``n_<name>`` count column per pattern.
    """

    def scrub(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        counts = {}
        for name, pat, rep in patterns:
            counts[name] = pc.cast(
                pc.count_substring_regex(txt, pattern=pat), pa.int64()
            )
            txt = pc.replace_substring_regex(txt, pattern=pat, replacement=rep)
        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col,
            pc.cast(txt, pa.string()),
        )
        for name, arr in counts.items():
            out = out.append_column(f"n_{name}", arr)
        return out

    return docs.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def snake_shards(
    docs: "Dataset",
    *,
    num_shards: int = 8,
    text_col: str = "text",
) -> "Dataset":
    """Token-balanced shard assignment → ``{doc_id, n_tok, rank,
    shard}``: docs ranked by (n_tok DESC, doc_id ASC) and dealt in
    SNAKE (boustrophedon) order — rank r → s = r mod 2S, shard = s if
    s < S else 2S−1−s — the deterministic balanced alternative to
    greedy LPT packing (which is inherently sequential): consecutive
    largest docs spread across all shards, then reverse, so shard
    token sums stay within one doc of each other for monotone sizes.

    Distributed rank without a global sort operator (the
    ``pack_sequences`` shape): one grouped count per DISTINCT length
    (O(distinct lengths) driver state — lengths are bounded; for a
    corpus with a heavy modal length, salt the groupby), driver
    prefix offsets over lengths sorted DESC, then one length-keyed
    groupby ranks each group locally by doc_id. Only 16-byte skinny
    rows shuffle; text never moves. Partition-invariant by
    construction; the SQL mirror is ROW_NUMBER() OVER (ORDER BY
    n_tok DESC, doc_id) − 1 plus the same fold.
    """
    from ..stages.text import _flat_nonempty_with_counts
    from .agg import grouped_agg

    S = int(num_shards)

    def ntok(batch: pa.Table) -> pa.Table:
        _, counts = _flat_nonempty_with_counts(batch, text_col)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_tok": pa.array(counts.astype(np.int64))}
        )

    skinny = docs.map_batches(
        ntok, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    hist = grouped_agg(
        skinny, "n_tok", {"n": ("count", "doc_id")}, num_partitions=16
    ).to_pandas()
    lens = hist["n_tok"].to_numpy()
    ns = hist["n"].to_numpy()
    order = np.argsort(-lens)
    lens, ns = lens[order], ns[order]
    offsets = dict(zip(
        lens.tolist(),
        np.concatenate([[0], np.cumsum(ns)[:-1]]).tolist(),
    ))

    def rank_group(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        nt = int(g.column("n_tok")[0].as_py())
        o = np.argsort(ids, kind="stable")
        rank = offsets[nt] + np.arange(len(ids), dtype=np.int64)
        s = rank % (2 * S)
        shard = np.where(s < S, s, 2 * S - 1 - s)
        return pa.table(
            {"doc_id": pa.array(ids[o]),
             "n_tok": pa.array(np.full(len(ids), nt, dtype=np.int64)),
             "rank": pa.array(rank),
             "shard": pa.array(shard.astype(np.int64))}
        )

    return skinny.groupby("n_tok").map_groups(
        rank_group, batch_format="pyarrow"
    )


# --------------------------------------------- rendezvous (HRW) sharding
def rendezvous_shards(
    ds: "Dataset",
    *,
    n_shards: int = 8,
    n_shards_after: int = 9,
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Highest-random-weight (rendezvous) shard assignment plus its
    defining stability property, measured: assign every doc under
    ``n_shards`` and under ``n_shards_after`` shards and count, per
    original shard, how many docs move — HRW guarantees a doc's shard
    changes ONLY if the new shard wins its argmax, so growing the
    ring from N to N+1 relocates ≈ 1/(N+1) of keys and every mover
    lands on the new shard (pytest-pinned). This is the
    consistent-placement primitive for incremental 100-TB stores: a
    node join/leave invalidates one shard's fraction, not a full
    rehash (mod-N sharding moves (N-1)/N of all keys).

    Deterministic derived randomness: score(doc, shard) =
    splitmix64(doc_id·16 + shard) (injective for shard < 16; loud
    failure otherwise), winner = max score, ties (2⁻⁶⁴-improbable,
    still defined) to the lowest shard. Map-only vectorized argmax per
    batch — the (docs × shards) score matrix never materializes
    globally — then one fixed-P grouped count of O(shards) partials.
    Output: {shard, n_docs, n_moved}.

    Reference analog: the hash-derived partition routing
    (src/SkmerExtractor.cpp:164), upgraded from mod-P to the
    placement scheme that survives membership change.
    """
    if not (0 < n_shards < n_shards_after <= 16):
        raise ValueError("need 0 < n_shards < n_shards_after <= 16")
    from .agg import grouped_agg

    nb, na = int(n_shards), int(n_shards_after)

    def derive(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids < 0).any():
            raise ValueError("rendezvous_shards: negative ids unsupported")
        if len(ids) and int(ids.max()) >= (1 << 60):
            # ids*16 wraps mod 2^64 past 2^60, so two ids 2^60 apart
            # would share every score — keep the injectivity promise loud
            raise ValueError(
                "rendezvous_shards: doc_id >= 2^60 breaks the "
                "id*16+shard injective encoding")
        z0 = ids.astype(np.uint64)[:, None] * np.uint64(16) + np.arange(
            na, dtype=np.uint64
        )[None, :]
        h = splitmix64(z0.ravel()).reshape(len(ids), na)
        # np.argmax returns the FIRST max → lowest shard on a tie
        before = np.argmax(h[:, :nb], axis=1).astype(np.int64)
        after = np.argmax(h, axis=1).astype(np.int64)
        moved = (after != before).astype(np.int64)
        return pa.table({"shard": pa.array(before), "mv": pa.array(moved)})

    out = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["shard"],
        {"n_docs": ("count", None), "n_moved": ("sum", "mv")},
        num_partitions=num_partitions,
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["n_moved"] = out["n_moved"].astype(np.int64)
    return out.sort_values("shard").reset_index(drop=True)
