"""Approximate + exact analytics pipelines (north-rule operators).

Each sketch operator comes in two modes:
- sketch mode: the scale path — per-block partial sketch, tree merge
  (``SketchAgg``), answers within the family's published error bound
  (asserted in pytest against exact oracles);
- exact mode: the same pipeline skeleton with exact aggregates —
  DuckDB-oracle-checkable by the driver (FIXTURES.md F5), and the
  small-data reference for the sketch mode's bound tests.

Exact modes still follow the scale rules: per-batch combiners before
any shuffle, aggregates over partials, no driver-side row loops.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import CountMinSketch, HyperLogLog, KLL, TDigest
from ..state.base import deserialize_sketch
from ..stages.sketch_agg import PartialMergeAgg, SketchAgg

if TYPE_CHECKING:
    from ray.data import Dataset


# --------------------------------------------------------------- distinct
def distinct_count_exact(ds: "Dataset", unique_fn, out_name: str = "distinct_tokens") -> pd.DataFrame:
    """Global distinct count → 1-row DataFrame {out_name}.

    ``unique_fn`` is a per-batch combiner emitting already-deduped
    {tok} rows; distinct counting then runs over 64-bit token hashes
    inside fixed hash partitions. Exact up to 64-bit collisions
    (P[any] ~ n²/2^65 — same stance as dedup_exact; every fixture
    matches the string-exact DuckDB oracle bit-for-bit). Shuffle
    volume is bounded by distinct-per-batch, not total occurrences.
    """
    exploded = ds.map_batches(unique_fn, batch_format="pyarrow", zero_copy_batch=True)

    # distinct via fixed hash partitions (not one Ray group per token —
    # per-group overhead is pathological at web-scale vocabularies):
    # each partition np.uniques its token hashes in one kernel
    from ..functions.hashing import hash_strings

    P_SHUF = 64

    def add_tp(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column("tok").combine_chunks()).view(np.int64)
        return pa.table({"tp": pa.array(np.abs(h) % P_SHUF), "th": pa.array(h)})

    def count_distinct(g: pa.Table) -> pa.Table:
        th = g.column("th").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(np.unique(th))], pa.int64())})

    parts = (
        exploded.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(count_distinct, batch_format="pyarrow")
    )
    n = int(parts.sum("n") or 0)
    return pd.DataFrame({out_name: pd.array([n], dtype="int64")})


def distinct_count_hll(ds: "Dataset", hash_fn, p: int = 14) -> pd.DataFrame:
    """HLL estimate of global distinct → 1-row {estimate, rel_error_bound}."""
    hashed = ds.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)
    res = hashed.aggregate(SketchAgg(lambda: HyperLogLog(p), on="gh"))
    blob = res["sketch"] if res else None
    hll = deserialize_sketch(blob) if blob is not None else HyperLogLog(p)
    return pd.DataFrame(
        {"estimate": [float(hll.estimate())], "rel_error_bound": [hll.rel_error()]}
    )


def token_f2_countsketch(
    ds: "Dataset",
    hash_fn,
    width: int = 1 << 13,
    depth: int = 7,
) -> pd.DataFrame:
    """Second frequency moment (F2 / self-join size) of the token
    stream via a Count-Sketch → 1-row {f2_estimate, rel_error_bound,
    point_err_bound, n_tokens}.

    F2 = sum_tok count(tok)^2 is the token-level self-join size — the
    standard skew statistic that prices any token-keyed shuffle or join
    (AMS 1996). One streaming pass, per-block partial sketches,
    ``SketchAgg`` tree merge; the sketch is ~depth*width*8 bytes of
    state regardless of vocabulary, and its merge is bit-exact under
    any tree shape (tests). rel_error_bound is the AMS one-sigma bound
    sqrt(2/width) concentrated by the median over ``depth`` rows;
    point_err_bound is the per-item two-sided radius 3*sqrt(F2/width)
    the same sketch guarantees for unbiased per-token estimates
    (``CountSketch.estimate_hashes``).
    """
    from ..state import CountSketch

    hashed = ds.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)
    res = hashed.aggregate(
        SketchAgg(lambda: CountSketch(width=width, depth=depth), on="gh")
    )
    blob = res["sketch"] if res else None
    cs = deserialize_sketch(blob) if blob is not None else CountSketch(width, depth)
    return pd.DataFrame(
        {
            "f2_estimate": [cs.estimate_f2()],
            "rel_error_bound": [float(np.sqrt(2.0 / cs.width))],
            "point_err_bound": [cs.error_bound()],
            "n_tokens": [int(cs.total)],
        }
    )


def token_f2_exact(ds: "Dataset", counts_fn) -> pd.DataFrame:
    """Exact token-frequency second moment → 1-row {f2, n_distinct}.

    The exact-mode skeleton of :func:`token_f2_countsketch` (and its
    oracle anchor): per-batch partial counts (combiner) → fixed-P
    token-hash shuffle → per-partition exact per-token sums → each
    partition emits ONE (sum c^2, distinct) row → driver folds P rows.
    int64 throughout — exact at driver scales; the sketch mode is the
    10^12-token scale path (where F2 itself outgrows int64).
    """
    partials = ds.map_batches(counts_fn, batch_format="pyarrow", zero_copy_batch=True)
    P_SHUF = 64

    def add_tp(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        h = hash_strings(t.column("tok").combine_chunks()).view(np.int64)
        return t.append_column("tp", pa.array(np.abs(h) % P_SHUF))

    def part_f2(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"tok": g.column("tok").to_pandas(),
             "cnt": g.column("cnt").to_numpy(zero_copy_only=False)}
        )
        sums = df.groupby("tok", sort=False)["cnt"].sum().to_numpy(dtype=np.int64)
        return pa.table({
            "f2": pa.array([int((sums * sums).sum())], pa.int64()),
            "n_distinct": pa.array([len(sums)], pa.int64()),
        })

    folded = (
        partials.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(part_f2, batch_format="pyarrow")
    )
    agg = folded.sum(["f2", "n_distinct"])
    # empty corpus: Dataset.sum returns None (or a dict of Nones) —
    # same guard shape as distinct_count_exact's `or 0`
    return pd.DataFrame({
        "f2": pd.array([int((agg or {}).get("sum(f2)") or 0)],
                       dtype="int64"),
        "n_distinct": pd.array(
            [int((agg or {}).get("sum(n_distinct)") or 0)], dtype="int64"),
    })


# ----------------------------------------------------------- heavy hitters
def heavy_hitters_exact(ds: "Dataset", counts_fn, topk: int = 20) -> pd.DataFrame:
    """Exact top-k token counts → DataFrame {tok, cnt}.

    Per-batch partial counts (combiner) → small groupby sum → sort
    (cnt desc, tok asc — deterministic ties) → limit.
    """
    partials = ds.map_batches(counts_fn, batch_format="pyarrow", zero_copy_batch=True)

    # per-token sums inside fixed hash partitions; each partition emits
    # only its local top-k (global top-k is a subset of the union), so
    # the final sort sees P x topk rows regardless of vocabulary size
    P_SHUF = 64

    def add_tp(t: pa.Table) -> pa.Table:
        from ..functions.hashing import hash_strings

        h = hash_strings(t.column("tok").combine_chunks()).view(np.int64)
        return t.append_column("tp", pa.array(np.abs(h) % P_SHUF))

    def local_topk(g: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame(
            {"tok": g.column("tok").to_pandas(),
             "cnt": g.column("cnt").to_numpy(zero_copy_only=False)}
        )
        sums = df.groupby("tok", sort=False)["cnt"].sum().reset_index()
        sums = sums.sort_values(["cnt", "tok"], ascending=[False, True]).head(topk)
        return pa.table({"tok": pa.array(sums["tok"], pa.string()),
                         "cnt": pa.array(sums["cnt"].to_numpy(dtype=np.int64))})

    cand = (
        partials.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(local_topk, batch_format="pyarrow")
    )
    top = cand.sort(["cnt", "tok"], descending=[True, False]).limit(topk)
    return top.to_pandas()


def heavy_hitters_cms(
    ds: "Dataset",
    counts_fn,
    hash_fn,
    topk: int = 20,
    width: int = 1 << 16,
    depth: int = 5,
    mg_capacity: int = 4096,
) -> pd.DataFrame:
    """Fully sketch-side heavy hitters: Misra-Gries candidates + CMS
    frequency estimates → {tok, lower_cnt, est_cnt, err_bound, eps_bound}.

    Candidate IDENTITIES come from a mergeable Misra-Gries summary
    (per-block partial → tree merge; any item with frequency >
    n/(capacity+1) is guaranteed tracked), NOT from the exact
    pipeline — so this is a true fixed-memory scale path: no per-token
    shuffle, no exact side pass. Two bounds sandwich each truth:
    MG counter (lower, undercount <= err_bound) and CMS estimate
    (upper, overcount <= eps_bound w.h.p.); both asserted against
    exact counts in pytest.
    """
    from ..state import MisraGries

    mg_factory = lambda: MisraGries(mg_capacity)  # noqa: E731

    def mg_partial(batch: pa.Table) -> pa.Table:
        s = mg_factory()
        s.update_items(
            batch.column("tok").to_pylist(),
            batch.column("cnt").to_numpy(zero_copy_only=False),
        )
        return pa.table({"partial": pa.array([s.serialize()], pa.binary())})

    counted = ds.map_batches(counts_fn, batch_format="pyarrow", zero_copy_batch=True)
    partials = counted.map_batches(mg_partial, batch_format="pyarrow", zero_copy_batch=True)
    res_mg = partials.aggregate(PartialMergeAgg(mg_factory))
    blob = res_mg["sketch"] if res_mg else None
    mg = deserialize_sketch(blob) if blob is not None else mg_factory()
    toks, lower = mg.topk(topk)

    hashed = ds.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)
    res = hashed.aggregate(SketchAgg(lambda: CountMinSketch(width=width, depth=depth), on="gh"))
    # empty dataset: aggregate returns None (mirror the MG guard above)
    cms = (deserialize_sketch(res["sketch"]) if res
           else CountMinSketch(width=width, depth=depth))
    from ..functions.hashing import hash_strings

    est = cms.estimate_hashes(hash_strings(pd.Series(toks, dtype="string")))
    return pd.DataFrame(
        {
            "tok": pd.array(toks, dtype="object"),
            "lower_cnt": lower,
            "est_cnt": est,
            "err_bound": int(mg.error_bound()),
            "eps_bound": float(cms.eps * cms.total),
        }
    )


def heavy_hitters_by_group(
    ds: "Dataset", counts_fn, by: str, topk: int = 5
) -> pd.DataFrame:
    """Per-group top-k token counts → {by, tok, cnt} (grouped ranking).

    Same fixed-partition shape as the global top-k: counts shuffle on
    ``hash(tok) % P`` (all of one token's counts land together, so
    local per-(group, token) sums are exact), each partition emits its
    local per-group top-k, and the tiny final merge re-ranks
    P × groups × topk rows. Ties deterministic: (cnt desc, tok asc).
    """
    from ..functions.hashing import hash_strings

    P_SHUF = 64

    partials = ds.map_batches(counts_fn, batch_format="pyarrow", zero_copy_batch=True)

    def add_tp(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column("tok").combine_chunks()).view(np.int64)
        return t.append_column("tp", pa.array(np.abs(h) % P_SHUF))

    def local_topk(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # dropna=False: a NULL group is a group (SQL GROUP BY semantics)
        sums = df.groupby([by, "tok"], sort=False, dropna=False)["cnt"].sum().reset_index()
        sums = sums.sort_values(["cnt", "tok"], ascending=[False, True])
        top = sums.groupby(by, sort=False, dropna=False).head(topk)
        return pa.table(
            {by: pa.array(top[by], pa.string()), "tok": pa.array(top["tok"], pa.string()),
             "cnt": pa.array(top["cnt"].to_numpy(dtype=np.int64))}
        )

    cand = (
        partials.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(local_topk, batch_format="pyarrow")
    )
    # final re-rank of the tiny candidate set (P × groups × topk rows)
    # runs driver-side — a second distributed shuffle for it would be
    # pure task-launch overhead
    out = cand.to_pandas()
    if out.empty:
        return pd.DataFrame({by: [], "tok": [], "cnt": pd.array([], dtype="int64")})
    out = out.sort_values(["cnt", "tok"], ascending=[False, True])
    out = out.groupby(by, sort=False, dropna=False).head(topk)
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values(
        [by, "cnt", "tok"], ascending=[True, False, True]
    ).reset_index(drop=True)


def counting_bloom_retract(
    ds: "Dataset",
    retract_source: str,
    *,
    text_col: str = "text",
    source_col: str = "source",
    num_bits: int = 1 << 22,
    num_hashes: int = 4,
) -> pd.DataFrame:
    """Corpus membership with RETRACTION via a counting Bloom filter →
    1-row {n_added, n_deleted, n_live, kept_contained, kept_total,
    retracted_contained, retracted_total, fpr_bound}.

    ONE streaming pass builds the global filter: each block's partial
    CountingBloom inserts every (source, text) key and retracts the
    block's ``retract_source`` rows, then ``PartialMergeAgg``
    tree-merges the counter arrays (inserts and deletes commute under
    counter addition, so merge order is free — the capability the
    plain Bloom's OR-merge can't express). A second map-only pass
    probes every row against the broadcast filter and folds two exact
    int64 partials per block. Zero-FN invariant: kept_contained ==
    kept_total always; retracted keys (disjoint from kept keys by the
    source prefix) test positive only at the counting-Bloom FPR of the
    LIVE population — retraction genuinely restores FPR headroom.
    """
    import ray

    from ..functions.hashing import hash_strings
    from ..state import CountingBloom

    factory = lambda: CountingBloom(num_bits, num_hashes)  # noqa: E731

    def _keys(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        import pyarrow.compute as pc

        joined = pc.binary_join_element_wise(
            pc.cast(t.column(source_col), pa.string()),
            pc.cast(t.column(text_col), pa.string()),
            "\x1f",
        )
        h = hash_strings(joined.combine_chunks())
        retract = pc.equal(t.column(source_col), retract_source).to_numpy(
            zero_copy_only=False
        )
        return h, retract

    def partial(t: pa.Table) -> pa.Table:
        s = factory()
        h, retract = _keys(t)
        s.update_hashes(h)
        s.delete_hashes(h[retract])
        return pa.table({"partial": pa.array([s.serialize()], pa.binary())})

    res = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        PartialMergeAgg(factory)
    )
    blob = res["sketch"] if res else None
    cb = deserialize_sketch(blob) if blob is not None else factory()
    cb_ref = ray.put(cb)

    def probe(t: pa.Table) -> pa.Table:
        filt = ray.get(cb_ref)
        h, retract = _keys(t)
        hit = filt.contains(h)
        return pa.table({
            "kept_contained": pa.array([int(hit[~retract].sum())], pa.int64()),
            "kept_total": pa.array([int((~retract).sum())], pa.int64()),
            "retracted_contained": pa.array([int(hit[retract].sum())], pa.int64()),
            "retracted_total": pa.array([int(retract.sum())], pa.int64()),
        })

    folded = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["kept_contained", "kept_total", "retracted_contained", "retracted_total"]
    )
    return pd.DataFrame({
        "n_added": pd.array([cb.n_added], dtype="int64"),
        "n_deleted": pd.array([cb.n_deleted], dtype="int64"),
        "n_live": pd.array([cb.n_live()], dtype="int64"),
        "kept_contained": pd.array([int(folded["sum(kept_contained)"] or 0)], dtype="int64"),
        "kept_total": pd.array([int(folded["sum(kept_total)"] or 0)], dtype="int64"),
        "retracted_contained": pd.array(
            [int(folded["sum(retracted_contained)"] or 0)], dtype="int64"),
        "retracted_total": pd.array([int(folded["sum(retracted_total)"] or 0)], dtype="int64"),
        "fpr_bound": [cb.fpr_bound()],
    })


def sliding_distinct_exact(
    ds: "Dataset",
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    bucket_s: int = 3600,
    window_buckets: int = 3,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Exact sliding-window COUNT(DISTINCT key) → {ws, distinct_users}
    for every hop-aligned window start covering at least one event
    (``ws`` = epoch seconds of the window's first bucket; window spans
    ``window_buckets`` buckets of ``bucket_s`` seconds, sliding one
    bucket per hop).

    Distinct is not sum-decomposable, so the exact plan replicates the
    DISTINCT (key, bucket) PAIR SET — never the raw events — w-fold:
    (1) one grouped distinct collapses events to pairs, (2) a map-only
    explode fans each pair to the w windows containing its bucket,
    (3) a (window, key) grouped distinct removes multi-bucket repeats,
    (4) a window-keyed count. Three exchanges, all over pair-scale
    rows. :func:`sliding_distinct_hll` is the sketch path that drops
    the w-fold replication entirely.
    """
    from .agg import grouped_agg

    w = int(window_buckets)
    bs = int(bucket_s)
    if w < 1 or bs < 1:
        raise ValueError("sliding_distinct: window_buckets and bucket_s must be >= 1")

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(pc.is_valid(t.column(ts_col)), pc.is_valid(t.column(key_col)))
        t = t.filter(ok)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False)
        b = (ts.astype("datetime64[s]").astype(np.int64) // bs) * bs
        return pa.table({"b": pa.array(b), "k": t.column(key_col)})

    pairs = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["b", "k"], {"__c": ("count", None)}, num_partitions=num_partitions,
    ).select_columns(["b", "k"])

    def explode(t: pa.Table) -> pa.Table:
        b = t.column("b").to_numpy(zero_copy_only=False)
        k = t.column("k").combine_chunks()
        n = len(b)
        idx = np.repeat(np.arange(n, dtype=np.int64), w)
        ws = np.repeat(b, w) - np.tile(np.arange(w, dtype=np.int64) * bs, n)
        return pa.table({"ws": pa.array(ws), "k": k.take(pa.array(idx))})

    dedup = grouped_agg(
        pairs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["ws", "k"], {"__c": ("count", None)}, num_partitions=num_partitions,
    ).select_columns(["ws"])
    counts = grouped_agg(
        dedup, "ws", {"distinct_users": ("count", None)},
        num_partitions=num_partitions,
    )
    df = counts.to_pandas()
    df["ws"] = df["ws"].astype("int64")
    df["distinct_users"] = df["distinct_users"].astype("int64")
    return df.sort_values("ws").reset_index(drop=True)


def sliding_distinct_hll(
    ds: "Dataset",
    *,
    ts_col: str = "ts",
    key_col: str = "user_id",
    bucket_s: int = 3600,
    window_buckets: int = 3,
    p: int = 14,
) -> pd.DataFrame:
    """Sliding COUNT(DISTINCT) via mergeable per-bucket HyperLogLogs →
    {ws, estimate, rel_error_bound}: the scale path of
    :func:`sliding_distinct_exact`.

    HLL union is lossless merge, so distinct-over-window decomposes:
    ONE grouped sketch build (bucket-keyed ``SketchAgg``, map-side
    partials) replaces the exact plan's w-fold pair replication, then
    the driver slides a w-bucket merge over the per-bucket sketches —
    O(buckets * 2^p) driver state (time-bounded, independent of keys
    and events), each window estimate within the published
    1.04/sqrt(2^p) bound of the exact count (asserted in pytest).
    """
    from ..functions.hashing import hash_strings, splitmix64

    w = int(window_buckets)
    bs = int(bucket_s)
    if w < 1 or bs < 1:
        raise ValueError("sliding_distinct: window_buckets and bucket_s must be >= 1")

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.and_(pc.is_valid(t.column(ts_col)), pc.is_valid(t.column(key_col)))
        t = t.filter(ok)
        ts = t.column(ts_col).to_numpy(zero_copy_only=False)
        b = (ts.astype("datetime64[s]").astype(np.int64) // bs) * bs
        col = t.column(key_col)
        if pa.types.is_integer(col.type):
            gh = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            import pyarrow.compute as pc2

            gh = hash_strings(pc2.cast(col, pa.string()).combine_chunks())
        return pa.table({"b": pa.array(b), "gh": pa.array(gh, pa.uint64())})

    rows = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .aggregate(SketchAgg(lambda: HyperLogLog(p), on="gh"))
        .take_all()
    )
    if not rows:
        return pd.DataFrame({"ws": pd.Series(dtype="int64"),
                             "estimate": pd.Series(dtype="float64"),
                             "rel_error_bound": pd.Series(dtype="float64")})
    by_bucket = {int(r["b"]): r["sketch"] for r in rows}
    buckets = sorted(by_bucket)
    bset = set(buckets)
    starts = sorted({b - j * bs for b in buckets for j in range(w)})
    del bset  # every constructed start covers >= 1 observed bucket
    out_ws, out_est = [], []
    for ws_ in starts:
        acc = HyperLogLog(p)
        for j in range(w):
            blob = by_bucket.get(ws_ + j * bs)
            if blob is not None:
                acc.merge(deserialize_sketch(blob))
        out_ws.append(ws_)
        out_est.append(float(acc.estimate()))
    bound = HyperLogLog(p).rel_error()
    return pd.DataFrame({"ws": pd.array(out_ws, dtype="int64"),
                         "estimate": out_est,
                         "rel_error_bound": bound})


def _key_hash_fn(key: str):
    """Per-batch key -> uint64 'gh' column (int fast path, string cast
    otherwise; nulls dropped — SQL inner-join keys never match null)."""

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.hashing import hash_strings, splitmix64

        col = t.column(key)
        col = col.filter(pc.is_valid(col))
        if pa.types.is_integer(col.type):
            h = splitmix64(col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = hash_strings(pc.cast(col, pa.string()).combine_chunks())
        return pa.table({"gh": pa.array(h, pa.uint64())})

    return fn


def join_size_countsketch(
    left: "Dataset",
    right: "Dataset",
    left_key: str,
    right_key: str,
    *,
    width: int = 1 << 13,
    depth: int = 7,
) -> pd.DataFrame:
    """Equi-join SIZE estimate |left join right| WITHOUT a shuffle —
    the AGMS sketch inner product (Alon-Gibbons-Matias-Szegedy
    PODS'99) → 1-row {est_join_size, err_bound, n_left, n_right}.

    One streaming pass per side builds a CountSketch of the join-key
    frequency vector (``SketchAgg`` tree merge, O(depth*width) state);
    the estimate is the median over rows of the two count matrices'
    dot products — unbiased, with 3-sigma radius
    3*sqrt(F2_l * F2_r / width). This is the shuffle-pricing primitive:
    it tells a planner whether a join explodes BEFORE paying the
    all-to-all (pytest asserts the bound against the exact
    :func:`join_size_exact` twin)."""
    from ..state import CountSketch

    factory = lambda: CountSketch(width=width, depth=depth)  # noqa: E731
    sketches = []
    for ds, key in ((left, left_key), (right, right_key)):
        res = ds.map_batches(
            _key_hash_fn(key), batch_format="pyarrow", zero_copy_batch=True
        ).aggregate(SketchAgg(factory, on="gh"))
        blob = res["sketch"] if res else None
        sketches.append(deserialize_sketch(blob) if blob is not None else factory())
    a, b = sketches
    return pd.DataFrame(
        {
            "est_join_size": [a.estimate_inner(b)],
            "err_bound": [a.inner_error_bound(b)],
            "n_left": [int(a.total)],
            "n_right": [int(b.total)],
        }
    )


def join_size_exact(
    left: "Dataset",
    right: "Dataset",
    left_key: str,
    right_key: str,
    *,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Exact equi-join size → 1-row {join_size, n_left, n_right}: the
    oracle anchor of :func:`join_size_countsketch`. Never materializes
    the join — each side collapses to per-key counts (map-side
    combined), ONE key-hash join of the two count tables, then a sum
    of count products. int64-exact at driver scales."""
    from .agg import grouped_agg
    from .join import hash_join

    cl = grouped_agg(left, left_key, {"__cl": ("count", None)},
                     num_partitions=num_partitions)
    cr = grouped_agg(right, right_key, {"__cr": ("count", None)},
                     num_partitions=num_partitions)
    nl = int(cl.sum("__cl") or 0)
    nr = int(cr.sum("__cr") or 0)

    def drop_null_key(key):
        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.is_valid(t.column(key)))

        return fn

    j = hash_join(
        cl.map_batches(drop_null_key(left_key), batch_format="pyarrow",
                       zero_copy_batch=True),
        cr.map_batches(drop_null_key(right_key), batch_format="pyarrow",
                       zero_copy_batch=True),
        on=left_key, right_on=right_key, how="inner", broadcast="auto",
    )

    def prod(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        p = pc.multiply(pc.cast(t.column("__cl"), pa.int64()),
                        pc.cast(t.column("__cr"), pa.int64()))
        return pa.table({"__p": p})

    total = j.map_batches(prod, batch_format="pyarrow", zero_copy_batch=True).sum("__p")
    return pd.DataFrame({
        "join_size": pd.array([int(total or 0)], dtype="int64"),
        "n_left": pd.array([nl], dtype="int64"),
        "n_right": pd.array([nr], dtype="int64"),
    })


# ------------------------------------------------------ corr / simple OLS
def grouped_corr(
    ds: "Dataset",
    by: str | list[str],
    x: str,
    y: str,
    *,
    num_partitions: int = 32,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Per-group Pearson correlation + simple OLS of y on x →
    {by..., n, corr, slope, intercept, r2}.

    One pass, ONE fixed-P key shuffle: the five mergeable moments
    (Σx, Σy, Σxy, Σx², Σy², n) ride :func:`~.agg.grouped_agg`'s
    map-side-combined partials (Σxy as a derived column, Σx²/Σy² via
    the var kinds), then a map-only finalize:

        cov   = E[xy] - E[x]E[y]
        corr  = cov / sqrt(var_x * var_y)      (population == sample)
        slope = cov / var_x;  intercept = E[y] - slope * E[x]
        r2    = corr²

    SQL semantics: rows where EITHER x or y is null are excluded
    (``corr`` / ``regr_*`` pairwise-null behavior); degenerate groups
    (n==1 or zero variance in x) get NULL corr/slope/intercept/r2 like
    SQL. One-pass moments in float64 — results are rounded to
    ``round_dp`` and keep |x|,|y| in sane magnitudes (center upstream
    when |mean| >> std; the docstring caveat of grouped_agg's var).
    """
    from .agg import grouped_agg

    by = [by] if isinstance(by, str) else list(by)

    def derive(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        xv = pc.cast(t.column(x), pa.float64())
        yv = pc.cast(t.column(y), pa.float64())
        ok = pc.and_(pc.is_valid(xv), pc.is_valid(yv))
        t = t.filter(ok)
        xv = pc.cast(t.column(x), pa.float64())
        yv = pc.cast(t.column(y), pa.float64())
        return pa.table(
            {**{k: t.column(k) for k in by},
             "__x": xv, "__y": yv, "__xy": pc.multiply(xv, yv)}
        )

    g = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        by,
        {
            "__mx": ("mean", "__x"),
            "__my": ("mean", "__y"),
            "__mxy": ("mean", "__xy"),
            "__vx": ("var", "__x"),
            "__vy": ("var", "__y"),
            "n": ("count", None),
        },
        num_partitions=num_partitions,
    )
    df = g.to_pandas()
    if df.empty:
        return pd.DataFrame({**{k: pd.Series(dtype=object) for k in by},
                             "n": pd.Series(dtype="int64"),
                             "corr": pd.Series(dtype="float64"),
                             "slope": pd.Series(dtype="float64"),
                             "intercept": pd.Series(dtype="float64"),
                             "r2": pd.Series(dtype="float64")})
    cov = df["__mxy"] - df["__mx"] * df["__my"]
    vx = df["__vx"].to_numpy(dtype=np.float64)
    vy = df["__vy"].to_numpy(dtype=np.float64)
    denom = np.sqrt(np.clip(vx, 0, None) * np.clip(vy, 0, None))
    with np.errstate(divide="ignore", invalid="ignore"):
        corr = np.where(denom > 0, cov / denom, np.nan)
        slope = np.where(vx > 0, cov / vx, np.nan)
    intercept = np.where(vx > 0, df["__my"] - slope * df["__mx"], np.nan)
    out = pd.DataFrame({**{k: df[k] for k in by},
                        "n": df["n"].astype("int64"),
                        "corr": np.round(corr, round_dp),
                        "slope": np.round(slope, round_dp),
                        "intercept": np.round(intercept, round_dp),
                        "r2": np.round(corr * corr, round_dp)})
    return out.sort_values(by).reset_index(drop=True)


# --------------------------------------------------------------- quantiles
def grouped_quantiles_exact(
    ds: "Dataset",
    value_col: str,
    by: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    names: tuple[str, ...] = ("p50", "p95", "p99"),
) -> pd.DataFrame:
    """Exact per-group quantiles, linear interpolation (= DuckDB
    ``quantile_cont``) → {by, p50, p95, p99}.

    Uses ``groupby.map_groups`` with a numpy kernel per group — exact
    mode materializes each group (documented small-side assumption);
    the t-digest/KLL mode below is the unbounded-group scale path.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(dtype=np.float64)
        # quantile_cont IGNORES NULLs; np.quantile would propagate the
        # NaN a null converts to — drop them (all-null group -> NaN,
        # matching SQL's NULL result rendered as NaN)
        v = v[~np.isnan(v)]
        row = {by: [g[by].iloc[0]]}
        for q, name in zip(qs, names):
            row[name] = [float(np.quantile(v, q)) if len(v)
                         else float("nan")]
        return pd.DataFrame(row)

    out = ds.groupby(by).map_groups(per_group, batch_format="pandas")
    return out.to_pandas().sort_values(by).reset_index(drop=True)


def grouped_quantiles_sketch(
    ds: "Dataset",
    value_col: str,
    by: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    names: tuple[str, ...] = ("p50", "p95", "p99"),
    algo: str = "tdigest",
    **algo_kw,
) -> pd.DataFrame:
    """t-digest / KLL per-group quantiles — the mergeable scale path."""
    if algo == "tdigest":
        factory = lambda: TDigest(**{"compression": 200, **algo_kw})  # noqa: E731
    elif algo == "kll":
        factory = lambda: KLL(**{"k": 200, **algo_kw})  # noqa: E731
    else:
        raise ValueError(f"unknown quantile algo {algo!r}")
    agg = SketchAgg(factory, on=value_col, kind="values")
    rows = ds.groupby(by).aggregate(agg).take_all()
    out: dict[str, list] = {by: []}
    for name in names:
        out[name] = []
    for r in sorted(rows, key=lambda r: r[by]):
        sk = deserialize_sketch(r["sketch"])
        out[by].append(r[by])
        for q, name in zip(qs, names):
            out[name].append(float(sk.quantile(q)))
    return pd.DataFrame(out)


# ------------------------------------------------------- grouped distinct
def distinct_count_by_group_exact(ds: "Dataset", unique_fn, by: str) -> pd.DataFrame:
    """Distinct count per group (64-bit-hash exact, see
    distinct_count_exact) → {by, distinct_tokens}.

    ``unique_fn`` emits per-batch-deduped {by, tok}; the double
    groupby collapses to (by, tok) pairs then counts per group —
    shuffle volume bounded by distinct pairs per batch.
    """
    pairs = ds.map_batches(unique_fn, batch_format="pyarrow", zero_copy_batch=True)

    # distinct (group, token) pairs inside fixed hash partitions; only
    # the tiny per-group totals shuffle a second time
    from ..functions.hashing import hash_strings

    P_SHUF = 64

    def add_tp(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column("tok").combine_chunks()).view(np.int64)
        return pa.table(
            {by: t.column(by), "th": pa.array(h), "tp": pa.array(np.abs(h) % P_SHUF)}
        )

    def partition_distinct(g: pa.Table) -> pa.Table:
        import pandas as pd_

        df = pd_.DataFrame(
            {by: g.column(by).to_pandas(), "th": g.column("th").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        # dropna=False: SQL COUNT(DISTINCT ...) GROUP BY keeps the
        # NULL group (same rule heavy_hitters_by_group applies)
        cnt = df.groupby(by, sort=False, dropna=False).size()
        return pa.table(
            {by: pa.array(cnt.index, pa.string()), "n": pa.array(cnt.to_numpy(dtype=np.int64))}
        )

    from ray.data.aggregate import Sum

    out = (
        pairs.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(partition_distinct, batch_format="pyarrow")
        .groupby(by)
        .aggregate(Sum("n", alias_name="distinct_tokens"))
    )
    return out.to_pandas().sort_values(by).reset_index(drop=True)


def distinct_count_by_group_hll(ds: "Dataset", hash_fn, by: str, p: int = 14) -> pd.DataFrame:
    """HLL distinct per group — one mergeable sketch per group key.

    The scale path for grouped cardinality: per-block partial HLLs
    (16 KiB each) shuffle instead of token rows.
    """
    hashed = ds.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)
    rows = hashed.groupby(by).aggregate(SketchAgg(lambda: HyperLogLog(p), on="gh")).take_all()
    out = {by: [], "estimate": [], "rel_error_bound": []}
    for r in sorted(rows, key=lambda r: r[by]):
        sk = deserialize_sketch(r["sketch"])
        out[by].append(r[by])
        out["estimate"].append(float(sk.estimate()))
        out["rel_error_bound"].append(sk.rel_error())
    return pd.DataFrame(out)


def weighted_sample(
    ds: "Dataset",
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 100,
    seed: int = 0,
) -> pd.DataFrame:
    """Weighted random sample WITHOUT replacement: P(doc in sample) ∝
    its weight (Efraimidis-Spirakis A-ES keys: key = u^(1/w), keep the
    top-k) → {id_col, weight_col} sorted by key desc.

    Randomness is DERIVED (splitmix64 of the id hash ⊕ seed), so the
    sample is deterministic and partitioning-independent — re-running
    on a re-sharded corpus yields the identical sample. Distribution
    correctness (inclusion frequency ∝ weight across seeds) is
    asserted in pytest. Scale shape: per-block partial top-k
    (combiner), final merge sees k × blocks rows.
    """
    from ..functions.hashing import hash64_ints, hash_strings

    def block_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # seed + 1: keeps every seed value distinct (hash64_ints treats
        # seed=0 as "unseeded", which would alias two seeds)
        if pa.types.is_integer(ids.type):
            h = hash64_ints(ids.to_numpy(zero_copy_only=False).astype(np.int64), seed=seed + 1)
        else:
            h = hash_strings(ids, seed=seed + 1)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0  # (0, 1]
        with np.errstate(divide="ignore"):
            key = u ** (1.0 / np.maximum(w, 1e-300))
        key = np.where(w > 0, key, -1.0)  # zero-weight rows never sampled
        order = np.argsort(-key, kind="stable")[:k]
        return pa.table(
            {id_col: ids.take(pa.array(order, pa.int64())),
             weight_col: t.column(weight_col).combine_chunks().take(pa.array(order, pa.int64())),
             "akey": pa.array(key[order])}
        )

    partials = ds.map_batches(block_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = partials.to_pandas()  # k × blocks rows — tiny
    df = df[df["akey"] >= 0].sort_values("akey", ascending=False).head(k)
    return df.drop(columns=["akey"]).reset_index(drop=True)


# ------------------------------------------------------------------ set ops
def source_overlap_exact(ds: "Dataset", unique_fn, src_a: str, src_b: str) -> pd.DataFrame:
    """Distinct-token set algebra (64-bit-hash exact, see
    distinct_count_exact) between two sources →
    {n_a, n_b, n_intersection, n_union, jaccard}.

    Partition-vectorized: (source, token-hash) pairs shuffle once on
    ``hash % P``; each partition computes its local membership flags
    for both sides in one numpy pass; only 5 counters per partition
    shuffle again.
    """
    from ..functions.hashing import hash_strings

    P_SHUF = 64

    def add_tp(t: pa.Table) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False)
        keep = (src == src_a) | (src == src_b)
        t = t.filter(pa.array(keep))
        h = hash_strings(t.column("tok").combine_chunks()).view(np.int64)
        is_a = t.column("source").to_numpy(zero_copy_only=False) == src_a
        return pa.table(
            {"tp": pa.array(np.abs(h) % P_SHUF), "th": pa.array(h), "is_a": pa.array(is_a)}
        )

    def partition_sets(g: pa.Table) -> pa.Table:
        th = g.column("th").to_numpy(zero_copy_only=False)
        is_a = g.column("is_a").to_numpy(zero_copy_only=False)
        ua = np.unique(th[is_a])
        ub = np.unique(th[~is_a])
        inter = len(np.intersect1d(ua, ub, assume_unique=True))
        return pa.table(
            {"n_a": pa.array([len(ua)], pa.int64()),
             "n_b": pa.array([len(ub)], pa.int64()),
             "n_i": pa.array([inter], pa.int64())}
        )

    pairs = ds.map_batches(unique_fn, batch_format="pyarrow", zero_copy_batch=True)
    parts = (
        pairs.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(partition_sets, batch_format="pyarrow")
    )
    pdf = parts.to_pandas()
    if pdf.empty:  # neither source present -> well-defined zero row
        return pd.DataFrame(
            {"n_a": [0], "n_b": [0], "n_intersection": [0], "n_union": [0],
             "jaccard": [0.0]}
        )
    df = pdf.sum()
    n_a, n_b, n_i = int(df.n_a), int(df.n_b), int(df.n_i)
    n_u = n_a + n_b - n_i
    return pd.DataFrame(
        {"n_a": [n_a], "n_b": [n_b], "n_intersection": [n_i], "n_union": [n_u],
         "jaccard": [float(n_i) / n_u if n_u else 0.0]}
    )


def source_overlap_kmv(
    ds: "Dataset", unique_fn, src_a: str, src_b: str, k: int = 1024
) -> pd.DataFrame:
    """KMV-estimated overlap — the fixed-memory scale path.

    Two bottom-k sketches (one per side) estimate each cardinality;
    the Jaccard estimate is the sample-overlap ratio within the
    union's bottom-k (Beyer et al. 2007). Bound-tested in pytest.
    """
    from ..functions.hashing import hash_strings
    from ..state import BottomKSample

    def side_hashes(t: pa.Table, side: str) -> pa.Table:
        src = t.column("source").to_numpy(zero_copy_only=False)
        tt = t.filter(pa.array(src == side))
        return pa.table({"gh": hash_strings(tt.column("tok").combine_chunks())})

    pairs = ds.map_batches(unique_fn, batch_format="pyarrow", zero_copy_batch=True)
    sketches = {}
    for side in (src_a, src_b):
        hashed = pairs.map_batches(
            lambda t, s=side: side_hashes(t, s), batch_format="pyarrow"
        )
        res = hashed.aggregate(SketchAgg(lambda: BottomKSample(k), on="gh"))
        blob = res["sketch"] if res else None
        sketches[side] = deserialize_sketch(blob) if blob is not None else BottomKSample(k)
    a, b = sketches[src_a], sketches[src_b]
    union = BottomKSample(k)
    union.merge(deserialize_sketch(a.serialize())).merge(deserialize_sketch(b.serialize()))
    ub = union.sample_hashes()
    in_both = np.isin(ub, a.sample_hashes()) & np.isin(ub, b.sample_hashes())
    jac = float(in_both.mean()) if len(ub) else 0.0
    est_union = union.estimate()
    return pd.DataFrame(
        {"est_a": [a.estimate()], "est_b": [b.estimate()],
         "est_union": [est_union], "est_intersection": [jac * est_union],
         "est_jaccard": [jac], "rel_error_bound": [a.rel_error()]}
    )


# ------------------------------------------- exact grouped percentiles
def _sortable_u64(v: np.ndarray) -> np.ndarray:
    """float64 -> uint64 whose unsigned order == the floats' order
    (IEEE-754 total order trick: flip sign bit for non-negatives,
    flip ALL bits for negatives)."""
    u = np.ascontiguousarray(v, dtype=np.float64).view(np.uint64)
    neg = (u >> np.uint64(63)).astype(bool)
    return np.where(neg, ~u, u | np.uint64(0x8000000000000000))


def grouped_quantile_disc(
    ds: "Dataset",
    key: str,
    col: str,
    q: float,
    *,
    bits_per_pass: int = 16,
    num_partitions: int = 32,
    _rank_of=None,
) -> pd.DataFrame:
    """EXACT per-group discrete quantile (``quantile_disc`` /
    PERCENTILE_DISC semantics: the element at 0-based index
    ceil(q·n)−1 of the group's sorted values) → {key, value}.

    No per-group sort and no per-group materialization — the group's
    values never sit in one place. Iterative radix narrowing over the
    float's order-preserving uint64 image: each round histograms the
    next ``bits_per_pass`` bits WITHIN the surviving prefix per group
    (one fixed-partition ``grouped_agg`` count over (key, bucket));
    the driver walks each group's cumulative histogram (O(groups ×
    2^bits) tiny rows) and keeps only the bucket containing the
    target rank. Each histogram row also carries the bucket's exact
    value range (min/max of the order-mapped u64), so a group whose
    target bucket holds ONE distinct value resolves immediately — in
    practice nearly every group exits after round 1 (2^16 buckets vs
    typical per-group cardinality); the 64/bits-round worst case only
    materializes under adversarial bit-level clustering, and even a
    fully-degenerate group (all values equal) resolves exactly, with
    no "collect the candidate bucket" fallback and no skew
    assumption. Rounds are small streaming jobs reading {key, col}.

    Scale: shuffle volume per round is O(groups × 2^bits × blocks)
    partial rows; driver state O(groups × 2^bits). Null values are
    excluded (SQL aggregate semantics); NaN is rejected (no SQL
    total-order equivalent).
    """
    from .agg import grouped_agg

    B = int(bits_per_pass)
    if not 1 <= B <= 32 or 64 % B:
        raise ValueError("bits_per_pass must divide 64 and be in [1, 32]")
    rounds = 64 // B
    mask_b = np.uint64((1 << B) - 1)

    # per-group narrowing state: prefix (resolved high bits) and the
    # 0-based rank of the target within the prefix's value run
    state: dict = {}  # key -> [prefix_u64, rank_remaining]
    resolved: dict = {}  # key -> exact sortable u64

    SIGN = np.uint64(0x8000000000000000)

    for rnd in range(rounds):
        if rnd and not state:
            break  # every group resolved via the bucket min==max exit
        shift = np.uint64(64 - B * (rnd + 1))
        # vectorized row filter: key -> small index -> uint64 prefix.
        # The indirection matters: mapping uint64 prefixes through a
        # pandas map coerces to float64 once any key is resolved-out
        # (NaN appears), silently rounding prefixes past 2^53; small
        # indices survive the float64 detour exactly.
        idx_map = pd.Series(
            {kk: i for i, kk in enumerate(state.keys())}, dtype="int64"
        )
        prefix_arr = np.array([np.uint64(v[0]) for v in state.values()], dtype=np.uint64)

        def hist(t: pa.Table) -> pa.Table:
            kcol = t.column(key)
            varr = t.column(col)
            valid = ~np.asarray(pa.compute.is_null(varr).combine_chunks())
            v = varr.to_numpy(zero_copy_only=False)[valid]
            if np.isnan(v).any():
                raise ValueError("grouped_quantile_disc: NaN values unsupported")
            k = kcol.to_numpy(zero_copy_only=False)[valid]
            u = _sortable_u64(v)
            if rnd:
                pref_shift = np.uint64(64 - B * rnd)
                want_i = pd.Series(k).map(idx_map)  # NaN for resolved-out keys
                known = want_i.notna().to_numpy()
                wantu = np.zeros(len(u), dtype=np.uint64)
                wantu[known] = prefix_arr[
                    want_i[known].to_numpy(dtype=np.int64)
                ]
                keep = known & ((u >> pref_shift) == wantu)
                u, k = u[keep], k[keep]
            bucket = ((u >> shift) & mask_b).astype(np.int64)
            # carry the bucket's exact value range: u64 order-mapped to
            # int64 (xor the sign bit) so grouped_agg's min/max apply
            s64 = (u ^ SIGN).view(np.int64)
            return pa.table(
                {key: pa.array(k), "bucket": pa.array(bucket),
                 "s": pa.array(s64)}
            )

        hdf = grouped_agg(
            ds.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
            [key, "bucket"],
            {"cnt": ("count", None), "smin": ("min", "s"), "smax": ("max", "s")},
            num_partitions=num_partitions,
        ).to_pandas()

        new_state = {}
        for kk, grp in hdf.groupby(key, sort=False):
            grp = grp.sort_values("bucket")
            c = grp["cnt"].to_numpy()
            if rnd == 0:
                n = int(c.sum())
                if n == 0:
                    continue
                rank = (
                    int(np.ceil(q * n)) - 1 if _rank_of is None
                    else int(_rank_of(n))
                )
                rank = min(max(rank, 0), n - 1)
            else:
                rank = state[kk][1]
            cum = np.cumsum(c)
            i = int(np.searchsorted(cum, rank + 1))
            b = int(grp["bucket"].to_numpy()[i])
            before = int(cum[i - 1]) if i else 0
            smin = np.uint64(np.int64(grp["smin"].to_numpy()[i])) ^ SIGN
            smax = np.uint64(np.int64(grp["smax"].to_numpy()[i])) ^ SIGN
            if smin == smax:
                # one distinct value left in the target bucket — done,
                # whatever rank inside it (values identical)
                resolved[kk] = smin
                continue
            prev = state.get(kk, (np.uint64(0), 0))[0] if rnd else np.uint64(0)
            new_state[kk] = [
                (np.uint64(prev) << np.uint64(B)) | np.uint64(b),
                rank - before,
            ]
        state = new_state

    for kk, (prefix, _r) in state.items():
        resolved[kk] = np.uint64(prefix)  # all 64 bits narrowed

    return (
        pd.DataFrame(
            {key: list(resolved.keys()),
             "value": [_unsort_u64(v) for v in resolved.values()]}
        )
        .sort_values(key)
        .reset_index(drop=True)
    )


def _unsort_u64(u: np.uint64) -> float:
    """Inverse of _sortable_u64 for a scalar."""
    u = np.uint64(u)
    if u >> np.uint64(63):  # was non-negative: clear the flipped sign bit
        raw = u ^ np.uint64(0x8000000000000000)
    else:  # was negative: all bits were flipped
        raw = ~u
    return float(np.array([raw], dtype=np.uint64).view(np.float64)[0])


def grouped_quantile_tdigest(
    ds: "Dataset",
    by: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.95),
    names: tuple[str, ...] = ("p50", "p95"),
    compression: float = 200.0,
) -> pd.DataFrame:
    """Sketch-mode grouped quantiles: one mergeable t-digest per group
    → {by, *names}. The approximate counterpart of
    ``grouped_quantile_disc`` — per-block partial digests (KBs) travel
    instead of values, one shuffle of sketch bytes keyed on the
    bounded group catalog; accuracy bound asserted in pytest against
    the exact operator.
    """
    rows = (
        ds.groupby(by)
        .aggregate(SketchAgg(lambda: TDigest(compression), on=col, kind="values"))
        .take_all()
    )
    out: dict = {by: []}
    for n in names:
        out[n] = []
    for r in sorted(rows, key=lambda r: r[by]):
        sk = deserialize_sketch(r["sketch"])
        out[by].append(r[by])
        for n, q in zip(names, qs):
            out[n].append(float(sk.quantile(q)))
    return pd.DataFrame(out)


def grouped_mad(
    ds_factory,
    key: str,
    col: str,
    *,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Exact per-group median absolute deviation → {key, median, mad}:
    ``mad = median(|x − median(x)|)`` — the robust scale statistic
    behind outlier gates that survive heavy tails (where mean/std
    anomaly rules break).

    Composition of two :func:`grouped_quantile_disc` passes (each
    exact, radix-narrowed, no per-group sort): pass 1 finds each
    group's median; the tiny {key → median} table broadcasts into a
    map stage deriving |x − med|; pass 2 takes its median.
    ``ds_factory`` is a zero-arg callable returning a fresh Dataset
    over {key, col} (two streaming passes re-read the source rather
    than pinning it in memory).
    """
    med = grouped_quantile_disc(
        ds_factory(), key, col, 0.5, num_partitions=num_partitions
    ).rename(columns={"value": "median"})
    med_of = dict(zip(med[key], med["median"]))

    def absdev(t: pa.Table) -> pa.Table:
        kk = t.column(key).to_pandas()
        mu = kk.map(med_of).to_numpy(np.float64)
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        dev = np.abs(v - mu)
        # NULL values (NaN here) were ignored by pass 1's median; drop
        # them in pass 2 too instead of feeding NaN into the quantile
        # kernel (which refuses NaN loudly). mu is NaN for keys whose
        # values were ALL null — those rows drop with it.
        keep = ~np.isnan(dev)
        return pa.table({key: t.column(key).filter(pa.array(keep)),
                         "absdev": pa.array(dev[keep])})

    mad = grouped_quantile_disc(
        ds_factory().map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True),
        key, "absdev", 0.5, num_partitions=num_partitions,
    ).rename(columns={"value": "mad"})
    return med.merge(mad, on=key).sort_values(key).reset_index(drop=True)


# ------------------------------------------------- grouped value histogram
def grouped_histogram(
    ds: "Dataset",
    by: str,
    col: str,
    *,
    bin_width: float = 10.0,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Fixed-width histogram of ``col`` per ``by`` group:
    (by, bin, n) with bin = floor(col / bin_width).

    The distributed-histogram primitive exposed as a first-class
    operator (quantile_disc already uses the same shape internally):
    binning is a map-only derive, the count folds through map-side
    combine + one fixed-P shuffle of (group, bin) partials — O(groups
    × bins) rows move, never the values. floor() of a double is exact
    on both engines, so the SQL oracle matches bit-for-bit. NULL
    values are dropped (SQL COUNT(col) semantics).
    """
    from .agg import grouped_agg

    w = float(bin_width)

    def derive(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False)
        g = t.column(by)
        valid = ~np.isnan(v)
        b = np.floor(v[valid] / w).astype(np.int64)
        return pa.table({by: g.filter(pa.array(valid)), "bin": pa.array(b)})

    out = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        [by, "bin"],
        {"n": ("count", None)},
        num_partitions=num_partitions,
    ).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values([by, "bin"]).reset_index(drop=True)


# ---------------------------------------------------------- table profiler
def profile_table(
    ds: "Dataset",
    columns: list[str],
    *,
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Per-column table profile → (col, n_rows, n_nulls, n_distinct);
    n_distinct is EXACT and excludes nulls (SQL COUNT(DISTINCT col)).

    The data-engine stats primitive (what an optimizer's ANALYZE
    collects). Two streaming passes: null/row counts fold to one tiny
    row per batch; distincts hash every column's values to uint64
    (strings via hash_strings, numerics/timestamps via their int64
    image with -0.0 canonicalized), dedupe per batch, then ALL columns
    share one fixed-P hash-partitioned distinct — shuffle volume is
    the per-batch-distinct (col, hash) pairs, never the raw values.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import hash64_ints, hash_strings

    P = int(num_partitions)

    def _col_hashes(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, int]:
        """non-null uint64 hashes + null count for one column."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        nulls = arr.null_count
        arr = arr.drop_null()
        t = arr.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            h = hash_strings(arr)
        elif pa.types.is_floating(t):
            v = arr.to_numpy(zero_copy_only=False).astype(np.float64) + 0.0
            h = hash64_ints(v.view(np.int64))
        elif pa.types.is_timestamp(t):
            h = hash64_ints(arr.cast(pa.int64()).to_numpy(zero_copy_only=False))
        elif pa.types.is_integer(t) or pa.types.is_boolean(t):
            v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
            h = hash64_ints(v)
        else:
            raise TypeError(f"profile_table: unsupported column type {t}")
        return h.astype(np.uint64), nulls

    def null_partials(t: pa.Table) -> pa.Table:
        row = {"n_rows": pa.array([t.num_rows], pa.int64())}
        for i, c in enumerate(columns):
            col = t.column(c)
            nc = col.null_count if not isinstance(col, pa.ChunkedArray) else col.null_count
            row[f"nul_{i}"] = pa.array([int(nc)], pa.int64())
        return pa.table(row)

    aggs = [Sum("n_rows", alias_name="n_rows")]
    aggs += [Sum(f"nul_{i}", alias_name=f"nul_{i}") for i in range(len(columns))]
    stats = ds.map_batches(
        null_partials, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(*aggs)
    n_rows = int(stats["n_rows"] or 0)
    nulls = [int(stats[f"nul_{i}"] or 0) for i in range(len(columns))]

    def pair_partials(t: pa.Table) -> pa.Table:
        cis, hs = [], []
        for i, c in enumerate(columns):
            h, _ = _col_hashes(t.column(c))
            h = np.unique(h)  # per-batch combine
            cis.append(np.full(len(h), i, np.int32))
            hs.append(h)
        ci = np.concatenate(cis) if cis else np.array([], np.int32)
        h = np.concatenate(hs) if hs else np.array([], np.uint64)
        return pa.table(
            {"ci": pa.array(ci), "h": pa.array(h.view(np.int64)),
             "hp": pa.array((h % np.uint64(P)).astype(np.int32))}
        )

    def partition_distinct(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"ci": g.column("ci").to_numpy(zero_copy_only=False),
             "h": g.column("h").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        cnt = df.groupby("ci", sort=False).size()
        return pa.table(
            {"ci": pa.array(cnt.index.to_numpy(dtype=np.int32)),
             "n": pa.array(cnt.to_numpy(dtype=np.int64))}
        )

    dist = (
        ds.map_batches(pair_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(partition_distinct, batch_format="pyarrow")
        .groupby("ci")
        .aggregate(Sum("n", alias_name="n_distinct"))
        .to_pandas()
    )
    dmap = dict(zip(dist["ci"].astype(int), dist["n_distinct"].astype(int)))
    out = pd.DataFrame(
        {
            "col": columns,
            "n_rows": np.full(len(columns), n_rows, np.int64),
            "n_nulls": np.array(nulls, np.int64),
            "n_distinct": np.array([dmap.get(i, 0) for i in range(len(columns))], np.int64),
        }
    )
    return out.sort_values("col").reset_index(drop=True)


# ------------------------------------------------------------------- pivot
def pivot(
    ds: "Dataset",
    index: str,
    pivot_col: str,
    value_col: str,
    *,
    agg: str = "sum",
    pivot_values: list | None = None,
    num_partitions: int = 16,
    fill=0,
) -> "Dataset":
    """Wide reshape: one row per ``index`` value, one column per
    ``pivot_col`` value, cells aggregating ``value_col`` (SQL
    ``agg(...) FILTER (WHERE pivot = v)``). ``agg`` ∈ {sum, count,
    min, max, mean}.

    Plan: ``grouped_agg`` folds (index, pivot) partials map-side
    first, so the only all-to-all moves one row per distinct
    (index, pivot) pair — never the input; a second tiny shuffle
    co-locates each index's ≤ |V| rows for the vectorized wide
    reshape. When ``pivot_values`` is None they are discovered with a
    count-distinct pass over just the pivot column (the SQL PIVOT
    IN-list); at-scale callers pass the list explicitly and skip that
    pass. Column names are ``str(v)``; combinations with no rows get
    ``fill`` (pass ``fill=None`` to keep SQL's NULL).

    Exactness: cells are whatever ``grouped_agg`` produces — pass an
    int64-quantized value column for oracle-exact double sums (the
    events_rollup discipline).
    """
    from .agg import _partition_of_keys, grouped_agg

    if pivot_values is None:
        pv = grouped_agg(
            ds.select_columns([pivot_col]), pivot_col,
            {"n": ("count", None)}, num_partitions=8,
        ).to_pandas()
        # grouped_agg preserves the NULL pivot group; sort it LAST
        # (sorted() would raise comparing None to values) — SQL PIVOT
        # IN-lists may name NULL too, so discovery must not crash on it
        vals = pv[pivot_col].tolist() if len(pv) else []
        pivot_values = sorted(
            (v for v in vals if v is not None and v == v)
        ) + [None] * sum(1 for v in vals if v is None or v != v)
    values = list(pivot_values)
    names = [str(v) for v in values]
    if len(set(names)) != len(names) or index in names:
        raise ValueError(f"pivot: ambiguous column names {names} (index={index!r})")

    cells = grouped_agg(
        ds.select_columns([index, pivot_col, value_col]),
        [index, pivot_col], {"__v": (agg, value_col)},
        num_partitions=num_partitions,
    )

    P = max(1, num_partitions // 2)

    def tag(t: pa.Table) -> pa.Table:
        gp = _partition_of_keys(t, [index], P)
        return t.append_column("__gp", pa.array(gp))

    def reshape(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        # NULL-safe on both axes: pivot_table silently drops NaN index
        # keys and NaN pivot categories, but grouped_agg preserved the
        # NULL groups — encode them as a sentinel for the reshape and
        # decode the index afterwards (SQL GROUP BY keeps NULL rows)
        NULLTOK = "\x00<null>"
        iser = df[index]
        inull = pd.isna(iser)
        pser = df[pivot_col]
        pnull = pd.isna(pser)
        if inull.any() or pnull.any():
            df = df.copy()
            if inull.any():
                df[index] = iser.astype(object).where(~inull, NULLTOK)
            if pnull.any():
                df[pivot_col] = pser.astype(object).where(~pnull, NULLTOK)
        col_keys = [NULLTOK if v is None else v for v in values]
        wide = df.pivot_table(
            index=index, columns=pivot_col, values="__v", aggfunc="first"
        )
        wide = wide.reindex(columns=col_keys)
        if fill is not None:
            wide = wide.fillna(fill)
            v_dtype = df["__v"].dtype
            if np.issubdtype(v_dtype, np.integer) and isinstance(fill, int):
                wide = wide.astype(v_dtype)
        wide.columns = names
        out = wide.reset_index()
        if inull.any():
            out[index] = out[index].astype(object).where(
                out[index] != NULLTOK, None)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        cells.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(reshape, batch_format="pyarrow")
    )


# ------------------------------------------------- hopping window aggregate
def hopping_window_agg(
    ds: "Dataset",
    aggs: dict,
    *,
    ts_col: str = "ts",
    window_us: int,
    hop_us: int,
    by: list[str] | None = None,
    num_partitions: int = 32,
) -> "Dataset":
    """Hopping (sliding) event-time window aggregate — the streaming
    window shape Ray Data lacks natively.  Windows start at every
    multiple of ``hop_us`` and span ``window_us`` (must be an exact
    multiple of the hop), so each event belongs to exactly
    ``k = window_us // hop_us`` windows.  ``hop_us == window_us``
    degenerates to the tumbling window.

    ``aggs`` is forwarded to :func:`~.agg.grouped_agg` (sum/count/min/
    max/mean over the input's columns); the output carries an int64
    ``window_us`` epoch-microsecond window-start column plus ``by``.

    Scale shape: the only data amplification is the bounded k×
    map-side expansion (vectorized table ``take`` + window-start
    arithmetic, floor-division-exact for pre-1970 timestamps);
    grouped_agg's map-side combine then folds each batch to one
    partial row per (window, by) BEFORE the one fixed-P exchange, so
    shuffle volume is proportional to distinct windows per batch — not
    to events × k.
    """
    from .agg import grouped_agg

    window_us, hop_us = int(window_us), int(hop_us)
    if window_us <= 0 or hop_us <= 0:
        raise ValueError("window_us and hop_us must be positive")
    if window_us % hop_us != 0:
        raise ValueError(
            f"window_us ({window_us}) must be a multiple of hop_us ({hop_us})"
        )
    k = window_us // hop_us
    by = list(by or [])

    need = set(by)
    for _out, (_kind, col) in aggs.items():
        if col is not None:
            need.add(col)
    cols = [ts_col] + sorted(need)
    src = ds.select_columns(cols)

    def expand(t: pa.Table) -> pa.Table:
        ts = t[ts_col].to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.astype("datetime64[us]").view(np.int64)
        else:
            ts = ts.astype(np.int64)
        base = np.floor_divide(ts, hop_us) * hop_us  # latest window start
        n = len(t)
        idx = np.repeat(np.arange(n, dtype=np.int64), k)
        ws = base[idx] - np.tile(np.arange(k, dtype=np.int64) * hop_us, n)
        rest = t.drop_columns([ts_col])
        if rest.num_columns == 0:
            # zero-column Table.take returns 0 rows; build directly
            return pa.table({"window_us": pa.array(ws, pa.int64())})
        rep = rest.take(pa.array(idx))
        return rep.append_column("window_us", pa.array(ws, pa.int64()))

    return grouped_agg(
        src.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True),
        ["window_us"] + by,
        aggs,
        num_partitions=num_partitions,
    )


# ------------------------------------------------- event-time watermark
def with_watermark(
    ds: "Dataset",
    *,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    lateness_us: int,
    num_partitions: int = 32,
    n_buckets: int = 64,
) -> tuple["Dataset", "Dataset"]:
    """Bounded-lateness event-time watermark gate → ``(on_time, late)``
    — the streaming late-data semantics this engine's windows lacked.

    The streaming rule, replayed batch-exactly via the prefix
    identity (same trick as the CUSUM operator): processing rows in
    ``arrival_col`` order, the watermark after arrival *a* is
    ``max(event time over arrivals < a) − lateness_us``; a row is LATE
    (dropped to the side-channel dataset, which carries the
    ``watermark_us`` it lost to) iff its event time is below the
    watermark at its own arrival. Arrival values must be unique — the
    identity (and its SQL window-frame replay) is order-free only
    with a total arrival order.

    Scale shape: NO global sort. Pass 0 folds (min, max) arrival;
    arrivals map to ``n_buckets`` equal-width ranges. Pass 1 is a
    skinny grouped max (per-bucket event-time maxima → driver
    exclusive scan, O(n_buckets)). Pass 2 is the ONE real shuffle:
    bucket-keyed, each bucket sorts locally by arrival and combines
    its running exclusive max with the broadcast bucket-prefix offset.
    Both outputs stream from one materialized flagged dataset.
    Partitioning assumption: arrival values are roughly uniform over
    their [min, max] range (true for sequence numbers / dense ids, the
    intended arrival key); a pathologically clustered arrival space
    concentrates buckets — raise ``n_buckets`` or densify ids first.

    Reference analog: the bounded-FIFO honesty rule (src/main.cpp:74)
    applied to TIME — data that would silently corrupt a closed
    window is surfaced on a side channel, never dropped quietly.
    """
    from .agg import grouped_agg

    LAT = int(lateness_us)
    # the bucket count IS the pass-2 shuffle width: scale it with the
    # caller's num_partitions so the parallelism knob is honored
    B = max(int(n_buckets), int(num_partitions))
    NEG = np.iinfo(np.int64).min
    # one materialization: three passes consume the same rows, and the
    # bucket arithmetic of pass 2 must see exactly the [amin, amax]
    # range pass 0 measured (a nondeterministic upstream replayed per
    # pass could otherwise emit an out-of-range arrival)
    ds = ds.materialize()

    def _ts_i64(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.datetime64):
            return v.astype("datetime64[us]").view(np.int64)
        return v.astype(np.int64)

    # pass 0: arrival range
    def minmax(t: pa.Table) -> pa.Table:
        a = t.column(arrival_col).to_numpy(zero_copy_only=False)
        if len(a) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        a = a.astype(np.int64)
        return pa.table({"lo": pa.array([int(a.min())]),
                         "hi": pa.array([int(a.max())])})

    parts = ds.select_columns([arrival_col]).map_batches(
        minmax, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if parts.empty:
        # typed-empty side channel: same schema contract (original
        # columns + watermark_us) as the non-empty path
        def wm_col(t: pa.Table) -> pa.Table:
            return t.append_column(
                "watermark_us", pa.array([] if t.num_rows == 0 else
                                         [0] * t.num_rows, pa.int64()))

        return ds, ds.map_batches(wm_col, batch_format="pyarrow",
                                  zero_copy_batch=True).limit(0)
    amin, amax = int(parts["lo"].min()), int(parts["hi"].max())
    width = max(1, -(-(amax - amin + 1) // B))

    # pass 1: per-bucket event-time maxima (skinny partial shuffle)
    def bmax(t: pa.Table) -> pa.Table:
        a = t.column(arrival_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _ts_i64(t.column(ts_col))
        bk = (a - amin) // width
        df = pd.DataFrame({"b": bk, "m": ts}).groupby("b", sort=False)["m"].max()
        return pa.table({"b": pa.array(df.index.to_numpy(np.int64)),
                         "m": pa.array(df.to_numpy(np.int64))})

    bm = grouped_agg(
        ds.select_columns([arrival_col, ts_col]).map_batches(
            bmax, batch_format="pyarrow", zero_copy_batch=True),
        "b", {"m": ("max", "m")},
        num_partitions=min(int(num_partitions), B),
    ).to_pandas()
    maxes = np.full(B, NEG, np.int64)
    maxes[bm["b"].to_numpy(np.int64)] = bm["m"].to_numpy(np.int64)
    # exclusive scan: prefix[b] = max event time over buckets < b
    prefix = np.full(B, NEG, np.int64)
    np.maximum.accumulate(maxes[:-1], out=prefix[1:])

    # pass 2: the one bucket-keyed shuffle; in-bucket prefix identity
    def tag(t: pa.Table) -> pa.Table:
        a = t.column(arrival_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "__wm_bucket", pa.array(((a - amin) // width).astype(np.int64)))

    def flag(g: pa.Table) -> pa.Table:
        a = g.column(arrival_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(a, kind="stable")
        sa = a[order]
        if len(sa) > 1 and (sa[1:] == sa[:-1]).any():
            # a tie would make the prefix depend on physical row order
            # (nondeterministic across partitionings) — refuse loudly
            dup = int(sa[np.flatnonzero(sa[1:] == sa[:-1])[0]])
            raise ValueError(
                f"with_watermark requires unique {arrival_col!r} arrival "
                f"values (duplicate {dup}); the prefix identity and its "
                f"SQL window-frame replay need a total arrival order"
            )
        g = g.take(pa.array(order))
        ts = _ts_i64(g.column(ts_col))
        b = int(g.column("__wm_bucket")[0].as_py())
        run = np.empty(len(ts), np.int64)
        run[0] = prefix[b]
        if len(ts) > 1:
            np.maximum.accumulate(ts[:-1], out=run[1:])
            np.maximum(run[1:], prefix[b], out=run[1:])
        # NEG sentinel = empty prefix -> watermark undefined -> on time
        wm = np.where(run == NEG, NEG, run - LAT)
        late = (run != NEG) & (ts < wm)
        g = g.drop_columns(["__wm_bucket"])
        return g.append_column("__wm_late", pa.array(late)).append_column(
            "watermark_us", pa.array(wm))

    flagged = (
        ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__wm_bucket")
        .map_groups(flag, batch_format="pyarrow")
        .materialize()
    )

    def split(want: bool, drop_wm: bool):
        def f(t: pa.Table) -> pa.Table:
            keep = t.column("__wm_late").to_numpy(zero_copy_only=False)
            out = t.filter(pa.array(keep == want)).drop_columns(["__wm_late"])
            return out.drop_columns(["watermark_us"]) if drop_wm else out
        return f

    on_time = flagged.map_batches(split(False, True), batch_format="pyarrow",
                                  zero_copy_batch=True)
    late = flagged.map_batches(split(True, False), batch_format="pyarrow",
                               zero_copy_batch=True)
    return on_time, late


def hopping_window_agg_watermarked(
    ds: "Dataset",
    aggs: dict,
    *,
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    lateness_us: int,
    window_us: int,
    hop_us: int,
    by: list[str] | None = None,
    num_partitions: int = 32,
) -> tuple["Dataset", "Dataset"]:
    """:func:`hopping_window_agg` behind a :func:`with_watermark` gate:
    returns ``(window_agg, late)`` — the aggregate sees only rows that
    arrived before their window's watermark closed it; late rows
    surface on the side channel with the watermark they lost to."""
    on_time, late = with_watermark(
        ds, ts_col=ts_col, arrival_col=arrival_col,
        lateness_us=lateness_us, num_partitions=num_partitions,
    )
    out = hopping_window_agg(
        on_time, aggs, ts_col=ts_col, window_us=window_us, hop_us=hop_us,
        by=by, num_partitions=num_partitions,
    )
    return out, late


# ---------------------------------------------- partitioned window functions
_WINDOW_KINDS = (
    "row_number", "rank", "dense_rank", "lag", "lead", "cumsum", "cummax",
    "cummin", "ntile", "percent_rank", "cume_dist",
    "rolling_sum", "rolling_mean", "rolling_min", "rolling_max",
    "first_value", "last_value", "nth_value",
)

_ROLLING_AGG = {
    "rolling_sum": "sum", "rolling_mean": "mean",
    "rolling_min": "min", "rolling_max": "max",
}


def partitioned_window(
    ds: "Dataset",
    by: str | list[str],
    order_by: "str | tuple | list",
    specs: dict,
    *,
    num_partitions: int = 64,
) -> "Dataset":
    """SQL window functions over ``PARTITION BY by ORDER BY order_by``
    → the input columns plus one column per ``specs`` entry.

    ``specs`` maps output name → spec tuple:
      ``("row_number",)`` / ``("rank",)`` / ``("dense_rank",)``
      ``("lag", col, offset, default)`` / ``("lead", col, offset, default)``
      ``("cumsum", col)`` / ``("cummax", col)`` / ``("cummin", col)``
      ``("ntile", k)`` / ``("percent_rank",)`` / ``("cume_dist",)``
      ``("rolling_sum"|"rolling_mean"|"rolling_min"|"rolling_max", col, k)``
    (cumulatives use the ROWS UNBOUNDED PRECEDING..CURRENT frame;
    rolling kinds are the bounded ``ROWS BETWEEN (k-1) PRECEDING AND
    CURRENT ROW`` frame with SQL null-skipping — pin ties in
    ``order_by`` with a unique tiebreak column, a ROWS frame over tied
    keys is order-dependent in ANY engine; ntile follows SQL's
    first-buckets-take-the-extra-row split).

    ``order_by`` entries are column names or ``(name, "desc")``. Nulls
    order LAST regardless of direction (state the same in the SQL when
    oracling a desc window).

    Scale shape: ONE fixed-P shuffle on ``hash(by) % P`` (a partition
    holds whole by-groups — the only co-location a window needs), then
    a single C-speed kernel per partition: one sort, boundary masks,
    shifted arrays and running folds — no per-group Python. Rank
    functions use first-occurrence index propagation
    (``np.maximum.accumulate``), so ties cost nothing extra.
    """
    by = [by] if isinstance(by, str) else list(by)
    order_cols: list[str] = []
    ascending: list[bool] = []
    for o in [order_by] if isinstance(order_by, (str, tuple)) else list(order_by):
        if isinstance(o, tuple):
            name, direction = o
            order_cols.append(name)
            ascending.append(direction != "desc")
        else:
            order_cols.append(o)
            ascending.append(True)
    for out, spec in specs.items():
        if spec[0] not in _WINDOW_KINDS:
            raise ValueError(f"window {out!r}: unknown kind {spec[0]!r}")
        if out in by or out in order_cols:
            raise ValueError(f"window output {out!r} collides with an input column")
        if spec[0] == "ntile" and (len(spec) < 2 or int(spec[1]) <= 0):
            raise ValueError(f"window {out!r}: ntile requires k >= 1")
        if spec[0] == "nth_value" and (len(spec) < 3 or int(spec[2]) <= 0):
            raise ValueError(
                f"window {out!r}: nth_value requires (kind, col, n) with n >= 1"
            )
        if spec[0] in _ROLLING_AGG and (len(spec) < 3 or int(spec[2]) <= 0):
            raise ValueError(
                f"window {out!r}: {spec[0]} requires (kind, col, k) with k >= 1"
            )

    from .agg import _partition_of_keys

    P = int(num_partitions)

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__wp", pa.array(_partition_of_keys(t, by, P))
        )

    def kernel(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["__wp"]).to_pandas()
        df = df.sort_values(
            by + order_cols,
            ascending=[True] * len(by) + ascending,
            na_position="last",
            kind="mergesort",  # stable: equal keys keep input order
        ).reset_index(drop=True)
        n = len(df)
        idx = np.arange(n, dtype=np.int64)
        newseg = np.ones(n, dtype=bool)
        if n:
            same = np.ones(n - 1, dtype=bool)
            for b in by:
                col = df[b]
                eq = (col.iloc[1:].reset_index(drop=True) ==
                      col.iloc[:-1].reset_index(drop=True))
                bothna = col.isna().iloc[1:].reset_index(drop=True) & \
                    col.isna().iloc[:-1].reset_index(drop=True)
                # nullable dtypes compare to pd.NA -> object; force bool
                same &= (eq | bothna).fillna(False).to_numpy(dtype=bool)
            newseg[1:] = ~same
        seg_start = np.maximum.accumulate(np.where(newseg, idx, -1))
        # tie mask over the ORDER key (within segment)
        newval = newseg.copy()
        if n:
            same_o = np.ones(n - 1, dtype=bool)
            for c in order_cols:
                col = df[c]
                eq = (col.iloc[1:].reset_index(drop=True) ==
                      col.iloc[:-1].reset_index(drop=True))
                bothna = col.isna().iloc[1:].reset_index(drop=True) & \
                    col.isna().iloc[:-1].reset_index(drop=True)
                same_o &= (eq | bothna).fillna(False).to_numpy(dtype=bool)
            newval[1:] |= ~same_o
        seg_id = np.cumsum(newseg)
        # per-row segment length + tie-group exclusive end (ties never
        # span segments: newseg implies newval)
        if n:
            starts_idx = np.flatnonzero(newseg)
            lens = np.diff(np.append(starts_idx, n))
            seg_len = np.repeat(lens, lens)
            tie_starts = np.flatnonzero(newval)
            tie_lens = np.diff(np.append(tie_starts, n))
            tie_end = np.repeat(tie_starts + tie_lens, tie_lens)
        else:
            seg_len = tie_end = idx
        for out, spec in specs.items():
            kind = spec[0]
            if kind == "row_number":
                df[out] = idx - seg_start + 1
            elif kind == "rank":
                first_occ = np.maximum.accumulate(np.where(newval, idx, -1))
                df[out] = first_occ - seg_start + 1
            elif kind == "dense_rank":
                c = np.cumsum(newval)
                df[out] = c - c[seg_start] + 1
            elif kind in ("lag", "lead"):
                col = spec[1]
                off = int(spec[2]) if len(spec) > 2 else 1
                default = spec[3] if len(spec) > 3 else None
                s = df.groupby(seg_id, sort=False)[col].shift(
                    off if kind == "lag" else -off
                )
                if default is not None:
                    # SQL LAG/LEAD fills the default ONLY when the
                    # offset row is outside the partition — a NULL
                    # value in an existing offset row stays NULL
                    # (fillna would wrongly overwrite it too)
                    pos = idx - seg_start
                    oob = (pos < off) if kind == "lag" else \
                        (pos >= seg_len - off)
                    s = s.where(~oob, default)
                df[out] = s
            elif kind == "cumsum":
                df[out] = df.groupby(seg_id, sort=False)[spec[1]].cumsum()
            elif kind == "cummax":
                df[out] = df.groupby(seg_id, sort=False)[spec[1]].cummax()
            elif kind == "cummin":
                df[out] = df.groupby(seg_id, sort=False)[spec[1]].cummin()
            elif kind == "ntile":
                k = int(spec[1])
                if k <= 0:
                    raise ValueError(f"ntile requires k >= 1, got {k}")
                p = idx - seg_start
                q, r = seg_len // k, seg_len % k
                # SQL NTILE: the first (len % k) buckets take one extra row
                big = r * (q + 1)
                df[out] = np.where(
                    p < big,
                    p // np.maximum(q + 1, 1) + 1,
                    r + (p - big) // np.maximum(q, 1) + 1,
                )
            elif kind == "percent_rank":
                first_occ = np.maximum.accumulate(np.where(newval, idx, -1))
                rank = first_occ - seg_start  # 0-based
                denom = np.maximum(seg_len - 1, 1)
                df[out] = np.where(seg_len > 1, rank / denom, 0.0)
            elif kind == "cume_dist":
                df[out] = (tie_end - seg_start) / seg_len
            elif kind == "first_value":
                # value at the segment's first row (the RANGE UNBOUNDED
                # PRECEDING frame SQL evaluates FIRST_VALUE over)
                df[out] = df[spec[1]].to_numpy()[seg_start]
            elif kind == "last_value":
                # SQL default frame ends at CURRENT ROW (peers included
                # under RANGE): value at the tie group's last row
                df[out] = df[spec[1]].to_numpy()[tie_end - 1]
            elif kind == "nth_value":
                col, nth = spec[1], int(spec[2])
                pos = seg_start + (nth - 1)
                vals = df[col].to_numpy()
                # frame = start..current row INCLUDING peers (RANGE):
                # NULL only until the nth row enters that frame
                inseg = pos <= tie_end - 1
                picked = vals[np.minimum(pos, n - 1)] if n else vals
                df[out] = pd.Series(picked).where(inseg)
            elif kind in _ROLLING_AGG:
                # SQL ROWS BETWEEN (k-1) PRECEDING AND CURRENT ROW;
                # nulls are skipped (all-null frame -> NULL), matching
                # the SQL aggregate-over-frame semantics. seg_id is
                # nondecreasing after the sort, so the groupby.rolling
                # (Cython) output concatenates back in row order.
                col, k = spec[1], int(spec[2])
                roll = df.groupby(seg_id, sort=False)[col].rolling(
                    k, min_periods=1
                )
                df[out] = getattr(roll, _ROLLING_AGG[kind])().to_numpy()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__wp")
        .map_groups(kernel, batch_format="pyarrow")
    )


# ------------------------------------------------------------------ unpivot
def unpivot(
    ds: "Dataset",
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
    drop_null: bool = False,
) -> "Dataset":
    """Wide → long reshape (SQL UNPIVOT / melt), the inverse of
    :func:`pivot`. Map-only and shuffle-free: each batch emits its id
    columns once per value column with a constant ``var_name`` label,
    so the k× row fan-out never crosses the wire unaggregated unless
    the caller sends it somewhere. Value columns unify to their widest
    common Arrow type (all-int → int64, any float → float64) — mixed
    non-numeric kinds must be cast by the caller first. ``drop_null``
    mirrors SQL UNPIVOT's default of omitting NULL cells (a pivot
    round trip with ``fill=None`` then drops exactly the combos the
    original data never had)."""
    import pyarrow.compute as pc

    id_cols, value_cols = list(id_cols), list(value_cols)
    if not value_cols:
        raise ValueError("unpivot: value_cols must be non-empty")
    for c in (var_name, value_name):
        if c in id_cols:
            raise ValueError(f"unpivot: output column {c!r} collides with id_cols")

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    vt = []
    for c in value_cols:
        t = types.get(c)
        vt.append(t if isinstance(t, pa.DataType) else None)
    if any(t is None for t in vt):
        target = None  # resolve per batch (pandas-backed schema)
    elif all(pa.types.is_integer(t) for t in vt):
        target = pa.int64()
    elif all(pa.types.is_integer(t) or pa.types.is_floating(t) for t in vt):
        target = pa.float64()
    elif len({str(t) for t in vt}) == 1:
        target = vt[0]
    else:
        raise ValueError(f"unpivot: value columns mix incompatible types {vt}")

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        tgt = target
        if tgt is None:
            ts = [t.column(c).type for c in value_cols]
            if all(pa.types.is_integer(x) for x in ts):
                tgt = pa.int64()
            elif all(pa.types.is_integer(x) or pa.types.is_floating(x) for x in ts):
                tgt = pa.float64()
            else:
                tgt = ts[0]
        parts = []
        for c in value_cols:
            cols = {k: t.column(k) for k in id_cols}
            cols[var_name] = pa.array(np.full(n, c), pa.string())
            v = t.column(c).combine_chunks()
            cols[value_name] = v if v.type == tgt else v.cast(tgt)
            parts.append(pa.table(cols))
        out = pa.concat_tables(parts)
        if drop_null:
            out = out.filter(pc.is_valid(out.column(value_name)))
        return out

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ latest-by-key
def latest_by_key(
    ds: "Dataset",
    by: str | list[str],
    order_col: str,
    *,
    tiebreak: str | None = None,
    num_partitions: int = 32,
) -> "Dataset":
    """Keep each key's row with the greatest ``order_col`` (ties broken
    by greatest ``tiebreak``) — last-write-wins upsert compaction /
    "latest snapshot per entity".

    Scale shape: the per-batch combiner already reduces every batch to
    ONE candidate row per key it saw (C-speed sort + drop_duplicates),
    so the single fixed-P exchange moves per-batch winners, not the
    input — then the identical kernel per partition picks the global
    winner. Equivalent to ``partitioned_window`` row_number()=1 over a
    desc order, at a fraction of the shuffle volume. Null order values
    lose to any non-null (SQL DESC NULLS LAST); pass ``tiebreak`` for
    determinism when ``order_col`` can tie.
    """
    by = [by] if isinstance(by, str) else list(by)
    order_keys = [order_col] + ([tiebreak] if tiebreak else [])

    from .agg import _partition_of_keys

    P = int(num_partitions)

    def winners(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            by + order_keys,
            ascending=[True] * len(by) + [False] * len(order_keys),
            na_position="last",
            kind="mergesort",
        ).drop_duplicates(subset=by, keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    def route(t: pa.Table) -> pa.Table:
        return t.append_column("__lp", pa.array(_partition_of_keys(t, by, P)))

    def finalize(g: pa.Table) -> pa.Table:
        return winners(g.drop_columns(["__lp"]))

    return (
        ds.map_batches(winners, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__lp")
        .map_groups(finalize, batch_format="pyarrow")
    )


# -------------------------------------------------------------- explode_list
def explode_list(
    ds: "Dataset",
    list_col: str,
    *,
    keep: list[str] | None = None,
    idx_name: str = "idx",
    value_name: str | None = None,
) -> "Dataset":
    """Unnest a list column WITH ORDINALITY (SQL ``unnest``): one output
    row per element, carrying ``keep`` columns (default: every other
    column), a 0-based ``idx_name`` position and the element as
    ``value_name`` (default: the list column's name). Null and empty
    lists emit nothing, matching SQL unnest.

    Map-only and fully vectorized: offsets arithmetic gives positions,
    one ``take`` replicates the kept columns — no Python per row."""
    value_name = value_name or list_col

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(list_col).combine_chunks()
        if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
            raise TypeError(f"explode_list: {list_col!r} is {col.type}, not a list")
        kcols = keep if keep is not None else [
            c for c in t.column_names if c != list_col
        ]
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        start, end = off[:-1], off[1:]
        valid = np.asarray(col.is_valid())
        lengths = np.where(valid, end - start, 0)
        parent = np.repeat(np.arange(len(col), dtype=np.int64), lengths)
        total = int(lengths.sum())
        # element index of each output row inside the flattened values
        flat_idx = np.repeat(start, lengths) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(lengths) - lengths, lengths)
        )
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(lengths) - lengths, lengths
        )
        values = col.values.take(pa.array(flat_idx))
        cols = {k: t.column(k).take(pa.array(parent)) for k in kcols}
        cols[idx_name] = pa.array(pos)
        cols[value_name] = values
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------- group_concat
def group_concat(
    ds: "Dataset",
    by: str | list[str],
    value_col: str,
    order_by: "str | tuple | list",
    *,
    sep: str = ",",
    out_name: str = "concat",
    count_name: str | None = None,
    num_partitions: int = 64,
) -> "Dataset":
    """SQL ``string_agg(value_col, sep ORDER BY order_by)`` per ``by``
    group — ordered per-key sequence building (behavioral event paths,
    conversation reassembly, per-document line rejoin): the string
    counterpart of an ordered ARRAY_AGG.

    SQL semantics throughout: null values are SKIPPED (an all-null
    group emits SQL NULL, not ``""``); null ``by`` keys form their own
    group (GROUP BY); the value column is cast to string with Arrow's
    canonical formatting — pre-format on the caller side when SQL text
    casts must match. ``order_by`` entries are names or ``(name,
    "desc")``, nulls last either way; pin ties with a unique tiebreak
    column or the concatenation order is engine-dependent (same caveat
    as any ORDER BY inside an aggregate). ``count_name`` optionally
    emits the non-null value count (SQL ``count(value_col)``).

    Scale shape: ONE fixed-P shuffle on ``hash(by) % P`` (whole groups
    co-locate — the only requirement), then a single vectorized kernel
    per partition: one stable sort, factorized segment ids, and ONE
    ``binary_join`` over a ListArray built from per-segment non-null
    counts — no per-group Python. Output rows are O(groups); the
    concatenated payload is the inherent output size. A group's full
    sequence must fit one partition's memory — at web scale that bound
    is per-KEY payload, which is the operator's contract (a key whose
    sequence exceeds a worker's heap needs the chunked form: window +
    partitioned sink).
    """
    import pyarrow.compute as pc

    from .agg import _partition_of_keys

    by = [by] if isinstance(by, str) else list(by)
    order_cols: list[str] = []
    ascending: list[bool] = []
    for o in [order_by] if isinstance(order_by, (str, tuple)) else list(order_by):
        if isinstance(o, tuple):
            name, direction = o
            order_cols.append(name)
            ascending.append(direction != "desc")
        else:
            order_cols.append(o)
            ascending.append(True)
    bad = set(by) & ({value_col} | set(order_cols))
    if out_name in by or (count_name and count_name in by):
        raise ValueError("group_concat: output names collide with by columns")
    if bad:
        raise ValueError(f"group_concat: by columns also used as value/order: {bad}")
    P = int(num_partitions)

    def route(t: pa.Table) -> pa.Table:
        keep = list(dict.fromkeys(by + order_cols + [value_col]))
        t = t.select(keep)
        return t.append_column("__gc", pa.array(_partition_of_keys(t, by, P)))

    def kernel(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["__gc"]).to_pandas()
        df = df.sort_values(
            by + order_cols,
            ascending=[True] * len(by) + ascending,
            na_position="last",
            kind="mergesort",
        )
        # factorized per-by-column codes -> segment starts (null-safe:
        # factorize gives nulls their own code with use_na_sentinel)
        nseg_mask = np.zeros(len(df), dtype=bool)
        nseg_mask[0] = True
        for c in by:
            codes = pd.factorize(df[c], use_na_sentinel=False)[0]
            nseg_mask[1:] |= codes[1:] != codes[:-1]
        seg = np.cumsum(nseg_mask) - 1
        nseg = int(seg[-1]) + 1 if len(df) else 0
        starts = np.flatnonzero(nseg_mask)
        vals = pa.Array.from_pandas(df[value_col])
        if not pa.types.is_string(vals.type) and not pa.types.is_large_string(vals.type):
            vals = pc.cast(vals, pa.string())
        valid = np.asarray(vals.is_valid())
        counts = np.bincount(seg[valid], minlength=nseg)
        offsets = np.concatenate(([0], np.cumsum(counts)))
        la = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), vals.filter(pa.array(valid))
        )
        joined = pc.if_else(
            pa.array(counts > 0), pc.binary_join(la, sep), pa.scalar(None, pa.string())
        )
        out = {c: pa.Array.from_pandas(df[c].iloc[starts]) for c in by}
        out[out_name] = joined
        if count_name:
            out[count_name] = pa.array(counts.astype(np.int64))
        return pa.table(out)

    return (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gc")
        .map_groups(kernel, batch_format="pyarrow")
    )


# --------------------------------------------------------------- topn_by_key
def topn_by_key(
    ds: "Dataset",
    by: str | list[str],
    order_col: str,
    n: int,
    *,
    descending: bool = True,
    tiebreak: str | None = None,
    num_partitions: int = 32,
) -> "Dataset":
    """Keep each key's top-``n`` rows by ``order_col`` — the general
    form of :func:`latest_by_key` (``n=1``) and the streaming-shaped
    per-key cap a curation pipeline uses to bound any one source's
    share (``QUALIFY row_number() OVER (PARTITION BY by ORDER BY
    order_col [DESC]) <= n``).

    Scale shape: the per-batch combiner keeps at most ``n`` candidate
    rows per key it saw (one C-speed sort + Cython ``groupby.head``),
    so the single fixed-P exchange moves O(keys_per_batch × n) rows,
    not the input — a per-key top-n is closed under "top-n of unioned
    per-batch top-ns", then the identical kernel per partition picks
    the global winners. Null order values order LAST under either
    direction (SQL NULLS LAST) — they survive only in groups with
    fewer than ``n`` better rows. Pass ``tiebreak`` (ordered the same
    direction) for deterministic results when ``order_col`` ties;
    output row order is unspecified (sort downstream).
    """
    by = [by] if isinstance(by, str) else list(by)
    order_keys = [order_col] + ([tiebreak] if tiebreak else [])
    if int(n) < 1:
        raise ValueError(f"topn_by_key: n must be >= 1, got {n}")

    from .agg import _partition_of_keys

    P = int(num_partitions)

    def winners(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            by + order_keys,
            ascending=[True] * len(by) + [not descending] * len(order_keys),
            na_position="last",
            kind="mergesort",
        )
        df = df.groupby(by, dropna=False, sort=False).head(int(n))
        return pa.Table.from_pandas(df, preserve_index=False)

    def route(t: pa.Table) -> pa.Table:
        return t.append_column("__tp", pa.array(_partition_of_keys(t, by, P)))

    def finalize(g: pa.Table) -> pa.Table:
        return winners(g.drop_columns(["__tp"]))

    return (
        ds.map_batches(winners, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__tp")
        .map_groups(finalize, batch_format="pyarrow")
    )


# ------------------------------------------------------------- resample_fill
def resample_fill(
    ds: "Dataset",
    by: str | list[str],
    ts_col: str,
    every_us: int,
    aggs: dict,
    *,
    fill: dict | None = None,
    num_partitions: int = 32,
) -> "Dataset":
    """Per-key time-series resampling with gap densification — the
    alignment step downstream time-series consumers need and Ray Data
    lacks: bucket ``ts_col`` into ``every_us``-microsecond bins,
    aggregate per ``(by, bucket)``, then emit EVERY bucket in each
    key's ``[min_bucket, max_bucket]`` span (missing buckets become
    explicit rows) with per-column fill strategies.

    ``aggs`` maps output name → ``(func, col)`` with func in
    ``sum | count | min | max`` (count takes ``col=None``). ``fill``
    maps output name → ``"ffill"`` (carry the last seen value down the
    gap — SQL ``last_value(x IGNORE NULLS) OVER (PARTITION BY key
    ORDER BY bucket)``), ``"zero"`` (SQL ``coalesce(x, 0)``, the
    natural count fill), or ``None``/absent (keep SQL NULL). Output:
    by columns + ``bucket`` (timestamp[us]) + one column per agg, one
    row per key per grid bucket. Null timestamps are ignored (SQL
    ``WHERE ts IS NOT NULL``); bucket arithmetic is integer
    floor-division (exact, pre-1970-safe — never float).

    Scale shape: a per-batch map-side combine folds each batch to one
    partial row per (key, bucket) through pyarrow's C++ hash-agg (the
    exchange moves partials, not events), then ONE fixed-P shuffle on
    ``hash(by) % P`` — the key-only co-location that densify+ffill
    needs — and a vectorized kernel per partition: Arrow-side partial
    merge (int64 sums never round-trip through float), one
    ``np.repeat`` grid pass, one scatter into grid slots, and an
    index-accumulate forward fill with per-segment reset. Grid size is
    each key's span / every — the inherent output size; a key spanning
    years at second resolution is the caller's contract to pre-split.
    """
    import pyarrow.compute as pc

    from .agg import _partition_of_keys

    by = [by] if isinstance(by, str) else list(by)
    E = int(every_us)
    if E <= 0:
        raise ValueError(f"resample_fill: every_us must be > 0, got {every_us}")
    fill = dict(fill or {})
    _PFUNC = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (func, col) in aggs.items():
        if func not in _PFUNC:
            raise ValueError(f"resample_fill: unsupported agg {func!r} for {out!r}")
        if (func == "count") != (col is None):
            raise ValueError(
                f"resample_fill: count takes col=None, others a column ({out!r})"
            )
    for out, strat in fill.items():
        if out not in aggs or strat not in ("ffill", "zero", None):
            raise ValueError(f"resample_fill: bad fill entry {out!r}: {strat!r}")
    P = int(num_partitions)
    pcols = [f"__rs{i}" for i in range(len(aggs))]
    specs = list(aggs.items())

    def _partial_agg(t: pa.Table, in_names: list[str], *, merge: bool) -> pa.Table:
        """group (by, __rb) and aggregate in_names -> pcols (name-safe).

        ``merge=False`` is the map-side combine (count counts rows);
        ``merge=True`` folds partials (count partials SUM — re-counting
        rows here would cap every count at the number of batches)."""
        agg_list, emitted = [], []
        for name, (_out, (func, _col)) in zip(in_names, specs):
            if func == "count" and not merge:
                agg_list.append(([], "count_all"))
                emitted.append("count_all")
            else:
                f = _PFUNC[func]
                agg_list.append((name, f))
                emitted.append(f"{name}_{f}")
        from .agg import _group_by_nullsafe
        res = _group_by_nullsafe(t, by + ["__rb"], agg_list)
        cols = {c: res.column(c) for c in by + ["__rb"]}
        for e, p in zip(emitted, pcols):
            cols[p] = res.column(e)
        return pa.table(cols)

    def combine(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col)
        if not pa.types.is_timestamp(ts.type):
            raise TypeError(f"resample_fill: {ts_col!r} is {ts.type}, not timestamp")
        t = t.filter(pc.is_valid(ts))
        # normalize to microsecond resolution (ns inputs truncate)
        us = pc.cast(
            t.column(ts_col),
            pa.timestamp("us", getattr(ts.type, "tz", None)),
            safe=False,
        )
        tsv = pc.cast(us, pa.int64()).to_numpy(zero_copy_only=False)
        b = np.floor_divide(tsv, E) * E  # toward -inf, integer-exact
        work = {c: t.column(c) for c in by}
        work["__rb"] = pa.array(b)
        names = []
        for p, (_out, (func, col)) in zip(pcols, specs):
            if col is not None:
                work[f"i{p}"] = t.column(col)
            names.append(f"i{p}")
        out_t = _partial_agg(pa.table(work), names, merge=False)
        return out_t.append_column("__rp", pa.array(_partition_of_keys(out_t, by, P)))

    def _seg_mask(cols: list[pa.Array], n: int) -> np.ndarray:
        """row-starts-new-segment mask under IS DISTINCT FROM."""
        m = np.zeros(n, dtype=bool)
        if n:
            m[0] = True
        for col in cols:
            valid = np.asarray(col.is_valid())
            neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
            neq = np.asarray(neq.fill_null(False))
            m[1:] |= (valid[1:] != valid[: n - 1]) | (valid[1:] & valid[: n - 1] & neq)
        return m

    def kernel(g: pa.Table) -> pa.Table:
        merged = _partial_agg(g.drop_columns(["__rp"]), pcols, merge=True)
        merged = merged.sort_by([(c, "ascending") for c in by + ["__rb"]])
        merged = merged.combine_chunks()
        n = len(merged)
        bycols = [merged.column(c).combine_chunks() for c in by]
        nseg_mask = _seg_mask(bycols, n)
        seg = np.cumsum(nseg_mask) - 1
        starts = np.flatnonzero(nseg_mask)
        b = merged.column("__rb").to_numpy(zero_copy_only=False)
        ends = np.append(starts[1:], n) - 1
        mn, mx = b[starts], b[ends]
        counts = (mx - mn) // E + 1
        goff = np.concatenate(([0], np.cumsum(counts)))
        total = int(goff[-1])
        rep = np.repeat(np.arange(len(starts)), counts)
        grid_b = mn[rep] + (np.arange(total, dtype=np.int64) - goff[rep]) * E
        pos = goff[seg] + (b - mn[seg]) // E  # slot of each merged row
        take_keys = pa.array(starts[rep], pa.int64())
        out = {c: col.take(take_keys) for c, col in zip(by, bycols)}
        out["bucket"] = pa.array(grid_b).cast(pa.timestamp("us"))
        arange = np.arange(total, dtype=np.int64)
        seg_base = goff[rep]  # first grid index of this row's segment
        for p, (oname, (_func, _col)) in zip(pcols, specs):
            arr = merged.column(p).combine_chunks()
            t = arr.type
            base = pa.float64() if pa.types.is_floating(t) else pa.int64()
            a = pc.cast(arr, base)
            vnp = a.to_numpy(zero_copy_only=False)
            avalid = np.asarray(a.is_valid())
            if base == pa.float64():
                vnp = np.nan_to_num(vnp, nan=0.0)
            else:
                vnp = np.where(avalid, np.nan_to_num(vnp.astype(np.float64)), 0).astype(
                    np.int64
                ) if vnp.dtype != np.int64 else np.where(avalid, vnp, 0)
            gv = np.zeros(total, dtype=vnp.dtype)
            gvalid = np.zeros(total, dtype=bool)
            gv[pos] = vnp
            gvalid[pos] = avalid
            strat = fill.get(oname)
            if strat == "ffill":
                idx = np.where(gvalid, arange, -1)
                acc = np.maximum.accumulate(idx)
                ok = (acc >= seg_base) & (acc >= 0)  # no cross-segment leak
                gv = gv[np.clip(acc, 0, None)]
                gvalid = ok
            elif strat == "zero":
                gvalid = np.ones(total, dtype=bool)
            out[oname] = pa.array(gv, mask=~gvalid).cast(t)
        return pa.table(out)

    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__rp")
        .map_groups(kernel, batch_format="pyarrow")
    )


def sequence_pattern_match(
    ds: "Dataset",
    by: "str | list[str]",
    label_col: str,
    order_by,
    pattern: str,
    *,
    sep: str = " ",
    num_partitions: int = 64,
    out_name: str = "matched",
) -> "Dataset":
    """MATCH_RECOGNIZE-lite: per-key ordered label sequences tested
    against a regex → the ``by`` columns + ``seq`` + ``out_name``
    (bool). The event-path analog of SQL's row-pattern matching,
    composed from the engine's own primitives: :func:`group_concat`
    builds each key's ordered label string in ONE fixed-P shuffle +
    one vectorized kernel, then the regex runs map-only through
    Arrow's RE2 kernel over the O(groups) sequence table — the raw
    events never pass through Python and never move twice.

    Semantics: labels join with ``sep`` (pick one that cannot occur
    inside a label); an all-null-label group has a NULL sequence and
    NEVER matches (SQL three-valued regexp on NULL); anchors and
    greedy/lazy quantifiers are RE2's (same engine DuckDB's
    ``regexp_matches`` uses, which is what the oracle checks). Pin
    ``order_by`` ties with a unique tiebreak or the sequence — and
    therefore the match — is engine-dependent.
    """
    import pyarrow.compute as pc

    seq = group_concat(
        ds, by, label_col, order_by,
        sep=sep, out_name="seq", num_partitions=num_partitions,
    )

    def m(t: pa.Table) -> pa.Table:
        s = t.column("seq")
        if pa.types.is_null(s.type):
            ok = pa.array([False] * t.num_rows, pa.bool_())
        else:
            ok = pc.fill_null(pc.match_substring_regex(s, pattern), False)
        return t.append_column(out_name, ok)

    return seq.map_batches(m, batch_format="pyarrow", zero_copy_batch=True)


def association_stats(
    ds: "Dataset",
    col_a: str,
    col_b: str,
    *,
    num_partitions: int = 16,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Association between two categorical columns → one row
    ``{n, dof, chi2, mi, cramers_v}``: Pearson's chi-squared statistic
    of independence, mutual information (nats), and Cramér's V — the
    profiling statistics that decide whether a column pair is worth a
    composite partitioning key or a learned feature cross.

    Distributed part = the contingency table: ONE map-side-combined
    ``grouped_agg`` count over ``(a, b)`` (SQL GROUP BY null
    semantics: null categories form real rows). The driver then folds
    the O(|A|·|B|) cell table — categorical cardinalities, not data
    size. Rows with BOTH values present count toward n; chi2/mi
    formulas use the standard observed-vs-expected sums over nonzero
    cells, rounded to ``round_dp``.
    """
    from .agg import grouped_agg

    cells = grouped_agg(
        ds, [col_a, col_b], {"c": ("count", None)}, num_partitions=num_partitions
    ).to_pandas()
    cells = cells.dropna(subset=[col_a, col_b])
    n = int(cells.c.sum())
    if n == 0:
        return pd.DataFrame(
            {"n": [0], "dof": [0], "chi2": [np.nan], "mi": [np.nan],
             "cramers_v": [np.nan]}
        )
    piv = cells.pivot_table(index=col_a, columns=col_b, values="c",
                            fill_value=0, aggfunc="sum")
    O = piv.to_numpy(dtype=np.float64)
    row = O.sum(1, keepdims=True)
    colt = O.sum(0, keepdims=True)
    E = row @ colt / n
    nz = E > 0
    chi2 = float(((O - E)[nz] ** 2 / E[nz]).sum())
    onz = O > 0
    mi = float((O[onz] / n * np.log(O[onz] * n / (row @ colt)[onz])).sum())
    r, k = O.shape
    dof = (r - 1) * (k - 1)
    denom = n * max(min(r - 1, k - 1), 1)
    v = float(np.sqrt(chi2 / denom)) if dof > 0 else np.nan
    return pd.DataFrame(
        {"n": [n], "dof": [int(dof)], "chi2": [round(chi2, round_dp)],
         "mi": [round(mi, round_dp)],
         "cramers_v": [round(v, round_dp)] if dof > 0 else [np.nan]}
    )


def grouped_quantile_cont(
    ds: "Dataset",
    key: str,
    col: str,
    q: float,
    *,
    bits_per_pass: int = 16,
    num_partitions: int = 32,
    round_dp: int | None = 6,
) -> pd.DataFrame:
    """EXACT per-group interpolated quantile (``quantile_cont`` /
    PERCENTILE_CONT: v[floor(h)] + (h − floor(h))·(v[ceil(h)] −
    v[floor(h)]) at h = (n−1)·q over the group's sorted non-null
    values) → {key, value}.

    Rides :func:`grouped_quantile_disc`'s radix narrowing twice — once
    per bracketing rank — plus one tiny non-null count pass for the
    interpolation fraction; all three are streaming jobs with
    O(groups × 2^bits) driver state, values never co-locate. Groups
    where h is integral (or n == 1) reduce to the single order
    statistic exactly.
    """
    from .agg import grouped_agg

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")

    def valid_flag(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        varr = t.column(col)
        ok = pc.cast(pc.is_valid(varr), pa.int64())
        return pa.table({key: t.column(key), "ok": ok})

    nn = grouped_agg(
        ds.map_batches(valid_flag, batch_format="pyarrow", zero_copy_batch=True),
        key, {"n": ("sum", "ok")}, num_partitions=num_partitions,
    ).to_pandas()
    nn = nn[nn.n > 0]

    lo = grouped_quantile_disc(
        ds, key, col, q, bits_per_pass=bits_per_pass,
        num_partitions=num_partitions,
        _rank_of=lambda n: int(np.floor((n - 1) * q)),
    ).rename(columns={"value": "vlo"})
    hi = grouped_quantile_disc(
        ds, key, col, q, bits_per_pass=bits_per_pass,
        num_partitions=num_partitions,
        _rank_of=lambda n: int(np.ceil((n - 1) * q)),
    ).rename(columns={"value": "vhi"})
    m = nn.merge(lo, on=key).merge(hi, on=key)
    h = (m.n.to_numpy(dtype=np.float64) - 1.0) * q
    frac = h - np.floor(h)
    v = m.vlo.to_numpy() + frac * (m.vhi.to_numpy() - m.vlo.to_numpy())
    out = pd.DataFrame({key: m[key], "value": v})
    if round_dp is not None:
        out["value"] = out["value"].round(round_dp)
    return out.sort_values(key).reset_index(drop=True)


def grouped_mode(
    ds: "Dataset",
    key: "str | list[str]",
    col: str,
    *,
    num_partitions: int = 32,
) -> "Dataset":
    """Deterministic per-group MODE → ``key`` cols + ``mode`` +
    ``mode_count``: the most frequent non-null value, ties broken by
    the SMALLEST value (SQL engines leave mode() ties unspecified;
    pinning them makes the operator oracle-able). Two map-side-combined
    ``grouped_agg`` passes — (key, value) counts, then a per-partition
    argmax kernel over the O(distinct pairs) count table; raw rows
    never co-locate by key alone.
    """
    import pyarrow.compute as pc

    from .agg import grouped_agg

    keys = [key] if isinstance(key, str) else list(key)

    def drop_null_vals(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(col)))

    counts = grouped_agg(
        ds.map_batches(drop_null_vals, batch_format="pyarrow", zero_copy_batch=True),
        [*keys, col],
        {"c": ("count", None)},
        num_partitions=num_partitions,
    )

    def argmax_kernel(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df.sort_values([*keys, "c", col], ascending=[*([True] * len(keys)), False, True])
        top = df.groupby(keys, dropna=False, sort=False).head(1)
        out = top.rename(columns={col: "mode", "c": "mode_count"})
        return pa.Table.from_pandas(
            out[[*keys, "mode", "mode_count"]], preserve_index=False
        )

    # count-table rows for one key group all share the key: ONE more
    # keyed exchange over the (small) distinct-pair table
    from .agg import _partition_of_keys

    P = int(num_partitions)

    def route(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__mp", pa.array(_partition_of_keys(t, keys, P))
        )

    return (
        counts.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__mp")
        .map_groups(
            lambda g: argmax_kernel(g.drop_columns(["__mp"])),
            batch_format="pyarrow",
        )
    )


def grouped_entropy(
    ds: "Dataset",
    key: "str | list[str]",
    col: str,
    *,
    num_partitions: int = 32,
    round_dp: int | None = 6,
) -> "Dataset":
    """Per-group Shannon entropy (nats) of a categorical column →
    ``key`` cols + ``n`` + ``entropy``: H = −Σ p·ln p over the group's
    non-null value distribution (diversity / concentration profiling —
    single-valued groups read 0, uniform groups read ln(k)).

    Fully distributed: ONE map-side-combined count over (key, value),
    then the −c·ln c partial rides a SECOND map-side-combined sum per
    key (the identity H = ln n − (Σ c·ln c)/n lets both passes stay
    mergeable — no per-group distribution ever co-locates, only
    O(distinct pairs) count rows and O(groups) moment rows move).
    """
    import pyarrow.compute as pc

    from .agg import grouped_agg

    keys = [key] if isinstance(key, str) else list(key)

    def drop_null_vals(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t.column(col)))

    counts = grouped_agg(
        ds.map_batches(drop_null_vals, batch_format="pyarrow", zero_copy_batch=True),
        [*keys, col],
        {"c": ("count", None)},
        num_partitions=num_partitions,
    )

    def clogc(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        cols = {k: t.column(k) for k in keys}
        cols["c"] = t.column("c")
        cols["clc"] = pa.array(c * np.log(c))
        return pa.table(cols)

    moments = grouped_agg(
        counts.map_batches(clogc, batch_format="pyarrow", zero_copy_batch=True),
        keys,
        {"n": ("sum", "c"), "sclc": ("sum", "clc")},
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sclc = t.column("sclc").to_numpy(zero_copy_only=False)
        h = np.log(n) - sclc / n  # exact for n >= 1; 0 for single-value
        h = np.maximum(h, 0.0)  # fp guard (H >= 0 by definition)
        if round_dp is not None:
            h = np.round(h, round_dp)
        cols = {k: t.column(k) for k in keys}
        cols["n"] = pa.compute.cast(t.column("n"), pa.int64())
        cols["entropy"] = pa.array(h)
        return pa.table(cols)

    return moments.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample_by_group(
    ds: "Dataset",
    group_col: str,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 5,
    seed: int = 0,
) -> pd.DataFrame:
    """Per-group weighted sample WITHOUT replacement (A-ES keys per
    :func:`weighted_sample`, kept top-k PER GROUP) → {group_col,
    id_col, weight_col} — stratified sampling where each stratum's
    inclusion probability is ∝ weight, deterministic and
    partitioning-independent (derived randomness: splitmix64 of the
    id hash ⊕ seed). Scale shape = :func:`stratified_sample`'s
    combiner: each batch forwards ≤ k rows per group it saw, the
    final fold sees O(groups × k × blocks) rows — the group catalog
    is assumed bounded (sources, splits, shards), never a
    fine-grained key.
    """
    from ..functions.hashing import hash64_ints, hash_strings

    def block_topk(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if pa.types.is_integer(ids.type):
            h = hash64_ints(
                ids.to_numpy(zero_copy_only=False).astype(np.int64), seed=seed + 1
            )
        else:
            h = hash_strings(ids, seed=seed + 1)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        with np.errstate(divide="ignore"):
            key = u ** (1.0 / np.maximum(w, 1e-300))
        key = np.where(w > 0, key, -1.0)
        df = pd.DataFrame(
            {group_col: t.column(group_col).to_pandas(),
             id_col: ids.to_pandas(),
             weight_col: t.column(weight_col).to_pandas(),
             "akey": key}
        )
        df = df[df.akey >= 0]
        df = df.sort_values("akey", ascending=False).groupby(
            group_col, sort=False
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = ds.map_batches(
        block_topk, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    out = (
        parts.sort_values("akey", ascending=False)
        .groupby(group_col, sort=False)
        .head(k)
        .drop(columns=["akey"])
    )
    return out.sort_values([group_col, id_col]).reset_index(drop=True)


# ------------------------------------------------- time-decayed activity
def decayed_activity(
    read_events,
    *,
    half_life_days: int = 1,
    topk: int = 100,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Per-user time-decayed activity score (recency-weighted engagement):
    score = Σ value · 0.5^(age_days // half_life_days), age measured
    back from the corpus max timestamp → top-``topk`` users by score.

    The freshness-weighting primitive behind "active user" / "recent
    contribution" rankings. Exactness contract: the decay weight
    0.5^d is an exact power of two (value·2^-d only shifts the
    exponent — NO float rounding), so the single rounding step is the
    1e-6 quantization to int64, half-away-from-zero — bit-equal under
    any partitioning and re-derivable in SQL (``ROUND(value *
    pow(0.5, d) * 1e6)``). Scale shape: the reference timestamp is a
    skinny per-batch max fold (O(blocks) rows to the driver), the
    score is a map-side-combined fixed-P grouped int sum; values
    never ship un-aggregated. ``read_events`` is a zero-arg factory
    returning a fresh pruned Dataset (two passes over a column-pruned
    read, both streaming).

    Reference analog: per-partition fill counters aggregated to the
    driver (src/main.cpp:120 probe-side stats), generalized to a
    keyed decay fold.
    """
    us_per = np.int64(86_400_000_000) * np.int64(half_life_days)

    def batch_max(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
        if len(ts) == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array([int(ts.astype(np.int64).max())])})

    parts = read_events().map_batches(
        batch_max, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "score_q": pd.Series([], dtype=np.int64),
                             "n_events": pd.Series([], dtype=np.int64)})
    t_max = np.int64(parts["m"].max())

    def derive(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        valid = ~np.isnan(v)
        age = (t_max - ts[valid]) // us_per
        # exact: v * 2^-age shifts the exponent only; one rounding at 1e-6
        u = v[valid] * np.power(0.5, age.astype(np.float64)) * 1_000_000.0
        q = np.trunc(u + np.copysign(0.5, u)).astype(np.int64)
        return pa.table({"user_id": pa.array(uid[valid]), "qv": pa.array(q)})

    from .agg import grouped_agg

    out = grouped_agg(
        read_events().map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"],
        {"score_q": ("sum", "qv"), "n_events": ("count", None)},
        num_partitions=num_partitions,
    ).to_pandas()
    out["score_q"] = out["score_q"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    out = out.sort_values(
        ["score_q", "user_id"], ascending=[False, True]
    ).head(topk)
    return out.reset_index(drop=True)


# ---------------------------------------------------- k-anonymity audit
def k_anonymity_audit(
    ds: "Dataset",
    *,
    k: int = 5,
    bin_width: float = 10.0,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Privacy audit: quasi-identifier tuples (event_type, hour-of-day,
    value bucket) whose group size is < ``k`` — the rows a k-anonymity
    release would have to suppress or generalize.

    Map-only derive (hour from epoch-µs integer division, bucket =
    floor(value/width) — both exact on doubles) + one fixed-P grouped
    count over O(tuples) skinny partials; the < k filter runs on the
    already-aggregated group table. NULL values are dropped (COUNT(col)
    semantics). Output: {event_type, hour, vbin, n} for flagged tuples.
    """
    from .agg import grouped_agg

    w = float(bin_width)

    def derive(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        valid = ~np.isnan(v)
        hour = (ts[valid] // 3_600_000_000) % 24
        vbin = np.floor(v[valid] / w).astype(np.int64)
        return pa.table(
            {"event_type": t.column("event_type").filter(pa.array(valid)),
             "hour": pa.array(hour), "vbin": pa.array(vbin)}
        )

    out = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour", "vbin"],
        {"n": ("count", None)},
        num_partitions=num_partitions,
    ).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out = out[out["n"] < int(k)]
    return out.sort_values(["event_type", "hour", "vbin"]).reset_index(drop=True)


# ------------------------------------------------- PSI distribution drift
def value_psi(
    read_events,
    *,
    bin_width: float = 10.0,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Population Stability Index between the first and second time
    half of the stream: per value-bucket Laplace-smoothed rates and
    the PSI contribution (p2 − p1)·ln(p2/p1), quantized to 1e-9 int64
    — the standard data-drift monitor for a continuously ingested
    corpus (Σ contrib ⇒ PSI; > 0.2 conventionally flags drift).

    Two skinny passes over a column-pruned read: an O(blocks) min/max
    timestamp fold picks the midpoint split (integer µs, no float),
    then one fixed-P grouped count of (bucket, half) partials —
    O(buckets) rows shuffle, values never do. The driver fold is
    O(buckets). Smoothing p = (c+1)/(n+B) with B = observed bucket
    count keeps every contribution finite and makes the float chain a
    fixed-shape expression both engines evaluate identically (one
    rounding per op, same libm ln). Output: {vbin, n1, n2, contrib_q}.
    """
    from .agg import grouped_agg

    w = float(bin_width)

    def batch_minmax(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        if len(ts) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(ts.min())]),
                         "hi": pa.array([int(ts.max())])})

    mm = read_events().map_batches(
        batch_minmax, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if len(mm) == 0:
        return pd.DataFrame({"vbin": pd.Series([], dtype=np.int64),
                             "n1": pd.Series([], dtype=np.int64),
                             "n2": pd.Series([], dtype=np.int64),
                             "contrib_q": pd.Series([], dtype=np.int64)})
    lo, hi = np.int64(mm["lo"].min()), np.int64(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def derive(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        v = t.column("value").to_numpy(zero_copy_only=False)
        valid = ~np.isnan(v)
        vbin = np.floor(v[valid] / w).astype(np.int64)
        half = np.where(ts[valid] < mid, np.int64(1), np.int64(2))
        return pa.table({"vbin": pa.array(vbin), "half": pa.array(half)})

    counts = grouped_agg(
        read_events().map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["vbin", "half"],
        {"n": ("count", None)},
        num_partitions=num_partitions,
    ).to_pandas()
    piv = counts.pivot_table(index="vbin", columns="half", values="n",
                             aggfunc="sum", fill_value=0)
    for h in (1, 2):
        if h not in piv.columns:
            piv[h] = 0
    c1 = piv[1].to_numpy(dtype=np.int64)
    c2 = piv[2].to_numpy(dtype=np.int64)
    n1, n2, B = int(c1.sum()), int(c2.sum()), len(piv)
    p1 = (c1 + 1.0) / (n1 + B)
    p2 = (c2 + 1.0) / (n2 + B)
    u = (p2 - p1) * np.log(p2 / p1) * 1_000_000_000.0
    q = np.trunc(u + np.copysign(0.5, u)).astype(np.int64)
    out = pd.DataFrame({"vbin": piv.index.to_numpy(dtype=np.int64),
                        "n1": c1, "n2": c2, "contrib_q": q})
    return out.sort_values("vbin").reset_index(drop=True)


# ------------------------------------------------ cuckoo-filter retract
def cuckoo_retract(
    ds: "Dataset",
    retract_source: str,
    *,
    text_col: str = "text",
    source_col: str = "source",
    num_buckets_per_part: int = 1 << 10,
    bucket_size: int = 4,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Corpus membership with RETRACTION via a partitioned cuckoo-filter
    store → the same 1-row report shape as
    :func:`counting_bloom_retract`, plus {load_factor, fpr_bound} — the
    space-efficient alternative (16-bit tags ≈ plain-Bloom bits/item vs
    K int32 counters/item) when deletes must be supported.

    Cuckoo layout is insertion-order-dependent (evictions), so unlike
    the counting Bloom this is NOT an order-free mergeable UDAF: the
    build uses the PARTITIONED-STORE discipline instead — rows route on
    ``hash % P`` (one shuffle of 9-byte skinny rows), each partition's
    kernel builds ONE filter from its SORTED hashes (insert all
    ascending, then delete the retracted subset ascending) — a
    deterministic, partitioning-independent layout, mirroring the
    reference's per-thread shard ownership (src/main.cpp:86). The
    probe pass broadcasts the O(P · buckets · b · 2B) shard dict once
    and folds exact int64 partials per block.

    Zero-FN invariant: kept_contained == kept_total (cuckoo inserts
    cannot lose a live fingerprint; retraction deletes exactly one
    matching copy per retracted row, and every retracted row was
    inserted). Retracted keys re-test positive only at the tag-collision
    FPR ≈ 2b/2^16.
    """
    import ray

    from ..functions.hashing import hash_strings
    from ..state import CuckooFilter
    from ..state.base import deserialize_sketch as _de

    P = int(num_partitions)

    def _keys(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        import pyarrow.compute as pc

        joined = pc.binary_join_element_wise(
            pc.cast(t.column(source_col), pa.string()),
            pc.cast(t.column(text_col), pa.string()),
            "\x1f",
        )
        h = hash_strings(joined.combine_chunks())
        retract = pc.equal(t.column(source_col), retract_source).to_numpy(
            zero_copy_only=False
        )
        return h, retract

    def route(t: pa.Table) -> pa.Table:
        h, retract = _keys(t)
        return pa.table(
            {"part": pa.array((h % np.uint64(P)).astype(np.int32)),
             "h": pa.array(h.view(np.int64)),
             "retract": pa.array(retract)}
        )

    def build_partition(g: pa.Table) -> pa.Table:
        part = int(g.column("part")[0].as_py())
        h = g.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        retract = g.column("retract").to_numpy(zero_copy_only=False)
        cf = CuckooFilter(num_buckets=num_buckets_per_part, bucket_size=bucket_size)
        cf.update_hashes(np.sort(h))
        dh = np.sort(h[retract])
        ok = cf.delete_hashes(dh)
        if not ok.all():
            raise AssertionError("cuckoo retract of an inserted key failed")
        return pa.table(
            {"part": pa.array([part], pa.int32()),
             "blob": pa.array([cf.serialize()], pa.binary()),
             "n_added": pa.array([len(h)], pa.int64()),
             "n_deleted": pa.array([len(dh)], pa.int64())}
        )

    built = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(build_partition, batch_format="pyarrow")
        .to_pandas()
    )
    shards = {int(r.part): _de(r.blob) for r in built.itertuples()}
    n_added = int(built["n_added"].sum())
    n_deleted = int(built["n_deleted"].sum())
    sh_ref = ray.put(shards)

    def probe(t: pa.Table) -> pa.Table:
        sh = ray.get(sh_ref)
        h, retract = _keys(t)
        part = (h % np.uint64(P)).astype(np.int64)
        hit = np.zeros(len(h), dtype=bool)
        for p in np.unique(part):
            m = part == p
            if p in sh:
                hit[m] = sh[p].contains(h[m])
        return pa.table({
            "kept_contained": pa.array([int(hit[~retract].sum())], pa.int64()),
            "kept_total": pa.array([int((~retract).sum())], pa.int64()),
            "retracted_contained": pa.array([int(hit[retract].sum())], pa.int64()),
            "retracted_total": pa.array([int(retract.sum())], pa.int64()),
        })

    folded = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True).sum(
        ["kept_contained", "kept_total", "retracted_contained", "retracted_total"]
    )
    total_slots = sum(s.slots.size for s in shards.values())
    live_slots = sum(int((s.slots != 0).sum()) for s in shards.values())
    # empty input: no shards were built — emit the zero report instead
    # of StopIteration/ZeroDivisionError (counting_bloom_retract's rule)
    if not shards:
        total_slots, live_slots = 1, 0
        from ..state.cuckoo import CuckooFilter

        any_cf = CuckooFilter()
    else:
        any_cf = next(iter(shards.values()))
    return pd.DataFrame({
        "n_added": pd.array([n_added], dtype="int64"),
        "n_deleted": pd.array([n_deleted], dtype="int64"),
        "n_live": pd.array([n_added - n_deleted], dtype="int64"),
        "kept_contained": pd.array([int(folded["sum(kept_contained)"] or 0)], dtype="int64"),
        "kept_total": pd.array([int(folded["sum(kept_total)"] or 0)], dtype="int64"),
        "retracted_contained": pd.array(
            [int(folded["sum(retracted_contained)"] or 0)], dtype="int64"),
        "retracted_total": pd.array([int(folded["sum(retracted_total)"] or 0)], dtype="int64"),
        "load_factor": [round(live_slots / total_slots, 6)],
        "fpr_bound": [any_cf.fpr_bound()],
    })


# ------------------------------------------------- grouped Welch t-test
def grouped_welch_t(
    read_events,
    *,
    by: str = "event_type",
    col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Welch's two-sample t statistic per group between the first and
    second time half of the stream → {by, n1, n2, t_q} — the
    significance companion to :func:`value_psi`: PSI says the
    distribution moved, Welch's t says whether the MEAN moved more
    than chance for that sample size.

    Exactness contract: values quantize to int64 at 1e-3 half-away
    FIRST, so every moment (Σq, Σq²) is an exact integer fold
    (order-free ⇒ partition-invariant; Σq² stays < 2^53 for the
    fixture range, loud failure otherwise); the t statistic is one
    fixed-shape float chain from those integers — identical in DuckDB
    — quantized to 1e-6 int64. Groups with fewer than 2 rows in
    either half are dropped (variance undefined). Two skinny passes
    (O(blocks) min/max fold, one fixed-P grouped sum of
    O(groups × 2) partials); values never shuffle.
    """
    from .agg import grouped_agg

    def batch_minmax(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        if len(ts) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(ts.min())]),
                         "hi": pa.array([int(ts.max())])})

    mm = read_events().map_batches(
        batch_minmax, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    empty = pd.DataFrame({by: pd.Series([], dtype=object),
                          "n1": pd.Series([], dtype=np.int64),
                          "n2": pd.Series([], dtype=np.int64),
                          "t_q": pd.Series([], dtype=np.int64)})
    if len(mm) == 0:
        return empty
    lo, hi = np.int64(mm["lo"].min()), np.int64(mm["hi"].max())
    mid = lo + (hi - lo) // 2

    def derive(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        v = t.column(col).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(v)
        q = np.trunc(v[valid] * 1e3 + np.copysign(0.5, v[valid])).astype(np.int64)
        if len(q) and np.abs(q).max() > 3_000_000:
            raise ValueError("value out of quantization range (|v| > 3000)")
        half = np.where(ts[valid] < mid, np.int64(1), np.int64(2))
        return pa.table(
            {by: t.column(by).filter(pa.array(valid)),
             "half": pa.array(half), "q": pa.array(q),
             "qq": pa.array(q * q)}
        )

    m = grouped_agg(
        read_events().map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        [by, "half"],
        {"n": ("count", None), "s": ("sum", "q"), "ss": ("sum", "qq")},
        num_partitions=num_partitions,
    ).to_pandas()
    piv = m.pivot_table(index=by, columns="half",
                        values=["n", "s", "ss"], aggfunc="sum", fill_value=0)
    rows = []
    for g in piv.index:
        n1 = int(piv.loc[g, ("n", 1)]) if ("n", 1) in piv.columns else 0
        n2 = int(piv.loc[g, ("n", 2)]) if ("n", 2) in piv.columns else 0
        if n1 < 2 or n2 < 2:
            continue
        s1 = float(piv.loc[g, ("s", 1)]); s2 = float(piv.loc[g, ("s", 2)])
        ss1 = float(piv.loc[g, ("ss", 1)]); ss2 = float(piv.loc[g, ("ss", 2)])
        va = (ss1 - (s1 / n1) * s1) / (n1 - 1)
        vb = (ss2 - (s2 / n2) * s2) / (n2 - 1)
        t_stat = (s1 / n1 - s2 / n2) / np.sqrt(va / n1 + vb / n2)
        u = t_stat * 1e6
        rows.append((g, n1, n2, int(np.trunc(u + np.copysign(0.5, u)))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=[by, "n1", "n2", "t_q"])
    out["n1"] = out["n1"].astype(np.int64)
    out["n2"] = out["n2"].astype(np.int64)
    out["t_q"] = out["t_q"].astype(np.int64)
    return out.sort_values(by).reset_index(drop=True)


def grouped_ols_trend(
    read_events,
    *,
    by: str = "user_id",
    col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-group OLS trend of ``col`` against time → {by, n, slope_q}:
    is each user's engagement value drifting up or down? The
    regression companion to :func:`grouped_welch_t` (which only
    compares two halves) — slope = (nΣtv − ΣtΣv) / (nΣt² − (Σt)²)
    with t in whole hours since the global stream start.

    Exactness contract: t is an integer hour offset and v quantizes
    to int64 at 1e-3 half-away FIRST, so all five moments
    (n, Σt, Σv, Σtv, Σt²) are exact integer folds (order-free ⇒
    partition-invariant). The cross terms are formed in PYTHON INT
    arithmetic (exact, unbounded) — matching DuckDB's HUGEINT sums —
    and only the final ratio is float, quantized to 1e-6. Groups with
    n < 2 or zero time variance (all events in one hour) are dropped.
    Two skinny passes: an O(blocks) min-fold for the epoch, then one
    fixed-P grouped sum of O(groups × 4) partials; values never
    co-locate. Range guard: |q| ≤ 3e6 and hour offsets ≤ 2^20 keep
    every per-row product < 2^53 before the exact grouped fold.

    Reference analog: per-partition fill counters
    (`src/main.cpp:81,87`) — per-key running statistics folded across
    a partitioned stream.
    """
    from .agg import grouped_agg

    def batch_min(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        if len(ts) == 0:
            return pa.table({"lo": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(ts.min())])})

    mm = read_events().map_batches(
        batch_min, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    empty = pd.DataFrame({by: pd.Series([], dtype=np.int64),
                          "n": pd.Series([], dtype=np.int64),
                          "slope_q": pd.Series([], dtype=np.int64)})
    if len(mm) == 0:
        return empty
    lo = int(mm["lo"].min())

    def derive(t: pa.Table) -> pa.Table:
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        v = t.column(col).to_numpy(zero_copy_only=False)
        valid = ~np.isnan(v)
        q = np.trunc(v[valid] * 1e3 + np.copysign(0.5, v[valid])).astype(np.int64)
        hr = (ts[valid] - lo) // 3_600_000_000
        if len(q) and (np.abs(q).max() > 3_000_000 or hr.max() >= (1 << 20)):
            raise ValueError("value/time out of exact-integer range")
        return pa.table(
            {by: t.column(by).filter(pa.array(valid)),
             "t": pa.array(hr), "v": pa.array(q),
             "tv": pa.array(hr * q), "tt": pa.array(hr * hr)}
        )

    m = grouped_agg(
        read_events().map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        [by],
        {"n": ("count", None), "st": ("sum", "t"), "sv": ("sum", "v"),
         "stv": ("sum", "tv"), "stt": ("sum", "tt")},
        num_partitions=num_partitions,
    ).to_pandas()
    if len(m) == 0:
        return empty
    rows = []
    for g, n, st, sv, stv, stt in m[[by, "n", "st", "sv", "stv", "stt"]].itertuples(
        index=False
    ):
        n, st, sv, stv, stt = int(n), int(st), int(sv), int(stv), int(stt)
        den = n * stt - st * st   # exact python ints == DuckDB HUGEINT
        if n < 2 or den == 0:
            continue
        slope = float(n * stv - st * sv) / float(den)
        u = slope * 1e6
        rows.append((g, n, int(np.trunc(u + np.copysign(0.5, u)))))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=[by, "n", "slope_q"])
    out["n"] = out["n"].astype(np.int64)
    out["slope_q"] = out["slope_q"].astype(np.int64)
    return out.sort_values(by).reset_index(drop=True)


def grouped_cusum_alerts(
    read_events,
    *,
    by: str = "user_id",
    col: str = "value",
    k_milli: int = 250,
    h_milli: int = 2000,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """Per-group one-sided (upward) CUSUM change-point detection over
    each group's chronological value stream →
    {by, n_events, first_alert, smax}: the classic drift alarm
    s_t = max(0, s_{t-1} + x_t − μ − k), here computed by the exact
    prefix identity  s_t = C_t − min(0, min_{j≤t} C_j)  with
    C_t = Σ_{i≤t}(x_i − μ − k) — which makes the recursion pure
    window algebra (cumsum + running min), replayable by a SQL
    oracle. μ is the EXACT global mean of the 1e-3-quantized values;
    to stay integer-exact the whole statistic scales by N·1e3:
    C_t = N·Σx_m − t·S − t·N·k_milli (all int64). An alert fires
    when s_t > h_milli·N (h in value-milli-units); ``first_alert``
    is the 1-based event ordinal of the first alert (0 = never) and
    ``smax`` is the peak statistic in value units (1e-6-quantized as
    smax_int / (1000·N), the single float step).

    Scale shape: one O(blocks) Sum pass for (N, S); ONE fixed-P
    group-keyed shuffle co-locating each group's rows; the partition
    kernel is pandas C-grouped cumsum/cummin (no per-group Ray
    tasks). Rows with null/NaN values drop (same rule as
    grouped_ols_trend). Order within a group is (ts, event id) — the
    unique id breaks timestamp ties deterministically. Range guard:
    the kernel asserts every int64 term stays < 2^61 from exact
    python-int bounds and fails loudly rather than wrapping.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import splitmix64

    P = int(num_partitions)
    KM = int(k_milli)
    HM = int(h_milli)

    def quant_rows(t: pa.Table) -> pa.Table:
        s = t.column(col)
        if pa.types.is_null(s.type):  # all-null block arrives null-typed
            v = np.full(t.num_rows, np.nan)
        else:
            v = s.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(v)
        q = np.trunc(v[valid] * 1e3 + np.copysign(0.5, v[valid])).astype(np.int64)
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)[valid]
        )
        g = t.column(by).to_numpy(zero_copy_only=False)[valid]
        eid = t.column("event_id").to_numpy(zero_copy_only=False)[valid]
        return pa.table(
            {"p": pa.array((splitmix64(g.astype(np.uint64)) % np.uint64(P))
                           .astype(np.int32)),
             by: pa.array(g), "ts": pa.array(ts), "eid": pa.array(eid),
             "xm": pa.array(q)}
        )

    rows = read_events().map_batches(
        quant_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def stat_partials(t: pa.Table) -> pa.Table:
        return pa.table(
            {"n": pa.array([t.num_rows], pa.int64()),
             "s": pa.array([int(t.column("xm").to_numpy(
                 zero_copy_only=False).sum(dtype=np.int64))], pa.int64())}
        )

    empty = pd.DataFrame(
        {by: pd.Series(dtype=np.int64),
         "n_events": pd.Series(dtype=np.int64),
         "first_alert": pd.Series(dtype=np.int64),
         "smax": pd.Series(dtype=np.float64)}
    )
    agg = rows.map_batches(
        stat_partials, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    N = int(agg["n"] or 0)
    S = int(agg["s"] or 0)
    if N == 0:
        return empty

    def kernel(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {by: g.column(by).to_numpy(zero_copy_only=False),
             "ts": g.column("ts").to_numpy(zero_copy_only=False),
             "eid": g.column("eid").to_numpy(zero_copy_only=False),
             "xm": g.column("xm").to_numpy(zero_copy_only=False)}
        ).sort_values([by, "ts", "eid"], kind="mergesort")
        grp = df.groupby(by, sort=False)
        cx = grp["xm"].cumsum().to_numpy(np.int64)
        t = (grp.cumcount() + 1).to_numpy(np.int64)
        # exact python-int range guard before any int64 product
        mcx = int(np.abs(cx).max()) if len(cx) else 0
        mt = int(t.max()) if len(t) else 0
        if N * mcx + mt * abs(S) + mt * N * KM >= (1 << 61):
            raise ValueError("CUSUM terms out of exact int64 range")
        ct = N * cx - t * S - t * (N * KM)
        df["ct"] = ct
        pm = np.minimum(df.groupby(by, sort=False)["ct"].cummin()
                        .to_numpy(np.int64), 0)
        st = ct - pm
        thr = HM * N
        df["st"] = st
        df["t"] = t
        df["hit_t"] = np.where(st > thr, t, 0)
        out = df.groupby(by, sort=False).agg(
            n_events=("t", "max"), smax_i=("st", "max"))
        hits = df[df["hit_t"] > 0].groupby(by, sort=False)["hit_t"].min()
        out["first_alert"] = hits.reindex(out.index).fillna(0).astype(np.int64)
        out = out.reset_index()
        return pa.table(
            {by: pa.array(out[by].to_numpy(np.int64)),
             "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
             "first_alert": pa.array(out["first_alert"].to_numpy(np.int64)),
             "smax_i": pa.array(out["smax_i"].to_numpy(np.int64))}
        )

    res = rows.groupby("p").map_groups(kernel, batch_format="pyarrow").to_pandas()
    if res.empty:
        return empty
    # single float step, mirrored by the oracle: (smax_i / (1000*N))
    # quantized at 1e-6 half-up (st >= 0 always)
    q = res["smax_i"].to_numpy(np.float64) / (1000.0 * N)
    res["smax"] = np.trunc(q * 1e6 + 0.5).astype(np.int64) / 1e6
    res = res.drop(columns=["smax_i"])
    return res.sort_values(by).reset_index(drop=True)[
        [by, "n_events", "first_alert", "smax"]
    ]


def event_type_markov(
    read_events,
    *,
    iters: int = 12,
    num_partitions: int = 32,
) -> pd.DataFrame:
    """User-behavior Markov chain over event types →
    {event_type, out_transitions, pi}: the empirical transition matrix
    from each user's chronological event stream, and its stationary
    distribution after ``iters`` synchronous power-iteration steps
    from the uniform vector (the where-do-sessions-settle readout).

    Semantics pinned for the SQL oracle: a transition is each
    consecutive (prev, next) pair within a user ordered by
    (ts, event_id); P[i,j] = C[i,j] / rowsum(i), and a type with NO
    outgoing transitions behaves as a dangling node — uniform 1/T row
    (PageRank's rule). Exactness: each product term x_i·P[i,j]
    quantizes to int64 1e-12 units half-up BEFORE the order-free sum
    (so the float-sum order never matters, engine or SQL); the final
    pi quantizes at 1e-9.

    Scale shape: ONE user-keyed fixed-P shuffle (a user's rows
    co-locate, so LAG is partition-local-is-global), a grouped sum of
    (prev, next) partials, plus a tiny distinct-type fold; the dense
    T x T matrix and the iteration live on the driver because T is
    the FIXED event-type cardinality (the TPC-H small-dims rule), not
    a data-scaled dimension.
    """
    from ..functions.hashing import splitmix64
    from .agg import grouped_agg

    P = int(num_partitions)

    def route(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = (
            t.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {"p": pa.array((splitmix64(u.astype(np.uint64)) % np.uint64(P))
                           .astype(np.int32)),
             "u": pa.array(u), "ts": pa.array(ts),
             "eid": t.column("event_id"), "et": t.column("event_type")}
        )

    # materialized: the transition pipeline AND the type-catalog fold
    # both consume these rows — lazy re-execution would re-read and
    # re-route the full event stream for the tiny second pass
    rows = read_events().map_batches(
        route, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def lag_counts(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"u": g.column("u").to_numpy(zero_copy_only=False),
             "ts": g.column("ts").to_numpy(zero_copy_only=False),
             "eid": g.column("eid").to_numpy(zero_copy_only=False),
             "et": g.column("et").to_pandas()}
        ).sort_values(["u", "ts", "eid"], kind="mergesort")
        df["prev"] = df.groupby("u", sort=False)["et"].shift(1)
        tr = df.dropna(subset=["prev"]).groupby(["prev", "et"], sort=False)
        cnt = tr.size().reset_index(name="c")
        return pa.table({"a": pa.array(cnt["prev"].astype(str)),
                         "b": pa.array(cnt["et"].astype(str)),
                         "c": pa.array(cnt["c"].to_numpy(np.int64))})

    trans = grouped_agg(
        rows.groupby("p").map_groups(lag_counts, batch_format="pyarrow"),
        ["a", "b"], {"c": ("sum", "c")}, num_partitions=8,
    ).to_pandas()

    def type_rows(t: pa.Table) -> pa.Table:
        return pa.table({"et": t.column("et")})

    types = sorted(
        grouped_agg(
            rows.map_batches(type_rows, batch_format="pyarrow",
                             zero_copy_batch=True),
            "et", {"n": ("count", None)}, num_partitions=8,
        ).to_pandas()["et"]
    )
    empty = pd.DataFrame(
        {"event_type": pd.Series(dtype=object),
         "out_transitions": pd.Series(dtype=np.int64),
         "pi": pd.Series(dtype=np.float64)}
    )
    T = len(types)
    if T == 0:
        return empty
    idx = {t: i for i, t in enumerate(types)}
    C = np.zeros((T, T), dtype=np.int64)
    for a, b, c in trans[["a", "b", "c"]].itertuples(index=False):
        C[idx[a], idx[b]] = int(c)
    R = C.sum(axis=1)
    Pm = np.empty((T, T), dtype=np.float64)
    for i in range(T):
        Pm[i] = (1.0 / T) if R[i] == 0 else C[i] / R[i]
    x = np.full(T, 1.0 / T)
    for _ in range(int(iters)):
        terms = np.trunc((x[:, None] * Pm) * 1e12 + 0.5).astype(np.int64)
        x = terms.sum(axis=0) / 1e12
    pi = np.trunc(x * 1e9 + 0.5).astype(np.int64) / 1e9
    return pd.DataFrame(
        {"event_type": types, "out_transitions": R.astype(np.int64),
         "pi": pi}
    )


def value_decile_profile(
    read_events,
    *,
    by: str = "event_type",
    col: str = "value",
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Per-group counts in each GLOBAL exact decile bucket →
    {by, bucket, n}: how every group's value distribution sits
    against the whole stream's — the quantile-bucket drift profile
    (the fixed-reference cousin of the PSI check).

    Boundaries are EXACT PERCENTILE_DISC order statistics (element at
    0-based ceil(q·n)−1) of the 1e-3-quantized values, k/10 for
    k = 1..9; bucket(v) = #{k : b_k <= v_q} ∈ [0, 9] — integer
    comparisons only, so boundary ties are unambiguous and the SQL
    oracle replays bit-for-bit. Nulls drop (SQL aggregate
    semantics).

    Scale shape: quantization bounds the distinct-value universe by
    the VALUE RANGE (≤ ~range·1e3 milli-values) rather than the row
    count, so ONE grouped count over xm yields a driver-side sorted
    histogram from which all nine boundaries read off exactly (no
    9-fold radix narrowing); pass 2 is map-only bucketing + one
    fixed-P grouped count of O(groups × 10) rows. The histogram fold
    is the documented driver bound — for unbounded-range columns use
    grouped_quantile_disc's narrowing per boundary instead.
    """
    from .agg import grouped_agg

    def quant(t: pa.Table) -> pa.Table:
        s = t.column(col)
        if pa.types.is_null(s.type):
            v = np.full(t.num_rows, np.nan)
        else:
            v = s.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(v)
        q = np.trunc(v[valid] * 1e3 + np.copysign(0.5, v[valid])).astype(np.int64)
        g = t.column(by).filter(pa.array(valid))
        return pa.table({by: g, "xm": pa.array(q)})

    rows = read_events().map_batches(
        quant, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def xm_only(t: pa.Table) -> pa.Table:
        return pa.table({"xm": t.column("xm")})

    hist = grouped_agg(
        rows.map_batches(xm_only, batch_format="pyarrow", zero_copy_batch=True),
        "xm", {"c": ("count", None)}, num_partitions=num_partitions,
    ).to_pandas()
    empty = pd.DataFrame(
        {by: pd.Series(dtype=object), "bucket": pd.Series(dtype=np.int64),
         "n": pd.Series(dtype=np.int64)}
    )
    if hist.empty:
        return empty
    hist = hist.sort_values("xm")
    xs = hist["xm"].to_numpy(np.int64)
    cum = hist["c"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    # b_k = smallest xm with cumulative count >= ceil(k*n/10)
    bounds = np.array(
        [xs[np.searchsorted(cum, (k * n + 9) // 10, side="left")]
         for k in range(1, 10)], dtype=np.int64
    )

    def bucketize(t: pa.Table) -> pa.Table:
        xm = t.column("xm").to_numpy(zero_copy_only=False)
        b = np.searchsorted(bounds, xm, side="right").astype(np.int64)
        return pa.table({by: t.column(by), "bucket": pa.array(b)})

    out = grouped_agg(
        rows.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True),
        [by, "bucket"], {"n": ("count", None)}, num_partitions=8,
    ).to_pandas()
    if out.empty:
        return empty
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values([by, "bucket"]).reset_index(drop=True)


def customer_rfm_segments(
    read_orders,
    *,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """RFM customer segmentation over the orders stream →
    {segment, n_customers, monetary_total}: the classic
    recency/frequency/monetary quartile coding. Per customer:
    R = whole days between the GLOBAL latest order date and the
    customer's latest (higher = colder), F = order count, M = exact
    cents sum of o_totalprice (1e-2 half-up). Each metric scores
    1 + #{k ∈ 1..3 : b_k <= x} against its global quartile boundaries
    (PERCENTILE_DISC order statistics, ceil(q·n)−1 — the engine's
    pinned quantile convention), and segment = 100·r + 10·f + m.

    Scale shape: ONE customer-keyed grouped fold builds the
    per-customer metric rows as a Dataset (never a driver frame);
    three grouped value-counts over that derived table give
    range-bounded histograms (days / counts / cents) from which the
    nine boundaries read off on the driver; scoring is map-only and
    the output is one O(segments) grouped fold. monetary_total is the
    exact integer cents sum divided once by 100.
    """
    from .agg import grouped_agg

    def derive(t: pa.Table) -> pa.Table:
        ts = (
            t.column("o_orderdate").to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = np.trunc(v * 100 + 0.5).astype(np.int64)
        return pa.table(
            {"c": t.column("o_custkey"), "ts": pa.array(ts),
             "cents": pa.array(cents),
             "one": pa.array(np.ones(len(ts), np.int64))}
        )

    rows = read_orders().map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    per_cust = grouped_agg(
        rows, "c",
        {"mx": ("max", "ts"), "f": ("sum", "one"), "m": ("sum", "cents")},
        num_partitions=num_partitions,
    ).materialize()

    empty = pd.DataFrame(
        {"segment": pd.Series(dtype=np.int64),
         "n_customers": pd.Series(dtype=np.int64),
         "monetary_total": pd.Series(dtype=np.float64)}
    )

    def ts_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        return pa.table({"mx": pa.array(
            [int(t.column("mx").to_numpy(zero_copy_only=False).max())])})

    gm = per_cust.map_batches(ts_max, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    if gm.empty:
        return empty
    gmax = int(gm["mx"].max())

    DAY = 86_400_000_000

    def metrics(t: pa.Table) -> pa.Table:
        mx = t.column("mx").to_numpy(zero_copy_only=False)
        return pa.table(
            {"c": t.column("c"), "r": pa.array((gmax - mx) // DAY),
             "f": t.column("f"), "m": t.column("m")}
        )

    met = per_cust.map_batches(metrics, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def quartiles(colname: str) -> np.ndarray:
        def col_rows(t: pa.Table) -> pa.Table:
            return pa.table({"x": t.column(colname)})

        h = grouped_agg(
            met.map_batches(col_rows, batch_format="pyarrow",
                            zero_copy_batch=True),
            "x", {"n": ("count", None)}, num_partitions=8,
        ).to_pandas().sort_values("x")
        xs = h["x"].to_numpy(np.int64)
        cum = h["n"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        return np.array(
            [xs[np.searchsorted(cum, (k * n + 3) // 4, side="left")]
             for k in (1, 2, 3)], dtype=np.int64
        )

    qb = {c: quartiles(c) for c in ("r", "f", "m")}

    def score(t: pa.Table) -> pa.Table:
        seg = np.ones(t.num_rows, np.int64) * 111
        for c, w in (("r", 100), ("f", 10), ("m", 1)):
            x = t.column(c).to_numpy(zero_copy_only=False)
            seg += w * np.searchsorted(qb[c], x, side="right").astype(np.int64)
        return pa.table({"segment": pa.array(seg), "m": t.column("m"),
                         "one": pa.array(np.ones(t.num_rows, np.int64))})

    out = grouped_agg(
        met.map_batches(score, batch_format="pyarrow", zero_copy_batch=True),
        "segment", {"n_customers": ("sum", "one"), "mc": ("sum", "m")},
        num_partitions=8,
    ).to_pandas()
    if out.empty:
        return empty
    out["monetary_total"] = out["mc"].astype(np.int64) / 100.0
    out = out.drop(columns=["mc"]).astype(
        {"segment": np.int64, "n_customers": np.int64}
    )
    return out.sort_values("segment").reset_index(drop=True)[
        ["segment", "n_customers", "monetary_total"]
    ]


def benford_digit_audit(
    read_rows,
    *,
    col: str = "o_totalprice",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Benford first-digit audit of a positive amount column →
    {digit, n, expected, dev}: observed leading-digit counts of the
    exact CENTS integers (1e-2 half-up — defined on cents so the
    digit extraction is pure integer/string, no float log edge
    cases), Benford expectation E_d = n·log10(1 + 1/d), and the
    per-digit chi-square deviation (O−E)²/E. expected and dev
    quantize at 1e-6 half-up from the single mirrored float
    expression, so the audit replays bit-for-bit in SQL. Rows with
    null or non-positive amounts drop.

    Scale shape: map-only digit extraction + ONE fixed-P grouped
    count of 9-row partials; the Benford comparison is a driver fold
    over 9 rows.
    """
    from .agg import grouped_agg

    def digits(t: pa.Table) -> pa.Table:
        s = t.column(col)
        if pa.types.is_null(s.type):
            return pa.table({"digit": pa.array([], pa.int64())})
        v = s.to_numpy(zero_copy_only=False).astype(np.float64)
        valid = ~np.isnan(v) & (v > 0)
        cents = np.trunc(v[valid] * 100 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        # leading decimal digit fully in integer arithmetic: magnitude
        # by searchsorted over the 19 int64 powers of ten (exact — no
        # float log edge cases at powers of 10)
        p10 = np.array([10 ** k for k in range(19)], dtype=np.int64)
        mag = np.searchsorted(p10, cents, side="right") - 1
        lead = cents // p10[mag]
        return pa.table({"digit": pa.array(lead.astype(np.int64))})

    cnt = grouped_agg(
        read_rows().map_batches(digits, batch_format="pyarrow",
                                zero_copy_batch=True),
        "digit", {"n": ("count", None)}, num_partitions=num_partitions,
    ).to_pandas()
    empty = pd.DataFrame(
        {"digit": pd.Series(dtype=np.int64), "n": pd.Series(dtype=np.int64),
         "expected": pd.Series(dtype=np.float64),
         "dev": pd.Series(dtype=np.float64)}
    )
    if cnt.empty:
        return empty
    obs = {int(d): int(n) for d, n in cnt[["digit", "n"]].itertuples(index=False)}
    n = sum(obs.values())
    rows = []
    for d in range(1, 10):
        o = obs.get(d, 0)
        e = n * np.log10(1.0 + 1.0 / d)
        dev = (o - e) * (o - e) / e
        rows.append((d, o,
                     int(np.trunc(e * 1e6 + 0.5)) / 1e6,
                     int(np.trunc(dev * 1e6 + 0.5)) / 1e6))
    return pd.DataFrame(rows, columns=["digit", "n", "expected", "dev"]).astype(
        {"digit": np.int64, "n": np.int64}
    )


def value_cdf_profile(
    ds: "Dataset",
    by: str = "event_type",
    col: str = "value",
    *,
    compression: float = 200.0,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Sketch-mode quantile-transform profile → {by, n, mean_cdf}:
    every value maps to its approximate GLOBAL percentile through one
    mergeable t-digest (the classic percentile feature transform),
    then per-group means report where each group's distribution sits
    — the t-digest counterpart of the exact decile profile, for the
    unbounded-range columns where the quantized histogram trick
    doesn't apply.

    Determinism: the global digest is built from per-block partials
    folded by the same SketchAgg machinery the grouped-quantile
    sketches use (bit-pinned against the from-spec sequential twin
    via the chunked-build model); each per-row cdf quantizes to int64
    1e-6 half-up BEFORE the order-free grouped sum, and the mean is
    the integer round-half-up (2·sum + n) // (2n). Null values drop
    on BOTH the digest build and the transform. Two streaming passes;
    the digest (KBs) broadcasts read-only into the transform.
    """
    from .agg import grouped_agg

    def valid_rows(t: pa.Table) -> pa.Table:
        s = t.column(col)
        if pa.types.is_null(s.type):
            v = np.full(t.num_rows, np.nan)
        else:
            v = s.to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ~np.isnan(v)
        return pa.table({by: t.column(by).filter(pa.array(keep)),
                         "v": pa.array(v[keep]), "g": pa.array(
                             np.zeros(int(keep.sum()), np.int64))})

    rows = ds.map_batches(
        valid_rows, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    empty = pd.DataFrame(
        {by: pd.Series(dtype=object), "n": pd.Series(dtype=np.int64),
         "mean_cdf": pd.Series(dtype=np.float64)}
    )
    # CONTENT-partitioned digest build (block identity is useless here:
    # a materialized map's block order is task-completion order):
    # values route on splitmix64 of their float64 bit pattern, each
    # partition's multiset sorts ascending before ONE digest build
    # (fixed buffer-compress cadence => bit-deterministic), and the P
    # partials fold in partition-id order — invariant to any block
    # structure or task scheduling, mirrored by the from-spec twin
    from ..functions.hashing import splitmix64

    DP = 16

    def route(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        h = splitmix64(v.view(np.uint64)) % np.uint64(DP)
        return pa.table({"dp": pa.array(h.astype(np.int32)),
                         "v": t.column("v")})

    def part_digest(g: pa.Table) -> pa.Table:
        v = np.sort(g.column("v").to_numpy(zero_copy_only=False))
        sk = TDigest(compression)
        sk.update_values(v)
        return pa.table(
            {"dp": pa.array([int(g.column("dp")[0].as_py())], pa.int32()),
             "sketch": pa.array([sk.serialize()], pa.binary())}
        )

    parts = (
        rows.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dp")
        .map_groups(part_digest, batch_format="pyarrow")
        .take_all()
    )
    if not parts:
        return empty
    parts = sorted(parts, key=lambda r: r["dp"])
    acc = deserialize_sketch(parts[0]["sketch"])
    for r in parts[1:]:
        acc = acc.merge(deserialize_sketch(r["sketch"]))
    digest_bytes = acc.serialize()

    def transform(t: pa.Table) -> pa.Table:
        sk = deserialize_sketch(digest_bytes)
        v = t.column("v").to_numpy(zero_copy_only=False)
        u6 = np.trunc(sk.cdf(v) * 1e6 + 0.5).astype(np.int64)
        return pa.table({by: t.column(by), "u6": pa.array(u6),
                         "one": pa.array(np.ones(len(v), np.int64))})

    out = grouped_agg(
        rows.map_batches(transform, batch_format="pyarrow",
                         zero_copy_batch=True),
        by, {"n": ("sum", "one"), "s": ("sum", "u6")},
        num_partitions=num_partitions,
    ).to_pandas()
    if out.empty:
        return empty
    n = out["n"].to_numpy(np.int64)
    s = out["s"].to_numpy(np.int64)
    out["mean_cdf"] = (2 * s + n) // (2 * n) / 1e6
    out["n"] = out["n"].astype(np.int64)
    return out.drop(columns=["s"]).sort_values(by).reset_index(drop=True)[
        [by, "n", "mean_cdf"]
    ]
