"""Relational pipelines over the driver testdata (TPC-H-ish tables).

These prove the general operator surface (filter / project / grouped
aggregate / broadcast join / semi-join / sort / top-k / windowed
aggregate) as Ray-Data-first compositions, and put the flagship Bloom
filter to its canonical production use: a broadcast semi-join
pre-filter with exact verification (zero false negatives makes the
result exact; the filter only prunes).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64_ints, hash_strings
from ..state import BloomFilter

if TYPE_CHECKING:
    from ray.data import Dataset


def read(sf_dir: str, table: str, columns: list[str] | None = None) -> "Dataset":
    """Column-pruned, block-sized read of one fixture table.

    Block count tracks the file size (~1 MB/block, clamped to [4, 64]):
    Ray's default split produces 64+ blocks even for sub-MB files, and
    every downstream sort-shuffle pays latency PER UPSTREAM BLOCK
    (measured: an orders⋈customer hash join dropped 5.6 s → 0.6 s at
    sf0.1 going from default to 8 read blocks). At real scale the
    byte-proportional rule keeps blocks ~1 MB compressed; callers with
    bigger pipelines size blocks explicitly.
    """
    import os

    import ray.data

    path = f"{sf_dir}/{table}.parquet"
    try:
        nb = max(4, min(64, os.path.getsize(path) >> 20))
    except OSError:
        nb = None
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=nb)


# ----------------------------------------------------------------- TPC-H Q1
def tpch_q1(sf_dir: str, ship_cutoff: str = "1998-09-02") -> pd.DataFrame:
    """Pricing summary report (TPC-H Q1 shape): grouped exact aggregates.

    Vectorized derived columns inside map_batches, partial-friendly
    Sum/Count aggregates, small result → pandas.
    """
    from ray.data.aggregate import Count, Sum

    ds = read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64(ship_cutoff, "us"))

    def derive(t: pa.Table) -> pa.Table:
        """Derive integer-scaled (cent) columns.

        Money columns carry exactly 2 decimal digits, so sums computed
        in scaled int64 are EXACT and independent of block/summation
        order — float sums round-trip differently per partitioning and
        break bit-for-bit oracle parity (observed at rounding
        boundaries of 4-decimal products).
        """
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))

        def cents(col):
            return np.rint(t[col].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)

        # int64 headroom note: charge_u6 is ~4e10/row, so Sum stays exact
        # up to ~2e8 rows per GROUP (~TPC-H SF 150 in one group); beyond
        # that the scaled sums must widen to decimal128 partials

        qty_c, price_c = cents("l_quantity"), cents("l_extendedprice")
        disc_c, tax_c = cents("l_discount"), cents("l_tax")
        disc_price_u4 = price_c * (100 - disc_c)  # units of 1e-4
        charge_u6 = disc_price_u4 * (100 + tax_c)  # units of 1e-6
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_c": qty_c,
                "price_c": price_c,
                "disc_c": disc_c,
                "disc_price_u4": disc_price_u4,
                "charge_u6": charge_u6,
            }
        )

    out = (
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_c", alias_name="sum_qty_c"),
            Sum("price_c", alias_name="sum_price_c"),
            Sum("disc_c", alias_name="sum_disc_c"),
            Sum("disc_price_u4", alias_name="sum_disc_price_u4"),
            Sum("charge_u6", alias_name="sum_charge_u6"),
            Count(alias_name="count_order"),
        )
    )
    df = out.to_pandas()
    n = df["count_order"].astype("int64")
    res = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            # exact ints → one deterministic double conversion at the end
            "sum_qty": df["sum_qty_c"] / 100.0,
            "sum_base_price": df["sum_price_c"] / 100.0,
            "sum_disc_price": df["sum_disc_price_u4"] / 10000.0,
            "sum_charge": df["sum_charge_u6"] / 1000000.0,
            "avg_qty": df["sum_qty_c"] / (100.0 * n),
            "avg_price": df["sum_price_c"] / (100.0 * n),
            "avg_disc": df["sum_disc_c"] / (100.0 * n),
            "count_order": n,
        }
    )
    return res.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# ------------------------------------------------- Bloom semi-join (flagship use)
def bloom_semijoin_lineitem(
    sf_dir: str,
    min_retailprice: float = 910.0,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 6,
    exact_verify: bool = True,
) -> pd.DataFrame:
    """lineitem rows whose part is 'expensive' — Bloom-prefiltered semi-join.

    The production pattern for the reference's build+probe phases:
    build a Bloom filter over the small side's keys (driver-side here —
    the small side is a dimension table), ``ray.put`` it once, prune
    the big side inside ``map_batches`` (no shuffle), then exact-verify
    against the broadcast key set so false positives are removed and
    the result is exact (zero false negatives guarantees no lost rows).

    Returns {l_orderkey, l_linenumber, l_partkey}.
    """
    import ray

    # small-side key scan: vectorized local read of the dimension table
    # (at scale: a column-pruned Dataset filter + take of just the keys)
    import pyarrow.parquet as pq

    part_tbl = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_retailprice"]
    )
    key_arr = (
        part_tbl.filter(pc.greater_equal(part_tbl["p_retailprice"], min_retailprice))
        .column("p_partkey")
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )

    bf = BloomFilter(num_bits, num_hashes)
    bf.update_hashes(hash64_ints(key_arr))
    bf_ref = ray.put(bf.serialize())
    keyset_ref = ray.put(np.sort(key_arr))

    class SemiJoin:
        def __init__(self):
            from ..state.base import deserialize_sketch

            self.bf = deserialize_sketch(ray.get(bf_ref))
            self.keys = ray.get(keyset_ref) if exact_verify else None

        def __call__(self, t: pa.Table) -> pa.Table:
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)
            mask = self.bf.contains(hash64_ints(pk))
            if self.keys is not None and mask.any():
                # exact verification only on Bloom survivors
                sub = pk[mask]
                verified = self.keys[
                    np.clip(np.searchsorted(self.keys, sub), 0, len(self.keys) - 1)
                ] == sub
                mask[np.flatnonzero(mask)[~verified]] = False
            return t.filter(pa.array(mask))

    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_partkey"])
    out = ds.map_batches(
        SemiJoin, batch_format="pyarrow", zero_copy_batch=True, concurrency=2
    )
    df = out.to_pandas()
    if df.empty:  # keep a stable schema even when nothing survives
        df = pd.DataFrame(columns=["l_orderkey", "l_linenumber", "l_partkey"]).astype("int64")
    return df.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def dedup_new_against_corpus(
    sf_dir: str,
    new_source: str = "src0",
    bloom_bits: int = 1 << 22,
    num_hashes: int = 4,
) -> pd.DataFrame:
    """Incremental dedup: {doc_id} of new-batch documents
    (``source == new_source``) whose text does NOT already appear in
    the existing corpus (every other source) — the reference's
    build+probe composition (`src/main.cpp` phase 1 build, phase 2
    probe `src/SkmerSplitter.cpp:91-151`) applied to content-hash
    membership, the shape of "dedupe today's crawl against the store".

    EXACT result despite the sketch: the corpus content-hash Bloom is
    broadcast and the probe splits the new batch into definitely-new
    rows (Bloom negative — no false negatives, these never enter a
    shuffle) and candidate duplicates (Bloom positive — exact-verified
    by the general ``hash_join(how="anti")`` on the 64-bit content
    hash, shuffling only candidates + corpus hashes, never text). At a
    realistic dup rate the verify shuffle carries a few percent of the
    new batch — the Bloom prunes the rest, which is the entire point
    of the reference's architecture.
    """
    from ..state import BloomFilter
    from ..state.base import deserialize_sketch
    from ..stages.sketch_agg import SketchAgg
    from .join import hash_join

    import ray

    docs = read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    new_s = str(new_source)

    def hashes(t: pa.Table) -> pa.Table:
        h = hash_strings(t.column("text").combine_chunks())
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "gh": pa.array(h.view(np.int64)),
             "is_new": pc.equal(t.column("source"), new_s)}
        )

    hashed = docs.map_batches(
        hashes, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # consumed by build + two probe passes

    old = hashed.filter(expr="is_new == False").select_columns(["gh"])
    res = old.aggregate(
        SketchAgg(lambda: BloomFilter(bloom_bits, num_hashes), on="gh")
    )
    bf = deserialize_sketch(res["sketch"]) if res and res.get("sketch") is not None \
        else BloomFilter(bloom_bits, num_hashes)
    bf_ref = ray.put(("bloom_bits", bf.num_bits, bf.num_hashes, bf.n_added, bf.bits))

    class Probe:
        def __init__(self, keep_member: bool):
            _, nb, nh, na, bits = ray.get(bf_ref)
            self.bf = BloomFilter.from_bits(nb, nh, bits, na)
            self.keep_member = keep_member

        def __call__(self, t: pa.Table) -> pa.Table:
            m = self.bf.contains(
                t.column("gh").to_numpy(zero_copy_only=False).view(np.uint64)
            )
            return t.filter(pa.array(m if self.keep_member else ~m))

    new = hashed.filter(expr="is_new == True").select_columns(["doc_id", "gh"])
    definite = new.map_batches(
        Probe, fn_constructor_kwargs={"keep_member": False},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=2,
    ).select_columns(["doc_id"])
    cand = new.map_batches(
        Probe, fn_constructor_kwargs={"keep_member": True},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=2,
    )
    verified = hash_join(
        cand, old, on="gh", how="anti", num_partitions=16
    ).select_columns(["doc_id"])

    df = definite.union(verified).to_pandas()
    if df.empty:
        df = pd.DataFrame({"doc_id": pd.array([], dtype="int64")})
    return df.sort_values("doc_id").reset_index(drop=True)


# -------------------------------------------------------------- top-k join
def top_customers(sf_dir: str, topk: int = 10) -> pd.DataFrame:
    """Top customers by total order value: groupby-sum → top-k →
    broadcast join of the small dimension (names). {c_custkey, c_name, revenue}."""
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    # per-customer sums inside fixed hash partitions (one Ray group per
    # customer pays per-group overhead at web scale); each partition
    # emits its local top-k — the global top-k is a subset of the union
    P_SHUF = 64

    def add_cp(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return t.append_column("cp", pa.array((ck % P_SHUF).astype(np.int32)))

    def local_topk(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o_custkey": g.column("o_custkey").to_numpy(zero_copy_only=False),
             "v": g.column("o_totalprice").to_numpy(zero_copy_only=False)}
        )
        sums = df.groupby("o_custkey", sort=False)["v"].sum().reset_index()
        sums = sums.sort_values(["v", "o_custkey"], ascending=[False, True]).head(topk)
        return pa.table(
            {"o_custkey": pa.array(sums["o_custkey"].to_numpy(dtype=np.int64)),
             "revenue": pa.array(sums["v"].to_numpy(dtype=np.float64))}
        )

    top = (
        orders.map_batches(add_cp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cp")
        .map_groups(local_topk, batch_format="pyarrow")
        .sort(["revenue", "o_custkey"], descending=[True, False])
        .limit(topk)
        .to_pandas()
    )

    # decorate the k winners with names: push `c_custkey IN (top-k keys)`
    # into the parquet read (row-group pruning at the source) — the
    # driver never materializes the full dimension table, which at 100×
    # is GBs (reference analog: probe only what the filter admits,
    # src/SkmerSplitter.cpp:132-136)
    import pyarrow.dataset as pads
    import ray.data

    keys = top["o_custkey"].to_numpy(dtype=np.int64)
    cust = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filter=pads.field("c_custkey").isin(keys.tolist()),
        )
        .to_pandas()
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey", how="left")
    return (
        out[["c_custkey", "c_name", "revenue"]]
        .sort_values(["revenue", "c_custkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------- windowed events
def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windowed aggregate over the events stream table:
    {event_type, hour, n_events, sum_value}.

    Ray Data has no event-time windows; a tumbling window IS a grouped
    aggregate on the truncated timestamp (ray_guide streaming note) —
    no per-key ordering assumption needed for count/sum. Group count
    grows with the stream's time span (hours × types), so the
    aggregate runs through ``grouped_agg``'s fixed-partition combiner
    rather than Ray's per-group Aggregate.
    """
    from .agg import grouped_agg

    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def trunc(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {"event_type": t["event_type"], "hour": hour, "value": t["value"]}
        )

    out = grouped_agg(
        ds.map_batches(trunc, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "hour"],
        {"n_events": ("count", None), "sum_value": ("sum", "value")},
    )
    return (
        out.to_pandas().sort_values(["event_type", "hour"]).reset_index(drop=True)
    )


def events_hourly_distinct(sf_dir: str, num_partitions: int = 64) -> pd.DataFrame:
    """Exact windowed COUNT(DISTINCT): {event_type, hour, n_users} —
    distinct users per event type per tumbling hour.

    Distinct-count is the one grouped aggregate that can't pre-sum, so
    the dedup itself is the wide step: per-batch distinct
    (type, hour, user) triples (arrow ``group_by`` with no aggregates
    — the combiner: shuffle volume is distinct-per-batch, not event
    volume), shuffle on ``user % P`` (FIXED partition count; identical
    triples co-locate because the user id does), per-partition global
    distinct + count per (type, hour), then a tiny ``grouped_agg`` sum
    of the per-partition partial counts. The approximate counterpart
    at much lower shuffle cost is the grouped-HLL pipeline
    (``distinct_by_source_hll``) — this is the exact anchor.
    """
    from .agg import grouped_agg

    P = int(num_partitions)
    ds = read(sf_dir, "events", columns=["event_type", "ts", "user_id"])

    def distinct_triples(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        trip = pa.table(
            {"event_type": t["event_type"], "hour": hour, "user_id": t["user_id"]}
        ).group_by(["event_type", "hour", "user_id"]).aggregate([])
        uid = trip.column("user_id").to_numpy(zero_copy_only=False)
        return trip.append_column("up", pa.array((uid % P).astype(np.int32)))

    def partition_counts(g: pa.Table) -> pa.Table:
        d = g.group_by(["event_type", "hour", "user_id"]).aggregate([])
        c = d.group_by(["event_type", "hour"]).aggregate([([], "count_all")])
        return c.rename_columns(["event_type", "hour", "cnt"])

    out = grouped_agg(
        ds.map_batches(distinct_triples, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(partition_counts, batch_format="pyarrow"),
        ["event_type", "hour"],
        {"n_users": ("sum", "cnt")},
    )
    return (
        out.to_pandas().sort_values(["event_type", "hour"]).reset_index(drop=True)
    )


# -------------------------------------------------------------- exact dedup
def dedup_exact_documents(sf_dir: str) -> pd.DataFrame:
    """Exact text dedup: keep MIN(doc_id) per distinct text → {doc_id}.

    Scale shape: 64-bit content hash inside map_batches (never ships
    full text through the shuffle), groupby(hash) → min. Collision
    probability at 2^-64 per pair is negligible; a paranoid variant
    would groupby the text itself.
    """
    from ..functions.hashing import hash_strings

    ds = read(sf_dir, "documents", columns=["doc_id", "text"])
    P_SHUF = 64

    def add_hash(t: pa.Table) -> pa.Table:
        h = hash_strings(t["text"].combine_chunks()).view(np.int64)
        return pa.table(
            {"hp": pa.array(np.abs(h) % P_SHUF), "h": pa.array(h), "doc_id": t["doc_id"]}
        )

    def partition_min(g: pa.Table) -> pa.Table:
        h = g.column("h").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        first = np.flatnonzero(np.diff(h, prepend=h[0] - 1)) if len(h) else []
        return pa.table({"doc_id": pa.array(ids[first])})

    kept = (
        ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(partition_min, batch_format="pyarrow")
    )
    return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ------------------------------------------------------------ sessionization
def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Gap-based sessionization per user → one row per session:
    {user_id, session_start, session_end, n_events, sum_value}.

    The classic streaming window op expressed Ray-Data-first: ONE
    shuffle keyed on ``user_id % P`` (fixed partition count — per-user
    groups would pay Ray's per-group overhead at millions of users),
    then each partition sessionizes ALL its users in one vectorized
    pass: sort by (user, ts), session breaks where the user changes or
    the gap exceeds the threshold, reduceat aggregates per session.
    Floats: sum_value rounded to 2 dp for oracle parity.
    """
    import ray.data

    gap = np.timedelta64(gap_minutes * 60, "s")
    P_SHUF = 64

    def add_up(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("up", pa.array((uid % P_SHUF).astype(np.int32)))

    def per_partition(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((ts, uid))
        uid, ts, val = uid[order], ts[order], val[order]
        n = len(uid)
        new_session = np.ones(n, dtype=bool)
        if n > 1:
            same_user = uid[1:] == uid[:-1]
            new_session[1:] = ~same_user | ((ts[1:] - ts[:-1]) > gap)
        starts = np.flatnonzero(new_session)
        ends = np.concatenate([starts[1:], [n]]) - 1
        return pa.table(
            {
                "user_id": pa.array(uid[starts]),
                "session_start": pa.array(ts[starts]),
                "session_end": pa.array(ts[ends]),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "sum_value": pa.array(np.round(np.add.reduceat(val, starts), 2)),
            }
        )

    ds = read(sf_dir, "events", columns=["user_id", "ts", "value"])
    out = (
        ds.map_batches(add_up, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    return (
        out.to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


# ------------------------------------------------------------ corpus curation
def curate_corpus(
    sf_dir: str,
    *,
    min_tok: int = 20,
    max_tok: int = 5000,
    min_ttr: float = 0.2,
) -> pd.DataFrame:
    """Training-data curation chain: quality gate → exact dedup →
    per-source corpus stats {source, n_docs, total_tok, avg_ttr}.

    One streaming pass computes the per-doc features (vectorized), the
    gate is a batch filter on UNROUNDED ratios (the oracle gates
    unrounded and rounds only the final AVG — gating on a 6-dp display
    value would diverge within ~5e-7 of the threshold), dedup is a
    shuffle-side semi-join on the content hash (keep min doc_id per
    hash INSIDE fixed hash partitions — no driver materialization, no
    broadcast of the kept-id set, so the keep step scales with the
    shuffle, not with driver memory), and the final stats are a tiny
    grouped aggregate — the composition a 100 TB curation job runs, at
    fixture scale, with a DuckDB oracle.
    """
    from ray.data.aggregate import Count, Mean, Sum

    from ..functions.hashing import hash_strings
    from ..stages.quality import make_quality_fn

    ds = read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    qfn = make_quality_fn(round_dp=None)
    P_SHUF = 64

    def features(t: pa.Table) -> pa.Table:
        # drop zero-token rows FIRST with the same mask the quality fn
        # applies internally, so q's rows align 1:1 with t's (an isin on
        # doc_id would silently break on duplicate ids)
        from ..stages.quality import _row_layout

        _, offs = _row_layout(t)
        t = t.filter(pa.array(np.diff(offs) > 0))
        q = qfn(t)
        h = hash_strings(t.column("text").combine_chunks()).view(np.int64)
        return q.append_column("source", t.column("source")).append_column(
            "h", pa.array(h)
        )

    def gate_and_key(t: pa.Table) -> pa.Table:
        n = t.column("n_tok").to_numpy(zero_copy_only=False)
        ttr = t.column("ttr").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((n >= min_tok) & (n <= max_tok) & (ttr >= min_ttr)))
        h = t.column("h").to_numpy(zero_copy_only=False)
        return t.append_column("hp", pa.array(np.abs(h) % P_SHUF))

    def keep_min_per_hash(g: pa.Table) -> pa.Table:
        # all rows of a content hash land in one partition: survivors
        # are the rows whose doc_id is the min for their hash — one
        # vectorized sort/segment pass, full rows carried through
        h = g.column("h").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, h))
        first = np.zeros(len(h), dtype=bool)
        if len(h):
            first[order] = np.diff(h[order], prepend=h[order[0]] - 1) != 0
        return g.filter(pa.array(first))

    final = (
        ds.map_batches(features, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(gate_and_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hp")
        .map_groups(keep_min_per_hash, batch_format="pyarrow")
    )
    out = (
        final.groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tok", alias_name="total_tok"),
            Mean("ttr", alias_name="avg_ttr"),
        )
        .to_pandas()
    )
    out["avg_ttr"] = out["avg_ttr"].round(6)
    out["total_tok"] = out["total_tok"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def events_sliding(
    sf_dir: str, window_minutes: int = 60, slide_minutes: int = 15
) -> pd.DataFrame:
    """Sliding-window aggregate: {event_type, window_start, n_events,
    sum_value} for hop-aligned windows.

    An event at t belongs to every window with start in
    (t - window, t] aligned to the slide — emitted by a vectorized
    flat expansion (window/slide rows per event) inside map_batches,
    then a tumbling-style grouped aggregate. Completes the window
    family: tumbling (events_hourly) / sliding / session
    (events_sessionize).
    """
    from ray.data.aggregate import Count, Sum

    assert window_minutes % slide_minutes == 0
    k = window_minutes // slide_minutes
    slide = np.timedelta64(slide_minutes * 60, "s")

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        et = t.column("event_type").combine_chunks()
        # hop-aligned window starts covering each event
        base = ts.astype("datetime64[s]").astype(np.int64) // (slide_minutes * 60)
        n = len(ts)
        rep = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        offsets = np.tile(np.arange(k, dtype=np.int64), n)
        w_start = ((np.repeat(base, k) - offsets) * (slide_minutes * 60)).astype(
            "datetime64[s]"
        ).astype("datetime64[us]")
        return pa.table(
            {
                "event_type": et.take(rep),
                "window_start": pa.array(w_start),
                "value": pa.array(np.repeat(val, k)),
            }
        )

    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = (
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def events_asof(sf_dir: str) -> pd.DataFrame:
    """As-of join (self): each event annotated with the most recent
    PRIOR event's value for the same user → {event_id, user_id, ts,
    value, prev_value} (prev_value NaN for a user's first event).

    The custom-operator case Ray Data has no primitive for (SURVEY §2
    custom-operators note): implemented as ONE shuffle on
    ``user_id % P`` + a per-partition vectorized sort/segment/shift —
    the same fixed-partition pattern as sessionization. The general
    two-table as-of join is the identical kernel over the union of
    both inputs with a side tag. Exact: values are carried, never
    recomputed, so the LAG-window SQL oracle matches bit-for-bit.
    """
    import ray.data

    P_SHUF = 64

    def add_up(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("up", pa.array((uid % P_SHUF).astype(np.int32)))

    def per_partition(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        # deterministic order incl. equal timestamps: (user, ts, event_id)
        order = np.lexsort((eid, ts, uid))
        uid, ts, val, eid = uid[order], ts[order], val[order], eid[order]
        prev = np.empty(len(val))
        prev[0] = np.nan
        prev[1:] = np.where(uid[1:] == uid[:-1], val[:-1], np.nan)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "ts": pa.array(ts),
                "value": pa.array(val),
                "prev_value": pa.array(prev),
            }
        )

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = (
        ds.map_batches(add_up, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def events_rolling_mean(sf_dir: str, window: int = 5, round_dp: int = 6) -> pd.DataFrame:
    """Trailing-window aggregate: each event annotated with the mean of
    its user's last ``window`` values (ROWS window-1 PRECEDING..CURRENT,
    deterministic (ts, event_id) order) → {event_id, user_id, ts, value,
    roll_mean}.

    Same fixed-partition shape as :func:`events_asof`: one shuffle on
    ``user_id % P``, then a single vectorized pass per partition —
    cumulative sums with segment-boundary resets computed via a
    shifted-cumsum difference, no per-user Python loop. Partial windows
    at each user's start average over the rows seen so far, matching
    the SQL frame semantics.
    """
    import ray.data  # noqa: F401

    P_SHUF = 64
    W = int(window)

    def add_up(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("up", pa.array((uid % P_SHUF).astype(np.int32)))

    def per_partition(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        uid, ts, val, eid = uid[order], ts[order], val[order], eid[order]
        n = len(val)
        starts = np.flatnonzero(np.diff(uid, prepend=uid[0] - 1)) if n else np.array([], np.int64)
        lens = np.diff(np.concatenate([starts, [n]]))
        seg_start = np.repeat(starts, lens)  # segment start per row
        idx = np.arange(n)
        cs = np.concatenate(([0.0], np.cumsum(val)))
        # trailing frame [lo, i]: lo = max(seg_start, i - W + 1)
        lo = np.maximum(seg_start, idx - W + 1)
        s = cs[idx + 1] - cs[lo]
        cnt = idx - lo + 1
        roll = np.round(s / cnt, round_dp)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(uid),
                "ts": pa.array(ts),
                "value": pa.array(val),
                "roll_mean": pa.array(roll),
            }
        )

    ds = read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = (
        ds.map_batches(add_up, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


# ------------------------------------------------------ per-group top-k rank
def events_topk_per_user(sf_dir: str, topk: int = 3) -> pd.DataFrame:
    """Windowed ranking: each user's top-k events by (value desc,
    event_id asc) → {user_id, event_id, ts, value}.

    The ROW_NUMBER-over-partition analog, Ray-Data-first: ONE shuffle
    on ``user_id % P`` (fixed partitions — per-user groups would pay
    Ray's per-group overhead at millions of users), then each partition
    ranks ALL its users in one vectorized lexsort/segment pass.
    Values are carried, never recomputed → bit-exact vs the SQL
    window oracle.
    """
    P_SHUF = 64

    def add_up(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("up", pa.array((uid % P_SHUF).astype(np.int32)))

    def per_partition(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        val = g.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((eid, -val, uid))
        uid, eid, ts, val = uid[order], eid[order], ts[order], val[order]
        starts = np.flatnonzero(np.diff(uid, prepend=uid[0] - 1)) if len(uid) else np.array([], np.int64)
        lens = np.diff(np.concatenate([starts, [len(uid)]]))
        rank = np.arange(len(uid)) - np.repeat(starts, lens)
        keep = rank < topk
        return pa.table(
            {"user_id": pa.array(uid[keep]), "event_id": pa.array(eid[keep]),
             "ts": pa.array(ts[keep]), "value": pa.array(val[keep])}
        )

    ds = read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])
    out = (
        ds.map_batches(add_up, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    df = out.to_pandas()
    return df.sort_values(
        ["user_id", "value", "event_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


PRICE_BANDS = [(i, 800.0 + 50.0 * i, 920.0 + 50.0 * i) for i in range(10)]


def range_join_price_bands(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: parts matched to every OVERLAPPING price
    band → {p_partkey, band_id}.

    Bands overlap (width 120, stride 50), so this is a genuine
    non-equi join — not expressible as bucketing — of the kind Ray
    Data has no primitive for (SURVEY custom-operators note). Small
    interval side broadcast once; each batch does one vectorized
    (rows × bands) interval test and emits the matching pairs. For a
    large interval side the same kernel runs after interval
    partitioning (split bands into coarse buckets, shuffle both sides
    by bucket).
    """
    import ray

    bands = np.array(PRICE_BANDS, dtype=np.float64)
    bands_ref = ray.put(bands)

    def match(t: pa.Table) -> pa.Table:
        b = ray.get(bands_ref)
        price = t.column("p_retailprice").to_numpy(zero_copy_only=False)
        keys = t.column("p_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        hit = (price[:, None] >= b[None, :, 1]) & (price[:, None] < b[None, :, 2])
        rows, cols = np.nonzero(hit)
        return pa.table(
            {"p_partkey": pa.array(keys[rows]),
             "band_id": pa.array(b[cols, 0].astype(np.int64))}
        )

    ds = read(sf_dir, "part", columns=["p_partkey", "p_retailprice"])
    out = ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas().sort_values(["p_partkey", "band_id"]).reset_index(drop=True)


# ---------------------------------------------------- anomaly detection
def events_anomalies(sf_dir: str, nsigma: float = 3.0, round_dp: int = 6) -> pd.DataFrame:
    """Grouped z-score outliers: events whose value exceeds their
    type's ``mean + nsigma·std`` (population std) →
    {event_id, event_type, value, zscore}.

    Two streaming passes: one ``grouped_agg`` for per-type
    (n, Σv, Σv²) — event types are a bounded catalog, so the stats
    table is tiny and broadcasts in the filter closure — then a
    map-only filter pass computing the z-score per row. The monitor
    shape of every streaming-quality gate: fit statistics, broadcast,
    flag.
    """
    from .agg import grouped_agg

    ds = read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def widen(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {"event_type": t.column("event_type"),
             "v": pa.array(v),
             "v2": pa.array(v * v)}
        )

    stats = grouped_agg(
        ds.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        {"n": ("count", None), "sv": ("sum", "v"), "sv2": ("sum", "v2")},
    ).to_pandas()
    mean = stats["sv"].to_numpy() / stats["n"].to_numpy()
    m2 = stats["sv2"].to_numpy() / stats["n"].to_numpy()
    std = np.sqrt(m2 - mean * mean)
    mean_of = dict(zip(stats["event_type"], mean))
    std_of = dict(zip(stats["event_type"], std))

    def flag(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_pandas()
        mu = et.map(mean_of).to_numpy(np.float64)
        sd = et.map(std_of).to_numpy(np.float64)
        v = t.column("value").to_numpy(zero_copy_only=False)
        keep = v > mu + nsigma * sd
        z = np.round((v[keep] - mu[keep]) / sd[keep], round_dp)
        out = t.filter(pa.array(keep))
        return out.append_column("zscore", pa.array(z))

    df = ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if df.empty:
        df = pd.DataFrame(
            {"event_id": pd.array([], dtype="int64"),
             "event_type": pd.array([], dtype="object"),
             "value": pd.array([], dtype="float64"),
             "zscore": pd.array([], dtype="float64")}
        )
    return df.sort_values("event_id").reset_index(drop=True)


# ------------------------------------------------------- funnel analysis
def events_funnel(
    sf_dir: str, stages: tuple[str, ...] = ("view", "click", "purchase"),
    num_partitions: int = 64,
) -> pd.DataFrame:
    """Sequential conversion funnel: {stage_idx, stage, n_users} where a
    user completes stage i when an event of type ``stages[i]`` occurs
    STRICTLY AFTER their first completion of stage i−1 (stage 0 = the
    user's first event of that type at any time).

    Scale shape: one shuffle on ``user_id % P`` (all of a user's events
    co-locate, P fixed), then one vectorized kernel per partition —
    sort by (user, ts), per-user first-completion times via
    masked ``minimum.reduceat`` chained across stages; each partition
    emits per-stage partial user counts, the driver sums P × stages
    tiny rows. The sequential-pattern analog of the sessionization
    operator, same partitioning contract.
    """
    ds = read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    P = int(num_partitions)
    stage_list = list(stages)

    def add_up(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return t.append_column("up", pa.array((u % P).astype(np.int32)))

    def funnel_partition(g: pa.Table) -> pa.Table:
        u = g.column("user_id").to_numpy(zero_copy_only=False)
        ts = g.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        et = np.asarray(g.column("event_type").to_pandas())
        order = np.lexsort((ts, u))
        u, ts, et = u[order], ts[order], et[order]
        starts = np.flatnonzero(np.diff(u, prepend=u[0] - 1)) if len(u) else np.empty(0, np.int64)
        seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(u))))
        INF = np.iinfo(np.int64).max
        # int64 min as -inf so pre-1970 (negative-epoch) events still
        # clear stage 0's ts > prev_first gate
        prev_first = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
        counts = []
        for s in stage_list:
            ok = (et == s) & (ts > prev_first[seg])
            masked = np.where(ok, ts, INF)
            first = np.minimum.reduceat(masked, starts) if len(u) else np.empty(0, np.int64)
            done = first < INF
            counts.append(int(done.sum()))
            prev_first = np.where(done, first, INF)  # non-completers can't advance
        return pa.table(
            {"stage_idx": pa.array(np.arange(len(stage_list), dtype=np.int64)),
             "n": pa.array(np.array(counts, dtype=np.int64))}
        )

    pdf = (
        ds.map_batches(add_up, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(funnel_partition, batch_format="pyarrow")
        .to_pandas()
    )
    agg = pdf.groupby("stage_idx")["n"].sum().reset_index()
    agg["stage"] = [stage_list[i] for i in agg["stage_idx"]]
    return (
        agg[["stage_idx", "stage", "n"]]
        .rename(columns={"n": "n_users"})
        .sort_values("stage_idx")
        .reset_index(drop=True)
    )


# ------------------------------------------------------------ TPC-H Q6 / Q3
def tpch_q6(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
) -> pd.DataFrame:
    """Forecast-revenue-change (TPC-H Q6 shape): filter + global sum.

    All arithmetic in scaled int64 (cents x discount-percent = 1e-4
    units), so the sum is exact and partition-order-independent — the
    same money-column discipline as tpch_q1.
    """
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
        )
        t = t.filter(m)
        disc_c = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (disc_c >= 5) & (disc_c <= 7) & (qty < 24)
        price_c = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[keep] * 100.0
        ).astype(np.int64)
        rev_u4 = price_c * disc_c[keep]
        return pa.table({"rev_u4": pa.array([int(rev_u4.sum())], pa.int64())})

    total = (
        read(sf_dir, "lineitem",
             columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sum("rev_u4")
    )
    return pd.DataFrame({"revenue": [round(total / 10000.0, 2)]})


def tpch_q3(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-07-01",
    topk: int = 10,
) -> pd.DataFrame:
    """Shipping-priority report (TPC-H Q3 shape): 3-table join →
    grouped revenue → top-k.

    Plan: the BUILDING customer keys prune orders through the
    shuffle semi-join's Bloom prefilter (keys-only right side, left
    rows drop BEFORE the shuffle); filtered lineitem then inner-joins
    the surviving orders on o_orderkey; revenue sums in exact 1e-4
    int64 units inside fixed partitions. No driver materialization of
    any base table — only the k winners.
    """
    from .agg import grouped_agg
    from .join import hash_join

    cut = pa.scalar(np.datetime64(cutoff, "us"))

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], segment)).select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = read(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cut)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders_b = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        how="semi", bloom_prefilter=True, broadcast="auto",
    )

    def li_derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_u4": price_c * (100 - disc_c)}
        )

    li = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)

    j = hash_join(
        li,
        orders_b.select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        on="l_orderkey", right_on="o_orderkey", how="inner", broadcast="auto",
    )
    sums = grouped_agg(
        j, ["l_orderkey", "o_orderdate", "o_orderpriority"],
        {"rev_u4": ("sum", "rev_u4")}, num_partitions=32,
    )

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["rev_u4", "l_orderkey"], ascending=[False, True]
        )
        return pa.Table.from_pandas(df.head(topk), preserve_index=False)

    cands = pd.DataFrame(
        sums.map_batches(local_topk, batch_format="pyarrow").take_all()
    )
    if cands.empty:
        return pd.DataFrame(
            columns=["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]
        )
    cands = cands.sort_values(
        ["rev_u4", "l_orderkey"], ascending=[False, True]
    ).head(topk)
    cands["revenue"] = (cands["rev_u4"] / 10000.0).round(2)
    return cands[
        ["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]
    ].reset_index(drop=True)


# ------------------------------------------------------- cohort retention
def events_retention(sf_dir: str, *, max_offset: int = 7) -> pd.DataFrame:
    """Cohort retention: users grouped by first-seen day; for each
    (cohort_day, day_offset <= max_offset) the count of distinct
    cohort users active that day.

    Shape: one user-keyed fixed-P fold computes each user's first day
    AND its distinct active days in the same pass (events for a user
    are co-located by the shuffle), emitting (cohort_day, offset,
    users_partial) — a second small grouped sum finishes. The events
    table never moves twice.
    """
    from .agg import grouped_agg

    P = 64
    ds = read(sf_dir, "events", columns=["user_id", "ts"])

    def add_up(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        day = pc.cast(t["ts"], pa.timestamp("us"))
        day_i = (
            day.to_numpy(zero_copy_only=False).astype("datetime64[D]").astype(np.int64)
        )
        return pa.table(
            {"up": pa.array((u % P).astype(np.int32)),
             "user_id": t.column("user_id"),
             "day": pa.array(day_i, pa.int64())}
        )

    def fold(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"user_id": g.column("user_id").to_numpy(zero_copy_only=False),
             "day": g.column("day").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        first = df.groupby("user_id", sort=False)["day"].min().rename("cohort")
        df = df.join(first, on="user_id")
        df["offset"] = df["day"] - df["cohort"]
        df = df[df["offset"] <= max_offset]
        out = (
            df.groupby(["cohort", "offset"], sort=False)["user_id"]
            .nunique()
            .reset_index(name="n_users")
        )
        return pa.table(
            {"cohort_day": pa.array(out["cohort"].to_numpy(dtype=np.int64)),
             "day_offset": pa.array(out["offset"].to_numpy(dtype=np.int64)),
             "n_users": pa.array(out["n_users"].to_numpy(dtype=np.int64))}
        )

    partials = (
        ds.map_batches(add_up, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("up")
        .map_groups(fold, batch_format="pyarrow")
    )
    sums = grouped_agg(
        partials, ["cohort_day", "day_offset"],
        {"n_users": ("sum", "n_users")}, num_partitions=16,
    )
    df = sums.to_pandas()
    # int day ordinal -> ISO date string (stable cross-engine type)
    df["cohort_day"] = (
        df["cohort_day"].to_numpy(dtype="int64").astype("datetime64[D]").astype(str)
    )
    return (
        df[["cohort_day", "day_offset", "n_users"]]
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------- grouping sets
def events_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUPING SETS rollup over events: (event_type, day) → (event_type)
    → grand total; {event_type, day, n_events, sum_value} with 'ALL'
    marking rolled-up levels.

    Value sums are exact int64 micros (1e-6 units) so every level is
    partition-order-independent; upper levels fold from the base level
    (O(groups) driver work, the events table is read once).
    """
    from .agg import grouped_agg

    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def derive(t: pa.Table) -> pa.Table:
        day = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .astype(str)
        )
        v = t["value"].to_numpy(zero_copy_only=False) * 1_000_000.0
        # half-away-from-zero, matching SQL ROUND (np.rint is half-even)
        vmic = np.trunc(v + np.copysign(0.5, v)).astype(np.int64)
        return pa.table(
            {"event_type": t["event_type"], "day": pa.array(day, pa.string()),
             "vmic": pa.array(vmic)}
        )

    base = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["event_type", "day"],
        {"n_events": ("count", None), "vmic": ("sum", "vmic")},
        num_partitions=16,
    ).to_pandas()

    lvl1 = (
        base.groupby("event_type", as_index=False)[["n_events", "vmic"]]
        .sum()
        .assign(day="ALL")
    )
    lvl2 = pd.DataFrame(
        [{"event_type": "ALL", "day": "ALL",
          "n_events": base["n_events"].sum(), "vmic": base["vmic"].sum()}]
    )
    out = pd.concat([base, lvl1, lvl2], ignore_index=True)
    # exact int -> ONE deterministic double division (tpch_q1 idiom);
    # no rounding needed, the micros sum IS the 6-dp decimal
    out["sum_value"] = out.pop("vmic") / 1_000_000.0
    out["n_events"] = out["n_events"].astype(np.int64)
    return (
        out[["event_type", "day", "n_events", "sum_value"]]
        .sort_values(["event_type", "day"])
        .reset_index(drop=True)
    )


# ------------------------------------------------------------ TPC-H Q5 shape
def tpch_q5(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> pd.DataFrame:
    """Local-supplier-volume (TPC-H Q5 shape): 6-table join chain →
    grouped revenue by nation.

    Plan: nation⋈region are FIXED-cardinality dimensions (25/5 rows at
    any SF) — resolved on the driver into a nationkey→name map that
    rides into map_batches closures. customer, orders, lineitem and
    supplier are all SF-proportional, so every fact-side join is a
    shuffle ``hash_join`` (no broadcast of a table that grows with
    scale): orders(date-filtered)⋈customer on custkey, lineitem⋈that
    on orderkey, then ⋈supplier on suppkey; the c_nationkey ==
    s_nationkey equality is a post-join vectorized filter. Revenue in
    exact 1e-4 int64 units (tpch_q1 idiom).
    """
    from .agg import grouped_agg
    from .join import hash_join

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    nat = read(sf_dir, "nation").to_pandas()
    reg = read(sf_dir, "region").to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(rkeys)]
    nkeys = set(int(k) for k in nat["n_nationkey"])
    nname = {int(k): str(v) for k, v in zip(nat["n_nationkey"], nat["n_name"])}

    def in_region(col: str):
        ks = nkeys

        def fn(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(v, np.fromiter(ks, np.int64))))

        return fn

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        in_region("c_nationkey"), batch_format="pyarrow", zero_copy_batch=True
    )
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ord_c = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", how="inner", broadcast="auto")

    def li_derive(t: pa.Table) -> pa.Table:
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"],
             "rev_u4": price_c * (100 - disc_c)}
        )

    li = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    # Bloom prefilter: only ~6% of lineitem rows survive the
    # date+region-filtered orders side, so pruning them BEFORE the
    # shuffle drops its volume ~16x (A/B at sf0.1: wall-neutral there,
    # 3.97 vs 4.02 s, because the fixture shuffle is latency-bound —
    # at real scale the shuffle is bytes-bound and the prune wins).
    # Prefiltering the supplier join too was SLOWER (5.3 s / 11.3 s
    # both): its selectivity (1/5) doesn't repay a second filter build.
    li_o = hash_join(
        li, ord_c.select_columns(["o_orderkey", "c_nationkey"]),
        on="l_orderkey", right_on="o_orderkey", how="inner",
        bloom_prefilter=True,
    )

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        in_region("s_nationkey"), batch_format="pyarrow", zero_copy_batch=True
    )
    li_s = hash_join(li_o, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")

    names = sorted(nname)
    lut_keys = np.fromiter(names, np.int64)
    lut_vals = [nname[k] for k in names]

    def local_filter(t: pa.Table) -> pa.Table:
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(cn == sn))
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(lut_keys, cn)
        name = pa.array([lut_vals[i] for i in idx], pa.string())
        return pa.table({"n_name": name, "rev_u4": t["rev_u4"]})

    sums = grouped_agg(
        li_s.map_batches(local_filter, batch_format="pyarrow", zero_copy_batch=True),
        "n_name", {"rev_u4": ("sum", "rev_u4")}, num_partitions=8,
    ).to_pandas()
    sums["revenue"] = sums.pop("rev_u4") / 10000.0
    return (
        sums.sort_values(["revenue", "n_name"], ascending=[False, True])
        [["n_name", "revenue"]].reset_index(drop=True)
    )


# ----------------------------------------------------------- TPC-H Q10 shape
def tpch_q10(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
    topk: int = 20,
) -> pd.DataFrame:
    """Returned-item revenue report (TPC-H Q10 shape): who returned the
    most merchandise in a window.

    Plan: lineitem filters to l_returnflag='R' and Bloom-prefilter
    shuffle-joins the date-window orders directly (the window keeps
    ~7% of orders, so ~93% of R-lineitem rows drop BEFORE the shuffle
    — strictly less exchange volume than the earlier per-order
    pre-aggregate, which shuffled a partial for EVERY R order
    including the 93% outside the window, and one fewer all-to-all);
    ONE grouped_agg folds join output straight to per-customer
    revenue (small); customer decorates via shuffle join; the fixed
    25-row nation table decorates on the driver. Top-k via per-block
    local top-k then driver final — never a full sort. A/B at sf0.1:
    3.6-3.8 s vs 4.1-5.0 s for the pre-aggregate plan, equal results.
    """
    from .agg import grouped_agg
    from .join import hash_join

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def li_derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "rev_u4": price_c * (100 - disc_c)})

    li = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        how="inner", bloom_prefilter=True,
    )
    per_cust = grouped_agg(j, "o_custkey", {"rev_u4": ("sum", "rev_u4")}, num_partitions=32)

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    dec = hash_join(per_cust, cust, on="o_custkey", right_on="c_custkey", how="inner", broadcast="auto")

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["rev_u4", "o_custkey"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(topk), preserve_index=False)

    cands = pd.DataFrame(dec.map_batches(local_topk, batch_format="pyarrow").take_all())
    if cands.empty:
        return pd.DataFrame(
            columns=["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]
        )
    cands = cands.sort_values(["rev_u4", "o_custkey"], ascending=[False, True]).head(topk)

    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"].astype(str)))
    out = pd.DataFrame(
        {
            "c_custkey": cands["o_custkey"].astype(np.int64),
            "c_name": cands["c_name"],
            "revenue": cands["rev_u4"] / 10000.0,
            "c_acctbal": cands["c_acctbal"],
            "n_name": cands["c_nationkey"].astype(int).map(nmap),
        }
    )
    return out.reset_index(drop=True)


# ----------------------------------------------------------- TPC-H Q14 shape
def tpch_q14(
    sf_dir: str,
    date_lo: str = "1997-03-01",
    date_hi: str = "1997-04-01",
    promo_prefix: str = "PROMO",
) -> pd.DataFrame:
    """Promotion-effect (TPC-H Q14 shape): promo revenue share in a month.

    Plan: the month's lineitem revenue rows (partkey, rev_u4)
    shuffle-join part on partkey (part is SF-proportional — no
    broadcast); each output batch folds to TWO exact int64 partials
    (promo revenue, total revenue); one global sum; one double division
    at the end. Result is a single row, order-free and exact.
    """
    from .join import hash_join

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def li_derive(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        disc_c = np.rint(t["l_discount"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_partkey": t["l_partkey"], "rev_u4": price_c * (100 - disc_c)})

    li = read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    part = read(sf_dir, "part", columns=["p_partkey", "p_type"])
    j = hash_join(li, part, on="l_partkey", right_on="p_partkey", how="inner")

    def partials(t: pa.Table) -> pa.Table:
        rev = t["rev_u4"].to_numpy(zero_copy_only=False)
        promo = pc.starts_with(t["p_type"], promo_prefix).to_numpy(zero_copy_only=False)
        return pa.table(
            {"promo_u4": pa.array([int(rev[promo].sum())], pa.int64()),
             "total_u4": pa.array([int(rev.sum())], pa.int64())}
        )

    agg = j.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Sum

    res = agg.aggregate(Sum("promo_u4", alias_name="p"), Sum("total_u4", alias_name="t"))
    p, tot = int(res["p"] or 0), int(res["t"] or 0)
    pct = round(100.0 * p / tot, 6) if tot else 0.0
    return pd.DataFrame({"promo_pct": [pct]})


# ----------------------------------------------------------- TPC-H Q18 shape
def tpch_q18(
    sf_dir: str,
    qty_threshold: float = 300.0,
    topk: int = 100,
) -> pd.DataFrame:
    """Large-volume-customer (TPC-H Q18 shape): HAVING on a grouped sum
    feeding a join chain.

    Plan: per-order quantity sums via grouped_agg (map-side combined,
    fixed-P); the HAVING filter drops all but the rare giant orders
    BEFORE any join, so the orders/customer joins see only survivor
    keys; both joins shuffle (SF-proportional sides). Quantities carry
    2 decimals → exact cent-int sums.
    """
    from .agg import grouped_agg
    from .join import hash_join

    def qty(t: pa.Table) -> pa.Table:
        q = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "qty_c": q})

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"]).map_batches(
        qty, batch_format="pyarrow", zero_copy_batch=True
    )
    per_order = grouped_agg(li, "l_orderkey", {"qty_c": ("sum", "qty_c")}, num_partitions=32)
    thr = int(round(qty_threshold * 100))
    big = per_order.map_batches(
        lambda t: t.filter(pc.greater(t["qty_c"], thr)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = hash_join(big, orders, on="l_orderkey", right_on="o_orderkey", how="inner", broadcast="auto")
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    dec = hash_join(j, cust, on="o_custkey", right_on="c_custkey", how="inner", broadcast="auto")

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["o_totalprice", "l_orderkey"], ascending=[False, True]
        )
        return pa.Table.from_pandas(df.head(topk), preserve_index=False)

    cands = pd.DataFrame(dec.map_batches(local_topk, batch_format="pyarrow").take_all())
    if cands.empty:
        return pd.DataFrame(
            columns=["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                     "o_totalprice", "sum_qty"]
        )
    cands = cands.sort_values(
        ["o_totalprice", "l_orderkey"], ascending=[False, True]
    ).head(topk)
    out = pd.DataFrame(
        {
            "c_name": cands["c_name"],
            "c_custkey": cands["o_custkey"].astype(np.int64),
            "o_orderkey": cands["l_orderkey"].astype(np.int64),
            "o_orderdate": cands["o_orderdate"],
            "o_totalprice": cands["o_totalprice"],
            "sum_qty": cands["qty_c"] / 100.0,
        }
    )
    return out.reset_index(drop=True)


# ------------------------------------------- TPC-H Q4 shape (late shipments)
def tpch_q4_late(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-07-01",
    late_days: int = 60,
) -> pd.DataFrame:
    """Order-priority check (TPC-H Q4 shape, adapted): count orders per
    priority that had at least one lineitem shipped ``late_days`` or
    more after the order date.

    The fixture has no l_commitdate/l_receiptdate, so the EXISTS
    predicate is adapted to shipping lateness (l_shipdate >=
    o_orderdate + late_days). Plan: window-filtered orders shuffle-join
    lineitem ship dates on orderkey; the cross-side comparison is a
    vectorized post-join filter; EXISTS = grouped_agg on (orderkey,
    priority) then a tiny count-by-priority.
    """
    from .agg import grouped_agg
    from .join import hash_join

    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    orders = read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey", how="inner")
    lag = np.timedelta64(int(late_days), "D").astype("timedelta64[us]").astype(np.int64)

    def late(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        odate = t["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ship >= odate + lag))
        return t.select(["l_orderkey", "o_orderpriority"])

    distinct = grouped_agg(
        j.map_batches(late, batch_format="pyarrow", zero_copy_batch=True),
        ["l_orderkey", "o_orderpriority"], {"n": ("count", None)}, num_partitions=32,
    )
    per_prio = grouped_agg(
        distinct, "o_orderpriority", {"order_count": ("count", None)}, num_partitions=4
    ).to_pandas()
    per_prio["order_count"] = per_prio["order_count"].astype(np.int64)
    return per_prio.sort_values("o_orderpriority").reset_index(drop=True)
