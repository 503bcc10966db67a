"""Distributed interval (point-in-range) join — the general non-equi
join ``range_join_price_bands`` hand-rolls for one fixed band list.

Each POINT row (left, value column ``on``) joins EVERY interval row
(right, ``start``/``end`` columns) whose range contains it —
``closed`` picks the boundary convention — optionally under an extra
``by`` equality key. A point inside k overlapping intervals emits k
rows (``how="inner"``); ``how="left"`` also keeps pointless points
with null right columns.

Reference analog: the reference routes each k-mer to the partition
OWNING its key range of the hash space (``src/SkmerExtractor.cpp:164``,
``hmin % q``) — the grid join below is that ownership idea applied to
a continuous axis: intervals replicate to every fixed-width bucket
they overlap, points route to exactly ONE bucket, so every candidate
pair meets in the point's bucket and nowhere else (no dedup pass).

Scale shape (shuffle plan): ONE fixed-P exchange. Points move once;
intervals move ``ceil(len/w)+1`` times (their bucket span — bounded by
``max_replication``, raise the width or broadcast when a monster
interval trips it). Per partition the kernel walks its buckets in one
argsort order and verifies each bucket with a vectorized
``points × intervals`` containment matrix whose size the bucket width
controls — never all-pairs across the partition, never per-row Python.
The ``broadcast`` plan (small interval side — band lists, calendars,
config epochs) ships the bucket-indexed interval table once via
``ray.put`` and runs the same kernel map-only over the point stream.

SQL semantics: a null in ``on``, ``start``, ``end`` or any ``by``
component never matches (left rows kept unmatched under
``how="left"``); inverted intervals (end before start) match nothing.

Axis values are compared in float64, so they must be exactly
representable there (|v| < 2^53) — true for microsecond epochs
through year 2255 and any real-world measure; a raw int64 surrogate
key is NOT an interval axis.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import splitmix64
from .join import (
    AUTO_BROADCAST_BYTES,
    _encode_composite,
    _key_partition,
    _types_of,
    choose_broadcast,
)

if TYPE_CHECKING:
    from ray.data import Dataset

_CLOSED = ("left", "right", "both", "neither")

#: per-interval bucket-replication honesty guard: a single interval
#: spanning more buckets than this raises instead of silently flooding
#: the shuffle (pick a wider bucket_width, or broadcast)
MAX_REPLICATION = 1024


def _axis_values(col: pa.ChunkedArray, name: str) -> tuple[np.ndarray, np.ndarray]:
    """(float64-or-int64 axis values, valid mask). Timestamps read as
    int64 epoch ticks in the column's own unit; nulls -> invalid."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = ~np.asarray(col.is_null()) if col.null_count else np.ones(len(col), bool)
    t = col.type
    if pa.types.is_timestamp(t):
        v = col.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
    elif pa.types.is_integer(t):
        v = col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    elif pa.types.is_floating(t):
        v = col.fill_null(np.nan).to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        valid = valid & ~np.isnan(v)
    else:
        raise TypeError(f"interval_join: column {name!r} must be numeric or "
                        f"timestamp, got {t}")
    return v, valid


def _bucket_of(v: np.ndarray, w: float) -> np.ndarray:
    return np.floor(v / w).astype(np.int64)


def _route(bk: np.ndarray, t: pa.Table, by: list[str], P: int) -> np.ndarray:
    """Partition of (bucket, by...) — identical kernel on both sides."""
    if not by:
        return (splitmix64(bk.astype(np.uint64)) % np.uint64(P)).astype(np.int32)
    enc = _encode_composite(
        t.append_column("__bk_s", pa.array(bk)), by + ["__bk_s"]
    )
    return _key_partition(enc, P)


def _derive_width(lens: np.ndarray) -> float:
    """Default bucket width from interval lengths: the median length
    (a point then meets O(1) replicated copies per bucket)."""
    lens = lens[np.isfinite(lens) & (lens > 0)]
    if not len(lens):
        return 1.0
    return float(np.median(lens))


def interval_join(
    points: "Dataset",
    intervals: "Dataset",
    on: str,
    start: str,
    end: str,
    *,
    by: "str | list[str] | None" = None,
    right_by: "str | list[str] | None" = None,
    how: str = "inner",
    closed: str = "left",
    bucket_width: "float | int | None" = None,
    suffix: str = "_r",
    num_partitions: int = 64,
    broadcast: "bool | str" = "auto",
    broadcast_threshold: int = AUTO_BROADCAST_BYTES,
    max_replication: int = MAX_REPLICATION,
) -> "Dataset":
    """Interval join; returns a lazy streaming Dataset.

    Output columns: point columns, then interval columns except the
    right ``by`` keys (``suffix``-renamed on collision) — ``start``/
    ``end`` ride along so the matched range is visible.

    ``bucket_width`` is the grid knob (in the axis' own unit — epoch
    ticks for timestamps). Default: the median interval length, from
    the materialized table (broadcast plan) or a 10k-interval sample
    (shuffle plan).

    ``broadcast="auto"`` materializes the interval side once and picks
    the map-only plan when it fits ``broadcast_threshold`` bytes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if closed not in _CLOSED:
        raise ValueError(f"closed must be one of {_CLOSED}, got {closed!r}")
    by_l: list[str] = [by] if isinstance(by, str) else (list(by) if by else [])
    by_r: list[str] = (
        [right_by] if isinstance(right_by, str)
        else (list(right_by) if right_by else list(by_l))
    )
    if len(by_r) != len(by_l):
        raise ValueError(f"right_by length {len(by_r)} != by length {len(by_l)}")

    l_schema, r_schema = points.schema(), intervals.schema()
    if l_schema is None or not l_schema.names:
        return points
    if r_schema is None or not r_schema.names:
        raise ValueError(
            "interval_join: interval side has no schema (empty dataset) — "
            "output columns are underdetermined"
        )
    l_types, r_types = _types_of(l_schema), _types_of(r_schema)
    l_cols, r_cols = list(l_schema.names), list(r_schema.names)
    for c in (on, *by_l):
        if c not in l_types:
            raise ValueError(f"interval_join: point side has no column {c!r}")
    for c in (start, end, *by_r):
        if c not in r_types:
            raise ValueError(f"interval_join: interval side has no column {c!r}")

    r_payload = [c for c in r_cols if c not in by_r]
    l_set = set(l_cols)
    rename_r = {c: (c + suffix if c in l_set else c) for c in r_payload}
    out_fields = [(c, l_types[c]) for c in l_cols] + [
        (rename_r[c], r_types[c]) for c in r_payload
    ]
    seen: set[str] = set()
    for name, _ in out_fields:
        if name in seen:
            raise ValueError(f"interval_join: duplicate output column {name!r}")
        seen.add(name)
    out_schema = pa.schema(out_fields)

    lo_ok = np.greater_equal if closed in ("left", "both") else np.greater
    hi_ok = np.less_equal if closed in ("right", "both") else np.less

    def _verify(pv: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
        """Containment matrix pv[:,None] in [s,e][None,:]."""
        return lo_ok(pv[:, None], s[None, :]) & hi_ok(pv[:, None], e[None, :])

    def _bucket_kernel(
        p_tab: pa.Table, p_val, p_bk, i_tab: pa.Table, i_s, i_e, i_bk
    ) -> pa.Table:
        """Join co-located rows: per shared bucket, verify containment
        (+ by equality when by survives in-partition collisions).
        p_bk is each point's OWN bucket; i_bk each interval COPY's
        bucket — pairs only form where they agree, so replicated
        copies can never emit a duplicate pair."""
        po = np.argsort(p_bk, kind="stable")
        io = np.argsort(i_bk, kind="stable")
        p_sorted, i_sorted = p_bk[po], i_bk[io]
        shared = np.intersect1d(np.unique(p_sorted), np.unique(i_sorted))
        rows_p: list[np.ndarray] = []
        rows_i: list[np.ndarray] = []
        if len(by_l):
            bcodes_p, bcodes_i = _by_codes(p_tab, i_tab)
        for b in shared:
            ps = np.searchsorted(p_sorted, b, "left")
            pe = np.searchsorted(p_sorted, b, "right")
            is_ = np.searchsorted(i_sorted, b, "left")
            ie = np.searchsorted(i_sorted, b, "right")
            pi, ii = po[ps:pe], io[is_:ie]
            hit = _verify(p_val[pi], i_s[ii], i_e[ii])
            if len(by_l):
                hit &= bcodes_p[pi][:, None] == bcodes_i[ii][None, :]
            r, c = np.nonzero(hit)
            if len(r):
                rows_p.append(pi[r])
                rows_i.append(ii[c])
        if rows_p:
            take_p = np.concatenate(rows_p)
            take_i = np.concatenate(rows_i)
        else:
            take_p = take_i = np.array([], dtype=np.int64)
        matched = p_tab.take(pa.array(take_p))
        ivals = i_tab.select(r_payload).rename_columns(
            [rename_r[c] for c in r_payload]
        ).take(pa.array(take_i))
        out = pa.Table.from_arrays(
            list(matched.columns) + list(ivals.columns),
            schema=out_schema,
        )
        if how == "left":
            unmatched = np.ones(p_tab.num_rows, bool)
            unmatched[take_p] = False
            idx = np.flatnonzero(unmatched)
            if len(idx):
                um = p_tab.take(pa.array(idx))
                um_tab = pa.Table.from_arrays(
                    list(um.columns)
                    + [pa.nulls(len(idx), r_types[c]) for c in r_payload],
                    schema=out_schema,
                )
                out = pa.concat_tables([out, um_tab])
        return out

    def _by_codes(p_tab: pa.Table, i_tab: pa.Table):
        """Consistent integer codes for the by tuple across both
        tables (exact equality, not hashes)."""
        pe = _encode_composite(p_tab, by_l) if len(by_l) > 1 else (
            p_tab.column(by_l[0]).cast(pa.string()).combine_chunks()
        )
        ie = _encode_composite(i_tab, by_r) if len(by_r) > 1 else (
            i_tab.column(by_r[0]).cast(pa.string()).combine_chunks()
        )
        allv = pd.concat(
            [pd.Series(pe.to_pandas()), pd.Series(ie.to_pandas())],
            ignore_index=True,
        )
        codes, _ = pd.factorize(allv, use_na_sentinel=True)
        return codes[: len(pe)], codes[len(pe):]

    def _point_filter(t: pa.Table):
        v, valid = _axis_values(t.column(on), on)
        for b in by_l:
            bc = t.column(b)
            if bc.null_count:
                valid = valid & ~np.asarray(bc.combine_chunks().is_null())
        return v, valid

    def _interval_arrays(t: pa.Table):
        s, sv = _axis_values(t.column(start), start)
        e, ev = _axis_values(t.column(end), end)
        # inverted ranges (e < s) are kept: the containment test
        # matches nothing for them, exactly like the SQL predicate
        valid = sv & ev
        for b in by_r:
            bc = t.column(b)
            if bc.null_count:
                valid = valid & ~np.asarray(bc.combine_chunks().is_null())
        return s, e, valid

    # ---- plan + bucket width ------------------------------------------
    import ray
    import ray.data

    rtab_full: pa.Table | None = None
    if broadcast is True or broadcast == "auto":
        rtab_full = pa.concat_tables(
            ray.get(intervals.to_arrow_refs()), promote_options="permissive"
        ).select(r_cols)
        if broadcast == "auto":
            broadcast = choose_broadcast(rtab_full.nbytes, broadcast_threshold)
        if not broadcast:
            # already materialized: don't re-execute the interval
            # pipeline when the shuffle plan consumes it
            intervals = ray.data.from_arrow(rtab_full)
    elif broadcast is not False:
        raise ValueError(f"broadcast must be a bool or 'auto', got {broadcast!r}")
    if bucket_width is None:
        if rtab_full is not None:
            s, e, v = _interval_arrays(rtab_full)
        else:
            sample = pa.concat_tables(
                ray.get(intervals.limit(10_000).to_arrow_refs()),
                promote_options="permissive",
            )
            s, e, v = _interval_arrays(sample)
        w = _derive_width((e - s)[v].astype(np.float64))
    else:
        w = float(bucket_width)
        if not (w > 0):
            raise ValueError(f"bucket_width must be > 0, got {bucket_width}")

    def _expand_intervals(t: pa.Table) -> tuple[pa.Table, np.ndarray, np.ndarray, np.ndarray]:
        """Valid intervals replicated once per overlapped bucket ->
        (table rows, start, end, copy bucket)."""
        s, e, valid = _interval_arrays(t)
        idx = np.flatnonzero(valid)
        s, e = s[idx], e[idx]
        b0, b1 = _bucket_of(s, w), _bucket_of(e, w)
        reps = (b1 - b0 + 1).astype(np.int64)
        if len(reps) and reps.max() > max_replication:
            k = int(reps.max())
            raise ValueError(
                f"interval_join: an interval spans {k} buckets of width {w} "
                f"(> max_replication={max_replication}) — raise bucket_width "
                "or broadcast the interval side"
            )
        take = np.repeat(idx, reps)
        off = np.arange(len(take), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        bk = np.repeat(b0, reps) + off
        return t.take(pa.array(take)), np.repeat(s, reps), np.repeat(e, reps), bk

    if broadcast is True:
        return _interval_broadcast(
            points, rtab_full, _expand_intervals, _point_filter, _bucket_kernel,
            out_schema, r_types, r_payload, how, w,
        )
    return _interval_shuffle(
        points, intervals, on, by_l, by_r, l_cols, r_cols, l_types, r_types,
        _expand_intervals, _point_filter, _bucket_kernel, out_schema,
        r_payload, how, w, int(num_partitions), _route,
    )


def _interval_broadcast(
    points, rtab, _expand, _point_filter, _bucket_kernel,
    out_schema, r_types, r_payload, how, w,
):
    import ray

    i_tab, i_s, i_e, i_bk = _expand(rtab)
    order = np.argsort(i_bk, kind="stable")
    pack = (i_tab.take(pa.array(order)), i_s[order], i_e[order], i_bk[order])
    rref = ray.put(pack)

    def fn(t: pa.Table) -> pa.Table:
        it, s, e, bk = ray.get(rref)
        v, valid = _point_filter(t)
        pidx = np.flatnonzero(valid)
        p_tab = t.take(pa.array(pidx))
        out = _bucket_kernel(p_tab, v[pidx], _bucket_of(v[pidx], w), it, s, e, bk)
        if how == "left":
            inv = np.flatnonzero(~valid)
            if len(inv):
                um = t.take(pa.array(inv))
                out = pa.concat_tables([
                    out,
                    pa.Table.from_arrays(
                        list(um.columns)
                        + [pa.nulls(len(inv), r_types[c]) for c in r_payload],
                        schema=out_schema,
                    ),
                ])
        return out

    return points.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _interval_shuffle(
    points, intervals, on, by_l, by_r, l_cols, r_cols, l_types, r_types,
    _expand, _point_filter, _bucket_kernel, out_schema, r_payload, how, w, P,
    _route_fn,
):
    import ray.data as _rd

    carrier = (
        [("__jp", pa.int32()), ("__side", pa.int8()), ("__bk", pa.int64()),
         ("__ax0", pa.float64()), ("__ax1", pa.float64())]
        + [(n, l_types[n]) for n in l_cols]
        + [(f"__r_{n}", r_types[n]) for n in r_cols]
    )
    meta_n = 5

    def _carry(side, n, jp, bk, ax0, ax1, t, present_cols):
        arrays = [pa.array(jp), pa.array(np.full(n, side, dtype=np.int8)),
                  pa.array(bk), pa.array(ax0), pa.array(ax1)]
        for cname, ctype in carrier[meta_n:]:
            own = cname[4:] if cname.startswith("__r_") else cname
            if (side == 1) == cname.startswith("__r_") and own in present_cols:
                col = t.column(own).combine_chunks()
                if col.type != ctype:
                    col = col.cast(ctype)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(n, ctype))
        return pa.Table.from_arrays(arrays, names=[n_ for n_, _ in carrier])

    def pack_points(t: pa.Table) -> pa.Table:
        v, valid = _point_filter(t)
        # invalid points still travel for how="left" (route anywhere
        # deterministic: bucket 0); the kernel skips them in matching
        vv = np.where(valid, v, 0.0).astype(np.float64)
        bk = np.where(valid, _bucket_of(np.where(valid, v, 0), w), np.int64(-1))
        jp = _route_fn(bk, t, by_l, P)
        return _carry(0, t.num_rows, jp, bk, vv, vv, t, set(t.column_names))

    def pack_intervals(t: pa.Table) -> pa.Table:
        it, s, e, bk = _expand(t)
        jp = _route_fn(bk, it, by_r, P)
        return _carry(
            1, it.num_rows, jp, bk,
            s.astype(np.float64), e.astype(np.float64), it, set(it.column_names),
        )

    sentinels = _rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(np.arange(P, dtype=np.int32)),
             pa.array(np.full(P, -1, dtype=np.int8)),
             pa.array(np.zeros(P, dtype=np.int64)),
             pa.array(np.zeros(P)), pa.array(np.zeros(P))]
            + [pa.nulls(P, ct) for _, ct in carrier[meta_n:]],
            names=[n_ for n_, _ in carrier],
        )
    )
    tagged = (
        points.map_batches(pack_points, batch_format="pyarrow", zero_copy_batch=True)
        .union(intervals.map_batches(pack_intervals, batch_format="pyarrow", zero_copy_batch=True))
        .union(sentinels)
    )

    def merge_partition(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("__side")
        lt = g.filter(pc.equal(side, 0))
        rt = g.filter(pc.equal(side, 1))
        p_bk = lt.column("__bk").to_numpy(zero_copy_only=False)
        pv = lt.column("__ax0").to_numpy(zero_copy_only=False)
        p_valid = p_bk >= 0
        p_tab_all = lt.select(l_cols)
        p_tab = p_tab_all.filter(pa.array(p_valid))
        i_tab = rt.select([f"__r_{c}" for c in r_cols]).rename_columns(r_cols)
        out = _bucket_kernel(
            p_tab, pv[p_valid], p_bk[p_valid],
            i_tab,
            rt.column("__ax0").to_numpy(zero_copy_only=False),
            rt.column("__ax1").to_numpy(zero_copy_only=False),
            rt.column("__bk").to_numpy(zero_copy_only=False),
        )
        if how == "left" and (~p_valid).any():
            um = p_tab_all.filter(pa.array(~p_valid))
            out = pa.concat_tables([
                out,
                pa.Table.from_arrays(
                    list(um.columns)
                    + [pa.nulls(um.num_rows, r_types[c]) for c in r_payload],
                    schema=out_schema,
                ),
            ])
        return out

    return tagged.groupby("__jp").map_groups(merge_partition, batch_format="pyarrow")


def interval_concurrency(
    ds: "Dataset",
    *,
    by: "str | list[str]",
    start_col: str,
    end_col: str,
    num_partitions: int = 64,
) -> "Dataset":
    """Peak concurrent-interval count per ``by`` group (the classic
    sweep-line max-overlap statistic: rooms needed, peak sessions,
    max in-flight requests) → ``by`` columns + ``peak`` (int64).

    Semantics: half-open intervals ``[start, end)`` — an interval
    ending at t does not overlap one starting at t. Rows with a null
    endpoint or ``end <= start`` are dropped (SQL comparison
    semantics: a null never admits overlap; empty/inverted intervals
    cover nothing). Groups whose every row is dropped do not appear.

    Execution: each interval explodes into two (t, ±1) deltas in one
    map-only pass, then the engine's ``partitioned_window`` cumsum runs
    the sweep — ONE fixed-P shuffle on hash(by), one C-speed
    sort+cumsum kernel per partition (ends sort before starts at equal
    t, enforcing the half-open rule) — and a map-side-combined
    ``grouped_agg`` max takes the per-group peak. The peak is invariant
    to ordering WITHIN ties of (t, delta) (a run of +1s reaches the
    same max after all of them), so no tiebreak column is needed.

    Partitioning note: concurrency is inherently sequential per group —
    a group's whole sweep runs in one partition. ``by`` must have
    enough cardinality to spread (at 100 TB: sweep per (tenant, shard)
    and combine exactly, or accept per-key sequential cost — same
    constraint as any ORDER BY window).
    """
    from .agg import grouped_agg
    from .analytics import partitioned_window

    by = [by] if isinstance(by, str) else list(by)

    def explode(t: pa.Table) -> pa.Table:
        s = t.column(start_col)
        e = t.column(end_col)
        if pa.types.is_timestamp(s.type):
            s = pa.compute.cast(s, pa.int64())
        if pa.types.is_timestamp(e.type):
            e = pa.compute.cast(e, pa.int64())
        if pa.types.is_null(s.type) or pa.types.is_null(e.type):
            # an all-null block arrives as Arrow null type: no interval survives
            valid = np.zeros(t.num_rows, dtype=bool)
            sv = ev = np.zeros(t.num_rows, np.int64)
        else:
            nulls = np.asarray(pa.compute.is_null(s)) | np.asarray(
                pa.compute.is_null(e)
            )
            sv = pa.compute.fill_null(s, 0).to_numpy(zero_copy_only=False)
            ev = pa.compute.fill_null(e, 0).to_numpy(zero_copy_only=False)
            valid = ~nulls & (ev > sv)
        keys = t.select(by).filter(pa.array(valid))
        sv, ev = sv[valid], ev[valid]
        n = len(sv)
        both_keys = pa.concat_tables([keys, keys])
        out = {k: both_keys.column(k) for k in by}
        out["__t"] = pa.array(np.concatenate([sv, ev]))
        out["__delta"] = pa.array(
            np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)])
        )
        return pa.table(out)

    deltas = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    swept = partitioned_window(
        deltas,
        by,
        ["__t", "__delta"],  # -1 before +1 at equal t = half-open
        {"__run": ("cumsum", "__delta")},
        num_partitions=num_partitions,
    )
    out = grouped_agg(
        swept, by, {"peak": ("max", "__run")}, num_partitions=num_partitions
    )

    def finish(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("peak"),
            "peak",
            pa.compute.cast(pa.compute.round(t.column("peak")), pa.int64()),
        )

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
