"""Distributed as-of join (temporal "most recent matching state"
lookup) — the time-series join Ray Data has no built-in for.

Semantics (DuckDB ``ASOF JOIN`` / ``pd.merge_asof``): for every left
row, attach AT MOST ONE right row — the one with the same ``by`` key
whose ``on`` value is the greatest ``<=`` the left's (``backward``;
``forward`` and ``nearest`` symmetric) — optionally within
``tolerance``. ``how="left"`` keeps unmatched left rows (null right
columns), ``how="inner"`` drops them.

Reference analog: the probe phase pairs every query k-mer with state
built by a PRIOR pass over the same key space
(``src/main.cpp:114-149``, ``src/SkmerSplitter.cpp:91-151``) — the
as-of join is that "look up the latest state for my key" pattern with
an explicit time axis instead of build-then-probe phase ordering.

Scale shape (``by`` keyed, the normal case): both sides route ONCE to
``hash(by) % P`` fixed partitions — a partition holds whole key groups,
which is the only co-location an as-of match needs — then a single
C-speed ``pd.merge_asof`` per partition (sort + galloping march, no
per-key Python). Neither side is ever materialized on the driver; skew
follows :func:`hash_join`'s story (the partition count is the knob).

Keyless as-of (``by=None``) has no equality key to co-partition on, so
it requires ``broadcast=True``: the right side materializes ONCE into
plasma (it is typically a small reference timeline — market ticks,
config epochs) and every left batch matches map-only against the
shared sorted copy; a byte-size guard refuses oversized right sides
instead of silently OOMing workers.

Determinism: when several right rows share one ``(by, on)`` value the
winner is implementation-defined in SQL engines; here ``tie_break``
(a right column; greatest wins, nulls lose) pins it. Without a
``tie_break`` the winner among exact duplicates is whichever sorts
last, which is stable only if the duplicate payloads are identical —
pre-aggregate the right side or pass ``tie_break`` when it matters.

SQL null semantics: a null in ``on`` or any ``by`` component never
matches — such right rows are dropped, such left rows are kept
unmatched under ``how="left"``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from .join import _key_partition, _types_of, _encode_composite

if TYPE_CHECKING:
    from ray.data import Dataset

_DIRECTIONS = ("backward", "forward", "nearest")

#: broadcast-plan size guard (same rationale as join.AUTO_BROADCAST_BYTES:
#: one plasma copy per node, zero-copy reads per task)
BROADCAST_LIMIT_BYTES = 256 << 20


def _as_sort_key(s: pd.Series, name: str) -> np.ndarray:
    """Null-free ArrowDtype series -> numpy array merge_asof accepts
    (int64 / datetime64 / float64). Raises for non-orderable dtypes."""
    dt = s.dtype
    pa_dt = getattr(dt, "pyarrow_dtype", None)
    if pa_dt is not None:
        if pa.types.is_timestamp(pa_dt):
            return s.to_numpy(dtype=f"datetime64[{pa_dt.unit}]")
        if pa.types.is_integer(pa_dt):
            return s.to_numpy(dtype=np.int64)
        if pa.types.is_floating(pa_dt):
            return s.to_numpy(dtype=np.float64)
        raise TypeError(f"asof_join: on column {name!r} must be numeric or "
                        f"timestamp, got {pa_dt}")
    return s.to_numpy()


def _resolve_tolerance(tolerance, on_type: pa.DataType):
    """An integer tolerance over a timestamp ``on`` column is read in
    the COLUMN'S OWN unit (us for the driver tables); pass a
    ``pd.Timedelta`` to be unit-explicit."""
    if tolerance is None:
        return None
    if pa.types.is_timestamp(on_type) and isinstance(tolerance, (int, np.integer)):
        return pd.Timedelta(int(tolerance), unit=on_type.unit)
    return tolerance


def asof_join(
    left: "Dataset",
    right: "Dataset",
    on: str,
    *,
    by: "str | list[str] | None" = None,
    right_on: str | None = None,
    right_by: "str | list[str] | None" = None,
    how: str = "left",
    direction: str = "backward",
    tolerance=None,
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
    suffix: str = "_r",
    num_partitions: int = 64,
    broadcast: bool = False,
    broadcast_limit: int = BROADCAST_LIMIT_BYTES,
) -> "Dataset":
    """As-of join; returns a lazy streaming Dataset.

    Output columns: left columns, then the matched right ``on`` value
    (under ``right_on``'s name, ``suffix``-renamed on collision — so
    with equal names ``ts`` -> ``ts_r``), then the right payload
    columns (``suffix``-renamed on collision). Right ``by`` columns are
    dropped (they equal the left's on every match).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"how must be 'left' or 'inner', got {how!r}")
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    right_on = right_on or on
    by_l: list[str] = [by] if isinstance(by, str) else (list(by) if by else [])
    by_r: list[str] = (
        [right_by] if isinstance(right_by, str)
        else (list(right_by) if right_by else list(by_l))
    )
    if len(by_r) != len(by_l):
        raise ValueError(f"right_by length {len(by_r)} != by length {len(by_l)}")
    if not by_l and not broadcast:
        raise ValueError(
            "asof_join(by=None) has no equality key to co-partition on — "
            "a hash shuffle cannot preserve global time order. Pass "
            "broadcast=True (small right side, e.g. a reference timeline) "
            "or add a by key."
        )

    l_schema, r_schema = left.schema(), right.schema()
    if l_schema is None or not l_schema.names:
        return left  # no left rows -> empty result for both hows
    if r_schema is None or not r_schema.names:
        raise ValueError(
            "asof_join: right side has no schema (empty dataset) — "
            "output columns are underdetermined"
        )
    l_types, r_types = _types_of(l_schema), _types_of(r_schema)
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    for c in (on, *by_l):
        if c not in l_types:
            raise ValueError(f"asof_join: left has no column {c!r}")
    for c in (right_on, *by_r):
        if c not in r_types:
            raise ValueError(f"asof_join: right has no column {c!r}")
    if tie_break is not None and tie_break not in r_types:
        raise ValueError(f"asof_join: tie_break {tie_break!r} is not a right column")

    # right payload = everything except the by keys; the right `on`
    # column is emitted too (the matched timestamp is the point)
    r_payload = [c for c in r_cols if c not in by_r]
    l_set = set(l_cols)
    rename_r = {c: (c + suffix if c in l_set else c) for c in r_payload}
    out_fields = [(c, l_types[c]) for c in l_cols] + [
        (rename_r[c], r_types[c]) for c in r_payload
    ]
    seen: set[str] = set()
    for name, _ in out_fields:
        if name in seen:
            raise ValueError(f"asof_join: duplicate output column {name!r} — "
                             "rename inputs or change suffix")
        seen.add(name)
    out_schema = pa.schema(out_fields)
    out_cols = [f.name for f in out_schema]
    ro_out = rename_r[right_on]
    tie_out = rename_r.get(tie_break) if tie_break is not None else None
    tol = _resolve_tolerance(tolerance, l_types[on])

    def _complete(df: pd.DataFrame) -> pd.DataFrame:
        """df restricted/extended to exactly out_cols; absent columns
        become TYPED ArrowDtype nulls (a float64-NaN reindex column
        could not cast back to timestamp/string in out_schema)."""
        missing = {
            f.name: pd.Series(
                pd.array([None] * len(df), dtype=pd.ArrowDtype(f.type)),
                index=df.index,
            )
            for f in out_schema
            if f.name not in df.columns
        }
        return (df.assign(**missing) if missing else df)[out_cols]

    def _match(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        """Kernel over ArrowDtype frames: ldf has the left columns,
        rdf has [by_l names...] + renamed payload columns, BOTH already
        null-key-filtered on the right / split on the left by caller.
        rdf must arrive sorted by (ro_out, tie)."""
        lv = ldf[on].notna()
        for b in by_l:
            lv &= ldf[b].notna()
        linv = ldf[~lv.to_numpy(dtype=bool)]
        ldf = ldf[lv.to_numpy(dtype=bool)]
        if len(ldf) and len(rdf):
            ldf = ldf.assign(__lk=_as_sort_key(ldf[on], on)).sort_values(
                "__lk", kind="mergesort"
            )
            merged = pd.merge_asof(
                ldf,
                rdf,
                left_on="__lk",
                right_on="__rk",
                by=by_l if by_l else None,
                direction=direction,
                tolerance=tol,
                allow_exact_matches=allow_exact_matches,
            )
            merged = merged.drop(columns=["__lk", "__rk"])
            if how == "inner":
                merged = merged[merged[ro_out].notna()]
        elif how == "left":
            # empty side: every valid left row is unmatched (pandas'
            # merge_asof crashes on 0-chunk ArrowDtype by columns, so
            # the degenerate cases resolve here, not in the kernel)
            merged = _complete(ldf)
        else:
            merged = _complete(ldf.iloc[0:0])
        if how == "left" and len(linv):
            merged = pd.concat(
                [_complete(merged), _complete(linv)], ignore_index=True
            )
        return _complete(merged)

    def _prep_right(rt: pa.Table) -> pd.DataFrame:
        """Right carrier table (original names) -> merge-ready frame:
        null keys dropped, by columns renamed to the left's names,
        payload renamed, sorted by (__rk, tie) so the LAST row among
        exact (by, on) duplicates is the tie_break winner."""
        rdf = rt.to_pandas(types_mapper=pd.ArrowDtype)
        rv = rdf[right_on].notna()
        for b in by_r:
            rv &= rdf[b].notna()
        rdf = rdf[rv.to_numpy(dtype=bool)]
        rdf = rdf.rename(columns={**dict(zip(by_r, by_l)), **rename_r})
        rdf = rdf[by_l + [rename_r[c] for c in r_payload]]
        sort_cols = [ro_out] + ([tie_out] if tie_out else [])
        # nulls FIRST so a null tie_break loses to any real value
        rdf = rdf.sort_values(sort_cols, kind="mergesort", na_position="first")
        return rdf.assign(__rk=_as_sort_key(rdf[ro_out], ro_out))

    if broadcast:
        return _asof_broadcast(
            left, right, r_cols, _prep_right, _match, out_schema, broadcast_limit
        )
    return _asof_shuffle(
        left, right, on, by_l, by_r, l_cols, r_cols, l_types, r_types,
        _prep_right, _match, out_schema, int(num_partitions),
    )


def _route_col(t: pa.Table, keys: list[str], P: int) -> pa.Array:
    """Partition id of a by-key tuple — the SAME kernel on both sides
    regardless of per-side null presence (a per-side fast/slow path
    split would route equal keys differently)."""
    if len(keys) == 1:
        return pa.array(_key_partition(t.column(keys[0]), P))
    return pa.array(_key_partition(_encode_composite(t, keys), P))


def _asof_shuffle(
    left, right, on, by_l, by_r, l_cols, r_cols, l_types, r_types,
    _prep_right, _match, out_schema, P,
):
    import ray.data as _rd

    carrier = [(n, l_types[n]) for n in l_cols] + [
        (f"__r_{n}", r_types[n]) for n in r_cols
    ]

    def pack(side: int, keys: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            arrays = [_route_col(t, keys, P),
                      pa.array(np.full(n, side, dtype=np.int8))]
            names = ["__jp", "__side"]
            for cname, ctype in carrier:
                own = cname[4:] if cname.startswith("__r_") else cname
                present = (side == 1) == cname.startswith("__r_") and own in t.column_names
                if present:
                    col = t.column(own).combine_chunks()
                    if col.type != ctype:  # all-null blocks arrive null-typed
                        col = col.cast(ctype)
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(n, ctype))
                names.append(cname)
            return pa.Table.from_arrays(arrays, names=names)

        return fn

    # sentinel row per partition (side=-1): guarantees every group task
    # sees >= 1 row so the kernel always emits a schema-typed table
    sentinels = _rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(np.arange(P, dtype=np.int32)),
             pa.array(np.full(P, -1, dtype=np.int8))]
            + [pa.nulls(P, t) for _, t in carrier],
            names=["__jp", "__side"] + [n for n, _ in carrier],
        )
    )
    tagged = (
        left.map_batches(pack(0, by_l), batch_format="pyarrow", zero_copy_batch=True)
        .union(right.map_batches(pack(1, by_r), batch_format="pyarrow", zero_copy_batch=True))
        .union(sentinels)
    )

    def merge_partition(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("__side")
        lt = g.filter(pc.equal(side, 0)).select(l_cols)
        rt = g.filter(pc.equal(side, 1)).select([f"__r_{c}" for c in r_cols])
        rt = rt.rename_columns(r_cols)
        merged = _match(lt.to_pandas(types_mapper=pd.ArrowDtype), _prep_right(rt))
        return pa.Table.from_pandas(
            merged, preserve_index=False, schema=out_schema
        ).replace_schema_metadata(None)

    return tagged.groupby("__jp").map_groups(merge_partition, batch_format="pyarrow")


def _asof_broadcast(left, right, r_cols, _prep_right, _match, out_schema, limit):
    import ray

    rtab = pa.concat_tables(
        ray.get(right.to_arrow_refs()), promote_options="permissive"
    ).select(r_cols)
    if rtab.nbytes > limit:
        raise ValueError(
            f"asof_join(broadcast=True): right side is {rtab.nbytes >> 20} MiB "
            f"(> {limit >> 20} MiB limit) — add a by key for the partitioned "
            "plan, or raise broadcast_limit if the workers can hold it"
        )
    rref = ray.put(_prep_right(rtab))  # filtered + renamed + sorted ONCE

    def fn(batch: pa.Table) -> pa.Table:
        merged = _match(batch.to_pandas(types_mapper=pd.ArrowDtype), ray.get(rref))
        return pa.Table.from_pandas(
            merged, preserve_index=False, schema=out_schema
        ).replace_schema_metadata(None)

    return left.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
