"""General distributed equi-join operator (hash-partitioned, join-free
of ``ray.data.Dataset.join`` — which hung under constrained test
sessions, see BASELINE.md / memory notes).

The reference has no general join (its semi-join is the Bloom
build+probe composition, ``src/main.cpp:114-149``); round-1 pipelines
each hand-rolled broadcast or join-free rewrites. This operator is the
missing reusable primitive for the large×large case:

    out = hash_join(left, right, on="custkey", how="inner")

Shape: both sides are tagged and routed to ``hash(key) % P`` fixed
partitions (same-key => same partition, exact), then ONE pandas merge
per partition — never one Ray group per key (per-GROUP overhead is
the measured scale trap, BASELINE.md), never a driver materialization,
never a broadcast. For semi/anti joins only the right side's KEY
column is shipped (pruned at the source). Skewed keys: the partition
count is the knob; a pathological single hot key degenerates to one
partition's pandas merge, which is the same behavior a sort-merge
shuffle join exhibits — salting belongs above this operator (carry a
salt column into the key, as the Bloom build does).

Supported: how in {"inner", "left", "semi", "anti"}; integer or
string keys; SQL NULL-key semantics (NULL never matches: dropped for
inner/semi, kept unmatched for left, kept for anti).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_ints, hash_strings

if TYPE_CHECKING:
    from ray.data import Dataset

_HOWS = ("inner", "left", "semi", "anti")


def _key_partition(col: pa.ChunkedArray | pa.Array, P: int) -> np.ndarray:
    """Deterministic partition of a key column (int or string); null
    keys -> partition 0 (they never match, any routing is correct)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        vals = col.to_numpy(zero_copy_only=False)
        valid = ~pd.isna(vals)
        h = np.zeros(len(vals), dtype=np.uint64)
        if valid.any():
            h[valid] = hash64_ints(np.asarray(vals[valid], dtype=np.int64))
    else:
        h = hash_strings(col)
        h = np.where(np.asarray(col.is_null()), np.uint64(0), h)
    return (h % np.uint64(P)).astype(np.int32)


def hash_join(
    left: "Dataset",
    right: "Dataset",
    on: str,
    *,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int = 64,
    suffix: str = "_r",
) -> "Dataset":
    """Distributed equi-join; returns a Dataset (lazy, streaming).

    Output columns: ``semi``/``anti`` -> exactly the left columns;
    ``inner``/``left`` -> left columns then right non-key columns
    (name collisions get ``suffix``).
    """
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}")
    right_on = right_on or on
    l_schema, r_schema = left.schema(), right.schema()  # ray.data.Schema
    l_cols = list(l_schema.names)
    if how in ("semi", "anti"):
        r_cols = [right_on]  # prune: only the key crosses the shuffle
        right = right.select_columns([right_on])
    else:
        r_cols = list(r_schema.names)
    r_out = [c for c in r_cols if c != right_on]
    def _pa_type(t) -> pa.DataType:
        # ray.data.Schema.types holds pyarrow types for arrow-backed
        # blocks but numpy/python types for pandas-backed ones
        if isinstance(t, pa.DataType):
            return t
        try:
            if np.dtype(t) == np.dtype("O"):
                return pa.string()
            return pa.from_numpy_dtype(np.dtype(t))
        except TypeError:
            return pa.string()

    l_types = {n: _pa_type(t) for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: _pa_type(t) for n, t in zip(r_schema.names, r_schema.types)}

    # fixed output schema (pandas->arrow inference would flip types on
    # partitions whose right side is empty / all-null)
    if how in ("semi", "anti"):
        out_schema = pa.schema([(c, l_types[c]) for c in l_cols])
    else:
        out_fields = [(c, l_types[c]) for c in l_cols]
        out_fields += [
            (c + suffix if c in set(l_cols) else c, r_types[c]) for c in r_out
        ]
        out_schema = pa.schema(out_fields)

    # carrier schema: union of both sides' columns + routing/side tags;
    # the absent side's columns ride as typed nulls
    carrier = [(n, l_types[n]) for n in l_cols] + [(f"__r_{n}", r_types[n]) for n in r_cols]

    def pack(side: int, key_col: str):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            jp = _key_partition(t.column(key_col), num_partitions)
            arrays = [pa.array(jp), pa.array(np.full(n, side, dtype=np.int8))]
            names = ["__jp", "__side"]
            for cname, ctype in carrier:
                own = cname if side == 0 else (cname[4:] if cname.startswith("__r_") else None)
                present = own is not None and (
                    (side == 0 and not cname.startswith("__r_")) or side == 1
                ) and own in t.column_names
                arrays.append(t.column(own).combine_chunks() if present else pa.nulls(n, ctype))
                names.append(cname)
            return pa.Table.from_arrays(arrays, names=names)

        return fn

    tagged = left.map_batches(
        pack(0, on), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(pack(1, right_on), batch_format="pyarrow", zero_copy_batch=True)
    )

    rename_r = {c: (c + suffix if c in set(l_cols) else c) for c in r_out}

    def merge_partition(g: pa.Table) -> pa.Table:
        # split sides in ARROW first: converting the carrier (typed
        # nulls in the absent side's columns) to pandas would coerce
        # int64 columns to float64 and lose >2^53 key precision
        import pyarrow.compute as pc

        side = g.column("__side")
        lt = g.filter(pc.equal(side, 0)).select(l_cols)
        rt = g.filter(pc.equal(side, 1)).select([f"__r_{c}" for c in r_cols])
        rt = rt.rename_columns([on if c == right_on else rename_r[c] for c in r_cols])
        ldf = lt.to_pandas()
        if how in ("semi", "anti"):
            keys = set(rt.to_pandas()[on].dropna())
            mask = ldf[on].isin(keys) & ldf[on].notna()
            out = ldf[mask] if how == "semi" else ldf[~mask]
            return pa.Table.from_pandas(out, preserve_index=False, schema=out_schema)
        rdf = rt.to_pandas()
        rdf = rdf[rdf[on].notna()]
        merged = ldf.merge(rdf, on=on, how=how)
        merged = merged[[f.name for f in out_schema]]
        return pa.Table.from_pandas(merged, preserve_index=False, schema=out_schema)

    return tagged.groupby("__jp").map_groups(merge_partition, batch_format="pyarrow")
