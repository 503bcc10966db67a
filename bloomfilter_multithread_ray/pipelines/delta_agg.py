"""Incremental grouped-aggregate store — materialized-view delta
maintenance for Ray Data.

``merge_aggregate`` folds a delta Dataset into a persistent per-key
aggregate table stored as fixed-P hash partitions
(``{store}/part={p}/agg.parquet``): the delta combines map-side to one
partial row per (key, batch) — exactly :mod:`.agg`'s combiner
discipline — routes on the SAME ``hash(keys) % P`` the store was
created with, and each touched partition reads ONLY its own file,
merges partials vectorized (sum of sums, min of mins, sum of counts),
and republishes atomically (tmp + rename). Partitions the delta never
touches do zero I/O, so maintenance cost tracks the delta's key
spread, not the accumulated state size — the reference's
insert-into-owned-shard loop (``src/SkmerSplitter.cpp:62-89``,
ownership by partitioning, no locks) with parquet partitions as the
owned state.

Exactly-once per delta: pass a ``delta_id`` and each partition file
records the ids it has absorbed in its parquet schema metadata; a
re-run after a mid-job crash skips partitions that already carry the
id and applies the rest — idempotent repair, no double counting.

State is stored in PARTIAL form (``mean`` persists ``{out}__sum`` +
``{out}__cnt``); :func:`read_aggregate` finalizes on the way out, so
any number of future deltas keep merging exactly.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import _group_by_nullsafe, _partition_of_keys

if TYPE_CHECKING:
    from ray.data import Dataset

MANIFEST_NAME = "_agg_manifest.json"
_DELTA_META = b"applied_delta_ids"
_KINDS = ("sum", "count", "min", "max", "mean")


def _state_plan(aggs: dict) -> tuple[list[tuple[str, str, str | None]], dict]:
    """aggs {out: (kind, col)} -> (state columns [(state_name, merge_fn,
    source_col)], finalize plan {out: (kind, state names...)})."""
    state: list[tuple[str, str, str | None]] = []
    fin: dict[str, tuple] = {}

    def add(name, fn, col):
        if not any(s[0] == name for s in state):
            state.append((name, fn, col))

    for out, (kind, col) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"agg {out!r}: unknown kind {kind!r}")
        if kind == "count":
            add(out, "sum", None)
            fin[out] = ("count", out)
        elif kind == "mean":
            add(f"{out}__sum", "sum", col)
            add(f"{out}__cnt", "sum", None)
            fin[out] = ("mean", f"{out}__sum", f"{out}__cnt")
        else:
            add(out, kind if kind != "sum" else "sum", col)
            fin[out] = (kind, out)
    return state, fin


def _combine(t: pa.Table, keys: list[str], state, P: int) -> pa.Table:
    """One partial row per key per batch, + routing partition. Several
    count-states (a ``count`` output and a ``mean``'s denominator)
    share ONE emitted ``count_all`` column."""
    agg_list = []
    proj = {k: t.column(k) for k in keys}
    emitted_of: dict[str, str] = {}
    for name, fn, col in state:
        if col is None:
            emitted_of[name] = "count_all"
        else:
            proj[f"__in_{name}"] = t.column(col)
            agg_list.append((f"__in_{name}", fn))
            emitted_of[name] = f"__in_{name}_{fn}"
    if any(e == "count_all" for e in emitted_of.values()):
        agg_list.append(([], "count_all"))
    res = _group_by_nullsafe(pa.table(proj), keys, agg_list)
    # reference by emitted names (keys-first order is version-dependent)
    want = set(keys) | set(emitted_of.values())
    if not want <= set(res.column_names):
        raise AssertionError(f"unexpected group_by schema {res.column_names}")
    cols = {k: res.column(k) for k in keys}
    for name, _fn, _col in state:
        cols[name] = res.column(emitted_of[name])
    out = pa.table(cols)
    gp = _partition_of_keys(out, keys, P)
    return out.append_column("__gp", pa.array(gp))


def _merge_states(t: pa.Table, keys: list[str], state) -> pa.Table:
    agg_list = [(name, "min" if fn == "min" else ("max" if fn == "max" else "sum"))
                for name, fn, _c in state]
    res = _group_by_nullsafe(t.select(keys + [s[0] for s in state]), keys, agg_list)
    emitted = [f"{name}_{fn}" for (name, fn) in
               [(a, b) for a, b in agg_list]]
    want = keys + emitted
    if set(want) != set(res.column_names) or len(set(want)) != len(want):
        raise AssertionError(f"unexpected merge schema {res.column_names}")
    return res.select(want).rename_columns(keys + [s[0] for s in state])


def merge_aggregate(
    store: str,
    delta: "Dataset",
    keys: str | list[str],
    aggs: dict[str, tuple[str, str | None]],
    *,
    num_partitions: int = 32,
    delta_id: str | None = None,
) -> pd.DataFrame:
    """Fold ``delta`` into the aggregate store → per-partition report
    {part, n_keys, updated, skipped}. Creates the store on first use;
    later calls must pass an identical (keys, aggs) spec — P and the
    spec are pinned by the manifest, because routing and state shape
    are the store's invariants."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    state, _fin = _state_plan(aggs)
    spec = {
        "keys": keys,
        "aggs": {o: [k, c] for o, (k, c) in aggs.items()},
        "num_partitions": int(num_partitions),
    }
    os.makedirs(store, exist_ok=True)
    mp = os.path.join(store, MANIFEST_NAME)
    if os.path.exists(mp):
        with open(mp) as f:
            have = json.load(f)
        if have != spec:
            raise ValueError(
                f"store spec mismatch: store has {have}, caller passed {spec}"
            )
    else:
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(spec, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mp)
    P = spec["num_partitions"]

    def combine(t: pa.Table) -> pa.Table:
        return _combine(t, keys, state, P)

    def upsert(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        p = int(g.column("__gp")[0].as_py())
        fresh = g.drop_columns(["__gp"])
        d = os.path.join(store, f"part={p}")
        fp = os.path.join(d, "agg.parquet")
        applied: list[str] = []
        existing = None
        if os.path.exists(fp):
            existing = pq.read_table(fp)
            meta = existing.schema.metadata or {}
            applied = json.loads(meta.get(_DELTA_META, b"[]"))
            if delta_id is not None and delta_id in applied:
                return pa.table(
                    {"part": pa.array([p], pa.int64()),
                     "n_keys": pa.array([existing.num_rows], pa.int64()),
                     "updated": pa.array([False], pa.bool_()),
                     "skipped": pa.array([True], pa.bool_())}
                )
            existing = existing.replace_schema_metadata(None)
        both = (
            pa.concat_tables([existing, fresh], promote_options="permissive")
            if existing is not None
            else fresh
        )
        merged = _merge_states(both, keys, state)
        if delta_id is not None:
            applied = applied + [delta_id]
        merged = merged.replace_schema_metadata(
            {_DELTA_META: json.dumps(applied).encode()}
        )
        os.makedirs(d, exist_ok=True)
        tmp = fp + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, fp)  # atomic: repair re-runs skip via delta_id
        return pa.table(
            {"part": pa.array([p], pa.int64()),
             "n_keys": pa.array([merged.num_rows], pa.int64()),
             "updated": pa.array([True], pa.bool_()),
             "skipped": pa.array([False], pa.bool_())}
        )

    report = (
        delta.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(upsert, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(report):  # empty delta: nothing touched
        return pd.DataFrame(
            {"part": pd.array([], dtype="int64"),
             "n_keys": pd.array([], dtype="int64"),
             "updated": pd.array([], dtype="bool"),
             "skipped": pd.array([], dtype="bool")}
        )
    return report.sort_values("part").reset_index(drop=True)


def read_aggregate(store: str) -> "Dataset":
    """Current aggregate state → Dataset of keys + finalized outputs
    (means divided out; internal partial columns never escape)."""
    import ray.data

    with open(os.path.join(store, MANIFEST_NAME)) as f:
        spec = json.load(f)
    keys = spec["keys"]
    aggs = {o: (kc[0], kc[1]) for o, kc in spec["aggs"].items()}
    _state, fin = _state_plan(aggs)
    files = sorted(
        os.path.join(store, d, "agg.parquet")
        for d in os.listdir(store)
        if d.startswith("part=")
    )
    if not files:
        raise ValueError(f"empty aggregate store at {store}")
    ds = ray.data.read_parquet(files)

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {k: t.column(k) for k in keys}
        for out, plan in fin.items():
            if plan[0] == "mean":
                cols[out] = pc.divide(
                    pc.cast(t.column(plan[1]), pa.float64()),
                    pc.cast(t.column(plan[2]), pa.float64()),
                )
            else:
                cols[out] = t.column(plan[1])
        return pa.table(cols)

    return ds.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)
