"""Fixed-partition grouped aggregation (sum/count/min/max/mean).

Ray Data's built-in ``groupby().aggregate(...)`` pays Python-level
cost per GROUP boundary inside its sort-based map/reduce — measured
4.9 s for a 15k-group Sum over 55k rows at sf0.1 (ds.stats():
AggregateMap 6.8 s remote wall for four 14k-row blocks). Fine for a
handful of groups (TPC-H Q1's 4), pathological when group count is
O(rows) — the same trap this repo's dedup/text pipelines solve with
hash-partitioned ``map_groups`` + one vectorized kernel per
partition (BASELINE.md "wide-operator scale pattern").

``grouped_agg`` is the reusable form of that pattern for relational
aggregates, with pyarrow's C++ hash aggregation
(``Table.group_by``) as the per-batch combiner AND the per-partition
merge kernel:

  1. combiner: each input batch collapses to one partial row per
     group it saw (never more than ``rows`` — typically far fewer),
     so only pre-aggregated partials cross the wire;
  2. one shuffle on ``hash(keys) % num_partitions`` — a FIXED number
     of Ray groups independent of key cardinality;
  3. per partition, one vectorized ``group_by`` merges partials
     (sum of sums, min of mins, sum of counts) and finalizes means.

Reference analog: the per-thread partial Bloom counters merged at
the end of the build (``src/BloomFilter.cpp`` insert + the join in
``src/main.cpp``) — combine locally, merge small state globally.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings, splitmix64

if TYPE_CHECKING:
    from ray.data import Dataset

_KINDS = ("sum", "count", "min", "max", "mean", "var", "std")
# partial-spec func -> how partials merge across batches
_MERGE_OF = {"sum": "sum", "min": "min", "max": "max", "count_all": "sum",
             "sumsq": "sum"}


def _partition_of_keys(t: pa.Table, keys: list[str], P: int) -> np.ndarray:
    """hash(keys) % P, null-safe, vectorized. Single int64 key takes the
    splitmix64 fast path; anything else hashes the '\\x1f'-joined string
    form (combiner output scale — already one row per group per batch)."""
    kf = t.schema.field(keys[0])
    # routing MUST depend only on the key VALUE, never on which batch
    # it sits in: a per-batch fast-path condition (e.g. null_count==0)
    # would route the same key through different hash functions in
    # different batches, splitting one group across partitions and
    # silently emitting duplicate partial rows. Dispatch on TYPE only;
    # single-key NULLs route to the fixed splitmix64(0) partition on
    # every path (incl. Arrow null-typed all-null blocks).
    null_part = np.int32(splitmix64(np.zeros(1, np.uint64))[0] % np.uint64(P))
    if len(keys) == 1 and pa.types.is_null(kf.type):
        return np.full(t.num_rows, null_part, np.int32)
    if len(keys) == 1 and pa.types.is_integer(kf.type):
        col = t.column(keys[0])
        k = pc.fill_null(col, 0).to_numpy(zero_copy_only=False).astype(np.uint64)
        part = (splitmix64(k) % np.uint64(P)).astype(np.int32)
        if col.null_count:
            isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
            part[isnull] = null_part
        return part
    parts = []
    for kcol in keys:
        s = pc.cast(t.column(kcol), pa.string())
        parts.append(pc.coalesce(s, pa.scalar("\x00NULL")))
    joined = pc.binary_join_element_wise(*parts, "\x1f") if len(parts) > 1 else parts[0]
    h = hash_strings(joined.combine_chunks())
    part = (h % np.uint64(P)).astype(np.int32)
    if len(keys) == 1:
        col = t.column(keys[0])
        if col.null_count:
            isnull = pc.is_null(col).to_numpy(zero_copy_only=False)
            part[isnull] = null_part
    return part


def _group_by_nullsafe(t: pa.Table, keys: list[str], agg_list) -> pa.Table:
    """``t.group_by(keys).aggregate(agg_list)`` with CORRECT null-key
    grouping.

    pyarrow's multi-key hash grouper (observed through 16.1.0)
    FRAGMENTS groups whose key tuple contains a null — the same
    (None, b) tuple comes back as several output rows with partial
    counts, nondeterministically by input layout (measured: 22 groups
    where 6 exist on a 200-row alternating pattern; single-key
    grouping is unaffected). SQL GROUP BY requires one group per
    distinct tuple with nulls equal. Workaround: for every key column
    that actually has nulls, group on (fill_null(col), is_null(col))
    instead — the validity companion makes a genuine fill-value row
    and a null row DIFFERENT tuples, so no collision is possible —
    then restore nulls afterwards. Zero cost when no key has nulls.
    """
    # An ALL-null block arrives with Arrow null-typed key columns (Ray
    # blocks are typed independently): such a column is constant for
    # grouping, so drop it from the group key and re-attach its
    # null-typed all-null column after — the null type then promotes
    # cleanly when blocks concat, which a speculative cast would break.
    null_typed = [k for k in keys if pa.types.is_null(t.column(k).type)]
    if null_typed:
        gkeys = [k for k in keys if k not in null_typed]
        if not gkeys:
            dummy = "__nsg_const"
            t2 = t.append_column(dummy, pa.array(np.zeros(t.num_rows, np.int8)))
            res = _group_by_nullsafe(t2, [dummy], agg_list).drop_columns([dummy])
        else:
            res = _group_by_nullsafe(t, gkeys, agg_list)
        for k in null_typed:
            res = res.append_column(k, pa.nulls(res.num_rows, pa.null()))
        return res
    nullable = [k for k in keys if t.column(k).null_count > 0]
    if len(keys) <= 1 or not nullable:
        return t.group_by(keys).aggregate(agg_list)
    nv_names = []
    for k in nullable:
        col = t.column(k)
        nv = f"__nv_{k}"
        nv_names.append(nv)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            fill = pa.scalar("", col.type)
        elif pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            fill = pa.scalar(b"", col.type)
        elif pa.types.is_boolean(col.type):
            fill = pa.scalar(False, col.type)
        else:
            fill = pa.scalar(0, col.type)
        t = t.set_column(
            t.schema.get_field_index(k), k, pc.fill_null(col, fill)
        ).append_column(nv, pc.is_null(col))
    res = t.group_by(keys + nv_names).aggregate(agg_list)
    for k, nv in zip(nullable, nv_names):
        col = pc.if_else(
            res.column(nv), pa.nulls(res.num_rows, res.column(k).type), res.column(k)
        )
        res = res.set_column(res.schema.get_field_index(k), k, col)
    return res.drop_columns(nv_names)


def grouped_agg(
    ds: "Dataset",
    keys: str | list[str],
    aggs: dict[str, tuple[str, str | None]],
    *,
    num_partitions: int = 32,
) -> "Dataset":
    """Grouped aggregate → Dataset of ``keys + aggs`` columns.

    ``aggs`` maps output column name → ``(kind, col)`` with kind in
    ``{"sum", "count", "min", "max", "mean", "var", "std"}`` (``count``
    counts rows; pass ``col=None``). SQL NULL-group semantics: null key
    values form their own group (GROUP BY behavior), they are not
    dropped. ``var``/``std`` are population moments (``VAR_POP``/
    ``STDDEV_POP``) from mergeable (Σx, Σx², n) partials in float64 —
    deterministic per partitioning but subject to the usual one-pass
    cancellation when |mean| ≫ std; quantize or center first if that
    regime matters.

    Denominators are ROW counts (``COUNT(*)``): ``mean``/``var``/``std``
    over a null-bearing value column divide by rows, not non-null
    values (SQL AVG ignores nulls) — drop or fill nulls upstream when
    that distinction matters.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    for out, (kind, _col) in aggs.items():
        if kind not in _KINDS:
            raise ValueError(f"agg {out!r}: unknown kind {kind!r}")

    # distinct partial specs: (col, func) computed once, shared by outs
    specs: list[tuple[str | None, str]] = []

    def _spec(col: str | None, func: str) -> int:
        s = (col, func)
        if s not in specs:
            specs.append(s)
        return specs.index(s)

    out_plan: dict[str, tuple[str, tuple[int, ...]]] = {}
    for out, (kind, col) in aggs.items():
        if kind == "count":
            out_plan[out] = ("count", (_spec(None, "count_all"),))
        elif kind == "mean":
            out_plan[out] = ("mean", (_spec(col, "sum"), _spec(None, "count_all")))
        elif kind in ("var", "std"):
            out_plan[out] = (
                kind,
                (_spec(col, "sumsq"), _spec(col, "sum"), _spec(None, "count_all")),
            )
        else:
            out_plan[out] = (kind, (_spec(col, kind),))

    P = int(num_partitions)
    pcols = [f"__p{i}" for i in range(len(specs))]

    def _group_table(t: pa.Table, agg_list, in_names) -> pa.Table:
        """group_by + rename aggregated cols to __p{i} (keys keep names).

        Selects by the names pyarrow actually emits (``{col}_{func}`` /
        ``count_all``) rather than relying on keys-first column order,
        which is pyarrow-version-dependent."""
        res = _group_by_nullsafe(t, keys, agg_list)
        emitted = [
            ("count_all" if c in ([], None) else f"{c}_{f}") for c, f in agg_list
        ]
        want = keys + emitted
        if len(set(want)) != len(want) or set(want) != set(res.column_names):
            raise AssertionError(
                f"grouped_agg: unexpected group_by schema {res.column_names} "
                f"(expected columns {want})"
            )
        return res.select(want).rename_columns(keys + in_names)

    def combine(t: pa.Table) -> pa.Table:
        agg_list = []
        for c, f in specs:
            if f == "sumsq":
                # derived x² column (float64) summed like any other
                sq = f"__sq_{c}"
                if sq not in t.column_names:
                    x = pc.cast(t.column(c), pa.float64())
                    t = t.append_column(sq, pc.multiply(x, x))
                agg_list.append((sq, "sum"))
            else:
                agg_list.append((([] if c is None else c), f))
        res = _group_table(t, agg_list, pcols)
        gp = _partition_of_keys(res, keys, P)
        return res.append_column("__gp", pa.array(gp))

    def merge(g: pa.Table) -> pa.Table:
        agg_list = [(pcols[i], _MERGE_OF[f]) for i, (_c, f) in enumerate(specs)]
        res = _group_table(g, agg_list, pcols)
        cols: dict[str, pa.Array] = {k: res.column(k) for k in keys}
        for out, (kind, idxs) in out_plan.items():
            if kind == "mean":
                i, j = idxs
                cols[out] = pc.divide(
                    pc.cast(res.column(pcols[i]), pa.float64()),
                    pc.cast(res.column(pcols[j]), pa.float64()),
                )
            elif kind in ("var", "std"):
                isq, isum, icnt = idxs
                n = pc.cast(res.column(pcols[icnt]), pa.float64())
                s = pc.cast(res.column(pcols[isum]), pa.float64())
                sq = pc.cast(res.column(pcols[isq]), pa.float64())
                m = pc.divide(s, n)
                var = pc.subtract(pc.divide(sq, n), pc.multiply(m, m))
                # fp guard that PRESERVES null (max_element_wise skips
                # nulls, which would turn an all-null group's NULL
                # variance into 0.0 — SQL VAR_POP returns NULL there)
                var = pc.if_else(pc.is_valid(var),
                                 pc.max_element_wise(var, pa.scalar(0.0)),
                                 var)
                cols[out] = var if kind == "var" else pc.sqrt(var)
            else:
                cols[out] = res.column(pcols[idxs[0]])
        return pa.table(cols)

    # Caveat (Ray behavior, verified): a FULLY-empty input produces a
    # result whose .to_pandas() has zero COLUMNS — Ray drops the schema
    # of all-empty datasets (even a single typed empty block loses its
    # columns through to_pandas). Callers whose group may be empty must
    # construct their own typed empty frame on len()==0, as
    # events_anomalies does.
    return (
        ds.map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(merge, batch_format="pyarrow")
    )


def grouping_sets(
    ds: "Dataset",
    sets: "list[list[str] | tuple[str, ...]]",
    aggs: dict[str, tuple[str, str | None]],
    *,
    num_partitions: int = 32,
) -> "Dataset":
    """SQL ``GROUP BY GROUPING SETS`` in ONE distributed pass →
    columns = union of the sets' keys + ``grouping_id`` + ``aggs``.

    Each batch replicates once per grouping set with the set's absent
    key columns nulled and a ``grouping_id`` bitmask column (SQL
    ``GROUPING(k1, …, kn)`` convention: bit ``2^(n-1-i)`` set when
    union key *i* is AGGREGATED AWAY in that row's set — first key =
    most significant), then the whole union rides ONE map-side-combined
    ``grouped_agg`` keyed on ``[*union_keys, grouping_id]``. The gid
    disambiguates rolled-up NULL from a genuine NULL key value exactly
    as SQL's GROUPING() does, so data nulls keep SQL GROUP BY
    semantics per level.

    Replication factor = len(sets) (CUBE on n keys = 2^n) — paid
    before the map-side combine, so the shuffle still moves O(groups)
    partials per block, not raw rows.
    """
    sets = [list(s) for s in sets]
    if not sets:
        raise ValueError("grouping_sets needs at least one set")
    union_keys: list[str] = []
    for s in sets:
        for k in s:
            if k not in union_keys:
                union_keys.append(k)
        if len(set(s)) != len(s):
            raise ValueError(f"duplicate key in grouping set {s}")
    n = len(union_keys)
    if "grouping_id" in union_keys:
        raise ValueError("'grouping_id' collides with a grouping key")
    for _out, (_k, c) in aggs.items():
        if c == "grouping_id":
            # the replicate kernel synthesizes its own grouping_id
            # column FIRST, so an agg input of that name would silently
            # aggregate the bitmask instead of the data
            raise ValueError(
                "'grouping_id' collides with an aggregate input column; "
                "rename the data column before grouping_sets")
    gids = [
        sum((1 << (n - 1 - i)) for i, k in enumerate(union_keys) if k not in s)
        for s in sets
    ]
    if len(set(gids)) != len(gids):
        raise ValueError("duplicate grouping sets")
    # An agg INPUT column that is also a union key would otherwise read
    # the nulled copy at levels that roll the key up (SQL aggregates the
    # real values regardless of the grouping level) — carry the raw
    # values under an internal alias and aggregate over that instead.
    alias_of = {
        c: f"__agg_{c}"
        for (_k, c) in aggs.values()
        if c is not None and c in union_keys
    }
    aggs_in = {
        out: (kind, alias_of.get(col, col)) for out, (kind, col) in aggs.items()
    }
    agg_cols = [c for (_k, c) in aggs.values() if c is not None]

    def replicate(t: pa.Table) -> pa.Table:
        reps = []
        for s, gid in zip(sets, gids):
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for k in union_keys:
                col = t.column(k)
                cols[k] = col if k in s else pa.nulls(t.num_rows, col.type)
            cols["grouping_id"] = pa.array(
                np.full(t.num_rows, gid, dtype=np.int64)
            )
            for c in agg_cols:
                cols[alias_of.get(c, c)] = (
                    t.column(c) if c in alias_of or c not in cols else cols[c]
                )
            reps.append(pa.table(cols))
        return pa.concat_tables(reps)

    rep = ds.map_batches(replicate, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(
        rep, [*union_keys, "grouping_id"], aggs_in, num_partitions=num_partitions
    )


def cube(ds, keys, aggs, *, num_partitions: int = 32):
    """``GROUP BY CUBE(keys)``: all 2^n grouping sets, one pass."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sets = [
        [k for i, k in enumerate(keys) if mask & (1 << i)]
        for mask in range(1 << len(keys))
    ]
    return grouping_sets(ds, sets, aggs, num_partitions=num_partitions)


def rollup(ds, keys, aggs, *, num_partitions: int = 32):
    """``GROUP BY ROLLUP(keys)``: the n+1 prefix sets, one pass."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, sets, aggs, num_partitions=num_partitions)
