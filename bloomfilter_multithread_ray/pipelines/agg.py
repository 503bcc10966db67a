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
    if len(keys) == 1 and pa.types.is_integer(kf.type) and t.column(keys[0]).null_count == 0:
        k = t.column(keys[0]).to_numpy(zero_copy_only=False).astype(np.uint64)
        return (splitmix64(k) % np.uint64(P)).astype(np.int32)
    parts = []
    for kcol in keys:
        s = pc.cast(t.column(kcol), pa.string())
        parts.append(pc.coalesce(s, pa.scalar("\x00NULL")))
    joined = pc.binary_join_element_wise(*parts, "\x1f") if len(parts) > 1 else parts[0]
    h = hash_strings(joined.combine_chunks())
    return (h % np.uint64(P)).astype(np.int32)


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
        res = t.group_by(keys).aggregate(agg_list)
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
                var = pc.max_element_wise(var, pa.scalar(0.0))  # fp guard
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
