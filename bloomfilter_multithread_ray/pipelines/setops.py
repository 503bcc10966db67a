"""SQL set operations over Datasets: INTERSECT / EXCEPT (distinct).

The reference engine's store-vs-crawl membership split
(`src/main.cpp:86` routes each k-mer to exactly one owner that decides
membership) generalizes to whole-row set algebra: both sides route on
the same row hash, one owner partition decides presence-per-side. Ray
Data has `union` but no intersect/except; this module supplies them
with SQL semantics (DISTINCT output, nulls compare equal — the
IS NOT DISTINCT FROM row match every SQL engine uses for set ops).

Scale shape: each batch first reduces to its DISTINCT rows via
pyarrow's C++ hash-group (so the exchange moves per-batch-distinct
rows, not the input), tagged with a side bit; ONE fixed-P shuffle on
the row hash co-locates every copy of a row, and a pure-Arrow kernel
per partition computes per-row side presence (min/max over the side
tag) and filters — no pandas round-trip, no driver materialization.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.compute as pc

from .agg import _group_by_nullsafe, _partition_of_keys

if TYPE_CHECKING:
    from ray.data import Dataset

_SIDE = "__so_side"
_PART = "__so_p"


def _prepared(ds: "Dataset", columns: list[str], side: int, P: int) -> "Dataset":
    def prep(t: pa.Table) -> pa.Table:
        d = _group_by_nullsafe(t.select(columns), columns, [])
        d = d.select(columns)  # group_by may reorder; pin the contract order
        d = d.append_column(_SIDE, pa.array([side] * len(d), pa.int8()))
        return d.append_column(_PART, pa.array(_partition_of_keys(d, columns, P)))

    return ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)


def set_op(
    left: "Dataset",
    right: "Dataset",
    op: str,
    *,
    columns: list[str] | None = None,
    num_partitions: int = 64,
) -> "Dataset":
    """``left INTERSECT right`` / ``left EXCEPT right`` (SQL semantics:
    DISTINCT output, null row components compare EQUAL).

    ``columns`` selects the row shape (default: the left schema, which
    the right side must also provide — extra right columns are
    ignored, matching SQL's positional-width check being the caller's
    job). Output column order follows ``columns``.
    """
    if op not in ("intersect", "except"):
        raise ValueError(f"set_op: op must be 'intersect' or 'except', got {op!r}")
    cols = list(columns) if columns is not None else list(left.schema().names)
    missing = [c for c in cols if c not in right.schema().names]
    if missing:
        raise ValueError(f"set_op: right side lacks columns {missing}")
    P = int(num_partitions)

    both = _prepared(left, cols, 1, P).union(_prepared(right, cols, 2, P))

    def kernel(g: pa.Table) -> pa.Table:
        res = _group_by_nullsafe(
            g.drop_columns([_PART]), cols, [(_SIDE, "min"), (_SIDE, "max")]
        )
        has_l = pc.equal(res.column(f"{_SIDE}_min"), pa.scalar(1, pa.int8()))
        has_r = pc.equal(res.column(f"{_SIDE}_max"), pa.scalar(2, pa.int8()))
        keep = pc.and_(has_l, pc.invert(has_r)) if op == "except" else pc.and_(has_l, has_r)
        return res.filter(keep).select(cols)

    return both.groupby(_PART).map_groups(kernel, batch_format="pyarrow")


def intersect_distinct(left, right, *, columns=None, num_partitions: int = 64):
    """SQL ``INTERSECT``: distinct rows present on BOTH sides."""
    return set_op(left, right, "intersect", columns=columns, num_partitions=num_partitions)


def except_distinct(left, right, *, columns=None, num_partitions: int = 64):
    """SQL ``EXCEPT``: distinct left rows absent from the right side."""
    return set_op(left, right, "except", columns=columns, num_partitions=num_partitions)
