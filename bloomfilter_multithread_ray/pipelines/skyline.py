"""Distributed skyline (Pareto frontier) operator.

A row r is IN the skyline iff no other row dominates it, where s
dominates r when s is <= r in every skyline dimension (after
orienting maximized columns) and strictly < in at least one. Duplicate
rows (equal in all dimensions) never dominate each other — ALL copies
of a Pareto-optimal point are returned (the SQL ``NOT EXISTS``
dominance semantics).

Distribution rides the skyline's algebraic property
    skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)),
the same map-side-combine shape as the engine's sketch builds
(reference analog: the per-partition Bloom partials of
`src/SkmerSplitter.cpp:62-89` merged once at the end): every block
reduces to its (typically tiny, O(log^{d-1} n)-expected) local
frontier in one vectorized pass, and only those survivors — never the
raw data — move to the single final-merge task. No shuffle, no
driver-side materialization of anything but frontier candidates.

Per-block kernel: SFS (sort-filter-skyline, Chomicki et al. ICDE'03).
Rows sort by the oriented dimension SUM — a dominator has a strictly
smaller sum, so scanning in sum order means the first still-alive row
is always Pareto-optimal; each loop iteration broadcasts ONE frontier
point against all alive rows (numpy), so the Python-level loop runs
|frontier| times, not |rows| times.

Null semantics: rows with a null in any skyline dimension are dropped
(SQL three-valued dominance would make every null row vacuously
"undominated", which is never what a user means); document and filter
nulls upstream if they matter.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterable

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    from ray.data import Dataset


def _oriented(t: pa.Table, cols: list[str], maximize: frozenset[str]) -> np.ndarray:
    """float64 matrix, one column per skyline dim, negated where maximized."""
    mats = []
    for c in cols:
        v = t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        mats.append(-v if c in maximize else v)
    return np.column_stack(mats)


def _sfs(M: np.ndarray) -> np.ndarray:
    """Indices (in input order) of the skyline rows of oriented M."""
    n = len(M)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(M.sum(axis=1), kind="stable")
    S = M[order]
    alive = np.ones(n, dtype=bool)
    keep: list[int] = []
    i = 0
    while i < n:
        if not alive[i]:
            i += 1
            continue
        keep.append(i)
        s = S[i]
        # s eliminates rows it strictly dominates: <= in all dims, < in one.
        tail = slice(i + 1, n)
        dom = (s <= S[tail]).all(axis=1) & (s < S[tail]).any(axis=1)
        alive[tail] &= ~dom
        i += 1
    return np.sort(order[np.array(keep, dtype=np.int64)])


def skyline(
    ds: "Dataset",
    cols: "list[str] | tuple[str, ...]",
    *,
    maximize: "Iterable[str]" = (),
) -> "Dataset":
    """Pareto frontier of ``ds`` over ``cols`` (minimized by default,
    names in ``maximize`` maximized). Returns the full surviving rows
    (all original columns). Rows with nulls in any skyline column are
    dropped (documented semantics above).
    """
    cols = list(cols)
    if not cols:
        raise ValueError("skyline needs at least one column")
    mx = frozenset(maximize)
    unknown = mx - set(cols)
    if unknown:
        raise ValueError(f"maximize names not in cols: {sorted(unknown)}")

    def local(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        mask = np.ones(t.num_rows, dtype=bool)
        for c in cols:
            arr = t.column(c)
            if arr.null_count:
                mask &= ~np.asarray(pa.compute.is_null(arr))
        if not mask.all():
            t = t.filter(pa.array(mask))
            if t.num_rows == 0:
                return t
        return t.take(pa.array(_sfs(_oriented(t, cols, mx))))

    # Local frontiers (map-side combine) -> one final merge over the
    # tiny candidate union. repartition(1) moves only survivors.
    return (
        ds.map_batches(
            local, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        .repartition(1)  # after repartition, batch_size=None = ONE full batch
        .map_batches(
            local, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )
