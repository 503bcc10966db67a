"""Distributed data-quality validation — constraint checks as one
streaming pass plus rule-specific exchanges.

``check`` evaluates a rule list against a Dataset and returns one row
per rule: ``{rule, violations}``. Row-local rules (not_null / range /
accepted) fold in a SINGLE shared map pass — each batch emits one
tiny count row per rule, summed through ``grouped_agg``'s fixed-P
exchange, so a hundred column rules still read the data once.
``unique`` adds one key-hash shuffle of the candidate key columns
(counting rows in groups of size > 1); ``foreign_key`` adds one anti
hash-join against the referenced keys (``broadcast="auto"``: small
dimension tables broadcast, big ones shuffle). Null FK values are NOT
violations (SQL REFERENCES semantics); null uniqueness keys group
together like GROUP BY.

Rules (tuples):
  ("not_null", col)
  ("range", col, lo, hi)            # inclusive; None = unbounded side
  ("accepted", col, [values])       # null counts as a violation
  ("unique", [cols])                # rows participating in duplicates
  ("foreign_key", col, ref_ds, ref_col)
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    from ray.data import Dataset


def _label(rule) -> str:
    kind = rule[0]
    if kind == "unique":
        return f"unique({','.join(rule[1])})"
    if kind == "foreign_key":
        return f"foreign_key({rule[1]}->{rule[3]})"
    if kind == "range":
        return f"range({rule[1]},{rule[2]},{rule[3]})"
    return f"{kind}({rule[1]})"


def check(
    ds: "Dataset",
    rules: list[tuple],
    *,
    num_partitions: int = 16,
) -> pd.DataFrame:
    """Evaluate ``rules`` → DataFrame {rule, violations}, rule-sorted."""
    import pyarrow.compute as pc

    from .agg import grouped_agg
    from .join import hash_join

    local = [r for r in rules if r[0] in ("not_null", "range", "accepted")]
    uniques = [r for r in rules if r[0] == "unique"]
    fks = [r for r in rules if r[0] == "foreign_key"]
    bad = [r for r in rules if r[0] not in
           ("not_null", "range", "accepted", "unique", "foreign_key")]
    if bad:
        raise ValueError(f"unknown rule kinds: {[r[0] for r in bad]}")

    results: dict[str, int] = {}

    if local:
        need = sorted({r[1] for r in local})

        def fold(t: pa.Table) -> pa.Table:
            labels, counts = [], []
            for r in local:
                col = t.column(r[1])
                if r[0] == "not_null":
                    n = col.null_count
                elif r[0] == "range":
                    _k, c, lo, hi = r
                    ok = pa.array(np.ones(len(col), bool))
                    if lo is not None:
                        ok = pc.and_(ok, pc.greater_equal(col, pa.scalar(lo)))
                    if hi is not None:
                        ok = pc.and_(ok, pc.less_equal(col, pa.scalar(hi)))
                    # null comparisons are null -> treated as violations
                    n = len(col) - pc.sum(pc.fill_null(ok, False)).as_py()
                else:  # accepted
                    ok = pc.fill_null(
                        pc.is_in(col, value_set=pa.array(r[2])), False
                    )
                    n = len(col) - pc.sum(ok).as_py()
                labels.append(_label(r))
                counts.append(int(n))
            return pa.table(
                {"rule": pa.array(labels, pa.string()),
                 "n": pa.array(counts, pa.int64())}
            )

        folded = grouped_agg(
            ds.select_columns(need).map_batches(
                fold, batch_format="pyarrow", zero_copy_batch=True
            ),
            "rule",
            {"violations": ("sum", "n")},
            num_partitions=4,
        ).to_pandas()
        for _, row in folded.iterrows():
            results[row["rule"]] = int(row["violations"])
        for r in local:  # empty dataset: zero rows folded
            results.setdefault(_label(r), 0)

    for r in uniques:
        cols = list(r[1])
        sizes = grouped_agg(
            ds.select_columns(cols),
            cols,
            {"n": ("count", None)},
            num_partitions=num_partitions,
        )

        def dups(t: pa.Table) -> pa.Table:
            n = t.column("n")
            mask = pc.greater(n, pa.scalar(1))
            return pa.table(
                {"v": pa.array(
                    [pc.sum(pc.if_else(mask, n, pa.scalar(0, pa.int64())))
                     .as_py() or 0],
                    pa.int64(),
                )}
            )

        v = sizes.map_batches(
            dups, batch_format="pyarrow", zero_copy_batch=True
        ).sum("v")
        results[_label(r)] = int(v or 0)

    for r in fks:
        _k, col, ref_ds, ref_col = r

        def nonnull(t: pa.Table, c=col) -> pa.Table:
            x = t.column(c)
            return t.filter(pc.is_valid(x))

        orphans = hash_join(
            ds.select_columns([col]).map_batches(
                nonnull, batch_format="pyarrow", zero_copy_batch=True
            ),
            ref_ds.select_columns([ref_col]),
            on=col,
            right_on=ref_col,
            how="anti",
            num_partitions=num_partitions,
            broadcast="auto",
        )
        results[_label(r)] = int(orphans.count())

    out = pd.DataFrame(
        {"rule": sorted(results), "violations": [results[k] for k in sorted(results)]}
    )
    out["violations"] = out["violations"].astype(np.int64)
    return out
