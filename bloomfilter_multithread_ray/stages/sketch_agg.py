"""Generic mergeable-sketch aggregation for Ray Data.

``SketchAgg`` adapts any :class:`~..state.base.Sketch` family to
``Dataset.aggregate`` / ``groupby(...).aggregate`` via
``AggregateFnV2``: per-block partial sketch (vectorized update over
the block's column) → tree merge (``combine``) → serialized bytes.
This is the Ray Data realization of the reference's
build-one-filter-per-partition loop (``splitIntoBF``,
``src/SkmerSplitter.cpp:62-89``) with the merge/serialize slots the
reference left as TODO (``src/main.cpp:233-239``) made first-class.

Accumulators travel as ``bytes`` (Arrow binary-friendly, and the
serialization round-trip is itself under test).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFnV2

from ..state.base import Sketch, deserialize_sketch


class SketchAgg(AggregateFnV2):
    """Aggregate a column into a serialized sketch.

    Args:
        factory: zero-sketch constructor, e.g. ``lambda: BloomFilter(1<<20, 4)``.
        on: column holding uint64 hashes (item sketches) or numeric
            values (value sketches).
        kind: "hashes" → ``update_hashes``; "values" → ``update_values``.
        alias_name: output column name (default "sketch").
    """

    def __init__(
        self,
        factory: Callable[[], Sketch],
        on: str,
        *,
        kind: str = "hashes",
        alias_name: str = "sketch",
    ):
        if kind not in ("hashes", "values"):
            raise ValueError("kind must be 'hashes' or 'values'")
        self._factory = factory
        self._kind = kind
        self._on_col = on
        super().__init__(name=alias_name, zero_factory=lambda: None, on=on, ignore_nulls=True)

    def aggregate_block(self, block: pa.Table) -> bytes:
        col = block.column(self._on_col)
        s = self._factory()
        if self._kind == "hashes":
            arr = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
            s.update_hashes(arr)
        else:
            arr = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            s.update_values(arr)
        return s.serialize()

    def combine(self, current: bytes | None, new: bytes | None) -> bytes | None:
        if current is None:
            return new
        if new is None:
            return current
        a = deserialize_sketch(current)
        a.merge(deserialize_sketch(new))
        return a.serialize()

    def finalize(self, accumulator: bytes | None) -> bytes | None:
        return accumulator


def sketch_rows_to_dict(rows, key: str = "part", value: str = "sketch") -> dict:
    """[{part, sketch}, ...] → {part: Sketch} (deserialized)."""
    return {r[key]: deserialize_sketch(r[value]) for r in rows}
