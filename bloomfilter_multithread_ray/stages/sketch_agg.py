"""Generic mergeable-sketch aggregation for Ray Data.

``SketchAgg`` adapts any :class:`~..state.base.Sketch` family to
``Dataset.aggregate`` / ``groupby(...).aggregate`` via
``AggregateFnV2``: per-block partial sketch (vectorized update over
the block's column) → tree merge (``combine``) → serialized bytes.
This is the Ray Data realization of the reference's
build-one-filter-per-partition loop (``splitIntoBF``,
``src/SkmerSplitter.cpp:62-89``) with the merge/serialize slots the
reference left as TODO (``src/main.cpp:233-239``) made first-class.

Accumulators are live objects (sparse hash chunks or a Sketch) while
inside one combine chain and serialize to the compact binary format
only when crossing task boundaries (pickle) or at finalize — a dense
Bloom is ~0.5 MB, and a reduce chain touches its accumulator
O(blocks) times, so byte round-trips per combine would dominate the
build (measured 3-4x slowdown at 32 cpus).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ray.data.aggregate import AggregateFnV2

from ..state.base import Sketch, deserialize_sketch


_SPARSE_MAGIC = b"SPH1"  # sparse partial: (uint64 hashes, int64 counts)
_SPARSE_RAW_MAGIC = b"SPH2"  # sparse partial: raw uint64 hashes, dups allowed


def _sparse_blob(hashes: np.ndarray, counts: np.ndarray) -> bytes:
    return _SPARSE_MAGIC + np.uint64(len(hashes)).tobytes() + hashes.tobytes() + counts.tobytes()


def _sparse_raw_blob(hashes: np.ndarray) -> bytes:
    return _SPARSE_RAW_MAGIC + hashes.tobytes()


def _sparse_parse(blob) -> tuple[np.ndarray, np.ndarray | None]:
    mv = memoryview(blob)
    if bytes(mv[:4]) == _SPARSE_RAW_MAGIC:
        return np.frombuffer(mv[4:], dtype=np.uint64), None
    n = int(np.frombuffer(mv[4:12], dtype=np.uint64)[0])
    hashes = np.frombuffer(mv[12 : 12 + 8 * n], dtype=np.uint64)
    counts = np.frombuffer(mv[12 + 8 * n : 12 + 16 * n], dtype=np.int64)
    return hashes, counts


def _is_sparse(blob) -> bool:
    return bytes(blob[:4]) in (_SPARSE_MAGIC, _SPARSE_RAW_MAGIC)


class SketchAgg(AggregateFnV2):
    """Aggregate a column into a serialized sketch.

    Map-side partials are SPARSE while small: a block's contribution to
    one group travels as deduplicated ``(hash, count)`` pairs and is
    densified into a real sketch only once the pairs outgrow the dense
    serialization (or at finalize). This keeps the per-(block, group)
    cost O(unique hashes) instead of O(sketch bytes) — without it a
    4-Mbit Bloom would be allocated and serialized once per block per
    partition (SURVEY §7 "the aggregate does the flushing": the
    combine tree, not the actors, owns densification).

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
        self._dense_bytes: int | None = None
        self._mult: bool | None = None
        super().__init__(name=alias_name, zero_factory=lambda: None, on=on, ignore_nulls=True)

    def _dense_threshold(self) -> int:
        if self._dense_bytes is None:
            self._dense_bytes = len(self._factory().serialize())
        return self._dense_bytes

    def _needs_mult(self) -> bool:
        if self._mult is None:
            self._mult = bool(getattr(self._factory(), "NEEDS_MULTIPLICITY", True))
        return self._mult

    # Accumulator states (never round-tripped through bytes between
    # combines — a dense Bloom is ~0.5 MB and a reduce chain touches it
    # O(blocks) times; serialization happens once, at finalize):
    #   None                      — zero
    #   ("s", [h arrays], [c arrays] | None, total_len)  — lazy sparse
    #       pairs; counts None = set-semantics raw hashes (dups allowed)
    #   Sketch instance           — dense (mutated in place)
    # Cross-task transport works because tuples of numpy arrays pickle
    # cheaply and Sketch.__reduce__ reuses the compact binary format.

    def _to_acc(self, blob):
        if blob is None or isinstance(blob, Sketch) or (
            isinstance(blob, tuple) and blob and blob[0] == "s"
        ):
            return blob
        if _is_sparse(blob):
            h, c = _sparse_parse(blob)
            return ("s", [h], None if c is None else [c], len(h))
        return deserialize_sketch(blob)

    def _apply_sparse(self, s: Sketch, hs, cs) -> Sketch:
        if cs is None:
            s.update_hashes(np.concatenate(hs))
        else:
            s.update_hash_counts(np.concatenate(hs), np.concatenate(cs))
        return s

    def _densify_acc(self, acc) -> Sketch:
        return self._apply_sparse(self._factory(), acc[1], acc[2])

    def aggregate_block(self, block: pa.Table):
        col = block.column(self._on_col)
        if col.null_count:
            # AggregateFnV2's null-safety wraps accumulators, not blocks:
            # without this a null would round-trip to NaN -> a garbage
            # uint64 item / a NaN value inside the sketch
            col = col.drop_null()
        if self._kind == "values":
            s = self._factory()
            arr = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            s.update_values(arr)
            return s
        arr = col.to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        if not self._needs_mult():
            # set semantics: ship raw hashes, no dedup/sort needed
            if 8 * len(arr) < self._dense_threshold():
                return ("s", [arr], None, len(arr))
            s = self._factory()
            s.update_hashes(arr)
            return s
        uniq, counts = np.unique(arr, return_counts=True)
        if 16 * len(uniq) < self._dense_threshold():
            return ("s", [uniq], [counts.astype(np.int64)], len(uniq))
        s = self._factory()
        s.update_hash_counts(uniq, counts.astype(np.int64))
        return s

    @staticmethod
    def _merge_counts(a, b, na, nb):
        """Merge two sparse counts-lists, expanding None (raw) sides."""
        if a is None and b is None:
            return None
        if a is None:
            a = [np.ones(n, dtype=np.int64) for n in na]
        if b is None:
            b = [np.ones(n, dtype=np.int64) for n in nb]
        return a + b

    def combine(self, current, new):
        current, new = self._to_acc(current), self._to_acc(new)
        if current is None:
            return new
        if new is None:
            return current
        cs = isinstance(current, tuple)
        ns = isinstance(new, tuple)
        if cs and ns:
            hs = current[1] + new[1]
            cnts = self._merge_counts(
                current[2], new[2],
                [len(h) for h in current[1]], [len(h) for h in new[1]],
            )
            total = current[3] + new[3]
            width = 8 if cnts is None else 16
            # duplicate hashes across chunks are fine: the apply path
            # has multiset semantics, so dedup can wait until densify
            if width * total < self._dense_threshold():
                return ("s", hs, cnts, total)
            return self._densify_acc(("s", hs, cnts, total))
        if cs or ns:
            dense = new if cs else current
            sp = current if cs else new
            return self._apply_sparse(dense, sp[1], sp[2])
        return current.merge(new)

    def finalize(self, accumulator) -> bytes | None:
        acc = self._to_acc(accumulator)
        if acc is None:
            return None
        if isinstance(acc, tuple):
            acc = self._densify_acc(acc)
        return acc.serialize()


def sketch_rows_to_dict(rows, key: str = "part", value: str = "sketch") -> dict:
    """[{part, sketch}, ...] → {part: Sketch} (deserialized)."""
    return {r[key]: deserialize_sketch(r[value]) for r in rows}


def make_partial_combiner(factory: Callable[[], Sketch], on: str = "gh"):
    """{part, gh} batch → {part, partial} — the explicit map-side combine.

    Collapses a whole block to at most one sparse/dense partial per
    partition BEFORE the groupby, so the all-to-all moves
    O(blocks × partitions) blob rows instead of O(items) hash rows —
    the Ray Data analog of the reference's per-thread local filters
    (``src/main.cpp:86``): pre-aggregate where the data already is,
    shuffle only the aggregates.
    """
    helper = SketchAgg(factory, on=on)

    def from_arrays(part: np.ndarray, gh: np.ndarray) -> pa.Table:
        order = np.argsort(part, kind="stable")
        part_s, gh_s = part[order], gh[order]
        bounds = np.flatnonzero(np.diff(part_s, prepend=part_s[0] - 1)) if len(part_s) else []
        need_mult = helper._needs_mult()
        parts, blobs = [], []
        for i, start in enumerate(bounds):
            end = bounds[i + 1] if i + 1 < len(bounds) else len(part_s)
            seg = gh_s[start:end]
            if not need_mult:
                # set semantics: raw hashes, half the bytes, no sort
                if 8 * len(seg) < helper._dense_threshold():
                    blobs.append(_sparse_raw_blob(seg))
                else:
                    s = factory()
                    s.update_hashes(seg)
                    blobs.append(s.serialize())
                parts.append(part_s[start])
                continue
            uniq, counts = np.unique(seg, return_counts=True)
            counts = counts.astype(np.int64)
            if 16 * len(uniq) < helper._dense_threshold():
                blobs.append(_sparse_blob(uniq, counts))
            else:
                s = factory()
                s.update_hash_counts(uniq, counts)
                blobs.append(s.serialize())
            parts.append(part_s[start])
        return pa.table(
            {"part": pa.array(np.array(parts, dtype=part.dtype)),
             "partial": pa.array(blobs, pa.binary())}
        )

    def fn(batch: pa.Table) -> pa.Table:
        part = batch.column("part").to_numpy(zero_copy_only=False)
        gh = batch.column(on).to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
        return from_arrays(part, gh)

    fn.from_arrays = from_arrays  # array-level entry for fused stages
    return fn


class PartialMergeAgg(SketchAgg):
    """Merge a column of sparse/dense partial blobs into one sketch."""

    def __init__(self, factory: Callable[[], Sketch], on: str = "partial",
                 alias_name: str = "sketch"):
        super().__init__(factory, on, kind="hashes", alias_name=alias_name)

    def aggregate_block(self, block: pa.Table) -> bytes | None:
        acc: bytes | None = None
        for blob in block.column(self._on_col):
            acc = self.combine(acc, blob.as_py())
        return acc
