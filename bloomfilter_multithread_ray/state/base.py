"""Uniform mergeable-UDAF contract for all sketches.

The reference holds one ``bm::bvector<>`` Bloom filter per worker
thread (``src/main.cpp:86``) and never serializes or merges them (the
serializer slot is an unimplemented TODO, ``src/main.cpp:233-239``).
Here every sketch is a first-class mergeable value:

    update_hashes(uint64[]) / update_values(float[])   # vectorized
    merge(other)                                       # assoc + comm
    estimate(...)                                      # family-specific
    serialize() -> bytes / deserialize(bytes)          # Arrow `binary`

which is exactly what lets the Ray Data plan treat sketch build as an
``AggregateFnV2`` (per-block partial -> tree merge) and sketch state as
data-plane rows instead of shared memory.

Binary format: 5-byte header ``b"SKB1" + type_code`` then a
family-specific payload (struct-packed params + raw numpy buffers).
"""

from __future__ import annotations

import abc

import numpy as np

MAGIC = b"SKB1"

# type codes (stable across versions — part of the on-disk format)
T_BLOOM = 1
T_HLL = 2
T_CMS = 3
T_TDIGEST = 4
T_KLL = 5
T_MINHASH = 6

_REGISTRY: dict[int, type["Sketch"]] = {}


def register(code: int):
    def deco(cls):
        cls.TYPE_CODE = code
        _REGISTRY[code] = cls
        return cls

    return deco


class Sketch(abc.ABC):
    """Base class for mergeable sketches."""

    TYPE_CODE: int = 0
    # False => duplicate hashes are harmless (set semantics); lets the
    # aggregation layer ship raw hash arrays without (hash, count)
    # dedup — half the shuffle bytes and no per-block unique/sort
    NEEDS_MULTIPLICITY: bool = True

    def update_hashes(self, hashes: np.ndarray) -> None:
        """Absorb a batch of pre-hashed uint64 items (vectorized).

        Implemented by item sketches (Bloom, HLL, CMS, MinHash).
        """
        raise NotImplementedError(f"{type(self).__name__} is not an item sketch")

    def update_values(self, values: np.ndarray) -> None:
        """Absorb a batch of numeric values (vectorized).

        Implemented by value sketches (TDigest, KLL).
        """
        raise NotImplementedError(f"{type(self).__name__} is not a value sketch")

    def update_hash_counts(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        """Absorb pre-deduplicated (hash, multiplicity) pairs.

        Semantics identical to ``update_hashes(np.repeat(hashes,
        counts))`` — the default does exactly that; set-semantics and
        counting sketches override with O(unique) versions. This is the
        replay path for SketchAgg's sparse map-side partials.
        """
        self.update_hashes(np.repeat(hashes, counts))

    @abc.abstractmethod
    def merge(self, other: "Sketch") -> "Sketch":
        """In-place merge (associative + commutative); returns self."""

    @abc.abstractmethod
    def _payload(self) -> bytes: ...

    @classmethod
    @abc.abstractmethod
    def _from_payload(cls, buf: memoryview) -> "Sketch": ...

    def serialize(self) -> bytes:
        return MAGIC + bytes([self.TYPE_CODE]) + self._payload()

    def __reduce__(self):
        # cloudpickle/pickle path (AggregateFnV2 accumulators) reuses
        # the compact binary format.
        return (deserialize_sketch, (self.serialize(),))


def deserialize_sketch(buf: bytes) -> Sketch:
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not a SKB1 sketch blob")
    code = buf[4]
    cls = _REGISTRY.get(code)
    if cls is None:
        raise ValueError(f"unknown sketch type code {code}")
    return cls._from_payload(memoryview(buf)[5:])
