"""Bottom-k (KMV) sketch: mergeable uniform distinct-sample + distinct
estimator (Bar-Yossef et al. 2002 "Counting distinct elements in a data
stream"; Beyer et al. 2007 KMV).

Keeps the k smallest item hashes. Because the hash order is uniform and
content-derived, the kept set is (a) a uniform sample over DISTINCT
items, deterministic across runs and partitionings, and (b) a
cardinality estimator: E[distinct] ~ (k-1) / kth_min_normalized.
Merge = k smallest of the union — associative/commutative, so it runs
through the same SketchAgg machinery as the other families.

Item recovery: update_hashes receives splitmix64-mixed ids; splitmix64's
finalizer is a bijection on uint64, so sample_ids() inverts it to give
back the original ids — no second column needed through the shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, register

_U = np.uint64
T_KMV = 7

# modular inverses of the splitmix64 multipliers (mod 2^64)
_INV_M1 = _U(0x96DE1B173F119089)
_INV_M2 = _U(0x319642B2D24D8EC3)
_GAMMA = _U(0x9E3779B97F4A7C15)


def inverse_splitmix64(z: np.ndarray) -> np.ndarray:
    """Exact inverse of :func:`..functions.hashing.splitmix64`."""
    z = np.asarray(z, dtype=_U)
    with np.errstate(over="ignore"):
        z = z ^ (z >> _U(31)) ^ (z >> _U(62))
        z = (z * _INV_M2).astype(_U)
        z = z ^ (z >> _U(27)) ^ (z >> _U(54))
        z = (z * _INV_M1).astype(_U)
        z = z ^ (z >> _U(30)) ^ (z >> _U(60))
        z = (z - _GAMMA).astype(_U)
    return z


@register(T_KMV)
class BottomKSample(Sketch):
    """k smallest distinct hashes — uniform distinct sample + KMV count."""

    NEEDS_MULTIPLICITY = False

    def __init__(self, k: int = 256):
        if not 8 <= k <= 1 << 20:
            raise ValueError("k must be in [8, 2^20]")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=_U)

    def update_hashes(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=_U)
        if h.size == 0:
            return
        merged = np.unique(np.concatenate([self.hashes, h]))
        self.hashes = merged[: self.k]

    def update_items(self, ids: np.ndarray) -> None:
        """Convenience: mix raw int ids before sampling."""
        self.update_hashes(splitmix64(np.asarray(ids).astype(_U)))

    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if other.k != self.k:
            raise ValueError("cannot merge BottomK sketches with different k")
        self.update_hashes(other.hashes)
        return self

    def sample_hashes(self) -> np.ndarray:
        return self.hashes.copy()

    def sample_ids(self) -> np.ndarray:
        """Original ids of the sample (splitmix64 inverted) as int64."""
        return inverse_splitmix64(self.hashes).view(np.int64)

    def estimate(self) -> float:
        """Distinct-count estimate: exact below k, KMV at capacity."""
        n = len(self.hashes)
        if n < self.k:
            return float(n)
        kth = float(self.hashes[self.k - 1]) / float(1 << 64)
        return (self.k - 1) / kth

    def rel_error(self) -> float:
        return 1.0 / np.sqrt(self.k - 2) if self.k > 2 else 1.0

    def _payload(self) -> bytes:
        head = struct.pack("<II", self.k, len(self.hashes))
        return head + self.hashes.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "BottomKSample":
        k, n = struct.unpack_from("<II", buf, 0)
        s = cls.__new__(cls)
        s.k = k
        s.hashes = np.frombuffer(buf, dtype=_U, offset=8, count=n).copy()
        return s
