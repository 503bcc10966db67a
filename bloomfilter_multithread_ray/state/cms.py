"""Count-min sketch (Cormode & Muthukrishnan 2005) for token frequency.

Guarantee: estimate >= true count, and estimate <= true + eps * total
with probability >= 1 - delta, for width = ceil(e/eps), depth =
ceil(ln(1/delta)). Merge = elementwise counter sum.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, T_CMS, register

_U = np.uint64
_ROW_SALT = _U(0xA24BAED4963EE407)


@register(T_CMS)
class CountMinSketch(Sketch):
    def __init__(
        self,
        eps: float = 1e-4,
        delta: float = 1e-3,
        *,
        width: int | None = None,
        depth: int | None = None,
    ):
        self.width = int(width if width is not None else math.ceil(math.e / eps))
        self.depth = int(depth if depth is not None else math.ceil(math.log(1.0 / delta)))
        if self.width < 8 or self.depth < 1 or self.depth > 16:
            raise ValueError("bad CMS shape")
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    @property
    def eps(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def _row_idx(self, h: np.ndarray, j: int) -> np.ndarray:
        h2 = splitmix64(h ^ _ROW_SALT) | _U(1)
        with np.errstate(over="ignore"):
            return ((h + _U(j) * h2) % _U(self.width)).astype(np.int64)

    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> None:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        # collapse duplicate hashes first: one np.add.at per row over
        # uniques instead of per raw item (big win on Zipfian batches)
        uniq, inv_counts = np.unique(h, return_counts=True)
        if weights is not None:
            w = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(w, np.searchsorted(uniq, h), np.asarray(weights, dtype=np.int64))
        else:
            w = inv_counts.astype(np.int64)
        for j in range(self.depth):
            np.add.at(self.counts[j], self._row_idx(uniq, j), w)
        self.total += int(w.sum())

    def update_hash_counts(self, hashes, counts):
        self.update_hashes(hashes, weights=np.asarray(counts, dtype=np.int64))

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Point estimates (min over rows) for a batch of item hashes."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return np.empty(0, dtype=np.int64)
        est = np.full(h.size, np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(self.depth):
            np.minimum(est, self.counts[j][self._row_idx(h, j)], out=est)
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge CMS with different shapes")
        self.counts += other.counts
        self.total += other.total
        return self

    def estimate(self) -> int:
        return self.total

    def _payload(self) -> bytes:
        head = struct.pack("<IIQ", self.width, self.depth, self.total)
        return head + self.counts.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "CountMinSketch":
        width, depth, total = struct.unpack_from("<IIQ", buf, 0)
        s = cls.__new__(cls)
        s.width, s.depth, s.total = width, depth, total
        s.counts = (
            np.frombuffer(buf, dtype=np.int64, offset=16).reshape(depth, width).copy()
        )
        return s
