"""Count-Sketch (Charikar, Chen & Farach-Colton 2002) — signed,
UNBIASED token-frequency estimates plus an AMS-style second-moment
(F2 / self-join-size) estimator.

Complements the count-min sketch (``cms.py``): CMS is one-sided
(estimate >= true, error bound eps * F1), Count-Sketch is two-sided
and unbiased with error bound in the L2 norm —

    |median_j(g_j(x) * C[j, h_j(x)]) - true(x)| <= 3 * sqrt(F2 / width)

with probability >= 1 - delta for depth = O(log 1/delta) rows, where
F2 = sum_x true(x)^2.  On Zipfian token streams sqrt(F2) << F1, so the
same memory buys a much tighter bound than CMS.

Each row j additionally yields an AMS estimator of F2 itself:
sum_i C[j, i]^2 is unbiased for F2 with Var <= 2 * F2^2 / width
(Alon, Matias & Szegedy 1996 via the Count-Sketch bucketization of
Thorup & Zhang 2004); the median over rows concentrates it.  This is
the classic distributed self-join-size / skew estimator.

Merge = elementwise signed-counter sum, so arbitrary merge trees are
BIT-IDENTICAL to the single-pass sketch (asserted in tests) — the
mergeable-UDAF contract of ``base.Sketch``.  Reference analog: the
per-thread-partition build + the merge/serialize TODO slots of
``src/main.cpp:86,233-239``, as for every other family here.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, register

_U = np.uint64
_ROW_SALT = _U(0x9E3779B97F4A7C15)
_SIGN_SALT = _U(0xC6A4A7935BD1E995)

T_COUNTSKETCH = 10


@register(T_COUNTSKETCH)
class CountSketch(Sketch):
    NEEDS_MULTIPLICITY = True

    def __init__(
        self,
        width: int = 2048,
        depth: int = 7,
    ):
        self.width = int(width)
        self.depth = int(depth)
        if self.width < 8 or self.depth < 1 or self.depth > 16:
            raise ValueError("bad CountSketch shape")
        self.counts = np.zeros((self.depth, self.width), dtype=np.int64)
        self.total = 0

    def _row_idx(self, h: np.ndarray, j: int) -> np.ndarray:
        # same double-hashing scheme as the CMS rows, different salt
        h2 = splitmix64(h ^ _ROW_SALT) | _U(1)
        with np.errstate(over="ignore"):
            return ((h + _U(j) * h2) % _U(self.width)).astype(np.int64)

    def _row_sign(self, h: np.ndarray, j: int) -> np.ndarray:
        # independent stream: mix with a different salt BEFORE the row
        # offset so sign bits never correlate with bucket indices
        with np.errstate(over="ignore"):
            s = splitmix64((h ^ _SIGN_SALT) + _U(2 * j + 1) * _SIGN_SALT)
        return np.where((s >> _U(63)).astype(bool), np.int64(1), np.int64(-1))

    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> None:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        # collapse duplicates first (one np.add.at per row over uniques)
        uniq, inv_counts = np.unique(h, return_counts=True)
        if weights is not None:
            w = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(w, np.searchsorted(uniq, h), np.asarray(weights, dtype=np.int64))
        else:
            w = inv_counts.astype(np.int64)
        for j in range(self.depth):
            np.add.at(self.counts[j], self._row_idx(uniq, j), self._row_sign(uniq, j) * w)
        self.total += int(w.sum())

    def update_hash_counts(self, hashes, counts):
        self.update_hashes(hashes, weights=np.asarray(counts, dtype=np.int64))

    def estimate_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Unbiased point estimates: median over rows of sign * counter."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return np.empty(0, dtype=np.int64)
        per_row = np.empty((self.depth, h.size), dtype=np.int64)
        for j in range(self.depth):
            per_row[j] = self._row_sign(h, j) * self.counts[j][self._row_idx(h, j)]
        # median of an even row count averages the middle two — keep it
        # integral (round half away from zero) so estimates stay int64
        med = np.median(per_row, axis=0)
        return np.sign(med).astype(np.int64) * np.floor(np.abs(med) + 0.5).astype(np.int64)

    def estimate_f2(self) -> float:
        """AMS second-moment (self-join size) estimate: median over rows
        of the row's sum of squared counters."""
        row_f2 = (self.counts.astype(np.float64) ** 2).sum(axis=1)
        return float(np.median(row_f2))

    def error_bound(self) -> float:
        """Per-item additive error radius 3*sqrt(F2/width) (with the
        sketch's own F2 estimate standing in for the true F2)."""
        return 3.0 * math.sqrt(max(self.estimate_f2(), 0.0) / self.width)

    def estimate_inner(self, other: "CountSketch") -> float:
        """AGMS inner-product estimate <f, g> of the two sketched
        frequency vectors — the equi-join size |R join S| when each
        sketch absorbed one side's join-key stream (Alon, Gibbons,
        Matias & Szegedy PODS'99). Each row's dot product is unbiased
        with Var <= (F2(f)*F2(g) + <f,g>^2) / width; the median over
        rows concentrates it. Requires identical (width, depth) —
        same hash/sign streams by construction."""
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot inner-product CountSketch with different shapes")
        per_row = (self.counts.astype(np.float64) * other.counts.astype(np.float64)).sum(axis=1)
        return float(np.median(per_row))

    def inner_error_bound(self, other: "CountSketch") -> float:
        """3-sigma radius 3*sqrt(F2(f)*F2(g))/sqrt(width) on the
        inner-product estimate (sketch-estimated F2s stand in)."""
        return 3.0 * math.sqrt(
            max(self.estimate_f2(), 0.0) * max(other.estimate_f2(), 0.0) / self.width
        )

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (other.width, other.depth) != (self.width, self.depth):
            raise ValueError("cannot merge CountSketch with different shapes")
        self.counts += other.counts
        self.total += other.total
        return self

    def estimate(self) -> int:
        return self.total

    def _payload(self) -> bytes:
        head = struct.pack("<IIq", self.width, self.depth, self.total)
        return head + self.counts.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "CountSketch":
        width, depth, total = struct.unpack_from("<IIq", buf, 0)
        s = cls.__new__(cls)
        s.width, s.depth, s.total = width, depth, total
        s.counts = (
            np.frombuffer(buf, dtype=np.int64, offset=16).reshape(depth, width).copy()
        )
        return s
