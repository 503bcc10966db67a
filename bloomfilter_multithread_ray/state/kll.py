"""KLL quantile sketch (Karnin, Lang, Liberty 2016).

Compactor-hierarchy sketch: level h stores items with weight 2^h;
compaction sorts a full level and promotes every other item (random
parity) to level h+1. Rank error is O(1/k) with high probability.
Deterministic per-instance RNG (seeded from a fixed constant + a
compaction counter) keeps runs reproducible; merge = level-wise
concatenation + recompaction.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, T_KLL, register

_C = 2.0 / 3.0  # capacity decay


@register(T_KLL)
class KLL(Sketch):
    def __init__(self, k: int = 200, seed: int = 0x6B6C6C):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.seed = int(seed)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._compactions = 0
        self.min = np.inf
        self.max = -np.inf

    # -- capacities -------------------------------------------------------
    def _capacity(self, h: int) -> int:
        depth = len(self.levels) - 1 - h
        return max(2, int(np.ceil(self.k * (_C**depth))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.levels)))

    # -- updates ----------------------------------------------------------
    def update_values(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += v.size
        self._maybe_compact()

    def _maybe_compact(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_capacity():
            for h in range(len(self.levels)):
                if len(self.levels[h]) > self._capacity(h):
                    self._compact_level(h)
                    break
            else:
                break

    def _compact_level(self, h: int) -> None:
        lv = np.sort(self.levels[h])
        rng = np.random.default_rng(self.seed + self._compactions)
        self._compactions += 1
        start = int(rng.integers(0, 2))
        promoted = lv[start::2]
        self.levels[h] = np.empty(0, dtype=np.float64)
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    # -- queries ----------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, lv in enumerate(self.levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), float(1 << h)))
        if not vals:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float | np.ndarray):
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        v, w = self._weighted_items()
        if v.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if np.isscalar(q) else out
        cum = np.cumsum(w)
        targets = qs * cum[-1]
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.clip(idx, 0, v.size - 1)
        out = np.clip(v[idx], self.min, self.max)
        return float(out[0]) if np.isscalar(q) else out

    def rank(self, x: float) -> float:
        """Approximate normalized rank of x."""
        v, w = self._weighted_items()
        if v.size == 0:
            return float("nan")
        cum = np.cumsum(w)
        i = int(np.searchsorted(v, x, side="right"))
        return float(cum[i - 1] / cum[-1]) if i > 0 else 0.0

    def estimate(self, q: float = 0.5):
        return self.quantile(q)

    # -- merge / serialize -------------------------------------------------
    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("cannot merge KLL with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other.levels):
            if len(lv):
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self._maybe_compact()
        return self

    def _payload(self) -> bytes:
        head = struct.pack(
            "<IqqQddI",
            self.k,
            self.n,
            self._compactions,
            self.seed & 0xFFFFFFFFFFFFFFFF,
            self.min,
            self.max,
            len(self.levels),
        )
        parts = [head]
        for lv in self.levels:
            parts.append(struct.pack("<q", len(lv)))
            parts.append(lv.tobytes())
        return b"".join(parts)

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "KLL":
        k, n, compactions, seed, mn, mx, n_levels = struct.unpack_from("<IqqQddI", buf, 0)
        s = cls(k, seed)
        s.n, s._compactions, s.min, s.max = n, compactions, mn, mx
        off = struct.calcsize("<IqqQddI")
        s.levels = []
        for _ in range(n_levels):
            (ln,) = struct.unpack_from("<q", buf, off)
            off += 8
            s.levels.append(np.frombuffer(buf, dtype=np.float64, offset=off, count=ln).copy())
            off += 8 * ln
        return s
