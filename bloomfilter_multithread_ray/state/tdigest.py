"""Merging t-digest (Dunning & Ertl 2019) for quantiles over n_tok.

k1 scale function (asin-based) with a q-limit merge pass; tracks exact
min/max for tail accuracy. Merge = concatenate centroids + re-compress
(associative up to the digest's rank-error bound, which is what the
property tests assert — bitwise associativity is not a t-digest
property).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, T_TDIGEST, register

_TWO_PI = 2.0 * np.pi


@register(T_TDIGEST)
class TDigest(Sketch):
    def __init__(self, compression: float = 200.0, buffer_size: int = 4096):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        self.buffer_size = int(buffer_size)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []  # (value, weight) pairs, unmerged
        self._buf_n = 0
        self.min = np.inf
        self.max = -np.inf
        self.total = 0.0

    # -- scale function ---------------------------------------------------
    def _qlimit(self, q0: float) -> float:
        # k1(q) = delta/(2pi) asin(2q-1); next limit = k^{-1}(k(q0)+1)
        k = self.compression / _TWO_PI * np.arcsin(2.0 * min(max(q0, 0.0), 1.0) - 1.0)
        return float((np.sin(min((k + 1.0) * _TWO_PI / self.compression, np.pi / 2)) + 1.0) / 2.0)

    # -- updates ----------------------------------------------------------
    def update_values(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        finite = ~np.isnan(v)
        v = v[finite]
        if v.size == 0:
            return
        w = (
            np.ones_like(v)
            if weights is None
            # filter weights with the SAME mask so pairs stay aligned
            else np.asarray(weights, dtype=np.float64).ravel()[finite]
        )
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.total += float(w.sum())
        self._buf.append(np.stack([v, w]))
        self._buf_n += v.size
        if self._buf_n >= self.buffer_size:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            bv = np.concatenate([b[0] for b in self._buf])
            bw = np.concatenate([b[1] for b in self._buf])
            means = np.concatenate([self.means, bv])
            weights = np.concatenate([self.weights, bw])
            self._buf, self._buf_n = [], 0
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())

        out_m: list[float] = []
        out_w: list[float] = []
        cur_m, cur_w = float(means[0]), float(weights[0])
        w_before = 0.0
        qlimit = self._qlimit(0.0)
        for i in range(1, means.size):
            m, w = float(means[i]), float(weights[i])
            if (w_before + cur_w + w) / total <= qlimit:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_before += cur_w
                qlimit = self._qlimit(w_before / total)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # -- queries ----------------------------------------------------------
    def quantile(self, q: float | np.ndarray):
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(qs.shape, np.nan)
            return float(out[0]) if np.isscalar(q) else out
        m, w = self.means, self.weights
        total = float(w.sum())
        if m.size == 1:
            out = np.full(qs.shape, m[0])
        else:
            # centroid i sits at cumulative position cum_i - w_i/2
            centers = np.cumsum(w) - w / 2.0
            targets = qs * total
            out = np.interp(targets, centers, m, left=self.min, right=self.max)
        out = np.clip(out, self.min, self.max)
        return float(out[0]) if np.isscalar(q) else out

    def estimate(self, q: float = 0.5):
        return self.quantile(q)

    def cdf(self, x: "float | np.ndarray"):
        """Approximate CDF (the quantile inverse): piecewise-linear
        interpolation of cumulative weight at the centroid centers
        (cum_i - w_i/2), normalized by total weight; x below the exact
        min -> 0, above the exact max -> 1, clipped to [0, 1]. Pinned
        convention shared bitwise with the from-spec twin in
        tests/independent_pipelines.py."""
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            out = np.full(xs.shape, np.nan)
            return float(out[0]) if np.isscalar(x) else out
        m, w = self.means, self.weights
        total = float(w.sum())
        centers = np.cumsum(w) - w / 2.0
        out = np.interp(xs, m, centers) / total
        out[xs < self.min] = 0.0
        out[xs > self.max] = 1.0
        out = np.clip(out, 0.0, 1.0)
        return float(out[0]) if np.isscalar(x) else out

    # -- merge / serialize -------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if other.means.size:
            self._buf.append(np.stack([other.means, other.weights]))
            self._buf_n += other.means.size
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.total += other.total
        self._compress()
        return self

    def _payload(self) -> bytes:
        self._compress()
        head = struct.pack(
            "<ddddq", self.compression, self.min, self.max, self.total, self.means.size
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "TDigest":
        compression, mn, mx, total, n = struct.unpack_from("<ddddq", buf, 0)
        s = cls(compression)
        s.min, s.max, s.total = mn, mx, total
        off = 40
        s.means = np.frombuffer(buf, dtype=np.float64, offset=off, count=n).copy()
        s.weights = np.frombuffer(buf, dtype=np.float64, offset=off + 8 * n, count=n).copy()
        return s
