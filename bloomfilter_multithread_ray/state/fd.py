"""Frequent Directions matrix sketch (Liberty KDD'13; Ghashami,
Liberty, Phillips & Woodruff SICOMP'16) — streaming covariance / PCA
over an embedding stream in O(ell * d) memory.

The sketch maintains B (<= ell nonzero rows, d columns) such that

    0  <=  x' (A'A - B'B) x  <=  delta_sum * ||x||^2      for all x,
    delta_sum <= 2 * ||A||_F^2 / ell

where A is the (never materialized) row-stacked input matrix: every
buffer-full event runs one thin SVD and shrinks all squared singular
values by the (ell+1)-th, accumulating that shrink into ``delta_sum``
— the sketch carries its OWN spectral error certificate (asserted
against dense numpy in tests).

MERGEABLE (SICOMP'16 Thm 7): merging by inserting the other sketch's
rows and summing the two ``delta_sum``s preserves the certificate
under arbitrary merge trees, which is exactly the ``base.Sketch``
UDAF contract — per-block partial FD -> ``PartialMergeAgg`` tree
merge, like the Misra-Gries family.

For PCA the sketch additionally tracks the exact mergeable first
moment (column sums + row count), so the centered covariance estimate
is (B'B - n*mu*mu') / n with the same additive spectral error
delta_sum / n. Reference analog: the per-thread partition state +
merge TODO of ``src/main.cpp:86,233-239`` applied to matrices.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, register

T_FD = 11


@register(T_FD)
class FrequentDirections(Sketch):
    NEEDS_MULTIPLICITY = True

    def __init__(self, ell: int = 64, d: int | None = None):
        if ell < 2:
            raise ValueError("FrequentDirections: ell must be >= 2")
        self.ell = int(ell)
        self.d = None if d is None else int(d)
        self.B: np.ndarray | None = None  # (2*ell, d) float64
        self.rows_used = 0
        self.n = 0  # input rows seen
        self.frob2 = 0.0  # ||A||_F^2
        self.delta_sum = 0.0  # accumulated spectral shrink
        self.colsum: np.ndarray | None = None  # (d,) exact column sums

    # ------------------------------------------------------------ core
    def _ensure(self, d: int) -> None:
        if self.d is None:
            self.d = int(d)
        elif self.d != d:
            raise ValueError(f"FD width mismatch: sketch d={self.d}, rows d={d}")
        if self.B is None:
            self.B = np.zeros((2 * self.ell, self.d), dtype=np.float64)
            self.colsum = np.zeros(self.d, dtype=np.float64)

    def _shrink(self) -> None:
        # thin SVD of the filled buffer; subtract the (ell+1)-th squared
        # singular value from all, dropping the tail to zero rows
        _, s, vt = np.linalg.svd(self.B[: self.rows_used], full_matrices=False)
        s2 = s * s
        if len(s2) > self.ell:
            delta = float(s2[self.ell])
        else:
            delta = 0.0
        if delta > 0.0:
            self.delta_sum += delta
        keep = np.sqrt(np.clip(s2[: self.ell] - delta, 0.0, None))
        nz = int((keep > 0.0).sum())
        self.B[:] = 0.0
        if nz:
            self.B[:nz] = keep[:nz, None] * vt[:nz]
        self.rows_used = nz

    def _insert(self, m: np.ndarray) -> None:
        """Append rows (no moment bookkeeping) with shrink-on-full."""
        if m.size == 0:
            return
        self._ensure(m.shape[1])
        cap = self.B.shape[0]
        i = 0
        while i < len(m):
            free = cap - self.rows_used
            take = min(free, len(m) - i)
            self.B[self.rows_used : self.rows_used + take] = m[i : i + take]
            self.rows_used += take
            i += take
            if self.rows_used == cap:
                self._shrink()

    def update_rows(self, m: np.ndarray) -> None:
        """Absorb a (n, d) block of float vectors (vectorized)."""
        m = np.ascontiguousarray(m, dtype=np.float64)
        if m.ndim != 2:
            raise ValueError("update_rows expects a 2-D block")
        if m.size == 0:
            return
        self._ensure(m.shape[1])
        self.n += len(m)
        self.frob2 += float((m * m).sum())
        self.colsum += m.sum(axis=0)
        self._insert(m)

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if other.ell != self.ell:
            raise ValueError("cannot merge FD sketches with different ell")
        if other.B is not None:
            self._insert(other.B[: other.rows_used])
            self.colsum += other.colsum
        self.n += other.n
        self.frob2 += other.frob2
        self.delta_sum += other.delta_sum
        return self

    # ------------------------------------------------------- estimates
    def btb(self) -> np.ndarray:
        """The (d, d) second-moment estimate B'B (0 <= A'A - B'B <= delta_sum*I)."""
        if self.B is None:
            raise ValueError("empty FD sketch")
        bb = self.B[: self.rows_used]
        return bb.T @ bb

    def covariance(self) -> np.ndarray:
        """Centered covariance estimate (B'B - n*mu*mu')/n; additive
        spectral error <= delta_sum / n vs the exact covariance."""
        if self.n == 0:
            raise ValueError("empty FD sketch")
        mu = self.colsum / self.n
        return self.btb() / self.n - np.outer(mu, mu)

    def error_bound(self) -> float:
        """Certified spectral radius of A'A - B'B (<= 2*frob2/ell)."""
        return float(self.delta_sum)

    def estimate(self) -> int:
        return int(self.n)

    # ---------------------------------------------------- serialization
    def _payload(self) -> bytes:
        d = 0 if self.d is None else self.d
        head = struct.pack(
            "<IIIQddd",
            self.ell,
            d,
            self.rows_used,
            self.n,
            self.frob2,
            self.delta_sum,
            0.0,
        )
        if self.B is None:
            return head
        return (
            head
            + self.colsum.tobytes()
            + np.ascontiguousarray(self.B[: self.rows_used]).tobytes()
        )

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "FrequentDirections":
        ell, d, rows_used, n, frob2, delta_sum, _ = struct.unpack_from("<IIIQddd", buf, 0)
        off = struct.calcsize("<IIIQddd")
        s = cls.__new__(cls)
        s.ell, s.rows_used, s.n = ell, rows_used, n
        s.frob2, s.delta_sum = frob2, delta_sum
        if d == 0:
            s.d, s.B, s.colsum = None, None, None
            return s
        s.d = d
        s.colsum = np.frombuffer(buf, dtype=np.float64, count=d, offset=off).copy()
        off += 8 * d
        s.B = np.zeros((2 * ell, d), dtype=np.float64)
        if rows_used:
            s.B[:rows_used] = np.frombuffer(
                buf, dtype=np.float64, count=rows_used * d, offset=off
            ).reshape(rows_used, d)
        return s
