"""HyperLogLog distinct counter (Flajolet et al. 2007).

New operator mandated by the north rule (distinct-token cardinality);
implements the same mergeable contract the reference's Bloom shards
sketch out (SURVEY §2 #8/#14). Standard error 1.04/sqrt(m), m = 2^p.
Merge = elementwise register max (associative + commutative).
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, T_HLL, register

_U = np.uint64


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@register(T_HLL)
class HyperLogLog(Sketch):
    NEEDS_MULTIPLICITY = False
    def __init__(self, p: int = 14):
        # p in [11, 18]: keeps the low (64-p) hash bits < 2^53 so the
        # float64 log2-based rank computation below is exact.
        if not 11 <= p <= 18:
            raise ValueError("p must be in [11, 18]")
        self.p = int(p)
        self.m = 1 << self.p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def update_hash_counts(self, hashes, counts):
        # set semantics: multiplicity is irrelevant to max-rank registers
        self.update_hashes(hashes)

    def update_hashes(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        idx = (h >> _U(64 - self.p)).astype(np.int64)
        low = h & _U((1 << (64 - self.p)) - 1)
        # rank = (64-p) - bitlength(low) + 1 ; low < 2^53 -> exact log2
        lowf = low.astype(np.float64)
        bitlen = np.zeros(h.size, dtype=np.int64)
        nz = low != 0
        bitlen[nz] = np.floor(np.log2(lowf[nz])).astype(np.int64) + 1
        rank = ((64 - self.p) - bitlen + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs with different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = _alpha(m) * m * m / float(inv.sum())
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros > 0:
            return m * float(np.log(m / zeros))  # linear counting
        return raw

    def rel_error(self) -> float:
        return 1.04 / (self.m**0.5)

    def _payload(self) -> bytes:
        return struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "HyperLogLog":
        (p,) = struct.unpack_from("<B", buf, 0)
        s = cls.__new__(cls)
        s.p, s.m = p, 1 << p
        s.registers = np.frombuffer(buf, dtype=np.uint8, offset=1).copy()
        return s
