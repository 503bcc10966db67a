"""Bloom filter — the flagship sketch.

Generalizes the reference's degenerate one-hash filter
(insert = ``bf.set(xorshift32(kmer) % bf_size)``,
``src/SkmerSplitter.cpp:83``; probe = ``bf.test``,
``src/SkmerSplitter.cpp:132-136``; 65,536 bits/shard,
``src/main.cpp:75``) to a proper K-hash filter with double hashing
h_i = h1 + i*h2 (Kirsch–Mitzenmacher 2006), vectorized over uint64
hash batches. ``num_hashes=1`` reproduces the reference's parity mode.

Invariants (tested):
- zero false negatives — every inserted hash tests True;
- empirical FPR on disjoint negatives <= (1 - e^{-Kn/m})^K + slack;
- merge (bitwise OR over same-shape filters) is associative/commutative
  and equals single-pass construction.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, T_BLOOM, register

_U = np.uint64
_H2_SALT = _U(0xD6E8FEB86659FD93)


@register(T_BLOOM)
class BloomFilter(Sketch):
    NEEDS_MULTIPLICITY = False
    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 4):
        if num_bits < 64:
            raise ValueError("num_bits must be >= 64")
        if not 1 <= num_hashes <= 16:
            raise ValueError("num_hashes must be in [1, 16]")
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        # one BYTE per bit in memory: scatter-set (`bits[idx] = 1`) and
        # gather-test are plain fancy indexing (~20x faster than
        # np.bitwise_or.at on packed words); the serialized form stays
        # bit-packed (np.packbits round-trip), so on-disk size and
        # format are unchanged
        self.bits = np.zeros(self.num_bits, dtype=np.uint8)
        self.n_added = 0  # item count (not distinct) — lineage metric

    @classmethod
    def from_bits(
        cls, num_bits: int, num_hashes: int, bits: np.ndarray, n_added: int = 0
    ) -> "BloomFilter":
        """Wrap an existing byte-per-bit array WITHOUT copying.

        Used by the probe path to share one plasma-resident bit array
        across every actor on a node (zero-copy ``ray.get``): the
        wrapped array may be read-only — fine for ``contains``; call
        sites that need to update must copy first.
        """
        s = cls.__new__(cls)
        s.num_bits, s.num_hashes, s.n_added = int(num_bits), int(num_hashes), int(n_added)
        s.bits = bits
        return s

    # -- hashing ---------------------------------------------------------
    def _indices(self, hashes: np.ndarray, i: int) -> np.ndarray:
        h1 = hashes
        if self.num_hashes == 1:
            return h1 % _U(self.num_bits)
        h2 = splitmix64(hashes ^ _H2_SALT) | _U(1)
        with np.errstate(over="ignore"):
            return (h1 + _U(i) * h2) % _U(self.num_bits)

    # -- Sketch contract -------------------------------------------------
    def update_hashes(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        for i in range(self.num_hashes):
            self.bits[self._indices(h, i).astype(np.int64)] = 1
        self.n_added += int(h.size)

    def update_hash_counts(self, hashes: np.ndarray, counts: np.ndarray) -> None:
        # set semantics: one insert per unique hash; n_added counts items
        self.update_hashes(hashes)
        self.n_added += int(np.asarray(counts, dtype=np.int64).sum()) - len(hashes)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership test -> bool array (no false negatives)."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return np.empty(0, dtype=bool)
        out = np.ones(h.size, dtype=bool)
        for i in range(self.num_hashes):
            out &= self.bits[self._indices(h, i).astype(np.int64)] != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.num_bits, other.num_hashes) != (self.num_bits, self.num_hashes):
            raise ValueError("cannot merge Bloom filters with different shapes")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    # -- estimates -------------------------------------------------------
    def fill_ratio(self) -> float:
        return int(self.bits.sum()) / self.num_bits

    def estimate(self) -> float:
        """Estimated distinct insertions from fill ratio: -m/K ln(1-t)."""
        t = self.fill_ratio()
        if t >= 1.0:
            return float("inf")
        return -self.num_bits / self.num_hashes * float(np.log1p(-t))

    def theoretical_fpr(self, n_distinct: int) -> float:
        k, m = self.num_hashes, self.num_bits
        return float((1.0 - np.exp(-k * n_distinct / m)) ** k)

    # -- serialization ---------------------------------------------------
    def _payload(self) -> bytes:
        head = struct.pack("<QBQ", self.num_bits, self.num_hashes, self.n_added)
        # pack 1 byte/bit -> 1 bit/bit; little bitorder keeps the layout
        # identical to the previous uint64-word little-endian format
        packed = np.packbits(self.bits, bitorder="little")
        pad = (-len(packed)) % 8  # pad to whole 64-bit words
        if pad:
            packed = np.concatenate([packed, np.zeros(pad, np.uint8)])
        return head + packed.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "BloomFilter":
        num_bits, num_hashes, n_added = struct.unpack_from("<QBQ", buf, 0)
        s = cls.__new__(cls)
        s.num_bits, s.num_hashes, s.n_added = num_bits, num_hashes, n_added
        packed = np.frombuffer(buf, dtype=np.uint8, offset=17)
        s.bits = np.unpackbits(packed, bitorder="little")[:num_bits]
        return s
