"""Counting Bloom filter (Fan, Cao, Almeida & Broder ToN 2000) —
the flagship Bloom family (``bloom.py``) extended with DELETION, the
piece an incremental 10^12-token corpus needs when documents are
retracted (takedowns, redactions, recrawl replacements).

Same double-hashed index stream as :class:`~.bloom.BloomFilter`
(Kirsch–Mitzenmacher h1 + i*h2, identical salts — a CountingBloom
built over the same hashes sets exactly the plain filter's bit
positions), but each position holds an int32 counter:

    insert x: counts[h_i(x)] += 1        delete x: counts[h_i(x)] -= 1
    contains x: all_i counts[h_i(x)] > 0

Invariants (tested):
- zero false negatives on the LIVE multiset (inserted minus deleted),
  as long as every delete retracts a previously inserted item —
  deleting a never-inserted item may knock counters of live items to
  zero (classic counting-Bloom caveat, documented not defended);
- empirical FPR on disjoint negatives <= (1 - e^{-Kn/m})^K + slack
  with n the LIVE count — retraction genuinely restores FPR headroom,
  unlike the plain filter where dead items poison the bit array
  forever;
- merge = elementwise counter sum: associative, commutative, and
  BIT-IDENTICAL to single-pass construction under any tree (inserts
  and deletes both travel), which is what lets retraction feeds ride
  the same ``SketchAgg``/``PartialMergeAgg`` plumbing as builds.

Reference analog: the per-thread Bloom shards of ``src/main.cpp:86``
whose unimplemented merge/serialize slots (``src/main.cpp:233-239``)
could never have supported retraction — counters are the standard
published fix.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, register

_U = np.uint64
_H2_SALT = _U(0xD6E8FEB86659FD93)  # same stream as BloomFilter

T_COUNTING_BLOOM = 12


@register(T_COUNTING_BLOOM)
class CountingBloom(Sketch):
    NEEDS_MULTIPLICITY = True  # duplicates change counters

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 4):
        if num_bits < 64:
            raise ValueError("num_bits must be >= 64")
        if not 1 <= num_hashes <= 16:
            raise ValueError("num_hashes must be in [1, 16]")
        self.num_bits = int(num_bits)
        self.num_hashes = int(num_hashes)
        self.counts = np.zeros(self.num_bits, dtype=np.int32)
        self.n_added = 0
        self.n_deleted = 0

    # -- hashing (identical to BloomFilter._indices) ---------------------
    def _indices(self, hashes: np.ndarray, i: int) -> np.ndarray:
        h1 = hashes
        if self.num_hashes == 1:
            return h1 % _U(self.num_bits)
        h2 = splitmix64(hashes ^ _H2_SALT) | _U(1)
        with np.errstate(over="ignore"):
            return (h1 + _U(i) * h2) % _U(self.num_bits)

    # -- Sketch contract -------------------------------------------------
    def update_hashes(self, hashes: np.ndarray, weights: np.ndarray | None = None) -> None:
        """Insert a batch; ``weights`` of -1 retract (see delete_hashes)."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        if weights is None:
            w = np.ones(h.size, dtype=np.int32)
        else:
            w = np.asarray(weights, dtype=np.int32)
        for i in range(self.num_hashes):
            np.add.at(self.counts, self._indices(h, i).astype(np.int64), w)
        pos = int(w[w > 0].sum())
        self.n_added += pos
        self.n_deleted += pos - int(w.sum())

    def update_hash_counts(self, hashes, counts):
        self.update_hashes(hashes, weights=np.asarray(counts, dtype=np.int32))

    def delete_hashes(self, hashes: np.ndarray) -> None:
        """Retract a batch of PREVIOUSLY INSERTED item hashes."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        self.update_hashes(h, weights=np.full(h.size, -1, dtype=np.int32))

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership on the live multiset (no false
        negatives when deletes only retract prior inserts)."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return np.empty(0, dtype=bool)
        out = np.ones(h.size, dtype=bool)
        for i in range(self.num_hashes):
            out &= self.counts[self._indices(h, i).astype(np.int64)] > 0
        return out

    def merge(self, other: "CountingBloom") -> "CountingBloom":
        if (other.num_bits, other.num_hashes) != (self.num_bits, self.num_hashes):
            raise ValueError("cannot merge counting Blooms with different shapes")
        self.counts += other.counts
        self.n_added += other.n_added
        self.n_deleted += other.n_deleted
        return self

    # -- estimates -------------------------------------------------------
    def n_live(self) -> int:
        return self.n_added - self.n_deleted

    def fill_ratio(self) -> float:
        return float((self.counts > 0).sum()) / self.num_bits

    def fpr_bound(self) -> float:
        """(1 - e^{-K n_live / m})^K with the lineage live count."""
        k, m = self.num_hashes, self.num_bits
        return float((1.0 - np.exp(-k * max(self.n_live(), 0) / m)) ** k)

    def estimate(self) -> int:
        return self.n_live()

    # ---------------------------------------------------- serialization
    def _payload(self) -> bytes:
        head = struct.pack(
            "<IIqq", self.num_bits, self.num_hashes, self.n_added, self.n_deleted
        )
        return head + self.counts.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "CountingBloom":
        num_bits, num_hashes, n_added, n_deleted = struct.unpack_from("<IIqq", buf, 0)
        s = cls.__new__(cls)
        s.num_bits, s.num_hashes = num_bits, num_hashes
        s.n_added, s.n_deleted = n_added, n_deleted
        s.counts = np.frombuffer(
            buf, dtype=np.int32, offset=struct.calcsize("<IIqq")
        ).copy()
        return s
