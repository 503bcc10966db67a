"""Register-blocked Bloom filter (Putze, Sanders & Singler, JEA 2009):
all K bits of a key live in ONE 64-bit word, so a probe is a single
random gather plus an in-register mask test — versus K scattered
gathers for the classic filter. The cache-efficiency variant of the
reference's core structure (src/main.cpp:86 `bm::bvector<>` probe),
built for the memory-bound regime the stacked-matrix probe path runs
in (pipelines/bloom.py:256 — one fancy gather per hash function is
the measured cost center).

Trade (published, measured in BASELINE.md's A/B): probing is
~K× fewer cache misses, but concentrating K bits in 64 slots raises
the false-positive rate versus a free-range filter at equal total
bits — Putze et al. put the penalty at ~1 extra bit/key for K=4..5;
the A/B records the empirical pair so the adoption rule (same as
skmer: opt-in unless it wins on BOTH axes) is checkable.

Layout: ``words`` (n_words,) uint64; word index = h % n_words; the K
bit positions derive from disjoint 6-bit slices of splitmix64(h ^
salt), so mask construction is fully vectorized. Merge = word-wise OR
(order-free, same mergeable-UDAF contract as the classic filter).
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, register

_U = np.uint64
_BB_SALT = _U(0x94D049BB133111EB)

T_BLOOM_BLOCKED = 14


@register(T_BLOOM_BLOCKED)
class BlockedBloomFilter(Sketch):
    NEEDS_MULTIPLICITY = False  # set semantics: duplicate adds are no-ops

    def __init__(self, num_bits: int = 1 << 20, num_hashes: int = 4):
        nb = int(num_bits)
        if nb < 64 or nb % 64:
            raise ValueError("num_bits must be a positive multiple of 64")
        if not 1 <= int(num_hashes) <= 10:
            raise ValueError("num_hashes must be in [1, 10] (6 bits/slice)")
        self.num_bits = nb
        self.num_hashes = int(num_hashes)
        self.n_words = nb // 64
        self.words = np.zeros(self.n_words, dtype=np.uint64)
        self.n_added = 0

    # ------------------------------------------------------------ masks
    def _word_and_mask(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = np.ascontiguousarray(hashes, dtype=_U)
        g = splitmix64(h ^ _BB_SALT)
        # word index from the mix's HIGH bits, bit positions from its
        # low bits — NEVER from raw h: the raw value's low bits also
        # pick the shuffle partition (partition_of = h % P), and any
        # shared bits make each partition reach only n_words/P words,
        # saturating them (caught as FPR -> 1.0 in the partitioned A/B;
        # the single-filter smoke test cannot see this correlation)
        widx = ((g >> _U(24)) % _U(self.n_words)).astype(np.int64)
        mask = np.zeros(len(h), dtype=_U)
        one = _U(1)
        for i in range(self.num_hashes):
            pos = (g >> _U(6 * i)) & _U(63)
            mask |= one << pos
        return widx, mask

    # ---------------------------------------------------- Sketch contract
    def update_hashes(self, hashes: np.ndarray) -> None:
        if np.size(hashes) == 0:
            return
        widx, mask = self._word_and_mask(hashes)
        # iterative collision-tolerant fancy-OR: a plain fancy |= keeps
        # only the LAST writer per duplicate index, so re-check which
        # items' bits actually landed and retry the rest — passes are
        # bounded by the max per-word multiplicity (single digits for
        # hashed keys), each pass is three vectorized ops on a fast-
        # shrinking array. ~2x faster than argsort+reduceat and ~10x
        # faster than ufunc.at at 2M keys; falls back to the exact
        # sorted segment-OR if a pathological batch won't converge.
        w, m = widx, mask
        for _ in range(16):
            if not len(w):
                break
            self.words[w] |= m
            ok = (self.words[w] & m) == m
            if ok.all():
                w = w[:0]
                break
            w, m = w[~ok], m[~ok]
        if len(w):  # pathological duplicates: exact sorted fallback
            order = np.argsort(w, kind="stable")
            ws, ms = w[order], m[order]
            starts = np.flatnonzero(np.diff(ws, prepend=ws[0] - 1))
            om = np.bitwise_or.reduceat(ms, starts)
            self.words[ws[starts]] |= om
        self.n_added += int(len(widx))

    def update_hash_counts(self, hashes, counts) -> None:
        self.update_hashes(hashes)  # set semantics

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        if np.size(hashes) == 0:
            return np.empty(0, dtype=bool)
        widx, mask = self._word_and_mask(hashes)
        w = self.words[widx]  # ONE gather
        return (w & mask) == mask

    def merge(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        if (other.num_bits, other.num_hashes) != (self.num_bits, self.num_hashes):
            raise ValueError("cannot merge blocked Blooms with different shapes")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    # --------------------------------------------------------- estimates
    def fill_ratio(self) -> float:
        return float(
            np.unpackbits(self.words.view(np.uint8)).sum()
        ) / self.num_bits

    def estimate(self) -> float:
        t = self.fill_ratio()
        if t >= 1.0:
            return float("inf")
        return -self.num_bits / self.num_hashes * float(np.log1p(-t))

    def fpr_bound(self, n: int | None = None) -> float:
        """Classic (1 - e^{-Kn/m})^K bound — a LOWER bound for the
        blocked layout (block skew adds FPR); the A/B measures the
        real pair."""
        n = self.n_added if n is None else int(n)
        k, m = self.num_hashes, self.num_bits
        return float((1.0 - np.exp(-k * max(n, 0) / m)) ** k)

    # ------------------------------------------------------ serialization
    def _payload(self) -> bytes:
        head = struct.pack("<IIq", self.num_bits, self.num_hashes, self.n_added)
        return head + self.words.tobytes()

    @classmethod
    def _from_payload(cls, buf: bytes) -> "BlockedBloomFilter":
        nb, k, n = struct.unpack_from("<IIq", buf, 0)
        sk = cls(num_bits=nb, num_hashes=k)
        sk.words = np.frombuffer(
            buf, dtype=np.uint64, offset=struct.calcsize("<IIq")
        ).copy()
        sk.n_added = n
        return sk
