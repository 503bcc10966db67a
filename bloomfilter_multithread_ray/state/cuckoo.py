"""Cuckoo filter (Fan, Andersen, Kaminsky & Mitzenmacher, CoNEXT'14)
— approximate membership with DELETION at ~half the counting-Bloom
space: buckets of ``bucket_size`` 16-bit fingerprints, each item
storable in exactly two buckets (partial-key cuckoo hashing), lookups
probe both, deletes remove one fingerprint copy.

Space story vs the repo's other membership sketches (the point of
adding the family): at the same target FPR ≈ 2b/2^f, a cuckoo slot
costs f bits ≈ 16 where a counting Bloom costs K·32-bit counters per
item (≈ 12 bytes at K=3) — retraction support at bits-per-item close
to the PLAIN Bloom filter.

Determinism contract: cuckoo layout depends on insertion order
(evictions), so — unlike the order-free Bloom OR-merge — this sketch
is NOT an order-insensitive UDAF. The distributed build therefore
uses the PARTITIONED-STORE discipline (one filter per hash partition,
each built by one kernel over its partition's SORTED hashes —
deterministic layout), mirroring the reference's per-thread shards
(src/main.cpp:86) rather than its never-implemented merge slot
(src/main.cpp:233-239). ``merge`` is still provided (re-inserts the
other filter's fingerprints; loud failure on overflow) for tree folds
where layout determinism is not required.

Caveats (published, tested, not defended):
- insertion can FAIL when load exceeds ~95% at b=4 — raises
  RuntimeError rather than silently degrading;
- deleting a never-inserted item may evict a colliding live item's
  fingerprint (same caveat class as counting-Bloom's unmatched
  delete); delete only what was inserted.
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, register

_U = np.uint64
_FP_SALT = _U(0xA24BAED4963EE407)

T_CUCKOO = 13


@register(T_CUCKOO)
class CuckooFilter(Sketch):
    NEEDS_MULTIPLICITY = True  # duplicate inserts occupy extra slots

    def __init__(self, num_buckets: int = 1 << 16, bucket_size: int = 4,
                 max_kicks: int = 500):
        nb = int(num_buckets)
        if nb < 2 or nb & (nb - 1):
            raise ValueError("num_buckets must be a power of two >= 2")
        if not 1 <= int(bucket_size) <= 8:
            raise ValueError("bucket_size must be in [1, 8]")
        self.num_buckets = nb
        self.bucket_size = int(bucket_size)
        self.max_kicks = int(max_kicks)
        # 0 = empty slot; fingerprints are in [1, 2^16 - 1]
        self.slots = np.zeros((nb, self.bucket_size), dtype=np.uint16)
        self.n_items = 0

    # ---------------------------------------------------------- hashing
    def _fp(self, hashes: np.ndarray) -> np.ndarray:
        """16-bit fingerprints in [1, 65535] (0 is the empty marker)."""
        return ((hashes >> _U(48)) % _U(65535) + _U(1)).astype(np.uint16)

    def _i1(self, hashes: np.ndarray) -> np.ndarray:
        return (hashes % _U(self.num_buckets)).astype(np.int64)

    def _alt(self, i: np.ndarray | int, fp: np.ndarray | int) -> np.ndarray:
        """Partial-key alternate: i ^ h(fp), an involution (alt(alt)=i)."""
        fph = splitmix64(np.asarray(fp, dtype=_U) ^ _FP_SALT)
        return ((np.asarray(i, dtype=_U) ^ fph) % _U(self.num_buckets)).astype(
            np.int64
        )

    # ------------------------------------------------------------ insert
    def _bulk_place(self, fps: np.ndarray, targets: np.ndarray) -> np.ndarray:
        """Vectorized wave placement: claim free slots in ``targets``
        (one bucket per item), resolving intra-wave conflicts by rank
        within each bucket group. Returns the placed mask."""
        n = len(fps)
        placed = np.zeros(n, dtype=bool)
        if n == 0:
            return placed
        order = np.argsort(targets, kind="stable")
        bi = targets[order]
        bu, inv = np.unique(bi, return_inverse=True)
        starts = np.flatnonzero(np.diff(bi, prepend=bi[0] - 1))
        lens = np.diff(np.concatenate([starts, [n]]))
        rank = np.arange(n) - np.repeat(starts, lens)
        rows = self.slots[bu]  # (u, b)
        free_count = (rows == 0).sum(axis=1)
        ok = rank < free_count[inv]
        if not ok.any():
            return placed
        # free slots first (stable) → the rank-th free column per bucket
        free_cols = np.argsort(rows != 0, axis=1, kind="stable")
        cols = free_cols[inv[ok], rank[ok]]
        self.slots[bi[ok], cols] = fps[order][ok]
        placed[order[ok]] = True
        return placed

    def update_hashes(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        fps = self._fp(h)
        i1s = self._i1(h)
        i2s = self._alt(i1s, fps)
        # vectorized fast path: wave-place into i1, remainder into i2,
        # repeat once (the second wave mops up freshly-conflicted items);
        # only eviction-needing stragglers hit the per-item loop below
        pend = np.arange(len(fps))
        for _ in range(2):
            if not len(pend):
                break
            p1 = self._bulk_place(fps[pend], i1s[pend])
            pend = pend[~p1]
            if not len(pend):
                break
            p2 = self._bulk_place(fps[pend], i2s[pend])
            pend = pend[~p2]
        self.n_items += len(fps) - len(pend)
        fps, i1s, i2s = fps[pend], i1s[pend], i2s[pend]
        slots, b = self.slots, self.bucket_size
        for fp, i1, i2 in zip(fps, i1s, i2s):
            placed = False
            for idx in (i1, i2):
                row = slots[idx]
                free = np.flatnonzero(row == 0)
                if free.size:
                    row[free[0]] = fp
                    placed = True
                    break
            if not placed:
                # eviction chain: deterministic victim rotation
                idx, cur = int(i2), int(fp)
                for kick in range(self.max_kicks):
                    victim_slot = kick % b
                    cur, slots[idx, victim_slot] = (
                        int(slots[idx, victim_slot]),
                        cur,
                    )
                    idx = int(self._alt(idx, cur))
                    row = slots[idx]
                    free = np.flatnonzero(row == 0)
                    if free.size:
                        row[free[0]] = cur
                        placed = True
                        break
                if not placed:
                    raise RuntimeError(
                        f"cuckoo filter full (load {self.load_factor():.3f}): "
                        "increase num_buckets"
                    )
            self.n_items += 1

    # ------------------------------------------------------------ lookup
    def contains(self, hashes: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return np.empty(0, dtype=bool)
        fps = self._fp(h)
        i1s = self._i1(h)
        i2s = self._alt(i1s, fps)
        f = fps[:, None]
        return ((self.slots[i1s] == f).any(axis=1)
                | (self.slots[i2s] == f).any(axis=1))

    # ------------------------------------------------------------ delete
    def delete_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Remove ONE fingerprint copy per hash (bucket i1 first).
        Returns the per-item success mask; delete only prior inserts."""
        h = np.ascontiguousarray(hashes, dtype=_U)
        out = np.zeros(h.size, dtype=bool)
        if h.size == 0:
            return out
        fps = self._fp(h)
        i1s = self._i1(h)
        i2s = self._alt(i1s, fps)
        for k, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            for idx in (i1, i2):
                row = self.slots[idx]
                hit = np.flatnonzero(row == fp)
                if hit.size:
                    row[hit[0]] = 0
                    out[k] = True
                    self.n_items -= 1
                    break
        return out

    # ------------------------------------------------------------- merge
    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        if (other.num_buckets, other.bucket_size) != (
            self.num_buckets, self.bucket_size,
        ):
            raise ValueError("cannot merge cuckoo filters with different shapes")
        # re-insert the other's fingerprints at their home buckets:
        # a stored fp's bucket is either its i1 or i2; inserting "as if"
        # i1 = row works because alt() is an involution
        slots, b = self.slots, self.bucket_size
        rows, cols = np.nonzero(other.slots)
        for r, c in zip(rows, cols):
            fp = int(other.slots[r, c])
            placed = False
            for idx in (int(r), int(self._alt(r, fp))):
                row = slots[idx]
                free = np.flatnonzero(row == 0)
                if free.size:
                    row[free[0]] = fp
                    placed = True
                    break
            if not placed:
                idx, cur = int(self._alt(r, fp)), fp
                for kick in range(self.max_kicks):
                    victim_slot = kick % b
                    cur, slots[idx, victim_slot] = (
                        int(slots[idx, victim_slot]), cur,
                    )
                    idx = int(self._alt(idx, cur))
                    row = slots[idx]
                    free = np.flatnonzero(row == 0)
                    if free.size:
                        row[free[0]] = cur
                        placed = True
                        break
                if not placed:
                    raise RuntimeError("cuckoo merge overflow: increase num_buckets")
            self.n_items += 1
        return self

    # --------------------------------------------------------- estimates
    def load_factor(self) -> float:
        return float((self.slots != 0).sum()) / self.slots.size

    def fpr_bound(self) -> float:
        """≈ 2b / 2^f — two buckets of b slots against a 16-bit tag."""
        return 2.0 * self.bucket_size / 65535.0

    def estimate(self) -> int:
        return self.n_items

    # ---------------------------------------------------- serialization
    def _payload(self) -> bytes:
        head = struct.pack(
            "<IIIq", self.num_buckets, self.bucket_size, self.max_kicks,
            self.n_items,
        )
        return head + self.slots.tobytes()

    @classmethod
    def _from_payload(cls, buf: bytes) -> "CuckooFilter":
        nb, b, mk, n = struct.unpack_from("<IIIq", buf, 0)
        sk = cls(num_buckets=nb, bucket_size=b, max_kicks=mk)
        sk.slots = np.frombuffer(
            buf, dtype=np.uint16, offset=struct.calcsize("<IIIq")
        ).reshape(nb, b).copy()
        sk.n_items = n
        return sk
