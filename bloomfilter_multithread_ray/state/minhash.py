"""MinHash signature sketch (Broder 1997) for Jaccard similarity / near-dup.

Signature i = min over the item-hash set of splitmix64(h ^ salt_i).
Merge = elementwise min, so a document set's signature is a mergeable
UDAF like every other sketch here. Used by the MinHash-LSH dedup
pipeline (band the signature, group by (band, band_hash)).
"""

from __future__ import annotations

import struct

import numpy as np

from ..functions.hashing import splitmix64
from .base import Sketch, T_MINHASH, register

_U = np.uint64
_SALT_SEED = _U(0x1B873593C2B2AE35)


def _salts(num_perm: int) -> np.ndarray:
    return splitmix64(np.arange(num_perm, dtype=_U) ^ _SALT_SEED)


@register(T_MINHASH)
class MinHash(Sketch):
    NEEDS_MULTIPLICITY = False
    def __init__(self, num_perm: int = 128):
        if not 8 <= num_perm <= 1024:
            raise ValueError("num_perm must be in [8, 1024]")
        self.num_perm = int(num_perm)
        self.sig = np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=_U)

    def update_hash_counts(self, hashes, counts):
        # set semantics: multiplicity is irrelevant to the minima
        self.update_hashes(hashes)

    def update_hashes(self, hashes: np.ndarray) -> None:
        h = np.ascontiguousarray(hashes, dtype=_U)
        if h.size == 0:
            return
        salts = _salts(self.num_perm)
        # (num_perm, n) mix matrix; chunk to bound memory on huge batches
        step = max(1, (1 << 22) // self.num_perm)
        for s in range(0, h.size, step):
            mix = splitmix64(h[None, s : s + step] ^ salts[:, None])
            np.minimum(self.sig, mix.min(axis=1), out=self.sig)

    def merge(self, other: "MinHash") -> "MinHash":
        if other.num_perm != self.num_perm:
            raise ValueError("cannot merge MinHash with different num_perm")
        np.minimum(self.sig, other.sig, out=self.sig)
        return self

    def jaccard(self, other: "MinHash") -> float:
        return float((self.sig == other.sig).mean())

    def estimate(self) -> np.ndarray:
        return self.sig

    def _payload(self) -> bytes:
        return struct.pack("<I", self.num_perm) + self.sig.tobytes()

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "MinHash":
        (num_perm,) = struct.unpack_from("<I", buf, 0)
        s = cls.__new__(cls)
        s.num_perm = num_perm
        s.sig = np.frombuffer(buf, dtype=_U, offset=4).copy()
        return s


def minhash_signatures(
    hash_sets: list[np.ndarray], num_perm: int = 128
) -> np.ndarray:
    """Batched signatures: one row per document hash-set.

    Vectorized over (num_perm x n_items) per doc; returns
    (len(hash_sets), num_perm) uint64. This is the hot-path form used
    inside ``map_batches`` — the MinHash class above is the mergeable
    single-set form.
    """
    salts = _salts(num_perm)
    out = np.full((len(hash_sets), num_perm), np.iinfo(np.uint64).max, dtype=_U)
    for i, hs in enumerate(hash_sets):
        h = np.ascontiguousarray(hs, dtype=_U)
        if h.size == 0:
            continue
        mix = splitmix64(h[None, :] ^ salts[:, None])
        out[i] = mix.min(axis=1)
    return out
