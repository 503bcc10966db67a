"""SimHash (Charikar 2002) 64-bit document fingerprints for near-dup.

simhash64(feature_hashes, weights) -> uint64 whose Hamming distance
approximates the weighted cosine distance between feature sets.
"""

from __future__ import annotations

import numpy as np

_U = np.uint64


def simhash64(feature_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of one document's feature-hash set."""
    h = np.ascontiguousarray(feature_hashes, dtype=_U)
    if h.size == 0:
        return 0
    w = np.ones(h.size) if weights is None else np.asarray(weights, dtype=np.float64)
    # bit matrix: (n, 64) via uint8 view + unpackbits (little-endian fix)
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)  # (n, 64) MSB-first
    signs = bits.astype(np.int8) * 2 - 1  # signed: 0 -> -1, 1 -> +1
    score = (signs * w[:, None]).sum(axis=0)  # ±w per bit
    out_bits = (score > 0).astype(np.uint8)
    return int(np.packbits(out_bits).view(">u8")[0])


def simhash64_batch(hash_sets: list[np.ndarray]) -> np.ndarray:
    """Batched SimHash: one uint64 per document hash-set."""
    return np.array([simhash64(hs) for hs in hash_sets], dtype=_U)


def hamming64(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Vectorized Hamming distance between uint64 fingerprints."""
    x = np.asarray(a, dtype=_U) ^ np.asarray(b, dtype=_U)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
