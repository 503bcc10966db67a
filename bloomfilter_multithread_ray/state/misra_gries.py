"""Misra-Gries heavy-hitters summary (Misra & Gries 1982) with the
mergeable-summary merge of Agarwal et al. 2013 ("Mergeable Summaries",
PODS'12): sum counters, subtract the (capacity+1)-th largest, drop
non-positive.

Published guarantee, preserved under arbitrary merge trees (asserted
in tests/test_sketches.py): for every item x,

    true(x) - err <= counter(x) <= true(x),   err <= n_total / (capacity + 1)

where ``counter(x) = 0`` for untracked items. Any item with
``true(x) > n_total / (capacity + 1)`` is guaranteed tracked — which
is exactly the candidate-generation property the sketch-mode heavy
hitters pipeline needs (the reference pipeline's exact top-k path
materializes per-token counts; this summary is its fixed-memory
replacement at web-scale vocabularies).

Unlike the hash-keyed sketches this summary tracks the item IDENTITY
(token string), so candidates come out of the sketch itself —
no exact side pass. Counters are a dict (vocab-bounded per batch via
``np.unique`` pre-aggregation); serialization packs counts as int64
plus \\x00-joined utf-8 keys.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import Sketch, register

T_MG = 8


@register(T_MG)
class MisraGries(Sketch):
    NEEDS_MULTIPLICITY = True

    def __init__(self, capacity: int = 1024):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = int(capacity)
        self.counters: dict[str, int] = {}
        self.n_total = 0  # total stream weight absorbed
        self.err = 0  # max decrement applied to any surviving counter

    # ---------------------------------------------------------------- update
    def update_items(self, items, counts=None) -> None:
        """Absorb items (any str iterable / arrow array) with optional
        multiplicities. Pre-aggregates via np.unique, then one dict
        pass over the UNIQUE items (vocab-bounded, not row-bounded)."""
        arr = np.asarray(items, dtype=object)
        if counts is None:
            uniq, cnt = np.unique(arr.astype(str), return_counts=True)
            cnt = cnt.astype(np.int64)
        else:
            cnt = np.asarray(counts, dtype=np.int64)
            order = np.argsort(arr.astype(str), kind="stable")
            s, c = arr[order].astype(str), cnt[order]
            starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
            uniq = s[starts]
            cnt = np.add.reduceat(c, starts)
        c = self.counters
        for k, v in zip(uniq.tolist(), cnt.tolist()):
            c[k] = c.get(k, 0) + v
        self.n_total += int(cnt.sum())
        self._shrink()

    def _shrink(self) -> None:
        """Classic MG decrement generalized: drop to <= capacity
        counters by subtracting the (capacity+1)-th largest value."""
        if len(self.counters) <= self.capacity:
            return
        vals = np.fromiter(self.counters.values(), dtype=np.int64, count=len(self.counters))
        # (capacity+1)-th largest value
        kth = np.partition(vals, len(vals) - self.capacity - 1)[len(vals) - self.capacity - 1]
        self.counters = {k: v - kth for k, v in self.counters.items() if v > kth}
        self.err += int(kth)

    # ---------------------------------------------------------------- query
    def estimate(self, item: str) -> int:
        """Lower-bound counter (0 for untracked)."""
        return self.counters.get(item, 0)

    def error_bound(self) -> int:
        """Max undercount of any counter: tracked total decrement,
        itself <= n_total/(capacity+1)."""
        return self.err

    def topk(self, k: int):
        """Top-k tracked items by (counter desc, item asc) — deterministic.

        Returns (items: list[str], counters: np.int64 array)."""
        items = sorted(self.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [k_ for k_, _ in items], np.array([v for _, v in items], dtype=np.int64)

    # ---------------------------------------------------------------- merge
    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.capacity != other.capacity:
            raise ValueError("capacity mismatch")
        c = self.counters
        for k, v in other.counters.items():
            c[k] = c.get(k, 0) + v
        self.n_total += other.n_total
        self.err += other.err
        self._shrink()
        return self

    # ------------------------------------------------------------- serialize
    def _payload(self) -> bytes:
        """Length-prefixed keys (int32 byte lengths + concatenated
        utf-8) — a delimiter-joined layout would corrupt on tokens
        containing the delimiter byte."""
        keys = [k.encode("utf-8") for k in self.counters.keys()]
        vals = np.fromiter(self.counters.values(), dtype=np.int64, count=len(keys))
        lens = np.array([len(k) for k in keys], dtype=np.int32)
        return (
            struct.pack("<qqqq", self.capacity, self.n_total, self.err, len(keys))
            + vals.tobytes()
            + lens.tobytes()
            + b"".join(keys)
        )

    @classmethod
    def _from_payload(cls, buf: memoryview) -> "MisraGries":
        capacity, n_total, err, n = struct.unpack_from("<qqqq", buf, 0)
        off = 32
        vals = np.frombuffer(buf, dtype=np.int64, count=n, offset=off)
        off += 8 * n
        lens = np.frombuffer(buf, dtype=np.int32, count=n, offset=off)
        off += 4 * n
        blob = bytes(buf[off:])
        ends = np.cumsum(lens)
        starts = ends - lens
        keys = [blob[s:e].decode("utf-8") for s, e in zip(starts, ends)]
        s = cls(capacity)
        s.counters = dict(zip(keys, vals.tolist()))
        s.n_total, s.err = n_total, err
        return s
