"""Opt-in minimizer-partitioned super-k-gram build — the reference's
run-length locality idea (``src/SkmerExtractor.cpp:76-159``) as an A/B
alternative to the default build (``pipelines/bloom.py``).

The default build partitions each k-gram by ``hash % P`` (uniform
balance) and pre-aggregates inside every block (map-side combine), so
the all-to-all moves O(blocks × P) partial-sketch blobs. The reference
instead routes by MINIMIZER — the smallest m-mer inside the k-mer —
because consecutive k-mers usually share their minimizer, letting one
shipped "super-k-mer" (the underlying sequence run) carry many k-mers
at ~(m + k - 1)/m of the token bytes instead of one 8-byte hash each.

This module is that idea for token streams:

- partition key of a k-gram = ``min(splitmix64(tok) for tok in gram)
  % P`` — INTRINSIC to the gram (a probe recomputes it from the gram
  alone, no neighbor context), deterministic across build and probe;
- the build segments each row's gram stream into maximal runs of
  constant partition and ships one ``{part, toks}`` row per run (the
  run's ``m + k - 1`` tokens), never per-gram hashes;
- ``groupby(part)`` then rehashes each segment inside its partition
  task and builds that partition's Bloom shard.

Trade-offs vs the default (measured — see BASELINE.md "Run-length
skmer A/B"): shuffle bytes scale with corpus tokens (÷ run-length
compression) instead of O(blocks × P) blobs, and minimizer routing is
skewed by construction (SURVEY §2 note on #3/#6). Kept opt-in; the
store records ``partition_fn="minimizer"`` in its manifest and
``probe_bloom(partition_mode="minimizer")`` probes it.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from ..functions.hashing import UINT64, kgram_hashes_flat, partition_of, splitmix64
from ..stages.kgram import list_column_to_numpy
from ..state import BloomFilter

if TYPE_CHECKING:
    from ray.data import Dataset


def kgram_minimizer_parts(
    flat_tokens: np.ndarray,
    offsets: np.ndarray,
    k: int,
    num_partitions: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-gram minimizer partition ids, aligned 1:1 with
    :func:`functions.hashing.kgram_hashes_flat` output order.

    Returns ``(part, gram_start)``: for every k-gram that fits inside
    one row (same mask as ``kgram_hashes_flat``), its partition
    ``min(splitmix64(tok) in window) % P`` and the gram's start index
    into ``flat_tokens``.
    """
    from numpy.lib.stride_tricks import sliding_window_view

    flat = np.asarray(flat_tokens)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(flat)
    if n < k or len(offsets) < 2:
        return np.empty(0, np.int32), np.empty(0, np.int64)
    u = splitmix64(flat.astype(UINT64, copy=False))
    wm = sliding_window_view(u, k).min(axis=1)  # (n - k + 1,)
    # row of every flat index; a window is valid iff start and end
    # share a row (identical masking to kgram_hashes_flat)
    row = np.repeat(np.arange(len(offsets) - 1, dtype=np.int64), np.diff(offsets))
    valid = row[: n - k + 1] == row[k - 1 :]
    g = np.flatnonzero(valid)
    return partition_of(wm[g], num_partitions), g


def _segment_rows_fn(k: int, num_partitions: int, tokens_col: str):
    """batch → {part, toks}: one row per maximal constant-minimizer run
    (the super-k-gram), carrying the run's ``m + k - 1`` tokens."""

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = list_column_to_numpy(batch, tokens_col)
        vtype = pa.from_numpy_dtype(np.asarray(flat).dtype)
        part, g = kgram_minimizer_parts(flat, offsets, k, num_partitions)
        if len(g) == 0:
            return pa.table(
                {"part": pa.array([], pa.int32()),
                 "toks": pa.array([], pa.list_(vtype))}
            )
        # run boundary: partition changes OR the gram stream has a gap
        # (row boundary / masked windows)
        brk = np.ones(len(g), dtype=bool)
        brk[1:] = (part[1:] != part[:-1]) | (g[1:] != g[:-1] + 1)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(g)) - 1  # last gram idx of each run
        tok_start = g[starts]
        lens = (g[ends] + k) - tok_start  # m + k - 1 tokens per run
        total = int(lens.sum())
        base = np.repeat(tok_start - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens)
        vals = np.asarray(flat)[base + np.arange(total, dtype=np.int64)]
        off32 = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(lens, out=off32[1:])
        toks = pa.ListArray.from_arrays(pa.array(off32), pa.array(vals, vtype))
        return pa.table({"part": pa.array(part[starts], pa.int32()), "toks": toks})

    return fn


def build_partitioned_bloom_skmer(
    ds: "Dataset",
    *,
    k: int,
    num_partitions: int,
    bits_per_partition: int,
    num_hashes: int = 4,
    tokens_col: str = "tokens",
) -> "Dataset":
    """tokens table → {part: int32, sketch: binary}, minimizer-routed.

    Same output contract as :func:`bloom.build_partitioned_bloom`, but
    partition membership is by intrinsic gram minimizer and the shuffle
    ships token RUNS (super-k-grams) instead of per-block partial
    blobs. Probe the result with
    ``probe_bloom(..., partition_mode="minimizer")``.
    """

    def build_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        flat, offs = list_column_to_numpy(group, "toks")
        gh, _, _ = kgram_hashes_flat(flat, offs, k)
        s = BloomFilter(bits_per_partition, num_hashes)
        s.update_hashes(gh)
        return pa.table(
            {"part": pa.array([part], pa.int32()),
             "sketch": pa.array([s.serialize()], pa.binary())}
        )

    segs = ds.map_batches(
        _segment_rows_fn(k, num_partitions, tokens_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return segs.groupby("part").map_groups(build_group, batch_format="pyarrow")


def build_and_store_skmer(
    ds: "Dataset",
    store_path: str,
    *,
    k: int,
    num_partitions: int,
    bits_per_partition: int,
    num_hashes: int = 4,
    tokens_col: str = "tokens",
) -> dict:
    """Minimizer-routed build phase end-to-end: corpus → sketch store.

    The manifest records ``partition_fn="minimizer"`` so probes can
    validate the routing mode (the CLI probe picks it up and passes
    ``partition_mode="minimizer"`` automatically; mismatched modes
    would silently probe the wrong shards).
    """
    from .bloom import write_sketch_store

    sk = build_partitioned_bloom_skmer(
        ds,
        k=k,
        num_partitions=num_partitions,
        bits_per_partition=bits_per_partition,
        num_hashes=num_hashes,
        tokens_col=tokens_col,
    )
    manifest = {
        "algo": "bloom",
        "k": k,
        "num_partitions": num_partitions,
        "bits_per_partition": bits_per_partition,
        "num_hashes": num_hashes,
        "canonical": False,
        "complement": None,
        "salt_bits": 0,
        "partition_fn": "minimizer",
    }
    return write_sketch_store(sk, store_path, manifest)
