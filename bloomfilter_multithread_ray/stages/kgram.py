"""k-gram hashing stage: tokens rows → (part, gram hash[, doc_id, pos]).

The Ray Data form of the reference's extractor thread
(``extractSkmers``, ``src/SkmerExtractor.cpp:59-182``): rolling-hash
every k-window, derive the content partition key, tag positions. One
``map_batches`` call covers stages 1–3 of the reference pipeline
(read → window/hash → segment/route, SURVEY §3.1) with zero per-gram
Python objects: the Arrow list column's value buffer is processed as
one flat numpy array per batch.

Stateless → plain function for ``map_batches`` (tasks, not actors).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..functions.hashing import kgram_hashes_flat, partition_of


def list_column_to_numpy(tbl: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """Arrow list<int> column → (flat values, row offsets), zero-copy.

    Handles chunked and sliced arrays by normalizing offsets to start
    at 0 and concatenating chunks.
    """
    chunked = tbl.column(col)
    flats, all_offsets = [], []
    base = 0
    chunks = chunked.chunks if isinstance(chunked, pa.ChunkedArray) else [chunked]
    for i, chunk in enumerate(chunks):
        offs = chunk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        vals = chunk.values.to_numpy(zero_copy_only=False)
        lo, hi = int(offs[0]), int(offs[-1])
        if lo != 0 or hi != len(vals):
            vals = vals[lo:hi]
            offs = offs - lo
        flats.append(vals)
        # skip the leading 0 of SUBSEQUENT chunks (by chunk ordinal —
        # `base == 0` would misfire when earlier chunks carry zero
        # values, inserting a phantom row)
        all_offsets.append(offs + base if i == 0 else offs[1:] + base)
        base += len(vals)
    flat = flats[0] if len(flats) == 1 else np.concatenate(flats)
    offsets = all_offsets[0] if len(all_offsets) == 1 else np.concatenate(all_offsets)
    return flat, offsets


def make_kgram_hash_fn(
    k: int,
    num_partitions: int,
    *,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    with_identity: bool = False,
    canonical: bool = False,
    complement=None,
    salt_bits: int = 0,
) -> Callable[[pa.Table], pa.Table]:
    """Build the per-batch k-gram hashing UDF.

    Output schema:
      - ``part: int32`` content-derived partition (h % P; the
        reference's ``fifo_nb = hmin % q``, ``src/SkmerExtractor.cpp:164``)
      - ``gh: uint64`` k-gram hash
      - with_identity: ``doc_id`` + ``pos: int32`` (clean replacement of
        the reference's global position counter, SURVEY §8.4)

    ``salt_bits``: statically salt partitions into 2^salt_bits
    sub-partitions by a *secondary* hash bit-slice — hot partitions
    split across sub-shards; sketches un-salt at merge time because
    they are mergeable (SURVEY §4 skew note). part' = part * 2^s + salt.
    """

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = list_column_to_numpy(batch, tokens_col)
        gh, row_idx, pos = kgram_hashes_flat(
            flat, offsets, k, canonical=canonical, complement=complement
        )
        part = partition_of(gh, num_partitions)
        if salt_bits:
            salt = (gh >> np.uint64(40)) & np.uint64((1 << salt_bits) - 1)
            part = (part.astype(np.int64) * (1 << salt_bits) + salt.astype(np.int64)).astype(
                np.int32
            )
        cols: dict[str, object] = {"part": part, "gh": gh}
        if with_identity:
            ids = batch.column(id_col).combine_chunks()
            cols["doc_id"] = ids.take(pa.array(row_idx, type=pa.int64()))
            cols["pos"] = pos
        return pa.table(cols)

    return fn
