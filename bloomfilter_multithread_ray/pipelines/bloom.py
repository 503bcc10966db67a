"""Flagship pipeline: partitioned Bloom membership build + probe.

Ray Data re-expression of the reference's two phases (SURVEY §3):

A-build (``src/main.cpp:114-135``):
    read_parquet → map_batches(k-gram hash, pyarrow zero-copy)
    → groupby("part").aggregate(SketchAgg(Bloom))  # shuffle = the FIFOs
    → sketch-store parquet + manifest               # the TODO serializer

B-query (``src/main.cpp:142-264``):
    read_parquet → map_batches(BloomProbe actor pool)  # store broadcast
    → {doc_id, pos, member}                            # sort replaces ring

Key scale properties:
- the only all-to-all is the build's hash shuffle of (part, gh) pairs —
  the honest equivalent of the reference streaming every k-mer through
  its FIFOs; per-partition partial sketches pre-aggregate inside each
  shuffle block before the tree merge.
- probe is map-only: the store is ``ray.put`` once and read by every
  actor in ``__init__`` (broadcast, never re-shipped per batch). For
  stores too big for one worker's heap, probe by routing
  (groupby("part")) instead — see ``probe_bloom(routed=True)``.
- the store is partitioned Parquet + manifest → resumable / reusable
  across jobs.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import kgram_hashes_flat, partition_of
from ..state import BloomFilter
from ..state.base import Sketch, deserialize_sketch
from ..stages.kgram import list_column_to_numpy, make_kgram_hash_fn
from ..stages.sketch_agg import PartialMergeAgg, SketchAgg, make_partial_combiner  # noqa: F401

if TYPE_CHECKING:
    from ray.data import Dataset

# Which payload the LAST driver-side probe plan chose — "matrix"
# (all-Bloom stacked plasma matrix fast path) or "mask" (mixed-sketch
# per-partition fallback). Read by bench.py so every recorded probe
# timing is attributable to the path that actually ran.
LAST_PROBE_PATH: str | None = None


def build_partitioned_bloom(
    ds: "Dataset",
    *,
    k: int,
    num_partitions: int,
    bits_per_partition: int,
    num_hashes: int = 4,
    canonical: bool = False,
    complement=None,
    salt_bits: int = 0,
    tokens_col: str = "tokens",
    variant: str = "classic",
) -> "Dataset":
    """tokens table → Dataset of {part: int32, sketch: binary}.

    With ``salt_bits`` > 0, hot partitions are first built as 2^s
    sub-shards (better shuffle balance on skewed token sources), then
    un-salted by a second tiny merge groupby — possible only because
    the sketches are mergeable (SURVEY §4 skew).

    ``variant="blocked"`` builds register-blocked filters
    (:class:`~..state.bloom_blocked.BlockedBloomFilter`): all K bits of
    a key in one 64-bit word, so the probe is ONE gather instead of K —
    measured 3× probe throughput and 5× less broadcast memory at 1.5×
    bits for BETTER FPR (BASELINE.md blocked-Bloom A/B). Same mergeable
    plan either way (word-OR merge is order-free like bit-OR).
    """
    if variant == "classic":
        factory = lambda: BloomFilter(bits_per_partition, num_hashes)  # noqa: E731
    elif variant == "blocked":
        from ..state import BlockedBloomFilter

        factory = lambda: BlockedBloomFilter(bits_per_partition, num_hashes)  # noqa: E731
    else:
        raise ValueError(f"variant must be classic|blocked, got {variant!r}")
    combiner = make_partial_combiner(factory)

    # fused hash + map-side combine: one UDF goes tokens → sparse
    # partial blobs at the numpy level, never materializing the
    # intermediate (part, gh) Arrow table (a 1M-row round-trip per
    # block); the shuffle still moves O(blocks × partitions) blob
    # rows, not hash rows
    def hash_and_combine(batch: pa.Table) -> pa.Table:
        flat, offsets = list_column_to_numpy(batch, tokens_col)
        gh, _, _ = kgram_hashes_flat(
            flat, offsets, k, canonical=canonical, complement=complement
        )
        part = partition_of(gh, num_partitions)
        if salt_bits:
            salt = (gh >> np.uint64(40)) & np.uint64((1 << salt_bits) - 1)
            part = (
                part.astype(np.int64) * (1 << salt_bits) + salt.astype(np.int64)
            ).astype(np.int32)
        return combiner.from_arrays(part, gh)

    partials = ds.map_batches(
        hash_and_combine, batch_format="pyarrow", zero_copy_batch=True
    )
    sketches = partials.groupby("part").aggregate(PartialMergeAgg(factory))
    if salt_bits:
        shift = 1 << salt_bits

        def unsalt(batch: pa.Table) -> pa.Table:
            base = pa.array(
                (batch.column("part").to_numpy() // shift).astype(np.int32)
            )
            return batch.set_column(batch.schema.get_field_index("part"), "part", base)

        sketches = (
            sketches.map_batches(unsalt, batch_format="pyarrow")
            .groupby("part")
            .aggregate(PartialMergeAgg(factory, on="sketch"))
        )
    return sketches


def write_sketch_store(sketch_ds: "Dataset", path: str, manifest: dict) -> dict:
    """Persist {part, sketch} + per-partition lineage metrics + manifest.

    Layout::

        {path}/manifest.json
        {path}/sketches/*.parquet   (part, sketch, n_added, fill_ratio)

    The metrics columns are the per-partition lineage/metrics required
    by the north rule (reference analog: the fill counters of
    ``src/main.cpp:81,204-205``).
    """

    def add_metrics(batch: pa.Table) -> pa.Table:
        n_added, fill = [], []
        for blob in batch.column("sketch"):
            s = deserialize_sketch(blob.as_py())
            n_added.append(getattr(s, "n_added", 0))
            fill.append(s.fill_ratio() if hasattr(s, "fill_ratio") else float("nan"))
        return batch.append_column("n_added", pa.array(n_added, pa.int64())).append_column(
            "fill_ratio", pa.array(fill, pa.float64())
        )

    os.makedirs(path, exist_ok=True)
    sk_dir = os.path.join(path, "sketches")
    manifest_path = os.path.join(path, "manifest.json")
    if os.path.exists(manifest_path):
        # invalidate the commit marker BEFORE touching sketch files: a
        # crash mid-rebuild must not leave a manifest describing
        # deleted/partial data (consumers use its existence as the
        # completed-store check)
        os.remove(manifest_path)
    if os.path.exists(sk_dir):
        # stale files from a previous store at this path would be read
        # alongside the new ones (write_parquet generates fresh file
        # names) — clear first; the manifest rename below is the commit
        import shutil

        shutil.rmtree(sk_dir)
    with_metrics = sketch_ds.map_batches(add_metrics, batch_format="pyarrow")
    # hive-partitioned by part: the routed probe opens exactly ONE
    # part=N directory per group instead of filter-scanning the store
    with_metrics.write_parquet(sk_dir, partition_cols=["part"])
    manifest = dict(manifest, created_unix=time.time())
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    os.replace(tmp, manifest_path)  # atomic commit marker
    return manifest


def load_sketch_store(path: str) -> tuple[dict[int, Sketch], dict]:
    """Read a sketch store → ({part: Sketch}, manifest)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    tbl = pq.read_table(os.path.join(path, "sketches"), columns=["part", "sketch"])
    shards = {
        int(p): deserialize_sketch(s)
        for p, s in zip(tbl.column("part").to_pylist(), tbl.column("sketch").to_pylist())
    }
    return shards, manifest


class BloomProbe:
    """Actor-pool probe stage (reference ``splitQueryBF``,
    ``src/SkmerSplitter.cpp:91-151``).

    The sketch store is fetched ONCE per actor in ``__init__`` from a
    ``ray.put`` broadcast ref — never per batch. Emits one row per
    k-gram: {doc_id, pos, member} (zero false negatives by Bloom
    construction; ordering restored by a final sort instead of the
    reference's bounded ring, ``src/main.cpp:183-260``).
    """

    def __init__(
        self,
        shards_ref,
        *,
        k: int,
        num_partitions: int,
        canonical: bool = False,
        complement=None,
        tokens_col: str = "tokens",
        id_col: str = "doc_id",
        partition_mode: str = "hash",
    ):
        import ray

        shards = ray.get(shards_ref) if not isinstance(shards_ref, dict) else shards_ref

        def revive(s):
            if isinstance(s, Sketch):
                return s
            if isinstance(s, tuple) and s and s[0] == "bloom_bits":
                # zero-copy view over the plasma-shared bit array
                _, num_bits, num_hashes, n_added, bits = s
                return BloomFilter.from_bits(num_bits, num_hashes, bits, n_added)
            return deserialize_sketch(s)

        self.M = None  # stacked-matrix fast path (see probe_bloom)
        self.W = None  # blocked-word matrix fast path (one gather/key)
        if isinstance(shards, tuple) and shards and shards[0] == "bloom_matrix":
            _, num_bits, num_hashes, M = shards
            self.M = M  # (P, num_bits) uint8, zero-copy plasma view
            self.Mflat = M.ravel()
            self.Mbits = int(num_bits)
            self._ref_bf = BloomFilter.from_bits(num_bits, num_hashes, M[0], 0)
            self.shards = {}
        elif isinstance(shards, tuple) and shards and shards[0] == "blocked_matrix":
            from ..state import BlockedBloomFilter

            _, num_bits, num_hashes, W = shards
            self.W = W  # (P, n_words) uint64, zero-copy plasma view
            self.Wflat = W.ravel()
            self.Wwords = int(num_bits) // 64
            self._ref_bb = BlockedBloomFilter(num_bits, num_hashes)
            self.shards = {}
        else:
            self.shards = {p: revive(s) for p, s in shards.items()}
        self.k = k
        self.num_partitions = num_partitions
        self.canonical = canonical
        self.complement = complement
        self.tokens_col = tokens_col
        self.id_col = id_col
        if partition_mode not in ("hash", "minimizer"):
            raise ValueError(f"partition_mode must be hash|minimizer, got {partition_mode!r}")
        if partition_mode == "minimizer" and (canonical or complement is not None):
            # skmer stores hold forward-strand non-canonical hashes only;
            # probing them canonically would silently break the
            # zero-false-negative contract
            raise ValueError("partition_mode='minimizer' does not support canonical/complement")
        self.partition_mode = partition_mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, offsets = list_column_to_numpy(batch, self.tokens_col)
        gh, row_idx, pos = kgram_hashes_flat(
            flat, offsets, self.k, canonical=self.canonical, complement=self.complement
        )
        if self.partition_mode == "minimizer":
            # intrinsic-minimizer routing (stores built by
            # skmer.build_partitioned_bloom_skmer); 1:1 aligned with gh
            from .skmer import kgram_minimizer_parts

            part, _ = kgram_minimizer_parts(
                flat, offsets, self.k, self.num_partitions
            )
        else:
            part = partition_of(gh, self.num_partitions)
        member = np.zeros(len(gh), dtype=bool)
        if len(gh) and self.M is not None:
            # stacked-matrix path: all shard bitmaps live in ONE
            # plasma-resident (P, num_bits) array, so the probe is one
            # flat fancy gather per hash function — no per-partition
            # dispatch at all. (A/B under a concurrent 12-actor pool:
            # per-partition boolean-mask loop 11.4 s, sort-segment
            # 16-19 s, this path — see commit — the mask loop re-reads
            # part P times and the sort's random moves thrash under
            # pool-wide DRAM contention.)
            base = part.astype(np.int64) * self.Mbits
            h = np.ascontiguousarray(gh, dtype=np.uint64)
            member = np.ones(len(gh), dtype=bool)
            for i in range(self._ref_bf.num_hashes):
                idx = self._ref_bf._indices(h, i).astype(np.int64)
                member &= self.Mflat[base + idx] != 0
        elif len(gh) and self.W is not None:
            # blocked-matrix path: K bits live in one 64-bit word, so
            # the whole probe is ONE flat gather + an in-register mask
            # test — the cache-line discipline of Putze et al. 2009
            # (BASELINE.md blocked-Bloom A/B: 3× the classic matrix
            # path's probe throughput at 5× less broadcast memory)
            widx, mask = self._ref_bb._word_and_mask(gh)
            flat_idx = part.astype(np.int64) * self.Wwords + widx
            member = (self.Wflat[flat_idx] & mask) == mask
        elif len(gh):
            # mixed / non-Bloom sketch fallback: per-partition mask loop
            for p in np.unique(part):
                mask = part == p
                shard = self.shards.get(int(p))
                if shard is not None:
                    member[mask] = shard.contains(gh[mask])
        ids = batch.column(self.id_col).combine_chunks()
        return pa.table(
            {
                "doc_id": ids.take(pa.array(row_idx, type=pa.int64())),
                "pos": pa.array(pos, pa.int32()),
                "member": pa.array(member),
            }
        )


def probe_bloom(
    ds: "Dataset",
    shards: dict[int, Sketch],
    *,
    k: int,
    num_partitions: int,
    canonical: bool = False,
    complement=None,
    concurrency: int | None = None,
    batch_size: int | None = 1024,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    partition_mode: str = "hash",
) -> "Dataset":
    """Map-only membership probe: {doc_id, pos, member} per k-gram.

    Bloom shard bit arrays are broadcast UNPACKED as numpy arrays: each
    actor's ``ray.get`` maps the same plasma buffer zero-copy, so N
    actors share one in-memory copy per node instead of each paying a
    deserialize + unpack of the whole store.

    ``concurrency`` defaults to about half the cluster's CPUs (capped
    at 12): an actor pool equal to the WHOLE cluster starves the
    upstream read / downstream aggregate operators and deadlocks the
    stream (measured at num_cpus=4 with concurrency=4 — BASELINE.md).
    """
    import ray

    global LAST_PROBE_PATH

    if partition_mode not in ("hash", "minimizer"):
        raise ValueError(
            f"partition_mode must be hash|minimizer, got {partition_mode!r}"
        )
    if partition_mode == "minimizer" and (canonical or complement is not None):
        raise ValueError(
            "partition_mode='minimizer' does not support canonical/complement "
            "(skmer stores hold forward-strand non-canonical hashes)"
        )
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = max(2, min(12, cpus // 2))

    from ..state import BlockedBloomFilter

    blooms = {p: s for p, s in shards.items() if isinstance(s, BloomFilter)}
    shapes = {(s.num_bits, s.num_hashes) for s in blooms.values()}
    blocked = {p: s for p, s in shards.items() if isinstance(s, BlockedBloomFilter)}
    bshapes = {(s.num_bits, s.num_hashes) for s in blocked.values()}
    LAST_PROBE_PATH = (
        "blocked_matrix"
        if (shards and len(blocked) == len(shards) and len(bshapes) == 1)
        else "matrix"
        if (len(blooms) == len(shards) and len(shapes) == 1)
        else "mask"
    )
    if LAST_PROBE_PATH == "blocked_matrix":
        # all-blocked, uniform shape → stack the packed word arrays into
        # one (P, n_words) uint64 matrix (8× denser than the byte-per-bit
        # classic matrix); probe = ONE flat gather + mask test per key
        num_bits, num_hashes = next(iter(bshapes))
        W = np.zeros((num_partitions, num_bits // 64), dtype=np.uint64)
        for p, s in blocked.items():
            W[int(p)] = s.words
        payload: object = ("blocked_matrix", num_bits, num_hashes, W)
    elif len(blooms) == len(shards) and len(shapes) == 1:
        # all-Bloom, uniform shape → stack every shard's bitmap into one
        # (P, num_bits) matrix. ONE driver-side copy, then every actor on
        # a node shares the single plasma buffer zero-copy; the probe
        # becomes a flat fancy gather per hash (see BloomProbe.__call__)
        num_bits, num_hashes = next(iter(shapes))
        M = np.zeros((num_partitions, num_bits), dtype=np.uint8)
        for p, s in blooms.items():
            M[int(p)] = s.bits
        payload: object = ("bloom_matrix", num_bits, num_hashes, M)
    else:
        payload = {}
        for p, s in shards.items():
            if isinstance(s, BloomFilter):
                payload[p] = ("bloom_bits", s.num_bits, s.num_hashes, s.n_added, s.bits)
            else:
                payload[p] = s.serialize()
    shards_ref = ray.put(payload)
    return ds.map_batches(
        BloomProbe,
        fn_constructor_kwargs=dict(
            shards_ref=shards_ref,
            k=k,
            num_partitions=num_partitions,
            canonical=canonical,
            complement=complement,
            tokens_col=tokens_col,
            id_col=id_col,
            partition_mode=partition_mode,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def probe_bloom_routed(
    ds: "Dataset",
    store_path: str,
    *,
    k: int,
    num_partitions: int,
    canonical: bool = False,
    complement=None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> "Dataset":
    """Routed membership probe: shuffle k-grams by ``part`` and load only
    that partition's sketch inside each group task.

    The scale path when the sketch store exceeds one worker's heap
    (broadcast probe needs all P shards resident everywhere; routing
    needs exactly one). Costs one all-to-all of {part, gh, doc_id, pos}
    rows — the same trade the reference makes by streaming every query
    k-mer through the per-partition FIFOs (``src/main.cpp:142-160``).
    Output schema matches :func:`probe_bloom`: {doc_id, pos, member}.
    """
    import pyarrow.dataset as pads

    hash_fn = make_kgram_hash_fn(
        k, num_partitions, tokens_col=tokens_col, canonical=canonical,
        complement=complement, with_identity=True, id_col=id_col,
    )
    hashed = ds.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)
    sk_dir = os.path.join(store_path, "sketches")

    def probe_group(group: pa.Table) -> pa.Table:
        part = int(group.column("part")[0].as_py())
        part_dir = os.path.join(sk_dir, f"part={part}")
        gh = group.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
        if os.path.isdir(part_dir):
            tbl = pads.dataset(part_dir, format="parquet").to_table(columns=["sketch"])
            shard = deserialize_sketch(tbl.column("sketch")[0].as_py())
            member = shard.contains(gh)
        else:  # partition absent from the build => non-member
            member = np.zeros(len(gh), dtype=bool)
        return pa.table(
            {
                "doc_id": group.column(id_col),
                "pos": group.column("pos"),
                "member": pa.array(member),
            }
        )

    return hashed.groupby("part").map_groups(probe_group, batch_format="pyarrow")


def build_and_store(
    ds: "Dataset",
    store_path: str,
    *,
    k: int,
    num_partitions: int,
    bits_per_partition: int,
    num_hashes: int = 4,
    canonical: bool = False,
    complement: str | None = None,
    salt_bits: int = 0,
    variant: str = "classic",
) -> dict:
    """Build phase end-to-end: corpus → sketch store on disk."""
    sk = build_partitioned_bloom(
        ds,
        k=k,
        num_partitions=num_partitions,
        bits_per_partition=bits_per_partition,
        num_hashes=num_hashes,
        canonical=canonical,
        complement=complement,
        salt_bits=salt_bits,
        variant=variant,
    )
    manifest = {
        "algo": "bloom",
        "variant": variant,
        "k": k,
        "num_partitions": num_partitions,
        "bits_per_partition": bits_per_partition,
        "num_hashes": num_hashes,
        "canonical": canonical,
        "complement": complement,
        "salt_bits": salt_bits,
        # gram -> shard routing function; a probe MUST use the same one
        # ("hash" here; "minimizer" for skmer.build_and_store_skmer)
        "partition_fn": "hash",
    }
    return write_sketch_store(sk, store_path, manifest)
