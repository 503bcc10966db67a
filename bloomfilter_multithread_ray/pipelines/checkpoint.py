"""Checkpoint-resumable sketch build with per-partition lineage.

North-rule requirement (SURVEY §4.1 checkpoint/resume row, §7 step 5):
the build phase is split into **epochs**, each covering an explicit
set of input Parquet fragments. After every epoch the per-partition
sketches land in the store as Parquet plus an atomically-committed
manifest recording exactly which fragments each epoch consumed
(lineage) and per-partition metrics (rows, grams, fill ratio — the
reference's fill counters, ``src/main.cpp:81,204-205``, made durable).

A resumed run diffs the input's fragment list against the manifest
and processes only the remainder — replaying a crashed epoch is safe
because an epoch directory is only referenced by the manifest after
its Parquet is fully written (write → fsync-rename commit order), and
sketch merge is associative/commutative so epoch granularity never
changes the final merged sketch (property-tested in
tests/test_merge_properties.py).

Store layout::

    {store}/manifest.json                      # config + epochs + lineage
    {store}/epochs/epoch-0000/sketches/*.parquet   (part, sketch, n_added, fill_ratio)

Scale notes: fragments-per-epoch bounds the blast radius of a
failure; the manifest holds only fragment *paths* (O(files), not
O(rows)); merged loads stream epoch parquet directories one at a
time.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING, Callable

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.base import Sketch, deserialize_sketch
from ..stages.kgram import make_kgram_hash_fn
from ..stages.sketch_agg import PartialMergeAgg, SketchAgg, make_partial_combiner  # noqa: F401

if TYPE_CHECKING:
    pass


def _list_fragments(input_path: str) -> list[str]:
    import pyarrow.dataset as pads

    return sorted(pads.dataset(input_path, format="parquet").files)


def _manifest_path(store: str) -> str:
    return os.path.join(store, "manifest.json")


def read_manifest(store: str) -> dict | None:
    try:
        with open(_manifest_path(store)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _commit_manifest(store: str, manifest: dict) -> None:
    tmp = _manifest_path(store) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, default=str)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(store))
    # the rename IS the commit point — fsync the directory entry too,
    # else a power-fail can lose the rename despite the fsynced data
    dfd = os.open(store, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def processed_fragments(manifest: dict | None) -> set[str]:
    if not manifest:
        return set()
    return {f for e in manifest["epochs"] for f in e["fragments"]}


def incremental_build(
    input_path: str,
    store: str,
    *,
    factory: Callable[[], Sketch],
    factory_desc: dict,
    k: int,
    num_partitions: int,
    tokens_col: str = "tokens",
    max_fragments: int | None = None,
    allow_input_change: bool = False,
) -> dict:
    """Process up-to ``max_fragments`` not-yet-consumed fragments as one
    epoch; returns the committed manifest. No-op (returns the current
    manifest) when every fragment is already covered.

    ``max_fragments`` is the epoch size knob — a crashed epoch replays
    at most that many fragments' work.
    """
    import ray.data

    os.makedirs(store, exist_ok=True)
    # normalize through JSON so the comparison below sees exactly what a
    # committed manifest would contain (default=str stringifies numpy
    # scalars; tuples become lists) — otherwise an identical config
    # would "mismatch" on resume
    config = json.loads(
        json.dumps({"k": k, "num_partitions": num_partitions, **factory_desc}, default=str)
    )
    manifest = read_manifest(store)
    if manifest is None:
        manifest = {"config": config, "input_path": input_path, "epochs": []}
    else:
        if manifest["config"] != config:
            raise ValueError("store config mismatch — refusing to mix sketch configs")
        if manifest.get("input_path") != input_path and not allow_input_change:
            # resuming against a different input would silently merge two
            # corpora's fragments into one lineage
            raise ValueError(
                f"store was built from {manifest.get('input_path')!r}, resume asked "
                f"for {input_path!r} — pass allow_input_change=True to merge corpora"
            )

    done = processed_fragments(manifest)
    todo = [f for f in _list_fragments(input_path) if f not in done]
    if not todo:
        return manifest
    if max_fragments is not None:
        todo = todo[:max_fragments]

    epoch_no = len(manifest["epochs"])
    epoch_dir = os.path.join(store, "epochs", f"epoch-{epoch_no:04d}")
    sk_dir = os.path.join(epoch_dir, "sketches")
    if os.path.exists(epoch_dir):
        # orphan from a crash after write / before manifest commit —
        # not referenced by the manifest, safe to clear and replay
        import shutil

        shutil.rmtree(epoch_dir)

    ds = ray.data.read_parquet(todo, columns=[tokens_col])
    hash_fn = make_kgram_hash_fn(k, num_partitions, tokens_col=tokens_col)
    hashed = ds.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)
    # same optimized shape as the flagship build: map-side partial
    # combine, then a blob-row groupby merge (live-object accumulators)
    partials = hashed.map_batches(
        make_partial_combiner(factory), batch_format="pyarrow", zero_copy_batch=True
    )
    sketches = partials.groupby("part").aggregate(PartialMergeAgg(factory))

    def add_metrics(batch: pa.Table) -> pa.Table:
        n_added, fill = [], []
        for blob in batch.column("sketch"):
            s = deserialize_sketch(blob.as_py())
            n_added.append(getattr(s, "n_added", 0))
            fill.append(s.fill_ratio() if hasattr(s, "fill_ratio") else float("nan"))
        return batch.append_column("n_added", pa.array(n_added, pa.int64())).append_column(
            "fill_ratio", pa.array(fill, pa.float64())
        )

    sketches.map_batches(add_metrics, batch_format="pyarrow").write_parquet(sk_dir)
    # durability barrier BEFORE the manifest references this epoch:
    # fsync every epoch file (and the dir entry) so a crash after the
    # manifest rename can never leave it pointing at torn parquet
    for name in sorted(os.listdir(sk_dir)):
        fd = os.open(os.path.join(sk_dir, name), os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    dfd = os.open(sk_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)

    # metrics for the manifest (small: one row per partition)
    mtbl = pq.read_table(sk_dir, columns=["part", "n_added", "fill_ratio"])
    metrics = {
        str(p): {"n_added": int(n), "fill_ratio": float(fr)}
        for p, n, fr in zip(
            mtbl.column("part").to_pylist(),
            mtbl.column("n_added").to_pylist(),
            mtbl.column("fill_ratio").to_pylist(),
        )
    }
    manifest["epochs"].append(
        {
            "epoch": epoch_no,
            "fragments": todo,
            "committed_unix": time.time(),
            "partition_metrics": metrics,
        }
    )
    _commit_manifest(store, manifest)  # commit point: epoch now visible
    return manifest


def build_to_completion(input_path: str, store: str, **kw) -> dict:
    """Drive :func:`incremental_build` until every fragment is covered.

    Terminates on fragment-set coverage (not manifest identity), so an
    empty input directory returns immediately instead of spinning.
    """
    while True:
        manifest = incremental_build(input_path, store, **kw)
        if set(_list_fragments(input_path)) <= processed_fragments(manifest):
            return manifest


def load_merged(store: str) -> dict[int, Sketch]:
    """Merge every committed epoch's shards → {part: Sketch}."""
    manifest = read_manifest(store)
    if manifest is None:
        raise FileNotFoundError(f"no manifest in {store}")
    shards: dict[int, Sketch] = {}
    for e in manifest["epochs"]:
        sk_dir = os.path.join(store, "epochs", f"epoch-{e['epoch']:04d}", "sketches")
        tbl = pq.read_table(sk_dir, columns=["part", "sketch"])
        for p, blob in zip(tbl.column("part").to_pylist(), tbl.column("sketch").to_pylist()):
            s = deserialize_sketch(blob)
            if p in shards:
                shards[p].merge(s)
            else:
                shards[p] = s
    return shards


def lineage_table(store: str) -> pa.Table:
    """Flattened lineage/metrics: one row per (epoch, partition)."""
    manifest = read_manifest(store)
    rows = {"epoch": [], "part": [], "n_fragments": [], "n_added": [], "fill_ratio": []}
    for e in manifest["epochs"] if manifest else []:
        for p, m in e.get("partition_metrics", {}).items():
            rows["epoch"].append(e["epoch"])
            rows["part"].append(int(p))
            rows["n_fragments"].append(len(e["fragments"]))
            rows["n_added"].append(m["n_added"])
            rows["fill_ratio"].append(m["fill_ratio"])
    return pa.table(
        {
            "epoch": pa.array(rows["epoch"], pa.int32()),
            "part": pa.array(rows["part"], pa.int32()),
            "n_fragments": pa.array(rows["n_fragments"], pa.int32()),
            "n_added": pa.array(rows["n_added"], pa.int64()),
            "fill_ratio": pa.array(rows["fill_ratio"], pa.float64()),
        }
    )
