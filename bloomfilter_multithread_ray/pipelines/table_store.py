"""Range-clustered parquet table store — CLUSTER BY for Ray Data.

Writes a dataset as a hive layout of contiguous key ranges
(``{path}/rid={i}/part.parquet``, rows sorted by the cluster column
inside each range) plus a JSON manifest of the split points, so later
scans with a key-range predicate open ONLY the overlapping range
directories — directory-level pruning before a single row group is
touched, the columnar-warehouse counterpart of the reference's
"route every k-mer to the shard that owns it" invariant
(``src/SkmerExtractor.cpp:164``: the partition function IS the index).

Scale shape:
- split points come from a distributed stride sample (each block
  contributes ≤ ``sample_per_block`` values, the driver folds
  O(blocks × sample) scalars once — never the column itself);
- range assignment is one vectorized ``searchsorted`` per batch;
- each range co-locates via the ONE fixed-fan-out shuffle every
  clustered write needs, sorts vectorized, and publishes atomically
  (tmp + rename), so a failed run leaves no torn files and a re-run
  with ``skip_existing`` rewrites only missing ranges;
- ``num_ranges`` is the granularity knob: ranges are the pruning AND
  resume unit. At 100 TB you raise it (one file per range stays
  bounded) rather than growing files.

Boundary semantics are owned by ``np.searchsorted(splits, x,
side="right")`` — the reader prunes with the SAME function the writer
assigned with, so no row can be pruned into the void; an exact
predicate still applies after pruning (pruning is I/O elision, not
filtering). Null cluster keys land in range 0 and are kept only by
unbounded scans (SQL: a comparison never admits NULL).
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    from ray.data import Dataset

MANIFEST_NAME = "_cluster_manifest.json"


def _to_numeric(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, str]:
    """Column -> (float64/int64 values, valid mask, kind). Kind is one of
    int / float / timestamp_us; invalid slots hold 0."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = np.asarray(col.is_valid())
    t = col.type
    if pa.types.is_timestamp(t):
        v = col.cast(pa.timestamp("us")).fill_null(0).to_numpy(
            zero_copy_only=False
        ).astype("datetime64[us]").view(np.int64)
        return v, valid, "timestamp_us"
    if pa.types.is_integer(t):
        return (
            col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64),
            valid,
            "int",
        )
    if pa.types.is_floating(t):
        return (
            col.fill_null(0.0).to_numpy(zero_copy_only=False).astype(np.float64),
            valid,
            "float",
        )
    raise TypeError(f"cluster column must be numeric or timestamp, got {t}")


def _bound_to_numeric(x, kind: str):
    if x is None:
        return None
    if kind == "timestamp_us":
        return int(pd.Timestamp(x).value // 1000)  # ns -> us
    return float(x) if kind == "float" else int(x)


def sample_splits(
    ds: "Dataset",
    col: str,
    *,
    num_ranges: int = 32,
    sample_per_block: int = 256,
) -> tuple[list, str]:
    """Equi-depth split points from a distributed stride sample →
    (sorted splits of length ≤ num_ranges-1, kind)."""
    cap = int(sample_per_block)

    def samp(t: pa.Table) -> pa.Table:
        v, valid, kind = _to_numeric(t.column(col))
        v = v[valid]
        if len(v) > cap:
            # deterministic stride positions: content-independent, so
            # re-runs over re-blocked input stay representative
            v = v[np.linspace(0, len(v) - 1, cap).astype(np.int64)]
        return pa.table(
            {"v": pa.array(np.sort(v)), "kind": pa.array([kind] * len(v))}
        )

    sdf = ds.select_columns([col]).map_batches(
        samp, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(sdf):
        raise ValueError(f"sample_splits: no non-null values in {col!r}")
    kind = sdf["kind"].iloc[0]
    v = np.sort(sdf["v"].to_numpy())
    qs = np.quantile(v, np.linspace(0, 1, int(num_ranges) + 1)[1:-1], method="nearest")
    splits = np.unique(qs)
    py = [float(s) if kind == "float" else int(s) for s in splits]
    return py, kind


def write_clustered(
    ds: "Dataset",
    path: str,
    cluster_col: str,
    *,
    num_ranges: int = 32,
    sample_per_block: int = 256,
    skip_existing: bool = True,
) -> pd.DataFrame:
    """Write ``ds`` clustered by ``cluster_col`` → manifest DataFrame
    {rid, n_rows, vmin, vmax, skipped} (vmin/vmax in the key's numeric
    kind: int64 / epoch-us for ints and timestamps, float64 for
    floats)."""
    splits_py, kind = sample_splits(
        ds, cluster_col, num_ranges=num_ranges, sample_per_block=sample_per_block
    )
    splits = np.array(splits_py, dtype=np.float64 if kind == "float" else np.int64)
    os.makedirs(path, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        v, valid, _k = _to_numeric(t.column(cluster_col))
        rid = np.searchsorted(splits, v, side="right").astype(np.int32)
        rid[~valid] = 0  # nulls cluster into range 0
        return t.append_column("__rid", pa.array(rid))

    def write_range(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        rid = int(g.column("__rid")[0].as_py())
        body = g.drop_columns(["__rid"])
        body = body.sort_by([(cluster_col, "ascending")])  # nulls sort last
        d = os.path.join(path, f"rid={rid}")
        fp = os.path.join(d, "part.parquet")
        skipped = bool(skip_existing and os.path.exists(fp))
        if not skipped:
            os.makedirs(d, exist_ok=True)
            tmp = fp + ".tmp"
            pq.write_table(body, tmp)
            os.replace(tmp, fp)  # atomic publish
        v, valid, _k = _to_numeric(body.column(cluster_col))
        vv = v[valid]
        # zone-map stats keep the key's own numeric kind — truncating a
        # float max to int would let the reader prune live rows
        conv = float if kind == "float" else int
        stat_t = pa.float64() if kind == "float" else pa.int64()
        return pa.table(
            {
                "rid": pa.array([rid], pa.int64()),
                "n_rows": pa.array([body.num_rows], pa.int64()),
                "vmin": pa.array([conv(vv.min()) if len(vv) else None], stat_t),
                "vmax": pa.array([conv(vv.max()) if len(vv) else None], stat_t),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )

    man = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__rid")
        .map_groups(write_range, batch_format="pyarrow")
        .to_pandas()
        .sort_values("rid")
        .reset_index(drop=True)
    )
    doc = {
        "cluster_col": cluster_col,
        "kind": kind,
        "gen": 0,  # compaction bumps this; data root = _data_root()
        "splits": splits_py,  # JSON ints are exact (no 2^53 rounding)
        "ranges": [
            # vmin/vmax are the range's zone map (int64 units; None for
            # an all-null range) — bounded scans prune on them, which is
            # what lets a predicate past the last split prove emptiness
            {
                "rid": int(r.rid),
                "n_rows": int(r.n_rows),
                "vmin": None
                if pd.isna(r.vmin)
                else (float(r.vmin) if kind == "float" else int(r.vmin)),
                "vmax": None
                if pd.isna(r.vmax)
                else (float(r.vmax) if kind == "float" else int(r.vmax)),
            }
            for r in man.itertuples()
        ],
    }
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return man


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST_NAME)) as f:
        return json.load(f)


def _data_root(path: str, man: dict) -> str:
    """Directory holding the manifest's CURRENT generation of range
    dirs + sidecars. Generation 0 (every fresh write, and manifests
    from before the field existed) is ``path`` itself; compaction K
    publishes a complete new layout under ``path/g{K}`` and makes the
    atomic manifest replace the single commit point — a crash at any
    earlier moment leaves the old generation fully intact and
    referenced, never a manifest pointing at moved/deleted files."""
    gen = int(man.get("gen", 0))
    return path if gen == 0 else os.path.join(path, f"g{gen}")


def _rid_file(root: str, rid) -> str:
    return os.path.join(root, f"rid={int(rid)}", "part.parquet")


def select_ranges(manifest: dict, lo=None, hi=None) -> list[int]:
    """Range ids a [lo, hi] scan must open: the split-interval overlap
    (reader-side mirror of the writer's searchsorted(side="right")
    assignment — same function, so no row prunes into the void),
    tightened by each range's recorded zone map (vmin/vmax), which is
    what lets a predicate beyond the last split prove emptiness. An
    all-null range (vmin None) never matches a bounded scan."""
    kind = manifest["kind"]
    splits = np.array(
        manifest["splits"], dtype=np.float64 if kind == "float" else np.int64
    )
    nlo = _bound_to_numeric(lo, kind)
    nhi = _bound_to_numeric(hi, kind)
    rid_lo = int(np.searchsorted(splits, nlo, side="right")) if nlo is not None else 0
    rid_hi = (
        int(np.searchsorted(splits, nhi, side="right"))
        if nhi is not None
        else (len(splits))
    )
    out = []
    for r in sorted(manifest["ranges"], key=lambda r: r["rid"]):
        if not (rid_lo <= r["rid"] <= rid_hi):
            continue
        vmin, vmax = r.get("vmin"), r.get("vmax")
        if (nlo is not None or nhi is not None) and vmin is None:
            continue  # all-null range: comparisons never admit NULL
        if nlo is not None and vmax is not None and vmax < nlo:
            continue
        if nhi is not None and vmin is not None and vmin > nhi:
            continue
        out.append(r["rid"])
    return out


def read_clustered(
    path: str,
    *,
    lo=None,
    hi=None,
    columns: list[str] | None = None,
) -> "Dataset":
    """Scan the store; with bounds, open only overlapping ``rid=`` dirs
    (directory pruning), then apply the exact inclusive predicate."""
    import pyarrow.dataset as pads

    import ray.data

    man = read_manifest(path)
    root = _data_root(path, man)
    col = man["cluster_col"]
    rids = select_ranges(man, lo, hi)
    need = list(columns) if columns is not None else None
    if need is not None and (lo is not None or hi is not None) and col not in need:
        need = need + [col]
    if not rids:
        # typed empty result: read zero rows from any one existing file
        any_rid = man["ranges"][0]["rid"] if man["ranges"] else None
        if any_rid is None:
            raise ValueError(f"empty store at {path}")
        # NOTE: partitioning=None + columns trips a Ray UnboundLocalError
        # (parquet_datasource._infer_data_and_partition_columns), so keep
        # the default hive inference and drop the synthetic rid column
        ds = ray.data.read_parquet(_rid_file(root, any_rid), columns=need).limit(0)
        ds = _drop_rid(ds, need)
        if columns is not None and need != list(columns):
            # same fix-up as the non-empty path: the cluster column
            # rode along for the filter and must not leak on a fully-
            # pruned scan (schema would differ from non-empty results)
            ds = ds.select_columns(list(columns))
        return ds
    files = [_rid_file(root, r) for r in rids]
    flt = None
    if lo is not None:
        flt = pads.field(col) >= _scalar(lo, man["kind"])
    if hi is not None:
        f2 = pads.field(col) <= _scalar(hi, man["kind"])
        flt = f2 if flt is None else (flt & f2)
    ds = ray.data.read_parquet(files, columns=need, filter=flt)
    ds = _drop_rid(ds, need)
    if columns is not None and need != list(columns):
        ds = ds.select_columns(list(columns))  # cluster col rode for the filter
    return ds


def _drop_rid(ds: "Dataset", need: list[str] | None) -> "Dataset":
    """Strip the hive-inferred ``rid`` partition column (an internal
    layout detail, not table data) unless the caller's column list
    already excludes it."""
    if need is not None and "rid" not in need:
        return ds  # column projection never materialized it
    schema = ds.schema()
    if schema is not None and "rid" in schema.names:
        return ds.drop_columns(["rid"])
    return ds


def _scalar(x, kind: str):
    if kind == "timestamp_us":
        return pd.Timestamp(x).to_datetime64()
    return x


# ----------------------------------------------- co-partitioned bucket store
BUCKET_MANIFEST = "_bucket_manifest.json"
_HASH_VERSION = "splitmix64/v1"  # int keys: hash64_ints; strings: hash_strings


def write_bucketed(
    ds: "Dataset",
    path: str,
    key: str,
    *,
    num_buckets: int = 32,
    skip_existing: bool = True,
) -> pd.DataFrame:
    """Write ``ds`` hash-bucketed by ``key`` (``{path}/bucket={i}/
    part.parquet``, manifest records the bucket count + hash version).
    Two stores bucketed with the SAME count and hash version are
    co-partitioned: equal keys live in equal bucket ids, which is what
    lets :func:`bucketed_join` run with NO shuffle at read time —
    bucketing pays the exchange once at write, every later join reads
    aligned bucket pairs map-only (the reference's ownership-by-
    partitioning, ``src/SkmerExtractor.cpp:164``, persisted).

    Null keys land in bucket 0 (they never match any join anyway).
    Returns {bucket, n_rows, skipped}.
    """
    from .join import _key_hash

    B = int(num_buckets)
    os.makedirs(path, exist_ok=True)

    def route(t: pa.Table) -> pa.Table:
        h, _valid = _key_hash(t.column(key))
        return t.append_column(
            "__bk", pa.array((h % np.uint64(B)).astype(np.int32))
        )

    def write_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        b = int(g.column("__bk")[0].as_py())
        body = g.drop_columns(["__bk"])
        d = os.path.join(path, f"bucket={b}")
        fp = os.path.join(d, "part.parquet")
        skipped = bool(skip_existing and os.path.exists(fp))
        if not skipped:
            os.makedirs(d, exist_ok=True)
            tmp = fp + ".tmp"
            pq.write_table(body, tmp)
            os.replace(tmp, fp)
        return pa.table(
            {"bucket": pa.array([b], pa.int64()),
             "n_rows": pa.array([body.num_rows], pa.int64()),
             "skipped": pa.array([skipped], pa.bool_())}
        )

    man = (
        ds.map_batches(route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bk")
        .map_groups(write_bucket, batch_format="pyarrow")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    doc = {"key": key, "num_buckets": B, "hash": _HASH_VERSION,
           "buckets": [int(b) for b in man.bucket]}
    tmp = os.path.join(path, BUCKET_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, BUCKET_MANIFEST))
    return man


def bucketed_join(
    left_path: str,
    right_path: str,
    *,
    how: str = "inner",
    columns: list[str] | None = None,
    right_columns: list[str] | None = None,
    suffix: str = "_r",
) -> "Dataset":
    """Zero-shuffle join of two co-partitioned bucket stores: a Dataset
    of bucket ids fans out, each task reads ONE aligned bucket pair and
    joins it with the Arrow hash-join kernel — no exchange of either
    side, ever. The manifests must agree on bucket count and hash
    version (validated); key names may differ.

    Output contract matches :func:`~.join.hash_join`: semi/anti emit
    left columns; inner/left append right non-key columns with
    ``suffix`` on collisions. SQL null-key semantics (never match).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray.data

    with open(os.path.join(left_path, BUCKET_MANIFEST)) as f:
        lman = json.load(f)
    with open(os.path.join(right_path, BUCKET_MANIFEST)) as f:
        rman = json.load(f)
    if lman["num_buckets"] != rman["num_buckets"] or lman["hash"] != rman["hash"]:
        raise ValueError(
            f"stores are not co-partitioned: left ({lman['num_buckets']}, "
            f"{lman['hash']}) vs right ({rman['num_buckets']}, {rman['hash']})"
        )
    if how not in ("inner", "left", "semi", "anti"):
        raise ValueError(f"bucketed_join supports inner/left/semi/anti, got {how!r}")
    lkey, rkey = lman["key"], rman["key"]
    B = lman["num_buckets"]
    have_l, have_r = set(lman["buckets"]), set(rman["buckets"])

    lcols = None if columns is None else list(dict.fromkeys([lkey] + list(columns)))
    rcols = None if right_columns is None else list(
        dict.fromkeys([rkey] + list(right_columns))
    )

    # fixed output schema (from one bucket pair's file schemas) so tasks
    # whose buckets are all absent still emit TYPED empty tables — Ray
    # cannot unify schema-less blocks with their peers
    def _file_schema(root, b, cols):
        s = pq.read_schema(os.path.join(root, f"bucket={b}", "part.parquet"))
        names = cols if cols is not None else s.names
        return [(n, s.field(n).type) for n in names]

    if not have_l:
        raise ValueError(f"empty bucket store at {left_path}")
    l_fields = _file_schema(left_path, min(have_l), lcols)
    out_fields = list(l_fields)
    if how in ("inner", "left") and have_r:
        l_names = {n for n, _t in l_fields}
        for n, t in _file_schema(right_path, min(have_r), rcols):
            if n != rkey:
                out_fields.append((n + suffix if n in l_names else n, t))
    empty = pa.Table.from_arrays(
        [pa.nulls(0, t) for _n, t in out_fields], names=[n for n, _t in out_fields]
    )

    def join_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for b in t.column("id").to_pylist():
            if b not in have_l:
                continue
            lt = pq.read_table(
                os.path.join(left_path, f"bucket={b}", "part.parquet"),
                columns=lcols,
            )
            if b not in have_r:
                rt = None
            else:
                rt = pq.read_table(
                    os.path.join(right_path, f"bucket={b}", "part.parquet"),
                    columns=rcols,
                )
                k = rt.column(rkey)
                if k.null_count:
                    rt = rt.filter(pc.is_valid(k))
            if rt is None or rt.num_rows == 0:
                if how == "anti":
                    outs.append(lt)
                elif how == "left":
                    # typed null right columns
                    if rt is not None:
                        r_out = [c for c in rt.column_names if c != rkey]
                        for c in r_out:
                            name = c + suffix if c in lt.column_names else c
                            lt = lt.append_column(
                                name, pa.nulls(lt.num_rows, rt.schema.field(c).type)
                            )
                        outs.append(lt)
                    else:
                        outs.append(lt)
                elif how in ("inner", "semi"):
                    pass
                continue
            if how in ("semi", "anti"):
                jt = "left semi" if how == "semi" else "left anti"
                outs.append(
                    lt.join(rt.select([rkey]), keys=[lkey], right_keys=[rkey],
                            join_type=jt)
                )
            else:
                r_out = [c for c in rt.column_names if c != rkey]
                rename = {c: (c + suffix if c in lt.column_names else c) for c in r_out}
                rt2 = rt.rename_columns(
                    [rkey if c == rkey else rename[c] for c in rt.column_names]
                )
                jt = "inner" if how == "inner" else "left outer"
                out_cols = lt.column_names + [rename[c] for c in r_out]
                outs.append(
                    lt.join(rt2, keys=[lkey], right_keys=[rkey], join_type=jt)
                    .select(out_cols)
                )
        if not outs:
            return empty
        return pa.concat_tables([empty] + outs, promote_options="permissive")

    ids = ray.data.range(B, override_num_blocks=B)
    return ids.map_batches(join_bucket, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------ snapshot diff
def snapshot_diff(
    old: "Dataset",
    new: "Dataset",
    key: str | list[str],
    *,
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    num_partitions: int = 32,
) -> "Dataset":
    """Change-data-capture between two snapshots → {key..., change}
    with ``change`` ∈ {added, removed, modified} (+ ``unchanged`` when
    requested). Each side reduces to (key, row-fingerprint) before the
    ONE key-hash exchange — payload columns never shuffle; the
    fingerprint is a 64-bit hash of the injectively-encoded compare
    columns (same missed-change odds as the repo's content-hash dedup:
    ~2⁻⁶⁴ per differing pair, documented stance of dedup_exact).

    ``compare_cols`` defaults to every shared non-key column; rows
    whose key appears only in ``new`` are ``added``, only in ``old``
    are ``removed``. Null compare values fingerprint distinctly from
    any real value (SQL ``IS DISTINCT FROM`` semantics).
    """
    import pyarrow.compute as pc

    from ..functions.hashing import hash_strings
    from .join import _encode_composite, hash_join

    keys = [key] if isinstance(key, str) else list(key)
    o_schema, n_schema = old.schema(), new.schema()
    if o_schema is None or n_schema is None:
        raise ValueError("snapshot_diff: both sides need a schema")
    if compare_cols is None:
        compare_cols = sorted(
            (set(o_schema.names) & set(n_schema.names)) - set(keys)
        )
    if not compare_cols:
        raise ValueError("snapshot_diff: no compare columns")

    def fingerprint(t: pa.Table) -> pa.Table:
        # per-COLUMN null encoding: a validity bit + length-prefixed
        # value per component. (_encode_composite would null the whole
        # tuple when ANY component is null, collapsing e.g. (NULL, 5)
        # and (NULL, 7) to one fingerprint — a real modification would
        # then read as 'unchanged', breaking IS DISTINCT FROM.)
        parts = []
        for c in compare_cols:
            s = pc.cast(t.column(c), pa.string())
            vbit = pc.if_else(pc.is_null(s), pa.scalar("0"), pa.scalar("1"))
            s = pc.fill_null(s, "")
            ln = pc.cast(pc.utf8_length(s), pa.string())
            parts.append(pc.binary_join_element_wise(vbit, ln, s, ":"))
        enc = (pc.binary_join_element_wise(*parts, "|")
               if len(parts) > 1 else parts[0])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        h = hash_strings(enc).view(np.int64)
        cols = {k: t.column(k) for k in keys}
        cols["__fp"] = pa.array(h)
        return pa.table(cols)

    o = old.map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
    n = new.map_batches(fingerprint, batch_format="pyarrow", zero_copy_batch=True)
    joined = hash_join(
        o, n, on=keys if len(keys) > 1 else keys[0], how="full",
        num_partitions=num_partitions, suffix="_new",
    )

    def classify(t: pa.Table) -> pa.Table:
        fo, fn = t.column("__fp"), t.column("__fp_new")
        change = pc.if_else(
            pc.is_null(fo),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(fn),
                pa.scalar("removed"),
                pc.if_else(
                    pc.equal(fo, fn), pa.scalar("unchanged"), pa.scalar("modified")
                ),
            ),
        )
        out = t.drop_columns(["__fp", "__fp_new"]).append_column("change", change)
        if not include_unchanged:
            out = out.filter(pc.not_equal(out.column("change"), pa.scalar("unchanged")))
        return out

    return joined.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)


# -------------------------------------------------------- clustered append
def _invalidate_bloom_sidecars(root: str) -> list[str]:
    """Remove every Bloom sidecar (from the CURRENT generation root):
    ingest (append/upsert) adds keys the filters have never seen, which
    would turn lookups' zero-false-negative guarantee into SILENT false
    negatives. Deleting the sidecar makes bloom_pruned_lookup fail
    loudly (file not found) until build_bloom_index re-runs — the
    honest failure mode. Returns the removed file names."""
    removed = []
    for f in os.listdir(root):
        if f.startswith("_bloom_index_") and f.endswith(".parquet"):
            os.remove(os.path.join(root, f))
            removed.append(f)
    return removed


def append_clustered(
    ds: "Dataset",
    path: str,
    *,
    delta_id: str | None = None,
) -> pd.DataFrame:
    """Fold new rows into an existing clustered store: each row routes
    to its range via the manifest's frozen split points (the SAME
    searchsorted the original write used — split points never move, so
    old data never rewrites), each TOUCHED range merge-sorts its file
    with the new rows and republishes atomically; untouched ranges do
    zero I/O. Zone maps of touched ranges widen in the manifest.

    Exactly-once per delta: with ``delta_id``, touched range files
    record absorbed ids in parquet metadata and a replay after a torn
    run repairs only the ranges that missed it (the
    :mod:`.delta_agg` discipline applied to raw rows). Returns
    {rid, n_added, n_rows, skipped}.
    """
    import pyarrow.parquet as pq

    man = read_manifest(path)
    root = _data_root(path, man)
    _invalidate_bloom_sidecars(root)
    col, kind = man["cluster_col"], man["kind"]
    splits = np.array(
        man["splits"], dtype=np.float64 if kind == "float" else np.int64
    )

    def assign(t: pa.Table) -> pa.Table:
        v, valid, k2 = _to_numeric(t.column(col))
        if k2 != kind:
            raise TypeError(
                f"append_clustered: delta {col!r} kind {k2} != store kind {kind}"
            )
        rid = np.searchsorted(splits, v, side="right").astype(np.int32)
        rid[~valid] = 0
        return t.append_column("__rid", pa.array(rid))

    def merge_range(g: pa.Table) -> pa.Table:
        rid = int(g.column("__rid")[0].as_py())
        fresh = g.drop_columns(["__rid"])
        d = os.path.join(root, f"rid={rid}")
        fp = os.path.join(d, "part.parquet")
        applied: list[str] = []
        existing = None
        if os.path.exists(fp):
            existing = pq.read_table(fp)
            meta = existing.schema.metadata or {}
            applied = json.loads(meta.get(b"applied_delta_ids", b"[]"))
            if delta_id is not None and delta_id in applied:
                return pa.table(
                    {"rid": pa.array([rid], pa.int64()),
                     "n_added": pa.array([0], pa.int64()),
                     "n_rows": pa.array([existing.num_rows], pa.int64()),
                     "skipped": pa.array([True], pa.bool_())}
                )
            existing = existing.replace_schema_metadata(None)
        both = (
            pa.concat_tables([existing, fresh], promote_options="permissive")
            if existing is not None
            else fresh
        )
        both = both.sort_by([(col, "ascending")])
        if delta_id is not None:
            applied = applied + [delta_id]
            both = both.replace_schema_metadata(
                {b"applied_delta_ids": json.dumps(applied).encode()}
            )
        os.makedirs(d, exist_ok=True)
        tmp = fp + ".tmp"
        pq.write_table(both, tmp)
        os.replace(tmp, fp)
        return pa.table(
            {"rid": pa.array([rid], pa.int64()),
             "n_added": pa.array([fresh.num_rows], pa.int64()),
             "n_rows": pa.array([both.num_rows], pa.int64()),
             "skipped": pa.array([False], pa.bool_())}
        )

    rep = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__rid")
        .map_groups(merge_range, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(rep):
        return pd.DataFrame(
            {"rid": pd.array([], dtype="int64"),
             "n_added": pd.array([], dtype="int64"),
             "n_rows": pd.array([], dtype="int64"),
             "skipped": pd.array([], dtype="bool")}
        )
    rep = rep.sort_values("rid").reset_index(drop=True)

    # widen manifest entries for touched ranges (re-read their files'
    # stats rather than trusting a possibly-skipped delta)
    by_rid = {r["rid"]: dict(r) for r in man["ranges"]}
    conv = float if kind == "float" else int
    for rid in rep.rid:
        t = pq.read_table(_rid_file(root, rid), columns=[col])
        v, valid, _k = _to_numeric(t.column(col))
        vv = v[valid]
        by_rid[int(rid)] = {
            "rid": int(rid),
            "n_rows": t.num_rows,
            "vmin": conv(vv.min()) if len(vv) else None,
            "vmax": conv(vv.max()) if len(vv) else None,
        }
    man["ranges"] = [by_rid[r] for r in sorted(by_rid)]
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return rep


# ---------------------------------------------------------------------------
# Bloom file-skipping index — the flagship sketch applied to the store.
#
# Zone maps (vmin/vmax) prune range dirs on the CLUSTER column; point
# lookups on any OTHER column see no pruning at all. A per-range Bloom
# filter over that column closes the gap: build once (one column-pruned
# read per range, distributed), persist as a tiny sidecar parquet
# ({rid, sketch}), and every later point lookup tests its keys against
# each range's filter on the driver (O(ranges × bits/8) bytes, KBs) and
# opens ONLY ranges with a positive — false positives cost one wasted
# read, never a wrong row, because the exact IN-filter still applies
# after pruning (same contract as the zone maps: pruning is I/O
# elision, not filtering). Zero false negatives is the flagship Bloom
# invariant (reference probe semantics, src/SkmerSplitter.cpp:132-136).
# At 100 TB the sidecar is ranges × (bits/8): 10k ranges × 32 KB =
# 320 MB, driver-holdable; raise bits per range as range row counts
# grow (FPR is per-range, bounded by the per-range key count).
# ---------------------------------------------------------------------------

def _bloom_index_path(root: str, col: str) -> str:
    """Sidecar path INSIDE a generation root (see ``_data_root``)."""
    return os.path.join(root, f"_bloom_index_{col}.parquet")


def _key_hash_array(arr: "pa.ChunkedArray | pa.Array") -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes + valid mask for a key column (int/ts/string)."""
    from ..functions.hashing import hash_strings, splitmix64

    typ = arr.type
    valid = ~np.asarray(pa.compute.is_null(arr))
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        filled = pa.compute.fill_null(arr, "")
        if isinstance(filled, pa.ChunkedArray):
            filled = filled.combine_chunks()
        h = hash_strings(filled)
    elif (
        pa.types.is_integer(typ)
        or pa.types.is_timestamp(typ)
        or pa.types.is_date(typ)
    ):
        v = pa.compute.fill_null(arr, 0)
        if pa.types.is_timestamp(typ):
            # normalize the UNIT before hashing: a store built from
            # timestamp[ns] data probed with pa-inferred timestamp[us]
            # values would otherwise hash different int64s — silent
            # Bloom false negatives (same rule as _to_numeric)
            v = pa.compute.cast(pa.compute.cast(v, pa.timestamp("us")),
                                pa.int64())
        elif pa.types.is_date(typ):
            v = pa.compute.cast(v, pa.int64())
        nv = v.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        h = splitmix64(nv.view(np.uint64))
    else:
        raise TypeError(f"bloom index: unsupported key type {typ}")
    return np.asarray(h, dtype=np.uint64), valid


def build_bloom_index(
    path: str,
    key_col: str,
    *,
    num_bits: int = 1 << 17,
    num_hashes: int = 4,
) -> pd.DataFrame:
    """Build a per-range Bloom sidecar over ``key_col`` for a clustered
    store at ``path``. One column-pruned file read per range, one task
    per range (Ray-distributed); returns {rid, n_keys, fill_ratio}.
    """
    import pyarrow.parquet as pq
    import ray.data

    from ..state.bloom import BloomFilter

    man = read_manifest(path)
    root = _data_root(path, man)
    rids = [int(r["rid"]) for r in man["ranges"]]

    def build(batch: pa.Table) -> pa.Table:
        out = {"rid": [], "sketch": [], "n_keys": [], "fill_ratio": [], "has_null": []}
        for rid in batch.column("rid").to_pylist():
            t = pq.read_table(_rid_file(root, rid), columns=[key_col])
            h, valid = _key_hash_array(t.column(key_col))
            bf = BloomFilter(num_bits, num_hashes)
            bf.update_hashes(h[valid])
            out["rid"].append(rid)
            out["sketch"].append(bf.serialize())
            out["n_keys"].append(int(valid.sum()))
            out["fill_ratio"].append(float(bf.fill_ratio()))
            out["has_null"].append(bool((~valid).any()))
        return pa.table(
            {
                "rid": pa.array(out["rid"], pa.int64()),
                "sketch": pa.array(out["sketch"], pa.binary()),
                "n_keys": pa.array(out["n_keys"], pa.int64()),
                "fill_ratio": pa.array(out["fill_ratio"], pa.float64()),
                "has_null": pa.array(out["has_null"], pa.bool_()),
            }
        )

    idx = (
        ray.data.from_items([{"rid": r} for r in rids])
        .map_batches(build, batch_format="pyarrow", batch_size=1)
        .to_arrow_refs()
    )
    import ray as _ray

    tbl = pa.concat_tables([_ray.get(r) for r in idx]).sort_by("rid")
    tmp = _bloom_index_path(root, key_col) + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, _bloom_index_path(root, key_col))
    return tbl.drop_columns(["sketch"]).to_pandas()


def bloom_pruned_lookup(
    path: str,
    key_col: str,
    values,
    *,
    columns: "list[str] | None" = None,
) -> "tuple[Dataset, dict]":
    """Point lookup ``key_col IN values`` over a clustered store using
    the Bloom sidecar: tests every value against each range's filter
    (driver-side, KB-sized state), reads ONLY positive ranges, then
    applies the exact IN-filter. Returns ``(Dataset, stats)`` with
    stats = {ranges_total, ranges_read, ranges_pruned}.
    """
    import pyarrow.parquet as pq
    import ray.data

    from ..state.base import deserialize_sketch

    vals = pa.array(list(values))
    if vals.null_count:
        raise ValueError("bloom_pruned_lookup: null lookup values unsupported")
    if len(vals) == 0:
        raise ValueError("bloom_pruned_lookup: empty value list")
    h, _valid = _key_hash_array(vals)

    man = read_manifest(path)
    root = _data_root(path, man)
    side = pq.read_table(_bloom_index_path(root, key_col))
    hit_rids: list[int] = []
    for rid, blob in zip(side.column("rid").to_pylist(), side.column("sketch").to_pylist()):
        bf = deserialize_sketch(blob)
        if bool(bf.contains(h).any()):
            hit_rids.append(int(rid))
    stats = {
        "ranges_total": side.num_rows,
        "ranges_read": len(hit_rids),
        "ranges_pruned": side.num_rows - len(hit_rids),
    }
    need = columns if columns is None else list(dict.fromkeys([key_col, *columns]))
    if not hit_rids:
        # no candidate range can contain any key — but callers still
        # select/sort on the documented columns, so the empty result
        # must carry the REAL schema (read zero rows from one file),
        # not a zero-column table
        any_rid = man["ranges"][0]["rid"]
        empty = ray.data.read_parquet(_rid_file(root, any_rid), columns=need).limit(0)
        return empty, stats
    files = [_rid_file(root, r) for r in hit_rids]
    ds = ray.data.read_parquet(files, columns=need)

    def exact(t: pa.Table) -> pa.Table:
        keep = pa.compute.is_in(t.column(key_col), value_set=vals)
        return t.filter(pa.compute.fill_null(keep, False))

    return ds.map_batches(exact, batch_format="pyarrow", zero_copy_batch=True), stats


def compact_clustered(path: str, *, target_rows: int = 100_000) -> pd.DataFrame:
    """OFFLINE small-range compaction: greedily merge ADJACENT ranges
    while the union stays ≤ ``target_rows``, renumber rids densely,
    and rewrite the manifest — the maintenance pass a long-lived store
    needs once many incremental ``append_clustered`` runs have left a
    tail of small ranges (each range is one file AND one pruning/
    resume unit; thousands of tiny ranges cost open-per-file latency
    and manifest bloat at 100 TB).

    Merged zone maps fold from the members' recorded vmin/vmax (no
    re-read); every ``_bloom_index_*`` sidecar is folded too — Bloom
    union is lossless, so lookups keep zero false negatives without
    rebuilding. Exactly-once delta replay survives compaction: a
    merged file's ``applied_delta_ids`` metadata is the UNION of its
    members' (``pa.concat_tables`` alone would keep only the first
    member's, letting an absorbed delta re-apply → duplicate rows).

    Crash-safe: the ENTIRE new generation (range files via copy/
    hardlink — never a move — plus folded sidecars and stats) is
    staged under ``{path}/g{gen+1}``, untouched by any reader, and the
    single atomic manifest replace is the commit point; the old
    generation is deleted only AFTER. A crash at any earlier moment
    leaves the old layout fully intact and referenced; a crash during
    cleanup leaves harmless orphans; per-group rewrites are idempotent
    (a Ray task retry skips files that already exist). NOT safe under
    CONCURRENT compactions of the same store; readers are fine. Returns
    the new manifest frame {rid, n_rows, vmin, vmax, merged_from}.
    """
    import shutil

    import pyarrow.parquet as pq
    import ray
    import ray.data

    man = read_manifest(path)
    old_gen = int(man.get("gen", 0))
    old_root = _data_root(path, man)
    new_gen = old_gen + 1
    new_root = os.path.join(path, f"g{new_gen}")
    # discard staging left by a TORN earlier compaction: the store may
    # have been appended to since, so its plan (groups) can differ and
    # stale staged files would be silently adopted by the idempotent
    # skip below (which exists for same-run Ray task retries)
    if os.path.exists(new_root):
        shutil.rmtree(new_root)
    os.makedirs(new_root)
    col, kind = man["cluster_col"], man["kind"]
    ranges = sorted(man["ranges"], key=lambda r: r["rid"])
    if not ranges:
        raise ValueError(f"empty store at {path}")
    # greedy adjacent grouping under the row budget
    groups: list[list[dict]] = []
    for r in ranges:
        if groups and sum(g["n_rows"] for g in groups[-1]) + r["n_rows"] <= target_rows:
            groups[-1].append(r)
        else:
            groups.append([r])
    splits = man["splits"]
    # boundary between new group g and g+1 = the original split between
    # the last member of g and the first member of g+1 (split i sits
    # between rid i and rid i+1)
    new_splits = [splits[g[-1]["rid"]] for g in groups[:-1]]

    def rewrite(batch: pa.Table) -> pa.Table:
        out = {"new_rid": [], "n_rows": []}
        for gi in batch.column("gi").to_pylist():
            members = groups[gi]
            rids = [m["rid"] for m in members]
            nd = os.path.join(new_root, f"rid={gi}")
            os.makedirs(nd, exist_ok=True)
            fp = os.path.join(nd, "part.parquet")
            if os.path.exists(fp):  # idempotent: task retry / resumed run
                out["new_rid"].append(gi)
                out["n_rows"].append(int(pq.read_metadata(fp).num_rows))
                continue
            tmp = fp + ".tmp"
            if os.path.exists(tmp):
                os.remove(tmp)
            if len(members) == 1:
                # copy, never move: the old generation stays fully
                # intact (and referenced) until the manifest commit
                src = _rid_file(old_root, rids[0])
                try:
                    os.link(src, tmp)  # O(1); preserves file metadata
                except OSError:
                    shutil.copyfile(src, tmp)
                nr = int(members[0]["n_rows"])
            else:
                parts: list[pa.Table] = []
                applied: list[str] = []
                for r in rids:
                    t = pq.read_table(_rid_file(old_root, r))
                    meta = t.schema.metadata or {}
                    for d_id in json.loads(meta.get(b"applied_delta_ids", b"[]")):
                        if d_id not in applied:
                            applied.append(d_id)
                    parts.append(t.replace_schema_metadata(None))
                t = pa.concat_tables(parts).sort_by([(col, "ascending")])
                if applied:
                    # UNION of the members' absorbed delta ids (concat
                    # keeps only the first member's metadata otherwise)
                    t = t.replace_schema_metadata(
                        {b"applied_delta_ids": json.dumps(applied).encode()}
                    )
                pq.write_table(t, tmp)
                nr = t.num_rows
            os.replace(tmp, fp)
            out["new_rid"].append(gi)
            out["n_rows"].append(nr)
        return pa.table({"new_rid": pa.array(out["new_rid"], pa.int64()),
                         "n_rows": pa.array(out["n_rows"], pa.int64())})

    rep = (
        ray.data.from_items([{"gi": i} for i in range(len(groups))])
        .map_batches(rewrite, batch_format="pyarrow", batch_size=1)
        .to_pandas()
        .sort_values("new_rid")
        .reset_index(drop=True)
    )

    # fold sidecars from the old generation (pure sketch merges)
    sidecars = [
        f for f in os.listdir(old_root)
        if f.startswith("_bloom_index_") and f.endswith(".parquet")
    ]
    folded: dict[str, pa.Table] = {}
    for sc in sidecars:
        from ..state.base import deserialize_sketch

        side = pq.read_table(os.path.join(old_root, sc))
        by_rid = {int(r): i for i, r in enumerate(side.column("rid").to_pylist())}
        rows = {"rid": [], "sketch": [], "n_keys": [], "fill_ratio": [], "has_null": []}
        for gi, members in enumerate(groups):
            bf = None
            nk, hn = 0, False
            for m in members:
                i = by_rid[m["rid"]]
                s = deserialize_sketch(side.column("sketch")[i].as_py())
                bf = s if bf is None else bf.merge(s)
                nk += int(side.column("n_keys")[i].as_py())
                hn = hn or bool(side.column("has_null")[i].as_py())
            rows["rid"].append(gi)
            rows["sketch"].append(bf.serialize())
            rows["n_keys"].append(nk)
            rows["fill_ratio"].append(float(bf.fill_ratio()))
            rows["has_null"].append(hn)
        folded[sc] = pa.table(
            {"rid": pa.array(rows["rid"], pa.int64()),
             "sketch": pa.array(rows["sketch"], pa.binary()),
             "n_keys": pa.array(rows["n_keys"], pa.int64()),
             "fill_ratio": pa.array(rows["fill_ratio"], pa.float64()),
             "has_null": pa.array(rows["has_null"], pa.bool_())}
        )

    # fold the z-order per-column stats sidecar, if present: merged
    # zone maps = per-column min/max over members (stale rids would
    # otherwise point scans at moved files)
    zdoc = None
    zp = os.path.join(old_root, STATS_NAME)
    if os.path.exists(zp):
        with open(zp) as f:
            zdoc = json.load(f)
        new_ranges_stats: dict[str, dict] = {}
        for gi, members in enumerate(groups):
            ent: dict = {}
            for c in zdoc["cols"]:
                zms = [zdoc["ranges"][str(m["rid"])].get(c) for m in members]
                zms = [z for z in zms if z is not None]
                ent[c] = (
                    [min(z[0] for z in zms), max(z[1] for z in zms)]
                    if zms else None
                )
            new_ranges_stats[str(gi)] = ent
        zdoc["ranges"] = new_ranges_stats

    # publish the staged sidecars + stats INTO the new generation root
    # (nothing references them until the manifest flips)
    for sc, tbl in folded.items():
        tmp = os.path.join(new_root, sc + ".tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(new_root, sc))
    if zdoc is not None:
        tmp = os.path.join(new_root, STATS_NAME + ".tmp")
        with open(tmp, "w") as f:
            json.dump(zdoc, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(new_root, STATS_NAME))

    conv = float if kind == "float" else int
    new_ranges = []
    merged_from = []
    for gi, members in enumerate(groups):
        vmins = [m["vmin"] for m in members if m["vmin"] is not None]
        vmaxs = [m["vmax"] for m in members if m["vmax"] is not None]
        new_ranges.append(
            {"rid": gi, "n_rows": int(rep.n_rows[gi]),
             "vmin": conv(min(vmins)) if vmins else None,
             "vmax": conv(max(vmaxs)) if vmaxs else None}
        )
        merged_from.append(len(members))

    # COMMIT: one atomic manifest replace flips every reader to the
    # new generation
    man["gen"] = new_gen
    man["ranges"] = new_ranges
    man["splits"] = new_splits
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))

    # post-commit cleanup of the old generation — best-effort: a crash
    # here leaves orphan files, never a broken store
    if old_gen == 0:
        for r in ranges:
            shutil.rmtree(os.path.join(path, f"rid={r['rid']}"), ignore_errors=True)
        for f in sidecars:
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass
        if zdoc is not None:
            try:
                os.remove(zp)
            except OSError:
                pass
    else:
        shutil.rmtree(old_root, ignore_errors=True)

    out = pd.DataFrame(new_ranges)
    out["merged_from"] = merged_from
    return out


def upsert_clustered(
    ds: "Dataset",
    path: str,
    *,
    delta_id: str | None = None,
) -> pd.DataFrame:
    """MERGE INTO (last-write-wins upsert) on a clustered store whose
    cluster column IS the primary key — the common warehouse shape
    (user table clustered by user_id). That constraint is what makes
    the merge range-LOCAL: a key's old row and its replacement always
    route to the same ``rid`` through the frozen split points, so each
    touched range rewrites once (existing rows whose key appears in
    the delta are dropped, delta rows inserted) and untouched ranges
    do zero I/O. A general MERGE where the cluster value can CHANGE
    needs a full key join first — route it through ``hash_join`` +
    ``write_clustered`` instead.

    The delta must not contain duplicate keys (raises — last-write-
    wins WITHIN one delta would be arrival-order nondeterminism);
    null keys are rejected for the same reason. ``delta_id`` gives
    exactly-once replay semantics as in :func:`append_clustered`.
    Returns {rid, n_replaced, n_inserted, n_rows, skipped}.
    """
    import pyarrow.parquet as pq

    man = read_manifest(path)
    root = _data_root(path, man)
    _invalidate_bloom_sidecars(root)
    col, kind = man["cluster_col"], man["kind"]
    splits = np.array(
        man["splits"], dtype=np.float64 if kind == "float" else np.int64
    )

    def assign(t: pa.Table) -> pa.Table:
        if pa.types.is_null(t.column(col).type):  # all-null block
            raise ValueError("upsert_clustered: null keys in delta")
        v, valid, k2 = _to_numeric(t.column(col))
        if k2 != kind:
            raise TypeError(
                f"upsert_clustered: delta {col!r} kind {k2} != store kind {kind}"
            )
        if not valid.all():
            raise ValueError("upsert_clustered: null keys in delta")
        rid = np.searchsorted(splits, v, side="right").astype(np.int32)
        return t.append_column("__rid", pa.array(rid))

    def merge_range(g: pa.Table) -> pa.Table:
        rid = int(g.column("__rid")[0].as_py())
        fresh = g.drop_columns(["__rid"])
        fk = fresh.column(col)
        if len(pc.unique(fk)) != fresh.num_rows:
            raise ValueError("upsert_clustered: duplicate keys in delta")
        d = os.path.join(root, f"rid={rid}")
        fp = os.path.join(d, "part.parquet")
        applied: list[str] = []
        existing = None
        replaced = 0
        if os.path.exists(fp):
            existing = pq.read_table(fp)
            meta = existing.schema.metadata or {}
            applied = json.loads(meta.get(b"applied_delta_ids", b"[]"))
            if delta_id is not None and delta_id in applied:
                return pa.table(
                    {"rid": pa.array([rid], pa.int64()),
                     "n_replaced": pa.array([0], pa.int64()),
                     "n_inserted": pa.array([0], pa.int64()),
                     "n_rows": pa.array([existing.num_rows], pa.int64()),
                     "skipped": pa.array([True], pa.bool_())}
                )
            existing = existing.replace_schema_metadata(None)
            hit = pc.is_in(existing.column(col), value_set=fk.combine_chunks())
            replaced = int(pc.sum(hit).as_py() or 0)
            existing = existing.filter(pc.invert(hit))
        both = (
            pa.concat_tables([existing, fresh], promote_options="permissive")
            if existing is not None
            else fresh
        ).sort_by([(col, "ascending")])
        if delta_id is not None:
            both = both.replace_schema_metadata(
                {b"applied_delta_ids": json.dumps(applied + [delta_id]).encode()}
            )
        os.makedirs(d, exist_ok=True)
        tmp = fp + ".tmp"
        pq.write_table(both, tmp)
        os.replace(tmp, fp)
        return pa.table(
            {"rid": pa.array([rid], pa.int64()),
             "n_replaced": pa.array([replaced], pa.int64()),
             "n_inserted": pa.array([fresh.num_rows - replaced], pa.int64()),
             "n_rows": pa.array([both.num_rows], pa.int64()),
             "skipped": pa.array([False], pa.bool_())}
        )

    rep = (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__rid")
        .map_groups(merge_range, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(rep):
        return pd.DataFrame(
            {"rid": pd.array([], dtype="int64"),
             "n_replaced": pd.array([], dtype="int64"),
             "n_inserted": pd.array([], dtype="int64"),
             "n_rows": pd.array([], dtype="int64"),
             "skipped": pd.array([], dtype="bool")}
        )
    rep = rep.sort_values("rid").reset_index(drop=True)
    # widen touched ranges' stats exactly like append_clustered
    by_rid = {r["rid"]: dict(r) for r in man["ranges"]}
    conv = float if kind == "float" else int
    for rid in rep.rid:
        t = pq.read_table(_rid_file(root, rid), columns=[col])
        v, valid, _k = _to_numeric(t.column(col))
        vv = v[valid]
        by_rid[int(rid)] = {
            "rid": int(rid), "n_rows": t.num_rows,
            "vmin": conv(vv.min()) if len(vv) else None,
            "vmax": conv(vv.max()) if len(vv) else None,
        }
    man["ranges"] = [by_rid[r] for r in sorted(by_rid)]
    tmp = os.path.join(path, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST_NAME))
    return rep


# ---------------------------------------------------------------------------
# Z-order clustering + multi-column zone maps: pruned scans on EITHER
# of two columns. The cluster key is the bit-interleaved (Morton)
# value of the two columns' 16-bit quantile ranks, so rows close in
# EITHER dimension land in few ranges; each range then records a
# per-column zone map in a stats sidecar, and a bounded scan on either
# column opens only the ranges whose recorded [min, max] overlaps —
# the multi-dimensional generalization of the single-column store
# (pruning stays pure I/O elision; the exact predicate applies after).
# ---------------------------------------------------------------------------

STATS_NAME = "_column_stats.json"


def _interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton-interleave two uint16 rank arrays -> uint32 z-values."""

    def spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << 8)) & np.uint64(0x00FF00FF)
        v = (v | (v << 4)) & np.uint64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.uint64(0x33333333)
        v = (v | (v << 1)) & np.uint64(0x55555555)
        return v

    return (spread(x) | (spread(y) << np.uint64(1))).astype(np.int64)


def write_zordered(
    ds: "Dataset",
    path: str,
    cols: "tuple[str, str] | list[str]",
    *,
    num_ranges: int = 32,
    sample_per_block: int = 1024,
) -> pd.DataFrame:
    """Write ``ds`` clustered by the Morton order of ``cols`` (two
    numeric/timestamp columns) with per-range per-column zone maps.
    Rank quantization uses a distributed stride sample per column
    (driver folds O(blocks x sample) scalars). Returns the manifest
    frame. Scans go through :func:`read_zordered_where`.
    """
    ca, cb = cols
    qa, ka = _rank_edges(ds, ca, sample_per_block)
    qb, kb = _rank_edges(ds, cb, sample_per_block)

    def zval(t: pa.Table) -> pa.Table:
        va, valid_a, _ = _to_numeric(t.column(ca))
        vb, valid_b, _ = _to_numeric(t.column(cb))
        ra = np.searchsorted(qa, va, side="right").astype(np.uint16)
        rb = np.searchsorted(qb, vb, side="right").astype(np.uint16)
        z = _interleave16(ra, rb)
        z[~(valid_a & valid_b)] = -1  # null rows cluster first
        return t.append_column("__z", pa.array(z))

    man = write_clustered(
        ds.map_batches(zval, batch_format="pyarrow", zero_copy_batch=True),
        path,
        "__z",
        num_ranges=num_ranges,
        sample_per_block=sample_per_block,
    )
    # per-range per-column zone maps — one column-pruned read per
    # range, DISTRIBUTED one task per range (the serial driver loop
    # this replaces serialized O(num_ranges) reads; same pattern as
    # build_bloom_index)
    import ray

    @ray.remote(num_cpus=1)
    def _zone_ent(rid: int):
        import pyarrow.parquet as pq

        t = pq.read_table(
            os.path.join(path, f"rid={rid}", "part.parquet"),
            columns=[ca, cb],
        )
        ent = {}
        for c in (ca, cb):
            v, valid, kind = _to_numeric(t.column(c))
            vv = v[valid]
            conv = float if kind == "float" else int
            ent[c] = [conv(vv.min()), conv(vv.max())] if len(vv) else None
        return str(rid), ent

    stats: dict[str, dict[str, list]] = dict(
        ray.get([_zone_ent.remote(int(rid)) for rid in man.rid])
    )
    doc = {"cols": [ca, cb], "kinds": {ca: ka, cb: kb}, "ranges": stats}
    tmp = os.path.join(path, STATS_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, STATS_NAME))
    return man


def _rank_edges(ds: "Dataset", col: str, sample_per_block: int):
    """255 quantile edges for 16-bit-safe rank quantization + kind."""
    edges, kind = sample_splits(
        ds, col, num_ranges=256, sample_per_block=sample_per_block
    )
    return np.array(
        edges, dtype=np.float64 if kind == "float" else np.int64
    ), kind


def read_zordered_where(
    path: str,
    col: str,
    lo=None,
    hi=None,
    *,
    columns: "list[str] | None" = None,
) -> "tuple[Dataset, dict]":
    """Scan a z-ordered store with a bound on EITHER clustered column:
    ranges prune by the recorded per-column zone maps, the exact
    inclusive predicate applies after. Returns (Dataset, stats)."""
    import pyarrow.dataset as pads

    import ray.data

    root = _data_root(path, read_manifest(path))
    with open(os.path.join(root, STATS_NAME)) as f:
        doc = json.load(f)
    if col not in doc["cols"]:
        raise ValueError(f"{col!r} is not a z-order stats column {doc['cols']}")
    kind = doc["kinds"][col]
    nlo = _bound_to_numeric(lo, kind)
    nhi = _bound_to_numeric(hi, kind)
    keep = []
    for rid_s, ent in doc["ranges"].items():
        zm = ent.get(col)
        if zm is None:
            # all-null range: a BOUNDED predicate never matches NULL,
            # but an unbounded scan must still return its rows
            if nlo is None and nhi is None:
                keep.append(int(rid_s))
            continue
        vmin, vmax = zm
        if (nlo is None or vmax >= nlo) and (nhi is None or vmin <= nhi):
            keep.append(int(rid_s))
    stats = {"ranges_total": len(doc["ranges"]), "ranges_read": len(keep),
             "ranges_pruned": len(doc["ranges"]) - len(keep)}
    need = columns if columns is None else list(dict.fromkeys([col, *columns]))
    if not keep:
        any_rid = next(iter(doc["ranges"]))
        fp = _rid_file(root, any_rid)
        if need is None:  # typed empty: concrete columns, no __z/rid
            import pyarrow.parquet as pq

            need = [c for c in pq.read_schema(fp).names if c != "__z"]
        ds = ray.data.read_parquet(fp, columns=need).limit(0)
        # same column fix-up as the non-empty path, or a fully-pruned
        # scan returns the internally-appended cluster column
        return _strip_z(_drop_rid(ds, need), columns), stats
    files = [_rid_file(root, r) for r in sorted(keep)]
    flt = None
    if lo is not None:
        flt = pads.field(col) >= _scalar(lo, kind)
    if hi is not None:
        f2 = pads.field(col) <= _scalar(hi, kind)
        flt = f2 if flt is None else (flt & f2)
    ds = ray.data.read_parquet(files, columns=need, filter=flt)
    return _strip_z(_drop_rid(ds, need), columns), stats


def _strip_z(ds: "Dataset", columns):
    if columns is not None:
        return ds.select_columns(list(columns))
    sch = ds.schema()
    if sch is not None and "__z" in sch.names:
        return ds.drop_columns(["__z"])
    return ds


def read_zordered_box(
    path: str,
    bounds: "dict[str, tuple]",
    *,
    columns: "list[str] | None" = None,
) -> "tuple[Dataset, dict]":
    """Rectangle scan over a z-ordered store: bounds = {col: (lo, hi)}
    for one or both clustered columns (None endpoints = open side).
    Ranges prune by the AND of the per-column zone-map overlaps —
    strictly tighter than either 1-D scan — then the exact conjunctive
    predicate applies. Returns (Dataset, stats)."""
    import pyarrow.dataset as pads

    import ray.data

    root = _data_root(path, read_manifest(path))
    with open(os.path.join(root, STATS_NAME)) as f:
        doc = json.load(f)
    bad = [c for c in bounds if c not in doc["cols"]]
    if bad:
        raise ValueError(f"{bad} not z-order stats columns {doc['cols']}")
    if not bounds:
        raise ValueError("read_zordered_box: empty bounds")
    nb = {
        c: (_bound_to_numeric(lo, doc["kinds"][c]),
            _bound_to_numeric(hi, doc["kinds"][c]))
        for c, (lo, hi) in bounds.items()
    }
    keep = []
    for rid_s, ent in doc["ranges"].items():
        ok = True
        for c, (nlo, nhi) in nb.items():
            zm = ent.get(c)
            if zm is None:
                # all-null dim matches only a fully open bound pair
                if nlo is None and nhi is None:
                    continue
                ok = False
                break
            vmin, vmax = zm
            if (nlo is not None and vmax < nlo) or (nhi is not None and vmin > nhi):
                ok = False
                break
        if ok:
            keep.append(int(rid_s))
    stats = {"ranges_total": len(doc["ranges"]), "ranges_read": len(keep),
             "ranges_pruned": len(doc["ranges"]) - len(keep)}
    needed_cols = list(bounds)
    need = (
        columns
        if columns is None
        else list(dict.fromkeys([*needed_cols, *columns]))
    )
    if not keep:
        any_rid = next(iter(doc["ranges"]))
        fp = _rid_file(root, any_rid)
        if need is None:
            import pyarrow.parquet as pq

            need = [c for c in pq.read_schema(fp).names if c != "__z"]
        ds = ray.data.read_parquet(fp, columns=need).limit(0)
        return _strip_z(_drop_rid(ds, need), columns), stats
    files = [_rid_file(root, r) for r in sorted(keep)]
    flt = None
    for c, (lo, hi) in bounds.items():
        kind = doc["kinds"][c]
        if lo is not None:
            f1 = pads.field(c) >= _scalar(lo, kind)
            flt = f1 if flt is None else (flt & f1)
        if hi is not None:
            f2 = pads.field(c) <= _scalar(hi, kind)
            flt = f2 if flt is None else (flt & f2)
    ds = ray.data.read_parquet(files, columns=need, filter=flt)
    return _strip_z(_drop_rid(ds, need), columns), stats
