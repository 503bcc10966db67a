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
        ds = ray.data.read_parquet(
            os.path.join(path, f"rid={any_rid}", "part.parquet"), columns=need
        ).limit(0)
        return _drop_rid(ds, need)
    files = [os.path.join(path, f"rid={r}", "part.parquet") for r in rids]
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
