"""Driver-mimic: run every queries() entry and its oracle SQL side by
side, compare row count / schema / order-insensitive values.

Used by tests/test_queries_oracle.py and runnable standalone:
    python tests/oracle_compare.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        problems.append(f"schema: ray={list(a.columns)} sql={list(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rows: ray={len(a)} sql={len(b)}")
        return problems
    for c in a.columns:
        if a[c].dtype != b[c].dtype:
            problems.append(f"dtype[{c}]: ray={a[c].dtype} sql={b[c].dtype}")
    if not problems:
        eq = a.equals(b)
        if not eq:
            diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
            problems.append(f"values differ in {diff_cols}")
            for c in diff_cols[:2]:
                mask = ~(a[c] == b[c])
                if a[c].dtype == "float64":
                    mask = ~np.isclose(a[c], b[c], equal_nan=True)
                    if not mask.any():
                        problems[-1] += f" (but {c} close within 1e-8)"
                        continue
                idx = np.flatnonzero(mask)[:3]
                problems.append(f"  {c}: ray={a[c].iloc[idx].tolist()} sql={b[c].iloc[idx].tolist()}")
    return problems


def run_all(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, sqls = E.queries(), E.oracle_sql()
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            results[name] = [f"RAY ERROR: {type(e).__name__}: {e}"]
            continue
        if name not in sqls:
            results[name] = [] if len(ray_df) >= 0 else ["empty"]
            results[name].append(f"(rows-only: {len(ray_df)} rows)")
            continue
        try:
            sql_df = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = [f"SQL ERROR: {type(e).__name__}: {e}"]
            continue
        results[name] = compare(name, ray_df, sql_df)
    return results


if __name__ == "__main__":
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    res = run_all(sf, only)
    ok = True
    for name, probs in res.items():
        status = "OK" if not probs or probs[0].startswith("(rows-only") else "MISMATCH"
        if status != "OK":
            ok = False
        print(f"{name:28s} {status}  {'; '.join(probs)}")
    ray.shutdown()
    sys.exit(0 if ok else 1)
