"""Frequent-pair mining (market-basket) over the orders/lineitem tables.

The A-Priori 2-itemset pass expressed Ray-Data-first: baskets are
co-located by one order-keyed fixed-P shuffle of (orderkey, partkey)
rows; inside each partition every basket's distinct-item pairs are
emitted vectorized (a per-basket pandas self-merge — pair fan-out is
quadratic in BASKET size, which is bounded by order width, never in
corpus size); a grouped sum counts supports; the driver sees only the
top-k. Skewed giant baskets are the known hazard: ``max_basket`` caps the
fan-out deterministically (largest-key items dropped first), capped
baskets are counted through a sentinel row, and the operator REFUSES
to return (raises) if any basket was capped — silent truncation can't
masquerade as coverage; the caller raises the cap explicitly.

Reference analog: same content-derived co-location guarantee as the
Bloom build's `hmin % q` routing (src/SkmerExtractor.cpp:164) — all
evidence for one basket (order) meets in exactly one partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import grouped_agg
from .relational import read


def frequent_part_pairs(
    sf_dir: str,
    *,
    min_support: int = 2,
    topk: int = 20,
    num_partitions: int = 32,
    max_basket: int = 64,
) -> pd.DataFrame:
    """Top-k part pairs co-purchased in the same order:
    {part_a, part_b, support} by (support DESC, part_a, part_b)."""
    P = int(num_partitions)
    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_op(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"op": pa.array((ok % P).astype(np.int32)),
             "l_orderkey": t.column("l_orderkey"),
             "l_partkey": t.column("l_partkey")}
        )

    def pair_fold(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o": g.column("l_orderkey").to_numpy(zero_copy_only=False),
             "p": g.column("l_partkey").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        # deterministic basket cap: keep the max_basket smallest partkeys;
        # capped baskets are COUNTED into a sentinel row so the caller
        # can refuse silently-truncated results
        df = df.sort_values(["o", "p"])
        df["rk"] = df.groupby("o", sort=False).cumcount()
        n_capped = int((df.groupby("o", sort=False)["rk"].max() >= max_basket).sum())
        df = df[df["rk"] < max_basket]
        m = df.merge(df, on="o")
        m = m[m["p_x"] < m["p_y"]]
        cnt = (
            m.groupby(["p_x", "p_y"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {"part_a": pa.array(
                np.concatenate([cnt["p_x"].to_numpy(dtype=np.int64), [-1]])),
             "part_b": pa.array(
                np.concatenate([cnt["p_y"].to_numpy(dtype=np.int64), [-1]])),
             "c": pa.array(
                np.concatenate([cnt["c"].to_numpy(dtype=np.int64), [n_capped]]))}
        )

    sums = grouped_agg(
        ds.map_batches(add_op, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("op")
        .map_groups(pair_fold, batch_format="pyarrow"),
        ["part_a", "part_b"],
        {"support": ("sum", "c")},
        num_partitions=16,
    )

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sent = df[df["part_a"] == -1]
        df = df[(df["part_a"] != -1) & (df["support"] >= min_support)].sort_values(
            ["support", "part_a", "part_b"], ascending=[False, True, True]
        ).head(topk)
        return pa.Table.from_pandas(
            pd.concat([df, sent], ignore_index=True), preserve_index=False
        )

    cands = pd.DataFrame(
        sums.map_batches(local_top, batch_format="pyarrow").take_all()
    )
    if cands.empty:
        return pd.DataFrame(columns=["part_a", "part_b", "support"])
    n_capped = int(cands[cands["part_a"] == -1]["support"].sum())
    if n_capped:
        raise ValueError(
            f"frequent_part_pairs: {n_capped} basket(s) exceed max_basket="
            f"{max_basket}; raise the cap (results would otherwise be "
            f"silently truncated vs uncapped semantics)"
        )
    out = cands[cands["part_a"] != -1].sort_values(
        ["support", "part_a", "part_b"], ascending=[False, True, True]
    ).head(topk)
    return out[["part_a", "part_b", "support"]].reset_index(drop=True)
