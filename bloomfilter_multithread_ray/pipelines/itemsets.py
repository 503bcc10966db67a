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


def part_association_rules(
    sf_dir: str,
    *,
    min_support: int = 2,
    min_conf: float = 0.25,
    num_partitions: int = 32,
    max_basket: int = 64,
) -> pd.DataFrame:
    """Association rules from co-purchased part pairs →
    {ant, cons, support, conf, lift} for BOTH directions of every pair
    with support >= min_support and confidence >= min_conf, sorted by
    (ant, cons) — the classic market-basket deliverable on top of the
    A-Priori pair pass: conf(a→b) = supp(ab)/supp(a), lift =
    supp(ab)·N / (supp(a)·supp(b)) with N = #baskets.

    Scale shape: ONE order-keyed fixed-P shuffle co-locates each
    basket's rows; a single partition kernel emits pair partials,
    singleton partials AND a basket-count partial (all exact — dedup
    of (order, part) is partition-local-is-global under the keying),
    folded by one grouped sum; the support filter applies BEFORE
    anything lands on the driver, so only the O(frequent pairs +
    items) survivors materialize. Exactness: conf and lift quantize
    to 1e-6 half-up from the single mirrored float division (integer
    numerators/denominators up to that point), and the min_conf
    filter compares the QUANTIZED value — bit-replayable by the SQL
    oracle. The basket cap reuses the refuse-on-truncation rule of
    :func:`frequent_part_pairs` (sentinel-counted, loud failure).
    """
    P = int(num_partitions)
    S = int(min_support)
    conf_u_min = int(np.trunc(float(min_conf) * 1e6 + 0.5))
    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_op(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"op": pa.array((ok % P).astype(np.int32)),
             "l_orderkey": t.column("l_orderkey"),
             "l_partkey": t.column("l_partkey")}
        )

    # row kinds in one folded table: (a, b, c) pair partial;
    # (p, -2, c) singleton partial; (-3, -3, n_baskets); (-1, -1, capped)
    def basket_fold(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o": g.column("l_orderkey").to_numpy(zero_copy_only=False),
             "p": g.column("l_partkey").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        df = df.sort_values(["o", "p"])
        df["rk"] = df.groupby("o", sort=False).cumcount()
        n_capped = int((df.groupby("o", sort=False)["rk"].max() >= max_basket).sum())
        n_baskets = int(df["o"].nunique())
        df = df[df["rk"] < max_basket]
        m = df.merge(df, on="o")
        m = m[m["p_x"] < m["p_y"]]
        pc = m.groupby(["p_x", "p_y"], sort=False).size().reset_index(name="c")
        ic = df.groupby("p", sort=False).size().reset_index(name="c")
        a = np.concatenate([pc["p_x"].to_numpy(np.int64),
                            ic["p"].to_numpy(np.int64), [-3, -1]])
        b = np.concatenate([pc["p_y"].to_numpy(np.int64),
                            np.full(len(ic), -2, np.int64), [-3, -1]])
        c = np.concatenate([pc["c"].to_numpy(np.int64),
                            ic["c"].to_numpy(np.int64),
                            [n_baskets, n_capped]])
        return pa.table({"part_a": pa.array(a), "part_b": pa.array(b),
                         "c": pa.array(c)})

    sums = grouped_agg(
        ds.map_batches(add_op, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("op")
        .map_groups(basket_fold, batch_format="pyarrow"),
        ["part_a", "part_b"],
        {"s": ("sum", "c")},
        num_partitions=16,
    )

    def keep(t: pa.Table) -> pa.Table:  # frequent pairs + markers only
        a = t.column("part_a").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        m = (a < 0) | (t.column("part_b").to_numpy(zero_copy_only=False) < 0) \
            | (s >= S)
        return t.filter(pa.array(m))

    df = pd.DataFrame(
        sums.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    cols = ["ant", "cons", "support", "conf", "lift"]
    if df.empty:
        return pd.DataFrame(columns=cols)
    n_capped = int(df[df["part_a"] == -1]["s"].sum())
    if n_capped:
        raise ValueError(
            f"part_association_rules: {n_capped} basket(s) exceed "
            f"max_basket={max_basket}; raise the cap"
        )
    N = int(df[df["part_a"] == -3]["s"].sum())
    items = df[(df["part_b"] == -2) & (df["part_a"] >= 0)]
    supp = dict(zip(items["part_a"].astype(np.int64),
                    items["s"].astype(np.int64)))
    pairs = df[(df["part_a"] >= 0) & (df["part_b"] >= 0)]
    if pairs.empty:
        return pd.DataFrame(columns=cols)
    ant = np.concatenate([pairs["part_a"].to_numpy(np.int64),
                          pairs["part_b"].to_numpy(np.int64)])
    con = np.concatenate([pairs["part_b"].to_numpy(np.int64),
                          pairs["part_a"].to_numpy(np.int64)])
    sab = np.concatenate([pairs["s"].to_numpy(np.int64)] * 2)
    sa = np.array([supp[x] for x in ant], np.int64)
    sb = np.array([supp[x] for x in con], np.int64)
    conf_u = np.trunc((sab.astype(np.float64) / sa) * 1e6 + 0.5).astype(np.int64)
    lift_u = np.trunc(
        ((sab * N).astype(np.float64) / (sa * sb).astype(np.float64)) * 1e6 + 0.5
    ).astype(np.int64)
    out = pd.DataFrame(
        {"ant": ant, "cons": con, "support": sab,
         "conf": conf_u / 1e6, "lift": lift_u / 1e6}
    )
    out = out[conf_u >= conf_u_min]
    return out.sort_values(["ant", "cons"]).reset_index(drop=True)


def frequent_triples(
    sf_dir: str,
    *,
    min_support: int = 2,
    topk: int = 20,
    num_partitions: int = 32,
    max_basket: int = 64,
) -> pd.DataFrame:
    """Top-k part TRIPLES co-purchased in the same order:
    {part_a, part_b, part_c, support} by (support DESC, a, b, c) —
    the 3-itemset extension of :func:`frequent_part_pairs` on the
    same single order-keyed shuffle.

    Per-basket triple fan-out is C(width, 3); the basket cap bounds
    it at C(max_basket, 3) per order (refuse-on-cap, as for pairs).
    The SON two-phase candidate pruning (Savasere et al., VLDB'95 —
    mine locally at threshold floor(s·n_p/n), verify exactly) is the
    upgrade path when min_support is large enough for the local
    threshold to exceed 1; at the fixture's s=2 it degenerates to
    emitting every local triple, which is exactly this direct pass,
    so the direct grouped count IS the honest implementation here.
    """
    P = int(num_partitions)
    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_op(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"op": pa.array((ok % P).astype(np.int32)),
             "l_orderkey": t.column("l_orderkey"),
             "l_partkey": t.column("l_partkey")}
        )

    def triple_fold(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o": g.column("l_orderkey").to_numpy(zero_copy_only=False),
             "p": g.column("l_partkey").to_numpy(zero_copy_only=False)}
        ).drop_duplicates()
        df = df.sort_values(["o", "p"])
        df["rk"] = df.groupby("o", sort=False).cumcount()
        n_capped = int((df.groupby("o", sort=False)["rk"].max() >= max_basket).sum())
        df = df[df["rk"] < max_basket]
        m = df.merge(df, on="o")
        m = m[m["p_x"] < m["p_y"]]
        m = m.merge(df.rename(columns={"p": "p_z"}), on="o")
        m = m[m["p_y"] < m["p_z"]]
        cnt = m.groupby(["p_x", "p_y", "p_z"], sort=False).size().reset_index(
            name="c")
        return pa.table(
            {"part_a": pa.array(np.concatenate(
                [cnt["p_x"].to_numpy(np.int64), [-1]])),
             "part_b": pa.array(np.concatenate(
                 [cnt["p_y"].to_numpy(np.int64), [-1]])),
             "part_c": pa.array(np.concatenate(
                 [cnt["p_z"].to_numpy(np.int64), [-1]])),
             "c": pa.array(np.concatenate(
                 [cnt["c"].to_numpy(np.int64), [n_capped]]))}
        )

    sums = grouped_agg(
        ds.map_batches(add_op, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("op")
        .map_groups(triple_fold, batch_format="pyarrow"),
        ["part_a", "part_b", "part_c"],
        {"support": ("sum", "c")},
        num_partitions=16,
    )

    def local_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sent = df[df["part_a"] == -1]
        df = df[(df["part_a"] != -1) & (df["support"] >= min_support)].sort_values(
            ["support", "part_a", "part_b", "part_c"],
            ascending=[False, True, True, True],
        ).head(topk)
        return pa.Table.from_pandas(
            pd.concat([df, sent], ignore_index=True), preserve_index=False
        )

    cands = pd.DataFrame(
        sums.map_batches(local_top, batch_format="pyarrow").take_all()
    )
    if cands.empty:
        return pd.DataFrame(columns=["part_a", "part_b", "part_c", "support"])
    n_capped = int(cands[cands["part_a"] == -1]["support"].sum())
    if n_capped:
        raise ValueError(
            f"frequent_triples: {n_capped} basket(s) exceed max_basket="
            f"{max_basket}; raise the cap"
        )
    out = cands[cands["part_a"] != -1].sort_values(
        ["support", "part_a", "part_b", "part_c"],
        ascending=[False, True, True, True],
    ).head(topk)
    return out[["part_a", "part_b", "part_c", "support"]].reset_index(drop=True)
