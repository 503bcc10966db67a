"""Frequent-itemset mining (market-basket) over the orders/lineitem tables.

The A-Priori 2-itemset pass expressed Ray-Data-first: baskets are
co-located by one order-keyed fixed-P shuffle of (orderkey, partkey)
rows; inside each partition every basket's distinct-item pairs are
emitted vectorized (a per-basket pandas self-merge — pair fan-out is
quadratic in BASKET size, which is bounded by order width, never in
corpus size); a grouped sum counts supports; the driver sees only the
top-k. Skewed giant baskets are the known hazard: in the ``direct``
method ``max_basket`` caps the fan-out deterministically (largest-key
items dropped first), capped baskets are counted through a sentinel
row, and the operator REFUSES to return (raises) if any basket was
capped — silent truncation can't masquerade as coverage.

Two candidate-pruned TWO-PHASE methods replace the refusal with a
plan that completes on wide baskets (both exact — identical output to
an uncapped direct pass):

- ``apriori``: pass 0 counts ITEM supports exactly and broadcasts the
  frequent-item set; baskets are filtered to frequent items BEFORE any
  pair enumeration (a wide basket of rare items shrinks to nothing);
  pass 1 counts pairs of filtered baskets → global L2; candidate
  triples come from the A-Priori join L2 ⋈ L2 on the first item with
  the (b, c) ∈ L2 prune (|L2|-bounded, driver-side — output-scale,
  never corpus-scale); pass 2 counts candidates per basket by
  CONTAINMENT JOINS (three semi-joins), never by enumerating
  C(width, 3) — so no stage is cubic in basket width.
- ``son`` (Savasere-Omiecinski-Navathe, VLDB'95): each basket-complete
  partition p with n_p of the n baskets mines its LOCALLY frequent
  itemsets at local threshold t_p = max(1, floor(s·n_p/n)); any
  globally frequent itemset is locally frequent in ≥1 partition
  (else its total count < Σ s·n_p/n = s), so the candidate UNION is a
  superset of the answer; phase 2 recounts the union exactly via the
  same containment joins. Local mining applies the A-Priori staircase
  (local frequent items → local frequent pairs → candidate triples)
  inside the partition. Degenerate regime t_p = 1 (tiny min_support
  or many partitions): every local itemset is a candidate and SON
  buys nothing over the direct pass — documented, not hidden.

Reference analog: same content-derived co-location guarantee as the
Bloom build's `hmin % q` routing (src/SkmerExtractor.cpp:164) — all
evidence for one basket (order) meets in exactly one partition, which
is exactly the property SON's local-threshold argument needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import grouped_agg
from .relational import read


# --------------------------------------------------------- shared kernels
def _op_tagged(sf_dir: str, P: int):
    """lineitem (orderkey, partkey) rows tagged with op = orderkey % P —
    the basket-complete routing every method shares."""
    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def add_op(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table(
            {"op": pa.array((ok % P).astype(np.int32)),
             "l_orderkey": t.column("l_orderkey"),
             "l_partkey": t.column("l_partkey")}
        )

    return ds.map_batches(add_op, batch_format="pyarrow", zero_copy_batch=True)


def _group_df(g: pa.Table) -> pd.DataFrame:
    """Distinct (o, p) basket rows of one op-partition; dedup here is
    GLOBAL dedup because baskets never span partitions."""
    return pd.DataFrame(
        {"o": g.column("l_orderkey").to_numpy(zero_copy_only=False),
         "p": g.column("l_partkey").to_numpy(zero_copy_only=False)}
    ).drop_duplicates()


def _contain_count(df: pd.DataFrame, cand: pd.DataFrame) -> pd.DataFrame:
    """Exact per-partition support of candidate itemsets via containment
    semi-joins — cost is |candidates| × matching baskets, NEVER an
    enumeration of C(basket_width, k). ``cand`` has columns a, b and
    optionally c (a < b < c)."""
    cols = [c for c in ("a", "b", "c") if c in cand.columns]
    items = pd.unique(cand[cols].to_numpy().ravel())
    sub = df[np.isin(df["p"].to_numpy(), items)]
    m = cand.merge(sub, left_on="a", right_on="p")[cols + ["o"]]
    for col in cols[1:]:
        m = m.merge(sub, left_on=["o", col], right_on=["o", "p"])[cols + ["o"]]
    return m.groupby(cols, sort=False).size().reset_index(name="cnt")


def _c3_from_l2(l2: pd.DataFrame) -> pd.DataFrame:
    """A-Priori candidate triples from frequent pairs: (a,b) ⋈ (a,c)
    with b < c, pruned to (b,c) also frequent → columns (a, b, c)."""
    if l2.empty:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64),
                             "c": pd.Series(dtype=np.int64)})
    l2 = l2[["a", "b"]]
    m = l2.merge(l2, on="a")
    m = m[m["b_x"] < m["b_y"]]
    m = m.merge(l2.rename(columns={"a": "b_x", "b": "b_y"}),
                on=["b_x", "b_y"])
    return m.rename(columns={"b_x": "b", "b_y": "c"})[
        ["a", "b", "c"]].astype(np.int64).reset_index(drop=True)


# baskets wider than this defer to the frequent-item-filtered second
# pass instead of enumerating pairs directly (C(512,2) ≈ 131k partials
# per basket is the direct-enumeration comfort zone)
_WIDE_DEFER = 512


def _items_pairs_pass(
    tagged, S: int, *, num_partitions: int = 16
) -> tuple[pd.DataFrame, pd.DataFrame, int]:
    """ONE op-grouped fold emitting item partials (all baskets), pair
    partials (baskets <= _WIDE_DEFER wide), the basket count and
    wide-order markers; wide baskets get a tiny targeted second pass
    with the frequent-item filter (exact for every pair with support
    >= S — both its items are frequent, so the filter keeps them).
    Returns (item_supports{a,s}, pair_sums{a,b,s}, n_baskets)."""

    def fold(g: pa.Table) -> pa.Table:
        df = _group_df(g)
        nb = int(df["o"].nunique())
        ic = df.groupby("p", sort=False).size().reset_index(name="c")
        w = df.groupby("o", sort=False)["p"].transform("size")
        narrow = df[w <= _WIDE_DEFER]
        m = narrow.merge(narrow, on="o")
        m = m[m["p_x"] < m["p_y"]]
        pc = m.groupby(["p_x", "p_y"], sort=False).size().reset_index(name="c")
        wide_o = pd.unique(df.loc[w > _WIDE_DEFER, "o"])
        a = np.concatenate([pc["p_x"].to_numpy(np.int64),
                            ic["p"].to_numpy(np.int64),
                            [-3], np.full(len(wide_o), -5, np.int64)])
        b = np.concatenate([pc["p_y"].to_numpy(np.int64),
                            np.full(len(ic), -2, np.int64),
                            [-3], wide_o.astype(np.int64)])
        c = np.concatenate([pc["c"].to_numpy(np.int64),
                            ic["c"].to_numpy(np.int64),
                            [nb], np.ones(len(wide_o), np.int64)])
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "c": pa.array(c)})

    summed = grouped_agg(
        tagged.groupby("op").map_groups(fold, batch_format="pyarrow"),
        ["a", "b"], {"s": ("sum", "c")}, num_partitions=num_partitions,
    ).materialize()

    def keep_markers(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((a < 0) | (b < 0)))

    def keep_pairs(threshold):
        def f(t: pa.Table) -> pa.Table:
            a = t.column("a").to_numpy(zero_copy_only=False)
            b = t.column("b").to_numpy(zero_copy_only=False)
            s = t.column("s").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((a >= 0) & (b >= 0) & (s >= threshold)))
        return f

    markers = summed.map_batches(
        keep_markers, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if markers.empty:  # empty input; Ray drops all-empty schemas
        e = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                          "b": pd.Series(dtype=np.int64),
                          "s": pd.Series(dtype=np.int64)})
        return e[["a", "s"]], e, 0
    items = markers[markers["b"] == -2][["a", "s"]].astype(np.int64)
    N = int(markers[markers["a"] == -3]["s"].sum())
    wide_o = markers[markers["a"] == -5]["b"].to_numpy(np.int64)
    if len(wide_o) == 0:
        # the support filter runs BEFORE the driver: only >=S pairs
        # materialize (sub-threshold pairs are the unbounded term at
        # corpus scale); markers above are item-vocabulary-bounded
        pair_sums = summed.map_batches(
            keep_pairs(S), batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas().astype(np.int64)
        return items, pair_sums.reset_index(drop=True), N
    # wide baskets deferred: their filtered pair partials must merge
    # with the narrow sums BEFORE any support filter (a pair can cross
    # S only with both contributions), so re-group the two partial
    # datasets distributed-side and filter there — never concatenate
    # sub-threshold pairs on the driver
    l1 = np.sort(items[items["s"] >= S]["a"].to_numpy(np.int64))

    def keep_wide(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ok, wide_o)))

    extra = (
        tagged.map_batches(keep_wide, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("op")
        .map_groups(_pair_fold_filtered(l1), batch_format="pyarrow")
    )

    def pairs_as_partials(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        keep = (a >= 0) & (b >= 0)
        t = t.filter(pa.array(keep))
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "c": t.column("s")})

    both = summed.map_batches(
        pairs_as_partials, batch_format="pyarrow", zero_copy_batch=True
    ).union(extra)
    pair_sums = grouped_agg(
        both, ["a", "b"], {"s": ("sum", "c")}, num_partitions=8,
    ).map_batches(
        keep_pairs(S), batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas().astype(np.int64)
    return items, pair_sums.reset_index(drop=True), N


def _n_baskets(tagged, *, num_partitions: int = 16) -> int:
    """Exact global basket count: per-op-partition distinct-order count
    (partition-local distinct IS global under the op routing), summed."""

    def nb(g: pa.Table) -> pa.Table:
        n = int(pd.unique(
            g.column("l_orderkey").to_numpy(zero_copy_only=False)).size)
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = tagged.groupby("op").map_groups(nb, batch_format="pyarrow")
    return int(sum(r["n"] for r in parts.take_all()))


# candidate-pruned paths never enumerate pairs of a basket wider than
# this AFTER frequent-item filtering — C(4096,2) ≈ 8.4M partials per
# basket is the quadratic honesty frontier (loud refusal, not silence)
_PAIR_ENUM_CAP = 4096


def _pair_fold_filtered(l1_arr):
    """Per-partition pair partials over baskets filtered to the
    (broadcast) frequent-item array; exact for every pair whose two
    items are both frequent — which covers every pair with support
    >= min_support."""

    def fold(g: pa.Table) -> pa.Table:
        df = _group_df(g)
        if l1_arr is not None and len(df):
            df = df[np.isin(df["p"].to_numpy(), l1_arr)]
        if len(df):
            w = df.groupby("o", sort=False).size()
            if int(w.max()) > _PAIR_ENUM_CAP:
                raise ValueError(
                    f"basket width {int(w.max())} exceeds the pair-"
                    f"enumeration frontier {_PAIR_ENUM_CAP} even after "
                    f"frequent-item filtering; raise min_support"
                )
        m = df.merge(df, on="o")
        m = m[m["p_x"] < m["p_y"]]
        cnt = m.groupby(["p_x", "p_y"], sort=False).size().reset_index(
            name="c")
        return pa.table(
            {"a": pa.array(cnt["p_x"].to_numpy(np.int64)),
             "b": pa.array(cnt["p_y"].to_numpy(np.int64)),
             "c": pa.array(cnt["c"].to_numpy(np.int64))}
        )

    return fold


def _mine_two_phase(
    sf_dir: str,
    *,
    k: int,
    min_support: int,
    num_partitions: int,
    method: str,
) -> pd.DataFrame:
    """Exact frequent k-itemsets (k=2 or 3) by the ``apriori`` or
    ``son`` two-phase plan (see module docstring) →
    DataFrame (a[, b[, c]], support) unsorted, support >= min_support.
    """
    import ray

    P = int(num_partitions)
    S = int(min_support)
    cols = ["a", "b", "c"][:k]
    empty = pd.DataFrame(
        {**{c: pd.Series(dtype=np.int64) for c in cols},
         "support": pd.Series(dtype=np.int64)}
    )
    # materialized once: every phase re-groups these slim 3-int rows
    # instead of re-reading the parquet scan per pass
    tagged = _op_tagged(sf_dir, P).materialize()

    def count_union(cand: pd.DataFrame) -> pd.DataFrame:
        """Phase 2: exact global supports of the candidate union. Rows
        are pre-filtered to candidate ITEMS before the basket-grouping
        sort, so the phase-2 shuffle moves only candidate-relevant
        rows — typically a sliver of the corpus."""
        if cand.empty:
            return empty
        cand_ref = ray.put(cand)
        cand_items = np.unique(cand[cols].to_numpy().ravel())

        def keep_cand(t: pa.Table) -> pa.Table:
            p = t.column("l_partkey").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(p, cand_items)))

        def fold(g: pa.Table) -> pa.Table:
            cnt = _contain_count(_group_df(g), ray.get(cand_ref))
            return pa.table(
                {**{c: pa.array(cnt[c].to_numpy(np.int64)) for c in cols},
                 "cnt": pa.array(cnt["cnt"].to_numpy(np.int64))}
            )

        sums = grouped_agg(
            tagged.map_batches(keep_cand, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("op").map_groups(fold, batch_format="pyarrow"),
            cols, {"support": ("sum", "cnt")}, num_partitions=16,
        ).to_pandas()
        if sums.empty:
            return empty
        out = sums[sums["support"] >= S]
        return out.astype({c: np.int64 for c in cols + ["support"]})

    if method == "apriori":
        # fused pass: items + pairs + basket count in ONE op-grouped
        # fold (wide baskets deferred to the filtered second pass)
        _items, pair_sums, _N = _items_pairs_pass(tagged, S)
        if pair_sums.empty:
            return empty
        l2 = pair_sums[pair_sums["s"] >= S].rename(
            columns={"s": "support"})
        if k == 2:
            return l2[["a", "b", "support"]].reset_index(drop=True)
        # pass 2: containment-count the A-Priori candidate triples
        return count_union(_c3_from_l2(l2))

    if method == "son":
        # an extra skinny pass: t_p needs the GLOBAL basket count
        # before any local mining can run (the fused apriori pass
        # learns it for free from its markers — one reason apriori is
        # the default; see the BASELINE.md A/B)
        n = _n_baskets(tagged)
        if n == 0:
            return empty

        # phase 1: locally frequent k-itemsets at t_p = floor(s*n_p/n)
        def local_mine(g: pa.Table) -> pa.Table:
            df = _group_df(g)
            n_p = int(df["o"].nunique())
            t_p = max(1, (S * n_p) // n)
            ic = df.groupby("p", sort=False).size()
            l1_p = ic[ic >= t_p].index.to_numpy(np.int64)
            sub = df[np.isin(df["p"].to_numpy(), l1_p)]
            if len(sub):
                w = sub.groupby("o", sort=False).size()
                if int(w.max()) > _PAIR_ENUM_CAP:
                    raise ValueError(
                        f"basket width {int(w.max())} exceeds the pair-"
                        f"enumeration frontier {_PAIR_ENUM_CAP} even after "
                        f"local frequent-item filtering; raise min_support"
                    )
            m = sub.merge(sub, on="o")
            m = m[m["p_x"] < m["p_y"]]
            pc = m.groupby(["p_x", "p_y"], sort=False).size().reset_index(
                name="c")
            l2_p = pc[pc["c"] >= t_p].rename(
                columns={"p_x": "a", "p_y": "b"})[["a", "b"]]
            if k == 2:
                out = l2_p
            else:
                c3 = _c3_from_l2(l2_p)
                if len(c3):
                    lc = _contain_count(sub, c3)
                    out = lc[lc["cnt"] >= t_p][["a", "b", "c"]]
                else:
                    out = c3
            return pa.table(
                {c: pa.array(out[c].to_numpy(np.int64)) for c in cols}
            )

        cand = (
            tagged.groupby("op")
            .map_groups(local_mine, batch_format="pyarrow")
            .to_pandas()
        )
        if cand.empty:
            return empty
        cand = cand.drop_duplicates().reset_index(drop=True)
        # phase 2: exact recount of the union (local counts below t_p
        # were dropped, so phase-1 counts must not be summed)
        return count_union(cand)

    raise ValueError(f"unknown method {method!r}")


def frequent_part_pairs(
    sf_dir: str,
    *,
    min_support: int = 2,
    topk: int = 20,
    num_partitions: int = 32,
    max_basket: int = 64,
    method: str = "direct",
) -> pd.DataFrame:
    """Top-k part pairs co-purchased in the same order:
    {part_a, part_b, support} by (support DESC, part_a, part_b).

    ``method="direct"`` (default) enumerates every basket's pairs under
    the ``max_basket`` refuse-on-cap rule; ``"apriori"`` / ``"son"``
    are the candidate-pruned two-phase plans (module docstring) that
    complete on baskets wider than the cap with identical output.
    """
    if method in ("apriori", "son"):
        mined = _mine_two_phase(
            sf_dir, k=2, min_support=min_support,
            num_partitions=num_partitions, method=method,
        ).rename(columns={"a": "part_a", "b": "part_b"})
        return (
            mined.sort_values(["support", "part_a", "part_b"],
                              ascending=[False, True, True])
            .head(topk).reset_index(drop=True)
        )
    if method != "direct":
        raise ValueError(f"unknown method {method!r}")
    P = int(num_partitions)

    def pair_fold(g: pa.Table) -> pa.Table:
        df = _group_df(g)
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
        _op_tagged(sf_dir, P)
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


def _rules_from(
    pairs: pd.DataFrame, supp: dict, N: int, conf_u_min: int
) -> pd.DataFrame:
    """Both-direction rules from frequent pairs + exact singleton
    supports: conf/lift quantized 1e-6 half-up from the single float
    division, min_conf compared on the QUANTIZED value."""
    cols = ["ant", "cons", "support", "conf", "lift"]
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


def part_association_rules(
    sf_dir: str,
    *,
    min_support: int = 2,
    min_conf: float = 0.25,
    num_partitions: int = 32,
    max_basket: int = 64,
    method: str = "direct",
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
    if method == "apriori":
        # candidate-pruned path: ONE fused op-grouped fold (items +
        # pairs + basket count; wide rare-item baskets deferred to the
        # frequent-item-filtered second pass) — no cap, no refusal
        cols = ["ant", "cons", "support", "conf", "lift"]
        tagged = _op_tagged(sf_dir, P).materialize()
        items, pair_sums, N = _items_pairs_pass(tagged, S)
        if items.empty or pair_sums.empty:
            return pd.DataFrame(columns=cols)
        supp = dict(zip(items["a"], items["s"]))
        pairs = pair_sums[pair_sums["s"] >= S].rename(
            columns={"a": "part_a", "b": "part_b"})
        return _rules_from(pairs, supp, N, conf_u_min)
    if method != "direct":
        raise ValueError(f"unknown method {method!r}")
    # row kinds in one folded table: (a, b, c) pair partial;
    # (p, -2, c) singleton partial; (-3, -3, n_baskets); (-1, -1, capped)
    def basket_fold(g: pa.Table) -> pa.Table:
        df = _group_df(g).sort_values(["o", "p"])
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
        _op_tagged(sf_dir, P)
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
    return _rules_from(pairs, supp, N, conf_u_min)


def frequent_triples(
    sf_dir: str,
    *,
    min_support: int = 2,
    topk: int = 20,
    num_partitions: int = 32,
    max_basket: int = 64,
    method: str = "apriori",
) -> pd.DataFrame:
    """Top-k part TRIPLES co-purchased in the same order:
    {part_a, part_b, part_c, support} by (support DESC, a, b, c) —
    the 3-itemset extension of :func:`frequent_part_pairs`.

    ``method="apriori"`` (default) is the candidate-pruned two-phase
    plan (module docstring): exact item pass → filtered pair pass →
    A-Priori C3 candidates → ONE exact containment-count pass. No
    stage enumerates C(width, 3), so wide baskets complete instead of
    hitting a cap, and the all-to-all volume is pair partials +
    candidate counts, never the cubic triple fan-out. ``"son"`` is the
    textbook Savasere et al. VLDB'95 plan (local mining at
    t_p = max(1, floor(s·n_p/n)), candidate union, exact recount) —
    identical output, kept for the candidate-volume A/B.
    ``"direct"`` is the original single-pass cubic enumeration under
    the ``max_basket`` refuse-on-cap rule (exact when it completes).
    """
    if method in ("apriori", "son"):
        mined = _mine_two_phase(
            sf_dir, k=3, min_support=min_support,
            num_partitions=num_partitions, method=method,
        ).rename(columns={"a": "part_a", "b": "part_b", "c": "part_c"})
        return (
            mined.sort_values(
                ["support", "part_a", "part_b", "part_c"],
                ascending=[False, True, True, True])
            .head(topk).reset_index(drop=True)
        )
    if method != "direct":
        raise ValueError(f"unknown method {method!r}")
    P = int(num_partitions)

    def triple_fold(g: pa.Table) -> pa.Table:
        df = _group_df(g).sort_values(["o", "p"])
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
        _op_tagged(sf_dir, P)
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
