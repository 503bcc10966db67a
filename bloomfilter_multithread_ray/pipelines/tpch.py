"""Additional TPC-H query shapes (q7, q13, q15, q17, q19, q22).

Complements the shapes in :mod:`.relational` (q1/q3/q4/q5/q6/q10/q14/
q18).  Same disciplines throughout: money stays in exact int64 units
(cents, or 1e-4 "u4" units for price*(1-discount)) until the final
divide; SF-proportional sides always shuffle-join while fixed-
cardinality nation/region resolve on the driver; selective join sides
Bloom-prefilter the big side BEFORE the shuffle; correlated per-group
predicates evaluate inside ONE fixed-P hash partition instead of a
join-back (reference analog: the partition-local ownership of
/root/reference/src/main.cpp:86,120).

Fixture adaptations (columns the generator lacks), each documented on
its query: q13 filters by o_orderpriority instead of o_comment; q17
keys the part class by p_brand alone (no p_container); q19 drops the
shipmode/shipinstruct conjuncts; q22 uses c_nationkey as the country
code (no c_phone) and "no orders SINCE a date" (every fixture customer
has lifetime orders, which would make the classic predicate vacuous).
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import _partition_of_keys, grouped_agg
from .join import hash_join
from .relational import read

if TYPE_CHECKING:  # pragma: no cover
    from ray.data import Dataset


def _u4(t: pa.Table, price: str = "l_extendedprice", disc: str = "l_discount") -> np.ndarray:
    """price*(1-discount) in exact 1e-4 int64 units (cents × (100-disc_c))."""
    price_c = np.rint(t[price].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    disc_c = np.rint(t[disc].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
    return price_c * (100 - disc_c)


# ----------------------------------------------------------------- TPC-H Q7
def tpch_q7(
    sf_dir: str,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> pd.DataFrame:
    """Volume shipping (TPC-H Q7 shape): bilateral trade revenue by year.

    Plan: the 25-row nation table resolves the two names to keys on
    the driver; supplier and customer filter to those two nations
    (~8% of rows) and their key sets Bloom-prefilter the two big-side
    shuffles — date-window lineitem joins the supplier side, orders
    joins the customer side — so ~92% of both big tables drop BEFORE
    any exchange.  The two SF-proportional join results then
    shuffle-join on orderkey (the orders side, already materialized
    by its own prefilter, Bloom-prunes the lineitem side again: only
    ~0.6% of original lineitem rows reach the final exchange).  The
    cross-nation disjunction filters post-join vectorized, one
    grouped_agg folds (supp_nation, cust_nation, year) sums, and the
    two names decorate on the driver.
    """
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_name"].astype(str), nat["n_nationkey"].astype(int)))
    if nation_a not in nmap or nation_b not in nmap:
        raise ValueError(f"unknown nation name(s): {nation_a!r}, {nation_b!r}")
    nk_a, nk_b = nmap[nation_a], nmap[nation_b]
    pair = pa.array([nk_a, nk_b], pa.int32())

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["s_nationkey"], value_set=pair)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_derive(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int32()),
            "rev_u4": _u4(t),
        })

    li = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    li_s = hash_join(
        li, supp, on="l_suppkey", right_on="s_suppkey",
        how="inner", bloom_prefilter=True, broadcast="auto",
    )

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=pair)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ord_c = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        how="inner", bloom_prefilter=True, broadcast="auto",
    ).select_columns(["o_orderkey", "c_nationkey"])

    j = hash_join(
        li_s, ord_c, on="l_orderkey", right_on="o_orderkey",
        how="inner", bloom_prefilter=True,
    )

    def cross_pair(t: pa.Table) -> pa.Table:
        s = t["s_nationkey"].to_numpy(zero_copy_only=False)
        c = t["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((s == nk_a) & (c == nk_b)) | ((s == nk_b) & (c == nk_a))
        return t.filter(pa.array(keep)).select(["s_nationkey", "c_nationkey", "l_year", "rev_u4"])

    sums = grouped_agg(
        j.map_batches(cross_pair, batch_format="pyarrow", zero_copy_batch=True),
        ["s_nationkey", "c_nationkey", "l_year"],
        {"rev_u4": ("sum", "rev_u4")},
        num_partitions=8,
    )
    df = pd.DataFrame(sums.take_all())
    if df.empty:
        return pd.DataFrame({
            "supp_nation": pd.Series(dtype=object),
            "cust_nation": pd.Series(dtype=object),
            "l_year": pd.Series(dtype=np.int32),
            "revenue": pd.Series(dtype=np.float64),
        })
    rmap = {nk_a: nation_a, nk_b: nation_b}
    out = pd.DataFrame({
        "supp_nation": df["s_nationkey"].astype(int).map(rmap),
        "cust_nation": df["c_nationkey"].astype(int).map(rmap),
        "l_year": df["l_year"].astype(np.int32),
        "revenue": df["rev_u4"].astype(np.int64) / 10000.0,
    })
    return out.sort_values(["supp_nation", "cust_nation", "l_year"]).reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H Q13
def tpch_q13(sf_dir: str, exclude_priority: str = "1-URGENT") -> pd.DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape).

    Fixture adaptation: the classic query excludes orders by an
    o_comment pattern; the generator has no comment column, so the
    anti-filter applies to o_orderpriority instead (same shape: a
    filtered LEFT join that must still count zero-order customers).

    Plan: orders filter-and-count per custkey in one grouped_agg
    (exchange is one row per distinct customer, never per order);
    the customer KEY column left-joins the counts so customers with
    no surviving orders keep c_count=0; a second tiny grouped_agg
    folds the distribution.  Nothing but the final distribution
    (≤ max-orders-per-customer rows) reaches the driver.
    """
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(
            pc.not_equal(t["o_orderpriority"], exclude_priority)
        ).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    counts = grouped_agg(orders, "o_custkey", {"c_count": ("count", None)}, num_partitions=32)

    cust = read(sf_dir, "customer", columns=["c_custkey"])
    j = hash_join(cust, counts, on="c_custkey", right_on="o_custkey", how="left", broadcast="auto")

    def fill_zero(t: pa.Table) -> pa.Table:
        cc = pc.fill_null(pc.cast(t["c_count"], pa.int64()), 0)
        return pa.table({"c_count": cc})

    dist = grouped_agg(
        j.map_batches(fill_zero, batch_format="pyarrow", zero_copy_batch=True),
        "c_count", {"custdist": ("count", None)}, num_partitions=8,
    )
    df = pd.DataFrame(dist.take_all())
    if df.empty:
        return pd.DataFrame(columns=["c_count", "custdist"]).astype(np.int64)
    df["c_count"] = df["c_count"].astype(np.int64)
    df["custdist"] = df["custdist"].astype(np.int64)
    return df.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H Q15
def tpch_q15(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> pd.DataFrame:
    """Top supplier (TPC-H Q15 shape): supplier(s) with max window revenue.

    Plan: the quarter's lineitem folds to one exact u4 revenue row per
    suppkey (grouped_agg, map-side combined); that SF-proportional-but-
    small table materializes ONCE in the object store (it is consumed
    twice: a streaming max, then the equality filter — without the
    materialize the whole lineitem scan would re-execute); winners
    shuffle-join supplier for names.  The driver sees only the max
    scalar and the winner rows (ties included, like the view-based
    original).
    """
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    def li_derive(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        return pa.table({"l_suppkey": t["l_suppkey"], "rev_u4": _u4(t)})

    li = read(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    per_supp = grouped_agg(
        li, "l_suppkey", {"total_u4": ("sum", "rev_u4")}, num_partitions=32
    ).materialize()
    if per_supp.count() == 0:
        return pd.DataFrame({
            "s_suppkey": pd.Series(dtype=np.int64),
            "s_name": pd.Series(dtype=object),
            "total_revenue": pd.Series(dtype=np.float64),
        })
    best = per_supp.max("total_u4")

    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t["total_u4"], best)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    dec = hash_join(winners, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")
    df = pd.DataFrame(dec.take_all())
    out = pd.DataFrame({
        "s_suppkey": df["l_suppkey"].astype(np.int64),
        "s_name": df["s_name"],
        "total_revenue": df["total_u4"].astype(np.int64) / 10000.0,
    })
    return out.sort_values("s_suppkey").reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H Q17
def tpch_q17(
    sf_dir: str,
    brand: str = "Brand#23",
    frac_num: int = 1,
    frac_den: int = 5,
) -> pd.DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): weekly revenue
    from lines below ``frac_num/frac_den`` of their part's mean quantity.

    Fixture adaptation: the part class is p_brand alone (the generator
    has no p_container).

    Plan: the brand's part keys (~1/25 of part) Bloom-prefilter a
    semi-join that drops ~96% of lineitem BEFORE any exchange; the
    survivors hash-partition by partkey ONCE, and the correlated
    predicate ``qty < frac * avg(qty per part)`` evaluates INSIDE each
    partition (np groupby → per-part sum/count → per-row compare, all
    integer-exact: qty_c·den·cnt < num·sumq_c) — no join-back, no
    second lineitem pass.  Each partition emits one int64 partial; the
    driver sums P scalars and divides once.
    """
    part = read(sf_dir, "part", columns=["p_partkey", "p_brand"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_brand"], brand)).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    sub = hash_join(li, part, on="l_partkey", right_on="p_partkey",
                    how="semi", bloom_prefilter=True, broadcast="auto")

    P = 16

    def tag(t: pa.Table) -> pa.Table:
        qty_c = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        out = pa.table({"l_partkey": t["l_partkey"], "qty_c": qty_c, "price_c": price_c})
        gp = _partition_of_keys(out, ["l_partkey"], P)
        return out.append_column("__gp", pa.array(gp))

    def partition_filter(g: pa.Table) -> pa.Table:
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        qty = g["qty_c"].to_numpy(zero_copy_only=False)
        price = g["price_c"].to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk_s, qty_s, price_s = pk[order], qty[order], price[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        sums = np.add.reduceat(qty_s, starts)
        cnts = np.diff(np.r_[starts, len(pk_s)])
        gid = np.cumsum(np.r_[0, (pk_s[1:] != pk_s[:-1]).astype(np.int64)])
        keep = qty_s * frac_den * cnts[gid] < frac_num * sums[gid]
        return pa.table({"sum_price_c": pa.array([int(price_s[keep].sum())], pa.int64())})

    partials = (
        sub.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(partition_filter, batch_format="pyarrow")
    )
    total_c = sum(r["sum_price_c"] for r in partials.take_all())
    return pd.DataFrame({"avg_yearly": [round(total_c / 100.0 / 7.0, 6)]})


# ---------------------------------------------------------------- TPC-H Q19
_Q19_CASES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def tpch_q19(
    sf_dir: str,
    cases: Sequence[tuple[str, int, int, int, int]] = _Q19_CASES,
) -> pd.DataFrame:
    """Discounted revenue under disjunctive predicates (TPC-H Q19 shape).

    Fixture adaptation: the shipmode/shipinstruct conjuncts are
    dropped (columns absent); each case is (brand, size_lo, size_hi,
    qty_lo, qty_hi).

    Plan: the part side filters to the UNION of (brand, size-range)
    conjuncts (small) and Bloom-prefilters the quantity-range-filtered
    lineitem before the shuffle; the full per-case disjunction
    evaluates post-join vectorized (brand determines the quantity
    range); every batch folds to one exact u4 partial and the driver
    sums P scalars.
    """
    brands = pa.array([c[0] for c in cases], pa.string())
    qlo_all = min(c[3] for c in cases)
    qhi_all = max(c[4] for c in cases)

    def part_filter(t: pa.Table) -> pa.Table:
        b = t["p_brand"].to_numpy(zero_copy_only=False)
        s = t["p_size"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for brand, slo, shi, _ql, _qh in cases:
            keep |= (b == brand) & (s >= slo) & (s <= shi)
        return t.filter(pa.array(keep)).select(["p_partkey", "p_brand"])

    part = read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        part_filter, batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_derive(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        m = (q >= qlo_all) & (q <= qhi_all)
        t = t.filter(pa.array(m))
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_quantity": t["l_quantity"],
            "rev_u4": _u4(t),
        })

    li = read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    j = hash_join(li, part, on="l_partkey", right_on="p_partkey",
                  how="inner", bloom_prefilter=True, broadcast="auto")

    def partials(t: pa.Table) -> pa.Table:
        b = t["p_brand"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        rev = t["rev_u4"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for brand, _sl, _sh, qlo, qhi in cases:
            keep |= (b == brand) & (q >= qlo) & (q <= qhi)
        return pa.table({"rev_u4": pa.array([int(rev[keep].sum())], pa.int64())})

    total = sum(
        r["rev_u4"]
        for r in j.map_batches(partials, batch_format="pyarrow").take_all()
    )
    return pd.DataFrame({"revenue": [round(total / 10000.0, 2)]})


# ---------------------------------------------------------------- TPC-H Q22
def tpch_q22(
    sf_dir: str,
    codes: Sequence[int] = (3, 8, 13, 18, 23),
    since: str = "2000-01-01",
) -> pd.DataFrame:
    """Global sales opportunity (TPC-H Q22 shape): well-funded dormant
    customers by country.

    Fixture adaptations: c_nationkey stands in for the phone-prefix
    country code (no c_phone), and dormancy is "no orders on/after
    ``since``" — every fixture customer has lifetime orders, so the
    classic NOT-EXISTS-any-order predicate would be vacuously empty.

    Plan: pass 1 streams the code-filtered customers into two int64
    partials (count and cent-sum of positive balances) — the global
    mean arrives as two scalars, never a materialized table; pass 2
    re-streams the same pruned read, keeps rows with
    bal_c·cnt > sum_c (integer-exact strict >), and anti-joins the
    date-filtered order keys on the shuffle (a Bloom prefilter cannot
    apply: anti-join semantics need every left row to reach its
    verify partition).  One grouped_agg folds (count, cent-sum) per
    country; only #codes rows reach the driver.
    """
    code_arr = pa.array(list(codes), pa.int32())
    since_ts = pa.scalar(np.datetime64(since, "us"))

    def cust_read() -> "Dataset":
        return read(
            sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
        ).map_batches(
            lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=code_arr)),
            batch_format="pyarrow", zero_copy_batch=True,
        )

    def stat_partial(t: pa.Table) -> pa.Table:
        bal_c = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        pos = bal_c > 0
        return pa.table({
            "sum_c": pa.array([int(bal_c[pos].sum())], pa.int64()),
            "cnt": pa.array([int(pos.sum())], pa.int64()),
        })

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "cntrycode": pd.Series(dtype=np.int32),
            "numcust": pd.Series(dtype=np.int64),
            "totacctbal": pd.Series(dtype=np.float64),
        })

    stats = pd.DataFrame(
        cust_read().map_batches(stat_partial, batch_format="pyarrow").take_all()
    )
    sum_c, cnt = int(stats["sum_c"].sum()), int(stats["cnt"].sum())
    if cnt == 0:
        return _empty()

    def above_avg(t: pa.Table) -> pa.Table:
        bal_c = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        keep = bal_c * cnt > sum_c
        t = t.filter(pa.array(keep))
        bal_keep = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "c_custkey": t["c_custkey"],
            "cntrycode": t["c_nationkey"],
            "bal_c": bal_keep,
        })

    rich = cust_read().map_batches(above_avg, batch_format="pyarrow", zero_copy_batch=True)
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], since_ts)).select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    dormant = hash_join(rich, orders, on="c_custkey", right_on="o_custkey", how="anti")

    sums = grouped_agg(
        dormant, "cntrycode",
        {"numcust": ("count", None), "bal_sum_c": ("sum", "bal_c")},
        num_partitions=8,
    )
    df = pd.DataFrame(sums.take_all())
    if df.empty:
        return _empty()
    out = pd.DataFrame({
        "cntrycode": df["cntrycode"].astype(np.int32),
        "numcust": df["numcust"].astype(np.int64),
        "totacctbal": df["bal_sum_c"].astype(np.int64) / 100.0,
    })
    return out.sort_values("cntrycode").reset_index(drop=True)


# ----------------------------------------------------------------- TPC-H Q8
def tpch_q8(
    sf_dir: str,
    target_nation: str = "NATION_7",
    region: str = "ASIA",
    p_type: str = "ECONOMY",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
) -> pd.DataFrame:
    """National market share (TPC-H Q8 shape): the target nation's
    share of in-region revenue for one part type, by order year.

    Fixture adaptation: volume is price*(1-discount) as everywhere
    (no ps_supplycost), and p_type is an exact match (the fixture's
    type domain is 6 flat labels, not the 150 three-word combos).

    Plan: nation/region (25/5 rows) resolve the target key and the
    region's nation set on the driver.  The type-filtered part keys
    (~1/6 of part) Bloom-prefilter lineitem BEFORE its first exchange;
    the date-filtered orders side prefilters the join to lineitem the
    same way, so both big tables shed most rows pre-shuffle.  Supplier
    (for s_nationkey) and region-filtered customer join next — the
    customer filter applies to numerator AND denominator, the supplier
    nation only gates the numerator, evaluated vectorized post-join.
    One grouped_agg folds per-year (num_u4, den_u4) exact partials;
    the driver divides once per year (2 rows).
    """
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    if rkey.empty:
        raise ValueError(f"unknown region {region!r}")
    region_nations = pa.array(
        nat.loc[nat["n_regionkey"] == int(rkey.iloc[0]), "n_nationkey"].astype(int).tolist(),
        pa.int32(),
    )
    tgt = nat.loc[nat["n_name"] == target_nation, "n_nationkey"]
    if tgt.empty:
        raise ValueError(f"unknown nation {target_nation!r}")
    tgt_key = int(tgt.iloc[0])

    part = read(sf_dir, "part", columns=["p_partkey", "p_type"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_type"], p_type)).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "vol_u4": _u4(t),
        })

    li = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    li_p = hash_join(li, part, on="l_partkey", right_on="p_partkey",
                     how="semi", bloom_prefilter=True, broadcast="auto")

    def ord_derive(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["o_orderdate"], lo), pc.less(t["o_orderdate"], hi))
        t = t.filter(m)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int32()),
        })

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ord_derive, batch_format="pyarrow", zero_copy_batch=True,
    )
    j1 = hash_join(li_p, orders, on="l_orderkey", right_on="o_orderkey",
                   how="inner", bloom_prefilter=True)

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=region_nations))
                   .select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    j2 = hash_join(j1, cust, on="o_custkey", right_on="c_custkey",
                   how="semi", bloom_prefilter=True, broadcast="auto")

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    j3 = hash_join(j2, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")

    def shares(t: pa.Table) -> pa.Table:
        vol = t["vol_u4"].to_numpy(zero_copy_only=False)
        is_tgt = t["s_nationkey"].to_numpy(zero_copy_only=False) == tgt_key
        return pa.table({
            "o_year": t["o_year"],
            "num_u4": np.where(is_tgt, vol, 0),
            "den_u4": vol,
        })

    sums = grouped_agg(
        j3.map_batches(shares, batch_format="pyarrow", zero_copy_batch=True),
        "o_year", {"num_u4": ("sum", "num_u4"), "den_u4": ("sum", "den_u4")},
        num_partitions=4,
    )
    df = pd.DataFrame(sums.take_all())
    if df.empty:
        return pd.DataFrame({
            "o_year": pd.Series(dtype=np.int32),
            "mkt_share": pd.Series(dtype=np.float64),
        })
    out = pd.DataFrame({
        "o_year": df["o_year"].astype(np.int32),
        "mkt_share": (
            df["num_u4"].astype(np.int64) / df["den_u4"].astype(np.int64)
        ).round(6),
    })
    return out.sort_values("o_year").reset_index(drop=True)


# ----------------------------------------------------------------- TPC-H Q9
def tpch_q9(sf_dir: str, name_token: str = "red") -> pd.DataFrame:
    """Product-type profit (TPC-H Q9 shape): revenue from parts whose
    name contains a token, by supplier nation and order year.

    Fixture adaptation: profit is price*(1-discount) exact u4 (the
    generator has no ps_supplycost to subtract).

    Plan: the name-matched part keys (~1/k of part) Bloom-prefilter
    lineitem before any exchange; orders joins on orderkey for the
    year with the (already small) lineitem side prefiltering ORDERS —
    the probe direction flips because here the fact side is the
    filtered one.  Supplier joins for s_nationkey; one grouped_agg
    folds (nationkey, year) sums and the 25-row nation map decorates
    on the driver.
    """
    part = read(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda t: t.filter(
            pc.match_substring(t["p_name"], name_token)
        ).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "profit_u4": _u4(t),
        })

    li = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    li_p = hash_join(li, part, on="l_partkey", right_on="p_partkey",
                     how="semi", bloom_prefilter=True, broadcast="auto")

    def ord_derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int32()),
        })

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"]).map_batches(
        ord_derive, batch_format="pyarrow", zero_copy_batch=True,
    )
    # the FILTERED lineitem side is the small one here: make it the
    # right/build side so its Bloom prunes the full orders scan
    j1 = hash_join(orders, li_p, on="o_orderkey", right_on="l_orderkey",
                   how="inner", bloom_prefilter=True)

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    j2 = hash_join(j1, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")

    sums = grouped_agg(
        j2.select_columns(["s_nationkey", "o_year", "profit_u4"]),
        ["s_nationkey", "o_year"], {"profit_u4": ("sum", "profit_u4")},
        num_partitions=8,
    )
    df = pd.DataFrame(sums.take_all())
    if df.empty:
        return pd.DataFrame({
            "nation": pd.Series(dtype=object),
            "o_year": pd.Series(dtype=np.int32),
            "sum_profit": pd.Series(dtype=np.float64),
        })
    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    nmap = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"].astype(str)))
    out = pd.DataFrame({
        "nation": df["s_nationkey"].astype(int).map(nmap),
        "o_year": df["o_year"].astype(np.int32),
        "sum_profit": df["profit_u4"].astype(np.int64) / 10000.0,
    })
    return out.sort_values(
        ["nation", "o_year"], ascending=[True, False]
    ).reset_index(drop=True)


# ----------------------------------------------------------------- TPC-H Q2
def tpch_q2(
    sf_dir: str,
    size: int = 15,
    region: str = "EUROPE",
    limit: int = 100,
) -> pd.DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): for each size-matched
    part, the in-region supplier(s) with the minimum account balance.

    Fixture adaptations: the part↔supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem (no partsupp
    table), the correlated minimum is over s_acctbal (no
    ps_supplycost), and the part filter is p_size alone (the type
    domain is 6 flat labels; a compound filter empties at tiny SF).

    Plan: the size-matched part keys Bloom-prefilter lineitem before
    any exchange; the pair-distinct folds map-side in the same
    grouped_agg shuffle.  Region suppliers resolve their nation gate
    from the driver-side 25-row nation map and join the (already
    tiny) pair set.  The correlated MIN evaluates INSIDE one
    partkey-hash partition (q17's kernel shape: np groupby → per-part
    min in exact cents → equality keep), so there is no join-back.
    Part names decorate the ≤limit winners at the end.
    """
    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    if rkey.empty:
        raise ValueError(f"unknown region {region!r}")
    rnat = nat.loc[nat["n_regionkey"] == int(rkey.iloc[0])]
    region_nations = pa.array(rnat["n_nationkey"].astype(int).tolist(), pa.int32())
    nmap = dict(zip(rnat["n_nationkey"].astype(int), rnat["n_name"].astype(str)))

    part = read(sf_dir, "part", columns=["p_partkey", "p_size", "p_name"]).map_batches(
        lambda t: t.filter(pc.equal(t["p_size"], size)).select(["p_partkey", "p_name"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # consumed twice: key prefilter + final name decorate

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    li_p = hash_join(
        li, part.select_columns(["p_partkey"]),
        on="l_partkey", right_on="p_partkey", how="semi", bloom_prefilter=True,
        broadcast="auto",
    )
    pairs = grouped_agg(
        li_p, ["l_partkey", "l_suppkey"], {"__n": ("count", None)}, num_partitions=16
    ).select_columns(["l_partkey", "l_suppkey"])

    def supp_derive(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["s_nationkey"], value_set=region_nations))
        bal_c = np.rint(t["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "s_suppkey": t["s_suppkey"],
            "s_name": t["s_name"],
            "s_nationkey": t["s_nationkey"],
            "bal_c": bal_c,
        })

    supp = read(
        sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]
    ).map_batches(supp_derive, batch_format="pyarrow", zero_copy_batch=True)
    cand = hash_join(pairs, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")

    P = 8

    def tag(t: pa.Table) -> pa.Table:
        gp = _partition_of_keys(t, ["l_partkey"], P)
        return t.append_column("__gp", pa.array(gp))

    def keep_min(g: pa.Table) -> pa.Table:
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        bal = g["bal_c"].to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        pk_s, bal_s = pk[order], bal[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        gid = np.cumsum(np.r_[0, (pk_s[1:] != pk_s[:-1]).astype(np.int64)])
        mins = np.minimum.reduceat(bal_s, starts)
        keep_sorted = bal_s == mins[gid]
        keep = np.empty(len(g), dtype=bool)
        keep[order] = keep_sorted
        return g.filter(pa.array(keep)).drop_columns(["__gp"])

    winners = (
        cand.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(keep_min, batch_format="pyarrow")
    )
    df = pd.DataFrame(winners.take_all())
    if df.empty:
        return pd.DataFrame({
            "s_acctbal": pd.Series(dtype=np.float64),
            "s_name": pd.Series(dtype=object),
            "n_name": pd.Series(dtype=object),
            "p_partkey": pd.Series(dtype=np.int64),
            "p_name": pd.Series(dtype=object),
        })
    names = part.to_pandas()  # size-filtered only: tiny
    pmap = dict(zip(names["p_partkey"].astype(int), names["p_name"].astype(str)))
    out = pd.DataFrame({
        "s_acctbal": df["bal_c"].astype(np.int64) / 100.0,
        "s_name": df["s_name"],
        "n_name": df["s_nationkey"].astype(int).map(nmap),
        "p_partkey": df["l_partkey"].astype(np.int64),
        "p_name": df["l_partkey"].astype(int).map(pmap),
    })
    return (
        out.sort_values(
            ["s_acctbal", "n_name", "s_name", "p_partkey"],
            ascending=[False, True, True, True],
        )
        .head(limit)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------- TPC-H Q16
def tpch_q16(
    sf_dir: str,
    exclude_brand: str = "Brand#45",
    exclude_type: str = "PROMO",
    sizes: Sequence[int] = (1, 4, 9, 14, 19, 23, 36, 45),
) -> pd.DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape): distinct supplier
    count per (brand, type, size) over the filtered part universe.

    Fixture adaptations: the part↔supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs from lineitem (no partsupp), the
    type exclusion is equality (6 flat labels, no 'MEDIUM POLISHED%'
    prefixes), and the complaint-supplier exclusion is s_acctbal < 0
    (no s_comment).

    Plan: the filtered part side (keys + attrs) Bloom-prefilters
    lineitem; the pair-distinct AND the (brand,type,size,supplier)
    distinct fold in grouped_agg shuffles (map-side combined);
    negative-balance suppliers drop via a hash anti-join BEFORE the
    distinct so excluded pairs never reach the count.  The final
    count-distinct is a count over the already-distinct 4-tuples.
    """
    size_set = pa.array(list(sizes), pa.int32())

    def part_filter(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.not_equal(t["p_brand"], exclude_brand),
                pc.not_equal(t["p_type"], exclude_type),
            ),
            pc.is_in(pc.cast(t["p_size"], pa.int32()), value_set=size_set),
        )
        return t.filter(m).select(["p_partkey", "p_brand", "p_type", "p_size"])

    part = read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).map_batches(part_filter, batch_format="pyarrow", zero_copy_batch=True)

    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    pairs = grouped_agg(
        hash_join(li, part.select_columns(["p_partkey"]),
                  on="l_partkey", right_on="p_partkey",
                  how="semi", bloom_prefilter=True, broadcast="auto"),
        ["l_partkey", "l_suppkey"], {"__n": ("count", None)}, num_partitions=16,
    ).select_columns(["l_partkey", "l_suppkey"])

    bad = read(sf_dir, "supplier", columns=["s_suppkey", "s_acctbal"]).map_batches(
        lambda t: t.filter(pc.less(t["s_acctbal"], 0.0)).select(["s_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs_ok = hash_join(pairs, bad, on="l_suppkey", right_on="s_suppkey", how="anti", broadcast="auto")

    dec = hash_join(pairs_ok, part, on="l_partkey", right_on="p_partkey", how="inner", broadcast="auto")
    quads = grouped_agg(
        dec.select_columns(["p_brand", "p_type", "p_size", "l_suppkey"]),
        ["p_brand", "p_type", "p_size", "l_suppkey"],
        {"__n": ("count", None)}, num_partitions=16,
    )
    counts = grouped_agg(
        quads.select_columns(["p_brand", "p_type", "p_size"]),
        ["p_brand", "p_type", "p_size"],
        {"supplier_cnt": ("count", None)}, num_partitions=8,
    )
    df = pd.DataFrame(counts.take_all())
    if df.empty:
        return pd.DataFrame({
            "p_brand": pd.Series(dtype=object),
            "p_type": pd.Series(dtype=object),
            "p_size": pd.Series(dtype=np.int32),
            "supplier_cnt": pd.Series(dtype=np.int64),
        })
    out = pd.DataFrame({
        "p_brand": df["p_brand"],
        "p_type": df["p_type"],
        "p_size": df["p_size"].astype(np.int32),
        "supplier_cnt": df["supplier_cnt"].astype(np.int64),
    })
    return out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
    ).reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H Q21
def tpch_q21(
    sf_dir: str,
    nation: str = "NATION_3",
    late_days: int = 30,
    limit: int = 100,
) -> pd.DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): on a
    finished multi-supplier order, the supplier was the ONLY one late.

    Fixture adaptations: "late" is l_shipdate >= o_orderdate +
    late_days (no l_commitdate/l_receiptdate), matching q4_late's
    lateness notion.

    Plan: status-'F' orders (keys + dates) Bloom-prefilter lineitem
    before the join exchange; the joined rows hash-partition ONCE by
    orderkey and the whole EXISTS / NOT-EXISTS pair evaluates inside
    the partition kernel (np lexsort → per-(order,supplier) late-any
    via maximum.reduceat → per-order supplier/late counts → qualify
    late ∧ n_supp>1 ∧ n_late==1), emitting per-partition (suppkey,
    partial count) rows — the second exchange is one grouped_agg over
    ≤ suppliers×P rows.  The nation gate and name decorate at the
    end on the ≤limit winners (supplier is SF-proportional: a proper
    shuffle join, not a driver map).
    """
    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    tgt = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    if tgt.empty:
        raise ValueError(f"unknown nation {nation!r}")
    tgt_key = int(tgt.iloc[0])
    late_us = np.int64(late_days) * 86_400_000_000

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F")).select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    j = hash_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                  how="inner", bloom_prefilter=True)

    P = 16

    def tag(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        odate = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        out = pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "late": (ship >= odate + late_us).astype(np.int64),
        })
        gp = _partition_of_keys(out, ["l_orderkey"], P)
        return out.append_column("__gp", pa.array(gp))

    def qualify(g: pa.Table) -> pa.Table:
        ok = g["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False)
        late = g["late"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, ok))
        ok_s, sk_s, late_s = ok[order], sk[order], late[order]
        # distinct (order, supplier) with late-any
        new_pair = np.r_[True, (ok_s[1:] != ok_s[:-1]) | (sk_s[1:] != sk_s[:-1])]
        pstarts = np.flatnonzero(new_pair)
        p_ok = ok_s[pstarts]
        p_sk = sk_s[pstarts]
        p_late = np.maximum.reduceat(late_s, pstarts)
        # per-order supplier count and late-supplier count
        new_ord = np.r_[True, p_ok[1:] != p_ok[:-1]]
        ostarts = np.flatnonzero(new_ord)
        n_supp = np.diff(np.r_[ostarts, len(p_ok)])
        n_late = np.add.reduceat(p_late, ostarts)
        gid = np.cumsum(np.r_[0, new_ord[1:].astype(np.int64)])
        win = (p_late == 1) & (n_supp[gid] > 1) & (n_late[gid] == 1)
        if not win.any():
            return pa.table({
                "l_suppkey": pa.array([], pa.int64()),
                "numwait": pa.array([], pa.int64()),
            })
        wsk = p_sk[win]
        wsort = np.sort(wsk)
        sstarts = np.flatnonzero(np.r_[True, wsort[1:] != wsort[:-1]])
        return pa.table({
            "l_suppkey": wsort[sstarts],
            "numwait": np.diff(np.r_[sstarts, len(wsort)]).astype(np.int64),
        })

    partials = (
        j.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(qualify, batch_format="pyarrow")
    )
    waits = grouped_agg(
        partials, "l_suppkey", {"numwait": ("sum", "numwait")}, num_partitions=4
    )
    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.equal(pc.cast(t["s_nationkey"], pa.int32()), tgt_key))
                   .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    dec = hash_join(waits, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")
    df = pd.DataFrame(dec.take_all())
    if df.empty:
        return pd.DataFrame({
            "s_name": pd.Series(dtype=object),
            "numwait": pd.Series(dtype=np.int64),
        })
    out = pd.DataFrame({
        "s_name": df["s_name"],
        "numwait": df["numwait"].astype(np.int64),
    })
    return (
        out.sort_values(["numwait", "s_name"], ascending=[False, True])
        .head(limit)
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------- TPC-H Q11
def tpch_q11(
    sf_dir: str,
    nation: str = "NATION_3",
    frac_num: int = 2,
    frac_den: int = 1000,
) -> pd.DataFrame:
    """Important stock identification (TPC-H Q11 shape): parts whose
    one-nation value exceeds a fraction of that nation's total.

    Fixture adaptations: part value is the exact-u4 sum of
    l_extendedprice*(1-l_discount) over the nation's suppliers'
    lineitems (no ps_supplycost*ps_availqty), and the fraction is
    ``frac_num/frac_den`` (the classic 0.0001/SF doesn't transfer to
    the fixture's flat 100-supplier table).

    Plan: the nation's supplier keys Bloom-prefilter lineitem before
    any exchange; ONE grouped_agg folds exact per-part u4 sums (≤
    |part| rows), which materialize once because they are consumed
    twice — a streaming global sum, then the threshold filter.  The
    comparison is integer-exact (value·den > total·num); only
    qualifying rows reach the driver.
    """
    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    tgt = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    if tgt.empty:
        raise ValueError(f"unknown nation {nation!r}")
    tgt_key = int(tgt.iloc[0])

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(
            pc.equal(pc.cast(t["s_nationkey"], pa.int32()), tgt_key)
        ).select(["s_suppkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_derive(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "val_u4": _u4(t),
        })

    li = read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    li_n = hash_join(li, supp, on="l_suppkey", right_on="s_suppkey",
                     how="semi", bloom_prefilter=True, broadcast="auto")

    per_part = grouped_agg(
        li_n, "l_partkey", {"val_u4": ("sum", "val_u4")}, num_partitions=16
    ).materialize()  # ≤ |part| rows; consumed twice (total, filter)
    if per_part.count() == 0:
        return pd.DataFrame({
            "p_partkey": pd.Series(dtype=np.int64),
            "value": pd.Series(dtype=np.float64),
        })
    total_u4 = per_part.sum("val_u4")

    winners = per_part.map_batches(
        lambda t: t.filter(pa.array(
            t["val_u4"].to_numpy(zero_copy_only=False) * frac_den
            > total_u4 * frac_num
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    df = pd.DataFrame(winners.take_all())
    if df.empty:
        return pd.DataFrame({
            "p_partkey": pd.Series(dtype=np.int64),
            "value": pd.Series(dtype=np.float64),
        })
    out = pd.DataFrame({
        "p_partkey": df["l_partkey"].astype(np.int64),
        "value": df["val_u4"].astype(np.int64) / 10000.0,
    })
    return out.sort_values(
        ["value", "p_partkey"], ascending=[False, True]
    ).reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H Q12
def tpch_q12(
    sf_dir: str,
    late_days: int = 30,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
) -> pd.DataFrame:
    """Shipping modes & order priority (TPC-H Q12 shape): per shipping
    class, how many high- vs low-priority order lines it carried.

    Fixture adaptations: the class is lateness (LATE = shipped >=
    late_days after the order date, ONTIME otherwise — no l_shipmode),
    the window filters l_shipdate (no l_receiptdate), and high
    priority is o_orderpriority ∈ {1-URGENT, 2-HIGH} as in the
    original.

    Plan: the window-filtered lineitem keeps only (orderkey, shipdate);
    orders Bloom-prune against it in the one shuffle join; the bucket
    and both conditional counts evaluate vectorized post-join and fold
    in a 2-row grouped_agg.
    """
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))
    late_us = np.int64(late_days) * 86_400_000_000

    li = read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(orders, li, on="o_orderkey", right_on="l_orderkey",
                  how="inner", bloom_prefilter=True)

    def classify(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        odate = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        pri = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        high = (pri == "1-URGENT") | (pri == "2-HIGH")
        late = ship >= odate + late_us
        return pa.table({
            "ship_class": np.where(late, "LATE", "ONTIME"),
            "high_line_count": high.astype(np.int64),
            "low_line_count": (~high).astype(np.int64),
        })

    sums = grouped_agg(
        j.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True),
        "ship_class",
        {"high_line_count": ("sum", "high_line_count"),
         "low_line_count": ("sum", "low_line_count")},
        num_partitions=2,
    )
    df = pd.DataFrame(sums.take_all())
    if df.empty:
        return pd.DataFrame({
            "ship_class": pd.Series(dtype=object),
            "high_line_count": pd.Series(dtype=np.int64),
            "low_line_count": pd.Series(dtype=np.int64),
        })
    df["high_line_count"] = df["high_line_count"].astype(np.int64)
    df["low_line_count"] = df["low_line_count"].astype(np.int64)
    return df.sort_values("ship_class").reset_index(drop=True)


# ---------------------------------------------------------------- TPC-H Q20
def tpch_q20(
    sf_dir: str,
    name_token: str = "red",
    region: str = "EUROPE",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> pd.DataFrame:
    """Potential part promotion (TPC-H Q20 shape): in-region suppliers
    who dominated some name-matched part's supply in a year.

    Fixture adaptations: with no partsupp.availqty, "dominates" means
    the supplier shipped MORE THAN HALF of the part's total quantity
    in the window (the same half-of-shipped-quantity scalar the
    original compares availqty against), and the supplier gate is a
    region (a single fixture nation holds ~4 suppliers — too brittle
    at tiny SF).

    Plan: the name-matched part keys Bloom-prefilter the window-
    filtered lineitem before its one exchange; inside each
    partkey-hash partition the kernel folds per-(part, supplier)
    quantity sums AND part totals, emitting the distinct qualifying
    suppliers per partition (integer-exact: 2·qty > total).  A tiny
    grouped_agg dedups suppliers across partitions and the
    region-filtered supplier table decorates names in the final join.
    """
    lo = pa.scalar(np.datetime64(date_lo, "us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"))

    nat = read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    reg = read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    rkey = reg.loc[reg["r_name"] == region, "r_regionkey"]
    if rkey.empty:
        raise ValueError(f"unknown region {region!r}")
    region_nations = pa.array(
        nat.loc[nat["n_regionkey"] == int(rkey.iloc[0]), "n_nationkey"]
        .astype(int).tolist(),
        pa.int32(),
    )

    part = read(sf_dir, "part", columns=["p_partkey", "p_name"]).map_batches(
        lambda t: t.filter(
            pc.match_substring(t["p_name"], name_token)
        ).select(["p_partkey"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def li_derive(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi))
        t = t.filter(m)
        qty_c = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)
        return pa.table({
            "l_partkey": t["l_partkey"],
            "l_suppkey": t["l_suppkey"],
            "qty_c": qty_c,
        })

    li = read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(li_derive, batch_format="pyarrow", zero_copy_batch=True)
    li_p = hash_join(li, part, on="l_partkey", right_on="p_partkey",
                     how="semi", bloom_prefilter=True, broadcast="auto")

    P = 8

    def tag(t: pa.Table) -> pa.Table:
        gp = _partition_of_keys(t, ["l_partkey"], P)
        return t.append_column("__gp", pa.array(gp))

    def dominators(g: pa.Table) -> pa.Table:
        pk = g["l_partkey"].to_numpy(zero_copy_only=False)
        sk = g["l_suppkey"].to_numpy(zero_copy_only=False)
        qty = g["qty_c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sk, pk))
        pk_s, sk_s, qty_s = pk[order], sk[order], qty[order]
        new_pair = np.r_[True, (pk_s[1:] != pk_s[:-1]) | (sk_s[1:] != sk_s[:-1])]
        pstarts = np.flatnonzero(new_pair)
        pair_pk = pk_s[pstarts]
        pair_sk = sk_s[pstarts]
        pair_qty = np.add.reduceat(qty_s, pstarts)
        new_part = np.r_[True, pair_pk[1:] != pair_pk[:-1]]
        tstarts = np.flatnonzero(new_part)
        totals = np.add.reduceat(pair_qty, tstarts)
        gid = np.cumsum(np.r_[0, new_part[1:].astype(np.int64)])
        win_sk = pair_sk[2 * pair_qty > totals[gid]]
        return pa.table({"l_suppkey": np.unique(win_sk)})

    winners = (
        li_p.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gp")
        .map_groups(dominators, batch_format="pyarrow")
    )
    distinct = grouped_agg(
        winners, "l_suppkey", {"__n": ("count", None)}, num_partitions=4
    ).select_columns(["l_suppkey"])

    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["s_nationkey"], value_set=region_nations))
                   .select(["s_suppkey", "s_name"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    dec = hash_join(distinct, supp, on="l_suppkey", right_on="s_suppkey", how="inner", broadcast="auto")
    df = pd.DataFrame(dec.take_all())
    if df.empty:
        return pd.DataFrame({"s_name": pd.Series(dtype=object)})
    return (
        pd.DataFrame({"s_name": df["s_name"]})
        .sort_values("s_name")
        .reset_index(drop=True)
    )
