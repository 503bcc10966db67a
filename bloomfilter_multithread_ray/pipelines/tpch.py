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
        how="inner", bloom_prefilter=True,
    )

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t["c_nationkey"], value_set=pair)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ord_c = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        how="inner", bloom_prefilter=True,
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
    j = hash_join(cust, counts, on="c_custkey", right_on="o_custkey", how="left")

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
    dec = hash_join(winners, supp, on="l_suppkey", right_on="s_suppkey", how="inner")
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
                    how="semi", bloom_prefilter=True)

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
                  how="inner", bloom_prefilter=True)

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
