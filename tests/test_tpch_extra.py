"""Planted boundary tests for the q7/q13/q15/q17/q19/q22 TPC-H shapes.

One coherent micro-fixture; each query's rows are decoupled by brand
(q17 vs q19), date window (q7 vs q15), or table (q13/q22 touch only
customer+orders), so every expectation is hand-computable.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_fixture(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int32()),
        "r_name": pa.array(["R0"], pa.string()),
    }), d / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["ALPHA", "BRAVO", "CHARLIE"], pa.string()),
        "n_regionkey": pa.array([0, 0, 0], pa.int32()),
    }), d / "nation.parquet")
    # balances: positives sum 1750.00 over 5 (avg 350); c15 sits EXACTLY
    # at the mean (strict > must exclude); c11/c14 above it
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12, 13, 14, 15], pa.int64()),
        "c_name": pa.array([f"c{k}" for k in (10, 11, 12, 13, 14, 15)], pa.string()),
        "c_nationkey": pa.array([0, 1, 2, 1, 2, 0], pa.int32()),
        "c_acctbal": pa.array([100.0, 500.0, -50.0, 200.0, 600.0, 350.0]),
        "c_mktsegment": pa.array(["BUILDING"] * 6, pa.string()),
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101, 102], pa.int64()),
        "s_name": pa.array(["s100", "s101", "s102"], pa.string()),
        "s_nationkey": pa.array([0, 1, 2], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0, 0.0]),
    }), d / "supplier.parquet")
    # parts: 7 = q17's brand; 12/13/23/34 = q19 cases (13 fails the
    # Brand#12 size range); 99 = inert filler for q7/q15 lines
    pq.write_table(pa.table({
        "p_partkey": pa.array([7, 12, 13, 23, 34, 99], pa.int64()),
        "p_name": pa.array(["p7", "p12", "p13", "p23", "p34", "p99"], pa.string()),
        "p_brand": pa.array(
            ["BX", "Brand#12", "Brand#12", "Brand#23", "Brand#34", "ZZ"], pa.string()),
        "p_type": pa.array(["STANDARD"] * 6, pa.string()),
        "p_size": pa.array([1, 5, 6, 10, 15, 50], pa.int32()),
        "p_retailprice": pa.array([1.0] * 6),
    }), d / "part.parquet")
    # orders: o1 urgent (q13 anti-filter drops it); c11 has two
    # non-urgent 1996 orders (dormant by 2000); c14's order is recent
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "o_custkey": pa.array([10, 11, 13, 11, 14], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 5, pa.string()),
        "o_totalprice": pa.array([1.0] * 5),
        "o_orderdate": pa.array([ts("1996-02-01"), ts("1996-03-01"),
                                 ts("2001-05-01"), ts("1996-06-01"),
                                 ts("2001-05-01")]),
        "o_orderpriority": pa.array(
            ["1-URGENT", "2-HIGH", "2-HIGH", "2-HIGH", "2-HIGH"], pa.string()),
    }), d / "orders.parquet")
    rows = [
        # ---- q7 window 1996..1998 (part 99 keeps q17/q19 out) ----
        # A: supp ALPHA -> cust BRAVO, 1996, rev 90.0 (in)
        (2, 99, 100, 1.0, 100.00, 0.10, "1996-04-02"),
        # B: supp BRAVO -> cust ALPHA, 1997, rev 19.0 (in)
        (1, 99, 101, 1.0, 20.00, 0.05, "1997-03-01"),
        # C: same-nation pair ALPHA->ALPHA (out)
        (1, 99, 100, 1.0, 500.00, 0.0, "1996-05-01"),
        # D: CHARLIE supplier not in the pair (out)
        (2, 99, 102, 1.0, 77.00, 0.0, "1996-06-01"),
        # E: outside the ship window (out)
        (1, 99, 101, 1.0, 999.00, 0.0, "1999-01-01"),
        # ---- q15 window 2002-Q1: s100 and s101 TIE at 100.0 ----
        (1, 99, 100, 1.0, 100.00, 0.0, "2002-02-01"),
        (1, 99, 101, 1.0, 60.00, 0.0, "2002-02-02"),
        (1, 99, 101, 1.0, 40.00, 0.0, "2002-02-03"),
        (1, 99, 102, 1.0, 50.00, 0.0, "2002-02-04"),
        # ---- q17 brand BX: qty sum 15.0 over 3 lines (mean 5, 1/5 of
        # mean = 1.0); 0.8 < 1.0 in, 1.0 == 1.0 OUT (strict), 13.2 out
        (1, 7, 100, 0.8, 70.00, 0.0, "2003-01-01"),
        (1, 7, 100, 1.0, 50.00, 0.0, "2003-01-02"),
        (1, 7, 100, 13.2, 99.00, 0.0, "2003-01-03"),
        # ---- q19 (2003 dates keep q7/q15 out; brands keep q17 out) --
        # M: Brand#12 size 5, qty 11 = hi boundary, rev 100 (in)
        (1, 12, 100, 11.0, 100.00, 0.0, "2003-02-01"),
        # N: Brand#12 but size 6 fails the part-side filter (out)
        (1, 13, 100, 5.0, 100.00, 0.0, "2003-02-02"),
        # O: Brand#23 qty 10 = lo boundary, rev 30 (in)
        (1, 23, 100, 10.0, 30.00, 0.0, "2003-02-03"),
        # P: Brand#23 qty 21 passes the GLOBAL qty prefilter [1,30] but
        # fails its own case's range — must drop in the disjunction
        (1, 23, 100, 21.0, 500.00, 0.0, "2003-02-04"),
        # Q: Brand#34 qty 20 = lo boundary, rev 25.50 (in)
        (1, 34, 100, 20.0, 25.50, 0.0, "2003-02-05"),
    ]
    ok, pk, sk, qty, price, disc, ship = zip(*rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)), pa.int32()),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(disc),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["F"] * len(rows), pa.string()),
        "l_shipdate": pa.array([np.datetime64(s, "us") for s in ship]),
    }), d / "lineitem.parquet")
    return str(d)


def test_tpch_q7_cross_pairs(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q7

    sf = _write_fixture(tmp_path)
    got = tpch_q7(sf, nation_a="ALPHA", nation_b="BRAVO",
                  date_lo="1996-01-01", date_hi="1998-01-01")
    assert got.to_dict("records") == [
        {"supp_nation": "ALPHA", "cust_nation": "BRAVO", "l_year": 1996, "revenue": 90.0},
        {"supp_nation": "BRAVO", "cust_nation": "ALPHA", "l_year": 1997, "revenue": 19.0},
    ]


def test_tpch_q13_distribution_counts_zero_bucket(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q13

    sf = _write_fixture(tmp_path)
    got = tpch_q13(sf, exclude_priority="1-URGENT")
    # c10's only order is urgent -> 0; c12/c15 have none -> 0 (x3);
    # c13/c14 one each; c11 two.  custdist desc, then c_count desc.
    assert got.to_dict("records") == [
        {"c_count": 0, "custdist": 3},
        {"c_count": 1, "custdist": 2},
        {"c_count": 2, "custdist": 1},
    ]


def test_tpch_q15_includes_ties(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q15

    sf = _write_fixture(tmp_path)
    got = tpch_q15(sf, date_lo="2002-01-01", date_hi="2002-04-01")
    assert got.to_dict("records") == [
        {"s_suppkey": 100, "s_name": "s100", "total_revenue": 100.0},
        {"s_suppkey": 101, "s_name": "s101", "total_revenue": 100.0},
    ]


def test_tpch_q15_empty_window_typed(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q15

    sf = _write_fixture(tmp_path)
    got = tpch_q15(sf, date_lo="2010-01-01", date_hi="2010-04-01")
    assert len(got) == 0
    assert got["s_suppkey"].dtype == np.int64
    assert got["total_revenue"].dtype == np.float64


def test_tpch_q17_strict_fraction_boundary(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q17

    sf = _write_fixture(tmp_path)
    got = tpch_q17(sf, brand="BX")
    # only the 0.8-qty line (price 70.00) is under 1/5 of the part
    # mean; the exactly-at-threshold 1.0-qty line must be excluded
    assert got.loc[0, "avg_yearly"] == round(70.0 / 7.0, 6)


def test_tpch_q19_disjunction_boundaries(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q19

    sf = _write_fixture(tmp_path)
    got = tpch_q19(sf)
    # M (100) + O (30) + Q (25.50); N fails part-side size, P fails
    # its case's qty range despite passing the global prefilter
    assert got.loc[0, "revenue"] == 155.50


def test_tpch_q22_dormant_above_mean(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q22

    sf = _write_fixture(tmp_path)
    got = tpch_q22(sf, codes=(0, 1, 2), since="2000-01-01")
    # mean positive balance is exactly 350: c15 (350, no orders) is
    # excluded by the STRICT >; c14 is rich but has a 2001 order
    # (anti-join drops it); c11 is rich and dormant
    assert got.to_dict("records") == [
        {"cntrycode": 1, "numcust": 1, "totacctbal": 500.0},
    ]


def test_tpch_q22_no_dormant_typed_empty(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q22

    sf = _write_fixture(tmp_path)
    # cutoff before every order: nobody is dormant
    got = tpch_q22(sf, codes=(0, 1, 2), since="1995-01-01")
    assert len(got) == 0
    assert got["numcust"].dtype == np.int64
