"""Planted boundary tests for the q2/q8/q9/q16/q21 TPC-H shapes.

One coherent micro-fixture; queries are decoupled by part (q2/q16 use
size-15 / size-4 parts on orderkeys absent from orders, q8/q9 use the
'red gear' ECONOMY part on status-'O' orders, q21 uses the size-3 part
on status-'F' orders), so every expectation is hand-computable.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_fixture(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["R0", "R1"], pa.string()),
    }), d / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["ALPHA", "BRAVO", "CHARLIE"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    }), d / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([201, 202], pa.int64()),
        "c_name": pa.array(["c201", "c202"], pa.string()),
        "c_nationkey": pa.array([1, 2], pa.int32()),  # BRAVO in R0, CHARLIE in R1
        "c_acctbal": pa.array([0.0, 0.0]),
        "c_mktsegment": pa.array(["BUILDING"] * 2, pa.string()),
    }), d / "customer.parquet")
    # s100/s101 tie at the q2 minimum; s103 is cheaper but out-of-region
    # for q2 AND negative-balance (q16's complaint exclusion)
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101, 102, 103], pa.int64()),
        "s_name": pa.array(["s100", "s101", "s102", "s103"], pa.string()),
        "s_nationkey": pa.array([0, 0, 1, 2], pa.int32()),
        "s_acctbal": pa.array([50.0, 50.0, 10.0, -5.0]),
    }), d / "supplier.parquet")
    # 1/2: q2 (size 15; p2 is PROMO — q2's size-only filter keeps it);
    # 3: q8/q9 (ECONOMY + 'red' name); 4/5/6/8: q16 (size 4; p5 brand-
    # excluded, p6 type-excluded, p8 duplicates p4's supplier for the
    # count-distinct); 7: q21 (size 3 keeps it out of everything else)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "p_name": pa.array(["green widget", "blue bolt", "red gear", "part4",
                            "part5", "part6", "hot bolt", "part8"], pa.string()),
        "p_brand": pa.array(["BA", "BB", "BC", "B1", "Brand#45", "B1", "BD", "B1"],
                            pa.string()),
        "p_type": pa.array(["ECONOMY", "PROMO", "ECONOMY", "ECONOMY", "ECONOMY",
                            "PROMO", "STANDARD", "ECONOMY"], pa.string()),
        "p_size": pa.array([15, 15, 2, 4, 4, 4, 3, 4], pa.int32()),
        "p_retailprice": pa.array([1.0] * 8),
    }), d / "part.parquet")
    # 10-13 are q21's 'F' orders; 14 is 'O' (status gate); 20-23 are
    # q8/q9's 'O' orders (kept out of q21); q2/q16 lineitems reference
    # orderkeys 998/999 that do NOT exist here (inner join drops them)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12, 13, 14, 20, 21, 22, 23], pa.int64()),
        "o_custkey": pa.array([201] * 5 + [201, 201, 202, 201], pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "F", "O", "O", "O", "O", "O"],
                                  pa.string()),
        "o_totalprice": pa.array([1.0] * 9),
        "o_orderdate": pa.array([ts("2005-01-01")] * 5 + [
            ts("1996-05-01"), ts("1997-05-01"), ts("1996-06-01"), ts("1999-01-01")]),
        "o_orderpriority": pa.array(["2-HIGH"] * 9, pa.string()),
    }), d / "orders.parquet")
    rows = [
        # ---- q2 pairs (ok=999 absent from orders) ----
        (999, 1, 100, "1990-01-01"),  # dup pair with next row
        (999, 1, 100, "1990-01-02"),
        (999, 1, 101, "1990-01-03"),  # ties s100 at bal 50.00
        (999, 1, 103, "1990-01-04"),  # cheaper but out-of-region
        (999, 2, 102, "1990-01-05"),
        # ---- q16 pairs (ok=998 absent from orders) ----
        (998, 4, 100, "1990-01-06"),
        (998, 4, 101, "1990-01-07"),
        (998, 4, 103, "1990-01-08"),  # negative balance -> excluded
        (998, 5, 100, "1990-01-09"),  # Brand#45 part -> excluded
        (998, 6, 102, "1990-01-10"),  # PROMO part -> excluded
        (998, 8, 100, "1990-01-11"),  # same (B1,ECONOMY,4) + same supp
    ]
    prices = [(1.0, 0.0)] * len(rows)
    # ---- q8/q9 (part 3) ----
    rows += [
        (20, 3, 100, "1996-05-02"), (20, 3, 102, "1996-05-03"),
        (21, 3, 102, "1997-05-02"), (21, 3, 100, "1997-05-03"),
        (22, 3, 100, "1996-06-02"),  # out-of-region customer (q8 only)
        (23, 3, 102, "1999-01-02"),  # outside q8's window
    ]
    prices += [(100.0, 0.0), (300.0, 0.0), (50.0, 0.10), (10.0, 0.0),
               (999.0, 0.0), (20.0, 0.0)]
    # ---- q21 (part 7, F orders dated 2005-01-01, late = +30d) ----
    rows += [
        (10, 7, 100, "2005-02-01"),  # +31d late
        (10, 7, 101, "2005-01-30"),  # +29d NOT late -> s100 sole-late
        (11, 7, 100, "2005-03-01"),  # late but single-supplier order
        (12, 7, 100, "2005-02-05"),  # both late -> n_late=2, neither
        (12, 7, 102, "2005-02-06"),
        (13, 7, 101, "2005-01-31"),  # EXACTLY +30d -> late (>=)
        (13, 7, 101, "2005-01-02"),  # same supplier not-late line
        (13, 7, 102, "2005-01-05"),  # other supplier on time
        (14, 7, 100, "2005-03-01"),  # status 'O' order -> ignored
    ]
    prices += [(1.0, 0.0)] * 9
    ok, pk, sk, ship = zip(*rows)
    price, disc = zip(*prices)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)), pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows)),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(disc),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["F"] * len(rows), pa.string()),
        "l_shipdate": pa.array([np.datetime64(s, "us") for s in ship]),
    }), d / "lineitem.parquet")
    return str(d)


def test_tpch_q2_min_tie_region_gate_and_distinct(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q2

    got = tpch_q2(_write_fixture(tmp_path), size=15, region="R0")
    exp = pd.DataFrame({
        "s_acctbal": [50.0, 50.0, 10.0],
        "s_name": ["s100", "s101", "s102"],
        "n_name": ["ALPHA", "ALPHA", "BRAVO"],
        "p_partkey": [1, 1, 2],
        "p_name": ["green widget", "green widget", "blue bolt"],
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tpch_q8_share_region_and_window(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q8

    got = tpch_q8(_write_fixture(tmp_path), target_nation="ALPHA", region="R0")
    # 1996: ALPHA 100 / (100+300); 1997: 10 / (10 + 50*0.9=45); the
    # 999.0 line is out-of-region and the 1999 line out-of-window
    exp = pd.DataFrame({
        "o_year": np.array([1996, 1997], np.int32),
        "mkt_share": [0.25, round(10.0 / 55.0, 6)],
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tpch_q9_profit_by_nation_year(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q9

    got = tpch_q9(_write_fixture(tmp_path), name_token="red")
    exp = pd.DataFrame({
        "nation": ["ALPHA", "ALPHA", "BRAVO", "BRAVO", "BRAVO"],
        "o_year": np.array([1997, 1996, 1999, 1997, 1996], np.int32),
        "sum_profit": [10.0, 1099.0, 20.0, 45.0, 300.0],
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tpch_q16_exclusions_and_count_distinct(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q16

    got = tpch_q16(_write_fixture(tmp_path))
    # p4: {s100, s101} (s103 negative-balance excluded); p8 adds the
    # SAME s100 to the same (B1, ECONOMY, 4) cell -> still 2 distinct;
    # p5 brand-excluded, p6 type-excluded
    exp = pd.DataFrame({
        "p_brand": ["B1"],
        "p_type": ["ECONOMY"],
        "p_size": np.array([4], np.int32),
        "supplier_cnt": np.array([2], np.int64),
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tpch_q21_sole_late_supplier(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q21

    got = tpch_q21(_write_fixture(tmp_path), nation="ALPHA")
    # o10: s100 late(+31d), s101 on time -> s100 wins; o11 single-
    # supplier; o12 both late; o13: s101 late via the EXACT +30d
    # boundary (late-any over its two lines), s102 on time -> s101;
    # o14 is status 'O'
    exp = pd.DataFrame({
        "s_name": ["s100", "s101"],
        "numwait": np.array([1, 1], np.int64),
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _write_fixture2(tmp_path):
    """Second micro-fixture, shared by q11/q12/q20: one lineitem set
    engineered so each query hits a strict-threshold boundary."""
    d = tmp_path / "sf2"
    d.mkdir()
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["R0", "R1"], pa.string()),
    }), d / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["ALPHA", "BRAVO", "CHARLIE"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    }), d / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3", "s4"], pa.string()),
        "s_nationkey": pa.array([0, 0, 1, 2], pa.int32()),
        "s_acctbal": pa.array([0.0] * 4),
    }), d / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_name": pa.array(["red a", "red b", "blue c", "red d"], pa.string()),
        "p_brand": pa.array(["B"] * 4, pa.string()),
        "p_type": pa.array(["STANDARD"] * 4, pa.string()),
        "p_size": pa.array([1, 2, 3, 4], pa.int32()),
        "p_retailprice": pa.array([1.0] * 4),
    }), d / "part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderstatus": pa.array(["F", "F"], pa.string()),
        "o_totalprice": pa.array([1.0, 1.0]),
        "o_orderdate": pa.array([ts("2005-01-01"), ts("2005-01-01")]),
        "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM"], pa.string()),
    }), d / "orders.parquet")
    # (ok, pk, sk, qty, price, ship) — disc 0 everywhere; ALPHA-supplier
    # part values: p1 = 10+25+15 = 50, p2 = 30 (EXACT 0.3 of total 100,
    # strict > must drop), p3 = 20; s3/s4 lines are q11-invisible
    rows = [
        (1, 1, 1, 30.0, 10.0, "2005-02-15"),  # q12 LATE/high, q20 p1/s1
        (1, 1, 1, 30.0, 25.0, "2005-01-10"),  # ONTIME/high, p1/s1 sums to 60
        (1, 1, 2, 40.0, 15.0, "2005-01-11"),  # ONTIME/high, p1/s2 = 40
        (2, 2, 2, 10.0, 30.0, "2005-01-31"),  # EXACT +30d LATE/low, p2/s2
        (2, 2, 3, 10.0, 99.0, "2005-01-05"),  # ONTIME/low, p2/s3 (half tie)
        (2, 3, 1, 5.0, 20.0, "2005-01-06"),   # ONTIME/low, p3 not 'red'
        (1, 4, 4, 10.0, 7.0, "2005-01-09"),   # ONTIME/high, p4 sole but R1
        (1, 1, 2, 1000.0, 0.0, "2006-06-01"),  # outside q12/q20 window
    ]
    ok, pk, sk, qty, price, ship = zip(*rows)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_linenumber": pa.array(list(range(1, len(rows) + 1)), pa.int32()),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["F"] * len(rows), pa.string()),
        "l_shipdate": pa.array([np.datetime64(s, "us") for s in ship]),
    }), d / "lineitem.parquet")
    return str(d)


def test_tpch_q11_strict_fraction_boundary(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q11

    got = tpch_q11(_write_fixture2(tmp_path), nation="ALPHA",
                   frac_num=3, frac_den=10)
    # ALPHA total = 100: p1=50 in, p2=30 sits EXACTLY at 3/10 (strict >
    # drops it), p3=20 out; s3/s4 lines never count
    exp = pd.DataFrame({
        "p_partkey": np.array([1], np.int64),
        "value": [50.0],
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tpch_q12_lateness_priority_counts(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q12

    got = tpch_q12(_write_fixture2(tmp_path),
                   date_lo="2005-01-01", date_hi="2006-01-01")
    # LATE: one urgent (+45d) and one medium at EXACTLY +30d (>= is
    # late); ONTIME: three high, two low; the 2006 line is windowed out
    exp = pd.DataFrame({
        "ship_class": ["LATE", "ONTIME"],
        "high_line_count": np.array([1, 3], np.int64),
        "low_line_count": np.array([1, 2], np.int64),
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_tpch_q20_dominance_and_region_gate(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.tpch import tpch_q20

    got = tpch_q20(_write_fixture2(tmp_path), name_token="red", region="R0",
                   date_lo="2005-01-01", date_hi="2006-01-01")
    # p1: s1=60 of 100 dominates, s2=40 doesn't; p2: 10/10 EXACT half
    # tie -> neither (strict); p4's sole supplier s4 dominates but sits
    # in region R1; the out-of-window 1000-qty line must not flip p1
    exp = pd.DataFrame({"s_name": ["s1"]})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
