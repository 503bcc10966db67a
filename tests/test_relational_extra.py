"""TPC-H q3/q6, cohort retention, triangle count, source similarity:
planted known-value cases (the SQL-oracle parity runs in
test_queries_oracle.py / oracle_compare)."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_triangle_count_known_graph(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.graph import triangle_count

    # K4 minus one edge = 2 triangles; plus an isolated edge
    edges = [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("c", "d"),
        ("x", "y"),
        ("b", "a"),  # duplicate in reverse orientation -> deduped
        ("a", "a"),  # self loop -> dropped
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {"a": pa.array([e[0] for e in edges], pa.string()),
             "b": pa.array([e[1] for e in edges], pa.string())}
        )
    )
    df = triangle_count(ds)
    assert df.loc[0, "n_nodes"] == 6
    assert df.loc[0, "n_edges"] == 6
    assert df.loc[0, "n_triangles"] == 2


def test_triangle_count_complete_graph(ray_session):
    import itertools

    import ray.data

    from bloomfilter_multithread_ray.pipelines.graph import triangle_count

    nodes = [f"n{i:02d}" for i in range(8)]
    pairs = list(itertools.combinations(nodes, 2))
    ds = ray.data.from_arrow(
        pa.table(
            {"a": pa.array([p[0] for p in pairs], pa.string()),
             "b": pa.array([p[1] for p in pairs], pa.string())}
        )
    )
    df = triangle_count(ds)
    assert df.loc[0, "n_triangles"] == 8 * 7 * 6 // 6  # C(8,3) = 56


def test_source_similarity_known_values(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.text_stats import source_similarity

    docs = ray.data.from_arrow(
        pa.table(
            {
                "text": pa.array(
                    ["a b c", "b c d", "x y", "a b c d x"], pa.string()
                ),
                "source": pa.array(["s1", "s2", "s3", "s1"], pa.string()),
            }
        )
    )
    df = source_similarity(docs).set_index(["source_a", "source_b"])
    # s1 vocab {a,b,c,d,x}, s2 {b,c,d}, s3 {x,y}
    assert df.loc[("s1", "s2"), "intersection"] == 3
    assert df.loc[("s1", "s2"), "jaccard"] == round(3 / 5, 6)
    assert df.loc[("s1", "s3"), "intersection"] == 1
    assert df.loc[("s1", "s3"), "jaccard"] == round(1 / 6, 6)
    # s2 and s3 share nothing -> row absent
    assert ("s2", "s3") not in df.index


def test_tpch_q6_matches_duckdb(ray_session, testdata_dir):
    import duckdb

    from bloomfilter_multithread_ray.pipelines.relational import tpch_q6

    got = tpch_q6(testdata_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{testdata_dir}/lineitem.parquet')"
    )
    want = con.execute(
        "SELECT ROUND(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "CAST(ROUND(l_discount*100) AS BIGINT)) / 10000.0, 2) AS revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND CAST(ROUND(l_discount*100) AS BIGINT) BETWEEN 5 AND 7 "
        "AND l_quantity < 24"
    ).df()
    assert got.loc[0, "revenue"] == want.loc[0, "revenue"]


def test_tpch_q3_top10_shape(ray_session, testdata_dir):
    from bloomfilter_multithread_ray.pipelines.relational import tpch_q3

    got = tpch_q3(testdata_dir)
    assert list(got.columns) == [
        "l_orderkey", "revenue", "o_orderdate", "o_orderpriority"
    ]
    assert 0 < len(got) <= 10
    # sorted by revenue desc (rev ties broken by orderkey)
    assert (got["revenue"].to_numpy()[:-1] >= got["revenue"].to_numpy()[1:]).all()


def test_events_retention_planted(ray_session, tmp_path):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.relational import events_retention

    # user 1: days 0,1,3; user 2: days 0,0 (dup), 9 (beyond cap)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D").astype("timedelta64[us]")
    ts = [base, base + day, base + 3 * day, base, base + np.timedelta64(5, "h").astype("timedelta64[us]"), base + 9 * day]
    users = [1, 1, 1, 2, 2, 2]
    t = pa.table({"user_id": pa.array(users, pa.int64()), "ts": pa.array(ts, pa.timestamp("us"))})
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = events_retention(str(d), max_offset=7).set_index(["cohort_day", "day_offset"])
    assert got.loc[("2024-01-01", 0), "n_users"] == 2
    assert got.loc[("2024-01-01", 1), "n_users"] == 1
    assert got.loc[("2024-01-01", 3), "n_users"] == 1
    assert ("2024-01-01", 9) not in got.index


def _write_tpch_fixture(tmp_path):
    """Tiny planted TPC-H tables exercising q5/q14/q18/q4 boundaries."""
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    ts = lambda s: np.datetime64(s, "us")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"], pa.string()),
    }), d / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["JAPAN", "INDIA", "FRANCE"], pa.string()),
        "n_regionkey": pa.array([0, 0, 1], pa.int32()),
    }), d / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_name": pa.array(["c10", "c11", "c12"], pa.string()),
        "c_nationkey": pa.array([0, 1, 2], pa.int32()),
        "c_acctbal": pa.array([1.0, 2.0, 3.0]),
        "c_mktsegment": pa.array(["BUILDING"] * 3, pa.string()),
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 101], pa.int64()),
        "s_name": pa.array(["s100", "s101"], pa.string()),
        "s_nationkey": pa.array([0, 1], pa.int32()),
        "s_acctbal": pa.array([0.0, 0.0]),
    }), d / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([7, 8], pa.int64()),
        "p_name": pa.array(["pa", "pb"], pa.string()),
        "p_brand": pa.array(["B", "B"], pa.string()),
        "p_type": pa.array(["PROMO", "STANDARD"], pa.string()),
        "p_size": pa.array([1, 1], pa.int32()),
        "p_retailprice": pa.array([1.0, 1.0]),
    }), d / "part.parquet")
    # orders: o1 (cust 10, in window), o2 (cust 11, in window),
    # o3 (cust 12, OUT of window)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 11, 12], pa.int64()),
        "o_orderstatus": pa.array(["F"] * 3, pa.string()),
        "o_totalprice": pa.array([50.0, 40.0, 30.0]),
        "o_orderdate": pa.array([ts("1996-02-01"), ts("1996-03-01"), ts("1999-01-01")]),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "1-URGENT"], pa.string()),
    }), d / "orders.parquet")
    # lineitem rows:
    #  o1/s100 (nation match 0==0, counts in q5), ships 61 days late (q4 in)
    #  o1/s101 (nation mismatch 0!=1, excluded from q5), ships on time
    #  o2/s101 (nation match 1==1, counts), ships 59 days late (q4 boundary out)
    #  o3/s100 (order outside window)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_partkey": pa.array([7, 8, 7, 8], pa.int64()),
        "l_suppkey": pa.array([100, 101, 101, 100], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
        "l_quantity": pa.array([200.0, 150.0, 301.0, 5.0]),
        "l_extendedprice": pa.array([100.0, 10.0, 20.0, 7.0]),
        "l_discount": pa.array([0.10, 0.0, 0.05, 0.0]),
        "l_tax": pa.array([0.0] * 4),
        "l_returnflag": pa.array(["R", "N", "R", "R"], pa.string()),
        "l_linestatus": pa.array(["F"] * 4, pa.string()),
        "l_shipdate": pa.array([ts("1996-04-02"), ts("1996-02-10"),
                                ts("1996-04-29"), ts("1999-02-01")]),
    }), d / "lineitem.parquet")
    return str(d)


def test_tpch_q5_local_supplier_condition(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.relational import tpch_q5

    sf = _write_tpch_fixture(tmp_path)
    got = tpch_q5(sf, region="ASIA", date_lo="1996-01-01", date_hi="1997-01-01")
    got = got.set_index("n_name")
    # JAPAN: o1/s100 only (the s101 row fails c_nationkey==s_nationkey):
    # 100.00 * (1-0.10) = 90.0; INDIA: o2/s101 20.00*(1-0.05) = 19.0
    assert got.loc["JAPAN", "revenue"] == 90.0
    assert got.loc["INDIA", "revenue"] == 19.0
    assert len(got) == 2  # FRANCE (EUROPE region) absent


def test_tpch_q14_promo_share(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.relational import tpch_q14

    sf = _write_tpch_fixture(tmp_path)
    got = tpch_q14(sf, date_lo="1996-01-01", date_hi="1997-01-01")
    # in-window revenue: part 7 (PROMO): 90 + 19 = 109; part 8: 10
    assert got.loc[0, "promo_pct"] == round(100.0 * 109.0 / 119.0, 6)


def test_tpch_q18_having_boundary(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.relational import tpch_q18

    sf = _write_tpch_fixture(tmp_path)
    # per-order qty: o1 = 350, o2 = 301, o3 = 5
    got = tpch_q18(sf, qty_threshold=300.0)
    assert set(got["o_orderkey"]) == {1, 2}
    assert got.set_index("o_orderkey").loc[2, "sum_qty"] == 301.0
    # strict >: an exact-300 order would be excluded
    got_hi = tpch_q18(sf, qty_threshold=301.0)
    assert set(got_hi["o_orderkey"]) == {1}


def test_tpch_q4_late_boundary(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.relational import tpch_q4_late

    sf = _write_tpch_fixture(tmp_path)
    # o1 has a 61-days-late line (>= 60: in); o2's line is 59 days
    # late (out); o3 outside the order window
    got = tpch_q4_late(sf, date_lo="1996-01-01", date_hi="1997-01-01", late_days=60)
    assert got.to_dict("records") == [
        {"o_orderpriority": "1-URGENT", "order_count": 1}
    ]


def test_tpch_q10_returned_revenue(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.relational import tpch_q10

    sf = _write_tpch_fixture(tmp_path)
    got = tpch_q10(sf, date_lo="1996-01-01", date_hi="1997-01-01")
    got = got.set_index("c_custkey")
    # returned (flag R) in-window: c10 gets o1's R line (90.0),
    # c11 gets o2's R line (19.0); o3 outside window
    assert got.loc[10, "revenue"] == 90.0
    assert got.loc[10, "n_name"] == "JAPAN"
    assert got.loc[11, "revenue"] == 19.0
    assert list(got.index) == [10, 11]  # sorted by revenue desc
