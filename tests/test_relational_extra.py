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
