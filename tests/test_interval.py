"""interval_join vs DuckDB inequality-join ground truth: inner/left,
closed modes, by keys, broadcast==shuffle plan equality, bucket-width
invariance, null keys, inverted intervals, replication guard,
timestamp axes."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines.interval import interval_join


def _mk(df: pd.DataFrame, blocks: int = 3):
    return ray.data.from_pandas(df).repartition(blocks)


def _norm(df: pd.DataFrame, cols):
    return df.sort_values(cols, kind="mergesort").reset_index(drop=True)[
        sorted(df.columns)
    ]


def _assert_eq(got, want, cols):
    got, want = _norm(got, cols), _norm(want, cols)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(w) or pd.api.types.is_float_dtype(g):
            assert np.allclose(
                g.astype("float64").fillna(-1e300),
                w.astype("float64").fillna(-1e300),
            ), c
        else:
            assert (
                g.astype("object").where(g.notna(), None).tolist()
                == w.astype("object").where(w.notna(), None).tolist()
            ), c


@pytest.fixture(scope="module")
def sides():
    rng = np.random.default_rng(5)
    pts = pd.DataFrame(
        {
            "pid": np.arange(300, dtype=np.int64),
            "x": rng.uniform(0, 100, 300).round(3),
        }
    )
    lo = rng.uniform(0, 95, 60).round(3)
    iv = pd.DataFrame(
        {
            "iid": np.arange(60, dtype=np.int64),
            "lo": lo,
            "hi": (lo + rng.uniform(0.5, 20, 60)).round(3),
        }
    )
    return pts, iv


def _duck(pts, iv, lo_op=">=", hi_op="<", join="JOIN"):
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", iv)
    return con.execute(
        f"SELECT p.pid, p.x, i.iid, i.lo, i.hi FROM p {join} i "
        f"ON p.x {lo_op} i.lo AND p.x {hi_op} i.hi"
    ).df()


def test_inner_vs_duckdb(sides):
    pts, iv = sides
    got = interval_join(
        _mk(pts), _mk(iv), "x", "lo", "hi", broadcast=False, num_partitions=8
    ).to_pandas()
    _assert_eq(got, _duck(pts, iv), ["pid", "iid"])


def test_left_keeps_unmatched(sides):
    pts, iv = sides
    got = interval_join(
        _mk(pts), _mk(iv), "x", "lo", "hi", how="left", broadcast=False
    ).to_pandas()
    want = _duck(pts, iv, join="LEFT JOIN")
    _assert_eq(got, want, ["pid", "iid"])


@pytest.mark.parametrize(
    "closed,lo_op,hi_op",
    [("left", ">=", "<"), ("right", ">", "<="), ("both", ">=", "<="), ("neither", ">", "<")],
)
def test_closed_modes(sides, closed, lo_op, hi_op):
    pts, iv = sides
    # plant exact boundary hits so the mode actually discriminates
    pts = pd.concat(
        [pts, pd.DataFrame({"pid": [9001, 9002], "x": [iv["lo"][0], iv["hi"][0]]})],
        ignore_index=True,
    )
    got = interval_join(
        _mk(pts), _mk(iv), "x", "lo", "hi", closed=closed, broadcast=False
    ).to_pandas()
    _assert_eq(got, _duck(pts, iv, lo_op, hi_op), ["pid", "iid"])


def test_broadcast_equals_shuffle(sides):
    pts, iv = sides
    a = interval_join(_mk(pts), _mk(iv), "x", "lo", "hi", broadcast=True).to_pandas()
    b = interval_join(_mk(pts), _mk(iv), "x", "lo", "hi", broadcast=False).to_pandas()
    _assert_eq(a, b, ["pid", "iid"])


def test_bucket_width_invariance(sides):
    pts, iv = sides
    a = interval_join(
        _mk(pts), _mk(iv), "x", "lo", "hi", bucket_width=2.0, broadcast=False
    ).to_pandas()
    b = interval_join(
        _mk(pts), _mk(iv), "x", "lo", "hi", bucket_width=37.0, broadcast=False,
        num_partitions=5,
    ).to_pandas()
    _assert_eq(a, b, ["pid", "iid"])


def test_by_key(sides):
    rng = np.random.default_rng(9)
    pts, iv = sides
    pts = pts.assign(g=rng.integers(0, 3, len(pts)).astype("int64"))
    iv = iv.assign(g2=rng.integers(0, 3, len(iv)).astype("int64"))
    got = interval_join(
        _mk(pts), _mk(iv), "x", "lo", "hi", by="g", right_by="g2", broadcast=False
    ).to_pandas()
    con = duckdb.connect()
    con.register("p", pts)
    con.register("i", iv)
    want = con.execute(
        "SELECT p.pid, p.x, p.g, i.iid, i.lo, i.hi FROM p JOIN i "
        "ON p.g = i.g2 AND p.x >= i.lo AND p.x < i.hi"
    ).df()
    _assert_eq(got, want, ["pid", "iid"])


def test_nulls_never_match_inverted_never_match():
    pts = pd.DataFrame(
        {"pid": pd.array([1, 2], dtype="int64"), "x": pd.array([5.0, None], dtype="Float64")}
    )
    iv = pd.DataFrame(
        {
            "iid": pd.array([1, 2, 3], dtype="int64"),
            "lo": pd.array([0.0, None, 9.0], dtype="Float64"),
            "hi": pd.array([10.0, 10.0, 1.0], dtype="Float64"),  # iid=3 inverted
        }
    )
    inner = interval_join(
        _mk(pts, 1), _mk(iv, 1), "x", "lo", "hi", broadcast=False
    ).to_pandas()
    assert inner["iid"].tolist() == [1] and inner["pid"].tolist() == [1]
    left = interval_join(
        _mk(pts, 1), _mk(iv, 1), "x", "lo", "hi", how="left", broadcast=False
    ).to_pandas().sort_values("pid")
    assert len(left) == 2 and pd.isna(left.iloc[1]["iid"])


def test_replication_guard():
    pts = pd.DataFrame({"pid": [1], "x": [5.0]})
    iv = pd.DataFrame({"iid": [1], "lo": [0.0], "hi": [1e9]})
    with pytest.raises(Exception, match="max_replication"):
        # the guard fires inside the pack task; Ray re-raises wrapped
        interval_join(
            _mk(pts, 1), _mk(iv, 1), "x", "lo", "hi",
            bucket_width=1.0, broadcast=False,
        ).to_pandas()


def test_timestamp_axis():
    base = 1_600_000_000_000_000  # us epoch
    pts = pd.DataFrame(
        {
            "pid": pd.array([1, 2], dtype="int64"),
            "ts": pd.to_datetime([base + 5_000_000, base + 50_000_000], unit="us").astype(
                "datetime64[us]"
            ),
        }
    )
    iv = pd.DataFrame(
        {
            "iid": pd.array([7], dtype="int64"),
            "t0": pd.to_datetime([base], unit="us").astype("datetime64[us]"),
            "t1": pd.to_datetime([base + 10_000_000], unit="us").astype("datetime64[us]"),
        }
    )
    got = interval_join(
        _mk(pts, 1), _mk(iv, 1), "ts", "t0", "t1", broadcast=False
    ).to_pandas()
    assert got["pid"].tolist() == [1] and got["iid"].tolist() == [7]


def test_validation(sides):
    pts, iv = sides
    with pytest.raises(ValueError, match="closed"):
        interval_join(_mk(pts), _mk(iv), "x", "lo", "hi", closed="open")
    with pytest.raises(ValueError, match="how"):
        interval_join(_mk(pts), _mk(iv), "x", "lo", "hi", how="full")
    with pytest.raises(ValueError, match="no column"):
        interval_join(_mk(pts), _mk(iv), "nope", "lo", "hi")
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(_mk(pts), _mk(iv), "x", "lo", "hi", bucket_width=0.0)


# ---- interval_concurrency (sweep-line peak overlap) ----

def _conc(df, by, P=8, blocks=3):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.interval import interval_concurrency

    ds = ray.data.from_pandas(df).repartition(blocks)
    out = interval_concurrency(ds, by=by, start_col="s", end_col="e", num_partitions=P)
    cols = ([by] if isinstance(by, str) else list(by)) + ["peak"]
    return out.to_pandas().sort_values(cols[:-1]).reset_index(drop=True)[cols]


def test_concurrency_planted_half_open(ray_session):
    # g: [0,10) [5,15) [10,20) -> peak 2 (the end-at-10 does NOT
    # overlap the start-at-10); h: three copies of [0,5) -> peak 3
    df = pd.DataFrame(
        {"g": ["g", "g", "g", "h", "h", "h"],
         "s": [0, 5, 10, 0, 0, 0],
         "e": [10, 15, 20, 5, 5, 5]}
    )
    out = _conc(df, "g")
    assert out.values.tolist() == [["g", 2], ["h", 3]]


def test_concurrency_null_and_inverted_dropped(ray_session):
    df = pd.DataFrame(
        {"g": ["a", "a", "a", "b"],
         "s": pd.array([0, None, 7, 5], dtype="Int64"),
         "e": pd.array([4, 9, 3, 5], dtype="Int64")}  # null, inverted, empty
    )
    out = _conc(df, "g")
    # only a's [0,4) survives; b's empty [5,5) drops -> b absent
    assert out.values.tolist() == [["a", 1]]


def test_concurrency_matches_duckdb_random(ray_session):
    import duckdb

    rng = np.random.default_rng(9)
    n = 3000
    df = pd.DataFrame(
        {"k": rng.integers(0, 7, n).astype("int64"),
         "s": rng.integers(0, 500, n).astype("int64")}
    )
    df["e"] = df.s + rng.integers(1, 60, n).astype("int64")
    want = duckdb.connect().execute(
        """
WITH d AS (SELECT k, s AS t, 1 AS delta FROM df
           UNION ALL SELECT k, e, -1 FROM df),
c AS (SELECT k, SUM(delta) OVER (PARTITION BY k ORDER BY t, delta
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM d)
SELECT k, CAST(MAX(run) AS BIGINT) AS peak FROM c GROUP BY k ORDER BY k
"""
    ).df()
    for P, blocks in ((4, 1), (16, 5)):
        got = _conc(df, "k", P=P, blocks=blocks)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_concurrency_composite_key_and_timestamps(ray_session):
    df = pd.DataFrame(
        {"t1": ["x", "x", "y"], "t2": [1, 1, 2],
         "s": pd.to_datetime(["2024-01-01 00:00:00", "2024-01-01 00:00:30",
                              "2024-01-01 01:00:00"]),
         "e": pd.to_datetime(["2024-01-01 00:01:00", "2024-01-01 00:00:45",
                              "2024-01-01 01:05:00"])}
    )
    out = _conc(df, ["t1", "t2"])
    assert out.values.tolist() == [["x", 1, 2], ["y", 2, 1]]
