"""asof_join vs DuckDB ASOF JOIN / pd.merge_asof ground truth:
backward/forward/nearest, left/inner, tolerance, tie_break
determinism, null keys, composite by, broadcast-plan equality,
partition invariance, timestamp keys."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines.asof import asof_join


def _mk(df: pd.DataFrame, blocks: int = 3):
    return ray.data.from_pandas(df).repartition(blocks)


def _norm(df: pd.DataFrame, sort_cols):
    df = df.copy()
    out = df.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    return out[sorted(df.columns)]


def _assert_eq(got: pd.DataFrame, want: pd.DataFrame, sort_cols):
    got = _norm(got, sort_cols)
    want = _norm(want, sort_cols)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(w) or pd.api.types.is_float_dtype(g):
            g = g.astype("float64")
            w = w.astype("float64")
            assert np.allclose(g.fillna(-1e300), w.fillna(-1e300)), c
        else:
            assert (g.astype("object").where(g.notna(), None).tolist()
                    == w.astype("object").where(w.notna(), None).tolist()), c


@pytest.fixture(scope="module")
def sides():
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 150
    left = pd.DataFrame(
        {
            "u": rng.integers(0, 12, size=n_l).astype("int64"),
            "ts": rng.integers(0, 1000, size=n_l).astype("int64"),
            "lv": rng.integers(0, 10**6, size=n_l).astype("int64"),
        }
    )
    # unique (u, ts) on the right: SQL ASOF tie winner is unspecified
    right = (
        pd.DataFrame(
            {
                "u": rng.integers(0, 14, size=n_r).astype("int64"),
                "ts": rng.integers(0, 1000, size=n_r).astype("int64"),
                "price": rng.integers(0, 500, size=n_r).astype("int64"),
            }
        )
        .drop_duplicates(["u", "ts"])
        .reset_index(drop=True)
    )
    return left, right


def _duck_asof(left, right, op=">=", join="LEFT"):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    return con.execute(
        f"SELECT l.u, l.ts, l.lv, r.ts AS ts_r, r.price "
        f"FROM l ASOF {join} JOIN r ON l.u = r.u AND l.ts {op} r.ts"
    ).df()


def test_backward_left_vs_duckdb(sides):
    left, right = sides
    got = asof_join(_mk(left), _mk(right), "ts", by="u", num_partitions=8).to_pandas()
    want = _duck_asof(left, right)
    _assert_eq(got, want, ["u", "ts", "lv"])


def test_inner_vs_duckdb(sides):
    left, right = sides
    got = asof_join(_mk(left), _mk(right), "ts", by="u", how="inner").to_pandas()
    want = _duck_asof(left, right, join="INNER")
    _assert_eq(got, want, ["u", "ts", "lv"])


def test_strict_inequality_via_exact_matches(sides):
    left, right = sides
    got = asof_join(
        _mk(left), _mk(right), "ts", by="u", allow_exact_matches=False
    ).to_pandas()
    want = _duck_asof(left, right, op=">")
    _assert_eq(got, want, ["u", "ts", "lv"])


@pytest.mark.parametrize("direction", ["forward", "nearest"])
def test_directions_vs_merge_asof(sides, direction):
    left, right = sides
    got = asof_join(_mk(left), _mk(right), "ts", by="u", direction=direction).to_pandas()
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        by="u",
        direction=direction,
    )
    _assert_eq(got, want, ["u", "ts", "lv"])


def test_tolerance(sides):
    left, right = sides
    got = asof_join(_mk(left), _mk(right), "ts", by="u", tolerance=25).to_pandas()
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("ts", kind="mergesort").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
        by="u",
        tolerance=25,
    )
    _assert_eq(got, want, ["u", "ts", "lv"])


def test_tie_break_max_wins_and_nulls_lose():
    left = pd.DataFrame({"u": [1, 1], "ts": [10, 3]}).astype("int64")
    right = pd.DataFrame(
        {
            "u": pd.array([1, 1, 1, 1], dtype="int64"),
            "ts": pd.array([5, 5, 5, 2], dtype="int64"),
            "pri": pd.array([2, None, 9, 1], dtype="Int64"),
            "tag": ["a", "b", "c", "d"],
        }
    )
    got = (
        asof_join(_mk(left, 2), _mk(right, 2), "ts", by="u", tie_break="pri")
        .to_pandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got.loc[0, "tag"] == "d"  # ts=3 matches the ts=2 row
    assert got.loc[1, "tag"] == "c"  # max pri wins; null pri loses
    assert got.loc[1, "pri"] == 9


def test_null_keys_never_match_left_kept():
    left = pd.DataFrame(
        {
            "u": pd.array([1, None, 2], dtype="Int64"),
            "ts": pd.array([10, 10, None], dtype="Int64"),
            "lv": pd.array([1, 2, 3], dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "u": pd.array([1, None, 2], dtype="Int64"),
            "ts": pd.array([5, 1, None], dtype="Int64"),
            "price": pd.array([100, 200, 300], dtype="int64"),
        }
    )
    got = asof_join(_mk(left, 2), _mk(right, 2), "ts", by="u").to_pandas()
    got = got.sort_values("lv").reset_index(drop=True)
    assert len(got) == 3
    assert got.loc[0, "price"] == 100
    assert pd.isna(got.loc[1, "price"]) and pd.isna(got.loc[2, "price"])
    inner = asof_join(_mk(left, 2), _mk(right, 2), "ts", by="u", how="inner").to_pandas()
    assert len(inner) == 1 and inner.iloc[0]["price"] == 100


def test_composite_by_and_right_on_names():
    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "a": rng.integers(0, 3, 120).astype("int64"),
            "b": rng.choice(["x", "y"], 120),
            "t": rng.integers(0, 200, 120).astype("int64"),
        }
    )
    right = (
        pd.DataFrame(
            {
                "a2": rng.integers(0, 3, 60).astype("int64"),
                "b2": rng.choice(["x", "y"], 60),
                "rt": rng.integers(0, 200, 60).astype("int64"),
                "v": rng.integers(0, 99, 60).astype("int64"),
            }
        )
        .drop_duplicates(["a2", "b2", "rt"])
        .reset_index(drop=True)
    )
    got = asof_join(
        _mk(left), _mk(right), "t",
        by=["a", "b"], right_on="rt", right_by=["a2", "b2"], num_partitions=5,
    ).to_pandas()
    want = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("rt", kind="mergesort").rename(
            columns={"a2": "a", "b2": "b"}
        ),
        left_on="t",
        right_on="rt",
        by=["a", "b"],
    )
    _assert_eq(got, want, ["a", "b", "t"])


def test_broadcast_plan_equals_shuffle(sides):
    left, right = sides
    shuf = asof_join(_mk(left), _mk(right), "ts", by="u").to_pandas()
    bcast = asof_join(_mk(left), _mk(right), "ts", by="u", broadcast=True).to_pandas()
    _assert_eq(bcast, shuf, ["u", "ts", "lv"])


def test_keyless_requires_broadcast(sides):
    left, right = sides
    with pytest.raises(ValueError, match="broadcast"):
        asof_join(_mk(left), _mk(right), "ts")


def test_keyless_broadcast_vs_merge_asof(sides):
    left, right = sides
    r1 = right.drop_duplicates("ts").drop(columns=["u"]).reset_index(drop=True)
    got = asof_join(_mk(left), _mk(r1), "ts", broadcast=True).to_pandas()
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        r1.sort_values("ts", kind="mergesort").rename(columns={"ts": "ts_r"}),
        left_on="ts",
        right_on="ts_r",
    )
    _assert_eq(got, want, ["u", "ts", "lv"])


def test_partition_invariance(sides):
    left, right = sides
    a = asof_join(_mk(left, 2), _mk(right, 5), "ts", by="u", num_partitions=4).to_pandas()
    b = asof_join(_mk(left, 7), _mk(right, 1), "ts", by="u", num_partitions=17).to_pandas()
    _assert_eq(a, b, ["u", "ts", "lv"])


def test_timestamp_on_with_int_tolerance():
    left = pd.DataFrame(
        {
            "u": pd.array([1, 1], dtype="int64"),
            "ts": pd.to_datetime([3_000_000, 9_000_000], unit="us").astype("datetime64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "u": pd.array([1, 1], dtype="int64"),
            "ts": pd.to_datetime([1_000_000, 2_500_000], unit="us").astype("datetime64[us]"),
            "v": pd.array([10, 20], dtype="int64"),
        }
    )
    got = asof_join(
        _mk(left, 1), _mk(right, 1), "ts", by="u", tolerance=1_000_000
    ).to_pandas().sort_values("ts").reset_index(drop=True)
    assert got.loc[0, "v"] == 20  # 3s matches 2.5s within 1s
    assert pd.isna(got.loc[1, "v"])  # 9s has nothing within 1s


def test_validation():
    df = pd.DataFrame({"ts": [1], "u": [1]}).astype("int64")
    with pytest.raises(ValueError, match="how"):
        asof_join(_mk(df), _mk(df), "ts", by="u", how="right")
    with pytest.raises(ValueError, match="direction"):
        asof_join(_mk(df), _mk(df), "ts", by="u", direction="up")
    with pytest.raises(ValueError, match="no column"):
        asof_join(_mk(df), _mk(df), "nope", by="u")
    with pytest.raises(ValueError, match="tie_break"):
        asof_join(_mk(df), _mk(df), "ts", by="u", tie_break="nope")
