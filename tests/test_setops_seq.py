"""group_concat / topn_by_key / set_op unit tests (DuckDB cross-checks,
partition invariance, null semantics, validation)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bloomfilter_multithread_ray.pipelines.analytics import group_concat, topn_by_key
from bloomfilter_multithread_ray.pipelines.setops import (
    except_distinct,
    intersect_distinct,
    set_op,
)


def _rand_events(n=400, seed=7):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n),
            "o": rng.permutation(n),  # unique order key -> deterministic
            "v": [f"e{t}" for t in rng.integers(0, 5, n)],
        }
    )
    # plant nulls in both key and value
    df.loc[df.index % 17 == 0, "v"] = None
    df["k"] = df["k"].astype("float64")
    df.loc[df.index % 23 == 0, "k"] = np.nan
    return df


# ------------------------------------------------------------- group_concat
def test_group_concat_duckdb_cross(ray_session):
    import ray

    df = _rand_events()
    for parts in (1, 5):
        got = (
            group_concat(
                ray.data.from_pandas(df).repartition(parts),
                "k", "v", "o", sep="|", out_name="s", count_name="n",
                num_partitions=8,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k, string_agg(v, '|' ORDER BY o) AS s, count(v) AS n "
            "FROM t GROUP BY k ORDER BY k"
        ).df()
        pd.testing.assert_frame_equal(got, want)


def test_group_concat_desc_and_multikey(ray_session):
    import ray

    df = pd.DataFrame(
        {
            "a": [1, 1, 1, 2, 2],
            "b": ["x", "x", "y", "x", "x"],
            "o": [1, 2, 3, 1, 2],
            "v": ["p", "q", "r", "s", "t"],
        }
    )
    got = (
        group_concat(
            ray.data.from_pandas(df).repartition(2),
            ["a", "b"], "v", [("o", "desc")], sep=",", out_name="s",
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"a": [1, 1, 2], "b": ["x", "y", "x"], "s": ["q,p", "r", "t,s"]}
    )
    pd.testing.assert_frame_equal(got, want)


def test_group_concat_all_null_group_and_cast(ray_session):
    import ray

    df = pd.DataFrame(
        {"k": [1, 1, 2], "o": [1, 2, 1], "v": pd.array([10, None, None], dtype="Int64")}
    )
    got = (
        group_concat(ray.data.from_pandas(df), "k", "v", "o", out_name="s")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got.loc[0, "s"] == "10"  # int cast to its Arrow string form
    assert got.loc[1, "s"] is None or pd.isna(got.loc[1, "s"])  # SQL NULL


def test_group_concat_validation(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1], "v": ["a"], "o": [1]}))
    with pytest.raises(ValueError, match="by columns"):
        group_concat(ds, "k", "k", "o")
    with pytest.raises(ValueError, match="collide"):
        group_concat(ds, "k", "v", "o", out_name="k")


# -------------------------------------------------------------- topn_by_key
@pytest.mark.parametrize("descending", [True, False])
def test_topn_by_key_duckdb_cross(ray_session, descending):
    import ray

    df = _rand_events().dropna(subset=["k"]).reset_index(drop=True)
    df["k"] = df["k"].astype(np.int64)
    direction = "DESC" if descending else "ASC"
    for parts in (1, 6):
        got = (
            topn_by_key(
                ray.data.from_pandas(df).repartition(parts),
                "k", "o", 3, descending=descending, num_partitions=8,
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("t", df)
        want = (
            con.execute(
                f"SELECT k, o, v FROM t QUALIFY row_number() OVER "
                f"(PARTITION BY k ORDER BY o {direction}) <= 3 ORDER BY k, o"
            )
            .df()
        )
        pd.testing.assert_frame_equal(got[["k", "o", "v"]], want)


def test_topn_by_key_null_order_and_small_groups(ray_session):
    import ray

    df = pd.DataFrame(
        {"k": [1, 1, 1, 2], "o": [5.0, np.nan, 1.0, np.nan], "p": list("abcd")}
    )
    got = (
        topn_by_key(ray.data.from_pandas(df).repartition(2), "k", "o", 2)
        .to_pandas()
        .sort_values(["k", "p"])
        .reset_index(drop=True)
    )
    # k=1: nulls lose -> o=5,1 survive; k=2: group smaller than n keeps its null row
    assert list(got["p"]) == ["a", "c", "d"]
    with pytest.raises(ValueError, match="n must be"):
        topn_by_key(ray.data.from_pandas(df), "k", "o", 0)


def test_topn_equals_latest_at_n1(ray_session):
    import ray

    from bloomfilter_multithread_ray.pipelines.analytics import latest_by_key

    df = _rand_events().dropna(subset=["k"]).reset_index(drop=True)
    ds = ray.data.from_pandas(df).repartition(4)
    a = (
        topn_by_key(ds, "k", "o", 1)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    b = (
        latest_by_key(ds, "k", "o")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------------------ set ops
def test_set_ops_duckdb_cross(ray_session):
    import ray

    rng = np.random.default_rng(3)
    l = pd.DataFrame(
        {"a": rng.integers(0, 20, 300).astype("float64"),
         "b": [f"s{j}" for j in rng.integers(0, 4, 300)]}
    )
    r = pd.DataFrame(
        {"a": rng.integers(10, 30, 300).astype("float64"),
         "b": [f"s{j}" for j in rng.integers(0, 4, 300)]}
    )
    # plant nulls on both sides (SQL set ops treat nulls as EQUAL)
    l.loc[:5, "a"] = np.nan
    r.loc[:2, "a"] = np.nan
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    for op, sql_op in [("intersect", "INTERSECT"), ("except", "EXCEPT")]:
        for parts in (1, 4):
            got = (
                set_op(
                    ray.data.from_pandas(l).repartition(parts),
                    ray.data.from_pandas(r).repartition(parts),
                    op, num_partitions=8,
                )
                .to_pandas()
                .sort_values(["a", "b"])
                .reset_index(drop=True)
            )
            want = (
                con.execute(
                    f"SELECT a, b FROM (SELECT a, b FROM l {sql_op} "
                    f"SELECT a, b FROM r) ORDER BY a, b"
                )
                .df()
            )
            pd.testing.assert_frame_equal(got, want), (op, parts)


def test_set_ops_column_subset_and_validation(ray_session):
    import ray

    l = ray.data.from_pandas(pd.DataFrame({"a": [1, 2, 2], "junk": [0, 0, 0]}))
    r = ray.data.from_pandas(pd.DataFrame({"a": [2], "extra": ["x"]}))
    got = intersect_distinct(l, r, columns=["a"]).to_pandas()
    assert list(got["a"]) == [2]
    got = except_distinct(l, r, columns=["a"]).to_pandas()
    assert sorted(got["a"]) == [1]
    with pytest.raises(ValueError, match="lacks columns"):
        set_op(l, r, "except")  # default columns include 'junk'
    with pytest.raises(ValueError, match="op must be"):
        set_op(l, r, "union", columns=["a"])


def test_set_ops_null_components_compare_equal_at_scale(ray_session):
    """Regression: pyarrow's multi-key grouper fragments null-key
    tuples, which could split a tuple's sides across fragments and
    flip an EXCEPT/INTERSECT decision. 600 rows with null components
    on both sides must behave exactly like DuckDB (nulls equal)."""
    import duckdb
    import pandas as pd
    import numpy as np
    import ray.data

    from bloomfilter_multithread_ray.pipelines.setops import set_op

    rng = np.random.default_rng(6)
    mk = lambda n, seed, avals, bvals: pd.DataFrame(
        {"a": np.random.default_rng(seed).choice(avals, n),
         "b": np.random.default_rng(seed + 1).choice(bvals, n)}
    )
    # right covers a strict subset of tuples -> EXCEPT is non-empty
    L = mk(600, 1, ["u", "v", None], [1, 2, None])
    Rt = mk(600, 7, ["u", None], [1, None])
    con = duckdb.connect()
    for op, sql in (("intersect", "INTERSECT"), ("except", "EXCEPT")):
        want = con.execute(
            f"SELECT a, b FROM L {sql} SELECT a, b FROM Rt "
            "ORDER BY a NULLS LAST, b NULLS LAST"
        ).df()
        got = (
            set_op(ray.data.from_pandas(L).repartition(3),
                   ray.data.from_pandas(Rt).repartition(2), op,
                   num_partitions=8)
            .to_pandas()
            .sort_values(["a", "b"], na_position="last")
            .reset_index(drop=True)
        )
        assert len(got) == len(want), (op, len(got), len(want))
        pd.testing.assert_frame_equal(
            got.astype({"b": "float64"}), want.astype({"b": "float64"}),
            check_dtype=False,
        )
