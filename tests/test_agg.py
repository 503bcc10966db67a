"""Unit tests for pipelines/agg.py grouped_agg."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _ds(ray, table: pa.Table, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parallelism)


def test_grouped_agg_all_kinds_match_pandas(ray_session):
    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    rng = np.random.default_rng(7)
    n = 5000
    k = rng.integers(0, 400, n)
    v = rng.normal(size=n) * 10
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v)})
    out = (
        grouped_agg(
            _ds(ray_session, t, 5),
            "k",
            {
                "n": ("count", None),
                "s": ("sum", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
                "avg": ("mean", "v"),
            },
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": k, "v": v})
        .groupby("k")
        .agg(n=("v", "size"), s=("v", "sum"), mn=("v", "min"),
             mx=("v", "max"), avg=("v", "mean"))
        .reset_index()
    )
    assert len(out) == len(want)
    assert (out.k.values == want.k.values).all()
    assert (out.n.values == want.n.values).all()
    np.testing.assert_allclose(out.s.values, want.s.values)
    np.testing.assert_allclose(out.mn.values, want.mn.values)
    np.testing.assert_allclose(out.mx.values, want.mx.values)
    np.testing.assert_allclose(out.avg.values, want.avg.values)


def test_grouped_agg_composite_string_key_and_nulls(ray_session):
    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    t = pa.table(
        {
            "a": pa.array(["x", "x", None, "y", None, "x"]),
            "b": pa.array([1, 1, 2, 2, 2, None], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    out = (
        grouped_agg(
            _ds(ray_session, t, 3), ["a", "b"], {"n": ("count", None), "s": ("sum", "v")}
        )
        .to_pandas()
        .sort_values(["a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    # SQL GROUP BY: null key values form their own groups
    assert len(out) == 4
    rows = {(r.a, None if pd.isna(r.b) else int(r.b)): (r.n, r.s) for r in out.itertuples()}
    assert rows[("x", 1)] == (2, 3.0)
    assert rows[("x", None)] == (1, 6.0)
    assert rows[("y", 2)] == (1, 4.0)
    assert rows[(None, 2)] == (2, 8.0)


def test_grouped_agg_partitioning_independent(ray_session):
    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    rng = np.random.default_rng(3)
    t = pa.table(
        {"k": pa.array(rng.integers(0, 50, 2000), pa.int64()),
         "v": pa.array(rng.integers(0, 100, 2000), pa.int64())}
    )
    outs = []
    for par in (1, 4, 9):
        outs.append(
            grouped_agg(_ds(ray_session, t, par), "k", {"s": ("sum", "v")})
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_grouped_agg_rejects_unknown_kind(ray_session):
    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    t = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1.0])})
    with pytest.raises(ValueError, match="unknown kind"):
        grouped_agg(_ds(ray_session, t, 1), "k", {"x": ("median", "v")})


def test_grouped_var_std_match_numpy_and_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    rng = np.random.default_rng(8)
    df = pd.DataFrame({
        "g": rng.integers(0, 12, 4000).astype("int64"),
        "v": rng.normal(50, 7, 4000),
    })
    out = grouped_agg(
        rd.from_pandas(df).repartition(7), "g",
        {"n": ("count", None), "m": ("mean", "v"),
         "var": ("var", "v"), "sd": ("std", "v")},
        num_partitions=4,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT g, VAR_POP(v) AS var, STDDEV_POP(v) AS sd "
        "FROM df GROUP BY g ORDER BY g"
    ).df()
    assert np.allclose(out["var"], exp["var"], rtol=1e-9)
    assert np.allclose(out["sd"], exp["sd"], rtol=1e-9)
    # single-row groups: var 0
    one = pd.DataFrame({"g": [1], "v": [3.5]})
    o1 = grouped_agg(rd.from_pandas(one), "g", {"var": ("var", "v")},
                     num_partitions=2).to_pandas()
    assert float(o1["var"][0]) == 0.0
    # partition invariance
    out2 = grouped_agg(
        rd.from_pandas(df).repartition(3), "g", {"var": ("var", "v")},
        num_partitions=16,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    assert np.allclose(out["var"], out2["var"], rtol=1e-12)


def test_grouped_corr_matches_duckdb_with_nulls_and_degenerates(ray_session):
    """grouped_corr vs DuckDB corr/regr_* on planted data: pairwise
    nulls excluded, n==1 and zero-variance groups NULL like SQL,
    constant-y group slope 0."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_corr

    rng = np.random.default_rng(41)
    n = 4000
    g = rng.integers(0, 6, n)
    x = rng.normal(10, 3, n)
    y = 2.5 * x + rng.normal(0, 1, n) + g
    x = np.where(rng.random(n) < 0.05, np.nan, x)
    y = np.where(rng.random(n) < 0.05, np.nan, y)
    # group 6: single row; group 7: zero x-variance; group 8: constant y
    g = np.concatenate([g, [6], [7] * 5, [8] * 5])
    x = np.concatenate([x, [1.0], [3.0] * 5, [1, 2, 3, 4, 5]])
    y = np.concatenate([y, [2.0], [1, 2, 3, 4, 5], [7.0] * 5])

    t = pa.table({"grp": pa.array(g.astype("int64")),
                  "x": pa.array(x, from_pandas=True),  # NaN -> true null
                  "y": pa.array(y, from_pandas=True)})
    got = grouped_corr(ray.data.from_arrow(t).repartition(9), "grp", "x", "y",
                       num_partitions=5, round_dp=6)

    con = duckdb.connect()  # fresh connection: never pollute the
    con.register("tcorr", t)  # module-shared :default: view namespace
    want = con.execute("""
        SELECT grp, CAST(regr_count(y, x) AS BIGINT) AS n,
               ROUND(corr(x, y), 6) AS corr,
               ROUND(regr_slope(y, x), 6) AS slope,
               ROUND(regr_intercept(y, x), 6) AS intercept,
               ROUND(POWER(corr(x, y), 2), 6) AS r2
        FROM tcorr GROUP BY 1 ORDER BY 1
    """).df()
    con.close()
    got2 = got.reset_index(drop=True)
    assert list(got2["grp"]) == list(want["grp"])
    assert list(got2["n"]) == list(want["n"])
    for c in ("corr", "slope", "intercept", "r2"):
        a = got2[c].to_numpy(dtype=np.float64)
        b = want[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, atol=2e-6, equal_nan=True), (c, a, b)
    # partitioning invariance
    again = grouped_corr(ray.data.from_arrow(t).repartition(2), "grp", "x", "y",
                         num_partitions=11, round_dp=6)
    assert again.reset_index(drop=True).equals(got2)


# ---- null-key grouping correctness (pyarrow multi-key grouper bug) ----

def test_group_by_nullsafe_fixes_pyarrow_fragmentation():
    """pyarrow's multi-key grouper (observed through 16.1.0) fragments
    null-key groups nondeterministically; the nullsafe wrapper must
    return exactly one row per distinct tuple (nulls equal)."""
    import pyarrow as pa

    from bloomfilter_multithread_ray.pipelines.agg import _group_by_nullsafe

    rng = np.random.default_rng(0)
    vals = list(rng.choice(["x", "y", None], 500))
    b = rng.integers(0, 3, 500)
    t = pa.table({"a": pa.array(vals, pa.string()),
                  "b": pa.array(b, type=pa.int64())})
    raw = t.group_by(["a", "b"]).aggregate([([], "count_all")])
    fixed = _group_by_nullsafe(t, ["a", "b"], [([], "count_all")])
    assert fixed.num_rows == 9  # 3 a-values (incl. null) x 3 b-values
    assert raw.num_rows >= fixed.num_rows  # documents why the wrapper exists
    df = fixed.to_pandas()
    nulls = df[df.a.isna()].sort_values("b")
    # counts must be complete, not fragments
    want = pd.Series(vals).isna().sum()
    assert nulls.count_all.sum() == want
    # genuine "" must NOT merge with null (validity companion distinguishes)
    t2 = pa.table({"a": pa.array(["", None, "", None], pa.string()),
                   "b": pa.array([1, 1, 1, 1], pa.int64())})
    f2 = _group_by_nullsafe(t2, ["a", "b"], [([], "count_all")]).to_pandas()
    assert len(f2) == 2 and sorted(f2.count_all) == [2, 2]


def test_grouped_agg_null_keys_match_duckdb(ray_session):
    import duckdb

    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {"a": rng.choice(["x", "y", None], 800),
         "b": rng.choice([0, 1, 2, None], 800),
         "v": rng.integers(0, 50, 800).astype("int64")}
    )
    want = duckdb.connect().execute(
        "SELECT a, b, COUNT(*) AS n, SUM(v) AS sv FROM df "
        "GROUP BY a, b ORDER BY a NULLS LAST, b NULLS LAST"
    ).df()
    for P, blocks in ((4, 2), (16, 5)):
        got = (
            grouped_agg(
                ray.data.from_pandas(df).repartition(blocks),
                ["a", "b"],
                {"n": ("count", None), "sv": ("sum", "v")},
                num_partitions=P,
            )
            .to_pandas()
            .sort_values(["a", "b"], na_position="last")
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert list(got.n) == list(want.n.astype("int64"))
        assert list(got.sv) == list(want.sv.astype("int64"))


# ---- grouping_sets / cube / rollup ----

def test_cube_matches_duckdb_with_data_nulls(ray_session):
    import duckdb

    from bloomfilter_multithread_ray.pipelines.agg import cube

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"a": rng.choice(["x", "y", None], 500),
         "b": rng.integers(0, 3, 500).astype("int64"),
         "v": rng.integers(0, 100, 500).astype("int64")}
    )
    want = duckdb.connect().execute(
        "SELECT a, b, GROUPING(a, b) AS grouping_id, COUNT(*) AS n, SUM(v) AS sv "
        "FROM df GROUP BY CUBE (a, b) "
        "ORDER BY GROUPING(a, b), a NULLS LAST, b NULLS LAST"
    ).df()
    for P, blocks in ((4, 1), (8, 3)):
        got = (
            cube(
                ray.data.from_pandas(df).repartition(blocks),
                ["a", "b"],
                {"n": ("count", None), "sv": ("sum", "v")},
                num_partitions=P,
            )
            .to_pandas()
            .sort_values(["grouping_id", "a", "b"], na_position="last")
            .reset_index(drop=True)
        )
        g = got.astype({"b": "float64", "n": "int64", "sv": "int64",
                        "grouping_id": "int64"})[want.columns.tolist()]
        w = want.astype({"b": "float64", "n": "int64", "sv": "int64",
                         "grouping_id": "int64"})
        pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_rollup_matches_duckdb(ray_session):
    import duckdb

    from bloomfilter_multithread_ray.pipelines.agg import rollup

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {"a": rng.choice(["p", "q"], 300),
         "b": rng.integers(0, 4, 300).astype("int64"),
         "v": rng.integers(0, 9, 300).astype("int64")}
    )
    want = duckdb.connect().execute(
        "SELECT a, b, GROUPING(a, b) AS grouping_id, SUM(v) AS sv "
        "FROM df GROUP BY ROLLUP (a, b) "
        "ORDER BY GROUPING(a, b), a NULLS LAST, b NULLS LAST"
    ).df()
    got = (
        rollup(ray.data.from_pandas(df).repartition(2), ["a", "b"],
               {"sv": ("sum", "v")}, num_partitions=8)
        .to_pandas()
        .sort_values(["grouping_id", "a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    assert list(got.grouping_id) == list(want.grouping_id.astype("int64"))
    assert list(got.sv) == list(want.sv.astype("int64"))


def test_grouping_sets_validation(ray_session):
    from bloomfilter_multithread_ray.pipelines.agg import grouping_sets

    ds = ray.data.from_items([{"a": 1, "v": 2}])
    with pytest.raises(ValueError, match="at least one"):
        grouping_sets(ds, [], {"n": ("count", None)})
    with pytest.raises(ValueError, match="duplicate key"):
        grouping_sets(ds, [["a", "a"]], {"n": ("count", None)})
    with pytest.raises(ValueError, match="duplicate grouping sets"):
        grouping_sets(ds, [["a"], ["a"]], {"n": ("count", None)})


def test_group_by_nullsafe_null_typed_key_blocks():
    """An ALL-null block arrives with Arrow null-typed key columns:
    grouping must treat the column as one constant null key and emit
    a null-typed (promotable) output column."""
    import pyarrow as pa

    from bloomfilter_multithread_ray.pipelines.agg import _group_by_nullsafe

    # one null-typed key + one normal nullable key in the same batch
    t = pa.table({"a": pa.nulls(6),  # null type
                  "b": pa.array(["x", "x", None, "y", None, "x"], pa.string()),
                  "v": pa.array([1, 2, 3, 4, 5, 6], pa.int64())})
    res = _group_by_nullsafe(t, ["a", "b"], [("v", "sum")])
    df = res.to_pandas().sort_values("b", na_position="last").reset_index(drop=True)
    assert list(df.v_sum) == [9, 4, 8]  # x, y, null groups
    assert df.a.isna().all() and str(res.column("a").type) == "null"
    # all keys null-typed: one global group via the dummy-key path
    t2 = pa.table({"a": pa.nulls(3), "b": pa.nulls(3),
                   "v": pa.array([1, 2, 3], pa.int64())})
    r2 = _group_by_nullsafe(t2, ["a", "b"], [("v", "sum")])
    assert r2.num_rows == 1 and r2.column("v_sum")[0].as_py() == 6


def test_grouping_sets_agg_over_grouping_key(ray_session):
    """An agg INPUT that is also a grouping key must aggregate the REAL
    values at every level — the rolled-up levels used to read the
    nulled key copy (SUM(b) under ((a,b),(a)) summed nulls)."""
    import duckdb

    from bloomfilter_multithread_ray.pipelines.agg import grouping_sets

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"a": rng.choice(["x", "y", "z"], 300),
         "b": rng.integers(1, 5, 300).astype("int64"),
         "v": rng.integers(0, 100, 300).astype("int64")}
    )
    want = duckdb.connect().execute(
        "SELECT a, b, GROUPING(a, b) AS grouping_id, SUM(b) AS sb, "
        "MAX(b) AS mb, COUNT(*) AS n "
        "FROM df GROUP BY GROUPING SETS ((a, b), (a)) "
        "ORDER BY GROUPING(a, b), a NULLS LAST, b NULLS LAST"
    ).df()
    got = (
        grouping_sets(
            ray.data.from_pandas(df).repartition(3),
            [["a", "b"], ["a"]],
            {"sb": ("sum", "b"), "mb": ("max", "b"), "n": ("count", None)},
            num_partitions=4,
        )
        .to_pandas()
        .sort_values(["grouping_id", "a", "b"], na_position="last")
        .reset_index(drop=True)
    )
    g = got[want.columns.tolist()].astype(
        {"b": "float64", "sb": "int64", "mb": "int64",
         "n": "int64", "grouping_id": "int64"}
    )
    w = want.astype({"b": "float64", "sb": "int64", "mb": "int64",
                     "n": "int64", "grouping_id": "int64"})
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


# ----------------------------------------------- round-5 hardening
def test_grouped_agg_nullable_int_key_single_group(ray_session):
    """THE routing bug class: a nullable int64 key whose nulls appear
    in only SOME blocks must still produce ONE row per key — per-batch
    hash-path dispatch used to split a key's partials across two
    partitions (silently wrong sums)."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    a = pd.DataFrame({"k": pd.array([5, 5, 7], dtype="Int64"),
                      "v": [1, 2, 4]})
    b = pd.DataFrame({"k": pd.array([5, None, 7], dtype="Int64"),
                      "v": [8, 16, 32]})
    ds = rd.from_pandas(a).union(rd.from_pandas(b))
    out = grouped_agg(ds, "k", {"s": ("sum", "v")}).to_pandas()
    got = {(None if pd.isna(r.k) else int(r.k)): int(r.s)
           for r in out.itertuples()}
    assert got == {5: 11, 7: 36, None: 16}
    assert len(out) == 3  # one row per group — never split partials


def test_grouped_agg_bool_second_key_with_nulls(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    df = pd.DataFrame(
        {"a": ["x", "x", "y", "y"],
         "b": pd.array([True, None, False, None], dtype="boolean"),
         "v": [1, 2, 4, 8]}
    )
    out = grouped_agg(rd.from_pandas(df), ["a", "b"],
                      {"s": ("sum", "v")}).to_pandas()
    assert len(out) == 4
    row = out[(out["a"] == "x") & out["b"].isna()]
    assert int(row["s"].iloc[0]) == 2


def test_grouped_var_all_null_group_is_null(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

    df = pd.DataFrame(
        {"k": ["a", "a", "b"],
         "x": pd.array([1.0, 3.0, None], dtype="float64")}
    )
    out = grouped_agg(rd.from_pandas(df), "k",
                      {"var": ("var", "x"), "m": ("mean", "x")}).to_pandas()
    a = out[out["k"] == "a"].iloc[0]
    assert a["var"] == 1.0
    b = out[out["k"] == "b"].iloc[0]
    assert pd.isna(b["var"]) and pd.isna(b["m"])  # SQL VAR_POP: NULL


def test_grouping_sets_rejects_grouping_id_agg_input(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.agg import grouping_sets

    ds = rd.from_pandas(pd.DataFrame(
        {"a": ["x"], "grouping_id": [1]}))
    with pytest.raises(ValueError, match="grouping_id"):
        grouping_sets(ds, [["a"]], {"s": ("sum", "grouping_id")})
