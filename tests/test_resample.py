"""resample_fill unit tests: DuckDB cross-check, gap/fill semantics,
pre-1970 buckets, ns inputs, exact int64 sums, partition invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from bloomfilter_multithread_ray.pipelines.analytics import resample_fill

HOUR = 3_600_000_000


def _mk(n=500, seed=5):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-03-01").value // 1000  # us
    ts = base + rng.integers(0, 72, n) * HOUR + rng.integers(0, HOUR, n)
    # sparse users -> guaranteed gaps
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 6, n),
            "ts": pd.to_datetime(ts, unit="us"),
            "v": rng.integers(-50, 1000, n).astype(np.int64),
        }
    )
    return df.astype({"ts": "datetime64[us]"})


def test_resample_fill_duckdb_cross(ray_session):
    import ray

    df = _mk()
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        f"""
        WITH e AS (SELECT u, CAST(epoch_us(ts) // {HOUR} * {HOUR} AS BIGINT) AS b, v
                   FROM t WHERE ts IS NOT NULL),
        a AS (SELECT u, b, count(*) AS n, CAST(SUM(v) AS BIGINT) AS vs,
                     min(v) AS vmin FROM e GROUP BY 1, 2),
        s AS (SELECT u, min(b) mn, max(b) mx FROM a GROUP BY 1),
        g AS (SELECT u, unnest(generate_series(mn, mx, {HOUR})) AS b FROM s),
        j AS (SELECT g.u, g.b, coalesce(a.n, 0) AS n, a.vs, a.vmin
              FROM g LEFT JOIN a USING (u, b))
        SELECT u, make_timestamp(b) AS bucket, CAST(n AS BIGINT) AS n,
               last_value(vs IGNORE NULLS) OVER (PARTITION BY u ORDER BY b) AS vs,
               vmin
        FROM j ORDER BY u, b
        """
    ).df().astype({"bucket": "datetime64[us]"})
    for parts in (1, 7):
        got = (
            resample_fill(
                ray.data.from_pandas(df).repartition(parts),
                "u", "ts", HOUR,
                {"n": ("count", None), "vs": ("sum", "v"), "vmin": ("min", "v")},
                fill={"n": "zero", "vs": "ffill"},
                num_partitions=8,
            )
            .to_pandas()
            .sort_values(["u", "bucket"])
            .reset_index(drop=True)
        )
        got["n"] = got["n"].astype(np.int64)
        pd.testing.assert_frame_equal(got[["u", "bucket", "n", "vs", "vmin"]], want)


def test_resample_fill_planted_semantics(ray_session):
    import ray

    ts = pd.to_datetime(
        ["1970-01-01 00:00:05", "1970-01-01 00:00:25",  # gap at :10
         "1969-12-31 23:59:58",                          # pre-epoch floor
         None]                                           # dropped
    )
    df = pd.DataFrame({"k": ["a", "a", "b", "a"], "ts": ts,
                       "v": [2.0, 4.0, 10.0, 99.0]})
    got = (
        resample_fill(
            ray.data.from_pandas(df).repartition(2), "k", "ts", 10_000_000,
            {"n": ("count", None), "vs": ("sum", "v"), "vmax": ("max", "v")},
            fill={"n": "zero", "vs": "ffill"},
        )
        .to_pandas()
        .sort_values(["k", "bucket"])
        .reset_index(drop=True)
    )
    assert list(got["n"]) == [1, 0, 1, 1]
    assert list(got["vs"]) == [2.0, 2.0, 4.0, 10.0]  # ffill through the gap
    assert pd.isna(got.loc[1, "vmax"])  # no-fill column keeps SQL NULL
    assert got.loc[2, "bucket"] == pd.Timestamp("1970-01-01 00:00:20")
    assert got.loc[3, "bucket"] == pd.Timestamp("1969-12-31 23:59:50")
    # ns-resolution input handled identically (unit normalization)
    df_ns = df.astype({"ts": "datetime64[ns]"})
    got_ns = (
        resample_fill(
            ray.data.from_pandas(df_ns).repartition(2), "k", "ts", 10_000_000,
            {"n": ("count", None), "vs": ("sum", "v"), "vmax": ("max", "v")},
            fill={"n": "zero", "vs": "ffill"},
        )
        .to_pandas()
        .sort_values(["k", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got_ns)


def test_resample_fill_int64_exactness(ray_session):
    """Sums above 2^53 stay exact — no float round-trip anywhere."""
    import ray

    big = (1 << 55) + 3
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-03 00:00:00"]
    )
    df = pd.DataFrame({"k": [1, 1, 1], "ts": ts, "v": [big, 1, 7]}).astype(
        {"ts": "datetime64[us]", "v": "int64"}
    )
    got = (
        resample_fill(
            ray.data.from_pandas(df).repartition(3), "k", "ts", 86_400_000_000,
            {"vs": ("sum", "v")}, fill={"vs": "ffill"},
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert list(got["vs"]) == [big + 1, big + 1, 7]


def test_resample_fill_validation(ray_session):
    import ray

    ds = ray.data.from_pandas(
        pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "v": [1.0]})
    )
    with pytest.raises(ValueError, match="every_us"):
        resample_fill(ds, "k", "ts", 0, {"n": ("count", None)})
    with pytest.raises(ValueError, match="unsupported agg"):
        resample_fill(ds, "k", "ts", 1, {"n": ("median", "v")})
    with pytest.raises(ValueError, match="count takes"):
        resample_fill(ds, "k", "ts", 1, {"n": ("count", "v")})
    with pytest.raises(ValueError, match="bad fill"):
        resample_fill(ds, "k", "ts", 1, {"n": ("count", None)}, fill={"n": "bfill"})
    with pytest.raises(ValueError, match="bad fill"):
        resample_fill(ds, "k", "ts", 1, {"n": ("count", None)}, fill={"x": "zero"})
