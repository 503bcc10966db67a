"""Round-4 wave-5 operators: grouped OLS trend, and friends."""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray


# ---------------------------------------------------------- OLS trend
def test_ols_trend_matches_independent_reference(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    hour = np.timedelta64(1, "h")
    rng = np.random.default_rng(11)
    rows = []
    # user 1: clean rising trend; user 2: falling; user 3: flat noise;
    # user 4: single event (dropped); user 5: all in one hour (dropped)
    for i in range(50):
        rows.append((t0 + i * hour, 1, 10.0 + 2.5 * i + rng.normal(0, 1)))
        rows.append((t0 + i * hour, 2, 90.0 - 1.25 * i + rng.normal(0, 1)))
        rows.append((t0 + i * hour, 3, 40.0 + rng.normal(0, 3)))
    rows.append((t0, 4, 5.0))
    rows.append((t0 + np.timedelta64(10, "m"), 5, 1.0))
    rows.append((t0 + np.timedelta64(20, "m"), 5, 9.0))
    df = pd.DataFrame(rows, columns=["ts", "user_id", "value"])
    df["user_id"] = df["user_id"].astype(np.int64)

    out = A.grouped_ols_trend(lambda: ray.data.from_pandas(df))
    assert list(out["user_id"]) == [1, 2, 3]

    # independent reference: numpy polyfit on the quantized grid
    lo = df["ts"].astype("datetime64[us]").astype(np.int64).min()
    for uid in (1, 2, 3):
        g = df[df.user_id == uid]
        t = (g["ts"].astype("datetime64[us]").astype(np.int64) - lo) // 3_600_000_000
        v = np.trunc(g["value"].to_numpy() * 1e3
                     + np.copysign(0.5, g["value"].to_numpy()))
        slope = np.polyfit(t.to_numpy().astype(float), v.astype(float), 1)[0]
        got = float(out.loc[out.user_id == uid, "slope_q"].iloc[0]) / 1e6
        assert abs(got - slope) < 1e-3, (uid, got, slope)
    # signs / magnitudes of the planted trends (value quantized 1e3:
    # slope is in milli-value units per hour)
    s = dict(zip(out["user_id"], out["slope_q"]))
    assert s[1] > 2_000_000_000 and s[2] < -1_000_000_000
    assert abs(s[3]) < 500_000_000


def test_ols_trend_partition_invariance(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    rng = np.random.default_rng(7)
    n = 2000
    df = pd.DataFrame(
        {
            "ts": t0 + rng.integers(0, 500, n) * np.timedelta64(1, "h"),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "value": np.where(rng.random(n) < 0.05, np.nan,
                              rng.normal(50, 20, n)),
        }
    )
    a = A.grouped_ols_trend(lambda: ray.data.from_pandas(df).repartition(3))
    b = A.grouped_ols_trend(
        lambda: ray.data.from_pandas(df).repartition(17), num_partitions=5
    )
    pd.testing.assert_frame_equal(a, b)
