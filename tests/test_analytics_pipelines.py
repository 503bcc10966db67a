"""Pipeline-level error bounds: each sketch-mode analytics pipeline vs
its exact-mode twin on the documents table (the north-star criteria at
the composition level; unit-level bounds live in test_sketches.py)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _docs(cols):
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=cols)


def test_hll_within_bound_of_exact():
    from bloomfilter_multithread_ray.pipelines import analytics as A
    from bloomfilter_multithread_ray.stages import text as T

    exact = A.distinct_count_exact(_docs(["text"]), T.make_unique_tokens_fn())
    est = A.distinct_count_hll(_docs(["text"]), T.make_token_hash_fn())
    true = float(exact["distinct_tokens"][0])
    rel = abs(est["estimate"][0] - true) / true
    assert rel <= 3 * est["rel_error_bound"][0] + 0.05, (est, true)


def test_cms_overestimates_within_eps():
    """Sketch-side heavy hitters: MG candidates must recover the exact
    top-k, MG counters lower-bound truth within err_bound, CMS
    estimates upper-bound truth within eps_bound."""
    from bloomfilter_multithread_ray.pipelines import analytics as A
    from bloomfilter_multithread_ray.stages import text as T

    exact = A.heavy_hitters_exact(_docs(["text"]), T.make_explode_token_counts_fn(), topk=20)
    df = A.heavy_hitters_cms(
        _docs(["text"]), T.make_explode_token_counts_fn(), T.make_token_hash_fn(), topk=20
    )
    true = dict(zip(exact["tok"], exact["cnt"]))
    # candidate set: generous capacity on the fixture vocab -> exact
    assert list(df["tok"]) == list(exact["tok"])
    for _, r in df.iterrows():
        t = int(true[r["tok"]])
        assert r["lower_cnt"] <= t <= r["lower_cnt"] + r["err_bound"]
        assert t <= r["est_cnt"] <= t + r["eps_bound"] + 1


@pytest.mark.parametrize("algo,rank_tol", [("tdigest", 0.02), ("kll", 0.05)])
def test_quantile_sketches_rank_error(algo, rank_tol):
    from bloomfilter_multithread_ray.pipelines import analytics as A
    from bloomfilter_multithread_ray.stages import text as T
    import pyarrow as pa
    import pyarrow.parquet as pq

    stats_fn = T.make_doc_token_stats_fn()

    def with_source(t: pa.Table) -> pa.Table:
        s = stats_fn(t)
        return s.append_column("source", t.column("source"))

    ds = _docs(["doc_id", "text", "source"]).map_batches(
        with_source, batch_format="pyarrow", zero_copy_batch=True
    )
    got = A.grouped_quantiles_sketch(ds, "n_tok", "source", algo=algo).set_index("source")

    # exact per-group values for rank-error measurement
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text", "source"])
    groups: dict[str, list[int]] = {}
    for tx, src in zip(t.column("text").to_pylist(), t.column("source").to_pylist()):
        groups.setdefault(src, []).append(len([w for w in tx.split(" ") if w]))
    for src, vals in groups.items():
        v = np.sort(np.array(vals, dtype=np.float64))
        for q, name in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
            est = got.loc[src, name]
            # rank of the estimate within the exact values
            rank = np.searchsorted(v, est, side="right") / len(v)
            assert abs(rank - q) <= rank_tol + 2.0 / len(v), (src, name, est, rank)


def test_weighted_sample_distribution_and_determinism():
    """A-ES weighted sampling: inclusion frequency tracks weight across
    seeds; identical sample under re-sharding (derived randomness)."""
    import numpy as np
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines import analytics as A

    n = 400
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype="int64"),
         # two weight classes: heavy docs 10x the light ones
         "n_tok": np.where(np.arange(n) < 40, 1000, 100).astype("int32")}
    )
    ds = ray.data.from_pandas(df).repartition(4)

    # determinism + partitioning independence
    s1 = A.weighted_sample(ds, "n_tok", k=50, seed=3)
    s2 = A.weighted_sample(ray.data.from_pandas(df).repartition(9), "n_tok", k=50, seed=3)
    assert sorted(s1["doc_id"]) == sorted(s2["doc_id"])

    # inclusion frequency: heavy docs (10% of rows, ~53% of weight)
    # must be sampled far more often than light ones
    heavy_rate, light_rate = [], []
    for seed in range(1, 21):
        s = A.weighted_sample(ds, "n_tok", k=50, seed=seed)
        got = set(s["doc_id"])
        heavy_rate.append(len([d for d in got if d < 40]) / 40)
        light_rate.append(len([d for d in got if d >= 40]) / 360)
    h, l = np.mean(heavy_rate), np.mean(light_rate)
    assert h > 3 * l, (h, l)
    # zero-weight rows never sampled
    dfz = df.copy(); dfz.loc[dfz.doc_id >= 10, "n_tok"] = 0
    sz = A.weighted_sample(ray.data.from_pandas(dfz).repartition(3), "n_tok", k=50, seed=5)
    assert set(sz["doc_id"]) <= set(range(10))


def test_events_rolling_mean_partial_windows(ray_session, testdata_dir):
    """First rows of each user average over the rows seen so far (SQL
    frame semantics), full windows use exactly `window` rows."""
    import numpy as np

    from bloomfilter_multithread_ray.pipelines.relational import events_rolling_mean

    df = events_rolling_mean(testdata_dir, window=5)
    g = df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id")
    first = g.head(1)
    # a user's first event's rolling mean equals its own value
    assert np.allclose(first["roll_mean"], first["value"].round(6))
    # spot-check one full window by brute force
    u = df["user_id"].value_counts().idxmax()
    rows = df[df["user_id"] == u].sort_values(["ts", "event_id"]).reset_index(drop=True)
    i = len(rows) - 1
    want = round(rows["value"].iloc[i - 4 : i + 1].mean(), 6)
    assert abs(rows["roll_mean"].iloc[i] - want) < 1e-9


def test_grouped_quantile_disc_exact_vs_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_quantile_disc

    rng = np.random.default_rng(17)
    g = np.repeat(["a", "b", "c", "d"], 500)
    v = np.concatenate(
        [rng.normal(0, 1, 500), rng.exponential(3, 500),
         -rng.exponential(2, 500), np.full(500, -1.5)]  # incl. all-equal group
    )
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    for q in (0.05, 0.5, 0.95, 1.0):
        out = grouped_quantile_disc(rd.from_arrow(t).repartition(6), "g", "v", q)
        for key in "abcd":
            vals = np.sort(v[g == key])
            idx = min(max(int(np.ceil(q * len(vals))) - 1, 0), len(vals) - 1)
            want = vals[idx]
            got = float(out.set_index("g").loc[key, "value"])
            assert got == want, (q, key, got, want)


def test_grouped_quantile_disc_null_values_excluded(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_quantile_disc

    t = pa.table(
        {"g": pa.array(["a"] * 5), "v": pa.array([1.0, None, 3.0, None, 2.0])}
    )
    out = grouped_quantile_disc(rd.from_arrow(t).repartition(2), "g", "v", 0.5)
    assert float(out.value[0]) == 2.0  # median of {1,2,3}, nulls ignored


def test_events_hourly_distinct_matches_pandas(ray_session, testdata_dir):
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.relational import (
        events_hourly_distinct,
    )

    got = events_hourly_distinct(testdata_dir)
    ev = pd.read_parquet(f"{testdata_dir}/events.parquet",
                         columns=["event_type", "ts", "user_id"])
    ev["hour"] = ev.ts.dt.floor("h")
    want = (
        ev.groupby(["event_type", "hour"])["user_id"].nunique().reset_index()
        .rename(columns={"user_id": "n_users"})
        .sort_values(["event_type", "hour"]).reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.n_users.values == want.n_users.values).all()


def test_grouped_quantile_tdigest_within_bound(ray_session, testdata_dir):
    import numpy as np

    from bloomfilter_multithread_ray.pipelines.analytics import (
        grouped_quantile_disc,
        grouped_quantile_tdigest,
    )
    from bloomfilter_multithread_ray.pipelines.relational import read

    ev = read(testdata_dir, "events", ["event_type", "value"])
    approx = grouped_quantile_tdigest(
        ev, "event_type", "value", qs=(0.95,), names=("p95",)
    )
    # t-digest guarantees RANK accuracy, not value accuracy: the p95
    # estimate must land between the exact p90 and p99 of its group
    lo = grouped_quantile_disc(
        read(testdata_dir, "events", ["event_type", "value"]),
        "event_type", "value", 0.90,
    ).rename(columns={"value": "lo"})
    hi = grouped_quantile_disc(
        read(testdata_dir, "events", ["event_type", "value"]),
        "event_type", "value", 0.99,
    ).rename(columns={"value": "hi"})
    m = approx.merge(lo, on="event_type").merge(hi, on="event_type")
    assert (m.p95 >= m.lo).all() and (m.p95 <= m.hi).all()


def test_dedup_new_against_corpus_synthetic(ray_session, tmp_path):
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.relational import (
        dedup_new_against_corpus,
    )

    corpus = [
        {"doc_id": i, "text": f"existing document number {i}", "source": "old"}
        for i in range(50)
    ]
    new = [
        {"doc_id": 100, "text": "existing document number 7", "source": "new"},  # dup
        {"doc_id": 101, "text": "a genuinely new document", "source": "new"},
        {"doc_id": 102, "text": "another new one", "source": "new"},
        {"doc_id": 103, "text": "existing document number 49", "source": "new"},  # dup
    ]
    pd.DataFrame(corpus + new).to_parquet(tmp_path / "documents.parquet")
    out = dedup_new_against_corpus(str(tmp_path), new_source="new")
    assert out.doc_id.tolist() == [101, 102]


def test_events_funnel_strict_ordering(ray_session, tmp_path):
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.relational import events_funnel

    T = pd.Timestamp
    rows = [
        # u1 completes the whole funnel in order
        (1, "view", T("2024-01-01 00:00")), (1, "click", T("2024-01-01 01:00")),
        (1, "purchase", T("2024-01-01 02:00")),
        # u2 clicks BEFORE viewing -> click must not count
        (2, "click", T("2024-01-01 00:00")), (2, "view", T("2024-01-01 01:00")),
        # u3 views only
        (3, "view", T("2024-01-01 00:00")),
        # u4 purchase without view/click -> nothing counts
        (4, "purchase", T("2024-01-01 00:00")),
        # u5: view then click at the SAME timestamp -> strict > excludes
        (5, "view", T("2024-01-01 00:00")), (5, "click", T("2024-01-01 00:00")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["value"] = 1.0
    df["event_id"] = range(len(df))
    df.to_parquet(tmp_path / "events.parquet")
    out = events_funnel(str(tmp_path))
    assert out.n_users.tolist() == [4, 1, 1]  # views: u1,u2,u3,u5; click: u1; purchase: u1


def test_grouped_quantile_disc_multiround_with_mixed_resolution(ray_session):
    """Force round >= 2 for one group while another resolves in round 1:
    the resolved-out key makes the per-row prefix map carry NaN, the
    historical float64-coercion trap for >2^53 prefixes."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_quantile_disc

    rng = np.random.default_rng(41)
    # group "deep": 70k values inside [1, 1 + 1e-7) — top 16 bits all
    # equal, target bucket min != max -> must narrow into round 2+
    deep = 1.0 + rng.random(70_000) * 1e-7
    # group "easy": well-spread values — resolves in round 1
    easy = rng.normal(0, 50, 5_000)
    g = np.concatenate([np.full(len(deep), "deep"), np.full(len(easy), "easy")])
    v = np.concatenate([deep, easy])
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    out = grouped_quantile_disc(
        rd.from_arrow(t).repartition(6), "g", "v", 0.5
    ).set_index("g")
    for key, vals in (("deep", deep), ("easy", easy)):
        s = np.sort(vals)
        want = s[int(np.ceil(0.5 * len(s))) - 1]
        assert float(out.loc[key, "value"]) == want, key


def test_grouped_mad_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_mad

    rng = np.random.default_rng(8)
    g = np.repeat(["a", "b"], 301)  # odd sizes -> unambiguous medians
    v = np.concatenate([rng.normal(3, 1, 301), rng.exponential(2, 301)])
    t = pa.table({"g": pa.array(g), "v": pa.array(v)})
    out = grouped_mad(
        lambda: rd.from_arrow(t).repartition(4), "g", "v"
    ).set_index("g")
    for key in "ab":
        vals = v[g == key]
        med = np.sort(vals)[int(np.ceil(0.5 * len(vals))) - 1]
        a = np.abs(vals - med)
        mad = np.sort(a)[int(np.ceil(0.5 * len(a))) - 1]
        assert float(out.loc[key, "median"]) == med
        assert float(out.loc[key, "mad"]) == mad


def test_events_funnel_pre_epoch_timestamps(ray_session, tmp_path):
    """Negative (pre-1970) epochs must still clear stage 0: prev_first
    initializes to int64 min, not -1 (ADVICE r2)."""
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.relational import events_funnel

    T = pd.Timestamp
    rows = [
        (1, "view", T("1969-06-01 00:00")),
        (1, "click", T("1969-06-02 00:00")),
        (1, "purchase", T("1969-06-03 00:00")),
        (2, "view", T("1969-12-31 23:59")),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["value"] = 1.0
    df["event_id"] = range(len(df))
    df.to_parquet(tmp_path / "events.parquet")
    out = events_funnel(str(tmp_path))
    assert out.n_users.tolist() == [2, 1, 1]


def test_grouped_histogram_bins_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_histogram

    t = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b", "a"], pa.string()),
            "v": pa.array([0.0, 9.999, 10.0, -0.1, -10.0, None], pa.float64()),
        }
    )
    out = grouped_histogram(ray.data.from_arrow(t), "g", "v", bin_width=10.0)
    rows = {(r["g"], r["bin"]): r["n"] for _, r in out.iterrows()}
    # [0,10) -> bin 0 (two values); exactly 10.0 -> bin 1;
    # -0.1 -> bin -1 (floor, not trunc); -10.0 -> bin -1; null dropped
    assert rows == {("a", 0): 2, ("a", 1): 1, ("b", -1): 2}


def test_profile_table_nulls_types_and_exact_distinct(ray_session):
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import profile_table

    t = pa.table(
        {
            "s": pa.array(["a", "b", "a", None, ""], pa.string()),
            "i": pa.array([1, 1, 2, None, -1], pa.int64()),
            "f": pa.array([0.0, -0.0, 1.5, None, 1.5], pa.float64()),
            "ts": pa.array(
                np.array(["2024-01-01", "2024-01-01", "2024-01-02", "NaT", "2024-01-03"],
                         dtype="datetime64[us]")
            ),
        }
    )
    out = profile_table(
        ray.data.from_arrow(t).repartition(3), ["s", "i", "f", "ts"]
    ).set_index("col")
    assert (out["n_rows"] == 5).all()
    assert out.loc["s", "n_nulls"] == 1 and out.loc["s", "n_distinct"] == 3
    assert out.loc["i", "n_nulls"] == 1 and out.loc["i", "n_distinct"] == 3
    # -0.0 == 0.0 (one distinct value), 1.5 dup collapses
    assert out.loc["f", "n_nulls"] == 1 and out.loc["f", "n_distinct"] == 2
    assert out.loc["ts", "n_nulls"] == 1 and out.loc["ts", "n_distinct"] == 3


def test_pivot_wide_reshape_fill_and_dtypes(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import pivot

    t = pa.table({
        "k": pa.array(["r1", "r1", "r2", "r2", "r1"], pa.string()),
        "p": pa.array(["x", "y", "x", "x", "x"], pa.string()),
        "v": pa.array([1, 2, 3, 4, 10], pa.int64()),
    })
    wide = pivot(ray.data.from_arrow(t), "k", "p", "v",
                 agg="sum", pivot_values=["x", "y"], fill=0)
    df = pd.DataFrame(wide.take_all()).sort_values("k").reset_index(drop=True)
    # r1: x=1+10, y=2; r2: x=3+4, y missing -> fill 0 with int dtype kept
    assert df.to_dict("records") == [
        {"k": "r1", "x": 11, "y": 2},
        {"k": "r2", "x": 7, "y": 0},
    ]
    assert df["y"].dtype == np.int64


def test_pivot_discovery_null_fill_and_other_aggs(ray_session):
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import pivot

    t = pa.table({
        "k": pa.array(["a", "a", "b"], pa.string()),
        "p": pa.array(["m", "n", "m"], pa.string()),
        "v": pa.array([4.0, 6.0, 8.0], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    # discovery mode (no pivot_values) + fill=None keeps SQL NULL
    wide = pd.DataFrame(
        pivot(ds, "k", "p", "v", agg="mean", fill=None).take_all()
    ).sort_values("k").reset_index(drop=True)
    assert list(wide.columns) == ["k", "m", "n"]  # discovered + sorted
    assert wide.loc[0, "m"] == 4.0 and wide.loc[0, "n"] == 6.0
    assert wide.loc[1, "m"] == 8.0 and pd.isna(wide.loc[1, "n"])
    # ambiguous wide names must raise, not silently collide
    with pytest.raises(ValueError):
        pivot(ds, "k", "p", "v", pivot_values=["m", "m"])
    with pytest.raises(ValueError):
        pivot(ds, "k", "p", "v", pivot_values=["k"])


# ---------------------------------------------------- hopping window agg
def test_hopping_window_membership_and_sums(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import hopping_window_agg

    # hop=10, window=30 (k=3): an event at ts lands in starts
    # {floor(ts/10)*10 - {0,10,20}}; ts=25 -> {20,10,0}; ts=0 -> {0,-10,-20}
    docs = pd.DataFrame({"ts": np.array([25, 0], np.int64),
                         "v": np.array([7, 5], np.int64)})
    out = (
        hopping_window_agg(
            rd.from_pandas(docs),
            {"n": ("count", None), "s": ("sum", "v")},
            ts_col="ts", window_us=30, hop_us=10,
        )
        .to_pandas().sort_values("window_us").reset_index(drop=True)
    )
    exp = pd.DataFrame({
        "window_us": np.array([-20, -10, 0, 10, 20], np.int64),
        "n": np.array([1, 1, 2, 1, 1], np.int64),
        "s": np.array([5, 5, 12, 7, 7], np.int64),
    })
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_hopping_window_negative_ts_floor(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import hopping_window_agg

    # ts=-5 with hop 10: floor(-5/10)=-1 -> latest start -10 (floor
    # division, not trunc-toward-zero); k=2 -> starts {-10, -20}
    docs = pd.DataFrame({"ts": np.array([-5], np.int64)})
    out = (
        hopping_window_agg(
            rd.from_pandas(docs), {"n": ("count", None)},
            ts_col="ts", window_us=20, hop_us=10,
        )
        .to_pandas().sort_values("window_us").reset_index(drop=True)
    )
    assert out["window_us"].tolist() == [-20, -10]
    assert out["n"].tolist() == [1, 1]


def test_hopping_window_tumbling_degenerate_and_by(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import hopping_window_agg

    docs = pd.DataFrame({
        "ts": np.array([5, 15, 15], np.int64),
        "k": ["a", "a", "b"],
        "v": np.array([1, 2, 4], np.int64),
    })
    out = (
        hopping_window_agg(
            rd.from_pandas(docs), {"s": ("sum", "v")},
            ts_col="ts", window_us=10, hop_us=10, by=["k"],
        )
        .to_pandas().sort_values(["window_us", "k"]).reset_index(drop=True)
    )
    exp = pd.DataFrame({
        "window_us": np.array([0, 10, 10], np.int64),
        "k": ["a", "a", "b"],
        "s": np.array([1, 2, 4], np.int64),
    })
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_hopping_window_validation(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import hopping_window_agg

    ds = rd.from_pandas(pd.DataFrame({"ts": np.array([1], np.int64)}))
    with pytest.raises(ValueError):
        hopping_window_agg(ds, {"n": ("count", None)},
                           ts_col="ts", window_us=25, hop_us=10)
    with pytest.raises(ValueError):
        hopping_window_agg(ds, {"n": ("count", None)},
                           ts_col="ts", window_us=0, hop_us=10)


# ------------------------------------------------ partitioned window functions
def _win_df(n=2000, seed=9):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "u": rng.integers(0, 30, n).astype("int64"),
        "g": rng.integers(0, 3, n).astype("int64"),
        "t": rng.integers(0, 25, n).astype("int64"),
        "v": rng.integers(-50, 50, n).astype("int64"),
        "rid": np.arange(n, dtype="int64"),
    })


def test_window_ties_rank_dense_rank(ray_session):
    import duckdb
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = _win_df()
    out = partitioned_window(
        rd.from_pandas(df).repartition(5), "u", "t",
        {"rk": ("rank",), "dr": ("dense_rank",), "rn": ("row_number",)},
        num_partitions=8,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT rid, RANK() OVER w AS rk, DENSE_RANK() OVER w AS dr "
        "FROM df WINDOW w AS (PARTITION BY u ORDER BY t) ORDER BY rid"
    ).df()
    assert (out.rk.to_numpy() == exp.rk.to_numpy()).all()
    assert (out.dr.to_numpy() == exp.dr.to_numpy()).all()
    # row_number over a tied order is nondeterministic in SQL; ours must
    # still be a permutation of 1..len within each (u) group
    g = out.groupby("u").rn
    assert (g.min() == 1).all() and (g.max() == out.groupby("u").size()).all()


def test_window_desc_multikey_and_lag_default(ray_session):
    import duckdb
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = _win_df(1500, seed=4)
    out = partitioned_window(
        rd.from_pandas(df).repartition(4), ["u", "g"], [("t", "desc"), "rid"],
        {"rn": ("row_number",), "lg": ("lag", "v", 1, -777), "cs": ("cumsum", "v")},
        num_partitions=8,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT rid, ROW_NUMBER() OVER w AS rn, "
        "COALESCE(LAG(v,1) OVER w, -777) AS lg, SUM(v) OVER w AS cs "
        "FROM df WINDOW w AS (PARTITION BY u, g ORDER BY t DESC NULLS LAST, rid) "
        "ORDER BY rid"
    ).df()
    for c in ("rn", "lg", "cs"):
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_window_null_order_keys_last(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = pd.DataFrame({
        "u": np.zeros(4, dtype="int64"),
        "t": pd.array([2, None, 1, None], dtype="Int64"),
        "rid": np.arange(4, dtype="int64"),
    })
    out = partitioned_window(
        rd.from_pandas(df), "u", ["t", "rid"], {"rn": ("row_number",)},
        num_partitions=2,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    # nulls last: rid 2 (t=1) first, rid 0 (t=2), then the two nulls by rid
    assert out.rn.tolist() == [2, 3, 1, 4]


def test_window_validation(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    ds = rd.from_pandas(pd.DataFrame({"u": [1], "t": [1]}))
    with pytest.raises(ValueError, match="unknown kind"):
        partitioned_window(ds, "u", "t", {"x": ("median",)})
    with pytest.raises(ValueError, match="collides"):
        partitioned_window(ds, "u", "t", {"t": ("row_number",)})


def test_window_ntile_percent_rank_cume_dist(ray_session):
    import duckdb
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = _win_df(1200, seed=13)
    out = partitioned_window(
        rd.from_pandas(df).repartition(4), "u", ["t", "rid"],
        {"nt": ("ntile", 4), "pr": ("percent_rank",), "cd": ("cume_dist",)},
        num_partitions=8,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT rid, NTILE(4) OVER w AS nt, PERCENT_RANK() OVER w AS pr, "
        "CUME_DIST() OVER w AS cd "
        "FROM df WINDOW w AS (PARTITION BY u ORDER BY t, rid) ORDER BY rid"
    ).df()
    assert (out.nt.to_numpy() == exp.nt.to_numpy()).all()
    assert np.allclose(out.pr.to_numpy(), exp.pr.to_numpy())
    assert np.allclose(out.cd.to_numpy(), exp.cd.to_numpy())
    # ties: cume_dist/percent_rank with a tied order key
    out2 = partitioned_window(
        rd.from_pandas(df).repartition(4), "u", "t",
        {"pr": ("percent_rank",), "cd": ("cume_dist",), "nt": ("ntile", 3)},
        num_partitions=8,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    exp2 = duckdb.sql(
        "SELECT rid, PERCENT_RANK() OVER w AS pr, CUME_DIST() OVER w AS cd "
        "FROM df WINDOW w AS (PARTITION BY u ORDER BY t) ORDER BY rid"
    ).df()
    assert np.allclose(out2.pr.to_numpy(), exp2.pr.to_numpy())
    assert np.allclose(out2.cd.to_numpy(), exp2.cd.to_numpy())
    # single-row groups: percent_rank 0, cume_dist 1
    one = pd.DataFrame({"u": [1], "t": [0], "v": [5], "rid": [0], "g": [0]})
    o1 = partitioned_window(
        rd.from_pandas(one), "u", "t",
        {"pr": ("percent_rank",), "cd": ("cume_dist",), "nt": ("ntile", 5)},
        num_partitions=2,
    ).to_pandas()
    assert o1.pr.iloc[0] == 0.0 and o1.cd.iloc[0] == 1.0 and o1.nt.iloc[0] == 1
    with pytest.raises(ValueError, match="ntile"):
        partitioned_window(rd.from_pandas(one), "u", "t", {"x": ("ntile", 0)})


# --------------------------------------------------------------- unpivot
def test_unpivot_matches_duckdb_and_roundtrip(ray_session):
    import duckdb
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import pivot, unpivot

    wide = pd.DataFrame({
        "k": np.arange(6, dtype="int64"),
        "a": np.array([1, 2, 3, 4, 5, 6], dtype="int64"),
        "b": pd.array([10, None, 30, None, 50, 60], dtype="Int64"),
        "c": np.array([0.5, 1.5, 2.5, 3.5, 4.5, 5.5]),
    })
    # int + float value cols unify to float64
    out = unpivot(
        rd.from_pandas(wide).repartition(3), ["k"], ["a", "b", "c"],
        var_name="m", value_name="v",
    ).to_pandas().sort_values(["k", "m"]).reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT k, 'a' AS m, CAST(a AS DOUBLE) AS v FROM wide "
        "UNION ALL SELECT k, 'b', CAST(b AS DOUBLE) FROM wide "
        "UNION ALL SELECT k, 'c', c FROM wide ORDER BY k, m"
    ).df()
    assert out.v.dtype == np.float64
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)
    # drop_null mirrors SQL UNPIVOT's default NULL omission
    out2 = unpivot(
        rd.from_pandas(wide).repartition(2), ["k"], ["a", "b"],
        var_name="m", value_name="v", drop_null=True,
    ).to_pandas()
    assert len(out2) == 6 + 4  # b has 2 nulls
    assert out2.v.notna().all()

    # pivot(fill=None) -> unpivot(drop_null) round-trips to the long form
    long = pd.DataFrame({
        "g": np.repeat(np.arange(4, dtype="int64"), 2),
        "p": ["x", "y"] * 4,
        "v": np.arange(8, dtype="int64"),
    }).iloc[:-1]  # drop one combo so a NULL cell exists
    wide_ds = pivot(
        rd.from_pandas(long).repartition(2), "g", "p", "v",
        agg="sum", pivot_values=["x", "y"], fill=None,
    )
    back = unpivot(
        wide_ds, ["g"], ["x", "y"], var_name="p", value_name="v", drop_null=True
    ).to_pandas().sort_values(["g", "p"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        back, long.sort_values(["g", "p"]).reset_index(drop=True).astype({"v": "int64"}),
        check_dtype=False,
    )


def test_unpivot_validation(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import unpivot

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "a": [1], "s": ["x"]}))
    with pytest.raises(ValueError, match="non-empty"):
        unpivot(ds, ["k"], [])
    with pytest.raises(ValueError, match="collides"):
        unpivot(ds, ["k"], ["a"], var_name="k")
    with pytest.raises(ValueError, match="incompatible"):
        unpivot(rd.from_arrow(
            __import__("pyarrow").table({"k": [1], "a": [1], "s": ["x"]})
        ), ["k"], ["a", "s"])


# ----------------------------------------------------------- latest_by_key
def test_latest_by_key_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import latest_by_key

    rng = np.random.default_rng(21)
    n = 3000
    df = pd.DataFrame({
        "u": rng.integers(0, 80, n).astype("int64"),
        "ts": rng.integers(0, 50, n).astype("int64"),  # many ties
        "eid": np.arange(n, dtype="int64"),
        "v": rng.integers(0, 9, n).astype("int64"),
    })
    got = latest_by_key(
        rd.from_pandas(df).repartition(6), "u", "ts", tiebreak="eid",
        num_partitions=8,
    ).to_pandas().sort_values("u").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT u, ts, eid, v FROM df QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY u ORDER BY ts DESC, eid DESC) = 1 ORDER BY u"
    ).df()
    pd.testing.assert_frame_equal(got[["u", "ts", "eid", "v"]], exp, check_dtype=False)


def test_latest_by_key_null_order_loses(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import latest_by_key

    df = pd.DataFrame({
        "u": np.array([1, 1, 2], dtype="int64"),
        "ts": pd.array([5, None, None], dtype="Int64"),
        "eid": np.array([0, 1, 2], dtype="int64"),
    })
    got = latest_by_key(rd.from_pandas(df), "u", "ts", tiebreak="eid",
                        num_partitions=4).to_pandas().sort_values("u")
    # u=1: non-null ts wins over null; u=2: all-null key still yields a row
    assert got.eid.tolist() == [0, 2]


def test_latest_by_key_multikey_partition_invariance(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import latest_by_key

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "a": rng.integers(0, 5, 500).astype("int64"),
        "b": rng.integers(0, 4, 500).astype("int64"),
        "ts": rng.integers(0, 30, 500).astype("int64"),
        "eid": np.arange(500, dtype="int64"),
    })
    r1 = latest_by_key(rd.from_pandas(df).repartition(2), ["a", "b"], "ts",
                       tiebreak="eid", num_partitions=4).to_pandas()
    r2 = latest_by_key(rd.from_pandas(df).repartition(11), ["a", "b"], "ts",
                       tiebreak="eid", num_partitions=16).to_pandas()
    k = ["a", "b", "ts", "eid"]
    pd.testing.assert_frame_equal(
        r1[k].sort_values(k).reset_index(drop=True),
        r2[k].sort_values(k).reset_index(drop=True),
    )


# ------------------------------------------------------------- explode_list
def test_explode_list_matches_sql_unnest(ray_session):
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import explode_list

    t = pa.table({
        "id": pa.array(np.arange(6, dtype=np.int64)),
        "xs": pa.array([[1, 2, 3], [], None, [7], [8, 9], [10]],
                       pa.list_(pa.int32())),
        "tag": pa.array(list("abcdef")),
    })
    out = explode_list(rd.from_arrow(t).repartition(3), "xs") \
        .to_pandas().sort_values(["id", "idx"]).reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT id, tag, CAST(u.o - 1 AS BIGINT) AS idx, u.x AS xs FROM t, "
        "LATERAL (SELECT unnest(xs) x, generate_subscripts(xs, 1) o) u "
        "ORDER BY id, idx"
    ).df()
    pd.testing.assert_frame_equal(
        out[["id", "tag", "idx", "xs"]], exp, check_dtype=False
    )
    # null + empty lists emit nothing
    assert set(out.id) == {0, 3, 4, 5}
    # keep projection + renames
    out2 = explode_list(
        rd.from_arrow(t), "xs", keep=["id"], idx_name="pos", value_name="v"
    ).to_pandas()
    assert sorted(out2.columns) == ["id", "pos", "v"]
    with pytest.raises(Exception, match="not a list"):
        explode_list(rd.from_arrow(t), "tag").to_pandas()


def test_explode_list_sliced_offsets(ray_session):
    # a sliced ListArray has a non-zero offset into its values buffer;
    # positions and values must still line up
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import explode_list

    base = pa.array([[1, 2], [3], [4, 5, 6], [7]], pa.list_(pa.int64()))
    sl = base.slice(2, 2)  # [[4,5,6],[7]]
    t = pa.table({"id": pa.array([10, 11], pa.int64()), "xs": sl})
    out = explode_list(rd.from_arrow(t), "xs").to_pandas() \
        .sort_values(["id", "idx"]).reset_index(drop=True)
    assert out["xs"].tolist() == [4, 5, 6, 7]
    assert out["idx"].tolist() == [0, 1, 2, 0]


def test_window_rolling_frames_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = _win_df(1500, seed=21)
    # plant nulls: SQL frame aggregates skip them (all-null frame -> NULL)
    df["v"] = df["v"].astype("float64")
    df.loc[df.index % 7 == 0, "v"] = np.nan  # NaN == SQL NULL for both engines
    out = partitioned_window(
        rd.from_pandas(df).repartition(4), "u", ["t", "rid"],
        {
            "rs": ("rolling_sum", "v", 3),
            "rm": ("rolling_mean", "v", 3),
            "rlo": ("rolling_min", "v", 5),
            "rhi": ("rolling_max", "v", 5),
        },
        num_partitions=8,
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    exp = duckdb.sql(
        "SELECT rid, "
        "SUM(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rs, "
        "AVG(v) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rm, "
        "MIN(v) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rlo, "
        "MAX(v) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rhi "
        "FROM df WINDOW w AS (PARTITION BY u ORDER BY t, rid) ORDER BY rid"
    ).df()
    for c in ("rs", "rm", "rlo", "rhi"):
        g = out[c].to_numpy(dtype=np.float64)
        w = exp[c].to_numpy(dtype=np.float64)
        assert np.allclose(np.nan_to_num(g, nan=-1e300),
                           np.nan_to_num(w, nan=-1e300)), c


def test_window_rolling_k1_and_validation(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = _win_df(100, seed=3)
    out = partitioned_window(
        rd.from_pandas(df).repartition(2), "u", ["t", "rid"],
        {"rs": ("rolling_sum", "v", 1)},
    ).to_pandas().sort_values("rid").reset_index(drop=True)
    assert (out["rs"].to_numpy() == df.sort_values("rid")["v"].to_numpy()).all()
    ds = rd.from_pandas(pd.DataFrame({"u": [1], "t": [1], "v": [1]}))
    with pytest.raises(ValueError, match="rolling_sum"):
        partitioned_window(ds, "u", "t", {"x": ("rolling_sum", "v", 0)})
    with pytest.raises(ValueError, match="rolling_mean"):
        partitioned_window(ds, "u", "t", {"x": ("rolling_mean",)})


def test_countsketch_f2_within_bound_of_exact_and_sql():
    """token_f2_exact matches DuckDB bit-exact; token_f2_countsketch's
    F2 estimate lands within the AMS bound of that exact value."""
    import duckdb

    from bloomfilter_multithread_ray.pipelines import analytics as A
    from bloomfilter_multithread_ray.stages import text as T

    exact = A.token_f2_exact(_docs(["text"]), T.make_explode_token_counts_fn())
    sql = duckdb.sql(
        "SELECT CAST(SUM(c * c) AS BIGINT) AS f2, CAST(COUNT(*) AS BIGINT) AS n_distinct "
        "FROM (SELECT tok, count(*) AS c FROM (SELECT unnest(string_split(text, ' ')) AS tok "
        f"FROM read_parquet('{SF}/documents.parquet')) t WHERE tok <> '' GROUP BY tok)"
    ).df()
    assert int(exact["f2"][0]) == int(sql["f2"][0])
    assert int(exact["n_distinct"][0]) == int(sql["n_distinct"][0])

    est = A.token_f2_countsketch(_docs(["text"]), T.make_token_hash_fn())
    f2_true = float(exact["f2"][0])
    # 4x the one-sigma AMS bound sqrt(2/width), median-concentrated
    assert abs(est["f2_estimate"][0] - f2_true) <= 4.0 * est["rel_error_bound"][0] * f2_true
    assert est["n_tokens"][0] > 0 and est["point_err_bound"][0] > 0


def test_join_size_sketch_within_bound_of_exact():
    """join_size_countsketch (AGMS, zero-shuffle) lands within its own
    3-sigma bound of join_size_exact, which itself matches DuckDB."""
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines import analytics as A

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    orders = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    exact = A.join_size_exact(ev, orders, "user_id", "o_custkey")
    want = duckdb.sql(
        f"SELECT COUNT(*) c FROM read_parquet('{SF}/events.parquet') e "
        f"JOIN read_parquet('{SF}/orders.parquet') o ON e.user_id = o.o_custkey"
    ).df()
    assert int(exact["join_size"][0]) == int(want["c"][0])

    est = A.join_size_countsketch(ev, orders, "user_id", "o_custkey")
    true = float(exact["join_size"][0])
    assert abs(est["est_join_size"][0] - true) <= est["err_bound"][0] + 1e-9
    assert est["n_left"][0] == int(exact["n_left"][0])
    assert est["n_right"][0] == int(exact["n_right"][0])


def test_sliding_distinct_hll_within_bound_of_exact():
    """Per-window HLL estimates within the published bound of the
    exact sliding COUNT(DISTINCT); identical window-start sets."""
    import ray.data

    from bloomfilter_multithread_ray.pipelines import analytics as A

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id"])
    exact = A.sliding_distinct_exact(ev, bucket_s=3600, window_buckets=3,
                                     num_partitions=8)
    est = A.sliding_distinct_hll(ev, bucket_s=3600, window_buckets=3, p=14)
    assert list(exact["ws"]) == list(est["ws"])
    true = exact["distinct_users"].to_numpy(dtype=np.float64)
    got = est["estimate"].to_numpy()
    rel = np.abs(got - true) / np.maximum(true, 1.0)
    assert rel.max() <= 3 * float(est["rel_error_bound"][0]) + 0.05


def test_sliding_distinct_exact_planted():
    """Planted multi-bucket users: a user spanning two buckets counts
    once in the window containing both."""
    import pyarrow as pa
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import sliding_distinct_exact

    h = 3600 * 1_000_000  # one bucket in us
    ts = np.array([0, 1, h, h + 5, 2 * h, 5 * h], dtype="datetime64[us]")
    users = pa.array([1, 2, 1, 3, 1, 9], pa.int64())
    t = pa.table({"ts": pa.array(ts), "user_id": users})
    out = sliding_distinct_exact(ray.data.from_arrow(t).repartition(3),
                                 bucket_s=3600, window_buckets=2)
    got = dict(zip(out["ws"], out["distinct_users"]))
    # windows (start bucket s covers s, s+1h):
    # -1h: {1,2}; 0: {1,2,3}; 1h: {1,3}; 2h: {1}; 4h: {9}; 5h: {9}
    assert got == {-3600: 2, 0: 3, 3600: 2, 7200: 1, 14400: 1, 18000: 1}, got


def test_counting_bloom_retract_pipeline_invariants():
    """Zero FN on kept rows, retracted keys at ~live FPR, lineage
    counts exact, partition invariance of the merged counters."""
    import ray.data

    from bloomfilter_multithread_ray.pipelines import analytics as A

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text", "source"])
    out = A.counting_bloom_retract(docs, retract_source="src7")
    r = out.iloc[0]
    assert r["kept_contained"] == r["kept_total"] > 0  # zero FN
    assert r["n_added"] == r["kept_total"] + r["retracted_total"]
    assert r["n_deleted"] == r["retracted_total"] > 0
    assert r["n_live"] == r["kept_total"]
    # retracted (source-prefixed, disjoint) keys ~absent within bound
    assert r["retracted_contained"] <= max(
        3, 3 * r["fpr_bound"] * r["retracted_total"] + 3
    )
    # partition invariance: merged counters independent of block count
    again = A.counting_bloom_retract(docs.repartition(7), retract_source="src7")
    assert again.equals(out)


def test_window_first_last_nth_value_match_duckdb(ray_session):
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    rng = np.random.default_rng(0)
    n = 3000
    df = pd.DataFrame(
        {"g": rng.integers(0, 9, n).astype("int64"),
         "o": rng.integers(0, 40, n).astype("int64"),
         "tb": np.arange(n, dtype="int64"),
         "v": rng.integers(0, 100, n).astype("int64")}
    )
    out = partitioned_window(
        ray.data.from_pandas(df).repartition(4), "g", ["o", "tb"],
        {"fv": ("first_value", "v"), "lv": ("last_value", "v"),
         "n3": ("nth_value", "v", 3)},
        num_partitions=8,
    ).to_pandas().sort_values(["g", "o", "tb"]).reset_index(drop=True)
    want = duckdb.connect().execute(
        """
SELECT g, o, tb, v, FIRST_VALUE(v) OVER w AS fv,
       LAST_VALUE(v) OVER w AS lv, NTH_VALUE(v, 3) OVER w AS n3
FROM df WINDOW w AS (PARTITION BY g ORDER BY o, tb) ORDER BY g, o, tb
"""
    ).df()
    for c in ("fv", "lv", "n3"):
        a = out[c].to_numpy(dtype="float64")
        b = want[c].to_numpy(dtype="float64")
        assert np.allclose(a, b, equal_nan=True), c
    # nth_value n validation
    with pytest.raises(ValueError, match="nth_value"):
        partitioned_window(
            ray.data.from_pandas(df), "g", "o", {"x": ("nth_value", "v", 0)}
        )


def test_window_last_value_peers_under_ties(ray_session):
    """Default SQL frame is RANGE ..- CURRENT ROW: last_value sees the
    whole tie group, not just the current physical row."""
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

    df = pd.DataFrame(
        {"g": [1] * 4, "o": [10, 10, 20, 20], "v": [1, 2, 3, 4]}
    )
    out = partitioned_window(
        ray.data.from_pandas(df), "g", ["o"], {"lv": ("last_value", "v")},
        num_partitions=2,
    ).to_pandas().sort_values(["o", "v"]).reset_index(drop=True)
    want = duckdb.connect().execute(
        "SELECT g, o, v, LAST_VALUE(v) OVER "
        "(PARTITION BY g ORDER BY o) AS lv FROM df ORDER BY o, v"
    ).df()
    assert list(out.lv) == list(want.lv)


def test_sequence_pattern_match_duckdb_and_nulls(ray_session):
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import (
        sequence_pattern_match,
    )

    rng = np.random.default_rng(2)
    n = 3000
    df = pd.DataFrame(
        {"u": rng.integers(0, 150, n).astype("int64"),
         "ts": np.arange(n, dtype="int64"),
         "t": rng.choice(["view", "click", "cart", "purchase"], n)}
    )
    df.loc[df.index[:40], "t"] = None  # null labels skipped like SQL
    df.loc[df.u == 149, "t"] = None    # one ALL-null group -> never matches
    out = sequence_pattern_match(
        ray.data.from_pandas(df).repartition(3), "u", "t", ["ts"],
        r"view( \w+)* purchase", num_partitions=8,
    ).to_pandas().sort_values("u").reset_index(drop=True)
    want = duckdb.connect().execute(
        """
SELECT u, string_agg(t, ' ' ORDER BY ts) AS seq,
  COALESCE(regexp_matches(string_agg(t, ' ' ORDER BY ts),
           'view( \\w+)* purchase'), FALSE) AS matched
FROM df GROUP BY u ORDER BY u
"""
    ).df()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert not bool(out[out.u == 149].matched.iloc[0])


def test_association_stats_planted_independence_and_dependence(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import association_stats

    rng = np.random.default_rng(4)
    n = 30000
    # independent columns: chi2 ~ dof, MI ~ 0, V ~ 0
    ind = pd.DataFrame({"a": rng.choice(list("xyz"), n),
                        "b": rng.choice(list("pqrs"), n)})
    gi = association_stats(ray.data.from_pandas(ind).repartition(3), "a", "b")
    assert gi.dof[0] == 6
    assert gi.chi2[0] < 30 and abs(gi.mi[0]) < 0.002 and gi.cramers_v[0] < 0.05
    # perfectly dependent: V == 1, MI == entropy of a
    dep = pd.DataFrame({"a": rng.choice(list("xyz"), n)})
    dep["b"] = dep.a.str.upper()
    gd = association_stats(ray.data.from_pandas(dep).repartition(3), "a", "b")
    assert abs(gd.cramers_v[0] - 1.0) < 1e-9
    p = dep.a.value_counts(normalize=True).to_numpy()
    assert abs(gd.mi[0] - float(-(p * np.log(p)).sum())) < 1e-6
    # nulls in either column are excluded from n
    wn = pd.DataFrame({"a": ["x", None, "y"], "b": ["p", "q", None]})
    g3 = association_stats(ray.data.from_pandas(wn), "a", "b")
    assert g3.n[0] == 1
    # all-null -> NaN row
    g4 = association_stats(
        ray.data.from_pandas(pd.DataFrame({"a": [None], "b": [None]})), "a", "b"
    )
    assert g4.n[0] == 0 and np.isnan(g4.chi2[0])


def test_grouped_quantile_cont_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import (
        grouped_quantile_cont,
    )

    rng = np.random.default_rng(0)
    n = 20000
    df = pd.DataFrame({"g": rng.integers(0, 25, n).astype("int64"),
                       "v": np.round(rng.normal(50, 12, n), 3)})
    df.loc[df.index[:400], "v"] = None
    # group 30: one row (reduces to the value); group 31: two rows
    df = pd.concat([df, pd.DataFrame({"g": [30, 31, 31], "v": [7.5, 1.0, 2.0]})])
    for q in (0.0, 0.25, 0.9, 1.0):
        got = grouped_quantile_cont(
            ray.data.from_pandas(df).repartition(4), "g", "v", q
        )
        want = duckdb.connect().execute(
            f"SELECT g, ROUND(quantile_cont(v, {q}), 6) AS value FROM df "
            "WHERE v IS NOT NULL GROUP BY g ORDER BY g"
        ).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    with pytest.raises(ValueError, match="q must be"):
        grouped_quantile_cont(ray.data.from_pandas(df), "g", "v", 1.5)


def test_grouped_mode_ties_nulls_partitionings(ray_session):
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_mode

    rng = np.random.default_rng(1)
    n = 15000
    df = pd.DataFrame({"g": rng.integers(0, 40, n).astype("int64"),
                       "v": rng.choice(["a", "b", "c", None], n)})
    # planted exact tie: group 99 has b and a twice each -> mode 'a'
    df = pd.concat([df, pd.DataFrame({"g": [99] * 4, "v": ["b", "a", "b", "a"]})])
    want = duckdb.connect().execute(
        """
WITH c AS (SELECT g, v, COUNT(*) AS n FROM df WHERE v IS NOT NULL GROUP BY g, v),
r AS (SELECT g, v, n, ROW_NUMBER() OVER (PARTITION BY g ORDER BY n DESC, v) AS rn FROM c)
SELECT g, v AS mode, CAST(n AS BIGINT) AS mode_count FROM r WHERE rn = 1 ORDER BY g
"""
    ).df()
    for P, blocks in ((4, 2), (16, 6)):
        got = (
            grouped_mode(ray.data.from_pandas(df).repartition(blocks), "g", "v",
                         num_partitions=P)
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert want[want.g == 99]["mode"].iloc[0] == "a"  # tie pinned


def test_grouped_entropy_matches_duckdb_and_edges(ray_session):
    import duckdb
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import grouped_entropy

    rng = np.random.default_rng(3)
    n = 15000
    df = pd.DataFrame({"g": rng.integers(0, 25, n).astype("int64"),
                       "v": rng.choice(["a", "b", "c", None], n)})
    # planted: single-valued group (H=0) and 4-way uniform (H=ln 4)
    df = pd.concat([df, pd.DataFrame({"g": [90] * 5, "v": ["z"] * 5}),
                    pd.DataFrame({"g": [91] * 4, "v": ["a", "b", "c", "d"]})])
    want = duckdb.connect().execute(
        """
WITH c AS (SELECT g, v, COUNT(*)::DOUBLE AS c FROM df WHERE v IS NOT NULL GROUP BY g, v),
t AS (SELECT g, SUM(c) AS n FROM c GROUP BY g)
SELECT g, CAST(t.n AS BIGINT) AS n, ROUND(-SUM((c/t.n) * LN(c/t.n)), 6) AS entropy
FROM c JOIN t USING (g) GROUP BY g, t.n ORDER BY g
"""
    ).df()
    for blocks in (1, 5):
        got = (
            grouped_entropy(ray.data.from_pandas(df).repartition(blocks), "g", "v")
            .to_pandas().sort_values("g").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert float(want[want.g == 90].entropy.iloc[0]) == 0.0
    assert abs(float(want[want.g == 91].entropy.iloc[0]) - np.log(4)) < 1e-6


def test_weighted_sample_by_group_deterministic_and_proportional(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.analytics import (
        weighted_sample_by_group,
    )

    rng = np.random.default_rng(0)
    n = 6000
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b", "c"], n),
         "id": np.arange(n, dtype=np.int64),
         "w": rng.integers(0, 10, n).astype("float64")}
    )
    outs = [
        weighted_sample_by_group(
            ray.data.from_pandas(df).repartition(b), "g", "w", id_col="id",
            k=4, seed=3,
        )
        for b in (1, 7)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])  # partition-independent
    assert (outs[0].groupby("g").size() == 4).all()
    assert (outs[0].w > 0).all()  # zero-weight rows never sampled
    # inclusion frequency tracks weight: across seeds, heavy ids appear
    # far more often than light ids within a group
    heavy = df[(df.g == "a") & (df.w >= 8)].id
    light = df[(df.g == "a") & (df.w == 1)].id
    hc = lc = 0
    for s in range(40):
        samp = weighted_sample_by_group(
            ray.data.from_pandas(df), "g", "w", id_col="id", k=4, seed=s
        )
        got = set(samp[samp.g == "a"].id)
        hc += len(got & set(heavy))
        lc += len(got & set(light))
    assert hc > 3 * max(lc, 1)


# ------------------------------------------------- event-time watermark
def test_with_watermark_planted_lateness(ray_session):
    """Exact streaming replay: watermark at arrival i = max(ts over
    arrivals < i) - lateness; the planted out-of-order rows land in
    the side channel, everything else stays on time, and the split is
    invariant to input partitioning."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import with_watermark

    # arrivals 0..9; ts in hours: monotone except planted stale rows
    hrs = [0, 1, 2, 3, 1, 5, 6, 2, 8, 9]  # idx 4 (1 < 3-L?) and 7 (2 < 6-L?)
    H = 3_600_000_000
    df = pd.DataFrame(
        {"event_id": np.arange(10, dtype=np.int64),
         "ts": np.array([h * H for h in hrs], np.int64),
         "v": np.arange(10, dtype=np.int64)}
    )
    for lat_h, want_late in ((1, {4, 7}), (2, {7}), (4, set())):
        for blocks in (1, 3, 7):
            ds = rd.from_pandas(df).repartition(blocks)
            on_time, late = with_watermark(
                ds, ts_col="ts", arrival_col="event_id",
                lateness_us=lat_h * H, n_buckets=4,
            )
            lt = late.to_pandas()
            ot = on_time.to_pandas()
            # Ray drops the schema of all-empty datasets (known
            # gotcha): an empty late frame has no columns to index
            got_late = set(lt["event_id"]) if len(lt) else set()
            assert got_late == want_late, (lat_h, blocks)
            assert set(ot["event_id"]) == set(range(10)) - want_late
            # side channel carries the watermark each row lost to
            for _, r in lt.iterrows():
                prev_max = max(h for i, h in enumerate(hrs)
                               if i < r["event_id"]) * H
                assert r["watermark_us"] == prev_max - lat_h * H
                assert r["ts"] < r["watermark_us"]


def test_with_watermark_first_row_never_late(ray_session):
    """Empty prefix -> watermark undefined -> on time, even for an
    ancient timestamp in arrival position 0 (the epoch-outlier case)."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import with_watermark

    df = pd.DataFrame(
        {"event_id": np.array([10, 11, 12], np.int64),
         "ts": np.array([5, 1_000_000_000_000, 1_000_000_000_001], np.int64)}
    )
    on_time, late = with_watermark(
        ds=rd.from_pandas(df), ts_col="ts", arrival_col="event_id",
        lateness_us=10,
    )
    assert set(on_time.to_pandas()["event_id"]) == {10, 11, 12}
    assert len(late.to_pandas()) == 0


def test_hopping_window_agg_watermarked_matches_manual(ray_session):
    """The gated hopping aggregate == hopping over the manually
    filtered on-time rows; late rows never contaminate any window."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import (
        hopping_window_agg, hopping_window_agg_watermarked,
    )

    H = 100
    rng = np.random.default_rng(2)
    n = 400
    ts = np.sort(rng.integers(0, 40 * H, size=n))
    # plant staleness on ~10% of arrivals
    stale = rng.random(n) < 0.1
    ts = ts - stale * (3 * H)
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64),
         "ts": ts.astype(np.int64), "v": rng.integers(0, 100, n)}
    )
    win, late = hopping_window_agg_watermarked(
        rd.from_pandas(df).repartition(5),
        {"n": ("count", None), "sv": ("sum", "v")},
        ts_col="ts", arrival_col="event_id", lateness_us=2 * H,
        window_us=2 * H, hop_us=H,
    )
    got = win.to_pandas().sort_values("window_us").reset_index(drop=True)
    # manual gate on the prefix identity
    pm = np.concatenate([[np.iinfo(np.int64).min],
                         np.maximum.accumulate(df["ts"].to_numpy())[:-1]])
    is_late = (pm != np.iinfo(np.int64).min) & (df["ts"].to_numpy() < pm - 2 * H)
    manual = hopping_window_agg(
        rd.from_pandas(df[~is_late]),
        {"n": ("count", None), "sv": ("sum", "v")},
        ts_col="ts", window_us=2 * H, hop_us=H,
    ).to_pandas().sort_values("window_us").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, manual)
    assert set(late.to_pandas()["event_id"]) == set(
        df["event_id"].to_numpy()[is_late])
    assert is_late.sum() > 5  # the fixture really plants late rows


def test_with_watermark_refuses_duplicate_arrivals(ray_session):
    """Ties in the arrival column would make the prefix identity
    depend on physical row order — loud refusal, not silent
    nondeterminism (same arrival always hashes to the same bucket, so
    the per-bucket check is complete)."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import with_watermark

    df = pd.DataFrame(
        {"event_id": np.array([1, 2, 2, 3], np.int64),
         "ts": np.array([10, 20, 30, 40], np.int64)}
    )
    with pytest.raises(Exception, match="unique"):
        with_watermark(
            rd.from_pandas(df), ts_col="ts", arrival_col="event_id",
            lateness_us=5,
        )


# ----------------------------------------- round-5 NULL/empty hardening
def test_lag_default_fills_only_out_of_frame(ray_session):
    """SQL LAG(col, 1, default): the default applies only when the
    offset row is OUTSIDE the partition; an existing offset row whose
    value is NULL stays NULL."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import (
        partitioned_window,
    )

    df = pd.DataFrame(
        {"g": ["a"] * 3, "o": [1, 2, 3],
         "v": pd.array([1.0, None, 3.0], dtype="float64")}
    )
    out = partitioned_window(
        rd.from_pandas(df), "g", "o", {"x": ("lag", "v", 1, -99.0)},
    ).to_pandas().sort_values("o")
    assert out["x"].iloc[0] == -99.0          # out of frame -> default
    assert pd.isna(out["x"].iloc[2])          # offset row exists, NULL
    assert out["x"].iloc[1] == 1.0


def test_pivot_null_index_and_category_survive(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import pivot

    df = pd.DataFrame(
        {"k": ["x", "x", None, "y"],
         "p": ["a", None, "a", "b"],
         "v": np.array([1, 2, 3, 4], np.int64)}
    )
    out = pivot(rd.from_pandas(df), "k", "p", "v").to_pandas()
    out = out.sort_values("k", na_position="last").reset_index(drop=True)
    # NULL pivot category discovered (sorted last), NULL index row kept
    assert list(out.columns) == ["k", "a", "b", "None"]
    assert len(out) == 3
    row_x = out[out["k"] == "x"].iloc[0]
    assert (row_x["a"], row_x["b"], row_x["None"]) == (1, 0, 2)
    row_null = out[out["k"].isna()].iloc[0]
    assert row_null["a"] == 3


def test_grouped_quantiles_exact_ignores_nulls(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import (
        grouped_quantiles_exact,
    )

    df = pd.DataFrame(
        {"g": ["a"] * 3 + ["b"],
         "v": pd.array([1.0, 2.0, None, None], dtype="float64")}
    )
    out = grouped_quantiles_exact(rd.from_pandas(df), "v", "g")
    a = out[out["g"] == "a"].iloc[0]
    assert a["p50"] == 1.5          # NULL ignored, like quantile_cont
    assert np.isnan(out[out["g"] == "b"].iloc[0]["p50"])  # all-null


def test_empty_input_reports(ray_session):
    """Empty datasets produce typed zero/empty reports, not crashes."""
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.analytics import (
        token_f2_exact,
    )

    from bloomfilter_multithread_ray.stages.text import (
        make_explode_token_counts_fn,
    )

    empty_docs = rd.from_pandas(pd.DataFrame(
        {"doc_id": pd.Series(dtype=np.int64),
         "text": pd.Series(dtype=object)}))
    f2 = token_f2_exact(empty_docs, make_explode_token_counts_fn())
    assert f2["f2"].iloc[0] == 0 and f2["n_distinct"].iloc[0] == 0
