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


# ---------------------------------------------------------- CDC dedup
def _seq_cdc_chunks(text, mn=16, bits=5, mx=128):
    """Sequential from-spec Gear CDC for one doc → [(hash, len, off)]."""
    import bisect

    from bloomfilter_multithread_ray.functions.hashing import splitmix64

    GEAR = splitmix64(np.arange(1, 257, dtype=np.uint64))
    B, M = 0x9E3779B97F4A7C15, 1 << 64
    bs = text.encode()
    h, cand = 0, []
    for i, b in enumerate(bs):
        h = ((h << 1) + int(GEAR[b])) % M
        if (h & ((1 << bits) - 1)) == 0:
            cand.append(i)
    out, s, n = [], 0, len(bs)
    while s < n:
        limit = min(s + mx - 1, n - 1)
        lo = bisect.bisect_left(cand, s + mn - 1)
        c = cand[lo] if lo < len(cand) else None
        cut = c if (c is not None and c <= limit) else limit
        hh = 0
        for t in range(s, cut + 1):
            hh = (hh * B + bs[t] + 1) % M
        out.append((int(splitmix64(np.uint64(hh))), cut - s + 1, s))
        s = cut + 1
    return out


def _cdc_corpus():
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    docs = [(i, " ".join(rng.choice(words, rng.integers(5, 60))), f"s{i % 3}")
            for i in range(60)]
    docs.append((100, docs[0][1], "s0"))                      # full dup
    docs.append((101, "xxxx yyyy " + docs[1][1] + " zzzz", "s1"))  # shared span
    return pd.DataFrame(docs, columns=["doc_id", "text", "source"])


def test_cdc_matches_sequential_reference_and_finds_planted_dups(ray_session):
    from bloomfilter_multithread_ray.pipelines.dedup import cdc_chunk_stats

    df = _cdc_corpus()
    out = cdc_chunk_stats(lambda: ray.data.from_pandas(df).repartition(5))

    # sequential reference over the same spec
    inst = []
    for _, row in df.sort_values("doc_id").iterrows():
        for (ch, cl, off) in _seq_cdc_chunks(row.text):
            inst.append((ch, cl, int(row.doc_id) * (1 << 21) + off, row.source))
    inst.sort()
    seen, stats = set(), {}
    for ch, cl, ok, src in inst:
        st = stats.setdefault(src, [0, 0, 0, 0])
        st[0] += 1
        st[1] += cl
        if (ch, cl) in seen:
            st[2] += 1
            st[3] += cl
        else:
            seen.add((ch, cl))
    ref = pd.DataFrame([(k, *v) for k, v in sorted(stats.items())],
                       columns=out.columns)
    for c in ref.columns[1:]:
        ref[c] = ref[c].astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)

    # the full-dup doc (s0) and the shared middle span (s1) are seen
    assert out.set_index("source").loc["s0", "n_dup_chunks"] > 0
    assert out.set_index("source").loc["s1", "bytes_dup"] > 0

    # chunk invariants on the reference: chunks tile each doc, lengths
    # within [1, max]; all non-final chunks >= min or forced at max
    for _, row in df.iterrows():
        ch = _seq_cdc_chunks(row.text)
        assert sum(c[1] for c in ch) == len(row.text.encode())
        offs = [c[2] for c in ch]
        assert offs == sorted(offs) and offs[0] == 0
        for h, ln, off in ch[:-1]:
            assert 16 <= ln <= 128
        assert ch[-1][1] <= 128


def test_cdc_partition_invariance(ray_session):
    from bloomfilter_multithread_ray.pipelines.dedup import cdc_chunk_stats

    df = _cdc_corpus()
    a = cdc_chunk_stats(lambda: ray.data.from_pandas(df).repartition(3))
    b = cdc_chunk_stats(lambda: ray.data.from_pandas(df).repartition(13),
                        num_partitions=7)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------- k-center
def test_kcenter_covers_planted_clusters_and_stops_at_n(ray_session):
    from bloomfilter_multithread_ray.pipelines.similarity import kcenter_select

    rng = np.random.default_rng(9)
    # 4 well-separated orthogonal-ish clusters in 8-d
    centers = np.eye(4, 8) * 10
    rows = []
    for i in range(80):
        c = i % 4
        rows.append((i, (centers[c] + rng.normal(0, 0.05, 8)).astype(np.float32)))
    df = pd.DataFrame({"vec_id": [r[0] for r in rows],
                       "embedding": [[float(x) for x in r[1]] for r in rows]})
    out = kcenter_select(ray.data.from_pandas(df), k=4)
    # the 4 selections land in 4 distinct clusters (farthest-point
    # property) and selection distances are non-increasing
    assert sorted(v % 4 for v in out["vec_id"]) == [0, 1, 2, 3]
    d = out["dist_q"].to_numpy()[1:]
    assert (np.diff(d) <= 0).all()

    # k > n stops after n selections, every point chosen exactly once
    small = df.head(5)
    out2 = kcenter_select(ray.data.from_pandas(small), k=50)
    assert len(out2) == 5
    assert sorted(out2["vec_id"]) == sorted(small["vec_id"])

    # block-structure invariance
    out3 = kcenter_select(ray.data.from_pandas(df).repartition(9), k=4,
                          max_blocks=3)
    pd.testing.assert_frame_equal(out, out3)


# ------------------------------------------------------------- CUSUM
def _cusum_ref(df, k_milli=250, h_milli=2000):
    """Independent reference using the CLASSIC recursion
    s_t = max(0, s_{t-1} + x_t - mu - k) in exact Fraction arithmetic
    (proves the engine's prefix identity against the textbook form)."""
    from fractions import Fraction

    d = df.dropna(subset=["value"]).copy()
    xm = np.trunc(d["value"].to_numpy() * 1e3
                  + np.copysign(0.5, d["value"].to_numpy())).astype(np.int64)
    d["xm"] = xm
    N = len(d)
    mu = Fraction(int(xm.sum()), N)  # exact global mean (milli-units)
    out = {}
    for uid, g in d.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        s = Fraction(0)
        smax = Fraction(0)
        first = 0
        for t, x in enumerate(g["xm"], start=1):
            s = max(Fraction(0), s + x - mu - k_milli)
            smax = max(smax, s)
            if first == 0 and s > h_milli:
                first = t
        q = float(Fraction(int(round(smax * N)), 1)) / (1000.0 * N)
        out[uid] = (len(g), first,
                    int(np.trunc(q * 1e6 + 0.5)) / 1e6)
    return out


def test_cusum_matches_classic_recursion(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    mins = np.timedelta64(1, "m")
    rng = np.random.default_rng(5)
    rows = []
    eid = 0
    # the CUSUM target is the GLOBAL mean, so the fixture balances:
    # u1 shifts +25 exactly where u3 shifts -25, keeping the global
    # mean at the shared 50.0 baseline; noise sigma=0.1 stays well
    # inside the k=0.25 allowance so no-drift users cannot
    # random-walk over h=2.0
    for i in range(80):  # user 1: level shift UP at t=41 -> alerts
        v = 50.0 + (25.0 if i >= 40 else 0.0) + rng.normal(0, 0.1)
        rows.append((eid, t0 + i * mins, 1, v)); eid += 1
    for i in range(80):  # user 2: stable at the global mean -> quiet
        rows.append((eid, t0 + i * mins, 2, 50.0 + rng.normal(0, 0.1)))
        eid += 1
    for i in range(80):  # user 3: DOWN shift -> one-sided stays quiet
        v = 50.0 - (25.0 if i >= 40 else 0.0) + rng.normal(0, 0.1)
        rows.append((eid, t0 + i * mins, 3, v)); eid += 1
    # user 4: one null value (dropped row)
    rows.append((eid, t0, 4, np.nan)); eid += 1
    rows.append((eid, t0 + mins, 4, 50.0)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    df = df.astype({"event_id": np.int64, "user_id": np.int64})

    ref = _cusum_ref(df)
    for blocks in (1, 7):
        out = A.grouped_cusum_alerts(
            lambda b=blocks: ray.data.from_pandas(df).repartition(b))
        got = {int(r.user_id): (int(r.n_events), int(r.first_alert), r.smax)
               for r in out.itertuples()}
        assert got == ref
    g1 = ref[1]
    assert 40 < g1[1] <= 45  # alert fires right after the level shift
    assert ref[2][1] == 0 and ref[3][1] == 0
    assert ref[4][0] == 1  # null row dropped


def test_cusum_empty_and_all_null(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    df = pd.DataFrame({"event_id": pd.array([1, 2], dtype=np.int64),
                       "ts": [np.datetime64("2024-01-01", "us")] * 2,
                       "user_id": pd.array([1, 2], dtype=np.int64),
                       "value": [np.nan, np.nan]})
    out = A.grouped_cusum_alerts(lambda: ray.data.from_pandas(df))
    assert out.empty
    assert list(out.columns) == ["user_id", "n_events", "first_alert", "smax"]


# ------------------------------------------------------ Markov chain
def test_markov_cycle_and_two_state(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows, eid = [], 0
    # user 1: deterministic cycle a->b->c->a ... => pi uniform(1/3)
    seq = ["a", "b", "c"] * 20 + ["a"]
    for i, et in enumerate(seq):
        rows.append((eid, t0 + i * s, 1, et)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df = df.astype({"event_id": np.int64, "user_id": np.int64})
    out = A.event_type_markov(lambda: ray.data.from_pandas(df))
    assert out["event_type"].tolist() == ["a", "b", "c"]
    assert np.allclose(out["pi"], 1 / 3, atol=1e-6)
    # transition counts: a->b 20, b->c 20, c->a 20 (the final 'a' is
    # only ever a destination)
    assert out["out_transitions"].tolist() == [20, 20, 20]

    # two-state chain x->x 3/4, x->y 1/4; y->x always:
    # pi = (p_yx, p_xy)/(p_xy+p_yx) = (0.8, 0.2)
    rows2, eid = [], 0
    seq2 = (["x", "x", "x", "x", "y"] * 40)[:-1] + ["x"]
    for i, et in enumerate(seq2):
        rows2.append((eid, t0 + i * s, 7, et)); eid += 1
    df2 = pd.DataFrame(rows2, columns=["event_id", "ts", "user_id",
                                       "event_type"])
    df2 = df2.astype({"event_id": np.int64, "user_id": np.int64})
    out2 = A.event_type_markov(lambda: ray.data.from_pandas(df2))
    got = dict(zip(out2["event_type"], out2["pi"]))
    assert abs(got["x"] - 0.8) < 0.01 and abs(got["y"] - 0.2) < 0.01


def test_markov_dangling_type_and_invariance(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-03-01T00:00:00", "us")
    s = np.timedelta64(1, "s")
    rows, eid = [], 0
    # type 'z' is always terminal (every user ends on it, never
    # followed) -> dangling uniform row; chain still sums to 1
    for u in range(5):
        for i, et in enumerate(["a", "b", "a", "b", "z"]):
            rows.append((eid, t0 + i * s, u, et)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type"])
    df = df.astype({"event_id": np.int64, "user_id": np.int64})
    outs = []
    for blocks in (1, 7):
        out = A.event_type_markov(
            lambda b=blocks: ray.data.from_pandas(df).repartition(b))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    out = outs[0]
    z = out[out.event_type == "z"].iloc[0]
    assert int(z.out_transitions) == 0
    assert abs(out["pi"].sum() - 1.0) < 1e-6
    assert z.pi > 0.1  # dangling mass recirculates, z is reachable


# --------------------------------------------------- decile profile
def test_decile_profile_exact_buckets(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    # 100 values 0..99 across 2 types; exact deciles of 0..99 put
    # exactly 10 values in each bucket
    df = pd.DataFrame({
        "event_type": ["a" if i % 2 == 0 else "b" for i in range(100)],
        "value": [float(i) for i in range(100)],
    })
    out = A.value_decile_profile(lambda: ray.data.from_pandas(df))
    # PERCENTILE_DISC boundaries BELONG to the upper bucket: b_k is
    # the ceil(k n/10)-th smallest, so bucket 0 holds the 9 values
    # below b_1 and bucket 9 the 11 values >= b_9
    total = out.groupby("bucket")["n"].sum()
    assert total.tolist() == [9] + [10] * 8 + [11]
    # independent recomputation per (type, bucket) from the convention
    xs = np.sort(np.trunc(df["value"].to_numpy() * 1e3 + 0.5).astype(np.int64))
    bounds = [xs[(k * len(xs) + 9) // 10 - 1] for k in range(1, 10)]
    exp = {}
    for et, v in zip(df["event_type"], df["value"]):
        b = sum(int(v * 1000) >= bk for bk in bounds)
        exp[(et, b)] = exp.get((et, b), 0) + 1
    got = {(r.event_type, int(r.bucket)): int(r.n) for r in out.itertuples()}
    assert got == exp

    # independent check of the boundary convention: b_k = element at
    # ceil(k*n/10)-1 of the sorted quantized values
    xs = np.sort(np.trunc(df["value"].to_numpy() * 1e3 + 0.5).astype(np.int64))
    for k in range(1, 10):
        bk = xs[(k * len(xs) + 9) // 10 - 1]
        assert bk == k * 10_000 - 1_000  # 0..99 -> b_k = (10k-1) * 1000


def test_decile_profile_skew_ties_nulls_invariance(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    rng = np.random.default_rng(13)
    v = np.where(rng.random(500) < 0.1, np.nan,
                 np.round(rng.normal(50, 5, 500), 1))
    v[:200] = 42.0  # heavy tie mass straddling several deciles
    df = pd.DataFrame({
        "event_type": rng.choice(["x", "y", "z"], 500),
        "value": v,
    })
    a = A.value_decile_profile(lambda: ray.data.from_pandas(df).repartition(3))
    b = A.value_decile_profile(
        lambda: ray.data.from_pandas(df).repartition(17), num_partitions=5)
    pd.testing.assert_frame_equal(a, b)
    # nulls dropped: totals equal the non-null count
    assert a["n"].sum() == int((~np.isnan(v)).sum())
    # tie mass collapses several buckets to empty -- bucket ids jump,
    # confirming the sum-of-indicators rule (not NTILE rebalancing)
    assert a["bucket"].nunique() < 10


# --------------------------------------------------------------- RFM
def test_rfm_planted_segments(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    d0 = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    rows = []
    # 4 customers, engineered so every quartile boundary is obvious:
    # cust 1: 1 order day 0, 10.00      -> coldest, rarest, poorest
    # cust 2: 2 orders last day 10, 20  -> mid
    # cust 3: 3 orders last day 20, 30
    # cust 4: 4 orders last day 30, 40  -> hottest, most frequent, richest
    oid = 0
    for c, (n, last, price) in enumerate(
            [(1, 0, 10.0), (2, 10, 20.0), (3, 20, 30.0), (4, 30, 40.0)],
            start=1):
        for j in range(n):
            rows.append((oid, c, d0 + (last - j) * day, price)); oid += 1
    df = pd.DataFrame(rows, columns=["o_orderkey", "o_custkey",
                                     "o_orderdate", "o_totalprice"])
    df = df.astype({"o_orderkey": np.int64, "o_custkey": np.int64})
    out = A.customer_rfm_segments(lambda: ray.data.from_pandas(df))

    # independent recomputation from the spec
    pc = {}
    gmax = df["o_orderdate"].max()
    for c, g in df.groupby("o_custkey"):
        r = int((gmax - g["o_orderdate"].max()) / day)
        f = len(g)
        m = int(np.trunc(g["o_totalprice"] * 100 + 0.5).sum())
        pc[c] = (r, f, m)
    def qs(vals):
        xs = np.sort(np.array(vals)); n = len(xs)
        return [xs[(k * n + 3) // 4 - 1] for k in (1, 2, 3)]
    qr, qf, qm = (qs([v[i] for v in pc.values()]) for i in range(3))
    exp = {}
    for c, (r, f, m) in pc.items():
        seg = (100 * (1 + sum(r >= b for b in qr))
               + 10 * (1 + sum(f >= b for b in qf))
               + (1 + sum(m >= b for b in qm)))
        n, mt = exp.get(seg, (0, 0))
        exp[seg] = (n + 1, mt + m)
    want = pd.DataFrame(
        [(s, n, mt / 100.0) for s, (n, mt) in sorted(exp.items())],
        columns=["segment", "n_customers", "monetary_total"])
    want = want.astype({"segment": np.int64, "n_customers": np.int64})
    pd.testing.assert_frame_equal(out, want)
    # cust 4 (most recent, frequent, rich): r scores LOW (1? r=0 below
    # no boundary only if 0 < all b) — verify the extremes explicitly
    seg4 = (100 * (1 + sum(0 >= b for b in qr))
            + 10 * (1 + sum(4 >= b for b in qf))
            + (1 + sum(16000 >= b for b in qm)))
    assert seg4 in out["segment"].tolist()


def test_rfm_partition_invariance(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    rng = np.random.default_rng(21)
    d0 = np.datetime64("2024-01-01T00:00:00", "us")
    n = 600
    df = pd.DataFrame({
        "o_orderkey": np.arange(n, dtype=np.int64),
        "o_custkey": rng.integers(1, 80, n).astype(np.int64),
        "o_orderdate": d0 + rng.integers(0, 400, n) * np.timedelta64(1, "D"),
        "o_totalprice": np.round(rng.uniform(10, 5000, n), 2),
    })
    a = A.customer_rfm_segments(lambda: ray.data.from_pandas(df).repartition(3))
    b = A.customer_rfm_segments(
        lambda: ray.data.from_pandas(df).repartition(17), num_partitions=5)
    pd.testing.assert_frame_equal(a, b)
    assert a["n_customers"].sum() == df["o_custkey"].nunique()


# ------------------------------------------------------------ Benford
def test_benford_digit_extraction_and_expectation(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    # amounts chosen to hit digit-extraction edges: powers of ten in
    # cents (1.00 -> 100 -> digit 1; 0.01 -> 1 -> digit 1; 9.99 ->
    # 999 -> digit 9), plus negatives/nulls dropped
    vals = [1.00, 0.01, 9.99, 100.00, 999.99, 0.10, 55.5,
            -3.0, np.nan, 0.0, 10.0, 123.45, 2.0, 30.0]
    df = pd.DataFrame({"o_totalprice": vals})
    out = A.benford_digit_audit(lambda: ray.data.from_pandas(df))
    obs = dict(zip(out["digit"], out["n"]))
    # cents: 100,1,999,10000,99999,10,5550,1000,12345,200,3000
    # digits: 1,1,9,1,9,1,5,1,1,2,3
    assert obs == {1: 6, 2: 1, 3: 1, 4: 0, 5: 1, 6: 0, 7: 0, 8: 0, 9: 2}
    n = sum(obs.values())
    for r in out.itertuples():
        e = n * np.log10(1 + 1 / r.digit)
        assert abs(r.expected - e) < 1e-6
        assert abs(r.dev - (r.n - e) ** 2 / e) < 2e-6
    assert len(out) == 9  # all digits present even at count 0


def test_benford_conforming_distribution_scores_low(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    rng = np.random.default_rng(17)
    # log-uniform amounts follow Benford closely
    v = np.exp(rng.uniform(np.log(1), np.log(10000), 20000))
    ben = A.benford_digit_audit(
        lambda: ray.data.from_pandas(pd.DataFrame({"o_totalprice": v})))
    # uniform amounts violate it badly
    u = rng.uniform(100, 1000, 20000)
    uni = A.benford_digit_audit(
        lambda: ray.data.from_pandas(pd.DataFrame({"o_totalprice": u})))
    assert ben["dev"].sum() < 30 < uni["dev"].sum()


# ------------------------------------------------------ t-digest CDF
def test_tdigest_cdf_convention_and_accuracy(ray_session):
    from bloomfilter_multithread_ray.state.tdigest import TDigest

    rng = np.random.default_rng(23)
    v = rng.normal(100, 15, 50_000)
    t = TDigest()
    t.update_values(v)
    xs = np.array([40.0, 70.0, 85.0, 100.0, 115.0, 130.0, 200.0])
    got = t.cdf(xs)
    exact = np.searchsorted(np.sort(v), xs, side="right") / len(v)
    assert np.abs(got - exact).max() < 0.01
    # clamps: below exact min -> 0, above exact max -> 1, monotone
    assert t.cdf(float(v.min()) - 1) == 0.0
    assert t.cdf(float(v.max()) + 1) == 1.0
    assert (np.diff(t.cdf(np.linspace(40, 200, 50))) >= 0).all()
    # quantile/cdf near-inverse in the bulk
    for q in (0.1, 0.5, 0.9):
        assert abs(t.cdf(t.quantile(q)) - q) < 0.01


def test_value_cdf_profile_matches_indep_and_separates(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A
    from independent_pipelines import indep_events_cdf_profile

    rng = np.random.default_rng(29)
    n = 6000
    et = rng.choice(["low", "mid", "high"], n)
    v = np.where(et == "low", rng.normal(20, 5, n),
                 np.where(et == "mid", rng.normal(50, 5, n),
                          rng.normal(80, 5, n)))
    v[rng.random(n) < 0.03] = np.nan
    df = pd.DataFrame({"event_type": et, "value": v})
    ds = ray.data.from_pandas(df)
    nb = ds.repartition(4)
    out = A.value_cdf_profile(nb)
    ref = indep_events_cdf_profile(et, v, n_blocks=4)
    pd.testing.assert_frame_equal(out, ref)
    m = dict(zip(out["event_type"], out["mean_cdf"]))
    assert m["low"] < 0.3 < 0.45 < m["mid"] < 0.55 < 0.7 < m["high"]
    assert out["n"].sum() == int((~np.isnan(v)).sum())
