"""Round-4 wave-3 operators: time-decayed activity, k-anonymity audit,
PSI drift, rendezvous (HRW) sharding — independent re-derivations +
partition invariance + the operators' defining properties."""

import numpy as np
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def _events(cols, blocks=None):
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=cols)
    if blocks:
        ds = ds.repartition(blocks)
    return ds


# --------------------------------------------------- decayed activity
def test_decayed_activity_reference_parity_and_partitioning(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    got = A.decayed_activity(
        lambda: _events(["ts", "user_id", "value"]), half_life_days=1, topk=100
    )
    got2 = A.decayed_activity(
        lambda: _events(["ts", "user_id", "value"], blocks=7),
        half_life_days=1, topk=100, num_partitions=5,
    )
    pd.testing.assert_frame_equal(got, got2)

    # independent single-process re-derivation
    df = pd.read_parquet(f"{SF}/events.parquet", columns=["ts", "user_id", "value"])
    df = df[df["value"].notna()].copy()
    ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    t_max = ts.max()
    age = (t_max - ts) // 86_400_000_000
    u = df["value"].to_numpy() * np.power(0.5, age.astype(float)) * 1e6
    q = np.trunc(u + np.copysign(0.5, u)).astype(np.int64)
    ref = (
        pd.DataFrame({"user_id": df["user_id"].to_numpy(), "qv": q})
        .groupby("user_id")
        .agg(score_q=("qv", "sum"), n_events=("qv", "size"))
        .reset_index()
        .sort_values(["score_q", "user_id"], ascending=[False, True])
        .head(100)
        .reset_index(drop=True)
    )
    ref["n_events"] = ref["n_events"].astype(np.int64)
    pd.testing.assert_frame_equal(got, ref)


def test_decayed_activity_decay_property(ray_session):
    """A newer event of equal value must contribute strictly more than
    an event ≥ one half-life older (monotone freshness weighting)."""
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-01-10T00:00:00", "us")
    df = pd.DataFrame(
        {
            "ts": [t0, t0 - np.timedelta64(3, "D"), t0 - np.timedelta64(9, "D")],
            "user_id": [1, 2, 3],
            "value": [100.0, 100.0, 100.0],
        }
    )
    out = A.decayed_activity(
        lambda: ray.data.from_pandas(df), half_life_days=1, topk=10
    )
    s = dict(zip(out["user_id"], out["score_q"]))
    assert s[1] == 100_000_000  # age 0 -> full weight at 1e-6 quanta
    assert s[1] > s[2] > s[3] > 0
    assert s[2] == 12_500_000  # 100 * 2^-3 * 1e6


# --------------------------------------------------- k-anonymity audit
def test_k_anonymity_flags_exactly_the_small_groups(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-01-01T05:30:00", "us")
    rows = []
    # planted: 7 identical tuples (safe at k=5), 2 identical (flagged),
    # 1 singleton (flagged)
    for _ in range(7):
        rows.append((t0, "click", 12.0))
    for _ in range(2):
        rows.append((t0 + np.timedelta64(1, "h"), "click", 12.0))
    rows.append((t0, "buy", 95.0))
    rows.append((t0, "click", None))  # NULL value dropped
    df = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    out = A.k_anonymity_audit(ray.data.from_pandas(df), k=5)
    assert len(out) == 2
    assert set(zip(out["event_type"], out["hour"], out["vbin"], out["n"])) == {
        ("click", 6, 1, 2),
        ("buy", 5, 9, 1),
    }
    out2 = A.k_anonymity_audit(ray.data.from_pandas(df).repartition(5), k=5)
    pd.testing.assert_frame_equal(out, out2)


# -------------------------------------------------------------- PSI
def test_psi_zero_on_identical_halves_positive_on_drift(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    # half 1 (days 0..9) and half 2 (days 10..19) draw the SAME bucket
    # histogram -> every smoothed contribution is exactly 0
    vals = [5.0] * 30 + [25.0] * 10
    rows = [(t0 + i % 10 * day, v) for i, v in enumerate(vals)]
    rows += [(t0 + (10 + i % 10) * day, v) for i, v in enumerate(vals)]
    df = pd.DataFrame(rows, columns=["ts", "value"])
    out = A.value_psi(lambda: ray.data.from_pandas(df), bin_width=10.0)
    assert (out["contrib_q"] == 0).all()
    assert out["n1"].tolist() == out["n2"].tolist() == [30, 10]

    # drifted second half: mass moves from bucket 0 to bucket 2
    rows2 = [(t0 + i % 10 * day, v) for i, v in enumerate(vals)]
    rows2 += [
        (t0 + (10 + i % 10) * day, v)
        for i, v in enumerate([5.0] * 10 + [25.0] * 30)
    ]
    df2 = pd.DataFrame(rows2, columns=["ts", "value"])
    out2 = A.value_psi(lambda: ray.data.from_pandas(df2), bin_width=10.0)
    assert out2["contrib_q"].sum() > 0
    assert (out2["contrib_q"] > 0).all()  # both buckets shifted

    out3 = A.value_psi(
        lambda: ray.data.from_pandas(df2).repartition(6), bin_width=10.0
    )
    pd.testing.assert_frame_equal(out2, out3)


# ------------------------------------------------- rendezvous sharding
def test_rendezvous_movers_all_land_on_the_new_shard(ray_session):
    from bloomfilter_multithread_ray.functions.hashing import splitmix64
    from bloomfilter_multithread_ray.pipelines.curation import rendezvous_shards

    ids = np.arange(2000, dtype=np.int64)
    df = pd.DataFrame({"doc_id": ids})
    out = rendezvous_shards(
        ray.data.from_pandas(df), n_shards=8, n_shards_after=9
    )
    out2 = rendezvous_shards(
        ray.data.from_pandas(df).repartition(7), n_shards=8, n_shards_after=9,
        num_partitions=3,
    )
    pd.testing.assert_frame_equal(out, out2)

    # direct re-derivation: every mover's new argmax is shard 8, and the
    # per-shard moved counts match
    h = splitmix64(
        ids.astype(np.uint64)[:, None] * np.uint64(16)
        + np.arange(9, dtype=np.uint64)[None, :]
    )
    before = np.argmax(h[:, :8], axis=1)
    after = np.argmax(h, axis=1)
    moved = after != before
    assert (after[moved] == 8).all()
    ref = (
        pd.DataFrame({"shard": before, "mv": moved.astype(np.int64)})
        .groupby("shard")
        .agg(n_docs=("mv", "size"), n_moved=("mv", "sum"))
        .reset_index()
    )
    ref["shard"] = ref["shard"].astype(np.int64)
    ref["n_docs"] = ref["n_docs"].astype(np.int64)
    pd.testing.assert_frame_equal(out, ref)

    # HRW stability: moved fraction tracks 1/(N+1)
    frac = out["n_moved"].sum() / out["n_docs"].sum()
    assert 0.06 <= frac <= 0.17, frac


def test_rendezvous_rejects_bad_ring_sizes(ray_session):
    from bloomfilter_multithread_ray.pipelines.curation import rendezvous_shards

    df = pd.DataFrame({"doc_id": [1, 2, 3]})
    with pytest.raises(ValueError):
        rendezvous_shards(ray.data.from_pandas(df), n_shards=8, n_shards_after=20)
    with pytest.raises(ValueError):
        rendezvous_shards(ray.data.from_pandas(df), n_shards=9, n_shards_after=9)


# --------------------------------------------------- label propagation
def test_lpa_separates_dense_communities_cc_merges_them(ray_session):
    """Two 4-cliques joined by one bridge: CC returns one component,
    LPA keeps two communities — the operator's reason to exist."""
    from bloomfilter_multithread_ray.pipelines.graph import (
        connected_components,
        label_propagation,
    )

    cliq1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    cliq2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    df = pd.DataFrame(cliq1 + cliq2 + bridge, columns=["s", "d"])
    ds = ray.data.from_pandas(df)

    lpa = label_propagation(ds, iters=4).to_pandas()
    comm = dict(zip(lpa["node"], lpa["community"]))
    assert len({comm[n] for n in range(4)}) == 1
    assert len({comm[n] for n in range(10, 14)}) == 1
    assert comm[0] != comm[10]

    cc = connected_components(ds, cols=("s", "d")).to_pandas()
    assert cc["comp"].nunique() == 1


def test_lpa_partition_invariance_and_determinism(ray_session):
    from bloomfilter_multithread_ray.pipelines.graph import label_propagation

    rng = np.random.default_rng(7)
    e = rng.integers(0, 60, size=(300, 2))
    e = e[e[:, 0] != e[:, 1]]
    df = pd.DataFrame(e, columns=["s", "d"])
    a = (
        label_propagation(ray.data.from_pandas(df), iters=4, num_partitions=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    b = (
        label_propagation(
            ray.data.from_pandas(df).repartition(9), iters=4, num_partitions=13
        )
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # every label is a node id present in the graph
    nodes = set(a["node"])
    assert set(a["community"]).issubset(nodes)


# --------------------------------------------------------------- PQ ANN
def test_pq_ann_partition_invariance_and_duplicate_property(ray_session):
    from bloomfilter_multithread_ray.pipelines.similarity import pq_ann

    emb = ray.data.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    a = pq_ann(emb, m=4, ks=16, iters=4, nq=3, topk=5)
    b = pq_ann(emb.repartition(9), m=4, ks=16, iters=4, nq=3, topk=5)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["qid"]) == {0, 1, 2}
    assert (a.groupby("qid")["rank"].max() == 5).all()
    assert (a["qid"] != a["vec_id"]).all()  # query row excluded

    # exact-duplicate vectors share codes, hence identical ADC distance:
    # plant a duplicate of vec 0 and check both appear at equal dist_q
    # for a third query
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    V = np.asarray(t.column("embedding").combine_chunks().flatten(),
                   dtype=np.float32).reshape(len(ids), -1)
    ids2 = np.concatenate([ids, [9999]])
    V2 = np.vstack([V, V[5][None, :]])
    t2 = pa.table({"vec_id": pa.array(ids2),
                   "embedding": pa.array(list(V2), pa.list_(pa.float32()))})
    out = pq_ann(ray.data.from_arrow(t2), m=4, ks=16, iters=4, nq=1, topk=500)
    d5 = out[out["vec_id"] == 5]["dist_q"].to_numpy()
    d9999 = out[out["vec_id"] == 9999]["dist_q"].to_numpy()
    assert len(d5) == 1 and len(d9999) == 1 and d5[0] == d9999[0]


# ----------------------------------------------------------- readability
def test_readability_reference_parity_and_monotonicity(ray_session):
    import re

    from bloomfilter_multithread_ray.pipelines.text_stats import (
        readability_by_source,
    )

    # planted corpus: simple short sentences (low grade) vs one long
    # polysyllabic run-on (high grade)
    simple = "the cat sat. the dog ran. it is fun."
    complex_ = ("extraordinary computational infrastructure necessitates "
                "sophisticated organizational methodologies regarding "
                "internationalization")
    df = pd.DataFrame(
        {"source": ["s1", "s1", "s2"],
         "text": [simple, simple, complex_]}
    )
    import pyarrow as pa

    out = readability_by_source(ray.data.from_arrow(pa.Table.from_pandas(df)))
    out2 = readability_by_source(
        ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    )
    pd.testing.assert_frame_equal(out, out2)
    a = dict(zip(out["source"], out["avg_fk"]))
    assert a["s2"] > a["s1"] + 10  # polysyllabic run-on scores far higher

    # independent per-doc re-derivation
    def fk(text):
        w = [x for x in text.split(" ") if x]
        W = len(w)
        S = max(len(re.findall(r"[.!?]+", text)), 1)
        SY = sum(max(len(re.findall(r"[aeiouy]+", x.lower())), 1) for x in w)
        g = 0.39 * (W / S) + 11.8 * (SY / W) - 15.59
        u = g * 1e6
        return int(np.trunc(u + np.copysign(0.5, u)))

    assert out.loc[out.source == "s1", "fk_q_sum"].iloc[0] == 2 * fk(simple)
    assert out.loc[out.source == "s2", "fk_q_sum"].iloc[0] == fk(complex_)


# ----------------------------------------------------------- containment
def test_containment_catches_embedded_quote_jaccard_misses(ray_session):
    from bloomfilter_multithread_ray.pipelines import dedup as D

    short = "alpha beta gamma delta epsilon zeta"
    long_ = ("intro words here " + short + " and then a very long tail "
             + " ".join(f"tok{i}" for i in range(40)))
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [short, long_, "unrelated content entirely here"]})
    ds = ray.data.from_pandas(df)
    cont = (
        D.ngram_jaccard_pairs(ds, k=3, threshold=0.8, measure="containment")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    assert len(cont) == 1
    assert (cont.loc[0, "doc_a"], cont.loc[0, "doc_b"]) == (1, 2)
    assert cont.loc[0, "containment"] == 1.0  # every short-gram is in long

    jac = D.ngram_jaccard_pairs(ds, k=3, threshold=0.8).to_pandas()
    assert len(jac) == 0  # symmetric Jaccard misses the quote

    cont2 = (
        D.ngram_jaccard_pairs(ds.repartition(3), k=3, threshold=0.8,
                              measure="containment")
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(cont, cont2)

    with pytest.raises(ValueError):
        D.ngram_jaccard_pairs(ds, measure="dice")


# ------------------------------------------------------------- debounce
def test_debounce_keeps_first_and_spaced_events(ray_session):
    import importlib.util

    spec = importlib.util.spec_from_file_location("_e_w3", "/root/repo/__ray_entry__.py")
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)
    fn = e.queries()["events_debounce"]
    out = fn(SF)
    assert (out["gap_us"] == -1).sum() > 0          # first-of-key rows
    kept = out[out["gap_us"] >= 0]
    assert (kept["gap_us"] >= 60_000_000).all()     # every gap >= 60 s
    # independent re-derivation
    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    df["tus"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    df = df.sort_values(["user_id", "event_type", "tus", "event_id"])
    df["prev"] = df.groupby(["user_id", "event_type"])["tus"].shift(1)
    gap = df["tus"] - df["prev"]
    keep = df["prev"].isna() | (gap >= 60_000_000)
    ref = pd.DataFrame(
        {"event_id": df.loc[keep, "event_id"].astype(np.int64),
         "gap_us": gap[keep].fillna(-1).astype(np.int64)}
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref)


# ------------------------------------------------------------- Welch t
def test_welch_t_detects_planted_mean_shift(ray_session):
    from bloomfilter_multithread_ray.pipelines import analytics as A

    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(1, "D")
    rng = np.random.default_rng(3)
    rows = []
    # "stable": same mean both halves; "shifted": +20 in half 2
    for i in range(200):
        rows.append((t0 + (i % 10) * day, "stable", 50.0 + rng.normal(0, 5)))
        rows.append((t0 + (10 + i % 10) * day, "stable", 50.0 + rng.normal(0, 5)))
        rows.append((t0 + (i % 10) * day, "shifted", 50.0 + rng.normal(0, 5)))
        rows.append((t0 + (10 + i % 10) * day, "shifted", 70.0 + rng.normal(0, 5)))
    df = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    out = A.grouped_welch_t(lambda: ray.data.from_pandas(df))
    t = dict(zip(out["event_type"], out["t_q"]))
    assert abs(t["stable"]) < 3_000_000       # |t| < 3: no signal
    assert t["shifted"] < -20_000_000         # mean rose in half 2 => t << 0

    out2 = A.grouped_welch_t(lambda: ray.data.from_pandas(df).repartition(7))
    pd.testing.assert_frame_equal(out, out2)

    # scipy-free independent check on the shifted group
    g = df[df.event_type == "shifted"].copy()
    ts = g["ts"].astype("datetime64[us]").astype(np.int64)
    lo, hi = ts.min(), ts.max()
    half1 = ts < lo + (hi - lo) // 2
    q = np.trunc(g["value"].to_numpy() * 1e3
                 + np.copysign(0.5, g["value"].to_numpy()))
    a, b = q[half1.to_numpy()], q[~half1.to_numpy()]
    va, vb = a.var(ddof=1), b.var(ddof=1)
    t_ref = (a.mean() - b.mean()) / np.sqrt(va / len(a) + vb / len(b))
    assert abs(t["shifted"] / 1e6 - t_ref) < 1e-3
