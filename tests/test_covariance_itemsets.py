"""Embedding covariance/PCA, grouping-sets rollup, frequent pairs:
partitioning-independence and planted known values."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _emb_ds(V, nblocks=1):
    import ray.data

    t = pa.table(
        {"embedding": pa.array([row.tolist() for row in V],
                               pa.list_(pa.float32()))}
    )
    return ray.data.from_arrow(t).repartition(nblocks)


def test_covariance_matches_numpy_and_partitioning(ray_session):
    from bloomfilter_multithread_ray.pipelines.similarity import (
        embedding_covariance,
    )

    rng = np.random.default_rng(11)
    V = rng.normal(size=(200, 6)).astype(np.float32)
    a = embedding_covariance(_emb_ds(V, 1))
    b = embedding_covariance(_emb_ds(V, 9))
    assert a.equals(b)  # int64 fixed-point sums -> block-count invariant
    # numerically the population covariance (quantization error ~2^-30)
    C = np.cov(V.astype(np.float64).T, bias=True)
    for _, r in a.iterrows():
        assert C[int(r["i"]), int(r["j"])] == pytest.approx(r["cov"], abs=1e-5)


def test_pca_spectrum_matches_numpy(ray_session):
    from bloomfilter_multithread_ray.pipelines.similarity import (
        embedding_covariance,
        embedding_pca,
    )

    rng = np.random.default_rng(7)
    # anisotropic data: one dominant direction
    base = rng.normal(size=(300, 4))
    base[:, 0] *= 5.0
    V = base.astype(np.float32)
    spec = embedding_pca(_emb_ds(V), topk=4)
    cov_rows = embedding_covariance(_emb_ds(V), round_dp=12)
    C = np.zeros((4, 4))
    C[cov_rows["i"], cov_rows["j"]] = cov_rows["cov"]
    C[cov_rows["j"], cov_rows["i"]] = cov_rows["cov"]
    want = np.linalg.eigvalsh(C)[::-1]
    assert np.allclose(spec["eigenvalue"], np.round(want, 6))
    assert spec.loc[0, "explained_ratio"] > 0.8  # dominant direction found
    assert spec["eigenvalue"].is_monotonic_decreasing


def test_events_rollup_levels_consistent(ray_session, testdata_dir):
    from bloomfilter_multithread_ray.pipelines.relational import events_rollup

    df = events_rollup(testdata_dir)
    total = df[(df["event_type"] == "ALL") & (df["day"] == "ALL")]
    assert len(total) == 1
    base = df[(df["event_type"] != "ALL") & (df["day"] != "ALL")]
    lvl1 = df[(df["event_type"] != "ALL") & (df["day"] == "ALL")]
    assert base["n_events"].sum() == total["n_events"].iloc[0]
    assert lvl1["n_events"].sum() == total["n_events"].iloc[0]
    # per-type day sums fold exactly into the type level
    for et, g in base.groupby("event_type"):
        assert g["n_events"].sum() == int(
            lvl1[lvl1["event_type"] == et]["n_events"].iloc[0]
        )


def test_frequent_part_pairs_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.pipelines.itemsets import frequent_part_pairs

    # orders 1..3 contain {10,20}; order 4 contains {10,30}; order 5 {40}
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 20), (3, 10),
            (4, 10), (4, 30), (5, 40), (1, 10)]  # dup line in order 1
    t = pa.table(
        {"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
         "l_partkey": pa.array([r[1] for r in rows], pa.int64())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    got = frequent_part_pairs(str(d), min_support=2, topk=10)
    assert got.iloc[0][["part_a", "part_b", "support"]].tolist() == [10, 20, 3]
    # (10,30) has support 1 -> filtered by min_support
    assert len(got) == 1


def test_frequent_part_pairs_refuses_capped_baskets(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest as _pytest

    from bloomfilter_multithread_ray.pipelines.itemsets import frequent_part_pairs

    rows = [(1, p) for p in range(10)] + [(2, 1), (2, 2)]
    t = pa.table(
        {"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
         "l_partkey": pa.array([r[1] for r in rows], pa.int64())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    with _pytest.raises(ValueError, match="max_basket"):
        frequent_part_pairs(str(d), max_basket=4)
    # and succeeds when the cap is raised: (1,2) is in both baskets
    got = frequent_part_pairs(str(d), max_basket=16, min_support=1)
    assert got.iloc[0][["part_a", "part_b", "support"]].tolist() == [1, 2, 2]
    assert len(got) >= 10


def test_fd_pca_within_certificate_of_exact(ray_session):
    """Sketch-mode PCA (Frequent Directions) vs the exact pipeline:
    every eigenvalue within the sketch's own err_bound (Weyl), and the
    dominant direction's ratio recovered."""
    from bloomfilter_multithread_ray.pipelines.similarity import (
        embedding_fd_pca,
        embedding_pca,
    )

    rng = np.random.default_rng(17)
    base = rng.normal(size=(600, 8))
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    V = (base + 0.25).astype(np.float32)

    exact = embedding_pca(_emb_ds(V, 7), topk=8, round_dp=9)
    # ell >= d: lossless pass-through of the covariance
    full = embedding_fd_pca(_emb_ds(V, 7), ell=16, topk=8, round_dp=9)
    assert np.allclose(full["eigenvalue"], exact["eigenvalue"], atol=1e-5)
    assert float(full["err_bound"][0]) == 0.0

    # compressed sketch: certificate honored
    sk = embedding_fd_pca(_emb_ds(V, 7), ell=6, topk=8, round_dp=9)
    bound = float(sk["err_bound"][0]) + 1e-6
    assert bound > 0
    assert np.abs(sk["eigenvalue"].to_numpy() - exact["eigenvalue"].to_numpy()).max() <= bound
    # partitioning changes merge order but the bound still holds
    sk2 = embedding_fd_pca(_emb_ds(V, 2), ell=6, topk=8, round_dp=9)
    b2 = float(sk2["err_bound"][0]) + 1e-6
    assert np.abs(sk2["eigenvalue"].to_numpy() - exact["eigenvalue"].to_numpy()).max() <= b2


def test_association_rules_planted(ray_session, tmp_path):
    """Hand-computed conf/lift on planted baskets, both rule
    directions, quantized-confidence filter."""
    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.pipelines.itemsets import (
        part_association_rules,
    )

    # baskets: {10,20} x3, {10,30}, {10}, {40} -> N=6 baskets
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 20), (3, 10),
            (4, 10), (4, 30), (5, 10), (6, 40), (1, 10)]
    t = pa.table(
        {"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
         "l_partkey": pa.array([r[1] for r in rows], pa.int64())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    got = part_association_rules(str(d), min_support=2, min_conf=0.25)
    # only pair with support >= 2 is (10,20): supp=3, s10=5, s20=3, N=6
    # conf(10->20)=3/5=0.6, lift=3*6/(5*3)=1.2
    # conf(20->10)=3/3=1.0, lift same
    assert got[["ant", "cons"]].values.tolist() == [[10, 20], [20, 10]]
    r1 = got[got.ant == 10].iloc[0]
    assert (int(r1.support), r1.conf, r1.lift) == (3, 0.6, 1.2)
    r2 = got[got.ant == 20].iloc[0]
    assert (int(r2.support), r2.conf, r2.lift) == (3, 1.0, 1.2)
    # min_conf filter on the QUANTIZED value: raising it drops 10->20
    hi = part_association_rules(str(d), min_support=2, min_conf=0.600001)
    assert hi[["ant", "cons"]].values.tolist() == [[20, 10]]


def test_association_rules_partition_invariance_and_cap(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import pytest as _pytest

    from bloomfilter_multithread_ray.pipelines.itemsets import (
        part_association_rules,
    )

    rng = np.random.default_rng(3)
    rows = []
    for o in range(60):
        for p in rng.choice(20, size=rng.integers(1, 6), replace=False):
            rows.append((o, int(p)))
    t = pa.table(
        {"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
         "l_partkey": pa.array([r[1] for r in rows], pa.int64())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    a = part_association_rules(str(d), num_partitions=3)
    b = part_association_rules(str(d), num_partitions=17)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
    with _pytest.raises(ValueError, match="max_basket"):
        part_association_rules(str(d), max_basket=3)


def test_frequent_triples_planted_and_invariance(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.pipelines.itemsets import frequent_triples

    # {10,20,30} x2, {10,20,40}, {10,20,30,50} -> (10,20,30) support 3
    rows = [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (2, 30),
            (3, 10), (3, 20), (3, 40), (4, 10), (4, 20), (4, 30), (4, 50),
            (1, 10)]  # dup line
    t = pa.table(
        {"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
         "l_partkey": pa.array([r[1] for r in rows], pa.int64())}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "lineitem.parquet")
    got = frequent_triples(str(d), min_support=2, topk=10)
    assert got.iloc[0].tolist() == [10, 20, 30, 3]
    # every basket contains {10,20}: triples (10,20,X) for X=40,50 have
    # support 1 -> filtered
    assert len(got) == 1
    inv = frequent_triples(str(d), min_support=2, topk=10, num_partitions=7)
    pd.testing.assert_frame_equal(got, inv)


def _write_baskets(tmp_path, rows):
    import pyarrow.parquet as pq

    t = pa.table(
        {"l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
         "l_partkey": pa.array([r[1] for r in rows], pa.int64())}
    )
    d = tmp_path / "sf"
    d.mkdir(parents=True, exist_ok=True)
    pq.write_table(t, d / "lineitem.parquet")
    return str(d)


def test_two_phase_completes_on_basket_wider_than_cap(ray_session, tmp_path):
    """The round-4 refusal case: a basket wider than max_basket=64.

    The direct path refuses (cubic fan-out honesty rule); the
    candidate-pruned apriori (now the triples DEFAULT) and son paths
    complete with the exact uncapped answer — the wide basket's
    rare items are pruned before any enumeration.
    """
    import pytest as _pytest

    from bloomfilter_multithread_ray.pipelines.itemsets import (
        frequent_part_pairs, frequent_triples, part_association_rules,
    )

    # one 200-wide basket of singleton items + planted frequent sets
    rows = [(99, 100000 + i) for i in range(200)]
    rows += [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20), (2, 30),
             (3, 10), (3, 20), (3, 40)]
    d = _write_baskets(tmp_path, rows)
    with _pytest.raises(Exception, match="max_basket"):
        frequent_triples(d, min_support=2, topk=10, method="direct")
    got = frequent_triples(d, min_support=2, topk=10)  # default apriori
    assert got.values.tolist() == [[10, 20, 30, 2]]
    son = frequent_triples(d, min_support=2, topk=10, method="son")
    pd.testing.assert_frame_equal(got, son)
    # pairs + rules candidate-pruned paths on the same wide fixture
    p = frequent_part_pairs(d, min_support=2, topk=10, method="apriori")
    assert p.iloc[0].tolist() == [10, 20, 3]
    ps = frequent_part_pairs(d, min_support=2, topk=10, method="son")
    pd.testing.assert_frame_equal(p, ps)
    r = part_association_rules(d, min_support=2, min_conf=0.25,
                               method="apriori")
    assert not r.empty
    # rules exact vs the capped-out direct path on a narrow fixture
    rows2 = [r_ for r_ in rows if r_[0] != 99]
    d2 = _write_baskets(tmp_path / "narrow", rows2)
    ra = part_association_rules(d2, min_support=2, min_conf=0.25,
                                method="apriori")
    rd = part_association_rules(d2, min_support=2, min_conf=0.25,
                                method="direct")
    pd.testing.assert_frame_equal(ra, rd)


def test_son_local_threshold_above_one(ray_session, tmp_path):
    """SON with t_p > 1: few partitions so floor(s*n_p/n) >= 2 —
    locally infrequent itemsets really are pruned in phase 1, and the
    exact phase-2 recount still matches the direct pass."""
    from bloomfilter_multithread_ray.pipelines.itemsets import (
        frequent_part_pairs, frequent_triples,
    )

    # 12 baskets: {1,2,3} x5, {1,2,4} x3, {5,6,7} x2, fillers
    rows = []
    o = 0
    for _ in range(5):
        o += 1
        rows += [(o, 1), (o, 2), (o, 3)]
    for _ in range(3):
        o += 1
        rows += [(o, 1), (o, 2), (o, 4)]
    for _ in range(2):
        o += 1
        rows += [(o, 5), (o, 6), (o, 7)]
    rows += [(o + 1, 8), (o + 2, 9)]
    d = _write_baskets(tmp_path, rows)
    for np_ in (1, 2):  # with s=4, n=12: t_p = floor(4*n_p/12) >= 2
        s = frequent_triples(d, min_support=4, topk=10, method="son",
                             num_partitions=np_)
        dd = frequent_triples(d, min_support=4, topk=10, method="direct",
                              num_partitions=np_)
        pd.testing.assert_frame_equal(s, dd)
        sp = frequent_part_pairs(d, min_support=4, topk=10, method="son",
                                 num_partitions=np_)
        dp = frequent_part_pairs(d, min_support=4, topk=10, method="direct",
                                 num_partitions=np_)
        pd.testing.assert_frame_equal(sp, dp)
    assert s.values.tolist() == [[1, 2, 3, 5]]


def test_triples_method_equivalence_and_partition_invariance(
    ray_session, tmp_path
):
    """All three methods agree on a random basket corpus, at several
    partition counts (SON's t_p varies with P; output must not)."""
    rng = np.random.default_rng(7)
    rows = []
    for o in range(1, 61):
        for p in rng.choice(30, size=rng.integers(1, 8), replace=False):
            rows.append((o, int(p)))
    d = _write_baskets(tmp_path, rows)
    from bloomfilter_multithread_ray.pipelines.itemsets import frequent_triples

    ref = frequent_triples(d, min_support=3, topk=50, method="direct")
    for method in ("apriori", "son"):
        for np_ in (3, 16):
            got = frequent_triples(d, min_support=3, topk=50, method=method,
                                   num_partitions=np_)
            pd.testing.assert_frame_equal(got, ref)


def test_two_phase_pair_crossing_threshold_via_wide_basket(
    ray_session, tmp_path
):
    """A pair that reaches min_support only by COMBINING its
    narrow-basket and wide-(deferred)-basket contributions must
    survive — the distributed re-merge runs before any support
    filter (regression for the deferred-merge ordering)."""
    from bloomfilter_multithread_ray.pipelines.itemsets import (
        _WIDE_DEFER, frequent_part_pairs,
    )

    w = _WIDE_DEFER + 88
    rows = [(1, 10), (1, 20)]                      # narrow: one co-occurrence
    rows += [(99, 10), (99, 20)]                   # wide basket holds both...
    rows += [(99, 100000 + i) for i in range(w)]   # ...plus w rare items
    d = _write_baskets(tmp_path, rows)
    got = frequent_part_pairs(d, min_support=2, topk=5, method="apriori")
    assert got.values.tolist() == [[10, 20, 2]]
