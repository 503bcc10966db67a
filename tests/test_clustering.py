"""Deterministic DBSCAN: numpy/DuckDB cross-checks, planted
core/border/noise fixtures, partition invariance, parameter guards."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines.clustering import dbscan_embeddings


def _run(V, ids=None, *, tau=0.4, min_pts=3, P=32, blocks=2):
    ids = np.arange(len(V), dtype=np.int64) if ids is None else ids
    tbl = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(V.astype(np.float32)))})
    ds = ray.data.from_arrow(tbl).repartition(blocks)
    out = dbscan_embeddings(ds, ids, V, tau=tau, min_pts=min_pts, num_partitions=P)
    df = out.to_pandas()
    df["cluster"] = df["cluster"].astype("float64")
    return df.sort_values("vec_id").reset_index(drop=True)


def _reference(V, ids, *, tau=0.4, min_pts=3):
    """Brute-force deterministic DBSCAN (same rounding/tie rules)."""
    Vn = V.astype(np.float64)
    Vn = Vn / np.linalg.norm(Vn, axis=1, keepdims=True)
    C = np.round(Vn @ Vn.T, 6)
    adj = (C >= tau) & ~np.eye(len(ids), dtype=bool)
    deg = adj.sum(1)
    core = deg + 1 >= min_pts
    # CC over core-core edges, label = min core id
    lbl = {int(i): int(i) for i in ids[core]}

    def find(x):
        while lbl[x] != x:
            lbl[x] = lbl[lbl[x]]
            x = lbl[x]
        return x

    ci = np.flatnonzero(core)
    for a in ci:
        for b in ci:
            if a < b and adj[a, b]:
                ra, rb = find(int(ids[a])), find(int(ids[b]))
                if ra != rb:
                    lbl[max(ra, rb)] = min(ra, rb)
    rows = []
    for i in range(len(ids)):
        vid = int(ids[i])
        if core[i]:
            rows.append((vid, float(find(vid)), "core"))
        else:
            nb = np.flatnonzero(adj[i] & core)
            if len(nb):
                rows.append((vid, float(min(find(int(ids[j])) for j in nb)), "border"))
            else:
                rows.append((vid, np.nan, "noise"))
    return (
        pd.DataFrame(rows, columns=["vec_id", "cluster", "role"])
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


def test_matches_reference_random(ray_session):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, 16))
    V = np.vstack(
        [np.repeat(centers, 12, axis=0) + 0.08 * rng.standard_normal((96, 16)),
         rng.standard_normal((40, 16))]
    )
    ids = rng.permutation(5000)[: len(V)].astype(np.int64)  # non-contiguous ids
    want = _reference(V, ids, tau=0.6, min_pts=4)
    for P, blocks in ((4, 1), (32, 5)):
        got = _run(V, ids, tau=0.6, min_pts=4, P=P, blocks=blocks)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(want.role) == {"core", "border", "noise"}  # fixture non-trivial


def test_matches_duckdb(ray_session):
    rng = np.random.default_rng(3)
    V = np.repeat(rng.standard_normal((10, 8)), 8, axis=0) + 0.3 * rng.standard_normal((80, 8))
    ids = np.arange(100, 100 + len(V), dtype=np.int64)
    got = _run(V, ids, tau=0.5, min_pts=3)
    con = duckdb.connect()
    con.execute("CREATE TABLE emb (vec_id BIGINT, e DOUBLE[])")
    for i, vid in enumerate(ids):
        con.execute("INSERT INTO emb VALUES (?, ?)", [int(vid), list(map(float, V[i]))])
    want = con.execute(
        """
WITH RECURSIVE
p AS (SELECT a.vec_id va, b.vec_id vb FROM emb a JOIN emb b ON a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.5),
sym AS (SELECT va s, vb d FROM p UNION ALL SELECT vb, va FROM p),
deg AS (SELECT s, COUNT(*) n FROM sym GROUP BY s),
core AS (SELECT e.vec_id FROM emb e JOIN deg ON deg.s = e.vec_id WHERE deg.n + 1 >= 3),
ce AS (SELECT s, d FROM sym WHERE s IN (SELECT vec_id FROM core) AND d IN (SELECT vec_id FROM core)),
reach(n, m) AS (SELECT s, s FROM ce UNION SELECT r.n, e.d FROM reach r JOIN ce e ON e.s = r.m),
lab AS (SELECT n AS node, MIN(m) AS comp FROM reach GROUP BY n),
corelab AS (SELECT c.vec_id, COALESCE(l.comp, c.vec_id) AS cluster
            FROM core c LEFT JOIN lab l ON l.node = c.vec_id),
border AS (SELECT s.s AS vec_id, MIN(cl.cluster) AS cluster FROM sym s
           JOIN corelab cl ON cl.vec_id = s.d
           WHERE s.s NOT IN (SELECT vec_id FROM core) GROUP BY s.s)
SELECT e.vec_id, COALESCE(cl.cluster, b.cluster) AS cluster,
  CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
       WHEN b.vec_id IS NOT NULL THEN 'border' ELSE 'noise' END AS role
FROM emb e LEFT JOIN corelab cl ON cl.vec_id = e.vec_id
LEFT JOIN border b ON b.vec_id = e.vec_id ORDER BY e.vec_id
"""
    ).df()
    want["cluster"] = want["cluster"].astype("float64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_planted_star_singleton_and_borders(ray_session):
    """Hub + 2 leaves at tau, leaves mutually far, min_pts=3: hub is a
    SINGLETON-cluster core (no core neighbor -> label = own id), leaves
    are border with the hub's cluster; a far point is noise."""
    hub = np.array([1.0, 0.0, 0.0])
    leaf1 = np.array([0.9, 0.44, 0.0])   # cos(hub)≈0.898
    leaf2 = np.array([0.9, -0.44, 0.0])  # cos(leaf1, leaf2)≈0.62 < tau=0.8
    far = np.array([0.0, 0.0, 1.0])
    V = np.vstack([hub, leaf1, leaf2, far])
    ids = np.array([40, 10, 20, 30], dtype=np.int64)
    got = _run(V, ids, tau=0.8, min_pts=3, P=4)
    want = pd.DataFrame(
        {"vec_id": [10, 20, 30, 40],
         "cluster": [40.0, 40.0, np.nan, 40.0],
         "role": ["border", "border", "noise", "core"]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_min_pts_one_isolated_points_are_core(ray_session):
    V = np.eye(3)  # mutually orthogonal: no edges at tau=0.5
    got = _run(V, tau=0.5, min_pts=1, P=4)
    assert list(got.role) == ["core"] * 3
    assert list(got.cluster) == [0.0, 1.0, 2.0]


def test_all_noise_when_tau_unreachable(ray_session):
    rng = np.random.default_rng(5)
    got = _run(rng.standard_normal((20, 6)), tau=1.01, min_pts=2, P=4)
    assert list(got.role) == ["noise"] * 20
    assert got.cluster.isna().all()


def test_min_pts_two_pairs_are_clusters(ray_session):
    a = np.array([1.0, 0.0])
    b = np.array([0.95, 0.31])
    c = np.array([-1.0, 0.0])
    got = _run(np.vstack([a, b, c]), tau=0.9, min_pts=2, P=4)
    want = pd.DataFrame(
        {"vec_id": [0, 1, 2],
         "cluster": [0.0, 0.0, np.nan],
         "role": ["core", "core", "noise"]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_min_pts_zero_rejected(ray_session):
    with pytest.raises(ValueError, match="min_pts"):
        dbscan_embeddings(
            ray.data.from_items([{"vec_id": 0, "embedding": [1.0]}]),
            np.array([0]), np.array([[1.0]]), min_pts=0,
        )


def test_dbscan_default_blocked_generator_matches_broadcast(ray_session):
    """Omitting the matrix (round-4 default: distributed block-pair
    exact generator) must give bit-identical clusters to the broadcast
    oracle-anchor path, under any blocking."""
    rng = np.random.default_rng(31)
    base = rng.standard_normal((30, 8))
    V = np.concatenate([np.repeat(base, 4, axis=0)
                        + 0.05 * rng.standard_normal((120, 8)),
                        rng.standard_normal((60, 8))])
    ids = np.arange(len(V), dtype=np.int64)
    want = _run(V, tau=0.5, min_pts=3)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(V.astype(np.float32)))})
    for blocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = dbscan_embeddings(ds, tau=0.5, min_pts=3).to_pandas()
        got["cluster"] = got["cluster"].astype("float64")
        got = got.sort_values("vec_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_dbscan_lsh_generator_partition_invariant(ray_session):
    """pair_gen='lsh' (the opt-in sub-quadratic path) must be blocking-
    independent and, on strongly-clustered data, match the exact path."""
    rng = np.random.default_rng(33)
    base = rng.standard_normal((25, 8))
    V = np.concatenate([np.repeat(base, 5, axis=0)
                        + 0.01 * rng.standard_normal((125, 8)),
                        rng.standard_normal((50, 8))])
    ids = np.arange(len(V), dtype=np.int64)
    tbl = pa.table({"vec_id": pa.array(ids),
                    "embedding": pa.array(list(V.astype(np.float32)))})
    ref = None
    for blocks in (2, 9):
        ds = ray.data.from_arrow(tbl).repartition(blocks)
        got = dbscan_embeddings(ds, tau=0.9, min_pts=3, pair_gen="lsh").to_pandas()
        got["cluster"] = got["cluster"].astype("float64")
        got = got.sort_values("vec_id").reset_index(drop=True)
        if ref is None:
            ref = got
        else:
            pd.testing.assert_frame_equal(got, ref)
    # near-identical clusters collide with certainty at nbits=4/16t:
    # the approximate path agrees with the exact one here
    exact = _run(V, tau=0.9, min_pts=3)
    pd.testing.assert_frame_equal(ref, exact)
