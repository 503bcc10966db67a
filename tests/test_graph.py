"""Distributed connected components vs a driver union-find reference;
distributed keep-set vs the round-1 driver keep-set."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from bloomfilter_multithread_ray.pipelines.graph import (
    connected_components,
    keep_set_distributed,
)


def _uf_components(pairs: pd.DataFrame) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = sorted((ra, rb))
            parent[hi] = lo
    nodes = set(pairs["doc_a"]) | set(pairs["doc_b"])
    return {int(n): find(int(n)) for n in nodes}


def _cc(pairs_df: pd.DataFrame, *, local_cutoff: int = 0, **kw) -> pd.DataFrame:
    # local_cutoff=0 forces the DISTRIBUTED rounds (the path under test)
    ds = ray.data.from_pandas(pairs_df).repartition(3)
    return (
        connected_components(ds, num_partitions=8, local_cutoff=local_cutoff, **kw)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(23)
    pairs = pd.DataFrame(
        {"doc_a": rng.integers(0, 300, 250).astype("int64"),
         "doc_b": rng.integers(0, 300, 250).astype("int64")}
    )
    pairs = pairs[pairs.doc_a != pairs.doc_b].reset_index(drop=True)
    got = _cc(pairs)
    want = _uf_components(pairs)
    assert dict(zip(got["node"], got["comp"])) == want
    # exactly one row per endpoint
    assert len(got) == len(want)


def test_long_chain_converges_fast():
    """A 400-node path graph: diameter 399 — naive propagation would
    need 400 rounds; pointer jumping must land within max_iters=20."""
    n = 400
    pairs = pd.DataFrame(
        {"doc_a": np.arange(n - 1, dtype="int64"), "doc_b": np.arange(1, n, dtype="int64")}
    )
    got = _cc(pairs, max_iters=20)
    assert (got["comp"] == 0).all() and len(got) == n


def test_two_components_and_permuted_ids():
    pairs = pd.DataFrame(
        {"doc_a": [907, 5, 907, 44], "doc_b": [13, 907, 44, 5000]}
    ).astype("int64")
    got = _cc(pairs)
    comp = dict(zip(got["node"], got["comp"]))
    assert comp == {5: 5, 13: 13, 44: 13, 907: 13, 5000: 13} or comp == _uf_components(pairs)


def test_local_endgame_equals_distributed_rounds():
    """The one-partition endgame kernel and the iterative rounds must
    produce the identical labeling."""
    rng = np.random.default_rng(29)
    pairs = pd.DataFrame(
        {"doc_a": rng.integers(0, 150, 120).astype("int64"),
         "doc_b": rng.integers(0, 150, 120).astype("int64")}
    )
    pairs = pairs[pairs.doc_a != pairs.doc_b].reset_index(drop=True)
    dist = _cc(pairs, local_cutoff=0)
    local = _cc(pairs, local_cutoff=10**9)
    pd.testing.assert_frame_equal(local, dist)


def test_keep_set_distributed_equals_driver_union_find():
    """End-to-end on the documents fixture: the distributed keep-set
    (CC + anti join) must equal the round-1 driver union-find path."""
    from bloomfilter_multithread_ray.pipelines.dedup import (
        keep_set_from_pairs,
        minhash_lsh_pairs,
    )

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, threshold=0.5).materialize()
    want = keep_set_from_pairs(docs, pairs)["doc_id"].tolist()
    got = (
        keep_set_distributed(docs, pairs)
        .to_pandas()["doc_id"]
        .sort_values()
        .tolist()
    )
    assert got == want


def test_cc_arrays_property_random_graphs():
    """Property sweep: the local CC kernel equals union-find over many
    random graph shapes (sparse, dense, stars, chains, self-loop-free)."""
    from bloomfilter_multithread_ray.pipelines.graph import _cc_arrays

    rng = np.random.default_rng(41)
    for trial in range(25):
        n = int(rng.integers(2, 120))
        m = int(rng.integers(1, 4 * n))
        a = rng.integers(0, n, m).astype(np.int64)
        b = rng.integers(0, n, m).astype(np.int64)
        keep = a != b
        if not keep.any():
            continue
        a, b = a[keep], b[keep]
        nodes, comp = _cc_arrays(a, b)
        want = _uf_components(pd.DataFrame({"doc_a": a, "doc_b": b}))
        assert dict(zip(nodes, comp)) == want, f"trial {trial}"


def test_keep_set_from_raw_band_pairs_equals_deduped():
    """dedupe=False pair feed (duplicate edges per band) must yield the
    identical keep-set — CC is multiset-tolerant."""
    from bloomfilter_multithread_ray.pipelines.dedup import minhash_lsh_pairs

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    kept_dedup = sorted(
        keep_set_distributed(docs, minhash_lsh_pairs(docs, threshold=0.5))
        .to_pandas()["doc_id"]
    )
    kept_raw = sorted(
        keep_set_distributed(docs, minhash_lsh_pairs(docs, threshold=0.5, dedupe=False))
        .to_pandas()["doc_id"]
    )
    assert kept_raw == kept_dedup


def test_self_pairs_appear_as_singletons():
    """A node appearing only in a self-pair still gets an output row
    (comp = itself) — the node-appears contract."""
    pairs = pd.DataFrame(
        {"doc_a": [1, 7, 9], "doc_b": [2, 7, 9]}
    ).astype("int64")
    got = _cc(pairs)  # forced distributed path
    comp = dict(zip(got["node"], got["comp"]))
    assert comp == {1: 1, 2: 1, 7: 7, 9: 9}


def test_pagerank_driver_and_cluster_folds_agree():
    from bloomfilter_multithread_ray.pipelines.graph import pagerank

    rng = np.random.default_rng(11)
    N, E = 300, 1500
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {"s": rng.integers(0, N, E).astype("int64"),
             "d": rng.integers(0, N, E).astype("int64")}
        )
    ).repartition(4)
    r_drv = pagerank(edges, N, iters=4, fold="driver")
    r_cls = pagerank(edges, N, iters=4, fold="cluster")
    assert np.abs(r_drv - r_cls).max() < 1e-12
    with pytest.raises(ValueError, match="fold"):
        pagerank(edges, N, iters=1, fold="banana")


def test_pagerank_distributed_matches_broadcast():
    """The shuffle-per-iteration web-graph form fixes the same point as
    the broadcast form: rank rows co-partitioned with edges, including
    dangling nodes (teleport-only) and nodes with no edges at all."""
    from bloomfilter_multithread_ray.pipelines.graph import (
        pagerank,
        pagerank_distributed,
    )

    rng = np.random.default_rng(3)
    N, E = 200, 900
    s = rng.integers(0, N - 20, E)  # last 20 nodes isolated
    d = rng.integers(0, N - 10, E)
    edges = ray.data.from_pandas(
        pd.DataFrame({"s": s.astype("int64"), "d": d.astype("int64")})
    ).repartition(4)
    r = pagerank(edges, N, iters=4)
    out = pagerank_distributed(edges, N, iters=4, num_partitions=8).to_pandas()
    assert len(out) == N and set(out["node"]) == set(range(N))
    rd = np.zeros(N)
    rd[out["node"].to_numpy()] = out["rank"].to_numpy()
    assert np.abs(r - rd).max() < 1e-12
    # isolated nodes sit exactly at the teleport fixed point
    assert np.allclose(rd[N - 10 :], (1 - 0.85) / N)


# ---------------------------------------------------------------- k-core
def _peel_reference(edges, k):
    """Single-process reference peeler: dict-of-sets, iterate."""
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                    if not adj[m]:
                        adj.pop(m, None)
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def test_k_core_matches_reference_peeler(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.graph import k_core

    rng = np.random.default_rng(7)
    # planted structure: a K6 clique (5-core) + a long chain + random noise
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    chain = [(100 + i, 101 + i) for i in range(30)]
    noise = [(int(a), int(b)) for a, b in rng.integers(200, 260, (120, 2))]
    edges = clique + chain + noise + [(3, 3)] + clique[:4]  # self-loop + dups
    df = pd.DataFrame(edges, columns=["s", "d"]).astype("int64")
    for k in (2, 3, 5, 6):
        ref = _peel_reference(edges, k)
        got = k_core(
            rd.from_pandas(df).repartition(4), k, num_partitions=8
        ).to_pandas()
        got_map = (
            dict(zip(got.node.astype(int), got.deg.astype(int))) if len(got) else {}
        )
        assert got_map == ref, (k, len(got_map), len(ref))


def test_k_core_empty_and_validation(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.graph import k_core

    df = pd.DataFrame({"s": [0, 1], "d": [1, 2]}).astype("int64")
    out = k_core(rd.from_pandas(df), 5)
    assert out.count() == 0
    assert sorted(out.schema().names) == ["deg", "node"]
    with pytest.raises(ValueError, match="k must be"):
        k_core(rd.from_pandas(df), 0)


def test_k_core_partition_invariance(ray_session):
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.graph import k_core

    rng = np.random.default_rng(3)
    df = pd.DataFrame(rng.integers(0, 80, (600, 2)), columns=["s", "d"]).astype("int64")
    a = k_core(rd.from_pandas(df).repartition(2), 3, num_partitions=4).to_pandas()
    b = k_core(rd.from_pandas(df).repartition(9), 3, num_partitions=16).to_pandas()
    ka = a.sort_values("node").reset_index(drop=True)
    kb = b.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(ka, kb, check_dtype=False)


# --------------------------------------------------------------- BFS layers
def _bfs_reference(edge_list, sources):
    """Single-process BFS oracle."""
    from collections import defaultdict, deque

    adj = defaultdict(list)
    for a, b in edge_list:
        adj[a].append(b)
        adj[b].append(a)
    dist = {s: 0 for s in sources}
    q = deque(sources)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_distances_matches_reference_and_partitioning(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.graph import bfs_distances

    rng = np.random.default_rng(13)
    # random sparse graph + a long path to force many rounds
    m = 400
    ra = rng.integers(0, 120, m)
    rb = rng.integers(0, 120, m)
    path = [(1000 + i, 1001 + i) for i in range(6)]
    edges = [(int(a), int(b)) for a, b in zip(ra, rb) if a != b] + path + [(0, 1000)]
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})

    want = _bfs_reference(edges, [0, 7])
    for nblocks in (1, 5):
        out = bfs_distances(rd.from_arrow(t).repartition(nblocks), [0, 7]).to_pandas()
        got = dict(zip(out["node"], out["dist"]))
        assert got == want, (nblocks, len(got), len(want))


def test_bfs_distances_unreachable_strings_and_guards(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.graph import bfs_distances

    se = pa.table({"a": pa.array(["x", "y", "p"]), "b": pa.array(["y", "z", "q"])})
    out = bfs_distances(rd.from_arrow(se), ["x"]).to_pandas()
    # p/q unreachable and absent; dist hops exact
    assert dict(zip(out["node"], out["dist"])) == {"x": 0, "y": 1, "z": 2}

    with pytest.raises(ValueError):
        bfs_distances(rd.from_arrow(se), [])
    with pytest.raises(RuntimeError):
        # path needs 2 rounds; cap at 1
        bfs_distances(rd.from_arrow(se), ["x"], max_rounds=1)


# ---- bounded-hop weighted SSSP (Bellman-Ford rounds) ----

def _ref_sssp(a, b, w, srcs, k):
    INF = float("inf")
    adj = {}
    for x, y, ww in zip(a, b, w):
        adj.setdefault(int(x), []).append((int(y), int(ww)))
        adj.setdefault(int(y), []).append((int(x), int(ww)))
    cur = {int(s): 0 for s in srcs}
    for _ in range(k):
        nxt = dict(cur)
        for u, du in cur.items():
            for v, ww in adj.get(u, []):
                if du + ww < nxt.get(v, INF):
                    nxt[v] = du + ww
        cur = nxt
    return pd.DataFrame(sorted(cur.items()), columns=["node", "dist"])


def test_sssp_hops_matches_reference_random(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.graph import sssp_hops

    rng = np.random.default_rng(3)
    n, m = 300, 900
    a = rng.integers(0, n, m)
    b = rng.integers(0, n, m)
    w = rng.integers(1, 50, m)
    keep = a != b
    a, b, w = a[keep], b[keep], w[keep]
    t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
                  "w": pa.array(w, pa.int64())})
    for k in (0, 1, 3, 6):
        want = _ref_sssp(a, b, w, [0, 5, 11], k)
        for blocks in (1, 4):
            got = (
                sssp_hops(ray.data.from_arrow(t).repartition(blocks),
                          [0, 5, 11], max_hops=k)
                .to_pandas().sort_values("node").reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sssp_weighted_beats_hop_path(ray_session):
    """Planted: direct edge weight 10 vs 2-hop path 3+3 — the weighted
    answer (6) must win over the BFS-style 1-hop answer (10)."""
    import ray.data

    from bloomfilter_multithread_ray.pipelines.graph import sssp_hops

    t = pa.table({"a": pa.array([0, 0, 1], pa.int64()),
                  "b": pa.array([2, 1, 2], pa.int64()),
                  "w": pa.array([10, 3, 3], pa.int64())})
    got = (sssp_hops(ray.data.from_arrow(t), [0], max_hops=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got.values.tolist() == [[0, 0], [1, 3], [2, 6]]
    # with max_hops=1 the direct edge is the best 1-edge path
    got1 = (sssp_hops(ray.data.from_arrow(t), [0], max_hops=1)
            .to_pandas().sort_values("node").reset_index(drop=True))
    assert got1.values.tolist() == [[0, 0], [1, 3], [2, 10]]


def test_sssp_validation_and_null_edges(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.graph import sssp_hops

    t = pa.table({"a": pa.array([0, None], pa.int64()),
                  "b": pa.array([1, 2], pa.int64()),
                  "w": pa.array([5, 1], pa.int64())})
    got = (sssp_hops(ray.data.from_arrow(t), [0], max_hops=3)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert got.values.tolist() == [[0, 0], [1, 5]]  # null edge dropped
    with pytest.raises(ValueError, match="sources"):
        sssp_hops(ray.data.from_arrow(t), [], max_hops=2)
    with pytest.raises(ValueError, match="max_hops"):
        sssp_hops(ray.data.from_arrow(t), [0], max_hops=-1)
