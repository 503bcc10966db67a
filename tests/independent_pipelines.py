"""From-spec single-process reimplementations of the 13 remaining
rows-only driver queries, for pinned-snapshot oracles (batch 3 of the
sketch-snapshot project — see independent_sketches.py for the pattern
and independent_impls.py for the per-document precedent).

NO pipeline code is imported: every algorithm here is re-derived from
its published description (Dunning & Ertl 2019 t-digest, Karnin-Lang-
Liberty 2016 KLL, Liberty 2013 / GLPW 2016 Frequent Directions,
Kirsch-Mitzenmacher 2006 double hashing, Charikar 2002 hyperplane LSH,
Lloyd k-means, Abbas et al. 2023 SemDeDup) plus the engine's documented
conventions (splitmix64 scalar hash, pandas-SipHash string hash,
polynomial k-gram window hash, 6-dp cosine rounding, lowest-id-wins).
All 13 target pipelines are bitwise partition-invariant (verified
empirically at 4 vs 16 cpus and 128 MiB vs 2 MiB block sizes), so a
single-process re-derivation over the canonical row order is exact.

Snapshots are keyed on the full input content (md5 of canonical row
strings, embeddings quantized to int64 at 1e-6 with half-away-from-zero
rounding so DuckDB reproduces the key) — any fixture drift empties the
oracle loudly. For the three generator-input queries (bloom_fpr_check,
multimodal_features, sketch_lineage) the key is the md5 of the
REGENERATED input; pytest pins snapshot == regeneration == live.
"""

from __future__ import annotations

import hashlib
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from independent_sketches import hash_str, splitmix64  # noqa: E402

U = np.uint64
SNAPSHOT_DIR = "/root/repo/fixtures/pipeline_snapshots"

_POLY_B = U(0x9E3779B97F4A7C15)
_H2_SALT = U(0xD6E8FEB86659FD93)


# --------------------------------------------------------------- hashing
def kgram_hashes(tokens: np.ndarray, k: int) -> np.ndarray:
    """Polynomial window hash of every k-gram of one token row:
    H[i] = splitmix64( sum_j splitmix64(tok[i+j]) * B^(k-1-j) mod 2^64 )."""
    u = splitmix64(np.asarray(tokens).astype(U))
    n = len(u)
    nw = n - k + 1
    if nw <= 0:
        return np.empty(0, dtype=U)
    H = np.zeros(nw, dtype=U)
    with np.errstate(over="ignore"):
        for j in range(k):
            H = (H * _POLY_B + u[j : j + nw]).astype(U)
    return splitmix64(H)


def bloom_indices(h: np.ndarray, i: int, num_bits: int, num_hashes: int) -> np.ndarray:
    """Kirsch-Mitzenmacher double hashing h1 + i*h2 (mod m)."""
    if num_hashes == 1:
        return (h % U(num_bits)).astype(np.int64)
    h2 = splitmix64(h ^ _H2_SALT) | U(1)
    with np.errstate(over="ignore"):
        return ((h + U(i) * h2) % U(num_bits)).astype(np.int64)


class IndepBloom:
    def __init__(self, num_bits: int, num_hashes: int):
        self.m, self.K = num_bits, num_hashes
        self.bits = np.zeros(num_bits, dtype=np.uint8)
        self.n_added = 0

    def add(self, h: np.ndarray) -> None:
        h = np.ascontiguousarray(h, dtype=U)
        for i in range(self.K):
            self.bits[bloom_indices(h, i, self.m, self.K)] = 1
        self.n_added += int(h.size)

    def contains(self, h: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(h, dtype=U)
        out = np.ones(h.size, dtype=bool)
        for i in range(self.K):
            out &= self.bits[bloom_indices(h, i, self.m, self.K)] != 0
        return out

    def fill_ratio(self) -> float:
        return int(self.bits.sum()) / self.m

    def estimate(self) -> float:
        t = self.fill_ratio()
        return -self.m / self.K * float(np.log1p(-t))


# ------------------------------------------------------------- t-digest
class IndepTDigest:
    """Dunning-Ertl merging t-digest: k1 (asin) scale function, q-limit
    merge pass over the sorted buffer, exact min/max tails, merge =
    compress-other + append + recompress. Matches the engine's digest
    bit-for-bit when fed the same (block, group) partial structure."""

    def __init__(self, compression: float = 200.0, buffer_size: int = 4096):
        self.compression = float(compression)
        self.buffer_size = buffer_size
        self.means = np.empty(0)
        self.weights = np.empty(0)
        self._buf: list = []
        self._buf_n = 0
        self.min = np.inf
        self.max = -np.inf
        self.total = 0.0

    def _qlimit(self, q0: float) -> float:
        two_pi = 2.0 * np.pi
        kk = self.compression / two_pi * np.arcsin(
            2.0 * min(max(q0, 0.0), 1.0) - 1.0
        )
        return float(
            (np.sin(min((kk + 1.0) * two_pi / self.compression, np.pi / 2)) + 1.0)
            / 2.0
        )

    def update_values(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        w = np.ones_like(v)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self.total += float(w.sum())
        self._buf.append(np.stack([v, w]))
        self._buf_n += v.size
        if self._buf_n >= self.buffer_size:
            self._compress()

    def _compress(self) -> None:
        if self._buf:
            bv = np.concatenate([b[0] for b in self._buf])
            bw = np.concatenate([b[1] for b in self._buf])
            means = np.concatenate([self.means, bv])
            weights = np.concatenate([self.weights, bw])
            self._buf, self._buf_n = [], 0
        else:
            means, weights = self.means, self.weights
        if means.size == 0:
            return
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = float(weights.sum())
        out_m, out_w = [], []
        cur_m, cur_w = float(means[0]), float(weights[0])
        w_before = 0.0
        ql = self._qlimit(0.0)
        for i in range(1, means.size):
            m, w = float(means[i]), float(weights[i])
            if (w_before + cur_w + w) / total <= ql:
                cur_m += (m - cur_m) * w / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_before += cur_w
                ql = self._qlimit(w_before / total)
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def merge(self, other: "IndepTDigest") -> "IndepTDigest":
        other._compress()
        if other.means.size:
            self._buf.append(np.stack([other.means, other.weights]))
            self._buf_n += other.means.size
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.total += other.total
        self._compress()
        return self

    def cdf(self, x):
        """Pinned twin of state.TDigest.cdf (same interpolation,
        min/max clamps and clip)."""
        self._compress()
        xs = np.atleast_1d(np.asarray(x, dtype=np.float64))
        if self.means.size == 0:
            return np.full(xs.shape, np.nan)
        m, w = self.means, self.weights
        total = float(w.sum())
        centers = np.cumsum(w) - w / 2.0
        out = np.interp(xs, m, centers) / total
        out[xs < self.min] = 0.0
        out[xs > self.max] = 1.0
        return np.clip(out, 0.0, 1.0)

    def quantile(self, qs):
        self._compress()
        qs = np.atleast_1d(np.asarray(qs, dtype=np.float64))
        if self.means.size == 0:
            return np.full(qs.shape, np.nan)
        m, w = self.means, self.weights
        if m.size == 1:
            out = np.full(qs.shape, m[0])
        else:
            centers = np.cumsum(w) - w / 2.0
            out = np.interp(qs * float(w.sum()), centers, m,
                            left=self.min, right=self.max)
        return np.clip(out, self.min, self.max)


def engine_num_blocks(parquet_path: str) -> int:
    """The engine's file-size-derived read parallelism: ~1 MB/block
    clamped to [4, 64] (relational.read docstring)."""
    return max(4, min(64, os.path.getsize(parquet_path) >> 20))


def tdigest_grouped_chunked(values: np.ndarray, groups: np.ndarray,
                            n_blocks: int, qs) -> dict:
    """Replicates the engine's distributed digest structure exactly:
    one partial per (contiguous block, group) in row order, each
    compressed at the task/serialization boundary, folded sequentially
    in block order. Returns {group: [quantiles]}."""
    n = len(values)
    bounds = [n * i // n_blocks for i in range(n_blocks + 1)]
    out = {}
    for g in sorted(set(groups)):
        parts = []
        for b in range(n_blocks):
            lo, hi = bounds[b], bounds[b + 1]
            sel = groups[lo:hi] == g
            t = IndepTDigest()
            t.update_values(values[lo:hi][sel])
            t._compress()  # serialize boundary compresses the partial
            parts.append(t)
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.merge(p)
        out[g] = [float(x) for x in acc.quantile(qs)]
    return out


def tdigest_quantiles(values, qs, compression: float = 200.0):
    """Single-digest form (exact for groups that stay singleton-sized
    under the k1 q-limit, e.g. the 25-doc per-source fixture groups)."""
    t = IndepTDigest(compression)
    t.update_values(values)
    q = t.quantile(qs)
    return [float(x) for x in np.atleast_1d(q)]


def kll_quantiles(values, qs, k: int = 200, seed: int = 0x6B6C6C):
    """KLL16 compactor hierarchy (level h weight 2^h, capacity
    k*(2/3)^depth, seeded every-other-item promotion). The engine's
    per-group counts never exceed level-0 capacity, so no compaction
    fires and the answer is the exact weighted-rank quantile; the full
    hierarchy is implemented anyway for fidelity."""
    C = 2.0 / 3.0
    levels = [np.empty(0, dtype=np.float64)]
    compactions = 0

    def cap(h: int) -> int:
        depth = len(levels) - 1 - h
        return max(2, int(np.ceil(k * (C**depth))))

    v = np.asarray(values, dtype=np.float64).ravel()
    v = v[~np.isnan(v)]
    if v.size == 0:
        return [float("nan")] * len(qs)
    mn, mx = float(v.min()), float(v.max())
    levels[0] = np.concatenate([levels[0], v])
    while sum(len(lv) for lv in levels) > sum(cap(h) for h in range(len(levels))):
        for h in range(len(levels)):
            if len(levels[h]) > cap(h):
                lv = np.sort(levels[h])
                rng = np.random.default_rng(seed + compactions)
                compactions += 1
                start = int(rng.integers(0, 2))
                promoted = lv[start::2]
                levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 == len(levels):
                    levels.append(np.empty(0, dtype=np.float64))
                levels[h + 1] = np.concatenate([levels[h + 1], promoted])
                break
        else:
            break
    vals = np.concatenate([lv for lv in levels if len(lv)])
    wts = np.concatenate(
        [np.full(len(lv), float(1 << h)) for h, lv in enumerate(levels) if len(lv)]
    )
    order = np.argsort(vals, kind="stable")
    vals, wts = vals[order], wts[order]
    cum = np.cumsum(wts)
    targets = np.asarray(qs, dtype=np.float64) * cum[-1]
    idx = np.clip(np.searchsorted(cum, targets, side="left"), 0, len(vals) - 1)
    return [float(x) for x in np.clip(vals[idx], mn, mx)]


def _ntok(texts) -> np.ndarray:
    return np.array(
        [sum(1 for w in t.split(" ") if w) for t in texts], dtype=np.float64
    )


def indep_ntok_quantiles(texts, sources, algo: str,
                         n_blocks: int = 4) -> pd.DataFrame:
    n_tok = _ntok(texts)
    src = np.asarray(sources)
    out = {"source": [], "p50": [], "p95": [], "p99": []}
    if algo == "tdigest":
        qmap = tdigest_grouped_chunked(n_tok, src, n_blocks, (0.5, 0.95, 0.99))
    else:
        qmap = {s: kll_quantiles(n_tok[src == s], (0.5, 0.95, 0.99))
                for s in sorted(set(sources))}
    for s in sorted(qmap):
        out["source"].append(s)
        out["p50"].append(qmap[s][0])
        out["p95"].append(qmap[s][1])
        out["p99"].append(qmap[s][2])
    return pd.DataFrame(out)


def indep_events_p95(event_types, values, n_blocks: int = 4) -> pd.DataFrame:
    et = np.asarray(event_types)
    vals = np.asarray(values, dtype=np.float64)
    qmap = tdigest_grouped_chunked(vals, et, n_blocks, (0.5, 0.95))
    out = {"event_type": [], "p50": [], "p95": []}
    for s in sorted(qmap):
        out["event_type"].append(s)
        out["p50"].append(qmap[s][0])
        out["p95"].append(qmap[s][1])
    return pd.DataFrame(out)


def indep_events_cdf_profile(event_types, values,
                             n_blocks: int = 4) -> pd.DataFrame:
    """From-spec twin of analytics.value_cdf_profile: the global
    t-digest builds CONTENT-partitioned (splitmix64 of the float64
    bit pattern % 16), each partition's multiset sorted ascending
    before one digest build, partials folded in partition-id order —
    invariant to block structure (n_blocks is accepted for signature
    stability but unused); per-row cdf quantized 1e-6 half-up,
    per-type integer mean (2s+n)//(2n)."""
    et = np.asarray(event_types)
    vals = np.asarray(values, dtype=np.float64)
    valid = vals[~np.isnan(vals)]
    h = splitmix64(valid.view(np.uint64)) % np.uint64(16)
    parts = []
    for dp in range(16):
        v = np.sort(valid[h == np.uint64(dp)])
        if len(v) == 0:
            continue
        t = IndepTDigest()
        t.update_values(v)
        t._compress()
        parts.append(t)
    acc = parts[0]
    for p_ in parts[1:]:
        acc = acc.merge(p_)
    keep = ~np.isnan(vals)
    u6 = np.trunc(acc.cdf(vals[keep]) * 1e6 + 0.5).astype(np.int64)
    df = pd.DataFrame({"event_type": et[keep], "u6": u6})
    g = df.groupby("event_type")["u6"].agg(["count", "sum"]).reset_index()
    nn = g["count"].to_numpy(np.int64)
    s = g["sum"].to_numpy(np.int64)
    return pd.DataFrame(
        {"event_type": g["event_type"], "n": nn,
         "mean_cdf": (2 * s + nn) // (2 * nn) / 1e6}
    ).sort_values("event_type").reset_index(drop=True)


# --------------------------------------------------- counting Bloom retract
def indep_bloom_retract(
    texts, sources, retract_source: str = "src7",
    num_bits: int = 1 << 22, num_hashes: int = 4,
) -> pd.DataFrame:
    keys = [f"{s}\x1f{t}" for s, t in zip(sources, texts)]
    h = hash_str(keys)
    retract = np.array([s == retract_source for s in sources])
    counts = np.zeros(num_bits, dtype=np.int64)
    w = np.where(retract, 0, 1)  # insert everything, retract = net 0
    for i in range(num_hashes):
        idx = bloom_indices(h, i, num_bits, num_hashes)
        np.add.at(counts, idx, w)
    hit = np.ones(len(h), dtype=bool)
    for i in range(num_hashes):
        hit &= counts[bloom_indices(h, i, num_bits, num_hashes)] > 0
    n_added, n_deleted = len(h), int(retract.sum())
    n_live = n_added - n_deleted
    fpr_bound = float(
        (1.0 - np.exp(-num_hashes * max(n_live, 0) / num_bits)) ** num_hashes
    )
    return pd.DataFrame(
        {
            "n_added": pd.array([n_added], dtype="int64"),
            "n_deleted": pd.array([n_deleted], dtype="int64"),
            "n_live": pd.array([n_live], dtype="int64"),
            "kept_contained": pd.array([int(hit[~retract].sum())], dtype="int64"),
            "kept_total": pd.array([int((~retract).sum())], dtype="int64"),
            "retracted_contained": pd.array([int(hit[retract].sum())], dtype="int64"),
            "retracted_total": pd.array([int(retract.sum())], dtype="int64"),
            "fpr_bound": [fpr_bound],
        }
    )


# ----------------------------------------------------------- embeddings
def normalize(mat: np.ndarray) -> np.ndarray:
    mat = mat.astype(np.float64, copy=False)
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((nbits, dim))


def bucket_of(Vn: np.ndarray, H: np.ndarray) -> np.ndarray:
    bits = (Vn @ H.T) > 0
    return (bits << np.arange(H.shape[0], dtype=np.uint64)).sum(axis=1).astype(U)


def _topk_frame(per_query: list) -> pd.DataFrame:
    df = pd.concat(per_query, ignore_index=True) if per_query else pd.DataFrame(
        {"qid": [], "vec_id": [], "cosine": []}
    )
    return df.sort_values(
        ["qid", "cosine", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


def indep_ann_lsh(
    ids: np.ndarray, V32: np.ndarray, k: int = 5, nq: int = 10,
    nbits: int = 8, seed: int = 7,
) -> pd.DataFrame:
    """Charikar hyperplane LSH with Hamming-1 multiprobe + exact
    rounded-cosine re-rank. Per-bucket top-k union → global top-k is
    exact for the candidate union, so the single-process form equals
    the engine's two-stage partial/merge top-k."""
    qmask = ids < nq
    qids = ids[qmask]
    qorder = np.argsort(qids)
    qids = qids[qorder]
    Q = normalize(V32[qmask][qorder])
    Vn = normalize(V32)
    H = hyperplanes(V32.shape[1], nbits, seed)
    buckets = bucket_of(Vn, H)
    qb = bucket_of(Q, H)
    rows = []
    for j in range(len(qids)):
        targets = {int(qb[j])} | {int(qb[j]) ^ (1 << i) for i in range(nbits)}
        cand = np.isin(buckets, list(targets)) & (ids != qids[j])
        if not cand.any():
            continue
        ci = ids[cand]
        cc = np.round(Vn[cand] @ Q[j], 6)
        order = np.lexsort((ci, -cc))[: min(k, len(ci))]
        rows.append(
            pd.DataFrame(
                {"qid": np.full(len(order), qids[j], dtype=np.int64),
                 "vec_id": ci[order], "cosine": cc[order]}
            )
        )
    return _topk_frame(rows)


def indep_sample_bottomk(ids: np.ndarray, n: int, seed: int) -> np.ndarray:
    """Global bottom-n row indices by (splitmix64(id^seed), id)."""
    h = splitmix64(ids.astype(np.int64).view(U) ^ U(seed))
    return np.lexsort((ids, h))[: min(n, len(ids))]


def indep_train_ivf(sample: np.ndarray, n_clusters: int = 16, iters: int = 10,
                    seed: int = 13) -> np.ndarray:
    rng = np.random.default_rng(seed)
    X = normalize(sample)
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                v = X[m].mean(axis=0)
                nn = np.linalg.norm(v)
                if nn > 0:
                    C[j] = v / nn
    return C


def indep_ann_ivf(
    ids: np.ndarray, V32: np.ndarray, k: int = 5, nq: int = 10,
    n_sample: int = 256, sample_seed: int = 17, n_clusters: int = 16,
    nprobe: int = 4,
) -> pd.DataFrame:
    take = indep_sample_bottomk(ids, n_sample, sample_seed)
    C = indep_train_ivf(V32[take].astype(np.float32), n_clusters)
    qmask = ids < nq
    qids = ids[qmask]
    qorder = np.argsort(qids)
    qids = qids[qorder]
    Q = normalize(V32[qmask][qorder])
    probe_lists = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    Vn = normalize(V32)
    assign = (Vn @ C.T).argmax(axis=1)
    rows = []
    for j in range(len(qids)):
        mask = np.isin(assign, probe_lists[j]) & (ids != qids[j])
        if not mask.any():
            continue
        ci = ids[mask]
        cc = np.round(Vn[mask] @ Q[j], 6)
        order = np.lexsort((ci, -cc))[: min(k, len(ci))]
        rows.append(
            pd.DataFrame(
                {"qid": np.full(len(order), qids[j], dtype=np.int64),
                 "vec_id": ci[order], "cosine": cc[order]}
            )
        )
    return _topk_frame(rows)


def indep_dedup_embedding_lsh(
    ids: np.ndarray, V32: np.ndarray, tau: float = 0.4, nbits: int = 6,
    n_tables: int = 6, max_bucket: int = 1024, seed: int = 11,
) -> pd.DataFrame:
    """Multi-table hyperplane LSH near-dup pairs, exact-cosine verified,
    max cosine per unordered pair, vec_a < vec_b."""
    Vn = normalize(V32)
    best: dict = {}
    for t in range(n_tables):
        H = hyperplanes(V32.shape[1], nbits, seed + t)
        b = bucket_of(Vn, H)
        for bucket in np.unique(b):
            members = np.flatnonzero(b == bucket)
            members = members[np.argsort(ids[members])][:max_bucket]
            if len(members) < 2:
                continue
            Vm = Vn[members]
            Cm = np.round(Vm @ Vm.T, 6)
            ia, ib = np.triu_indices(len(members), 1)
            hit = Cm[ia, ib] >= tau
            for a, bb, c in zip(members[ia[hit]], members[ib[hit]], Cm[ia, ib][hit]):
                key = (int(ids[a]), int(ids[bb]))
                if key not in best or c > best[key]:
                    best[key] = float(c)
    if not best:
        return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
    ks = sorted(best)
    return pd.DataFrame(
        {"vec_a": np.array([k[0] for k in ks], dtype=np.int64),
         "vec_b": np.array([k[1] for k in ks], dtype=np.int64),
         "cosine": np.array([best[k] for k in ks])}
    )


def indep_kmeans(ids: np.ndarray, V32: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Lloyd k-means with content-derived seeding (embeddings of the k
    smallest splitmix64(id)); single-block accumulation in row order."""
    h = splitmix64(ids.astype(np.int64).view(U))
    seed_idx = np.argsort(h)[:k]
    centroids = V32[seed_idx].astype(np.float64)
    M = V32.astype(np.float64)
    for _ in range(iters):
        d2 = (
            (M * M).sum(axis=1, keepdims=True)
            - 2.0 * (M @ centroids.T)
            + (centroids * centroids).sum(axis=1)
        )
        a = np.argmin(d2, axis=1)
        sums = np.zeros((k, M.shape[1]))
        np.add.at(sums, a, M)
        n = np.bincount(a, minlength=k).astype(np.int64)
        nz = n > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz] / n[nz, None]
    return centroids


def indep_semantic_dedup(
    ids: np.ndarray, V32: np.ndarray, k: int = 8, iters: int = 5,
    tau: float = 0.4, round_dp: int = 6,
) -> pd.DataFrame:
    cent = indep_kmeans(ids, V32, k, iters)
    M = V32.astype(np.float64)
    d2 = (M * M).sum(1, keepdims=True) - 2.0 * (M @ cent.T) + (cent * cent).sum(1)[None, :]
    cl = np.argmin(d2, axis=1).astype(np.int32)
    order = np.lexsort((ids, cl))
    sids, scl, SV = ids[order], cl[order], M[order]
    keep = np.ones(len(sids), dtype=bool)
    starts = np.concatenate(
        [[0], np.flatnonzero(scl[1:] != scl[:-1]) + 1, [len(scl)]]
    )
    for s, e in zip(starts[:-1], starts[1:]):
        if e - s < 2:
            continue
        Vn = normalize(SV[s:e])
        Cm = np.round(Vn @ Vn.T, round_dp)
        dup = (np.tril(Cm >= tau, -1)).any(axis=1)
        keep[s:e] = ~dup
    out = pd.DataFrame({"vec_id": sids, "cluster": scl, "keep": keep})
    return out.sort_values("vec_id").reset_index(drop=True)


_COV_Q = float(1 << 30)


def indep_embedding_pca(V32: np.ndarray, topk: int = 8) -> pd.DataFrame:
    """Exact covariance via int64 fixed-point sums (order-free), then
    the driver-side eigen-spectrum."""
    V = V32.astype(np.float64)
    n, d = V.shape

    def q(x):
        return np.trunc(x * _COV_Q + np.copysign(0.5, x)).astype(np.int64)

    iu, ju = np.triu_indices(d)
    sxy = q(V[:, iu] * V[:, ju]).sum(axis=0)
    sx_all = q(V).sum(axis=0)
    sx, sy = sx_all[iu], sx_all[ju]
    cov = (sxy / _COV_Q - (sx / _COV_Q) * (sy / _COV_Q) / n) / n
    cov = np.round(cov, 12)
    Cm = np.zeros((d, d))
    Cm[iu, ju] = cov
    Cm[ju, iu] = cov
    vals = np.linalg.eigvalsh(Cm)[::-1]
    total = vals.sum()
    kk = min(topk, d)
    return pd.DataFrame(
        {"component": np.arange(kk, dtype=np.int64),
         "eigenvalue": np.round(vals[:kk], 6),
         "explained_ratio": np.round(vals[:kk] / total, 6)}
    )


def indep_embedding_fd_pca(V32: np.ndarray, ell: int = 64, topk: int = 8) -> pd.DataFrame:
    """Frequent Directions sketch (shrink-on-full via thin SVD), fed the
    corpus in row order (the engine's single input block)."""
    M = V32.astype(np.float64)
    n, d = M.shape
    cap = 2 * ell
    B = np.zeros((cap, d))
    rows_used = 0
    delta_sum = 0.0

    def shrink():
        nonlocal rows_used, delta_sum
        _, s, vt = np.linalg.svd(B[:rows_used], full_matrices=False)
        s2 = s * s
        delta = float(s2[ell]) if len(s2) > ell else 0.0
        if delta > 0.0:
            delta_sum += delta
        keep = np.sqrt(np.clip(s2[:ell] - delta, 0.0, None))
        nz = int((keep > 0.0).sum())
        B[:] = 0.0
        if nz:
            B[:nz] = keep[:nz, None] * vt[:nz]
        rows_used = nz

    i = 0
    while i < n:
        take = min(cap - rows_used, n - i)
        B[rows_used : rows_used + take] = M[i : i + take]
        rows_used += take
        i += take
        if rows_used == cap:
            shrink()

    colsum = M.sum(axis=0)
    frob2 = float((M * M).sum())
    mu = colsum / n
    bb = B[:rows_used]
    covm = bb.T @ bb / n - np.outer(mu, mu)
    vals = np.linalg.eigvalsh(covm)[::-1]
    total = float(frob2 / n - mu @ mu)
    kk = min(topk, len(vals))
    return pd.DataFrame(
        {"component": np.arange(kk, dtype=np.int64),
         "eigenvalue": np.round(vals[:kk], 6),
         "explained_ratio": np.round(vals[:kk] / total, 6),
         "err_bound": np.round(np.full(kk, delta_sum / max(n, 1)), 6)}
    )


def indep_ann_pq(vids: np.ndarray, V32: np.ndarray, m: int = 4, ks: int = 16,
                 iters: int = 4, nq: int = 3, topk: int = 5) -> pd.DataFrame:
    """From-spec PQ/ADC (Jégou 2011): 1e-6-quantized vectors, seeds =
    ks smallest (splitmix64(vec_id), vec_id), per-subspace Lloyd with
    exact-integer (n, Σsubvec) folds, centroid = s/n; codes tie to the
    lowest index; ADC dist = Σ_j dtab[j, code_j] in fixed j order,
    truncated +0.5 to int64; top-k per query by (dist, vec_id), query
    row excluded."""
    vids = np.asarray(vids, dtype=np.int64)
    Q = quant_1e6(V32)
    n, D = Q.shape
    dsub = D // m
    h = splitmix64(vids.view(U))
    order = np.lexsort((vids, h))[:ks]
    C = Q[order].astype(np.float64).reshape(ks, m, dsub).transpose(1, 0, 2).copy()
    X = Q.astype(np.float64).reshape(n, m, dsub)
    Xi = X.astype(np.int64)

    def assign(Xm, Cb):
        d2 = ((Xm[:, :, None, :] - Cb[None, :, :, :]) ** 2).sum(axis=3)
        return np.argmin(d2, axis=2)

    for _ in range(iters):
        codes = assign(X, C)
        cnt = np.zeros((m, ks), np.int64)
        s = np.zeros((m, ks, dsub), np.int64)
        for j in range(m):
            np.add.at(cnt[j], codes[:, j], 1)
            np.add.at(s[j], codes[:, j], Xi[:, j, :])
        nz = cnt > 0
        C = C.copy()
        C[nz] = s[nz] / cnt[nz, None]

    codes = assign(X, C)
    qsel = np.flatnonzero(vids < nq)
    qsel = qsel[np.argsort(vids[qsel])]
    rows = []
    for qi in qsel:
        dt = ((X[qi][:, None, :] - C) ** 2).sum(axis=2)  # (m, ks)
        d = np.zeros(n, np.float64)
        for j in range(m):
            d = d + dt[j][codes[:, j]]
        dq = np.trunc(d + 0.5).astype(np.int64)
        keep = vids != vids[qi]
        vid, dqk = vids[keep], dq[keep]
        o = np.lexsort((vid, dqk))[:topk]
        for r, i in enumerate(o):
            rows.append((int(vids[qi]), int(vid[i]), int(dqk[i]), r + 1))
    return pd.DataFrame(rows, columns=["qid", "vec_id", "dist_q", "rank"])


def indep_exact_cos_topk(ids: np.ndarray, V32: np.ndarray, k: int = 5,
                         nq: int = 10) -> pd.DataFrame:
    """Brute-force rounded-cosine top-k (self excluded, ties by
    vec_id) — the exact anchor the LSH/IVF recall is measured against;
    mirrors similarity.ann_topk_exact's ranking rules."""
    qmask = ids < nq
    qids = ids[qmask]
    qorder = np.argsort(qids)
    qids = qids[qorder]
    Q = normalize(V32[qmask][qorder])
    Vn = normalize(V32)
    rows = []
    for j in range(len(qids)):
        c = np.round(Vn @ Q[j], 6)
        mask = ids != qids[j]
        ci, cc = ids[mask], c[mask]
        order = np.lexsort((ci, -cc))[: min(k, len(ci))]
        rows.append(pd.DataFrame(
            {"qid": np.full(len(order), qids[j], dtype=np.int64),
             "vec_id": ci[order], "cosine": cc[order]}
        ))
    return _topk_frame(rows)


def indep_exact_l2_topk(ids: np.ndarray, V32: np.ndarray, nq: int = 3,
                        topk: int = 5) -> pd.DataFrame:
    """Exact squared-L2 top-k on the 1e-6-quantized vectors (the PQ
    metric space), self excluded, ties by (d2, vec_id) — mirrors
    similarity.exact_l2_topk."""
    ids = np.asarray(ids, dtype=np.int64)
    Qv = quant_1e6(V32)
    qsel = np.flatnonzero(ids < nq)
    qsel = qsel[np.argsort(ids[qsel])]
    rows = []
    for qi in qsel:
        diff = Qv - Qv[qi][None, :]
        d2 = (diff * diff).sum(axis=1)
        mask = ids != ids[qi]
        ci, cd = ids[mask], d2[mask]
        order = np.lexsort((ci, cd))[: min(topk, len(ci))]
        for i in order:
            rows.append((int(ids[qi]), int(ci[i]), int(cd[i])))
    return pd.DataFrame(rows, columns=["qid", "vec_id", "d2"])


def indep_ann_recall_eval(vids: np.ndarray, V32: np.ndarray,
                          k: int = 5) -> pd.DataFrame:
    """recall@k of the three ANN paths against their exact anchors
    (LSH/IVF vs brute-force cosine on the 10-query set; PQ vs exact
    quantized L2 on its 3-query set) → one row per method, method asc.
    Mirrors the engine's ann_recall_eval composition."""
    truth_cos = indep_exact_cos_topk(vids, V32, k=k)
    truth_l2 = indep_exact_l2_topk(vids, V32)
    rows = []
    for method, res, truth in (
        ("ivf", indep_ann_ivf(vids, V32), truth_cos),
        ("lsh", indep_ann_lsh(vids, V32), truth_cos),
        ("pq", indep_ann_pq(vids, V32), truth_l2),
    ):
        hits = len(res[["qid", "vec_id"]].merge(truth[["qid", "vec_id"]]))
        total = len(truth)
        rec = float(np.trunc((hits / total if total else 0.0) * 1e6 + 0.5)
                    / 1e6)
        rows.append((method, k, int(truth["qid"].nunique()), hits, total,
                     rec))
    return pd.DataFrame(
        rows, columns=["method", "k", "n_queries", "hits", "total", "recall"]
    ).astype({"k": np.int64, "n_queries": np.int64, "hits": np.int64,
              "total": np.int64})


# ------------------------------------------ generator-input pipelines
def gen_sequences(n_rows: int, seed: int, start_id: int = 0,
                  vocab: int = 50_000, zipf_s: float = 1.1):
    """The engine's F1 synthetic corpus draws (same documented rng
    stream): returns (doc_ids, list-of-token-arrays, sources)."""
    rng = np.random.default_rng([seed, start_id])
    ln = rng.lognormal(mean=5.5, sigma=0.8, size=n_rows)
    lengths = np.clip(ln, 32, 8192).astype(np.int64)
    total = int(lengths.sum())
    flat = ((rng.zipf(zipf_s, size=total) - 1) % vocab).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    toks = [flat[offs[i] : offs[i + 1]] for i in range(n_rows)]
    doc_ids = [f"doc-{start_id + i:08d}" for i in range(n_rows)]
    sources = rng.choice(
        np.array(["web", "books", "code", "wiki"]),
        size=n_rows, p=np.array([0.70, 0.15, 0.10, 0.05]),
    )
    return doc_ids, toks, list(sources)


def gen_query_rows(corpus_ids, corpus_toks, n_rows: int, seed: int):
    """F2 probe rows: half verbatim corpus copies, half disjoint-vocab
    negatives. Returns (doc_ids, toks)."""
    rng = np.random.default_rng(seed)
    n_copy = n_rows // 2
    n_neg = n_rows - n_copy
    idx = np.sort(rng.choice(len(corpus_ids), size=n_copy, replace=False))
    ids = [corpus_ids[i] for i in idx]
    toks = [corpus_toks[i] for i in idx]
    ln = rng.lognormal(mean=5.5, sigma=0.8, size=n_neg)
    lengths = np.clip(ln, 32, 8192).astype(np.int64)
    total = int(lengths.sum())
    flat = rng.integers(50_000, 100_000, size=total).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(lengths)])
    for i in range(n_neg):
        ids.append(f"neg-{i:08d}")
        toks.append(flat[offs[i] : offs[i + 1]])
    return ids, toks


def indep_bloom_fpr_check(
    k: int = 4, P: int = 16, bits: int = 1 << 20, K: int = 4,
    n_corpus: int = 500, corpus_seed: int = 23, n_query: int = 200,
    query_seed: int = 24,
) -> pd.DataFrame:
    cids, ctoks, _ = gen_sequences(n_corpus, corpus_seed)
    qids_, qtoks = gen_query_rows(cids, ctoks, n_query, query_seed)
    shards = [IndepBloom(bits, K) for _ in range(P)]
    for toks in ctoks:
        h = kgram_hashes(toks, k)
        p = (h & U(P - 1)).astype(np.int64)
        for pi in range(P):
            sel = h[p == pi]
            if sel.size:
                shards[pi].add(sel)
    pos_member, neg_member = [], []
    for did, toks in zip(qids_, qtoks):
        h = kgram_hashes(toks, k)
        p = (h & U(P - 1)).astype(np.int64)
        member = np.zeros(len(h), dtype=bool)
        for pi in range(P):
            m = p == pi
            if m.any():
                member[m] = shards[pi].contains(h[m])
        (pos_member if did.startswith("doc-") else neg_member).append(member)
    pos = np.concatenate(pos_member)
    neg = np.concatenate(neg_member)
    n_distinct = max(s.estimate() for s in shards)
    bound = float((1.0 - np.exp(-K * n_distinct / bits)) ** K)
    return pd.DataFrame(
        {"zero_false_negatives": [bool(pos.all())],
         "n_probed_pos": [len(pos)],
         "empirical_fpr": [round(float(neg.mean()), 6)],
         "theoretical_bound": [round(bound, 6)],
         "fpr_within_bound": [bool(neg.mean() <= bound * 1.5 + 1e-4)]}
    )


def indep_sketch_lineage(
    n_rows: int = 400, seed: int = 17, rows_per_file: int = 100,
    epoch0_fragments: int = 2, k: int = 4, P: int = 8,
    bits: int = 1 << 16, K: int = 4,
) -> pd.DataFrame:
    """Checkpoint lineage re-derivation: fragments are 100-row chunks
    (start_id 0,100,200,300); epoch 0 covers the first two, epoch 1 the
    rest; per (epoch, partition): n_added = gram instances routed there,
    fill_ratio from the epoch-local Bloom bits."""
    frag_starts = list(range(0, n_rows, rows_per_file))
    epochs = [frag_starts[:epoch0_fragments], frag_starts[epoch0_fragments:]]
    rows = {"epoch": [], "part": [], "n_fragments": [], "n_added": [],
            "fill_ratio": []}
    for ei, starts in enumerate(epochs):
        shards = [IndepBloom(bits, K) for _ in range(P)]
        for st in starts:
            _, toks, _ = gen_sequences(min(rows_per_file, n_rows - st), seed,
                                       start_id=st)
            for tr in toks:
                h = kgram_hashes(tr, k)
                p = (h & U(P - 1)).astype(np.int64)
                for pi in range(P):
                    sel = h[p == pi]
                    if sel.size:
                        shards[pi].add(sel)
        for pi in range(P):
            if shards[pi].n_added == 0:
                continue
            rows["epoch"].append(ei)
            rows["part"].append(pi)
            rows["n_fragments"].append(len(starts))
            rows["n_added"].append(shards[pi].n_added)
            rows["fill_ratio"].append(shards[pi].fill_ratio())
    return pd.DataFrame(
        {"epoch": np.array(rows["epoch"], dtype=np.int32),
         "part": np.array(rows["part"], dtype=np.int32),
         "n_fragments": np.array(rows["n_fragments"], dtype=np.int32),
         "n_added": np.array(rows["n_added"], dtype=np.int64),
         "fill_ratio": np.array(rows["fill_ratio"])}
    )


def indep_multimodal_features(n: int = 64, seed: int = 5,
                              target_hw=(32, 32)) -> pd.DataFrame:
    """Synthetic media draws + the marked deterministic fake decode
    (content-seeded pixels), nearest-neighbour resize, mean/std/8-bin
    grey-histogram features rounded to 6 dp."""
    rng = np.random.default_rng([seed, n])
    w = rng.integers(16, 64, n).astype(np.int32)
    h = rng.integers(16, 64, n).astype(np.int32)
    frames = np.ones(n, np.int32)
    th, tw = target_hw
    out = {"media_id": [], "height": [], "width": [], "features": []}
    for i in range(n):
        payload = rng.integers(
            0, 256, int(3 * w[i] * h[i] * frames[i]), dtype=np.uint8
        ).tobytes()
        pseed = int(splitmix64(np.frombuffer(payload[:8].ljust(8, b"\0"),
                                             dtype=np.uint64))[0])
        px = np.random.default_rng(pseed).integers(
            0, 256, (int(h[i]), int(w[i]), 3), dtype=np.uint8
        )
        yi = (np.arange(th) * px.shape[0] // th).clip(0, px.shape[0] - 1)
        xi = (np.arange(tw) * px.shape[1] // tw).clip(0, px.shape[1] - 1)
        small = px[yi][:, xi].astype(np.float32) / 255.0
        grey = small.mean(axis=2)
        hist, _ = np.histogram(grey, bins=8, range=(0, 1))
        f = np.concatenate(
            [small.mean(axis=(0, 1)), small.std(axis=(0, 1)),
             hist / max(1, grey.size)]
        ).astype(np.float32)
        out["media_id"].append(f"image-{seed}-{i:06d}")
        out["height"].append(int(h[i]))
        out["width"].append(int(w[i]))
        out["features"].append([round(float(x), 6) for x in f])
    df = pd.DataFrame(out)
    df["height"] = df["height"].astype(np.int32)
    df["width"] = df["width"].astype(np.int32)
    # scalar feature columns (f00..f13): list columns are unsortable in
    # the driver's order-insensitive compare
    F = np.array(df.pop("features").tolist())
    for j in range(F.shape[1]):
        df[f"f{j:02d}"] = F[:, j]
    return df.sort_values("media_id").reset_index(drop=True)


# ----------------------------------------------------------- input keys
def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def quant_1e6(x: np.ndarray) -> np.ndarray:
    """Half-away-from-zero 1e-6 quantization, reproducible in DuckDB as
    CAST(TRUNC(CAST(e AS DOUBLE)*1000000 + 0.5*SIGN(e)) AS BIGINT)."""
    x = np.asarray(x, dtype=np.float64)
    return np.trunc(x * 1e6 + np.copysign(0.5, x)).astype(np.int64)


def indep_cdc_chunk_stats(
    ids, texts, sources,
    min_size: int = 16, avg_bits: int = 5, max_size: int = 128,
) -> pd.DataFrame:
    """From-spec sequential Gear-CDC (Xia et al. 2016 FastCDC's base
    rolling hash): gear table = splitmix64(byte+1); h iterates
    (h << 1) + gear[b] mod 2^64 from the DOC start with no reset at
    cuts; position i is a candidate when (h_i & (2^avg_bits − 1)) == 0;
    greedy cuts at the first candidate of length ≥ min_size, forced at
    max_size, doc tail is the final chunk. Chunk identity =
    (splitmix64(Σ (b_t+1)·B^(len−1−t) mod 2^64), len) with
    B = 0x9E3779B97F4A7C15. A chunk instance is a duplicate when an
    identical chunk occurs earlier in (doc_id, offset) order."""
    import bisect

    GEAR = splitmix64(np.arange(1, 257, dtype=U))
    B = 0x9E3779B97F4A7C15
    M = 1 << 64
    mask = (1 << avg_bits) - 1
    inst = []
    for did, text, src in sorted(zip(ids, texts, sources)):
        bs = (text or "").encode()
        n = len(bs)
        h = 0
        cand = []
        for i, b in enumerate(bs):
            h = ((h << 1) + int(GEAR[b])) % M
            if (h & mask) == 0:
                cand.append(i)
        s = 0
        while s < n:
            limit = min(s + max_size - 1, n - 1)
            lo = bisect.bisect_left(cand, s + min_size - 1)
            c = cand[lo] if lo < len(cand) else None
            cut = c if (c is not None and c <= limit) else limit
            hh = 0
            for t in range(s, cut + 1):
                hh = (hh * B + bs[t] + 1) % M
            inst.append((int(splitmix64(np.uint64(hh))), cut - s + 1,
                         int(did) * (1 << 21) + s, src))
            s = cut + 1
    inst.sort()
    seen = set()
    stats: dict = {}
    for ch, cl, ok, src in inst:
        st = stats.setdefault(src, [0, 0, 0, 0])
        st[0] += 1
        st[1] += cl
        if (ch, cl) in seen:
            st[2] += 1
            st[3] += cl
        else:
            seen.add((ch, cl))
    rows = [(k, *v) for k, v in sorted(stats.items())]
    df = pd.DataFrame(rows, columns=["source", "n_chunks", "bytes_total",
                                     "n_dup_chunks", "bytes_dup"])
    for c in df.columns[1:]:
        df[c] = df[c].astype(np.int64)
    return df


def indep_kcenter(vids, V32: np.ndarray, k: int = 16) -> pd.DataFrame:
    """From-spec greedy k-center (Gonzalez 1985 farthest-point
    traversal): distance = (1 − cosine rounded to 6 dp) in int64
    micro-units over float64-normalized vectors; seed = lowest vec_id
    (dist_q = −1); each round picks the unchosen max-min-distance
    point, ties to lowest id."""
    ids = np.asarray(vids, dtype=np.int64)
    Vn = normalize(np.asarray(V32))
    order = np.argsort(ids)
    ids, Vn = ids[order], Vn[order]
    if len(ids) == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                             "vec_id": pd.Series([], dtype=np.int64),
                             "dist_q": pd.Series([], dtype=np.int64)})
    rows = [(0, int(ids[0]), -1)]
    md = np.round((1 - np.round(Vn @ Vn[0], 6)) * 1e6).astype(np.int64)
    md[0] = -1
    for r in range(1, k):
        mx = int(md.max())
        if mx < 0:
            break
        best = int(ids[md == mx].min())
        bi = int(np.flatnonzero(ids == best)[0])
        rows.append((r, best, mx))
        md = np.minimum(md, np.round((1 - np.round(Vn @ Vn[bi], 6)) * 1e6)
                        .astype(np.int64))
        md[bi] = -1
    return pd.DataFrame(rows, columns=["rank", "vec_id", "dist_q"]).astype(np.int64)


def docs_src_key(ids, texts, sources) -> str:
    return _md5("\n".join(f"{i}|{t}|{s}" for i, t, s in
                          sorted(zip(ids, texts, sources))))


def embeddings_key(vec_ids, labels, V32: np.ndarray) -> str:
    order = np.argsort(np.asarray(vec_ids))
    lines = []
    for i in order:
        qv = quant_1e6(V32[i])
        lines.append(f"{int(vec_ids[i])}:{int(labels[i])}:" +
                     ",".join(str(int(x)) for x in qv))
    return _md5("\n".join(lines))


def events_value_key(event_ids, event_types, values) -> str:
    order = np.argsort(np.asarray(event_ids))
    eid = np.asarray(event_ids)[order]
    et = np.asarray(event_types)[order]
    qsum = int(quant_1e6(np.asarray(values)).sum())
    return _md5("\n".join(f"{int(i)}|{t}" for i, t in zip(eid, et))
                + f"|{qsum}")


def _indep_media_phash_rows(n: int = 64, seed: int = 5, n_variants: int = 8):
    """Regenerate the media_phash_dups input from spec: the
    synth_media_table(n, seed) draws + n_variants 're-encoded' rows
    (first 8 payload bytes kept — same content-seeded pixels — tail
    redrawn from default_rng([99, i]), media_ord = 1000+i)."""
    rng = np.random.default_rng([seed, n])
    w = rng.integers(16, 64, n).astype(np.int32)
    h = rng.integers(16, 64, n).astype(np.int32)
    _frames = np.ones(n, np.int32)
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, int(3 * w[i] * h[i]), dtype=np.uint8).tobytes()
        rows.append((i, payload, int(h[i]), int(w[i])))
    for i in range(n_variants):
        _, p, hh, ww = rows[i]
        tail = np.random.default_rng([99, i]).integers(
            0, 256, len(p) - 8, dtype=np.uint8
        ).tobytes()
        rows.append((1000 + i, p[:8] + tail, hh, ww))
    return rows


def indep_media_phash_dups(max_hamming: int = 3) -> pd.DataFrame:
    """From-spec dHash near-dup pairs: fake decode (splitmix64 of the
    first 8 payload bytes seeds default_rng pixels), integer grayscale
    (299r+587g+114b)//1000, 8×9 integer-NN resize, row-major
    right-greater bits; brute-force all pairs, keep hamming <= 3."""
    rows = _indep_media_phash_rows()
    fps = []
    for ord_, payload, h, w in rows:
        pseed = int(splitmix64(np.frombuffer(payload[:8].ljust(8, b"\0"),
                                             dtype=np.uint64))[0])
        px = np.random.default_rng(pseed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        g = (299 * px[:, :, 0].astype(np.int32)
             + 587 * px[:, :, 1].astype(np.int32)
             + 114 * px[:, :, 2].astype(np.int32)) // 1000
        yi = (np.arange(8) * h // 8).clip(0, h - 1)
        xi = (np.arange(9) * w // 9).clip(0, w - 1)
        s = g[yi][:, xi]
        bits = (s[:, 1:] > s[:, :-1]).ravel()
        fp = int(np.bitwise_or.reduce(
            bits.astype(np.uint64) << np.arange(64, dtype=np.uint64)))
        fps.append((ord_, fp))
    out = []
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            a, fa = fps[i]
            b, fb = fps[j]
            ham = bin(fa ^ fb).count("1")
            if ham <= max_hamming:
                out.append((min(a, b), max(a, b), ham))
    df = pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])
    df = df.astype({"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64})
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def media_phash_key() -> str:
    rows = _indep_media_phash_rows()
    return _md5("phash|" + "|".join(
        f"{o}:{hashlib.md5(p).hexdigest()}:{h}:{w}" for o, p, h, w in rows))


# ----------------------------------------------------------- HyperBall
def _indep_jaccard_pairs(ids, texts, k: int = 3,
                         threshold: float = 0.3) -> list:
    """From-spec exact word-k-gram Jaccard pairs (the doc_graph edge
    spec shared by the kcore/LPA SQL oracles): whitespace tokens with
    empties dropped, DISTINCT k-grams, i/(|A|+|B|-i) >= threshold,
    doc_a < doc_b."""
    grams: dict[int, set] = {}
    for i, tx in zip(ids, texts):
        w = [t for t in tx.split(" ") if t]
        grams[int(i)] = {
            " ".join(w[j:j + k]) for j in range(len(w) - k + 1)
        } if len(w) >= k else set()
    inv: dict[str, list] = {}
    for i, gs in grams.items():
        for g in gs:
            inv.setdefault(g, []).append(i)
    from collections import Counter

    inter: Counter = Counter()
    for g, ds in inv.items():
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                inter[(ds[x], ds[y])] += 1
    out = []
    for (a, b), i in inter.items():
        u = len(grams[a]) + len(grams[b]) - i
        if u > 0 and i / u >= threshold:
            out.append((a, b))
    return sorted(out)


def _indep_hb_registers(nodes: np.ndarray, p: int) -> np.ndarray:
    """(n, 2^p) uint8 HLL registers, each node's splitmix64 hash
    inserted: idx = top p bits, rank = (64-p) - bitlength(low) + 1
    (bitlength exact via 32-bit halves)."""
    h = splitmix64(nodes.astype(np.uint64))
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h & np.uint64((1 << (64 - p)) - 1)
    hi = (low >> np.uint64(32)).astype(np.float64)
    lo = (low & np.uint64(0xFFFFFFFF)).astype(np.float64)
    bitlen = np.zeros(len(h), dtype=np.int64)
    nz_hi = hi > 0
    bitlen[nz_hi] = 33 + np.floor(np.log2(hi[nz_hi])).astype(np.int64)
    nz_lo = ~nz_hi & (lo > 0)
    bitlen[nz_lo] = 1 + np.floor(np.log2(lo[nz_lo])).astype(np.int64)
    reg = np.zeros((len(h), m), dtype=np.uint8)
    reg[np.arange(len(h)), idx] = ((64 - p) - bitlen + 1).astype(np.uint8)
    return reg


def _indep_hb_estimate_micro(reg: np.ndarray) -> np.ndarray:
    """Per-row Flajolet HLL estimate in int64 micro-units; the
    determinism contract shared with the engine: ldexp terms are exact
    powers of two and np.sum over the LAST axis of a float64 matrix
    has a reduction tree that depends only on the row LENGTH m, so
    results are bitwise partition-invariant."""
    n, m = reg.shape
    alpha = 0.7213 / (1.0 + 1.079 / m)
    Z = np.sum(np.ldexp(1.0, -reg.astype(np.int64)), axis=1)
    E = alpha * m * m / Z
    zeros = (reg == 0).sum(axis=1)
    small = (E <= 2.5 * m) & (zeros > 0)
    if small.any():
        E = E.copy()
        E[small] = m * np.log(m / zeros[small].astype(np.float64))
    return np.trunc(E * 1e6 + 0.5).astype(np.int64)


def indep_hyperball_from_pairs(pairs: list, p: int = 7,
                               max_rounds: int = 32) -> pd.DataFrame:
    """From-spec sequential HyperBall (Boldi-Rosa-Vigna): synchronous
    per-round max-fold of neighbor HLL counters (self included),
    stopping when the monotone register sum stops changing; one row
    per radius t: {t, nf (summed per-node estimates, 6 dp), coverage
    (nf_t / nf_final, 6 dp)}."""
    cols = {"t": pd.Series(dtype=np.int64),
            "nf": pd.Series(dtype=np.float64),
            "coverage": pd.Series(dtype=np.float64)}
    if not pairs:
        return pd.DataFrame(cols)
    nodes = np.unique(np.array(
        [a for a, _ in pairs] + [b for _, b in pairs], dtype=np.int64))
    pos = {int(v): i for i, v in enumerate(nodes)}
    adj: list[set] = [set() for _ in nodes]
    for a, b in pairs:
        ia, ib = pos[int(a)], pos[int(b)]
        adj[ia].add(ib)
        adj[ib].add(ia)
    reg = _indep_hb_registers(nodes, p)
    nf_micro = [int(_indep_hb_estimate_micro(reg).sum())]
    regsum = int(reg.sum(dtype=np.int64))
    for _t in range(max_rounds):
        new = reg.copy()
        for v in range(len(nodes)):
            for u in adj[v]:
                np.maximum(new[v], reg[u], out=new[v])
        reg = new
        new_regsum = int(reg.sum(dtype=np.int64))
        if new_regsum == regsum:
            break
        regsum = new_regsum
        nf_micro.append(int(_indep_hb_estimate_micro(reg).sum()))
    final = nf_micro[-1]
    return pd.DataFrame(
        {"t": np.arange(len(nf_micro), dtype=np.int64),
         "nf": np.array(nf_micro, dtype=np.int64) / 1e6,
         "coverage": np.trunc(
             np.array(nf_micro, dtype=np.float64) / float(final) * 1e6 + 0.5
         ).astype(np.int64) / 1e6}
    )


def indep_hyperball(ids, texts, p: int = 7) -> pd.DataFrame:
    return indep_hyperball_from_pairs(_indep_jaccard_pairs(ids, texts), p=p)


def indep_hyperball_centrality_from_pairs(pairs: list,
                                          p: int = 7,
                                          max_rounds: int = 32) -> pd.DataFrame:
    """From-spec sequential HyperBall harmonic centrality:
    H(v) += round-half-up(max(est_t - est_{t-1}, 0) / t) in integer
    micro-units ((2*delta + t) // (2*t)) per synchronous round, until
    the monotone register sum stops changing; -> {node, harm(6dp)}."""
    cols = {"node": pd.Series(dtype=np.int64),
            "harm": pd.Series(dtype=np.float64)}
    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return pd.DataFrame(cols)
    nodes = np.unique(np.array(
        [x for pr in pairs for x in pr], dtype=np.int64))
    pos = {int(v): i for i, v in enumerate(nodes)}
    adj: list[set] = [set() for _ in nodes]
    for a, b in pairs:
        ia, ib = pos[int(a)], pos[int(b)]
        adj[ia].add(ib)
        adj[ib].add(ia)
    reg = _indep_hb_registers(nodes, p)
    est = _indep_hb_estimate_micro(reg)
    harm = np.zeros(len(nodes), dtype=np.int64)
    regsum = int(reg.sum(dtype=np.int64))
    for t in range(1, max_rounds + 1):
        new = reg.copy()
        for v in range(len(nodes)):
            for u in adj[v]:
                np.maximum(new[v], reg[u], out=new[v])
        reg = new
        e2 = _indep_hb_estimate_micro(reg)
        delta = np.maximum(e2 - est, 0)
        harm = harm + (2 * delta + t) // (2 * t)
        est = e2
        new_regsum = int(reg.sum(dtype=np.int64))
        if new_regsum == regsum:
            break
        regsum = new_regsum
    return pd.DataFrame({"node": nodes, "harm": harm / 1e6})


def indep_hyperball_centrality(ids, texts, p: int = 7) -> pd.DataFrame:
    return indep_hyperball_centrality_from_pairs(
        _indep_jaccard_pairs(ids, texts), p=p)


# ---------------------------------------------------------- random walks
_RW_K1 = np.uint64(0xBF58476D1CE4E5B9)
_RW_K2 = np.uint64(0x94D049BB133111EB)
_RW_K3 = np.uint64(0xA24BAED4963EE407)


def indep_random_walks_from_pairs(pairs: list, walks_per_node: int = 2,
                                  walk_len: int = 8) -> pd.DataFrame:
    """From-spec sequential DeepWalk corpus: symmetrize + dedup, W
    walks of L visits per node; step 0 = the start node; next hop =
    ascending-sorted neighbor at index splitmix64(splitmix64(cur) +
    splitmix64(node0)*K3 + walk*K1 + step*K2) % degree."""
    cols = {"node": pd.Series(dtype=np.int64),
            "walk": pd.Series(dtype=np.int64),
            "step": pd.Series(dtype=np.int64),
            "visit": pd.Series(dtype=np.int64)}
    adj: dict[int, list] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(int(a), set()).add(int(b))
        adj.setdefault(int(b), set()).add(int(a))
    if not adj:
        return pd.DataFrame(cols)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    rows = []
    for node0 in sorted(adj):
        for walk in range(walks_per_node):
            cur = node0
            rows.append((node0, walk, 0, cur))
            for step in range(1, walk_len):
                ns = adj[cur]
                # python-int arithmetic mod 2^64 == uint64 wraparound
                seed = (int(splitmix64(np.array([cur], np.uint64))[0])
                        + int(splitmix64(np.array([node0], np.uint64))[0])
                        * int(_RW_K3)
                        + walk * int(_RW_K1) + step * int(_RW_K2)) % 2**64
                h = int(splitmix64(np.array([seed], np.uint64))[0])
                cur = ns[h % len(ns)]
                rows.append((node0, walk, step, cur))
    df = pd.DataFrame(rows, columns=["node", "walk", "step", "visit"])
    df = df.astype({c: np.int64 for c in df.columns})
    return df.sort_values(["node", "walk", "step"]).reset_index(drop=True)


def indep_random_walks(ids, texts) -> pd.DataFrame:
    return indep_random_walks_from_pairs(_indep_jaccard_pairs(ids, texts))


# ------------------------------------------------------------ snapshots
def generate_pipeline_snapshots(
    sf_dirs=("/root/testdata/sf0.001", "/root/testdata/sf0.01"),
) -> dict:
    """name → pyarrow Table with key/ord columns for all 13 batch-3
    snapshot oracles. Embedding/doc/event queries key on input content
    (per sf); generator-input queries key on the regenerated input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    frames: dict[str, list] = {}

    def add(name, key, df):
        df = df.copy()
        df.insert(0, "key", key)
        df["ord"] = np.arange(len(df), dtype=np.int64)
        frames.setdefault(name, []).append(df)

    seen_keys: dict[str, set] = {}
    for sf in sf_dirs:
        d = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text", "source"])
        ids = d.column("doc_id").to_pylist()
        texts = d.column("text").to_pylist()
        sources = d.column("source").to_pylist()
        dsk = docs_src_key(ids, texts, sources)
        nb_docs = engine_num_blocks(f"{sf}/documents.parquet")
        add("ntok_quantiles_tdigest", dsk,
            indep_ntok_quantiles(texts, sources, "tdigest", n_blocks=nb_docs))
        add("ntok_quantiles_kll", dsk,
            indep_ntok_quantiles(texts, sources, "kll"))
        add("bloom_retract_reprobe", dsk, indep_bloom_retract(texts, sources))
        add("cuckoo_retract_reprobe", dsk, indep_cuckoo_retract(texts, sources))
        add("cdc_chunk_dedup", dsk, indep_cdc_chunk_stats(ids, texts, sources))
        add("doc_graph_hyperball", dsk, indep_hyperball(ids, texts))
        add("doc_walk_corpus", dsk, indep_random_walks(ids, texts))
        add("doc_graph_centrality", dsk, indep_hyperball_centrality(ids, texts))

        ev = pq.read_table(f"{sf}/events.parquet",
                           columns=["event_id", "event_type", "value"])
        evk = events_value_key(
            ev.column("event_id").to_numpy(zero_copy_only=False),
            ev.column("event_type").to_pylist(),
            ev.column("value").to_numpy(zero_copy_only=False),
        )
        add("events_value_p95_tdigest", evk,
            indep_events_p95(ev.column("event_type").to_pylist(),
                             ev.column("value").to_numpy(zero_copy_only=False),
                             n_blocks=engine_num_blocks(f"{sf}/events.parquet")))
        add("events_value_cdf", evk,
            indep_events_cdf_profile(
                ev.column("event_type").to_pylist(),
                ev.column("value").to_numpy(zero_copy_only=False),
                n_blocks=engine_num_blocks(f"{sf}/events.parquet")))

        em = pq.read_table(f"{sf}/embeddings.parquet",
                           columns=["vec_id", "embedding", "label"])
        vids = em.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        labels = em.column("label").to_numpy(zero_copy_only=False)
        flat = np.asarray(em.column("embedding").combine_chunks().flatten(),
                          dtype=np.float32)
        V = flat.reshape(len(vids), -1)
        emk = embeddings_key(vids, labels, V)
        if emk in seen_keys.setdefault("emb", set()):
            continue  # identical embeddings table across sf fixtures
        seen_keys["emb"].add(emk)
        add("ann_lsh", emk, indep_ann_lsh(vids, V))
        add("ann_ivf", emk, indep_ann_ivf(vids, V))
        add("dedup_embedding_lsh", emk, indep_dedup_embedding_lsh(vids, V))
        add("semantic_dedup", emk, indep_semantic_dedup(vids, V))
        add("embedding_pca", emk, indep_embedding_pca(V))
        add("embedding_fd_pca", emk, indep_embedding_fd_pca(V))
        add("ann_pq", emk, indep_ann_pq(vids, V))
        add("kcenter_coreset", emk, indep_kcenter(vids, V))
        add("ann_recall_eval", emk, indep_ann_recall_eval(vids, V))

    # generator-input queries: one snapshot row set, keyed on the
    # regenerated input content
    cids, ctoks, csrc = gen_sequences(500, 23)
    qids_, qtoks = gen_query_rows(cids, ctoks, 200, 24)
    fpr_key = _md5(
        "\n".join(f"{i}|{','.join(map(str, t))}" for i, t in zip(cids, ctoks))
        + "#" + "\n".join(f"{i}|{','.join(map(str, t))}"
                          for i, t in zip(qids_, qtoks))
    )
    add("bloom_fpr_check", fpr_key, indep_bloom_fpr_check())

    lids, ltoks, _ = gen_sequences(100, 17, start_id=0)
    lin_key = _md5("400|17|100|" + _md5(
        "\n".join(f"{i}|{','.join(map(str, t))}" for i, t in zip(lids, ltoks))))
    add("sketch_lineage", lin_key, indep_sketch_lineage())

    mm = indep_multimodal_features()
    mm_key = _md5("media|5|64|" + "|".join(
        f"{r.media_id}:{r.height}:{r.width}" for r in mm.itertuples()))
    add("multimodal_features", mm_key, mm)

    add("media_phash_dups", media_phash_key(), indep_media_phash_dups())

    return {name: pa.Table.from_pandas(pd.concat(dfs, ignore_index=True),
                                       preserve_index=False)
            for name, dfs in frames.items()}




class IndepCuckoo:
    """From-spec sequential cuckoo filter (Fan et al. 2014): fp =
    ((h>>48) % 65535) + 1; i1 = h % m; alt(i, fp) = (i ^
    splitmix64(fp ^ 0xA24BAED4963EE407)) % m; insert tries i1 then i2
    first-free-slot, then evicts (victim slot = kick % b) from i2;
    delete removes the first matching copy (i1 row scanned first).
    The membership REPORT is layout-independent at the fixture's load
    (a fingerprint always sits in one of its two buckets), so this
    sequential build checks the engine's wave-vectorized build."""

    _SALT = U(0xA24BAED4963EE407)

    def __init__(self, num_buckets: int, bucket_size: int = 4, max_kicks: int = 500):
        self.m, self.b, self.mk = num_buckets, bucket_size, max_kicks
        self.slots = np.zeros((num_buckets, bucket_size), dtype=np.uint16)

    def _fp(self, h):
        return int((int(h) >> 48) % 65535 + 1)

    def _alt(self, i, fp):
        return int((U(i) ^ splitmix64(U(fp) ^ self._SALT)) % U(self.m))

    def add(self, hashes):
        for h in hashes:
            fp = self._fp(h)
            i1 = int(U(h) % U(self.m))
            i2 = self._alt(i1, fp)
            placed = False
            for idx in (i1, i2):
                free = np.flatnonzero(self.slots[idx] == 0)
                if free.size:
                    self.slots[idx, free[0]] = fp
                    placed = True
                    break
            if not placed:
                idx, cur = i2, fp
                for kick in range(self.mk):
                    vs = kick % self.b
                    cur, self.slots[idx, vs] = int(self.slots[idx, vs]), cur
                    idx = self._alt(idx, cur)
                    free = np.flatnonzero(self.slots[idx] == 0)
                    if free.size:
                        self.slots[idx, free[0]] = cur
                        placed = True
                        break
                if not placed:
                    raise RuntimeError("indep cuckoo full")

    def delete(self, hashes):
        for h in hashes:
            fp = self._fp(h)
            i1 = int(U(h) % U(self.m))
            for idx in (i1, self._alt(i1, fp)):
                hit = np.flatnonzero(self.slots[idx] == fp)
                if hit.size:
                    self.slots[idx, hit[0]] = 0
                    break

    def contains(self, hashes):
        out = np.zeros(len(hashes), dtype=bool)
        for k, h in enumerate(hashes):
            fp = self._fp(h)
            i1 = int(U(h) % U(self.m))
            out[k] = (self.slots[i1] == fp).any() or (
                self.slots[self._alt(i1, fp)] == fp
            ).any()
        return out


def indep_cuckoo_retract(
    texts, sources, retract_source: str = "src7",
    num_buckets_per_part: int = 1 << 10, bucket_size: int = 4,
    num_partitions: int = 16,
) -> pd.DataFrame:
    keys = [f"{s}\x1f{t}" for s, t in zip(sources, texts)]
    h = hash_str(keys)
    retract = np.array([s == retract_source for s in sources])
    part = (h % U(num_partitions)).astype(np.int64)
    shards = {}
    for p in sorted(set(part.tolist())):
        m = part == p
        cf = IndepCuckoo(num_buckets_per_part, bucket_size)
        cf.add(np.sort(h[m]))
        cf.delete(np.sort(h[m & retract]))
        shards[p] = cf
    hit = np.zeros(len(h), dtype=bool)
    for p, cf in shards.items():
        m = part == p
        hit[m] = cf.contains(h[m])
    n_added, n_deleted = len(h), int(retract.sum())
    total_slots = sum(c.slots.size for c in shards.values())
    live_slots = sum(int((c.slots != 0).sum()) for c in shards.values())
    return pd.DataFrame({
        "n_added": pd.array([n_added], dtype="int64"),
        "n_deleted": pd.array([n_deleted], dtype="int64"),
        "n_live": pd.array([n_added - n_deleted], dtype="int64"),
        "kept_contained": pd.array([int(hit[~retract].sum())], dtype="int64"),
        "kept_total": pd.array([int((~retract).sum())], dtype="int64"),
        "retracted_contained": pd.array([int(hit[retract].sum())], dtype="int64"),
        "retracted_total": pd.array([int(retract.sum())], dtype="int64"),
        "load_factor": [round(live_slots / total_slots, 6)],
        "fpr_bound": [2.0 * bucket_size / 65535.0],
    })


if __name__ == "__main__":
    import pyarrow.parquet as pq

    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    for name, tbl in generate_pipeline_snapshots().items():
        pq.write_table(tbl, os.path.join(SNAPSHOT_DIR, f"{name}.parquet"))
        print(f"wrote {name}: {tbl.num_rows} rows")
