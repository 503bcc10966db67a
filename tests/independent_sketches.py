"""Independent pure-numpy/pandas reimplementations of the DETERMINISTIC
sketch queries, for pinned-snapshot oracles (the lang_id/doc_fingerprint
pattern): HyperLogLog distinct counts (global / by group / sliding
window), Misra-Gries + count-min heavy hitters, Count-Sketch F2 and
AGMS join-size estimates, and bottom-k (KMV) set overlap.

NO pipeline code is imported — every sketch is re-derived here from its
published algorithm spec (Flajolet et al. 2007 HLL with linear-counting
fallback; Misra & Gries 1982; Cormode & Muthukrishnan 2005 CMS;
Charikar-Chen-Farach-Colton 2002 Count-Sketch with the AMS/AGMS
second-moment and inner-product estimators; Bar-Yossef et al. 2002 /
Beyer et al. 2007 KMV), sharing only the engine's two PUBLIC hash
conventions: pandas' keyed SipHash (``pd.util.hash_pandas_object``)
for strings and the standard splitmix64 finalizer (with its published
constants) for integers and double-hashing row derivation. These
queries are partitioning-invariant and deterministic (register max /
linear counters / set bottom-k; the MG stage is exact because the
fixture vocabulary is far below its capacity), so a pinned snapshot is
a legitimate oracle.

Snapshots are keyed by a content hash of the input table(s) (md5 of
the canonical row string — the same string the SQL side builds with
``md5(string_agg(..., chr(10) ORDER BY <unique key>))``), so a changed
fixture yields an EMPTY oracle: a loud row-count mismatch, never a
stale silent pass. ``tests/test_oracle_snapshots.py`` pins
snapshot == fresh regeneration == live pipeline.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

SNAPSHOT_DIR = "/root/repo/fixtures/sketch_snapshots"

U = np.uint64
_GAMMA = U(0x9E3779B97F4A7C15)
_M1 = U(0xBF58476D1CE4E5B9)
_M2 = U(0x94D049BB133111EB)
# double-hashing row-derivation salts (part of each sketch's spec)
_CMS_ROW_SALT = U(0xA24BAED4963EE407)
_CS_ROW_SALT = U(0x9E3779B97F4A7C15)
_CS_SIGN_SALT = U(0xC6A4A7935BD1E995)


def splitmix64(x) -> np.ndarray:
    z = np.asarray(x, dtype=U)
    with np.errstate(over="ignore"):
        z = (z + _GAMMA).astype(U)
        z = ((z ^ (z >> U(30))) * _M1).astype(U)
        z = ((z ^ (z >> U(27))) * _M2).astype(U)
        return (z ^ (z >> U(31))).astype(U)


def hash_str(strs) -> np.ndarray:
    """pandas keyed SipHash of exact UTF-8 bytes (deterministic across
    processes; the engine's string-hash convention)."""
    return pd.util.hash_pandas_object(
        pd.Series(strs), index=False, categorize=False
    ).to_numpy(dtype=U)


def _tokens(texts) -> list:
    out = []
    for t in texts:
        out.extend(w for w in t.split(" ") if w)
    return out


# ------------------------------------------------------------------ HLL
def _hll_registers(h: np.ndarray, p: int = 14) -> np.ndarray:
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if h.size:
        idx = (h >> U(64 - p)).astype(np.int64)
        low = h & U((1 << (64 - p)) - 1)
        bitlen = np.zeros(h.size, dtype=np.int64)
        nz = low != 0
        bitlen[nz] = np.floor(np.log2(low[nz].astype(np.float64))).astype(np.int64) + 1
        np.maximum.at(reg, idx, ((64 - p) - bitlen + 1).astype(np.uint8))
    return reg


def _hll_estimate(reg: np.ndarray) -> float:
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / float(np.ldexp(1.0, -reg.astype(np.int64)).sum())
    zeros = int((reg == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return raw


def indep_distinct_tokens_hll(texts, p: int = 14) -> pd.DataFrame:
    reg = _hll_registers(hash_str(_tokens(texts)), p)
    return pd.DataFrame({"estimate": [float(_hll_estimate(reg))],
                         "rel_error_bound": [1.04 / ((1 << p) ** 0.5)]})


def indep_distinct_by_source_hll(texts, sources, p: int = 14) -> pd.DataFrame:
    by = {}
    for t, s in zip(texts, sources):
        by.setdefault(s, []).append(t)
    out = {"source": [], "estimate": [], "rel_error_bound": []}
    for s in sorted(by):
        out["source"].append(s)
        out["estimate"].append(float(_hll_estimate(
            _hll_registers(hash_str(_tokens(by[s])), p))))
        out["rel_error_bound"].append(1.04 / ((1 << p) ** 0.5))
    return pd.DataFrame(out)


def indep_sliding_distinct_hll(
    ts_s, user_ids, bucket_s: int = 3600, window_buckets: int = 3, p: int = 14
) -> pd.DataFrame:
    """Per-bucket HLLs + sliding w-bucket register max (union is
    lossless merge). ts_s = epoch SECONDS (truncated), int64."""
    b = (np.asarray(ts_s, dtype=np.int64) // bucket_s) * bucket_s
    uid = np.asarray(user_ids, dtype=np.int64)
    regs = {int(bb): _hll_registers(splitmix64(uid[b == bb].astype(U)), p)
            for bb in np.unique(b)}
    starts = sorted({bb - j * bucket_s for bb in regs for j in range(window_buckets)})
    m = 1 << p
    ws, est = [], []
    for s in starts:
        acc = np.zeros(m, dtype=np.uint8)
        for j in range(window_buckets):
            r = regs.get(s + j * bucket_s)
            if r is not None:
                np.maximum(acc, r, out=acc)
        ws.append(s)
        est.append(float(_hll_estimate(acc)))
    return pd.DataFrame({"ws": pd.array(ws, dtype="int64"), "estimate": est,
                         "rel_error_bound": 1.04 / (m ** 0.5)})


# ------------------------------------------- CMS / Count-Sketch kernels
def _row_idx(h: np.ndarray, j: int, width: int, salt: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        h2 = (splitmix64(h ^ salt) | U(1)).astype(U)
        return ((h + U(j) * h2) % U(width)).astype(np.int64)


def _cs_sign(h: np.ndarray, j: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        s = splitmix64((h ^ _CS_SIGN_SALT) + U(2 * j + 1) * _CS_SIGN_SALT)
    return np.where((s >> U(63)).astype(bool), np.int64(1), np.int64(-1))


def _build_counts(h, width, depth, salt, signed):
    uniq, w = np.unique(h, return_counts=True)
    w = w.astype(np.int64)
    counts = np.zeros((depth, width), dtype=np.int64)
    for j in range(depth):
        v = _cs_sign(uniq, j) * w if signed else w
        np.add.at(counts[j], _row_idx(uniq, j, width, salt), v)
    return counts, int(w.sum())


def indep_heavy_hitters_cms(
    texts, topk: int = 20, width: int = 1 << 16, depth: int = 5,
    mg_capacity: int = 4096,
) -> pd.DataFrame:
    toks = _tokens(texts)
    # Misra-Gries never shrinks while distinct <= capacity, so its
    # counters are EXACT and err_bound is 0 on this corpus; assert the
    # precondition so a richer fixture fails loudly instead of drifting
    vals, cnts = np.unique(np.asarray(toks, dtype=object).astype(str),
                           return_counts=True)
    assert len(vals) <= mg_capacity, "vocab exceeds MG capacity: snapshot invalid"
    ranked = sorted(zip(vals.tolist(), cnts.tolist()),
                    key=lambda kv: (-kv[1], kv[0]))[:topk]
    tk = [t for t, _ in ranked]
    lower = np.array([c for _, c in ranked], dtype=np.int64)
    counts, total = _build_counts(hash_str(toks), width, depth,
                                  _CMS_ROW_SALT, signed=False)
    th = hash_str(pd.Series(tk, dtype="string"))
    est = np.full(len(tk), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        np.minimum(est, counts[j][_row_idx(th, j, width, _CMS_ROW_SALT)], out=est)
    return pd.DataFrame({"tok": pd.array(tk, dtype="object"),
                         "lower_cnt": lower, "est_cnt": est, "err_bound": 0,
                         "eps_bound": float((np.e / width) * total)})


def indep_token_f2_countsketch(
    texts, width: int = 1 << 13, depth: int = 7
) -> pd.DataFrame:
    counts, total = _build_counts(hash_str(_tokens(texts)), width, depth,
                                  _CS_ROW_SALT, signed=True)
    f2 = float(np.median((counts.astype(np.float64) ** 2).sum(axis=1)))
    return pd.DataFrame({"f2_estimate": [f2],
                         "rel_error_bound": [float(np.sqrt(2.0 / width))],
                         "point_err_bound": [3.0 * math.sqrt(max(f2, 0.0) / width)],
                         "n_tokens": [total]})


def indep_join_size_countsketch(
    left_keys, right_keys, width: int = 1 << 13, depth: int = 7
) -> pd.DataFrame:
    built = []
    for keys in (left_keys, right_keys):
        k = np.asarray(keys)
        k = k[~pd.isna(k)]
        built.append(_build_counts(splitmix64(k.astype(np.int64).astype(U)),
                                   width, depth, _CS_ROW_SALT, signed=True))
    (ca, na), (cb, nb) = built
    est = float(np.median((ca.astype(np.float64) * cb.astype(np.float64)).sum(axis=1)))
    fa = float(np.median((ca.astype(np.float64) ** 2).sum(axis=1)))
    fb = float(np.median((cb.astype(np.float64) ** 2).sum(axis=1)))
    return pd.DataFrame({"est_join_size": [est],
                         "err_bound": [3.0 * math.sqrt(max(fa, 0.0) * max(fb, 0.0) / width)],
                         "n_left": [na], "n_right": [nb]})


# ------------------------------------------------------------------ KMV
def indep_source_overlap_kmv(
    texts, sources, src_a: str, src_b: str, k: int = 1024
) -> pd.DataFrame:
    def bottomk(side):
        toks = set()
        for t, s in zip(texts, sources):
            if s == side:
                toks.update(w for w in t.split(" ") if w)
        return np.unique(hash_str(sorted(toks)))[:k]

    def est(h):
        if len(h) < k:
            return float(len(h))
        return (k - 1) / (float(h[k - 1]) / float(1 << 64))

    ha, hb = bottomk(src_a), bottomk(src_b)
    hu = np.unique(np.concatenate([ha, hb]))[:k]
    in_both = np.isin(hu, ha) & np.isin(hu, hb)
    jac = float(in_both.mean()) if len(hu) else 0.0
    eu = est(hu)
    return pd.DataFrame({"est_a": [est(ha)], "est_b": [est(hb)],
                         "est_union": [eu], "est_intersection": [jac * eu],
                         "est_jaccard": [jac],
                         "rel_error_bound": [1.0 / np.sqrt(k - 2)]})


# --------------------------------------- quality classifier (logistic)
_STOPWORDS = {"the", "a", "of", "and", "in", "to", "is"}
_QFIX = float(1 << 20)  # fixed-point gradient scale (part of the spec)


def indep_quality_classifier(
    texts, sources, label_source: str = "src0", iters: int = 20,
    lr: float = 0.5, round_dp: int = 6,
) -> pd.DataFrame:
    """Full-batch logistic regression with per-sample int64 fixed-point
    gradient quantization (the property that makes the distributed
    trainer partitioning-invariant, re-derived here single-process)."""
    X_rows, y_rows = [], []
    for t, s in zip(texts, sources):
        tk = [w for w in t.split(" ") if w]
        if not tk:
            continue
        n = len(tk)
        X_rows.append([1.0, np.log1p(float(n)),
                       sum(len(w) for w in tk) / n,
                       len(set(tk)) / n,
                       sum(1 for w in tk if w in _STOPWORDS) / n])
        y_rows.append(1.0 if s == label_source else 0.0)
    X = np.nan_to_num(np.array(X_rows, dtype=np.float64))
    y = np.array(y_rows, dtype=np.float64)
    n_total = len(y)
    w = np.zeros(5, dtype=np.float64)
    loss_q = 0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w)))
        gi = np.rint(X * (p - y)[:, None] * _QFIX).astype(np.int64).sum(axis=0)
        eps = 1e-12
        loss = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
        loss_q = int(np.rint(loss * _QFIX).astype(np.int64).sum())
        w = w - lr * (gi.astype(np.float64) / _QFIX) / max(n_total, 1)
    pred = (X @ w) > 0
    yb = y > 0.5
    tp, fp = int(np.sum(pred & yb)), int(np.sum(pred & ~yb))
    tn, fn = int(np.sum(~pred & ~yb)), int(np.sum(~pred & yb))
    out = {"n": np.int64(n_total), "tp": np.int64(tp), "fp": np.int64(fp),
           "tn": np.int64(tn), "fn": np.int64(fn),
           "accuracy": round(float(tp + tn) / max(n_total, 1), round_dp),
           "final_loss": round(loss_q / _QFIX / max(n_total, 1), round_dp)}
    for name, val in zip(("bias", "log_ntok", "avg_tok_len", "ttr", "stop_ratio"), w):
        out[f"w_{name}"] = round(float(val), round_dp)
    return pd.DataFrame([out])


# --------------------------------------- MinHash-LSH / SimHash pairs
_POLY_B = U(0x9E3779B97F4A7C15)


def _gram_hashes(tokens, k: int = 3) -> np.ndarray:
    """Word-k-gram shingle hashes: SipHash each token, splitmix64
    pre-mix, degree-(k-1) polynomial window in base POLY_B mod 2^64,
    splitmix64 finalize — the engine's published windowed-hash spec."""
    wh = hash_str(tokens) if tokens else np.empty(0, dtype=U)
    u = splitmix64(wh)
    nw = len(u) - k + 1
    if nw <= 0:
        return np.empty(0, dtype=U)
    H = np.zeros(nw, dtype=U)
    with np.errstate(over="ignore"):
        for j in range(k):
            H = (H * _POLY_B + u[j:j + nw]).astype(U)
    return splitmix64(H)


def indep_dedup_minhash_lsh(
    ids, texts, k: int = 3, num_perm: int = 128, threshold: float = 0.5,
    max_bucket: int = 256, bands: int = 32,
) -> pd.DataFrame:
    """Banded-MinHash near-dup pairs {doc_a, doc_b, est_jaccard}: docs
    with >= k tokens get a num_perm signature (min over shingles of
    splitmix64(gh ^ seed_p)); each band's key chains splitmix64 over
    its rows; per-bucket doc-sorted cap, signature-agreement estimate,
    keep >= threshold, max estimate per pair."""
    seeds = splitmix64(np.arange(1, num_perm + 1, dtype=U) * _GAMMA)
    sig_ids, sigs = [], []
    for i, t in zip(ids, texts):
        gh = _gram_hashes([w for w in t.split(" ") if w], k)
        if len(gh) == 0:
            continue
        sig = np.empty(num_perm, dtype=U)
        for p in range(num_perm):
            sig[p] = splitmix64(gh ^ seeds[p]).min()
        sig_ids.append(i)
        sigs.append(sig)
    if not sigs:
        return pd.DataFrame({"doc_a": pd.Series(dtype=np.int64),
                             "doc_b": pd.Series(dtype=np.int64),
                             "est_jaccard": pd.Series(dtype=np.float64)})
    sig_ids = np.array(sig_ids, dtype=np.int64)
    S = np.vstack(sigs)
    rpb = num_perm // bands
    buckets: dict = {}
    for r in range(len(sig_ids)):
        for b in range(bands):
            acc = U(b + 1)
            for j in range(rpb):
                acc = splitmix64(np.array([acc ^ S[r, b * rpb + j]], dtype=U))[0]
            buckets.setdefault(int(acc), set()).add(r)
    best: dict = {}
    for rows in buckets.values():
        rows = sorted(rows, key=lambda r: sig_ids[r])[:max_bucket]
        for x in range(len(rows)):
            for yv in range(x + 1, len(rows)):
                ra, rb = rows[x], rows[yv]
                est = float((S[ra] == S[rb]).mean())
                if est >= threshold:
                    key = (int(sig_ids[ra]), int(sig_ids[rb]))
                    if est > best.get(key, -1.0):
                        best[key] = est
    pairs = sorted(best.items())
    return pd.DataFrame({"doc_a": [a for (a, _), __ in pairs],
                         "doc_b": [b for (_, b), __ in pairs],
                         "est_jaccard": [e for _, e in pairs]})


def indep_dedup_simhash(
    ids, texts, max_hamming: int = 3, max_bucket: int = 512
) -> pd.DataFrame:
    """SimHash near-dup pairs {doc_a, doc_b, hamming}: 64-bit majority
    fingerprint over token-occurrence hash bits, pigeonhole banding
    into max_hamming+1 chunks (exact recall), exact Hamming verify,
    min hamming per pair. Zero-token docs carry fingerprint 0 (the
    engine's convention)."""
    n = len(ids)
    sh = np.zeros(n, dtype=U)
    for r, t in enumerate(texts):
        tk = [w for w in t.split(" ") if w]
        if not tk:
            continue
        h = hash_str(tk)
        word = U(0)
        half = len(tk) / 2.0
        for i in range(64):
            if int(((h >> U(i)) & U(1)).sum()) > half:
                word |= U(1) << U(i)
        sh[r] = word
    chunks = max_hamming + 1
    width = 64 // chunks
    mask = U((1 << width) - 1)
    ids = np.asarray(ids, dtype=np.int64)
    buckets: dict = {}
    for r in range(n):
        for c in range(chunks):
            chunk = (sh[r] >> U(c * width)) & mask
            key = int(splitmix64(np.array([chunk ^ (U(c + 1) << U(56))], dtype=U))[0])
            buckets.setdefault(key, set()).add(r)
    best: dict = {}
    for rows in buckets.values():
        rows = sorted(rows, key=lambda r: ids[r])[:max_bucket]
        for x in range(len(rows)):
            for yv in range(x + 1, len(rows)):
                ra, rb = rows[x], rows[yv]
                ham = bin(int(sh[ra] ^ sh[rb])).count("1")
                if ham <= max_hamming:
                    key = (int(ids[ra]), int(ids[rb]))
                    if ham < best.get(key, 99):
                        best[key] = ham
    pairs = sorted(best.items())
    return pd.DataFrame({"doc_a": [a for (a, _), __ in pairs],
                         "doc_b": [b for (_, b), __ in pairs],
                         "hamming": pd.array([h for _, h in pairs], dtype=np.int32)})


# -------------------------------------------------- snapshot generation
def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _docs_key(ids, texts) -> str:
    return _md5("\n".join(f"{i}|{t}" for i, t in sorted(zip(ids, texts))))


def _docs_src_key(ids, texts, sources) -> str:
    return _md5("\n".join(
        f"{i}|{t}|{s}" for i, t, s in sorted(zip(ids, texts, sources))))


def _events_key(event_ids, ts_us, user_ids) -> str:
    rows = sorted(zip(event_ids, ts_us, user_ids))
    return _md5("\n".join(f"{e}|{t}|{u}" for e, t, u in rows))


def _join_key(event_ids, user_ids, orderkeys, custkeys) -> str:
    a = _md5("\n".join(str(u) for _, u in sorted(zip(event_ids, user_ids))))
    b = _md5("\n".join(str(c) for _, c in sorted(zip(orderkeys, custkeys))))
    return _md5(a + b)


def generate_sketch_snapshots(
    sf_dirs=("/root/testdata/sf0.001", "/root/testdata/sf0.01"),
) -> dict:
    """name → pyarrow Table (with ``key`` dispatch and ``ord`` row-order
    columns) for all seven sketch-query snapshots."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    frames: dict[str, list] = {}

    def add(name, key, df):
        df = df.copy()
        df.insert(0, "key", key)
        df["ord"] = np.arange(len(df), dtype=np.int64)
        frames.setdefault(name, []).append(df)

    for sf in sf_dirs:
        d = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text", "source"])
        ids = d.column("doc_id").to_pylist()
        texts = d.column("text").to_pylist()
        sources = d.column("source").to_pylist()
        dk = _docs_key(ids, texts)
        dsk = _docs_src_key(ids, texts, sources)
        add("distinct_tokens_hll", dk, indep_distinct_tokens_hll(texts))
        add("heavy_hitters_cms", dk, indep_heavy_hitters_cms(texts))
        add("token_f2_countsketch", dk, indep_token_f2_countsketch(texts))
        add("distinct_by_source_hll", dsk,
            indep_distinct_by_source_hll(texts, sources))
        add("source_overlap_kmv", dsk,
            indep_source_overlap_kmv(texts, sources, "src0", "src1"))
        add("quality_classifier", dsk,
            indep_quality_classifier(texts, sources))
        add("dedup_minhash_lsh", dk, indep_dedup_minhash_lsh(ids, texts))
        add("dedup_simhash", dk, indep_dedup_simhash(ids, texts))

        ev = pq.read_table(f"{sf}/events.parquet",
                           columns=["event_id", "ts", "user_id"])
        eid = ev.column("event_id").to_pylist()
        ts = ev.column("ts").to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        ts_s = ts.astype("datetime64[s]").astype(np.int64)
        uid = ev.column("user_id").to_numpy(zero_copy_only=False)
        add("events_sliding_distinct_hll",
            _events_key(eid, ts_us.tolist(), uid.tolist()),
            indep_sliding_distinct_hll(ts_s, uid))

        o = pq.read_table(f"{sf}/orders.parquet",
                          columns=["o_orderkey", "o_custkey"])
        add("join_size_events_orders_cs",
            _join_key(eid, uid.tolist(),
                      o.column("o_orderkey").to_pylist(),
                      o.column("o_custkey").to_pylist()),
            indep_join_size_countsketch(
                uid, o.column("o_custkey").to_numpy(zero_copy_only=False)))

    return {name: pa.Table.from_pandas(pd.concat(dfs, ignore_index=True),
                                       preserve_index=False)
            for name, dfs in frames.items()}


if __name__ == "__main__":
    import os

    import pyarrow.parquet as pq

    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    for name, tbl in generate_sketch_snapshots().items():
        pq.write_table(tbl, os.path.join(SNAPSHOT_DIR, f"{name}.parquet"))
        print(f"wrote {name}: {tbl.num_rows} rows")
