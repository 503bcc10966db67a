"""Independent (non-pipeline) reimplementations used to PIN oracle
snapshots — the same discipline as the kmeans snapshot oracle: the
engine's deterministic-but-not-SQL-expressible queries (`lang_id`,
`doc_fingerprint`) get a committed parquet snapshot whose rows are
produced HERE, by per-document pure-Python loops written fresh from
the documented algorithm specs — not by calling the pipeline code.
The only shared building blocks are the two hash primitives
(`splitmix64`, `hash_strings` = pandas SipHash), which are third-party
/ constant-defined and are themselves property-tested elsewhere.

Regenerate snapshots with:  python tests/independent_impls.py
(pytest asserts committed snapshots == a fresh regeneration == the
live pipeline output, so a stale snapshot fails loudly.)
"""

from __future__ import annotations

import numpy as np

SNAPSHOT_DIR = "/root/repo/fixtures"
_B = 0x9E3779B97F4A7C15  # polynomial base (functions/hashing._POLY_B)
_MASK = (1 << 64) - 1
_NBUCKETS = 1 << 12  # stages/quality._NBUCKETS


def _smix(x: int) -> int:
    """Scalar splitmix64 (Steele et al.), the spec the vectorized
    functions.hashing.splitmix64 implements."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _word_hashes(words: list[str]) -> list[int]:
    """Per-word uint64 via pandas' keyed SipHash — the shared string
    primitive (same bytes-in → same hash everywhere)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(pd.Series(words, dtype=object), index=False,
                                   categorize=False)
    return [int(v) for v in h.to_numpy(dtype=np.uint64)]


def independent_fingerprint(texts: list[str], *, k: int = 4, window: int = 5):
    """Winnowing fp_min per doc, per-document scalar loops:
    single-space split dropping empties, word SipHash → splitmix64
    pre-mix → polynomial k-window hash (Σ u[i+j]·B^(k-1-j) mod 2^64)
    → splitmix64 post-mix → min over all window minima (== global min
    of the doc's gram hashes; docs with < k tokens report fp_min = 0,
    the engine's no-grams sentinel). Returns uint64 list."""
    out = []
    for text in texts:
        words = [w for w in text.split(" ") if w != ""]
        if len(words) < k:
            out.append(0)
            continue
        u = [_smix(h) for h in _word_hashes(words)]
        grams = []
        for i in range(len(u) - k + 1):
            H = 0
            for j in range(k):
                H = (H * _B + u[i + j]) & _MASK
            grams.append(_smix(H))
        # winnowing keeps window minima; their min is the global min
        out.append(min(grams))
    return out


def _bigram_vector(text: str) -> np.ndarray:
    """Hashed byte-bigram counts: bucket = splitmix64(b1<<8|b2) % 4096
    over consecutive UTF-8 bytes of the document."""
    v = np.zeros(_NBUCKETS, dtype=np.float64)
    bs = text.encode("utf-8")
    for a, b in zip(bs, bs[1:]):
        v[_smix((a << 8) | b) % _NBUCKETS] += 1.0
    return v


def independent_lang_id(sample_texts, sample_langs, texts):
    """Per-language L2-normalized bigram profiles from the labeled
    sample; each doc scores cosine against every profile; pred =
    argmax (first of ties in sorted-language order), score = cosine
    rounded to 6 dp. Returns (preds, scores) lists."""
    langs = sorted(set(sample_langs))
    P = np.zeros((len(langs), _NBUCKETS))
    for t, l in zip(sample_texts, sample_langs):
        P[langs.index(l)] += _bigram_vector(t)
    P /= np.maximum(np.linalg.norm(P, axis=1, keepdims=True), 1e-12)
    preds, scores = [], []
    for t in texts:
        v = _bigram_vector(t)
        v = v / max(np.linalg.norm(v), 1e-12)
        sim = P @ v
        j = int(sim.argmax())
        preds.append(langs[j])
        scores.append(round(float(sim[j]), 6))
    return preds, scores


def _content_key(rows: list[tuple]) -> str:
    """md5 of the same string DuckDB's
    ``md5(string_agg(f1 || '|' || ... , chr(10) ORDER BY doc_id))``
    builds — the oracle's dispatch key."""
    import hashlib

    joined = "\n".join("|".join(str(x) for x in r) for r in sorted(rows))
    return hashlib.md5(joined.encode("utf-8")).hexdigest()


def generate_snapshots(sf_dirs=("/root/testdata/sf0.001", "/root/testdata/sf0.01")):
    """Build both snapshot tables over the given fixture dirs →
    (langid_table, fingerprint_table) as pyarrow Tables keyed by the
    per-sf content key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    lrows = {"key": [], "doc_id": [], "lang_pred": [], "lang_score": []}
    frows = {"key": [], "doc_id": [], "fp_min": []}
    for sf in sf_dirs:
        t = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text", "lang"])
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        langs = t.column("lang").to_pylist()
        # lang_id: sample = first 200 FILE-ORDER rows (the query's
        # pq.read_table(...).slice(0, 200))
        preds, scores = independent_lang_id(texts[:200], langs[:200], texts)
        lkey = _content_key(list(zip(ids, texts, langs)))
        order = np.argsort(ids)
        for i in order:
            lrows["key"].append(lkey)
            lrows["doc_id"].append(int(ids[i]))
            lrows["lang_pred"].append(preds[i])
            lrows["lang_score"].append(scores[i])
        fps = independent_fingerprint(texts)
        fkey = _content_key(list(zip(ids, texts)))
        for i in order:
            frows["key"].append(fkey)
            frows["doc_id"].append(int(ids[i]))
            frows["fp_min"].append(fps[i])
    lt = pa.table(
        {"key": pa.array(lrows["key"], pa.string()),
         "doc_id": pa.array(lrows["doc_id"], pa.int64()),
         "lang_pred": pa.array(lrows["lang_pred"], pa.string()),
         "lang_score": pa.array(lrows["lang_score"], pa.float64())}
    )
    ft = pa.table(
        {"key": pa.array(frows["key"], pa.string()),
         "doc_id": pa.array(frows["doc_id"], pa.int64()),
         "fp_min": pa.array(np.array(frows["fp_min"], dtype=np.uint64))}
    )
    return lt, ft


if __name__ == "__main__":
    import os

    import pyarrow.parquet as pq

    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    lt, ft = generate_snapshots()
    pq.write_table(lt, f"{SNAPSHOT_DIR}/langid_snapshot.parquet")
    pq.write_table(ft, f"{SNAPSHOT_DIR}/fingerprint_snapshot.parquet")
    print(f"wrote {lt.num_rows} langid rows, {ft.num_rows} fingerprint rows "
          f"to {SNAPSHOT_DIR}")
