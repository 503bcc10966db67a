"""Quality features vs pandas oracle; LangId accuracy on separable
synthetic languages; winnowing fingerprint guarantees."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


def test_quality_features_match_pandas_oracle():
    from bloomfilter_multithread_ray.stages.quality import STOPWORDS, make_quality_fn

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = make_quality_fn()(t).to_pandas().set_index("doc_id")
    for doc_id, text in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        w = [x for x in text.split(" ") if x]
        if not w:
            assert doc_id not in got.index
            continue
        r = got.loc[doc_id]
        assert r.n_tok == len(w)
        assert r.avg_tok_len == pytest.approx(round(sum(map(len, w)) / len(w), 6), abs=0)
        assert r.ttr == pytest.approx(round(len(set(w)) / len(w), 6), abs=0)
        assert r.stop_ratio == pytest.approx(
            round(sum(x in STOPWORDS for x in w) / len(w), 6), abs=0
        )


def test_langid_separable_synthetic():
    from bloomfilter_multithread_ray.stages.quality import (
        LangId,
        fit_langid_profiles,
    )

    rng = np.random.default_rng(3)
    vocab = {
        "aa": ["alpha", "aqua", "lava", "area", "data"],
        "oo": ["oolong", "moon", "brook", "wood", "spoon"],
        "zz": ["pizza", "buzz", "jazz", "fuzzy", "blizzard"],
    }
    texts, langs = [], []
    for lang, words in vocab.items():
        for _ in range(40):
            texts.append(" ".join(rng.choice(words, size=30)))
            langs.append(lang)
    order = rng.permutation(len(texts))
    texts, langs = [texts[i] for i in order], [langs[i] for i in order]
    profiles = fit_langid_profiles(texts[:60], langs[:60])
    clf = LangId(profiles)
    batch = pa.table(
        {"doc_id": pa.array(range(60, 120), pa.int64()),
         "text": pa.array(texts[60:], pa.string())}
    )
    out = clf(batch)
    acc = np.mean(np.asarray(out.column("lang_pred")) == np.asarray(langs[60:]))
    assert acc >= 0.95, acc


def test_fingerprint_shared_run_guarantee():
    from bloomfilter_multithread_ray.stages.quality import make_fingerprint_fn

    k, w = 4, 5
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(1000)]
    base = list(rng.choice(words, size=200))
    shared = list(rng.choice(words, size=k + w - 1 + 20))  # long shared run
    a = " ".join(base[:100] + shared + base[100:])
    b = " ".join(list(rng.choice(words, size=150)) + shared)
    fn = make_fingerprint_fn(k=k, window=w)
    out = fn(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                       "text": pa.array([a, b], pa.string())}))
    fa, fb = out.column("fp").to_pylist()
    assert set(fa) & set(fb), "long shared token run must share a fingerprint"
    # determinism: identical text -> identical fingerprint
    out2 = fn(pa.table({"doc_id": pa.array([1], pa.int64()),
                        "text": pa.array([a], pa.string())}))
    assert out2.column("fp").to_pylist()[0] == fa


def test_langid_pipeline_runs_on_testdata():
    from bloomfilter_multithread_ray.stages.quality import lang_id_pipeline

    t = pq.read_table(f"{SF}/documents.parquet", columns=["text", "lang"]).slice(0, 100)
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    out = lang_id_pipeline(
        ds, t.column("text").to_pylist(), t.column("lang").to_pylist()
    ).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"doc_id", "lang_pred", "lang_score"}
    assert out.lang_pred.isin(["de", "en", "es", "fr", "zh"]).all()


def test_fingerprint_vectorized_matches_scalar_reference():
    """The batch-vectorized winnowing kernel must equal a per-row
    scalar implementation (row-boundary masking is the risky part)."""
    import numpy as np
    import pyarrow as pa
    from numpy.lib.stride_tricks import sliding_window_view

    from bloomfilter_multithread_ray.functions.hashing import (
        hash_strings,
        kgram_hashes_flat,
    )
    from bloomfilter_multithread_ray.stages.quality import make_fingerprint_fn

    rng = np.random.default_rng(3)
    k, w = 3, 4
    vocab = [f"w{i}" for i in range(12)]
    texts = []
    for n in [0, 1, 2, k - 1, k, k + 1, k + w - 2, k + w - 1, 20, 57]:
        texts.append(" ".join(rng.choice(vocab, size=n)) if n else "")
    tbl = pa.table({"doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts)})
    out = make_fingerprint_fn(k=k, window=w)(tbl)

    for r, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        wh = hash_strings(pa.array(toks)) if toks else np.empty(0, np.uint64)
        offs = np.array([0, len(toks)], dtype=np.int64)
        g, _, _ = kgram_hashes_flat(wh, offs, k)
        if len(g) == 0:
            expect = np.empty(0, np.uint64)
        elif len(g) <= w:
            expect = np.array([g.min()], np.uint64)
        else:
            expect = np.unique(sliding_window_view(g, w).min(axis=1))
        got = np.sort(np.asarray(out.column("fp")[r].as_py(), dtype=np.uint64))
        assert np.array_equal(got, np.sort(expect)), f"row {r}"
        fpm = np.uint64(out.column("fp_min")[r].as_py())
        assert fpm == (expect.min() if len(expect) else np.uint64(0))
