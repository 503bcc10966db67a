"""Unit tests for pipelines/curation.py: decontamination containment
semantics, deterministic sampling/mixing, stopword normalization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bloomfilter_multithread_ray.pipelines import curation as C


def _docs_ds(ray, rows, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(rows)).repartition(parallelism)


def test_decontaminate_containment_semantics(ray_session):
    # bench doc fully embedded in a longer candidate -> containment of
    # the CANDIDATE's grams found in bench, not Jaccard.
    bench_text = "alpha beta gamma delta"  # 2 grams of k=3
    cand_exact = "alpha beta gamma delta"  # containment 1.0
    cand_half = "alpha beta gamma zeta eta theta iota"  # 5 grams, 1 shared = 0.2
    rows = [
        {"doc_id": 0, "source": "bench", "text": bench_text},
        {"doc_id": 1, "source": "train", "text": cand_exact},
        {"doc_id": 2, "source": "train", "text": cand_half},
        {"doc_id": 3, "source": "train", "text": "totally unrelated words here now"},
    ]
    ds = _docs_ds(ray_session, rows)
    out = C.decontaminate_pairs(
        ds, bench_source="bench", k=3, threshold=0.5
    ).to_pandas()
    assert set(zip(out.doc_id, out.bench_id)) == {(1, 0)}
    assert out.containment.iloc[0] == pytest.approx(1.0)
    # lower the threshold: the 0.2-containment pair appears
    out2 = C.decontaminate_pairs(
        ds, bench_source="bench", k=3, threshold=0.15
    ).to_pandas()
    assert set(zip(out2.doc_id, out2.bench_id)) == {(1, 0), (2, 0)}
    got = out2.set_index("doc_id").containment
    assert got[2] == pytest.approx(1 / 5)


def test_decontaminate_never_pairs_same_side(ray_session):
    # two identical candidates, no bench overlap -> no pairs at all
    rows = [
        {"doc_id": 0, "source": "bench", "text": "x y z"},
        {"doc_id": 1, "source": "train", "text": "one two three four"},
        {"doc_id": 2, "source": "train", "text": "one two three four"},
    ]
    out = C.decontaminate_pairs(
        _docs_ds(ray_session, rows), bench_source="bench", k=3, threshold=0.1
    ).to_pandas()
    assert len(out) == 0


def test_stratified_sample_partitioning_independent(ray_session):
    rows = [
        {"doc_id": i, "source": f"s{i % 3}", "text": "t"} for i in range(60)
    ]
    a = C.stratified_sample(_docs_ds(ray_session, rows, 2), per_source=4)
    b = C.stratified_sample(_docs_ds(ray_session, rows, 7), per_source=4)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("source").size() == 4).all()
    # per source, these are the 4 smallest splitmix64 keys
    from bloomfilter_multithread_ray.functions.hashing import splitmix64

    for src, grp in a.groupby("source"):
        ids = np.array([i for i in range(60) if f"s{i % 3}" == src], dtype=np.uint64)
        want = set(ids[np.argsort(splitmix64(ids))[:4]].astype(np.int64))
        assert set(grp.doc_id) == want


def test_mix_to_budget_greedy_prefix_rule(ray_session):
    # every doc has 10 tokens; budget 35 -> exactly 4 admitted per
    # source (tok_before of the 4th is 30 < 35, of the 5th is 40).
    rows = [
        {"doc_id": i, "source": f"s{i % 2}", "text": " ".join(["w"] * 10)}
        for i in range(20)
    ]
    out = C.mix_to_budget(_docs_ds(ray_session, rows), budget_tokens=35)
    assert (out.groupby("source").size() == 4).all()
    assert (out.n_tok == 10).all()


def test_normalize_text_counts_and_empty(ray_session):
    rows = [
        {"doc_id": 0, "text": "the cat of the house"},
        {"doc_id": 1, "text": "the a of and in to is"},  # all stopwords
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "  spaced   out  "},
    ]
    out = (
        C.normalize_text(_docs_ds(ray_session, rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.clean_text) == ["cat house", "", "", "spaced out"]
    assert list(out.n_kept) == [2, 0, 0, 2]
    assert list(out.n_removed) == [3, 7, 0, 0]
