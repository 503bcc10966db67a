"""Distributed logistic regression: bit-parity with the single-process
reference at any partitioning, and real learning on separable data."""

import numpy as np
import pyarrow as pa
import pytest


def test_distributed_matches_reference_weights(ray_session, testdata_dir):
    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.pipelines.classifier import (
        _doc_features,
        _xy,
        reference_train,
        train_quality_classifier,
    )
    from bloomfilter_multithread_ray.pipelines.relational import read

    docs = read(testdata_dir, "documents", ["doc_id", "text", "source"])
    got = train_quality_classifier(docs, iters=10)
    t = pq.read_table(
        f"{testdata_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    X, y = _xy(_doc_features(t, "src0"))
    w = reference_train(X, y, iters=10)
    got_w = got[[f"w_{n}" for n in
                 ("bias", "log_ntok", "avg_tok_len", "ttr", "stop_ratio")]].to_numpy()[0]
    assert np.array_equal(got_w, np.round(w, 6))
    cm = got.iloc[0]
    assert cm["tp"] + cm["fp"] + cm["tn"] + cm["fn"] == cm["n"]


def test_partitioning_independence(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.classifier import (
        train_quality_classifier,
    )

    texts = [
        f"{'the a of and in ' * (3 + i % 5)}word{i} tail {'x y z ' * (i % 7)}"
        for i in range(60)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(60), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["src0" if i % 3 == 0 else "src1" for i in range(60)]),
        }
    )
    a = train_quality_classifier(
        ray.data.from_arrow(t).repartition(1), iters=8
    )
    b = train_quality_classifier(
        ray.data.from_arrow(t).repartition(7), iters=8
    )
    # int64 fixed-point gradient sums -> identical weights at any block count
    assert a.equals(b)


def test_learns_separable_planted_data(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.classifier import (
        train_quality_classifier,
    )

    # positives: long docs stuffed with stopwords; negatives: short,
    # stopword-free -> stop_ratio and log_ntok separate the classes
    pos = ["the a of and in to is " * 20] * 40
    neg = ["zebra quartz lint"] * 40
    t = pa.table(
        {
            "doc_id": pa.array(range(80), pa.int64()),
            "text": pa.array(pos + neg, pa.string()),
            "source": pa.array(["src0"] * 40 + ["src1"] * 40, pa.string()),
        }
    )
    out = train_quality_classifier(
        ray.data.from_arrow(t), iters=200, lr=2.0
    ).iloc[0]
    assert out["accuracy"] == 1.0
    assert out["tp"] == 40 and out["tn"] == 40


def test_dsir_scores_match_reference_and_partitioning(ray_session):
    import hashlib
    import math
    from collections import Counter

    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.classifier import dsir_scores

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(90):
        src = "tgt" if i % 5 == 0 else f"r{i % 2}"
        k = int(rng.integers(0, 30))  # includes empty docs
        pool = vocab[:8] if src == "tgt" else vocab
        rows.append({"doc_id": i, "source": src,
                     "text": " ".join(rng.choice(pool, size=k))})

    B = 128

    def bucket(g):
        return int.from_bytes(
            hashlib.md5(g.encode()).digest()[8:16], "little") % B

    def grams(t):
        w = [x for x in t.split() if x]
        return [w[i] + " " + w[i + 1] for i in range(len(w) - 1)]

    craw, ctgt = Counter(), Counter()
    for r in rows:
        for g in grams(r["text"]):
            b = bucket(g)
            craw[b] += 1
            if r["source"] == "tgt":
                ctgt[b] += 1
    Tr, Tt = sum(craw.values()), sum(ctgt.values())
    lam = {b: math.log((ctgt.get(b, 0) + 1) / (Tt + B))
           - math.log((craw.get(b, 0) + 1) / (Tr + B)) for b in range(B)}
    ref = {}
    for r in rows:
        cc = Counter(bucket(g) for g in grams(r["text"]))
        # engine adds per doc in ascending-bucket order
        ref[r["doc_id"]] = round(sum(cc[b] * lam[b] for b in sorted(cc)), 6)

    for par in (2, 8):
        out = dsir_scores(rd.from_items(rows).repartition(par),
                          target_source="tgt", n_buckets=B).to_pandas()
        got = dict(zip(out.doc_id.astype(int), out.dsir_score.astype(float)))
        assert len(got) == len(rows)
        for k, v in ref.items():
            assert abs(got[k] - v) < 1e-9, (par, k)

    # the point of the op: target-like docs rank higher
    tmean = np.mean([ref[r["doc_id"]] for r in rows if r["source"] == "tgt"])
    rmean = np.mean([ref[r["doc_id"]] for r in rows if r["source"] != "tgt"])
    assert tmean > rmean
    # empty / single-token docs score exactly 0
    empties = [r["doc_id"] for r in rows if len(r["text"].split()) < 2]
    assert empties and all(ref[d] == 0.0 for d in empties)
