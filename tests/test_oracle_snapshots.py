"""Pinned-snapshot oracle integrity: the committed snapshot parquets
must equal (a) a fresh regeneration by the independent per-document
reimplementations and (b) the live pipeline output — so a stale or
hand-edited snapshot, a drifted fixture, or an engine change all fail
loudly here before the driver ever sees a silent pass."""

import numpy as np
import pyarrow.parquet as pq

import ray.data

from independent_impls import SNAPSHOT_DIR, generate_snapshots

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01")


def test_snapshots_match_fresh_regeneration():
    lt, ft = generate_snapshots(SFS)
    lc = pq.read_table(f"{SNAPSHOT_DIR}/langid_snapshot.parquet")
    fc = pq.read_table(f"{SNAPSHOT_DIR}/fingerprint_snapshot.parquet")
    assert lt.equals(lc), "langid snapshot differs from regeneration"
    assert ft.equals(fc), "fingerprint snapshot differs from regeneration"


def test_fingerprint_pipeline_matches_independent_impl(ray_session):
    from bloomfilter_multithread_ray.stages.quality import make_fingerprint_fn

    from independent_impls import independent_fingerprint

    t = pq.read_table(f"{SFS[0]}/documents.parquet", columns=["doc_id", "text"])
    got = (
        ray.data.from_arrow(t).repartition(3)
        .map_batches(make_fingerprint_fn(), batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    order = np.argsort(t.column("doc_id").to_numpy(zero_copy_only=False))
    want = np.array(independent_fingerprint(t.column("text").to_pylist()),
                    dtype=np.uint64)[order]
    assert np.array_equal(got["fp_min"].to_numpy(dtype=np.uint64), want)


def test_langid_pipeline_matches_independent_impl(ray_session):
    from bloomfilter_multithread_ray.stages.quality import lang_id_pipeline

    from independent_impls import independent_lang_id

    t = pq.read_table(f"{SFS[0]}/documents.parquet",
                      columns=["doc_id", "text", "lang"])
    sample_t = t.column("text").to_pylist()[:200]
    sample_l = t.column("lang").to_pylist()[:200]
    got = (
        lang_id_pipeline(ray.data.from_arrow(t.select(["doc_id", "text"]))
                         .repartition(3), sample_t, sample_l)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    preds, scores = independent_lang_id(sample_t, sample_l,
                                        t.column("text").to_pylist())
    order = np.argsort(t.column("doc_id").to_numpy(zero_copy_only=False))
    assert list(got["lang_pred"]) == [preds[i] for i in order]
    assert np.array_equal(got["lang_score"].to_numpy(),
                          np.array(scores, dtype=np.float64)[order])
