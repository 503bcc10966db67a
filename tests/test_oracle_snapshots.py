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


def test_sketch_snapshots_match_fresh_regeneration():
    from independent_sketches import SNAPSHOT_DIR as SKDIR
    from independent_sketches import generate_sketch_snapshots

    fresh = generate_sketch_snapshots(SFS)
    for name, tbl in fresh.items():
        committed = pq.read_table(f"{SKDIR}/{name}.parquet")
        assert tbl.equals(committed), f"{name} snapshot differs from regeneration"


def test_sketch_pipelines_match_independent_impls(ray_session):
    """Live sketch pipelines == the from-spec reimplementations, bit
    for bit, on sf0.001 — the third leg of the snapshot-oracle pinning
    (snapshot == regeneration == live)."""
    import importlib.util

    import numpy as np
    import pandas as pd

    import independent_sketches as I

    spec = importlib.util.spec_from_file_location("_e_snap", "/root/repo/__ray_entry__.py")
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)
    qs = e.queries()

    sf = SFS[0]
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    texts = d.column("text").to_pylist()
    sources = d.column("source").to_pylist()
    ev = pq.read_table(f"{sf}/events.parquet", columns=["ts", "user_id"])
    ts_s = (ev.column("ts").to_numpy(zero_copy_only=False)
            .astype("datetime64[s]").astype(np.int64))
    uid = ev.column("user_id").to_numpy(zero_copy_only=False)
    ock = pq.read_table(f"{sf}/orders.parquet", columns=["o_custkey"]) \
        .column("o_custkey").to_numpy(zero_copy_only=False)

    want = {
        "distinct_tokens_hll": I.indep_distinct_tokens_hll(texts),
        "distinct_by_source_hll": I.indep_distinct_by_source_hll(texts, sources),
        "heavy_hitters_cms": I.indep_heavy_hitters_cms(texts),
        "token_f2_countsketch": I.indep_token_f2_countsketch(texts),
        "source_overlap_kmv": I.indep_source_overlap_kmv(
            texts, sources, "src0", "src1"),
        "events_sliding_distinct_hll": I.indep_sliding_distinct_hll(ts_s, uid),
        "join_size_events_orders_cs": I.indep_join_size_countsketch(uid, ock),
        "quality_classifier": I.indep_quality_classifier(texts, sources),
        "dedup_minhash_lsh": I.indep_dedup_minhash_lsh(
            d.column("doc_id").to_pylist(), texts),
        "dedup_simhash": I.indep_dedup_simhash(
            d.column("doc_id").to_pylist(), texts),
    }
    for name, w in want.items():
        got = qs[name](sf)
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), w.reset_index(drop=True),
            check_dtype=False)


def test_pipeline_snapshots_match_fresh_regeneration():
    import independent_pipelines as P

    fresh = P.generate_pipeline_snapshots(SFS)
    for name, tbl in fresh.items():
        committed = pq.read_table(f"{P.SNAPSHOT_DIR}/{name}.parquet")
        assert tbl.equals(committed), f"{name} snapshot differs from regeneration"


def test_pipeline_queries_match_independent_impls(ray_session):
    """Live batch-3 pipelines == the from-spec reimplementations, bit
    for bit, on sf0.001 — third leg of the snapshot-oracle pinning."""
    import importlib.util
    import shutil

    import pandas as pd

    import independent_pipelines as P

    spec = importlib.util.spec_from_file_location(
        "_e_snap3", "/root/repo/__ray_entry__.py")
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)
    qs = e.queries()

    sf = SFS[0]
    d = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    texts = d.column("text").to_pylist()
    sources = d.column("source").to_pylist()
    ev = pq.read_table(f"{sf}/events.parquet",
                       columns=["event_type", "value"])
    em = pq.read_table(f"{sf}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    vids = em.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    V = np.asarray(em.column("embedding").combine_chunks().flatten(),
                   dtype=np.float32).reshape(len(vids), -1)

    # lineage store must rebuild fresh or the no-op resume path returns
    # a previous session's (identical, but untested) manifest
    shutil.rmtree("/tmp/graft_lineage_store", ignore_errors=True)

    want = {
        "ntok_quantiles_tdigest": P.indep_ntok_quantiles(
            texts, sources, "tdigest",
            n_blocks=P.engine_num_blocks(f"{sf}/documents.parquet")),
        "ntok_quantiles_kll": P.indep_ntok_quantiles(texts, sources, "kll"),
        "bloom_retract_reprobe": P.indep_bloom_retract(texts, sources),
        "cuckoo_retract_reprobe": P.indep_cuckoo_retract(texts, sources),
        "events_value_p95_tdigest": P.indep_events_p95(
            ev.column("event_type").to_pylist(),
            ev.column("value").to_numpy(zero_copy_only=False),
            n_blocks=P.engine_num_blocks(f"{sf}/events.parquet")),
        "events_value_cdf": P.indep_events_cdf_profile(
            ev.column("event_type").to_pylist(),
            ev.column("value").to_numpy(zero_copy_only=False),
            n_blocks=P.engine_num_blocks(f"{sf}/events.parquet")),
        "ann_lsh": P.indep_ann_lsh(vids, V),
        "ann_ivf": P.indep_ann_ivf(vids, V),
        "dedup_embedding_lsh": P.indep_dedup_embedding_lsh(vids, V),
        "semantic_dedup": P.indep_semantic_dedup(vids, V),
        "embedding_pca": P.indep_embedding_pca(V),
        "embedding_fd_pca": P.indep_embedding_fd_pca(V),
        "ann_pq": P.indep_ann_pq(vids, V),
        "ann_recall_eval": P.indep_ann_recall_eval(vids, V),
        "bloom_fpr_check": P.indep_bloom_fpr_check(),
        "sketch_lineage": P.indep_sketch_lineage(),
        "multimodal_features": P.indep_multimodal_features(),
        "media_phash_dups": P.indep_media_phash_dups(),
        "doc_graph_hyperball": P.indep_hyperball(
            d.column("doc_id").to_pylist(), texts),
        "doc_walk_corpus": P.indep_random_walks(
            d.column("doc_id").to_pylist(), texts),
        "doc_graph_centrality": P.indep_hyperball_centrality(
            d.column("doc_id").to_pylist(), texts),
    }
    for name, w in want.items():
        got = qs[name](sf)
        if not isinstance(got, pd.DataFrame):
            got = got.to_pandas()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), w.reset_index(drop=True),
            check_dtype=False)
