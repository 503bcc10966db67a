"""Inverted-index store: bit-parity with the full-scan BM25 scorer,
partition pruning, manifest-last crash safety, edge cases."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from bloomfilter_multithread_ray.pipelines.inverted_index import (
        build_inverted_index,
    )

    d = str(tmp_path_factory.mktemp("invidx"))
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    man = build_inverted_index(docs, d, num_partitions=32)
    return d, man


def test_lookup_bit_identical_to_full_scan_bm25(store):
    from bloomfilter_multithread_ray.pipelines.inverted_index import inverted_lookup
    from bloomfilter_multithread_ray.pipelines.retrieval import (
        DEFAULT_QUERIES,
        bm25_search,
    )

    d, _ = store
    got = inverted_lookup(d, list(DEFAULT_QUERIES))
    ref = bm25_search(SF, DEFAULT_QUERIES)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), ref.reset_index(drop=True)
    )


def test_lookup_touches_only_query_term_partitions(store):
    from bloomfilter_multithread_ray.functions.hashing import hash_strings

    d, man = store
    assert man["n_docs"] == 500 and man["n_postings"] > 0
    terms = ["stream", "batch", "vector"]
    tps = {int(h % np.uint64(32)) for h in hash_strings(terms)}
    # the pruning contract: the partitions a lookup reads are exactly
    # the hash targets of its terms — a small fraction of the store
    assert len(tps) <= 3 < len(man["partitions"])
    for tp in tps:
        assert os.path.exists(os.path.join(d, "terms", f"tp={tp}", "part.parquet"))


def test_df_and_postings_are_exact(store):
    import duckdb

    import pyarrow.parquet as pq

    d, man = store
    # the store's postings, unioned, must equal the exact (doc, term, tf)
    # table with dl attached
    parts = []
    for tp in man["partitions"]:
        parts.append(
            pq.read_table(os.path.join(d, "terms", f"tp={tp}", "part.parquet"))
            .to_pandas()
        )
    got = (
        pd.concat(parts)
        .sort_values(["term", "doc_id"])
        .reset_index(drop=True)
    )
    ref = duckdb.sql(
        f"""
        WITH tks AS (SELECT doc_id, tok FROM (
          SELECT doc_id, unnest(string_split(text,' ')) AS tok
          FROM '{SF}/documents.parquet') WHERE tok <> ''),
        dl AS (SELECT doc_id, count(*) AS dl FROM tks GROUP BY doc_id)
        SELECT tok AS term, doc_id, count(*) AS tf,
               (SELECT dl FROM dl WHERE dl.doc_id = tks.doc_id) AS dl
        FROM tks GROUP BY tok, doc_id ORDER BY term, doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.astype({"tf": np.int64, "dl": np.int64}),
        ref.astype({"tf": np.int64, "dl": np.int64}),
    )


def test_manifest_last_crash_safety(ray_session, tmp_path):
    from bloomfilter_multithread_ray.pipelines.inverted_index import (
        build_inverted_index,
        inverted_lookup,
    )

    d = str(tmp_path / "idx")
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    build_inverted_index(docs, d, num_partitions=8)
    os.remove(os.path.join(d, "manifest.json"))  # simulate crash-before-commit
    with pytest.raises(FileNotFoundError):
        inverted_lookup(d, ["stream"])


def test_absent_terms_and_empty_queries(store):
    from bloomfilter_multithread_ray.pipelines.inverted_index import inverted_lookup

    d, _ = store
    out = inverted_lookup(d, ["zzz_not_a_token qqq_absent"])
    assert len(out) == 0
    assert list(out.columns) == ["query", "doc_id", "score"]
    out2 = inverted_lookup(d, [])
    assert len(out2) == 0
