"""Planted tests for curation.line_dedup (corpus-level exact segment
dedup / high-DF removal)."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from bloomfilter_multithread_ray.pipelines.curation import line_dedup


def _run(docs, **kw):
    out = line_dedup(rd.from_pandas(docs), **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture
def corpus():
    return pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "keep me\nSHARED\n\nunique a",   # empty line must survive
            "SHARED\nunique b",
            "solo\nsolo",                    # within-doc dup: 1 distinct doc
            "SHARED",                        # whole doc removed -> ""
        ],
    })


def test_line_dedup_basic_newline(ray_session, corpus):
    out = _run(corpus, sep="\n", min_docs=2)
    exp = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["keep me\n\nunique a", "unique b", "solo\nsolo", ""],
        "n_removed": np.array([1, 1, 0, 1], np.int64),
    })
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_line_dedup_min_docs_boundary(ray_session, corpus):
    # SHARED occurs in 3 distinct docs: min_docs=3 keeps removing it,
    # min_docs=4 is strict enough that nothing is removed
    out3 = _run(corpus, sep="\n", min_docs=3)
    assert out3["n_removed"].tolist() == [1, 1, 0, 1]
    out4 = _run(corpus, sep="\n", min_docs=4)
    assert out4["n_removed"].tolist() == [0, 0, 0, 0]
    pd.testing.assert_series_equal(out4["text"], corpus["text"], check_names=False)


def test_line_dedup_min_frac_integer_exact(ray_session, corpus):
    # 4 docs; SHARED in 3: nd*den >= n*num at (num,den)=(3,4) is
    # 12 >= 12 -> removed; at (4,5): 15 >= 16 -> kept (strict bound)
    assert _run(corpus, sep="\n", min_frac=(3, 4))["n_removed"].sum() == 3
    assert _run(corpus, sep="\n", min_frac=(4, 5))["n_removed"].sum() == 0


def test_line_dedup_word_sep_and_round_trip(ray_session):
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["x COMMON  y", "COMMON z"],  # double space -> empty seg
    })
    out = _run(docs, sep=" ", min_docs=2)
    # empty segment (and thus the double space) survives the rewrite
    assert out["text"].tolist() == ["x  y", "z"]
    assert out["n_removed"].tolist() == [1, 1]


def test_line_dedup_partition_and_plan_invariance(ray_session, corpus):
    ref = _run(corpus, sep="\n", min_docs=2)
    for kw in (
        dict(num_partitions=3),
        dict(num_partitions=17, broadcast=False),  # shuffle join plan
        dict(broadcast=True),
    ):
        got = _run(corpus, sep="\n", min_docs=2, **kw)
        pd.testing.assert_frame_equal(got, ref, check_dtype=False)


def test_line_dedup_no_dups_is_identity(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a\nb", "c\nd"]})
    out = _run(docs, sep="\n", min_docs=2)
    assert out["text"].tolist() == ["a\nb", "c\nd"]
    assert out["n_removed"].tolist() == [0, 0]
