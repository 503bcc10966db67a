"""Repetition filters + substring dedup: planted cases and known values."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_gopher_repetition_known_values(ray_session):
    from bloomfilter_multithread_ray.pipelines.repetition import gopher_repetition

    rows = [
        (0, "a b a b a b a b"),  # 8 toks; top2 "a b" x4 -> 8/8 = 1.0
        (1, "x y z w v u t s"),  # all distinct -> top2 = 2/8
        (2, ""),  # empty -> zeros, keep False
        (3, "p p p p p p p p p p"),  # total repetition, dup5 = 1.0
    ]
    df = gopher_repetition(_docs_ds(rows)).set_index("doc_id")
    assert df.loc[0, "top2_frac"] == 1.0
    assert not df.loc[0, "keep"]
    assert df.loc[1, "top2_frac"] == pytest.approx(2 / 8)
    assert df.loc[1, "dup5_frac"] == 0.0
    assert df.loc[2, "n_tok"] == 0 and not df.loc[2, "keep"]
    assert df.loc[3, "dup5_frac"] == 1.0 and not df.loc[3, "keep"]


def test_gopher_top3_overlapping_runs(ray_session):
    from bloomfilter_multithread_ray.pipelines.repetition import gopher_repetition

    # "a a a a a a" -> the 3-gram "a a a" occurs 4 times; n_tok=6
    df = gopher_repetition(_docs_ds([(0, "a a a a a a")])).set_index("doc_id")
    assert df.loc[0, "top3_frac"] == pytest.approx(4 * 3 / 6)


def test_substring_dedup_planted_duplicates(ray_session):
    from bloomfilter_multithread_ray.pipelines.repetition import substring_dedup

    shared = "one two three four five six seven eight"
    rows = [
        (0, shared),  # identical pair -> 1 window, duplicated
        (1, shared),
        (2, "a b c d e f g h i j"),  # unique 10-tok doc: 3 windows, none dup
        (3, "short doc"),  # < 8 tokens -> excluded (no windows)
        (4, f"prefix {shared} suffix"),  # contains the shared window
    ]
    df = substring_dedup(_docs_ds(rows), window=8).set_index("doc_id")
    assert 3 not in df.index
    assert df.loc[0, "n_windows"] == 1 and df.loc[0, "dup_windows"] == 1
    assert df.loc[0, "dup_frac"] == 1.0
    assert df.loc[2, "n_windows"] == 3 and df.loc[2, "dup_windows"] == 0
    # doc 4: 10 tokens -> 3 windows; exactly the middle one is shared
    assert df.loc[4, "n_windows"] == 3 and df.loc[4, "dup_windows"] == 1


def test_substring_dedup_within_doc_repeat_not_cross_doc(ray_session):
    from bloomfilter_multithread_ray.pipelines.repetition import substring_dedup

    # window repeated INSIDE one doc only -> not a cross-doc duplicate
    text = "one two three four five six seven eight one two three four five six seven eight"
    df = substring_dedup(_docs_ds([(0, text), (1, "u v w x y z q r")]), window=8)
    d0 = df.set_index("doc_id").loc[0]
    assert d0["dup_windows"] == 0


def test_per_row_gram_stats_kernel():
    from bloomfilter_multithread_ray.pipelines.repetition import _per_row_gram_stats

    # two rows: [1 2 1 2 1] (2-grams: (1,2)x2 (2,1)x2) and [7 8] ((7,8)x1)
    wh = np.array([1, 2, 1, 2, 1, 7, 8], dtype=np.uint64)
    offs = np.array([0, 5, 7], dtype=np.int64)
    maxc, dup, tot = _per_row_gram_stats(wh, offs, 2)
    assert list(tot) == [4, 1]
    assert list(maxc) == [2, 1]
    assert list(dup) == [4, 0]
