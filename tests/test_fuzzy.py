"""Fuzzy token pairs: kernel properties and planted end-to-end cases."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
    return d[n]


word = st.text(alphabet="abcd", min_size=1, max_size=8)


@settings(max_examples=300, deadline=None)
@given(word, word)
def test_edit_distance_kernel_vs_dp(x, y):
    from bloomfilter_multithread_ray.pipelines.fuzzy import _edit_distance_leq1

    got = _edit_distance_leq1(
        np.array([x], dtype=object), np.array([y], dtype=object)
    )[0]
    assert bool(got) == (_lev(x, y) <= 1)


@settings(max_examples=100, deadline=None)
@given(st.lists(word, min_size=2, max_size=15, unique=True))
def test_deletion_blocking_has_full_recall(words):
    from collections import defaultdict

    from bloomfilter_multithread_ray.pipelines.fuzzy import _deletion_variants

    vh, ti = _deletion_variants(np.array(words, dtype=object))
    buckets = defaultdict(set)
    for h, t in zip(vh, ti):
        buckets[int(h)].add(words[t])
    cand = {
        (x, y)
        for s in buckets.values()
        for x in s
        for y in s
        if x < y
    }
    for i, x in enumerate(words):
        for y in words[i + 1 :]:
            a, b = min(x, y), max(x, y)
            if _lev(a, b) <= 1:
                assert (a, b) in cand


def test_fuzzy_token_pairs_planted(ray_session):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.fuzzy import fuzzy_token_pairs

    docs = ray.data.from_arrow(
        pa.table(
            {"text": pa.array(
                ["spark spork table", "tables spark clean", "spark stork"],
                pa.string())}
        )
    )
    got = fuzzy_token_pairs(docs, min_len=3)
    pairs = set(zip(got["tok_a"], got["tok_b"]))
    assert ("spark", "spork") in pairs
    assert ("table", "tables") in pairs
    assert ("spork", "stork") in pairs
    assert ("spark", "stork") not in pairs  # distance 2
    assert (got["dist"] == 1).all()
