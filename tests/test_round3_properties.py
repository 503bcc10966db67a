"""Property tests for round-3 kernels against brute-force references."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _greedy_ref(match):
    """Sequential greedy left-to-right non-overlapping application."""
    out, i = [], 0
    while i < len(match):
        if match[i]:
            out.append(i)
            i += 2
        else:
            i += 1
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.booleans(), min_size=0, max_size=40))
def test_greedy_apply_positions_equals_sequential(mask):
    from bloomfilter_multithread_ray.pipelines.bpe import _greedy_apply_positions

    m = np.array(mask, dtype=bool)
    got = list(_greedy_apply_positions(m))
    # caveat: the parity rule assumes a match at i+1 is only blocked by
    # an APPLIED match at i — true when matches come from one (l, r)
    # pair, where consecutive matches are always overlap-conflicting
    assert got == _greedy_ref(mask)


def _gram_stats_ref(rows, n):
    out = []
    for row in rows:
        grams = [tuple(row[i : i + n]) for i in range(len(row) - n + 1)]
        if not grams:
            out.append((0, 0, 0))
            continue
        from collections import Counter

        c = Counter(grams)
        out.append(
            (max(c.values()), sum(v for v in c.values() if v > 1), len(grams))
        )
    return out


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 5), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 4),
)
def test_per_row_gram_stats_vs_bruteforce(rows, n):
    from bloomfilter_multithread_ray.pipelines.repetition import (
        _per_row_gram_stats,
    )

    flat = np.array([t for row in rows for t in row], dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    maxc, dup, tot = _per_row_gram_stats(flat, offs, n)
    ref = _gram_stats_ref(rows, n)
    assert [tuple(x) for x in zip(maxc, dup, tot)] == ref


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 3), min_size=0, max_size=10),
        min_size=1,
        max_size=6,
    ),
    st.integers(2, 4),
    st.integers(2, 8),
)
def test_minimizer_parts_align_with_gram_mask(rows, k, P):
    """kgram_minimizer_parts must emit exactly one partition per valid
    gram, in kgram_hashes_flat's order, each in [0, P)."""
    from bloomfilter_multithread_ray.functions.hashing import kgram_hashes_flat
    from bloomfilter_multithread_ray.pipelines.skmer import kgram_minimizer_parts

    flat = np.array([t for row in rows for t in row], dtype=np.uint64)
    offs = np.concatenate([[0], np.cumsum([len(r) for r in rows])]).astype(np.int64)
    gh, row_idx, pos = kgram_hashes_flat(flat, offs, k)
    part, g = kgram_minimizer_parts(flat, offs, k, P)
    assert len(part) == len(gh)
    assert ((part >= 0) & (part < P)).all()
    # gram start indices must equal offsets[row] + pos
    assert np.array_equal(np.asarray(g), offs[row_idx] + pos)
