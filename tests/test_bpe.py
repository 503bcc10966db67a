"""Byte-level BPE: kernel units + full-run parity with an independent
pure-python implementation on the real sf0.001 corpus."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_ds(texts):
    import ray.data

    return ray.data.from_arrow(pa.table({"text": pa.array(texts, pa.string())}))


def test_greedy_apply_positions_parity_rule():
    from bloomfilter_multithread_ray.pipelines.bpe import _greedy_apply_positions

    # "aaaa" with pair (a,a): matches at 0,1,2 -> apply 0 and 2
    assert list(_greedy_apply_positions(np.array([True, True, True]))) == [0, 2]
    # separate runs keep their own parity
    m = np.array([True, False, True, True, False, True])
    assert list(_greedy_apply_positions(m)) == [0, 2, 5]
    assert list(_greedy_apply_positions(np.zeros(4, dtype=bool))) == []


def test_apply_merge_greedy_within_word(ray_session):
    from bloomfilter_multithread_ray.pipelines.bpe import (
        _to_symbols,
        make_apply_merge_fn,
    )

    t = pa.table({"tok": pa.array(["aaaa", "ab", "ba"]), "cnt": pa.array([1, 1, 1])})
    syms = _to_symbols(t)
    out = make_apply_merge_fn("a", "a")(syms)
    lists = out.column("syms").to_pylist()
    assert lists == [["aa", "aa"], ["a", "b"], ["b", "a"]]


def test_merge_never_crosses_word_boundary(ray_session):
    from bloomfilter_multithread_ray.pipelines.bpe import (
        _to_symbols,
        make_apply_merge_fn,
    )

    # last byte of word 0 is 'a', first of word 1 is 'b' -> no merge
    t = pa.table({"tok": pa.array(["xa", "by"]), "cnt": pa.array([1, 1])})
    out = make_apply_merge_fn("a", "b")(_to_symbols(t))
    assert out.column("syms").to_pylist() == [["x", "a"], ["b", "y"]]


def _reference_bpe(word_counts: pd.DataFrame, num_merges: int) -> pd.DataFrame:
    vocab = {tuple(t): int(c) for t, c in zip(word_counts["tok"], word_counts["cnt"])}
    rules = []
    for step in range(1, num_merges + 1):
        counts: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        rules.append({"step": step, "left": l, "right": r, "pair_count": c})
        new: dict = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + cnt
        vocab = new
    return pd.DataFrame(rules, columns=["step", "left", "right", "pair_count"])


def test_bpe_merges_match_independent_reference(ray_session, testdata_dir):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.bpe import bpe_merges, word_counts

    docs = ray.data.read_parquet(f"{testdata_dir}/documents.parquet", columns=["text"])
    got = bpe_merges(docs, num_merges=6)
    ref = _reference_bpe(word_counts(docs).to_pandas(), 6)
    pd.testing.assert_frame_equal(got, ref)


def test_bpe_merges_toy_overlap_corpus(ray_session):
    from bloomfilter_multithread_ray.pipelines.bpe import bpe_merges

    # 5x "abab": (a,b) count 10 beats (b,a) count 5; after merging,
    # (ab,ab) is the top pair
    got = bpe_merges(_docs_ds(["abab abab abab abab abab"]), num_merges=2)
    assert got.iloc[0][["left", "right", "pair_count"]].tolist() == ["a", "b", 10]
    assert got.iloc[1][["left", "right", "pair_count"]].tolist() == ["ab", "ab", 5]


def test_bpe_byte_level_non_ascii(ray_session):
    from bloomfilter_multithread_ray.pipelines.bpe import bpe_merges

    # multi-byte UTF-8 stays byte-level: 'é' splits into latin-1
    # symbols 'Ã','©'; all héllo pairs tie at 3 and the lexicographic
    # tie-break picks ('h','Ã')
    got = bpe_merges(_docs_ds(["héllo héllo wörld héllo"]), num_merges=2)
    assert got.iloc[0][["left", "right", "pair_count"]].tolist() == ["h", "Ã", 3]
    assert got.iloc[1]["pair_count"] == 3  # héllo pairs still tied at 3


def test_bpe_encode_stats_match_reference(ray_session, testdata_dir):
    import ray.data

    from bloomfilter_multithread_ray.pipelines.bpe import (
        bpe_encode_stats,
        word_counts,
    )

    docs = ray.data.read_parquet(f"{testdata_dir}/documents.parquet", columns=["text"])
    got = bpe_encode_stats(docs, num_merges=4).iloc[0]

    # pure-python: learn 4 merges, apply, count weighted symbols
    wc = word_counts(docs).to_pandas()
    vocab = {tuple(t): int(c) for t, c in zip(wc["tok"], wc["cnt"])}
    before = sum(len(s) * c for s, c in vocab.items())
    for _ in range(4):
        counts: dict = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < 2:
            break
        new: dict = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new[key] = new.get(key, 0) + cnt
        vocab = new
    after = sum(len(s) * c for s, c in vocab.items())
    assert got["symbols_before"] == before
    assert got["symbols_after"] == after
    assert got["num_merges"] == 4 and got["compression"] > 1.0
