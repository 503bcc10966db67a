"""Property-based tests (hypothesis) for round-2 pure kernels — no Ray
session needed; these check the numpy/Arrow kernels that the
distributed operators are built from."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bloomfilter_multithread_ray.pipelines.analytics import (
    _sortable_u64,
    _unsort_u64,
)
from bloomfilter_multithread_ray.pipelines.lm import _bigram_codes, _flat_utf8
from bloomfilter_multithread_ray.stages.multimodal import _prefix_matrix

finite_floats = st.floats(
    allow_nan=False, allow_infinity=True, width=64
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_floats, min_size=2, max_size=50))
def test_sortable_u64_preserves_total_order(vals):
    v = np.array(vals, dtype=np.float64)
    v = np.where(v == 0.0, 0.0, v)  # collapse -0.0/+0.0 (equal floats)
    u = _sortable_u64(v)
    # pairwise: float order == unsigned-int order
    order_f = np.argsort(v, kind="stable")
    assert (np.sort(u) == u[order_f]).all()
    # roundtrip
    for x, ux in zip(v, u):
        assert _unsort_u64(np.uint64(ux)) == x


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=30
)


@settings(max_examples=150, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=20))
def test_bigram_codes_match_naive(texts):
    col = pa.array(texts, pa.string())
    codes, m = _bigram_codes(col)
    want_codes, want_m = [], []
    for t in texts:
        b = t.encode()
        want_m.append(max(len(b) - 1, 0))
        want_codes.extend(b[i] * 256 + b[i + 1] for i in range(len(b) - 1))
    assert m.tolist() == want_m
    assert codes.tolist() == want_codes


@settings(max_examples=150, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=20), st.integers(1, 5))
def test_bigram_codes_slice_invariant(texts, off):
    # the kernel must respect Arrow slice offsets (zero-copy views)
    col = pa.array(texts + texts, pa.string()).slice(len(texts))
    codes, m = _bigram_codes(col)
    codes2, m2 = _bigram_codes(pa.array(texts, pa.string()))
    assert codes.tolist() == codes2.tolist() and m.tolist() == m2.tolist()


binary_payloads = st.lists(st.binary(max_size=100), min_size=1, max_size=15)


@settings(max_examples=150, deadline=None)
@given(binary_payloads)
def test_prefix_matrix_matches_naive(payloads):
    col = pa.array(payloads, pa.binary())
    m, lens = _prefix_matrix(col, width=64)
    assert lens.tolist() == [len(p) for p in payloads]
    for i, p in enumerate(payloads):
        pref = p[:64].ljust(64, b"\0")
        assert m[i].tobytes() == pref


@settings(max_examples=100, deadline=None)
@given(binary_payloads)
def test_prefix_matrix_slice_invariant(payloads):
    col = pa.array(payloads + payloads, pa.binary()).slice(len(payloads))
    m, lens = _prefix_matrix(col, width=32)
    m2, lens2 = _prefix_matrix(pa.array(payloads, pa.binary()), width=32)
    assert (m == m2).all() and lens.tolist() == lens2.tolist()


@settings(max_examples=100, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=10))
def test_flat_utf8_roundtrip(texts):
    col = pa.array(texts, pa.string())
    data, offs = _flat_utf8(col)
    got = [data[offs[i]:offs[i + 1]].tobytes().decode() for i in range(len(texts))]
    assert got == texts


from bloomfilter_multithread_ray.pipelines.join import _key_hash, _key_partition


@settings(max_examples=150, deadline=None)
@given(st.lists(st.one_of(st.integers(-2**62, 2**62), st.none()), min_size=1, max_size=30))
def test_key_hash_int_nulls_and_slices(vals):
    col = pa.array(vals, pa.int64())
    h, valid = _key_hash(col)
    assert valid.tolist() == [v is not None for v in vals]
    # identical keys hash identically; hashing is slice-invariant
    col2 = pa.array(vals + vals, pa.int64()).slice(len(vals))
    h2, valid2 = _key_hash(col2)
    assert h.tolist() == h2.tolist() and valid.tolist() == valid2.tolist()
    p = _key_partition(col, 16)
    assert ((p >= 0) & (p < 16)).all()
    # same value -> same partition
    seen = {}
    for v, pp in zip(vals, p):
        if v is None:
            continue
        assert seen.setdefault(v, pp) == pp


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(ascii_text, st.none()), min_size=1, max_size=30))
def test_key_hash_string_nulls(vals):
    col = pa.array(vals, pa.string())
    h, valid = _key_hash(col)
    assert valid.tolist() == [v is not None for v in vals]
    seen = {}
    for v, hh, ok in zip(vals, h, valid):
        if not ok:
            continue
        assert seen.setdefault(v, hh) == hh


# ------------------------------------------- incremental probe kernel
@given(
    st.lists(
        st.tuples(
            st.integers(0, 7),                    # bucket key
            st.integers(0, 30),                   # doc id
            st.booleans(),                        # is increment row
            st.integers(0, 3),                    # signature "family"
        ),
        min_size=0, max_size=60,
    ),
    st.integers(2, 4),                            # max_bucket cap
)
@settings(max_examples=150, deadline=None)
def test_probe_pairs_kernel_matches_bruteforce(rows, max_bucket):
    """_probe_pairs_fn == brute force over (bucket, class-capped rows):
    every base x new and new x new pair with signature agreement >=
    threshold, on encoded ids, and NEVER a base x base pair."""
    import pyarrow as pa

    from bloomfilter_multithread_ray.pipelines.dedup import (
        _INC_OFFSET,
        _probe_pairs_fn,
    )

    NUM_PERM = 8
    THRESH = 0.5
    # signature family f -> deterministic vector; families 0/1 agree in
    # exactly half the positions (est 0.5, boundary case), 2/3 disjoint
    def sig_of(f):
        base = np.arange(NUM_PERM, dtype=np.uint64)
        if f == 0:
            return base
        if f == 1:
            s = base.copy(); s[NUM_PERM // 2:] += 100; return s
        if f == 2:
            return base + 1000
        return base + 2000

    # dedupe (bkey, enc): the kernel's contract (a doc appears once per
    # bucket after its dedup pass) — keep the FIRST family drawn
    seen = {}
    for bk, did, isnew, fam in rows:
        enc = did + int(_INC_OFFSET) if isnew else did
        seen.setdefault((bk, enc), fam)
    items = [(bk, enc, fam) for (bk, enc), fam in seen.items()]
    if not items:
        return
    tbl = pa.table({
        "bkey": pa.array(np.array([i[0] for i in items], dtype=np.uint64)),
        "enc": pa.array(np.array([i[1] for i in items], dtype=np.int64)),
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate([sig_of(i[2]) for i in items])), NUM_PERM),
    })
    got = _probe_pairs_fn(THRESH, NUM_PERM, max_bucket)(tbl)
    got_pairs = set(zip(got.column("enc_a").to_pylist(),
                        got.column("enc_b").to_pylist()))

    # brute force with the same per-class deterministic cap
    want = set()
    by_bucket = {}
    for bk, enc, fam in items:
        by_bucket.setdefault(bk, []).append((enc, fam))
    for bk, members in by_bucket.items():
        base = sorted([m for m in members if m[0] < int(_INC_OFFSET)])[:max_bucket]
        new = sorted([m for m in members if m[0] >= int(_INC_OFFSET)])[:max_bucket]
        for be, bf in base:
            for ne, nf in new:
                if (sig_of(bf) == sig_of(nf)).mean() >= THRESH:
                    want.add((be, ne))
        for i in range(len(new)):
            for j in range(i + 1, len(new)):
                if (sig_of(new[i][1]) == sig_of(new[j][1])).mean() >= THRESH:
                    want.add((new[i][0], new[j][0]))
    assert got_pairs == want
    # base x base never emitted
    assert not any(a < int(_INC_OFFSET) and b < int(_INC_OFFSET)
                   for a, b in got_pairs)
