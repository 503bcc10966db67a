"""Unit tests per sketch family (FIXTURES.md F4): error bounds vs exact
numpy oracles, zero false negatives, serialization round-trips."""

import numpy as np
import pytest

from bloomfilter_multithread_ray.functions.hashing import splitmix64
from bloomfilter_multithread_ray.state import (
    KLL,
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    MinHash,
    TDigest,
    deserialize_sketch,
)
from bloomfilter_multithread_ray.state.minhash import minhash_signatures
from bloomfilter_multithread_ray.state.simhash import hamming64, simhash64


def _hashes(n, seed=0):
    return splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 10_000_000_007))


# ---------------------------------------------------------------- Bloom
@pytest.mark.parametrize("n,m,k", [(10, 1024, 4), (1_000, 1 << 14, 4), (100_000, 1 << 21, 6), (1_000, 1 << 16, 1)])
def test_bloom_zero_fn_and_fpr(n, m, k):
    bf = BloomFilter(num_bits=m, num_hashes=k)
    pos = _hashes(n, seed=1)
    bf.update_hashes(pos)
    assert bf.contains(pos).all(), "Bloom filter produced a false negative"
    neg = _hashes(50_000, seed=2)
    fpr = float(bf.contains(neg).mean())
    bound = bf.theoretical_fpr(n)
    assert fpr <= bound * 1.3 + 0.005, f"fpr {fpr} above bound {bound}"


def test_bloom_estimate_and_fill():
    bf = BloomFilter(num_bits=1 << 16, num_hashes=4)
    bf.update_hashes(_hashes(5000))
    assert 0 < bf.fill_ratio() < 1
    assert abs(bf.estimate() - 5000) / 5000 < 0.05


def test_bloom_merge_equals_single_pass():
    h = _hashes(10_000)
    one = BloomFilter(1 << 16, 4)
    one.update_hashes(h)
    parts = np.array_split(h, 7)
    merged = BloomFilter(1 << 16, 4)
    for p in parts:
        shard = BloomFilter(1 << 16, 4)
        shard.update_hashes(p)
        merged.merge(shard)
    assert np.array_equal(one.bits, merged.bits)
    assert merged.n_added == one.n_added


# ---------------------------------------------------------------- HLL
@pytest.mark.parametrize("true_n", [100, 10_000, 1_000_000])
def test_hll_error_bound(true_n):
    hll = HyperLogLog(p=14)
    hll.update_hashes(_hashes(true_n))
    est = hll.estimate()
    rel = abs(est - true_n) / true_n
    assert rel < 3 * hll.rel_error() + 0.01, f"{est} vs {true_n}"


def test_hll_duplicates_do_not_inflate():
    hll = HyperLogLog(p=12)
    h = _hashes(1000)
    for _ in range(5):
        hll.update_hashes(h)
    assert abs(hll.estimate() - 1000) / 1000 < 0.1


def test_hll_merge_equals_single_pass():
    h = _hashes(100_000)
    one = HyperLogLog(p=12)
    one.update_hashes(h)
    merged = HyperLogLog(p=12)
    for p in np.array_split(h, 13):
        s = HyperLogLog(p=12)
        s.update_hashes(p)
        merged.merge(s)
    assert np.array_equal(one.registers, merged.registers)


# ---------------------------------------------------------------- CMS
def test_cms_overestimate_only_within_bound():
    rng = np.random.default_rng(42)
    items = rng.zipf(1.3, size=200_000)
    items = items[items < 100_000]
    h = splitmix64(items.astype(np.uint64))
    cms = CountMinSketch(width=1 << 14, depth=5)
    cms.update_hashes(h)
    uniq, true_counts = np.unique(h, return_counts=True)
    est = cms.estimate_hashes(uniq)
    assert (est >= true_counts).all(), "CMS underestimated"
    # overestimate bounded by eps * total with prob 1-delta; check 99.9%
    overs = est - true_counts
    bound = cms.eps * cms.total
    assert (overs <= bound).mean() > 0.999


def test_cms_weighted_update():
    cms = CountMinSketch(width=1 << 12, depth=4)
    h = _hashes(10)
    cms.update_hashes(h, weights=np.full(10, 7))
    assert (cms.estimate_hashes(h) >= 7).all()
    assert cms.total == 70


def test_cms_merge_equals_single_pass():
    h = _hashes(50_000) % np.uint64(997)
    h = splitmix64(h)
    one = CountMinSketch(width=1 << 12, depth=4)
    one.update_hashes(h)
    merged = CountMinSketch(width=1 << 12, depth=4)
    for p in np.array_split(h, 9):
        s = CountMinSketch(width=1 << 12, depth=4)
        s.update_hashes(p)
        merged.merge(s)
    assert np.array_equal(one.counts, merged.counts)
    assert one.total == merged.total


# ---------------------------------------------------------------- TDigest
@pytest.mark.parametrize("dist", ["uniform", "normal", "zipf"])
def test_tdigest_rank_error(dist):
    rng = np.random.default_rng(7)
    n = 100_000
    if dist == "uniform":
        x = rng.uniform(0, 1, n)
    elif dist == "normal":
        x = rng.normal(0, 1, n)
    else:
        x = rng.zipf(1.5, n).astype(float)
    td = TDigest(compression=200)
    for chunk in np.array_split(x, 17):
        td.update_values(chunk)
    xs = np.sort(x)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = td.quantile(q)
        # rank error: distance from q to the [left, right] rank interval
        # of est in the true CDF (interval, because duplicates give one
        # value a rank range — e.g. Zipf mass at 1.0)
        lo = np.searchsorted(xs, est, side="left") / n
        hi = np.searchsorted(xs, est, side="right") / n
        err = max(lo - q, q - hi, 0.0)
        assert err < 0.02, f"q={q} dist={dist}: rank [{lo},{hi}]"


def test_tdigest_merge_within_bound():
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, 50_000)
    parts = np.array_split(x, 8)
    digs = []
    for p in parts:
        d = TDigest(compression=200)
        d.update_values(p)
        digs.append(d)
    merged = digs[0]
    for d in digs[1:]:
        merged.merge(d)
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9):
        r = np.searchsorted(xs, merged.quantile(q)) / len(x)
        assert abs(r - q) < 0.02
    assert merged.total == len(x)
    assert merged.min == xs[0] and merged.max == xs[-1]


# ---------------------------------------------------------------- KLL
def test_kll_rank_error():
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 100, 100_000)
    kll = KLL(k=200)
    for chunk in np.array_split(x, 23):
        kll.update_values(chunk)
    xs = np.sort(x)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        r = np.searchsorted(xs, kll.quantile(q)) / len(x)
        assert abs(r - q) < 0.03, f"q={q}: rank {r}"
    assert kll.n == len(x)


def test_kll_merge_within_bound():
    rng = np.random.default_rng(5)
    x = rng.normal(10, 3, 60_000)
    merged = KLL(k=200)
    for p in np.array_split(x, 6):
        s = KLL(k=200)
        s.update_values(p)
        merged.merge(s)
    xs = np.sort(x)
    for q in (0.1, 0.5, 0.9):
        r = np.searchsorted(xs, merged.quantile(q)) / len(x)
        assert abs(r - q) < 0.03


# ---------------------------------------------------------------- MinHash / SimHash
def test_minhash_jaccard_estimate():
    a = _hashes(2000, seed=1)
    b = np.concatenate([a[:1000], _hashes(1000, seed=9)])  # true J = 1000/3000
    ma, mb = MinHash(256), MinHash(256)
    ma.update_hashes(a)
    mb.update_hashes(b)
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    assert abs(ma.jaccard(mb) - true_j) < 0.08


def test_minhash_merge_is_union():
    a, b = _hashes(500, 1), _hashes(500, 2)
    u = MinHash(128)
    u.update_hashes(np.concatenate([a, b]))
    m = MinHash(128)
    m.update_hashes(a)
    other = MinHash(128)
    other.update_hashes(b)
    m.merge(other)
    assert np.array_equal(u.sig, m.sig)


def test_minhash_signatures_batch_matches_class():
    sets = [_hashes(100, s) for s in range(5)]
    sigs = minhash_signatures(sets, 64)
    for i, hs in enumerate(sets):
        m = MinHash(64)
        m.update_hashes(hs)
        assert np.array_equal(sigs[i], m.sig)


def test_simhash_similar_docs_close():
    base = _hashes(500, seed=4)
    near = np.concatenate([base[:480], _hashes(20, seed=8)])
    far = _hashes(500, seed=6)
    s0, s1, s2 = simhash64(base), simhash64(near), simhash64(far)
    d_near = hamming64(np.array([s0], dtype=np.uint64), s1)[0]
    d_far = hamming64(np.array([s0], dtype=np.uint64), s2)[0]
    assert d_near < 10 < d_far


# ---------------------------------------------------------------- serialization
@pytest.mark.parametrize(
    "make",
    [
        lambda: BloomFilter(1 << 12, 3),
        lambda: HyperLogLog(12),
        lambda: CountMinSketch(width=1 << 10, depth=4),
        lambda: MinHash(64),
    ],
)
def test_item_sketch_roundtrip(make):
    s = make()
    s.update_hashes(_hashes(5000))
    blob = s.serialize()
    t = deserialize_sketch(blob)
    assert type(t) is type(s)
    assert t.serialize() == blob


def test_value_sketch_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, 10_000)
    for s in (TDigest(100), KLL(128)):
        s.update_values(x)
        t = deserialize_sketch(s.serialize())
        for q in (0.1, 0.5, 0.9):
            assert np.isclose(t.quantile(q), s.quantile(q))


def test_pickle_roundtrip():
    import pickle

    bf = BloomFilter(1 << 10, 2)
    bf.update_hashes(_hashes(100))
    bf2 = pickle.loads(pickle.dumps(bf))
    assert np.array_equal(bf.bits, bf2.bits)


def test_tdigest_nan_values_with_weights_stay_aligned():
    from bloomfilter_multithread_ray.state import TDigest

    d = TDigest()
    d.update_values(np.array([1.0, np.nan, 3.0]), weights=np.array([1.0, 2.0, 3.0]))
    assert d.total == 4.0  # NaN's weight dropped with its value
    assert d.quantile(0.0) == 1.0 and d.quantile(1.0) == 3.0


def test_kll_seed_survives_serialization():
    from bloomfilter_multithread_ray.state import KLL
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    big_seed = (1 << 32) + 5
    a = KLL(k=64, seed=big_seed)
    b = deserialize_sketch(a.serialize())
    assert b.seed == big_seed
    # identical compaction randomness after round-trip
    vals = np.random.default_rng(1).normal(size=5000)
    a.update_values(vals)
    b.update_values(vals)
    for q in (0.1, 0.5, 0.9):
        assert a.quantile(q) == b.quantile(q)


def test_misra_gries_bounds_and_guaranteed_tracking():
    """MG guarantee: true-err <= counter <= true; any item with
    frequency > n/(capacity+1) is tracked — under a SMALL capacity on
    a skewed stream."""
    import numpy as np

    from bloomfilter_multithread_ray.state import MisraGries

    rng = np.random.default_rng(5)
    # zipf-ish: item i has weight ~ 1/(i+1)
    items = np.repeat([f"t{i}" for i in range(200)], (1000 / np.arange(1, 201)).astype(int))
    rng.shuffle(items)
    true = {k: int(v) for k, v in zip(*np.unique(items, return_counts=True))}
    n = len(items)
    cap = 16
    s = MisraGries(cap)
    for lo in range(0, n, 997):  # uneven batches
        s.update_items(items[lo : lo + 997])
    assert s.n_total == n
    assert s.error_bound() <= n // (cap + 1)
    for k, t in true.items():
        c = s.estimate(k)
        assert c <= t <= c + s.error_bound(), k
        if t > n / (cap + 1):
            assert k in s.counters, f"guaranteed heavy item {k} untracked"


def test_misra_gries_merge_matches_single_pass_bounds():
    """Merged partials keep the MG bound (mergeable-summaries merge);
    serialization round-trips."""
    import numpy as np

    from bloomfilter_multithread_ray.state import MisraGries
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    rng = np.random.default_rng(7)
    items = np.repeat([f"t{i}" for i in range(100)], (500 / np.arange(1, 101)).astype(int))
    rng.shuffle(items)
    true = {k: int(v) for k, v in zip(*np.unique(items, return_counts=True))}
    n, cap = len(items), 12
    parts = np.array_split(items, 7)
    merged = MisraGries(cap)
    for p in parts:
        s = MisraGries(cap)
        s.update_items(p)
        merged.merge(deserialize_sketch(s.serialize()))
    assert merged.n_total == n
    assert merged.error_bound() <= n // (cap + 1)
    for k, t in true.items():
        c = merged.estimate(k)
        assert c <= t <= c + merged.error_bound(), k


def test_misra_gries_serialization_handles_delimiter_bytes():
    """Tokens containing NUL (or any byte) must round-trip exactly —
    length-prefixed key serialization."""
    from bloomfilter_multithread_ray.state import MisraGries
    from bloomfilter_multithread_ray.state.base import deserialize_sketch

    s = MisraGries(8)
    s.update_items(["a\x00b", "plain", "a\x00b", "x\x00", "\x00", ""])
    r = deserialize_sketch(s.serialize())
    assert r.counters == s.counters
    assert r.estimate("a\x00b") == 2 and r.estimate("plain") == 1
    assert r.n_total == s.n_total and r.err == s.err


# ---------------------------------------------------------- CountSketch
def _zipf_hashes(seed=11, n=300_000):
    rng = np.random.default_rng(seed)
    items = rng.zipf(1.3, size=n)
    return splitmix64(items[items < 500_000].astype(np.uint64))


def test_countsketch_point_estimates_within_l2_bound():
    from bloomfilter_multithread_ray.state import CountSketch

    h = _zipf_hashes()
    cs = CountSketch(width=4096, depth=7)
    cs.update_hashes(h)
    uniq, cnt = np.unique(h, return_counts=True)
    f2 = float((cnt.astype(np.float64) ** 2).sum())
    bound = 3.0 * np.sqrt(f2 / cs.width)
    # published: per item P(|err| > 3*sqrt(F2/w)) is tiny after the
    # median over depth rows; check every one of the 200 heaviest and
    # 200 random light items
    order = np.argsort(-cnt)
    probe = np.concatenate([uniq[order[:200]], uniq[order[::-1][:200]]])
    true = np.concatenate([cnt[order[:200]], cnt[order[::-1][:200]]])
    est = cs.estimate_hashes(probe)
    assert np.abs(est - true).max() <= bound
    # two-sided (unlike CMS): on Zipf data some estimates land below
    # truth — unbiasedness in action
    assert (est < true).any() and (est > true).any()
    # and the sketch's own bound reporting is consistent
    assert cs.error_bound() == pytest.approx(3.0 * np.sqrt(cs.estimate_f2() / cs.width), rel=1e-12)


def test_countsketch_f2_estimate_within_ams_bound():
    from bloomfilter_multithread_ray.state import CountSketch

    h = _zipf_hashes(seed=23)
    cs = CountSketch(width=4096, depth=7)
    cs.update_hashes(h)
    uniq, cnt = np.unique(h, return_counts=True)
    f2 = float((cnt.astype(np.float64) ** 2).sum())
    # Var(row) <= 2 F2^2 / w; median over 7 rows: allow 4 sigma
    assert abs(cs.estimate_f2() - f2) <= 4.0 * np.sqrt(2.0 / cs.width) * f2
    assert cs.estimate() == len(h)


def test_countsketch_merge_bit_identical_any_tree():
    from bloomfilter_multithread_ray.state import CountSketch

    h = _zipf_hashes(seed=5, n=80_000)
    single = CountSketch(width=1024, depth=5)
    single.update_hashes(h)

    parts = np.array_split(h, 9)
    left = CountSketch(width=1024, depth=5)
    for p in parts[:4]:
        left.update_hashes(p)
    right = CountSketch(width=1024, depth=5)
    for p in parts[4:]:
        right.update_hashes(p)
    left.merge(right)
    assert np.array_equal(left.counts, single.counts)
    assert left.total == single.total

    # weighted replay path (sparse partials) == raw path
    uniq, cnt = np.unique(h, return_counts=True)
    w = CountSketch(width=1024, depth=5)
    w.update_hash_counts(uniq, cnt)
    assert np.array_equal(w.counts, single.counts)


def test_countsketch_roundtrip_and_validation():
    from bloomfilter_multithread_ray.state import CountSketch

    cs = CountSketch(width=512, depth=3)
    cs.update_hashes(_hashes(4000))
    blob = cs.serialize()
    t = deserialize_sketch(blob)
    assert type(t) is CountSketch and t.serialize() == blob
    assert np.array_equal(t.counts, cs.counts) and t.total == cs.total
    with pytest.raises(ValueError):
        CountSketch(width=4)
    with pytest.raises(ValueError):
        cs.merge(CountSketch(width=512, depth=4))


# ------------------------------------------------- FrequentDirections
def _fd_matrix(seed=3, n=4000, d=48, rank=5, mean=0.5):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, rank)) @ rng.normal(size=(rank, d))
    return A + 0.1 * rng.normal(size=(n, d)) + mean


def test_fd_spectral_certificate_and_published_bound():
    from bloomfilter_multithread_ray.state import FrequentDirections

    A = _fd_matrix()
    ell = 24
    fd = FrequentDirections(ell)
    for chunk in np.array_split(A, 11):
        fd.update_rows(chunk)
    AtA = A.T @ A
    frob2 = float((A * A).sum())
    eigs = np.linalg.eigvalsh(AtA - fd.btb())
    # sandwich: 0 <= A'A - B'B (PSD) ...
    assert eigs.min() >= -1e-6 * frob2
    # ... <= the sketch's own certificate <= the published 2*frob2/ell
    assert eigs.max() <= fd.delta_sum + 1e-6 * frob2
    assert fd.delta_sum <= 2.0 * frob2 / ell + 1e-9
    # centered covariance inherits the bound /n (exact first moment)
    cov = np.cov(A, rowvar=False, bias=True)
    cerr = np.abs(np.linalg.eigvalsh(cov - fd.covariance())).max()
    assert cerr <= fd.delta_sum / fd.n + 1e-9
    assert fd.estimate() == len(A)


def test_fd_merge_tree_keeps_certificate():
    from bloomfilter_multithread_ray.state import FrequentDirections

    A = _fd_matrix(seed=9, n=3000)
    ell = 16
    parts = np.array_split(A, 5)
    sks = []
    for p in parts:
        s = FrequentDirections(ell)
        s.update_rows(p)
        sks.append(s)
    # lopsided merge tree
    m = sks[0]
    for s in sks[1:3]:
        m.merge(s)
    rest = sks[3].merge(sks[4])
    m.merge(rest)
    AtA = A.T @ A
    frob2 = float((A * A).sum())
    eigs = np.linalg.eigvalsh(AtA - m.btb())
    assert eigs.min() >= -1e-6 * frob2
    assert eigs.max() <= m.delta_sum + 1e-6 * frob2
    assert m.delta_sum <= 2.0 * frob2 / ell + 1e-9
    assert m.n == len(A)
    # exact moments survive the merge exactly
    assert np.allclose(m.colsum, A.sum(axis=0))
    assert m.frob2 == pytest.approx(frob2, rel=1e-12)


def test_fd_roundtrip_and_validation():
    from bloomfilter_multithread_ray.state import FrequentDirections

    fd = FrequentDirections(8)
    fd.update_rows(_fd_matrix(seed=1, n=300, d=12))
    blob = fd.serialize()
    t = deserialize_sketch(blob)
    assert type(t) is FrequentDirections
    assert np.allclose(t.btb(), fd.btb())
    assert t.n == fd.n and t.delta_sum == fd.delta_sum
    assert np.allclose(t.colsum, fd.colsum)
    # empty sketch round-trips (d unresolved)
    e = deserialize_sketch(FrequentDirections(8).serialize())
    assert e.n == 0 and e.B is None
    with pytest.raises(ValueError):
        FrequentDirections(1)
    with pytest.raises(ValueError):
        fd.merge(FrequentDirections(16))
    with pytest.raises(ValueError):
        fd.update_rows(np.zeros((3, 99)))  # width mismatch


def test_countsketch_inner_product_join_size():
    """AGMS inner product: unbiased join-size estimate within the
    3-sigma L2 bound; shape mismatch rejected."""
    from bloomfilter_multithread_ray.state import CountSketch

    rng = np.random.default_rng(29)
    f = rng.zipf(1.4, 200_000)
    f = splitmix64(f[f < 100_000].astype(np.uint64))
    g = rng.zipf(1.2, 150_000)
    g = splitmix64(g[g < 100_000].astype(np.uint64))
    a = CountSketch(width=8192, depth=7)
    a.update_hashes(f)
    b = CountSketch(width=8192, depth=7)
    b.update_hashes(g)

    uf, cf = np.unique(f, return_counts=True)
    ug, cg = np.unique(g, return_counts=True)
    _, ia, ib = np.intersect1d(uf, ug, return_indices=True)
    true = float((cf[ia].astype(np.float64) * cg[ib]).sum())
    est = a.estimate_inner(b)
    assert abs(est - true) <= a.inner_error_bound(b)
    with pytest.raises(ValueError):
        a.estimate_inner(CountSketch(width=4096, depth=7))


# ------------------------------------------------------- CountingBloom
def test_counting_bloom_zero_fn_and_fpr_after_retraction():
    from bloomfilter_multithread_ray.state import CountingBloom

    live = _hashes(20_000, seed=1)
    dead = _hashes(60_000, seed=2)  # inserted then retracted
    neg = _hashes(20_000, seed=3)  # never inserted
    cb = CountingBloom(1 << 18, 4)
    cb.update_hashes(live)
    cb.update_hashes(dead)
    cb.delete_hashes(dead)
    # zero false negatives on the live set
    assert cb.contains(live).all()
    assert cb.n_live() == len(live)
    # FPR on disjoint negatives bounded by the LIVE population's
    # theoretical rate (retraction restored the headroom): with
    # n=80k a plain Bloom would sit at ~4.5%, live-only is ~0.24%
    fpr = cb.contains(neg).mean()
    assert fpr <= cb.fpr_bound() + 3 * np.sqrt(cb.fpr_bound() / len(neg)) + 1e-4
    # and the retracted keys themselves now test ~absent
    assert cb.contains(dead).mean() <= cb.fpr_bound() + 0.01


def test_counting_bloom_merge_bit_identical_with_deletes():
    from bloomfilter_multithread_ray.state import CountingBloom

    h = _hashes(30_000, seed=7)
    dead = h[::3]
    single = CountingBloom(1 << 16, 4)
    single.update_hashes(h)
    single.delete_hashes(dead)

    # deletes and inserts split across partials in a lopsided tree
    parts_h = np.array_split(h, 5)
    parts_d = np.array_split(dead, 3)
    sks = []
    for i in range(5):
        s = CountingBloom(1 << 16, 4)
        s.update_hashes(parts_h[i])
        if i < 3:
            s.delete_hashes(parts_d[i])
        sks.append(s)
    m = sks[0].merge(sks[1])
    m.merge(sks[2].merge(sks[3]).merge(sks[4]))
    assert np.array_equal(m.counts, single.counts)
    assert (m.n_added, m.n_deleted) == (single.n_added, single.n_deleted)
    # duplicate insert + duplicate delete balance exactly
    dup = CountingBloom(1 << 16, 4)
    dup.update_hashes(np.repeat(h[:5], 3))
    dup.delete_hashes(np.repeat(h[:5], 3))
    assert dup.counts.sum() == 0 and dup.n_live() == 0


def test_counting_bloom_matches_plain_bloom_positions_and_roundtrip():
    from bloomfilter_multithread_ray.state import BloomFilter, CountingBloom

    h = _hashes(5_000, seed=9)
    cb = CountingBloom(1 << 16, 4)
    cb.update_hashes(h)
    bf = BloomFilter(1 << 16, 4)
    bf.update_hashes(h)
    # same double-hash stream: counter>0 positions == plain bit set
    assert np.array_equal((cb.counts > 0).astype(np.uint8), bf.bits)
    rt = deserialize_sketch(cb.serialize())
    assert type(rt) is CountingBloom
    assert np.array_equal(rt.counts, cb.counts)
    assert (rt.n_added, rt.n_deleted) == (cb.n_added, cb.n_deleted)
    with pytest.raises(ValueError):
        cb.merge(CountingBloom(1 << 15, 4))
