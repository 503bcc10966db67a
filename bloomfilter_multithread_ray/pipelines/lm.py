"""Byte-bigram language-model perplexity scoring — the CCNet/C4-style
"LM quality filter" stage of a training-data pipeline: train a tiny
n-gram model ON the corpus, then score every document's perplexity
under it; downstream curation drops the high-perplexity tail.

Two streaming passes, the broadcast-small-side pattern throughout:

  1. TRAIN — per-batch byte-bigram histograms (one ``np.bincount``
     over the batch's concatenated utf8 buffer; sparse {code, cnt}
     rows out) → fixed-partition ``grouped_agg`` sum → the driver
     folds ≤ 65536 rows into the add-one-smoothed log-probability
     table (512 KB of float64).
  2. SCORE — the table broadcasts once (``ray.put``); a map-only pass
     computes each document's mean negative log-likelihood with one
     table lookup + ``reduceat`` per batch. No shuffle; output
     streams.

The model is explicitly a BYTE bigram model (utf8 buffer, not code
points) — on the ASCII fixtures this equals a char bigram model,
which is what the DuckDB oracle (substr-based) computes.

Reference analog: build-then-probe over the same corpus
(`src/main.cpp` phase 1/2) — train IS the build of a small state, and
scoring IS the probe, broadcast instead of sharded because the state
is 512 KB, not gigabytes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:
    from ray.data import Dataset


def _flat_utf8(col) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column → (flat uint8 bytes, int64 row offsets into
    it, both offset/slice-correct). Zero-copy views of Arrow buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type):
        odt, osz = np.int64, 8
    else:
        odt, osz = np.int32, 4
    bufs = col.buffers()
    offs = np.frombuffer(
        bufs[1], dtype=odt, count=len(col) + 1, offset=col.offset * osz
    ).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return data, offs


def _bigram_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """(codes, row_lens_in_bigrams): codes = 256*b1 + b2 of every
    within-row consecutive byte pair, concatenated row-major."""
    data, offs = _flat_utf8(col)
    if len(offs) < 2 or offs[-1] - offs[0] < 2:
        return np.empty(0, np.int64), np.maximum(np.diff(offs) - 1, 0)
    lo, hi = offs[0], offs[-1]
    d = data[lo:hi].astype(np.int64)
    pair = d[:-1] * 256 + d[1:]  # includes cross-row junk pairs
    # drop position j when j+1 starts a new row (j == row_end - 1)
    keep = np.ones(len(pair), dtype=bool)
    ends = offs[1:-1] - lo - 1  # last byte index of each non-final row
    # bound both sides: an empty FIRST row gives -1, and a trailing
    # empty row puts a boundary at len(pair) (no pair starts there)
    keep[ends[(ends >= 0) & (ends < len(pair))]] = False
    m = np.maximum(np.diff(offs) - 1, 0)  # bigrams per row
    return pair[keep], m


def train_bigram_lm(docs: "Dataset", *, num_partitions: int = 16) -> dict:
    """Corpus-wide bigram counts → smoothed model dict:
    {"logp": float64[65536], "V": int, "n_bigrams": int}.

    ``p(b2|b1) = (C[b1b2] + 1) / (C1[b1] + V)`` with V = number of
    distinct BYTES occurring anywhere in the corpus (add-one
    smoothing over the observed alphabet).
    """
    from .agg import grouped_agg

    def hist(t: pa.Table) -> pa.Table:
        codes, _ = _bigram_codes(t.column("text"))
        data, offs = _flat_utf8(t.column("text"))
        cnt2 = np.bincount(codes, minlength=1)
        nz = np.flatnonzero(cnt2)
        uni = np.bincount(data[offs[0]:offs[-1]], minlength=256)
        unz = np.flatnonzero(uni)
        return pa.table(
            {
                # unigram rows ride along with negative codes: -1-byte
                "code": pa.array(
                    np.concatenate([nz.astype(np.int64), -1 - unz.astype(np.int64)])
                ),
                "cnt": pa.array(
                    np.concatenate([cnt2[nz].astype(np.int64), uni[unz].astype(np.int64)])
                ),
            }
        )

    counts = (
        grouped_agg(
            docs.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True),
            "code",
            {"cnt": ("sum", "cnt")},
            num_partitions=num_partitions,
        )
        .to_pandas()
    )
    code = counts["code"].to_numpy()
    cnt = counts["cnt"].to_numpy()
    bi = code >= 0
    C2 = np.zeros(65536, dtype=np.int64)
    C2[code[bi]] = cnt[bi]
    V = int((~bi).sum())  # distinct bytes observed
    C1 = C2.reshape(256, 256).sum(axis=1)  # bigram starts per byte
    logp = np.log(C2 + 1.0) - np.repeat(np.log(C1 + float(V)), 256)
    return {"logp": logp, "V": V, "n_bigrams": int(C2.sum())}


def lm_perplexity(docs: "Dataset", model: dict | None = None) -> "Dataset":
    """Score documents under the (self- or externally-) trained bigram
    model → {doc_id, n_bigrams, ppl} with ppl = exp(mean NLL).
    Documents with no bigram (len < 2) are excluded (their NLL is
    undefined — same rows a SQL join over bigrams drops).
    """
    import ray

    if model is None:
        model = train_bigram_lm(docs)
    logp_ref = ray.put(model["logp"])

    def score(t: pa.Table) -> pa.Table:
        logp = ray.get(logp_ref)
        codes, m = _bigram_codes(t.column("text"))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(m)[:-1]])
        has = m > 0
        s = np.add.reduceat(logp[codes], starts[has]) if has.any() else np.empty(0)
        ppl = np.exp(-s / m[has])
        return pa.table(
            {"doc_id": pa.array(ids[has]),
             "n_bigrams": pa.array(m[has].astype(np.int64)),
             "ppl": pa.array(ppl)}
        )

    return docs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------- trigram LM (join-scored)
def _trigram_occ_fn(col: str = "text"):
    """batch → per-batch-combined trigram occurrences {doc_id, tri, k}.

    ``tri`` is the space-joined word triple; ``k`` its count within the
    document-slice this batch saw (per-batch combine — a trigram that
    repeats inside a doc ships once per batch, not once per position)."""
    from ..stages.text import flat_nonempty_with_offsets

    def fn(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch, col)
        tcnt = np.maximum(np.diff(offs) - 2, 0)
        total = int(tcnt.sum())
        ids = batch.column("doc_id").combine_chunks()
        if total == 0:
            return pa.table(
                {"doc_id": ids.slice(0, 0),
                 "tri": pa.array([], pa.string()),
                 "k": pa.array([], pa.int64())}
            )
        base = np.repeat(offs[:-1], tcnt)
        ex = np.concatenate(([0], np.cumsum(tcnt)[:-1]))
        starts = base + (np.arange(total, dtype=np.int64) - np.repeat(ex, tcnt))
        import pyarrow.compute as pc

        tri = pc.binary_join_element_wise(
            flat.take(starts), flat.take(starts + 1), flat.take(starts + 2), " "
        )
        doc = ids.take(np.repeat(np.arange(len(tcnt), dtype=np.int64), tcnt))
        occ = pa.table({"doc_id": doc, "tri": tri})
        g = occ.group_by(["doc_id", "tri"]).aggregate([([], "count_all")])
        return g.select(["doc_id", "tri", "count_all"]).rename_columns(
            ["doc_id", "tri", "k"]
        )

    return fn


def trigram_lm_scores(
    docs: "Dataset",
    *,
    num_partitions: int = 64,
    round_dp: int = 6,
) -> "Dataset":
    """Word-trigram LM with add-one smoothing, trained on the corpus and
    scored back over it → {doc_id, n_trigrams, ppl}. ``p(w3|w1 w2) =
    (C3 + 1) / (C2 + V)`` with C2 the context's occurrence count as a
    trigram prefix and V the corpus's distinct-word count; ppl =
    exp(mean NLL). Documents under 3 words are excluded (no trigram).

    Scale shape — the MODEL-AS-TABLE plan, the complement of
    ``lm_perplexity``'s broadcast plan: a trigram table over a
    web-scale corpus is far larger than a worker heap, so scoring is a
    hash JOIN of occurrence rows against the count tables,
    co-partitioned on the trigram key (`hash_join` shuffle plan; the
    tiny context table rides `broadcast="auto"`), never a broadcast of
    the model. Occurrences materialize once and feed both the count
    build and the scoring join. String keys here are the SQL-exact
    anchor; a token-id corpus packs the triple into one int64
    (`trigram_lm_scores_tokens`), cutting key bytes ~5x.

    Reference analog: build-then-probe over the same corpus
    (`src/main.cpp` phase 1/2) with the probe as a join instead of a
    broadcast lookup.
    """
    from ..stages.text import make_unique_tokens_fn
    from .agg import grouped_agg
    from .analytics import distinct_count_exact
    from .join import hash_join

    V = int(
        distinct_count_exact(docs, make_unique_tokens_fn(), "v")["v"].iloc[0]
    )

    occ = docs.map_batches(
        _trigram_occ_fn(), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def add_ctx(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        words = pc.split_pattern(t.column("tri").combine_chunks(), " ")
        ctx = pc.binary_join(pc.list_slice(words, 0, 2), " ")
        return t.append_column("ctx", ctx)

    return _trigram_score_core(
        occ, add_ctx, V, int(num_partitions), round_dp
    )


def _trigram_score_core(
    occ: "Dataset", add_ctx, V: int, P: int, round_dp: int
) -> "Dataset":
    """Shared count-build + join-score core of the trigram LM: occ is
    the materialized per-batch-combined {doc_id, tri, k} occurrence
    table (string or packed-int keys); ``add_ctx`` derives the context
    key from the trigram key on the (small) distinct-trigram table."""
    from .agg import grouped_agg
    from .join import hash_join

    c3 = grouped_agg(occ, "tri", {"c3": ("sum", "k")}, num_partitions=P)
    c3 = c3.map_batches(
        add_ctx, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    c2 = grouped_agg(c3, "ctx", {"c2": ("sum", "c3")}, num_partitions=P)

    j = hash_join(occ, c3, on="tri", num_partitions=P)
    j = hash_join(j, c2, on="ctx", broadcast="auto", num_partitions=P)

    def score_partial(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
        c3v = t.column("c3").to_numpy(zero_copy_only=False).astype(np.float64)
        c2v = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        logp = np.log((c3v + 1.0) / (c2v + float(V)))
        part = pa.table(
            {"doc_id": t.column("doc_id"),
             "m": pa.array(t.column("k").to_numpy(zero_copy_only=False)),
             "s": pa.array(k * logp)}
        )
        g = part.group_by("doc_id").aggregate([("m", "sum"), ("s", "sum")])
        return g.select(["doc_id", "m_sum", "s_sum"]).rename_columns(
            ["doc_id", "m", "s"]
        )

    per_doc = grouped_agg(
        j.map_batches(score_partial, batch_format="pyarrow", zero_copy_batch=True),
        "doc_id",
        {"n_trigrams": ("sum", "m"), "s": ("sum", "s")},
        num_partitions=P,
    )

    def finish(t: pa.Table) -> pa.Table:
        m = t.column("n_trigrams").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ppl = np.round(np.exp(-s / m), round_dp)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_trigrams": t.column("n_trigrams"),
             "ppl": pa.array(ppl)}
        )

    return per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _tokens_list(col) -> tuple[np.ndarray, np.ndarray]:
    """list<int32> column → (flat int64 values, int64 row offsets),
    offset/slice-correct zero-copy views."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offs


def trigram_lm_scores_tokens(
    seqs: "Dataset",
    *,
    num_partitions: int = 64,
    round_dp: int = 6,
) -> "Dataset":
    """`trigram_lm_scores` over the canonical pre-tokenized corpus
    ``(doc_id, tokens: list<int32>, ...)`` — same model, same join
    plan, but the trigram key is the EXACT int64 packing ``(t1*B +
    t2)*B + t3`` with B = 2^21 (valid for token ids < 2,097,152; the
    50k-vocab corpus is far inside), and the context key ``t1*B + t2``.
    8-byte keys instead of ~3-word strings cut shuffle bytes ~5x, and
    the packing is injective, so results are bit-equal to the string
    plan — no hash-collision caveat. V = distinct token ids observed.
    """
    B = np.int64(1 << 21)
    P = int(num_partitions)

    def occ_fn(batch: pa.Table) -> pa.Table:
        flat, offs = _tokens_list(batch.column("tokens"))
        if flat.size and int(flat.max()) >= int(B):
            raise ValueError("token id exceeds 2^21 — packed key overflows")
        tcnt = np.maximum(np.diff(offs) - 2, 0)
        total = int(tcnt.sum())
        ids = batch.column("doc_id").combine_chunks()
        if total == 0:
            return pa.table(
                {"doc_id": ids.slice(0, 0),
                 "tri": pa.array([], pa.int64()),
                 "k": pa.array([], pa.int64())}
            )
        base = np.repeat(offs[:-1], tcnt)
        ex = np.concatenate(([0], np.cumsum(tcnt)[:-1]))
        st = base + (np.arange(total, dtype=np.int64) - np.repeat(ex, tcnt))
        tri = (flat[st] * B + flat[st + 1]) * B + flat[st + 2]
        doc = ids.take(np.repeat(np.arange(len(tcnt), dtype=np.int64), tcnt))
        occ = pa.table({"doc_id": doc, "tri": pa.array(tri)})
        g = occ.group_by(["doc_id", "tri"]).aggregate([([], "count_all")])
        return g.select(["doc_id", "tri", "count_all"]).rename_columns(
            ["doc_id", "tri", "k"]
        )

    def uniq_fn(batch: pa.Table) -> pa.Table:
        flat, _ = _tokens_list(batch.column("tokens"))
        return pa.table({"t": pa.array(np.unique(flat))})

    # exact distinct token ids: per-batch unique → fixed-partition unique
    uniq = seqs.map_batches(uniq_fn, batch_format="pyarrow", zero_copy_batch=True)

    def add_tp(t: pa.Table) -> pa.Table:
        v = t.column("t").to_numpy(zero_copy_only=False)
        return t.append_column("tp", pa.array((v % P).astype(np.int32)))

    def cnt_part(g: pa.Table) -> pa.Table:
        v = g.column("t").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(np.unique(v))], pa.int64())})

    vparts = (
        uniq.map_batches(add_tp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp")
        .map_groups(cnt_part, batch_format="pyarrow")
        .to_pandas()
    )
    V = int(vparts["n"].sum())

    occ = seqs.map_batches(
        occ_fn, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def add_ctx(t: pa.Table) -> pa.Table:
        tri = t.column("tri").to_numpy(zero_copy_only=False)
        return t.append_column("ctx", pa.array(tri // B))

    return _trigram_score_core(occ, add_ctx, V, P, round_dp)
# staged code for lm.py — applied after the suite finishes


# --------------------------------------- Kneser-Ney trigram (join-scored)
def kn_trigram_lm_scores(
    docs: "Dataset",
    *,
    discount: float = 0.75,
    num_partitions: int = 64,
    round_dp: int = 6,
) -> "Dataset":
    """Interpolated Kneser-Ney trigram LM (fixed discount d), trained
    on the corpus and scored back over it → {doc_id, n_trigrams, ppl}.

    ``p(w3|w1 w2) = max(c3−d,0)/c2 + d·N1+(w1w2·)/c2 · [
    max(N1+(·w2w3)−d,0)/N1+(·w2·) + d·N1+(w2·)/N1+(·w2·) ·
    N1+(·w3)/N1+(··) ]`` — the production smoothing for count LMs.
    Lower-level continuation counts derive from the DISTINCT-trigram
    type table (the standard modified-counts construction), so every
    quantity is an exact integer group-by; probability arithmetic is
    one float expression evaluated identically by the SQL oracle.
    Docs under 3 words are excluded. Scoring the training corpus means
    every denominator is positive (no OOV path).

    Scale shape — the MODEL-AS-TABLE plan taken to its full depth:
    five skinny count tables (c3/c2+N1ctx on the context, N1+mid on
    (w2,w3), N1+den+N1+follow on w2, N1+prec on w3; N1+(··) is one
    scalar) each built by a fixed-P grouped agg over the
    once-materialized occurrence table, then scored by a chain of five
    co-partitioned hash joins (`broadcast="auto"` lets fixture-size
    tables ride the broadcast path; at web scale they shuffle
    co-partitioned). The count-table keys (ctx/mid/w2/w3) are derived
    ONCE on the distinct-trigram table — the occurrence rows join only
    on `tri` and inherit every downstream key from the model side.

    Reference analog: build-then-probe over the same corpus
    (`src/main.cpp` phase 1/2), probe as a join chain.
    """
    from .agg import grouped_agg
    from .join import hash_join

    D = float(discount)
    P = int(num_partitions)

    occ = docs.map_batches(
        _trigram_occ_fn(), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def add_keys(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        words = pc.split_pattern(t.column("tri").combine_chunks(), " ")
        ctx = pc.binary_join(pc.list_slice(words, 0, 2), " ")
        mid = pc.binary_join(pc.list_slice(words, 1, 3), " ")
        w2 = pc.list_element(words, 1)
        w3 = pc.list_element(words, 2)
        return (t.append_column("ctx", ctx).append_column("mid", mid)
                .append_column("w2", w2).append_column("w3", w3))

    c3 = grouped_agg(occ, "tri", {"c3": ("sum", "k")}, num_partitions=P)
    c3 = c3.map_batches(
        add_keys, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    c2 = grouped_agg(
        c3, "ctx", {"c2": ("sum", "c3"), "n1ctx": ("count", None)},
        num_partitions=P,
    )
    nmid = grouped_agg(c3, "mid", {"nmid": ("count", None)}, num_partitions=P)
    # per w2: distinct (w1,w3) pairs (= c3 rows) and distinct w3 (= mid rows)
    nden = grouped_agg(c3, "w2", {"nden": ("count", None)}, num_partitions=P)
    bigt = grouped_agg(
        c3, ["w2", "w3"], {"_one": ("count", None)}, num_partitions=P
    ).materialize()
    nfollow = grouped_agg(bigt, "w2", {"nfollow": ("count", None)},
                          num_partitions=P)
    nprec = grouped_agg(bigt, "w3", {"nprec": ("count", None)},
                        num_partitions=P)
    nbig = int(bigt.count())

    j = hash_join(occ, c3, on="tri", num_partitions=P)
    j = hash_join(j, c2, on="ctx", broadcast="auto", num_partitions=P)
    j = hash_join(j, nmid, on="mid", broadcast="auto", num_partitions=P)
    j = hash_join(j, nden, on="w2", broadcast="auto", num_partitions=P)
    j = hash_join(j, nfollow, on="w2", broadcast="auto", num_partitions=P)
    j = hash_join(j, nprec, on="w3", broadcast="auto", num_partitions=P)

    def score_partial(t: pa.Table) -> pa.Table:
        f = lambda c: t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
        k = f("k")
        c3v, c2v, n1 = f("c3"), f("c2"), f("n1ctx")
        nm, nd, nf, npr = f("nmid"), f("nden"), f("nfollow"), f("nprec")
        p2 = np.maximum(nm - D, 0.0) / nd + (D * nf / nd) * (npr / float(nbig))
        p = np.maximum(c3v - D, 0.0) / c2v + (D * n1 / c2v) * p2
        part = pa.table(
            {"doc_id": t.column("doc_id"),
             "m": pa.array(t.column("k").to_numpy(zero_copy_only=False)),
             "s": pa.array(k * np.log(p))}
        )
        g = part.group_by("doc_id").aggregate([("m", "sum"), ("s", "sum")])
        return g.select(["doc_id", "m_sum", "s_sum"]).rename_columns(
            ["doc_id", "m", "s"]
        )

    per_doc = grouped_agg(
        j.map_batches(score_partial, batch_format="pyarrow",
                      zero_copy_batch=True),
        "doc_id",
        {"n_trigrams": ("sum", "m"), "s": ("sum", "s")},
        num_partitions=P,
    )

    def finish(t: pa.Table) -> pa.Table:
        m = t.column("n_trigrams").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": t.column("doc_id"),
             "n_trigrams": t.column("n_trigrams"),
             "ppl": pa.array(np.round(np.exp(-s / m), round_dp))}
        )

    return per_doc.map_batches(finish, batch_format="pyarrow",
                               zero_copy_batch=True)


def ppl_buckets(
    docs: "Dataset",
    *,
    lang_col: str = "lang",
    q_head: float = 1.0 / 3,
    q_mid: float = 2.0 / 3,
    model: dict | None = None,
) -> "Dataset":
    """CCNet-style perplexity bucketing → ``{doc_id, lang, ppl,
    bucket}`` with bucket ∈ head/middle/tail by per-language LM-ppl
    terciles (Wenzek et al. 2020: low-ppl "head" is the cleanest
    slice of a crawl; the standard quality-partition op before
    sampling).

    Composition of proven parts, all scale-safe: per-doc byte-bigram
    perplexity (:func:`lm_perplexity`, map-only under the broadcast
    model), one skinny doc_id-keyed join to attach the language
    column, per-language EXACT tercile thresholds via the radix-
    narrowing :func:`~..analytics.grouped_quantile_disc` (no
    per-group sort, no group materialization), and a map-only bucket
    tag with the O(languages) threshold dict riding the task closure.
    Docs without a bigram (len < 2) are excluded, as in
    :func:`lm_perplexity`.

    Ranking and bucketing use ppl QUANTIZED to int64 at 1e-6
    half-away-from-zero (the repo's exactness convention): raw
    doubles from two evaluation orders differ at ~1e-12, and a dense
    ppl distribution puts near-ties at the tercile boundary — the
    quantized grid makes the thresholds and the ≤ rule reproducible
    bit-for-bit (in DuckDB: ``TRUNC(ppl*1e6 + 0.5)``). The emitted
    ``ppl`` is the quantized value / 1e6.
    """
    from .analytics import grouped_quantile_disc
    from .join import hash_join

    scores = lm_perplexity(docs, model=model)
    langs = docs.select_columns(["doc_id", lang_col])

    def quantize(t: pa.Table) -> pa.Table:
        p = t.column("ppl").to_numpy(zero_copy_only=False)
        q = np.floor(p * 1e6 + 0.5).astype(np.int64)  # ppl > 0 always
        return pa.table(
            {"doc_id": t.column("doc_id"), "ppl_q": pa.array(q)}
        )

    j = hash_join(
        scores.map_batches(quantize, batch_format="pyarrow",
                           zero_copy_batch=True),
        langs, on="doc_id", broadcast="auto",
    ).materialize()
    if j.count() == 0:
        # every doc was too short to score: typed empty (Ray drops
        # the schema of all-empty datasets through to_pandas)
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            lang_col: pa.array([], pa.string()),
            "ppl": pa.array([], pa.float64()),
            "bucket": pa.array([], pa.string()),
        }))
    t1 = grouped_quantile_disc(j, lang_col, "ppl_q", q_head)
    t2 = grouped_quantile_disc(j, lang_col, "ppl_q", q_mid)
    th1 = dict(zip(t1[lang_col], t1["value"]))
    th2 = dict(zip(t2[lang_col], t2["value"]))

    def bucket(t: pa.Table) -> pa.Table:
        import pandas as pd

        lg = pd.Series(t.column(lang_col).to_numpy(zero_copy_only=False))
        q = t.column("ppl_q").to_numpy(zero_copy_only=False)
        a = lg.map(th1).to_numpy(dtype=np.float64)
        b = lg.map(th2).to_numpy(dtype=np.float64)
        bk = np.where(q <= a, "head", np.where(q <= b, "middle", "tail"))
        return pa.table(
            {"doc_id": t.column("doc_id"),
             lang_col: t.column(lang_col),
             "ppl": pa.array(q.astype(np.float64) / 1e6),
             "bucket": pa.array(bk.astype(object), pa.string())}
        )

    return j.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
