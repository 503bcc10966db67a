"""Corpus-level text statistics: TF-IDF term ranking and vocabulary
coverage.

Training-data curation operators over the ``documents`` table, built on
the same fixed-partition shuffle discipline as the rest of the repo
(BASELINE.md "wide-operator scale pattern"): fine-grained keys (term,
doc) never become Ray groups — every wide step shuffles on
``hash(key) % P`` with fixed P and runs one vectorized kernel per
partition.

Reference lineage: the reference's only "frequency" structure is the
Bloom build's per-partition accumulation (``src/SkmerSplitter.cpp:80-85``);
these operators are the north-rule widening of that grouped-aggregate
shape to document statistics (SURVEY §2 coverage note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash_strings
from ..stages.text import _flat_nonempty_with_counts
from .relational import read

P_SHUF = 64


def _doc_term_tf(batch: pa.Table, id_col: str = "doc_id", col: str = "text") -> pa.Table:
    """batch → {doc_id, term, tf, tpart} — per-document term frequencies.

    One document lives in exactly one row, so per-batch (doc, term)
    aggregation is already globally distinct — the downstream term
    shuffle moves one row per (doc, term), never per occurrence.
    """
    flat, counts = _flat_nonempty_with_counts(batch, col)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"doc_id": np.repeat(ids, counts), "term": np.asarray(flat)})
    agg = df.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
    tpart = (hash_strings(agg["term"]) % np.uint64(P_SHUF)).astype(np.int32)
    return pa.table(
        {
            "doc_id": pa.array(agg["doc_id"].to_numpy()),
            "term": pa.array(agg["term"], pa.string()),
            "tf": pa.array(agg["tf"].to_numpy(np.int64)),
            "tpart": pa.array(tpart),
        }
    )


def tfidf_top_terms(sf_dir: str, topk: int = 3, round_dp: int = 6) -> pd.DataFrame:
    """Top-``topk`` TF-IDF terms per document.

    tf = raw term count in the document; idf = ln(N / df) with
    df = number of documents containing the term, N = total documents.
    Ranking uses the ROUNDED score (desc, then term asc) so the order
    is bit-identical to the SQL oracle.

    Scale shape: two fixed-P shuffles —
      1. by ``hash(term) % P``: every (doc, term) row of one term lands
         in one partition, so df and the per-row score are computed in
         one vectorized pass (no separate DF table, no join);
      2. by ``doc_id % P``: per-document ranking in one sort +
         ``groupby.head`` per partition.
    Nothing driver-side is O(corpus); the result is O(docs × topk).
    """
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    def score_terms(g: pa.Table) -> pa.Table:
        gdf = g.to_pandas()
        df_per_term = gdf.groupby("term", sort=False)["term"].transform("size")
        idf = np.log(float(n_docs) / df_per_term.to_numpy(np.float64))
        tfidf = np.round(gdf["tf"].to_numpy(np.float64) * idf, round_dp)
        dpart = (gdf["doc_id"].to_numpy(np.int64) % P_SHUF).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(gdf["doc_id"].to_numpy()),
                "term": pa.array(gdf["term"], pa.string()),
                "tf": pa.array(gdf["tf"].to_numpy(np.int64)),
                "tfidf": pa.array(tfidf),
                "dpart": pa.array(dpart),
            }
        )

    def rank_per_doc(g: pa.Table) -> pa.Table:
        gdf = (
            g.to_pandas()
            .sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
            .groupby("doc_id", sort=False)
            .head(topk)
        )
        return pa.table(
            {
                "doc_id": pa.array(gdf["doc_id"].to_numpy()),
                "term": pa.array(gdf["term"], pa.string()),
                "tf": pa.array(gdf["tf"].to_numpy(np.int64)),
                "tfidf": pa.array(gdf["tfidf"].to_numpy(np.float64)),
            }
        )

    out = (
        docs.map_batches(_doc_term_tf, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tpart")
        .map_groups(score_terms, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(rank_per_doc, batch_format="pyarrow")
    )
    return (
        out.to_pandas()
        .sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def _ntok_fn(batch: pa.Table) -> pa.Table:
    """batch → {doc_id, n_tok} (whitespace words, empties dropped)."""
    _, counts = _flat_nonempty_with_counts(batch, "text")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tok": pa.array(counts.astype(np.int32)),
        }
    )


def length_filter_percentile(
    sf_dir: str, q_lo: float = 0.05, q_hi: float = 0.95
) -> pd.DataFrame:
    """Length-outlier curation: keep documents whose token count lies
    within the corpus's [q_lo, q_hi] discrete quantiles (inclusive).

    The quantiles are EXACT and computed distributedly as a value
    histogram: per-batch ``value_counts`` of n_tok → ``groupby(n_tok)``
    sum → the driver sees one row per DISTINCT length (bounded, e.g.
    ≤ max sequence length — never O(docs)) and walks the cumulative
    histogram. Discrete-quantile index = ceil(q·n) − 1 (DuckDB
    ``quantile_disc`` semantics, verified empirically) so the SQL
    oracle matches exactly. The filter pass re-derives n_tok per batch
    — two streaming passes, no driver materialization of documents.
    """
    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def hist(batch: pa.Table) -> pa.Table:
        t = _ntok_fn(batch)
        vc = t.column("n_tok").value_counts()
        if isinstance(vc, pa.ChunkedArray):
            vc = vc.combine_chunks()
        return pa.table(
            {
                "n_tok": vc.field("values"),
                "cnt": pa.array(
                    vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    hrows = (
        docs.map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("n_tok")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("n_tok")
    )
    n = int(hrows["cnt"].sum())
    cum = hrows["cnt"].cumsum().to_numpy()
    vals = hrows["n_tok"].to_numpy()

    def q_disc(q: float) -> int:
        rank = int(np.ceil(q * n))  # 1-based rank of the quantile value
        return int(vals[np.searchsorted(cum, max(rank, 1))])

    lo, hi = q_disc(q_lo), q_disc(q_hi)

    def keep(batch: pa.Table) -> pa.Table:
        t = _ntok_fn(batch)
        ntok = t.column("n_tok").to_numpy(zero_copy_only=False)
        return t.filter(pa.array((ntok >= lo) & (ntok <= hi)))

    out = docs.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def pack_sequences(sf_dir: str, seq_len: int = 64) -> pd.DataFrame:
    """Training-sequence chunk plan: split each document into
    fixed-length token windows (stride = seq_len, boundary-respecting)
    → {doc_id, chunk_id, chunk_len}. The map-only row-expansion shape
    of sequence packing; at scale the same kernel emits the token
    payloads alongside (here the plan columns are enough to verify)."""
    docs = read(sf_dir, "documents", ["doc_id", "text"])
    L = int(seq_len)

    def chunks(batch: pa.Table) -> pa.Table:
        t = _ntok_fn(batch)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = t.column("n_tok").to_numpy(zero_copy_only=False).astype(np.int64)
        nch = -(-n // L)  # ceil; 0 chunks for empty docs
        rep = np.repeat(np.arange(len(ids)), nch)
        cw = np.concatenate(([0], np.cumsum(nch)))
        cid = (np.arange(cw[-1], dtype=np.int64) - cw[rep]).astype(np.int32)
        clen = np.minimum(L, n[rep] - L * cid.astype(np.int64)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(ids[rep]),
                "chunk_id": pa.array(cid),
                "chunk_len": pa.array(clen),
            }
        )

    out = docs.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)
    return (
        out.to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )


def chunk_documents(
    ds,
    *,
    chunk_tokens: int,
    stride: int | None = None,
    min_tokens: int = 1,
    col: str = "text",
    id_col: str = "doc_id",
):
    """Sliding-window document chunking WITH the text payload — the
    materializing form of :func:`pack_sequences` (which emits only the
    chunk plan). Each document's non-empty tokens split into windows
    of ``chunk_tokens`` starting every ``stride`` tokens (``stride <
    chunk_tokens`` = overlapping context windows, the RAG/pretraining
    shape; default ``stride == chunk_tokens`` = disjoint); windows
    shorter than ``min_tokens`` (only possible at the tail) are
    dropped. Output: Dataset {id_col, chunk_id, n_tok, chunk_text}
    with ``chunk_id = start // stride`` (dense 0..k-1 per doc) and
    ``chunk_text`` the window re-joined with single spaces.

    Map-only — NO shuffle: every chunk derives from one document row,
    so the operator streams at input parallelism and its output is
    directly consumable by a partitioned sink. Per-batch kernel is
    fully vectorized: one offsets pass sizes all windows, one flat
    ``take`` gathers every window's tokens (overlap = index
    replication, not data copy until the take), one ``binary_join``
    materializes the chunk strings.

    Deterministic and partition-invariant by construction (row-local).
    Exact SQL analog (the oracle): ``generate_series(0, n - min_tok,
    stride)`` starts, 1-based inclusive list slice, array_to_string.
    """
    from ..stages.text import flat_nonempty_with_offsets

    C, m = int(chunk_tokens), int(min_tokens)
    S = C if stride is None else int(stride)
    if C < 1 or S < 1:
        raise ValueError(f"chunk_tokens/stride must be >= 1, got {C}/{S}")
    if not (1 <= m <= C):
        raise ValueError(f"min_tokens must be in [1, chunk_tokens], got {m}")

    def chunks(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch, col)
        n = offs[1:] - offs[:-1]
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        # starts 0, S, 2S, ... with window length min(C, n-start) >= m
        # <=> start <= n - m (window length shrinks with start)
        nch = np.where(n >= m, (n - m) // S + 1, 0)
        rep = np.repeat(np.arange(len(n)), nch)
        cw = np.concatenate(([0], np.cumsum(nch)))
        cid = (np.arange(cw[-1], dtype=np.int64) - cw[rep]).astype(np.int32)
        start = cid.astype(np.int64) * S
        length = np.minimum(C, n[rep] - start)
        # gather every window's tokens from the flat array in one take
        cl = np.concatenate(([0], np.cumsum(length)))
        cov = np.repeat(np.arange(len(length)), length)  # chunk of value
        flat_idx = (offs[:-1][rep] + start)[cov] + (np.arange(cl[-1]) - cl[cov])
        vals = flat.take(pa.array(flat_idx, pa.int64()))
        la = pa.ListArray.from_arrays(pa.array(cl, pa.int32()), vals)
        return pa.table(
            {
                id_col: ids.take(pa.array(rep, pa.int64())),
                "chunk_id": pa.array(cid),
                "n_tok": pa.array(length.astype(np.int32)),
                "chunk_text": pc.binary_join(la, " "),
            }
        )

    return ds.map_batches(chunks, batch_format="pyarrow", zero_copy_batch=True)


def vocab_coverage(sf_dir: str, vocab_size: int = 100, round_dp: int = 6) -> pd.DataFrame:
    """Coverage of the top-``vocab_size`` vocabulary: the fraction of
    all token occurrences captured by the most frequent terms
    (tokenizer-design yardstick: how big must V be to cover the corpus).

    Scale shape: per-batch partial counts (`value_counts` combiner) →
    one fixed-P shuffle on ``hash(term) % P`` → per-partition total +
    local top-V (cnt desc, term asc) → driver merges P × V candidate
    rows (every global top-V term is in its partition's local top-V
    because all rows of one term share a partition). Driver work is
    O(P × V), never O(vocab).
    """
    from ..stages.text import make_explode_token_counts_fn

    docs = read(sf_dir, "documents", ["text"])
    explode = make_explode_token_counts_fn()

    def add_part(batch: pa.Table) -> pa.Table:
        t = explode(batch)
        part = (hash_strings(t.column("tok").to_pandas()) % np.uint64(P_SHUF)).astype(
            np.int32
        )
        return t.append_column("part", pa.array(part))

    def local_top(g: pa.Table) -> pa.Table:
        gdf = g.to_pandas()
        totals = gdf.groupby("tok", sort=False)["cnt"].sum().reset_index()
        ptotal = int(totals["cnt"].sum())
        top = totals.sort_values(["cnt", "tok"], ascending=[False, True]).head(vocab_size)
        part = int(gdf["part"].iloc[0]) if len(gdf) else -1
        return pa.table(
            {
                "part": pa.array(np.full(len(top), part, np.int32)),
                "tok": pa.array(top["tok"], pa.string()),
                "cnt": pa.array(top["cnt"].to_numpy(np.int64)),
                "ptotal": pa.array(np.full(len(top), ptotal, np.int64)),
            }
        )

    cand = (
        docs.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(local_top, batch_format="pyarrow")
        .to_pandas()
    )
    total = int(cand.drop_duplicates("part")["ptotal"].sum())
    top = cand.sort_values(["cnt", "tok"], ascending=[False, True]).head(vocab_size)
    covered = int(top["cnt"].sum())
    return pd.DataFrame(
        {
            "vocab_size": pd.array([vocab_size], dtype="int32"),
            "total_tokens": pd.array([total], dtype="int64"),
            "coverage": [round(covered / total, round_dp)],
        }
    )


# ----------------------------------------------------- PMI collocations
def top_pmi_bigrams(
    sf_dir: str, topk: int = 20, min_count: int = 5, round_dp: int = 6,
    score: str = "pmi",
) -> pd.DataFrame:
    """Top-``topk`` word-bigram collocations by pointwise mutual
    information: ``pmi = ln(c12 · M² / (N · c1 · c2))`` with c12 the
    bigram count, c1/c2 the unigram counts, M total tokens, N total
    bigrams. Bigrams below ``min_count`` are excluded (the standard
    PMI noise gate). Ranking uses the ROUNDED pmi (desc) then (w1, w2)
    lexicographic, so order is bit-identical to the SQL oracle.

    Scale shape — the unigram table is NEVER broadcast (web-scale
    vocab doesn't fit a worker): three content-keyed fixed-P shuffles,

      1. per-batch partial bigram + unigram counts (tagged rows, one
         pass over documents);
      2. shuffle on ``hash(w1) % P``: globalize counts, attach c1 to
         each bigram (unigram global rows re-emitted — they live in
         the same partition under the next shuffle too);
      3. shuffle on ``hash(w2) % P``: attach c2, gate on min_count,
         compute pmi, per-partition local top-k;

    then an O(P × k) driver merge. Totals M and N come from the tiny
    per-batch partial sums, not a separate corpus pass.
    """
    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_nonempty_with_counts(batch, "text")
        w = np.asarray(flat)
        # within-row consecutive pairs (drop cross-row junk pairs)
        if len(w) >= 2:
            ends = np.cumsum(counts) - 1  # last token index per row
            keep = np.ones(len(w) - 1, dtype=bool)
            keep[ends[(ends >= 0) & (ends < len(w) - 1)]] = False  # empty first rows give -1
            w1, w2 = w[:-1][keep], w[1:][keep]
        else:
            w1 = w2 = w[:0]
        bdf = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False).size().reset_index(name="c")
        )
        udf = pd.DataFrame({"w1": w}).groupby("w1", sort=False).size().reset_index(name="c")
        udf["w2"] = None
        out = pd.concat([bdf, udf[["w1", "w2", "c"]]], ignore_index=True)
        p1 = (hash_strings(out["w1"]) % np.uint64(P_SHUF)).astype(np.int32)
        return pa.table(
            {"w1": pa.array(out["w1"], pa.string()),
             "w2": pa.array(out["w2"], pa.string()),
             "c": pa.array(out["c"].to_numpy(np.int64)),
             "p1": pa.array(p1)}
        )

    part = docs.map_batches(
        partials, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # totals from the tagged partials (tiny aggregates, no extra pass)
    import pyarrow.compute as _pc

    def totals(t: pa.Table) -> pa.Table:
        isu = _pc.is_null(t.column("w2")).combine_chunks().to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(c[isu].sum())]),
                         "n": pa.array([int(c[~isu].sum())])})

    tot = part.map_batches(totals, batch_format="pyarrow").to_pandas()
    M, N = float(tot["m"].sum()), float(tot["n"].sum())

    def attach_c1(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        isu = df["w2"].isna()
        uni = df[isu].groupby("w1", sort=False)["c"].sum()
        big = df[~isu].groupby(["w1", "w2"], sort=False)["c"].sum().reset_index()
        big["c1"] = big["w1"].map(uni).to_numpy(np.int64)
        p2 = (hash_strings(big["w2"]) % np.uint64(P_SHUF)).astype(np.int32)
        out = pa.table(
            {"w1": pa.array(big["w1"], pa.string()),
             "w2": pa.array(big["w2"], pa.string()),
             "c": pa.array(big["c"].to_numpy(np.int64)),
             "c1": pa.array(big["c1"].to_numpy(np.int64)),
             "p2": pa.array(p2)}
        )
        # global unigram rows ride along: same hash key -> same
        # partition under the p2 shuffle (w2 null, c1 null)
        urows = uni.reset_index()
        up = (hash_strings(urows["w1"]) % np.uint64(P_SHUF)).astype(np.int32)
        utab = pa.table(
            {"w1": pa.array(urows["w1"], pa.string()),
             "w2": pa.array([None] * len(urows), pa.string()),
             "c": pa.array(urows["c"].to_numpy(np.int64)),
             "c1": pa.array([None] * len(urows), pa.int64()),
             "p2": pa.array(up)}
        )
        return pa.concat_tables([out, utab])

    def local_topk(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        isu = df["w2"].isna()
        uni = df[isu].set_index("w1")["c"]
        big = df[~isu].copy()
        big = big[big["c"] >= min_count]
        if big.empty:
            return pa.table(
                {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
                 "c12": pa.array([], pa.int64()), score: pa.array([], pa.float64())}
            )
        c2 = big["w2"].map(uni).to_numpy(np.float64)
        c12 = big["c"].to_numpy(np.float64)
        c1 = big["c1"].to_numpy(np.float64)
        if score == "pmi":
            val = np.log(c12 * M * M / (N * c1 * c2)).round(round_dp)
        else:  # Dunning log-likelihood ratio G^2 (2x2, N-bigram universe)
            def term(O, E):
                # guard E <= 0 as well as O <= 0: a unigram marginal
                # can exceed the bigram universe (c2 > N with a
                # dominant token plus many 1-token docs), making
                # E = c1*(N-c2)/N negative; both engine and oracle
                # contribute exactly 0 for that degenerate cell
                with np.errstate(divide="ignore", invalid="ignore"):
                    return np.where((O > 0) & (E > 0), O * np.log(O / E), 0.0)
            g2 = 2.0 * (
                term(c12, c1 * c2 / N)
                + term(c1 - c12, c1 * (N - c2) / N)
                + term(c2 - c12, (N - c1) * c2 / N)
                + term(N - c1 - c2 + c12, (N - c1) * (N - c2) / N)
            )
            val = g2.round(round_dp)
        big = big.assign(**{score: val}).sort_values(
            [score, "w1", "w2"], ascending=[False, True, True]
        ).head(topk)
        return pa.table(
            {"w1": pa.array(big["w1"], pa.string()),
             "w2": pa.array(big["w2"], pa.string()),
             "c12": pa.array(big["c"].to_numpy(np.int64)),
             score: pa.array(big[score].to_numpy(np.float64))}
        )

    out = (
        part.groupby("p1").map_groups(attach_c1, batch_format="pyarrow")
        .groupby("p2").map_groups(local_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values([score, "w1", "w2"], ascending=[False, True, True])
        .head(topk)
        .reset_index(drop=True)
    )
    return out


def top_g2_bigrams(
    sf_dir: str, topk: int = 20, min_count: int = 5, round_dp: int = 6
) -> pd.DataFrame:
    """Top-``topk`` collocations by Dunning's log-likelihood ratio
    (G², "Accurate Methods for the Statistics of Surprise and
    Coincidence", CL'93) — the 2×2 contingency over the N-bigram
    universe with UNIGRAM marginals (the common toolkit convention):
    O11 = c12, O12 = c1−c12, O21 = c2−c12, O22 = N−c1−c2+c12,
    E_ij from the marginals, G² = 2·Σ O·ln(O/E) with O ≤ 0 terms
    contributing exactly 0 (covers the stopword corner where the
    unigram marginal exceeds the bigram universe). Ranking on the
    ROUNDED score, mirrored by the SQL oracle; same three
    content-keyed shuffles as :func:`top_pmi_bigrams` (the unigram
    table is never broadcast). G² prefers high-count collocations
    where PMI favors rare ones — the two rankings are complementary.
    """
    return top_pmi_bigrams(sf_dir, topk=topk, min_count=min_count,
                           round_dp=round_dp, score="g2")


# --------------------------------------------- source distribution drift
def source_kl_divergence(sf_dir: str, round_dp: int = 6) -> pd.DataFrame:
    """Per-source vocabulary drift: {source, n_tok, kl} where
    ``kl = Σ_t p_s(t) · ln(p_s(t) / q(t))`` — the KL divergence of each
    source's token unigram distribution from the whole-corpus
    distribution. The monitoring statistic for "did this crawl slice
    drift from the mix" in a training-data pipeline.

    Every term t with ``p_s(t) > 0`` also has ``q(t) > 0`` (the corpus
    includes the source), so the sum is always finite — no smoothing
    needed, which keeps the SQL oracle exact.

    Scale shape: per-batch partial (source, token) counts → one
    fixed-P shuffle on ``hash(token) % P`` (all counts of a token
    co-locate; sources ride along) → per-partition global (source,
    token) counts and corpus token counts → each partition emits its
    partial KL contribution per source (sources × P tiny rows) →
    driver sum. Totals (per source and corpus) come from the same
    partials. Two passes over nothing — one shuffle total, vocabulary
    never leaves its partition.
    """
    docs = read(sf_dir, "documents", ["text", "source"])

    def partial_counts(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_nonempty_with_counts(batch, "text")
        src = batch.column("source").to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"source": np.repeat(src, counts), "tok": np.asarray(flat)}
        ).groupby(["source", "tok"], sort=False).size().reset_index(name="c")
        tp = (hash_strings(df["tok"]) % np.uint64(P_SHUF)).astype(np.int32)
        return pa.table(
            {"source": pa.array(df["source"], pa.string()),
             "tok": pa.array(df["tok"], pa.string()),
             "c": pa.array(df["c"].to_numpy(np.int64)),
             "tp": pa.array(tp)}
        )

    part = docs.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # totals per source (and corpus-wide) — per-batch partial sums of
    # the partials, never a driver materialization of (source, tok) rows
    def tot_fn(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": t.column("source").to_pandas(),
             "c": t.column("c").to_numpy(zero_copy_only=False)}
        ).groupby("source", sort=False)["c"].sum().reset_index()
        return pa.table({"source": pa.array(df["source"], pa.string()),
                         "c": pa.array(df["c"].to_numpy(np.int64))})

    tdf = part.map_batches(tot_fn, batch_format="pyarrow").to_pandas()
    n_s = tdf.groupby("source")["c"].sum()  # tokens per source
    N = float(n_s.sum())

    n_s_map = {s: float(v) for s, v in n_s.items()}

    def partition_kl(g: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": g.column("source").to_pandas(),
             "tok": g.column("tok").to_pandas(),
             "c": g.column("c").to_numpy(zero_copy_only=False)}
        )
        st = df.groupby(["source", "tok"], sort=False)["c"].sum().reset_index()
        ct = st.groupby("tok", sort=False)["c"].sum()
        c_st = st["c"].to_numpy(np.float64)
        c_t = st["tok"].map(ct).to_numpy(np.float64)
        ns = st["source"].map(n_s_map).to_numpy(np.float64)
        contrib = (c_st / ns) * np.log((c_st / ns) / (c_t / N))
        out = (
            st.assign(k=contrib).groupby("source", sort=False)["k"].sum().reset_index()
        )
        return pa.table({"source": pa.array(out["source"], pa.string()),
                         "k": pa.array(out["k"].to_numpy(np.float64))})

    kdf = (
        part.groupby("tp").map_groups(partition_kl, batch_format="pyarrow")
        .to_pandas().groupby("source")["k"].sum().reset_index()
    )
    kdf["n_tok"] = kdf["source"].map(n_s).astype("int64")
    kdf["kl"] = kdf["k"].round(round_dp)
    return (
        kdf[["source", "n_tok", "kl"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


# ----------------------------------------------------- TextRank keywords
def textrank_keywords(
    sf_dir: str,
    iters: int = 10,
    topk: int = 20,
    damping: float = 0.85,
    round_dp: int = 6,
    engine: str = "broadcast",
) -> pd.DataFrame:
    """Corpus keywords by TextRank (Mihalcea & Tarau 2004): PageRank
    over the undirected word co-occurrence graph (distinct adjacent
    token pairs, both directions, self-loops dropped) → top-``topk``
    {tok, rank}, ranked by the 6-dp-rounded score then token.

    Scale shape: the edge set is built by a fixed-P content-keyed
    dedup shuffle and stays distributed; iterations are map-only
    passes broadcasting the O(vocab) rank vector
    (``graph.pagerank``). The only driver state is the vocabulary
    catalog and the rank vector — the same size class, both bounded
    by vocabulary, not corpus.

    ``engine="distributed"`` routes the rank iterations through
    :func:`graph.pagerank_distributed` instead — rank rows stay
    co-partitioned with edges, the vector never materializes anywhere
    (the web-graph shape; same fixed point, parity ~1e-12).
    """
    from .graph import pagerank, pagerank_distributed

    if engine not in ("broadcast", "distributed"):
        raise ValueError(f"engine must be broadcast|distributed, got {engine!r}")

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    # vocabulary catalog (sorted) — distinct tokens via per-batch
    # unique + fixed-P distinct; O(vocab) on the driver
    def uniq(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_nonempty_with_counts(batch, "text")
        u = np.unique(np.asarray(flat))
        tp = (hash_strings(pd.Series(u)) % np.uint64(P_SHUF)).astype(np.int32)
        return pa.table({"tok": pa.array(u, pa.string()), "tp": pa.array(tp)})

    def distinct_tok(g: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(g.column("tok").to_pandas()))
        return pa.table({"tok": pa.array(u, pa.string())})

    vocab = np.sort(
        docs.map_batches(uniq, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tp").map_groups(distinct_tok, batch_format="pyarrow")
        .to_pandas()["tok"].to_numpy()
    )
    V = len(vocab)
    if V == 0:
        return pd.DataFrame({"tok": pd.array([], dtype="object"),
                             "rank": pd.array([], dtype="float64")})

    def edge_partials(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_nonempty_with_counts(batch, "text")
        ids = np.searchsorted(vocab, np.asarray(flat))
        if len(ids) >= 2:
            ends = np.cumsum(counts) - 1
            keep = np.ones(len(ids) - 1, dtype=bool)
            keep[ends[(ends >= 0) & (ends < len(ids) - 1)]] = False  # empty first rows give -1
            a, b = ids[:-1][keep], ids[1:][keep]
            ok = a != b
            a, b = a[ok], b[ok]
        else:
            a = b = ids[:0]
        # both directions, batch-local distinct (the combiner)
        s = np.concatenate([a, b])
        d = np.concatenate([b, a])
        e = np.unique(s.astype(np.int64) * V + d.astype(np.int64))
        return pa.table(
            {"s": pa.array((e // V).astype(np.int64)),
             "d": pa.array((e % V).astype(np.int64)),
             "ep": pa.array(((e % P_SHUF)).astype(np.int32))}
        )

    def distinct_edges(g: pa.Table) -> pa.Table:
        s = g.column("s").to_numpy(zero_copy_only=False)
        d = g.column("d").to_numpy(zero_copy_only=False)
        e = np.unique(s * V + d)
        return pa.table({"s": pa.array(e // V), "d": pa.array(e % V)})

    edges = (
        docs.map_batches(edge_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ep").map_groups(distinct_edges, batch_format="pyarrow")
    ).materialize()

    # the graph's node set is the ENGAGED vocabulary (tokens that occur
    # in at least one edge) — a token seen only alone / only next to
    # itself is not a node, and N in the teleport term must match
    def endpoints(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        m = np.zeros(V, dtype=bool)
        m[s] = True
        m[d] = True
        return pa.table({"m": pa.array(m)})

    eng = np.zeros(V, dtype=bool)
    for b in edges.map_batches(
        endpoints, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        eng |= (
            b.column("m").to_numpy(zero_copy_only=False).reshape(-1, V).any(axis=0)
        )
    nodes = np.flatnonzero(eng)
    if len(nodes) == 0:
        return pd.DataFrame({"tok": pd.array([], dtype="object"),
                             "rank": pd.array([], dtype="float64")})
    remap = np.full(V, -1, dtype=np.int64)
    remap[nodes] = np.arange(len(nodes))
    remap_ref = remap  # closure capture (O(vocab), the documented size class)

    def compact(t: pa.Table) -> pa.Table:
        s = remap_ref[t.column("s").to_numpy(zero_copy_only=False)]
        d = remap_ref[t.column("d").to_numpy(zero_copy_only=False)]
        return pa.table({"s": pa.array(s), "d": pa.array(d)})

    edges_c = edges.map_batches(compact, batch_format="pyarrow", zero_copy_batch=True)
    if engine == "distributed":
        rank_ds = pagerank_distributed(edges_c, len(nodes), iters=iters, damping=damping)
        r = np.zeros(len(nodes))
        for b in rank_ds.iter_batches(batch_format="pyarrow", batch_size=None):
            r[b.column("node").to_numpy(zero_copy_only=False)] = (
                b.column("rank").to_numpy(zero_copy_only=False)
            )
    else:
        r = pagerank(edges_c, len(nodes), iters=iters, damping=damping)
    df = pd.DataFrame({"tok": vocab[nodes], "rank": np.round(r, round_dp)})
    return (
        df.sort_values(["rank", "tok"], ascending=[False, True])
        .head(topk)
        .reset_index(drop=True)
    )


# ----------------------------------------------------- document novelty
def doc_novelty(sf_dir: str, k: int = 3, round_dp: int = 6) -> pd.DataFrame:
    """Per-document novelty: {doc_id, n_grams, novelty} where novelty =
    (distinct word-k-grams appearing in NO other document) / (doc's
    distinct k-grams), rounded. The originality signal curation uses
    to up-weight novel content and flag boilerplate-only documents
    (novelty 0 = every shingle exists elsewhere).

    Scale shape: distinct (gram, doc) postings (per-batch combiner) →
    one content-keyed fixed-P shuffle (every copy of a gram
    co-locates, so df is exact within the partition) → per-partition
    per-doc partial {n_grams, n_unique} → ``grouped_agg`` sum on
    doc_id → one divide. Text never travels; two shuffles total.
    """
    from .agg import grouped_agg
    from .dedup import _doc_gram_hashes
    from .relational import read

    docs = read(sf_dir, "documents", ["doc_id", "text"])

    def postings(batch: pa.Table) -> pa.Table:
        gh, row_idx = _doc_gram_hashes(batch, k, "text")
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(gh) == 0:
            return pa.table(
                {"gh": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "gp": pa.array([], pa.int32())}
            )
        uniq = np.unique(np.stack([row_idx, gh.view(np.int64)], axis=1), axis=0)
        rows, ghs = uniq[:, 0], uniq[:, 1]
        return pa.table(
            {"gh": pa.array(ghs), "doc_id": pa.array(ids[rows]),
             "gp": pa.array((np.abs(ghs) % P_SHUF).astype(np.int32))}
        )

    def partition_partials(g: pa.Table) -> pa.Table:
        gh = g.column("gh").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        # global distinct postings (cross-batch dupes collapse here)
        uniq = np.unique(np.stack([gh, ids], axis=1), axis=0)
        gh, ids = uniq[:, 0], uniq[:, 1]
        # df per gram within this partition == global df (co-location)
        ugh, inv, cnt = np.unique(gh, return_inverse=True, return_counts=True)
        own_unique = cnt[inv] == 1
        df = pd.DataFrame(
            {"doc_id": ids, "u": own_unique.astype(np.int64)}
        ).groupby("doc_id").agg(n_grams=("u", "count"), n_unique=("u", "sum")).reset_index()
        return pa.table(
            {"doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
             "n_grams": pa.array(df["n_grams"].to_numpy(np.int64)),
             "n_unique": pa.array(df["n_unique"].to_numpy(np.int64))}
        )

    sums = grouped_agg(
        docs.map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gp")
        .map_groups(partition_partials, batch_format="pyarrow"),
        "doc_id",
        {"n_grams": ("sum", "n_grams"), "n_unique": ("sum", "n_unique")},
    ).to_pandas()
    sums["novelty"] = (
        sums["n_unique"].to_numpy(np.float64) / sums["n_grams"].to_numpy(np.float64)
    ).round(round_dp)
    return (
        sums[["doc_id", "n_grams", "novelty"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# --------------------------------------------------- source similarity matrix
def source_similarity(
    docs: "Dataset",
    *,
    num_partitions: int = 32,
    round_dp: int = 6,
) -> pd.DataFrame:
    """Pairwise EXACT Jaccard similarity of source token vocabularies.

    Output: {source_a, source_b, n_a, n_b, intersection, jaccard} for
    every source pair (a < b) sharing at least one token.

    Shape: per-batch distinct (source, tok) partials -> ONE token-keyed
    fixed-P shuffle; inside each partition the (source, tok) set is
    exact (same token never spans partitions), so per-source vocab
    partials AND per-token source-pair rows both fold there (pair
    fan-out is S^2 per token worst case — sources are few by
    construction). A tiny grouped sum finishes; the driver sees only
    O(S^2) rows. Generalizes `source_overlap` (single pair) to the
    full matrix in the same two-shuffle budget.
    """
    from ..functions.hashing import hash_strings
    from ..stages.text import flat_nonempty_with_offsets
    from .agg import grouped_agg

    P = int(num_partitions)

    def st_partials(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        src = batch.column("source").to_numpy(zero_copy_only=False)
        rep = np.repeat(src, np.diff(offs))
        df = pd.DataFrame(
            {"source": rep, "tok": flat.to_pandas()}
        ).drop_duplicates()
        part = (
            hash_strings(pa.array(df["tok"], pa.string())) % np.uint64(P)
        ).astype(np.int32)
        return pa.table(
            {"part": pa.array(part),
             "source": pa.array(df["source"], pa.string()),
             "tok": pa.array(df["tok"], pa.string())}
        )

    def fold(g: pa.Table) -> pa.Table:
        df = g.to_pandas()[["source", "tok"]].drop_duplicates()
        # per-source vocab partials (kind 'n', other source = "")
        vocab = df.groupby("source", sort=False).size().reset_index(name="c")
        # per-token source pairs (kind 'i')
        pairs = df.merge(df, on="tok")
        pairs = pairs[pairs["source_x"] < pairs["source_y"]]
        pc_ = (
            pairs.groupby(["source_x", "source_y"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {"sa": pa.array(
                np.concatenate([vocab["source"].to_numpy(dtype=object),
                                pc_["source_x"].to_numpy(dtype=object)]), pa.string()),
             "sb": pa.array(
                np.concatenate([np.full(len(vocab), "", dtype=object),
                                pc_["source_y"].to_numpy(dtype=object)]), pa.string()),
             "c": pa.array(
                np.concatenate([vocab["c"].to_numpy(dtype=np.int64),
                                pc_["c"].to_numpy(dtype=np.int64)]))}
        )

    sums = grouped_agg(
        docs.map_batches(st_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(fold, batch_format="pyarrow"),
        ["sa", "sb"], {"c": ("sum", "c")}, num_partitions=8,
    ).to_pandas()

    vocab = sums[sums["sb"] == ""].set_index("sa")["c"]
    inter = sums[sums["sb"] != ""].copy()
    inter["n_a"] = inter["sa"].map(vocab).astype(np.int64)
    inter["n_b"] = inter["sb"].map(vocab).astype(np.int64)
    inter["jaccard"] = (
        inter["c"] / (inter["n_a"] + inter["n_b"] - inter["c"])
    ).round(round_dp)
    out = inter.rename(
        columns={"sa": "source_a", "sb": "source_b", "c": "intersection"}
    )[["source_a", "source_b", "n_a", "n_b", "intersection", "jaccard"]]
    return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)


# ---------------------------------------------------- per-doc token entropy
def doc_token_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document unigram Shannon entropy (nats) — the classic
    gibberish/boilerplate signal: near-0 = one token repeated,
    high = diverse vocabulary.

    entropy = ln(dl) − (Σ_t c_t·ln c_t)/dl over the doc's distinct
    tokens. Map-only (each document is scored inside its own batch —
    zero shuffle at any corpus size). Exactness: each c·ln(c) term is
    quantized to int64 1e-9 units half-away BEFORE the per-doc sum
    (order-free, SQL-reproducible); the final value is quantized once
    to 1e-6. Empty documents score 0 with n_tok 0.
    """
    from ..stages.text import flat_nonempty_with_offsets

    def score(batch: pa.Table) -> pa.Table:
        flat, offs = flat_nonempty_with_offsets(batch)
        n = batch.num_rows
        dl = (offs[1:] - offs[:-1]).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), dl)
        if len(rows):
            g = pd.DataFrame({"r": rows, "t": np.asarray(flat)}).groupby(
                ["r", "t"], sort=False
            ).size()
            c = g.to_numpy(dtype=np.float64)
            u9 = np.trunc(1e9 * (c * np.log(c)) + 0.5).astype(np.int64)
            s_u9 = np.zeros(n, np.int64)
            np.add.at(s_u9, g.index.get_level_values("r").to_numpy(), u9)
        else:
            s_u9 = np.zeros(n, np.int64)
        ent = np.zeros(n, np.float64)
        nz = dl > 0
        ent[nz] = np.log(dl[nz].astype(np.float64)) - (s_u9[nz] / 1e9) / dl[nz]
        e_u6 = np.trunc(1e6 * ent + np.copysign(0.5, ent)).astype(np.int64)
        return pa.table(
            {"doc_id": batch.column("doc_id"),
             "n_tok": pa.array(dl),
             "entropy": pa.array(e_u6 / 1e6)}
        )

    out = (
        read(sf_dir, "documents", columns=["doc_id", "text"])
        .map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def zipf_fit(
    docs: "Dataset",
    *,
    text_col: str = "text",
    group_col: str = "source",
    round_dp: int = 6,
) -> "Dataset":
    """Per-group Zipf rank-frequency power-law fit → ``{group,
    n_types, n_tokens, zipf_alpha, zipf_r2}`` — the corpus-statistics
    op behind "does this source look like natural language?" checks
    (natural text fits ln f = c − α·ln r with α ≈ 1 and high r²;
    boilerplate/spam/generated junk deviate hard).

    OLS of ln(freq) on ln(rank) in closed form (rank = 1.. by freq
    DESC, token ASC — a total order, so the per-group float sums run
    in one deterministic order and the result is partition-
    invariant). Scale shape: per-batch (group, token, cnt) partials
    (map-side combine: a repeated token ships once per batch) → one
    fixed-P token-keyed grouped fold → a group-keyed fold over the
    DISTINCT-type rows (O(vocabulary) per group, never per
    occurrence; the final stage holds one group's type table, which
    is vocabulary-sized — millions, not corpus-sized).
    """
    from .agg import grouped_agg

    def partials(batch: pa.Table) -> pa.Table:
        flat, counts = _flat_nonempty_with_counts(batch, text_col)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "g": np.repeat(grp, counts), "tok": np.asarray(flat),
        })
        agg = df.groupby(["g", "tok"], sort=False).size().reset_index(name="c")
        return pa.table({
            "g": pa.array(agg["g"], pa.string()),
            "tok": pa.array(agg["tok"], pa.string()),
            "c": pa.array(agg["c"].to_numpy(np.int64)),
        })

    counts = grouped_agg(
        docs.map_batches(partials, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["g", "tok"], {"cnt": ("sum", "c")}, num_partitions=64,
    )

    def fit(g: pa.Table) -> pa.Table:
        grp = g.column("g").to_numpy(zero_copy_only=False)
        tok = g.column("tok").to_numpy(zero_copy_only=False)
        cnt = g.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tok, -cnt))  # freq DESC, token ASC
        f = cnt[order].astype(np.float64)
        n = len(f)
        out = {
            "group": pa.array([str(grp[0])]),
            "n_types": pa.array([np.int64(n)]),
            "n_tokens": pa.array([np.int64(cnt.sum())]),
        }
        if n < 2:
            out["zipf_alpha"] = pa.array([None], pa.float64())
            out["zipf_r2"] = pa.array([None], pa.float64())
            return pa.table(out)
        x = np.log(np.arange(1, n + 1, dtype=np.float64))
        y = np.log(f)
        sx, sy = x.sum(), y.sum()
        sxx, syy, sxy = (x * x).sum(), (y * y).sum(), (x * y).sum()
        dx = n * sxx - sx * sx
        dy = n * syy - sy * sy
        slope = (n * sxy - sx * sy) / dx
        r2 = ((n * sxy - sx * sy) ** 2 / (dx * dy)) if dy > 0 else 1.0
        out["zipf_alpha"] = pa.array([round(-slope, round_dp)])
        out["zipf_r2"] = pa.array([round(float(r2), round_dp)])
        return pa.table(out)

    return counts.groupby("g").map_groups(fit, batch_format="pyarrow")


# ------------------------------------------------- readability scoring
def readability_by_source(ds: "pa.Table | object", *, num_partitions: int = 16) -> pd.DataFrame:
    """Per-source Flesch–Kincaid grade-level aggregate → {source,
    n_docs, fk_q_sum, avg_fk} — the curation gate that ranks sources
    by linguistic complexity (a pretraining-mix signal alongside
    quality_classifier's shallow features).

    Spec (deterministic, SQL-replayable): words = non-empty whitespace
    tokens (W, docs with W = 0 are excluded); sentences = max(1,
    non-overlapping matches of /[.!?]+/); syllables per word = max(1,
    non-overlapping /[aeiouy]+/ runs of the lowercased word), summed
    per doc (SY); grade = 0.39·(W/S) + 11.8·(SY/W) − 15.59 evaluated
    in exactly that literal shape (each operand a single IEEE op on
    both engines), quantized per doc to 1e-6 int64 half-away, then
    EXACT integer sums per source; avg_fk = fk_q_sum/n_docs/1e6 (one
    division). Map-only derive + one fixed-P grouped sum — O(sources)
    rows shuffle, text never does. Vectorized end to end: the regex
    counts run as Arrow kernels over the flat token array (no per-row
    Python), per-doc sums by reduceat on the row offsets.
    """
    from .agg import grouped_agg

    def derive(t: pa.Table) -> pa.Table:
        from ..stages.text import flat_nonempty_with_offsets

        flat, offs = flat_nonempty_with_offsets(t)
        W = np.diff(offs).astype(np.int64)
        syl = pc.count_substring_regex(
            pc.utf8_lower(flat), "[aeiouy]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        syl = np.maximum(syl, 1)
        SY = np.add.reduceat(
            np.concatenate([syl, [0]]), np.minimum(offs[:-1], len(syl))
        )
        SY = np.where(W > 0, SY, 0).astype(np.int64)
        S = pc.count_substring_regex(
            t.column("text"), "[.!?]+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        S = np.maximum(S, 1)
        keep = W > 0
        Wf, Sf, SYf = (W[keep].astype(np.float64), S[keep].astype(np.float64),
                       SY[keep].astype(np.float64))
        g = 0.39 * (Wf / Sf) + 11.8 * (SYf / Wf) - 15.59
        u = g * 1e6
        fk_q = np.trunc(u + np.copysign(0.5, u)).astype(np.int64)
        return pa.table(
            {"source": t.column("source").filter(pa.array(keep)),
             "fk_q": pa.array(fk_q)}
        )

    out = grouped_agg(
        ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
        ["source"],
        {"n_docs": ("count", None), "fk_q_sum": ("sum", "fk_q")},
        num_partitions=num_partitions,
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["fk_q_sum"] = out["fk_q_sum"].astype(np.int64)
    out["avg_fk"] = out["fk_q_sum"] / out["n_docs"] / 1e6
    return out.sort_values("source").reset_index(drop=True)
