"""TF-IDF and vocabulary-coverage pipeline tests (synthetic corpus +
DuckDB cross-check, plus edge cases the fixture tables don't cover)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bloomfilter_multithread_ray.pipelines import text_stats as TS


@pytest.fixture(scope="module")
def mini_corpus(tmp_path_factory, ray_session):
    """Tiny deterministic corpus with ties, repeats, and an empty doc."""
    d = tmp_path_factory.mktemp("text_stats_sf")
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                "apple banana apple cherry",
                "banana banana date",
                "apple cherry cherry cherry",
                "",  # no tokens → no tf-idf rows
                "egg egg egg egg",  # unique-term doc: idf = ln(5/1)
            ],
            "lang": ["en"] * 5,
            "source": ["s"] * 5,
            "n_chars": pa.array([0] * 5, pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(d, "documents.parquet"))
    return str(d)


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).df()


TFIDF_SQL = (
    "WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term "
    "FROM documents), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term), "
    "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "n AS (SELECT COUNT(*) AS n FROM documents), "
    "s AS (SELECT doc_id, tf.term, tf, ROUND(tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf "
    "FROM tf JOIN df ON tf.term = df.term CROSS JOIN n), "
    "r AS (SELECT doc_id, term, tf, tfidf, "
    "row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM s) "
    "SELECT doc_id, term, tf, tfidf FROM r WHERE rn <= 2 "
    "ORDER BY doc_id, tfidf DESC, term"
)


def test_tfidf_matches_duckdb_on_mini_corpus(mini_corpus):
    got = TS.tfidf_top_terms(mini_corpus, topk=2)
    exp = _oracle(mini_corpus, TFIDF_SQL)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.reset_index(drop=True),
        check_dtype=False,
    )
    # the empty doc contributes no rows
    assert 4 not in set(got["doc_id"])
    # doc 5's only term has df=1 → idf = ln(5), tf = 4
    egg = got[got["doc_id"] == 5]
    assert list(egg["term"]) == ["egg"]
    assert egg["tfidf"].iloc[0] == pytest.approx(round(4 * np.log(5.0), 6))


def test_tfidf_tie_breaks_by_term(mini_corpus):
    # doc 1: apple(tf2) vs banana/cherry(tf1). banana and cherry both
    # appear in 2 docs → identical scores; term asc must pick banana.
    got = TS.tfidf_top_terms(mini_corpus, topk=3)
    d1 = got[got["doc_id"] == 1].reset_index(drop=True)
    assert list(d1["term"]) == sorted(d1["term"], key=lambda t: (-d1[d1.term == t].tfidf.iloc[0], t))


def test_vocab_coverage_mini(mini_corpus):
    got = TS.vocab_coverage(mini_corpus, vocab_size=2)
    # counts: cherry 4, egg 4, apple 3, banana 3, date 1 → total 15;
    # top-2 by (cnt desc, term asc) = cherry, egg → 8/15
    assert int(got["total_tokens"].iloc[0]) == 15
    assert got["coverage"].iloc[0] == pytest.approx(round(8 / 15, 6))
    assert int(got["vocab_size"].iloc[0]) == 2


def test_vocab_coverage_full_vocab_is_one(mini_corpus):
    got = TS.vocab_coverage(mini_corpus, vocab_size=100)
    assert got["coverage"].iloc[0] == pytest.approx(1.0)


def test_length_filter_percentile_mini(mini_corpus):
    # lengths: doc1=4, doc2=3, doc3=4, doc4=0, doc5=4 → sorted [0,3,4,4,4]
    # q_disc(0.05): rank ceil(.25)=1 → 0; q_disc(0.95): rank ceil(4.75)=5 → 4
    got = TS.length_filter_percentile(mini_corpus, q_lo=0.05, q_hi=0.95)
    assert set(got["doc_id"]) == {1, 2, 3, 4, 5}
    # tighter band drops the empty doc and the length-3 doc
    got2 = TS.length_filter_percentile(mini_corpus, q_lo=0.5, q_hi=1.0)
    assert set(got2["doc_id"]) == {1, 3, 5}


def test_pack_sequences_mini(mini_corpus):
    got = TS.pack_sequences(mini_corpus, seq_len=3)
    # doc1 (4 tokens) → chunks of 3 + 1; doc4 (0 tokens) → none
    d1 = got[got["doc_id"] == 1]
    assert list(d1["chunk_id"]) == [0, 1]
    assert list(d1["chunk_len"]) == [3, 1]
    assert 4 not in set(got["doc_id"])
    # total chunk_len reconstructs each doc's token count
    tot = got.groupby("doc_id")["chunk_len"].sum().to_dict()
    assert tot == {1: 4, 2: 3, 3: 4, 5: 4}


def test_top_pmi_bigrams_known_corpus(ray_session, tmp_path):
    import numpy as np
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.text_stats import top_pmi_bigrams

    # "x y" always co-occurs (strong collocation); "a b" co-occurs at
    # chance among shuffled fillers
    rng = np.random.default_rng(4)
    docs = []
    for i in range(60):
        filler = list(rng.permutation(["a", "b", "c", "d"] * 3))
        docs.append({"doc_id": i, "text": " ".join(["x", "y"] + filler)})
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet")
    out = top_pmi_bigrams(str(tmp_path), topk=5, min_count=5)
    assert (out.w1.iloc[0], out.w2.iloc[0]) == ("x", "y")
    assert out.c12.iloc[0] == 60
    assert (out.pmi.values == np.sort(out.pmi.values)[::-1]).all()


def test_source_kl_divergence_properties(ray_session, tmp_path):
    import numpy as np
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.text_stats import source_kl_divergence

    # source "same" mirrors the corpus mix; source "skewed" doesn't
    docs = []
    for i in range(40):
        docs.append({"doc_id": i, "text": "a b c d", "source": "same"})
    for i in range(40, 80):
        docs.append({"doc_id": i, "text": "a a a a", "source": "skewed"})
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet")
    out = source_kl_divergence(str(tmp_path))
    kl = out.set_index("source").kl
    assert kl["skewed"] > kl["same"] >= 0
    # exact check vs closed form: p_same uniform(4) vs corpus q
    q = np.array([ (40 + 160) , 40, 40, 40], dtype=float)  # a, b, c, d counts
    q = q / q.sum()
    p_same = np.array([0.25, 0.25, 0.25, 0.25])
    want_same = float(np.sum(p_same * np.log(p_same / q)))
    p_skew = np.array([1.0])
    want_skew = float(np.sum(p_skew * np.log(p_skew / q[:1])))
    assert kl["same"] == round(want_same, 6)
    assert kl["skewed"] == round(want_skew, 6)


def test_textrank_hub_ranks_first(ray_session, tmp_path):
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.text_stats import textrank_keywords

    # "hub" is adjacent to every spoke; spokes only touch the hub
    docs = [
        {"doc_id": i, "text": f"hub spoke{i} hub spoke{i}"} for i in range(10)
    ]
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet")
    out = textrank_keywords(str(tmp_path), iters=10, topk=5)
    assert out.tok.iloc[0] == "hub"
    assert out["rank"].iloc[0] > out["rank"].iloc[1] * 3
    # ranks sum to ~1 over the full node set (probability vector)
    full = textrank_keywords(str(tmp_path), iters=10, topk=1000)
    assert abs(full["rank"].sum() - 1.0) < 1e-3


def test_pmi_and_textrank_tolerate_empty_leading_docs(ray_session, tmp_path):
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.text_stats import (
        textrank_keywords,
        top_pmi_bigrams,
    )

    # empty doc FIRST: the row-boundary index is -1 and must not wrap
    # around to drop the final adjacent pair
    docs = [{"doc_id": 0, "text": ""}, {"doc_id": 1, "text": ""}]
    docs += [{"doc_id": 2 + i, "text": "x y"} for i in range(8)]
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet")
    out = top_pmi_bigrams(str(tmp_path), topk=5, min_count=5)
    assert (out.w1.iloc[0], out.w2.iloc[0], out.c12.iloc[0]) == ("x", "y", 8)
    tr = textrank_keywords(str(tmp_path), iters=3, topk=5)
    assert set(tr.tok) == {"x", "y"}


def test_doc_novelty_known_values(ray_session, tmp_path):
    import pandas as pd

    from bloomfilter_multithread_ray.pipelines.text_stats import doc_novelty

    docs = [
        {"doc_id": 0, "text": "a b c d e"},        # grams: abc bcd cde
        {"doc_id": 1, "text": "a b c x y"},        # shares abc with 0
        {"doc_id": 2, "text": "p q r s"},          # fully novel
        {"doc_id": 3, "text": "a b"},              # too short: no grams
    ]
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet")
    out = doc_novelty(str(tmp_path), k=3).set_index("doc_id")
    assert out.loc[0, "n_grams"] == 3 and out.loc[0, "novelty"] == round(2 / 3, 6)
    assert out.loc[1, "n_grams"] == 3 and out.loc[1, "novelty"] == round(2 / 3, 6)
    assert out.loc[2, "novelty"] == 1.0
    assert 3 not in out.index  # gram-less doc has undefined novelty


def test_textrank_engines_agree(ray_session, tmp_path):
    """engine="distributed" (pagerank_distributed: rank rows
    co-partitioned with edges, no broadcast vector) must land on the
    broadcast engine's keywords exactly at 6 dp."""
    import numpy as np
    import pandas as pd
    import pytest

    from bloomfilter_multithread_ray.pipelines.text_stats import textrank_keywords

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        {"doc_id": i, "text": " ".join(rng.choice(vocab, size=12))}
        for i in range(30)
    ]
    pd.DataFrame(docs).to_parquet(tmp_path / "documents.parquet")
    a = textrank_keywords(str(tmp_path), iters=6, topk=15)
    b = textrank_keywords(str(tmp_path), iters=6, topk=15, engine="distributed")
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(ValueError, match="engine"):
        textrank_keywords(str(tmp_path), engine="spark")


def test_doc_token_entropy_planted(ray_session, tmp_path):
    import math

    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.pipelines.text_stats import doc_token_entropy

    texts = ["a a a a", "a b c d", "", "a a b  b"]
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    got = doc_token_entropy(str(d)).set_index("doc_id")
    # doc 0: one distinct token -> 0; doc 1: uniform over 4 -> ln 4;
    # doc 2: empty -> 0 with n_tok 0; doc 3: uniform over 2 -> ln 2
    assert got.loc[0, "entropy"] == 0.0 and got.loc[0, "n_tok"] == 4
    assert got.loc[2, "entropy"] == 0.0 and got.loc[2, "n_tok"] == 0
    for i, want in [(1, math.log(4.0)), (3, math.log(2.0))]:
        assert abs(got.loc[i, "entropy"] - want) < 2e-6, i
    assert got.loc[3, "n_tok"] == 4  # double space didn't add a token


def _chunk_ref(texts, C, S, m):
    rows = []
    for i, t in enumerate(texts):
        w = [x for x in t.split(" ") if x]
        n = len(w)
        st = 0
        while n >= m and st <= n - m:
            seg = w[st : st + C]
            rows.append((i, st // S, len(seg), " ".join(seg)))
            st += S
    df = pd.DataFrame(rows, columns=["doc_id", "chunk_id", "n_tok", "chunk_text"])
    return df.astype({"doc_id": "int64", "chunk_id": "int32", "n_tok": "int32"})


@pytest.mark.parametrize(
    "C,S,m",
    [(4, 3, 1), (4, 3, 2), (5, 5, 1), (3, 7, 1), (6, 2, 6)],
)
def test_chunk_documents_parity(ray_session, C, S, m):
    """Overlap, disjoint, gapped (S>C) and full-window-only (m=C)
    chunking all match a sequential reference, at any partitioning."""
    import ray

    texts = [
        "a b c d e f g h i j",
        "  x  y ",  # leading/double spaces -> 2 tokens
        "",  # empty -> no chunks
        "one",
        "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13",
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ref = _chunk_ref(texts, C, S, m)
    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            TS.chunk_documents(ds, chunk_tokens=C, stride=S, min_tokens=m)
            .to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )
        if ref.empty:
            assert len(got) == 0
        else:
            pd.testing.assert_frame_equal(got, ref)


def test_chunk_documents_duckdb_cross(ray_session):
    """Random corpus vs the oracle-shaped DuckDB query."""
    import ray

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 90)))
        for _ in range(60)
    ]
    df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64), "text": texts})
    got = (
        TS.chunk_documents(
            ray.data.from_pandas(df).repartition(5),
            chunk_tokens=16, stride=10, min_tokens=3,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    sql = (
        "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS w FROM documents), "
        "nn AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) >= 3), "
        "s AS (SELECT doc_id, w, n, unnest(generate_series(0, n - 3, 10)) AS st FROM nn) "
        "SELECT doc_id, CAST(st // 10 AS INT) AS chunk_id, "
        "CAST(least(st + 16, n) - st AS INT) AS n_tok, "
        "array_to_string(w[st + 1 : least(st + 16, n)], ' ') AS chunk_text "
        "FROM s ORDER BY doc_id, chunk_id"
    )
    want = con.execute(sql).df().astype({"chunk_id": "int32", "n_tok": "int32"})
    pd.testing.assert_frame_equal(got, want)


def test_chunk_documents_validation(ray_session):
    import ray

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError, match="chunk_tokens"):
        TS.chunk_documents(ds, chunk_tokens=0)
    with pytest.raises(ValueError, match="min_tokens"):
        TS.chunk_documents(ds, chunk_tokens=4, min_tokens=5)


def test_zipf_fit_matches_reference_and_partitioning(ray_session):
    import math
    from collections import Counter

    import numpy as np
    import ray.data as rd

    from bloomfilter_multithread_ray.pipelines.text_stats import zipf_fit

    rng = np.random.default_rng(23)
    # a roughly-Zipfian synthetic corpus: token w_i drawn ~ 1/(i+1)
    vocab = [f"w{i}" for i in range(40)]
    p = 1.0 / np.arange(1, 41)
    p /= p.sum()
    rows = []
    for i in range(100):
        src = f"s{i % 3}"
        k = int(rng.integers(5, 60))
        rows.append({"doc_id": i, "source": src,
                     "text": " ".join(rng.choice(vocab, size=k, p=p))})
    rows.append({"doc_id": 100, "source": "tiny", "text": "only only only"})

    def ref(rws):
        out = {}
        by = {}
        for r in rws:
            by.setdefault(r["source"], Counter()).update(
                w for w in r["text"].split() if w)
        for src, cnt in by.items():
            items = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            n = len(items)
            row = {"n_types": n, "n_tokens": sum(cnt.values())}
            if n < 2:
                row["zipf_alpha"] = None
                row["zipf_r2"] = None
            else:
                x = np.log(np.arange(1, n + 1, dtype=np.float64))
                y = np.log(np.array([c for _, c in items], dtype=np.float64))
                sx, sy = x.sum(), y.sum()
                sxx, syy, sxy = (x*x).sum(), (y*y).sum(), (x*y).sum()
                dx, dy = n*sxx - sx*sx, n*syy - sy*sy
                row["zipf_alpha"] = round(-(n*sxy - sx*sy)/dx, 6)
                row["zipf_r2"] = round((n*sxy - sx*sy)**2/(dx*dy), 6) if dy > 0 else 1.0
            out[src] = row
        return out

    expect = ref(rows)
    for par in (1, 7):
        df = zipf_fit(rd.from_items(rows).repartition(par)).to_pandas()
        assert len(df) == len(expect)
        for r in df.itertuples():
            e = expect[r.group]
            assert int(r.n_types) == e["n_types"] and int(r.n_tokens) == e["n_tokens"]
            if e["zipf_alpha"] is None:
                assert pd.isna(r.zipf_alpha) and pd.isna(r.zipf_r2)
            else:
                assert abs(float(r.zipf_alpha) - e["zipf_alpha"]) < 1e-9, r.group
                assert abs(float(r.zipf_r2) - e["zipf_r2"]) < 1e-9, r.group
    # the Zipf-shaped sources actually fit: alpha near 1, r2 high
    main = df[df.group != "tiny"]
    assert (main.zipf_alpha > 0.5).all() and (main.zipf_r2 > 0.7).all()


def test_g2_bigrams_reference_and_ranking(ray_session, tmp_path):
    """G^2 matches a from-spec reference on a planted corpus, and
    ranks the frequent collocation ABOVE a rare-but-pure pair that PMI
    would favor (the complementary-ordering property)."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.pipelines.text_stats import (
        top_g2_bigrams, top_pmi_bigrams,
    )

    filler = " ".join(f"w{i % 37} w{(i * 7) % 41}" for i in range(300))
    texts = (["ice cream is nice and ice cream melts"] * 10
             + ["zyx qwv"] * 5 + [filler])
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet")
    got = top_g2_bigrams(str(d), topk=10, min_count=5)

    # from-spec reference over the same corpus
    toks = [t.split() for t in texts]
    uni: dict = {}
    big: dict = {}
    N = 0
    for w in toks:
        for t in w:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(w, w[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            N += 1

    def g2(c12, c1, c2):
        def term(O, E):
            return O * math.log(O / E) if O > 0 else 0.0
        return 2.0 * (term(c12, c1 * c2 / N)
                      + term(c1 - c12, c1 * (N - c2) / N)
                      + term(c2 - c12, (N - c1) * c2 / N)
                      + term(N - c1 - c2 + c12,
                             (N - c1) * (N - c2) / N))

    exp = sorted(
        ((a, b, c, round(g2(c, uni[a], uni[b]), 6))
         for (a, b), c in big.items() if c >= 5),
        key=lambda r: (-r[3], r[0], r[1]))[:10]
    assert [tuple(r) for r in got.itertuples(index=False)] == exp
    # 'ice cream' (10x) outranks 'zyx qwv' (5x, perfectly pure) on G^2
    rank = {(r.w1, r.w2): i for i, r in enumerate(got.itertuples())}
    assert rank[("ice", "cream")] < rank[("zyx", "qwv")]
    # ...while PMI prefers the rare pure pair (complementary orderings)
    pmi = top_pmi_bigrams(str(d), topk=10, min_count=5)
    prank = {(r.w1, r.w2): i for i, r in enumerate(pmi.itertuples())}
    assert prank[("zyx", "qwv")] < prank[("ice", "cream")]
