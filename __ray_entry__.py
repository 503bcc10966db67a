"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
functions use.

Each ``queries()`` entry is one implemented operator/pipeline from
SURVEY.md §2 (or a north-rule widening); ``oracle_sql()`` carries the
DuckDB-equivalent SQL for the exact-mode pipelines. Sketch-mode
(approximate) pipelines have no SQL oracle — their error bounds are
asserted against exact oracles in pytest (tests/test_sketches.py,
tests/test_analytics_pipelines.py); the driver records a rows-only
check for them.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMALL = "/root/testdata/sf0.001"


def _round(df, cols, nd=2):
    df = df.copy()
    for c in cols:
        df[c] = df[c].astype(float).round(nd)
    return df


# --------------------------------------------------------------------------
def entry() -> Any:
    """Flagship: partitioned Bloom build + probe over sf0.001 documents.

    Build a word-3-gram Bloom store from the corpus, probe the corpus
    against itself (expected: every gram member — zero false
    negatives), return the per-gram membership Dataset.
    """
    import ray.data

    from bloomfilter_multithread_ray.pipelines.bloom import (
        build_partitioned_bloom,
        probe_bloom,
    )
    from bloomfilter_multithread_ray.stages.sketch_agg import sketch_rows_to_dict
    from bloomfilter_multithread_ray.stages.text import make_word_kgram_hash_fn

    k, P, bits = 3, 16, 1 << 20
    docs = ray.data.read_parquet(f"{SF_SMALL}/documents.parquet", columns=["doc_id", "text"])
    hash_fn = make_word_kgram_hash_fn(k, P)
    hashed = docs.map_batches(hash_fn, batch_format="pyarrow", zero_copy_batch=True)

    from bloomfilter_multithread_ray.stages.sketch_agg import SketchAgg
    from bloomfilter_multithread_ray.state import BloomFilter

    sk = hashed.groupby("part").aggregate(SketchAgg(lambda: BloomFilter(bits, 4), on="gh"))
    shards = sketch_rows_to_dict(sk.take_all())

    import numpy as np
    import pyarrow as pa

    import ray

    shards_ref = ray.put({p: s.serialize() for p, s in shards.items()})

    class Probe:
        def __init__(self):
            from bloomfilter_multithread_ray.state.base import deserialize_sketch

            self.shards = {p: deserialize_sketch(b) for p, b in ray.get(shards_ref).items()}
            self.fn = make_word_kgram_hash_fn(k, P, with_identity=True)

        def __call__(self, t: pa.Table) -> pa.Table:
            g = self.fn(t)
            part = g.column("part").to_numpy()
            gh = g.column("gh").to_numpy(zero_copy_only=False).astype(np.uint64)
            member = np.zeros(len(gh), dtype=bool)
            for p in np.unique(part):
                shard = self.shards.get(int(p))  # absent partition => non-member
                if shard is not None:
                    m = part == p
                    member[m] = shard.contains(gh[m])
            return pa.table(
                {"doc_id": g.column("doc_id"), "pos": g.column("pos"), "member": member}
            )

    return docs.map_batches(Probe, batch_format="pyarrow", zero_copy_batch=True, concurrency=2)


# --------------------------------------------------------------------------
def queries() -> dict[str, Callable[[str], Any]]:
    from bloomfilter_multithread_ray.pipelines import analytics as A
    from bloomfilter_multithread_ray.pipelines import relational as R
    from bloomfilter_multithread_ray.stages import text as T

    def _docs(sf_dir, cols):
        # size-aware block count (see relational.read): downstream
        # shuffles pay fixed latency per upstream block
        return R.read(sf_dir, "documents", cols)

    # ---- exact mode (DuckDB-checkable) ----
    def distinct_tokens(sf_dir):
        return A.distinct_count_exact(
            _docs(sf_dir, ["text"]), T.make_unique_tokens_fn(), out_name="distinct_tokens"
        )

    def heavy_hitters(sf_dir):
        return A.heavy_hitters_exact(_docs(sf_dir, ["text"]), T.make_explode_token_counts_fn(), topk=20)

    def ntok_quantiles(sf_dir):
        import pyarrow as pa

        stats_fn = T.make_doc_token_stats_fn()

        def with_source(t: pa.Table) -> pa.Table:
            s = stats_fn(t)
            return s.append_column("source", t.column("source"))

        ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            with_source, batch_format="pyarrow", zero_copy_batch=True
        )
        return A.grouped_quantiles_exact(ds, "n_tok", "source")

    def token_count(sf_dir):
        ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            T.make_doc_token_stats_fn(), batch_format="pyarrow", zero_copy_batch=True
        )
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def dedup_exact(sf_dir):
        return R.dedup_exact_documents(sf_dir)

    def curate_corpus(sf_dir):
        return R.curate_corpus(sf_dir)

    def tpch_q1(sf_dir):
        return R.tpch_q1(sf_dir)

    def bloom_semijoin(sf_dir):
        return R.bloom_semijoin_lineitem(sf_dir)

    def top_customers(sf_dir):
        return _round(R.top_customers(sf_dir), ["revenue"])

    def parts_skyline(sf_dir):
        # Pareto frontier of part: cheapest price vs biggest size —
        # local frontiers merge once, raw rows never shuffle.
        from bloomfilter_multithread_ray.pipelines.skyline import skyline

        part = R.read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
        out = skyline(part, ["p_retailprice", "p_size"], maximize=["p_size"])
        df = out.to_pandas()
        df["p_size"] = df["p_size"].astype("int64")
        return df.sort_values("p_partkey").reset_index(drop=True)

    def events_hourly(sf_dir):
        return _round(R.events_hourly(sf_dir), ["sum_value"])

    def events_hourly_distinct(sf_dir):
        return R.events_hourly_distinct(sf_dir)

    def events_value_p95(sf_dir):
        out = A.grouped_quantile_disc(
            R.read(sf_dir, "events", ["event_type", "value"]),
            "event_type", "value", 0.95,
        )
        return out.rename(columns={"value": "p95"})

    def heavy_hitters_by_source(sf_dir):
        return A.heavy_hitters_by_group(
            _docs(sf_dir, ["text", "source"]),
            T.make_explode_token_counts_by_fn("source"),
            "source",
            topk=5,
        )

    def distinct_by_source(sf_dir):
        return A.distinct_count_by_group_exact(
            _docs(sf_dir, ["text", "source"]), T.make_unique_tokens_by_fn("source"), "source"
        )

    def distinct_by_source_hll(sf_dir):
        return A.distinct_count_by_group_hll(
            _docs(sf_dir, ["text", "source"]), T.make_token_hash_by_fn("source"), "source"
        )

    def range_join_bands(sf_dir):
        return R.range_join_price_bands(sf_dir)

    def join_size_events_orders(sf_dir):
        # exact equi-join SIZE without materializing the join: per-key
        # counts each side (map-side combined) -> one count-table join
        # -> sum of products; the oracle anchor of the AGMS twin below
        ev = R.read(sf_dir, "events", ["user_id"])
        orders = R.read(sf_dir, "orders", ["o_custkey"])
        return A.join_size_exact(ev, orders, "user_id", "o_custkey")

    def join_size_events_orders_cs(sf_dir):
        # AGMS CountSketch inner product: join-size estimate with NO
        # shuffle at all (one streaming sketch pass per side); bound vs
        # the exact twin asserted in pytest -> rows-only driver check
        ev = R.read(sf_dir, "events", ["user_id"])
        orders = R.read(sf_dir, "orders", ["o_custkey"])
        return A.join_size_countsketch(ev, orders, "user_id", "o_custkey")

    def join_orders_customer(sf_dir):
        # the general hash-partitioned equi-join operator (large×large
        # shape: both sides shuffle on hash(key) % P, no broadcast)
        import ray.data

        from bloomfilter_multithread_ray.pipelines.join import hash_join

        orders = R.read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        cust = R.read(sf_dir, "customer", ["c_custkey", "c_name"])
        out = hash_join(
            orders, cust, on="o_custkey", right_on="c_custkey", how="inner",
            num_partitions=32,
        )
        df = out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
        return df[["o_orderkey", "o_custkey", "c_name", "o_totalprice"]]

    def full_join_customer_order_counts(sf_dir):
        # full-outer mode of the same operator. The two sides are
        # filtered to overlapping-but-distinct key ranges so the result
        # exercises all three row classes (left-only / both / right-only)
        import pyarrow as pa
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines.join import hash_join

        cust = R.read(sf_dir, "customer", ["c_custkey", "c_name"]).filter(
            expr="c_custkey <= 200"
        )

        def keep_keys(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t.column("o_custkey"), 100))

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        # fixed-P vectorized grouped count (Ray's built-in Aggregate pays
        # per-group Python cost — 4.9 s for these 15k groups at sf0.1)
        orders = grouped_agg(
            R.read(sf_dir, "orders", ["o_custkey"]).map_batches(
                keep_keys, batch_format="pyarrow", zero_copy_batch=True
            ),
            "o_custkey",
            {"n_orders": ("count", None)},
            num_partitions=16,
        )
        out = hash_join(
            cust, orders, on="c_custkey", right_on="o_custkey", how="full",
            num_partitions=16,
        )
        df = out.to_pandas()
        return df.sort_values(
            ["c_custkey", "c_name"], na_position="last"
        ).reset_index(drop=True)

    def events_clustered_scan(sf_dir):
        # range-clustered table store (CLUSTER BY): events written as
        # sorted ts-range directories + zone-map manifest under /tmp,
        # then a one-week scan opens ONLY overlapping rid= dirs
        # (directory pruning before any row group I/O) and aggregates
        # per-day micros-exact. The oracle is the same predicate over
        # the raw table — pruning must be pure I/O elision.
        import shutil
        import tempfile

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines import table_store as TS
        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        ev = R.read(sf_dir, "events", ["event_id", "ts", "value"])
        out_dir = tempfile.mkdtemp(prefix="graft_cluster_", dir="/tmp")
        try:
            TS.write_clustered(ev, out_dir, "ts", num_ranges=16)
            lo, hi = "2024-01-08", "2024-01-15"
            scan = TS.read_clustered(out_dir, lo=lo, hi=hi)

            def derive(t: pa.Table) -> pa.Table:
                ts = (
                    t.column("ts").combine_chunks().cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                    .view(np.int64)
                )
                day = (ts // 86_400_000_000) * 86_400_000_000
                v = np.rint(
                    t.column("value").to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)
                return pa.table({"day_us": pa.array(day), "v_u6": pa.array(v)})

            agg = grouped_agg(
                scan.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
                "day_us",
                {"n_events": ("count", None), "value_sum_micros": ("sum", "v_u6")},
                num_partitions=8,
            )
            df = pd.DataFrame(agg.take_all())
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        df["n_events"] = df["n_events"].astype(np.int64)
        df["value_sum_micros"] = df["value_sum_micros"].astype(np.int64)
        return df.sort_values("day_us").reset_index(drop=True)[
            ["day_us", "n_events", "value_sum_micros"]
        ]

    def store_bloom_lookup(sf_dir):
        # Bloom file-skipping index: events clustered by ts (zone maps
        # can't help an event_id point lookup), per-range Bloom sidecar
        # over event_id, lookup opens ONLY Bloom-positive rid= dirs
        # (measured 14/16 pruned at sf0.01) then exact IN-filters —
        # false positives cost a read, never a wrong row.
        import shutil
        import tempfile

        from bloomfilter_multithread_ray.pipelines import table_store as TS

        ev = R.read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
        d = tempfile.mkdtemp(prefix="graft_bidx_", dir="/tmp")
        try:
            TS.write_clustered(ev, d, "ts", num_ranges=16)
            TS.build_bloom_index(d, "event_id", num_bits=1 << 16)
            ds, _stats = TS.bloom_pruned_lookup(
                d, "event_id", [3, 411, 777, 905, 998],
                columns=["event_id", "user_id", "value"],
            )
            df = ds.to_pandas()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        return df.sort_values("event_id").reset_index(drop=True)[
            ["event_id", "user_id", "value"]
        ]

    def events_cube(sf_dir):
        # GROUP BY CUBE in one distributed pass: per-batch replication
        # per grouping set + gid column -> ONE map-side-combined
        # grouped_agg; SQL GROUPING() bitmask disambiguates rolled-up
        # NULL from data NULL. Exact int64 micros sums.
        import numpy as np
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.agg import cube

        ds = R.read(sf_dir, "events", ["event_type", "ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            day = (
                t.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[D]").astype(str)
            )
            v = t.column("value").to_numpy(zero_copy_only=False) * 1_000_000.0
            vmic = np.trunc(v + np.copysign(0.5, v)).astype(np.int64)
            return pa.table(
                {"event_type": t.column("event_type"),
                 "day": pa.array(day, pa.string()), "vmic": pa.array(vmic)}
            )

        out = cube(
            ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
            ["event_type", "day"],
            {"n_events": ("count", None), "vmic": ("sum", "vmic")},
            num_partitions=16,
        ).to_pandas()
        out["sum_value"] = out.pop("vmic") / 1_000_000.0
        out["n_events"] = out["n_events"].astype("int64")
        return (
            out.sort_values(["grouping_id", "event_type", "day"], na_position="last")
            .reset_index(drop=True)
            [["event_type", "day", "grouping_id", "n_events", "sum_value"]]
        )

    def store_compact_scan(sf_dir):
        # offline compaction drill: 32-range clustered write -> compact
        # to ~4x fewer ranges -> the SAME bounded scan + aggregate as
        # events_clustered_scan; compaction must be invisible to readers
        # (same oracle SQL), while the manifest shrinks.
        import shutil
        import tempfile

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines import table_store as TS
        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        ev = R.read(sf_dir, "events", ["event_id", "ts", "value"])
        out_dir = tempfile.mkdtemp(prefix="graft_compact_", dir="/tmp")
        try:
            man = TS.write_clustered(ev, out_dir, "ts", num_ranges=32)
            total = int(man.n_rows.sum())
            TS.compact_clustered(out_dir, target_rows=max(1, total // 8))
            scan = TS.read_clustered(out_dir, lo="2024-01-08", hi="2024-01-15")

            def derive(t: pa.Table) -> pa.Table:
                ts = (
                    t.column("ts").combine_chunks().cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                    .view(np.int64)
                )
                day = (ts // 86_400_000_000) * 86_400_000_000
                v = np.rint(
                    t.column("value").to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)
                return pa.table({"day_us": pa.array(day), "v_u6": pa.array(v)})

            agg = grouped_agg(
                scan.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
                "day_us",
                {"n_events": ("count", None), "value_sum_micros": ("sum", "v_u6")},
                num_partitions=8,
            )
            df = pd.DataFrame(agg.take_all())
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        df["n_events"] = df["n_events"].astype(np.int64)
        df["value_sum_micros"] = df["value_sum_micros"].astype(np.int64)
        return df.sort_values("day_us").reset_index(drop=True)[
            ["day_us", "n_events", "value_sum_micros"]
        ]

    def parts_fuzzy_names(sf_dir):
        # edit-distance similarity join (SymSpell depth-2 deletion
        # blocking + banded pair-vectorized DP): all part-id pairs with
        # levenshtein(p_name) <= 2 and the exact distance.
        from bloomfilter_multithread_ray.pipelines.fuzzy import (
            edit_distance_pairs,
        )

        part = R.read(sf_dir, "part", ["p_partkey", "p_name"])
        return edit_distance_pairs(part, "p_partkey", "p_name", max_dist=2)

    def parts_fuzzy_name_stats(sf_dir):
        # pairs_only aggregate mode of the edit-distance join: one row
        # per verified distinct NAME pair with the count of id pairs it
        # would expand to — candidate-sized output, id expansion never
        # runs (the 100-TB default; parts_fuzzy_names stays the exact
        # expansion oracle anchor)
        from bloomfilter_multithread_ray.pipelines.fuzzy import (
            edit_distance_pairs,
        )

        part = R.read(sf_dir, "part", ["p_partkey", "p_name"])
        return edit_distance_pairs(
            part, "p_partkey", "p_name", max_dist=2, pairs_only=True
        )

    def parts_jw_names(sf_dir):
        # Jaro-Winkler similarity join (exact AllPairs character
        # prefix-filter blocking via the m >= (3J-2)*maxlen matching
        # bound + pair-vectorized exact JW kernel, DuckDB-parity
        # semantics incl. the 0.7 boost threshold and floored
        # transposition halving): all distinct name pairs at JW >= 0.88
        # with the 6-dp similarity and the id-pair expansion count
        from bloomfilter_multithread_ray.pipelines.fuzzy import (
            jaro_winkler_pairs,
        )

        part = R.read(sf_dir, "part", ["p_name"])
        return jaro_winkler_pairs(part, "p_name", tau=0.88)

    def top_g2_bigrams(sf_dir):
        # Dunning G^2 collocations (2x2 contingency, N-bigram universe,
        # unigram marginals, O<=0 terms exactly 0); same three
        # content-keyed shuffles as the PMI ranking — complementary
        # orderings (G^2 favors frequent pairs, PMI rare ones)
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            top_g2_bigrams as G2,
        )

        return G2(sf_dir)

    def parts_entities(sf_dir):
        # entity resolution over part names: JW >= 0.88 links close
        # (transitive), entity = lexicographically smallest member;
        # blocking join does the heavy lifting distributed, the
        # closure runs over the vocabulary-bounded matched-pair list;
        # SQL oracle = fixed-step lexicographic min-label propagation
        from bloomfilter_multithread_ray.pipelines.fuzzy import (
            entity_resolution,
        )

        part = R.read(sf_dir, "part", ["p_name"])
        return entity_resolution(part, "p_name", tau=0.88)

    def users_type_entropy(sf_dir):
        # per-user event-type Shannon entropy via the mergeable
        # H = ln n - (sum c ln c)/n identity; two combined passes
        from bloomfilter_multithread_ray.pipelines.analytics import (
            grouped_entropy,
        )

        out = grouped_entropy(
            R.read(sf_dir, "events", ["user_id", "event_type"]),
            "user_id", "event_type",
        )
        return out.to_pandas().sort_values("user_id").reset_index(drop=True)[
            ["user_id", "n", "entropy"]
        ]

    def users_top_event_type(sf_dir):
        # deterministic per-user MODE (ties -> smallest value): two
        # map-side-combined count passes, rows never co-locate raw
        from bloomfilter_multithread_ray.pipelines.analytics import grouped_mode

        out = grouped_mode(
            R.read(sf_dir, "events", ["user_id", "event_type"]),
            "user_id", "event_type",
        )
        df = out.to_pandas()
        df["mode_count"] = df["mode_count"].astype("int64")
        return df.sort_values("user_id").reset_index(drop=True)

    def events_value_p90_cont(sf_dir):
        # PERCENTILE_CONT: the radix narrowing run at both bracketing
        # ranks + one count pass; values never co-locate
        from bloomfilter_multithread_ray.pipelines.analytics import (
            grouped_quantile_cont,
        )

        out = grouped_quantile_cont(
            R.read(sf_dir, "events", ["event_type", "value"]),
            "event_type", "value", 0.9,
        )
        return out.rename(columns={"value": "p90"})

    def events_type_hour_assoc(sf_dir):
        # chi-squared / mutual-information / Cramér's V between
        # event_type and hour-of-day: distributed contingency build
        # (one map-side-combined grouped count), O(|A|x|B|) driver fold
        import numpy as np
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import (
            association_stats,
        )

        ev = R.read(sf_dir, "events", ["event_type", "ts"])

        def derive(t: pa.Table) -> pa.Table:
            ts = (
                t.column("ts").combine_chunks().cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                .view(np.int64)
            )
            hour = (ts // 3_600_000_000) % 24
            return pa.table(
                {"event_type": t.column("event_type"),
                 "hour": pa.array(hour.astype(np.int64))}
            )

        return association_stats(
            ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
            "event_type", "hour",
        )

    def users_pattern_match(sf_dir):
        # MATCH_RECOGNIZE-lite: per-user ordered event-type sequence
        # tested against an RE2 regex (view, no intervening error,
        # then purchase); group_concat + map-only Arrow regex.
        from bloomfilter_multithread_ray.pipelines.analytics import (
            sequence_pattern_match,
        )

        ev = R.read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        out = sequence_pattern_match(
            ev, "user_id", "event_type", ["ts", "event_id"],
            r"view( (?:click|signup|view|purchase))* purchase",
            num_partitions=16,
        )
        df = out.to_pandas()
        return df.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "seq", "matched"]
        ]

    def docs_phrase_hits(sf_dir):
        # blocklist scan: actor-pool compiled prefix-free lookahead
        # alternations, SQL position() semantics incl. overlaps
        from bloomfilter_multithread_ray.pipelines.curation import phrase_match

        phrases = [
            "hash join", "sort merge", "table scan", "window agg",
            "key order", "batch stream", "join order",
        ]
        out = phrase_match(_docs(sf_dir, ["doc_id", "text"]), phrases)
        return (
            out.to_pandas().sort_values(["doc_id", "phrase"]).reset_index(drop=True)
        )

    def jsonl_ingest(sf_dir):
        # fault-tolerant JSONL round trip: documents re-encoded as
        # JSONL + 3 planted malformed lines, read under the skip
        # policy (bad lines counted, never dropped silently), then a
        # per-source exact aggregate. bad_lines rides as a constant
        # column so the oracle can assert it.
        import json
        import os
        import tempfile

        import numpy as np
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.sources.jsonl import read_jsonl

        docs = _docs(sf_dir, ["doc_id", "source", "n_chars"]).to_pandas()
        d = tempfile.mkdtemp(prefix="graft_jsonl_", dir="/tmp")
        p = os.path.join(d, "docs.jsonl")
        with open(p, "w") as f:
            for i, r in enumerate(docs.itertuples()):
                if i in (1, 7):  # two malformed lines mid-stream
                    f.write("{broken json\n")
                f.write(json.dumps({"doc_id": int(r.doc_id),
                                    "source": str(r.source),
                                    "n_chars": int(r.n_chars)}) + "\n")
            f.write("[not, an, object]\n")
        try:
            ds = read_jsonl(
                p, {"doc_id": "int", "source": "str", "n_chars": "int"}
            )
            rows = ds.materialize()
            bad = int(rows.sum("_bad") or 0)

            def data_only(t: pa.Table) -> pa.Table:
                keep = pa.compute.is_valid(t.column("doc_id"))
                return t.select(["source", "n_chars"]).filter(keep)

            agg = grouped_agg(
                rows.map_batches(
                    data_only, batch_format="pyarrow", zero_copy_batch=True
                ),
                "source",
                {"n_docs": ("count", None), "chars": ("sum", "n_chars")},
                num_partitions=4,
            ).to_pandas()
        finally:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        agg["chars"] = agg["chars"].astype(np.int64)
        agg["bad_lines"] = np.int64(bad)
        return agg.sort_values("source").reset_index(drop=True)[
            ["source", "n_docs", "chars", "bad_lines"]
        ]

    def events_window_edges(sf_dir):
        # first/last/nth window kinds over PARTITION BY user ORDER BY
        # ts, event_id (unique tiebreak pins frames exactly)
        import numpy as np
        import pandas as pd

        from bloomfilter_multithread_ray.pipelines.analytics import (
            partitioned_window,
        )

        ev = R.read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])
        out = partitioned_window(
            ev,
            "user_id",
            ["ts", "event_id"],
            {"first_v": ("first_value", "value"),
             "last_v": ("last_value", "value"),
             "third_v": ("nth_value", "value", 3)},
            num_partitions=16,
        ).to_pandas()
        out = out.drop(columns=["value"])
        for c in ("first_v", "last_v", "third_v"):
            out[c] = out[c].round(6)
        return out.sort_values(["user_id", "ts", "event_id"]).reset_index(
            drop=True
        )[["user_id", "ts", "event_id", "first_v", "last_v", "third_v"]]

    def store_zorder_scan(sf_dir):
        # Z-order (Morton) clustering of events by (ts, user_id) with
        # per-range per-column zone maps: a bounded scan on EITHER
        # column opens only overlapping rid= dirs (measured 9-19/64 at
        # ~5% selectivity on 2D-uniform data); exact predicate after.
        import shutil
        import tempfile

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines import table_store as TS
        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        ev = R.read(sf_dir, "events", ["ts", "user_id", "value"])
        d = tempfile.mkdtemp(prefix="graft_zorder_", dir="/tmp")
        try:
            TS.write_zordered(ev, d, ("ts", "user_id"), num_ranges=32)
            scan, _stats = TS.read_zordered_where(
                d, "user_id", 10, 50, columns=["user_id", "value"]
            )

            def derive(t: pa.Table) -> pa.Table:
                v = np.rint(
                    t.column("value").to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)
                return pa.table(
                    {"user_id": t.column("user_id"), "v_u6": pa.array(v)}
                )

            agg = grouped_agg(
                scan.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
                "user_id",
                {"n_events": ("count", None), "value_sum_micros": ("sum", "v_u6")},
                num_partitions=8,
            )
            df = pd.DataFrame(agg.take_all())
        finally:
            shutil.rmtree(d, ignore_errors=True)
        df["n_events"] = df["n_events"].astype(np.int64)
        df["value_sum_micros"] = df["value_sum_micros"].astype(np.int64)
        return df.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "n_events", "value_sum_micros"]
        ]

    def doc_graph_sssp(sf_dir):
        # bounded-hop weighted shortest paths (Bellman-Ford rounds)
        # over the 0.3-threshold 3-gram Jaccard graph, weight =
        # round((1 - jaccard) * 1e6) int micros (identical IEEE math
        # both sides), sources = 5 lowest participating doc ids,
        # max_hops=6. Edges materialize once and never re-shuffle.
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.graph import sssp_hops

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        ).map_batches(
            lambda t: pa.table(
                {"a": t.column("doc_a"), "b": t.column("doc_b"),
                 "w": pa.array(np.trunc(
                     (1.0 - t.column("jaccard").to_numpy(zero_copy_only=False))
                     * 1e6 + 0.5).astype(np.int64))}
            ),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        # source candidates = ALL endpoints (pairs are oriented
        # doc_a < doc_b, so a doc appearing only as the larger endpoint
        # would be invisible to a column-a-only scan — the oracle picks
        # its 5 lowest ids from the symmetrized edge list)
        lows = grouped_agg(
            pairs.map_batches(
                lambda t: pa.table({"n": pa.chunked_array(
                    t.column("a").chunks + t.column("b").chunks,
                    type=t.column("a").type,
                )}),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            "n", {"c": ("count", None)}, num_partitions=4,
        ).to_pandas()
        if lows.empty:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "dist": pd.Series(dtype=np.int64)})
        srcs = np.sort(lows.n.to_numpy())[:5]
        out = sssp_hops(pairs, srcs, max_hops=6).to_pandas()
        out["node"] = out["node"].astype(np.int64)
        out["dist"] = out["dist"].astype(np.int64)
        return out.sort_values("node").reset_index(drop=True)

    def events_peak_concurrency(sf_dir):
        # sweep-line max-overlap: deterministic durations derived from
        # event_id, half-open [start, end) semantics, peak per type
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.interval import (
            interval_concurrency,
        )

        ev = R.read(sf_dir, "events", ["event_id", "ts", "event_type"])

        def derive(t: pa.Table) -> pa.Table:
            import numpy as np

            ts = (
                t.column("ts").combine_chunks().cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                .view(np.int64)
            )
            eid = t.column("event_id").to_numpy(zero_copy_only=False)
            dur = (30 + eid % 90) * 1_000_000
            return pa.table(
                {"event_type": t.column("event_type"),
                 "s": pa.array(ts), "e": pa.array(ts + dur)}
            )

        iv = ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        out = interval_concurrency(
            iv, by="event_type", start_col="s", end_col="e", num_partitions=8
        )
        return out.to_pandas().sort_values("event_type").reset_index(drop=True)

    def events_window_funcs(sf_dir):
        # general window-function operator: PARTITION BY user_id
        # ORDER BY ts, event_id — row_number, micros-exact lag /
        # running sum / running max, one fixed-P shuffle + one C-speed
        # kernel per partition
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import (
            partitioned_window,
        )

        ev = R.read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            v = np.rint(
                t.column("value").to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)
            return pa.table(
                {"event_id": t.column("event_id"),
                 "user_id": t.column("user_id"),
                 "ts": t.column("ts"),
                 "v_u6": pa.array(v)}
            )

        out = partitioned_window(
            ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            ["ts", "event_id"],
            {"rn": ("row_number",),
             "prev_v_u6": ("lag", "v_u6", 1, -1),
             "run_sum_u6": ("cumsum", "v_u6"),
             "run_max_u6": ("cummax", "v_u6")},
            num_partitions=16,
        )
        df = out.to_pandas().sort_values("event_id").reset_index(drop=True)
        for c in ("rn", "prev_v_u6", "run_sum_u6", "run_max_u6", "v_u6"):
            df[c] = df[c].astype(np.int64)
        return df[["event_id", "user_id", "v_u6", "rn",
                   "prev_v_u6", "run_sum_u6", "run_max_u6"]]

    def composite_join_lines(sf_dir):
        # composite-key join (on=[orderkey, partkey]): decorate each
        # lineitem with its (order, part) pair quantity total via a
        # grouped_agg -> multi-key join-back, then count the lines
        # contributing strictly less than half their pair (integer-
        # exact 2*qty < total), per return flag
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.join import hash_join

        li = R.read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity", "l_returnflag"])

        def qint(t: pa.Table) -> pa.Table:
            q = np.rint(
                t.column("l_quantity").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            return pa.table(
                {"l_orderkey": t.column("l_orderkey"),
                 "l_partkey": t.column("l_partkey"),
                 "q": pa.array(q),
                 "l_returnflag": t.column("l_returnflag")}
            )

        li = li.map_batches(qint, batch_format="pyarrow", zero_copy_batch=True)
        pair = grouped_agg(
            li.select_columns(["l_orderkey", "l_partkey", "q"]),
            ["l_orderkey", "l_partkey"],
            {"pair_q": ("sum", "q")},
            num_partitions=16,
        )
        joined = hash_join(
            li, pair, on=["l_orderkey", "l_partkey"], how="inner",
            num_partitions=16,
        )

        def under_half(t: pa.Table) -> pa.Table:
            keep = pc.less(
                pc.multiply(t.column("q"), pa.scalar(2, pa.int64())),
                t.column("pair_q"),
            )
            return t.filter(keep).select(["l_returnflag"])

        out = grouped_agg(
            joined.map_batches(under_half, batch_format="pyarrow", zero_copy_batch=True),
            "l_returnflag",
            {"n_under_half": ("count", None)},
            num_partitions=4,
        )
        df = out.to_pandas().sort_values("l_returnflag").reset_index(drop=True)
        df["n_under_half"] = df["n_under_half"].astype(np.int64)
        return df[["l_returnflag", "n_under_half"]]

    def orders_snapshot_diff(sf_dir):
        # CDC between two deterministic snapshots of orders: old drops
        # keys %3==0, new drops %5==0 and doubles price on %7==0 —
        # added/removed/modified classified from (key, fingerprint)
        # pairs, payloads never shuffle
        import pyarrow as pa
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines.table_store import snapshot_diff

        base = R.read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

        import numpy as np

        def old_side(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(k % 3 != 0))

        def new_side(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            t = t.filter(pa.array(k % 5 != 0))
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            bump = pc.if_else(
                pa.array(k % 7 == 0),
                pc.multiply(t.column("o_totalprice"), pa.scalar(2.0)),
                t.column("o_totalprice"),
            )
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_totalprice": bump})

        old = base.map_batches(old_side, batch_format="pyarrow", zero_copy_batch=True)
        new = base.map_batches(new_side, batch_format="pyarrow", zero_copy_batch=True)
        df = (
            snapshot_diff(old, new, "o_orderkey")
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        return df[["o_orderkey", "change"]]

    def validate_orders(sf_dir):
        # distributed data-quality gate: row-local rules fold in ONE
        # shared scan, uniqueness adds a key shuffle, FK integrity one
        # auto-planned anti join; oracle = the same counts in SQL
        from bloomfilter_multithread_ray.pipelines.validate import check

        orders = R.read(
            sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
        )
        cust = R.read(sf_dir, "customer", ["c_custkey"])
        return check(
            orders,
            [
                ("not_null", "o_custkey"),
                ("range", "o_totalprice", 0.0, None),
                ("unique", ["o_orderkey"]),
                ("foreign_key", "o_custkey", cust, "c_custkey"),
            ],
        )

    def events_value_stats_by_type(sf_dir):
        # grouped population moments from mergeable (Σx, Σx², n)
        # partials; var/std rounded to 2dp on BOTH sides (one-pass vs
        # DuckDB streaming variance agree to ~1e-8 abs — far inside the
        # rounding boundary)
        import numpy as np

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        ev = R.read(sf_dir, "events", ["event_type", "value"])
        out = grouped_agg(
            ev, "event_type",
            {"n_events": ("count", None), "value_var": ("var", "value"),
             "value_std": ("std", "value")},
            num_partitions=4,
        )
        df = out.to_pandas().sort_values("event_type").reset_index(drop=True)
        df["n_events"] = df["n_events"].astype(np.int64)
        df["value_var"] = df["value_var"].round(2)
        df["value_std"] = df["value_std"].round(2)
        return df[["event_type", "n_events", "value_var", "value_std"]]

    def events_value_hour_corr(sf_dir):
        # per-type Pearson corr + OLS of value on hour-of-day from ONE
        # grouped_agg pass of mergeable moments; 4dp-rounded on both
        # sides (small-magnitude x/y, one-pass vs DuckDB streaming
        # moments agree far inside the boundary)
        import pyarrow as pa
        import pyarrow.compute as pc

        ev = R.read(sf_dir, "events", ["event_type", "ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            return pa.table({
                "event_type": t.column("event_type"),
                "hour": pc.cast(pc.hour(t.column("ts")), pa.float64()),
                "value": t.column("value"),
            })

        return A.grouped_corr(
            ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
            "event_type", "hour", "value", num_partitions=4, round_dp=4,
        )

    def embedding_dim_stats(sf_dir):
        # unnest-with-ordinality (explode_list) -> per-dimension stats;
        # values quantized micros-exact so the grouped sums hash-match
        # SQL (float32 -> float64 casts are exact)
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.analytics import explode_list

        import ray.data

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        long = explode_list(emb, "embedding", keep=[], idx_name="dim",
                            value_name="x")

        def q(t: pa.Table) -> pa.Table:
            v = np.rint(
                t.column("x").to_numpy(zero_copy_only=False).astype(np.float64)
                * 1e6
            ).astype(np.int64)
            return pa.table({"dim": t.column("dim"), "x_u6": pa.array(v)})

        out = grouped_agg(
            long.map_batches(q, batch_format="pyarrow", zero_copy_batch=True),
            "dim",
            {"n": ("count", None), "sum_u6": ("sum", "x_u6"),
             "min_u6": ("min", "x_u6"), "max_u6": ("max", "x_u6")},
            num_partitions=8,
        )
        df = out.to_pandas().sort_values("dim").reset_index(drop=True)
        for c in ("n", "sum_u6", "min_u6", "max_u6"):
            df[c] = df[c].astype(np.int64)
        return df[["dim", "n", "sum_u6", "min_u6", "max_u6"]]

    def bucketed_join_orders(sf_dir):
        # co-partitioned bucket stores: orders and customer bucketed by
        # custkey once (/tmp scratch), then a ZERO-shuffle join — each
        # task reads one aligned bucket pair and joins map-only; per-
        # segment order counts + u4-exact totals are the oracle-checked
        # result
        import shutil
        import tempfile

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines import table_store as TS
        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        root = tempfile.mkdtemp(prefix="graft_bucket_", dir="/tmp")
        try:
            orders = R.read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

            def u4(t: pa.Table) -> pa.Table:
                v = np.rint(
                    t.column("o_totalprice").to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64)
                return pa.table(
                    {"o_custkey": t.column("o_custkey"), "price_c": pa.array(v)}
                )

            TS.write_bucketed(
                orders.map_batches(u4, batch_format="pyarrow", zero_copy_batch=True),
                f"{root}/orders", "o_custkey", num_buckets=16,
            )
            TS.write_bucketed(
                R.read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]),
                f"{root}/customer", "c_custkey", num_buckets=16,
            )
            joined = TS.bucketed_join(
                f"{root}/orders", f"{root}/customer", how="inner"
            )
            out = grouped_agg(
                joined.select_columns(["c_mktsegment", "price_c"]),
                "c_mktsegment",
                {"n_orders": ("count", None), "total_cents": ("sum", "price_c")},
                num_partitions=4,
            )
            df = out.to_pandas()
        finally:
            shutil.rmtree(root, ignore_errors=True)
        df["n_orders"] = df["n_orders"].astype(np.int64)
        df["total_cents"] = df["total_cents"].astype(np.int64)
        return df.sort_values("c_mktsegment").reset_index(drop=True)[
            ["c_mktsegment", "n_orders", "total_cents"]
        ]

    def incremental_user_stats(sf_dir):
        # materialized-view delta maintenance: events fold into a
        # persistent per-user aggregate store in TWO increments (split
        # on event_id parity — deterministic), each touching only the
        # partitions its keys hash to; the read-back state must equal
        # the one-shot SQL aggregate over the whole table. Idempotence
        # (delta_id replay) and crash repair are pytest-covered.
        import shutil
        import tempfile

        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines import delta_agg as DA

        def load(parity: int):
            ev = R.read(sf_dir, "events", ["event_id", "user_id", "value"])

            def derive(t: pa.Table) -> pa.Table:
                keep = pc.equal(
                    pc.bit_wise_and(t.column("event_id"), pa.scalar(1)),
                    pa.scalar(parity),
                )
                t = t.filter(keep)
                v = np.rint(
                    t.column("value").to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)
                return pa.table(
                    {"user_id": t.column("user_id"), "v_u6": pa.array(v)}
                )

            return ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)

        aggs = {
            "n_events": ("count", None),
            "value_sum_micros": ("sum", "v_u6"),
            "value_min_micros": ("min", "v_u6"),
            "value_max_micros": ("max", "v_u6"),
        }
        store = tempfile.mkdtemp(prefix="graft_deltaagg_", dir="/tmp")
        try:
            DA.merge_aggregate(store, load(0), "user_id", aggs,
                               num_partitions=16, delta_id="even")
            DA.merge_aggregate(store, load(1), "user_id", aggs,
                               num_partitions=16, delta_id="odd")
            df = DA.read_aggregate(store).to_pandas()
        finally:
            shutil.rmtree(store, ignore_errors=True)
        for c in ("n_events", "value_sum_micros", "value_min_micros", "value_max_micros"):
            df[c] = df[c].astype(np.int64)
        return df.sort_values("user_id").reset_index(drop=True)[
            ["user_id", "n_events", "value_sum_micros",
             "value_min_micros", "value_max_micros"]
        ]

    def events_clustered_append(sf_dir):
        # store lifecycle: write first-parity events clustered by ts,
        # append the second parity as a delta (frozen splits, touched
        # ranges merge-sort, exactly-once delta id), then a bounded
        # scan must equal the whole-table predicate
        import shutil
        import tempfile

        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines import table_store as TS
        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        def half(parity: int):
            ev = R.read(sf_dir, "events", ["event_id", "ts", "value"])

            def f(t: pa.Table) -> pa.Table:
                k = t.column("event_id").to_numpy(zero_copy_only=False)
                return t.filter(pa.array(k % 2 == parity))

            return ev.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)

        out_dir = tempfile.mkdtemp(prefix="graft_clap_", dir="/tmp")
        try:
            TS.write_clustered(half(0), out_dir, "ts", num_ranges=16)
            TS.append_clustered(half(1), out_dir, delta_id="odd")
            TS.append_clustered(half(1), out_dir, delta_id="odd")  # no-op replay
            lo, hi = "2024-01-10", "2024-01-20"
            scan = TS.read_clustered(out_dir, lo=lo, hi=hi)

            def derive(t: pa.Table) -> pa.Table:
                ts = (
                    t.column("ts").combine_chunks().cast(pa.timestamp("us"))
                    .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                    .view(np.int64)
                )
                day = (ts // 86_400_000_000) * 86_400_000_000
                v = np.rint(
                    t.column("value").to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)
                return pa.table({"day_us": pa.array(day), "v_u6": pa.array(v)})

            agg = grouped_agg(
                scan.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True),
                "day_us",
                {"n_events": ("count", None), "value_sum_micros": ("sum", "v_u6")},
                num_partitions=8,
            )
            df = pd.DataFrame(agg.take_all())
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        df["n_events"] = df["n_events"].astype(np.int64)
        df["value_sum_micros"] = df["value_sum_micros"].astype(np.int64)
        return df.sort_values("day_us").reset_index(drop=True)[
            ["day_us", "n_events", "value_sum_micros"]
        ]

    def skew_join_revenue(sf_dir):
        # skew-aware shuffle join: detect_hot_keys picks the heaviest
        # lineitem orderkeys in one partial-counts pass, hash_join then
        # salts those keys over hot_salt dedicated sub-partitions (left
        # hot rows round-robin, right hot rows replicated) — exact
        # results whatever the hot set, so the plan is SQL-oracle-checked
        # end-to-end. Revenue folded u4-exact (cents x discount points).
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.join import (
            detect_hot_keys,
            hash_join,
        )

        li = R.read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

        def rev(t: pa.Table) -> pa.Table:
            p = np.rint(
                t.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            d = np.rint(
                t.column("l_discount").to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            return pa.table(
                {"l_orderkey": t.column("l_orderkey"), "rev_u4": pa.array(p * (100 - d))}
            )

        li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
        # tiny threshold: at TPC-H's uniform ~4 rows/key every candidate
        # qualifies and the top-8 get salted — the point is driving the
        # hot path; results are plan-invariant either way
        hot = detect_hot_keys(li, "l_orderkey", threshold_frac=1e-6, max_hot=8)
        orders = R.read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        joined = hash_join(
            li, orders, on="l_orderkey", right_on="o_orderkey", how="inner",
            num_partitions=16, hot_keys=hot, hot_salt=4,
        )
        out = grouped_agg(
            joined.select_columns(["o_orderpriority", "rev_u4"]),
            "o_orderpriority",
            {"revenue_u4": ("sum", "rev_u4"), "n_items": ("count", None)},
            num_partitions=8,
        )
        df = out.to_pandas().sort_values("o_orderpriority").reset_index(drop=True)
        df["revenue_u4"] = df["revenue_u4"].astype(np.int64)
        df["n_items"] = df["n_items"].astype(np.int64)
        return df[["o_orderpriority", "revenue_u4", "n_items"]]

    def anti_join_customers_no_orders(sf_dir):
        # anti-join mode of the same operator: customers with no
        # high-value order (row filter pushed into the read)
        import pandas as pd
        import ray.data

        from bloomfilter_multithread_ray.pipelines.join import hash_join

        cust = R.read(sf_dir, "customer", ["c_custkey", "c_name"])
        import pyarrow.dataset as pads

        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey"],
            filter=pads.field("o_totalprice") > 300000.0,
            override_num_blocks=8,
        )
        out = hash_join(cust, orders, on="c_custkey", right_on="o_custkey", how="anti")
        df = out.to_pandas()
        if df.empty:
            df = pd.DataFrame({"c_custkey": pd.array([], dtype="int64"), "c_name": []})
        return df.sort_values("c_custkey").reset_index(drop=True)

    def events_asof(sf_dir):
        return R.events_asof(sf_dir)

    def events_sliding(sf_dir):
        return R.events_sliding(sf_dir)

    def events_sliding_distinct(sf_dir):
        # exact sliding COUNT(DISTINCT user): the distinct PAIR set
        # (never the raw events) replicates w-fold; SQL-oracled
        return A.sliding_distinct_exact(
            R.read(sf_dir, "events", ["ts", "user_id"]),
            bucket_s=3600, window_buckets=3, num_partitions=8,
        )

    def events_sliding_distinct_hll(sf_dir):
        # per-bucket mergeable HLLs + driver-side sliding merge: no
        # replication at all (rows-only; bound vs exact in pytest)
        return A.sliding_distinct_hll(
            R.read(sf_dir, "events", ["ts", "user_id"]),
            bucket_s=3600, window_buckets=3,
        )

    def events_sessions(sf_dir):
        return R.events_sessionize(sf_dir)

    def events_topk_per_user(sf_dir):
        return R.events_topk_per_user(sf_dir, topk=3)

    def events_rolling_mean(sf_dir):
        return R.events_rolling_mean(sf_dir, window=5)

    def token_count_regex(sf_dir):
        # "BPE-ish" regex lexer token counts (RE2 in Arrow and DuckDB)
        ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            T.make_regex_token_count_fn(), batch_format="pyarrow", zero_copy_batch=True
        )
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def ann_ivf(sf_dir):
        # centroids train on a DISTRIBUTED bottom-k-hash sample (driver
        # folds O(blocks x n) rows — never the matrix; round-3 verdict
        # fix for the load_embeddings full read); assignment + probe
        # stay map-only against the broadcast centroids
        import ray.data

        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        _sids, SV = S.sample_embedding_matrix(emb, n=256, seed=17)
        C = S.train_ivf_centroids(SV, n_clusters=16)
        qids, Q = S.load_query_matrix(sf_dir, 10)
        return S.ann_ivf(emb, qids, Q, C, k=5, nprobe=4)

    def dedup_embedding_lsh(sf_dir):
        import ray.data

        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        pairs = S.embedding_dup_pairs_lsh(emb, tau=0.4, nbits=6, n_tables=6)
        return (
            pairs.to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        )

    def bloom_fpr_check(sf_dir):
        # North-star criterion as a pipeline: build over the input_hint
        # corpus, probe (a) the corpus itself -> zero false negatives,
        # (b) disjoint-vocab negatives -> empirical FPR vs the
        # theoretical (1 - e^{-Kn/m})^K bound. 1-row DataFrame.
        import os

        import pandas as pd
        import pyarrow.parquet as pq
        import ray.data

        from bloomfilter_multithread_ray.pipelines.bloom import (
            build_and_store,
            load_sketch_store,
            probe_bloom,
        )
        from bloomfilter_multithread_ray.sources.sequences import (
            generate_query_table,
            generate_sequences_table,
        )

        base = "/tmp/graft_fpr"
        corpus_p, query_p = f"{base}/corpus.parquet", f"{base}/query.parquet"
        if not os.path.exists(query_p):
            os.makedirs(base, exist_ok=True)
            corpus = generate_sequences_table(500, seed=23)
            pq.write_table(corpus, corpus_p)
            pq.write_table(generate_query_table(corpus, 200, seed=24), query_p)
        store = f"{base}/store"
        k, P, bits, K = 4, 16, 1 << 20, 4
        if not os.path.exists(f"{store}/manifest.json"):
            build_and_store(
                ray.data.read_parquet(corpus_p, columns=["tokens"]), store,
                k=k, num_partitions=P, bits_per_partition=bits, num_hashes=K,
            )
        shards, _ = load_sketch_store(store)
        probe = probe_bloom(
            ray.data.read_parquet(query_p, columns=["doc_id", "tokens"]),
            shards, k=k, num_partitions=P, concurrency=2,
        ).to_pandas()
        pos = probe[probe.doc_id.str.startswith("doc-")]
        neg = probe[probe.doc_id.str.startswith("neg-")]
        n_distinct = max(s.estimate() for s in shards.values())
        import numpy as np

        bound = float((1.0 - np.exp(-K * n_distinct / bits)) ** K)
        return pd.DataFrame(
            {
                "zero_false_negatives": [bool(pos.member.all())],
                "n_probed_pos": [len(pos)],
                "empirical_fpr": [round(float(neg.member.mean()), 6)],
                "theoretical_bound": [round(bound, 6)],
                "fpr_within_bound": [bool(neg.member.mean() <= bound * 1.5 + 1e-4)],
            }
        )

    def multimodal_features(sf_dir):
        # Actor-pool decode plumbing over a deterministic synthetic
        # media table (no codecs in this env: marked fake decode).
        import os

        import pyarrow.parquet as pq
        import ray.data

        from bloomfilter_multithread_ray.stages.multimodal import (
            decode_images,
            synth_media_table,
        )

        path = "/tmp/graft_media/images.parquet"
        if not os.path.exists(path):
            os.makedirs("/tmp/graft_media", exist_ok=True)
            pq.write_table(synth_media_table(64, seed=5), path)
        out = decode_images(ray.data.read_parquet(path), concurrency=2, batch_size=16)
        df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
        # scalar feature columns (f00..f13): list columns are unsortable
        # in the driver's order-insensitive value compare
        import numpy as np

        F = np.array(
            [[round(float(x), 6) for x in f] for f in df.pop("features")]
        )
        for j in range(F.shape[1]):
            df[f"f{j:02d}"] = F[:, j]
        return df

    def media_headers(sf_dir):
        # REAL (codec-free) container-header parsing: deterministic
        # payloads with standards-valid png/gif/bmp/wav/jpeg headers
        import os

        import pyarrow.parquet as pq
        import ray.data

        from bloomfilter_multithread_ray.stages.multimodal import (
            sniff_media_headers,
            synth_real_headers_table,
        )

        path = "/tmp/graft_media/headers.parquet"
        if not os.path.exists(path):
            os.makedirs("/tmp/graft_media", exist_ok=True)
            pq.write_table(synth_real_headers_table(100, seed=3), path)
        out = sniff_media_headers(
            ray.data.read_parquet(path), keep_cols=("media_id", "true_format")
        )
        df = out.to_pandas().sort_values("media_id").reset_index(drop=True)
        assert (df["format"] == df["true_format"]).all()
        return df.drop(columns=["true_format"])

    # ---- text analysis ----
    from bloomfilter_multithread_ray.pipelines import text_stats as TS
    from bloomfilter_multithread_ray.stages import quality as Q

    def tfidf_top_terms(sf_dir):
        return TS.tfidf_top_terms(sf_dir, topk=3)

    def vocab_coverage(sf_dir):
        return TS.vocab_coverage(sf_dir, vocab_size=100)

    def length_filter_percentile(sf_dir):
        return TS.length_filter_percentile(sf_dir, q_lo=0.05, q_hi=0.95)

    def pack_sequences(sf_dir):
        return TS.pack_sequences(sf_dir, seq_len=64)

    def chunk_docs(sf_dir):
        # overlapping sliding-window chunking WITH the text payload
        # (40-token windows every 30 tokens, tails under 5 dropped);
        # map-only, deterministic — SQL-exact
        out = TS.chunk_documents(
            _docs(sf_dir, ["doc_id", "text"]),
            chunk_tokens=40,
            stride=30,
            min_tokens=5,
        )
        return (
            out.to_pandas()
            .sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True)
        )

    def doc_quality(sf_dir):
        ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            Q.make_quality_fn(), batch_format="pyarrow", zero_copy_batch=True
        )
        return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def lang_id(sf_dir):
        import pyarrow.parquet as pq

        sample = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["text", "lang"]
        ).slice(0, 200)
        ds = _docs(sf_dir, ["doc_id", "text"])
        out = Q.lang_id_pipeline(
            ds, sample.column("text").to_pylist(), sample.column("lang").to_pylist()
        )
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def doc_fingerprint(sf_dir):
        ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            Q.make_fingerprint_fn(), batch_format="pyarrow", zero_copy_batch=True
        )
        df = ds.select_columns(["doc_id", "fp_min"]).to_pandas()
        df["fp_min"] = df["fp_min"].astype("uint64")
        return df.sort_values("doc_id").reset_index(drop=True)

    # ---- sketch mode (rows-only for the driver; bounds in pytest) ----
    def distinct_tokens_hll(sf_dir):
        return A.distinct_count_hll(_docs(sf_dir, ["text"]), T.make_token_hash_fn())

    def heavy_hitters_cms(sf_dir):
        return A.heavy_hitters_cms(
            _docs(sf_dir, ["text"]),
            T.make_explode_token_counts_fn(),
            T.make_token_hash_fn(),
            topk=20,
        )

    def bloom_retract_reprobe(sf_dir):
        # counting-Bloom corpus membership with retraction: one
        # streaming build+retract pass (deletes commute under counter
        # merge), one broadcast probe pass. kept_contained ==
        # kept_total is the zero-FN invariant; retracted keys test
        # positive only at the live-population FPR (both asserted in
        # pytest) -> rows-only driver check
        return A.counting_bloom_retract(
            _docs(sf_dir, ["text", "source"]), retract_source="src7"
        )

    def events_welch_t(sf_dir):
        return A.grouped_welch_t(
            lambda: R.read(sf_dir, "events", ["ts", "event_type", "value"]),
        )

    def events_cusum_alerts(sf_dir):
        # per-user one-sided CUSUM drift alarm via the exact prefix
        # identity s_t = C_t - min(0, prefix-min C) with all terms
        # integer-scaled by N*1e3 (mu = exact global mean); one
        # group-keyed shuffle, pandas C-grouped cumsum/cummin kernel;
        # full SQL-window oracle
        return A.grouped_cusum_alerts(
            lambda: R.read(sf_dir, "events",
                           ["event_id", "ts", "user_id", "value"]),
        )

    def orders_benford(sf_dir):
        # Benford first-digit audit of order amounts (exact cents
        # integers; digit by integer power-of-ten magnitude); per-digit
        # chi-square deviations quantized 1e-6 from the mirrored float
        # expression
        return A.benford_digit_audit(
            lambda: R.read(sf_dir, "orders", ["o_totalprice"]),
        )

    def customer_rfm(sf_dir):
        # RFM quartile segmentation: one customer-keyed fold derives
        # (recency days, frequency, exact cents), range-bounded
        # histograms give the nine PERCENTILE_DISC boundaries, scoring
        # is map-only; segment = 100r + 10f + m
        return A.customer_rfm_segments(
            lambda: R.read(sf_dir, "orders",
                           ["o_custkey", "o_orderdate", "o_totalprice"]),
        )

    def events_decile_profile(sf_dir):
        # per-type counts against the GLOBAL exact decile boundaries
        # (PERCENTILE_DISC order statistics of 1e-3-quantized values;
        # integer comparisons so boundary ties are unambiguous); the
        # quantized-value histogram is range-bounded, so boundaries
        # come from ONE grouped count + driver cumsum
        return A.value_decile_profile(
            lambda: R.read(sf_dir, "events", ["event_type", "value"]),
        )

    def events_type_markov(sf_dir):
        # user-behavior Markov chain over event types: one user-keyed
        # shuffle counts LAG transitions (co-location makes LAG
        # partition-local-is-global), dangling types take the uniform
        # row, 12 power-iteration steps with per-term 1e-12 integer
        # quantization (order-free sums); T x T stays on the driver
        # because T is the fixed type cardinality
        return A.event_type_markov(
            lambda: R.read(sf_dir, "events",
                           ["event_id", "ts", "user_id", "event_type"]),
        )

    def events_user_trend(sf_dir):
        # per-user OLS slope of value vs whole-hour time offset: the
        # engagement-drift detector. All five moments are exact
        # integer grouped folds (1e-3-quantized values, integer hour
        # offsets); cross terms in python-int == DuckDB HUGEINT; only
        # the final ratio is float, quantized at 1e-6
        return A.grouped_ols_trend(
            lambda: R.read(sf_dir, "events", ["ts", "user_id", "value"]),
        )

    def events_debounce(sf_dir):
        # stream debounce: drop events within 60 s of the previous
        # same-(user, type) event — the at-most-once-per-window gate a
        # clickstream ingest needs. One fixed-P window shuffle (LAG),
        # map-only filter; gap_us = -1 marks each key's first event
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import (
            partitioned_window,
        )

        ev = R.read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

        def widen(t: pa.Table) -> pa.Table:
            tus = (
                t.column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
            return t.append_column("tus", pa.array(tus))

        out = partitioned_window(
            ev.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
            ["user_id", "event_type"],
            ["tus", "event_id"],
            {"prev_tus": ("lag", "tus", 1, None)},
            num_partitions=16,
        ).to_pandas()
        gap = out["tus"] - out["prev_tus"]
        keep = out["prev_tus"].isna() | (gap >= 60_000_000)
        res = pd.DataFrame(
            {"event_id": out.loc[keep, "event_id"].astype(np.int64),
             "gap_us": gap[keep].fillna(-1).astype(np.int64)}
        )
        return res.sort_values("event_id").reset_index(drop=True)

    def cuckoo_retract_reprobe(sf_dir):
        # cuckoo-filter corpus membership with retraction: 16-bit tags
        # at ~plain-Bloom bits/item where the counting Bloom pays K
        # int32 counters/item. Layout is insertion-order-dependent, so
        # the build is a PARTITIONED store (hash%P route, one filter
        # per partition from its sorted hashes) instead of an order-free
        # merge; kept_contained == kept_total is the zero-FN invariant
        return A.cuckoo_retract(
            _docs(sf_dir, ["text", "source"]), retract_source="src7"
        )

    def token_f2_countsketch(sf_dir):
        # AMS self-join-size estimate (rows-only; the bound vs the
        # exact F2 is asserted in pytest and token_f2_exact is the
        # SQL-oracled anchor on the same data)
        return A.token_f2_countsketch(_docs(sf_dir, ["text"]), T.make_token_hash_fn())

    def token_f2_exact(sf_dir):
        return A.token_f2_exact(
            _docs(sf_dir, ["text"]), T.make_explode_token_counts_fn()
        )

    def source_overlap(sf_dir):
        return A.source_overlap_exact(
            _docs(sf_dir, ["text", "source"]), T.make_unique_tokens_by_fn("source"),
            "src0", "src1",
        )

    def source_overlap_kmv(sf_dir):
        return A.source_overlap_kmv(
            _docs(sf_dir, ["text", "source"]), T.make_unique_tokens_by_fn("source"),
            "src0", "src1",
        )

    # ---- dedup family ----
    from bloomfilter_multithread_ray.pipelines import dedup as D
    from bloomfilter_multithread_ray.pipelines import similarity as S

    def dedup_minhash_lsh(sf_dir):
        pairs = D.minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5)
        return (
            pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )

    def dedup_minhash_keep(sf_dir):
        # fully distributed keep-set: connected components (pointer-
        # jumping label propagation) + hash-partitioned anti join —
        # no driver union-find (equality with it is pytest-asserted)
        from bloomfilter_multithread_ray.pipelines.graph import keep_set_distributed

        docs = _docs(sf_dir, ["doc_id", "text"])
        # dedupe=False: CC tolerates duplicate edges, skipping the
        # pair-dedup sort-shuffle (same keep-set, one less all-to-all)
        kept = keep_set_distributed(
            docs,
            D.minhash_lsh_pairs(docs, threshold=0.5, dedupe=False),
            num_partitions=16,
        )
        return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def dedup_incremental(sf_dir):
        # Persisted near-dup index + increment probe — the production
        # "dedup today's crawl against the 100-TB corpus" shape: base
        # corpus (doc_id < 400) builds a hash-partitioned banded-
        # MinHash store on disk; the increment (doc_id >= 400) computes
        # its own band rows, reads ONLY the store partitions its bucket
        # keys land in, verifies in-bucket signature agreement (base x
        # new and new x new pairs only — never base x base), and
        # resolves survivors by connected components with the corpus
        # pinned (any corpus doc in the component wins; else lowest
        # increment id). Oracle: exact-Jaccard recursive-CTE CC with
        # the same base-pinned encoding (MinHash-LSH reaches exact
        # parity on the fixture, as dedup_minhash_keep proves).
        import os

        base = _docs(sf_dir, ["doc_id", "text"]).filter(expr="doc_id < 400")
        inc = _docs(sf_dir, ["doc_id", "text"]).filter(expr="doc_id >= 400")
        store = f"/tmp/graft_lsh_store/{os.path.basename(os.path.normpath(sf_dir))}"
        D.build_minhash_store(base, store)
        return D.minhash_increment(inc, store)

    def dedup_ngram_components(sf_dir):
        # connected components over the EXACT (oracle-checkable) n-gram
        # Jaccard pairs -> {node, comp}; DuckDB oracle = recursive-CTE
        # transitive closure + min label
        from bloomfilter_multithread_ray.pipelines.graph import connected_components

        import pandas as pd

        pairs = D.ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.5)
        comp = connected_components(pairs, num_partitions=16)
        df = comp.to_pandas()
        if df.empty:  # stable schema when the corpus has no dup pairs
            df = pd.DataFrame({"node": pd.array([], dtype="int64"),
                               "comp": pd.array([], dtype="int64")})
        return df.sort_values("node").reset_index(drop=True)

    def dedup_keepset_exact(sf_dir):
        # the keep-set operator (connected components + hash-partitioned
        # anti-join, graph.keep_set_distributed) end-to-end over the
        # EXACT n-gram-Jaccard pair list, so the whole chain is
        # SQL-oracle-checkable (dedup_minhash_keep runs the identical
        # machinery over LSH pairs, whose pair source is sketch-derived
        # and therefore rows-only)
        from bloomfilter_multithread_ray.pipelines.graph import keep_set_distributed

        docs = _docs(sf_dir, ["doc_id", "text"])
        pairs = D.ngram_jaccard_pairs(docs, k=3, threshold=0.5)
        kept = keep_set_distributed(docs, pairs, num_partitions=16)
        return kept.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def dedup_simhash(sf_dir):
        pairs = D.simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)
        return (
            pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )

    def ngram_jaccard(sf_dir):
        pairs = D.ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.5)
        return (
            pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )

    def dedup_containment(sf_dir):
        # asymmetric near-superset detector: max containment
        # i/min(|A|,|B|) over exact 3-gram sets — a short doc quoted
        # inside a long one scores ~1.0 where Jaccard stays ~|A|/|B|
        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.8,
            measure="containment",
        )
        return (
            pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )

    def cdc_chunk_dedup(sf_dir):
        # content-defined-chunking dedup audit (Gear CDC, FastCDC's
        # base hash): per-source chunk counts + bytes a chunk store
        # would save. Map-only chunker (text never shuffles), one
        # fixed-P shuffle of ~40-byte chunk rows, per-partition owner
        # fold. Pinned-snapshot oracle from the from-spec sequential
        # reimplementation in tests/independent_pipelines.py
        return D.cdc_chunk_stats(
            lambda: _docs(sf_dir, ["doc_id", "text", "source"]),
        )

    def doc_graph_kcore(sf_dir):
        # k-core of the exact 3-gram Jaccard duplicate graph: dense
        # near-dup clusters survive the iterative distributed peel
        # (degree fold + anti-join rounds, edge set only contracts).
        # Deterministic but iterative -> rows-only driver check; exact
        # parity with a single-process peeler is pytest-asserted.
        import numpy as np
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import k_core

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        )

        def rename(t: pa.Table) -> pa.Table:
            return pa.table(
                {"s": t.column("doc_a"), "d": t.column("doc_b")}
            )

        core = k_core(
            pairs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True),
            2,
            num_partitions=16,
        )
        df = core.to_pandas()
        if df.empty:
            import pandas as pd

            return pd.DataFrame(
                {"node": pd.array([], dtype="int64"),
                 "deg": pd.array([], dtype="int64")}
            )
        df["node"] = df["node"].astype(np.int64)
        df["deg"] = df["deg"].astype(np.int64)
        return df.sort_values("node").reset_index(drop=True)

    def dedup_embedding(sf_dir):
        # exact pairs via the distributed block-pair matmul — no
        # driver-side matrix, no broadcast; bit-identical cosines to
        # the broadcast generator, so the oracle stays hash-green
        import ray.data

        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        pairs = S.embedding_dup_pairs_blocked(emb, tau=0.4)
        return (
            pairs.to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        )

    def dbscan_clusters(sf_dir):
        # Deterministic DBSCAN over the embedding eps-graph (cosine >=
        # 0.4 @6dp, min_pts=3 counting self): core = min-core-id CC
        # label, border = MIN core-neighbor cluster, noise = NULL.
        import ray.data

        from bloomfilter_multithread_ray.pipelines.clustering import (
            dbscan_embeddings,
        )

        # default pair generator = distributed block-pair EXACT matmul
        # (no driver matrix / no broadcast), so the recursive-CTE
        # oracle keeps hash-matching; the sub-quadratic approximate
        # path is pair_gen="lsh" (opt-in, partition-invariance-tested)
        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        out = dbscan_embeddings(emb, tau=0.4, min_pts=3)
        df = out.to_pandas()
        df["cluster"] = df["cluster"].astype("float64")
        return df.sort_values("vec_id").reset_index(drop=True)

    # ---- similarity search ----
    def ann_topk(sf_dir):
        import ray.data

        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        qids, Q = S.load_query_matrix(sf_dir, 10)
        return S.ann_topk_exact(emb, qids, Q, k=5)

    def ann_lsh(sf_dir):
        import ray.data

        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        qids, Q = S.load_query_matrix(sf_dir, 10)
        return S.ann_lsh(emb, qids, Q, k=5)

    def ntok_quantiles_tdigest(sf_dir):
        import pyarrow as pa

        stats_fn = T.make_doc_token_stats_fn()

        def with_source(t: pa.Table) -> pa.Table:
            s = stats_fn(t)
            return s.append_column("source", t.column("source"))

        ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            with_source, batch_format="pyarrow", zero_copy_batch=True
        )
        return A.grouped_quantiles_sketch(ds, "n_tok", "source", algo="tdigest")

    def ntok_quantiles_kll(sf_dir):
        import pyarrow as pa

        stats_fn = T.make_doc_token_stats_fn()

        def with_source(t: pa.Table) -> pa.Table:
            s = stats_fn(t)
            return s.append_column("source", t.column("source"))

        ds = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
            with_source, batch_format="pyarrow", zero_copy_batch=True
        )
        return A.grouped_quantiles_sketch(ds, "n_tok", "source", algo="kll")

    def corpus_sample(sf_dir):
        # Bottom-k (KMV) uniform distinct sample of doc ids + distinct
        # estimate — deterministic (content-hash order), so the DuckDB
        # oracle reproduces it bit-for-bit by implementing splitmix64
        # in SQL and taking the k smallest.
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.functions.hashing import splitmix64
        from bloomfilter_multithread_ray.stages.sketch_agg import SketchAgg
        from bloomfilter_multithread_ray.state import BottomKSample
        from bloomfilter_multithread_ray.state.base import deserialize_sketch

        def mix(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table({"gh": pa.array(splitmix64(ids))})

        ds = _docs(sf_dir, ["doc_id"]).map_batches(
            mix, batch_format="pyarrow", zero_copy_batch=True
        )
        res = ds.aggregate(SketchAgg(lambda: BottomKSample(100), on="gh"))
        sk = deserialize_sketch(res["sketch"])
        df = pd.DataFrame({"doc_id": sk.sample_ids(), "h": sk.sample_hashes()})
        return df.sort_values("h").reset_index(drop=True)

    def corpus_sample_weighted(sf_dir):
        # length-weighted doc sample (A-ES keys from derived randomness
        # — deterministic, partitioning-independent; distribution
        # asserted in pytest)
        stats_fn = T.make_doc_token_stats_fn()
        ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            stats_fn, batch_format="pyarrow", zero_copy_batch=True
        )
        df = A.weighted_sample(ds, "n_tok", id_col="doc_id", k=50, seed=7)
        return df.sort_values("doc_id").reset_index(drop=True)

    def stratified_sample_weighted(sf_dir):
        # per-source length-weighted sample: the A-ES keys of
        # corpus_sample_weighted kept top-5 PER SOURCE (same derived
        # randomness, same seed, so the oracle reuses the identical
        # splitmix64 SQL chain with a PARTITION BY window)
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import (
            weighted_sample_by_group,
        )

        stats_fn = T.make_doc_token_stats_fn()
        docs = _docs(sf_dir, ["doc_id", "source", "text"])

        def with_source(t: pa.Table) -> pa.Table:
            st = stats_fn(t.select(["doc_id", "text"]))
            return st.append_column("source", t.column("source"))

        ds = docs.map_batches(
            with_source, batch_format="pyarrow", zero_copy_batch=True
        )
        return weighted_sample_by_group(
            ds, "source", "n_tok", id_col="doc_id", k=5, seed=7
        )[["source", "doc_id", "n_tok"]]

    def sketch_lineage(sf_dir):
        # Checkpoint-resumable epoch build + per-partition lineage table.
        # Deterministic: seed-fixed corpus; a completed store is a no-op
        # on re-run (idempotent across driver invocations).
        from bloomfilter_multithread_ray.pipelines.checkpoint import (
            build_to_completion,
            incremental_build,
            lineage_table,
        )
        from bloomfilter_multithread_ray.sources.sequences import (
            write_sequences_parquet,
        )
        from bloomfilter_multithread_ray.state import BloomFilter

        import os

        corpus = "/tmp/graft_lineage_corpus"
        if not os.path.exists(os.path.join(corpus, "part-00003.parquet")):
            write_sequences_parquet(corpus, 400, seed=17, rows_per_file=100)
        store = "/tmp/graft_lineage_store"
        cfg = dict(
            factory=lambda: BloomFilter(1 << 16, 4),
            factory_desc={"algo": "bloom", "bits": 1 << 16, "hashes": 4},
            k=4,
            num_partitions=8,
        )
        incremental_build(corpus, store, max_fragments=2, **cfg)  # epoch 0
        build_to_completion(corpus, store, **cfg)  # resume the rest
        return lineage_table(store).to_pandas()

    # ---- corpus curation (decontamination / sampling / mixing) ----
    def decontaminate(sf_dir):
        from bloomfilter_multithread_ray.pipelines import curation as C

        pairs = C.decontaminate_pairs(
            _docs(sf_dir, ["doc_id", "text", "source"]),
            bench_source="src0", k=3, threshold=0.5,
        )
        return (
            pairs.to_pandas().sort_values(["doc_id", "bench_id"]).reset_index(drop=True)
        )

    def stratified_sample(sf_dir):
        from bloomfilter_multithread_ray.pipelines import curation as C

        return C.stratified_sample(
            _docs(sf_dir, ["doc_id", "source"]), per_source=5
        )

    def mix_to_budget(sf_dir):
        from bloomfilter_multithread_ray.pipelines import curation as C

        return C.mix_to_budget(
            _docs(sf_dir, ["doc_id", "text", "source"]), budget_tokens=500
        )

    def normalize_text(sf_dir):
        from bloomfilter_multithread_ray.pipelines import curation as C

        out = C.normalize_text(_docs(sf_dir, ["doc_id", "text"]))
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def line_dedup(sf_dir):
        # high-DF boilerplate removal form: the fixture corpus is
        # single-line, so the segment separator is the word gap and
        # the threshold is corpus-fractional (>= 4/5 of docs);
        # native '\n' line dedup is pytest-covered on planted corpora
        from bloomfilter_multithread_ray.pipelines.curation import line_dedup as ld

        out = ld(_docs(sf_dir, ["doc_id", "text"]), sep=" ", min_frac=(4, 5))
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def epoch_shuffle(sf_dir):
        from bloomfilter_multithread_ray.pipelines import curation as C

        plan = C.epoch_shuffle_plan(_docs(sf_dir, ["doc_id"]), epoch=1)
        return plan.to_pandas().sort_values("rank").reset_index(drop=True)

    def assign_splits(sf_dir):
        from bloomfilter_multithread_ray.pipelines import curation as C

        out = C.assign_splits(_docs(sf_dir, ["doc_id"]))
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    def corpus_shards(sf_dir):
        # resumable shard sink: manifest of epoch-1 training shards
        # written under a fresh scratch dir (contents checked via the
        # SQL-derivable manifest; file side effects land in /tmp)
        import tempfile

        from bloomfilter_multithread_ray.pipelines import curation as C

        import shutil

        out_dir = tempfile.mkdtemp(prefix="graft_shards_", dir="/tmp")
        try:
            m = C.write_training_shards(
                _docs(sf_dir, ["doc_id", "text"]), out_dir, epoch=1, shard_size=100
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)  # manifest is the check
        return m

    def kmeans_embeddings(sf_dir):
        import ray.data

        from bloomfilter_multithread_ray.pipelines.similarity import kmeans_lloyd

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        res = kmeans_lloyd(emb, k=8, iters=5)
        import pandas as pd

        return pd.DataFrame(
            {"cluster_id": range(8), "size": res["sizes"],
             "inertia": [round(res["inertia"], 6)] * 8}
        )

    def events_anomalies(sf_dir):
        return R.events_anomalies(sf_dir, nsigma=3.0)

    def events_funnel(sf_dir):
        return R.events_funnel(sf_dir)

    def bloom_join_filtered_orders(sf_dir):
        # Bloom-join mode of the general operator: right side is a
        # selective dimension slice, so the Bloom prunes most of the
        # orders stream BEFORE the shuffle; result equals a plain join
        from bloomfilter_multithread_ray.pipelines.join import hash_join

        orders = R.read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        cust = R.read(sf_dir, "customer", ["c_custkey", "c_name"]).filter(
            expr="c_custkey <= 100"
        )
        out = hash_join(
            orders, cust, on="o_custkey", right_on="c_custkey", how="inner",
            num_partitions=16, bloom_prefilter=True,
        )
        df = out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
        return df[["o_orderkey", "o_custkey", "c_name", "o_totalprice"]]

    def textrank(sf_dir):
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            textrank_keywords,
        )

        return textrank_keywords(sf_dir, iters=10, topk=20)

    def textrank_distributed(sf_dir):
        # same keywords, but the rank iterations run through
        # graph.pagerank_distributed: rank rows co-partitioned with
        # edges, the vector never materializes on any single worker
        # (the web-graph scale path) — checked against the SAME
        # recursive-CTE PageRank oracle as the broadcast form
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            textrank_keywords,
        )

        return textrank_keywords(sf_dir, iters=10, topk=20, engine="distributed")

    def doc_novelty(sf_dir):
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            doc_novelty as DN,
        )

        return DN(sf_dir, k=3)

    def source_kl(sf_dir):
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            source_kl_divergence,
        )

        return source_kl_divergence(sf_dir)

    def bloom_new_docs(sf_dir):
        return R.dedup_new_against_corpus(sf_dir, new_source="src0")

    def split_leakage(sf_dir):
        from bloomfilter_multithread_ray.pipelines.curation import (
            split_leakage as SL,
        )

        import pandas as pd

        df = SL(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
        if df.empty:  # stable schema when no leakage exists (the healthy state)
            df = pd.DataFrame(
                {"group_min_id": pd.array([], dtype="int64"),
                 "n_train": pd.array([], dtype="int64"),
                 "n_heldout": pd.array([], dtype="int64")}
            )
        return df.sort_values("group_min_id").reset_index(drop=True)

    def full_curation(sf_dir):
        from bloomfilter_multithread_ray.pipelines.curation import (
            full_curation_report,
        )

        return full_curation_report(sf_dir)

    def pack_sequences_global(sf_dir):
        # GPT-style concat-and-chunk packing plan: docs laid on one
        # global token tape in splitmix64(doc_id) order, cut every 512
        # tokens. Distributed ordered prefix sum (range partition on
        # the hash's top bits -> per-range sums -> O(P) driver offsets
        # -> per-range local cumsum); text never shuffles. Distinct
        # from `pack_sequences` (the per-doc fixed-length chunk plan):
        # this one packs ACROSS documents on a single global tape.
        from bloomfilter_multithread_ray.pipelines.curation import (
            pack_sequences as _pack,
        )

        return _pack(_docs(sf_dir, ["doc_id", "text"]), seq_len=512, seed=0)

    def pack_sequences_text(sf_dir):
        # the MATERIALIZED packed sequences (trainer-ready {seq_id,
        # n_tok, text}), not just the plan: text shuffles ONCE via the
        # okey range partition — each range assembles its fully-owned
        # sequences locally and only the <=2 boundary partials per
        # range take a tiny fix-up pass
        from bloomfilter_multithread_ray.pipelines.curation import (
            materialize_packed_sequences,
        )

        out = materialize_packed_sequences(
            _docs(sf_dir, ["doc_id", "text"]), seq_len=64, seed=0
        ).to_pandas()
        return out.sort_values("seq_id").reset_index(drop=True)

    def embedding_jl_project(sf_dir):
        # JL ±1 sign projection in exact int64 (inputs quantized 1e-6,
        # signs derived from splitmix64 in actor __init__ — map-only,
        # nothing ships per batch); long format {vec_id, j, val}
        from bloomfilter_multithread_ray.pipelines.similarity import jl_project

        import ray.data

        out = jl_project(
            ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            )
        ).to_pandas()
        return out.sort_values(["vec_id", "j"]).reset_index(drop=True)

    def hard_negatives_q(sf_dir):
        # contrastive hard-negative mining: per vector the top-3 most
        # cosine-similar vectors of a DIFFERENT label (same blocked
        # partial-top-k plan, same-class candidates masked in-kernel)
        from bloomfilter_multithread_ray.pipelines.similarity import (
            hard_negatives,
        )

        import ray.data

        out = hard_negatives(
            ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding", "label"],
            ),
            k=3,
        ).to_pandas()
        return out.sort_values(["vec_id", "rank"]).reset_index(drop=True)

    def knn_graph_exact(sf_dir):
        # exact cosine kNN graph (top-5 per vector): block-nested self
        # join emitting per-vector PARTIAL top-k per block pair (<= k
        # rows/vec, never the n x n matrix), one vec-keyed fold
        from bloomfilter_multithread_ray.pipelines.similarity import knn_graph

        import ray.data

        out = knn_graph(
            ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            k=5,
        ).to_pandas()
        return out.sort_values(["vec_id", "rank"]).reset_index(drop=True)

    def dedup_weighted_tf(sf_dir):
        # EXACT tf-weighted (generalized) Jaccard pairs: join-free
        # packed-posting kernel with min(tf) contributions, pair-keyed
        # fold, skinny size joins — text never shuffles
        from bloomfilter_multithread_ray.pipelines.dedup import (
            weighted_jaccard_pairs,
        )

        out = weighted_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), tau=0.55
        ).to_pandas()
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def strip_boilerplate(sf_dir):
        # template-prefix removal demonstrated on a derived corpus:
        # docs with even doc_id carry a 3-token source header; the
        # operator must discover it (modal-prefix fold) and strip it
        import pyarrow as pa_

        from bloomfilter_multithread_ray.pipelines.curation import (
            strip_template_prefix,
        )

        def add_header(t: "pa.Table") -> "pa.Table":
            import pyarrow.compute as pc_

            even = pc_.equal(pc_.bit_wise_and(t.column("doc_id"), 1), 0)
            hdr = pc_.binary_join_element_wise(
                pa_.array(["hdr"] * t.num_rows),
                pc_.cast(t.column("source").combine_chunks(), pa_.string()),
                pa_.array(["sep"] * t.num_rows),
                pc_.cast(t.column("text").combine_chunks(), pa_.string()),
                " ",
            )
            return t.set_column(
                t.schema.get_field_index("text"), "text",
                pc_.if_else(even, hdr, t.column("text").combine_chunks()),
            )

        base = _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
            add_header, batch_format="pyarrow", zero_copy_batch=True
        )
        _tpl, rewritten = strip_template_prefix(base, min_frac=0.3)
        out = rewritten.to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def dedup_weighted_lsh(sf_dir):
        # sub-quadratic weighted near-dup: ICWS weighted-MinHash
        # banding (component collision prob == weighted Jaccard,
        # Ioffe 2010) -> candidate buckets -> EXACT tf-join verify;
        # aggressive fixture banding (64 bands x 2 rows, est margin
        # 0.25) reaches recall 1.0 here, so the oracle is the exact
        # weighted-Jaccard SQL — a genuine losslessness check
        from bloomfilter_multithread_ray.pipelines.dedup import (
            weighted_dup_pairs_lsh,
        )

        out = weighted_dup_pairs_lsh(
            _docs(sf_dir, ["doc_id", "text"]),
            tau=0.55, num_hashes=128, bands=64, est_margin=0.25,
        ).to_pandas()
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def dedup_provenance(sf_dir):
        # near-dup provenance matrix: which sources copy from which —
        # exact 3-gram Jaccard pairs + two skinny source joins + one
        # normalized source-pair fold (O(sources^2) output)
        from bloomfilter_multithread_ray.pipelines.dedup import (
            pair_provenance,
        )

        out = pair_provenance(
            _docs(sf_dir, ["doc_id", "source", "text"]),
            k=3, threshold=0.5,
        ).to_pandas()
        return out.sort_values(["source_a", "source_b"]).reset_index(drop=True)

    def snake_shard_plan(sf_dir):
        # token-balanced shard assignment: rank by (n_tok DESC,
        # doc_id) via the histogram-offset distributed rank, snake
        # fold rank -> shard (deterministic LPT alternative)
        from bloomfilter_multithread_ray.pipelines.curation import (
            snake_shards,
        )

        out = snake_shards(
            _docs(sf_dir, ["doc_id", "text"]), num_shards=8
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def ccnet_ppl_buckets(sf_dir):
        # CCNet-style head/middle/tail by per-language byte-bigram
        # perplexity terciles (exact radix-narrowed quantiles; the
        # threshold dict is O(languages) driver state)
        from bloomfilter_multithread_ray.pipelines.lm import ppl_buckets

        out = ppl_buckets(
            _docs(sf_dir, ["doc_id", "lang", "text"])
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def zipf_by_source(sf_dir):
        # per-source Zipf rank-frequency OLS fit (alpha, r2): exact
        # grouped token counts -> deterministic (freq DESC, token ASC)
        # ranking -> closed-form per-group regression
        from bloomfilter_multithread_ray.pipelines.text_stats import zipf_fit

        out = zipf_fit(
            _docs(sf_dir, ["doc_id", "source", "text"])
        ).to_pandas()
        return out.sort_values("group").reset_index(drop=True)

    def pii_redaction(sf_dir):
        # C4/FineWeb-style regex PII scrub demonstrated on a derived
        # corpus (emails/phones/IPv4 planted by doc_id residue); the
        # operator is map-only Arrow RE2 — counts reflect replacements
        # actually performed, patterns applied in declared order
        import pyarrow as pa_
        import pyarrow.compute as pc_

        from bloomfilter_multithread_ray.pipelines.curation import redact_pii

        def plant(t: "pa.Table") -> "pa.Table":
            did = t.column("doc_id")
            txt = pc_.cast(t.column("text").combine_chunks(), pa_.string())
            cs = pc_.cast

            def mod(x, k):  # pyarrow has no modulo kernel
                return pc_.subtract(x, pc_.multiply(pc_.divide(x, k), k))
            email = pc_.binary_join_element_wise(
                pa_.array([" contact user"] * t.num_rows),
                cs(did, pa_.string()),
                pa_.array(["@example.com"] * t.num_rows), "",
            )
            phone = pc_.binary_join_element_wise(
                pa_.array([" call 555-010-"] * t.num_rows),
                cs(pc_.add(mod(did, 9000), 1000), pa_.string()), "",
            )
            ip = pc_.binary_join_element_wise(
                pa_.array([" node 10."] * t.num_rows),
                cs(mod(did, 200), pa_.string()),
                pa_.array([".0."] * t.num_rows),
                cs(mod(did, 250), pa_.string()), "",
            )
            for cond, suf in (
                (pc_.equal(mod(did, 3), 0), email),
                (pc_.equal(mod(did, 5), 0), phone),
                (pc_.equal(mod(did, 7), 0), ip),
            ):
                txt = pc_.binary_join_element_wise(
                    txt, pc_.if_else(cond, suf, pa_.scalar("")), ""
                )
            return pa_.table({"doc_id": did, "text": txt})

        out = redact_pii(
            _docs(sf_dir, ["doc_id", "text"]).map_batches(
                plant, batch_format="pyarrow", zero_copy_batch=True
            )
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def dsir_scores_q(sf_dir):
        # DSIR importance weights (hashed word-bigram features, B=1024
        # md5 buckets, add-one smoothing): target = source 'src1',
        # raw = whole corpus; two streaming passes, O(B) driver state
        from bloomfilter_multithread_ray.pipelines.classifier import (
            dsir_scores,
        )

        out = dsir_scores(
            _docs(sf_dir, ["doc_id", "source", "text"]),
            target_source="src1", n_buckets=1024,
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def split_leakage_embedding(sf_dir):
        # SEMANTIC leakage: exact-cosine near-dup pairs that straddle
        # train/val/test (blocked pair join + pure per-batch split
        # tagging via the splitmix bucket rule — no join, no matrix)
        from bloomfilter_multithread_ray.pipelines.similarity import (
            embedding_split_leakage,
        )

        import ray.data

        out = embedding_split_leakage(
            ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            ),
            tau=0.4,
        ).to_pandas()
        return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)

    def mix_temperature_plan(sf_dir):
        # temperature mixing: t_s = round(budget * n_s^0.5 / sum n^0.5)
        # per source, integer epoch math (base = t_s // n_s; one extra
        # epoch for the greedy splitmix-ordered prefix under t_s % n_s)
        from bloomfilter_multithread_ray.pipelines.curation import (
            mix_temperature,
        )

        return mix_temperature(
            _docs(sf_dir, ["doc_id", "source", "text"]),
            alpha=0.5, budget_tokens=100_000, seed=0,
        )

    def full_pretrain_curation(sf_dir):
        # the repetition/boilerplate/NEAR-dup curation chain composed
        # end-to-end: Gopher gate -> corpus line dedup (95%-DF
        # boilerplate rewrite) -> MinHash-LSH keep-set -> split
        # assignment -> per-split report; the complement of
        # full_curation's quality/decontamination/EXACT-dedup chain
        from bloomfilter_multithread_ray.pipelines.curation import (
            pretrain_curation,
        )

        return pretrain_curation(_docs(sf_dir, ["doc_id", "text"]))

    def events_value_mad(sf_dir):
        return A.grouped_mad(
            lambda: R.read(sf_dir, "events", ["event_type", "value"]),
            "event_type", "value",
        )

    def events_value_cdf(sf_dir):
        # t-digest percentile transform: one mergeable global digest
        # (per-block partials, block-order fold — bit-pinned vs the
        # from-spec twin), per-row cdf quantized 1e-6 before the
        # order-free grouped sum, integer round-half-up means; the
        # sketch-mode counterpart of events_decile_profile for
        # unbounded-range columns
        return A.value_cdf_profile(
            R.read(sf_dir, "events", ["event_type", "value"]),
        )

    def events_value_p95_tdigest(sf_dir):
        return A.grouped_quantile_tdigest(
            R.read(sf_dir, "events", ["event_type", "value"]),
            "event_type", "value", qs=(0.5, 0.95), names=("p50", "p95"),
        )

    def top_pmi_bigrams(sf_dir):
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            top_pmi_bigrams as TP,
        )

        return TP(sf_dir, topk=20, min_count=5)

    def label_centroids(sf_dir):
        import ray.data

        from bloomfilter_multithread_ray.pipelines.similarity import (
            label_centroids as LC,
        )

        emb = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
        )
        return LC(emb)

    def lm_perplexity(sf_dir):
        from bloomfilter_multithread_ray.pipelines.lm import lm_perplexity as LM

        out = LM(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def lm_trigram_ppl(sf_dir):
        # word-trigram LM scored via the MODEL-AS-TABLE plan: occurrence
        # rows hash-JOIN the count tables co-partitioned on the trigram
        # key (the model never broadcasts — the 100-TB shape where the
        # trigram table exceeds any worker heap)
        from bloomfilter_multithread_ray.pipelines.lm import trigram_lm_scores

        out = trigram_lm_scores(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    def lm_kn_ppl(sf_dir):
        # interpolated Kneser-Ney trigram LM (d=0.75): five skinny
        # count tables from the distinct-trigram type table, scored by
        # a chain of co-partitioned hash joins (model never broadcasts)
        from bloomfilter_multithread_ray.pipelines.lm import (
            kn_trigram_lm_scores,
        )

        out = kn_trigram_lm_scores(_docs(sf_dir, ["doc_id", "text"])).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)

    # ---- semi-structured (JSON props / regex scrub) ----
    def json_field_stats(sf_dir):
        from bloomfilter_multithread_ray.pipelines import structured as S

        out = S.json_field_stats(
            R.read(sf_dir, "events", ["event_type", "props"]), field="k"
        )
        return out.to_pandas().sort_values("event_type").reset_index(drop=True)

    def redact_events(sf_dir):
        from bloomfilter_multithread_ray.pipelines import structured as S

        out = S.redact_patterns(
            R.read(sf_dir, "events", ["event_id", "props"]),
            col="props",
            rules=(("number", r"\d+", "<NUM>"),),
            keep_cols=("event_id",),
        )
        return out.to_pandas().sort_values("event_id").reset_index(drop=True)

    def gopher_repetition(sf_dir):
        from bloomfilter_multithread_ray.pipelines import repetition as REP

        return REP.gopher_repetition(_docs(sf_dir, ["doc_id", "text"]))

    def docs_sorted_neighbors(sf_dir):
        # sorted-neighborhood blocking (SIGMOD'95): candidate pairs
        # within 5 rows of the global (lowercased 16-char prefix,
        # doc_id) sort order; distributed total order via sampled
        # string ranges + dense-rank neighbor buckets
        import pyarrow as pa
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines.fuzzy import (
            sorted_neighborhood_pairs,
        )

        def key(t: pa.Table) -> pa.Table:
            k = pc.utf8_lower(pc.utf8_slice_codeunits(t.column("text"), 0, 16))
            return pa.table({"k": k, "doc_id": t.column("doc_id")})

        ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            key, batch_format="pyarrow", zero_copy_batch=True
        )
        return sorted_neighborhood_pairs(ds, "k", "doc_id", window=5)

    def doc_graph_bfs(sf_dir):
        # multi-source BFS layers over the exact 3-gram Jaccard dup
        # graph from the 5 lowest doc ids that appear in any pair: the
        # edge set materializes once and never shuffles; each round is
        # a map-only broadcast-semi-join + layer-sized exchanges.
        # Oracle: recursive-CTE shortest path (UNION walk + MIN(dist)).
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import bfs_distances

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        ).map_batches(
            lambda t: pa.table({"a": t.column("doc_a"), "b": t.column("doc_b")}),
            batch_format="pyarrow", zero_copy_batch=True,
        ).materialize()
        # 5 smallest participating nodes, computed distributed
        # (doc_a < doc_b always, so min nodes appear as doc_a too —
        # but take the union side anyway for robustness)
        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg

        def both(t: pa.Table) -> pa.Table:
            return pa.table({"node": pa.concat_arrays(
                [t.column("a").combine_chunks(), t.column("b").combine_chunks()])})

        nodes = grouped_agg(
            pairs.map_batches(both, batch_format="pyarrow", zero_copy_batch=True),
            "node", {"__c": ("count", None)}, num_partitions=8,
        ).select_columns(["node"])
        srcs = [r["node"] for r in nodes.sort("node").limit(5).take_all()]
        out = bfs_distances(pairs, srcs)
        return out.to_pandas().sort_values("node").reset_index(drop=True)

    def substring_dedup(sf_dir):
        from bloomfilter_multithread_ray.pipelines import repetition as REP

        return REP.substring_dedup(_docs(sf_dir, ["doc_id", "text"]), window=8)

    def bpe_top_pairs(sf_dir):
        from bloomfilter_multithread_ray.pipelines import bpe as BPE

        return BPE.bpe_top_pairs(_docs(sf_dir, ["text"]), topk=20)

    def embedding_covariance(sf_dir):
        from bloomfilter_multithread_ray.pipelines import similarity as SIM

        return SIM.embedding_covariance(
            R.read(sf_dir, "embeddings", ["embedding"])
        )

    def embedding_pca(sf_dir):
        # eigen-spectrum of the exact covariance: no closed-form SQL;
        # pinned against numpy eigvalsh on the oracle-checked covariance
        from bloomfilter_multithread_ray.pipelines import similarity as SIM

        return SIM.embedding_pca(R.read(sf_dir, "embeddings", ["embedding"]))

    def embedding_fd_pca(sf_dir):
        # Frequent-Directions sketch-mode PCA (rows-only; the spectral
        # certificate vs the exact pipeline is asserted in pytest)
        from bloomfilter_multithread_ray.pipelines import similarity as SIM

        return SIM.embedding_fd_pca(R.read(sf_dir, "embeddings", ["embedding"]))

    def events_rollup(sf_dir):
        return R.events_rollup(sf_dir)

    def events_hopping(sf_dir):
        # hopping window: 1 h windows starting every 15 min; each event
        # lands in exactly 4 windows; micros-exact value sums
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import hopping_window_agg

        def derive(t: pa.Table) -> pa.Table:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
            return pa.table({"ts": t["ts"], "v_u6": pa.array(v)})

        ev = R.read(sf_dir, "events", ["ts", "value"]).map_batches(
            derive, batch_format="pyarrow", zero_copy_batch=True
        )
        out = hopping_window_agg(
            ev,
            {"n_events": ("count", None), "value_sum_micros": ("sum", "v_u6")},
            ts_col="ts", window_us=3_600_000_000, hop_us=900_000_000,
        )
        df = pd.DataFrame(out.take_all())
        df["n_events"] = df["n_events"].astype(np.int64)
        df["value_sum_micros"] = df["value_sum_micros"].astype(np.int64)
        return df.sort_values("window_us").reset_index(drop=True)

    def events_pivot(sf_dir):
        # wide reshape: hour x event_type value sums, micros-exact
        # int64 cells converted to double once at the end
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        types = ["click", "error", "purchase", "signup", "view"]

        def derive(t: pa.Table) -> pa.Table:
            ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            hour = ((ts // 3_600_000_000) * 3_600_000_000).astype("datetime64[us]")
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
            return pa.table({"hour": pa.array(hour), "event_type": t["event_type"], "v_u6": v})

        ev = R.read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
            derive, batch_format="pyarrow", zero_copy_batch=True
        )
        wide = A.pivot(ev, "hour", "event_type", "v_u6",
                       agg="sum", pivot_values=types, fill=0)
        df = pd.DataFrame(wide.take_all())
        if df.empty:
            return pd.DataFrame({"hour": pd.Series(dtype="datetime64[us]"),
                                 **{c: pd.Series(dtype=np.float64) for c in types}})
        for c in types:
            df[c] = df[c].astype(np.int64) / 1e6
        return df.sort_values("hour").reset_index(drop=True)

    def events_latest_per_user(sf_dir):
        # last-write-wins compaction: each user's latest event (ts
        # desc, event_id desc tiebreak); per-batch combiner shrinks
        # every batch to one candidate row per user BEFORE the one
        # fixed-P exchange
        import numpy as np

        from bloomfilter_multithread_ray.pipelines.analytics import latest_by_key

        ev = R.read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        df = (
            latest_by_key(ev, "user_id", "ts", tiebreak="event_id",
                          num_partitions=16)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        df["event_id"] = df["event_id"].astype(np.int64)
        return df[["user_id", "event_id", "ts", "event_type"]]

    def user_event_paths(sf_dir):
        # ordered per-key sequence building (group_concat /
        # string_agg): each user's chronological event-type path; one
        # fixed-P shuffle, one vectorized binary_join per partition
        import numpy as np

        from bloomfilter_multithread_ray.pipelines.analytics import group_concat

        ev = R.read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
        df = (
            group_concat(
                ev, "user_id", "event_type", ["ts", "event_id"],
                sep="->", out_name="path", count_name="n_events",
                num_partitions=16,
            )
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        df["n_events"] = df["n_events"].astype(np.int64)
        return df[["user_id", "path", "n_events"]]

    def docs_capped_per_source(sf_dir):
        # per-key cap (topn_by_key): keep each source's 10 greatest
        # doc_ids — the per-source share bound of a curation mix; the
        # per-batch combiner bounds exchange volume to O(keys x n)
        from bloomfilter_multithread_ray.pipelines.analytics import topn_by_key

        docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])
        df = (
            topn_by_key(docs, "source", "doc_id", 10, num_partitions=16)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        return df[["doc_id", "source", "n_chars"]]

    def _event_strata(sf_dir):
        # (user, type, value-decile) coverage strata, split at mid-month
        import pyarrow as pa
        import pyarrow.compute as pc

        ev = R.read(sf_dir, "events", ["user_id", "event_type", "value", "ts"])

        def derive(t: pa.Table) -> pa.Table:
            vdec = pc.cast(
                pc.floor(pc.divide(t.column("value"), pa.scalar(10.0))), pa.int64()
            )
            h1 = pc.less_equal(pc.day(t.column("ts")), pa.scalar(15))
            return pa.table(
                {"user_id": t.column("user_id"),
                 "event_type": t.column("event_type"),
                 "vdec": vdec, "h1": h1}
            )

        def half(first):
            def f(t: pa.Table) -> pa.Table:
                m = t.column("h1") if first else pc.invert(t.column("h1"))
                return t.filter(m).drop_columns(["h1"])
            return f

        d = ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        return (
            d.map_batches(half(True), batch_format="pyarrow", zero_copy_batch=True),
            d.map_batches(half(False), batch_format="pyarrow", zero_copy_batch=True),
        )

    def strata_lost_h2(sf_dir):
        # SQL EXCEPT (setops.except_distinct): coverage strata present
        # in days 1-15 that VANISH in days 16-30 — the sampling-drift
        # audit; per-batch distinct before the one row-hash exchange
        from bloomfilter_multithread_ray.pipelines.setops import except_distinct

        a, b = _event_strata(sf_dir)
        return (
            except_distinct(a, b, num_partitions=16)
            .to_pandas()
            .sort_values(["user_id", "event_type", "vdec"])
            .reset_index(drop=True)
        )

    def strata_stable(sf_dir):
        # SQL INTERSECT twin of strata_lost_h2: strata covered in BOTH
        # window halves
        from bloomfilter_multithread_ray.pipelines.setops import intersect_distinct

        a, b = _event_strata(sf_dir)
        return (
            intersect_distinct(a, b, num_partitions=16)
            .to_pandas()
            .sort_values(["user_id", "event_type", "vdec"])
            .reset_index(drop=True)
        )

    def events_resampled(sf_dir):
        # time-series densify + gap fill (resample_fill): per-user
        # DAILY grid over each user's active span — count gaps become
        # explicit 0 rows, running exposure carries via ffill; one
        # fixed-P key shuffle after a (key, bucket) map-side combine
        import numpy as np
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import resample_fill

        ev = R.read(sf_dir, "events", ["user_id", "ts", "value"])

        def derive(t: pa.Table) -> pa.Table:
            v = np.rint(
                t.column("value").to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)
            return pa.table(
                {"user_id": t.column("user_id"), "ts": t.column("ts"),
                 "v_u6": pa.array(v)}
            )

        ds = ev.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        df = (
            resample_fill(
                ds, "user_id", "ts", 86_400_000_000,
                {"n_events": ("count", None),
                 "value_sum_micros": ("sum", "v_u6")},
                fill={"n_events": "zero", "value_sum_micros": "ffill"},
                num_partitions=16,
            )
            .to_pandas()
            .sort_values(["user_id", "bucket"])
            .reset_index(drop=True)
        )
        df["n_events"] = df["n_events"].astype(np.int64)
        return df[["user_id", "bucket", "n_events", "value_sum_micros"]]

    def events_unpivot(sf_dir):
        # pivot(fill=NULL) -> unpivot(drop_null) round trip: the wide
        # reshape and its inverse compose to the plain long aggregate,
        # which is the SQL oracle (hour x type micros-exact sums)
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import unpivot

        types = ["click", "error", "purchase", "signup", "view"]

        def derive(t: pa.Table) -> pa.Table:
            ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
            hour = ((ts // 3_600_000_000) * 3_600_000_000).astype("datetime64[us]")
            v = np.rint(t["value"].to_numpy(zero_copy_only=False) * 1e6).astype(np.int64)
            return pa.table({"hour": pa.array(hour), "event_type": t["event_type"], "v_u6": v})

        ev = R.read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
            derive, batch_format="pyarrow", zero_copy_batch=True
        )
        wide = A.pivot(ev, "hour", "event_type", "v_u6",
                       agg="sum", pivot_values=types, fill=None)
        long = unpivot(
            wide, ["hour"], types,
            var_name="event_type", value_name="value_sum_micros", drop_null=True,
        )
        df = long.to_pandas()
        df["value_sum_micros"] = df["value_sum_micros"].astype(np.int64)
        return df.sort_values(["hour", "event_type"]).reset_index(drop=True)

    def frequent_part_pairs(sf_dir):
        from bloomfilter_multithread_ray.pipelines.itemsets import (
            frequent_part_pairs as FPP,
        )

        return FPP(sf_dir, min_support=2, topk=20)

    def frequent_part_triples(sf_dir):
        # 3-itemset mining via the candidate-pruned two-phase plan
        # (default method="apriori"): exact item pass -> filtered pair
        # pass -> A-Priori C3 candidates -> one exact containment-count
        # pass. No stage enumerates C(width,3), so wide baskets
        # complete instead of refusing; the textbook SON variant
        # (local mining at floor(s*n_p/n), union, exact recount) is
        # method="son" with identical output
        from bloomfilter_multithread_ray.pipelines.itemsets import (
            frequent_triples as FT,
        )

        return FT(sf_dir, min_support=2, topk=20)

    def part_association_rules(sf_dir):
        # association rules (conf + lift, both directions) over the
        # frequent co-purchase pairs: one order-keyed shuffle emits
        # pair + singleton + basket-count partials in a single fold;
        # support filter applies before the driver sees rows; conf and
        # lift quantize 1e-6 from the single mirrored float division
        from bloomfilter_multithread_ray.pipelines.itemsets import (
            part_association_rules as PAR,
        )

        return PAR(sf_dir, min_support=2, min_conf=0.25)

    def fuzzy_token_pairs(sf_dir):
        from bloomfilter_multithread_ray.pipelines.fuzzy import (
            fuzzy_token_pairs as FTP,
        )

        return FTP(_docs(sf_dir, ["text"]), min_len=3)

    def quality_classifier(sf_dir):
        # distributed logistic-regression training (iterate-broadcast,
        # int64 fixed-point gradient sums -> partitioning-independent);
        # no closed-form SQL — pinned against a single-process numpy
        # reference in tests/test_classifier.py
        from bloomfilter_multithread_ray.pipelines import classifier as CL

        return CL.train_quality_classifier(
            _docs(sf_dir, ["doc_id", "text", "source"]), iters=20
        )

    def source_similarity(sf_dir):
        from bloomfilter_multithread_ray.pipelines import text_stats as TS

        return TS.source_similarity(_docs(sf_dir, ["text", "source"]))

    def triangle_count(sf_dir):
        # token co-occurrence graph: distinct adjacent-token pairs
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines.graph import triangle_count as TC
        from bloomfilter_multithread_ray.stages.text import flat_nonempty_with_offsets

        def edge_partials(batch: pa.Table) -> pa.Table:
            import pandas as pd

            flat, new_offs = flat_nonempty_with_offsets(batch)
            w = flat.to_numpy(zero_copy_only=False)
            n = len(w)
            if n < 2:
                return pa.table({"a": pa.array([], pa.string()), "b": pa.array([], pa.string())})
            valid = np.ones(n - 1, dtype=bool)
            ends = new_offs[1:-1] - 1
            valid[ends[(ends >= 0) & (ends < n - 1)]] = False
            a, b = w[:-1][valid], w[1:][valid]
            df = pd.DataFrame({"a": a, "b": b}).drop_duplicates()
            return pa.table(
                {"a": pa.array(df["a"], pa.string()), "b": pa.array(df["b"], pa.string())}
            )

        edges = _docs(sf_dir, ["text"]).map_batches(
            edge_partials, batch_format="pyarrow", zero_copy_batch=True
        )
        return TC(edges)

    def bpe_encode_stats(sf_dir):
        # learn + APPLY the merges; exact int64 symbol totals, one
        # division; checked in pytest against a pure-python encoder
        from bloomfilter_multithread_ray.pipelines import bpe as BPE

        return BPE.bpe_encode_stats(_docs(sf_dir, ["text"]), num_merges=8)

    def tpch_q6(sf_dir):
        return R.tpch_q6(sf_dir)

    def tpch_q3(sf_dir):
        return R.tpch_q3(sf_dir)

    def tpch_q5(sf_dir):
        return R.tpch_q5(sf_dir)

    def tpch_q10(sf_dir):
        return R.tpch_q10(sf_dir)

    def tpch_q14(sf_dir):
        return R.tpch_q14(sf_dir)

    def tpch_q18(sf_dir):
        return R.tpch_q18(sf_dir)

    def tpch_q4_late(sf_dir):
        return R.tpch_q4_late(sf_dir)

    def tpch_q7(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q7(sf_dir)

    def tpch_q13(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q13(sf_dir)

    def tpch_q15(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q15(sf_dir)

    def tpch_q17(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q17(sf_dir)

    def tpch_q19(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q19(sf_dir)

    def tpch_q22(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q22(sf_dir)

    def tpch_q2(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q2(sf_dir)

    def tpch_q8(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q8(sf_dir)

    def tpch_q9(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q9(sf_dir)

    def tpch_q16(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q16(sf_dir)

    def tpch_q21(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q21(sf_dir)

    def tpch_q11(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q11(sf_dir)

    def tpch_q12(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q12(sf_dir)

    def tpch_q20(sf_dir):
        from bloomfilter_multithread_ray.pipelines import tpch as T

        return T.tpch_q20(sf_dir)

    def bm25_search(sf_dir):
        from bloomfilter_multithread_ray.pipelines.retrieval import bm25_search as bm

        return bm(sf_dir)

    def hybrid_search_rrf(sf_dir):
        # reciprocal rank fusion (Cormack et al.) of the BM25 and
        # query-projected TF-IDF-cosine top-20 lists: rrf = sum of
        # 1/(60+rank) over systems, per-query top-10 on the quantized
        # fused score. Both rankers are two-streaming-pass map-only
        # scorers (corpus text never moves); fusion touches only the
        # O(queries x 20) candidate lists
        from bloomfilter_multithread_ray.pipelines.retrieval import (
            rrf_hybrid_search,
        )

        return rrf_hybrid_search(sf_dir)

    def doc_entropy(sf_dir):
        from bloomfilter_multithread_ray.pipelines.text_stats import doc_token_entropy

        return doc_token_entropy(sf_dir)

    def events_value_histogram(sf_dir):
        return A.grouped_histogram(
            R.read(sf_dir, "events", ["event_type", "value"]),
            "event_type", "value", bin_width=10.0,
        )

    def profile_events(sf_dir):
        return A.profile_table(
            R.read(sf_dir, "events"),
            ["event_id", "ts", "user_id", "event_type", "value", "props"],
        )

    def semantic_dedup(sf_dir):
        # SemDeDup composition (kmeans -> within-cluster near-dup
        # keep-set); deterministic (content-derived seeding, rounded
        # cosine, lowest-id-wins) but not SQL-expressible — pinned and
        # partition-invariance-checked in pytest instead
        emb = R.read(sf_dir, "embeddings", ["vec_id", "embedding"])
        return S.semantic_dedup(emb, k=8, iters=5, tau=0.4)

    def events_retention(sf_dir):
        return R.events_retention(sf_dir, max_offset=7)

    def bpe_merges(sf_dir):
        # iterative (8 broadcast rounds over the distinct-word table);
        # no closed-form SQL — checked in pytest against an independent
        # pure-python BPE on the same word counts
        from bloomfilter_multithread_ray.pipelines import bpe as BPE

        return BPE.bpe_merges(_docs(sf_dir, ["text"]), num_merges=8)

    def events_asof_click(sf_dir):
        # as-of join: each purchase matched to the user's most recent
        # prior-or-simultaneous click (DuckDB ASOF JOIN semantics); the
        # right side pre-aggregates to unique (user, ts) so the tie
        # winner is well-defined on both engines
        import pyarrow.compute as pc

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.asof import asof_join

        ev = R.read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

        def _of_type(kind, cols):
            def fn(t):
                return t.filter(pc.equal(t.column("event_type"), kind)).select(cols)

            return fn

        purchases = ev.map_batches(
            _of_type("purchase", ["event_id", "user_id", "ts", "value"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        clicks = grouped_agg(
            ev.map_batches(
                _of_type("click", ["user_id", "ts", "value"]),
                batch_format="pyarrow", zero_copy_batch=True,
            ),
            ["user_id", "ts"],
            {"click_value": ("max", "value")},
            num_partitions=16,
        )
        out = asof_join(
            purchases, clicks, "ts", by="user_id", how="inner", num_partitions=16
        )
        return out.to_pandas().sort_values("event_id").reset_index(drop=True)

    def lineitem_ship_windows(sf_dir):
        # general interval join, SHUFFLE plan: lineitems matched to
        # every overlapping 30-day window starting each 14 days from a
        # fixed 1992-01-01 anchor (~3 windows per row), then exact
        # cents-int aggregation per window
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import ray.data

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.interval import interval_join

        ANCHOR = 694224000000000  # epoch_us(1992-01-01)
        HOP = 14 * 86_400_000_000
        SPAN = 30 * 86_400_000_000
        k = np.arange(186, dtype=np.int64)
        iv = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "window_id": k,
                    "w0": pd.to_datetime(ANCHOR + k * HOP, unit="us").astype("datetime64[us]"),
                    "w1": pd.to_datetime(ANCHOR + k * HOP + SPAN, unit="us").astype("datetime64[us]"),
                }
            )
        )
        li = R.read(sf_dir, "lineitem", ["l_shipdate", "l_quantity"])
        joined = interval_join(
            li, iv, "l_shipdate", "w0", "w1",
            broadcast=False, bucket_width=HOP, num_partitions=16,
        )

        def widen(t: pa.Table) -> pa.Table:
            q = t.column("l_quantity").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "window_id": t.column("window_id"),
                    "qty_c": pa.array(np.round(q * 100).astype(np.int64)),
                }
            )

        agg = grouped_agg(
            joined.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
            "window_id",
            {"n_lines": ("count", None), "sum_qty_c": ("sum", "qty_c")},
            num_partitions=16,
        )
        return agg.to_pandas().sort_values("window_id").reset_index(drop=True)

    def events_rolling(sf_dir):
        # bounded ROWS-frame window: per-user rolling 5-row sum/max of
        # the value in exact micros-int units; (ts, event_id) order is
        # unique so the frame is deterministic on both engines
        import numpy as np
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.analytics import partitioned_window

        ev = R.read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def widen(t: pa.Table) -> pa.Table:
            v = t.column("value").to_numpy(zero_copy_only=False)
            return t.drop_columns(["value"]).append_column(
                "vm", pa.array(np.round(v * 1e6).astype(np.int64))
            )

        out = partitioned_window(
            ev.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
            "user_id",
            ["ts", "event_id"],
            {
                "roll_sum_micros": ("rolling_sum", "vm", 5),
                "roll_max_micros": ("rolling_max", "vm", 5),
            },
            num_partitions=16,
        )
        df = out.to_pandas().drop(columns=["vm"])
        # rolling emits float64 (pandas rolling); micros sums over a
        # 5-row frame stay far inside float64 exactness -> exact cast
        df["roll_sum_micros"] = df["roll_sum_micros"].astype("int64")
        df["roll_max_micros"] = df["roll_max_micros"].astype("int64")
        return df.sort_values("event_id").reset_index(drop=True)

    def media_phash_dups(sf_dir):
        # visual near-dup pairs via dHash of decoded pixels: 8 planted
        # "re-encoded" payloads (same first-8 content bytes -> same
        # fake-decode pixels, different container bytes) pair with
        # their originals at hamming 0 — the duplicates byte-level
        # dedup cannot see; pigeonhole-banded, payload bytes never
        # shuffle
        import numpy as np
        import pyarrow as pa
        import ray.data

        from bloomfilter_multithread_ray.stages.multimodal import (
            media_phash_dups as pipeline,
            synth_media_table,
        )

        base = synth_media_table(64, seed=5)
        ords = list(range(64))
        payloads = base.column("payload").to_pylist()
        hs = base.column("height").to_pylist()
        ws = base.column("width").to_pylist()
        for i in range(8):
            tail = np.random.default_rng([99, i]).integers(
                0, 256, len(payloads[i]) - 8, dtype=np.uint8
            ).tobytes()
            ords.append(1000 + i)
            payloads.append(payloads[i][:8] + tail)
            hs.append(hs[i])
            ws.append(ws[i])
        tbl = pa.table(
            {"media_ord": pa.array(ords, pa.int64()),
             "payload": pa.array(payloads, pa.binary()),
             "height": pa.array(hs, pa.int32()),
             "width": pa.array(ws, pa.int32())}
        )
        out = pipeline(
            ray.data.from_arrow(tbl), max_hamming=3
        ).to_pandas()
        out = out.astype(
            {"doc_a": np.int64, "doc_b": np.int64, "hamming": np.int64}
        )
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def readability_by_source(sf_dir):
        from bloomfilter_multithread_ray.pipelines.text_stats import (
            readability_by_source as rb,
        )

        return rb(_docs(sf_dir, ["source", "text"]))

    def ann_pq(sf_dir):
        # product-quantization ADC search: m=4 sub-codebooks of 16
        # codewords, exact-integer Lloyd folds (partition-invariant by
        # construction), codes are 4 bytes/vector — the memory-scale
        # path past IVF; pinned-snapshot oracle from a from-spec
        # single-process reimplementation
        from bloomfilter_multithread_ray.pipelines.similarity import pq_ann

        return pq_ann(
            R.read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            m=4, ks=16, iters=4, nq=3, topk=5,
        )

    def ann_recall_eval(sf_dir):
        # recall@5 of the three ANN paths against their exact anchors,
        # at the benched parameters: LSH (8-bit hyperplane, Hamming-1
        # multiprobe) and IVF (16 centroids, nprobe=4, distributed
        # bottom-k-hash sample) vs the distributed brute-force cosine
        # top-5 on the 10-query set; PQ (m=4, ks=16 ADC) vs exact
        # quantized-L2 top-5 on its 3-query set. The 100-TB user's
        # first ANN question (recall vs cost) answered as a first-class
        # driver query; pinned-snapshot oracle from the from-spec
        # reimplementation (tests/independent_pipelines.py)
        import pandas as pd

        from bloomfilter_multithread_ray.pipelines.similarity import (
            exact_l2_topk, pq_ann, recall_at_k,
        )

        # materialized once: six distributed ops consume the same rows
        emb = R.read(sf_dir, "embeddings",
                     ["vec_id", "embedding"]).materialize()
        qids, Q = S.load_query_matrix(sf_dir, 10)
        truth_cos = S.ann_topk_exact(emb, qids, Q, k=5)
        _sids, SV = S.sample_embedding_matrix(emb, n=256, seed=17)
        C = S.train_ivf_centroids(SV, n_clusters=16)
        ivf = S.ann_ivf(emb, qids, Q, C, k=5, nprobe=4)
        lsh = S.ann_lsh(emb, qids, Q, k=5)
        pq = pq_ann(emb, m=4, ks=16, iters=4, nq=3, topk=5)
        truth_l2 = exact_l2_topk(emb, nq=3, topk=5)
        out = pd.concat(
            [recall_at_k(ivf, truth_cos, method="ivf", k=5),
             recall_at_k(lsh, truth_cos, method="lsh", k=5),
             recall_at_k(pq, truth_l2, method="pq", k=5)],
            ignore_index=True,
        )
        return out.sort_values("method").reset_index(drop=True)

    def events_watermark_hopping(sf_dir):
        # bounded-lateness event-time watermark over a hopping window:
        # every event_id % 37 == 5 row is planted 3h stale (simulated
        # out-of-order delivery, SQL-replayable); the watermark gate
        # (arrival order = event_id, allowed lateness 2h, exact prefix
        # identity -> one bucket-keyed shuffle, no global sort) drops
        # late rows to a side channel that surfaces as window_us = -1
        # marker rows; survivors aggregate into 2h windows hopping 1h
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.agg import grouped_agg
        from bloomfilter_multithread_ray.pipelines.analytics import (
            hopping_window_agg_watermarked,
        )

        H = 3_600_000_000
        ev = R.read(sf_dir, "events",
                    ["event_id", "ts", "event_type", "value"])

        def plant(t: pa.Table) -> pa.Table:
            eid = t.column("event_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            ts = (
                t.column("ts").combine_chunks().cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False).astype("datetime64[us]")
                .view(np.int64)
            )
            stale = np.where(eid % 37 == 5, 3 * H, 0)
            v = np.rint(
                t.column("value").to_numpy(zero_copy_only=False) * 1e6
            ).astype(np.int64)
            return pa.table(
                {"event_id": pa.array(eid), "ts_us": pa.array(ts - stale),
                 "event_type": t.column("event_type"), "v_u6": pa.array(v)}
            )

        planted = ev.map_batches(plant, batch_format="pyarrow",
                                 zero_copy_batch=True)
        win, late = hopping_window_agg_watermarked(
            planted,
            {"n_events": ("count", None),
             "value_sum_micros": ("sum", "v_u6")},
            ts_col="ts_us", arrival_col="event_id", lateness_us=2 * H,
            window_us=2 * H, hop_us=H, by=["event_type"],
        )
        wdf = win.to_pandas()
        ldf = grouped_agg(
            late.select_columns(["event_type", "v_u6"]),
            "event_type",
            {"n_events": ("count", None),
             "value_sum_micros": ("sum", "v_u6")},
            num_partitions=4,
        ).to_pandas()
        ldf.insert(0, "window_us", np.int64(-1))
        out = pd.concat([wdf, ldf], ignore_index=True)
        for c in ("window_us", "n_events", "value_sum_micros"):
            out[c] = out[c].astype(np.int64)
        return out.sort_values(["window_us", "event_type"]).reset_index(
            drop=True)[["window_us", "event_type", "n_events",
                        "value_sum_micros"]]

    def doc_graph_hyperball(sf_dir):
        # HyperBall (Boldi-Rosa-Vigna) neighborhood function over the
        # exact 3-gram-Jaccard >= 0.3 dup graph: per-radius t the
        # summed per-node HLL ball-size estimates (128 B/node
        # counters, two fixed-P exchanges per BSP round, monotone
        # register-sum convergence) — the effective-diameter readout
        # exact NF cannot deliver at web-graph N. Pinned-snapshot
        # oracle from the from-spec sequential reimplementation in
        # tests/independent_pipelines.py
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import hyperball

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        )

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"s": t.column("doc_a"), "d": t.column("doc_b")})

        return hyperball(
            pairs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True),
            p=7,
        )

    def doc_graph_centrality(sf_dir):
        # HyperBall harmonic centrality: per-node sum of ball-growth
        # deltas over radius, integer micro-unit arithmetic riding the
        # same two-exchange BSP rounds as doc_graph_hyperball (state
        # carried only by the self-loop row). Pinned-snapshot oracle
        # from the from-spec sequential reimplementation
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import (
            hyperball_centrality,
        )

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        )

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"s": t.column("doc_a"), "d": t.column("doc_b")})

        return hyperball_centrality(
            pairs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True),
            p=7,
        )

    def doc_graph_ppr(sf_dir):
        # personalized PageRank from the 5 lowest-id dup-graph nodes
        # (seed-set relevance propagation — the curation seed-expansion
        # readout): teleport uniform over seeds replaces both restart
        # and start vector; edges never move, the rank vector
        # broadcasts per iteration (node catalog is dup-graph-bounded,
        # the vocabulary rule); recursive-CTE oracle at 6 dp. Seeds
        # come from BOTH endpoint columns (the SSSP symmetrization
        # lesson)
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import pagerank

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        )

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"s": t.column("doc_a"), "d": t.column("doc_b")})

        e = pairs.map_batches(
            rename, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        if e.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "rank": pd.Series(dtype=np.float64)})
        nodes = np.unique(np.concatenate([e["s"].to_numpy(np.int64),
                                          e["d"].to_numpy(np.int64)]))
        idx = {int(v): i for i, v in enumerate(nodes)}
        sym = pd.DataFrame({
            "s": [idx[int(x)] for x in pd.concat([e["s"], e["d"]])],
            "d": [idx[int(x)] for x in pd.concat([e["d"], e["s"]])],
        }).drop_duplicates()
        sym = sym[sym["s"] != sym["d"]]
        seeds = np.arange(min(5, len(nodes)))  # lowest ids sort first
        tele = np.zeros(len(nodes))
        tele[seeds] = 1.0 / len(seeds)
        import ray.data as _rd

        r = pagerank(_rd.from_pandas(sym), len(nodes), iters=10,
                     damping=0.85, teleport=tele)
        return pd.DataFrame(
            {"doc_id": nodes.astype(np.int64), "rank": np.round(r, 6)}
        ).sort_values("doc_id").reset_index(drop=True)

    def doc_walk_corpus(sf_dir):
        # deterministic DeepWalk corpus over the exact 3-gram-Jaccard
        # dup graph: 2 walks x 8 visits per node, next hop =
        # splitmix64(walker identity) % degree over ascending
        # neighbors. Adjacency materializes once co-partitioned;
        # each round is ONE fixed-P exchange of 4-int64 walker rows
        # (frontier discipline — edges never re-shuffle). Pinned-
        # snapshot oracle from the from-spec sequential
        # reimplementation in tests/independent_pipelines.py
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import random_walks

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        )

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"s": t.column("doc_a"), "d": t.column("doc_b")})

        return random_walks(
            pairs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True),
            walks_per_node=2, walk_len=8,
        )

    def kcenter_coreset(sf_dir):
        # greedy k-center (farthest-point) coreset selection: 16
        # maximally-spread exemplars; per-block int64 min-distance
        # state lives in the object store between rounds, each round
        # ships one O(dim) center; pinned-snapshot oracle from a
        # from-spec sequential reimplementation
        from bloomfilter_multithread_ray.pipelines.similarity import kcenter_select

        return kcenter_select(
            R.read(sf_dir, "embeddings", ["vec_id", "embedding"]), k=16,
        )

    def doc_graph_lpa(sf_dir):
        # deterministic synchronous label propagation (mode of neighbor
        # labels, ties to smallest, 4 fixed rounds) over the exact
        # 3-gram-Jaccard >= 0.3 duplicate graph — community granularity
        # vs CC's merge-every-bridge; replayed exactly by a chained-CTE
        # oracle
        import pyarrow as pa

        from bloomfilter_multithread_ray.pipelines.graph import label_propagation

        pairs = D.ngram_jaccard_pairs(
            _docs(sf_dir, ["doc_id", "text"]), k=3, threshold=0.3
        )

        def rename(t: pa.Table) -> pa.Table:
            return pa.table({"s": t.column("doc_a"), "d": t.column("doc_b")})

        out = label_propagation(
            pairs.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True),
            iters=4, num_partitions=16,
        ).to_pandas()
        return out.sort_values("node").reset_index(drop=True)

    def inverted_index_search(sf_dir):
        # persisted term-partitioned postings store; ad-hoc lookup reads
        # ONLY the partitions the 6 query terms hash to (partition-pruned
        # probe, reference src/main.cpp:120 applied to search)
        import shutil
        import tempfile

        from bloomfilter_multithread_ray.pipelines.inverted_index import (
            build_inverted_index,
            inverted_lookup,
        )

        d = tempfile.mkdtemp(prefix="graft_invidx_", dir="/tmp")
        try:
            build_inverted_index(_docs(sf_dir, ["doc_id", "text"]), d,
                                 num_partitions=32)
            return inverted_lookup(
                d, ["stream batch vector", "customer order line"], topk=10,
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def events_decayed_activity(sf_dir):
        return A.decayed_activity(
            lambda: R.read(sf_dir, "events", ["ts", "user_id", "value"]),
            half_life_days=1, topk=100,
        )

    def k_anonymity_audit(sf_dir):
        return A.k_anonymity_audit(
            R.read(sf_dir, "events", ["ts", "event_type", "value"]), k=5,
        )

    def events_value_psi(sf_dir):
        return A.value_psi(
            lambda: R.read(sf_dir, "events", ["ts", "value"]), bin_width=10.0,
        )

    def rendezvous_shards_q(sf_dir):
        from bloomfilter_multithread_ray.pipelines.curation import (
            rendezvous_shards,
        )

        return rendezvous_shards(
            _docs(sf_dir, ["doc_id"]), n_shards=8, n_shards_after=9,
        )

    return {
        "distinct_tokens": distinct_tokens,
        "heavy_hitters": heavy_hitters,
        "ntok_quantiles": ntok_quantiles,
        "token_count": token_count,
        "dedup_exact": dedup_exact,
        "curate_corpus": curate_corpus,
        "tpch_q1": tpch_q1,
        "bloom_semijoin": bloom_semijoin,
        "top_customers": top_customers,
        "parts_skyline": parts_skyline,
        "events_hourly": events_hourly,
        "events_hourly_distinct": events_hourly_distinct,
        "events_value_p95": events_value_p95,
        "distinct_tokens_hll": distinct_tokens_hll,
        "heavy_hitters_cms": heavy_hitters_cms,
        "token_f2_countsketch": token_f2_countsketch,
        "bloom_retract_reprobe": bloom_retract_reprobe,
        "cuckoo_retract_reprobe": cuckoo_retract_reprobe,
        "events_debounce": events_debounce,
        "events_welch_t": events_welch_t,
        "events_user_trend": events_user_trend,
        "events_cusum_alerts": events_cusum_alerts,
        "events_type_markov": events_type_markov,
        "events_decile_profile": events_decile_profile,
        "customer_rfm": customer_rfm,
        "orders_benford": orders_benford,
        "token_f2_exact": token_f2_exact,
        "ntok_quantiles_tdigest": ntok_quantiles_tdigest,
        "ntok_quantiles_kll": ntok_quantiles_kll,
        "sketch_lineage": sketch_lineage,
        "corpus_sample": corpus_sample,
        "corpus_sample_weighted": corpus_sample_weighted,
        "stratified_sample_weighted": stratified_sample_weighted,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_minhash_keep": dedup_minhash_keep,
        "dedup_incremental": dedup_incremental,
        "dedup_keepset_exact": dedup_keepset_exact,
        "dedup_ngram_components": dedup_ngram_components,
        "dedup_simhash": dedup_simhash,
        "ngram_jaccard": ngram_jaccard,
        "dedup_containment": dedup_containment,
        "cdc_chunk_dedup": cdc_chunk_dedup,
        "kcenter_coreset": kcenter_coreset,
        "doc_graph_hyperball": doc_graph_hyperball,
        "doc_walk_corpus": doc_walk_corpus,
        "doc_graph_ppr": doc_graph_ppr,
        "doc_graph_centrality": doc_graph_centrality,
        "doc_graph_kcore": doc_graph_kcore,
        "doc_graph_bfs": doc_graph_bfs,
        "docs_sorted_neighbors": docs_sorted_neighbors,
        "dedup_embedding": dedup_embedding,
        "dbscan_clusters": dbscan_clusters,
        "ann_topk": ann_topk,
        "ann_lsh": ann_lsh,
        "ann_ivf": ann_ivf,
        "dedup_embedding_lsh": dedup_embedding_lsh,
        "bloom_fpr_check": bloom_fpr_check,
        "multimodal_features": multimodal_features,
        "doc_quality": doc_quality,
        "tfidf_top_terms": tfidf_top_terms,
        "vocab_coverage": vocab_coverage,
        "length_filter_percentile": length_filter_percentile,
        "pack_sequences": pack_sequences,
        "chunk_docs": chunk_docs,
        "heavy_hitters_by_source": heavy_hitters_by_source,
        "distinct_by_source": distinct_by_source,
        "distinct_by_source_hll": distinct_by_source_hll,
        "source_overlap": source_overlap,
        "source_overlap_kmv": source_overlap_kmv,
        "events_sessions": events_sessions,
        "events_topk_per_user": events_topk_per_user,
        "events_rolling_mean": events_rolling_mean,
        "token_count_regex": token_count_regex,
        "events_sliding": events_sliding,
        "events_sliding_distinct": events_sliding_distinct,
        "events_sliding_distinct_hll": events_sliding_distinct_hll,
        "events_asof": events_asof,
        "range_join_bands": range_join_bands,
        "join_orders_customer": join_orders_customer,
        "join_size_events_orders": join_size_events_orders,
        "join_size_events_orders_cs": join_size_events_orders_cs,
        "skew_join_revenue": skew_join_revenue,
        "events_clustered_scan": events_clustered_scan,
        "store_bloom_lookup": store_bloom_lookup,
        "events_peak_concurrency": events_peak_concurrency,
        "parts_fuzzy_names": parts_fuzzy_names,
        "parts_fuzzy_name_stats": parts_fuzzy_name_stats,
        "parts_jw_names": parts_jw_names,
        "parts_entities": parts_entities,
        "doc_graph_sssp": doc_graph_sssp,
        "store_zorder_scan": store_zorder_scan,
        "docs_phrase_hits": docs_phrase_hits,
        "users_pattern_match": users_pattern_match,
        "events_type_hour_assoc": events_type_hour_assoc,
        "events_value_p90_cont": events_value_p90_cont,
        "users_top_event_type": users_top_event_type,
        "users_type_entropy": users_type_entropy,
        "jsonl_ingest": jsonl_ingest,
        "events_window_edges": events_window_edges,
        "events_cube": events_cube,
        "store_compact_scan": store_compact_scan,
        "events_clustered_append": events_clustered_append,
        "incremental_user_stats": incremental_user_stats,
        "composite_join_lines": composite_join_lines,
        "events_window_funcs": events_window_funcs,
        "bucketed_join_orders": bucketed_join_orders,
        "embedding_dim_stats": embedding_dim_stats,
        "events_value_stats_by_type": events_value_stats_by_type,
        "events_value_hour_corr": events_value_hour_corr,
        "validate_orders": validate_orders,
        "orders_snapshot_diff": orders_snapshot_diff,
        "full_join_customer_order_counts": full_join_customer_order_counts,
        "anti_join_customers_no_orders": anti_join_customers_no_orders,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "decontaminate": decontaminate,
        "stratified_sample": stratified_sample,
        "mix_to_budget": mix_to_budget,
        "normalize_text": normalize_text,
        "line_dedup": line_dedup,
        "events_hopping": events_hopping,
        "epoch_shuffle": epoch_shuffle,
        "lm_perplexity": lm_perplexity,
        "lm_trigram_ppl": lm_trigram_ppl,
        "lm_kn_ppl": lm_kn_ppl,
        "label_centroids": label_centroids,
        "top_pmi_bigrams": top_pmi_bigrams,
        "top_g2_bigrams": top_g2_bigrams,
        "bloom_new_docs": bloom_new_docs,
        "source_kl": source_kl,
        "textrank": textrank,
        "textrank_distributed": textrank_distributed,
        "events_anomalies": events_anomalies,
        "events_funnel": events_funnel,
        "kmeans_embeddings": kmeans_embeddings,
        "media_headers": media_headers,
        "bloom_join_filtered_orders": bloom_join_filtered_orders,
        "events_value_p95_tdigest": events_value_p95_tdigest,
        "events_value_cdf": events_value_cdf,
        "events_value_mad": events_value_mad,
        "ann_pq": ann_pq,
        "ann_recall_eval": ann_recall_eval,
        "events_watermark_hopping": events_watermark_hopping,
        "media_phash_dups": media_phash_dups,
        "readability_by_source": readability_by_source,
        "doc_graph_lpa": doc_graph_lpa,
        "inverted_index_search": inverted_index_search,
        "events_decayed_activity": events_decayed_activity,
        "k_anonymity_audit": k_anonymity_audit,
        "events_value_psi": events_value_psi,
        "rendezvous_shards": rendezvous_shards_q,
        "full_curation": full_curation,
        "full_pretrain_curation": full_pretrain_curation,
        "embedding_jl_project": embedding_jl_project,
        "knn_graph_exact": knn_graph_exact,
        "hard_negatives": hard_negatives_q,
        "dedup_weighted_tf": dedup_weighted_tf,
        "mix_temperature_plan": mix_temperature_plan,
        "split_leakage_embedding": split_leakage_embedding,
        "strip_boilerplate": strip_boilerplate,
        "pii_redaction": pii_redaction,
        "dsir_scores": dsir_scores_q,
        "zipf_by_source": zipf_by_source,
        "ccnet_ppl_buckets": ccnet_ppl_buckets,
        "snake_shard_plan": snake_shard_plan,
        "dedup_provenance": dedup_provenance,
        "dedup_weighted_lsh": dedup_weighted_lsh,
        "pack_sequences_global": pack_sequences_global,
        "pack_sequences_text": pack_sequences_text,
        "split_leakage": split_leakage,
        "doc_novelty": doc_novelty,
        "assign_splits": assign_splits,
        "corpus_shards": corpus_shards,
        "json_field_stats": json_field_stats,
        "redact_events": redact_events,
        "gopher_repetition": gopher_repetition,
        "substring_dedup": substring_dedup,
        "bpe_top_pairs": bpe_top_pairs,
        "bpe_merges": bpe_merges,
        "bpe_encode_stats": bpe_encode_stats,
        "tpch_q6": tpch_q6,
        "tpch_q3": tpch_q3,
        "tpch_q5": tpch_q5,
        "tpch_q10": tpch_q10,
        "tpch_q14": tpch_q14,
        "tpch_q18": tpch_q18,
        "tpch_q4_late": tpch_q4_late,
        "tpch_q7": tpch_q7,
        "tpch_q13": tpch_q13,
        "tpch_q15": tpch_q15,
        "tpch_q17": tpch_q17,
        "tpch_q19": tpch_q19,
        "tpch_q22": tpch_q22,
        "tpch_q2": tpch_q2,
        "tpch_q8": tpch_q8,
        "tpch_q9": tpch_q9,
        "tpch_q16": tpch_q16,
        "tpch_q21": tpch_q21,
        "tpch_q11": tpch_q11,
        "tpch_q12": tpch_q12,
        "tpch_q20": tpch_q20,
        "bm25_search": bm25_search,
        "hybrid_search_rrf": hybrid_search_rrf,
        "doc_entropy": doc_entropy,
        "events_value_histogram": events_value_histogram,
        "profile_events": profile_events,
        "semantic_dedup": semantic_dedup,
        "events_retention": events_retention,
        "source_similarity": source_similarity,
        "triangle_count": triangle_count,
        "quality_classifier": quality_classifier,
        "fuzzy_token_pairs": fuzzy_token_pairs,
        "embedding_covariance": embedding_covariance,
        "embedding_pca": embedding_pca,
        "embedding_fd_pca": embedding_fd_pca,
        "events_rollup": events_rollup,
        "events_pivot": events_pivot,
        "events_unpivot": events_unpivot,
        "events_latest_per_user": events_latest_per_user,
        "user_event_paths": user_event_paths,
        "docs_capped_per_source": docs_capped_per_source,
        "strata_lost_h2": strata_lost_h2,
        "strata_stable": strata_stable,
        "events_resampled": events_resampled,
        "frequent_part_pairs": frequent_part_pairs,
        "part_association_rules": part_association_rules,
        "frequent_part_triples": frequent_part_triples,
        "events_asof_click": events_asof_click,
        "lineitem_ship_windows": lineitem_ship_windows,
        "events_rolling": events_rolling,
    }


# --------------------------------------------------------------------------
def _lpa_oracle(iters: int = 4) -> str:
    """Synchronous LPA replayed as ``iters`` chained MATERIALIZED CTEs
    (the d0..dN chaining trick that oracled SSSP and k-core): each step
    is the exact per-node mode of neighbor labels with the (count DESC,
    label ASC) tie rule — a pure function of the previous labels, so a
    fixed iteration count replays the engine bit-for-bit (no
    convergence assumption needed; synchronous LPA may 2-cycle, both
    sides just run the same rounds)."""
    head = (
        "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS w FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id, "
        "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
        "AS gram FROM toks WHERE len(w) >= 3)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
        "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
        "e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM inter "
        "JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3), "
        "e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0), "
        "l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS lab FROM e), "
    )
    steps = "".join(
        f"m{i} AS MATERIALIZED (SELECT e.v AS node, l{i}.lab, count(*) AS c "
        f"FROM e JOIN l{i} ON l{i}.node = e.u GROUP BY 1, 2), "
        f"l{i + 1} AS MATERIALIZED (SELECT node, lab FROM (SELECT node, lab, "
        f"row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn "
        f"FROM m{i}) WHERE rn = 1), "
        for i in range(iters)
    )
    return (
        head + steps.rstrip(", ")
        + f" SELECT node, lab AS community FROM l{iters} ORDER BY node"
    )


def _bm25_oracle(queries: list[str], topk: int = 10) -> str:
    """BM25 oracle template (same scoring SQL the bm25_search oracle
    inlines), parameterized by the query list — checks any pipeline
    that scores with the repo's quantized Okapi expression, including
    the partition-pruned inverted-index lookup (which is pytest-pinned
    bit-identical to the full-scan scorer)."""
    vals = ", ".join(
        f"('{q}','{t}')" for q in queries for t in q.split()
    )
    return (
        f"WITH qt(query, term) AS (VALUES {vals}), "
        "nn AS (SELECT count(*) AS n FROM documents), "
        "toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents), "
        "tks AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM tks GROUP BY doc_id), "
        "st AS (SELECT CAST((SELECT SUM(dl) FROM dl) AS DOUBLE) / (SELECT n FROM nn) AS avgdl), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tks GROUP BY doc_id, tok), "
        "dfp AS (SELECT term, count(doc_id) AS df FROM (SELECT DISTINCT term FROM qt) q "
        "LEFT JOIN tf ON tok = term GROUP BY term), "
        "scored AS (SELECT qt.query, tf.doc_id, "
        "SUM(CAST(ROUND(1e9 * ln(1 + ((SELECT n FROM nn) - df + 0.5)/(df + 0.5)) "
        "* (tf * (1.2 + 1.0)) / (tf + 1.2 * (1 - 0.75 + (0.75 * dl) / avgdl))) AS BIGINT)) AS s_u9 "
        "FROM qt JOIN dfp USING(term) JOIN tf ON tf.tok = qt.term "
        "JOIN dl USING(doc_id), st GROUP BY qt.query, tf.doc_id "
        "HAVING SUM(CAST(ROUND(1e9 * ln(1 + ((SELECT n FROM nn) - df + 0.5)/(df + 0.5)) "
        "* (tf * (1.2 + 1.0)) / (tf + 1.2 * (1 - 0.75 + (0.75 * dl) / avgdl))) AS BIGINT)) > 0) "
        "SELECT query, doc_id, CAST(s_u9 AS DOUBLE)/1e9 AS score FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query ORDER BY s_u9 DESC, doc_id) AS rn "
        f"FROM scored) WHERE rn <= {int(topk)} ORDER BY query, s_u9 DESC, doc_id"
    )


def _ppr_oracle(iters: int = 10, n_seeds: int = 5) -> str:
    """Personalized PageRank over the 3-gram-Jaccard dup graph as a
    recursive-CTE power iteration (textrank's oracle pattern): r_0 =
    teleport = uniform over the ``n_seeds`` lowest node ids, step
    r' = 0.15·e + 0.85·Σ r/deg, ROUND 6 dp. Every non-isolated node
    re-emits each iteration (it has in-edges from iter-0 nodes), so
    zero-mass nodes never drop out of the recursion."""
    head = (
        "WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS w FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id, "
        "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
        "AS gram FROM toks WHERE len(w) >= 3)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS u, b.doc_id AS v, count(*) AS i "
        "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
        "e0 AS MATERIALIZED (SELECT u, v FROM inter "
        "JOIN sizes sa ON sa.doc_id = u JOIN sizes sb ON sb.doc_id = v "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3), "
        "e AS (SELECT DISTINCT a, b FROM (SELECT u AS a, v AS b FROM e0 "
        "UNION ALL SELECT v, u FROM e0)), "
        "nodes AS (SELECT DISTINCT a AS nd FROM e), "
        f"sd AS (SELECT nd FROM nodes ORDER BY nd LIMIT {int(n_seeds)}), "
        "ns AS (SELECT CAST(count(*) AS DOUBLE) AS s FROM sd), "
        "deg AS (SELECT a, count(*) AS d FROM e GROUP BY a), "
    )
    return (
        head
        + "pr(iter, node, r) AS ("
        "SELECT 0, nd, CASE WHEN nd IN (SELECT nd FROM sd) "
        "THEN 1.0/(SELECT s FROM ns) ELSE 0.0 END FROM nodes "
        "UNION ALL "
        "SELECT iter + 1, e.b, "
        "(CASE WHEN e.b IN (SELECT nd FROM sd) "
        "THEN 0.15/(SELECT s FROM ns) ELSE 0.0 END) "
        "+ 0.85 * SUM(pr.r / deg.d) "
        "FROM pr JOIN e ON e.a = pr.node JOIN deg ON deg.a = e.a "
        f"WHERE iter < {int(iters)} GROUP BY iter + 1, e.b) "
        f"SELECT node AS doc_id, ROUND(r, 6) AS rank FROM pr "
        f"WHERE iter = {int(iters)} ORDER BY doc_id"
    )


def _markov_oracle(iters: int = 12) -> str:
    """Event-type Markov stationary distribution as ``iters`` chained
    MATERIALIZED power-iteration CTEs: transitions from LAG within
    (user ORDER BY ts, event_id), dangling types get the uniform 1/T
    row, and each product term x_i*P[i,j] quantizes to int64 1e-12
    half-up BEFORE the (then order-free) SUM — mirroring
    analytics.event_type_markov expression-for-expression."""
    head = (
        "WITH tr AS (SELECT LAG(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS a, "
        "event_type AS b FROM events), "
        "c AS (SELECT a, b, count(*) AS c FROM tr WHERE a IS NOT NULL "
        "GROUP BY a, b), "
        "ty AS (SELECT DISTINCT event_type AS t FROM events), "
        "nt AS (SELECT count(*) AS n FROM ty), "
        "r AS (SELECT a, SUM(c) AS r FROM c GROUP BY a), "
        "p AS MATERIALIZED (SELECT ty1.t AS a, ty2.t AS b, "
        "CASE WHEN r.r IS NULL THEN 1.0/(SELECT n FROM nt) "
        "ELSE CAST(COALESCE(c.c, 0) AS DOUBLE)/r.r END AS p "
        "FROM ty ty1 CROSS JOIN ty ty2 "
        "LEFT JOIN c ON c.a = ty1.t AND c.b = ty2.t "
        "LEFT JOIN r ON r.a = ty1.t), "
        "x0 AS (SELECT t, 1.0/(SELECT n FROM nt) AS v FROM ty), "
    )
    steps = "".join(
        f"x{i + 1} AS MATERIALIZED (SELECT p.b AS t, "
        f"SUM(CAST(TRUNC((x{i}.v * p.p) * 1e12 + 0.5) AS BIGINT))/1e12 AS v "
        f"FROM x{i} JOIN p ON p.a = x{i}.t GROUP BY p.b), "
        for i in range(iters)
    )
    return (
        head + steps.rstrip(", ")
        + f" SELECT ty.t AS event_type, "
        "CAST(COALESCE(r.r, 0) AS BIGINT) AS out_transitions, "
        f"CAST(TRUNC(x{iters}.v * 1e9 + 0.5) AS BIGINT)/1e9 AS pi "
        f"FROM ty LEFT JOIN r ON r.a = ty.t JOIN x{iters} ON x{iters}.t = ty.t "
        "ORDER BY event_type"
    )


def _rrf_oracle(queries: list[str], k_sys: int = 20, rrf_k: int = 60,
                topk: int = 10) -> str:
    """Reciprocal-rank-fusion oracle: BM25 and query-projected
    TF-IDF-cosine rankings (both with the engine's per-term 1e-9
    integer quantization before the order-free sum), each cut to
    ``k_sys``, fused with 1/(rrf_k + rank) summed bm-then-tf (absent
    list -> exact 0.0), ordered/cut on the QUANTIZED fused score —
    every float expression mirrors the engine's evaluation order."""
    vals = ", ".join(f"('{q}','{t}')" for q in queries for t in q.split())
    n = "(SELECT n FROM nn)"
    bm_term = (
        "CAST(ROUND(1e9 * ln(1 + (" + n + " - df + 0.5)/(df + 0.5)) "
        "* (tf * (1.2 + 1.0)) / (tf + 1.2 * (1 - 0.75 + (0.75 * dl) / avgdl))) "
        "AS BIGINT)"
    )
    return (
        f"WITH qt(query, term) AS (VALUES {vals}), "
        "nn AS (SELECT count(*) AS n FROM documents), "
        "toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents), "
        "tks AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
        "dl AS (SELECT doc_id, count(*) AS dl FROM tks GROUP BY doc_id), "
        f"st AS (SELECT CAST((SELECT SUM(dl) FROM dl) AS DOUBLE) / {n} AS avgdl), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tks GROUP BY doc_id, tok), "
        "dfp AS (SELECT term, count(doc_id) AS df FROM (SELECT DISTINCT term FROM qt) q "
        "LEFT JOIN tf ON tok = term GROUP BY term), "
        f"scored_bm AS (SELECT qt.query, tf.doc_id, SUM({bm_term}) AS s_u9 "
        "FROM qt JOIN dfp USING(term) JOIN tf ON tf.tok = qt.term "
        "JOIN dl USING(doc_id), st GROUP BY qt.query, tf.doc_id "
        f"HAVING SUM({bm_term}) > 0), "
        "rb AS (SELECT query, doc_id, rn AS r FROM (SELECT query, doc_id, "
        "row_number() OVER (PARTITION BY query ORDER BY s_u9 DESC, doc_id) AS rn "
        f"FROM scored_bm) WHERE rn <= {int(k_sys)}), "
        "qterm AS (SELECT query, term, CAST(count(*) AS DOUBLE) AS qtf "
        "FROM qt GROUP BY 1, 2), "
        f"idfs AS (SELECT term, ln(CAST({n} AS DOUBLE) / df) AS idf "
        "FROM dfp WHERE df > 0), "
        "qq AS (SELECT query, SUM(CAST(ROUND(1e9 * (qtf * idf) * (qtf * idf)) "
        "AS BIGINT)) AS qq_u9 FROM qterm JOIN idfs USING (term) GROUP BY query), "
        "scored_tf AS (SELECT q.query, tf.doc_id, "
        "SUM(CAST(ROUND(1e9 * (tf.tf * i.idf) * (q.qtf * i.idf)) AS BIGINT)) AS num_u9, "
        "SUM(CAST(ROUND(1e9 * (tf.tf * i.idf) * (tf.tf * i.idf)) AS BIGINT)) AS dd_u9 "
        "FROM qterm q JOIN idfs i USING (term) JOIN tf ON tf.tok = q.term "
        "GROUP BY 1, 2 HAVING "
        "SUM(CAST(ROUND(1e9 * (tf.tf * i.idf) * (q.qtf * i.idf)) AS BIGINT)) > 0 "
        # dd > 0 mirrors the engine's guard: independently quantized
        # num/dd can give num>0 with dd=0 (inf cosine otherwise)
        "AND SUM(CAST(ROUND(1e9 * (tf.tf * i.idf) * (tf.tf * i.idf)) AS BIGINT)) > 0), "
        "st_tf AS (SELECT query, doc_id, CAST(ROUND(1e9 * (CAST(num_u9 AS DOUBLE) "
        "/ (sqrt(CAST(dd_u9 AS DOUBLE)) * sqrt(CAST(qq_u9 AS DOUBLE))))) AS BIGINT) "
        "AS s_u9 FROM scored_tf JOIN qq USING (query)), "
        "rt AS (SELECT query, doc_id, rn AS r FROM (SELECT query, doc_id, "
        "row_number() OVER (PARTITION BY query ORDER BY s_u9 DESC, doc_id) AS rn "
        f"FROM st_tf) WHERE rn <= {int(k_sys)}), "
        "fused AS (SELECT COALESCE(rb.query, rt.query) AS query, "
        "COALESCE(rb.doc_id, rt.doc_id) AS doc_id, "
        "COALESCE(rb.r, 0) AS rank_bm25, COALESCE(rt.r, 0) AS rank_tfidf, "
        f"CAST(ROUND((CASE WHEN rb.r IS NULL THEN 0.0 ELSE 1.0/({int(rrf_k)} + rb.r) END "
        f"+ CASE WHEN rt.r IS NULL THEN 0.0 ELSE 1.0/({int(rrf_k)} + rt.r) END) * 1e9) "
        "AS BIGINT) AS rrf_u9 "
        "FROM rb FULL OUTER JOIN rt ON rb.query = rt.query AND rb.doc_id = rt.doc_id) "
        "SELECT query, doc_id, rrf_u9 / 1e9 AS rrf, "
        "CAST(rank_bm25 AS BIGINT) AS rank_bm25, "
        "CAST(rank_tfidf AS BIGINT) AS rank_tfidf FROM ("
        "SELECT *, row_number() OVER (PARTITION BY query "
        "ORDER BY rrf_u9 DESC, doc_id) AS rn FROM fused) "
        f"WHERE rn <= {int(topk)} ORDER BY query, rrf_u9 DESC, doc_id"
    )


def _splitmix_chain(carry: str, z0: str, src: str) -> str:
    """WITH-body CTE chain computing h = splitmix64(``z0``) as UBIGINT.

    ``z0`` must be a non-negative HUGEINT expression over ``src``;
    ``carry`` columns are threaded through every step. The chain is
    the same mulmod decomposition (avoiding int128 overflow) used
    verbatim by the corpus_sample / assign_splits oracles — hoisted
    into a builder so new oracles stop hand-copying 14 lines of SQL.
    Caller appends further CTEs / the final SELECT reading ``s3``.
    """
    c = f"{carry}, " if carry else ""
    return (
        f"s0 AS (SELECT {c}({z0} + 11400714819323198485) "
        f"% 18446744073709551616 AS z FROM {src}), "
        f"x1 AS (SELECT {c}CAST(xor(CAST(z AS UBIGINT), "
        f"CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS a FROM s0), "
        f"s1 AS (SELECT {c}((a % 4294967296) * 13787848793156543929 "
        f"+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
        f"% 18446744073709551616 AS z FROM x1), "
        f"x2 AS (SELECT {c}CAST(xor(CAST(z AS UBIGINT), "
        f"CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS a FROM s1), "
        f"s2 AS (SELECT {c}((a % 4294967296) * 10723151780598845931 "
        f"+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
        f"% 18446744073709551616 AS z FROM x2), "
        f"s3 AS (SELECT {c}xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h FROM s2)"
    )


def _sssp_oracle() -> str:
    """Chained-CTE Bellman-Ford: one MIN-fold per hop — O(E) per step,
    no recursive path explosion (a UNION-ALL walk would enumerate
    every path of <= 6 edges)."""
    head = (
        "WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS w FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id, "
        "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
        "AS gram FROM toks WHERE len(w) >= 3)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
        "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
        "p AS (SELECT doc_a, doc_b, "
        "CAST(ROUND((1 - CAST(i AS DOUBLE) / (sa.n + sb.n - i)) * 1e6) AS BIGINT) AS w "
        "FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3), "
        "e AS (SELECT doc_a AS a, doc_b AS b, w FROM p UNION ALL SELECT doc_b, doc_a, w FROM p), "
        "srcs AS (SELECT DISTINCT a AS node FROM e ORDER BY a LIMIT 5), "
        "d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM srcs), "
    )
    steps = "".join(
        f"d{i + 1} AS (SELECT node, MIN(dist) AS dist FROM (SELECT * FROM d{i} "
        f"UNION ALL SELECT e.b, d{i}.dist + e.w FROM d{i} JOIN e ON e.a = d{i}.node) "
        "GROUP BY node), "
        for i in range(6)
    )
    return head + steps.rstrip(", ") + " SELECT node, dist FROM d6 ORDER BY node"


def _kcore_oracle(k: int = 2, steps: int = 16) -> str:
    """Iterative k-core peeling as ``steps`` chained MATERIALIZED CTEs
    (the d0..d6 chaining trick that oracled SSSP, applied to the peel):
    each step keeps only edges whose BOTH endpoints have degree >= k,
    which is exactly one engine peel round. Peeling is monotone — once
    the edge set stops changing every further step is a no-op — so a
    fixed ``steps`` overshoot equals the engine's fixpoint as long as
    the fixture converges within it (convergence at both driver sfs is
    pinned in tests/test_queries_oracle-adjacent pytest). MATERIALIZED
    keeps DuckDB from inlining the chain exponentially."""
    head = (
        "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
        "x -> x <> '') AS w FROM documents), "
        "grams AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id, "
        "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
        "AS gram FROM toks WHERE len(w) >= 3)), "
        "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
        "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
        "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
        "e0 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM inter "
        "JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
        "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3), "
    )
    step_sql = "".join(
        f"d{i} AS MATERIALIZED (SELECT n, count(*) AS c FROM "
        f"(SELECT u AS n FROM e{i} UNION ALL SELECT v FROM e{i}) GROUP BY n), "
        f"e{i + 1} AS MATERIALIZED (SELECT u, v FROM e{i} "
        f"WHERE u IN (SELECT n FROM d{i} WHERE c >= {k}) "
        f"AND v IN (SELECT n FROM d{i} WHERE c >= {k})), "
        for i in range(steps)
    )
    return (
        head + step_sql.rstrip(", ")
        + f" SELECT n AS node, CAST(count(*) AS BIGINT) AS deg FROM "
        f"(SELECT u AS n FROM e{steps} UNION ALL SELECT v FROM e{steps}) "
        "GROUP BY n ORDER BY node"
    )


def _bpe_oracle_ctes(num_merges: int = 8) -> str:
    """Shared CTE chain re-deriving byte-level BPE in SQL: distinct
    word counts → one symbol row per CHARACTER (the fixture corpus is
    pure ASCII, asserted in pytest, so characters == UTF-8 bytes and
    the char-level SQL equals the engine's byte-level symbols) → per
    merge step: overlapping adjacent-pair counts weighted by word
    count, argmax by (count DESC, l, r) with the engine's stop rule
    (count >= 2), greedy left-to-right application via the parity rule
    (within each run of consecutive candidate positions, every other
    one applies — runs only form when left == right)."""
    base = (
        "WITH w0 AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM ("
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
        "WHERE tok <> '' GROUP BY tok), "
        "s0 AS MATERIALIZED (SELECT tok, cnt, pos, tok[pos] AS sym FROM ("
        "SELECT tok, cnt, unnest(generate_series(1, length(tok))) AS pos FROM w0)), "
    )
    steps = []
    for i in range(num_merges):
        steps.append(
            # ordinal + next symbol inside each word
            f"x{i} AS MATERIALIZED (SELECT tok, cnt, pos, sym, "
            f"row_number() OVER (PARTITION BY tok ORDER BY pos) AS idx, "
            f"lead(sym) OVER (PARTITION BY tok ORDER BY pos) AS nxt FROM s{i}), "
            # argmax adjacent pair (overlap counting), engine stop rule
            f"t{i} AS MATERIALIZED (SELECT sym AS l, nxt AS r, CAST(SUM(cnt) AS BIGINT) AS c "
            f"FROM x{i} WHERE nxt IS NOT NULL GROUP BY sym, nxt "
            f"HAVING SUM(cnt) >= 2 ORDER BY c DESC, l, r LIMIT 1), "
            # candidate positions, then greedy parity within runs
            f"cand{i} AS (SELECT x.tok, x.idx FROM x{i} x, t{i} t "
            f"WHERE x.sym = t.l AND x.nxt = t.r), "
            f"sel{i} AS (SELECT tok, idx FROM ("
            f"SELECT tok, idx, idx - row_number() OVER (PARTITION BY tok ORDER BY idx) AS rk "
            f"FROM cand{i}) "
            f"QUALIFY (idx - MIN(idx) OVER (PARTITION BY tok, rk)) % 2 = 0), "
            # apply: merged symbol at selected idx, drop consumed idx+1
            f"s{i + 1} AS MATERIALIZED (SELECT x.tok, x.cnt, x.pos, "
            f"CASE WHEN s.idx IS NOT NULL THEN x.sym || x.nxt ELSE x.sym END AS sym "
            f"FROM x{i} x "
            f"LEFT JOIN sel{i} s ON s.tok = x.tok AND s.idx = x.idx "
            f"LEFT JOIN sel{i} p ON p.tok = x.tok AND p.idx = x.idx - 1 "
            f"WHERE p.idx IS NULL), "
        )
    return base + "".join(steps)


def _bpe_merges_oracle(num_merges: int = 8) -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS step, l AS \"left\", r AS \"right\", "
        f"c AS pair_count FROM t{i}"
        for i in range(num_merges)
    )
    return (
        _bpe_oracle_ctes(num_merges)
        + f"__dummy AS (SELECT 1) SELECT * FROM ({rows}) ORDER BY step"
    )


def _bpe_encode_stats_oracle(num_merges: int = 8) -> str:
    applied = " + ".join(f"(SELECT count(*) FROM t{i})" for i in range(num_merges))
    return (
        _bpe_oracle_ctes(num_merges)
        + "before AS (SELECT CAST(SUM(length(tok) * cnt) AS BIGINT) AS v FROM w0), "
        "words AS (SELECT CAST(SUM(cnt) AS BIGINT) AS v FROM w0), "
        f"after AS (SELECT CAST(SUM(cnt) AS BIGINT) AS v FROM s{num_merges}) "
        f"SELECT CAST({applied} AS BIGINT) AS num_merges, "
        "words.v AS words, before.v AS symbols_before, after.v AS symbols_after, "
        "ROUND(CAST(before.v AS DOUBLE) / GREATEST(after.v, 1), 6) AS compression "
        "FROM before, words, after"
    )


def oracle_sql() -> dict[str, str]:
    sqls = {
        "doc_graph_sssp": _sssp_oracle(),
        "doc_graph_kcore": _kcore_oracle(k=2, steps=16),
        "doc_graph_lpa": _lpa_oracle(iters=4),
        "bpe_merges": _bpe_merges_oracle(8),
        "bpe_encode_stats": _bpe_encode_stats_oracle(8),
        "distinct_tokens": (
            "SELECT count(DISTINCT tok) AS distinct_tokens FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
            "WHERE tok <> ''"
        ),
        "heavy_hitters": (
            "SELECT tok, count(*) AS cnt FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
            "WHERE tok <> '' GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20"
        ),
        "token_f2_exact": (
            "SELECT CAST(SUM(c * c) AS BIGINT) AS f2, "
            "CAST(COUNT(*) AS BIGINT) AS n_distinct FROM ("
            "SELECT tok, count(*) AS c FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t "
            "WHERE tok <> '' GROUP BY tok)"
        ),
        "ntok_quantiles": (
            "SELECT source, quantile_cont(n_tok, 0.5) AS p50, "
            "quantile_cont(n_tok, 0.95) AS p95, quantile_cont(n_tok, 0.99) AS p99 "
            "FROM (SELECT source, len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok "
            "FROM documents) GROUP BY source ORDER BY source"
        ),
        "token_count": (
            "SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) "
            "AS n_tok FROM documents ORDER BY doc_id"
        ),
        "dedup_exact": "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text ORDER BY doc_id",
        # money columns have exactly 2 decimals: sums are computed in
        # scaled BIGINT on both sides (exact, order-independent), with one
        # deterministic double conversion at the end — see R.tpch_q1.
        "tpch_q1": (
            "WITH c AS (SELECT l_returnflag, l_linestatus, "
            "CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c, "
            "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c, "
            "CAST(ROUND(l_discount*100) AS BIGINT) AS disc_c, "
            "CAST(ROUND(l_tax*100) AS BIGINT) AS tax_c "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00') "
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(qty_c) AS DOUBLE) / 100.0 AS sum_qty, "
            "CAST(SUM(price_c) AS DOUBLE) / 100.0 AS sum_base_price, "
            "CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price, "
            "CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0 AS sum_charge, "
            "CAST(SUM(qty_c) AS DOUBLE) / (100.0 * count(*)) AS avg_qty, "
            "CAST(SUM(price_c) AS DOUBLE) / (100.0 * count(*)) AS avg_price, "
            "CAST(SUM(disc_c) AS DOUBLE) / (100.0 * count(*)) AS avg_disc, "
            "count(*) AS count_order FROM c "
            "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"
        ),
        "bloom_semijoin": (
            "SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem "
            "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_retailprice >= 910.0) "
            "ORDER BY l_orderkey, l_linenumber"
        ),
        "top_customers": (
            "SELECT c_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS revenue "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_custkey, c_name ORDER BY SUM(o_totalprice) DESC, c_custkey LIMIT 10"
        ),
        # Pareto frontier: NOT EXISTS dominance (<= all dims oriented,
        # < in one); duplicates of an optimal point all survive
        "parts_skyline": (
            "SELECT p_partkey, p_size, p_retailprice FROM part r "
            "WHERE NOT EXISTS (SELECT 1 FROM part s "
            "WHERE s.p_retailprice <= r.p_retailprice AND s.p_size >= r.p_size "
            "AND (s.p_retailprice < r.p_retailprice OR s.p_size > r.p_size)) "
            "ORDER BY p_partkey"
        ),
        "events_hourly": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, "
            "count(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
            "FROM events GROUP BY event_type, hour ORDER BY event_type, hour"
        ),
        # exact windowed COUNT DISTINCT (user-partitioned dedup shuffle)
        "events_hourly_distinct": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, "
            "count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type, hour ORDER BY event_type, hour"
        ),
        # exact per-type p95 (PERCENTILE_DISC == quantile_disc: element
        # at 0-based index ceil(q*n)-1 — bit-identical doubles)
        "events_value_p95": (
            "SELECT event_type, quantile_disc(value, 0.95) AS p95 "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        # curation chain: quality gate -> exact dedup -> per-source stats.
        # ttr is rounded to 6dp BEFORE the gate and the AVG on both sides
        # (the pipeline's quality fn emits a 6dp-rounded ttr, so the gate and
        # mean see the rounded value); total_tok exact int sum.
        "curate_corpus": (
            "WITH t AS (SELECT doc_id, source, text, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents), "
            "f AS (SELECT doc_id, source, text, len(w) AS n_tok, "
            "ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr FROM t WHERE len(w) > 0), "
            "g AS (SELECT * FROM f WHERE n_tok >= 20 AND n_tok <= 5000 AND ttr >= 0.2), "
            "k AS (SELECT MIN(doc_id) AS doc_id FROM g GROUP BY text) "
            "SELECT source, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tok, "
            "ROUND(AVG(ttr), 6) AS avg_ttr "
            "FROM g JOIN k USING (doc_id) GROUP BY source ORDER BY source"
        ),
        # bottom-k sample: splitmix64 reproduced in SQL (mulmod split to
        # avoid int128 overflow), k smallest mixed hashes win
        "corpus_sample": (
            "WITH s0 AS (SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h "
            "FROM s2) "
            "SELECT doc_id, h FROM s3 ORDER BY h LIMIT 100"
        ),
        # A-ES weighted sample: u = (splitmix64(doc_id XOR 8) + 1) / 2^64,
        # key = u^(1/n_tok), top-50 keys win (same libm pow both sides);
        # same mulmod splitmix chain as corpus_sample with the seed pre-XOR
        "corpus_sample_weighted": (
            "WITH t AS (SELECT doc_id, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok "
            "FROM documents), "
            "m0 AS (SELECT doc_id, n_tok, "
            "(CAST(xor(CAST(doc_id AS UBIGINT), CAST(8 AS UBIGINT)) AS HUGEINT) "
            "+ 11400714819323198485) % 18446744073709551616 AS z "
            "FROM t WHERE n_tok > 0), "
            "x1 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS a FROM m0), "
            "s1 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, n_tok, "
            "xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h FROM s2), "
            "k AS (SELECT doc_id, n_tok, "
            "pow((CAST(h AS DOUBLE) + 1) / 18446744073709551616.0, "
            "1.0 / CAST(n_tok AS DOUBLE)) AS akey FROM s3) "
            "SELECT doc_id, n_tok FROM "
            "(SELECT * FROM k ORDER BY akey DESC LIMIT 50) ORDER BY doc_id"
        ),
        # per-source top-5 tokens: ROW_NUMBER window, ties (cnt desc, tok)
        "heavy_hitters_by_source": (
            "SELECT source, tok, cnt FROM ("
            "SELECT source, tok, count(*) AS cnt, "
            "row_number() OVER (PARTITION BY source ORDER BY count(*) DESC, tok) AS rn "
            "FROM (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE tok <> '' GROUP BY source, tok) "
            "WHERE rn <= 5 ORDER BY source, cnt DESC, tok"
        ),
        "distinct_by_source": (
            "SELECT source, count(DISTINCT tok) AS distinct_tokens FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents) t "
            "WHERE tok <> '' GROUP BY source ORDER BY source"
        ),
        # overlapping-interval range join vs an inline VALUES band table
        "range_join_bands": (
            "WITH bands(band_id, lo, hi) AS (VALUES (0, 800.0, 920.0), (1, 850.0, 970.0), (2, 900.0, 1020.0), (3, 950.0, 1070.0), (4, 1000.0, 1120.0), (5, 1050.0, 1170.0), (6, 1100.0, 1220.0), (7, 1150.0, 1270.0), (8, 1200.0, 1320.0), (9, 1250.0, 1370.0)) "
            "SELECT p_partkey, band_id FROM part JOIN bands "
            "ON p_retailprice >= lo AND p_retailprice < hi "
            "ORDER BY p_partkey, band_id"
        ),
        "join_orders_customer": (
            "SELECT o_orderkey, o_custkey, c_name, o_totalprice "
            "FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"
        ),
        "join_size_events_orders": (
            "SELECT CAST((SELECT COUNT(*) FROM events e JOIN orders o "
            "ON e.user_id = o.o_custkey) AS BIGINT) AS join_size, "
            "CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_left, "
            "CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_right"
        ),
        # clustered-store scan is I/O elision only: the oracle is the
        # same inclusive ts predicate over the raw table, per-day
        # micros-exact
        "events_clustered_scan": (
            "SELECT (CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)) "
            "* 86400000000 AS day_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros "
            "FROM events WHERE ts BETWEEN '2024-01-08' AND '2024-01-15' "
            "GROUP BY 1 ORDER BY 1"
        ),
        # bloom-index pruning is pure I/O elision: same rows as raw IN
        "store_bloom_lookup": (
            "SELECT event_id, user_id, value FROM events "
            "WHERE event_id IN (3, 411, 777, 905, 998) ORDER BY event_id"
        ),
        "events_value_p90_cont": (
            "SELECT event_type, ROUND(quantile_cont(value, 0.9), 6) AS p90 "
            "FROM events GROUP BY event_type ORDER BY event_type"
        ),
        "users_type_entropy": (
            "WITH c AS (SELECT user_id, event_type, COUNT(*)::DOUBLE AS c "
            "FROM events GROUP BY user_id, event_type), "
            "t AS (SELECT user_id, SUM(c) AS n FROM c GROUP BY user_id) "
            "SELECT user_id, CAST(t.n AS BIGINT) AS n, "
            "ROUND(-SUM((c/t.n) * LN(c/t.n)), 6) AS entropy "
            "FROM c JOIN t USING (user_id) GROUP BY user_id, t.n ORDER BY user_id"
        ),
        # mode with the pinned tie rule (highest count, then smallest)
        "users_top_event_type": (
            "WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events "
            "GROUP BY user_id, event_type), "
            "r AS (SELECT user_id, event_type, n, ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn FROM c) "
            "SELECT user_id, event_type AS mode, CAST(n AS BIGINT) AS mode_count "
            "FROM r WHERE rn = 1 ORDER BY user_id"
        ),
        # chi2 completes the zero-observed cells via the identity
        # sum_unobs E = n - sum_obs E; mi over observed cells only;
        # cramers_v = sqrt(chi2 / (n * min(r-1, k-1)))
        "events_type_hour_assoc": (
            "WITH c AS (SELECT event_type AS a, "
            "(epoch_us(ts) // 3600000000) % 24 AS b, COUNT(*)::DOUBLE AS o "
            "FROM events GROUP BY 1, 2), "
            "tot AS (SELECT SUM(o) AS n FROM c), "
            "rt AS (SELECT a, SUM(o) AS ra FROM c GROUP BY a), "
            "ct AS (SELECT b, SUM(o) AS cb FROM c GROUP BY b), "
            "dims AS (SELECT (SELECT COUNT(*) FROM rt) AS r, "
            "(SELECT COUNT(*) FROM ct) AS k), "
            "s AS (SELECT ANY_VALUE(n) AS n, "
            "SUM(POWER(o - ra*cb/n, 2)/(ra*cb/n) - ra*cb/n) + ANY_VALUE(n) AS chi2, "
            "SUM(o/n * LN(o*n/(ra*cb))) AS mi "
            "FROM c JOIN rt USING (a) JOIN ct USING (b) CROSS JOIN tot) "
            "SELECT CAST(s.n AS BIGINT) AS n, "
            "CAST((dims.r - 1) * (dims.k - 1) AS BIGINT) AS dof, "
            "ROUND(s.chi2, 6) AS chi2, ROUND(s.mi, 6) AS mi, "
            "ROUND(SQRT(s.chi2 / (s.n * LEAST(dims.r - 1, dims.k - 1))), 6) "
            "AS cramers_v FROM s CROSS JOIN dims"
        ),
        # RE2 both sides (Arrow kernel / DuckDB regexp_matches);
        # unique (ts, event_id) tiebreak pins the sequence
        "users_pattern_match": (
            "SELECT user_id, string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq, "
            "regexp_matches(string_agg(event_type, ' ' ORDER BY ts, event_id), "
            "'view( (?:click|signup|view|purchase))* purchase') AS matched "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        # substring containment incl. overlaps = SQL position()
        "docs_phrase_hits": (
            "SELECT d.doc_id, p.phrase FROM documents d JOIN (VALUES "
            "('hash join'), ('sort merge'), ('table scan'), ('window agg'), "
            "('key order'), ('batch stream'), ('join order')"
            ") p(phrase) ON position(p.phrase IN d.text) > 0 "
            "ORDER BY d.doc_id, p.phrase"
        ),
        # 3 planted malformed lines surface as the bad_lines tally; the
        # data aggregate must equal the raw table's (no silent drops)
        "jsonl_ingest": (
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS chars, "
            "CAST(3 AS BIGINT) AS bad_lines "
            "FROM documents GROUP BY source ORDER BY source"
        ),
        # first/last/nth over a uniquely-tiebroken window
        "events_window_edges": (
            "SELECT user_id, ts, event_id, "
            "ROUND(FIRST_VALUE(value) OVER w, 6) AS first_v, "
            "ROUND(LAST_VALUE(value) OVER w, 6) AS last_v, "
            "ROUND(NTH_VALUE(value, 3) OVER w, 6) AS third_v "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "ORDER BY user_id, ts, event_id"
        ),
        # z-order pruning is pure I/O elision: same rows as the raw filter
        "store_zorder_scan": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros FROM events "
            "WHERE user_id BETWEEN 10 AND 50 GROUP BY user_id ORDER BY user_id"
        ),
        # compaction invisible to readers: same SQL as clustered_scan
        "store_compact_scan": (
            "SELECT (CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)) "
            "* 86400000000 AS day_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros "
            "FROM events WHERE ts BETWEEN '2024-01-08' AND '2024-01-15' "
            "GROUP BY 1 ORDER BY 1"
        ),
        # exact-distance fuzzy join; DuckDB levenshtein is the oracle
        "parts_fuzzy_names": (
            "SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, "
            "levenshtein(a.p_name, b.p_name) AS dist "
            "FROM part a JOIN part b ON a.p_partkey < b.p_partkey "
            "WHERE levenshtein(a.p_name, b.p_name) <= 2 ORDER BY id_a, id_b"
        ),
        # value-level aggregate of the same join: distinct name pairs
        # within distance 2 + the id-pair count each expands to
        "parts_fuzzy_name_stats": (
            "WITH names AS (SELECT p_name AS val, COUNT(*) AS n "
            "FROM part GROUP BY 1), "
            "cross_pairs AS (SELECT a.val AS val_a, b.val AS val_b, "
            "CAST(levenshtein(a.val, b.val) AS BIGINT) AS dist, "
            "CAST(a.n * b.n AS BIGINT) AS n_pairs "
            "FROM names a JOIN names b ON a.val < b.val "
            "WHERE levenshtein(a.val, b.val) <= 2), "
            "dup_pairs AS (SELECT val AS val_a, val AS val_b, "
            "CAST(0 AS BIGINT) AS dist, "
            "CAST(n * (n - 1) / 2 AS BIGINT) AS n_pairs "
            "FROM names WHERE n >= 2) "
            "SELECT * FROM cross_pairs UNION ALL SELECT * FROM dup_pairs "
            "ORDER BY val_a, val_b"
        ),
        # Jaro-Winkler similarity join at tau=0.88 over distinct part
        # names (closest fixture pair sits 4.5e-4 from the threshold,
        # far outside float noise; engine kernel is bitwise
        # DuckDB-parity on 1300+ adversarial pairs)
        # entity resolution: transitive closure of JW >= 0.88 matches
        # by a RECURSIVE reachability fixpoint (UNION-distinct iterates
        # until no new (val, lab) pair appears — exact for any
        # component diameter, unlike a fixed round count); entity =
        # min member name, multi-name entities only. The pairing CTE
        # mirrors the engine's [min_len=1, max_len=64] name filter
        # (entity_resolution -> jaro_winkler_pairs drops longer
        # strings); counts stay unfiltered, matching the engine where
        # unmatched names are singletons and drop under n_names >= 2.
        "parts_entities": (
            "WITH RECURSIVE names AS (SELECT p_name AS val, COUNT(*) AS n "
            "FROM part GROUP BY 1), "
            "pr AS MATERIALIZED (SELECT a.val AS va, b.val AS vb "
            "FROM names a JOIN names b ON a.val < b.val "
            "WHERE length(a.val) BETWEEN 1 AND 64 "
            "AND length(b.val) BETWEEN 1 AND 64 "
            "AND jaro_winkler_similarity(a.val, b.val) >= 0.88), "
            # keep the symmetrized union one level down: inside WITH
            # RECURSIVE a top-level UNION would parse as recursive
            "e AS (SELECT a, b FROM (SELECT va AS a, vb AS b FROM pr "
            "UNION ALL SELECT vb AS a, va AS b FROM pr)), "
            "nodes AS (SELECT DISTINCT a AS nd FROM e), "
            "reach AS (SELECT nd AS val, nd AS lab FROM nodes "
            "UNION "
            "SELECT r.val, e.b FROM reach r JOIN e ON e.a = r.lab), "
            "comp AS (SELECT val, MIN(lab) AS entity FROM reach "
            "GROUP BY val), "
            "ent AS (SELECT entity, count(*) AS n_names, "
            "SUM(n) AS n_parts FROM comp JOIN names USING (val) "
            "GROUP BY entity HAVING count(*) >= 2) "
            "SELECT entity, CAST(n_names AS BIGINT) AS n_names, "
            "CAST(n_parts AS BIGINT) AS n_parts FROM ent ORDER BY entity"
        ),
        # mirrors the engine's [min_len=1, max_len=64] value filter
        "parts_jw_names": (
            "WITH names AS (SELECT p_name AS val, COUNT(*) AS n "
            "FROM part GROUP BY 1) "
            "SELECT a.val AS val_a, b.val AS val_b, "
            "ROUND(jaro_winkler_similarity(a.val, b.val), 6) AS jw, "
            "CAST(a.n * b.n AS BIGINT) AS n_pairs "
            "FROM names a JOIN names b ON a.val < b.val "
            "WHERE length(a.val) BETWEEN 1 AND 64 "
            "AND length(b.val) BETWEEN 1 AND 64 "
            "AND jaro_winkler_similarity(a.val, b.val) >= 0.88 "
            "ORDER BY val_a, val_b"
        ),
        # sweep-line peak overlap; ends before starts at equal t (the
        # half-open rule) via ORDER BY t, delta; the peak is invariant
        # to order within (t, delta) ties
        "events_peak_concurrency": (
            "WITH iv AS (SELECT event_type, epoch_us(ts) AS s, "
            "epoch_us(ts) + (30 + event_id % 90) * 1000000 AS e FROM events), "
            "d AS (SELECT event_type, s AS t, 1 AS delta FROM iv "
            "UNION ALL SELECT event_type, e, -1 FROM iv), "
            "c AS (SELECT event_type, SUM(delta) OVER (PARTITION BY event_type "
            "ORDER BY t, delta ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM d) "
            "SELECT event_type, CAST(MAX(run) AS BIGINT) AS peak FROM c "
            "GROUP BY event_type ORDER BY event_type"
        ),
        # bounded-lateness watermark gate + 2h/1h hopping window: the
        # prefix-max identity is the SQL window frame (ROWS UNBOUNDED
        # PRECEDING .. 1 PRECEDING over unique event_id arrivals);
        # planted staleness (event_id % 37 = 5 -> -3h) mirrors the
        # engine; late rows surface as window_us = -1 marker rows.
        # floor(tsu/3.6e9) is exact for |tsu| <= 2^52 (0.5 ulp < 1us/H)
        "events_watermark_hopping": (
            "WITH base AS (SELECT event_id, event_type, "
            "CAST(ROUND(value * 1e6) AS BIGINT) AS v_u6, "
            "epoch_us(ts) - CASE WHEN event_id % 37 = 5 "
            "THEN 10800000000 ELSE 0 END AS tsu FROM events), "
            "w AS (SELECT *, MAX(tsu) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm "
            "FROM base), "
            "f AS (SELECT *, (pm IS NOT NULL AND tsu < pm - 7200000000) "
            "AS late FROM w), "
            "ot AS (SELECT * FROM f WHERE NOT late), "
            "exp AS (SELECT CAST(floor(tsu / 3600000000.0) AS BIGINT) "
            "* 3600000000 AS window_us, event_type, v_u6 FROM ot "
            "UNION ALL SELECT CAST(floor(tsu / 3600000000.0) AS BIGINT) "
            "* 3600000000 - 3600000000, event_type, v_u6 FROM ot), "
            "agg AS (SELECT window_us, event_type, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(v_u6) AS BIGINT) AS value_sum_micros "
            "FROM exp GROUP BY 1, 2), "
            "lt AS (SELECT CAST(-1 AS BIGINT) AS window_us, event_type, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(v_u6) AS BIGINT) AS value_sum_micros "
            "FROM f WHERE late GROUP BY event_type) "
            "SELECT * FROM agg UNION ALL SELECT * FROM lt "
            "ORDER BY window_us, event_type"
        ),
        # one-pass CUBE; micros-exact sums, GROUPING() bitmask ids
        "events_cube": (
            "SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, "
            "GROUPING(event_type, strftime(ts, '%Y-%m-%d')) AS grouping_id, "
            "COUNT(*) AS n_events, "
            "SUM(CAST(ROUND(value * 1e6) AS BIGINT)) / 1e6 AS sum_value "
            "FROM events GROUP BY CUBE (event_type, strftime(ts, '%Y-%m-%d')) "
            "ORDER BY grouping_id, event_type NULLS LAST, day NULLS LAST"
        ),
        # general window operator vs SQL OVER frames (micros-exact)
        "events_window_funcs": (
            "SELECT event_id, user_id, "
            "CAST(ROUND(value * 1e6) AS BIGINT) AS v_u6, "
            "CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn, "
            "CAST(COALESCE(LAG(CAST(ROUND(value * 1e6) AS BIGINT), 1) OVER w, -1) "
            "AS BIGINT) AS prev_v_u6, "
            "CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) OVER w AS BIGINT) "
            "AS run_sum_u6, "
            "CAST(MAX(CAST(ROUND(value * 1e6) AS BIGINT)) OVER w AS BIGINT) "
            "AS run_max_u6 "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
            "ORDER BY event_id"
        ),
        # composite-key join-back: lines strictly under half their
        # (order, part) pair total, integer-exact
        "composite_join_lines": (
            "WITH p AS (SELECT l_orderkey, l_partkey, "
            "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS pair_q "
            "FROM lineitem GROUP BY 1, 2) "
            "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_under_half "
            "FROM lineitem JOIN p USING (l_orderkey, l_partkey) "
            "WHERE 2 * CAST(ROUND(l_quantity) AS BIGINT) < pair_q "
            "GROUP BY 1 ORDER BY 1"
        ),
        # write+append+no-op-replay store must answer like the raw table
        "events_clustered_append": (
            "SELECT (CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)) "
            "* 86400000000 AS day_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros "
            "FROM events WHERE ts BETWEEN '2024-01-10' AND '2024-01-20' "
            "GROUP BY 1 ORDER BY 1"
        ),
        # CDC diff: FULL JOIN + IS DISTINCT FROM over the same derived
        # snapshots
        "orders_snapshot_diff": (
            "WITH o AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders "
            "WHERE o_orderkey % 3 <> 0), "
            "n AS (SELECT o_orderkey AS k, CASE WHEN o_orderkey % 7 = 0 "
            "THEN o_totalprice * 2 ELSE o_totalprice END AS v FROM orders "
            "WHERE o_orderkey % 5 <> 0) "
            "SELECT COALESCE(o.k, n.k) AS o_orderkey, "
            "CASE WHEN o.k IS NULL THEN 'added' WHEN n.k IS NULL THEN 'removed' "
            "ELSE 'modified' END AS change "
            "FROM o FULL JOIN n ON o.k = n.k "
            "WHERE o.k IS NULL OR n.k IS NULL OR o.v IS DISTINCT FROM n.v "
            "ORDER BY 1"
        ),
        # constraint-violation counts, same rules in SQL
        "validate_orders": (
            "SELECT rule, CAST(v AS BIGINT) AS violations FROM ("
            "SELECT 'not_null(o_custkey)' AS rule, "
            "COUNT(*) FILTER (WHERE o_custkey IS NULL) AS v FROM orders "
            "UNION ALL SELECT 'range(o_totalprice,0.0,None)', "
            "COUNT(*) FILTER (WHERE o_totalprice IS NULL OR o_totalprice < 0) "
            "FROM orders "
            "UNION ALL SELECT 'unique(o_orderkey)', "
            "COALESCE((SELECT SUM(n) FROM (SELECT COUNT(*) AS n FROM orders "
            "GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) "
            "UNION ALL SELECT 'foreign_key(o_custkey->c_custkey)', "
            "(SELECT COUNT(*) FROM orders o LEFT JOIN customer c "
            "ON o.o_custkey = c.c_custkey "
            "WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)"
            ") ORDER BY rule"
        ),
        # grouped population variance from mergeable partials, 2dp
        "events_value_stats_by_type": (
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "ROUND(VAR_POP(value), 2) AS value_var, "
            "ROUND(STDDEV_POP(value), 2) AS value_std "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "events_value_hour_corr": (
            "SELECT event_type, "
            "CAST(regr_count(value, CAST(extract(hour FROM ts) AS DOUBLE)) AS BIGINT) AS n, "
            "ROUND(corr(CAST(extract(hour FROM ts) AS DOUBLE), value), 4) AS corr, "
            "ROUND(regr_slope(value, CAST(extract(hour FROM ts) AS DOUBLE)), 4) AS slope, "
            "ROUND(regr_intercept(value, CAST(extract(hour FROM ts) AS DOUBLE)), 4) AS intercept, "
            "ROUND(POWER(corr(CAST(extract(hour FROM ts) AS DOUBLE), value), 2), 4) AS r2 "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        # unnest-with-ordinality per-dimension stats, micros-exact
        "embedding_dim_stats": (
            "WITH e AS (SELECT CAST(u.o - 1 AS BIGINT) AS dim, "
            "CAST(ROUND(CAST(u.x AS DOUBLE) * 1e6) AS BIGINT) AS x_u6 "
            "FROM embeddings, LATERAL (SELECT unnest(embedding) x, "
            "generate_subscripts(embedding, 1) o) u) "
            "SELECT dim, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x_u6) AS BIGINT) AS sum_u6, "
            "CAST(MIN(x_u6) AS BIGINT) AS min_u6, "
            "CAST(MAX(x_u6) AS BIGINT) AS max_u6 "
            "FROM e GROUP BY dim ORDER BY dim"
        ),
        # zero-shuffle co-partitioned join == the plain join (cents-exact)
        "bucketed_join_orders": (
            "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY 1 ORDER BY 1"
        ),
        # two-delta incremental fold must equal the one-shot aggregate
        # (micros-exact sums/min/max)
        "incremental_user_stats": (
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros, "
            "CAST(MIN(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_min_micros, "
            "CAST(MAX(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
            "AS value_max_micros "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        # skew-salted join plan is results-invariant: the oracle is the
        # plain join+group (revenue u4-exact: cents x (100 - discount pts))
        "skew_join_revenue": (
            "SELECT o_orderpriority, "
            "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_u4, CAST(COUNT(*) AS BIGINT) AS n_items "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        "anti_join_customers_no_orders": (
            "SELECT c_custkey, c_name FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000) "
            "ORDER BY c_custkey"
        ),
        # full-outer mode: key coalesced across sides (USING semantics);
        # sides filtered to overlapping ranges so left-only / both /
        # right-only rows all occur
        "full_join_customer_order_counts": (
            "SELECT COALESCE(c.c_custkey, o.o_custkey) AS c_custkey, c.c_name, o.n_orders "
            "FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey <= 200) c "
            "FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders "
            "WHERE o_custkey >= 100 GROUP BY o_custkey) o "
            "ON c.c_custkey = o.o_custkey ORDER BY c_custkey"
        ),
        # as-of self-join: LAG over (user, ts, event_id) order
        "events_asof": (
            "SELECT event_id, user_id, ts, value, "
            "lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value "
            "FROM events ORDER BY event_id"
        ),
        # sliding windows: event at t -> k hop-aligned window starts
        "events_sliding": (
            "WITH w AS (SELECT event_type, value, "
            "unnest(generate_series(time_bucket(INTERVAL 15 MINUTE, ts) - INTERVAL 45 MINUTE, "
            "time_bucket(INTERVAL 15 MINUTE, ts), INTERVAL 15 MINUTE)) AS window_start "
            "FROM events) "
            "SELECT event_type, window_start, count(*) AS n_events, "
            "ROUND(SUM(value), 2) AS sum_value FROM w "
            "GROUP BY event_type, window_start ORDER BY event_type, window_start"
        ),
        # sliding COUNT(DISTINCT): window start = every bucket within
        # w hops below an observed (user, bucket) pair's bucket
        "events_sliding_distinct": (
            "WITH p AS (SELECT DISTINCT user_id, "
            "CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS b FROM events "
            "WHERE ts IS NOT NULL AND user_id IS NOT NULL), "
            "r AS (SELECT user_id, b - 3600 * g.i AS ws "
            "FROM p, generate_series(0, 2) g(i)) "
            "SELECT ws, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users "
            "FROM r GROUP BY ws ORDER BY ws"
        ),
        # exact set algebra over distinct tokens of two sources
        "source_overlap": (
            "WITH t AS (SELECT DISTINCT source, tok FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE tok <> '' AND source IN ('src0', 'src1')), "
            "a AS (SELECT tok FROM t WHERE source = 'src0'), "
            "b AS (SELECT tok FROM t WHERE source = 'src1'), "
            "c AS (SELECT (SELECT count(*) FROM a) AS n_a, (SELECT count(*) FROM b) AS n_b, "
            "(SELECT count(*) FROM a JOIN b USING (tok)) AS n_intersection) "
            "SELECT n_a, n_b, n_intersection, n_a + n_b - n_intersection AS n_union, "
            "CAST(n_intersection AS DOUBLE) / (n_a + n_b - n_intersection) AS jaccard FROM c"
        ),
        "events_sessions": (
            "WITH m AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM m) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value "
            "FROM s GROUP BY user_id, sid ORDER BY user_id, session_start"
        ),
        # per-user top-3 by (value desc, event_id): ROW_NUMBER window
        "events_topk_per_user": (
            "SELECT user_id, event_id, ts, value FROM ("
            "SELECT user_id, event_id, ts, value, "
            "row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn "
            "FROM events) WHERE rn <= 3 ORDER BY user_id, value DESC, event_id"
        ),
        # trailing-window mean: ROWS 4 PRECEDING frame, deterministic
        # (ts, event_id) order, rounded on both sides
        "events_rolling_mean": (
            "SELECT event_id, user_id, ts, value, "
            "ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS roll_mean "
            "FROM events ORDER BY event_id"
        ),
        # BPE-ish regex lexer (RE2 both sides): letter runs | digit runs
        # | single non-alnum-non-space symbol
        "token_count_regex": (
            "SELECT doc_id, CAST(len(regexp_extract_all(text, "
            "'[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INT) AS n_tok_re "
            "FROM documents ORDER BY doc_id"
        ),
        # exact word-3-gram Jaccard >= 0.5 over distinct shingles; floats
        # are a single int division on both sides -> bit-identical.
        "ngram_jaccard": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5 ORDER BY doc_a, doc_b"
        ),
        # max containment over the same exact 3-gram sets: LEAST(|A|,|B|)
        # denominator, one double division both sides
        "dedup_containment": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) AS containment "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) >= 0.8 ORDER BY doc_a, doc_b"
        ),
        # connected components over the exact n-gram-Jaccard pairs:
        # recursive transitive closure (UNION dedup => terminates),
        # component label = min reachable node
        # sorted-neighborhood blocking: window self-join on the global
        # row_number over (lower 16-char prefix, doc_id)
        "docs_sorted_neighbors": (
            "WITH r AS (SELECT doc_id, ROW_NUMBER() OVER ("
            "ORDER BY lower(substring(text, 1, 16)), doc_id) - 1 AS rn "
            "FROM documents) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(b.rn - a.rn AS BIGINT) AS gap "
            "FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5 "
            "ORDER BY id_a, id_b"
        ),
        # multi-source BFS over the 0.3-threshold exact 3-gram Jaccard
        # graph: recursive walk capped at 63 hops (far beyond the dup
        # graph's diameter), MIN(dist) collapses revisits
        "doc_graph_bfs": (
            "WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM (SELECT doc_id, "
            "unnest(list_transform(range(1, len(w) - 1), i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) "
            "AS gram FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
            "p AS (SELECT doc_a, doc_b FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
            "JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.3), "
            "edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p), "
            "srcs AS (SELECT a AS node FROM (SELECT DISTINCT a FROM edges ORDER BY a LIMIT 5)), "
            "walk(node, dist) AS (SELECT node, 0 FROM srcs UNION "
            "SELECT e.b, w.dist + 1 FROM walk w JOIN edges e ON e.a = w.node WHERE w.dist < 63) "
            "SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM walk GROUP BY node ORDER BY node"
        ),
        "dedup_ngram_components": (
            "WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
            "p AS (SELECT doc_a, doc_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
            "edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p), "
            "reach(n, m) AS (SELECT a, a FROM edges UNION "
            "SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m) "
            "SELECT n AS node, MIN(m) AS comp FROM reach GROUP BY n ORDER BY node"
        ),
        # cosine rounded to 6 dp on both sides (double math both sides)
        "dedup_embedding": (
            "WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e "
            "FROM embeddings) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine "
            "FROM v a JOIN v b ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4 "
            "ORDER BY vec_a, vec_b"
        ),
        # deterministic DBSCAN: same eps predicate as dedup_embedding;
        # core = |N(p)| >= 3 counting self; cluster = min core id of the
        # core-core CC (recursive-CTE closure); border = MIN core
        # neighbor's cluster; noise = NULL cluster
        "dbscan_clusters": (
            "WITH RECURSIVE v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e "
            "FROM embeddings), "
            "p AS (SELECT a.vec_id AS va, b.vec_id AS vb FROM v a JOIN v b ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4), "
            "sym AS (SELECT va AS s, vb AS d FROM p UNION ALL SELECT vb, va FROM p), "
            "deg AS (SELECT s, COUNT(*) AS n FROM sym GROUP BY s), "
            "core AS (SELECT e.vec_id FROM embeddings e JOIN deg ON deg.s = e.vec_id WHERE deg.n + 1 >= 3), "
            "ce AS (SELECT s, d FROM sym WHERE s IN (SELECT vec_id FROM core) "
            "AND d IN (SELECT vec_id FROM core)), "
            "reach(n, m) AS (SELECT s, s FROM ce UNION SELECT r.n, e.d FROM reach r JOIN ce e ON e.s = r.m), "
            "lab AS (SELECT n AS node, MIN(m) AS comp FROM reach GROUP BY n), "
            "corelab AS (SELECT c.vec_id, COALESCE(l.comp, c.vec_id) AS cluster "
            "FROM core c LEFT JOIN lab l ON l.node = c.vec_id), "
            "border AS (SELECT s.s AS vec_id, MIN(cl.cluster) AS cluster FROM sym s "
            "JOIN corelab cl ON cl.vec_id = s.d "
            "WHERE s.s NOT IN (SELECT vec_id FROM core) GROUP BY s.s) "
            "SELECT e.vec_id, COALESCE(cl.cluster, b.cluster) AS cluster, "
            "CASE WHEN cl.vec_id IS NOT NULL THEN 'core' "
            "WHEN b.vec_id IS NOT NULL THEN 'border' ELSE 'noise' END AS role "
            "FROM embeddings e LEFT JOIN corelab cl ON cl.vec_id = e.vec_id "
            "LEFT JOIN border b ON b.vec_id = e.vec_id ORDER BY e.vec_id"
        ),
        # tf-idf top-3 per doc: idf = ln(N/df); ranking by the ROUNDED
        # score (desc, term asc) on both sides -> identical order
        "tfidf_top_terms": (
            "WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term "
            "FROM documents), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term), "
            "df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT COUNT(*) AS n FROM documents), "
            "s AS (SELECT doc_id, tf.term, tf, "
            "ROUND(tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf "
            "FROM tf JOIN df ON tf.term = df.term CROSS JOIN n), "
            "r AS (SELECT doc_id, term, tf, tfidf, "
            "row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM s) "
            "SELECT doc_id, term, tf, tfidf FROM r WHERE rn <= 3 "
            "ORDER BY doc_id, tfidf DESC, term"
        ),
        # length-outlier curation: exact discrete quantiles (histogram
        # walk = quantile_disc semantics, index ceil(q*n)-1), inclusive band
        "length_filter_percentile": (
            "WITH t AS (SELECT doc_id, CAST(len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS INT) AS n_tok FROM documents), "
            "q AS (SELECT quantile_disc(n_tok, 0.05) AS lo, "
            "quantile_disc(n_tok, 0.95) AS hi FROM t) "
            "SELECT doc_id, n_tok FROM t, q WHERE n_tok BETWEEN lo AND hi "
            "ORDER BY doc_id"
        ),
        # fixed-length sequence chunk plan: ceil(n/64) chunks per doc,
        # last chunk carries the remainder
        "pack_sequences": (
            "WITH t AS (SELECT doc_id, len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS n FROM documents) "
            "SELECT doc_id, CAST(c AS INT) AS chunk_id, "
            "CAST(LEAST(64, n - 64 * c) AS INT) AS chunk_len "
            "FROM (SELECT doc_id, n, unnest(range(CAST(ceil(n / 64.0) AS BIGINT))) AS c "
            "FROM t) ORDER BY doc_id, chunk_id"
        ),
        # sliding-window chunks: starts generate_series(0, n-5, 30),
        # 1-based inclusive list slice, single-space rejoin
        "chunk_docs": (
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM documents), "
            "nn AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) >= 5), "
            "s AS (SELECT doc_id, w, n, unnest(generate_series(0, n - 5, 30)) AS st "
            "FROM nn) "
            "SELECT doc_id, CAST(st // 30 AS INT) AS chunk_id, "
            "CAST(least(st + 40, n) - st AS INT) AS n_tok, "
            "array_to_string(w[st + 1 : least(st + 40, n)], ' ') AS chunk_text "
            "FROM s ORDER BY doc_id, chunk_id"
        ),
        # top-100 vocabulary coverage: integer sums, one rounded division
        "vocab_coverage": (
            "WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok "
            "FROM documents), "
            "c AS (SELECT tok, COUNT(*) AS cnt FROM w GROUP BY tok), "
            "t AS (SELECT SUM(cnt) AS total FROM c), "
            "v AS (SELECT cnt FROM c ORDER BY cnt DESC, tok LIMIT 100) "
            "SELECT CAST(100 AS INT) AS vocab_size, CAST(t.total AS BIGINT) AS total_tokens, "
            "ROUND(CAST((SELECT SUM(cnt) FROM v) AS DOUBLE) / t.total, 6) AS coverage FROM t"
        ),
        "doc_quality": (
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents) "
            "SELECT doc_id, CAST(len(w) AS INT) AS n_tok, "
            "ROUND(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w), 6) AS avg_tok_len, "
            "ROUND(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6) AS ttr, "
            "ROUND(CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','in','to','is'], x))) "
            "AS DOUBLE) / len(w), 6) AS stop_ratio "
            "FROM t WHERE len(w) > 0 ORDER BY doc_id"
        ),
        # ranking by ROUND(cos, 6) DESC, vec_id ASC on both sides
        "ann_topk": (
            "WITH q AS (SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e "
            "FROM embeddings WHERE vec_id < 10), "
            "v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e "
            "FROM embeddings), "
            "s AS (SELECT qid, vec_id, ROUND(list_cosine_similarity(q.e, v.e), 6) AS cosine "
            "FROM q CROSS JOIN v WHERE vec_id <> qid), "
            "r AS (SELECT qid, vec_id, cosine, "
            "row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn FROM s) "
            "SELECT qid, vec_id, cosine FROM r WHERE rn <= 5 ORDER BY qid, cosine DESC, vec_id"
        ),
        # benchmark decontamination: word-3-gram CONTAINMENT of every
        # non-src0 doc against the src0 benchmark set; the float is one
        # int division on both sides -> bit-identical
        "decontaminate": (
            "WITH toks AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, source, gram FROM ("
            "SELECT doc_id, source, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) "
            "WHERE a.source <> 'src0' AND b.source = 'src0' GROUP BY 1, 2) "
            "SELECT doc_id, bench_id, CAST(i AS DOUBLE) / sa.n AS containment "
            "FROM inter JOIN sizes sa USING (doc_id) "
            "WHERE CAST(i AS DOUBLE) / sa.n >= 0.5 ORDER BY doc_id, bench_id"
        ),
        # deterministic stratified sample: splitmix64(doc_id) reproduced
        # in SQL (same mulmod chain as corpus_sample), 5 smallest per source
        "stratified_sample": (
            "WITH s0 AS (SELECT doc_id, source, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, source, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, source, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, source, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, source, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, source, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h "
            "FROM s2), "
            "r AS (SELECT source, doc_id, h, "
            "row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM s3) "
            "SELECT source, doc_id, h FROM r WHERE rn <= 5 ORDER BY source, h"
        ),
        # token-budget corpus mixing: greedy prefix in splitmix64 order
        # per source; admit while the running total BEFORE the doc < 500
        "mix_to_budget": (
            "WITH s0 AS (SELECT doc_id, source, text, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, source, text, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, source, text, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, source, text, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, source, text, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, source, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h, "
            "len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok FROM s2), "
            "w AS (SELECT source, doc_id, n_tok, h, "
            "COALESCE(SUM(n_tok) OVER (PARTITION BY source ORDER BY h "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before FROM s3) "
            "SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok, h FROM w "
            "WHERE tok_before < 500 ORDER BY source, h"
        ),
        # epoch-1 deterministic shuffle: h = splitmix64(doc_id XOR
        # splitmix64(2)); rank = dense 0-based position in h order
        "epoch_shuffle": (
            "WITH s0 AS (SELECT doc_id, (CAST(xor(CAST(doc_id AS UBIGINT), "
            "CAST(10905525725756348110 AS UBIGINT)) AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h "
            "FROM s2) "
            "SELECT row_number() OVER (ORDER BY h) - 1 AS rank, h, doc_id "
            "FROM s3 ORDER BY rank"
        ),
        # per-doc novelty: share of the doc's distinct 3-grams that no
        # other document contains (one int division, rounded at 6dp)
        "doc_novelty": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "df AS (SELECT gram, count(*) AS d FROM grams GROUP BY gram) "
            "SELECT doc_id, count(*) AS n_grams, "
            "ROUND(CAST(SUM(CASE WHEN df.d = 1 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ count(*), 6) AS novelty "
            "FROM grams JOIN df USING (gram) GROUP BY doc_id ORDER BY doc_id"
        ),
        # train/test leakage audit: identical-text groups spanning the
        # train/heldout boundary of the assign_splits assignment
        "split_leakage": (
            "WITH s0 AS (SELECT doc_id, text, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, text, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, text, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, text, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, text, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, text, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) "
            "% 1000 AS BIGINT) AS b FROM s2) "
            "SELECT MIN(doc_id) AS group_min_id, "
            "CAST(SUM(CASE WHEN b >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_train, "
            "CAST(SUM(CASE WHEN b < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_heldout "
            "FROM s3 GROUP BY text "
            "HAVING SUM(CASE WHEN b >= 100 THEN 1 ELSE 0 END) > 0 "
            "AND SUM(CASE WHEN b < 100 THEN 1 ELSE 0 END) > 0 ORDER BY group_min_id"
        ),
        # the whole curation chain composed: quality gate (unrounded
        # ratios) -> containment-decontamination drop -> exact dedup
        # (min id per text) -> splitmix split buckets -> per-split report
        "full_curation": (
            "WITH tr AS (SELECT doc_id, source, text, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents WHERE source <> 'src0'), "
            "f AS (SELECT doc_id, text, len(w) AS n_tok, "
            "CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr "
            "FROM tr WHERE len(w) > 0), "
            "g AS (SELECT doc_id, text, n_tok FROM f "
            "WHERE n_tok >= 20 AND n_tok <= 5000 AND ttr >= 0.2), "
            "toks AS (SELECT doc_id, source, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, source, gram FROM ("
            "SELECT doc_id, source, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS d, b.doc_id AS bd, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) "
            "WHERE a.source <> 'src0' AND b.source = 'src0' GROUP BY 1, 2), "
            "cont AS (SELECT DISTINCT d AS doc_id FROM inter "
            "JOIN sizes ON sizes.doc_id = inter.d "
            "WHERE CAST(i AS DOUBLE) / sizes.n >= 0.5), "
            "surv AS (SELECT * FROM g WHERE doc_id NOT IN (SELECT doc_id FROM cont)), "
            "ded AS (SELECT doc_id, n_tok, "
            "MIN(doc_id) OVER (PARTITION BY text) AS keep_id FROM surv), "
            "k AS (SELECT doc_id, n_tok FROM ded WHERE doc_id = keep_id), "
            "s0 AS (SELECT doc_id, n_tok, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM k), "
            "x1 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) "
            "% 1000 AS BIGINT) AS bucket FROM s2) "
            "SELECT CASE WHEN bucket < 50 THEN 'test' WHEN bucket < 100 THEN 'val' "
            "ELSE 'train' END AS split, COUNT(*) AS n_docs, "
            "CAST(SUM(n_tok) AS BIGINT) AS total_tok "
            "FROM s3 GROUP BY 1 ORDER BY split"
        ),
        # the OTHER curation chain composed end-to-end: Gopher
        # repetition gate (rounded fractions) -> 95%-DF word-segment
        # line-dedup rewrite over the GATED corpus -> exact 3-gram
        # Jaccard >= 0.5 keep-set over the REWRITTEN text (recursive-
        # CTE transitive closure; the MinHash-LSH engine path must be
        # lossless vs it, as dedup_minhash_keep proves standalone) ->
        # splitmix buckets -> per-split report on rewritten-token counts
        "full_pretrain_curation": (
            "WITH RECURSIVE t AS (SELECT doc_id, text, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents), "
            "m2 AS (SELECT doc_id, MAX(c) AS maxc FROM (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram "
            "FROM t WHERE len(w) >= 2) GROUP BY doc_id, gram) GROUP BY doc_id), "
            "m3 AS (SELECT doc_id, MAX(c) AS maxc FROM (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM t WHERE len(w) >= 3) GROUP BY doc_id, gram) GROUP BY doc_id), "
            "m4 AS (SELECT doc_id, MAX(c) AS maxc FROM (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 2), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gram "
            "FROM t WHERE len(w) >= 4) GROUP BY doc_id, gram) GROUP BY doc_id), "
            "g5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 3), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram "
            "FROM t WHERE len(w) >= 5) GROUP BY doc_id, gram), "
            "d5 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot "
            "FROM g5 GROUP BY doc_id), "
            "f AS (SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tok, "
            "ROUND(COALESCE(m2.maxc * 2.0 / len(w), 0), 6) AS top2_frac, "
            "ROUND(COALESCE(m3.maxc * 3.0 / len(w), 0), 6) AS top3_frac, "
            "ROUND(COALESCE(m4.maxc * 4.0 / len(w), 0), 6) AS top4_frac, "
            "ROUND(COALESCE(CAST(d5.dup AS DOUBLE) / d5.tot, 0), 6) AS dup5_frac "
            "FROM t LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id) "
            "LEFT JOIN m4 USING (doc_id) LEFT JOIN d5 USING (doc_id)), "
            "gd AS (SELECT d.doc_id, d.text FROM documents d JOIN f USING (doc_id) "
            "WHERE f.n_tok > 0 AND f.top2_frac <= 0.10 AND f.top3_frac <= 0.08 "
            "AND f.top4_frac <= 0.06 AND f.dup5_frac <= 0.10), "
            "ls AS (SELECT doc_id, unnest(string_split(text, ' ')) AS ln, "
            "unnest(generate_series(1, len(string_split(text, ' ')))) AS idx FROM gd), "
            "dup AS (SELECT ln FROM ls WHERE ln <> '' GROUP BY ln "
            "HAVING COUNT(DISTINCT doc_id) * 20 >= (SELECT COUNT(*) FROM gd) * 19), "
            "kept AS (SELECT doc_id, ln, idx FROM ls "
            "WHERE ln = '' OR ln NOT IN (SELECT ln FROM dup)), "
            "rw AS (SELECT g.doc_id, COALESCE(k.text, '') AS text FROM gd g "
            "LEFT JOIN (SELECT doc_id, string_agg(ln, ' ' ORDER BY idx) AS text "
            "FROM kept GROUP BY doc_id) k USING (doc_id)), "
            "toks2 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM rw), "
            "grams2 AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks2 WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams2 GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams2 a JOIN grams2 b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
            "p AS (SELECT doc_a, doc_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
            "edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p), "
            "reach(n, m) AS (SELECT a, a FROM edges UNION "
            "SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m), "
            "comp AS (SELECT n AS node, MIN(m) AS comp FROM reach GROUP BY n), "
            "surv AS (SELECT rw.doc_id, "
            "CAST(len(list_filter(string_split(rw.text, ' '), x -> x <> '')) AS BIGINT) AS n_tok "
            "FROM rw WHERE rw.doc_id NOT IN (SELECT node FROM comp WHERE node <> comp)), "
            "s0 AS (SELECT doc_id, n_tok, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM surv), "
            "x1 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) "
            "% 1000 AS BIGINT) AS bucket FROM s2) "
            "SELECT CASE WHEN bucket < 50 THEN 'test' WHEN bucket < 100 THEN 'val' "
            "ELSE 'train' END AS split, COUNT(*) AS n_docs, "
            "CAST(SUM(n_tok) AS BIGINT) AS total_tok "
            "FROM s3 GROUP BY 1 ORDER BY split"
        ),
        # Welch t per group between time halves: exact integer moments
        # from 1e-3-quantized values, one fixed-shape float chain both
        # sides, t quantized at 1e-6; groups needing variance (n >= 2
        # per half) only
        "events_welch_t": (
            "WITH mm AS (SELECT MIN(epoch_us(ts)) AS lo, "
            "MAX(epoch_us(ts)) AS hi FROM events), "
            "d AS (SELECT event_type, "
            "CAST(TRUNC(value * 1000 + 0.5 * SIGN(value)) AS BIGINT) AS q, "
            "CASE WHEN epoch_us(ts) < mm.lo + (mm.hi - mm.lo) // 2 "
            "THEN 1 ELSE 2 END AS half FROM events, mm "
            "WHERE value IS NOT NULL), "
            "m AS (SELECT event_type, "
            "SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1, "
            "SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS n2, "
            "SUM(CASE WHEN half = 1 THEN q ELSE 0 END) AS s1, "
            "SUM(CASE WHEN half = 2 THEN q ELSE 0 END) AS s2, "
            "SUM(CASE WHEN half = 1 THEN q * q ELSE 0 END) AS ss1, "
            "SUM(CASE WHEN half = 2 THEN q * q ELSE 0 END) AS ss2 "
            "FROM d GROUP BY event_type), "
            "v AS (SELECT event_type, n1, n2, "
            "(CAST(ss1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n1) * CAST(s1 AS DOUBLE)) / (n1 - 1) AS va, "
            "(CAST(ss2 AS DOUBLE) - (CAST(s2 AS DOUBLE) / n2) * CAST(s2 AS DOUBLE)) / (n2 - 1) AS vb, "
            "CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2 AS md "
            "FROM m WHERE n1 >= 2 AND n2 >= 2) "
            "SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
            "CAST(TRUNC(md / sqrt(va / n1 + vb / n2) * 1000000 "
            "+ 0.5 * SIGN(md / sqrt(va / n1 + vb / n2))) AS BIGINT) AS t_q "
            "FROM v ORDER BY event_type"
        ),
        # per-user OLS trend: integer hour offsets + 1e-3-quantized
        # values -> five exact HUGEINT moments; one float ratio
        # quantized at 1e-6; zero-variance / n<2 groups dropped
        # Markov stationary distribution via chained power-iteration
        # CTEs with per-term 1e-12 integer quantization
        "events_type_markov": _markov_oracle(iters=12),
        # personalized PageRank from the 5 lowest dup-graph node ids
        # (recursive-CTE power iteration, 6 dp)
        "doc_graph_ppr": _ppr_oracle(iters=10, n_seeds=5),
        # Benford audit: digit = first char of the exact cents integer
        # (engine uses exact integer magnitude — identical); expected
        # and (O-E)^2/E quantized 1e-6 from the same expression
        "orders_benford": (
            "WITH c AS (SELECT CAST(TRUNC(o_totalprice*100 + 0.5) AS BIGINT) AS cents "
            "FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0), "
            "d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) "
            "AS digit FROM c WHERE cents > 0), "
            "o AS (SELECT digit, count(*) AS n FROM d GROUP BY digit), "
            "nn AS (SELECT count(*) AS n FROM d), "
            "dig AS (SELECT unnest(range(1, 10)) AS digit) "
            "SELECT dig.digit, CAST(COALESCE(o.n, 0) AS BIGINT) AS n, "
            "CAST(TRUNC(((SELECT n FROM nn) * log10(1.0 + 1.0/dig.digit)) * 1e6 + 0.5) "
            "AS BIGINT)/1e6 AS expected, "
            "CAST(TRUNC(((COALESCE(o.n, 0) - (SELECT n FROM nn) * log10(1.0 + 1.0/dig.digit)) "
            "* (COALESCE(o.n, 0) - (SELECT n FROM nn) * log10(1.0 + 1.0/dig.digit)) "
            "/ ((SELECT n FROM nn) * log10(1.0 + 1.0/dig.digit))) * 1e6 + 0.5) "
            "AS BIGINT)/1e6 AS dev "
            "FROM dig LEFT JOIN o USING (digit) ORDER BY dig.digit"
        ),
        # RFM quartile coding: per-customer (recency days vs global
        # max, order count, exact cents), quartile boundaries via
        # quantile_disc (ceil(qn)-1), score = 1 + sum of >= indicators,
        # segment = 100r + 10f + m; monetary is the exact cents sum / 100
        "customer_rfm": (
            "WITH gm AS (SELECT MAX(epoch_us(o_orderdate)) AS g FROM orders), "
            "pc AS (SELECT o_custkey, "
            "((SELECT g FROM gm) - MAX(epoch_us(o_orderdate))) // 86400000000 AS r, "
            "COUNT(*) AS f, "
            "SUM(CAST(TRUNC(o_totalprice*100 + 0.5) AS BIGINT)) AS m "
            "FROM orders GROUP BY o_custkey), "
            "qb AS (SELECT "
            "quantile_disc(r, 0.25) AS r1, quantile_disc(r, 0.5) AS r2, "
            "quantile_disc(r, 0.75) AS r3, "
            "quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2, "
            "quantile_disc(f, 0.75) AS f3, "
            "quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2, "
            "quantile_disc(m, 0.75) AS m3 FROM pc), "
            "sc AS (SELECT o_custkey, m, "
            "100*(1 + CAST(r >= r1 AS INT) + CAST(r >= r2 AS INT) + CAST(r >= r3 AS INT)) "
            "+ 10*(1 + CAST(f >= f1 AS INT) + CAST(f >= f2 AS INT) + CAST(f >= f3 AS INT)) "
            "+ (1 + CAST(m >= m1 AS INT) + CAST(m >= m2 AS INT) + CAST(m >= m3 AS INT)) "
            "AS segment FROM pc, qb) "
            "SELECT CAST(segment AS BIGINT) AS segment, "
            "CAST(COUNT(*) AS BIGINT) AS n_customers, "
            "SUM(m)/100.0 AS monetary_total FROM sc "
            "GROUP BY segment ORDER BY segment"
        ),
        # global exact decile buckets over quantized values: bucket =
        # sum of nine integer >= indicators against quantile_disc
        # boundaries (ceil(qn)-1 order statistics, engine-mirrored)
        "events_decile_profile": (
            "WITH v AS (SELECT event_type, "
            "CAST(TRUNC(value*1000 + 0.5*SIGN(value)) AS BIGINT) AS xm "
            "FROM events WHERE value IS NOT NULL), "
            "b AS (SELECT "
            + ", ".join(f"quantile_disc(xm, 0.{k}) AS q{k}" for k in range(1, 10))
            + " FROM v), "
            "x AS (SELECT event_type, ("
            + " + ".join(f"CAST(xm >= q{k} AS INT)" for k in range(1, 10))
            + ") AS bucket FROM v, b) "
            "SELECT event_type, CAST(bucket AS BIGINT) AS bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM x "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # one-sided CUSUM by the prefix identity (cumsum + running
        # min are pure window algebra); C_t = N*cx - t*S - t*N*250,
        # alert when s_t > 2000*N, smax = s_max/(1000*N) at 1e-6 —
        # integer-exact up to the single mirrored float step
        "events_cusum_alerts": (
            "WITH v AS (SELECT user_id, ts, event_id, "
            "CAST(TRUNC(value*1000 + 0.5*SIGN(value)) AS BIGINT) AS xm "
            "FROM events WHERE value IS NOT NULL), "
            "tot AS (SELECT COUNT(*) AS n, SUM(xm) AS s FROM v), "
            "seq AS (SELECT user_id, row_number() OVER w AS t, "
            "SUM(xm) OVER w AS cx FROM v "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
            "c AS (SELECT user_id, t, (SELECT n FROM tot)*cx "
            "- t*(SELECT s FROM tot) - t*(SELECT n FROM tot)*250 AS ct FROM seq), "
            "s AS (SELECT user_id, t, ct - LEAST(0, MIN(ct) OVER "
            "(PARTITION BY user_id ORDER BY t)) AS st FROM c), "
            "agg AS (SELECT user_id, MAX(t) AS n_events, "
            "COALESCE(MIN(CASE WHEN st > 2000*(SELECT n FROM tot) THEN t END), 0) "
            "AS first_alert, MAX(st) AS smax_i FROM s GROUP BY user_id) "
            "SELECT user_id, CAST(n_events AS BIGINT) AS n_events, "
            "CAST(first_alert AS BIGINT) AS first_alert, "
            "CAST(TRUNC((CAST(smax_i AS DOUBLE) / "
            "(1000.0 * (SELECT n FROM tot))) * 1e6 + 0.5) AS BIGINT)/1e6 AS smax "
            "FROM agg ORDER BY user_id"
        ),
        "events_user_trend": (
            "WITH mm AS (SELECT MIN(epoch_us(ts)) AS lo FROM events), "
            "d AS (SELECT user_id, "
            "(epoch_us(ts) - mm.lo) // 3600000000 AS t, "
            "CAST(TRUNC(value * 1000 + 0.5 * SIGN(value)) AS BIGINT) AS v "
            "FROM events, mm WHERE value IS NOT NULL), "
            "m AS (SELECT user_id, COUNT(*) AS n, SUM(t) AS st, "
            "SUM(v) AS sv, SUM(t * v) AS stv, SUM(t * t) AS stt "
            "FROM d GROUP BY user_id), "
            "f AS (SELECT user_id, n, "
            "CAST(n * stv - st * sv AS DOUBLE) / CAST(n * stt - st * st AS DOUBLE) AS slope "
            "FROM m WHERE n >= 2 AND n * stt - st * st <> 0) "
            "SELECT user_id, CAST(n AS BIGINT) AS n, "
            "CAST(TRUNC(slope * 1000000 + 0.5 * SIGN(slope)) AS BIGINT) AS slope_q "
            "FROM f ORDER BY user_id"
        ),
        # debounce: LAG over (user, type) ordered by (epoch_us, event_id);
        # keep first-of-key (gap_us = -1) and gaps >= 60 s
        "events_debounce": (
            "WITH w AS (SELECT event_id, epoch_us(ts) AS tus, "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type "
            "ORDER BY epoch_us(ts), event_id) AS prev FROM events) "
            "SELECT event_id, COALESCE(tus - prev, -1) AS gap_us FROM w "
            "WHERE prev IS NULL OR tus - prev >= 60000000 ORDER BY event_id"
        ),
        # Flesch-Kincaid per source: fixed-shape float expression (one
        # IEEE op per operand both sides), per-doc 1e-6 quantization,
        # exact integer sums; syllables = [aeiouy]+ runs (min 1),
        # sentences = [.!?]+ runs (min 1)
        "readability_by_source": (
            "WITH t AS (SELECT source, text, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents), "
            "f AS (SELECT source, CAST(len(w) AS BIGINT) AS W, "
            "GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS S, "
            "list_sum(list_transform(w, x -> "
            "GREATEST(len(regexp_extract_all(lower(x), '[aeiouy]+')), 1))) AS SY "
            "FROM t WHERE len(w) > 0), "
            "q AS (SELECT source, 0.39 * (CAST(W AS DOUBLE) / S) "
            "+ 11.8 * (CAST(SY AS DOUBLE) / W) - 15.59 AS g FROM f), "
            "z AS (SELECT source, CAST(TRUNC(g * 1000000 + 0.5 * SIGN(g)) "
            "AS BIGINT) AS fk_q FROM q) "
            "SELECT source, COUNT(*) AS n_docs, "
            "CAST(SUM(fk_q) AS BIGINT) AS fk_q_sum, "
            "CAST(SUM(fk_q) AS DOUBLE) / COUNT(*) / 1000000.0 AS avg_fk "
            "FROM z GROUP BY source ORDER BY source"
        ),
        # partition-pruned inverted-index BM25 lookup: same quantized
        # Okapi scoring as bm25_search (pytest-pinned bit-identical), so
        # the same SQL template is the oracle
        "inverted_index_search": _bm25_oracle(
            ["stream batch vector", "customer order line"], topk=10
        ),
        # time-decayed per-user activity: 0.5^age_days is an exact power
        # of two (value*2^-d shifts the exponent only), so the single
        # rounding is the 1e-6 quantization -> exact int sums both sides
        "events_decayed_activity": (
            "WITH mx AS (SELECT MAX(epoch_us(ts)) AS tm FROM events), "
            "d AS (SELECT user_id, value, "
            "(mx.tm - epoch_us(ts)) // 86400000000 AS age "
            "FROM events, mx WHERE value IS NOT NULL), "
            "q AS (SELECT user_id, CAST(ROUND(value * pow(0.5, age) "
            "* 1000000.0) AS BIGINT) AS qv FROM d) "
            "SELECT user_id, CAST(SUM(qv) AS BIGINT) AS score_q, "
            "COUNT(*) AS n_events FROM q GROUP BY user_id "
            "ORDER BY score_q DESC, user_id LIMIT 100"
        ),
        # k-anonymity audit: quasi-identifier tuples with < 5 members;
        # hour from integer epoch-us division, bucket floor() exact
        "k_anonymity_audit": (
            "SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(FLOOR(value / 10.0) AS BIGINT) AS vbin, COUNT(*) AS n "
            "FROM events WHERE value IS NOT NULL "
            "GROUP BY 1, 2, 3 HAVING COUNT(*) < 5 "
            "ORDER BY event_type, hour, vbin"
        ),
        # PSI drift: integer-us midpoint split, Laplace-smoothed rates,
        # contribution quantized at 1e-9 (same fixed-shape float chain +
        # libm ln both sides)
        "events_value_psi": (
            "WITH mm AS (SELECT MIN(epoch_us(ts)) AS lo, "
            "MAX(epoch_us(ts)) AS hi FROM events), "
            "d AS (SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS vbin, "
            "CASE WHEN epoch_us(ts) < mm.lo + (mm.hi - mm.lo) // 2 "
            "THEN 1 ELSE 2 END AS half FROM events, mm "
            "WHERE value IS NOT NULL), "
            "c AS (SELECT vbin, SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1, "
            "SUM(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS n2 FROM d GROUP BY 1), "
            "tot AS (SELECT SUM(n1) AS t1, SUM(n2) AS t2, COUNT(*) AS b FROM c) "
            "SELECT vbin, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
            "CAST(ROUND(((n2 + 1.0) / (t2 + b) - (n1 + 1.0) / (t1 + b)) "
            "* ln(((n2 + 1.0) / (t2 + b)) / ((n1 + 1.0) / (t1 + b))) "
            "* 1000000000.0) AS BIGINT) AS contrib_q "
            "FROM c, tot ORDER BY vbin"
        ),
        # rendezvous sharding: h = splitmix64(doc_id*16+shard) via the
        # shared mulmod chain; winner = max h, tie to lowest shard
        "rendezvous_shards": (
            "WITH sh AS (SELECT CAST(range AS BIGINT) AS shard FROM range(9)), "
            "p AS (SELECT d.doc_id, sh.shard FROM documents d CROSS JOIN sh), "
            + _splitmix_chain(
                "doc_id, shard", "CAST(doc_id * 16 + shard AS HUGEINT)", "p"
            )
            + ", b AS (SELECT doc_id, shard AS sb FROM (SELECT doc_id, shard, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, shard) AS rn "
            "FROM s3 WHERE shard < 8) WHERE rn = 1), "
            "af AS (SELECT doc_id, shard AS sa FROM (SELECT doc_id, shard, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, shard) AS rn "
            "FROM s3) WHERE rn = 1) "
            "SELECT b.sb AS shard, COUNT(*) AS n_docs, "
            "CAST(SUM(CASE WHEN af.sa <> b.sb THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_moved FROM b JOIN af USING (doc_id) "
            "GROUP BY 1 ORDER BY shard"
        ),
        # exact per-group median absolute deviation (two quantile_disc
        # passes; element picks -> bit-identical doubles)
        "events_value_mad": (
            "WITH m AS (SELECT event_type, quantile_disc(value, 0.5) AS median "
            "FROM events GROUP BY 1), "
            "d AS (SELECT e.event_type, abs(e.value - m.median) AS a "
            "FROM events e JOIN m USING (event_type)) "
            "SELECT m.event_type, m.median, quantile_disc(d.a, 0.5) AS mad "
            "FROM d JOIN m USING (event_type) "
            "GROUP BY m.event_type, m.median ORDER BY m.event_type"
        ),
        # grouped z-score outliers (population std; identical double
        # expression order both sides, zscore rounded at 6dp)
        "events_anomalies": (
            "WITH s AS (SELECT event_type, count(*) AS n, SUM(value) AS sv, "
            "SUM(value * value) AS sv2 FROM events GROUP BY 1), "
            "st AS (SELECT event_type, sv / n AS mu, "
            "sqrt(sv2 / n - (sv / n) * (sv / n)) AS sd FROM s) "
            "SELECT event_id, e.event_type, value, "
            "ROUND((value - st.mu) / st.sd, 6) AS zscore "
            "FROM events e JOIN st ON e.event_type = st.event_type "
            "WHERE value > st.mu + 3.0 * st.sd ORDER BY event_id"
        ),
        # sequential conversion funnel: stage i completes strictly after
        # the user's first completion of stage i-1
        "events_funnel": (
            "WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY 1), "
            "s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t "
            "WHERE e.event_type = 'click' GROUP BY 1), "
            "s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t "
            "WHERE e.event_type = 'purchase' GROUP BY 1) "
            "SELECT 0 AS stage_idx, 'view' AS stage, COUNT(*) AS n_users FROM s0 "
            "UNION ALL SELECT 1, 'click', COUNT(*) FROM s1 "
            "UNION ALL SELECT 2, 'purchase', COUNT(*) FROM s2 ORDER BY stage_idx"
        ),
        # bloom-prefiltered shuffle join == plain inner join
        "bloom_join_filtered_orders": (
            "SELECT o_orderkey, o_custkey, c_name, o_totalprice "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "WHERE c_custkey <= 100 ORDER BY o_orderkey"
        ),
        # TextRank keywords: 10-iteration PageRank (d=0.85) over the
        # undirected distinct adjacent-word graph, no self-loops;
        # recursive-CTE power iteration, rank rounded at 6dp
        "textrank": (
            "WITH RECURSIVE toks AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "p0 AS (SELECT unnest(list_transform(range(1, len(w)), "
            "i -> w[i] || chr(31) || w[i+1])) AS pg FROM toks WHERE len(w) >= 2), "
            "e1 AS (SELECT DISTINCT string_split(pg, chr(31))[1] AS a, "
            "string_split(pg, chr(31))[2] AS b FROM p0), "
            # NOTE: inside WITH RECURSIVE, DuckDB parses a CTE whose top
            # level is a UNION as a recursive definition (the UNION no
            # longer dedups); keep the union one level down
            "e AS (SELECT DISTINCT a, b FROM (SELECT a, b FROM e1 WHERE a <> b "
            "UNION ALL SELECT b, a FROM e1 WHERE a <> b)), "
            "nodes AS (SELECT DISTINCT a AS nd FROM e), "
            "nn AS (SELECT CAST(count(*) AS DOUBLE) AS N FROM nodes), "
            "deg AS (SELECT a, count(*) AS d FROM e GROUP BY a), "
            "pr(iter, node, r) AS ("
            "SELECT 0, nd, 1.0 / nn.N FROM nodes CROSS JOIN nn "
            "UNION ALL "
            "SELECT iter + 1, e.b, 0.15 / nn.N + 0.85 * SUM(pr.r / deg.d) "
            "FROM pr JOIN e ON e.a = pr.node JOIN deg ON deg.a = e.a CROSS JOIN nn "
            "WHERE iter < 10 GROUP BY iter + 1, e.b, nn.N) "
            "SELECT node AS tok, ROUND(r, 6) AS rank FROM pr WHERE iter = 10 "
            "ORDER BY ROUND(r, 6) DESC, tok LIMIT 20"
        ),
        # per-source vocabulary KL divergence from the corpus unigram
        # distribution (no smoothing needed: p_s>0 implies q>0); same
        # per-term double expression both sides, rounded at 6dp
        "source_kl": (
            "WITH toks AS (SELECT source, unnest(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS tok FROM documents), "
            "st AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2), "
            "ns AS (SELECT source, SUM(c) AS n FROM st GROUP BY 1), "
            "ct AS (SELECT tok, SUM(c) AS c2 FROM st GROUP BY 1), "
            "nn AS (SELECT CAST(SUM(c) AS DOUBLE) AS N FROM st) "
            "SELECT st.source, CAST(ns.n AS BIGINT) AS n_tok, "
            "ROUND(SUM((st.c / CAST(ns.n AS DOUBLE)) * "
            "ln((st.c / CAST(ns.n AS DOUBLE)) / (ct.c2 / nn.N))), 6) AS kl "
            "FROM st JOIN ns USING (source) JOIN ct USING (tok) CROSS JOIN nn "
            "GROUP BY st.source, ns.n ORDER BY st.source"
        ),
        # incremental dedup: new-batch (src0) docs whose text is absent
        # from the rest of the corpus (Bloom prune + exact hash verify
        # on the Ray side = plain NOT EXISTS on text here)
        "bloom_new_docs": (
            "SELECT doc_id FROM documents a WHERE source = 'src0' "
            "AND NOT EXISTS (SELECT 1 FROM documents b "
            "WHERE b.source <> 'src0' AND b.text = a.text) ORDER BY doc_id"
        ),
        # top word-bigram collocations by PMI (rounded-6dp rank,
        # lexicographic tiebreak; identical double-math order)
        # Dunning G^2 collocations: 2x2 contingency over the N-bigram
        # universe with unigram marginals; O<=0 or E<=0 terms exactly 0
        # (degenerate marginal c2 > N guarded identically both sides); fixed
        # t11+t12+t21+t22 summation order mirrored from the engine
        "top_g2_bigrams": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "nn AS (SELECT CAST(SUM(CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END) AS DOUBLE) AS N FROM toks), "
            "uc AS (SELECT t, count(*) AS c FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t), "
            "bc AS (SELECT bg, count(*) AS c12 FROM ("
            "SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || chr(31) || w[i+1])) AS bg "
            "FROM toks WHERE len(w) >= 2) GROUP BY bg), "
            "sp AS (SELECT string_split(bg, chr(31))[1] AS w1, "
            "string_split(bg, chr(31))[2] AS w2, c12 FROM bc), "
            "p AS (SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, "
            "ROUND(2.0 * ("
            "(CASE WHEN c12 > 0 AND u1.c * u2.c / nn.N > 0 THEN c12 * ln(c12 / (u1.c * u2.c / nn.N)) ELSE 0.0 END) "
            "+ (CASE WHEN u1.c - c12 > 0 AND u1.c * (nn.N - u2.c) / nn.N > 0 THEN (u1.c - c12) * ln((u1.c - c12) / (u1.c * (nn.N - u2.c) / nn.N)) ELSE 0.0 END) "
            "+ (CASE WHEN u2.c - c12 > 0 AND (nn.N - u1.c) * u2.c / nn.N > 0 THEN (u2.c - c12) * ln((u2.c - c12) / ((nn.N - u1.c) * u2.c / nn.N)) ELSE 0.0 END) "
            "+ (CASE WHEN nn.N - u1.c - u2.c + c12 > 0 AND (nn.N - u1.c) * (nn.N - u2.c) / nn.N > 0 THEN (nn.N - u1.c - u2.c + c12) * ln((nn.N - u1.c - u2.c + c12) / ((nn.N - u1.c) * (nn.N - u2.c) / nn.N)) ELSE 0.0 END)"
            "), 6) AS g2 "
            "FROM sp JOIN uc u1 ON u1.t = sp.w1 JOIN uc u2 ON u2.t = sp.w2 "
            "CROSS JOIN nn WHERE c12 >= 5) "
            "SELECT w1, w2, c12, g2 FROM p ORDER BY g2 DESC, w1, w2 LIMIT 20"
        ),
        "top_pmi_bigrams": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "mm AS (SELECT CAST(SUM(len(w)) AS DOUBLE) AS M FROM toks), "
            "nn AS (SELECT CAST(SUM(CASE WHEN len(w) >= 2 THEN len(w) - 1 ELSE 0 END) AS DOUBLE) AS N FROM toks), "
            "uc AS (SELECT t, count(*) AS c FROM (SELECT unnest(w) AS t FROM toks) GROUP BY t), "
            "bc AS (SELECT bg, count(*) AS c12 FROM ("
            "SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || chr(31) || w[i+1])) AS bg "
            "FROM toks WHERE len(w) >= 2) GROUP BY bg), "
            "sp AS (SELECT string_split(bg, chr(31))[1] AS w1, "
            "string_split(bg, chr(31))[2] AS w2, c12 FROM bc), "
            "p AS (SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, "
            "ROUND(ln(CAST(c12 AS DOUBLE) * mm.M * mm.M / (nn.N * u1.c * u2.c)), 6) AS pmi "
            "FROM sp JOIN uc u1 ON u1.t = sp.w1 JOIN uc u2 ON u2.t = sp.w2 "
            "CROSS JOIN mm CROSS JOIN nn WHERE c12 >= 5) "
            "SELECT w1, w2, c12, pmi FROM p ORDER BY pmi DESC, w1, w2 LIMIT 20"
        ),
        # per-label embedding centroid, long form (1-based dim index);
        # f32 values averaged in double on both sides
        "label_centroids": (
            "SELECT label, i, AVG(embedding[CAST(i AS INT)]) AS c "
            "FROM embeddings CROSS JOIN range(1, 65) t(i) "
            "GROUP BY label, i ORDER BY label, i"
        ),
        # self-trained byte/char-bigram LM perplexity per doc (add-one
        # smoothing over the observed alphabet; p = (C2+1)/(C1+V));
        # double math both sides, compare layer rounds to 6dp
        "lm_perplexity": (
            "WITH big AS (SELECT doc_id, unnest(list_transform(range(1, len(text)), "
            "i -> substr(text, CAST(i AS INT), 2))) AS b FROM documents WHERE len(text) >= 2), "
            "c2 AS (SELECT b, count(*) AS c FROM big GROUP BY b), "
            "c1 AS (SELECT substr(b, 1, 1) AS c1ch, SUM(c) AS n FROM c2 GROUP BY 1), "
            "v AS (SELECT count(DISTINCT u) AS V FROM "
            "(SELECT unnest(string_split(text, '')) AS u FROM documents)), "
            "sc AS (SELECT g.doc_id, count(*) AS m, "
            "-avg(ln((c2.c + 1.0) / (c1.n + v.V))) AS nll "
            "FROM big g JOIN c2 ON g.b = c2.b "
            "JOIN c1 ON substr(g.b, 1, 1) = c1.c1ch CROSS JOIN v GROUP BY g.doc_id) "
            "SELECT doc_id, CAST(m AS BIGINT) AS n_bigrams, exp(nll) AS ppl "
            "FROM sc ORDER BY doc_id"
        ),
        # word-trigram LM, add-one smoothing: C2 = context occurrences
        # AS TRIGRAM PREFIX (not raw bigram count), V = distinct words
        "lm_trigram_ppl": (
            "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM documents), "
            "occ AS (SELECT doc_id, "
            "w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri, "
            "w[i] || ' ' || w[i+1] AS ctx "
            "FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i "
            "FROM w WHERE len(w) >= 3)), "
            "c3 AS (SELECT tri, count(*) AS c3 FROM occ GROUP BY tri), "
            "c2 AS (SELECT ctx, count(*) AS c2 FROM occ GROUP BY ctx), "
            "v AS (SELECT count(DISTINCT tok) AS V FROM "
            "(SELECT unnest(w) AS tok FROM w)), "
            "sc AS (SELECT o.doc_id, count(*) AS m, "
            "-avg(ln((c3.c3 + 1.0) / (c2.c2 + v.V))) AS nll "
            "FROM occ o JOIN c3 USING (tri) JOIN c2 USING (ctx) "
            "CROSS JOIN v GROUP BY o.doc_id) "
            "SELECT doc_id, CAST(m AS BIGINT) AS n_trigrams, "
            "round(exp(nll), 6) AS ppl FROM sc ORDER BY doc_id"
        ),
        # template-prefix stripping over the derived headered corpus:
        # modal (source, L, prefix) counts, longest qualifying L with
        # (n DESC, pfx ASC) tie-break, token-boundary strip
        "strip_boilerplate": (
            "WITH base AS (SELECT doc_id, source, "
            "CASE WHEN doc_id % 2 = 0 THEN 'hdr ' || source || ' sep ' || text "
            "ELSE text END AS text FROM documents), "
            "w AS (SELECT doc_id, source, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM base), "
            "nd AS (SELECT source, count(*) AS nd FROM base GROUP BY 1), "
            "pfx AS (SELECT source, L, array_to_string(w[1:L], ' ') AS pfx "
            "FROM (SELECT source, w, unnest(range(1, LEAST(len(w), 16) + 1)) AS L "
            "FROM w)), "
            "cand AS (SELECT source, L, pfx, count(*) AS n FROM pfx GROUP BY 1, 2, 3), "
            "qual AS (SELECT c.source, L, pfx, n FROM cand c JOIN nd USING (source) "
            "WHERE n >= CEIL(0.3 * nd)), "
            "best AS (SELECT source, L, pfx, ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY L DESC, n DESC, pfx) AS rk FROM qual), "
            "tpl AS (SELECT source, L AS tpl_len, pfx AS template FROM best WHERE rk = 1) "
            "SELECT ww.doc_id, ww.source, "
            "(t.template IS NOT NULL AND len(ww.w) >= t.tpl_len "
            "AND array_to_string(ww.w[1:t.tpl_len], ' ') = t.template) AS stripped, "
            "CASE WHEN t.template IS NOT NULL AND len(ww.w) >= t.tpl_len "
            "AND array_to_string(ww.w[1:t.tpl_len], ' ') = t.template "
            "THEN array_to_string(ww.w[t.tpl_len + 1:], ' ') "
            "ELSE array_to_string(ww.w, ' ') END AS text "
            "FROM w ww LEFT JOIN tpl t ON t.source = ww.source "
            "ORDER BY ww.doc_id"
        ),
        # PII scrub: same planted derivation, sequential RE2
        # replace (DuckDB regex is RE2 too) with counts taken on the
        # intermediate each pattern actually sees
        "pii_redaction": (
            "WITH planted AS (SELECT doc_id, text "
            "|| CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id "
            "|| '@example.com' ELSE '' END "
            "|| CASE WHEN doc_id % 5 = 0 THEN ' call 555-010-' "
            "|| (doc_id % 9000 + 1000) ELSE '' END "
            "|| CASE WHEN doc_id % 7 = 0 THEN ' node 10.' || (doc_id % 200) "
            "|| '.0.' || (doc_id % 250) ELSE '' END AS t0 FROM documents), "
            "s1 AS (SELECT doc_id, "
            "len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email, "
            "regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 "
            "FROM planted), "
            "s2 AS (SELECT doc_id, n_email, "
            "len(regexp_extract_all(t1, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS n_phone, "
            "regexp_replace(t1, '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g') AS t2 "
            "FROM s1), "
            "s3 AS (SELECT doc_id, n_email, n_phone, "
            "len(regexp_extract_all(t2, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ipv4, "
            "regexp_replace(t2, '\\b(\\d{1,3}\\.){3}\\d{1,3}\\b', '<IPV4>', 'g') AS t3 "
            "FROM s2) "
            "SELECT doc_id, t3 AS text, n_email, n_phone, n_ipv4 "
            "FROM s3 ORDER BY doc_id"
        ),
        # provenance matrix: the ngram_jaccard pair CTE + source
        # joins + quantized-int mean per normalized source pair
        "dedup_provenance": (
            "WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id "
            "GROUP BY 1, 2), "
            "pairs AS (SELECT doc_a, doc_b, "
            "CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = doc_a "
            "JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
            "tagged AS (SELECT LEAST(da.source, db.source) AS source_a, "
            "GREATEST(da.source, db.source) AS source_b, "
            "CAST(TRUNC(jaccard * 1000000 + 0.5) AS BIGINT) AS jq "
            "FROM pairs JOIN documents da ON da.doc_id = doc_a "
            "JOIN documents db ON db.doc_id = doc_b) "
            "SELECT source_a, source_b, count(*) AS n_pairs, "
            "SUM(jq) / count(*) / 1000000.0 AS mean_jaccard "
            "FROM tagged GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # snake shards: ROW_NUMBER rank + the boustrophedon fold
        "snake_shard_plan": (
            "WITH n AS (SELECT doc_id, len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) AS n_tok FROM documents), "
            "r AS (SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, "
            "ROW_NUMBER() OVER (ORDER BY n_tok DESC, doc_id) - 1 AS rank FROM n) "
            "SELECT doc_id, n_tok, rank, "
            "CASE WHEN rank % 16 < 8 THEN rank % 16 "
            "ELSE 15 - (rank % 16) END AS shard "
            "FROM r ORDER BY doc_id"
        ),
        # CCNet buckets: the lm_perplexity chain + per-lang
        # quantile_disc terciles + the same <= bucket rule
        "ccnet_ppl_buckets": (
            "WITH big AS (SELECT doc_id, unnest(list_transform(range(1, len(text)), "
            "i -> substr(text, CAST(i AS INT), 2))) AS b FROM documents WHERE len(text) >= 2), "
            "c2 AS (SELECT b, count(*) AS c FROM big GROUP BY b), "
            "c1 AS (SELECT substr(b, 1, 1) AS c1ch, SUM(c) AS n FROM c2 GROUP BY 1), "
            "v AS (SELECT count(DISTINCT u) AS V FROM "
            "(SELECT unnest(string_split(text, '')) AS u FROM documents)), "
            "sc AS (SELECT g.doc_id, -avg(ln((c2.c + 1.0) / (c1.n + v.V))) AS nll "
            "FROM big g JOIN c2 ON g.b = c2.b "
            "JOIN c1 ON substr(g.b, 1, 1) = c1.c1ch CROSS JOIN v GROUP BY g.doc_id), "
            "pl AS (SELECT sc.doc_id, d.lang, "
            "CAST(TRUNC(exp(nll) * 1000000 + 0.5) AS BIGINT) AS q "
            "FROM sc JOIN documents d USING (doc_id)), "
            "th AS (SELECT lang, quantile_disc(q, 1.0/3) AS t1, "
            "quantile_disc(q, 2.0/3) AS t2 FROM pl GROUP BY 1) "
            "SELECT pl.doc_id, pl.lang, pl.q / 1000000.0 AS ppl, "
            "CASE WHEN q <= t1 THEN 'head' WHEN q <= t2 THEN 'middle' "
            "ELSE 'tail' END AS bucket "
            "FROM pl JOIN th USING (lang) ORDER BY pl.doc_id"
        ),
        # Zipf fit: exact counts -> ROW_NUMBER ranks -> the same
        # closed-form OLS sums (ln rank vs ln freq)
        "zipf_by_source": (
            "WITH tok AS (SELECT source, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS tok FROM documents), "
            "cnt AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2), "
            "rk AS (SELECT source, c, ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY c DESC, tok) AS r FROM cnt), "
            "s AS (SELECT source, count(*) AS n, SUM(c) AS n_tokens, "
            "SUM(ln(r)) AS sx, SUM(ln(c)) AS sy, SUM(ln(r) * ln(r)) AS sxx, "
            "SUM(ln(c) * ln(c)) AS syy, SUM(ln(r) * ln(c)) AS sxy "
            "FROM rk GROUP BY 1) "
            "SELECT source AS \"group\", CAST(n AS BIGINT) AS n_types, "
            "CAST(n_tokens AS BIGINT) AS n_tokens, "
            "CASE WHEN n >= 2 THEN -((n * sxy - sx * sy) / (n * sxx - sx * sx)) "
            "END AS zipf_alpha, "
            "CASE WHEN n < 2 THEN NULL WHEN (n * syy - sy * sy) > 0 THEN "
            "POWER(n * sxy - sx * sy, 2) "
            "/ ((n * sxx - sx * sx) * (n * syy - sy * sy)) ELSE 1.0 END AS zipf_r2 "
            "FROM s ORDER BY 1"
        ),
        # DSIR: full re-derivation — word bigrams, md5_number_lower %
        # 1024 buckets (== the engine's little-endian lower-8-byte md5),
        # add-one smoothed target/raw log-ratio, per-doc weighted sum
        "dsir_scores": (
            "WITH w AS (SELECT doc_id, source, "
            "list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, source, w[i] || ' ' || w[i+1] AS g "
            "FROM (SELECT doc_id, source, w, unnest(range(1, len(w))) AS i FROM w)), "
            "b AS (SELECT doc_id, source, "
            "CAST(md5_number_lower(g) % 1024 AS BIGINT) AS b FROM g), "
            "hist AS (SELECT b, count(*) AS c_raw, "
            "count(*) FILTER (WHERE source = 'src1') AS c_tgt FROM b GROUP BY 1), "
            "tot AS (SELECT sum(c_raw) AS t_raw, sum(c_tgt) AS t_tgt FROM hist), "
            "lam AS (SELECT b, ln((c_tgt + 1.0) / (t_tgt + 1024)) "
            "- ln((c_raw + 1.0) / (t_raw + 1024)) AS lam FROM hist, tot), "
            "docb AS (SELECT doc_id, b, count(*) AS c FROM b GROUP BY 1, 2), "
            "sc AS (SELECT doc_id, SUM(c * lam) AS s FROM docb "
            "JOIN lam USING (b) GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(sc.s, 0.0) AS dsir_score "
            "FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY d.doc_id"
        ),
        # semantic split leakage: splitmix bucket splits on vec_id +
        # pairwise double-cast cosine, cross-split pairs only
        "split_leakage_embedding": (
            "WITH ids AS (SELECT DISTINCT vec_id FROM embeddings), "
            "s0 AS (SELECT vec_id, (CAST(vec_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM ids), "
            "x1 AS (SELECT vec_id, CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT vec_id, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT vec_id, CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT vec_id, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "sp AS (SELECT vec_id, CASE WHEN h % 1000 < 50 THEN 'test' "
            "WHEN h % 1000 < 100 THEN 'val' ELSE 'train' END AS split "
            "FROM (SELECT vec_id, xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 31) AS h FROM s2)), "
            "v AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS e FROM embeddings), "
            "p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine "
            "FROM v a JOIN v b ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4) "
            "SELECT vec_a, vec_b, sa.split AS split_a, sb.split AS split_b, cosine "
            "FROM p JOIN sp sa ON sa.vec_id = vec_a "
            "JOIN sp sb ON sb.vec_id = vec_b "
            "WHERE sa.split <> sb.split ORDER BY vec_a, vec_b"
        ),
        # temperature mixing: splitmix chain orders docs per source;
        # integer epoch math from the rounded alpha-power targets
        "mix_temperature_plan": (
            "WITH t AS (SELECT doc_id, source, CAST(len(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok "
            "FROM documents), "
            "s0 AS (SELECT *, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM t), "
            "x1 AS (SELECT * EXCLUDE (z), CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT * EXCLUDE (a), ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT * EXCLUDE (z), CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT * EXCLUDE (a), ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT * EXCLUDE (z), xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 31) AS h FROM s2), "
            "ns AS (SELECT source, SUM(n_tok) AS n FROM t GROUP BY 1), "
            "tt AS (SELECT source, n, CAST(ROUND(100000 * POWER(CAST(n AS DOUBLE), 0.5) "
            "/ (SELECT SUM(POWER(CAST(n AS DOUBLE), 0.5)) FROM ns)) AS BIGINT) AS ts FROM ns), "
            "r AS (SELECT doc_id, s3.source, n_tok, ts // n AS base, ts % n AS rem, "
            "COALESCE(SUM(n_tok) OVER (PARTITION BY s3.source ORDER BY h "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef "
            "FROM s3 JOIN tt ON tt.source = s3.source) "
            "SELECT doc_id, source, n_tok, "
            "CAST(base + CASE WHEN bef < rem THEN 1 ELSE 0 END AS BIGINT) AS n_repeats "
            "FROM r ORDER BY doc_id"
        ),
        # exact tf-weighted Jaccard: sum-min intersections over the
        # token join, denominator wa + wb - i from per-doc total tf
        "dedup_weighted_tf": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS tok FROM documents), "
            "tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2), "
            "sz AS (SELECT doc_id, sum(c) AS w FROM tf GROUP BY 1), "
            "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "SUM(LEAST(a.c, b.c)) AS i FROM tf a JOIN tf b USING (tok) "
            "WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, "
            "ROUND(CAST(i AS DOUBLE) / (sa.w + sb.w - i), 6) AS wjaccard "
            "FROM i JOIN sz sa ON sa.doc_id = doc_a "
            "JOIN sz sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.w + sb.w - i) >= 0.55 "
            "ORDER BY doc_a, doc_b"
        ),
        # LSH variant: same EXACT semantics oracle (recall 1.0
        # at fixture banding is part of the check)
        "dedup_weighted_lsh": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "string_split(text, ' '), x -> x <> '')) AS tok FROM documents), "
            "tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2), "
            "sz AS (SELECT doc_id, sum(c) AS w FROM tf GROUP BY 1), "
            "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
            "SUM(LEAST(a.c, b.c)) AS i FROM tf a JOIN tf b USING (tok) "
            "WHERE a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT doc_a, doc_b, "
            "ROUND(CAST(i AS DOUBLE) / (sa.w + sb.w - i), 6) AS wjaccard "
            "FROM i JOIN sz sa ON sa.doc_id = doc_a "
            "JOIN sz sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.w + sb.w - i) >= 0.55 "
            "ORDER BY doc_a, doc_b"
        ),
        # exact kNN graph: pairwise double-cast cosine, rank by
        # (cosine desc, nbr_id asc), top-5 per vector
        "knn_graph_exact": (
            "WITH v AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS e FROM embeddings), "
            "c AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
            "ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine "
            "FROM v a JOIN v b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            "ORDER BY cosine DESC, nbr_id) AS rk FROM c) "
            "SELECT vec_id, CAST(rk AS BIGINT) AS rank, nbr_id, cosine "
            "FROM r WHERE rk <= 5 ORDER BY vec_id, rank"
        ),
        # hard negatives: the same exact-kNN ranking restricted to
        # cross-label pairs (label join + <> filter)
        "hard_negatives": (
            "WITH v AS (SELECT vec_id, label, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS e FROM embeddings), "
            "c AS (SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id, "
            "ROUND(list_cosine_similarity(a.e, b.e), 6) AS cosine "
            "FROM v a JOIN v b ON a.vec_id <> b.vec_id "
            "AND a.label <> b.label), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id "
            "ORDER BY cosine DESC, nbr_id) AS rk FROM c) "
            "SELECT vec_id, CAST(rk AS BIGINT) AS rank, nbr_id, cosine "
            "FROM r WHERE rk <= 3 ORDER BY vec_id, rank"
        ),
        # JL sign projection: signs from the splitmix chain over key =
        # seed·2^32 + i·16 + j (zipped unnests align j with the key),
        # inputs quantized 1e-6 half-away — all-int64, bit-exact
        "embedding_jl_project": (
            "WITH e AS (SELECT vec_id, unnest(embedding) AS v, "
            "generate_subscripts(embedding, 1) - 1 AS i FROM embeddings), "
            "q AS (SELECT vec_id, i, CAST(TRUNC(CAST(v AS DOUBLE) * 1000000 "
            "+ 0.5 * SIGN(v)) AS BIGINT) AS qv FROM e), "
            "k AS (SELECT vec_id, qv, CAST(21474836480 + i * 16 "
            "+ unnest(range(0, 16)) AS HUGEINT) AS x, "
            "unnest(range(0, 16)) AS j FROM q), "
            "s0 AS (SELECT vec_id, qv, j, (x + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM k), "
            "x1 AS (SELECT vec_id, qv, j, CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 30) AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT vec_id, qv, j, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT vec_id, qv, j, CAST(xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 27) AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT vec_id, qv, j, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT vec_id, qv, j, xor(CAST(z AS UBIGINT), "
            "CAST(z AS UBIGINT) >> 31) AS h FROM s2) "
            "SELECT vec_id, j, CAST(SUM(CASE WHEN h % 2 = 1 THEN qv ELSE -qv END) "
            "AS BIGINT) AS val FROM s3 GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # interpolated Kneser-Ney trigram (d=0.75): all counts are
        # integer group-bys (continuation counts from the DISTINCT
        # trigram type table); one float expression scores
        "lm_kn_ppl": (
            "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM documents), "
            "occ AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3 "
            "FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i "
            "FROM w WHERE len(w) >= 3)), "
            "c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM occ GROUP BY 1, 2, 3), "
            "c2 AS (SELECT w1, w2, sum(c3) AS c2, count(*) AS n1ctx "
            "FROM c3 GROUP BY 1, 2), "
            "nmid AS (SELECT w2, w3, count(*) AS nmid FROM c3 GROUP BY 1, 2), "
            "nden AS (SELECT w2, count(*) AS nden, count(DISTINCT w3) AS nfollow "
            "FROM c3 GROUP BY 1), "
            "big AS (SELECT DISTINCT w2, w3 FROM c3), "
            "nprec AS (SELECT w3, count(*) AS nprec FROM big GROUP BY 1), "
            "nbig AS (SELECT count(*) AS nbig FROM big), "
            "sc AS (SELECT o.doc_id, count(*) AS m, "
            "-avg(ln((GREATEST(c.c3 - 0.75, 0) / b.c2) "
            "+ (0.75 * b.n1ctx / b.c2) * "
            "((GREATEST(nm.nmid - 0.75, 0) / nd.nden) "
            "+ (0.75 * nd.nfollow / nd.nden) * (np.nprec / (SELECT nbig FROM nbig))))) AS nll "
            "FROM occ o "
            "JOIN c3 c USING (w1, w2, w3) "
            "JOIN c2 b USING (w1, w2) "
            "JOIN nmid nm ON nm.w2 = o.w2 AND nm.w3 = o.w3 "
            "JOIN nden nd ON nd.w2 = o.w2 "
            "JOIN nprec np ON np.w3 = o.w3 "
            "GROUP BY o.doc_id) "
            "SELECT doc_id, CAST(m AS BIGINT) AS n_trigrams, "
            "round(exp(nll), 6) AS ppl FROM sc ORDER BY doc_id"
        ),
        # deterministic train/val/test assignment: bucket =
        # splitmix64(doc_id) % 1000; [0,50) test, [50,100) val
        "assign_splits": (
            "WITH s0 AS (SELECT doc_id, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) "
            "% 1000 AS BIGINT) AS bucket FROM s2) "
            "SELECT doc_id, bucket, CASE WHEN bucket < 50 THEN 'test' "
            "WHEN bucket < 100 THEN 'val' ELSE 'train' END AS split "
            "FROM s3 ORDER BY doc_id"
        ),
        # shard manifest of the epoch-1 training order (shard_size=100):
        # same splitmix chain as epoch_shuffle, shard = rank // 100
        "corpus_shards": (
            "WITH s0 AS (SELECT doc_id, (CAST(xor(CAST(doc_id AS UBIGINT), "
            "CAST(10905525725756348110 AS UBIGINT)) AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM documents), "
            "x1 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h "
            "FROM s2), "
            "r AS (SELECT row_number() OVER (ORDER BY h) - 1 AS rank FROM s3) "
            "SELECT CAST(rank // 100 AS BIGINT) AS shard, COUNT(*) AS n_docs, "
            "MIN(rank) AS rank_min, MAX(rank) AS rank_max, FALSE AS skipped "
            "FROM r GROUP BY 1 ORDER BY shard"
        ),
        # JSON int-field stats per event type (RE2 extract both sides)
        "json_field_stats": (
            "WITH x AS (SELECT event_type, TRY_CAST(regexp_extract(props, "
            "'\"k\":\\s*(-?\\d+)', 1) AS BIGINT) AS v FROM events) "
            "SELECT event_type, COUNT(*) AS n_events, COUNT(v) AS n_with_field, "
            "CAST(COALESCE(SUM(v), 0) AS BIGINT) AS sum_field, "
            "CAST(SUM(v) AS DOUBLE) / COUNT(v) AS avg_field "
            "FROM x GROUP BY event_type ORDER BY event_type"
        ),
        # regex scrub of the props column (RE2 replace, global)
        "redact_events": (
            "SELECT event_id, regexp_replace(props, '\\d+', '<NUM>', 'g') AS redacted, "
            "CAST(len(regexp_extract_all(props, '\\d+')) AS BIGINT) AS n_number, "
            "CAST(len(regexp_extract_all(props, '\\d+')) AS BIGINT) AS n_redactions "
            "FROM events ORDER BY event_id"
        ),
        # stopword-removal normalization (map-only text rewrite)
        "normalize_text": (
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "f AS (SELECT doc_id, len(w) AS n_all, "
            "list_filter(w, x -> NOT list_contains(['the','a','of','and','in','to','is'], x)) AS kept "
            "FROM t) "
            "SELECT doc_id, array_to_string(kept, ' ') AS clean_text, "
            "CAST(len(kept) AS BIGINT) AS n_kept, CAST(n_all - len(kept) AS BIGINT) AS n_removed "
            "FROM f ORDER BY doc_id"
        ),
        # hopping 1h/15min windows: every event belongs to exactly 4
        # window starts (floor(ts/hop)-i for i in 0..3), counts and
        # micros-exact value sums per window
        "events_hopping": (
            "WITH j AS (SELECT unnest(generate_series(0, 3)) AS i) "
            "SELECT (CAST(floor(epoch_us(ts)/900000000) AS BIGINT) - i) "
            "* 900000000 AS window_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(CAST(ROUND(value*1e6) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros "
            "FROM events, j GROUP BY 1 ORDER BY 1"
        ),
        # corpus-level exact segment dedup in its high-DF removal form:
        # drop every word occurring in >= 4/5 of documents (integer-
        # exact threshold nd*5 >= n*4), preserving empty segments so
        # separator structure round-trips; zipped unnests align each
        # segment with its ordinal for the ordered string_agg rebuild
        "line_dedup": (
            "WITH ls AS (SELECT doc_id, unnest(string_split(text, ' ')) AS ln, "
            "unnest(generate_series(1, len(string_split(text, ' ')))) AS idx "
            "FROM documents), "
            "dup AS (SELECT ln FROM ls WHERE ln <> '' GROUP BY ln "
            "HAVING COUNT(DISTINCT doc_id) * 5 >= "
            "(SELECT COUNT(*) FROM documents) * 4), "
            "kept AS (SELECT doc_id, ln, idx FROM ls "
            "WHERE ln = '' OR ln NOT IN (SELECT ln FROM dup)) "
            "SELECT d.doc_id, COALESCE(k.text, '') AS text, "
            "CAST(t.n_all - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed "
            "FROM documents d "
            "JOIN (SELECT doc_id, COUNT(*) AS n_all FROM ls GROUP BY doc_id) t "
            "USING (doc_id) "
            "LEFT JOIN (SELECT doc_id, string_agg(ln, ' ' ORDER BY idx) AS text, "
            "COUNT(*) AS n_kept FROM kept GROUP BY doc_id) k USING (doc_id) "
            "ORDER BY d.doc_id"
        ),
        # keep-set over the EXACT n-gram-Jaccard pairs: the recursive
        # transitive closure of dedup_ngram_components, then keep every
        # doc that is its own component min (or in no pair at all)
        "dedup_keepset_exact": (
            "WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
            "p AS (SELECT doc_a, doc_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5), "
            "edges AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p), "
            "reach(n, m) AS (SELECT a, a FROM edges UNION "
            "SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m), "
            "comp AS (SELECT n AS node, MIN(m) AS comp FROM reach GROUP BY n) "
            "SELECT doc_id FROM documents "
            "WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> comp) "
            "ORDER BY doc_id"
        ),
        # concat-and-chunk packing plan: the same bit-exact splitmix64
        # mulmod chain as corpus_sample orders the tape, a window
        # cumsum places each doc, integer div/mod cut the sequences
        # (SUM OVER returns HUGEINT in DuckDB — cast back to BIGINT)
        "pack_sequences_global": (
            "WITH t AS (SELECT doc_id, "
            "CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tok "
            "FROM documents), "
            "s0 AS (SELECT doc_id, n_tok, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM t), "
            "x1 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, n_tok, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, n_tok, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, n_tok, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h "
            "FROM s2), "
            "pos AS (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER "
            "(ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
            "AS tok_start FROM s3) "
            "SELECT doc_id, n_tok, tok_start, tok_start // 512 AS seq_id, "
            "tok_start % 512 AS off_in_seq, "
            "CASE WHEN n_tok = 0 THEN CAST(0 AS BIGINT) "
            "ELSE (tok_start + n_tok - 1) // 512 - tok_start // 512 + 1 END AS n_seqs "
            "FROM pos ORDER BY doc_id"
        ),
        # materialized packed sequences: same splitmix64 tape order
        # (chain carries the word list), window-cumsum token offsets,
        # then every token's global position grouped by pos // 64 with
        # an ordered string_agg
        "pack_sequences_text": (
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), "
            "x -> x <> '') AS w FROM documents), "
            "s0 AS (SELECT doc_id, w, (CAST(doc_id AS HUGEINT) + 11400714819323198485) "
            "% 18446744073709551616 AS z FROM t), "
            "x1 AS (SELECT doc_id, w, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 30) "
            "AS HUGEINT) AS a FROM s0), "
            "s1 AS (SELECT doc_id, w, ((a % 4294967296) * 13787848793156543929 "
            "+ (((a // 4294967296) * 13787848793156543929) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x1), "
            "x2 AS (SELECT doc_id, w, CAST(xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 27) "
            "AS HUGEINT) AS a FROM s1), "
            "s2 AS (SELECT doc_id, w, ((a % 4294967296) * 10723151780598845931 "
            "+ (((a // 4294967296) * 10723151780598845931) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS z FROM x2), "
            "s3 AS (SELECT doc_id, w, xor(CAST(z AS UBIGINT), CAST(z AS UBIGINT) >> 31) AS h "
            "FROM s2), "
            "pos AS (SELECT doc_id, w, CAST(COALESCE(SUM(len(w)) OVER "
            "(ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) "
            "AS tok_start FROM s3), "
            "tok AS (SELECT tok_start + unnest(range(1, len(w) + 1)) - 1 AS p, "
            "unnest(w) AS tok FROM pos) "
            "SELECT p // 64 AS seq_id, CAST(count(*) AS BIGINT) AS n_tok, "
            "string_agg(tok, ' ' ORDER BY p) AS text FROM tok "
            "GROUP BY 1 ORDER BY 1"
        ),
        # incremental dedup vs a persisted LSH store: same exact-Jaccard
        # pair CTE, restricted to pairs touching the increment (the
        # engine never does base x base work), then CC over ids encoded
        # base=doc_id / increment=doc_id+2^40 so the component MIN is a
        # corpus doc whenever one is present (corpus pinned) and the
        # lowest increment id otherwise. keep <=> node == its comp;
        # dup_of = decoded comp (-1 when kept).
        "dedup_incremental": (
            "WITH RECURSIVE toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "grams AS (SELECT DISTINCT doc_id, gram FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM toks WHERE len(w) >= 3)), "
            "sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i "
            "FROM grams a JOIN grams b USING (gram) WHERE a.doc_id < b.doc_id GROUP BY 1, 2), "
            "p AS (SELECT doc_a, doc_b FROM inter "
            "JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
            "WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5 "
            "AND (doc_a >= 400 OR doc_b >= 400)), "
            "enc AS (SELECT CASE WHEN doc_a < 400 THEN doc_a ELSE doc_a + 1099511627776 END AS ea, "
            "CASE WHEN doc_b < 400 THEN doc_b ELSE doc_b + 1099511627776 END AS eb FROM p), "
            "edges AS (SELECT ea AS a, eb AS b FROM enc UNION SELECT eb, ea FROM enc), "
            "reach(n, m) AS (SELECT a, a FROM edges UNION "
            "SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m), "
            "comp AS (SELECT n AS node, MIN(m) AS comp FROM reach GROUP BY n), "
            "inc AS (SELECT doc_id FROM documents WHERE doc_id >= 400), "
            "lab AS (SELECT i.doc_id, c.comp FROM inc i "
            "LEFT JOIN comp c ON c.node = i.doc_id + 1099511627776) "
            "SELECT doc_id, "
            "(comp IS NULL OR comp = doc_id + 1099511627776) AS keep, "
            "CAST(CASE WHEN comp IS NULL OR comp = doc_id + 1099511627776 THEN -1 "
            "WHEN comp >= 1099511627776 THEN comp - 1099511627776 ELSE comp END AS BIGINT) AS dup_of "
            "FROM lab ORDER BY doc_id"
        ),
        # k-means (k=8, 5 Lloyd iterations, content-derived splitmix64
        # seeding): a PINNED-SNAPSHOT oracle. Lloyd's in portable SQL
        # needs wrapping-uint64 hashing + 5 unrolled argmin/centroid
        # stages, so instead the expected {sizes, inertia} for the two
        # driver sfs are pinned literals, dispatched on a content-
        # derived key (sum of first embedding coords — sf0.001 and
        # sf0.01 share vec_ids, so the key must read the vectors). The
        # snapshot is independently reproduced — no pipeline code — by
        # a plain-numpy reimplementation in
        # tests/test_similarity.py::test_kmeans_snapshot_matches_independent_impl.
        "kmeans_embeddings": (
            "WITH key AS (SELECT ROUND(SUM(CAST(embedding[1] AS DOUBLE)), 6) AS k "
            "FROM embeddings), "
            "snap(k, cluster_id, size, inertia) AS (VALUES "
            "(-1.463953, 0, 64, 465.09946), (-1.463953, 1, 62, 465.09946), "
            "(-1.463953, 2, 73, 465.09946), (-1.463953, 3, 55, 465.09946), "
            "(-1.463953, 4, 59, 465.09946), (-1.463953, 5, 64, 465.09946), "
            "(-1.463953, 6, 70, 465.09946), (-1.463953, 7, 53, 465.09946), "
            "(1.082355, 0, 75, 463.719412), (1.082355, 1, 52, 463.719412), "
            "(1.082355, 2, 68, 463.719412), (1.082355, 3, 73, 463.719412), "
            "(1.082355, 4, 53, 463.719412), (1.082355, 5, 63, 463.719412), "
            "(1.082355, 6, 54, 463.719412), (1.082355, 7, 62, 463.719412)) "
            "SELECT CAST(cluster_id AS BIGINT) AS cluster_id, "
            "CAST(size AS BIGINT) AS size, CAST(inertia AS DOUBLE) AS inertia "
            "FROM snap JOIN key ON snap.k = key.k ORDER BY cluster_id"
        ),
        # Gopher repetition rules on a word stream: top n-gram coverage
        # (n=2..4) + duplicate 5-gram instance fraction; gates compare
        # the ROUNDED values on both sides
        "gopher_repetition": (
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "m2 AS (SELECT doc_id, MAX(c) AS maxc FROM (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram "
            "FROM t WHERE len(w) >= 2) GROUP BY doc_id, gram) GROUP BY doc_id), "
            "m3 AS (SELECT doc_id, MAX(c) AS maxc FROM (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gram "
            "FROM t WHERE len(w) >= 3) GROUP BY doc_id, gram) GROUP BY doc_id), "
            "m4 AS (SELECT doc_id, MAX(c) AS maxc FROM (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 2), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gram "
            "FROM t WHERE len(w) >= 4) GROUP BY doc_id, gram) GROUP BY doc_id), "
            "g5 AS (SELECT doc_id, gram, COUNT(*) AS c FROM ("
            "SELECT doc_id, unnest(list_transform(range(1, len(w) - 3), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS gram "
            "FROM t WHERE len(w) >= 5) GROUP BY doc_id, gram), "
            "d5 AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot "
            "FROM g5 GROUP BY doc_id), "
            "f AS (SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tok, "
            "ROUND(COALESCE(m2.maxc * 2.0 / len(w), 0), 6) AS top2_frac, "
            "ROUND(COALESCE(m3.maxc * 3.0 / len(w), 0), 6) AS top3_frac, "
            "ROUND(COALESCE(m4.maxc * 4.0 / len(w), 0), 6) AS top4_frac, "
            "ROUND(COALESCE(CAST(d5.dup AS DOUBLE) / d5.tot, 0), 6) AS dup5_frac "
            "FROM t LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id) "
            "LEFT JOIN m4 USING (doc_id) LEFT JOIN d5 USING (doc_id)) "
            "SELECT *, (n_tok > 0 AND top2_frac <= 0.10 AND top3_frac <= 0.08 "
            "AND top4_frac <= 0.06 AND dup5_frac <= 0.10) AS keep "
            "FROM f ORDER BY doc_id"
        ),
        # cross-document duplicated-window stats (ExactSubstr-style):
        # a length-8 token window is a duplicate iff its gram occurs
        # in >= 2 distinct documents
        "substring_dedup": (
            "WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "g AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 6), i -> "
            "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || "
            "w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7])) AS gram "
            "FROM t WHERE len(w) >= 8), "
            "nd AS (SELECT gram, COUNT(DISTINCT doc_id) AS ndocs FROM g GROUP BY gram) "
            "SELECT doc_id, COUNT(*) AS n_windows, "
            "CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows, "
            "ROUND(CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) "
            "AS dup_frac "
            "FROM g JOIN nd USING (gram) GROUP BY doc_id ORDER BY doc_id"
        ),
        # byte-level BPE first-merge candidates: adjacent byte pairs
        # over the distinct-word table, weighted by word frequency.
        # DOMAIN NOTE: this oracle splits into CHARACTERS, the engine
        # into BYTES — identical on the driver's ASCII corpus (verified
        # ASCII-only), divergent on non-ASCII text, where the engine's
        # byte-level behavior is covered by
        # tests/test_bpe.py::test_bpe_byte_level_non_ascii instead
        "bpe_top_pairs": (
            "WITH w AS (SELECT tok, COUNT(*) AS cnt FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE tok <> '' GROUP BY tok), "
            "p AS (SELECT substring(tok, CAST(i AS INT), 1) AS l, "
            "substring(tok, CAST(i + 1 AS INT), 1) AS r, cnt "
            "FROM (SELECT tok, cnt, unnest(range(1, len(tok))) AS i "
            "FROM w WHERE len(tok) >= 2)) "
            "SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM p "
            "GROUP BY l, r ORDER BY pair_count DESC, l, r LIMIT 20"
        ),
        # TPC-H Q6 shape: exact int64 1e-4-unit arithmetic on both sides
        "tpch_q6": (
            "SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "CAST(ROUND(l_discount * 100) AS BIGINT)) / 10000.0, 2) AS revenue "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        # TPC-H Q3 shape (o_orderpriority stands in for the generator's
        # missing o_shippriority); ties broken by l_orderkey both sides
        "tpch_q3": (
            "WITH li AS (SELECT l_orderkey, "
            "CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_u4 "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-07-01'), "
            "o AS (SELECT o_orderkey, o_orderdate, o_orderpriority FROM orders "
            "JOIN customer ON c_custkey = o_custkey "
            "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-07-01') "
            "SELECT l_orderkey, ROUND(SUM(rev_u4) / 10000.0, 2) AS revenue, "
            "o_orderdate, o_orderpriority "
            "FROM li JOIN o ON o_orderkey = l_orderkey "
            "GROUP BY l_orderkey, o_orderdate, o_orderpriority "
            "ORDER BY SUM(rev_u4) DESC, l_orderkey LIMIT 10"
        ),
        # TPC-H Q5 shape: revenue exact in 1e-4 int64 units on both
        # sides; local-supplier condition s_nationkey = c_nationkey
        "tpch_q5": (
            "WITH rn AS (SELECT n_nationkey, n_name FROM nation "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA') "
            "SELECT n_name, CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue "
            "FROM customer JOIN rn ON c_nationkey = n_nationkey "
            "JOIN orders ON o_custkey = c_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY n_name ORDER BY revenue DESC, n_name"
        ),
        # TPC-H Q10 shape: returned-item revenue per customer, top 20
        # (ties broken by c_custkey on both sides)
        "tpch_q10": (
            "WITH po AS (SELECT l_orderkey, "
            "SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS ru4 "
            "FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey), "
            "pcu AS (SELECT o_custkey, SUM(ru4) AS ru4 "
            "FROM po JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-07-01' GROUP BY o_custkey) "
            "SELECT c_custkey, c_name, CAST(ru4 AS DOUBLE)/10000.0 AS revenue, "
            "c_acctbal, n_name "
            "FROM pcu JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "ORDER BY ru4 DESC, c_custkey LIMIT 20"
        ),
        # TPC-H Q14 shape: promo revenue share — both sums exact int64,
        # ONE double division at the end
        "tpch_q14": (
            "SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' "
            "THEN ru4 ELSE 0 END) / SUM(ru4), 6) AS promo_pct FROM ("
            "SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS ru4, p_type "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-03-01' "
            "AND l_shipdate < TIMESTAMP '1997-04-01')"
        ),
        # TPC-H Q18 shape: HAVING on grouped cent-exact quantity sums
        "tpch_q18": (
            "WITH big AS (SELECT l_orderkey, "
            "SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS qc FROM lineitem "
            "GROUP BY l_orderkey "
            "HAVING SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) > 30000) "
            "SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, "
            "CAST(qc AS DOUBLE)/100.0 AS sum_qty "
            "FROM big JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
        ),
        # TPC-H Q4 shape adapted to shipping lateness (fixture has no
        # l_commitdate/l_receiptdate): EXISTS lineitem shipped >= 60
        # days after the order date
        "tpch_q4_late": (
            "SELECT o_orderpriority, count(*) AS order_count FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-07-01' "
            "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
            "AND l_shipdate >= o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY o_orderpriority ORDER BY o_orderpriority"
        ),
        # TPC-H Q7 shape: bilateral trade revenue by ship year, exact
        # u4 sums; the two nations resolve by name on both sides
        "tpch_q7": (
            "WITH pairk AS (SELECT n_nationkey, n_name FROM nation "
            "WHERE n_name IN ('NATION_3', 'NATION_7')) "
            "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS INTEGER) AS l_year, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue "
            "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN pairk sn ON sn.n_nationkey = s_nationkey "
            "JOIN pairk cn ON cn.n_nationkey = c_nationkey "
            "WHERE sn.n_name <> cn.n_name "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        # TPC-H Q13 shape adapted: the anti-filter applies to
        # o_orderpriority (fixture has no o_comment); LEFT join keeps
        # zero-order customers in the c_count=0 bucket
        "tpch_q13": (
            "SELECT c_count, custdist FROM ("
            "SELECT c_count, count(*) AS custdist FROM ("
            "SELECT c_custkey, count(o_custkey) AS c_count FROM customer "
            "LEFT JOIN (SELECT o_custkey FROM orders "
            "WHERE o_orderpriority <> '1-URGENT') o ON c_custkey = o_custkey "
            "GROUP BY c_custkey) GROUP BY c_count) "
            "ORDER BY custdist DESC, c_count DESC"
        ),
        # TPC-H Q15 shape: max-revenue supplier(s) in a quarter, exact
        # u4 revenue, ties included like the view-based original
        "tpch_q15": (
            "WITH rev AS (SELECT l_suppkey, "
            "SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS total_u4 "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, CAST(total_u4 AS DOUBLE)/10000.0 AS total_revenue "
            "FROM supplier JOIN rev ON s_suppkey = l_suppkey "
            "WHERE total_u4 = (SELECT MAX(total_u4) FROM rev) ORDER BY s_suppkey"
        ),
        # TPC-H Q17 shape adapted to p_brand alone (no p_container);
        # the correlated 1/5-of-mean predicate compares integers:
        # qty_c * 5 * cnt < sumq_c (exactly the pipeline's kernel)
        "tpch_q17": (
            "WITH li AS (SELECT l_partkey, "
            "CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c, "
            "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE p_brand = 'Brand#23'), "
            "st AS (SELECT l_partkey, SUM(qty_c) AS sumq_c, COUNT(*) AS cnt "
            "FROM li GROUP BY l_partkey) "
            "SELECT ROUND(CAST(COALESCE(SUM(price_c), 0) AS DOUBLE)/100.0/7.0, 6) AS avg_yearly "
            "FROM li JOIN st USING (l_partkey) WHERE qty_c * 5 * cnt < 1 * sumq_c"
        ),
        # TPC-H Q19 shape adapted (no shipmode/shipinstruct columns):
        # disjunctive (brand, size-range, quantity-range) predicates
        "tpch_q19": (
            "SELECT ROUND(CAST(COALESCE(SUM("
            "CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))), 0) AS DOUBLE)/10000.0, 2) AS revenue "
            "FROM lineitem JOIN part ON p_partkey = l_partkey WHERE "
            "(p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"
        ),
        # TPC-H Q22 shape adapted: c_nationkey is the country code (no
        # c_phone) and dormancy is no-orders-since-2000 (every fixture
        # customer has lifetime orders); the above-average test
        # compares integers bal_c*cnt > sum_c, exactly the pipeline's
        "tpch_q22": (
            "WITH cc AS (SELECT c_custkey, c_nationkey AS cntrycode, "
            "CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c FROM customer "
            "WHERE c_nationkey IN (3, 8, 13, 18, 23)), "
            "st AS (SELECT SUM(CASE WHEN bal_c > 0 THEN bal_c ELSE 0 END) AS sum_c, "
            "SUM(CASE WHEN bal_c > 0 THEN 1 ELSE 0 END) AS cnt FROM cc) "
            "SELECT cntrycode, COUNT(*) AS numcust, "
            "CAST(SUM(bal_c) AS DOUBLE)/100.0 AS totacctbal FROM cc, st "
            "WHERE bal_c * cnt > sum_c AND NOT EXISTS ("
            "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderdate >= TIMESTAMP '2000-01-01') "
            "GROUP BY cntrycode ORDER BY cntrycode"
        ),
        # TPC-H Q2 shape adapted: part↔supplier relation is the
        # DISTINCT lineitem (partkey, suppkey) pairs (no partsupp), the
        # correlated MIN is over s_acctbal in exact cents, part filter
        # is p_size alone
        "tpch_q2": (
            "WITH rs AS (SELECT s_suppkey, s_name, n_name, "
            "CAST(ROUND(s_acctbal*100) AS BIGINT) AS bal_c "
            "FROM supplier JOIN nation ON n_nationkey = s_nationkey "
            "JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'EUROPE'), "
            "pp AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15), "
            "pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem "
            "JOIN pp ON p_partkey = l_partkey), "
            "cand AS (SELECT l_partkey AS p_partkey, p_name, bal_c, s_name, n_name "
            "FROM pairs JOIN pp ON pp.p_partkey = l_partkey "
            "JOIN rs ON s_suppkey = l_suppkey) "
            "SELECT CAST(bal_c AS DOUBLE)/100.0 AS s_acctbal, s_name, n_name, "
            "p_partkey, p_name FROM cand c "
            "WHERE bal_c = (SELECT MIN(bal_c) FROM cand c2 "
            "WHERE c2.p_partkey = c.p_partkey) "
            "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
        ),
        # TPC-H Q8 shape: target nation's share of in-region ECONOMY
        # revenue by order year; volume is exact u4 price*(1-disc)
        "tpch_q8": (
            "WITH rn AS (SELECT n_nationkey FROM nation "
            "JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'ASIA'), "
            "base AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            "CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS vol_u4, s_nationkey "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "WHERE p_type = 'ECONOMY' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND c_nationkey IN (SELECT n_nationkey FROM rn)) "
            "SELECT o_year, ROUND(CAST(SUM(CASE WHEN s_nationkey = 7 "
            "THEN vol_u4 ELSE 0 END) AS DOUBLE) / CAST(SUM(vol_u4) AS DOUBLE), 6) "
            "AS mkt_share FROM base GROUP BY o_year ORDER BY o_year"
        ),
        # TPC-H Q9 shape adapted: profit is exact u4 price*(1-disc)
        # (no ps_supplycost), parts matched by name substring
        "tpch_q9": (
            "SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 "
            "AS sum_profit "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE p_name LIKE '%red%' "
            "GROUP BY 1, 2 ORDER BY nation, o_year DESC"
        ),
        # TPC-H Q16 shape adapted: DISTINCT lineitem pairs stand in for
        # partsupp, type exclusion is equality, complaint suppliers are
        # s_acctbal < 0
        "tpch_q16": (
            "SELECT p_brand, p_type, p_size, "
            "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs "
            "JOIN part ON p_partkey = l_partkey "
            "WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO' "
            "AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45) "
            "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier "
            "WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type, p_size "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
        ),
        # TPC-H Q21 shape adapted: lateness is shipdate >= orderdate+30d
        # (no commitdate/receiptdate); sole-late-supplier on a
        # multi-supplier finished order
        "tpch_q21": (
            "WITH lo AS (SELECT l_orderkey, l_suppkey, "
            "(l_shipdate >= o_orderdate + INTERVAL 30 DAY) AS late "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE o_orderstatus = 'F'), "
            "pairs AS (SELECT l_orderkey, l_suppkey, "
            "MAX(CASE WHEN late THEN 1 ELSE 0 END) AS late "
            "FROM lo GROUP BY l_orderkey, l_suppkey), "
            "st AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late "
            "FROM pairs GROUP BY l_orderkey) "
            "SELECT s_name, COUNT(*) AS numwait "
            "FROM pairs JOIN st USING (l_orderkey) "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE pairs.late = 1 AND n_supp > 1 AND n_late = 1 "
            "AND n_name = 'NATION_3' "
            "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"
        ),
        # TPC-H Q11 shape adapted: part value is the exact-u4 lineitem
        # revenue of one nation's suppliers (no ps_supplycost*availqty);
        # threshold compare is integer-exact on both sides
        "tpch_q11": (
            "WITH pv AS (SELECT l_partkey, "
            "SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS val_u4 "
            "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "WHERE n_name = 'NATION_3' GROUP BY l_partkey) "
            "SELECT l_partkey AS p_partkey, CAST(val_u4 AS DOUBLE)/10000.0 AS value "
            "FROM pv WHERE val_u4 * 1000 > (SELECT SUM(val_u4) FROM pv) * 2 "
            "ORDER BY value DESC, p_partkey"
        ),
        # TPC-H Q12 shape adapted: the shipping class is lateness
        # (shipped >= 30d after order date; no l_shipmode/receiptdate)
        "tpch_q12": (
            "SELECT CASE WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY "
            "THEN 'LATE' ELSE 'ONTIME' END AS ship_class, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1 ORDER BY 1"
        ),
        # TPC-H Q20 shape adapted: "dominates" = shipped more than half
        # the part's window quantity (no partsupp.availqty), supplier
        # gate is a region; quantity compare is integer-exact in cents
        "tpch_q20": (
            "WITH li AS (SELECT l_partkey, l_suppkey, "
            "CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "WHERE p_name LIKE '%red%' "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01'), "
            "ps AS (SELECT l_partkey, l_suppkey, SUM(qty_c) AS sq "
            "FROM li GROUP BY 1, 2), "
            "pt AS (SELECT l_partkey, SUM(sq) AS tot FROM ps GROUP BY 1) "
            "SELECT DISTINCT s_name FROM ps JOIN pt USING (l_partkey) "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ON n_nationkey = s_nationkey "
            "JOIN region ON r_regionkey = n_regionkey "
            "WHERE 2*sq > tot AND r_name = 'EUROPE' ORDER BY s_name"
        ),
        # reciprocal rank fusion of the BM25 and query-projected
        # TF-IDF-cosine top-20 lists (1/(60+rank) summed bm-then-tf,
        # ordered and cut on the 1e-9-quantized fused score); both
        # rankings and the fusion mirror pipelines/retrieval.py
        # expression-for-expression
        "hybrid_search_rrf": _rrf_oracle(
            ["hash join merge", "window sort order", "bloom filter scan"]
        ),
        # BM25 top-10 per fixed query: per-(doc,term) scores quantized
        # to int64 1e-9 units half-away BEFORE the per-query sum, so the
        # comparison is exact (the covariance quantization discipline);
        # expression order mirrors pipelines/retrieval.py term-for-term
        "bm25_search": (
            "WITH qt(query, term) AS (VALUES "
            "('hash join merge','hash'), ('hash join merge','join'), "
            "('hash join merge','merge'), ('window sort order','window'), "
            "('window sort order','sort'), ('window sort order','order'), "
            "('bloom filter scan','bloom'), ('bloom filter scan','filter'), "
            "('bloom filter scan','scan')), "
            "nn AS (SELECT count(*) AS n FROM documents), "
            "toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents), "
            "tks AS (SELECT doc_id, tok FROM toks WHERE tok <> ''), "
            "dl AS (SELECT doc_id, count(*) AS dl FROM tks GROUP BY doc_id), "
            "st AS (SELECT CAST((SELECT SUM(dl) FROM dl) AS DOUBLE) / (SELECT n FROM nn) AS avgdl), "
            "tf AS (SELECT doc_id, tok, count(*) AS tf FROM tks GROUP BY doc_id, tok), "
            "dfp AS (SELECT term, count(doc_id) AS df FROM (SELECT DISTINCT term FROM qt) q "
            "LEFT JOIN tf ON tok = term GROUP BY term), "
            "scored AS (SELECT qt.query, tf.doc_id, "
            "SUM(CAST(ROUND(1e9 * ln(1 + ((SELECT n FROM nn) - df + 0.5)/(df + 0.5)) "
            "* (tf * (1.2 + 1.0)) / (tf + 1.2 * (1 - 0.75 + (0.75 * dl) / avgdl))) AS BIGINT)) AS s_u9 "
            "FROM qt JOIN dfp USING(term) JOIN tf ON tf.tok = qt.term "
            "JOIN dl USING(doc_id), st GROUP BY qt.query, tf.doc_id "
            "HAVING SUM(CAST(ROUND(1e9 * ln(1 + ((SELECT n FROM nn) - df + 0.5)/(df + 0.5)) "
            "* (tf * (1.2 + 1.0)) / (tf + 1.2 * (1 - 0.75 + (0.75 * dl) / avgdl))) AS BIGINT)) > 0) "
            "SELECT query, doc_id, CAST(s_u9 AS DOUBLE)/1e9 AS score FROM ("
            "SELECT *, row_number() OVER (PARTITION BY query ORDER BY s_u9 DESC, doc_id) AS rn "
            "FROM scored) WHERE rn <= 10 ORDER BY query, s_u9 DESC, doc_id"
        ),
        # per-doc unigram entropy: each c*ln(c) term quantized to int64
        # 1e-9 units half-away BEFORE the per-doc sum; final value
        # quantized once to 1e-6 (matching the pipeline's trunc+copysign)
        "doc_entropy": (
            "WITH tks AS (SELECT doc_id, tok FROM ("
            "SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents) "
            "WHERE tok <> ''), "
            "tf AS (SELECT doc_id, tok, count(*) AS c FROM tks GROUP BY doc_id, tok), "
            "s AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS dl, "
            "SUM(CAST(ROUND(1e9 * (c * ln(c))) AS BIGINT)) AS s_u9 FROM tf GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(s.dl, 0) AS n_tok, "
            "COALESCE(CAST(ROUND(1e6 * (ln(s.dl) - (CAST(s.s_u9 AS DOUBLE)/1e9)/s.dl)) "
            "AS BIGINT)/1e6, 0.0) AS entropy "
            "FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id ORDER BY d.doc_id"
        ),
        # per-column profile; n_distinct is exact (64-bit-hash distinct,
        # same guarantee as distinct_tokens) and excludes nulls
        "profile_events": (
            "SELECT col, n_rows, n_nulls, n_distinct FROM ("
            "SELECT 'event_id' AS col, count(*) AS n_rows, "
            "count(*) - count(event_id) AS n_nulls, "
            "count(DISTINCT event_id) AS n_distinct FROM events "
            "UNION ALL SELECT 'ts', count(*), count(*) - count(ts), "
            "count(DISTINCT ts) FROM events "
            "UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id), "
            "count(DISTINCT user_id) FROM events "
            "UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type), "
            "count(DISTINCT event_type) FROM events "
            "UNION ALL SELECT 'value', count(*), count(*) - count(value), "
            "count(DISTINCT value) FROM events "
            "UNION ALL SELECT 'props', count(*), count(*) - count(props), "
            "count(DISTINCT props) FROM events) ORDER BY col"
        ),
        # fixed-width value histogram per event type; floor(x/10) of a
        # double is exact on both engines
        "events_value_histogram": (
            "SELECT event_type, CAST(FLOOR(value / 10.0) AS BIGINT) AS bin, "
            "count(*) AS n FROM events WHERE value IS NOT NULL "
            "GROUP BY event_type, bin ORDER BY event_type, bin"
        ),
        # cohort retention: distinct active days per user, cohort =
        # first day, offsets capped at 7
        "events_retention": (
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), "
            "f AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id) "
            "SELECT CAST(cohort AS VARCHAR) AS cohort_day, "
            "datediff('day', cohort, day) AS day_offset, "
            "COUNT(DISTINCT user_id) AS n_users "
            "FROM d JOIN f USING (user_id) "
            "WHERE datediff('day', cohort, day) <= 7 "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # pairwise exact Jaccard of source token vocabularies
        "source_similarity": (
            "WITH st AS (SELECT DISTINCT source, tok FROM ("
            "SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE tok <> ''), "
            "n AS (SELECT source, COUNT(*) AS c FROM st GROUP BY source), "
            "i AS (SELECT a.source AS sa, b.source AS sb, COUNT(*) AS i "
            "FROM st a JOIN st b USING (tok) WHERE a.source < b.source GROUP BY 1, 2) "
            "SELECT sa AS source_a, sb AS source_b, na.c AS n_a, nb.c AS n_b, "
            "i AS intersection, ROUND(CAST(i AS DOUBLE) / (na.c + nb.c - i), 6) AS jaccard "
            "FROM i JOIN n na ON na.source = sa JOIN n nb ON nb.source = sb "
            "ORDER BY sa, sb"
        ),
        # triangles of the token co-occurrence graph (distinct
        # adjacent-token pairs, canonical a < b)
        "triangle_count": (
            "WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS w "
            "FROM documents), "
            "p AS (SELECT LEAST(w[i], w[i+1]) AS a, GREATEST(w[i], w[i+1]) AS b "
            "FROM (SELECT w, unnest(range(1, len(w))) AS i FROM t WHERE len(w) >= 2)), "
            "e AS (SELECT DISTINCT a, b FROM p WHERE a <> b), "
            "tri AS (SELECT COUNT(*) AS c FROM e e1 "
            "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), "
            "nn AS (SELECT COUNT(DISTINCT node) AS c FROM "
            "(SELECT a AS node FROM e UNION ALL SELECT b FROM e)), "
            "ne AS (SELECT COUNT(*) AS c FROM e) "
            "SELECT nn.c AS n_nodes, ne.c AS n_edges, tri.c AS n_triangles "
            "FROM nn, ne, tri"
        ),
        # exact embedding covariance via half-away-from-zero int64
        # fixed-point (scale 2^30) per-sample quantization on BOTH
        # sides; float32 casts widen exactly, so the ints match
        "embedding_covariance": (
            "WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
            "FROM embeddings), "
            "u AS (SELECT vec_id, CAST(i AS INT) - 1 AS i, v[CAST(i AS INT)] AS x "
            "FROM e CROSS JOIN (SELECT unnest(range(1, 65)) AS i)), "
            "p AS (SELECT a.i AS i, b.i AS j, "
            "SUM(CAST(ROUND(a.x * b.x * 1073741824) AS BIGINT)) AS sxy, "
            "SUM(CAST(ROUND(a.x * 1073741824) AS BIGINT)) AS sx, "
            "SUM(CAST(ROUND(b.x * 1073741824) AS BIGINT)) AS sy, "
            "COUNT(*) AS n "
            "FROM u a JOIN u b ON a.vec_id = b.vec_id AND b.i >= a.i GROUP BY 1, 2) "
            "SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, "
            "ROUND((sxy / 1073741824.0 - (sx / 1073741824.0) * (sy / 1073741824.0) / n) / n, 6) "
            "AS cov FROM p ORDER BY i, j"
        ),
        # GROUPING SETS rollup; micros-exact sums, one double division
        "events_rollup": (
            "WITH x AS (SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
            "CAST(ROUND(value * 1000000) AS BIGINT) AS vmic FROM events) "
            "SELECT COALESCE(event_type, 'ALL') AS event_type, "
            "COALESCE(day, 'ALL') AS day, COUNT(*) AS n_events, "
            "SUM(vmic) / 1000000.0 AS sum_value "
            "FROM x GROUP BY GROUPING SETS ((event_type, day), (event_type), ()) "
            "ORDER BY event_type, day"
        ),
        # wide pivot: hour x event_type micros-exact value sums, one
        # double conversion per cell at the end (empty combos -> 0)
        "events_pivot": (
            "SELECT date_trunc('hour', ts) AS hour, "
            + ", ".join(
                f"CAST(COALESCE(SUM(CAST(ROUND(value*1000000) AS BIGINT)) "
                f"FILTER (WHERE event_type = '{t}'), 0) AS DOUBLE)/1000000.0 AS {t}"
                for t in ["click", "error", "purchase", "signup", "view"]
            )
            + " FROM events GROUP BY 1 ORDER BY 1"
        ),
        # last-write-wins: QUALIFY row_number over the desc order
        "events_latest_per_user": (
            "SELECT user_id, event_id, ts, event_type FROM events "
            "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts DESC, event_id DESC) = 1 ORDER BY user_id"
        ),
        # daily densified per-user grid: generate_series span LEFT JOIN
        # the bucket aggregate; count gap -> 0, running sum carries via
        # last_value IGNORE NULLS over the default to-current-row frame
        "events_resampled": (
            "WITH e AS (SELECT user_id, CAST(epoch_us(ts) // 86400000000 "
            "* 86400000000 AS BIGINT) AS b, "
            "CAST(round(value*1000000) AS BIGINT) AS v "
            "FROM events WHERE ts IS NOT NULL), "
            "a AS (SELECT user_id, b, count(*) AS n, CAST(SUM(v) AS BIGINT) AS vs "
            "FROM e GROUP BY 1, 2), "
            "s AS (SELECT user_id, min(b) AS mn, max(b) AS mx FROM a GROUP BY 1), "
            "g AS (SELECT user_id, unnest(generate_series(mn, mx, 86400000000)) AS b "
            "FROM s), "
            "j AS (SELECT g.user_id, g.b, coalesce(a.n, 0) AS n_events, a.vs "
            "FROM g LEFT JOIN a USING (user_id, b)) "
            "SELECT user_id, make_timestamp(b) AS bucket, "
            "CAST(n_events AS BIGINT) AS n_events, "
            "last_value(vs IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY b) "
            "AS value_sum_micros FROM j ORDER BY user_id, b"
        ),
        # ordered string_agg per user; count(col) skips nulls like the
        # operator's count_name
        "user_event_paths": (
            "SELECT user_id, string_agg(event_type, '->' ORDER BY ts, event_id) "
            "AS path, count(event_type) AS n_events "
            "FROM events GROUP BY user_id ORDER BY user_id"
        ),
        # per-key cap = row_number() <= n over the same desc order
        "docs_capped_per_source": (
            "SELECT doc_id, source, n_chars FROM ("
            "SELECT doc_id, source, n_chars, row_number() OVER "
            "(PARTITION BY source ORDER BY doc_id DESC) AS rn FROM documents) t "
            "WHERE rn <= 10 ORDER BY doc_id"
        ),
        # SQL EXCEPT over (user, type, value-decile) strata split at day 15
        "strata_lost_h2": (
            "WITH s AS (SELECT user_id, event_type, "
            "CAST(floor(value/10) AS BIGINT) AS vdec, day(ts) <= 15 AS h1 "
            "FROM events) "
            "SELECT user_id, event_type, vdec FROM ("
            "SELECT DISTINCT user_id, event_type, vdec FROM s WHERE h1 "
            "EXCEPT SELECT DISTINCT user_id, event_type, vdec FROM s WHERE NOT h1) "
            "ORDER BY user_id, event_type, vdec"
        ),
        # SQL INTERSECT twin
        "strata_stable": (
            "WITH s AS (SELECT user_id, event_type, "
            "CAST(floor(value/10) AS BIGINT) AS vdec, day(ts) <= 15 AS h1 "
            "FROM events) "
            "SELECT user_id, event_type, vdec FROM ("
            "SELECT DISTINCT user_id, event_type, vdec FROM s WHERE h1 "
            "INTERSECT SELECT DISTINCT user_id, event_type, vdec FROM s WHERE NOT h1) "
            "ORDER BY user_id, event_type, vdec"
        ),
        # pivot->unpivot round trip collapses to the plain long GROUP BY
        "events_unpivot": (
            "SELECT date_trunc('hour', ts) AS hour, event_type, "
            "CAST(SUM(CAST(ROUND(value*1000000) AS BIGINT)) AS BIGINT) "
            "AS value_sum_micros "
            "FROM events GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # SymSpell-blocked fuzzy vocabulary join, exact for dist <= 1
        "fuzzy_token_pairs": (
            "WITH v AS (SELECT DISTINCT tok FROM ("
            "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) "
            "WHERE len(tok) >= 3) "
            "SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(1 AS BIGINT) AS dist "
            "FROM v a JOIN v b ON a.tok < b.tok "
            "WHERE levenshtein(a.tok, b.tok) <= 1 ORDER BY tok_a, tok_b"
        ),
        # as-of join: DuckDB ASOF JOIN is the same greatest-ts<=ts
        # match; right side pre-aggregated to unique (user, ts)
        "events_asof_click": (
            "WITH l AS (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'purchase'), "
            "r AS (SELECT user_id, ts, MAX(value) AS click_value FROM events "
            "WHERE event_type = 'click' GROUP BY user_id, ts) "
            "SELECT l.event_id, l.user_id, l.ts, l.value, r.ts AS ts_r, "
            "r.click_value FROM l ASOF JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts ORDER BY l.event_id"
        ),
        # general interval join: same containment predicate as an
        # inequality join over generated hopping windows; sums in
        # exact cents
        "lineitem_ship_windows": (
            "WITH w AS (SELECT unnest(generate_series(0, 185)) AS window_id), "
            "b AS (SELECT CAST(window_id AS BIGINT) AS window_id, "
            "694224000000000 + window_id * 1209600000000 AS w0, "
            "694224000000000 + window_id * 1209600000000 + 2592000000000 AS w1 "
            "FROM w) "
            "SELECT b.window_id, CAST(COUNT(*) AS BIGINT) AS n_lines, "
            "CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c "
            "FROM lineitem JOIN b ON epoch_us(l_shipdate) >= b.w0 "
            "AND epoch_us(l_shipdate) < b.w1 GROUP BY 1 ORDER BY 1"
        ),
        # bounded ROWS frame, micros-exact; (ts, event_id) is unique
        # so the frame content is engine-independent
        "events_rolling": (
            "WITH b AS (SELECT event_id, user_id, ts, "
            "CAST(ROUND(value * 1e6) AS BIGINT) AS vm FROM events) "
            "SELECT event_id, user_id, ts, "
            "CAST(SUM(vm) OVER w AS BIGINT) AS roll_sum_micros, "
            "CAST(MAX(vm) OVER w AS BIGINT) AS roll_max_micros "
            "FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) ORDER BY event_id"
        ),
        # A-Priori 2-itemset pass: parts co-purchased in one order
        # top-20 co-purchased part triples (support >= 2, full
        # tie-break order)
        "frequent_part_triples": (
            "WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "t AS (SELECT a.p AS part_a, b2.p AS part_b, c2.p AS part_c, "
            "count(*) AS support FROM b a "
            "JOIN b b2 ON a.o = b2.o AND a.p < b2.p "
            "JOIN b c2 ON a.o = c2.o AND b2.p < c2.p "
            "GROUP BY 1, 2, 3 HAVING count(*) >= 2) "
            "SELECT part_a, part_b, part_c, CAST(support AS BIGINT) AS support "
            "FROM t ORDER BY support DESC, part_a, part_b, part_c LIMIT 20"
        ),
        # association rules over frequent co-purchase pairs: conf =
        # supp(ab)/supp(a), lift = supp(ab)*N/(supp(a)*supp(b)), each
        # quantized 1e-6 half-up from the single float division the
        # engine performs; min_conf filters on the QUANTIZED value
        "part_association_rules": (
            "WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p "
            "FROM lineitem), "
            "nb AS (SELECT count(DISTINCT o) AS n FROM b), "
            "item AS (SELECT p, count(*) AS s FROM b GROUP BY p), "
            "pr AS (SELECT a.p AS pa, b2.p AS pb, count(*) AS s "
            "FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p "
            "GROUP BY 1, 2 HAVING count(*) >= 2), "
            "dir AS (SELECT pa AS ant, pb AS cons, s FROM pr "
            "UNION ALL SELECT pb, pa, s FROM pr), "
            "r AS (SELECT ant, cons, d.s AS support, "
            "CAST(TRUNC((CAST(d.s AS DOUBLE) / ia.s) * 1e6 + 0.5) AS BIGINT) "
            "AS conf_u, "
            "CAST(TRUNC((CAST(d.s * (SELECT n FROM nb) AS DOUBLE) / "
            "CAST(ia.s * ic.s AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS lift_u "
            "FROM dir d JOIN item ia ON ia.p = d.ant "
            "JOIN item ic ON ic.p = d.cons) "
            "SELECT ant, cons, CAST(support AS BIGINT) AS support, "
            "conf_u/1e6 AS conf, lift_u/1e6 AS lift FROM r "
            "WHERE conf_u >= 250000 ORDER BY ant, cons"
        ),
        "frequent_part_pairs": (
            "WITH bk AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem), "
            "pr AS (SELECT a.p AS part_a, c.p AS part_b, COUNT(*) AS support "
            "FROM bk a JOIN bk c ON a.o = c.o AND a.p < c.p GROUP BY 1, 2) "
            "SELECT part_a, part_b, support FROM pr WHERE support >= 2 "
            "ORDER BY support DESC, part_a, part_b LIMIT 20"
        ),
    }
    # same fixed point, same oracle: the distributed engine must land on
    # the broadcast engine's recursive-CTE PageRank to the last rounded dp
    sqls["textrank_distributed"] = sqls["textrank"]
    # stratified_sample_weighted: the SAME splitmix64 A-ES chain as
    # corpus_sample_weighted (same seed, same derived randomness),
    # threaded with source and finished by a per-source top-5 window
    v = sqls["corpus_sample_weighted"]
    v = v.replace("WITH t AS (SELECT doc_id, ", "WITH t AS (SELECT doc_id, source, ")
    v = v.replace("m0 AS (SELECT doc_id, n_tok, ", "m0 AS (SELECT doc_id, source, n_tok, ")
    for st in ("x1", "s1", "x2", "s2", "s3", "k"):
        v = v.replace(f"{st} AS (SELECT doc_id, n_tok, ",
                      f"{st} AS (SELECT doc_id, source, n_tok, ")
    v = v.replace(
        "SELECT doc_id, n_tok FROM (SELECT * FROM k ORDER BY akey DESC LIMIT 50) ORDER BY doc_id",
        "SELECT source, doc_id, n_tok FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY source ORDER BY akey DESC) AS rn FROM k) WHERE rn <= 5 "
        "ORDER BY source, doc_id",
    )
    assert "LIMIT 50" not in v
    sqls["stratified_sample_weighted"] = v

    # MinHash-LSH keep-set vs the EXACT keep-set oracle: on the fixture
    # corpus the banded-MinHash pair list reaches recall AND precision
    # 1.0 against the exact 3-gram-Jaccard >= 0.5 pairs (verified at
    # sf0.001 and sf0.01), so the identical keep-set SQL is a genuine
    # external check that the sketch pipeline loses nothing here — the
    # same recall-1.0-anchored oracle style as dedup_keepset_exact.
    sqls["dedup_minhash_keep"] = sqls["dedup_keepset_exact"]

    # media_headers: ground truth comes from the payload GENERATOR's
    # parameter draws (re-derived here, independent of the sniffing
    # code), inlined as VALUES — sf-independent because the media
    # fixture is seed-fixed, not sf-derived.
    sqls["media_headers"] = _media_headers_oracle(100, seed=3)

    # lang_id / doc_fingerprint: PINNED-SNAPSHOT oracles (the kmeans
    # pattern) — deterministic pipelines whose hash primitive (pandas
    # SipHash) has no SQL form. The committed snapshot parquets are
    # produced by per-document pure-Python reimplementations written
    # from the algorithm specs (tests/independent_impls.py — no
    # pipeline code), dispatched on a content-derived md5 key so a
    # changed fixture yields an empty oracle (loud rows mismatch, never
    # a stale silent pass); pytest regenerates the snapshot and pins
    # snapshot == regeneration == live pipeline.
    sqls["lang_id"] = (
        "WITH key AS (SELECT md5(string_agg(doc_id || '|' || text || '|' || lang, "
        "chr(10) ORDER BY doc_id)) AS k FROM documents) "
        "SELECT s.doc_id, s.lang_pred, s.lang_score "
        "FROM read_parquet('/root/repo/fixtures/langid_snapshot.parquet') s, key "
        "WHERE s.key = key.k ORDER BY s.doc_id"
    )
    sqls["doc_fingerprint"] = (
        "WITH key AS (SELECT md5(string_agg(doc_id || '|' || text, "
        "chr(10) ORDER BY doc_id)) AS k FROM documents) "
        "SELECT s.doc_id, s.fp_min "
        "FROM read_parquet('/root/repo/fixtures/fingerprint_snapshot.parquet') s, key "
        "WHERE s.key = key.k ORDER BY s.doc_id"
    )

    # Deterministic-sketch pinned-snapshot oracles (same pattern): HLL /
    # MG+CMS / Count-Sketch / KMV queries are partitioning-invariant
    # and deterministic (register max, linear counters, set bottom-k;
    # MG is exact below capacity), their hash primitives (pandas
    # SipHash, splitmix64 double-hashing) have no SQL form, and the
    # snapshots are regenerated by the from-spec reimplementations in
    # tests/independent_sketches.py (no pipeline code) — pinned
    # snapshot == regeneration == live pipeline in pytest. Key dispatch
    # on the full input content (md5 of canonical row strings): any
    # fixture drift empties the oracle loudly.
    _SK = "/root/repo/fixtures/sketch_snapshots"
    _DOCS_KEY = (
        "(SELECT md5(string_agg(doc_id || '|' || text, chr(10) "
        "ORDER BY doc_id)) FROM documents)"
    )
    _DOCS_SRC_KEY = (
        "(SELECT md5(string_agg(doc_id || '|' || text || '|' || source, "
        "chr(10) ORDER BY doc_id)) FROM documents)"
    )
    _EVENTS_KEY = (
        "(SELECT md5(string_agg(event_id || '|' || CAST(epoch_us(ts) AS BIGINT) "
        "|| '|' || user_id, chr(10) ORDER BY event_id)) FROM events)"
    )
    _JOIN_KEY = (
        "md5((SELECT md5(string_agg(CAST(user_id AS VARCHAR), chr(10) "
        "ORDER BY event_id)) FROM events) || "
        "(SELECT md5(string_agg(CAST(o_custkey AS VARCHAR), chr(10) "
        "ORDER BY o_orderkey)) FROM orders))"
    )
    sqls["distinct_tokens_hll"] = (
        f"SELECT s.estimate, s.rel_error_bound FROM "
        f"read_parquet('{_SK}/distinct_tokens_hll.parquet') s "
        f"WHERE s.key = {_DOCS_KEY} ORDER BY s.ord"
    )
    sqls["heavy_hitters_cms"] = (
        f"SELECT s.tok, s.lower_cnt, s.est_cnt, s.err_bound, s.eps_bound FROM "
        f"read_parquet('{_SK}/heavy_hitters_cms.parquet') s "
        f"WHERE s.key = {_DOCS_KEY} ORDER BY s.ord"
    )
    sqls["token_f2_countsketch"] = (
        f"SELECT s.f2_estimate, s.rel_error_bound, s.point_err_bound, "
        f"s.n_tokens FROM read_parquet('{_SK}/token_f2_countsketch.parquet') s "
        f"WHERE s.key = {_DOCS_KEY} ORDER BY s.ord"
    )
    sqls["distinct_by_source_hll"] = (
        f"SELECT s.source, s.estimate, s.rel_error_bound FROM "
        f"read_parquet('{_SK}/distinct_by_source_hll.parquet') s "
        f"WHERE s.key = {_DOCS_SRC_KEY} ORDER BY s.ord"
    )
    sqls["source_overlap_kmv"] = (
        f"SELECT s.est_a, s.est_b, s.est_union, s.est_intersection, "
        f"s.est_jaccard, s.rel_error_bound FROM "
        f"read_parquet('{_SK}/source_overlap_kmv.parquet') s "
        f"WHERE s.key = {_DOCS_SRC_KEY} ORDER BY s.ord"
    )
    sqls["events_sliding_distinct_hll"] = (
        f"SELECT s.ws, s.estimate, s.rel_error_bound FROM "
        f"read_parquet('{_SK}/events_sliding_distinct_hll.parquet') s "
        f"WHERE s.key = {_EVENTS_KEY} ORDER BY s.ord"
    )
    sqls["join_size_events_orders_cs"] = (
        f"SELECT s.est_join_size, s.err_bound, s.n_left, s.n_right FROM "
        f"read_parquet('{_SK}/join_size_events_orders_cs.parquet') s "
        f"WHERE s.key = {_JOIN_KEY} ORDER BY s.ord"
    )
    sqls["quality_classifier"] = (
        f"SELECT s.n, s.tp, s.fp, s.tn, s.fn, s.accuracy, s.final_loss, "
        f"s.w_bias, s.w_log_ntok, s.w_avg_tok_len, s.w_ttr, s.w_stop_ratio "
        f"FROM read_parquet('{_SK}/quality_classifier.parquet') s "
        f"WHERE s.key = {_DOCS_SRC_KEY} ORDER BY s.ord"
    )
    sqls["dedup_minhash_lsh"] = (
        f"SELECT s.doc_a, s.doc_b, s.est_jaccard FROM "
        f"read_parquet('{_SK}/dedup_minhash_lsh.parquet') s "
        f"WHERE s.key = {_DOCS_KEY} ORDER BY s.ord"
    )
    sqls["dedup_simhash"] = (
        f"SELECT s.doc_a, s.doc_b, s.hamming FROM "
        f"read_parquet('{_SK}/dedup_simhash.parquet') s "
        f"WHERE s.key = {_DOCS_KEY} ORDER BY s.ord"
    )

    # Batch-3 pinned-snapshot oracles (tests/independent_pipelines.py):
    # the last 13 rows-only queries, all verified bitwise partition-
    # invariant (4 vs 16 cpus, 128 MiB vs 2 MiB blocks) and re-derived
    # from-spec single-process (t-digest/KLL/FD/LSH/IVF/k-means/Bloom/
    # counting-Bloom/fake-decode/lineage). Embedding and event keys
    # quantize floats to int64 at 1e-6 (half away from zero) so DuckDB
    # reproduces the Python key byte-for-byte; the three generator-
    # input queries carry the md5 of their REGENERATED input as a
    # literal (pytest pins snapshot == regeneration == live).
    _PK = "/root/repo/fixtures/pipeline_snapshots"
    _EMB_KEY = (
        "(SELECT md5(string_agg(vec_id || ':' || label || ':' || "
        "array_to_string(list_transform(embedding, e -> "
        "CAST(TRUNC(CAST(e AS DOUBLE)*1000000 + 0.5*SIGN(e)) AS BIGINT)), ','), "
        "chr(10) ORDER BY vec_id)) FROM embeddings)"
    )
    _EVENTS_VAL_KEY = (
        "(SELECT md5(string_agg(event_id || '|' || event_type, chr(10) "
        "ORDER BY event_id) || '|' || CAST(CAST(SUM(CAST(TRUNC(value*1000000 "
        "+ 0.5*SIGN(value)) AS BIGINT)) AS BIGINT) AS VARCHAR)) FROM events)"
    )
    for _name, _cols, _key in (
        ("ntok_quantiles_tdigest", "source, p50, p95, p99", _DOCS_SRC_KEY),
        ("ntok_quantiles_kll", "source, p50, p95, p99", _DOCS_SRC_KEY),
        ("bloom_retract_reprobe",
         "n_added, n_deleted, n_live, kept_contained, kept_total, "
         "retracted_contained, retracted_total, fpr_bound", _DOCS_SRC_KEY),
        ("cuckoo_retract_reprobe",
         "n_added, n_deleted, n_live, kept_contained, kept_total, "
         "retracted_contained, retracted_total, load_factor, fpr_bound",
         _DOCS_SRC_KEY),
        ("cdc_chunk_dedup",
         "source, n_chunks, bytes_total, n_dup_chunks, bytes_dup",
         _DOCS_SRC_KEY),
        ("events_value_p95_tdigest", "event_type, p50, p95", _EVENTS_VAL_KEY),
        ("events_value_cdf", "event_type, n, mean_cdf", _EVENTS_VAL_KEY),
        ("ann_lsh", "qid, vec_id, cosine", _EMB_KEY),
        ("ann_ivf", "qid, vec_id, cosine", _EMB_KEY),
        ("dedup_embedding_lsh", "vec_a, vec_b, cosine", _EMB_KEY),
        ("semantic_dedup", "vec_id, cluster, keep", _EMB_KEY),
        ("embedding_pca", "component, eigenvalue, explained_ratio", _EMB_KEY),
        ("embedding_fd_pca",
         "component, eigenvalue, explained_ratio, err_bound", _EMB_KEY),
        ("bloom_fpr_check",
         "zero_false_negatives, n_probed_pos, empirical_fpr, "
         "theoretical_bound, fpr_within_bound",
         "'2e3eefca196f910e440b4c845d209b7e'"),
        ("ann_pq", "qid, vec_id, dist_q, rank", _EMB_KEY),
        ("ann_recall_eval", "method, k, n_queries, hits, total, recall",
         _EMB_KEY),
        ("kcenter_coreset", "rank, vec_id, dist_q", _EMB_KEY),
        ("doc_graph_hyperball", "t, nf, coverage", _DOCS_SRC_KEY),
        ("doc_walk_corpus", "node, walk, step, visit", _DOCS_SRC_KEY),
        ("doc_graph_centrality", "node, harm", _DOCS_SRC_KEY),
        ("media_phash_dups", "doc_a, doc_b, hamming",
         "'251d7422a8d4986f61479c497cf2da66'"),
        ("sketch_lineage", "epoch, part, n_fragments, n_added, fill_ratio",
         "'fff67b7b5c143dc616ecae96a8fa3583'"),
        ("multimodal_features",
         "media_id, height, width, " + ", ".join(f"f{j:02d}" for j in range(14)),
         "'daec755d2111fd83705127a2f8b7145c'"),
    ):
        sqls[_name] = (
            f"SELECT {_cols} FROM read_parquet('{_PK}/{_name}.parquet') s "
            f"WHERE s.key = {_key} ORDER BY s.ord"
        )
    return sqls


def _media_headers_oracle(n: int, seed: int) -> str:
    """Expected {media_id, format, width, height, channels,
    sample_rate} straight from synth_real_headers_table's deterministic
    parameter draws (same rng stream: ws, hs, rates, chans) — the
    sniffer must recover these from raw container bytes."""
    import numpy as np

    rng = np.random.default_rng([seed, n])
    ws = rng.integers(16, 2048, n)
    hs = rng.integers(16, 2048, n)
    rates = rng.choice([8000, 16000, 44100, 48000], n)
    chans = rng.integers(1, 3, n)
    kinds = ["png", "gif", "bmp", "wav", "jpeg"]
    rows = []
    for i in range(n):
        fmt = kinds[i % 5]
        mid = f"m-{seed}-{i:06d}"
        if fmt == "wav":
            rows.append(f"('{mid}','wav',NULL,NULL,{int(chans[i])},{int(rates[i])})")
        else:
            rows.append(f"('{mid}','{fmt}',{int(ws[i])},{int(hs[i])},NULL,NULL)")
    return (
        "SELECT media_id, format, CAST(width AS BIGINT) AS width, "
        "CAST(height AS BIGINT) AS height, CAST(channels AS BIGINT) AS channels, "
        "CAST(sample_rate AS BIGINT) AS sample_rate FROM (VALUES "
        + ",".join(rows)
        + ") AS t(media_id, format, width, height, channels, sample_rate) "
        "ORDER BY media_id"
    )
