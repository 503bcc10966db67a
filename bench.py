"""Benchmark harness (driver contract + scaling evidence).

Default mode: one Ray session (``address="local"``,
``num_cpus=$RAY_GRAFT_CPUS`` default 32) over ``$GRAFT_SF_DIR``
(default ``/root/testdata/sf0.1``); times the headline pipelines and
prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "tokens_per_sec_build": ..., "merge_wall_s": ...}

``--scaling`` mode (SURVEY §4.2): runs the flagship Bloom
build+probe twice in FRESH processes — ``num_cpus=8`` then ``32`` —
on the same cached corpus and reports throughput at both plus
``efficiency = (thr_32 / thr_8) / 4`` (north-rule criterion ≥0.8),
appending the result to BASELINE.md.

The flagship input is the deterministic input_hint-shaped corpus
(doc_id, tokens:list<int32>, n_tok, source) synthesized once per sf
into /tmp (generation excluded from timing); the remaining queries
run over the driver testdata tables via ``__ray_entry__.queries()``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# corpus rows per unit sf (sf0.1 -> 20k rows, ~6.8M tokens)
ROWS_PER_SF = 200_000
BLOOM = dict(k=4, num_partitions=64, bits_per_partition=1 << 22, num_hashes=4)
SCALING_SF = 0.5  # 100k rows, ~34M tokens — big enough to amortize startup


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_path(sf: float) -> str:
    return f"/tmp/graft_corpus/sf{sf}"


def ensure_corpus(sf: float) -> str:
    """Synthesize (once) the input_hint tokens corpus for this sf."""
    from bloomfilter_multithread_ray.sources.sequences import write_sequences_parquet

    path = corpus_path(sf)
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        n_rows = max(200, int(ROWS_PER_SF * sf))
        write_sequences_parquet(path, n_rows, seed=42, rows_per_file=max(500, n_rows // 32))
        with open(done, "w") as f:
            f.write(str(n_rows))
    return path


def run_flagship(sf: float, store_dir: str, *, warm_up: int = 0, reps: int = 1) -> dict:
    """Bloom build (tokens/sec) + global merge + map-only probe.

    ``reps`` > 1 times the build that many times and reports the BEST
    (min) wall time plus all samples — a fresh Ray session reaches
    steady state only after ~2 builds and the sandbox host shows
    intermittent neighbor noise, so single-shot timings understate
    sustained throughput by up to 1.7x (measured rep sequence at 32
    cpus: 9.4 → 2.7 → 1.9 → 2.0 s for the identical build)."""
    import ray.data

    from bloomfilter_multithread_ray.pipelines.bloom import (
        build_and_store,
        load_sketch_store,
        probe_bloom,
    )

    import ray

    cpus_avail = int(ray.cluster_resources().get("CPU", 8))
    path = ensure_corpus(sf)
    # block-count rule from the measured sweep (BASELINE.md): floor of
    # max(32, cpus) for pipelining, growing with data so on-disk blocks
    # stay ~5 MB (sf2.0/303MB @ 32 cpus: 32 blocks 6.7M tok/s, 64
    # blocks 12.0M, 128 blocks 9.4M; sf0.5/78MB: 32 blocks best at
    # both 8 and 32 cpus)
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    nblocks = max(32, cpus_avail, total_bytes // (5 << 20))

    def _build():
        ds = ray.data.read_parquet(
            path, columns=["doc_id", "tokens", "n_tok"], override_num_blocks=nblocks
        )
        build_and_store(ds, store_dir, **BLOOM)

    for _ in range(int(warm_up)):
        _build()  # untimed: Ray worker-pool spin-up + imports + plasma warm
    samples = []
    for _ in range(max(1, int(reps))):
        t0 = time.perf_counter()
        _build()
        samples.append(time.perf_counter() - t0)
    build_s = min(samples)

    shards, _ = load_sketch_store(store_dir)
    t0 = time.perf_counter()
    merged = None
    for s in shards.values():
        merged = s if merged is None else merged.merge(s)
    merge_s = time.perf_counter() - t0

    n_tokens = int(
        ray.data.read_parquet(path, columns=["n_tok"]).sum("n_tok")
    )

    # size the probe actor pool to leave CPUs for the read + aggregate
    # operators (a pool equal to the whole cluster deadlocks the stream)
    t0 = time.perf_counter()
    probe = probe_bloom(
        ray.data.read_parquet(
            path, columns=["doc_id", "tokens"], override_num_blocks=nblocks
        ),
        shards,
        k=BLOOM["k"],
        num_partitions=BLOOM["num_partitions"],
        concurrency=max(2, min(12, cpus_avail // 2)),
        batch_size=2048,
    )
    n_member = int(probe.sum("member") or 0)
    probe_s = time.perf_counter() - t0

    from bloomfilter_multithread_ray.pipelines import bloom as _bloom_mod

    return {
        "build_s": build_s,
        "build_s_samples": [round(s, 3) for s in samples],
        "merge_wall_s": merge_s,
        "probe_s": probe_s,
        # which probe plan ran (matrix = stacked plasma fast path) so a
        # slow probe timing is attributable (VERDICT r2 "what's wrong" #4)
        "probe_path": _bloom_mod.LAST_PROBE_PATH,
        "n_tokens": n_tokens,
        "tokens_per_sec_build": n_tokens / build_s,
        "n_member": n_member,
    }


def run_queries(sf_dir: str) -> dict[str, float]:
    """Time a representative subset of the driver-contract queries."""
    import __ray_entry__ as E

    qs = E.queries()
    names = [
        "distinct_tokens_hll",
        "heavy_hitters_cms",
        "ntok_quantiles_tdigest",
        "tpch_q1",
        "bloom_semijoin",
        "top_customers",
        "events_hourly",
        "dedup_minhash_lsh",
        "dedup_embedding",
        "ann_topk",
        "doc_quality",
        "curate_corpus",
        "full_curation",
        "events_sessions",
        "ngram_jaccard",
        "join_orders_customer",
        "dedup_minhash_keep",
        "dedup_ngram_components",
        "tfidf_top_terms",
        "vocab_coverage",
        "length_filter_percentile",
        "full_join_customer_order_counts",
        "decontaminate",
        "mix_to_budget",
        "normalize_text",
        "events_hourly_distinct",
        "events_value_p95",
        "events_value_mad",
        "lm_perplexity",
        "label_centroids",
        "top_pmi_bigrams",
        "bloom_new_docs",
        "source_kl",
        "doc_novelty",
        "split_leakage",
        "textrank",
        "events_anomalies",
        "events_funnel",
        "bloom_join_filtered_orders",
        "kmeans_embeddings",
        "media_headers",
        "epoch_shuffle",
        "assign_splits",
        "corpus_shards",
        "json_field_stats",
        "redact_events",
        "gopher_repetition",
        "substring_dedup",
        "bpe_top_pairs",
        "bpe_merges",
        "bpe_encode_stats",
        "tpch_q6",
        "tpch_q3",
        "events_retention",
        "source_similarity",
        "triangle_count",
        "quality_classifier",
        "embedding_covariance",
        "embedding_pca",
        "events_rollup",
        "frequent_part_pairs",
        "fuzzy_token_pairs",
        "tpch_q5",
        "tpch_q10",
        "tpch_q14",
        "tpch_q18",
        "tpch_q4_late",
        "events_pivot",
        "tpch_q7",
        "tpch_q13",
        "tpch_q15",
        "tpch_q17",
        "tpch_q19",
        "tpch_q22",
        "tpch_q2",
        "tpch_q8",
        "tpch_q9",
        "tpch_q16",
        "tpch_q21",
        "tpch_q11",
        "tpch_q12",
        "tpch_q20",
        "line_dedup",
        "dedup_incremental",
        "bm25_search",
        "doc_entropy",
        "events_value_histogram",
        "semantic_dedup",
        "profile_events",
        "events_hopping",
        "skew_join_revenue",
        "events_clustered_scan",
        "incremental_user_stats",
        "composite_join_lines",
        "events_window_funcs",
        "events_unpivot",
        "events_latest_per_user",
        "bucketed_join_orders",
        "embedding_dim_stats",
        "events_value_stats_by_type",
        "validate_orders",
        "orders_snapshot_diff",
        "events_clustered_append",
        "doc_graph_kcore",
        "events_asof_click",
        "lineitem_ship_windows",
        "events_rolling",
        "chunk_docs",
        "user_event_paths",
        "docs_capped_per_source",
        "strata_lost_h2",
        "strata_stable",
        "events_resampled",
        "token_f2_exact",
        "token_f2_countsketch",
        "embedding_fd_pca",
        "events_value_hour_corr",
        "doc_graph_bfs",
        "join_size_events_orders",
        "join_size_events_orders_cs",
        "events_sliding_distinct",
        "events_sliding_distinct_hll",
        "docs_sorted_neighbors",
        "bloom_retract_reprobe",
        "dbscan_clusters",
        "parts_skyline",
        "store_bloom_lookup",
        "events_peak_concurrency",
        "events_cube",
        "store_compact_scan",
        # value-level aggregate mode (pairs_only): the exact-expansion
        # variant parts_fuzzy_names stays in the oracle gate but is
        # OUTPUT-bound (~13M expanded id pairs at sf0.1 into one
        # frame), so the bench times the engine-bound aggregate
        "parts_fuzzy_name_stats",
        "doc_graph_sssp",
        "store_zorder_scan",
        "docs_phrase_hits",
        "jsonl_ingest",
        "events_window_edges",
        "users_pattern_match",
        "events_type_hour_assoc",
        "events_value_p90_cont",
        "users_top_event_type",
        "users_type_entropy",
        "stratified_sample_weighted",
        # round-4 wave: packing/LM/weighted-dedup/embedding graph ops
        "dedup_weighted_tf",
        "strip_boilerplate",
        "mix_temperature_plan",
        "pack_sequences_text",
        "knn_graph_exact",
        "split_leakage_embedding",
        "lm_trigram_ppl",
        "embedding_jl_project",
        # round-4 wave 2: curation signals + sharding + provenance
        "pii_redaction",
        "dsir_scores",
        "zipf_by_source",
        "ccnet_ppl_buckets",
        "snake_shard_plan",
        "dedup_provenance",
        "hard_negatives",
        # round-4 wave 3: drift/privacy/placement + search/graph/ANN
        "events_decayed_activity",
        "k_anonymity_audit",
        "events_value_psi",
        "rendezvous_shards",
        "inverted_index_search",
        "doc_graph_lpa",
        "ann_pq",
        "readability_by_source",
        "media_phash_dups",
        "dedup_containment",
        "cuckoo_retract_reprobe",
        "events_debounce",
        "events_welch_t",
        "events_user_trend",
        "cdc_chunk_dedup",
        "kcenter_coreset",
        # round-4 waves 5-6: similarity joins / sketch-graph /
        # retrieval fusion / stream+basket analytics
        "parts_jw_names",
        "parts_entities",
        "doc_graph_hyperball",
        "doc_graph_centrality",
        "doc_graph_ppr",
        "doc_walk_corpus",
        "hybrid_search_rrf",
        "events_cusum_alerts",
        "events_type_markov",
        "events_decile_profile",
        "events_value_cdf",
        "customer_rfm",
        "orders_benford",
        "part_association_rules",
        "frequent_part_triples",
        "top_g2_bigrams",
        # round 5
        "ann_recall_eval",
        "events_watermark_hopping",
    ]
    times: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        try:
            res = fn(sf_dir)
            import ray.data

            if isinstance(res, ray.data.Dataset):  # force lazy plans to execute
                res.count()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — one bad query must not lose the bench
            sys.stderr.write(f"bench: query {name} failed: {type(e).__name__}: {e}\n")
            times[name] = round(time.perf_counter() - t0, 3)
    return times


def run_skmer_ab(sf: float) -> dict:
    """A/B the reference's run-length (super-k-gram) shuffle idea
    against the default map-side-combine build (VERDICT r2 #7).

    Measures, on the same cached corpus, the BYTES each strategy would
    move through the build's all-to-all (the materialized size of the
    pre-shuffle dataset) plus the full-build wall time:

      - combine: fused hash+combine partial-sketch blobs (default)
      - skmer:   minimizer-routed {part, toks} run rows
      - raw:     naive per-gram {part, gh} rows (the baseline both
                 strategies are compressing)

    Appends a table to BASELINE.md; adoption rule = only if skmer
    beats combine on bytes AND wall.
    """
    import ray.data

    from bloomfilter_multithread_ray.pipelines.bloom import (
        build_partitioned_bloom,
    )
    from bloomfilter_multithread_ray.pipelines.skmer import (
        _segment_rows_fn,
        build_partitioned_bloom_skmer,
    )
    from bloomfilter_multithread_ray.stages.kgram import make_kgram_hash_fn

    path = ensure_corpus(sf)
    B = dict(k=BLOOM["k"], num_partitions=BLOOM["num_partitions"],
             bits_per_partition=BLOOM["bits_per_partition"],
             num_hashes=BLOOM["num_hashes"])

    def read():
        return ray.data.read_parquet(path, columns=["doc_id", "tokens", "n_tok"])

    out: dict = {"metric": "skmer_ab", "sf": sf}

    # pre-shuffle bytes per strategy
    from bloomfilter_multithread_ray.state import BloomFilter
    from bloomfilter_multithread_ray.stages.sketch_agg import make_partial_combiner
    from bloomfilter_multithread_ray.functions.hashing import (
        kgram_hashes_flat,
        partition_of,
    )
    from bloomfilter_multithread_ray.stages.kgram import list_column_to_numpy

    factory = lambda: BloomFilter(B["bits_per_partition"], B["num_hashes"])  # noqa: E731
    combiner = make_partial_combiner(factory)

    def hash_and_combine(batch):
        flat, offsets = list_column_to_numpy(batch, "tokens")
        gh, _, _ = kgram_hashes_flat(flat, offsets, B["k"])
        return combiner.from_arrays(partition_of(gh, B["num_partitions"]), gh)

    combine_pre = read().map_batches(
        hash_and_combine, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    out["combine_shuffle_bytes"] = int(combine_pre.size_bytes())
    skmer_pre = read().map_batches(
        _segment_rows_fn(B["k"], B["num_partitions"], "tokens"),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    out["skmer_shuffle_bytes"] = int(skmer_pre.size_bytes())
    out["skmer_rows"] = int(skmer_pre.count())
    raw_pre = read().map_batches(
        make_kgram_hash_fn(B["k"], B["num_partitions"]),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    out["raw_shuffle_bytes"] = int(raw_pre.size_bytes())
    out["n_grams"] = int(raw_pre.count())
    del combine_pre, skmer_pre, raw_pre

    # full-build wall (warm-up once each, then timed)
    for name, builder in (
        ("combine", lambda: build_partitioned_bloom(read(), **B).materialize()),
        ("skmer", lambda: build_partitioned_bloom_skmer(read(), **B).materialize()),
    ):
        builder()
        t0 = time.perf_counter()
        builder()
        out[f"{name}_build_s"] = round(time.perf_counter() - t0, 3)

    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    gb = 1 << 30
    block = (
        f"\n## Run-length skmer A/B ({stamp}, sf={sf})\n\n"
        f"Pre-shuffle bytes (materialized size of what the build's all-to-all moves) "
        f"and full-build wall, same corpus ({out['n_grams']:,} grams):\n\n"
        f"| strategy | shuffle bytes | bytes/gram | build s |\n|---|---|---|---|\n"
        f"| raw {{part, gh}} rows | {out['raw_shuffle_bytes']:,} "
        f"| {out['raw_shuffle_bytes']/out['n_grams']:.2f} | — |\n"
        f"| map-side combine (default) | {out['combine_shuffle_bytes']:,} "
        f"| {out['combine_shuffle_bytes']/out['n_grams']:.2f} | {out['combine_build_s']} |\n"
        f"| skmer run-length (opt-in) | {out['skmer_shuffle_bytes']:,} "
        f"| {out['skmer_shuffle_bytes']/out['n_grams']:.2f} | {out['skmer_build_s']} |\n\n"
        f"Adoption rule: switch the default only if skmer wins BOTH columns.\n"
    )
    try:
        with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
            f.write(block)
    except OSError:
        pass
    return out


def _burn(args) -> int:
    """Cache-resident uint64 mul/xor loop — pure-CPU yardstick."""
    import numpy as np

    seconds = args
    a = np.arange(100_000, dtype=np.uint64)  # ~800 KB, L2-resident
    b = a.copy()
    g = np.uint64(0x9E3779B97F4A7C15)
    for _ in range(50):  # warm pages + code paths, untimed
        np.multiply(a, g, out=b)
        np.bitwise_xor(b, a, out=b)
    t_end = time.perf_counter() + seconds
    it = 0
    while time.perf_counter() < t_end:
        np.multiply(a, g, out=b)
        np.bitwise_xor(b, a, out=b)
        it += 1
    return it


def run_cpu_ceiling(low: int = 8, high: int = 32, seconds: float = 5.0) -> dict:
    """Hardware scaling ceiling, independent of Ray and of this engine.

    Runs an embarrassingly-parallel, cache-resident (no DRAM traffic,
    no shuffle, no Python in the loop) numpy kernel on ``low`` and
    ``high`` worker processes and reports aggregate throughput at both.
    The resulting efficiency is the PHYSICAL upper bound any job can
    reach between those two parallelism levels on this host — if the
    box exposes SMT siblings or overcommitted vCPUs past its physical
    cores, even a perfectly parallel job lands below 1.0 here.
    """
    import multiprocessing as mp

    agg = {}
    for n in (low, high):
        with mp.Pool(n) as p:
            agg[n] = sum(p.map(_burn, [seconds] * n))
    eff = (agg[high] / agg[low]) / (high / low)
    return {
        "metric": "cpu_scaling_ceiling",
        "value": round(eff, 4),
        "unit": "ratio",
        "procs_low": low,
        "procs_high": high,
        "iters_low": agg[low],
        "iters_high": agg[high],
    }


def scaling_child(sf: float, num_cpus: int) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        # dedicated larger corpus: the job must be long enough at the
        # low CPU count to amortize task/actor startup, else the
        # efficiency ratio measures constant overheads, not scaling
        res = run_flagship(
            SCALING_SF, f"/tmp/graft_bench_store_scaling_{num_cpus}", warm_up=2, reps=3
        )
        print("CHILD_JSON:" + json.dumps(res))
    finally:
        ray.shutdown()


def run_scaling(sf_dir: str, low: int = 4, high: int = 16) -> dict:
    sf = SCALING_SF
    ensure_corpus(sf)  # generate outside the timed children
    out = {}
    for n in (low, high):
        env = dict(os.environ)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_scaling-child",
             str(n), "--sf-dir", sf_dir],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON:")]
        if not line:
            sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
            raise RuntimeError(f"scaling child num_cpus={n} failed")
        out[n] = json.loads(line[-1][len("CHILD_JSON:"):])
    thr_lo = out[low]["tokens_per_sec_build"]
    thr_hi = out[high]["tokens_per_sec_build"]
    eff = (thr_hi / thr_lo) / (high / low)
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 4),
        "unit": "ratio",
        "sf": sf,
        "cpus_low": low,
        "cpus_high": high,
        "tokens_per_sec_low": round(thr_lo, 1),
        "tokens_per_sec_high": round(thr_hi, 1),
        "build_s_low": round(out[low]["build_s"], 3),
        "build_s_high": round(out[high]["build_s"], 3),
    }
    _record_scaling(result)
    return result


def _record_scaling(result: dict) -> None:
    """Append the measured scaling evidence to BASELINE.md."""
    path = os.path.join(REPO, "BASELINE.md")
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    block = (
        f"\n## Measured scaling evidence ({stamp})\n\n"
        f"Flagship Bloom build (tokens/sec) on the same cached corpus "
        f"(sf={result['sf']}), fresh `ray.init(address=\"local\")` processes:\n\n"
        f"| num_cpus | build s | tokens/sec |\n|---|---|---|\n"
        f"| {result['cpus_low']} | {result['build_s_low']} | {result['tokens_per_sec_low']} |\n"
        f"| {result['cpus_high']} | {result['build_s_high']} | {result['tokens_per_sec_high']} |\n\n"
        f"Scaling efficiency (thr_high/thr_low)/{result['cpus_high'] // result['cpus_low']} "
        f"= **{result['value']}** (north-rule criterion: >= 0.8).\n"
    )
    try:
        with open(path, "a") as f:
            f.write(block)
    except OSError:
        pass


def ensure_docs_corpus(mult: int, src: str = "/root/testdata/sf0.1") -> str:
    """Deterministic ``mult``× replication of the sf0.1 documents table
    (doc_id remapped per replica; text byte-identical — the dup-heavy
    shape of a real crawl) → one parquet file per replica under /tmp."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"/tmp/graft_docs/x{mult}"
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        os.makedirs(path, exist_ok=True)
        t = pq.read_table(
            os.path.join(src, "documents.parquet"), columns=["doc_id", "text"]
        )
        import numpy as np

        base = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        for i in range(mult):
            rt = pa.table(
                {"doc_id": pa.array(base + i * 10_000_000),
                 "text": t.column("text")}
            )
            pq.write_table(rt, os.path.join(path, f"part_{i:03d}.parquet"))
        with open(done, "w") as f:
            f.write("ok")
    return path


def _stats_table(stats_text: str) -> list:
    """Extract (operator, rows_total, bytes_total, peak_heap_mib) per
    (sub)operator from a Dataset.stats() dump."""
    import re

    out = []
    name = None
    rows = size = heap = None
    for line in stats_text.splitlines():
        m = re.match(r"\s*(?:Operator \d+|Suboperator \d+) (.+?):", line)
        if m:
            if name is not None:
                out.append((name, rows, size, heap))
            name, rows, size, heap = m.group(1), None, None, None
            continue
        m = re.search(r"Output num rows per block:.* ([\d.]+) total", line)
        if m:
            rows = int(float(m.group(1)))
        m = re.search(r"Output size bytes per block:.* ([\d.]+) total", line)
        if m:
            size = int(float(m.group(1)))
        m = re.search(r"Peak heap memory usage \(MiB\): [\d.]+ min, ([\d.]+) max", line)
        if m:
            heap = max(heap or 0.0, float(m.group(1)))
    if name is not None:
        out.append((name, rows, size, heap))
    return out


def run_rehearsal(mult: int = 20) -> dict:
    """100×-rehearsal (VERDICT r3 #3): the full pretraining-curation
    chain — Gopher gate → line dedup → MinHash keep-set → split
    assignment → staged sink + train shards — as ONE streaming job
    over a ``mult``× replication of sf0.1 (mult=20 ≈ sf2.0), with the
    per-operator shuffle volumes from ds.stats() recorded so the
    no-corpus-materialization claim is measured, not asserted."""
    import shutil

    import ray
    import ray.data

    from bloomfilter_multithread_ray.pipelines.curation import pretrain_curation

    path = ensure_docs_corpus(mult)
    shard_dir = "/tmp/graft_pretrain_shards"
    shutil.rmtree(shard_dir, ignore_errors=True)

    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    n_docs = docs.count()
    stats: dict = {}
    t0 = time.perf_counter()
    rep = pretrain_curation(
        docs, shard_dir=shard_dir, shard_size=2000, stats_out=stats
    )
    wall = time.perf_counter() - t0

    ops = _stats_table(stats.get("curation_write", ""))

    # Stage probes (untimed, labeled): the chain's shuffles execute in
    # internal passes whose Dataset handles the composition consumes
    # (line-dedup segment counts, signature bands, CC, anti-join), so
    # re-drive each stage once with a held handle to capture its
    # ds.stats() operator table. Re-execution is the probe's cost, not
    # the job's.
    from bloomfilter_multithread_ray.pipelines.curation import line_dedup
    from bloomfilter_multithread_ray.pipelines.dedup import minhash_lsh_pairs
    from bloomfilter_multithread_ray.pipelines.graph import keep_set_distributed
    from bloomfilter_multithread_ray.pipelines.repetition import gopher_gate

    probes = {}
    rw = line_dedup(
        gopher_gate(docs), sep=" ", min_frac=(19, 20)
    ).select_columns(["doc_id", "text"])
    def _consume(ds) -> int:
        # stream-consume (no materialization) so ds.stats() populates;
        # count() takes a metadata shortcut that skips stats
        n = 0
        for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
            n += b.num_rows
        return n

    rw_rows = _consume(rw)
    probes["line_dedup"] = _stats_table(rw.stats())
    kept_ids = keep_set_distributed(
        rw, minhash_lsh_pairs(rw, threshold=0.5, dedupe=False),
        num_partitions=16,
    )
    kept_rows = _consume(kept_ids)
    probes["minhash_keepset"] = _stats_table(kept_ids.stats())

    all_ops = ops + [o for t in probes.values() for o in t]
    shuffle_bytes = sum(
        b for (n, r, b, h) in all_ops
        if b and ("Aggregate" in n or "Sort" in n or "Shuffle" in n)
    )
    peak_heap = max((h for (_, _, _, h) in all_ops if h is not None), default=0.0)
    n_shards = 0
    train_dir = os.path.join(shard_dir, "train")
    if os.path.isdir(train_dir):
        n_shards = len([d for d in os.listdir(train_dir) if d.startswith("shard=")])
    return {
        "metric": "pretrain_curation_rehearsal",
        "mult": mult,
        "corpus_docs": int(n_docs),
        "wall_s": round(wall, 2),
        "report": {
            r["split"]: {"n_docs": int(r["n_docs"]), "total_tok": int(r["total_tok"])}
            for _, r in rep.iterrows()
        },
        "train_shards": n_shards,
        "rewritten_docs": int(rw_rows),
        "keepset_docs": int(kept_rows),
        "curation_pass_ops": [
            {"op": n, "rows": r, "bytes": b, "peak_heap_mib": h}
            for (n, r, b, h) in ops
        ],
        "stage_probe_ops": {
            k: [{"op": n, "rows": r, "bytes": b, "peak_heap_mib": h}
                for (n, r, b, h) in t]
            for k, t in probes.items()
        },
        "shuffle_bytes_total": int(shuffle_bytes),
        "peak_task_heap_mib": peak_heap,
    }


def run_inc_rehearsal(mult: int = 20, base_frac: float = 0.8) -> dict:
    """Incremental-dedup-store rehearsal: build the LSH index over the
    first ``base_frac`` of a ``mult``× replicated sf0.1 corpus (every
    replica's text is byte-identical — the dup-heavy crawl shape), then
    probe the remaining replicas as the increment. Every increment doc
    with >= k tokens is an exact duplicate of a base doc, so the
    expected outcome is fully determined: survivors == shingle-less
    docs only, and every drop's ``dup_of`` is a base doc. Reports
    walls, store footprint, and the store rows actually read by the
    probe (the partition-pruning evidence)."""
    import shutil

    import pyarrow.parquet as pq_

    import ray.data

    from bloomfilter_multithread_ray.pipelines.dedup import (
        build_minhash_store,
        load_minhash_store_manifest,
        minhash_increment,
    )

    path = ensure_docs_corpus(mult)
    n_base_reps = max(1, int(mult * base_frac))
    split_id = n_base_reps * 10_000_000
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    base = docs.filter(expr=f"doc_id < {split_id}")
    inc = docs.filter(expr=f"doc_id >= {split_id}")
    store = "/tmp/graft_lsh_rehearsal_store"
    shutil.rmtree(store, ignore_errors=True)

    t0 = time.perf_counter()
    manifest = build_minhash_store(base, store)
    build_s = time.perf_counter() - t0
    store_bytes = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(store) for f in fs
    )
    t1 = time.perf_counter()
    res = minhash_increment(inc, store)
    inc_s = time.perf_counter() - t1

    n_inc = len(res)
    kept = res[res["keep"]]
    drops = res[~res["keep"]]
    # correctness of the rehearsal itself: every dup_of is a base doc,
    # and survivors are exactly the shingle-less (< 3-token) docs
    assert (drops["dup_of"] < split_id).all(), "dup_of must be a base doc"
    t = pq_.read_table(
        os.path.join(path, "part_000.parquet"), columns=["doc_id", "text"]
    )
    short = {
        int(d) for d, x in zip(t.column("doc_id").to_pylist(),
                               t.column("text").to_pylist())
        if len([w for w in x.split(" ") if w]) < 3
    }
    assert set(kept["doc_id"] % 10_000_000) == short, (
        "survivors must be exactly the shingle-less docs"
    )
    return {
        "metric": "incremental_dedup_rehearsal",
        "mult": mult,
        "n_base_docs": int(base.count()),
        "n_increment_docs": n_inc,
        "store_build_s": round(build_s, 3),
        "store_bytes": int(store_bytes),
        "store_band_rows": manifest["n_band_rows"],
        "increment_s": round(inc_s, 3),
        "n_kept": int(len(kept)),
        "n_dropped": int(len(drops)),
        "docs_per_sec_increment": round(n_inc / inc_s, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--skmer-ab", action="store_true",
                    help="A/B the run-length skmer build against the "
                         "map-side-combine default (bytes + wall)")
    ap.add_argument("--rehearsal", action="store_true",
                    help="run the pretraining-curation chain end-to-end "
                         "over a --rehearsal-mult x replication of sf0.1 "
                         "and report per-operator shuffle volumes")
    ap.add_argument("--rehearsal-mult", type=int, default=20)
    ap.add_argument("--inc-rehearsal", action="store_true",
                    help="incremental-dedup-store rehearsal: build the "
                         "LSH index over 80%% of a --rehearsal-mult x "
                         "replicated sf0.1 corpus, probe the rest")
    ap.add_argument("--cpu-ceiling", action="store_true",
                    help="measure the host's hardware scaling ceiling "
                         "(pure-CPU, Ray-free) between --low and --high procs")
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--_scaling-child", type=int, default=None, dest="scaling_child")
    args = ap.parse_args()

    sf = _sf_of(args.sf_dir)

    if args.scaling_child is not None:
        scaling_child(sf, args.scaling_child)
        return

    if args.cpu_ceiling:
        print(json.dumps(run_cpu_ceiling(args.low, args.high)))
        return

    if args.rehearsal:
        import ray

        if not ray.is_initialized():
            ray.init(address="local",
                     num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                     include_dashboard=False)
        try:
            print(json.dumps(run_rehearsal(args.rehearsal_mult)))
        finally:
            ray.shutdown()
        return

    if args.inc_rehearsal:
        import ray

        if not ray.is_initialized():
            ray.init(address="local",
                     num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                     include_dashboard=False)
        try:
            print(json.dumps(run_inc_rehearsal(args.rehearsal_mult)))
        finally:
            ray.shutdown()
        return

    if args.skmer_ab:
        import ray

        if not ray.is_initialized():
            ray.init(address="local",
                     num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                     include_dashboard=False)
        try:
            print(json.dumps(run_skmer_ab(2.0)))
        finally:
            ray.shutdown()
        return

    if args.scaling:
        print(json.dumps(run_scaling(args.sf_dir, args.low, args.high)))
        return

    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    try:
        flag = run_flagship(sf, "/tmp/graft_bench_store", warm_up=1)
        queries = {"bloom_build": round(flag["build_s"], 3),
                   "bloom_probe": round(flag["probe_s"], 3)}
        probe_path = flag.get("probe_path")
        queries.update(run_queries(args.sf_dir))
        # value sums only the TIMED sections (corpus synthesis and the
        # warm-up build are excluded, exactly as documented)
        total = round(sum(queries.values()) + flag["merge_wall_s"], 3)
        result = {
            "metric": "pipeline_wall_time",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "num_cpus": num_cpus,
            "probe_path": probe_path,
            "tokens_per_sec_build": round(flag["tokens_per_sec_build"], 1),
            "merge_wall_s": round(flag["merge_wall_s"], 4),
            "n_tokens": flag["n_tokens"],
        }
        # The bench recorder keeps only the last ~2000 chars of stdout and
        # parses the JSON line from that window, so the complete per-query
        # dict is persisted to TWO committed artifacts: BENCH_FULL.json
        # (latest run, human-diffable indent) and BENCH_HISTORY.jsonl
        # (append-only, one UTC-stamped compact record per run — any two
        # rounds diff machine-checkably from the repo alone, which the
        # truncated driver artifact cannot provide). The stdout line is
        # slimmed — slowest queries first, compact separators — until it
        # fits the window.
        import datetime

        try:
            with open(os.path.join(REPO, "BENCH_FULL.json"), "w") as f:
                json.dump(result, f, indent=1, sort_keys=True)
            rec = dict(result)
            rec["utc"] = datetime.datetime.now(
                datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
            with open(os.path.join(REPO, "BENCH_HISTORY.jsonl"), "a") as f:
                f.write(json.dumps(rec, sort_keys=True,
                                   separators=(",", ":")) + "\n")
        except OSError as e:  # never lose the stdout contract to a disk error
            sys.stderr.write(f"bench: could not write BENCH artifacts: {e}\n")
        line = json.dumps(result, separators=(",", ":"))
        if len(line) > 1900:
            slim = dict(result)
            slim["queries_truncated"] = True
            slim["n_queries_total"] = len(queries)
            slim["queries_full_file"] = "BENCH_FULL.json + BENCH_HISTORY.jsonl"
            slim["queries"] = {}
            for k, v in sorted(queries.items(), key=lambda kv: -kv[1]):
                slim["queries"][k] = v
                if len(json.dumps(slim, separators=(",", ":"))) > 1900:
                    del slim["queries"][k]
                    break
            line = json.dumps(slim, separators=(",", ":"))
        print(line)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
