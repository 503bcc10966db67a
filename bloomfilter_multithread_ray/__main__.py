"""CLI driver — the working replacement of the reference's ``main``.

The reference parses ``data_in query_in result_out k m t`` but ignores
them (inverted argc guard + hardcoded paths, SURVEY §8.1). This CLI
implements the *intended* contract over the three pipeline shapes:

    python -m bloomfilter_multithread_ray build  DATA_IN  STORE  [-k K] [-P parts] [-m bits] [-K hashes]
    python -m bloomfilter_multithread_ray probe  QUERY_IN STORE RESULT_OUT [--routed] [--sorted]
    python -m bloomfilter_multithread_ray split  DATA_IN  OUT_DIR [-k K] [-P parts] [--explode]
    python -m bloomfilter_multithread_ray query  NAME [SF_DIR] [-o OUT.parquet]

- ``build``: entry point A (``src/main.cpp:114-135``) — corpus →
  partitioned Bloom sketch store (+ manifest, lineage metrics).
- ``probe``: entry point B (``src/main.cpp:142-264``) — query table →
  {doc_id, pos, member} parquet, position-ordered with ``--sorted``
  (replaces the reference's bounded output ring).
- ``split``: entry point C (the dead ``splitIntoFile`` consumer,
  ``src/SkmerSplitter.cpp:15-59``) — k-gram rows written as
  hash-partitioned parquet, one row per k-gram (``--explode`` adds
  the doc_id/pos identity columns — the ``split_skmer_into_kmers``
  flag's identity-preserving mode).

Inputs are input_hint-schema parquet (doc_id, tokens, n_tok, source).
Owns its Ray session (guarded init; the driver contract in
``__ray_entry__`` never calls this path).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bloomfilter_multithread_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("data_in")
    b.add_argument("store")
    b.add_argument("-k", type=int, default=8, help="k-gram length (reference k=31 for DNA)")
    b.add_argument("-P", "--partitions", type=int, default=64)
    b.add_argument("-m", "--bits", type=int, default=1 << 22, help="bits per partition")
    b.add_argument("-K", "--hashes", type=int, default=4, help="1 = reference parity mode")
    b.add_argument("--salt-bits", type=int, default=0)
    b.add_argument(
        "--canonical", action="store_true",
        help="canonicalize each k-gram with its reverse (strand-agnostic)",
    )
    b.add_argument(
        "--revcomp", action="store_true",
        help="with --canonical: reverse-COMPLEMENT canonicalization over the "
        "DNA code table A:0 C:1 T:2 G:3 (the reference's ntHash NTC64 behavior)",
    )

    p = sub.add_parser("probe")
    p.add_argument("query_in")
    p.add_argument("store")
    p.add_argument("result_out")
    p.add_argument("--routed", action="store_true", help="route by partition instead of broadcasting the store")
    p.add_argument("--sorted", action="store_true", help="global (doc_id, pos) order in the output")

    s = sub.add_parser("split")
    s.add_argument("data_in")
    s.add_argument("out_dir")
    s.add_argument("-k", type=int, default=8)
    s.add_argument("-P", "--partitions", type=int, default=64)
    s.add_argument("--explode", action="store_true",
                   help="add doc_id/pos identity columns (rows are always one per k-gram)")

    q = sub.add_parser(
        "query", help="run any driver-contract query against an sf_dir"
    )
    q.add_argument("name", help="a queries() key, or 'list' to enumerate")
    q.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    q.add_argument("-o", "--out", default=None,
                   help="write the result as parquet instead of printing a summary")
    q.add_argument("--head", type=int, default=10)

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        return _run(args)
    finally:
        ray.shutdown()


def _run(args) -> int:
    import ray.data

    if args.cmd == "build":
        from .pipelines.bloom import build_and_store

        if args.revcomp and not args.canonical:
            raise SystemExit("--revcomp requires --canonical")
        ds = ray.data.read_parquet(args.data_in, columns=["tokens"])
        manifest = build_and_store(
            ds,
            args.store,
            k=args.k,
            num_partitions=args.partitions,
            bits_per_partition=args.bits,
            num_hashes=args.hashes,
            canonical=args.canonical,
            complement="dna" if args.revcomp else None,
            salt_bits=args.salt_bits,
        )
        print(json.dumps({"store": args.store, "config": {kk: manifest[kk] for kk in
                          ("algo", "k", "num_partitions", "bits_per_partition", "num_hashes")}}))
        return 0

    if args.cmd == "probe":
        from .pipelines.bloom import load_sketch_store, probe_bloom, probe_bloom_routed

        with open(f"{args.store}/manifest.json") as f:
            cfg = json.load(f)
        ds = ray.data.read_parquet(args.query_in, columns=["doc_id", "tokens"])
        canonical = bool(cfg.get("canonical", False))  # must match the build
        complement = cfg.get("complement")  # e.g. "dna" (revcomp builds)
        partition_fn = cfg.get("partition_fn", "hash")  # must match the build
        if args.routed:
            if partition_fn != "hash":
                raise SystemExit(
                    f"probe --routed supports only hash-partitioned stores "
                    f"(manifest partition_fn={partition_fn!r})"
                )
            out = probe_bloom_routed(
                ds, args.store, k=cfg["k"], num_partitions=cfg["num_partitions"],
                canonical=canonical, complement=complement,
            )
        else:
            shards, _ = load_sketch_store(args.store)
            out = probe_bloom(
                ds, shards, k=cfg["k"], num_partitions=cfg["num_partitions"],
                canonical=canonical, complement=complement,
                partition_mode=partition_fn,
            )
        if args.sorted:
            out = out.sort(["doc_id", "pos"])
        out.write_parquet(args.result_out)
        n = ray.data.read_parquet(args.result_out).count()
        print(json.dumps({"result": args.result_out, "rows": n}))
        return 0

    if args.cmd == "split":
        from .stages.kgram import make_kgram_hash_fn

        ds = ray.data.read_parquet(args.data_in, columns=["doc_id", "tokens"])
        fn = make_kgram_hash_fn(
            args.k, args.partitions, with_identity=args.explode
        )
        grams = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
        # hash-partitioned layout: one directory per partition — the
        # resumable-output shape (skip finished partitions on re-run)
        grams.write_parquet(args.out_dir, partition_cols=["part"])
        # count from the written output's metadata — re-counting the
        # lazy `grams` would re-execute the whole pipeline
        n = ray.data.read_parquet(args.out_dir).count()
        print(json.dumps({"out": args.out_dir, "rows": n}))
        return 0

    if args.cmd == "query":
        import importlib.util
        import os

        # the driver contract lives at the repo root, beside this package
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", os.path.join(root, "__ray_entry__.py")
        )
        entry = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(entry)
        qs = entry.queries()
        if args.name == "list":
            for k in sorted(qs):
                print(k)
            return 0
        if args.name not in qs:
            raise SystemExit(f"unknown query {args.name!r} (try 'list')")
        res = qs[args.name](args.sf_dir)
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, pa.Table):
            df = res.to_pandas()
        elif isinstance(res, pd.DataFrame):
            df = res
        else:
            df = res.to_pandas()  # ray Dataset
        if args.out:
            df.to_parquet(args.out)
            print(json.dumps({"query": args.name, "rows": len(df), "out": args.out}))
        else:
            print(df.head(args.head).to_string())
            print(json.dumps({"query": args.name, "rows": len(df),
                              "cols": list(map(str, df.columns))}))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
