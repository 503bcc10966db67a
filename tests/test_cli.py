"""CLI driver parity: build / probe / split subcommands end-to-end
(the reference CLI contract, SURVEY §2 #16, implemented as intended)."""

import json
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from bloomfilter_multithread_ray.sources.sequences import write_sequences_parquet


@pytest.mark.slow
def test_cli_build_probe_split(tmp_path):
    corpus = str(tmp_path / "corpus")
    write_sequences_parquet(corpus, 200, seed=31, rows_per_file=100)
    store = str(tmp_path / "store")
    result = str(tmp_path / "result")
    split = str(tmp_path / "split")

    def run(*cli):
        p = subprocess.run(
            [sys.executable, "-m", "bloomfilter_multithread_ray", *cli],
            capture_output=True, text=True, timeout=300,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return json.loads(p.stdout.strip().splitlines()[-1])

    out = run("build", corpus, store, "-k", "4", "-P", "8", "-m", "65536")
    assert out["config"]["num_partitions"] == 8

    out = run("probe", corpus, store, result, "--sorted")
    t = pq.read_table(result)
    assert t.num_rows == out["rows"] > 0
    # probing the build corpus: zero false negatives
    assert all(t.column("member").to_pylist())

    out = run("split", corpus, split, "-k", "4", "-P", "8", "--explode")
    assert out["rows"] == t.num_rows  # same gram count both paths


def test_cli_build_probe_revcomp(ray_session, tmp_path):
    """--canonical --revcomp builds persist complement='dna' and the
    probe of the reverse-complement strand is all-member."""
    import json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from bloomfilter_multithread_ray.__main__ import _run
    from bloomfilter_multithread_ray.functions.hashing import DNA_COMPLEMENT

    rng = np.random.default_rng(9)
    seqs = [rng.integers(0, 4, size=80).astype(np.int32) for _ in range(4)]
    data = str(tmp_path / "data.parquet")
    query = str(tmp_path / "query.parquet")
    pq.write_table(pa.table(
        {"doc_id": pa.array([f"s{i}" for i in range(4)]),
         "tokens": pa.array([list(map(int, s)) for s in seqs], pa.list_(pa.int32()))}
    ), data)
    pq.write_table(pa.table(
        {"doc_id": pa.array([f"s{i}" for i in range(4)]),
         "tokens": pa.array(
             [list(map(int, DNA_COMPLEMENT[s][::-1])) for s in seqs], pa.list_(pa.int32())
         )}
    ), query)
    store = str(tmp_path / "store")
    out = str(tmp_path / "result")

    import argparse
    ns = argparse.Namespace(
        cmd="build", data_in=data, store=store, k=9, partitions=8,
        bits=1 << 16, hashes=4, salt_bits=0, canonical=True, revcomp=True,
    )
    assert _run(ns) == 0
    cfg = json.load(open(f"{store}/manifest.json"))
    assert cfg["complement"] == "dna" and cfg["canonical"] is True

    ns = argparse.Namespace(
        cmd="probe", query_in=query, store=store, result_out=out,
        routed=False, sorted=False,
    )
    assert _run(ns) == 0
    res = pq.read_table(out)
    assert res.num_rows == 4 * (80 - 9 + 1)
    assert all(res.column("member").to_pylist())


def test_cli_query_subcommand(tmp_path):
    def run(*cli):
        p = subprocess.run(
            [sys.executable, "-m", "bloomfilter_multithread_ray", *cli],
            capture_output=True, text=True, timeout=300,
            cwd="/root/repo",
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return p.stdout

    # list enumerates the driver contract
    names = run("query", "list").split()
    assert "tpch_q1" in names and "events_hourly" in names

    out = str(tmp_path / "q1.parquet")
    js = json.loads(
        run("query", "tpch_q1", "/root/testdata/sf0.001", "-o", out)
        .strip().splitlines()[-1]
    )
    assert js["rows"] > 0
    t = pq.read_table(out)
    assert t.num_rows == js["rows"]

    # unknown name fails cleanly
    p = subprocess.run(
        [sys.executable, "-m", "bloomfilter_multithread_ray", "query", "nope"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert p.returncode != 0 and "unknown query" in p.stderr
