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
