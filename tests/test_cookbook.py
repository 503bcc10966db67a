"""Executes the exact code blocks in docs/COOKBOOK.md against small
fixtures — the cookbook's claim is that its recipes run verbatim."""

import os
import re
import shutil

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def cookbook_fixtures(ray_session):
    """Build /tmp/cookbook inputs the recipes reference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = "/tmp/cookbook"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(f"{root}/corpus", exist_ok=True)
    os.makedirs(f"{root}/query", exist_ok=True)
    os.makedirs(f"{root}/sfdir", exist_ok=True)
    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 50, 40).astype(np.int32) for _ in range(200)]
    corpus = pa.table(
        {"doc_id": pa.array(np.arange(200, dtype=np.int64)),
         "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32()))}
    )
    pq.write_table(corpus, f"{root}/corpus/part.parquet")
    pq.write_table(corpus.slice(0, 20), f"{root}/query/part.parquet")
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    rows = []
    for i in range(120):
        body = " ".join(rng.choice(words, 25))
        rows.append({"doc_id": i, "text": body,
                     "lang": "en" if i % 2 == 0 else "fr",
                     "source": "new" if i % 4 == 0 else f"src{i % 3}"})
    # plant exact dup of an old doc inside "new"
    rows[4]["text"] = rows[1]["text"]
    pd.DataFrame(rows).to_parquet(f"{root}/sfdir/documents.parquet")
    yield root
    shutil.rmtree(root, ignore_errors=True)


def _blocks():
    src = open(os.path.join(os.path.dirname(__file__), "..", "docs", "COOKBOOK.md")).read()
    return re.findall(r"```python\n(.*?)```", src, re.S)


def test_cookbook_blocks_execute(cookbook_fixtures, ray_session):
    blocks = _blocks()
    assert len(blocks) == 20
    env: dict = {}
    for i, code in enumerate(blocks):
        # the first block's ray.init is owned by the session fixture
        code = code.replace(
            'ray.init(address="local", num_cpus=8, include_dashboard=False)', "pass"
        )
        exec(compile(code, f"cookbook-block-{i}", "exec"), env)  # noqa: S102
    # recipe 1: every probed gram of the corpus prefix is a member
    assert env["n_member"] > 0
    # recipe 2: the planted duplicate is NOT in new_ids, originals are
    new_ids = env["new_ids"]
    assert 4 not in set(new_ids.doc_id)
    assert len(new_ids) >= 1
    # recipe 3: keep set is a subset of doc ids
    kept = env["kept"].to_pandas()
    assert set(kept.doc_id) <= set(range(120))
    # recipe 4: shards cover all docs exactly once
    manifest = env["manifest"]
    assert manifest.n_docs.sum() == 120
    # recipe 5: sketch results sane
    assert env["distinct"]["estimate"][0] > 0
    assert len(env["heavy"]) == 7  # topk=10 > vocab of 7
    # recipe 6: gates computed for every doc; planted dup pair is dirty;
    # BPE learned at least one rule with a positive count
    assert set(env["rep"].doc_id) == set(range(120))
    assert {1, 4} <= env["dirty"]
    assert len(env["merges"]) >= 1 and env["merges"].pair_count.min() >= 2
    # recipe 10: sequences/caps/setops/grid (asserts live in the block;
    # spot-check the env shapes here)
    assert set(env["paths"].user) == set(env["grid"].user)
    # recipe 8: warehouse primitives — stores resumable, window sane,
    # detect-then-salted join exact (in-block asserts cover the rest)
    assert env["latest"].user_id.is_unique
    assert env["state"].n.sum() == 4000
    # recipe 9: audit clean, CDC classes exact, append replay no-op
    assert (env["audit"].violations == 0).all()
    assert env["replay9"].skipped.all()
