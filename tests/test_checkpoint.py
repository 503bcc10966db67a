"""Checkpoint/resume: interrupted build == uninterrupted build
(SURVEY §5.2 item 6), epoch lineage, crash-replay safety."""

import os

import numpy as np
import pytest

from bloomfilter_multithread_ray.pipelines.checkpoint import (
    build_to_completion,
    incremental_build,
    lineage_table,
    load_merged,
    read_manifest,
)
from bloomfilter_multithread_ray.sources.sequences import write_sequences_parquet
from bloomfilter_multithread_ray.state import BloomFilter

CFG = dict(
    factory=lambda: BloomFilter(1 << 16, 4),
    factory_desc={"algo": "bloom", "bits": 1 << 16, "hashes": 4},
    k=4,
    num_partitions=8,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "corpus")
    write_sequences_parquet(path, 600, seed=11, rows_per_file=100)
    return path


def _bits(shards):
    return {p: s.serialize() for p, s in sorted(shards.items())}


def test_resume_equals_uninterrupted(corpus, tmp_path):
    one = str(tmp_path / "one_shot")
    part = str(tmp_path / "interrupted")

    build_to_completion(corpus, one, **CFG)
    # interrupted: 2 fragments, "crash", resume with the rest
    incremental_build(corpus, part, max_fragments=2, **CFG)
    m = read_manifest(part)
    assert len(m["epochs"]) == 1 and len(m["epochs"][0]["fragments"]) == 2
    build_to_completion(corpus, part, **CFG)

    assert _bits(load_merged(one)) == _bits(load_merged(part))


def test_resume_is_noop_when_complete(corpus, tmp_path):
    store = str(tmp_path / "store")
    build_to_completion(corpus, store, **CFG)
    n_epochs = len(read_manifest(store)["epochs"])
    m = incremental_build(corpus, store, **CFG)
    assert len(m["epochs"]) == n_epochs  # nothing re-processed


def test_lineage_covers_all_fragments_once(corpus, tmp_path):
    store = str(tmp_path / "store")
    incremental_build(corpus, store, max_fragments=3, **CFG)
    build_to_completion(corpus, store, **CFG)
    m = read_manifest(store)
    frags = [f for e in m["epochs"] for f in e["fragments"]]
    assert len(frags) == len(set(frags)) == 6  # 600 rows / 100 per file
    lt = lineage_table(store).to_pandas()
    assert set(lt.epoch.unique()) == set(range(len(m["epochs"])))
    assert (lt.n_added > 0).any()
    assert lt.fill_ratio.between(0, 1).all()


def test_config_mismatch_refused(corpus, tmp_path):
    store = str(tmp_path / "store")
    incremental_build(corpus, store, max_fragments=1, **CFG)
    bad = dict(CFG, num_partitions=16)
    with pytest.raises(ValueError, match="config mismatch"):
        incremental_build(corpus, store, **bad)


def test_uncommitted_epoch_dir_is_replayed(corpus, tmp_path):
    """A crash AFTER writing sketches but BEFORE the manifest commit
    must not lose or double-count data: the orphan epoch dir is simply
    ignored and its fragments re-processed under the next epoch."""
    store = str(tmp_path / "store")
    incremental_build(corpus, store, max_fragments=2, **CFG)
    # simulate: epoch-0001 dir exists but manifest never committed
    orphan = os.path.join(store, "epochs", "epoch-0001")
    os.makedirs(os.path.join(orphan, "sketches"), exist_ok=True)
    build_to_completion(corpus, store, **CFG)
    one = str(tmp_path / "one_shot")
    build_to_completion(corpus, one, **CFG)
    assert _bits(load_merged(store)) == _bits(load_merged(one))


def test_empty_input_returns_immediately(tmp_path):
    empty_in = str(tmp_path / "empty_in")
    import os

    os.makedirs(empty_in, exist_ok=True)
    m = build_to_completion(empty_in, str(tmp_path / "store"), **CFG)
    assert m["epochs"] == []


def test_numpy_config_values_resume_cleanly(corpus, tmp_path):
    import numpy as np

    store = str(tmp_path / "store")
    cfg = dict(CFG, factory_desc={"algo": "bloom", "bits": np.int64(1 << 16)})
    cfg2 = dict(CFG, factory_desc={"algo": "bloom", "bits": np.int64(1 << 16)})
    incremental_build(corpus, store, max_fragments=2, **cfg)
    # resume with an equal (but freshly built, numpy-typed) config
    build_to_completion(corpus, store, **cfg2)
    assert len(read_manifest(store)["epochs"]) >= 2


def test_input_path_change_refused(corpus, tmp_path):
    """Resuming a store against a different input dir must be refused
    (silently merging two corpora's fragments into one lineage) unless
    explicitly overridden."""
    store = str(tmp_path / "store")
    incremental_build(corpus, store, max_fragments=1, **CFG)
    other = str(tmp_path / "other_corpus")
    write_sequences_parquet(other, 100, seed=12, rows_per_file=100)
    with pytest.raises(ValueError, match="resume asked"):
        incremental_build(other, store, **CFG)
    # explicit override merges (the deliberate multi-corpus case)
    m = incremental_build(other, store, allow_input_change=True, **CFG)
    assert len(m["epochs"]) == 2
