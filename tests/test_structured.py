"""Unit tests for pipelines/structured.py and the epoch-shuffle /
global-rank operators in pipelines/curation.py."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from bloomfilter_multithread_ray.pipelines import curation as C
from bloomfilter_multithread_ray.pipelines import structured as S


def _ds(ray, table: pa.Table, parallelism=3):
    import ray.data as rd

    return rd.from_arrow(table).repartition(parallelism)


def test_extract_json_int_nulls_and_negatives(ray_session):
    t = pa.table(
        {"rid": pa.array([0, 1, 2, 3, 4], pa.int64()),
         "props": pa.array(['{"k": 69}', '{"k": -7}', "{}", None, '{"j": 5}'])}
    )
    out = (
        S.extract_json_int(_ds(ray_session, t), col="props", field="k")
        .to_pandas()
        .sort_values("rid")  # block order from to_pandas is nondeterministic
        .reset_index(drop=True)
    )
    got = out["k"].tolist()
    assert got[0] == 69 and got[1] == -7
    assert all(pd.isna(x) for x in got[2:])


def test_redact_rule_ordering_counts_specific_before_generic(ray_session):
    # the SSN must be consumed by the ssn rule, not double-counted by
    # the bare-number rule; emails scrub before their digits can match
    t = pa.table(
        {
            "id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "reach me at bob@example.com or 555-12-3456",
                    "ip 10.0.0.1 port 8080",
                    "no pii here",
                ]
            ),
        }
    )
    out = (
        S.redact_patterns(_ds(ray_session, t), col="text", keep_cols=("id",))
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out.redacted[0] == "reach me at <EMAIL> or <SSN>"
    assert out.n_email[0] == 1 and out.n_ssn[0] == 1 and out.n_number[0] == 0
    assert out.redacted[1] == "ip <IP> port <NUM>"
    assert out.n_ipv4[1] == 1 and out.n_number[1] == 1
    assert out.n_redactions.tolist() == [2, 2, 0]


def test_global_rank_is_total_order_and_partition_independent(ray_session):
    rng = np.random.default_rng(11)
    h = rng.integers(0, 1 << 63, 5000, dtype=np.int64).astype(np.uint64)
    h = np.unique(h)  # ranks of duplicates are ambiguous; keys unique
    t = pa.table({"h": pa.array(h), "doc_id": pa.array(np.arange(len(h)))})
    outs = []
    for par in (2, 7):
        df = (
            C.global_rank_uniform(_ds(ray_session, t, par), key_col="h", num_buckets=16)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        outs.append(df)
    a, b = outs
    pd.testing.assert_frame_equal(a[["rank", "h", "doc_id"]], b[["rank", "h", "doc_id"]])
    # rank is exactly 0..n-1 in ascending h order
    assert a["rank"].tolist() == list(range(len(h)))
    assert (a["h"].to_numpy() == np.sort(h)).all()


def test_epoch_shuffle_is_permutation_and_epoch_dependent(ray_session):
    t = pa.table({"doc_id": pa.array(np.arange(300, dtype=np.int64))})
    p1 = C.epoch_shuffle_plan(_ds(ray_session, t), epoch=1).to_pandas()
    p2 = C.epoch_shuffle_plan(_ds(ray_session, t), epoch=2).to_pandas()
    assert sorted(p1.doc_id) == list(range(300))
    assert sorted(p1["rank"]) == list(range(300))
    o1 = p1.sort_values("rank").doc_id.tolist()
    o2 = p2.sort_values("rank").doc_id.tolist()
    assert o1 != o2  # distinct permutation per epoch
    # reproducible
    p1b = C.epoch_shuffle_plan(_ds(ray_session, t, 5), epoch=1).to_pandas()
    assert p1b.sort_values("rank").doc_id.tolist() == o1


def test_global_rank_rejects_bad_bucket_count(ray_session):
    t = pa.table({"h": pa.array(np.array([1, 2], dtype=np.uint64))})
    with pytest.raises(ValueError):
        C.global_rank_uniform(_ds(ray_session, t, 1), key_col="h", num_buckets=3)
