"""Synthetic pre-tokenized sequence corpus (FIXTURES.md F1/F2).

The engine's canonical input per ``BASELINE.json.input_hint``:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.
Deterministic (seed-driven), Zipfian token ids over a bounded vocab,
lognormal lengths, skewed source mix — the small-scale stand-in for
the 10^12-sequence corpus. Written as multi-fragment Parquet so
``ray.data.read_parquet`` fans the read out (the reference's single
extractor thread, ``src/main.cpp:114``, is the anti-pattern this
avoids).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_000
DISJOINT_VOCAB = (50_000, 100_000)  # F2 negative range
SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_WEIGHTS = np.array([0.70, 0.15, 0.10, 0.05])

SEQUENCES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def _lengths(rng: np.random.Generator, n: int) -> np.ndarray:
    ln = rng.lognormal(mean=5.5, sigma=0.8, size=n)
    return np.clip(ln, 32, 8192).astype(np.int64)


def generate_sequences_table(
    n_rows: int,
    seed: int = 42,
    *,
    start_id: int = 0,
    vocab: int = VOCAB,
    zipf_s: float = 1.1,
) -> pa.Table:
    """One deterministic chunk of the F1 corpus as an Arrow table."""
    rng = np.random.default_rng([seed, start_id])
    lengths = _lengths(rng, n_rows)
    total = int(lengths.sum())
    if total >= (1 << 31):
        raise ValueError(
            f"{total} tokens exceed int32 list offsets — generate in chunks "
            "(write_sequences_parquet does this automatically)"
        )
    flat = ((rng.zipf(zipf_s, size=total) - 1) % vocab).astype(np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    doc_id = pa.array([f"doc-{start_id + i:08d}" for i in range(n_rows)])
    source = pa.array(rng.choice(SOURCES, size=n_rows, p=SOURCE_WEIGHTS))
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": lengths.astype(np.int32),
            "source": source,
        }
    ).cast(SEQUENCES_SCHEMA)


def generate_query_table(
    corpus: pa.Table,
    n_rows: int,
    seed: int = 43,
) -> pa.Table:
    """F2 probe input with known membership truth.

    Half the rows are verbatim copies of corpus rows (zero-FN check —
    the analog of ``inputs/query.txt`` being a prefix of the reference
    genome); half draw from the disjoint vocab range (FPR-vs-bound
    check). Adds an ``expect_member: bool`` truth column.
    """
    rng = np.random.default_rng(seed)
    n_copy = n_rows // 2
    n_neg = n_rows - n_copy
    idx = rng.choice(corpus.num_rows, size=n_copy, replace=False)
    copies = corpus.take(pa.array(np.sort(idx)))

    lo, hi = DISJOINT_VOCAB
    lengths = _lengths(rng, n_neg)
    total = int(lengths.sum())
    flat = rng.integers(lo, hi, size=total).astype(np.int32)
    offsets = np.zeros(n_neg + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    neg = pa.table(
        {
            "doc_id": pa.array([f"neg-{i:08d}" for i in range(n_neg)]),
            "tokens": pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat)),
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array(["synthetic"] * n_neg),
        }
    ).cast(SEQUENCES_SCHEMA)

    both = pa.concat_tables([copies, neg])
    expect = pa.array([True] * n_copy + [False] * n_neg)
    return both.append_column("expect_member", expect)


def write_sequences_parquet(
    path: str,
    n_rows: int,
    seed: int = 42,
    *,
    rows_per_file: int = 10_000,
    row_group_size: int = 2_000,
) -> str:
    """Write the F1 corpus as a directory of Parquet fragments.

    Chunked generation keeps peak memory bounded regardless of n_rows;
    >= 32 row groups at bench scale so the Ray read fans out.
    """
    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):
        # a smaller regeneration at the same path must not leave old
        # fragments behind (readers take the whole directory)
        if stale.startswith("part-") and stale.endswith(".parquet"):
            os.remove(os.path.join(path, stale))
    file_no = 0
    for start in range(0, n_rows, rows_per_file):
        n = min(rows_per_file, n_rows - start)
        tbl = generate_sequences_table(n, seed, start_id=start)
        pq.write_table(
            tbl,
            os.path.join(path, f"part-{file_no:05d}.parquet"),
            row_group_size=row_group_size,
        )
        file_no += 1
    return path


def read_sequences(path: str, columns: list[str] | None = None):
    """Ray Dataset over a sequences corpus directory (column-pruned)."""
    import ray.data

    return ray.data.read_parquet(path, columns=columns)
