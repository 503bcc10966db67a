"""FASTA → token table (reference-parity source).

Re-expresses the reference's FastaReader semantics
(``src/FastaReader.cpp:25-48``: skip ``>`` header lines, keep only
case-insensitive ACGT, drop everything else) as a tokenizer to
``tokens: list<int32>`` with the reference's 2-bit code
A→0, C→1, T→2, G→3 (``src/Kmer.cpp:28-31``: ``(c>>1)&3``).
Used by the golden genome-parity fixture (FIXTURES.md F3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# (ord(c) >> 1) & 3 for ACGT gives A:0 C:1 T:2 G:3 — same table as the
# reference's packing, applied vectorized.
_CODE = np.full(256, -1, dtype=np.int8)
for ch, code in (("A", 0), ("C", 1), ("T", 2), ("G", 3)):
    _CODE[ord(ch)] = code
    _CODE[ord(ch.lower())] = code


def read_fasta_tokens(path: str) -> list[tuple[str, np.ndarray]]:
    """Parse a FASTA file into [(seq_id, int32 token array), ...]."""
    out: list[tuple[str, np.ndarray]] = []
    seq_id = None
    chunks: list[np.ndarray] = []

    def flush():
        if seq_id is not None:
            arr = (
                np.concatenate(chunks).astype(np.int32)
                if chunks
                else np.empty(0, dtype=np.int32)
            )
            out.append((seq_id, arr))

    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line.startswith(b">"):
                flush()
                seq_id = line[1:].split()[0].decode() if len(line) > 1 else ""
                chunks = []
            elif line and seq_id is not None:
                codes = _CODE[np.frombuffer(line, dtype=np.uint8)]
                chunks.append(codes[codes >= 0])  # drop non-ACGT silently
    flush()
    return out


def fasta_to_table(path: str, source: str = "fasta") -> pa.Table:
    """FASTA file → sequences table (input_hint schema)."""
    from .sequences import SEQUENCES_SCHEMA

    seqs = read_fasta_tokens(path)
    return pa.table(
        {
            "doc_id": pa.array([s for s, _ in seqs]),
            "tokens": pa.array([t for _, t in seqs], type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for _, t in seqs], type=pa.int32()),
            "source": pa.array([source] * len(seqs)),
        }
    ).cast(SEQUENCES_SCHEMA)
