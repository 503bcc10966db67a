"""Semi-structured text operators: JSON field extraction and regex
redaction/scrubbing — the map-only parse/rewrite passes every
web-scale ingestion pipeline runs before anything relational.

Both stay entirely in Arrow: RE2 kernels (``pc.extract_regex`` /
``pc.replace_substring_regex`` / ``pc.count_substring_regex``)
vectorize over the whole batch, no per-row Python, no shuffle — the
same map-stage shape as the reference's per-record tokenize/probe
loop (`src/SkmerSplitter.cpp:91-151`), which never needs to see more
than its own block.

DuckDB's regex functions are RE2 too, so the oracle SQL
(``regexp_extract`` / ``regexp_replace(..., 'g')``) matches these
kernels byte-for-byte — the parity is engine-level, not approximate.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    from ray.data import Dataset


def extract_json_int(
    ds: "Dataset", *, col: str = "props", field: str = "k", out: str | None = None
) -> "Dataset":
    """Append int64 column ``out`` (default the field name) extracted
    from the flat JSON-object string column ``col``; rows where the
    field is absent (or the cell is null) get null.

    A full JSON parser is unnecessary for flat ``{"key": number}``
    props — one RE2 pass per batch does it. Nested/escaped JSON would
    need a real parser behind the same column contract.
    """
    out = out or field
    pat = '"' + field + r'":\s*(?P<v>-?\d+)'

    def fn(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column(col).combine_chunks(), pat)
        # struct_field propagates the no-match struct nulls to the child
        v = pc.cast(pc.struct_field(m, "v"), pa.int64())
        return t.append_column(out, v)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def json_field_stats(
    events: "Dataset", *, field: str = "k", num_partitions: int = 32
) -> "Dataset":
    """Per-event-type stats of a JSON int field in ``props``:
    {event_type, n_events, n_with_field, sum_field, avg_field}.

    Map-only extraction + one fixed-partition ``grouped_agg`` (event
    types are a bounded catalog; the combiner collapses each batch to
    one partial row per type, so shuffle volume is O(types × blocks)
    whatever the event volume).
    """
    from .agg import grouped_agg

    with_k = extract_json_int(events, col="props", field=field, out="__v")

    def widen(t: pa.Table) -> pa.Table:
        v = t.column("__v")
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "__v": pc.cast(pc.coalesce(v, pa.scalar(0, pa.int64())), pa.int64()),
                "__has": pc.cast(pc.is_valid(v), pa.int64()),
            }
        )

    agg = grouped_agg(
        with_k.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True),
        "event_type",
        {
            "n_events": ("count", None),
            "n_with_field": ("sum", "__has"),
            "sum_field": ("sum", "__v"),
        },
        num_partitions=num_partitions,
    )

    def finalize(t: pa.Table) -> pa.Table:
        avg = pc.divide(
            pc.cast(t.column("sum_field"), pa.float64()),
            pc.cast(t.column("n_with_field"), pa.float64()),
        )
        return t.append_column("avg_field", avg)

    return agg.map_batches(finalize, batch_format="pyarrow", zero_copy_batch=True)


# PII-shaped scrub rules: pattern -> replacement. RE2 syntax (no
# backrefs/lookaround) so the same pattern runs in Arrow and DuckDB.
DEFAULT_SCRUB_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\d{3}-\d{2}-\d{4}", "<SSN>"),
    ("phone", r"\d{3}[-.]\d{3}[-.]\d{4}", "<PHONE>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("number", r"\d+", "<NUM>"),
)


def redact_patterns(
    ds: "Dataset",
    *,
    col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = DEFAULT_SCRUB_RULES,
    keep_cols: tuple[str, ...] = (),
) -> "Dataset":
    """Sequential multi-rule regex scrub of ``col`` → {*keep_cols,
    redacted, n_redactions} (+ one ``n_<rule>`` count per rule).

    Rules apply IN ORDER to the progressively-scrubbed string (so an
    SSN is counted as SSN, not later double-counted by the bare-number
    rule — ordering is the standard PII-scrub precedence trick).
    Counts are taken on the pre-rule string, replacement immediately
    after, both as whole-batch RE2 kernels.
    """

    def fn(t: pa.Table) -> pa.Table:
        cur = t.column(col).combine_chunks()
        cols: dict[str, pa.Array] = {c: t.column(c) for c in keep_cols}
        total = np.zeros(t.num_rows, dtype=np.int64)
        for name, pat, repl in rules:
            cnt = pc.count_substring_regex(cur, pat)
            cnt = pc.coalesce(cnt, pa.scalar(0, cnt.type))
            cur = pc.replace_substring_regex(cur, pat, repl)
            c64 = pc.cast(cnt, pa.int64()).to_numpy(zero_copy_only=False)
            cols[f"n_{name}"] = pa.array(c64)
            total += c64
        cols["redacted"] = cur
        cols["n_redactions"] = pa.array(total)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
