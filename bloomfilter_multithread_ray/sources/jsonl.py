"""Fault-tolerant JSONL source — the training-data interchange format.

Real crawled JSONL is dirty: truncated lines, stray non-JSON records,
schema drift. ``read_jsonl`` streams the files through Ray's line
reader (parallel by file/block, exactly like every other source here)
and parses per batch with an explicit malformed-line POLICY instead of
dying mid-job:

- ``on_error="skip"``   — drop bad lines, count them in a ``_bad``
  tally column consumers can aggregate (the honesty rule: silent
  truncation reads as "covered everything");
- ``on_error="keep"``   — route bad lines to ``{_raw, _error}`` rows
  (a dead-letter stream filterable with ``is_valid("_error")``);
- ``on_error="raise"``  — fail fast (strict ingestion).

Fields are projected to ``columns`` with missing keys as nulls —
schema drift degrades to nulls, never to a crash. Values are kept in
four stable Arrow types (int64 / float64 / string / bool per the
``schema`` map); nested values under a projected column are rejected
by default (``json_strings=True`` re-encodes them as JSON strings).

Reference analog: the FASTA reader's silent-drop of non-ACGT chars
(``src/FastaReader.cpp:33-42``) is the same contract — a source must
define what happens to malformed input, not inherit a crash.
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    from ray.data import Dataset

_TYPES = {"int": pa.int64(), "float": pa.float64(),
          "str": pa.string(), "bool": pa.bool_()}
_CASTS = {"int": int, "float": float, "str": str, "bool": bool}


def read_jsonl(
    paths: "str | list[str]",
    columns: "dict[str, str]",
    *,
    on_error: str = "skip",
    json_strings: bool = False,
) -> "Dataset":
    """Read JSONL into ``columns`` = {name: "int"|"float"|"str"|"bool"}.

    Returns a Dataset of the projected columns plus ``_bad`` (int64
    count column, always 0 per row except the one tally row per batch
    under ``on_error="skip"``) or ``_raw``/``_error`` dead-letter
    columns under ``on_error="keep"``.
    """
    import ray.data

    if on_error not in ("skip", "keep", "raise"):
        raise ValueError(f"on_error must be skip|keep|raise, got {on_error!r}")
    bad_types = [k for k, v in columns.items() if v not in _TYPES]
    if bad_types or not columns:
        raise ValueError(
            f"columns must map name -> one of {sorted(_TYPES)}; bad: {bad_types}"
        )
    names = list(columns)

    def parse(t: pa.Table) -> pa.Table:
        lines = t.column("text").to_pylist()
        out: dict[str, list] = {k: [] for k in names}
        raws: list[str] = []
        errs: list[str] = []
        n_bad = 0
        for ln in lines:
            if ln is None or ln.strip() == "":
                continue
            try:
                obj = json.loads(ln)
                if not isinstance(obj, dict):
                    raise TypeError(f"line is {type(obj).__name__}, not object")
                row = {}
                for k in names:
                    v = obj.get(k)
                    if v is None:
                        row[k] = None
                    elif isinstance(v, (dict, list)):
                        if not json_strings:
                            raise TypeError(f"nested value under {k!r}")
                        row[k] = json.dumps(v, sort_keys=True)
                    else:
                        row[k] = _CASTS[columns[k]](v)
            except Exception as e:  # noqa: BLE001 — the policy boundary
                if on_error == "raise":
                    raise ValueError(f"bad JSONL line: {e}: {ln[:200]}") from e
                if on_error == "keep":
                    raws.append(ln)
                    errs.append(f"{type(e).__name__}: {e}")
                else:
                    n_bad += 1
                continue
            for k in names:
                out[k].append(row[k])
        nrows = len(out[names[0]])
        cols = {k: pa.array(out[k], _TYPES[columns[k]]) for k in names}
        if on_error == "keep":
            pad = nrows * [None]
            cols["_raw"] = pa.array(pad + raws, pa.string())
            cols["_error"] = pa.array(pad + errs, pa.string())
            for k in names:
                cols[k] = pa.concat_arrays(
                    [cols[k], pa.nulls(len(raws), _TYPES[columns[k]])]
                )
        else:
            tally = [0] * nrows
            if n_bad and nrows:
                tally[0] = n_bad
            elif n_bad:  # all-bad batch: one tally-only row, fields null
                for k in names:
                    cols[k] = pa.nulls(1, _TYPES[columns[k]])
                tally = [n_bad]
            cols["_bad"] = pa.array(tally, pa.int64())
        return pa.table(cols)

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )
