"""General distributed equi-join operator (hash-partitioned, join-free
of ``ray.data.Dataset.join`` — which hung under constrained test
sessions, see BASELINE.md / memory notes).

The reference has no general join (its semi-join is the Bloom
build+probe composition, ``src/main.cpp:114-149``); round-1 pipelines
each hand-rolled broadcast or join-free rewrites. This operator is the
missing reusable primitive for the large×large case:

    out = hash_join(left, right, on="custkey", how="inner")

Shape: both sides are tagged and routed to ``hash(key) % P`` fixed
partitions (same-key => same partition, exact), then ONE pandas merge
per partition — never one Ray group per key (per-GROUP overhead is
the measured scale trap, BASELINE.md), never a driver materialization,
never a broadcast. For semi/anti joins only the right side's KEY
column is shipped (pruned at the source). Skewed keys: the partition
count is the knob; a pathological single hot key degenerates to one
partition's pandas merge, which is the same behavior a sort-merge
shuffle join exhibits — salting belongs above this operator (carry a
salt column into the key, as the Bloom build does).

Supported: how in {"inner", "left", "right", "full", "semi", "anti"};
integer or string keys; SQL NULL-key semantics (NULL never matches:
dropped for inner/semi, kept unmatched for left/right/full on their
own side, kept for anti). ``full``/``right`` coalesce the key column
across sides (SQL ``USING(key)`` semantics).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import hash64_ints, hash_strings

if TYPE_CHECKING:
    from ray.data import Dataset

_HOWS = ("inner", "left", "right", "full", "semi", "anti")

#: default right-side size under which ``broadcast="auto"`` picks the
#: map-only plan: the broadcast copy lives ONCE in plasma (zero-copy
#: reads per task), so the bound is per-node object-store headroom,
#: not per-task heap × concurrency.
AUTO_BROADCAST_BYTES = 64 << 20


def choose_broadcast(right_bytes: int | None, threshold: int = AUTO_BROADCAST_BYTES) -> bool:
    """Planner rule for ``broadcast="auto"``: broadcast iff the
    materialized right side is known and under ``threshold`` bytes.
    Unknown size (None) chooses the shuffle plan — the safe default at
    scale."""
    return right_bytes is not None and right_bytes <= threshold


def detect_hot_keys(
    ds: "Dataset",
    col: str,
    *,
    threshold_frac: float = 0.001,
    max_hot: int = 256,
    per_batch_cap: int = 64,
    num_partitions: int = 16,
) -> pa.Array:
    """One-pass distributed hot-key detector for :func:`hash_join`'s
    ``hot_keys`` plan hint → pa.Array of key VALUES whose observed
    frequency is ≥ ``threshold_frac`` of the rows (top ``max_hot`` by
    count).

    Shape: each batch folds to its local ``value_counts`` capped to the
    top ``per_batch_cap`` keys (a truly hot key — ≥ threshold_frac of
    ALL rows — is top-``per_batch_cap`` in essentially every batch), so
    the one fixed-P exchange moves O(blocks × cap) partial rows, never
    raw keys; a null-key partial per batch carries the row total. The
    candidate fold-out is then thresholded and top-k'd distributed
    (sort + limit on the already-small candidate set), so the driver
    only ever sees ≤ ``max_hot`` values.

    This is plan detection, not exact counting: per-batch capping can
    undercount borderline keys, and ANY returned set yields an exact
    join (salting is correctness-invariant) — the threshold is
    advisory. Keys with nulls are never hot (SQL: null never matches).
    """
    import pyarrow.compute as pc

    if not (0.0 <= threshold_frac <= 1.0):
        raise ValueError(f"threshold_frac must be in [0,1], got {threshold_frac}")
    cap = int(per_batch_cap)
    from .agg import grouped_agg

    src = ds.select_columns([col])

    def partials(t: pa.Table) -> pa.Table:
        kv = t.column(col).combine_chunks().drop_null()
        vc = kv.value_counts()
        values, counts = vc.field("values"), vc.field("counts").cast(pa.int64())
        if len(values) > cap:
            cn = counts.to_numpy()
            top = pa.array(np.argpartition(cn, -cap)[-cap:])
            values, counts = values.take(top), counts.take(top)
        m = len(values)
        return pa.table(
            {
                "k": pa.concat_arrays([values, pa.nulls(1, values.type)]),
                "cnt": pa.concat_arrays([counts, pa.array([0], pa.int64())]),
                "bn": pa.array(
                    np.concatenate(
                        [np.zeros(m, np.int64), [np.int64(t.num_rows)]]
                    )
                ),
            }
        )

    folded = grouped_agg(
        src.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True),
        "k",
        {"cnt": ("sum", "cnt"), "bn": ("sum", "bn")},
        num_partitions=num_partitions,
    ).materialize()  # consumed twice: total row, candidate rows

    def total_row(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column("k")))

    tot_df = folded.map_batches(
        total_row, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    total = int(tot_df["bn"].sum()) if len(tot_df) else 0
    if total == 0:
        return pa.array([], pa.null())
    thresh = max(1, int(np.ceil(total * threshold_frac)))

    def candidates(t: pa.Table) -> pa.Table:
        k = t.column("k")
        return t.filter(
            pc.and_(pc.is_valid(k), pc.greater_equal(t.column("cnt"), thresh))
        )

    hot = (
        folded.map_batches(candidates, batch_format="pyarrow", zero_copy_batch=True)
        .sort("cnt", descending=True)
        .limit(int(max_hot))
        .to_pandas()
    )
    if not len(hot):
        sch = folded.schema()
        ktype = sch.types[sch.names.index("k")]
        return pa.array([], ktype if isinstance(ktype, pa.DataType) else pa.null())
    return pa.Array.from_pandas(hot["k"])


def _pa_type(t) -> pa.DataType:
    # ray.data.Schema.types holds pyarrow types for arrow-backed
    # blocks but numpy/pandas-extension types for pandas-backed ones
    if isinstance(t, pa.DataType):
        return t
    if isinstance(t, pd.api.extensions.ExtensionDtype):
        pa_dt = getattr(t, "pyarrow_dtype", None)  # pd.ArrowDtype
        if pa_dt is not None:
            return pa_dt
        try:  # masked dtypes (Int64, boolean, ...) expose numpy_dtype
            return pa.from_numpy_dtype(t.numpy_dtype)
        except (TypeError, AttributeError):
            return pa.string()
    try:
        if np.dtype(t) == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(np.dtype(t))
    except TypeError:
        return pa.string()


def _types_of(schema) -> dict:
    """{column: pyarrow type} of a ray.data.Schema. Schema.types can
    hold None for pandas-extension-dtype columns; the wrapped
    base_schema still knows the dtype (e.g. Int64Dtype)."""
    types = list(schema.types)
    base = getattr(schema, "base_schema", None)
    base_types = list(getattr(base, "types", [])) if base is not None else []
    out = {}
    for i, n in enumerate(schema.names):
        t = types[i]
        if t is None and i < len(base_types):
            t = base_types[i]
        if t is None:
            raise ValueError(f"cannot determine dtype of column {n!r}")
        out[n] = _pa_type(t)
    return out


def _key_hash(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 key hashes, valid mask) for an int or string key column.
    Null keys hash to 0 with valid=False."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        # fill_null BEFORE to_numpy: a null-bearing int64 column would
        # otherwise detour through float64 and round keys >2^53, making
        # the two sides of a join hash DIFFERENT values for the same key
        valid = ~np.asarray(col.is_null()) if col.null_count else np.ones(len(col), bool)
        ints = col.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        h = np.where(valid, hash64_ints(ints), np.uint64(0))
    else:
        h = hash_strings(col)
        valid = np.ones(len(col), bool)
        if col.null_count:
            valid = ~np.asarray(col.is_null())
            h = np.where(valid, h, np.uint64(0))
    return h, valid


def _key_partition(col: pa.ChunkedArray | pa.Array, P: int) -> np.ndarray:
    """Deterministic partition of a key column (int or string); null
    keys -> partition 0 (they never match, any routing is correct)."""
    h, _valid = _key_hash(col)
    return (h % np.uint64(P)).astype(np.int32)


def _broadcast_join(
    left: "Dataset", right: "Dataset", on: str, right_on: str, how: str, suffix: str
) -> "Dataset":
    """Map-only small-side join: right is ``ray.put`` once (zero-copy
    plasma reads in every task), each left batch joins against it with
    the Arrow (Acero) hash-join kernel — no shuffle, no pandas."""
    import pyarrow.compute as pc

    import ray

    l_schema = left.schema()
    if l_schema is None or not l_schema.names:
        return left
    l_cols = list(l_schema.names)

    # mirror the shuffle path's empty-right guards: a fully-empty
    # (schema-less) right side would crash select_columns /
    # pa.concat_tables([]) below
    r_schema = right.schema()
    if r_schema is None or not r_schema.names:
        if how == "anti":
            return left  # nothing to subtract
        if how == "semi":
            return left.limit(0)
        raise ValueError(
            f"hash_join(broadcast, how={how!r}): right side has no schema "
            "(empty dataset) — inner/left output columns are underdetermined"
        )

    if how in ("semi", "anti"):
        right = right.select_columns([right_on])
    # permissive promote: an all-null block arrives null-typed and must
    # unify with its siblings' real dtype
    rtab = pa.concat_tables(
        ray.get(right.to_arrow_refs()), promote_options="permissive"
    )
    key = rtab.column(right_on)
    if key.null_count:  # SQL: null keys never match
        rtab = rtab.filter(pc.is_valid(key))

    if how in ("semi", "anti"):
        keys_ref = ray.put(rtab.column(right_on).combine_chunks().unique())

        def filter_fn(batch: pa.Table) -> pa.Table:
            keys = ray.get(keys_ref)
            mask = pc.fill_null(pc.is_in(batch.column(on), value_set=keys), False)
            if how == "anti":
                mask = pc.invert(mask)
            return batch.filter(mask)

        return left.map_batches(filter_fn, batch_format="pyarrow", zero_copy_batch=True)

    r_out = [c for c in rtab.column_names if c != right_on]
    rename = {c: (c + suffix if c in set(l_cols) else c) for c in r_out}
    rtab = rtab.rename_columns(
        [right_on if c == right_on else rename[c] for c in rtab.column_names]
    )
    out_cols = l_cols + [rename[c] for c in r_out]
    rref = ray.put(rtab)
    join_type = "inner" if how == "inner" else "left outer"

    rkey_type = rtab.schema.field(right_on).type

    def join_fn(batch: pa.Table) -> pa.Table:
        rt = ray.get(rref)
        # an ALL-null left block arrives with a null-typed key column,
        # which Acero rejects as a join key — cast it to the right
        # side's key type (all values stay null: no matches, correct
        # inner/left semantics), same rule the shuffle path applies
        bkey = batch.schema.field(on).type
        if pa.types.is_null(bkey) and not pa.types.is_null(rkey_type):
            i = batch.schema.get_field_index(on)
            batch = batch.set_column(
                i, on, pa.nulls(batch.num_rows, rkey_type))
        joined = batch.join(
            rt, keys=[on], right_keys=[right_on], join_type=join_type
        )
        return joined.select(out_cols)

    return left.map_batches(join_fn, batch_format="pyarrow", zero_copy_batch=True)


def _encode_composite(t: pa.Table, cols: list[str]) -> pa.Array:
    """Injective string encoding of a key tuple: each component is
    length-prefixed (``len:value``) before joining, so separator
    characters inside values can never alias two different tuples
    ("a|b","c" vs "a","b|c"). Any null component makes the WHOLE key
    null (emit_null join default) — which is exactly SQL's AND-equality
    null semantics riding the single-key operator's null handling."""
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        s = pc.cast(t.column(c), pa.string())
        ln = pc.cast(pc.utf8_length(s), pa.string())
        parts.append(pc.binary_join_element_wise(ln, s, ":"))
    out = (
        pc.binary_join_element_wise(*parts, "|") if len(parts) > 1 else parts[0]
    )
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def _multi_key_join(
    left: "Dataset",
    right: "Dataset",
    on: list[str],
    right_on: list[str] | None,
    how: str,
    num_partitions: int,
    suffix: str,
    broadcast,
    bloom_prefilter: bool,
    bloom_bits: int,
    broadcast_threshold: int,
) -> "Dataset":
    """Composite-key plan: both sides gain one synthetic ``__jk``
    column (injective encoding, see :func:`_encode_composite`) and ride
    the single-key operator unchanged — same shuffle, same broadcast /
    bloom / auto planners. Output contract matches the single-key
    form: right key columns are dropped (``USING``-style), and
    ``full``/``right`` coalesce each key pair across sides."""
    right_on = list(right_on) if right_on is not None else list(on)
    if len(right_on) != len(on):
        raise ValueError(f"right_on length {len(right_on)} != on length {len(on)}")

    JK = "__jk"
    l_schema = left.schema()
    if l_schema is None or not l_schema.names:
        if how in ("right", "full"):
            raise ValueError(
                f"hash_join(how={how!r}): left side has no schema (empty "
                "dataset) — output columns are underdetermined"
            )
        return left
    l_cols = list(l_schema.names)
    if JK in l_cols:
        raise ValueError(f"left side already has a {JK} column")
    r_schema = right.schema()
    if r_schema is not None and JK in r_schema.names:
        # without this mirror the append_column below would create a
        # duplicate-named column and fail downstream opaquely (or
        # silently join on a stale key)
        raise ValueError(f"right side already has a {JK} column")

    def add_jk(cols):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(JK, _encode_composite(t, cols))

        return fn

    left2 = left.map_batches(add_jk(on), batch_format="pyarrow", zero_copy_batch=True)
    right2 = right.map_batches(
        add_jk(right_on), batch_format="pyarrow", zero_copy_batch=True
    )
    joined = hash_join(
        left2,
        right2,
        JK,
        right_on=JK,
        how=how,
        num_partitions=num_partitions,
        suffix=suffix,
        broadcast=broadcast,
        bloom_prefilter=bloom_prefilter,
        bloom_bits=bloom_bits,
        broadcast_threshold=broadcast_threshold,
    )
    if how in ("semi", "anti"):
        return joined.drop_columns([JK])

    # the single-key operator renamed colliding right columns; compute
    # where each right KEY column landed so we can coalesce/drop it
    l_set = set(l_cols) | {JK}
    landed = [rk + suffix if rk in l_set else rk for rk in right_on]

    def post(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if how in ("right", "full"):
            # USING semantics: each key coalesces across sides
            arrays, names = [], []
            for name in t.column_names:
                if name == JK or name in landed:
                    continue
                if name in on:
                    rk = landed[on.index(name)]
                    arrays.append(
                        pc.coalesce(t.column(name), t.column(rk))
                        if rk in t.column_names
                        else t.column(name)
                    )
                else:
                    arrays.append(t.column(name))
                names.append(name)
            return pa.table(dict(zip(names, arrays)))
        drop = [JK] + [c for c in landed if c in t.column_names]
        return t.drop_columns(drop)

    return joined.map_batches(post, batch_format="pyarrow", zero_copy_batch=True)


def hash_join(
    left: "Dataset",
    right: "Dataset",
    on: "str | list[str]",
    *,
    right_on: "str | list[str] | None" = None,
    how: str = "inner",
    num_partitions: int = 64,
    suffix: str = "_r",
    broadcast: bool | str = False,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
    broadcast_threshold: int = AUTO_BROADCAST_BYTES,
    hot_keys: "pa.Array | pa.ChunkedArray | list | None" = None,
    hot_salt: int = 8,
) -> "Dataset":
    """Distributed equi-join; returns a Dataset (lazy, streaming).

    Output columns: ``semi``/``anti`` -> exactly the left columns;
    ``inner``/``left`` -> left columns then right non-key columns
    (name collisions get ``suffix``).

    ``on``/``right_on`` may be LISTS for a composite key: both sides
    gain a synthetic injectively-encoded key column and ride this same
    operator (shuffle / broadcast / bloom / auto all apply); right key
    columns are dropped from the output and ``full``/``right``
    coalesce each key pair (``USING`` semantics). A null in ANY
    component makes the whole key null — SQL AND-equality.

    ``broadcast=True`` switches to the small-right-side plan: the right
    side is materialized once, ``ray.put`` into the object store, and
    every left batch merges against the shared copy — a map-only join
    with NO shuffle of either side (the left stream never moves). Same
    results as the shuffle plan (tested); use when the right side fits
    in a worker's heap. ``full``/``right`` are not broadcastable (the
    right side's unmatched rows would be emitted once per left block).

    ``broadcast="auto"`` is the cost-based planner: the right side
    materializes once (both candidate plans consume the materialized
    copy, so nothing re-executes) and the plan is chosen by its actual
    byte size via :func:`choose_broadcast` — broadcast when it fits
    ``broadcast_threshold``, shuffle otherwise.  ``right``/``full``
    always shuffle (not broadcastable).  A ``bloom_prefilter`` hint
    applies only when the shuffle plan is chosen (the broadcast plan
    has no shuffle volume to save).

    ``bloom_prefilter=True`` is the classic Bloom join for the
    shuffle plan: a Bloom filter of the right side's key hashes is
    built first (right side is materialized so it isn't re-executed)
    and broadcast; left rows whose key can't possibly match are
    dropped BEFORE they enter the shuffle. Identical results (no
    false negatives; survivors still verify in the merge) at a
    fraction of the left shuffle volume when selectivity is low — the
    reference's membership-filter pattern applied to join pruning.
    Only valid for ``how`` in (inner, semi, right), where left
    non-matches never reach the output.

    ``hot_keys`` is the skew plan: rows of the listed key VALUES
    (typically from :func:`detect_hot_keys`, or a prior
    heavy-hitters run) are spread over ``hot_salt`` dedicated
    sub-partitions each — left hot rows salted round-robin, right hot
    rows replicated to every sub-partition — so one pathological key
    parallelizes ``hot_salt``-wide instead of serializing one
    partition's merge. Results are EXACTLY the unsalted plan's (same
    merge kernel per sub-partition); cost is ``(hot_salt-1)×`` extra
    copies of only the hot RIGHT rows. Not valid for ``right``/
    ``full`` (replicated right rows would emit duplicate unmatched
    output) or together with an explicit ``broadcast=True`` (the
    map-only plan has no shuffle to skew); ``broadcast="auto"``
    resolving to broadcast drops the hint.
    """
    if how not in _HOWS:
        raise ValueError(f"how must be one of {_HOWS}")
    if isinstance(on, (list, tuple)):
        if len(on) == 1:
            on = on[0]
            right_on = right_on[0] if isinstance(right_on, (list, tuple)) else right_on
        else:
            if hot_keys is not None:
                raise ValueError(
                    "hot_keys is not supported with composite keys — encode "
                    "the tuple into one column and salt that"
                )
            return _multi_key_join(
                left, right, list(on), right_on, how, num_partitions, suffix,
                broadcast, bloom_prefilter, bloom_bits, broadcast_threshold,
            )
    hot_salt = int(hot_salt)
    if hot_keys is not None and hot_salt < 2:
        raise ValueError(f"hot_salt must be >= 2, got {hot_salt}")
    if hot_keys is not None and how in ("right", "full"):
        raise ValueError(
            f"hot_keys skew plan does not support how={how!r}: replicated "
            "right hot rows would emit duplicate unmatched output"
        )
    if broadcast == "auto":
        if how in ("right", "full"):
            broadcast = False
        else:
            if how in ("semi", "anti"):
                # only the key column is ever shipped for semi/anti —
                # prune BEFORE the size test so a wide right side
                # neither pins its payload in the object store nor
                # biases the planner toward the shuffle plan
                # (right_on is normalized further down; default here)
                right = right.select_columns([right_on or on])
            right = right.materialize()
            broadcast = choose_broadcast(right.size_bytes(), broadcast_threshold)
        if broadcast:
            bloom_prefilter = False  # map-only plan: nothing to prefilter
            hot_keys = None  # no shuffle, nothing to skew
    elif not isinstance(broadcast, bool):
        raise ValueError(f"broadcast must be a bool or 'auto', got {broadcast!r}")
    if broadcast:
        if how in ("right", "full"):
            raise ValueError(f"broadcast join does not support how={how!r}")
        if hot_keys is not None:
            raise ValueError(
                "broadcast=True with hot_keys: the broadcast plan never "
                "shuffles, so there is no partition skew to salt — pick one"
            )
        if bloom_prefilter:
            raise ValueError(
                "broadcast=True with bloom_prefilter=True: the broadcast "
                "plan never shuffles the left side, so there is no shuffle "
                "volume for a Bloom prefilter to save — pick one"
            )
        return _broadcast_join(left, right, on, right_on or on, how, suffix)
    right_on = right_on or on
    if bloom_prefilter:
        if how not in ("inner", "semi", "right"):
            raise ValueError(
                f"bloom_prefilter requires left non-matches to be droppable "
                f"(inner/semi/right), got how={how!r}"
            )
        import ray

        from ..state import BloomFilter
        from ..state.base import deserialize_sketch
        from ..stages.sketch_agg import SketchAgg

        right = right.materialize()  # consumed by the build AND the join

        def rkeys(t: pa.Table) -> pa.Table:
            h, valid = _key_hash(t.column(right_on))
            return pa.table({"gh": pa.array(h[valid].view(np.int64))})

        res = right.map_batches(
            rkeys, batch_format="pyarrow", zero_copy_batch=True
        ).aggregate(SketchAgg(lambda: BloomFilter(bloom_bits, 4), on="gh"))
        bf = deserialize_sketch(res["sketch"]) if res and res.get("sketch") is not None \
            else BloomFilter(bloom_bits, 4)
        bf_ref = ray.put(("bloom_bits", bf.num_bits, bf.num_hashes, bf.n_added, bf.bits))

        def prefilter(t: pa.Table) -> pa.Table:
            _, nb, nh, na, bits = ray.get(bf_ref)
            bfv = BloomFilter.from_bits(nb, nh, bits, na)
            h, valid = _key_hash(t.column(on))
            return t.filter(pa.array(valid & bfv.contains(h)))

        left = left.map_batches(
            prefilter, batch_format="pyarrow", zero_copy_batch=True
        )
    l_schema, r_schema = left.schema(), right.schema()  # ray.data.Schema
    # a fully-empty dataset (0 blocks) has no schema at all — resolve
    # the join degenerately instead of crashing on schema access
    if l_schema is None or not l_schema.names:
        if how in ("right", "full"):
            raise ValueError(
                f"hash_join(how={how!r}): left side has no schema (empty "
                "dataset) — output columns are underdetermined"
            )
        return left  # no left rows: every other `how` yields an empty result
    if r_schema is None or not r_schema.names:
        if how == "anti":
            return left  # nothing to subtract
        if how == "semi":
            return left.limit(0)
        raise ValueError(
            f"hash_join(how={how!r}): right side has no schema (empty "
            "dataset) — inner/left output columns are underdetermined"
        )
    l_cols = list(l_schema.names)
    if how in ("semi", "anti"):
        r_cols = [right_on]  # prune: only the key crosses the shuffle
        right = right.select_columns([right_on])
    else:
        r_cols = list(r_schema.names)
    r_out = [c for c in r_cols if c != right_on]
    l_types = _types_of(l_schema)
    r_types = _types_of(r_schema)

    # fixed output schema (pandas->arrow inference would flip types on
    # partitions whose right side is empty / all-null)
    if how in ("semi", "anti"):
        out_schema = pa.schema([(c, l_types[c]) for c in l_cols])
    else:
        out_fields = [(c, l_types[c]) for c in l_cols]
        out_fields += [
            (c + suffix if c in set(l_cols) else c, r_types[c]) for c in r_out
        ]
        out_schema = pa.schema(out_fields)

    # skew plan: normalize hot keys once; each side gets a copy cast to
    # its own key dtype for the per-batch index_in lookup
    hot_l = hot_r = None
    n_hot = 0
    if hot_keys is not None:
        hv = (
            hot_keys
            if isinstance(hot_keys, (pa.Array, pa.ChunkedArray))
            else pa.array(hot_keys)
        )
        if isinstance(hv, pa.ChunkedArray):
            hv = hv.combine_chunks()
        hv = hv.drop_null()
        if len(hv) and not pa.types.is_null(hv.type):
            hv = hv.unique()
            hot_l, hot_r = hv.cast(l_types[on]), hv.cast(r_types[right_on])
            n_hot = len(hv)

    # carrier schema: union of both sides' columns + routing/side tags;
    # the absent side's columns ride as typed nulls
    carrier = [(n, l_types[n]) for n in l_cols] + [(f"__r_{n}", r_types[n]) for n in r_cols]

    def pack(side: int, key_col: str):
        hot = hot_l if side == 0 else hot_r

        def fn(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = t.num_rows
            jp = _key_partition(t.column(key_col), num_partitions)
            hnp = None
            if hot is not None:
                kc = t.column(key_col).combine_chunks()
                if kc.type != hot.type:  # all-null blocks arrive null-typed
                    kc = kc.cast(hot.type)
                hnp = (
                    pc.index_in(kc, value_set=hot)
                    .fill_null(-1)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                hmask = hnp >= 0
                if side == 0:
                    # round-robin salt: ANY spread of left hot rows over
                    # the key's sub-partitions is exact
                    salt = np.arange(n, dtype=np.int64) % hot_salt
                    jp = np.where(
                        hmask, num_partitions + hnp * hot_salt + salt, jp
                    ).astype(np.int32)
                else:
                    jp = np.where(
                        hmask, num_partitions + hnp * hot_salt, jp
                    ).astype(np.int32)
            arrays = [pa.array(jp), pa.array(np.full(n, side, dtype=np.int8))]
            names = ["__jp", "__side"]
            for cname, ctype in carrier:
                own = cname if side == 0 else (cname[4:] if cname.startswith("__r_") else None)
                present = own is not None and (
                    (side == 0 and not cname.startswith("__r_")) or side == 1
                ) and own in t.column_names
                if present:
                    col = t.column(own).combine_chunks()
                    if col.type != ctype:
                        # an all-null block arrives null-typed; other
                        # mismatches surface here as a clear cast error
                        col = col.cast(ctype)
                    arrays.append(col)
                else:
                    arrays.append(pa.nulls(n, ctype))
                names.append(cname)
            out = pa.Table.from_arrays(arrays, names=names)
            if side == 1 and hnp is not None:
                # replicate RIGHT hot rows into every sub-partition of
                # their key (salt 0 copy is already in `out`)
                hrows = np.flatnonzero(hnp >= 0)
                if len(hrows):
                    base_jp = num_partitions + hnp[hrows] * hot_salt
                    take_idx = pa.array(hrows)
                    reps = [out]
                    for s in range(1, hot_salt):
                        cp = out.take(take_idx).set_column(
                            0, "__jp", pa.array((base_jp + s).astype(np.int32))
                        )
                        reps.append(cp)
                    out = pa.concat_tables(reps)
            return out

        return fn

    # one sentinel row per partition (side=-1, dropped in the kernel):
    # guarantees every group task sees >= 1 row, so the merge kernel
    # ALWAYS runs and emits a schema-typed (possibly empty) table. Ray
    # otherwise emits SCHEMA-LESS empty blocks for rowless tasks and
    # skips map_batches UDFs on them — downstream to_pandas would then
    # union-concat mixed schemas and promote int64 columns to float64
    # (rounding values >2^53).
    import ray.data as _rd

    n_parts = num_partitions + n_hot * hot_salt  # + hot sub-partitions
    sentinels = _rd.from_arrow(
        pa.Table.from_arrays(
            [pa.array(np.arange(n_parts, dtype=np.int32)),
             pa.array(np.full(n_parts, -1, dtype=np.int8))]
            + [pa.nulls(n_parts, t) for _, t in carrier],
            names=["__jp", "__side"] + [n for n, _ in carrier],
        )
    )

    tagged = (
        left.map_batches(pack(0, on), batch_format="pyarrow", zero_copy_batch=True)
        .union(
            right.map_batches(pack(1, right_on), batch_format="pyarrow", zero_copy_batch=True)
        )
        .union(sentinels)
    )

    rename_r = {c: (c + suffix if c in set(l_cols) else c) for c in r_out}

    def merge_partition(g: pa.Table) -> pa.Table:
        # split sides in ARROW first, then merge on ArrowDtype-backed
        # frames: a plain to_pandas would coerce null-bearing int64
        # columns (and left-join NaN fills) to float64, silently
        # rounding values >2^53 before the cast back to int64
        import pyarrow.compute as pc

        side = g.column("__side")  # -1 rows are partition sentinels
        lt = g.filter(pc.equal(side, 0)).select(l_cols)
        rt = g.filter(pc.equal(side, 1)).select([f"__r_{c}" for c in r_cols])
        rt = rt.rename_columns([on if c == right_on else rename_r[c] for c in r_cols])
        ldf = lt.to_pandas(types_mapper=pd.ArrowDtype)
        if how in ("semi", "anti"):
            keys = set(rt.to_pandas(types_mapper=pd.ArrowDtype)[on].dropna())
            mask = ldf[on].isin(keys) & ldf[on].notna()
            out = ldf[mask] if how == "semi" else ldf[~mask]
            # strip pandas metadata: ArrowDtype frames would otherwise
            # leak dtype hints into downstream to_pandas conversions
            return pa.Table.from_pandas(
                out, preserve_index=False, schema=out_schema
            ).replace_schema_metadata(None)
        rdf = rt.to_pandas(types_mapper=pd.ArrowDtype)
        if how in ("right", "full"):
            # SQL: a NULL right key never matches but the row is kept
            # (unmatched, left columns null). pandas merge would MATCH
            # NaN keys across sides, so split them out and re-append.
            rnull = rdf[rdf[on].isna()]
            rdf = rdf[rdf[on].notna()]
            merged = ldf.merge(rdf, on=on, how="outer" if how == "full" else "right")
            if len(rnull):
                out_cols = [f.name for f in out_schema]
                add = rnull.reindex(columns=out_cols)
                # the left-side columns reindex invented are plain
                # float64 NaN; give them TYPED arrow NA instead —
                # pandas >= 3 includes all-NA columns in concat dtype
                # determination, which would promote int64 columns to
                # float64 and silently round values past 2^53
                for c in out_cols:
                    if c not in rnull.columns:
                        add[c] = pd.Series(
                            pd.NA, index=add.index,
                            dtype=pd.ArrowDtype(out_schema.field(c).type),
                        )
                merged = pd.concat([merged, add], ignore_index=True)
        else:
            rdf = rdf[rdf[on].notna()]
            merged = ldf.merge(rdf, on=on, how=how)
        merged = merged[[f.name for f in out_schema]]
        return pa.Table.from_pandas(
            merged, preserve_index=False, schema=out_schema
        ).replace_schema_metadata(None)

    return tagged.groupby("__jp").map_groups(merge_partition, batch_format="pyarrow")
