"""Bucketed fact-fact hash join.

``Dataset.join`` is Ray Data's built-in hash-shuffle join and is the default
for fact-fact edges (q3/q5 use it).  This module is the *explicit* bucketed
variant for when you need control the built-in doesn't give you at 100 TB:

- ONE partitioning key reused across stages: both sides are bucketed by the
  same mixed key hash, so a downstream stage keyed the same way (another
  join, a groupby) can ride the existing layout instead of reshuffling.
- Skew visibility: the bucket id is an explicit column — salting a hot key
  is a one-line change to ``_bucket_of`` instead of an engine internal.
- The per-bucket probe is ``pyarrow.Table.join`` (Arrow's vectorized hash
  join kernel), so within a bucket nothing is per-row Python.

Mechanics: tag each side, pad to a common schema, ``union`` (zero-copy
block concatenation — no compute), one ``groupby(bucket).map_groups`` — the
single all-to-all exchange — then split sides and Arrow-join inside each
bucket.  Only rows surviving each side's pushed-down filters shuffle.
Padding uses typed SENTINELS (0 / "" / b"") rather than nulls: Ray's
groupby shuffle round-trips blocks through pandas, where a null-padded
int64 degrades to float64 (all-null -> null type) and breaks the Arrow
join's type resolution; sentinel rows are discarded by the ``__side``
filter, so the values never surface.

Demonstrated by ``q_join_bucketed`` (orders x lineitem -> revenue by order
priority), oracle-checked against DuckDB in ``__ray_entry__.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """splitmix64 finalizer: deterministic, process-independent, spreads
    sequential int keys (orderkey ranges) uniformly across buckets."""
    x = keys.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_buckets)).astype(np.int64)


def _pad_column(n: int, t: pa.DataType) -> pa.Array:
    """Typed sentinel column (never surfaces: filtered out by __side)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        v = pa.scalar("", t)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        v = pa.scalar(b"", t)
    elif pa.types.is_boolean(t):
        v = pa.scalar(False, t)
    else:
        v = pa.scalar(0, t)
    return pa.repeat(v, n)


def bucketed_join(
    left,
    right,
    left_key: str,
    right_key: str,
    num_buckets: int = 64,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    post_probe=None,
    post_schema: pa.Schema | None = None,
):
    """Inner equi-join of two Datasets on int64 keys via explicit bucketing.

    Payload column names must be disjoint between the two sides (keys may
    collide; the output carries ``left_key`` only).  Returns a Dataset of
    left-payload + right-payload columns for every matching key pair.

    Pass ``left_schema`` / ``right_schema`` (pyarrow) whenever you know
    them: ``Dataset.schema()`` EXECUTES part of the upstream pipeline to
    infer types, and on a shuffle-bearing input (e.g. a chained join) that
    means running the whole exchange once per probe — a silent 2x-4x.

    ``post_probe`` is the bucket-layout-reuse hook this module's header
    promises: a vectorized ``pa.Table -> pa.Table`` applied to each bucket's
    joined rows INSIDE the same map_groups.  Because a key's rows are all in
    one bucket, any stage keyed on the join key (a groupby-aggregate, a
    second join probe) completes per-bucket — the whole join+stage pipeline
    runs on ONE all-to-all exchange instead of two.  Pass ``post_schema``
    (its output schema) alongside it for empty buckets.
    """
    ls = left_schema if left_schema is not None else left.schema()
    rs = right_schema if right_schema is not None else right.schema()
    left_cols = [c for c in ls.names if c != left_key]
    right_cols = [c for c in rs.names if c != right_key]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload column collision: {sorted(overlap)}")

    left_types = {n: t for n, t in zip(ls.names, ls.types)}
    right_types = {n: t for n, t in zip(rs.names, rs.types)}
    key_type = left_types[left_key]

    names = ["__key", "__bucket", "__side"] + left_cols + right_cols
    all_types = {**left_types, **right_types}
    tag_schema = pa.schema(
        [("__key", key_type), ("__bucket", pa.int64()), ("__side", pa.int8())]
        + [(n, all_types[n]) for n in left_cols + right_cols]
    )

    def _tag(side: int, key: str, own_cols: list[str], other: dict):
        other_cols = [(c, other[c]) for c in (right_cols if side == 0 else left_cols)]
        empty = tag_schema.empty_table()

        def tag(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:  # incl. column-less empty shuffle blocks
                return empty
            k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
            cols = {
                "__key": batch[key],
                "__bucket": pa.array(_bucket_of(k, num_buckets), pa.int64()),
                "__side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8), pa.int8()
                ),
            }
            for c in own_cols:
                cols[c] = batch[c]
            for c, t in other_cols:
                cols[c] = _pad_column(batch.num_rows, t)
            # canonical column order so union() sees one schema
            return pa.table({n: cols[n] for n in names})

        return tag

    lt = left.map_batches(
        _tag(0, left_key, left_cols, right_types), batch_format="pyarrow"
    )
    rt = right.map_batches(
        _tag(1, right_key, right_cols, left_types), batch_format="pyarrow"
    )

    def probe(group: pa.Table) -> pa.Table:
        # re-normalize after Ray's pandas-block shuffle round trip
        group = group.select(names).cast(tag_schema)
        side = group["__side"]
        l = group.filter(pc.equal(side, 0)).select(["__key"] + left_cols)
        r = group.filter(pc.equal(side, 1)).select(["__key"] + right_cols)
        joined = l.join(r, keys="__key", join_type="inner")
        return joined.rename_columns([left_key] + left_cols + right_cols)

    out_schema = pa.schema(
        [(left_key, key_type)]
        + [(c, left_types[c]) for c in left_cols]
        + [(c, right_types[c]) for c in right_cols]
    )

    final_schema = post_schema if post_probe is not None else out_schema
    if post_probe is not None and post_schema is None:
        raise ValueError("post_probe requires post_schema")

    def probe_safe(group: pa.Table) -> pa.Table:
        out = probe(group)
        if out.num_rows == 0:
            return final_schema.empty_table()
        if post_probe is not None:
            out = post_probe(out.cast(out_schema))
        return out.cast(final_schema) if out.num_rows else final_schema.empty_table()

    return lt.union(rt).groupby("__bucket").map_groups(
        probe_safe, batch_format="pyarrow"
    )


def q_join_bucketed_agg(sf_dir: str):
    """Per-order revenue via the bucketed join with the groupby(o_orderkey)
    aggregate FUSED into the probe stage (``post_probe``): join + aggregate
    on the same key, ONE all-to-all exchange total — the bucket-layout
    reuse the module header promises, oracle-checked in __ray_entry__ and
    exchange-counted in tests/test_functions.py."""
    from .core import read_table as _read
    from .numeric import cents_arrow as _cents

    orders = _read(sf_dir, "orders", columns=["o_orderkey"])

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc_c = _cents(batch["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_e4": pa.array(price_c * (100 - disc_c)),
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(prep_li, batch_format="pyarrow")

    def per_key_agg(joined: pa.Table) -> pa.Table:
        g = joined.group_by("o_orderkey").aggregate(
            [("revenue_e4", "sum"), ("revenue_e4", "count")]
        )
        return pa.table(
            {
                "o_orderkey": g["o_orderkey"],
                "revenue_e4": pc.cast(g["revenue_e4_sum"], pa.int64()),
                "n_lines": pc.cast(g["revenue_e4_count"], pa.int64()),
            }
        )

    return bucketed_join(
        orders,
        li,
        "o_orderkey",
        "l_orderkey",
        num_buckets=32,
        left_schema=pa.schema([("o_orderkey", pa.int64())]),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_e4", pa.int64())]
        ),
        post_probe=per_key_agg,
        post_schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("revenue_e4", pa.int64()),
                ("n_lines", pa.int64()),
            ]
        ),
    )


def q_join_bucketed(sf_dir: str):
    """Revenue by order priority via the explicit bucketed orders x lineitem
    join (the fact-fact scale path promised by pipelines.relational)."""
    from .core import partial_then_global as _partial_then_global
    from .core import read_table as _read
    from .numeric import cents_arrow as _cents

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    def prep_li(batch: pa.Table) -> pa.Table:
        price_c = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc_c = _cents(batch["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_e4": pa.array(price_c * (100 - disc_c)),
            }
        )

    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(prep_li, batch_format="pyarrow")

    joined = bucketed_join(
        orders,
        li,
        "o_orderkey",
        "l_orderkey",
        num_buckets=32,
        left_schema=pa.schema(
            [("o_orderkey", pa.int64()), ("o_orderpriority", pa.string())]
        ),
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("revenue_e4", pa.int64())]
        ),
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": batch["o_orderpriority"],
                "revenue_e4": batch["revenue_e4"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        joined.map_batches(prep, batch_format="pyarrow"),
        ["o_orderpriority"],
        ["revenue_e4", "n"],
    )
