"""Shared streaming primitives used by BOTH the functions layer and the
pipelines layer.

Promoted out of ``pipelines.relational`` (where they started life as
private helpers) once operators in ``functions/`` began importing them:
``pipelines/`` builds on ``functions/``, so the shared read / partial-
aggregation shapes live here and nothing in ``functions/`` imports from
``pipelines/``.
"""

from __future__ import annotations

import pyarrow as pa


def read_table(sf_dir: str, table: str, columns=None, row_filter=None):
    """Column-pruned (and optionally row-filtered) parquet read.

    ``row_filter`` is a ``pyarrow.dataset`` expression pushed into the scan:
    row groups whose statistics exclude the predicate never leave storage —
    the prune-at-the-read rule for 100 TB inputs."""
    import ray.data as rd

    kwargs = {}
    if row_filter is not None:
        kwargs["filter"] = row_filter
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, **kwargs)


def partial_then_global(ds, keys: list[str], sum_cols: list[str]):
    """Per-batch Arrow group_by partial aggregation, then a global groupby
    over the (tiny) partials.  The shuffle moves one row per key per block
    instead of every input row."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
        return out.rename_columns(keys + sum_cols)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(c, alias_name=c) for c in sum_cols]
    return partials.groupby(keys).aggregate(*aggs)


def partial_topk(ds, sort_cols: list[str], ascending: list[bool], k: int,
                 rank_col: str | None = None):
    """Global top-k by (sort_cols, ascending) via per-block partial
    selection: each block keeps its own top-k, a single tiny merge picks
    the final k — the exchange moves at most k rows per block, never the
    full table.  With ``rank_col``, the final rows get 1-based ranks in
    sort order (SQL row_number tie-break = the sort itself)."""
    import numpy as np
    import pandas as pd  # noqa: F401

    def block(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(sort_cols, ascending=ascending)
        return pa.Table.from_pandas(df.head(k), preserve_index=False)

    def final(b: pa.Table) -> pa.Table:
        df = (
            b.to_pandas()
            .sort_values(sort_cols, ascending=ascending)
            .head(k)
            .reset_index(drop=True)
        )
        if rank_col is not None:
            df[rank_col] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(block, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )


def bucket_rank_offsets(agg_ds, part_cols: list[str], bucket_col: str,
                        cnt_col: str = "cnt"):
    """Driver-side offset stitch over RANKING-PARTITION totals — the
    ``pack_sequences_global`` pattern generalized for windowed ranks.

    ``agg_ds`` must hold ONE row per nonempty (part_cols..., bucket_col)
    ranking partition (the output of :func:`partial_then_global` over
    coarse value buckets), so the driver materializes exactly one row per
    ``map_groups`` partition — partition-count-sized, never value- or
    row-proportional.  Bucket ids must be FLOOR-divided from the ordering
    value (floor is monotone for negatives; trunc is not), so every row in
    bucket ``b`` ranks after every row in buckets ``< b`` and a local sort
    inside the bucket plus this exclusive start offset yields the exact
    global rank.

    Returns ``(offsets, totals)``: ``offsets[(p1, ..., bucket)]`` is the
    exclusive rank start of that partition within its part;
    ``totals[(p1, ...)]`` is the part's total row count (key ``()`` when
    ``part_cols`` is empty).  Both dicts ride task closures / ``ray.put``.
    """
    import numpy as np

    df = agg_ds.to_pandas()
    if len(df) == 0:
        return {}, {}
    order_cols = list(part_cols) + [bucket_col]
    df = df.sort_values(order_cols).reset_index(drop=True)
    cnt = df[cnt_col].to_numpy().astype(np.int64)
    if part_cols:
        grp = df.groupby(list(part_cols), sort=False)
        base = grp[cnt_col].cumsum().to_numpy().astype(np.int64) - cnt
        totals = {
            (k if isinstance(k, tuple) else (k,)): int(v)
            for k, v in grp[cnt_col].sum().items()
        }
    else:
        base = np.cumsum(cnt) - cnt
        totals = {(): int(cnt.sum())}
    key_cols = [df[c].to_numpy() for c in order_cols]
    offsets = {
        tuple(col[i] for col in key_cols): int(base[i])
        for i in range(len(df))
    }
    return offsets, totals


def coarse_int_partition(arr, n_parts: int):
    """Coarse hash partition id for an int64 numpy array: the engine-wide
    splitmix-style mixer (multiply by the golden-ratio constant, xor-shift)
    so sequential keys don't skew.  The same math appears nested in the
    window family and q18/q21 closures — new code should call this."""
    import numpy as np

    key = np.asarray(arr).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    key ^= key >> np.uint64(29)
    return (key % np.uint64(n_parts)).astype(np.int64)
