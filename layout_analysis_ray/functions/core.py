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
