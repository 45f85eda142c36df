"""Result-schema normalization shared by the pair/window pipelines.

Two Ray Data quirks conspire against empty results: the pandas-block
shuffle emits COLUMN-LESS blocks for empty ``map_groups`` outputs (the
same issue ``bucketed_join`` pads around), and ``map_batches`` is skipped
entirely on empty blocks — so a pipeline whose result is legitimately
empty (a duplicate-free corpus, a purchase-free event stream) surfaces
with NO schema at all.  ``ensure_schema`` normalizes every non-empty block
to the declared schema and unions one typed empty dataset so
``Dataset.schema()`` and Arrow consumers (iter_batches, joins, writes) see
the right types even in the all-empty case.

Known residual limit (upstream): ``Dataset.to_pandas()`` itself returns a
COLUMN-LESS frame for any fully-empty dataset, schema or not — verified
against a bare ``from_arrow(schema.empty_table())``.  Pandas-side callers
must treat an empty frame as an empty result set, not select columns
from it.
"""

from __future__ import annotations

import pyarrow as pa


def ensure_schema(ds, schema: pa.Schema):
    """Cast every non-empty block to ``schema`` and union a typed empty
    seed table in front.

    WARNING (Ray 2.49): the typed seed does NOT survive
    ``to_pandas()``/``take_all()`` when the whole Dataset is empty — a
    fully-empty result still comes back schema-less.  For DRIVER-BOUNDED
    results that can legitimately be empty, do not rely on this wrapper:
    end with ``take_all()`` + ``pa.Table.from_pylist(rows, schema=...)``
    (the CLAUDE.md typed-empty invariant; see events_funnel_counts /
    events_transition_counts / embedding_label_quality)."""
    import ray.data as rd

    def norm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or b.num_columns == 0:
            return schema.empty_table()
        return b.select(schema.names).cast(schema)

    return rd.from_arrow(schema.empty_table()).union(
        ds.map_batches(norm, batch_format="pyarrow")
    )
