"""Table profiler: per-column null counts, exact distinct counts and
min/max — the ``SUMMARIZE`` / data-catalog staple a pipeline owner runs
before trusting a new drop.  Reference analogue: the per-collection
sanity printouts of ``/root/reference/src/DocumentAnalyzer.py`` (count
what arrived before processing it), lifted to a typed report.

Scale shape (see :func:`table_profile`): ONE pruned scan reduces every
row to batch-grain partials; the only row-proportional exchange is the
(column, value-key) dedup the exact distinct count needs, map-side
dedup'd per batch.  Min/max and the row/null counters fold through a
``repartition(1)`` of batch-grain partial rows (<= 6 columns x 4 kinds
per block), never the driver; the driver materializes one row per
profiled column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .core import partial_then_global, read_table
from .hashing import str_hash_u60
from .numeric import cents_arrow

# partial-row kinds riding the unified narrow stream
_K_KEY = 0  # one row per distinct value per batch (n = 1)
_K_ROWS = 1  # n = batch rows
_K_NULL = 2  # n = null rows
_K_MIN = 3  # key = batch min (numeric encoding)
_K_MAX = 4  # key = batch max
_K_SMIN = 5  # sval = batch min (string column)
_K_SMAX = 6  # sval = batch max

# (name, repr_kind): how the column encodes to the int64 key domain and
# how min/max render back to the report's VARCHAR repr.  ``cents`` and
# ``ts_us`` are documented in the oracle SQL (reprs are exact integer
# cents / strftime seconds, never floats).
_ORDERS_SPECS = [
    ("o_custkey", "int"),
    ("o_orderdate", "ts"),
    ("o_orderkey", "int"),
    ("o_orderpriority", "str"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
]

_PROFILE_SCHEMA = pa.schema(
    [
        ("column_name", pa.string()),
        ("n_rows", pa.int64()),
        ("n_null", pa.int64()),
        ("n_distinct", pa.int64()),
        ("min_repr", pa.string()),
        ("max_repr", pa.string()),
    ]
)


def _numeric_encode(arr: pa.ChunkedArray, kind: str) -> np.ndarray:
    """Column -> int64 value domain (NULLs already dropped)."""
    if kind == "cents":
        return cents_arrow(arr).to_numpy(zero_copy_only=False)
    if kind == "ts":
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _render(v, kind: str) -> str | None:
    if v is None:
        return None
    if kind == "str":
        return v
    if kind == "ts":
        return pd.Timestamp(int(v), unit="us").strftime("%Y-%m-%d %H:%M:%S")
    return str(int(v))


def table_profile(sf_dir: str, table: str = "orders", specs=None):
    """Per-column profile of ``table``: (column_name, n_rows, n_null,
    n_distinct, min_repr, max_repr) — exact distinct counts (not
    sketches; the HLL variants live in ``sketches.py``), NULLs excluded
    from distinct/min/max per SQL aggregate semantics, reprs rendered
    canonically (ints/cents as decimal strings, timestamps as
    ``%Y-%m-%d %H:%M:%S``).

    Scale shape: one scan emits a unified narrow partial stream.
    Distinct-value rows are dedup'd per batch, exchanged at (column,
    value-key) grain — ints/cents/timestamps key by their exact int64
    encoding, strings by the engine's 60-bit md5 key (collisions merge
    equality classes identically on both compare sides) — then folded
    to per-block count partials, so the driver sees one count per
    column.  Counter and min/max rows are batch-grain; they fold
    locally per block and finish through ``repartition(1)`` (<= 24 rows
    cross the exchange per block).  The narrow stream is materialized
    ONCE so the two consumers don't re-run the scan."""
    specs = list(_ORDERS_SPECS if specs is None else specs)
    names = [s[0] for s in specs]
    ds = read_table(sf_dir, table, columns=names)

    def prep(batch: pa.Table) -> pa.Table:
        # vectorized partial builder: one numpy block per (column, kind
        # family), concatenated once — no per-distinct-value Python loop
        # (o_orderkey is distinct on every row).  key/sval carry 0 / ""
        # on rows where the kind doesn't use them (kind disambiguates),
        # which keeps the stream non-nullable and cheap to exchange.
        cid, knd, key, sva, cnt = [], [], [], [], []

        def emit(ci, kinds, keys, svals, ns):
            m = len(kinds)
            cid.append(np.full(m, ci, np.int64))
            knd.append(np.asarray(kinds, np.int64))
            key.append(np.asarray(keys, np.int64))
            sva.append(np.asarray(svals, object))
            cnt.append(np.asarray(ns, np.int64))

        for ci, (name, ck) in enumerate(specs):
            arr = batch[name]
            n_valid = int(pc.sum(pc.is_valid(arr)).as_py() or 0)
            emit(
                ci,
                [_K_ROWS, _K_NULL],
                [0, 0],
                ["", ""],
                [batch.num_rows, batch.num_rows - n_valid],
            )
            if n_valid == 0:
                continue
            vals = arr.drop_null().combine_chunks()
            if ck == "str":
                h = str_hash_u60(pc.unique(vals))
                emit(ci, np.full(len(h), _K_KEY), h, np.full(len(h), "", object), np.ones(len(h), np.int64))
                mm = pc.min_max(vals)
                emit(ci, [_K_SMIN, _K_SMAX], [0, 0], [mm["min"].as_py(), mm["max"].as_py()], [0, 0])
            else:
                enc = np.unique(_numeric_encode(vals, ck))
                emit(ci, np.full(len(enc), _K_KEY), enc, np.full(len(enc), "", object), np.ones(len(enc), np.int64))
                emit(ci, [_K_MIN, _K_MAX], [int(enc[0]), int(enc[-1])], ["", ""], [0, 0])
        return pa.table(
            {
                "col_id": pa.array(np.concatenate(cid)),
                "kind": pa.array(np.concatenate(knd)),
                "key": pa.array(np.concatenate(key)),
                "sval": pa.array(np.concatenate(sva), pa.string()),
                "n": pa.array(np.concatenate(cnt)),
            }
        )

    narrow = ds.map_batches(prep, batch_format="pyarrow").materialize()

    # --- exact distinct: (col, key) dedup -> per-block count partials ---
    keys = partial_then_global(
        narrow.map_batches(
            lambda b: b.filter(pc.equal(b["kind"], _K_KEY)).select(
                ["col_id", "key", "n"]
            ),
            batch_format="pyarrow",
        ),
        ["col_id", "key"],
        ["n"],
    )
    nd_rows = partial_then_global(
        keys.map_batches(
            lambda b: pa.table(
                {
                    "col_id": b["col_id"],
                    "nd": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["col_id"],
        ["nd"],
    ).take_all()
    n_distinct = {int(r["col_id"]): int(r["nd"]) for r in nd_rows}

    # --- counters + min/max: local fold -> repartition(1) -> final fold ---
    _NARROW_SCHEMA = pa.schema(
        [
            ("col_id", pa.int64()),
            ("kind", pa.int64()),
            ("key", pa.int64()),
            ("sval", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def fold(b: pa.Table) -> pa.Table:
        # Arrow-filter the (huge) distinct-key rows away BEFORE pandas
        b = b.filter(pc.not_equal(b["kind"], _K_KEY))
        if b.num_rows == 0:
            return _NARROW_SCHEMA.empty_table()
        df = b.to_pandas()
        out = []
        for (ci, k), g in df.groupby(["col_id", "kind"], sort=True):
            if k in (_K_ROWS, _K_NULL):
                out.append((ci, k, None, None, int(g["n"].sum())))
            elif k == _K_MIN:
                out.append((ci, k, int(g["key"].min()), None, 0))
            elif k == _K_MAX:
                out.append((ci, k, int(g["key"].max()), None, 0))
            elif k == _K_SMIN:
                out.append((ci, k, None, g["sval"].min(), 0))
            else:
                out.append((ci, k, None, g["sval"].max(), 0))
        cols = list(zip(*out))
        return pa.table(
            {
                "col_id": pa.array(cols[0], pa.int64()),
                "kind": pa.array(cols[1], pa.int64()),
                "key": pa.array(cols[2], pa.int64()),
                "sval": pa.array(cols[3], pa.string()),
                "n": pa.array(cols[4], pa.int64()),
            }
        )

    folded = (
        narrow.map_batches(fold, batch_format="pyarrow")
        .repartition(1)
        .map_batches(fold, batch_format="pyarrow")
        .take_all()
    )
    stats: dict[tuple[int, int], object] = {}
    for r in folded:
        k = int(r["kind"])
        stats[(int(r["col_id"]), k)] = (
            r["sval"] if k in (_K_SMIN, _K_SMAX) else (r["key"] if k in (_K_MIN, _K_MAX) else r["n"])
        )

    rows = []
    for ci, (name, ck) in enumerate(specs):
        lo_k = _K_SMIN if ck == "str" else _K_MIN
        hi_k = _K_SMAX if ck == "str" else _K_MAX
        rows.append(
            (
                name,
                int(stats.get((ci, _K_ROWS), 0) or 0),
                int(stats.get((ci, _K_NULL), 0) or 0),
                n_distinct.get(ci, 0),
                _render(stats.get((ci, lo_k)), ck),
                _render(stats.get((ci, hi_k)), ck),
            )
        )
    rows.sort(key=lambda r: r[0])
    cols = list(zip(*rows))
    return pa.table(
        {
            "column_name": pa.array(cols[0], pa.string()),
            "n_rows": pa.array(cols[1], pa.int64()),
            "n_null": pa.array(cols[2], pa.int64()),
            "n_distinct": pa.array(cols[3], pa.int64()),
            "min_repr": pa.array(cols[4], pa.string()),
            "max_repr": pa.array(cols[5], pa.string()),
        },
        schema=_PROFILE_SCHEMA,
    )
