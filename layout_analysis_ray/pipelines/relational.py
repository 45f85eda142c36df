"""Relational query pipelines over the testdata star schema.

These are the engine's general query-processing surface (SURVEY.md §2.4-§2.6
J/A/T operators): equi-joins as broadcast lookups (small side via ``ray.put``,
no shuffle), aggregations as per-batch Arrow partial aggregation followed by a
tiny global ``groupby`` (SURVEY.md "pre-aggregate inside map_batches"), sorts
and top-k on already-reduced results.

Precision policy: every money/ratio aggregate is computed in exact integer
units (cents / ppm) in BOTH the Ray pipeline and the DuckDB oracle SQL in
``__ray_entry__.py``, so driver value-hash comparisons cannot drift on
float-summation order or round-half semantics (Python rounds half-even,
DuckDB half-away-from-zero).

At 100 TB the broadcast maps below (supplier/customer) stop fitting in a
worker's heap; at that point a dimension graduates to a shuffle join —
either ``Dataset.join`` (q3/q5's fact-fact edge) or the explicit bucketed
hash join in ``layout_analysis_ray.functions.joins`` (demonstrated by
``joins.q_join_bucketed``), which keeps the bucket id as a reusable
partitioning column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads


# shared streaming primitives live in functions.core (promoted there so the
# functions layer never imports pipeline-private helpers); these aliases
# keep this module's call sites and docstrings unchanged
from ..functions.core import coarse_int_partition  # noqa: E402
from ..functions.core import partial_then_global as _partial_then_global  # noqa: E402
from ..functions.core import read_table as _read  # noqa: E402


def _read_dim(sf_dir: str, table: str, columns=None):
    """Driver-side DIMENSION load: plain pyarrow read, no Ray Dataset.

    Dimension tables are materialized on the driver for ``ray.put``
    broadcast anyway; routing them through a Ray Dataset execution adds a
    fixed ~0.3 s of plan scheduling per table (measured: q5's four dim
    loads cost ~1.3 s of wall before the join plan starts).  Storage
    assumption is unchanged — the table must be dimension-sized."""
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/{table}.parquet", columns=columns).to_pandas()


def _cents(arr) -> pa.Array:
    """Exact 2-dp doubles -> int64 cents."""
    from ..functions.numeric import cents_arrow

    return cents_arrow(arr)


# ---------------------------------------------------------------------------
# Q1-style pricing summary
# ---------------------------------------------------------------------------

Q1_CUTOFF = "1998-09-01"


def q1_pricing_summary(sf_dir: str):
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
        # pushed into the scan: row groups past the cutoff never leave disk
        row_filter=(pads.field("l_shipdate") <= np.datetime64(Q1_CUTOFF, "us")),
    )

    def prep(batch: pa.Table) -> pa.Table:
        # keep the in-memory filter too: pushdown prunes at row-group
        # granularity, this is the exact row-level cut
        batch = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(np.datetime64(Q1_CUTOFF, "us")))
        )
        qty_c = _cents(batch["l_quantity"])
        price_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(batch["l_discount"])
        disc_price = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "qty_cents": qty_c,
                "price_cents": price_c,
                "disc_price_e4": disc_price,  # cents * (100 - disc_cents)
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    agg = _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        ["qty_cents", "price_cents", "disc_price_e4", "n"],
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.divide(batch["qty_cents"], pa.scalar(100, pa.int64())),
                "sum_base_price_cents": batch["price_cents"],
                "sum_disc_price_e4": batch["disc_price_e4"],
                "avg_qty_ppm": pc.cast(
                    pc.divide(
                        pc.multiply(batch["qty_cents"], pa.scalar(10000, pa.int64())),
                        batch["n"],
                    ),
                    pa.int64(),
                ),
                "count_order": batch["n"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q6-style: forecast revenue change (pure scan-side filter + scalar agg)
# ---------------------------------------------------------------------------

Q6_LO = "1996-01-01"
Q6_HI = "1997-01-01"
Q6_DISC_LO_C = 5  # discount cents, inclusive
Q6_DISC_HI_C = 7
Q6_QTY_MAX = 24  # strict upper bound


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape: the all-filter scalar aggregate.  Every predicate
    (ship year, discount band, quantity cap) is pushed into the parquet
    scan, so row groups outside the year never leave storage; surviving
    batches collapse to ONE (revenue, n) partial each and a single global
    sum — zero shuffle, zero driver work beyond the final row.

    ``revenue_e4`` is exact integer: price_cents x disc_cents (1e-4 dollar
    units), matching the engine-wide cents convention."""
    lo = np.datetime64(Q6_LO, "us")
    hi = np.datetime64(Q6_HI, "us")
    # the discount/quantity cents cuts are EXACTLY pushable: under
    # half-away-from-zero cents rounding, cents(x) in [5, 7] <=> x in
    # [0.045, 0.075) and cents(q) < 2400 <=> q < 23.995 for every double
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        row_filter=(
            (pads.field("l_shipdate") >= lo)
            & (pads.field("l_shipdate") < hi)
            & (pads.field("l_discount") >= 0.045)
            & (pads.field("l_discount") < 0.075)
            & (pads.field("l_quantity") < 23.995)
        ),
    )

    _schema = pa.schema([("revenue_e4", pa.int64()), ("n_rows", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        disc_c = _cents(batch["l_discount"])
        qty_c = _cents(batch["l_quantity"])
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], pa.scalar(lo)),
                pc.less(batch["l_shipdate"], pa.scalar(hi)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc_c, pa.scalar(Q6_DISC_LO_C, pa.int64())),
                    pc.less_equal(disc_c, pa.scalar(Q6_DISC_HI_C, pa.int64())),
                ),
                pc.less(qty_c, pa.scalar(Q6_QTY_MAX * 100, pa.int64())),
            ),
        )
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return _schema.empty_table()
        rev = pc.sum(
            pc.multiply(_cents(batch["l_extendedprice"]), _cents(batch["l_discount"]))
        ).as_py()
        return pa.table(
            {
                "revenue_e4": pa.array([rev], pa.int64()),
                "n_rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    import ray.data as rd

    # seed one (0, 0) row so the final aggregate emits exactly one row even
    # when no lineitem survives the filters (SQL's SUM-over-empty contract)
    seed = rd.from_arrow(
        pa.table({"revenue_e4": pa.array([0], pa.int64()),
                  "n_rows": pa.array([0], pa.int64())})
    )
    partials = ds.map_batches(partial, batch_format="pyarrow").union(seed)

    def finish(b: pa.Table) -> pa.Table:
        rev = pc.sum(b["revenue_e4"]).as_py() or 0
        n = pc.sum(b["n_rows"]).as_py() or 0
        return pa.table(
            {
                "revenue_e4": pa.array([rev], pa.int64()),
                "n_rows": pa.array([n], pa.int64()),
            }
        )

    from ..functions.schema import ensure_schema

    return ensure_schema(
        partials.repartition(1).map_batches(finish, batch_format="pyarrow"),
        _schema,
    )


# ---------------------------------------------------------------------------
# Q4-style: order priority counts gated by an EXISTS semi-join
# ---------------------------------------------------------------------------

Q4_LO = "1996-07-01"
Q4_HI = "1996-10-01"  # quarter end; also the late-shipment cutoff


def q4_priority_semijoin(sf_dir: str):
    """TPC-H Q4 shape (adapted to this schema: "late" = a lineitem shipped
    after quarter end, standing in for commitdate < receiptdate): count the
    quarter's orders per priority where EXISTS such a lineitem.

    Scale shape: both sides are fact tables, so the EXISTS runs as a
    hash-partition DISTINCT + inner ``Dataset.join`` on the orderkey (the
    broadcast key-set variant next door — semi_join_customers — assumes a
    driver-sized key set; late-shipment keys are corpus-proportional, so
    here the keys stay distributed).  Date predicates are pushed into both
    scans; the count collapses map-side after the join."""
    lo = np.datetime64(Q4_LO, "us")
    hi = np.datetime64(Q4_HI, "us")

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        row_filter=(
            (pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi)
        ),
    )

    def oprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        )
        return b.select(["o_orderkey", "o_orderpriority"])

    late = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_shipdate"],
        row_filter=(pads.field("l_shipdate") >= hi),
    )

    def lprep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["l_shipdate"], pa.scalar(hi)))
        # per-batch distinct before the exchange: one row per late orderkey
        return pa.table({"l_orderkey": pc.unique(b["l_orderkey"])})

    keys = (
        late.map_batches(lprep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .count()
        .drop_columns(["count()"])
    )

    joined = orders.map_batches(oprep, batch_format="pyarrow").join(
        keys,
        "inner",
        num_partitions=16,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def to_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        joined.map_batches(to_partial, batch_format="pyarrow"),
        ["o_orderpriority"],
        ["n_orders"],
    )


# ---------------------------------------------------------------------------
# Q3-style: top unshipped orders (broadcast joins)
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_DATE = "1997-01-01"


def q3_top_orders(sf_dir: str, use_bloom: bool = False):
    """Dimension (customer) broadcast + fact-fact hash-partition shuffle join
    (orders x lineitem via ``Dataset.join``) — both filters pushed below the
    join so only qualifying rows shuffle.  At 10^12-row scale the orders
    side cannot be broadcast; this is the join shape that holds.

    Semi-join pushdown (``use_bloom=True``): a Bloom filter over the
    qualifying orderkeys (``functions.filters``) drops non-matching
    lineitem rows BEFORE the exchange.  One-sided error means the join
    result is provably unchanged (the hash join verifies every candidate);
    the shuffle then moves only matching + false-positive probe rows.
    Off by default: on this single-node sandbox the build barrier costs
    more than the in-memory shuffle it saves (measured in
    ``functions/filters.py``); it is the multi-node network-shuffle knob."""
    import ray

    from ..functions.filters import bloom_contains, build_bloom

    cust = _read_dim(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    cust_keys = cust.loc[cust["c_mktsegment"] == Q3_SEGMENT, "c_custkey"].to_numpy()
    # dimension-sized: broadcast ONE Arrow array, probe with the vectorized
    # pc.is_in hash-set kernel (never a per-row Python membership loop)
    cust_ref = ray.put(pa.array(cust_keys, pa.int64()))
    cutoff = pa.scalar(np.datetime64(Q3_DATE, "us"))

    def prep_orders(batch: pa.Table) -> pa.Table:
        ck = ray.get(cust_ref)
        batch = batch.filter(pc.less(batch["o_orderdate"], cutoff))
        batch = batch.filter(pc.is_in(batch["o_custkey"], value_set=ck))
        days = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 86_400_000_000
        )
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate_day": pa.array(days, pa.int64()),
            }
        )

    # materialize the filtered+projected build side (16 bytes/row after the
    # segment+date cut) so it feeds BOTH the bloom build and the join
    # without re-reading the orders table
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(prep_orders, batch_format="pyarrow")
    if use_bloom:
        orders = orders.materialize()
        bloom_ref = ray.put(build_bloom(orders, "o_orderkey"))

    def prep_li(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cutoff))
        if use_bloom:
            keys = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.filter(pa.array(bloom_contains(ray.get(bloom_ref), keys)))
        price_c = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc_c = _cents(batch["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "revenue_e4": pa.array(price_c * (100 - disc_c)),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(prep_li, batch_format="pyarrow")

    joined = li.join(
        orders,
        "inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"],
                "o_orderdate_day": batch["o_orderdate_day"],
                "revenue_e4": batch["revenue_e4"],
            }
        )

    agg = _partial_then_global(
        joined.map_batches(rename, batch_format="pyarrow"),
        ["o_orderkey", "o_orderdate_day"],
        ["revenue_e4"],
    )

    # distributed top-10: per-block partial top-k first (the global top-10
    # is contained in the union of per-block top-10s), so the final sort
    # exchange moves <= 10 x blocks rows — never the full (orderkey, day)
    # aggregate, which is millions of rows at real SF
    def block_topk(b: pa.Table) -> pa.Table:
        b = b.select(["o_orderkey", "o_orderdate_day", "revenue_e4"])
        idx = pc.sort_indices(
            b,
            sort_keys=[("revenue_e4", "descending"), ("o_orderkey", "ascending")],
        )
        return b.take(idx[:10])

    return (
        agg.map_batches(block_topk, batch_format="pyarrow")
        .sort(["revenue_e4", "o_orderkey"], descending=[True, False])
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-style: revenue by nation within a region (chained broadcast lookups)
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"


def q5_region_revenue(sf_dir: str):
    """Dimensions (region/nation/supplier/customer) broadcast as lookup maps;
    the fact-fact edge (orders x lineitem) is a hash-partition shuffle join.
    At extreme SF, customer graduates from broadcast to a join too — the
    threshold is "fits comfortably in a worker heap", not table role."""
    import ray

    region = _read_dim(sf_dir, "region")
    nation = _read_dim(sf_dir, "nation")
    rkeys = set(region[region["r_name"] == Q5_REGION]["r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)].sort_values("n_nationkey")
    nat_keys = nat["n_nationkey"].to_numpy(dtype=np.int64)
    nat_names = nat["n_name"].to_numpy()

    # broadcast each dimension as (sorted keys, values) numpy pairs; probes
    # are vectorized np.searchsorted binary searches, not per-row dict gets
    supplier = _read_dim(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).sort_values("s_suppkey")
    customer = _read_dim(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).sort_values("c_custkey")
    refs = ray.put(
        (
            nat_keys,
            nat_names,
            supplier["s_suppkey"].to_numpy(dtype=np.int64),
            supplier["s_nationkey"].to_numpy(dtype=np.int64),
            customer["c_custkey"].to_numpy(dtype=np.int64),
            customer["c_nationkey"].to_numpy(dtype=np.int64),
        )
    )

    def _lookup(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray) -> np.ndarray:
        """Vectorized sorted-array map: probe -> vals[probe's key], -1 on miss."""
        idx = np.searchsorted(keys, probe)
        idx_c = np.clip(idx, 0, len(keys) - 1)
        hit = keys[idx_c] == probe
        out = np.where(hit, vals[idx_c], -1)
        return out

    def prep_orders(batch: pa.Table) -> pa.Table:
        nk, _, _, _, ck, cv = ray.get(refs)
        probe = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_nat = _lookup(ck, cv, probe)
        # pushdown: the final predicate is s_nat == c_nat and every surviving
        # lineitem row has s_nat in the region's nations, so orders whose
        # customer nation is outside the region can never match — drop them
        # BEFORE the exchange (~(1 - 1/regions) of the build side)
        keep = np.isin(c_nat, nk)
        batch = batch.filter(pa.array(keep))
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "c_nat": pa.array(c_nat[keep], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]).map_batches(
        prep_orders, batch_format="pyarrow"
    )

    def prep_li(batch: pa.Table) -> pa.Table:
        nk, _, sk, sv, _, _ = ray.get(refs)
        probe = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = _lookup(sk, sv, probe)
        keep = np.isin(s_nat, nk)
        batch = batch.filter(pa.array(keep))
        price_c = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc_c = _cents(batch["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "s_nat": pa.array(s_nat[keep], pa.int64()),
                "revenue_e4": pa.array(price_c * (100 - disc_c)),
            }
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(prep_li, batch_format="pyarrow")

    joined = li.join(
        orders,
        "inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def finish(batch: pa.Table) -> pa.Table:
        nk, nv, _, _, _, _ = ray.get(refs)
        batch = batch.filter(pc.equal(batch["s_nat"], batch["c_nat"]))
        s_nat = batch["s_nat"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = nv[np.searchsorted(nk, s_nat)]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_e4": batch["revenue_e4"],
            }
        )

    return _partial_then_global(
        joined.map_batches(finish, batch_format="pyarrow"), ["n_name"], ["revenue_e4"]
    )


# ---------------------------------------------------------------------------
# Simple operators: top-k, distinct, semi/anti join, hash split
# ---------------------------------------------------------------------------

def top_docs_by_chars(sf_dir: str):
    """Top-50 by n_chars: per-block partial top-50, then a tiny final sort
    over <= 50 x blocks rows — the full table is never sort-shuffled."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def block_topk(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            b, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        return b.take(idx[:50])

    return (
        ds.map_batches(block_topk, batch_format="pyarrow")
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(50)
    )


def distinct_event_types(sf_dir: str):
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


ANTI_CUTOFF = "1995-07-01"


def _custkeys_with_orders(sf_dir: str, before: str | None = None) -> pa.Array:
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    if before is not None:
        cutoff = np.datetime64(before, "us")
        orders = orders.map_batches(
            lambda b: b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff))),
            batch_format="pyarrow",
        )
    return pa.array(sorted(orders.unique("o_custkey")), pa.int64())


def semi_join_customers(sf_dir: str):
    """Customers with >=1 order, counted per market segment (broadcast
    key-set semi-join: no shuffle)."""
    import ray

    keys_ref = ray.put(_custkeys_with_orders(sf_dir))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def sel(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        batch = batch.filter(pc.is_in(batch["c_custkey"], value_set=keys))
        return pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        cust.map_batches(sel, batch_format="pyarrow"), ["c_mktsegment"], ["n"]
    )


def anti_join_customers(sf_dir: str):
    """Customers with no orders before ANTI_CUTOFF, per market segment
    (broadcast key-set anti-join; the cutoff keeps the result non-empty on
    the synthetic data, where every customer eventually orders)."""
    import ray

    keys_ref = ray.put(_custkeys_with_orders(sf_dir, before=ANTI_CUTOFF))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def sel(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        batch = batch.filter(
            pc.invert(pc.is_in(batch["c_custkey"], value_set=keys))
        )
        return pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        cust.map_batches(sel, batch_format="pyarrow"), ["c_mktsegment"], ["n"]
    )


def split_hash_buckets(sf_dir: str):
    """Deterministic train/val/test-style split: first hex char of
    md5(doc_id) -> 16 buckets, counted.  The md5 keying matches the oracle
    SQL exactly (analogue of the reference's random split
    /root/reference/src/prepare_data/split_dataset.py:9-19, made
    deterministic per SURVEY.md T5)."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def bucket(batch: pa.Table) -> pa.Table:
        from ..functions.hashing import id_bucket_digit

        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        digits = id_bucket_digit(ids)
        bs = np.array(list("0123456789abcdef"), dtype=object)[digits]
        return pa.table(
            {
                "bucket": pa.array(bs, pa.string()),
                "n": pa.array(np.ones(len(bs), dtype=np.int64)),
            }
        )

    return _partial_then_global(
        ds.map_batches(bucket, batch_format="pyarrow"), ["bucket"], ["n"]
    )


def part_type_stats(sf_dir: str):
    ds = _read(sf_dir, "part", columns=["p_type", "p_retailprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_type": batch["p_type"],
                "price_cents": _cents(batch["p_retailprice"]),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    agg = _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["p_type"], ["price_cents", "n"]
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_type": batch["p_type"],
                "n_parts": batch["n"],
                "sum_price_cents": batch["price_cents"],
                "avg_price_ppm": pc.cast(
                    pc.divide(
                        pc.multiply(batch["price_cents"], pa.scalar(10000, pa.int64())),
                        batch["n"],
                    ),
                    pa.int64(),
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def cust_order_counts(sf_dir: str):
    """Per-customer order count INCLUDING zero-order customers: the counts
    side is pre-aggregated to one row per custkey (map-side partials, so the
    shuffle moves partials, not orders), then a hash-partition LEFT OUTER
    ``Dataset.join`` preserves unmatched customers and the null count is
    filled with 0.  This is the outer-join member of the J-family —
    semi/anti siblings are ``semi_join_customers`` / ``anti_join_customers``."""
    counts = _partial_then_global(
        _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
            lambda b: pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "n_orders": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        ["n_orders"],
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = cust.join(
        counts,
        "left_outer",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_mktsegment": batch["c_mktsegment"],
                "n_orders": pc.cast(
                    pc.fill_null(batch["n_orders"], pa.scalar(0, pa.int64())),
                    pa.int64(),
                ),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Grouped top-k / rollup / pivot (classic warehouse shapes)
# ---------------------------------------------------------------------------


def _segment_lookup(sf_dir: str):
    """Broadcast (sorted custkey array, segment array) for vectorized
    searchsorted dimension lookups.  Dimension-sized (same policy and
    graduation note as the q3/q5 broadcasts)."""
    import ray

    cust = _read_dim(
        sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]
    ).sort_values("c_custkey")
    return ray.put(
        (
            cust["c_custkey"].to_numpy().astype(np.int64),
            cust["c_mktsegment"].to_numpy(),
        )
    )


def _orders_with_segment(sf_dir: str, lookup_ref, with_year: bool):
    """orders -> (c_mktsegment, price_cents[, o_year]) via the broadcast
    dimension; one searchsorted per batch, never a per-row loop."""
    import ray

    cols = ["o_orderkey", "o_custkey", "o_totalprice"] + (
        ["o_orderdate"] if with_year else []
    )

    def prep(batch: pa.Table) -> pa.Table:
        keys, segs = ray.get(lookup_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = segs[np.searchsorted(keys, ck)]  # FK integrity: every key hits
        out = {
            "c_mktsegment": pa.array(seg, pa.string()),
            "o_orderkey": batch["o_orderkey"],
            "price_cents": _cents(batch["o_totalprice"]),
        }
        if with_year:
            yr = (
                batch["o_orderdate"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]")
                .astype(np.int64)
                + 1970
            )
            out["o_year"] = pa.array(yr, pa.int64())
        return pa.table(out)

    return _read(sf_dir, "orders", columns=cols).map_batches(
        prep, batch_format="pyarrow"
    )


TOPK_PER_SEGMENT = 3


def top_orders_per_segment(sf_dir: str, k: int = TOPK_PER_SEGMENT):
    """Grouped top-k: the k highest-price orders per market segment, with
    rank (ties broken by o_orderkey ASC) — the `row_number() <= k` window
    shape.  Scale: per-block grouped partial top-k first (the global per-key
    top-k is contained in the union of per-block per-key top-ks), so the
    final exchange moves <= k x segments x blocks rows, never all orders."""
    import pandas as pd

    from ..functions.schema import ensure_schema

    def block_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["c_mktsegment", "price_cents", "o_orderkey"],
            ascending=[True, False, True],
        )
        return pa.Table.from_pandas(
            df.groupby("c_mktsegment", sort=False).head(k), preserve_index=False
        )

    def seg_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
        g = g.head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    ds = _orders_with_segment(sf_dir, _segment_lookup(sf_dir), with_year=False)
    return ensure_schema(
        ds.map_batches(block_topk, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .map_groups(seg_topk, batch_format="pandas"),
        pa.schema(
            [
                ("c_mktsegment", pa.string()),
                ("o_orderkey", pa.int64()),
                ("price_cents", pa.int64()),
                ("rank", pa.int64()),
            ]
        ),
    )


# grouping-set masks: (keep_segment, keep_year) per output grain; a masked
# key collapses to the 'ALL' / -1 subtotal sentinel (coalesce'd identically
# in the oracle)
_ROLLUP_SETS = ((True, True), (True, False), (False, False))
_CUBE_SETS = ((True, True), (True, False), (False, True), (False, False))


def _segment_year_grouping_sets(sf_dir: str, sets):
    """Shared GROUPING SETS plan over (segment, year): one pass builds
    per-batch (segment, year) partials; each partial row is expanded
    map-side into every requested grouping set (len(sets) x
    GROUP-cardinality rows, independent of input rows); ONE tiny groupby
    sums all grains — the fact table is scanned exactly once."""

    ds = _orders_with_segment(sf_dir, _segment_lookup(sf_dir), with_year=True)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "o_year": batch["o_year"],
                "revenue_cents": batch["price_cents"],
                "n_orders": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    fine = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        lambda b: b.group_by(["c_mktsegment", "o_year"])
        .aggregate([("revenue_cents", "sum"), ("n_orders", "sum")])
        .rename_columns(["c_mktsegment", "o_year", "revenue_cents", "n_orders"]),
        batch_format="pyarrow",
    )

    def expand_levels(b: pa.Table) -> pa.Table:
        n = b.num_rows
        seg = b["c_mktsegment"].to_numpy(zero_copy_only=False)
        yr = b["o_year"].to_numpy(zero_copy_only=False)
        rev = b["revenue_cents"].to_numpy(zero_copy_only=False)
        cnt = b["n_orders"].to_numpy(zero_copy_only=False)
        all_seg = np.concatenate(
            [seg if keep_seg else np.full(n, "ALL", dtype=object) for keep_seg, _ in sets]
        )
        all_yr = np.concatenate(
            [yr if keep_yr else np.full(n, -1) for _, keep_yr in sets]
        )
        return pa.table(
            {
                "c_mktsegment": pa.array(all_seg, pa.string()),
                "o_year": pa.array(all_yr, pa.int64()),
                "revenue_cents": pa.array(np.tile(rev, len(sets))),
                "n_orders": pa.array(np.tile(cnt, len(sets))),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        fine.map_batches(expand_levels, batch_format="pyarrow")
        .groupby(["c_mktsegment", "o_year"])
        .aggregate(
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n_orders", alias_name="n_orders"),
        )
    )
    return agg.map_batches(
        lambda b: b.select(["c_mktsegment", "o_year", "revenue_cents", "n_orders"]),
        batch_format="pyarrow",
    )


def revenue_rollup(sf_dir: str):
    """ROLLUP(segment, year): revenue + order count at (segment, year),
    (segment, ALL) and (ALL, ALL) grain — the 3-set member of the shared
    grouping-sets plan (see ``_segment_year_grouping_sets``)."""
    return _segment_year_grouping_sets(sf_dir, _ROLLUP_SETS)


PIVOT_YEARS = tuple(range(1992, 1999))


def orders_pivot_by_year(sf_dir: str):
    """PIVOT: one row per market segment, one int64 count column per order
    year (y1992..y1998).  Scale: per-batch (segment, year) count partials ->
    tiny global groupby -> the pivot itself runs on the GROUP-cardinality
    aggregate (segments x years rows), one map_groups per segment."""
    import pandas as pd

    from ..functions.schema import ensure_schema

    ds = _orders_with_segment(sf_dir, _segment_lookup(sf_dir), with_year=True)

    counts = _partial_then_global(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "c_mktsegment": b["c_mktsegment"],
                    "o_year": b["o_year"],
                    "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["c_mktsegment", "o_year"],
        ["n"],
    )

    def pivot_seg(g: pd.DataFrame) -> pd.DataFrame:
        by_year = dict(zip(g["o_year"], g["n"]))
        row = {"c_mktsegment": [g["c_mktsegment"].iloc[0]]}
        for y in PIVOT_YEARS:
            row[f"y{y}"] = [np.int64(by_year.get(y, 0))]
        return pd.DataFrame(row)

    return ensure_schema(
        counts.groupby("c_mktsegment").map_groups(pivot_seg, batch_format="pandas"),
        pa.schema(
            [("c_mktsegment", pa.string())]
            + [(f"y{y}", pa.int64()) for y in PIVOT_YEARS]
        ),
    )


# below this many customers the per-customer stats table broadcasts via
# ray.put (~24 B/customer -> ~120 MB at the bound); above, the hash join
AVG_BROADCAST_MAX_CUST = 5_000_000


def orders_above_cust_avg(sf_dir: str):
    """Orders whose price exceeds their OWN customer's average order price —
    the correlated-subquery shape, decorrelated: per-customer (sum, count)
    partials -> tiny groupby -> hash join back to orders -> exact integer
    predicate ``price_cents * n > sum_cents`` (no division, no floats, so
    the oracle comparison is bit-for-bit).

    Scale: the aggregate side the join ships is one row per customer; the
    orders side streams through the same hash-partition exchange as
    q3/q5's fact-fact edge.  Below ``AVG_BROADCAST_MAX_CUST`` customers
    (from parquet metadata — no execution) the per-customer stats table is
    broadcast via ``ray.put`` instead and the filter becomes a MAP-ONLY
    searchsorted lookup, skipping the join exchange entirely (the same
    size-adaptive cutover as connected_components / q5's dimensions; both
    paths produce identical rows and share the exact integer predicate)."""
    import pyarrow.parquet as pq

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "price_cents": _cents(batch["o_totalprice"]),
            }
        )

    # materialize once: both the per-customer aggregate and the final
    # filter/join pass consume `orders`, and without this the read+prep
    # lineage would execute twice (one extra full fact-table scan) — same
    # pattern as q3's use_bloom materialize.
    orders = (
        _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        .map_batches(prep, batch_format="pyarrow")
        .materialize()
    )

    stats = _partial_then_global(
        orders.map_batches(
            lambda b: pa.table(
                {
                    "custkey": b["o_custkey"],
                    "sum_cents": b["price_cents"],
                    "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["custkey"],
        ["sum_cents", "n"],
    )

    n_cust = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    if n_cust <= AVG_BROADCAST_MAX_CUST:
        import ray

        mat = stats.to_pandas().sort_values("custkey")
        ref = ray.put(
            (
                mat["custkey"].to_numpy(dtype=np.int64),
                mat["sum_cents"].to_numpy(dtype=np.int64),
                mat["n"].to_numpy(dtype=np.int64),
            )
        )

        def bfilt(batch: pa.Table) -> pa.Table:
            ck, sc, nn = ray.get(ref)
            probe = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(ck, probe)  # every order's customer exists
            p = batch["price_cents"].to_numpy(zero_copy_only=False)
            keep = p * nn[idx] > sc[idx]
            return batch.filter(pa.array(keep)).select(
                ["o_orderkey", "o_custkey", "price_cents"]
            )

        return orders.map_batches(bfilt, batch_format="pyarrow")

    joined = orders.join(
        stats,
        "inner",
        num_partitions=16,
        on=("o_custkey",),
        right_on=("custkey",),
    )

    def filt(batch: pa.Table) -> pa.Table:
        p = batch["price_cents"].to_numpy(zero_copy_only=False)
        s = batch["sum_cents"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        keep = p * n > s
        out = batch.filter(pa.array(keep))
        return out.select(["o_orderkey", "o_custkey", "price_cents"])

    return joined.map_batches(filt, batch_format="pyarrow")


YOY_Y1 = "1996-01-01"
YOY_Y2 = "1997-01-01"
YOY_Y3 = "1998-01-01"


def cust_yoy_activity(sf_dir: str):
    """Year-over-year customer activity: per-customer 1996 vs 1997 order
    counts, FULL OUTER joined so one-sided customers survive with a zero
    on the missing year, plus a churn status ('new' = 1997 only,
    'churned' = 1996 only, 'retained' = both).  The full-outer member of
    the J-family (left outer: cust_order_counts; semi/anti: the
    _customers pair; distributed semi: q4).

    Scale shape: each year collapses map-side to one (custkey, n) row per
    key (partials, never orders), then ONE hash-partition full-outer
    ``Dataset.join`` of the two aggregate tables; status/fill is a
    map-only pass below the exchange."""
    y1 = np.datetime64(YOY_Y1, "us")
    y2 = np.datetime64(YOY_Y2, "us")
    y3 = np.datetime64(YOY_Y3, "us")

    def year_counts(lo, hi, key_name):
        ds = _read(
            sf_dir,
            "orders",
            columns=["o_custkey", "o_orderdate"],
            row_filter=(
                (pads.field("o_orderdate") >= lo)
                & (pads.field("o_orderdate") < hi)
            ),
        )

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.and_(
                    pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)),
                )
            )
            return pa.table(
                {
                    key_name: pc.cast(b["o_custkey"], pa.int64()),
                    f"n_{key_name}": pa.array(
                        np.ones(b.num_rows, dtype=np.int64)
                    ),
                }
            )

        return _partial_then_global(
            ds.map_batches(prep, batch_format="pyarrow"),
            [key_name],
            [f"n_{key_name}"],
        )

    a = year_counts(y1, y2, "ck_a")
    b = year_counts(y2, y3, "ck_b")

    joined = a.join(
        b,
        "full_outer",
        num_partitions=16,
        on=("ck_a",),
        right_on=("ck_b",),
    )

    _out_schema = pa.schema(
        [
            ("o_custkey", pa.int64()),
            ("n_1996", pa.int64()),
            ("n_1997", pa.int64()),
            ("status", pa.string()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        # Ray's full_outer join coalesces the key pair into the LEFT key
        # column; one-sidedness survives in the count columns' nulls
        ck = t["ck_a"]
        n1 = pc.fill_null(pc.cast(t["n_ck_a"], pa.int64()), 0)
        n2 = pc.fill_null(pc.cast(t["n_ck_b"], pa.int64()), 0)
        status = pc.if_else(
            pc.equal(n1, 0),
            pa.scalar("new"),
            pc.if_else(pc.equal(n2, 0), pa.scalar("churned"), pa.scalar("retained")),
        )
        return pa.table(
            {
                "o_custkey": pc.cast(ck, pa.int64()),
                "n_1996": n1,
                "n_1997": n2,
                "status": status,
            }
        )

    from ..functions.schema import ensure_schema

    return ensure_schema(
        joined.map_batches(finish, batch_format="pyarrow"), _out_schema
    )


# ---------------------------------------------------------------------------
# Q18-style: large-quantity orders (aggregate-HAVING reducer + join-back)
# ---------------------------------------------------------------------------

Q18_QTY_MIN_C = 25_000  # HAVING sum(l_quantity) > 250.00, in cents


def q18_large_orders(sf_dir: str):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, decorated with customer name and order facts.  The defining
    scale property is that the HAVING filter runs ON THE AGGREGATE, so the
    join-back ships one row per *qualifying order* (~top 1% of keys), never
    lineitems: per-batch (orderkey, qty) partials -> tiny keyed groupby ->
    HAVING cut -> hash join back to orders -> broadcast customer-name
    lookup -> distributed partial top-k.

    Every money/qty column is exact integer cents; the final order is
    (sum_qty_cents DESC, o_orderkey ASC) LIMIT 100, so the result is
    deterministic and bit-for-bit comparable to the DuckDB oracle."""
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def lprep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "sum_qty_cents": _cents(b["l_quantity"]),
            }
        )

    # the HAVING side is materialized (it is tiny — one row per
    # QUALIFYING order) and normalized to drop 0-row blocks: a typed
    # 0-row block still loses its schema inside the hash-join shuffle
    # (Ray 2.49 quirk, CLAUDE.md) and the post-filter stream produces
    # them freely; the count probe then guards the fully-empty case
    # before the join (the q7/q8 pattern).
    big = (
        _partial_then_global(
            li.map_batches(lprep, batch_format="pyarrow"),
            ["l_orderkey"],
            ["sum_qty_cents"],
        )
        .map_batches(
            lambda b: b.filter(
                pc.greater(
                    b["sum_qty_cents"], pa.scalar(Q18_QTY_MIN_C, pa.int64())
                )
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    out_schema = pa.schema(
        [
            ("c_name", pa.string()),
            ("o_custkey", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate_day", pa.int64()),
            ("total_price_cents", pa.int64()),
            ("sum_qty_cents", pa.int64()),
        ]
    )
    if big.count() == 0:
        return out_schema.empty_table()
    big = big.repartition(4)  # re-blocks away 0-row post-filter blocks

    def oprep(b: pa.Table) -> pa.Table:
        days = (
            b["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 86_400_000_000
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_orderdate_day": pa.array(days, pa.int64()),
                "total_price_cents": _cents(b["o_totalprice"]),
            }
        )

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(oprep, batch_format="pyarrow")

    joined = big.join(
        orders,
        "inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    # customer is dimension-sized: broadcast (sorted custkey, name) once,
    # decorate below the exchange with a vectorized searchsorted lookup
    cust = _read_dim(sf_dir, "customer", columns=["c_custkey", "c_name"]).sort_values(
        "c_custkey"
    )
    cust_ref = ray.put(
        (cust["c_custkey"].to_numpy(dtype=np.int64), cust["c_name"].to_numpy())
    )

    def decorate(b: pa.Table) -> pa.Table:
        ck, cn = ray.get(cust_ref)
        probe = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ck, probe)  # every order's customer exists
        return pa.table(
            {
                "c_name": pa.array(cn[idx], pa.string()),
                "o_custkey": b["o_custkey"],
                "o_orderkey": b["l_orderkey"],
                "o_orderdate_day": b["o_orderdate_day"],
                "total_price_cents": b["total_price_cents"],
                "sum_qty_cents": b["sum_qty_cents"],
            }
        )

    from ..functions.core import partial_topk

    return partial_topk(
        joined.map_batches(decorate, batch_format="pyarrow"),
        ["sum_qty_cents", "o_orderkey"],
        [False, True],
        100,
    )


# ---------------------------------------------------------------------------
# Q14-style: promo revenue share (dimension broadcast + conditional scalar)
# ---------------------------------------------------------------------------

Q14_LO = "1996-09-01"
Q14_HI = "1996-10-01"


def q14_promo_ratio(sf_dir: str):
    """TPC-H Q14 shape: the month's revenue share of promo-type parts.
    The part dimension is broadcast ONCE as (sorted partkey, is_promo)
    numpy pairs; each lineitem batch resolves promo membership with one
    searchsorted pass and collapses to a single (promo, total, n) partial
    row — zero shuffle, one driver-bounded result row (typed, seeded so an
    empty month still emits the SQL SUM-over-empty contract row).

    ``promo_ppm`` is exact integer: promo_rev * 1e6 // total_rev (both
    revenues are nonnegative e4-cent integers, so floor == trunc and the
    DuckDB ``//`` matches bit-for-bit)."""
    import ray

    lo = np.datetime64(Q14_LO, "us")
    hi = np.datetime64(Q14_HI, "us")

    part = _read_dim(sf_dir, "part", columns=["p_partkey", "p_type"]).sort_values(
        "p_partkey"
    )
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(dtype=np.int64),
            (part["p_type"] == "PROMO").to_numpy(dtype=bool),
        )
    )

    _schema = pa.schema(
        [
            ("promo_rev_e4", pa.int64()),
            ("total_rev_e4", pa.int64()),
            ("promo_ppm", pa.int64()),
            ("n_rows", pa.int64()),
        ]
    )
    _partial_schema = pa.schema(
        [
            ("promo_rev_e4", pa.int64()),
            ("total_rev_e4", pa.int64()),
            ("n_rows", pa.int64()),
        ]
    )

    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        row_filter=(
            (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
        )
        if b.num_rows == 0:
            return _partial_schema.empty_table()
        pk, promo = ray.get(part_ref)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(pk, probe)
        idx_c = np.clip(idx, 0, len(pk) - 1)
        hit = pk[idx_c] == probe  # inner-join semantics: unknown parts drop
        price_c = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc_c = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        rev = (price_c * (100 - disc_c))[hit]
        is_promo = promo[idx_c][hit]
        return pa.table(
            {
                "promo_rev_e4": pa.array([int(rev[is_promo].sum())], pa.int64()),
                "total_rev_e4": pa.array([int(rev.sum())], pa.int64()),
                "n_rows": pa.array([int(hit.sum())], pa.int64()),
            }
        )

    import ray.data as rd

    seed = rd.from_arrow(
        pa.table(
            {
                "promo_rev_e4": pa.array([0], pa.int64()),
                "total_rev_e4": pa.array([0], pa.int64()),
                "n_rows": pa.array([0], pa.int64()),
            }
        )
    )
    partials = ds.map_batches(partial, batch_format="pyarrow").union(seed)

    def finish(b: pa.Table) -> pa.Table:
        promo = pc.sum(b["promo_rev_e4"]).as_py() or 0
        total = pc.sum(b["total_rev_e4"]).as_py() or 0
        n = pc.sum(b["n_rows"]).as_py() or 0
        ppm = promo * 1_000_000 // total if total else 0
        return pa.table(
            {
                "promo_rev_e4": pa.array([promo], pa.int64()),
                "total_rev_e4": pa.array([total], pa.int64()),
                "promo_ppm": pa.array([ppm], pa.int64()),
                "n_rows": pa.array([n], pa.int64()),
            }
        )

    from ..functions.schema import ensure_schema

    return ensure_schema(
        partials.repartition(1).map_batches(finish, batch_format="pyarrow"),
        _schema,
    )


# ---------------------------------------------------------------------------
# Q13-style: customer order-count distribution (left-join histogram)
# ---------------------------------------------------------------------------

Q13_EXCLUDE_PRIORITY = "1-URGENT"


def cust_order_dist(sf_dir: str):
    """TPC-H Q13 shape: the distribution of per-customer order counts
    INCLUDING the zero bucket (customers with no qualifying orders), with
    orders filtered by a join-level predicate (priority != 1-URGENT).

    Scale shape: the classic formulation is a LEFT OUTER join of customer
    against orders — but the join is unnecessary: per-custkey counts come
    from map-side partials over the filtered orders scan, the histogram
    over counts is a second (tiny: one row per distinct count value)
    partial aggregation, and the zero bucket is pure arithmetic —
    ``n_customers - n_custkeys_with_orders`` — where n_customers is read
    from parquet METADATA (zero rows scanned) and the with-orders count is
    the sum of the histogram itself.  Relies on referential integrity
    (every o_custkey exists in customer), which the star schema guarantees.
    The result is driver-bounded (distinct count values), so it returns a
    typed ``pa.Table``."""
    import pyarrow.parquet as pq

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderpriority"],
        row_filter=(pads.field("o_orderpriority") != Q13_EXCLUDE_PRIORITY),
    )

    def oprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.not_equal(b["o_orderpriority"], pa.scalar(Q13_EXCLUDE_PRIORITY))
        )
        return pa.table(
            {
                "o_custkey": b["o_custkey"],
                "c_count": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    counts = _partial_then_global(
        orders.map_batches(oprep, batch_format="pyarrow"), ["o_custkey"], ["c_count"]
    )

    def to_hist_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": b["c_count"],
                "custdist": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    hist = _partial_then_global(
        counts.map_batches(to_hist_partial, batch_format="pyarrow"),
        ["c_count"],
        ["custdist"],
    ).take_all()

    n_customers = pq.ParquetFile(f"{sf_dir}/customer.parquet").metadata.num_rows
    n_with_orders = sum(r["custdist"] for r in hist)
    rows = [(int(r["c_count"]), int(r["custdist"])) for r in hist]
    if n_customers - n_with_orders > 0:
        rows.append((0, n_customers - n_with_orders))
    rows.sort(key=lambda t: (-t[1], -t[0]))
    return pa.table(
        {
            "c_count": pa.array([r[0] for r in rows], pa.int64()),
            "custdist": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q15-style: top supplier(s) by window revenue (argmax over an aggregate)
# ---------------------------------------------------------------------------

Q15_LO = "1996-01-01"
Q15_HI = "1996-04-01"


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) whose quarter revenue equals the
    MAXIMUM per-supplier revenue — an argmax over an aggregate, ties kept.

    Scale shape: per-supplier revenue comes from map-side (suppkey, rev)
    partials over the date-pruned lineitem scan; the reduced table (one
    row per supplier) is MATERIALIZED once so the max and the equality
    filter reuse one lineage instead of re-scanning lineitem twice (the
    orders_above_cust_avg pattern); supplier names decorate below via a
    broadcast sorted-array lookup.  Revenue is exact integer e4-cents."""
    import ray

    lo = np.datetime64(Q15_LO, "us")
    hi = np.datetime64(Q15_HI, "us")

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        row_filter=(
            (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
        ),
    )

    def lprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
        )
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
        )
        return pa.table({"l_suppkey": b["l_suppkey"], "total_rev_e4": rev})

    rev = _partial_then_global(
        li.map_batches(lprep, batch_format="pyarrow"),
        ["l_suppkey"],
        ["total_rev_e4"],
    ).materialize()

    best = rev.max("total_rev_e4")

    sup = _read_dim(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).sort_values(
        "s_suppkey"
    )
    sup_ref = ray.put(
        (sup["s_suppkey"].to_numpy(dtype=np.int64), sup["s_name"].to_numpy())
    )

    def decorate(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["total_rev_e4"], pa.scalar(best, pa.int64())))
        sk, sn = ray.get(sup_ref)
        probe = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(sk, probe)  # RI: every lineitem supplier exists
        return pa.table(
            {
                "s_suppkey": b["l_suppkey"],
                "s_name": pa.array(sn[idx], pa.string()),
                "total_rev_e4": b["total_rev_e4"],
            }
        )

    from ..functions.schema import ensure_schema

    out = rev.map_batches(decorate, batch_format="pyarrow").sort("s_suppkey")
    return ensure_schema(
        out,
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("total_rev_e4", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q22-style: idle above-average-balance customers (scalar subquery + anti)
# ---------------------------------------------------------------------------

Q22_IDLE_SINCE = "2000-06-01"


def cust_idle_above_avg(sf_dir: str):
    """TPC-H Q22 shape: customers whose balance exceeds the positive-balance
    average and who have placed NO order since a cutoff, counted per market
    segment.  Combines a scalar aggregate subquery with a NOT EXISTS
    anti-join.

    Scale shape: the threshold test is cross-multiplied to exact integers
    (bal * n_pos > sum_pos — no float average on either side); the customer
    scan is materialized once and reused by both the scalar pass and the
    filter pass; the NOT EXISTS side (custkeys active since the cutoff) is
    corpus-proportional, so it stays DISTRIBUTED — per-batch distinct →
    keyed dedup → LEFT OUTER ``Dataset.join`` with a match marker, keep the
    null-marker rows (the anti complement of q4's EXISTS inner join).  The
    broadcast key-set variant next door (anti_join_customers) covers the
    driver-sized case."""

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
        .map_batches(
            lambda b: pa.table(
                {
                    "c_custkey": b["c_custkey"],
                    "c_mktsegment": b["c_mktsegment"],
                    "bal_c": _cents(b["c_acctbal"]),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b["bal_c"].to_numpy(zero_copy_only=False)
        pos = bal[bal > 0]
        return pa.table(
            {
                "n_pos": pa.array([len(pos)], pa.int64()),
                "s_pos": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    tot = cust.map_batches(pos_partial, batch_format="pyarrow").sum(
        ["n_pos", "s_pos"]
    )
    n_pos, s_pos = int(tot["sum(n_pos)"]), int(tot["sum(s_pos)"])

    rich = cust.map_batches(
        lambda b: b.filter(
            pc.greater(
                pc.multiply(b["bal_c"], pa.scalar(n_pos, pa.int64())),
                pa.scalar(s_pos, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )

    cutoff = np.datetime64(Q22_IDLE_SINCE, "us")
    active = _read(
        sf_dir,
        "orders",
        columns=["o_custkey", "o_orderdate"],
        row_filter=(pads.field("o_orderdate") >= cutoff),
    )

    def aprep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff)))
        keys = pc.unique(b["o_custkey"])
        return pa.table(
            {
                "a_custkey": keys,
                "hit": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    active_keys = _partial_then_global(
        active.map_batches(aprep, batch_format="pyarrow"), ["a_custkey"], ["hit"]
    )

    joined = rich.join(
        active_keys,
        "left_outer",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("a_custkey",),
    )

    def idle_partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_null(b["hit"]))
        return pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "n_custs": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "sum_bal_cents": b["bal_c"],
            }
        )

    out = _partial_then_global(
        joined.map_batches(idle_partial, batch_format="pyarrow"),
        ["c_mktsegment"],
        ["n_custs", "sum_bal_cents"],
    ).sort("c_mktsegment")

    from ..functions.schema import ensure_schema

    return ensure_schema(
        out,
        pa.schema(
            [
                ("c_mktsegment", pa.string()),
                ("n_custs", pa.int64()),
                ("sum_bal_cents", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q17-style: small-quantity revenue (correlated per-part average threshold)
# ---------------------------------------------------------------------------

Q17_BRAND = "Brand#12"
# qualifying row: l_quantity < (1/5) * avg(l_quantity) over its part, i.e.
# exactly 5 * qty_cents * n_part_rows < sum_qty_cents — pure int64 on both
# the Ray side and the DuckDB oracle, so the cut cannot drift on floats.
Q17_THRESH_MUL = 5
Q17_YEARS = 7  # TPC-H reports avg yearly revenue = total / 7


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: revenue lost to small-quantity orders of one brand.

    Scale shape: the correlated scalar subquery (per-part average quantity)
    never becomes a self-join.  The brand's partkeys are dimension-sized, so
    they broadcast once (``ray.put`` of a sorted int64 array) and the fact
    scan keeps only that brand's rows map-side — the materialized subset is
    brand-fraction-sized (~1/25 of lineitem), and the per-part (sum, n)
    stats that come out of it are bounded by the brand's PART count, so they
    ride back to every worker as a second broadcast.  Two passes over the
    small subset, zero passes of the full fact table beyond the first
    membership scan, zero shuffle of fact rows."""
    import ray

    part = _read_dim(sf_dir, "part", columns=["p_partkey", "p_brand"])
    brand_keys = np.sort(
        part.loc[part["p_brand"] == Q17_BRAND, "p_partkey"].to_numpy(dtype=np.int64)
    )
    keys_ref = ray.put(brand_keys)

    li = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def fprep(b: pa.Table) -> pa.Table:
        pk = ray.get(keys_ref)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pk):
            idx = np.minimum(np.searchsorted(pk, probe), len(pk) - 1)
            hit = pk[idx] == probe
        else:
            hit = np.zeros(len(probe), dtype=bool)
        b = b.filter(pa.array(hit))
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "qty_cents": _cents(b["l_quantity"]),
                "price_cents": _cents(b["l_extendedprice"]),
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    # one scan of the fact table; the brand subset is reused by both passes
    sub = li.map_batches(fprep, batch_format="pyarrow").materialize()

    stats = _partial_then_global(sub, ["l_partkey"], ["qty_cents", "n"]).to_pandas()
    if "l_partkey" in stats.columns:
        stats = stats.sort_values("l_partkey")
        stats_arrays = (
            stats["l_partkey"].to_numpy(dtype=np.int64),
            stats["qty_cents"].to_numpy(dtype=np.int64),
            stats["n"].to_numpy(dtype=np.int64),
        )
    else:
        # fully-empty Dataset loses its schema in to_pandas (CLAUDE.md
        # quirk): an empty brand subset means no per-part stats at all
        stats_arrays = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    stats_ref = ray.put(stats_arrays)

    _schema = pa.schema(
        [
            ("total_price_cents", pa.int64()),
            ("n_rows", pa.int64()),
            ("avg_yearly_cents", pa.int64()),
        ]
    )

    def small_partial(b: pa.Table) -> pa.Table:
        pk, sq, n = ray.get(stats_ref)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(pk, probe)  # every subset row's part has stats
        qc = b["qty_cents"].to_numpy(zero_copy_only=False)
        keep = Q17_THRESH_MUL * qc * n[idx] < sq[idx]
        price = b["price_cents"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "total_price_cents": pa.array([int(price.sum())], pa.int64()),
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    import ray.data as rd

    seed = rd.from_arrow(
        pa.table(
            {
                "total_price_cents": pa.array([0], pa.int64()),
                "n_rows": pa.array([0], pa.int64()),
            }
        )
    )
    partials = sub.map_batches(small_partial, batch_format="pyarrow").union(seed)

    def finish(b: pa.Table) -> pa.Table:
        total = pc.sum(b["total_price_cents"]).as_py() or 0
        n = pc.sum(b["n_rows"]).as_py() or 0
        return pa.table(
            {
                "total_price_cents": pa.array([total], pa.int64()),
                "n_rows": pa.array([n], pa.int64()),
                "avg_yearly_cents": pa.array([total // Q17_YEARS], pa.int64()),
            }
        )

    from ..functions.schema import ensure_schema

    return ensure_schema(
        partials.repartition(1).map_batches(finish, batch_format="pyarrow"), _schema
    )


# ---------------------------------------------------------------------------
# Q19-style: disjunctive brand/size/quantity revenue (OR-pushdown)
# ---------------------------------------------------------------------------

# (brand, max p_size, qty range cents lo/hi inclusive) per disjunct
Q19_DISJUNCTS = (
    ("Brand#12", 5, 100, 1100),
    ("Brand#23", 10, 1000, 2000),
    ("Brand#5", 15, 2000, 3000),
)


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H Q19 shape: revenue under an OR of (brand AND size AND quantity)
    conjuncts spanning both tables.

    Scale shape: the disjunction collapses to map-side vector math.  The
    part side ships once as three sorted parallel arrays (partkey, brand
    code, size); each lineitem batch resolves its disjunct membership with
    one searchsorted + boolean algebra — no join exchange at all.  Only the
    weakest envelope of the quantity predicate (qty <= 30) is pushed into
    the scan; the exact per-disjunct cut happens on int64 cents in memory,
    so OR semantics stay bit-exact vs the oracle."""
    import ray

    part = _read_dim(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    part = part.sort_values("p_partkey")
    brand_code = np.zeros(len(part), dtype=np.int8)
    for code, (brand, _, _, _) in enumerate(Q19_DISJUNCTS, start=1):
        brand_code[(part["p_brand"] == brand).to_numpy()] = code
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(dtype=np.int64),
            brand_code,
            part["p_size"].to_numpy(dtype=np.int32),
        )
    )

    qty_hi = max(hi for (_, _, _, hi) in Q19_DISJUNCTS)  # cents
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        # envelope pushdown: cents(q) <= qty_hi <=> q < (qty_hi + 0.5)/100
        row_filter=(pads.field("l_quantity") < (qty_hi + 0.5) / 100.0),
    )

    _schema = pa.schema([("revenue_e4", pa.int64()), ("n_rows", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        pk, bcode, psize = ray.get(part_ref)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(pk, probe)  # FK integrity: every part exists
        code = bcode[idx]
        size = psize[idx]
        qc = _cents(b["l_quantity"]).to_numpy(zero_copy_only=False)
        keep = np.zeros(len(probe), dtype=bool)
        for c, (_, size_max, q_lo, q_hi) in enumerate(Q19_DISJUNCTS, start=1):
            keep |= (
                (code == c)
                & (size >= 1)
                & (size <= size_max)
                & (qc >= q_lo)
                & (qc <= q_hi)
            )
        if not keep.any():
            return _schema.empty_table()
        price = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)[keep]
        disc = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)[keep]
        rev = int((price * (100 - disc)).sum())
        return pa.table(
            {
                "revenue_e4": pa.array([rev], pa.int64()),
                "n_rows": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    import ray.data as rd

    seed = rd.from_arrow(
        pa.table({"revenue_e4": pa.array([0], pa.int64()),
                  "n_rows": pa.array([0], pa.int64())})
    )
    partials = li.map_batches(partial, batch_format="pyarrow").union(seed)

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "revenue_e4": pa.array([pc.sum(b["revenue_e4"]).as_py() or 0], pa.int64()),
                "n_rows": pa.array([pc.sum(b["n_rows"]).as_py() or 0], pa.int64()),
            }
        )

    from ..functions.schema import ensure_schema

    return ensure_schema(
        partials.repartition(1).map_batches(finish, batch_format="pyarrow"), _schema
    )


# ---------------------------------------------------------------------------
# Q21-style: suppliers who kept finished orders waiting
# ---------------------------------------------------------------------------

Q21_LATE_DAYS = 365  # "late" = shipped more than a year after the order date
Q21_TOPK = 25
Q21_PARTITIONS = 64  # coarse orderkey-hash partitions for the kernel pass
# broadcast the (F-orderkey, orderdate) arrays only below this measured
# bound (12 B/order -> ~120 MB object); above it the hash join runs
Q21_BROADCAST_MAX_ORDERS = 10_000_000


def q21_waiting_suppliers(sf_dir: str, broadcast_max_orders: int | None = None):
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier finished order.

    Scale shape — the classic formulation is a fact self-join with an
    EXISTS and a NOT EXISTS (three lineitem scans, two self-exchanges).
    Here both quantifiers collapse into per-order vector math, in two
    tiers chosen by a MEASURED streaming count of the 'F' orders:

    - broadcast tier (F orders <= ``Q21_BROADCAST_MAX_ORDERS``): the
      (orderkey, orderdate) pairs ride the object store once as two
      sorted arrays (12 B/order); the lineitem scan resolves membership
      + the late flag map-side, so the ONLY exchange is a coarse
      orderkey-hash repartition of (ok, sk, late) triples (17 B/row,
      status-'F' rows only).  Each partition runs one fully vectorized
      kernel (lexsort -> pair dedup -> per-order n_supp / n_late /
      conditional suppkey sum -> per-supplier counts) and emits
      supplier-bounded partials — no per-order Python, no join.
    - distributed tier (above the bound): lineitem x orders('F') hash
      join (the orderkey exchange), then the SAME kernel partition pass.
      This is the 100-TB path; both tiers are equality-pinned by
      ``tests/test_robustness.py``.

    The EXISTS / NOT EXISTS pair is the filter ``n_supp >= 2 AND
    n_late == 1`` (the sole late supplier's key IS the conditional sum).
    The DuckDB oracle keeps the genuine quantifier form so parity checks
    the semantics, not mirrored arithmetic."""
    import ray

    if broadcast_max_orders is None:
        broadcast_max_orders = Q21_BROADCAST_MAX_ORDERS

    late_us = Q21_LATE_DAYS * 86_400_000_000

    def _orders_f():
        return _read(
            sf_dir,
            "orders",
            columns=["o_orderkey", "o_orderstatus", "o_orderdate"],
            row_filter=(pads.field("o_orderstatus") == "F"),
        ).map_batches(
            lambda b: b.filter(
                pc.equal(b["o_orderstatus"], pa.scalar("F"))
            ).select(["o_orderkey", "o_orderdate"]),
            batch_format="pyarrow",
        )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    # cutover probe: a cheap streaming count of the pruned orders scan —
    # nothing is pinned until the volume is known to fit
    n_f = _orders_f().count()

    if n_f <= broadcast_max_orders:
        fo = _orders_f().to_pandas().sort_values("o_orderkey")
        f_ref = ray.put(
            (
                fo["o_orderkey"].to_numpy(dtype=np.int64),
                fo["o_orderdate"]
                .to_numpy()
                .astype("datetime64[us]")
                .astype(np.int64),
            )
        )

        def lflag(b: pa.Table) -> pa.Table:
            fk, fdate = ray.get(f_ref)
            probe = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(fk):
                idx = np.minimum(np.searchsorted(fk, probe), len(fk) - 1)
                hit = fk[idx] == probe
            else:
                hit = np.zeros(len(probe), dtype=bool)
            ship = (
                b["l_shipdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)[hit]
            )
            odate = fdate[idx[hit]] if len(fk) else ship
            return pa.table(
                {
                    "l_orderkey": pa.array(probe[hit]),
                    "l_suppkey": b["l_suppkey"].filter(pa.array(hit)),
                    "late": pa.array((ship > odate + late_us).astype(np.int64)),
                }
            )

        triples = li.map_batches(lflag, batch_format="pyarrow")
    else:
        joined = li.join(
            _orders_f(),
            "inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        def jflag(b: pa.Table) -> pa.Table:
            ship = (
                b["l_shipdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
            odate = (
                b["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "l_suppkey": b["l_suppkey"],
                    "late": pa.array((ship > odate + late_us).astype(np.int64)),
                }
            )

        triples = joined.map_batches(jflag, batch_format="pyarrow")

    def add_part(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__opart", pa.array(coarse_int_partition(ok, Q21_PARTITIONS))
        )

    import pandas as pd

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["l_orderkey"].to_numpy(dtype=np.int64)
        sk = g["l_suppkey"].to_numpy(dtype=np.int64)
        late = g["late"].to_numpy(dtype=np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, late = ok[order], sk[order], late[order]
        new_pair = np.empty(len(ok), dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])
        pair_idx = np.cumsum(new_pair) - 1
        n_pairs = pair_idx[-1] + 1
        pair_late = np.zeros(n_pairs, dtype=np.int64)
        np.maximum.at(pair_late, pair_idx, late)  # ANY late lineitem
        p_ok = ok[new_pair]
        p_sk = sk[new_pair]
        new_ok = np.empty(n_pairs, dtype=bool)
        new_ok[0] = True
        new_ok[1:] = p_ok[1:] != p_ok[:-1]
        o_idx = np.cumsum(new_ok) - 1
        n_orders = o_idx[-1] + 1
        n_supp = np.bincount(o_idx, minlength=n_orders)
        # int64 np.add.at, not bincount(weights=...): float64 weights
        # would lose precision for suppkeys above 2^53
        n_late = np.zeros(n_orders, dtype=np.int64)
        np.add.at(n_late, o_idx, pair_late)
        late_sk = np.zeros(n_orders, dtype=np.int64)
        np.add.at(late_sk, o_idx, pair_late * p_sk)
        keep = (n_supp >= 2) & (n_late == 1)
        u, c = np.unique(late_sk[keep], return_counts=True)
        return pd.DataFrame(
            {"s_suppkey": u.astype(np.int64), "numwait": c.astype(np.int64)}
        )

    per_supp = _partial_then_global(
        triples.map_batches(add_part, batch_format="pyarrow")
        .groupby("__opart")
        .map_groups(per_part, batch_format="pandas"),
        ["s_suppkey"],
        ["numwait"],
    )

    supp = _read_dim(sf_dir, "supplier", columns=["s_suppkey", "s_name"]).sort_values(
        "s_suppkey"
    )
    supp_ref = ray.put(
        (supp["s_suppkey"].to_numpy(dtype=np.int64), supp["s_name"].to_numpy())
    )

    def decorate(b: pa.Table) -> pa.Table:
        sk, sn = ray.get(supp_ref)
        probe = b["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(sk, probe)
        return pa.table(
            {
                "s_suppkey": b["s_suppkey"],
                "s_name": pa.array(sn[idx], pa.string()),
                "numwait": b["numwait"],
            }
        )

    from ..functions.core import partial_topk

    out = partial_topk(
        per_supp.map_batches(decorate, batch_format="pyarrow"),
        ["numwait", "s_name"],
        [False, True],
        Q21_TOPK,
    )
    # top-k result: driver-bounded by definition -> typed pa.Table (a
    # fully-empty Dataset loses its schema in to_pandas/take_all)
    return pa.Table.from_pylist(
        out.take_all(),
        schema=pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("numwait", pa.int64()),
            ]
        ),
    )
# ---------------------------------------------------------------------------
# Q7-style: bidirectional nation-pair shipping volume
# ---------------------------------------------------------------------------

Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_LO = "1996-01-01"
Q7_HI = "1998-01-01"
# broadcast-tier bound: 9 B per 2-nation order (key + int8 code); 10M
# orders ~ 90 MB in the object store, read once per task
Q7_BROADCAST_MAX_ORDERS = 10_000_000


def q7_volume_shipping(sf_dir: str, broadcast_max_orders: int | None = None):
    """TPC-H Q7 shape: revenue between two nations, split by direction
    (supplier nation -> customer nation) and ship year.

    Scale shape: supplier->nation and customer->nation fold into two
    broadcast int8 nation-code lookups (A/B/other), and both fact sides
    are pre-filtered map-side to the two nations — only ~2/25 of each
    table's rows survive.  The surviving order subset is dimension-like,
    so (the q21 pattern) a MEASURED streaming count picks one of two
    equality-pinned tiers:

    - broadcast tier (2-nation orders <= ``Q7_BROADCAST_MAX_ORDERS``):
      the (o_orderkey, cust_code) pairs ride the object store once as
      sorted arrays (9 B/order); the lineitem scan resolves its order's
      customer nation map-side via searchsorted, so there is NO fact-fact
      exchange at all — the only shuffle is the 2 x 2 x years rollup
      partials.
    - distributed tier (above the bound): the orderkey hash join of the
      two pre-filtered fact sides — the 100-TB fallback when even the
      filtered order subset outgrows a broadcast.

    The ship-year window is pushed into the parquet scan; the
    (supp_nation, cust_nation, year) rollup is a partial-then-global over
    at most 2 x 2 x years keys."""
    import ray

    if broadcast_max_orders is None:
        broadcast_max_orders = Q7_BROADCAST_MAX_ORDERS

    nation = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    code_by_nk = {}
    for _, row in nation.iterrows():
        if row["n_name"] == Q7_NATION_A:
            code_by_nk[int(row["n_nationkey"])] = 1
        elif row["n_name"] == Q7_NATION_B:
            code_by_nk[int(row["n_nationkey"])] = 2

    def _codes(df, key_col, nk_col):
        df = df.sort_values(key_col)
        keys = df[key_col].to_numpy(dtype=np.int64)
        codes = (
            df[nk_col].map(lambda nk: code_by_nk.get(int(nk), 0))
            .to_numpy(dtype=np.int8)
        )
        return keys, codes

    supp_keys, supp_codes = _codes(
        _read_dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        "s_suppkey",
        "s_nationkey",
    )
    cust_keys, cust_codes = _codes(
        _read_dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]),
        "c_custkey",
        "c_nationkey",
    )
    q7_schema = pa.schema(
        [
            ("supp_nation", pa.string()),
            ("cust_nation", pa.string()),
            ("l_year", pa.int64()),
            ("revenue_e4", pa.int64()),
            ("n_rows", pa.int64()),
        ]
    )
    # Ray 2.49 Dataset.join raises ArrowInvalid when a side delivers zero
    # rows (typed 0-row blocks lose their schema in the hash shuffle);
    # both emptiness conditions here are driver-knowable, so guard early
    if not (supp_codes != 0).any() or not (cust_codes != 0).any():
        return q7_schema.empty_table()
    supp_ref = ray.put((supp_keys, supp_codes))
    cust_ref = ray.put((cust_keys, cust_codes))

    lo = np.datetime64(Q7_LO, "us")
    hi = np.datetime64(Q7_HI, "us")
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        row_filter=((pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)),
    )

    def lprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
        )
        sk, scode = ray.get(supp_ref)
        probe = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(sk, probe)
        code = scode[idx]
        keep = code != 0
        b = b.filter(pa.array(keep))
        year = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "supp_code": pa.array(code[keep].astype(np.int64)),
                "l_year": pa.array(year, pa.int64()),
                "rev_e4": rev,
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def oprep(b: pa.Table) -> pa.Table:
        ck, ccode = ray.get(cust_ref)
        probe = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ck, probe)
        code = ccode[idx]
        keep = code != 0
        return pa.table(
            {
                "o_orderkey": pa.array(
                    b["o_orderkey"].to_numpy(zero_copy_only=False)[keep]
                ),
                "cust_code": pa.array(code[keep].astype(np.int64)),
            }
        )

    def _o_prepped():
        return orders.map_batches(oprep, batch_format="pyarrow")

    # cutover probe: a cheap streaming count of the pre-filtered order
    # subset — nothing is pinned until the volume is known to fit
    n_o = _o_prepped().count()

    if n_o <= broadcast_max_orders:
        od = _o_prepped().to_pandas().sort_values("o_orderkey")
        ok_ref = ray.put(
            (
                od["o_orderkey"].to_numpy(dtype=np.int64),
                od["cust_code"].to_numpy(dtype=np.int8),
            )
        )

        def resolve(b: pa.Table) -> pa.Table:
            okeys, ccodes = ray.get(ok_ref)
            probe = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if len(okeys):
                idx = np.minimum(np.searchsorted(okeys, probe), len(okeys) - 1)
                hit = okeys[idx] == probe
            else:
                hit = np.zeros(len(probe), dtype=bool)
            b = b.filter(pa.array(hit))
            code = ccodes[idx[hit]] if len(okeys) else np.zeros(0, np.int8)
            return b.append_column(
                "cust_code", pa.array(code.astype(np.int64))
            )

        joined = li.map_batches(lprep, batch_format="pyarrow").map_batches(
            resolve, batch_format="pyarrow"
        )
    else:
        joined = li.map_batches(lprep, batch_format="pyarrow").join(
            _o_prepped(),
            "inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

    def vol_partial(b: pa.Table) -> pa.Table:
        # cross-nation rows only: (A->B) or (B->A)
        b = b.filter(pc.not_equal(b["supp_code"], b["cust_code"]))
        return pa.table(
            {
                "supp_code": b["supp_code"],
                "cust_code": b["cust_code"],
                "l_year": b["l_year"],
                "revenue_e4": b["rev_e4"],
                "n_rows": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    out = _partial_then_global(
        joined.map_batches(vol_partial, batch_format="pyarrow"),
        ["supp_code", "cust_code", "l_year"],
        ["revenue_e4", "n_rows"],
    )

    name_by_code = {1: Q7_NATION_A, 2: Q7_NATION_B}

    def finish(b: pa.Table) -> pa.Table:
        sc = b["supp_code"].to_numpy(zero_copy_only=False)
        cc = b["cust_code"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "supp_nation": pa.array([name_by_code[int(c)] for c in sc], pa.string()),
                "cust_nation": pa.array([name_by_code[int(c)] for c in cc], pa.string()),
                "l_year": b["l_year"],
                "revenue_e4": b["revenue_e4"],
                "n_rows": b["n_rows"],
            }
        )

    # <= 2 x 2 x years rows: driver-bounded -> typed pa.Table (a fully-
    # empty Dataset loses its schema in to_pandas/take_all)
    rows = out.map_batches(finish, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["supp_nation"], r["cust_nation"], r["l_year"]))
    return pa.Table.from_pylist(rows, schema=q7_schema)


# ---------------------------------------------------------------------------
# Q10-style: returned-item revenue, top customers
# ---------------------------------------------------------------------------

Q10_LO = "1996-07-01"
Q10_HI = "1996-10-01"
Q10_TOPK = 20


def _cents_np(v: np.ndarray) -> np.ndarray:
    from ..functions.numeric import cents_np

    return cents_np(v)


def q10_returned_top_customers(sf_dir: str):
    """TPC-H Q10 shape: customers who returned the most revenue in a
    quarter, decorated with account balance and nation.

    Scale shape: both scans are pushed (quarter window on orders,
    returnflag on lineitem's in-memory cut), the orderkey exchange carries
    only qualifying rows, the custkey rollup shrinks map-side first, and
    all customer/nation decoration happens AFTER the top-k cut — the
    broadcast lookup decorates 20 rows, not 150k customers."""
    import ray

    lo = np.datetime64(Q10_LO, "us")
    hi = np.datetime64(Q10_HI, "us")

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        row_filter=((pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi)),
    )

    def oprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        )
        return b.select(["o_orderkey", "o_custkey"])

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        row_filter=(pads.field("l_returnflag") == "R"),
    )

    def lprep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
        )
        return pa.table({"l_orderkey": b["l_orderkey"], "rev_e4": rev})

    joined = li.map_batches(lprep, batch_format="pyarrow").join(
        orders.map_batches(oprep, batch_format="pyarrow"),
        "inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def cust_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["o_custkey"],
                "revenue_e4": b["rev_e4"],
                "n_items": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    per_cust = _partial_then_global(
        joined.map_batches(cust_partial, batch_format="pyarrow"),
        ["c_custkey"],
        ["revenue_e4", "n_items"],
    )

    from ..functions.core import partial_topk

    top = partial_topk(per_cust, ["revenue_e4", "c_custkey"], [False, True], Q10_TOPK)

    cust = _read_dim(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).sort_values("c_custkey")
    nation = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nname = nation.set_index("n_nationkey")["n_name"]
    cust_ref = ray.put(
        (
            cust["c_custkey"].to_numpy(dtype=np.int64),
            cust["c_name"].to_numpy(),
            _cents_np(cust["c_acctbal"].to_numpy()),
            cust["c_nationkey"].map(nname).to_numpy(),
        )
    )

    def decorate(b: pa.Table) -> pa.Table:
        ck, cn, bal, nn = ray.get(cust_ref)
        probe = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ck, probe)
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_name": pa.array(cn[idx], pa.string()),
                "revenue_e4": b["revenue_e4"],
                "n_items": b["n_items"],
                "acctbal_cents": pa.array(bal[idx], pa.int64()),
                "n_name": pa.array(nn[idx], pa.string()),
            }
        )

    # top-k result: driver-bounded -> typed pa.Table (a fully-empty
    # Dataset loses its schema in to_pandas/take_all)
    return pa.Table.from_pylist(
        top.map_batches(decorate, batch_format="pyarrow").take_all(),
        schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("revenue_e4", pa.int64()),
                ("n_items", pa.int64()),
                ("acctbal_cents", pa.int64()),
                ("n_name", pa.string()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q8-style: national market share within a region's part-type trade
# ---------------------------------------------------------------------------

Q8_REGION = "EUROPE"
Q8_PART_TYPE = "ECONOMY"
Q8_NATION = "NATION_5"
Q8_LO = "1996-01-01"
Q8_HI = "1998-01-01"


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: one nation's share of a region's yearly revenue for
    one part type — the conditional-ratio-per-group pattern over an
    eight-table join.

    Scale shape: all six dimension edges (part type, supplier nation,
    customer -> nation -> region) fold into three broadcast lookups
    (sorted-key membership / flag arrays), leaving ONE fact-fact orderkey
    exchange, with both fact sides pre-filtered map-side before the
    shuffle.  The share is exact integer: numerator and denominator ride
    the same (year) partial rows, ppm by floor division in both engines."""
    import ray

    part = _read_dim(sf_dir, "part", columns=["p_partkey", "p_type"])
    part_keys = np.sort(
        part.loc[part["p_type"] == Q8_PART_TYPE, "p_partkey"].to_numpy(dtype=np.int64)
    )

    nation = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"])
    region = _read_dim(sf_dir, "region", columns=["r_regionkey", "r_name"])
    region_keys = set(
        region.loc[region["r_name"] == Q8_REGION, "r_regionkey"].astype(int)
    )
    target_nk = set(nation.loc[nation["n_name"] == Q8_NATION, "n_nationkey"].astype(int))
    region_nk = set(
        nation.loc[nation["n_regionkey"].astype(int).isin(region_keys), "n_nationkey"].astype(int)
    )

    supp = _read_dim(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).sort_values(
        "s_suppkey"
    )
    cust = _read_dim(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).sort_values(
        "c_custkey"
    )
    q8_schema = pa.schema(
        [
            ("o_year", pa.int64()),
            ("target_rev_e4", pa.int64()),
            ("total_rev_e4", pa.int64()),
            ("share_ppm", pa.int64()),
            ("n_rows", pa.int64()),
        ]
    )
    # Ray 2.49 Dataset.join raises ArrowInvalid when a side delivers zero
    # rows; an empty part-type selection (left side) or a region with no
    # customers (right side) is driver-knowable here, so guard early
    cust_in_region = cust["c_nationkey"].astype(int).isin(region_nk).to_numpy()
    if len(part_keys) == 0 or not cust_in_region.any():
        return q8_schema.empty_table()
    # two refs, not one: the lineitem side never touches customer arrays
    # and the orders side never touches part/supplier arrays — each stage
    # pulls only the dimensions it reads (the q7 two-ref pattern)
    li_ref = ray.put(
        (
            part_keys,
            supp["s_suppkey"].to_numpy(dtype=np.int64),
            supp["s_nationkey"].astype(int).isin(target_nk).to_numpy(),
        )
    )
    cust_ref = ray.put(
        (cust["c_custkey"].to_numpy(dtype=np.int64), cust_in_region)
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def lprep(b: pa.Table) -> pa.Table:
        pk, sk, s_target = ray.get(li_ref)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(pk):
            idx = np.minimum(np.searchsorted(pk, probe), len(pk) - 1)
            hit = pk[idx] == probe
        else:
            hit = np.zeros(len(probe), dtype=bool)
        b = b.filter(pa.array(hit))
        sp = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_target = s_target[np.searchsorted(sk, sp)].astype(np.int64)
        rev = pc.multiply(
            _cents(b["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(b["l_discount"])),
        )
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "rev_e4": rev,
                "is_target": pa.array(is_target),
            }
        )

    lo = np.datetime64(Q8_LO, "us")
    hi = np.datetime64(Q8_HI, "us")
    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        row_filter=((pads.field("o_orderdate") >= lo) & (pads.field("o_orderdate") < hi)),
    )

    def oprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
        )
        ck, c_in_region = ray.get(cust_ref)
        probe = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = c_in_region[np.searchsorted(ck, probe)]
        b = b.filter(pa.array(keep))
        year = (
            b["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_year": pa.array(year, pa.int64()),
            }
        )

    joined = li.map_batches(lprep, batch_format="pyarrow").join(
        orders.map_batches(oprep, batch_format="pyarrow"),
        "inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )

    def year_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_year": b["o_year"],
                "target_rev_e4": pc.multiply(b["is_target"], b["rev_e4"]),
                "total_rev_e4": b["rev_e4"],
                "n_rows": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    out = _partial_then_global(
        joined.map_batches(year_partial, batch_format="pyarrow"),
        ["o_year"],
        ["target_rev_e4", "total_rev_e4", "n_rows"],
    )

    def finish(b: pa.Table) -> pa.Table:
        # Python-int ppm (q14 convention): int64 numpy would wrap on
        # tgt * 1e6 above ~9.2e12 cents·1e-4; the row count here is one
        # per year, so the scalar loop is free
        share = [
            (int(t) * 1_000_000 // int(d)) if d else 0
            for t, d in zip(
                b["target_rev_e4"].to_pylist(), b["total_rev_e4"].to_pylist()
            )
        ]
        return pa.table(
            {
                "o_year": b["o_year"],
                "target_rev_e4": b["target_rev_e4"],
                "total_rev_e4": b["total_rev_e4"],
                "share_ppm": pa.array(share, pa.int64()),
                "n_rows": b["n_rows"],
            }
        )

    # one row per year: driver-bounded -> typed pa.Table (a fully-empty
    # Dataset loses its schema in to_pandas/take_all)
    rows = out.map_batches(finish, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["o_year"])
    return pa.Table.from_pylist(rows, schema=q8_schema)


# ---------------------------------------------------------------------------
# Skyline (Pareto-dominance filter) over part
# ---------------------------------------------------------------------------

_INT64_MIN = np.iinfo(np.int64).min


def _skyline_kernel(df):
    """Per-brand 2-D Pareto frontier over (price_cents minimize, p_size
    maximize): keep rows that no same-brand row weakly dominates with at
    least one strict improvement — the oracle's NOT EXISTS dominance test.

    Fully vectorized, no per-row Python: lexsort by (brand, price asc,
    size desc); a row is dominated iff a strictly-cheaper same-brand row
    has size >= its size (previous-group cummax of per-price maxima,
    reset at brand boundaries) or an equal-price same-brand row has
    strictly larger size (its (brand, price) group's max).  O(n log n).

    The kernel is ASSOCIATIVE (frontier of a union == frontier of the
    per-block frontiers, by transitivity of dominance), so it serves as
    both the per-block partial and the per-brand final reducer — the
    exchange moves only block frontiers (O(log n) expected rows per
    block for random 2-D data), never the table."""
    import pandas as pd

    if len(df) == 0:
        return df
    # SQL dominance semantics for NULL keys: 'b.p_brand = a.p_brand' never
    # matches NULL, so NULL-brand rows neither dominate nor are dominated —
    # they all survive, untouched by the kernel
    null_mask = df["p_brand"].isna().to_numpy()
    if null_mask.any():
        kept = _skyline_kernel(df[~null_mask])
        return pd.concat([kept, df[null_mask]], ignore_index=False)
    brand_codes, _ = pd.factorize(df["p_brand"], use_na_sentinel=False)
    price = df["price_cents"].to_numpy()
    size = df["p_size"].to_numpy()
    order = np.lexsort((df["p_partkey"].to_numpy(), -size, price, brand_codes))
    bc, pr, sz = brand_codes[order], price[order], size[order]

    n = len(df)
    new_brand = np.empty(n, dtype=bool)
    new_brand[0] = True
    new_brand[1:] = bc[1:] != bc[:-1]
    new_grp = new_brand.copy()
    new_grp[1:] |= pr[1:] != pr[:-1]

    grp_first = np.flatnonzero(new_grp)
    grp_id = np.cumsum(new_grp) - 1
    grp_max = sz[grp_first]  # sorted size-desc within group -> first is max
    brand_of_grp = (np.cumsum(new_brand) - 1)[grp_first]
    # previous same-brand group's running max size (strictly cheaper prices)
    cm = pd.Series(grp_max).groupby(brand_of_grp).cummax().to_numpy()
    prev_max = np.empty(len(grp_max), dtype=np.int64)
    prev_max[0] = _INT64_MIN
    prev_max[1:] = cm[:-1]
    first_of_brand = np.empty(len(grp_max), dtype=bool)
    first_of_brand[0] = True
    first_of_brand[1:] = brand_of_grp[1:] != brand_of_grp[:-1]
    prev_max[first_of_brand] = _INT64_MIN

    dominated = (prev_max[grp_id] >= sz) | (sz < grp_max[grp_id])
    return df.iloc[order[~dominated]]


def part_skyline_by_brand(sf_dir: str):
    """Per-brand skyline of parts: cheapest-for-their-size frontier on
    (p_retailprice minimize, p_size maximize).  A dominance filter is a
    different operator shape from top-k/quantile ranking — the survivor
    set is data-dependent, and the reduction is the frontier itself.

    Plan: pruned read -> per-block frontier (map-side, output ~O(log n)
    rows per block) -> per-brand frontier of frontiers via a tiny grouped
    shuffle.  No row sort, no full-table exchange."""
    from ..functions.schema import ensure_schema

    ds = _read(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_retailprice", "p_size"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": pc.cast(batch["p_partkey"], pa.int64()),
                "p_brand": batch["p_brand"],
                "price_cents": _cents(batch["p_retailprice"]),
                "p_size": pc.cast(batch["p_size"], pa.int64()),
            }
        )

    return ensure_schema(
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(_skyline_kernel, batch_format="pandas")
        .groupby("p_brand")
        .map_groups(_skyline_kernel, batch_format="pandas"),
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_brand", pa.string()),
                ("price_cents", pa.int64()),
                ("p_size", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets (completes the ROLLUP family)
# ---------------------------------------------------------------------------


def revenue_cube(sf_dir: str):
    """CUBE(segment, year): revenue + order count at all four grains —
    (segment, year), (segment, ALL), (ALL, year), (ALL, ALL) — the 4-set
    member of the shared grouping-sets plan (the rollup plus the
    (ALL, year) column totals)."""
    return _segment_year_grouping_sets(sf_dir, _CUBE_SETS)


# ---------------------------------------------------------------------------
# Market-basket co-occurrence mining (frequent part pairs)
# ---------------------------------------------------------------------------

PAIR_TOPK = 20
PAIR_PARTITIONS = 64


def _basket_add_opart(batch: pa.Table) -> pa.Table:
    # per-batch pre-dedup shrinks the first exchange (lineitem arrives
    # clustered by orderkey, so in-batch duplicates are the common
    # case); the per-partition kernel still dedups globally
    from ..functions.core import coarse_int_partition

    batch = pa.table(
        {
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
        }
    ).group_by(["l_orderkey", "l_partkey"]).aggregate([])
    ok = batch["l_orderkey"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "__opart", pa.array(coarse_int_partition(ok, PAIR_PARTITIONS))
    )


def _basket_pairs_kernel(g) -> "object":
    """Per-orderkey-partition basket expansion: distinct (order, part)
    rows -> per-partition (part_a < part_b, n_orders) pair partials via
    repeat/offset arithmetic (no Python loop)."""
    import pandas as pd

    g = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
        ["l_orderkey", "l_partkey"]
    )
    okv = g["l_orderkey"].to_numpy()
    pkv = g["l_partkey"].to_numpy()
    n = len(g)
    if n == 0:
        return pd.DataFrame(
            {"part_a": pd.Series([], dtype=np.int64),
             "part_b": pd.Series([], dtype=np.int64),
             "n_orders": pd.Series([], dtype=np.int64)}
        )
    new_ok = np.empty(n, dtype=bool)
    new_ok[0] = True
    new_ok[1:] = okv[1:] != okv[:-1]
    grp_id = np.cumsum(new_ok) - 1
    starts = np.flatnonzero(new_ok)
    sizes = np.diff(np.append(starts, n))
    local = np.arange(n, dtype=np.int64) - starts[grp_id]
    # row i (local j of a group of s) pairs forward with s-1-j rows
    fan = sizes[grp_id] - 1 - local
    total = int(fan.sum())
    if total == 0:
        return pd.DataFrame(
            {"part_a": pd.Series([], dtype=np.int64),
             "part_b": pd.Series([], dtype=np.int64),
             "n_orders": pd.Series([], dtype=np.int64)}
        )
    a_idx = np.repeat(np.arange(n, dtype=np.int64), fan)
    off0 = np.concatenate(([0], np.cumsum(fan)[:-1]))
    b_idx = np.arange(total, dtype=np.int64) - np.repeat(off0, fan) + a_idx + 1
    pairs = pd.DataFrame({"part_a": pkv[a_idx], "part_b": pkv[b_idx]})
    out = (
        pairs.groupby(["part_a", "part_b"], sort=False)
        .size()
        .reset_index(name="n_orders")
    )
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out


def _pair_add_ppart(batch: pa.Table) -> pa.Table:
    # second coarse exchange key: hash of the PAIR, so each partition
    # owns complete totals for its pairs.  A multi-key Ray groupby
    # over ~all-distinct pair keys measured 17 s at sf0.01 vs ~2 s for
    # a coarse int-key exchange — the boundary sort on high-distinct
    # keys is the cost, not the data.
    from ..functions.core import coarse_int_partition

    a = batch["part_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
    b = batch["part_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
    mixed = a ^ (b * np.uint64(0xC2B2AE3D27D4EB4F))
    return batch.append_column(
        "__ppart",
        pa.array(coarse_int_partition(mixed.astype(np.int64), PAIR_PARTITIONS)),
    )


def part_pairs_top(sf_dir: str, k: int = PAIR_TOPK):
    """Top-k most frequent part PAIRS bought in the same order (the
    co-occurrence / frequent-itemset-of-size-2 mining shape): for every
    order's distinct part set, count each unordered pair (a < b) across
    all orders; top-k by (count desc, part_a, part_b).

    Scale shape: TWO coarse int-key hash exchanges.  (1) orderkey-hash
    co-locates each basket (rows pre-deduped per batch map-side, fully
    deduped per partition); inside each partition a vectorized expansion
    enumerates each order's pairs (repeat/offset arithmetic, no Python
    loop — pair count per order is C(s,2) with s bounded by order size)
    and a C-level pandas groupby collapses them to per-partition pair
    partials.  (2) pair-hash co-locates each pair's partials so every
    partition holds COMPLETE totals for its pairs and emits a local
    top-k; the driver merges <= partitions x k candidates.  Result is
    driver-bounded (k rows) -> typed pa.Table."""
    schema = pa.schema(
        [("part_a", pa.int64()), ("part_b", pa.int64()), ("n_orders", pa.int64())]
    )

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def pair_topk(g) -> "object":
        tot = (
            g.groupby(["part_a", "part_b"], sort=False)["n_orders"]
            .sum()
            .reset_index()
        )
        tot["n_orders"] = tot["n_orders"].astype(np.int64)
        return tot.sort_values(
            ["n_orders", "part_a", "part_b"], ascending=[False, True, True]
        ).head(k)

    topk_parts = (
        ds.map_batches(_basket_add_opart, batch_format="pyarrow")
        .groupby("__opart")
        .map_groups(_basket_pairs_kernel, batch_format="pandas")
        .map_batches(_pair_add_ppart, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(pair_topk, batch_format="pandas")
    )
    # <= PAIR_PARTITIONS x k candidate rows reach the driver; final merge
    rows = topk_parts.take_all()
    rows.sort(key=lambda r: (-int(r["n_orders"]), int(r["part_a"]), int(r["part_b"])))
    # driver-bounded k rows; typed pa.Table per the empty-schema invariant
    return pa.Table.from_pylist(
        [
            {
                "part_a": int(r["part_a"]),
                "part_b": int(r["part_b"]),
                "n_orders": int(r["n_orders"]),
            }
            for r in rows[:k]
        ],
        schema=schema,
    )


# ---------------------------------------------------------------------------
# PageRank over the co-purchase graph (iterative, exact integer ppm)
# ---------------------------------------------------------------------------

PR_BASE_PPM = 150_000  # (1 - d) in ppm, d = 0.85
PR_DAMP_PPM = 850_000
PR_SCALE = 1_000_000
PR_ITERS = 2
PR_TOPK = 100

_PAGERANK_SCHEMA = pa.schema(
    [
        ("p_partkey", pa.int64()),
        ("pagerank_ppm", pa.int64()),
        ("degree", pa.int64()),
    ]
)


def copurchase_pagerank(
    sf_dir: str, iters: int = PR_ITERS, k: int = PR_TOPK,
    dense_reduce: bool = True,
):
    """Iterative PageRank over the part co-purchase graph: nodes are
    parts, an undirected edge joins two parts bought in the same order
    at least once, PR_ITERS damped power-iteration rounds in EXACT
    integer ppm (contrib = r // deg per source, r' = (1-d) +
    d * sum(contribs) // 1e6 — floor at the same two points the oracle
    floors), top-k nodes by (rank desc, partkey).  Dangling nodes are
    impossible by construction (every node of the edge set has deg >= 1
    and edges are symmetric).

    Scale shape: the EDGE SET is built with the part_pairs_top kernels
    (two coarse int-key exchanges: orderkey-hash basket expansion, then
    pair-hash global dedup) and materialized ONCE — iterations re-scan
    edges, never lineitem.  Each round broadcasts the (node, contrib)
    vector via ``ray.put`` (node-DIMENSION-sized — the documented
    partitioning assumption; a corpus-scale node set would hash-shard
    the rank vector instead) and scatters contributions map-side with
    one searchsorted lookup per edge batch.  The per-round reduce
    (default, ``dense_reduce=True``) emits ONE dense int64 vector per
    block and sums them on the driver — dimension-bounded by exactly
    the same assumption the rank broadcast already makes, and it
    removes the per-iteration all-to-all (measured ~2.4x end to end,
    BASELINE.md round-5 notes).  ``dense_reduce=False`` keeps the
    ``partial_then_global`` exchange tier (one row per node per block)
    — the path a hash-sharded-rank variant would grow from; tiers
    equality-pinned by test_pagerank_reduce_tiers_identical.  int64
    throughout: contributions are bounded by the conserved total mass
    (n_nodes x 1e6), so the damped sum fits far below 2^63 for any
    dimension-sized node set."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def mirror_dedup(g):
        # this partition owns every copy of its pairs: global distinct,
        # then emit both directions so the scatter sees each undirected
        # edge once per endpoint
        import pandas as pd

        g = g.drop_duplicates(["part_a", "part_b"])
        a = g["part_a"].to_numpy(dtype=np.int64)
        b = g["part_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "src": np.concatenate([a, b]),
                "dst": np.concatenate([b, a]),
            }
        )

    edges = (
        ds.map_batches(_basket_add_opart, batch_format="pyarrow")
        .groupby("__opart")
        .map_groups(_basket_pairs_kernel, batch_format="pandas")
        .map_batches(_pair_add_ppart, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(mirror_dedup, batch_format="pandas")
        .materialize()
    )

    def deg_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": b["src"],
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    deg_rows = _partial_then_global(
        edges.map_batches(deg_prep, batch_format="pyarrow"), ["src"], ["one"]
    ).take_all()
    if not deg_rows:
        return _PAGERANK_SCHEMA.empty_table()
    deg_rows.sort(key=lambda r: int(r["src"]))
    nodes = np.array([int(r["src"]) for r in deg_rows], dtype=np.int64)
    deg = np.array([int(r["one"]) for r in deg_rows], dtype=np.int64)

    rank = np.full(len(nodes), PR_SCALE, dtype=np.int64)
    for _ in range(iters):
        contrib_ref = ray.put((nodes, rank // deg))

        if dense_reduce:

            def scatter_dense(b: pa.Table, _ref=contrib_ref) -> pa.Table:
                nd, cv = ray.get(_ref)
                src = b["src"].to_numpy(zero_copy_only=False)
                dst = b["dst"].to_numpy(zero_copy_only=False)
                vec = np.zeros(len(nd), dtype=np.int64)
                np.add.at(
                    vec,
                    np.searchsorted(nd, dst),
                    cv[np.searchsorted(nd, src)],
                )
                return pa.table({"vec": pa.array([vec.tobytes()], pa.binary())})

            recv = np.zeros(len(nodes), dtype=np.int64)
            for r in edges.map_batches(
                scatter_dense, batch_format="pyarrow"
            ).take_all():
                recv += np.frombuffer(r["vec"], dtype=np.int64)
        else:

            def scatter(b: pa.Table, _ref=contrib_ref) -> pa.Table:
                nd, cv = ray.get(_ref)
                src = b["src"].to_numpy(zero_copy_only=False)
                c = cv[np.searchsorted(nd, src)]
                # per-dst combine happens inside _partial_then_global's
                # map-side partial; emit raw scatter rows
                return pa.table({"dst": b["dst"], "c": pa.array(c)})

            sums = _partial_then_global(
                edges.map_batches(scatter, batch_format="pyarrow"),
                ["dst"],
                ["c"],
            ).take_all()
            recv = np.zeros(len(nodes), dtype=np.int64)
            idx = np.searchsorted(
                nodes, np.array([int(r["dst"]) for r in sums], dtype=np.int64)
            )
            recv[idx] = np.array([int(r["c"]) for r in sums], dtype=np.int64)
        rank = PR_BASE_PPM + (PR_DAMP_PPM * recv) // PR_SCALE

    order = np.lexsort((nodes, -rank))[:k]
    return pa.table(
        {
            "p_partkey": pa.array(nodes[order]),
            "pagerank_ppm": pa.array(rank[order]),
            "degree": pa.array(deg[order]),
        },
        schema=_PAGERANK_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Unpivot / melt: wide measure columns -> long (measure, value) rows
# ---------------------------------------------------------------------------

UNPIVOT_MEASURES = ("quantity", "extendedprice", "discount", "tax")


def lineitem_unpivot(sf_dir: str):
    """UNPIVOT (melt) of lineitem's four money/qty measures into long
    ``(l_orderkey, l_linenumber, measure, value_cents)`` rows — the
    inverse of ``orders_pivot_by_year`` and the standard wide->long
    reshape a feature-extraction pipeline runs before a grouped
    aggregate over heterogeneous measures.

    Scale shape: pure map — each Arrow batch of n rows emits one 4n-row
    batch built from four zero-copy column projections stacked with
    ``pa.concat_tables`` (the measure name is a dictionary-encoded-sized
    constant column per slice).  No shuffle, no driver materialization;
    output order is irrelevant to the driver's sorted value-hash."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    )

    def melt(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"]
        ln = pc.cast(b["l_linenumber"], pa.int64())
        slices = []
        for m in UNPIVOT_MEASURES:
            slices.append(
                pa.table(
                    {
                        "l_orderkey": ok,
                        "l_linenumber": ln,
                        "measure": pa.array(
                            np.full(b.num_rows, m, dtype=object), pa.string()
                        ),
                        "value_cents": _cents(b[f"l_{m}"]),
                    }
                )
            )
        return pa.concat_tables(slices)

    from ..functions.schema import ensure_schema

    return ensure_schema(
        ds.map_batches(melt, batch_format="pyarrow"),
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_linenumber", pa.int64()),
                ("measure", pa.string()),
                ("value_cents", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Q12-style: line counts by order priority class (fact-fact 1-bit decorate)
# ---------------------------------------------------------------------------

Q12_LO = "1995-01-01"
Q12_HI = "1996-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q12_BROADCAST_MAX_ORDERS = 20_000_000


def q12_priority_by_returnflag(sf_dir: str, broadcast_max_orders: int | None = None):
    """TPC-H Q12 shape (this schema carries no l_shipmode, so the lineitem
    grouping key is l_returnflag): for lineitems shipped inside a year
    window, count lines whose ORDER is high-priority (1-URGENT / 2-HIGH)
    vs low, per returnflag.  The defining property is a fact-fact join
    where the probe side only needs ONE BIT per order.

    Scale shape (the q7/q21 measured-cutover pattern): the orders scan
    reduces to (o_orderkey, is_high int8) — 9 B/order.  A cheap parquet
    metadata count picks the tier:

    - broadcast tier (orders <= ``Q12_BROADCAST_MAX_ORDERS``): the
      sorted (orderkey, bit) arrays ride the object store once; each
      pre-filtered lineitem batch resolves its order's bit map-side via
      searchsorted and collapses to (returnflag, high_n, low_n)
      partials — zero fact exchange.
    - distributed tier (above the bound): Dataset.join of the projected
      fact sides on orderkey, partials after — the 100-TB fallback.

    Tiers are equality-pinned by ``tests/test_robustness.py``."""
    import ray

    if broadcast_max_orders is None:
        broadcast_max_orders = Q12_BROADCAST_MAX_ORDERS

    lo = np.datetime64(Q12_LO, "us")
    hi = np.datetime64(Q12_HI, "us")
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
        row_filter=(
            (pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi)
        ),
    )

    def lprep(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
        )
        return pa.table(
            {"l_orderkey": b["l_orderkey"], "l_returnflag": b["l_returnflag"]}
        )

    def oprep(b: pa.Table) -> pa.Table:
        is_high = pc.is_in(
            b["o_orderpriority"], value_set=pa.array(Q12_HIGH, pa.string())
        )
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "is_high": pc.cast(is_high, pa.int8()),
            }
        )

    schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("high_n", pa.int64()),
            ("low_n", pa.int64()),
        ]
    )

    orders_path = f"{sf_dir}/orders.parquet"
    n_orders = pads.dataset(orders_path).count_rows()  # metadata-only probe
    if n_orders == 0:
        # inner-join contract on an empty orders table; also keeps the
        # broadcast searchsorted from probing an empty key array
        return schema.empty_table()
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])

    if n_orders <= broadcast_max_orders:
        od = (
            orders.map_batches(oprep, batch_format="pyarrow")
            .to_pandas()
            .sort_values("o_orderkey")
        )
        ok_ref = ray.put(
            (
                od["o_orderkey"].to_numpy(dtype=np.int64),
                od["is_high"].to_numpy(dtype=np.int8),
            )
        )

        def resolve(b: pa.Table) -> pa.Table:
            okeys, bits = ray.get(ok_ref)
            probe = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            idx = np.searchsorted(okeys, probe)  # every line's order exists
            return b.append_column(
                "is_high", pa.array(bits[idx].astype(np.int64))
            )

        joined = li.map_batches(lprep, batch_format="pyarrow").map_batches(
            resolve, batch_format="pyarrow"
        )
    else:
        # Ray 2.49 Dataset.join raises when a side delivers zero rows; the
        # lineitem emptiness is not driver-knowable (pushed date window), so
        # the distributed tier pays one streaming count of the pre-filtered
        # 2-column projection — negligible next to the join it guards
        li_prepped = li.map_batches(lprep, batch_format="pyarrow")
        if li_prepped.count() == 0:
            return schema.empty_table()
        joined = li_prepped.join(
            orders.map_batches(oprep, batch_format="pyarrow"),
            "inner",
            num_partitions=16,
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

    def partial(b: pa.Table) -> pa.Table:
        hi_bits = pc.cast(b["is_high"], pa.int64())
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "high_n": hi_bits,
                "low_n": pc.subtract(pa.scalar(1, pa.int64()), hi_bits),
            }
        )

    out = _partial_then_global(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        ["high_n", "low_n"],
    )
    rows = out.take_all()
    rows.sort(key=lambda r: r["l_returnflag"])
    # driver-bounded (<= distinct returnflags); typed per the empty-schema
    # invariant
    return pa.Table.from_pylist(
        [
            {
                "l_returnflag": r["l_returnflag"],
                "high_n": int(r["high_n"]),
                "low_n": int(r["low_n"]),
            }
            for r in rows
        ],
        schema=schema,
    )


def nation_revenue_share(sf_dir: str):
    """Ratio-to-report: each nation's customer-order revenue as an exact
    ppm share of its REGION's total — the percent-of-total window shape
    (SQL: SUM(x) OVER (PARTITION BY region)).

    Scale shape: customer (c_custkey -> c_nationkey) broadcasts once via
    ``ray.put`` (the q5 dimension pattern); each orders batch folds exact
    cents partials per nationkey map-side, so the only exchange is the
    tiny partial+global groupby over <= |nations| rows per batch.  The
    share division runs on the driver-bounded nation table (25 rows at
    any SF) with exact integer ppm (cents * 10^6 // region_cents)."""
    import ray

    nation = _read_dim(sf_dir, "nation").sort_values("n_nationkey")
    region = _read_dim(sf_dir, "region")
    customer = _read_dim(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).sort_values("c_custkey")
    refs = ray.put(
        (
            customer["c_custkey"].to_numpy(dtype=np.int64),
            customer["c_nationkey"].to_numpy(dtype=np.int64),
        )
    )

    def prep(batch: pa.Table) -> pa.Table:
        ck, cv = ray.get(refs)
        probe = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.clip(np.searchsorted(ck, probe), 0, len(ck) - 1)
        keep = ck[idx] == probe  # orphan o_custkey rows contribute nothing
        nat = cv[idx[keep]]
        cents = _cents(batch["o_totalprice"]).to_numpy(zero_copy_only=False)[keep]
        # exact int64 segment sums (bincount's float64 weights would round
        # past 2^53); sort-by-nation then reduceat
        order = np.argsort(nat, kind="stable")
        nat, cents = nat[order], cents[order]
        b = np.ones(len(nat), dtype=bool)
        b[1:] = nat[1:] != nat[:-1]
        return pa.table(
            {
                "nk": pa.array(nat[b], pa.int64()),
                "cents": pa.array(
                    np.add.reduceat(cents, np.flatnonzero(b)).astype(np.int64)
                    if len(nat)
                    else np.empty(0, np.int64)
                ),
            }
        )

    rev = _partial_then_global(
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["nk"],
        ["cents"],
    ).take_all()

    schema = pa.schema(
        [
            ("r_name", pa.string()),
            ("n_name", pa.string()),
            ("revenue_cents", pa.int64()),
            ("share_ppm", pa.int64()),
        ]
    )
    if not rev:
        return schema.empty_table()
    rnames = dict(zip(region["r_regionkey"], region["r_name"]))
    nk2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    nk2region = {
        k: rnames[rk]
        for k, rk in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    rows = sorted(
        (nk2region[r["nk"]], nk2name[r["nk"]], int(r["cents"])) for r in rev
    )
    region_tot = {}
    for rn, _, c in rows:
        region_tot[rn] = region_tot.get(rn, 0) + c
    return pa.table(
        {
            "r_name": pa.array([r[0] for r in rows], pa.string()),
            "n_name": pa.array([r[1] for r in rows], pa.string()),
            "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
            "share_ppm": pa.array(
                [r[2] * 1_000_000 // region_tot[r[0]] for r in rows], pa.int64()
            ),
        }
    )


GAP_PARTITIONS = 64


def cust_order_gap_histogram(sf_dir: str):
    """Inter-arrival histogram: days between a customer's CONSECUTIVE
    orders, counted across all customers — the repeat-purchase cadence
    shape (SQL: LAG window diff + GROUP BY the gap).

    Scale shape: map-side projection to 24-byte (custkey, day, orderkey)
    rows -> ONE coarse customer-hash exchange -> per-partition vectorized
    lag-diff (lexsort + same-customer mask) folding straight to histogram
    partials -> tiny partial+global groupby over <= |corpus date span|
    rows.  The gap multiset per customer depends only on the SORTED day
    multiset, so the engine's (day, orderkey) sort and the oracle's
    (o_orderdate, o_orderkey) window order agree even for same-day
    orders.  Result is driver-bounded (span days) and returned typed."""
    import pandas as pd

    ds = _read(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        days = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 86_400_000_000
        )
        c = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_custkey": pa.array(c, pa.int64()),
                "o_orderkey": batch["o_orderkey"],
                "day": pa.array(days, pa.int64()),
                "__cpart": pa.array(coarse_int_partition(c, GAP_PARTITIONS)),
            }
        )

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        c = g["o_custkey"].to_numpy()
        d = g["day"].to_numpy()
        k = g["o_orderkey"].to_numpy()
        order = np.lexsort((k, d, c))
        c, d = c[order], d[order]
        same = c[1:] == c[:-1]
        u, n = np.unique((d[1:] - d[:-1])[same], return_counts=True)
        return pd.DataFrame(
            {"gap_days": u.astype(np.int64), "n": n.astype(np.int64)}
        )

    hist = _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__cpart")
        .map_groups(
            lambda g: gaps(g.drop(columns="__cpart")), batch_format="pandas"
        ),
        ["gap_days"],
        ["n"],
    )
    schema = pa.schema([("gap_days", pa.int64()), ("n", pa.int64())])
    rows = sorted(hist.take_all(), key=lambda r: r["gap_days"])
    if not rows:
        return schema.empty_table()
    return pa.table(
        {
            "gap_days": pa.array([r["gap_days"] for r in rows], pa.int64()),
            "n": pa.array([r["n"] for r in rows], pa.int64()),
        }
    )


REV_DECILE_TILES = 10
REV_DECILE_BUCKET_CENTS = 1_000_000  # $10k coarse ranking buckets


def cust_revenue_deciles(sf_dir: str):
    """Revenue-concentration (Lorenz) table: customers NTILE(10)-ranked by
    lifetime spend, with each decile's headcount, revenue, share and
    cumulative share in exact ppm — the "top decile drives X% of revenue"
    report.

    Scale shape: per-customer spend via one partial+global exchange; the
    global NTILE uses the ``bucket_rank_offsets`` stitch (coarse floor
    buckets of cents, driver sees ONE row per nonempty bucket, never
    per-customer state); each bucket kernel lexsorts its own customers by
    (cents, custkey) — SQL's NTILE ORDER BY tie-break — and immediately
    folds to per-(bucket, tile) partials, so the final exchange is
    tile-grain.  Shares are computed on the driver over 10 rows in Python
    big ints (cents * 10^6 exceeds int64 at warehouse scale; the oracle's
    HUGEINT does the same).  Partitioning assumption: no single $10k
    revenue bucket dominates (shrink REV_DECILE_BUCKET_CENTS if one
    does)."""
    import pandas as pd

    from ..functions.core import bucket_rank_offsets

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": _cents(batch["o_totalprice"]),
            }
        )

    rev = _partial_then_global(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"],
        ["cents"],
    ).materialize()

    def bucket_counts(batch: pa.Table) -> pa.Table:
        v = batch["cents"].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(v // REV_DECILE_BUCKET_CENTS)
        return pa.table(
            {
                "bucket": pa.array(uniq.astype(np.int64)),
                "cnt": pa.array(np.bincount(codes).astype(np.int64)),
            }
        )

    offsets, totals = bucket_rank_offsets(
        _partial_then_global(
            rev.map_batches(bucket_counts, batch_format="pyarrow"),
            ["bucket"],
            ["cnt"],
        ),
        [],
        "bucket",
    )
    out_schema = pa.schema(
        [
            ("tile", pa.int64()),
            ("n_cust", pa.int64()),
            ("revenue_cents", pa.int64()),
            ("share_ppm", pa.int64()),
            ("cum_share_ppm", pa.int64()),
        ]
    )
    n_total = totals.get((), 0)
    if n_total == 0:
        return out_schema.empty_table()
    q, r = divmod(n_total, REV_DECILE_TILES)

    def add_bucket(batch: pa.Table) -> pa.Table:
        v = batch["cents"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(v // REV_DECILE_BUCKET_CENTS)
        )

    def tile_partials(g: pd.DataFrame) -> pd.DataFrame:
        c = g["cents"].to_numpy(dtype=np.int64)
        ck = g["o_custkey"].to_numpy(dtype=np.int64)
        order = np.lexsort((ck, c))
        c = c[order]
        base = offsets[(int(g["bucket"].iloc[0]),)]
        rank = base + np.arange(1, len(g) + 1, dtype=np.int64)
        if q == 0:
            tile = rank
        else:
            head = (q + 1) * r
            tile = np.where(
                rank <= head,
                (rank - 1) // (q + 1) + 1,
                r + (rank - 1 - head) // q + 1,
            ).astype(np.int64)
        codes, uniq = pd.factorize(tile)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, codes, c)
        return pd.DataFrame(
            {
                "tile": uniq.astype(np.int64),
                "n_cust": np.bincount(codes).astype(np.int64),
                "revenue_cents": s,
            }
        )

    tiles = _partial_then_global(
        rev.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(tile_partials, batch_format="pandas"),
        ["tile"],
        ["n_cust", "revenue_cents"],
    )
    rows = sorted(tiles.take_all(), key=lambda t: t["tile"])
    total_cents = sum(int(t["revenue_cents"]) for t in rows)
    cum = 0
    out = []
    for t in rows:
        cents = int(t["revenue_cents"])
        cum += cents
        out.append(
            {
                "tile": int(t["tile"]),
                "n_cust": int(t["n_cust"]),
                "revenue_cents": cents,
                "share_ppm": cents * 1_000_000 // total_cents,
                "cum_share_ppm": cum * 1_000_000 // total_cents,
            }
        )
    return pa.Table.from_pylist(out, schema=out_schema)


RFM_Q1_PPM = 333_333
RFM_Q2_PPM = 666_667


def cust_rfm_segments(sf_dir: str):
    """RFM segmentation — the classic CRM cut: every customer scored on
    Recency (last order epoch-day), Frequency (order count) and Monetary
    (lifetime cents), each metric split into value-boundary terciles
    (the engine's events_value_quartile convention: tier = 1 + number of
    exact-quantile boundaries strictly below the value — NOT positional
    NTILE, so ties share a tier), and the corpus reduced to the <= 27
    (r_tier, f_tier, m_tier) segment headcounts.

    Scale shape: per-customer (r, f, m) via map-side Arrow group_by
    partials and one custkey exchange (Sum/Sum/Max merge), materialized
    as a 32 B/customer narrow table; the six tercile boundaries come
    from ONE shared multi-rank ``grouped_quantile_multi`` narrowing over the table
    melted to (metric, value) — all three metrics advance in the same
    histogram passes; the assignment pass is a map-only compare against
    six broadcast ints folding straight to segment partials, so the
    final exchange is <= 27 rows."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    from ..functions.quantiles import grouped_quantile_multi

    orders = _read(
        sf_dir, "orders", columns=["o_custkey", "o_totalprice", "o_orderdate"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        days = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // 86_400_000_000
        )
        t = pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "cents": _cents(batch["o_totalprice"]),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "day": pa.array(days, pa.int64()),
            }
        )
        out = t.group_by(["o_custkey"]).aggregate(
            [("cents", "sum"), ("n", "sum"), ("day", "max")]
        )
        return out.rename_columns(["o_custkey", "m", "f", "r"])

    cust = (
        orders.map_batches(prep, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("m", alias_name="m"), Sum("f", alias_name="f"),
                   Max("r", alias_name="r"))
        .materialize()
    )

    def melt(batch: pa.Table) -> pa.Table:
        parts = []
        for g in ("r", "f", "m"):
            parts.append(
                pa.table(
                    {
                        "g": pa.array(
                            np.full(batch.num_rows, g, dtype=object), pa.string()
                        ),
                        "v": pc.cast(batch[g], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    # materialize the melted view once: the quantile narrowing makes
    # ~log_B(range) passes and each would otherwise re-run the melt map
    # materializing vs re-melting per pass measured a wash at sf0.1
    # (interleaved 7.4/7.4 s): the melt map is cheap next to the
    # narrowing exchanges, whose fixed per-exchange cost dominates at toy
    # scale and amortizes at real scale.  Keep the pin: it also protects
    # the narrowing from re-running the upstream custkey exchange.
    melted = cust.map_batches(melt, batch_format="pyarrow").materialize()

    def make_ds():
        return melted

    from ray.data.aggregate import Count, Min

    stats_rows = (
        make_ds().groupby("g").aggregate(Min("v"), Max("v"), Count()).take_all()
    )
    out_schema = pa.schema(
        [
            ("r_tier", pa.int64()),
            ("f_tier", pa.int64()),
            ("m_tier", pa.int64()),
            ("n_cust", pa.int64()),
        ]
    )
    if not stats_rows:
        return out_schema.empty_table()
    # both tercile boundaries of all three metrics resolve in ONE shared
    # multi-rank narrowing (each pass scans the melted table once)
    by_label, _ = grouped_quantile_multi(
        make_ds,
        {
            "b1": lambda n: (RFM_Q1_PPM * n + 999_999) // 1_000_000,
            "b2": lambda n: (RFM_Q2_PPM * n + 999_999) // 1_000_000,
        },
        _stats_rows=stats_rows,
    )
    b1, b2 = by_label["b1"], by_label["b2"]

    def assign(batch: pa.Table) -> pa.Table:
        tiers = {}
        for g in ("r", "f", "m"):
            v = pc.cast(batch[g], pa.int64()).to_numpy(zero_copy_only=False)
            tiers[g] = 1 + (v > b1[g]).astype(np.int64) + (v > b2[g])
        code = (tiers["r"] - 1) * 9 + (tiers["f"] - 1) * 3 + (tiers["m"] - 1)
        codes, uniq = pd.factorize(code)
        n = np.bincount(codes).astype(np.int64)
        uniq = uniq.astype(np.int64)
        return pa.table(
            {
                "r_tier": pa.array(uniq // 9 + 1, pa.int64()),
                "f_tier": pa.array(uniq % 9 // 3 + 1, pa.int64()),
                "m_tier": pa.array(uniq % 3 + 1, pa.int64()),
                "n_cust": pa.array(n, pa.int64()),
            }
        )

    seg = _partial_then_global(
        cust.map_batches(assign, batch_format="pyarrow"),
        ["r_tier", "f_tier", "m_tier"],
        ["n_cust"],
    )
    rows = sorted(
        seg.take_all(), key=lambda t: (t["r_tier"], t["f_tier"], t["m_tier"])
    )
    return pa.Table.from_pylist(rows, schema=out_schema)


def orders_mom_growth(sf_dir: str):
    """Month-over-month growth report: per calendar month (yyyymm),
    order count, exact revenue cents, and signed growth vs the PREVIOUS
    PRESENT month in ppm — the standard finance trendline (SQL LAG over
    the month-grain aggregate).

    Scale shape: the month key is derived map-side so the only exchange
    moves (yyyymm, n, cents) partials; the lag/ratio fold runs on the
    driver over the span-bounded month table (a century is 1,200 rows).
    Growth uses TRUNCATING division (DuckDB ``//`` on signed values);
    the first month's growth is NULL."""
    from ..functions.stats import _trunc_div

    orders = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def prep(batch: pa.Table) -> pa.Table:
        mi = (
            batch["o_orderdate"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[M]")
            .astype(np.int64)
        )
        ym = (1970 + mi // 12) * 100 + mi % 12 + 1
        return pa.table(
            {
                "yyyymm": pa.array(ym, pa.int64()),
                "n_orders": pa.array(np.ones(len(ym), dtype=np.int64)),
                "revenue_cents": _cents(batch["o_totalprice"]),
            }
        )

    agg = _partial_then_global(
        orders.map_batches(prep, batch_format="pyarrow"),
        ["yyyymm"],
        ["n_orders", "revenue_cents"],
    )
    rows = sorted(agg.take_all(), key=lambda r: r["yyyymm"])
    out = {
        "yyyymm": [],
        "n_orders": [],
        "revenue_cents": [],
        "growth_ppm": [],
    }
    prev = None
    for r in rows:
        cents = int(r["revenue_cents"])
        out["yyyymm"].append(int(r["yyyymm"]))
        out["n_orders"].append(int(r["n_orders"]))
        out["revenue_cents"].append(cents)
        out["growth_ppm"].append(
            None if prev is None else _trunc_div((cents - prev) * 1_000_000, prev)
        )
        prev = cents
    return pa.table(
        {
            "yyyymm": pa.array(out["yyyymm"], pa.int64()),
            "n_orders": pa.array(out["n_orders"], pa.int64()),
            "revenue_cents": pa.array(out["revenue_cents"], pa.int64()),
            "growth_ppm": pa.array(out["growth_ppm"], pa.int64()),
        }
    )


CHEAPEST_SUPPKEY_BITS = 20
_CS_SUPP_MASK = (1 << CHEAPEST_SUPPKEY_BITS) - 1


def part_cheapest_supplier(sf_dir: str):
    """TPC-H Q2's correlated-min shape over the available tables: for
    every part, the supplier offering the LOWEST observed unit price in
    lineitem (ties by min suppkey), unit price in exact millicents.

    Scale shape: the dedup_keep_best packed-key trick flipped to argmin
    — (unit_mc, suppkey) packs into ONE int64 so the whole reduce is a
    NATIVE map-side-combined Min (no map_groups, no join-back pass: the
    usual Q2 plan needs a second scan to recover the argmin row; the
    pack carries it through the exchange).  The exchange moves one
    (partkey, key) pair per part per block.  Loud guards: suppkey must
    fit 2^20 and unit_mc 2^42 (re-pack wider if a corpus exceeds
    them).  Result is part-proportional — returned as a streaming
    Dataset, never driver-materialized."""
    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        ext = _cents(batch["l_extendedprice"]).to_numpy(zero_copy_only=False)
        qty = _cents(batch["l_quantity"]).to_numpy(zero_copy_only=False)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        unit_mc = ext * 100_000 // qty
        if len(sk) and (
            sk.max() > _CS_SUPP_MASK
            or sk.min() < 0
            or unit_mc.max() >= (1 << 42)
        ):
            raise ValueError(
                "part_cheapest_supplier: suppkey or unit_mc exceeds the "
                "packed argmin key width — widen CHEAPEST_SUPPKEY_BITS"
            )
        key = (unit_mc << CHEAPEST_SUPPKEY_BITS) + sk
        t = pa.table(
            {
                "l_partkey": batch["l_partkey"],
                "key": pa.array(key, pa.int64()),
            }
        )
        out = t.group_by(["l_partkey"]).aggregate([("key", "min")])
        return out.rename_columns(["l_partkey", "key"])

    from ray.data.aggregate import Min

    agg = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Min("key", alias_name="key"))
    )

    def decode(batch: pa.Table) -> pa.Table:
        key = batch["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
                "l_suppkey": pa.array(key & _CS_SUPP_MASK, pa.int64()),
                "unit_mc": pa.array(
                    key >> CHEAPEST_SUPPKEY_BITS, pa.int64()
                ),
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def events_user_ltv_cohort(sf_dir: str):
    """Cohort LTV matrix: users bucketed by FIRST-activity day (the
    cohort), each cohort's distinct active users and exact revenue cents
    per day-offset since that first day — the retention table's revenue
    sibling (SQL: min-day self-join + two-key group).

    Scale shape: ONE coarse user-hash exchange total — a user's whole
    history lands in one partition, so the partition kernel derives the
    cohort (per-user min day), the offsets, the per-(cohort, offset)
    distinct-user and cents partials all locally (lexsort + reduceat /
    unique, no per-user Python); users never span partitions, so
    partition partials sum globally.  Output is bounded by the day-span
    squared (a decade is ~6.7M rows; driver materialization is fine for
    report-grain spans — return typed per the empty-schema invariant)."""
    import pandas as pd

    from ..functions.windows import _add_user_part

    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(_add_user_part, batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        day = (
            g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        from ..functions.numeric import cents_np

        c = cents_np(g["value"].to_numpy())
        order = np.lexsort((day, u))
        u, day, c = u[order], day[order], c[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        cohort = day[np.maximum.accumulate(np.where(first, np.arange(len(u)), 0))]
        off = day - cohort
        df = pd.DataFrame(
            {"cohort_day": cohort, "day_offset": off, "user_id": u, "c": c}
        )
        agg = df.groupby(["cohort_day", "day_offset"], sort=False).agg(
            n_users=("user_id", "nunique"), revenue_cents=("c", "sum")
        )
        return agg.reset_index()

    from ..functions.core import partial_then_global

    agg = partial_then_global(
        ds.groupby("__upart").map_groups(
            lambda g: per_part(g.drop(columns="__upart")),
            batch_format="pandas",
        ),
        ["cohort_day", "day_offset"],
        ["n_users", "revenue_cents"],
    )
    rows = sorted(
        agg.take_all(), key=lambda r: (r["cohort_day"], r["day_offset"])
    )
    return pa.table(
        {
            "cohort_day": pa.array(
                [r["cohort_day"] for r in rows], pa.int64()
            ),
            "day_offset": pa.array(
                [r["day_offset"] for r in rows], pa.int64()
            ),
            "n_users": pa.array([r["n_users"] for r in rows], pa.int64()),
            "revenue_cents": pa.array(
                [r["revenue_cents"] for r in rows], pa.int64()
            ),
        }
    )


def orders_denormalized(sf_dir: str):
    """Star-schema flatten (the ETL/feature-extraction staple): every
    order enriched with its customer's segment, nation and region names
    — the denormalized extract a feature store or BI tool consumes.

    Scale shape: pure broadcast map — customer/nation/region ride the
    object store ONCE as sorted (key, value) numpy pairs (the q5
    convention: vectorized ``searchsorted`` probes, no per-row dict
    gets, no shuffle of the fact side at all); the result streams,
    orders-proportional, never driver-materialized.  At extreme SF
    customer graduates from broadcast to a bucketed join (the
    q_join_bucketed path) — threshold is worker-heap fit, not table
    role."""
    import ray

    nation = _read_dim(sf_dir, "nation").sort_values("n_nationkey")
    region = _read_dim(sf_dir, "region").sort_values("r_regionkey")
    customer = _read_dim(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_mktsegment"]
    ).sort_values("c_custkey")
    refs = ray.put(
        (
            customer["c_custkey"].to_numpy(dtype=np.int64),
            customer["c_nationkey"].to_numpy(dtype=np.int64),
            customer["c_mktsegment"].to_numpy(),
            nation["n_nationkey"].to_numpy(dtype=np.int64),
            nation["n_name"].to_numpy(),
            nation["n_regionkey"].to_numpy(dtype=np.int64),
            region["r_regionkey"].to_numpy(dtype=np.int64),
            region["r_name"].to_numpy(),
        )
    )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def enrich(batch: pa.Table) -> pa.Table:
        ck, cn, cseg, nk, nname, nr, rk, rname = ray.get(refs)
        oc = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ci = np.searchsorted(ck, oc)
        natkey = cn[ci]
        ni = np.searchsorted(nk, natkey)
        ri = np.searchsorted(rk, nr[ni])
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "o_custkey": batch["o_custkey"],
                "price_cents": _cents(batch["o_totalprice"]),
                "c_mktsegment": pa.array(cseg[ci], pa.string()),
                "n_name": pa.array(nname[ni], pa.string()),
                "r_name": pa.array(rname[ri], pa.string()),
            }
        )

    return orders.map_batches(enrich, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Q9-style: product profit rollup by supplier nation x ship year
# ---------------------------------------------------------------------------

Q9_NAME_SUBSTR = "rod"  # part filter: p_name LIKE '%rod%'


def q9_profit_by_nation_year(sf_dir: str):
    """TPC-H Q9 shape (ref has no partsupp table, so unit cost comes from
    ``p_retailprice``): profit per supplier nation per ship year over parts
    whose name contains a substring.

    profit_e4 = price_cents*(100 - disc_pct) - retail_cents*qty*100, all
    exact int64 (quantities are integral — pinned by the oracle).

    Scale shape: both dimensions broadcast once via ``ray.put`` as sorted
    (key, value) numpy pairs (part: matching keys + retail cents; supplier:
    suppkey -> nation name index).  Each lineitem batch folds to at most
    |nations| x |years| partial rows map-side, so the only exchange is the
    tiny partial+global groupby — no join shuffle at all."""
    import ray

    part = _read_dim(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    part = part[part["p_name"].str.contains(Q9_NAME_SUBSTR, regex=False)]
    part = part.sort_values("p_partkey")
    nation = _read_dim(sf_dir, "nation").sort_values("n_nationkey")
    supplier = _read_dim(
        sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]
    ).sort_values("s_suppkey")
    from ..functions.numeric import cents_arrow

    refs = ray.put(
        (
            part["p_partkey"].to_numpy(dtype=np.int64),
            cents_arrow(pa.array(part["p_retailprice"].to_numpy())).to_numpy(
                zero_copy_only=False
            ),
            supplier["s_suppkey"].to_numpy(dtype=np.int64),
            supplier["s_nationkey"].to_numpy(dtype=np.int64),
            nation["n_nationkey"].to_numpy(dtype=np.int64),
            nation["n_name"].to_numpy(),
        )
    )

    li = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    def partial(b: pa.Table) -> pa.Table:
        pk, pretail, sk, snat, nk, nname = ray.get(refs)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.clip(np.searchsorted(pk, probe), 0, max(len(pk) - 1, 0))
        keep = (pk[idx] == probe) if len(pk) else np.zeros(len(probe), bool)
        if not keep.any():
            return pa.table(
                {
                    "n_name": pa.array([], pa.string()),
                    "l_year": pa.array([], pa.int64()),
                    "profit_e4": pa.array([], pa.int64()),
                    "n_rows": pa.array([], pa.int64()),
                }
            )
        b = b.filter(pa.array(keep))
        retail = pretail[idx[keep]]
        price = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        qty = (
            b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        )  # integral by contract
        profit = price * (100 - disc) - retail * qty * 100
        sidx = np.searchsorted(sk, b["l_suppkey"].to_numpy(zero_copy_only=False))
        nat = snat[sidx]  # FK integrity: every suppkey exists
        year = pc.year(b["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        # exact int64 segment sums per (nation, year): lexsort + reduceat
        key = nat * 10_000 + year
        order = np.argsort(key, kind="stable")
        key, profit = key[order], profit[order]
        starts = np.ones(len(key), dtype=bool)
        starts[1:] = key[1:] != key[:-1]
        pos = np.flatnonzero(starts)
        names = nname[np.searchsorted(nk, key[pos] // 10_000)]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "l_year": pa.array(key[pos] % 10_000, pa.int64()),
                "profit_e4": pa.array(np.add.reduceat(profit, pos).astype(np.int64)),
                "n_rows": pa.array(np.diff(np.append(pos, len(key))), pa.int64()),
            }
        )

    rows = _partial_then_global(
        li.map_batches(partial, batch_format="pyarrow"),
        ["n_name", "l_year"],
        ["profit_e4", "n_rows"],
    ).take_all()
    # nations x years bounded: typed driver table (the empty-safe contract)
    schema = pa.schema(
        [
            ("n_name", pa.string()),
            ("l_year", pa.int64()),
            ("profit_e4", pa.int64()),
            ("n_rows", pa.int64()),
        ]
    )
    rows = sorted(
        (r["n_name"], int(r["l_year"]), int(r["profit_e4"]), int(r["n_rows"]))
        for r in rows
    )
    return pa.table(
        {
            "n_name": pa.array([r[0] for r in rows], pa.string()),
            "l_year": pa.array([r[1] for r in rows], pa.int64()),
            "profit_e4": pa.array([r[2] for r in rows], pa.int64()),
            "n_rows": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q11-style: parts whose revenue exceeds a multiple of the global average
# ---------------------------------------------------------------------------

# keep parts with 10 * n_parts * value > 13 * total  (i.e. > 1.3x the mean
# per-part value; TPC-H Q11's fraction is SF-scaled, a mean multiple is the
# scale-free equivalent for a synthetic uniform corpus)
Q11_NUM = 13
Q11_DEN = 10


def q11_part_value_hotlist(sf_dir: str):
    """TPC-H Q11 shape (HAVING against a global-total scalar): per-part
    revenue kept only where it exceeds 1.3x the mean per-part value.

    Scale shape: per-batch (partkey, value) Arrow partials -> keyed groupby
    -> the REDUCED table (one row per distinct part — dimension-bounded) is
    materialized once and reused for both the global scalars and the filter;
    the threshold compare runs in exact Python big ints (10*n*val vs
    13*total overflows int64 near 1e18 at extreme SF), over driver-bounded
    rows only."""
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        price = _cents(b["l_extendedprice"]).to_numpy(zero_copy_only=False)
        disc = _cents(b["l_discount"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_partkey": b["l_partkey"],
                "value_e4": pa.array(price * (100 - disc), pa.int64()),
            }
        ).group_by(["l_partkey"]).aggregate([("value_e4", "sum")]).rename_columns(
            ["l_partkey", "value_e4"]
        )

    per_part = _partial_then_global(
        li.map_batches(partial, batch_format="pyarrow"), ["l_partkey"], ["value_e4"]
    ).materialize()  # reused: scalar pass + filter pass (part-bounded rows)

    import ray

    reduced = per_part.take_all()
    schema = pa.schema([("l_partkey", pa.int64()), ("value_e4", pa.int64())])
    if not reduced:
        return schema.empty_table()
    n_parts = len(reduced)
    total = sum(int(r["value_e4"]) for r in reduced)  # exact big-int
    rows = sorted(
        (int(r["l_partkey"]), int(r["value_e4"]))
        for r in reduced
        if Q11_DEN * n_parts * int(r["value_e4"]) > Q11_NUM * total
    )
    return pa.table(
        {
            "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
            "value_e4": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q16-style: distinct-supplier variety per (brand, type, size)
# ---------------------------------------------------------------------------

Q16_EXCL_BRAND = "Brand#12"
Q16_EXCL_TYPE = "PROMO"
Q16_SUPP_MOD = 3  # suppliers with s_suppkey % 3 == 0 are the "complaints" set


def q16_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape (ref has no partsupp: the part-supplier association
    is the distinct (l_partkey, l_suppkey) pairs observed in lineitem):
    count DISTINCT suppliers per (brand, type, size) over non-excluded
    parts, excluding the deterministic "complaints" supplier set
    (s_suppkey % 3 == 0).

    Scale shape: the part dimension broadcasts once as sorted parallel
    arrays (partkey -> packed (brand, type, size) code); each lineitem
    batch decorates map-side, drops excluded suppliers with integer math
    (no supplier table needed), and emits its DISTINCT (code, suppkey)
    pairs — so the exchange carries at most |groups| x |suppliers| rows
    per block, never lineitems.  A keyed groupby dedups globally; the
    per-group COUNT over the deduped pairs is a second tiny
    partial+global pass."""
    import ray

    part = _read_dim(
        sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    )
    part = part[
        (part["p_brand"] != Q16_EXCL_BRAND) & (part["p_type"] != Q16_EXCL_TYPE)
    ].sort_values("p_partkey")
    brands = np.array(sorted(part["p_brand"].unique()))
    types = np.array(sorted(part["p_type"].unique()))
    b_idx = np.searchsorted(brands, part["p_brand"].to_numpy())
    t_idx = np.searchsorted(types, part["p_type"].to_numpy())
    size = part["p_size"].to_numpy(dtype=np.int64)
    # packed group code: (brand, type, size) -> one int64 (sizes are 1..50)
    code = (b_idx * len(types) + t_idx) * 64 + size
    refs = ray.put((part["p_partkey"].to_numpy(dtype=np.int64), code))

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pairs(b: pa.Table) -> pa.Table:
        pk, pcode = ray.get(refs)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.clip(np.searchsorted(pk, probe), 0, max(len(pk) - 1, 0))
        keep = ((pk[idx] == probe) if len(pk) else np.zeros(len(probe), bool)) & (
            supp % Q16_SUPP_MOD != 0
        )
        pair = np.unique(pcode[idx[keep]] * (1 << 32) | supp[keep])
        return pa.table({"pair": pa.array(pair, pa.int64())})

    # global dedup of (group code, suppkey) pairs, then count per group
    deduped = li.map_batches(pairs, batch_format="pyarrow").groupby("pair").count()

    def per_group(b: pa.Table) -> pa.Table:
        pair = b["pair"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"code": pa.array(pair >> 32, pa.int64()),
             "supplier_cnt": pa.array(np.ones(len(pair), np.int64))}
        ).group_by(["code"]).aggregate([("supplier_cnt", "sum")]).rename_columns(
            ["code", "supplier_cnt"]
        )

    counts = _partial_then_global(
        deduped.map_batches(per_group, batch_format="pyarrow"), ["code"], ["supplier_cnt"]
    )

    def finish(b: pa.Table) -> pa.Table:
        c = b["code"].to_numpy(zero_copy_only=False)
        bt = c >> 6
        return pa.table(
            {
                "p_brand": pa.array(brands[bt // len(types)], pa.string()),
                "p_type": pa.array(types[bt % len(types)], pa.string()),
                "p_size": pa.array(c & 63, pa.int64()),
                "supplier_cnt": b["supplier_cnt"],
            }
        )

    # brands x types x sizes bounded: typed driver table (empty-safe)
    rows = counts.map_batches(finish, batch_format="pyarrow").take_all()
    rows = sorted(
        (r["p_brand"], r["p_type"], int(r["p_size"]), int(r["supplier_cnt"]))
        for r in rows
    )
    return pa.table(
        {
            "p_brand": pa.array([r[0] for r in rows], pa.string()),
            "p_type": pa.array([r[1] for r in rows], pa.string()),
            "p_size": pa.array([r[2] for r in rows], pa.int64()),
            "supplier_cnt": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q20-style: suppliers who shipped an excess of a part family in a year
# ---------------------------------------------------------------------------

Q20_NAME_PREFIX = "small"
Q20_YEAR_LO = "1997-01-01"
Q20_YEAR_HI = "1998-01-01"
Q20_QTY_THRESHOLD = 60  # sum(l_quantity) per (supplier, part) must exceed


def q20_excess_shippers(sf_dir: str):
    """TPC-H Q20 shape (availqty replaced by a fixed quantity threshold —
    the ref schema has no partsupp): suppliers with ANY (supplier, part)
    1997 shipment total over the threshold, for parts named 'small%'.

    Scale shape: matching partkeys broadcast once (name filter is
    dimension-side); the date window is pushed into the parquet scan; each
    batch folds (suppkey, partkey) -> qty partials map-side so the keyed
    groupby moves one row per touched pair per block; the qualifying
    DISTINCT suppkey set is supplier-bounded and decorates on the driver."""
    import ray

    part = _read_dim(sf_dir, "part", columns=["p_partkey", "p_name"])
    part = part[part["p_name"].str.startswith(Q20_NAME_PREFIX)]
    pk_ref = ray.put(np.sort(part["p_partkey"].to_numpy(dtype=np.int64)))

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        row_filter=(
            (pads.field("l_shipdate") >= np.datetime64(Q20_YEAR_LO, "us"))
            & (pads.field("l_shipdate") < np.datetime64(Q20_YEAR_HI, "us"))
        ),
    )

    def partial(b: pa.Table) -> pa.Table:
        pk = ray.get(pk_ref)
        probe = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.clip(np.searchsorted(pk, probe), 0, max(len(pk) - 1, 0))
        keep = (pk[idx] == probe) if len(pk) else np.zeros(len(probe), bool)
        return pa.table(
            {
                "l_suppkey": b["l_suppkey"].filter(pa.array(keep)),
                "l_partkey": b["l_partkey"].filter(pa.array(keep)),
                "qty": pa.array(
                    b["l_quantity"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
            }
        ).group_by(["l_suppkey", "l_partkey"]).aggregate([("qty", "sum")]).rename_columns(
            ["l_suppkey", "l_partkey", "qty"]
        )

    pair_qty = _partial_then_global(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_suppkey", "l_partkey"],
        ["qty"],
    )

    def supp_only(b: pa.Table) -> pa.Table:
        qual = b["qty"].to_numpy(zero_copy_only=False) > Q20_QTY_THRESHOLD
        return pa.table(
            {
                "s_suppkey": pa.array(
                    np.unique(
                        b["l_suppkey"].to_numpy(zero_copy_only=False)[qual]
                    ),
                    pa.int64(),
                )
            }
        )

    supps = pair_qty.map_batches(supp_only, batch_format="pyarrow").take_all()
    schema = pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string())])
    if not supps:
        return schema.empty_table()
    keys = sorted({int(r["s_suppkey"]) for r in supps})
    supplier = _read_dim(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    names = dict(zip(supplier["s_suppkey"], supplier["s_name"]))
    return pa.table(
        {
            "s_suppkey": pa.array(keys, pa.int64()),
            "s_name": pa.array([names[k] for k in keys], pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# LISTAGG / collect_set: per-nation sorted distinct segment list
# ---------------------------------------------------------------------------


def nation_segment_listagg(sf_dir: str):
    """string_agg / collect_set shape: each nation's DISTINCT market
    segments as one comma-joined, sorted string (SQL string_agg(DISTINCT x,
    ',' ORDER BY x) — the categorical-profile report every BI layer has).

    Scale shape: collect_set distributes as distinct-pair reduction — each
    customer batch emits its DISTINCT (nationkey, segment) pairs, a keyed
    groupby dedups globally, and only the |nations| x |segments|-bounded
    pair table reaches the driver for the string join (the strings
    themselves never shuffle row-proportionally)."""

    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])

    def pairs(b: pa.Table) -> pa.Table:
        df = b.group_by(["c_nationkey", "c_mktsegment"]).aggregate([])
        return df

    deduped = (
        cust.map_batches(pairs, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .count()
        .take_all()
    )
    schema = pa.schema(
        [("n_name", pa.string()), ("segments", pa.string()), ("n_segments", pa.int64())]
    )
    if not deduped:
        return schema.empty_table()
    nation = _read_dim(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    nk2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    by_nat: dict[str, list] = {}
    for r in deduped:
        by_nat.setdefault(nk2name[r["c_nationkey"]], []).append(r["c_mktsegment"])
    names = sorted(by_nat)
    return pa.table(
        {
            "n_name": pa.array(names, pa.string()),
            "segments": pa.array(
                [",".join(sorted(by_nat[n])) for n in names], pa.string()
            ),
            "n_segments": pa.array([len(by_nat[n]) for n in names], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Triangle counting over the co-purchase graph (degree-oriented)
# ---------------------------------------------------------------------------

TRI_PARTITIONS = 64

_TRI_SCHEMA = pa.schema([("n_edges", pa.int64()), ("n_triangles", pa.int64())])


def _pack_pair_part(b: pa.Table, cols=("x", "y")) -> pa.Table:
    """Append the coarse pair-hash partition id for an (x, y) int table —
    the part_pairs second-exchange key, shared by the triangle passes."""
    x = b[cols[0]].to_numpy(zero_copy_only=False).astype(np.uint64)
    y = b[cols[1]].to_numpy(zero_copy_only=False).astype(np.uint64)
    mixed = (x ^ (y * np.uint64(0xC2B2AE3D27D4EB4F))).astype(np.int64)
    return b.append_column(
        "__ppart", pa.array(coarse_int_partition(mixed, TRI_PARTITIONS))
    )


def _forward_pairs(keys: np.ndarray):
    """Basket-style forward pair expansion over sorted segment keys:
    returns (a_idx, b_idx) index arrays pairing each row with every later
    row of its segment (the part_pairs repeat/offset arithmetic, factored
    for reuse by the triangle passes)."""
    n = len(keys)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = keys[1:] != keys[:-1]
    grp = np.cumsum(new) - 1
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    local = np.arange(n, dtype=np.int64) - starts[grp]
    fan = sizes[grp] - 1 - local
    total = int(fan.sum())
    if total == 0:
        return None
    a = np.repeat(np.arange(n, dtype=np.int64), fan)
    off0 = np.concatenate(([0], np.cumsum(fan)[:-1]))
    b = np.arange(total, dtype=np.int64) - np.repeat(off0, fan) + a + 1
    return a, b


def copurchase_triangles(sf_dir: str):
    """Global triangle count of the co-purchase graph (parts are nodes, an
    edge joins two parts bought in the same order) — the graph-analytics
    clustering-structure metric, counted ONCE per triangle via the degree
    orientation (node-iterator++): each edge points from its lower
    (degree, id) endpoint to the higher, wedges expand only over
    out-neighbors, and a wedge closes iff its (v, w) key is an oriented
    edge.

    Scale shape: three coarse int-key exchanges, none corpus-sized —
    orderkey-hash for basket pair expansion (the part_pairs kernel),
    pair-hash for edge dedup (np.unique per partition), src-hash for
    wedge expansion — plus one (v, w)-hash exchange where wedges and
    edges meet for the closure probe (sorted-array searchsorted per
    partition).  The degree table is part-dimension-bounded and
    broadcasts once via ``ray.put``; the orientation caps per-vertex
    out-degree near sqrt(|E|), the textbook wedge-blow-up bound.  The
    driver sees one scalar per partition."""
    import pandas as pd
    import ray

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    _xy_empty = {
        "x": pd.Series([], dtype=np.int64),
        "y": pd.Series([], dtype=np.int64),
    }

    def pair_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"]).sort_values(
            ["l_orderkey", "l_partkey"]
        )
        if len(g) == 0:
            return pd.DataFrame(_xy_empty)
        idx = _forward_pairs(g["l_orderkey"].to_numpy())
        if idx is None:
            return pd.DataFrame(_xy_empty)
        pk = g["l_partkey"].to_numpy()
        pairs = np.unique(pk[idx[0]] * (1 << 32) | pk[idx[1]])
        return pd.DataFrame(
            {
                "x": (pairs >> 32).astype(np.int64),
                "y": (pairs & ((1 << 32) - 1)).astype(np.int64),
            }
        )

    def dedup_edges(g: pd.DataFrame) -> pd.DataFrame:
        pairs = np.unique(
            g["x"].to_numpy().astype(np.int64) * (1 << 32)
            + g["y"].to_numpy().astype(np.int64)
        )
        return pd.DataFrame(
            {
                "x": (pairs >> 32).astype(np.int64),
                "y": (pairs & ((1 << 32) - 1)).astype(np.int64),
            }
        )

    edges = (
        li.map_batches(_basket_add_opart, batch_format="pyarrow")
        .groupby("__opart")
        .map_groups(pair_expand, batch_format="pandas")
        .map_batches(_pack_pair_part, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(dedup_edges, batch_format="pandas")
        .materialize()  # reused: degree pass, orientation pass, probe side
    )

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                b["x"].to_numpy(zero_copy_only=False),
                b["y"].to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(both, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "deg": pa.array(c, pa.int64())}
        )

    deg_rows = _partial_then_global(
        edges.map_batches(deg_partial, batch_format="pyarrow"), ["node"], ["deg"]
    ).take_all()
    n_edges = edges.count()
    if not deg_rows or n_edges == 0:
        return pa.table(
            {"n_edges": pa.array([0], pa.int64()),
             "n_triangles": pa.array([0], pa.int64())}
        )
    nodes = np.array(sorted(int(r["node"]) for r in deg_rows), dtype=np.int64)
    degmap = {int(r["node"]): int(r["deg"]) for r in deg_rows}
    degs = np.array([degmap[k] for k in nodes], dtype=np.int64)
    if nodes.max() >= (1 << 32):
        raise ValueError("partkey exceeds the 32-bit pair-packing guard")
    deg_ref = ray.put((nodes, degs))

    def orient(b: pa.Table) -> pa.Table:
        nd, dg = ray.get(deg_ref)
        x = b["x"].to_numpy(zero_copy_only=False)
        y = b["y"].to_numpy(zero_copy_only=False)
        dx = dg[np.searchsorted(nd, x)]
        dy = dg[np.searchsorted(nd, y)]
        fwd = (dx < dy) | ((dx == dy))  # ties: x < y already, keep x->y
        src = np.where(fwd, x, y)
        dst = np.where(fwd, y, x)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "__spart": pa.array(coarse_int_partition(src, TRI_PARTITIONS)),
            }
        )

    oriented = edges.map_batches(orient, batch_format="pyarrow")

    def wedge_expand(g: pd.DataFrame) -> pd.DataFrame:
        nd, dg = ray.get(deg_ref)
        empty = pd.DataFrame(
            {"v": pd.Series([], dtype=np.int64), "w": pd.Series([], dtype=np.int64)}
        )
        if len(g) == 0:
            return empty
        # out-neighbors ordered by the SAME (deg, id) key, so wedge (v, w)
        # comes out already oriented and can match the oriented edge set
        dkey = dg[np.searchsorted(nd, g["dst"].to_numpy())]
        g = g.assign(__dk=dkey).sort_values(["src", "__dk", "dst"])
        idx = _forward_pairs(g["src"].to_numpy())
        if idx is None:
            return empty
        dst = g["dst"].to_numpy()
        return pd.DataFrame(
            {"v": dst[idx[0]].astype(np.int64), "w": dst[idx[1]].astype(np.int64)}
        )

    def tag_wedges(b: pa.Table) -> pa.Table:
        t = _pack_pair_part(b, cols=("v", "w"))
        key = pc.add(pc.multiply(pc.cast(t["v"], pa.int64()), 1 << 32), t["w"])
        return pa.table(
            {
                "key": key,
                "is_edge": pa.array(np.zeros(b.num_rows, dtype=bool)),
                "__ppart": t["__ppart"],
            }
        )

    def tag_edges(b: pa.Table) -> pa.Table:
        t = _pack_pair_part(
            pa.table({"x": b["src"], "y": b["dst"]})
        )
        key = pc.add(pc.multiply(pc.cast(t["x"], pa.int64()), 1 << 32), t["y"])
        return pa.table(
            {
                "key": key,
                "is_edge": pa.array(np.ones(b.num_rows, dtype=bool)),
                "__ppart": t["__ppart"],
            }
        )

    both = (
        oriented.groupby("__spart")
        .map_groups(wedge_expand, batch_format="pandas")
        .map_batches(tag_wedges, batch_format="pyarrow")
        .union(oriented.map_batches(tag_edges, batch_format="pyarrow"))
    )

    def count_closed(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["is_edge"].to_numpy()
        ek = np.sort(g["key"].to_numpy()[is_e])
        wk = g["key"].to_numpy()[~is_e]
        if len(ek) == 0 or len(wk) == 0:
            n = 0
        else:
            i = np.clip(np.searchsorted(ek, wk), 0, len(ek) - 1)
            n = int((ek[i] == wk).sum())
        return pd.DataFrame({"n": pd.Series([n], dtype=np.int64)})

    parts = (
        both.groupby("__ppart")
        .map_groups(count_closed, batch_format="pandas")
        .take_all()
    )
    n_tri = sum(int(r["n"]) for r in parts)
    return pa.table(
        {
            "n_edges": pa.array([int(n_edges)], pa.int64()),
            "n_triangles": pa.array([n_tri], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Q13 / Q22 adaptations (the last two classic TPC-H shapes)
# ---------------------------------------------------------------------------

Q13_EXCLUDE_STATUS = "F"
Q22_CUTOFF = "2000-01-01"

_Q13_SCHEMA = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])


def q13_custdist(sf_dir: str):
    """TPC-H Q13 adaptation — the customer order-count DISTRIBUTION:
    count each customer's non-'F'-status orders (the status predicate
    stands in for Q13's comment NOT LIKE), keep zero-order customers via
    the left-outer join, then fold to (c_count, custdist).

    Scale shape: order counts cross as custkey PARTIALS (one row per
    custkey per block, never per order) and are materialized
    (customer-dimension-sized) so the empty-side probe costs no second
    scan; the outer join is the hash-partition ``Dataset.join``; the
    histogram folds map-side to a <= max-orders-per-customer exchange.
    The all-excluded corpus short-circuits to [(0, n_customers)] BEFORE
    the join (the Ray 2.49 empty-side ArrowInvalid guard, CLAUDE.md)."""
    counts = _partial_then_global(
        _read(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
        .map_batches(
            lambda b: (
                lambda f: pa.table(
                    {
                        "o_custkey": f["o_custkey"],
                        "n_orders": pa.array(
                            np.ones(f.num_rows, dtype=np.int64)
                        ),
                    }
                )
            )(
                b.filter(
                    pc.not_equal(b["o_orderstatus"], Q13_EXCLUDE_STATUS)
                )
            ),
            batch_format="pyarrow",
        ),
        ["o_custkey"],
        ["n_orders"],
    ).materialize()
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    if counts.count() == 0:
        return pa.table(
            {
                "c_count": pa.array([0], pa.int64()),
                "custdist": pa.array([cust.count()], pa.int64()),
            },
            schema=_Q13_SCHEMA,
        )
    joined = cust.join(
        counts,
        "left_outer",
        num_partitions=16,
        on=("c_custkey",),
        right_on=("o_custkey",),
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_count": pc.cast(
                    pc.fill_null(batch["n_orders"], pa.scalar(0, pa.int64())),
                    pa.int64(),
                ),
                "custdist": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    rows = _partial_then_global(
        joined.map_batches(hist_partial, batch_format="pyarrow"),
        ["c_count"],
        ["custdist"],
    ).take_all()
    rows.sort(key=lambda r: int(r["c_count"]))
    return pa.Table.from_pylist(rows, schema=_Q13_SCHEMA)


_Q22_SCHEMA = pa.schema(
    [
        ("c_nationkey", pa.int64()),
        ("n_cust", pa.int64()),
        ("sum_acctbal_cents", pa.int64()),
    ]
)


def q22_global_balance(sf_dir: str):
    """TPC-H Q22 adaptation — rich, recently-inactive customers per
    nation: account balance above the mean POSITIVE balance (the global
    scalar subquery) and no order on/after Q22_CUTOFF (the 7-years-
    inactive anti-join), grouped by c_nationkey with headcount and total
    balance cents.

    Exactness: the mean compare is CROSS-MULTIPLIED
    (bal_cents * n_pos > sum_pos_cents) so no division happens anywhere;
    positivity is cents > 0 on both sides (the half-cent row is handled
    identically).  Scale shape: one native Sum/Count pass for the
    scalar, one broadcast distinct-recent-buyer key set
    (customer-dimension-bounded, the anti_join_customers policy), one
    map-only filter folding to nation partials.  The result is
    driver-bounded (nation grain) and can be legitimately empty, so it
    ends take_all + typed from_pylist (CLAUDE.md empty-schema
    invariant)."""
    import ray

    cust_bal = _read(sf_dir, "customer", columns=["c_acctbal"]).map_batches(
        lambda b: (
            lambda c: pa.table(
                {
                    "pos_cents": pa.array(c[c > 0], pa.int64()),
                    "one": pa.array(np.ones(int((c > 0).sum()), np.int64)),
                }
            )
        )(_cents(b["c_acctbal"]).to_numpy(zero_copy_only=False)),
        batch_format="pyarrow",
    )
    from ray.data.aggregate import Count, Sum

    stats = cust_bal.aggregate(Sum("pos_cents"), Count())
    sum_pos = int(stats["sum(pos_cents)"] or 0)
    n_pos = int(stats["count()"] or 0)

    recent = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    cutoff = np.datetime64(Q22_CUTOFF, "us")
    recent_keys = pa.array(
        sorted(
            recent.map_batches(
                lambda b: b.filter(
                    pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff))
                ),
                batch_format="pyarrow",
            ).unique("o_custkey")
        ),
        pa.int64(),
    )
    keys_ref = ray.put(recent_keys)

    def sel(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        cents = _cents(batch["c_acctbal"]).to_numpy(zero_copy_only=False)
        rich = cents * n_pos > sum_pos
        inactive = pc.invert(
            pc.is_in(batch["c_custkey"], value_set=keys)
        ).to_numpy(zero_copy_only=False)
        m = rich & inactive
        return pa.table(
            {
                "c_nationkey": pc.cast(batch["c_nationkey"], pa.int64())
                .filter(pa.array(m)),
                "n_cust": pa.array(np.ones(int(m.sum()), np.int64)),
                "sum_acctbal_cents": pa.array(cents[m], pa.int64()),
            }
        )

    rows = _partial_then_global(
        _read(
            sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
        ).map_batches(sel, batch_format="pyarrow"),
        ["c_nationkey"],
        ["n_cust", "sum_acctbal_cents"],
    ).take_all()
    rows.sort(key=lambda r: int(r["c_nationkey"]))
    return pa.Table.from_pylist(rows, schema=_Q22_SCHEMA)
