"""Stream-shaped operators over the ``events`` table.

Ray Data is a batch engine with no event-time watermarks (SURVEY.md §2.9: the
reference is strictly batch too); windowing is expressed as one hash-keyed
shuffle plus ts-sorted per-key logic.  The simple keyed ops (sessionize,
running_total, top_event_per_user) shuffle on a COARSE user-hash partition
(~64 groups) and run a fully vectorized kernel over the whole partition —
one Python call per partition, never per user.  The merge-shaped ops
(as-of / range join and the salted twins) keep per-group ``map_groups``
because their two-pointer logic is per-key anyway.  Ordering assumption:
within one ``user_id``, events are totally ordered by (ts, event_id) —
stated here because the oracle SQL window functions use the same ORDER BY.

Value sums use exact integer cents to keep driver value-hashes stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .numeric import cents_arrow, cents_np, trunc_div_np

SESSION_GAP_S = 1800
HOUR_US = 3_600_000_000


def _read_events(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def tumbling_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + exact cents sum.
    Pre-aggregated per batch, then a small global groupby — the window key
    (epoch-hour) is derived inside map_batches so the shuffle only moves
    (type, hour) partials."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64())
        hour = pc.divide(ts_us, pa.scalar(HOUR_US, pa.int64()))
        cents = cents_arrow(batch["value"])
        return pa.table(
            {
                "event_type": batch["event_type"],
                "epoch_hour": hour,
                "value_cents": cents,
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "epoch_hour"],
        ["value_cents", "n"],
    )


WINDOW_PARTITIONS = 64


def _add_user_part(batch: pa.Table) -> pa.Table:
    """Coarse hash partition on user_id: all events of a user land in one
    partition, ~WINDOW_PARTITIONS Python calls total instead of one per
    user (the shared engine-wide mixer, so sequential user ids don't
    skew)."""
    from .core import coarse_int_partition

    u = batch["user_id"].to_numpy(zero_copy_only=False)
    return batch.append_column(
        "__upart", pa.array(coarse_int_partition(u, WINDOW_PARTITIONS))
    )


from .schema import ensure_schema as _ensure_schema  # shared empty-safe cast

_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_sessions", pa.int64()),
        ("max_session_events", pa.int64()),
    ]
)
_RUNNING_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()), ("running_cents", pa.int64())]
)
_TOP_SCHEMA = pa.schema(
    [("user_id", pa.int64()), ("event_id", pa.int64()), ("value_cents", pa.int64())]
)
_ASOF_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("last_purchase_id", pa.int64())]
)
_RANGE_SCHEMA = pa.schema(
    [("purchase_id", pa.int64()), ("event_id", pa.int64())]
)


def sessionize(sf_dir: str):
    """Per-user sessionization with a 30-min inactivity gap: (user_id,
    n_sessions, max_session_events).

    One coarse hash-partition shuffle on user_id, then a fully VECTORIZED
    partition kernel: one sort by (user, ts, event_id), session breaks =
    user-change OR gap, per-user reductions via reduceat — no per-user
    Python call (a web-scale user count would mean billions of them)."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gaps = np.diff(ts_us, prepend=ts_us[0])
        new_session = new_user | (gaps > SESSION_GAP_S * 1_000_000)
        sid = np.cumsum(new_session)  # 1-based over the whole partition
        sess_counts = np.bincount(sid)[1:]  # events per session
        first_sid = sid[new_user]  # first session id of each user
        n_sessions = np.diff(np.append(first_sid, sid[-1] + 1))
        max_events = np.maximum.reduceat(sess_counts, first_sid - 1)
        return pd.DataFrame(
            {
                "user_id": u[new_user],
                "n_sessions": n_sessions.astype(np.int64),
                "max_session_events": max_events.astype(np.int64),
            }
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _SESSION_SCHEMA,
    )


def distinct_users_hourly(sf_dir: str):
    """EXACT distinct users per (event_type, hour) — the exact sibling of
    the HLL sketch path (``sketches.approx_distinct_users``), the same
    pairing as mode-vs-CMS.

    Scale shape: per-batch Arrow group_by dedupes (type, hour, user)
    triples BEFORE the shuffle, one native groupby-Count over unique
    triples (the only full exchange, moving unique triples not events),
    then a tiny partial+global count per window."""
    from ray.data.aggregate import Count

    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["ts", "event_type", "user_id"])

    def prep(batch: pa.Table) -> pa.Table:
        hour = pc.divide(batch["ts"].cast(pa.int64()), pa.scalar(HOUR_US, pa.int64()))
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "epoch_hour": pc.cast(hour, pa.int64()),
                "user_id": batch["user_id"],
            }
        )
        # map-side dedupe: unique triples only cross the exchange
        return t.group_by(["event_type", "epoch_hour", "user_id"]).aggregate([])

    uniq = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "epoch_hour", "user_id"])
        .aggregate(Count())
    )

    def one(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "epoch_hour": batch["epoch_hour"],
                "n_users": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        uniq.map_batches(one, batch_format="pyarrow"),
        ["event_type", "epoch_hour"],
        ["n_users"],
    )


def events_value_histogram(sf_dir: str, bin_cents: int = 500):
    """Fixed-width value histogram: (bin, n) with bin = cents // bin_cents.
    Pure map + partial/global count — the shuffle moves one row per
    (block, bin), never events."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                # trunc-div: cents can be negative (refunds); DuckDB's //
                # truncates toward zero where numpy floors
                "bin": pa.array(trunc_div_np(cents, bin_cents), pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["bin"], ["n"]
    )


_SESSION_ID_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("session_seq", pa.int64())]
)


def session_ids(sf_dir: str):
    """Per-event session index: (event_id, session_seq) where session_seq
    is the 1-based index of the event's session within its user's history
    (30-min gap rule, ordered by (ts, event_id)) — the row-grain companion
    of ``sessionize``'s per-user summary.  Same coarse partition, same
    vectorized kernel shape (global cumsum minus per-user base)."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gaps = np.diff(ts_us, prepend=ts_us[0])
        new_session = new_user | (gaps > SESSION_GAP_S * 1_000_000)
        sid = np.cumsum(new_session)  # global 1-based session id
        starts = np.nonzero(new_user)[0]
        per_user_len = np.diff(np.append(starts, n))
        base = np.repeat(sid[starts], per_user_len)  # user's first sid
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "session_seq": (sid - base + 1).astype(np.int64),
            }
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _SESSION_ID_SCHEMA,
    )


def running_total(sf_dir: str):
    """Per-user running sum of value (exact cents), ordered by (ts,
    event_id): one row per event with its cumulative total.  Same coarse
    partition + vectorized kernel as ``sessionize`` (global cumsum minus a
    per-user base, no per-user Python call)."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        cents = cents_np(g["value"].to_numpy())
        cum = np.cumsum(cents)
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new_user)[0]
        base = np.where(starts > 0, cum[starts - 1], 0)
        per_user_len = np.diff(np.append(starts, len(g)))
        running = cum - np.repeat(base, per_user_len)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "running_cents": running,
            }
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _RUNNING_SCHEMA,
    )


def props_json_extract(sf_dir: str):
    """JSON extraction from the props column: k value per event (int, -1
    when absent).  One vectorized Arrow RE2 pass — the SAME regex the
    DuckDB oracle runs (``regexp_extract(props, '"k":\\s*(-?\\d+)')``), so
    engine and oracle share extraction semantics exactly."""
    ds = _read_events(sf_dir, ["event_id", "props"])

    def ext(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(
            pc.fill_null(batch["props"], ""), r'"k":\s*(?P<k>-?\d+)'
        )
        ks = pc.fill_null(pc.cast(pc.struct_field(m, "k"), pa.int64()), -1)
        return pa.table({"event_id": batch["event_id"], "k": ks})

    return ds.map_batches(ext, batch_format="pyarrow")


HOP_US = 1_800_000_000  # 30-min hop, 1-hour (= 2 hops) window


def mode_value_by_type(sf_dir: str):
    """EXACT mode per event_type: the most frequent value_cents (ties ->
    smallest value) with its count — the exact sibling of the approximate
    CMS heavy-hitter path.

    Scale shape: per-batch partial (type, cents) counts -> one keyed
    groupby of partials (shuffle moves distinct pairs per block, not rows)
    -> per-block partial top-1 per type -> tiny final merge.  No per-group
    Python call anywhere; works at any type cardinality."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = cents_arrow(batch["value"])
        return pa.table(
            {
                "event_type": batch["event_type"],
                "mode_cents": cents,
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    counts = _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "mode_cents"],
        ["n"],
    )

    def block_top1(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["event_type", "n", "mode_cents"], ascending=[True, False, True]
        )
        t = df["event_type"].to_numpy()
        first = np.empty(len(df), dtype=bool)
        if len(df):
            first[0] = True
            first[1:] = t[1:] != t[:-1]
        return pa.Table.from_pandas(df[first], preserve_index=False)

    merged = (
        counts.map_batches(block_top1, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(
            lambda g: g.sort_values(
                ["n", "mode_cents"], ascending=[False, True]
            ).head(1),
            batch_format="pandas",
        )
    )
    return _ensure_schema(
        merged,
        pa.schema(
            [
                ("event_type", pa.string()),
                ("mode_cents", pa.int64()),
                ("n", pa.int64()),
            ]
        ),
    )


def hopping_1h_30m(sf_dir: str):
    """Hopping windows (1h length, 30m hop): each event lands in exactly two
    windows; the window assignment is derived inside map_batches (each event
    fans out to its two window keys), so the shuffle moves only
    (type, window, partial) rows — same pre-aggregate shape as tumbling."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        half = ts_us // HOP_US
        cents = (
            cents_arrow(batch["value"])
            .to_numpy(zero_copy_only=False)
        )
        types = batch["event_type"]
        # window starts (in hops): k and k-1 — duplicate each event row
        win = np.concatenate([half, half - 1])
        return pa.table(
            {
                "event_type": pa.chunked_array([types, types]).combine_chunks(),
                "win_start_half": pa.array(win, pa.int64()),
                "value_cents": pa.array(np.concatenate([cents, cents])),
                "n": pa.array(np.ones(2 * batch.num_rows, dtype=np.int64)),
            }
        )

    return _partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "win_start_half"],
        ["value_cents", "n"],
    )


def top_event_per_user(sf_dir: str):
    """Ranked-window op: per user, the single event with the highest value
    (ties -> lowest event_id).

    Per-batch PARTIAL argmax (the shuffle moves <= one row per user per
    batch, not all events), then the same coarse hash partition with a
    vectorized first-per-user pick — no per-user Python call."""
    ds = _read_events(sf_dir, ["user_id", "event_id", "value"])

    def _best_per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value_cents", "event_id"], ascending=[True, False, True]
        )
        u = df["user_id"].to_numpy()
        first = np.empty(len(df), dtype=bool)
        if len(df):
            first[0] = True
            first[1:] = u[1:] != u[:-1]
        return df[first]

    def prep(batch: pa.Table) -> pa.Table:
        cents = cents_arrow(batch["value"])
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "value_cents": cents,
            }
        )
        # partial selection: the global per-user argmax is the argmax of
        # per-batch argmaxes (max is associative; ties resolve identically
        # because event_id breaks them in both passes)
        return pa.Table.from_pandas(
            _best_per_user(t.to_pandas()), preserve_index=False
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return _best_per_user(g.drop(columns="__upart"))

    return _ensure_schema(
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(pick, batch_format="pandas"),
        _TOP_SCHEMA,
    )


def new_users_hourly(sf_dir: str):
    """New-user funnel: users whose FIRST event falls in each hour, plus
    the running cumulative — the growth-curve shape.

    Scale: per-user first-seen rides the native groupby ``Min`` (map-side
    combined — per-batch partials, never events, cross the exchange), the
    per-hour count is a second partial+global aggregate over one row per
    user, and the cumulative sum runs over the tiny hour table (one row per
    hour of corpus history — thousands at 100 TB, driver-safe)."""
    from ray.data.aggregate import Min

    from .core import partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"user_id": batch["user_id"], "ts_us": batch["ts"].cast(pa.int64())}
        )

    firsts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("ts_us"))
    )

    def hour_counts(batch: pa.Table) -> pa.Table:
        from .numeric import trunc_div_np

        ts = batch["min(ts_us)"].to_numpy(zero_copy_only=False)
        # trunc (not floor) division: matches DuckDB's // for pre-1970
        # (negative-epoch) timestamps, per the engine-wide convention
        u, c = np.unique(trunc_div_np(ts, HOUR_US), return_counts=True)
        return pa.table(
            {
                "epoch_hour": pa.array(u.astype(np.int64), pa.int64()),
                "n_new": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    hours = partial_then_global(
        firsts.map_batches(hour_counts, batch_format="pyarrow"),
        ["epoch_hour"],
        ["n_new"],
    ).to_pandas()
    if hours.empty:  # empty corpus: Ray drops columns from empty Datasets
        hours = pd.DataFrame({"epoch_hour": [], "n_new": []}, dtype=np.int64)
    hours = hours.sort_values("epoch_hour").reset_index(drop=True)
    return pa.table(
        {
            "epoch_hour": pa.array(hours["epoch_hour"].to_numpy(), pa.int64()),
            "n_new": pa.array(hours["n_new"].to_numpy(), pa.int64()),
            "cum_new": pa.array(
                np.cumsum(hours["n_new"].to_numpy()).astype(np.int64), pa.int64()
            ),
        }
    )


_FIRST_LAST_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("first_event_id", pa.int64()),
        ("first_value_cents", pa.int64()),
        ("last_event_id", pa.int64()),
        ("last_value_cents", pa.int64()),
    ]
)


def first_last_event_per_user(sf_dir: str):
    """FIRST_VALUE / LAST_VALUE per user by event time (ties: lowest
    event_id wins FIRST, highest event_id wins LAST — the (ts, event_id)
    lexicographic extremes) — the latest-snapshot / SCD compaction shape:
    one wide row per user with its earliest and latest event.

    Scale shape: per-batch PARTIAL endpoint pick (first and last are both
    associative under the (ts, event_id) lexicographic order, so the
    shuffle moves <= TWO candidate rows per user per batch, never events),
    then the coarse user-hash partition with one vectorized lexsort +
    run-boundary pick per partition."""
    ds = _read_events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def _endpoints(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_us", "event_id"], kind="mergesort")
        u = df["user_id"].to_numpy()
        n = len(df)
        first = np.empty(n, dtype=bool)
        last = np.empty(n, dtype=bool)
        if n:
            first[0] = True
            first[1:] = u[1:] != u[:-1]
            last[-1] = True
            last[:-1] = u[1:] != u[:-1]
        return df, first, last

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts_us": batch["ts"].cast(pa.int64()),
                "value_cents": cents_arrow(batch["value"]),
            }
        )
        df, first, last = _endpoints(t.to_pandas())
        return pa.Table.from_pandas(df[first | last], preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        df, first, last = _endpoints(g.drop(columns="__upart"))
        f, l = df[first], df[last]
        return pd.DataFrame(
            {
                "user_id": f["user_id"].to_numpy(),
                "first_event_id": f["event_id"].to_numpy(),
                "first_value_cents": f["value_cents"].to_numpy(),
                "last_event_id": l["event_id"].to_numpy(),
                "last_value_cents": l["value_cents"].to_numpy(),
            }
        )

    return _ensure_schema(
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(pick, batch_format="pandas"),
        _FIRST_LAST_SCHEMA,
    )


ASOF_REF_TYPE = "purchase"


def asof_last_purchase(sf_dir: str):
    """As-of join: for every event, the event_id of the same user's most
    recent ASOF_REF_TYPE event at-or-before its timestamp (-1 if none).

    Custom operator the Dataset API lacks: one coarse user-hash shuffle +
    a two-pointer sorted merge per user (events and reference stream of one
    user, both ts-sorted; vectorized searchsorted inside).  Partitioning
    assumption: one user's history fits in a worker — the same
    per-key-group bound every sessionization carries; salt by time range if
    a key outgrows it."""
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        # coarse partition; the two-pointer resolve is per user (tiny inner
        # loop over users, vectorized searchsorted inside)
        out_e, out_r = [], []
        for _, g in part.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            refs = g[g["event_type"] == ASOF_REF_TYPE]
            ref_ts = refs["ts"].to_numpy()
            ref_id = refs["event_id"].to_numpy()
            if ref_id.size == 0:  # user with no refs at all
                out = np.full(len(g), -1, dtype=np.int64)
            else:
                # last ref with ts <= event ts (searchsorted right - 1)
                pos = np.searchsorted(ref_ts, g["ts"].to_numpy(), side="right") - 1
                out = np.where(pos >= 0, ref_id[np.maximum(pos, 0)], -1)
            out_e.append(g["event_id"].to_numpy())
            out_r.append(out.astype(np.int64))
        return pd.DataFrame(
            {
                "event_id": (
                    np.concatenate(out_e) if out_e else np.empty(0, np.int64)
                ),
                "last_purchase_id": (
                    np.concatenate(out_r) if out_r else np.empty(0, np.int64)
                ),
            }
        )

    return _ensure_schema(
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: merge_part(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _ASOF_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Event-grain skew salting
#
# Every keyed window above assumes one user's history fits a worker.  When a
# hot key outgrows that bound, these salted variants split the key by time
# range: groupby((user_id, ts // bucket_us)) does the heavy per-chunk work in
# parallel, then a per-user pass over the TINY chunk summaries stitches the
# boundaries.  The stitch stage moves one row per (user, bucket), never
# events, so the per-worker bound drops from |user's events| to
# |bucket's events|.  Equality with the unsalted paths is pytest-gated on a
# hot-key fixture (tests/test_skew.py).
# ---------------------------------------------------------------------------

SALT_BUCKET_US = 6 * HOUR_US  # default time-range salt width


def _with_bucket(ds, bucket_us: int):
    def add(batch: pa.Table) -> pa.Table:
        b = pc.divide(batch["ts"].cast(pa.int64()), pa.scalar(bucket_us, pa.int64()))
        return batch.append_column("tbucket", pc.cast(b, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def sessionize_salted(sf_dir: str, bucket_us: int = SALT_BUCKET_US):
    """Sessionize with time-range salting; identical output to
    ``sessionize``.  Correctness of the stitch: only a bucket's FIRST and
    LAST sessions can merge across a boundary, so each (user, bucket) chunk
    summarizes to (n_sessions, first/last session endpoints+counts, interior
    max) and the per-user fold rebuilds exact counts for chain-merged
    sessions."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"])

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        """Vectorized chunk summaries for every (user, tbucket) in the
        partition: sort once, session ids via cumsum of break flags, all
        per-chunk fields via reduceat/fancy indexing — one Python call per
        coarse partition, not per user x bucket."""
        g = g.sort_values(["user_id", "tbucket", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        tb = g["tbucket"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(g)
        new_chunk = np.empty(n, dtype=bool)
        new_chunk[0] = True
        new_chunk[1:] = (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])
        gaps = np.diff(ts_us, prepend=ts_us[0])
        new_session = new_chunk | (gaps > SESSION_GAP_S * 1_000_000)
        sid = np.cumsum(new_session)  # 1-based over the partition
        counts = np.bincount(sid)[1:]  # events per session, 0-based by sid-1
        chunk_starts = np.nonzero(new_chunk)[0]
        chunk_ends = np.append(chunk_starts[1:], n) - 1
        first_sid = sid[chunk_starts]  # 1-based
        last_sid = sid[chunk_ends]
        n_sessions = last_sid - first_sid + 1
        # interior max: zero out each chunk's first and last session count,
        # then segment-max over the chunk's session range
        cc = counts.copy()
        cc[first_sid - 1] = 0
        cc[last_sid - 1] = 0
        seg_max = np.maximum.reduceat(cc, first_sid - 1)
        max_interior = np.where(n_sessions > 2, seg_max, 0)
        return pd.DataFrame(
            {
                "user_id": u[chunk_starts],
                "tbucket": tb[chunk_starts],
                "n_sessions": n_sessions.astype(np.int64),
                "first_start": ts_us[chunk_starts],
                "first_count": counts[first_sid - 1].astype(np.int64),
                "last_end": ts_us[chunk_ends],
                "last_count": counts[last_sid - 1].astype(np.int64),
                "max_interior": max_interior.astype(np.int64),
            }
        )

    chunks = (
        _with_bucket(ds, bucket_us)
        .map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(per_part, batch_format="pandas")
    )

    def stitch_part(part: pd.DataFrame) -> pd.DataFrame:
        """Per-user boundary fold over TINY chunk summaries, fully
        vectorized as a numpy segment fold (no per-user / per-row Python
        loop):

        - ``m[i]`` marks a boundary MERGE (same user, first_start within
          gap of the previous chunk's last_end);
        - total sessions per user = sum(n_sessions) - sum(m): every merge
          joins exactly two sessions;
        - the carried open-session size is a SEGMENTED CUMSUM of
          first_count — segments restart where a chunk is multi-session
          (open restarts from its last_count) or the boundary doesn't
          merge (restarts from first_count);
        - finalized session sizes feeding the per-user max: every chunk's
          max_interior, merged_first where the chunk is multi-session,
          and the open count wherever the chain CLOSES (next boundary
          non-merging, or end of user).

        Equality with the sequential fold is pinned by the salted-vs-
        unsalted hot-key tests (tests/test_skew.py) and the boundary
        property suite."""
        gap_us = SESSION_GAP_S * 1_000_000
        if not len(part):
            return pd.DataFrame(
                {
                    "user_id": np.empty(0, np.int64),
                    "n_sessions": np.empty(0, np.int64),
                    "max_session_events": np.empty(0, np.int64),
                }
            )
        part = part.sort_values(["user_id", "tbucket"])
        u = part["user_id"].to_numpy().astype(np.int64)
        k = part["n_sessions"].to_numpy().astype(np.int64)
        fs = part["first_start"].to_numpy().astype(np.int64)
        fc = part["first_count"].to_numpy().astype(np.int64)
        le = part["last_end"].to_numpy().astype(np.int64)
        lc = part["last_count"].to_numpy().astype(np.int64)
        mi = part["max_interior"].to_numpy().astype(np.int64)
        n = len(part)
        same_prev = np.zeros(n, dtype=bool)
        same_prev[1:] = u[1:] == u[:-1]
        prev_le = np.concatenate(([np.int64(0)], le[:-1]))
        m = same_prev & (fs - prev_le <= gap_us)
        start = (k >= 2) | ~m
        base = np.where(k >= 2, lc, fc)
        seg = np.cumsum(start) - 1  # start[0] is always True
        contrib = np.where(start, 0, fc)
        cs = np.cumsum(contrib)
        starts_idx = np.nonzero(start)[0]
        open_count = base[starts_idx][seg] + cs - cs[starts_idx][seg]
        prev_open = np.concatenate(([np.int64(0)], open_count[:-1]))
        merged_first = fc + np.where(m, prev_open, 0)
        close = np.ones(n, dtype=bool)
        close[:-1] = ~m[1:]
        codes, uids = pd.factorize(u)  # u sorted -> uids in user order
        total = np.zeros(len(uids), dtype=np.int64)
        np.add.at(total, codes, k - m.astype(np.int64))
        maxc = np.zeros(len(uids), dtype=np.int64)
        np.maximum.at(maxc, codes, mi)
        multi = k >= 2
        if multi.any():
            np.maximum.at(maxc, codes[multi], merged_first[multi])
        np.maximum.at(maxc, codes[close], open_count[close])
        return pd.DataFrame(
            {
                "user_id": np.asarray(uids, dtype=np.int64),
                "n_sessions": total,
                "max_session_events": maxc,
            }
        )

    return _ensure_schema(
        chunks.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: stitch_part(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _SESSION_SCHEMA,
    )


def asof_last_purchase_salted(sf_dir: str, bucket_us: int = SALT_BUCKET_US):
    """As-of join with time-range salting; identical output to
    ``asof_last_purchase``.  Each (user, bucket) chunk resolves locally
    against its own refs plus a carry-in: the ref id of the user's last
    reference bucket strictly below it.  Because ``__upart`` partitions by
    user hash, every user's chunk SUMMARIES (one row per user x ref-bucket,
    never events) are partition-local, so the per-user prefix scan runs
    inside the same coarse-partition kernel — nothing lands on the driver
    and the corpus is scanned once.  (On a partitioner that split one
    user's buckets across workers, the summary table would instead be
    joined back on (user_id, tbucket).)"""
    ds = _with_bucket(
        _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"]), bucket_us
    )

    def last_ref_part(part: pd.DataFrame) -> pd.DataFrame:
        """Vectorized last-reference per (user, bucket) for a whole coarse
        partition: filter refs, one sort, boundary mask — no per-chunk
        Python call."""
        refs = part[part["event_type"] == ASOF_REF_TYPE]
        if refs.empty:
            return pd.DataFrame(
                {
                    "user_id": np.empty(0, np.int64),
                    "tbucket": np.empty(0, np.int64),
                    "ref_id": np.empty(0, np.int64),
                }
            )
        refs = refs.sort_values(["user_id", "tbucket", "ts", "event_id"])
        u = refs["user_id"].to_numpy()
        tb = refs["tbucket"].to_numpy()
        last = np.empty(len(refs), dtype=bool)
        last[-1] = True
        last[:-1] = (u[1:] != u[:-1]) | (tb[1:] != tb[:-1])
        return pd.DataFrame(
            {
                "user_id": u[last].astype(np.int64),
                "tbucket": tb[last].astype(np.int64),
                "ref_id": refs["event_id"].to_numpy()[last].astype(np.int64),
            }
        )

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        # per user: sorted (ref buckets, ref ids) from the PARTITION-LOCAL
        # chunk summaries — carry-in for bucket b is the ref id of the
        # largest ref-bucket strictly below b (binary search, so sparse
        # bucket numbering costs nothing).  A partition with zero reference
        # events resolves every event to carry -1.
        ref_rows = last_ref_part(part)
        cmap: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for uid, grp in ref_rows.groupby("user_id", sort=False):
            grp = grp.sort_values("tbucket")
            cmap[int(uid)] = (
                grp["tbucket"].to_numpy(dtype=np.int64),
                grp["ref_id"].to_numpy(dtype=np.int64),
            )
        out_e, out_r = [], []
        for (uid, b), g in part.groupby(["user_id", "tbucket"], sort=False):
            carry_id = -1
            if uid in cmap:
                rb, ri = cmap[uid]
                idx = int(np.searchsorted(rb, int(b))) - 1
                if idx >= 0:
                    carry_id = int(ri[idx])
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            refs = g[g["event_type"] == ASOF_REF_TYPE]
            ref_ts = refs["ts"].to_numpy()
            ref_id = refs["event_id"].to_numpy()
            if ref_id.size == 0:  # bucket with no local refs: all carry-in
                out = np.full(len(g), carry_id, dtype=np.int64)
            else:
                pos = np.searchsorted(ref_ts, g["ts"].to_numpy(), side="right") - 1
                out = np.where(pos >= 0, ref_id[np.maximum(pos, 0)], carry_id)
            out_e.append(g["event_id"].to_numpy())
            out_r.append(out.astype(np.int64))
        return pd.DataFrame(
            {
                "event_id": (
                    np.concatenate(out_e) if out_e else np.empty(0, np.int64)
                ),
                "last_purchase_id": (
                    np.concatenate(out_r) if out_r else np.empty(0, np.int64)
                ),
            }
        )

    return _ensure_schema(
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: merge_part(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _ASOF_SCHEMA,
    )


RANGE_JOIN_WINDOW_US = 300_000_000  # 5 minutes


def _window_pairs(g: pd.DataFrame, refs: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (purchase, event) pair expansion for one sorted group:
    searchsorted window bounds per reference, then a flat arange-gather —
    no per-reference or per-pair Python loop."""
    ts = g["ts"].to_numpy()
    ids = g["event_id"].to_numpy()
    lo = np.searchsorted(ts, refs["ts"].to_numpy(), side="left")
    hi = np.searchsorted(
        ts,
        refs["ts"].to_numpy() + np.timedelta64(RANGE_JOIN_WINDOW_US, "us"),
        side="right",
    )
    lens = hi - lo
    tot = int(lens.sum())
    if not tot:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    flat = np.repeat(lo, lens) + np.arange(tot) - np.repeat(
        np.cumsum(lens) - lens, lens
    )
    out_p = np.repeat(refs["event_id"].to_numpy(), lens).astype(np.int64)
    out_e = ids[flat].astype(np.int64)
    keep = out_e != out_p  # a purchase never pairs with itself
    return out_p[keep], out_e[keep]


def range_join_after_purchase(sf_dir: str):
    """Range join: all (purchase, event) pairs of the same user where the
    event lands within 5 minutes AFTER the purchase (exclusive of the
    purchase row itself).

    Custom operator: per-user sorted sweep — for each reference row a
    searchsorted window [ts, ts+5m] over the user's events, pairs expanded
    with a flat vectorized gather — instead of the naive cross join.  One
    coarse user-hash shuffle; same partitioning assumption as the as-of
    join."""
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        out_p, out_e = [], []
        for _, g in part.groupby("user_id", sort=False):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            p, e = _window_pairs(g, g[g["event_type"] == ASOF_REF_TYPE])
            out_p.append(p)
            out_e.append(e)
        return pd.DataFrame(
            {
                "purchase_id": (
                    np.concatenate(out_p) if out_p else np.empty(0, np.int64)
                ),
                "event_id": (
                    np.concatenate(out_e) if out_e else np.empty(0, np.int64)
                ),
            }
        )

    return _ensure_schema(
        ds.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: merge_part(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _RANGE_SCHEMA,
    )


def range_join_after_purchase_salted(
    sf_dir: str, bucket_us: int = SALT_BUCKET_US
):
    """Range join with time-range salting; identical output to
    ``range_join_after_purchase``.  Boundary handling: a purchase near a
    bucket's end reaches up to RANGE_JOIN_WINDOW_US into the next bucket, so
    events within that margin of a bucket start are REPLICATED into the
    previous bucket as join targets only (``is_home`` false) — purchases
    anchor in their home bucket only, so each pair is emitted exactly once.
    Requires bucket_us > RANGE_JOIN_WINDOW_US."""
    if bucket_us <= RANGE_JOIN_WINDOW_US:
        raise ValueError("bucket_us must exceed the join window")

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def fan_out(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        home = ts_us // bucket_us
        near_start = (ts_us % bucket_us) < RANGE_JOIN_WINDOW_US
        rep = batch.filter(pa.array(near_start))
        out = pa.concat_tables(
            [
                batch.append_column("tbucket", pa.array(home, pa.int64()))
                .append_column(
                    "is_home", pa.array(np.ones(batch.num_rows, dtype=bool))
                ),
                rep.append_column(
                    "tbucket", pa.array(home[near_start] - 1, pa.int64())
                ).append_column(
                    "is_home", pa.array(np.zeros(rep.num_rows, dtype=bool))
                ),
            ]
        )
        return out

    fanned = ds.map_batches(fan_out, batch_format="pyarrow")

    def merge_part(part: pd.DataFrame) -> pd.DataFrame:
        out_p, out_e = [], []
        for _, g in part.groupby(["user_id", "tbucket"], sort=False):
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            p, e = _window_pairs(
                g, g[(g["event_type"] == ASOF_REF_TYPE) & g["is_home"]]
            )
            out_p.append(p)
            out_e.append(e)
        return pd.DataFrame(
            {
                "purchase_id": (
                    np.concatenate(out_p) if out_p else np.empty(0, np.int64)
                ),
                "event_id": (
                    np.concatenate(out_e) if out_e else np.empty(0, np.int64)
                ),
            }
        )

    return _ensure_schema(
        fanned.map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: merge_part(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _RANGE_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Row-grain window functions: lag diff + fixed-row moving aggregate
# ---------------------------------------------------------------------------

_LAG_SCHEMA = pa.schema(
    [("event_id", pa.int64()), ("user_id", pa.int64()), ("gap_us", pa.int64())]
)
_MOVAVG_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("win_sum_cents", pa.int64()),
        ("win_n", pa.int64()),
        ("win_avg_ppm", pa.int64()),
    ]
)


def lag_diff(sf_dir: str):
    """Per event: microseconds since the user's previous event (ordered by
    (ts, event_id)); -1 for the user's first event (the engine's sentinel
    convention — see ``asof_last_purchase``).  Same coarse user-hash
    partition + one vectorized diff per PARTITION as ``running_total``."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        tus = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = -1
        gap[1:] = np.where(u[1:] == u[:-1], tus[1:] - tus[:-1], -1)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "user_id": u, "gap_us": gap}
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _LAG_SCHEMA,
    )


MOVAVG_WINDOW = 3  # current row + 2 preceding


def moving_avg(sf_dir: str, window: int = MOVAVG_WINDOW):
    """Per event: exact sum/count/avg of value cents over the trailing
    ``window`` rows of the same user (ROWS window-frame semantics).  The
    frame sum is cumsum[i] - cumsum[start-1] with start clamped to the
    user's first row — one vectorized pass per partition, no per-row or
    per-user Python."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        n = len(g)
        u = g["user_id"].to_numpy()
        cents = cents_np(g["value"].to_numpy())
        cum = np.cumsum(cents)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new_user)[0]
        per_user_len = np.diff(np.append(starts, n))
        user_start = np.repeat(starts, per_user_len)  # each row's user start
        idx = np.arange(n, dtype=np.int64)
        frame_start = np.maximum(idx - (window - 1), user_start)
        base = np.where(frame_start > 0, cum[frame_start - 1], 0)
        win_sum = cum - base
        win_n = idx - frame_start + 1
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "win_sum_cents": win_sum,
                "win_n": win_n,
                # trunc-div toward zero (DuckDB //): exact for negative
                # frame sums too (refund values)
                "win_avg_ppm": trunc_div_np(win_sum * 10000, win_n),
            }
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _MOVAVG_SCHEMA,
    )


RANGE_SUM_WINDOW_US = 3_600_000_000  # 1 hour

_RANGE_SUM_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("win_sum_cents", pa.int64()),
        ("win_n", pa.int64()),
    ]
)


def range_sum_1h(sf_dir: str, window_us: int = RANGE_SUM_WINDOW_US):
    """Per event: exact sum/count of the same user's value cents over the
    trailing TIME interval ``[ts - window, ts]`` — RANGE window-frame
    semantics (peers with equal ts share one frame), the time-based sibling
    of ``moving_avg``'s ROWS frame.

    Kernel: one vectorized pass per coarse user-hash partition.  Rows sorted
    by (user, ts) are embedded into a single sorted int64 axis by offsetting
    each user's RELATIVE timestamps by a running segment offset (segment
    width = user's span + window + 2, so frames can never cross users); both
    frame edges are then two global ``searchsorted`` calls and the frame sum
    is a cumsum difference.  No per-user or per-row Python."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        n = len(g)
        u = g["user_id"].to_numpy()
        tus = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = cents_np(g["value"].to_numpy())
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new_user)[0]
        seg_len = np.diff(np.append(starts, n))
        user_start = np.repeat(starts, seg_len)
        base = tus - tus[user_start]  # per-user relative ts, >= 0
        ends = np.append(starts[1:], n) - 1
        spans = tus[ends] - tus[starts] + np.int64(window_us) + 2
        seg_off = np.repeat(np.cumsum(spans) - spans, seg_len)
        key = seg_off + base
        if n and key[-1] >= np.int64(2) ** 62:
            raise ValueError(
                "range_sum_1h: per-partition time-span embedding overflows "
                "int64 — shrink the partition (raise N_USER_PARTS)"
            )
        lo = np.searchsorted(key, seg_off + np.maximum(base - window_us, 0), "left")
        hi = np.searchsorted(key, key, "right")
        cum = np.cumsum(cents)
        win_sum = cum[hi - 1] - np.where(lo > 0, cum[lo - 1], 0)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "win_sum_cents": win_sum,
                "win_n": (hi - lo).astype(np.int64),
            }
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _RANGE_SUM_SCHEMA,
    )


_RETENTION_SCHEMA = pa.schema(
    [("epoch_hour", pa.int64()), ("n_retained", pa.int64())]
)


def user_retention_hourly(sf_dir: str):
    """Hour-over-hour cohort retention: for each hour h, how many users were
    active in BOTH h and h+1 — the self-join-on-derived-key shape of cohort
    analysis, decorrelated so no self-join ever runs.

    Scale shape: batches emit (user, hour) pairs deduped WITHIN the batch
    (map-side, so the exchange moves distinct pairs per block, never
    events); one coarse user-hash partition then holds every pair of a
    user, where a vectorized unique+diff finds consecutive-hour runs and
    emits (hour, count) partials; a tiny groupby sums them.  Equivalent to
    the SQL `p JOIN p ON same user AND b.h = a.h + 1` without materializing
    the join."""
    from ray.data.aggregate import Sum

    ds = _read_events(sf_dir, ["user_id", "ts"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def pair_dedup(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # trunc (not floor) division: DuckDB's `//` truncates toward zero,
        # which diverges from numpy for pre-1970 timestamps (engine-wide
        # convention, same as new_users_hourly).
        h = trunc_div_np(
            (
                batch["ts"]
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
            ).astype(np.int64),
            3_600_000_000,
        )
        uniq = np.unique(np.stack([u, h, batch["__upart"].to_numpy(zero_copy_only=False).astype(np.int64)], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(uniq[:, 0]),
                "epoch_hour": pa.array(uniq[:, 1]),
                "__upart": pa.array(uniq[:, 2]),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        uh = np.unique(
            np.stack(
                [g["user_id"].to_numpy(), g["epoch_hour"].to_numpy()], axis=1
            ),
            axis=0,
        )  # sorted by (user, hour)
        u, h = uh[:, 0], uh[:, 1]
        retained = (u[1:] == u[:-1]) & (h[1:] == h[:-1] + 1)
        hours = h[:-1][retained]
        if not len(hours):
            return pd.DataFrame({"epoch_hour": [], "n_retained": []}).astype(
                {"epoch_hour": np.int64, "n_retained": np.int64}
            )
        vals, counts = np.unique(hours, return_counts=True)
        return pd.DataFrame(
            {"epoch_hour": vals, "n_retained": counts.astype(np.int64)}
        )

    partials = (
        ds.map_batches(pair_dedup, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: per_part(g.drop(columns="__upart")), batch_format="pandas"
        )
    )
    agg = partials.groupby("epoch_hour").aggregate(
        Sum("n_retained", alias_name="n_retained")
    )
    return _ensure_schema(
        agg.map_batches(
            lambda b: b.select(["epoch_hour", "n_retained"]), batch_format="pyarrow"
        ),
        _RETENTION_SCHEMA,
    )


TOP_SESSIONS_K = 5

_TOP_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_seq", pa.int64()),
        ("session_cents", pa.int64()),
        ("n_events", pa.int64()),
        ("rank", pa.int64()),
    ]
)


def top_sessions_by_value(sf_dir: str, k: int = TOP_SESSIONS_K):
    """The k highest-value sessions corpus-wide (30-min gap rule), with the
    session's total cents, event count and global rank — sessionization
    COMPOSED with grouped top-k, all in the kernels that already exist:
    each coarse user-hash partition assigns session ids (the
    ``session_ids`` cumsum kernel), reduces events to per-session rows via
    ``reduceat`` at session starts, and emits only its LOCAL top-k (the
    global top-k is contained in the union of per-partition top-ks); one
    tiny merge ranks the <= k x partitions survivors."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = cents_np(g["value"].to_numpy())
        n = len(g)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gaps = np.diff(ts_us, prepend=ts_us[0])
        new_session = new_user | (gaps > SESSION_GAP_S * 1_000_000)
        sid = np.cumsum(new_session)
        s_starts = np.nonzero(new_session)[0]
        sums = np.add.reduceat(cents, s_starts)
        counts = np.diff(np.append(s_starts, n))
        u_starts = np.nonzero(new_user)[0]
        per_user_sessions = np.diff(
            np.append(np.searchsorted(s_starts, u_starts), len(s_starts))
        )
        base = np.repeat(sid[u_starts], per_user_sessions)
        out = pd.DataFrame(
            {
                "user_id": u[s_starts],
                "session_seq": (sid[s_starts] - base + 1).astype(np.int64),
                "session_cents": sums.astype(np.int64),
                "n_events": counts.astype(np.int64),
            }
        ).sort_values(
            ["session_cents", "user_id", "session_seq"],
            ascending=[False, True, True],
        )
        return out.head(k)

    partials = (
        ds.groupby("__upart")
        .map_groups(
            lambda g: per_part(g.drop(columns="__upart")), batch_format="pandas"
        )
        .map_batches(
            lambda b: b.append_column(
                "__g", pa.array(np.zeros(b.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["session_cents", "user_id", "session_seq"],
            ascending=[False, True, True],
        ).head(k)
        g = g.drop(columns="__g").reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return _ensure_schema(
        partials.groupby("__g").map_groups(final, batch_format="pandas"),
        _TOP_SESSION_SCHEMA,
    )


PRANK_CENTS_BUCKET = 4096  # coarse ranking-bucket width (cents)


def percent_rank_by_type(sf_dir: str):
    """Per-partition ``row_number()`` / ``percent_rank()`` over every
    event, partitioned by event_type and ordered by (value_cents,
    event_id) — the full grouped-window rank, emitted for EVERY row
    without a global (or even per-partition) row sort.

    Scale shape: the ``bucket_rank_offsets`` offset stitch (the
    ``pack_sequences_global`` pattern) — the ranking pass groups by
    (type, cents // PRANK_CENTS_BUCKET), a COARSE floor-divided bucket,
    and the ONLY thing the driver materializes is one (type, bucket,
    count) row per nonempty ranking partition.  Those partition totals
    are prefix-summed into exclusive rank starts per type and ride the
    task closure; each bucket kernel lexsorts its own rows by
    (cents, event_id) and adds its bucket's start — exact global
    row_number with no per-value state anywhere.  Partitioning
    assumption: no single cents bucket dominates (shrink
    PRANK_CENTS_BUCKET if one does; the driver dict scales as
    n_buckets, so the knob trades driver rows for kernel size).

    ``prank_ppm`` is exact integer: ``(rank - 1) * 10^6 // (n_type - 1)``
    (0 for single-row partitions, matching SQL PERCENT_RANK)."""
    from .core import bucket_rank_offsets as _bucket_rank_offsets
    from .core import partial_then_global as _partial_then_global

    def bucket_counts(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        vc = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        # floor division (numpy //), NOT trunc: floor is monotone over
        # negative cents so bucket order == value order
        df = pd.DataFrame(
            {"event_type": t, "bucket": vc // PRANK_CENTS_BUCKET}
        )
        g = df.groupby(["event_type", "bucket"], sort=False).size()
        out = g.rename("cnt").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("bucket", pa.int64()),
                    ("cnt", pa.int64()),
                ]
            )
        )

    offsets, totals = _bucket_rank_offsets(
        _partial_then_global(
            _read_events(sf_dir, ["event_type", "value"]).map_batches(
                bucket_counts, batch_format="pyarrow"
            ),
            ["event_type", "bucket"],
            ["cnt"],
        ),
        ["event_type"],
        "bucket",
    )

    _out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value_cents", pa.int64()),
            ("rank", pa.int64()),
            ("prank_ppm", pa.int64()),
        ]
    )
    if not offsets:
        return _out_schema.empty_table()

    def prep(batch: pa.Table) -> pa.Table:
        vc = cents_arrow(batch["value"])
        bucket = vc.to_numpy(zero_copy_only=False) // PRANK_CENTS_BUCKET
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
                "value_cents": vc,
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g["event_type"].iloc[0]
        vc = g["value_cents"].to_numpy(dtype=np.int64)
        eid = g["event_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((eid, vc))
        vc_s, eid_s = vc[order], eid[order]
        # global rank == bucket's exclusive start + local (cents, eid) order
        base = offsets[(t, int(g["bucket"].iloc[0]))]
        rank = base + np.arange(1, len(g) + 1, dtype=np.int64)
        n_t = totals[(t,)]
        prank = (
            (rank - 1) * np.int64(1_000_000) // (n_t - 1)
            if n_t > 1
            else np.zeros(len(g), dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "event_id": eid_s,
                "event_type": t,
                "value_cents": vc_s,
                "rank": rank,
                "prank_ppm": prank,
            }
        )

    return _ensure_schema(
        _read_events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .map_groups(rank_bucket, batch_format="pandas"),
        _out_schema,
    )


def cume_dist_by_type(sf_dir: str):
    """Per-partition ``cume_dist()`` over every event (rows-with-value-<=
    -mine / partition size, ties sharing the count through the LAST tie)
    — completes the no-sort ranking family (row_number / percent_rank /
    dense_rank / ntile / cume_dist) on the same machinery.

    Scale shape: identical to ``percent_rank_by_type`` — ROW-count
    bucket offsets via the ``bucket_rank_offsets`` stitch; each bucket
    kernel sorts its own cents, takes the last-occurrence position of
    each tie group (``np.searchsorted(..., side="right")``), and adds
    its bucket's exclusive start.  ``cume_ppm`` is exact integer:
    ``cum_le * 10^6 // n_type`` (matches SQL
    ``COUNT(*) OVER (... ORDER BY value_cents)`` RANGE-frame tie
    semantics, scaled and floor-divided)."""
    from .core import bucket_rank_offsets as _bucket_rank_offsets
    from .core import partial_then_global as _partial_then_global

    def bucket_counts(batch: pa.Table) -> pa.Table:
        t = batch["event_type"].to_numpy(zero_copy_only=False)
        vc = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": t, "bucket": vc // PRANK_CENTS_BUCKET})
        g = df.groupby(["event_type", "bucket"], sort=False).size()
        out = g.rename("cnt").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_type", pa.string()),
                    ("bucket", pa.int64()),
                    ("cnt", pa.int64()),
                ]
            )
        )

    offsets, totals = _bucket_rank_offsets(
        _partial_then_global(
            _read_events(sf_dir, ["event_type", "value"]).map_batches(
                bucket_counts, batch_format="pyarrow"
            ),
            ["event_type", "bucket"],
            ["cnt"],
        ),
        ["event_type"],
        "bucket",
    )

    _out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value_cents", pa.int64()),
            ("cume_ppm", pa.int64()),
        ]
    )
    if not offsets:
        return _out_schema.empty_table()

    def prep(batch: pa.Table) -> pa.Table:
        vc = cents_arrow(batch["value"])
        bucket = vc.to_numpy(zero_copy_only=False) // PRANK_CENTS_BUCKET
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
                "value_cents": vc,
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g["event_type"].iloc[0]
        vc = g["value_cents"].to_numpy(dtype=np.int64)
        base = offsets[(t, int(g["bucket"].iloc[0]))]
        vs = np.sort(vc)
        # rows <= my value within the bucket == last-tie position + 1
        cum_le = base + np.searchsorted(vs, vc, side="right")
        n_t = totals[(t,)]
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "event_type": t,
                "value_cents": vc,
                "cume_ppm": cum_le * np.int64(1_000_000) // n_t,
            }
        )

    return _ensure_schema(
        _read_events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .map_groups(rank_bucket, batch_format="pandas"),
        _out_schema,
    )


def dense_rank_by_type(sf_dir: str):
    """Per-partition ``dense_rank()`` over every event, partitioned by
    event_type and ordered by value_cents — ties share a rank and ranks
    stay consecutive, so the offsets must count DISTINCT values, not
    rows.

    Scale shape: two stages of the ``percent_rank_by_type`` pattern with
    a distinct-counting front.  (1) per-batch Arrow group_by dedupes
    (type, bucket, cents) triples BEFORE the shuffle, one native groupby
    over unique triples (the exchange moves distinct values, never
    events), then partial+global collapses to one (type, bucket,
    n_distinct) row per nonempty bucket — the ONLY thing the driver
    materializes (``bucket_rank_offsets``, partition-count-sized).
    (2) the ranking pass groups rows by the same floor-divided bucket;
    each kernel takes ``np.unique`` of its own cents and adds its
    bucket's exclusive distinct-count start — exact global dense rank
    with no per-value state anywhere."""
    from ray.data.aggregate import Count

    from .core import bucket_rank_offsets as _bucket_rank_offsets
    from .core import partial_then_global as _partial_then_global

    def triples(batch: pa.Table) -> pa.Table:
        vc = cents_arrow(batch["value"])
        bucket = vc.to_numpy(zero_copy_only=False) // PRANK_CENTS_BUCKET
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "bucket": pa.array(bucket, pa.int64()),
                "value_cents": vc,
            }
        )
        # map-side dedupe: unique (type, bucket, cents) only cross the wire
        return t.group_by(["event_type", "bucket", "value_cents"]).aggregate([])

    uniq = (
        _read_events(sf_dir, ["event_type", "value"])
        .map_batches(triples, batch_format="pyarrow")
        .groupby(["event_type", "bucket", "value_cents"])
        .aggregate(Count())
    )

    def one(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "bucket": batch["bucket"],
                "cnt": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    offsets, _totals = _bucket_rank_offsets(
        _partial_then_global(
            uniq.map_batches(one, batch_format="pyarrow"),
            ["event_type", "bucket"],
            ["cnt"],
        ),
        ["event_type"],
        "bucket",
    )

    _out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value_cents", pa.int64()),
            ("drank", pa.int64()),
        ]
    )
    if not offsets:
        return _out_schema.empty_table()

    def prep(batch: pa.Table) -> pa.Table:
        vc = cents_arrow(batch["value"])
        bucket = vc.to_numpy(zero_copy_only=False) // PRANK_CENTS_BUCKET
        return pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
                "value_cents": vc,
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g["event_type"].iloc[0]
        vc = g["value_cents"].to_numpy(dtype=np.int64)
        base = offsets[(t, int(g["bucket"].iloc[0]))]
        # dense rank inside the bucket: position among the bucket's
        # DISTINCT sorted cents (+1), shifted by the lower buckets'
        # distinct-value count
        _, inv = np.unique(vc, return_inverse=True)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(dtype=np.int64),
                "event_type": t,
                "value_cents": vc,
                "drank": base + inv.astype(np.int64) + 1,
            }
        )

    return _ensure_schema(
        _read_events(sf_dir, ["event_id", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "bucket"])
        .map_groups(rank_bucket, batch_format="pandas"),
        _out_schema,
    )


# ---------------------------------------------------------------------------
# Ordered funnel conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_counts(sf_dir: str):
    """Ordered-funnel conversion: how many users performed step 1, step 2
    at-or-after their step-1 conversion time, and step 3 at-or-after their
    step-2 conversion time (first-touch semantics: each step's conversion
    time is the EARLIEST qualifying event).  The product-analytics shape a
    sequential-pattern engine must support; a click before any view does
    NOT count.

    Scale shape: the scan keeps only funnel-step rows projected to 17
    bytes (user, ts, step), then ONE coarse user-hash exchange
    (``_add_user_part``) — the sequential dependency between steps only
    needs all events of a user co-located, never a global sort.  Inside a
    partition the per-user conversion times fall out of three vectorized
    grouped-min passes (``np.minimum.at`` over factorized user codes); each
    partition emits a single 3-counter partial row and the driver folds
    <= WINDOW_PARTITIONS of them into the final typed 3-row table (a
    driver-bounded result, so it returns ``pa.Table`` — empty-Dataset
    schema-loss contract)."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"])

    _step_arr = pa.array(list(FUNNEL_STEPS), pa.string())

    def prep(b: pa.Table) -> pa.Table:
        step = pc.index_in(b["event_type"], value_set=_step_arr)
        keep = pc.is_valid(step)
        b = b.filter(keep)
        return pa.table(
            {
                "user_id": b["user_id"],
                "ts_us": b["ts"].cast(pa.int64()),
                "step": pc.cast(step.filter(keep), pa.int64()),
            }
        )

    _INF = np.int64(2**62)

    def part_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        st = g["step"].to_numpy()
        _, inv = np.unique(u, return_inverse=True)
        n_u = int(inv.max()) + 1 if len(inv) else 0
        t_prev = None
        counts = []
        for k in range(len(FUNNEL_STEPS)):
            tk = np.full(n_u, _INF)
            m = st == k
            if t_prev is None:
                np.minimum.at(tk, inv[m], ts[m])
            else:
                # step k counts only at-or-after the user's step k-1 time;
                # t_prev is final (all of a user's rows are in this group)
                ok = ts[m] >= t_prev[inv[m]]
                np.minimum.at(tk, inv[m][ok], ts[m][ok])
            counts.append(int((tk < _INF).sum()))
            t_prev = tk
        return pd.DataFrame(
            {f"n_step{k + 1}": [counts[k]] for k in range(len(FUNNEL_STEPS))}
        )

    partials = (
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(_add_user_part, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(part_counts, batch_format="pandas")
        .take_all()
    )
    totals = [
        sum(r[f"n_step{k + 1}"] for r in partials)
        for k in range(len(FUNNEL_STEPS))
    ]
    return pa.table(
        {
            "step_idx": pa.array(
                list(range(1, len(FUNNEL_STEPS) + 1)), pa.int64()
            ),
            "step": pa.array(list(FUNNEL_STEPS), pa.string()),
            "n_users": pa.array(totals, pa.int64()),
        }
    )


_NULL_TYPE_SENTINEL = "\x00null"

_TRANSITION_SCHEMA = pa.schema(
    [("prev_type", pa.string()), ("event_type", pa.string()), ("n", pa.int64())]
)


def transition_counts(sf_dir: str):
    """Markov-edge mining over user event sequences: global counts of
    consecutive (prev_type -> event_type) transitions, each user's events
    ordered by (ts, event_id); a user's first event has no predecessor
    and contributes nothing.

    Scale shape: the coarse user-hash exchange every exact per-user
    window uses (all of a user's rows in one partition); inside each
    partition ONE vectorized sort + shifted same-user mask builds the
    pairs and a C-level pandas groupby collapses them to per-partition
    (prev, cur, n) partials — the final exchange moves at most
    |type alphabet|^2 rows per partition, never events."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        # oracle contract: WHERE prev_type IS NOT NULL drops NULL-prev
        # pairs, but a NULL CURRENT type is kept as a GROUP BY key
        keep = (u[1:] == u[:-1]) & pd.notna(et[:-1])
        pairs = pd.DataFrame(
            {"prev_type": et[:-1][keep], "event_type": et[1:][keep]}
        )
        out = (
            pairs.groupby(["prev_type", "event_type"], sort=False, dropna=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        # Ray 2.49's sort-based groupby cannot shuffle a None key: a NULL
        # current type (kept by SQL GROUP BY) rides the exchange as a
        # sentinel and is decoded after take_all ("\x00" cannot occur in
        # a real event type)
        out["event_type"] = out["event_type"].where(
            out["event_type"].notna(), _NULL_TYPE_SENTINEL
        )
        return out

    agg = _partial_then_global(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        ["prev_type", "event_type"],
        ["n"],
    )
    # the result is driver-bounded (<= |type alphabet|^2 rows) and can be
    # legitimately EMPTY from non-empty input (every user has one event);
    # an all-empty Dataset loses its schema in to_pandas/take_all, so the
    # bounded result is returned as a typed pa.Table (CLAUDE.md invariant)
    rows = agg.take_all()
    for r in rows:
        if r["event_type"] == _NULL_TYPE_SENTINEL:
            r["event_type"] = None
    rows.sort(key=lambda r: (r["prev_type"],
                             r["event_type"] is None, r["event_type"] or ""))
    return pa.Table.from_pylist(rows, schema=_TRANSITION_SCHEMA)


# ---------------------------------------------------------------------------
# Gaps-and-islands + interval coverage (the two classic contiguity shapes)

_STREAKS_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_streaks", pa.int64()),
        ("max_streak_hours", pa.int64()),
        ("active_hours", pa.int64()),
    ]
)


def user_hour_streaks(sf_dir: str):
    """Gaps-and-islands: maximal runs of CONSECUTIVE active hours per user
    (an hour is active if the user has >= 1 event in it) — the classic
    engagement-streak shape (SQL: h - ROW_NUMBER() island trick).

    Scale shape: per-batch dedup to distinct (user, hour) pairs — only
    those pairs cross the exchange, never events (at 100 TB the pair count
    is bounded by users x corpus hours, orders below the event count) —
    then the coarse user-hash partition with ONE vectorized run-length
    kernel per partition: lexsort, cross-batch dedup mask, boundary diff,
    bincount/reduceat segment folds.  No per-user Python loop."""
    ds = _read_events(sf_dir, ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        h = trunc_div_np(
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False), HOUR_US
        )
        order = np.lexsort((h, u))
        u, h = u[order], h[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        t = pa.table(
            {
                "user_id": pa.array(u[keep], pa.int64()),
                "hour": pa.array(h[keep], pa.int64()),
            }
        )
        return _add_user_part(t)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user_id"].to_numpy()
        h = g["hour"].to_numpy()
        order = np.lexsort((h, u))
        u, h = u[order], h[order]
        # cross-batch dedup (prep deduped within batch only)
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (h[1:] != h[:-1])
        u, h = u[keep], h[keep]
        if len(u) == 0:
            return pd.DataFrame(
                {c: np.empty(0, np.int64) for c in _STREAKS_SCHEMA.names}
            )
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (h[1:] - h[:-1] != 1)
        sid = np.cumsum(brk) - 1
        lens = np.bincount(sid).astype(np.int64)
        streak_user = u[brk]
        nu = np.ones(len(streak_user), dtype=bool)
        nu[1:] = streak_user[1:] != streak_user[:-1]
        uid = np.cumsum(nu) - 1
        return pd.DataFrame(
            {
                "user_id": streak_user[nu],
                "n_streaks": np.bincount(uid).astype(np.int64),
                "max_streak_hours": np.maximum.reduceat(
                    lens, np.flatnonzero(nu)
                ).astype(np.int64),
                # exact int64 segment sum (bincount's float64 weights would
                # lose exactness past 2^53)
                "active_hours": np.add.reduceat(lens, np.flatnonzero(nu)).astype(
                    np.int64
                ),
            }
        )

    return _ensure_schema(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: kern(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _STREAKS_SCHEMA,
    )


_COVERAGE_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_intervals", pa.int64()),
        ("covered_us", pa.int64()),
    ]
)


def _merge_intervals(u: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Merge overlapping-or-touching [s, e] intervals per user; inputs in
    any order, outputs sorted by (user, start).  Segmented cummax/shift via
    pandas' compiled groupby kernels — no per-user Python loop.  Touching
    intervals (s == prev_max) merge, matching the oracle's ``s > pmax``
    new-group test."""
    order = np.lexsort((e, s, u))
    u, s, e = u[order], s[order], e[order]
    df = pd.DataFrame({"u": u, "s": s, "e": e})
    grp = df.groupby("u", sort=False)
    pmax = grp["e"].cummax().groupby(df["u"], sort=False).shift(1)
    brk = pmax.isna().to_numpy() | (s > pmax.fillna(np.iinfo(np.int64).min).to_numpy())
    mu = u[brk]
    ms = s[brk]  # group min(s): first row of each group (sorted by s)
    me = np.maximum.reduceat(e, np.flatnonzero(brk)).astype(np.int64)
    return mu, ms, me


def user_coverage_intervals(sf_dir: str):
    """Interval union / coverage: each event occupies
    [ts, ts + value seconds] (value in exact integer cents -> duration
    cents * 10_000 us); overlapping-or-touching intervals per user merge,
    and the result is one row per user with the merged-interval count and
    the total covered microseconds — the classic utilization / uptime
    shape (SQL: cumulative-MAX window + island sum).

    Scale shape: interval union is associative, so each batch pre-merges
    its own intervals (vectorized) and ONLY merged sub-intervals cross the
    exchange; the coarse user-hash partition then runs the same compiled
    merge kernel once per partition and folds per-user counts with
    bincount.  No per-user Python loop anywhere."""
    ds = _read_events(sf_dir, ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        s = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dur = cents_arrow(batch["value"]).to_numpy(zero_copy_only=False) * 10_000
        mu, ms, me = _merge_intervals(u, s, s + dur)
        t = pa.table(
            {
                "user_id": pa.array(mu, pa.int64()),
                "s": pa.array(ms, pa.int64()),
                "e": pa.array(me, pa.int64()),
            }
        )
        return _add_user_part(t)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        mu, ms, me = _merge_intervals(
            g["user_id"].to_numpy(), g["s"].to_numpy(), g["e"].to_numpy()
        )
        if len(mu) == 0:
            return pd.DataFrame(
                {c: np.empty(0, np.int64) for c in _COVERAGE_SCHEMA.names}
            )
        nu = np.ones(len(mu), dtype=bool)
        nu[1:] = mu[1:] != mu[:-1]
        uid = np.cumsum(nu) - 1
        return pd.DataFrame(
            {
                "user_id": mu[nu],
                "n_intervals": np.bincount(uid).astype(np.int64),
                # exact int64 segment sum (no float64 weights)
                "covered_us": np.add.reduceat(me - ms, np.flatnonzero(nu)).astype(
                    np.int64
                ),
            }
        )

    return _ensure_schema(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__upart")
        .map_groups(
            lambda g: kern(g.drop(columns="__upart")), batch_format="pandas"
        ),
        _COVERAGE_SCHEMA,
    )


_MISSING_HOURS_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("epoch_hour", pa.int64())]
)


def missing_hours_by_type(sf_dir: str):
    """Calendar-spine anti-join (gap detection): for every event type, the
    hours inside the corpus' global [min_hour, max_hour] span in which that
    type logged ZERO events — the monitoring/SLA "silent sensor" shape
    (SQL: generate_series spine CROSS JOIN types LEFT JOIN ... IS NULL).

    Scale shape: per-batch dedup to distinct (type, hour) pairs, one tiny
    partial+global exchange over those pairs, and the spine subtraction
    runs on the DRIVER-BOUNDED present-pair table (|type alphabet| x
    corpus hours — a few-year corpus is ~1e5 hours x a small alphabet,
    driver-safe; the result is returned as a typed pa.Table per the
    empty-schema invariant)."""
    from .core import partial_then_global

    ds = _read_events(sf_dir, ["event_type", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        h = trunc_div_np(
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False), HOUR_US
        )
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "epoch_hour": h,
            }
        ).drop_duplicates()
        return pa.table(
            {
                "event_type": pa.array(df["event_type"], pa.string()),
                "epoch_hour": pa.array(
                    df["epoch_hour"].to_numpy(), pa.int64()
                ),
                "n": pa.array(np.ones(len(df), dtype=np.int64)),
            }
        )

    present = partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "epoch_hour"],
        ["n"],
    ).take_all()
    if not present:
        return _MISSING_HOURS_SCHEMA.empty_table()
    hours = np.fromiter((r["epoch_hour"] for r in present), np.int64, len(present))
    types = np.array([r["event_type"] for r in present])
    lo, hi = hours.min(), hours.max()
    span = np.arange(lo, hi + 1, dtype=np.int64)
    out_t, out_h = [], []
    for t in np.unique(types):
        missing = np.setdiff1d(span, hours[types == t], assume_unique=False)
        out_t.append(np.full(len(missing), t))
        out_h.append(missing)
    return pa.table(
        {
            "event_type": pa.array(np.concatenate(out_t), pa.string()),
            "epoch_hour": pa.array(np.concatenate(out_h), pa.int64()),
        }
    ).sort_by([("event_type", "ascending"), ("epoch_hour", "ascending")])


DAY_US = 86_400_000_000
ROLL_DAYS = 7

_ROLLING_USERS_SCHEMA = pa.schema([("day", pa.int64()), ("n_users", pa.int64())])


def rolling_7d_users(sf_dir: str):
    """Trailing 7-day distinct active users per day (rolling WAU) — the
    sliding-window COUNT DISTINCT shape no plain groupby expresses: each
    output day counts users seen on ANY of the 7 calendar days ending
    there (partial windows at the corpus start count as-is; days past the
    corpus end are clipped).

    Scale shape: per-batch dedup to distinct (user_id, day) pairs -> ONE
    pair-grain partial+global exchange (the row-proportional one,
    map-side combined); the deduped pair table is materialized (narrow:
    16 B/row, |users| x |active days| — distributed, never on the
    driver) so the max-day probe doesn't recompute the scan; each pair
    then fans out to <= ROLL_DAYS (user_id, window day) rows -> a second
    pair-grain distinct exchange (<= 7x the first) -> per-day count
    partials.  The result is span-bounded (one row per calendar day) and
    returned typed per the empty-schema invariant."""
    from .core import partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts"])

    def prep(batch: pa.Table) -> pa.Table:
        d = trunc_div_np(
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False), DAY_US
        )
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "day": d,
            }
        ).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(df["day"].to_numpy(), pa.int64()),
                "n": pa.array(np.ones(len(df), dtype=np.int64)),
            }
        )

    pairs = partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["user_id", "day"], ["n"]
    ).materialize()
    if pairs.count() == 0:
        return _ROLLING_USERS_SCHEMA.empty_table()
    hi_day = int(pairs.max("day"))

    def expand(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        d = batch["day"].to_numpy(zero_copy_only=False)
        wu = np.repeat(u, ROLL_DAYS)
        wd = np.repeat(d, ROLL_DAYS) + np.tile(
            np.arange(ROLL_DAYS, dtype=np.int64), len(d)
        )
        keep = wd <= hi_day
        df = pd.DataFrame({"user_id": wu[keep], "day": wd[keep]}).drop_duplicates()
        return pa.table(
            {
                "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
                "day": pa.array(df["day"].to_numpy(), pa.int64()),
                "n": pa.array(np.ones(len(df), dtype=np.int64)),
            }
        )

    win_pairs = partial_then_global(
        pairs.map_batches(expand, batch_format="pyarrow"),
        ["user_id", "day"],
        ["n"],
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": batch["day"],
                "n_users": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    counts = partial_then_global(
        win_pairs.map_batches(count_partial, batch_format="pyarrow"),
        ["day"],
        ["n_users"],
    )
    rows = sorted(counts.take_all(), key=lambda r: r["day"])
    return pa.table(
        {
            "day": pa.array([r["day"] for r in rows], pa.int64()),
            "n_users": pa.array([r["n_users"] for r in rows], pa.int64()),
        }
    )


_OVERLAP_BUCKETS = 64
_OVERLAP_SIZE_TAG = "\x00size"  # cannot collide with a real event type

_AUDIENCE_OVERLAP_SCHEMA = pa.schema(
    [
        ("type_a", pa.string()),
        ("type_b", pa.string()),
        ("inter", pa.int64()),
        ("uni", pa.int64()),
        ("jaccard_ppm", pa.int64()),
    ]
)


def audience_overlap(sf_dir: str):
    """Pairwise Jaccard similarity between the distinct-USER audiences of
    every two event types — the audience-overlap matrix a product analyst
    reads to spot feature cannibalisation (SQL: self-join of the distinct
    (type, user) table).

    Scale shape: ONE row-proportional exchange (the source_token_jaccard
    inverted-index pattern over an int key, functions/text.py): per-batch
    distinct (type, user) pairs hash-bucket by user, every copy of a user
    lands in one bucket, so the bucket kernel global-dedups for free,
    emits the bucket's slice of per-type audience sizes (sentinel-tagged
    rows riding the pair schema), and fans each user out to its
    |types| choose 2 co-occurring pairs — vectorized via one lexsort +
    per-segment-size triu broadcast, bounded by the type alphabet, never
    all-pairs over users.  The final groupby is alphabet^2-bounded and
    the result is returned typed.  ``jaccard_ppm`` is exact integer
    ``inter * 10^6 // union`` (non-negative: floor == trunc)."""
    from .core import coarse_int_partition, partial_then_global

    ds = _read_events(sf_dir, ["event_type", "user_id"])

    _pair_schema = pa.schema(
        [
            ("__b", pa.int64()),
            ("event_type", pa.string()),
            ("user_id", pa.int64()),
        ]
    )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_numpy(zero_copy_only=False),
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df.insert(
            0,
            "__b",
            coarse_int_partition(
                df["user_id"].to_numpy(np.int64), _OVERLAP_BUCKETS
            ),
        )
        return pa.Table.from_pandas(df, preserve_index=False).cast(_pair_schema)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["event_type", "user_id"])
        typ = g["event_type"].to_numpy()
        usr = g["user_id"].to_numpy()
        size_counts = pd.Series(typ).value_counts()
        sizes_df = pd.DataFrame(
            {
                "type_a": np.full(
                    len(size_counts), _OVERLAP_SIZE_TAG, dtype=object
                ),
                "type_b": size_counts.index.to_numpy(dtype=object),
                "inter": size_counts.to_numpy(dtype=np.int64),
            }
        )
        order = np.lexsort((typ, usr))
        typ, usr = typ[order], usr[order]
        _, starts, counts = np.unique(usr, return_index=True, return_counts=True)
        out_a, out_b = [], []
        for s in np.unique(counts):
            if s < 2:
                continue
            ia, ib = np.triu_indices(int(s), 1)
            st = starts[counts == s]
            out_a.append(typ[(st[:, None] + ia[None, :]).ravel()])
            out_b.append(typ[(st[:, None] + ib[None, :]).ravel()])
        if not out_a:
            return sizes_df
        df = pd.DataFrame(
            {
                "type_a": np.concatenate(out_a),
                "type_b": np.concatenate(out_b),
            }
        )
        pairs_df = (
            df.groupby(["type_a", "type_b"], sort=False)
            .size()
            .rename("inter")
            .reset_index()
        )
        return pd.concat([sizes_df, pairs_df], ignore_index=True)

    agg = partial_then_global(
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(
            lambda g: bucket_pairs(g.drop(columns="__b")),
            batch_format="pandas",
        ),
        ["type_a", "type_b"],
        ["inter"],
    )
    sizes: dict[str, int] = {}
    pairs = []
    for row in agg.take_all():  # alphabet^2-bounded
        if row["type_a"] == _OVERLAP_SIZE_TAG:
            sizes[row["type_b"]] = int(row["inter"])
        else:
            pairs.append(row)
    rows = []
    for row in pairs:
        inter = int(row["inter"])
        uni = sizes[row["type_a"]] + sizes[row["type_b"]] - inter
        rows.append(
            {
                "type_a": row["type_a"],
                "type_b": row["type_b"],
                "inter": inter,
                "uni": uni,
                "jaccard_ppm": inter * 1_000_000 // uni,
            }
        )
    rows.sort(key=lambda r: (r["type_a"], r["type_b"]))
    if not rows:
        return _AUDIENCE_OVERLAP_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_AUDIENCE_OVERLAP_SCHEMA)


_SESSION_MEDIAN_SCHEMA = pa.schema(
    [("n_sessions", pa.int64()), ("median_duration_us", pa.int64())]
)


def session_duration_median(sf_dir: str):
    """Exact corpus-wide median session duration (last-event ts minus
    first-event ts, microseconds) — the sessionize kernel COMPOSED with
    the grouped-quantile histogram narrowing, the engagement headline a
    product dashboard shows.

    Scale shape: one coarse user-hash exchange feeds the vectorized
    per-partition session kernel (the ``sessionize`` sort + gap-break
    fold) emitting ONE (g, duration) row per session; that narrow table
    is materialized once (distributed, 16 B/session) and the exact
    median comes from ``grouped_quantile``'s histogram narrowing — a
    ~log_B(max duration) sequence of streaming scans over the
    materialized sessions, never a global sort.  Median convention is
    the engine-wide ceil(q*n) order statistic; the result is one typed
    row (empty corpus -> typed empty table)."""
    from .quantiles import grouped_quantile

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gaps = np.diff(ts_us, prepend=ts_us[0])
        new_session = new_user | (gaps > SESSION_GAP_S * 1_000_000)
        first = np.flatnonzero(new_session)
        last = np.append(first[1:], len(ts_us)) - 1
        return pd.DataFrame(
            {
                "g": np.full(len(first), "all", dtype=object),
                "v": (ts_us[last] - ts_us[first]).astype(np.int64),
            }
        )

    sessions = (
        ds.groupby("__upart")
        .map_groups(per_part, batch_format="pandas")
        .materialize()
    )
    med = grouped_quantile(lambda: sessions, 500_000, return_counts=True)
    if "all" not in med:
        return _SESSION_MEDIAN_SCHEMA.empty_table()
    value, n = med["all"]
    return pa.table(
        {
            "n_sessions": pa.array([n], pa.int64()),
            "median_duration_us": pa.array([value], pa.int64()),
        }
    )


def hourly_spike_by_type(sf_dir: str):
    """Traffic-spike report per event type: the hottest hour's count vs
    the type's mean hourly count, in exact ppm — the monitoring-alert
    sibling of ``missing_hours_by_type`` (silent sensor vs screaming
    sensor).

    Scale shape: the tumbling-window exchange ((type, hour) partials,
    map-side combined) followed by a type-grain Max/Sum/Count fold — the
    driver sees one row per type.  ``spike_ratio_ppm`` = max_hour_n *
    10^6 * n_hours // total_n (all non-negative: floor == trunc)."""
    from ray.data.aggregate import Max, Sum

    from .core import partial_then_global

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        hour = pc.divide(
            batch["ts"].cast(pa.int64()), pa.scalar(HOUR_US, pa.int64())
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "epoch_hour": pc.cast(hour, pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    hours = partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "epoch_hour"],
        ["n"],
    )

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "n_hours": pa.array(
                    np.ones(batch.num_rows, dtype=np.int64)
                ),
                "max_hour_n": batch["n"],
                "total_n": batch["n"],
            }
        )

    agg = (
        hours.map_batches(widen, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n_hours", alias_name="n_hours"),
            Max("max_hour_n", alias_name="max_hour_n"),
            Sum("total_n", alias_name="total_n"),
        )
    )
    rows = sorted(agg.take_all(), key=lambda r: r["event_type"])
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n_hours", pa.int64()),
            ("max_hour_n", pa.int64()),
            ("total_n", pa.int64()),
            ("spike_ratio_ppm", pa.int64()),
        ]
    )
    out = [
        {
            "event_type": r["event_type"],
            "n_hours": int(r["n_hours"]),
            "max_hour_n": int(r["max_hour_n"]),
            "total_n": int(r["total_n"]),
            "spike_ratio_ppm": int(r["max_hour_n"])
            * 1_000_000
            * int(r["n_hours"])
            // int(r["total_n"]),
        }
        for r in rows
    ]
    if not out:
        return schema.empty_table()
    return pa.Table.from_pylist(out, schema=schema)


_ATTRIB_SCHEMA = pa.schema(
    [
        ("first_type", pa.string()),
        ("n_sessions", pa.int64()),
        ("n_purchases", pa.int64()),
    ]
)


def first_touch_attribution(sf_dir: str):
    """First-touch marketing attribution: every session is credited to
    the event TYPE that opened it, and the report counts sessions and
    in-session purchases per opening type — the composite of sessionize
    + per-session first_value + conditional count that attribution
    dashboards run.

    Scale shape: ONE coarse user-hash exchange (the sessionize plan);
    the partition kernel derives breaks, session ids, each session's
    first type (the break positions themselves) and its purchase count
    (bincount over purchase rows) fully vectorized, folding to
    alphabet-bounded (first_type, n, n_purch) partials.  NULL event
    types are excluded up front (both sides: the oracle's WHERE)."""
    from .core import partial_then_global

    ds = (
        _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
        .map_batches(
            lambda b: b.filter(pc.is_valid(b["event_type"])),
            batch_format="pyarrow",
        )
        .map_batches(_add_user_part, batch_format="pyarrow")
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        typ = g["event_type"].to_numpy()
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gaps = np.diff(ts_us, prepend=ts_us[0])
        brk = new_user | (gaps > SESSION_GAP_S * 1_000_000)
        sid = np.cumsum(brk) - 1  # 0-based session index
        first_type = typ[brk]
        n_sessions = len(first_type)
        purch = np.bincount(
            sid[typ == "purchase"], minlength=n_sessions
        ).astype(np.int64)
        codes, uniq = pd.factorize(first_type)
        n_sess = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        n_purch = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n_purch, codes, purch)
        return pd.DataFrame(
            {
                "first_type": uniq,
                "n_sessions": n_sess,
                "n_purchases": n_purch,
            }
        )

    agg = partial_then_global(
        ds.groupby("__upart").map_groups(
            lambda g: per_part(g.drop(columns="__upart")),
            batch_format="pandas",
        ),
        ["first_type"],
        ["n_sessions", "n_purchases"],
    )
    rows = sorted(agg.take_all(), key=lambda r: r["first_type"])
    if not rows:
        return _ATTRIB_SCHEMA.empty_table()
    return pa.Table.from_pylist(
        [
            {
                "first_type": r["first_type"],
                "n_sessions": int(r["n_sessions"]),
                "n_purchases": int(r["n_purchases"]),
            }
            for r in rows
        ],
        schema=_ATTRIB_SCHEMA,
    )


ROLLING_MAX_HOURS = 24

_ROLLING_MAX_SCHEMA = pa.schema(
    [
        ("event_type", pa.string()),
        ("epoch_hour", pa.int64()),
        ("n", pa.int64()),
        ("rolling_max_n", pa.int64()),
    ]
)


def rolling_max_24h_by_type(sf_dir: str):
    """Sliding-extrema monitor: for every (type, present hour), the count
    and the MAX hourly count over the trailing 24 hours of PRESENT data
    points (SQL: MAX() OVER (PARTITION BY type ORDER BY hour RANGE 23
    PRECEDING)) — the alert-threshold envelope a rate limiter reads.

    Scale shape: the tumbling exchange reduces events to (type, hour)
    partials; the sliding max then runs on the span-bounded hour-grain
    series per type ON THE DRIVER with a monotonic-deque pass (O(span),
    amortized one push/pop per hour) — the row-proportional work is all
    in the exchange, the window pass touches |types| x |span hours|
    rows.  Returned typed."""
    from collections import deque

    from .core import partial_then_global

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        hour = pc.divide(
            batch["ts"].cast(pa.int64()), pa.scalar(HOUR_US, pa.int64())
        )
        return pa.table(
            {
                "event_type": batch["event_type"],
                "epoch_hour": pc.cast(hour, pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    rows = sorted(
        partial_then_global(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["event_type", "epoch_hour"],
            ["n"],
        ).take_all(),
        key=lambda r: (r["event_type"], r["epoch_hour"]),
    )
    if not rows:
        return _ROLLING_MAX_SCHEMA.empty_table()
    out_t, out_h, out_n, out_m = [], [], [], []
    i = 0
    while i < len(rows):
        t = rows[i]["event_type"]
        j = i
        dq: deque = deque()  # (hour, n) decreasing by n
        while j < len(rows) and rows[j]["event_type"] == t:
            h, n = int(rows[j]["epoch_hour"]), int(rows[j]["n"])
            while dq and dq[0][0] < h - (ROLLING_MAX_HOURS - 1):
                dq.popleft()
            while dq and dq[-1][1] <= n:
                dq.pop()
            dq.append((h, n))
            out_t.append(t)
            out_h.append(h)
            out_n.append(n)
            out_m.append(dq[0][1])
            j += 1
        i = j
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "epoch_hour": pa.array(out_h, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "rolling_max_n": pa.array(out_m, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SCD2 / CDC run compaction: per-user event_type validity intervals
# ---------------------------------------------------------------------------

_SCD2_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("valid_from", pa.timestamp("us")),
        ("valid_to", pa.timestamp("us")),
        ("n_events", pa.int64()),
    ]
)


def scd2_type_intervals(sf_dir: str):
    """SCD2 / change-data-capture compaction: consecutive same-``event_type``
    runs per user collapse into validity intervals — the latest-snapshot
    history table every warehouse ETL builds (SQL: LAG change marker +
    running SUM island id + LEAD of the next run's start).

    ``valid_from`` is the run's first event ts; ``valid_to`` is the NEXT
    run's start, or the run's own last event ts for the user's final run
    (closed-at-last-observation, so the column is never NULL and the driver
    hash stays well-defined).

    Scale shape: ONE coarse user-hash exchange (the shared
    ``WINDOW_PARTITIONS`` partition — all of a user's rows co-locate), then
    a fully vectorized kernel per partition: one lexsort by (user, ts,
    event_id), run breaks = user-change OR type-change, firsts/lasts by
    positional indexing — no per-user Python.  Output rows (one per run)
    stream as a Dataset, never driver-materialized."""
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]")
        et = g["event_type"].to_numpy()
        n = len(g)
        if n == 0:  # defensive: Ray 2.49 skips empty groups, but cheap
            return _SCD2_SCHEMA.empty_table().to_pandas()
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        new_run = new_user.copy()
        new_run[1:] |= et[1:] != et[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n) - 1  # last row index of each run
        # valid_to: next run's start ts when the next run is the same user,
        # else (user's final run) the run's own last event ts
        nxt_start_ts = np.append(ts[starts[1:]], ts[ends[-1]])
        same_user_next = np.append(u[starts[1:]] == u[starts[:-1]], False)
        valid_to = np.where(same_user_next, nxt_start_ts, ts[ends])
        return pd.DataFrame(
            {
                "user_id": u[starts].astype(np.int64),
                "event_type": et[starts],
                "valid_from": ts[starts],
                "valid_to": valid_to,
                "n_events": (ends - starts + 1).astype(np.int64),
            }
        )

    return _ensure_schema(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        _SCD2_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Distribution-drift monitor: exact integer chi-square per day
# ---------------------------------------------------------------------------

_CHI2_SCHEMA = pa.schema([("day", pa.int64()), ("chi2_scaled", pa.int64())])


def type_drift_chi2(sf_dir: str):
    """Data-drift monitor: per UTC day, the chi-square statistic of that
    day's event_type mix against the whole corpus's type distribution —
    the standard pipeline-health check for an ingest feed.

    Exactness contract: with o = observed count, N = grand total, n_d /
    n_t = day / type marginals, each cell contributes
    ``(o*N - n_d*n_t)^2 // (n_d*n_t)`` and the day's sum is floored by
    ``N`` — the SAME floor-division order on both sides (the oracle uses
    HUGEINT for the squared term), so parity is bit-exact with no float
    chi-square anywhere.  Zero cells (a type absent that day) contribute
    exactly ``n_d*n_t // N``-ish mass via the same formula, so both sides
    expand the full day x type grid.

    Scale shape: ONE partial+global groupby over (type, day) — each batch
    collapses map-side to at most |types| x |days-touched| rows; the
    contingency table is alphabet x history-days bounded, so the exact
    big-int chi-square fold runs on the driver over driver-small rows."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        return (
            pa.table(
                {
                    "event_type": b["event_type"],
                    "day": pa.array(day, pa.int64()),
                    "o": pa.array(np.ones(len(day), np.int64)),
                }
            )
            .group_by(["event_type", "day"])
            .aggregate([("o", "sum")])
            .rename_columns(["event_type", "day", "o"])
        )

    cells = _partial_then_global(
        ds.map_batches(partial, batch_format="pyarrow"), ["event_type", "day"], ["o"]
    ).take_all()
    if not cells:
        return _CHI2_SCHEMA.empty_table()
    # exact big-int fold over the (types x days)-bounded contingency table
    obs: dict[tuple[str, int], int] = {}
    n_d: dict[int, int] = {}
    n_t: dict[str, int] = {}
    for r in cells:
        t, d, o = r["event_type"], int(r["day"]), int(r["o"])
        obs[(t, d)] = o
        n_d[d] = n_d.get(d, 0) + o
        n_t[t] = n_t.get(t, 0) + o
    grand = sum(n_d.values())
    days = sorted(n_d)
    out = []
    for d in days:
        acc = 0
        for t, nt in n_t.items():
            o = obs.get((t, d), 0)
            e_num = n_d[d] * nt  # expected * N
            acc += (o * grand - e_num) ** 2 // e_num
        out.append(acc // grand)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "chi2_scaled": pa.array(out, pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# User journey mining: first-K event-type path per user, path frequencies
# ---------------------------------------------------------------------------

JOURNEY_PREFIX_EVENTS = 8

_JOURNEY_SCHEMA = pa.schema([("path", pa.string()), ("n_users", pa.int64())])


def user_journey_paths(sf_dir: str):
    """User-path mining: each user's journey is the '>'-joined sequence of
    their first ``JOURNEY_PREFIX_EVENTS`` event types (by ts, event_id);
    the result counts users per distinct journey — the onboarding-funnel
    path report (SQL: ordered ``list()`` aggregate -> ``list_slice`` ->
    ``array_to_string`` -> GROUP BY path).

    Scale shape: ONE coarse user-hash exchange; the per-partition kernel
    is fully vectorized (lexsort, per-user positional clip via
    ``maximum.accumulate``, Arrow ``binary_join`` over offset-built lists
    — no per-user Python), and collapses its partition to (path, n)
    partials, so the final exchange is distinct-path-bounded
    (<= |alphabet|^K, in practice far smaller), never user-proportional."""
    from .core import partial_then_global as _partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"path": pd.Series([], dtype=object),
                 "n_users": pd.Series([], dtype=np.int64)}
            )
        u = g["user_id"].to_numpy()
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = u[1:] != u[:-1]
        pos = np.arange(n, dtype=np.int64)
        first = np.zeros(n, dtype=np.int64)
        first[new] = pos[new]
        pos = pos - np.maximum.accumulate(first)
        kept_counts = np.minimum(np.bincount(np.cumsum(new) - 1), JOURNEY_PREFIX_EVENTS)
        head = pa.array(g["event_type"].to_numpy()[pos < JOURNEY_PREFIX_EVENTS])
        offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
        paths = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets), head), ">"
        ).to_pandas()
        out = paths.value_counts().reset_index()
        out.columns = ["path", "n_users"]
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    return _ensure_schema(
        _partial_then_global(
            ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
            ["path"],
            ["n_users"],
        ),
        _JOURNEY_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Funnel latency: hours from a user's first event to their first purchase
# ---------------------------------------------------------------------------

_I64_MAX = np.iinfo(np.int64).max

_TTP_SCHEMA = pa.schema(
    [("hours_to_purchase", pa.int64()), ("n_users", pa.int64())]
)


def time_to_purchase_histogram(sf_dir: str):
    """Conversion-latency distribution: per user, floor-hours between the
    FIRST event ever and the FIRST 'purchase' event; users who never
    purchase land in the -1 bucket — the activation-funnel report.

    Scale shape: each batch folds to per-user (min ts, min purchase-ts)
    partials (sentinel int64-max when the batch has no purchase), the
    native groupby ``Min`` merges them map-side-combined, and the hour
    histogram is a second partial+global pass over ONE row per user; the
    driver sees only the hour-bounded histogram (typed, empty-safe)."""
    from ray.data.aggregate import Min

    from .core import partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64())
        is_p = pc.equal(batch["event_type"], "purchase")
        p_us = pc.if_else(is_p, ts, pa.scalar(_I64_MAX, pa.int64()))
        return (
            pa.table({"user_id": batch["user_id"], "ts_us": ts, "p_us": p_us})
            .group_by(["user_id"])
            .aggregate([("ts_us", "min"), ("p_us", "min")])
            .rename_columns(["user_id", "ts_us", "p_us"])
        )

    firsts = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("ts_us"), Min("p_us"))
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        f = batch["min(ts_us)"].to_numpy(zero_copy_only=False)
        p = batch["min(p_us)"].to_numpy(zero_copy_only=False)
        # purchase ⊆ events, so p >= f whenever a purchase exists and the
        # latency is non-negative (floor == trunc division is safe)
        hours = np.where(p == _I64_MAX, -1, (p - f) // HOUR_US)
        u, c = np.unique(hours, return_counts=True)
        return pa.table(
            {
                "hours_to_purchase": pa.array(u.astype(np.int64), pa.int64()),
                "n_users": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    rows = partial_then_global(
        firsts.map_batches(bucketize, batch_format="pyarrow"),
        ["hours_to_purchase"],
        ["n_users"],
    ).take_all()
    if not rows:
        return _TTP_SCHEMA.empty_table()
    rows = sorted((int(r["hours_to_purchase"]), int(r["n_users"])) for r in rows)
    return pa.table(
        {
            "hours_to_purchase": pa.array([r[0] for r in rows], pa.int64()),
            "n_users": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Session-size histogram: events per session, counted across the corpus
# ---------------------------------------------------------------------------

_SESSION_SIZE_SCHEMA = pa.schema(
    [("session_events", pa.int64()), ("n_sessions", pa.int64())]
)


def session_size_histogram(sf_dir: str):
    """Bounce-rate / engagement-depth report: how many sessions have 1
    event, 2 events, ... (30-min inactivity gap, the shared ``sessionize``
    contract — the 1-event bucket over the total IS the bounce rate).

    Scale shape: the sessionize exchange and kernel (ONE coarse user-hash
    shuffle, vectorized session breaks), but each partition collapses to
    its (session size, count) histogram partials, so the final exchange
    is size-domain-bounded; the driver sees the typed histogram only."""
    from .core import partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"session_events": pd.Series([], dtype=np.int64),
                 "n_sessions": pd.Series([], dtype=np.int64)}
            )
        u = g["user_id"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        gaps = np.diff(ts_us, prepend=ts_us[0])
        new_session = new_user | (gaps > SESSION_GAP_S * 1_000_000)
        sizes = np.diff(np.append(np.flatnonzero(new_session), n))
        su, sc = np.unique(sizes, return_counts=True)
        return pd.DataFrame(
            {
                "session_events": su.astype(np.int64),
                "n_sessions": sc.astype(np.int64),
            }
        )

    rows = partial_then_global(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        ["session_events"],
        ["n_sessions"],
    ).take_all()
    if not rows:
        return _SESSION_SIZE_SCHEMA.empty_table()
    rows = sorted((int(r["session_events"]), int(r["n_sessions"])) for r in rows)
    return pa.table(
        {
            "session_events": pa.array([r[0] for r in rows], pa.int64()),
            "n_sessions": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Debounce: windowed dedup of repeat (user, type) events
# ---------------------------------------------------------------------------

DEBOUNCE_WINDOW_S = 30

_DEBOUNCE_SCHEMA = pa.schema(
    [("event_type", pa.string()), ("n_kept", pa.int64()), ("n_dropped", pa.int64())]
)


def debounce_counts(sf_dir: str):
    """Windowed dedup (debounce): an event is DROPPED when the same user
    fired the same event_type within the previous 30 s — the
    double-click / retry-storm cleaning rule of every event pipeline.
    Reports kept/dropped per type (SQL: LAG over (user, type) partitions
    + a gap predicate).

    Scale shape: ONE coarse user-hash exchange (all of a user's rows
    co-locate, so every (user, type) chain is partition-local); the
    kernel is one lexsort by (user, type, ts, event_id) + a shifted
    same-chain gap mask; each partition collapses to per-type (kept,
    dropped) partials, so the final exchange is type-alphabet-bounded."""
    from .core import partial_then_global

    ds = _read_events(sf_dir, ["user_id", "ts", "event_id", "event_type"]).map_batches(
        _add_user_part, batch_format="pyarrow"
    )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "n_kept": pd.Series([], dtype=np.int64),
                 "n_dropped": pd.Series([], dtype=np.int64)}
            )
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_chain = np.empty(n, dtype=bool)
        new_chain[0] = True
        new_chain[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        gaps = np.diff(ts_us, prepend=ts_us[0])
        kept = new_chain | (gaps > DEBOUNCE_WINDOW_S * 1_000_000)
        out = (
            pd.DataFrame({"event_type": et, "kept": kept})
            .groupby("event_type", sort=False)["kept"]
            .agg(n_kept="sum", n_dropped=lambda s: int((~s).sum()))
            .reset_index()
        )
        out["n_kept"] = out["n_kept"].astype(np.int64)
        out["n_dropped"] = out["n_dropped"].astype(np.int64)
        return out

    rows = partial_then_global(
        ds.groupby("__upart").map_groups(per_part, batch_format="pandas"),
        ["event_type"],
        ["n_kept", "n_dropped"],
    ).take_all()
    if not rows:
        return _DEBOUNCE_SCHEMA.empty_table()
    rows = sorted(
        (r["event_type"], int(r["n_kept"]), int(r["n_dropped"])) for r in rows
    )
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_kept": pa.array([r[1] for r in rows], pa.int64()),
            "n_dropped": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


# step half-life of the decayed-value feature (value halves every N days);
# mirrored as literals in the user_value_decayed oracle
DECAY_HALF_LIFE_DAYS = 1
DAY_US = 86_400_000_000


def user_value_decayed(sf_dir: str):
    """Time-decayed user value (the feature-store recency feature): every
    event's cents are halved once per DECAY_HALF_LIFE_DAYS of age relative
    to the corpus's max timestamp, then summed per user —
        decayed_cents = sum over events of value_cents >> min(age_days, 62)
    Exact integers end to end: a right shift of a non-negative int IS the
    floor halving, so the engine and the oracle's ``// (1 << age)`` agree
    bit-for-bit (shift capped at 62 to stay in int64; anything that old
    contributes 0 cents anyway).

    Scale shape: one native Max(ts) pass, then ONE map with per-batch
    Arrow group_by partials and a user-grain exchange
    (``partial_then_global``) — one row per user per block, never per
    event."""
    from ray.data.aggregate import Max

    from .core import partial_then_global

    mx = _read_events(sf_dir, ["ts"]).map_batches(
        lambda b: pa.table({"ts_us": b["ts"].cast(pa.int64())}),
        batch_format="pyarrow",
    ).aggregate(Max("ts_us"))["max(ts_us)"]
    if mx is None:
        return pa.schema(
            [
                ("user_id", pa.int64()),
                ("decayed_cents", pa.int64()),
                ("n_events", pa.int64()),
            ]
        ).empty_table()
    max_us = int(mx)

    def prep(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        age = np.minimum(
            (max_us - ts_us) // (DECAY_HALF_LIFE_DAYS * DAY_US), 62
        )
        cents = cents_np(b["value"])
        return pa.table(
            {
                "user_id": pc.cast(b["user_id"], pa.int64()),
                "decayed_cents": pa.array(cents >> age, pa.int64()),
                "n_events": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )

    return partial_then_global(
        _read_events(sf_dir, ["user_id", "ts", "value"]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["user_id"],
        ["decayed_cents", "n_events"],
    )


def dow_hour_heatmap(sf_dir: str):
    """Traffic heatmap by (day-of-week, hour-of-day) — the ops-dashboard
    calendar grid.  DOW is computed in pure epoch integer arithmetic,
    (epoch_days + 4) % 7 with Sunday = 0 (1970-01-01 was a Thursday = 4),
    matching DuckDB's ``dayofweek``; hour is (epoch_us // HOUR_US) % 24.
    Timestamps are tz-naive microseconds on both sides, so no timezone
    ever enters.  Map-side (dow, hour) partials -> one <= 168-key
    exchange."""
    from .core import partial_then_global

    ds = _read_events(sf_dir, ["ts"])

    def prep(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // DAY_US
        return pa.table(
            {
                "dow": pa.array((days + 4) % 7, pa.int64()),
                "hour": pa.array(us // HOUR_US % 24, pa.int64()),
                "n_events": pa.array(np.ones(len(us), dtype=np.int64)),
            }
        )

    return partial_then_global(
        ds.map_batches(prep, batch_format="pyarrow"), ["dow", "hour"],
        ["n_events"],
    )
