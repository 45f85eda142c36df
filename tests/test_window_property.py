"""Hypothesis property tests for the vectorized window kernels.

The coarse-partition kernels (segment masks, reduceat, searchsorted,
flat pair gather) replaced per-group pandas logic; these tests pin them
against straightforward pure-Python references on adversarial inputs the
sf fixtures don't hit densely: duplicate timestamps, single-event users,
users with zero purchases, all-equal values.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

BASE_US = 1_700_000_000_000_000  # fixed epoch base (us)


@st.composite
def event_frames(draw):
    n = draw(st.integers(min_value=1, max_value=50))
    users = draw(
        st.lists(st.integers(min_value=1, max_value=4), min_size=n, max_size=n)
    )
    # second-granularity offsets with heavy duplicate probability, spanning
    # beyond both the 30-min session gap and the 5-min range-join window
    offs = draw(
        st.lists(
            st.integers(min_value=0, max_value=7200), min_size=n, max_size=n
        )
    )
    types = draw(
        st.lists(
            st.sampled_from(["view", "purchase", "click"]), min_size=n, max_size=n
        )
    )
    cents = draw(
        st.lists(st.integers(min_value=-500, max_value=500), min_size=n, max_size=n)
    )
    return pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": (BASE_US + np.asarray(offs, dtype=np.int64) * 1_000_000).astype(
                "datetime64[us]"
            ),
            "user_id": np.asarray(users, dtype=np.int64),
            "event_type": types,
            "value": [c / 100.0 for c in cents],
            "props": ["{}"] * n,
        }
    )


def _write_events(df: pd.DataFrame, tmpdir: str) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmpdir, "events.parquet"))
    return tmpdir


@pytest.fixture(scope="module")
def wtmp(tmp_path_factory):
    return str(tmp_path_factory.mktemp("winprop"))


@settings(max_examples=10, deadline=None)
@given(event_frames())
def test_sessionize_property(ray_session, wtmp, df):
    from layout_analysis_ray.functions.windows import SESSION_GAP_S, sessionize

    sf = _write_events(df, wtmp)
    got = sessionize(sf).to_pandas().sort_values("user_id").reset_index(drop=True)

    exp_rows = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        n_sessions, cur, maxc = 1, 1, 1
        for i in range(1, len(ts)):
            if ts[i] - ts[i - 1] > SESSION_GAP_S * 1_000_000:
                n_sessions += 1
                cur = 1
            else:
                cur += 1
            maxc = max(maxc, cur)
        exp_rows.append((uid, n_sessions, maxc))
    exp = pd.DataFrame(
        exp_rows, columns=["user_id", "n_sessions", "max_session_events"]
    ).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


@settings(max_examples=10, deadline=None)
@given(event_frames())
def test_running_total_and_top_property(ray_session, wtmp, df):
    from layout_analysis_ray.functions.windows import running_total, top_event_per_user

    sf = _write_events(df, wtmp)

    got = running_total(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp_map = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        total = 0
        for eid, v in zip(g["event_id"], g["value"]):
            total += int(np.round(v * 100.0))
            exp_map[int(eid)] = total
    assert dict(zip(got["event_id"], got["running_cents"])) == exp_map

    top = top_event_per_user(sf).to_pandas()
    for uid, g in df.groupby("user_id"):
        cents = np.round(g["value"].to_numpy() * 100.0).astype(np.int64)
        best = sorted(zip(-cents, g["event_id"].to_numpy()))[0]
        row = top[top["user_id"] == uid]
        assert len(row) == 1
        assert int(row["event_id"].iloc[0]) == int(best[1])
        assert int(row["value_cents"].iloc[0]) == int(-best[0])


@settings(max_examples=10, deadline=None)
@given(event_frames())
def test_range_join_property(ray_session, wtmp, df):
    from layout_analysis_ray.functions.windows import (
        RANGE_JOIN_WINDOW_US,
        range_join_after_purchase,
        range_join_after_purchase_salted,
    )

    sf = _write_events(df, wtmp)

    def pair_set(res: pd.DataFrame) -> set:
        # an all-empty Ray dataset surfaces column-less via to_pandas (the
        # documented empty-block quirk); the pair SET is still exactly empty
        if res.empty:
            return set()
        return set(map(tuple, res[["purchase_id", "event_id"]].to_numpy()))

    got = pair_set(range_join_after_purchase(sf).to_pandas())
    ts_us = df["ts"].astype("int64")
    exp = set()
    for p in df[df["event_type"] == "purchase"].itertuples(index=False):
        pts = int(pd.Timestamp(p.ts).value // 1000)
        for e in df[df["user_id"] == p.user_id].itertuples(index=False):
            ets = int(pd.Timestamp(e.ts).value // 1000)
            if e.event_id != p.event_id and pts <= ets <= pts + RANGE_JOIN_WINDOW_US:
                exp.add((int(p.event_id), int(e.event_id)))
    assert got == exp
    # salted twin must agree exactly
    assert pair_set(range_join_after_purchase_salted(sf).to_pandas()) == exp


@settings(max_examples=10, deadline=None)
@given(event_frames())
def test_asof_property(ray_session, wtmp, df):
    """As-of semantics pin: each event resolves to the reference event with
    the greatest (ts, event_id) among same-user purchases with ts <= event
    ts; -1 when none.  Salted twin must agree exactly."""
    from layout_analysis_ray.functions.windows import (
        asof_last_purchase,
        asof_last_purchase_salted,
    )

    sf = _write_events(df, wtmp)
    exp = {}
    for uid, g in df.groupby("user_id"):
        refs = sorted(
            (int(pd.Timestamp(r.ts).value // 1000), int(r.event_id))
            for r in g[g["event_type"] == "purchase"].itertuples(index=False)
        )
        for e in g.itertuples(index=False):
            ets = int(pd.Timestamp(e.ts).value // 1000)
            best = -1
            for rts, rid in refs:
                if rts <= ets:
                    best = rid
                else:
                    break
            exp[int(e.event_id)] = best

    for fn in (asof_last_purchase, asof_last_purchase_salted):
        got = fn(sf).to_pandas()
        assert dict(zip(got["event_id"], got["last_purchase_id"])) == exp, fn.__name__


@settings(max_examples=10, deadline=None)
@given(event_frames())
def test_lag_diff_and_moving_avg_property(ray_session, wtmp, df):
    from layout_analysis_ray.functions.windows import MOVAVG_WINDOW, lag_diff, moving_avg

    sf = _write_events(df, wtmp)

    got = lag_diff(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp_gap = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        for i, eid in enumerate(g["event_id"]):
            exp_gap[int(eid)] = int(ts[i] - ts[i - 1]) if i > 0 else -1
    assert dict(zip(got["event_id"], got["gap_us"])) == exp_gap

    got = moving_avg(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    exp = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cents = [int(np.round(v * 100.0)) for v in g["value"]]
        for i, eid in enumerate(g["event_id"]):
            frame = cents[max(0, i - (MOVAVG_WINDOW - 1)) : i + 1]
            s, n = sum(frame), len(frame)
            # trunc toward zero, as DuckDB's // (the engine's trunc_div_np);
            # Python's // floors, which differs on negative frame sums
            a = (1 if s >= 0 else -1) * (abs(s) * 10000 // n)
            exp[int(eid)] = (s, n, a)
    assert {
        int(e): (int(s), int(n), int(a))
        for e, s, n, a in zip(
            got["event_id"], got["win_sum_cents"], got["win_n"], got["win_avg_ppm"]
        )
    } == exp


@settings(max_examples=10, deadline=None)
@given(event_frames())
def test_range_sum_property(ray_session, wtmp, df):
    from layout_analysis_ray.functions.windows import (
        RANGE_SUM_WINDOW_US,
        range_sum_1h,
    )

    sf = _write_events(df, wtmp)
    got = range_sum_1h(sf).to_pandas()
    exp = {}
    for _, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        cents = np.asarray([int(np.round(v * 100.0)) for v in g["value"]])
        for i, eid in enumerate(g["event_id"]):
            # RANGE frame: every row with ts in [ts_i - W, ts_i], incl. peers
            in_frame = (ts >= ts[i] - RANGE_SUM_WINDOW_US) & (ts <= ts[i])
            exp[int(eid)] = (int(cents[in_frame].sum()), int(in_frame.sum()))
    assert {
        int(e): (int(s), int(n))
        for e, s, n in zip(got["event_id"], got["win_sum_cents"], got["win_n"])
    } == exp


def test_value_histogram_negative_values_match_duckdb(ray_session, wtmp):
    """Negative cents must bin with DuckDB's trunc-toward-zero //, not
    numpy's floor (the sf fixtures are all-positive, so only this test
    exercises the sign edge)."""
    import duckdb

    from layout_analysis_ray.functions.windows import events_value_histogram

    n = 40
    df = pd.DataFrame(
        {
            "event_id": np.arange(1, n + 1, dtype=np.int64),
            "ts": (BASE_US + np.arange(n, dtype=np.int64) * 1_000_000).astype(
                "datetime64[us]"
            ),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["view"] * n,
            # straddles zero: bins -2, -1, 0, 1 with trunc semantics
            "value": [(c * 37 - 740) / 100.0 for c in range(n)],
            "props": ["{}"] * n,
        }
    )
    sf = _write_events(df, wtmp)
    got = (
        events_value_histogram(sf)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    exp = (
        duckdb.sql(
            f"""SELECT CAST(round(value*100) AS BIGINT) // 500 AS bin,
                       COUNT(*) AS n
                FROM read_parquet('{sf}/events.parquet')
                GROUP BY 1 ORDER BY 1"""
        )
        .df()
        .astype({"bin": np.int64, "n": np.int64})
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
