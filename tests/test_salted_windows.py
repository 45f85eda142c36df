"""Event-grain skew salting: the time-range-salted keyed-window variants
must be row-for-row identical to the unsalted paths on a hot-key corpus
(one user holding most of the events — the case where groupby(user_id)
alone would pin a whole key to one worker)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

HOUR_US = 3_600_000_000
BUCKET_US = 2 * HOUR_US  # small salt width -> many buckets -> many stitches


@pytest.fixture(scope="module")
def hotkey_dir(tmp_path_factory):
    """events.parquet: user 1 is hot (~20k events over ~8 days, with gaps
    that straddle bucket boundaries); users 2-6 are normal."""
    rng = np.random.RandomState(20240817)
    rows = []
    eid = 0

    def emit(uid, ts_us, etype, value):
        nonlocal eid
        rows.append(
            {
                "event_id": eid,
                "ts": ts_us,
                "user_id": uid,
                "event_type": etype,
                "value": float(value),
                "props": "{}",
            }
        )
        eid += 1

    t = 1_600_000_000_000_000  # epoch us, not bucket-aligned
    for _ in range(20_000):
        # mixed inter-event gaps: mostly < 30 min (keeps sessions alive
        # across bucket boundaries), occasionally > 30 min (session breaks)
        gap = int(rng.choice([20, 600, 1200, 2500], p=[0.5, 0.3, 0.15, 0.05]))
        t += gap * 1_000_000
        emit(
            1,
            t,
            "purchase" if rng.rand() < 0.05 else "view",
            rng.randint(0, 10000) / 100.0,
        )
    for uid in range(2, 7):
        t2 = 1_600_050_000_000_000 + uid * 7_000_000_000
        for _ in range(200):
            t2 += int(rng.choice([30, 2000, 4000])) * 1_000_000
            emit(
                uid,
                t2,
                "purchase" if rng.rand() < 0.1 else "click",
                rng.randint(0, 10000) / 100.0,
            )

    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path_factory.mktemp("hotkey")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(d / "events.parquet"))
    return str(d)


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sessionize_salted_equals_unsalted(ray_session, hotkey_dir):
    from layout_analysis_ray.functions.windows import sessionize, sessionize_salted

    base = _sorted(sessionize(hotkey_dir).to_pandas())
    salted = _sorted(sessionize_salted(hotkey_dir, bucket_us=BUCKET_US).to_pandas())
    pd.testing.assert_frame_equal(salted, base)
    # the hot key really was split: > 50 time buckets for user 1
    assert base.loc[base["user_id"] == 1, "n_sessions"].iloc[0] > 10


def test_asof_salted_equals_unsalted(ray_session, hotkey_dir):
    from layout_analysis_ray.functions.windows import (
        asof_last_purchase,
        asof_last_purchase_salted,
    )

    base = _sorted(asof_last_purchase(hotkey_dir).to_pandas())
    salted = _sorted(
        asof_last_purchase_salted(hotkey_dir, bucket_us=BUCKET_US).to_pandas()
    )
    pd.testing.assert_frame_equal(salted, base)
    # carry-ins actually happened: some events' last purchase precedes
    # their own time bucket
    assert (base["last_purchase_id"] >= 0).sum() > 1000


def test_range_join_salted_equals_unsalted(ray_session, hotkey_dir):
    from layout_analysis_ray.functions.windows import (
        range_join_after_purchase,
        range_join_after_purchase_salted,
    )

    base = _sorted(range_join_after_purchase(hotkey_dir).to_pandas())
    salted = _sorted(
        range_join_after_purchase_salted(hotkey_dir, bucket_us=BUCKET_US).to_pandas()
    )
    pd.testing.assert_frame_equal(salted, base)
    assert len(base) > 1000  # dense hot-user stream produces many pairs


def test_range_join_salted_rejects_narrow_bucket(hotkey_dir):
    from layout_analysis_ray.functions.windows import (
        RANGE_JOIN_WINDOW_US,
        range_join_after_purchase_salted,
    )

    with pytest.raises(ValueError):
        range_join_after_purchase_salted(hotkey_dir, bucket_us=RANGE_JOIN_WINDOW_US)


def test_user_value_decayed_bruteforce(ray_session, tmp_path):
    """Step half-life decay vs brute force on planted timestamps sitting
    exactly ON and just inside day boundaries, plus an age past the
    62-shift cap."""
    import pandas as pd
    import pyarrow.parquet as pq

    from layout_analysis_ray.functions.windows import (
        DAY_US,
        user_value_decayed,
    )

    mx = pd.Timestamp("2024-06-30 12:00:00")
    rows = [
        (1, mx, 8.00),                                    # age 0 -> 800
        (1, mx - pd.Timedelta(microseconds=1), 8.00),     # age 0 -> 800
        (1, mx - pd.Timedelta(days=1), 8.00),             # age 1 -> 400
        (2, mx - pd.Timedelta(days=2, microseconds=-1), 8.01),  # age 1 -> 400
        (2, mx - pd.Timedelta(days=3), 0.07),             # age 3 -> 0
        (3, mx - pd.Timedelta(days=200 * 365), 99.99),    # cap -> 0
    ]
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    got = (
        user_value_decayed(str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(map(tuple, got.itertuples(index=False))) == [
        (1, 2000, 3),
        (2, 400, 2),
        (3, 0, 1),
    ]
