"""Session-gap window: handcrafted truth + boundary semantics."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.windows import sessionize


def _events():
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    s = lambda sec: t0 + np.timedelta64(int(sec * 1_000_000), "us")
    rows = [
        # user 1: 3 events, gap exactly 1800s (same session), then 1801s
        (0, s(0), 1, 10.00),
        (1, s(1800), 1, 5.25),     # exactly the gap -> SAME session
        (2, s(1800 + 1801), 1, 1.00),  # > gap -> new session
        # user 2: single event
        (3, s(42), 2, 7.77),
        # user 1 event arriving out of order in the table
        (4, s(900), 1, 2.00),
    ]
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    })


def test_sessionize_truth(ray_session):
    out = sessionize(rd.from_arrow(_events()), gap_s=1800).to_pandas() \
        .sort_values(["user_id", "session_id"]).reset_index(drop=True)
    u1 = out[out.user_id == 1]
    # session 1: events at 0s, 900s, 1800s; session 2: the 3601s event
    assert list(u1.session_id) == [1, 2]
    assert list(u1.n_events) == [3, 1]
    assert list(u1.value_cents) == [1000 + 200 + 525, 100]
    assert u1.iloc[0].session_start == np.datetime64(
        "2024-01-01T00:00:00", "us")
    assert u1.iloc[0].session_end == np.datetime64(
        "2024-01-01T00:30:00", "us")
    u2 = out[out.user_id == 2]
    assert list(u2.n_events) == [1] and list(u2.value_cents) == [777]
