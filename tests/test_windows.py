"""Session-gap window: handcrafted truth + boundary semantics."""

import numpy as np
import pandas as pd
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


def _sides():
    from pyrosm_ray.stages.windows import asof_join  # noqa: F401
    def t(s):
        return np.datetime64(f"2024-01-01T{s}", "us")
    left = pa.table({
        "event_id": pa.array([100, 101, 102, 103], pa.int64()),
        "ts": pa.array([t("01:00:00"), t("02:00:00"), t("00:10:00"),
                        t("01:00:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
    })
    right = pa.table({
        "event_id": pa.array([7, 8, 9, 10], pa.int64()),
        "ts": pa.array([t("00:30:00"), t("00:59:59"), t("00:59:59"),
                        t("03:00:00")], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
    })
    return left, right


def test_asof_join_latest_prior_max_id_tiebreak(ray_session):
    from pyrosm_ray.stages.windows import asof_join
    left, right = _sides()
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right)) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    assert list(out.event_id) == [100, 101, 102, 103]
    # 100 @01:00 -> tie at 00:59:59 between ids 8 and 9 -> max id 9
    assert out.matched_id[0] == 9 and out.lag_us[0] == 1_000_000
    # 101 @02:00 -> still 9 (the 03:00 row is in the future)
    assert out.matched_id[1] == 9
    # 102 @00:10 -> no prior view: nulls
    assert pd.isna(out.matched_id[2]) and pd.isna(out.lag_us[2])
    # 103 is user 2 with no right rows at all: nulls
    assert pd.isna(out.matched_id[3])


def test_band_join_inclusive_bounds(ray_session):
    from pyrosm_ray.stages.windows import band_join
    left, right = _sides()
    out = band_join(rd.from_arrow(left), rd.from_arrow(right),
                    band_s=1800).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # 100 @01:00, band [00:30, 01:00]: 00:30 inclusive + both 00:59:59
    assert list(out.n_in_band) == [3, 0, 0, 0]


# ---------------------------------------------------------------------------
# rolling_agg (trailing row window)
# ---------------------------------------------------------------------------

def test_rolling_agg_matches_duckdb_window(ray_session):
    import duckdb
    rng = np.random.default_rng(12)
    n = 400
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "value": pa.array(np.round(rng.uniform(-50, 50, n), 2),
                          pa.float64()),
    })
    from pyrosm_ray.stages.windows import rolling_agg
    got = rolling_agg(rd.from_arrow(t).repartition(5), window_rows=4) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("ev", t)
    ora = con.execute("""
        SELECT event_id, user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w
                   AS rolling_sum_cents,
               COUNT(*) OVER w AS rolling_n
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").fetch_df()
    assert got["event_id"].tolist() == ora["event_id"].tolist()
    assert got["rolling_sum_cents"].tolist() == \
        ora["rolling_sum_cents"].astype(int).tolist()
    assert got["rolling_n"].tolist() == \
        ora["rolling_n"].astype(int).tolist()


def test_rolling_agg_window_one_is_identity(ray_session):
    t = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([10, 20, 30], pa.int64()),
        "value": pa.array([1.25, -2.5, 0.005], pa.float64()),
    })
    from pyrosm_ray.stages.windows import rolling_agg
    got = rolling_agg(rd.from_arrow(t), window_rows=1).to_pandas() \
        .sort_values("event_id")
    assert got["rolling_sum_cents"].tolist() == [125, -250, 1]
    assert got["rolling_n"].tolist() == [1, 1, 1]


def test_funnel_stages_semantics_and_sql(ray_session):
    import duckdb

    from pyrosm_ray.stages.windows import funnel_stages, funnel_stages_sql

    # user 1 completes A->B->C; user 2 has B before A (stage stops at 1
    # after A with no later B); user 3 never starts
    rows = [
        (1, 1, "A"), (1, 2, "B"), (1, 3, "C"),
        (2, 1, "B"), (2, 2, "A"), (2, 3, "C"),   # A at rank 2, no B after
        (3, 1, "C"), (3, 2, "C"),
        (4, 1, "A"), (4, 2, "A"), (4, 3, "B"),   # first-touch: A@1, B@3
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([np.datetime64(f"2026-01-01T00:00:{r[1]:02d}",
                                      "us")
                        for r in rows], pa.timestamp("us")),
        "event_id": pa.array(list(range(len(rows))), pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })
    out = funnel_stages(rd.from_arrow(t), stages=("A", "B", "C")) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    assert list(out.user_id) == [1, 2, 3, 4]
    assert list(out.funnel_stage) == [3, 1, 0, 2]
    con = duckdb.connect()
    con.register("ev", t)
    want = con.execute(funnel_stages_sql("ev", stages=("A", "B", "C"))) \
        .fetchdf()
    assert list(out.funnel_stage) == list(want.funnel_stage)


def test_retention_cohorts_exact(ray_session):
    import duckdb

    from pyrosm_ray.stages.windows import (retention_cohorts,
                                           retention_cohorts_sql)

    # user 1 active weeks 0,1,3 of cohort w; user 2 joins week 1,
    # active 1,2; user 3 only week 0
    base = np.datetime64("2026-01-05T00:00:00", "us")  # a Monday
    wk = np.timedelta64(7 * 86400, "s")
    evts = [(1, 0), (1, 0), (1, 1), (1, 3),
            (2, 1), (2, 2),
            (3, 0)]
    t = pa.table({
        "event_id": pa.array(list(range(len(evts))), pa.int64()),
        "user_id": pa.array([u for u, _ in evts], pa.int64()),
        "ts": pa.array([base + w * wk for _, w in evts],
                       pa.timestamp("us")),
    })
    out = retention_cohorts(rd.from_arrow(t)).to_pandas() \
        .sort_values(["cohort_week", "week_offset"]) \
        .reset_index(drop=True)
    c0 = int(out.cohort_week.min())
    rows = {(int(r.cohort_week) - c0, int(r.week_offset)): int(r.n_users)
            for r in out.itertuples()}
    assert rows == {(0, 0): 2, (0, 1): 1, (0, 3): 1, (1, 0): 1,
                    (1, 1): 1}
    con = duckdb.connect()
    con.register("evr", t)
    want = con.execute(retention_cohorts_sql("evr")).fetchdf()
    assert list(out.n_users) == list(want.n_users)
    assert list(out.cohort_week) == list(want.cohort_week)
    assert list(out.week_offset) == list(want.week_offset)
