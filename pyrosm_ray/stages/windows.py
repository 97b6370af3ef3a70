"""Windowed aggregates Ray Data lacks natively (custom operators).

``sessionize`` — the classic session-gap window over an event stream:
a new session starts when the gap to the previous event of the same user
exceeds ``gap_s`` (strictly). Expressed as ``groupby(user).map_groups``
with everything inside a group numpy-vectorised (lexsort + diff + cumsum
+ ``np.add.reduceat`` — no per-event Python).

Partitioning assumption (documented per the custom-operator contract):
the hash shuffle co-locates one user's whole event stream on one worker;
a single user's events must fit worker memory — the standard
sessionization contract of every streaming engine.

Money-safe values: per-session sums are integer cents rounded
half-away-from-zero (the SQL ROUND rule, so the DuckDB oracle reproduces
them exactly) — float sums are order-dependent and would hash-mismatch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(ds, gap_s: int = 1800, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               order_col: str = "event_id"):
    """-> one row per (user, session): start/end ts, event count, integer
    cent sum. Session ids number 1.. per user in (ts, order_col) order."""
    gap_us = int(gap_s) * 1_000_000

    def per_user(g: pa.Table) -> pa.Table:
        ts = np.asarray(g[ts_col].cast(pa.timestamp("us")).to_numpy(
            zero_copy_only=False)).astype("datetime64[us]")
        oid = np.asarray(g[order_col].to_numpy(zero_copy_only=False))
        order = np.lexsort((oid, ts))
        ts = ts[order]
        val = np.asarray(g[value_col].to_numpy(zero_copy_only=False),
                         dtype=np.float64)[order]
        t_i = ts.astype(np.int64)
        new_s = np.ones(len(t_i), dtype=np.int64)
        if len(t_i) > 1:
            new_s[1:] = (np.diff(t_i) > gap_us).astype(np.int64)
        sid = np.cumsum(new_s)
        starts = np.nonzero(new_s)[0]
        last = np.append(starts[1:], len(t_i)) - 1
        # half-away-from-zero, matching SQL ROUND (np.rint is half-even:
        # 112.5 would round to 112 and diverge from the oracle)
        cents = np.trunc(val * 100.0 + 0.5 * np.sign(val)).astype(np.int64)
        uid = g[user_col][0].as_py()
        return pa.table({
            user_col: pa.array([uid] * len(starts), g[user_col].type),
            "session_id": pa.array(sid[starts], pa.int64()),
            "session_start": pa.array(ts[starts], pa.timestamp("us")),
            "session_end": pa.array(ts[last], pa.timestamp("us")),
            "n_events": pa.array(
                np.diff(np.append(starts, len(t_i))), pa.int64()),
            "value_cents": pa.array(
                np.add.reduceat(cents, starts) if len(starts) else
                np.empty(0, np.int64), pa.int64()),
        })

    return ds.groupby(user_col).map_groups(per_user,
                                           batch_format="pyarrow")
