"""Windowed / temporal custom operators Ray Data lacks natively.

``sessionize`` — the classic session-gap window over an event stream:
a new session starts when the gap to the previous event of the same user
exceeds ``gap_s`` (strictly). Expressed as ``groupby(user).map_groups``
with everything inside a group numpy-vectorised (lexsort + diff + cumsum
+ ``np.add.reduceat`` — no per-event Python).

``asof_join`` — for each LEFT row, the latest RIGHT row at-or-before its
timestamp within the same key (ties on ts broken by max right id); LEFT
join semantics (unmatched rows keep nulls).

``band_join`` — the 1-D range join: for each LEFT row, the COUNT of
RIGHT rows of the same key whose timestamp falls in
``[left.ts - band_s, left.ts]`` (inclusive).

Both joins co-partition the two inputs by key through ONE hash shuffle
(sides unioned under a flag column, then ``groupby(key).map_groups``)
and resolve matches per group with numpy ``searchsorted`` over the
right side sorted once — no per-row Python, no driver materialization.

Partitioning assumption (documented per the custom-operator contract):
the hash shuffle co-locates one key's whole event stream on one worker;
a single key's rows must fit worker memory — the standard
sessionization / as-of contract of every streaming engine.

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


def _keyed_union(left_ds, right_ds, by_col: str, ts_col: str,
                 left_id: str, right_id: str):
    """Union the two join sides under one schema: (key, ts-µs, id, side).
    One hash shuffle then co-locates both sides of every key."""
    def tag(id_col: str, side: int):
        def f(b: pa.Table) -> pa.Table:
            ts = b[ts_col].cast(pa.timestamp("us"))
            n = len(b)
            return pa.table({
                "__k": b[by_col].cast(pa.int64()),
                "__t": pa.array(np.asarray(
                    ts.to_numpy(zero_copy_only=False)).astype(np.int64),
                    pa.int64()),
                "__id": b[id_col].cast(pa.int64()),
                "__side": pa.array(np.full(n, side, np.int8), pa.int8()),
            })
        return f

    return left_ds.map_batches(tag(left_id, 0), batch_format="pyarrow") \
        .union(right_ds.map_batches(tag(right_id, 1),
                                    batch_format="pyarrow"))


def _split_sides(g: pa.Table):
    """-> (left ids, left ts, right ids sorted by (ts, id), right ts)."""
    side = np.asarray(g["__side"].to_numpy(zero_copy_only=False))
    ts = np.asarray(g["__t"].to_numpy(zero_copy_only=False), np.int64)
    ids = np.asarray(g["__id"].to_numpy(zero_copy_only=False), np.int64)
    lm = side == 0
    lt, lid = ts[lm], ids[lm]
    rt, rid = ts[~lm], ids[~lm]
    order = np.lexsort((rid, rt))
    return lid, lt, rid[order], rt[order]


def asof_join(left_ds, right_ds, by_col: str = "user_id",
              ts_col: str = "ts", left_id: str = "event_id",
              right_id: str = "event_id"):
    """As-of join: one row per LEFT row with the id of the latest RIGHT
    row of the same key at-or-before the left timestamp (ties on ts
    resolved to the max right id) and the lag in microseconds; both null
    when no prior right row exists. Output columns:
    ``(left_id, by_col, matched_id, lag_us)``."""
    def per_key(g: pa.Table) -> pa.Table:
        lid, lt, rid, rt = _split_sides(g)
        if len(lid) == 0:
            return pa.table({left_id: pa.array([], pa.int64()),
                             by_col: pa.array([], pa.int64()),
                             "matched_id": pa.array([], pa.int64()),
                             "lag_us": pa.array([], pa.int64())})
        key = g["__k"][0].as_py()
        if len(rt) == 0:
            matched = np.zeros(len(lid), np.int64)
            lag = np.zeros(len(lid), np.int64)
            miss = np.ones(len(lid), bool)
        else:
            idx = np.searchsorted(rt, lt, side="right") - 1
            hit = idx >= 0
            matched = np.where(hit, rid[np.maximum(idx, 0)], 0)
            lag = np.where(hit, lt - rt[np.maximum(idx, 0)], 0)
            miss = ~hit
        return pa.table({
            left_id: pa.array(lid, pa.int64()),
            by_col: pa.array(np.full(len(lid), key, np.int64), pa.int64()),
            "matched_id": pa.array(matched, pa.int64(), mask=miss),
            "lag_us": pa.array(lag, pa.int64(), mask=miss),
        })

    from pyrosm_ray.stages.blocks import groupby_partitions
    u = _keyed_union(left_ds, right_ds, by_col, ts_col, left_id, right_id)
    return u.groupby("__k", num_partitions=groupby_partitions()) \
        .map_groups(per_key, batch_format="pyarrow")


def band_join(left_ds, right_ds, band_s: int, by_col: str = "user_id",
              ts_col: str = "ts", left_id: str = "event_id",
              right_id: str = "event_id"):
    """1-D range (band) join: one row per LEFT row with the COUNT of
    RIGHT rows of the same key whose ts lies in
    ``[left.ts - band_s, left.ts]`` (inclusive both ends). Output
    columns: ``(left_id, by_col, n_in_band)``."""
    band_us = int(band_s) * 1_000_000

    def per_key(g: pa.Table) -> pa.Table:
        lid, lt, _rid, rt = _split_sides(g)
        if len(lid) == 0:
            return pa.table({left_id: pa.array([], pa.int64()),
                             by_col: pa.array([], pa.int64()),
                             "n_in_band": pa.array([], pa.int64())})
        key = g["__k"][0].as_py()
        lo = np.searchsorted(rt, lt - band_us, side="left")
        hi = np.searchsorted(rt, lt, side="right")
        return pa.table({
            left_id: pa.array(lid, pa.int64()),
            by_col: pa.array(np.full(len(lid), key, np.int64), pa.int64()),
            "n_in_band": pa.array(hi - lo, pa.int64()),
        })

    from pyrosm_ray.stages.blocks import groupby_partitions
    u = _keyed_union(left_ds, right_ds, by_col, ts_col, left_id, right_id)
    return u.groupby("__k", num_partitions=groupby_partitions()) \
        .map_groups(per_key, batch_format="pyarrow")
