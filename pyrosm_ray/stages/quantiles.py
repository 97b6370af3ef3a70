"""Exact distributed quantiles and quantile-threshold filtering.

The curation move these enable: "keep documents whose metric clears the
p-th quantile of its group" — per-language length floors, per-domain
quality cut-offs, global percentile trims. The quantile is EXACT (DuckDB
``quantile_disc`` semantics: sorted ascending, element at index
``ceil(q*n) - 1``), not a sketch, yet nothing resembling a global sort
ever runs:

* stage 1 (one corpus scan): each batch folds to its local
  ``(group, value) -> count`` histogram — for integer-ish metrics
  (token counts, char lengths, rounded scores) the distinct-value space
  is tiny relative to the corpus, so the scan output is a compact
  histogram, not the data;
* stage 2 (one small hash shuffle): histograms co-partition by group and
  a per-group fold merges counts, sorts the few distinct values, prefix
  -sums and reads off any number of quantile thresholds;
* stage 3: thresholds (one row per group) broadcast back into a
  stateless vectorised filter over the original stream.

Driver never touches per-row data; shuffle bytes are bounded by
``#distinct (group, value) pairs``, independent of corpus size. At
100 TB with token counts < 10^6 and 10^3 groups the shuffled histogram
is ≤ 10^9 rows of three int64s in the worst case and typically far
smaller — and stage 2 stays fully distributed regardless.

No reference equivalent (pyrosm has no quantile operators — SURVEY.md
§2.5 covers only sum/min/max/count families); semantics are pinned to
the public DuckDB ``quantile_disc`` contract so the driver oracle can
replicate values bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from pyrosm_ray.stages.blocks import groupby_partitions


def _histogram_batch(batch: pa.Table, group_col: str,
                     value_col: str) -> pa.Table:
    """Fold one batch to its local (group, value) -> count histogram."""
    import pandas as pd
    df = pd.DataFrame({
        "__g": batch[group_col].to_pylist(),
        "__v": np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                          np.int64),
    })
    g = df.groupby(["__g", "__v"], sort=False).size().reset_index(name="__c")
    return pa.table({"__g": pa.array(g["__g"], pa.string()),
                     "__v": pa.array(g["__v"], pa.int64()),
                     "__c": pa.array(g["__c"], pa.int64())})


def quantile_disc_index(n: int, q: float) -> int:
    """DuckDB ``quantile_disc`` position: ``ceil(q*n) - 1`` into the
    ascending sort (pinned empirically against DuckDB 1.x; ties like
    q*n == exact-integer resolve to the lower element)."""
    return max(math.ceil(q * n) - 1, 0)


def _fold_thresholds(group: pa.Table, qs: list[float]) -> pa.Table:
    """Per-group fold over the co-partitioned histogram: merge duplicate
    values, sort, prefix-sum counts, read off each quantile."""
    import pandas as pd
    df = pd.DataFrame({
        "__g": group["__g"].to_pylist(),
        "__v": np.asarray(group["__v"].to_numpy(zero_copy_only=False),
                          np.int64),
        "__c": np.asarray(group["__c"].to_numpy(zero_copy_only=False),
                          np.int64),
    })
    out_g: list[str] = []
    out_q: list[list[int]] = []
    for gname, sub in df.groupby("__g", sort=False):
        merged = sub.groupby("__v", sort=True)["__c"].sum()
        vals = merged.index.to_numpy(np.int64)
        cum = np.cumsum(merged.to_numpy(np.int64))
        n = int(cum[-1])
        idx = np.searchsorted(cum, [quantile_disc_index(n, q) + 1
                                    for q in qs], side="left")
        out_g.append(gname)
        out_q.append([int(vals[i]) for i in idx])
    cols: dict = {"group": pa.array(out_g, pa.string())}
    for j, q in enumerate(qs):
        cols[f"q{j}"] = pa.array([row[j] for row in out_q], pa.int64())
    return pa.table(cols)


def group_quantiles(ds, group_col: str, value_col: str,
                    qs: float | list[float]):
    """Exact per-group discrete quantiles of an integer metric column.

    Returns a small Dataset — one row per group, columns ``group`` and
    ``q0..qN`` (one per requested quantile) — computed via the compact
    histogram route described in the module docstring.
    """
    q_list = [qs] if isinstance(qs, float) else list(qs)
    hist = ds.map_batches(
        lambda b: _histogram_batch(b, group_col, value_col),
        batch_format="pyarrow")
    return hist.groupby("__g", num_partitions=groupby_partitions()) \
        .map_groups(lambda g: _fold_thresholds(g, q_list),
                    batch_format="pyarrow")


def quantile_filter(ds, group_col: str, value_col: str, q: float,
                    keep: str = "ge"):
    """Keep rows whose ``value_col`` clears its group's exact q-th
    discrete quantile (``keep`` in {"ge", "gt", "le", "lt"}).

    The threshold table is one row per group — inherently tiny — so it
    broadcasts (one driver collect + plasma put) into a stateless
    vectorised filter; the corpus itself streams through exactly twice
    (histogram scan + filter scan) and never shuffles.
    """
    import ray

    ops = {"ge": np.greater_equal, "gt": np.greater,
           "le": np.less_equal, "lt": np.less}
    if keep not in ops:
        raise ValueError(f"keep must be one of {sorted(ops)}, got {keep!r}")
    op = ops[keep]
    thr_tbl = group_quantiles(ds, group_col, value_col, q).to_pandas()
    thr_ref = ray.put(dict(zip(thr_tbl["group"], thr_tbl["q0"])))

    def pick(batch: pa.Table) -> pa.Table:
        import pandas as pd
        thr = ray.get(thr_ref)
        groups = pd.Series(batch[group_col].to_pylist())
        vals = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                          np.int64)
        limit = groups.map(thr).to_numpy(np.float64)
        return batch.filter(pa.array(op(vals, limit)))

    return ds.map_batches(pick, batch_format="pyarrow")


def quantile_bins(ds, group_col: str, value_col: str, qs: list[float],
                  out_col: str = "bin"):
    """Assign every row the index of its per-group quantile bin — the
    "quality tier" move (e.g. qs=[0.25, 0.5, 0.75] -> tiers 0..3 per
    language). Bin b means ``value > edge[b-1] and value <= edge[b]``
    with edges the exact per-group discrete quantiles; bin 0 is
    everything at-or-below the first edge, the last bin everything
    above the last edge (``searchsorted(edges, v, side="left")``
    semantics on ascending edges).

    Same cost model as :func:`quantile_filter`: histogram scan + tiny
    shuffle for the edges, broadcast dict, stateless vectorised assign.
    """
    import ray

    qs = sorted(qs)
    edges_tbl = group_quantiles(ds, group_col, value_col, qs).to_pandas()
    edges = {g: np.array([row[f"q{j}"] for j in range(len(qs))],
                         dtype=np.int64)
             for g, row in edges_tbl.set_index("group").iterrows()}
    edges_ref = ray.put(edges)

    def assign(batch: pa.Table) -> pa.Table:
        import pandas as pd
        ed = ray.get(edges_ref)
        groups = batch[group_col].to_pylist()
        vals = np.asarray(batch[value_col].to_numpy(zero_copy_only=False),
                          np.int64)
        out = np.empty(len(vals), np.int64)
        df = pd.DataFrame({"g": groups, "i": np.arange(len(vals))})
        for gname, sub in df.groupby("g", sort=False):
            idx = sub["i"].to_numpy()
            out[idx] = np.searchsorted(ed[gname], vals[idx], side="left")
        return batch.append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")


def quantile_bins_sql(table: str, group_col: str, value_expr: str,
                      qs: list[float], out_col: str = "bin") -> str:
    """DuckDB twin of :func:`quantile_bins`'s bin index for one row:
    a CASE ladder over the same exact per-group quantile edges
    (correlated via a grouped CTE named ``__qb_edges`` you must join)."""
    qs = sorted(qs)
    cases = " ".join(
        f"WHEN {value_expr} <= e.q{j} THEN {j}" for j in range(len(qs)))
    return f"(CASE {cases} ELSE {len(qs)} END)"


def quantile_edges_sql(table: str, group_col: str, value_expr: str,
                       qs: list[float]) -> str:
    """The grouped-edges CTE body pairing with
    :func:`quantile_bins_sql` (alias it ``e`` and join on group)."""
    qs = sorted(qs)
    cols = ", ".join(
        f"quantile_disc({value_expr}, {q!r}) AS q{j}"
        for j, q in enumerate(qs))
    return (f"SELECT {group_col}, {cols} FROM {table} "
            f"GROUP BY {group_col}")


def quantile_disc_sql(value_expr: str, q: float) -> str:
    """DuckDB twin of one exact discrete quantile."""
    return f"quantile_disc({value_expr}, {q!r})"
