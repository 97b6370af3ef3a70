"""Block-level hygiene for shuffle outputs.

Ray Data's hash-shuffle operators (groupby aggregates / map_groups / joins)
emit ZERO-COLUMN empty blocks for empty partitions, map transforms skip
empty blocks (so a per-batch fix never sees them), and repartition carries
them along — but pyarrow/acero joins reject a partition whose concatenated
schema is missing the key column. :func:`nonempty` rebuilds a Dataset from
only the non-empty block refs (a metadata check — block contents never move
or land on the driver), yielding a uniformly-typed Dataset that downstream
joins accept."""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd
from ray.data.context import ShuffleStrategy


def _cluster_cpus(default: int = 8) -> int:
    try:
        return int(ray.cluster_resources().get("CPU", default))
    except Exception:
        return default


def _install_hash_shuffle_empty_block_guard() -> None:
    """Driver-side guard for a Ray 2.49 hash-shuffle defect: a 0-row
    block that skips a map UDF (Ray's map operator passes empty blocks
    through without invoking the UDF) loses its schema, and when such a
    schema-less block is the FIRST input a hash-shuffle operator sees,
    its empty schema is broadcast to every aggregator — partitions fed
    only by the broadcast then crash in ``finalize`` ("Invalid sort key
    column: No match for FieldRef" for keyed groupbys, "No match or
    multiple matches for key field reference" for joins). Arrival order
    decides, so the failure is nondeterministic.

    Two Ray behaviors conspire: the executor's schema dedupe keeps the
    OLD (typed) schema on the BUNDLE even after the block degraded, and
    ``_shuffle_block`` short-circuits EVERY zero-row block before the
    ``send_empty_blocks`` broadcast runs — so a zero-row first bundle
    burns the one schema-broadcast opportunity without delivering any
    schema (this also breaks VANILLA hash joins whose one side is a
    fully-empty typed Dataset). The guard therefore (a) never forwards a
    zero-row bundle, and (b) when the input's schema broadcast is still
    pending and the bundle carries a typed schema, performs the
    broadcast ITSELF: one typed empty shard submitted straight to every
    aggregator from the driver (same-caller actor ordering guarantees
    they land before any finalize). Empty partitions then finalize to
    TYPED zero-row blocks, which also stops schema-less blocks from
    propagating into downstream joins."""
    from ray.data._internal.execution.operators import hash_shuffle as _hs
    base = _hs.HashShufflingOperatorBase
    if getattr(base, "_pyrosm_ray_empty_guard", False):
        return
    from ray.data.block import _is_empty_schema
    orig = base._do_add_input_inner

    def guarded(self, input_bundle, input_index):
        if sum(m.num_rows or 0 for m in input_bundle.metadata) != 0:
            return orig(self, input_bundle, input_index)
        sch = input_bundle.schema
        if _is_empty_schema(sch) or \
                self._has_schemas_broadcasted.get(input_index):
            # no data AND (no schema to offer, or schema already
            # delivered) -> the bundle contributes nothing
            return None
        try:
            tbl = sch.empty_table()
        except AttributeError:   # pandas-block schema; nothing to offer
            return None
        pool = self._aggregator_pool
        for pid in range(pool.num_partitions):
            pool.get_aggregator_for_partition(pid).submit.remote(
                input_index, pid, tbl)
        self._has_schemas_broadcasted[input_index] = True
        return None

    base._do_add_input_inner = guarded
    base._pyrosm_ray_empty_guard = True


def tune_shuffle_context() -> None:
    """Route all-to-alls through Ray's HASH_SHUFFLE strategy, sized to
    the live cluster.

    The default SORT_SHUFFLE_PULL_BASED executes every keyed groupby as
    a full distributed SORT of the input — a global order no
    co-partitioning kernel needs. Measured at sf3/8 CPUs on the
    co-partitioned PIP join: the Sort operator alone took 96.7 s of a
    107.8 s wall; the identical plan under HASH_SHUFFLE ran 45.7 s
    back-to-back (key-hash bucketing straight into aggregator
    partitions). Hash bucketing is also the shape that scales on a real
    cluster: map outputs stream to per-partition aggregators with no
    global sample/merge barrier.

    When a groupby omits ``num_partitions`` Ray would use 200 partitions
    and up to 64 aggregator ACTORS regardless of cluster size (pure
    actor thrash on small clusters), so both knobs are resized to the
    cluster. Called at package import (strategy) and again from the
    partition-sizing helpers below (cluster size is only known after
    ``ray.init``)."""
    _install_hash_shuffle_empty_block_guard()
    ctx = rd.DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    cpus = _cluster_cpus()
    ctx.default_hash_shuffle_parallelism = max(2, 2 * cpus)
    ctx.max_hash_shuffle_aggregators = max(2, cpus)


def groupby_partitions(n_keys: int | None = None) -> int:
    """Partition count for a hash-shuffle ``groupby``: ~2x the cluster's
    CPUs, capped by the key-domain size. Ray's default is 200 partitions
    and up to 64 aggregator ACTORS regardless of cluster size — on a
    2-CPU run that is pure actor thrash, and at toy scale the spin-up is
    the whole stage wall. Partition count only controls the shuffle
    fan-out; ``map_groups`` still sees one call per distinct key."""
    tune_shuffle_context()
    cpus = _cluster_cpus()
    p = max(2, 2 * cpus)
    if n_keys:
        p = min(p, int(n_keys))
    return p


def keyed_sum_fold(ds, key_col: str, val_cols: list[str],
                   num_partitions: int | None = None):
    """``groupby(key).sum(vals)`` through ONE coarse hash bucket + an
    in-partition factorize/add.at fold. Ray's HashAggregate pays per
    DISTINCT KEY (the measured 7x line_dedup pathology; dup_spans'
    500 k-doc final sum went 180 -> 60 s on this switch), the fold pays
    per PARTITION — the right shape whenever the key domain is large
    (vocabularies, node ids, doc ids). Output columns keep their input
    names. Keys may be int64 or string; values must be int64."""
    import numpy as np
    import pyarrow as pa

    from pyrosm_ray.stages.hashing import hash64, stable64_many

    nb = num_partitions or groupby_partitions()
    empty = pa.table({key_col: pa.array([], pa.int64()),
                      **{c: pa.array([], pa.int64()) for c in val_cols}})

    def bucket(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            h = hash64(np.asarray(col.to_numpy(zero_copy_only=False),
                                  np.int64).view(np.uint64), 13)
        else:
            h = stable64_many(col.to_pylist())
        return t.append_column(
            "__q", pa.array((h % np.uint64(nb)).astype(np.int64)))

    def fold(g: pa.Table) -> pa.Table:
        return _fold_keyed(g, key_col, val_cols)

    return ds.map_batches(bucket, batch_format="pyarrow") \
        .groupby("__q", num_partitions=nb) \
        .map_groups(fold, batch_format="pyarrow")


def _fold_keyed(g: "pa.Table", key_col: str, val_cols: list[str]):
    """One factorize/add.at keyed-sum pass over a table (the
    :func:`keyed_sum_fold` partition body)."""
    import numpy as np
    import pyarrow as pa

    if g.num_rows == 0:
        return pa.table({key_col: g[key_col],
                         **{c: g[c] for c in val_cols}})
    import pandas as pd
    keys = g[key_col].to_numpy(zero_copy_only=False) \
        if pa.types.is_integer(g[key_col].type) \
        else np.asarray(g[key_col].to_pylist(), dtype=object)
    codes, uniq = pd.factorize(keys)
    out = {key_col: pa.array(uniq, g[key_col].type)}
    for c in val_cols:
        v = np.asarray(g[c].to_numpy(zero_copy_only=False),
                       np.int64)
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, codes, v)
        out[c] = pa.array(acc, pa.int64())
    return pa.table(out)


# inputs up to this many rows take the driver fold (the dup_spans
# driver policy: batch-local partials are already key-compressed, so the
# driver sees ~num_blocks x keys rows — at these counts the shuffle's
# aggregator-actor spin-up IS the operator wall)
KEYED_FOLD_DRIVER_MAX = 100_000


def keyed_sum_auto(raw_ds, partials, key_col: str, val_cols: list[str],
                   num_partitions: int | None = None):
    """Route a partial-count aggregate: driver fold when the partial
    stream is small, the coarse hash fold sized to the data beyond.
    Identical output either way.

    The partials pipeline (and its upstream plan) executes exactly ONCE —
    it is materialized here and the route gate reads the materialized row
    count, so a non-fresh-read upstream is never re-executed just to pick
    a route (round-4 advice: the old ``raw_ds.count()`` gate ran the whole
    upstream plan and the chosen route then ran it again). The partials
    are narrow key-compressed (key, counts) rows — bounded by
    blocks x keys, the same rows the fold route would shuffle — so
    pinning them in the object store costs no more than the shuffle
    itself.  ``raw_ds`` is kept for signature stability but unused."""
    del raw_ds
    parts = partials.materialize()
    n_part = parts.count()  # metadata-only on a materialized dataset
    if n_part > KEYED_FOLD_DRIVER_MAX:
        # map-side combine level: per-BLOCK partials are bounded by each
        # block's key domain, so with many input blocks the stream holds
        # ~blocks x keys rows of which only ~keys are distinct. Coalesce
        # to ~cluster-width blocks (repartition(shuffle=False) = minimal
        # block-level movement, NO keyed exchange) and re-fold each —
        # tile_rollup's sf3 fine level shrinks 2M partial rows to ~2%
        # of that before any hash shuffle or driver collect runs.
        cpus = _cluster_cpus()
        merged = parts.repartition(max(2, cpus)).map_batches(
            lambda b: _fold_keyed(b, key_col, val_cols),
            batch_format="pyarrow").materialize()
        n_merged = merged.count()
        if n_merged < n_part:
            parts, n_part = merged, n_merged
    if n_part <= KEYED_FOLD_DRIVER_MAX:
        return keyed_sum_driver(parts, key_col, val_cols)
    return keyed_sum_fold(parts, key_col, val_cols,
                          num_partitions=num_partitions
                          or partitions_for_rows(n_part))


def keyed_sum_driver(partials, key_col: str, val_cols: list[str],
                     schema: "pa.Schema | None" = None):
    """Driver twin of :func:`keyed_sum_fold` over an already-partial
    Dataset: stream the partial batches to the driver and run ONE fold —
    identical output (as a one-block Dataset, like the fold), no shuffle
    fixed cost. Callers (``keyed_sum_auto``) pass MATERIALIZED partials,
    so gating on their count and then streaming them here never
    re-executes the upstream plan."""
    import pyarrow as pa
    import ray.data as rd

    all_parts = [pa.table(b)
                 for b in partials.iter_batches(batch_format="pyarrow")]
    parts = [t for t in all_parts if t.num_rows]
    if not parts:
        # typed-empty: a zero-row partial still carries the UDF's schema
        empty = all_parts[0] if all_parts else (
            schema.empty_table() if schema is not None else pa.table(
                {key_col: pa.array([], pa.string()),
                 **{c: pa.array([], pa.int64()) for c in val_cols}}))
        return rd.from_arrow(empty)
    return rd.from_arrow(
        _fold_keyed(pa.concat_tables(parts), key_col, val_cols))


def partitions_for_rows(n: int, rows_per_part: int = 250_000) -> int:
    """Shuffle width for a KNOWN row count, capped at the cluster width."""
    import numpy as np
    return int(np.clip(n // rows_per_part + 1, 2, groupby_partitions()))


def sized_partitions(*dss, rows_per_part: int = 250_000) -> int:
    """Shuffle width sized to the DATA, capped at the cluster width
    (each hash-shuffle partition spins up an aggregator actor; 64
    partitions over 100 k rows is pure actor spin-up — the
    latest_at_bucketed precedent, stages/history.py). count() is
    metadata-only on fresh reads, one cheap extra pass otherwise."""
    try:
        n = sum(int(d.count()) for d in dss)
        return partitions_for_rows(n, rows_per_part)
    except Exception:
        return groupby_partitions()


def shuffle_join_args(num_partitions: int | None = None) -> dict:
    """Join/shuffle kwargs sized so aggregator actors can never starve the
    map side: the pool reserves at most ~half the cluster's CPUs.

    Ray's hash-shuffle join spawns ``min(num_partitions, max)`` aggregator
    ACTORS holding their CPU reservation for the operator's lifetime; a
    fixed ``8 x 0.25`` recipe deadlocks a 2-CPU cluster (the whole
    allotment goes to aggregators and no map task can run)."""
    tune_shuffle_context()
    cpus = _cluster_cpus()
    np_ = num_partitions or max(2, min(8, cpus))
    agg_cpus = max(0.05, min(0.25, (cpus / 2.0) / np_))
    return {"num_partitions": np_,
            "aggregator_ray_remote_args": {"num_cpus": agg_cpus}}


def scrub_empty_blocks(ds, empty_schema: pa.Table | None = None) -> rd.Dataset:
    """Drop the ZERO-COLUMN empty blocks hash-shuffle ``map_groups`` /
    aggregates emit for partitions that received no groups.

    Those schema-less blocks poison downstream acero joins ("No match
    ... for key field reference" — a join partition fed only by them
    builds a schema-less table). Neither ``map_batches`` (Ray's map
    operator passes 0-row blocks through without invoking the UDF) nor
    ``repartition`` (0-row blocks survive the split, measured) can fix
    them, so this is a materialize + drop-by-row-count over the real
    block refs — the only airtight scrub. The barrier cost is bounded:
    every call site scrubs a groupby OUTPUT (already an all-to-all
    product), never raw input. If every block is empty, returns a
    one-block Dataset with ``empty_schema`` (or the dataset's own
    schema when it has one)."""
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if refs:
        return rd.from_arrow_refs(refs)
    if empty_schema is None:
        sch = mat.schema(fetch_if_missing=False)
        base = getattr(sch, "base_schema", None) if sch is not None else None
        empty_schema = base.empty_table() if base is not None \
            else pa.table({})
    return rd.from_arrow(empty_schema)


def nonempty(ds, empty_schema: pa.Table) -> rd.Dataset:
    """Materialize ``ds`` and drop empty blocks; if nothing remains, return
    a one-block Dataset with ``empty_schema`` (a zero-row typed table)."""
    return scrub_empty_blocks(ds, empty_schema)
