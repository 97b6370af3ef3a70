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


def scrub_empty_blocks(ds, num_blocks: int | None = None) -> rd.Dataset:
    """Coalesce away the ZERO-COLUMN empty blocks hash-shuffle
    ``map_groups`` emits for partitions that received no groups.

    Those schema-less blocks poison downstream acero joins ("No match
    ... for key field reference" — the join adopts the empty schema for
    partitions fed only by them). ``map_batches`` can't fix them (Ray's
    map operator passes 0-row blocks through without invoking the UDF),
    but ``repartition`` concatenates them into typed neighbours. Unlike
    :func:`nonempty` this stays a lazy distributed op — no driver
    materialize barrier."""
    return ds.repartition(num_blocks or groupby_partitions())


def nonempty(ds, empty_schema: pa.Table) -> rd.Dataset:
    """Materialize ``ds`` and drop empty blocks; if nothing remains, return
    a one-block Dataset with ``empty_schema`` (a zero-row typed table)."""
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return rd.from_arrow(empty_schema)
    return rd.from_arrow_refs(refs)
