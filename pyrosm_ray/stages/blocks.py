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


def groupby_partitions(n_keys: int | None = None) -> int:
    """Partition count for a hash-shuffle ``groupby``: ~2x the cluster's
    CPUs, capped by the key-domain size. Ray's default is 200 partitions
    and up to 64 aggregator ACTORS regardless of cluster size — on a
    2-CPU run that is pure actor thrash, and at toy scale the spin-up is
    the whole stage wall. Partition count only controls the shuffle
    fan-out; ``map_groups`` still sees one call per distinct key."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
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
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    np_ = num_partitions or max(2, min(8, cpus))
    agg_cpus = max(0.05, min(0.25, (cpus / 2.0) / np_))
    return {"num_partitions": np_,
            "aggregator_ray_remote_args": {"num_cpus": agg_cpus}}


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
