"""History-table operators (reference A1/M10: full-history reads keep the
latest version per element; an invisible latest drops the element —
/root/reference/pyrosm/data_filter.pyx:340-343).

Fully distributed and vectorised: a groupby max picks each element's last
version, a hash join selects those rows, a vector filter drops invisible
ones. No per-id Python groups (the round-1 inline ``map_groups`` built a
one-row pandas frame per OSM id)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pyrosm_ray.stages.blocks import nonempty, shuffle_join_args


def latest_versions(ds, id_col: str = "id", version_col: str = "version",
                    visible_col: str = "visible",
                    num_partitions: int = 8):
    """Rows holding each id's maximum version, invisible latest dropped.

    ``(id, version)`` must be unique per row (OSM history semantics)."""
    mx = ds.groupby(id_col).max(version_col)

    ver_type = None
    sch = ds.schema()
    if sch is not None and version_col in sch.names:
        ver_type = sch.types[sch.names.index(version_col)]

    def rename(batch: pa.Table) -> pa.Table:
        ver = batch[f"max({version_col})"]
        if ver_type is not None and ver.type != ver_type:
            # aggregate max widens int32 -> int64; the acero join demands
            # identical key types on both sides
            ver = pc.cast(ver, ver_type)
        return pa.table({"__id": batch[id_col], "__ver": ver})
    mx = nonempty(mx.map_batches(rename, batch_format="pyarrow"),
                  pa.table({"__id": pa.array([], pa.int64()),
                            "__ver": pa.array([], ver_type or pa.int64())}))
    j = ds.join(mx, "inner", on=(id_col, version_col),
                right_on=("__id", "__ver"),
                **shuffle_join_args(num_partitions))
    if visible_col is None:
        return j

    def keep_visible(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.fill_null(batch[visible_col], False))

    return j.map_batches(keep_visible, batch_format="pyarrow")
