"""Hash-shuffle block hygiene: scrub_empty_blocks must neutralise the
ZERO-COLUMN empty blocks hash-shuffle groupbys/aggregates emit for
partitions that received no groups — those blocks otherwise poison a
downstream acero join ("No match ... for key field reference")."""

import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages.blocks import scrub_empty_blocks, shuffle_join_args


def _grouped_min(n_keys: int, num_partitions: int):
    """Aggregate with far more shuffle partitions than keys -> some
    partitions are empty and (under HASH_SHUFFLE) emit schema-less
    blocks."""
    ds = rd.from_items([{"k": i % n_keys, "v": i} for i in range(40)])
    return ds.groupby("k", num_partitions=num_partitions).map_groups(
        lambda g: pa.table({"k": pa.array([g["k"][0].as_py()], pa.int64()),
                            "m": pa.array([min(g["v"].to_pylist())],
                                          pa.int64())}),
        batch_format="pyarrow")


def test_scrub_empty_blocks_unblocks_join(ray_session):
    left = rd.from_items([{"k": i % 3, "pid": i} for i in range(30)])
    right = scrub_empty_blocks(_grouped_min(3, 16))
    j = left.join(right, "inner", on=("k",), **shuffle_join_args(8))
    df = j.to_pandas()
    assert len(df) == 30
    assert set(df.columns) == {"k", "pid", "m"}
    # every key's m is the min over its group
    assert df.groupby("k")["m"].nunique().eq(1).all()


def test_scrub_empty_blocks_drops_schemaless(ray_session):
    scrubbed = scrub_empty_blocks(_grouped_min(3, 16), num_blocks=4)
    mat = scrubbed.materialize()
    names = mat.schema().names
    assert names == ["k", "m"]
    # no zero-column block survives the coalesce
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            assert meta.num_rows is None or meta.num_rows >= 0
    assert mat.count() == 3
