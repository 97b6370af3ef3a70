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
    scrubbed = scrub_empty_blocks(_grouped_min(3, 16))
    mat = scrubbed.materialize()
    assert mat.schema().names == ["k", "m"]
    # no zero-row (schema-less) block survives the scrub
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            assert meta.num_rows
    assert mat.count() == 3


def test_hash_shuffle_guard_degraded_empty_block(ray_session):
    """A 0-row block skips map UDFs and loses its schema; un-guarded,
    hash-shuffle groupby broadcasts that empty schema when it arrives
    first and aggregators crash sorting by the key ("Invalid sort key
    column"). The empty-block guard drops such bundles at the operator
    input, so the keyed groupby over a mixed (typed + degraded-empty)
    dataset must succeed and see every real row."""
    t_empty = pa.table({"v": pa.array([], pa.int64())})
    t_full = pa.table({"v": pa.array(list(range(12)), pa.int64())})
    # the empty block rides FIRST in the union so, absent the guard, it
    # is typically the first bundle the shuffle sees
    ds = rd.from_arrow(t_empty).union(rd.from_arrow(t_full))
    # map adds the GROUP KEY -> the empty block skips the UDF and
    # arrives at the shuffle schema-less and key-less
    keyed = ds.map_batches(
        lambda b: b.append_column(
            "k", pa.array([int(x) % 3 for x in b["v"].to_pylist()],
                          pa.int64())),
        batch_format="pyarrow")
    out = keyed.groupby("k", num_partitions=8).map_groups(
        lambda g: pa.table({"k": pa.array([g["k"][0].as_py()], pa.int64()),
                            "n": pa.array([len(g)], pa.int64())}),
        batch_format="pyarrow").to_pandas()
    assert sorted(out.k) == [0, 1, 2]
    assert int(out.n.sum()) == 12


def test_hash_join_fully_empty_side(ray_session):
    """Vanilla Ray 2.49 hash join crashes when one side is a fully-empty
    typed Dataset (zero-row blocks short-circuit before the schema
    broadcast, so aggregator partitions finalize schema-less). The
    guard's driver-side broadcast must make this return 0 rows."""
    left = rd.from_items([{"k": i % 3, "pid": i} for i in range(10)])
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "v": pa.array([], pa.float64())})
    j = left.join(rd.from_arrow(empty), "inner", on=("k",),
                  **shuffle_join_args(4))
    assert j.count() == 0


def test_scrub_empty_blocks_all_empty_uses_schema(ray_session):
    ds = rd.from_items([{"k": 1, "v": 1}]).filter(lambda r: False)
    empty = pa.table({"k": pa.array([], pa.int64()),
                      "m": pa.array([], pa.int64())})
    out = scrub_empty_blocks(ds, empty)
    assert out.count() == 0
    assert out.schema().names == ["k", "m"]


def test_keyed_sum_auto_route_parity(ray_session, monkeypatch):
    import numpy as np
    import ray.data as rd

    from pyrosm_ray.stages import blocks

    rng = np.random.RandomState(21)
    n = 5000
    t = pa.table({
        "k": pa.array(rng.randint(0, 400, n), pa.int64()),
        "v": pa.array(rng.randint(-50, 50, n), pa.int64()),
    })

    def partial(b):
        return b  # rows already (key, val) shaped

    ds = rd.from_arrow(t).repartition(6)
    fast = blocks.keyed_sum_auto(ds, ds.map_batches(
        partial, batch_format="pyarrow"), "k", ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    monkeypatch.setattr(blocks, "KEYED_FOLD_DRIVER_MAX", 0)
    ds2 = rd.from_arrow(t).repartition(6)
    slow = blocks.keyed_sum_auto(ds2, ds2.map_batches(
        partial, batch_format="pyarrow"), "k", ["v"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(fast.k) == list(slow.k)
    assert list(fast.v) == list(slow.v)
    # ground truth
    import pandas as pd
    truth = t.to_pandas().groupby("k", sort=True)["v"].sum()
    assert list(fast.v) == list(truth)


def test_keyed_sum_auto_executes_upstream_once(ray_session):
    """The route gate must not re-execute a non-fresh-read upstream plan:
    the partials pipeline materializes once, and both the gate and the
    chosen route read the materialized result (round-4 advice)."""
    import ray
    import ray.data as rd

    from pyrosm_ray.stages import blocks

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def bump(self):
            self.n += 1

        def get(self):
            return self.n

    c = Counter.remote()

    def partial(b: pa.Table) -> pa.Table:
        ray.get(c.bump.remote())
        return pa.table({"k": b["k"], "n": b["n"]})

    t = pa.table({"k": pa.array(["a", "b", "a", "c"] * 10, pa.string()),
                  "n": pa.array([1] * 40, pa.int64())})
    ds = rd.from_arrow(t).repartition(2)
    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = blocks.keyed_sum_auto(ds, partials, "k", ["n"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert dict(zip(out.k, out.n)) == {"a": 20, "b": 10, "c": 10}
    # the partial UDF ran exactly once per input block (2 blocks), not
    # once for the gate plus once for the route
    assert ray.get(c.get.remote()) == 2
