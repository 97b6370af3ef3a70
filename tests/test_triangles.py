"""Triangle counting (stages/triangles.py): hand oracles on known
graphs, DuckDB three-way-self-join twin, and driver/distributed route
parity on a random graph."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages import triangles as tr


def _edges_table(pairs):
    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    return pa.table({"src": a, "dst": b})


def test_k4_and_known_graphs(ray_session):
    # K4: every vertex is in C(3,2) = 3 triangles
    k4 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    out = tr.triangle_counts(rd.from_arrow(_edges_table(k4))).to_pandas()
    assert list(out.sort_values("node").n_triangles) == [3, 3, 3, 3]
    # K4 clustering coefficient is exactly 1.0 -> 1_000_000 micro
    assert list(out.sort_values("node").cc_micro) == [1_000_000] * 4
    assert list(out.sort_values("node").deg) == [3, 3, 3, 3]
    # 4-cycle: no triangles, all nodes present with 0
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    out = tr.triangle_counts(rd.from_arrow(_edges_table(c4))).to_pandas()
    assert list(out.sort_values("node").n_triangles) == [0, 0, 0, 0]
    # duplicate / reversed / self edges collapse to the simple graph
    noisy = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (2, 1), (2, 2)]
    out = tr.triangle_counts(
        rd.from_arrow(_edges_table(noisy))).to_pandas()
    assert list(out.sort_values("node").n_triangles) == [1, 1, 1]


def _random_edges(n_nodes=120, n_edges=900, seed=3):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, n_nodes, n_edges) * 7 + 3  # sparse ids
    d = rng.randint(0, n_nodes, n_edges) * 7 + 3
    return pa.table({"src": pa.array(s, pa.int64()),
                     "dst": pa.array(d, pa.int64())})


def test_matches_sql_twin(ray_session):
    t = _random_edges()
    got = tr.triangle_counts(rd.from_arrow(t)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.register("raw_edges", t)
    want = con.execute(tr.triangle_counts_sql(
        "edges AS (SELECT src, dst FROM raw_edges)")).fetchdf()
    assert list(got.node) == list(want.node)
    assert list(got.n_triangles) == list(want.n_triangles)
    assert list(got.deg) == list(want.deg)
    assert list(got.cc_micro) == list(want.cc_micro)
    assert got.n_triangles.sum() > 0  # the random graph has triangles


def test_route_parity(ray_session, monkeypatch):
    t = _random_edges(n_nodes=80, n_edges=700, seed=11)
    a = tr.triangle_counts(rd.from_arrow(t)).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    monkeypatch.setattr(tr, "TRI_DRIVER_MAX", 0)
    b = tr.triangle_counts(rd.from_arrow(t).repartition(5),
                           num_partitions=4).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert list(a.node) == list(b.node)
    assert list(a.n_triangles) == list(b.n_triangles)
    assert list(a.deg) == list(b.deg)
    assert list(a.cc_micro) == list(b.cc_micro)


def test_empty_and_single_edge(ray_session):
    out = tr.triangle_counts(rd.from_arrow(_edges_table([(1, 2)]))) \
        .to_pandas()
    assert list(out.sort_values("node").n_triangles) == [0, 0]
    out = tr.triangle_counts(
        rd.from_arrow(_edges_table([(5, 5)]))).to_pandas()
    assert len(out) == 0
