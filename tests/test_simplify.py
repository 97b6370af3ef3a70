"""Graph simplification: endpoint rules, chain walk, merge semantics.

Mirrors the reference's test strategy for its simplify module
(/root/reference/pyrosm/graph_simplify.py semantics; exercised there by
tests/test_graph_export.py): hand-built directed graphs with known chains,
plus parity between the distributed endpoint classifier and the driver
flags."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.geom import wkb as wkblib
from pyrosm_ray.pipelines.simplify import _endpoint_flags, _walk, \
    degree_stats, endpoints_ds, simplify_graph


def _bidir(pairs, lengths=None):
    """Undirected street list -> directed reciprocal edge frame."""
    rows = []
    for i, (a, b) in enumerate(pairs):
        ln = lengths[i] if lengths else 1.0
        rows.append((a, b, ln))
        rows.append((b, a, ln))
    return pd.DataFrame(rows, columns=["u", "v", "length"])


def test_endpoint_rules_path():
    # A-B-C-D path: B, C are clean pass-throughs; A, D dead... A and D have
    # in+out = 2 and 1 distinct nbr -> not pass-through -> endpoints
    e = _bidir([(0, 1), (1, 2), (2, 3)])
    u = e["u"].to_numpy()
    v = e["v"].to_numpy()
    ep = _endpoint_flags(u, v, 4, [])
    assert list(ep) == [True, False, False, True]


def test_endpoint_rules_junction_and_selfloop():
    # T junction at node 1 (3 distinct nbrs); self loop at node 4
    e = _bidir([(0, 1), (1, 2), (1, 3), (4, 4)])
    ep = _endpoint_flags(e["u"].to_numpy(), e["v"].to_numpy(), 5, [])
    assert ep[1] and ep[4]
    assert not ep[0] is None  # nodes 0,2,3 are stubs -> endpoints
    assert ep[0] and ep[2] and ep[3]


def test_endpoint_attr_differ():
    # B would be a pass-through, but incident edges disagree on 'highway'
    e = _bidir([(0, 1), (1, 2)])
    codes = pd.factorize(["a", "a", "b", "b"])[0]
    ep = _endpoint_flags(e["u"].to_numpy(), e["v"].to_numpy(), 3, [codes])
    assert ep[1]


def test_walk_collapses_path():
    e = _bidir([(0, 1), (1, 2), (2, 3)])
    u, v = e["u"].to_numpy(), e["v"].to_numpy()
    ep = _endpoint_flags(u, v, 4, [])
    flat, off = _walk(u, v, ep, remove_rings=True)
    # two chains (one per direction), each of 3 segments
    assert len(off) - 1 == 2
    assert sorted(np.diff(off).tolist()) == [3, 3]
    # every directed edge consumed exactly once
    assert sorted(flat.tolist()) == list(range(6))


def test_simplify_merges_length_and_attrs():
    pts = {0: (0.0, 0.0), 1: (0.001, 0.0), 2: (0.002, 0.0),
           3: (0.003, 0.0)}
    e = _bidir([(0, 1), (1, 2), (2, 3)], lengths=[111.195, 111.195,
                                                  111.195])
    e["highway"] = "residential"
    e["name"] = ["X", "X", "Y", "Y", "X", "X"]  # mixed within chain
    e["geometry"] = [wkblib.linestring_wkb(np.array(
        [pts[a], pts[b]])) for a, b in zip(e["u"], e["v"])]
    nodes = pd.DataFrame({
        "id": list(pts), "lon": [p[0] for p in pts.values()],
        "lat": [p[1] for p in pts.values()]})
    nodes_out, out = simplify_graph(nodes, e)
    assert len(out) == 2
    assert set(zip(out["u"], out["v"])) == {(0, 3), (3, 0)}
    assert (out["n_segments"] == 3).all()
    assert (out["length_mm"] == 3 * 111195).all()
    # uniform attr stays scalar; mixed attr becomes the per-segment list
    assert (out["highway"] == "residential").all()
    assert all(isinstance(x, list) and len(x) == 3 for x in out["name"])
    # stitched geometry spans 0 -> 3 with 4 vertices
    gt, coords = wkblib.decode_wkb(out.iloc[0]["geometry"])
    assert len(coords) == 4
    assert set(nodes_out["id"]) == {0, 3}


def test_ring_removal_and_keep():
    # pure ring 0-1-2-0 (all pass-through) with nothing attached
    e = _bidir([(0, 1), (1, 2), (2, 0)])
    u, v = e["u"].to_numpy(), e["v"].to_numpy()
    ep = _endpoint_flags(u, v, 3, [])
    assert not ep.any()
    flat, off = _walk(u, v, ep, remove_rings=True)
    assert len(off) - 1 == 0
    flat2, off2 = _walk(u, v, ep, remove_rings=False)
    assert sorted(flat2.tolist()) == list(range(6))


def test_endpoints_ds_matches_driver(ray_session):
    rng = np.random.default_rng(5)
    pairs = [(int(a), int(b)) for a, b in rng.integers(0, 40, (60, 2))
             if a != b]
    e = _bidir(pairs)
    ds = rd.from_arrow(pa.table({
        "u": pa.array(e["u"], pa.int64()),
        "v": pa.array(e["v"], pa.int64())}))
    got = endpoints_ds(ds).to_pandas().sort_values("node")
    nodes = np.unique(np.concatenate([e["u"], e["v"]]))
    u = np.searchsorted(nodes, e["u"].to_numpy())
    v = np.searchsorted(nodes, e["v"].to_numpy())
    expect = _endpoint_flags(u, v, len(nodes), [])
    assert list(got["node"]) == nodes.tolist()
    assert list(got["is_endpoint"]) == expect.tolist()


def test_degree_stats(ray_session):
    e = _bidir([(0, 1), (1, 2), (1, 3)])
    ds = rd.from_arrow(pa.table({
        "u": pa.array(e["u"], pa.int64()),
        "v": pa.array(e["v"], pa.int64())}))
    df = degree_stats(ds).to_pandas().set_index("node")
    assert df.loc[1, "out_deg"] == 3 and df.loc[1, "in_deg"] == 3
    assert df.loc[1, "distinct_nbrs"] == 3
    assert df.loc[0, "distinct_nbrs"] == 1
    assert not df["self_loop"].any()
