"""Directed-edge expansion truth table (M27), SCC restriction (A9),
OSMnx export (M28), and raster zonal stats — the round-1 untested
components."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.geom import wkb as wkblib
from pyrosm_ray.pipelines.graph import directed_edges, largest_scc_edges, \
    street_count_per_node, to_networkx
from pyrosm_ray.tiles import grid


def _edges(rows):
    cols = {k: [r.get(k) for r in rows] for k in
            {k for r in rows for k in r}}
    t = {}
    for k, v in cols.items():
        if k in ("u", "v"):
            t[k] = pa.array(v, pa.int64())
        else:
            t[k] = pa.array(v, pa.string())
    return rd.from_arrow(pa.table(t))


def _expand(rows, **kwargs):
    out = directed_edges(_edges(rows), **kwargs).to_pandas()
    return sorted(zip(out["u"], out["v"]))


def test_directed_edges_truth_table(ray_session):
    """M27 (reference oneway value set: yes/true/1/T/F, against: -1/T)."""
    # plain two-way street -> both directions
    assert _expand([{"u": 1, "v": 2}]) == [(1, 2), (2, 1)]
    # oneway=yes -> forward only
    assert _expand([{"u": 1, "v": 2, "oneway": "yes"}]) == [(1, 2)]
    for val in ("true", "1", "F"):
        assert _expand([{"u": 1, "v": 2, "oneway": val}]) == [(1, 2)]
    # against-direction values flip u/v
    for val in ("-1", "T"):
        assert _expand([{"u": 1, "v": 2, "oneway": val}]) == [(2, 1)]
    # junction=roundabout implies oneway forward
    assert _expand([{"u": 1, "v": 2, "junction": "roundabout"}]) == [(1, 2)]
    # oneway:bicycle override beats oneway for the bicycle direction col
    assert _expand([{"u": 1, "v": 2, "oneway": "yes",
                     "oneway:bicycle": "no"}],
                   direction_suffix="bicycle") == [(1, 2), (2, 1)]
    # force_bidirectional ignores oneway entirely
    assert _expand([{"u": 1, "v": 2, "oneway": "yes"}],
                   force_bidirectional=True) == [(1, 2), (2, 1)]


def test_street_count(ray_session):
    out = street_count_per_node(_edges(
        [{"u": 1, "v": 2}, {"u": 2, "v": 3}, {"u": 2, "v": 4}]))
    counts = dict(zip(out["node_id"], out["street_count"]))
    assert counts == {1: 1, 2: 3, 3: 1, 4: 1}


def test_largest_scc():
    # cycle 1-2-3-1 plus a dangling one-way tail 3->4
    df = pd.DataFrame({"u": [1, 2, 3, 3], "v": [2, 3, 1, 4]})
    kept = largest_scc_edges(df)
    assert sorted(zip(kept["u"], kept["v"])) == [(1, 2), (2, 3), (3, 1)]


def test_to_networkx_osmnx_compat():
    nodes = pd.DataFrame({"id": [1, 2, 3], "lon": [0.0, 1.0, 2.0],
                          "lat": [0.0, 0.0, 0.0]})
    edges = pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 1],
                          "id": [10, 11, 12],
                          "length": [1.0, 1.0, 1.0]})
    g = to_networkx(nodes, edges)
    assert g.graph["crs"] == "epsg:4326"
    assert g.nodes[1]["x"] == 0.0 and g.nodes[1]["osmid"] == 1
    data = g.get_edge_data(1, 2)
    assert 0 in data  # multigraph key 0, OSMnx-style
    assert data[0]["osmid"] == 10


def test_to_networkx_skips_dangling_edges():
    """J9: an edge whose endpoint has no node row is skipped, not
    auto-created as a coordinate-less node (reference
    graph_export.pyx:74-102 semantics)."""
    nodes = pd.DataFrame({"id": [1, 2, 3], "lon": [0.0, 1.0, 2.0],
                          "lat": [0.0, 0.0, 0.0]})
    edges = pd.DataFrame({"u": [1, 2, 3, 3], "v": [2, 3, 1, 99],
                          "id": [10, 11, 12, 13],
                          "length": [1.0, 1.0, 1.0, 1.0]})
    g = to_networkx(nodes, edges, retain_all=True)
    assert 99 not in g.nodes
    assert g.number_of_edges() == 3
    assert all("x" in d for _, d in g.nodes(data=True))


def test_raster_zonal_stats(ray_session):
    """Rasterize points per tile, zonal-reduce under a polygon covering
    half the tile -> the mask sum equals the points that fell inside."""
    from pyrosm_ray.stages.raster import polygon_zonal_stats, \
        rasterize_points
    res = grid.h3_equiv_res(7)
    # one tile; its bounds
    cell = int(grid.cell_id(np.array([24.9]), np.array([60.2]), res)[0])
    x0, y0, x1, y1 = grid.cell_bounds(np.array([cell]))[0]
    rng = np.random.default_rng(2)
    lon = rng.uniform(x0, x1, 4000)
    lat = rng.uniform(y0, y1, 4000)
    pts = rd.from_arrow(pa.table({
        "h3_r7": pa.array(np.full(4000, cell), pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat)}))
    rast = rasterize_points(pts, grid_size=16).materialize()
    # polygon = left half of the tile
    xm = (x0 + x1) / 2
    ring = np.array([[x0, y0], [xm, y0], [xm, y1], [x0, y1], [x0, y0]])
    polys = rd.from_arrow(pa.table({
        "id": pa.array([7], pa.int64()),
        "geometry": pa.array([wkblib.polygon_wkb([ring])], pa.binary())}))
    out = polygon_zonal_stats(polys, rast, grid_size=16).to_pandas()
    row = out[out.h3_r7 == cell].iloc[0]
    assert row["pixel_count"] == 16 * 16 // 2
    # value_sum counts the points under the mask: ~half of 4000
    assert abs(row["value_sum"] - (lon < xm).sum()) <= 4000 * 0.02
    assert row["value_mean"] == row["value_sum"] / row["pixel_count"]


def test_osm_to_graph_export(ray_session):
    """Full export path on the fixture network: directed expansion +
    simplification + SCC + OSMnx attributes."""
    from pyrosm_ray.fixtures import ensure_fixtures
    from pyrosm_ray.pipelines.layers import OSM
    fx = str(ensure_fixtures("/root/testdata/sf0.001"))
    osm = OSM(fx)
    nodes_ds, edges_ds = osm.get_network("walking", nodes=True)
    g = osm.to_graph(nodes_ds, edges_ds, force_bidirectional=True,
                     simplify=True)
    assert g.number_of_nodes() > 0 and g.number_of_edges() > 0
    n0 = next(iter(g.nodes))
    assert {"x", "y", "osmid"} <= set(g.nodes[n0])
    # simplified edges carry summed lengths
    _, _, d0 = next(iter(g.edges(data=True)))
    assert d0["length"] > 0 and "n_segments" in d0
    # unsimplified graph has at least as many edges
    g2 = osm.to_graph(osm.get_network("walking", nodes=True)[0],
                      osm.get_network("walking", nodes=True)[1],
                      force_bidirectional=True, simplify=False)
    assert g2.number_of_edges() >= g.number_of_edges()


def test_igraph_payload_mapping():
    """Adapter layer (graph_export.pyx:29-108 contract): sequential vertex
    ids, seq edge list, attrs aligned, dangling edges skipped — testable
    without the igraph library."""
    from pyrosm_ray.pipelines.graph import igraph_payload, to_igraph
    nodes = pd.DataFrame({"id": [100, 200, 300],
                          "lon": [0.0, 1.0, 2.0], "lat": [0.0, 0.0, 1.0]})
    edges = pd.DataFrame({"u": [100, 300, 200, 999], "v": [200, 100, 300, 100],
                          "id": [1, 2, 3, 4],
                          "length": [5.0, 6.0, 7.0, 8.0]})
    n, edge_list, vattrs, eattrs = igraph_payload(nodes, edges)
    assert n == 3
    assert edge_list == [(0, 1), (2, 0), (1, 2)]  # dangling (999) skipped
    assert vattrs["id"] == [100, 200, 300]
    assert vattrs["node_id"] == [0, 1, 2]
    assert eattrs["length"] == [5.0, 6.0, 7.0]
    assert eattrs["u_seq"] == [0, 2, 1] and eattrs["v_seq"] == [1, 0, 2]
    # the lib itself is absent in this container -> clean ImportError
    import pytest as _pytest
    with _pytest.raises(ImportError, match="igraph"):
        to_igraph(nodes, edges)


def test_pandana_payload_mapping():
    from pyrosm_ray.pipelines.graph import pandana_payload, to_pandana
    nodes = pd.DataFrame({"id": [10, 20], "lon": [1.0, 2.0],
                          "lat": [3.0, 4.0]})
    edges = pd.DataFrame({"u": [10, 20, 10], "v": [20, 10, 77],
                          "length": [9.0, 8.0, 7.0]})
    kw = pandana_payload(nodes, edges)
    assert list(kw["node_x"]) == [1.0, 2.0]
    assert list(kw["node_x"].index) == [10, 20]
    assert list(kw["edge_from"]) == [10, 20]  # dangling (77) dropped
    assert list(kw["edge_weights"]["length"]) == [9.0, 8.0]
    assert kw["twoway"] is False
    import pytest as _pytest
    with _pytest.raises(ImportError, match="pandana"):
        to_pandana(nodes, edges)
