"""Offline S7 resolver: smallest-covering-extract selection + crop
(reference semantics geofabrik_index.py:96-171, no network)."""

import numpy as np
import pyarrow as pa
import pytest

from pyrosm_ray.fixtures import ensure_fixtures
from pyrosm_ray.geom import wkb as wkblib
from pyrosm_ray.sources.catalog import ExtractCatalog, get_data_by_bbox


def _rect_wkb(x0, y0, x1, y1):
    return wkblib.polygon_wkb([np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]])])


@pytest.fixture()
def catalog():
    # nested extracts: world > country > city, plus a holed region and a
    # disjoint island
    hole = np.array([[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 3.0],
                     [2.0, 2.0]])
    outer = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0],
                      [0.0, 0.0]])
    return ExtractCatalog(pa.table({
        "id": ["world", "country", "city", "holed", "island"],
        "name": ["World", "Country", "City", None, "Island"],
        "pbf": ["/data/world", "/data/country", "/data/city",
                "/data/holed", "/data/island"],
        "geometry": [
            _rect_wkb(-180, -80, 180, 80),
            _rect_wkb(-5, -5, 15, 15),
            _rect_wkb(0.5, 0.5, 1.5, 1.5),
            wkblib.polygon_wkb([outer, hole]),
            _rect_wkb(100, 40, 110, 50),
        ]}))


def test_smallest_covering_extract(catalog):
    # inside the city -> city (smallest), not country/world/holed
    assert catalog.covering_extract((0.9, 0.9, 1.1, 1.1))["id"] == "city"
    # inside country but outside city -> holed (outer covers, hole missed)
    assert catalog.covering_extract((5.0, 5.0, 6.0, 6.0))["id"] == "holed"
    # bbox straddling city boundary (missing the hole) -> holed covers
    # and is smaller than country
    assert catalog.covering_extract((1.0, 1.0, 1.8, 1.8))["id"] == "holed"
    # bbox CONTAINING the hole -> holed does not cover; country does
    assert catalog.covering_extract((1.0, 1.0, 4.0, 4.0))["id"] == "country"
    # bbox overlapping the HOLE -> holed does not cover; country does
    assert catalog.covering_extract((1.5, 1.5, 2.5, 2.5))["id"] == "country"
    # bbox inside the hole itself -> not covered by holed; country covers
    assert catalog.covering_extract((2.2, 2.2, 2.8, 2.8))["id"] == "country"
    # only the world covers a span across extracts
    assert catalog.covering_extract((-50, -50, 50, 50))["id"] == "world"


def test_covering_extract_error_contract(catalog):
    # overlaps the island but extends beyond it AND beyond the world? no —
    # world covers everything in range; go out of the world's latitudes
    with pytest.raises(ValueError, match="extends beyond"):
        catalog.covering_extract((100, 35, 120, 85))
    with pytest.raises(ValueError, match="outside the catalog"):
        ExtractCatalog(pa.table({
            "id": ["a"], "name": ["a"], "pbf": ["/x"],
            "geometry": [_rect_wkb(0, 0, 1, 1)]})) \
            .covering_extract((5, 5, 6, 6))


def test_covering_accepts_ring_and_wkb_areas(catalog):
    tri = np.array([[0.8, 0.8], [1.2, 0.8], [1.0, 1.2]])
    assert catalog.covering_extract(tri)["id"] == "city"
    assert catalog.covering_extract(
        _rect_wkb(0.9, 0.9, 1.1, 1.1))["id"] == "city"


def test_get_data_by_bbox_resolve_and_crop(ray_session, tmp_path):
    src = str(ensure_fixtures("sf0.001"))
    import pyarrow.parquet as pq
    nodes = pq.read_table(f"{src}/osm_nodes.parquet",
                          columns=["id", "lon", "lat"])
    lon = np.asarray(nodes["lon"].to_numpy(zero_copy_only=False))
    lat = np.asarray(nodes["lat"].to_numpy(zero_copy_only=False))
    cat = ExtractCatalog(pa.table({
        "id": ["fixture"], "name": ["Fixture"], "pbf": [src],
        "geometry": [_rect_wkb(lon.min() - 1, lat.min() - 1,
                               lon.max() + 1, lat.max() + 1)]}))
    bbox = (float(np.quantile(lon, 0.3)), float(np.quantile(lat, 0.3)),
            float(np.quantile(lon, 0.7)), float(np.quantile(lat, 0.7)))
    # resolve-only returns the catalog path
    assert get_data_by_bbox(bbox, cat, resolve_only=True) == src
    # crop writes a valid PBF whose nodes all fall in the bbox envelope
    # (plus complete-ways closure nodes)
    out = get_data_by_bbox(bbox, cat, directory=str(tmp_path))
    from pyrosm_ray.sources import pbf
    blobs = [b for b in pbf.scan_blob_index(out) if b["type"] == "OSMData"]
    assert blobs
    parts = [pbf.parse_primitive_block(
        pbf.read_blob_data(out, b["offset"], b["size"])) for b in blobs]
    n2 = pa.concat_tables([p[0] for p in parts])
    assert 0 < n2.num_rows < nodes.num_rows
