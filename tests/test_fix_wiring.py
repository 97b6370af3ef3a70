"""Geometry fixer (M23), complete_relations (J6), keep_metadata, and
checkpoint resume — the previously-dead or untested surfaces."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pyrosm_ray.fixtures import TEST_BBOX, ensure_fixtures
from pyrosm_ray.geom import wkb as wkblib
from pyrosm_ray.geom.fix import _ring_self_intersection, fix_polygon_wkb, \
    split_bowtie_ring
from pyrosm_ray.pipelines.checkpoints import CheckpointManager
from pyrosm_ray.pipelines.layers import OSM


# ---------------------------------------------------------------------------
# geometry fixer
# ---------------------------------------------------------------------------

BOWTIE = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0],
                   [0.0, 0.0]])


def test_ring_self_intersection_found():
    hit = _ring_self_intersection(BOWTIE)
    assert hit is not None
    i, j, p = hit
    assert np.allclose(p, [1.0, 1.0])


def test_simple_ring_no_intersection():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    assert _ring_self_intersection(sq) is None


def test_split_bowtie_two_triangles():
    loops = split_bowtie_ring(BOWTIE)
    assert len(loops) == 2
    areas = sorted(abs(np.sum(r[:-1, 0] * r[1:, 1] - r[1:, 0] * r[:-1, 1]))
                   * 0.5 for r in loops)
    assert np.allclose(areas, [1.0, 1.0])
    for r in loops:
        assert _ring_self_intersection(r) is None  # simple now
        assert np.array_equal(r[0], r[-1])         # closed


def test_fix_polygon_wkb_bowtie():
    buf = wkblib.polygon_wkb([BOWTIE])
    fixed = fix_polygon_wkb(buf)
    gt, payload = wkblib.decode_wkb(fixed)
    assert gt == wkblib.MULTIPOLYGON
    assert len(payload) == 2  # two faces, like the reference's polygonize
    # valid polygon passes through byte-identically
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    ok = wkblib.polygon_wkb([sq])
    assert fix_polygon_wkb(ok) == ok


# ---------------------------------------------------------------------------
# complete_relations (J6)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def fx():
    return str(ensure_fixtures("/root/testdata/sf0.001"))


def _relation_geoms(df):
    sub = df[df["osm_type"] == "relation"]
    return dict(zip(sub["id"], sub["geometry"]))


def test_complete_relations_restores_straddling_geometry(ray_session, fx):
    """Mirror of the reference's straddling-relation test
    (tests/test_complete_relations.py): the StraddleRel fixture relation
    has one member way inside TEST_BBOX and one wholly outside; with
    complete_relations=True the bbox read reproduces the whole-file
    geometry byte-for-byte."""
    whole = _relation_geoms(OSM(fx).get_buildings().to_pandas())
    partial = _relation_geoms(
        OSM(fx, bounding_box=TEST_BBOX).get_buildings().to_pandas())
    complete = _relation_geoms(
        OSM(fx, bounding_box=TEST_BBOX,
            complete_relations=True).get_buildings().to_pandas())
    common = set(complete) & set(whole)
    assert common
    for rid in common:
        assert complete[rid] == whole[rid]
    # and the partial read really is cut for at least one relation
    assert any(partial.get(rid) != whole[rid] for rid in common
               if rid in partial) or set(partial) < set(complete)


# ---------------------------------------------------------------------------
# keep_metadata
# ---------------------------------------------------------------------------

def test_keep_metadata_column_control(ray_session, fx):
    lean = OSM(fx).get_buildings().to_pandas()
    assert "version" not in lean.columns
    assert "timestamp" not in lean.columns
    rich = OSM(fx, keep_metadata=True).get_buildings().to_pandas()
    for c in ("version", "timestamp", "visible"):
        assert c in rich.columns
    ways = rich[rich.osm_type == "way"]
    assert ways["version"].notna().all()
    assert len(lean) == len(rich)


# ---------------------------------------------------------------------------
# checkpoint resume
# ---------------------------------------------------------------------------

def test_partitioned_checkpoint_resume(ray_session, tmp_path):
    calls = []

    def build(key):
        calls.append(key)
        if key == "b" and len([c for c in calls if c == "b"]) == 1:
            raise RuntimeError("simulated crash")
        return rd.from_arrow(pa.table({
            "part": pa.array([key] * 3, pa.string()),
            "x": pa.array([1, 2, 3], pa.int64())}))

    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(RuntimeError):
        mgr.run_partitioned("stage1", ["a", "b", "c"], build)
    assert mgr.completed_parts("stage1") == {"a"}

    out = mgr.run_partitioned("stage1", ["a", "b", "c"], build)
    # 'a' was not rebuilt: appears once in the pre-crash run only
    assert calls.count("a") == 1
    assert calls.count("b") == 2
    df = out.to_pandas()
    assert len(df) == 9
    assert set(df["part"]) == {"a", "b", "c"}
    # manifest carries lineage + row counts
    rows = sum(m["rows"] for m in mgr.manifest("stage1"))
    assert rows == 9


def test_checkpoint_sweeps_stale_tmp(ray_session, tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    stale = tmp_path / "s2" / "part-zzz.tmp"
    stale.mkdir(parents=True)
    (stale / "junk.parquet").write_bytes(b"not parquet")

    def build(key):
        return rd.from_arrow(pa.table({"x": pa.array([int(key)])}))

    out = mgr.run_partitioned("s2", ["1"], build)
    assert not stale.exists()
    assert out.to_pandas()["x"].tolist() == [1]


# ---------------------------------------------------------------------------
# output boundary: occurring-tags-only contract (M8)
# ---------------------------------------------------------------------------

def test_collect_layer_drops_empty_tag_columns(ray_session, fx):
    from pyrosm_ray.pipelines.layers import collect_layer
    raw = OSM(fx).get_buildings().to_pandas()
    lean = collect_layer(OSM(fx).get_buildings())
    dropped = set(raw.columns) - set(lean.columns)
    assert dropped  # the building preset has never-occurring tag columns
    assert all(raw[c].isna().all() for c in dropped)
    # contract columns always survive
    for c in ("id", "osm_type", "geometry", "tags", "building"):
        assert c in lean.columns
    assert len(lean) == len(raw)


def test_straddling_relation_count(ray_session, fx):
    """A8: the StraddleRel fixture relation has one member way in
    TEST_BBOX and one outside -> exactly the straddling set a bbox read
    would cut."""
    osm = OSM(fx, bounding_box=TEST_BBOX)
    n = osm.count_straddling_relations(["building"], {"building": [True]})
    assert n == 1
    assert OSM(fx).count_straddling_relations(
        ["building"], {"building": [True]}) == 0
