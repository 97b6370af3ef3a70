"""Vectorised planar/spherical geometry kernels (numpy only — no GEOS).

The engine's geometry model is flat coordinate arrays + offsets (CSR), the
same shape the reference's vectorised builders use
(/root/reference/pyrosm/geometry.pyx:404-620); geometries cross stage
boundaries as WKB binary columns (see :mod:`pyrosm_ray.geom.wkb`).

Semantics preserved from the reference:

* haversine length: per-segment metres rounded to 3 decimals, way length =
  segment sum rounded to 0 decimals (pyrosm/distance.py:77-90).
* shoelace ring orientation + OGC right-hand-rule normalisation (exterior
  CCW, holes CW) (pyrosm/geometry.pyx:17-24).
* closed-way area rule: ``area=yes`` -> polygon, ``area=no`` -> linestring,
  else polygon unless the way carries a highway/barrier/route tag
  (pyrosm/geometry.pyx:381-389,496-503).
* relation linestring rule (pyrosm/relations.pyx:72-134).
* point-in-polygon: even-odd ray casting — consistent with the reference's
  even-odd multipolygon overlay (pyrosm/geometry.pyx:195-240), so a point is
  inside a multipolygon iff it is covered by an odd number of rings.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371.0088 * 1000.0  # mean earth radius, as the reference


# ---------------------------------------------------------------------------
# distances
# ---------------------------------------------------------------------------

def haversine_m(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Great-circle distance in metres (vectorised)."""
    lat1, lon1, lat2, lon2 = (np.deg2rad(np.asarray(a, dtype=np.float64))
                              for a in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    h = np.sin(dlat * 0.5) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon * 0.5) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(h))


def unit_vecs(lat, lon) -> np.ndarray:
    """(N, 3) unit sphere vectors — trig per POINT, so pair distances can
    rank by dot product (strictly monotone with great-circle distance:
    larger dot = closer). Candidate-selection kernels use this instead of
    an all-pairs :func:`haversine_m` matrix, then evaluate the exact
    haversine only on the selected few — per-pair trig is the FLOP wall
    of a dense distance matrix, and the exact top-k set is unchanged as
    long as selection keeps a small rank margin for float ties."""
    la = np.deg2rad(np.asarray(lat, dtype=np.float64))
    lo = np.deg2rad(np.asarray(lon, dtype=np.float64))
    cla = np.cos(la)
    return np.stack([cla * np.cos(lo), cla * np.sin(lo), np.sin(la)],
                    axis=1)


def polyline_lengths_m(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-polyline haversine length with the reference's rounding contract.

    ``coords`` is (N,2) lon/lat; ``offsets`` (M+1,) CSR bounds per line.
    Each segment is rounded to 3 decimals, the per-line sum to 0 decimals
    (pyrosm/distance.py:77-90 calculate_geom_length).
    """
    coords = np.asarray(coords, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    n = len(coords)
    if n == 0:
        return np.zeros(len(offsets) - 1, dtype=np.float64)
    seg = haversine_m(coords[:-1, 1], coords[:-1, 0], coords[1:, 1], coords[1:, 0])
    # integer-millimetre arithmetic: float summation order would otherwise
    # decide exact .5-metre boundary cases differently per engine; the final
    # metre rounding is explicit half-away ((mm + 500) // 1000), the one
    # deliberate deviation from the reference's np.round half-to-even
    seg_mm = np.round(seg * 1000.0).astype(np.int64)
    ph = offsets[1:-1] - 1
    ph = ph[(ph >= 0) & (ph < len(seg_mm))]
    seg_mm[ph] = 0
    if len(seg_mm) == 0:
        return np.zeros(len(offsets) - 1, dtype=np.float64)
    starts = np.minimum(offsets[:-1], len(seg_mm) - 1)
    sums_mm = np.add.reduceat(seg_mm, starts)
    cnt = offsets[1:] - offsets[:-1]
    out = ((sums_mm + 500) // 1000).astype(np.float64)
    return np.where(cnt >= 2, out, 0.0)


# ---------------------------------------------------------------------------
# rings / orientation
# ---------------------------------------------------------------------------

def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area (planar, lon/lat degrees). >0 = counter-clockwise."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def ring_is_ccw(ring: np.ndarray) -> bool:
    return ring_signed_area(ring) > 0


def orient_ring(ring: np.ndarray, ccw: bool) -> np.ndarray:
    """Return the ring with the requested winding (OGC: exterior CCW, hole CW)."""
    if ring_is_ccw(ring) != ccw:
        return ring[::-1].copy()
    return ring


def is_closed_ring(coords: np.ndarray) -> bool:
    return len(coords) >= 4 and bool(np.all(coords[0] == coords[-1]))


def close_ring(coords: np.ndarray) -> np.ndarray:
    if len(coords) and not np.all(coords[0] == coords[-1]):
        return np.vstack([coords, coords[:1]])
    return coords


def ring_contains_point(ring: np.ndarray, x: float, y: float) -> bool:
    """Scalar even-odd test of one point against one closed ring."""
    inside = np.zeros(1, dtype=np.int64)
    _crossings(ring, np.array([x]), np.array([y]), inside)
    return bool(inside[0] % 2 == 1)


def _crossings(ring: np.ndarray, px: np.ndarray, py: np.ndarray,
               out_count: np.ndarray) -> None:
    """Accumulate ray-casting crossing counts of points vs one ring's edges."""
    x1, y1 = ring[:-1, 0][:, None], ring[:-1, 1][:, None]
    x2, y2 = ring[1:, 0][:, None], ring[1:, 1][:, None]
    cond = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    hits = cond & (px < xint)
    out_count += hits.sum(axis=0)


def points_in_rings_even_odd(rings: list[np.ndarray], px: np.ndarray,
                             py: np.ndarray) -> np.ndarray:
    """Even-odd containment of many points vs a set of rings (one multipolygon)."""
    count = np.zeros(len(px), dtype=np.int64)
    for ring in rings:
        _crossings(ring, px, py, count)
    return (count % 2) == 1


def representative_point(ring: np.ndarray) -> tuple[float, float]:
    """A point guaranteed inside a simple closed ring (midpoint of a crossing
    span on the horizontal line through a vertex-free interior y)."""
    ys = np.unique(ring[:, 1])
    if len(ys) < 2:
        return float(ring[0, 0]), float(ring[0, 1])
    # pick the y between the two middle distinct vertex ys → avoids vertices
    mid = len(ys) // 2
    y = 0.5 * (ys[mid - 1] + ys[mid])
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    cond = (y1 > y) != (y2 > y)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
    xs = np.sort(xint[cond])
    if len(xs) >= 2:
        return float(0.5 * (xs[0] + xs[1])), float(y)
    cx = float(ring[:-1, 0].mean())
    cy = float(ring[:-1, 1].mean())
    return cx, cy


# ---------------------------------------------------------------------------
# geometry-typing rules (reference truth tables)
# ---------------------------------------------------------------------------

LINEAR_CLOSED_WAY_KEYS = ("highway", "barrier", "route")


def closed_way_is_polygon(area_value, has_linear_tag: bool) -> bool:
    """pyrosm/geometry.pyx:381-389 — explicit area tag wins, else polygon
    unless the way carries a linear-feature tag."""
    if area_value == "yes":
        return True
    if area_value == "no":
        return False
    return not has_linear_tag


# Relation linestring rule value tables (pyrosm/relations.pyx:77-134).
_RAILWAY_AREA_VALUES = frozenset(
    {"platform", "station", "turntable", "roundhouse", "traverser", "wash"})
_HIGHWAY_AREA_VALUES = frozenset({"platform", "rest_area", "services"})
_WATERWAY_AREA_VALUES = frozenset({"riverbank", "dock", "boatyard", "dam", "fuel"})


def relation_is_linestring(tags: dict) -> bool:
    """Decide whether a relation's geometry is forced to LineString.

    Mirrors pyrosm/relations.pyx:72-134 including the precedence order:
    linear member keys -> ``area=no`` -> ``type in (multipolygon, boundary)``
    overrides back to area.
    """
    force = False
    for key in ("barrier", "route", "railway", "highway", "waterway"):
        if key not in tags:
            continue
        v = tags[key]
        if key == "railway":
            if v not in _RAILWAY_AREA_VALUES:
                force = True
                break
        elif key == "highway":
            if v == "pedestrian":
                if "area" in tags:
                    if tags["area"] != "yes":
                        force = True
                    break
            elif v not in _HIGHWAY_AREA_VALUES:
                force = True
                break
        elif key == "waterway":
            if v not in _WATERWAY_AREA_VALUES:
                force = True
                break
        else:
            force = True
            break
    if tags.get("area") == "no":
        force = True
    if tags.get("type") in ("multipolygon", "boundary"):
        force = False
    return force


# ---------------------------------------------------------------------------
# bboxes
# ---------------------------------------------------------------------------

def coords_bbox_per_geom(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(M,4) [xmin,ymin,xmax,ymax] per CSR geometry; empty geoms -> inf/-inf."""
    offsets = np.asarray(offsets, dtype=np.int64)
    m = len(offsets) - 1
    out = np.empty((m, 4), dtype=np.float64)
    out[:, 0:2] = np.inf
    out[:, 2:4] = -np.inf
    if len(coords) == 0:
        return out
    x, y = coords[:, 0], coords[:, 1]
    nonempty = offsets[1:] > offsets[:-1]
    idx = np.flatnonzero(nonempty)
    starts = offsets[:-1][idx]
    out[idx, 0] = np.minimum.reduceat(x, starts)
    out[idx, 1] = np.minimum.reduceat(y, starts)
    out[idx, 2] = np.maximum.reduceat(x, starts)
    out[idx, 3] = np.maximum.reduceat(y, starts)
    # reduceat reduces to the *next* start — mask out geoms that would swallow
    # the tail: handled naturally because starts are the nonempty geoms' own
    # starts and reduceat segments end at the next start; the final segment
    # runs to the end of coords, which is exactly the last geometry.
    # For correctness with interleaved empty geoms, recompute any geometry
    # whose segment in reduceat crossed into the next geometry:
    ends = offsets[1:][idx]
    next_starts = np.append(starts[1:], len(coords))
    bad = ends != next_starts
    for j in np.flatnonzero(bad):
        s, e = starts[j], ends[j]
        out[idx[j], 0] = x[s:e].min()
        out[idx[j], 1] = y[s:e].min()
        out[idx[j], 2] = x[s:e].max()
        out[idx[j], 3] = y[s:e].max()
    return out
