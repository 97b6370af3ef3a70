"""Invalid-polygon repair (M23): numpy bowtie split + area sanity check.

Re-derives the semantics of the reference's ``fix_geometry``
(/root/reference/pyrosm/geometry.pyx:27-72) without GEOS: a self-crossing
("bowtie") exterior ring is split at its proper self-intersection points
into simple loops, the result becomes a MultiPolygon of those loops (the
reference's ``polygonize(exterior ∩ exterior)`` produces exactly the loop
faces and likewise drops holes), and a repair whose total area diverges
from the original by more than ``diff_threshold`` (reference default 20,
as ``|1 - orig/fixed|``) is rejected in favour of the original geometry.

Exposed both as scalar WKB->WKB (:func:`fix_polygon_wkb`) and as a
stateless map_batches stage (:func:`fix_invalid_geometries`) to append
after any area-layer pipeline.
"""

from __future__ import annotations

import numpy as np

from pyrosm_ray.geom import ops, wkb as wkblib


def _ring_self_intersection(ring: np.ndarray):
    """First proper intersection between non-adjacent segments of a closed
    ring, or None. Vectorised: for each segment i, orientation tests
    against all later non-adjacent segments at once."""
    n = len(ring) - 1  # closed ring: last point == first
    a = ring[:-1]
    b = ring[1:]
    for i in range(n - 2):
        j0 = i + 2
        j1 = n if i > 0 else n - 1  # segment 0 is adjacent to segment n-1
        if j0 >= j1:
            continue
        c, d = a[j0:j1], b[j0:j1]
        d1 = np.cross(b[i] - a[i], c - a[i])
        d2 = np.cross(b[i] - a[i], d - a[i])
        d3 = np.cross(d - c, a[i] - c)
        d4 = np.cross(d - c, b[i] - c)
        hit = (d1 * d2 < 0) & (d3 * d4 < 0)  # proper crossing only
        idx = np.flatnonzero(hit)
        if len(idx):
            j = j0 + int(idx[0])
            t = d3[idx[0]] / (d3[idx[0]] - d4[idx[0]])
            p = a[i] + t * (b[i] - a[i])
            return i, j, p
    return None


def split_bowtie_ring(ring: np.ndarray, max_splits: int = 32):
    """Split a self-crossing closed ring into simple closed loops."""
    stack = [np.asarray(ring, dtype=np.float64)]
    out = []
    splits = 0
    while stack:
        r = stack.pop()
        hit = _ring_self_intersection(r) if splits < max_splits else None
        if hit is None:
            if len(r) >= 4:
                out.append(r)
            continue
        i, j, p = hit
        splits += 1
        # loop 1 keeps the outside path, loop 2 the inner excursion
        loop1 = np.concatenate([r[:i + 1], [p], r[j + 1:]])
        loop2 = np.concatenate([[p], r[i + 1:j + 1], [p]])
        stack.append(loop1)
        stack.append(loop2)
    return out


def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(abs(np.sum(x * y2 - x2 * y)) * 0.5)


def fix_polygon_wkb(buf: bytes, diff_threshold: float = 20.0) -> bytes:
    """Repair a POLYGON whose exterior self-intersects; other geometry
    types (and MultiPolygons, like the reference) pass through."""
    gt = wkblib.wkb_geom_type(buf)
    if gt != wkblib.POLYGON:
        return buf
    _, rings = wkblib.decode_wkb(buf)
    if not rings:
        return buf
    ext = rings[0]
    if _ring_self_intersection(ext) is None:
        return buf
    loops = split_bowtie_ring(ext)
    if not loops:
        return buf
    orig_area = _ring_area(ext)
    fixed_area = sum(_ring_area(r) for r in loops)
    if fixed_area <= 0:
        return buf
    if abs(1.0 - orig_area / fixed_area) >= diff_threshold:
        return buf  # repair diverged too far: keep the original
    loops = [ops.orient_ring(r, ccw=True) for r in loops]
    if len(loops) == 1:
        return wkblib.polygon_wkb(loops)
    return wkblib.multipolygon_wkb([[r] for r in loops])


def fix_invalid_geometries(ds, geometry_col: str = "geometry",
                           diff_threshold: float = 20.0):
    """map_batches stage: repair bowtie polygons in the geometry column."""
    import pyarrow as pa

    def f(batch: pa.Table) -> pa.Table:
        geoms = batch[geometry_col].to_pylist()
        fixed = [None if g is None else fix_polygon_wkb(g, diff_threshold)
                 for g in geoms]
        i = batch.column_names.index(geometry_col)
        return batch.set_column(i, geometry_col,
                                pa.array(fixed, pa.binary()))

    return ds.map_batches(f, batch_format="pyarrow")
