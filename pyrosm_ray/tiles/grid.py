"""Hierarchical equirectangular tile index (the engine's default cell scheme).

Plays the role of pyrosm's bounding-box pre-filter generalised to tiles
(SURVEY.md §2 M9/J2 → H3-cover membership): pages and polygons are assigned
int64 cell ids at resolutions 0..28 and co-partitioned by cell for the
spatial-join stages. The scheme is a plain power-of-two lon/lat grid:

* ``res`` r splits the world into ``2^r × 2^r`` tiles (x east from -180,
  y south from +90).
* cell id = ``r << 58 | x << 29 | y`` — pure integer arithmetic, so the same
  mapping is expressible in ANSI SQL for the DuckDB correctness oracle.
* parent/child moves are bit shifts of x and y (exact hierarchy, like H3
  res 5→9 parent walks; unlike H3 the hierarchy is exact, not approximate).

An S2-style cube-face curve (:mod:`pyrosm_ray.tiles.s2like`) is provided as
the production-scale alternative; both share this module's API shape.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28

# The engine's public tile API speaks "H3-equivalent" resolutions (the north
# rule's res 5→9 hierarchy). One H3 res step ~halves the cell edge, like one
# grid res step; the offset aligns absolute edge lengths at mid-latitudes
# (H3 r5 ≈ 8.5 km edge ↔ grid r13 ≈ 4.9 km at 60°N; r9 ≈ 174 m ↔ r17 ≈ 300 m).
H3_EQUIV_OFFSET = 8


def h3_equiv_res(h3_res: int) -> int:
    """Grid resolution with a comparable cell size to the given H3 res."""
    return min(MAX_RES, h3_res + H3_EQUIV_OFFSET)


def cell_id(lon, lat, res: int) -> np.ndarray:
    """Vectorised lon/lat -> int64 cell id at ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    n = np.int64(1) << res
    x = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    y = np.clip(np.floor((90.0 - lat) / 180.0 * n), 0, n - 1).astype(np.int64)
    return (np.int64(res) << 58) | (x << 29) | y


def cell_res(cell) -> np.ndarray:
    return (np.asarray(cell, dtype=np.int64) >> 58).astype(np.int64)


def cell_xy(cell) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    mask = (np.int64(1) << 29) - 1
    return (cell >> 29) & mask, cell & mask


def parent(cell, res: int) -> np.ndarray:
    """Ancestor cell at coarser ``res`` (bit-shift exact)."""
    cell = np.asarray(cell, dtype=np.int64)
    r = cell_res(cell)
    if np.any(r < res):
        raise ValueError("parent res must be <= cell res")
    shift = (r - res).astype(np.int64)
    x, y = cell_xy(cell)
    return (np.int64(res) << 58) | ((x >> shift) << 29) | (y >> shift)


def children(cell: int) -> np.ndarray:
    """The four direct children of one cell."""
    r = int(cell_res(cell))
    if r >= MAX_RES:
        raise ValueError("cell already at max res")
    x, y = (int(v) for v in cell_xy(cell))
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            out.append((np.int64(r + 1) << 58)
                       | (np.int64(2 * x + dx) << 29) | np.int64(2 * y + dy))
    return np.array(out, dtype=np.int64)


def cell_bounds(cell) -> np.ndarray:
    """(n,4) [lon_min, lat_min, lon_max, lat_max] per cell."""
    cell = np.asarray(cell, dtype=np.int64)
    r = cell_res(cell)
    n = (np.int64(1) << r).astype(np.float64)
    x, y = cell_xy(cell)
    w, h = 360.0 / n, 180.0 / n
    lon0 = -180.0 + x * w
    lat1 = 90.0 - y * h
    return np.column_stack([lon0, lat1 - h, lon0 + w, lat1])


def neighbors(cell: int, ring: int = 1) -> np.ndarray:
    """All cells within ``ring`` king-moves (incl. the cell itself), with
    east-west wraparound and north-south clipping. Used for kNN candidate
    ring expansion across tile borders."""
    r = int(cell_res(cell))
    n = 1 << r
    x, y = (int(v) for v in cell_xy(cell))
    out = []
    for dx in range(-ring, ring + 1):
        for dy in range(-ring, ring + 1):
            yy = y + dy
            if not 0 <= yy < n:
                continue
            xx = (x + dx) % n
            out.append((np.int64(r) << 58) | (np.int64(xx) << 29) | np.int64(yy))
    return np.unique(np.array(out, dtype=np.int64))


def cover_bbox(xmin: float, ymin: float, xmax: float, ymax: float,
               res: int) -> np.ndarray:
    """All cells at ``res`` intersecting the lon/lat box (polygon cover)."""
    n = 1 << res
    x0 = int(np.clip(np.floor((xmin + 180.0) / 360.0 * n), 0, n - 1))
    x1 = int(np.clip(np.floor((xmax + 180.0) / 360.0 * n), 0, n - 1))
    y0 = int(np.clip(np.floor((90.0 - ymax) / 180.0 * n), 0, n - 1))
    y1 = int(np.clip(np.floor((90.0 - ymin) / 180.0 * n), 0, n - 1))
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return ((np.int64(res) << 58) | (gx.ravel() << 29) | gy.ravel())


def cell_id_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """The exact :func:`cell_id` arithmetic as an ANSI-SQL expression, for
    the DuckDB correctness oracle (driver compares Ray vs SQL values)."""
    n = 1 << res
    x = (f"LEAST(GREATEST(CAST(FLOOR(({lon_expr} + 180.0) / 360.0 * {n}) "
         f"AS BIGINT), 0), {n - 1})")
    y = (f"LEAST(GREATEST(CAST(FLOOR((90.0 - ({lat_expr})) / 180.0 * {n}) "
         f"AS BIGINT), 0), {n - 1})")
    return f"(CAST({res} AS BIGINT) * {1 << 58} + ({x}) * {1 << 29} + ({y}))"
