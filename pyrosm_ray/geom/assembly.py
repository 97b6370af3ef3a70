"""Relation (multipolygon) assembly: line stitching + even-odd ring nesting.

Re-implements the reference's role-independent multipolygon algorithm
(/root/reference/pyrosm/geometry.pyx:195-290) without GEOS:

1. merge member-way lines at endpoints where exactly two line ends meet
   (shapely ``line_merge`` semantics);
2. keep closed rings, drop open chains (never force-close);
3. even-odd overlay: instead of iterated ``symmetric_difference`` the same
   result is computed combinatorially — a ring's *depth* is the number of
   other rings containing its representative point; even depth = shell, odd
   = hole, each hole attached to its directly-enclosing shell. For valid
   (non-crossing) OSM rings this equals GEOS's even-odd overlay, including
   islands-in-holes.
4. shells oriented CCW, holes CW (OGC right-hand rule, M24).

Endpoint matching is exact float equality — member ways that share an OSM
node share its coordinates bit-for-bit, which is the same invariant
``line_merge`` relies on.
"""

from __future__ import annotations

import numpy as np

from pyrosm_ray.geom import ops, wkb


def merge_lines(lines: list[np.ndarray]) -> list[np.ndarray]:
    """Stitch polylines at endpoints where exactly two line ends meet."""
    lines = [np.asarray(l, dtype=np.float64) for l in lines if len(l) >= 2]
    if not lines:
        return []
    # endpoint -> list of (line_idx, end) where end 0=start, 1=stop
    endpoints: dict[tuple, list[tuple[int, int]]] = {}
    for i, l in enumerate(lines):
        for end, pt in ((0, l[0]), (1, l[-1])):
            endpoints.setdefault((pt[0], pt[1]), []).append((i, end))

    used = [False] * len(lines)
    out = []
    for start in range(len(lines)):
        if used[start]:
            continue
        used[start] = True
        chain = lines[start]
        # extend forward then backward until the junction degree != 2
        for direction in (1, 0):
            while True:
                pt = chain[-1] if direction == 1 else chain[0]
                if np.array_equal(chain[0], chain[-1]):
                    break  # closed
                incident = endpoints.get((pt[0], pt[1]), [])
                nxt = [(i, e) for i, e in incident if not used[i]]
                if len(incident) != 2 or len(nxt) != 1:
                    break
                i, e = nxt[0]
                seg = lines[i]
                used[i] = True
                if direction == 1:
                    seg = seg if e == 0 else seg[::-1]
                    chain = np.vstack([chain, seg[1:]])
                else:
                    seg = seg if e == 1 else seg[::-1]
                    chain = np.vstack([seg[:-1], chain])
        out.append(chain)
    return out


def _probe_point(a: np.ndarray, others: list[np.ndarray]) -> tuple[float, float]:
    """A point of ring ``a`` suitable for testing containment in other rings:
    a vertex of ``a`` (boundary point — an interior point would sit inside
    nested rings too), avoiding vertices shared with other rings (touching
    rings are common in OSM multipolygons)."""
    other_pts = {(p[0], p[1]) for r in others for p in r}
    for p in a[:-1]:
        if (p[0], p[1]) not in other_pts:
            return float(p[0]), float(p[1])
    # all vertices shared: fall back to an edge midpoint
    m = 0.5 * (a[0] + a[1])
    return float(m[0]), float(m[1])


def _ring_depths(rings: list[np.ndarray]) -> np.ndarray:
    """Containment depth: how many other rings contain this ring (tested at
    one of its own boundary vertices)."""
    n = len(rings)
    depth = np.zeros(n, dtype=np.int64)
    for i in range(n):
        x, y = _probe_point(rings[i], [r for j, r in enumerate(rings) if j != i])
        for j in range(n):
            if i != j and ops.ring_contains_point(rings[j], x, y):
                depth[i] += 1
    return depth


def polygons_from_rings(rings: list[np.ndarray]):
    """Even-odd nesting -> list of (shell, [holes]); None if no valid ring."""
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return None
    depth = _ring_depths(rings)
    areas = [abs(ops.ring_signed_area(r)) for r in rings]
    shells = [i for i in range(len(rings)) if depth[i] % 2 == 0]
    holes = [i for i in range(len(rings)) if depth[i] % 2 == 1]
    if not shells:
        return None
    result = []
    shell_for = {}
    for s in shells:
        shell_for[s] = [ops.orient_ring(rings[s], ccw=True), []]
    for h in holes:
        # attach to the smallest-area shell at depth[h]-1 that contains it
        x, y = _probe_point(rings[h], [rings[s] for s in shells])
        best, best_area = None, np.inf
        for s in shells:
            if depth[s] == depth[h] - 1 and areas[s] < best_area \
                    and ops.ring_contains_point(rings[s], x, y):
                best, best_area = s, areas[s]
        if best is not None:
            shell_for[best][1].append(ops.orient_ring(rings[h], ccw=False))
    for s in shells:
        result.append(shell_for[s])
    return result


def relation_geometry(member_lines: list[np.ndarray],
                      force_linestring: bool) -> bytes | None:
    """One relation's geometry from its member-way coordinate chains.

    Mirrors create_relation_geometry (pyrosm/geometry.pyx:243-280): routes
    force LineString/MultiLineString of the merged members; otherwise closed
    rings assemble into (Multi)Polygon by even-odd nesting; unassemblable ->
    None (relation dropped)."""
    lines = [l for l in member_lines if len(l) >= 2]
    if not lines:
        return None
    merged = merge_lines(lines)
    if force_linestring:
        if len(merged) == 1:
            return wkb.linestring_wkb(merged[0])
        return wkb.multilinestring_wkb(merged)
    rings = [m for m in merged if ops.is_closed_ring(m)]
    polys = polygons_from_rings(rings)
    if not polys:
        return None
    if len(polys) == 1:
        shell, holes = polys[0]
        return wkb.polygon_wkb([shell] + holes)
    return wkb.multipolygon_wkb([[shell] + holes for shell, holes in polys])
