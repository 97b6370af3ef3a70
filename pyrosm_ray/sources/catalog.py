"""Offline bbox -> smallest-covering-extract resolver (S7).

The reference resolves an area of interest to the smallest Geofabrik
extract whose polygon fully covers the area's bounding-box envelope, then
downloads and crops it (reference semantics:
/root/reference/pyrosm/data/geofabrik_index.py:96-171 `_covering_extract_url`
and `get_data_by_bbox`). This sandbox has no network, so the engine's
variant resolves against a CATALOG TABLE the caller supplies (or bundles):
one row per extract with an id, an optional display name, the extract's
polygon (WKB) or rectangular extent, and a local path (the `pbf` column —
pointing at fixture directories or pre-downloaded files).

Selection contract (mirrors the reference exactly):

* candidates = extracts whose geometry COVERS the bbox envelope;
* pick the smallest by area (equal-area proxy: lon/lat shoelace scaled by
  cos(mean lat) per ring — monotone for ranking), ties broken by id;
* no coverer but overlap -> ValueError listing the intersecting ids;
* no overlap at all -> "outside the catalog" ValueError.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyrosm_ray.geom import ops, wkb as wkblib


def _rings_of(geom) -> list[np.ndarray]:
    if isinstance(geom, (bytes, bytearray)):
        return wkblib.polygon_rings(bytes(geom))
    arr = np.asarray(geom, dtype=np.float64)
    if arr.shape == (4,):  # (x0, y0, x1, y1) extent
        x0, y0, x1, y1 = arr
        return [np.array([[x0, y0], [x1, y0], [x1, y1],
                          [x0, y1], [x0, y0]])]
    return [ops.close_ring(arr)]


def _rings_area_proxy(rings: list[np.ndarray]) -> float:
    """Equal-area ranking proxy: |shoelace| in lon/lat scaled by cos(mean
    lat) per ring, outer minus holes by even-odd (the reference ranks by
    equal-area-CRS area; any monotone proxy picks the same 'smallest')."""
    total = 0.0
    for i, r in enumerate(rings):
        a = abs(ops.ring_signed_area(r))
        a *= float(np.cos(np.deg2rad(np.clip(r[:, 1].mean(), -89.9, 89.9))))
        total += a if i == 0 else -a  # assume later rings are holes
    return abs(total)


def _segment_enters_open_rect(rings: list[np.ndarray], x0, y0, x1, y1
                              ) -> bool:
    """True if any polygon boundary edge enters the OPEN rectangle
    (Liang-Barsky clip + strict-interior midpoint check, vectorised)."""
    for r in rings:
        ax, ay = r[:-1, 0], r[:-1, 1]
        bx, by = r[1:, 0], r[1:, 1]
        dx, dy = bx - ax, by - ay
        t0 = np.zeros(len(ax))
        t1 = np.ones(len(ax))
        ok = np.ones(len(ax), dtype=bool)
        for p, q in ((-dx, ax - x0), (dx, x1 - ax),
                     (-dy, ay - y0), (dy, y1 - ay)):
            with np.errstate(divide="ignore", invalid="ignore"):
                t = q / p
            par = p == 0
            ok &= ~(par & (q < 0))          # parallel and outside
            ent = (p < 0) & ~par
            ext = (p > 0) & ~par
            t0 = np.where(ent, np.maximum(t0, t), t0)
            t1 = np.where(ext, np.minimum(t1, t), t1)
        ok &= t0 < t1
        if ok.any():
            tm = (t0 + t1) / 2.0
            mx = ax + tm * dx
            my = ay + tm * dy
            strict = ((mx > x0) & (mx < x1) & (my > y0) & (my < y1))
            if (ok & strict).any():
                return True
    return False


def _covers_rect(rings: list[np.ndarray], x0, y0, x1, y1) -> bool:
    """Rectangle fully inside the (possibly holed, even-odd) polygon:
    every corner inside and no boundary edge entering the open rect."""
    cx = np.array([x0, x1, x1, x0])
    cy = np.array([y0, y0, y1, y1])
    if not ops.points_in_rings_even_odd(rings, cx, cy).all():
        return False
    return not _segment_enters_open_rect(rings, x0, y0, x1, y1)


def _bbox_of(area) -> tuple[float, float, float, float]:
    """Envelope of the area of interest: (x0,y0,x1,y1), a coordinate ring,
    or a WKB polygon (the reference covers the ENVELOPE because the crop
    downstream filters by it)."""
    if isinstance(area, (bytes, bytearray)):
        return wkblib.wkb_bbox(bytes(area))
    arr = np.asarray(area, dtype=np.float64)
    if arr.ndim == 2 and arr.shape[1] == 2:
        return (float(arr[:, 0].min()), float(arr[:, 1].min()),
                float(arr[:, 0].max()), float(arr[:, 1].max()))
    x0, y0, x1, y1 = (float(v) for v in arr)
    if not (x0 < x1 and y0 < y1):
        raise ValueError(
            f"Invalid bbox (minx, miny, maxx, maxy): {(x0, y0, x1, y1)}")
    return x0, y0, x1, y1


class ExtractCatalog:
    """In-memory extract catalog: rows of (id, name, pbf, geometry).

    ``geometry`` is a WKB Polygon/MultiPolygon (binary) or a 4-value
    extent; ``pbf`` is a LOCAL path (directory of element parquet or an
    .osm.pbf file) — this is the no-network stand-in for the reference's
    download URL column."""

    def __init__(self, table):
        if isinstance(table, pa.Table):
            rows = table.to_pylist()
        elif hasattr(table, "to_dict"):  # pandas
            rows = table.to_dict("records")
        else:
            rows = list(table)
        self.rows = []
        for r in rows:
            rings = _rings_of(r["geometry"])
            self.rows.append({
                "id": str(r["id"]),
                "name": r.get("name") or str(r["id"]),
                "pbf": r["pbf"],
                "rings": rings,
                "area": _rings_area_proxy(rings),
            })

    @classmethod
    def from_parquet(cls, path: str) -> "ExtractCatalog":
        import pyarrow.parquet as pq
        return cls(pq.read_table(path))

    def covering_extract(self, area) -> dict:
        """Smallest catalog extract covering the area's envelope
        (reference `_covering_extract_url` selection + error contract)."""
        x0, y0, x1, y1 = _bbox_of(area)
        covering = [r for r in self.rows
                    if _covers_rect(r["rings"], x0, y0, x1, y1)]
        if not covering:
            inter = sorted(r["id"] for r in self.rows
                           if self._intersects(r["rings"], x0, y0, x1, y1))
            if inter:
                preview = ", ".join(inter[:5])
                more = "" if len(inter) <= 5 else ", ..."
                raise ValueError(
                    "No single catalog extract fully covers the area; it "
                    "extends beyond the extent(s) it overlaps "
                    f"({preview}{more}). Use a smaller area, or add a "
                    "covering parent extract to the catalog.")
            raise ValueError(
                "The area lies outside the catalog's extracts.")
        covering.sort(key=lambda r: (r["area"], r["id"]))
        return covering[0]

    @staticmethod
    def _intersects(rings, x0, y0, x1, y1) -> bool:
        xs = np.concatenate([r[:, 0] for r in rings])
        ys = np.concatenate([r[:, 1] for r in rings])
        if xs.max() < x0 or xs.min() > x1 or ys.max() < y0 or ys.min() > y1:
            return False
        # corner of rect inside polygon, polygon vertex inside rect, or a
        # boundary edge entering the rect
        cx = np.array([x0, x1, x1, x0])
        cy = np.array([y0, y0, y1, y1])
        if ops.points_in_rings_even_odd(rings, cx, cy).any():
            return True
        if (((xs >= x0) & (xs <= x1)) & ((ys >= y0) & (ys <= y1))).any():
            return True
        return _segment_enters_open_rect(rings, x0, y0, x1, y1)


def get_data_by_bbox(bbox, catalog: ExtractCatalog, crop: bool = True,
                     resolve_only: bool = False,
                     output_path: str | None = None,
                     directory: str | None = None) -> str:
    """Offline twin of the reference ``get_data_by_bbox``
    (geofabrik_index.py:170): resolve the smallest covering extract from
    the catalog; return its path (``resolve_only`` / ``crop=False``) or
    crop it to the bbox envelope with complete-ways semantics and return
    the cropped .osm.pbf path."""
    import os
    import tempfile

    best = catalog.covering_extract(bbox)
    if resolve_only or not crop:
        return best["pbf"]
    x0, y0, x1, y1 = _bbox_of(bbox)

    def _fmt(v: float) -> str:
        return f"{v:.5f}".rstrip("0").rstrip(".")

    name = f"bbox_{_fmt(x0)}_{_fmt(y0)}_{_fmt(x1)}_{_fmt(y1)}.osm.pbf"
    target = output_path or os.path.join(
        directory or tempfile.gettempdir(), name)
    src = best["pbf"]
    if str(src).endswith(".pbf"):
        from pyrosm_ray.sources.pbf_write import crop_pbf
        crop_pbf(str(src), target, (x0, y0, x1, y1), complete_ways=True)
        return target
    from pyrosm_ray.pipelines.layers import OSM
    return OSM(str(src), bounding_box=(x0, y0, x1, y1)).to_pbf(target)
