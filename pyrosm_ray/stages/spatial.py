"""Spatial-join + tiling stages over the pages table (the north-rule core).

Pipelines:

* :func:`geocode_pages` — derive (lon, lat) for every page. The sandbox
  geocoder parses the page id from the url and maps it deterministically
  (pyrosm_ray.fixtures.geocode_from_page_id) so joins are analytically
  checkable; a real deployment would plug any url->coordinate model in here.
* :func:`assign_tiles` — hierarchical cell assignment (res 5→9 by default,
  grid scheme; :mod:`pyrosm_ray.tiles.s2like` slots into the same call) +
  deterministic salt for mega-cells (city centres): a cheap count aggregate
  finds cells over threshold, pages in them get ``salt = page_id % k``
  (SURVEY.md §4 skew row).
* :class:`PipJoiner` — stateful actor-pool stage: polygons (the small side)
  are broadcast once via ``ray.put``; each actor decodes them and builds an
  STRtree in ``__init__``; every page batch queries candidates and confirms
  with exact even-odd PIP. Pages stream — ``html``/``text`` pass through the
  batch untouched (byte-identical per url invariant).
* :class:`KnnJoiner` — kNN-to-nearest-POI with expanding-radius candidate
  search against a broadcast point index + exact haversine ranking.
* :func:`pip_join_partitioned` — the co-partitioned shuffle variant for when
  the polygon side outgrows a broadcast: both sides keyed by covering cell
  (polygons replicated to every cell their bbox covers), joined per cell.
  Uses a payload projection + re-join by url so ``text`` never shuffles.

Reference seed for PIP semantics: the bbox sjoin of
/root/reference/pyrosm/frames.pyx:231-241, generalised from one rectangle to
a polygon layer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from pyrosm_ray.fixtures import geocode_from_page_id
from pyrosm_ray.geom import ops, wkb
from pyrosm_ray.geom.strtree import STRtree
from pyrosm_ray.tiles import grid


# ---------------------------------------------------------------------------
# geocode + tiles
# ---------------------------------------------------------------------------

def extract_page_id(url_col) -> np.ndarray:
    """Parse the trailing integer id out of the url column (vectorised)."""
    ext = pc.extract_regex(url_col, r"p/(?P<pid>\d+)$")
    pid = pc.struct_field(ext, "pid")
    return np.asarray(pc.cast(pid, pa.int64()).to_numpy(zero_copy_only=False),
                      dtype=np.int64)


def geocode_batch(batch: pa.Table) -> pa.Table:
    pid = extract_page_id(batch["url"])
    lon, lat = geocode_from_page_id(pid)
    batch = batch.append_column("page_id", pa.array(pid, pa.int64()))
    batch = batch.append_column("lon", pa.array(lon, pa.float64()))
    return batch.append_column("lat", pa.array(lat, pa.float64()))


def geocode_pages(pages_ds):
    return pages_ds.map_batches(geocode_batch, batch_format="pyarrow")


def tile_columns(batch: pa.Table, resolutions=(5, 7, 9)) -> pa.Table:
    lon = np.asarray(batch["lon"].to_numpy(zero_copy_only=False))
    lat = np.asarray(batch["lat"].to_numpy(zero_copy_only=False))
    for r in resolutions:
        batch = batch.append_column(
            f"h3_r{r}",
            pa.array(grid.cell_id(lon, lat, grid.h3_equiv_res(r)),
                     pa.int64()))
    return batch


def hot_cells(ds_with_tiles, res: int, threshold: int,
              max_salt: int = 64) -> dict[int, int]:
    """Cells whose page count exceeds ``threshold`` -> salt modulus k.

    Pre-aggregated per batch (combiner) before the small groupby — the
    all-to-all carries one row per distinct cell per block, not per page."""
    col = f"h3_r{res}"

    def partial(batch: pa.Table) -> pa.Table:
        cells, counts = np.unique(
            np.asarray(batch[col].to_numpy(zero_copy_only=False)),
            return_counts=True)
        return pa.table({col: pa.array(cells, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    agg = ds_with_tiles.map_batches(partial, batch_format="pyarrow") \
        .groupby(col).sum("n").to_pandas()
    out = {}
    for cell, n in zip(agg[col], agg["sum(n)"]):
        if n > threshold:
            out[int(cell)] = int(min(max_salt, max(2, n // threshold)))
    return out


def assign_tiles(pages_ds, resolutions=(5, 7, 9), salt_res: int = 9,
                 salt_threshold: int | None = None):
    """Geocode + hierarchical cell columns + mega-cell salt column.

    ``salt_threshold`` pages per ``salt_res`` cell triggers salting (default:
    none). Returns a Dataset with page_id/lon/lat/h3_r*/salt appended."""
    ds = geocode_pages(pages_ds)
    ds = ds.map_batches(lambda b: tile_columns(b, resolutions),
                        batch_format="pyarrow")
    if salt_threshold is None:
        return ds.map_batches(
            lambda b: b.append_column(
                "salt", pa.array(np.zeros(len(b), dtype=np.int64))),
            batch_format="pyarrow")
    hot = hot_cells(ds, salt_res, salt_threshold)
    hot_ref = ray.put(hot)
    col = f"h3_r{salt_res}"

    def salt(batch: pa.Table) -> pa.Table:
        h = ray.get(hot_ref)
        cells = np.asarray(batch[col].to_numpy(zero_copy_only=False))
        pid = np.asarray(batch["page_id"].to_numpy(zero_copy_only=False))
        k = np.ones(len(batch), dtype=np.int64)
        if h:
            hot_arr = np.array(sorted(h), dtype=np.int64)
            ks = np.array([h[c] for c in hot_arr], dtype=np.int64)
            pos = np.clip(np.searchsorted(hot_arr, cells), 0,
                          len(hot_arr) - 1)
            hit = hot_arr[pos] == cells
            k[hit] = ks[pos[hit]]
        return batch.append_column("salt", pa.array(pid % k, pa.int64()))

    return ds.map_batches(salt, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# polygon side packing (broadcast)
# ---------------------------------------------------------------------------

def pack_polygon_index(polygons_ds, id_col: str = "id",
                       layer: str | None = None) -> "ray.ObjectRef":
    """Collect a polygon layer into a compact broadcast index:
    (ids, bboxes, ring CSR arrays). Decoded once here, shipped once, read
    zero-copy by every joiner actor."""
    ids, bboxes = [], []
    ring_coords, ring_offsets, poly_ring_offsets = [], [0], [0]
    total_pts = 0
    n_rings = 0
    for batch in polygons_ds.iter_batches(batch_size=1 << 16,
                                          batch_format="pyarrow"):
        geom = batch["geometry"].to_pylist()
        bids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        for i, g in enumerate(geom):
            if g is None:
                continue
            gt = wkb.wkb_geom_type(g)
            if gt not in (wkb.POLYGON, wkb.MULTIPOLYGON):
                continue
            rings = wkb.polygon_rings(g)
            if not rings:
                continue
            ids.append(int(bids[i]))
            xs = np.concatenate([r[:, 0] for r in rings])
            ys = np.concatenate([r[:, 1] for r in rings])
            bboxes.append((xs.min(), ys.min(), xs.max(), ys.max()))
            for r in rings:
                ring_coords.append(r)
                total_pts += len(r)
                n_rings += 1
                ring_offsets.append(total_pts)
            poly_ring_offsets.append(n_rings)
    index = {
        "ids": np.array(ids, dtype=np.int64),
        "bboxes": np.array(bboxes, dtype=np.float64).reshape(-1, 4),
        "coords": (np.concatenate(ring_coords)
                   if ring_coords else np.empty((0, 2))),
        "ring_offsets": np.array(ring_offsets, dtype=np.int64),
        "poly_ring_offsets": np.array(poly_ring_offsets, dtype=np.int64),
        "layer": layer or "polygons",
    }
    return ray.put(index)


def _poly_rings(index, poly_idx: int) -> list[np.ndarray]:
    r0 = index["poly_ring_offsets"][poly_idx]
    r1 = index["poly_ring_offsets"][poly_idx + 1]
    ro = index["ring_offsets"]
    return [index["coords"][ro[j]:ro[j + 1]] for j in range(r0, r1)]


def _confirm_pip(index, cand_pt: np.ndarray, cand_poly: np.ndarray,
                 px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Exact even-odd confirmation of candidate (point, polygon) pairs,
    vectorised per polygon group."""
    keep = np.zeros(len(cand_pt), dtype=bool)
    if not len(cand_pt):
        return keep
    order = np.argsort(cand_poly, kind="stable")
    cp = cand_poly[order]
    starts = np.flatnonzero(np.diff(cp, prepend=cp[0] - 1))
    bounds = np.append(starts, len(cp))
    for s, e in zip(bounds[:-1], bounds[1:]):
        poly = int(cp[s])
        sel = order[s:e]
        rings = _poly_rings(index, poly)
        inside = ops.points_in_rings_even_odd(
            rings, px[cand_pt[sel]], py[cand_pt[sel]])
        keep[sel] = inside
    return keep


class PipJoiner:
    """Actor-pool point-in-polygon joiner (stateful map_batches stage).

    ``__init__`` (once per actor): fetch the broadcast polygon index, build
    the STRtree over polygon bboxes. ``__call__`` (per page batch): tree
    candidates -> exact even-odd PIP -> emit one row per (page, polygon)
    hit; non-matching pages drop (inner) or keep nulls (left outer).
    """

    def __init__(self, index_ref, how: str = "inner",
                 lon_col: str = "lon", lat_col: str = "lat"):
        self.index = ray.get(index_ref)
        self.tree = STRtree(self.index["bboxes"])
        self.how = how
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        px = np.asarray(batch[self.lon_col].to_numpy(zero_copy_only=False))
        py = np.asarray(batch[self.lat_col].to_numpy(zero_copy_only=False))
        cand_pt, cand_poly = self.tree.query_points(px, py)
        keep = _confirm_pip(self.index, cand_pt, cand_poly, px, py)
        hit_pt = cand_pt[keep]
        hit_poly = self.index["ids"][cand_poly[keep]]
        if self.how == "inner":
            out = batch.take(pa.array(hit_pt))
            out = out.append_column("polygon_id",
                                    pa.array(hit_poly, pa.int64()))
        else:  # left outer: first hit per page, null if none
            poly_col = np.full(n, None, dtype=object)
            # keep the first (lowest polygon id) hit deterministically
            order = np.lexsort((hit_poly, hit_pt))
            first = np.ones(len(order), dtype=bool)
            first[1:] = hit_pt[order][1:] != hit_pt[order][:-1]
            for p, g in zip(hit_pt[order][first], hit_poly[order][first]):
                poly_col[p] = int(g)
            out = batch.append_column("polygon_id",
                                      pa.array(poly_col, pa.int64()))
        return out.append_column(
            "polygon_layer",
            pa.array([self.index["layer"]] * len(out), pa.string()))


def pip_join(pages_ds, polygons_ds, how: str = "inner",
             layer: str | None = None, id_col: str = "id",
             batch_size: int = 64 * 1024, concurrency=(2, 16)):
    """Broadcast PIP join: geocoded pages stream against a polygon layer."""
    index_ref = pack_polygon_index(polygons_ds, id_col=id_col, layer=layer)
    return pages_ds.map_batches(
        PipJoiner,
        fn_constructor_kwargs={"index_ref": index_ref, "how": how},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ---------------------------------------------------------------------------
# kNN join (nearest POIs)
# ---------------------------------------------------------------------------

def pack_point_index(points_ds, id_col: str = "id",
                     lon_col: str = "lon", lat_col: str = "lat"):
    ids, lons, lats = [], [], []
    for batch in points_ds.iter_batches(batch_size=1 << 18,
                                        batch_format="pyarrow"):
        if lon_col in batch.column_names:
            lon = np.asarray(batch[lon_col].to_numpy(zero_copy_only=False))
            lat = np.asarray(batch[lat_col].to_numpy(zero_copy_only=False))
        else:  # decode Point WKB
            pts = np.array([wkb.decode_wkb(g)[1]
                            for g in batch["geometry"].to_pylist()])
            lon, lat = (pts[:, 0], pts[:, 1]) if len(pts) else \
                (np.empty(0), np.empty(0))
        ids.append(np.asarray(batch[id_col].to_numpy(zero_copy_only=False)))
        lons.append(lon)
        lats.append(lat)
    return ray.put({
        "ids": (np.concatenate(ids) if ids else np.empty(0, np.int64)),
        "lon": (np.concatenate(lons) if lons else np.empty(0)),
        "lat": (np.concatenate(lats) if lats else np.empty(0)),
    })


class KnnJoiner:
    """Actor-pool kNN-to-nearest-POI: broadcast point index + STRtree in
    ``__init__``; per batch an expanding-radius candidate search, exact
    haversine ranking, top-k rows per page."""

    def __init__(self, index_ref, k: int = 1, r0_deg: float = 0.01,
                 lon_col: str = "lon", lat_col: str = "lat"):
        self.index = ray.get(index_ref)
        pts = np.column_stack([self.index["lon"], self.index["lat"]])
        self.tree = STRtree(np.hstack([pts, pts]) if len(pts) else
                            np.empty((0, 4)))
        self.k = k
        self.r0 = r0_deg
        self.lon_col = lon_col
        self.lat_col = lat_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0 or len(self.index["ids"]) == 0:
            return batch.slice(0, 0)
        px = np.asarray(batch[self.lon_col].to_numpy(zero_copy_only=False))
        py = np.asarray(batch[self.lat_col].to_numpy(zero_copy_only=False))
        k = min(self.k, len(self.index["ids"]))
        pend = np.arange(n)
        r = self.r0
        rows_pt: list[np.ndarray] = []
        rows_poi: list[np.ndarray] = []
        rows_d: list[np.ndarray] = []
        for _ in range(8):
            if not len(pend):
                break
            boxes = np.column_stack([px[pend] - r, py[pend] - r,
                                     px[pend] + r, py[pend] + r])
            qi, ii = self.tree.query_boxes(boxes)
            if len(qi):
                d = ops.haversine_m(py[pend[qi]], px[pend[qi]],
                                    self.index["lat"][ii],
                                    self.index["lon"][ii])
                # count candidates per pending point
                cnt = np.bincount(qi, minlength=len(pend))
                # a point is DONE if it has >= k candidates within the
                # *inscribed* safe radius (a kth neighbour outside the box
                # could be closer than a candidate near the corner); the
                # east-west extent of an r-degree box shrinks by cos(lat)
                safe_m_all = (r * 110_000.0
                              * np.cos(np.deg2rad(np.abs(py[pend]))))
                ok = np.flatnonzero(cnt >= k)
                done_mask = np.zeros(len(pend), dtype=bool)
                for p in ok:
                    sel = qi == p
                    ds = np.sort(d[sel])
                    if ds[k - 1] <= safe_m_all[p]:
                        done_mask[p] = True
                        order = np.argsort(d[sel], kind="stable")
                        cand = ii[sel][order][:k]
                        rows_pt.append(np.full(k, pend[p]))
                        rows_poi.append(self.index["ids"][cand])
                        rows_d.append(np.sort(ds[:k]).round(3))
                pend = pend[~done_mask]
            r *= 3.0
            if r > 360.0 and len(pend):
                # global fallback: brute force the stragglers
                for p in pend:
                    d = ops.haversine_m(py[p], px[p], self.index["lat"],
                                        self.index["lon"])
                    order = np.argsort(d, kind="stable")[:k]
                    rows_pt.append(np.full(k, p))
                    rows_poi.append(self.index["ids"][order])
                    rows_d.append(d[order].round(3))
                pend = pend[:0]
        if rows_pt:
            pt = np.concatenate(rows_pt)
            poi = np.concatenate(rows_poi)
            dist = np.concatenate(rows_d)
        else:
            pt = np.empty(0, dtype=np.int64)
            poi = np.empty(0, dtype=np.int64)
            dist = np.empty(0)
        order = np.argsort(pt, kind="stable")
        out = batch.take(pa.array(pt[order]))
        out = out.append_column("poi_id", pa.array(poi[order], pa.int64()))
        out = out.append_column("distance_m",
                                pa.array(dist[order], pa.float64()))
        rank = np.zeros(len(order), dtype=np.int64)
        if len(order):
            pto = pt[order]
            new = np.flatnonzero(np.diff(pto, prepend=pto[0] - 1))
            rank = np.arange(len(pto)) - np.repeat(
                new, np.diff(np.append(new, len(pto))))
        return out.append_column("knn_rank", pa.array(rank + 1, pa.int64()))


def knn_join(pages_ds, pois_ds, k: int = 1, id_col: str = "id",
             batch_size: int = 32 * 1024, concurrency=(2, 16)):
    index_ref = pack_point_index(pois_ds, id_col=id_col)
    return pages_ds.map_batches(
        KnnJoiner, fn_constructor_kwargs={"index_ref": index_ref, "k": k},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


# ---------------------------------------------------------------------------
# co-partitioned (shuffle) PIP join — the beyond-broadcast scale path
# ---------------------------------------------------------------------------

def pip_join_partitioned(pages_ds, polygons_ds, cell_res: int = 7,
                         num_partitions: int = 32, layer: str | None = None,
                         id_col: str = "id"):
    """Cell-co-partitioned PIP join.

    Pages carry their res-``cell_res`` cell; each polygon is replicated to
    every cell its bbox covers; a per-cell group join runs exact PIP. Only
    the (url, page_id, lon, lat, cell) projection shuffles — the full page
    payload (html/text) re-joins by url afterwards, so payload bytes never
    enter the all-to-all (SURVEY.md §7.4 wide-binary-rows note).
    """
    col = f"h3_r{cell_res}"
    gres = grid.h3_equiv_res(cell_res)
    pages_t = assign_tiles(pages_ds, resolutions=(cell_res,))
    proj = pages_t.select_columns(["url", "lon", "lat", col])

    def polys_to_cells(batch: pa.Table) -> pa.Table:
        ids_, cells, blobs = [], [], []
        bids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        for i, g in enumerate(batch["geometry"].to_pylist()):
            if g is None:
                continue
            gt = wkb.wkb_geom_type(g)
            if gt not in (wkb.POLYGON, wkb.MULTIPOLYGON):
                continue
            x0, y0, x1, y1 = wkb.wkb_bbox(g)
            for c in grid.cover_bbox(x0, y0, x1, y1, gres):
                ids_.append(int(bids[i]))
                cells.append(int(c))
                blobs.append(g)
        return pa.table({
            "polygon_id": pa.array(ids_, pa.int64()),
            col: pa.array(cells, pa.int64()),
            "pgeom": pa.array(blobs, pa.binary()),
        })

    polys = polygons_ds.map_batches(polys_to_cells, batch_format="pyarrow")
    joined = proj.join(polys, "inner", num_partitions=num_partitions,
                       on=(col,),
                       aggregator_ray_remote_args={"num_cpus": 0.25})

    def per_pair_pip(batch: pa.Table) -> pa.Table:
        keep = np.zeros(len(batch), dtype=bool)
        px = np.asarray(batch["lon"].to_numpy(zero_copy_only=False))
        py = np.asarray(batch["lat"].to_numpy(zero_copy_only=False))
        geoms = batch["pgeom"].to_pylist()
        cache: dict[int, list] = {}
        pids = np.asarray(batch["polygon_id"].to_numpy(zero_copy_only=False))
        for i, g in enumerate(geoms):
            rings = cache.get(pids[i])
            if rings is None:
                rings = wkb.polygon_rings(g)
                cache[pids[i]] = rings
            keep[i] = ops.points_in_rings_even_odd(
                rings, px[i:i + 1], py[i:i + 1])[0]
        out = batch.filter(pa.array(keep))
        return out.drop_columns(["pgeom"])

    hits = joined.map_batches(per_pair_pip, batch_format="pyarrow")
    hits = hits.drop_columns(["lon", "lat"])
    lay = layer or "polygons"
    hits = hits.map_batches(
        lambda b: b.append_column("polygon_layer",
                                  pa.array([lay] * len(b), pa.string())),
        batch_format="pyarrow")
    # re-attach the full payload by url (payload bytes never shuffled by cell)
    return pages_ds.join(hits, "inner", num_partitions=num_partitions,
                         on=("url",),
                         aggregator_ray_remote_args={"num_cpus": 0.25})
