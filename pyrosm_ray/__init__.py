"""pyrosm_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of pyrosm's OSM data-processing semantics
(element model, tag filters, topology assembly, geometry typing) as
ray.data.Dataset pipelines, extended with H3/S2-style tiling, broadcast
uniform-grid point-in-polygon / kNN spatial joins (an STR-packed R-tree is
also provided in :mod:`pyrosm_ray.geom.strtree`) over Common-Crawl-style
web-page tables, raster<->vector zonal stats, dedup / text-analysis /
similarity operators, and per-partition checkpointing.
"""

__version__ = "0.1.0"
