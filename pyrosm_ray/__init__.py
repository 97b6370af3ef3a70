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

# Route all-to-alls through the hash-shuffle strategy from the start
# (groupby co-partitioning needs key bucketing, not the default global
# SORT — see stages/blocks.py:tune_shuffle_context for measurements).
# Re-invoked by the partition-sizing helpers once the cluster is up so
# the parallelism knobs match the live CPU count.
from pyrosm_ray.stages.blocks import tune_shuffle_context as _tune

_tune()
del _tune
