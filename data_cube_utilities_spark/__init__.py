"""spark-geocube: a from-scratch PySpark-native spatial-join + tiling analytics engine.

Re-expresses the raster-analytics capabilities of ceos-seo/data_cube_utilities
(mosaicking, QA/cloud/water masking, band-math indices, geomedian compositing,
zonal statistics, tiling) as Spark DataFrame operators over tables of
image+caption rows, plus the spatial core the north rule mandates: a batched
hierarchical cell encoder (H3/S2-style), ray-casting point-in-polygon, and
hex-ring-expansion kNN — all vectorized (Column expressions or pandas/Arrow
UDFs, never per-row Python).

This is NOT a port: the reference executes eager numpy over xarray cubes; this
engine declares Catalyst plans over long-format pixel rows / binary tile rows
and lets Spark pick physical strategies.
"""

__version__ = "0.1.0"
