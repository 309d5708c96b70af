"""Scale evidence for the r5-s3 grid-statistics family: the driver rows
run on a 32x32 = 1,024-cell grid; this script runs the SAME operators on
a 512x512 = 262,144-cell synthetic DEM (256x the driver grid) plus a
deep-path variant, at local[$SPARK_GRAFT_CPUS].

The DEM is deterministic (value = mixed-frequency integer ridges), no
external data.  Reported per op: wall seconds and output rows, plus the
host spin anchor (compare with BENCH/BASELINE.md's fast band before
reading walls across sessions).

Usage: python tools/bench_geo_scale.py [grid_n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_cube_utilities_spark.session import get_spark
from data_cube_utilities_spark.operators import spatial

N = int(sys.argv[1]) if len(sys.argv) > 1 else 512
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def spin_anchor():
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2:
        n += 1
    return n


def main():
    spark = get_spark(cores=CPUS)
    # mixed-frequency ridged DEM: exact integers, pits scattered
    grid = spark.range(N * N).select(
        (F.col("id") % N).alias("ix"),
        (F.col("id") / N).cast("long").alias("iy")).withColumn(
        "v", ((F.col("ix") * 13 + F.col("iy") * 7) % 97
              + ((F.col("ix") * F.col("iy")) % 31) * 3
              + (F.col("ix") % 5) * 11).cast("long")).persist()
    grid.count()
    # a deep-path DEM (monotone ramp): longest D8 path ~ N diagonal steps
    ramp = spark.range(N * N).select(
        (F.col("id") % N).alias("ix"),
        (F.col("id") / N).cast("long").alias("iy")).withColumn(
        "v", (F.col("ix") + F.col("iy")).cast("long")).persist()
    ramp.count()

    results = {}

    def run(name, fn):
        t0 = time.time()
        n_rows = fn().count()
        results[name] = (round(time.time() - t0, 2), n_rows)
        print(name, results[name], flush=True)

    run("getis_ord_512", lambda: spatial.getis_ord_grid(grid))
    run("local_morans_512", lambda: spatial.local_morans_grid(grid))
    run("terrain_position_512", lambda: spatial.terrain_position_grid(grid))
    run("d8_flow_512", lambda: spatial.d8_flow_grid(grid))
    run("watershed_512", lambda: spatial.watershed_basins_grid(grid))
    run("flow_accum_512", lambda: spatial.flow_accumulation_grid(grid))
    run("watershed_ramp_deep", lambda: spatial.watershed_basins_grid(ramp))
    # Mann-Kendall / Theil-Sen: 16,384 cells x 48-step series
    ser = spark.range(16384 * 48).select(
        (F.col("id") % 128).alias("ix"),
        ((F.col("id") / 128).cast("long") % 128).alias("iy"),
        (F.col("id") / 16384).cast("long").alias("t")).withColumn(
        "x", ((F.col("ix") + F.col("iy")) * F.col("t") % 23
              + F.col("t") % 7).cast("long"))
    run("mann_kendall_16k_cells", lambda: spatial.mann_kendall_grid(ser))
    run("theil_sen_16k_cells", lambda: spatial.theil_sen_grid(ser))
    # IDW: 10k broadcast stations onto the 512^2 grid
    pts = spark.range(10000).select(
        (F.col("id") % N).alias("px"),
        ((F.col("id") * 37) % N).alias("py"),
        (F.col("id") % 500).alias("pv"))
    run("idw_10k_stations_512", lambda: spatial.idw_interpolate_grid(
        pts, grid.select("ix", "iy")))
    print({"anchor_spins_2s": spin_anchor(), "cpus": CPUS, "grid_n": N,
           "results": results})
    spark.stop()


if __name__ == "__main__":
    main()
