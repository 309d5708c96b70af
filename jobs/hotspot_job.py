"""spark-submit entrypoint: the space-time hotspot surveillance pipeline
as a resumable, snapshot-checkpointed batch job — the geospatial-temporal
counterpart of jobs/flagship_job.py.

Usage:

  python tools/make_pyfiles.py                       # builds dist/geocube.zip
  spark-submit --py-files dist/geocube.zip \\
      jobs/hotspot_job.py \\
      --events /path/to/events_parquet \\
      --out /path/to/result_table \\
      [--grid 8] [--z-crit 1.96]

Pipeline: event scan -> deterministic cell/day binning -> per-day Gi*
surfaces -> Mann-Kendall trend on each cell's z series -> emerging-hotspot
labels + Theil-Sen slope on the raw counts -> GeoJSONSeq vector export of
the labeled cells + snapshot commit with lineage.  Each stage commits a
snapshot; rerunning after a crash skips completed stages (run_resumable).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True, help="events parquet path")
    ap.add_argument("--out", required=True, help="output snapshot table dir")
    ap.add_argument("--grid", type=int, default=8, help="grid side length")
    ap.add_argument("--z-crit", type=float, default=1.96)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from data_cube_utilities_spark.operators import spatial
    from data_cube_utilities_spark.sources.snapshots import (SnapshotTable,
                                                             run_resumable)

    spark = SparkSession.builder.appName("geocube-hotspots").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    g = args.grid

    def binned():
        ev = spark.read.parquet(args.events)
        return (ev.groupBy(F.dayofmonth("ts").alias("t"),
                           (F.col("user_id") % g).alias("ix"),
                           (F.expr(f"user_id div {g}") % g).alias("iy"))
                  .agg(F.count("*").alias("x")))

    def hotspots():
        return spatial.emerging_hotspots(binned(), z_crit=args.z_crit)

    def slopes():
        return spatial.theil_sen_grid(binned())

    def labeled():
        h = hotspots()
        s = slopes()
        return (h.join(s, ["ix", "iy"], "left")
                 .select("ix", "iy", "m", "s_stat", "mk_z", "last_z",
                         "label", "n_pairs", "sen_slope"))

    table = SnapshotTable(args.out)
    run_resumable(table, [("hotspot_labels", labeled)])
    out = table.read(spark)
    n = out.count()
    hot = out.filter(F.col("label").startswith("hot")).count()
    print(f"hotspot_job: {n} cells labeled, {hot} hot "
          f"(snapshot at {args.out})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
