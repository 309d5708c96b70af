"""spark-submit entrypoint: the flagship engine pipeline as a resumable,
snapshot-checkpointed batch job (north rule: deployment via
``spark-submit --py-files``).

Usage (local or cluster master via --master):

  python tools/make_pyfiles.py                       # builds dist/geocube.zip
  spark-submit --py-files dist/geocube.zip \\
      jobs/flagship_job.py \\
      --images /path/to/images_parquet \\
      --out /path/to/result_table \\
      [--n-synth 100000]          # synthesize instead of reading
      [--res 9] [--composite median]

Pipeline: scan (or deterministic synth) -> PIP spatial join against the
configured polygon layer -> geocell tile assignment -> per-tile raster
features (decode, QA mask, WOfS + NDVI) -> per-cell composite agg ->
snapshot commit with per-partition lineage + metrics. Each stage commits a
snapshot; rerunning after a crash skips completed stages (run_resumable).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import SparkSession, functions as F


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", help="input image-table parquet")
    ap.add_argument("--n-synth", type=int, default=0,
                    help="synthesize this many images instead of reading")
    ap.add_argument("--out", required=True, help="output snapshot table dir")
    ap.add_argument("--res", type=int, default=9, help="geocell resolution")
    ap.add_argument("--tile-px", type=int, default=16)
    ap.add_argument("--composite", default="median",
                    choices=["median", "mean", "first", "max_ndvi"])
    args = ap.parse_args(argv)

    from data_cube_utilities_spark import cells, synth
    from data_cube_utilities_spark.operators import rasterops, spatial
    from data_cube_utilities_spark.sources.snapshots import (SnapshotTable,
                                                             run_resumable)

    spark = SparkSession.builder.appName("geocube-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.n_synth:
        imgs = synth.synthesize_images(spark, args.n_synth,
                                       tile_px=args.tile_px)
    else:
        imgs = spark.read.parquet(args.images)

    polys = {
        1: [(-130.0, 20.0), (-60.0, 20.0), (-60.0, 55.0), (-130.0, 55.0)],
        2: [(-20.0, 35.0), (20.0, 35.0), (20.0, 60.0), (-20.0, 60.0)],
        3: [(60.0, -45.0), (160.0, -45.0), (160.0, 45.0), (110.0, 5.0),
            (60.0, 45.0)],
    }

    table = SnapshotTable(args.out)

    def tiled():
        j = spatial.pip_broadcast(
            imgs.withColumnRenamed("lon0", "x").withColumnRenamed("lat0", "y"),
            polys)
        return j.withColumn(
            "cell_id", cells.encode_col(F.col("y"), F.col("x"), args.res))

    def features():
        return rasterops.tile_features(tiled())

    def composite():
        feats = table.read(spark)   # previous step's snapshot
        return (feats.groupBy("cell_id")
                .agg(F.count("*").alias("n_tiles"),
                     F.avg("clean_frac").alias("clean_frac"),
                     F.avg("water_frac").alias("water_frac"),
                     F.avg("mean_ndvi").alias("mean_ndvi")))

    ran = run_resumable(table, [
        ("features", features),
        ("composite", composite),
    ], metrics_cols=[])

    # fractional cover runs off the same polygon-joined scan into its own
    # snapshot table (per-image PV/NPV/BS unmixing summary + lineage)
    fc_table = SnapshotTable(args.out + "_fc")

    def frac_cover():
        from data_cube_utilities_spark.operators import fractional_cover as fcm

        src = tiled().select("image_id", "bytes", "w", "h", "fmt")
        return (fcm.frac_coverage_classify(src)
                .select("image_id", "n_clean",
                        "mean_pv", "mean_npv", "mean_bs"))

    ran_fc = run_resumable(fc_table, [("frac_cover", frac_cover)],
                           metrics_cols=[])
    print(f"steps run: {(ran or []) + (ran_fc or []) or 'none (all checkpointed)'}; "
          f"table at version {table.current_version()}, "
          f"fc table at version {fc_table.current_version()}")
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
