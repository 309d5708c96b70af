"""Scale evidence for the session-7 operators: each at 60-1200x the
driver-table size on local[32], wall seconds + output rows ->
BENCH/S7_SCALE.md.  Deterministic spark.range inputs only."""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_cube_utilities_spark.session import get_spark  # noqa: E402


def timed(name, fn):
    t0 = time.time()
    n = fn()
    w = time.time() - t0
    print(f"{name}: {n} rows in {w:.1f}s", flush=True)
    return name, n, w


def main():
    spark = get_spark()
    out = []
    from data_cube_utilities_spark.operators import (mlops, rasterops,
                                                     spatial, temporal)
    from data_cube_utilities_spark.sources import catalog

    # 64 images x 256x256 = 4.2M px -> 262k DCT blocks (1024x driver)
    px = spark.range(64 * 256 * 256).selectExpr(
        "id % 64 AS img", "(id div 64) % 256 AS px", "id div 16384 AS py",
        "(id * 2654435761) % 256 AS val")
    out.append(timed("int_dct_262k_blocks",
                     lambda: rasterops.int_dct_blocks_long(px).count()))

    # 4 images x 1024x1024 = 4.2M px debayer (1024x driver)
    bay = spark.range(4 * 1024 * 1024).selectExpr(
        "id % 4 AS img", "(id div 4) % 1024 AS px", "id div 4096 AS py",
        "(id * 40503) % 256 AS val")
    out.append(timed("debayer_4m_px",
                     lambda: rasterops.debayer_grid(bay).count()))

    # BRIEF descriptors over 2048 32x32 images (512x driver); matching
    # across 64 images (~1M candidate pairs)
    bp = spark.range(2048 * 32 * 32).selectExpr(
        "id % 2048 AS img", "(id div 2048) % 32 AS px", "id div 65536 AS py",
        "(id * 2246822519) % 256 AS val")
    out.append(timed("brief_desc_2048_imgs",
                     lambda: rasterops.brief_descriptors(bp).count()))
    d64 = rasterops.brief_descriptors(bp.filter("img < 64"))
    out.append(timed("brief_match_64_imgs",
                     lambda: rasterops.brief_matches(d64).count()))

    # SAD motifs: 16 series x 1024 points (~8M window pairs, 60x driver)
    ser = spark.range(16 * 1024).selectExpr(
        "id % 16 AS grp", "id AS t",
        "((id div 80) % 4) * 10 + (id * 13) % 7 AS v")
    out.append(timed("sad_motifs_16x1024",
                     lambda: temporal.sad_motifs(ser, ["grp"], "t", "v",
                                                 w=8).count()))

    # 50k short segments in a 4096^2 world (830x driver pair workload)
    segs = spark.range(50_000).selectExpr(
        "id AS seg_id",
        "(id * 2654435761) % 4096 AS x1", "(id * 2246822519) % 4096 AS y1",
        "(id * 2654435761) % 4096 + id % 64 - 32 AS x2",
        "(id * 2246822519) % 4096 + (id * 7) % 64 - 32 AS y2")
    out.append(timed("seg_intersect_50k",
                     lambda: spatial.segment_intersections(segs).count()))

    # decision stump on 5M rows / 4 groups (1200x driver)
    lab = spark.range(5_000_000).selectExpr(
        "id % 4 AS g", "(id * 2654435761) % 100 AS x",
        "CAST((id * 40503) % 100 < 37 AS LONG) AS y")
    out.append(timed("decision_stump_5m",
                     lambda: mlops.decision_stump(lab, "x", "y",
                                                  ["g"]).count()))

    # FD audit on 5M rows, 500k keys
    fdin = spark.range(5_000_000).selectExpr(
        "id % 500000 AS a", "(id * 31) % 997 AS c")
    out.append(timed("fd_audit_5m",
                     lambda: catalog.fd_violations(fdin, ["a"],
                                                   "c").count()))

    # golden record: 2M candidate rows, 100k entities x 2 fields
    gr = spark.range(2_000_000).selectExpr(
        "id % 100000 AS e",
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS f",
        "CAST((id * 17) % 1000 AS STRING) AS value",
        "timestamp_micros(1600000000000000 + (id * 40503) % 100000000)"
        " AS ts",
        "id % 3 AS p")
    out.append(timed("golden_record_2m",
                     lambda: catalog.golden_record(gr, "e", "f", "value",
                                                   "ts", "p").count()))

    # Haar + GLRLM + radial over the 64x256x256 pixel set (1024x driver)
    out.append(timed("haar_dwt_4m_px",
                     lambda: rasterops.haar_dwt_long(px).count()))
    out.append(timed("glrlm_64_imgs",
                     lambda: rasterops.glrlm_features_long(px).count()))
    out.append(timed("radial_profile_64_imgs",
                     lambda: rasterops.radial_profile_long(px).count()))

    # blocking metrology over 2M synthetic docs (4000x driver)
    from data_cube_utilities_spark.operators import textops
    docs = spark.range(2_000_000).selectExpr(
        "id AS doc_id",
        "concat('tok', CAST(id % 50000 AS STRING), ' w', "
        "CAST((id * 31) % 997 AS STRING)) AS text",
        "CASE WHEN id % 3 = 0 THEN 'en' ELSE 'de' END AS lang")
    toks = F.split(F.col("text"), " ")
    out.append(timed(
        "blocking_eval_2m",
        lambda: textops.blocking_eval(
            docs, F.md5(F.concat_ws(" ", F.array_sort(toks))),
            F.concat_ws("|", F.col("lang"), F.element_at(toks, 1)))
        .count()))

    with open("/root/repo/BENCH/S7_SCALE.md", "w") as f:
        f.write("# Session-7 operators at 60-1200x driver scale "
                "(local[32])\n\n| op | rows out | wall s |\n|---|---|---|\n")
        for name, n, w in out:
            f.write(f"| {name} | {n} | {w:.1f} |\n")
    spark.stop()


if __name__ == "__main__":
    main()
