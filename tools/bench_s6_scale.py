"""Scale evidence for the session-6 operators: run each at ~100-250x the
driver-table size on local[32] and record wall seconds + output rows.
Results -> BENCH/S6_SCALE.md.  Synthetic inputs are deterministic
spark.range derivations (no RNG, no external data)."""
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

    # 1M-edge weighted graph: //2 hierarchy + modular cross links
    from data_cube_utilities_spark.operators import graph
    e = (spark.range(500_000).selectExpr(
        "id + 2 AS src", "(id + 2) div 2 AS dst", "1 + id % 7 AS w")
        .unionAll(spark.range(500_000).selectExpr(
            "id + 2 AS src", "(id * 3) % 100000 AS dst", "3 + id % 5 AS w")))
    out.append(timed("sssp_1m_edges", lambda: graph.sssp(
        e, lambda n: n % 997 == 0, max_rounds=24, weight_col="w").count()))

    # 256x256 skeletonization (16x the driver grid)
    from data_cube_utilities_spark.operators import rasterops
    g = (spark.range(256 * 256)
         .selectExpr("id % 256 AS ix", "id div 256 AS iy",
                     "(id * 2654435761) % 256 AS v")
         .filter("v >= 96").select("ix", "iy"))
    out.append(timed("skeletonize_256", lambda: rasterops.skeletonize_grid(
        g, max_rounds=8).count()))

    # 200k boxes over 20k images
    b = spark.range(200_000).selectExpr(
        "id % 20000 AS img", "id AS box_id",
        "(id * 7) % 96 AS x1", "(id * 13) % 96 AS y1",
        "(id * 7) % 96 + 4 + id % 9 AS x2",
        "(id * 13) % 96 + 4 + id % 7 AS y2", "(id * 31) % 1000 AS score")
    out.append(timed("box_nms_200k", lambda: rasterops.box_nms(b).count()))

    # 512x512 bilateral filter (64x the driver grid)
    from data_cube_utilities_spark.operators import spatial
    big = spark.range(512 * 512).selectExpr(
        "id % 512 AS ix", "id div 512 AS iy", "(id * 40503) % 256 AS v")
    out.append(timed("bilateral_512", lambda: spatial.bilateral_filter_grid(
        big).count()))

    # BM25 over 200k synthetic docs
    from data_cube_utilities_spark.operators import textops
    docs = spark.range(200_000).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 20 + CAST(id % 30 AS INT)), "
        "i -> element_at(array('spark','window','customer','vector','table',"
        "'row','agg','scan','key','value'), "
        "1 + CAST((id * i * 2654435761) % 10 AS INT)))) AS text")
    out.append(timed("bm25_200k_docs", lambda: textops.bm25_topk(
        docs, ["spark", "vector"], k=20).count()))

    # 2M-row stratified exact sample over 50 strata
    from data_cube_utilities_spark.operators import sketches
    s = spark.range(2_000_000).selectExpr(
        "id AS doc_id", "CAST(id % 50 AS STRING) AS lang")
    out.append(timed("stratified_2m", lambda: sketches.
                     stratified_exact_sample(s, "lang", "doc_id",
                                             10_000).count()))

    for name, n, w in out:
        print(f"| {name} | {n} | {w:.1f} |")
    spark.stop()


if __name__ == "__main__":
    main()
