"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — one callable per implemented operator (SURVEY.md section 2),
                each (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching ANSI SQL DuckDB runs on the same parquet views.

The registry itself lives in data_cube_utilities_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_cube_utilities_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: masked WOfS water classification + band indices composited
    per geocell over the sf0.001 star schema (scan -> QA mask -> band math ->
    tile assignment -> grouped composite)."""
    from pyspark.sql import functions as F

    from data_cube_utilities_spark import cells
    from data_cube_utilities_spark.operators import indices

    sf_dir = "/root/testdata/sf0.001"
    px = _q._lineitem_bands(spark, sf_dir)
    li_sup = px.join(
        spark.read.parquet(f"{sf_dir}/supplier.parquet"),
        px.l_suppkey == F.col("s_suppkey"))
    located = (li_sup
               .withColumn("x", F.expr(_q.SUP_X))
               .withColumn("y", F.expr(_q.SUP_Y))
               .withColumn("cell_id",
                           cells.encode_col(F.col("y"), F.col("x"), 5)))
    clean = (F.col("pixel_qa").bitwiseAND(F.lit(2)) != 0) | \
            (F.col("pixel_qa").bitwiseAND(F.lit(4)) != 0)
    return (located.filter(clean)
            .withColumn("water", F.expr(indices.wofs_sql()))
            .withColumn("ndvi", indices.index_col("ndvi"))
            .groupBy("cell_id")
            .agg(F.count("*").alias("n_obs"),
                 F.round(F.avg("water"), 6).alias("water_frac"),
                 F.round(F.expr("percentile(ndvi, 0.5)"), 6).alias("median_ndvi"),
                 F.round(F.avg("ndvi"), 6).alias("mean_ndvi")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _q.registry().items()
            if sql is not None}
