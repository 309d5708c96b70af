"""SparkSession factory with scale-appropriate defaults.

Local mode here is the test vehicle; the config choices are the ones that
matter on a 1000-executor cluster too: AQE (runtime re-plan + skew-join
splitting), Arrow for every JVM<->Python crossing, shuffle partitions sized
to parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark-geocube",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(cores, 32) — on a real cluster this
    would be ~2-3x total executor cores; AQE coalesces the excess.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 32)

    # Python workers must be able to import this package: closures that
    # reference module-level functions (grouped-map fitters, Arrow
    # kernels) pickle BY REFERENCE, so the worker re-imports the module.
    # Local-mode workers inherit PYTHONPATH from the driver env — add the
    # package root if the caller launched from elsewhere (tools/, /tmp).
    # On a real cluster this is spark-submit --py-files dist/geocube.zip.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (pkg_root + os.pathsep + pp) if pp \
            else pkg_root

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # permissive arithmetic (NULL on /0, truncating casts) — matches the
        # DuckDB-oracle semantics; operators still nullif-guard divisions so
        # they stay correct under a foreign ANSI-enabled session too
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
