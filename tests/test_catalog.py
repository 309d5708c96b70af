"""Catalog helpers: mostcommon_crs vote, path datetime parsing,
measurement validation, full extent dict."""

import warnings

import pytest

from data_cube_utilities_spark.sources import catalog


def test_mostcommon_crs_vote_and_warning(spark):
    df = spark.createDataFrame(
        [("EPSG:32755",)] * 5 + [("EPSG:32756",)] * 3, "crs string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert catalog.mostcommon_crs(df) == "EPSG:32755"
        assert any("Multiple CRSs" in str(x.message) for x in w)
    one = spark.createDataFrame([("EPSG:4326",)] * 4, "crs string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert catalog.mostcommon_crs(one) == "EPSG:4326"
        assert not [x for x in w if "Multiple CRSs" in str(x.message)]
    assert catalog.mostcommon_crs(df.limit(0)) is None
    # deterministic tie-break: lexicographically smallest CRS wins
    tie = spark.createDataFrame(
        [("EPSG:32756",)] * 2 + [("EPSG:32755",)] * 2, "crs string")
    assert catalog.mostcommon_crs(tie) == "EPSG:32755"


def test_paths_to_datetimeindex(spark):
    df = spark.createDataFrame(
        [("/g/data/scene/2019-03-05_B4.tif",),
         ("s3://bucket/x/2020-11-30_B8.tif",)], "path string")
    out = catalog.paths_to_datetimeindex(df).orderBy("datetime").collect()
    assert [str(r.datetime)[:10] for r in out] == ["2019-03-05", "2020-11-30"]


def test_validate_and_missing_measurements(spark):
    df = spark.createDataFrame([(1, 2, 3)], "red int, nir int, swir1 int")
    assert catalog.validate_measurements(df, ["red", "nir"])
    assert not catalog.validate_measurements(df, ["red", "blue"])
    assert catalog.missing_measurements(df, ["blue", "red", "qa"]) == ["blue", "qa"]


def test_full_dataset_extent(spark):
    df = spark.createDataFrame(
        [("2020-01-02", 1.0, 10.0), ("2020-01-01", 2.0, 10.0),
         ("2020-01-02", 1.0, 11.0)],
        "acquired_at string, y double, x double")
    ext = catalog.full_dataset_extent(df)
    assert set(ext) == {"time", "latitude", "longitude"}
    assert [r.acquired_at for r in ext["time"].collect()] == \
        ["2020-01-01", "2020-01-02"]
    assert [r.y for r in ext["latitude"].collect()] == [1.0, 2.0]
    assert [r.x for r in ext["longitude"].collect()] == [10.0, 11.0]
    assert catalog.full_dataset_extent(df.limit(0)) == {}


def test_profile_table_mixed_types_and_nulls(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(1, 2.5, "b", dt.datetime(2024, 1, 2, 3, 4, 5)),
         (2, None, "a", dt.datetime(2024, 6, 7, 8, 9, 10)),
         (2, -1.0, None, None)],
        "k long, v double, s string, t timestamp")
    out = (catalog.profile_table(df).toPandas()
           .set_index("col_name"))
    assert (out.n_rows == 3).all()
    assert out.loc["k"].n_nulls == 0 and out.loc["k"].n_distinct == 2
    assert out.loc["k"].min_num == 1.0 and out.loc["k"].max_num == 2.0
    assert out.loc["v"].n_nulls == 1 and out.loc["v"].min_num == -1.0
    assert out.loc["v"].max_num == 2.5
    assert out.loc["s"].n_nulls == 1
    assert out.loc["s"].min_str == "a" and out.loc["s"].max_str == "b"
    assert out.loc["t"].n_nulls == 1
    assert out.loc["t"].min_str == "2024-01-02 03:04:05"
    assert out.loc["t"].max_str == "2024-06-07 08:09:10"
    # numeric rows leave the string slots null and vice versa
    import math
    assert out.loc["k"].min_str is None
    assert math.isnan(out.loc["s"].min_num)


def test_profile_table_single_scan(spark):
    # the long-form union must explode the CHECKPOINTED 1-row aggregate,
    # never re-running the scan: the physical plan of the output contains
    # only LogicalRDD scans (the checkpoint), no file scan at all
    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS x")
    out = catalog.profile_table(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LogicalRDD" in plan
    assert "Range" not in plan
