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
