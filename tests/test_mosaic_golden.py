"""Golden-value parity with the reference's own mosaic unit tests
(test/test_dc_mosaic.py in ceos-seo/data_cube_utilities) — same 5x2x2
fixture re-expressed as long-format rows, same expected matrices, run
through the Spark operators. This is the BASELINE.json gate:
"satisfy the reference's own unit tests for masking/mosaic functions".
"""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from data_cube_utilities_spark.operators import mosaic

TIMES = [
    datetime(1999, 5, 6), datetime(2006, 1, 2), datetime(2006, 1, 16),
    datetime(2015, 12, 31), datetime(2016, 1, 1),
]
LATS = [1.0, 2.0]
LONS = [1.0, 2.0]

CLEAN = np.array([[[True, True], [False, False]],
                  [[True, False], [True, False]],
                  [[False, False], [True, False]],
                  [[False, True], [True, False]],
                  [[True, True], [False, False]]])

TEST_DATA = np.array([[[1, 1], [1, 1]],
                      [[2, 2], [2, 2]],
                      [[3, 3], [3, 3]],
                      [[4, 4], [4, 4]],
                      [[5, 5], [5, 5]]])

NIR = np.array([[[0, 1], [0, 80]], [[1, 4], [1, 60]], [[0, 0], [2, 0]],
                [[1, 5], [1, 20]], [[2, 1], [1, 0]]])
RED = np.array([[[15, 1], [5, 1]], [[1, 1], [1, 1]], [[1, 5], [1, 1]],
                [[1, 1], [1, 1]], [[1, 1], [1, 4]]])
BLUE = np.array([[[62, 15], [31, 0]], [[42, 91], [3, 18]], [[44, 53], [45, 23]],
                 [[72, 53], [88, 32]], [[28, 91], [86, 67]]])
GREEN = np.array([[[58, 92], [61, 64]], [[86, 41], [70, 99]], [[14, 70], [27, 14]],
                  [[54, 2], [30, 45]], [[18, 6], [16, 44]]])
SWIR1 = np.array([[[53, 0], [48, 12]], [[58, 53], [45, 70]], [[4, 81], [58, 79]],
                  [[22, 68], [47, 26]], [[40, 75], [39, 58]]])
SWIR2 = np.array([[[55, 88], [88, 40]], [[70, 38], [84, 98]], [[77, 17], [8, 30]],
                  [[19, 42], [0, 27]], [[6, 56], [5, 99]]])

ALL_BANDS = dict(test_data=TEST_DATA, nir=NIR, red=RED, blue=BLUE,
                 green=GREEN, swir1=SWIR1, swir2=SWIR2)


def long_rows(clean=CLEAN, **bands) -> pd.DataFrame:
    rows = []
    for t in range(5):
        for i, lat in enumerate(LATS):
            for j, lon in enumerate(LONS):
                r = dict(time=TIMES[t], latitude=lat, longitude=lon,
                         clean=bool(clean[t, i, j]))
                for name, arr in bands.items():
                    r[name] = int(arr[t, i, j])
                rows.append(r)
    return pd.DataFrame(rows)


def grid(df: pd.DataFrame, band: str) -> np.ndarray:
    """DataFrame (latitude, longitude, band) -> 2x2 matrix in lat/lon order."""
    out = np.empty((2, 2))
    for _, r in df.iterrows():
        out[LATS.index(r["latitude"]), LONS.index(r["longitude"])] = r[band]
    return out


KEYS = ["latitude", "longitude"]


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(long_rows(**ALL_BANDS)).cache()


@pytest.fixture(scope="module")
def sdf_allclean(spark):
    return spark.createDataFrame(
        long_rows(clean=np.full(CLEAN.shape, True), **ALL_BANDS)).cache()


def test_first_and_last_valid(sdf):
    out = mosaic.mosaic_first_valid(sdf, KEYS, ["test_data"]).toPandas()
    assert (grid(out, "test_data") == [[1, 1], [2, -9999]]).all()
    rev = mosaic.mosaic_first_valid(sdf, KEYS, ["test_data"],
                                    reverse_time=True).toPandas()
    assert (grid(rev, "test_data") == [[5, 5], [4, -9999]]).all()


def test_first_valid_iterated(spark, sdf):
    inter = mosaic.mosaic_first_valid(sdf, KEYS, ["test_data"])
    allclean = spark.createDataFrame(
        long_rows(clean=np.full(CLEAN.shape, True), test_data=TEST_DATA))
    new = mosaic.mosaic_first_valid(allclean, KEYS, ["test_data"])
    out = mosaic.incremental_combine_first(inter, new, KEYS, ["test_data"]).toPandas()
    assert (grid(out, "test_data") == [[1, 1], [2, 1]]).all()


def test_mean(sdf):
    out = mosaic.mosaic_mean(sdf, KEYS, ["test_data"]).toPandas()
    assert (grid(out, "test_data") == [[2, 3], [3, -9999]]).all()


def test_median(sdf):
    out = mosaic.mosaic_median(sdf, KEYS, ["test_data"]).toPandas()
    assert (grid(out, "test_data") == [[2, 4], [3, -9999]]).all()


NDVI = "(CAST(nir AS DOUBLE) - red) / nullif(CAST(nir AS DOUBLE) + red, 0)"


def test_max_ndvi(sdf_allclean):
    out = mosaic.mosaic_extreme_selector(
        sdf_allclean, KEYS, ["test_data"], NDVI, maximize=True).toPandas()
    assert (grid(out, "test_data") == [[5, 4], [3, 1]]).all()


def test_min_ndvi(sdf_allclean):
    out = mosaic.mosaic_extreme_selector(
        sdf_allclean, KEYS, ["test_data"], NDVI, maximize=False).toPandas()
    assert (grid(out, "test_data") == [[1, 3], [1, 3]]).all()


def test_max_ndvi_iterated(spark, sdf_allclean):
    """Reference iteration: second pass with boosted NIR at t2 makes t2 win
    everywhere (test_dc_mosaic.py:154-165)."""
    inter = mosaic.mosaic_extreme_selector(
        sdf_allclean, KEYS, ["test_data", "nir", "red"], NDVI, maximize=True)
    nir2 = NIR.copy()
    nir2[2] = 100
    second = spark.createDataFrame(
        long_rows(clean=np.full(CLEAN.shape, True),
                  test_data=TEST_DATA, nir=nir2, red=RED))
    best2 = mosaic.mosaic_extreme_selector(
        second, KEYS, ["test_data", "nir", "red"], NDVI, maximize=True)
    # fold: keep whichever side has the higher NDVI (reference's use_mask)
    o = inter.select(*KEYS, *[pd_c for pd_c in ["test_data", "nir", "red"]])
    merged = (o.withColumnRenamed("test_data", "o_td")
               .withColumnRenamed("nir", "o_nir").withColumnRenamed("red", "o_red")
               .join(best2, KEYS))
    from pyspark.sql import functions as F
    new_ndvi = (F.col("nir") - F.col("red")) / (F.col("nir") + F.col("red"))
    old_ndvi = (F.col("o_nir") - F.col("o_red")) / (F.col("o_nir") + F.col("o_red"))
    out = merged.select(
        *KEYS,
        F.when(new_ndvi > old_ndvi, F.col("test_data"))
         .otherwise(F.col("o_td")).alias("test_data")).toPandas()
    assert (grid(out, "test_data") == [[3, 3], [3, 3]]).all()


GEOMEDIAN_GOLDEN = dict(
    swir1=[[52.795282, 64.96945], [57.762149, -9999]],
    swir2=[[53.79578, 48.799493], [8.378129, -9999]],
    nir=[[0.230488, 3.703346], [1.97955, -9999]],
    red=[[12.599269, 1.0], [1.0, -9999]],
    green=[[58.789003, 9.373638], [27.319318, -9999]],
    blue=[[57.744289, 59.947858], [45.331181, -9999]],
)

MEDOID_GOLDEN = dict(
    swir1=[[53.0, 68.0], [58.0, -9999]],
    swir2=[[55.0, 42.0], [8.0, -9999]],
    nir=[[0.0, 5.0], [2.0, -9999]],
    red=[[15.0, 1.0], [1.0, -9999]],
    green=[[58.0, 2.0], [27.0, -9999]],
    blue=[[62.0, 53.0], [45.0, -9999]],
)

SPECTRAL = ["red", "blue", "green", "nir", "swir1", "swir2"]


def test_geomedian(sdf):
    out = mosaic.mosaic_geomedian(sdf, KEYS, SPECTRAL, operation="median").toPandas()
    for band, exp in GEOMEDIAN_GOLDEN.items():
        assert np.isclose(grid(out, band), np.asarray(exp)).all(), band


def test_medoid(sdf):
    out = mosaic.mosaic_geomedian(sdf, KEYS, SPECTRAL, operation="medoid").toPandas()
    for band, exp in MEDOID_GOLDEN.items():
        assert np.isclose(grid(out, band), np.asarray(exp)).all(), band


def test_geomedian_numpy_kernel_simple():
    # collinear points: geometric median == middle point
    pts = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    assert np.allclose(mosaic.geomedian_np(pts), [1.0, 1.0], atol=1e-6)
    # geometric median of a symmetric cross is the center
    cross = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]], dtype=float)
    assert np.allclose(mosaic.geomedian_np(cross), [0.0, 0.0], atol=1e-6)
