"""Mask predicates and band-index registry: semantics + twin parity.
The SQL template is the single source; Spark runs it via F.expr and DuckDB
runs the same string — these tests pin that they agree with the numpy twins.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_cube_utilities_spark.operators import indices, masks


def test_qa_clean_mask_semantics(spark):
    # clear=2, water=4, cloud=32 for LANDSAT_8 c1 l2
    pdf = pd.DataFrame({"pixel_qa": [2, 4, 6, 32, 1, 0, 66]})
    sdf = spark.createDataFrame(pdf)
    out = sdf.select(
        masks.qa_clean_mask(F.col("pixel_qa"), "LANDSAT_8",
                            ["clear", "water"], "c1", "l2").alias("m")
    ).toPandas()["m"]
    # 66 = 64|2 has the clear bit -> True
    assert out.tolist() == [True, True, True, False, False, False, True]
    got = masks.qa_clean_mask_np(pdf["pixel_qa"].to_numpy(), "LANDSAT_8",
                                 ["clear", "water"], "c1", "l2")
    assert got.tolist() == out.tolist()


def test_qa_unsupported_combo():
    with pytest.raises(ValueError):
        masks.unpack_qa_np(np.array([1]), "clear", "LANDSAT_9", "c1", "l2")


def test_c2_encoding_differs():
    qa = np.array([64, 128, 8])
    c2 = masks.qa_clean_mask_np(qa, "LANDSAT_8", ["clear", "water"], "c2", "l2")
    assert c2.tolist() == [True, True, False]


def test_valid_range_and_full_mask(spark):
    pdf = pd.DataFrame({
        "pixel_qa": [2, 2, 2, 32],
        "red": [100, -9999, 20000, 100],
        "nir": [50, 60, 70, 80],
    })
    sdf = spark.createDataFrame(pdf)
    out = sdf.select(masks.full_clean_mask(
        F.col("pixel_qa"), [F.col("red"), F.col("nir")],
        "LANDSAT_8", "c1", "l2").alias("m")).toPandas()["m"]
    assert out.tolist() == [True, False, False, False]


def test_cfmask_and_fmask(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"cf": [0, 1, 2, 3, 4, 255]}))
    out = sdf.select(masks.cfmask_clean_mask(F.col("cf")).alias("m")).toPandas()
    assert out["m"].tolist() == [True, True, False, False, False, False]


def test_s2_fmask_reference_table(spark):
    """Transcription of sentinel2_fmask_clean_mask (clean_mask.py:358):
    null=0, valid=1, cloud=2, cloud_shadow=3, snow=4, water=5; the default
    cover_types=('valid','water') keeps clear land + water ONLY — not the
    Landsat cfmask {0,1} set (ADVICE r3, medium)."""
    assert masks.S2_FMASK == {"null": 0, "valid": 1, "cloud": 2,
                              "cloud_shadow": 3, "snow": 4, "water": 5}
    sdf = spark.createDataFrame(pd.DataFrame({"fm": [0, 1, 2, 3, 4, 5]}))
    out = sdf.select(masks.fmask_clean_mask(F.col("fm")).alias("m")).toPandas()
    assert out["m"].tolist() == [False, True, False, False, False, True]
    # explicit cover_types still resolve through the S2 table
    out2 = sdf.select(masks.fmask_clean_mask(
        F.col("fm"), ("null", "snow")).alias("m")).toPandas()
    assert out2["m"].tolist() == [True, False, False, False, True, False]


def test_bit_mask(spark):
    sdf = spark.createDataFrame(pd.DataFrame({"qa": [1, 2, 3, 4, 8]}))
    out = sdf.select(masks.bit_mask(F.col("qa"), [0, 1]).alias("m")).toPandas()
    assert out["m"].tolist() == [True, True, True, False, False]


def test_circular_kernel():
    k = masks.circular_kernel(2)
    assert k.shape == (5, 5)
    assert k[2, 2] and k[0, 2] and not k[0, 0]
    assert k.sum() == 13


@pytest.fixture(scope="module")
def band_pdf():
    rng = np.random.RandomState(21)
    n = 2000
    return pd.DataFrame({
        b: rng.randint(0, 5000, n).astype("int64")
        for b in ["blue", "green", "red", "nir", "swir1", "swir2"]
    })


def test_index_twins_spark_duckdb(spark, band_pdf):
    sdf = spark.createDataFrame(band_pdf)
    con = duckdb.connect()
    con.register("t", band_pdf)
    for name in ["ndvi", "evi", "savi", "nbr", "ndwi", "mndwi", "ndbi",
                 "kndvi", "tcw", "tcg", "tcb", "bsi", "tsm", "awei_ns"]:
        sql = indices.index_sql(name)
        got = sdf.select(F.expr(sql).alias("v")).toPandas()["v"].to_numpy(float)
        exp = con.execute(f"SELECT {sql} AS v FROM t").fetchnumpy()["v"].astype(float)
        assert np.allclose(got, exp, equal_nan=True), name


def test_index_numpy_twin(band_pdf):
    cols = {k: band_pdf[k].to_numpy() for k in band_pdf.columns}
    con = duckdb.connect()
    con.register("t", band_pdf)
    for name in ["ndvi", "evi", "savi", "kndvi", "mndwi"]:
        exp = con.execute(
            f"SELECT {indices.index_sql(name)} AS v FROM t").fetchnumpy()["v"]
        got = indices.compute_np(name, **cols)
        assert np.allclose(got, np.asarray(exp, dtype=float), equal_nan=True), name


def test_wofs_tree_three_way(spark, band_pdf):
    """WOfS: Spark CASE expr == DuckDB CASE expr == numpy reference twin."""
    sql = indices.wofs_sql()
    sdf = spark.createDataFrame(band_pdf)
    got_spark = sdf.select(F.expr(sql).alias("w")).toPandas()["w"].to_numpy()
    con = duckdb.connect()
    con.register("t", band_pdf)
    got_duck = con.execute(f"SELECT {sql} AS w FROM t").fetchnumpy()["w"]
    got_np = indices.wofs_np(*[band_pdf[b].to_numpy() for b in
                               ["blue", "green", "red", "nir", "swir1", "swir2"]])
    assert (got_spark == got_np).all()
    assert (np.asarray(got_duck) == got_np).all()
    assert 0 < got_np.sum() < len(got_np)  # both classes appear


def test_wofs_nan_ratio_classifies_zero(spark):
    # swir1+green == 0 -> NULL ratio -> class 0 in SQL; NaN -> 0 in numpy
    pdf = pd.DataFrame({"blue": [100], "green": [0], "red": [50],
                        "nir": [10], "swir1": [0], "swir2": [5]})
    sdf = spark.createDataFrame(pdf)
    got = sdf.select(F.expr(indices.wofs_sql()).alias("w")).toPandas()["w"][0]
    exp = indices.wofs_np(np.array([100]), np.array([0]), np.array([50]),
                          np.array([10]), np.array([0]), np.array([5]))[0]
    assert got == exp == 0


def test_convert_range_affine_and_models(spark):
    """convert_range (dc_utilities.py:73-171, pretrained models replaced by
    injectable affine coefficients): range endpoints map onto endpoints,
    NaN passes through, per-band model override wins."""
    import numpy as np
    import pandas as pd
    from data_cube_utilities_spark.operators import convert

    c1 = ("LANDSAT_8", "c1", "l2")
    c2 = ("LANDSAT_8", "c2", "l2")
    rd = convert.get_range_dict(*c1)
    assert rd["red"] == [0, 10000] and set(rd) == {
        "red", "green", "blue", "nir", "swir1", "swir2"}
    pdf = pd.DataFrame({b: [0.0, 10000.0, np.nan, 5000.0]
                        for b in ["red", "green", "blue",
                                  "nir", "swir1", "swir2"]})
    df = spark.createDataFrame(pdf)
    out = convert.convert_range(df, c1, c2).toPandas()
    assert out["red"][0] == 1.0 and out["red"][1] == 65455.0
    assert np.isnan(out["red"][2])
    # numpy twin agrees
    np.testing.assert_allclose(
        convert.convert_range_np(np.array([0.0, 10000.0, 5000.0]), c1, c2),
        [1.0, 65455.0, out["red"][3]])
    # injected model overrides the range-implied default for that band only
    out2 = convert.convert_range(df, c1, c2,
                                 models={"red": (2.0, 5.0)}).toPandas()
    assert out2["red"][1] == 20005.0 and out2["green"][1] == 65455.0
    import pytest as _p
    with _p.raises(ValueError):
        convert.get_range_dict("SENTINEL_2", "c1", "l2")


def test_hex_to_rgb():
    import numpy as np
    from data_cube_utilities_spark.operators.convert import hex_to_rgb

    np.testing.assert_array_equal(hex_to_rgb("#ff8000"), [255, 128, 0])
    np.testing.assert_array_equal(hex_to_rgb("000a10"), [0, 10, 16])
    import pytest as _p
    with _p.raises(ValueError):
        hex_to_rgb("#fff")
