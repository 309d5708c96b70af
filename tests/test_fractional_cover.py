"""Fractional cover end-to-end: feature design parity with a literal
transcription of the reference construction, batched-NNLS parity with the
pixel-wise Lawson-Hanson solver, mixture recovery, and the Spark tile
operator (dc_fractional_coverage_classifier.py:23-145)."""

import numpy as np
import pandas as pd
import pytest

from data_cube_utilities_spark.operators import fractional_cover as fc
from data_cube_utilities_spark.operators import rasterops


def _reference_features(bands6, clean):
    """Straight transcription of the reference's hstack loops
    (dc_fractional_coverage_classifier.py:67-106) for parity checking."""
    band_stack = []
    mask = clean.ravel()
    for i in range(6):
        band = bands6[:, i].astype(np.float64) * 0.0001
        band_clean = np.full(band.shape, np.nan)
        band_clean[mask] = band[mask]
        band_stack.append(band_clean)
    band_stack = np.array(band_stack).transpose()
    with np.errstate(all="ignore"):
        for b in range(6):
            band_stack = np.hstack((band_stack,
                                    np.expand_dims(np.log(band_stack[:, b]), 1)))
        for b in range(6):
            band_stack = np.hstack((band_stack, np.expand_dims(
                np.multiply(band_stack[:, b], band_stack[:, b + 6]), 1)))
        for b in range(6):
            for b2 in range(b + 1, 6):
                band_stack = np.hstack((band_stack, np.expand_dims(
                    np.multiply(band_stack[:, b], band_stack[:, b2]), 1)))
        for b in range(6):
            for b2 in range(b + 1, 6):
                band_stack = np.hstack((band_stack, np.expand_dims(
                    np.multiply(band_stack[:, b + 6], band_stack[:, b2 + 6]), 1)))
        for b in range(6):
            for b2 in range(b + 1, 6):
                band_stack = np.hstack((band_stack, np.expand_dims(
                    np.divide(band_stack[:, b2] - band_stack[:, b],
                              band_stack[:, b2] + band_stack[:, b]), 1)))
    band_stack = np.nan_to_num(band_stack)
    ones = np.ones((band_stack.shape[0], 1))
    return np.concatenate((band_stack, ones), axis=1)


def test_feature_design_matches_reference_transcription():
    rng = np.random.RandomState(11)
    bands = rng.randint(1, 5000, size=(200, 6)).astype(np.float64)
    clean = rng.rand(200) > 0.3
    got = fc.fc_features_np(bands, clean)
    exp = _reference_features(bands, clean)
    assert got.shape == (200, 64)
    assert np.allclose(got, exp, equal_nan=True)


def test_endmember_matrix_shape_and_weight_row():
    A = fc.fc_endmember_matrix()
    assert A.shape == (64, 3)
    assert np.allclose(A[-1], fc.SUM_TO_ONE_WEIGHT)
    # rows live in the 64-feature space (logs/ratios are negative) and are
    # bounded like the scaled-reflectance features they were trained on
    assert (np.abs(A[:-1]) < 1).all()
    assert np.allclose(A[0], [0.221278, 0.194657, 0.185084])


def test_batched_solver_matches_lawson_hanson():
    rng = np.random.RandomState(7)
    A = fc.fc_endmember_matrix()
    feats = rng.rand(300, 64) * 0.5
    batched = fc.fc_solve_np(feats, A)
    for i in range(0, 300, 17):
        lh = rasterops.nnls_np(A, feats[i])
        # same optimum: residuals agree (coefficients may swap only when
        # degenerate, which random data never is)
        rb = np.linalg.norm(A @ batched[i] - feats[i])
        rl = np.linalg.norm(A @ lh - feats[i])
        assert rb <= rl + 1e-8
        assert np.allclose(batched[i], lh, atol=1e-6)


def test_mixture_recovery():
    rng = np.random.RandomState(3)
    A = fc.fc_endmember_matrix()
    f_true = rng.dirichlet([2, 2, 2], size=50)          # sums to 1, >= 0
    feats = f_true @ A.T                                 # exact mixtures
    got = fc.fc_solve_np(feats, A)
    assert np.allclose(got, f_true, atol=1e-6)


def test_frac_coverage_np_output_contract():
    rng = np.random.RandomState(5)
    bands = rng.randint(100, 4000, size=(64, 6)).astype(np.float64)
    clean = rng.rand(64) > 0.25
    out = fc.frac_coverage_np(bands, clean)
    assert out.dtype == np.int16 and out.shape == (64, 3)
    assert (out[~clean] == fc.NODATA).all()
    assert (out[clean] >= 0).all() and (out[clean] <= 254).all()


def test_frac_coverage_classify_spark(spark):
    from data_cube_utilities_spark import synth, codec

    imgs = synth.synthesize_images(spark, 40, tile_px=8, partitions=2)
    out = fc.frac_coverage_classify(
        imgs.select("image_id", "bytes", "w", "h", "fmt")).toPandas()
    assert len(out) == 40
    assert set(out.columns) == {"image_id", "w", "h", "fc", "n_clean",
                                "mean_pv", "mean_npv", "mean_bs"}
    # decode one block and cross-check against the numpy kernel
    r = out.iloc[0]
    src = imgs.filter(f"image_id = '{r.image_id}'").collect()[0]
    blk = codec.decode_block(bytes(src.bytes), src.w, src.h, src.fmt)
    qa = blk[:, :, codec.QA_BAND].astype(np.int64).ravel()
    clean = (qa & 6) != 0
    exp = fc.frac_coverage_np(blk[:, :, :6].reshape(-1, 6), clean)
    got = np.frombuffer(bytes(r.fc), dtype=np.int16).reshape(r.h, r.w, 3)
    assert (got.reshape(-1, 3) == exp).all()
    assert r.n_clean == int(clean.sum())


# ---------------------------------------------------------------------------
# generated-SQL twin (fc_pixel_sql): the driver oracle for the numpy kernel
# ---------------------------------------------------------------------------

def _rand_bands(n, seed, zero_rows=0):
    rng = np.random.RandomState(seed)
    bands = rng.randint(1, 5000, size=(n, 6)).astype(np.int64)
    for i in range(zero_rows):
        bands[i, rng.randint(6)] = 0
    return bands


def test_fc_pixel_sql_matches_numpy_kernel_on_spark(spark):
    """The Spark-SQL evaluation of fc_pixel_sql must reproduce
    frac_coverage_np per pixel (the CORRECTNESS_r03 contract is sums of
    these ints). BLAS vs sequential-SQL summation differ in ulps, so the
    int percents are compared exactly and the check would catch any
    floor/argmin boundary flip."""
    bands = _rand_bands(400, seed=7)
    pdf = pd.DataFrame(bands, columns=["blue", "green", "red", "nir",
                                       "swir1", "swir2"])
    pdf.insert(0, "px_id", np.arange(len(pdf)))
    spark.createDataFrame(pdf).createOrReplaceTempView("fc_px_test")
    sql = fc.fc_pixel_sql("fc_px_test", ["px_id"])
    got = spark.sql(sql).toPandas().sort_values("px_id").reset_index(drop=True)
    want = fc.frac_coverage_np(bands)
    assert (got[["pv", "npv", "bs"]].to_numpy() == want.astype(np.int64)).all()


def test_fc_pixel_sql_matches_on_duckdb():
    """Identical SQL text on DuckDB reproduces the same ints — the two
    engines run the same expression tree (scientific-notation literals keep
    DuckDB off DECIMAL arithmetic; neither engine reassociates doubles)."""
    import duckdb

    bands = _rand_bands(400, seed=11)
    pdf = pd.DataFrame(bands, columns=["blue", "green", "red", "nir",
                                       "swir1", "swir2"])
    pdf.insert(0, "px_id", np.arange(len(pdf)))
    con = duckdb.connect()
    con.register("fc_px_test", pdf)
    sql = fc.fc_pixel_sql("fc_px_test", ["px_id"])
    got = con.execute(sql).fetchdf().sort_values("px_id").reset_index(drop=True)
    want = fc.frac_coverage_np(bands)
    assert (got[["pv", "npv", "bs"]].to_numpy() == want.astype(np.int64)).all()


def test_clamped_log_rows_route_through_lawson_hanson():
    """Rows with a zero band hit the float32-max log clamp; the batched
    residual math is cancellation-dominated there (ADVICE r2), so those
    rows must be solved by the pixel-wise exact solver instead."""
    bands = _rand_bands(32, seed=3, zero_rows=4)
    feats = fc.fc_features_np(bands)
    got = fc.fc_solve_np(feats)
    A = fc.fc_endmember_matrix()
    for i in range(4):
        want = rasterops.nnls_np(A, feats[i])
        assert np.allclose(got[i], want, atol=1e-9), i
    # non-clamped rows still come from the batched path and match LH too
    for i in range(4, 10):
        want = rasterops.nnls_np(A, feats[i])
        assert np.allclose(got[i], want, atol=1e-6), i
