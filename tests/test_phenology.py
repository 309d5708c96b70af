"""Phenology metrics: hand-computed triangular season + gap-fill behavior."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from data_cube_utilities_spark.operators import phenology


def test_triangular_season_numpy():
    # v rises 0..10 over t=0..10, falls back to 0 at t=20 (unit seconds)
    t = np.arange(21, dtype=float)
    v = np.concatenate([np.arange(11.0), np.arange(9.0, -1.0, -1.0)])
    r = phenology.phenology_np(t, v, factor=0.5)
    assert r["POS"] == 10.0 and r["vPOS"] == 10.0
    assert r["Trough"] == 0.0 and r["AOS"] == 10.0
    # first crossing of 5.0 going up is t=5; last >=5 after peak is t=15
    assert r["SOS"] == 5.0 and r["EOS"] == 15.0
    assert r["LOS"] == 10.0
    assert np.isclose(r["ROG"], (10.0 - 5.0) / 5.0)
    assert np.isclose(r["ROS"], (5.0 - 10.0) / 5.0)
    # integral of the triangle segment between t=5..15
    assert np.isclose(r["IOS"], np.trapz(v[5:16], t[5:16]))


def test_gap_fill_ffill_and_seed():
    t = np.arange(6, dtype=float)
    v = np.array([np.nan, 2.0, np.nan, 6.0, np.nan, 1.0])
    r = phenology.phenology_np(t, v)
    # leading NaN seeded with series mean of observed (3.0); ffill after
    assert r is not None and r["vPOS"] == 6.0 and r["POS"] == 3.0


def test_phenology_grouped(spark):
    t0 = datetime(2021, 1, 1)
    rows = []
    for k in range(3):
        for i in range(21):
            v = float(i) if i <= 10 else float(20 - i)
            rows.append((k, t0 + timedelta(days=i), v * (k + 1)))
    df = spark.createDataFrame(rows, "key long, ts timestamp, ndvi double")
    out = phenology.phenology(df, ["key"], "ts", "ndvi").toPandas() \
        .set_index("key").sort_index()
    day = 86400.0
    for k in range(3):
        r = out.loc[k]
        assert r.vPOS == 10.0 * (k + 1)
        assert np.isclose(r.LOS, 10 * day)
        assert r.n == 21
