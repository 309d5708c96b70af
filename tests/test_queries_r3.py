"""Round-3 driver rows: smoke + fixed-plane exact counts.

The hard correctness gate is tools/check_oracles.py (Spark vs DuckDB at
sf0.01/sf0.1); these tests pin the fixed-geometry queries' exact row
counts (the 64x64 plane is sf-independent) and that the sf-dependent ones
produce sane non-empty results at sf0.001, so a refactor that breaks a
query fails fast in pytest rather than at driver time.
"""

import pytest

from data_cube_utilities_spark import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name,exact", [
    ("subpixel_contours", 6723),   # marching-squares segments, 2 levels
    ("vectorize_regions", 473),    # global 4-connected regions @ >830
    ("focal_filter", 4096),        # one row per pixel of the 64x64 plane
    ("transect", 183),             # 25 nation lines + 1 degenerate walk
    ("compute_slip", 4096),        # per-pixel SLIP flags, 2x2 tiles
])
def test_fixed_geometry_rowcounts(spark, name, exact):
    fn, _sql = queries.GROUP_A[name]
    assert fn(spark, SF_DIR).count() == exact


@pytest.mark.parametrize("name", ["water_quality", "pan_sharpen",
                                  "fused_masks", "tidal_stats",
                                  "medoid_mosaic"])
def test_sf_dependent_nonempty(spark, name):
    fn, _sql = queries.GROUP_A[name]
    df = fn(spark, SF_DIR)
    rows = df.count()
    assert rows > 0
    assert len(df.columns) >= 3


def test_transect_degenerate_line_walks_origin_only(spark):
    fn, _sql = queries.GROUP_A["transect"]
    out = fn(spark, SF_DIR).filter("line_id = 999").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.seq, r.px, r.py) == (0, 2, 4)


def test_tidal_stats_spread_bounds(spark):
    """Observed range is a subset of the full range, so spread and both
    offsets live in [0, 1] — the reference's interpretation contract."""
    fn, _sql = queries.GROUP_A["tidal_stats"]
    pdf = fn(spark, SF_DIR).toPandas()
    assert ((pdf["spread_m"] >= 0) & (pdf["spread_m"] <= 1)).all()
    assert ((pdf["low_tide_offset"] >= 0) & (pdf["low_tide_offset"] <= 1)).all()
    assert ((pdf["high_tide_offset"] >= 0)
            & (pdf["high_tide_offset"] <= 1)).all()


def test_get_gradient_reference_goldens():
    """The reference's transect/tests/test_interpolate.py expectations,
    plus the vectorized contract and NaN passthrough."""
    import numpy as np
    from data_cube_utilities_spark.operators import convert

    three = ["#ffffff", "#000000", "#ff0000"]
    two = ["#ffffff", "#000000"]
    cases = [
        (three, 0.5, [0, 0, 0]),
        (three, 0.25, [127.5, 127.5, 127.5]),
        (three, 0.75, [127.5, 0, 0]),
        (two, 0.5, [127.5, 127.5, 127.5]),
        (two, 0.25, [191.25, 191.25, 191.25]),
        (two, 0.75, [63.75, 63.75, 63.75]),
    ]
    for colors, v, want in cases:
        np.testing.assert_allclose(convert.get_gradient(colors, v), want,
                                   atol=1)
    # bin edges: the reference loop's strict/inclusive bounds
    assert convert.bin_and_index(0.3, 2) == 0
    assert convert.bin_and_index(0.9, 2) == 1
    assert convert.bin_and_index(0.5, 2) == 0     # boundary joins lower bin
    assert convert.bin_and_index(0.0, 2) == 0     # fallthrough
    assert convert.bin_and_index(1.5, 2) == 0     # fallthrough
    # vectorized + NaN
    out = convert.get_gradient(two, np.array([0.25, np.nan, 0.75]))
    assert out.shape == (3, 3)
    assert np.isnan(out[1]).all()
    np.testing.assert_allclose(out[0], [191.25] * 3, atol=1)
