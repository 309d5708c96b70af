"""subpixel_contours: marching-squares kernel goldens (linear plane is
exact under linear interpolation), closed-loop extraction, and the
tiled==monolithic invariant through the halo exchange."""

import numpy as np
import pandas as pd

from data_cube_utilities_spark.operators import contours, rasterops


def _seg_set(segs, nd=6):
    out = set()
    for ya, xa, yb, xb in np.asarray(segs):
        a = (round(ya, nd), round(xa, nd))
        b = (round(yb, nd), round(xb, nd))
        out.add((a, b) if a <= b else (b, a))
    return out


def test_linear_plane_contour_is_exact_line():
    yy, xx = np.mgrid[0:20, 0:20]
    plane = (yy + xx).astype(np.float64)
    segs = contours.marching_segments_np(plane, 10.5)
    assert len(segs)
    # every vertex lies exactly on y + x = 10.5 (linear interp is exact)
    for ya, xa, yb, xb in segs:
        assert abs(ya + xa - 10.5) < 1e-12
        assert abs(yb + xb - 10.5) < 1e-12
    stitched = contours.stitch_segments(
        pd.DataFrame(segs, columns=["ya", "xa", "yb", "xb"]).assign(z_value=10.5))
    assert len(stitched) == 1 and not stitched[0]["closed"]
    # one unbroken anti-diagonal chain across the array
    assert len(stitched[0]["points"]) == len(segs) + 1


def test_circle_contour_closes_with_right_length():
    yy, xx = np.mgrid[0:40, 0:40]
    r = np.sqrt((yy - 20.0) ** 2 + (xx - 20.0) ** 2)
    segs = contours.marching_segments_np(-r, -10.0)   # level set r = 10
    stitched = contours.stitch_segments(
        pd.DataFrame(segs, columns=["ya", "xa", "yb", "xb"]).assign(z_value=-10.0))
    assert len(stitched) == 1 and stitched[0]["closed"]
    pts = np.asarray(stitched[0]["points"])
    length = np.sqrt((np.diff(pts, axis=0) ** 2).sum(axis=1)).sum()
    assert abs(length - 2 * np.pi * 10.0) / (2 * np.pi * 10.0) < 0.02
    rad = np.sqrt(((pts - 20.0) ** 2).sum(axis=1))
    assert np.abs(rad - 10.0).max() < 0.15


def test_tiled_equals_monolithic(spark):
    rng = np.random.RandomState(31)
    full = rng.rand(64, 64)
    # smooth it so contours are non-trivial
    for _ in range(3):
        full = 0.25 * (np.roll(full, 1, 0) + np.roll(full, -1, 0)
                       + np.roll(full, 1, 1) + np.roll(full, -1, 1))
    T = 16
    tiles = {(tx, ty): full[ty * T:(ty + 1) * T, tx * T:(tx + 1) * T]
             for tx in range(4) for ty in range(4)}
    df = rasterops.plane_df(spark, tiles)
    got = contours.subpixel_contours(df, z_values=[0.45, 0.55],
                                     tile_w=T, tile_h=T).toPandas()
    for z in (0.45, 0.55):
        mono = contours.marching_segments_np(full, z)
        g = got[got.z_value == z][["ya", "xa", "yb", "xb"]].to_numpy()
        assert _seg_set(g) == _seg_set(mono), z


def test_saddle_cells_disambiguated_by_center():
    # TL and BR high, center high -> band connects them (T-R and B-L arcs)
    cell = np.array([[1.0, 0.0], [0.0, 1.0]])
    segs = contours.marching_segments_np(cell, 0.4)   # center = 0.5 > level
    assert len(segs) == 2
    # center below level -> two islands (L-T and R-B arcs)
    segs2 = contours.marching_segments_np(cell, 0.6)  # center = 0.5 < level
    assert len(segs2) == 2
    s1, s2 = _seg_set(segs), _seg_set(segs2)
    assert s1 != s2
