"""Connected-component operators: labeling, largest region, lone-object
filter, raster->vector bridge."""

import numpy as np
import pytest

from data_cube_utilities_spark.operators import rasterops


def test_label_regions_two_blobs():
    m = np.zeros((6, 8), dtype=bool)
    m[1:3, 1:3] = True          # blob A (4 px)
    m[4:6, 5:8] = True          # blob B (6 px)
    labels = rasterops.label_regions_np(m)
    assert labels.max() == 2
    assert (labels[1:3, 1:3] == 1).all()
    assert (labels[4:6, 5:8] == 2).all()
    assert labels[0, 0] == 0


def test_label_regions_u_shape_merges():
    # U shape: two arms join at the bottom -> ONE component (union-find)
    m = np.zeros((5, 5), dtype=bool)
    m[:, 0] = True
    m[:, 4] = True
    m[4, :] = True
    labels = rasterops.label_regions_np(m)
    assert labels.max() == 1


def test_connectivity_4_vs_8():
    m = np.array([[1, 0], [0, 1]], dtype=bool)
    assert rasterops.label_regions_np(m, 4).max() == 2
    assert rasterops.label_regions_np(m, 8).max() == 1


def test_largest_region():
    m = np.zeros((6, 6), dtype=bool)
    m[0, 0] = True
    m[3:6, 3:6] = True
    keep = rasterops.largest_region_np(m)
    assert keep.sum() == 9 and not keep[0, 0]


def test_lone_object_filter():
    c = np.zeros((5, 5), dtype=np.int64)
    c[2, 2] = 7                  # lone single-pixel object
    out = rasterops.lone_object_filter_np(c, min_size=2)
    assert out[2, 2] == 0        # dissolved into the modal surroundings
    big = np.zeros((5, 5), dtype=np.int64)
    big[1:4, 1:4] = 7            # 9 px region survives
    out2 = rasterops.lone_object_filter_np(big, min_size=2)
    assert (out2 == big).all()


def test_vectorize_regions(spark):
    plane = np.zeros((8, 8))
    plane[1:3, 1:4] = 1.0        # region: 6 px, bbox x 1..3 y 1..2
    plane[6:8, 6:8] = 1.0        # region: 4 px
    df = rasterops.plane_df(spark, {(0, 0): plane})
    out = rasterops.vectorize_regions(df).toPandas().sort_values("region")
    assert len(out) == 2
    r1 = out.iloc[0]
    assert (r1.n_px, r1.min_x, r1.max_x, r1.min_y, r1.max_y) == (6, 1, 3, 1, 2)
    assert np.isclose(r1.cx, 2.0) and np.isclose(r1.cy, 1.5)
