"""Shepherd segmentation (dea_tools/segmentation.py:100-360 /
RSGISLib runShepherdSegmentation, implemented from the published
algorithm): clump, iterative small-clump elimination, per-tile kernel,
and the distributed operator."""

import numpy as np
import pytest

from data_cube_utilities_spark import synth
from data_cube_utilities_spark.operators import segmentation as seg


def test_clump_np_labels_equal_valued_components():
    vals = np.array([
        [1, 1, 2, 2],
        [1, 3, 3, 2],
        [4, 3, 1, 1],
    ])
    out = seg.clump_np(vals)
    # scan-order labels, every pixel labeled
    assert out[0, 0] == 1 and out[0, 2] == 2
    assert out[1, 1] == out[1, 2] == out[2, 1]       # the 3-cluster clump
    assert out[2, 2] == out[2, 3]                    # disconnected 1s split
    assert out[2, 2] != out[0, 0]
    assert out.min() == 1 and len(np.unique(out)) == 5


def test_eliminate_small_merges_to_spectrally_nearest_neighbor():
    # three clumps: big A (value 10), big B (value 50), single pixel S
    # (value 12) touching both -> S must join A (closer spectrum)
    vals = np.array([
        [10, 10, 10, 12, 50, 50, 50],
        [10, 10, 10, 50, 50, 50, 50],
    ], dtype=np.float64)
    cl = np.array([
        [1, 1, 1, 2, 3, 3, 3],
        [1, 1, 1, 3, 3, 3, 3],
    ])
    out = seg.eliminate_small_np(cl, vals[..., None], min_pxls=3)
    assert out[0, 3] == out[0, 0]                    # merged into A
    assert out[0, 4] != out[0, 0]
    sizes = np.bincount(out.ravel())[1:]
    assert (sizes >= 3).all()


def test_eliminate_respects_dist_thres():
    vals = np.array([[10.0, 10.0, 99.0, 50.0, 50.0, 50.0]])
    cl = np.array([[1, 1, 2, 3, 3, 3]])
    out = seg.eliminate_small_np(cl, vals[..., None], min_pxls=2,
                                 dist_thres=5.0)
    # 99 is >5 from both neighbors: stays its own clump
    assert len(np.unique(out)) == 3


def test_eliminate_iterates_size_classes():
    # chain of singletons merges bottom-up until everything >= min_pxls
    vals = np.ones((1, 6))
    cl = np.array([[1, 2, 3, 4, 5, 6]])
    out = seg.eliminate_small_np(cl, vals[..., None], min_pxls=4)
    sizes = np.bincount(out.ravel())[1:]
    assert (sizes[sizes > 0] >= 4).all()


def test_eliminate_converges_on_long_singleton_chain():
    # ADVICE r3: a fixed 64-pass cap could exit with sub-min_pxls clumps
    # remaining on pathological chains; the loop must run to fixpoint.
    n = 300
    vals = np.ones((1, n))
    cl = np.arange(1, n + 1).reshape(1, n)
    out = seg.eliminate_small_np(cl, vals[..., None], min_pxls=n)
    sizes = np.bincount(out.ravel())[1:]
    assert (sizes[sizes > 0] >= n).all()   # one clump of n pixels


def test_kernel_recovers_two_blobs():
    rng = np.random.RandomState(0)
    bands = np.zeros((16, 16, 6))
    bands[:, :8] = 100 + rng.rand(16, 8, 6)
    bands[:, 8:] = 4000 + rng.rand(16, 8, 6)
    mean = bands.reshape(-1, 6).mean(axis=0)
    std = bands.reshape(-1, 6).std(axis=0)
    centers = np.array([((np.array([100.0] * 6) - mean) / std),
                        ((np.array([4000.0] * 6) - mean) / std)])
    labels = seg.shepherd_segmentation_np(bands, centers, mean, std,
                                          min_pxls=4)
    assert len(np.unique(labels)) == 2
    assert (labels[:, :8] == labels[0, 0]).all()
    assert (labels[:, 8:] == labels[0, 8]).all()


def test_distributed_shepherd_segments_synthesized_tiles(spark):
    imgs = synth.synthesize_images(spark, 12, tile_px=16, partitions=2)
    out = seg.shepherd_segmentation(imgs, num_clusters=4, min_pxls=5,
                                    sample_pixels=4000).toPandas()
    assert set(out["image_id"].unique()) == set(
        r.image_id for r in imgs.select("image_id").collect())
    # the elimination contract: no segment smaller than min_pxls survives
    assert (out["n_px"] >= 5).all()
    # per-tile segment ids are consecutive from 1
    for _, g in out.groupby("image_id"):
        assert sorted(g["segment"]) == list(range(1, len(g) + 1))
    # mean spectra are sane (within band value range)
    assert out[[f"mean_b{i}" for i in range(6)]].to_numpy().min() >= 0
    # deterministic
    out2 = seg.shepherd_segmentation(imgs, num_clusters=4, min_pxls=5,
                                     sample_pixels=4000).toPandas()
    assert out.equals(out2)
