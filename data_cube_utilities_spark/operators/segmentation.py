"""Shepherd image segmentation — the last non-network gap in SURVEY.md §2
(dea_tools/segmentation.py:100-360 wraps RSGISLib's
runShepherdSegmentation over tiles; RSGISLib itself is unavailable here,
so the published algorithm [Shepherd et al. 2019, "Operational Large-Scale
Segmentation of Imagery Based on Iterative Elimination"] is implemented
from its definition with machinery this engine already has):

  1. band standardization (z-score; RSGIS uses a linear stddev stretch to
     0-255 — affine either way, k-means geometry is identical up to the
     per-band scale choice, documented deviation);
  2. k-means in band space, fitted on a bounded deterministic sample
     (mlops._fit_sample + _lloyd_np — one Spark job, no count());
  3. CLUMP: connected components of the per-pixel cluster-id map
     (rasterops._adjacency_edges with an equal-value predicate + the
     vectorized Shiloach-Vishkin union-find);
  4. ITERATIVE ELIMINATION: clumps smaller than min_pxls merge into the
     spectrally nearest ADJACENT clump (euclidean distance of clump mean
     spectra, gated by dist_thres), smallest size classes first, repeated
     until no eligible clump remains — exactly RSGIS's
     rm_small_clumps_stepwise contract;
  5. relabel to consecutive scan-order ids.

Spark shape: the fit is one sampling pass; segmentation itself is one
mapInPandas over tiles (each tile independent — the reference's stage-1
tiled segmentation has the same per-tile independence; its stage-2 border
merge is the vectorize_regions_global seam machinery, composable
downstream). Output is one row per segment with size + mean spectra, plus
optionally the labeled plane for raster consumers.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .. import codec
from . import mlops, rasterops


def clump_np(values: np.ndarray, connectivity: int = 4) -> np.ndarray:
    """Connected components of EQUAL-valued pixels (RSGIS 'clump'): every
    pixel gets a label 1..n in first-pixel scan order."""
    values = np.asarray(values)
    h, w = values.shape
    a, b = rasterops._adjacency_edges(
        lambda sa, sb: values[sa] == values[sb], h, w, connectivity)
    lab = rasterops._cc_roots(a, b, h * w)
    uniq = np.unique(lab)
    return (np.searchsorted(uniq, lab) + 1).reshape(h, w)


def _clump_stats(clumps: np.ndarray, bands: np.ndarray, n_lab: int):
    """sizes (n_lab+1,), mean spectra (n_lab+1, nb) — index 0 unused."""
    flat = clumps.ravel()
    nb = bands.shape[-1]
    sizes = np.bincount(flat, minlength=n_lab + 1)
    means = np.zeros((n_lab + 1, nb))
    bflat = bands.reshape(-1, nb)
    for j in range(nb):
        means[:, j] = np.bincount(flat, weights=bflat[:, j],
                                  minlength=n_lab + 1)
    means[1:] /= np.maximum(sizes[1:], 1)[:, None]
    return sizes, means


def _adjacent_pairs(clumps: np.ndarray, connectivity: int = 4) -> np.ndarray:
    """Unique (la, lb) pairs of touching clump labels, la != lb."""
    h, w = clumps.shape
    a, b = rasterops._adjacency_edges(
        lambda sa, sb: clumps[sa] != clumps[sb], h, w, connectivity)
    la, lb = clumps.ravel()[a], clumps.ravel()[b]
    pairs = np.stack([np.minimum(la, lb), np.maximum(la, lb)], axis=1)
    return np.unique(pairs, axis=0)


def eliminate_small_np(clumps: np.ndarray, bands: np.ndarray,
                       min_pxls: int, dist_thres: float = np.inf,
                       connectivity: int = 4) -> np.ndarray:
    """Iterative elimination: ascending size classes (1, 2, ... like
    RSGIS's stepwise variant), each small clump merges into its
    spectrally-nearest adjacent clump if the spectral distance passes
    dist_thres. Labels are re-compacted to consecutive scan order."""
    clumps = clumps.copy()
    n_lab = int(clumps.max())
    if n_lab <= 1:
        return clumps
    sizes, means = _clump_stats(clumps, bands, n_lab)
    parent = np.arange(n_lab + 1)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    # Loop until fixpoint: done when no sub-min_pxls clump remains OR no
    # further merge is possible (every remaining small clump is isolated
    # or gated by dist_thres) — the RSGIS stepwise contract iterates until
    # no eligible clump remains, so a fixed pass cap could exit early on
    # long singleton chains with the size invariant violated (ADVICE r3).
    while True:
        pairs = _adjacent_pairs(clumps, connectivity)
        small = np.nonzero((sizes[1:] > 0) & (sizes[1:] < min_pxls))[0] + 1
        if small.size == 0 or pairs.size == 0:
            break
        merged_any = False
        # smallest first, deterministic label order inside a size class
        for lb in small[np.argsort(sizes[small], kind="stable")]:
            if sizes[lb] == 0 or sizes[lb] >= min_pxls:
                continue
            nb_mask = (pairs[:, 0] == lb) | (pairs[:, 1] == lb)
            neigh = np.unique(pairs[nb_mask])
            neigh = neigh[neigh != lb]
            neigh = neigh[sizes[neigh] > 0]
            if neigh.size == 0:
                continue
            d2 = ((means[neigh] - means[lb]) ** 2).sum(axis=1)
            j = int(np.argmin(d2))
            if np.sqrt(d2[j]) > dist_thres:
                continue
            tgt = int(neigh[j])
            tot = sizes[lb] + sizes[tgt]
            means[tgt] = (means[tgt] * sizes[tgt]
                          + means[lb] * sizes[lb]) / tot
            sizes[tgt] = tot
            sizes[lb] = 0
            parent[lb] = tgt
            merged_any = True
        if not merged_any:
            break
        # relabel pixels to merge roots; sizes/means were folded
        # incrementally above (roots carry the merged totals, absorbed
        # labels carry size 0), so the stats arrays stay valid as-is
        root = np.array([find(x) for x in range(n_lab + 1)])
        clumps = root[clumps]

    # compact to consecutive scan-order labels
    flat = clumps.ravel()
    uniq = np.unique(flat)
    return (np.searchsorted(uniq, flat) + 1).reshape(clumps.shape)


def shepherd_segmentation_np(bands: np.ndarray, centers: np.ndarray,
                             mean: np.ndarray, std: np.ndarray,
                             min_pxls: int = 8,
                             dist_thres: float = np.inf,
                             connectivity: int = 4) -> np.ndarray:
    """Per-tile kernel: assign k-means cluster per pixel (on standardized
    bands), clump, eliminate small clumps. Returns (h, w) segment labels."""
    h, w, nb = bands.shape
    z = (bands.reshape(-1, nb) - mean) / std
    d2 = ((z[:, None, :] - centers[None]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1).reshape(h, w)
    clumps = clump_np(cl, connectivity)
    return eliminate_small_np(clumps, bands.astype(np.float64),
                              min_pxls, dist_thres, connectivity)


def shepherd_fit(images: DataFrame, num_clusters: int = 8,
                 sample_pixels: int = 50_000, seed: int = 42,
                 km_max_iter: int = 50):
    """Fit stage: sample pixels across tiles (one mapInPandas pass — each
    tile contributes a deterministic slice), z-score, Lloyd k-means.
    Returns (centers, mean, std) to broadcast into the kernel."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        left = sample_pixels
        for b in batches:
            for r in b.itertuples():
                if left <= 0:
                    return
                blk = codec.decode_block(r.bytes, r.w, r.h, r.fmt)
                px = blk[:, :, :6].reshape(-1, 6)
                take = px[::max(1, len(px) * 8 // sample_pixels)]
                take = take[:left]
                left -= len(take)
                yield pd.DataFrame(take.astype(np.float64),
                                   columns=[f"b{i}" for i in range(6)])

    schema = ", ".join(f"b{i} double" for i in range(6))
    pdf = images.mapInPandas(sample, schema).toPandas()
    X = pdf.to_numpy(np.float64)
    if len(X) > sample_pixels:
        rng = np.random.RandomState(seed)
        X = X[np.sort(rng.choice(len(X), sample_pixels, replace=False))]
    mean, std = X.mean(axis=0), X.std(axis=0)
    std[std == 0] = 1.0
    centers = mlops._lloyd_np((X - mean) / std, num_clusters,
                              max_iter=km_max_iter, seed=seed)
    return centers, mean, std


def shepherd_segmentation(images: DataFrame, num_clusters: int = 8,
                          min_pxls: int = 8, dist_thres: float = np.inf,
                          sample_pixels: int = 50_000, seed: int = 42,
                          emit_plane: bool = False) -> DataFrame:
    """Distributed Shepherd: fit once, then one Arrow crossing segments
    every tile independently (reference stage-1 contract; stage-2 border
    merging composes with rasterops.vectorize_regions_global's seam
    machinery downstream). Output: one row per (image_id, segment) with
    size and mean spectra — the reference's per-segment zonal means."""
    centers, mean, std = shepherd_fit(images, num_clusters,
                                      sample_pixels, seed)

    plane_col = ", plane binary, w int, h int" if emit_plane else ""
    schema = ("image_id string, segment long, n_px long, "
              + ", ".join(f"mean_b{i} double" for i in range(6))
              + plane_col)

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            outs = []
            for r in b.itertuples():
                blk = codec.decode_block(r.bytes, r.w, r.h, r.fmt)
                bands = blk[:, :, :6].astype(np.float64)
                labels = shepherd_segmentation_np(
                    bands, centers, mean, std, min_pxls, dist_thres)
                n_lab = int(labels.max())
                sizes, means = _clump_stats(labels, bands, n_lab)
                row = {
                    "image_id": r.image_id,
                    "segment": np.arange(1, n_lab + 1, dtype=np.int64),
                    "n_px": sizes[1:].astype(np.int64),
                }
                for i in range(6):
                    row[f"mean_b{i}"] = means[1:, i]
                pdf = pd.DataFrame(row)
                if emit_plane:
                    pdf["plane"] = [labels.astype("<i8").tobytes()] * n_lab
                    pdf["w"], pdf["h"] = int(r.w), int(r.h)
                outs.append(pdf)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return images.mapInPandas(seg, schema=schema)
