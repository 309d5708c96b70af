"""Deterministic synthesizer for the engine's image+caption input table.

Produces the BASELINE.json ``input_hint`` schema
  (image_id string, bytes binary, w int, h int, fmt string, caption string,
   phash long)
plus the engine's ingest columns
  (lat0, lon0, dx, dy double, acquired_at timestamp, cell_id long).

Scale-first design: the generator is ``spark.range(n).mapInPandas(...)`` —
every field of row *i* is a pure function of (seed, i) via splitmix64, so the
table is embarrassingly parallel, reproducible at any partitioning, and needs
no driver-side state. At 10^12 rows the same code runs unchanged; only `n`
grows.

The spatial distribution is deliberately SKEWED (north rule: coastline/urban
hotspots must exercise salting): 60% of footprints cluster around 8 urban
hotspots, 25% hug a synthetic coastline curve, 15% are uniform.

Pixel content is a smooth deterministic field of (lat, lon, t) plus hashed
per-image noise; the QA channel is a packed bitfield following the
pixel_qa conventions the reference masks against
(data_cube_utilities/clean_mask.py:129-195): bit0 fill, bit1 clear,
bit2 water, bit3 cloud_shadow, bit4 snow, bit5 cloud.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import cells, codec

QA_FILL = 1
QA_CLEAR = 2
QA_WATER = 4
QA_SHADOW = 8
QA_SNOW = 16
QA_CLOUD = 32

DEFAULT_RES = 7  # ~1.4 deg cells at test scale

_HOTSPOTS = [  # (lat, lon) synthetic "urban" centers
    (40.7, -74.0), (51.5, -0.1), (35.7, 139.7), (-33.9, 151.2),
    (19.4, -99.1), (-23.5, -46.6), (28.6, 77.2), (6.5, 3.4),
]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — the per-row PRNG seed derivation."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u01(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic uniform(0,1) stream keyed by (id, salt)."""
    mixed = (salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(mixed))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def footprints(ids: np.ndarray, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(lat0, lon0) of each image footprint — the skewed placement."""
    ids = np.asarray(ids, dtype=np.int64)
    sel = _u01(ids, seed * 3 + 1)
    lat = np.empty(ids.shape)
    lon = np.empty(ids.shape)

    urban = sel < 0.60
    coast = (sel >= 0.60) & (sel < 0.85)
    unif = sel >= 0.85

    hs = (_u01(ids, seed * 3 + 2) * len(_HOTSPOTS)).astype(int) % len(_HOTSPOTS)
    hlat = np.asarray([h[0] for h in _HOTSPOTS])[hs]
    hlon = np.asarray([h[1] for h in _HOTSPOTS])[hs]
    # approx-gaussian jitter (sum of uniforms), ~0.5 deg sigma around hotspots
    j1 = (_u01(ids, seed * 3 + 3) + _u01(ids, seed * 3 + 4)
          + _u01(ids, seed * 3 + 5) - 1.5) * 1.0
    j2 = (_u01(ids, seed * 3 + 6) + _u01(ids, seed * 3 + 7)
          + _u01(ids, seed * 3 + 8) - 1.5) * 1.0
    lat[urban] = np.clip(hlat[urban] + j1[urban], -89.0, 89.0)
    lon[urban] = hlon[urban] + j2[urban]

    # coastline: a sine curve across the globe with a tight band
    t = _u01(ids, seed * 3 + 9) * 360.0 - 180.0
    clat = 25.0 * np.sin(np.radians(t * 2.0)) + 10.0
    lat[coast] = np.clip(clat[coast] + j1[coast] * 0.3, -89.0, 89.0)
    lon[coast] = t[coast]

    lat[unif] = _u01(ids, seed * 3 + 10)[unif] * 170.0 - 85.0
    lon[unif] = _u01(ids, seed * 3 + 11)[unif] * 360.0 - 180.0

    lon = ((lon + 180.0) % 360.0) - 180.0
    return lat, lon


def _band_field(lat, lon, tday, px_y, px_x, band: int, noise: np.ndarray) -> np.ndarray:
    """Smooth deterministic reflectance field + noise, uint16 range."""
    base = 1200.0 + 900.0 * band
    geo = 800.0 * np.sin(np.radians(lat * (3 + band))) \
        + 600.0 * np.cos(np.radians(lon * (2 + band)))
    season = 400.0 * np.sin(2 * np.pi * (tday % 365.25) / 365.25 + band)
    grad = 3.0 * px_y + 2.0 * px_x
    v = base + geo + season + grad + noise
    return np.clip(v, 0, 65535).astype(np.uint16)


def synth_batch(ids: np.ndarray, seed: int = 42, tile_px: int = 32,
                res: int = DEFAULT_RES) -> pd.DataFrame:
    """Generate the full image rows for a batch of int64 ids (pure pandas)."""
    ids = np.asarray(ids, dtype=np.int64)
    lat0, lon0 = footprints(ids, seed)
    dx = np.full(ids.shape, 0.0003)
    dy = np.full(ids.shape, -0.0003)
    tday = (_u01(ids, seed * 7 + 1) * 2555.0)  # days since 2013-01-01, ~7y
    acquired = (np.datetime64("2013-01-01") +
                (tday * 86400.0).astype("timedelta64[s]"))
    fmt_sel = _u01(ids, seed * 7 + 2)
    cell = cells.encode(lat0, lon0, res)

    py, px = np.mgrid[0:tile_px, 0:tile_px]
    rows = []
    for k in range(len(ids)):
        rng = np.random.RandomState(
            int(_splitmix64(np.asarray([ids[k]], dtype=np.uint64))[0] % (2**31)))
        noise = rng.normal(0.0, 120.0, size=(tile_px, tile_px))
        block = np.empty((tile_px, tile_px, codec.N_BANDS), dtype=np.uint16)
        for b in range(6):
            block[:, :, b] = _band_field(lat0[k], lon0[k], tday[k], py, px, b, noise)
        # QA channel: cloud where a second noise field exceeds a threshold,
        # water where the "nir" band is low, else clear
        cloudy = rng.rand(tile_px, tile_px) < 0.15
        watery = block[:, :, 3] < 1600
        qa = np.full((tile_px, tile_px), QA_CLEAR, dtype=np.uint16)
        qa[watery] = QA_CLEAR | QA_WATER
        qa[cloudy] = QA_CLOUD
        block[:, :, codec.QA_BAND] = qa

        fmt = "pngz" if fmt_sel[k] < 0.10 else "raw16"
        data = codec.encode_block(block, fmt)
        ph = codec.phash64(block)
        iid = f"img-{ids[k]:012d}"
        caption = (f"tile {iid} over ({lat0[k]:.4f},{lon0[k]:.4f}) "
                   f"acquired {np.datetime_as_string(acquired[k], unit='D')}")
        rows.append((iid, data, tile_px, tile_px, fmt, caption, ph,
                     float(lat0[k]), float(lon0[k]), float(dx[k]), float(dy[k]),
                     pd.Timestamp(acquired[k]), int(cell[k])))
    return pd.DataFrame(rows, columns=[
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "lat0", "lon0", "dx", "dy", "acquired_at", "cell_id"])


IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, "
    "phash long, lat0 double, lon0 double, dx double, dy double, "
    "acquired_at timestamp, cell_id long"
)


def synthesize_images(spark: SparkSession, n: int, seed: int = 42,
                      tile_px: int = 32, res: int = DEFAULT_RES,
                      partitions: int | None = None) -> DataFrame:
    """Distributed deterministic image table: spark.range -> mapInPandas."""
    rng_df = spark.range(0, n, 1, partitions or max(8, n // 2048 or 1))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b):
                yield synth_batch(b["id"].to_numpy(), seed, tile_px, res)

    return rng_df.mapInPandas(gen, schema=IMAGES_SCHEMA)
