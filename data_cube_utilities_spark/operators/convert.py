"""Product range conversion + small color helper — closes the last two
survey-documented gaps that have a Spark-expressible core.

convert_range (dc_utilities.py:73-171) in the reference loads pretrained
per-band sklearn regressors from joblib files and predicts the target
product's values pixel-wise. The pretrained artifacts (and joblib) are out
of scope in this environment, but the operator's dataflow is not: a
per-band scalar model applied over every pixel with NaN passthrough. Here
the model is injectable — by default the affine map implied by the two
products' published value ranges (get_range_dict, dc_utilities.py:33-71),
or any caller-supplied (a, b) pair per band — and it compiles to a pure
Column expression (whole-stage codegen, no UDF, scale-free).

hex_to_rgb (transect/interpolate.py:17-27): '#rrggbb' -> (r, g, b) ints.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BANDS = ("red", "green", "blue", "nir", "swir1", "swir2")

# published Landsat product value ranges (dc_utilities.py:33-71)
_RANGES = {
    ("LANDSAT_5", "c1", "l2"): (0, 10000),
    ("LANDSAT_7", "c1", "l2"): (0, 10000),
    ("LANDSAT_8", "c1", "l2"): (0, 10000),
    ("LANDSAT_5", "c2", "l2"): (1, 65455),
    ("LANDSAT_7", "c2", "l2"): (1, 65455),
    ("LANDSAT_8", "c2", "l2"): (1, 65455),
}


def get_range_dict(platform: str, collection: str, level: str) -> dict:
    """Band -> [min, max] for a (platform, collection, level) product."""
    key = (platform, collection, level)
    if key not in _RANGES:
        raise ValueError(f"unknown product: {key}")
    lo, hi = _RANGES[key]
    return {b: [lo, hi] for b in _BANDS}


def range_affine(from_product: tuple[str, str, str],
                 to_product: tuple[str, str, str]) -> tuple[float, float]:
    """(a, b) of the affine map y = a*x + b sending the 'from' product's
    [min, max] onto the 'to' product's — the range-implied default model
    standing in for the reference's pretrained regressors."""
    f_lo, f_hi = _RANGES[tuple(from_product)]
    t_lo, t_hi = _RANGES[tuple(to_product)]
    a = (t_hi - t_lo) / (f_hi - f_lo)
    return a, t_lo - a * f_lo


def convert_range(df: DataFrame,
                  from_product: tuple[str, str, str],
                  to_product: tuple[str, str, str],
                  bands: Sequence[str] = _BANDS,
                  models: Mapping[str, tuple[float, float]] | None = None,
                  ) -> DataFrame:
    """Re-express every band in the target product's value range. `models`
    optionally injects per-band (a, b) affine coefficients (e.g. fitted
    cross-calibration slopes); otherwise the range-implied map is used.
    NaN/null pixels pass through, like the reference's nan_mask."""
    default = range_affine(from_product, to_product)
    out = df
    for band in bands:
        a, b = (models or {}).get(band, default)
        out = out.withColumn(
            band, F.col(band).cast("double") * F.lit(float(a))
            + F.lit(float(b)))
    return out


def convert_range_np(x: np.ndarray,
                     from_product: tuple[str, str, str],
                     to_product: tuple[str, str, str]) -> np.ndarray:
    """Numpy twin for tile kernels and tests."""
    a, b = range_affine(from_product, to_product)
    return x.astype(np.float64) * a + b


def hex_to_rgb(rgbstr: str) -> np.ndarray:
    """'#rrggbb' (or 'rrggbb') -> np.array([r, g, b]) of ints
    (transect/interpolate.py:17-27)."""
    s = rgbstr.lstrip("#")
    if len(s) != 6:
        raise ValueError(f"expected rrggbb, got {rgbstr!r}")
    return np.array([int(s[0:2], 16), int(s[2:4], 16), int(s[4:6], 16)])


def bin_and_index(values, size: int):
    """Vectorized twin of the reference's `_bin_and_index`
    (transect/interpolate.py:29-36): the bin i with i/size < v <= (i+1)/size,
    else 0 (including v <= 0 and v > 1 — the reference's fallthrough).

    ceil(v*size) - 1 selects the same half-open bin: v in (i/size, (i+1)/size]
    <=> v*size in (i, i+1] <=> ceil(v*size) = i + 1."""
    v = np.asarray(values, dtype=np.float64)
    idx = np.ceil(v * size).astype(np.int64) - 1
    idx = np.where((v > 0) & (v <= 1) & (idx >= 0) & (idx < size), idx, 0)
    return idx if v.ndim else int(idx)


def get_gradient(colors: Sequence[str], values) -> np.ndarray:
    """Piecewise-linear color-ramp interpolation
    (transect/interpolate.py:38-56, goldens transect/tests/
    test_interpolate.py): value v selects the adjacent color pair via
    bin_and_index over len(colors)-1 segments, then interpolates
    c1 + (v*size - index) * (c2 - c1). NaN -> [nan, nan, nan].

    Vectorized: `values` may be a scalar (returns shape (3,), the
    reference's contract) or an array (returns (n, 3))."""
    rgb = np.stack([hex_to_rgb(c) for c in colors]).astype(np.float64)
    size = len(colors) - 1
    if size < 1:
        raise ValueError("need at least two colors")
    v = np.asarray(values, dtype=np.float64)
    scalar = v.ndim == 0
    v1 = np.atleast_1d(v)
    ok = ~np.isnan(v1)
    idx = np.asarray(bin_and_index(np.where(ok, v1, 0.0), size))
    c1, c2 = rgb[idx], rgb[idx + 1]
    t = (v1 * size - idx)[:, None]
    out = np.where(ok[:, None], c1 + t * (c2 - c1), np.nan)
    return out[0] if scalar else out
