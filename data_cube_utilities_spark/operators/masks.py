"""QA / clean-mask predicates — pure Column algebra (whole-stage codegen)
with numpy twins for the pixel-block UDF path.

Re-expresses data_cube_utilities/clean_mask.py and dc_utilities.py mask
semantics as Spark expressions. The reference's key contract (its docstring,
clean_mask.py:208-210): a clean mask specifies what to KEEP, not what to
remove — cover types OR together.

Mapping (reference file:line -> function here):
  ls_unpack_qa            clean_mask.py:124-201  -> unpack_qa / unpack_qa_np
  landsat_qa_clean_mask   clean_mask.py:204-294  -> qa_clean_mask
  landsat_clean_mask_invalid clean_mask.py:82-121 -> valid_range_mask
  landsat_clean_mask_full clean_mask.py:296-309  -> full_clean_mask
  create_cfmask_clean_mask dc_utilities.py:181-208 -> cfmask_clean_mask
  create_bit_mask         dc_utilities.py:327-349 -> bit_mask
  xarray_values_in        clean_mask.py:10-39    -> values_in_mask
  sentinel2_fmask_clean_mask clean_mask.py:315-359 -> fmask_clean_mask
  unpack_bits (value-set) dc_mosaic.py:419-445   -> isin path of unpack_qa
"""

from __future__ import annotations

from functools import reduce

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Cover-type bitfields per (platform, collection, level) — the public USGS
# pixel_qa encodings the reference's masks target (clean_mask.py:129-195).
_LS57_C1_L2 = dict(fill=1, clear=2, water=4, cld_shd=8, snow=16, cloud=32,
                   cld_conf_low=64, cld_conf_med=128, cld_conf_high=192)
_LS8_C1_L2 = dict(fill=1, clear=2, water=4, cld_shd=8, snow=16, cloud=32,
                  cld_conf_low=64, cld_conf_med=128, cld_conf_high=192,
                  cir_conf_low=256, cir_conf_med=512, cir_conf_high=768,
                  terrain_occ=1024)
_LS_C2_L2 = dict(fill=1, dilated_cloud=2, cloud=8, cld_shd=16, snow=32,
                 clear=64, water=128, cld_conf_low=256, cld_conf_med=512,
                 cld_conf_high=768, cld_shd_conf_low=1024,
                 cld_shd_conf_high=3072, snw_ice_conf_low=4096,
                 snw_ice_conf_high=12288)
_LS8_C2_L2 = dict(_LS_C2_L2, cirrus=4, cir_conf_low=16384, cir_conf_high=49152)

QA_COVER_TYPES: dict[tuple[str, str, str], dict[str, int]] = {
    ("LANDSAT_5", "c1", "l2"): _LS57_C1_L2,
    ("LANDSAT_7", "c1", "l2"): _LS57_C1_L2,
    ("LANDSAT_8", "c1", "l2"): _LS8_C1_L2,
    ("LANDSAT_5", "c2", "l2"): _LS_C2_L2,
    ("LANDSAT_7", "c2", "l2"): _LS_C2_L2,
    ("LANDSAT_8", "c2", "l2"): _LS8_C2_L2,
}

# Valid reflectance window per collection (dc_utilities.py:36-70 get_range)
VALID_RANGE = {"c1": (0, 10000), "c2": (1, 65455)}

# Landsat CFMASK category codes (dc_utilities.py:197-205)
FMASK = dict(clear=0, water=1, cld_shd=2, snow=3, cloud=4, nodata=255)
# Sentinel-2 fmask codes are a DIFFERENT table (clean_mask.py:358):
# null=0, valid=1, cloud=2, cloud_shadow=3, snow=4, water=5 — reusing the
# Landsat one keeps NULL pixels and drops WATER (ADVICE r3, medium).
S2_FMASK = dict(null=0, valid=1, cloud=2, cloud_shadow=3, snow=4, water=5)


def _cover_bits(cover_type: str, platform: str, collection: str, level: str) -> int:
    enc = QA_COVER_TYPES.get((platform, collection, level))
    if enc is None:
        raise ValueError(
            f"unsupported (platform, collection, level)={(platform, collection, level)}; "
            f"supported: {list(QA_COVER_TYPES)}")
    return enc[cover_type]


def unpack_qa(qa: Column, cover_type: str, platform: str = "LANDSAT_8",
              collection: str = "c1", level: str = "l2") -> Column:
    """Single cover-type bit test: (qa & bits) != 0."""
    bits = _cover_bits(cover_type, platform, collection, level)
    return qa.bitwiseAND(F.lit(bits)) != 0


def unpack_qa_np(qa: np.ndarray, cover_type: str, platform: str = "LANDSAT_8",
                 collection: str = "c1", level: str = "l2") -> np.ndarray:
    bits = _cover_bits(cover_type, platform, collection, level)
    return (qa.astype(np.int64) & bits) != 0


def qa_clean_mask(qa: Column, platform: str = "LANDSAT_8",
                  cover_types: list[str] = ("clear", "water"),
                  collection: str = "c1", level: str = "l2") -> Column:
    """OR-fold of cover-type masks — keep-what-you-list semantics."""
    return reduce(lambda a, b: a | b,
                  (unpack_qa(qa, ct, platform, collection, level)
                   for ct in cover_types))


def qa_clean_mask_np(qa: np.ndarray, platform: str = "LANDSAT_8",
                     cover_types: list[str] = ("clear", "water"),
                     collection: str = "c1", level: str = "l2") -> np.ndarray:
    return reduce(lambda a, b: a | b,
                  (unpack_qa_np(qa, ct, platform, collection, level)
                   for ct in cover_types))


def valid_range_mask(band_cols: list[Column], collection: str = "c1") -> Column:
    """AND-fold of per-band between(lo, hi) — clean_mask.py:82-121."""
    lo, hi = VALID_RANGE[collection]
    return reduce(lambda a, b: a & b, (c.between(lo, hi) for c in band_cols))


def nodata_mask(band_cols: list[Column], no_data: float = -9999) -> Column:
    """True where every band differs from the sentinel."""
    return reduce(lambda a, b: a & b, (c != F.lit(no_data) for c in band_cols))


def full_clean_mask(qa: Column, band_cols: list[Column],
                    platform: str = "LANDSAT_8", collection: str = "c1",
                    level: str = "l2", no_data: float = -9999) -> Column:
    """cloud AND nodata AND valid-range — clean_mask.py:296-309."""
    return (qa_clean_mask(qa, platform, collection=collection, level=level)
            & nodata_mask(band_cols, no_data)
            & valid_range_mask(band_cols, collection))


def cfmask_clean_mask(cfmask: Column) -> Column:
    """cfmask in {clear=0, water=1} — dc_utilities.py:181-208."""
    return cfmask.isin(FMASK["clear"], FMASK["water"])


def fmask_clean_mask(fmask: Column, cover_types=("valid", "water")) -> Column:
    """Sentinel-2 fmask value-set membership — clean_mask.py:315-359;
    default keeps clear land + water per sentinel2_fmask_clean_mask."""
    return fmask.isin(*[S2_FMASK[c] for c in cover_types])


def bit_mask(data: Column, valid_bits: list[int]) -> Column:
    """bitwise-AND against the sum of valid bit positions —
    dc_utilities.py:327-349 (create_bit_mask)."""
    total = sum(1 << b for b in valid_bits)
    return data.bitwiseAND(F.lit(total)) != 0


def values_in_mask(col: Column, values: list) -> Column:
    """Generic value-set membership — clean_mask.py:10-39 (xarray_values_in)."""
    return col.isin(*values)


def wofs_fuser(a: Column, b: Column) -> Column:
    """Fuse two WO observations: bitwise OR, except both-nodata stays
    nodata (dea_tools/datahandling.py:606-616 semantics)."""
    return F.when(a.isNull(), b).when(b.isNull(), a) \
            .otherwise(a.bitwiseOR(b))


def circular_kernel(radius: int) -> np.ndarray:
    """Boolean disk kernel — clean_mask.py:45-76 (create_circular_mask);
    used by dilation / focal filters in the tile UDFs."""
    d = 2 * radius + 1
    y, x = np.ogrid[:d, :d]
    return (x - radius) ** 2 + (y - radius) ** 2 <= radius ** 2
