"""Minimal GeoTIFF writer/reader — the raster sink bridge
(export_xarray_to_geotiff, data_cube_utilities/import_export.py:110-162 and
dc_utilities.py:381-431) without GDAL/rasterio (absent in this container).

Implements the subset the engine emits: little-endian TIFF 6.0, one IFD,
uncompressed chunky multi-band uint16, single strip, plus the three GeoTIFF
tags that carry the affine transform and CRS:

  33550 ModelPixelScale   (dx, |dy|, 0)
  33922 ModelTiepoint     (0, 0, 0, lon0, lat0, 0)   raster UL -> world
  34735 GeoKeyDirectory   GTModelType=2 (geographic), GTRasterType=1
                          (PixelIsArea), GeographicType=EPSG code

The reader parses exactly what the writer emits (and rejects anything else
loudly) — it exists for round-trip verification, not as a general TIFF
library. DataFrame op: ``with_geotiff`` adds a tif binary column per tile;
``save_geotiffs`` materializes one .tif per tile from the executors.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import codec

_II = b"II*\x00"
# TIFF types: 3=SHORT, 4=LONG, 12=DOUBLE
_T_SHORT, _T_LONG, _T_DOUBLE = 3, 4, 12


def geotiff_bytes(block: np.ndarray, lon0: float, lat0: float,
                  dx: float, dy: float, epsg: int = 4326) -> bytes:
    """(h, w, bands) uint16 -> GeoTIFF bytes."""
    block = np.ascontiguousarray(block, dtype=np.uint16)
    h, w, bands = block.shape
    pixel_data = block.astype("<u2").tobytes()

    # out-of-line payloads (after the 8-byte header, before the IFD)
    payloads = []
    pos = 8

    def add_payload(data: bytes) -> int:
        nonlocal pos
        if pos % 2:
            payloads.append(b"\x00")
            pos += 1
        off = pos
        payloads.append(data)
        pos += len(data)
        return off

    bits = add_payload(struct.pack(f"<{bands}H", *([16] * bands))) \
        if bands > 2 else None
    fmts = add_payload(struct.pack(f"<{bands}H", *([1] * bands))) \
        if bands > 2 else None
    scale_off = add_payload(struct.pack("<3d", float(dx), abs(float(dy)), 0.0))
    tie_off = add_payload(struct.pack("<6d", 0.0, 0.0, 0.0,
                                      float(lon0), float(lat0), 0.0))
    geokeys = [
        (1024, 0, 1, 2),      # GTModelTypeGeoKey = geographic
        (1025, 0, 1, 1),      # GTRasterTypeGeoKey = PixelIsArea
        (2048, 0, 1, epsg),   # GeographicTypeGeoKey
    ]
    gk = struct.pack("<4H", 1, 1, 0, len(geokeys))
    for k in geokeys:
        gk += struct.pack("<4H", *k)
    gk_off = add_payload(gk)
    strip_off = add_payload(pixel_data)

    def entry(tag, typ, count, value_or_off, inline_fmt=None):
        if inline_fmt is not None:
            val = struct.pack(inline_fmt, value_or_off)
            val += b"\x00" * (4 - len(val))
            return struct.pack("<HHI", tag, typ, count) + val
        return struct.pack("<HHII", tag, typ, count, value_or_off)

    entries = [
        entry(256, _T_LONG, 1, w, "<I"),
        entry(257, _T_LONG, 1, h, "<I"),
        (entry(258, _T_SHORT, bands, bits) if bands > 2
         else entry(258, _T_SHORT, bands,
                    int.from_bytes(struct.pack(f"<{bands}H", *([16] * bands))
                                   .ljust(4, b"\x00"), "little"), "<I")),
        entry(259, _T_SHORT, 1, 1, "<H"),
        entry(262, _T_SHORT, 1, 1, "<H"),
        entry(273, _T_LONG, 1, strip_off, "<I"),
        entry(277, _T_SHORT, 1, bands, "<H"),
        entry(278, _T_LONG, 1, h, "<I"),
        entry(279, _T_LONG, 1, len(pixel_data), "<I"),
        entry(284, _T_SHORT, 1, 1, "<H"),
        (entry(339, _T_SHORT, bands, fmts) if bands > 2
         else entry(339, _T_SHORT, bands,
                    int.from_bytes(struct.pack(f"<{bands}H", *([1] * bands))
                                   .ljust(4, b"\x00"), "little"), "<I")),
        entry(33550, _T_DOUBLE, 3, scale_off),
        entry(33922, _T_DOUBLE, 6, tie_off),
        entry(34735, _T_SHORT, len(gk) // 2, gk_off),
    ]
    entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00" * 4
    ifd_off = pos + (pos % 2)
    pad = b"\x00" * (ifd_off - pos)
    header = _II + struct.pack("<I", ifd_off)
    return header + b"".join(payloads) + pad + ifd


def read_geotiff(data: bytes):
    """Parse what geotiff_bytes emits -> (block, (lon0, lat0, dx, dy), epsg)."""
    if data[:4] != _II:
        raise ValueError("not a little-endian TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n,) = struct.unpack_from("<H", data, ifd_off)
    tags = {}
    for i in range(n):
        tag, typ, count, raw = struct.unpack_from(
            "<HHII", data, ifd_off + 2 + i * 12)
        tags[tag] = (typ, count, raw,
                     data[ifd_off + 2 + i * 12 + 8: ifd_off + 2 + i * 12 + 12])

    def values(tag):
        typ, count, raw, inline = tags[tag]
        size = {_T_SHORT: 2, _T_LONG: 4, _T_DOUBLE: 8}[typ]
        fmt = {_T_SHORT: "H", _T_LONG: "I", _T_DOUBLE: "d"}[typ]
        if size * count <= 4:
            return struct.unpack(f"<{count}{fmt}", inline[: size * count])
        return struct.unpack_from(f"<{count}{fmt}", data, raw)

    w, h = values(256)[0], values(257)[0]
    bands = values(277)[0]
    if values(259)[0] != 1 or values(284)[0] != 1:
        raise ValueError("unsupported TIFF variant")
    strip_off, strip_len = values(273)[0], values(279)[0]
    block = np.frombuffer(data[strip_off: strip_off + strip_len],
                          dtype="<u2").reshape(h, w, bands)
    dx, dy, _ = values(33550)
    _, _, _, lon0, lat0, _ = values(33922)
    gk = values(34735)
    epsg = 0
    for i in range(4, len(gk), 4):
        if gk[i] == 2048:
            epsg = gk[i + 3]
    return block.copy(), (lon0, lat0, dx, -abs(dy)), epsg


# ---------------------------------------------------------------------------
# DataFrame ops
# ---------------------------------------------------------------------------

def with_geotiff(images: DataFrame) -> DataFrame:
    """Add a `tif` binary column: each tile re-encoded as GeoTIFF with its
    affine footprint (lat0/lon0/dx/dy columns from the synthesizer)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for r in b.itertuples():
                blk = codec.decode_block(r.bytes, r.w, r.h, r.fmt)
                rows.append((r.image_id,
                             geotiff_bytes(blk, r.lon0, r.lat0, r.dx, r.dy)))
            if rows:
                yield pd.DataFrame(rows, columns=["image_id", "tif"])

    return images.mapInPandas(run, "image_id string, tif binary")


def save_geotiffs(images: DataFrame, out_dir: str) -> int:
    """Write one .tif per tile from the executors (GeoTIFF-per-timeslice
    sink, import_export.py:85-107); returns files written."""
    os.makedirs(out_dir, exist_ok=True)
    tifs = with_geotiff(images)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            cnt = 0
            for r in b.itertuples():
                with open(os.path.join(out_dir, f"{r.image_id}.tif"), "wb") as f:
                    f.write(r.tif)
                cnt += 1
            yield pd.DataFrame({"n": [cnt]})

    written = tifs.mapInPandas(sink, "n long")
    from pyspark.sql import functions as F
    return written.agg(F.sum("n")).first()[0] or 0
