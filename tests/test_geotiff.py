"""GeoTIFF sink: byte-level structure, round-trip, and the DataFrame ops."""

import struct

import numpy as np
import pytest

from data_cube_utilities_spark import codec, geotiff, synth


def _rand_block(seed=3, h=8, w=10):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 65536, size=(h, w, codec.N_BANDS)).astype(np.uint16)


def test_roundtrip():
    blk = _rand_block()
    data = geotiff.geotiff_bytes(blk, lon0=-74.0, lat0=40.7,
                                 dx=0.0003, dy=-0.0003)
    out, (lon0, lat0, dx, dy), epsg = geotiff.read_geotiff(data)
    assert (out == blk).all()
    assert (lon0, lat0) == (-74.0, 40.7)
    assert np.isclose(dx, 0.0003) and np.isclose(dy, -0.0003)
    assert epsg == 4326


def test_tiff_structure():
    data = geotiff.geotiff_bytes(_rand_block(), 0.0, 0.0, 1.0, -1.0)
    assert data[:4] == b"II*\x00"                       # LE TIFF magic
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_tags,) = struct.unpack_from("<H", data, ifd_off)
    assert n_tags == 14
    # tags must be ascending per TIFF 6.0
    tags = [struct.unpack_from("<H", data, ifd_off + 2 + i * 12)[0]
            for i in range(n_tags)]
    assert tags == sorted(tags)
    # next-IFD pointer is 0 (single IFD)
    (nxt,) = struct.unpack_from("<I", data, ifd_off + 2 + n_tags * 12)
    assert nxt == 0


def test_single_band():
    blk = _rand_block()[:, :, :1].copy()
    data = geotiff.geotiff_bytes(blk, 10.0, 20.0, 0.5, -0.5)
    out, _, _ = geotiff.read_geotiff(data)
    assert out.shape == blk.shape and (out == blk).all()


def test_reader_rejects_foreign():
    with pytest.raises(ValueError):
        geotiff.read_geotiff(b"MM\x00*garbage")


def test_dataframe_ops(spark, tmp_path):
    imgs = synth.synthesize_images(spark, 12, tile_px=8, partitions=2)
    tifs = geotiff.with_geotiff(imgs).toPandas()
    assert len(tifs) == 12
    blk, (lon0, lat0, dx, dy), epsg = geotiff.read_geotiff(bytes(tifs.tif[0]))
    assert blk.shape == (8, 8, codec.N_BANDS) and epsg == 4326
    # per-row invariant: GeoTIFF-decoded pixels == source codec pixels
    src = imgs.toPandas().set_index("image_id")
    for r in tifs.itertuples():
        s = src.loc[r.image_id]
        orig = codec.decode_block(bytes(s.bytes), s.w, s.h, s.fmt)
        got, (lon0, lat0, _, _), _ = geotiff.read_geotiff(bytes(r.tif))
        assert (got == orig).all()
        assert np.isclose(lon0, s.lon0) and np.isclose(lat0, s.lat0)
    out_dir = str(tmp_path / "tifs")
    n = geotiff.save_geotiffs(imgs, out_dir)
    assert n == 12
    import os
    assert len(os.listdir(out_dir)) == 12
