"""Classic-NetCDF (CDF-1) sink: byte-level spec checks, round-trip, and the
distributed Spark sink (import_export.py:11-63's export_xarray_to_netcdf)."""

import glob
import os
import struct

import numpy as np
import pytest

from data_cube_utilities_spark import codec, netcdf, synth


def test_header_magic_and_layout():
    data = netcdf.netcdf_bytes({"x": 3}, {"v": (("x",), np.arange(3, dtype=np.int32))})
    assert data[:4] == b"CDF\x01"
    assert struct.unpack(">i", data[4:8])[0] == 0          # numrecs
    tag, ndims = struct.unpack(">ii", data[8:16])
    assert (tag, ndims) == (0x0A, 1)                        # NC_DIMENSION


def test_round_trip_types_dims_attrs():
    rng = np.random.RandomState(0)
    dims = {"time": 4, "latitude": 5, "longitude": 6}
    variables = {
        "time": (("time",), np.arange(4, dtype=np.int32) * 86400),
        "latitude": (("latitude",), np.linspace(-1, 1, 5)),
        "longitude": (("longitude",), np.linspace(10, 11, 6).astype(np.float32)),
        "red": (("time", "latitude", "longitude"),
                rng.randint(-30000, 30000, (4, 5, 6)).astype(np.int16)),
    }
    gatts = {"Conventions": "CF-1.6", "scale": 0.0001, "n": 7}
    vatts = {"red": {"units": "reflectance", "nodata": -9999}}
    data = netcdf.netcdf_bytes(dims, variables, gatts, vatts)
    rdims, rvars, rgatts, rvatts = netcdf.read_netcdf(data)
    assert rdims == dims
    assert rgatts["Conventions"] == "CF-1.6"
    assert rgatts["scale"] == pytest.approx(0.0001)
    assert rgatts["n"] == 7
    assert rvatts["red"]["nodata"] == -9999
    for name, (vdims, arr) in variables.items():
        got_dims, got = rvars[name]
        assert got_dims == list(vdims)
        assert got.dtype == arr.dtype or name == "time"
        np.testing.assert_array_equal(got, arr)


def test_data_offsets_are_4_byte_aligned_and_disjoint():
    dims = {"x": 3, "y": 5}
    variables = {"a": (("x",), np.arange(3, dtype=np.int16)),   # 6 bytes -> pad
                 "b": (("x", "y"), np.ones((3, 5), dtype=np.float64))}
    data = netcdf.netcdf_bytes(dims, variables)
    _, rvars, _, _ = netcdf.read_netcdf(data)
    np.testing.assert_array_equal(rvars["a"][1], np.arange(3))
    np.testing.assert_array_equal(rvars["b"][1], np.ones((3, 5)))


def test_int64_narrowing_and_rejection():
    out = netcdf.netcdf_bytes({"x": 2}, {"v": (("x",), np.array([1, 2]))})
    _, rvars, _, _ = netcdf.read_netcdf(out)
    assert rvars["v"][1].dtype == np.dtype("int32")
    with pytest.raises(ValueError, match="NC_INT range"):
        netcdf.netcdf_bytes({"x": 1}, {"v": (("x",), np.array([2**40]))})


def test_tile_sink_preserves_uint16_above_int16_range():
    """ADVICE r3: an unconditional int16 cast wraps uint16 pixels >= 32768
    negative in the .nc sink; large bands must widen to NC_INT."""
    blk = np.array([[[100, 40000], [32768, 65535]]],
                   dtype=np.uint16).reshape(1, 2, 2)
    data = netcdf.tile_netcdf_bytes(blk, lon0=0.0, lat0=0.0, dx=0.1, dy=0.1,
                                    band_names=["lo", "hi"])
    _, rvars, _, _ = netcdf.read_netcdf(data)
    np.testing.assert_array_equal(rvars["lo"][1], [[100, 32768]])
    np.testing.assert_array_equal(rvars["hi"][1], [[40000, 65535]])
    assert rvars["hi"][1].dtype == np.dtype("int32")
    # small-valued bands still take the compact NC_SHORT layout
    small = netcdf.tile_netcdf_bytes(
        np.array([[[7]]], dtype=np.uint16), 0.0, 0.0, 0.1, 0.1, ["b"])
    _, rv, _, _ = netcdf.read_netcdf(small)
    assert rv["b"][1].dtype == np.dtype("int16")


def test_spark_distributed_sink_round_trip(spark, tmp_path):
    imgs = synth.synthesize_images(spark, 6, tile_px=8, partitions=2)
    out = str(tmp_path / "nc")
    n = netcdf.save_netcdfs(imgs, out)
    files = sorted(glob.glob(os.path.join(out, "*.nc")))
    assert n == 6 and len(files) == 6
    row = imgs.orderBy("image_id").first()
    with open(os.path.join(out, f"{row.image_id}.nc"), "rb") as f:
        dims, rvars, gatts, _ = netcdf.read_netcdf(f.read())
    assert dims == {"latitude": 8, "longitude": 8}
    assert gatts["crs"] == "EPSG:4326"
    blk = codec.decode_block(bytes(row.bytes), row.w, row.h, row.fmt)
    np.testing.assert_array_equal(rvars["band_0"][1],
                                  blk[:, :, 0].astype(np.int16))
    lats = rvars["latitude"][1]
    assert lats[0] == pytest.approx(row.lat0)
    assert lats[1] - lats[0] == pytest.approx(row.dy)
