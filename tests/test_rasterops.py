"""Raster/tile operators: decode bridge, per-cell composites, focal filters
with NaN edges, the tiled==monolithic halo invariant, NNLS, derived products."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_cube_utilities_spark import codec, synth
from data_cube_utilities_spark.operators import rasterops


def test_focal_stat_nan_edges():
    a = np.arange(16, dtype=float).reshape(4, 4)
    out = rasterops.focal_stat_np(a, 1, "mean")
    # corner window sees 4 valid values (NaN padding skipped)
    assert np.isclose(out[0, 0], np.mean([0, 1, 4, 5]))
    # interior window is the full 3x3 mean
    assert np.isclose(out[1, 1], np.mean(a[0:3, 0:3]))


def test_conv3x3_edge_detector():
    water = np.zeros((6, 6))
    water[2:5, 2:5] = 1
    edges = rasterops.coastline_edges_np(water)
    assert edges[2, 2] and edges[2, 4]      # boundary water px
    assert not edges[3, 3]                  # interior water is not edge
    assert not edges[0, 0]                  # land is not edge


def test_dilate_disk():
    m = np.zeros((7, 7), dtype=bool)
    m[3, 3] = True
    d = rasterops.dilate_np(m, 2)
    assert d[3, 5] and d[1, 3] and not d[1, 1]  # disk, not square
    assert d.sum() == 13


def test_slope():
    dem = np.tile(np.arange(8, dtype=float), (8, 1))  # plane rising 1/px in x
    s = rasterops.slope_np(dem)
    assert np.allclose(s[1:-1, 1:-1], 45.0)


def test_nnls_matches_known():
    rng = np.random.RandomState(7)
    A = rng.rand(10, 3)
    x_true = np.array([0.7, 0.0, 0.3])
    b = A @ x_true
    x = rasterops.nnls_np(A, b)
    assert np.allclose(x, x_true, atol=1e-8)
    # negative-leaning system stays nonnegative
    b2 = -A[:, 0]
    x2 = rasterops.nnls_np(A, b2)
    assert (x2 >= 0).all()


def test_frac_coverage_rows():
    rng = np.random.RandomState(8)
    E = rng.rand(6, 3)
    fracs = np.array([[0.2, 0.3, 0.5], [1.0, 0.0, 0.0]])
    B = fracs @ E.T
    out = rasterops.frac_coverage_np(B, E)
    assert np.allclose(out, fracs * 100, atol=1e-6)


def test_coastal_change():
    old = np.array([[1, 0], [0, 0]])
    new = np.array([[1, 1], [0, 0]])
    d = rasterops.coastal_change_np(old, new)
    assert d[0, 1] == 1 and d[0, 0] == 0
    assert rasterops.coastal_change_np(new, old)[0, 1] == -1


@pytest.mark.usefixtures("spark")
def test_halo_filter_equals_monolithic(spark):
    """The dc_chunker tiled==monolithic invariant, extended to kernel ops."""
    rng = np.random.RandomState(11)
    big = rng.rand(48, 64)
    big[5, 7] = np.nan  # NaN inside the raster must propagate identically
    tiles = {}
    for ty in range(3):
        for tx in range(4):
            tiles[(tx, ty)] = big[ty * 16:(ty + 1) * 16, tx * 16:(tx + 1) * 16]
    planes = rasterops.plane_df(spark, tiles)
    for radius, stat in [(1, "mean"), (2, "median"), (1, "std")]:
        out = rasterops.focal_filter_halo(planes, radius, stat).toPandas()
        got = np.full_like(big, np.nan)
        for r in out.itertuples():
            arr = np.frombuffer(r.data, dtype="<f8").reshape(r.h, r.w)
            got[r.ty * 16:(r.ty + 1) * 16, r.tx * 16:(r.tx + 1) * 16] = arr
        exp = rasterops.focal_stat_np(big, radius, stat)
        assert np.allclose(got, exp, equal_nan=True), (radius, stat)


@pytest.mark.usefixtures("spark")
def test_decode_to_long_and_tile_composite(spark):
    imgs = synth.synthesize_images(spark, 40, tile_px=8, partitions=4)
    # decode bridge row count: 40 tiles x 64 px
    long = rasterops.decode_to_long(imgs)
    assert long.count() == 40 * 64
    comp = rasterops.tile_composite(imgs, method="median").toPandas()
    assert (comp.n_scenes >= 1).all()
    assert comp.cell_id.is_unique
    # decoded composite equals a pandas/numpy oracle for the largest cell
    biggest = comp.sort_values("n_scenes").iloc[-1]
    cell = int(biggest.cell_id)
    rows = imgs.filter(F.col("cell_id") == cell).toPandas() \
               .sort_values("acquired_at")
    stack = np.stack([codec.decode_block(bytes(r.bytes), r.w, r.h, r.fmt)
                      for r in rows.itertuples()]).astype(float)
    clean = (stack[:, :, :, codec.QA_BAND].astype(np.int64) & 6) != 0
    data = stack[:, :, :, :6]
    data[~clean] = np.nan
    with np.errstate(all="ignore"):
        exp = np.nanmedian(data, axis=0)
    exp = np.where(np.isnan(exp), 0, np.clip(exp, 0, 65535)).astype(np.uint16)
    got = codec.decode_block(bytes(biggest.bytes), biggest.w, biggest.h,
                             biggest.fmt)[:, :, :6]
    assert (got == exp).all()


def test_xr_rasterize_burn_and_replace(spark):
    polys = {
        1: [(2.0, 2.0), (20.0, 2.0), (20.0, 20.0), (2.0, 20.0)],
        2: [(10.0, 10.0), (30.0, 10.0), (30.0, 28.0), (10.0, 28.0)],
    }
    out = rasterops.xr_rasterize(spark, polys, {1: 5.0, 2: 9.0},
                                 n_tx=2, n_ty=2, tile_w=16, tile_h=16) \
        .toPandas()
    assert len(out) == 4
    full = np.zeros((32, 32))
    for _, r in out.iterrows():
        full[r.ty*16:(r.ty+1)*16, r.tx*16:(r.tx+1)*16] = \
            np.frombuffer(r.data, dtype="<f8").reshape(16, 16)
    # pixel centers: (x, y) = (px + .5, py + .5)
    assert full[5, 5] == 5.0            # inside poly 1 only
    assert full[15, 15] == 9.0          # overlap -> later poly wins
    assert full[25, 25] == 9.0          # inside poly 2 only
    assert full[0, 0] == 0.0            # outside -> nodata
    # PIP parity on a sample of points (replace semantics = last match)
    from data_cube_utilities_spark.operators import spatial
    rng = np.random.RandomState(2)
    px = rng.randint(0, 32, 60)
    py = rng.randint(0, 32, 60)
    pts = spark.createDataFrame(
        [(int(i), float(x) + 0.5, float(y) + 0.5)
         for i, (x, y) in enumerate(zip(px, py))],
        "point_id long, x double, y double")
    hits = spatial.pip_broadcast(pts, polys).toPandas()
    last = hits.groupby("point_id").poly_id.max()   # poly 2 overwrites 1
    for i, (x, y) in enumerate(zip(px, py)):
        exp = {1: 5.0, 2: 9.0}.get(last.get(i, 0), 0.0)
        assert full[y, x] == exp, (x, y)


def test_compute_slip_full_product(spark):
    h = w = 16
    yy, xx = np.mgrid[0:h, 0:w]
    dem = (xx * 20.0).astype(np.float64)      # steep east-west ramp
    b_red = np.full((h, w), 1000.0)
    b_nir = np.full((h, w), 3000.0)
    b_swir = np.full((h, w), 1000.0)
    t_red, t_nir, t_swir = b_red.copy(), b_nir.copy(), b_swir.copy()
    # landslide patch: red up 60%, nir crashes (vegetation loss)
    t_red[4:8, 4:8] = 1600.0
    t_nir[4:8, 4:8] = 500.0
    # no_data hole in the baseline inside the patch
    b_red[5, 5] = -9999.0

    def planes3(spark, red, nir, swir):
        return spark.createDataFrame(
            [(0, 0, rasterops._encode_plane(red), rasterops._encode_plane(nir),
              rasterops._encode_plane(swir), h, w)],
            "tx long, ty long, data_red binary, data_nir binary, "
            "data_swir1 binary, h int, w int")

    base = planes3(spark, b_red, b_nir, b_swir)
    targ = planes3(spark, t_red, t_nir, t_swir)
    demdf = spark.createDataFrame(
        [(0, 0, rasterops._encode_plane(dem))], "tx long, ty long, data binary")
    out = rasterops.compute_slip(base, targ, demdf).toPandas().iloc[0]
    slip = np.frombuffer(out.slip, dtype=np.int16).reshape(h, w)
    # hand-compute the expectation
    brm = b_red.copy(); brm[brm == -9999.0] = np.nan
    ndwi_t = (t_nir - t_swir) / (t_nir + t_swir)
    ndwi_b = (b_nir - b_swir) / (b_nir + b_swir)
    red_ch = (t_red - brm) / brm
    slope = rasterops.slope_np(dem, 30.0, 30.0)
    exp = ((np.abs(ndwi_t - ndwi_b) > 0.2) & (red_ch > 0.4) & (slope > 15.0))
    exp &= ~np.isnan(brm)
    assert (slip == exp.astype(np.int16)).all()
    assert out.n_slip == int(exp.sum()) and out.n_slip > 0
    assert slip[5, 5] == 0              # no_data pixel masked out


# -- terrain products (r5): seam-true gradient / octant / hillshade ---------

def _terrain_monolithic(dem, **kw):
    pad = np.full((dem.shape[0] + 2, dem.shape[1] + 2), np.nan)
    pad[1:-1, 1:-1] = dem
    return rasterops.terrain_np(pad, **kw)


def test_terrain_gradient_matches_np_gradient():
    rng = np.random.default_rng(7)
    dem = rng.integers(0, 500, size=(40, 56)).astype(np.float64)
    gx, gy, _, slope, _ = _terrain_monolithic(dem)
    ngy, ngx = np.gradient(dem)
    assert np.array_equal(gx, ngx) and np.array_equal(gy, ngy)
    assert np.allclose(slope, np.degrees(np.arctan(np.hypot(ngx, ngy))))


def test_terrain_tiled_equals_monolithic(spark):
    yy, xx = np.mgrid[0:64, 0:48]
    dem = ((xx * 13 + yy * 29) % 500 + (xx * yy) % 97).astype(np.float64)
    tiles = {(tx, ty): dem[ty * 32:(ty + 1) * 32, tx * 16:(tx + 1) * 16]
             for ty in range(2) for tx in range(3)}
    out = rasterops.terrain_products_halo(
        rasterops.plane_df(spark, tiles)).toPandas()
    mg = {}
    for r in out.itertuples():
        h, w = int(r.h), int(r.w)
        mg[(r.tx, r.ty)] = (
            np.frombuffer(bytes(r.gx), dtype="<f8").reshape(h, w),
            np.frombuffer(bytes(r.gy), dtype="<f8").reshape(h, w),
            np.frombuffer(bytes(r.octant), dtype="<i2").reshape(h, w),
            np.frombuffer(bytes(r.hillshade), dtype="<f8").reshape(h, w))
    egx, egy, eoc, _, ehs = _terrain_monolithic(dem)
    for (tx, ty), (gx, gy, oc, hs) in mg.items():
        sl = np.s_[ty * 32:(ty + 1) * 32, tx * 16:(tx + 1) * 16]
        assert np.array_equal(gx, egx[sl]), (tx, ty)
        assert np.array_equal(gy, egy[sl])
        assert np.array_equal(oc, eoc[sl])
        assert np.allclose(hs, ehs[sl])


def test_octant_unit_directions_and_flat():
    # a 3x3 plane whose center gradient we control via E/W/N/S values
    def oct_direct(gx, gy):
        pad = np.full((3, 3), 0.0)
        pad[1, 2], pad[1, 0] = gx, -gx
        pad[2, 1], pad[0, 1] = gy, -gy
        _, _, oc, _, _ = rasterops.terrain_np(pad)
        return int(oc[0, 0])

    # descent direction u=-gx, v=-gy; sector k covers [45k, 45(k+1))
    assert oct_direct(-1, 0) == 0      # u=1, v=0   -> 0 deg
    assert oct_direct(-1, -1) == 1     # 45 deg boundary -> sector 1
    assert oct_direct(0, -1) == 2      # 90
    assert oct_direct(1, -2) == 2      # u=-1, v=2 -> ~117 deg, sector 2
    assert oct_direct(2, -1) == 3      # u=-2, v=1 -> ~153 deg, sector 3
    assert oct_direct(1, 0) == 4       # 180
    assert oct_direct(1, 1) == 5       # 225 boundary -> 5
    assert oct_direct(0, 1) == 6       # 270
    assert oct_direct(-2, 1) == 7      # ~333 deg
    assert oct_direct(0, 0) == -1      # flat


def test_hillshade_flat_anchor_and_range():
    dem = np.zeros((8, 8))
    _, _, _, _, hs = _terrain_monolithic(dem, altitude_deg=45.0)
    assert np.allclose(hs, 255.0 * np.cos(np.radians(45.0)))
    rng = np.random.default_rng(3)
    bumpy = rng.integers(0, 60, size=(16, 16)).astype(np.float64)
    _, _, _, _, hs2 = _terrain_monolithic(bumpy)
    assert (hs2 >= 0).all() and (hs2 <= 255).all()


# -- affine warp (r5) ---------------------------------------------------------

def test_warp_affine_np_identity_flip_downscale():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 100, size=(12, 16)).astype(np.float64)
    h, w = arr.shape
    ident = rasterops.warp_affine_np(arr, (1, 0, 0, 0, 1, 0, 1), w, h)
    assert np.array_equal(ident, arr)
    vflip = rasterops.warp_affine_np(arr, (1, 0, 0, 0, -1, h - 1, 1), w, h)
    assert np.array_equal(vflip, arr[::-1])
    down = rasterops.warp_affine_np(arr, (2, 0, 0, 0, 2, 0, 1), w // 2, h // 2)
    assert np.array_equal(down, arr[::2, ::2])
    # rational 3/2 rescale: output col j samples source col floor(3j/2)
    up = rasterops.warp_affine_np(arr, (3, 0, 0, 0, 2, 0, 2), 10, h // 2)
    exp = arr[np.ix_([2 * i // 2 for i in range(h // 2)],
                     [3 * j // 2 for j in range(10)])]
    assert np.array_equal(up, exp)


def test_warp_affine_long_matches_np(spark):
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 500, size=(20, 24)).astype(np.float64)
    h, w = arr.shape
    yy, xx = np.mgrid[0:h, 0:w]
    src = spark.createDataFrame(
        list(zip(xx.ravel().tolist(), yy.ravel().tolist(),
                 arr.ravel().tolist())), "px long, py long, val double")
    coeffs = (3, 0, 1, 0, -2, 2 * (h - 1), 2)   # x1.5 rescale + vflip
    out_w, out_h = 18, h
    got = rasterops.warp_affine_long(src, coeffs, out_w, out_h).toPandas()
    exp = rasterops.warp_affine_np(arr, coeffs, out_w, out_h)
    gm = np.full((out_h, out_w), np.nan)
    gm[got["py"].to_numpy(), got["px"].to_numpy()] = got["val"].to_numpy()
    assert np.array_equal(np.isnan(gm), np.isnan(exp))
    m = ~np.isnan(exp)
    assert np.array_equal(gm[m], exp[m])
    assert len(got) == out_w * out_h           # nulls kept, no dup rows


# -- GeoJSONSeq vector sink (r5) ---------------------------------------------

def test_geojsonl_roundtrip(spark, tmp_path):
    import json

    plane = np.zeros((8, 8))
    plane[1:3, 1:4] = 1.0          # one 3x2 region
    plane[6:8, 5:7] = 1.0          # one 2x2 region at the far corner
    planes = rasterops.plane_df(spark, {(0, 0): plane})
    regions = rasterops.vectorize_regions(planes, threshold=0.5)
    out = str(tmp_path / "gj")
    rasterops.save_geojsonl(regions, out, x0=100.0, y0=-50.0, sx=0.5,
                            sy=-0.5, tile_w=8, tile_h=8)
    feats = []
    for f in sorted((tmp_path / "gj").glob("part-*")):
        for line in f.read_text().splitlines():
            feats.append(json.loads(line))
    assert len(feats) == 2
    for ft in feats:
        assert ft["type"] == "Feature"
        g = ft["geometry"]
        assert g["type"] == "Polygon"
        ring = g["coordinates"][0]
        assert len(ring) == 5 and ring[0] == ring[-1]   # closed ring
    by_npx = {ft["properties"]["n_px"]: ft for ft in feats}
    r = by_npx[6]["geometry"]["coordinates"][0]
    ft = by_npx[6]
    # region 1 bbox px [1..3]x[1..2] -> world x in [100.5, 102.0],
    # y in [-50.5, -51.5] (sy negative: north-up raster)
    xs = sorted({p[0] for p in r}); ys = sorted({p[1] for p in r})
    assert xs == [100.5, 102.0] and ys == [-51.5, -50.5]
    assert ft["properties"]["region"] >= 1
    # readable back by Spark's JSON reader (GeoJSONSeq contract)
    back = spark.read.json(out)
    assert back.count() == 2
    assert set(back.select("properties.n_px").toPandas()["n_px"]) == {4, 6}


def test_regrid_bilinear_matches_numpy(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    sn = 4
    arr = np.arange(16).reshape(4, 4) * 10
    px = spark.createDataFrame(
        [(x, y, int(arr[y, x])) for y in range(sn) for x in range(sn)],
        "px long, py long, val long")

    def ref(tx, ty, tn):
        sx = (tx + 0.5) * sn / tn - 0.5
        sy = (ty + 0.5) * sn / tn - 0.5
        x0, y0 = int(np.floor(sx)), int(np.floor(sy))
        fx, fy = sx - x0, sy - y0

        def at(x, y):
            return arr[min(max(y, 0), sn - 1), min(max(x, 0), sn - 1)]
        return ((1 - fx) * (1 - fy) * at(x0, y0)
                + fx * (1 - fy) * at(x0 + 1, y0)
                + (1 - fx) * fy * at(x0, y0 + 1)
                + fx * fy * at(x0 + 1, y0 + 1))

    for tn in (6, 2, 4):     # upsample, downsample, identity
        out = rasterops.regrid_bilinear_long(px, sn, tn).toPandas()
        assert len(out) == tn * tn
        for _, r in out.iterrows():
            assert abs(r.value - ref(r.tx, r.ty, tn)) < 1e-9
            assert r.value_num == round(r.value * (2 * tn) ** 2)
    # identity regrid reproduces the source exactly
    ident = (rasterops.regrid_bilinear_long(px, sn, sn)
             .toPandas().sort_values(["ty", "tx"]))
    assert (ident.value.to_numpy().reshape(4, 4) == arr).all()


def test_hist_equalize_exact_cdf_remap(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    vals = [0] * 50 + [10] * 30 + [200] * 15 + [255] * 5
    px = spark.createDataFrame(
        [(i % 10, i // 10, v) for i, v in enumerate(vals)],
        "px long, py long, val long")
    out = rasterops.hist_equalize_long(px, levels=256).toPandas()
    arr = np.array(vals)
    hist = {v: int((arr == v).sum()) for v in sorted(set(vals))}
    run, cdf = 0, {}
    for v in sorted(hist):
        run += hist[v]
        cdf[v] = run
    cmin = cdf[min(hist)]
    ref = {v: ((cdf[v] - cmin) * 255) // (len(arr) - cmin) for v in hist}
    for _, r in out.iterrows():
        assert r.eq_v == ref[r.val]
    # monotone and full-range: smallest -> 0, largest -> 255
    assert ref[0] == 0 and ref[255] == 255
    # constant raster degenerates to 0
    c = spark.createDataFrame([(0, 0, 7), (1, 0, 7)],
                              "px long, py long, val long")
    assert (rasterops.hist_equalize_long(c).toPandas().eq_v == 0).all()


def test_build_overviews_reaggregable(spark):
    from data_cube_utilities_spark.operators import rasterops

    px = spark.createDataFrame(
        [(x, y, x * 16 + y) for x in range(16) for y in range(16)],
        "px long, py long, val long")
    out = rasterops.build_overviews_long(px, levels=(1, 2)).toPandas()
    l1 = out[out.level == 1]
    l2 = out[out.level == 2]
    assert len(l1) == 64 and len(l2) == 16
    assert (l1.n_px == 4).all() and (l2.n_px == 16).all()
    # conservation: every level sums to the base total
    base_sum = sum(x * 16 + y for x in range(16) for y in range(16))
    assert l1.v_sum.sum() == base_sum == l2.v_sum.sum()
    # level-2 block (0,0) re-aggregates its four level-1 children
    kids = l1[(l1.bx < 2) & (l1.by < 2)]
    top = l2[(l2.bx == 0) & (l2.by == 0)].iloc[0]
    assert top.v_sum == kids.v_sum.sum()
    assert top.v_min == kids.v_min.min() and top.v_max == kids.v_max.max()


def test_glcm_features_numpy_parity(spark):
    import numpy as np
    from collections import Counter
    from data_cube_utilities_spark.operators import rasterops

    rng = [(img, x, y, (x * 37 + y * 11 + img * 101) % 256)
           for img in range(2) for x in range(8) for y in range(6)]
    df = spark.createDataFrame(rng, "img long, px long, py long, val long")
    out = (rasterops.glcm_features_long(df, levels=16, dx=1, dy=0)
           .toPandas().set_index("img"))
    levels, scale = 16, 256
    for img in range(2):
        px = {(x, y): (v * levels) // 256 for i, x, y, v in rng
              if i == img}
        cooc = Counter((px[(x, y)], px[(x + 1, y)])
                       for (x, y) in px if (x + 1, y) in px)
        row = out.loc[img]
        assert row.n_pairs == sum(cooc.values())
        assert row.contrast == sum(c * (a - b) ** 2
                                   for (a, b), c in cooc.items())
        assert row.dissimilarity == sum(c * abs(a - b)
                                        for (a, b), c in cooc.items())
        assert row.energy_num == sum(c * c for c in cooc.values())
        assert row.homog_2num == sum((c * scale) // (1 + (a - b) ** 2)
                                     for (a, b), c in cooc.items())
        assert row.n_cooc == len(cooc)


def test_glcm_uniform_image_has_zero_contrast(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = spark.createDataFrame(
        [(0, x, y, 100) for x in range(4) for y in range(4)],
        "img long, px long, py long, val long")
    row = (rasterops.glcm_features_long(df, levels=16)
           .toPandas().iloc[0])
    assert row.contrast == 0 and row.dissimilarity == 0
    assert row.n_cooc == 1 and row.n_pairs == 12  # 3 x 4 horizontal pairs
    assert row.energy_num == 144


def test_integral_image_and_box_sum_parity(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    h, w = 7, 9
    vals = {(img, x, y): (x * 31 + y * 17 + img * 7) % 23
            for img in range(2) for x in range(w) for y in range(h)}
    df = spark.createDataFrame(
        [(i, x, y, v) for (i, x, y), v in vals.items()],
        "img long, px long, py long, val long")
    sat = rasterops.integral_image_long(df)
    got = sat.toPandas().set_index(["img", "x", "y"]).sat
    for (img, x, y) in vals:
        want = sum(vals[(img, a, b)] for a in range(x + 1)
                   for b in range(y + 1))
        assert got.loc[(img, x, y)] == want, (img, x, y)

    box = rasterops.box_sum_sat(sat, radius=2).toPandas()
    for _, r in box.iterrows():
        want = sum(vals.get((r.img, a, b), 0)
                   for a in range(r.x - 2, r.x + 3)
                   for b in range(r.y - 2, r.y + 3))
        assert r.box_sum == want, (r.img, r.x, r.y)


def test_region_geometry_perimeter(spark):
    from data_cube_utilities_spark.operators import rasterops

    # a 3x2 rectangle, an L-tromino and an isolated cell
    cells = [(1, 1), (2, 1), (3, 1), (1, 2), (2, 2), (3, 2),
             (6, 5), (6, 6), (7, 6),
             (0, 9)]
    df = spark.createDataFrame(cells, "x long, y long")
    out = (rasterops.region_geometry_long(df).toPandas()
           .sort_values("n_px").reset_index(drop=True))
    assert list(out.n_px) == [1, 3, 6]
    assert list(out.perimeter) == [4, 8, 10]
    rect = out[out.n_px == 6].iloc[0]
    assert (rect.min_x, rect.min_y, rect.max_x, rect.max_y) == (1, 1, 3, 2)
    assert (rect.sum_x, rect.sum_y) == (12, 9)


def test_morphology_erode_dilate_open_close(spark):
    from data_cube_utilities_spark.operators import rasterops

    fg = {(x, y) for x in range(2, 7) for y in range(2, 6)}  # 5x4 block
    fg |= {(10, 10)}                                         # speck
    fg -= {(4, 4)}                                           # hole
    df = spark.createDataFrame(sorted(fg), "x long, y long")

    def brute_erode(cells, r):
        return {(x, y) for (x, y) in cells
                if all((x + dx, y + dy) in cells
                       for dx in range(-r, r + 1)
                       for dy in range(-r, r + 1))}

    def brute_dilate(cells, r):
        return {(x + dx, y + dy) for (x, y) in cells
                for dx in range(-r, r + 1) for dy in range(-r, r + 1)}

    got_e = {(r.x, r.y) for r in rasterops.erode_cells(df).collect()}
    assert got_e == brute_erode(fg, 1)
    got_d = {(r.x, r.y) for r in rasterops.dilate_cells(df).collect()}
    assert got_d == brute_dilate(fg, 1)
    got_o = {(r.x, r.y) for r in rasterops.open_cells(df).collect()}
    assert got_o == brute_dilate(brute_erode(fg, 1), 1)
    assert (10, 10) not in got_o          # speck removed
    got_c = {(r.x, r.y) for r in rasterops.close_cells(df).collect()}
    assert got_c == brute_erode(brute_dilate(fg, 1), 1)
    assert (4, 4) in got_c                # hole filled
    # cross SE is strictly smaller than square SE on erosion
    got_ec = {(r.x, r.y)
              for r in rasterops.erode_cells(df, shape="cross").collect()}
    assert got_e <= got_ec


def test_otsu_threshold_brute_parity(spark):
    from data_cube_utilities_spark.operators import rasterops

    vals = [(0, x, y, (x * 13 + y * 29 + (x * y) % 7) % 97)
            for x in range(16) for y in range(16)]
    # img 1: clean bimodal — threshold must split the modes
    vals += [(1, x, y, 20 if (x + y) % 3 else 200)
             for x in range(16) for y in range(16)]
    df = spark.createDataFrame(vals, "img long, px long, py long, val long")
    got = {r.img: r.threshold
           for r in rasterops.otsu_threshold_long(df).collect()}

    import collections
    for img in (0, 1):
        hist = collections.Counter(v for (i, _, _, v) in vals if i == img)
        n = sum(hist.values())
        s = sum(v * c for v, c in hist.items())
        best, best_score = None, -1
        for t in sorted(hist):
            w0 = sum(c for v, c in hist.items() if v <= t)
            s0 = sum(v * c for v, c in hist.items() if v <= t)
            if w0 == 0 or w0 == n:
                continue
            a = s0 * n - s * w0
            sc = (a * a) // (w0 * (n - w0))
            if sc > best_score:
                best, best_score = t, sc
        assert got[img] == best, img
    assert 20 <= got[1] < 200


def test_image_moments_numpy_parity(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(12, 9))  # [y, x]
    rows = [(0, x, y, int(img[y, x]))
            for y in range(12) for x in range(9)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    got = rasterops.image_moments_long(df).collect()[0]
    ys, xs = np.mgrid[0:12, 0:9]
    v = img.astype(np.int64)
    for p, q, name in [(0, 0, "m00"), (1, 0, "m10"), (0, 1, "m01"),
                       (2, 0, "m20"), (1, 1, "m11"), (0, 2, "m02"),
                       (3, 0, "m30"), (2, 1, "m21"), (1, 2, "m12"),
                       (0, 3, "m03")]:
        want = int((xs ** p * ys ** q * v).sum())
        assert got[name] == want, name
    assert got.mu20m == got.m20 * got.m00 - got.m10 ** 2

    # orientation: a 45-degree line has theta = pi/4
    line = [(1, i, i, 100) for i in range(10)]
    ldf = spark.createDataFrame(line, "img long, px long, py long, val long")
    th = rasterops.moment_orientation(
        rasterops.image_moments_long(ldf)).collect()[0].theta
    assert abs(th - np.pi / 4) < 1e-6


def test_template_match_ncc_brute_parity_and_plant(spark):
    import math

    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(11)
    img = rng.randint(0, 50, size=(10, 12)).astype(np.int64)  # [y, x]
    tpl = np.array([[1, 9, 2], [8, 3, 7], [4, 6, 5]], dtype=np.int64)
    img[4:7, 5:8] = tpl * 5 + 3          # planted affine copy: ncc = 1
    rows = [(0, x, y, int(img[y, x]))
            for y in range(10) for x in range(12)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    got = (rasterops.template_match_ncc(df, tpl).toPandas()
           .set_index(["x", "y"]).sort_index())

    k, s_t = 9, int(tpl.sum())
    d_t = k * int((tpl ** 2).sum()) - s_t * s_t
    for (x, y), r in got.iterrows():
        win = img[y:y + 3, x:x + 3]
        crs = int((win * tpl).sum())
        s_w, q_w = int(win.sum()), int((win ** 2).sum())
        num = k * crs - s_w * s_t
        den = (k * q_w - s_w * s_w) * d_t
        assert r.xcorr == crs and r.num == num and r.den == den, (x, y)
        if den > 0:
            assert r.ncc == round(num / math.sqrt(den), 6), (x, y)
    assert got.loc[(5, 4)].ncc == 1.0     # the plant (affine-invariant)
    assert len(got) == 10 * 8             # valid anchors only


def test_ssim_identity_and_brute_parity(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(3)
    a = rng.randint(0, 256, size=(8, 9)).astype(np.int64)
    b = np.clip(a + rng.randint(-30, 31, size=a.shape), 0, 255)
    rows = [(0, x, y, int(a[y, x]), int(a[y, x]))      # identical pair
            for y in range(8) for x in range(9)]
    rows += [(1, x, y, int(a[y, x]), int(b[y, x]))     # distorted pair
             for y in range(8) for x in range(9)]
    df = spark.createDataFrame(
        rows, "img long, px long, py long, va long, vb long")
    out = rasterops.ssim_long(df, radius=2).toPandas()

    ident = out[out.img == 0]
    assert (ident.ssim == 1.0).all() and (ident.num == ident.den).all()

    dist = out[out.img == 1].set_index(["x", "y"])
    c1, c2 = 7, 59
    for (x, y), r in dist.iterrows():
        x0, x1 = max(x - 2, 0), min(x + 2, 8)
        y0, y1 = max(y - 2, 0), min(y + 2, 7)
        wa = a[y0:y1 + 1, x0:x1 + 1]
        wb = b[y0:y1 + 1, x0:x1 + 1]
        n = wa.size
        sa, sb = int(wa.sum()), int(wb.sum())
        qa, qb = int((wa ** 2).sum()), int((wb ** 2).sum())
        sab = int((wa * wb).sum())
        num = (2 * sa * sb + c1 * n * n) \
            * (2 * (n * sab - sa * sb) + c2 * n * n)
        den = (sa * sa + sb * sb + c1 * n * n) \
            * ((n * qa - sa * sa) + (n * qb - sb * sb) + c2 * n * n)
        assert r.n_win == n and r.num == num and r.den == den, (x, y)
        assert r.ssim == round(num / den, 6), (x, y)
    assert dist.ssim.max() < 1.0


def test_histogram_match_identity_and_mapping(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(5)
    a = rng.randint(0, 40, size=(8, 8))
    rows = [(0, x, y, int(a[y, x])) for y in range(8) for x in range(8)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")

    # matching an image against itself is the identity map
    ident = rasterops.histogram_match_long(df, df).toPandas()
    assert (ident.matched == ident.v).all()

    # against a shifted reference: mapping is monotone and lands on
    # values the reference actually contains
    ref = df.withColumn("val", F.col("val") + 100)
    out = rasterops.histogram_match_long(df, ref).toPandas()
    assert set(out.matched) <= set(int(v) + 100 for v in a.ravel())
    m = out[["v", "matched"]].drop_duplicates().sort_values("v")
    assert m.matched.is_monotonic_increasing
    # same-shape histograms: the shift is recovered exactly
    assert (out.matched == out.v + 100).all()


def test_harris_detects_square_corners(spark):
    from data_cube_utilities_spark.operators import rasterops as R
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    # 24x24 black field with a bright 10x10 square at [7..16]^2
    n = 24
    img = np.zeros((n, n), dtype=np.int64)
    img[7:17, 7:17] = 200
    pdf = pd.DataFrame({
        "img": 0,
        "px": np.tile(np.arange(n), n),
        "py": np.repeat(np.arange(n), n),
        "val": img[np.repeat(np.arange(n), n), np.tile(np.arange(n), n)]})
    out = (R.harris_corners_long(spark.createDataFrame(pdf))
           .toPandas().set_index(["x", "y"]).sort_index())
    corners = set(out.index[out["is_corner"]])
    # one detection adjacent to each of the four square corners
    for cx, cy in [(7, 7), (7, 16), (16, 7), (16, 16)]:
        assert any(abs(x - cx) <= 1 and abs(y - cy) <= 1
                   for x, y in corners), (cx, cy, corners)
    # flat interior and straight edges are NOT corners
    assert (10, 10) not in corners        # deep inside the square
    assert (12, 7) not in corners         # mid-edge
    assert (3, 3) not in corners          # flat background
    # edge midpoints have NEGATIVE response (edge, not corner)
    assert out.loc[(12, 7), "r20"] < 0


def test_hough_finds_planted_lines(spark):
    from data_cube_utilities_spark.operators import rasterops as R
    import numpy as np
    import pandas as pd

    # 28x28: a bright horizontal stripe at y=10 and vertical at x=20
    n = 28
    img = np.zeros((n, n), dtype=np.int64)
    img[10, :] = 250   # row y=10
    img[:, 20] = 250   # column x=20
    ys, xs = np.nonzero(np.ones((n, n)))
    pdf = pd.DataFrame({"img": 0, "px": xs, "py": ys,
                        "val": img[ys, xs]})
    out = R.hough_lines_long(spark.createDataFrame(pdf),
                             mag_thresh=400, min_votes=8).toPandas()
    # vertical line x=20: theta=0 (cos=1024, sin=0) bin of x*1024
    # edges sit at x in {19, 21}; accumulator hit with ~n votes
    t0 = out[out.t == 0]
    assert (t0.votes >= 20).any()
    # horizontal line y=10: theta=8 (cos=0, sin=1024)
    t8 = out[out.t == 8]
    assert (t8.votes >= 20).any()
    # the two dominant cells are exactly the planted rho bins
    best = out.sort_values("votes", ascending=False).head(4)
    bins = {(r.t, r.rho_bin) for r in best.itertuples()}
    assert any(t == 0 and rb in ((19*1024+65536)//2048, (21*1024+65536)//2048)
               for t, rb in bins)
    assert any(t == 8 and rb in ((9*1024+65536)//2048, (11*1024+65536)//2048)
               for t, rb in bins)


def test_lbp_codes_match_reference_loop(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(7)
    a = rng.randint(0, 256, size=(9, 9))
    rows = [(0, int(x), int(y), int(a[y, x]))
            for y in range(9) for x in range(9)]
    px = spark.createDataFrame(rows, "img long, px long, py long, val long")
    out = rasterops.lbp_histogram_long(px).toPandas()

    # reference: plain double loop over interior pixels
    import collections
    hist = collections.Counter()
    for y in range(1, 8):
        for x in range(1, 8):
            code = 0
            for dx, dy, w in rasterops.LBP_OFFSETS:
                if a[y + dy, x + dx] >= a[y, x]:
                    code += w
            hist[code] += 1
    got = {int(r.code): int(r.n) for _, r in out.iterrows()}
    assert got == dict(hist)
    assert out["n"].sum() == 49  # 7x7 interior of a 9x9 tile
    # uniformity flag: verify against the circular-transition definition
    for _, r in out.iterrows():
        c = int(r.code)
        bits = [(c >> i) & 1 for i in range(8)]
        trans = sum(bits[i] != bits[(i + 1) % 8] for i in range(8))
        assert bool(r.is_uniform) == (trans <= 2), c


def test_block_flow_recovers_planted_shift(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(11)
    a = rng.randint(0, 256, size=(24, 24))
    rows0 = [(0, x, y, int(a[y, x])) for y in range(24) for x in range(24)]
    # epoch 1: shifted by (+2, -1), exact copy
    rows1 = [(0, x + 2, y - 1, int(a[y, x]))
             for y in range(24) for x in range(24)]
    mk = lambda r: spark.createDataFrame(
        r, "img long, px long, py long, val long")
    out = rasterops.block_flow_long(mk(rows0), mk(rows1),
                                    block=8, radius=2).toPandas()
    # interior blocks must recover (u, v) = (2, -1) with SAD 0
    assert len(out) == 9  # 3x3 blocks
    inner = out[(out.bx == 1) & (out.by == 1)].iloc[0]
    assert (inner.u, inner.v, inner.sad) == (2, -1, 0)
    # every block that kept the exact-match candidate picks it
    exact = out[out.sad == 0]
    assert ((exact.u == 2) & (exact.v == -1)).all()
    assert len(exact) >= 4
    # candidate counts never exceed the search grid
    assert (out.n_cands <= 25).all() and (out.n_cands >= 1).all()


def test_dog_blobs_match_numpy_and_find_planted_blob(spark):
    import numpy as np
    from data_cube_utilities_spark.operators import rasterops

    n = 20
    a = np.zeros((n, n), dtype=np.int64)
    a[10, 10] = 200  # an impulse: DoG responds maximally at the center
    a[3, 15] = 150
    rows = [(0, x, y, int(a[y, x])) for y in range(n) for x in range(n)]
    px = spark.createDataFrame(rows, "img long, px long, py long, val long")
    out = rasterops.dog_blobs_long(px, threshold=10).toPandas()

    # numpy reference: separable binomial convolutions on the interior
    def conv_sep(img, k):
        r = len(k) // 2
        h = sum(w * np.roll(img, -d, axis=1)
                for d, w in zip(range(-r, r + 1), k))
        return sum(w * np.roll(h, -d, axis=0)
                   for d, w in zip(range(-r, r + 1), k))
    l1 = conv_sep(a, rasterops.BINOM5)
    l2 = conv_sep(a, rasterops.BINOM9)
    dog = l2 - 256 * l1
    got = {(r.x, r.y): r.dog for _, r in out.iterrows()}
    # interior margin is 5 px (4 for the 9-tap + 1 for the extremum ring)
    for (x, y), v in got.items():
        assert v == dog[y, x], (x, y)
    assert all(5 <= x <= n - 6 and 5 <= y <= n - 6 for x, y in got)
    # the impulse center is a DARK DoG extremum (wider kernel spreads
    # mass, so L2 < 256*L1 at the peak) and a bright ring surrounds it
    center = out[(out.x == 10) & (out.y == 10)].iloc[0]
    assert bool(center.is_min) and not bool(center.is_max)
    maxima = out[out.is_max]
    assert len(maxima) >= 1
    assert all(abs(r.x - 10) <= 4 and abs(r.y - 10) <= 4
               for _, r in maxima.iterrows())


def test_hog_octants_match_atan2_and_totals(spark):
    import math
    import numpy as np
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import rasterops

    # direct ladder check over a dense (gx, gy) sweep incl. boundaries
    g = [(gx, gy) for gx in range(-3, 4) for gy in range(-3, 4)]
    df = spark.createDataFrame(g, "gx long, gy long")
    out = df.withColumn(
        "bin", rasterops._octant_of(F.col("gx"), F.col("gy"))).collect()
    for r in out:
        if r.gx == 0 and r.gy == 0:
            assert r.bin == -1
            continue
        ang = math.atan2(r.gy, r.gx) % (2 * math.pi)
        want = int(ang // (math.pi / 4)) % 8
        assert r.bin == want, (r.gx, r.gy, r.bin, want)

    # end-to-end: a vertical step edge -> all votes in the +x octant
    rows = [(0, x, y, 200 if x >= 8 else 0)
            for y in range(16) for x in range(16)]
    px = spark.createDataFrame(rows, "img long, px long, py long, val long")
    hog = rasterops.hog_features_long(px, cell=8).toPandas()
    assert set(hog.bin) == {0}          # pure +x gradient
    # votes sum to the cell totals (flat pixels vote nowhere)
    assert (hog.w_sum == hog.cell_total).all()
    assert (hog.n_px <= hog.cell_px).all()


def test_label_iou_exact_counts_and_best_match(spark):
    from data_cube_utilities_spark.operators import rasterops

    # ground truth: left half label 1, right half label 2
    # prediction: label 10 covers x<6 (IoU 6/10 with 1), label 20 rest
    rows_a = [(0, x, y, 1 if x < 8 else 2)
              for y in range(4) for x in range(16)]
    rows_b = [(0, x, y, 10 if x < 6 else 20)
              for y in range(4) for x in range(16)]
    mk = lambda r: spark.createDataFrame(
        r, "img long, px long, py long, label long")
    out = {(r.la, r.lb): r for r in
           rasterops.label_iou(mk(rows_a), mk(rows_b)).collect()}
    r = out[(1, 10)]
    assert (r.n_inter, r.n_a, r.n_b, r.n_union) == (24, 32, 24, 32)
    assert r.is_best_for_a          # IoU 24/32 beats (1,20)'s 8/64
    assert not out[(1, 20)].is_best_for_a
    r2 = out[(2, 20)]
    assert (r2.n_inter, r2.n_union) == (32, 40) and r2.is_best_for_a
    assert (2, 10) not in out       # zero-intersection pairs absent

    # exact tie: two predictions with identical IoU -> smaller lb wins
    rows_b2 = [(0, x, y, 5 if x < 4 else (3 if x < 8 else 9))
               for y in range(4) for x in range(16)]
    t = {(r.la, r.lb): r for r in
         rasterops.label_iou(mk(rows_a), mk(rows_b2)).collect()}
    assert t[(1, 5)].n_inter == t[(1, 3)].n_inter == 16
    assert t[(1, 3)].is_best_for_a and not t[(1, 5)].is_best_for_a
