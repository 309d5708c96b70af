"""Property-based tests (hypothesis): cell-index invariants, PIP parity on
random convex polygons, codec round-trips, compact/uncompact identity."""

import numpy as np
from hypothesis import given, settings, strategies as st

from data_cube_utilities_spark import cells, codec
from data_cube_utilities_spark.operators import spatial

lat_s = st.floats(min_value=-89.999, max_value=89.999,
                  allow_nan=False, allow_infinity=False)
lon_s = st.floats(min_value=-179.999, max_value=179.999,
                  allow_nan=False, allow_infinity=False)
res_s = st.integers(min_value=0, max_value=28)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, res=res_s)
def test_encode_contains_point(lat, lon, res):
    c = int(cells.encode(lat, lon, res))
    s, n, w, e = cells.cell_bounds(c)
    # containment up to float rounding at cell boundaries: a point within
    # one ulp of an edge (e.g. denormal lat where 90-lat rounds to 90) may
    # land in the adjacent cell — the encode itself is deterministic and
    # twin-consistent, which is the load-bearing invariant
    tol = max(1e-9, (n - s) * 1e-9)
    assert s - tol <= lat <= n + tol and w - tol <= lon <= e + tol
    assert int(cells.cell_res(c)) == res


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s,
       res=st.integers(min_value=1, max_value=28),
       up=st.integers(min_value=0, max_value=10))
def test_parent_is_ancestor(lat, lon, res, up):
    pres = max(res - up, 0)
    c = cells.encode(lat, lon, res)
    p = cells.parent(c, pres)
    # the parent's bounds contain the child's center
    clat, clon = cells.cell_center(c)
    s, n, w, e = cells.cell_bounds(p)
    assert s <= clat <= n and w - 1e-9 <= clon <= e + 1e-9


@settings(max_examples=50, deadline=None)
@given(lat=lat_s, lon=lon_s, res=st.integers(min_value=1, max_value=12))
def test_compact_uncompact_identity(lat, lon, res):
    c = int(cells.encode(lat, lon, res))
    kids = cells.children(c, min(res + 2, 28))
    assert set(cells.compact(kids).tolist()) == {c}
    back = cells.uncompact(np.asarray([c]), min(res + 2, 28))
    assert set(back.tolist()) == set(kids.tolist())


@settings(max_examples=60, deadline=None)
@given(pts=st.lists(st.tuples(
    st.floats(-10, 10, allow_nan=False), st.floats(-10, 10, allow_nan=False)),
    min_size=3, max_size=12),
    qx=st.floats(-12, 12, allow_nan=False),
    qy=st.floats(-12, 12, allow_nan=False))
def test_pip_np_matches_scalar_on_hulls(pts, qx, qy):
    arr = np.asarray(pts)
    # build a simple polygon: sort hull-ish by angle around the centroid
    cx, cy = arr[:, 0].mean(), arr[:, 1].mean()
    order = np.argsort(np.arctan2(arr[:, 1] - cy, arr[:, 0] - cx))
    ring = arr[order]
    got = spatial.pip_np(np.asarray([qx]), np.asarray([qy]),
                         ring[:, 0], ring[:, 1])[0]
    exp = spatial.pip_scalar_reference(qx, qy, [tuple(p) for p in ring])
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 24), w=st.integers(1, 24),
       seed=st.integers(0, 2**31 - 1),
       fmt=st.sampled_from(["raw16", "pngz"]))
def test_codec_roundtrip_property(h, w, seed, fmt):
    rng = np.random.RandomState(seed)
    blk = rng.randint(0, 65536, size=(h, w, codec.N_BANDS)).astype(np.uint16)
    out = codec.decode_block(codec.encode_block(blk, fmt), w, h, fmt)
    assert (out == blk).all()


@settings(max_examples=60, deadline=None)
@given(x0=st.integers(-20, 20), y0=st.integers(-20, 20),
       x1=st.integers(-20, 20), y1=st.integers(-20, 20))
def test_line_scan_starts_at_origin(x0, y0, x1, y1):
    from data_cube_utilities_spark.operators import mlops

    pts = mlops.line_scan_np(x0, y0, x1, y1)
    # non-empty guarantee: quirky descending runs degenerate to the origin
    assert len(pts) >= 1
    assert tuple(pts[0]) == (x0, y0)
    if x0 == x1 and y0 == y1:
        assert len(pts) == 1
        return
    # the dominant axis advances by exactly 1 per step
    d = np.abs(np.diff(pts, axis=0))
    if len(d):
        dom = 0 if abs(x1 - x0) >= abs(y1 - y0) else 1
        assert (d[:, dom] == 1).all()


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), scale=st.floats(0.01, 100.0))
def test_lsh_signature_scale_invariance(seed, scale):
    """Sign-LSH contract: band keys depend only on vector DIRECTION —
    keys(c * v) == keys(v) for any c > 0 (the sign of each +-1 plane dot
    is scale-invariant). Checked on the raw kernel arithmetic (the same
    left-to-right fold the Arrow UDF and the SQL twin run)."""
    from data_cube_utilities_spark.operators import textops

    dims = 16
    rng = np.random.RandomState(seed)
    v = rng.normal(size=dims)
    M = textops._plane_matrix(dims)

    def keys(vec):
        acc = np.zeros(M.shape[0])
        for i in range(dims):
            acc += vec[i] * M[:, i]
        bits = acc > 0.0
        out = []
        for b in range(textops.N_BANDS_LSH):
            k = 0
            for j in range(textops.PLANES_PER_BAND):
                k |= int(bits[b * textops.PLANES_PER_BAND + j]) << j
            out.append(k)
        return out

    assert keys(v) == keys(v * scale)
