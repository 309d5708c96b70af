"""subpixel_contours — marching-squares contour extraction with sub-pixel
linear interpolation, per tile with a 1-pixel halo, plus cross-tile stitch
(dea_tools/dea_tools/spatial.py:321-552, which wraps
skimage.measure.find_contours; SURVEY.md 2.11's remaining UDTF case).

Spark shape
-----------
A marching-squares *cell* is the 2x2 pixel square whose top-left pixel owns
it. A tile therefore needs one extra pixel row from its south neighbor, one
extra column from its east neighbor and the corner pixel of the south-east
neighbor to evaluate its seam cells — a narrow halo exchange exactly like
the focal-filter one (rasterops.focal_filter_halo): every tile ships three
tiny strips, a groupBy on the receiving tile reassembles the (h+1, w+1)
extended array, and each cell is evaluated exactly once across the whole
grid. Output is a distributed segment table in global sub-pixel
coordinates; `stitch_segments` assembles polylines from it (segments are a
1-D object, O(boundary length) — orders of magnitude smaller than the
raster — so a driver-side walk is safe at scale, same bound as the
vectorize_regions_global merge table).

The interpolation contract matches find_contours: a contour vertex on the
edge between pixels a and b sits at fraction (level - a) / (b - a).
Saddle cells (cases 5/10) are disambiguated by the cell's MEAN value — a
deliberate deviation from skimage, which resolves them with its
vertex_connect_high flag (default False) irrespective of the mean
(ADVICE r2). The mean rule is self-consistent and tile-invariant (the
tiled==monolithic test pins it); contours through saddle cells can differ
from dea_tools/skimage output there, and only there.
Cells touching NaN are skipped (skimage masks them).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# bit values for corners above the level
_TL, _TR, _BR, _BL = 1, 2, 4, 8

# case -> list of (edge_a, edge_b) segments; edges are 'T','R','B','L'
_CASES: dict[int, list[tuple[str, str]]] = {
    1: [("L", "T")], 2: [("T", "R")], 3: [("L", "R")], 4: [("R", "B")],
    6: [("T", "B")], 7: [("L", "B")], 8: [("B", "L")], 9: [("B", "T")],
    11: [("R", "B")], 12: [("R", "L")], 13: [("T", "R")], 14: [("L", "T")],
}
# saddles resolved at runtime: 5 (TL+BR), 10 (TR+BL)


def marching_segments_np(arr: np.ndarray, level: float,
                         y0: float = 0.0, x0: float = 0.0) -> np.ndarray:
    """Vectorized marching squares over a 2-D array -> (n, 4) segments
    [ya, xa, yb, xb] in (row, col) coordinates offset by (y0, x0)."""
    a = np.asarray(arr, dtype=np.float64)
    v00 = a[:-1, :-1]
    v01 = a[:-1, 1:]
    v11 = a[1:, 1:]
    v10 = a[1:, :-1]
    ok = ~(np.isnan(v00) | np.isnan(v01) | np.isnan(v11) | np.isnan(v10))
    case = ((v00 > level) * _TL + (v01 > level) * _TR
            + (v11 > level) * _BR + (v10 > level) * _BL)
    case = np.where(ok, case, 0)

    cy, cx = np.nonzero((case > 0) & (case < 15))
    if cy.size == 0:
        return np.empty((0, 4))
    cs = case[cy, cx]
    t00, t01, t11, t10 = v00[cy, cx], v01[cy, cx], v11[cy, cx], v10[cy, cx]

    with np.errstate(all="ignore"):
        def frac(va, vb):
            return (level - va) / (vb - va)

        # edge point coordinates per cell
        pts = {
            "T": (cy + 0.0, cx + frac(t00, t01)),
            "R": (cy + frac(t01, t11), cx + 1.0),
            "B": (cy + 1.0, cx + frac(t10, t11)),
            "L": (cy + frac(t00, t10), cx + 0.0),
        }

    segs = []

    def emit(mask, ea, eb):
        if mask.any():
            ya, xa = pts[ea]
            yb, xb = pts[eb]
            segs.append(np.stack([ya[mask] + y0, xa[mask] + x0,
                                  yb[mask] + y0, xb[mask] + x0], axis=1))

    for c, pairs in _CASES.items():
        m = cs == c
        for ea, eb in pairs:
            emit(m, ea, eb)
    # saddles: mean-of-cell rule (deliberate deviation from skimage's
    # vertex_connect_high flag — see module docstring)
    center = (t00 + t01 + t11 + t10) / 4.0
    s5, s10 = cs == 5, cs == 10
    # case 5 = TL+BR above. center above: the above-band connects TL-BR,
    # leaving TR and BL as below-islands (T-R and B-L arcs); center below:
    # TL and BR are above-islands (L-T and R-B arcs). Case 10 mirrors it.
    emit(s5 & (center > level), "T", "R")
    emit(s5 & (center > level), "B", "L")
    emit(s5 & ~(center > level), "L", "T")
    emit(s5 & ~(center > level), "R", "B")
    emit(s10 & (center > level), "L", "T")
    emit(s10 & (center > level), "R", "B")
    emit(s10 & ~(center > level), "T", "R")
    emit(s10 & ~(center > level), "B", "L")
    return np.concatenate(segs) if segs else np.empty((0, 4))


SEG_SCHEMA = ("z_value double, ya double, xa double, yb double, xb double")


def subpixel_contours(planes: DataFrame, z_values: Sequence[float],
                      tile_w: int = 64, tile_h: int = 64) -> DataFrame:
    """Distributed subpixel contour segments over a tiled plane grid
    (rows: tx, ty, data, h, w as produced by rasterops.plane_df)."""
    from .rasterops import _decode_plane, _encode_plane

    zs = [float(z) for z in z_values]
    halo_schema = ("tx long, ty long, kind string, data binary, "
                   "h long, w long")

    def ship(batches: Iterator[pd.DataFrame]):
        for b in batches:
            rows = []
            for r in b.itertuples():
                arr = _decode_plane(r.data, r.h, r.w)
                rows.append((r.tx, r.ty, "c", r.data, r.h, r.w))
                # north row -> the tile above owes its bottom seam cells
                rows.append((r.tx, r.ty - 1, "s",
                             _encode_plane(arr[:1, :]), 1, r.w))
                # west col -> tile to the left
                rows.append((r.tx - 1, r.ty, "e",
                             _encode_plane(arr[:, :1]), r.h, 1))
                # NW corner -> diagonal neighbor
                rows.append((r.tx - 1, r.ty - 1, "d",
                             _encode_plane(arr[:1, :1]), 1, 1))
            yield pd.DataFrame(rows, columns=[
                "tx", "ty", "kind", "data", "h", "w"])

    shipped = planes.mapInPandas(ship, schema=halo_schema)

    def march(key, pdf):
        tx, ty = key
        own = pdf[pdf["kind"] == "c"]
        if not len(own):
            return pd.DataFrame(columns=["z_value", "ya", "xa", "yb", "xb"])
        r = own.iloc[0]
        h, w = int(r.h), int(r.w)
        ext = np.full((h + 1, w + 1), np.nan)
        ext[:h, :w] = _decode_plane(r.data, h, w)
        for _, s in pdf[pdf["kind"] == "s"].iterrows():
            ext[h, :int(s.w)] = _decode_plane(s.data, 1, int(s.w))[0]
        for _, s in pdf[pdf["kind"] == "e"].iterrows():
            ext[:int(s.h), w] = _decode_plane(s.data, int(s.h), 1)[:, 0]
        for _, s in pdf[pdf["kind"] == "d"].iterrows():
            ext[h, w] = _decode_plane(s.data, 1, 1)[0, 0]
        outs = []
        for z in zs:
            segs = marching_segments_np(ext, z,
                                        y0=float(ty) * tile_h,
                                        x0=float(tx) * tile_w)
            if len(segs):
                outs.append(pd.DataFrame({
                    "z_value": z, "ya": segs[:, 0], "xa": segs[:, 1],
                    "yb": segs[:, 2], "xb": segs[:, 3]}))
        if not outs:
            return pd.DataFrame(columns=["z_value", "ya", "xa", "yb", "xb"])
        return pd.concat(outs)

    return shipped.groupBy("tx", "ty").applyInPandas(march, schema=SEG_SCHEMA)


def stitch_segments(segments: pd.DataFrame, min_vertices: int = 2,
                    tol: float = 1e-9) -> list[dict]:
    """Assemble a segment table (one z at a time or mixed) into polylines:
    [{z_value, points: [(y, x), ...], closed}] — the MultiLineString
    assembly step of the reference, driver-side over the O(boundary)
    segment set. Degenerate zero-length segments are dropped."""
    out = []
    for z, grp in segments.groupby("z_value"):
        key = lambda y, x: (round(float(y) / tol) , round(float(x) / tol))
        adj: dict[tuple, list[int]] = {}
        segs = grp[["ya", "xa", "yb", "xb"]].to_numpy(np.float64)
        keep = ~((np.abs(segs[:, 0] - segs[:, 2]) < tol)
                 & (np.abs(segs[:, 1] - segs[:, 3]) < tol))
        segs = segs[keep]
        for i, s in enumerate(segs):
            adj.setdefault(key(s[0], s[1]), []).append(i)
            adj.setdefault(key(s[2], s[3]), []).append(i)
        used = np.zeros(len(segs), dtype=bool)

        def walk(i, start_end):
            pts = []
            cur = i
            end = start_end
            while True:
                used[cur] = True
                s = segs[cur]
                p0, p1 = (s[0], s[1]), (s[2], s[3])
                if end == 0:
                    pts.append(p0)
                    nxt_pt = p1
                else:
                    pts.append(p1)
                    nxt_pt = p0
                k = key(*nxt_pt)
                cands = [j for j in adj.get(k, []) if not used[j]]
                if not cands:
                    pts.append(nxt_pt)
                    return pts
                cur = cands[0]
                s2 = segs[cur]
                end = 0 if key(s2[0], s2[1]) == k else 1
        # open chains first (endpoints with degree 1), then loops
        for i in range(len(segs)):
            if used[i]:
                continue
            k0 = key(segs[i][0], segs[i][1])
            k1 = key(segs[i][2], segs[i][3])
            if len(adj[k0]) == 1:
                pts = walk(i, 0)
            elif len(adj[k1]) == 1:
                pts = walk(i, 1)
            else:
                continue
            if len(pts) >= min_vertices:
                out.append({"z_value": float(z), "points": pts,
                            "closed": False})
        for i in range(len(segs)):       # remaining are closed loops
            if used[i]:
                continue
            pts = walk(i, 0)
            closed = (key(*pts[0]) == key(*pts[-1]))
            if len(pts) >= min_vertices:
                out.append({"z_value": float(z), "points": pts,
                            "closed": closed})
    return out
