"""Spatial joins: ray-casting point-in-polygon, kNN, zonal statistics.

The north-rule core. Three physical strategies, one semantics:

1. ``pip_broadcast`` — polygons are a small dim table: broadcast to every
   task, test points against all candidate polygons inside one Arrow-batched
   pandas UDF (bbox prefilter then vectorized crossing-number). No shuffle
   of the (huge) point side at all. This is the 100TB default when the
   polygon layer fits in memory (it almost always does).
2. ``pip_cell_join`` — polygons too many to broadcast: cover each polygon
   with geocells (polyfill of its bbox at an adaptive resolution), explode,
   equi-join points on cell_id (AQE-skew-aware shuffle), then run the exact
   test only on cell-collocated candidates. Join fan-in is bounded by cell
   granularity instead of |points| x |polys|.
3. ``pip_edges_sql`` — the pure-relational twin (explode edges, join,
   crossing parity by sum) used as the DuckDB correctness oracle and for
   engines without Python.

Boundary convention (documented, deterministic): even-odd crossing number
with the half-open rule — an edge from (x1,y1) to (x2,y2) crosses the
upward ray at point p iff (y1 > py) != (y2 > py) and
px < x1 + (py-y1)*(x2-x1)/(y2-y1). Points exactly on a horizontal edge are
outside; on a left edge inside, right edge outside. All three strategies
evaluate the identical float expression, so they agree bit-for-bit.

Reference parity: replaces shapefile_mask.py:36-72 (rasterized polygon
inclusion masks, `all_touched` variant documented as out-of-rule),
dea_tools/spatial.py:778-859 (zonal_stats_parallel — the multiprocessing
dict merge becomes a partial+final groupBy agg), and the nearest-cell
lookup of transect/xarraypath.py:3-13 generalized to kNN via geocell ring
expansion (SURVEY.md section 2.3).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import cells

# ---------------------------------------------------------------------------
# numpy kernel (shared by both UDF strategies) + scalar reference
# ---------------------------------------------------------------------------

def pip_np(px: np.ndarray, py: np.ndarray,
           ring_xs: np.ndarray, ring_ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd crossing-number test: points (n,) against ONE
    polygon ring (closed or open list of vertices). Returns bool (n,)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    xs = np.asarray(ring_xs, dtype=np.float64)
    ys = np.asarray(ring_ys, dtype=np.float64)
    if xs[0] == xs[-1] and ys[0] == ys[-1]:
        xs, ys = xs[:-1], ys[:-1]
    n_edges = len(xs)
    inside = np.zeros(px.shape, dtype=bool)
    x1, y1 = xs, ys
    x2, y2 = np.roll(xs, -1), np.roll(ys, -1)
    for e in range(n_edges):
        cond = (y1[e] > py) != (y2[e] > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            xcross = x1[e] + (py - y1[e]) * (x2[e] - x1[e]) / (y2[e] - y1[e])
        inside ^= cond & (px < xcross)
    return inside


def pip_scalar_reference(px: float, py: float, ring) -> bool:
    """Slow scalar oracle: ring = [(x, y), ...]."""
    pts = list(ring)
    if pts[0] == pts[-1]:
        pts = pts[:-1]
    inside = False
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        if (y1 > py) != (y2 > py):
            if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                inside = not inside
    return inside


# ---------------------------------------------------------------------------
# polygon table helpers
# ---------------------------------------------------------------------------

POLY_SCHEMA = ("poly_id long, ring_xs array<double>, ring_ys array<double>, "
               "bbox_minx double, bbox_miny double, bbox_maxx double, "
               "bbox_maxy double")


def polygons_df(spark: SparkSession, polys: dict[int, list[tuple[float, float]]]) -> DataFrame:
    """Build the polygon dim table (FIXTURES.md F3) from {poly_id: ring}."""
    rows = []
    for pid, ring in polys.items():
        xs = [float(p[0]) for p in ring]
        ys = [float(p[1]) for p in ring]
        rows.append((pid, xs, ys, min(xs), min(ys), max(xs), max(ys)))
    return spark.createDataFrame(rows, schema=POLY_SCHEMA)


def _poly_pdf(polygons: DataFrame) -> pd.DataFrame:
    return polygons.select("poly_id", "ring_xs", "ring_ys",
                           "bbox_minx", "bbox_miny",
                           "bbox_maxx", "bbox_maxy").toPandas()


# ---------------------------------------------------------------------------
# strategy 1: broadcast PIP join
# ---------------------------------------------------------------------------

def pip_broadcast(points: DataFrame, polygons, x_col: str = "x",
                  y_col: str = "y", how: str = "inner") -> DataFrame:
    """points x polygons containment join; polygon layer broadcast.

    `polygons` is either the polygon dim DataFrame or a plain
    {poly_id: ring} dict (literal layers skip the collect round-trip).
    Output: point columns + poly_id (inner: matched only; left: poly_id
    null for unmatched). A point inside k polygons emits k rows.
    """
    if isinstance(polygons, dict):
        rows = []
        for pid, ring in polygons.items():
            xs = [float(p[0]) for p in ring]
            ys = [float(p[1]) for p in ring]
            rows.append((pid, xs, ys, min(xs), min(ys), max(xs), max(ys)))
        polys = pd.DataFrame(rows, columns=[
            "poly_id", "ring_xs", "ring_ys",
            "bbox_minx", "bbox_miny", "bbox_maxx", "bbox_maxy"])
    else:
        polys = _poly_pdf(polygons)
    sc = points.sparkSession.sparkContext
    b_polys = sc.broadcast([
        (int(r.poly_id), np.asarray(r.ring_xs), np.asarray(r.ring_ys),
         float(r.bbox_minx), float(r.bbox_miny),
         float(r.bbox_maxx), float(r.bbox_maxy))
        for r in polys.itertuples()
    ])
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in points.schema.fields]
        + ["poly_id long"])
    keep_unmatched = how == "left"

    def test(batches):
        polys_local = b_polys.value
        for pdf in batches:
            xs = pdf[x_col].to_numpy(dtype=np.float64)
            ys = pdf[y_col].to_numpy(dtype=np.float64)
            matched = np.zeros(len(pdf), dtype=bool)
            outs = []
            for pid, rxs, rys, minx, miny, maxx, maxy in polys_local:
                cand = (xs >= minx) & (xs <= maxx) & (ys >= miny) & (ys <= maxy)
                if not cand.any():
                    continue
                hit = np.zeros(len(pdf), dtype=bool)
                hit[cand] = pip_np(xs[cand], ys[cand], rxs, rys)
                if hit.any():
                    sub = pdf.loc[hit].copy()
                    sub["poly_id"] = pid
                    outs.append(sub)
                    matched |= hit
            if keep_unmatched and (~matched).any():
                sub = pdf.loc[~matched].copy()
                sub["poly_id"] = pd.array([None] * len(sub), dtype="Int64")
                outs.append(sub)
            if outs:
                yield pd.concat(outs)

    return points.mapInPandas(test, schema=out_schema)


# ---------------------------------------------------------------------------
# strategy 2: cell-cover equi-join PIP (the many-polygons scale path)
# ---------------------------------------------------------------------------

def polygon_cells(polygons: DataFrame, res: int) -> DataFrame:
    """Explode each polygon into the geocells covering its bbox at `res`
    (coarse cover; exact test runs after the join)."""
    def cover(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                cc = cells.polyfill_bbox(r.bbox_miny, r.bbox_maxy,
                                         r.bbox_minx, r.bbox_maxx, res)
                rows.append(pd.DataFrame({"poly_id": r.poly_id, "cell_id": cc}))
            if rows:
                yield pd.concat(rows)

    return polygons.mapInPandas(cover, schema="poly_id long, cell_id long")


def pip_cell_join(points: DataFrame, polygons: DataFrame, res: int,
                  x_col: str = "x", y_col: str = "y",
                  broadcast_geom: bool = True) -> DataFrame:
    """Equi-join points to polygon cell covers on cell_id, then exact PIP on
    the collocated candidates (grouped per polygon inside a pandas UDF).
    Shuffles only (point rows x avg cover multiplicity); never |P| x |Q|.

    broadcast_geom=False switches the geometry re-attach to a shuffle
    equi-join on poly_id — required when the polygon LAYER itself is too
    large to broadcast (continental cadastre / OSM-building scale); the
    candidate set is already cell-pruned, so the shuffle is
    candidates + one copy of each ring, not |P| x |Q|."""
    pts = points.withColumn(
        "cell_id", cells.encode_col(F.col(y_col), F.col(x_col), res))
    cover = polygon_cells(polygons, res)
    cand = pts.join(cover, "cell_id")  # Catalyst may broadcast the cover
    geom = polygons.select("poly_id", "ring_xs", "ring_ys")
    cand = cand.join(F.broadcast(geom) if broadcast_geom else geom,
                     "poly_id")
    out_cols = [f.name for f in points.schema.fields] + ["poly_id"]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in points.schema.fields]
        + ["poly_id long"])

    def exact(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            for (_, grp) in pdf.groupby("poly_id", sort=False):
                idx = grp.index.to_numpy()
                rxs = np.asarray(grp["ring_xs"].iloc[0])
                rys = np.asarray(grp["ring_ys"].iloc[0])
                keep[pdf.index.get_indexer(idx)] = pip_np(
                    grp[x_col].to_numpy(np.float64),
                    grp[y_col].to_numpy(np.float64), rxs, rys)
            out = pdf.loc[keep, out_cols]
            if len(out):
                yield out

    return cand.mapInPandas(exact, schema=out_schema)


# ---------------------------------------------------------------------------
# strategy 3: relational twin (the SQL oracle)
# ---------------------------------------------------------------------------

def pip_edges_sql(points_table: str, polys_edges_table: str,
                  point_cols: Sequence[str] = ("point_id", "x", "y"),
                  x_col: str = "x", y_col: str = "y") -> str:
    """ANSI SQL even-odd PIP: `polys_edges_table`(poly_id, x1, y1, x2, y2)
    joined to points; inside = odd crossing count. Same float expression as
    pip_np. Runs on Spark SQL and DuckDB unchanged."""
    cols = ", ".join(f"p.{c}" for c in point_cols)
    return f"""
SELECT {cols}, e.poly_id
FROM {points_table} p
JOIN {polys_edges_table} e
  ON ((e.y1 > p.{y_col}) != (e.y2 > p.{y_col}))
 AND p.{x_col} < e.x1 + (p.{y_col} - e.y1) * (e.x2 - e.x1) / (e.y2 - e.y1)
GROUP BY {cols}, e.poly_id
HAVING count(*) % 2 = 1
"""


def edges_rows(polys: dict[int, list[tuple[float, float]]]) -> list[tuple]:
    """(poly_id, x1, y1, x2, y2) edge list for the relational twin."""
    rows = []
    for pid, ring in polys.items():
        pts = list(ring)
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        for i in range(len(pts)):
            x1, y1 = pts[i]
            x2, y2 = pts[(i + 1) % len(pts)]
            rows.append((pid, float(x1), float(y1), float(x2), float(y2)))
    return rows


# ---------------------------------------------------------------------------
# zonal statistics (dea_tools/spatial.py:778-859 as one agg)
# ---------------------------------------------------------------------------

def zonal_stats(points: DataFrame, polygons, value_col: str,
                x_col: str = "x", y_col: str = "y",
                stats: Sequence[str] = ("count", "min", "max", "mean", "sum", "median"),
                strategy: str = "broadcast", res: int = 7) -> DataFrame:
    """PIP join then per-zone aggregate. Partial aggregation (map-side
    combine) replaces the reference's multiprocessing shared-dict merge."""
    joined = (pip_broadcast(points, polygons, x_col, y_col)
              if strategy == "broadcast"
              else pip_cell_join(points, polygons, res, x_col, y_col))
    agg_map = {
        "count": F.count(value_col).alias("count"),
        "min": F.min(value_col).alias("min"),
        "max": F.max(value_col).alias("max"),
        "mean": F.avg(value_col).alias("mean"),
        "sum": F.sum(value_col).alias("sum"),
        "median": F.expr(f"percentile({value_col}, 0.5)").alias("median"),
    }
    return joined.groupBy("poly_id").agg(*[agg_map[s] for s in stats])


# ---------------------------------------------------------------------------
# kNN — cost-based dispatch, brute (exact oracle), geocell ring expansion
# ---------------------------------------------------------------------------

def knn(queries: DataFrame, targets: DataFrame, k: int, res: int = 7,
        brute_max_queries: int = 256, brute_max_targets: int = 2_000_000,
        n_queries: int | None = None, n_targets: int | None = None,
        **kw) -> DataFrame:
    """Cost-based kNN: when the query side is tiny and the target side is
    broadcastable, the adaptive ring expansion's multi-round latency costs
    more than it saves — dispatch to the broadcast brute join; otherwise
    use geocell ring expansion. Both produce identical rows.

    Pass n_queries / n_targets when the caller already knows the sizes —
    skips the dispatch count() jobs entirely (VERDICT r1)."""
    nq = queries.count() if n_queries is None else n_queries
    if nq <= brute_max_queries:
        nt = targets.count() if n_targets is None else n_targets
        if nt <= brute_max_targets:
            return knn_brute(queries, targets, k,
                             **{kk: v for kk, v in kw.items()
                                if kk in ("qx", "qy", "qid", "tx", "ty", "tid")})
        kw.setdefault("n_targets", nt)
    # forward the caller's size hint on the big-query path too (ADVICE r2:
    # it was silently dropped exactly where inputs are largest)
    if n_targets is not None:
        kw.setdefault("n_targets", n_targets)
    return knn_cells(queries, targets, k, res, **kw)

def knn_brute(queries: DataFrame, targets: DataFrame, k: int,
              qx: str = "x", qy: str = "y", qid: str = "point_id",
              tx: str = "x", ty: str = "y", tid: str = "point_id") -> DataFrame:
    """Exact kNN by cross join + window rank — the oracle twin and the
    correct choice when |targets| is broadcastable. Euclidean in degrees.
    Ties break on target id (deterministic)."""
    q = queries.select(F.col(qid).alias("query_id"),
                       F.col(qx).alias("_qx"), F.col(qy).alias("_qy"))
    t = targets.select(F.col(tid).alias("neighbor_id"),
                       F.col(tx).alias("_tx"), F.col(ty).alias("_ty"))
    j = q.crossJoin(F.broadcast(t))
    # plain multiplication, not pow(x,2): bit-identical to the SQL oracle
    dx = F.col("_qx") - F.col("_tx")
    dy = F.col("_qy") - F.col("_ty")
    dist = F.sqrt(dx * dx + dy * dy)
    w = Window.partitionBy("query_id").orderBy(dist.asc(), F.col("neighbor_id").asc())
    return (j.withColumn("dist", dist)
             .withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select("query_id", "neighbor_id", "dist", "rank"))


def knn_cells(queries: DataFrame, targets: DataFrame, k: int, res: int,
              qx: str = "x", qy: str = "y", qid: str = "point_id",
              tx: str = "x", ty: str = "y", tid: str = "point_id",
              start_ring: int | None = None, max_rounds: int = 3,
              n_targets: int | None = None) -> DataFrame:
    """kNN via geocell ring expansion (SURVEY.md 2.3 'kNN' row).

    Round r joins each unsatisfied query's k_ring(cell, radius_r) to targets
    bucketed by cell (equi-join — never a cross product), keeps queries whose
    k-th best distance is <= the radius *guaranteed* covered by the ring
    (correctness bound: ring radius x cell height), and doubles the radius
    for the rest. Terminal round falls back to brute force for stragglers
    (empty regions) — a vanishing fraction at scale.
    """
    t = targets.select(F.col(tid).alias("neighbor_id"),
                       F.col(tx).alias("_tx"), F.col(ty).alias("_ty"),
                       cells.encode_col(F.col(ty), F.col(tx), res).alias("cell_id"))
    t = t.persist()
    q_all = queries.select(F.col(qid).alias("query_id"),
                           F.col(qx).alias("_qx"), F.col(qy).alias("_qy"),
                           cells.encode_col(F.col(qy), F.col(qx), res).alias("qcell"))
    cell_h = 180.0 / (1 << res)  # degrees per cell row at res

    if start_ring is None:
        # size the first ring to hold ~4k expected targets (oversampled so
        # the guarantee radius usually also passes in round one) — one
        # count() on the cached target side saves whole Spark rounds, and
        # each avoided round is several jobs of fixed latency
        n_cells = float((1 << res) * (1 << (res + 1)))
        nt = t.count() if n_targets is None else n_targets
        per_cell = max(nt / n_cells, 1e-9)
        est = int(np.ceil((np.sqrt(4.0 * k / per_cell) - 1) / 2))
        start_ring = min(max(1, est), 16)  # cap: very sparse regions go
        # through one cheap round then the brute fallback

    results = None
    pending = q_all
    radius = start_ring
    for rnd in range(max_rounds):
        if pending.isEmpty():
            break
        ring_df = _explode_rings(pending, radius)
        cand = ring_df.join(t, "cell_id")
        dx = F.col("_qx") - F.col("_tx")
        dy = F.col("_qy") - F.col("_ty")
        dist = F.sqrt(dx * dx + dy * dy)
        w = Window.partitionBy("query_id").orderBy(dist.asc(),
                                                   F.col("neighbor_id").asc())
        topk = (cand.withColumn("dist", dist)
                    .withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= k))
        # guarantee: everything within radius*cell_h of the query is covered
        guaranteed = radius * cell_h
        kth = topk.groupBy("query_id").agg(
            F.max("dist").alias("_kth"), F.count("*").alias("_n"))
        ok_ids = kth.filter((F.col("_n") >= k) & (F.col("_kth") <= guaranteed)) \
                    .select("query_id")
        done = topk.join(ok_ids, "query_id", "left_semi") \
                   .select("query_id", "neighbor_id", "dist", "rank")
        results = done if results is None else results.unionByName(done)
        pending = pending.join(ok_ids, pending.query_id == ok_ids.query_id,
                               "left_anti")
        radius *= 3  # cover ground fast: every extra round is several jobs

    if not pending.isEmpty():
        fallback = knn_brute(
            pending.select(F.col("query_id").alias("point_id"),
                           F.col("_qx").alias("x"), F.col("_qy").alias("y")),
            targets, k, tx=tx, ty=ty, tid=tid)
        results = fallback if results is None else results.unionByName(fallback)
    if results is not None:
        # Materialize (|queries| x k rows — tiny) and cut lineage so the
        # target cache can be released NOW instead of leaking until session
        # end (VERDICT r1 What's-wrong #6); the caller's collect no longer
        # references t at all.
        results = results.localCheckpoint(eager=True)
    t.unpersist()
    return results


def _explode_rings(pending: DataFrame, radius: int) -> DataFrame:
    """(query, qcell) -> one row per cell in k_ring(qcell, radius)."""
    schema = ("query_id long, _qx double, _qy double, cell_id long")

    def expand(batches):
        for pdf in batches:
            outs = []
            qid = pdf["query_id"].to_numpy()
            qxv = pdf["_qx"].to_numpy()
            qyv = pdf["_qy"].to_numpy()
            qcell = pdf["qcell"].to_numpy()
            for i in range(len(pdf)):
                ring_cells = cells.k_ring(int(qcell[i]), radius)
                outs.append(pd.DataFrame({
                    "query_id": qid[i], "_qx": qxv[i], "_qy": qyv[i],
                    "cell_id": ring_cells}))
            if outs:
                yield pd.concat(outs)

    return pending.mapInPandas(expand, schema=schema)


# ---------------------------------------------------------------------------
# spatial autocorrelation: global Moran's I on a regular cell grid
# ---------------------------------------------------------------------------

def morans_i_grid(cells_df: DataFrame, ix_col: str = "ix",
                  iy_col: str = "iy", value_col: str = "v") -> DataFrame:
    """Global Moran's I under rook adjacency on a regular grid — the
    standard test for spatial clustering of a per-cell statistic (is the
    water fraction / NDVI / dedup rate spatially clustered, or noise?).

      I = (n / W) * sum_ij w_ij (x_i - xbar)(x_j - xbar)
                  / sum_i (x_i - xbar)^2

    with w_ij = 1 for the 4 rook neighbors, W = number of directed
    neighbor pairs.  Multiplying deviations through by n (z_i = n*x_i -
    sum) keeps every aggregate EXACT integer arithmetic — the n^2 cancels
    in the ratio — so num/den/W/n are engine-reproducible and the final
    double is one fixed-order expression.

    Shape at scale: one tiny stats row broadcast back, one equi-join of
    the grid against its 4 shifted selves on (ix, iy) — co-partitioned,
    no cross product, no collect.  Returns a single row:
    (n, w_pairs, num, den, morans_i)."""
    stats = cells_df.agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast("long")).alias("_s"))
    z = cells_df.crossJoin(F.broadcast(stats)).select(
        F.col(ix_col).cast("long").alias("ix"),
        F.col(iy_col).cast("long").alias("iy"),
        (F.col("_n") * F.col(value_col).cast("long") - F.col("_s"))
        .alias("z"), "_n")
    offs = cells_df.sparkSession.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    nbr = z.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("z").alias("zj"))
    edges = (z.crossJoin(F.broadcast(offs))
              .withColumn("jx", F.col("ix") + F.col("dx"))
              .withColumn("jy", F.col("iy") + F.col("dy"))
              .join(nbr, ["jx", "jy"]))
    num_w = edges.agg(F.sum(F.col("z") * F.col("zj")).alias("num"),
                      F.count("*").alias("w_pairs"))
    den = z.agg(F.sum(F.col("z") * F.col("z")).alias("den"),
                F.max("_n").alias("n"))
    out = den.crossJoin(num_w)
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.col("w_pairs").cast("long").alias("w_pairs"),
        F.col("num").cast("long").alias("num"),
        F.col("den").cast("long").alias("den"),
        ((F.col("n").cast("double") / F.col("w_pairs"))
         * (F.col("num").cast("double") / F.col("den")))
        .alias("morans_i"))


def semivariogram_grid(cells_df: DataFrame, max_lag: int = 4,
                       ix_col: str = "ix", iy_col: str = "iy",
                       value_col: str = "v") -> DataFrame:
    """Empirical semivariogram on a regular grid — kriging's input curve:
    gamma(h) = sum over pairs at axis-aligned lag h of (x_i - x_j)^2
    / (2 * n_pairs(h)), for h = 1..max_lag.

    Exact shape: squared integer differences sum exactly; each
    (unordered) pair is counted once per axis direction (+h on x, +h on
    y), so n_pairs is deterministic.  One equi-join of the grid against
    itself per the broadcast lag table — co-partitioned on the cell key,
    no cross product.  Returns (lag, n_pairs, sq_sum, gamma) with gamma
    the one fixed-order double division."""
    lags = cells_df.sparkSession.createDataFrame(
        [(h, h, 0) for h in range(1, max_lag + 1)]
        + [(h, 0, h) for h in range(1, max_lag + 1)],
        "lag long, dx long, dy long")
    a = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("va"))
    b = cells_df.select(F.col(ix_col).cast("long").alias("jx"),
                        F.col(iy_col).cast("long").alias("jy"),
                        F.col(value_col).cast("long").alias("vb"))
    pairs = (a.crossJoin(F.broadcast(lags))
              .withColumn("jx", F.col("ix") + F.col("dx"))
              .withColumn("jy", F.col("iy") + F.col("dy"))
              .join(b, ["jx", "jy"]))
    d = F.col("va") - F.col("vb")
    return (pairs.groupBy("lag")
                 .agg(F.count("*").alias("n_pairs"),
                      F.sum(d * d).alias("sq_sum"))
                 .withColumn("gamma",
                             F.col("sq_sum").cast("double")
                             / (2.0 * F.col("n_pairs").cast("double"))))


def getis_ord_grid(cells_df: DataFrame, ix_col: str = "ix",
                   iy_col: str = "iy", value_col: str = "v") -> DataFrame:
    """Getis-Ord Gi* hotspot statistic per cell — the LOCAL companion to
    morans_i_grid (which is global): a z-score per cell for "is this
    cell's neighborhood total higher/lower than chance", the standard
    hotspot/coldspot map over gridded rasters (flood counts, dedup
    rates, NDVI).

      Gi* = (L_i - xbar * k_i) / (s * sqrt((n*k_i - k_i^2) / (n - 1)))

    where L_i = sum of v over the cell + its rook neighbors, k_i = that
    neighborhood's size (3-5 at edges/corners — computed by the join, no
    padding assumptions), xbar/s the global mean/sd.  Multiplying num
    and den through by n keeps every aggregate an EXACT int64:

      z_i = (n*L_i - S*k_i) / sqrt((n*SS - S^2) * (n*k_i - k_i^2) / (n-1))

    with S = sum v, SS = sum v^2 — the final double is one fixed-order
    expression over exact integers, so it hash-reproduces across engines.

    Shape at scale: one tiny global-stats row broadcast back, one
    equi-join of the grid against its 5 shifted selves (broadcast offset
    table, co-partitioned on the cell key), one per-cell aggregate.  No
    cross product, no collect."""
    stats = cells_df.agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast("long")).alias("_s"),
        F.sum(F.col(value_col).cast("long")
              * F.col(value_col).cast("long")).alias("_ss"))
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("v"))
    offs = cells_df.sparkSession.createDataFrame(
        [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("v").alias("vj"))
    local = (g.crossJoin(F.broadcast(offs))
              .withColumn("jx", F.col("ix") + F.col("dx"))
              .withColumn("jy", F.col("iy") + F.col("dy"))
              .join(nbr, ["jx", "jy"])
              .groupBy("ix", "iy")
              .agg(F.max("v").alias("_v_keep"),
                   F.sum("vj").alias("local_sum"),
                   F.count("*").alias("k")))
    # _v_keep is just the cell's own v carried through (max over the
    # group of identical values); re-select with stable names
    num = (F.col("_n") * F.col("local_sum") - F.col("_s") * F.col("k"))
    a = (F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s"))
    b = (F.col("_n") * F.col("k") - F.col("k") * F.col("k"))
    z = (num.cast("double")
         / F.sqrt(a.cast("double") * b.cast("double")
                  / (F.col("_n") - 1).cast("double")))
    return (local.crossJoin(F.broadcast(stats))
                 .select(F.col("ix"), F.col("iy"),
                         F.col("_v_keep").cast("long").alias("v"),
                         F.col("local_sum").cast("long").alias("local_sum"),
                         F.col("k").cast("long").alias("k"),
                         z.alias("gi_z")))


# D8 neighbor table: (dx, dy, code, w) — ESRI direction codes with iy as
# northing (S = iy-1).  w doubles the squared drop for CARDINAL neighbors:
# slope^2 = drop^2/dist^2, and scaling every candidate by 2 turns the
# {1, 2} dist^2 set into the exact-integer rank 2*drop^2 (cardinal) vs
# drop^2 (diagonal) — same ordering, no doubles.
D8_OFFSETS = [
    (1, 0, 1, 2), (1, -1, 2, 1), (0, -1, 4, 2), (-1, -1, 8, 1),
    (-1, 0, 16, 2), (-1, 1, 32, 1), (0, 1, 64, 2), (1, 1, 128, 1),
]


def d8_flow_grid(cells_df: DataFrame, ix_col: str = "ix",
                 iy_col: str = "iy", value_col: str = "v") -> DataFrame:
    """D8 flow direction — the standard hydrology operator over a DEM
    grid: each cell drains to its steepest-DESCENT neighbor among the 8
    (ESRI codes E=1, SE=2, ... NE=128; 0 = pit/flat, nothing lower).

    Exact arithmetic: only POSITIVE drops compete, so the squared-drop
    rank 2*drop^2 (cardinal) vs drop^2 (diagonal) preserves the
    drop/dist ordering in pure int64; ties break on the smallest
    direction code (fixed clockwise-from-east scan), so the winner is
    deterministic in any engine.

    Shape at scale: one equi-join of the grid against its 8 shifted
    selves (broadcast offset table, co-partitioned on the cell key) +
    one per-cell window rank.  No cross product, no collect."""
    # The grid is referenced THREE times below (candidate side, shifted
    # neighbor side, final left join) and is usually itself an expensive
    # aggregation of the raw table — localCheckpoint (lazy) pins it to
    # one evaluation and truncates the lineage each reference would
    # otherwise replay (sf1.0: the 6M-row grid agg ran 3x per flow
    # evaluation, and callers evaluate flow 2-3x on top).
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("v")) \
                .localCheckpoint(eager=False)
    offs = cells_df.sparkSession.createDataFrame(
        D8_OFFSETS, "dx long, dy long, code long, w long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("v").alias("vj"))
    drop = F.col("v") - F.col("vj")
    cand = (g.crossJoin(F.broadcast(offs))
             .withColumn("jx", F.col("ix") + F.col("dx"))
             .withColumn("jy", F.col("iy") + F.col("dy"))
             .join(nbr, ["jx", "jy"])
             .filter(drop > 0)
             .withColumn("rank", drop * drop * F.col("w")))
    win = Window.partitionBy("ix", "iy").orderBy(
        F.desc("rank"), F.asc("code"))
    best = (cand.withColumn("rn", F.row_number().over(win))
                .filter(F.col("rn") == 1)
                .select("ix", "iy", F.col("code").alias("flow_dir"),
                        F.col("jx").alias("to_ix"),
                        F.col("jy").alias("to_iy")))
    return (g.join(best, ["ix", "iy"], "left")
             .select("ix", "iy", "v",
                     F.coalesce("flow_dir", F.lit(0)).cast("long")
                      .alias("flow_dir"),
                     F.col("to_ix").cast("long").alias("to_ix"),
                     F.col("to_iy").cast("long").alias("to_iy")))


def _d8_pair_closure(flow: DataFrame, max_iters: int = 48) -> DataFrame:
    """Strict-ancestor pair closure (sx,sy) -> (tx,ty) of the D8 graph
    by path-DOUBLING self-joins: after k rounds every path of length
    <= 2^k is present — O(log max_path_length) shuffles on the
    functional acyclic drain graph.  Each round persists, counts (the
    fixpoint test) and localCheckpoints to truncate lineage.  Shared by
    flow_accumulation_grid and stream_order_shreve_grid."""
    edges = (flow.filter(F.col("flow_dir") > 0)
                 .select(F.col("ix").alias("sx"), F.col("iy").alias("sy"),
                         F.col("to_ix").alias("tx"),
                         F.col("to_iy").alias("ty")))
    pairs = edges.persist()
    n = pairs.count()
    for _ in range(max_iters):
        hop = pairs.select(F.col("sx").alias("hx"), F.col("sy").alias("hy"),
                           F.col("tx").alias("htx"), F.col("ty").alias("hty"))
        ext = (pairs.join(hop, (F.col("tx") == F.col("hx"))
                          & (F.col("ty") == F.col("hy")))
                    .select("sx", "sy", F.col("htx").alias("tx"),
                            F.col("hty").alias("ty")))
        merged = pairs.unionByName(ext).distinct().localCheckpoint()
        m = merged.count()
        pairs.unpersist()
        pairs = merged
        if m == n:
            break
        n = m
    return pairs


def flow_accumulation_grid(cells_df: DataFrame, ix_col: str = "ix",
                           iy_col: str = "iy", value_col: str = "v",
                           max_iters: int = 48) -> DataFrame:
    """D8 flow accumulation: for every cell, the number of upstream
    cells whose D8 path drains through it (0 for ridges/sources) — the
    watershed/catchment primitive built on d8_flow_grid.

    The D8 graph is FUNCTIONAL (one outflow per cell) and ACYCLIC
    (v strictly decreases along every edge), so the ancestor closure is
    computed by path-DOUBLING self-joins: after k rounds every path of
    length <= 2^k is present — O(log max_path_length) shuffles, the
    distributed-closure shape that survives a continental DEM, vs the
    O(depth) rounds of step-by-step propagation.  Each round persists,
    counts (the fixpoint test) and localCheckpoints to truncate lineage;
    max_iters is a runaway bound (2^48 hops), never hit in practice.

    Not SQL-free-expressible in one query — the DuckDB twin uses a
    recursive CTE; the Spark side is the scale path."""
    # flow is consumed twice (closure seed + final join) — persist it so
    # the D8 join/window pipeline runs once (stream_order's lifecycle)
    flow = d8_flow_grid(cells_df, ix_col, iy_col, value_col).persist()
    pairs = _d8_pair_closure(flow, max_iters)
    acc = pairs.groupBy("tx", "ty").agg(F.count("*").alias("n_upstream"))
    out = (flow.join(acc, (flow.ix == acc.tx) & (flow.iy == acc.ty), "left")
               .select(flow.ix, flow.iy, flow.v,
                       F.coalesce("n_upstream", F.lit(0)).cast("long")
                        .alias("n_upstream")))
    out = out.localCheckpoint()
    flow.unpersist()
    pairs.unpersist()
    return out


def local_morans_grid(cells_df: DataFrame, ix_col: str = "ix",
                      iy_col: str = "iy", value_col: str = "v") -> DataFrame:
    """Local Moran's I (Anselin's LISA) per cell — decomposes the global
    morans_i_grid statistic into its per-cell contributions and labels
    each cell's cluster quadrant (HH hot spot, LL cold spot, HL/LH
    outliers), the standard local-cluster map over gridded statistics.

    With zs_i = n*x_i - S (deviation scaled by n, exact int64) and
    L_i = sum of zs over the rook neighbors:

      I_i = n * zs_i * L_i / sum(zs^2)

    (the 1/n^3 of the scaled deviations cancels against m2's n^3) —
    every aggregate is exact int64 (|n*zs*L| <= n^2 * maxv * 4*n*maxv
    stays far inside the range for mod-bounded statistics), and the
    final I_i is ONE division, so it hash-reproduces.  quadrant is
    'HH'/'LL'/'HL'/'LH' by the signs of zs_i and L_i, 'NS' when either
    is exactly 0.

    Shape at scale: identical to getis_ord_grid — broadcast stats row,
    one 4-shifted-selves equi-join, one per-cell aggregate."""
    stats = cells_df.agg(
        F.count("*").alias("_n"),
        F.sum(F.col(value_col).cast("long")).alias("_s"))
    g = (cells_df.crossJoin(F.broadcast(stats))
         .select(F.col(ix_col).cast("long").alias("ix"),
                 F.col(iy_col).cast("long").alias("iy"),
                 F.col(value_col).cast("long").alias("v"),
                 (F.col("_n") * F.col(value_col).cast("long") - F.col("_s"))
                 .alias("zs"), "_n"))
    den = g.agg(F.sum(F.col("zs") * F.col("zs")).alias("_den"))
    offs = cells_df.sparkSession.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("zs").alias("zj"))
    local = (g.crossJoin(F.broadcast(offs))
              .withColumn("jx", F.col("ix") + F.col("dx"))
              .withColumn("jy", F.col("iy") + F.col("dy"))
              .join(nbr, ["jx", "jy"])
              .groupBy("ix", "iy")
              .agg(F.max("v").alias("v"), F.max("zs").alias("zs"),
                   F.max("_n").alias("_n"),
                   F.sum("zj").alias("lag_zs"), F.count("*").alias("k")))
    lisa = (F.col("_n") * F.col("zs") * F.col("lag_zs")).cast("double") \
        / F.col("_den").cast("double")
    quad = (F.when((F.col("zs") > 0) & (F.col("lag_zs") > 0), "HH")
             .when((F.col("zs") < 0) & (F.col("lag_zs") < 0), "LL")
             .when((F.col("zs") > 0) & (F.col("lag_zs") < 0), "HL")
             .when((F.col("zs") < 0) & (F.col("lag_zs") > 0), "LH")
             .otherwise("NS"))
    return (local.crossJoin(F.broadcast(den))
                 .select("ix", "iy", F.col("v").cast("long").alias("v"),
                         F.col("zs").cast("long").alias("zs"),
                         F.col("lag_zs").cast("long").alias("lag_zs"),
                         F.col("k").cast("long").alias("k"),
                         lisa.alias("lisa"), quad.alias("quadrant")))


def idw_interpolate_grid(points_df: DataFrame, grid_df: DataFrame,
                         scale: int = 10 ** 9,
                         px_col: str = "px", py_col: str = "py",
                         pv_col: str = "pv", ix_col: str = "ix",
                         iy_col: str = "iy") -> DataFrame:
    """Inverse-distance-squared interpolation of scattered station
    points onto a regular grid — the classic gap-filling interpolator
    (rain gauges -> raster, tide stations -> coastal surface).

    Engine-exact by QUANTIZED weights: w = floor(scale / d2) with
    d2 = squared integer distance, so both the weighted sum and the
    weight sum are exact int64 and the estimate is ONE division.  (True
    1/d^2 doubles would make the result depend on floating-point
    SUMMATION ORDER across partitions — unreproducible by design; the
    quantization error is <= maxv * n / scale, documented, and the knob
    is caller-visible.)  A cell that lands exactly on a station
    (d2 = 0) takes the min station value there (deterministic among
    coincident stations).

    Shape at scale: stations are the small side by nature — broadcast
    them; the grid (arbitrarily large) is scanned once and aggregated
    map-side per cell, never shuffled wholesale.  For station tables too
    large to broadcast, pre-bucket both sides on a geocell and
    equi-join (the kNN dispatch pattern above)."""
    pts = points_df.select(F.col(px_col).cast("long").alias("px"),
                           F.col(py_col).cast("long").alias("py"),
                           F.col(pv_col).cast("long").alias("pv"))
    g = grid_df.select(F.col(ix_col).cast("long").alias("ix"),
                       F.col(iy_col).cast("long").alias("iy"))
    dx = F.col("ix") - F.col("px")
    dy = F.col("iy") - F.col("py")
    j = (g.crossJoin(F.broadcast(pts))
          .withColumn("d2", dx * dx + dy * dy)
          .withColumn("w", F.expr(f"case when d2 > 0 then {scale}L div d2 "
                                  "else 0 end")))
    agg = (j.groupBy("ix", "iy")
            .agg(F.count("*").alias("n_pts"),
                 F.sum((F.col("d2") == 0).cast("long")).alias("n_exact"),
                 F.min(F.when(F.col("d2") == 0, F.col("pv")))
                  .alias("exact_v"),
                 F.sum(F.col("w") * F.col("pv")).alias("num"),
                 F.sum("w").alias("den")))
    est = (F.when(F.col("n_exact") > 0, F.col("exact_v").cast("double"))
            .otherwise(F.col("num").cast("double")
                       / F.col("den").cast("double")))
    return agg.select("ix", "iy",
                      F.col("n_pts").cast("long").alias("n_pts"),
                      F.col("n_exact").cast("long").alias("n_exact"),
                      F.col("num").cast("long").alias("num"),
                      F.col("den").cast("long").alias("den"),
                      est.alias("est"))


def terrain_position_grid(cells_df: DataFrame, ix_col: str = "ix",
                          iy_col: str = "iy",
                          value_col: str = "v") -> DataFrame:
    """Topographic Position Index + Terrain Ruggedness Index per cell
    over the queen (8-)neighborhood — the standard landform-classing
    pair (ridge/valley/flat from TPI sign, roughness from TRI).

      TPI_i = v_i - mean(neighbors)   -> exact as k*v - L over k
      TRI_i = mean(|v_i - v_j|)       -> exact as sum|diff| over k

    Both numerators are exact int64; each index is ONE division by the
    JOIN-COUNTED neighborhood size k (5/8 at edges/corners — no padding
    assumption), so the doubles hash-reproduce.

    Shape at scale: one 8-shifted-selves equi-join + per-cell aggregate,
    same co-partitioned pattern as getis_ord_grid."""
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("v"))
    offs = cells_df.sparkSession.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         if (dx, dy) != (0, 0)], "dx long, dy long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("v").alias("vj"))
    d = F.col("v") - F.col("vj")
    agg = (g.crossJoin(F.broadcast(offs))
            .withColumn("jx", F.col("ix") + F.col("dx"))
            .withColumn("jy", F.col("iy") + F.col("dy"))
            .join(nbr, ["jx", "jy"])
            .groupBy("ix", "iy")
            .agg(F.max("v").alias("v"), F.count("*").alias("k"),
                 F.sum("vj").alias("nbr_sum"),
                 F.sum(F.abs(d)).alias("tri_num")))
    return agg.select(
        "ix", "iy", F.col("v").cast("long").alias("v"),
        F.col("k").cast("long").alias("k"),
        (F.col("k") * F.col("v") - F.col("nbr_sum")).cast("long")
        .alias("tpi_num"),
        F.col("tri_num").cast("long").alias("tri_num"),
        ((F.col("k") * F.col("v") - F.col("nbr_sum")).cast("double")
         / F.col("k").cast("double")).alias("tpi"),
        (F.col("tri_num").cast("double") / F.col("k").cast("double"))
        .alias("tri"))


def mann_kendall_grid(series_df: DataFrame, ix_col: str = "ix",
                      iy_col: str = "iy", t_col: str = "t",
                      x_col: str = "x", z_crit: float = 1.96) -> DataFrame:
    """Mann-Kendall monotone-trend test per grid cell — the statistic
    behind EMERGING HOT SPOT analysis (is each cell's time series of
    counts/means rising or falling, nonparametrically?):

      S = sum over time pairs i<j of sign(x_j - x_i)
      Var(S) = [m(m-1)(2m+5) - sum_ties t(t-1)(2t+5)] / 18
      z = (S -/+ 1) / sqrt(Var)   (continuity-corrected; 0 when S=0)

    S, m and both variance terms are exact int64 (signs of integer
    differences); z is one fixed-order double expression, so the driver
    hash-oracle reproduces it.  trend = 'increasing' / 'decreasing' at
    |z| > z_crit, else 'none'.

    Shape at scale: ONE shuffle groups each cell's series into a sorted
    array; the O(m^2) pair scan runs INSIDE the row via JVM higher-order
    aggregates (m = series length is calendar-bounded, not data-
    bounded), and the tie term is a second small aggregate joined back.
    No per-cell self-join of the fact table, no UDF."""
    ser = series_df.select(F.col(ix_col).cast("long").alias("ix"),
                           F.col(iy_col).cast("long").alias("iy"),
                           F.col(t_col).cast("long").alias("t"),
                           F.col(x_col).cast("long").alias("x"))
    arr = (ser.groupBy("ix", "iy")
              .agg(F.sort_array(F.collect_list(F.struct("t", "x")))
                   .alias("ser")))
    s_expr = F.expr("""
        aggregate(sequence(0, size(ser) - 2), 0L, (acc, i) ->
          acc + aggregate(sequence(i + 1, size(ser) - 1), 0L, (a2, j) ->
            a2 + CAST(sign(ser[j].x - ser[i].x) AS LONG)))""")
    s_tab = arr.select("ix", "iy",
                       F.size("ser").cast("long").alias("m"),
                       F.when(F.size("ser") >= 2, s_expr).otherwise(F.lit(0))
                        .cast("long").alias("s_stat"))
    ties = (ser.groupBy("ix", "iy", "x").agg(F.count("*").alias("c"))
               .groupBy("ix", "iy")
               .agg(F.sum(F.col("c") * (F.col("c") - 1)
                          * (2 * F.col("c") + 5)).alias("tie_term")))
    j = s_tab.join(ties, ["ix", "iy"])
    var_num = (F.col("m") * (F.col("m") - 1) * (2 * F.col("m") + 5)
               - F.col("tie_term"))
    z = (F.when((var_num == 0) | (F.col("s_stat") == 0), F.lit(0.0))
          .when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1).cast("double")
                / F.sqrt(var_num.cast("double") / 18.0))
          .otherwise((F.col("s_stat") + 1).cast("double")
                     / F.sqrt(var_num.cast("double") / 18.0)))
    trend = (F.when(z > z_crit, "increasing")
              .when(z < -z_crit, "decreasing").otherwise("none"))
    return j.select("ix", "iy", "m", "s_stat",
                    F.col("tie_term").cast("long").alias("tie_term"),
                    var_num.cast("long").alias("var_num"),
                    z.alias("mk_z"), trend.alias("trend"))


def watershed_basins_grid(cells_df: DataFrame, ix_col: str = "ix",
                          iy_col: str = "iy", value_col: str = "v",
                          max_iters: int = 48) -> DataFrame:
    """Watershed delineation over the D8 graph: every cell is labeled
    with its terminal PIT (the cell its flow path ends in), partitioning
    the grid into drainage basins — the catchment companion to
    flow_accumulation_grid.

    POINTER DOUBLING on the functional D8 graph: each round composes the
    current pointer table with itself (ptr2(x) = ptr(ptr(x))), so after
    k rounds every cell points 2^k hops ahead; pits point to themselves,
    making the composition idempotent at the root.  O(log depth) rounds,
    each ONE equi-join of an n-row table — the n*depth pair blow-up of
    the ancestor closure never materializes, which is why this is the
    scale shape for root-finding while flow_accumulation (which needs
    path COUNTS, not roots) pays for the pair table.

    Convergence is tested by counting unresolved rows (pointer not yet a
    pit); the DuckDB twin walks the same paths with a recursive CTE."""
    flow = d8_flow_grid(cells_df, ix_col, iy_col, value_col).persist()
    ptr = (flow.select(
        "ix", "iy",
        F.coalesce("to_ix", F.col("ix")).alias("px"),
        F.coalesce("to_iy", F.col("iy")).alias("py"),
        (F.col("flow_dir") == 0).alias("done"))).persist()
    pits = ptr.select(F.col("ix").alias("px"), F.col("iy").alias("py"),
                      F.col("done").alias("p_done"))
    for _ in range(max_iters):
        unresolved = (ptr.join(pits, ["px", "py"])
                         .filter(~F.col("p_done")).count())
        if unresolved == 0:
            break
        nxt = ptr.select(F.col("ix").alias("px"), F.col("iy").alias("py"),
                         F.col("px").alias("qx"), F.col("py").alias("qy"))
        ptr2 = (ptr.join(nxt, ["px", "py"])
                   .select("ix", "iy", F.col("qx").alias("px"),
                           F.col("qy").alias("py"), "done")
                   .localCheckpoint())
        ptr.unpersist()
        ptr = ptr2.persist()
        pits = ptr.select(F.col("ix").alias("px"), F.col("iy").alias("py"),
                          F.col("done").alias("p_done"))
    out = flow.select("ix", "iy", "v").join(
        ptr.select("ix", "iy", F.col("px").alias("basin_ix"),
                   F.col("py").alias("basin_iy")), ["ix", "iy"])
    out = out.select("ix", "iy", "v",
                     F.col("basin_ix").cast("long").alias("basin_ix"),
                     F.col("basin_iy").cast("long").alias("basin_iy"),
                     (F.col("basin_ix") * 100000 + F.col("basin_iy"))
                     .cast("long").alias("basin_id")).localCheckpoint()
    flow.unpersist()
    ptr.unpersist()
    return out


def theil_sen_grid(series_df: DataFrame, ix_col: str = "ix",
                   iy_col: str = "iy", t_col: str = "t",
                   x_col: str = "x") -> DataFrame:
    """Theil-Sen slope per grid cell — the robust trend MAGNITUDE that
    pairs with mann_kendall_grid's trend DIRECTION (the standard
    emerging-hotspot couple): the median of all pairwise slopes
    (x_j - x_i) / (t_j - t_i), insensitive to up to ~29% outliers.

    Hash-exact median selection: pair slopes are doubles (one division
    of exact integers each), but the MEDIAN is chosen by a fully
    deterministic total order (slope, dx, dt) — identical in any IEEE
    engine — and the even-count case averages the two middles in one
    fixed-order expression.  Pairs with dt = 0 (duplicate timestamps)
    are excluded in both engines.

    Shape at scale: same as mann_kendall_grid — ONE shuffle builds each
    cell's sorted series; the O(m^2) pair table is built, sorted and
    median-picked INSIDE the row by JVM higher-order expressions
    (m is calendar-bounded), no explode, no UDF."""
    ser = series_df.select(F.col(ix_col).cast("long").alias("ix"),
                           F.col(iy_col).cast("long").alias("iy"),
                           F.col(t_col).cast("long").alias("t"),
                           F.col(x_col).cast("long").alias("x"))
    arr = (ser.groupBy("ix", "iy")
              .agg(F.sort_array(F.collect_list(F.struct("t", "x")))
                   .alias("ser")))
    pairs = F.expr("""
        sort_array(filter(flatten(transform(
          sequence(0, greatest(size(ser) - 2, 0)), i ->
            transform(sequence(least(i + 1, size(ser) - 1),
                               size(ser) - 1), j ->
              struct(CAST(ser[j].x - ser[i].x AS DOUBLE)
                       / CAST(ser[j].t - ser[i].t AS DOUBLE) AS sl,
                     CAST(ser[j].x - ser[i].x AS LONG) AS dx,
                     CAST(ser[j].t - ser[i].t AS LONG) AS dt)))),
          p -> p.dt > 0))""")
    with_pairs = (arr.filter(F.size("ser") >= 2)
                     .select("ix", "iy", pairs.alias("p"))
                     .withColumn("n", F.size("p"))
                     .filter(F.col("n") >= 1))
    lo = F.expr("p[CAST((n - 1) div 2 AS INT)].sl")
    hi = F.expr("p[CAST(n div 2 AS INT)].sl")
    med = F.when(F.col("n") % 2 == 1, lo).otherwise((lo + hi) / 2.0)
    return with_pairs.select("ix", "iy",
                             F.col("n").cast("long").alias("n_pairs"),
                             med.alias("sen_slope"))


def majority_filter_grid(cells_df: DataFrame, ix_col: str = "ix",
                         iy_col: str = "iy",
                         value_col: str = "v") -> DataFrame:
    """Focal MAJORITY (mode) filter over the queen neighborhood incl.
    self — the standard salt-and-pepper smoother for CLASSIFIED rasters
    (land-cover, wofs, cluster labels), where mean/median smoothers are
    meaningless.  Deterministic tie-break: highest count, then SMALLEST
    class value, so the winner hash-reproduces in any engine.

    Shape at scale: one 9-shifted-selves equi-join, one (cell, class)
    count, one per-cell window rank — co-partitioned on the cell key
    throughout, no collect, no UDF."""
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("v"))
    offs = cells_df.sparkSession.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("v").alias("vj"))
    counts = (g.crossJoin(F.broadcast(offs))
               .withColumn("jx", F.col("ix") + F.col("dx"))
               .withColumn("jy", F.col("iy") + F.col("dy"))
               .join(nbr, ["jx", "jy"])
               .groupBy("ix", "iy", "vj")
               .agg(F.count("*").alias("cnt")))
    win = Window.partitionBy("ix", "iy").orderBy(F.desc("cnt"), F.asc("vj"))
    mode = (counts.withColumn("rn", F.row_number().over(win))
                  .filter(F.col("rn") == 1)
                  .select("ix", "iy", F.col("vj").alias("mode_v"),
                          F.col("cnt").alias("mode_cnt")))
    k = (counts.groupBy("ix", "iy").agg(F.sum("cnt").alias("k")))
    return (g.join(mode, ["ix", "iy"]).join(k, ["ix", "iy"])
             .select("ix", "iy", "v",
                     F.col("mode_v").cast("long").alias("mode_v"),
                     F.col("mode_cnt").cast("long").alias("mode_cnt"),
                     F.col("k").cast("long").alias("k"),
                     (F.col("mode_v") != F.col("v")).cast("int")
                      .alias("changed")))


def median_filter_grid(cells_df: DataFrame, ix_col: str = "ix",
                       iy_col: str = "iy",
                       value_col: str = "v") -> DataFrame:
    """Focal MEDIAN filter over the queen neighborhood incl. self — the
    salt-and-pepper denoiser for CONTINUOUS rasters (DNs, DEM spikes),
    where majority_filter_grid's mode is meaningless.  The median is
    the exact LOWER median — element ceil(k/2) of the sorted window —
    so truncated edge windows (k even) stay integer and the result
    hash-reproduces in any engine; no doubles anywhere.

    Shape at scale: the majority_filter_grid contract — one 9-shifted-
    selves equi-join co-partitioned on the cell key, one per-cell
    sorted-array pick; no collect, no UDF.  Returns
    (ix, iy, v, median_v, k, changed)."""
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("v"))
    offs = cells_df.sparkSession.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("v").alias("vj"))
    win = (g.crossJoin(F.broadcast(offs))
            .withColumn("jx", F.col("ix") + F.col("dx"))
            .withColumn("jy", F.col("iy") + F.col("dy"))
            .join(nbr, ["jx", "jy"])
            .groupBy("ix", "iy")
            .agg(F.array_sort(F.collect_list("vj")).alias("w")))
    med = win.select(
        "ix", "iy", F.size("w").cast("long").alias("k"),
        F.element_at("w", F.floor((F.size("w") + 1) / 2).cast("int"))
         .alias("median_v"))
    return (g.join(med, ["ix", "iy"])
             .select("ix", "iy", "v",
                     F.col("median_v").cast("long").alias("median_v"),
                     "k",
                     (F.col("median_v") != F.col("v")).cast("int")
                      .alias("changed")))


def transition_matrix_grid(a_df: DataFrame, b_df: DataFrame,
                           ix_col: str = "ix", iy_col: str = "iy",
                           value_col: str = "v") -> DataFrame:
    """Two-epoch class-transition (change-detection) matrix: join epoch
    A and epoch B classified grids on the cell key and count every
    (class_from, class_to) pair, with the per-from-class row fraction —
    the land-cover-change / classification-drift summary table.

    Exact integers; row_frac is one division.  Shape at scale: ONE
    co-partitioned equi-join on the cell key + a tiny (classes^2)
    aggregate, partial map-side."""
    a = a_df.select(F.col(ix_col).alias("ix"), F.col(iy_col).alias("iy"),
                    F.col(value_col).cast("long").alias("class_from"))
    b = b_df.select(F.col(ix_col).alias("ix"), F.col(iy_col).alias("iy"),
                    F.col(value_col).cast("long").alias("class_to"))
    t = (a.join(b, ["ix", "iy"])
          .groupBy("class_from", "class_to")
          .agg(F.count("*").alias("n_cells")))
    tot = t.groupBy("class_from").agg(F.sum("n_cells").alias("row_total"))
    return (t.join(tot, "class_from")
             .select("class_from", "class_to",
                     F.col("n_cells").cast("long").alias("n_cells"),
                     F.col("row_total").cast("long").alias("row_total"),
                     (F.col("n_cells").cast("double")
                      / F.col("row_total").cast("double"))
                     .alias("row_frac")))


def getis_ord_series(series_df: DataFrame, ix_col: str = "ix",
                     iy_col: str = "iy", t_col: str = "t",
                     x_col: str = "x") -> DataFrame:
    """Per-time-slice Getis-Ord Gi*: getis_ord_grid generalized over a
    time axis — global stats computed PER SLICE, the rook+self
    neighbor join keyed (t, ix, iy) so slices never mix.  The building
    block of emerging_hotspots below.  Returns (t, ix, iy, gi_z)."""
    ser = series_df.select(F.col(t_col).cast("long").alias("t"),
                           F.col(ix_col).cast("long").alias("ix"),
                           F.col(iy_col).cast("long").alias("iy"),
                           F.col(x_col).cast("long").alias("x"))
    stats = ser.groupBy("t").agg(
        F.count("*").alias("_n"),
        F.sum("x").alias("_s"),
        F.sum(F.col("x") * F.col("x")).alias("_ss"))
    offs = series_df.sparkSession.createDataFrame(
        [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    nbr = ser.select("t", F.col("ix").alias("jx"),
                     F.col("iy").alias("jy"), F.col("x").alias("xj"))
    local = (ser.crossJoin(F.broadcast(offs))
                .withColumn("jx", F.col("ix") + F.col("dx"))
                .withColumn("jy", F.col("iy") + F.col("dy"))
                .join(nbr, ["t", "jx", "jy"])
                .groupBy("t", "ix", "iy")
                .agg(F.sum("xj").alias("ls"), F.count("*").alias("k")))
    j = local.join(F.broadcast(stats), "t")
    num = (F.col("_n") * F.col("ls") - F.col("_s") * F.col("k"))
    a = (F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s"))
    b = (F.col("_n") * F.col("k") - F.col("k") * F.col("k"))
    z = (num.cast("double")
         / F.sqrt(a.cast("double") * b.cast("double")
                  / (F.col("_n") - 1).cast("double")))
    # degenerate slice (all cells equal, a == 0) or single-cell slice
    # (b == 0) would yield 0/0 = NaN and poison downstream sign
    # comparisons: define z = 0 there, mirrored in the SQL twin
    z_safe = F.when((a > 0) & (b > 0), z).otherwise(F.lit(0.0))
    return j.select("t", "ix", "iy", z_safe.alias("gi_z"))


def emerging_hotspots(series_df: DataFrame, ix_col: str = "ix",
                      iy_col: str = "iy", t_col: str = "t",
                      x_col: str = "x", z_crit: float = 1.96) -> DataFrame:
    """Emerging Hot Spot Analysis — the space-time composition this
    tier is named for: each time slice gets its own Gi* surface
    (getis_ord_series), then every cell's Z SERIES is trend-tested with
    Mann-Kendall, and the (final state, trend) pair labels the cell:

      label = {hot|cold|neutral}_{intensifying|waning|static}

    (simplified deterministic taxonomy of the ESRI category set —
    'new/consecutive/sporadic' need run-length rules that are
    arbitrary; state x trend is the reproducible core).

    Hash-exactness: the Gi* doubles are fixed-order expressions, so
    their pairwise SIGN comparisons (MK S), tie groups, and the final
    label are engine-identical; mk_z is one fixed-order double.

    Shape at scale: the per-slice Gi* is co-partitioned equi-joins
    (slices never mix); the trend pass is ONE shuffle to group each
    cell's z series + in-row O(m^2) higher-order aggregates, m bounded
    by the calendar."""
    gz = getis_ord_series(series_df, ix_col, iy_col, t_col, x_col)
    arr = (gz.groupBy("ix", "iy")
             .agg(F.sort_array(F.collect_list(F.struct("t", "gi_z")))
                  .alias("ser")))
    s_expr = F.expr("""
        aggregate(sequence(0, size(ser) - 2), 0L, (acc, i) ->
          acc + aggregate(sequence(i + 1, size(ser) - 1), 0L, (a2, j) ->
            a2 + CAST(sign(ser[j].gi_z - ser[i].gi_z) AS LONG)))""")
    tie_expr = F.expr("""
        aggregate(ser, 0L, (acc, s) ->
          acc + CAST(
            (size(filter(ser, p -> p.gi_z = s.gi_z)) - 1)
            * (2 * size(filter(ser, p -> p.gi_z = s.gi_z)) + 5) AS LONG))""")
    base = arr.select(
        "ix", "iy",
        F.size("ser").cast("long").alias("m"),
        F.when(F.size("ser") >= 2, s_expr).otherwise(F.lit(0))
         .cast("long").alias("s_stat"),
        tie_expr.alias("tie_term"),
        F.element_at("ser", -1)["gi_z"].alias("last_z"))
    var_num = (F.col("m") * (F.col("m") - 1) * (2 * F.col("m") + 5)
               - F.col("tie_term"))
    mk_z = (F.when((var_num == 0) | (F.col("s_stat") == 0), F.lit(0.0))
             .when(F.col("s_stat") > 0,
                   (F.col("s_stat") - 1).cast("double")
                   / F.sqrt(var_num.cast("double") / 18.0))
             .otherwise((F.col("s_stat") + 1).cast("double")
                        / F.sqrt(var_num.cast("double") / 18.0)))
    state = (F.when(F.col("last_z") > z_crit, "hot")
              .when(F.col("last_z") < -z_crit, "cold")
              .otherwise("neutral"))
    trend = (F.when(F.col("_mk_z") > z_crit, "intensifying")
              .when(F.col("_mk_z") < -z_crit, "waning")
              .otherwise("static"))
    out = base.withColumn("var_num", var_num.cast("long")) \
              .withColumn("_mk_z", mk_z)
    return out.select("ix", "iy", "m", "s_stat", "var_num",
                      F.col("_mk_z").alias("mk_z"), "last_z",
                      F.concat(state, F.lit("_"), trend).alias("label"))


def hotspot_run_stats(series_df: DataFrame, ix_col: str = "ix",
                      iy_col: str = "iy", t_col: str = "t",
                      x_col: str = "x", z_crit: float = 1.96) -> DataFrame:
    """Run-length statistics of each cell's HOT state over time — the
    ingredient that upgrades emerging_hotspots' state x trend labels to
    the full published taxonomy (new / consecutive / sporadic hotspots
    are all run-length predicates): per cell, the number of hot
    observations, the trailing consecutive-hot streak (is it hot RIGHT
    NOW and since when), and the longest streak ever.

    Runs are counted over the OBSERVED slice sequence (rank order), so
    a cell absent from some slices has well-defined semantics in both
    engines.  All outputs are exact integers derived from the same
    fixed-order Gi* doubles as emerging_hotspots — hash-oracled.

    Shape at scale: getis_ord_series' co-partitioned joins + ONE
    shuffle to gather each cell's series; both streak folds run inside
    the row as higher-order aggregates."""
    gz = getis_ord_series(series_df, ix_col, iy_col, t_col, x_col)
    arr = (gz.groupBy("ix", "iy")
             .agg(F.sort_array(F.collect_list(F.struct("t", "gi_z")))
                  .alias("ser")))
    hots = f"transform(ser, s -> IF(s.gi_z > {z_crit!r}D, 1L, 0L))"
    n_hot = F.expr(f"aggregate({hots}, 0L, (a, x) -> a + x)")
    trailing = F.expr(f"""
        aggregate(reverse({hots}),
                  named_struct('run', 0L, 'stop', false),
                  (a, x) -> IF(a.stop OR x = 0L,
                               named_struct('run', a.run, 'stop', true),
                               named_struct('run', a.run + 1L,
                                            'stop', false))).run""")
    longest = F.expr(f"""
        aggregate({hots},
                  named_struct('cur', 0L, 'best', 0L),
                  (a, x) -> IF(x = 1L,
                               named_struct('cur', a.cur + 1L,
                                            'best', greatest(a.best,
                                                             a.cur + 1L)),
                               named_struct('cur', 0L,
                                            'best', a.best))).best""")
    return arr.select(
        "ix", "iy",
        F.size("ser").cast("long").alias("m"),
        n_hot.cast("long").alias("n_hot"),
        trailing.cast("long").alias("trailing_streak"),
        longest.cast("long").alias("longest_streak"))


def flow_path_length_grid(cells_df: DataFrame, ix_col: str = "ix",
                          iy_col: str = "iy", value_col: str = "v",
                          max_iters: int = 48) -> DataFrame:
    """Flow-path LENGTH per cell — the number of D8 hops from the cell
    to its terminal pit (0 for pits), i.e. the hydrologic distance
    surface that pairs with watershed_basins_grid's labels.

    Same pointer-doubling loop as the basin labeler, but the pointer
    table carries an accumulated hop count that ADDS under composition
    (d(x -> ptr2(x)) = d(x -> ptr(x)) + d(ptr(x) -> ptr2(x))), so the
    exact path length of 2^k-step walks is available after k rounds —
    O(log depth) n-row equi-joins, no pair table.  The DuckDB twin
    step-walks the same graph with a recursive CTE counter."""
    flow = d8_flow_grid(cells_df, ix_col, iy_col, value_col).persist()
    ptr = (flow.select(
        "ix", "iy",
        F.coalesce("to_ix", F.col("ix")).alias("px"),
        F.coalesce("to_iy", F.col("iy")).alias("py"),
        (F.col("flow_dir") > 0).cast("long").alias("d"),
        (F.col("flow_dir") == 0).alias("done"))).persist()
    for _ in range(max_iters):
        tgt = ptr.select(F.col("ix").alias("px"), F.col("iy").alias("py"),
                         F.col("px").alias("qx"), F.col("py").alias("qy"),
                         F.col("d").alias("d2"),
                         F.col("done").alias("p_done"))
        joined = ptr.join(tgt, ["px", "py"]).persist()
        unresolved = joined.filter(~F.col("p_done")).count()
        ptr2 = (joined.select("ix", "iy",
                              F.col("qx").alias("px"),
                              F.col("qy").alias("py"),
                              (F.col("d") + F.col("d2")).alias("d"),
                              "done")
                      .localCheckpoint())
        joined.unpersist()
        ptr.unpersist()
        ptr = ptr2.persist()
        if unresolved == 0:
            break
    out = flow.select("ix", "iy", "v").join(
        ptr.select("ix", "iy", F.col("d").alias("path_len")), ["ix", "iy"])
    out = out.select("ix", "iy", "v",
                     F.col("path_len").cast("long").alias("path_len")) \
             .localCheckpoint()
    flow.unpersist()
    ptr.unpersist()
    return out


def stream_order_shreve_grid(cells_df: DataFrame, ix_col: str = "ix",
                             iy_col: str = "iy", value_col: str = "v",
                             max_iters: int = 48) -> DataFrame:
    """Shreve stream magnitude per cell: the number of SOURCE cells
    (cells with no D8 inflow) whose drain path passes through the cell,
    counting the cell itself when it is a source — the link-magnitude
    ordering hydrologists pair with flow accumulation (reference scope:
    the dc_water/watershed analysis family).

    Shreve magnitude is ADDITIVE at confluences (unlike Strahler), so
    it falls out of the same path-doubling ancestor closure as
    flow_accumulation_grid restricted to source rows: O(log depth)
    shuffles, no step-by-step propagation.  Sources are found with one
    anti-join (no cell drains into them).  All-integer output."""
    flow = d8_flow_grid(cells_df, ix_col, iy_col, value_col).persist()
    inflow = (flow.filter(F.col("flow_dir") > 0)
                  .select(F.col("to_ix").alias("ix"),
                          F.col("to_iy").alias("iy")).distinct())
    sources = (flow.select("ix", "iy")
                   .join(inflow, ["ix", "iy"], "left_anti"))
    pairs = _d8_pair_closure(flow, max_iters)
    up = (pairs.join(sources.withColumnRenamed("ix", "sx")
                            .withColumnRenamed("iy", "sy"), ["sx", "sy"])
               .groupBy("tx", "ty").agg(F.count("*").alias("n_src")))
    out = (flow.join(up, (flow.ix == up.tx) & (flow.iy == up.ty), "left")
               .join(sources.withColumn("is_src", F.lit(1)), ["ix", "iy"],
                     "left")
               .select(flow.ix, flow.iy, flow.v,
                       (F.coalesce("n_src", F.lit(0))
                        + F.coalesce("is_src", F.lit(0))).cast("long")
                       .alias("shreve")))
    out = out.localCheckpoint()
    flow.unpersist()
    return out


def distance_transform_grid(cells_df: DataFrame, ix_col: str = "ix",
                            iy_col: str = "iy",
                            feature_col: str = "is_feat") -> DataFrame:
    """Exact Euclidean distance transform over a dense grid: for every
    cell, the SQUARED distance to the nearest feature cell (0 on
    features, NULL when the grid has no features) — the proximity
    raster behind buffering, coastal-distance and cost-surface seeding
    (reference scope: dc_coastal_change's shoreline-distance idiom).

    Separable two-pass form, everything exact int64:
      pass 1 (per COLUMN):  two ordered window scans (last feature row
        above / first below) give G(x,y) = min_y' (y-y')^2 over feature
        rows of column x — no UDF, two sorts within the column key;
      pass 2 (per ROW):  D(x,y) = min_x' [ G(x',y) + (x-x')^2 ] — the
        row's G vector is gathered once with collect_list and the
        min-plus fold runs INSIDE the row as a JVM higher-order
        aggregate (the repo's Mann-Kendall in-row pair-scan shape):
        O(W^2) work per row but zero Python and one shuffle on iy.
        (The Felzenszwalb lower-envelope O(W) kernel drops in here as
        an Arrow UDF if W^2 ever binds; grid width is the small axis
        of a tiled deployment, so the fold wins on simplicity.)
    Distances stay squared: sqrt is irrational, squared ints hash
    identically in every engine."""
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(feature_col).cast("boolean").alias("f"))
    wup = (Window.partitionBy("ix").orderBy("iy")
                 .rowsBetween(Window.unboundedPreceding, 0))
    wdn = (Window.partitionBy("ix").orderBy(F.desc("iy"))
                 .rowsBetween(Window.unboundedPreceding, 0))
    feat_iy = F.when(F.col("f"), F.col("iy"))
    up = F.max(feat_iy).over(wup)
    dn = F.min(feat_iy).over(wdn)
    gcol = (g.withColumn("gy", F.least(
                (F.col("iy") - up) * (F.col("iy") - up),
                (F.col("iy") - dn) * (F.col("iy") - dn))))
    rows = (gcol.filter(F.col("gy").isNotNull())
                .groupBy("iy")
                .agg(F.collect_list(F.struct("ix", "gy")).alias("gv")))
    pair = g.join(rows, ["iy"], "left")
    d2 = F.aggregate(
        "gv", F.lit(None).cast("long"),
        lambda acc, e: F.least(
            F.coalesce(acc, F.lit(2 ** 62)),
            e["gy"] + (e["ix"] - F.col("ix")) * (e["ix"] - F.col("ix"))))
    return pair.select("ix", "iy", d2.cast("long").alias("d2"))


def ripley_k_counts(points_df: DataFrame, radii: "Sequence[int]",
                    x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Ripley's K pair counts for a point pattern: for each radius r in
    `radii`, the number of ORDERED point pairs (i != j) with squared
    Euclidean distance <= r^2 — the numerator of K(r) = area/n^2 *
    sum_r; left exact-integer so any edge-correction/normalization can
    be applied downstream without re-scanning pairs.  The spatial-
    statistics completion of the repo's Moran/Gi*/semivariogram family
    (clustered vs dispersed at each scale).  The i != j guard is
    LOCATION-based: callers collapse coincident points upstream
    (distinct or weighted) — same convention as the semivariogram.

    Scale shape: NO cross join.  Points bucket into square cells of
    side max(radii); each point joins only its 3x3 neighbor buckets
    (broadcast 9-offset table), so pair work is bounded by local
    density times 9 buckets — the knn_cells/semivariogram shape.  One
    shuffle on the bucket key, one aggregate."""
    rmax = int(max(radii))
    p = points_df.select(F.col(x_col).cast("long").alias("x"),
                         F.col(y_col).cast("long").alias("y"))
    b = p.select("x", "y", (F.floor(F.col("x") / rmax)).alias("bx"),
                 (F.floor(F.col("y") / rmax)).alias("by"))
    offs = points_df.sparkSession.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long")
    probe = (b.crossJoin(F.broadcast(offs))
              .select("x", "y", (F.col("bx") + F.col("dx")).alias("bx"),
                      (F.col("by") + F.col("dy")).alias("by")))
    other = b.select(F.col("x").alias("ox"), F.col("y").alias("oy"),
                     "bx", "by")
    dd = ((F.col("x") - F.col("ox")) * (F.col("x") - F.col("ox"))
          + (F.col("y") - F.col("oy")) * (F.col("y") - F.col("oy")))
    pairs = (probe.join(other, ["bx", "by"])
                  .filter(((F.col("x") != F.col("ox"))
                           | (F.col("y") != F.col("oy")))
                          & (dd <= rmax * rmax))
                  .select(dd.alias("d2")))
    agg = [F.sum((F.col("d2") <= r * r).cast("long")).alias(f"k_{r}")
           for r in sorted(set(int(r) for r in radii))]
    return pairs.agg(*agg)


def knox_pair_counts(points_df: DataFrame, r_space: int, r_time: int,
                     x_col: str = "x", y_col: str = "y",
                     t_col: str = "t") -> DataFrame:
    """Knox space-time interaction statistic over an event point set:
    counts of ORDERED event pairs that are close in SPACE (squared
    Euclidean distance <= r_space^2), close in TIME (|dt| <= r_time),
    and close in BOTH — the 'both' count is the Knox X whose excess over
    n_s * n_t / n_pairs signals space-time clustering (disease
    surveillance / change-event forensics; the space-time companion of
    ripley_k_counts).  All counts exact int64; the i != j guard is
    location-time based, so callers collapse exact duplicates upstream.

    Scale shape: NO cross join anywhere.  Space-close pairs come from
    the 3x3 max-radius bucket join (knn_cells shape); the both-count is
    a FILTER on those pairs (both-close implies space-close, so no
    second spatial pass); time-close pairs come from an independent
    1-D time-bucket join probing 3 windows.  Two bounded shuffles.
    The time join's per-bucket mass is n*r_time/T_span — every
    time-close pair IS part of the answer, so that cardinality is the
    statistic's own size, not overhead; at extreme mass, salt the time
    buckets with a spatial digit before the join."""
    p = points_df.select(F.col(x_col).cast("long").alias("x"),
                         F.col(y_col).cast("long").alias("y"),
                         F.col(t_col).cast("long").alias("t"))
    neq = ((F.col("x") != F.col("ox")) | (F.col("y") != F.col("oy"))
           | (F.col("t") != F.col("ot")))
    d2 = ((F.col("x") - F.col("ox")) * (F.col("x") - F.col("ox"))
          + (F.col("y") - F.col("oy")) * (F.col("y") - F.col("oy")))
    dt = F.abs(F.col("t") - F.col("ot"))
    spark = points_df.sparkSession

    sb = p.select("x", "y", "t", F.floor(F.col("x") / r_space).alias("bx"),
                  F.floor(F.col("y") / r_space).alias("by"))
    offs9 = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
        "dx long, dy long")
    probe = (sb.crossJoin(F.broadcast(offs9))
               .select("x", "y", "t", (F.col("bx") + F.col("dx")).alias("bx"),
                       (F.col("by") + F.col("dy")).alias("by")))
    other = sb.select(F.col("x").alias("ox"), F.col("y").alias("oy"),
                      F.col("t").alias("ot"), "bx", "by")
    sp = (probe.join(other, ["bx", "by"])
               .filter(neq & (d2 <= r_space * r_space))
               .select(dt.alias("adt")))
    space_agg = sp.agg(
        F.count("*").cast("long").alias("pairs_space"),
        F.sum((F.col("adt") <= r_time).cast("long")).alias("pairs_both"))

    tb = p.select("x", "y", "t", F.floor(F.col("t") / r_time).alias("bt"))
    offs3 = spark.createDataFrame([(-1,), (0,), (1,)], "dt long")
    tprobe = (tb.crossJoin(F.broadcast(offs3))
                .select("x", "y", "t", (F.col("bt") + F.col("dt")).alias("bt")))
    tother = tb.select(F.col("x").alias("ox"), F.col("y").alias("oy"),
                       F.col("t").alias("ot"), "bt")
    time_agg = (tprobe.join(tother, ["bt"])
                      .filter(neq & (dt <= r_time))
                      .agg(F.count("*").cast("long").alias("pairs_time")))

    n = p.agg(F.count("*").cast("long").alias("n_points"))
    return (n.crossJoin(space_agg).crossJoin(time_agg)
             .select("n_points", "pairs_space", "pairs_time",
                     F.col("pairs_both").cast("long").alias("pairs_both")))


def cost_distance_grid(cells_df: DataFrame, ix_col: str = "ix",
                       iy_col: str = "iy", cost_col: str = "cost",
                       source_col: str = "is_source",
                       max_rounds: int = 64,
                       to_fixpoint: bool = True) -> DataFrame:
    """Accumulated-cost distance over a cost raster (the cost-surface
    companion of distance_transform_grid): acc(source) = 0 and
    acc(v) = min over 4-neighbors u of acc(u) + cost(v) — entering a
    cell pays that cell's integer cost.  Exact int64 throughout, so
    results hash identically on any engine.  Unreached cells are
    omitted (the relational convention for +inf).

    Spark-first shape: Bellman-Ford relaxation — each round joins the
    frontier to its 4 neighbors (broadcast offset explode + equi-join
    on the grid key) and min-folds into the running table; lineage is
    truncated by localCheckpoint every few rounds.  Round count is the
    hop count of the longest optimal path, NOT the cell count — bounded
    by the grid diameter, and each round is one bounded shuffle (the
    watershed/pointer-doubling family's shape).  With
    to_fixpoint=False, stops after EXACTLY max_rounds relaxations =
    min cost over paths of <= max_rounds hops — the hop-bounded
    configuration whose unrolled-SQL twin is a true hash oracle (the
    ivf_ann_exact trick); full runs converge-check each round."""
    spark = cells_df.sparkSession
    g = (cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                         F.col(iy_col).cast("long").alias("iy"),
                         F.col(cost_col).cast("long").alias("cost"),
                         F.col(source_col).cast("boolean").alias("src"))
         .persist())
    offs = spark.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    nbr = g.select(F.col("ix").alias("nx"), F.col("iy").alias("ny"),
                   "cost")
    dist = (g.filter("src")
             .select("ix", "iy", F.lit(0).cast("long").alias("d"))
             .localCheckpoint())
    for rnd in range(max_rounds):
        cand = (dist.crossJoin(F.broadcast(offs))
                    .select((F.col("ix") + F.col("dx")).alias("nx"),
                            (F.col("iy") + F.col("dy")).alias("ny"), "d")
                    .join(nbr, ["nx", "ny"])
                    .select(F.col("nx").alias("ix"),
                            F.col("ny").alias("iy"),
                            (F.col("d") + F.col("cost")).alias("d")))
        new = (dist.unionByName(cand)
                   .groupBy("ix", "iy").agg(F.min("d").alias("d"))
                   .localCheckpoint())
        if to_fixpoint:
            improved = (new.join(dist.withColumnRenamed("d", "od"),
                                 ["ix", "iy"], "left")
                           .filter(F.col("od").isNull()
                                   | (F.col("d") < F.col("od")))
                           .limit(1).count())
            dist = new
            if improved == 0:
                break
        else:
            dist = new
    g.unpersist()
    return dist.select("ix", "iy", F.col("d").cast("long").alias("acc"))


def viewshed_grid(cells_df: DataFrame, observer: "tuple[int, int]",
                  observer_height: int = 0, ix_col: str = "ix",
                  iy_col: str = "iy", elev_col: str = "elev",
                  max_k: int = 4096) -> DataFrame:
    """DEM viewshed: which grid cells are visible from the observer?
    A target is visible iff no intermediate sample along the sight
    line rises above the observer->target sightline.  Samples step the
    DOMINANT axis one cell at a time (K = chebyshev distance), the
    minor coordinate is the exact rational o + k*d/K with elevation
    LINEARLY interpolated between the two straddling cells — and every
    comparison is cross-multiplied by K, so the whole test is exact
    int64 with NO rounding/float call anywhere:
      blocked(k) <=> e_lo*(K - rem) + e_hi*rem > (e_obs + h)*K
                      + (e_tgt - e_obs - h)*k,  rem = k*d_minor mod K.
    Missing interpolation cells count as blocking (conservative off-DEM
    rule).  DENSE-GRID expectation as the SAT family.

    Shape at scale: ray samples come from ONE explode of
    sequence(1, K-1) per target (fan-out = cells x chebyshev radius,
    the R3 viewshed's intrinsic size) followed by two elevation
    equi-joins and a per-target count — no cartesian, no Python.  At
    continental scale, run per-tile with an observer-radius bound
    (max_k caps the explode)."""
    ox, oy = int(observer[0]), int(observer[1])
    g = (cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                         F.col(iy_col).cast("long").alias("iy"),
                         F.col(elev_col).cast("long").alias("elev"))
         .persist())
    eo = (g.filter((F.col("ix") == ox) & (F.col("iy") == oy))
           .select((F.col("elev") + observer_height).alias("e_obs")))
    t = (g.crossJoin(F.broadcast(eo))
          .withColumn("dx", F.col("ix") - ox)
          .withColumn("dy", F.col("iy") - oy)
          .withColumn("kk", F.greatest(F.abs("dx"), F.abs("dy"))))
    far = t.filter(F.col("kk") >= 2).filter(F.col("kk") <= max_k)
    sgn = lambda c: (F.when(F.col(c) > 0, 1)
                      .when(F.col(c) < 0, -1).otherwise(0))
    s = (far.select("ix", "iy", "elev", "e_obs", "dx", "dy", "kk",
                    F.explode(F.sequence(F.lit(1),
                                         F.col("kk") - 1)).alias("k")))
    xdom = F.abs(F.col("dx")) >= F.abs(F.col("dy"))
    num = F.when(xdom, F.col("k") * F.col("dy")) \
           .otherwise(F.col("k") * F.col("dx"))
    s = s.withColumn("num", num.cast("long"))
    rem = ((F.col("num") % F.col("kk")) + F.col("kk")) % F.col("kk")
    s = s.withColumn("rem", rem.cast("long"))
    # exact: kk divides num - rem, so integer div loses nothing
    mlo = F.expr("(num - rem) div kk")
    s = (s
          .withColumn("maj_x", F.when(xdom, ox + F.col("k") * sgn("dx")))
          .withColumn("maj_y", F.when(~xdom, oy + F.col("k") * sgn("dy")))
          .withColumn("lo_x", F.when(xdom, F.col("maj_x"))
                               .otherwise((ox + mlo).cast("long")))
          .withColumn("lo_y", F.when(xdom, (oy + mlo).cast("long"))
                               .otherwise(F.col("maj_y")))
          .withColumn("hi_x", F.when(xdom, F.col("lo_x"))
                               .otherwise(F.col("lo_x") + 1))
          .withColumn("hi_y", F.when(xdom, F.col("lo_y") + 1)
                               .otherwise(F.col("lo_y"))))
    elo = g.select(F.col("ix").alias("lo_x"), F.col("iy").alias("lo_y"),
                   F.col("elev").alias("e_lo"))
    ehi = g.select(F.col("ix").alias("hi_x"), F.col("iy").alias("hi_y"),
                   F.col("elev").alias("e_hi"))
    s = (s.join(elo, ["lo_x", "lo_y"], "left")
          .join(ehi, ["hi_x", "hi_y"], "left"))
    ray_e = (F.coalesce("e_lo", F.lit(1 << 40)) * (F.col("kk") - F.col("rem"))
             + F.when(F.col("rem") > 0,
                      F.coalesce("e_hi", F.lit(1 << 40)) * F.col("rem"))
                .otherwise(F.lit(0)))
    sight = (F.col("e_obs") * F.col("kk")
             + (F.col("elev") - F.col("e_obs")) * F.col("k"))
    blocked = (s.withColumn("blk", (ray_e > sight).cast("long"))
                .groupBy("ix", "iy")
                .agg(F.sum("blk").cast("long").alias("n_block")))
    out = (t.select("ix", "iy", "kk")
            .join(blocked, ["ix", "iy"], "left")
            .select("ix", "iy",
                    F.coalesce("n_block", F.lit(0)).cast("long")
                     .alias("n_block"))
            .withColumn("visible", F.col("n_block") == 0)
            .drop("kk"))
    out = out.localCheckpoint()
    g.unpersist()
    return out


def polygon_metrics(vertices: DataFrame, poly_col: str = "poly_id",
                    seq_col: str = "seq", x_col: str = "x",
                    y_col: str = "y") -> DataFrame:
    """Shoelace geometry over a long-form polygon VERTEX table (one row
    per ring vertex, seq = ring order, ring implicitly closed): per
    polygon — 2*signed_area, the 6*area-scaled centroid numerators, the
    sum of squared edge lengths and the vertex/bbox summary, all exact
    int64 (integer-grid coordinates; scaled forms instead of divided
    floats so results hash identically on any engine):
      area2  = sum(x_i*y_j - x_j*y_i),      j = i+1 cyclic
      cx6a   = sum((x_i + x_j) * cross_i),  cy6a likewise
      centroid = (cx6a / (3*area2), cy6a / (3*area2)) downstream.
    Positive area2 = counter-clockwise ring — the winding test is free.

    Shape at scale: ONE lead() window per polygon (tiny partitions) with
    the wrap edge closed by first_value — no join, no UDF; one shuffle
    on poly_id.  The vector-side complement of region_geometry_long
    (raster perimeter/bbox) and the metric feed for polygonize
    consumers (reference: vectorize/xr_vectorize's shapely .area/.length
    reads)."""
    w = Window.partitionBy("pid").orderBy("seq")
    tot = (Window.partitionBy("pid")
                 .orderBy("seq")
                 .rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing))
    v = vertices.select(F.col(poly_col).alias("pid"),
                        F.col(seq_col).cast("long").alias("seq"),
                        F.col(x_col).cast("long").alias("x"),
                        F.col(y_col).cast("long").alias("y"))
    e = (v.withColumn("nx", F.coalesce(F.lead("x").over(w),
                                       F.first("x").over(tot)))
          .withColumn("ny", F.coalesce(F.lead("y").over(w),
                                       F.first("y").over(tot))))
    cross = F.col("x") * F.col("ny") - F.col("nx") * F.col("y")
    d2 = ((F.col("nx") - F.col("x")) * (F.col("nx") - F.col("x"))
          + (F.col("ny") - F.col("y")) * (F.col("ny") - F.col("y")))
    return (e.groupBy("pid").agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.sum(cross).cast("long").alias("area2"),
        F.sum((F.col("x") + F.col("nx")) * cross).cast("long")
         .alias("cx6a"),
        F.sum((F.col("y") + F.col("ny")) * cross).cast("long")
         .alias("cy6a"),
        F.sum(d2).cast("long").alias("perim2_sum"),
        F.min("x").cast("long").alias("min_x"),
        F.min("y").cast("long").alias("min_y"),
        F.max("x").cast("long").alias("max_x"),
        F.max("y").cast("long").alias("max_y")))


def od_matrix(points: DataFrame, user_col: str = "user_id",
              order_col: str = "ts", cell_col: str = "cell",
              tiebreak_col: str | None = None,
              include_self: bool = False) -> DataFrame:
    """Origin-destination flow matrix over a trajectory point table:
    per entity, order the pings and count each consecutive cell->cell
    transition — the aggregate every mobility / movement-analytics
    pipeline starts from.  include_self keeps dwell transitions
    (from == to).  Pass tiebreak_col for a total order when order_col
    can tie (determinism is on the caller).

    Shape at scale: ONE lag() window partitioned by entity (trajectory
    partitions are naturally small) + one groupBy on the (from, to)
    pair — two bounded shuffles, no join, no UDF."""
    order = [F.col(order_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy("uid").orderBy(*order)
    p = points.select(F.col(user_col).alias("uid"),
                      *[F.col(c) for c in
                        dict.fromkeys([order_col] +
                                      ([tiebreak_col] if tiebreak_col
                                       else []))],
                      F.col(cell_col).alias("to_cell"))
    t = (p.withColumn("from_cell", F.lag("to_cell").over(w))
          .filter(F.col("from_cell").isNotNull()))
    if not include_self:
        t = t.filter(F.col("from_cell") != F.col("to_cell"))
    return (t.groupBy("from_cell", "to_cell")
             .agg(F.count("*").cast("long").alias("n_trips"),
                  F.countDistinct("uid").cast("long").alias("n_users")))


def stay_points(points: DataFrame, min_pings: int = 2,
                user_col: str = "user_id", ts_col: str = "ts",
                cell_col: str = "cell",
                tiebreak_col: str | None = None) -> DataFrame:
    """Stay-point detection: maximal runs of consecutive SAME-cell pings
    per entity (gaps-and-islands: run = row_number difference of the
    global and per-cell orderings), keeping runs of >= min_pings —
    where the entity stopped, for how long, with how many pings.  Exact
    output: (uid, cell, enter_ts, exit_ts, n_pings, dwell_sec).

    Shape at scale: two window ranks over the same (uid, ts) sort (one
    partition pass — Spark reuses the sort), one groupBy on the run
    key.  No join, no UDF."""
    order = [F.col(ts_col).asc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    wa = Window.partitionBy("uid").orderBy(*order)
    wc = Window.partitionBy("uid", "cell").orderBy(*order)
    p = points.select(F.col(user_col).alias("uid"),
                      F.col(ts_col).alias("ts"),
                      *([F.col(tiebreak_col)] if tiebreak_col else []),
                      F.col(cell_col).alias("cell"))
    r = (p.withColumn("_ra", F.row_number().over(wa))
          .withColumn("_rc", F.row_number().over(wc))
          .withColumn("_run", F.col("_ra") - F.col("_rc")))
    return (r.groupBy("uid", "cell", "_run")
             .agg(F.min("ts").alias("enter_ts"),
                  F.max("ts").alias("exit_ts"),
                  F.count("*").cast("long").alias("n_pings"))
             .filter(F.col("n_pings") >= min_pings)
             .withColumn("dwell_sec",
                         (F.unix_timestamp("exit_ts")
                          - F.unix_timestamp("enter_ts")).cast("long"))
             .drop("_run"))


# ---------------------------------------------------------------------------
# density clustering (DBSCAN) over integer point clouds
# ---------------------------------------------------------------------------

def dbscan_points(points: DataFrame, eps: int, min_pts: int,
                  id_col: str = "pid", x_col: str = "x", y_col: str = "y",
                  max_iters: int = 32) -> DataFrame:
    """DBSCAN over an integer point cloud — the density clusterer for
    acquisition footprints / hotspot discovery (the unsupervised
    companion to the kNN / Getis-Ord family; reference fan-out shape:
    dc_clustering.py's per-scene cluster labeling).

    Semantics (classic DBSCAN, deterministic variant):
      * neighbor = squared Euclidean distance <= eps^2 (self included);
      * core point = >= min_pts neighbors;
      * clusters = connected components of the core-core neighbor
        graph, labeled by the MINIMUM core id in the component (so
        labels are reproducible under any execution order — no
        first-scan nondeterminism);
      * border point (non-core with a core neighbor) joins the cluster
        of the smallest label among its core neighbors; everything
        else is noise (cluster = -1).

    Scale shape: candidate pairs come from a GRID-BUCKET equi-join
    (cell = eps, 3x3 neighborhood exploded on one side — never
    all-pairs); components resolve by min-label propagation PLUS
    pointer jumping (label <- label(label)) per round, so chains
    collapse in O(log diameter) n-row joins, the watershed pointer-
    doubling shape.  Integer coordinates keep every comparison exact —
    the DuckDB oracle walks the same edges with a recursive CTE."""
    p = points.select(F.col(id_col).cast("long").alias("pid"),
                      F.col(x_col).cast("long").alias("x"),
                      F.col(y_col).cast("long").alias("y"))
    bx = F.floor(F.col("x") / eps)
    by = F.floor(F.col("y") / eps)
    a = p.select("pid", "x", "y", bx.alias("bx"), by.alias("by"))
    probe = (a.select("pid", "x", "y",
                      F.explode(F.array(*[
                          F.struct((F.col("bx") + dx).alias("nbx"),
                                   (F.col("by") + dy).alias("nby"))
                          for dx in (-1, 0, 1) for dy in (-1, 0, 1)]))
                      .alias("o"))
              .select("pid", "x", "y", F.col("o.nbx").alias("bx"),
                      F.col("o.nby").alias("by")))
    b = a.select(F.col("pid").alias("qid"), F.col("x").alias("qx"),
                 F.col("y").alias("qy"), "bx", "by")
    d2 = ((F.col("x") - F.col("qx")) * (F.col("x") - F.col("qx"))
          + (F.col("y") - F.col("qy")) * (F.col("y") - F.col("qy")))
    pairs = (probe.join(b, ["bx", "by"])
                  .filter(d2 <= F.lit(eps * eps))
                  .select("pid", "qid").persist())
    counts = pairs.groupBy("pid").agg(F.count("*").alias("n_nbr"))
    core = counts.filter(F.col("n_nbr") >= min_pts).select("pid")
    edges = (pairs.join(core.withColumnRenamed("pid", "qid"), "qid")
                  .join(core, "pid").select("pid", "qid"))
    lbl = core.select("pid", F.col("pid").alias("lbl")).persist()
    for _ in range(max_iters):
        nb_min = (edges.join(lbl.withColumnRenamed("pid", "qid")
                                .withColumnRenamed("lbl", "qlbl"), "qid")
                       .groupBy("pid").agg(F.min("qlbl").alias("nb_lbl")))
        stepped = (lbl.join(nb_min, "pid", "left")
                      .select("pid", F.least(
                          "lbl", F.coalesce("nb_lbl", "lbl")).alias("lbl")))
        # pointer jump: label <- label's label (labels are core pids)
        jump = stepped.select(F.col("pid").alias("lbl"),
                              F.col("lbl").alias("jlbl"))
        nxt = (stepped.join(jump, "lbl")
                      .select("pid", F.col("jlbl").alias("lbl"))
                      .localCheckpoint())
        changed = (nxt.withColumnRenamed("lbl", "nlbl").join(lbl, "pid")
                      .filter(F.col("nlbl") != F.col("lbl")).count())
        lbl.unpersist()
        lbl = nxt.persist()
        if changed == 0:
            break
    border = (pairs.join(core, "pid", "left_anti")
                   .join(lbl.withColumnRenamed("pid", "qid")
                            .withColumnRenamed("lbl", "qlbl"), "qid")
                   .groupBy("pid").agg(F.min("qlbl").alias("blbl")))
    out = (p.join(lbl, "pid", "left")
            .join(border, "pid", "left")
            .select("pid", "x", "y",
                    F.col("lbl").isNotNull().alias("is_core"),
                    F.coalesce("lbl", "blbl", F.lit(-1)).cast("long")
                     .alias("cluster")))
    res = out.localCheckpoint()
    pairs.unpersist()
    lbl.unpersist()
    return res


# ---------------------------------------------------------------------------
# convex hull per group (two-stage salted monotone chain)
# ---------------------------------------------------------------------------

def _hull_chain_np(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Andrew monotone chain with STRICT turns (collinear points on the
    boundary are dropped): returns indices of hull vertices in CCW
    order (y-up convention), starting from the lexicographically
    smallest point.  numpy sort + Python stack over the sorted run —
    the per-group candidate sets this sees are hull-sized, not
    input-sized."""
    order = np.lexsort((ys, xs))
    px, py = xs[order], ys[order]

    def half(idx):
        st = []
        for j in idx:
            while len(st) >= 2:
                ax, ay = px[st[-2]], py[st[-2]]
                bx, by = px[st[-1]], py[st[-1]]
                if (bx - ax) * (py[j] - ay) - (by - ay) * (px[j] - ax) <= 0:
                    st.pop()
                else:
                    break
            st.append(j)
        return st

    n = len(px)
    if n <= 2:
        return order[list(range(n))]
    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return order[np.array(lower[:-1] + upper[:-1], dtype=np.int64)]


def convex_hull_edges(points: DataFrame, group_col: str = "gid",
                      x_col: str = "x", y_col: str = "y",
                      n_salt: int = 16) -> DataFrame:
    """Per-group convex hull, emitted as DIRECTED CCW edges
    (gid, ax, ay, bx, by) — the footprint/extent summarizer for scene
    groups (reference shape: get_product_extents' bounding geometry,
    upgraded from bbox to true hull).

    TWO-STAGE SALTED REDUCTION (hull(S) = hull(hull(S_1) u ... u
    hull(S_k))): stage 1 computes a partial hull per (group, salt)
    partition with an Arrow-batched monotone chain, shrinking each
    group to O(k * hull_size) candidates; stage 2 chains the candidates
    per group.  A 10^9-point group therefore never gathers — only its
    partial hulls do.  STRICT turns: boundary-collinear points are not
    vertices, so with inputs in general position the edge set equals
    the all-points-strictly-left SQL characterization (the oracle)."""
    sel = [F.col(group_col).alias("gid"),
           F.col(x_col).cast("long").alias("x"),
           F.col(y_col).cast("long").alias("y")]
    p = points.select(*sel)
    salted = p.withColumn(
        "_salt", (F.xxhash64("x", "y") % n_salt + n_salt) % n_salt)

    def chain(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["x"].to_numpy(np.int64)
        ys = pdf["y"].to_numpy(np.int64)
        keep = _hull_chain_np(xs, ys)
        return pd.DataFrame({
            "gid": np.repeat(pdf["gid"].iloc[0], len(keep)),
            "x": xs[keep], "y": ys[keep]})

    part = (salted.groupBy("gid", "_salt")
                  .applyInPandas(chain, "gid long, x long, y long"))

    def chain_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        xs = pdf["x"].to_numpy(np.int64)
        ys = pdf["y"].to_numpy(np.int64)
        keep = _hull_chain_np(xs, ys)
        if len(keep) < 3:   # degenerate group: no strict hull edges
            z = np.array([], dtype=np.int64)
            return pd.DataFrame(
                {"gid": z, "ax": z, "ay": z, "bx": z, "by": z})
        hx, hy = xs[keep], ys[keep]
        nxt = np.roll(np.arange(len(keep)), -1)
        return pd.DataFrame({
            "gid": np.repeat(pdf["gid"].iloc[0], len(keep)),
            "ax": hx, "ay": hy, "bx": hx[nxt], "by": hy[nxt]})

    return (part.groupBy("gid")
                .applyInPandas(chain_edges,
                               "gid long, ax long, ay long, "
                               "bx long, by long"))


# ---------------------------------------------------------------------------
# skyline / Pareto front (2-criteria dominance)
# ---------------------------------------------------------------------------

def _skyline_mask_np(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2D skyline: row p survives iff no q has
    (q.lo <= p.lo AND q.hi >= p.hi) with strict inequality somewhere.
    Exact O(n log n) sweep: sort by lo, take the running max of hi over
    strictly-cheaper prefixes and the max within the same-lo group —
    ties (duplicate points) are both kept, matching SQL NOT EXISTS
    strict-dominance semantics."""
    lo = np.asarray(lo, dtype=np.float64)
    hi = np.asarray(hi, dtype=np.float64)
    order = np.argsort(lo, kind="stable")
    slo, shi = lo[order], hi[order]
    # group boundaries of equal lo values
    new_grp = np.empty(len(slo), dtype=bool)
    new_grp[0] = True
    new_grp[1:] = slo[1:] != slo[:-1]
    gid = np.cumsum(new_grp) - 1
    n_grp = gid[-1] + 1 if len(gid) else 0
    grp_max = np.full(n_grp, -np.inf)
    np.maximum.at(grp_max, gid, shi)
    prev_cummax = np.full(n_grp, -np.inf)
    if n_grp > 1:
        prev_cummax[1:] = np.maximum.accumulate(grp_max)[:-1]
    dominated = (prev_cummax[gid] >= shi) | (grp_max[gid] > shi)
    keep = np.empty(len(lo), dtype=bool)
    keep[order] = ~dominated
    return keep


def skyline_2d(df: DataFrame, minimize: str, maximize: str) -> DataFrame:
    """Pareto front under (minimize col, maximize col) strict dominance —
    the multi-criteria selector (cheapest-vs-largest part, clearest-vs-
    newest scene).  TWO-STAGE: a per-partition exact sweep via
    mapInPandas shrinks each partition to its local skyline (a point
    undominated globally is undominated locally, so no survivor is
    lost), then the union of local skylines — O(partitions x skyline
    size), typically tiny — reduces on a single partition with the same
    sweep.  Neither stage materializes a pair join; the oracle is the
    O(n^2) NOT EXISTS form."""
    cols = df.columns

    def sweep(it):
        for pdf in it:
            if len(pdf):
                yield pdf[_skyline_mask_np(pdf[minimize].to_numpy(),
                                           pdf[maximize].to_numpy())]

    schema = df.schema
    local = df.mapInPandas(sweep, schema)
    return local.coalesce(1).mapInPandas(sweep, schema).select(*cols)


def mask_distance_stats(cells_df: DataFrame, ix_col: str = "ix",
                        iy_col: str = "iy", a_col: str = "in_a",
                        b_col: str = "in_b") -> DataFrame:
    """Hausdorff / Chamfer distances between two masks on one grid —
    the shape-change scalar pair for repeat imagery (how far did the
    shoreline / burn scar / water mask move between epochs), the
    aggregate companion to the per-pixel coastal_change rasters.

    Both directed distance fields come from the repo's exact separable
    EDT (distance_transform_grid), evaluated AT the other mask's cells:
      d2(a -> B) for every a in A,  d2(b -> A) for every b in B
    then one global aggregate:
      hausdorff_d2 = max(max_a d2(a->B), max_b d2(b->A))   (symmetric)
      chamfer_ab / chamfer_ba = sum of directed squared distances
    Distances stay SQUARED ints (sqrt is irrational; callers compare
    d2 against r^2).  Empty masks yield NULL directed values and a
    NULL hausdorff, never a fake zero.

    Shape: two EDT passes (each: two in-column window scans + one
    in-row min-plus fold) + two semi-join samples + one single-row
    aggregate — no cross join; the brute oracle is O(|A|*|B|) but this
    plan is O(grid) regardless of mask sizes."""
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(a_col).cast("boolean").alias("a"),
                        F.col(b_col).cast("boolean").alias("b"))
    edt_b = distance_transform_grid(g, "ix", "iy", "b")
    edt_a = distance_transform_grid(g, "ix", "iy", "a")
    da = (g.filter("a").join(edt_b, ["ix", "iy"])
           .agg(F.max("d2").alias("h_ab"),
                F.sum("d2").alias("chamfer_ab"),
                F.count("*").alias("n_a")))
    db = (g.filter("b").join(edt_a, ["ix", "iy"])
           .agg(F.max("d2").alias("h_ba"),
                F.sum("d2").alias("chamfer_ba"),
                F.count("*").alias("n_b")))
    # greatest() skips NULLs, but one empty side must mean NULL, not
    # "the other side's max"
    haus = F.when(F.col("h_ab").isNull() | F.col("h_ba").isNull(),
                  F.lit(None).cast("long")) \
            .otherwise(F.greatest("h_ab", "h_ba"))
    return (da.crossJoin(db)
              .select(haus.alias("hausdorff_d2"),
                      "h_ab", "h_ba", "chamfer_ab", "chamfer_ba",
                      F.col("n_a").cast("long").alias("n_a"),
                      F.col("n_b").cast("long").alias("n_b")))


def kde_surface(points_df: DataFrame, radius: int = 3,
                x_col: str = "x", y_col: str = "y") -> DataFrame:
    """Kernel-density heatmap over an integer cell grid — the
    hotspot-surface companion to getis_ord (which tests significance;
    this renders intensity): density(c) = sum over points within
    `radius` of (radius^2 + 1 - d^2), the Epanechnikov parabola
    quantized to EXACT integers (the +1 keeps the rim weight positive
    so support is the full closed disk).

    Because points snap to cells first, the kernel depends only on the
    cell offset: one per-cell count, one explode of the fixed
    disk-offset table (|offsets| = ~pi*r^2, a literal array — never a
    shuffle), one sum onto the target cell.  Output rows only where
    density > 0; the empty grid is implicit (a dense raster would
    materialize mostly zeros at 100 TB for nothing).  n_points carries
    the raw per-cell count so callers can separate mass from spread."""
    offs = [(dx, dy, radius * radius + 1 - dx * dx - dy * dy)
            for dx in range(-radius, radius + 1)
            for dy in range(-radius, radius + 1)
            if dx * dx + dy * dy <= radius * radius]
    counts = (points_df.select(F.col(x_col).cast("long").alias("x"),
                               F.col(y_col).cast("long").alias("y"))
                       .groupBy("x", "y")
                       .agg(F.count("*").alias("c")))
    fan = counts.select(
        "c", F.explode(F.array(*[
            F.struct((F.col("x") + dx).alias("cx"),
                     (F.col("y") + dy).alias("cy"),
                     F.lit(w).alias("w"))
            for dx, dy, w in offs])).alias("o"))
    return (fan.groupBy(F.col("o.cx").alias("cx"),
                        F.col("o.cy").alias("cy"))
               .agg(F.sum(F.col("c") * F.col("o.w"))
                     .cast("long").alias("density"),
                    F.sum(F.when(F.col("o.w") == radius * radius + 1,
                                 F.col("c")).otherwise(0))
                     .cast("long").alias("n_points")))


def map_match(points_df: DataFrame, segments_df: DataFrame,
              pt_id_col: str = "pt_id", x_col: str = "x",
              y_col: str = "y") -> DataFrame:
    """Snap every point to its nearest line segment — the map-matching
    primitive (GPS pings onto a road network, sample sites onto a
    transect/coastline).  segments_df: (seg_id, x1, y1, x2, y2),
    integer endpoints.

    Point-to-segment squared distance is a RATIONAL: with L2 = |AB|^2
    and dot = AP.AB,
      dot <= 0   ->  |AP|^2            (denominator 1)
      dot >= L2  ->  |BP|^2            (denominator 1)
      else       ->  (|AP|^2 * L2 - dot^2) / L2
    Comparing raw doubles across segments would be summation-free but
    rounding-dependent; instead each candidate scores
    score = (num * 2^20) DIV den — one integer division both engines
    compute identically — and the argmin takes the lexicographic min
    of (score, seg_id), so the chosen segment is deterministic and
    hash-stable even between near-equidistant segments (ties at 2^-20
    resolution break by seg_id; exactness of the DISTANCE VALUE is
    preserved separately in num/den).

    Shape: the network broadcasts (road graphs are MBs where pings are
    TBs); per-point work is |segments| comparisons map-side, then one
    groupBy argmin on pt_id.  For networks too big to broadcast,
    pre-bucket both sides by cell (the knn_cells shape) and reuse this
    scorer on the bucketed candidates."""
    p = points_df.select(F.col(pt_id_col).alias("pt_id"),
                         F.col(x_col).cast("long").alias("px"),
                         F.col(y_col).cast("long").alias("py"))
    s = segments_df.select(
        "seg_id", F.col("x1").cast("long"), F.col("y1").cast("long"),
        F.col("x2").cast("long"), F.col("y2").cast("long"))
    j = p.join(F.broadcast(s))
    abx, aby = F.col("x2") - F.col("x1"), F.col("y2") - F.col("y1")
    apx, apy = F.col("px") - F.col("x1"), F.col("py") - F.col("y1")
    bpx, bpy = F.col("px") - F.col("x2"), F.col("py") - F.col("y2")
    l2 = abx * abx + aby * aby
    dot = apx * abx + apy * aby
    ap2 = apx * apx + apy * apy
    bp2 = bpx * bpx + bpy * bpy
    num = (F.when(dot <= 0, ap2)
            .when(dot >= l2, bp2)
            .otherwise(ap2 * l2 - dot * dot))
    den = F.when((dot <= 0) | (dot >= l2), F.lit(1)).otherwise(l2)
    scored = j.select(
        "pt_id", "seg_id", num.cast("long").alias("num"),
        den.cast("long").alias("den"))
    best = (scored.withColumn("score", F.expr("(num * 1048576) DIV den"))
                  .groupBy("pt_id")
                  .agg(F.min(F.struct("score", "seg_id", "num", "den"))
                        .alias("b"),
                       F.count("*").cast("long").alias("n_segments")))
    return best.select("pt_id", F.col("b.seg_id").alias("seg_id"),
                       F.col("b.score").alias("score"),
                       F.col("b.num").alias("d2_num"),
                       F.col("b.den").alias("d2_den"), "n_segments")


def rdp_simplify(traj_df: DataFrame, eps2_num: int, eps2_den: int = 1,
                 max_iters: int = 8, traj_id_col: str = "traj_id",
                 seq_col: str = "seq", x_col: str = "x",
                 y_col: str = "y") -> DataFrame:
    """Distributed Ramer-Douglas-Peucker polyline simplification — the
    standard reduction for trajectories, contours and coastlines
    (subpixel_contours output is its natural input).

    Exact arithmetic throughout: a point's distance to its bracketing
    chord AB is the rational cross(AB, AP)^2 / |AB|^2; WITHIN one chord
    the denominator is shared, so the classic farthest-point argmax is
    an exact integer argmax on the numerator (ties break by seq), and
    the epsilon test cross-multiplies (num * eps2_den > eps2_num * den)
    so eps^2 may itself be rational.  No doubles anywhere.

    Iterative breadth-first splitting instead of recursion: every point
    finds its bracketing kept points with two running-extreme window
    scans over (traj, seq), each chord splits at its farthest point if
    beyond epsilon, and ALL chords split in the same round — one round
    is two window passes + one argmax aggregate, so a round costs the
    same for a million trajectories as for one (per-traj recursion
    depth never serializes across the fleet).  Rounds stop at
    `max_iters` or at fixpoint (no chord splits — checked by one
    count() per round; typical depth is O(log n) for natural lines).
    Degenerate chords (closed rings / repeated endpoints, |AB|^2 = 0)
    fall back to point-to-point distance from A, the standard RDP
    convention.

    Returns the kept vertices (traj_id, seq, x, y, converged) —
    `converged` is a GLOBAL flag: False on every row when the loop hit
    max_iters with splits still pending somewhere, so callers see
    truncation instead of mistaking it for the fixpoint."""
    t = traj_df.select(F.col(traj_id_col).alias("tid"),
                       F.col(seq_col).cast("long").alias("seq"),
                       F.col(x_col).cast("long").alias("x"),
                       F.col(y_col).cast("long").alias("y"))
    wt = Window.partitionBy("tid")
    pts = t.withColumn(
        "keep", (F.col("seq") == F.min("seq").over(wt))
                | (F.col("seq") == F.max("seq").over(wt))).persist()
    pts.count()
    wup = (Window.partitionBy("tid").orderBy("seq")
                 .rowsBetween(Window.unboundedPreceding, 0))
    wdn = (Window.partitionBy("tid").orderBy(F.desc("seq"))
                 .rowsBetween(Window.unboundedPreceding, 0))
    kept_seq = F.when(F.col("keep"), F.col("seq"))
    kept_x = F.when(F.col("keep"), F.col("x"))
    kept_y = F.when(F.col("keep"), F.col("y"))
    split_any = True
    rounds = 0
    while split_any and rounds < max_iters:
        rounds += 1
        # bracket every interior point by its nearest kept neighbors
        br = (pts.withColumn("ls", F.max(kept_seq).over(wup))
                 .withColumn("lx", F.last(kept_x, True).over(wup))
                 .withColumn("ly", F.last(kept_y, True).over(wup))
                 .withColumn("rs", F.min(kept_seq).over(wdn))
                 .withColumn("rx", F.last(kept_x, True).over(wdn))
                 .withColumn("ry", F.last(kept_y, True).over(wdn)))
        inner = br.filter(~F.col("keep"))
        abx, aby = F.col("rx") - F.col("lx"), F.col("ry") - F.col("ly")
        apx, apy = F.col("x") - F.col("lx"), F.col("y") - F.col("ly")
        l2 = abx * abx + aby * aby
        cross = abx * apy - aby * apx
        num = F.when(l2 == 0, (apx * apx + apy * apy)) \
               .otherwise(cross * cross)
        den = F.when(l2 == 0, F.lit(1)).otherwise(l2)
        cand = inner.select(
            "tid", "seq", "ls", "rs", num.alias("num"), den.alias("den"))
        far = (cand.groupBy("tid", "ls", "rs")
                   .agg(F.max(F.struct(F.col("num"),
                                       (-F.col("seq")).alias("nseq")))
                         .alias("m"),
                        F.first("den").alias("den"))
                   .select("tid", (-F.col("m.nseq")).alias("seq"),
                           F.col("m.num").alias("num"), "den")
                   .filter(F.col("num") * eps2_den
                           > F.lit(eps2_num) * F.col("den")))
        # persist the split set: without it the bracket-window lineage
        # would run twice per round (once for this count, once inside
        # the next pts materialization)
        far = far.persist()
        n_split = far.count()
        split_any = n_split > 0
        if split_any:
            new = (pts.join(far.select("tid", "seq").withColumn(
                                "nk", F.lit(True)),
                            ["tid", "seq"], "left")
                      .withColumn("keep", F.col("keep")
                                  | F.coalesce("nk", F.lit(False)))
                      .drop("nk").persist())
            new.count()
            pts.unpersist()
            pts = new
        far.unpersist()
    out = pts.filter("keep").select(
        F.col("tid").alias(traj_id_col), "seq", "x", "y",
        F.lit(not split_any).alias("converged"))
    # materialize before releasing the loop cache
    out = out.localCheckpoint(eager=True)
    pts.unpersist()
    return out


# ---------------------------------------------------------------------------
# Discrete Fréchet distance (in-row exact-integer DP)
# ---------------------------------------------------------------------------

def frechet_distance_col(ax, ay, bx, by):
    """Squared discrete Fréchet distance between two trajectories given
    as parallel array<long> coordinate columns — the max-min twin of
    temporal.dtw_distance_col: the same nested higher-order aggregate
    walks A carrying the DP row over B, but the recurrence couples the
    walkers with a leash instead of summing costs:

        new[j] = max(c(i,j), min(prev[j], prev[j-1], new[j-1]))

    with c(i,j) = (ax_i-bx_j)^2 + (ay_i-by_j)^2 — squared Euclidean, so
    everything stays int64-exact and the result (the squared leash
    length) hash-matches any engine's discrete Fréchet.  Reference
    trajectory tooling ships DTW-style similarity only; Fréchet is the
    order-aware variant map-matching QA actually wants (a doubled-back
    ping raises Fréchet but not Hausdorff).

    Zero Python, zero shuffle: per-row CPU only, same bounded-series
    contract as dtw_distance_col (n*m <= ~10^6 per row)."""
    BIG = F.lit(2 ** 62)

    def cost(px, py, jc):
        dx = px - F.element_at(bx, jc)
        dy = py - F.element_at(by, jc)
        return dx * dx + dy * dy

    def outer(prev, pt):
        def inner(acc2, j):
            jc = j.cast("int")
            c = cost(pt["x"], pt["y"], jc)
            up = F.element_at(prev, jc)
            diag = F.coalesce(F.get(prev, jc - 2), BIG)
            left = F.coalesce(F.get(acc2, F.size(acc2) - 1), BIG)
            return F.concat(acc2, F.array(
                F.greatest(c, F.least(up, diag, left))))
        return F.aggregate(F.sequence(F.lit(1), F.size(bx)),
                           F.array().cast("array<long>"), inner)

    def init_inner(acc, j):
        jc = j.cast("int")
        c = cost(F.element_at(ax, 1), F.element_at(ay, 1), jc)
        run = F.coalesce(F.get(acc, F.size(acc) - 1), F.lit(0))
        # row 1 is the running max of costs: dp[1][j] = max(c(1,j), dp[1][j-1])
        return F.concat(acc, F.array(F.greatest(c, run)))

    row1 = F.aggregate(F.sequence(F.lit(1), F.size(bx)),
                       F.array().cast("array<long>"), init_inner)
    zipped = F.zip_with(ax, ay,
                        lambda x, y: F.struct(x.alias("x"), y.alias("y")))
    rest = F.slice(zipped, 2, F.greatest(F.size(zipped) - 1, F.lit(0)))
    return F.element_at(F.aggregate(rest, row1, outer), F.size(bx))


def frechet_pairs(traj_df: DataFrame, traj_id_col: str = "traj_id",
                  seq_col: str = "seq", x_col: str = "x",
                  y_col: str = "y") -> DataFrame:
    """All-pairs squared discrete Fréchet over a trajectory table — the
    similarity gate for dedup of crowd-sourced tracks (two uploads of
    the same drive Fréchet-match even when ping rates differ; DTW's sum
    rewards short series, Fréchet's max doesn't).

    Shape (the dtw_pairs contract): one groupBy assembles each
    trajectory's sorted coordinate arrays, one self-join on sa < sb
    enumerates unordered pairs — k trajectories is k(k-1)/2 rows, the
    caller bounds k or pairs against a broadcast probe set — and all DP
    work runs in-row.  Returns (sa, sb, n_a, n_b, frechet2)."""
    arr = (traj_df.groupBy(F.col(traj_id_col).alias("tid"))
           .agg(F.array_sort(F.collect_list(
                    F.struct(F.col(seq_col).alias("s"),
                             F.col(x_col).cast("long").alias("x"),
                             F.col(y_col).cast("long").alias("y"))))
                 .alias("pts"),
                F.count("*").cast("long").alias("n")))
    arr = arr.select(
        "tid", "n",
        F.transform("pts", lambda p: p["x"]).alias("xs"),
        F.transform("pts", lambda p: p["y"]).alias("ys"))
    a = arr.select(F.col("tid").alias("sa"), F.col("xs").alias("xa"),
                   F.col("ys").alias("ya"), F.col("n").alias("n_a"))
    b = arr.select(F.col("tid").alias("sb"), F.col("xs").alias("xb"),
                   F.col("ys").alias("yb"), F.col("n").alias("n_b"))
    pairs = a.join(b, F.col("sa") < F.col("sb"))
    return pairs.select(
        "sa", "sb", "n_a", "n_b",
        frechet_distance_col(F.col("xa"), F.col("ya"),
                             F.col("xb"), F.col("yb")).alias("frechet2"))


def turn_stats(traj_df: DataFrame, traj_id_col: str = "traj_id",
               t_col: str = "t", x_col: str = "x",
               y_col: str = "y") -> DataFrame:
    """Per-trajectory turning profile — the heading-change fingerprint
    that separates straight transit (roads, ship lanes) from dwell /
    search movement, computed entirely as exact integer cross/dot
    products of consecutive displacement vectors (no atan2 anywhere:
    summed float angles would be summation-order-dependent).

    At each interior point with displacements a = p_i - p_{i-1} and
    b = p_{i+1} - p_i (zero displacements skipped — heading undefined):
      cross = ax*by - ay*bx   (sign: left > 0, right < 0)
      dot   = ax*bx + ay*by
    Classification, all integer comparisons: straight (cross = 0 and
    dot > 0), u_turn (cross = 0 and dot < 0), left/right by sign, and
    sharp = turn magnitude > 45 deg, i.e. dot <= 0 (>= 90) OR
    cross^2 > dot^2 (|tan| > 1, exact while |coord delta| < 2^15).

    One window pass (two lags over the trajectory sort) + one
    aggregate, shuffling on the trajectory key only.  Returns
    (traj_id, n_pts, n_segments, n_turns, n_left, n_right, n_straight,
    n_uturn, n_sharp)."""
    k, t = F.col(traj_id_col), F.col(t_col)
    w = Window.partitionBy(traj_id_col).orderBy(t_col)
    p = traj_df.select(traj_id_col, t_col,
                       F.col(x_col).cast("long").alias("x"),
                       F.col(y_col).cast("long").alias("y"))
    d = (p.withColumn("px", F.lag("x").over(w))
          .withColumn("py", F.lag("y").over(w))
          .withColumn("ax", F.col("x") - F.col("px"))
          .withColumn("ay", F.col("y") - F.col("py")))
    # displacement INTO the next point, via lead of the displacement
    d = (d.withColumn("bx", F.lead("ax").over(w))
          .withColumn("by", F.lead("ay").over(w)))
    interior = d.filter(
        F.col("ax").isNotNull() & F.col("bx").isNotNull()
        & ((F.col("ax") != 0) | (F.col("ay") != 0))
        & ((F.col("bx") != 0) | (F.col("by") != 0)))
    cross = F.col("ax") * F.col("by") - F.col("ay") * F.col("bx")
    dot = F.col("ax") * F.col("bx") + F.col("ay") * F.col("by")
    cls = interior.select(
        traj_id_col, cross.alias("c"), dot.alias("d"))
    n_all = p.groupBy(traj_id_col).agg(
        F.count("*").cast("long").alias("n_pts"),
        (F.count("*") - 1).cast("long").alias("n_segments"))
    c, dd = F.col("c"), F.col("d")
    agg = cls.groupBy(traj_id_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum((c > 0).cast("long")).alias("n_left"),
        F.sum((c < 0).cast("long")).alias("n_right"),
        F.sum(((c == 0) & (dd > 0)).cast("long")).alias("n_straight"),
        F.sum(((c == 0) & (dd < 0)).cast("long")).alias("n_uturn"),
        F.sum(((dd <= 0) | (c * c > dd * dd)).cast("long"))
         .alias("n_sharp"))
    return (n_all.join(agg, traj_id_col, "left")
                 .select(traj_id_col, "n_pts", "n_segments",
                         *[F.coalesce(F.col(cname), F.lit(0)).cast("long")
                            .alias(cname)
                           for cname in ("n_turns", "n_left", "n_right",
                                         "n_straight", "n_uturn",
                                         "n_sharp")]))


def bilateral_filter_grid(cells_df: DataFrame, range_cap: int = 32,
                          ix_col: str = "ix", iy_col: str = "iy",
                          value_col: str = "v") -> DataFrame:
    """Edge-preserving bilateral smoothing over a long-form integer
    grid, exact-integer: each cell's output is the weighted mean of its
    5x5 window with weight = spatial * range,

        ws(dx,dy) = binom4(dx) * binom4(dy)   (1,4,6,4,1 separable —
                    the discrete Gaussian every pyramid here uses)
        wr(q)     = max(range_cap - |v_q - v_p|, 0)   (integer tent;
                    a LUT'd exp would add nothing but doubles)
        out       = sum(ws*wr*v_q) DIV sum(ws*wr)

    The self term (diff 0) keeps the denominator >= 6*6*range_cap > 0,
    so no zero-division branch.  A plain Gaussian blur smears edges; the
    range tent zeroes the weight of neighbors more than `range_cap` DNs
    away, so steps survive — the classic pre-segmentation denoiser
    (reference smoothing shape: dc_utilities' per-band cleanup before
    wofs/fractional-cover classification).

    Shape at scale: the median_filter_grid contract — one broadcast of
    25 literal (dx, dy, ws) offset rows, one shifted-selves equi-join
    co-partitioned on the cell key, one groupBy; integer DIV (operands
    nonnegative), no UDF, no collect.  Returns (ix, iy, v, smooth_v,
    wsum)."""
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(value_col).cast("long").alias("v"))
    b4 = {-2: 1, -1: 4, 0: 6, 1: 4, 2: 1}
    offs = cells_df.sparkSession.createDataFrame(
        [(dx, dy, b4[dx] * b4[dy]) for dx in b4 for dy in b4],
        "dx long, dy long, ws long")
    nbr = g.select(F.col("ix").alias("jx"), F.col("iy").alias("jy"),
                   F.col("v").alias("vj"))
    win = (g.crossJoin(F.broadcast(offs))
            .withColumn("jx", F.col("ix") + F.col("dx"))
            .withColumn("jy", F.col("iy") + F.col("dy"))
            .join(nbr, ["jx", "jy"])
            .withColumn("wr", F.greatest(
                F.lit(range_cap) - F.abs(F.col("vj") - F.col("v")),
                F.lit(0)))
            .withColumn("wt", F.col("ws") * F.col("wr"))
            .groupBy("ix", "iy", "v")
            .agg(F.sum(F.col("wt") * F.col("vj")).alias("num"),
                 F.sum("wt").alias("wsum")))
    return win.select("ix", "iy", "v",
                      F.expr("num div wsum").cast("long").alias("smooth_v"),
                      F.col("wsum").cast("long").alias("wsum"))


def areal_interpolate(cells_df: DataFrame, zone_vals_df: DataFrame,
                      src_col: str = "src_zone", tgt_col: str = "tgt_zone",
                      val_col: str = "value") -> DataFrame:
    """Areal-weighted interpolation between incompatible zone systems
    (the census-reallocation / dasymetric primitive): a source zone's
    value is split across target zones proportional to SHARED ATOMIC
    CELLS, then summed per target —

        alloc(s, t) = value(s) * n_cells(s, t) * 2^20 DIV n_cells(s)

    on the Q20 grid, exact integers (values and counts nonnegative, so
    DIV == floor on both engines).  The floor remainder per (s, t) is
    dropped — deterministic, bounded by 1/2^20 of the source value per
    target — rather than re-spread (convention pinned here).

    cells_df is the atomic crosswalk (one row per atom with its source
    AND target zone — exactly what cell_assignment/tiling produce at
    any resolution); zone_vals_df carries (src_zone, value).

    Shape at scale: two groupBys on the crosswalk + one equi-join to
    the (small) zone-value table + one groupBy on target — the
    crosswalk shuffles on src once and tgt once, values broadcast.
    Returns (tgt_zone, value_q20, n_src_zones, n_cells)."""
    cw = cells_df.select(F.col(src_col).cast("long").alias("s"),
                         F.col(tgt_col).cast("long").alias("t"))
    n_src = cw.groupBy("s").agg(F.count("*").alias("n_s"))
    shared = cw.groupBy("s", "t").agg(F.count("*").alias("n_st"))
    vals = zone_vals_df.select(F.col(src_col).cast("long").alias("s"),
                               F.col(val_col).cast("long").alias("val"))
    alloc = (shared.join(n_src, "s").join(F.broadcast(vals), "s")
                   .withColumn("alloc_q20", F.expr(
                       "(val * n_st * 1048576) div n_s")))
    return (alloc.groupBy(F.col("t").alias("tgt_zone"))
                 .agg(F.sum("alloc_q20").cast("long").alias("value_q20"),
                      F.countDistinct("s").cast("long")
                       .alias("n_src_zones"),
                      F.sum("n_st").cast("long").alias("n_cells")))


def least_cost_path_grid(cells_df: DataFrame, target: "tuple[int, int]",
                         max_log2: int = 13, ix_col: str = "ix",
                         iy_col: str = "iy", cost_col: str = "cost",
                         source_col: str = "is_source",
                         acc_rounds: int = 64,
                         to_fixpoint: bool = True) -> DataFrame:
    """Optimal-route reconstruction over a cost raster — the backtrack
    stage cost_distance_grid lacks: which cells the least-cost path
    from the source set to `target` actually crosses (corridor siting,
    route planning — the classic GIS pair of operators).

    Parent pointers are EXACT: parent(v) = the 4-neighbor u with
    acc(u) + cost(v) == acc(v) (such a u always exists off-source on an
    optimal tree), ties broken (ux, uy) lexicographic — so the path is
    unique and hash-reproducible.  Source cells self-loop, saturating
    every jump below; with a hop-BOUNDED acc (to_fixpoint=False — the
    cost_distance oracle configuration) a cell can lack a qualifying
    parent, and it self-loops too, terminating the chase there.

    Shape at scale: sequential backtracking would take path-length
    rounds; instead the parent FOREST is binary-lifted — J_{k+1} =
    J_k JOIN J_k gives the 2^(k+1)-ancestor of every cell in one
    self-join — and the ancestor SET of the target accumulates by
    A := A UNION J_k[A] from the high bit down (every path offset is a
    subset sum of powers of two), so a 2^13-cell path resolves in ~26
    n-row equi-joins instead of 8192 rounds.  localCheckpoint per
    level (iterative-lineage contract).  Returns the path's (ix, iy,
    acc) rows, target and reached source included."""
    acc = cost_distance_grid(cells_df, ix_col, iy_col, cost_col,
                             source_col, max_rounds=acc_rounds,
                             to_fixpoint=to_fixpoint)
    g = cells_df.select(F.col(ix_col).cast("long").alias("ix"),
                        F.col(iy_col).cast("long").alias("iy"),
                        F.col(cost_col).cast("long").alias("cost"),
                        F.col(source_col).cast("boolean").alias("src"))
    a = acc.join(g, ["ix", "iy"]).persist()
    offs = cells_df.sparkSession.createDataFrame(
        [(1, 0), (-1, 0), (0, 1), (0, -1)], "dx long, dy long")
    nb = a.select(F.col("ix").alias("ux"), F.col("iy").alias("uy"),
                  F.col("acc").alias("uacc"))
    cand = (a.crossJoin(F.broadcast(offs))
             .withColumn("ux", F.col("ix") + F.col("dx"))
             .withColumn("uy", F.col("iy") + F.col("dy"))
             .join(nb, ["ux", "uy"])
             .filter(F.col("uacc") + F.col("cost") == F.col("acc")))
    best = (cand.groupBy("ix", "iy")
                .agg(F.min(F.struct("ux", "uy")).alias("p"))
                .select("ix", "iy", F.col("p.ux").alias("px"),
                        F.col("p.uy").alias("py")))
    # sources (and any cell with no qualifying parent) self-loop
    parent = (a.select("ix", "iy", "src")
               .join(best, ["ix", "iy"], "left")
               .select("ix", "iy",
                       F.when(F.col("src") | F.col("px").isNull(),
                              F.col("ix")).otherwise(F.col("px"))
                        .alias("px"),
                       F.when(F.col("src") | F.col("py").isNull(),
                              F.col("iy")).otherwise(F.col("py"))
                        .alias("py"))
               .localCheckpoint(eager=True))
    jumps = [parent]
    for _ in range(max_log2):
        j = jumps[-1]
        j2 = (j.join(j.select(F.col("ix").alias("px"),
                              F.col("iy").alias("py"),
                              F.col("px").alias("qx"),
                              F.col("py").alias("qy")), ["px", "py"])
               .select("ix", "iy", F.col("qx").alias("px"),
                       F.col("qy").alias("py"))
               .localCheckpoint(eager=True))
        jumps.append(j2)
    tx, ty = int(target[0]), int(target[1])
    anc = (a.sparkSession.createDataFrame([(tx, ty)], "ix long, iy long")
           .localCheckpoint(eager=True))
    for j in reversed(jumps):
        hop = (anc.join(j, ["ix", "iy"])
                  .select(F.col("px").alias("ix"), F.col("py").alias("iy")))
        anc = (anc.unionByName(hop).distinct()
                  .localCheckpoint(eager=True))
    out = anc.join(acc, ["ix", "iy"]).select("ix", "iy", "acc")
    a.unpersist()
    return out


def skew_profile(df: DataFrame, key_cols: "Sequence[str]",
                 target_rows: int = 1_000_000,
                 top_k: int = 20) -> DataFrame:
    """Join/shuffle skew diagnostic — the measurement half of the salted
    repartitioning story (salted_zonal is the cure; this finds the
    patients): per hot key, its row count, its share of the table on
    the Q20 grid, and the SALT FACTOR a downstream salted aggregation
    needs (ceil(count / target_rows), computed as an exact integer
    ceil-div) to keep every task under target_rows rows.

    Coastline/urban cells, null-ish default keys, and bot users all
    surface here before they melt a 1000-executor join.  Returns the
    top_k heaviest keys: (key..., cnt, share_q20, salt_factor) —
    TakeOrderedAndProject after ONE map-side-combining groupBy, so the
    diagnostic itself cannot skew."""
    total = df.count()
    cnt = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    return (cnt.select(
                *key_cols, "cnt",
                F.expr(f"(cnt * 1048576) div {total}L").alias("share_q20"),
                F.expr(f"(cnt + {target_rows}L - 1) div {target_rows}L")
                 .alias("salt_factor"))
               .orderBy(F.desc("cnt"),
                        *[F.asc(k) for k in key_cols])
               .limit(top_k))


def gravity_flows(origins: DataFrame, dests: DataFrame,
                  max_d2: int, ox_col: str = "x", oy_col: str = "y",
                  dx_col: str = "x", dy_col: str = "y") -> DataFrame:
    """Gravity spatial-interaction model — the classic trip/trade-flow
    estimator (the MODELED counterpart of the observed od_matrix):

        flow(o, d) = mass_o * mass_d * 2^20 DIV d2,   0 < d2 <= max_d2

    with d2 the exact squared Euclidean distance; the product runs on
    the decimal(38,0) grid so heavy masses cannot wrap int64 (the
    chi_square idiom).  Self-pairs (d2 = 0) are excluded — the model is
    undefined at zero distance.

    Shape at scale: destinations are a broadcast dimension (the
    voronoi/knn probe contract); origins stream map-side through the
    distance filter, so the only shuffle is whatever consumes the
    result.  For two LARGE layers switch to cell-blocked joins (the
    knn machinery).  Expects origins (o_id, x, y, mass_o) and dests
    (d_id, x, y, mass_d); returns (o_id, d_id, d2, flow_q20)."""
    o = origins.select(F.col("o_id").cast("long").alias("o_id"),
                       F.col(ox_col).cast("long").alias("ox"),
                       F.col(oy_col).cast("long").alias("oy"),
                       F.col("mass_o").cast("long").alias("mo"))
    d = dests.select(F.col("d_id").cast("long").alias("d_id"),
                     F.col(dx_col).cast("long").alias("dx"),
                     F.col(dy_col).cast("long").alias("dy"),
                     F.col("mass_d").cast("long").alias("md"))
    d2 = ((F.col("ox") - F.col("dx")) * (F.col("ox") - F.col("dx"))
          + (F.col("oy") - F.col("dy")) * (F.col("oy") - F.col("dy")))
    return (o.crossJoin(F.broadcast(d))
             .withColumn("d2", d2)
             .filter((F.col("d2") > 0) & (F.col("d2") <= max_d2))
             .select("o_id", "d_id", F.col("d2").cast("long").alias("d2"),
                     F.expr("CAST((CAST(mo AS DECIMAL(38,0)) * md "
                            "* 1048576) DIV d2 AS BIGINT)")
                      .alias("flow_q20")))


def downsample_mode_grid(cells_df: DataFrame, factor: int = 2,
                         ix_col: str = "ix", iy_col: str = "iy",
                         value_col: str = "v") -> DataFrame:
    """CATEGORICAL pyramid level: downsample a classified grid by
    `factor` taking the MODE of each factor x factor block (ties to the
    smallest class id) — land-cover/classification overviews, where the
    mean-pool pyramid (overview_pyramid) would invent classes that
    don't exist.

    Deterministic argmax with no window: per (parent, class) counts,
    then min(struct(-cnt, class)) picks highest count / smallest class
    in ONE lexicographic aggregate.  Two map-side-combining groupBys on
    the parent key.  Returns (px, py, mode_v, n_cells, n_classes)."""
    g = cells_df.select(
        F.expr(f"{ix_col} div {factor}").alias("px"),
        F.expr(f"{iy_col} div {factor}").alias("py"),
        F.col(value_col).cast("long").alias("v"))
    cnt = g.groupBy("px", "py", "v").agg(F.count("*").alias("cnt"))
    pick = (cnt.groupBy("px", "py")
               .agg(F.min(F.struct((-F.col("cnt")).alias("nc"),
                                   F.col("v").alias("v"))).alias("b"),
                    F.sum("cnt").alias("n_cells"),
                    F.count("*").alias("n_classes")))
    return pick.select("px", "py",
                       F.col("b.v").alias("mode_v"),
                       F.col("n_cells").cast("long").alias("n_cells"),
                       F.col("n_classes").cast("long").alias("n_classes"))


def segment_intersections(segs: DataFrame, cell: int = 16,
                          id_col: str = "seg_id") -> DataFrame:
    """All intersecting segment pairs (id_a < id_b) with the EXACT
    rational intersection point — the pairwise core of every vector
    overlay (union/clip/topology build), kept on the integer lattice:

      orientation tests  cross(p2-p1, q-p1)  are exact int64, so the
      "do they intersect" predicate (both straddle tests <= 0, plus
      bbox overlap to close the collinear corner cases) has no epsilon;
      for non-parallel pairs the point is returned as numerators over a
      common denominator  (x_num/den, y_num/den),  den = cross(r, s)
      sign-normalized positive — no division at all, so the result
      hash-oracles and downstream snapping policy stays with the caller.
      Collinear-overlapping pairs emit den = 0 with NULL numerators
      (flagged, not silently dropped).

    Shape at scale: segments explode onto the `cell`-sized grid cells
    their bbox covers, pairs equi-join ON the cell, and duplicates from
    multi-cell overlaps collapse with ONE distinct on (id_a, id_b) —
    the standard spatial-join blocking already used by the PIP suite;
    predicate and point are pure codegen arithmetic.  Int64 bounds:
    |coord| < 2^15 keeps x_num = x*den + t*rx within 2^62.

    Input: (seg_id, x1, y1, x2, y2) integer endpoints.  Returns
    (id_a, id_b, x_num, y_num, den, collinear)."""
    s = segs.select(
        F.col(id_col).alias("sid"),
        *[F.col(c).cast("long").alias(c)
          for c in ("x1", "y1", "x2", "y2")])
    lo = lambda a, b: F.least(F.col(a), F.col(b))
    hi = lambda a, b: F.greatest(F.col(a), F.col(b))
    cells = s.select(
        "sid", "x1", "y1", "x2", "y2",
        F.explode(F.sequence(
            F.expr(f"least(x1, x2) div {cell}"),
            F.expr(f"greatest(x1, x2) div {cell}"))).alias("cx"),
        lo("y1", "y2").alias("_ylo"), hi("y1", "y2").alias("_yhi"))
    cells = cells.select(
        "sid", "x1", "y1", "x2", "y2", "cx",
        F.explode(F.sequence(
            F.expr(f"_ylo div {cell}"),
            F.expr(f"_yhi div {cell}"))).alias("cy"))
    a = cells.select(F.col("sid").alias("id_a"), "cx", "cy",
                     *[F.col(c).alias(f"a{c}")
                       for c in ("x1", "y1", "x2", "y2")])
    b = cells.select(F.col("sid").alias("id_b"), "cx", "cy",
                     *[F.col(c).alias(f"b{c}")
                       for c in ("x1", "y1", "x2", "y2")])
    j = (a.join(b, ["cx", "cy"])
          .filter(F.col("id_a") < F.col("id_b"))
          .drop("cx", "cy").distinct())
    # orientation(p1, p2, q) = cross(p2 - p1, q - p1)
    o = ("((ax2 - ax1) * ({qy} - ay1) - (ay2 - ay1) * ({qx} - ax1))",
         "((bx2 - bx1) * ({qy} - by1) - (by2 - by1) * ({qx} - bx1))")
    d1 = o[0].format(qx="bx1", qy="by1")
    d2 = o[0].format(qx="bx2", qy="by2")
    d3 = o[1].format(qx="ax1", qy="ay1")
    d4 = o[1].format(qx="ax2", qy="ay2")
    bbox = ("least(ax1, ax2) <= greatest(bx1, bx2) AND "
            "least(bx1, bx2) <= greatest(ax1, ax2) AND "
            "least(ay1, ay2) <= greatest(by1, by2) AND "
            "least(by1, by2) <= greatest(ay1, ay2)")
    hit = j.filter(F.expr(
        f"{d1} * {d2} <= 0 AND {d3} * {d4} <= 0 AND {bbox}"))
    den = "((ax2 - ax1) * (by2 - by1) - (ay2 - ay1) * (bx2 - bx1))"
    tn = "((bx1 - ax1) * (by2 - by1) - (by1 - ay1) * (bx2 - bx1))"
    sgn = f"CASE WHEN {den} < 0 THEN -1 ELSE 1 END"
    return hit.select(
        "id_a", "id_b",
        F.expr(f"CASE WHEN {den} != 0 THEN "
               f"(ax1 * {den} + {tn} * (ax2 - ax1)) * {sgn} END")
         .cast("long").alias("x_num"),
        F.expr(f"CASE WHEN {den} != 0 THEN "
               f"(ay1 * {den} + {tn} * (ay2 - ay1)) * {sgn} END")
         .cast("long").alias("y_num"),
        F.expr(f"abs({den})").cast("long").alias("den"),
        F.expr(f"{den} = 0").alias("collinear"))
