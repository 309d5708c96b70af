"""geocell encoder: golden scalar parity, hierarchy, rings, compaction,
and exact agreement between the numpy / Spark-Column / SQL twins."""

import duckdb
import numpy as np
import pytest

from data_cube_utilities_spark import cells


def test_encode_matches_scalar_reference():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-540, 540, 500)  # includes out-of-range wrap
    for res in (0, 1, 5, 9, 12, 28):
        got = cells.encode(lat, lon, res)
        exp = np.asarray(
            [cells.encode_scalar_reference(a, o, res) for a, o in zip(lat, lon)]
        )
        assert (got == exp).all()


def test_encode_known_values():
    # res 0: 1 row x 2 cols; west hemisphere is ix=0, east is ix=1
    assert cells.encode(0.0, -90.0, 0) == 0
    assert cells.encode(0.0, 90.0, 0) == 1
    # res 1: 2 rows x 4 cols; northern row is iy=0
    c = cells.encode(45.0, -170.0, 1)
    res, iy, ix = cells.decode(c)
    assert (int(res), int(iy), int(ix)) == (1, 0, 0)
    c = cells.encode(-45.0, 170.0, 1)
    res, iy, ix = cells.decode(c)
    assert (int(res), int(iy), int(ix)) == (1, 1, 3)


def test_bounds_roundtrip():
    rng = np.random.RandomState(11)
    lat = rng.uniform(-89.9, 89.9, 200)
    lon = rng.uniform(-179.9, 179.9, 200)
    for res in (3, 8, 12):
        cell = cells.encode(lat, lon, res)
        s, n, w, e = cells.cell_bounds(cell)
        assert ((lat >= s) & (lat <= n)).all()
        assert ((lon >= w) & (lon <= e)).all()
        clat, clon = cells.cell_center(cell)
        assert (cells.encode(clat, clon, res) == cell).all()


def test_parent_children_roundtrip():
    c = cells.encode(12.34, 56.78, 10)
    p = cells.parent(c)
    assert int(cells.cell_res(p)) == 9
    kids = cells.children(int(p))
    assert len(kids) == 4 and int(c) in kids
    # deep ancestor/descendants
    anc = cells.parent(c, 4)
    desc = cells.children(int(anc), 10)
    assert len(desc) == 4 ** 6 and int(c) in desc
    assert (cells.parent(desc, 4) == anc).all()


def test_k_ring_and_ring():
    c = int(cells.encode(10.0, 20.0, 8))
    k1 = cells.k_ring(c, 1)
    assert len(k1) == 9 and c in k1
    r2 = cells.ring(c, 2)
    assert len(r2) == 16 and c not in r2
    # pole clipping: fewer cells near the pole
    cp = int(cells.encode(89.99, 0.0, 8))
    assert len(cells.k_ring(cp, 1)) == 6  # top row clipped
    # longitude wrap: full ring at the antimeridian
    cw = int(cells.encode(0.0, 179.99, 8))
    assert len(cells.k_ring(cw, 1)) == 9


def test_compact_uncompact():
    base = int(cells.encode(40.0, -74.0, 6))
    full = cells.children(base, 9)  # 4^3 = 64 cells
    compacted = cells.compact(full)
    assert list(compacted) == [base]
    # remove one leaf -> cannot fully compact
    partial = full[1:]
    comp2 = cells.compact(partial)
    assert len(comp2) < len(partial)
    back = cells.uncompact(comp2, 9)
    assert set(back.tolist()) == set(partial.tolist())


def test_compact_continues_past_unpromotable_deepest():
    # ADVICE r1: 4 complete res-4 siblings + 1 stray res-5 cell must give
    # 2 cells (the res-3 parent + the stray), not 5 — the stray alone makes
    # the deepest level un-promotable but must not stop shallower merges.
    base3 = int(cells.encode(40.0, -74.0, 3))
    sibs4 = cells.children(base3, 4)            # the 4 res-4 children
    stray5 = int(cells.encode(-20.0, 100.0, 5))  # far away, never merges
    out = cells.compact(np.concatenate([sibs4, [stray5]]))
    assert sorted(out.tolist()) == sorted([base3, stray5])
    # and recursion keeps going: 16 res-5 grandchildren + stray -> same
    grand = cells.uncompact(sibs4, 5)
    out2 = cells.compact(np.concatenate([grand, [stray5]]))
    assert sorted(out2.tolist()) == sorted([base3, stray5])


def test_polyfill_bbox_covers_points():
    rng = np.random.RandomState(3)
    lat = rng.uniform(10, 20, 100)
    lon = rng.uniform(-5, 5, 100)
    cover = set(cells.polyfill_bbox(10, 20, -5, 5, 7).tolist())
    pts = cells.encode(lat, lon, 7)
    assert set(pts.tolist()) <= cover


def test_sql_twin_matches_numpy():
    rng = np.random.RandomState(5)
    lat = rng.uniform(-90, 90, 300)
    lon = rng.uniform(-360, 360, 300)
    import pandas as pd

    con = duckdb.connect()
    df = pd.DataFrame({"lat": lat, "lon": lon})
    con.register("pts", df)
    for res in (0, 7, 12):
        sql = cells.encode_sql("lat", "lon", res)
        got = con.execute(f"SELECT {sql} AS c FROM pts").fetchnumpy()["c"]
        exp = cells.encode(lat, lon, res)
        assert (got.astype(np.int64) == exp).all()


@pytest.mark.usefixtures("spark")
def test_column_twin_matches_numpy(spark):
    import pandas as pd

    rng = np.random.RandomState(9)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-90, 90, 400), "lon": rng.uniform(-360, 360, 400)}
    )
    sdf = spark.createDataFrame(pdf)
    for res in (0, 7, 12):
        got = np.sort(
            np.asarray(
                sdf.select(cells.encode_col(sdf.lat, sdf.lon, res)).toPandas()[
                    "cell_id"
                ]
            )
        )
        exp = np.sort(cells.encode(pdf.lat.to_numpy(), pdf.lon.to_numpy(), res))
        assert (got == exp).all()


def test_zorder_np_reference_values():
    import numpy as np
    from data_cube_utilities_spark import cells

    assert cells.zorder_np(0, 0) == 0
    assert cells.zorder_np(3, 1) == 0b111          # x even bits, y odd
    assert cells.zorder_np(0, 3) == 0b1010
    assert cells.zorder_np(65535, 65535) == 2**32 - 1
    # locality: consecutive z codes decode to adjacent-ish grid steps
    xs = np.arange(64) % 8
    ys = np.arange(64) // 8
    z = cells.zorder_np(xs, ys, bits=3)
    assert len(set(map(int, z))) == 64             # bijective on the grid


def test_zorder_col_matches_numpy(spark):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from data_cube_utilities_spark import cells

    rng = np.random.default_rng(7)
    lat = rng.uniform(-60, 60, 300)
    lon = rng.uniform(-179, 179, 300)
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got = (df.select(cells.zorder_col(F.col("lat"), F.col("lon"), 16)
                     .alias("z"))
             .toPandas()["z"].to_numpy())
    n = 1 << 16
    ix = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((90.0 - lat) / 180.0 * n), 0, n - 1).astype(np.int64)
    assert (got == cells.zorder_np(ix, iy, 16)).all()


def test_zorder_layout_tightens_file_bboxes(spark, tmp_path):
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import tiling

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"lat": rng.uniform(-60, 60, 20000),
                        "lon": rng.uniform(-179, 179, 20000)})
    df = spark.createDataFrame(pdf)

    def mean_bbox_area(path):
        back = (spark.read.parquet(path)
                .withColumn("f", F.input_file_name())
                .groupBy("f")
                .agg((F.max("lat") - F.min("lat")).alias("dy"),
                     (F.max("lon") - F.min("lon")).alias("dx")))
        rows = back.collect()
        return sum(r.dy * r.dx for r in rows) / len(rows), len(rows)

    base = str(tmp_path / "plain")
    df.repartition(16).write.parquet(base)
    zpath = str(tmp_path / "zordered")
    tiling.zorder_layout(df, "lat", "lon", n_files=16).write.parquet(zpath)

    plain_area, n1 = mean_bbox_area(base)
    z_area, n2 = mean_bbox_area(zpath)
    assert n1 >= 8 and n2 >= 8
    # random layout: every file spans ~the whole domain; z-ordered files
    # cover a small fraction — the pruning win a bbox scan collects
    assert z_area < plain_area / 4
    # and the rows themselves are unchanged
    assert spark.read.parquet(zpath).count() == 20000


def test_quadkey_roundtrip_and_parent_prefix(spark):
    from data_cube_utilities_spark import cells as C
    from pyspark.sql import functions as F

    g = spark.range(64).select((F.col("id") % 8).alias("ix"),
                               (F.col("id") / 8).cast("long").alias("iy"))
    qk = g.withColumn("qk", C.quadkey_col("ix", "iy", 3))
    dx, dy = C.quadkey_decode_cols("qk", 3)
    out = qk.select("ix", "iy", "qk", dx.alias("dx"), dy.alias("dy")) \
            .toPandas()
    assert (out.dx == out.ix).all() and (out.dy == out.iy).all()
    assert out.qk.str.len().eq(3).all() and out.qk.nunique() == 64
    # Bing reference values: (x=3, y=5, z=3) -> '213'
    r = out[(out.ix == 3) & (out.iy == 5)].iloc[0]
    assert r.qk == "213"
    # parent-prefix property vs an independently computed z=2 key
    par = (g.withColumn("qk3", C.quadkey_col("ix", "iy", 3))
            .withColumn("px", (F.col("ix") / 2).cast("long"))
            .withColumn("py", (F.col("iy") / 2).cast("long"))
            .withColumn("qk2", C.quadkey_col("px", "py", 2))
            .select(F.substring("qk3", 1, 2).alias("pref"), "qk2")
            .toPandas())
    assert (par.pref == par.qk2).all()


def test_hilbert_key_properties(spark):
    from pyspark.sql import functions as F

    from data_cube_utilities_spark import cells as C

    g = spark.range(256).select((F.col("id") % 16).alias("x"),
                                (F.col("id") / 16).cast("long").alias("y"))
    out = C.hilbert_with_key(g, order=4).toPandas()
    assert sorted(out.hkey) == list(range(256))          # bijection
    # THE Hilbert property: consecutive keys are 4-neighbors
    s = out.sort_values("hkey").reset_index(drop=True)
    dx = s.x.diff().abs()[1:]
    dy = s.y.diff().abs()[1:]
    assert ((dx + dy) == 1).all()
    # hierarchical nesting: hkey//4 at order o == hkey of (x//2, y//2)
    # at order o-1 (each 2x2 block is visited contiguously)
    par = C.hilbert_with_key(
        g.select((F.col("x") / 2).cast("long").alias("x"),
                 (F.col("y") / 2).cast("long").alias("y")),
        order=3, out_col="pkey").toPandas()
    child = C.hilbert_with_key(g, order=4).toPandas()
    merged = child.assign(px=child.x // 2, py=child.y // 2).merge(
        par.drop_duplicates(), left_on=["px", "py"], right_on=["x", "y"])
    assert (merged.hkey // 4 == merged.pkey).all()
    # locality: a box range-query touches FEWER contiguous key runs
    # under Hilbert than under Z-order (the reason to bucket by hkey)
    import numpy as np
    hk = {(r.x, r.y): r.hkey for r in out.itertuples()}
    zx = {(x, y): int(C.zorder_np(np.array([x]), np.array([y]), 4)[0])
          for x in range(16) for y in range(16)}
    def frags(keys, bx, by, w=4):
        ks = sorted(keys[(x, y)]
                    for x in range(bx, bx + w) for y in range(by, by + w))
        return 1 + sum(1 for i in range(1, len(ks))
                       if ks[i] != ks[i - 1] + 1)
    fh = sum(frags(hk, bx, by) for bx in range(13) for by in range(13))
    fz = sum(frags(zx, bx, by) for bx in range(13) for by in range(13))
    assert fh < fz


def test_geohash_canonical_vectors():
    # published reference vectors (geohash.org canonical examples)
    assert cells.geohash_np([57.64911], [10.40744], 11)[0] == "u4pruydqqvj"
    assert cells.geohash_np([48.8583], [2.2945], 6)[0].startswith("u09t")
    assert cells.geohash_np([0.0], [0.0], 1)[0] == "s"
    # prefix truncation = parent cell
    full = cells.geohash_np([57.64911], [10.40744], 9)[0]
    for p in (1, 3, 5, 7):
        assert cells.geohash_np([57.64911], [10.40744], p)[0] == full[:p]


def test_geohash_decode_bounds_roundtrip():
    rng = np.random.RandomState(5)
    lat = rng.uniform(-89.9, 89.9, 100)
    lon = rng.uniform(-179.9, 179.9, 100)
    for p in (3, 6, 9):
        ghs = cells.geohash_np(lat, lon, p)
        for a, o, g in zip(lat, lon, ghs):
            lo, hi, wlo, whi = cells.geohash_decode_bounds_np(g)
            assert lo <= a <= hi and wlo <= o <= whi


def test_geohash_col_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(13)
    pdf = pd.DataFrame({
        "lat": rng.uniform(-90, 90, 300),
        "lon": rng.uniform(-180, 180, 300)})
    for p in (1, 4, 7, 12):
        got = (spark.createDataFrame(pdf)
               .select(cells.geohash_col(F.col("lat"), F.col("lon"), p)
                       .alias("gh"))
               .toPandas()["gh"].to_numpy())
        want = cells.geohash_np(pdf["lat"].to_numpy(),
                                pdf["lon"].to_numpy(), p)
        assert (got == want).all()
