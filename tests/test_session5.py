"""Round-5 session-5 unit pins: triangle_count and median_filter_grid
(both already hash-oracled as driver queries; these pin the operator
semantics on hand-built inputs, reference-free)."""
import numpy as np


def test_triangle_count_k4_with_pendant(spark):
    from data_cube_utilities_spark.operators import graph

    # K4 on {0,1,2,3} (4 triangles total, 3 per node), pendant 4-0,
    # plus a self-loop and a duplicate/reversed edge that canonicalization
    # must drop
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(4, 0), (2, 2), (1, 0), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r for r in graph.triangle_count(df).collect()}

    for n in (1, 2, 3):
        assert out[n].degree == 3 and out[n].triangles == 3
        # lcc = 2*3/(3*2) = 1.0 -> 1 << 20
        assert out[n].lcc_q20 == 1048576
    assert out[0].degree == 4 and out[0].triangles == 3
    assert out[0].lcc_q20 == (2 * 3 * 1048576) // (4 * 3)
    assert out[4].degree == 1 and out[4].triangles == 0
    assert out[4].lcc_q20 == 0

    # determinism under partitioning: single-partition run agrees
    one = {r.node: (r.degree, r.triangles, r.lcc_q20)
           for r in graph.triangle_count(df.coalesce(1)).collect()}
    assert one == {k: (v.degree, v.triangles, v.lcc_q20)
                   for k, v in out.items()}


def _median_ref(vals, ix, iy):
    w = sorted(v for (jx, jy), v in vals.items()
               if abs(jx - ix) <= 1 and abs(jy - iy) <= 1)
    return w[(len(w) + 1) // 2 - 1], len(w)   # exact LOWER median


def test_median_filter_grid_denoises_spike(spark):
    from data_cube_utilities_spark.operators import spatial

    rng = np.random.RandomState(7)
    vals = {(x, y): int(rng.randint(40, 60)) for x in range(5)
            for y in range(5)}
    vals[(2, 2)] = 255              # salt spike: must be scrubbed
    df = spark.createDataFrame(
        [(x, y, v) for (x, y), v in vals.items()], "ix long, iy long, v long")
    out = {(r.ix, r.iy): r for r in
           spatial.median_filter_grid(df).collect()}

    assert len(out) == 25
    for (x, y), r in out.items():
        med, k = _median_ref(vals, x, y)
        assert (r.median_v, r.k) == (med, k), (x, y)
        assert r.changed == int(med != vals[(x, y)])
    # the spike itself is replaced by a neighborhood-typical value
    assert out[(2, 2)].median_v < 100 and out[(2, 2)].changed == 1
    # corner windows are truncated (k=4) yet stay integer-exact
    assert out[(0, 0)].k == 4
