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


def _canny_ref(vals, t_lo2, t_hi2):
    """Pure-python reference of canny_edges_long's exact spec."""
    grad = {}
    for (x, y) in vals:
        win = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
               if (x + dx, y + dy) in vals]
        if len(win) != 9:
            continue
        gx = sum(dx * (2 - abs(dy)) * vals[(x + dx, y + dy)]
                 for dx, dy in win)
        gy = sum(dy * (2 - abs(dx)) * vals[(x + dx, y + dy)]
                 for dx, dy in win)
        m2 = gx * gx + gy * gy
        if 5 * abs(gy) <= 2 * abs(gx):
            sec = 0
        elif 5 * abs(gx) <= 2 * abs(gy):
            sec = 2
        elif gx * gy > 0:
            sec = 1
        else:
            sec = 3
        grad[(x, y)] = (gx, gy, m2, sec)
    dirs = {0: (1, 0), 1: (1, 1), 2: (0, 1), 3: (1, -1)}
    surv = {}
    for (x, y), (gx, gy, m2, sec) in grad.items():
        dx, dy = dirs[sec]
        n1 = grad.get((x + dx, y + dy), (0, 0, -1, 0))[2]
        n2 = grad.get((x - dx, y - dy), (0, 0, -1, 0))[2]
        if m2 >= t_lo2 and m2 >= n1 and m2 >= n2:
            surv[(x, y)] = (gx, gy, m2, sec, 2 if m2 >= t_hi2 else 1)
    # hysteresis: BFS from strong through 8-adjacent survivors
    frontier = [p for p, r in surv.items() if r[4] == 2]
    reach = set(frontier)
    while frontier:
        x, y = frontier.pop()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                q = (x + dx, y + dy)
                if q in surv and q not in reach:
                    reach.add(q)
                    frontier.append(q)
    return {p: r + (int(p in reach),) for p, r in surv.items()}


def test_canny_edges_long_matches_reference(spark):
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(3)
    vals = {}
    for x in range(14):
        for y in range(14):
            # one vertical step whose height fades along y: the top half
            # is a strong edge, the bottom half of the SAME line is weak
            # — 8-connected, so hysteresis must keep it
            step = 200 if y < 7 else 90
            vals[(x, y)] = step * (x >= 7) + int(rng.randint(0, 40))
    # isolated weak blob far from the step: must be dropped
    vals[(2, 11)] += 70

    t_lo2, t_hi2 = 5_000, 200_000
    ref = _canny_ref(vals, t_lo2, t_hi2)
    df = spark.createDataFrame(
        [(0, x, y, v) for (x, y), v in vals.items()],
        "img long, px long, py long, val long")
    out = {(r.x, r.y): (r.gx, r.gy, r.mag2, r.sector, r.strength, r.edge)
           for r in rasterops.canny_edges_long(
               df, t_lo2=t_lo2, t_hi2=t_hi2).collect()}

    assert out == ref
    strengths = {v[4] for v in out.values()}
    edges = {v[5] for v in out.values()}
    assert strengths == {1, 2} and edges == {0, 1}, \
        "fixture must exercise weak+strong and kept+dropped regimes"
    # isolated weak survivors are dropped, step-linked weak ones kept
    kept_weak = [p for p, v in out.items() if v[4] == 1 and v[5] == 1]
    dropped_weak = [p for p, v in out.items() if v[4] == 1 and v[5] == 0]
    assert kept_weak and dropped_weak


def test_acf_profile_numpy_parity_and_constant_series(spark):
    from data_cube_utilities_spark.operators import temporal

    rows = [("a", t, (t % 4) * 10 + (t * 13) % 3) for t in range(20)]
    rows += [("b", t, 5) for t in range(8)]          # constant series
    df = spark.createDataFrame(rows, "grp string, t long, v long")
    pdf = (temporal.acf_profile(df, ["grp"], max_lag=5)
           .orderBy("grp", "lag").toPandas())

    v = np.array([r[2] for r in rows[:20]], dtype=float)
    for lag in range(1, 6):
        x, y = v[:-lag], v[lag:]
        r = float(np.corrcoef(x, y)[0, 1])
        got = float(pdf[(pdf.grp == "a") & (pdf.lag == lag)].acf.iloc[0])
        assert abs(round(r, 6) - got) < 2e-6, (lag, r, got)
        n = pdf[(pdf.grp == "a") & (pdf.lag == lag)].n_pairs.iloc[0]
        assert n == 20 - lag
    # the planted period-4 signal fingerprints at lag 4
    acf4 = float(pdf[(pdf.grp == "a") & (pdf.lag == 4)].acf.iloc[0])
    assert acf4 > 0.9
    # zero-variance marginals yield NULL acf but exact zero moments
    b = pdf[pdf.grp == "b"]
    assert b.acf.isna().all() and (b.varx == 0).all()


def test_kcore_peels_tendrils_keeps_clique(spark):
    from data_cube_utilities_spark.operators import graph

    # K5 on {0..4} (every degree 4) with a chain tendril 4-10-11-12
    # hanging off it, plus a triangle {20,21,22} (a 2-core, not 3)
    edges = [(a, b) for a in range(5) for b in range(5) if a < b]
    edges += [(4, 10), (10, 11), (11, 12)]
    edges += [(20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(edges, "src long, dst long")

    core3 = {r.node: r.core_degree for r in graph.kcore(df, k=3).collect()}
    assert core3 == {n: 4 for n in range(5)}, core3
    # k above the max clique degree: no core at all
    assert graph.kcore(df, k=5).count() == 0
    # k=2 keeps K5 AND the triangle, still peels the chain
    core2 = {r.node for r in graph.kcore(df, k=2).collect()}
    assert core2 == {0, 1, 2, 3, 4, 20, 21, 22}


def test_exp_smooth_integer_recursion(spark):
    from data_cube_utilities_spark.operators import temporal

    xs = [3, 10, 0, 7, 20, 20, 20, 1]
    rows = [("a", t, x) for t, x in enumerate(xs)]
    rows += [("b", 0, 9)]                       # singleton series
    df = spark.createDataFrame(rows, "grp string, t long, v long")
    out = temporal.exp_smooth(df, ["grp"], alpha_num=1,
                              alpha_den=4).collect()

    lvl, ref = xs[0] * 65536, []
    ref.append(lvl)
    for x in xs[1:]:
        lvl = (3 * lvl + x * 65536) // 4
        ref.append(lvl)
    got = [r.level_q16 for r in sorted(
        (r for r in out if r.grp == "a"), key=lambda r: r.t)]
    assert got == ref
    # singleton: level = x on the Q16 grid
    b = [r for r in out if r.grp == "b"]
    assert len(b) == 1 and b[0].level_q16 == 9 * 65536
    # partitioning determinism
    one = sorted((r.grp, r.t, r.level_q16) for r in temporal.exp_smooth(
        df.coalesce(1), ["grp"], alpha_num=1, alpha_den=4).collect())
    assert one == sorted((r.grp, r.t, r.level_q16) for r in out)


def test_region_moments_match_numpy(spark):
    from data_cube_utilities_spark.operators import rasterops

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(9, 9))
    labels = (np.indices((9, 9)).sum(0) >= 9).astype(int)  # two triangles
    rows = [(0, int(x), int(y), int(labels[y, x]), int(img[y, x]))
            for y in range(9) for x in range(9)]
    df = spark.createDataFrame(rows, "img long, px long, py long, "
                                     "label long, w long")
    out = {r.label: r for r in rasterops.region_moments(df).collect()}

    for lab in (0, 1):
        ys, xs = np.nonzero(labels == lab)
        w = img[ys, xs].astype(object)          # python ints: no overflow
        m00, m10, m01 = int(w.sum()), int((w * xs).sum()), int((w * ys).sum())
        m20 = int((w * xs * xs).sum())
        m02 = int((w * ys * ys).sum())
        m11 = int((w * xs * ys).sum())
        r = out[lab]
        assert (r.m00, r.m10, r.m01, r.m20, r.m02, r.m11) == \
            (m00, m10, m01, m20, m02, m11)
        assert r.mu20s == m00 * m20 - m10 * m10
        assert r.mu11s == m00 * m11 - m10 * m01
        # theta agrees with the float covariance-matrix orientation
        import math
        want = math.atan2(2 * (m00 * m11 - m10 * m01),
                          (m00 * m20 - m10 * m10)
                          - (m00 * m02 - m01 * m01)) / 2
        assert abs(r.theta - round(want, 6)) < 1e-9


def test_label_propagation_condenses_cliques(spark):
    from data_cube_utilities_spark.operators import graph

    # two K4 cliques bridged by one edge: LPA condenses each clique
    # onto its minimum label within a sweep or two
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges += [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.community
           for r in graph.label_propagation(df, rounds=4).collect()}

    assert set(out) == set(range(4)) | set(range(10, 14))
    # each clique is one community; the two communities are distinct
    c0 = {out[n] for n in range(4)}
    c1 = {out[n] for n in range(10, 14)}
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1

    # pure function of the input: partitioning cannot change anything
    one = {r.node: r.community for r in graph.label_propagation(
        df.coalesce(1), rounds=4).collect()}
    assert one == out

    # python replay of the synchronous spec, 4 sweeps
    from collections import Counter
    sym = {}
    for u, v in edges:
        sym.setdefault(u, []).append(v)
        sym.setdefault(v, []).append(u)
    lab = {n: n for n in sym}
    for _ in range(4):
        nxt = {}
        for n, nbrs in sym.items():
            cnt = Counter(lab[m] for m in nbrs)
            best = min(((-c, l) for l, c in cnt.items()))
            nxt[n] = best[1]
        lab = nxt
    assert lab == out


def test_turn_stats_classifies_planted_path(spark):
    from data_cube_utilities_spark.operators import spatial

    # path: east, east (straight), then north (left 90 = sharp),
    # then east (right 90 = sharp), then west (u-turn), then a gentle
    # left (cross>0, |tan|<1 -> not sharp)
    pts = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1), (2, 1), (0, 0)]
    # last leg (2,1)->(0,0): a=( -2,-1) after b=(-2,0)? build explicitly:
    pts = [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1), (2, 1)]
    rows = [("p", i, x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "traj_id string, t long, x long, y long")
    r = spatial.turn_stats(df).collect()[0]

    # interior headings: at (1,0): a=(1,0) b=(1,0) straight;
    # at (2,0): a=(1,0) b=(0,1) left sharp; at (2,1): a=(0,1) b=(1,0)
    # right sharp; at (3,1): a=(1,0) b=(-1,0) u-turn (sharp)
    assert (r.n_pts, r.n_segments, r.n_turns) == (6, 5, 4)
    assert (r.n_left, r.n_right, r.n_straight, r.n_uturn) == (1, 1, 1, 1)
    assert r.n_sharp == 3

    # gentle turn is NOT sharp: a=(2,0) b=(2,1) -> cross=2, dot=4
    df2 = spark.createDataFrame(
        [("g", 0, 0, 0), ("g", 1, 2, 0), ("g", 2, 4, 1)],
        "traj_id string, t long, x long, y long")
    g = spatial.turn_stats(df2).collect()[0]
    assert (g.n_turns, g.n_left, g.n_sharp) == (1, 1, 0)
