"""Round-5 session-6 unit pins: SSSP (Bellman-Ford relax rounds) and
pairwise box NMS (both hash-oracled as driver queries)."""


def _dist(spark, edges, pred, **kw):
    from data_cube_utilities_spark.operators import graph

    df = spark.createDataFrame(edges, "src long, dst long, w long")
    return {r.node: r.dist for r in
            graph.sssp(df, pred, weight_col="w", **kw).collect()}


def test_sssp_weighted_shortcut(spark):
    # 1 -> 2 -> 3 costs 1+1; direct 1 -> 3 costs 5: relax must prefer 2
    edges = [(1, 2, 1), (2, 3, 1), (1, 3, 5), (3, 4, 2), (9, 1, 7)]
    d = _dist(spark, edges, lambda n: n == 1)
    assert d == {1: 0, 2: 1, 3: 2, 4: 4}  # 9 unreachable FROM 1


def test_sssp_multi_source_and_hops(spark):
    from data_cube_utilities_spark.operators import graph

    edges = [(1, 2, 99), (2, 3, 99), (10, 3, 99)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    # no weight_col -> hop counts; sources 1 AND 10
    d = {r.node: r.dist for r in
         graph.sssp(df, lambda n: (n == 1) | (n == 10)).collect()}
    assert d == {1: 0, 10: 0, 2: 1, 3: 1}  # 3 via 10 beats 3 via 1->2


def test_sssp_long_chain_reaches_fixpoint(spark):
    # a 12-hop chain: needs 12 relax rounds; cap is generous
    edges = [(i, i + 1, 1) for i in range(12)]
    d = _dist(spark, edges, lambda n: n == 0, max_rounds=20)
    assert d[12] == 12 and len(d) == 13


def test_sssp_round_cap_truncates(spark):
    # max_rounds=2 stops early: node 3 sees the 2-round bound only
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1)]
    d = _dist(spark, edges, lambda n: n == 0, max_rounds=2)
    assert d == {0: 0, 1: 1, 2: 2}


def _nms(spark, rows, **kw):
    from data_cube_utilities_spark.operators import rasterops

    df = spark.createDataFrame(
        rows, "img long, box_id long, x1 long, y1 long, "
              "x2 long, y2 long, score long")
    return sorted(r.box_id for r in rasterops.box_nms(df, **kw).collect())


def test_box_nms_higher_score_survives(spark):
    rows = [(0, 1, 0, 0, 10, 10, 90),   # winner
            (0, 2, 1, 1, 11, 11, 50),   # IoU ~0.68 with box 1 -> dropped
            (0, 3, 50, 50, 60, 60, 10)]  # disjoint -> kept
    assert _nms(spark, rows) == [1, 3]


def test_box_nms_tie_breaks_to_lower_id(spark):
    rows = [(0, 7, 0, 0, 10, 10, 50), (0, 4, 0, 0, 10, 10, 50)]
    assert _nms(spark, rows) == [4]


def test_box_nms_iou_threshold_is_strict(spark):
    # identical half-overlap: inter=50, union=150 -> IoU=1/3
    rows = [(0, 1, 0, 0, 10, 10, 90), (0, 2, 5, 0, 15, 10, 50)]
    # thr=1/3: 50*3 > 150*1 is FALSE (strict >) -> box 2 kept
    assert _nms(spark, rows, iou_num=1, iou_den=3) == [1, 2]
    # thr just below 1/3 -> suppressed
    assert _nms(spark, rows, iou_num=33, iou_den=100) == [1]


def test_box_nms_pairwise_semantics_pinned(spark):
    # chain a>b>c where a overlaps b, b overlaps c, a disjoint from c:
    # greedy would re-admit c (its only suppressor b died); the pairwise
    # form documented in the docstring drops c too.  Pin the divergence.
    rows = [(0, 1, 0, 0, 10, 10, 90),
            (0, 2, 5, 0, 15, 10, 80),
            (0, 3, 10, 0, 20, 10, 70)]
    assert _nms(spark, rows, iou_num=1, iou_den=4) == [1]


def test_box_nms_images_are_independent(spark):
    rows = [(0, 1, 0, 0, 10, 10, 90), (1, 2, 0, 0, 10, 10, 10)]
    assert _nms(spark, rows) == [1, 2]


def _holt(spark, xs, **kw):
    from data_cube_utilities_spark.operators import temporal

    df = spark.createDataFrame(
        [(1, t, x) for t, x in enumerate(xs)], "g long, t long, v long")
    return sorted(temporal.holt_smooth(df, ["g"], **kw).collect(),
                  key=lambda r: r.t)


def test_holt_constant_series_is_flat(spark):
    rows = _holt(spark, [40] * 6)
    assert all(r.level_q16 == 40 * 65536 and r.trend_q16 == 0
               for r in rows)


def test_holt_declining_series_negative_trend(spark):
    rows = _holt(spark, [100, 0])
    # l2 = (0 + 3*6553600)//4 = 4915200; b2 = (4915200-6553600)//5
    assert rows[1].level_q16 == 4915200
    assert rows[1].trend_q16 == -327680


def test_holt_truncates_toward_zero_like_duckdb(spark):
    # scale=1: l2 = 9//4 = 2, trend numerator = 2-3 = -1: -1//5 must be
    # 0 (truncate, DuckDB //), NOT -1 (floor)
    rows = _holt(spark, [3, 0], scale=1)
    assert rows[1].level_q16 == 2 and rows[1].trend_q16 == 0


def _decomp(spark, xs, period):
    from data_cube_utilities_spark.operators import temporal

    df = spark.createDataFrame(
        [(1, t, x) for t, x in enumerate(xs)], "g long, t long, v long")
    return sorted(temporal.seasonal_decompose(
        df, ["g"], period=period).collect(), key=lambda r: r.t)


def test_seasonal_pure_period3_signal(spark):
    sc = 65536
    xs = [(t % 3) * 3 for t in range(9)]   # 0,3,6 repeating
    rows = _decomp(spark, xs, period=3)
    # edges: no full window
    assert rows[0].trend_q16 is None and rows[-1].trend_q16 is None
    interior = rows[1:-1]
    assert all(r.trend_q16 == 3 * sc for r in interior)
    assert all(r.resid_q16 == 0 for r in interior)
    seas = {r.t % 3: r.seasonal_q16 for r in interior}
    assert seas == {0: -3 * sc, 1: 0, 2: 3 * sc}


def test_seasonal_even_period_rejected(spark):
    import pytest
    from data_cube_utilities_spark.operators import temporal

    df = spark.createDataFrame([(1, 0, 1)], "g long, t long, v long")
    with pytest.raises(ValueError):
        temporal.seasonal_decompose(df, ["g"], period=4)


def _bilat(spark, cells, **kw):
    from data_cube_utilities_spark.operators import spatial

    df = spark.createDataFrame(cells, "ix long, iy long, v long")
    return {(r.ix, r.iy): r.smooth_v
            for r in spatial.bilateral_filter_grid(df, **kw).collect()}


def test_bilateral_flat_field_identity(spark):
    cells = [(x, y, 37) for x in range(6) for y in range(6)]
    out = _bilat(spark, cells)
    assert all(v == 37 for v in out.values())


def test_bilateral_preserves_step_edge(spark):
    # 8x6 field: left half 0, right half 100; range tent (cap 32)
    # zeroes every cross-edge weight -> NO bleed on either side
    cells = [(x, y, 0 if x < 4 else 100)
             for x in range(8) for y in range(6)]
    out = _bilat(spark, cells, range_cap=32)
    assert all(out[(x, y)] == (0 if x < 4 else 100)
               for x in range(8) for y in range(6))


def test_bilateral_damps_salt_noise(spark):
    # lone spike 10 in a 0 field IS within range_cap -> averaged down
    cells = [(x, y, 10 if (x, y) == (3, 3) else 0)
             for x in range(7) for y in range(7)]
    out = _bilat(spark, cells, range_cap=32)
    # center: num = 36*32*10, wsum = 36*32 + 220*22 -> 11520//5992 = 1
    assert out[(3, 3)] == 1
    assert out[(0, 0)] == 0   # spike outside the 5x5 window


def _areal(spark, cw, vals):
    from data_cube_utilities_spark.operators import spatial

    cells = spark.createDataFrame(cw, "src_zone long, tgt_zone long")
    zv = spark.createDataFrame(vals, "src_zone long, value long")
    return {r.tgt_zone: r for r in
            spatial.areal_interpolate(cells, zv).collect()}


def test_areal_identity_zones(spark):
    out = _areal(spark, [(1, 1), (1, 1), (2, 2)], [(1, 100), (2, 40)])
    assert out[1].value_q20 == 100 << 20
    assert out[2].value_q20 == 40 << 20


def test_areal_even_split(spark):
    cw = [(1, 10), (1, 10), (1, 20), (1, 20)]
    out = _areal(spark, cw, [(1, 100)])
    assert out[10].value_q20 == 50 << 20
    assert out[20].value_q20 == 50 << 20
    assert out[10].n_cells == 2 and out[10].n_src_zones == 1


def test_areal_floor_remainder_dropped(spark):
    cw = [(1, 10), (1, 20), (1, 30)]
    out = _areal(spark, cw, [(1, 1)])
    third = (1 * 1 * 1048576) // 3
    assert all(out[t].value_q20 == third for t in (10, 20, 30))
    assert sum(out[t].value_q20 for t in (10, 20, 30)) == 1048575


def _skel(spark, pts, rounds=8):
    from data_cube_utilities_spark.operators import rasterops

    df = spark.createDataFrame(pts, "ix long, iy long")
    return sorted((r.ix, r.iy) for r in
                  rasterops.skeletonize_grid(df, max_rounds=rounds)
                  .collect())


def _zs_ref(pts, rounds=8):
    """Pure-python Zhang-Suen reference (independent of the operator)."""
    on = set(pts)
    ring = [(0, -1), (1, -1), (1, 0), (1, 1),
            (0, 1), (-1, 1), (-1, 0), (-1, -1)]
    for _ in range(rounds):
        before = len(on)
        for step in (1, 2):
            dele = set()
            for (x, y) in on:
                p = [1 if (x + dx, y + dy) in on else 0
                     for dx, dy in ring]
                b = sum(p)
                a = sum((1 - p[i]) * p[(i + 1) % 8] for i in range(8))
                if step == 1:
                    cd = p[0] * p[2] * p[4] == 0 and \
                        p[2] * p[4] * p[6] == 0
                else:
                    cd = p[0] * p[2] * p[6] == 0 and \
                        p[0] * p[4] * p[6] == 0
                if 2 <= b <= 6 and a == 1 and cd:
                    dele.add((x, y))
            on -= dele
        if len(on) == before:
            break
    return sorted(on)


def test_skeleton_3x3_block_thins_to_center(spark):
    pts = [(x, y) for x in range(3) for y in range(3)]
    out = _skel(spark, pts)
    assert out == [(1, 1)]
    assert out == _zs_ref(pts)


def test_skeleton_thin_line_is_invariant(spark):
    pts = [(x, 0) for x in range(6)]
    assert _skel(spark, pts) == sorted(pts)


def test_skeleton_matches_pure_python_reference(spark):
    # 10x4 bar with a 3x3 nub: non-trivial fixpoint
    pts = [(x, y) for x in range(10) for y in range(4)]
    pts += [(x, y) for x in range(3, 6) for y in range(4, 7)]
    assert _skel(spark, pts) == _zs_ref(pts)


def _bm25(spark, docs, terms, **kw):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r.score for r in
            textops.bm25_topk(df, terms, **kw).collect()}


def test_bm25_exact_hand_values(spark):
    docs = [(1, "a b"), (2, "a a b c"), (3, "x y")]
    out = _bm25(spark, docs, ["a"])
    # N=3 T=8 df=2 idf_s=1500000; cleared-fraction integer divisions:
    assert out[1] == (1500000 * 44 * 1 * 8) // (20 * 8 + 48 + 18 * 2 * 3)
    assert out[2] == (1500000 * 44 * 2 * 8) // (20 * 16 + 48 + 18 * 4 * 3)
    assert 3 not in out


def test_bm25_tf_saturates(spark):
    docs = [(1, " ".join(["kw"] * 10 + ["pad"] * 10)),
            (2, " ".join(["kw"] * 100 + ["pad"] * 10)),
            (3, "other text")]
    out = _bm25(spark, docs, ["kw"])
    # more tf scores higher, but FAR less than 10x (saturation)
    assert out[2] > out[1]
    assert out[2] < 3 * out[1]


def test_bm25_length_penalty(spark):
    docs = [(1, "kw " + "pad " * 5), (2, "kw " + "pad " * 50)]
    out = _bm25(spark, docs, ["kw"])
    assert out[1] > out[2]


def _rules(spark, rows, **kw):
    from data_cube_utilities_spark.operators import sketches

    df = spark.createDataFrame(rows, "basket long, item long")
    return {(r.item_a, r.item_b): r for r in
            sketches.basket_rules(df, "basket", "item", **kw).collect()}


def test_basket_rules_exact_counts(spark):
    # baskets: {1,2} x3, {1,3} x1, {2} alone x1  (5 baskets)
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2),
            (13, 1), (13, 3), (14, 2)]
    out = _rules(spark, rows, min_count=1)
    q = 1 << 20
    r12 = out[(1, 2)]
    assert r12.pair_count == 3 and r12.count_a == 4 and r12.count_b == 4
    assert r12.support_q20 == 3 * q // 5
    assert r12.conf_a_to_b_q20 == 3 * q // 4
    # lift = 3*5/(4*4) = 15/16 < 1: weak NEGATIVE association
    assert r12.lift_q20 == 3 * 5 * q // 16
    assert out[(1, 3)].pair_count == 1


def test_basket_rules_min_count_and_dedup(spark):
    # duplicate (basket, item) rows must count once
    rows = [(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)]
    out = _rules(spark, rows, min_count=2)
    assert out[(7, 8)].pair_count == 2 and len(out) == 1


def _voro(spark, cells, sites):
    from data_cube_utilities_spark.operators import sketches

    c = spark.createDataFrame(cells, "ix long, iy long")
    s = spark.createDataFrame(sites, "site_id long, sx long, sy long")
    return {(r.ix, r.iy): (r.site_id, r.d2) for r in
            sketches.voronoi_assign(c, s).collect()}


def test_voronoi_nearest_and_tie_break(spark):
    cells = [(0, 0), (10, 0), (5, 0)]
    sites = [(2, 0, 0), (1, 10, 0)]
    out = _voro(spark, cells, sites)
    assert out[(0, 0)] == (2, 0)
    assert out[(10, 0)] == (1, 0)
    # (5,0) equidistant (d2=25): smaller site id 1 wins
    assert out[(5, 0)] == (1, 25)


def test_voronoi_single_site(spark):
    out = _voro(spark, [(3, 4)], [(9, 0, 0)])
    assert out[(3, 4)] == (9, 25)


def test_voronoi_no_sites_raises(spark):
    import pytest
    from data_cube_utilities_spark.operators import sketches

    c = spark.createDataFrame([(0, 0)], "ix long, iy long")
    s = spark.createDataFrame([], "site_id long, sx long, sy long")
    with pytest.raises(ValueError):
        sketches.voronoi_assign(c, s)


def test_voronoi_plan_is_shuffle_free(spark):
    from data_cube_utilities_spark.operators import sketches

    c = spark.range(100).selectExpr("id % 10 as ix", "id div 10 as iy")
    s = spark.createDataFrame([(1, 0, 0), (2, 9, 9)],
                              "site_id long, sx long, sy long")
    plan = sketches.voronoi_assign(c, s)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_retention_cohort_triangle(spark):
    from data_cube_utilities_spark.operators import temporal

    # period 10; user 1 first at p0, active p0+p1+p2; user 2 first p0,
    # active p0 only; user 3 first p1, active p1+p2
    ev = [(1, 0), (1, 5), (1, 12), (1, 25),
          (2, 3),
          (3, 11), (3, 29)]
    df = spark.createDataFrame(ev, "user long, t long")
    out = {(r.cohort, r.offset): r for r in
           temporal.retention_cohorts(df, period=10).collect()}
    q = 1 << 20
    assert out[(0, 0)].n_active == 2 and out[(0, 0)].rate_q20 == q
    assert out[(0, 1)].n_active == 1 and out[(0, 1)].rate_q20 == q // 2
    assert out[(0, 2)].n_active == 1
    assert out[(1, 0)].n_active == 1 and out[(1, 1)].n_active == 1
    assert (1, 2) not in out


def test_quantile_normalize_equalizes_groups(spark):
    from data_cube_utilities_spark.operators import sketches

    rows = [("a", 1, 0), ("a", 2, 10), ("a", 3, 20),
            ("b", 4, 100), ("b", 5, 110), ("b", 6, 120)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = sketches.quantile_normalize(df, "grp", "id", "v").collect()
    q = 1 << 20
    by_rank = {}
    for r in out:
        by_rank.setdefault(r.rank, set()).add(r.norm_q20)
    # after QN both groups carry identical distributions
    assert by_rank == {1: {50 * q}, 2: {60 * q}, 3: {70 * q}}


def test_quantile_normalize_tie_and_tail_ranks(spark):
    from data_cube_utilities_spark.operators import sketches

    # group a has a tie (rank by id) and one extra tail rank
    rows = [("a", 1, 5), ("a", 2, 5), ("a", 3, 9), ("b", 4, 1), ("b", 5, 3)]
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    out = {(r.grp, r.id): r for r in sketches.quantile_normalize(
        df, "grp", "id", "v").collect()}
    assert out[("a", 1)].rank == 1 and out[("a", 2)].rank == 2
    # tail rank 3 exists only in group a: mean over that group alone
    assert out[("a", 3)].norm_q20 == 9 * (1 << 20)
    assert out[("a", 1)].norm_q20 == (5 + 1) * (1 << 20) // 2


def _topo(spark, pts):
    from data_cube_utilities_spark.operators import rasterops

    df = spark.createDataFrame(pts, "label long, ix long, iy long")
    return {r.label: r for r in
            rasterops.region_topology_long(df).collect()}


def test_topology_solid_square_euler_one(spark):
    pts = [(1, x, y) for x in range(3) for y in range(3)]
    r = _topo(spark, pts)[1]
    assert (r.n_px, r.n_h, r.n_v, r.n_quads) == (9, 6, 6, 4)
    assert r.euler4 == 1          # one component, no hole


def test_topology_annulus_has_one_hole(spark):
    pts = [(1, x, y) for x in range(3) for y in range(3)
           if (x, y) != (1, 1)]
    r = _topo(spark, pts)[1]
    assert r.euler4 == 0          # 1 component - 1 hole


def test_topology_two_islands(spark):
    pts = [(1, 0, 0), (1, 5, 5)]
    r = _topo(spark, pts)[1]
    assert r.euler4 == 2          # two components, no holes


def _athresh(spark, vals, **kw):
    from data_cube_utilities_spark.operators import rasterops

    rows = [(0, x, y, v) for (x, y), v in vals.items()]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    return {(r.x, r.y): r for r in
            rasterops.adaptive_threshold_grid(df, **kw).collect()}


def test_adaptive_threshold_flat_field(spark):
    vals = {(x, y): 50 for x in range(5) for y in range(5)}
    # v == mean: strict > fails at c=0, passes with any positive c
    assert all(r.on == 0 for r in _athresh(spark, vals, radius=1,
                                           c=0).values())
    assert all(r.on == 1 for r in _athresh(spark, vals, radius=1,
                                           c=8).values())


def test_adaptive_threshold_bright_spot(spark):
    vals = {(x, y): 0 for x in range(5) for y in range(5)}
    vals[(2, 2)] = 100
    out = _athresh(spark, vals, radius=1, c=0)
    assert out[(2, 2)].on == 1            # 100*9 > 100
    assert out[(1, 2)].on == 0            # 0 > 100 fails
    assert out[(0, 0)].on == 0            # all-zero window
    assert out[(2, 2)].n_win == 9 and out[(0, 0)].n_win == 4


def _lcp(spark, cells, target, **kw):
    from data_cube_utilities_spark.operators import spatial

    df = spark.createDataFrame(
        cells, "ix long, iy long, cost long, is_source boolean")
    return sorted((r.ix, r.iy, r.acc) for r in
                  spatial.least_cost_path_grid(df, target, max_log2=4,
                                               **kw).collect())


def test_lcp_straight_corridor(spark):
    cells = [(x, 0, 1, x == 0) for x in range(5)]
    assert _lcp(spark, cells, (4, 0)) == [(x, 0, x) for x in range(5)]


def test_lcp_prefers_cheap_detour(spark):
    cells = []
    for x in range(3):
        for y in range(2):
            cost = 100 if (x, y) == (1, 0) else 1
            cells.append((x, y, cost, (x, y) == (0, 0)))
    out = _lcp(spark, cells, (2, 0))
    assert out == [(0, 0, 0), (0, 1, 1), (1, 1, 2), (2, 0, 4), (2, 1, 3)]


def test_lcp_tie_breaks_lexicographic(spark):
    cells = [(x, y, 1, (x, y) == (0, 0))
             for x in range(2) for y in range(2)]
    out = _lcp(spark, cells, (1, 1))
    # two optimal parents for (1,1): (0,1) wins over (1,0)
    assert out == [(0, 0, 0), (0, 1, 1), (1, 1, 2)]


def test_skew_profile_salt_factors(spark):
    from data_cube_utilities_spark.operators import spatial

    rows = [("a",)] * 7 + [("b",)] * 3
    df = spark.createDataFrame(rows, "k string")
    out = {r.k: r for r in spatial.skew_profile(
        df, ["k"], target_rows=4, top_k=5).collect()}
    assert out["a"].cnt == 7 and out["a"].salt_factor == 2
    assert out["b"].salt_factor == 1
    assert out["a"].share_q20 == 7 * (1 << 20) // 10


def test_confusion_metrics_hand_case(spark):
    from data_cube_utilities_spark.operators import mlops

    pairs = [(1, 1), (1, 1), (1, 2), (2, 2), (2, 1), (3, 3), (4, 1)]
    df = spark.createDataFrame(pairs, "label long, pred long")
    out = {r.cls: r for r in mlops.confusion_metrics(df).collect()}
    q = 1 << 20
    c1 = out[1]
    assert (c1.tp, c1.fp, c1.fn) == (2, 2, 1)
    assert c1.precision_q20 == 2 * q // 4 and c1.recall_q20 == 2 * q // 3
    assert c1.f1_q20 == 4 * q // 7
    assert out[3].f1_q20 == q                 # perfect class
    c4 = out[4]                               # never predicted
    assert c4.n_pred == 0 and c4.precision_q20 is None
    assert c4.recall_q20 == 0


def test_calibration_bins_exact(spark):
    from data_cube_utilities_spark.operators import mlops

    q = 1 << 20
    rows = [(0, 0), (110000, 1),              # bins 0 and 1
            (q // 2, 1), (q // 2 + 100, 0),   # bin 5 twice
            (q, 1)]                           # score == 2^20 clamps to 9
    df = spark.createDataFrame(rows, "score_q20 long, label long")
    out = {r.bin: r for r in
           mlops.calibration_bins(df, n_bins=10).collect()}
    assert set(out) == {0, 1, 5, 9}
    b5 = out[5]
    assert b5.n == 2 and b5.n_pos == 1
    assert b5.mean_score_q20 == (q // 2 + q // 2 + 100) // 2
    assert b5.pos_rate_q20 == q // 2
    assert out[9].n == 1


def test_image_quality_flat_vs_noisy(spark):
    from data_cube_utilities_spark.operators import rasterops

    rows = [(0, x, y, 100) for x in range(4) for y in range(4)]
    # img 1: checkerboard 0/200 -> every interior Laplacian = +-800
    rows += [(1, x, y, 200 if (x + y) % 2 == 0 else 0)
             for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    out = {r.img: r for r in rasterops.image_quality_long(df).collect()}
    assert out[0].lap_energy == 0 and out[0].n_interior == 4
    assert out[1].lap_energy == 800 * 800
    assert out[0].vmin == 100 and out[1].vmax == 200


def test_image_quality_clipping_fractions(spark):
    from data_cube_utilities_spark.operators import rasterops

    vals = [0, 0, 255, 100]       # 2 crushed, 1 blown, 1 fine
    rows = [(0, i, 0, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    r = rasterops.image_quality_long(df).collect()[0]
    q = 1 << 20
    assert r.clip_lo_q20 == 2 * q // 4 and r.clip_hi_q20 == q // 4
    assert r.n_interior == 0 and r.lap_energy == 0


def test_gravity_flows_exact(spark):
    from data_cube_utilities_spark.operators import spatial

    o = spark.createDataFrame([(1, 0, 0, 10), (2, 100, 100, 5)],
                              "o_id long, x long, y long, mass_o long")
    d = spark.createDataFrame([(7, 3, 4, 20), (8, 0, 0, 9)],
                              "d_id long, x long, y long, mass_d long")
    out = {(r.o_id, r.d_id): r for r in
           spatial.gravity_flows(o, d, max_d2=100).collect()}
    # o1-d7: d2=25, flow = 10*20*2^20 // 25
    assert out[(1, 7)].flow_q20 == 10 * 20 * (1 << 20) // 25
    # o1-d8: d2=0 excluded; o2 beyond max_d2: excluded
    assert set(out) == {(1, 7)}


def test_zorder_ranges_full_grid_single_range():
    from data_cube_utilities_spark import cells

    assert cells.zorder_bbox_ranges(0, 255, 0, 255, bits=8) == \
        [(0, 256 * 256 - 1)]


def test_zorder_ranges_single_cell():
    from data_cube_utilities_spark import cells

    z = int(cells.zorder_np(13, 57, 8))
    assert cells.zorder_bbox_ranges(13, 13, 57, 57, bits=8) == [(z, z)]


def test_zorder_ranges_cover_and_disjoint():
    from data_cube_utilities_spark import cells

    rng = cells.zorder_bbox_ranges(3, 20, 7, 15, bits=6)
    # sorted, disjoint
    assert all(rng[i][1] < rng[i + 1][0] for i in range(len(rng) - 1))
    covered = set()
    for lo, hi in rng:
        covered.update(range(lo, hi + 1))
    for ix in range(3, 21):
        for iy in range(7, 16):
            assert int(cells.zorder_np(ix, iy, 6)) in covered


def test_zorder_ranges_coalesce_to_cap():
    from data_cube_utilities_spark import cells

    rng = cells.zorder_bbox_ranges(3, 20, 7, 15, bits=6, max_ranges=2)
    assert len(rng) <= 2
    for ix in range(3, 21):            # widening never drops a hit
        for iy in range(7, 16):
            z = int(cells.zorder_np(ix, iy, 6))
            assert any(lo <= z <= hi for lo, hi in rng)


def test_zorder_range_scan_equals_naive(spark):
    from data_cube_utilities_spark import cells
    from pyspark.sql import functions as F

    pts = [(i, -40.0 + i * 1.7, -90.0 + i * 3.1) for i in range(100)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = sorted(r.id for r in cells.zorder_range_scan(
        df, "lat", "lon", -20.0, 30.0, -50.0, 60.0,
        bits=7, max_ranges=4).collect())
    ix0, iy_a = cells._quant_py(30.0, -50.0, 7)
    ix1, iy_b = cells._quant_py(-20.0, 60.0, 7)
    iy0, iy1 = min(iy_a, iy_b), max(iy_a, iy_b)
    ix, iy = cells._quant_col(F.col("lat"), F.col("lon"), 7)
    naive = sorted(r.id for r in
                   df.withColumn("ix", ix).withColumn("iy", iy)
                     .filter(F.col("ix").between(ix0, ix1)
                             & F.col("iy").between(iy0, iy1)).collect())
    assert got == naive and len(got) > 0


def test_twa_hand_case_and_single_obs(spark):
    from data_cube_utilities_spark.operators import temporal

    q = 1 << 20
    rows = [(1, 0, 10), (1, 10, 30), (1, 20, 99), (2, 5, 42)]
    df = spark.createDataFrame(rows, "grp long, t long, v long")
    out = {r.grp: r for r in
           temporal.time_weighted_avg(df, ["grp"]).collect()}
    assert out[1].twa_q20 == (10 * 10 + 30 * 10) * q // 20
    assert out[2].twa_q20 is None and out[2].n == 1


def test_twa_duplicate_timestamps_deterministic(spark):
    from data_cube_utilities_spark.operators import temporal

    q = 1 << 20
    rows = [(1, 0, 7), (1, 0, 5), (1, 10, 1)]
    df = spark.createDataFrame(rows, "grp long, t long, v long")
    r = temporal.time_weighted_avg(df, ["grp"]).collect()[0]
    # (t,v) order: 5 gets dt=0, 7 gets dt=10 -> num=70
    assert r.twa_q20 == 70 * q // 10


def test_ohlc_open_close_ties(spark):
    from data_cube_utilities_spark.operators import temporal

    rows = [(1, 0, 5), (1, 0, 3), (1, 1, 9), (1, 600, 2)]
    df = spark.createDataFrame(rows, "grp long, t long, v long")
    out = {r.bucket: r for r in
           temporal.ohlc_bars(df, ["grp"], bucket=512).collect()}
    b0 = out[0]
    assert (b0.open, b0.high, b0.low, b0.close) == (3, 9, 3, 9)
    assert b0.n_ticks == 3 and b0.vsum == 17
    assert out[1].open == out[1].close == 2


def test_tasseled_cap_exact_dot(spark):
    from data_cube_utilities_spark.operators import indices

    row = [(100, 200, 300, 400, 500, 600)]
    df = spark.createDataFrame(
        row, "blue long, green long, red long, nir long, "
             "swir1 long, swir2 long")
    out = df.select(
        *[indices.tasseled_cap_col(c).alias(c)
          for c in ("brightness", "greenness", "wetness")]).collect()[0]
    bands = row[0]
    for comp in ("brightness", "greenness", "wetness"):
        coef = indices.TASSELED_CAP_Q4[comp]
        assert getattr(out, comp) == sum(c * b for c, b in
                                         zip(coef, bands))


def test_downsample_mode_tie_to_smallest_class(spark):
    from data_cube_utilities_spark.operators import spatial

    cells = [(0, 0, 5), (1, 0, 5), (0, 1, 9), (1, 1, 9),  # block (0,0): tie
             (2, 0, 3), (3, 0, 3), (2, 1, 3), (3, 1, 7)]  # block (1,0): 3
    df = spark.createDataFrame(cells, "ix long, iy long, v long")
    out = {(r.px, r.py): r for r in
           spatial.downsample_mode_grid(df, factor=2).collect()}
    assert out[(0, 0)].mode_v == 5 and out[(0, 0)].n_classes == 2
    assert out[(1, 0)].mode_v == 3 and out[(1, 0)].n_cells == 4


def test_normalize_text_canonical_form(spark):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame([(1, "  Foo,,  BAR!! 42 "),
                                (2, "foo bar 42")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in textops.normalize_text(df).collect()}
    assert out[1].norm_text == "foo bar 42"
    # trivially-different bytes collapse to the SAME dedup key
    assert out[1].norm_hash == out[2].norm_hash
    assert out[1].n_norm_chars == 10


def test_rfm_scores_exact_quintiles(spark):
    from data_cube_utilities_spark.operators import sketches

    # 10 users, one order each: amount == recency == user -> rank = user
    rows = [(u, u, u) for u in range(1, 11)]
    df = spark.createDataFrame(rows, "user long, t long, amount long")
    out = {r.user: r for r in
           sketches.rfm_segments(df, "user", "t", "amount").collect()}
    # rank r -> score 1 + (r-1)*5 div 10: users 1-2 -> 1 ... 9-10 -> 5
    for u in range(1, 11):
        want = 1 + (u - 1) * 5 // 10
        assert out[u].r_score == want and out[u].m_score == want
    assert out[10].rfm == 100 * 5 + 10 * out[10].f_score + 5
    # all frequencies tie at 1: ranks break by user id, still 1..5 spread
    assert sorted(out[u].f_score for u in range(1, 11)) == \
        [1, 1, 2, 2, 3, 3, 4, 4, 5, 5]


def test_stratified_sample_exact_quotas(spark):
    from data_cube_utilities_spark.operators import sketches

    rows = [(i, "a" if i < 70 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sketches.stratified_exact_sample(df, "lang", "doc_id", 10) \
        .collect()
    by = {}
    for r in out:
        by.setdefault(r.stratum, []).append(r.doc_id)
    assert len(by["a"]) == 7 and len(by["b"]) == 3
    # determinism under repartition
    out2 = sketches.stratified_exact_sample(
        df.repartition(13), "lang", "doc_id", 10).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in out2)


def test_stratified_sample_largest_remainder(spark):
    from data_cube_utilities_spark.operators import sketches

    # strata sizes 5 / 3 / 2, take 7: bases 3/2/1 (floor of 3.5/2.1/1.4),
    # remainder 1 seat -> largest fractional part = stratum 'a' (.5)
    rows = ([(i, "a") for i in range(5)] + [(10 + i, "b") for i in range(3)]
            + [(20 + i, "c") for i in range(2)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sketches.stratified_exact_sample(df, "lang", "doc_id", 7) \
        .collect()
    cnt = {}
    for r in out:
        cnt[r.stratum] = cnt.get(r.stratum, 0) + 1
    assert cnt == {"a": 4, "b": 2, "c": 1}


def test_containment_catches_wrapper(spark):
    from data_cube_utilities_spark.operators import textops

    short = "alpha beta gamma delta epsilon"
    longd = ("intro text here " + short + " and a very long tail "
             + " ".join(f"w{i}" for i in range(40)))
    df = spark.createDataFrame([(1, short), (2, longd), (3, "x y z q")],
                               "doc_id long, text string")
    out = {(r.doc_a, r.doc_b): r for r in
           textops.containment_dedup_pairs(df, 900000).collect()}
    r = out[(1, 2)]
    q = 1 << 20
    assert r.contain_a_q20 == q        # short fully inside long
    assert r.contain_b_q20 < q // 2    # but Jaccard-style symmetric low
    assert (1, 3) not in out and (2, 3) not in out


def test_markov_transitions_exact(spark):
    from data_cube_utilities_spark.operators import temporal

    ev = [(1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
          (2, 0, "a"), (2, 1, "b")]
    df = spark.createDataFrame(ev, "u long, t long, state string")
    out = {(r.state, r.next_state): r for r in
           temporal.markov_transitions(df, ["u"]).collect()}
    q = 1 << 20
    ab = out[("a", "b")]
    assert ab.n == 2 and ab.p_q20 == 2 * q // 3
    assert ab.is_top_next == 1
    assert out[("a", "c")].is_top_next == 0
    assert out[("b", "a")].n == 1      # last events have no successor


def test_abc_classes_exact_boundaries(spark):
    from data_cube_utilities_spark.operators import sketches

    # values 80, 15, 5: cum shares 80%, 95%, 100%
    rows = [(1, 80), (2, 15), (3, 5)]
    df = spark.createDataFrame(rows, "item long, v long")
    out = {r.item: r for r in
           sketches.abc_analysis(df, "item", "v").collect()}
    assert out[1].abc_class == "A"     # 80*5 <= 4*100 inclusive
    assert out[2].abc_class == "B"     # 95*20 <= 19*100 inclusive
    assert out[3].abc_class == "C"
    assert out[1].rank == 1 and out[3].cum_share_q20 == 1 << 20


def test_table_diff_statuses(spark):
    from data_cube_utilities_spark.sources import snapshots

    l = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long")
    r = spark.createDataFrame(
        [(1, "a", 10),          # same
         (2, "B", 20),          # changed: s only
         (4, None, 41),         # changed: v only (NULL-safe s compare)
         (5, "e", 50)],         # added; 3 deleted
        "k long, s string, v long")
    out = {row.status: row for row in
           snapshots.table_diff(spark, l, r, ["k"]).collect()}
    assert out["same"].n_keys == 1
    assert out["added"].n_keys == 1 and out["deleted"].n_keys == 1
    ch = out["changed"]
    assert ch.n_keys == 2
    assert ch.n_changed_s == 1 and ch.n_changed_v == 1


def test_minmax_decimate_envelope(spark):
    from data_cube_utilities_spark.operators import temporal

    # one series, 16 points, spike at t=5: the spike MUST survive
    vals = [10] * 16
    vals[5] = 99
    vals[12] = 1
    rows = [(1, t, v) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp long, t long, v long")
    out = temporal.minmax_decimate(df, ["grp"], n_buckets=4).collect()
    got = {(r.t, r.v, r.kind) for r in out}
    assert (5, 99, "max") in got
    assert (12, 1, "min") in got
    # constant bucket emits ONE 'both' row (bucket 0 = t 0..3)
    assert (0, 10, "both") in got
    # constant bucket 2 (t 8..11, all 10s): 'both' at earliest t
    assert (8, 10, "both") in got


def test_unsharp_mask_flat_and_spike(spark):
    from data_cube_utilities_spark.operators import rasterops

    rows = [(0, x, y, 50) for x in range(7) for y in range(7)]
    rows += [(1, x, y, 100 if (x, y) == (3, 3) else 0)
             for x in range(7) for y in range(7)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    out = {(r.img, r.x, r.y): r.sharp_v for r in
           rasterops.unsharp_mask_grid(df, radius=2, k_num=1,
                                       k_den=2).collect()}
    # flat field: highpass 0 everywhere -> identity
    assert all(out[(0, x, y)] == 50 for x in range(7) for y in range(7))
    # spike center: hp = 100*25-100 = 2400, +2400//50 = +48
    assert out[(1, 3, 3)] == 148
    # dark neighbor: hp = -100 -> -2, clamped at 0
    assert out[(1, 2, 3)] == 0


def test_surprisal_constant_vs_uniform(spark):
    from data_cube_utilities_spark.operators import sketches

    rows = [("c", 7)] * 4 + [("u", v) for v in (1, 2, 3, 4)]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r.grp: r for r in
           sketches.surprisal_profile(df, ["grp"], "v").collect()}
    assert out["c"].entropy_bits_q20 == 0          # one value dominates
    # 4 uniform singletons: exactly 2 bits (bitlen(4)-bitlen(1) = 2)
    assert out["u"].entropy_bits_q20 == 2 << 20
    assert out["u"].n_distinct == 4 and out["c"].top_cnt == 4


def _hex_py(x, y, size):
    """Independent python twin of the axial cube-round encoder."""
    import math

    s3 = 3.0 ** 0.5
    qf = (x * (s3 / 3.0) - y * (1.0 / 3.0)) / size
    rf = (y * (2.0 / 3.0)) / size
    sf = -qf - rf
    rq, rr, rs = (math.floor(t + 0.5) for t in (qf, rf, sf))
    dq, dr, ds = abs(rq - qf), abs(rr - rf), abs(rs - sf)
    if dq > dr and dq > ds:
        rq = -rr - rs
    elif dr > ds:
        rr = -rq - rs
    return int(rq), int(rr)


def test_hex_encode_matches_python_twin(spark):
    from pyspark.sql import functions as F
    from data_cube_utilities_spark import cells

    pts = [(i, -31.0 + i * 2.37, -47.0 + i * 3.11) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    qc, rc = cells.hex_encode_cols(F.col("x"), F.col("y"), 5.0)
    got = {r.id: (r.q, r.r) for r in
           df.select("id", qc.alias("q"), rc.alias("r")).collect()}
    for i, x, y in pts:
        assert got[i] == _hex_py(x, y, 5.0)


def test_hex_cell_stats_ring1_adjacency(spark):
    from data_cube_utilities_spark import cells

    s3 = 3.0 ** 0.5
    size = 2.0

    def center(q, r):
        return (size * s3 * (q + r / 2.0), size * 1.5 * r)

    # cells (0,0) and (1,0) touch; (5,5) is isolated
    pts = [center(0, 0), center(0, 0), center(1, 0), center(5, 5)]
    df = spark.createDataFrame(pts, "x double, y double")
    out = {(r.q, r.r): r for r in
           cells.hex_cell_stats(df, "x", "y", size).collect()}
    assert out[(0, 0)].n_points == 2
    assert out[(0, 0)].n_occupied_neighbors == 1
    assert out[(1, 0)].n_occupied_neighbors == 1
    assert out[(5, 5)].n_occupied_neighbors == 0


def test_streaming_kmv_multibatch_equals_batch_twin(spark, tmp_path):
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import sketches
    from data_cube_utilities_spark.streaming import stateful

    rows = [(f"g{i % 3}", f"val-{i % 40}") for i in range(300)]
    df = spark.createDataFrame(rows, "grp string, v string")
    hashed = df.select("grp", sketches.kmv_hash_col("v").alias("hv"))
    d = str(tmp_path / "kmv")
    hashed.repartition(5).write.parquet(d)   # 5 files -> 5 micro-batches

    stream = (spark.readStream.schema("grp string, hv long")
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (stateful.streaming_kmv(stream, k=8)
         .writeStream.format("memory").queryName("kmvtest")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    settled = (spark.sql(
        "SELECT grp, n_kept, kth, est_distinct FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY grp"
        "    ORDER BY n_kept DESC, kth ASC) AS rn FROM kmvtest) WHERE rn = 1")
        .toPandas().sort_values("grp").reset_index(drop=True))
    twin = (stateful.kmv_batch_twin(spark.read.parquet(d), k=8)
            .toPandas().sort_values("grp").reset_index(drop=True))
    assert settled.equals(twin[settled.columns])
    # 40 distinct values over 3 groups: sketch saturated (k=8), so the
    # estimate is the (k-1)/kth form, not the lossless count
    assert (settled.n_kept == 8).all()


def test_winnow_guarantee_and_tie_rule(spark):
    from data_cube_utilities_spark.operators import textops

    # two docs sharing a 6-token run: with k=3, w=4 every match of
    # length >= w+k-1 = 6 tokens MUST share a fingerprint
    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [(1, "xx yy " + shared + " tail1 tail2"),
         (2, shared + " other words here"),
         (3, "completely different tokens entirely present")],
        "doc_id long, text string")
    out = textops.winnow_fingerprints(df, k=3, w=4).collect()
    by = {}
    for r in out:
        by.setdefault(r.id, set()).add(r.fp_hash)
    assert by[1] & by[2]                     # the guarantee
    assert not (by[3] & (by[1] | by[2]))
    # density: ~2/w of k-grams selected, never more than n - w + 1
    assert 0 < len(by[1]) <= 8


def test_winnow_short_doc_keeps_global_min(spark):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame([(1, "a b c d")],  # 2 k-grams < w
                               "doc_id long, text string")
    out = textops.winnow_fingerprints(df, k=3, w=4).collect()
    assert len(out) == 1 and out[0].pos in (0, 1)


def test_weighted_median_exact(spark):
    from data_cube_utilities_spark.operators import sketches

    # values 1 (w 1), 5 (w 2), 9 (w 1): total 4, 2*cumw>=4 first at 5
    rows = [(1, 1, 1), (1, 5, 2), (1, 9, 1),
            # heavy tail: w(9) = 10 dominates
            (2, 1, 1), (2, 9, 10)]
    df = spark.createDataFrame(rows, "grp long, v long, wt long")
    out = {r.grp: r for r in
           sketches.weighted_median(df, ["grp"], "v", "wt").collect()}
    assert out[1].wmedian == 5 and out[1].total_w == 4
    assert out[2].wmedian == 9


def test_rake_phrases_and_scores(spark):
    from data_cube_utilities_spark.operators import textops

    # "red panda" twice, "red fox" once; 'the'/'is' are stopwords
    df = spark.createDataFrame(
        [(1, "the red panda is a red panda"), (2, "the red fox")],
        "doc_id long, text string")
    out = {(r.id, r.phrase): r for r in
           textops.rake_keywords(df, min_words=2).collect()}
    q = 1 << 20
    # freq(red)=3, deg(red)=2+2+2=6 -> 2q; panda: 2q; fox: 2q
    assert out[(1, "red panda")].score_q20 == 4 * q
    assert out[(2, "red fox")].score_q20 == 4 * q
    assert out[(1, "red panda")].n_words == 2


def test_rake_single_word_phrases_filtered(spark):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame([(1, "alpha the beta")],
                               "doc_id long, text string")
    assert textops.rake_keywords(df, min_words=2).count() == 0
    assert textops.rake_keywords(df, min_words=1).count() == 2


def test_readability_exact_terms(spark):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame(
        [(1, "See the cat. It sat!"), (2, "zzz qqq")],
        "doc_id long, text string")
    out = {r.id: r for r in
           textops.readability_scores(df).collect()}
    r1 = out[1]
    assert (r1.n_words, r1.n_sentences) == (5, 2)
    # vowel groups: see(ee) the(e) cat(a) it(i) sat(a) = 5
    assert r1.n_syllables == 5
    q = 1 << 20
    want = (206835 * q) // 1000 - (1015 * 5 * q) // (1000 * 2) \
        - (846 * 5 * q) // (10 * 5)
    assert r1.flesch_q20 == want
    assert out[2].n_syllables == 0 and out[2].n_sentences == 1
