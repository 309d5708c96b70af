"""Round-5 session-7 unit pins: integer 4x4 block DCT and the
exact-gini decision stump (both hash-oracled as driver queries)."""

from pyspark.sql import functions as F


def _px(spark, quads):
    """One 4x4 image from a row-major 16-list."""
    rows = [(0, x, y, int(quads[y * 4 + x]))
            for y in range(4) for x in range(4)]
    return spark.createDataFrame(rows, "img long, px long, py long, val long")


def _dct(spark, quads, q=8):
    from data_cube_utilities_spark.operators import rasterops

    out = rasterops.int_dct_blocks_long(_px(spark, quads), q=q).collect()
    assert len(out) == 1
    return out[0]


def test_dct_constant_block_is_pure_dc(spark):
    r = _dct(spark, [7] * 16)
    assert r.dc == 16 * 7          # C row 0 is all ones
    assert r.ac_energy == 0
    assert r.n_nonzero == 1        # only q00 = 112 div 8 = 14
    assert r.q00 == 14 and r.q33 == 0


def test_dct_impulse_is_outer_product_of_first_column(spark):
    # X = delta at (row 0, col 0): Y[u][v] = C[u][0] * C[v][0]
    from data_cube_utilities_spark.operators.rasterops import DCT4_C

    r = _dct(spark, [1] + [0] * 15, q=1)
    for u in range(4):
        for v in range(4):
            assert getattr(r, f"q{u}{v}") == DCT4_C[u][0] * DCT4_C[v][0]


def test_dct_linearity_and_negative_quantization(spark):
    # doubling the image doubles every raw coefficient; the ramp has a
    # negative horizontal AC coefficient, exercising truncate-toward-zero
    ramp = [x * 10 for y in range(4) for x in range(4)]
    r1, r2 = _dct(spark, ramp, q=1), _dct(spark, [2 * v for v in ramp], q=1)
    for u in range(4):
        for v in range(4):
            assert getattr(r2, f"q{u}{v}") == 2 * getattr(r1, f"q{u}{v}")
    assert r1.q01 < 0              # increasing-in-x ramp: C[1] row is 2,1,-1,-2
    # truncate toward zero: -d div q == -(d div q)
    rq = _dct(spark, ramp, q=7)
    assert rq.q01 == -((-r1.q01 * 1) // 7) if r1.q01 < 0 else True


def test_dct_multi_block_grid_keys(spark):
    # an 8x4 image = two horizontally adjacent blocks, distinct bx
    rows = [(0, x, y, 5) for y in range(4) for x in range(8)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    from data_cube_utilities_spark.operators import rasterops

    out = {(r.bx, r.by): r for r in
           rasterops.int_dct_blocks_long(df).collect()}
    assert set(out) == {(0, 0), (1, 0)}
    assert all(r.dc == 80 for r in out.values())


def _stump(spark, rows, **kw):
    from data_cube_utilities_spark.operators import mlops

    df = spark.createDataFrame(rows, "grp string, x long, y long")
    return {r.grp: r for r in
            mlops.decision_stump(df, "x", "y", ["grp"], **kw).collect()}


def test_stump_perfect_split_has_zero_cost(spark):
    rows = [("a", x, 0) for x in (1, 2, 3)] + \
           [("a", x, 1) for x in (10, 11, 12)]
    r = _stump(spark, rows)["a"]
    assert r.threshold == 3 and r.cost_q20 == 0
    assert (r.n_left, r.pos_left, r.n_right, r.pos_right) == (3, 0, 3, 3)


def test_stump_tie_breaks_to_smaller_threshold(spark):
    # all-same-label group: every split costs 0 -> smallest x wins
    rows = [("b", x, 1) for x in (4, 5, 6)]
    r = _stump(spark, rows)["b"]
    assert r.threshold == 4 and r.cost_q20 == 0


def test_stump_excludes_empty_right_split(spark):
    # max x is never a threshold (right side would be empty)
    rows = [("c", 1, 0), ("c", 2, 1)]
    r = _stump(spark, rows)["c"]
    assert r.threshold == 1


def test_stump_cost_matches_hand_gini(spark):
    # left {0,1} right {1}: cost = (4-1-1)*S div 2 + 0 = S
    rows = [("d", 1, 0), ("d", 1, 1), ("d", 9, 1)]
    r = _stump(spark, rows)["d"]
    assert r.cost_q20 == (1 << 20)
    assert r.threshold == 1


def _motifs(spark, vals, **kw):
    from data_cube_utilities_spark.operators import temporal

    rows = [("g", t + 1, int(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, t long, v long")
    return {r.i: r for r in
            temporal.sad_motifs(df, ["grp"], "t", "v", w=8).collect()}


def test_motif_finds_planted_exact_repeat(spark):
    pat = [5, 9, 1, 7, 3, 8, 2, 6]
    ser = [0] * 30
    ser[2:10] = pat          # window starting at rank 3
    ser[19:27] = pat         # window starting at rank 20
    m = _motifs(spark, ser)
    assert m[3].nn_j == 20 and m[3].nn_sad == 0
    assert m[20].nn_j == 3 and m[20].nn_sad == 0


def test_motif_tie_breaks_to_smaller_j(spark):
    m = _motifs(spark, [4] * 24)   # all windows identical: sad always 0
    assert m[1].nn_j == 9          # smallest eligible j for i=1
    assert m[17].nn_j == 1         # backward direction allowed


def test_motif_exclusion_zone_and_coverage(spark):
    # 16 points -> 9 windows; |i-j| >= 8 leaves only the pair (1, 9)
    m = _motifs(spark, list(range(16)))
    assert set(m) == {1, 9}
    assert m[1].nn_j == 9 and m[9].nn_j == 1
    # monotone ramp: windows 1 and 9 differ by 8 everywhere -> sad 64
    assert m[1].nn_sad == 64


def _fd(spark, rows, lhs, rhs):
    from data_cube_utilities_spark.sources.catalog import fd_violations

    df = spark.createDataFrame(rows, "a long, b long, c string")
    return fd_violations(df, lhs, rhs).collect()[0]


def test_fd_holds(spark):
    r = _fd(spark, [(1, 1, "x"), (1, 1, "x"), (2, 1, "y")], ["a"], "c")
    assert r.holds and r.n_violating_keys == 0 and r.n_keys == 2
    assert r.max_distinct_rhs == 1


def test_fd_violated_with_blast_radius(spark):
    rows = [(1, 0, "x"), (1, 0, "y"), (1, 0, "y"), (2, 0, "z")]
    r = _fd(spark, rows, ["a"], "c")
    assert not r.holds
    assert r.n_violating_keys == 1 and r.n_rows_in_violations == 3
    assert r.max_distinct_rhs == 2


def test_fd_composite_lhs(spark):
    rows = [(1, 1, "x"), (1, 2, "y"), (1, 2, "y")]
    r = _fd(spark, rows, ["a", "b"], "c")
    assert r.holds and r.n_keys == 2


def _grid_df(spark, imgs):
    """imgs: {img_id: 2-D list [y][x]} -> long-form pixel frame."""
    rows = [(i, x, y, int(g[y][x]))
            for i, g in imgs.items()
            for y in range(len(g)) for x in range(len(g[0]))]
    return spark.createDataFrame(rows, "img long, px long, py long, val long")


def test_debayer_2x2_hand_case(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = _grid_df(spark, {0: [[10, 20], [30, 40]]})
    out = {(r.x, r.y): r for r in rasterops.debayer_grid(df).collect()}
    assert (out[(0, 0)].r, out[(0, 0)].g, out[(0, 0)].b) == (10, 25, 40)
    assert (out[(1, 0)].r, out[(1, 0)].g, out[(1, 0)].b) == (10, 20, 40)
    assert (out[(0, 1)].r, out[(0, 1)].g, out[(0, 1)].b) == (10, 30, 40)
    assert (out[(1, 1)].r, out[(1, 1)].g, out[(1, 1)].b) == (10, 25, 40)


def test_debayer_uniform_and_truncation(spark):
    from data_cube_utilities_spark.operators import rasterops

    uni = [[9] * 4 for _ in range(4)]
    out = rasterops.debayer_grid(_grid_df(spark, {0: uni})).collect()
    assert all((r.r, r.g, r.b) == (9, 9, 9) for r in out)
    # G avg at interior R center (2,2) of the ramp v = x + 4y:
    # N/S/E/W neighbors are 6, 14, 9, 11 -> truncating avg 10
    ramp = [[x + 4 * y for x in range(5)] for y in range(5)]
    o = {(r.x, r.y): r
         for r in rasterops.debayer_grid(_grid_df(spark, {0: ramp})).collect()}
    assert o[(2, 2)].g == (6 + 14 + 9 + 11) // 4
    # B at (2,2): the four diagonals 5, 13, 7, 15 -> exact 10
    assert o[(2, 2)].b == 10 and o[(2, 2)].r == 10


def _brief_py(grid, ax_, ay_):
    from data_cube_utilities_spark.operators.rasterops import BRIEF_PAIRS

    lo = hi = 0
    for i, ax, ay, bx, by in BRIEF_PAIRS:
        if grid[ay_ + ay][ax_ + ax] < grid[ay_ + by][ax_ + bx]:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return lo, hi


def test_brief_descriptor_matches_python_twin(spark):
    from data_cube_utilities_spark.operators import rasterops

    g = [[(x * 7 + y * 13 + x * y) % 256 for x in range(16)]
         for y in range(16)]
    d = {(r.x, r.y): (r.desc_lo, r.desc_hi)
         for r in rasterops.brief_descriptors(
             _grid_df(spark, {0: g})).collect()}
    assert set(d) == {(4, 4), (12, 4), (4, 12), (12, 12)}
    for (x, y), got in d.items():
        assert got == _brief_py(g, x, y), (x, y)


def test_brief_constant_image_all_zero_bits(spark):
    from data_cube_utilities_spark.operators import rasterops

    g = [[5] * 16 for _ in range(16)]
    d = rasterops.brief_descriptors(_grid_df(spark, {0: g})).collect()
    assert all(r.desc_lo == 0 and r.desc_hi == 0 for r in d)


def test_brief_matches_identical_images_zero_hamming(spark):
    from data_cube_utilities_spark.operators import rasterops

    g = [[(x * 31 + y * 17 + (x * x) % 11) % 256 for x in range(16)]
         for y in range(16)]
    desc = rasterops.brief_descriptors(_grid_df(spark, {0: g, 1: g}))
    out = rasterops.brief_matches(desc).collect()
    assert len(out) == 4 and all(r.hamming == 0 for r in out)
    # distinct descriptors -> each anchor matches its own clone
    uniq = len({(r.desc_lo, r.desc_hi) for r in desc.collect()})
    if uniq == 8:  # 4 per image, distinct within image
        assert all((r.xb, r.yb) == (r.xa, r.ya) for r in out)


def _segs(spark, rows):
    from data_cube_utilities_spark.operators import spatial

    df = spark.createDataFrame(
        rows, "seg_id long, x1 long, y1 long, x2 long, y2 long")
    return {(r.id_a, r.id_b): r
            for r in spatial.segment_intersections(df).collect()}


def test_seg_intersect_plus_cross_exact_point(spark):
    # diagonal cross at (5, 5): x = 0..10 diag vs anti-diag
    out = _segs(spark, [(0, 0, 0, 10, 10), (1, 0, 10, 10, 0)])
    r = out[(0, 1)]
    assert (r.x_num, r.y_num, r.den, r.collinear) == (
        5 * r.den, 5 * r.den, r.den, False)
    assert r.den > 0


def test_seg_intersect_disjoint_and_touching(spark):
    out = _segs(spark, [(0, 0, 0, 4, 0), (1, 0, 2, 4, 2),   # parallel
                        (2, 4, 0, 4, 6)])                    # touches 0 at (4,0)
    assert (0, 1) not in out
    r = out[(0, 2)]
    assert (r.x_num // r.den, r.y_num // r.den) == (4, 0)


def test_seg_intersect_collinear_overlap_flagged(spark):
    out = _segs(spark, [(0, 0, 0, 10, 0), (1, 5, 0, 15, 0)])
    r = out[(0, 1)]
    assert r.collinear and r.den == 0
    assert r.x_num is None and r.y_num is None


def test_seg_intersect_rational_point(spark):
    # (0,0)-(3,1) meets (1,0)-(1,3): x=1, y=1/3 -> den carries the 3
    out = _segs(spark, [(0, 0, 0, 3, 1), (1, 1, 0, 1, 3)])
    r = out[(0, 1)]
    assert r.x_num == 1 * r.den
    assert r.y_num * 3 == 1 * r.den


def test_seg_intersect_cell_blocking_spans_cells(spark):
    # long segments spanning many 16px cells still pair exactly once
    out = _segs(spark, [(0, 0, 0, 100, 100), (1, 0, 100, 100, 0)])
    assert list(out) == [(0, 1)]
    r = out[(0, 1)]
    assert (r.x_num // r.den, r.y_num // r.den) == (50, 50)


def _golden(spark, rows):
    from data_cube_utilities_spark.sources.catalog import golden_record

    df = spark.createDataFrame(
        rows, "e long, f string, value string, ts timestamp, p long")
    return {(r.e, r.f): r
            for r in golden_record(df, "e", "f", "value", "ts",
                                   "p").collect()}


def test_golden_record_freshest_wins(spark):
    import datetime as dt

    t1, t2 = dt.datetime(2020, 1, 1), dt.datetime(2021, 1, 1)
    g = _golden(spark, [(1, "a", "old", t1, 0), (1, "a", "new", t2, 2)])
    r = g[(1, "a")]
    assert r.value == "new" and r.conflict and r.n_candidates == 2


def test_golden_record_null_loses_and_priority_breaks_ties(spark):
    import datetime as dt

    t = dt.datetime(2020, 6, 1)
    g = _golden(spark, [(2, "a", None, dt.datetime(2022, 1, 1), 0),
                        (2, "a", "x", t, 1), (2, "a", "y", t, 0)])
    r = g[(2, "a")]
    assert r.value == "y"          # null excluded; same ts -> prio 0 wins
    assert r.n_distinct_values == 2


def test_glrlm_single_row_runs(spark):
    from data_cube_utilities_spark.operators import rasterops

    # one row "aabbb": levels 0,0,1,1,1 at 16-wide bins -> runs len 2,3
    df = _grid_df(spark, {0: [[0, 0, 16, 16, 16]]})
    r = rasterops.glrlm_features_long(df).collect()[0]
    assert r.n_runs == 2
    assert r.lre == 1 * 4 + 1 * 9
    q = 1 << 20
    assert r.sre_q20 == (1 * q) // 4 + (1 * q) // 9
    assert r.gln == 1 + 1          # one run at each of 2 levels
    assert r.rln == 1 + 1          # one run of each length
    assert r.rp_q20 == (2 * q) // 5


def test_glrlm_constant_image_one_run_per_row(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = _grid_df(spark, {0: [[50] * 6 for _ in range(3)]})
    r = rasterops.glrlm_features_long(df).collect()[0]
    assert r.n_runs == 3 and r.lre == 3 * 36
    assert r.gln == 9              # all 3 runs at one level
    assert r.rln == 9              # all 3 runs of length 6


def test_radial_profile_rings_partition_pixels(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = _grid_df(spark, {0: [[x + y for x in range(8)] for y in range(8)]})
    out = rasterops.radial_profile_long(df, ring_div=8).collect()
    assert sum(r.n for r in out) == 64
    # center 4 pixels: doubled offsets +-1 -> 4*r2 = 2 -> ring 0
    r0 = [r for r in out if r.ring == 0][0]
    assert r0.n == 4
    # corner (0,0): offsets -7,-7 -> 4*r2 = 98 -> ring 12 with 4 corners
    r12 = [r for r in out if r.ring == 12][0]
    assert r12.n == 4
    assert r12.sum_v == (0 + 0) + (7 + 0) + (0 + 7) + (7 + 7)


def test_radial_profile_mean_truncates(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = _grid_df(spark, {0: [[1, 2], [3, 5]]})  # all 4 px: 4*r2=2, ring 0
    r = rasterops.radial_profile_long(df, ring_div=8).collect()
    assert len(r) == 1 and r[0].n == 4
    assert r[0].mean_q20 == (11 * (1 << 20)) // 4


def test_image_ingest_composition_on_uniform_mosaic(spark):
    """Uniform mosaic -> uniform luma -> degenerate Otsu (no valid
    split -> NULL score, smallest v wins) and exact global stats."""
    from data_cube_utilities_spark.operators import rasterops

    df = _grid_df(spark, {0: [[100] * 4 for _ in range(4)]})
    rgb = rasterops.debayer_grid(df)
    luma = rgb.select(
        "img", F.col("x").alias("px"), F.col("y").alias("py"),
        F.expr("(299 * r + 587 * g + 114 * b) div 1000").alias("val"))
    vals = [r.val for r in luma.collect()]
    assert set(vals) == {100}
    otsu = rasterops.otsu_threshold_long(luma).collect()[0]
    assert otsu.threshold == 100 and otsu.score is None


def test_haar_dwt_hand_block_and_inversion(spark):
    from data_cube_utilities_spark.operators import rasterops

    # single 2x2 block [[a, b], [c, d]] = [[10, 14], [20, 30]]
    df = _grid_df(spark, {0: [[10, 14], [20, 30]]})
    r = rasterops.haar_dwt_long(df).collect()[0]
    # horizontal: row0 s=10+(4 div 2)=12, d=4; row1 s=20+(10 div 2)=25, d=10
    # vertical:   ll=12+(13 div 2)=18, lh=13, hl=4+(6 div 2)=7, hh=6
    assert (r.ll, r.lh, r.hl, r.hh) == (18, 13, 7, 6)
    # exact inversion: undo vertical then horizontal lifting
    s0 = r.ll - (r.lh // 2 if r.lh >= 0 else -((-r.lh) // 2))
    s1 = s0 + r.lh
    d0 = r.hl - (r.hh // 2 if r.hh >= 0 else -((-r.hh) // 2))
    d1 = d0 + r.hh
    def unlift(s, d):
        e = s - (d // 2 if d >= 0 else -((-d) // 2))
        return e, e + d
    assert unlift(s0, d0) == (10, 14)
    assert unlift(s1, d1) == (20, 30)


def test_haar_dwt_constant_image_energy_in_ll(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = _grid_df(spark, {0: [[9] * 4 for _ in range(4)]})
    out = rasterops.haar_dwt_long(df).collect()
    assert len(out) == 4
    assert all((r.ll, r.lh, r.hl, r.hh) == (9, 0, 0, 0) for r in out)


def test_blocking_eval_hand_corpus(spark):
    from data_cube_utilities_spark.operators import textops

    rows = [(1, "a b c"), (2, "c b a"),     # same multiset, diff first tok
            (3, "a b c"),                   # same multiset AND first tok as 1
            (4, "x y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    truth = F.md5(F.concat_ws(" ", F.array_sort(toks)))
    block = F.element_at(toks, 1)
    r = textops.blocking_eval(df, truth, block).collect()[0]
    # truth pairs: {1,2,3} -> 3 pairs; candidates: block 'a'={1,3} 1 pair,
    # 'c'={2}, 'x'={4} -> 1; captured: (tk,bk) group {1,3} -> 1
    assert (r.n_docs, r.n_truth_pairs, r.n_cand_pairs,
            r.n_captured_pairs) == (4, 3, 1, 1)
    q = 1 << 20
    assert r.reduction_ratio_q20 == ((6 - 1) * q) // 6
    assert r.pair_completeness_q20 == (1 * q) // 3


def test_blocking_eval_no_truth_pairs_null_pc(spark):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    r = textops.blocking_eval(
        df, F.md5(F.concat_ws(" ", F.array_sort(toks))),
        F.element_at(toks, 1)).collect()[0]
    assert r.n_truth_pairs == 0 and r.pair_completeness_q20 is None
    assert r.reduction_ratio_q20 == (1 << 20)   # zero candidates


def test_percentile_stretch_ramp_and_clamp(spark):
    from data_cube_utilities_spark.operators import rasterops

    # 100-pixel row 0..99: p2 = 1, p98 = 97 (lower percentiles)
    df = spark.createDataFrame(
        [(0, x, 0, x) for x in range(100)],
        "img long, px long, py long, val long")
    out = {r.x: r for r in
           rasterops.percentile_stretch_grid(df).collect()}
    assert out[0].lo_cut == 1 and out[0].hi_cut == 97
    assert out[0].stretched == 0            # below lo clamps
    assert out[99].stretched == 255         # above hi clamps
    assert out[49].stretched == ((49 - 1) * 255) // 96


def test_percentile_stretch_degenerate_flat_image(spark):
    from data_cube_utilities_spark.operators import rasterops

    df = spark.createDataFrame(
        [(0, x, 0, 42) for x in range(10)],
        "img long, px long, py long, val long")
    out = rasterops.percentile_stretch_grid(df).collect()
    assert all(r.stretched == 0 and r.lo_cut == 42 == r.hi_cut
               for r in out)


def test_ordered_dither_thresholds_and_gradient(spark):
    from data_cube_utilities_spark.operators import rasterops
    from data_cube_utilities_spark.operators.rasterops import DITHER4

    # full gray ramp on one dither row: firing count grows with v
    df = spark.createDataFrame(
        [(0, x, y, v) for v in (0, 64, 128, 192, 255)
         for y in range(4) for x in range(4)
         if False] +
        [(v, x, y, v * 51) for v in range(6)
         for y in range(4) for x in range(4)],
        "img long, px long, py long, val long")
    out = rasterops.ordered_dither_grid(df).collect()
    fired = {}
    for r in out:
        fired[r.img] = fired.get(r.img, 0) + int(r.on)
    # v=0 never fires; v=255 always fires; monotone in between
    assert fired[0] == 0 and fired[5] == 16
    assert all(fired[i] <= fired[i + 1] for i in range(5))
    # exact predicate check at one cell: M(1,0)=8 -> fires iff 32v > 4335
    v_cell = [(r.v, r.on) for r in out if r.img == 3
              and r.x == 1 and r.y == 0][0]
    assert v_cell[1] == (32 * v_cell[0] > 510 * DITHER4[0][1] + 255)
