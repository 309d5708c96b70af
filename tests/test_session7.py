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
