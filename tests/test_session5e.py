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
