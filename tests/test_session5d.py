"""Round-5 session-5 unit pins, batch 2: funnel, Gini, chi-square
cells, FAST-9 corners (all hash-oracled as driver queries)."""
import itertools

import pytest


def test_funnel_strict_ordering(spark):
    from data_cube_utilities_spark.operators import temporal

    ev = [
        # user 1 completes in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2 clicks BEFORE viewing: click must not count
        (2, 10, "click"), (2, 20, "view"),
        # user 3 views only
        (3, 5, "view"),
        # user 4: purchase at the SAME t as click is NOT strictly after
        (4, 1, "view"), (4, 2, "click"), (4, 2, "purchase"),
    ]
    df = spark.createDataFrame(ev, "user long, t long, step string")
    out = {r.step: r for r in temporal.funnel_steps(
        df, ["view", "click", "purchase"]).collect()}
    assert out["view"].n_users == 4
    assert out["click"].n_users == 2          # users 1 and 4
    assert out["purchase"].n_users == 1       # user 1 only
    assert out["view"].conv_from_first_q20 == 1 << 20
    assert out["click"].conv_from_first_q20 == (2 << 20) // 4
    assert out["purchase"].conv_from_prev_q20 == (1 << 20) // 2
    assert [r.step_idx for r in sorted(out.values(),
                                       key=lambda r: r.step_idx)] == [1, 2, 3]


def test_funnel_empty_first_step(spark):
    from data_cube_utilities_spark.operators import temporal

    df = spark.createDataFrame([(1, 1, "click")],
                               "user long, t long, step string")
    out = {r.step: r for r in temporal.funnel_steps(
        df, ["view", "click"]).collect()}
    assert out["view"].n_users == 0 and out["click"].n_users == 0
    assert out["view"].conv_from_first_q20 == 0


def test_gini_extremes_and_ties(spark):
    from data_cube_utilities_spark.operators import sketches

    rows = [(1, 5)] * 4                      # perfect equality -> 0
    rows += [(2, 0), (2, 0), (2, 0), (2, 12)]  # one holder -> (n-1)/n
    rows += [(3, 3), (3, 1), (3, 3), (3, 1)]   # tie blocks
    df = spark.createDataFrame(rows, "k long, v long")
    out = {r.k: r for r in
           sketches.gini_concentration(df, ["k"], "v").collect()}
    assert out[1].gini_q20 == 0
    assert out[2].gini_q20 == (3 * (1 << 20)) // 4
    # ties: sorted [1,1,3,3]; G = (2*(1+2+9+12) - 5*8)/(4*8) = 8/32
    assert out[3].gini_q20 == (1 << 20) // 4
    # determinism under repartition (tie ranks may permute freely)
    two = {r.k: r.gini_q20 for r in sketches.gini_concentration(
        df.repartition(7), ["k"], "v").collect()}
    assert two == {k: r.gini_q20 for k, r in out.items()}


def test_chi_square_independent_is_zero_and_signal(spark):
    from data_cube_utilities_spark.operators import sketches

    # perfectly independent 2x2 -> all contributions 0
    rows = [(a, b) for a in range(2) for b in range(2) for _ in range(10)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = sketches.chi_square_cells(df, "a", "b").collect()
    assert all(r.contrib_q20 == 0 for r in out)
    assert all(r.n == 40 and r.r == 20 and r.c == 20 for r in out)

    # diagonal-only 2x2 -> chi2 = N -> per-cell contrib = N/4
    rows2 = [(0, 0)] * 10 + [(1, 1)] * 10
    df2 = spark.createDataFrame(rows2, "a long, b long")
    out2 = sketches.chi_square_cells(df2, "a", "b").collect()
    assert len(out2) == 2
    # (o*N - r*c)^2 / (r*c*N) = (200-100)^2/(100*20) = 5 per cell
    assert all(r.contrib_q20 == 5 << 20 for r in out2)


def test_fast_corners_spike_and_flat(spark):
    from data_cube_utilities_spark.operators import rasterops

    px = [(0, x, y, 100) for x, y in itertools.product(range(12),
                                                       range(12))]
    px = [(i, x, y, 250 if (x, y) == (6, 6) else v) for i, x, y, v in px]
    df = spark.createDataFrame(px, "img long, px long, py long, val long")
    out = rasterops.fast_corners_long(df, threshold=8).collect()
    # the isolated spike's whole ring is darker -> the ONLY corner
    assert len(out) == 1
    r = out[0]
    assert (r.x, r.y, r.v) == (6, 6, 250)
    assert r.dark_mask == 0xFFFF and r.bright_mask == 0
    assert r.n_dark == 16 and r.n_bright == 0


def test_fast_corners_arc_threshold(spark):
    from data_cube_utilities_spark.operators import rasterops
    from data_cube_utilities_spark.operators.rasterops import FAST_RING

    # build a ring where exactly 8 contiguous positions are bright:
    # one short of the 9 needed -> no corner; 9 -> corner
    for n_bright, expect in [(8, 0), (9, 1)]:
        px = {(x, y): 100 for x, y in itertools.product(range(13),
                                                        range(13))}
        cx, cy = 6, 6
        for i, (dx, dy) in enumerate(FAST_RING):
            if i < n_bright:
                px[(cx + dx, cy + dy)] = 200
        df = spark.createDataFrame(
            [(0, x, y, v) for (x, y), v in px.items()],
            "img long, px long, py long, val long")
        out = rasterops.fast_corners_long(df, threshold=8).collect()
        got = [r for r in out if (r.x, r.y) == (cx, cy)]
        assert len(got) == expect, (n_bright, out)


def test_circular_run9_wraparound(spark):
    from data_cube_utilities_spark.operators.rasterops import (
        _circular_run9_sql)
    from pyspark.sql import functions as F

    # 5 high bits + 4 low bits = 9 contiguous only CIRCULARLY
    wrap = 0b1111100000001111
    no_wrap = 0b1111000000001111   # 8 circular
    df = spark.createDataFrame([(wrap,), (no_wrap,)], "m long")
    got = df.select("m", F.expr(_circular_run9_sql("m")).alias("hit")) \
            .collect()
    by = {r.m: r.hit for r in got}
    assert by[wrap] is True and by[no_wrap] is False
