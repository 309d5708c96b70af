"""Golden-DP parity for the round-5 in-row dynamic programs:
discrete Fréchet (spatial.frechet_pairs) and vertical seam carving
(rasterops.seam_carve_energy) against classic O(n*m) Python DPs."""

import random

import pytest

from data_cube_utilities_spark.operators import rasterops, spatial


def frechet_ref(A, B):
    """Classic discrete Fréchet (squared costs), Eiter-Mannila memo."""
    INF = float("inf")
    n, m = len(A), len(B)
    dp = [[INF] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0

    def c(i, j):
        (x1, y1), (x2, y2) = A[i - 1], B[j - 1]
        return (x1 - x2) ** 2 + (y1 - y2) ** 2

    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = max(c(i, j), min(dp[i - 1][j], dp[i][j - 1],
                                        dp[i - 1][j - 1]))
    return dp[n][m]


def test_frechet_pairs_matches_classic_dp(spark):
    rng = random.Random(17)
    trajs = {k: [(t, rng.randint(0, 30))
                 for t in range(rng.randint(2, 11))]
             for k in range(5)}
    rows = [(k, s, x, y) for k, pts in trajs.items()
            for s, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "traj_id long, seq long, x long, y long")
    out = spatial.frechet_pairs(df).collect()
    assert len(out) == 10
    for r in out:
        assert r.frechet2 == frechet_ref(trajs[r.sa], trajs[r.sb]), \
            (r.sa, r.sb)
        assert (r.n_a, r.n_b) == (len(trajs[r.sa]), len(trajs[r.sb]))


def test_frechet_identity_and_monotonicity(spark):
    # identical trajectories -> 0; a doubled-back copy raises Fréchet
    # (the order-awareness Hausdorff lacks)
    line = [(0, t, t, 0) for t in range(6)]
    same = [(1, t, t, 0) for t in range(6)]
    back = [(2, t, [0, 1, 2, 1, 2, 3][t], 0) for t in range(6)]
    df = spark.createDataFrame(line + same + back,
                               "traj_id long, seq long, x long, y long")
    got = {(r.sa, r.sb): r.frechet2
           for r in spatial.frechet_pairs(df).collect()}
    assert got[(0, 1)] == 0
    assert got[(0, 2)] > 0


def seam_ref(grid):
    """Classic vertical-seam DP: (min energy, leftmost 0-based end col)."""
    prev = list(grid[0])
    for row in grid[1:]:
        new = []
        for c, e in enumerate(row):
            best = prev[c]
            if c > 0:
                best = min(best, prev[c - 1])
            if c + 1 < len(prev):
                best = min(best, prev[c + 1])
            new.append(e + best)
        prev = new
    m = min(prev)
    return m, prev.index(m)


@pytest.mark.parametrize("seed,h,w", [(3, 8, 8), (4, 12, 5), (5, 1, 7)])
def test_seam_carve_matches_classic_dp(spark, seed, h, w):
    rng = random.Random(seed)
    grid = [[rng.randint(0, 99) for _ in range(w)] for _ in range(h)]
    rows = [(0, x, y, grid[y][x]) for y in range(h) for x in range(w)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    r = rasterops.seam_carve_energy(df).collect()[0]
    energy, col0 = seam_ref(grid)
    assert (r.h, r.w) == (h, w)
    assert r.seam_energy == energy
    assert r.seam_end_x == col0 + 1


def test_seam_carve_planted_cheap_column(spark):
    # a zero column in an otherwise-expensive grid IS the seam
    h, w, cheap = 10, 9, 4
    rows = [(7, x, y, 0 if x == cheap else 50 + x + y)
            for y in range(h) for x in range(w)]
    df = spark.createDataFrame(rows, "img long, px long, py long, val long")
    r = rasterops.seam_carve_energy(df).collect()[0]
    assert r.seam_energy == 0
    assert r.seam_end_x == cheap + 1
