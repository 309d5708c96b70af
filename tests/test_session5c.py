"""Round-5 session-5 unit pins for the new operator batch: link
prediction, SCD2 intervals, interval sweep, SAX words, MAD outliers,
census stereo, URL canonicalization (all hash-oracled as driver
queries; these pin semantics on hand-built inputs, reference-free)."""
import hashlib
import itertools

import pytest


def test_link_predict_square_with_chord(spark):
    from data_cube_utilities_spark.operators import graph

    # square 1-2-3-4-1 plus chord 1-3: the only scoreable fresh pair is
    # (2,4) via common neighbors {1,3}; (1,3) is an existing edge and
    # must be anti-joined away even though it also shares {2,4}
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3),
                               (3, 1), (2, 2)],  # dup/reverse/self-loop
                              "src long, dst long")
    rows = graph.link_predict(e).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.u, r.v, r.cn) == (2, 4, 2)
    # deg(2)=deg(4)=2 -> jaccard = 2/(2+2-2) = 1
    assert r.jaccard_q20 == 1 << 20
    # deg(1)=deg(3)=3 -> ra = 2 * (2^20 // 3)
    assert r.ra_q20 == 2 * ((1 << 20) // 3)


def test_link_predict_min_cn_filter(spark):
    from data_cube_utilities_spark.operators import graph

    # path 1-2-3: pair (1,3) has exactly one common neighbor
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert graph.link_predict(e, min_cn=1).count() == 1
    assert graph.link_predict(e, min_cn=2).count() == 0


def test_scd2_build_runs_and_currency(spark):
    from data_cube_utilities_spark.operators import temporal

    ev = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "a"), (1, 5, "b"), (1, 7, "a"), (2, 3, "x")],
        "k long, t long, v string")
    out = {(r.k, r.version): r
           for r in temporal.scd2_build(ev, ["k"]).collect()}
    # consecutive 'a' events merged into one interval
    r1 = out[(1, 1)]
    assert (r1.v, r1.eff_from, r1.eff_to, r1.n_events,
            r1.is_current) == ("a", 1, 5, 2, False)
    # 'a' REAPPEARING later is a new version, not a merge with run 1
    r3 = out[(1, 3)]
    assert (r3.v, r3.eff_from, r3.eff_to, r3.is_current) == ("a", 7, None,
                                                             True)
    # exactly one current row per key
    cur = [r for r in out.values() if r.is_current]
    assert sorted(r.k for r in cur) == [1, 2]


def test_interval_sweep_half_open_touching(spark):
    from data_cube_utilities_spark.operators import temporal

    iv = spark.createDataFrame(
        # [0,10) and [10,20) touch -> never concurrent; [5,15) overlaps
        # both; [30,30) is zero-length and contributes nothing
        [(1, 0, 10), (1, 10, 20), (1, 5, 15), (1, 30, 30),
         (2, 0, 5)],
        "k long, t0 long, t1 long")
    out = {r.k: r for r in temporal.interval_sweep(iv, ["k"]).collect()}
    assert out[1].max_concurrency == 2
    assert out[1].covered_span == 20          # union [0,20)
    assert out[1].sum_length == 30
    assert out[1].n_intervals == 4
    assert out[2].covered_span == 5 and out[2].max_concurrency == 1


def test_sax_words_scale_free_and_partial_segment(spark):
    from data_cube_utilities_spark.operators import temporal

    vals = [0, 0, 0, 0, 10, 10, 10, 10, 99, 99]   # trailing 2 dropped
    rows = [(1, t, v) for t, v in enumerate(vals)]
    rows += [(2, t, v * 7) for t, v in enumerate(vals)]  # scaled copy
    df = spark.createDataFrame(rows, "k long, t long, v long")
    out = {r.k: r for r in temporal.sax_words(df, ["k"]).collect()}
    assert out[1].n_pts == 10 and out[1].n_segments == 2
    # mean = 23.8; seg sums 0 and 40: 0 -> 'a'; 40 vs n*... -> 'a'..'d'
    assert out[1].word == out[2].word          # scale invariance
    assert len(out[1].word) == 2
    assert out[1].word[0] == "a"


def test_mad_outliers_hand_case_and_degenerate(spark):
    from data_cube_utilities_spark.operators import temporal

    rows = [(1, v) for v in [10, 11, 12, 10, 11, 100]]
    rows += [(2, 5), (2, 5), (2, 5), (2, 9)]   # mad = 0 fallback
    df = spark.createDataFrame(rows, "k long, v long")
    out = {r.k: r for r in temporal.mad_outliers(df, ["k"], k=3).collect()}
    # sorted [10,10,11,11,12,100], lower median (rank 3) = 11
    assert out[1].median == 11 and out[1].mad == 1
    assert out[1].n_outliers == 1 and list(out[1].outlier_values) == [100]
    # group 2: median 5, mad 0 -> any deviation flags
    assert out[2].mad == 0 and out[2].n_outliers == 1
    assert list(out[2].outlier_values) == [9]


def _hash_px(x, y):
    return int(hashlib.md5(f"{x},{y}".encode()).hexdigest()[:4], 16) % 256


@pytest.fixture(scope="module")
def stereo_pair(spark):
    left = [(0, x, y, _hash_px(x, y))
            for x, y in itertools.product(range(16), range(8))]
    right = [(0, x - 2, y, v) for (_, x, y, v) in left]  # content shifts LEFT
    pl = spark.createDataFrame(left, "img long, px long, py long, val long")
    pr = spark.createDataFrame(right, "img long, px long, py long, val long")
    return pl, pr


def test_census_codes_illumination_invariant(spark, stereo_pair):
    from data_cube_utilities_spark.operators import rasterops
    from pyspark.sql import functions as F

    pl, _ = stereo_pair
    base = rasterops.census_codes_long(pl)
    # census depends only on local ORDERING: gain x2 + offset 7 leaves
    # every code unchanged
    warped = pl.select("img", "px", "py",
                       (F.col("val") * 2 + 7).alias("val"))
    w = rasterops.census_codes_long(warped)
    assert base.join(w, ["img", "x", "y"]) \
               .filter(base.code != w.code).count() == 0
    # only full-3x3 interior pixels emit codes: (16-2)*(8-2)
    assert base.count() == 14 * 6


def test_census_stereo_recovers_planted_shift(spark, stereo_pair):
    from data_cube_utilities_spark.operators import rasterops

    pl, pr = stereo_pair
    out = rasterops.census_stereo_long(pl, pr, d_max=4).collect()
    zero_cost = [r for r in out if r.hamming_cost == 0]
    at2 = [r for r in zero_cost if r.disparity == 2]
    # the planted shift dominates; stragglers are 8-bit code collisions
    assert len(at2) >= 0.9 * len(zero_cost)
    # every interior-enough left pixel sees all 5 candidates
    full = [r for r in out if r.n_cands == 5]
    assert len(full) > 0
    assert all(0 <= r.disparity <= 4 for r in out)


def test_canonicalize_urls_rules(spark):
    from data_cube_utilities_spark.operators import textops

    cases = [
        # (raw, canonical)
        ("HTTPS://WWW.Example.COM:443/Path/a/?utm_source=x&b=2&a=1#f",
         "https://example.com/Path/a?a=1&b=2"),
        ("https://example.com/Path/a?a=1&b=2",
         "https://example.com/Path/a?a=1&b=2"),
        ("http://example.com:80", "http://example.com/"),
        ("http://example.com:8080/", "http://example.com:8080/"),
        ("http://Example.com/x///", "http://example.com/x"),
        ("http://example.com/x?gclid=1&fbclid=2&ref=3&utm_medium=m",
         "http://example.com/x"),
        ("https://example.com:80/y", "https://example.com:80/y"),  # non-default
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)],
                               "doc_id long, url string")
    got = {r.doc_id: r.canonical_url
           for r in textops.canonicalize_urls(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_url_dedup_groups_keeper(spark):
    from data_cube_utilities_spark.operators import textops

    df = spark.createDataFrame(
        [(3, "http://A.com/x?utm_source=1"),
         (1, "http://a.com/x"),
         (2, "http://a.com/x/"),
         (9, "http://b.com/")],
        "doc_id long, url string")
    out = {r.canonical_url: r
           for r in textops.url_dedup_groups(df).collect()}
    g = out["http://a.com/x"]
    assert (g.keeper_id, g.n_copies, g.n_distinct_raw) == (1, 3, 3)
    assert out["http://b.com/"].n_copies == 1
