"""KMV distinct-count sketch: losslessness below k, estimator accuracy,
and the merge algebra that makes it incremental."""

import pyspark.sql.functions as F
import pytest

from data_cube_utilities_spark.operators import sketches


@pytest.fixture(scope="module")
def values(spark):
    # 3 groups with known cardinalities: 40 (< k), 500, 2000 distinct
    # values, each value repeated a varying number of times
    rows = spark.range(0, 20000).select(
        F.when(F.col("id") % 3 == 0, "small")
         .when(F.col("id") % 3 == 1, "mid")
         .otherwise("big").alias("grp"),
        F.when(F.col("id") % 3 == 0, F.col("id") % 40)
         .when(F.col("id") % 3 == 1, F.col("id") % 500)
         .otherwise(F.col("id") % 2000 + 10_000).alias("v"))
    return rows


def test_small_group_is_lossless(values):
    sk = sketches.kmv_sketch(values, ["grp"], "v", k=64)
    row = {r["grp"]: r for r in sk.collect()}
    assert row["small"]["n_kept"] == 40
    assert row["small"]["est_distinct"] == 40          # exact below k
    assert len(row["small"]["hashes"]) == 40
    assert row["small"]["hashes"] == sorted(row["small"]["hashes"])


def test_estimator_within_kmv_error(values):
    sk = sketches.kmv_sketch(values, ["grp"], "v", k=64)
    row = {r["grp"]: r for r in sk.collect()}
    # (k-1)/kth estimator: relative sd ~ 1/sqrt(k-2) ~ 12.7% at k=64;
    # allow 4 sd. True counts: mid=500 (id%3==1 -> id%500 hits all 500
    # residues? id = 1,4,7,...: id%500 over step-3 ids covers all residues
    # since gcd(3,500)=1), big=2000 likewise (gcd(3,2000)=1).
    for grp, true in (("mid", 500), ("big", 2000)):
        est = row[grp]["est_distinct"]
        assert abs(est - true) / true < 0.51, (grp, est, true)


def test_merge_of_parts_equals_sketch_of_whole(values):
    whole = sketches.kmv_sketch(values, ["grp"], "v", k=64)
    parts = [values.filter(F.col("id") % 4 == i) for i in range(4)]
    partials = None
    for p in parts:
        s = sketches.kmv_sketch(p, ["grp"], "v", k=64)
        partials = s if partials is None else partials.unionByName(s)
    merged = sketches.kmv_merge(partials, ["grp"], k=64)
    a = {r["grp"]: (r["n_kept"], r["kth"], r["est_distinct"], r["hashes"])
         for r in whole.collect()}
    b = {r["grp"]: (r["n_kept"], r["kth"], r["est_distinct"], r["hashes"])
         for r in merged.collect()}
    assert a == b


def test_merge_is_idempotent_and_order_insensitive(values):
    s1 = sketches.kmv_sketch(values.filter("id % 2 = 0"), ["grp"], "v", k=32)
    s2 = sketches.kmv_sketch(values.filter("id % 2 = 1"), ["grp"], "v", k=32)
    ab = sketches.kmv_merge(s1.unionByName(s2), ["grp"], k=32)
    ba = sketches.kmv_merge(s2.unionByName(s1).unionByName(s1), ["grp"], k=32)
    key = lambda df: sorted(map(tuple, df.select(
        "grp", "n_kept", "kth", "est_distinct").collect()))
    assert key(ab) == key(ba)


def test_null_values_never_enter_the_sketch(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", "a"), ("g", "b"), ("g", None)],
        "grp string, v string")
    sk = sketches.kmv_sketch(df, ["grp"], "v", k=8).collect()
    assert sk[0]["n_kept"] == 2 and sk[0]["est_distinct"] == 2


# -- histogram quantiles ------------------------------------------------------

def test_hist_quantile_brackets_true_quantile(spark):
    import numpy as np
    vals = [(float(v),) for v in np.random.default_rng(11).integers(0, 10_000, 3000)]
    df = spark.createDataFrame(vals, "v double").withColumn("g", F.lit("all"))
    out = sketches.hist_quantile(df, ["g"], "v", bin_width=50.0,
                                 qs=(0.25, 0.5, 0.75)).collect()
    arr = np.sort(np.array([v for (v,) in vals]))
    for r in out:
        true_q = arr[int(np.ceil(r["q"] * len(arr))) - 1]
        lo, hi = r["q_upper"] - 50.0, r["q_upper"]
        assert lo < true_q <= hi, (r["q"], true_q, lo, hi)
        assert r["n"] == len(arr)


def test_hist_quantile_merge_is_count_addition(spark):
    # the sketch is the histogram: quantiles from the summed per-part
    # histograms equal quantiles of the whole
    df = spark.range(0, 5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 37 % 997).cast("double").alias("v"))
    whole = sketches.hist_quantile(df, ["g"], "v", 10.0, qs=(0.5,))
    parts = [df.filter(F.col("id") % 2 == i) for i in range(2)]
    merged_hist = None
    for p in parts:
        h = (p.select("g", F.floor(F.col("v") / 10.0).cast("long").alias("bin"))
              .groupBy("g", "bin").agg(F.count("*").alias("cnt")))
        merged_hist = h if merged_hist is None else merged_hist.unionByName(h)
    # re-aggregate the merged histogram, then synthesize rows per bin and
    # rerun the quantile read on the reconstituted multiset
    re = merged_hist.groupBy("g", "bin").agg(F.sum("cnt").alias("cnt"))
    recon = re.select("g", F.explode(
        F.transform(F.sequence(F.lit(1), F.col("cnt")),
                    lambda _: F.col("bin") * 10.0)).alias("v"))
    again = sketches.hist_quantile(recon, ["g"], "v", 10.0, qs=(0.5,))
    a = sorted(map(tuple, whole.select("g", "q", "qbin", "n").collect()))
    b = sorted(map(tuple, again.select("g", "q", "qbin", "n").collect()))
    assert a == b


def test_cm_sketch_never_underestimates_and_merges(spark):
    from data_cube_utilities_spark.operators import sketches

    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]],
        "key string")
    sk = sketches.cm_sketch(df, "key", depth=4, width=64)
    pd_sk = sk.toPandas()
    # total mass per hash row equals the input size
    assert (pd_sk.groupby("r").cnt.sum() == 76).all()
    probes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("absent",)], "v string")
    est = (sketches.cm_estimate(sk, probes, depth=4, width=64)
           .toPandas().set_index("v").est)
    truth = {"a": 50, "b": 20, "c": 5, "d": 1, "absent": 0}
    for k, t in truth.items():
        assert est[k] >= t          # CM never underestimates
    # with 4 keys in 64 buckets x 4 rows, collisions are absent: exact
    assert est["a"] == 50 and est["absent"] == 0
    # mergeability: sketch(A+B) == merge(sketch(A), sketch(B))
    d1 = spark.createDataFrame([("a",)] * 30 + [("b",)] * 7, "key string")
    d2 = spark.createDataFrame([("a",)] * 20 + [("c",)] * 9, "key string")
    merged = sketches.cm_merge(
        sketches.cm_sketch(d1, "key", depth=4, width=64).unionByName(
            sketches.cm_sketch(d2, "key", depth=4, width=64)))
    whole = sketches.cm_sketch(
        d1.unionByName(d2), "key", depth=4, width=64)
    a = merged.toPandas().sort_values(["r", "b"]).reset_index(drop=True)
    b = whole.toPandas().sort_values(["r", "b"]).reset_index(drop=True)
    assert a.equals(b)


def test_bloom_no_false_negatives_and_merge(spark):
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import sketches

    a = spark.range(0, 300).select(F.col("id").alias("v"))
    b = spark.range(300, 600).select(F.col("id").alias("v"))
    both = spark.range(0, 600).select(F.col("id").alias("v"))
    # merged per-shard filters == filter of the union
    m = sketches.bloom_merge(
        sketches.bloom_build(a, "v").unionByName(
            sketches.bloom_build(b, "v")))
    whole = sketches.bloom_build(both, "v")
    assert sorted(map(tuple, m.collect())) \
        == sorted(map(tuple, whole.collect()))
    # every member is found (no false negatives)
    probe = sketches.bloom_probe(whole, both).toPandas()
    assert probe["might_contain"].all()
    # non-members: mostly rejected at this load factor (FPs allowed,
    # but a filter that admits everything is broken)
    out = sketches.bloom_probe(
        whole, spark.range(10_000, 11_000).select(
            F.col("id").alias("v"))).toPandas()
    assert (~out["might_contain"]).sum() > 700


def test_hll_registers_merge_and_estimate(spark):
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import sketches

    a = spark.range(0, 2000).select(F.lit("g").alias("g"),
                                    F.col("id").alias("v"))
    b = spark.range(1000, 4000).select(F.lit("g").alias("g"),
                                       F.col("id").alias("v"))
    both = spark.range(0, 4000).select(F.lit("g").alias("g"),
                                       F.col("id").alias("v"))
    # merged per-shard sketches == sketch of the union (overlap absorbed)
    m = sketches.hll_merge(
        sketches.hll_sketch(a, ["g"], "v").unionByName(
            sketches.hll_sketch(b, ["g"], "v")), ["g"])
    whole = sketches.hll_sketch(both, ["g"], "v")
    assert sorted(map(tuple, m.collect())) \
        == sorted(map(tuple, whole.collect()))
    # raw estimator within the ~13% (1.04/sqrt(64)) band at n/m ~ 62
    est = sketches.hll_estimate(whole, ["g"]).collect()[0]
    assert abs(est.est_distinct - 4000) / 4000 < 0.3
    # estimator is pure int64: recompute in Python and match exactly
    regs = {r.bucket: r.register for r in whole.collect()}
    s = sum(1 << (40 - v) for v in regs.values()) \
        + (64 - len(regs)) * (1 << 40)
    assert est.s_total == s
    assert est.est_distinct == (46454 * 64 * 64 * (1 << 24)) // s


def test_emd_1d_matches_scipy_free_reference(spark):
    import random
    from pyspark.sql import functions as F
    from data_cube_utilities_spark.operators import sketches

    rng = random.Random(13)
    xs = [rng.randint(0, 30) for _ in range(200)]
    ys = [rng.randint(5, 40) for _ in range(150)]   # shifted distribution
    a = spark.createDataFrame([("g", x) for x in xs], "grp string, bin long")
    b = spark.createDataFrame([("g", y) for y in ys], "grp string, bin long")
    out = sketches.emd_1d(a, b, ["grp"]).collect()[0]

    # reference: wasserstein over the full integer bin range
    lo, hi = min(xs + ys), max(xs + ys)
    ca = cb = 0
    num = 0
    for k in range(lo, hi + 1):
        ca += xs.count(k)
        cb += ys.count(k)
        num += abs(len(ys) * ca - len(xs) * cb)
    assert out.emd_num == num
    assert (out.n_a, out.n_b) == (len(xs), len(ys))

    # identical samples -> zero drift; sparse far-apart bins count spans
    same = sketches.emd_1d(a, a, ["grp"]).collect()[0]
    assert same.emd_num == 0
    p = spark.createDataFrame([("g", 0)], "grp string, bin long")
    q = spark.createDataFrame([("g", 100)], "grp string, bin long")
    far = sketches.emd_1d(p, q, ["grp"]).collect()[0]
    assert far.emd_num == 100  # mass 1x1 moved 100 bins


def test_first_digit_profile_extraction_edges(spark):
    from data_cube_utilities_spark.operators import sketches

    rows = [("g", 123), ("g", -456), ("g", 7), ("g", 100), ("g", 19),
            ("g", 0), ("g", None)]  # 0 has no significant digit
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {r.digit: (r.c, r.n, r.frac_2p20) for r in
           sketches.first_digit_profile(df, ["grp"], "v").collect()}
    assert out["1"] == (3, 5, (3 * 1048576) // 5)   # 123, 100, 19
    assert out["4"][0] == 1 and out["7"][0] == 1    # sign stripped
    assert "0" not in out and sum(v[0] for v in out.values()) == 5
