"""Training-data operators: dedup / similarity / text analysis semantics.
(Cross-engine oracle parity is covered by tools/check_oracles.py; these
pin the operator semantics themselves.)"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_cube_utilities_spark.operators import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "s0"),
        (2, "the quick brown fox jumps over the lazy cat", "en", "s0"),  # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog", "en", "s1"),  # exact dup of 1
        (4, "completely different words entirely unrelated text here now", "en", "s0"),
        (5, "la table est grande et la valeur est petite", "fr", "s2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_exact_dedup(docs):
    out = textops.exact_dedup(docs).toPandas()
    dup = out[out.n_copies == 2]
    assert len(dup) == 1 and dup.iloc[0].keeper_id == 1
    assert out.n_copies.sum() == 5


def test_trigram_shingles(docs):
    sh = textops.explode_trigrams(docs.filter("doc_id = 1")).toPandas()
    assert sh.shingle.iloc[0] == "the quick brown"
    assert len(sh) == 9 - 2


def test_minhash_finds_near_dups(docs):
    pairs = textops.minhash_lsh_pairs(docs, n_bands=8).toPandas()
    got = {(r.doc_a, r.doc_b) for r in pairs.itertuples()}
    assert (1, 3) in got          # exact dup: all bands match
    assert (1, 2) in got or (2, 3) in got  # near-dup shares most shingles
    full = pairs[(pairs.doc_a == 1) & (pairs.doc_b == 3)]
    assert full.n_bands_shared.iloc[0] == 8


def test_jaccard_exact_value(docs):
    out = textops.ngram_jaccard_pairs(docs, threshold=0.1,
                                      block_col="source").toPandas()
    row = out[(out.doc_a == 1) & (out.doc_b == 2)]
    # tokens 1: {the,quick,brown,fox,jumps,over,lazy,dog} (8 distinct)
    # tokens 2: same but cat for dog -> intersection 7, union 9
    assert np.isclose(row.jaccard.iloc[0], 7 / 9, atol=1e-6)


def test_simhash_locality(docs):
    out = textops.simhash(docs).toPandas().set_index("doc_id")
    def bits(r):
        return (int(r.simhash_hi) << 32) | int(r.simhash_lo)
    h1, h2, h4 = bits(out.loc[1]), bits(out.loc[2]), bits(out.loc[4])
    assert bits(out.loc[3]) == h1  # identical text -> identical signature
    d_near = bin(h1 ^ h2).count("1")
    d_far = bin(h1 ^ h4).count("1")
    assert d_near < d_far


def test_quality_features(docs):
    out = textops.quality_features(docs).toPandas().set_index("doc_id")
    r = out.loc[1]
    assert r.n_tokens == 9 and r.n_distinct == 8
    assert np.isclose(r.stopword_ratio, 2 / 9, atol=1e-6)
    assert 0 < r.quality_score <= 1


def test_language_scores(docs):
    out = textops.language_scores(docs).toPandas().set_index("doc_id")
    assert out.loc[1].pred_lang == "en"
    assert out.loc[5].score_fr > out.loc[5].score_en


def test_cosine_topk_exact(spark):
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(50, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    out = textops.cosine_topk(emb, query_id=0, k=5).toPandas()
    q = vecs[0].astype(np.float64)
    sims = vecs.astype(np.float64) @ q / (
        np.linalg.norm(vecs.astype(np.float64), axis=1) * np.linalg.norm(q))
    sims[0] = -np.inf
    order = np.argsort(np.round(-sims, 6), kind="stable")[:5]
    assert out.sort_values("rank").vec_id.tolist() == list(order)


def test_lsh_ann_subset_of_brute(spark):
    rng = np.random.RandomState(4)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    ann = textops.lsh_ann_topk(emb, query_id=0, dims=16, k=5).toPandas()
    assert 1 <= len(ann) <= 5
    # every ANN hit shares >=1 banded sign-LSH key with the query
    assert (ann.n_bands_shared >= 1).all()
    assert (ann.n_bands_shared <= textops.N_BANDS_LSH).all()
    # ANN cosines are a subset of the true candidate set's cosines
    brute = textops.cosine_topk(emb, query_id=0, k=200).toPandas()
    assert set(ann.vec_id) <= set(brute.vec_id)


def test_ivf_ann(spark):
    rng = np.random.RandomState(6)
    vecs = rng.normal(size=(300, 8)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(300, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    out = textops.ivf_ann_topk(emb, query_id=0, dims=8, k=5,
                               n_lists=6, n_probe=2).toPandas()
    assert 1 <= len(out) <= 5
    assert out.list_id.nunique() <= 2  # only probed lists searched
    # recall sanity: IVF top hit should appear in the brute-force top-20
    brute = textops.cosine_topk(emb, query_id=0, k=20).toPandas()
    assert out.vec_id.iloc[0] in set(brute.vec_id)


def test_embedding_near_dup_pairs(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(44)
    base = rng.randn(20, 16)
    vecs = list(base)
    vecs.append(base[3] + rng.randn(16) * 0.01)   # near-dup of vector 3
    vecs.append(base[7] * 1.5)                    # exact direction dup of 7
    pdf = pd.DataFrame({"vec_id": range(len(vecs)),
                        "embedding": [list(map(float, v)) for v in vecs]})
    emb = spark.createDataFrame(pdf)
    out = textops.embedding_near_dup_pairs(emb, threshold=0.95, dims=16) \
        .toPandas()
    got = {(int(r.vec_a), int(r.vec_b)) for _, r in out.iterrows()}
    # the planted pairs are in the same sign-bucket by construction of
    # near-identical directions, so LSH must surface them
    assert (3, 20) in got and (7, 21) in got
    assert (out.cosine >= 0.95).all()
    # random pairs of independent gaussians never reach 0.95
    assert got == {(3, 20), (7, 21)}


def test_simhash_near_dup_pairs(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    docs = [
        (0, base),
        (1, base),                                  # exact dup -> hamming 0
        (2, base.replace("lazy", "sleepy", 1)),     # one token changed
        (3, "completely different content about spark and parquet tables "
            "with nothing shared at all " * 6),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textops.simhash_near_dup_pairs(df, max_hamming=3).toPandas()
    pairs = {(int(r.doc_a), int(r.doc_b)): int(r.hamming)
             for _, r in out.iterrows()}
    assert pairs[(0, 1)] == 0
    assert (2, 3) not in pairs and (0, 3) not in pairs and (1, 3) not in pairs
    # the one-token variant is within a few flipped bits of the original
    if (0, 2) in pairs:
        assert pairs[(0, 2)] <= 3


def test_batch_ann_multiprobe_recall_superset(spark):
    """probe_bits=1 candidates are a superset of single-probe (same bucket
    plus one-flip buckets), so each query's top-k cosine at rank r is >=
    the single-probe one; with enough probes it converges toward brute
    force. Also: output contract (rank 1..k per query, no self-matches)."""
    from data_cube_utilities_spark.operators import textops

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    ids = [0, 7, 42]
    single = textops.lsh_ann_topk_batch(emb, ids, dims=64, k=5).toPandas()
    multi = textops.lsh_ann_topk_batch(emb, ids, dims=64, k=5,
                                       probe_bits=1).toPandas()
    for df in (single, multi):
        assert set(df["query_id"]) <= set(ids)
        assert not (df["query_id"] == df["vec_id"]).any()
        for _, g in df.groupby("query_id"):
            assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    s = single.set_index(["query_id", "rank"])["cosine"]
    m = multi.set_index(["query_id", "rank"])["cosine"]
    common = s.index.intersection(m.index)
    assert len(common) and (m[common] >= s[common] - 1e-12).all()


def test_batch_ivf_matches_single_query_results(spark):
    """Batch IVF with one index build returns, per query, exactly what the
    single-query operator returns (same quantizer seed -> same lists ->
    same candidates -> same ranked top-k)."""
    from data_cube_utilities_spark.operators import textops

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    ids = [0, 42]
    batch = (textops.ivf_ann_topk_batch(emb, ids, dims=64, k=5)
             .toPandas().sort_values(["query_id", "rank"]))
    for qid in ids:
        single = (textops.ivf_ann_topk(emb, qid, dims=64, k=5)
                  .toPandas().sort_values("rank"))
        sub = batch[batch["query_id"] == qid]
        assert list(sub["vec_id"]) == list(single["vec_id"])
        assert list(sub["cosine"]) == list(single["cosine"])


def test_banded_lsh_keys_bit_identical_udf_vs_sql(spark):
    """Direct twin parity for the banded sign-LSH signature: the Arrow
    kernel (sequential +- accumulation) and the generated literal-SQL
    chains must produce IDENTICAL band keys — on DuckDB, which is what
    the driver's oracle actually executes. Random float32 vectors stress
    sign flips near zero (the only place 1-ulp divergence could bite)."""
    import duckdb

    dims = 64
    rng = np.random.RandomState(77)
    vecs = rng.normal(size=(200, dims)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": np.arange(200, dtype=np.int64),
                        "embedding": [v.tolist() for v in vecs]})
    emb = spark.createDataFrame(pdf)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    got = (textops._banded_signatures(e, dims).drop("v").toPandas()
           .sort_values(["vec_id", "band"]).reset_index(drop=True))

    con = duckdb.connect()
    con.register("embt", pdf)
    keys = textops.lsh_band_key_sqls(dims, "em")
    bands = ", ".join(str(b) for b in range(textops.N_BANDS_LSH))
    exp = con.execute(f"""
        WITH emt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS em
                     FROM embt)
        SELECT vec_id, unnest([{bands}]) AS band,
               unnest([{", ".join(keys)}]) AS key
        FROM emt ORDER BY vec_id, band
    """).fetchdf()
    assert (got.vec_id.values == exp.vec_id.values).all()
    assert (got.band.values == exp.band.values).all()
    assert (got.key.values == exp.key.values).all()
    # keys actually use the widened space (not all tiny values)
    assert got.key.max() > 255 // 2 and got.key.nunique() > 50


def test_banded_lsh_candidate_join_shape(spark):
    """Scale-shape assertions (VERDICT r3 What's-wrong #1): the candidate
    self-join is an equi-join on (band, key) — no cartesian/broadcast
    nested loop — and the signature table repartitions on the composite
    key, so parallelism is no longer capped at 16 buckets."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df = textops.embedding_near_dup_pairs(emb, threshold=0.3, dims=64,
                                          release_cache=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(band" in plan
    spark.catalog.clearCache()


def test_hash_near_dup_pairs_brute_parity(spark):
    """Banded 64-bit-hash near-dup (the image-phash dedup operator) must
    equal the brute-force popcount filter exactly — pigeonhole recall is
    EXACT at hamming <= n_bands - 1, including hashes using the full
    64-bit range (negative longs)."""
    rng = np.random.RandomState(23)
    vals = rng.randint(-2**63, 2**63, size=60, dtype=np.int64)
    # plant near-dups: flip 1-3 bits of earlier values
    planted = []
    for i in range(20):
        v = int(vals[i])
        for _ in range(int(rng.randint(1, 4))):
            v ^= 1 << int(rng.randint(0, 64))
        planted.append(v)
    allv = [int(x) for x in vals] + planted
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(allv)], "img_id long, phash long")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in textops.hash_near_dup_pairs(
               df, id_col="img_id", hash_col="phash").collect()}
    exp = set()
    for i in range(len(allv)):
        for j in range(i + 1, len(allv)):
            h = bin((allv[i] ^ allv[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
            if h <= 3:
                exp.add((i, j, h))
    assert got == exp and exp      # fixture actually planted pairs


def test_hash_near_dup_rejects_unreachable_threshold():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError):
        textops.hash_near_dup_pairs(None, max_hamming=4, n_bands=4)


def test_image_near_dup_pairs_caption_flag(spark):
    """multimodal.image_near_dup_pairs over the image+caption shape:
    identical-phash pairs found, caption_match flags same/different
    captions."""
    from data_cube_utilities_spark.operators import multimodal as mm

    C = 0x5A5A5A5A5A5A5A5A                             # 32 bits set, far from 7
    rows = [("a", 7, "cat"), ("b", 7, "cat"),          # dup, same caption
            ("c", C, "dog"), ("d", C ^ 3, "bird"),     # hamming 2, diff
            ("e", ~C & 0x7FFFFFFFFFFFFFFF, "far")]     # no partner
    df = spark.createDataFrame(rows, "image_id string, phash long, caption string")
    out = {(r.id_a, r.id_b): (r.hamming, r.caption_match)
           for r in mm.image_near_dup_pairs(df).collect()}
    assert out[("a", "b")] == (0, True)
    assert out[("c", "d")] == (2, False)
    assert len(out) == 2


def test_bpe_pretokenizer_pieces(spark):
    df = spark.createDataFrame(
        [(1, "It's a well-known fact: 42 cats aren't 'normal'!  ok")],
        "doc_id long, text string")
    toks = textops.with_bpe_tokens(df).select("bpe_tokens").first()[0]
    # contraction split, space-prefixed word runs, digit runs, punct runs,
    # and the double space surviving as a whitespace piece
    assert toks[:4] == ["It", "'s", " a", " well"]
    assert " 42" in toks and "'t" in toks and "  " in toks
    assert "".join(toks) == "It's a well-known fact: 42 cats aren't 'normal'!  ok"


def test_bpe_token_stats_columns_and_ratio(docs):
    out = textops.bpe_token_stats(docs).toPandas().set_index("doc_id")
    assert list(out.columns) == [
        "n_bpe_tokens", "n_bpe_types", "n_word_pieces", "pieces_per_word"]
    r = out.loc[1]
    # plain lowercase prose: one piece per word, all word pieces
    assert r.n_bpe_tokens == 9 == r.n_word_pieces
    assert r.pieces_per_word == 1.0
    assert out.n_bpe_types.le(out.n_bpe_tokens).all()


def _pq_emb(spark, n=60, dims=16, seed=9):
    rng = np.random.RandomState(seed)
    vecs = rng.normal(size=(n, dims))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                        "embedding": [list(map(float, v)) for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def test_pq_adc_exact_with_complete_codebook(spark):
    # codebook = every row's subvectors (ksub = n): each subvector encodes
    # to an exact-match centroid, so ADC == true squared L2 distance
    emb, vecs = _pq_emb(spark, n=40, dims=16)
    cb = textops.pq_codebook_first_rows(emb, dims=16, m=4, ksub=40)
    out = textops.pq_adc_topk(emb, query_id=0, dims=16, codebook=cb,
                              k=10).toPandas()
    true_d2 = ((vecs - vecs[0]) ** 2).sum(axis=1)
    order = np.argsort(true_d2, kind="stable")
    exact_top = [i for i in order if i != 0][:10]
    assert list(out.vec_id) == exact_top
    np.testing.assert_allclose(out.adc_d2,
                               np.round(true_d2[exact_top], 6), atol=2e-6)


def test_pq_trained_codebook_recall(spark):
    emb, vecs = _pq_emb(spark, n=200, dims=16, seed=11)
    cb = textops.pq_codebook_train(emb, dims=16, m=8, ksub=32, seed=3)
    assert cb.shape == (8, 32, 2)
    codes = textops.pq_encode(emb, cb).toPandas()
    assert codes.codes.map(len).eq(8).all()
    out = textops.pq_adc_topk(emb, query_id=0, dims=16, codebook=cb,
                              k=10).toPandas()
    true_d2 = ((vecs - vecs[0]) ** 2).sum(axis=1)
    exact_top = [i for i in np.argsort(true_d2) if i != 0][:10]
    # quantized distances still put most of the true neighbors in the top-k
    recall = len(set(out.vec_id) & set(exact_top)) / 10
    assert recall >= 0.5


def test_pq_encode_null_safe(spark):
    df = spark.createDataFrame(
        [(0, [1.0] * 8), (1, None), (2, [0.0] * 8)],
        "vec_id long, embedding array<double>")
    cb = np.zeros((2, 2, 4))
    cb[:, 1, :] = 1.0
    out = textops.pq_encode(df, cb).toPandas().set_index("vec_id")
    assert out.loc[1].codes is None          # NULL vector -> NULL codes
    assert list(out.loc[0].codes) == [1, 1]  # nearest centroid per subspace
    assert list(out.loc[2].codes) == [0, 0]


def test_ivf_pq_degenerate_exact(spark):
    # complete codebook (ksub = n) + all lists probed => exact L2 top-k
    emb, vecs = _pq_emb(spark, n=40, dims=16, seed=21)
    cb = textops.pq_codebook_first_rows(emb, dims=16, m=4, ksub=40)
    out = textops.ivf_pq_topk(emb, query_id=0, dims=16, k=8,
                              n_lists=4, n_probe=4, codebook=cb).toPandas()
    true_d2 = ((vecs - vecs[0]) ** 2).sum(axis=1)
    exact_top = [i for i in np.argsort(true_d2, kind="stable") if i != 0][:8]
    assert list(out.vec_id) == exact_top


def test_ivf_pq_rerank_restores_exact_distances(spark):
    emb, vecs = _pq_emb(spark, n=120, dims=16, seed=22)
    cb = textops.pq_codebook_train(emb, dims=16, m=8, ksub=16, seed=5)
    out = textops.ivf_pq_topk(emb, query_id=0, dims=16, k=5,
                              n_lists=4, n_probe=4, codebook=cb,
                              rerank=40).toPandas()
    true_d2 = ((vecs - vecs[0]) ** 2).sum(axis=1)
    # re-ranked survivors carry EXACT distances, and with a 40-deep
    # short-list over all lists the top hit matches brute force
    for _, r in out.iterrows():
        np.testing.assert_allclose(r.adc_d2, round(true_d2[int(r.vec_id)], 6),
                                   atol=2e-6)
    exact_top = [i for i in np.argsort(true_d2) if i != 0][:5]
    assert out.vec_id.iloc[0] == exact_top[0]
    assert len(set(out.vec_id) & set(exact_top)) >= 3


def test_pq_batch_matches_single_query(spark):
    emb, vecs = _pq_emb(spark, n=150, dims=16, seed=33)
    emb = emb.repartition(6)          # force multi-partition partial top-k
    cb = textops.pq_codebook_train(emb, dims=16, m=8, ksub=16, seed=7)
    ids = [0, 17, 99]
    batch = textops.pq_adc_topk_batch(emb, ids, dims=16, codebook=cb,
                                      k=5).toPandas()
    for q in ids:
        single = textops.pq_adc_topk(emb, query_id=q, dims=16, codebook=cb,
                                     k=5).toPandas()
        b = batch[batch.query_id == q].sort_values("rank")
        assert list(b.vec_id) == list(single.vec_id)
        np.testing.assert_allclose(b.adc_d2.to_numpy(),
                                   single.adc_d2.to_numpy(), atol=1e-9)


def test_contamination_pairs(spark):
    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "totally unrelated content with different words here"),
        (3, "alpha beta gamma delta something else entirely"),  # 2 shared trigrams with probe 10
    ], "doc_id long, text string")
    probes = spark.createDataFrame([
        (10, "alpha beta gamma delta epsilon"),
    ], "probe_id long, text string")
    out = textops.contamination_pairs(docs, probes, min_shared=2).toPandas()
    got = {(int(r.doc_id), int(r.probe_id)): int(r.n_shared_ngrams)
           for _, r in out.iterrows()}
    # doc 1 shares 3 trigrams (abc, bcd, cde), doc 3 shares 2 (abc, bcd),
    # doc 2 shares none
    assert got == {(1, 10): 3, (3, 10): 2}


def test_repetition_stats(spark):
    docs = spark.createDataFrame([
        (1, "spam spam spam spam spam"),        # max repetition
        (2, "all words here are unique ones"),  # no repetition
        (3, "one"),                             # no bigrams/trigrams
    ], "doc_id long, text string")
    out = textops.repetition_stats(docs).toPandas().set_index("doc_id")
    r1 = out.loc[1]
    assert r1.n_bigrams == 4 == r1.top_bigram_n       # all bigrams identical
    assert r1.n_trigrams == 3 and r1.n_distinct_trigrams == 1
    r2 = out.loc[2]
    assert r2.top_bigram_n == 1                       # every bigram unique
    assert r2.n_trigrams == r2.n_distinct_trigrams == 4
    r3 = out.loc[3]
    assert r3.n_bigrams == 0 and r3.top_bigram_n == 0 and r3.n_trigrams == 0


def test_short_docs_yield_empty_ngrams_not_errors(spark):
    # sequence(1, 0) is DESCENDING in Spark — a 1-2 token doc used to
    # throw INVALID_INDEX_OF_ZERO inside the trigram transform
    docs = spark.createDataFrame(
        [(1, "one"), (2, "two words"), (3, "now three tokens")],
        "doc_id long, text string")
    sh = textops.explode_trigrams(docs).toPandas()
    assert set(sh.doc_id) == {3} and list(sh.shingle) == ["now three tokens"]
    rep = textops.repetition_stats(docs).toPandas().set_index("doc_id")
    assert rep.loc[1].n_bigrams == 0 and rep.loc[2].n_trigrams == 0


def test_image_features_to_pq_ann_composition(spark):
    """Axes A+B end to end: synthesized image+caption rows -> batched
    decode + raster features (one Arrow crossing) -> feature vectors as
    embeddings -> PQ codebook + batch-ADC similarity search. Pins that
    the multimodal feature output plugs straight into the ANN family."""
    from data_cube_utilities_spark import synth
    from data_cube_utilities_spark.operators import rasterops

    img = synth.synthesize_images(spark, 80, tile_px=16)
    feats = rasterops.tile_features(img)
    emb = (feats.select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.array("clean_frac", "water_frac", "mean_ndvi", "mean_nir")
         .cast("array<double>").alias("embedding"))
        .na.drop().localCheckpoint(eager=True))
    n = emb.count()
    assert n > 50
    cb = textops.pq_codebook_train(emb, dims=4, m=2, ksub=8, seed=3)
    qid = int(emb.select("vec_id").first()[0])
    out = textops.pq_adc_topk_batch(emb, [qid], dims=4, codebook=cb,
                                    k=5).toPandas()
    assert len(out) == 5 and (out.query_id == qid).all()
    assert (out.adc_d2 >= 0).all() and out["rank"].tolist() == [1, 2, 3, 4, 5]


def test_pq_null_and_nan_vectors_excluded_from_adc(spark):
    # NULL embeddings -> NULL codes -> not candidates (no kernel crash);
    # NaN-containing vectors must NOT silently encode as centroid 0
    rows = [(0, [0.0] * 8), (1, [1.0] * 8), (2, None),
            (3, [float("nan")] + [0.0] * 7), (4, [2.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = textops.pq_codebook_first_rows(df.filter("embedding is not null")
                                        .filter("vec_id != 3"),
                                        dims=8, m=2, ksub=3)
    codes = textops.pq_encode(df, cb).toPandas().set_index("vec_id")
    assert codes.loc[2].codes is None and codes.loc[3].codes is None
    single = textops.pq_adc_topk(df, query_id=0, dims=8, codebook=cb,
                                 k=10).toPandas()
    assert set(single.vec_id) == {1, 4}          # 2 and 3 excluded
    batch = textops.pq_adc_topk_batch(df, [0], dims=8, codebook=cb,
                                      k=10).toPandas()
    assert set(batch.vec_id) == {1, 4}
    with pytest.raises(ValueError, match="none of query_ids"):
        textops.pq_adc_topk_batch(df, [999], dims=8, codebook=cb, k=5)


def test_deterministic_sample_reproducible_and_stratified(spark):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
         .alias("source"))
    a = textops.deterministic_sample(docs, fraction=0.3).toPandas()
    b = textops.deterministic_sample(docs.repartition(7),
                                     fraction=0.3).toPandas()
    # identical draw regardless of partitioning; rate near 30%
    assert sorted(a.doc_id) == sorted(b.doc_id)
    assert 0.2 < len(a) / 1000 < 0.4
    # independent draw under a different salt
    c = textops.deterministic_sample(docs, fraction=0.3, salt="v2").toPandas()
    assert sorted(c.doc_id) != sorted(a.doc_id)
    st = textops.deterministic_sample(
        docs, fractions={"src0": 1.0, "src1": 0.2}).toPandas()
    assert set(st.source) <= {"src0", "src1"}     # whitelist semantics
    assert (st.source == "src0").sum() == 250     # fraction 1.0 keeps all
    assert 20 < (st.source == "src1").sum() < 80
    with pytest.raises(ValueError, match="exactly one"):
        textops.deterministic_sample(docs)


def test_hash_bucket_null_id_never_sampled(spark):
    # NULL ids must propagate to a NULL bucket (the SQL twin's || rule):
    # concat_ws would give every NULL id the one bucket of '#salt',
    # silently sampling them in or out as a block
    docs = spark.createDataFrame(
        [(None, "a"), ("d1", "b")], "doc_id string, source string")
    b = docs.select(textops.hash_bucket_col().alias("bucket")).toPandas()
    assert b.bucket.isna().sum() == 1
    kept = textops.deterministic_sample(docs, fraction=1.0).toPandas()
    assert list(kept.doc_id) == ["d1"]        # NULL id fails every gate


def test_char_bigram_familiarity(spark):
    docs = spark.createDataFrame([
        (1, "aaaa"), (2, "aaab"), (3, "zq"), (4, "x"),
    ], "doc_id long, text string")
    out = textops.char_bigram_familiarity(docs).toPandas().set_index("doc_id")
    # corpus counts: 'aa' x5 (3 from doc1, 2 from doc2), 'ab' x1, 'zq' x1
    assert out.loc[1].familiarity_total == 15 and out.loc[1].n_bigrams == 3
    assert out.loc[2].familiarity_total == 11 and out.loc[2].n_bigrams == 3
    assert out.loc[3].familiarity_total == 1    # rare bigram -> low score
    assert out.loc[4].familiarity_total == 0 == out.loc[4].n_bigrams
    # the garbled doc scores lowest per-bigram — the gate's purpose
    per = out.familiarity_total / out.n_bigrams.clip(lower=1)
    assert per.loc[3] < per.loc[1]


def test_ivf_pq_persisted_index_partition_pruning(spark, tmp_path):
    """The persisted index is the 100TB shape: codes partitioned by
    list_id on disk, a query's probed lists read as PRUNED partitions —
    asserted from the physical plan's PartitionFilters — and the result
    matches the in-memory ivf_pq path's ADC semantics."""
    emb, vecs = _pq_emb(spark, n=200, dims=16, seed=55)
    path = str(tmp_path / "ivfpq_index")
    meta = textops.ivf_pq_index_write(emb, path, dims=16, n_lists=4,
                                      m=4, ksub=16)
    assert meta["n_lists"] == 4 and meta["m"] == 4
    out_df = textops.ivf_pq_index_query(spark, path, vecs[0], k=5,
                                        n_probe=2)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    out = out_df.toPandas()
    assert 1 <= len(out) <= 5 and out.list_id.nunique() <= 2
    # scores are genuine ADC distances: non-negative, ranked ascending
    assert (out.adc_d2 >= 0).all()
    assert out.adc_d2.is_monotonic_increasing
    # files of unprobed lists are never part of the scan's selected
    # partitions (directory-level pruning)
    import re
    m2 = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m2 and "list_id" in m2.group(1)


def test_deterministic_sample_is_nested(spark):
    """Threshold buckets nest: growing the rate keeps every previously
    sampled row (same salt) — the property that lets a training mix grow
    without reshuffling what was already shipped."""
    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    small = set(textops.deterministic_sample(docs, fraction=0.1)
                .toPandas().doc_id)
    big = set(textops.deterministic_sample(docs, fraction=0.3)
              .toPandas().doc_id)
    assert small <= big and len(small) < len(big)


def test_pack_chunks_invariants(spark):
    import random
    rng = random.Random(7)
    docs = spark.createDataFrame(
        [(i, " ".join("w" * 1 for _ in range(rng.randint(1, 40))))
         for i in range(200)],
        "doc_id long, text string")
    W = 32
    m = textops.pack_chunks(docs, window=W, n_shards=8).toPandas()
    # a zero-token doc (only expressible via an explicit count column —
    # the whitespace tokenizer maps "" to the single token [""]) is
    # dropped: it has no stream positions
    zdocs = docs.withColumn(
        "ntok", F.when(F.col("doc_id") == 0, 0)
                 .otherwise(F.size(F.split("text", " "))))
    mz = textops.pack_chunks(zdocs, window=W, n_shards=8,
                             n_tokens="ntok").toPandas()
    assert 0 not in set(mz.doc_id) and 1 in set(mz.doc_id)
    # per-doc spans tile the doc exactly: contiguous tok_begin, sum == n
    tok = docs.toPandas()
    tok["n"] = tok.text.str.split(" ").str.len()
    per_doc = m.groupby("doc_id").n_tok.sum()
    assert (per_doc.sort_index().values ==
            tok.set_index("doc_id").n.sort_index().values).all()
    for _, grp in m.groupby("doc_id"):
        g = grp.sort_values("tok_begin")
        assert g.tok_begin.iloc[0] == 0
        assert (g.tok_begin.values[1:] ==
                (g.tok_begin + g.n_tok).values[:-1]).all()
    # every chunk but the last is exactly full and tiles [0, W)
    fill = m.groupby("chunk_id").n_tok.sum().sort_index()
    assert (fill.values[:-1] == W).all() and fill.values[-1] <= W
    for _, grp in m.groupby("chunk_id"):
        g = grp.sort_values("pos_in_chunk")
        assert g.pos_in_chunk.iloc[0] == 0
        assert (g.pos_in_chunk.values[1:] ==
                (g.pos_in_chunk + g.n_tok).values[:-1]).all()
    # deterministic under repartitioning (the manifest IS the contract)
    m2 = textops.pack_chunks(docs.repartition(13), window=W,
                             n_shards=8).toPandas()
    key = ["chunk_id", "doc_id", "pos_in_chunk", "tok_begin", "n_tok"]
    assert sorted(map(tuple, m[key].values.tolist())) == \
        sorted(map(tuple, m2[key].values.tolist()))


def test_redact_pii(spark):
    rows = [
        (1, "mail a.b-c_d@sub.example.co and x@y.io today"),
        (2, "server 192.168.0.1 then 10.0.300.7 and v1.2 only"),
        (3, "call +1 555 0123 or +44 20-7946-0958 now"),
        (4, "mixed bob@h.org at 8.8.8.8 phone +15550100 end"),
        (5, "clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.redact_pii(df).toPandas().set_index("doc_id")
    assert out.loc[1].n_email == 2 and "<EMAIL>" in out.loc[1].redacted
    assert "@" not in out.loc[1].redacted
    # over-redaction is the contract: 10.0.300.7 matches the simple form
    assert out.loc[2].n_ipv4 == 2 and "v1.2" in out.loc[2].redacted
    assert out.loc[3].n_phone == 2
    r4 = out.loc[4]
    assert (r4.n_email, r4.n_ipv4, r4.n_phone) == (1, 1, 1)
    assert r4.redacted == "mixed <EMAIL> at <IPV4> phone <PHONE> end"
    r5 = out.loc[5]
    assert (r5.n_email, r5.n_ipv4, r5.n_phone) == (0, 0, 0)
    assert r5.redacted == rows[4][1]


def test_near_dup_clusters_transitive_and_singletons(spark):
    # A~B and B~C pair via shared band signatures, but the cluster must
    # close TRANSITIVELY (A, B, C in one cluster) even if A and C never
    # pair directly; D is untouched -> its own singleton cluster.
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame([
        (10, base),
        (11, base + " extra"),                     # near-dup of 10
        (12, base + " extra words"),               # near-dup of 11
        (40, "completely different unrelated content with other words here"),
    ], "doc_id long, text string")
    out = textops.near_dup_clusters(docs, n_bands=8).toPandas() \
        .set_index("doc_id").sort_index()
    assert set(out.index) == {10, 11, 12, 40}
    # the dup chain collapses to one cluster labeled by the min id
    assert out.loc[10].cluster_id == out.loc[11].cluster_id \
        == out.loc[12].cluster_id == 10
    assert out.loc[40].cluster_id == 40 and out.loc[40].cluster_size == 1
    # exactly one keeper per cluster, and it is the min id
    keepers = out[out.is_keeper == 1]
    assert sorted(keepers.index) == [10, 40]
    assert out.loc[10].cluster_size == 3


def test_cluster_from_pairs_is_detector_agnostic(spark):
    # the resolution step must compose with ANY pair table: hand it a
    # synthetic pair graph (7-8, 8-9 chain; 20 isolated) and check the
    # closure, keepers, and sizes without any detector in the loop
    rows = spark.createDataFrame(
        [(7,), (8,), (9,), (20,)], "doc_id long")
    pairs = spark.createDataFrame(
        [(7, 8), (8, 9)], "doc_a long, doc_b long")
    out = textops.cluster_from_pairs(rows, pairs).toPandas() \
        .set_index("doc_id").sort_index()
    assert list(out.cluster_id) == [7, 7, 7, 20]
    assert list(out.is_keeper) == [1, 0, 0, 1]
    assert list(out.cluster_size) == [3, 3, 3, 1]


def test_semantic_dedup_clusters_matches_pair_graph(spark):
    # keepers of semantic_dedup_clusters == CC closure of the
    # embedding_near_dup_pairs graph at the same threshold
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    th, planes = 0.3, textops.PLANES_PER_BAND
    out = textops.semantic_dedup_clusters(emb, threshold=th, dims=64,
                                          planes=planes).toPandas()
    assert len(out) == emb.count()
    pairs = textops.embedding_near_dup_pairs(emb, threshold=th, dims=64,
                                             planes=planes).toPandas()
    # every paired vec shares a cluster with its partner
    cid = dict(zip(out.vec_id, out.cluster_id))
    assert all(cid[a] == cid[b] for a, b in zip(pairs.vec_a, pairs.vec_b))
    # one keeper per cluster, keeper is the min id of its cluster
    g = out.groupby("cluster_id")
    assert (g.is_keeper.sum() == 1).all()
    assert (g.apply(lambda d: d.vec_id.min() == d.cluster_id)).all()


def test_duplicate_spans_counts(spark):
    span = textops.duplicate_spans
    shared = " ".join(f"tok{i}" for i in range(10))       # one 10-token window
    docs = spark.createDataFrame([
        (1, shared + " unique1 unique2"),                  # shares w/ doc 2
        (2, shared),                                       # exactly the window
        (3, " ".join(["rep"] * 12)),                       # self-repetition only
        (4, "too short"),                                  # < span tokens
    ], "doc_id long, text string")
    out = span(docs, span=10).toPandas().set_index("doc_id").sort_index()
    # doc 2: single window, duplicated cross-doc
    assert out.loc[2].n_spans == 1
    assert out.loc[2].n_dup_spans == 1 == out.loc[2].n_cross_dup_spans
    # doc 1: 3 windows, only the first matches doc 2
    assert out.loc[1].n_spans == 3
    assert out.loc[1].n_dup_spans == 1 == out.loc[1].n_cross_dup_spans
    # doc 3: all 3 windows are the same hash -> dup within doc, not cross
    assert out.loc[3].n_spans == 3
    assert out.loc[3].n_dup_spans == 3 and out.loc[3].n_cross_dup_spans == 0
    # doc 4: shorter than the span -> zero rows, still present
    assert out.loc[4].n_spans == 0 and out.loc[4].n_dup_spans == 0


def test_repetition_profile_hand_computed(spark):
    docs = spark.createDataFrame([
        (1, "a a a b"),            # top1 a=3/4; bigrams: aa aa ab -> top2 2/3;
                                   # trigrams: aaa aab -> no dup
        (2, "x y x y x y"),        # 6 toks, top1 3/6; bigrams xy yx xy yx xy
                                   # top2 3/5; trigrams xyx yxy xyx yxy ->
                                   # all 4 occurrences duplicated
        (3, "solo"),               # 1 token: no bigrams/trigrams -> NULL fracs
        (4, "one two"),            # bigram exists, trigram doesn't
    ], "doc_id long, text string")
    out = (textops.repetition_profile(docs)
           .toPandas().set_index("doc_id").sort_index())
    r1 = out.loc[1]
    assert r1.n_tokens == 4 and r1.top1_cnt == 3
    assert r1.n_bigrams == 3 and r1.top2_cnt == 2
    assert r1.n_trigrams == 2 and r1.dup3_occ == 0
    assert abs(r1.top1_frac - 0.75) < 1e-12
    r2 = out.loc[2]
    assert r2.n_trigrams == 4 and r2.dup3_occ == 4
    assert abs(r2.dup3_frac - 1.0) < 1e-12
    r3 = out.loc[3]
    assert r3.n_tokens == 1 and pd.isna(r3.top2_frac) and pd.isna(r3.dup3_frac)
    r4 = out.loc[4]
    assert r4.n_bigrams == 1 and r4.top2_cnt == 1 and pd.isna(r4.dup3_frac)


def test_decontaminate_hand_computed(spark):
    bench = spark.createDataFrame([
        (100, "alpha beta gamma delta"),       # grams: abc bcd (n=3)
    ], "doc_id long, text string")
    train = spark.createDataFrame([
        (1, "alpha beta gamma zzz"),           # 2 grams, 1 contaminated
        (2, "alpha beta gamma delta"),         # 2 grams, both contaminated
        (3, "x y z w"),                        # 2 grams, clean
        (4, "a b"),                            # too short: no grams
    ], "doc_id long, text string")
    out = (textops.decontaminate(train, bench, n=3)
           .toPandas().set_index("doc_id").sort_index())
    assert out.loc[1].n_grams == 2 and out.loc[1].n_contaminated == 1
    assert out.loc[1].n_bench_docs_hit == 1
    assert abs(out.loc[1].contamination_frac - 0.5) < 1e-12
    assert out.loc[2].n_contaminated == 2
    assert abs(out.loc[2].contamination_frac - 1.0) < 1e-12
    assert out.loc[3].n_contaminated == 0 and out.loc[3].n_bench_docs_hit == 0
    # doc 4 has zero grams -> not present (no gram rows), same as the oracle
    assert 4 not in out.index


def test_decontaminate_multi_bench_docs(spark):
    bench = spark.createDataFrame([
        (100, "p q r"), (101, "p q r s"),
    ], "doc_id long, text string")
    train = spark.createDataFrame([
        (1, "p q r t"),   # gram 'p q r' hits BOTH bench docs; 'q r t' clean
    ], "doc_id long, text string")
    row = textops.decontaminate(train, bench, n=3).toPandas().iloc[0]
    # multiplicity from the 2 bench matches must not inflate n_grams
    assert row.n_grams == 2 and row.n_contaminated == 1
    assert row.n_bench_docs_hit == 2


def test_leakage_safe_split_duplicates_stay_together(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i % 7}", "en") for i in range(70)],
        "doc_id long, text string, lang string")
    out = textops.leakage_safe_split(docs).toPandas()
    # identical content -> identical split, regardless of doc_id
    per_text = out.groupby("text").split.nunique()
    assert (per_text == 1).all()
    assert set(out.split.unique()) <= {"train", "val", "test"}
    # deterministic: rerun gives the same assignment
    again = textops.leakage_safe_split(docs).toPandas()
    assert out.sort_values("doc_id").split.tolist() \
        == again.sort_values("doc_id").split.tolist()
    # different salt redraws (7 distinct texts -> overwhelmingly likely
    # at least one moves; pinned by these fixed inputs)
    redraw = textops.leakage_safe_split(docs, salt="v2").toPandas()
    assert redraw.sort_values("doc_id").split.tolist() \
        != out.sort_values("doc_id").split.tolist()


def test_split_summary_accounts_everything(spark):
    docs = spark.createDataFrame(
        [(i, f"doc body {i}", ["en", "de"][i % 2]) for i in range(40)],
        "doc_id long, text string, lang string")
    out = textops.split_summary(docs).toPandas()
    assert out.n_docs.sum() == 40
    assert (out.groupby("lang").n_docs.sum() == 20).all()
    assert (out.n_distinct_texts <= out.n_docs).all()


def test_chunk_documents_tiling_and_hashes(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(80))),
         (2, "a b c"),
         (3, " ".join(f"t{i}" for i in range(32))),
         (4, " ".join(f"u{i}" for i in range(33)))],
        "doc_id long, text string")
    out = textops.chunk_documents(docs, window=32, stride=24).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_idx")
    assert d1.start_tok.tolist() == [0, 24, 48]
    assert d1.n_tok.tolist() == [32, 32, 32]
    toks = [f"w{i}" for i in range(80)]
    exp = hashlib.md5(" ".join(toks[24:56]).encode()).hexdigest()
    assert d1[d1.chunk_idx == 1].chunk_hash.iloc[0] == exp
    # short doc: one partial chunk; exact-window doc: one full chunk;
    # window+1: the trailing partial is kept (coverage reaches the end)
    assert out[out.doc_id == 2].n_tok.tolist() == [3]
    assert out[out.doc_id == 3].n_tok.tolist() == [32]
    d4 = out[out.doc_id == 4].sort_values("chunk_idx")
    assert d4.start_tok.tolist() == [0, 24] and d4.n_tok.tolist() == [32, 9]
    # coverage invariant: for every doc, last start + last n_tok == n
    for did, n in [(1, 80), (2, 3), (3, 32), (4, 33)]:
        last = out[out.doc_id == did].sort_values("chunk_idx").iloc[-1]
        assert last.start_tok + last.n_tok == n


def test_oov_stats_vocab_boundary(spark):
    # 'a' x4, 'b' x3, 'c' x2, 'd' x1 -> vocab_k=2 keeps {a, b}
    docs = spark.createDataFrame([
        (1, "a a b d"),     # 1 OOV of 4
        (2, "a b c c"),     # 2 OOV of 4
        (3, "a b"),         # 0 OOV
    ], "doc_id long, text string")
    out = (textops.oov_stats(docs, vocab_k=2)
           .toPandas().set_index("doc_id").sort_index())
    assert out.loc[1].n_oov == 1 and abs(out.loc[1].oov_frac - 0.25) < 1e-12
    assert out.loc[2].n_oov == 2
    assert out.loc[3].n_oov == 0 and out.loc[3].oov_frac == 0.0
    # tie-break determinism: with k=3 the c-vs-nothing boundary adds 'c'
    # (count 2) ahead of 'd' (count 1)
    out3 = (textops.oov_stats(docs, vocab_k=3)
            .toPandas().set_index("doc_id"))
    assert out3.loc[2].n_oov == 0 and out3.loc[1].n_oov == 1


def test_domain_gate_drops_template_farm(spark):
    from data_cube_utilities_spark.operators import textops

    rows = (
        # healthy domain: unique pages, sane lengths
        [(i, f"unique page number {i} with plenty of words", "en", "good")
         for i in range(10)]
        # template farm: 10 docs, 2 distinct texts -> 80% dup
        + [(100 + i, "same boilerplate body", "en", "farm")
           for i in range(8)]
        + [(108, "the other boilerplate", "en", "farm"),
           (109, "the other boilerplate", "en", "farm")]
        # degenerate: tiny mean length
        + [(200 + i, f"x{i}", "en", "tiny") for i in range(5)])
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    out = {r.source: r for r in textops.domain_gate(
        df, max_dup_pct=20, min_mean_chars=5,
        max_mean_chars=1000).collect()}
    assert out["good"].keep and out["good"].dup_docs == 0
    assert not out["farm"].keep and not out["farm"].ok_dup
    assert out["farm"].n_unique_texts == 2 and out["farm"].dup_docs == 8
    assert not out["tiny"].keep and not out["tiny"].ok_len
    assert out["tiny"].ok_dup  # fails only the length gate


def test_fuzzy_self_join_blocking_and_distance(spark):
    from data_cube_utilities_spark.operators import textops

    rows = [
        (1, "gadget mk1"),
        (2, "gadget mk2"),        # dist 1 from 1
        (3, "gadget mk22"),       # dist 1 from 2, 2 from 1
        (4, "gidget mk1"),        # dist 1 from 1 (interior edit)
        (5, "badget mk1"),        # dist 1 from 1 BUT first char differs
        (6, "completely other"),
        (7, "gadget mk1 extra!"), # length diff 7 > 2: pruned
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.id_a, r.id_b): r.dist for r in
           textops.fuzzy_self_join(df, max_dist=2).collect()}
    assert out[(1, 2)] == 1 and out[(1, 4)] == 1
    assert out[(2, 3)] == 1 and out[(1, 3)] == 2 and out[(2, 4)] == 2
    # documented blocking contract: a first-character typo escapes
    assert (1, 5) not in out
    # length lower bound prunes; unrelated strings absent
    assert not any(7 in p or 6 in p for p in out)
    # band-straddling lengths still pair via the exploded probe bands
    df2 = spark.createDataFrame(
        [(1, "ab"), (2, "abc")], "doc_id long, text string")
    got = textops.fuzzy_self_join(df2, max_dist=1).collect()
    assert len(got) == 1 and got[0].dist == 1
