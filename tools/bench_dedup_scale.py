"""Scale evidence for the TEXT dedup family at ~400x the driver tables:
200k synthetic documents with planted exact and near duplicates.

Companion to tools/bench_lsh_scale.py (embedding family). Demonstrates
that every dedup mode keeps its intermediates bounded at scale:
  exact      one hash-groupBy shuffle;
  minhash    shingle x band explosion -> tiny signature table ->
             (band, sig) equi-join whose fan-out tracks true near-dup
             mass (template clusters), not n^2;
  simhash    generated-SQL bit votes -> 4x16-bit band equi-join +
             popcount filter (pigeonhole-exact at hamming <= 3);
  jaccard    lang-blocked token join with the max_df stopword cap.

Corpus: 20k template clusters of 10 docs (~30 tokens from a 10^6-word
vocabulary). Members 4 and 9 of each cluster are EXACT copies of the
cluster canonical (deliberately planted exact dups — 2 per cluster); the
other non-canonical members carry 0-2 token substitutions (genuine
near-dup families; a ~1/3-probability zero-substitution draw adds
incidental exact copies on top). Deterministic.

Writes BENCH/DEDUP_SCALE.md and prints one JSON line.
Usage: python tools/bench_dedup_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_DEDUP_ROWS", "200000"))
MEMBERS = 10
TOKENS = 30
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
DOC_DIR = f"/tmp/geocube_bench/documents_{N_DOCS}"
LANGS = ["en", "fr", "de", "es"]


def ensure_documents(spark):
    import numpy as np
    import pandas as pd

    if os.path.exists(os.path.join(DOC_DIR, "_SUCCESS")):
        return

    def gen(batches):
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                cl, member = divmod(i, MEMBERS)
                base = np.random.RandomState(500_007 + cl) \
                    .randint(0, 1_000_000, size=TOKENS)
                toks = base.copy()
                # members 4 and 9: planted exact copies of the canonical
                # (ADVICE r4: the old `i % 20` guard was dead code — i%20==0
                # implies member==0, so no exact copy was ever planted);
                # other non-canonical members get 0-2 substitutions
                if member and member % 5 != 4:
                    rng = np.random.RandomState(64_013 + i)
                    for _ in range(rng.randint(0, 3)):
                        toks[rng.randint(0, TOKENS)] = rng.randint(0, 1_000_000)
                text = " ".join(f"w{t:06d}" for t in toks)
                rows.append((i, text, LANGS[cl % 4], f"s{cl % 16}"))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "lang",
                                              "source"])

    (spark.range(N_DOCS).repartition(CPUS * 2)
     .mapInPandas(gen, "doc_id long, text string, lang string, source string")
     .write.mode("overwrite").parquet(DOC_DIR))


def main():
    from data_cube_utilities_spark.operators import textops
    from data_cube_utilities_spark.session import get_spark

    spark = get_spark("dedup-scale", cores=CPUS, shuffle_partitions=CPUS * 2)
    ensure_documents(spark)
    docs = spark.read.parquet(DOC_DIR)

    out = {"metric": "text_dedup_scale", "rows": N_DOCS}

    t0 = time.time()
    groups = textops.exact_dedup(docs).filter("n_copies > 1").count()
    out["exact"] = {"dup_groups": groups, "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    mh = textops.minhash_lsh_pairs(docs, n_bands=8).count()
    out["minhash"] = {"candidate_pairs": mh,
                      "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    sh = textops.simhash_near_dup_pairs(docs, max_hamming=3).count()
    out["simhash"] = {"pairs_hamming_le3": sh,
                      "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    ng = textops.ngram_jaccard_pairs(docs, threshold=0.8, block_col="lang",
                                     max_df=200).count()
    out["jaccard"] = {"pairs_ge_0.8": ng, "sec": round(time.time() - t0, 2)}

    # cluster RESOLUTION: pair graph -> distributed CC -> keeper per cluster
    from pyspark.sql import functions as _F
    t0 = time.time()
    cl = textops.near_dup_clusters(docs, n_bands=8)
    agg = cl.agg(_F.count("*").alias("n"),
                 _F.sum("is_keeper").alias("keepers"),
                 _F.sum(_F.when(_F.col("cluster_size") > 1, 1)
                        .otherwise(0)).alias("in_multi")).first()
    out["clusters"] = {"docs": int(agg["n"]), "keepers": int(agg["keepers"]),
                       "docs_in_multi": int(agg["in_multi"]),
                       "sec": round(time.time() - t0, 2)}

    # exact-substring span duplication (Lee et al. windowed form)
    t0 = time.time()
    ds = textops.duplicate_spans(docs, span=10)
    dagg = ds.agg(_F.sum("n_spans").alias("spans"),
                  _F.sum("n_cross_dup_spans").alias("cross")).first()
    out["dup_spans"] = {"windows": int(dagg["spans"]),
                        "cross_dup_windows": int(dagg["cross"]),
                        "sec": round(time.time() - t0, 2)}

    # r5 pipeline-stage additions over the same corpus
    from pyspark.sql import functions as F

    t0 = time.time()
    probes = (docs.filter(F.col("doc_id") % 200 == 0)
                  .select(F.col("doc_id").alias("probe_id"), "text"))
    ct = textops.contamination_pairs(docs, probes, min_shared=2)         .filter(F.col("doc_id") != F.col("probe_id")).count()
    out["contamination"] = {"probes": N_DOCS // 200, "pairs": ct,
                            "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    fam = textops.char_bigram_familiarity(docs).count()
    out["familiarity"] = {"rows": fam, "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    samp = textops.deterministic_sample(docs, fraction=0.1).count()
    out["det_sample"] = {"kept": samp, "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    pk = textops.pack_chunks(docs, window=2048, n_shards=CPUS * 4)
    n_chunks = pk.agg(F.max("chunk_id")).first()[0] + 1
    out["pack"] = {"manifest_rows": pk.count(), "chunks": int(n_chunks),
                   "sec": round(time.time() - t0, 2)}

    t0 = time.time()
    rd = textops.redact_pii(docs).agg(
        F.sum("n_email") + F.sum("n_ipv4") + F.sum("n_phone")).first()[0]
    out["redact"] = {"hits": int(rd), "sec": round(time.time() - t0, 2)}

    import shutil
    import tempfile

    from data_cube_utilities_spark.operators import multimodal
    tar_dir = tempfile.mkdtemp(prefix="tarscale_")
    try:
        t0 = time.time()
        man = multimodal.write_tar_shards(
            docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                        F.encode("text", "utf-8").alias("payload")),
            tar_dir, n_shards=CPUS, key_col="doc_id",
            payload_col="payload", ext="txt").toPandas()
        out["tar_shards"] = {"shards": len(man),
                             "mb": round(man.data_bytes.sum() / 1e6, 1),
                             "sec": round(time.time() - t0, 2)}
    finally:
        shutil.rmtree(tar_dir, ignore_errors=True)

    total = sum(v["sec"] for v in out.values() if isinstance(v, dict))
    out["total_sec"] = round(total, 2)
    n_modes = sum(1 for v in out.values()
                  if isinstance(v, dict) and "sec" in v)
    out["docs_per_sec_all_modes"] = round(n_modes * N_DOCS / total, 1)
    spark.stop()
    print(json.dumps(out))

    with open(os.path.join(REPO, "BENCH", "DEDUP_SCALE.md"), "w") as f:
        f.write(f"""# BENCH/DEDUP_SCALE — text dedup family at {N_DOCS:,} documents

Corpus: {N_DOCS // MEMBERS:,} template clusters of {MEMBERS} (~{TOKENS}
tokens from a 10^6-word vocabulary; members carry 0-2 token
substitutions), members 4 and 9 of each cluster exact copies of the
cluster canonical.
All-pairs would be {N_DOCS * (N_DOCS - 1) // 2:,}; every mode below
keeps candidates proportional to planted-duplicate mass.

| mode | result | wall (local[{CPUS}]) |
|---|---|---|
| exact (md5 groupBy) | {out['exact']['dup_groups']:,} dup groups | {out['exact']['sec']}s |
| MinHash+LSH (8 bands) | {out['minhash']['candidate_pairs']:,} candidate pairs | {out['minhash']['sec']}s |
| SimHash (4x16-bit bands, hamming<=3) | {out['simhash']['pairs_hamming_le3']:,} pairs | {out['simhash']['sec']}s |
| n-gram Jaccard (lang-blocked, max_df=200, >=0.8) | {out['jaccard']['pairs_ge_0.8']:,} pairs | {out['jaccard']['sec']}s |
| cluster resolution (pair graph -> distributed CC -> keepers) | {out['clusters']['keepers']:,} keepers / {out['clusters']['docs_in_multi']:,} docs in multi-doc clusters | {out['clusters']['sec']}s |
| exact-substring spans (10-token windows) | {out['dup_spans']['cross_dup_windows']:,} of {out['dup_spans']['windows']:,} windows cross-doc dup | {out['dup_spans']['sec']}s |

r5 pipeline stages over the same corpus:

| stage | result | wall |
|---|---|---|
| decontamination vs {out['contamination']['probes']:,} probes (broadcast trigram join) | {out['contamination']['pairs']:,} flagged pairs | {out['contamination']['sec']}s |
| char-bigram familiarity (broadcast LM counts) | {out['familiarity']['rows']:,} rows scored | {out['familiarity']['sec']}s |
| deterministic 10% sample (md5-bucket, no shuffle) | {out['det_sample']['kept']:,} kept | {out['det_sample']['sec']}s |
| sequence packing (2048-tok chunks, {CPUS * 4} shards) | {out['pack']['manifest_rows']:,} manifest rows / {out['pack']['chunks']:,} chunks | {out['pack']['sec']}s |
| PII redaction (email+ipv4+phone codegen scrub) | {out['redact']['hits']:,} hits | {out['redact']['sec']}s |
| webdataset tar shards ({CPUS} tars, write) | {out['tar_shards']['mb']}MB payload | {out['tar_shards']['sec']}s |

Total {out['total_sec']}s — {out['docs_per_sec_all_modes']:,} doc-passes/s
across the modes, signature/token caches released after each call
(no cache accumulates between modes; the session ends with zero
persistent non-checkpoint RDDs).

Scale notes: the minhash signature table is n_docs x 8 rows regardless of
shingle count (the thing you'd materialize at 100 TB); simhash is one
generated-SQL aggregation pass + a banded equi-join; the Jaccard max_df
cap bounds any token's join fan-out at 200 x block share. Nothing is
all-pairs at any n.
""")


if __name__ == "__main__":
    main()
