"""Scale evidence for the r5-s3 corpus-pipeline stages at ~400x the
driver table: chunking, repetition profiling, decontamination,
leakage-safe split accounting and OOV gating over the same 200k
planted-duplicate corpus as tools/bench_dedup_scale.py (reused on
disk if present).

Shapes being evidenced (the point, since walls depend on host phase):
  chunk_documents      map-side only — explode, NO shuffle;
  repetition_profile   one (doc, n, gram) shuffle + conditional agg;
  decontaminate        eval grams broadcast, corpus never shuffled
                       before its per-doc agg;
  split_summary        one (split, lang) agg, map-side partial;
  oov_stats            TakeOrdered vocab broadcast + one (doc) agg.

Writes BENCH/TEXT_SCALE.md and prints one JSON line.
Usage: python tools/bench_text_pipeline_scale.py
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def spin_anchor():
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2:
        n += 1
    return n


def main():
    from pyspark.sql import functions as F

    from data_cube_utilities_spark.session import get_spark
    from data_cube_utilities_spark.operators import textops
    import tools.bench_dedup_scale as D

    spark = get_spark(cores=CPUS)
    D.ensure_documents(spark)
    docs = spark.read.parquet(D.DOC_DIR)
    n_docs = docs.count()

    results = {}

    def run(name, fn):
        t0 = time.time()
        n = fn().count()
        results[name] = (round(time.time() - t0, 2), n)
        print(name, results[name], flush=True)

    run("chunk_200k", lambda: textops.chunk_documents(
        docs, window=16, stride=12))
    run("repetition_profile_200k", lambda: textops.repetition_profile(docs))
    bench = docs.filter(F.col("doc_id") % 1000 == 0)      # 200-doc eval set
    train = docs.filter(F.col("doc_id") % 1000 != 0)
    run("decontaminate_200k", lambda: textops.decontaminate(
        train, bench, n=5))
    run("split_summary_200k", lambda: textops.split_summary(docs))
    run("oov_stats_200k", lambda: textops.oov_stats(docs, vocab_k=1000))

    out = {"n_docs": n_docs, "cpus": CPUS,
           "anchor_spins_2s": spin_anchor(), "results": results}
    print(json.dumps(out))
    with open(os.path.join(REPO, "BENCH", "TEXT_SCALE.md"), "w") as f:
        f.write("# Corpus-pipeline stages at 200k docs (r5 s3)\n\n")
        f.write("`tools/bench_text_pipeline_scale.py`, local[%d], the "
                "200k planted-duplicate corpus of DEDUP_SCALE.md. Host "
                "anchor %dM spins/2s (fast band 14-22M — see "
                "BASELINE.md).\n\n" % (CPUS, out["anchor_spins_2s"] // 10**6))
        f.write("| op | wall (s) | output rows | scale shape |\n|---|---|---|---|\n")
        shapes = {
            "chunk_200k": "map-side explode, NO shuffle",
            "repetition_profile_200k": "one (doc, n, gram) shuffle + conditional agg",
            "decontaminate_200k": "eval grams broadcast; corpus aggregates per doc without a pre-shuffle",
            "split_summary_200k": "one (split, lang) agg, partial map-side",
            "oov_stats_200k": "TakeOrdered vocab broadcast + one per-doc agg",
        }
        for k, (w, n) in results.items():
            f.write(f"| {k} | {w} | {n:,} | {shapes[k]} |\n")
        f.write("\nEvery stage is one pass over the corpus with either no "
                "shuffle or one keyed aggregate; nothing is quadratic in "
                "docs, and the only broadcast tables (eval grams, top-K "
                "vocab) are small by construction at any corpus size.\n")
    spark.stop()


if __name__ == "__main__":
    main()
