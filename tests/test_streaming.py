"""Structured Streaming: windowed incremental stats equal the batch twin;
micro-batch snapshot commits are idempotent and resume."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from data_cube_utilities_spark import synth
from data_cube_utilities_spark.streaming import incremental as S
from data_cube_utilities_spark.sources.snapshots import SnapshotTable


@pytest.fixture(scope="module")
def image_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("imgstream"))
    (synth.synthesize_images(spark, 120, tile_px=8, partitions=6)
     .write.mode("overwrite").parquet(d))
    return d


def test_streaming_stats_equal_batch(spark, image_dir):
    stream = S.read_image_stream(spark, image_dir, max_files_per_trigger=2)
    agg = S.streaming_cell_stats(stream, window="365 days", watermark="0 seconds")
    S.run_stream_to_memory(agg, "cellstats")
    got = spark.sql("SELECT cell_id, window.start AS ws, n_obs FROM cellstats") \
        .toPandas().sort_values(["cell_id", "ws"]).reset_index(drop=True)
    batch = (spark.read.parquet(image_dir)
             .groupBy("cell_id", F.window("acquired_at", "365 days"))
             .agg(F.count("*").alias("n_obs"))
             .select("cell_id", F.col("window.start").alias("ws"), "n_obs")
             .toPandas().sort_values(["cell_id", "ws"]).reset_index(drop=True))
    assert got.equals(batch)


def test_sliding_window_stats_over_image_table(spark, image_dir):
    """Operator-level home (VERDICT r3 #6): sliding windows over the image
    table keyed by cell_id. slide = length/2 -> every acquisition lands in
    exactly 2 windows, so the per-cell window-count sum is 2x row count."""
    imgs = spark.read.parquet(image_dir)
    out = S.sliding_window_stats(
        imgs, "acquired_at", length="60 days", slide="30 days",
        keys=("cell_id",),
        aggs=[F.count("*").alias("n_obs")]).toPandas()
    n_rows = imgs.count()
    assert out.n_obs.sum() == 2 * n_rows
    assert set(out.columns) == {"cell_id", "window", "n_obs"}


def test_session_window_stats_over_image_table(spark, image_dir):
    """Gap sessions per cell: with a huge gap everything is one session
    per cell; totals are preserved."""
    imgs = spark.read.parquet(image_dir)
    one = S.session_window_stats(
        imgs, "acquired_at", gap="3650 days", keys=("cell_id",),
        aggs=[F.count("*").alias("n_obs")]).toPandas()
    per_cell = imgs.groupBy("cell_id").count().toPandas()
    assert len(one) == len(per_cell)
    assert one.n_obs.sum() == per_cell["count"].sum()


def test_sliding_window_stats_works_on_stream(spark, image_dir):
    """The same operator body drives a readStream source (watermark added
    upstream) — the batch/streaming unification the family exists for."""
    stream = S.read_image_stream(spark, image_dir, max_files_per_trigger=4) \
              .withWatermark("acquired_at", "0 seconds")
    agg = S.sliding_window_stats(
        stream, "acquired_at", length="60 days", slide="30 days",
        keys=("cell_id",), aggs=[F.count("*").alias("n_obs")])
    assert agg.isStreaming
    S.run_stream_to_memory(agg, "slidestats")
    got = spark.sql("SELECT sum(n_obs) AS s FROM slidestats").first()["s"]
    assert got == 2 * spark.read.parquet(image_dir).count()


def test_watermark_evicts_late_rows(spark, tmp_path):
    """Late-data semantics end to end (the watermark clause of SURVEY
    2.10): a row arriving AFTER the watermark has passed its window must
    be dropped, so the append-mode result differs from the batch fold by
    exactly the late row. File order is forced via mtimes +
    maxFilesPerTrigger=1 (FileStreamSource processes oldest-first)."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = str(tmp_path / "late_src")
    os.makedirs(d)

    def write(name, stamps):
        t = pa.table({"ts": pd.to_datetime(stamps)
                      .values.astype("datetime64[us]"),
                      "v": [1] * len(stamps)})
        pq.write_table(t, f"{d}/{name}.parquet")
        time.sleep(1.1)                  # distinct mtime -> stable order

    # batch 0: three on-time rows in window 00:00-00:10, plus a 01:00 row
    # that advances the watermark to 00:55 (delay 5 min) at batch end
    write("a", ["2020-01-01 00:05:00"] * 3 + ["2020-01-01 01:00:00"])
    # batch 1 runs WITH watermark 00:55: window 00:00-00:10 is finalized
    # (emitted n=3, state evicted). A row arriving in the SAME batch as
    # finalization would still be merged — eviction only protects windows
    # closed in an EARLIER batch, hence this spacer batch.
    write("b", ["2020-01-01 01:01:00"])
    # batch 2: the LATE row for the long-closed window (00:06 < watermark
    # 00:55, state already gone -> dropped), plus a 02:00 row that pushes
    # the final watermark past the 01:00 window so it emits too
    write("c", ["2020-01-01 00:06:00", "2020-01-01 02:00:00"])

    stream = (spark.readStream.schema("ts timestamp, v long")
              .option("maxFilesPerTrigger", 1).parquet(d)
              .withWatermark("ts", "5 minutes"))
    agg = stream.groupBy(F.window("ts", "10 minutes")) \
                .agg(F.count("*").alias("n"))
    q = (agg.writeStream.format("memory").queryName("latewin")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.sql("SELECT window.start AS ws, n FROM latewin")
           .toPandas().sort_values("ws").reset_index(drop=True))
    # the closed first window counts 3, NOT 4 — the late row was evicted;
    # the batch fold over the same files would count 4
    assert str(got.ws.iloc[0]).startswith("2020-01-01 00:00") \
        and got.n.iloc[0] == 3
    batch_n = (spark.read.parquet(d)
               .groupBy(F.window("ts", "10 minutes"))
               .agg(F.count("*").alias("n"))
               .filter(F.col("window.start") == "2020-01-01 00:00:00")
               .first()["n"])
    assert batch_n == 4          # the batch fold still sees the late row


def test_foreach_batch_snapshot_commits(spark, image_dir, tmp_path):
    table_path = str(tmp_path / "snap_tbl")
    ckpt = str(tmp_path / "ckpt")
    stream = S.read_image_stream(spark, image_dir, max_files_per_trigger=2) \
        .select("image_id", "cell_id", "acquired_at", "phash")
    q = S.foreach_batch_snapshot(stream, table_path, ckpt)
    q.awaitTermination(120)
    table = SnapshotTable(table_path)
    assert table.current_version() is not None
    total = table.read(spark).count()
    assert total == 120
    batch_ids = [m["lineage"]["batch_id"] for m in table.history()]
    assert len(batch_ids) == len(set(batch_ids))  # idempotent commits
    # restart with same checkpoint: no new data -> no new snapshots
    v_before = table.current_version()
    q2 = S.foreach_batch_snapshot(stream, table_path, ckpt)
    q2.awaitTermination(60)
    assert table.current_version() == v_before


def test_stateful_saturation_equals_batch_twin(spark, image_dir):
    """applyInPandasWithState branch of SURVEY 2.10: keyed state (63-bucket phash
    bitmap + count) must survive micro-batch boundaries —
    maxFilesPerTrigger=2 over 6 files forces >=3 batches — and the LAST
    update per cell must equal the one-pass batch fold exactly (the fold
    is order-insensitive, so arrival order cannot matter)."""
    from data_cube_utilities_spark.streaming import stateful

    stream = S.read_image_stream(spark, image_dir, max_files_per_trigger=2)
    agg = stateful.streaming_cell_saturation(stream)
    q = (agg.writeStream.format("memory").queryName("satur")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # memory sink in update mode appends every emitted update; the final
    # state per cell is the row with the highest n_obs
    got = (spark.sql("SELECT * FROM satur").toPandas()
           .sort_values("n_obs").groupby("cell_id").last().reset_index()
           .sort_values("cell_id").reset_index(drop=True))
    exp = (stateful.cell_saturation_batch(spark.read.parquet(image_dir))
           .toPandas().sort_values("cell_id").reset_index(drop=True))
    assert got[["cell_id", "n_buckets", "n_obs"]].equals(
        exp[["cell_id", "n_buckets", "n_obs"]])
    # several micro-batches actually ran (state crossed boundaries)
    assert len(spark.sql("SELECT * FROM satur").toPandas()) > len(exp)


def test_streaming_exact_dedup_equals_batch_twin(spark, tmp_path):
    """Streaming exact-dedup gate: state (keeper min-id, copy count)
    crosses micro-batch boundaries; the settled per-hash row equals the
    batch exact_dedup fold under an arrival order that delivers a
    SMALLER doc_id in a LATER batch (the revision case)."""
    from data_cube_utilities_spark.operators import textops
    from data_cube_utilities_spark.streaming import stateful

    d = str(tmp_path / "docstream")
    # file names order the arrival: dup of doc 1 arrives first as doc 9,
    # then the smaller keeper 1 in a later file
    rows = {
        "part-0": [(9, "dup text"), (4, "only copy a")],
        "part-1": [(1, "dup text"), (5, "only copy b")],
        "part-2": [(3, "dup text"), (6, "third text")],
    }
    import os
    os.makedirs(d)
    for fn, rs in rows.items():
        spark.createDataFrame(rs, "doc_id long, text string") \
            .coalesce(1).write.mode("overwrite").parquet(f"{d}/{fn}")
    all_docs = spark.read.option("recursiveFileLookup", "true").parquet(d)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(d))
    out = stateful.streaming_exact_dedup(stream)
    q = (out.writeStream.format("memory").queryName("dedupgate")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    emitted = spark.sql("SELECT * FROM dedupgate").toPandas()
    settled = (emitted.sort_values("n_seen").groupby("text_hash")
               .last().reset_index())
    exp = (textops.exact_dedup(all_docs).toPandas()
           .rename(columns={"keeper_id": "doc_id", "n_copies": "n_seen"}))
    s = settled.sort_values("text_hash").reset_index(drop=True)
    e = exp.sort_values("text_hash").reset_index(drop=True)
    assert s[["text_hash", "doc_id", "n_seen"]].equals(
        e[["text_hash", "doc_id", "n_seen"]])
    # the dup hash was emitted more than once (state really updated
    # across batches) and its keeper was revised downward to 1
    dup_hash = e[e.n_seen == 3].text_hash.iloc[0]
    dup_rows = emitted[emitted.text_hash == dup_hash].sort_values("n_seen")
    assert len(dup_rows) >= 2
    assert dup_rows.doc_id.iloc[-1] == 1


def test_streaming_phash_gate_single_batch_equals_twin(spark, tmp_path):
    """One micro-batch: the streaming phash gate's rows equal
    phash_gate_batch exactly — including a REAL near-dup (hamming 2)
    and an unrelated hash (no shared band key with the others)."""
    from data_cube_utilities_spark.streaming import stateful

    def signed(x):
        return x - (1 << 64) if x >= (1 << 63) else x

    base = 0x1234_5678_9ABC_DEF0
    rows = [("a", base),
            ("b", base ^ 0b101),                  # hamming 2 from a
            ("c", signed(base ^ (1 << 63) ^ 1)),  # hamming 2, sign+low bit
            ("z", 0x7EDC_BA98_7654_3210)]         # unrelated
    d = str(tmp_path / "imgs")
    df = spark.createDataFrame(rows, "image_id string, phash long")
    df.coalesce(1).write.parquet(d)

    stream = (spark.readStream.schema("image_id string, phash long")
              .parquet(d))
    q = (stateful.streaming_phash_near_dup(stream)
         .writeStream.format("memory").queryName("phgate")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (spark.sql("SELECT * FROM phgate").toPandas()
           .sort_values(["band", "key", "member_id"]).reset_index(drop=True))
    exp = (stateful.phash_gate_batch(spark.read.parquet(d)).toPandas()
           .sort_values(["band", "key", "member_id"]).reset_index(drop=True))
    assert got.equals(exp[got.columns.tolist()])
    # b and c collide with keeper a in the bands their flips do NOT
    # touch and are flagged there; z is never flagged
    flagged = got[got.is_dup == 1]
    assert set(flagged.member_id) == {"b", "c"}
    assert (flagged[flagged.member_id == "b"].hamming == 2).all()
    assert "z" not in set(flagged.member_id)


def test_streaming_phash_gate_multibatch_keeper_revision(spark, tmp_path):
    """Keeper revision across micro-batches: a smaller id arriving LATER
    takes over the bucket; the settled keeper/n_seen equal the batch
    twin (commutative fold) while the later batch's rows are judged
    against the revised keeper."""
    from data_cube_utilities_spark.streaming import stateful

    ph = 0x0F0F_0F0F_0F0F_0F0F
    files = {"part-0": [("m", ph)], "part-1": [("a", ph ^ 0b11)]}
    d = str(tmp_path / "imgs2")
    import os
    os.makedirs(d)
    for fn, rs in files.items():
        spark.createDataFrame(rs, "image_id string, phash long") \
            .coalesce(1).write.parquet(f"{d}/{fn}")
    stream = (spark.readStream.schema("image_id string, phash long")
              .option("maxFilesPerTrigger", 1)
              .option("recursiveFileLookup", "true").parquet(d))
    q = (stateful.streaming_phash_near_dup(stream)
         .writeStream.format("memory").queryName("phgate2")
         .outputMode("update").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT * FROM phgate2").toPandas()
    # batch 1: m is its own keeper wherever it lands
    first = got[got.member_id == "m"]
    assert (first.keeper_id == "m").all() and (first.is_dup == 0).all()
    assert (first.n_seen == 1).all()
    # batch 2: the 2-bit flip touches only band 0, so a shares m's
    # bucket in bands 1-3 and REVISES the keeper there ('a' < 'm');
    # judged vs itself -> hamming 0, not dup
    shared = got[(got.member_id == "a") & (got.n_seen == 2)]
    assert sorted(shared.band) == [1, 2, 3]
    assert (shared.keeper_id == "a").all() and (shared.is_dup == 0).all()
    # settled per-bucket state equals the batch twin's keeper/n_seen
    all_imgs = spark.read.option("recursiveFileLookup", "true").parquet(d)
    twin = stateful.phash_gate_batch(all_imgs).toPandas()
    settled = (got.sort_values("n_seen").groupby(["band", "key"])
               .last().reset_index())
    t = (twin.groupby(["band", "key"])
         .agg(keeper_id=("keeper_id", "first"), n_seen=("n_seen", "first"))
         .reset_index())
    m = settled.merge(t, on=["band", "key"], suffixes=("", "_t"))
    assert (m.keeper_id == m.keeper_id_t).all()
    assert (m.n_seen == m.n_seen_t).all()


# -- stream-stream interval join (r5) ----------------------------------------

def _join_events(spark, n=400):
    import pandas as pd
    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame({
        "event_id": range(n),
        "ts": [base + pd.Timedelta(minutes=3 * i + (i % 7)) for i in range(n)],
        "user_id": [i % 9 for i in range(n)],
        # i%2 is coprime to the user cycle i%9, so every user gets both
        # types and same-user neighbors (27 min apart) alternate types
        "event_type": ["click" if i % 2 == 0 else "view" for i in range(n)],
    })
    return spark.createDataFrame(pdf)


def _expected_pairs(spark, df):
    from data_cube_utilities_spark.streaming import incremental
    c = df.filter("event_type = 'click'").select("event_id", "ts", "user_id")
    v = df.filter("event_type = 'view'").select("event_id", "ts", "user_id")
    j = incremental.interval_join(c, v, "user_id", max_lag="30 minutes")
    return sorted(map(tuple, j.select(
        F.col("l.event_id"), F.col("r.event_id")).collect()))


def test_interval_join_batch_semantics(spark):
    df = _join_events(spark)
    got = _expected_pairs(spark, df)
    # brute expectation via SQL
    df.createOrReplaceTempView("je")
    exp = sorted(map(tuple, spark.sql("""
        SELECT l.event_id, r.event_id FROM je l JOIN je r
        ON l.user_id = r.user_id
        AND r.ts >= l.ts - INTERVAL 30 MINUTES AND r.ts <= l.ts
        WHERE l.event_type = 'click' AND r.event_type = 'view'
    """).collect()))
    assert got == exp and len(got) > 0


def test_interval_join_stream_equals_batch_across_batches(spark, tmp_path):
    from data_cube_utilities_spark.streaming import incremental
    df = _join_events(spark)
    d = str(tmp_path / "je_src")
    # 4 files -> maxFilesPerTrigger=1 forces 4 micro-batches; rows of a
    # joinable pair can arrive in DIFFERENT batches on different sides
    df.withColumn("part", F.col("event_id") % 4) \
      .repartition(4, "part").drop("part") \
      .write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema

    def side(kind):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(d)
                .filter(F.col("event_type") == kind)
                .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                        "user_id"))

    # files arrive in ARBITRARY order (hash-partitioned write), so rows
    # can be up to the full 20h data span "late" vs the join watermark;
    # a watermark wider than the span makes nothing evictable — this
    # test pins cross-batch pairing, test_watermark_evicts_late_rows
    # pins eviction
    j = incremental.interval_join(side("click"), side("view"), "user_id",
                                  max_lag="30 minutes",
                                  watermark="100 hours")
    out = j.select(F.col("l.event_id").alias("a"),
                   F.col("r.event_id").alias("b"))
    q = (out.writeStream.format("memory").queryName("ssj_t")
            .outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("ssj_t").collect()))
    spark.catalog.dropTempView("ssj_t")
    exp = _expected_pairs(spark, df)
    assert got == exp and len(got) > 0


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """North-rule resume: a stream killed after a partial ingest restarts
    from its checkpoint and processes ONLY the files it hadn't committed
    — every row lands exactly once across the two runs."""
    from data_cube_utilities_spark import synth
    from data_cube_utilities_spark.sources.snapshots import SnapshotTable

    src = str(tmp_path / "src")
    table_path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    imgs = synth.synthesize_images(spark, 60, tile_px=8, partitions=3) \
        .select("image_id", "cell_id", "acquired_at", "phash")
    # phash is signed: Spark's % keeps the dividend sign, so use pmod
    even = F.pmod(F.col("phash"), F.lit(2)) == 0
    imgs.filter(even).repartition(2).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema(imgs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src)
              .select("image_id", "cell_id", "acquired_at", "phash"))
    q = S.foreach_batch_snapshot(stream, table_path, ckpt)
    q.awaitTermination(120)
    table = SnapshotTable(table_path)
    n_first = table.read(spark).count()
    v_first = table.current_version()
    assert n_first == imgs.filter(even).count()

    # late files arrive while the query is DOWN; restart from checkpoint
    imgs.filter(~even).repartition(2).write.mode("append").parquet(src)
    q2 = S.foreach_batch_snapshot(stream, table_path, ckpt)
    q2.awaitTermination(120)
    got = sorted(r["image_id"] for r in table.read(spark).collect())
    exp = sorted(r["image_id"] for r in imgs.collect())
    assert got == exp                       # exactly once, no loss, no dup
    assert table.current_version() > v_first


def test_streaming_cm_sketch_equals_batch(spark, tmp_path):
    import pandas as pd

    from data_cube_utilities_spark.operators import sketches
    from data_cube_utilities_spark.streaming import incremental as S

    # write the value stream as 3 separate files -> 1+ micro-batches
    src = tmp_path / "cmstream"
    src.mkdir()
    vals = (["a"] * 40 + ["b"] * 15 + ["c"] * 3)
    for i in range(3):
        spark.createDataFrame([(v,) for v in vals[i::3]], "key string") \
             .coalesce(1).write.mode("overwrite") \
             .parquet(str(src / f"part{i}"))
    stream = (spark.readStream.schema("key string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "part*")))
    agg = S.streaming_cm_sketch(stream, "key", depth=4, width=64)
    S.run_stream_to_memory(agg, "cmsketch")
    got = (spark.table("cmsketch").toPandas()
           .sort_values(["r", "b"]).reset_index(drop=True))
    batch = (sketches.cm_sketch(
        spark.createDataFrame([(v,) for v in vals], "key string"),
        "key", depth=4, width=64)
        .toPandas().sort_values(["r", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, batch)
    # the streaming sketch answers point queries identically
    probes = spark.createDataFrame([("a",), ("zzz",)], "v string")
    est = (sketches.cm_estimate(spark.table("cmsketch"), probes,
                                depth=4, width=64)
           .toPandas().set_index("v").est)
    assert est["a"] >= 40 and est["zzz"] >= 0


def _st_events(spark):
    rows = [(i, (i * 7) % 13, (i * 5) % 11,
             f"2024-01-01 {i % 24:02d}:{(i * 17) % 60:02d}:00")
            for i in range(80)]
    return spark.createDataFrame(
        rows, "event_id long, x long, y long, ts string") \
        .select("event_id", "x", "y", F.col("ts").cast("timestamp").alias("ts"))


def test_space_time_pairs_batch_semantics(spark):
    from data_cube_utilities_spark.streaming import incremental

    df = _st_events(spark)
    got = sorted(map(tuple, incremental.space_time_pair_stream(
        df, r_space=3, max_lag="2 hours")
        .select("a_id", "b_id").collect()))
    df.createOrReplaceTempView("ste")
    exp = sorted(map(tuple, spark.sql("""
        SELECT a.event_id, b.event_id FROM ste a JOIN ste b
        ON a.event_id != b.event_id
        AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 9
        AND b.ts BETWEEN a.ts - INTERVAL 2 HOURS
                     AND a.ts + INTERVAL 2 HOURS
    """).collect()))
    assert got == exp and len(got) > 0


def test_space_time_pairs_stream_equals_batch(spark, tmp_path):
    from data_cube_utilities_spark.streaming import incremental

    df = _st_events(spark)
    d = str(tmp_path / "ste_src")
    df.withColumn("part", F.col("event_id") % 4) \
      .repartition(4, "part").drop("part") \
      .write.mode("overwrite").parquet(d)
    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    # watermark wider than the data span: nothing evictable, so the
    # settled pair set must equal the batch twin even though the two
    # rows of a pair can arrive in different micro-batches
    j = incremental.space_time_pair_stream(stream, r_space=3,
                                           max_lag="2 hours",
                                           watermark="100 hours")
    q = (j.writeStream.format("memory").queryName("st_pairs")
          .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple,
                     spark.sql("SELECT a_id, b_id FROM st_pairs").collect()))
    exp = sorted(map(tuple, incremental.space_time_pair_stream(
        df, r_space=3, max_lag="2 hours")
        .select("a_id", "b_id").collect()))
    assert got == exp and len(got) > 0
