"""Custom stateful streaming operator via applyInPandasWithState —
the survey's OTHER branch for incremental compositing (SURVEY.md 2.10
maps the reference's checkpointed batch recursion to Structured Streaming
`groupBy(cell).applyInPandasWithState` *or* snapshot micro-increments;
incremental.py implements the snapshot branch, this module the true
keyed-state branch).

Operator: per-cell phash-bucket saturation — a 63-bucket occupancy bitmap
of `phash % 63` (63, not 64: bucket 63 would need the sign bit of the
int64 state column) plus a running observation count, carried in GroupState
across micro-batches. Emits an updated (cell_id, n_buckets, n_obs) row
per cell per touched batch. The fold is order-insensitive (bitwise OR /
add), so the streamed result over ANY micro-batch arrival order equals
the batch twin exactly — which is what the parity test pins, with
maxFilesPerTrigger forcing several batches so state genuinely crosses
micro-batch boundaries.

Why a bitmap and not a set: state must stay O(1) per key at 10^12 rows;
the 63-bucket occupancy is the degenerate-but-exact small case of the
HLL-style sketch you would widen at scale (the fold stays a bitwise OR
either way, so the streaming machinery is identical).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = "cell_id long, n_buckets int, n_obs long"
STATE_SCHEMA = "bitmap long, n_obs long"


def _saturate(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    bitmap, n_obs = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        for h in pdf["phash"]:
            bitmap |= 1 << (int(h) % 63)
        n_obs += len(pdf)
    state.update((bitmap, n_obs))
    yield pd.DataFrame({"cell_id": [key[0]],
                        "n_buckets": [bin(bitmap).count("1")],
                        "n_obs": [n_obs]})


def streaming_cell_saturation(stream: DataFrame) -> DataFrame:
    """Keyed-state streaming aggregate over the image stream: for every
    cell, the occupancy of 63 phash buckets + total observations, state
    carried across micro-batches.  applyInPandasWithState is
    streaming-only in Spark 4 — for a one-shot batch equivalent use
    cell_saturation_batch (the parity twin below)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (stream.select("cell_id", "phash")
            .groupBy("cell_id")
            .applyInPandasWithState(
                _saturate, OUT_SCHEMA, STATE_SCHEMA, "update",
                GroupStateTimeout.NoTimeout))


def cell_saturation_batch(images: DataFrame) -> DataFrame:
    """Batch twin for parity: the same bitmap fold as one aggregate."""
    from pyspark.sql import functions as F

    # pmod: Spark's % keeps the dividend sign; Python's int % 63 (the
    # streaming kernel) is always non-negative
    bit = F.expr("shiftleft(1L, CAST(pmod(phash, 63) AS INT))")
    return (images.groupBy("cell_id")
            .agg(F.bit_count(F.bit_or(bit)).cast("int").alias("n_buckets"),
                 F.count("*").alias("n_obs")))


# ---------------------------------------------------------------------------
# streaming exact-dedup gate (the Group-B dedup family, incrementally)
# ---------------------------------------------------------------------------

DEDUP_OUT_SCHEMA = "text_hash string, doc_id long, n_seen long"
DEDUP_STATE_SCHEMA = "keeper_id long, n_seen long"


def _dedup_gate(key, pdfs, state):
    """Per content-hash state: (keeper_id, n_seen). Keeper is the
    RUNNING MIN doc_id — a commutative fold, so the settled row is
    identical under any micro-batch arrival order and equals the batch
    twin (exact_dedup's min-id keeper) exactly; an early batch may emit
    a larger keeper that a later batch revises (update mode re-emits).
    State is O(1) per distinct document — the only state size that
    survives 10^12 rows."""
    keeper, n_seen = state.get if state.exists else (None, 0)
    batch_min, batch_n = None, 0
    for pdf in pdfs:
        if not len(pdf):
            continue
        m = int(pdf["doc_id"].min())
        batch_min = m if batch_min is None else min(batch_min, m)
        batch_n += len(pdf)
    if batch_n == 0:
        return
    keeper = batch_min if keeper is None else min(keeper, batch_min)
    n_seen += batch_n
    state.update((int(keeper), int(n_seen)))
    yield pd.DataFrame({"text_hash": [key[0]], "doc_id": [int(keeper)],
                        "n_seen": [int(n_seen)]})


def streaming_exact_dedup(stream: DataFrame,
                          text_col: str = "text") -> DataFrame:
    """Streaming exact-dedup gate: documents keyed by md5(text); each
    micro-batch emits the hash's keeper id and the running copy count,
    so a downstream sink keeps rows where doc_id == keeper and drops
    duplicates — exact_dedup as data arrives instead of as a batch job.
    The incremental fold (running min, running count) is
    order-insensitive across batches, so the settled per-hash row
    equals the batch twin exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (stream.withColumn("text_hash", F.md5(F.col(text_col)))
            .groupBy("text_hash")
            .applyInPandasWithState(
                _dedup_gate, DEDUP_OUT_SCHEMA, DEDUP_STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))
