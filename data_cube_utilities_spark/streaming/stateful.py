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
    carried across micro-batches. Works on a batch DataFrame too (Spark
    runs the same grouped-map with empty initial state once)."""
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
