"""Snapshot table layer: atomic commits, per-partition lineage+metrics,
append/overwrite chains, time travel, and pipeline resume."""

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_cube_utilities_spark.sources.snapshots import SnapshotTable, run_resumable


@pytest.fixture()
def table(tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def _df(spark, lo, hi, part):
    pdf = pd.DataFrame({"id": range(lo, hi), "part": part,
                        "v": [float(i) for i in range(lo, hi)]})
    return spark.createDataFrame(pdf)


def test_commit_read_roundtrip(spark, table):
    v = table.commit(_df(spark, 0, 10, "a"), partition_cols=["part"],
                     metrics_cols=["v"], lineage={"step": "load"})
    assert v == 0 and table.current_version() == 0
    back = table.read(spark)
    assert back.count() == 10
    m = table.manifest()
    assert m["total_rows"] == 10
    assert m["partitions"][0]["values"] == {"part": "a"}
    assert m["partitions"][0]["metrics"]["v"] == {"min": 0.0, "max": 9.0}
    assert m["lineage"]["step"] == "load"


def test_append_chain_and_time_travel(spark, table):
    table.commit(_df(spark, 0, 10, "a"), ["part"], operation="overwrite")
    table.commit(_df(spark, 10, 15, "b"), ["part"], operation="append")
    assert table.read(spark).count() == 15
    assert table.read(spark, version=0).count() == 10  # time travel
    # overwrite resets visibility
    table.commit(_df(spark, 0, 3, "c"), ["part"], operation="overwrite")
    assert table.read(spark).count() == 3
    assert [m["version"] for m in table.history()] == [2, 1, 0]


def test_pointer_is_atomic_and_late(spark, table, tmp_path):
    # before any commit: no VERSION file, read raises
    assert table.current_version() is None
    with pytest.raises(FileNotFoundError):
        table.read(spark)
    table.commit(_df(spark, 0, 5, "a"), ["part"])
    # a stale tmp pointer must never shadow the committed one
    assert not os.path.exists(table._version_file + ".tmp")


def test_resume_skips_done_steps(spark, table):
    calls = []

    def mk(name, lo, hi):
        def fn():
            calls.append(name)
            return _df(spark, lo, hi, name)
        return (name, fn)

    steps = [mk("s1", 0, 5), mk("s2", 5, 9)]
    ran = run_resumable(table, steps, partition_cols=["part"])
    assert ran == ["s1", "s2"] and calls == ["s1", "s2"]
    # second invocation: everything checkpointed, nothing re-runs
    calls.clear()
    ran2 = run_resumable(table, steps, partition_cols=["part"])
    assert ran2 == [] and calls == []
    # new step resumes from where the pipeline stopped
    steps.append(mk("s3", 9, 12))
    ran3 = run_resumable(table, steps, partition_cols=["part"])
    assert ran3 == ["s3"] and calls == ["s3"]
    assert table.latest_step() == "s3"


def test_manifest_json_is_valid(spark, table):
    table.commit(_df(spark, 0, 4, "a"), ["part"], metrics_cols=["v"])
    with open(table._manifest_path(0)) as f:
        m = json.load(f)
    assert set(m) >= {"version", "parent", "operation", "partitions",
                      "lineage", "created_utc", "total_rows"}
