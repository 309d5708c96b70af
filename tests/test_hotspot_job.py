"""End-to-end drive of jobs/hotspot_job.py: the space-time surveillance
pipeline (bin -> per-day Gi* -> MK labels -> Theil-Sen -> snapshot)."""

import shutil

import pytest
from pyspark.sql import functions as F


def test_hotspot_job_end_to_end_and_resumable(spark, tmp_path):
    import jobs.hotspot_job as J

    out = str(tmp_path / "hotspots")
    rc = J.main(["--events", "/root/testdata/sf0.001/events.parquet",
                 "--out", out])
    assert rc == 0
    from data_cube_utilities_spark.sources.snapshots import SnapshotTable
    t = SnapshotTable(out)
    df = t.read(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"ix", "iy", "label", "mk_z", "last_z", "sen_slope"} <= cols
    labels = {r.label for r in df.select("label").distinct().collect()}
    assert labels <= {f"{s}_{tr}" for s in ("hot", "cold", "neutral")
                      for tr in ("intensifying", "waning", "static")}
    n_hist = len(t.history())
    # resumability: a second run skips the committed step (no new snapshot)
    rc2 = J.main(["--events", "/root/testdata/sf0.001/events.parquet",
                  "--out", out])
    assert rc2 == 0
    assert len(t.history()) == n_hist
