"""Iceberg-style table layer: snapshot-committed partitioned Parquet with
per-partition lineage + metrics, atomic pointer flips, and pipeline resume.

No Iceberg runtime jars exist in this environment (SURVEY.md 7.0), so the
semantics are emulated on plain Parquet + JSON:

  <table>/
    data/v00003/<partition dirs>/part-*.parquet   one dir per commit
    snapshots/v00003.json                          manifest (see below)
    VERSION                                        atomic pointer (tmp+rename)

Manifest: {version, parent, operation (overwrite|append), partition_cols,
partitions: [{values, row_count, metrics{col: {min,max}}}], lineage
(free-form provenance dict: inputs, step name, parameters), created_utc}.

Guarantees:
- readers only ever see fully-committed data (pointer flips after the
  parquet write completes; half-written dirs are invisible);
- resume: a pipeline step that already committed (same step key in lineage)
  is skipped — `latest_step()` / `has_step()`;
- per-partition row counts + column min/max are computed with ONE grouped
  aggregate over the written data (no per-file driver loops), so manifests
  stay cheap at 10^5 partitions;
- time travel: `read(spark, version=N)` reconstructs any snapshot.

Swap-in path: if real Iceberg jars appear, `commit` maps to
DataFrame.writeTo(...).append()/overwritePartitions() and the manifest maps
to Iceberg's own snapshot summary — the operator API here stays unchanged.

Reference parity: this layer replaces the reference's ad-hoc chunk
checkpointing (`intermediate_product` accumulation, dc_mosaic.py:117-185,
and the chunked workflow of dc_chunker.py / SURVEY.md 3.2) with atomic,
inspectable commits.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, path: str):
        self.path = path
        self.snap_dir = os.path.join(path, "snapshots")
        self.data_dir = os.path.join(path, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- pointer ----------------------------------------------------------
    @property
    def _version_file(self) -> str:
        return os.path.join(self.path, "VERSION")

    def current_version(self) -> int | None:
        try:
            with open(self._version_file) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def _flip_pointer(self, version: int) -> None:
        tmp = self._version_file + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._version_file)  # atomic on POSIX

    # -- manifests ---------------------------------------------------------
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.snap_dir, f"v{version:05d}.json")

    def manifest(self, version: int | None = None) -> dict | None:
        v = self.current_version() if version is None else version
        if v is None:
            return None
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        out = []
        v = self.current_version()
        while v is not None:
            m = self.manifest(v)
            out.append(m)
            v = m.get("parent")
        return out

    def all_versions(self) -> list[int]:
        """Every committed version on disk, including ones orphaned by a
        rollback (not reachable from the current head)."""
        out = []
        for f in os.listdir(self.snap_dir):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    # -- commit ------------------------------------------------------------
    def commit(self, df: DataFrame, partition_cols: Sequence[str] = (),
               operation: str = "overwrite",
               metrics_cols: Sequence[str] = (),
               lineage: dict | None = None) -> int:
        """Write df as the next snapshot; returns the new version."""
        assert operation in ("overwrite", "append")
        parent = self.current_version()
        # next version = max EXISTING version + 1 (not parent + 1): after a
        # rollback the head is older than orphaned versions, and a commit
        # must branch without clobbering their manifests/data
        existing = self.all_versions()
        version = 0 if not existing else existing[-1] + 1
        dir_name = f"v{version:05d}"
        out_dir = os.path.join(self.data_dir, dir_name)

        writer = df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(out_dir)

        # per-partition stats with ONE aggregate over what was written
        spark = df.sparkSession
        written = spark.read.parquet(out_dir)
        aggs = [F.count("*").alias("__rows")]
        for c in metrics_cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        if partition_cols:
            stats = written.groupBy(*partition_cols).agg(*aggs).collect()
        else:
            stats = written.agg(*aggs).collect()
        partitions = []
        for r in stats:
            d = r.asDict()
            entry = {
                "values": {c: _json_safe(d[c]) for c in partition_cols},
                "row_count": d["__rows"],
                "metrics": {c: {"min": _json_safe(d[f"__min_{c}"]),
                                "max": _json_safe(d[f"__max_{c}"])}
                            for c in metrics_cols},
            }
            partitions.append(entry)

        manifest = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "data_dir": dir_name,
            "partition_cols": list(partition_cols),
            "partitions": partitions,
            "total_rows": int(sum(p["row_count"] for p in partitions)),
            "lineage": lineage or {},
            "created_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        with open(self._manifest_path(version), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        self._flip_pointer(version)
        return version

    # -- read ---------------------------------------------------------------
    def _live_dirs(self, version: int) -> list[str]:
        """Data dirs visible at `version`: walk parents until an overwrite."""
        dirs = []
        v: int | None = version
        while v is not None:
            m = self.manifest(v)
            dirs.append(os.path.join(self.data_dir, m["data_dir"]))
            if m["operation"] == "overwrite":
                break
            v = m.get("parent")
        return list(reversed(dirs))

    def read(self, spark: SparkSession, version: int | None = None,
             where: dict | None = None) -> DataFrame:
        """Read a snapshot.  `where={col: (lo, hi)}` (closed intervals)
        prunes whole commit dirs from the scan using MANIFEST metrics
        before any file is listed — Iceberg's manifest-level skipping at
        dir granularity — and applies the same predicate row-level, so
        the result is identical with or without pruning (partition-dir
        pruning within a surviving commit dir is Catalyst's, via the
        pushed filter)."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed snapshot at {self.path}")
        dirs = (self._live_dirs(v) if not where
                else self.pruned_dirs(v, where))
        if not dirs:
            dirs = self._live_dirs(v)[:1]   # schema-only; predicate empties it
        # one read per commit dir (each has its own partition-discovery
        # root), unioned; Catalyst still prunes partitions within each
        out = spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            out = out.unionByName(spark.read.parquet(d), allowMissingColumns=True)
        for c, (lo, hi) in (where or {}).items():
            out = out.filter((F.col(c) >= lo) & (F.col(c) <= hi))
        return out

    def pruned_dirs(self, version: int, where: dict) -> list[str]:
        """Commit dirs at `version` whose manifest says they MIGHT hold
        rows in `where` ({col: (lo, hi)}).  A dir survives if ANY of its
        partitions overlaps every bound; bounds on columns without
        recorded numeric metrics (or non-numeric mins) never prune —
        pruning is an optimization, never a filter."""
        def overlaps(entry: dict) -> bool:
            for c, (lo, hi) in where.items():
                stats = entry.get("metrics", {}).get(c)
                vals = entry.get("values", {})
                if c in vals and isinstance(vals[c], (int, float)):
                    if not (lo <= vals[c] <= hi):
                        return False
                    continue
                if not stats:
                    continue
                mn, mx = stats.get("min"), stats.get("max")
                if not (isinstance(mn, (int, float))
                        and isinstance(mx, (int, float))):
                    continue
                if mx < lo or mn > hi:
                    return False
            return True

        out = []
        v: int | None = version
        chain = []
        while v is not None:
            m = self.manifest(v)
            chain.append(m)
            if m["operation"] == "overwrite":
                break
            v = m.get("parent")
        for m in reversed(chain):
            if any(overlaps(p) for p in m["partitions"]) or not m["partitions"]:
                out.append(os.path.join(self.data_dir, m["data_dir"]))
        return out

    def read_changes(self, spark: SparkSession, from_version: int,
                     to_version: int | None = None) -> DataFrame:
        """Iceberg-style INCREMENTAL APPEND SCAN: exactly the rows added
        AFTER `from_version`, up to and including `to_version` (default:
        current head).  Only valid across an append-only range — an
        intervening overwrite rewrote history, so (like Iceberg's
        appends-between scan) the call refuses rather than guessing."""
        to_v = self.current_version() if to_version is None else to_version
        if to_v is None or from_version > to_v:
            raise ValueError(f"bad incremental range ({from_version}, {to_v})")
        if from_version == to_v:
            return self.read(spark, to_v).limit(0)
        dirs = []
        v: int | None = to_v
        while v is not None and v != from_version:
            m = self.manifest(v)
            if m["operation"] == "overwrite":
                raise ValueError(
                    f"v{v} is an overwrite inside the incremental range "
                    f"({from_version}, {to_v}]: appends-between undefined")
            dirs.append(os.path.join(self.data_dir, m["data_dir"]))
            v = m.get("parent")
        if v != from_version:
            raise ValueError(
                f"v{from_version} is not an ancestor of v{to_v}")
        out = spark.read.parquet(dirs[-1])
        for d in reversed(dirs[:-1]):
            out = out.unionByName(spark.read.parquet(d), allowMissingColumns=True)
        return out

    # -- maintenance --------------------------------------------------------
    def rollback(self, version: int) -> None:
        """Atomic pointer flip back to an earlier committed snapshot.
        Later versions become orphans (still on disk, readable by
        explicit version until expire_snapshots); the next commit
        branches from here under a fresh version number."""
        if not os.path.exists(self._manifest_path(version)):
            raise FileNotFoundError(f"no snapshot v{version}")
        self._flip_pointer(version)

    def expire_snapshots(self, keep_last: int = 1) -> list[int]:
        """Iceberg-style expiry: keep the newest `keep_last` snapshots of
        the CURRENT head's ancestry (the head always survives), delete
        every other manifest and any data dir no kept snapshot reaches.
        Returns the expired version numbers."""
        import shutil

        head = self.current_version()
        if head is None:
            return []
        ancestry = [m["version"] for m in self.history()]
        kept = set(ancestry[:max(1, keep_last)])
        # a kept append snapshot is reconstructed by walking its parent
        # chain to the base overwrite: every manifest (and dir) on that
        # chain must survive too
        live: set[str] = set()
        for v in list(kept):
            live.update(self._live_dirs(v))
            p: int | None = v
            while p is not None:
                m = self.manifest(p)
                kept.add(p)
                if m["operation"] == "overwrite":
                    break
                p = m.get("parent")
        expired = []
        for v in self.all_versions():
            if v in kept:
                continue
            d = os.path.join(self.data_dir, self.manifest(v)["data_dir"])
            if d not in live and os.path.exists(d):
                shutil.rmtree(d)
            os.remove(self._manifest_path(v))
            expired.append(v)
        return expired

    # -- resume -------------------------------------------------------------
    def has_step(self, step: str) -> bool:
        """True if any committed snapshot's lineage carries this step key —
        the pipeline-resume predicate."""
        return any(m.get("lineage", {}).get("step") == step
                   for m in self.history())

    def latest_step(self) -> str | None:
        v = self.current_version()
        if v is None:
            return None
        return self.manifest(v).get("lineage", {}).get("step")


def _json_safe(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def run_resumable(table: SnapshotTable, steps: list[tuple[str, callable]],
                  partition_cols: Sequence[str] = (),
                  metrics_cols: Sequence[str] = ()) -> list[str]:
    """Execute a pipeline of (step_name, fn() -> DataFrame) with snapshot
    checkpoints; steps whose snapshot already exists are skipped. Returns
    the list of steps actually executed this run."""
    ran = []
    for step, fn in steps:
        if table.has_step(step):
            continue
        df = fn()
        table.commit(df, partition_cols=partition_cols,
                     metrics_cols=metrics_cols,
                     operation="overwrite",
                     lineage={"step": step})
        ran.append(step)
    return ran
