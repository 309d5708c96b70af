"""N vs 4N EXECUTOR scaling on a real multi-executor Spark standalone
cluster running on this host — the literal north-rule deployment shape
(spark-submit --py-files onto a cluster at two executor counts).

Topology: 1 master + 4 workers (2 cores, 6g each), each executor its own
JVM with its own Python worker pool; the app is shipped as
dist/geocube.zip via addPyFile (the --py-files mechanism). Executor count
is selected with spark.cores.max: 2 -> 1 executor (N), 8 -> 4 executors
(4N). Same interleaving/min-of-reps/cpu-seconds methodology as
tools/bench_scaling.py (see BENCH/BASELINE.md for the host artifacts that
make it necessary).

Prereq: cluster started via tools/cluster_up.sh. Writes BENCH/CLUSTER.md.
Usage: python tools/bench_cluster.py [outer_reps]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "5000000"))
TILE_PX = int(os.environ.get("SPARK_GRAFT_BENCH_TILEPX", "8"))
IMG_DIR = f"/tmp/geocube_bench/images_{N_IMAGES}"
MASTER = os.environ.get("SPARK_GRAFT_MASTER", "spark://127.0.0.1:7077")
EXEC_CORES = 2
SMALL_EXECUTORS = 1
LARGE_EXECUTORS = 4
COOLDOWN_S = int(os.environ.get("SPARK_GRAFT_SCALE_COOLDOWN", "15"))
INNER_REPS = int(os.environ.get("SPARK_GRAFT_SCALE_INNER", "2"))

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_BENCH_IMGDIR"] = {img_dir!r}
os.environ["SPARK_GRAFT_BENCH_IMAGES"] = str({n_images})
os.environ["SPARK_GRAFT_BENCH_TILEPX"] = str({tile_px})
from pyspark.sql import SparkSession
import bench

def busy_cpu_s():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6] + vals[7]
    return busy / os.sysconf("SC_CLK_TCK")

spark = (SparkSession.builder.master({master!r})
    .appName("geocube-cluster-scaling")
    .config("spark.executor.cores", "{exec_cores}")
    .config("spark.executor.memory", "5g")
    .config("spark.cores.max", "{cores_max}")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    .config("spark.sql.files.maxPartitionBytes", "36m")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile(os.path.join({repo!r}, "dist", "geocube.zip"))
out = bench.image_pipeline_full(spark)
bench._noop(out)     # warm-up
time.sleep({cooldown})
walls, cpus = [], []
for _ in range({inner}):
    c0 = busy_cpu_s(); t0 = time.time()
    bench._noop(out)
    walls.append(time.time() - t0)
    cpus.append(busy_cpu_s() - c0)
    time.sleep(5)
i = walls.index(min(walls))
n_out = out.count()
print("RESULT " + json.dumps({{"elapsed": walls[i], "cpu_s": cpus[i],
                               "all_walls": walls, "out_rows": n_out}}))
"""


def run_once(n_executors: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, img_dir=IMG_DIR, n_images=N_IMAGES,
                              tile_px=TILE_PX, master=MASTER,
                              exec_cores=EXEC_CORES,
                              cores_max=n_executors * EXEC_CORES,
                              cooldown=COOLDOWN_S, inner=INNER_REPS)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=2400,
                       env={**os.environ, "PYTHONPATH": REPO})
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run failed (executors={n_executors}):\n"
                       f"{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    subprocess.run([sys.executable, os.path.join(REPO, "tools",
                                                 "make_pyfiles.py")],
                   check=True)
    times = {SMALL_EXECUTORS: [], LARGE_EXECUTORS: []}
    cpu = {SMALL_EXECUTORS: [], LARGE_EXECUTORS: []}
    out_rows = {}
    for r in range(reps):
        for n in (SMALL_EXECUTORS, LARGE_EXECUTORS):
            res = run_once(n)
            times[n].append(res["elapsed"])
            cpu[n].append(res["cpu_s"])
            out_rows[n] = res["out_rows"]
            print(f"{n} executor(s) rep{r}: wall={res['elapsed']:.2f}s "
                  f"cpu={res['cpu_s']:.1f}core-s "
                  f"({N_IMAGES / res['elapsed']:.0f} rows/s)", flush=True)
            time.sleep(COOLDOWN_S)

    stats = {}
    for n in (SMALL_EXECUTORS, LARGE_EXECUTORS):
        best = min(times[n])
        stats[n] = dict(times=[round(t, 2) for t in times[n]],
                        median=round(statistics.median(times[n]), 2),
                        best=round(best, 2),
                        cpu_best=round(min(cpu[n]), 1),
                        rows_per_sec=round(N_IMAGES / best, 1),
                        tiles_per_sec=round(out_rows[n] / best, 1))
    ratio = LARGE_EXECUTORS / SMALL_EXECUTORS
    # min-across-reps: the phase-robust estimator on this host (the VM's
    # clock oscillates ~1.6x on multi-minute periods — identical work costs
    # 107-224 cpu-s depending on phase; see BENCH/BASELINE.md). Medians mix
    # phases and are reported alongside for transparency.
    eff_best = (stats[SMALL_EXECUTORS]["best"]
                / stats[LARGE_EXECUTORS]["best"]) / ratio
    eff_med = (stats[SMALL_EXECUTORS]["median"]
               / stats[LARGE_EXECUTORS]["median"]) / ratio
    cs = stats[SMALL_EXECUTORS]["cpu_best"]
    cl = stats[LARGE_EXECUTORS]["cpu_best"]
    eff_cpu = cs / cl if cl else float("nan")
    print(f"\nwall efficiency (T_N/T_4N)/{ratio:.0f}: "
          f"best={eff_best:.3f} median={eff_med:.3f}")
    print(f"busy cpu-s best N={cs} 4N={cl} -> cpu efficiency {eff_cpu:.3f}")
    print("(BENCH/CLUSTER.md is maintained by hand with the full rep "
          "history and estimator discussion — append these numbers there)")
    return

if __name__ == "__main__":
    main()
