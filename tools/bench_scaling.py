"""Scaling-efficiency evidence for the north rule (BASELINE.json):
same physical input, same plan, two parallelism levels (local[8] vs
local[32] standing in for N vs 4N executors), cold JVM per run, >=3 reps,
median; efficiency = (T_small / T_large) / (cores_large / cores_small).

Measured stage only: scan -> PIP spatial join -> geocell tile assignment ->
composite agg -> write (noop). Table generation is untimed setup.

Writes BENCH/BASELINE.md. Usage: python tools/bench_scaling.py [reps]
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

RUN_SNIPPET = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["SPARK_GRAFT_BENCH_IMGDIR"] = {img_dir!r}
os.environ["SPARK_GRAFT_BENCH_IMAGES"] = str({n_images})
os.environ["SPARK_GRAFT_BENCH_TILEPX"] = str({tile_px})
from data_cube_utilities_spark.session import get_spark
import bench

spark = get_spark("scaling", cores={cores}, shuffle_partitions=max({cores}, 16))
bench.ensure_images(spark)
out = bench.image_pipeline(spark)
# two warm-up runs (JIT, Python worker pool, page cache) then the measured run
bench._noop(out)
bench._noop(out)
t0 = time.time()
bench._noop(out)
elapsed = time.time() - t0
n_out = out.count()
print("RESULT " + json.dumps({{"elapsed": elapsed, "out_rows": n_out}}))
"""


def run_once(cores: int) -> dict:
    code = RUN_SNIPPET.format(repo=REPO, cores=cores, img_dir=IMG_DIR,
                              n_images=N_IMAGES, tile_px=TILE_PX)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run failed (cores={cores}):\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    results = {}
    for cores in (8, 32):
        times, out_rows = [], None
        for r in range(reps):
            res = run_once(cores)
            times.append(res["elapsed"])
            out_rows = res["out_rows"]
            print(f"local[{cores}] rep{r}: {res['elapsed']:.2f}s "
                  f"({N_IMAGES / res['elapsed']:.0f} rows/s)")
        med = statistics.median(times)
        results[cores] = dict(times=[round(t, 3) for t in times],
                              median=round(med, 3),
                              rows_per_sec=round(N_IMAGES / med, 1),
                              tiles_per_sec=round(out_rows / med, 1),
                              out_rows=out_rows)
    t8, t32 = results[8]["median"], results[32]["median"]
    eff = (t8 / t32) / (32 / 8)
    print(f"\nefficiency (T8/T32)/4 = {eff:.3f}")

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling-efficiency evidence (north rule)

Protocol (BASELINE.md): same physical input files, same query plan, cold JVM
per run, {reps} repetitions, median reported. Measured stage only
(scan -> PIP spatial join -> geocell tile assignment -> composite agg ->
noop write); a warm-up execution of the identical plan precedes the timed
one inside each JVM so JIT/worker-pool startup is excluded. The sandbox has
no multi-node cluster, so N vs 4N **executors** is evidenced as
local[8] vs local[32] **cores** on identical input (per driver instructions).

Input: deterministic synthesized image+caption table, {N_IMAGES} rows
(tile {TILE_PX}x{TILE_PX}x7 uint16, skewed hotspot/coastline footprints), parquet at
{IMG_DIR} (bytes column pruned by the scan — the measured stage reads only
footprint/metadata columns).

| parallelism | reps (s) | median (s) | input rows/s | output tiles/s |
|---|---|---|---|---|
| local[8]  | {results[8]['times']} | {t8} | {results[8]['rows_per_sec']} | {results[8]['tiles_per_sec']} |
| local[32] | {results[32]['times']} | {t32} | {results[32]['rows_per_sec']} | {results[32]['tiles_per_sec']} |

Output tile groups: {results[8]['out_rows']}

**Scaling efficiency (T_8 / T_32) / (32/8) = {eff:.3f}** — pass threshold >= 0.8.
""")
    print(f"wrote BENCH/BASELINE.md (efficiency {eff:.3f})")


if __name__ == "__main__":
    main()
