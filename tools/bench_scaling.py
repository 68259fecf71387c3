"""Two-parallelism scaling run (BASELINE.json north_rule: N vs 4N
executors): Spark standalone local-cluster with REAL separate executor
JVMs, 1x4 vs 4x4 executors on the same machine and input — only the
executor count varies.

Scaling is measured where compute dominates the Spark per-job floor: a
fixed-iteration textbook-mode PageRank on the sf=4 synthetic link graph
(4M vertices, 16.3M edges). The driver-facing bench.py (sf0.1, local mode)
numbers are recorded alongside. Writes BENCH/BASELINE.md + raw JSON.

Usage: python tools/bench_scaling.py [--sf 4.0] [--iters 12]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SCALE_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from pagerank_project_spark.config import PageRankConfig
from pagerank_project_spark.datagen import ensure_fixture
from pagerank_project_spark.operators.extract import extract_edges, vertices_from_files
from pagerank_project_spark.operators.pagerank import pagerank

sf = float(sys.argv[1]); nexec = int(sys.argv[2]); iters = int(sys.argv[3]); strategy = sys.argv[4]
cores_per = 4
tot = nexec * cores_per
# REAL separate executor JVMs (spark standalone local-cluster): the faithful
# sandbox stand-in for an N- vs 4N-executor cluster — per-executor GC and
# cross-JVM shuffle, unlike local[N] threads sharing one heap.
spark = (SparkSession.builder.master(f"local-cluster[{nexec},{cores_per},13312]")
         .appName(f"scale-{nexec}x{cores_per}")
         .config("spark.sql.shuffle.partitions", str(tot))
         .config("spark.executor.memory", "12g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.ui.enabled", "false")
         # executor-side python workers must import pagerank_project_spark
         # (the CSR path ships pandas-UDF closures); on a real cluster this
         # is the --py-files zip from tools/submit.sh
         .config("spark.executorEnv.PYTHONPATH", "/root/repo")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
fix = ensure_fixture(sf)
files = spark.read.parquet(f"{fix}/source_table/data")
edges = extract_edges(files, verify_sha=False).persist()
n_edges = edges.count()
verts = vertices_from_files(files).persist(); verts.count()
# standard (textbook) mode: in 'reference' mode the L2-normalized teleport
# vector (SURVEY.md §2 op-14 quirk) carries ~√n× the edge mass, so at n≥1M
# the dynamics converge in ~4 supersteps — too few to measure. epsilon=0
# → exactly `iters` supersteps.
cfg = PageRankConfig(mode="standard", epsilon=0.0, max_iterations=iters, strategy=strategy)
t0 = time.time()
res = pagerank(spark, edges, vertices=verts, cfg=cfg)
dt = time.time() - t0
steady = sorted(res.iter_secs[2:])  # first 2 supersteps carry codegen/shuffle warmup
med = steady[len(steady) // 2]
print(json.dumps({"executors": nexec, "cores_per_executor": cores_per, "sf": sf,
                  "strategy": strategy, "n_edges": n_edges,
                  "n_vertices": res.n_vertices, "iters": res.iterations, "wall_sec": round(dt, 2),
                  "setup_sec": res.setup_sec, "iter_secs": res.iter_secs,
                  "sec_per_iter": med,
                  "edges_per_sec_per_superstep": round(n_edges / med, 1)}))
"""


def run_scale(sf: float, nexec: int, iters: int, strategy: str, retries: int = 2) -> dict:
    last_err = ""
    for attempt in range(retries + 1):
        out = subprocess.run(
            [sys.executable, "-c", SCALE_SNIPPET, str(sf), str(nexec), str(iters), strategy],
            capture_output=True, text=True, cwd="/root/repo", timeout=5400,
        )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if lines:
            return json.loads(lines[-1])
        # local-cluster executor startup is occasionally flaky right after a
        # previous cluster was torn down — wait and retry
        last_err = out.stderr[-2000:]
        time.sleep(15)
    raise RuntimeError(f"scale run failed (nexec={nexec}) after {retries + 1} attempts: {last_err}")


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run([sys.executable, "bench.py"], env=env, capture_output=True,
                         text=True, cwd="/root/repo", timeout=3600)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"bench failed (cpus={cpus}): {out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--sf_dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    scale: dict[tuple, dict] = {}
    for strategy in ("relational", "csr"):
        for nexec in (1, 4):
            t0 = time.time()
            scale[(strategy, nexec)] = run_scale(args.sf, nexec, args.iters, strategy)
            r = scale[(strategy, nexec)]
            print(f"{strategy} {nexec}x4 executors: {r['sec_per_iter']}s/iter, "
                  f"{r['edges_per_sec_per_superstep']:,.0f} edges/s ({time.time() - t0:.0f}s total)")

    bench = {cpus: run_bench(cpus, args.sf_dir) for cpus in (8, 32)}
    print(f"bench.py sf_dir done")

    def eff(strategy):
        t1 = scale[(strategy, 1)]["edges_per_sec_per_superstep"]
        t4 = scale[(strategy, 4)]["edges_per_sec_per_superstep"]
        return t4 / (4 * t1)

    s8 = scale[("relational", 4)]
    b32 = bench[32]
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH — measured engine numbers (this sandbox)

## Scaling evidence (north_rule: N vs 4N executors)

Spark standalone ``local-cluster`` mode — REAL separate executor JVMs with
per-executor heaps and cross-JVM shuffle (the faithful single-machine
stand-in for a multi-executor cluster; plain local[N] threads share one
heap and GC, which caps thread-scaling regardless of engine design).
Same input (synthetic source-code link graph at sf={args.sf}:
{s8["n_vertices"]:,} vertices, {s8["n_edges"]:,} edges), same fixed
{args.iters}-superstep textbook-mode PageRank job; N=1 executor × 4 cores
vs 4N=4 executors × 4 cores, 12 GB each (16 task slots on a 32-core box —
headroom for master/worker/driver JVMs and GC threads, as on a real
cluster node). Throughput = median steady-state superstep (first two
supersteps excluded: codegen + shuffle warmup).

| strategy | 1×4 executors edges/s/superstep | 4×4 executors edges/s/superstep | efficiency (×4 ideal) |
|---|---|---|---|
| relational (join+groupBy-sum) | {scale[("relational", 1)]["edges_per_sec_per_superstep"]:,.0f} | {scale[("relational", 4)]["edges_per_sec_per_superstep"]:,.0f} | {eff("relational"):.2f} |
| CSR pandas-UDF (salted) | {scale[("csr", 1)]["edges_per_sec_per_superstep"]:,.0f} | {scale[("csr", 4)]["edges_per_sec_per_superstep"]:,.0f} | {eff("csr"):.2f} |

sec/iteration: relational {scale[("relational", 1)]["sec_per_iter"]}s @1×4 → {scale[("relational", 4)]["sec_per_iter"]}s @4×4;
CSR {scale[("csr", 1)]["sec_per_iter"]}s @1×4 → {scale[("csr", 4)]["sec_per_iter"]}s @4×4.

## Driver bench (bench.py, sf_dir={args.sf_dir})

| metric | local[8] | local[32] |
|---|---|---|
| suite wall | {bench[8]["value"]}s | {bench[32]["value"]}s |
| PageRank edges/s/superstep (relational) | {bench[8]["pagerank_edges_per_sec_per_superstep"]:,.0f} | {bench[32]["pagerank_edges_per_sec_per_superstep"]:,.0f} |
| PageRank edges/s/superstep (CSR) | {bench[8]["pagerank_csr_edges_per_sec_per_superstep"]:,.0f} | {bench[32]["pagerank_csr_edges_per_sec_per_superstep"]:,.0f} |
| iterations to L1 delta < 1e-6 | {bench[8]["pagerank_iterations"]} | {bench[32]["pagerank_iterations"]} |

Per-query seconds (local[32]): {json.dumps(b32["queries"])}

## Reference comparison

The reference publishes no throughput numbers; its derived single-core
ceiling is 10^7–10^8 edge-traversals/s (BASELINE.md: 1.6M edges × 19 iters
in ≲2 s, torch.sparse float32, README.md:93-95 + :535-553). At sf=0.1 a
superstep moves ~{b32["n_edges"]:,} edges — below Spark's ~0.2 s/job
orchestration floor, so sf0.1 throughput is floor-bound; the sf={args.sf}
scaling table above is the compute-bound regime. Cost model per superstep:
`max(job_floor, edges/scan_bw + |V|/shuffle_bw)`; edges are hash
co-partitioned once and never reshuffled, only the |V|-sized rank vector
moves, and the scatter is map-side combined, so the second term scales with
cores/executors.

Raw JSON: BENCH/scaling.json, BENCH/local8.json, BENCH/local32.json.
""")
    with open("/root/repo/BENCH/scaling.json", "w") as f:
        json.dump({f"{k[0]}_{k[1]}": v for k, v in scale.items()}, f, indent=2)
    with open("/root/repo/BENCH/local8.json", "w") as f:
        json.dump(bench[8], f, indent=2)
    with open("/root/repo/BENCH/local32.json", "w") as f:
        json.dump(bench[32], f, indent=2)
    print(f"efficiency relational={eff('relational'):.2f} csr={eff('csr'):.2f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
