"""Two-cluster-size scaling with REAL executor processes (north_rule).

`local[N]` shares one JVM heap, GC, and python-worker pool across all
cores — a pessimistic proxy for executor scaling.  Spark's
`local-cluster[W, C, M]` test master launches W genuine executor JVMs with
C cores each on this box, so the N → 4N criterion can be evidenced as
1 executor → 4 executors at FIXED cores-per-executor (8), total 8 → 32
cores — all within this VM's 32 physical cores (no SMT).

Workloads are identical to tools/scaling_bench.py (fused descriptor
extract; sessionize+as-of over 18 M rows).  Steady state: 2 runs, 2nd
reported.  Efficiency = (T_1exec / T_4exec) / 4.

Usage: python tools/scaling_cluster.py          → BENCH/scaling_cluster.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CACHE = os.path.join(REPO, ".cache")

from tools.scaling_bench import (  # noqa: E402
    AMPLIFY_B, DESCS, N_DOCS_A, _amplified, _prepare)


def run_one(workers: int, cores: int = 8, mem_mb: int = 6144) -> dict:
    from pyspark.sql import SparkSession

    from ifeatureomega_cli_spark.functions.extract import extract_many
    from ifeatureomega_cli_spark.operators.asof import asof_join
    from ifeatureomega_cli_spark.operators.sessionize import session_stats

    spark = (
        SparkSession.builder
        .master(f"local-cluster[{workers},{cores},{mem_mb}]")
        .appName(f"scaling-cluster-{workers}x{cores}")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.executor.memory", f"{mem_mb - 1024}m")
        .config("spark.sql.files.maxPartitionBytes", "2m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        # executor JVMs spawn their own python workers — pin them to the
        # driver's interpreter (and its numpy build) or kernels silently run
        # on whatever `python3` is on PATH
        .config("spark.pyspark.python", sys.executable)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    seq_path, rev_path, req_path = _prepare(spark)

    seqs = spark.read.parquet(seq_path)
    out_cols = [d.split(":")[1].replace(" ", "_") for d in DESCS]
    t_desc = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = extract_many(seqs, DESCS)
        out.select("doc_id", *out_cols).write.mode("overwrite").format("noop").save()
        t_desc = time.perf_counter() - t0

    from pyspark.sql import functions as F  # noqa: F401

    revs = _amplified(
        spark.read.parquet(rev_path).select("doc_id", "ts", "n_tok"), AMPLIFY_B
    ).repartition(64).cache()
    reqs = _amplified(spark.read.parquet(req_path), AMPLIFY_B).repartition(64).cache()
    n_rev = revs.count()
    n_req = reqs.count()
    t_temporal = None
    for _ in range(2):
        t0 = time.perf_counter()
        session_stats(revs, 3600, on="doc_id", ts="ts", value="n_tok").count()
        asof_join(reqs, revs, on="doc_id", ts="ts", value_cols=["n_tok"]).count()
        t_temporal = time.perf_counter() - t0
    spark.stop()
    n_vec = N_DOCS_A * len(DESCS)
    return {
        "workers": workers, "cores_per_worker": cores,
        "total_cores": workers * cores,
        "desc_seconds": round(t_desc, 3),
        "desc_vectors_per_sec": round(n_vec / t_desc, 1),
        "temporal_seconds": round(t_temporal, 3),
        "temporal_rows": n_rev + n_req,
        "temporal_rows_per_sec": round((n_rev + n_req) / t_temporal, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=0, help="workers (subprocess mode)")
    args = ap.parse_args()
    if args.run:
        print(json.dumps(run_one(args.run)))
        return

    results = {}
    for workers in (1, 4):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(workers)],
            capture_output=True, text=True, cwd=REPO,
        )
        if out.returncode != 0:
            print(out.stderr[-2000:])
            raise SystemExit(1)
        results[workers] = json.loads(out.stdout.strip().splitlines()[-1])
        print(results[workers])

    report = {
        "protocol": "local-cluster 1x8 -> 4x8 executor JVMs (8 -> 32 cores, "
                    "32 physical cores, no SMT)",
        "runs": {str(k): v for k, v in results.items()},
        "eff_descriptors": round(
            results[1]["desc_seconds"] / results[4]["desc_seconds"] / 4, 3),
        "eff_temporal": round(
            results[1]["temporal_seconds"] / results[4]["temporal_seconds"] / 4, 3),
    }
    print(json.dumps(report))
    # single-run output goes to its own file: BENCH/scaling_cluster.json is
    # the CONSOLIDATED multi-run report (medians + controls) and must not
    # be clobbered by one raw run
    with open(os.path.join(REPO, "BENCH",
                           "scaling_cluster_last_run.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
