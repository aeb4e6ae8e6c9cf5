"""Per-query isolation harness for the optimization round (guide §1).

Times individual declared queries with the SAME methodology as the frozen
bench.py (`.count()`, median of N), plus a noop-sink variant (§1.4) that
computes every column, and dumps `.explain("formatted")` to
plans/<tag_dir>/<query>_<tag>.txt so plan claims are checkable offline.

Usage:
  python bench_extra.py --queries ngram_jaccard,descriptors_fused \
      --sf-dir /root/testdata/sf1.0 --tag before [--runs 3] [--no-noop]

`descriptors_fused` here is the same fused extract_many pass bench.py
times (8 descriptors over the cached synthetic token table).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, ".cache")

DESCS = ["protein:AAC", "protein:DPC type 1", "protein:CKSAAP type 1",
         "protein:GAAC", "protein:CTDC", "protein:CTDT", "protein:CTDD",
         "protein:PAAC"]


def _loadavg() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def fmt_plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def build_query_fns(spark, sf_dir):
    """Name → lazy DataFrame builder, mirroring bench.py's query set."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from ifeatureomega_cli_spark.functions.extract import extract_many
    from ifeatureomega_cli_spark.operators.dedup import (
        minhash_dedup as _mh, simhash_dup_pairs as _sh)

    qs = dict(entry.queries())

    def _docs_at(s, d):
        return s.read.parquet(os.path.join(d, "documents.parquet"))

    qs["minhash_dedup"] = lambda s, d: _mh(
        _docs_at(s, d), threshold=0.8, bands=8).select(
        F.col("id_a"), F.col("id_b"), F.round("est_jaccard", 6))
    qs["simhash_pairs"] = lambda s, d: _sh(_docs_at(s, d), max_hamming=8)

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_docs = max(int(1_000_000 * sf), 2_000)

    def _descriptors_fused(s, d):
        seqs = s.read.parquet(os.path.join(CACHE, f"seqs_{n_docs}"))
        out_cols = [x.split(":")[1].replace(" ", "_") for x in DESCS]
        return extract_many(seqs, DESCS).select("doc_id", *out_cols)

    qs["descriptors_fused"] = _descriptors_fused
    return qs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--plan-dir", default=os.path.join(REPO, "plans", "r09"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--no-noop", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from ifeatureomega_cli_spark.session import get_spark

    spark = get_spark(app_name="ifos-bench-extra",
                      master=f"local[{args.cpus}]",
                      shuffle_partitions=max(args.cpus, 8),
                      extra_conf={"spark.sql.files.maxPartitionBytes": "2m",
                                  "spark.sql.files.openCostInBytes": "1m",
                                  "spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = build_query_fns(spark, args.sf_dir)
    os.makedirs(args.plan_dir, exist_ok=True)

    results = {}
    for name in args.queries.split(","):
        name = name.strip()
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"{name} [{args.tag}] warm")
        fn(spark, args.sf_dir).count()  # warm (file cache, python workers)
        runs, noops = [], []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(
                f"{name} [{args.tag}] count #{i}")
            la0 = _loadavg()
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            runs.append(round(time.perf_counter() - t0, 3))
        if not args.no_noop:
            for i in range(args.runs):
                spark.sparkContext.setJobDescription(
                    f"{name} [{args.tag}] noop #{i}")
                t0 = time.perf_counter()
                (fn(spark, args.sf_dir).write.format("noop")
                 .mode("overwrite").save())
                noops.append(round(time.perf_counter() - t0, 3))
        if not args.no_plan:
            plan = fmt_plan(spark, fn(spark, args.sf_dir))
            with open(os.path.join(
                    args.plan_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        results[name] = {
            "count_median": round(statistics.median(runs), 3),
            "count_runs": runs,
            "noop_median": round(statistics.median(noops), 3) if noops else None,
            "noop_runs": noops,
            "load": _loadavg(),
        }
        print(name, json.dumps(results[name]))
    print("SUMMARY " + json.dumps(
        {k: v["count_median"] for k, v in results.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
