"""Benchmark harness — prints ONE JSON line with per-query seconds.

Usage: python bench.py            (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Covers both engine pillars:
* descriptor throughput: a fused multi-descriptor extract over a synthetic
  tokenized table sized to the scale factor (the primary metric —
  descriptor-vectors/sec — is also reported);
* relational/temporal/pipeline queries from __spark_entry__ at sf_dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")

# descriptors fused into the throughput pass — mix of archetypes
DESCS = ["protein:AAC", "protein:DPC type 1", "protein:CKSAAP type 1",
         "protein:GAAC", "protein:CTDC", "protein:CTDT", "protein:CTDD",
         "protein:PAAC"]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _seq_table(spark, n_docs: int):
    """Deterministic synthetic tokens table, cached as parquet per size."""
    path = os.path.join(CACHE, f"seqs_{n_docs}")
    if not os.path.isdir(path):
        from ifeatureomega_cli_spark.data.synth import sequences

        sequences(spark, n_docs, partitions=max(CPUS, 8)).write.mode(
            "overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    from ifeatureomega_cli_spark.functions.extract import extract_many
    from ifeatureomega_cli_spark.session import get_spark

    import __spark_entry__ as entry

    sf = _sf_of(SF_DIR)
    n_docs = max(int(1_000_000 * sf), 2_000)

    spark = get_spark(app_name="ifos-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={"spark.sql.files.maxPartitionBytes": "4m",
                                  "spark.sql.files.openCostInBytes": "1m"})
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # -- descriptor throughput (steady state: 2 runs, report 2nd) -------
    seqs = _seq_table(spark, n_docs)
    seqs.count()  # warm the file cache / JVM
    out_cols = [d.split(":")[1].replace(" ", "_") for d in DESCS]
    t_desc = None
    for _ in range(2):
        t0 = time.perf_counter()
        out = extract_many(seqs, DESCS)
        out.select("doc_id", *out_cols).write.mode("overwrite").format("noop").save()
        t_desc = time.perf_counter() - t0
    timings["descriptors_fused"] = round(t_desc, 3)
    vectors = n_docs * len(DESCS)

    # -- relational / pipeline queries ---------------------------------
    qs = entry.queries()
    bench_queries = [
        "asof_join", "ffill", "lag_lead", "sessionize", "session_stats",
        "topk_per_group", "rolling_agg", "hourly_rollup",
        "pricing_summary", "top_customers", "dedup_exact",
        "text_quality", "token_count", "langid", "ngram_jaccard",
        "embedding_topk", "embedding_dup_exact", "minhash_dedup",
        "simhash_pairs", "fingerprint",
        "char_unigram",
    ]
    for name in bench_queries:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
        "descriptor_vectors": vectors,
        "descriptor_vectors_per_sec": round(vectors / t_desc, 1),
        "descriptor_rows": n_docs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
