"""Corpus-scale ligand soak (round 8, VERDICT r7 #8).

Runs every REAL ligand family (23 of 24 — 'Morgan fingerprints' is
dead in the reference itself) over a ~200k-molecule synthetic panel at
local[N] and writes per-family throughput + zero-failure evidence to
BENCH/ligand_soak.json.  The panel reuses bench.py's suffix-mutation
scheme (20 seed molecules x 6 alkyl tails x id-modulated repetition),
so every SMILES is valid and the family kernels see realistic size
variation.  Failure accounting: a family run fails a row iff the
features array is NULL or contains NaN where the kernel defines none —
counted with one aggregation per family, not collect().

Usage:  python tools/ligand_soak.py [n_mols] [master]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except Exception:
        return -1.0


def main() -> None:
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = sys.argv[2] if len(sys.argv) > 2 else f"local[{cpus}]"

    from pyspark.sql import functions as F

    from ifeatureomega_cli_spark import get_spark
    from ifeatureomega_cli_spark.operators.ligand import (
        LIGAND_FAMILIES, ligand_descriptors)

    spark = get_spark(master=master, shuffle_partitions=int(cpus))

    panel = [
        "CCO", "CC(C)CC", "c1ccccc1", "Cc1ccccc1O", "CC(=O)Oc1ccccc1C(=O)O",
        "Cn1cnc2c1c(=O)n(C)c(=O)n2C", "NC(CC(=O)O)C(=O)O",
        "CC(C)Cc1ccc(cc1)C(C)C(=O)O", "O=[N+]([O-])c1ccc(Cl)cc1",
        "CSCCC(N)C(=O)O", "c1ccc2ccccc2c1", "OCC1CCCCC1",
        "CC(=O)Nc1ccc(O)cc1", "ClC(Cl)=C(Cl)Cl", "CCN(CC)CC",
        "c1ccncc1", "C#CCO", "CC(C)(C)c1ccc(O)cc1", "CCOC(=O)C",
        "NCCc1ccc(O)c(O)c1",
    ]
    rows = spark.range(n_mols).select(
        F.col("id").alias("mol_id"),
        F.concat(
            F.element_at(F.array(*[F.lit(s) for s in panel]),
                         (F.col("id") % len(panel) + 1).cast("int")),
            F.element_at(
                F.array(*[F.lit(s) for s in ["C" * k for k in range(1, 7)]]),
                (F.col("id") % 6 + 1).cast("int")),
        ).alias("smiles")).repartition(int(cpus) * 2).cache()
    rows.count()

    families = [f for f in LIGAND_FAMILIES if f != "Morgan fingerprints"]
    out: dict = {"n_mols": n_mols, "master": master,
                 "load_start": _loadavg(), "families": {}}
    for family in families:
        la0 = _loadavg()
        t0 = time.perf_counter()
        feats = ligand_descriptors(rows, family)
        # one aggregation: rows out, NULL features, any-NaN features
        agg = feats.select(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("features").isNull(), 1)
                  .otherwise(0)).alias("n_null"),
            F.sum(F.when(F.exists("features", lambda v: F.isnan(v)), 1)
                  .otherwise(0)).alias("n_nan"),
        ).collect()[0]
        sec = round(time.perf_counter() - t0, 2)
        rec = {
            "sec": sec,
            "mols_per_sec": round(n_mols / sec, 1),
            "rows": agg["rows"],
            "n_null": int(agg["n_null"] or 0),
            "n_nan": int(agg["n_nan"] or 0),
            "load": [la0, _loadavg()],
        }
        out["families"][family] = rec
        print(f"{family:35s} {sec:8.2f}s  {rec['mols_per_sec']:>10.1f} "
              f"mols/s  rows={rec['rows']} null={rec['n_null']} "
              f"nan={rec['n_nan']}", flush=True)
    out["load_end"] = _loadavg()
    out["total_sec"] = round(sum(v["sec"] for v in out["families"].values()),
                             1)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ligand_soak.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"total_sec": out["total_sec"], "written": path}))
    spark.stop()


if __name__ == "__main__":
    main()
