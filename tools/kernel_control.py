"""No-Spark control for the descriptor scaling ceiling, using the ACTUAL
fused kernels on the ACTUAL scaling dataset.

Reads the cached scaling parquet with pyarrow (one file per worker task),
runs the same 4-descriptor fused pass (`Ragged` + registry kernels) in a
multiprocessing pool pinned to 1-thread BLAS, at N and 4N processes, and
reports throughput + efficiency.  This is the tightest available ceiling
for BENCH §9's control normalization: identical arithmetic, identical
data, no Spark — whatever efficiency THIS loses at 4N is the machine's
shared-DRAM cost, not the engine's.

Usage: python tools/kernel_control.py [seq_parquet_dir] [N] — default
.cache/scale_seqs_1200000, N=8 (→ compares 8 vs 32 procs).
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

DESCS = ["protein:AAC", "protein:CTDT", "protein:CTDD", "protein:Moran"]


def _work(path: str) -> int:
    import numpy as np
    import pyarrow.parquet as pq

    from ifeatureomega_cli_spark.functions.kernels import Ragged
    from ifeatureomega_cli_spark.functions.registry import get_spec

    kerns = [get_spec(n).kernel(None, 0) for n in DESCS]
    t = pq.read_table(path, columns=["tokens"])
    tokens = t.column("tokens").to_pylist()
    n = 0
    # same ~10k-row batching Arrow uses
    for lo in range(0, len(tokens), 10000):
        chunk = [np.asarray(x) for x in tokens[lo: lo + 10000]]
        r = Ragged.from_arrays(np.array(chunk, dtype=object))
        for k in kerns:
            k(r)
        n += len(chunk)
    return n


def main() -> None:
    from multiprocessing import Pool

    src = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".cache", "scale_seqs_1200000")
    n_procs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    files = sorted(glob.glob(os.path.join(src, "*.parquet")))
    assert files, src
    out = {}
    for np_ in (n_procs, n_procs * 4):
        with Pool(np_) as p:
            p.map(_work, files[:np_])  # warm: imports + page cache
            t0 = time.perf_counter()
            rows = sum(p.map(_work, files))
            dt = time.perf_counter() - t0
        out[np_] = {"rows": rows, "seconds": round(dt, 2),
                    "vectors_per_sec": round(rows * len(DESCS) / dt, 1)}
        print(json.dumps({str(np_): out[np_]}))
    eff = (out[n_procs * 4]["vectors_per_sec"]
           / out[n_procs]["vectors_per_sec"] / 4)
    print(json.dumps({"control_eff": round(eff, 3),
                      "protocol": f"{n_procs} -> {n_procs*4} procs, "
                                  "1-thread BLAS, actual fused kernels"}))


if __name__ == "__main__":
    main()
