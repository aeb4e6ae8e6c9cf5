"""Lookup-table resources for A2/A4/A5 descriptors.

Tables live in ``resources/*.npz`` — pinned from the reference by
``tools/make_lookups.py`` (probe method: descriptor output of a length-1
sequence is the lookup row).  Shape convention: (vocab+1, D); the last row
is the gap '-' row.  Kernel factories capture these small arrays in their
closures; Spark ships them to executors inside the serialized UDF, which is
the broadcast path for small dimension data.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

RES = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "resources")
# fallback when the package dir layout differs (installed zip): resources next to package
if not os.path.isdir(RES):
    RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")


@lru_cache(maxsize=None)
def _npz(fname: str) -> dict[str, np.ndarray]:
    with np.load(os.path.join(RES, fname)) as z:
        return {k: z[k] for k in z.files}


def a2_table(seq_type: str, desc: str, grams: int = 1) -> np.ndarray:
    key = desc.replace(" ", "_")
    if seq_type == "protein":
        return _npz("protein_a2.npz")[key]
    fname = {1: "dna_a2_1.npz", 2: "dna_a2_2.npz", 3: "dna_a2_3.npz"}[grams]
    return _npz(fname)[key]


@lru_cache(maxsize=None)
def aaidx_matrix() -> tuple[list[str], np.ndarray]:
    """Parse resources/AAidx.txt → (accession names, (n_props, 20) values)
    with columns in canonical 'ACDEFGHIKLMNPQRSTVWY' order.

    The file ships property rows in 'ARNDCQEGHILKMFPSTWYV' column order
    (header row); we permute to canonical token order.
    """
    path = os.path.join(RES, "AAidx.txt")
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")[1:]
        names, rows = [], []
        for line in f:
            if not line.strip():
                continue
            parts = line.rstrip("\n").split("\t")
            names.append(parts[0])
            # some rows carry 'NA' entries (matching the reference, which
            # would fail on them only if those properties are selected)
            rows.append([float(x) if x != "NA" else np.nan for x in parts[1:]])
    vals = np.array(rows)  # (n_props, 20) in file column order
    from ifeatureomega_cli_spark.tokenize import PROTEIN_AA

    perm = [header.index(c) for c in PROTEIN_AA]
    return names, vals[:, perm]
