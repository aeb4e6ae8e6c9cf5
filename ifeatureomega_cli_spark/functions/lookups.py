"""Lookup-table resources for A2/A4/A5 descriptors.

Tables live in the ``ifeatureomega_cli_spark.resources`` package — pinned
from the reference by ``tools/make_lookups.py`` (probe method: descriptor
output of a length-1 sequence is the lookup row).  Shape convention:
(vocab+1, D); the last row is the gap '-' row.

Access goes through ``importlib.resources`` so everything works from a
``spark-submit --py-files`` zip (zipimport) as well as a working tree.
Kernel factories capture these small arrays in their closures; Spark ships
them to executors inside the serialized UDF — the broadcast path for small
dimension data.
"""

from __future__ import annotations

import io
import json
import os
from functools import lru_cache
from importlib import resources as ilr

import numpy as np

# kept for tools that write new resources into the working tree
RES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "resources")


def _res_bytes(fname: str) -> bytes:
    return (ilr.files("ifeatureomega_cli_spark.resources") / fname).read_bytes()


def _res_text(fname: str) -> str:
    return (ilr.files("ifeatureomega_cli_spark.resources") / fname).read_text()


@lru_cache(maxsize=None)
def _npz(fname: str) -> dict[str, np.ndarray]:
    with np.load(io.BytesIO(_res_bytes(fname))) as z:
        return {k: z[k] for k in z.files}


@lru_cache(maxsize=None)
def _json(fname: str):
    return json.loads(_res_text(fname))


def a2_table(seq_type: str, desc: str, grams: int = 1) -> np.ndarray:
    key = desc.replace(" ", "_")
    if seq_type == "protein":
        return _npz("protein_a2.npz")[key]
    fname = {1: "dna_a2_1.npz", 2: "dna_a2_2.npz", 3: "dna_a2_3.npz"}[grams]
    return _npz(fname)[key]


@lru_cache(maxsize=None)
def aaidx_matrix() -> tuple[list[str], np.ndarray]:
    """Parse AAidx.txt → (accession names, (n_props, 20) values) with
    columns permuted to canonical 'ACDEFGHIKLMNPQRSTVWY' order."""
    lines = _res_text("AAidx.txt").splitlines()
    header = lines[0].rstrip("\n").split("\t")[1:]
    names, rows = [], []
    for line in lines[1:]:
        if not line.strip():
            continue
        parts = line.rstrip("\n").split("\t")
        names.append(parts[0])
        # some rows carry 'NA' entries (matching the reference, which
        # would fail on them only if those properties are selected)
        rows.append([float(x) if x != "NA" else np.nan for x in parts[1:]])
    vals = np.array(rows)
    from ifeatureomega_cli_spark.tokenize import PROTEIN_AA

    perm = [header.index(c) for c in PROTEIN_AA]
    return names, vals[:, perm]


@lru_cache(maxsize=None)
def matrix_file(fname: str, order: str) -> np.ndarray:
    """20×20 whitespace matrix file permuted to canonical token order."""
    from ifeatureomega_cli_spark.tokenize import PROTEIN_AA

    lines = [l for l in _res_text(fname).splitlines()[1:] if l.strip()]
    m = np.array([[float(x) for x in line.split()[1:]] for line in lines])
    perm = [order.index(c) for c in PROTEIN_AA]
    return m[perm][:, perm]


@lru_cache(maxsize=None)
def paac_table() -> tuple[list[str], list[str], np.ndarray]:
    """PAAC.txt → (header AA order, property names, raw (P, 20) values)."""
    lines = _res_text("PAAC.txt").splitlines()
    header = lines[0].rstrip("\n").split("\t")[1:]
    names, rows = [], []
    for line in lines[1:]:
        if not line.strip():
            continue
        parts = line.rstrip("\n").split("\t")
        names.append(parts[0])
        rows.append([float(x) for x in parts[1:]])
    return header, names, np.array(rows)
