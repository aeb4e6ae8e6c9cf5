"""Ligand (iLigand) descriptor plumbing: (mol_id, smiles) → feature rows.

The reference (iFeatureOmegaCLI.py:9788-9949 + chem/) computes 24
descriptor families per molecule with RDKit — a per-molecule SCALAR map
(mol → fixed-length float vector), which on Spark is exactly one
Arrow-batched mapInPandas over a `(mol_id, smiles)` table: embarrassingly
parallel, no shuffle, output schema fixed per family.

The per-molecule kernel splits by what chemistry each family needs:

* GRAPH FAMILIES (twenty-three of 24 as of round 7): Constitution,
  Topology, Connectivity, Kappa, EState, the three autocorrelations,
  Basak, Burden, E-state fingerprints and the CATS pharmacophore
  (round 6) — plus Molecular properties (Wildman-Crippen LogP/MR, Ertl
  TPSA, Labute ASA, Hy/UI), Charge (Gasteiger-Marsili PEOE), Moe-Type
  (P_VSA), the four Morgan/ECFP/FCFP families, Carhart atom pairs,
  Nilakantan topological torsions, the Daylight-type subgraph
  fingerprint and MACCS keys (the 166 published SMARTS keys evaluated
  by the original matcher in `functions/smarts.py`) from round 7 —
  are functions of the molecular graph (plus published parameter
  tables / bit packings) and compute for REAL — SMILES parsed by the
  pure-Python `functions/molgraph.py`, formulas transcribed in
  `functions/chemdesc.py` / `chemdesc_ext.py` / `chemdesc_props.py`
  / `chemdesc_charge.py` / `chemdesc_fp.py` / `chemdesc_fp2.py` /
  `chemdesc_maccs.py`.  No RDKit needed; `valid` reflects actual
  parse success.
* RDKIT-GATED FAMILIES (now only the reference's dead 'Morgan
  fingerprints' entry — its 2048-bit hashed Morgan twin of the
  ECFP4 family): genuinely need RDKit's hashing machinery for
  bit-exact output — with RDKit
  importable they would call the reference's chem/ coder list; without
  it the clearly-marked DETERMINISTIC STUB stands in (a seeded digest
  expanded to the family width, with a syntactic validity check
  mimicking `MolFromSmiles` returning None, ref :9871-9876).

Either way the Spark-side contract — schema, invalid-row skipping, Arrow
batch shape, distribution — is identical and is what the tests pin.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the 24 families and their per-molecule scalar/coder names, transcribed
# from the reference's __default_para_dict (iFeatureOmegaCLI.py:9812-9859).
# Feature WIDTH here = number of coders; coders returning vectors (the
# fingerprint families) widen at runtime exactly as the reference's
# `fp+str(j)` expansion does — the stub models them with the documented
# fixed widths below.
LIGAND_FAMILIES: dict[str, list[str]] = {
    "Constitution": [
        "nhyd", "nhal", "nhet", "nhev", "ncof", "ncocl", "ncobr", "ncoi",
        "ncarb", "nphos", "nsulph", "noxy", "nnitro", "nring", "nrot",
        "ndonr", "naccr", "nsb", "ndb", "ntb", "naro", "nta", "AWeight",
        "PC1", "PC2", "PC3", "PC4", "PC5", "PC6"],
    "Topology": [
        "AW", "J", "Thara", "Tsch", "Tigdi", "Platt", "Xu", "Pol", "Dz",
        "Ipc", "BertzCT", "GMTI", "ZM1", "ZM2", "MZM1", "MZM2", "Qindex",
        "diametert", "radiust", "petitjeant", "Sito", "Hato", "Geto",
        "Arto"],
    "Connectivity": [
        "Chi0", "Chi1", "mChi1", "Chi2", "Chi3", "Chi4", "Chi5", "Chi6",
        "Chi7", "Chi8", "Chi9", "Chi10", "Chi3c", "Chi4c", "Chi4pc",
        "Chi3ch", "Chi4ch", "Chi5ch", "Chi6ch", "Chiv0", "Chiv1", "Chiv2",
        "Chiv3", "Chiv4", "Chiv5", "Chiv6", "Chiv7", "Chiv8", "Chiv9",
        "Chiv10", "dchi0", "dchi1", "dchi2", "dchi3", "dchi4", "Chiv3c",
        "Chiv4c", "Chiv4pc", "Chiv3ch", "Chiv4ch", "Chiv5ch", "Chiv6ch",
        "knotpv", "knotp"],
    "Kappa": ["kappa1", "kappa2", "kappa3", "kappam1", "kappam2",
              "kappam3", "phi"],
    "EState": ["value", "max", "min", "Shev", "Scar", "Shal", "Shet",
               "Save", "Smax", "Smin", "DS"],
    "Autocorrelation-moran": [
        f"MATS{p}{i}" for p in "mvep" for i in range(1, 9)],
    "Autocorrelation-geary": [
        f"GATS{p}{i}" for p in "mvep" for i in range(1, 9)],
    "Autocorrelation-broto": [
        f"ATS{p}{i}" for p in "mvep" for i in range(1, 9)],
    "Molecular properties": ["LogP", "MR", "LabuteASA", "TPSA", "Hy", "UI"],
    "Charge": [
        "SPP", "LDI", "Rnc", "Rpc", "Mac", "Tac", "Mnc", "Tnc", "Mpc",
        "Tpc", "Qass", "QOss", "QNss", "QCss", "QHss", "Qmin", "QOmin",
        "QNmin", "QCmin", "QHmin", "Qmax", "QOmax", "QNmax", "QCmax",
        "QHmax"],
    "Moe-Type descriptors": ["LabuteASA", "TPSA", "slogPVSA", "MRVSA",
                             "PEOEVSA", "EstateVSA", "VSAEstate"],
    "Daylight-type fingerprints": ["topological"],
    "MACCS fingerprints": ["MACCS"],
    "Atom pairs fingerprints": ["atompairs"],
    "Morgan fingerprints": ["morgan"],
    "TopologicalTorsion fingerprints": ["torsions"],
    "E-state fingerprints": ["Estate"],
    "Basak": [f"{k}{i}" for k in ("CIC", "SIC", "IC") for i in range(7)],
    "Burden": ["bcutp", "bcute", "bcutv", "bcutm"],
    "Pharmacophore": ["CalcCATS"],
    "Morgan-ECFP4 fingerprints": ["ECFP4"],
    "Morgan-ECFP6 fingerprints": ["ECFP6"],
    "Morgan-FCFP4 fingerprints": ["FCFP4"],
    "Morgan-FCFP6 fingerprints": ["FCFP6"],
}

# runtime feature widths for the vector-valued families (fingerprint bit
# widths per the reference's chem/fingerprint.py; EState/Burden expand
# their vector coders per the reference's fp+str(j) loop, :9897-9900:
# EState = 3×79 type-resolved vectors + 8 scalars, Burden = 4×16 BCUTs)
_FP_WIDTHS = {
    # Moe-Type expands its five vector coders (12+10+14+11+10) + the
    # two scalars, per the reference's fp+str(j) loop
    "Moe-Type descriptors": 59,
    "Daylight-type fingerprints": 2048,
    "MACCS fingerprints": 167,
    "Atom pairs fingerprints": 2048,
    "Morgan fingerprints": 2048,
    "TopologicalTorsion fingerprints": 2048,
    "E-state fingerprints": 79,
    "EState": 3 * 79 + 8,
    "Burden": 4 * 16,
    "Pharmacophore": 150,
    "Morgan-ECFP4 fingerprints": 2048,
    "Morgan-ECFP6 fingerprints": 2048,
    "Morgan-FCFP4 fingerprints": 2048,
    "Morgan-FCFP6 fingerprints": 2048,
}

_SMILES_CHARS = set(
    "ABCDEFGHIKLMNOPRSTUVWYZabcdefghiklmnoprstuy0123456789"
    "()[]{}=#+-./\\@%*:$")


def family_width(family: str) -> int:
    """Feature-vector length for a family (scalar families: one value per
    coder; fingerprint families: the fingerprint's bit width)."""
    if family not in LIGAND_FAMILIES:
        raise KeyError(
            f"unknown ligand family {family!r}; one of "
            f"{sorted(LIGAND_FAMILIES)}")
    return _FP_WIDTHS.get(family, len(LIGAND_FAMILIES[family]))


# set True once _rdkit_features is wired to the reference's chem/ coders
# for the NUMERIC families; ligand_descriptors refuses the RDKit path at
# plan time while this is False so the gap never surfaces as per-task
# executor failures.  The GRAPH families never consult this flag — they
# compute for real via functions/chemdesc(_ext).py regardless of RDKit.
HAVE_CHEM_PORT = False

# families computed for real by the pure-Python molecular-graph port
# (round 6: Constitution/Topology/Connectivity/Kappa via
# functions/chemdesc.py; round 6b adds EState, the three
# autocorrelations, Basak, Burden, E-state fingerprints and the CATS
# pharmacophore via functions/chemdesc_ext.py — graph + probed
# AtomProperty table only)
GRAPH_FAMILY_NAMES = frozenset({
    "Constitution", "Topology", "Connectivity", "Kappa",
    "EState", "Autocorrelation-moran", "Autocorrelation-geary",
    "Autocorrelation-broto", "Basak", "Burden", "E-state fingerprints",
    "Pharmacophore",
    # round 7 (functions/chemdesc_props.py): Wildman-Crippen LogP/MR +
    # Ertl TPSA + Labute ASA + the reference's own Hy/UI
    "Molecular properties",
    # round 7 (functions/chemdesc_charge.py): Gasteiger-Marsili PEOE
    "Charge",
    # round 7: P_VSA scheme over the Labute areas + Crippen/PEOE/EState
    # per-atom properties, RDKit's published bin boundaries
    "Moe-Type descriptors",
    # round 7 (functions/chemdesc_fp.py): Morgan circular fingerprints,
    # algorithmic core with a documented 32-bit-hash boundary
    "Morgan-ECFP4 fingerprints", "Morgan-ECFP6 fingerprints",
    "Morgan-FCFP4 fingerprints", "Morgan-FCFP6 fingerprints",
    # round 7 second half (functions/chemdesc_fp2.py): Carhart atom
    # pairs + Nilakantan torsions (published deterministic bit-packing,
    # exact unfolded-id parity pinnable) and the Daylight-type subgraph
    # fingerprint (ESU enumeration, documented hash boundary)
    "Atom pairs fingerprints", "TopologicalTorsion fingerprints",
    "Daylight-type fingerprints",
    # round 7 third wave (functions/smarts.py + chemdesc_maccs.py): the
    # 166 published MACCS SMARTS keys evaluated by an original SMARTS
    # subgraph matcher — no RDKit needed
    "MACCS fingerprints",
})


def _rdkit_or_none():
    try:
        from rdkit import Chem  # noqa: F401
        return Chem
    except Exception:
        return None


def smiles_valid_stub(s: str) -> bool:
    """Syntactic stand-in for `Chem.MolFromSmiles(s) is not None`: nonempty,
    known charset, balanced ()/[] — deterministic, catches the garbage the
    reference's mol_list loop drops (:9871-9876)."""
    if not s or any(c not in _SMILES_CHARS for c in s):
        return False
    for o, c in (("(", ")"), ("[", "]")):
        depth = 0
        for ch in s:
            depth += (ch == o) - (ch == c)
            if depth < 0:
                return False
        if depth != 0:
            return False
    return True


def descriptor_stub(smiles: str, family: str) -> np.ndarray:
    """Deterministic fake per-molecule descriptor: SHA-256(smiles|family)
    expanded to the family width, floats in [0, 1).  Replace by the RDKit
    coder list on a real cluster (ligand_descriptors does this switch
    automatically when RDKit imports)."""
    w = family_width(family)
    h = hashlib.sha256(f"{family}|{smiles}".encode()).digest()
    raw = np.frombuffer((h * ((w * 4) // len(h) + 1))[: w * 4],
                        dtype=np.uint32)
    return (raw % 1_000_003).astype(np.float64) / 1_000_003.0


def read_smiles(spark: SparkSession, path: str) -> DataFrame:
    """One SMILES per line (the reference's input format, :9869) →
    (mol_id, smiles); mol_id is the 0-based index among NON-BLANK lines.
    Documented deviation: the reference keeps interior blank lines as ''
    entries (RDKit parses '' to an empty-but-valid Mol, so they survive
    into mol_list, :9869-9876); here blank lines are dropped — an empty
    molecule has no meaningful descriptors.  Needs no chemistry
    library.

    Scale note: the global line-number window is a single-partition sort —
    correct for the reference's dimension-table-sized SMILES lists; for a
    billion-molecule corpus land the ids at ingest (parquet with an id
    column) and skip this reader."""
    from pyspark.sql.window import Window

    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("__file_pos"),
        F.trim(F.col("value")).alias("smiles"))
    w = Window.orderBy("__file_pos")
    return (lines.filter(F.col("smiles") != "")
            .withColumn("mol_id", F.row_number().over(w) - 1)
            .select("mol_id", "smiles"))


def ligand_descriptors(
    df: DataFrame,
    family: str,
    smiles_col: str = "smiles",
    id_col: str = "mol_id",
) -> DataFrame:
    """Per-molecule descriptor family over a (mol_id, smiles) table.

    Output: (mol_id, smiles, valid boolean, features array<double>).
    Invalid SMILES get valid=false and features=null — they stay as rows
    (observable) but carry no features, mirroring the reference skipping
    them from mol_list; filter on `valid` for the reference's exact row
    set.  One Arrow batch parses + encodes ~1k molecules; no shuffle —
    the 100 TB plan is scan → mapInPandas → sink.

    With RDKit importable the real coders run; without it the documented
    deterministic stub keeps the pipeline verifiable end-to-end."""
    if family not in LIGAND_FAMILIES:
        raise KeyError(
            f"unknown ligand family {family!r}; one of "
            f"{sorted(LIGAND_FAMILIES)}")
    graph_family = family in GRAPH_FAMILY_NAMES
    Chem = _rdkit_or_none()
    if not graph_family and Chem is not None and not HAVE_CHEM_PORT:
        # fail fast at PLAN time: RDKit is importable but the chem/ coder
        # port is not bundled, so the per-molecule path would raise inside
        # every executor task — surface the gap before any job launches.
        raise NotImplementedError(
            "RDKit detected but the chem/ coder port is not bundled here; "
            "wire the reference's chem package (estate.py, charge.py, "
            "fingerprint.py, ...) into _rdkit_features and set "
            "HAVE_CHEM_PORT. Ref iFeatureOmegaCLI.py:9891-9903. "
            "(Constitution/Topology/Connectivity/Kappa are already real "
            "via the molecular-graph port and never take this path.)")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ifeatureomega_cli_spark.functions.chemdesc import GRAPH_FAMILIES
        from ifeatureomega_cli_spark.functions.chemdesc_ext import (
            EXT_GRAPH_FAMILIES)
        from ifeatureomega_cli_spark.functions.chemdesc_charge import (
            CHARGE_FAMILIES)
        from ifeatureomega_cli_spark.functions.chemdesc_fp import (
            FP_FAMILIES)
        from ifeatureomega_cli_spark.functions.chemdesc_fp2 import (
            FP2_FAMILIES)
        from ifeatureomega_cli_spark.functions.chemdesc_maccs import (
            MACCS_FAMILIES)
        from ifeatureomega_cli_spark.functions.chemdesc_props import (
            PROP_FAMILIES)
        from ifeatureomega_cli_spark.functions.molgraph import (
            SmilesError, parse_smiles)

        graph_kernels = {**GRAPH_FAMILIES, **EXT_GRAPH_FAMILIES,
                         **PROP_FAMILIES, **CHARGE_FAMILIES,
                         **FP_FAMILIES, **FP2_FAMILIES,
                         **MACCS_FAMILIES}

        for pdf in batches:
            valid, feats = [], []
            for s in pdf[smiles_col]:
                s = s or ""
                if graph_family:
                    # real path, RDKit-free: SMILES → graph → transcribed
                    # reference formulas (functions/chemdesc.py)
                    try:
                        mol = parse_smiles(s)
                    except SmilesError:
                        valid.append(False)
                        feats.append(None)
                        continue
                    valid.append(True)
                    feats.append(graph_kernels[family](mol).tolist())
                elif Chem is not None:
                    mol = Chem.MolFromSmiles(s)
                    ok = mol is not None
                    # real path: run the family's chem/ coder list, concat
                    # scalars/vectors in coder order (ref :9891-9903)
                    if ok:
                        feats.append(_rdkit_features(mol, family))
                    else:
                        feats.append(None)
                    valid.append(ok)
                else:
                    ok = smiles_valid_stub(s)
                    feats.append(descriptor_stub(s, family).tolist()
                                 if ok else None)
                    valid.append(ok)
            yield pd.DataFrame({
                "mol_id": pdf[id_col],
                "smiles": pdf[smiles_col],
                "valid": valid,
                "features": feats,
            })

    return df.mapInPandas(
        gen, schema="mol_id long, smiles string, valid boolean, "
                    "features array<double>")


def _rdkit_features(mol, family: str) -> list[float]:
    """RDKit path: evaluate the reference's coder list for `family` (the
    chem/ package function names in LIGAND_FAMILIES) and flatten.  Only
    reachable when RDKit imports; the chem/ coders are the reference's
    own published per-molecule functions."""
    raise NotImplementedError(
        "RDKit detected but the chem/ coder port is not bundled here; "
        "wire the reference's chem package (constitution.py, topology.py, "
        "...) into this hook on a cluster with RDKit. Ref "
        "iFeatureOmegaCLI.py:9891-9903.")
