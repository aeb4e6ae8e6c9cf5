"""PDB structure reader — pure-text fixed-width parsing, no Bio.PDB.

The reference (iFeatureOmegaCLI.py:9095-9107 iStructure.read_pdb) parses
with Bio.PDB's PDBParser; biopython is not available in this container, and
the PDB format is a published fixed-column text format (wwPDB format v3.3),
so the reader is ~60 lines of column slicing.  Differences from Bio.PDB,
documented:

* altloc: Bio.PDB keeps every altloc as a DisorderedAtom and yields the
  highest-occupancy child on iteration; this reader keeps altloc ∈ {' ','A'}
  (the standard first conformer).  Results differ only for files whose
  B-conformer has higher occupancy — rare, and observable per file via
  `altloc_drop_stats(spark, glob)` → (pdb_id, n_altloc_dropped).
* model: only MODEL 1 is kept, matching the reference's `structure[0]`.
* hetfield: ATOM → ' '; HETATM → 'W' for waters (HOH/WAT/DOD), else 'H'
  (Bio.PDB uses 'H_<resname>'; only the water/non-water distinction is ever
  consumed, ref :9250, :9639).

Spark-first layout: many structures → `read_pdb_dir` parses each file inside
`mapInPandas` over a `binaryFile` scan (one task per file, no driver I/O),
yielding ONE atoms DataFrame keyed by pdb_id — descriptors then run as
per-structure `applyInPandas` groups.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WATERS = {"HOH", "WAT", "DOD"}

ATOM_SCHEMA = ("pdb_id string, record string, serial long, atom_name string, "
               "altloc string, resname string, chain string, resseq long, "
               "icode string, x double, y double, z double, occupancy double, "
               "bfactor double, element string, hetflag string")

_COLUMNS = [c.split()[0] for c in ATOM_SCHEMA.split(", ")]


def parse_pdb_text(text: str, pdb_id: str) -> pd.DataFrame:
    """ATOM/HETATM records of MODEL 1 → DataFrame (wwPDB v3.3 columns)."""
    rows = []
    in_model = 0  # 0 = before any MODEL record (single-model file)
    for line in text.splitlines():
        rec = line[0:6]
        if rec == "MODEL ":
            in_model += 1
            if in_model > 1:
                break
        elif rec == "ENDMDL":
            break
        elif rec in ("ATOM  ", "HETATM"):
            altloc = line[16]
            if altloc not in (" ", "A"):
                continue
            resname = line[17:20].strip()
            element = line[76:78].strip().upper() if len(line) >= 78 else ""
            if not element:  # pre-v2.3 files: derive from atom-name columns
                element = line[12:14].strip().lstrip("0123456789").upper()
            het = " " if rec == "ATOM  " else ("W" if resname in _WATERS else "H")
            try:
                rows.append((
                    pdb_id, rec.strip(), int(line[6:11]),
                    line[12:16].strip(), altloc.strip(), resname,
                    line[21].strip(), int(line[22:26]), line[26].strip(),
                    float(line[30:38]), float(line[38:46]), float(line[46:54]),
                    float(line[54:60]) if line[54:60].strip() else 1.0,
                    float(line[60:66]) if line[60:66].strip() else 0.0,
                    element, het,
                ))
            except ValueError:  # malformed record — PERMISSIVE=1 skips it
                continue
    return pd.DataFrame(rows, columns=_COLUMNS)


_CIF_TOKEN = None  # compiled lazily


def parse_cif_text(text: str, pdb_id: str) -> pd.DataFrame:
    """mmCIF `_atom_site` loop → the same atoms DataFrame as parse_pdb_text
    (ref iFeatureOmegaCLI.py:9100-9101 accepts .cif via MMCIFParser).  Only
    model 1, altloc ∈ {'.', 'A'}; quoted values handled."""
    import re
    global _CIF_TOKEN
    if _CIF_TOKEN is None:
        _CIF_TOKEN = re.compile(r"'[^']*'|\"[^\"]*\"|\S+")

    lines = iter(text.splitlines())
    tags: list[str] = []
    rows = []
    first_model = None
    in_loop_header = False
    in_data = False
    for line in lines:
        s = line.strip()
        if not s or s.startswith("#"):
            if in_data:
                break  # end of the atom_site loop
            continue
        if s == "loop_":
            tags, in_loop_header, in_data = [], True, False
            continue
        if in_loop_header and s.startswith("_"):
            tags.append(s.split(".")[-1].split()[0] if s.startswith("_atom_site.")
                        else "__other")
            if not s.startswith("_atom_site."):
                in_loop_header = False  # a different loop — ignore it
                tags = []
            continue
        if in_loop_header and tags:
            in_loop_header, in_data = False, True  # first data row
        elif not in_data:
            continue
        if s.startswith(("_", "data_")):
            break  # a new section ends the atom_site loop
        toks = [t[1:-1] if t[0] in "'\"" else t
                for t in _CIF_TOKEN.findall(s)]
        if len(toks) != len(tags):
            continue  # malformed/wrapped row — PERMISSIVE skip, keep parsing
        r = dict(zip(tags, toks))
        model = r.get("pdbx_PDB_model_num", "1")
        if first_model is None:
            first_model = model
        if model != first_model:
            continue
        alt = r.get("label_alt_id", ".")
        if alt not in (".", "?", "A"):
            continue
        rec = r.get("group_PDB", "ATOM")
        resname = r.get("auth_comp_id", r.get("label_comp_id", ""))
        het = " " if rec == "ATOM" else ("W" if resname in _WATERS else "H")
        icode = r.get("pdbx_PDB_ins_code", "")
        try:
            rows.append((
                pdb_id, rec, int(r["id"]),
                r.get("auth_atom_id", r.get("label_atom_id", "")),
                "" if alt in (".", "?") else alt, resname,
                r.get("auth_asym_id", r.get("label_asym_id", "")),
                int(r.get("auth_seq_id", r.get("label_seq_id", "0"))),
                "" if icode in (".", "?") else icode,
                float(r["Cartn_x"]), float(r["Cartn_y"]), float(r["Cartn_z"]),
                float(r.get("occupancy", "1") or 1),
                float(r.get("B_iso_or_equiv", "0") or 0),
                r.get("type_symbol", "").upper(), het,
            ))
        except (ValueError, KeyError):
            continue
    return pd.DataFrame(rows, columns=_COLUMNS)


def _parse_any(text: str, path: str) -> pd.DataFrame:
    pdb_id = os.path.basename(path)[:4].lower()
    if path.lower().endswith(".cif"):
        return parse_cif_text(text, pdb_id)
    return parse_pdb_text(text, pdb_id)


def read_pdb(spark: SparkSession, path: str) -> DataFrame:
    """One local PDB or mmCIF file → atoms DataFrame (driver-side parse;
    use read_pdb_dir for corpora)."""
    with open(path) as f:
        text = f.read()
    pdf = _parse_any(text, path)
    return spark.createDataFrame(pdf, schema=ATOM_SCHEMA)


def read_pdb_dir(spark: SparkSession, path_glob: str) -> DataFrame:
    """Distributed reader: every matched .pdb file parsed in its own task
    (binaryFile scan → mapInPandas), no driver I/O — the 100 TB path."""

    def gen(batches):
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                out.append(_parse_any(
                    bytes(content).decode("utf-8", "replace"), p))
            if out:
                yield pd.concat(out, ignore_index=True)

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.{pdb,cif,ent}").load(path_glob)
             .select("path", "content"))
    return files.mapInPandas(gen, schema=ATOM_SCHEMA)


def altloc_drop_stats(spark: SparkSession, path_glob: str) -> DataFrame:
    """Observability for the altloc policy: per file, how many ATOM/HETATM
    records of model 1 carry a non-first altloc (∉ {' ', 'A'} / {'.', 'A'})
    and are therefore dropped by the readers.  Same distributed binaryFile
    scan as read_pdb_dir; returns (pdb_id, n_altloc_dropped)."""

    def gen(batches):
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                text = bytes(content).decode("utf-8", "replace")
                pdb_id = os.path.basename(p)[:4].lower()
                n = 0
                if p.lower().endswith(".cif"):
                    n = _cif_altloc_dropped(text)
                else:
                    in_model = 0
                    for line in text.splitlines():
                        rec = line[0:6]
                        if rec == "MODEL ":
                            in_model += 1
                            if in_model > 1:
                                break
                        elif rec == "ENDMDL":
                            break
                        elif rec in ("ATOM  ", "HETATM") \
                                and len(line) > 16 \
                                and line[16] not in (" ", "A"):
                            n += 1
                out.append((pdb_id, n))
            if out:
                yield pd.DataFrame(out,
                                   columns=["pdb_id", "n_altloc_dropped"])

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.{pdb,cif,ent}").load(path_glob)
             .select("path", "content"))
    return files.mapInPandas(
        gen, schema="pdb_id string, n_altloc_dropped long")


def _cif_altloc_dropped(text: str) -> int:
    """Count model-1 _atom_site rows with a non-first altloc in an mmCIF."""
    import re
    tok = re.compile(r"'[^']*'|\"[^\"]*\"|\S+")
    tags: list[str] = []
    in_loop_header = in_data = False
    first_model = None
    n = 0
    for line in text.splitlines():
        s = line.strip()
        if not s or s.startswith("#"):
            if in_data:
                break
            continue
        if s == "loop_":
            tags, in_loop_header, in_data = [], True, False
            continue
        if in_loop_header and s.startswith("_"):
            if s.startswith("_atom_site."):
                tags.append(s.split(".")[-1].split()[0])
            else:
                in_loop_header, tags = False, []
            continue
        if in_loop_header and tags:
            in_loop_header, in_data = False, True
        elif not in_data:
            continue
        if s.startswith(("_", "data_")):
            break
        toks = [t[1:-1] if t[0] in "'\"" else t for t in tok.findall(s)]
        if len(toks) != len(tags):
            continue
        r = dict(zip(tags, toks))
        model = r.get("pdbx_PDB_model_num", "1")
        if first_model is None:
            first_model = model
        if model != first_model:
            continue
        if r.get("label_alt_id", ".") not in (".", "?", "A"):
            n += 1
    return n


# 3-letter → 1-letter map (ref iFeatureOmegaCLI.py:9009-9031)
AA_3TO1 = {
    "GLY": "G", "ALA": "A", "LEU": "L", "ILE": "I", "VAL": "V", "PRO": "P",
    "PHE": "F", "MET": "M", "TRP": "W", "SER": "S", "GLN": "Q", "THR": "T",
    "CYS": "C", "ASN": "N", "TYR": "Y", "ASP": "D", "GLU": "E", "LYS": "K",
    "ARG": "R", "HIS": "H",
}


def residue_table(atoms: DataFrame) -> DataFrame:
    """One row per standard residue that has a CA or CB atom, with the
    representative side-chain coordinate (CB if present, else CA) — the
    reference's residue selection (ref :9160-9166) and rep-atom rule
    (:9180, :9669).  Output: (pdb_id, chain, resseq, icode, resname, aa,
    x, y, z).

    Insertion-code residues (icode ≠ '') are KEPT as rows so they count as
    distance sources/graph nodes exactly as the reference's residue list
    does; the reference's target lookup `model[chain][resseq]` uses a bare
    int key and therefore silently skips icode'd residues as TARGETS —
    descriptors replicate that by filtering targets to icode == ''."""
    from pyspark.sql import functions as F

    res = (atoms.filter((F.col("hetflag") == " ")
                        & F.col("atom_name").isin("CA", "CB")
                        & F.col("resname").isin(*AA_3TO1))
           .withColumn("__pref", F.when(F.col("atom_name") == "CB", 0).otherwise(1)))
    from pyspark.sql import Window
    w = Window.partitionBy("pdb_id", "chain", "resseq", "icode").orderBy(
        "__pref", "serial")
    aa_map = F.create_map(*[F.lit(v) for kv in AA_3TO1.items() for v in kv])
    return (res.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .select("pdb_id", "chain", "resseq", "icode", "resname",
                    aa_map[F.col("resname")].alias("aa"), "x", "y", "z"))


def read_msms_vert(spark: SparkSession, path_glob: str) -> DataFrame:
    """MSMS `.vert` surface files → (pdb_id, x, y, z) vertex table.

    The reference's Residue depth descriptor (iFeatureOmegaCLI.py:9286-9307)
    shells out to the MSMS binary via Bio.PDB ResidueDepth; the binary is
    not available here, but its OUTPUT format is published plain text
    (Sanner et al., Biopolymers 38:305-320, 1996): 2 comment lines, one
    count line, then one vertex per line `x y z nx ny nz ...` — so
    precomputed surfaces are first-class inputs.  pdb_id = file stem's
    first 4 chars, matching read_pdb_dir."""

    def gen(batches):
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                pdb_id = os.path.basename(p)[:4].lower()
                lines = (bytes(content).decode("utf-8", "replace")
                         .splitlines())
                for line in lines[3:]:
                    parts = line.split()
                    if len(parts) < 3:
                        continue
                    try:
                        out.append((pdb_id, float(parts[0]),
                                    float(parts[1]), float(parts[2])))
                    except ValueError:
                        continue
            if out:
                yield pd.DataFrame(out, columns=["pdb_id", "x", "y", "z"])

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", "*.vert").load(path_glob)
             .select("path", "content"))
    return files.mapInPandas(
        gen, schema="pdb_id string, x double, y double, z double")
