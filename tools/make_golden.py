"""Generate golden descriptor fixtures by running the reference implementation.

Runs iFeatureOmega-CLI (read-only, deps stubbed via reference_loader) on its
own example data and pins outputs as parquet under tests/fixtures/golden/.
Engine tests then assert numpy.allclose against these — the reference itself
is NOT needed at test time.

Usage: python tools/make_golden.py [descriptor ...]   (default: all known)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.reference_loader import load_reference  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")
GOLDDIR = os.path.join(FIXDIR, "golden")
EXAMPLES = "/root/reference/data_examples"

# descriptor lists per sequence type; grows as the engine grows
PROTEIN = [
    "AAC", "EAAC", "CKSAAP type 1", "CKSAAP type 2", "DPC type 1", "DPC type 2",
    "DDE", "TPC type 1", "TPC type 2", "binary", "binary_6bit",
    "binary_5bit type 1", "binary_5bit type 2",
    "binary_3bit type 1", "binary_3bit type 2", "binary_3bit type 3",
    "binary_3bit type 4", "binary_3bit type 5", "binary_3bit type 6",
    "binary_3bit type 7", "AESNN3", "GAAC", "EGAAC", "CKSAAGP type 1",
    "CKSAAGP type 2", "GDPC type 1", "GDPC type 2", "GTPC type 1",
    "GTPC type 2", "AAIndex", "ZScale", "BLOSUM62", "NMBroto", "Moran",
    "Geary", "AC", "CC", "ACC", "CTDC", "CTDT", "CTDD", "CTriad", "KSCTriad",
    "SOCNumber", "QSOrder", "PAAC", "APAAC", "OPF_10bit", "OPF_7bit type 1",
    "OPF_7bit type 2", "OPF_7bit type 3", "ASDC", "DistancePair",
    "PseKRAAC type 1", "PseKRAAC type 2", "PseKRAAC type 3A",
    "PseKRAAC type 3B", "PseKRAAC type 4", "PseKRAAC type 5",
    "PseKRAAC type 6A", "PseKRAAC type 6B", "PseKRAAC type 6C",
    "PseKRAAC type 7", "PseKRAAC type 8", "PseKRAAC type 9",
    "PseKRAAC type 10", "PseKRAAC type 11", "PseKRAAC type 12",
    "PseKRAAC type 13", "PseKRAAC type 14", "PseKRAAC type 15",
    "PseKRAAC type 16", "KNN",
]
DNA = [
    "Kmer type 1", "Kmer type 2", "RCKmer type 1", "RCKmer type 2",
    "Mismatch", "Subsequence", "NAC", "ANF", "NCP", "ENAC", "binary",
    "CKSNAP type 1", "CKSNAP type 2", "EIIP", "PseEIIP", "ASDC", "DBE",
    "LPDF", "DPCP", "DPCP type2", "TPCP", "TPCP type2", "MMI", "PS2", "PS3",
    "PS4", "Z_curve_9bit", "Z_curve_12bit", "Z_curve_36bit", "Z_curve_48bit",
    "Z_curve_144bit", "NMBroto", "Moran", "Geary", "DAC", "DCC", "DACC",
    "TAC", "TCC", "TACC", "PseDNC", "PseKNC", "PCPseDNC", "PCPseTNC",
    "SCPseDNC", "SCPseTNC", "PSTNPss", "PSTNPds", "KNN",
]
RNA = [
    "Kmer type 1", "Kmer type 2", "Mismatch", "Subsequence", "NAC", "ANF", "NCP", "ENAC", "binary",
    "CKSNAP type 1", "CKSNAP type 2", "ASDC", "DBE",
    "LPDF", "DPCP", "DPCP type2", "MMI", "PS2", "PS3", "PS4",
    "Z_curve_9bit", "Z_curve_12bit", "Z_curve_36bit", "Z_curve_48bit",
    "Z_curve_144bit", "NMBroto", "Moran", "Geary", "DAC", "DCC", "DACC",
    "PseDNC", "PseKNC", "PCPseDNC", "SCPseDNC", "PSTNPss", "KNN",
]


def slug(seq_type: str, desc: str) -> str:
    return f"{seq_type}__{desc}".replace(" ", "_")


def dump_tokens(obj, seq_type: str, path: str) -> None:
    """Pin the reference's parsed/masked sequences as a tokenized table."""
    from ifeatureomega_cli_spark.tokenize import tokenize_dna, tokenize_protein

    tok = tokenize_protein if seq_type == "protein" else tokenize_dna
    rows = []
    for name, seq, label, purpose in obj.fasta_list:
        ids = tok(seq)
        rows.append((name, ids.tolist(), len(ids), "src_ref", label, purpose))
    pd.DataFrame(
        rows, columns=["doc_id", "tokens", "n_tok", "source", "label", "purpose"]
    ).to_parquet(path, index=False)


def _fresh(seq_type: str):
    ref = load_reference()
    if seq_type == "protein":
        obj = ref.iProtein(os.path.join(EXAMPLES, "peptide_sequences.txt"))
        obj.import_parameters("/root/reference/parameters/Protein_parameters_setting.json")
    elif seq_type == "dna":
        obj = ref.iDNA(os.path.join(EXAMPLES, "DNA_sequences.txt"))
        obj.import_parameters("/root/reference/parameters/DNA_parameters_setting.json")
    else:
        obj = ref.iRNA(os.path.join(EXAMPLES, "RNA_sequences.txt"))
        obj.import_parameters("/root/reference/parameters/RNA_parameters_setting.json")
    if seq_type in ("dna", "rna"):
        for i, row in enumerate(obj.fasta_list):
            row[0] = f"{row[0]}#r{i}" if seq_type == "rna" else row[0]
            row[2] = str(i % 2)
            row[3] = "training" if i % 5 != 4 else "testing"
        import numpy as _np
        obj.sample_purpose = _np.array([r[3] == "training" for r in obj.fasta_list])
    return obj


def run(seq_type: str, wanted: set[str] | None) -> dict[str, list[str]]:
    ref = load_reference()
    names: dict[str, list[str]] = {}
    if seq_type == "protein":
        obj = ref.iProtein(os.path.join(EXAMPLES, "peptide_sequences.txt"))
        obj.import_parameters("/root/reference/parameters/Protein_parameters_setting.json")
        descs = PROTEIN
        tokens_path = os.path.join(FIXDIR, "peptide_tokens.parquet")
    elif seq_type == "dna":
        obj = ref.iDNA(os.path.join(EXAMPLES, "DNA_sequences.txt"))
        obj.import_parameters("/root/reference/parameters/DNA_parameters_setting.json")
        descs = DNA
        tokens_path = os.path.join(FIXDIR, "dna_tokens.parquet")
    else:
        obj = ref.iRNA(os.path.join(EXAMPLES, "RNA_sequences.txt"))
        obj.import_parameters("/root/reference/parameters/RNA_parameters_setting.json")
        descs = RNA
        tokens_path = os.path.join(FIXDIR, "rna_tokens.parquet")

    if seq_type in ("dna", "rna"):
        # the DNA/RNA example files carry no labels; synthesize a
        # deterministic label/purpose split so cross-sample descriptors
        # (PSTNPss/ds, KNN) have two classes and a train/test split.
        # RNA example names are not unique → make ids unique for alignment.
        for i, row in enumerate(obj.fasta_list):
            row[0] = f"{row[0]}#r{i}"
            row[2] = str(i % 2)
            row[3] = "training" if i % 5 != 4 else "testing"
        import numpy as _np
        obj.sample_purpose = _np.array([r[3] == "training" for r in obj.fasta_list])

    if not os.path.exists(tokens_path):
        dump_tokens(obj, "protein" if seq_type == "protein" else "dna", tokens_path)

    for d in descs:
        if wanted and d not in wanted:
            continue
        out = os.path.join(GOLDDIR, slug(seq_type, d) + ".parquet")
        obj = _fresh(seq_type)  # fresh object: some reference kernels
        # mutate fasta_list in place (PSTNPds T→A/G→C, ref :6291-6292)
        obj.encodings = None
        obj.error_msg = ""
        ok = obj.get_descriptor(d)
        if ok is False or obj.encodings is None:
            print(f"  SKIP {seq_type}:{d}: {obj.error_msg}")
            continue
        enc = obj.encodings
        names[slug(seq_type, d)] = [str(c) for c in enc.columns]
        feat = enc.to_numpy(dtype=np.float64)
        pd.DataFrame(
            {"doc_id": enc.index.astype(str), "features": list(map(list, feat))}
        ).to_parquet(out, index=False)
        print(f"  wrote {seq_type}:{d} shape={enc.shape}")
    return names


def main() -> None:
    os.makedirs(GOLDDIR, exist_ok=True)
    wanted = set(sys.argv[1:]) or None
    meta_path = os.path.join(GOLDDIR, "names.json")
    meta = {}
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    for st in ("protein", "dna", "rna"):
        meta.update(run(st, wanted))
    json.dump(meta, open(meta_path, "w"), indent=0)


if __name__ == "__main__":
    main()
