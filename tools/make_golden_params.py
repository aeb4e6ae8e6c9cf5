"""Pin golden fixtures for NON-default parameter variants (protein).

Exercises the parameter-dependent code paths (kspace, windows, lambda,
PseKRAAC models, DistancePair reduced alphabets) that the default-param
goldens cannot.  Variant list mirrors tests/test_api_params.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.reference_loader import load_reference  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "fixtures", "golden_params")

DNA_VARIANTS = [
    ("Kmer type 1", {"kmer": 2}),
    ("CKSNAP type 1", {"kspace": 2}),
    ("Mismatch", {"kmer": 2, "mismatch": 1}),
    ("RCKmer type 1", {"kmer": 4}),
    ("PseKNC", {"kmer": 2, "lambdaValue": 3, "weight": 0.1,
                "Di-DNA-Phychem": "Twist;Tilt;Roll;Shift;Slide;Rise"}),
    ("DAC", {"nlag": 5, "Di-DNA-Phychem": "Twist;Roll"}),
    ("ENAC", {"sliding_window": 4}),
    ("Subsequence", {"kmer": 3, "delta": 0.5}),
    ("Subsequence", {"kmer": 2, "delta": 1.0}),
    ("Mismatch", {"kmer": 3, "mismatch": 2}),
    ("Moran", {"nlag": 4, "Di-DNA-Phychem": "Twist;Roll"}),
    ("TAC", {"nlag": 2, "Tri-DNA-Phychem": "Dnase I;Bendability (DNAse)"}),
    ("PCPseDNC", {"lambdaValue": 2, "weight": 0.1, "Di-DNA-Phychem": "Twist;Roll"}),
    ("DPCP type2", {"Di-DNA-Phychem": "Twist;Roll"}),
    ("TPCP type2", {"Tri-DNA-Phychem": "Dnase I"}),
]

VARIANTS = [
    ("CKSAAP type 1", {"kspace": 5}),
    ("EAAC", {"sliding_window": 3}),
    ("PAAC", {"lambdaValue": 5, "weight": 0.1}),
    ("QSOrder", {"nlag": 5, "weight": 0.1}),
    ("KSCTriad", {"kspace": 1}),
    ("PseKRAAC type 2", {"PseKRAAC_model": "lambda-correlation", "lambdaValue": 2,
                         "k-tuple": 2, "RAAC_clust": 8}),
    ("PseKRAAC type 5", {"PseKRAAC_model": "g-gap", "g-gap": 1, "k-tuple": 3,
                         "RAAC_clust": 15}),
    ("DistancePair", {"distance": 2, "cp": "cp(14)"}),
    ("DistancePair", {"distance": 1, "cp": "cp(19)"}),
    ("CKSAAGP type 1", {"kspace": 4}),
    ("KSCTriad", {"kspace": 2}),
    ("NMBroto", {"nlag": 5, "aaindex": "ANDN920101;ARGP820101"}),
    ("APAAC", {"lambdaValue": 4, "weight": 0.1}),
    ("SOCNumber", {"nlag": 5}),
    ("Moran", {"nlag": 4, "aaindex": "ANDN920101;BHAR880101"}),
    ("Geary", {"nlag": 5, "aaindex": "ANDN920101;ARGP820101;BEGF750101"}),
    ("EGAAC", {"sliding_window": 4}),
    ("AAIndex", {"aaindex": "ANDN920101;ARGP820102"}),
    ("CC", {"nlag": 2, "aaindex": "ANDN920101;ARGP820101"}),
]


def _slug(desc, params):
    flat = "_".join(f"{k}{v}" for k, v in sorted(params.items()))
    return f"pv__{desc}__{flat}".replace(" ", "_").replace("(", "").replace(")", "")


RNA_VARIANTS = [
    ("Kmer type 1", {"kmer": 4}),
    ("PseDNC", {"lambdaValue": 2, "weight": 0.1,
                "Di-RNA-Phychem": "Rise (RNA);Roll (RNA)"}),
    ("SCPseDNC", {"lambdaValue": 2, "weight": 0.05,
                  "Di-RNA-Phychem": "Rise (RNA);Roll (RNA);Shift (RNA)"}),
    ("NMBroto", {"nlag": 4,
                 "Di-RNA-Phychem": "Rise (RNA);Roll (RNA)"}),
    ("ENAC", {"sliding_window": 3}),
    ("PseKNC", {"kmer": 2, "lambdaValue": 2, "weight": 0.1,
                "Di-RNA-Phychem": "Rise (RNA);Roll (RNA)"}),
    ("DAC", {"nlag": 4, "Di-RNA-Phychem": "Rise (RNA);Roll (RNA)"}),
]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    ref = load_reference()
    for desc, params in RNA_VARIANTS:
        obj = ref.iRNA("/root/reference/data_examples/RNA_sequences.txt")
        obj.import_parameters("/root/reference/parameters/RNA_parameters_setting.json")
        for i, row in enumerate(obj.fasta_list):
            row[0] = f"{row[0]}#r{i}"
            row[2] = str(i % 2)
            row[3] = "training" if i % 5 != 4 else "testing"
        pd_ = getattr(obj, "_iRNA__default_para_dict")
        pd_.setdefault(desc, {})
        pd_[desc] = {**pd_[desc], **params}
        obj.encodings = None
        obj.error_msg = ""
        obj.get_descriptor(desc)
        if obj.encodings is None:
            print(f"  SKIP rna {desc} {params}: {obj.error_msg}")
            continue
        enc = obj.encodings
        feat = enc.to_numpy(dtype=np.float64)
        pd.DataFrame({"doc_id": enc.index.astype(str),
                      "features": list(map(list, feat))}).to_parquet(
            os.path.join(OUT, "rna_" + _slug(desc, params) + ".parquet"), index=False)
        print(f"  wrote rna {desc} {params} shape={enc.shape}")
    for desc, params in DNA_VARIANTS:
        obj = ref.iDNA("/root/reference/data_examples/DNA_sequences.txt")
        obj.import_parameters("/root/reference/parameters/DNA_parameters_setting.json")
        for i, row in enumerate(obj.fasta_list):
            row[2] = str(i % 2)
            row[3] = "training" if i % 5 != 4 else "testing"
        pd_ = getattr(obj, "_iDNA__default_para_dict")
        pd_.setdefault(desc, {})
        pd_[desc] = {**pd_[desc], **params}
        obj.encodings = None
        obj.error_msg = ""
        obj.get_descriptor(desc)
        if obj.encodings is None:
            print(f"  SKIP dna {desc} {params}: {obj.error_msg}")
            continue
        enc = obj.encodings
        feat = enc.to_numpy(dtype=np.float64)
        pd.DataFrame({"doc_id": enc.index.astype(str),
                      "features": list(map(list, feat))}).to_parquet(
            os.path.join(OUT, "dna_" + _slug(desc, params) + ".parquet"), index=False)
        print(f"  wrote dna {desc} {params} shape={enc.shape}")

    for desc, params in VARIANTS:
        obj = ref.iProtein("/root/reference/data_examples/peptide_sequences.txt")
        obj.import_parameters("/root/reference/parameters/Protein_parameters_setting.json")
        pd_ = getattr(obj, "_iProtein__default_para_dict")
        pd_.setdefault(desc, {})
        pd_[desc] = {**pd_[desc], **params}
        obj.encodings = None
        obj.error_msg = ""
        obj.get_descriptor(desc)
        if obj.encodings is None:
            print(f"  SKIP {desc} {params}: {obj.error_msg}")
            continue
        enc = obj.encodings
        feat = enc.to_numpy(dtype=np.float64)
        pd.DataFrame({"doc_id": enc.index.astype(str),
                      "features": list(map(list, feat))}).to_parquet(
            os.path.join(OUT, _slug(desc, params) + ".parquet"), index=False)
        print(f"  wrote {desc} {params} shape={enc.shape}")


if __name__ == "__main__":
    main()
