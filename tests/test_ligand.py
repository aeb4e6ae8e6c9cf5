"""Ligand plumbing twin (ref iFeatureOmegaCLI.py:9788-9949): the Spark-side
pipeline — SMILES reader, 23-family registry, invalid-row skipping, Arrow
batch shape — is real and pinned here; the per-molecule chemistry runs the
documented deterministic stub because RDKit is absent."""

from __future__ import annotations

import numpy as np
import pytest


def test_family_registry_matches_reference_surface():
    from ifeatureomega_cli_spark.operators.ligand import (
        LIGAND_FAMILIES, family_width)

    # the reference's __default_para_dict has 24 families (:9812-9859;
    # often cited as '23' but the dict itself carries 24 keys)
    assert len(LIGAND_FAMILIES) == 24
    assert family_width("Kappa") == 7
    assert family_width("Constitution") == 29
    assert family_width("Autocorrelation-moran") == 32
    assert family_width("MACCS fingerprints") == 167
    assert family_width("Morgan-ECFP4 fingerprints") == 2048
    with pytest.raises(KeyError):
        family_width("NotAFamily")


def test_read_smiles_line_numbers(spark, tmp_path):
    from ifeatureomega_cli_spark.operators.ligand import read_smiles

    p = tmp_path / "mols.txt"
    p.write_text("CCO\nc1ccccc1\n\nCC(=O)O\n")
    out = (read_smiles(spark, str(p)).toPandas()
           .sort_values("mol_id").reset_index(drop=True))
    assert out["mol_id"].tolist() == [0, 1, 2]
    assert out["smiles"].tolist() == ["CCO", "c1ccccc1", "CC(=O)O"]


def test_ligand_descriptors_stub_pipeline(spark, tmp_path):
    from ifeatureomega_cli_spark.operators.ligand import (
        descriptor_stub, family_width, ligand_descriptors, read_smiles)

    p = tmp_path / "mols.txt"
    p.write_text("CCO\nC1CC1N\nnot a molecule!!\nCC(=O)O\n")
    mols = read_smiles(spark, str(p))
    out = (ligand_descriptors(mols, "Kappa").toPandas()
           .sort_values("mol_id").reset_index(drop=True))
    # every input row present; invalid row flagged, no features
    assert len(out) == 4
    assert out["valid"].tolist() == [True, True, False, True]
    assert out.loc[2, "features"] is None
    # stub is deterministic and family-width sized
    f = np.array(out.loc[0, "features"])
    assert len(f) == family_width("Kappa") == 7
    assert np.allclose(f, descriptor_stub("CCO", "Kappa"))
    # fingerprint family widths expand like the reference's fp+str(j)
    fp = (ligand_descriptors(mols.filter("mol_id = 0"),
                             "MACCS fingerprints").toPandas())
    assert len(fp.loc[0, "features"]) == 167
    with pytest.raises(KeyError):
        ligand_descriptors(mols, "NotAFamily")


def test_ligand_facade_routes_and_raises(spark, tmp_path):
    from ifeatureomega_cli_spark import structure_ligand as SL
    from ifeatureomega_cli_spark.operators.ligand import read_smiles

    p = tmp_path / "mols.txt"
    p.write_text("CCO\n")
    mols = read_smiles(spark, str(p))
    # without RDKit and without opting into the stub: honest error
    with pytest.raises(NotImplementedError):
        SL.ligand_descriptor(mols, "Kappa")
    # stub opt-in: full pipeline runs
    out = SL.ligand_descriptor(mols, "Kappa", allow_stub=True).toPandas()
    assert len(out) == 1 and out.loc[0, "valid"]


def test_smiles_validity_stub():
    from ifeatureomega_cli_spark.operators.ligand import smiles_valid_stub

    assert smiles_valid_stub("CC(=O)[O-].[Na+]")
    assert not smiles_valid_stub("")
    assert not smiles_valid_stub("CC(=O")        # unbalanced
    assert not smiles_valid_stub("CC)O(")        # close before open
    assert not smiles_valid_stub("hello world!")  # charset
