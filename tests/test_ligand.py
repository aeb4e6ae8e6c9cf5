"""Ligand plumbing twin (ref iFeatureOmegaCLI.py:9788-9949): the Spark-side
pipeline — SMILES reader, 24-family registry, invalid-row skipping, Arrow
batch shape — is real and pinned here.  As of round 7 twenty-three of the
24 families run REAL chemistry via the pure-Python molecular-graph port
(see test_chem_graph.py / test_chem_ext.py / test_chem_props.py /
test_chem_charge.py / test_chem_fp.py / test_chem_fp2.py /
test_chem_maccs.py); only the reference-dead hashed-Morgan entry
'Morgan fingerprints' runs the documented deterministic stub because
RDKit is absent."""

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
    # 'Morgan fingerprints' (the reference's dead hashed-Morgan entry)
    # still runs the stub; the other 23 families are real as of round 7
    # (MACCS included — see test_chem_maccs.py)
    out = (ligand_descriptors(mols, "Morgan fingerprints").toPandas()
           .sort_values("mol_id").reset_index(drop=True))
    # every input row present; invalid row flagged, no features
    assert len(out) == 4
    assert out["valid"].tolist() == [True, True, False, True]
    assert out.loc[2, "features"] is None
    # stub is deterministic and family-width sized (the reference's
    # fp+str(j) expansion width)
    f = np.array(out.loc[0, "features"])
    assert len(f) == family_width("Morgan fingerprints") == 2048
    assert np.allclose(f, descriptor_stub("CCO", "Morgan fingerprints"))
    # Charge went REAL in round 7: the same pipeline now returns
    # Gasteiger-derived values, not the stub
    ch = (ligand_descriptors(mols.filter("mol_id = 0"), "Charge")
          .toPandas())
    assert len(ch.loc[0, "features"]) == 25
    assert not np.allclose(ch.loc[0, "features"],
                           descriptor_stub("CCO", "Charge"))
    with pytest.raises(KeyError):
        ligand_descriptors(mols, "NotAFamily")


def test_ligand_facade_routes_and_raises(spark, tmp_path):
    from ifeatureomega_cli_spark import structure_ligand as SL
    from ifeatureomega_cli_spark.operators.ligand import read_smiles

    p = tmp_path / "mols.txt"
    p.write_text("CCO\n")
    mols = read_smiles(spark, str(p))
    # numeric family without RDKit and without the stub opt-in: honest
    # error; graph families route straight through (real since round 6)
    with pytest.raises(NotImplementedError):
        SL.ligand_descriptor(mols, "Morgan fingerprints")
    out = SL.ligand_descriptor(mols, "Morgan fingerprints",
                               allow_stub=True).toPandas()
    assert len(out) == 1 and out.loc[0, "valid"]
    real = SL.ligand_descriptor(mols, "Kappa").toPandas()  # no opt-in
    assert real.loc[0, "features"][0] == 3.0  # kappa1(CCO), hand value
    # Charge routes real since round 7 — no opt-in needed
    ch = SL.ligand_descriptor(mols, "Charge").toPandas()
    assert len(ch.loc[0, "features"]) == 25


def test_smiles_validity_stub():
    from ifeatureomega_cli_spark.operators.ligand import smiles_valid_stub

    assert smiles_valid_stub("CC(=O)[O-].[Na+]")
    assert not smiles_valid_stub("")
    assert not smiles_valid_stub("CC(=O")        # unbalanced
    assert not smiles_valid_stub("CC)O(")        # close before open
    assert not smiles_valid_stub("hello world!")  # charset


def test_rdkit_present_without_chem_port_fails_at_plan_time(spark, monkeypatch):
    """ADVICE r4: with RDKit importable but the chem/ coder port absent,
    ligand_descriptors must refuse at PLAN time — not defer a
    NotImplementedError into every executor task."""
    from ifeatureomega_cli_spark.operators import ligand

    monkeypatch.setattr(ligand, "_rdkit_or_none", lambda: object())
    df = spark.createDataFrame([(0, "CCO")], "mol_id long, smiles string")
    with pytest.raises(NotImplementedError, match="chem/ coder port"):
        ligand.ligand_descriptors(df, "Morgan fingerprints")
    # graph families never consult RDKit — they stay real under the fake
    out = ligand.ligand_descriptors(df, "Constitution").collect()
    assert out[0]["valid"] and len(out[0]["features"]) == 29


def test_rdkit_dispatch_with_wired_chem_port(spark, monkeypatch):
    """Structural coverage of the REAL-path dispatch: with RDKit faked and
    the chem port flagged wired, the pipeline must (a) call MolFromSmiles
    per row, (b) route valid mols through _rdkit_features, (c) mark parse
    failures invalid with null features — the exact wiring a real RDKit
    cluster exercises, minus the chemistry."""
    from ifeatureomega_cli_spark.operators import ligand

    w = ligand.family_width("Morgan fingerprints")

    class _FakeChem:
        @staticmethod
        def MolFromSmiles(s):
            return s if s and "INVALID" not in s else None

    monkeypatch.setattr(ligand, "_rdkit_or_none", lambda: _FakeChem)
    monkeypatch.setattr(ligand, "HAVE_CHEM_PORT", True)
    monkeypatch.setattr(ligand, "_rdkit_features",
                        lambda mol, family: [float(len(mol))] * ligand.family_width(family))
    df = spark.createDataFrame(
        [(0, "CCO"), (1, "INVALID"), (2, "c1ccccc1")],
        "mol_id long, smiles string")
    out = (ligand.ligand_descriptors(df, "Morgan fingerprints")
           .orderBy("mol_id").collect())
    assert [r["valid"] for r in out] == [True, False, True]
    assert out[1]["features"] is None
    assert len(out[0]["features"]) == w == 2048
    assert out[2]["features"] == [8.0] * w


def test_rdkit_real_path_schema_and_widths(spark):
    """Runs ONLY where RDKit is installed (skipped in this container):
    every scalar family must produce features matching the registry width
    for a parseable molecule, and garbage must be skipped — instant numeric
    parity coverage on a real cluster (ref iFeatureOmegaCLI.py:9812-9859).
    While the chem/ port is unbundled (HAVE_CHEM_PORT False) the documented
    plan-time refusal is asserted instead."""
    pytest.importorskip("rdkit")
    from ifeatureomega_cli_spark.operators import ligand

    df = spark.createDataFrame(
        [(0, "CCO"), (1, "not)a(smiles")], "mol_id long, smiles string")
    if not ligand.HAVE_CHEM_PORT:
        with pytest.raises(NotImplementedError, match="chem/ coder port"):
            ligand.ligand_descriptors(df, "Morgan fingerprints")
        # graph families are real regardless of the port flag
        out = (ligand.ligand_descriptors(df, "Constitution")
               .orderBy("mol_id").collect())
        assert out[0]["valid"] and len(out[0]["features"]) == 29
        assert not out[1]["valid"]
        return
    for family in ("Constitution", "Topology", "Kappa", "EState",
                   "Charge", "MACCS fingerprints",
                   "Morgan-ECFP4 fingerprints"):
        out = (ligand.ligand_descriptors(df, family)
               .orderBy("mol_id").collect())
        assert out[0]["valid"] and len(out[0]["features"]) == \
            ligand.family_width(family)
        assert not out[1]["valid"] and out[1]["features"] is None
