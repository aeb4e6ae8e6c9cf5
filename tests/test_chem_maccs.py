"""Hand-derived fixtures for the RDKit-free MACCS keys
(functions/chemdesc_maccs.py) — the 24th ligand family going real.

Every expected bit below is justified from the published key table by
hand (comments cite the key's SMARTS); molecules are written in
aromatic notation, where the engine's notation-carried aromaticity and
RDKit's perception agree.  Exact 167-bit parity vs
``MACCSkeys.GenMACCSKeys`` runs conditionally in
tests/test_chem_rdkit_parity.py on any RDKit box.
"""

from __future__ import annotations

import numpy as np

from ifeatureomega_cli_spark.functions.chemdesc_maccs import (
    MACCS_SMARTS, maccs_fingerprint)
from ifeatureomega_cli_spark.functions.molgraph import parse_smiles


def bits_on(smi: str) -> set[int]:
    v = maccs_fingerprint(parse_smiles(smi))
    assert v.shape == (167,)
    assert set(np.unique(v)) <= {0.0, 1.0}
    return {i for i, x in enumerate(v) if x}


def test_table_shape():
    # 166 keys; 1/125/166 are the code-handled specials
    assert set(MACCS_SMARTS) == set(range(1, 167))
    assert [k for k, (p, _) in MACCS_SMARTS.items() if p == "?"] == \
        [1, 125, 166]


def test_bit0_and_isotope_key_never_set():
    for smi in ("CCO", "c1ccccc1", "[13CH4]"):
        v = maccs_fingerprint(parse_smiles(smi))
        assert v[0] == 0.0 and v[1] == 0.0


def test_benzene_exact():
    # RDKit's published answer for benzene: aromatic (162), 6M ring
    # (163), ring (165) and nothing else
    assert bits_on("c1ccccc1") == {162, 163, 165}


def test_ethanol_exact():
    # each bit hand-derived on C0H3-C1H2-O2H:
    #  82 ACH2QH   *~[CH2]~[!#6;!#1;!H0]   C0~C1~O(H)
    # 109 ACH2O    *~[CH2]~[#8]            C0~C1~O
    # 114 CH3CH2A  [CH3]~[CH2]~*           C0~C1~O
    # 139 OH       [O;!H0]
    # 153 QCH2A    [!#6;!#1]~[CH2]~*       O~C1~C0
    # 155 A!CH2!A  *!@[CH2]!@*             no ring bonds
    # 157 C-O, 160 CH3, 164 O
    assert bits_on("CCO") == {82, 109, 114, 139, 153, 155, 157, 160, 164}


def test_methane_exact():
    # methane: only key 160 ([C;H3,H4] — H4 branch)
    assert bits_on("C") == {160}


def test_aspirin_exact():
    # CC(=O)Oc1ccccc1C(=O)O — all 21 bits hand-derived:
    #  89 OAAAO (O3~c4~c9~C10~O11)      113 Onot%A%A (O3!:c4:c5)
    # 123 OCO (O2~C1~O3)                126 A!O!A (C1!@O3!@c4)
    # 127 A$A!O>1 ({c5,c4,O3},{c9,c4,O3})
    # 136 O=A>1 (O2=C1, O11=C10)        139 OH (O12)
    # 140 O>3 (4 O)  143 A$A!O  144 Anot%A%Anot%A (O3!:c4:c9!:C10)
    # 146 O>2  150 A!A$A!A (O3!@c4@c9!@C10)
    # 152 OC(C)C (O3~c4(~c5)~c9)        154 C=O  157 C-O
    # 159 O>1  160 CH3 (C0)  162 aromatic  163 6M ring  164 O  165 ring
    assert bits_on("CC(=O)Oc1ccccc1C(=O)O") == {
        89, 113, 123, 126, 127, 136, 139, 140, 143, 144, 146, 150,
        152, 154, 157, 159, 160, 162, 163, 164, 165}


def test_count_thresholds():
    # 141 CH3>2 / 149 CH3>1: isobutane 3 methyls, propane 2, ethanol 1
    assert {141, 149} <= bits_on("CC(C)C")
    on = bits_on("CCC")
    assert 149 in on and 141 not in on
    on = bits_on("CCO")
    assert 149 not in on
    # 142 N>1 / 161 N: methylamine vs ethylenediamine
    on = bits_on("CN")
    assert 161 in on and 142 not in on
    assert {142, 161} <= bits_on("NCCN")
    # 136 O=A>1 needs two double-bonded O
    on = bits_on("CC(N)=O")
    assert 136 not in on and 154 in on
    assert 136 in bits_on("CC(=O)OC(C)=O")


def test_fragment_key_166():
    # dot-disconnected: sodium-acetate-style two fragments
    on = bits_on("CC(=O)[O-].[Na+]")
    assert 166 in on
    assert 49 in on        # [!+0] charge
    assert 35 in on        # group IA (Na)
    assert 166 not in bits_on("CCO")


def test_aromatic_ring_count_key_125():
    assert 125 not in bits_on("c1ccccc1")
    on = bits_on("c1ccc2ccccc2c1")        # naphthalene: 2 aromatic rings
    assert 125 in on
    assert 145 in on                      # 6M ring > 1
    on = bits_on("c1ccc(-c2ccccc2)cc1")   # biphenyl
    assert 125 in on


def test_heteroatom_and_charge_keys():
    # ammonium [NH4+]: N (161), NH (151), charge (49); NOT NH2 (84 is
    # an exact-H2 primitive)
    on = bits_on("[NH4+]")
    assert {49, 151, 161} <= on
    assert 84 not in on
    # aniline has the NH2
    assert 84 in bits_on("Nc1ccccc1")


def test_ring_size_keys():
    assert 22 in bits_on("C1CC1")                 # 3M ring
    assert 11 in bits_on("C1CCC1")                # 4M ring
    assert 96 in bits_on("C1CCCC1")               # 5M ring
    assert 19 in bits_on("C1CCCCCC1")             # 7M ring
    assert 101 in bits_on("C1CCCCCCC1")           # 8M+ ring
    # Q-heterocycles: QAA@1 (16) for aziridine, QAAAA@1 (83) for
    # pyrrolidine, S heterocycle (36) for thiolane
    assert 16 in bits_on("C1CN1")
    assert 83 in bits_on("C1CCNC1")
    assert 36 in bits_on("C1CCSC1")


def test_caffeine_spot_bits():
    # Kekulé-written caffeine (the reference corpus style for it):
    # 37 NC(O)N (N8~C10(=O11)~N12), 38 NC(C)N, 78 C=N, 85 CN(C)C,
    # 141 CH3>2 (three N-methyls), 142 N>1, 136 O=A>1
    on = bits_on("CN1C=NC2=C1C(=O)N(C)C(=O)N2C")
    assert {37, 38, 78, 85, 136, 141, 142, 161, 163, 165} <= on
    assert 166 not in on


def test_halogen_keys():
    on = bits_on("ClC(Cl)=C(Cl)Cl")
    assert {103, 134} <= on               # Cl, halogen
    assert 42 not in on                   # no F
    on = bits_on("FC(F)(F)c1ccccc1")
    assert {42, 134} <= on
    assert 27 in bits_on("ICI")           # I


def test_ligand_family_routes_real(spark):
    from ifeatureomega_cli_spark.operators.ligand import (
        descriptor_stub, family_width, ligand_descriptors)

    df = spark.createDataFrame(
        [(0, "CC(=O)Oc1ccccc1C(=O)O"), (1, "not)a(smiles")],
        "mol_id long, smiles string")
    out = (ligand_descriptors(df, "MACCS fingerprints")
           .orderBy("mol_id").toPandas())
    assert out["valid"].tolist() == [True, False]
    f = np.array(out.loc[0, "features"])
    assert len(f) == family_width("MACCS fingerprints") == 167
    expect = maccs_fingerprint(parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
    assert np.array_equal(f, expect)
    assert not np.allclose(
        f, descriptor_stub("CC(=O)Oc1ccccc1C(=O)O", "MACCS fingerprints"))
