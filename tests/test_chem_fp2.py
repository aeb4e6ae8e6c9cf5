"""Fixtures for the round-7 atom-pair / topological-torsion / Daylight
fingerprints (functions/chemdesc_fp2.py).

Atom-pair and torsion ids are the PUBLISHED deterministic bit packing
(no hash) — every fixture id below is derived by hand from the Carhart
triple (branch | π<<3 | typeIdx<<5) and the pair/torsion layouts; exact
unfolded-id parity vs RDKit lives conditionally in
tests/test_chem_rdkit_parity.py.  Daylight bit positions are behind the
documented hash boundary; these tests pin the subgraph ENUMERATION
(ESU counts, per-size splits) and canonical-form behavior.
"""

from __future__ import annotations

import collections

import numpy as np

from ifeatureomega_cli_spark.functions.chemdesc_fp2 import (
    atom_code, atom_pair_codes, atom_pair_fingerprint, daylight_fingerprint,
    daylight_forms, edge_subgraphs, torsion_codes, torsion_fingerprint)
from ifeatureomega_cli_spark.functions.molgraph import parse_smiles


def _codes(smi):
    m = parse_smiles(smi)
    nbr = m._neighbors()
    return m, nbr


# -- atom codes (hand-derived Carhart triples) -------------------------


def test_atom_codes_hand():
    m, nbr = _codes("CCC")
    # terminal C: branch 1, π 0, type C=1 → 1 | 1<<5 = 33; middle: 34
    assert [atom_code(m, nbr, i) for i in range(3)] == [33, 34, 33]
    m, nbr = _codes("c1ccccc1")
    # aromatic C: branch 2, π 1, type 1 → 2 | 8 | 32 = 42
    assert [atom_code(m, nbr, i) for i in range(6)] == [42] * 6
    m, nbr = _codes("CCO")
    # O terminal: branch 1, π 0, type O=3 → 1 | 3<<5 = 97
    assert atom_code(m, nbr, 2) == 97
    # branch_subtract (torsion path ends/middles) clamps at 0
    assert atom_code(m, nbr, 0, branch_subtract=2) == 32
    m, nbr = _codes("C=C")
    # sp2 C: branch 1, π 1 → 1 | 8 | 32 = 41
    assert [atom_code(m, nbr, i) for i in range(2)] == [41, 41]
    m, nbr = _codes("C#N")
    # nitrile N: branch 1, π 2, type N=2 → 1 | 2<<3 | 2<<5 = 81
    assert atom_code(m, nbr, 1) == 81


def test_atom_pair_ids_hand():
    # propane: (33,34,d1)×2 → 1|33<<5|34<<14 = 558113;
    # (33,33,d2) → 2|33<<5|33<<14 = 541730
    assert atom_pair_codes(parse_smiles("CCC")) == {558113: 2, 541730: 1}
    # benzene: one code 42; d | 42<<5 | 42<<14 = 689472+d; 6/6/3 pairs
    assert atom_pair_codes(parse_smiles("c1ccccc1")) == {
        689473: 6, 689474: 6, 689475: 3}
    # ethanol: C-C, C-O (d1), C..O (d2)
    assert atom_pair_codes(parse_smiles("CCO")) == {
        558113: 1, 1590337: 1, 1590306: 1}


def test_atom_pair_distance_cap_and_components():
    # maxLength=10 (the reference's chem/fingerprint.py:118 call)
    chain = "C" * 13  # ends are 12 bonds apart
    codes = atom_pair_codes(parse_smiles(chain))
    n_pairs = sum(codes.values())
    # pairs at distance ≤ 10 in a 13-chain: sum_{d=1..10} (13-d) = 75
    assert n_pairs == 75
    # disconnected components contribute no cross-component pairs
    assert sum(atom_pair_codes(parse_smiles("CC.CC")).values()) == 2


def test_atom_pair_fold():
    # 558113 % 2048 = 1057, 541730 % 2048 = 1058; counts survive the fold
    fp = atom_pair_fingerprint(parse_smiles("CCC"))
    assert fp.shape == (2048,)
    assert fp[1057] == 2.0 and fp[1058] == 1.0 and fp.sum() == 3.0


def test_torsion_ids_hand():
    # butane: all codes 32 (ends 1-1=0 branch, middles 2-2=0) →
    # 32·(1 + 2^9 + 2^18 + 2^27) = 4303372320
    assert torsion_codes(parse_smiles("CCCC")) == {4303372320: 1}
    # benzene: 6 paths, codes (41,40,40,41) →
    # 41 + 40<<9 + 40<<18 + 41<<27 = 5513433129
    assert torsion_codes(parse_smiles("c1ccccc1")) == {5513433129: 6}
    # cyclohexane: codes (33,32,32,33) → 4437590049, 6 paths
    assert torsion_codes(parse_smiles("C1CCCCC1")) == {4437590049: 6}
    # < 4 atoms → no torsions
    assert torsion_codes(parse_smiles("CCC")) == {}


def test_torsion_canonical_direction():
    # 1-propanol written in both directions gives identical ids
    assert torsion_codes(parse_smiles("CCCO")) == \
        torsion_codes(parse_smiles("OCCC"))


def test_torsion_path_count():
    # 2-methylbutane CC(C)CC: undirected 4-paths = 3
    # (C1-C2-C4-C5, C3-C2-C4-C5, C1-C2-C3 is only 3 atoms... paths:
    #  me1-C2-C4-C5, me3-C2-C4-C5, me1-C2-C3? C3 is a methyl: me1-C2-me3
    #  is 3 atoms — exactly the two 4-paths through the backbone plus
    #  none others... plus me1-C2-me3 extended? no 4th atom) → 2
    assert sum(torsion_codes(parse_smiles("CC(C)CC")).values()) == 2
    fp = torsion_fingerprint(parse_smiles("CC(C)CC"))
    assert fp.sum() == 2.0 and fp.shape == (2048,)


# -- Daylight subgraph enumeration + forms -----------------------------


def test_esu_counts():
    # K3 (cyclopropane): connected edge subsets = 3+3+1
    subs = edge_subgraphs(parse_smiles("C1CC1"))
    assert sorted(collections.Counter(len(s) for s in subs).items()) == \
        [(1, 3), (2, 3), (3, 1)]
    # 6-cycle: connected edge subsets of size k<6 are the 6 arcs, size 6
    # the full cycle
    subs = edge_subgraphs(parse_smiles("C1CCCCC1"))
    assert sorted(collections.Counter(len(s) for s in subs).items()) == \
        [(1, 6), (2, 6), (3, 6), (4, 6), (5, 6), (6, 1)]
    # path of 2 bonds: 2 singles + 1 pair; no duplicates anywhere
    subs = edge_subgraphs(parse_smiles("CCC"))
    assert sorted(subs) == [(0,), (0, 1), (1,)]
    # star (neopentane): 4 singles, C(4,2)=6 pairs, 4 triples, 1 quad
    subs = edge_subgraphs(parse_smiles("CC(C)(C)C"))
    assert sorted(collections.Counter(len(s) for s in subs).items()) == \
        [(1, 4), (2, 6), (3, 4), (4, 1)]


def test_esu_respects_bounds():
    subs = edge_subgraphs(parse_smiles("C1CCCCC1"), min_bonds=2,
                          max_bonds=3)
    assert sorted(collections.Counter(len(s) for s in subs).items()) == \
        [(2, 6), (3, 6)]


def test_daylight_forms():
    # benzene: all arcs of a given length are equivalent → exactly one
    # canonical form per size 1..6
    assert len(daylight_forms(parse_smiles("c1ccccc1"))) == 6
    # propane: both bonds equivalent → 1 form at size 1, 1 at size 2
    assert len(daylight_forms(parse_smiles("CCC"))) == 2
    # ethanol: C-C ≠ C-O → 2 single-bond forms + the pair = 3
    assert len(daylight_forms(parse_smiles("CCO"))) == 3
    # WL refinement separates topology with identical descriptor
    # multisets: n-hexane path vs 2,3-dimethylbutane... simplest check:
    # linear C4 vs star C4 (isobutane) single forms differ at size 3
    lin = daylight_forms(parse_smiles("CCCC"), 3, 3)
    star = daylight_forms(parse_smiles("CC(C)C"), 3, 3)
    assert lin != star


def test_daylight_fingerprint_shape_and_density():
    fp = daylight_fingerprint(parse_smiles("c1ccccc1"))
    assert fp.shape == (2048,)
    # 6 forms × 2 bits/hash, minus collisions
    assert 6 <= int(fp.sum()) <= 12
    assert set(np.unique(fp)) <= {0.0, 1.0}
    # deterministic
    assert (fp == daylight_fingerprint(parse_smiles("c1ccccc1"))).all()


def test_fp2_family_registration():
    from ifeatureomega_cli_spark.functions.chemdesc_fp2 import FP2_FAMILIES
    from ifeatureomega_cli_spark.operators.ligand import (
        GRAPH_FAMILY_NAMES, family_width)

    for fam in ("Atom pairs fingerprints", "TopologicalTorsion fingerprints",
                "Daylight-type fingerprints"):
        assert fam in GRAPH_FAMILY_NAMES
        assert fam in FP2_FAMILIES
        assert family_width(fam) == 2048
        out = FP2_FAMILIES[fam](parse_smiles("CC(=O)Oc1ccccc1C(=O)O"))
        assert out.shape == (2048,)
        assert np.isfinite(out).all() and out.sum() > 0


def test_fp2_panel_consistency():
    """Folded mass equals unfolded mass; caffeine sanity."""
    panel = ["CCO", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
             "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1",
             "O=[N+]([O-])c1ccccc1"]
    for smi in panel:
        m = parse_smiles(smi)
        ap = atom_pair_codes(m)
        assert atom_pair_fingerprint(m).sum() == sum(ap.values())
        tc = torsion_codes(m)
        assert torsion_fingerprint(m).sum() == sum(tc.values())
        # every unfolded id fits its documented bit budget
        assert all(0 <= i < (1 << 23) for i in ap)
        assert all(0 <= i < (1 << 36) for i in tc)
