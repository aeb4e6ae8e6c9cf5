"""Unit tests for the original SMARTS engine (functions/smarts.py).

Every expected count below is hand-derived on molecules small enough to
enumerate mentally; matches are RDKit-style uniquified (one report per
covered atom SET) unless the test says otherwise.  The engine exists to
evaluate the 166 MACCS keys (tests/test_chem_maccs.py) but is pinned
here as a general substructure matcher in its own right.
"""

from __future__ import annotations

import pytest

from ifeatureomega_cli_spark.functions.molgraph import parse_smiles
from ifeatureomega_cli_spark.functions.smarts import (
    count_substruct, has_substruct, parse_smarts, required_anums,
    substruct_matches)


def n(smi: str, smarts: str) -> int:
    return count_substruct(parse_smiles(smi), smarts)


# -- atom primitives ---------------------------------------------------


def test_element_and_aromatic_primitives():
    # lowercase = aromatic atom, uppercase organic symbol = aliphatic
    assert n("c1ccccc1", "c") == 6
    assert n("c1ccccc1", "C") == 0
    assert n("CCO", "C") == 2
    # '#n' ignores aromaticity
    assert n("c1ccccc1", "[#6]") == 6
    assert n("CCO", "[#6]") == 2
    # 'a'/'A' aromatic/aliphatic wildcards; '*' any
    assert n("Cc1ccccc1", "a") == 6
    assert n("Cc1ccccc1", "A") == 1
    assert n("Cc1ccccc1", "*") == 7
    # two-letter elements parse greedily inside brackets and as organic
    # subset symbols (Cl/Br)
    assert n("ClCBr", "Cl") == 1
    assert n("ClCBr", "Br") == 1
    assert n("ClCBr", "[Cl,Br]") == 2


def test_hydrogen_count_primitive():
    # toluene: one CH3, five aromatic CH
    assert n("Cc1ccccc1", "[CH3]") == 1
    assert n("Cc1ccccc1", "[cH1]") == 5
    assert n("CCO", "[CH2]") == 1
    assert n("CCO", "[CH3]") == 1
    # [O;!H0] = hydroxyl: ethanol yes, ester O of aspirin no
    assert n("CCO", "[O;!H0]") == 1
    assert n("CC(=O)Oc1ccccc1C(=O)O", "[O;!H0]") == 1


def test_degree_connectivity_valence():
    # ethanol C0H3-C1H2-O2H: explicit degrees 1,2,1
    assert n("CCO", "[D1]") == 2
    assert n("CCO", "[D2]") == 1
    # X = degree + implicit H
    assert n("CCO", "[X4]") == 2          # both carbons
    assert n("CCO", "[X2]") == 1          # the oxygen
    # v = sum of bond orders + H count
    assert n("C=O", "[v2]") == 1          # O of formaldehyde
    assert n("C=O", "[v4]") == 1          # the carbon
    assert n("CCO", "[v4]") == 2


def test_charge_and_isotope():
    assert n("CC(=O)[O-]", "[O-]") == 1
    assert n("CC(=O)[O-]", "[!+0]") == 1
    assert n("[NH4+]", "[+]") == 1
    assert n("CCO", "[!+0]") == 0
    assert n("[13CH4]", "[13C]") == 1
    assert n("[13CH4]", "[12C]") == 0


def test_ring_primitives():
    assert n("C1CCCCC1", "[R]") == 6
    assert n("Cc1ccccc1", "[R0]") == 1    # the methyl carbon
    assert n("c1ccccc1", "[r6]") == 6
    assert n("c1ccoc1", "[r5]") == 5
    assert n("c1ccoc1", "[r6]") == 0
    # fused naphthalene: every atom is in some 6-ring
    assert n("c1ccc2ccccc2c1", "[r6]") == 10


# -- bond primitives ---------------------------------------------------


def test_bond_orders():
    assert n("CC(N)=O", "C=O") == 1
    assert n("CC(N)=O", "C-N") == 1
    assert n("CC#N", "C#N") == 1
    assert n("CCO", "C-O") == 1
    # ':' aromatic bond; '~' any
    assert n("c1ccccc1", "c:c") == 6      # the 6 ring bonds
    assert n("c1ccccc1", "*~*") == 6
    # omitted bond = single-or-aromatic: 'CO' hits ethanol's C-O and
    # 'cc' hits benzene's aromatic bonds, but 'C=C' is not hit by 'CC'
    assert n("CCO", "CO") == 1
    assert n("c1ccccc1", "cc") == 6
    assert n("C=C", "CC") == 0
    assert n("C=C", "C~C") == 1


def test_ring_bond_primitive():
    assert n("C1CCCCC1", "*@*") == 6
    assert n("Cc1ccccc1", "[CH3]!@c") == 1
    # A$A!S-style: ring-atom pair with an exocyclic bond exists in
    # toluene, not in benzene
    assert has_substruct(parse_smiles("Cc1ccccc1"), "*@*!@*")
    assert not has_substruct(parse_smiles("c1ccccc1"), "*@*!@*")
    # biphenyl's bridge satisfies A$!A$A (ring-nonring-ring); fused
    # naphthalene has no non-ring bond at all
    assert has_substruct(parse_smiles("c1ccc(-c2ccccc2)cc1"), "*@*!@*@*")
    assert not has_substruct(parse_smiles("c1ccc2ccccc2c1"), "*@*!@*@*")


def test_negated_aromatic_bond():
    # *!:*:* — atom singly bonded to an atom on an aromatic bond:
    # toluene CH3!:c1, then c1:c2 or c1:c6 → 2 distinct atom sets
    assert n("Cc1ccccc1", "*!:*:*") == 2
    assert n("c1ccccc1", "*!:*:*") == 0


# -- logic -------------------------------------------------------------


def test_or_and_not_precedence():
    assert n("c1ccncc1", "[c,n]") == 6
    # ';' binds looser than ',': aromatic-(N-or-O) ∧ ring
    assert n("c1ccoc1", "[#7,#8;R]") == 1
    assert n("CC(N)=O", "[#7,#8;R]") == 0
    # Q = heteroatom
    assert n("CCO", "[!#6;!#1]") == 1
    assert n("CC(=O)Oc1ccccc1C(=O)O", "[!#6;!#1]") == 4
    # juxtaposition = high-precedence and
    assert n("Cc1ccccc1", "[cR]") == 6
    assert n("Cc1ccccc1", "[CR]") == 0


def test_recursive_smarts():
    # carbonyl carbon only
    assert n("CC(N)=O", "[$(C=O)]") == 1
    # atom that is a CH3 attached to a CH2
    assert n("CCO", "[$([CH3]~[CH2])]") == 1
    assert n("CC(C)C", "[$([CH3]~[CH2])]") == 0
    # recursive inside logic: carbon that is carbonyl OR bears the OH
    assert n("CC(=O)O", "[$(C=O),$(C[OH])]") == 1  # same atom, both ways
    assert n("OCC=O", "[$(C=O),$(CO)]") == 2


# -- ring closures, branches, uniquify ---------------------------------


def test_ring_closure_patterns():
    assert n("c1ccccc1", "*1~*~*~*~*~*~1") == 1      # one 6-atom set
    assert n("C1CCCCC1", "*1~*~*~*~*~*~1") == 1
    assert n("c1ccc2ccccc2c1", "*1~*~*~*~*~*~1") == 2  # two fused rings
    assert n("C1CC1", "*1~*~*1") == 1
    assert n("CCO", "*1~*~*1") == 0
    # %nn two-digit closure is the same ring bond
    assert n("C1CC1", "C%11CC%11") == 1


def test_branches():
    # isobutane: central carbon with three methyls — one atom set
    assert n("CC(C)C", "CC(C)C") == 1
    assert n("CC(C)C", "*~*(~*)~*") == 1
    assert n("CCO", "*~*(~*)~*") == 0
    # AA(A)(A)A needs a quaternary center
    assert n("CC(C)(C)C", "*~*(~*)(~*)~*") == 1
    assert n("CC(C)C", "*~*(~*)(~*)~*") == 0


def test_uniquify_vs_raw():
    mol = parse_smiles("c1ccccc1")
    # path of 3: 6 middle atoms × 2 directions raw, 6 consecutive sets
    assert len(substruct_matches(mol, "ccc", uniquify=False)) == 12
    assert len(substruct_matches(mol, "ccc")) == 6


def test_count_threshold_patterns():
    # the MACCS-style counted patterns: CH3 occurrences
    assert n("CC(C)C", "[C;H3,H4]") == 3
    assert n("CCC", "[C;H3,H4]") == 2
    assert n("C", "[C;H3,H4]") == 1       # methane is H4


# -- screens and errors ------------------------------------------------


def test_required_anums_screen():
    assert required_anums(parse_smarts("[#8]~[#7](~[#6])~[#6]")) == \
        [8, 7, 6, 6]
    assert required_anums(parse_smarts("[F,Cl,Br,I]")) == []
    assert required_anums(parse_smarts("[!#6;!#1]~[CH3]")) == [6]
    # negations never pin
    assert required_anums(parse_smarts("[!#7]")) == []


def test_parse_errors():
    from ifeatureomega_cli_spark.functions.smarts import SmartsError

    for bad in ("C(", "C1CC", "[C", "C)", ""):
        with pytest.raises(SmartsError):
            parse_smarts(bad)


# -- compiled path vs scalar reference ---------------------------------


def test_compiled_masks_match_scalar_reference():
    """Differential oracle: the int-bitmask compiled evaluation (the
    production matcher path, round 8) must agree bit-for-bit with the
    scalar precedence-ladder evaluators on every atom/bond expression
    of every MACCS pattern, over a panel spanning aromatics, charges,
    rings, chains and multi-fragment molecules."""
    from ifeatureomega_cli_spark.functions.chemdesc_maccs import MACCS_SMARTS
    from ifeatureomega_cli_spark.functions.smarts import (
        MolProps, _eval_atom, _eval_bond)

    panel = [
        "c1ccccc1", "CCO", "CC(=O)Oc1ccccc1C(=O)O", "C1CCNCC1",
        "O=[N+]([O-])c1ccc(Cl)cc1", "CSCC(N)C(=O)O", "ClC(Cl)(Cl)C",
        "O=S(=O)(N)c1ccc(N)cc1", "c1ccc2ccccc2c1", "CC(C)(C)C",
        "[Na+].[Cl-]", "C#N", "OCC1CCCCC1", "c1ccncc1",
    ]
    mols = [parse_smiles(s) for s in panel]
    patterns = sorted({p for p, _ in MACCS_SMARTS.values() if p != "?"})
    assert len(patterns) > 100
    for patt in patterns:
        q = parse_smarts(patt)
        for mol in mols:
            mp = MolProps(mol)
            for qi, (key, fn) in enumerate(q.atom_tests):
                bits = mp.aint(key, fn)
                want = [_eval_atom(mp, i, q.atom_exprs[qi])
                        for i in range(mp.n)]
                got = [(bits >> i) & 1 == 1 for i in range(mp.n)]
                assert got == want, (patt, qi, panel[mols.index(mol)])
            for bk, (key, fn) in enumerate(q.bond_tests):
                bits = mp.bint(key, fn)
                expr = q.bonds[bk][2]
                want = [_eval_bond(mp, k, expr)
                        for k in range(len(mp.border))]
                got = [(bits >> k) & 1 == 1
                       for k in range(len(mp.border))]
                assert got == want, (patt, bk)


def test_compiled_val_primitive_aromatic(pytestconfig=None):
    """ADVICE r8 (high): the compiled [v3]/[v4] masks must round the SUM of
    raw bond orders per atom, not each (possibly aromatic 1.5) order before
    summing — benzene carbons are v4 (ring 1.5+1.5 → 3, +1 H), pyridine N
    is v3; the MACCS table itself uses no v primitive, so this pins the
    bitmask path directly against the scalar ladder."""
    from ifeatureomega_cli_spark.functions.smarts import (
        MolProps, _eval_atom)

    for smi, patt, expect in [
        ("c1ccccc1", "[v4]", [True] * 6),    # benzene C: 3 + 1 H
        ("c1ccccc1", "[v3]", [False] * 6),
        ("c1ccncc1", "[v3]", [False, False, False, True, False, False]),
        ("CC=C", "[v4]", [True, True, True]),
    ]:
        q = parse_smarts(patt)
        mp = MolProps(parse_smiles(smi))
        key, fn = q.atom_tests[0]
        bits = mp.aint(key, fn)
        got = [(bits >> i) & 1 == 1 for i in range(mp.n)]
        scalar = [_eval_atom(mp, i, q.atom_exprs[0]) for i in range(mp.n)]
        assert got == scalar == expect, (smi, patt, got, scalar)
