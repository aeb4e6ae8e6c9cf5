"""Conditional RDKit cross-check for the molecular-graph chemistry port
(skipped in this container — RDKit absent; runs automatically on any
cluster that has it).

Two layers:

1. graph parity — the pure-Python parser must agree with RDKit's
   MolFromSmiles on atom/bond counts, degrees, total hydrogens, SSSR
   ring count and the topological distance matrix;
2. formula parity — the reference's own chem/ formulas evaluated with
   RDKit primitives (transcribed here exactly as chem/topology.py,
   chem/connectivity.py and chem/kappa.py do) must match
   functions/chemdesc.py's outputs.

Known perception simplifications to watch if a coordinate ever
mismatches (documented in molgraph.py): hybridization for
lone-pair-conjugated aliphatic N/O (affects only HallKierAlpha → the
kappam/phi and Chiv columns), and Ipc/BertzCT, which transcribe RDKit's
published pure-Python formulations rather than reference-local code.
"""

from __future__ import annotations

import numpy as np
import pytest

rdkit = pytest.importorskip("rdkit")
from rdkit import Chem                                    # noqa: E402
from rdkit.Chem import AllChem, GraphDescriptors          # noqa: E402

from ifeatureomega_cli_spark.functions.chemdesc import (  # noqa: E402
    connectivity, constitution, kappa, topology)
from ifeatureomega_cli_spark.functions.molgraph import (  # noqa: E402
    parse_smiles)
from ifeatureomega_cli_spark.operators.ligand import (    # noqa: E402
    LIGAND_FAMILIES)

PANEL = [
    "CCO", "c1ccccc1", "CC(C)CC", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",
    "CC(=O)Oc1ccccc1C(=O)O", "c1ccc2ccccc2c1", "N[C@@H](C)C(=O)O",
    "O=[N+]([O-])c1ccccc1", "C1CCCCC1", "CC(C)(C)c1ccc(O)cc1",
    "ClC(Cl)=C(Cl)Cl", "C#CCO",
]


@pytest.mark.parametrize("smi", PANEL)
def test_graph_parity(smi):
    ours = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    assert ours.n_atoms == ref.GetNumAtoms()
    assert ours.n_bonds == ref.GetNumBonds()
    assert sorted(ours.degrees().tolist()) == \
        sorted(a.GetDegree() for a in ref.GetAtoms())
    assert int(ours.total_h().sum()) == \
        sum(a.GetTotalNumHs() for a in ref.GetAtoms())
    assert len(ours.sssr()) == Chem.GetSSSR(ref)
    ours_d = np.sort(ours.distance_matrix().sum(axis=1))
    ref_d = np.sort(np.array(Chem.GetDistanceMatrix(ref)).sum(axis=1))
    np.testing.assert_allclose(ours_d, ref_d)
    # path counts drive PC1-6 and the kappa shapes
    for n in range(1, 7):
        assert ours.count_bond_paths(n) == \
            len(Chem.FindAllPathsOfLengthN(ref, n)), n


@pytest.mark.parametrize("smi", PANEL)
def test_constitution_parity(smi):
    got = dict(zip(LIGAND_FAMILIES["Constitution"],
                   constitution(parse_smiles(smi))))
    ref = Chem.MolFromSmiles(smi)
    refh = Chem.AddHs(ref)
    assert got["nhyd"] == len(
        refh.GetSubstructMatches(Chem.MolFromSmarts("[H]")))
    assert got["nring"] == AllChem.CalcNumRings(ref)
    assert got["nrot"] == AllChem.CalcNumRotatableBonds(ref)
    assert got["ndonr"] == AllChem.CalcNumHBD(ref)
    assert got["naccr"] == AllChem.CalcNumHBA(ref)
    for name, smarts in (("ncarb", "C"), ("noxy", "O"), ("nnitro", "N"),
                         ("nsb", "[*]-[*]"), ("ndb", "[*]=[*]"),
                         ("naro", "[*]:[*]")):
        assert got[name] == len(
            ref.GetSubstructMatches(Chem.MolFromSmarts(smarts))), name
    from rdkit.Chem import Descriptors
    assert got["AWeight"] == pytest.approx(
        Descriptors.ExactMolWt(refh) / refh.GetNumAtoms(), abs=1e-4)


@pytest.mark.parametrize("smi", PANEL)
def test_topology_parity(smi):
    got = dict(zip(LIGAND_FAMILIES["Topology"], topology(parse_smiles(smi))))
    ref = Chem.MolFromSmiles(smi)
    D = np.array(Chem.GetDistanceMatrix(ref), "d")
    A = np.array(Chem.GetAdjacencyMatrix(ref), "d")
    n = ref.GetNumAtoms()
    deg = A.sum(axis=0)
    assert got["AW"] == pytest.approx(D.sum() / n / (n - 1) / 2)
    assert got["J"] == pytest.approx(GraphDescriptors.BalabanJ(ref),
                                     rel=1e-6)
    assert got["Thara"] == pytest.approx(0.5 * (1.0 / D[D != 0]).sum())
    assert got["Tsch"] == pytest.approx(((D + A) @ deg).sum())
    assert got["Platt"] == sum(
        b.GetBeginAtom().GetDegree() + b.GetEndAtom().GetDegree() - 2
        for b in ref.GetBonds())
    assert got["ZM1"] == (deg ** 2).sum()
    assert got["Ipc"] == pytest.approx(
        np.log10(GraphDescriptors.Ipc(ref)), rel=1e-6)
    assert got["BertzCT"] == pytest.approx(
        np.log10(GraphDescriptors.BertzCT(ref)), rel=1e-6)
    assert got["diametert"] == D.max()


@pytest.mark.parametrize("smi", PANEL)
def test_connectivity_and_kappa_parity(smi):
    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    x = dict(zip(LIGAND_FAMILIES["Connectivity"], connectivity(mol)))
    deltas = [a.GetDegree() for a in ref.GetAtoms() if a.GetDegree()]
    assert x["Chi0"] == pytest.approx(
        sum(np.sqrt(1.0 / np.array(deltas, "d"))))
    # path orders via the reference's own Chinp loop
    ds = [a.GetDegree() for a in ref.GetAtoms()]
    for order in (2, 3, 4):
        accum = 0.0
        for path in Chem.FindAllPathsOfLengthN(ref, order + 1, useBonds=0):
            p = 1.0
            for idx in path:
                p *= ds[idx]
            if p:
                accum += 1.0 / np.sqrt(p)
        assert x[f"Chi{order}"] == pytest.approx(accum), order
    # kappa via the reference's CalcKappa transcription on RDKit
    k = dict(zip(LIGAND_FAMILIES["Kappa"], kappa(mol)))
    for n_bond, name in ((1, "kappa1"), (2, "kappa2"), (3, "kappa3")):
        P = len(Chem.FindAllPathsOfLengthN(ref, n_bond))
        A_ = ref.GetNumHeavyAtoms() + 1 - n_bond
        denom = P
        if denom:
            if A_ % 2 == 1 and n_bond == 3:
                want = A_ * (A_ + 1) ** 2 / denom ** 2
            else:
                want = A_ * (A_ - 1) ** 2 / denom ** 2
        else:
            want = 0.0
        assert k[name] == round(want, 3), name
    # alpha variants: pin HallKierAlpha itself (the only perception-
    # sensitive ingredient)
    assert mol.hall_kier_alpha() == pytest.approx(
        GraphDescriptors.HallKierAlpha(ref)
        if hasattr(GraphDescriptors, "HallKierAlpha")
        else Chem.rdMolDescriptors.CalcHallKierAlpha(ref), abs=1e-6)


@pytest.mark.parametrize("smi", PANEL)
def test_estate_parity(smi):
    """E-state S values vs RDKit EStateIndices; atom typing vs RDKit's
    EState AtomTypes (the table chem/AtomTypes.py copies verbatim)."""
    from rdkit.Chem.EState import EStateIndices
    from rdkit.Chem.EState.AtomTypes import TypeAtoms

    from ifeatureomega_cli_spark.functions.chemdesc_ext import (
        _ESTATE_TYPES, estate_indices, estate_type_members)

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    np.testing.assert_allclose(estate_indices(mol), EStateIndices(ref),
                               rtol=1e-9)
    names = [t[0] for t in _ESTATE_TYPES]
    ours = [set() for _ in range(mol.n_atoms)]
    for ti, mem in enumerate(estate_type_members(mol)):
        for a in mem:
            ours[a].add(names[ti])
    theirs = [set(t) for t in TypeAtoms(ref)]
    assert ours == theirs


@pytest.mark.parametrize("smi", PANEL)
def test_autocorrelation_parity(smi):
    """ATS/MATS/GATS vs the reference formulas evaluated with RDKit
    primitives and the probed AtomProperty table."""
    from ifeatureomega_cli_spark.functions.chemdesc_ext import (
        _rel_prop, autocorrelation_broto, autocorrelation_geary,
        autocorrelation_moran)

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    D = np.array(Chem.GetDistanceMatrix(ref))
    p = np.array([_rel_prop(a.GetSymbol(), "m") for a in ref.GetAtoms()])
    n = ref.GetNumAtoms()
    got_b = autocorrelation_broto(mol)
    got_m = autocorrelation_moran(mol)
    got_g = autocorrelation_geary(mol)
    for lag in range(1, 9):
        mask = D == lag
        res = float((p[:, None] * p[None, :])[mask].sum())
        assert got_b[lag - 1] == pytest.approx(np.log(res / 2 + 1))
        dev = p - p.sum() / n
        ss = float((dev * dev).sum())
        idx = int(mask.sum())
        if ss and idx:
            resm = float((dev[:, None] * dev[None, :])[mask].sum())
            assert got_m[lag - 1] == pytest.approx((resm / idx) / (ss / n))
            diff = p[:, None] - p[None, :]
            resg = float((diff * diff)[mask].sum())
            assert got_g[lag - 1] == pytest.approx(
                (resg / idx / 2) / (ss / (n - 1)))


@pytest.mark.parametrize("smi", PANEL)
def test_basak_burden_graph_parity(smi):
    """The H-added graph matches RDKit AddHs (atom counts, bond orders,
    degree multiset) — the substrate Basak and Burden both consume."""
    from ifeatureomega_cli_spark.functions.chemdesc_ext import add_hydrogens

    h = add_hydrogens(parse_smiles(smi))
    refh = Chem.AddHs(Chem.MolFromSmiles(smi))
    assert h.n_atoms == refh.GetNumAtoms()
    assert h.n_bonds == refh.GetNumBonds()
    assert sorted(h.degrees().tolist()) == \
        sorted(a.GetDegree() for a in refh.GetAtoms())
    assert sorted(round(b.order, 1) for b in h.bonds) == \
        sorted(round(b.GetBondTypeAsDouble(), 1) for b in refh.GetBonds())


@pytest.mark.parametrize("smi", PANEL)
def test_cats_parity(smi):
    """CATS PPP typing vs the reference's own SMARTS + graph search, run
    through RDKit."""
    from ifeatureomega_cli_spark.functions.chemdesc_ext import (
        _cats_atom_types)

    PPP = {
        "D": ["[OH]", "[#7H,#7H2]"],
        "A": ["[O]", "[#7H0]"],
        "P": ["[*+]", "[#7H2]"],
        "N": ["[*-]", "[C&$(C(=O)O)]", "[P&$(P(=O)O)]", "[S&$(S(=O)O)]"],
        "L": ["[Cl,Br,I]", "[S;D2;$(S(C)(C))]"],
    }
    ref = Chem.MolFromSmiles(smi)
    want = {}
    for t, patts in PPP.items():
        idxs = []
        for p in patts:
            idxs.extend(m[0] for m in
                        ref.GetSubstructMatches(Chem.MolFromSmarts(p)))
        want[t] = idxs
    for atom in ref.GetAtoms():  # the graph-searched lipophilic C
        if atom.GetAtomicNum() == 6 and all(
                n.GetAtomicNum() == 6 for n in atom.GetNeighbors()):
            want["L"].append(atom.GetIdx())
    got = _cats_atom_types(parse_smiles(smi))
    for t in PPP:
        assert sorted(set(got[t])) == sorted(set(want[t])), (t, smi)


# round-7 panel for the numeric chem families: aromatic flags exactly as
# RDKit perceives them (no amide-N-in-lowercase-ring forms, where the
# as-written-aromaticity engine documented in molgraph.py deliberately
# differs from RDKit's perception)
PROPS_PANEL = [
    "CCO", "c1ccccc1", "Oc1ccccc1", "CC(=O)O", "CC(=O)Oc1ccccc1C(=O)O",
    "c1ccc2ccccc2c1", "O=[N+]([O-])c1ccccc1", "c1ccncc1", "C1CCCCC1",
    "Cc1ccccc1", "Nc1ccccc1", "CS(=O)C", "c1ccsc1", "c1ccoc1",
    "c1cc[nH]c1", "CCN(CC)CC", "NC(=O)N", "CC(=O)[O-]", "C[NH3+]",
    "FC(F)(F)c1ccccc1", "ClCCBr", "CC#N", "C=CC=C", "CSC",
]


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_crippen_parity(smi):
    """MolLogP / MolMR vs RDKit's Crippen — the Wildman-Crippen table
    transcription adjudicated end-to-end."""
    from rdkit.Chem import Crippen

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    from ifeatureomega_cli_spark.functions.chemdesc_props import (
        mol_logp, mol_mr)
    assert mol_logp(mol) == pytest.approx(Crippen.MolLogP(ref), abs=1e-3)
    assert mol_mr(mol) == pytest.approx(Crippen.MolMR(ref), abs=1e-3)


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_tpsa_parity(smi):
    from rdkit.Chem import MolSurf

    from ifeatureomega_cli_spark.functions.chemdesc_props import tpsa
    assert tpsa(parse_smiles(smi)) == pytest.approx(
        MolSurf.TPSA(Chem.MolFromSmiles(smi)), abs=1e-2)


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_labute_asa_parity(smi):
    """Labute ASA: formula is Labute 2000 / RDKit's published
    formulation; the radii table is the documented boundary
    (chemdesc_props._RB0 vs RDKit's internal single-bond radii).  A
    mismatch here means a radii-digit delta, not a formula error —
    check _RB0 against rdkit.Chem.GetPeriodicTable().GetRb0 first."""
    from rdkit.Chem import MolSurf

    from ifeatureomega_cli_spark.functions.chemdesc_props import (
        _RB0, labute_asa)
    tbl = Chem.GetPeriodicTable()
    for z, r in _RB0.items():
        assert r == pytest.approx(tbl.GetRb0(z), abs=5e-3), z
    assert labute_asa(parse_smiles(smi)) == pytest.approx(
        MolSurf.pyLabuteASA(Chem.MolFromSmiles(smi)), rel=1e-3)


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_hy_ui_parity(smi):
    """Hy / UI vs the reference's own chem/property.py functions run on
    RDKit mols (transcribed verbatim here, XOR quirk included)."""
    import math as _m

    from ifeatureomega_cli_spark.functions.chemdesc_props import (
        hydrophilicity_factor, unsaturation_index)

    ref = Chem.MolFromSmiles(smi)
    nd = sum(1 for b in ref.GetBonds() if b.GetBondType() == 2)
    nt = sum(1 for b in ref.GetBonds() if b.GetBondType() == 3)
    na = sum(1 for b in ref.GetBonds() if b.GetBondType() == 12)
    assert unsaturation_index(parse_smiles(smi)) == round(
        _m.log(1 + nd + nt + na, 2), 3)
    nheavy = ref.GetNumHeavyAtoms()
    if nheavy ^ 2 != 0:
        nc = sum(1 for a in ref.GetAtoms() if a.GetAtomicNum() == 6)
        want = round(0 + nc * (1.0 / nheavy * _m.log(1.0 / nheavy, 2))
                     + _m.sqrt(0.0 / (nheavy ^ 2)), 3)
        assert hydrophilicity_factor(parse_smiles(smi)) == want


# amide-free subset: Gasteiger modes follow hybridization, where the
# documented amide-N perception divergence (molgraph.py) would shift
# N's parameters — everything else must match RDKit to float precision
CHARGE_PANEL = [s for s in PROPS_PANEL if s not in ("NC(=O)N",)]


@pytest.mark.parametrize("smi", CHARGE_PANEL)
def test_gasteiger_parity(smi):
    """PEOE charges vs RDKit ComputeGasteigerCharges(AddHs(mol), 12) —
    the reference's exact call (chem/charge.py:16-17)."""
    from rdkit.Chem import rdPartialCharges

    from ifeatureomega_cli_spark.functions.chemdesc_charge import (
        _all_charges)

    ref = Chem.AddHs(Chem.MolFromSmiles(smi))
    rdPartialCharges.ComputeGasteigerCharges(ref, 12)
    want = sorted(float(a.GetProp("_GasteigerCharge"))
                  for a in ref.GetAtoms())
    qs, _ = _all_charges(parse_smiles(smi))
    np.testing.assert_allclose(sorted(qs), want, atol=1e-3)


@pytest.mark.parametrize("smi", CHARGE_PANEL)
def test_charge_family_parity(smi):
    """The 25 Charge coders vs the reference's own chem/charge.py
    aggregates evaluated over RDKit charges (quirks included: QO*/QC*
    label swap, max-numerator Rnc/Rpc)."""
    from rdkit.Chem import rdPartialCharges

    from ifeatureomega_cli_spark.functions.chemdesc_charge import (
        charge_descriptors)

    ref = Chem.AddHs(Chem.MolFromSmiles(smi))
    rdPartialCharges.ComputeGasteigerCharges(ref, 12)
    qs = np.array([float(a.GetProp("_GasteigerCharge"))
                   for a in ref.GetAtoms()])
    zs = np.array([a.GetAtomicNum() for a in ref.GetAtoms()])
    got = dict(zip(
        ["SPP", "LDI", "Rnc", "Rpc", "Mac", "Tac", "Mnc", "Tnc", "Mpc",
         "Tpc", "Qass", "QOss", "QNss", "QCss", "QHss", "Qmin", "QOmin",
         "QNmin", "QCmin", "QHmin", "Qmax", "QOmax", "QNmax", "QCmax",
         "QHmax"],
        charge_descriptors(parse_smiles(smi))))
    assert got["SPP"] == pytest.approx(
        round(qs.max() - qs.min(), 3), abs=2e-3)
    for name, z in (("QOss", 6), ("QNss", 7), ("QCss", 8), ("QHss", 1)):
        sel = qs[zs == z]
        want = float((sel ** 2).sum()) if sel.size else 0.0
        assert got[name] == pytest.approx(want, abs=1e-3), name
    assert got["Qass"] == pytest.approx(float((qs ** 2).sum()), abs=1e-3)
    assert got["Qmax"] == pytest.approx(qs.max(), abs=1e-3)
    assert got["Qmin"] == pytest.approx(qs.min(), abs=1e-3)


@pytest.mark.parametrize("smi", CHARGE_PANEL)
def test_moe_type_parity(smi):
    """Moe-Type P_VSA descriptors vs RDKit MolSurf/EState_VSA.  Shares
    the Labute-radii boundary of test_labute_asa_parity — check that one
    first on any mismatch here."""
    from rdkit.Chem import MolSurf
    from rdkit.Chem.EState import EState_VSA as EVSA

    from ifeatureomega_cli_spark.functions.chemdesc_props import moe_type

    ref = Chem.MolFromSmiles(smi)
    want = np.concatenate([
        [MolSurf.pyLabuteASA(ref), MolSurf.TPSA(ref)],
        MolSurf.SlogP_VSA_(ref), MolSurf.SMR_VSA_(ref),
        MolSurf.PEOE_VSA_(ref), EVSA.EState_VSA_(ref),
        EVSA.VSA_EState_(ref)])
    got = moe_type(parse_smiles(smi))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-2)


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_morgan_structure_parity(smi):
    """Morgan/ECFP structural parity at the documented hashing boundary
    (VERDICT r6 #3): (a) the atom partition induced by our connectivity
    invariants equals RDKit's GetConnectivityInvariants partition;
    (b) our distinct-environment count equals the unfolded
    GetMorganFingerprint id count (hash-independent; an exact-collision
    delta of 1 would indicate a 32-bit hash collision, not an algorithm
    divergence — investigate before relaxing)."""
    from rdkit.Chem import rdMolDescriptors

    from ifeatureomega_cli_spark.functions.chemdesc_fp import (
        connectivity_invariants, morgan_fingerprint)

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    ours = connectivity_invariants(mol)
    theirs = list(rdMolDescriptors.GetConnectivityInvariants(ref))

    def partition(vals):
        classes = {}
        for i, v in enumerate(vals):
            classes.setdefault(v, []).append(i)
        return sorted(sorted(c) for c in classes.values())

    assert partition(ours) == partition(theirs)
    for radius in (2, 3):
        n_ids = len(rdMolDescriptors.GetMorganFingerprint(
            ref, radius).GetNonzeroElements())
        n_envs = int(morgan_fingerprint(
            mol, radius, nbits=1 << 30).sum())
        assert n_envs == n_ids, radius


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_atom_pair_torsion_exact_parity(smi):
    """Atom pairs / torsions carry NO hash — the unfolded id multisets
    must match RDKit EXACTLY (the transcribed Carhart/Nilakantan bit
    packings: branch|π<<3|type<<5 atom codes; dist|min<<5|max<<14 pair
    ids; 4×9-bit low-order-first torsion ids).  If this ever goes red
    on an RDKit box, suspect the field ORDER inside the packed words
    first (chemdesc_fp2.py module docstring) — the multiset CARDINALITY
    matching while ids differ would confirm an order swap rather than
    an enumeration bug."""
    from rdkit.Chem.AtomPairs import Pairs, Torsions

    from ifeatureomega_cli_spark.functions.chemdesc_fp2 import (
        atom_pair_codes, torsion_codes)

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    want = dict(Pairs.GetAtomPairFingerprint(
        ref, maxLength=10).GetNonzeroElements())
    assert atom_pair_codes(mol) == want
    want_t = dict(Torsions.GetTopologicalTorsionFingerprint(
        ref).GetNonzeroElements())
    assert torsion_codes(mol) == want_t


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_daylight_subgraph_enumeration_parity(smi):
    """Daylight bit positions sit behind the documented hash boundary;
    what IS exactly RDKit-comparable is the subgraph ENUMERATOR: per-size
    connected-bond-subgraph counts equal FindAllSubgraphsOfLengthMToN
    (branched subgraphs, 1..7 bonds — the RDKFingerprint default
    universe)."""
    from ifeatureomega_cli_spark.functions.chemdesc_fp2 import (
        edge_subgraphs)

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    ours: dict[int, int] = {}
    for sub in edge_subgraphs(mol, 1, 7):
        ours[len(sub)] = ours.get(len(sub), 0) + 1
    theirs = {size: len(subs) for size, subs in zip(
        range(1, 8), Chem.FindAllSubgraphsOfLengthMToN(ref, 1, 7))
        if len(subs)}
    assert ours == theirs


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_smarts_matcher_parity(smi):
    """The original SMARTS engine vs RDKit's matcher, pattern-by-pattern
    over the MACCS table (the engine's reason to exist): uniquified
    match count must agree for every non-special key on the aromatic-
    notation panel.  A disagreement localises to one (pattern, molecule)
    pair — report includes both."""
    from ifeatureomega_cli_spark.functions.chemdesc_maccs import (
        MACCS_SMARTS)
    from ifeatureomega_cli_spark.functions.smarts import substruct_matches

    mol = parse_smiles(smi)
    ref = Chem.MolFromSmiles(smi)
    bad = []
    for key, (patt, _) in MACCS_SMARTS.items():
        if patt == "?":
            continue
        q = Chem.MolFromSmarts(patt)
        want = len(ref.GetSubstructMatches(q, uniquify=True))
        got = len(substruct_matches(mol, patt))
        if got != want:
            bad.append((key, patt, want, got))
    assert not bad, f"{smi}: {bad}"


@pytest.mark.parametrize("smi", PROPS_PANEL)
def test_maccs_exact_bit_parity(smi):
    """Full 167-bit MACCS vector vs MACCSkeys.GenMACCSKeys — the
    transcription of the key table AND the three code-handled specials
    (isotope / aromatic-ring-count / fragment-count) adjudicated
    bit-for-bit."""
    from rdkit.Chem import MACCSkeys

    from ifeatureomega_cli_spark.functions.chemdesc_maccs import (
        maccs_fingerprint)

    ours = maccs_fingerprint(parse_smiles(smi))
    theirs = MACCSkeys.GenMACCSKeys(Chem.MolFromSmiles(smi))
    want = np.zeros(167)
    for b in theirs.GetOnBits():
        want[b] = 1.0
    assert np.array_equal(ours, want), \
        f"{smi}: ours {np.flatnonzero(ours)} vs rdkit {np.flatnonzero(want)}"
