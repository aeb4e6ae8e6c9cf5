"""Round-6b graph-computable ligand families: E-state, autocorrelations,
Basak, Burden, E-state fingerprints — RDKit-free.

Like functions/chemdesc.py (Constitution/Topology/Connectivity/Kappa),
every formula here is a function of the molecular graph plus ONE
published per-element property table (chem/AtomProperty.py, probed into
resources/atom_property.json by tools/make_lookups.py --atomprop — the
repo's probe-not-transcribe lookup policy):

* ``Autocorrelation-broto/moran/geary`` (ref chem/autocor.py): Moreau-
  Broto / Moran / Geary autocorrelation of the relative-to-carbon atomic
  property (m, V, En, alpha) over topological distance lags 1-8 — pure
  distance-matrix sums, quirks preserved (Broto's ``log(res/2+1)``,
  Geary's ``/ (N−1)`` sample variance against Moran's ``/ N``).
* ``EState`` (ref chem/estate.py): Kier-Hall electrotopological states
  S = I + Σ (I_i − I_j)/(d+1)² with I = (4/N²·δv + 1)/δ; the family's
  ``value``/``max``/``min`` coders resolve the 79 Hall-Kier atom types.
  The reference types atoms with the RDKit E-state SMARTS table
  (chem/AtomTypes.py, a verbatim copy of RDKit's, ref :14-111); each of
  those 79 patterns constrains only the central atom's element,
  aromaticity, heavy degree, total H count and the multiset of its bond
  kinds (plus terminal-oxygen neighbors for the nitro/sulfone ``# mod``
  entries) — `_ESTATE_TYPES` encodes exactly those conditions, so no
  SMARTS engine is needed.  Elements outside the parser's table (Ge, Sn,
  Pb, Be) never reach classification — their SMILES fail to parse.
* ``Basak`` (ref chem/basak.py): neighborhood information content over
  the H-added graph — atom equivalence classes from sorted
  atomic-number path profiles, Shannon entropy of class sizes.
* ``Burden`` (ref chem/burden.py): eigenvalue spectrum of the H-added
  adjacency matrix with property diagonal and √bond-order off-diagonal,
  0.001 elsewhere — float32, with the reference's round(...,3) quirks.
* ``E-state fingerprints`` (ref chem/estate.py:188-205): the 79
  per-type atom counts (RDKit ESFP.FingerprintMol[0]).

Conditional RDKit parity: tests/test_chem_rdkit_parity.py (skipped where
RDKit is absent).
"""

from __future__ import annotations

import json
import math
from functools import lru_cache

import numpy as np

from ifeatureomega_cli_spark.functions.molgraph import (
    _OUTER_ELECS, Atom, Bond, MolGraph)


@lru_cache(maxsize=1)
def _atom_property() -> dict:
    from importlib import resources as ir

    ref = ir.files("ifeatureomega_cli_spark.resources") / "atom_property.json"
    return json.loads(ref.read_text())


def _rel_prop(symbol: str, tag: str) -> float:
    """GetRelativeAtomicProperty (ref chem/AtomProperty.py:73-80):
    property / carbon's property."""
    table = _atom_property()
    try:
        return table[symbol][tag] / table["C"][tag]
    except KeyError as exc:
        raise ValueError(
            f"element {symbol!r} has no {tag!r} entry in the probed "
            "AtomProperty table — the reference would KeyError on the "
            "same molecule") from exc


# -------------------------------------------------------------------------
# autocorrelations (ref chem/autocor.py)
# -------------------------------------------------------------------------

_AC_TAGS = ("m", "V", "En", "alpha")  # family order: ATSm*, ATSv*, ATSe*, ATSp*


def _autocorr_family(mol: MolGraph, kind: str) -> np.ndarray:
    """32 values: 4 property tags × lags 1..8, reference coder order
    (chem/__init__.py:14-111)."""
    D = mol.distance_matrix()
    n = mol.n_atoms
    out = []
    for tag in _AC_TAGS:
        p = np.array([_rel_prop(a.symbol, tag) for a in mol.atoms])
        mean = p.sum() / n
        dev = p - mean
        ss = float((dev * dev).sum())
        for lag in range(1, 9):
            mask = D == lag  # ordered pairs, both directions — as the
            # reference's full i,j double loop counts them
            if kind == "broto":
                res = float((p[:, None] * p[None, :])[mask].sum())
                out.append(math.log(res / 2 + 1))
            else:
                idx = int(mask.sum())
                if ss == 0 or idx == 0:
                    out.append(0.0)
                elif kind == "moran":
                    res = float((dev[:, None] * dev[None, :])[mask].sum())
                    out.append((res / idx) / (ss / n))
                else:  # geary
                    diff = p[:, None] - p[None, :]
                    res = float((diff * diff)[mask].sum())
                    out.append((res / idx / 2) / (ss / (n - 1)))
    return np.array(out, dtype=np.float64)


def autocorrelation_broto(mol: MolGraph) -> np.ndarray:
    return _autocorr_family(mol, "broto")


def autocorrelation_moran(mol: MolGraph) -> np.ndarray:
    return _autocorr_family(mol, "moran")


def autocorrelation_geary(mol: MolGraph) -> np.ndarray:
    return _autocorr_family(mol, "geary")


# -------------------------------------------------------------------------
# E-state (ref chem/estate.py)
# -------------------------------------------------------------------------

def estate_indices(mol: MolGraph) -> np.ndarray:
    """Per-heavy-atom Kier-Hall S values (ref chem/estate.py:9-42,
    identical to RDKit EStateIndices): I = (4/N²·δv + 1)/δ, perturbation
    Σ (I_i − I_j)/(d_ij + 1)²."""
    n = mol.n_atoms
    deg = mol.degrees()
    pqn = mol.principal_quantum_numbers()
    I = np.zeros(n, dtype=np.float64)
    for i, at in enumerate(mol.atoms):
        if deg[i] > 0:
            dv = _OUTER_ELECS[at.atomic_num] - at.h_count
            I[i] = (4.0 / (pqn[i] * pqn[i]) * dv + 1) / deg[i]
    d = mol.distance_matrix() + 1
    accum = np.zeros(n, dtype=np.float64)
    for i in range(n):
        for j in range(i + 1, n):
            p = d[i, j]
            if p < 1e6:
                t = (I[i] - I[j]) / (p * p)
                accum[i] += t
                accum[j] -= t
    return accum + I


# the 79 Hall-Kier E-state atom types, reference order (chem/AtomTypes.py
# _rawD).  Each row: (name, symbol, aromatic-allowed, degree, total-H or
# None, bond-kind counts {s,d,t,a} or a special matcher tag).
_N = None
_ESTATE_TYPES = [
    ("sLi", "Li", False, 1, _N, {"s": 1}),
    ("ssBe", "Be", False, 2, _N, {"s": 2}),
    ("ssssBe", "Be", False, 4, _N, {"s": 4}),
    ("ssBH", "B", False, 2, 1, {"s": 2}),
    ("sssB", "B", False, 3, _N, {"s": 3}),
    ("ssssB", "B", False, 4, _N, {"s": 4}),
    ("sCH3", "C", False, 1, 3, {"s": 1}),
    ("dCH2", "C", False, 1, 2, {"d": 1}),
    ("ssCH2", "C", False, 2, 2, {"s": 2}),
    ("tCH", "C", False, 1, 1, {"t": 1}),
    ("dsCH", "C", False, 2, 1, {"d": 1, "s": 1}),
    ("aaCH", "C", True, 2, 1, {"a": 2}),
    ("sssCH", "C", False, 3, 1, {"s": 3}),
    ("ddC", "C", False, 2, 0, {"d": 2}),
    ("tsC", "C", False, 2, 0, {"t": 1, "s": 1}),
    ("dssC", "C", False, 3, 0, {"d": 1, "s": 2}),
    ("aasC", "C", True, 3, 0, {"a": 2, "s": 1}),
    ("aaaC", "C", True, 3, 0, {"a": 3}),
    ("ssssC", "C", False, 4, 0, {"s": 4}),
    ("sNH3", "N", False, 1, 3, {"s": 1}),
    ("sNH2", "N", False, 1, 2, {"s": 1}),
    ("ssNH2", "N", False, 2, 2, {"s": 2}),
    ("dNH", "N", False, 1, 1, {"d": 1}),
    ("ssNH", "N", False, 2, 1, {"s": 2}),
    ("aaNH", "N", True, 2, 1, {"a": 2}),
    ("tN", "N", False, 1, 0, {"t": 1}),
    ("sssNH", "N", False, 3, 1, {"s": 3}),
    ("dsN", "N", False, 2, 0, {"d": 1, "s": 1}),
    ("aaN", "N", True, 2, 0, {"a": 2}),
    ("sssN", "N", False, 3, 0, {"s": 3}),
    ("ddsN", "N", False, 3, 0, "nitro"),       # [ND3H0](~[OD1H0])(~[OD1H0])-,:*
    ("aasN", "N", True, 3, 0, "aas"),          # (:*)(:*)-,:*
    ("ssssN", "N", False, 4, 0, {"s": 4}),
    ("sOH", "O", False, 1, 1, {"s": 1}),
    ("dO", "O", False, 1, 0, {"d": 1}),
    ("ssO", "O", False, 2, 0, {"s": 2}),
    ("aaO", "O", True, 2, 0, {"a": 2}),
    ("sF", "F", False, 1, _N, {"s": 1}),
    ("sSiH3", "Si", False, 1, 3, {"s": 1}),
    ("ssSiH2", "Si", False, 2, 2, {"s": 2}),
    ("sssSiH", "Si", False, 3, 1, {"s": 3}),
    ("ssssSi", "Si", False, 4, 0, {"s": 4}),
    ("sPH2", "P", False, 1, 2, {"s": 1}),
    ("ssPH", "P", False, 2, 1, {"s": 2}),
    ("sssP", "P", False, 3, 0, {"s": 3}),
    ("dsssP", "P", False, 4, 0, {"d": 1, "s": 3}),
    ("sssssP", "P", False, 5, 0, {"s": 5}),
    ("sSH", "S", False, 1, 1, {"s": 1}),
    ("dS", "S", False, 1, 0, {"d": 1}),
    ("ssS", "S", False, 2, 0, {"s": 2}),
    ("aaS", "S", True, 2, 0, {"a": 2}),
    ("dssS", "S", False, 3, 0, {"d": 1, "s": 2}),
    ("ddssS", "S", False, 4, 0, "sulfone"),    # (~[OD1H0])(~[OD1H0])(-*)-*
    ("sCl", "Cl", False, 1, _N, {"s": 1}),
    ("sGeH3", "Ge", False, 1, 3, {"s": 1}),
    ("ssGeH2", "Ge", False, 2, 2, {"s": 2}),
    ("sssGeH", "Ge", False, 3, 1, {"s": 3}),
    ("ssssGe", "Ge", False, 4, 0, {"s": 4}),
    ("sAsH2", "As", False, 1, 2, {"s": 1}),
    ("ssAsH", "As", False, 2, 1, {"s": 2}),
    ("sssAs", "As", False, 3, 0, {"s": 3}),
    ("sssdAs", "As", False, 4, 0, {"d": 1, "s": 3}),
    ("sssssAs", "As", False, 5, 0, {"s": 5}),
    ("sSeH", "Se", False, 1, 1, {"s": 1}),
    ("dSe", "Se", False, 1, 0, {"d": 1}),
    ("ssSe", "Se", False, 2, 0, {"s": 2}),
    ("aaSe", "Se", True, 2, 0, {"a": 2}),
    ("dssSe", "Se", False, 3, 0, {"d": 1, "s": 2}),
    ("ddssSe", "Se", False, 4, 0, {"d": 2, "s": 2}),
    ("sBr", "Br", False, 1, _N, {"s": 1}),
    ("sSnH3", "Sn", False, 1, 3, {"s": 1}),
    ("ssSnH2", "Sn", False, 2, 2, {"s": 2}),
    ("sssSnH", "Sn", False, 3, 1, {"s": 3}),
    ("ssssSn", "Sn", False, 4, 0, {"s": 4}),
    ("sI", "I", False, 1, _N, {"s": 1}),
    ("sPbH3", "Pb", False, 1, 3, {"s": 1}),
    ("ssPbH2", "Pb", False, 2, 2, {"s": 2}),
    ("sssPbH", "Pb", False, 3, 1, {"s": 3}),
    ("ssssPb", "Pb", False, 4, 0, {"s": 4}),
]
N_ESTATE_TYPES = len(_ESTATE_TYPES)
assert N_ESTATE_TYPES == 79


def _bond_kind(order: float) -> str:
    if order == 1.5:
        return "a"
    if order == 2.0:
        return "d"
    if order >= 3.0:
        return "t"
    return "s"


def estate_type_members(mol: MolGraph) -> list[list[int]]:
    """Atom-index lists per E-state type, in `_ESTATE_TYPES` order — the
    chem/AtomTypes.py GetAtomLabel structure (an atom may appear under
    several types, exactly as overlapping SMARTS would match it)."""
    # per-atom bond-kind counts and (kind, is-terminal-O) neighbor lists
    n = mol.n_atoms
    kinds: list[dict] = [{"s": 0, "d": 0, "t": 0, "a": 0} for _ in range(n)]
    nbr_info: list[list[tuple[str, bool]]] = [[] for _ in range(n)]
    deg = mol.degrees()
    for bd in mol.bonds:
        k = _bond_kind(bd.order)
        kinds[bd.a][k] += 1
        kinds[bd.b][k] += 1
        for me, other in ((bd.a, bd.b), (bd.b, bd.a)):
            o = mol.atoms[other]
            nbr_info[me].append(
                (k, o.atomic_num == 8 and deg[other] == 1
                 and o.h_count == 0))

    def _two_term_o_rest(idx: int, rest_kinds: set, n_rest: int) -> bool:
        """Exists an assignment: 2 terminal-O neighbors fill the ~[OD1H0]
        slots, the remaining n_rest bonds' kinds all lie in rest_kinds
        (the nitro/sulfone '# mod' patterns)."""
        from itertools import combinations

        info = nbr_info[idx]
        o_slots = [j for j, (_, is_o) in enumerate(info) if is_o]
        if len(info) != n_rest + 2:
            return False
        for pair in combinations(o_slots, 2):
            rest = [info[j][0] for j in range(len(info)) if j not in pair]
            if all(k in rest_kinds for k in rest):
                return True
        return False

    members: list[list[int]] = []
    for name, sym, arom_ok, d_req, h_req, spec in _ESTATE_TYPES:
        idxs = []
        for i, at in enumerate(mol.atoms):
            if at.symbol != sym or int(deg[i]) != d_req:
                continue
            if at.aromatic and not arom_ok:
                continue
            if h_req is not None and at.h_count != h_req:
                continue
            kc = kinds[i]
            if spec == "nitro":
                # (~[OD1H0])(~[OD1H0])-,:* — two any-bond terminal-O
                # slots, remaining bond single-or-aromatic
                if _two_term_o_rest(i, {"s", "a"}, 1):
                    idxs.append(i)
            elif spec == "aas":
                if kc["a"] == 2 and kc["s"] + kc["a"] == d_req:
                    idxs.append(i)
                elif kc["a"] == 3:
                    idxs.append(i)
            elif spec == "sulfone":
                # (~[OD1H0])(~[OD1H0])(-*)-* — two any-bond terminal-O
                # slots, remaining two bonds strictly single
                if _two_term_o_rest(i, {"s"}, 2):
                    idxs.append(i)
            else:
                if all(kc[k] == v for k, v in spec.items()) and \
                        sum(kc.values()) == sum(spec.values()):
                    idxs.append(i)
        members.append(idxs)
    return members


def estate_fingerprint_counts(mol: MolGraph) -> np.ndarray:
    """79 per-type atom counts — RDKit ESFP.FingerprintMol[0], the
    'E-state fingerprints' family's single coder ('Estate')."""
    return np.array([len(m) for m in estate_type_members(mol)],
                    dtype=np.float64)


def estate(mol: MolGraph) -> np.ndarray:
    """The 'EState' family, reference coder order (:9816): value (79
    per-type S sums), max (79), min (79), then Shev, Scar, Shal, Shet,
    Save, Smax, Smin, DS — 245 values."""
    S = estate_indices(mol)
    members = estate_type_members(mol)
    value = np.array([sum(S[k] for k in m) if m else 0.0 for m in members])
    vmax = np.array([max(S[k] for k in m) if m else 0.0 for m in members])
    vmin = np.array([min(S[k] for k in m) if m else 0.0 for m in members])
    z = np.array([a.atomic_num for a in mol.atoms])
    scar = float(S[z == 6].sum())
    shal = float(S[np.isin(z, (9, 17, 35, 53))].sum())
    shev = float(S.sum())
    scalars = [
        shev,                       # Shev
        scar,                       # Scar
        shal,                       # Shal
        shev - scar,                # Shet = total − C − H (no H atoms)
        float(S.mean()),            # Save
        float(S.max()),             # Smax
        float(S.min()),             # Smin
        float(S.max() - S.min()),   # DS
    ]
    return np.concatenate([value, vmax, vmin, scalars])


# -------------------------------------------------------------------------
# H-added graph (Basak + Burden operate after Chem.AddHs)
# -------------------------------------------------------------------------

def add_hydrogens(mol: MolGraph) -> MolGraph:
    """Explicit-H twin: every counted implicit hydrogen becomes an H atom
    with a single bond, appended after the heavy atoms (RDKit AddHs
    order)."""
    out = MolGraph(
        atoms=[Atom(a.symbol, a.aromatic, a.charge, 0, a.isotope, 0)
               for a in mol.atoms],
        bonds=[Bond(b.a, b.b, b.order) for b in mol.bonds])
    for i, a in enumerate(mol.atoms):
        for _ in range(a.h_count):
            out.atoms.append(Atom("H", False, 0, 0, 0, 0))
            out.bonds.append(Bond(i, len(out.atoms) - 1, 1.0))
    return out


# -------------------------------------------------------------------------
# Basak information indices (ref chem/basak.py)
# -------------------------------------------------------------------------

def _entropy_bits(counts: np.ndarray) -> float:
    p = counts / counts.sum()
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def _basak_ic0(hmol: MolGraph) -> float:
    z = np.array([a.atomic_num for a in hmol.atoms])
    _, cnt = np.unique(z, return_counts=True)
    return _entropy_bits(cnt.astype(np.float64)) if len(z) else 0.0


def _basak_icn(hmol: MolGraph, num_path: int,
               paths_upto: dict | None = None) -> float:
    """CalcBasakICn (ref chem/basak.py:119-172): atom equivalence classes
    by the sorted profile of atomic-number sequences along every
    num_path-atom simple path starting (or, reversed, ending) at the
    atom, plus the atom's own [Z].  `paths_upto` amortizes the H-graph
    path enumeration across the six orders (basak()'s hot loop)."""
    paths = paths_upto[num_path] if paths_upto is not None \
        else hmol.atom_paths(num_path)
    if not paths:
        return 0.0
    z = [a.atomic_num for a in hmol.atoms]
    profiles = []
    for i in range(hmol.n_atoms):
        prof = [[z[i]]]
        for p in paths:
            if p[0] == i:
                prof.append([z[k] for k in p[1:]])
            if p[-1] == i:
                prof.append([z[k] for k in reversed(p[:-1])])
        prof.sort()
        profiles.append(prof)
    classes: dict = {}
    for prof in profiles:
        key = tuple(tuple(s) for s in prof)
        classes[key] = classes.get(key, 0) + 1
    return _entropy_bits(np.array(list(classes.values()), dtype=np.float64))


def basak(mol: MolGraph) -> np.ndarray:
    """21 values in family order CIC0-6, SIC0-6, IC0-6 (:9836).  The
    registry's orders: CIC_k/SIC_k/IC_k for k ≥ 1 use num_path = k+1
    (chem/__init__.py:287-307)."""
    hmol = add_hydrogens(mol)
    n = hmol.n_atoms
    log2n = math.log2(n) if n > 1 else 0.0
    paths_upto = hmol.atom_paths_upto(7)  # one DFS feeds orders 2-7
    ics = [_basak_ic0(hmol)] + [
        _basak_icn(hmol, k, paths_upto) for k in range(2, 8)]
    cic = [log2n - ic if n > 1 else 0.0 for ic in ics]
    sic = [ic / log2n if n > 1 else 0.0 for ic in ics]
    return np.array(cic + sic + ics, dtype=np.float64)


# -------------------------------------------------------------------------
# Burden eigenvalues (ref chem/burden.py)
# -------------------------------------------------------------------------

_BURDEN_TAGS = ("alpha", "En", "V", "m")  # bcutp, bcute, bcutv, bcutm


def _burden_spectrum(hmol: MolGraph, tag: str) -> np.ndarray:
    """_GetBurdenMatrix transcription: float32 adjacency with
    round(relative property, 3) diagonal, round(√bond-order, 3) bonded
    entries, 0.001 non-bonded off-diagonals; real eigenvalues."""
    n = hmol.n_atoms
    M = np.full((n, n), 0.001, dtype=np.float32)
    for i, at in enumerate(hmol.atoms):
        M[i, i] = round(_rel_prop(at.symbol, tag), 3)
    for bd in hmol.bonds:
        v = round(math.sqrt(bd.order), 3)
        M[bd.a, bd.b] = v
        M[bd.b, bd.a] = v
    return np.real(np.linalg.eigvals(M))


def burden(mol: MolGraph) -> np.ndarray:
    """64 values: 4 property tags × 16 BCUT values (largest 8 |negative|
    eigenvalues then largest 8 positive, zero-padded — ref
    chem/burden.py:54-68)."""
    hmol = add_hydrogens(mol)
    out = []
    for tag in _BURDEN_TAGS:
        ev = _burden_spectrum(hmol, tag)
        pos = np.sort(ev[ev >= 0])
        neg = np.sort(np.abs(ev[ev < 0]))
        if len(pos) < 8:
            pos = np.concatenate((np.zeros(8), pos))
        if len(neg) < 8:
            neg = np.concatenate((np.zeros(8), neg))
        out.append(np.concatenate((neg[-8:], pos[-8:])))
    return np.concatenate(out).astype(np.float64)


# -------------------------------------------------------------------------
# CATS 2D pharmacophore (ref chem/cats.py)
# -------------------------------------------------------------------------

_CATS_PAIRS = ["DD", "DA", "DP", "DN", "DL", "AA", "AP", "AN", "AL",
               "PP", "PN", "PL", "NN", "NL", "LL"]
_CATS_FLIP = {"AD", "PD", "ND", "LD", "PA", "NA", "LA", "NP", "LN", "LP"}


def _cats_atom_types(mol: MolGraph) -> dict[str, list[int]]:
    """AssignAtomType (ref chem/cats.py:146-168): the PPP SMARTS reduce
    to element/H/charge/bond-environment conditions —

    D: [OH] (aliphatic O, 1 H) | [#7H,#7H2] (any N, 1-2 H)
    A: [O] (aliphatic O) | [#7H0] (any N, 0 H)
    P: [*+] (+1 charge) | [#7H2] (any N, 2 H)
    N: [*-] (−1) | C/P/S carrying (=O) and (-O) (the acid patterns)
    L: Cl/Br/I | thioether S(D2) with two aliphatic-C neighbors | the
       graph-searched lipophilic C (every heavy neighbor a carbon,
       ref :50-75)
    """
    deg = mol.degrees()
    nbrs: list[list[tuple[int, float]]] = mol._neighbors()
    res: dict[str, list[int]] = {"D": [], "A": [], "P": [], "N": [],
                                 "L": []}

    def acid_like(i: int) -> bool:
        # $(X(=O)O): a double bond to one O and a single/aromatic bond to
        # another O
        has_dbl_o = any(mol.atoms[j].atomic_num == 8 and o == 2.0
                        for j, o in nbrs[i])
        has_sgl_o = any(mol.atoms[j].atomic_num == 8 and o in (1.0, 1.5)
                        for j, o in nbrs[i])
        return has_dbl_o and has_sgl_o

    for i, at in enumerate(mol.atoms):
        z, h, chg = at.atomic_num, at.h_count, at.charge
        if z == 8 and not at.aromatic and h == 1:
            res["D"].append(i)
        if z == 7 and h in (1, 2):
            res["D"].append(i)
        if z == 8 and not at.aromatic:
            res["A"].append(i)
        if z == 7 and h == 0:
            res["A"].append(i)
        if chg == 1:
            res["P"].append(i)
        if z == 7 and h == 2:
            res["P"].append(i)
        if chg == -1:
            res["N"].append(i)
        if z in (6, 15, 16) and not at.aromatic and acid_like(i):
            res["N"].append(i)
        if z in (17, 35, 53):
            res["L"].append(i)
        if z == 16 and not at.aromatic and deg[i] == 2 and all(
                mol.atoms[j].atomic_num == 6 and not mol.atoms[j].aromatic
                for j, _ in nbrs[i]):
            res["L"].append(i)
        if z == 6 and all(mol.atoms[j].atomic_num == 6 for j, _ in nbrs[i]):
            res["L"].append(i)  # graph-searched lipophilic carbon
    return res


def cats2d(mol: MolGraph, path_length: int = 10) -> np.ndarray:
    """CATS2D with the reference's default scale=3 (each pair class
    divided by its total occurrence count), emitted in CalcCATS's
    sorted-key order (ref chem/cats.py:251-259) — 150 values."""
    types = _cats_atom_types(mol)
    D = mol.distance_matrix()
    n = mol.n_atoms
    per_pl: dict[int, list[str]] = {}
    for pl in range(path_length):
        if pl == 0:
            pairs = [(k, k) for k in range(n)]
        else:
            # upper triangle, each unordered pair once (scipy.triu)
            pairs = [(i, j) for i in range(n) for j in range(i + 1, n)
                     if D[i, j] == pl]
        hits: list[str] = []
        for a, b in pairs:
            first = [t for t in types if a in types[t]]
            second = [t for t in types if b in types[t]]
            seen: list[str] = []
            for x in first:
                for y in second:
                    code = x + y
                    if code in _CATS_FLIP:
                        code = code[1] + code[0]
                    if code not in seen:
                        seen.append(code)
            hits.extend(seen)
        per_pl[pl] = hits
    counts = {f"CATS_{p}{k}": 0.0 for p in _CATS_PAIRS
              for k in range(path_length)}
    for pl, hits in per_pl.items():
        for code in hits:
            counts[f"CATS_{code}{pl}"] += 1
    all_hits = [c for hits in per_pl.values() for c in hits]
    pair_tot = {p: all_hits.count(p) for p in _CATS_PAIRS}
    out = {}
    for key, v in counts.items():
        tot = pair_tot[key[5:7]]
        out[key] = round(v / tot, 3) if tot else round(v, 3)
    return np.array([out[k] for k in sorted(out)], dtype=np.float64)


EXT_GRAPH_FAMILIES = {
    "EState": estate,
    "Autocorrelation-moran": autocorrelation_moran,
    "Autocorrelation-geary": autocorrelation_geary,
    "Autocorrelation-broto": autocorrelation_broto,
    "Basak": basak,
    "Burden": burden,
    "E-state fingerprints": estate_fingerprint_counts,
    "Pharmacophore": cats2d,
}
