"""'Molecular properties' ligand family, RDKit-free (round 7).

The reference's chem/property.py dispatches six coders
(iFeatureOmegaCLI.py:9829 'Molecular properties'):

* ``LogP`` / ``MR``   — RDKit ``Crippen.MolLogP`` / ``MolMR``
  (chem/property.py:10-11).  Those are sums of per-atom contributions
  from the published Wildman-Crippen 68-type table (Wildman & Crippen,
  J. Chem. Inf. Comput. Sci. 1999, 39, 868-873).  `_crippen_type` /
  `_crippen_h_type` encode each published SMARTS type as direct
  conditions on the molecular graph — the same discipline as the 79
  E-state types in chemdesc_ext.py — and `_CRIPPEN` carries the
  published contribution pairs.  Hand fixtures pin molecules whose
  published sums are unambiguous (benzene 1.6866, phenol 1.3922,
  ethanol −0.0014, nitrobenzene ≈1.59); the conditional RDKit parity
  layer (tests/test_chem_rdkit_parity.py) adjudicates the rest.
* ``TPSA``            — RDKit ``MolSurf.TPSA`` (chem/property.py:13),
  Ertl's published N/O contribution table (Ertl, Rohde, Selzer,
  J. Med. Chem. 2000, 43, 3714-3717) with RDKit's default
  includeSandP=False and the paper's fallback formula for unmatched
  N/O.  Aspirin 63.60 / known sums pin it.
* ``LabuteASA``       — RDKit ``MolSurf.pyLabuteASA``
  (chem/property.py:12): Labute's approximate accessible surface
  (J. Mol. Graph. Model. 2000, 18, 464-477): per-atom sphere area
  minus spherical caps at ideal bond distances d_ij = r_i + r_j −
  {0, 0.1, 0.2, 0.3} (single/aromatic/double/triple), clamped to
  [|r_i−r_j|, r_i+r_j].  Radii boundary (documented, adjudicated by
  the conditional parity layer): RDKit reads its internal single-bond
  covalent radius table; `_RB0` transcribes the published single-bond
  covalent radii, which reproduce real bond lengths (C−H 1.10 Å,
  aromatic C−C 1.44 Å) and put per-heavy-atom areas inside RDKit's own
  published VSA_EState bin range (4.78-11 Å²) — but the last digit of
  individual radii could not be verified without RDKit in this
  container.
* ``Hy`` / ``UI``     — the reference's own pure functions
  (chem/property.py:22-84), transcribed with their quirks: ``Hy``'s
  ``nheavy ^ 2`` is the XOR it is in the source (so nheavy == 2
  divides by zero → the reference raises; here that lone case yields
  NaN rather than failing the Spark task, documented deviation), and
  ``nhy`` counts explicit-H *neighbor atoms*, which a SMILES mol
  virtually never has — so the hydrogen-bond term is 0 for every
  normal molecule, exactly as the reference computes it.

All functions take the pure-Python `functions/molgraph.py` graph; no
RDKit, no SMARTS engine.
"""

from __future__ import annotations

import math
from bisect import bisect_left

import numpy as np

from ifeatureomega_cli_spark.functions.molgraph import MolGraph

_LOG2 = math.log(2.0)

# ---------------------------------------------------------------------------
# shared per-molecule typing context
# ---------------------------------------------------------------------------

_HETERO_Z = {7, 8, 15, 16, 9, 17, 35, 53}       # N O P S F Cl Br I
_HALOGEN_Z = {9, 17, 35, 53}


class _Env:
    """Per-atom facts every typer below needs, computed once per mol.

    ``hdeg``  — heavy-atom degree (explicit-H neighbor atoms excluded),
    ``h``     — total H count (implicit + explicit-H neighbor atoms),
    ``nbrs``  — [(j, order)] heavy neighbors only,
    ``h_nbrs``— indices of explicit H neighbor atoms,
    ``in3``   — atoms inside any 3-membered ring.
    """

    def __init__(self, mol: MolGraph):
        self.mol = mol
        n = mol.n_atoms
        self.nbrs: list[list[tuple[int, float]]] = [[] for _ in range(n)]
        self.h_nbrs: list[list[int]] = [[] for _ in range(n)]
        for bd in mol.bonds:
            for me, other in ((bd.a, bd.b), (bd.b, bd.a)):
                if mol.atoms[other].atomic_num == 1:
                    self.h_nbrs[me].append(other)
                else:
                    self.nbrs[me].append((other, bd.order))
        self.hdeg = np.array([len(x) for x in self.nbrs], dtype=np.int64)
        self.h = np.array(
            [a.h_count + len(self.h_nbrs[i])
             for i, a in enumerate(mol.atoms)], dtype=np.int64)
        self.in3: set[int] = set()
        for ring in mol._all_rings_of_size(3):
            self.in3 |= ring

    # neighbor-class counters (SMARTS vocabulary: uppercase = aliphatic,
    # lowercase = aromatic, default bond = single-or-aromatic)
    def singles(self, i):
        return [(j, o) for j, o in self.nbrs[i] if o == 1.0]

    def doubles(self, i):
        return [(j, o) for j, o in self.nbrs[i] if o == 2.0]

    def triples(self, i):
        return [(j, o) for j, o in self.nbrs[i] if o >= 3.0]

    def aromatics(self, i):
        return [(j, o) for j, o in self.nbrs[i] if o == 1.5]

    def is_al(self, j, z=None):
        a = self.mol.atoms[j]
        return not a.aromatic and (z is None or a.atomic_num == z)

    def is_ar(self, j, z=None):
        a = self.mol.atoms[j]
        return a.aromatic and (z is None or a.atomic_num == z)


# ---------------------------------------------------------------------------
# Wildman-Crippen atom contributions (published table; blank MR cells in
# the paper contribute 0.0, as RDKit's parser reads them)
# ---------------------------------------------------------------------------

_CRIPPEN: dict[str, tuple[float, float]] = {
    "C1": (0.1441, 2.503), "C2": (0.0, 2.433), "C3": (-0.2035, 2.753),
    "C4": (-0.2051, 2.731), "C5": (-0.2783, 5.007), "C6": (0.1551, 3.513),
    "C7": (0.0017, 3.888), "C8": (0.08452, 2.464), "C9": (-0.1444, 2.412),
    "C10": (-0.0516, 2.488), "C11": (0.1193, 2.582),
    "C12": (-0.0967, 2.576), "C13": (-0.5443, 4.041), "C14": (0.0, 3.257),
    "C15": (0.245, 3.564), "C16": (0.198, 3.18), "C17": (0.0, 3.104),
    "C18": (0.1581, 3.35), "C19": (0.2955, 4.346), "C20": (0.2713, 3.904),
    "C21": (0.136, 3.509), "C22": (0.4619, 4.067), "C23": (0.5437, 3.853),
    "C24": (0.1893, 2.673), "C25": (-0.8186, 3.135), "C26": (0.264, 4.305),
    "C27": (0.2148, 2.693), "CS": (0.08129, 3.243),
    "H1": (0.123, 1.057), "H2": (-0.2677, 1.395), "H3": (0.2142, 0.9627),
    "H4": (0.298, 1.805), "HS": (0.1125, 1.112),
    "N1": (-1.019, 2.262), "N2": (-0.7096, 2.173), "N3": (-1.027, 2.827),
    "N4": (-0.5188, 3.0), "N5": (0.08387, 1.757), "N6": (0.1836, 2.428),
    "N7": (-0.3187, 1.839), "N8": (-0.4458, 2.819), "N9": (0.01508, 1.725),
    "N10": (-1.95, 0.0), "N11": (-0.3239, 2.202), "N12": (-1.119, 0.0),
    "N13": (-0.3396, 0.2604), "N14": (0.2887, 3.359), "NS": (-0.4806, 2.134),
    "O1": (0.1552, 1.08), "O2": (-0.2893, 0.8238), "O3": (-0.0684, 1.085),
    "O4": (0.4833, 1.182), "O5": (0.0335, 3.367), "O6": (-0.3339, 0.7774),
    "O7": (-1.189, 0.0), "O8": (0.1788, 3.135), "O9": (-0.1526, 0.0),
    "O10": (0.1129, 0.2215), "O11": (0.4833, 0.389), "O12": (-1.326, 0.0),
    "OS": (-0.1188, 0.6865),
    "F": (0.4202, 1.108), "Cl": (0.6895, 5.853), "Br": (0.8456, 8.927),
    "I": (0.8857, 14.02), "Hal": (-2.996, 0.0),
    "P": (0.8612, 6.92),
    "S1": (0.6482, 7.591), "S2": (-0.0024, 7.365), "S3": (0.6237, 6.691),
    "Me1": (-0.3808, 5.754), "Me2": (-0.0025, 0.0),
}


def _crippen_type(env: _Env, i: int) -> str:
    """First-matching Wildman-Crippen type for heavy atom i, pattern
    order as published (the paper's two deliberate order flips — O12
    before O7, S2 before S1 — preserved)."""
    at = env.mol.atoms[i]
    z = at.atomic_num
    h = int(env.h[i])
    chg = at.charge
    if z == 6:
        return _ctype_c(env, i, at, h)
    if z == 7:
        return _ctype_n(env, i, at, h, chg)
    if z == 8:
        return _ctype_o(env, i, at, h, chg)
    if z == 9:
        return "F" if chg == 0 else "Hal"
    if z == 17:
        return "Cl" if chg == 0 else "Hal"
    if z == 35:
        return "Br" if chg == 0 else "Hal"
    if z == 53:
        return "I" if chg == 0 else "Hal"
    if z == 15:
        return "P"
    if z == 16:
        # S2 lines precede S1 in the published table (order flip):
        # charged S, or neutral S doubly bonded to N/O/P/S
        if chg != 0 and not at.aromatic:
            return "S2"
        if not at.aromatic and any(
                env.mol.atoms[j].atomic_num in (7, 8, 15, 16)
                for j, _ in env.doubles(i)):
            return "S2"
        if at.aromatic:
            return "S3"
        return "S1"
    if z == 1:
        return _crippen_h_type(env, i)
    # metals / metalloids: single merged bucket (Me1) — the paper's
    # Me1/Me2 split is by element groups none of which the SMILES
    # parser's organic-focused table produces in practice
    return "Me1"


def _ctype_c(env: _Env, i: int, at, h: int) -> str:
    x = int(env.hdeg[i]) + h          # SMARTS X — total connectivity
    if not at.aromatic:
        s_alc = sum(1 for j, _ in env.singles(i) if env.is_al(j, 6))
        s_het = sum(1 for j, _ in env.singles(i)
                    if env.is_al(j) and env.mol.atoms[j].atomic_num
                    in _HETERO_Z)
        s_ar = sum(1 for j, _ in env.singles(i) if env.is_ar(j))
        s_arc = sum(1 for j, _ in env.singles(i) if env.is_ar(j, 6))
        s_alheavy = sum(1 for j, _ in env.singles(i)
                        if env.is_al(j) and env.mol.atoms[j].atomic_num > 1)
        d_alc = sum(1 for j, _ in env.doubles(i) if env.is_al(j, 6))
        d_arc = sum(1 for j, _ in env.doubles(i) if env.is_ar(j, 6))
        d_het = sum(1 for j, _ in env.doubles(i)
                    if env.is_al(j) and env.mol.atoms[j].atomic_num
                    not in (1, 6))
        n_d = len(env.doubles(i))
        if (h == 4 and x == 4) or (h == 3 and s_alc == 1) or \
                (h == 2 and s_alc == 2):
            return "C1"
        if (h == 1 and s_alc == 3) or (h == 0 and s_alc == 4):
            return "C2"
        if (h == 3 and s_het >= 1) or (h == 2 and x == 4 and s_het >= 1):
            return "C3"
        if h <= 1 and x == 4 and s_het >= 1:
            return "C4"
        if d_het >= 1:
            return "C5"
        if d_alc >= 1 and (
                h == 2 or
                (h == 1 and s_alheavy >= 1) or
                (h == 0 and s_alheavy >= 2) or
                n_d >= 2):
            return "C6"
        if x == 2 and env.triples(i) and any(
                env.mol.atoms[j].atomic_num > 1 and env.is_al(j)
                for j, _ in env.triples(i)):
            return "C7"
        if h == 3 and s_arc >= 1:
            return "C8"
        if h == 3 and s_ar >= 1:
            return "C9"
        if h == 2 and x == 4 and s_ar >= 1:
            return "C10"
        if h == 1 and x == 4 and s_ar >= 1:
            return "C11"
        if h == 0 and x == 4 and s_ar >= 1:
            return "C12"
        # C26: vinylic C next to an aromatic system, or =c
        if (d_alc >= 1 and s_ar >= 1 and (h == 1 or s_alheavy >= 1
                                          or s_ar >= 2)) or d_arc >= 1:
            return "C26"
        if x == 4 and any(
                env.is_al(j) and env.mol.atoms[j].atomic_num
                not in (1, 6, 7, 8, 15, 16, 9, 17, 35, 53)
                for j, _ in env.singles(i)):
            return "C27"
        return "CS"
    # aromatic carbon
    n_ar = len(env.aromatics(i))
    if h == 0 and any(
            env.is_al(j) and env.mol.atoms[j].atomic_num
            not in (1, 6, 7, 8, 16, 9, 17, 35, 53)
            for j, _ in env.singles(i)):
        return "C13"           # note: aliphatic P/Si/B neighbors land here
    for zhal, t in ((9, "C14"), (17, "C15"), (35, "C16"), (53, "C17")):
        if any(env.mol.atoms[j].atomic_num == zhal
               for j, _ in env.singles(i)):
            return t
    if h >= 1:
        return "C18"
    if n_ar >= 3:
        return "C19"
    if n_ar == 2:
        if any(env.is_ar(j) for j, _ in env.singles(i)):
            return "C20"
        if any(env.is_al(j, 6) for j, _ in env.singles(i)):
            return "C21"
        if any(env.is_al(j, 7) for j, _ in env.singles(i)):
            return "C22"
        if any(env.is_al(j, 8) for j, _ in env.singles(i)):
            return "C23"
        if any(env.is_al(j, 16) for j, _ in env.singles(i)):
            return "C24"
        if any(env.is_al(j) and env.mol.atoms[j].atomic_num in (6, 7, 8)
               for j, _ in env.doubles(i)):
            return "C25"
    return "CS"


def _ctype_n(env: _Env, i: int, at, h: int, chg: int) -> str:
    s_heavy = [j for j, _ in env.singles(i)
               if env.mol.atoms[j].atomic_num > 1]
    s_al = [j for j in s_heavy if env.is_al(j)]
    s_ar = [j for j, _ in env.singles(i) if env.is_ar(j)]
    d_heavy = [j for j, _ in env.doubles(i)
               if env.mol.atoms[j].atomic_num > 1]
    t_heavy = [j for j, _ in env.triples(i)
               if env.mol.atoms[j].atomic_num > 1]
    if not at.aromatic and chg == 0:
        if h == 2 and len(s_al) == 1:
            return "N1"
        if h == 1 and len(s_al) >= 2:
            return "N2"
        if h == 2 and s_ar:
            return "N3"
        if h == 1 and s_ar and len(s_heavy) >= 2:
            return "N4"
        if h == 1 and d_heavy:
            return "N5"
        if h == 0 and d_heavy and (s_heavy or s_ar):
            return "N6"
        if h == 0 and len(s_al) >= 3:
            return "N7"
        if h == 0 and s_ar and len(s_heavy) == 3:
            return "N8"
        if t_heavy:
            return "N9"
        return "NS"
    if not at.aromatic and chg > 0:
        if 1 <= h <= 3:
            return "N10"
        if h == 0:
            if len(s_al) == 4:
                return "N13"
            if len(d_heavy) == 1 and len(s_heavy) == 2:
                return "N13"
            if len(d_heavy) == 2 and any(
                    env.mol.atoms[j].atomic_num == 6 for j in d_heavy):
                return "N13"
            if t_heavy:
                return "N14"
            if len(d_heavy) == 2:
                return "N14"   # azide center [N+](=[N-])=N
        return "NS"
    if not at.aromatic and chg < 0:
        return "N14"
    # aromatic n
    if chg == 0:
        return "N11"
    if chg > 0:
        return "N12"
    return "NS"


def _ctype_o(env: _Env, i: int, at, h: int, chg: int) -> str:
    if at.aromatic:
        return "O1"
    s_heavy = [j for j, _ in env.singles(i)
               if env.mol.atoms[j].atomic_num > 1]
    d_heavy = [j for j, _ in env.doubles(i)
               if env.mol.atoms[j].atomic_num > 1]
    deg = len(env.nbrs[i])
    if h >= 1:
        return "O2"
    if deg == 2 and len(s_heavy) == 2 and all(env.is_al(j)
                                              for j in s_heavy):
        return "O3"
    if deg == 2 and any(env.is_ar(j) for j in s_heavy):
        return "O4"
    zd = [env.mol.atoms[j].atomic_num for j in d_heavy]
    if any(z in (7, 8) for z in zd):
        return "O5"
    if chg < 0 and deg == 1 and s_heavy and \
            env.mol.atoms[s_heavy[0]].atomic_num == 7:
        return "O5"
    if chg < 0 and deg == 1 and s_heavy and \
            env.mol.atoms[s_heavy[0]].atomic_num == 16:
        return "O6"
    if chg == 0 and any(z == 16 for z in zd):
        return "O6"
    if d_heavy and env.is_ar(d_heavy[0], 6):
        return "O8"
    if d_heavy and env.is_al(d_heavy[0], 6):
        c = d_heavy[0]
        ch = int(env.h[c])
        c_s_al = [j for j, _ in env.singles(c)
                  if env.is_al(j) and env.mol.atoms[j].atomic_num > 1]
        c_s_alc = [j for j in c_s_al if env.mol.atoms[j].atomic_num == 6]
        c_s_ar = [j for j, _ in env.singles(c) if env.is_ar(j)]
        c_s_arc = [j for j in c_s_ar if env.mol.atoms[j].atomic_num == 6]
        c_x = int(env.hdeg[c]) + ch
        c_d_o = [j for j, _ in env.doubles(c)
                 if env.mol.atoms[j].atomic_num == 8 and j != i]
        # O9: aliphatic carbonyl
        if (ch == 1 and c_s_alc) or \
                (c_s_alc and len(c_s_al) >= 2) or \
                (ch == 1 and any(env.mol.atoms[j].atomic_num in (7, 8)
                                 for j in c_s_al)) or \
                ch == 2 or \
                (c_x == 2 and c_d_o):
            return "O9"
        # O10: aromatic-substituted carbonyl
        if (ch == 1 and c_s_arc) or \
                ((c_s_alc or c_s_arc) and c_s_ar) or \
                (c_s_arc and c_s_al):
            return "O10"
        # O11: carbonyl with two non-carbon substituents
        non_c = [j for j in c_s_al + c_s_ar
                 if env.mol.atoms[j].atomic_num != 6]
        if len(non_c) >= 2:
            return "O11"
    # O12 precedes O7 (the published order flip): carboxylate terminal O
    if chg < 0 and deg == 1 and s_heavy:
        c = s_heavy[0]
        if env.mol.atoms[c].atomic_num == 6 and any(
                env.mol.atoms[j].atomic_num == 8
                for j, _ in env.doubles(c)):
            return "O12"
    if chg < 0 and deg == 1 and s_heavy and \
            env.mol.atoms[s_heavy[0]].atomic_num not in (1, 7, 16):
        return "O7"
    return "OS"


def _crippen_h_type(env: _Env, i_or_parent: int, parent: int | None = None
                    ) -> str:
    """Type of a hydrogen.  Called either with an explicit H atom's index
    (neighbor inferred) or with parent=<heavy idx> for an implicit H."""
    if parent is None:
        nb = env.nbrs[i_or_parent] + [(j, 1.0)
                                      for j in env.h_nbrs[i_or_parent]]
        if not nb:
            return "HS"
        parent = nb[0][0]
    pz = env.mol.atoms[parent].atomic_num
    if pz in (6, 1):
        return "H1"
    if pz == 7:
        return "H3"
    if pz == 8:
        o_nbrs = [j for j, _ in env.nbrs[parent]
                  if env.mol.atoms[j].atomic_num > 1]
        if not o_nbrs:
            return "H2"                    # water
        q = o_nbrs[0]
        qa = env.mol.atoms[q]
        if qa.atomic_num == 7:
            return "H3"                    # H-O-N
        if qa.atomic_num in (8, 16):
            return "H4"                    # peroxide / O-S
        if qa.atomic_num == 6:
            qx = int(env.hdeg[q]) + int(env.h[q])
            if (not qa.aromatic and qx == 4) or qa.aromatic:
                return "H2"                # alcohol / phenol
            if any(env.mol.atoms[j].atomic_num in (6, 7, 8, 16)
                   for j, _ in env.doubles(q)):
                return "H4"                # acid / enol
            return "HS"
        return "H2"                        # [#1]O[!C;!N;!O;!S]
    # H directly on an atom that is not C, N, O (S, P, ...)
    return "H2"


def crippen_contribs(mol: MolGraph) -> np.ndarray:
    """(n_heavy, 2) array of per-heavy-atom (logP, MR) contributions,
    implicit hydrogens folded into their heavy atom exactly as RDKit's
    getCrippenAtomContribs does.  Explicit H *atoms* (rare) fold into
    their neighbor too, so sums match the reference's AddHs-free mols."""
    env = _Env(mol)
    n = mol.n_atoms
    out = np.zeros((n, 2), dtype=np.float64)
    owner = list(range(n))
    for i, at in enumerate(mol.atoms):
        if at.atomic_num == 1:
            nb = env.nbrs[i]
            owner[i] = nb[0][0] if nb else i
    for i, at in enumerate(mol.atoms):
        if at.atomic_num == 1:
            lp, mr = _CRIPPEN[_crippen_h_type(env, i)]
            out[owner[i]] += (lp, mr)
            continue
        lp, mr = _CRIPPEN[_crippen_type(env, i)]
        out[i] += (lp, mr)
        if at.h_count:
            hlp, hmr = _CRIPPEN[_crippen_h_type(env, i, parent=i)]
            out[i] += (at.h_count * hlp, at.h_count * hmr)
    return out


def mol_logp(mol: MolGraph) -> float:
    return float(crippen_contribs(mol)[:, 0].sum())


def mol_mr(mol: MolGraph) -> float:
    return float(crippen_contribs(mol)[:, 1].sum())


# ---------------------------------------------------------------------------
# TPSA (Ertl 2000; N/O only — RDKit default includeSandP=False)
# ---------------------------------------------------------------------------

def tpsa_contribs(mol: MolGraph) -> np.ndarray:
    """Per-atom topological polar surface area contributions."""
    env = _Env(mol)
    out = np.zeros(mol.n_atoms, dtype=np.float64)
    for i, at in enumerate(mol.atoms):
        z = at.atomic_num
        if z not in (7, 8):
            continue
        h = int(env.h[i])
        chg = at.charge
        n_s = len(env.singles(i)) + len(env.h_nbrs[i])
        n_d = len(env.doubles(i))
        n_t = len(env.triples(i))
        n_a = len(env.aromatics(i))
        in3 = i in env.in3
        v = None
        if z == 7 and not at.aromatic:
            if chg == 0:
                if h == 0 and (n_s, n_d, n_t) == (3, 0, 0):
                    v = 3.01 if in3 else 3.24
                elif h == 0 and (n_s, n_d, n_t) == (1, 1, 0):
                    v = 12.36
                elif h == 0 and (n_s, n_d, n_t) == (0, 0, 1):
                    v = 23.79
                elif h == 0 and (n_s, n_d, n_t) == (1, 2, 0):
                    v = 11.68
                elif h == 0 and (n_s, n_d, n_t) == (0, 1, 1):
                    v = 13.60
                elif h == 1 and (n_s, n_d, n_t) == (2, 0, 0):
                    v = 21.94 if in3 else 12.03
                elif h == 1 and (n_s, n_d, n_t) == (1, 1, 0):
                    v = 23.85
                elif h == 2 and (n_s, n_d, n_t) == (1, 0, 0):
                    v = 26.02
            elif chg == 1:
                if h == 0 and (n_s, n_d, n_t) == (4, 0, 0):
                    v = 0.0
                elif h == 0 and (n_s, n_d, n_t) == (2, 1, 0):
                    v = 3.01
                elif h == 0 and (n_s, n_d, n_t) == (1, 0, 1):
                    v = 4.36
                elif h == 1 and (n_s, n_d, n_t) == (3, 0, 0):
                    v = 4.44
                elif h == 1 and (n_s, n_d, n_t) == (2, 1, 0):
                    v = 13.97
                elif h == 2 and (n_s, n_d, n_t) == (2, 0, 0):
                    v = 16.61
                elif h == 2 and (n_s, n_d, n_t) == (1, 1, 0):
                    v = 25.59
                elif h == 3 and (n_s, n_d, n_t) == (1, 0, 0):
                    v = 27.64
        elif z == 7:                       # aromatic n
            if chg == 0:
                if h == 0 and n_a == 2 and n_s + n_d == 0:
                    v = 12.89
                elif h == 0 and n_a == 3:
                    v = 4.41
                elif h == 0 and n_a == 2 and n_s == 1:
                    v = 4.93
                elif h == 0 and n_a == 2 and n_d == 1:
                    v = 8.39
                elif h == 1 and n_a == 2:
                    v = 15.79
            elif chg == 1:
                if h == 0 and n_a == 3:
                    v = 4.10
                elif h == 0 and n_a == 2 and n_s == 1:
                    v = 3.88
                elif h == 1 and n_a == 2:
                    v = 14.14
        elif z == 8 and not at.aromatic:
            if chg == 0:
                if h == 0 and (n_s, n_d) == (2, 0):
                    v = 12.53 if in3 else 9.23
                elif h == 0 and (n_s, n_d) == (0, 1):
                    v = 17.07
                elif h == 1 and (n_s, n_d) == (1, 0):
                    v = 20.23
            elif chg == -1:
                if h == 0 and (n_s, n_d) == (1, 0):
                    v = 23.06
        else:                              # aromatic o
            if n_a == 2:
                v = 13.14
        if v is None:
            # Ertl's fallback for polar atoms outside the table
            x = n_s + n_d + n_t + n_a + at.h_count
            if z == 7:
                v = 30.5 - x * 8.2 + h * 1.5
            else:
                v = 28.5 - x * 8.6 + h * 1.5
            if v < 0:
                v = 0.0
        out[i] = v
    return out


def tpsa(mol: MolGraph) -> float:
    return float(tpsa_contribs(mol).sum())


# ---------------------------------------------------------------------------
# Labute approximate surface area
# ---------------------------------------------------------------------------

# single-bond covalent radii (Å) — these reproduce ideal bond lengths
# (C-H 1.10, aromatic C-C 1.44) under Labute's d_ij = r_i + r_j − o_ij
_RB0 = {
    1: 0.33, 3: 1.34, 5: 0.81, 6: 0.77, 7: 0.70, 8: 0.66, 9: 0.611,
    11: 1.54, 12: 1.30, 14: 1.17, 15: 1.10, 16: 1.04, 17: 0.997,
    19: 1.96, 20: 1.74, 26: 1.25, 30: 1.31, 33: 1.21, 34: 1.17,
    35: 1.145, 53: 1.333,
}
_LABUTE_SCALE = {1.0: 0.0, 1.5: 0.1, 2.0: 0.2, 3.0: 0.3, 4.0: 0.3}


def _labute_cap(ri: float, rj: float, order: float) -> tuple[float, float]:
    """Spherical-cap areas hidden on sphere i (and on sphere j) by the
    neighbor at the ideal bond distance."""
    d = ri + rj - _LABUTE_SCALE.get(order, 0.0)
    d = min(max(abs(ri - rj), d), ri + rj)
    cap_i = math.pi * ri * (2.0 * ri - d + (rj * rj - ri * ri) / d)
    cap_j = math.pi * rj * (2.0 * rj - d + (ri * ri - rj * rj) / d)
    return cap_i, cap_j


def labute_asa_contribs(mol: MolGraph) -> tuple[np.ndarray, float]:
    """(per-heavy-atom areas, total hydrogen contribution).  Heavy-atom
    values are what the P_VSA descriptors bin (hydrogen spheres are NOT
    merged — RDKit's own VSA_EState bins, 4.78-11 Å², sit exactly on the
    H-free per-atom range this produces); LabuteASA = sum + hContrib."""
    n = mol.n_atoms
    areas = np.zeros(n, dtype=np.float64)
    caps = np.zeros(n, dtype=np.float64)
    h_contrib = 0.0
    rads = [_RB0.get(a.atomic_num, 1.2) for a in mol.atoms]
    for i, a in enumerate(mol.atoms):
        areas[i] = 4.0 * math.pi * rads[i] * rads[i]
    for bd in mol.bonds:
        ci, cj = _labute_cap(rads[bd.a], rads[bd.b], bd.order)
        caps[bd.a] += ci
        caps[bd.b] += cj
    rh = _RB0[1]
    h_sphere = 4.0 * math.pi * rh * rh
    for i, a in enumerate(mol.atoms):
        if not a.h_count:
            continue
        ci, ch = _labute_cap(rads[i], rh, 1.0)
        caps[i] += a.h_count * ci
        h_contrib += a.h_count * (h_sphere - ch)
    out = areas - caps
    # explicit H atoms (rare): move their net area into hContrib
    for i, a in enumerate(mol.atoms):
        if a.atomic_num == 1:
            h_contrib += out[i]
            out[i] = 0.0
    return out, h_contrib


def labute_asa(mol: MolGraph) -> float:
    heavy, h_contrib = labute_asa_contribs(mol)
    heavy_sum = sum(v for v, a in zip(heavy, mol.atoms)
                    if a.atomic_num > 1)
    return float(heavy_sum + h_contrib)


# ---------------------------------------------------------------------------
# Hy / UI (reference chem/property.py:22-84, quirks preserved)
# ---------------------------------------------------------------------------

def unsaturation_index(mol: MolGraph) -> float:
    """ref chem/property.py:22-44: log2(1 + #double + #triple +
    #aromatic bonds), round 3."""
    nd = sum(1 for b in mol.bonds if b.order == 2.0)
    nt = sum(1 for b in mol.bonds if b.order == 3.0)
    na = sum(1 for b in mol.bonds if b.order == 1.5)
    return round(math.log(1 + nd + nt + na) / _LOG2, 3)


def hydrophilicity_factor(mol: MolGraph) -> float:
    """ref chem/property.py:47-84.  Quirks preserved: ``nhy`` counts
    explicit-H NEIGHBOR ATOMS of N/O/S (zero for any normal SMILES mol);
    the last term divides by ``nheavy ^ 2`` — the XOR in the source —
    so nheavy == 2 raises ZeroDivisionError there; here it yields NaN
    (documented deviation: one molecule must not kill a Spark task)."""
    heavy = [i for i, a in enumerate(mol.atoms) if a.atomic_num > 1]
    nheavy = len(heavy)
    nc = sum(1 for a in mol.atoms if a.atomic_num == 6)
    nbr = mol._neighbors()
    nhy = 0
    for i, a in enumerate(mol.atoms):
        if a.atomic_num in (7, 8, 16):
            nhy += sum(1 for j, _ in nbr[i]
                       if mol.atoms[j].atomic_num == 1)
    if nheavy == 0:
        return float("nan")
    res = (1 + nhy) * (math.log(1 + nhy) / _LOG2)
    res += nc * (1.0 / nheavy * (math.log(1.0 / nheavy) / _LOG2))
    denom = nheavy ^ 2                     # the reference's XOR quirk
    if denom == 0:
        return float("nan")
    res += math.sqrt(nhy / denom)
    return round(res, 3)


def molecular_properties(mol: MolGraph) -> np.ndarray:
    """The 'Molecular properties' family, reference coder order
    (:9829): LogP, MR, LabuteASA, TPSA, Hy, UI."""
    c = crippen_contribs(mol)
    return np.array([
        float(c[:, 0].sum()), float(c[:, 1].sum()), labute_asa(mol),
        tpsa(mol), hydrophilicity_factor(mol), unsaturation_index(mol),
    ], dtype=np.float64)


# ---------------------------------------------------------------------------
# Moe-Type descriptors (P_VSA scheme, Labute 2000 / RDKit MolSurf +
# EState_VSA): per-heavy-atom VSA contributions partitioned by a
# per-atom property, and vice versa.  Bin boundaries are RDKit's
# published ones (each descriptor's docstring in rdkit.Chem.MolSurf /
# EState_VSA); slot k covers (b_{k-1}, b_k] (lower_bound semantics).
# ---------------------------------------------------------------------------

_SLOGP_BINS = [-0.4, -0.2, 0.0, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6]
_SMR_BINS = [1.29, 1.82, 2.24, 2.45, 2.75, 3.05, 3.63, 3.8, 4.0]
_PEOE_BINS = [-0.30, -0.25, -0.20, -0.15, -0.10, -0.05, 0.0,
              0.05, 0.10, 0.15, 0.20, 0.25, 0.30]
_ESTATE_BINS = [-0.390, 0.290, 0.717, 1.165, 1.540, 1.807, 2.05,
                4.69, 9.17, 15.0]
_VSA_BINS = [4.78, 5.00, 5.410, 5.740, 6.00, 6.07, 6.45, 7.00, 11.0]


def _binned_sum(props: np.ndarray, weights: np.ndarray,
                bins: list[float]) -> np.ndarray:
    out = np.zeros(len(bins) + 1, dtype=np.float64)
    for p, w in zip(props, weights):
        out[bisect_left(bins, p)] += w
    return out


def moe_type(mol: MolGraph) -> np.ndarray:
    """The 'Moe-Type descriptors' family, reference coder order (:9831):
    LabuteASA, TPSA, slogPVSA (12), MRVSA (10), PEOEVSA (14),
    EstateVSA (11), VSAEstate (10) — 59 values, the vector coders
    expanded exactly as the reference's ``fp+str(j)`` loop widens them.

    Property sources: VSA weights from `labute_asa_contribs` (heavy
    atoms, hydrogens excluded — their areas live in hContrib, matching
    the published VSA_EState bin range), logP/MR from
    `crippen_contribs` (implicit Hs folded into the heavy atom, as
    RDKit's getCrippenAtomContribs returns them), charges from the
    PEOE kernel (heavy-atom charges, as RDKit's _GasteigerCharge
    property holds them), E-states from `estate_indices`."""
    from ifeatureomega_cli_spark.functions.chemdesc_charge import (
        gasteiger_charges)
    from ifeatureomega_cli_spark.functions.chemdesc_ext import (
        estate_indices)

    heavy_mask = np.array([a.atomic_num > 1 for a in mol.atoms])
    vsa_all, _h = labute_asa_contribs(mol)
    vsa = vsa_all[heavy_mask]
    crip = crippen_contribs(mol)[heavy_mask]
    q, _qh = gasteiger_charges(mol)
    q = q[heavy_mask]
    es = np.asarray(estate_indices(mol), dtype=np.float64)[heavy_mask]
    parts = [
        np.array([labute_asa(mol), tpsa(mol)]),
        _binned_sum(crip[:, 0], vsa, _SLOGP_BINS),
        _binned_sum(crip[:, 1], vsa, _SMR_BINS),
        _binned_sum(q, vsa, _PEOE_BINS),
        _binned_sum(es, vsa, _ESTATE_BINS),
        _binned_sum(vsa, es, _VSA_BINS),
    ]
    return np.concatenate(parts)


PROP_FAMILIES = {
    "Molecular properties": molecular_properties,
    "Moe-Type descriptors": moe_type,
}
