"""Graph-computable ligand descriptor families, RDKit-free.

The reference's Constitution / Topology / Connectivity / Kappa families
(chem/constitution.py, chem/topology.py, chem/connectivity.py,
chem/kappa.py, registered at iFeatureOmegaCLI.py:9812-9846) are functions
of the molecular GRAPH — atom/bond counts, the topological distance
matrix, degree products, Hall-Kier deltas — so they compute from the
pure-Python SMILES parser (functions/molgraph.py) without RDKit.

Every formula below is transcribed from the reference (file:line cited
per function), INCLUDING its quirks, which are deliberate parity:

* ``Chi1`` is registered as ``Chinp(n_path=0)`` (chem/__init__.py:141) —
  identical to Chi0, not the path-order-1 index;
* ``CalcKappa`` adds alpha to the path count AND again to the
  denominator (chem/kappa.py:28-30: ``P = paths + alpha; denom = P +
  alpha``), so the denominator carries 2·alpha;
* ``Flexibility`` computes BOTH kappa terms with ``n_bond=1``
  (chem/kappa.py:57-58), so phi = kappa-alpha-1² / A;
* ``Chinc`` under ``is_hk`` wraps each delta in a single-element list,
  so its ``deltas.remove(0)`` never fires (chem/connectivity.py:101-105)
  — a zero Hall-Kier delta in a cluster yields an infinite term there
  and here (it cannot occur for bonded heavy atoms of the organic set);
* ``WienerIdx(is_average=True)`` divides by N·(N−1) BEFORE the global /2
  (chem/topology.py:11-17).

Two coders reach outside the reference into RDKit built-ins; both are
transcribed from RDKit's published pure-Python formulations and flagged
for the conditional RDKit cross-check (tests/test_chem_rdkit_parity.py):
``Ipc`` (characteristic-polynomial information content) and ``BertzCT``
(two-term complexity: connection classes over bond-order-weighted
distance-row symmetry classes + atomic-number composition entropy).
``J`` (BalabanJ) likewise uses the bond-order-weighted distance matrix
with an unweighted adjacency test.  HBD/HBA counts transcribe the
published Lipinski SMARTS definitions.
"""

from __future__ import annotations

import math

import numpy as np

from ifeatureomega_cli_spark.functions.molgraph import (
    MolGraph, _OUTER_ELECS)

_HALOGENS = {9, 17, 35, 53}
_LOG2 = math.log(2.0)


def _info_entropy(arr: np.ndarray) -> float:
    """−Σ p·log2 p over the normalized positive entries."""
    arr = np.asarray(arr, dtype=np.float64)
    tot = arr.sum()
    if tot <= 0:
        return 0.0
    p = arr[arr > 0] / tot
    return float(-(p * np.log(p)).sum() / _LOG2)


# -------------------------------------------------------------------------
# Constitution (ref chem/constitution.py + chem/__init__.py:184-214)
# -------------------------------------------------------------------------

def _element_count(mol: MolGraph, z: int, aliphatic_only: bool) -> int:
    return sum(1 for a in mol.atoms
               if a.atomic_num == z and not (aliphatic_only and a.aromatic))


def _attached_to_triple(mol: MolGraph) -> np.ndarray:
    out = np.zeros(mol.n_atoms, dtype=bool)
    for bd in mol.bonds:
        if bd.order >= 3.0:
            out[bd.a] = out[bd.b] = True
    return out


def _ring_bond_flags(mol: MolGraph) -> list[bool]:
    ring_bonds = set()
    idx = {}
    for k, bd in enumerate(mol.bonds):
        idx[(bd.a, bd.b)] = k
        idx[(bd.b, bd.a)] = k
    for ring in mol.sssr():
        for i in range(len(ring)):
            ring_bonds.add(idx[(ring[i], ring[(i + 1) % len(ring)])])
    # SSSR misses none for ring-membership purposes? it can: a basis omits
    # some cycle bonds only when every cycle bond is covered — a bond in
    # ANY cycle keeps its endpoints connected without it, so test that
    # directly for the non-basis bonds.
    flags = [k in ring_bonds for k in range(mol.n_bonds)]
    if sum(flags) < mol.n_bonds:
        nbr = mol._neighbors()
        for k, bd in enumerate(mol.bonds):
            if flags[k]:
                continue
            seen = {bd.a}
            stack = [bd.a]
            while stack and not flags[k]:
                u = stack.pop()
                for v, _ in nbr[u]:
                    if u == bd.a and v == bd.b:
                        continue
                    if v == bd.b:
                        flags[k] = True
                        break
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
    return flags


def _num_rotatable(mol: MolGraph) -> int:
    """RDKit CalcNumRotatableBonds default pattern
    ``[!$(*#*)&!D1]-&!@[!$(*#*)&!D1]``: non-ring single bonds whose ends
    are both non-terminal and not attached to a triple bond."""
    deg = mol.degrees()
    triple = _attached_to_triple(mol)
    in_ring = _ring_bond_flags(mol)
    n = 0
    for k, bd in enumerate(mol.bonds):
        if bd.order != 1.0 or in_ring[k]:
            continue
        if deg[bd.a] > 1 and deg[bd.b] > 1 \
                and not triple[bd.a] and not triple[bd.b]:
            n += 1
    return n


def _valence(mol: MolGraph, i: int) -> float:
    v = mol.atoms[i].h_count
    for bd in mol.bonds:
        if bd.a == i or bd.b == i:
            v += bd.order
    return v


def _num_hbd(mol: MolGraph) -> int:
    """Lipinski NumHBD SMARTS ``[$([N;!H0;v3]),$([N;!H0;+1;v4]),
    $([O,S;H1;+0]),n&H1&+0]`` transcribed."""
    n = 0
    for i, at in enumerate(mol.atoms):
        z, h, chg = at.atomic_num, at.h_count, at.charge
        if z == 7 and not at.aromatic and h > 0:
            v = _valence(mol, i)
            if v == 3 or (chg == 1 and v == 4):
                n += 1
        elif z in (8, 16) and not at.aromatic and h == 1 and chg == 0:
            n += 1
        elif z == 7 and at.aromatic and h == 1 and chg == 0:
            n += 1
    return n


def _num_hba(mol: MolGraph) -> int:
    """Lipinski NumHBA SMARTS ``[$([O,S;H1;v2]-[!$(*=[O,N,P,S])]),
    $([O,S;H0;v2]),$([O,S;-]),$([N;v3;!$(N-*=!@[O,N,P,S])]),
    $([nH0,o,s;+0])]`` transcribed."""
    nbr = mol._neighbors()
    in_ring = _ring_bond_flags(mol)
    double_to_hetero = np.zeros(mol.n_atoms, dtype=bool)       # any =X
    nonring_double_to_hetero = np.zeros(mol.n_atoms, dtype=bool)  # =!@X
    for k, bd in enumerate(mol.bonds):
        if bd.order == 2.0:
            if mol.atoms[bd.b].atomic_num in (7, 8, 15, 16):
                double_to_hetero[bd.a] = True
                if not in_ring[k]:
                    nonring_double_to_hetero[bd.a] = True
            if mol.atoms[bd.a].atomic_num in (7, 8, 15, 16):
                double_to_hetero[bd.b] = True
                if not in_ring[k]:
                    nonring_double_to_hetero[bd.b] = True
    n = 0
    for i, at in enumerate(mol.atoms):
        z, h, chg = at.atomic_num, at.h_count, at.charge
        if at.aromatic:
            if (z == 7 and h == 0 and chg == 0) or \
                    (z in (8, 16) and chg == 0):
                n += 1
            continue
        if z in (8, 16):
            if chg < 0:
                n += 1
            elif h == 1 and _valence(mol, i) == 2:
                if all(not double_to_hetero[v] for v, _ in nbr[i]):
                    n += 1
            elif h == 0 and _valence(mol, i) == 2:
                n += 1
        elif z == 7 and _valence(mol, i) == 3:
            # the amide exclusion N-*=!@[O,N,P,S]: N single-bonded to an
            # atom carrying a NON-RING double bond to a heteroatom (the
            # !@ binds to the double bond in the SMARTS)
            amide_like = False
            for bd in mol.bonds:
                if bd.order != 1.0:
                    continue
                other = bd.b if bd.a == i else bd.a if bd.b == i else None
                if other is not None and nonring_double_to_hetero[other]:
                    amide_like = True
                    break
            if not amide_like:
                n += 1
    return n


def constitution(mol: MolGraph) -> np.ndarray:
    """29 constitutional values in the reference's coder order
    (iFeatureOmegaCLI.py:9812, chem/constitution.py + __init__.py:184-214).
    Element counters use the reference's SMARTS verbatim — ``C``/``N``/
    ``O``/``P``/``S`` match ALIPHATIC atoms only (benzene: ncarb = 0)."""
    deg = mol.degrees()
    total_h = int(mol.total_h().sum())
    heavy = mol.n_atoms
    single = sum(1 for b in mol.bonds if b.order == 1.0)
    double = sum(1 for b in mol.bonds if b.order == 2.0)
    triple = sum(1 for b in mol.bonds if b.order >= 3.0)
    arom = sum(1 for b in mol.bonds if b.order == 1.5)
    nta = heavy + total_h
    vals = [
        total_h,                                          # nhyd  [H]
        sum(1 for a in mol.atoms if a.atomic_num in _HALOGENS),  # nhal
        sum(1 for a in mol.atoms if a.atomic_num != 6),   # nhet
        heavy,                                            # nhev  [!H]
        _element_count(mol, 9, True),                     # ncof
        _element_count(mol, 17, True),                    # ncocl
        _element_count(mol, 35, True),                    # ncobr
        _element_count(mol, 53, True),                    # ncoi
        _element_count(mol, 6, True),                     # ncarb (aliphatic!)
        _element_count(mol, 15, True),                    # nphos
        _element_count(mol, 16, True),                    # nsulph
        _element_count(mol, 8, True),                     # noxy
        _element_count(mol, 7, True),                     # nnitro
        mol.n_bonds - heavy + mol.n_components(),         # nring (SSSR)
        _num_rotatable(mol),                              # nrot
        _num_hbd(mol),                                    # ndonr
        _num_hba(mol),                                    # naccr
        single,                                           # nsb [*]-[*]
        double,                                           # ndb [*]=[*]
        triple,                                           # ntb [*]#[*]
        arom,                                             # naro [*]:[*]
        nta,                                              # nta (with H)
        mol.exact_mol_wt() / nta,                         # AWeight
    ]
    vals += [mol.count_bond_paths(k) for k in range(1, 7)]  # PC1..PC6
    assert len(vals) == 29
    return np.array(vals, dtype=np.float64)


# -------------------------------------------------------------------------
# Topology (ref chem/topology.py)
# -------------------------------------------------------------------------

def _ipc_raw(mol: MolGraph) -> float:
    """RDKit GraphDescriptors.Ipc: total information content of the
    absolute characteristic-polynomial coefficients of the (unweighted)
    adjacency matrix."""
    coeffs = np.abs(np.poly(mol.adjacency()))
    return float(coeffs.sum()) * _info_entropy(coeffs)


def _bertz_ct_raw(mol: MolGraph, cutoff: int = 100) -> float:
    """RDKit GraphDescriptors.BertzCT transcription: symmetry classes
    from sorted, 4-decimal-rounded rows of the bond-order-weighted
    distance matrix; connection classes count bond-order products of
    adjacent bond pairs (plus C(order,2) self-terms of multiple bonds);
    CT = totConn·(H(conn)+log2 totConn) + nAtoms·H(atomic numbers)."""
    n = mol.n_atoms
    if n < 2:
        return 0.0
    bo = mol.distance_matrix(use_bond_order=True)
    keys: list[tuple] = []
    sym = []
    for i in range(n):
        row = sorted(bo[i].tolist())
        key = tuple(f"{x:.4f}" for x in row[:cutoff])
        try:
            idx = keys.index(key)
        except ValueError:
            idx = len(keys)
            keys.append(key)
        sym.append(idx + 1)
    order_of = {}
    nbrs: list[list[int]] = [[] for _ in range(n)]
    for bd in mol.bonds:
        order_of[(bd.a, bd.b)] = order_of[(bd.b, bd.a)] = bd.order
        nbrs[bd.a].append(bd.b)
        nbrs[bd.b].append(bd.a)
    connection: dict[tuple, float] = {}
    atom_type: dict[int, int] = {}
    for a in range(n):
        z = mol.atoms[a].atomic_num
        atom_type[z] = atom_type.get(z, 0) + 1
        cls_a = sym[a]
        ns = nbrs[a]
        for i, ni in enumerate(ns):
            oi = order_of[(a, ni)]
            if oi > 1 and ni > a:
                key = (min(cls_a, sym[ni]), max(cls_a, sym[ni]))
                connection[key] = connection.get(key, 0.0) + oi * (oi - 1) / 2
            for nj in ns[i + 1:]:
                oj = order_of[(a, nj)]
                key = (cls_a, min(sym[ni], sym[nj]), max(sym[ni], sym[nj]))
                connection[key] = connection.get(key, 0.0) + oi * oj
    conn_vals = np.array(list(connection.values()), dtype=np.float64)
    tot = conn_vals.sum()
    conn_ie = tot * (_info_entropy(conn_vals) + math.log(tot) / _LOG2) \
        if tot > 0 else 0.0
    atom_ie = n * _info_entropy(np.array(list(atom_type.values()),
                                         dtype=np.float64))
    return atom_ie + conn_ie


def topology(mol: MolGraph) -> np.ndarray:
    """24 topological indices in the reference's coder order
    (iFeatureOmegaCLI.py:9813, chem/topology.py formulas cited inline)."""
    n = mol.n_atoms
    D = mol.distance_matrix()
    deg = mol.degrees().astype(np.float64)
    A = mol.adjacency()
    with np.errstate(divide="ignore", invalid="ignore"):
        # AW — WienerIdx(is_average=True) (:7-17): (ΣΣd / N / (N−1)) / 2
        aw = D.sum() / n / (n - 1) / 2 if n > 1 else 0.0
        # J — RDKit BalabanJ: BO-weighted distances, unweighted adjacency
        bo = mol.distance_matrix(use_bond_order=True)
        ns_ = bo.sum(axis=1)
        q = mol.n_bonds
        mu = q - n + 1
        s = 0.0
        for i in range(n):
            for j in range(i, n):
                if A[i, j] == 1:
                    s += 1.0 / math.sqrt(ns_[i] * ns_[j])
        j_idx = float(q) / float(mu + 1) * s if mu + 1 != 0 else 0.0
        # Thara — NumHarary (:20-22)
        thara = 0.5 * (1.0 / D[D != 0]).sum()
        # Tsch — SchiultzIdx (:25-29)
        tsch = float(((D + A) @ deg).sum())
        # Tigdi — GraphDistIdx (:32-41)
        dmax = int(D.max()) if n > 1 else 0
        tigdi = float(np.log10(sum(
            (0.5 * float((D == k + 1).sum())) ** 2 for k in range(dmax))))
        # Platt (:44-46)
        platt = float(sum(deg[b.a] + deg[b.b] - 2 for b in mol.bonds))
        # Xu (:49-60)
        sigma = D.sum(axis=1)
        t1 = float((deg * sigma ** 2).sum())
        t2 = float((deg * sigma).sum())
        xu = math.sqrt(n) * math.log(t1 / t2) if t2 > 0 else float("nan")
        # Pol — NumPolarity (:63-66)
        pol = 0.5 * float((D == 3).sum())
        # Dz — PoglianiIdx (:69-76)
        pqn = mol.principal_quantum_numbers()
        dz = float(sum(_OUTER_ELECS[a.atomic_num] / pqn[i]
                       for i, a in enumerate(mol.atoms)))
        # Ipc (:79-80), BertzCT (:83-84) — log10 of the RDKit values
        ipc = float(np.log10(_ipc_raw(mol)))
        bertz = float(np.log10(_bertz_ct_raw(mol)))
        # GMTI — GutmanTopo (:87-96)
        gm = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                gm += deg[i] * deg[j] * D[i, j]
        gmti = float(np.log10(gm))
        # Zagreb (:99-124)
        zm1 = float((deg ** 2).sum())
        zm2 = float(sum(deg[b.a] * deg[b.b] for b in mol.bonds))
        nz = deg[deg > 0]
        mzm1 = float(((1.0 / nz) ** 2).sum())
        prods = np.array([deg[b.a] * deg[b.b] for b in mol.bonds])
        prods = prods[prods > 0]
        mzm2 = float(((1.0 / prods) ** 2).sum()) if len(prods) else 0.0
        # Qindex — Quadratic (:127-130)
        qindex = 3 - 2 * n + zm1 / 2.0
        # diameter / radius / Petitjean (:133-149)
        diam = float(D.max()) if n > 1 else 0.0
        radius = float(D.max(axis=1).min()) if n > 1 else 0.0
        petit = 1 - radius / diam if diam else float("nan")
        # Sito / Hato / Geto (:152-185) — Hall-Kier deltas, zeros removed
        hk = mol.hk_deltas()
        hknz = hk[hk != 0]
        sito = float(np.log(np.prod(hknz))) if len(hknz) else 0.0
        hato = n / float((1.0 / hknz).sum()) if len(hknz) else 0.0
        geto = float(np.power(np.prod(hknz), 1.0 / n)) if len(hknz) else 0.0
        # Arto (:188-192)
        arto = 2.0 * mol.n_bonds / n
    vals = [aw, j_idx, thara, tsch, tigdi, platt, xu, pol, dz, ipc, bertz,
            gmti, zm1, zm2, mzm1, mzm2, qindex, diam, radius, petit,
            sito, hato, geto, arto]
    assert len(vals) == 24
    return np.array(vals, dtype=np.float64)


# -------------------------------------------------------------------------
# Connectivity (ref chem/connectivity.py)
# -------------------------------------------------------------------------

def _chi_np(mol: MolGraph, n_path: int, deltas: np.ndarray,
            paths=None) -> float:
    """Chinp/Chivnp shared body (chem/connectivity.py:16-35, 120-135):
    order 0 → Σ 1/√δ over nonzero deltas; order ≥1 → Σ 1/√(Π δ along
    each simple path of n_path+1 atoms).  Pass a precomputed
    atom_paths_upto dict via `paths` to amortize the enumeration across
    the 9 orders × 2 delta variants (connectivity()'s hot loop)."""
    if n_path == 0:
        nz = deltas[deltas != 0]
        return float(np.sqrt(1.0 / nz).sum())
    path_list = paths[n_path + 1] if paths is not None \
        else mol.atom_paths(n_path + 1)
    accum = 0.0
    for path in path_list:
        prod = 1.0
        for idx in path:
            prod *= deltas[idx]
        if prod:
            accum += 1.0 / math.sqrt(prod)
    return accum


def _chi_bond_order1(mol: MolGraph, deltas: np.ndarray) -> float:
    """Chinp(n_path=1) aliphatic form (chem/connectivity.py:22-26):
    bond-endpoint degree products."""
    cc = np.array([deltas[b.a] * deltas[b.b] for b in mol.bonds])
    cc = cc[cc != 0]
    return float(np.sqrt(1.0 / cc).sum()) if len(cc) else 0.0


def _chi_nch(mol: MolGraph, n_cycle: int, deltas: np.ndarray) -> float:
    """Chinch/Chivnch (chem/connectivity.py:38-58, 138-158): SSSR rings
    of exactly n_cycle atoms."""
    accum = 0.0
    for ring in mol.sssr():
        if len(ring) != n_cycle:
            continue
        prod = 1.0
        for idx in ring:
            prod *= deltas[idx]
        if prod:
            accum += 1.0 / math.sqrt(prod)
    return accum


def _chi_nc(mol: MolGraph, tag: str, is_hk: bool) -> float:
    """Chinc (chem/connectivity.py:86-109): star-pattern clusters;
    degree deltas drop zeros, Hall-Kier deltas keep them (the reference
    wraps each hk delta in a list so remove(0) never fires)."""
    deg = mol.degrees()
    hk = mol.hk_deltas()
    accum = 0.0
    with np.errstate(divide="ignore"):
        for cluster in mol.cluster_matches(tag):
            if is_hk:
                ds = [hk[i] for i in sorted(cluster)]
            else:
                ds = [float(deg[i]) for i in sorted(cluster) if deg[i] != 0]
            if ds:
                accum += float(1.0 / np.sqrt(np.prod(ds)))
    return accum


def connectivity(mol: MolGraph) -> np.ndarray:
    """44 chi indices in the reference's coder order
    (iFeatureOmegaCLI.py:9814, chem/__init__.py:139-182).  Note Chi1 is
    the reference's own quirk — registered as path order 0."""
    deg = mol.degrees().astype(np.float64)
    hk = mol.hk_deltas()
    paths = mol.atom_paths_upto(11)  # one DFS feeds all 18 path sums
    chi = {0: _chi_np(mol, 0, deg)}
    for k in range(2, 11):
        chi[k] = _chi_np(mol, k, deg, paths)
    chiv = {k: _chi_np(mol, k, hk, paths) for k in range(0, 11)}
    chi1_bond = _chi_bond_order1(mol, deg)  # Chinp(1)'s [0,1] branch
    cc = np.array([deg[b.a] * deg[b.b] for b in mol.bonds])
    cc = cc[cc != 0]
    mchi1 = float(np.mean(np.sqrt(1.0 / cc))) if len(cc) else float("nan")
    vals = [
        chi[0],                      # Chi0
        chi[0],                      # Chi1 = Chinp(n_path=0) — ref quirk
        mchi1,                       # mChi1 — MeanRandic (:61-83)
        chi[2], chi[3], chi[4], chi[5], chi[6], chi[7], chi[8], chi[9],
        chi[10],
        _chi_nc(mol, "3", False),    # Chi3c
        _chi_nc(mol, "4", False),    # Chi4c
        _chi_nc(mol, "4p", False),   # Chi4pc
        _chi_nch(mol, 3, deg),       # Chi3ch
        _chi_nch(mol, 4, deg),       # Chi4ch
        _chi_nch(mol, 5, deg),       # Chi5ch
        _chi_nch(mol, 6, deg),       # Chi6ch
        chiv[0], chiv[1], chiv[2], chiv[3], chiv[4], chiv[5], chiv[6],
        chiv[7], chiv[8], chiv[9], chiv[10],
        abs(chiv[0] - chi[0]),       # dchi0
        abs(chiv[1] - chi1_bond),    # dchi1 — DeltaChi pairs Chivnp(1)
        # with a FRESH Chinp(1), whose __call__ takes the [0,1] bond-form
        # branch (unlike the registered Chi1, which was built with 0)
        abs(chiv[2] - chi[2]),       # dchi2
        abs(chiv[3] - chi[3]),       # dchi3
        abs(chiv[4] - chi[4]),       # dchi4
        _chi_nc(mol, "3", True),     # Chiv3c
        _chi_nc(mol, "4", True),     # Chiv4c
        _chi_nc(mol, "4p", True),    # Chiv4pc
        _chi_nch(mol, 3, hk),        # Chiv3ch
        _chi_nch(mol, 4, hk),        # Chiv4ch
        _chi_nch(mol, 5, hk),        # Chiv5ch
        _chi_nch(mol, 6, hk),        # Chiv6ch
        abs(_chi_nc(mol, "3", True) - _chi_nc(mol, "4p", True)),   # knotpv
        abs(_chi_nc(mol, "3", False) - _chi_nc(mol, "4p", False)),  # knotp
    ]
    assert len(vals) == 44
    return np.array(vals, dtype=np.float64)


# -------------------------------------------------------------------------
# Kappa (ref chem/kappa.py)
# -------------------------------------------------------------------------

def _kappa(mol: MolGraph, n_bond: int, is_alpha: bool) -> float:
    """CalcKappa transcription (chem/kappa.py:21-38) including the
    reference's double-alpha denominator: P = paths + alpha, denom =
    P + alpha."""
    alpha = mol.hall_kier_alpha() if is_alpha else 0.0
    p = mol.count_bond_paths(n_bond) + alpha
    a = mol.n_atoms + alpha + 1 - n_bond
    denom = p + alpha
    if denom:
        if a % 2 == 1 and n_bond == 3:
            k = a * (a + 1) ** 2 / denom ** 2
        else:
            k = a * (a - 1) ** 2 / denom ** 2
    else:
        k = 0.0
    return round(k, 3)


def kappa(mol: MolGraph) -> np.ndarray:
    """kappa1-3, kappam1-3, phi (iFeatureOmegaCLI.py:9815,
    chem/kappa.py).  phi uses kappam1 twice — Flexibility's own quirk
    (chem/kappa.py:57-58 builds both factors with n_bond=1)."""
    km1 = _kappa(mol, 1, True)
    vals = [
        _kappa(mol, 1, False), _kappa(mol, 2, False), _kappa(mol, 3, False),
        km1, _kappa(mol, 2, True), _kappa(mol, 3, True),
        round(km1 * km1 / mol.n_atoms, 3),
    ]
    return np.array(vals, dtype=np.float64)


GRAPH_FAMILIES = {
    "Constitution": constitution,
    "Topology": topology,
    "Connectivity": connectivity,
    "Kappa": kappa,
}
