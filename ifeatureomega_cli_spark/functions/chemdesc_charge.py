"""'Charge' ligand family: Gasteiger-Marsili PEOE charges, RDKit-free
(round 7).

The reference (chem/charge.py:1-110, registered at
iFeatureOmegaCLI.py:9830 'Charge') computes every descriptor from
RDKit's ``ComputeGasteigerCharges(AddHs(mol), 12)``.  The PEOE
algorithm and its parameter table are published (Gasteiger & Marsili,
Tetrahedron 1980, 36, 3219-3228): per-atom electronegativity
χ = a + b·q + c·q², and for every bond per iteration a charge transfer
Δq = (χ_hi − χ_lo) / χ⁺_lo · (1/2)ⁿ from the less- to the
more-electronegative end, where χ⁺_lo is the cation electronegativity
(a+b+c) of the less electronegative atom — with the paper's special
χ⁺(H) = 20.02.  Charges start at the formal charges; 12 iterations
(the reference's ``iter_step``), simultaneous update per iteration.

Hybridization modes for C/N/O come from ``molgraph.hybridization()``;
its documented divergence from RDKit for lone-pair-conjugated aliphatic
N/O (amide N outside rings → sp3 here, sp2 in RDKit) carries into these
charges and is surfaced by the conditional parity layer, same as the
HallKierAlpha note.  The phosphorus triple is the one parameter the
1980 paper does not list (P was added to PEOE later); it is flagged for
the parity layer.

Implicit hydrogens participate exactly as the reference's AddHs atoms:
each H of a heavy atom is its own pseudo-atom with H parameters (all
Hs on one heavy atom stay symmetric, so one trajectory per heavy atom
suffices).

Reference quirks preserved in `charge_descriptors` (chem/__init__.py
:232-257): the QO*/QC* element-label swap (QOss/QOmin/QOmax filter
atomic number 6 — carbon; QCss/QCmin/QCmax filter 8 — oxygen), and
``Rnc``/``Rpc`` computing max(arr)/Σneg resp. max(arr)/Σpos (the
source's reln_sum/relp_sum use ``max``, not the extremum matching the
sign).  Division by an empty-signed sum yields ±inf/nan exactly as
numpy gives the reference; CalcElementCharge's empty-selection → 0
is kept; LDI on a bond-free molecule (reference: ZeroDivisionError)
yields NaN here, documented deviation as for Hy.
"""

from __future__ import annotations

import warnings

import numpy as np

from ifeatureomega_cli_spark.functions.molgraph import MolGraph

# (a, b, c) by element and — for C/N/O — hybridization mode
# (0=sp, 1=sp2, 2=sp3), Gasteiger-Marsili 1980 Table 1
_PARAMS: dict[tuple[int, int], tuple[float, float, float]] = {
    (1, 2): (7.17, 6.24, -0.56),
    (6, 2): (7.98, 9.18, 1.88),
    (6, 1): (8.79, 9.32, 1.51),
    (6, 0): (10.39, 9.45, 0.73),
    (7, 2): (11.54, 10.82, 1.36),
    (7, 1): (12.87, 11.15, 0.85),
    (7, 0): (15.68, 11.70, -0.27),
    (8, 2): (14.18, 12.92, 1.39),
    (8, 1): (17.07, 13.79, 0.47),
    (9, 2): (14.66, 13.85, 2.31),
    (17, 2): (11.00, 9.69, 1.35),
    (35, 2): (10.08, 8.47, 1.16),
    (53, 2): (9.90, 7.96, 0.96),
    (16, 2): (10.14, 9.13, 1.38),
    (15, 2): (8.90, 8.24, 0.96),   # post-1980 extension value — parity
                                   # layer adjudicates
}
_CHI_PLUS_H = 20.02                # the paper's special cation χ for H


def _param(z: int, mode: int) -> tuple[float, float, float]:
    for m in (mode, 2, 1, 0):
        if (z, m) in _PARAMS:
            return _PARAMS[(z, m)]
    return (0.0, 0.0, 0.0)         # unparameterized element: inert
                                   # (transfers skipped), like RDKit's
                                   # throwOnParamFailure=False path


def gasteiger_charges(mol: MolGraph, n_iter: int = 12
                      ) -> tuple[np.ndarray, np.ndarray]:
    """PEOE partial charges.

    Returns ``(q, q_h)``: ``q[i]`` the charge of graph atom i (heavy or
    explicit H), ``q_h[i]`` the charge of EACH implicit hydrogen
    attached to atom i (NaN where none) — hydrogens on one heavy atom
    are symmetric, so a single trajectory per heavy atom is exact.
    """
    n = mol.n_atoms
    hyb = mol.hybridization()
    abc = np.zeros((n, 3), dtype=np.float64)
    for i, at in enumerate(mol.atoms):
        abc[i] = _param(at.atomic_num, hyb[i])
    chi_plus = abc.sum(axis=1)
    for i, at in enumerate(mol.atoms):
        if at.atomic_num == 1:
            chi_plus[i] = _CHI_PLUS_H
    h_abc = np.array(_PARAMS[(1, 2)])
    hc = np.array([a.h_count for a in mol.atoms], dtype=np.float64)

    q = np.array([float(a.charge) for a in mol.atoms], dtype=np.float64)
    q_h = np.zeros(n, dtype=np.float64)
    bonds = [(bd.a, bd.b) for bd in mol.bonds]
    for it in range(n_iter):
        damp = 0.5 ** (it + 1)
        chi = abc[:, 0] + abc[:, 1] * q + abc[:, 2] * q * q
        chi_h = h_abc[0] + h_abc[1] * q_h + h_abc[2] * q_h * q_h
        dq = np.zeros(n)
        dq_h = np.zeros(n)
        for a, b in bonds:
            ca, cb = chi[a], chi[b]
            if ca == cb:
                continue
            lo = b if ca > cb else a
            denom = chi_plus[lo]
            if denom == 0.0:
                continue
            d = abs(ca - cb) / denom * damp
            if ca > cb:
                dq[a] -= d
                dq[b] += d
            else:
                dq[b] -= d
                dq[a] += d
        for i in range(n):
            if not hc[i]:
                continue
            ci, ch = chi[i], chi_h[i]
            if ci == ch:
                continue
            if ci > ch:                       # heavy attracts from each H
                d = (ci - ch) / _CHI_PLUS_H * damp
                dq[i] -= hc[i] * d
                dq_h[i] += d
            else:
                denom = chi_plus[i]
                if denom == 0.0:
                    continue
                d = (ch - ci) / denom * damp
                dq[i] += hc[i] * d
                dq_h[i] -= d
        q += dq
        q_h += dq_h
    q_h[hc == 0] = np.nan
    return q, q_h


def _all_charges(mol: MolGraph) -> tuple[np.ndarray, np.ndarray]:
    """Flattened AddHs view: per-atom charges and atomic numbers, heavy
    atoms first then one entry per implicit hydrogen — the array the
    reference's CalcElementCharge loops over."""
    q, q_h = gasteiger_charges(mol)
    zs = [a.atomic_num for a in mol.atoms]
    qs = list(q)
    for i, a in enumerate(mol.atoms):
        qs.extend([q_h[i]] * a.h_count)
        zs.extend([1] * a.h_count)
    return np.array(qs, dtype=np.float64), np.array(zs, dtype=np.int64)


def _element_charge(qs: np.ndarray, zs: np.ndarray, z: int, method
                    ) -> float:
    """chem/charge.py:10-26 CalcElementCharge: select by atomic number
    (0 = all), apply the aggregate, 0 for an empty selection."""
    arr = qs if z == 0 else qs[zs == z]
    if arr.size == 0:
        return 0.0
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        with np.errstate(divide="ignore", invalid="ignore"):
            return float(method(arr))


def charge_descriptors(mol: MolGraph) -> np.ndarray:
    """The 'Charge' family, reference coder order (:9830): SPP, LDI,
    Rnc, Rpc, Mac, Tac, Mnc, Tnc, Mpc, Tpc, Qass, QOss, QNss, QCss,
    QHss, Qmin, QOmin, QNmin, QCmin, QHmin, Qmax, QOmax, QNmax, QCmax,
    QHmax — 25 values, quirks in the module docstring."""
    qs, zs = _all_charges(mol)

    def sqsum(a):
        return np.sum(np.square(a))

    def reln_sum(a):
        return max(a) / np.sum(a[a < 0])

    def relp_sum(a):
        return max(a) / np.sum(a[a > 0])

    spp = round(_element_charge(qs, zs, 0, np.max)
                - _element_charge(qs, zs, 0, np.min), 3)

    # LDI: heavy-graph bonds, heavy-atom charges (the reference runs
    # this coder on the non-AddHs mol; charges are identical because
    # implicit Hs participate either way)
    q, _qh = gasteiger_charges(mol)
    heavy_bonds = [(bd.a, bd.b) for bd in mol.bonds
                   if mol.atoms[bd.a].atomic_num > 1
                   and mol.atoms[bd.b].atomic_num > 1]
    if heavy_bonds:
        ldi = round(
            sum(abs(q[a] - q[b]) for a, b in heavy_bonds)
            / len(heavy_bonds), 3)
    else:
        ldi = float("nan")

    ec = _element_charge
    vals = [
        spp, ldi,
        ec(qs, zs, 0, reln_sum), ec(qs, zs, 0, relp_sum),
        ec(qs, zs, 0, lambda a: np.mean(np.absolute(a))),
        ec(qs, zs, 0, lambda a: np.sum(np.absolute(a))),
        ec(qs, zs, 0, lambda a: np.mean(a[a < 0])),
        ec(qs, zs, 0, lambda a: np.sum(a[a < 0])),
        ec(qs, zs, 0, lambda a: np.mean(a[a > 0])),
        ec(qs, zs, 0, lambda a: np.sum(a[a > 0])),
        ec(qs, zs, 0, sqsum),
        # the reference's QO*/QC* label swap: QO* filters z=6 (carbon),
        # QC* filters z=8 (oxygen) — chem/__init__.py:243-257
        ec(qs, zs, 6, sqsum), ec(qs, zs, 7, sqsum), ec(qs, zs, 8, sqsum),
        ec(qs, zs, 1, sqsum),
        ec(qs, zs, 0, np.min), ec(qs, zs, 6, np.min),
        ec(qs, zs, 7, np.min), ec(qs, zs, 8, np.min),
        ec(qs, zs, 1, np.min),
        ec(qs, zs, 0, np.max), ec(qs, zs, 6, np.max),
        ec(qs, zs, 7, np.max), ec(qs, zs, 8, np.max),
        ec(qs, zs, 1, np.max),
    ]
    return np.array(vals, dtype=np.float64)


CHARGE_FAMILIES = {
    "Charge": charge_descriptors,
}
