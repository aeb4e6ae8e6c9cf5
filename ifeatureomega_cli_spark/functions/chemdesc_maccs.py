"""MACCS keys (166-bit structural fingerprint), RDKit-free (round 7).

The reference's 'MACCS fingerprints' family (iFeatureOmegaCLI.py:9834,
chem/fingerprint.py:43-64) is ``MACCSkeys.GenMACCSKeys(mol)`` — the
public MDL MACCS 166-key definition as published in RDKit's
``Chem/MACCSkeys.py``: a table of (SMARTS, count) pairs where key *k*
is set when the molecule has MORE THAN *count* uniquified substructure
matches of the pattern, plus three special keys handled in code:

* key 1 (ISOTOPE) is not implemented in the published table ('?')
  and is never set;
* key 125 (aromatic ring count > 1) counts SSSR rings whose bonds
  are all aromatic;
* key 166 (fragments > 1) counts connected components.

The patterns are evaluated by the original SMARTS engine in
`functions/smarts.py`.  PARITY BOUNDARY, stated honestly: the table
below is transcribed from the published RDKit source; each entry is
pure data, so any transcription slip localises to that single key and
is adjudicated by the conditional exact-bit RDKit parity test
(tests/test_chem_rdkit_parity.py, skipped where RDKit is absent,
instant on any RDKit box).  Aromaticity is notation-carried
(molgraph.py:21-23, smarts.py module docstring) — on Kekulé-written
aromatics RDKit's perception may set ring/aromatic keys this engine
reads as aliphatic; the reference corpus uses aromatic notation,
where the conventions agree.

Output width is 167 per the engine's fingerprint-width table
(operators/ligand.py `_FP_WIDTHS`): RDKit's bit vector is 167 bits
with bit 0 unused (key k -> bit k), and the reference's own
``ConvertToNumpyArray`` into ``np.zeros(166)`` cannot accept it — the
same broken-contract note as the other fingerprint families.
"""

from __future__ import annotations

import numpy as np

from ifeatureomega_cli_spark.functions.molgraph import MolGraph
from ifeatureomega_cli_spark.functions.smarts import (
    MolProps, Query, _has_match, _search, allowed_anums, parse_smarts,
    required_anums)

# The published MDL/RDKit MACCS key table: key -> (SMARTS, count).
# '?' marks the three keys the published table leaves to code.
MACCS_SMARTS: dict[int, tuple[str, int]] = {
    1: ("?", 0),                                   # ISOTOPE (not impl.)
    2: ("[#104]", 0),                              # atomic num 104
    3: ("[#32,#33,#34,#50,#51,#52,#82,#83,#84]", 0),   # group IVa-VIa rows 4-6
    4: ("[Ac,Th,Pa,U,Np,Pu,Am,Cm,Bk,Cf,Es,Fm,Md,No,Lr]", 0),  # actinide
    5: ("[Sc,Ti,Y,Zr,Hf]", 0),                     # group IIIB, IVB
    6: ("[La,Ce,Pr,Nd,Pm,Sm,Eu,Gd,Tb,Dy,Ho,Er,Tm,Yb,Lu]", 0),  # lanthanide
    7: ("[V,Cr,Mn,Nb,Mo,Tc,Ta,W,Re]", 0),          # group VB, VIB, VIIB
    8: ("[!#6;!#1]1~*~*~*~1", 0),                  # QAAA@1
    9: ("[Fe,Co,Ni,Ru,Rh,Pd,Os,Ir,Pt]", 0),        # group VIII
    10: ("[Be,Mg,Ca,Sr,Ba,Ra]", 0),                # group IIa
    11: ("*1~*~*~*~1", 0),                         # 4M ring
    12: ("[Cu,Zn,Ag,Cd,Au,Hg]", 0),                # group IB, IIB
    13: ("[#8]~[#7](~[#6])~[#6]", 0),              # ON(C)C
    14: ("[#16]-[#16]", 0),                        # S-S
    15: ("[#8]~[#6](~[#8])~[#8]", 0),              # OC(O)O
    16: ("[!#6;!#1]1~*~*~1", 0),                   # QAA@1
    17: ("[#6]#[#6]", 0),                          # CTC
    18: ("[#5,#13,#31,#49,#81]", 0),               # group IIIA
    19: ("*1~*~*~*~*~*~*~1", 0),                   # 7M ring
    20: ("[#14]", 0),                              # Si
    21: ("[#6]=[#6](~[!#6;!#1])~[!#6;!#1]", 0),    # C=C(Q)Q
    22: ("*1~*~*~1", 0),                           # 3M ring
    23: ("[#7]~[#6](~[#8])~[#8]", 0),              # NC(O)O
    24: ("[#7]-[#8]", 0),                          # N-O
    25: ("[#7]~[#6](~[#7])~[#7]", 0),              # NC(N)N
    26: ("[#6]=;@[#6](@*)@*", 0),                  # C$=C($A)$A
    27: ("[I]", 0),                                # I
    28: ("[!#6;!#1]~[CH2]~[!#6;!#1]", 0),          # QCH2Q
    29: ("[#15]", 0),                              # P
    30: ("[#6]~[!#6;!#1](~[#6])(~[#6])~*", 0),     # CQ(C)(C)A
    31: ("[!#6;!#1]~[F,Cl,Br,I]", 0),              # QX
    32: ("[#6]~[#16]~[#7]", 0),                    # CSN
    33: ("[#7]~[#16]", 0),                         # NS
    34: ("[CH2]=*", 0),                            # CH2=A
    35: ("[Li,Na,K,Rb,Cs,Fr]", 0),                 # group IA
    36: ("[#16R]", 0),                             # S heterocycle
    37: ("[#7]~[#6](~[#8])~[#7]", 0),              # NC(O)N
    38: ("[#7]~[#6](~[#6])~[#7]", 0),              # NC(C)N
    39: ("[#8]~[#16](~[#8])~[#8]", 0),             # OS(O)O
    40: ("[#16]-[#8]", 0),                         # S-O
    41: ("[#6]#[#7]", 0),                          # CTN
    42: ("F", 0),                                  # F
    43: ("[!#6;!#1;!H0]~*~[!#6;!#1;!H0]", 0),      # QHAQH
    44: ("[!#1;!#6;!#7;!#8;!#16;!#9;!#17;!#35;!#53]", 0),  # OTHER
    45: ("[#6]=[#6]~[#7]", 0),                     # C=CN
    46: ("Br", 0),                                 # Br
    47: ("[#16]~*~[#7]", 0),                       # SAN
    48: ("[#8]~[!#6;!#1](~[#8])~[#8]", 0),         # OQ(O)O
    49: ("[!+0]", 0),                              # CHARGE
    50: ("[#6]=[#6](~[#6])~[#6]", 0),              # C=C(C)C
    51: ("[#6]~[#16]~[#8]", 0),                    # CSO
    52: ("[#7]~[#7]", 0),                          # NN
    53: ("[!#6;!#1;!H0]~*~*~*~[!#6;!#1;!H0]", 0),  # QHAAAQH
    54: ("[!#6;!#1;!H0]~*~*~[!#6;!#1;!H0]", 0),    # QHAAQH
    55: ("[#8]~[#16]~[#8]", 0),                    # OSO
    56: ("[#8]~[#7](~[#8])~[#6]", 0),              # ON(O)C
    57: ("[#8R]", 0),                              # O heterocycle
    58: ("[!#6;!#1]~[#16]~[!#6;!#1]", 0),          # QSQ
    59: ("[#16]!:*:*", 0),                         # Snot%A%A
    60: ("[#16]=[#8]", 0),                         # S=O
    61: ("*~[#16](~*)~*", 0),                      # AS(A)A
    62: ("*@*!@*@*", 0),                           # A$!A$A
    63: ("[#7]=[#8]", 0),                          # N=O
    64: ("*@*!@[#16]", 0),                         # A$A!S
    65: ("c:n", 0),                                # C%N
    66: ("[#6]~[#6](~[#6])(~[#6])~*", 0),          # CC(C)(C)A
    67: ("[!#6;!#1]~[#16]", 0),                    # QS
    68: ("[!#6;!#1;!H0]~[!#6;!#1;!H0]", 0),        # QHQH
    69: ("[!#6;!#1]~[!#6;!#1;!H0]", 0),            # QQH
    70: ("[!#6;!#1]~[#7]~[!#6;!#1]", 0),           # QNQ
    71: ("[#7]~[#8]", 0),                          # NO
    72: ("[#8]~*~*~[#8]", 0),                      # OAAO
    73: ("[#16]=*", 0),                            # S=A
    74: ("[CH3]~*~[CH3]", 0),                      # CH3ACH3
    75: ("*!@[#7]@*", 0),                          # A!N$A
    76: ("[#6]=[#6](~*)~*", 0),                    # C=C(A)A
    77: ("[#7]~*~[#7]", 0),                        # NAN
    78: ("[#6]=[#7]", 0),                          # C=N
    79: ("[#7]~*~*~[#7]", 0),                      # NAAN
    80: ("[#7]~*~*~*~[#7]", 0),                    # NAAAN
    81: ("[#16]~*(~*)~*", 0),                      # SA(A)A
    82: ("*~[CH2]~[!#6;!#1;!H0]", 0),              # ACH2QH
    83: ("[!#6;!#1]1~*~*~*~*~1", 0),               # QAAAA@1
    84: ("[NH2]", 0),                              # NH2
    85: ("[#6]~[#7](~[#6])~[#6]", 0),              # CN(C)C
    86: ("[C;H2,H3][!#6;!#1][C;H2,H3]", 0),        # CH2QCH2
    87: ("[F,Cl,Br,I]!@*@*", 0),                   # X!A$A
    88: ("[#16]", 0),                              # S
    89: ("[#8]~*~*~*~[#8]", 0),                    # OAAAO
    90: ("[$([!#6;!#1;!H0]~*~*~[CH2]~*),"
         "$([!#6;!#1;!H0;R]1@[R]@[R]@[CH2;R]1),"
         "$([!#6;!#1;!H0]~[R]1@[R]@[CH2;R]1)]", 0),        # QHAACH2A
    91: ("[$([!#6;!#1;!H0]~*~*~*~[CH2]~*),"
         "$([!#6;!#1;!H0;R]1@[R]@[R]@[R]@[CH2;R]1),"
         "$([!#6;!#1;!H0]~[R]1@[R]@[R]@[CH2;R]1),"
         "$([!#6;!#1;!H0]~*~[R]1@[R]@[CH2;R]1)]", 0),      # QHAAACH2A
    92: ("[#8]~[#6](~[#7])~[#6]", 0),              # OC(N)C
    93: ("[!#6;!#1]~[CH3]", 0),                    # QCH3
    94: ("[!#6;!#1]~[#7]", 0),                     # QN
    95: ("[#7]~*~*~[#8]", 0),                      # NAAO
    96: ("*1~*~*~*~*~1", 0),                       # 5M ring
    97: ("[#7]~*~*~*~[#8]", 0),                    # NAAAO
    98: ("[!#6;!#1]1~*~*~*~*~*~1", 0),             # QAAAAA@1
    99: ("[#6]=[#6]", 0),                          # C=C
    100: ("*~[CH2]~[#7]", 0),                      # ACH2N
    101: ("[$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]1),"
          "$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]1),"
          "$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]1),"
          "$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]1),"
          "$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]1),"
          "$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]1),"
          "$([R]@1@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]@[R]1)"
          "]", 0),                                 # 8M+ ring (up to 14)
    102: ("[!#6;!#1]~[#8]", 0),                    # QO
    103: ("Cl", 0),                                # Cl
    104: ("[!#6;!#1;!H0]~*~[CH2]~*", 0),           # QHACH2A
    105: ("*@*(@*)@*", 0),                         # A$A($A)$A
    106: ("[!#6;!#1]~*(~[!#6;!#1])~[!#6;!#1]", 0), # QA(Q)Q
    107: ("[F,Cl,Br,I]~*(~*)~*", 0),               # XA(A)A
    108: ("[CH3]~*~*~*~[CH2]~*", 0),               # CH3AAACH2A
    109: ("*~[CH2]~[#8]", 0),                      # ACH2O
    110: ("[#7]~[#6]~[#8]", 0),                    # NCO
    111: ("[#7]~*~[CH2]~*", 0),                    # NACH2A
    112: ("*~*(~*)(~*)~*", 0),                     # AA(A)(A)A
    113: ("[#8]!:*:*", 0),                         # Onot%A%A
    114: ("[CH3]~[CH2]~*", 0),                     # CH3CH2A
    115: ("[CH3]~*~[CH2]~*", 0),                   # CH3ACH2A
    116: ("[$([CH3]~*~*~[CH2]~*),"
          "$([CH3]~*1~*~[CH2]1)]", 0),             # CH3AACH2A
    117: ("[#7]~*~[#8]", 0),                       # NAO
    118: ("[$(*~[CH2]~[CH2]~*),$(*1~[CH2]~[CH2]1)]", 1),  # ACH2CH2A > 1
    119: ("[#7]=*", 0),                            # N=A
    120: ("[!#6;R]", 1),                           # heterocyclic atom > 1
    121: ("[#7;R]", 0),                            # N heterocycle
    122: ("*~[#7](~*)~*", 0),                      # AN(A)A
    123: ("[#8]~[#6]~[#8]", 0),                    # OCO
    124: ("[!#6;!#1]~[!#6;!#1]", 0),               # QQ
    125: ("?", 0),                                 # aromatic ring > 1
    126: ("*!@[#8]!@*", 0),                        # A!O!A
    127: ("*@*!@[#8]", 1),                         # A$A!O > 1
    128: ("[$(*~[CH2]~*~*~*~[CH2]~*),"
          "$([R]1@[CH2;R]@[R]@[R]@[R]@[CH2;R]1),"
          "$(*~[CH2]~[R]1@[R]@[R]@[CH2;R]1),"
          "$(*~[CH2]~*~[R]1@[R]@[CH2;R]1)]", 0),   # ACH2AAACH2A
    129: ("[$(*~[CH2]~*~*~[CH2]~*),"
          "$([R]1@[CH2;R]@[R]@[R]@[CH2;R]1),"
          "$(*~[CH2]~[R]1@[R]@[CH2;R]1)]", 0),     # ACH2AACH2A
    130: ("[!#6;!#1]~[!#6;!#1]", 1),               # QQ > 1
    131: ("[!#6;!#1;!H0]", 1),                     # QH > 1
    132: ("[#8]~*~[CH2]~*", 0),                    # OACH2A
    133: ("*@*!@[#7]", 0),                         # A$A!N
    134: ("[F,Cl,Br,I]", 0),                       # halogen
    135: ("[#7]!:*:*", 0),                         # Nnot%A%A
    136: ("[#8]=*", 1),                            # O=A > 1
    137: ("[!C;!c;R]", 0),                         # heterocycle
    138: ("[!#6;!#1]~[CH2]~*", 1),                 # QCH2A > 1
    139: ("[O;!H0]", 0),                           # OH
    140: ("[#8]", 3),                              # O > 3
    141: ("[CH3]", 2),                             # CH3 > 2
    142: ("[#7]", 1),                              # N > 1
    143: ("*@*!@[#8]", 0),                         # A$A!O
    144: ("*!:*:*!:*", 0),                         # Anot%A%Anot%A
    145: ("*1~*~*~*~*~*~1", 1),                    # 6M ring > 1
    146: ("[#8]", 2),                              # O > 2
    147: ("[$(*~[CH2]~[CH2]~*),"
          "$([R]1@[CH2;R]@[CH2;R]1)]", 0),         # ACH2CH2A
    148: ("*~[!#6;!#1](~*)~*", 0),                 # AQ(A)A
    149: ("[C;H3,H4]", 1),                         # CH3 > 1
    150: ("*!@*@*!@*", 0),                         # A!A$A!A
    151: ("[#7;!H0]", 0),                          # NH
    152: ("[#8]~[#6](~[#6])~[#6]", 0),             # OC(C)C
    153: ("[!#6;!#1]~[CH2]~*", 0),                 # QCH2A
    154: ("[#6]=[#8]", 0),                         # C=O
    155: ("*!@[CH2]!@*", 0),                       # A!CH2!A
    156: ("[#7]~*(~*)~*", 0),                      # NA(A)A
    157: ("[#6]-[#8]", 0),                         # C-O
    158: ("[#6]-[#7]", 0),                         # C-N
    159: ("[#8]", 1),                              # O > 1
    160: ("[C;H3,H4]", 0),                         # CH3
    161: ("[#7]", 0),                              # N
    162: ("a", 0),                                 # aromatic
    163: ("*1~*~*~*~*~*~1", 0),                    # 6M ring
    164: ("[#8]", 0),                              # O
    165: ("[R]", 0),                               # ring
    166: ("?", 0),                                 # fragments > 1 (code)
}

_compiled: list[tuple[int, Query, int, list[int], list[set[int]]]] | \
    None = None


def _compile() -> list[tuple[int, Query, int, list[int], list[set[int]]]]:
    """(key, query, count, required-anums, per-atom allowed-anum sets)
    for every SMARTS key; parsed once per process.  The two screens:
    `required` = elements a match must contain (with multiplicity,
    uniquely-pinned atoms only); `allowed` = for each query atom that
    pins its element in every OR branch, the set of candidates — a
    molecule disjoint from any such set cannot match (kills the metal /
    halogen / S / P keys on plain organics without running the
    matcher)."""
    global _compiled
    if _compiled is None:
        out = []
        for key, (patt, count) in MACCS_SMARTS.items():
            if patt == "?":
                continue
            q = parse_smarts(patt)
            allowed = [a for a in allowed_anums(q) if a is not None]
            out.append((key, q, count, required_anums(q), allowed))
        _compiled = out
    return _compiled


def maccs_fingerprint(mol: MolGraph) -> np.ndarray:
    """167-slot 0/1 vector; slot k = MACCS key k, slot 0 unused."""
    bits = np.zeros(167, dtype=np.float64)
    mp = MolProps(mol)
    counts = mp.anum_counts
    have = set(counts)
    for key, q, thresh, req, allowed in _compile():
        # cheap screens: every fully-pinned query atom needs a present
        # element, and the molecule must contain every element the
        # pattern pins uniquely (with multiplicity)
        ok = all(not have.isdisjoint(a) for a in allowed)
        if ok:
            for z in req:
                if counts.get(z, 0) < 1:
                    ok = False
                    break
        if not ok:
            continue
        if len(req) > 1:
            need: dict[int, int] = {}
            for z in req:
                need[z] = need.get(z, 0) + 1
            if any(counts.get(z, 0) < c for z, c in need.items()):
                continue
        if thresh == 0:
            if _has_match(mp, q):
                bits[key] = 1.0
        else:
            # distinct_gt stops the enumeration as soon as thresh+1
            # distinct atom sets exist — symmetric embeddings (12 of a
            # 6-ring pattern in benzene) need not all be walked
            raw = _search(mp, q, anchor=None, first_only=False,
                          distinct_gt=thresh)
            seen = {frozenset(m) for m in raw}
            if len(seen) > thresh:
                bits[key] = 1.0
    # key 125: aromatic SSSR ring count > 1 (RDKit counts rings whose
    # bonds are all aromatic; sssr() yields atoms in cycle order, so
    # the ring's own bonds are the consecutive pairs — chords of fused
    # systems belong to other rings and are not consulted)
    border = {}
    for b in mol.bonds:
        border[(b.a, b.b)] = border[(b.b, b.a)] = b.order
    n_arom = 0
    for ring in mol.sssr():
        if all(border[(ring[i], ring[(i + 1) % len(ring)])] == 1.5
               for i in range(len(ring))):
            n_arom += 1
    if n_arom > 1:
        bits[125] = 1.0
    # key 166: fragments > 1
    if mol.n_components() > 1:
        bits[166] = 1.0
    return bits


MACCS_FAMILIES = {
    "MACCS fingerprints": maccs_fingerprint,
}
