"""Pure-Python SMILES → molecular graph, no RDKit.

Supports what the reference's graph-computable chem/ families
(constitution, topology, connectivity, kappa — ref chem/constitution.py,
chem/topology.py, chem/connectivity.py, chem/kappa.py) actually need:
atoms with element / aromaticity / charge / hydrogen counts, bonds with
order, rings (SSSR), the topological distance matrix, Hall-Kier valence
deltas, path enumeration, and the three star SMARTS cluster patterns.

Grammar coverage (Daylight SMILES): organic-subset atoms (B C N O P S F
Cl Br I), aromatic lowercase (b c n o p s + bracket as/se), bracket atoms
`[isotope symbol chirality Hn charge :map]`, branches, ring-closure
digits and `%nn`, bond symbols ``- = # $ : / \\`` (directional bonds
parse as single; chirality and atom maps are parsed and discarded — no
descriptor below depends on them), and `.`-separated components.

Implicit hydrogens follow the Daylight rule: bracket atoms carry exactly
their stated H count; organic-subset atoms fill to the smallest normal
valence ≥ the bond-order sum, with aromatic bonds counted 1.5 (benzene c
→ 3.0 → one H; pyridine n → 3.0 → none; fused-junction c → 4.5 → none).
No kekulization is performed — every consumer treats aromatic bonds as
the distinct order 1.5, exactly as the reference's SMARTS counts do
(`[*]-[*]` / `[*]=[*]` never match aromatic bonds, `[*]:[*]` only them).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# element data (public periodic-table constants)
_ATOMIC_NUM = {
    "H": 1, "Li": 3, "B": 5, "C": 6, "N": 7, "O": 8, "F": 9, "Na": 11,
    "Mg": 12, "Si": 14, "P": 15, "S": 16, "Cl": 17, "K": 19, "Ca": 20,
    "Fe": 26, "Zn": 30, "As": 33, "Se": 34, "Br": 35, "I": 53,
}
_SYMBOL = {v: k for k, v in _ATOMIC_NUM.items()}
# monoisotopic (most-abundant-isotope) masses, for ExactMolWt
_MONO_MASS = {
    1: 1.00782503207, 3: 7.01600455, 5: 11.0093054, 6: 12.0,
    7: 14.0030740048, 8: 15.9949146196, 9: 18.99840322, 11: 22.9897692809,
    12: 23.9850417, 14: 27.9769265325, 15: 30.97376163, 16: 31.972071,
    17: 34.96885268, 19: 38.96370668, 20: 39.96259098, 26: 55.9349375,
    30: 63.9291422, 33: 74.9215965, 34: 79.9165213, 35: 78.9183371,
    53: 126.904473,
}
# valence-shell (outer) electron counts — GetNOuterElecs
_OUTER_ELECS = {
    1: 1, 3: 1, 5: 3, 6: 4, 7: 5, 8: 6, 9: 7, 11: 1, 12: 2, 14: 4,
    15: 5, 16: 6, 17: 7, 19: 1, 20: 2, 26: 8, 30: 12, 33: 5, 34: 6,
    35: 7, 53: 7,
}
# Daylight normal valences for implicit-H filling (organic subset)
_NORMAL_VALENCES = {
    5: (3,), 6: (4,), 7: (3, 5), 8: (2,), 15: (3, 5), 16: (2, 4, 6),
    9: (1,), 17: (1,), 35: (1,), 53: (1,),
}
_ORGANIC = {"B", "C", "N", "O", "P", "S", "F", "Cl", "Br", "I"}
_AROMATIC_ORGANIC = {"b", "c", "n", "o", "p", "s"}
_BOND_ORDER = {"-": 1.0, "=": 2.0, "#": 3.0, "$": 4.0, ":": 1.5,
               "/": 1.0, "\\": 1.0}


class SmilesError(ValueError):
    pass


@dataclass
class Atom:
    symbol: str
    aromatic: bool = False
    charge: int = 0
    explicit_h: int | None = None  # bracket atoms: exact; else None
    isotope: int = 0
    h_count: int = 0               # resolved total H (after parse)

    @property
    def atomic_num(self) -> int:
        return _ATOMIC_NUM[self.symbol]


@dataclass
class Bond:
    a: int
    b: int
    order: float  # 1, 1.5 (aromatic), 2, 3

    @property
    def aromatic(self) -> bool:
        return self.order == 1.5


@dataclass
class MolGraph:
    atoms: list[Atom] = field(default_factory=list)
    bonds: list[Bond] = field(default_factory=list)

    # -- construction -----------------------------------------------------
    def _neighbors(self) -> list[list[tuple[int, float]]]:
        nbr: list[list[tuple[int, float]]] = [[] for _ in self.atoms]
        for bd in self.bonds:
            nbr[bd.a].append((bd.b, bd.order))
            nbr[bd.b].append((bd.a, bd.order))
        return nbr

    def _demote_nonring_aromatic_bonds(self) -> None:
        """A bond between two aromatic atoms is aromatic only IN a ring
        (Daylight); the biphenyl inter-ring bond is single.  A bond lies
        in a ring iff its endpoints stay connected without it."""
        nbr = self._neighbors()
        for k, bd in enumerate(self.bonds):
            if bd.order != 1.5:
                continue
            seen = {bd.a}
            stack = [bd.a]
            in_ring = False
            while stack and not in_ring:
                u = stack.pop()
                for v, _ in nbr[u]:
                    if u == bd.a and v == bd.b:
                        continue  # skip the bond itself (once; parallel
                        # bonds are impossible in SMILES)
                    if v == bd.b:
                        in_ring = True
                        break
                    if v not in seen:
                        seen.add(v)
                        stack.append(v)
            if not in_ring:
                bd.order = 1.0

    def _resolve_hydrogens(self) -> None:
        order_sum = [0.0] * len(self.atoms)
        arom_deg = [0] * len(self.atoms)
        for bd in self.bonds:
            o = 1.0 if bd.order == 1.5 else bd.order
            order_sum[bd.a] += o
            order_sum[bd.b] += o
            if bd.order == 1.5:
                arom_deg[bd.a] += 1
                arom_deg[bd.b] += 1
        for i, at in enumerate(self.atoms):
            if at.explicit_h is not None:  # bracket atom: exact H count
                at.h_count = at.explicit_h
                continue
            valences = _NORMAL_VALENCES.get(at.atomic_num, ())
            need = math.ceil(order_sum[i] - 1e-9)
            if at.aromatic and arom_deg[i]:
                # kekulization shortcut: the atom hosts one ring double
                # bond if its lowest normal valence has room (benzene c →
                # 1 H; pyridine n → 0), else it is the pyrrole-type
                # σ+lone-pair case (3-connected n, o, s → 0 H)
                v = valences[0] if valences else need
                at.h_count = max(0, v - need - 1) if v - need - 1 >= 0 \
                    else max(0, v - need)
                continue
            for v in valences:
                if v >= need:
                    at.h_count = v - need
                    break
            else:
                at.h_count = 0  # hypervalent: no implicit H (Daylight)

    # -- basic tables -----------------------------------------------------
    @property
    def n_atoms(self) -> int:
        """Heavy atoms (SMILES molecules carry H only implicitly — same
        atom universe as RDKit's MolFromSmiles output)."""
        return len(self.atoms)

    @property
    def n_bonds(self) -> int:
        return len(self.bonds)

    def degrees(self) -> np.ndarray:
        d = np.zeros(len(self.atoms), dtype=np.int64)
        for bd in self.bonds:
            d[bd.a] += 1
            d[bd.b] += 1
        return d

    def adjacency(self) -> np.ndarray:
        n = len(self.atoms)
        A = np.zeros((n, n), dtype=np.float64)
        for bd in self.bonds:
            A[bd.a, bd.b] = A[bd.b, bd.a] = 1.0
        return A

    def n_components(self) -> int:
        n = len(self.atoms)
        seen = [False] * n
        nbr = self._neighbors()
        comps = 0
        for s in range(n):
            if seen[s]:
                continue
            comps += 1
            stack = [s]
            seen[s] = True
            while stack:
                u = stack.pop()
                for v, _ in nbr[u]:
                    if not seen[v]:
                        seen[v] = True
                        stack.append(v)
        return comps

    def distance_matrix(self, use_bond_order: bool = False) -> np.ndarray:
        """Topological distances (BFS hop counts); use_bond_order=True
        weights each edge 1/order (single 1, double ½, triple ⅓, aromatic
        ⅔) — the matrix RDKit's BalabanJ uses (GetDistanceMatrix useBO=1).
        Unreachable pairs get 1e8, RDKit's sentinel."""
        n = len(self.atoms)
        D = np.full((n, n), 1e8, dtype=np.float64)
        np.fill_diagonal(D, 0.0)
        if not use_bond_order:
            nbr = self._neighbors()
            for s in range(n):
                row = D[s]
                queue = [s]
                while queue:
                    nxt = []
                    for u in queue:
                        du = row[u]
                        for v, _ in nbr[u]:
                            if row[v] > du + 1:
                                row[v] = du + 1
                                nxt.append(v)
                    queue = nxt
            return D
        # weighted: Dijkstra per source (molecular graphs are tiny)
        import heapq
        nbr = self._neighbors()
        for s in range(n):
            row = D[s]
            pq = [(0.0, s)]
            while pq:
                du, u = heapq.heappop(pq)
                if du > row[u]:
                    continue
                for v, order in nbr[u]:
                    alt = du + 1.0 / order
                    if alt < row[v] - 1e-12:
                        row[v] = alt
                        heapq.heappush(pq, (alt, v))
        return D

    # -- rings ------------------------------------------------------------
    def sssr(self) -> list[tuple[int, ...]]:
        """Smallest set of smallest rings: shortest cycle through every
        ring bond, deduplicated, then a GF(2)-independent basis of size
        bonds − atoms + components picked smallest-first (matches RDKit's
        GetRingInfo().AtomRings() on fused systems like naphthalene or
        caffeine's 6-5 core)."""
        rank_target = self.n_bonds - self.n_atoms + self.n_components()
        if rank_target <= 0:
            return []
        nbr = self._neighbors()
        bond_idx = {}
        for k, bd in enumerate(self.bonds):
            bond_idx[(bd.a, bd.b)] = k
            bond_idx[(bd.b, bd.a)] = k
        candidates: dict[frozenset[int], tuple[int, ...]] = {}
        for bd in self.bonds:
            # shortest path a→b avoiding the bond itself = smallest ring
            # through this bond
            a, b = bd.a, bd.b
            prev = {a: -1}
            queue = [a]
            while queue and b not in prev:
                nxt = []
                for u in queue:
                    for v, _ in nbr[u]:
                        if u == a and v == b:
                            continue
                        if v not in prev:
                            prev[v] = u
                            nxt.append(v)
                queue = nxt
            if b not in prev:
                continue  # bridge bond, no ring
            path = [b]
            while path[-1] != a:
                path.append(prev[path[-1]])
            ring = tuple(path)
            key = frozenset(ring)
            if key not in candidates or len(candidates[key]) > len(ring):
                candidates[key] = ring
        # GF(2) independence over bond-membership vectors, smallest first
        rings = sorted(candidates.values(), key=len)
        basis: list[int] = []  # bitmasks, kept in row-echelon form
        out: list[tuple[int, ...]] = []
        for ring in rings:
            mask = 0
            for i in range(len(ring)):
                mask |= 1 << bond_idx[(ring[i], ring[(i + 1) % len(ring)])]
            cur = mask
            for b_mask in basis:
                cur = min(cur, cur ^ b_mask)
            if cur:
                basis.append(cur)
                out.append(ring)
                if len(out) == rank_target:
                    break
        return out

    # -- per-atom chemistry -----------------------------------------------
    def total_h(self) -> np.ndarray:
        return np.array([a.h_count for a in self.atoms], dtype=np.int64)

    def hybridization(self) -> list[int]:
        """0=sp, 1=sp2, 2=sp3 — perceived from bond orders (aromatic →
        sp2; triple or cumulated double → sp; any double → sp2).  A
        simplification of RDKit's perception that agrees on ordinary
        organics; lone-pair-driven cases (amide N outside rings) land on
        sp3 where RDKit says sp2 — flagged in the conditional RDKit
        cross-check, not silently."""
        kinds = []
        n_double = [0] * len(self.atoms)
        n_triple = [0] * len(self.atoms)
        for bd in self.bonds:
            if bd.order == 2.0:
                n_double[bd.a] += 1
                n_double[bd.b] += 1
            elif bd.order >= 3.0:
                n_triple[bd.a] += 1
                n_triple[bd.b] += 1
        for i, at in enumerate(self.atoms):
            if n_triple[i] or n_double[i] >= 2:
                kinds.append(0)
            elif at.aromatic or n_double[i]:
                kinds.append(1)
            else:
                kinds.append(2)
        return kinds

    def hk_deltas(self) -> np.ndarray:
        """Hall-Kier valence deltas (ref chem/connectivity.py:170-187 /
        RDKit GraphDescriptors._hkDeltas with skipHs=0): for Z>1,
        nV−nHs if Z<10 else (nV−nHs)/(Z−nV−1)."""
        out = np.zeros(len(self.atoms), dtype=np.float64)
        for i, at in enumerate(self.atoms):
            z = at.atomic_num
            if z <= 1:
                continue
            nv = _OUTER_ELECS[z]
            nhs = at.h_count
            out[i] = float(nv - nhs) if z < 10 else \
                float(nv - nhs) / float(z - nv - 1)
        return out

    def hall_kier_alpha(self) -> float:
        """Σ covalent-radius-ratio alphas (Kier-Hall; the table RDKit's
        HallKierAlpha uses), by element and hybridization."""
        table = {
            "C": (-0.22, -0.13, 0.0), "N": (-0.29, -0.2, -0.04),
            "O": (None, -0.2, -0.04), "F": (None, None, -0.07),
            "P": (None, 0.3, 0.43), "S": (0.0, 0.22, 0.35),
            "Cl": (None, None, 0.29), "Br": (None, None, 0.48),
            "I": (None, None, 0.73),
        }
        hyb = self.hybridization()
        total = 0.0
        for i, at in enumerate(self.atoms):
            row = table.get(at.symbol)
            if row is None:
                continue
            v = row[hyb[i]]
            total += v if v is not None else row[2]
        return total

    def principal_quantum_numbers(self) -> np.ndarray:
        out = np.zeros(len(self.atoms), dtype=np.int64)
        for i, at in enumerate(self.atoms):
            z = at.atomic_num
            out[i] = (1 if z <= 2 else 2 if z <= 10 else 3 if z <= 18
                      else 4 if z <= 36 else 5 if z <= 54 else 6 if z <= 86
                      else 7)
        return out

    def exact_mol_wt(self) -> float:
        """Monoisotopic weight including implicit hydrogens (RDKit
        Descriptors.ExactMolWt after AddHs — identical, since AddHs only
        materializes the already-counted implicit hydrogens)."""
        w = 0.0
        for at in self.atoms:
            w += _MONO_MASS[at.atomic_num] + at.h_count * _MONO_MASS[1]
        return w

    # -- path enumeration -------------------------------------------------
    def count_bond_paths(self, n: int) -> int:
        """Number of simple paths of n BONDS (distinct atoms and bonds),
        each undirected path counted once, PLUS rings of exactly n bonds
        (one count per distinct ring) — the semantics of RDKit's
        FindAllPathsOfLengthN(mol, n) as used by the reference's
        PathsOfLengthN / CalcKappa.  Ring-closure counting is documented
        in tests/test_chem_graph.py; molecules without rings of size ≤ n
        are unaffected."""
        if n <= 0:
            return 0
        if n == 1:
            return self.n_bonds
        nbr = self._neighbors()
        count = 0
        # open simple paths: DFS from each atom, count each path once by
        # requiring start < end (ties impossible: distinct atoms)
        def dfs(u: int, depth: int, visited: set[int], start: int):
            nonlocal count
            if depth == n:
                if start < u:
                    count += 1
                return
            for v, _ in nbr[u]:
                if v not in visited:
                    visited.add(v)
                    dfs(v, depth + 1, visited, start)
                    visited.remove(v)
        for s in range(len(self.atoms)):
            dfs(s, 0, {s}, s)
        # closed rings of exactly n bonds, one count each
        for ring in self._all_rings_of_size(n):
            count += 1
        return count

    def atom_paths_upto(self, max_atoms: int) -> dict[int, list[tuple]]:
        """All simple paths of 2..max_atoms atoms in ONE DFS (every
        prefix of a simple path is itself a simple path, so one
        depth-limited traversal yields every length simultaneously);
        each undirected path appears once.  The chi indices consume
        orders 2-11 — enumerating per order repeats the dominant
        longest-depth traversal 18× (deg + valence variants), which this
        replaces with one pass."""
        nbr = self._neighbors()
        out: dict[int, list[tuple]] = {k: [] for k in
                                       range(2, max_atoms + 1)}

        def dfs(path: list[int], visited: set[int]):
            if 2 <= len(path) <= max_atoms and path[0] < path[-1]:
                out[len(path)].append(tuple(path))
            if len(path) == max_atoms:
                return
            for v, _ in nbr[path[-1]]:
                if v not in visited:
                    path.append(v)
                    visited.add(v)
                    dfs(path, visited)
                    visited.remove(v)
                    path.pop()

        if max_atoms >= 2:
            for s in range(len(self.atoms)):
                dfs([s], {s})
        return out

    def atom_paths(self, n_atoms: int):
        """All simple paths of n_atoms atoms (n_atoms−1 bonds), each
        undirected path yielded once — FindAllPathsOfLengthN(useBonds=0),
        the form the chi indices consume."""
        nbr = self._neighbors()
        out: list[tuple[int, ...]] = []

        def dfs(path: list[int], visited: set[int]):
            if len(path) == n_atoms:
                if path[0] < path[-1]:
                    out.append(tuple(path))
                return
            for v, _ in nbr[path[-1]]:
                if v not in visited:
                    path.append(v)
                    visited.add(v)
                    dfs(path, visited)
                    visited.remove(v)
                    path.pop()

        if n_atoms >= 2:
            for s in range(len(self.atoms)):
                dfs([s], {s})
        return out

    def _all_rings_of_size(self, n: int) -> list[frozenset[int]]:
        """Distinct simple cycles with exactly n bonds (= n atoms)."""
        nbr = self._neighbors()
        found: set[frozenset[int]] = set()

        def dfs(path: list[int], visited: set[int]):
            u = path[-1]
            for v, _ in nbr[u]:
                if len(path) == n and v == path[0]:
                    found.add(frozenset(path))
                elif len(path) < n and v not in visited and v > path[0]:
                    # v > start prunes rotations; reflections collapse in
                    # the frozenset
                    path.append(v)
                    visited.add(v)
                    dfs(path, visited)
                    visited.remove(v)
                    path.pop()

        if n >= 3:
            for s in range(len(self.atoms)):
                dfs([s], {s})
        return sorted(found, key=sorted)

    # -- star-pattern clusters (SMARTS *~*(~*)~* family) ------------------
    def cluster_matches(self, tag: str) -> list[frozenset[int]]:
        """Unique atom sets matching the reference's Chinc SMARTS
        (chem/connectivity.py:87-91): '3' = *~*(~*)~* (center + 3
        neighbors), '4' = *~*(~*)(~*)~* (center + 4), '4p' =
        *~*(~*)~*~* (center + 2 neighbors + a 2-path).  Uniquified by
        atom set — GetSubstructMatches' default."""
        nbr = [sorted(v for v, _ in ns) for ns in self._neighbors()]
        deg = self.degrees()
        out: set[frozenset[int]] = set()
        if tag == "3":
            from itertools import combinations
            for c in range(len(self.atoms)):
                for trio in combinations(nbr[c], 3):
                    out.add(frozenset((c,) + trio))
        elif tag == "4":
            from itertools import combinations
            for c in range(len(self.atoms)):
                for quad in combinations(nbr[c], 4):
                    out.add(frozenset((c,) + quad))
        elif tag == "4p":
            from itertools import combinations
            for c in range(len(self.atoms)):
                if deg[c] < 3:
                    continue
                for d in nbr[c]:
                    for e in nbr[d]:
                        if e == c:
                            continue
                        rest = [x for x in nbr[c] if x != d]
                        for pair in combinations(rest, 2):
                            s = frozenset((c, d, e) + pair)
                            if len(s) == 5:
                                out.add(s)
        else:
            raise KeyError(f"unknown cluster tag {tag!r}")
        return sorted(out, key=sorted)


# -------------------------------------------------------------------------
# parser
# -------------------------------------------------------------------------

def parse_smiles(s: str) -> MolGraph:
    """Parse a SMILES string; raises SmilesError on malformed input
    (unbalanced brackets/branches, unknown element, dangling ring bond,
    dangling bond symbol)."""
    if not s:
        raise SmilesError("empty SMILES")
    mol = MolGraph()
    i = 0
    n = len(s)
    prev_atom: int | None = None
    pending_bond: str | None = None
    branch_stack: list[tuple[int | None, str | None]] = []
    ring_open: dict[int, tuple[int, str | None]] = {}

    def add_atom(symbol: str, aromatic: bool, charge: int = 0,
                 explicit_h: int | None = None, isotope: int = 0) -> int:
        if symbol not in _ATOMIC_NUM:
            raise SmilesError(f"unknown element {symbol!r} in {s!r}")
        mol.atoms.append(Atom(symbol, aromatic, charge, explicit_h, isotope))
        return len(mol.atoms) - 1

    def bond_order(sym: str | None, a: int, b: int) -> float:
        if sym is not None:
            return _BOND_ORDER[sym]
        if mol.atoms[a].aromatic and mol.atoms[b].aromatic:
            return 1.5
        return 1.0

    def close_bond(new_idx: int):
        nonlocal prev_atom, pending_bond
        if prev_atom is not None:
            mol.bonds.append(Bond(prev_atom, new_idx,
                                  bond_order(pending_bond, prev_atom,
                                             new_idx)))
        elif pending_bond is not None:
            raise SmilesError(f"bond symbol with no preceding atom in {s!r}")
        pending_bond = None
        prev_atom = new_idx

    while i < n:
        ch = s[i]
        if ch in _BOND_ORDER:
            if pending_bond is not None:
                raise SmilesError(f"double bond symbol at {i} in {s!r}")
            pending_bond = ch
            i += 1
        elif ch == "(":
            branch_stack.append((prev_atom, pending_bond))
            pending_bond = None
            i += 1
        elif ch == ")":
            if not branch_stack:
                raise SmilesError(f"unbalanced ')' at {i} in {s!r}")
            prev_atom, pending_bond = branch_stack.pop()
            i += 1
        elif ch == ".":
            if pending_bond is not None:
                raise SmilesError(f"bond before '.' at {i} in {s!r}")
            prev_atom = None
            i += 1
        elif ch.isdigit() or ch == "%":
            if ch == "%":
                if i + 2 >= n or not s[i + 1: i + 3].isdigit():
                    raise SmilesError(f"bad %ring at {i} in {s!r}")
                num = int(s[i + 1: i + 3])
                i += 3
            else:
                num = int(ch)
                i += 1
            if prev_atom is None:
                raise SmilesError(f"ring digit before any atom in {s!r}")
            if num in ring_open:
                other, obond = ring_open.pop(num)
                if other == prev_atom:
                    raise SmilesError(f"self-ring bond {num} in {s!r}")
                sym = pending_bond if pending_bond is not None else obond
                mol.bonds.append(Bond(other, prev_atom,
                                      bond_order(sym, other, prev_atom)))
                pending_bond = None
            else:
                ring_open[num] = (prev_atom, pending_bond)
                pending_bond = None
        elif ch == "[":
            j = s.find("]", i)
            if j < 0:
                raise SmilesError(f"unclosed '[' at {i} in {s!r}")
            body = s[i + 1: j]
            i = j + 1
            close_bond(_parse_bracket(body, s, add_atom))
        elif ch.isalpha():
            two = s[i: i + 2]
            if two in ("Cl", "Br"):
                close_bond(add_atom(two, False))
                i += 2
            elif ch in _ORGANIC:
                close_bond(add_atom(ch, False))
                i += 1
            elif ch in _AROMATIC_ORGANIC:
                close_bond(add_atom(ch.upper(), True))
                i += 1
            else:
                raise SmilesError(f"unexpected atom {ch!r} at {i} in {s!r}")
        else:
            raise SmilesError(f"unexpected character {ch!r} at {i} in {s!r}")

    if branch_stack:
        raise SmilesError(f"unbalanced '(' in {s!r}")
    if ring_open:
        raise SmilesError(f"dangling ring bond(s) {sorted(ring_open)} in {s!r}")
    if pending_bond is not None:
        raise SmilesError(f"dangling bond symbol in {s!r}")
    if not mol.atoms:
        raise SmilesError(f"no atoms in {s!r}")
    mol._demote_nonring_aromatic_bonds()
    mol._resolve_hydrogens()
    return mol


def _parse_bracket(body: str, full: str, add_atom) -> int:
    k = 0
    m = len(body)
    isotope = 0
    while k < m and body[k].isdigit():
        isotope = isotope * 10 + int(body[k])
        k += 1
    if k >= m:
        raise SmilesError(f"empty bracket atom in {full!r}")
    aromatic = False
    if body[k: k + 2] in ("se", "as"):
        symbol, aromatic, k = body[k: k + 2].capitalize(), True, k + 2
    elif k + 1 < m and body[k: k + 2] in _ATOMIC_NUM:
        symbol, k = body[k: k + 2], k + 2
    elif body[k].islower():
        symbol, aromatic, k = body[k].upper(), True, k + 1
    else:
        symbol, k = body[k], k + 1
    # chirality
    while k < m and body[k] == "@":
        k += 1
    if body[k: k + 2] in ("TH", "AL", "SP", "TB", "OH"):  # @TH1 etc.
        k += 2
        while k < m and body[k].isdigit():
            k += 1
    h = 0
    if k < m and body[k] == "H":
        k += 1
        h = 1
        if k < m and body[k].isdigit():
            h = int(body[k])
            k += 1
    charge = 0
    while k < m and body[k] in "+-":
        sign = 1 if body[k] == "+" else -1
        k += 1
        if k < m and body[k].isdigit():
            charge += sign * int(body[k])
            k += 1
        else:
            charge += sign
    if k < m and body[k] == ":":
        k += 1
        while k < m and body[k].isdigit():
            k += 1
    if k != m:
        raise SmilesError(f"bad bracket atom [{body}] in {full!r}")
    return add_atom(symbol, aromatic, charge, h, isotope)


def molecular_formula(mol: MolGraph) -> str:
    """Hill-order formula — a strong end-to-end check of parsing +
    implicit-hydrogen resolution (used by tests)."""
    counts: dict[str, int] = {}
    h = 0
    for at in mol.atoms:
        counts[at.symbol] = counts.get(at.symbol, 0) + 1
        h += at.h_count
    parts = []
    if "C" in counts:
        parts.append(("C", counts.pop("C")))
        if h:
            parts.append(("H", h))
            h = 0
    for sym in sorted(counts):
        parts.append((sym, counts[sym]))
    if h:
        parts.append(("H", h))
        parts.sort(key=lambda kv: kv[0])
    return "".join(f"{sym}{cnt if cnt > 1 else ''}" for sym, cnt in parts)


def write_smiles(mol: MolGraph) -> str:
    """Serialize a MolGraph back to SMILES (DFS spanning tree + numbered
    ring-closure bonds; organic-subset atoms bare, everything else — and
    any charged/isotopic/explicit-H-bearing atom — bracketed).

    Not canonical, but parse_smiles(write_smiles(g)) reconstructs an
    isomorphic graph with identical per-atom hydrogen counts — pinned by
    the hypothesis round-trip property in tests/test_chem_graph.py."""
    n = len(mol.atoms)
    nbr: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for bd in mol.bonds:
        nbr[bd.a].append((bd.b, bd.order))
        nbr[bd.b].append((bd.a, bd.order))

    _ORDER_SYM = {1.0: "", 2.0: "=", 3.0: "#", 4.0: "$"}

    def bond_sym(order: float, a: int, b: int) -> str:
        if order == 1.5:
            # aromatic bonds need no symbol between two aromatic atoms
            return "" if mol.atoms[a].aromatic and mol.atoms[b].aromatic \
                else ":"
        if order == 1.0 and mol.atoms[a].aromatic and mol.atoms[b].aromatic:
            return "-"  # biphenyl-style single between aromatic atoms
        return _ORDER_SYM[order]

    def atom_token(i: int) -> str:
        at = mol.atoms[i]
        sym = at.symbol.lower() if at.aromatic else at.symbol
        plain = at.symbol in _ORGANIC and at.charge == 0 \
            and at.isotope == 0 and at.explicit_h is None
        if plain:
            return sym
        h = at.h_count
        body = (str(at.isotope) if at.isotope else "") + sym
        if h:
            body += "H" + (str(h) if h > 1 else "")
        if at.charge:
            sign = "+" if at.charge > 0 else "-"
            body += sign + (str(abs(at.charge)) if abs(at.charge) > 1 else "")
        return f"[{body}]"

    # ring bonds = non-spanning-tree edges, found during DFS
    visited = [False] * n
    ring_num = [dict() for _ in range(n)]  # atom -> {partner: digit}
    next_digit = [1]
    edges_seen: set[tuple[int, int]] = set()

    def assign_rings(start: int):
        stack = [start]
        visited[start] = True
        parent = {start: -1}
        while stack:
            u = stack.pop()
            for v, order in nbr[u]:
                key = (min(u, v), max(u, v))
                if key in edges_seen:
                    continue
                if visited[v]:
                    edges_seen.add(key)  # ring closure
                    d = next_digit[0]
                    next_digit[0] += 1
                    ring_num[u][v] = d
                    ring_num[v][u] = d
                else:
                    edges_seen.add(key)
                    visited[v] = True
                    parent[v] = u
                    stack.append(v)

    def emit(u: int, parent: int, out: list[str],
             tree_visited: set[int]) -> None:
        tree_visited.add(u)
        out.append(atom_token(u))
        for v, digit in sorted(ring_num[u].items(), key=lambda kv: kv[1]):
            order = next(o for w, o in nbr[u] if w == v)
            # the closure bond symbol goes on whichever side is written
            # second; writing it on both is also legal — emit on both for
            # simplicity (Daylight allows matching symbols)
            out.append(bond_sym(order, u, v)
                       + (f"%{digit:02d}" if digit > 9 else str(digit)))
        children = [(v, o) for v, o in nbr[u]
                    if v != parent and v not in tree_visited
                    and v not in ring_num[u]]
        # a neighbor can appear in ring_num AND be an unvisited child when
        # multiple parallel paths exist — filtered above via ring_num
        for k, (v, order) in enumerate(children):
            if v in tree_visited:
                continue
            last = k == len(children) - 1
            frag: list[str] = [bond_sym(order, u, v)]
            sub: list[str] = []
            emit(v, u, sub, tree_visited)
            frag.extend(sub)
            if last:
                out.extend(frag)
            else:
                out.append("(")
                out.extend(frag)
                out.append(")")

    parts = []
    tree_visited: set[int] = set()
    for s in range(n):
        if not visited[s]:
            assign_rings(s)
    for s in range(n):
        if s not in tree_visited:
            chunk: list[str] = []
            emit(s, -1, chunk, tree_visited)
            parts.append("".join(chunk))
    return ".".join(parts)
