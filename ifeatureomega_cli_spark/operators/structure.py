"""Structure descriptors (iStructure, ref iFeatureOmegaCLI.py:8976-9786).

Round-3 scope change: 9 of the reference's 14 structure feature types are
pure coordinate geometry and need NO native binaries — they are implemented
here from the reference's math (file:line cited per function), leaving only
the DSSP-dependent (SS3/SS8 ×2) and MSMS-dependent (Residue depth) types as
honest stubs in structure_ligand.py:

* AAC_type1/2, GAAC_type1/2 — per-residue shell composition (:9333-9444);
  these are exactly the reference's own no-DSSP fallback path (:9213-9241).
* AC_type1/2 — per-CA-atom element-shell composition (:9245-9284,
  :9577-9632).
* Network-based index — residue contact graph metrics (:9633-9690);
  networkx is available in this container and is what the reference uses.
* HSE_CA / HSE_CB — half-sphere exposure (:9309-9332); the reference calls
  Bio.PDB's HSExposure, which implements Hamelryck, Proteins 59:38-48
  (2005); re-implemented from the published algorithm (biopython is not in
  this container, so exact Bio.PDB parity is pinned by property tests, not
  by golden comparison — see tests/test_structure.py).

Execution model: descriptors run per structure via groupBy(pdb_id).
applyInPandas — each structure is a few-thousand-row matrix (the right
pandas granularity), parallelism comes from the number of structures, and
nothing but the final feature rows leaves the executors.  At 100 TB the
atoms table is partitioned by pdb_id at write time so the groupBy is
shuffle-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# reference residue grouping (ref :9032-9054); order is the reference's
# group_list (:9400-9402)
AA_GROUPS = {
    "G": 0, "A": 0, "V": 0, "L": 0, "M": 0, "I": 0,          # aliphatic
    "F": 1, "Y": 1, "W": 1,                                   # aromatic
    "K": 2, "R": 2, "H": 2,                                   # positive charged
    "D": 3, "E": 3,                                           # negative charged
    "S": 4, "T": 4, "C": 4, "P": 4, "N": 4, "Q": 4,           # uncharged
}
GROUP_NAMES = ["aliphatic", "aromatic", "positive charged",
               "negative charged", "uncharged"]
_AA = "ACDEFGHIKLMNPQRSTVWY"
_ELEMENTS = "CNOS"


def _shell_edges(shell: tuple[int, int, int]) -> np.ndarray:
    """Shell starts: range(start, stop+1, step) (ref :9338)."""
    return np.arange(shell[0], shell[1] + 1, shell[2])


def shell_feature_names(kind: str, shell: tuple[int, int, int]) -> list[str]:
    keys = {"AAC": list(_AA), "GAAC": GROUP_NAMES,
            "AC": list(_ELEMENTS)}[kind]
    return [f"shell_{m+1}.{k}"
            for m in range(len(_shell_edges(shell))) for k in keys]


def _shell_comp(D: np.ndarray, classes: np.ndarray, n_classes: int,
                starts: np.ndarray, step: int, cumulative: bool,
                count_all_rows: bool) -> np.ndarray:
    """(n_targets, n_shells*n_classes) shell composition.

    D: (n_targets, n_sources) distances; classes: (n_sources,) class id or
    -1 for "counts toward nothing".  count_all_rows: denominator counts
    every source row in the shell (residue AAC/GAAC, ref :9351) vs only
    classified rows (atom AC, ref :9592-9598)."""
    nt = D.shape[0]
    ns = len(starts)
    out = np.zeros((nt, ns * n_classes))
    valid = classes >= 0
    for m, s in enumerate(starts):
        mask = (D < s + step) if cumulative else ((D >= s) & (D < s + step))
        # per-target class counts in this shell: one bincount over
        # (target_id * n_classes + class) of the masked pairs
        ti, si = np.nonzero(mask & valid[None, :])
        cnt = np.bincount(ti * n_classes + classes[si],
                          minlength=nt * n_classes).reshape(nt, n_classes)
        denom = (mask.sum(axis=1) if count_all_rows
                 else cnt.sum(axis=1)).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = cnt / denom[:, None]
        out[:, m * n_classes:(m + 1) * n_classes] = np.where(
            denom[:, None] > 0, frac, 0.0)
    return out


def _pairdist(X: np.ndarray, Y: np.ndarray | None = None) -> np.ndarray:
    """sqrt((dx·dx + dy·dy) + dz·dz) in a fixed evaluation order so the
    DuckDB oracle can reproduce the doubles bit-for-bit."""
    Y = X if Y is None else Y
    dx = X[:, 0][:, None] - Y[:, 0][None, :]
    dy = X[:, 1][:, None] - Y[:, 1][None, :]
    dz = X[:, 2][:, None] - Y[:, 2][None, :]
    return np.sqrt(dx * dx + dy * dy + dz * dz)


# target-chunk size for the per-structure distance matrices: memory per
# chunk ≈ TARGET_CHUNK × n_sources × 8 B (plus the shell mask), so a 50k-atom
# virus capsid peaks at ~1.6 GB/task instead of the 20 GB a full
# (targets × sources) matrix would need.  Values are unaffected — each
# target row's shell counts are independent.
TARGET_CHUNK = 4096


def _chunked_shell_feats(X_t, X_s, classes, n_classes, starts, step,
                         cumulative, count_all_rows, chunk=TARGET_CHUNK):
    out = []
    for lo in range(0, len(X_t), chunk):
        D = _pairdist(X_t[lo: lo + chunk], X_s)
        out.append(_shell_comp(D, classes, n_classes, starts, step,
                               cumulative, count_all_rows))
    return np.concatenate(out, axis=0) if out else np.zeros(
        (0, len(starts) * n_classes))


def residue_shell_composition(
    residues: DataFrame,
    kind: str = "AAC",
    type2: bool = False,
    shell: tuple[int, int, int] = (3, 20, 2),
    target_chunk: int = TARGET_CHUNK,
) -> DataFrame:
    """AAC/GAAC_type1/2 (ref :9333-9444): for every residue, the AA (or
    group) composition of residues whose representative atom (CB else CA)
    falls in each distance shell [s, s+step) — cumulative (−∞, s+step) for
    type2, which therefore includes the target itself at distance 0.
    Denominator = ALL residues in the shell (:9351).

    Input: residue_table() output (pdb_id, chain, resseq, resname, aa,
    x, y, z).  Output: one row per residue with `sample` formatted
    chain_resname_resseq like the reference index (:9209) and a features
    array ordered per shell_feature_names(kind, shell)."""
    if kind not in ("AAC", "GAAC"):
        raise ValueError("kind must be AAC or GAAC")
    n_classes = 20 if kind == "AAC" else 5
    starts = _shell_edges(shell)
    step = shell[2]
    cumulative = type2
    aa_index = {a: i for i, a in enumerate(_AA)}

    def per_structure(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["chain", "resseq"], kind="stable")
        X = pdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
        aas = pdf["aa"].to_numpy()
        if kind == "AAC":
            classes = np.array([aa_index[a] for a in aas], dtype=np.int64)
        else:
            classes = np.array([AA_GROUPS[a] for a in aas], dtype=np.int64)
        # icode'd residues are distance SOURCES but not targets — the
        # reference's model[chain][resseq] int-key lookup skips them
        # (sources/pdb.residue_table docstring)
        is_t = (pdf["icode"].fillna("") == "").to_numpy() \
            if "icode" in pdf.columns else np.ones(len(pdf), dtype=bool)
        feats = _chunked_shell_feats(X[is_t], X, classes, n_classes, starts,
                                     step, cumulative, count_all_rows=True,
                                     chunk=target_chunk)
        t = pdf[is_t]
        return pd.DataFrame({
            "pdb_id": t["pdb_id"].to_numpy(),
            "chain": t["chain"].to_numpy(),
            "resseq": t["resseq"].to_numpy(),
            "sample": (t["chain"].astype(str) + "_" + t["resname"]
                       + "_" + t["resseq"].astype(str)).to_numpy(),
            "features": list(feats),
        })

    return residues.groupBy("pdb_id").applyInPandas(
        per_structure,
        schema="pdb_id string, chain string, resseq long, sample string, "
               "features array<double>")


def atom_shell_composition(
    atoms: DataFrame,
    type2: bool = False,
    shell: tuple[int, int, int] = (1, 10, 1),
    target_chunk: int = TARGET_CHUNK,
) -> DataFrame:
    """AC_type1/2 (ref :9245-9284, :9577-9632): for every CA-named atom,
    the C/N/O/S element composition of non-water atoms per distance shell.
    Denominator = only C/N/O/S atoms in the shell (:9592-9598).  The
    reference keys its atom dict by chain+serial+element, so duplicate keys
    overwrite — with the reader's altloc filter serials are unique and the
    quirk is unreachable."""
    starts = _shell_edges(shell)
    step = shell[2]
    elem_index = {e: i for i, e in enumerate(_ELEMENTS)}

    def per_structure(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf["hetflag"] != "W"]
        X = pdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
        elems = pdf["element"].to_numpy()
        classes = np.array([elem_index.get(e, -1) for e in elems],
                           dtype=np.int64)
        is_target = (pdf["atom_name"] == "CA").to_numpy()
        if not is_target.any():
            return pd.DataFrame(columns=["pdb_id", "chain", "serial",
                                         "sample", "features"])
        feats = _chunked_shell_feats(X[is_target], X, classes, 4, starts,
                                     step, type2, count_all_rows=False,
                                     chunk=target_chunk)
        t = pdf[is_target]
        return pd.DataFrame({
            "pdb_id": t["pdb_id"].to_numpy(),
            "chain": t["chain"].to_numpy(),
            "serial": t["serial"].to_numpy(),
            "sample": (t["chain"].astype(str) + "_" + t["element"]
                       + "_" + t["serial"].astype(str)).to_numpy(),
            "features": list(feats),
        })

    return atoms.groupBy("pdb_id").applyInPandas(
        per_structure,
        schema="pdb_id string, chain string, serial long, sample string, "
               "features array<double>")


def network_metrics(residues: DataFrame, cutoff: float = 11.0) -> DataFrame:
    """Network-based index (ref :9633-9690): residue contact graph (edge iff
    rep-atom distance ≤ cutoff, default 11 Å :9075) → per-residue degree,
    degree centrality, betweenness, clustering coefficient, closeness, and
    eigenvector centrality (networkx, as the reference uses).

    The reference also computes nx.diameter / average_shortest_path_length
    on the way (unused in its output) — which makes the whole descriptor
    FAIL on a disconnected graph; replicated by raising ValueError."""
    import networkx as nx

    def per_structure(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["chain", "resseq"], kind="stable")
        X = pdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
        D = _pairdist(X)
        n = len(pdf)
        G = nx.Graph()
        G.add_nodes_from(range(n))
        iu, ju = np.nonzero(np.triu(D <= cutoff, k=1))
        G.add_edges_from(zip(iu.tolist(), ju.tolist()))
        if n and not nx.is_connected(G):
            raise ValueError(
                "contact graph disconnected at cutoff "
                f"{cutoff} — the reference's nx.diameter raises here too")
        deg_c = nx.degree_centrality(G)
        btw = nx.betweenness_centrality(G)
        clus = nx.clustering(G)
        close = nx.closeness_centrality(G)
        # nx.eigenvector_centrality_numpy imports scipy (absent here): same
        # definition computed directly — principal eigenvector of the
        # adjacency matrix, positive-signed, unit 2-norm
        A = np.zeros((n, n))
        A[iu, ju] = 1.0
        A[ju, iu] = 1.0
        w, V = np.linalg.eigh(A)
        v = V[:, int(np.argmax(w))]
        v = v * np.sign(v[np.argmax(np.abs(v))] or 1.0)
        eig = dict(enumerate(v / (np.linalg.norm(v) + 1e-300)))
        # icode'd residues are graph NODES but not output targets (see
        # residue_table docstring)
        is_t = (pdf["icode"].fillna("") == "").to_numpy() \
            if "icode" in pdf.columns else np.ones(n, dtype=bool)
        idx = np.nonzero(is_t)[0]
        t = pdf[is_t]
        return pd.DataFrame({
            "pdb_id": t["pdb_id"].to_numpy(),
            "chain": t["chain"].to_numpy(),
            "resseq": t["resseq"].to_numpy(),
            "sample": (t["resname"] + "_" + t["chain"].astype(str)
                       + t["resseq"].astype(str)).to_numpy(),
            "degree": [G.degree(int(i)) for i in idx],
            "degree_centrality": [deg_c[int(i)] for i in idx],
            "betweenness": [btw[int(i)] for i in idx],
            "clustering_coefficient": [clus[int(i)] for i in idx],
            "closeness": [close[int(i)] for i in idx],
            "centrality": [eig[int(i)] for i in idx],
        })

    return residues.groupBy("pdb_id").applyInPandas(
        per_structure,
        schema="pdb_id string, chain string, resseq long, sample string, "
               "degree long, degree_centrality double, betweenness double, "
               "clustering_coefficient double, closeness double, "
               "centrality double")


def hse(atoms: DataFrame, kind: str = "CA", radius: float = 12.0) -> DataFrame:
    """Half-sphere exposure (ref :9309-9332 → Bio.PDB HSExposureCA/CB;
    algorithm: Hamelryck, Proteins 59:38-48, 2005).

    For each residue, neighbors = other residues' CA atoms within `radius`
    of this CA.  A side-chain direction vector u splits them: neighbors at
    angle(u, CA_j − CA_i) ≤ 90° count as `hse_up`, the rest `hse_down`.

    * kind="CB": u = CB − CA (real side chain); GLY (no CB) uses the CA
      variant's pseudo direction.  Third value = 0.0 (Bio.PDB reports the
      pCB–CB angle only for the CA variant).
    * kind="CA": u = pseudo-CB from backbone geometry: with neighbors
      CA(i−1), CA(i+1) in the same chain at sequence distance 1,
      d1 = CA(i−1)−CA(i), d2 = CA(i+1)−CA(i), u = −(d̂1 + d̂2) (the
      bisector points away from the side chain).  Third value = angle(u,
      CB−CA) in radians when a real CB exists, else NaN.  Chain-terminal
      residues (no i±1) get no row, as Bio.PDB's polypeptide iteration
      drops them.

    Bio.PDB is not importable in this container, so parity with its exact
    output is asserted by construction properties (up+down = neighbor
    count; synthetic geometries with hand-computable splits) rather than a
    golden diff — see tests/test_structure.py.

    Scale note: the per-residue Python loop is O(n) numpy work per target
    (O(n²) per structure) — fine through multi-thousand-residue proteins;
    for mega-structures batch the targets like _chunked_shell_feats if it
    ever shows up in profiles."""
    if kind not in ("CA", "CB"):
        raise ValueError("kind must be CA or CB")

    def per_structure(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[(pdf["hetflag"] == " ")
                  & pdf["atom_name"].isin(["CA", "CB"])]
        rows = []
        # one row per (chain, resseq): CA + optional CB coords
        for (chain, resseq, icode), grp in pdf.groupby(
                ["chain", "resseq", "icode"], sort=True):
            ca = grp[grp["atom_name"] == "CA"]
            cb = grp[grp["atom_name"] == "CB"]
            if len(ca) == 0:
                continue
            rows.append((chain, resseq,
                         ca.iloc[0]["resname"],
                         ca.iloc[0][["x", "y", "z"]].to_numpy(dtype=np.float64),
                         cb.iloc[0][["x", "y", "z"]].to_numpy(dtype=np.float64)
                         if len(cb) else None,
                         ca.iloc[0]["pdb_id"],
                         (icode or "")))
        if not rows:
            return pd.DataFrame(columns=["pdb_id", "chain", "resseq",
                                         "sample", "hse_up", "hse_down",
                                         "angle"])
        # every CA (incl. insertion-code residues) counts as a sphere
        # neighbor; targets and backbone-neighbor lookups use only
        # icode == '' residues so 100 vs 100A never alias (groupby above
        # is sorted, so icode '' precedes 'A' — r[6] below is the icode)
        CA = np.stack([r[3] for r in rows])
        main = [r for r in rows if r[6] == ""]
        chains = np.array([r[0] for r in main])
        resseqs = np.array([r[1] for r in main])
        CA_main = np.stack([r[3] for r in main]) if main else CA[:0]
        out = []
        for i, (chain, resseq, resname, ca_i, cb_i, pdb_id, _ic) in enumerate(main):
            # pseudo-CB from backbone neighbors at sequence distance 1
            prev = np.nonzero((chains == chain) & (resseqs == resseq - 1))[0]
            nxt = np.nonzero((chains == chain) & (resseqs == resseq + 1))[0]
            u_pseudo = None
            if len(prev) and len(nxt):
                d1 = CA_main[prev[0]] - ca_i
                d2 = CA_main[nxt[0]] - ca_i
                d1 = d1 / np.linalg.norm(d1)
                d2 = d2 / np.linalg.norm(d2)
                b = -(d1 + d2)
                nb = np.linalg.norm(b)
                if nb > 0:
                    u_pseudo = b / nb
            if kind == "CA":
                if u_pseudo is None:
                    continue  # chain terminus — Bio.PDB emits no row
                u = u_pseudo
                if cb_i is not None:
                    v = cb_i - ca_i
                    cosang = float(u @ v / (np.linalg.norm(v) + 1e-300))
                    angle = float(np.arccos(np.clip(cosang, -1.0, 1.0)))
                else:
                    angle = float("nan")
            else:
                if cb_i is not None:
                    u = cb_i - ca_i
                    u = u / np.linalg.norm(u)
                elif u_pseudo is not None:
                    u = u_pseudo
                else:
                    continue
                angle = 0.0
            d = CA - ca_i[None, :]
            dist = np.sqrt((d * d).sum(axis=1))
            near = (dist <= radius) & (dist > 0)
            up = int(((d[near] @ u) > 0).sum())
            down = int(near.sum() - up)
            out.append((pdb_id, chain, int(resseq),
                        f"{chain}_{resname}_{resseq}", up, down, angle))
        return pd.DataFrame(out, columns=["pdb_id", "chain", "resseq",
                                          "sample", "hse_up", "hse_down",
                                          "angle"])

    return atoms.groupBy("pdb_id").applyInPandas(
        per_structure,
        schema="pdb_id string, chain string, resseq long, sample string, "
               "hse_up long, hse_down long, angle double")
