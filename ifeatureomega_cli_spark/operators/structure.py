"""Structure descriptors (iStructure, ref iFeatureOmegaCLI.py:8976-9786).

Rounds 3-4: all 14 of the reference's structure feature types are
implemented here from the reference's math (file:line cited per
function).  9 are pure coordinate geometry; SS3/SS8 ×2 take user-supplied
DSSP letters (residue_shell_composition ss_col) and Residue depth takes a
user-supplied surface point cloud (read_msms_vert) — only the DSSP/MSMS
BINARIES that produce those inputs remain external:

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


# DSSP 8-state letters in the reference's group_list order (:9461, :9529)
SS8_STATES = ["H", "B", "E", "G", "I", "T", "S", "-"]
# 8-state → 3-state collapse (ref :9054-9063 AA_HEC)
AA_HEC = {"H": "H", "B": "E", "E": "E", "G": "H", "I": "H",
          "T": "C", "S": "C", "-": "C"}


def shell_feature_names(kind: str, shell: tuple[int, int, int]) -> list[str]:
    keys = {"AAC": list(_AA), "GAAC": GROUP_NAMES, "AC": list(_ELEMENTS),
            "SS8": SS8_STATES, "SS3": SS8_STATES}[kind]
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
# chunk ≈ TARGET_CHUNK × n_candidates × 8 B per temporary.  256 keeps the
# working set near L2/LLC — measured 8-15× faster than 4096 on a 20k-residue
# chain (the big chunks thrash DRAM with ~650 MB temporaries).  Values are
# unaffected — each target row's shell counts are independent.
TARGET_CHUNK = 256


def _aabb_candidates(Xc: np.ndarray, X_s: np.ndarray,
                     reach: float) -> np.ndarray:
    """Indices of source rows inside the chunk's axis-aligned bounding box
    grown by `reach` (the max interaction distance).  Any pair beyond
    `reach` on ANY axis is beyond `reach` in euclidean distance, so this
    prunes sources without changing which pairs pass the distance tests —
    results stay bit-identical (the same per-pair expressions run on a
    candidate superset; counts are order-free integer sums).  Targets
    arrive in (chain, resseq) order, which is spatially coherent along a
    protein chain, so chunk boxes are tight: cost drops from O(chunk·n)
    to O(chunk·local density) on big structures."""
    lo = Xc.min(axis=0) - reach
    hi = Xc.max(axis=0) + reach
    m = ((X_s[:, 0] >= lo[0]) & (X_s[:, 0] <= hi[0])
         & (X_s[:, 1] >= lo[1]) & (X_s[:, 1] <= hi[1])
         & (X_s[:, 2] >= lo[2]) & (X_s[:, 2] <= hi[2]))
    return np.nonzero(m)[0]


def _chunked_shell_feats(X_t, X_s, classes, n_classes, starts, step,
                         cumulative, count_all_rows, chunk=TARGET_CHUNK):
    reach = float(starts[-1] + step)
    out = []
    for lo in range(0, len(X_t), chunk):
        Xc = X_t[lo: lo + chunk]
        cand = _aabb_candidates(Xc, X_s, reach)
        D = _pairdist(Xc, X_s[cand])
        out.append(_shell_comp(D, classes[cand], n_classes, starts, step,
                               cumulative, count_all_rows))
    return np.concatenate(out, axis=0) if out else np.zeros(
        (0, len(starts) * n_classes))


def residue_shell_composition(
    residues: DataFrame,
    kind: str = "AAC",
    type2: bool = False,
    shell: tuple[int, int, int] = (3, 20, 2),
    target_chunk: int = TARGET_CHUNK,
    ss_col: str | None = None,
) -> DataFrame:
    """AAC/GAAC/SS8/SS3_type1/2 (ref :9333-9576): for every residue, the
    class composition of residues whose representative atom (CB else CA)
    falls in each distance shell [s, s+step) — cumulative (−∞, s+step) for
    type2, which therefore includes the target itself at distance 0.
    Denominator = ALL residues in the shell (:9351).

    kind="AAC"/"GAAC": class = amino acid / reference AA group.
    kind="SS8"/"SS3": class = secondary-structure state; `ss_col` names a
    column carrying the per-residue DSSP 8-state letter (H B E G I T S -).
    The DSSP binary itself is absent from this container, so the letters
    must be user-supplied (precomputed DSSP runs, an SS predictor, ...);
    given them, the features are exactly the reference's SS8/SS3_type1/2
    (:9445-9576).  Reference quirk replicated faithfully: SS3 collapses
    letters with AA_HEC (:9054) to {H,E,C} but still tallies into the
    8-letter dict (:9529), so its 'C' residues count toward shell
    DENOMINATORS while no numerator slot receives them — B/G/I/T/S/-
    feature slots are structurally zero and only H/E carry signal.  Both
    kinds emit 8 features/shell named per SS8_STATES.  Letters outside the
    8-state alphabet likewise count toward denominators only (:9466
    membership test).  Residues with a NULL/missing letter are treated as
    '-' (DSSP's no-assignment marker) — the reference never faces this
    case because it aborts unless DSSP returned a letter for every
    residue (:9173).

    Input: residue_table() output (pdb_id, chain, resseq, resname, aa,
    x, y, z) [+ ss_col].  Output: one row per residue with `sample`
    formatted chain_resname_resseq like the reference index (:9209) and a
    features array ordered per shell_feature_names(kind, shell)."""
    if kind not in ("AAC", "GAAC", "SS8", "SS3"):
        raise ValueError("kind must be AAC, GAAC, SS8 or SS3")
    if kind in ("SS8", "SS3") and not ss_col:
        raise ValueError(f"kind={kind} needs ss_col (per-residue DSSP "
                         "8-state letter; no DSSP binary in this container)")
    n_classes = {"AAC": 20, "GAAC": 5, "SS8": 8, "SS3": 8}[kind]
    starts = _shell_edges(shell)
    step = shell[2]
    cumulative = type2
    aa_index = {a: i for i, a in enumerate(_AA)}
    ss8_index = {s: i for i, s in enumerate(SS8_STATES)}
    # SS3: tally the COLLAPSED letter into the 8-letter slot table —
    # H→slot H, E→slot E, C→no slot (the reference's dict-membership miss)
    ss3_index = {s8: ss8_index.get(AA_HEC[s8], -1) for s8 in SS8_STATES}

    def per_structure(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["chain", "resseq"], kind="stable")
        X = pdf[["x", "y", "z"]].to_numpy(dtype=np.float64)
        if kind in ("SS8", "SS3"):
            idx_map = ss8_index if kind == "SS8" else ss3_index
            classes = np.array([idx_map.get(s, -1)
                                for s in pdf[ss_col].fillna("-")],
                               dtype=np.int64)
        elif kind == "AAC":
            aas = pdf["aa"].to_numpy()
            classes = np.array([aa_index[a] for a in aas], dtype=np.int64)
        else:
            aas = pdf["aa"].to_numpy()
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


def network_metrics(residues: DataFrame, cutoff: float = 11.0,
                    on_disconnected: str = "skip") -> DataFrame:
    """Network-based index (ref :9633-9690): residue contact graph (edge iff
    rep-atom distance ≤ cutoff, default 11 Å :9075) → per-residue degree,
    degree centrality, betweenness, clustering coefficient, closeness, and
    eigenvector centrality (networkx, as the reference uses).

    The reference also computes nx.diameter / average_shortest_path_length
    on the way (unused in its output) — which makes the descriptor FAIL on
    a disconnected contact graph (common for multi-chain complexes whose
    chains sit > cutoff apart).  The reference fails ONLY that structure
    (error_msg + return False → no output rows for it), so in a
    distributed corpus run the parity-preserving behavior is
    on_disconnected="skip" (default): that structure contributes zero
    rows and every other structure still computes.  Pass "raise" to get
    the strict single-structure ValueError instead (one bad structure
    then aborts the whole job — only sensible for interactive use).

    Known deviation from the reference on insertion-code structures (e.g.
    antibody numbering): the reference names graph nodes
    resname_chain+resseq WITHOUT icode, so icode'd residues sharing a
    resseq collapse into one node (and its output emits duplicate target
    rows) — arguably a bug.  Here icode'd residues stay distinct graph
    NODES (distance sources) but only icode=='' residues are output
    targets, so degrees/centralities can differ from the reference on
    such structures."""
    if on_disconnected not in ("skip", "raise"):
        raise ValueError("on_disconnected must be 'skip' or 'raise'")
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
            if on_disconnected == "skip":
                return pd.DataFrame({
                    "pdb_id": pd.Series(dtype=str),
                    "chain": pd.Series(dtype=str),
                    "resseq": pd.Series(dtype=np.int64),
                    "sample": pd.Series(dtype=str),
                    "degree": pd.Series(dtype=np.int64),
                    "degree_centrality": pd.Series(dtype=np.float64),
                    "betweenness": pd.Series(dtype=np.float64),
                    "clustering_coefficient": pd.Series(dtype=np.float64),
                    "closeness": pd.Series(dtype=np.float64),
                    "centrality": pd.Series(dtype=np.float64),
                })
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
    of this CA.  A side-chain direction vector u splits them: neighbors on
    u's side of the plane through CA (plane dot > 0) count as `hse_up`,
    the rest `hse_down`.

    * kind="CB": u = CB − CA (real side chain); GLY (no CB) uses the CA
      variant's pseudo direction.  Third value = 0.0 (Bio.PDB reports the
      pCB–CB angle only for the CA variant).
    * kind="CA": u = pseudo-CB bisector from backbone geometry: with
      neighbors CA(i−1), CA(i+1) in the same chain at sequence distance 1,
      d1 = CA(i−1)−CA(i), d2 = CA(i+1)−CA(i), u = −(d̂1 + d̂2) (points away
      from the side chain).  Third value = angle(u, CB−CA) in radians when
      a real CB exists, else NaN.  Chain-terminal residues (no i±1) get no
      row, as Bio.PDB's polypeptide iteration drops them.

    Float determinism: the half-sphere plane test uses the UNNORMALIZED
    direction vector and every dot product / norm is computed with explicit
    elementwise numpy ops in the fixed order ((x·x + y·y) + z·z) — no BLAS
    matvec, whose summation order can vary with SIMD kernel selection —
    so the DuckDB correctness oracle (same expression tree in SQL,
    __spark_entry__.py q_struct_hse) reproduces the doubles bit-for-bit.
    Normalizing u cannot change the sign of the plane dot except within
    one ulp of zero; using the unnormalized vector on both sides removes
    even that hazard.

    Bio.PDB is not importable in this container, so parity with its exact
    output is asserted by construction properties (up+down = neighbor
    count; synthetic geometries with hand-computable splits) rather than a
    golden diff — see tests/test_structure.py.

    Scale: targets are processed in TARGET_CHUNK batches against the
    AABB-pruned CA candidate set (same pattern as _chunked_shell_feats) —
    O(chunk·local density) work and memory, no per-residue Python loop:
    a 20k-residue chain computes in ~1 s of vectorized numpy vs ~10 min
    for the round-3 per-target loop."""
    if kind not in ("CA", "CB"):
        raise ValueError("kind must be CA or CB")

    def per_structure(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=["pdb_id", "chain", "resseq",
                                      "sample", "hse_up", "hse_down",
                                      "angle"])
        pdf = pdf[(pdf["hetflag"] == " ")
                  & pdf["atom_name"].isin(["CA", "CB"])].copy()
        if not len(pdf):
            return empty
        # NULL icode from user-supplied atom tables (the bundled readers
        # always emit '') must not drop residues: pandas groupby/merge
        # treats NaN keys as non-matching — normalize first
        pdf["icode"] = pdf["icode"].fillna("")
        key = ["chain", "resseq", "icode"]
        ca = (pdf[pdf["atom_name"] == "CA"]
              .drop_duplicates(subset=key, keep="first")
              .sort_values(key, kind="stable").reset_index(drop=True))
        if not len(ca):
            return empty
        cb = (pdf[pdf["atom_name"] == "CB"]
              .drop_duplicates(subset=key, keep="first"))
        res = ca.merge(cb[key + ["x", "y", "z"]], on=key, how="left",
                       suffixes=("", "_cb"))
        # every CA (incl. insertion-code residues) counts as a sphere
        # neighbor; targets and backbone-neighbor lookups use only
        # icode == '' residues so 100 vs 100A never alias
        CAx = res["x"].to_numpy(dtype=np.float64)
        CAy = res["y"].to_numpy(dtype=np.float64)
        CAz = res["z"].to_numpy(dtype=np.float64)
        m = res[res["icode"] == ""].reset_index(drop=True)
        if not len(m):
            return empty
        mx = m["x"].to_numpy(dtype=np.float64)
        my = m["y"].to_numpy(dtype=np.float64)
        mz = m["z"].to_numpy(dtype=np.float64)
        has_cb = m["x_cb"].notna().to_numpy()
        vx = m["x_cb"].to_numpy(dtype=np.float64) - mx
        vy = m["y_cb"].to_numpy(dtype=np.float64) - my
        vz = m["z_cb"].to_numpy(dtype=np.float64) - mz
        # backbone neighbors at sequence distance ±1 (same chain, icode '')
        pos = {(c, r): i for i, (c, r) in
               enumerate(zip(m["chain"], m["resseq"]))}
        n_m = len(m)
        prev_i = np.full(n_m, -1, dtype=np.int64)
        next_i = np.full(n_m, -1, dtype=np.int64)
        for i, (c, r) in enumerate(zip(m["chain"], m["resseq"])):
            prev_i[i] = pos.get((c, r - 1), -1)
            next_i[i] = pos.get((c, r + 1), -1)
        has_bb = (prev_i >= 0) & (next_i >= 0)
        p = np.where(prev_i >= 0, prev_i, 0)
        nx_ = np.where(next_i >= 0, next_i, 0)
        # bisector b = -(d1/|d1| + d2/|d2|), all elementwise fixed-order
        d1x, d1y, d1z = mx[p] - mx, my[p] - my, mz[p] - mz
        d2x, d2y, d2z = mx[nx_] - mx, my[nx_] - my, mz[nx_] - mz
        with np.errstate(invalid="ignore", divide="ignore"):
            n1 = np.sqrt(d1x * d1x + d1y * d1y + d1z * d1z)
            n2 = np.sqrt(d2x * d2x + d2y * d2y + d2z * d2z)
            bx = -(d1x / n1 + d2x / n2)
            by = -(d1y / n1 + d2y / n2)
            bz = -(d1z / n1 + d2z / n2)
            nb = np.sqrt(bx * bx + by * by + bz * bz)
        has_pseudo = has_bb & np.where(np.isfinite(nb), nb > 0, False)
        nan = float("nan")
        if kind == "CA":
            valid = has_pseudo
            ux, uy, uz = bx, by, bz            # unnormalized plane vector
            with np.errstate(invalid="ignore", divide="ignore"):
                nv = np.sqrt(vx * vx + vy * vy + vz * vz)
                cosang = ((bx / nb) * vx + (by / nb) * vy
                          + (bz / nb) * vz) / (nv + 1e-300)
            angle = np.where(
                has_cb,
                np.arccos(np.clip(np.where(has_cb, cosang, 0.0), -1.0, 1.0)),
                nan)
        else:
            valid = has_cb | has_pseudo
            ux = np.where(has_cb, vx, bx)
            uy = np.where(has_cb, vy, by)
            uz = np.where(has_cb, vz, bz)
            angle = np.zeros(n_m)
        idx = np.nonzero(valid)[0]
        if not len(idx):
            return empty
        ups = np.zeros(len(idx), dtype=np.int64)
        downs = np.zeros(len(idx), dtype=np.int64)
        XS = np.stack([CAx, CAy, CAz], axis=1)
        for lo in range(0, len(idx), TARGET_CHUNK):
            t = idx[lo: lo + TARGET_CHUNK]
            cand = _aabb_candidates(
                np.stack([mx[t], my[t], mz[t]], axis=1), XS, radius)
            dx = CAx[cand][None, :] - mx[t][:, None]
            dy = CAy[cand][None, :] - my[t][:, None]
            dz = CAz[cand][None, :] - mz[t][:, None]
            dist = np.sqrt(dx * dx + dy * dy + dz * dz)
            near = (dist <= radius) & (dist > 0)
            dot = dx * ux[t][:, None] + dy * uy[t][:, None] \
                + dz * uz[t][:, None]
            up = (near & (dot > 0)).sum(axis=1)
            ups[lo: lo + TARGET_CHUNK] = up
            downs[lo: lo + TARGET_CHUNK] = near.sum(axis=1) - up
        t = m.iloc[idx]
        return pd.DataFrame({
            "pdb_id": t["pdb_id"].to_numpy(),
            "chain": t["chain"].to_numpy(),
            "resseq": t["resseq"].to_numpy(dtype=np.int64),
            "sample": (t["chain"].astype(str) + "_" + t["resname"]
                       + "_" + t["resseq"].astype(str)).to_numpy(),
            "hse_up": ups,
            "hse_down": downs,
            "angle": angle[idx],
        })

    return atoms.groupBy("pdb_id").applyInPandas(
        per_structure,
        schema="pdb_id string, chain string, resseq long, sample string, "
               "hse_up long, hse_down long, angle double")


def residue_depth(atoms: DataFrame, surface: DataFrame) -> DataFrame:
    """Residue depth (ref :9286-9307 → Bio.PDB ResidueDepth): per standard
    residue, `residue_depth` = mean over the residue's atoms of the
    minimum distance to the molecular-surface vertex set, and `ca_depth` =
    that minimum for the CA atom (NaN when the residue has no CA).

    The reference obtains the surface by shelling out to the MSMS binary;
    MSMS is absent here, but its `.vert` output is published plain text
    (sources/pdb.read_msms_vert), so precomputed surfaces — or any surface
    point cloud — are first-class inputs: `surface` is a
    (pdb_id, x, y, z) DataFrame.  Given MSMS vertices this computes
    exactly Bio.PDB's numbers (mean of per-atom min distances).

    Reference quirks kept: the output index is chain_resseq WITHOUT the
    insertion code (:9301), so icode'd residues emit duplicate sample
    strings (both rows kept, as the reference's DataFrame index does);
    non-amino-acid residues are skipped (Bio.PDB is_aa test → resname in
    the 20-AA table).

    A structure with atoms but NO surface rows yields zero output rows
    (observable as a row-count drop) — the reference fails that structure
    outright when MSMS errors (:9292-9294), so skipping is the
    corpus-safe analogue of its single-structure failure.

    Execution: atoms and surface cogrouped per pdb_id — each structure's
    depth is one vectorized task; distances are computed in TARGET_CHUNK
    atom batches against the full vertex matrix (min-distance needs every
    vertex — no AABB pruning is sound), with the fixed elementwise
    ((dx·dx + dy·dy) + dz·dz) order so a SQL oracle reproduces the doubles
    bit-for-bit."""
    from ifeatureomega_cli_spark.sources.pdb import AA_3TO1

    def per_structure(apdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=["pdb_id", "chain", "resseq", "icode",
                                      "sample", "residue_depth", "ca_depth"])
        apdf = apdf[(apdf["hetflag"] == " ")
                    & apdf["resname"].isin(AA_3TO1)].copy()
        if not len(apdf) or not len(spdf):
            return empty
        apdf["icode"] = apdf["icode"].fillna("")
        Sx = spdf["x"].to_numpy(dtype=np.float64)
        Sy = spdf["y"].to_numpy(dtype=np.float64)
        Sz = spdf["z"].to_numpy(dtype=np.float64)
        Ax = apdf["x"].to_numpy(dtype=np.float64)
        Ay = apdf["y"].to_numpy(dtype=np.float64)
        Az = apdf["z"].to_numpy(dtype=np.float64)
        mind = np.empty(len(apdf))
        for lo in range(0, len(apdf), TARGET_CHUNK):
            hi = lo + TARGET_CHUNK
            dx = Sx[None, :] - Ax[lo:hi][:, None]
            dy = Sy[None, :] - Ay[lo:hi][:, None]
            dz = Sz[None, :] - Az[lo:hi][:, None]
            mind[lo:hi] = np.sqrt(dx * dx + dy * dy + dz * dz).min(axis=1)
        apdf = apdf.assign(__mind=mind)
        out = []
        for (chain, resseq, icode), grp in apdf.groupby(
                ["chain", "resseq", "icode"], sort=True):
            ca = grp[grp["atom_name"] == "CA"]
            out.append((grp["pdb_id"].iloc[0], chain, int(resseq), icode,
                        f"{chain}_{resseq}",
                        float(grp["__mind"].to_numpy().mean()),
                        float(ca["__mind"].iloc[0]) if len(ca)
                        else float("nan")))
        return pd.DataFrame(out, columns=["pdb_id", "chain", "resseq",
                                          "icode", "sample",
                                          "residue_depth", "ca_depth"])

    return atoms.groupBy("pdb_id").cogroup(surface.groupBy("pdb_id")) \
        .applyInPandas(
            per_structure,
            schema="pdb_id string, chain string, resseq long, icode string, "
                   "sample string, residue_depth double, ca_depth double")
