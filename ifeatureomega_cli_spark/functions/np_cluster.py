"""Pure-numpy clustering / embedding kernels for the iAnalysis extras.

The reference (iFeatureOmegaCLI.py:10053-10211) delegates these to sklearn /
scipy on a driver-local matrix; neither library ships in this environment,
so the algorithms are implemented here directly.  Every kernel is seeded and
deterministic.  All are inherently O(n²)+ driver-matrix algorithms — the
Spark wrappers in analysis.py fit them on a bounded sample and assign
out-of-sample rows distributively (see analysis.py docstrings).

Semantics follow the defaults the reference relies on:
  agglomerative — sklearn AgglomerativeClustering default (ward, euclidean)
  hcluster      — scipy average linkage + fcluster(t=1, 'inconsistent')
  spectral      — RBF affinity (gamma=1), normalized-Laplacian embedding,
                  k-means on the embedding
  dbscan        — eps=0.5, min_samples=5 (reference standardizes first)
  affinity_propagation — damping 0.5, preference = median similarity
  mean_shift    — estimate_bandwidth(quantile=0.3) + flat kernel, bin seeds
  mcl           — the reference's own MarkvCluster math (corrcoef graph)
  tsne          — exact t-SNE, perplexity 30, learning_rate=100, seeded init
  lda           — batch variational-Bayes LatentDirichletAllocation
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _pairwise_sq(X: np.ndarray, Y: np.ndarray | None = None) -> np.ndarray:
    Y = X if Y is None else Y
    sq = (X * X).sum(1)[:, None] + (Y * Y).sum(1)[None, :] - 2.0 * (X @ Y.T)
    return np.maximum(sq, 0.0)


def kmeans_np(X: np.ndarray, k: int, seed: int = 42, iters: int = 100,
              n_init: int = 4) -> np.ndarray:
    """Plain Lloyd k-means with k-means++ seeding; best of n_init runs."""
    rng = np.random.RandomState(seed)
    best, best_inertia = None, np.inf
    for _ in range(n_init):
        # k-means++ init
        C = X[[rng.randint(len(X))]]
        for _ in range(1, min(k, len(X))):
            d2 = _pairwise_sq(X, C).min(axis=1)
            tot = d2.sum()
            probs = d2 / tot if tot > 0 else np.full(len(X), 1.0 / len(X))
            C = np.vstack([C, X[rng.choice(len(X), p=probs)]])
        for _ in range(iters):
            assign = _pairwise_sq(X, C).argmin(axis=1)
            newC = np.vstack([
                X[assign == c].mean(axis=0) if (assign == c).any() else C[c]
                for c in range(len(C))
            ])
            if np.allclose(newC, C):
                C = newC
                break
            C = newC
        inertia = _pairwise_sq(X, C).min(axis=1).sum()
        if inertia < best_inertia:
            best_inertia, best = inertia, _pairwise_sq(X, C).argmin(axis=1)
    return best


# ---------------------------------------------------------------------------
# agglomerative (Lance-Williams) — ward and average linkage
# ---------------------------------------------------------------------------


def _linkage(X: np.ndarray, method: str) -> np.ndarray:
    """(n-1, 4) scipy-style linkage matrix [left, right, height, size].

    Per-row nearest-neighbour cache instead of re-slicing the alive×alive
    submatrix each merge (which is O(n³) copies): each alive row keeps its
    (min, argmin); a merge invalidates only rows whose cached neighbour died
    (full row re-scan, vectorized) and cheaply improves rows the new cluster
    got closer to.  Dead rows/columns are set to +inf so a row re-scan is a
    plain masked min over the padded matrix."""
    n = len(X)
    N = 2 * n - 1
    big = np.full((N, N), np.inf)
    big[:n, :n] = np.sqrt(_pairwise_sq(X))
    np.fill_diagonal(big, np.inf)
    sizes = np.concatenate([np.ones(n), np.zeros(max(n - 1, 0))])
    alive = np.zeros(N, dtype=bool)
    alive[:n] = True
    row_min = np.concatenate([big[:n].min(axis=1), np.full(max(n - 1, 0), np.inf)])
    row_arg = np.concatenate([big[:n].argmin(axis=1),
                              np.zeros(max(n - 1, 0), dtype=np.int64)])
    Z = np.zeros((n - 1, 4))
    for m in range(n - 1):
        i = int(np.argmin(np.where(alive, row_min, np.inf)))
        j = int(row_arg[i])
        if i > j:
            i, j = j, i
        h = big[i, j]
        new = n + m
        ni, nj = sizes[i], sizes[j]
        Z[m] = [i, j, h, ni + nj]
        sizes[new] = ni + nj
        alive[i] = alive[j] = False
        rest = np.nonzero(alive)[0]
        dik, djk = big[i, rest].copy(), big[j, rest].copy()
        big[i, :] = np.inf; big[:, i] = np.inf
        big[j, :] = np.inf; big[:, j] = np.inf
        alive[new] = True
        if len(rest) == 0:
            continue
        if method == "ward":
            nk = sizes[rest]
            d_new = np.sqrt(
                ((ni + nk) * dik ** 2 + (nj + nk) * djk ** 2 - nk * h ** 2)
                / (ni + nj + nk))
        else:  # average
            d_new = (ni * dik + nj * djk) / (ni + nj)
        big[new, rest] = d_new
        big[rest, new] = d_new
        row_min[new] = d_new.min()
        row_arg[new] = rest[int(d_new.argmin())]
        # cheap improve: the new cluster is now some rows' nearest neighbour
        improved = rest[d_new < row_min[rest]]
        row_min[improved] = big[improved, new]
        row_arg[improved] = new
        # full re-scan only for rows whose cached neighbour just died
        stale = rest[(row_arg[rest] == i) | (row_arg[rest] == j)]
        if len(stale):
            sub = big[stale]
            row_min[stale] = sub.min(axis=1)
            row_arg[stale] = sub.argmin(axis=1)
    return Z


def _cut_n_clusters(Z: np.ndarray, n_clusters: int) -> np.ndarray:
    """Labels from the last n_clusters-1 merges (like sklearn's cut)."""
    n = len(Z) + 1
    parent = list(range(2 * n - 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for m in range(n - 1 - (n_clusters - 1)):
        i, j = int(Z[m, 0]), int(Z[m, 1])
        parent[find(i)] = parent[find(j)] = n + m
    roots = {}
    labels = np.zeros(n, dtype=np.int64)
    for x in range(n):
        r = find(x)
        labels[x] = roots.setdefault(r, len(roots))
    return labels


def agglomerative(X: np.ndarray, n_clusters: int = 2) -> np.ndarray:
    """Ward-linkage agglomerative clustering (ref :10055-10066 defaults)."""
    return _cut_n_clusters(_linkage(X, "ward"), n_clusters)


def hcluster(X: np.ndarray, t: float = 1.0, depth: int = 2) -> np.ndarray:
    """Average linkage + inconsistency cut (ref :10098-10112,
    scipy fcluster(t=1, 'inconsistent'))."""
    Z = _linkage(X, "average")
    n = len(Z) + 1
    # inconsistency coefficient per link, descendants within `depth`
    heights = Z[:, 2]

    def desc_links(m, d):
        out = [m]
        if d > 1:
            for c in (int(Z[m, 0]), int(Z[m, 1])):
                if c >= n:
                    out += desc_links(c - n, d - 1)
        return out

    incons = np.zeros(n - 1)
    for m in range(n - 1):
        hs = heights[desc_links(m, depth)]
        s = hs.std(ddof=1) if len(hs) > 1 else 0.0
        incons[m] = 0.0 if s == 0 else (heights[m] - hs.mean()) / s
    # cluster = maximal subtrees where every internal link is consistent
    ok = incons <= t
    # propagate: a link is usable only if its non-leaf children are usable
    usable = ok.copy()
    for m in range(n - 1):
        for c in (int(Z[m, 0]), int(Z[m, 1])):
            if c >= n and not usable[c - n]:
                usable[m] = False
    parent = list(range(2 * n - 1))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for m in range(n - 1):
        if usable[m]:
            parent[find(int(Z[m, 0]))] = parent[find(int(Z[m, 1]))] = n + m
    roots = {}
    labels = np.zeros(n, dtype=np.int64)
    for x in range(n):
        r = find(x)
        labels[x] = roots.setdefault(r, len(roots) + 1)  # fcluster is 1-based
    return labels


# ---------------------------------------------------------------------------
# spectral
# ---------------------------------------------------------------------------


def spectral(X: np.ndarray, n_clusters: int = 2, gamma: float = 1.0,
             seed: int = 42) -> np.ndarray:
    """RBF affinity → normalized Laplacian embedding → k-means
    (ref :10068-10081, sklearn SpectralClustering defaults)."""
    W = np.exp(-gamma * _pairwise_sq(X))
    d = W.sum(axis=1)
    Dmh = 1.0 / np.sqrt(np.maximum(d, 1e-12))
    Lsym = Dmh[:, None] * W * Dmh[None, :]
    vals, vecs = np.linalg.eigh(Lsym)
    emb = vecs[:, -n_clusters:]          # top eigenvectors
    emb = emb * Dmh[:, None]             # diffusion scaling (sklearn detail)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    emb = emb / np.maximum(norms, 1e-12)
    return kmeans_np(emb, n_clusters, seed=seed)


# ---------------------------------------------------------------------------
# dbscan
# ---------------------------------------------------------------------------


def dbscan(X: np.ndarray, eps: float = 0.5, min_samples: int = 5):
    """Classic DBSCAN; returns (labels with -1 noise, core-point mask)."""
    n = len(X)
    D = np.sqrt(_pairwise_sq(X))
    neigh = D <= eps
    n_neigh = neigh.sum(axis=1)          # self included, as sklearn counts
    core = n_neigh >= min_samples
    labels = np.full(n, -1, dtype=np.int64)
    cid = 0
    for s in range(n):
        if not core[s] or labels[s] != -1:
            continue
        # BFS over density-reachable points
        stack = [s]
        labels[s] = cid
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.nonzero(neigh[p])[0]:
                if labels[q] == -1:
                    labels[q] = cid
                    stack.append(q)
        cid += 1
    return labels, core


# ---------------------------------------------------------------------------
# affinity propagation
# ---------------------------------------------------------------------------


def affinity_propagation(X: np.ndarray, damping: float = 0.5,
                         max_iter: int = 300, convergence_iter: int = 15,
                         seed: int = 42) -> np.ndarray:
    """Affinity propagation (ref :10114-10128; sklearn defaults, including
    damping=0.5 — the reference's ``AffinityPropagation()``
    parameterization.  The message-update equations below are
    term-for-term sklearn's `_affinity_propagation` loop).

    CONVERGENCE caveat, inherent to the algorithm and shared with the
    reference: at damping 0.5 the exemplar set can oscillate on
    near-symmetric data (e.g. equal well-separated blobs oscillate
    between n/3·{1,2,3} exemplars here, exactly as sklearn emits
    ConvergenceWarning and returns the last iterate on the same input) —
    pass damping≈0.9 for a converged clustering on such data.  Remaining
    parity deviation is RNG-level only: sklearn's symmetry-breaking noise
    stream differs, so where multiple fixed points exist the converged
    exemplar set can differ from the reference's."""
    S = -_pairwise_sq(X)
    n = len(S)
    S = S.copy()
    pref = np.median(S)
    np.fill_diagonal(S, pref)
    rng = np.random.RandomState(seed)
    # tiny symmetric-breaking noise, as sklearn applies
    S += 1e-12 * rng.standard_normal((n, n)) * (S.max() - S.min() + 1e-300)
    R = np.zeros((n, n))
    A = np.zeros((n, n))
    idx = np.arange(n)
    stable = 0
    last = None
    for _ in range(max_iter):
        AS = A + S
        m1 = AS.max(axis=1)
        am = AS.argmax(axis=1)
        AS_t = AS.copy()
        AS_t[idx, am] = -np.inf
        m2 = AS_t.max(axis=1)
        Rnew = S - m1[:, None]
        Rnew[idx, am] = S[idx, am] - m2
        R = damping * R + (1 - damping) * Rnew
        Rp = np.maximum(R, 0)
        np.fill_diagonal(Rp, R.diagonal())
        Anew = Rp.sum(axis=0)[None, :] - Rp
        dA = Anew.diagonal().copy()
        Anew = np.minimum(Anew, 0)
        np.fill_diagonal(Anew, dA)
        A = damping * A + (1 - damping) * Anew
        ex = np.nonzero((A + R).diagonal() > 0)[0]
        if last is not None and len(ex) == len(last) and np.all(ex == last) \
                and len(ex) > 0:
            stable += 1
            if stable >= convergence_iter:
                break
        else:
            stable = 0
        last = ex
    if len(ex) == 0:
        return np.zeros(n, dtype=np.int64)
    assign = S[:, ex].argmax(axis=1)
    assign[ex] = np.arange(len(ex))
    return assign.astype(np.int64)


# ---------------------------------------------------------------------------
# mean shift
# ---------------------------------------------------------------------------


def estimate_bandwidth(X: np.ndarray, quantile: float = 0.3) -> float:
    """sklearn.cluster.estimate_bandwidth: mean of each point's distance to
    its int(n*quantile)-th nearest neighbour (self counts)."""
    k = max(1, int(len(X) * quantile))
    D = np.sqrt(_pairwise_sq(X))
    part = np.sort(D, axis=1)[:, :k]
    return float(part.max(axis=1).mean())


def mean_shift(X: np.ndarray, bandwidth: float | None = None,
               max_iter: int = 300) -> np.ndarray:
    """Flat-kernel mean shift with bin seeding (ref :10130-10146)."""
    if bandwidth is None:
        bandwidth = estimate_bandwidth(X)
    if bandwidth <= 0:
        return np.zeros(len(X), dtype=np.int64)
    # bin seeding: one seed per occupied grid cell
    bins = np.round(X / bandwidth)
    _, first = np.unique(bins, axis=0, return_index=True)
    seeds = X[np.sort(first)]
    modes = []
    supports = []
    for s in seeds:
        m = s.copy()
        for _ in range(max_iter):
            d2 = ((X - m) ** 2).sum(axis=1)
            within = d2 <= bandwidth ** 2
            if not within.any():
                break
            new = X[within].mean(axis=0)
            if np.linalg.norm(new - m) < 1e-3 * bandwidth:
                m = new
                break
            m = new
        modes.append(m)
        supports.append(int((((X - m) ** 2).sum(axis=1) <= bandwidth ** 2).sum()))
    modes = np.array(modes)
    order = np.argsort(-np.array(supports))
    kept = []
    for i in order:
        if all(np.linalg.norm(modes[i] - modes[j]) >= bandwidth for j in kept):
            kept.append(i)
    centers = modes[kept]
    return _pairwise_sq(X, centers).argmin(axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# MCL — replica of the reference's MarkvCluster math (ref :10312-10382)
# ---------------------------------------------------------------------------


def mcl(X: np.ndarray, expand_factor: int = 2, inflate_factor: float = 2.0,
        mult_factor: float = 2.0, max_loop: int = 1000) -> np.ndarray:
    """Markov clustering on the corrcoef graph, exactly the reference's
    pipeline: M = corrcoef(rows), negatives and diagonal zeroed, then
    add mult_factor·I → column-normalize → loop(inflate → expand)."""
    M = np.corrcoef(X)
    M = np.where(np.isfinite(M), M, 0.0)
    M[M < 0] = 0
    np.fill_diagonal(M, 0)
    M = M + mult_factor * np.eye(len(M))
    M = M / np.maximum(M.sum(axis=0)[None, :], 1e-300)
    for i in range(max_loop):
        M = np.power(M, inflate_factor)
        M = M / np.maximum(M.sum(axis=0)[None, :], 1e-300)
        M = np.linalg.matrix_power(M, expand_factor)
        if i % 5 == 4 and np.max(M ** 2 - M) - np.min(M ** 2 - M) == 0:
            break
    # attractors = rows with surviving self-loop; cluster = their support
    labels = np.full(len(M), -1, dtype=np.int64)
    cid = 0
    for i in range(len(M)):
        if M[i, i] > 0:
            members = np.nonzero(M[i, :] > 0)[0]
            fresh = members[labels[members] == -1]
            if len(fresh):
                labels[fresh] = cid
                cid += 1
    labels[labels == -1] = cid  # stragglers (should not happen at convergence)
    return labels


# ---------------------------------------------------------------------------
# exact t-SNE
# ---------------------------------------------------------------------------


def tsne(X: np.ndarray, n_components: int = 2, perplexity: float = 30.0,
         learning_rate: float = 100.0, n_iter: int = 500,
         seed: int = 42) -> np.ndarray:
    """Exact t-SNE (ref :10166-10181 uses method='exact',
    learning_rate=100).  Seeded random init → deterministic output."""
    n = len(X)
    perplexity = min(perplexity, (n - 1) / 3.0)
    D = _pairwise_sq(X)
    # binary-search per-point sigma to hit the target perplexity
    P = np.zeros((n, n))
    logU = np.log(perplexity)
    for i in range(n):
        beta, lo, hi = 1.0, 0.0, np.inf
        di = np.delete(D[i], i)
        for _ in range(50):
            p = np.exp(-di * beta)
            s = p.sum()
            if s <= 0:
                H, p = 0.0, np.zeros_like(p)
            else:
                p = p / s
                H = -(p[p > 0] * np.log(p[p > 0])).sum()
            if abs(H - logU) < 1e-5:
                break
            if H > logU:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = (beta + lo) / 2
        P[i, np.arange(n) != i] = p
    P = (P + P.T) / (2 * n)
    P = np.maximum(P, 1e-12)
    rng = np.random.RandomState(seed)
    Y = rng.standard_normal((n, n_components)) * 1e-4
    mom, gains, update = 0.5, np.ones_like(Y), np.zeros_like(Y)
    Pe = P * 4.0  # early exaggeration
    for it in range(n_iter):
        num = 1.0 / (1.0 + _pairwise_sq(Y))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (Pe if it < 100 else P) - Q
        W = PQ * num
        grad = 4.0 * (W.sum(axis=1)[:, None] * Y - W @ Y)
        gains = np.where(np.sign(grad) != np.sign(update), gains + 0.2,
                         gains * 0.8)
        gains = np.maximum(gains, 0.01)
        update = (mom if it < 250 else 0.8) * update - learning_rate * gains * grad
        Y = Y + update
        Y = Y - Y.mean(axis=0)
    return Y


# ---------------------------------------------------------------------------
# LatentDirichletAllocation (batch variational Bayes)
# ---------------------------------------------------------------------------


def _digamma(x):
    # Bernardo's asymptotic approximation, enough for VB updates
    x = np.asarray(x, dtype=np.float64)
    r = np.zeros_like(x)
    y = x.copy()
    while np.any(y < 6):
        r = np.where(y < 6, r - 1.0 / y, r)
        y = np.where(y < 6, y + 1, y)
    f = 1.0 / (y * y)
    return (r + np.log(y) - 0.5 / y
            - f * (1 / 12. - f * (1 / 120. - f / 252.)))


def _lda_doc_pass(X, expB, alpha, gamma0=None, collect_sstats=False):
    """Per-document variational E-step; returns (gamma, sstats|None)."""
    n, v = X.shape
    k = expB.shape[0]
    gamma_d = np.ones((n, k)) if gamma0 is None else gamma0
    sstats = np.zeros((k, v)) if collect_sstats else None
    for d in range(n):
        x = X[d]
        nz = x > 0
        g = gamma_d[d]
        phi = None
        for _ in range(20):
            Elogth = _digamma(g) - _digamma(g.sum())
            phi = np.exp(Elogth)[:, None] * expB[:, nz]
            phi = phi / np.maximum(phi.sum(axis=0, keepdims=True), 1e-300)
            gnew = alpha + (phi * x[nz][None, :]).sum(axis=1)
            if np.abs(gnew - g).mean() < 1e-4:
                g = gnew
                break
            g = gnew
        gamma_d[d] = g
        if collect_sstats and phi is not None:
            Elogth = _digamma(g) - _digamma(g.sum())
            phi = np.exp(Elogth)[:, None] * expB[:, nz]
            phi = phi / np.maximum(phi.sum(axis=0, keepdims=True), 1e-300)
            sstats[:, nz] += phi * x[nz][None, :]
    return gamma_d, sstats


def lda_fit(X: np.ndarray, n_components: int = 2, max_iter: int = 50,
            seed: int = 42) -> np.ndarray:
    """Fit topic-model LDA (ref :10198-10211 calls sklearn
    LatentDirichletAllocation) by batch variational Bayes with the sklearn
    default priors (doc_topic 1/K, topic_word 1/K).  Returns the (K, V)
    topic-word variational parameter lambda — pass to lda_transform."""
    rng = np.random.RandomState(seed)
    X = np.maximum(np.asarray(X, dtype=np.float64), 0.0)
    k, v = n_components, X.shape[1]
    lam = rng.gamma(100.0, 0.01, (k, v))
    for _ in range(max_iter):
        expB = np.exp(_digamma(lam) - _digamma(lam.sum(axis=1, keepdims=True)))
        _, sstats = _lda_doc_pass(X, expB, 1.0 / k, collect_sstats=True)
        lam = 1.0 / k + sstats
    return lam


def lda_transform(X: np.ndarray, lam: np.ndarray) -> np.ndarray:
    """Normalized document-topic distribution under a fitted lambda —
    embarrassingly parallel per document (used by the Spark wrapper to
    transform out-of-sample rows)."""
    X = np.maximum(np.asarray(X, dtype=np.float64), 0.0)
    k = lam.shape[0]
    expB = np.exp(_digamma(lam) - _digamma(lam.sum(axis=1, keepdims=True)))
    gamma_d, _ = _lda_doc_pass(X, expB, 1.0 / k)
    return gamma_d / gamma_d.sum(axis=1, keepdims=True)


def lda(X: np.ndarray, n_components: int = 2, max_iter: int = 50,
        seed: int = 42) -> np.ndarray:
    """fit + transform in one call (driver-matrix convenience)."""
    return lda_transform(X, lda_fit(X, n_components, max_iter, seed))
