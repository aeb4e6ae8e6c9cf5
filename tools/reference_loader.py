"""Import the reference iFeatureOmegaCLI module with unavailable heavy deps stubbed.

The reference (`/root/reference/iFeatureOmegaCLI.py`) imports Bio.PDB, sklearn,
scipy, rdkit, matplotlib and its bundled `chem` package at module level, but the
sequence-descriptor classes (iProtein / iDNA / iRNA) only use numpy / pandas /
stdlib.  We stub the missing modules so the reference can run as a *golden
oracle* for fixture generation (tools/make_golden.py).  No reference code is
copied — it is executed read-only to pin expected outputs.
"""

from __future__ import annotations

import sys
import types

_STUBS = [
    ("Bio", ()),
    ("Bio.PDB", ()),
    ("Bio.PDB.PDBParser", ("PDBParser",)),
    ("Bio.PDB.MMCIFParser", ("MMCIFParser",)),
    ("Bio.PDB.DSSP", ("DSSP",)),
    ("Bio.PDB.ResidueDepth", ("ResidueDepth",)),
    ("Bio.PDB.HSExposure", ("HSExposureCA", "HSExposureCB")),
    ("Bio.PDB.PDBList", ("PDBList",)),
    ("sklearn", ()),
    (
        "sklearn.cluster",
        (
            "KMeans",
            "AffinityPropagation",
            "MeanShift",
            "DBSCAN",
            "AgglomerativeClustering",
            "SpectralClustering",
            "MiniBatchKMeans",
        ),
    ),
    ("sklearn.mixture", ("GaussianMixture",)),
    ("sklearn.preprocessing", ("StandardScaler",)),
    ("sklearn.neighbors", ("KernelDensity",)),
    ("sklearn.decomposition", ("PCA", "LatentDirichletAllocation")),
    ("sklearn.manifold", ("TSNE",)),
    ("scipy", ()),
    ("scipy.cluster", ()),
    ("scipy.cluster.hierarchy", ()),
    ("rdkit", ("Chem",)),
    ("matplotlib", ()),
    ("matplotlib.pyplot", ()),
    ("chem", ()),
]


def load_reference(path: str = "/root/reference"):
    """Return the imported reference module (cached after first call)."""
    if "iFeatureOmegaCLI" in sys.modules:
        return sys.modules["iFeatureOmegaCLI"]
    for name, attrs in _STUBS:
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, type(a, (), {}))
        sys.modules[name] = m
    sys.modules["sklearn.cluster"].estimate_bandwidth = lambda *a, **k: None
    sys.modules["matplotlib"].use = lambda *a, **k: None
    style = types.SimpleNamespace(use=lambda *a, **k: None)
    sys.modules["matplotlib.pyplot"].style = style
    if path not in sys.path:
        sys.path.insert(0, path)
    import iFeatureOmegaCLI  # noqa: E402

    return iFeatureOmegaCLI
