"""Descriptor registry — replaces the reference's string-`eval` dispatch
(iFeatureOmegaCLI.py:313-323) with plain specs.

Each :class:`DescriptorSpec` carries a feature-name builder and a kernel
factory returning a batch function ``Ragged -> (n, dim) float64``.  Kernel
factories close over small numpy lookup constants; Spark broadcasts them
inside the serialized pandas UDF.

Naming convention follows the reference dispatch keys ("AAC",
"CKSAAP type 1", "Kmer type 1", ...) with a ``protein:`` / ``dna:`` /
``rna:`` namespace prefix in the unified registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from ifeatureomega_cli_spark import tokenize as tk
from ifeatureomega_cli_spark.functions import kernels as K
from ifeatureomega_cli_spark.functions.kernels import Ragged

AA = tk.PROTEIN_AA  # 'ACDEFGHIKLMNPQRSTVWY'
AA_ALT = tk.PROTEIN_AA_ALT  # 'ARNDCQEGHILKMFPSTWYV'
NT = tk.DNA_NT  # 'ACGT'
PGAP = tk.PROTEIN_GAP
DGAP = tk.DNA_GAP


@dataclass
class DescriptorSpec:
    name: str
    seq_type: str  # 'protein' | 'dna' | 'rna'
    make_names: Callable[[dict, int], list[str]]  # (cfg, L) -> column names
    make_kernel: Callable[[dict, int], Callable[[Ragged], np.ndarray]]  # (cfg, L) -> kernel
    equal_length: bool = False
    defaults: dict = field(default_factory=dict)
    ref: str = ""  # reference citation file:line

    def names(self, cfg: dict | None = None, L: int = 0) -> list[str]:
        return self.make_names({**self.defaults, **(cfg or {})}, L)

    def kernel(self, cfg: dict | None = None, L: int = 0):
        return self.make_kernel({**self.defaults, **(cfg or {})}, L)


DESCRIPTORS: dict[str, DescriptorSpec] = {}


def register(spec: DescriptorSpec) -> DescriptorSpec:
    key = f"{spec.seq_type}:{spec.name}"
    DESCRIPTORS[key] = spec
    return spec


def descriptor_names(seq_type: str | None = None) -> list[str]:
    if seq_type is None:
        return sorted(DESCRIPTORS)
    return sorted(k for k in DESCRIPTORS if k.startswith(seq_type + ":"))


def get_spec(name: str) -> DescriptorSpec:
    if name in DESCRIPTORS:
        return DESCRIPTORS[name]
    raise KeyError(f"unknown descriptor {name!r}; known: {sorted(DESCRIPTORS)[:10]}...")


# --------------------------------------------------------------------------
# group tables (published physicochemical classifications used by the
# reference's GAAC/CKSAAGP/GDPC/GTPC, iFeatureOmegaCLI.py:1029-1034)
# --------------------------------------------------------------------------

GAAC_GROUPS = [
    ("alphatic", "GAVLMI"),
    ("aromatic", "FYW"),
    ("postivecharge", "KRH"),
    ("negativecharge", "DE"),
    ("uncharge", "STCPNQ"),
]
GAAC_GROUPS_EGAAC = [  # EGAAC spells the keys differently (ref :1064-1070)
    ("alphaticr", "GAVLMI"),
    ("aromatic", "FYW"),
    ("postivecharger", "KRH"),
    ("negativecharger", "DE"),
    ("uncharger", "STCPNQ"),
]


def group_map(groups: list[tuple[str, str]], gap_to: int | None = None) -> np.ndarray:
    """Canonical protein token id → group index; gap → len(groups) (masked)."""
    g = np.full(len(AA) + 1, len(groups), dtype=np.int64)
    for gi, (_, members) in enumerate(groups):
        for ch in members:
            g[AA.index(ch)] = gi
    if gap_to is not None:
        g[PGAP] = gap_to
    return g


# --------------------------------------------------------------------------
# A1 family — global k-gram composition
# --------------------------------------------------------------------------


def _kmers(alpha: str, k: int) -> list[str]:
    out = [""]
    for _ in range(k):
        out = [p + c for p in out for c in alpha]
    return out


def _register_comp(
    name: str,
    seq_type: str,
    alpha: str,
    k: int,
    normalized: bool,
    prefix: str,
    gap_id: int,
    ref: str,
    joiner: str = "",
):
    vocab = len(alpha)

    def mk_names(cfg, L):
        return [f"{prefix}{joiner.join(g)}" for g in (_kmers(alpha, k))]

    def mk_kernel(cfg, L):
        def kern(r: Ragged) -> np.ndarray:
            return K.kgram_counts(r.strip(gap_id), vocab, k, normalize=normalized)

        return kern

    register(
        DescriptorSpec(name, seq_type, mk_names, mk_kernel, ref=ref)
    )


# protein compositions (ref :414-436, :510-537, :580-606)
_register_comp("AAC", "protein", AA, 1, True, "AAC_", PGAP, "iFeatureOmegaCLI.py:414-436")
_register_comp("DPC type 1", "protein", AA, 2, True, "DPC_", PGAP, "iFeatureOmegaCLI.py:510-537")
_register_comp("DPC type 2", "protein", AA, 2, False, "DPC_", PGAP, "iFeatureOmegaCLI.py:510-537")
_register_comp("TPC type 1", "protein", AA, 3, True, "TPC_", PGAP, "iFeatureOmegaCLI.py:580-606")
_register_comp("TPC type 2", "protein", AA, 3, False, "TPC_", PGAP, "iFeatureOmegaCLI.py:580-606")
# DNA composition (ref :4579-4602)
_register_comp("NAC", "dna", NT, 1, True, "NAC_", DGAP, "iFeatureOmegaCLI.py:4579-4602")


def _cksaap_names(cfg, L, alpha=AA, tag="CKSAAP"):
    pairs = [a + b for a in alpha for b in alpha]
    return [f"{tag}_{p}.gap{g}" for g in range(cfg["kspace"] + 1) for p in pairs]


def _mk_cksaap(normalized: bool, alpha: str, gap_id: int):
    vocab = len(alpha)

    def mk_kernel(cfg, L):
        ks = cfg["kspace"]

        def kern(r: Ragged) -> np.ndarray:
            return K.kspaced_pair_counts(r.strip(gap_id), vocab, ks, normalize=normalized)

        return kern

    return mk_kernel


register(
    DescriptorSpec(
        "CKSAAP type 1", "protein", _cksaap_names, _mk_cksaap(True, AA, PGAP),
        defaults={"kspace": 3}, ref="iFeatureOmegaCLI.py:469-508",
    )
)
register(
    DescriptorSpec(
        "CKSAAP type 2", "protein", _cksaap_names, _mk_cksaap(False, AA, PGAP),
        defaults={"kspace": 3}, ref="iFeatureOmegaCLI.py:469-508",
    )
)
register(
    DescriptorSpec(
        "CKSNAP type 1", "dna",
        lambda cfg, L: _cksaap_names(cfg, L, NT, "CKSNAP"),
        _mk_cksaap(True, NT, DGAP),
        defaults={"kspace": 3}, ref="iFeatureOmegaCLI.py:4727-4773",
    )
)
register(
    DescriptorSpec(
        "CKSNAP type 2", "dna",
        lambda cfg, L: _cksaap_names(cfg, L, NT, "CKSNAP"),
        _mk_cksaap(False, NT, DGAP),
        defaults={"kspace": 3}, ref="iFeatureOmegaCLI.py:4727-4773",
    )
)


def _dde_names(cfg, L):
    return [f"DDE_{a}{b}" for a in AA for b in AA]


def _mk_dde(cfg, L):
    # DDE (ref :539-578): dipeptide deviation from codon-expected mean.
    codons = {"A": 4, "C": 2, "D": 2, "E": 2, "F": 2, "G": 4, "H": 2, "I": 3,
              "K": 2, "L": 6, "M": 1, "N": 2, "P": 4, "Q": 2, "R": 6, "S": 6,
              "T": 4, "V": 4, "W": 1, "Y": 2}
    cvec = np.array([codons[a] / 61.0 for a in AA])
    tm = np.outer(cvec, cvec).reshape(-1)  # (400,)

    def kern(r: Ragged) -> np.ndarray:
        rs = r.strip(PGAP)
        f = K.kgram_counts(rs, 20, 2, normalize=True)
        nlen = np.maximum(rs.lengths.astype(np.float64) - 1.0, 1.0)
        tv = tm[None, :] * (1.0 - tm[None, :]) / nlen[:, None]
        return (f - tm[None, :]) / np.sqrt(tv)

    return kern


register(DescriptorSpec("DDE", "protein", _dde_names, _mk_dde, ref="iFeatureOmegaCLI.py:539-578"))


# --------------------------------------------------------------------------
# A6 + A1 — grouped compositions
# --------------------------------------------------------------------------


def _register_grouped_comp(name, k, normalized, prefix, sep, ref, groups=None):
    groups = groups or GAAC_GROUPS
    gmap = group_map(groups)
    keys = [g[0] for g in groups]

    def mk_names(cfg, L):
        out = [""]
        for _ in range(k):
            out = [p + (sep if p else "") + key for p in out for key in keys]
        return [f"{prefix}{c}" for c in out]

    def mk_kernel(cfg, L):
        def kern(r: Ragged) -> np.ndarray:
            return K.kgram_counts(r.strip(PGAP).remap(gmap), 5, k, normalize=normalized)

        return kern

    register(DescriptorSpec(name, "protein", mk_names, mk_kernel, ref=ref))


_register_grouped_comp("GAAC", 1, True, "GAAC_", "", "iFeatureOmegaCLI.py:1027-1058")
_register_grouped_comp("GDPC type 1", 2, True, "GDPC_", ".", "iFeatureOmegaCLI.py:1163-1207", GAAC_GROUPS_EGAAC)
_register_grouped_comp("GDPC type 2", 2, False, "GDPC_", ".", "iFeatureOmegaCLI.py:1163-1207", GAAC_GROUPS_EGAAC)
_register_grouped_comp("GTPC type 1", 3, True, "GTPC_", ".", "iFeatureOmegaCLI.py:1209-1261", GAAC_GROUPS_EGAAC)
_register_grouped_comp("GTPC type 2", 3, False, "GTPC_", ".", "iFeatureOmegaCLI.py:1209-1261", GAAC_GROUPS_EGAAC)


def _cksaagp_names(cfg, L):
    keys = [g[0] for g in GAAC_GROUPS_EGAAC]
    pairs = [a + "." + b for a in keys for b in keys]
    return [f"CKSAAGP_{p}.gap{g}" for g in range(cfg["kspace"] + 1) for p in pairs]


def _mk_cksaagp(normalized: bool):
    gmap = group_map(GAAC_GROUPS)

    def mk_kernel(cfg, L):
        ks = cfg["kspace"]

        def kern(r: Ragged) -> np.ndarray:
            return K.kspaced_pair_counts(
                r.strip(PGAP).remap(gmap), 5, ks, normalize=normalized
            )

        return kern

    return mk_kernel


register(
    DescriptorSpec(
        "CKSAAGP type 1", "protein", _cksaagp_names, _mk_cksaagp(True),
        defaults={"kspace": 3}, ref="iFeatureOmegaCLI.py:1107-1161",
    )
)
register(
    DescriptorSpec(
        "CKSAAGP type 2", "protein", _cksaagp_names, _mk_cksaagp(False),
        defaults={"kspace": 3}, ref="iFeatureOmegaCLI.py:1107-1161",
    )
)


# --------------------------------------------------------------------------
# A3 — sliding-window compositions (equal-length)
# --------------------------------------------------------------------------


def _mk_eaac(cfg, L):
    perm = tk.perm_for(AA_ALT, gap_id=PGAP)

    def kern(r: Ragged) -> np.ndarray:
        return K.sliding_window_comp(r, 20, cfg["sliding_window"], perm=perm, denom="window")

    return kern


register(
    DescriptorSpec(
        "EAAC", "protein",
        lambda cfg, L: [
            f"EAAC_SW.{w}.{aa}"
            for w in range(1, L - cfg["sliding_window"] + 2)
            for aa in AA_ALT
        ],
        _mk_eaac, equal_length=True, defaults={"sliding_window": 5},
        ref="iFeatureOmegaCLI.py:438-467",
    )
)


def _mk_egaac(cfg, L):
    gmap = group_map(GAAC_GROUPS_EGAAC)

    def kern(r: Ragged) -> np.ndarray:
        return K.sliding_window_comp(r, 5, cfg["sliding_window"], perm=gmap, denom="window")

    return kern


register(
    DescriptorSpec(
        "EGAAC", "protein",
        lambda cfg, L: [
            f"EGAAC_SW{w}.{g}"
            for w in range(1, L - cfg["sliding_window"] + 2)
            for g, _ in GAAC_GROUPS_EGAAC
        ],
        _mk_egaac, equal_length=True, defaults={"sliding_window": 5},
        ref="iFeatureOmegaCLI.py:1060-1098",
    )
)


def _mk_enac(cfg, L):
    def kern(r: Ragged) -> np.ndarray:
        return K.sliding_window_comp(r, 4, cfg["sliding_window"], denom="window")

    return kern


register(
    DescriptorSpec(
        "ENAC", "dna",
        lambda cfg, L: [
            f"ENAC_sw.{w}.{nt}"
            for w in range(1, L - cfg["sliding_window"] + 2)
            for nt in NT
        ],
        _mk_enac, equal_length=True, defaults={"sliding_window": 5},
        ref="iFeatureOmegaCLI.py:4662-4695",
    )
)


# --------------------------------------------------------------------------
# DNA Kmer (ref :4305-4371) and ANF/binary
# --------------------------------------------------------------------------


def _mk_kmer(normalized: bool):
    def mk_kernel(cfg, L):
        k = cfg["kmer"]

        def kern(r: Ragged) -> np.ndarray:
            return K.kgram_counts(r.strip(DGAP), 4, k, normalize=normalized)

        return kern

    return mk_kernel


register(
    DescriptorSpec(
        "Kmer type 1", "dna",
        lambda cfg, L: [f"Kmer_{m}" for m in _kmers(NT, cfg["kmer"])],
        _mk_kmer(True), defaults={"kmer": 3}, ref="iFeatureOmegaCLI.py:4305-4371",
    )
)
register(
    DescriptorSpec(
        "Kmer type 2", "dna",
        lambda cfg, L: [f"Kmer_{m}" for m in _kmers(NT, cfg["kmer"])],
        _mk_kmer(False), defaults={"kmer": 3}, ref="iFeatureOmegaCLI.py:4305-4371",
    )
)


def _mk_anf(cfg, L):
    def kern(r: Ragged) -> np.ndarray:
        return K.cumulative_frequency(r)

    return kern


register(
    DescriptorSpec(
        "ANF", "dna",
        lambda cfg, L: [f"ANF_{i}" for i in range(1, L + 1)],
        _mk_anf, equal_length=True, ref="iFeatureOmegaCLI.py:4604-4627",
    )
)


def _onehot_table(order: str, alphabet: str, gap_rows: int = 1) -> np.ndarray:
    """(len(alphabet)+gap_rows, len(order)) one-hot rows; gap rows all-zero."""
    t = np.zeros((len(alphabet) + gap_rows, len(order)), dtype=np.float64)
    for i, c in enumerate(alphabet):
        j = order.find(c)
        if j >= 0:
            t[i, j] = 1.0
    return t


def _mk_binary_protein(cfg, L):
    table = _onehot_table(AA_ALT, AA)

    def kern(r: Ragged) -> np.ndarray:
        return K.positional_lookup(r, table)

    return kern


register(
    DescriptorSpec(
        "binary", "protein",
        lambda cfg, L: [f"Binary_{i}" for i in range(1, 20 * L + 1)],
        _mk_binary_protein, equal_length=True, ref="iFeatureOmegaCLI.py:608-635",
    )
)


def _mk_binary_dna(cfg, L):
    table = _onehot_table(NT, NT)

    def kern(r: Ragged) -> np.ndarray:
        return K.positional_lookup(r, table)

    return kern


register(
    DescriptorSpec(
        "binary", "dna",
        lambda cfg, L: [f"Binary_{i}" for i in range(1, 4 * L + 1)],
        _mk_binary_dna, equal_length=True, ref="iFeatureOmegaCLI.py:4697-4725",
    )
)


# --------------------------------------------------------------------------
# A2 — positional lookup descriptors (equal-length).  Lookup tables pinned
# from the reference by tools/make_lookups.py (probe method) into
# resources/*.npz; loaded lazily so the registry imports without Spark.
# --------------------------------------------------------------------------

from ifeatureomega_cli_spark.functions import lookups as LK  # noqa: E402


def _register_a2(
    name: str,
    seq_type: str,
    names_fn,
    ref: str,
    grams: int = 1,
    prop_major: bool = False,
    table_key: str | None = None,
):
    """Register a positional-lookup descriptor backed by a probed table.

    grams>1: the lookup key is the k-gram id at each position (L-k+1 blocks).
    prop_major: values laid out property-major across positions (DPCP2/TPCP2
    replicate the reference's header/value layout mismatch, ref :5069/:5081).
    """

    def mk_kernel(cfg, L):
        table = LK.a2_table(seq_type if seq_type != "rna" else "dna", table_key or name, grams)

        def kern(r: Ragged):
            if grams == 1:
                out = K.positional_lookup(r, table)
                if prop_major:
                    n = r.n
                    D = table.shape[1]
                    out = out.reshape(n, -1, D).transpose(0, 2, 1).reshape(n, -1)
                return out
            # k-gram positional lookup: compute gram ids then gather
            m = r.to_matrix()
            vocab = 4 if seq_type in ("dna", "rna") else 20
            gap = vocab  # gap/unknown sentinel
            ids = np.zeros((m.shape[0], m.shape[1] - grams + 1), dtype=np.int64)
            ok = np.ones_like(ids, dtype=bool)
            for j in range(grams):
                t = m[:, j : m.shape[1] - grams + 1 + j]
                ok &= t < vocab
                ids = ids * vocab + np.where(t < vocab, t, 0)
            gathered = table[ids]  # (n, L-k+1, D)
            gathered = np.where(ok[..., None], gathered, 0.0)
            if prop_major:
                gathered = gathered.transpose(0, 2, 1)
            return gathered.reshape(m.shape[0], -1)

        return kern

    register(
        DescriptorSpec(name, seq_type, names_fn, mk_kernel, equal_length=True, ref=ref)
    )


_B3_LABELS = {
    1: ["Polar", "Neutral", "Hydrophobicity"],
    2: ["Volume_range(0-2.78)", "Volumn_range(2.95-4.0)", "Volumn_range(4.03-8.08)"],
    3: ["PolarityValue(4.9-6.2)", "PolarityValue(8.0-9.2)", "PolarityValue(10.4-13.0)"],
    4: ["PolarizabilityValue(0-0.108)", "PolarizabilityValue(0.128-0.186)",
        "PolarizabilityValue(0.219-0.409)"],
    5: ["Positive", "Neutral", "Negative"],
    6: ["Helix", "Strand", "Coil"],
    7: ["Buried", "Exposed", "Intermediate"],
}
_OPF10_LABELS = ["Aromatic", "Negative", "Positive", "Polar", "Hydrophobic",
                 "Aliphatic", "Tiny", "Charged", "Small", "Proline"]
_OPF7_LABELS = ["Charge", "Hydrophobicity", "Normalized vander Waals volume",
                "Polarity", "Polariizability", "Secondary Structure",
                "Solvent Accessibility"]
_B5T1_LABELS = ["alphatic", "aromatic", "postivecharge", "negativecharge", "uncharge"]

_register_a2("binary_6bit", "protein",
             lambda cfg, L: [f"Binary6_p{i}_g{j}" for i in range(1, L + 1) for j in range(1, 7)],
             "iFeatureOmegaCLI.py:637-670")
_register_a2("binary_5bit type 1", "protein",
             lambda cfg, L: [f"Binary5_t1_p{i}_{lab}" for i in range(1, L + 1) for lab in _B5T1_LABELS],
             "iFeatureOmegaCLI.py:672-704")
_register_a2("binary_5bit type 2", "protein",
             lambda cfg, L: [f"Binary5_t2_{i}" for i in range(1, 5 * L + 1)],
             "iFeatureOmegaCLI.py:706-752")
for _t in range(1, 8):
    _register_a2(f"binary_3bit type {_t}", "protein",
                 (lambda labs: lambda cfg, L: [f"Binary3_t{labs[0]}_p{i}_g{lab}"
                                               for i in range(1, L + 1) for lab in labs[1]])((_t, _B3_LABELS[_t])),
                 "iFeatureOmegaCLI.py:754-978")
_register_a2("AESNN3", "protein",
             lambda cfg, L: [f"AESNN3_p{p}z{z}" for p in range(1, L + 1) for z in ("1", "2", "3")],
             "iFeatureOmegaCLI.py:980-1025")
_register_a2("ZScale", "protein",
             lambda cfg, L: [f"ZScale_p{p}.z{z}" for p in range(1, L + 1) for z in ("1", "2", "3", "4", "5")],
             "iFeatureOmegaCLI.py:1317-1362")
_register_a2("BLOSUM62", "protein",
             lambda cfg, L: [f"blosum62_{i}" for i in range(1, 20 * L + 1)],
             "iFeatureOmegaCLI.py:1364-1408")
_register_a2("AAIndex", "protein",
             lambda cfg, L: [f"AAindex_p.{p}.{prop}" for p in range(1, L + 1)
                             for prop in cfg["aaindex"].split(";")],
             "iFeatureOmegaCLI.py:1263-1315")
DESCRIPTORS["protein:AAIndex"].defaults = {
    "aaindex": "ANDN920101;ARGP820101;ARGP820102;ARGP820103;BEGF750101;BEGF750102;BEGF750103;BHAR880101"
}
_register_a2("OPF_10bit", "protein",
             lambda cfg, L: [f"OPF_p{i}_{lab}" for i in range(1, L + 1) for lab in _OPF10_LABELS],
             "iFeatureOmegaCLI.py:2366-2405")
for _t in (1, 2, 3):
    _register_a2(f"OPF_7bit type {_t}", "protein",
                 (lambda t: lambda cfg, L: [f"OPF7_t{t}_p{i}_{lab}"
                                            for i in range(1, L + 1) for lab in _OPF7_LABELS])(_t),
                 "iFeatureOmegaCLI.py:2407-2519")

# DNA positional lookups
_register_a2("NCP", "dna",
             lambda cfg, L: [f"NCP_{i}" for i in range(1, 3 * L + 1)],
             "iFeatureOmegaCLI.py:4629-4660")
_register_a2("EIIP", "dna",
             lambda cfg, L: [f"EIIP_{i}" for i in range(1, L + 1)],
             "iFeatureOmegaCLI.py:4775-4806")
_register_a2("DBE", "dna",
             lambda cfg, L: [f"DBE_{i}" for i in range(1, 4 * (L - 1) + 1)],
             "iFeatureOmegaCLI.py:4890-4936", grams=2)

_DI_DNA_DEFAULT = "Rise;Roll;Shift;Slide;Tilt;Twist"


def _dpcp2_names(cfg, L):
    props = cfg["Di-DNA-Phychem"].split(";")
    return [f"DPCP2_{p}_pos{i}" for i in range(1, L) for p in props]


_register_a2("DPCP type2", "dna", _dpcp2_names,
             "iFeatureOmegaCLI.py:5042-5092", grams=2, prop_major=True)
DESCRIPTORS["dna:DPCP type2"].defaults = {"Di-DNA-Phychem": _DI_DNA_DEFAULT}


def _tpcp2_names(cfg, L):
    props = cfg["Tri-DNA-Phychem"].split(";")
    return [f"TPCP2_{p}_pos{i}" for i in range(1, L - 1) for p in props]


_register_a2("TPCP type2", "dna", _tpcp2_names,
             "iFeatureOmegaCLI.py:5150-5196", grams=3, prop_major=True)
DESCRIPTORS["dna:TPCP type2"].defaults = {"Tri-DNA-Phychem": "Dnase I;Bendability (DNAse)"}


def _register_ps(k: int):
    """PS2/PS3/PS4 (ref :5271-5362): positional one-hot of k-grams."""
    dim = 4**k

    def mk_kernel(cfg, L):
        table = np.eye(dim, dtype=np.float64)

        def kern(r: Ragged):
            m = r.to_matrix()
            ids = np.zeros((m.shape[0], m.shape[1] - k + 1), dtype=np.int64)
            ok = np.ones_like(ids, dtype=bool)
            for j in range(k):
                t = m[:, j : m.shape[1] - k + 1 + j]
                ok &= t < 4
                ids = ids * 4 + np.where(t < 4, t, 0)
            out = table[ids]
            out = np.where(ok[..., None], out, 0.0)
            return out.reshape(m.shape[0], -1)

        return kern

    register(DescriptorSpec(
        f"PS{k}", "dna",
        lambda cfg, L: [f"PS{k}_{i}" for i in range(1, dim * (L - k + 1) + 1)],
        mk_kernel, equal_length=True, ref="iFeatureOmegaCLI.py:5271-5362",
    ))


for _k in (2, 3, 4):
    _register_ps(_k)
