"""Structure (iStructure) and ligand (iLigand) descriptors — scope map.

ROUND-3 SCOPE CHANGE: 9 of the reference's 14 structure feature types are
pure coordinate geometry and are now IMPLEMENTED with no native deps —
see sources/pdb.py (fixed-width PDB text reader, no Bio.PDB) and
operators/structure.py:

    AAC_type1/2, GAAC_type1/2        residue_shell_composition()
    AC_type1/2                       atom_shell_composition()
    Network-based index              network_metrics() (networkx, as ref)
    HSE_CA, HSE_CB                   hse() (Hamelryck 2005 geometry)

ROUND-4 SCOPE CHANGE: SS3/SS8 type1/2 (4 more types) are now IMPLEMENTED
for user-supplied secondary-structure letters —
residue_shell_composition(kind="SS8"/"SS3", ss_col=...) computes exactly
the reference's shell features (ref :9445-9576, incl. the SS3
8-letter-dict quirk) given a column of DSSP 8-state letters.  Only the
DSSP BINARY itself (which produces those letters, :9154) remains
unavailable; secondary_structure_descriptor() below raises with that
pointer when no ss_col is supplied.

Residue depth (round 4) follows the same pattern: the MSMS binary is
absent, but its .vert output format is published text —
sources/pdb.read_msms_vert reads precomputed surfaces and
operators/structure.residue_depth computes the reference's mean-of-min
distances over them.  All 14 structure feature types now have a real
computation path; only the DSSP/MSMS binaries that produce SS letters /
surface vertices remain external inputs.

STILL out of scope, with reasons:
* Ligand descriptors: need RDKit (`chem/*`, :9891-9907) — per-molecule
  scalar maps; the Spark design is one `mapInPandas` over a
  `(mol_id, smiles)` table wrapping RDKit when it exists.

Each stub below raises NotImplementedError with the citation so callers
get an actionable message rather than silent absence.
"""

from __future__ import annotations

_MSG = (
    "{name} requires {dep} (not available in this environment). "
    "See ifeatureomega_cli_spark/structure_ligand.py for the scope map; "
    "reference: iFeatureOmegaCLI.py:{ref}."
)

# implemented structure surface lives here:
from ifeatureomega_cli_spark.operators.structure import (  # noqa: F401
    atom_shell_composition, hse, network_metrics, residue_shell_composition)
from ifeatureomega_cli_spark.sources.pdb import (  # noqa: F401
    read_pdb, read_pdb_dir, residue_table)


def secondary_structure_descriptor(df, name: str, ss_col: str | None = None,
                                   **params):
    """SS3/SS8 type1/2 over a residue table.

    With `ss_col` (per-residue DSSP 8-state letters, user-supplied):
    delegates to residue_shell_composition — the full reference feature
    set (:9445-9576).  Without it: the DSSP binary that would compute the
    letters is unavailable, so raise with the citation."""
    kinds = {"SS3_type1": ("SS3", False), "SS3_type2": ("SS3", True),
             "SS8_type1": ("SS8", False), "SS8_type2": ("SS8", True)}
    if name not in kinds:
        raise KeyError(f"unknown SS descriptor {name!r}; one of {sorted(kinds)}")
    if not ss_col:
        raise NotImplementedError(
            _MSG.format(name=f"structure descriptor {name!r} without ss_col",
                        dep="the DSSP binary", ref="9154, 9445-9576"))
    kind, type2 = kinds[name]
    return residue_shell_composition(df, kind=kind, type2=type2,
                                     ss_col=ss_col, **params)


def residue_depth(df, surface=None, **params):
    """Residue depth over an atoms table + surface point cloud.

    With `surface` (a (pdb_id, x, y, z) DataFrame — e.g. precomputed MSMS
    vertices via sources.pdb.read_msms_vert): delegates to
    operators.structure.residue_depth, the full reference computation
    (:9286-9307).  Without it: the MSMS binary that would compute the
    surface is unavailable, so raise with the citation."""
    if surface is None:
        raise NotImplementedError(
            _MSG.format(name="residue depth without a surface table",
                        dep="the MSMS binary (or precomputed .vert files "
                            "via sources.pdb.read_msms_vert)",
                        ref="9286-9307"))
    from ifeatureomega_cli_spark.operators.structure import (
        residue_depth as _rd)
    return _rd(df, surface, **params)


def ligand_descriptor(df, name: str, **params):
    """Molecular descriptors / fingerprints over a (mol_id, smiles) table.

    The Spark pipeline (reader, schema, invalid-SMILES skipping, Arrow
    batching, 24-family registry) is IMPLEMENTED in operators/ligand.py.
    The four GRAPH families (Constitution/Topology/Connectivity/Kappa)
    compute for REAL without RDKit (round 6: functions/molgraph.py +
    functions/chemdesc.py) and route straight through; the remaining
    numeric families still need RDKit — this facade keeps the honest
    error for them in chemistry-less environments while routing to the
    real plumbing when a stub run is acceptable (pass allow_stub=True)."""
    from ifeatureomega_cli_spark.operators.ligand import (
        GRAPH_FAMILY_NAMES, _rdkit_or_none, ligand_descriptors)
    if name in GRAPH_FAMILY_NAMES or params.pop("allow_stub", False) \
            or _rdkit_or_none() is not None:
        return ligand_descriptors(df, name, **params)
    raise NotImplementedError(
        _MSG.format(name=f"ligand descriptor {name!r} (numeric values)",
                    dep="RDKit (plumbing is ready: operators/ligand.py; "
                        "pass allow_stub=True for the deterministic stub)",
                    ref="9788-9949"))
