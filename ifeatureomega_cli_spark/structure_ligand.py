"""Structure (iStructure) and ligand (iLigand) descriptors — scope map.

ROUND-3 SCOPE CHANGE: 9 of the reference's 14 structure feature types are
pure coordinate geometry and are now IMPLEMENTED with no native deps —
see sources/pdb.py (fixed-width PDB text reader, no Bio.PDB) and
operators/structure.py:

    AAC_type1/2, GAAC_type1/2        residue_shell_composition()
    AC_type1/2                       atom_shell_composition()
    Network-based index              network_metrics() (networkx, as ref)
    HSE_CA, HSE_CB                   hse() (Hamelryck 2005 geometry)

STILL out of scope, with reasons:

* SS3/SS8 type1/2 (4 types): need per-residue secondary-structure letters
  from the DSSP binary (ref iFeatureOmegaCLI.py:9154) — the shell math is
  the same as residue_shell_composition, but there is no input without
  DSSP.  When DSSP letters are available as a column, pass them through
  residue_shell_composition with a custom class mapping.
* Residue depth: needs the MSMS surface binary (:9290).
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


def secondary_structure_descriptor(df, name: str, **params):
    """SS3/SS8 type1/2 — blocked on the DSSP binary."""
    raise NotImplementedError(
        _MSG.format(name=f"structure descriptor {name!r}",
                    dep="the DSSP binary", ref="9154, 9445-9576"))


def residue_depth(df, **params):
    """Residue depth — blocked on the MSMS surface binary."""
    raise NotImplementedError(
        _MSG.format(name="residue depth", dep="the MSMS binary",
                    ref="9286-9307"))


def ligand_descriptor(df, name: str, **params):
    """Molecular descriptors / fingerprints over a SMILES table."""
    raise NotImplementedError(
        _MSG.format(name=f"ligand descriptor {name!r}", dep="RDKit",
                    ref="9788-9949"))
