"""Structure (iStructure) and ligand (iLigand) descriptors — documented
stubs (SURVEY.md §2.6–2.7: out of v1 scope).

WHY out of scope: the reference's structure descriptors depend on Bio.PDB
plus external native binaries (DSSP for secondary structure, ref
iFeatureOmegaCLI.py:9154; MSMS for residue depth, :9290) and its ligand
descriptors on RDKit (`chem/*`, :9891-9907).  None of those are in this
container, and shipping per-node native binaries is a deployment concern,
not an engine one.

WHAT the Spark design would be (so the port is mechanical when the deps
exist):

* shell-composition descriptors (AAC/GAAC/SS3/SS8/AC type1/2,
  ref :9333-9632): residues table `(target, chain, resseq, resname, x, y,
  z, property)` → pairwise Cβ distance via a range join
  `df.join(df2, (d >= lo) & (d < hi))` on spatially bucketed coordinates →
  `groupBy(shell).pivot(resname).count()` — pure DataFrame ops;
* residue-contact-graph metrics (:9633-9689): edges from the same range
  join, degree = groupBy count; betweenness/closeness/eigenvector via
  GraphFrames or a per-target pandas UDF wrapping networkx (graphs are
  per-protein small);
* ligand descriptor families (:9812-9846): per-molecule scalar maps →
  one `mapInPandas` over a `(mol_id, smiles)` table wrapping RDKit.

Each public function below raises NotImplementedError with the citation so
callers get an actionable message rather than silent absence.
"""

from __future__ import annotations

_MSG = (
    "{name} requires {dep} (not available in this environment). "
    "See ifeatureomega_cli_spark/structure_ligand.py for the Spark design; "
    "reference: iFeatureOmegaCLI.py:{ref}."
)


def structure_descriptor(df, name: str, **params):
    """Shell-composition / graph descriptors over a residues table."""
    raise NotImplementedError(
        _MSG.format(name=f"structure descriptor {name!r}",
                    dep="Bio.PDB (+ DSSP/MSMS binaries)", ref="8976-9786")
    )


def ligand_descriptor(df, name: str, **params):
    """Molecular descriptors / fingerprints over a SMILES table."""
    raise NotImplementedError(
        _MSG.format(name=f"ligand descriptor {name!r}", dep="RDKit",
                    ref="9788-9949")
    )
