"""COVERAGE.md tallies are pinned to the code (round-6 VERDICT #8).

The doc's headline numbers (72/48/36 descriptor entries, 14 structure
types, 153 registry specs) were hand-maintained and drifted once in
round 4; this test derives every tally from `functions/registry.py` plus
the cross-sample surface and parses COVERAGE.md for the claimed numbers,
so doc and code can never silently diverge again.

Counting convention (matches COVERAGE.md / VERDICT):

* per-family tallies = registry specs + the crosssample-implemented
  PSTNP variants (PSTNPss/ds are reference dispatch entries computed by
  `operators/crosssample.py`, not `DescriptorSpec`s);
* KNN is tallied as its own cross-sample row, not inside a family;
* the reference's protein dict has 74 keys of which 1 is dead
  (`'OPF_10bit type 1'` → nonexistent `_OPF_10bit_type_1`,
  iFeatureOmegaCLI.py:272) — live = 73 = 72 registry + KNN.
"""

from __future__ import annotations

import re
from pathlib import Path

from ifeatureomega_cli_spark.functions.registry import descriptor_names

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"

# crosssample.py implements PSTNP for these namespaces (ss for dna+rna,
# ds for dna only) and KNN for all three sequence namespaces
PSTNP_EXTRAS = {"protein": 0, "dna": 2, "rna": 1}
STRUCTURE_TYPES = 14  # operators/structure.py, COVERAGE §2.6


def _registry_counts() -> dict[str, int]:
    return {ns: len(descriptor_names(ns)) for ns in ("protein", "dna", "rna")}


def test_registry_totals_and_namespace_split():
    counts = _registry_counts()
    assert len(descriptor_names()) == sum(counts.values())
    # the live reference dispatch surface, minus KNN (separate row):
    assert counts["protein"] + PSTNP_EXTRAS["protein"] == 72
    assert counts["dna"] + PSTNP_EXTRAS["dna"] == 48
    assert counts["rna"] + PSTNP_EXTRAS["rna"] == 36


def test_coverage_doc_matches_registry():
    doc = COVERAGE.read_text()
    counts = _registry_counts()

    def claimed(pattern: str) -> int:
        m = re.search(pattern, doc)
        assert m, f"COVERAGE.md lost its tally line: {pattern!r}"
        return int(m.group(1))

    assert claimed(r"\((\d+) specs\)") == len(descriptor_names())
    assert claimed(r"Protein descriptors — (\d+)/") == \
        counts["protein"] + PSTNP_EXTRAS["protein"]
    assert claimed(r"DNA descriptors — (\d+)/") == \
        counts["dna"] + PSTNP_EXTRAS["dna"]
    assert claimed(r"RNA descriptors — (\d+)/") == \
        counts["rna"] + PSTNP_EXTRAS["rna"]
    assert claimed(r"Structure — ✅ (\d+)/") == STRUCTURE_TYPES


def test_crosssample_pstnp_knn_exist():
    # the extras the tallies lean on must actually exist as callables
    from ifeatureomega_cli_spark.operators import crosssample

    for fn in ("fit_pstnp", "pstnp_transform", "pstnp", "knn_features"):
        assert callable(getattr(crosssample, fn))


def test_ligand_tally_matches_code():
    """COVERAGE.md's §2.7 headline (23/24 real) derives from
    GRAPH_FAMILY_NAMES, so the doc can't drift when a family flips from
    stub to real (round 7: MACCS joined, 'Morgan fingerprints' is the
    one stub left)."""
    from ifeatureomega_cli_spark.operators.ligand import (
        GRAPH_FAMILY_NAMES, LIGAND_FAMILIES)

    real = len(GRAPH_FAMILY_NAMES)
    total = len(LIGAND_FAMILIES)
    assert GRAPH_FAMILY_NAMES <= set(LIGAND_FAMILIES)
    assert (real, total) == (23, 24)
    assert set(LIGAND_FAMILIES) - GRAPH_FAMILY_NAMES == \
        {"Morgan fingerprints"}
    doc = COVERAGE.read_text()
    m = re.search(r"§2\.7 Ligand — ✅ (\d+)/(\d+) families REAL", doc)
    assert m and (int(m.group(1)), int(m.group(2))) == (real, total)
