"""Structure descriptors: hand-computed geometric fixtures + 1iir.pdb
sanity.  Biopython is absent (the reference's own structure path cannot run
here), so correctness is pinned by closed-form expectations on constructed
geometries — the same math the reference's no-DSSP fallback path computes
(ref iFeatureOmegaCLI.py:9213-9241, :9333-9444, :9577-9690)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

REF_PDB = "/root/reference/data_examples/1iir.pdb"


def _mk_residues(spark, rows):
    """rows: (chain, resseq, resname, aa, x, y, z)"""
    return spark.createDataFrame(
        [("test",) + r for r in rows],
        "pdb_id string, chain string, resseq long, resname string, "
        "aa string, x double, y double, z double")


def test_pdb_parser_1iir(spark):
    from ifeatureomega_cli_spark.sources.pdb import read_pdb, residue_table

    atoms = read_pdb(spark, REF_PDB)
    pdf = atoms.toPandas()
    # independent count: ATOM/HETATM lines of model 1, altloc in (' ','A')
    n_expected = 0
    with open(REF_PDB) as f:
        models = 0
        for line in f:
            if line.startswith("MODEL"):
                models += 1
                if models > 1:
                    break
            if line.startswith("ENDMDL"):
                break
            if line[0:6] in ("ATOM  ", "HETATM") and line[16] in (" ", "A"):
                n_expected += 1
    assert len(pdf) == n_expected and n_expected > 1000
    assert set(pdf["record"]) <= {"ATOM", "HETATM"}
    assert pdf["x"].abs().max() < 1000 and pdf["element"].isin(
        ["C", "N", "O", "S", "P", "H", "FE", "ZN", "MG", "CA", "NA", "CL",
         "MN", "K", "I", "SE", "CU"]).all()
    res = residue_table(atoms).toPandas()
    # every standard residue appears once, with one rep atom each
    assert res.duplicated(["chain", "resseq"]).sum() == 0
    assert len(res) > 100
    assert set(res["aa"]) <= set("ACDEFGHIKLMNPQRSTVWY")


def test_residue_shell_composition_hand_computed(spark):
    """4 residues on the x-axis at 0, 4, 8, 16 Å.  For the residue at x=0
    (GLY): distances 4, 8, 16 → shells [3,5): {A}, [7,9): {L}, [15,17): {F}.
    Type 1 fractions are 1.0 for exactly those (shell, aa) slots; type 2 is
    cumulative and includes self from shell 1."""
    from ifeatureomega_cli_spark.operators.structure import (
        residue_shell_composition, shell_feature_names)

    rows = [("A", 1, "GLY", "G", 0.0, 0.0, 0.0),
            ("A", 2, "ALA", "A", 4.0, 0.0, 0.0),
            ("A", 3, "LEU", "L", 8.0, 0.0, 0.0),
            ("A", 4, "PHE", "F", 16.0, 0.0, 0.0)]
    df = _mk_residues(spark, rows)
    names = shell_feature_names("AAC", (3, 20, 2))
    out = (residue_shell_composition(df, "AAC").toPandas()
           .set_index("sample"))
    f = dict(zip(names, out.loc["A_GLY_1"]["features"]))
    assert f["shell_1.A"] == 1.0          # x=4 in [3,5)
    assert f["shell_3.L"] == 1.0          # x=8 in [7,9)
    assert f["shell_7.F"] == 1.0          # x=16 in [15,17)
    nonzero = {k for k, v in f.items() if v != 0}
    assert nonzero == {"shell_1.A", "shell_3.L", "shell_7.F"}
    # type 2: cumulative, includes self (distance 0 < s+2 for every s)
    out2 = (residue_shell_composition(df, "AAC", type2=True).toPandas()
            .set_index("sample"))
    f2 = dict(zip(names, out2.loc["A_GLY_1"]["features"]))
    # shell 1 = dist < 5: {self G, A at 4} → each 1/2
    assert f2["shell_1.G"] == 0.5 and f2["shell_1.A"] == 0.5
    # last shell (19): dist < 21: all four residues
    assert f2["shell_9.G"] == 0.25 and f2["shell_9.F"] == 0.25
    # GAAC groups: A,L aliphatic; F aromatic; G aliphatic
    gnames = shell_feature_names("GAAC", (3, 20, 2))
    g = (residue_shell_composition(df, "GAAC").toPandas()
         .set_index("sample"))
    gf = dict(zip(gnames, g.loc["A_GLY_1"]["features"]))
    assert gf["shell_1.aliphatic"] == 1.0
    assert gf["shell_7.aromatic"] == 1.0


def test_residue_shell_fractions_sum_to_one_1iir(spark):
    from ifeatureomega_cli_spark.operators.structure import (
        residue_shell_composition)
    from ifeatureomega_cli_spark.sources.pdb import read_pdb, residue_table

    res = residue_table(read_pdb(spark, REF_PDB))
    out = residue_shell_composition(res, "AAC").toPandas()
    F = np.stack(out["features"].to_numpy())
    assert F.shape[1] == 9 * 20
    sums = F.reshape(len(F), 9, 20).sum(axis=2)
    # each shell's fractions sum to 1 (occupied) or 0 (empty)
    assert np.all((np.abs(sums - 1) < 1e-9) | (sums == 0))
    # type2 last shell of a globular protein is never empty
    out2 = residue_shell_composition(res, "AAC", type2=True).toPandas()
    F2 = np.stack(out2["features"].to_numpy())
    s2 = F2.reshape(len(F2), 9, 20).sum(axis=2)
    assert np.allclose(s2[:, -1], 1.0)


def test_atom_shell_composition_hand_computed(spark):
    """Target CA at origin; C at 1.5 Å, N at 2.5 Å, O at 2.6 Å, water O at
    2.7 Å (excluded), H at 2.8 Å (not CNOS — excluded from denominator)."""
    from ifeatureomega_cli_spark.operators.structure import (
        atom_shell_composition, shell_feature_names)

    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    mk = lambda serial, name, elem, x, het=" ", res="ALA": (  # noqa: E731
        "t", "ATOM", serial, name, "", res, "A", 1, "", x, 0.0, 0.0,
        1.0, 0.0, elem, het)
    atoms = spark.createDataFrame([
        mk(1, "CA", "C", 0.0),
        mk(2, "CB", "C", 1.5),
        mk(3, "N", "N", 2.5),
        mk(4, "O", "O", 2.6),
        mk(5, "OW", "O", 2.7, het="W", res="HOH"),
        mk(6, "H1", "H", 2.8),
    ], cols)
    names = shell_feature_names("AC", (1, 10, 1))
    out = atom_shell_composition(atoms).toPandas().set_index("sample")
    assert list(out.index) == ["A_C_1"]
    f = dict(zip(names, out.loc["A_C_1"]["features"]))
    assert f["shell_1.C"] == 1.0                      # [1,2): CB only
    assert f["shell_2.N"] == 0.5 and f["shell_2.O"] == 0.5  # [2,3): N+O
    assert sum(v for k, v in f.items() if v) == 2.0   # nothing else


def test_network_metrics_path_graph(spark):
    """Residues at x=0,10,20,30 with cutoff 11 → path graph P4: closed-form
    degree/closeness/betweenness/clustering."""
    from ifeatureomega_cli_spark.operators.structure import network_metrics

    rows = [("A", i + 1, "ALA", "A", 10.0 * i, 0.0, 0.0) for i in range(4)]
    out = (network_metrics(_mk_residues(spark, rows), cutoff=11.0)
           .toPandas().sort_values("resseq").reset_index(drop=True))
    assert out["degree"].tolist() == [1, 2, 2, 1]
    assert np.allclose(out["degree_centrality"], [1/3, 2/3, 2/3, 1/3])
    assert np.allclose(out["betweenness"], [0.0, 2/3, 2/3, 0.0])
    assert np.allclose(out["clustering_coefficient"], 0.0)
    assert np.allclose(out["closeness"], [0.5, 0.75, 0.75, 0.5])
    assert out["sample"].tolist() == ["ALA_A1", "ALA_A2", "ALA_A3", "ALA_A4"]


def test_network_metrics_disconnected(spark):
    """Default: a disconnected structure contributes zero rows (the
    reference fails only that structure — error_msg + return False), so
    one bad multi-chain complex cannot abort a corpus-scale run; other
    structures in the same job still compute.  on_disconnected="raise"
    restores the strict error."""
    from ifeatureomega_cli_spark.operators.structure import network_metrics

    bad = [("A", 1, "ALA", "A", 0.0, 0.0, 0.0),
           ("A", 2, "GLY", "G", 100.0, 0.0, 0.0)]
    good = [("A", i + 1, "ALA", "A", 10.0 * i, 0.0, 0.0) for i in range(4)]
    # two structures in one job: 'bad' disconnected, 'good' a P4 path
    import pyspark.sql.functions as SF
    both = (_mk_residues(spark, bad).withColumn("pdb_id", SF.lit("bad"))
            .unionByName(_mk_residues(spark, good)
                         .withColumn("pdb_id", SF.lit("good"))))
    out = network_metrics(both, cutoff=11.0).toPandas()
    assert set(out["pdb_id"]) == {"good"} and len(out) == 4
    with pytest.raises(Exception):  # Py4J wraps the ValueError
        network_metrics(_mk_residues(spark, bad), cutoff=11.0,
                        on_disconnected="raise").collect()


def test_hse_hand_computed(spark):
    """Chain along x (CA at 0, 4, 8); middle residue's pseudo-CB is −(d̂1+d̂2)
    = undefined on a straight line, so bend it: CA2 at (4, 1, 0) → pseudo-CB
    points +y-ish.  Neighbors within 12 Å split by the u·d sign."""
    from ifeatureomega_cli_spark.operators.structure import hse

    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    mk = lambda serial, name, resseq, x, y, z, res="ALA": (  # noqa: E731
        "t", "ATOM", serial, name, "", res, "A", resseq, "", x, y, z,
        1.0, 0.0, name[0], " ")
    atoms = spark.createDataFrame([
        mk(1, "CA", 1, 0.0, 0.0, 0.0),
        mk(2, "CA", 2, 4.0, 1.0, 0.0),
        mk(3, "CA", 3, 8.0, 0.0, 0.0),
        mk(4, "CB", 2, 4.0, 2.0, 0.0),   # real CB straight up from CA2
    ], cols)
    out = hse(atoms, kind="CA").toPandas().set_index("resseq")
    # only residue 2 has both neighbors
    assert list(out.index) == [2]
    # u = -(d1_hat + d2_hat): d1=(-4,-1,0)/n, d2=(4,-1,0)/n → sum=(0,-2/n,0)
    # → u = +y.  CA1 and CA3 are at u·d < 0 → both down.
    assert out.loc[2, "hse_up"] == 0 and out.loc[2, "hse_down"] == 2
    # real CB at +y → angle(u, CB-CA) = 0
    assert abs(out.loc[2, "angle"]) < 1e-9
    # CB variant: u = CB − CA = +y; same split; all residues with CA+CB or
    # pseudo emit rows — residue 2 has CB; residues 1,3 are termini with no
    # CB and no pseudo → dropped
    out_cb = hse(atoms, kind="CB").toPandas().set_index("resseq")
    assert list(out_cb.index) == [2]
    assert out_cb.loc[2, "hse_up"] == 0 and out_cb.loc[2, "hse_down"] == 2


def test_hse_up_down_partition_1iir(spark):
    """On the real structure: up+down = #CA neighbors within 12 Å, for every
    residue, both variants."""
    from ifeatureomega_cli_spark.operators.structure import hse
    from ifeatureomega_cli_spark.sources.pdb import read_pdb

    atoms = read_pdb(spark, REF_PDB)
    ca = atoms.toPandas()
    ca = ca[(ca["hetflag"] == " ") & (ca["atom_name"] == "CA")]
    X = ca[["x", "y", "z"]].to_numpy()
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    ncount = {(c, r): int(((d <= 12.0) & (d > 0)).sum())
              for c, r, d in zip(ca["chain"], ca["resseq"], D)}
    for kind in ("CA", "CB"):
        out = hse(atoms, kind=kind).toPandas()
        assert len(out) > 100
        for _, row in out.iterrows():
            assert row["hse_up"] + row["hse_down"] == ncount[
                (row["chain"], row["resseq"])], (kind, row["sample"])


def test_stubs_still_raise():
    from ifeatureomega_cli_spark import structure_ligand as SL

    with pytest.raises(NotImplementedError):
        SL.secondary_structure_descriptor(None, "SS3_type1")
    with pytest.raises(NotImplementedError):
        SL.residue_depth(None)
    with pytest.raises(NotImplementedError):
        SL.ligand_descriptor(None, "Daylight")


def test_structure_facade_surface(spark, tmp_path):
    """StructureDataset mirrors iStructure's workflow: parameter import,
    feature-type listing, descriptor dispatch, CSV export."""
    from ifeatureomega_cli_spark.api import StructureDataset

    st = StructureDataset(spark, REF_PDB)
    types = st.display_feature_types()
    assert len(types) == 14
    assert st.import_parameters(
        "/root/reference/parameters/Structure_parameters_setting.json")
    aac = st.get_descriptor("AAC_type1")
    n_res = aac.count()
    assert n_res > 100
    assert len(aac.select("features").head()[0]) == 9 * 20
    assert len(st.feature_names("AAC_type1")) == 9 * 20
    net = st.get_descriptor("Network-based index")
    assert net.count() == n_res
    hse_ca = st.get_descriptor("HSE_CA")
    assert 0 < hse_ca.count() <= n_res
    ac = st.get_descriptor("AC_type1")
    assert ac.count() > 100 and len(ac.select("features").head()[0]) == 40
    st.encodings = net
    st.to_csv(str(tmp_path / "net_csv"))
    got = spark.read.option("header", True).csv(str(tmp_path / "net_csv"))
    assert got.count() == n_res
    with pytest.raises(NotImplementedError):
        st.get_descriptor("SS3_type1")
    with pytest.raises(NotImplementedError):
        st.get_descriptor("Residue depth")
    with pytest.raises(KeyError):
        st.get_descriptor("NOPE")


def test_structure_facade_glob_distributed(spark, tmp_path):
    """A glob source parses via the distributed binaryFile path; two copies
    of 1iir under different names produce two structures' rows."""
    import shutil

    from ifeatureomega_cli_spark.api import StructureDataset

    d = tmp_path / "pdbs"
    d.mkdir()
    shutil.copy(REF_PDB, d / "1aaa.pdb")
    shutil.copy(REF_PDB, d / "2bbb.pdb")
    st = StructureDataset(spark, str(d))
    out = st.get_descriptor("AAC_type1").toPandas()
    assert set(out["pdb_id"]) == {"1aaa", "2bbb"}
    assert (out["pdb_id"] == "1aaa").sum() == (out["pdb_id"] == "2bbb").sum()


def test_cif_round_trip_matches_pdb(spark, tmp_path):
    """Write the parsed 1iir atoms back out as a minimal mmCIF _atom_site
    loop; parsing the CIF must reproduce the PDB-parsed table exactly."""
    from ifeatureomega_cli_spark.sources.pdb import (parse_cif_text,
                                                     read_pdb)

    atoms = read_pdb(spark, REF_PDB).toPandas()
    lines = ["data_1iir", "#", "loop_"]
    tags = ["group_PDB", "id", "type_symbol", "label_atom_id",
            "label_alt_id", "label_comp_id", "auth_asym_id", "auth_seq_id",
            "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z",
            "occupancy", "B_iso_or_equiv", "pdbx_PDB_model_num"]
    lines += [f"_atom_site.{t}" for t in tags]
    for _, r in atoms.iterrows():
        atom_name = (f'"{r["atom_name"]}"' if "'" in r["atom_name"]
                     else r["atom_name"])
        lines.append(" ".join(map(str, [
            r["record"], r["serial"], r["element"] or "?", atom_name,
            r["altloc"] or ".", r["resname"], r["chain"], r["resseq"],
            r["icode"] or ".", r["x"], r["y"], r["z"], r["occupancy"],
            r["bfactor"], 1])))
    lines.append("#")
    cif = parse_cif_text("\n".join(lines), "1iir")
    assert len(cif) == len(atoms)
    for col in ("serial", "atom_name", "resname", "chain", "resseq",
                "element", "hetflag", "record"):
        assert (cif[col].to_numpy() == atoms[col].to_numpy()).all(), col
    assert np.allclose(cif[["x", "y", "z"]], atoms[["x", "y", "z"]])
    # facade accepts a .cif path directly
    from ifeatureomega_cli_spark.api import StructureDataset
    p = tmp_path / "1iir.cif"
    p.write_text("\n".join(lines))
    st = StructureDataset(spark, str(p))
    assert st.get_descriptor("AAC_type1").count() > 100


def test_cif_malformed_row_skipped_not_truncated(spark):
    """A malformed _atom_site data row mid-loop must be skipped, not end
    the parse (the round-3 review caught a `break` silently truncating the
    structure)."""
    from ifeatureomega_cli_spark.sources.pdb import parse_cif_text

    tags = ["group_PDB", "id", "type_symbol", "label_atom_id",
            "label_alt_id", "label_comp_id", "auth_asym_id", "auth_seq_id",
            "pdbx_PDB_ins_code", "Cartn_x", "Cartn_y", "Cartn_z",
            "occupancy", "B_iso_or_equiv", "pdbx_PDB_model_num"]
    lines = ["data_test", "loop_"] + [f"_atom_site.{t}" for t in tags]
    row = "ATOM {i} C CA . ALA A {i} . 1.0 2.0 3.0 1.0 0.0 1"
    lines.append(row.format(i=1))
    lines.append("ATOM 2 C CA . ALA A 2 .")  # truncated/wrapped row
    lines.append(row.format(i=3))
    lines.append("#")
    out = parse_cif_text("\n".join(lines), "test")
    assert out["serial"].tolist() == [1, 3]
    # a new section tag still terminates the loop
    lines2 = lines[:-2] + ["_cell.length_a 10.0", row.format(i=9)]
    out2 = parse_cif_text("\n".join(lines2), "test")
    assert out2["serial"].tolist() == [1]


def test_insertion_code_residues_sources_not_targets(spark):
    """Residues 100 and 100A: 100A counts as a distance source / graph
    node / HSE sphere neighbour but never emits its own output row (the
    reference's model[chain][resseq] int-key lookup skips it), and never
    aliases 100's backbone-neighbour lookup."""
    from ifeatureomega_cli_spark.operators.structure import (
        hse, network_metrics, residue_shell_composition)
    from ifeatureomega_cli_spark.sources.pdb import residue_table

    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    mk = lambda serial, resseq, icode, x, y=0.0: (  # noqa: E731
        "t", "ATOM", serial, "CA", "", "ALA", "A", resseq, icode,
        x, y, 0.0, 1.0, 0.0, "C", " ")
    atoms = spark.createDataFrame([
        mk(1, 99, "", 0.0),
        mk(2, 100, "", 4.0, 1.0),  # bent so the pseudo-CB is defined
        mk(3, 100, "A", 4.5),      # insertion-code residue
        mk(4, 101, "", 8.0),
    ], cols)
    res = residue_table(atoms)
    assert res.count() == 4  # all four are rows (sources)

    shell = residue_shell_composition(res, "AAC").toPandas()
    assert len(shell) == 3  # 100A emits no target row
    assert set(shell["sample"]) == {"A_ALA_99", "A_ALA_100", "A_ALA_101"}
    # 100A IS counted as a source: residue 99 sees ALA at 4.0 AND 4.5 in
    # shell [3,5) → freq A = 1.0 with 2 rows in shell; verify via type2
    # cumulative count at last shell = 4 residues → A fraction 1.0
    t2 = (residue_shell_composition(res, "AAC", type2=True).toPandas()
          .set_index("sample"))
    assert t2.loc["A_ALA_99"]["features"][-20] == 1.0  # shell9, A

    net = network_metrics(res, cutoff=11.0).toPandas()
    assert len(net) == 3
    # node degrees include edges to 100A: residue 99 connects to 100,
    # 100A, 101 → degree 3 (n=4 nodes)
    assert net.set_index("resseq").loc[99, "degree"] == 3

    out = hse(atoms, kind="CA").toPandas().set_index("resseq")
    assert list(out.index) == [100]  # only 100 has both main neighbors
    # 100A at 0.5 Å is inside the 12 Å sphere → 3 neighbors counted
    assert out.loc[100, "hse_up"] + out.loc[100, "hse_down"] == 3


def test_structure_dataset_ent_file_and_missing(spark, tmp_path):
    """A single .ent file (classic PDB archive extension) parses via the
    fixed-width path instead of being silently filtered to zero rows."""
    import shutil

    from ifeatureomega_cli_spark.api import StructureDataset

    p = tmp_path / "pdb1iir.ent"
    shutil.copy(REF_PDB, p)
    st = StructureDataset(spark, str(p))
    assert st.get_descriptor("AAC_type1").count() > 100


def test_aaindex_na_accession_raises(spark):
    """Selecting an AAindex accession with NA cells raises (the reference
    fails on them too) instead of emitting silent NaNs."""
    from ifeatureomega_cli_spark.functions.registry import DESCRIPTORS

    spec = DESCRIPTORS["protein:AAIndex"]
    with pytest.raises(ValueError, match="AVBF000101"):
        spec.kernel({"aaindex": "ANDN920101;AVBF000101"}, 31)


def test_shell_composition_chunked_equivalence(spark):
    """Target chunking must be value-identical to the single-matrix path
    (memory guard for huge structures: a 50k-atom capsid would need ~20 GB
    unchunked).  The chunk size is threaded into the worker closure as an
    explicit parameter — a module-global monkeypatch would never reach the
    executor processes (the vacuous-guard lesson from this round)."""
    from ifeatureomega_cli_spark.operators.structure import (
        residue_shell_composition)
    from ifeatureomega_cli_spark.sources.pdb import read_pdb, residue_table

    res = residue_table(read_pdb(spark, REF_PDB)).cache()
    one = (residue_shell_composition(res, "AAC").toPandas()
           .set_index("sample").sort_index())
    tiled = (residue_shell_composition(res, "AAC", target_chunk=37)
             .toPandas().set_index("sample").sort_index())
    assert list(one.index) == list(tiled.index)
    A = np.stack(one["features"].to_numpy())
    B = np.stack(tiled["features"].to_numpy())
    assert np.array_equal(A, B)


def test_hse_null_icode_not_dropped(spark):
    """User-supplied atoms with NULL icode (the schema allows it; the
    bundled readers always emit '') must behave exactly like icode='' —
    pandas groupby/merge silently drop NaN keys unless normalized."""
    from ifeatureomega_cli_spark.operators.structure import hse

    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    mk = lambda serial, name, resseq, x, y, z: (  # noqa: E731
        "t", "ATOM", serial, name, "", "ALA", "A", resseq, None, x, y, z,
        1.0, 0.0, name[0], " ")
    atoms = spark.createDataFrame([
        mk(1, "CA", 1, 0.0, 0.0, 0.0),
        mk(2, "CA", 2, 4.0, 1.0, 0.0),
        mk(3, "CA", 3, 8.0, 0.0, 0.0),
        mk(4, "CB", 2, 4.0, 2.0, 0.0),
    ], cols)
    out = hse(atoms, kind="CA").toPandas().set_index("resseq")
    assert list(out.index) == [2]
    assert out.loc[2, "hse_up"] == 0 and out.loc[2, "hse_down"] == 2


def test_hse_vectorized_matches_loop_reference(spark):
    """The chunked vectorized kernel must equal a straightforward
    per-residue loop (the round-3 implementation's semantics) bit-for-bit
    on a 600-residue random-walk chain, across both variants and a chunk
    size that forces multiple batches."""
    from ifeatureomega_cli_spark.operators import structure as S
    from ifeatureomega_cli_spark.operators.structure import hse

    rng = np.random.default_rng(7)
    steps = rng.normal(size=(600, 3))
    steps = 3.8 * steps / np.linalg.norm(steps, axis=1, keepdims=True)
    ca = np.cumsum(steps, axis=0)
    cb_off = rng.normal(size=(600, 3))
    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    rows = []
    for i in range(600):
        rows.append(("t", "ATOM", 2 * i, "CA", "", "ALA", "A", i, "",
                     float(ca[i, 0]), float(ca[i, 1]), float(ca[i, 2]),
                     1.0, 0.0, "C", " "))
        if i % 7:  # some GLY-like residues without CB
            rows.append(("t", "ATOM", 2 * i + 1, "CB", "", "ALA", "A", i,
                         "", float(ca[i, 0] + cb_off[i, 0]),
                         float(ca[i, 1] + cb_off[i, 1]),
                         float(ca[i, 2] + cb_off[i, 2]), 1.0, 0.0, "C", " "))
    atoms = spark.createDataFrame(rows, cols)

    cbpos = ca + cb_off

    def loop_ref(kind):
        out = {}
        for i in range(600):
            v = cbpos[i] - ca[i]
            d1 = ca[i - 1] - ca[i] if i > 0 else None
            d2 = ca[i + 1] - ca[i] if i < 599 else None
            b = None
            if d1 is not None and d2 is not None:
                n1 = np.sqrt(d1[0] * d1[0] + d1[1] * d1[1] + d1[2] * d1[2])
                n2 = np.sqrt(d2[0] * d2[0] + d2[1] * d2[1] + d2[2] * d2[2])
                b = np.array([-(d1[0] / n1 + d2[0] / n2),
                              -(d1[1] / n1 + d2[1] / n2),
                              -(d1[2] / n1 + d2[2] / n2)])
                if not np.sqrt(b[0] * b[0] + b[1] * b[1]
                               + b[2] * b[2]) > 0:
                    b = None
            has_cb = bool(i % 7)
            if kind == "CA":
                if b is None:
                    continue
                u = b
                if has_cb:
                    nb = np.sqrt(b[0] * b[0] + b[1] * b[1] + b[2] * b[2])
                    cosang = ((b[0] / nb) * v[0] + (b[1] / nb) * v[1]
                              + (b[2] / nb) * v[2]) / (
                        np.sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2])
                        + 1e-300)
                    angle = float(np.arccos(np.clip(cosang, -1, 1)))
                else:
                    angle = float("nan")
            else:
                if has_cb:
                    u = v
                elif b is not None:
                    u = b
                else:
                    continue
                angle = 0.0
            d = ca - ca[i]
            dist = np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2 + d[:, 2] ** 2)
            near = (dist <= 12.0) & (dist > 0)
            dots = (d[near, 0] * u[0] + d[near, 1] * u[1]
                    + d[near, 2] * u[2])
            out[i] = (int((dots > 0).sum()),
                      int(near.sum() - (dots > 0).sum()), angle)
        return out

    for kind in ("CA", "CB"):
        got = (hse(atoms, kind=kind).toPandas()
               .set_index("resseq").sort_index())
        want = loop_ref(kind)
        assert set(got.index) == set(want)
        for i in got.index:
            u, dn, ang = want[i]
            assert got.loc[i, "hse_up"] == u, (kind, i)
            assert got.loc[i, "hse_down"] == dn, (kind, i)
            ga = got.loc[i, "angle"]
            assert (np.isnan(ga) and np.isnan(ang)) or ga == ang, (kind, i)
    # multi-chunk path: identical output with a tiny chunk size
    old = S.TARGET_CHUNK
    try:
        S.TARGET_CHUNK = 64
        got2 = (hse(atoms, kind="CA").toPandas()
                .set_index("resseq").sort_index())
    finally:
        S.TARGET_CHUNK = old
    got1 = hse(atoms, kind="CA").toPandas().set_index("resseq").sort_index()
    pd.testing.assert_frame_equal(got1, got2)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                "/root/testdata/sf0.01"])
def test_hse_oracle_margin(sf):
    """Guard the driver oracle's float boundaries at BOTH the test SF and
    the driver's correctness-gate SF (0.01): every half-sphere plane dot
    and every 12 Å distance test must clear zero/the-cutoff by far more
    than accumulated ulp error, so the Spark kernel and the DuckDB oracle
    can never disagree on a boundary regardless of evaluation order."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    df = con.execute(
        "SELECT vec_id, embedding[1]::DOUBLE*40 x, embedding[2]::DOUBLE*40 y,"
        " embedding[3]::DOUBLE*40 z FROM embeddings ORDER BY vec_id").df()
    X = df[["x", "y", "z"]].to_numpy()
    n = len(X)
    d1 = X[:-2] - X[1:-1]
    d2 = X[2:] - X[1:-1]
    b = -(d1 / np.linalg.norm(d1, axis=1, keepdims=True)
          + d2 / np.linalg.norm(d2, axis=1, keepdims=True))
    min_dot, min_dist = np.inf, np.inf
    for k, i in enumerate(range(1, n - 1)):
        d = X - X[i]
        dist = np.sqrt((d * d).sum(1))
        near = (dist <= 12.0) & (dist > 0)
        min_dist = min(min_dist, np.abs(dist[dist > 0] - 12.0).min())
        if near.any():
            min_dot = min(min_dot, np.abs(d[near] @ b[k]).min())
    assert min_dot > 1e-7, min_dot
    assert min_dist > 1e-7, min_dist


def test_altloc_drop_stats(spark, tmp_path):
    """Per-file observability of the altloc policy: 1iir has some non-'A'
    altloc lines; a synthetic file with a B conformer counts exactly 1."""
    from ifeatureomega_cli_spark.sources.pdb import (
        altloc_drop_stats, read_pdb)
    import shutil

    d = tmp_path / "pdbs"
    d.mkdir()
    shutil.copy(REF_PDB, d / "1iir.pdb")
    # synthetic: one A and one B conformer of the same atom
    atom = ("ATOM      1  CA {alt}ALA A   1      11.000  22.000  33.000"
            "  0.50 10.00           C  \n")
    (d / "2syn.pdb").write_text(atom.format(alt="A") + atom.format(alt="B"))
    with open(REF_PDB) as f:
        n_expected = sum(1 for line in f
                         if line[0:6] in ("ATOM  ", "HETATM")
                         and len(line) > 16 and line[16] not in (" ", "A"))
    out = (altloc_drop_stats(spark, str(d)).toPandas()
           .set_index("pdb_id")["n_altloc_dropped"])
    assert out["2syn"] == 1
    assert out["1iir"] == n_expected
    # and the reader really dropped them: only the A conformer survives
    pdf = read_pdb(spark, str(d / "2syn.pdb")).toPandas()
    assert len(pdf) == 1 and pdf["altloc"].iloc[0] == "A"


def test_ss_shell_composition_hand_computed(spark):
    """Residues on the x-axis at 0, 4, 8, 16 with DSSP letters -, H, B, T.
    Target at x=0: shell_1 [3,5) = {H at 4}, shell_3 [7,9) = {B at 8},
    shell_7 [15,17) = {T at 16}.  SS8 type1 puts 1.0 in exactly those
    (shell, letter) slots.  SS3 collapses H→H, B→E, T→C — and the
    reference's 8-letter tally dict (:9529) has no 'C' key, so the T shell
    contributes DENOMINATOR only: its fractions are all zero."""
    from ifeatureomega_cli_spark.operators.structure import (
        residue_shell_composition, shell_feature_names)

    rows = [("A", 1, "GLY", "G", 0.0, 0.0, 0.0, "-"),
            ("A", 2, "ALA", "A", 4.0, 0.0, 0.0, "H"),
            ("A", 3, "LEU", "L", 8.0, 0.0, 0.0, "B"),
            ("A", 4, "PHE", "F", 16.0, 0.0, 0.0, "T")]
    df = spark.createDataFrame(
        [("test",) + r for r in rows],
        "pdb_id string, chain string, resseq long, resname string, "
        "aa string, x double, y double, z double, ss string")
    names8 = shell_feature_names("SS8", (3, 20, 2))
    out8 = (residue_shell_composition(df, "SS8", ss_col="ss").toPandas()
            .set_index("sample"))
    f8 = dict(zip(names8, out8.loc["A_GLY_1"]["features"]))
    assert f8["shell_1.H"] == 1.0
    assert f8["shell_3.B"] == 1.0
    assert f8["shell_7.T"] == 1.0
    assert {k for k, v in f8.items() if v} == {
        "shell_1.H", "shell_3.B", "shell_7.T"}
    # SS3: H→H slot, B→E slot, T→C → no slot (denominator-only)
    out3 = (residue_shell_composition(df, "SS3", ss_col="ss").toPandas()
            .set_index("sample"))
    f3 = dict(zip(names8, out3.loc["A_GLY_1"]["features"]))
    assert f3["shell_1.H"] == 1.0
    assert f3["shell_3.E"] == 1.0
    assert {k for k, v in f3.items() if v} == {"shell_1.H", "shell_3.E"}
    # shell_7 has one (T) resident but zero in every slot — quirk pinned
    assert all(f3[f"shell_7.{s}"] == 0.0
               for s in ["H", "B", "E", "G", "I", "T", "S", "-"])
    # type2 cumulative: target itself ('-') counts from shell 1 → SS8
    # shell_1 splits 1/2 '-' + 1/2 H
    out8c = (residue_shell_composition(df, "SS8", type2=True, ss_col="ss")
             .toPandas().set_index("sample"))
    f8c = dict(zip(names8, out8c.loc["A_GLY_1"]["features"]))
    assert f8c["shell_1.H"] == 0.5 and f8c["shell_1.-"] == 0.5
    # SS3 type2 last shell: 4 residents {-,H,B,T} → H 1/4 (H), E 1/4 (B),
    # '-'→C and T→C denominator-only
    out3c = (residue_shell_composition(df, "SS3", type2=True, ss_col="ss")
             .toPandas().set_index("sample"))
    f3c = dict(zip(names8, out3c.loc["A_GLY_1"]["features"]))
    assert f3c["shell_9.H"] == 0.25 and f3c["shell_9.E"] == 0.25
    assert sum(f3c[f"shell_9.{s}"]
               for s in ["B", "G", "I", "T", "S", "-"]) == 0.0


def test_ss_facade_and_validation(spark):
    from ifeatureomega_cli_spark import structure_ligand as SL
    from ifeatureomega_cli_spark.operators.structure import (
        residue_shell_composition)

    rows = [("t", "A", 1, "ALA", "A", 0.0, 0.0, 0.0, "H"),
            ("t", "A", 2, "GLY", "G", 4.0, 0.0, 0.0, "E")]
    df = spark.createDataFrame(
        rows, "pdb_id string, chain string, resseq long, resname string, "
        "aa string, x double, y double, z double, ss string")
    out = SL.secondary_structure_descriptor(df, "SS8_type1", ss_col="ss")
    assert out.count() == 2
    with pytest.raises(ValueError):
        residue_shell_composition(df, "SS8")  # ss_col required
    with pytest.raises(KeyError):
        SL.secondary_structure_descriptor(df, "SS5_type1", ss_col="ss")


def test_residue_depth_hand_computed(spark, tmp_path):
    """Surface = 4 points on the z=10 plane; residue 1 has two atoms at
    z=0 and z=2 under a surface point → min dists 10 and 8, mean 9;
    CA (z=0) depth 10.  Residue 2 (no CA) → ca_depth NaN.  HETATM and
    non-AA rows excluded (Bio.PDB is_aa)."""
    from ifeatureomega_cli_spark.operators.structure import residue_depth

    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    mk = lambda serial, name, resseq, x, y, z, res="ALA", het=" ": (  # noqa: E731
        "t", "ATOM", serial, name, "", res, "A", resseq, "", x, y, z,
        1.0, 0.0, name[0], het)
    atoms = spark.createDataFrame([
        mk(1, "CA", 1, 0.0, 0.0, 0.0),
        mk(2, "CB", 1, 0.0, 0.0, 2.0),
        mk(3, "N", 2, 50.0, 0.0, 4.0, res="GLY"),
        mk(4, "O", 3, 0.0, 0.0, 0.0, res="HOH", het="W"),   # water: skip
        mk(5, "CA", 4, 0.0, 0.0, 0.0, res="UNK"),           # non-AA: skip
    ], cols)
    surface = spark.createDataFrame(
        [("t", 0.0, 0.0, 10.0), ("t", 50.0, 0.0, 10.0),
         ("t", 200.0, 200.0, 10.0), ("t", -200.0, 0.0, 10.0)],
        "pdb_id string, x double, y double, z double")
    out = (residue_depth(atoms, surface).toPandas()
           .set_index("resseq").sort_index())
    assert list(out.index) == [1, 2]
    assert out.loc[1, "residue_depth"] == 9.0
    assert out.loc[1, "ca_depth"] == 10.0
    assert out.loc[2, "residue_depth"] == 6.0
    assert np.isnan(out.loc[2, "ca_depth"])
    assert out.loc[1, "sample"] == "A_1"


def test_msms_vert_reader_and_depth_pipeline(spark, tmp_path):
    """.vert text (2 comment + 1 count line, then x y z nx ny nz ...) reads
    distributed; end-to-end depth over 1iir atoms with a synthetic sphere
    surface stays positive and finite for every residue."""
    from ifeatureomega_cli_spark.operators.structure import residue_depth
    from ifeatureomega_cli_spark.sources.pdb import read_msms_vert, read_pdb

    atoms = read_pdb(spark, REF_PDB)
    ca = atoms.toPandas()
    ca = ca[(ca["hetflag"] == " ") & (ca["atom_name"] == "CA")]
    center = ca[["x", "y", "z"]].mean().to_numpy()
    r = 60.0
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3))
    pts = center + r * pts / np.linalg.norm(pts, axis=1, keepdims=True)
    d = tmp_path / "surf"
    d.mkdir()
    lines = ["# MSMS solvent excluded surface", "#", "500 0 0.0 0.0"]
    lines += [f"{p[0]:.3f} {p[1]:.3f} {p[2]:.3f} 0.0 0.0 1.0 0 0 1"
              for p in pts]
    (d / "1iir.vert").write_text("\n".join(lines) + "\n")
    surf = read_msms_vert(spark, str(d))
    sp = surf.toPandas()
    assert len(sp) == 500 and set(sp["pdb_id"]) == {"1iir"}
    out = residue_depth(atoms, surf).toPandas()
    assert len(out) > 100
    assert (out["residue_depth"] > 0).all()
    assert np.isfinite(out["residue_depth"]).all()
    # every CA depth ≤ 2×radius and ≥ (r − max dist from center)
    assert (out["ca_depth"].dropna() < 2 * r).all()


def test_residue_depth_facade(spark):
    from ifeatureomega_cli_spark import structure_ligand as SL

    with pytest.raises(NotImplementedError):
        SL.residue_depth(None)


def test_structure_facade_ss_and_depth_attach(spark):
    """StructureDataset completes the 14-type surface once precomputed
    DSSP letters / MSMS vertices are attached; without them the honest
    NotImplementedError (with the binary citation) still fires."""
    from pyspark.sql import functions as F

    from ifeatureomega_cli_spark.api import StructureDataset
    from ifeatureomega_cli_spark.sources.pdb import read_pdb

    atoms = read_pdb(spark, REF_PDB)
    st = StructureDataset(spark, atoms)
    with pytest.raises(NotImplementedError):
        st.get_descriptor("SS8_type1")
    with pytest.raises(NotImplementedError):
        st.get_descriptor("Residue depth")
    # synthetic letters: every residue helix
    res = (atoms.filter("hetflag = ' ' AND atom_name = 'CA'")
           .select("pdb_id", "chain", "resseq").distinct()
           .withColumn("ss", F.lit("H")))
    out = st.attach_secondary_structure(res).get_descriptor("SS8_type1")
    pdf = out.toPandas()
    assert len(pdf) > 100
    feats = np.stack(pdf["features"].to_numpy()).reshape(len(pdf), 9, 8)
    # all-H letters → occupied shells put everything in the H slot
    occupied = feats.sum(axis=2) > 0
    assert np.allclose(feats[:, :, 0][occupied], 1.0)
    assert st.feature_names("SS8_type1")[0] == "shell_1.H"
    # surface attach → depth computes
    ca = atoms.toPandas()
    ca = ca[(ca["hetflag"] == " ") & (ca["atom_name"] == "CA")]
    center = ca[["x", "y", "z"]].mean()
    surf = spark.createDataFrame(
        [("1iir", float(center["x"]) + 60.0, float(center["y"]),
          float(center["z"]))],
        "pdb_id string, x double, y double, z double")
    dep = st.attach_surface(surf).get_descriptor("Residue depth").toPandas()
    assert len(dep) > 100 and (dep["residue_depth"] > 0).all()
    assert st.feature_names("Residue depth") == ["Residue_depth", "CA_depth"]


def test_ss_shells_match_bruteforce_random(spark):
    """Randomized cross-check: SS8/SS3 type1/2 shell fractions equal a
    per-residue brute-force loop on 120 random residues with random
    letters (covers AABB pruning + chunking + the SS3 collapse quirk)."""
    from ifeatureomega_cli_spark.operators import structure as S
    from ifeatureomega_cli_spark.operators.structure import (
        AA_HEC, SS8_STATES, residue_shell_composition)

    rng = np.random.default_rng(11)
    n = 120
    X = rng.uniform(-15, 15, size=(n, 3))
    letters = [SS8_STATES[i] for i in rng.integers(0, 8, n)]
    rows = [("t", "A", i, "ALA", "A",
             float(X[i, 0]), float(X[i, 1]), float(X[i, 2]), letters[i])
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "pdb_id string, chain string, resseq long, resname string, "
        "aa string, x double, y double, z double, ss string")
    starts = list(range(3, 21, 2))
    ss8_idx = {s: i for i, s in enumerate(SS8_STATES)}

    def brute(kind, type2):
        out = np.zeros((n, 9 * 8))
        for i in range(n):
            d = np.sqrt(((X - X[i]) ** 2).sum(1))
            for m, s in enumerate(starts):
                sel = (d < s + 2) if type2 else ((d >= s) & (d < s + 2))
                # self (d=0) is only reachable in type2's cumulative shells,
                # matching the kernel (type1 shells start at 3)
                idxs = np.nonzero(sel)[0]
                cnt = np.zeros(8)
                tot = 0
                for j in idxs:
                    tot += 1
                    let = letters[j] if kind == "SS8" else AA_HEC[letters[j]]
                    if let in ss8_idx:
                        cnt[ss8_idx[let]] += 1
                if tot:
                    out[i, m * 8:(m + 1) * 8] = cnt / tot
        return out

    old = S.TARGET_CHUNK
    try:
        S.TARGET_CHUNK = 32  # force multi-chunk + AABB path
        for kind in ("SS8", "SS3"):
            for type2 in (False, True):
                got = (residue_shell_composition(
                    df, kind, type2=type2, ss_col="ss",
                    target_chunk=32).toPandas()
                    .set_index("resseq").sort_index())
                G = np.stack(got["features"].to_numpy())
                B = brute(kind, type2)
                assert np.allclose(G, B), (kind, type2)
    finally:
        S.TARGET_CHUNK = old


def test_residue_depth_matches_bruteforce_random(spark):
    """Randomized cross-check on multi-atom residues incl. the chunked
    min-distance path and the atom-mean."""
    from ifeatureomega_cli_spark.operators import structure as S
    from ifeatureomega_cli_spark.operators.structure import residue_depth

    rng = np.random.default_rng(13)
    n_res, n_surf = 40, 300
    cols = ("pdb_id string, record string, serial long, atom_name string, "
            "altloc string, resname string, chain string, resseq long, "
            "icode string, x double, y double, z double, occupancy double, "
            "bfactor double, element string, hetflag string")
    atom_rows = []
    coords = {}
    serial = 0
    for i in range(n_res):
        k = int(rng.integers(1, 5))
        pts = rng.uniform(-20, 20, size=(k, 3))
        coords[i] = pts
        for j in range(k):
            name = "CA" if j == 0 and i % 3 else f"C{j}"
            atom_rows.append(("t", "ATOM", serial, name, "", "ALA", "A", i,
                              "", float(pts[j, 0]), float(pts[j, 1]),
                              float(pts[j, 2]), 1.0, 0.0, "C", " "))
            serial += 1
    SURF = rng.uniform(-30, 30, size=(n_surf, 3))
    atoms = spark.createDataFrame(atom_rows, cols)
    surf = spark.createDataFrame(
        [("t", float(p[0]), float(p[1]), float(p[2])) for p in SURF],
        "pdb_id string, x double, y double, z double")
    old = S.TARGET_CHUNK
    try:
        S.TARGET_CHUNK = 16
        out = (residue_depth(atoms, surf).toPandas()
               .set_index("resseq").sort_index())
    finally:
        S.TARGET_CHUNK = old
    assert len(out) == n_res
    for i in range(n_res):
        pts = coords[i]
        mins = np.sqrt(((pts[:, None, :] - SURF[None, :, :]) ** 2)
                       .sum(-1)).min(axis=1)
        assert np.isclose(out.loc[i, "residue_depth"], mins.mean()), i
        if i % 3:  # residues with a CA
            assert np.isclose(out.loc[i, "ca_depth"], mins[0]), i
        else:
            assert np.isnan(out.loc[i, "ca_depth"]), i
