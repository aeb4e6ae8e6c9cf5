"""Rehearse the driver's correctness gate: run every queries() entry on
sf0.001 and compare with the DuckDB oracle (row count, schema arity,
order-insensitive values)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]")  # Spark ns vs DuckDB µs
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_against_oracle(spark, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    assert len(got) >= 0  # materializes
    if name not in ORACLES:
        assert got.shape[1] >= 2  # rows-only contract: stable schema
        return
    con = _duck(SF_DIR)
    exp = con.sql(ORACLES[name]).df()
    assert len(got) == len(exp), f"row count {len(got)} != oracle {len(exp)}"
    assert sorted(map(str.lower, got.columns)) == sorted(map(str.lower, exp.columns)), (
        sorted(got.columns), sorted(exp.columns))
    g, e = _canon(got), _canon(exp)
    e.columns = g.columns
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if np.issubdtype(g[c].dtype, np.floating) or np.issubdtype(e[c].dtype, np.floating):
            gv2 = pd.to_numeric(g[c], errors="coerce").to_numpy(dtype=float)
            ev2 = pd.to_numeric(e[c], errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(gv2) & np.isnan(ev2)
            assert np.all(both_nan | np.isclose(gv2, ev2, rtol=1e-9, atol=1e-9)), (
                f"col {c}: max diff "
                f"{np.nanmax(np.abs(gv2 - ev2))}")
        else:
            assert (gv.astype(str) == ev.astype(str)).all(), f"col {c} mismatch"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert df.schema is not None
