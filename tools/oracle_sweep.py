"""Driver-style correctness sweep: run every __spark_entry__.queries()
entry at a given SF and value-compare against its oracle_sql() twin —
the same contract the round driver grades (rows, schema, values), run
locally before shipping.

Usage: python tools/oracle_sweep.py [sf_dir]   (default /root/testdata/sf0.01)
Exit 1 on any mismatch.
"""
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[16]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory", "24g").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = E.oracle_sql()
    fails = []
    for name, fn in E.queries().items():
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as ex:
            fails.append((name, f"SPARK ERROR {ex}"))
            print(name, "SPARK ERROR")
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            fails.append((name, f"ORACLE ERROR {ex}"))
            print(name, "ORACLE ERROR", ex)
            continue
        cols = sorted(sdf.columns)
        if sorted(odf.columns) != cols:
            fails.append((name, f"schema {cols} vs {sorted(odf.columns)}"))
            print(name, "SCHEMA MISMATCH")
            continue
        s = sdf[cols].sort_values(cols).reset_index(drop=True)
        o = odf[cols].sort_values(cols).reset_index(drop=True)
        if len(s) != len(o):
            fails.append((name, f"rows {len(s)} vs {len(o)}"))
            print(name, "ROWS MISMATCH", len(s), len(o))
            continue
        bad_col = None
        bad_kind = None
        for c in cols:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            # The round driver hashes the raw column representation, so an
            # int64 12 vs a float64 12.0 reads as a mismatch even when the
            # values agree (round-4 struct_hse red row).  Reproduce that
            # strictness here: the EXACT dtype must match before values do
            # (int32 vs int64 would hash differently too).
            if a.dtype != b.dtype:
                bad_col, bad_kind = c, f"{a.dtype} vs {b.dtype}"
                break
            if a.dtype.kind == "f":  # kinds equal after the dtype gate
                ok = ((a == b) | (pd.isna(a) & pd.isna(b))).all()
            else:
                ok = (pd.Series(a).fillna("<NA>")
                      == pd.Series(b).fillna("<NA>")).all()
            if not ok:
                bad_col = c
                break
        if bad_col is None:
            print(f"{name}: HASH-OK ({len(s)} rows)")
        elif bad_kind is not None:
            fails.append((name, f"dtype differs in {bad_col}: {bad_kind}"))
            print(name, "DTYPE MISMATCH in", bad_col, bad_kind)
        else:
            fails.append((name, f"values differ in {bad_col}"))
            print(name, "VALUE MISMATCH in", bad_col)
    print("\nFAILS:", fails if fails else "none")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
