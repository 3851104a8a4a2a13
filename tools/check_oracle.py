#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each query parquet in outDir, runs the matching oracle SQL in DuckDB
(views named after the tables) and compares: row count, column names,
and exact values after sorting columns by name and rows by all columns.
Stricter than the driver (exact equality, not hash) on purpose.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

# every oracle key must have a Spark output dir — a query that threw in
# Verify writes nothing and must FAIL the gate, not silently vanish
written = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{out_dir}/*/")}
missing = sorted(set(oracle) - written)

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails, passes, rows_only = [(m, "query produced no output (failed in Verify)") for m in missing], [], []
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    try:
        mine = pd.read_parquet(d)
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}"))
        continue
    if name not in oracle:
        rows_only.append((name, len(mine)))
        continue
    try:
        ref = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}"))
        continue
    if sorted(mine.columns) != sorted(ref.columns):
        fails.append((name, f"columns differ: spark={sorted(mine.columns)} duckdb={sorted(ref.columns)}"))
        continue
    if len(mine) != len(ref):
        fails.append((name, f"row count: spark={len(mine)} duckdb={len(ref)}"))
        continue
    a, b = canon(mine), canon(ref)
    # dtype-KIND parity gate (r14): the driver hashes the TYPED result,
    # so an int-vs-float mismatch (e.g. a DuckDB HUGEINT sum leaking
    # into the oracle's final SELECT where Spark emits BIGINT) is a red
    # even when every value is numerically equal. This tool acquitted
    # exactly that class for three rounds by coercing before comparing —
    # fail on kind mismatch FIRST so the class can never hide again.
    KIND = {"i": "int", "u": "int", "b": "bool", "f": "float",
            "O": "obj", "M": "dt", "m": "td", "c": "cplx"}
    kind_bad = []
    for c in a.columns:
        ka, kb = KIND.get(a[c].dtype.kind, a[c].dtype.kind), \
                 KIND.get(b[c].dtype.kind, b[c].dtype.kind)
        # pandas renders an all-null / nullable int parquet column as
        # float64 on EITHER side; only flag when the underlying values
        # disagree in kind too (an int col with nulls floats on both
        # sides at once, so a one-sided float is a genuine type leak)
        if ka != kb:
            kind_bad.append(f"{c}: spark dtype={a[c].dtype}({ka}) "
                            f"duckdb dtype={b[c].dtype}({kb})")
    if kind_bad:
        fails.append((name, "dtype-kind mismatch: " + "; ".join(kind_bad[:4])))
        continue
    neq = []
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            bad = ~((pd.isna(av) & pd.isna(bv)) | (av == bv))
        else:
            bad = ~(a[c].fillna("<NA>") == b[c].fillna("<NA>")).values
        if bad.any():
            i = int(np.argmax(bad))
            neq.append(f"{c}[{i}]: spark={a[c].iloc[i]!r} duckdb={b[c].iloc[i]!r} dtypes={a[c].dtype}/{b[c].dtype} nbad={int(bad.sum())}")
    if neq:
        fails.append((name, "; ".join(neq[:3])))
    else:
        passes.append((name, len(mine)))

print(f"PASS {len(passes)}: " + ", ".join(f"{n}({r})" for n, r in passes))
print(f"ROWS-ONLY {len(rows_only)}: " + ", ".join(f"{n}({r})" for n, r in rows_only))
if fails:
    print(f"FAIL {len(fails)}:")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
print("ALL GREEN")
