#!/usr/bin/env python3
"""All-oracle output-type sweep (r14, part of the closing recipe).

Usage: python3 tools/oracle_type_sweep.py <sfDir> <verifyOutDir>

Runs every oracle in <verifyOutDir>/oracle_sql.json with LIMIT 0 in
DuckDB (views over the sf parquet tables) and prints each column's
DuckDB type. Flags any column whose type is one Spark cannot emit
(HUGEINT / UHUGEINT / UBIGINT / interval) — the class that kept
c36b/t17b hash-red for four rounds: DuckDB sum() over integers returns
HUGEINT, and an uncast sum leaking into an oracle's final SELECT
hash-mismatches the driver's typed compare even when every value is
numerically equal to Spark's BIGINT.

Exit 1 if any flagged column exists. Run this after Verify, before the
closing commit, alongside tools/check_oracle.py (which now also fails
on dtype-kind mismatch — this sweep localizes the offending column and
type without needing the Spark outputs).
"""
import sys, json
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
BAD = {"HUGEINT", "UHUGEINT", "UBIGINT"}
flagged, errors = [], []
for name, sql in sorted(oracle.items()):
    try:
        rel = con.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    except Exception as e:
        errors.append((name, str(e).splitlines()[0]))
        continue
    for col, typ in zip(rel.columns, [str(t) for t in rel.types]):
        if typ.upper() in BAD or typ.upper().startswith("INTERVAL"):
            flagged.append((name, col, typ))

print(f"swept {len(oracle)} oracles")
if errors:
    print(f"ORACLE ERRORS {len(errors)}:")
    for n, e in errors:
        print(f"  {n}: {e}")
if flagged:
    print(f"FLAGGED {len(flagged)} (types Spark cannot emit):")
    for n, c, t in flagged:
        print(f"  {n}.{c}: {t}")
    sys.exit(1)
if errors:
    sys.exit(1)
print("ALL TYPES CLEAN")
