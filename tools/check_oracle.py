#!/usr/bin/env python3
"""Dev-only driver mimic: compare Verify output parquet against DuckDB
oracle SQL (exact value equality, columns sorted by name, rows sorted).
Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import pathlib
import sys

import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
# Table list is shared with the engine (graft.Tables.all) via
# tools/tables.txt — single source, parity asserted by TablesContractSpec.
tables_txt = pathlib.Path(__file__).with_name("tables.txt")
for t in tables_txt.read_text().split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracle = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        exp = canon(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: load error: {e}")
        fails += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    # exact-equality compare, mimicking a value hash
    try:
        eq = got.compare(exp.astype(got.dtypes.to_dict()))
        bad = len(eq)
    except Exception as e:
        print(f"FAIL {name}: dtype mismatch {got.dtypes.to_dict()} vs "
              f"{exp.dtypes.to_dict()}: {e}")
        fails += 1
        continue
    if bad:
        print(f"FAIL {name}: {bad} differing rows\n{eq.head(5)}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")

sys.exit(1 if fails else 0)
