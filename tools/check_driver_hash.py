#!/usr/bin/env python3
"""Exact emulation of the driver's hash gate (reverse-engineered, r7).

The driver reads the Spark result parquet via pandas/pyarrow but runs
the DuckDB oracle via .df(), then compares STRINGIFIED sorted frames —
a representation asymmetry (Decimal keeps scale, float64 drops
trailing zeros; float32 repr differs from float64) that can red a
numerically identical result. Full forensics, the reproduction that
isolated it, and the resulting repo-wide output-type contract live in
docs/driver-gate.md (the single authority); OutputTypePolicySpec
enforces the contract, and THIS script is the local gate that matches
what the driver actually does.

Usage: python3 tools/check_driver_hash.py <sfDir> <verifyOutDir> [query ...]
Exit 0 iff every checked query matches under the emulated procedure.
"""
import glob
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
    # Column order, then STRINGIFY (the driver-procedure step that
    # makes Decimal-vs-float64 representation visible), then row sort.
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    return s.sort_values(by=list(s.columns), ignore_index=True)


fails = 0
checked = 0
unknown = only - set(oracle)
if unknown:
    # a misspelled filter name must not silently produce a green run
    print(f"FAIL unknown query name(s) in filter: {sorted(unknown)}")
    fails += 1
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    checked += 1
    try:
        ora = canon(con.sql(sql).df())
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        spk = canon(pd.concat([pd.read_parquet(f) for f in files],
                              ignore_index=True))
        if spk.shape != ora.shape:
            print(f"FAIL {name}: shape {spk.shape} vs {ora.shape}")
            fails += 1
        elif not (spk.values == ora.values).all():
            bad = (spk.values != ora.values)
            r, c = next(zip(*bad.nonzero()))
            print(f"FAIL {name}: first diff row {r} col {spk.columns[c]}: "
                  f"spark={spk.iat[r, c]!r} oracle={ora.iat[r, c]!r}")
            fails += 1
        else:
            print(f"ok   {name}")
    except Exception as e:  # noqa: BLE001 — report, keep checking
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        fails += 1

if checked == 0:
    print("FAIL no queries checked")
    fails += 1
sys.exit(1 if fails else 0)
