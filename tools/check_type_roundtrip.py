#!/usr/bin/env python3
"""Output-type roundtrip check for the driver-hash emulation (r9).

`graft.TypeFixture` writes one tiny Spark result parquet per output
type class with adversarial values, plus the DuckDB SQL for the same
logical values. This tool pushes each pair through the EXACT compare
the driver gate uses (pandas-read parquet vs duckdb `.df()`,
stringified sorted frames — the same canon as check_driver_hash.py):
a type class whose representations diverge fails HERE, on a fixture,
instead of on a production query. Findings become OutputTypePolicy
rules (docs/driver-gate.md is the authority; DECIMAL and FLOAT are the
two already-fenced classes).

Usage:
  sbt "runMain graft.TypeFixture /tmp/typefix"   # or the java -cp form
  python3 tools/check_type_roundtrip.py /tmp/typefix
Exit 0 iff every case roundtrips identically.
"""
import glob
import json
import sys

import duckdb
import pandas as pd

out_dir = sys.argv[1]
con = duckdb.connect()

with open(f"{out_dir}/oracle_sql.json") as f:
    oracle = json.load(f)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    return s.sort_values(by=list(s.columns), ignore_index=True)


fails = 0
for name, sql in sorted(oracle.items()):
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

sys.exit(1 if fails else 0)
