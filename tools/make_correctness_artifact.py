#!/usr/bin/env python3
"""Produce a driver-format correctness artifact (rows/schema/hash per
query) from a Verify output dir, using the emulated driver procedure
(docs/driver-gate.md): Spark parquet via pandas, oracle via duckdb
.df(), stringified sorted-frame compare.

Usage: python3 tools/make_correctness_artifact.py <sfDir> <verifyOutDir> <outJson>
"""
import glob
import json
import pathlib
import sys

import duckdb
import pandas as pd

sf_dir, out_dir, out_json = sys.argv[1], sys.argv[2], sys.argv[3]

con = duckdb.connect()
for t in pathlib.Path(__file__).with_name("tables.txt").read_text().split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

with open(f"{out_dir}/oracle_sql.json") as f:
    oracle = json.load(f)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    s = df.astype(str)
    return s.sort_values(by=list(s.columns), ignore_index=True)


result = {}
for name, sql in sorted(oracle.items()):
    entry = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None}
    try:
        ora_raw = con.sql(sql).df()
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        spk_raw = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
        entry["spark_rows"] = int(len(spk_raw))
        entry["oracle_rows"] = int(len(ora_raw))
        entry["rows_match"] = len(spk_raw) == len(ora_raw)
        entry["schema_match"] = sorted(spk_raw.columns) == sorted(ora_raw.columns)
        spk, ora = canon(spk_raw), canon(ora_raw)
        entry["hash_match"] = (spk.shape == ora.shape
                               and bool((spk.values == ora.values).all()))
    except Exception as e:  # noqa: BLE001
        entry["err"] = f"{type(e).__name__}: {str(e)[:200]}"
    result[name] = entry

with open(out_json, "w") as f:
    json.dump(result, f, indent=2)
    f.write("\n")
ok = sum(1 for v in result.values()
         if v["rows_match"] and v["schema_match"] and v["hash_match"]
         and not v["err"])
print(f"{ok}/{len(result)} fully green -> {out_json}")
sys.exit(0 if ok == len(result) else 1)
