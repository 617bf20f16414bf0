#!/usr/bin/env python3
"""Dev-only STRICT oracle SCHEMA compare: Arrow-level column types
only — values are check_oracle.py's job; run both. Catches what that
script's pandas coercion masks — e.g. Spark row_number() INT32 vs
DuckDB BIGINT (the r5 q203 driver red). Reads one part-file per query
(Verify coalesces to one part; types are identical across parts
anyway). Usage:
  python3 tools/check_arrow_types.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import pathlib
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

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


def norm(t: pa.DataType) -> str:
    """Canonical type label; timezone naming, large_string vs string,
    and timestamp unit (Spark's INT96 reads as ns, DuckDB emits us —
    values are identical, see GraftSession's outputTimestampType note)
    are reader artifacts, not engine output differences."""
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    return str(t)


fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        print(f"FAIL {name}: no verify output")
        fails += 1
        continue
    try:
        got = pq.read_table(files[0])
        exp = con.sql(sql).arrow()
    except Exception as e:
        print(f"FAIL {name}: load error: {e}")
        fails += 1
        continue
    gs = {f.name: norm(f.type) for f in got.schema}
    es = {f.name: norm(f.type) for f in exp.schema}
    # Null-in-fragile-type guard (r9, from the TypeFixture roundtrip:
    # tools/check_type_roundtrip.py): a NULL in a BOOL / DATE / LIST /
    # STRUCT output column stringifies differently between the
    # pandas-read Spark parquet ('None') and the duckdb .df() oracle
    # ('nan' / 'NaT') — and a null anywhere in a struct's integer
    # field floats the WHOLE field on the pandas side only. These
    # columns are fine while null-free (18 gate queries emit them);
    # the first data-dependent null would red the driver gate, so it
    # reds HERE first with a rule pointer (docs/driver-gate.md).
    nulls = []
    for f in got.schema:
        if (pa.types.is_boolean(f.type) or pa.types.is_date(f.type)
                or pa.types.is_list(f.type) or pa.types.is_large_list(f.type)
                or pa.types.is_struct(f.type)):
            if any(pq.read_table(fl, columns=[f.name])[f.name].null_count > 0
                   for fl in files):
                nulls.append(f.name)
    if gs != es:
        diff = {k: (gs.get(k), es.get(k))
                for k in sorted(set(gs) | set(es)) if gs.get(k) != es.get(k)}
        print(f"TYPE {name}: spark vs oracle {diff}")
        fails += 1
    elif nulls:
        print(f"NULL {name}: null in fragile-typed column(s) {nulls} — "
              "coalesce before the final projection (docs/driver-gate.md)")
        fails += 1
    else:
        print(f"ok   {name}")

sys.exit(1 if fails else 0)
