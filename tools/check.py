#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify
parquet dumps against the DuckDB oracles in oracle_sql.json.

STRICT where the driver's hash is strict (round-2 verdict root causes):
  - decimal columns must match in PRECISION AND SCALE (Spark sum(DECIMAL(18,2))
    = DECIMAL(28,2) vs DuckDB DECIMAL(38,2) is a FAIL even with equal values);
  - date32 vs day-precision timestamp is a FAIL (distinct arrow types);
  - timestamp tz-ness must match (NTZ vs UTC-adjusted is a FAIL).
Lenient ONLY on integer width (int32 vs int64): the driver hashes values and
int-width mixes (e.g. Spark size() int32 vs DuckDB len() int64) pass its gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def type_key(t: pa.DataType) -> str:
    """Canonical arrow-type key at the driver's strictness level."""
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_timestamp(t):
        return f"timestamp(tz={t.tz is not None})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return f"list<{type_key(t.value_type)}>"
    return str(t)


def _sortable(v):
    """Make a value usable as a sort key (lists -> tuples); identity otherwise."""
    import numpy as np

    if isinstance(v, (list, np.ndarray, tuple)):
        return tuple(_sortable(x) for x in v)
    return v


def canon(tbl: pa.Table) -> pd.DataFrame:
    """Columns sorted by name, rows sorted by all columns; values untouched
    (Decimal stays Decimal, dates stay dates) so the compare is exact."""
    df = tbl.to_pandas(date_as_object=True)
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(_sortable)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got_t = pa.concat_tables([pq.read_table(f) for f in files])
        want_t = con.execute(sql).arrow()
        got_schema = {f.name: type_key(f.type) for f in got_t.schema}
        want_schema = {f.name: type_key(f.type) for f in want_t.schema}
        if got_schema != want_schema:
            diff = {
                k: (got_schema.get(k), want_schema.get(k))
                for k in sorted(set(got_schema) | set(want_schema))
                if got_schema.get(k) != want_schema.get(k)
            }
            print(f"FAIL {name}: schema {diff}")
            fails += 1
            continue
        if got_t.num_rows != want_t.num_rows:
            print(f"FAIL {name}: rows {got_t.num_rows} != {want_t.num_rows}")
            fails += 1
            continue
        got, want = canon(got_t), canon(want_t)
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            print(f"ok   {name} ({len(got)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'value mismatch'}")
            fails += 1
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(pq.read_table(f).num_rows for f in files) if files else 0
            print(f"rows {name}: {n}")
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
