#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare graft.Verify
parquet dumps against the DuckDB oracles in oracle_sql.json.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    import datetime
    import decimal

    import numpy as np

    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, np.ndarray)):
        return tuple(_norm(x) for x in v)
    return v


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").map(lambda v: v.isoformat())
        elif df[c].dtype == object:
            df[c] = df[c].map(_norm)
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
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        want = canon(con.execute(sql).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            fails += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            fails += 1
            continue
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
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"rows {name}: {n}")
    print("FAILURES:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
