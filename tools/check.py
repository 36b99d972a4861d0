#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, loads the corresponding Spark dump from
<verifyOutDir>/<name>/, and compares: column names (sorted), dtypes
(normalized), and exact cell values (floats compared bit-exact, like a hash
would). Exit code = number of failing queries.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np
import datetime
from decimal import Decimal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame):
    """Canonical: sorted column order, rows as sorted tuples of
    canonicalized values."""
    cols = sorted(df.columns)
    out_rows = []
    for row in df[cols].itertuples(index=False, name=None):
        out_rows.append(tuple(canon_val(v) for v in row))
    return cols, sorted(out_rows, key=lambda r: tuple(str(x) for x in r))


def canon_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return ("f", np.float64(v).tobytes().hex())
    if isinstance(v, (np.floating,)):
        return ("f", np.float64(v).tobytes().hex())
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if pd.isna(v):
            return "NULL"
        return ("t", pd.Timestamp(v).isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    if isinstance(v, (list, np.ndarray)):
        return ("a", tuple(canon_val(x) for x in v))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return ("s", str(v))


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark dump at {outdir}/{name}")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        ec, er = canon(exp)
        gc, gr = canon(got)
        if ec != gc:
            print(f"FAIL {name}: columns differ: oracle={ec} spark={gc}")
            failures += 1
            continue
        if len(er) != len(gr):
            print(f"FAIL {name}: row count differs: oracle={len(er)} spark={len(gr)}")
            failures += 1
            continue
        bad = [(a, b) for a, b in zip(er, gr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(er)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
            failures += 1
            continue
        print(f"PASS {name}: {len(er)} rows")
    print(f"== {len(oracle) - failures}/{len(oracle)} queries pass ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
