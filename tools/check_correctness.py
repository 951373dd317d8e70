#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry from __spark_entry__ and its DuckDB
``oracle_sql()`` twin over the same parquet tables, comparing row count,
column names, and (order-insensitively) exact values.  Queries without an
oracle get a rows-only smoke check, mirroring the driver's weaker path.

Usage: python tools/check_correctness.py [--sf DIR] [-q NAME ...] [-v]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventstreamd_spark.session import TABLES, get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.reindex(sorted(df.columns), axis=1)
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            if getattr(out[c].dtype, "tz", None) is not None:
                out[c] = out[c].dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(out[c]):
            out[c] = out[c].astype("int64")
        elif out[c].dtype == object:
            out[c] = out[c].astype(str)
    if len(out):
        out = out.sort_values(by=list(out.columns), kind="mergesort")
    return out.reset_index(drop=True)


def compare(name: str, spark_df, sql: str | None, con, verbose: bool) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if sql is None:
        return len(sp) >= 0, f"rows-only: {len(sp)} rows"
    du = con.execute(sql).df()
    if sorted(sp.columns) != sorted(du.columns):
        return False, f"schema mismatch: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    if len(sp) != len(du):
        return False, f"rowcount mismatch: spark={len(sp)} duck={len(du)}"
    a, b = canonicalize(sp), canonicalize(du)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as exc:
        msg = str(exc).splitlines()[0]
        if verbose:
            for c in a.columns:
                if not a[c].equals(b[c]):
                    diff = (a[c] != b[c])
                    i = diff.idxmax()
                    msg += f" | col {c}: spark={a[c][i]!r} duck={b[c][i]!r} at {i}"
        return False, f"value mismatch: {msg}"
    return True, f"{len(sp)} rows"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--query", action="append")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    spark = get_spark("check-correctness")
    con = duck_connection(args.sf)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.query or sorted(queries)

    failures = 0
    for name in names:
        t0 = time.time()
        try:
            ok, msg = compare(
                name, queries[name](spark, args.sf), oracles.get(name), con, args.verbose
            )
        except Exception:
            ok, msg = False, "exception:\n" + traceback.format_exc(limit=8)
        status = "OK  " if ok else "FAIL"
        print(f"{status} {name:32s} {time.time()-t0:6.1f}s  {msg}")
        failures += not ok
    print(f"\n{len(names) - failures}/{len(names)} queries passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
