#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out_dir>/<query>/ parquet written by graft.Verify, runs the
corresponding oracle SQL from <out_dir>/oracle_sql.json in DuckDB against the
parquet tables in <sf_dir>, and diffs (row count, sorted values, dtypes).

Matches the DRIVER's semantics (r12 lesson — the local replica passed where
the driver failed):
  * float compare is BYTE-level: the driver hashes raw bytes, so 0.0 vs -0.0
    is a FAIL here too (plain == would call them equal);
  * rows-only outputs (no oracle SQL) are still loaded and canonicalized —
    the driver sorts EVERY output in pandas, so a top-level array column
    crashes it even without an oracle; we replicate that as a FAIL.
Dev tool only — NOT part of the shipped library.
"""
import glob
import json
import math
import os
import struct
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize timestamp resolutions
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            # byte-level like the driver's hash: 0.0 != -0.0
            return struct.pack("<d", fa) == struct.pack("<d", fb)
    except (TypeError, ValueError):
        pass
    return a == b


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only entries: no oracle SQL, but the driver STILL canonicalizes
    # the parquet (sort on all columns) — replicate so an unsortable output
    # (top-level array column) fails locally before it fails at the gate.
    rows_only = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle)
    for name in rows_only:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output (rows-only)")
            n_fail += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: rows-only output not canonicalizable: {e}")
            n_fail += 1
            continue
        if len(got) == 0:
            # the driver canonicalizes an empty frame fine, but records
            # spark_rows=0 — which fails the rows>0 grading downstream,
            # so flag it here where it's cheap to see
            print(f"FAIL {name}: rows-only output is EMPTY "
                  f"(driver would record spark_rows=0)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, rows-only)")
            n_pass += 1
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        bad = None
        for c in got.columns:
            for i, (x, y) in enumerate(zip(got[c].tolist(), exp[c].tolist())):
                if not cells_equal(x, y):
                    bad = (c, i, x, y)
                    break
            if bad:
                break
        if bad:
            c, i, x, y = bad
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} oracle={y!r}")
            n_fail += 1
        else:
            dt = "" if list(map(str, got.dtypes)) == list(map(str, exp.dtypes)) \
                else f"  [dtype diff: {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}]"
            print(f"PASS {name} ({len(got)} rows){dt}")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
