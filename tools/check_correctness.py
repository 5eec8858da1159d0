#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query dumped by
graft.Verify, run its DuckDB oracle SQL over the same parquet fixtures and
compare rows/schema/values. Usage:

    python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def run_diag(con, name: str, out_dir: str) -> None:
    """Enforcing oracles (WHERE-clause quality gates like sketch_aggregates'
    sketch-error bounds) fail as a bare rows mismatch; when tools/diag/<name>
    .sql exists, run it and print the side-by-side values so the failure is
    diagnosable from the gate output (round-10 ADVICE)."""
    import os
    diag = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "diag", f"{name}.sql")
    if not os.path.exists(diag):
        return
    with open(diag) as fh:
        sql = fh.read().replace("{{OUT}}", os.path.abspath(out_dir))
    try:
        print(f"{'':28s} DIAG ({name}):")
        print(con.execute(sql).df().to_string(index=False))
    except Exception as e:
        print(f"{'':28s} DIAG-ERROR {e}")


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as fh:
        oracles = json.load(fh)

    failures = 0
    import glob
    import os
    seen = set()
    try:
        with open(f"{out_dir}/verify_errors.json") as fh:
            verify_errors = json.load(fh)
    except FileNotFoundError:
        verify_errors = {}
    for name, msg in verify_errors.items():
        print(f"{name:28s} VERIFY-ERROR {msg[:120]}")
        failures += 1
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        seen.add(name)
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"{name:28s} NO-OUTPUT")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracles:
            print(f"{name:28s} rows-only rows={len(spark_df)}"
                  + ("  (EMPTY!)" if len(spark_df) == 0 else ""))
            if len(spark_df) == 0:
                failures += 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR {e}")
            failures += 1
            continue
        s = canon(spark_df)
        o = canon(oracle_df)
        if list(s.columns) != list(o.columns):
            print(f"{name:28s} SCHEMA-MISMATCH spark={list(s.columns)} duck={list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"{name:28s} ROWS-MISMATCH spark={len(s)} duck={len(o)}")
            failures += 1
            run_diag(con, name, out_dir)
            continue
        bad = None
        for col in s.columns:
            sv, ov = list(s[col]), list(o[col])
            for i, (x, y) in enumerate(zip(sv, ov)):
                # normalize numpy/pyarrow scalars and dates
                if hasattr(x, "item"):
                    x = x.item()
                if hasattr(y, "item"):
                    y = y.item()
                if str(type(x)) != str(type(y)) and not (
                        isinstance(x, (int, float)) and isinstance(y, (int, float))):
                    x, y = str(x), str(y)
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"{name:28s} VALUE-MISMATCH col={col} row={i} spark={x!r} duck={y!r}")
            failures += 1
        else:
            print(f"{name:28s} OK rows={len(s)}")
    # an oracle entry whose dump dir is absent would otherwise vanish from
    # the dir-driven loop entirely (this is exactly what the driver records
    # as err) — flag it even when verify_errors.json is unavailable
    for name in sorted(set(oracles) - seen - set(verify_errors)):
        print(f"{name:28s} MISSING-DUMP")
        failures += 1
    print(f"\n{'FAILURES: %d' % failures if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
