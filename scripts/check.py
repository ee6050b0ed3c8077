#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Loads each query's parquet dump (written by graft.Verify), replays the
oracle SQL from oracle_sql.json in DuckDB over the raw testdata
parquet, sorts columns by name and rows by all columns, and compares
values exactly.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    # Driver-faithful: the driver hashes rendered values, so 62500.0
    # (float) vs 62500 (int) hash DIFFERENTLY. Never coerce across the
    # float/int boundary (the round-13 ivf_list_stats slip).
    a_f, b_f = isinstance(a, float), isinstance(b, float)
    if a_f != b_f:
        return False
    if a_f:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).fetchdf())
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            failed.append(name)
            continue
        # Driver-faithful: a final-column dtype mismatch IS a failure
        # (the driver's hash is type-sensitive — round-13 ivf_list_stats
        # shipped red because this used to be a non-fatal warning).
        dtype_bad = [
            (col, str(exp[col].dtype), str(got[col].dtype))
            for col in set(exp.columns) & set(got.columns)
            if str(exp[col].dtype) != str(got[col].dtype)
        ]
        if dtype_bad:
            for col, de, dg in sorted(dtype_bad):
                print(f"FAIL {name}: dtype col={col} oracle={de} spark={dg}")
            failed.append(name)
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            failed.append(name)
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            failed.append(name)
            continue
        bad = None
        for col in exp.columns:
            ev, gv = exp[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                if not cell_eq(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: value mismatch col={col} row={i} exp={a!r} got={b!r}")
            failed.append(name)
        else:
            print(f"ok   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} matched")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
