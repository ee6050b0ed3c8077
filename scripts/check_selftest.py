#!/usr/bin/env python3
"""Regression test for scripts/check.py's driver-faithfulness.

Round 13 shipped a red driver row (ivf_list_stats) because check.py
treated a final-column dtype mismatch (DuckDB HUGEINT->float64 vs
Spark int64, values identical) as a non-fatal warning and coerced
float==int in cell_eq. This self-test reconstructs that exact slip in
miniature and asserts the hardened checker FAILS it, while a
genuinely identical dump still passes.

Usage: python3 scripts/check_selftest.py   (exit 0 = checker is sane)
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")


def run_check(sf_dir, out_dir):
    p = subprocess.run([sys.executable, CHECK, sf_dir, out_dir],
                       capture_output=True, text=True)
    return p.returncode, p.stdout


def main():
    tmp = tempfile.mkdtemp(prefix="graft_check_selftest_")
    try:
        sf = os.path.join(tmp, "sf")
        out = os.path.join(tmp, "out")
        os.makedirs(sf)
        con = duckdb.connect()
        # Minimal testdata: every TABLES view must exist for check.py.
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.execute(
                f"COPY (SELECT 1 AS id) TO '{sf}/{t}.parquet' (FORMAT PARQUET)")

        # Case 1 — the r13 slip: oracle divides by a HUGEINT-widened
        # sum => float64 column; the "Spark" dump holds the same VALUE
        # as int64. Hardened checker must FAIL.
        os.makedirs(os.path.join(out, "slip"))
        con.execute(
            f"COPY (SELECT CAST(62500 AS BIGINT) AS share_ppm) "
            f"TO '{out}/slip/part-0.parquet' (FORMAT PARQUET)")
        # Case 2 — identical dtype and value. Must pass.
        os.makedirs(os.path.join(out, "clean"))
        con.execute(
            f"COPY (SELECT CAST(62500 AS BIGINT) AS share_ppm) "
            f"TO '{out}/clean/part-0.parquet' (FORMAT PARQUET)")
        oracle = {
            # (62500 * 1000000) // sum(...) where sum() widens to
            # HUGEINT -> pandas float64, exactly the ivf_list_stats
            # shape at commit a9fc923.
            "slip": ("WITH t AS (SELECT CAST(62500 AS BIGINT) AS n, "
                     "1000000 AS m) "
                     "SELECT (n * m) // (SELECT sum(n * 16) FROM t) "
                     "AS share_ppm FROM t"),
            "clean": "SELECT CAST(62500 AS BIGINT) AS share_ppm",
        }
        with open(os.path.join(out, "oracle_sql.json"), "w") as f:
            json.dump(oracle, f)

        rc, stdout = run_check(sf, out)
        ok_clean = "ok   clean" in stdout
        fail_slip = any(l.startswith("FAIL slip") for l in
                        stdout.splitlines())
        if rc != 0 and ok_clean and fail_slip:
            print("SELFTEST PASS: checker fails the r13 dtype-slip "
                  "class and passes the identical dump")
            return 0
        print("SELFTEST FAIL: checker output was:\n" + stdout)
        return 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
