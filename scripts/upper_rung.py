#!/usr/bin/env python3
"""Hash-verify the size-derived geometry ladders' UPPER RUNGS
(round-10 VERDICT item #1).

The sf0.01 correctness gate always lands on the bottom rung of every
geometry ladder (simhash W=8, knn planesFor p=8, IVF 16-list floor);
the oracles replay each ladder as a CASE over the same thresholds,
but until round 10 nothing ever checked that Spark and the oracle
agree ABOVE the bottom rung. This script:

  1. generates the deterministic >16k-doc / >16k-vector fixture
     (graft.tools.UpperRung) — simhash W=9, planesFor p=9,
     IVF lists=130;
  2. runs graft.Verify restricted to the geometry-ladder queries;
  3. replays each oracle in DuckDB over the same parquet and
     compares exactly (the scripts/check.py contract);
  4. writes UPPERRUNG_r11.json — a CORRECTNESS-style artifact with
     per-query match status plus the geometry the fixture selected.

Usage: python3 scripts/upper_rung.py [fixtureDir] [verifyOutDir]
         [--docs N] [--vecs N] [--out FILE.json] [--skip-spark]
         [--memory-limit SIZE] [--temp-dir DIR]

--docs/--vecs pick the rung: 20000/17000 (default) crosses the first
upper rung (W=9, p=9, 130 lists); 40000/40000 crosses the SECOND
(W=10, p=10, 200 lists) — each rung is a distinct CASE arm in the
oracles and a distinct bucket geometry in Spark, so each needs its
own end-to-end hash verification.

--memory-limit/--temp-dir size the DuckDB side: rung 2's oracle fits
the default budget, but rung 3's in-list pair joins exceed DuckDB's
default (80% of RAM is shared with the lingering Spark JVM) and its
default temp dir is the CWD-relative `.tmp` — which filled the repo
volume in the round-11 attempt. Defaults here give DuckDB 96 GB and
an absolute /tmp spill dir.
"""
import argparse
import json
import math
import os
import subprocess
import sys

import duckdb

QUERIES = ["dedup_simhash", "knn_join", "knn_lsh",
           "knn_ivf_given_centroids", "semdedup_given_centroids"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return str(a) == str(b)


def compare(con, sql, out_dir, name):
    exp = canon(con.execute(sql).fetchdf())
    got = canon(con.execute(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
    if list(exp.columns) != list(got.columns):
        return {"match": False, "why": "columns",
                "exp": list(exp.columns), "got": list(got.columns)}
    if len(exp) != len(got):
        return {"match": False, "why": "rows",
                "exp": len(exp), "got": len(got)}
    for col in exp.columns:
        for i, (a, b) in enumerate(zip(exp[col].tolist(), got[col].tolist())):
            if not cell_eq(a, b):
                return {"match": False, "why": "value", "col": col,
                        "row": i, "exp": repr(a), "got": repr(b)}
    return {"match": True, "rows": len(exp)}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("fixture_dir", nargs="?", default="/tmp/graft_upper_rung")
    ap.add_argument("verify_out_dir", nargs="?",
                    default="/tmp/graft_upper_rung_out")
    ap.add_argument("--docs", type=int, default=20000)
    ap.add_argument("--vecs", type=int, default=17000)
    ap.add_argument("--out", default="UPPERRUNG_r12.json")
    ap.add_argument("--skip-spark", action="store_true",
                    help="reuse an existing Verify dump")
    ap.add_argument("--memory-limit", default="96GB",
                    help="DuckDB memory_limit (default leaves headroom "
                         "for the Spark JVM on a 128 GB box)")
    ap.add_argument("--temp-dir", default="/tmp/graft_duck_tmp",
                    help="DuckDB spill directory (absolute; the default "
                         "CWD-relative .tmp filled the repo volume)")
    ap.add_argument("--threads", type=int, default=0,
                    help="DuckDB thread cap (0 = engine default); fewer "
                         "threads = fewer concurrently materializing "
                         "pipelines = a smaller peak spill footprint on "
                         "the big rungs")
    args = ap.parse_args()
    fix_dir, out_dir, out_json = args.fixture_dir, args.verify_out_dir, args.out
    if not args.skip_spark:
        subprocess.run(
            ["sbt",
             f'runMain graft.tools.UpperRung {fix_dir} {args.docs} {args.vecs}'],
            check=True)
        subprocess.run(
            ["sbt", f'runMain graft.Verify {fix_dir} {out_dir} {",".join(QUERIES)}'],
            check=True, env={**os.environ, "SPARK_GRAFT_CPUS": "16"})

    con = duckdb.connect()
    os.makedirs(args.temp_dir, exist_ok=True)
    con.execute(f"SET memory_limit='{args.memory_limit}'")
    con.execute(f"SET temp_directory='{args.temp_dir}'")
    if args.threads > 0:
        con.execute(f"SET threads={args.threads}")
    con.execute("SET preserve_insertion_order=false")
    for t in ["documents", "embeddings"]:
        # Spark writes each table as a DIRECTORY of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM read_parquet('{fix_dir}/{t}.parquet/*.parquet')")
    # geometry inputs from the ACTUAL fixture, not the constants —
    # with --skip-spark a reused dump of a different size would
    # otherwise mislabel the artifact (round-10 ADVICE)
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_vecs = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed_spark = json.load(open(f"{out_dir}/failed.json"))

    results = {}
    for name in QUERIES:
        if name in failed_spark:
            results[name] = {"match": False, "why": "spark_failed",
                             "err": failed_spark[name]}
            continue
        try:
            results[name] = compare(con, oracle[name], out_dir, name)
        except Exception as e:  # noqa: BLE001
            results[name] = {"match": False, "why": "oracle_error",
                             "err": str(e)[:500]}
        status = "ok  " if results[name]["match"] else "FAIL"
        print(f"{status} {name}: {results[name]}")

    # the geometry the fixture actually selected (mirrors the Scala
    # ladders: smallest W/p with n <= 64·2^x; lists = max(16, floor(sqrt n)))
    w = next(w for w in range(8, 17) if n_docs <= 64 * (1 << w) or w == 16)
    p = next(p for p in range(8, 21) if n_vecs <= 64 * (1 << p) or p == 20)
    artifact = {
        "fixture": {"n_docs": n_docs, "n_vecs": n_vecs,
                    "simhash_w": w, "knn_planes": p,
                    "ivf_lists": max(16, int(math.isqrt(n_vecs)))},
        "queries": results,
        "matched": sum(1 for r in results.values() if r["match"]),
        "total": len(results),
    }
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\n{artifact['matched']}/{artifact['total']} matched "
          f"(W={w}, p={p}) -> {out_json}")
    sys.exit(0 if artifact["matched"] == artifact["total"] else 1)


if __name__ == "__main__":
    main()
