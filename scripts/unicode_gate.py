#!/usr/bin/env python3
"""Hash-verify the text/dedup/retrieval operators on NON-ASCII content
(round-10 VERDICT item #6).

The sf0.01 correctness gate corpus is pure ASCII, so the tokenizer
regexes (\\p{L}), md5-of-UTF-8 hashing and string-length semantics —
exactly where java.util.regex/UTF8String and DuckDB's RE2/UTF-8
implementations could disagree on CJK, surrogate-pair emoji, combining
diacritics, RTL, zero-width input — were only ever spec-checked on the
Spark side (UnicodeTextSpec). This script:

  1. generates the fixture (graft.tools.UnicodeGate): the real sf0.01
     documents plus a 56-row non-ASCII slab of the UnicodeTextSpec
     content classes;
  2. runs graft.Verify restricted to the documents-reading H/F/D
     queries;
  3. replays each oracle in DuckDB over the same parquet and compares
     exactly (the scripts/check.py contract);
  4. writes UNICODEGATE_r11.json — per-query match status.

Usage: python3 scripts/unicode_gate.py [fixtureDir] [verifyOutDir]
"""
import json
import math
import subprocess
import sys

import duckdb

# every SparkEntry query that reads ONLY the documents table:
# H (text analysis), F (text dedup + dup graph), D (retrieval)
QUERIES = [
    # H
    "lang_id", "text_quality", "token_count", "doc_fingerprint",
    "repetition_ratio", "pii_redact", "lm_score", "token_ids",
    "bpe_merges", "fuzzy_match", "bpe_fertility",
    # F
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_clusters", "substring_dedup",
    "minhash_est", "dedup_incremental", "graph_degree", "pagerank",
    # D (semantic_search is excluded: it searches the C2 insight
    # corpus derived from orders, not the documents table)
    "tfidf", "cosine_topk_docs", "bm25_topk_docs",
    "vocab_topk", "doc_chunk", "keyword_extract", "hybrid_rrf",
]


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
    argv = [a for a in sys.argv[1:] if a != "--skip-spark"]
    fix_dir = argv[0] if len(argv) > 0 else "/tmp/graft_unicode_gate"
    out_dir = argv[1] if len(argv) > 1 else "/tmp/graft_unicode_gate_out"
    if "--skip-spark" not in sys.argv:  # reuse an existing Verify dump
        subprocess.run(
            ["sbt", f'runMain graft.tools.UnicodeGate {fix_dir}'],
            check=True)
        subprocess.run(
            ["sbt", f'runMain graft.Verify {fix_dir} {out_dir} {",".join(QUERIES)}'],
            check=True, env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "16"})

    con = duckdb.connect()
    # Spark writes the table as a DIRECTORY of part files
    con.execute("CREATE VIEW documents AS SELECT * "
                f"FROM read_parquet('{fix_dir}/documents.parquet/*.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed_spark = json.load(open(f"{out_dir}/failed.json"))
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    n_slab = con.execute(
        "SELECT count(*) FROM documents WHERE source = 'uni'").fetchone()[0]

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

    artifact = {
        "fixture": {"n_docs": n_docs, "n_non_ascii_slab": n_slab},
        "queries": results,
        "matched": sum(1 for r in results.values() if r["match"]),
        "total": len(results),
    }
    out_json = "UNICODEGATE_r11.json"
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"\n{artifact['matched']}/{artifact['total']} matched -> {out_json}")
    sys.exit(0 if artifact["matched"] == artifact["total"] else 1)


if __name__ == "__main__":
    main()
