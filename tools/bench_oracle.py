#!/usr/bin/env python3
"""Times the DuckDB oracle suite — the single-process baseline the Spark
bench is compared against in BASELINE.md.

Usage: python3 tools/bench_oracle.py <sfDir> <verifyOutDir>

Runs every SQL in <verifyOutDir>/oracle_sql.json against the sfDir
parquet tables (same views as check.py) and prints one JSON line with
per-query seconds and the total.
"""
import json, os, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    # same knob as check.py: skip oracles whose DuckDB form is
    # intractable at big SFs (quadratic pairs / comp^2 closure)
    skip = set(filter(None,
                      os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    def run_suite(sqls):
        times = {}
        for name in sorted(sqls):
            if name in skip:
                continue
            t0 = time.time()
            try:
                con.sql(sqls[name]).fetchall()
                times[name] = round(time.time() - t0, 3)
            except Exception as e:
                times[name] = -1.0
                print(f"ERR {name}: {e}", file=sys.stderr)
        return times

    times = run_suite(oracle)
    total = round(sum(v for v in times.values() if v > 0), 3)
    # SQL-expressible benchOnly twins (variant_sql.json, written by
    # graft.Verify): timed so headline substitutions (e.g. the DOULION
    # triangle scale path) are PAIRED — both engines run the same
    # sampled algebra. substituted_total mirrors graft.Bench's metric:
    # the suite total with each exact query's time replaced by its
    # scale-path twin where a twin timing exists.
    variants = {}
    vpath = os.path.join(out_dir, "variant_sql.json")
    if os.path.exists(vpath):
        with open(vpath) as f:
            variants = run_suite(json.load(f))
    substitutes = {"graph_triangles_sampled": "graph_triangles"}
    substituted = total
    for variant, exact in substitutes.items():
        if variants.get(variant, -1) > 0 and times.get(exact, -1) > 0:
            substituted = substituted - times[exact] + variants[variant]
    print(json.dumps({"metric": "oracle_total", "value": total,
                      "unit": "sec", "queries": times,
                      "variants": variants,
                      "substituted_total": round(substituted, 3),
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
