#!/usr/bin/env python3
"""Dev-only single-node reference timings.

Runs every oracle SQL (as dumped by graft.Verify) in DuckDB against the
same sf directory and prints per-query seconds — the single-node
comparison point for the engine's BENCH numbers.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir>
"""
import sys, os, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    for name in sorted(oracles):
        t0 = time.time()
        try:
            con.execute(oracles[name]).fetchall()
            results[name] = round(time.time() - t0, 3)
        except Exception as e:
            results[name] = None
            print(f"{name}: ERROR {e}", file=sys.stderr)
    total = sum(v for v in results.values() if v is not None)
    print(json.dumps({"total_sec": round(total, 2), "queries": results}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
