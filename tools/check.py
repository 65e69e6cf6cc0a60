#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle against DuckDB over the same sf directory, and compares
row counts, schemas (column names sorted) and values. This file is local
tooling only — the shipped library is the Scala code under src/.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd

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
    n_pass = n_fail = 0
    oracle_secs = {}
    for name in sorted(oracles):
        sql = oracles[name]
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
            t0 = time.perf_counter()
            exp = con.execute(sql).df()
            oracle_secs[name] = time.perf_counter() - t0
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(got, exp)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, duckdb {oracle_secs[name]:.2f}s)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    total = sum(oracle_secs.values())
    top = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
    print(f"== {n_pass} pass / {n_fail} fail == duckdb oracle total "
          f"{total:.1f}s, top: "
          + ", ".join(f"{n} {s:.1f}s" for n, s in top))
    return 1 if n_fail else 0


def compare(got, exp):
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        return False, f"schema: spark={gc} oracle={ec}"
    if len(got) != len(exp):
        return False, f"rows: spark={len(got)} oracle={len(exp)}"
    got = got[gc].reset_index(drop=True)
    exp = exp[ec].reset_index(drop=True)
    # driver sorts columns by name then hashes values; emulate a strict
    # value-equality check (order-sensitive: our queries orderBy anyway,
    # but also check order-insensitively to see which kind of miss it is)
    for c in gc:
        g, e = got[c], exp[c]
        try:
            same = (g.astype(str).values == e.astype(str).values).all()
        except Exception:
            same = False
        if not same:
            srt_g = g.astype(str).sort_values().values
            srt_e = e.astype(str).sort_values().values
            unordered = (srt_g == srt_e).all()
            idx = (g.astype(str).values != e.astype(str).values).argmax()
            return False, (f"col {c} differs (unordered_match={unordered}); "
                           f"first diff row {idx}: spark={g.iloc[idx]!r} "
                           f"oracle={e.iloc[idx]!r}")
    return True, ""


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
