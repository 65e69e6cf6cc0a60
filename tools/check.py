#!/usr/bin/env python3
"""Dev-only replica of the driver's correctness gate.

Reads the parquet dumps written by `graft.Verify` plus oracle_sql.json,
runs each oracle against DuckDB over the same sf directory, and compares
row counts, schemas (column names sorted) and values. This file is local
tooling only — the shipped library is the Scala code under src/.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> \
           [--skip n1,n2] [--only n1,n2] [--timeout-sec N]

--timeout-sec interrupts any single oracle exceeding N seconds (it
reports as TIMEOUT, not FAIL-by-mismatch) — for the sf10 campaign,
where a handful of oracles are quadratic/spill-bound in DuckDB and
must not wedge the rest of the batch.
"""
import sys, os, json, glob, threading, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir, skip=(), only=(), timeout_sec=None):
    def connect():
        c = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return c
    con = connect()
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_timeout = 0
    oracle_secs = {}
    for name in sorted(oracles):
        if name in skip or (only and name not in only):
            continue
        sql = oracles[name]
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        timer = None
        timed_out = [False]
        done = [False]  # guards the kill-after-completion race
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pq}/*.parquet')").df()
            if timeout_sec:
                def kill(c=con):
                    # the timer can fire in the window after the query
                    # completes but before cancel(); an interrupt there
                    # would poison the connection for the NEXT oracle
                    if not done[0]:
                        timed_out[0] = True
                        c.interrupt()
                timer = threading.Timer(timeout_sec, kill)
                timer.start()
            t0 = time.perf_counter()
            exp = con.execute(sql).df()
            oracle_secs[name] = time.perf_counter() - t0
        except Exception as e:
            if timed_out[0]:
                print(f"TIMEOUT {name}: oracle exceeded {timeout_sec}s")
                n_timeout += 1
                con = connect()  # interrupted connection state is suspect
            else:
                print(f"FAIL {name}: {e}")
                n_fail += 1
            continue
        finally:
            done[0] = True
            if timer:
                timer.cancel()
            if timed_out[0]:
                con = connect()  # a fired timer means the old conn is suspect
        sys.stdout.flush()
        ok, msg = compare(got, exp)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(got)} rows, duckdb {oracle_secs[name]:.2f}s)")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    total = sum(oracle_secs.values())
    top = sorted(oracle_secs.items(), key=lambda kv: -kv[1])[:5]
    to = f" / {n_timeout} timeout" if n_timeout else ""
    print(f"== {n_pass} pass / {n_fail} fail{to} == duckdb oracle total "
          f"{total:.1f}s, top: "
          + ", ".join(f"{n} {s:.1f}s" for n, s in top))
    # exit 1 = mismatches; exit 2 = clean except timeouts — scripts
    # treating 0 as "all verified" must not silently skip a timed-out
    # gate
    return 1 if n_fail else (2 if n_timeout else 0)


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
    args = sys.argv[1:]
    skip, only, timeout = (), (), None
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--skip":
            skip = tuple(args[i + 1].split(",")); i += 2
        elif args[i] == "--only":
            only = tuple(args[i + 1].split(",")); i += 2
        elif args[i] == "--timeout-sec":
            timeout = float(args[i + 1]); i += 2
        else:
            pos.append(args[i]); i += 1
    sys.exit(main(pos[0], pos[1], skip=skip, only=only, timeout_sec=timeout))
