#!/usr/bin/env python3
"""check_oracle.py variant for BIG-SF sweeps: same compare (row count,
column names, exact cell values, dtype-drift guard), plus a per-oracle
wall-clock budget — some DuckDB replays (recursive-CTE connected
components, full minhash re-derivations) are themselves super-linear in
SQL and would stall a 10x sweep for hours without telling us anything
about the Spark engine under test. A timed-out ORACLE is reported as
ORACLE_TIMEOUT (with the Spark-side row count), distinct from FAIL: the
gate remains hash-green at driver scale; the sweep records engine-side
scaling for that row instead.

Usage: check_oracle_sweep.py <sfDir> <verifyOutDir> [timeoutSec=300] [only,csv]
"""
import sys, json, glob, os, math, threading, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir, budget=300.0, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures, timeouts = 0, []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet in {res_dir}", flush=True)
            failures += 1
            continue
        try:
            grel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols, got_types = grel.columns, [str(t) for t in grel.types]
            got = grel.fetchall()
            # watchdog: interrupt the oracle query past the budget
            done = threading.Event()
            timed_out = []
            def watchdog():
                if not done.wait(budget):
                    timed_out.append(True)
                    con.interrupt()
            th = threading.Thread(target=watchdog, daemon=True)
            t0 = time.time()
            th.start()
            try:
                wrel = con.sql(sql)
                want_cols = wrel.columns
                want_types = [str(t) for t in wrel.types]
                want = wrel.fetchall()
            finally:
                done.set()
            th.join()
        except Exception as e:
            if timed_out:
                print(f"ORACLE_TIMEOUT {name}: DuckDB replay exceeded "
                      f"{budget:.0f}s (spark rows={len(got)})", flush=True)
                timeouts.append(name)
                continue
            print(f"FAIL {name}: exception {e}", flush=True)
            failures += 1
            continue
        dt = time.time() - t0
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != "
                  f"{sorted(want_cols)}", flush=True)
            failures += 1
            continue
        wtype = dict(zip(want_cols, want_types))
        gtype = dict(zip(got_cols, got_types))
        drift = [c for c in want_cols
                 if ("HUGEINT" in wtype[c] or "DECIMAL" in wtype[c])
                 and wtype[c] != gtype[c]]
        if drift:
            print(f"FAIL {name}: oracle type drift "
                  f"{[(c, gtype[c], wtype[c]) for c in drift]}", flush=True)
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}", flush=True)
            failures += 1
            continue
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        widx = [want_cols.index(c) for c in sorted(want_cols)]
        bad = None
        for i, (g, w) in enumerate(zip(got, want)):
            gr = tuple(norm(g[j]) for j in gidx)
            wr = tuple(norm(w[j]) for j in widx)
            if gr != wr:
                bad = (i, gr, wr)
                break
        if bad:
            i, gr, wr = bad
            print(f"FAIL {name}: first diff at row {i}:\n  got  {gr}\n"
                  f"  want {wr}", flush=True)
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows ({dt:.1f}s oracle)",
                  flush=True)
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}"
          f"{' + ' + str(len(timeouts)) + ' oracle timeouts: ' + ','.join(timeouts) if timeouts else ''}",
          flush=True)
    return 1 if failures else 0

if __name__ == "__main__":
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    sys.exit(main(sys.argv[1], sys.argv[2], budget, only))
