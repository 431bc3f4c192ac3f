#!/usr/bin/env python3
"""Local pre-validation of the driver's DuckDB-oracle gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
over <sfDir>/*.parquet, and compares: row count, column names (sorted), and
cell values (exact; doubles compared exactly after the queries' own rounding).
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no result parquet in {res_dir}")
            failures += 1
            continue
        try:
            grel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            got_cols, got_types = grel.columns, [str(t) for t in grel.types]
            got = grel.fetchall()
            wrel = con.sql(sql)
            want_cols, want_types = wrel.columns, [str(t) for t in wrel.types]
            want = wrel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(want_cols)}")
            failures += 1
            continue
        # DuckDB promotes un-cast integer arithmetic (sum(), //) to
        # HUGEINT/DECIMAL; the driver's hash is dtype-sensitive, so that
        # drift is a real gate failure even when cell values are equal.
        # Flag it hard here (r5 lost 4 rows to exactly this).
        wtype = dict(zip(want_cols, want_types))
        gtype = dict(zip(got_cols, got_types))
        drift = [c for c in want_cols
                 if ("HUGEINT" in wtype[c] or "DECIMAL" in wtype[c])
                 and wtype[c] != gtype[c]]
        if drift:
            print(f"FAIL {name}: oracle type drift "
                  f"{[(c, gtype[c], wtype[c]) for c in drift]} — add CAST "
                  f"in the oracle SQL")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # align column order by name (the driver sorts columns by name)
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
            print(f"FAIL {name}: first diff at row {i}:\n  got  {gr}\n  want {wr}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
