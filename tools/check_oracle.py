#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>.parquet + oracle_sql.json), then this script runs each
oracle in DuckDB against the same sf tables and diffs values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, bytes):
        return v.hex()
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output at {pq}")
            failures += 1
            continue
        try:
            got_rel = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
            got_cols = [c[0] for c in got_rel.description]
            got = got_rel.fetchall()
            want_rel = con.execute(sql)
            want_cols = [c[0] for c in want_rel.description]
            want = want_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            failures += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {got_cols} vs {want_cols}")
            failures += 1
            continue
        # align column order by name (driver sorts columns by name)
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        widx = [want_cols.index(c) for c in sorted(want_cols)]
        g = [tuple(norm(r[i]) for i in gidx) for r in got]
        w = [tuple(norm(r[i]) for i in widx) for r in want]
        if g == w:
            print(f"PASS {name}: {len(g)} rows")
        elif sorted(map(repr, g)) == sorted(map(repr, w)):
            print(f"PASS(unordered) {name}: {len(g)} rows — row order differs!")
        else:
            print(f"FAIL {name}: {len(g)} vs {len(w)} rows")
            sg, sw = set(map(repr, g)), set(map(repr, w))
            only_g = list(sg - sw)[:3]
            only_w = list(sw - sg)[:3]
            for x in only_g: print(f"   spark-only: {x[:200]}")
            for x in only_w: print(f"   oracle-only: {x[:200]}")
            failures += 1
    rows_only = [q for q in glob.glob(f"{out_dir}/*/") if
                 os.path.basename(q.rstrip('/')) not in oracles]
    for q in sorted(rows_only):
        n = os.path.basename(q.rstrip('/'))
        try:
            cnt = con.execute(f"SELECT count(*) FROM '{q}*.parquet'").fetchone()[0]
            print(f"ROWS {n}: {cnt} rows")
        except Exception as e:
            print(f"FAIL {n}: rows-only read error: {e}")
            failures += 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
