#!/usr/bin/env python3
"""Order-sensitive, EXACT (no rounding) replica of the driver's hash gate.
Run graft.Verify first, then: python3 tools/check_strict.py <sfDir> <outDir>

Prints the first differing row per failing query so the root cause
(value vs row-order) is visible.
"""
import json, sys, glob, os
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
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output")
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
        # dtype-class check: DuckDB HUGEINT/DECIMAL aggregates come back as
        # float64 while Spark writes int64 — "5.0" vs "5" breaks the driver's
        # value hash even when numerically equal (round-1 lesson).
        # (Deliberately a second oracle execution: deriving value tuples
        # from the pandas frame would change their Python types — Timestamp
        # vs datetime, NaN vs None — and corrupt the exactness comparison.)
        gdf = pd.read_parquet(pq)
        wdf = con.execute(sql).df()
        kind = lambda df, c: df[c].dtype.kind  # i/u/f/O/b/M
        dk = [(c, kind(gdf, c), kind(wdf, c)) for c in sorted(got_cols)
              if kind(gdf, c) != kind(wdf, c)]
        if dk:
            print(f"FAIL {name}: dtype-class mismatch {dk}")
            failures += 1
            continue
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        widx = [want_cols.index(c) for c in sorted(want_cols)]
        g = [tuple(r[i] for i in gidx) for r in got]
        w = [tuple(r[i] for i in widx) for r in want]
        if g == w:
            print(f"PASS {name}: {len(g)} rows (exact+ordered)")
            continue
        failures += 1
        if sorted(map(repr, g)) == sorted(map(repr, w)):
            print(f"FAIL {name}: ROW ORDER differs ({len(g)} rows, values identical)")
            for i, (a, b) in enumerate(zip(g, w)):
                if a != b:
                    print(f"   first diff at row {i}:")
                    print(f"     spark : {repr(a)[:200]}")
                    print(f"     oracle: {repr(b)[:200]}")
                    break
        else:
            print(f"FAIL {name}: VALUES differ ({len(g)} vs {len(w)} rows)")
            sg, sw = set(map(repr, g)), set(map(repr, w))
            for x in sorted(sg - sw)[:3]:
                print(f"   spark-only: {x[:240]}")
            for x in sorted(sw - sg)[:3]:
                print(f"   oracle-only: {x[:240]}")
    print("ALL PASS" if failures == 0 else f"{failures} FAILURES")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
