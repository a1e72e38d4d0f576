#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output parquet
vs DuckDB executing oracle_sql.json over the same sf parquet tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows, cols):
    out = []
    for r in rows:
        vals = dict(zip(cols, r))
        out.append(tuple(vals[c] for c in sorted(cols)))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))

def approx_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return abs(a - b) <= 1e-6 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output");  n_bad += 1; continue
        try:
            r1 = con.execute(f"SELECT * FROM '{files[0]}'")
            cols1, rows1 = [d[0] for d in r1.description], r1.fetchall()
            r2 = con.execute(sql)
            cols2, rows2 = [d[0] for d in r2.description], r2.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if sorted(c.lower() for c in cols1) != sorted(c.lower() for c in cols2):
            print(f"FAIL {name}: schema {sorted(cols1)} vs {sorted(cols2)}")
            n_bad += 1; continue
        a = norm(rows1, [c.lower() for c in cols1])
        b = norm(rows2, [c.lower() for c in cols2])
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}")
            print("  spark:", a[:3]); print("  duck :", b[:3])
            n_bad += 1; continue
        bad = None
        for ra, rb in zip(a, b):
            if len(ra) != len(rb) or not all(approx_eq(x, y) for x, y in zip(ra, rb)):
                bad = (ra, rb); break
        if bad:
            print(f"FAIL {name}: value mismatch\n  spark: {bad[0]}\n  duck : {bad[1]}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(a)} rows)"); n_ok += 1
    # queries with no oracle: rows-only
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            files = glob.glob(f"{d}/*.parquet")
            n = con.execute(f"SELECT count(*) FROM '{files[0]}'").fetchone()[0] if files else 0
            print(f"ROWS {name}: {n} rows (no oracle)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
