#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then replay oracle_sql.json in DuckDB over the same parquet
tables and compare row counts, schemas (loosely), and value hashes.

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import sys, os, json, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(round(v, 6))
    if isinstance(v, int):
        return str(v)
    return str(v)


def df_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        res_dir = f"{out}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            want = con.execute(oracle[name])
            wcols = [d[0] for d in want.description]
            wrows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if sorted(gcols) != sorted(wcols):
            print(f"FAIL {name}: cols {sorted(gcols)} != {sorted(wcols)}")
            n_fail += 1
            continue
        if len(grows) != len(wrows):
            print(f"FAIL {name}: rows {len(grows)} != {len(wrows)}")
            n_fail += 1
            continue
        gh, wh = df_hash(gcols, grows), df_hash(wcols, wrows)
        if gh != wh:
            print(f"FAIL {name}: hash mismatch ({len(grows)} rows)")
            order = sorted(range(len(gcols)), key=lambda i: gcols[i])
            gl = sorted("\x1f".join(norm(r[i]) for i in order) for r in grows)
            wl = sorted("\x1f".join(norm(r[i]) for i in order) for r in wrows)
            for a, b in zip(gl, wl):
                if a != b:
                    print(f"  spark: {a.replace(chr(31), ' | ')}")
                    print(f"  duck : {b.replace(chr(31), ' | ')}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
