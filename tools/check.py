#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
given SF, then replay oracle_sql.json in DuckDB over the same parquet
tables and compare row counts, schemas (loosely), and value hashes.

DRIVER FIDELITY (the r10 lesson): the authoritative harness converts
BOTH sides through pandas — DuckDB results via `.df()` (HUGEINT and
DECIMAL become float64, so `9664` renders `9664.0`) and Spark parquet
via pyarrow→pandas (BIGINT stays int64) — then sorts rows with
`DataFrame.sort_values` (which CRASHES on list columns) and hashes the
stringified cells. The previous check.py compared `fetchall()` values
(Decimal→str, round(f,6)) and said 155/155 while the driver said
141/155 two rounds running. This version replays the lossy pandas path,
CALIBRATED against CORRECTNESS_r10 (reproduced its 141/14 split
entry-for-entry), so local green predicts driver green:
  - oracle side: con.execute(sql).df()
  - spark side:  pandas.read_parquet(dir)
  - both: columns sorted by name; floats rounded to 6 (the driver
    passes last-ulp diffs like tx12/tx13), date/datetime rendered
    uniformly (an1/rt1/sw1 pass), nulls unified to one token; int64
    vs float64 and Decimal objects are NOT normalized (that is the
    lossiness the driver has); list columns crash the row-sort probe
    exactly like the driver. Do not "fix" the normalization without
    re-calibrating against a driver artifact.

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_col(s):
    """Column-level normalization calibrated against CORRECTNESS_r10:
    the driver rounds floats (tx12/tx13 pass with last-ulp diffs; HUGEINT
    float64 `9664.0` still differs from int64 `9664`) and renders DATE
    uniformly on both sides (an1/rt1/sw1 pass though pandas yields
    datetime.date for Spark's date32 and datetime64 for DuckDB DATE).
    Everything else — int64, Decimal objects, strings, ndarray — is
    passed through as-is, exactly as lossy as the driver."""
    import numpy as np, datetime
    if pd.api.types.is_float_dtype(s):
        return s.round(6)
    if pd.api.types.is_datetime64_any_dtype(s):
        return s.dt.strftime("%Y-%m-%d %H:%M:%S")
    if s.dtype == object:
        nn = s.dropna()
        if len(nn) and isinstance(nn.iloc[0], datetime.date) \
                and not isinstance(nn.iloc[0], datetime.datetime):
            return s.map(lambda d: d.strftime("%Y-%m-%d %H:%M:%S")
                         if d is not None else d)
    return s


def df_lines(df):
    """Driver-style canonical lines: sort columns by name, sort rows by
    all columns (raises on unhashable/list cells, as the driver does),
    stringify each cell, string-sort the lines."""
    cols = sorted(df.columns)
    df = df[cols].apply(_norm_col)
    if len(cols) > 0 and len(df) > 0:
        df.sort_values(by=cols, kind="mergesort")  # ndarray-crash probe
    def cell(v):
        try:
            if pd.isna(v):  # None / NaN / NaT render as one token —
                return "NULL"  # the driver passes an1's NULL-date row
        except (TypeError, ValueError):
            pass  # ndarray etc.
        return str(v)
    return sorted("\x1f".join(cell(v) for v in row)
                  for row in df.itertuples(index=False, name=None))


def df_hash(lines):
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
            got = pd.read_parquet(res_dir)
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: read: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols {sorted(got.columns)}"
                  f" != {sorted(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        try:
            gl, wl = df_lines(got), df_lines(want)
        except Exception as e:
            # the driver records these as err rows (e.g. list columns:
            # "unhashable type: 'numpy.ndarray'")
            print(f"FAIL {name}: sort/hash: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if df_hash(gl) != df_hash(wl):
            print(f"FAIL {name}: hash mismatch ({len(gl)} rows)")
            for a, b in zip(sorted(gl), sorted(wl)):
                if a != b:
                    print(f"  spark: {a.replace(chr(31), ' | ')}")
                    print(f"  duck : {b.replace(chr(31), ' | ')}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gl)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
