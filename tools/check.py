#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

Reads each <outDir>/<name> parquet (Spark output), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the raw tables,
sorts columns by name and rows by all columns, and diffs values.

DRIVER PARITY: the driver's hash is dtype-sensitive — an int64 Spark
column vs a float64 oracle column (DuckDB HUGEINT/DECIMAL leak) hashes
differently even when the values are numerically equal, and array/map
graded columns crash its pandas canonicalization outright. So this gate
must be at least as strict:
  * array/ndarray/dict cells in either frame -> loud FAIL (flatten or
    array_to_string the graded output instead);
  * per-column dtype CLASS (int / float / bool / datetime / string)
    must match between Spark and oracle -> otherwise FAIL with a hint
    to CAST the oracle aggregate (sum() over BIGINT is HUGEINT in
    DuckDB; DECIMAL renders at fixed scale in Spark but float in
    pandas — keep DECIMAL out of graded output, grade integer cents).
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd


TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]


def dtype_class(dtype) -> str:
    s = str(dtype)
    if s.startswith("datetime"):
        return "datetime"
    k = np.dtype(dtype).kind if s != "object" else "O"
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "string"


def reject_nested(df: pd.DataFrame, side: str, name: str):
    for c in df.columns:
        if df[c].dtype == object and len(df):
            # first NON-NULL value: a leading null (or scalar) must not
            # let list/ndarray cells later in the column slip past
            s = df[c].dropna()
            if not len(s):
                continue
            v = s.iloc[0]
            if isinstance(v, (list, np.ndarray, dict)):
                raise ValueError(
                    f"{name}: {side} column '{c}' is nested "
                    f"({type(v).__name__}) — the driver harness cannot hash "
                    f"array/map graded output; flatten or array_to_string it")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: timestamps -> iso strings, floats stay
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM parquet_scan({files!r})").df()
        if name not in oracle:
            status = "ok" if len(got) > 0 else "EMPTY"
            print(f"[rows] {name}: {len(got)} rows ({status})")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error {e}"); n_fail += 1; continue
        try:
            reject_nested(got, "spark", name)
            reject_nested(exp, "oracle", name)
        except ValueError as e:
            print(f"[FAIL] {e}"); n_fail += 1; continue
        # driver-parity dtype gate BEFORE stringification
        got_s = got.reindex(sorted(got.columns), axis=1)
        exp_s = exp.reindex(sorted(exp.columns), axis=1)
        if list(got_s.columns) == list(exp_s.columns):
            bad = [(c, dtype_class(got_s[c].dtype), dtype_class(exp_s[c].dtype))
                   for c in got_s.columns
                   if dtype_class(got_s[c].dtype) != dtype_class(exp_s[c].dtype)]
            if bad:
                det = ", ".join(f"{c}: spark={a} oracle={b}" for c, a, b in bad)
                print(f"[FAIL] {name}: dtype-class mismatch ({det}) — the "
                      f"driver hash is dtype-sensitive; CAST the oracle "
                      f"aggregate (HUGEINT/DECIMAL leak?)")
                n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if len(g) == 0:
            print(f"[WARN] {name}: both EMPTY (weak pass)"); n_pass += 1; continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"[PASS] {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as ex:
            msg = str(ex).split("\n")
            print(f"[FAIL] {name}: value mismatch: " + " | ".join(msg[:4]))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
