#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/compare.py <verify_out_dir> <sf_dir>

Reads <verify_out_dir>/oracle_sql.json, runs each SQL in DuckDB over the
parquet tables in <sf_dir>, and compares against the Spark-written parquet in
<verify_out_dir>/<name>/. Mirrors the driver: columns sorted by name, rows
sorted, values hashed (here: compared with a tiny float tolerance so we can
see *how* things differ instead of just a hash mismatch).

DTYPE-STRICT: the driver hashes typed values, so an int64 Spark column vs a
float64 oracle column (e.g. DuckDB sum(INTEGER) -> HUGEINT -> float64) is a
driver FAIL even when every value is numerically equal. We reproduce that
here: int-family vs float-family dtype mismatch on a column = FAIL, so local
green predicts driver green.
"""
import json, sys, glob, os, decimal
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize for stable sort: NaN last, everything to python objects
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for tbl in ["region","nation","customer","supplier","part","orders",
                "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        ok = True
        for c in got.columns:
            a, b = got[c].values, want[c].values
            g_float = np.issubdtype(got[c].dtype, np.floating)
            w_float = np.issubdtype(want[c].dtype, np.floating)
            g_int = np.issubdtype(got[c].dtype, np.integer)
            w_int = np.issubdtype(want[c].dtype, np.integer)
            # Decimal columns land as object dtype holding decimal.Decimal.
            # The driver hashes typed values, so decimal-vs-float (the exact
            # q126_r4 failure: Spark DECIMAL(28,2) vs DuckDB sum -> float64)
            # is a driver FAIL even when every value agrees to the cent.
            g_dec = got[c].dtype == object and any(
                isinstance(x, decimal.Decimal) for x in got[c].dropna().head(3))
            w_dec = want[c].dtype == object and any(
                isinstance(x, decimal.Decimal) for x in want[c].dropna().head(3))
            if (g_dec and (w_float or w_int)) or (w_dec and (g_float or g_int)):
                print(f"FAIL {name}: col {c} decimal-vs-numeric dtype mismatch "
                      f"spark={'decimal' if g_dec else got[c].dtype} "
                      f"duck={'decimal' if w_dec else want[c].dtype} "
                      f"(driver hash is typed — use the dsum pattern: "
                      f"round(sum(...),2)::DOUBLE on both sides)")
                ok = False; break
            if (g_float and w_int) or (g_int and w_float):
                print(f"FAIL {name}: col {c} dtype mismatch spark={got[c].dtype} duck={want[c].dtype} "
                      f"(driver hash compares typed values — cast the oracle, e.g. ::BIGINT on integer sums)")
                ok = False; break
            if g_float or w_float:
                af = pd.to_numeric(got[c], errors="coerce").values.astype(float)
                bf = pd.to_numeric(want[c], errors="coerce").values.astype(float)
                bad = ~(np.isclose(af, bf, rtol=1e-9, atol=1e-9) | (np.isnan(af) & np.isnan(bf)))
            else:
                bad = np.array([str(x) != str(y) for x, y in zip(a, b)])
            if bad.any():
                i = int(np.argmax(bad))
                print(f"FAIL {name}: col {c} differs at row {i}: spark={a[i]!r} duck={b[i]!r} ({int(bad.sum())} diffs)")
                ok = False; break
        if ok:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
