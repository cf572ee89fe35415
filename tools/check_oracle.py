#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name, and compares row-by-row values exactly.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def cmp(name, spark_df, duck_df):
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        return f"COLS spark={list(s.columns)} duck={list(d.columns)}"
    if len(s) != len(d):
        return f"ROWS spark={len(s)} duck={len(d)}"
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        an = pd.isnull(a); bn = pd.isnull(b)
        if not (an == bn).all():
            i = int(np.nonzero(an != bn)[0][0])
            return f"NULLS col={c} row={i} spark={a[i]!r} duck={b[i]!r}"
        mask = ~an
        av, bv = a[mask], b[mask]
        try:
            eq = av == bv
        except Exception as e:
            return f"TYPE col={c}: {e}"
        if not np.all(eq):
            i = int(np.nonzero(~eq)[0][0])
            return (f"VAL col={c} spark={av[i]!r} duck={bv[i]!r} "
                    f"(dtype s={s[c].dtype} d={d[c].dtype})")
    # dtype report (informational — value equality already passed)
    dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(d[c].dtype)]
    return "OK" + (f" (dtype diff: {dt})" if dt else "")


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. ScaleGen sf1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO SPARK OUTPUT"
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        if name not in oracles:
            results[name] = f"NO ORACLE (rows={len(spark_df)})"
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        try:
            results[name] = cmp(name, spark_df, duck_df)
        except Exception as e:
            results[name] = f"CMP ERROR: {e}"
    for name in sorted(oracles):
        if name not in results:
            results[name] = "MISSING SPARK RESULT DIR"
    width = max(len(n) for n in results) if results else 10
    nok = 0
    for name in sorted(results):
        status = results[name]
        ok = status.startswith("OK") or status.startswith("NO ORACLE")
        nok += 0 if ok else 1
        print(f"{name:<{width}}  {status}")
    print(f"\n{'ALL GREEN' if nok == 0 else f'{nok} FAILING'}")
    return nok


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
