#!/usr/bin/env python3
"""Local replica of the driver's correctness gate, with memory governance.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [options]

Options:
  --only a,b,c      check only these query names
  --json PATH       write {name: status} JSON incrementally after each query
  --timeout SEC     per-query wall-clock limit (default 900)
  --mem LIMIT       duckdb memory_limit per query (default 24GB)
  --no-subprocess   run all queries in this process (old behavior, faster,
                    but one OOM kills the whole run)

Default mode runs each query in its OWN subprocess: an oracle that gets
OOM-killed or times out loses only that query's result, every completed
result is already printed (flushed) and persisted to --json, and the
duckdb memory_limit bounds each child. This exists because the monolithic
sf1 run was OOM-killed at 130 GB with all output lost.
"""
import sys, os, json, glob, subprocess

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir, mem, tmp=None):
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET preserve_insertion_order=false")
    if tmp:  # per-query spill dir so a killed child's spill is reclaimable
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table (e.g. ScaleGen sf1)
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df):
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def cmp(spark_df, duck_df):
    import pandas as pd
    import numpy as np
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
    dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(d[c].dtype)]
    return "OK" + (f" (dtype diff: {dt})" if dt else "")


def check_one(con, out_dir, name, oracles):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        return "NO SPARK OUTPUT"
    # The spark result MUST be read in file order: this connection sets
    # preserve_insertion_order=false (needed so big ORACLE queries
    # don't hold ordering buffers), and at sf10 row counts DuckDB's
    # parallel parquet read visibly scrambles rows under that setting —
    # four queries false-failed the positional compare exactly that
    # way (q24/q33/m6/q32 at sf10; every small-SF read happened to
    # come back ordered). pyarrow reads a single coalesced file in
    # physical order unconditionally. The oracle side is unaffected:
    # its SQL carries an explicit ORDER BY, which duckdb honors
    # regardless of preserve_insertion_order.
    import pandas as pd
    spark_df = pd.concat(
        [pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if name not in oracles:
        return f"NO ORACLE (rows={len(spark_df)})"
    try:
        duck_df = con.execute(oracles[name]).df()
    except Exception as e:
        return f"ORACLE SQL ERROR: {e}"
    try:
        return cmp(spark_df, duck_df)
    except Exception as e:
        return f"CMP ERROR: {e}"


def parse_args(argv):
    opts = {"only": None, "json": None, "timeout": 900, "mem": "24GB",
            "subprocess": True, "one": None, "autochunk": True}
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--only":
            opts["only"] = set(argv[i + 1].split(",")); i += 2
        elif a == "--json":
            opts["json"] = argv[i + 1]; i += 2
        elif a == "--timeout":
            opts["timeout"] = int(argv[i + 1]); i += 2
        elif a == "--mem":
            opts["mem"] = argv[i + 1]; i += 2
        elif a == "--no-subprocess":
            opts["subprocess"] = False; i += 1
        elif a == "--no-auto-chunk":
            opts["autochunk"] = False; i += 1
        elif a == "--one":  # internal: child mode, check a single query
            opts["one"] = argv[i + 1]; i += 2
        else:
            pos.append(a); i += 1
    return pos[0], pos[1], opts


# Auto-chunk dispatch (r11 verdict item 7): above this documents-table
# row count the monolithic all-pairs mirrors exceed the box's spill
# disk (observed at sf1's 50k docs), so the pair-family queries route
# to tools/chunked_oracle.py automatically — one code path, no manual
# tool selection at sf >= 1.
AUTO_CHUNK_DOCS = 20000


def autochunk_set_and_k(sf_dir):
    try:
        import duckdb
        p = f"{sf_dir}/documents.parquet"
        src = f"read_parquet('{p}/*.parquet')" if os.path.isdir(p) else \
              f"read_parquet('{p}')"
        if not os.path.exists(p):
            return set(), 8
        n = duckdb.connect().execute(
            f"SELECT COUNT(*) FROM {src}").fetchone()[0]
        if n <= AUTO_CHUNK_DOCS:
            return set(), 8
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "chunked_oracle",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "chunked_oracle.py"))
        chunked = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(chunked)
        return set(chunked.SUPPORTED), (8 if n <= 100000 else 32)
    except Exception as e:
        print(f"[auto-chunk] disabled: {e}", flush=True)
        return set(), 8


def main(sf_dir, out_dir, opts):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    if opts["one"] is not None:  # child mode: single query, print status only
        con = connect(sf_dir, opts["mem"],
                      tmp=f"/tmp/duckspill-{opts['one']}")
        print(check_one(con, out_dir, opts["one"], oracles), flush=True)
        return 0

    names = sorted([os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                    if os.path.isdir(p)])
    # Verify writes <name>.FAILED when the DataFrame itself throws —
    # those queries have no output dir and may not even be in oracles
    # under --only, so enumerate the sentinels explicitly: a crashed
    # query must appear as a failure, never silently vanish (r09 shipped
    # three analysis-broken queries that were simply absent).
    crashed = {os.path.basename(p)[:-len(".FAILED")]
               for p in glob.glob(f"{out_dir}/*.FAILED")}
    for name in sorted(set(oracles) | crashed):
        if name not in names:
            names.append(name)
    names = sorted(names)
    if opts["only"] is not None:
        names = [n for n in names if n in opts["only"]]

    chunk_set, chunk_k = (autochunk_set_and_k(sf_dir)
                          if opts["autochunk"] else (set(), 8))
    if chunk_set & set(names):
        print(f"[auto-chunk] K={chunk_k} for "
              f"{sorted(chunk_set & set(names))}", flush=True)

    results = {}
    width = max((len(n) for n in names), default=10)
    con = None if opts["subprocess"] else connect(sf_dir, opts["mem"])
    for name in names:
        if name in crashed:
            with open(f"{out_dir}/{name}.FAILED") as f:
                status = f"SPARK QUERY FAILED: {f.read().strip()[:300]}"
        elif name in oracles and not glob.glob(f"{out_dir}/{name}"):
            status = "MISSING SPARK RESULT DIR"
        elif name in chunk_set:
            cmdline = [sys.executable,
                       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "chunked_oracle.py"),
                       sf_dir, out_dir, "--only", name,
                       "--k", str(chunk_k), "--mem", opts["mem"]]
            try:
                # chunked replays are the heavy tail by construction:
                # give them 8x the per-query budget
                r = subprocess.run(cmdline, capture_output=True, text=True,
                                   timeout=8 * opts["timeout"])
                line = next((l for l in r.stdout.splitlines()
                             if l.startswith(name)), "")
                # branch on the exit code FIRST: a nonzero rc with a
                # partial name line is a crash (the line may be stale),
                # and rc=0 without a name line is a protocol break, not
                # a "DIED rc=0" (r12 advice)
                if r.returncode != 0:
                    status = (f"CHUNKED CHILD DIED rc={r.returncode}: "
                              f"{r.stderr.strip()[-300:]}")
                elif not line:
                    status = ("CHUNKED CHILD NO STATUS LINE: "
                              f"{r.stdout.strip()[-300:]}")
                else:
                    status = line[len(name):].strip()
            except subprocess.TimeoutExpired:
                status = f"CHUNKED ORACLE TIMEOUT >{8 * opts['timeout']}s"
            import shutil
            shutil.rmtree(f"/tmp/duckspill-chunk-{name}", ignore_errors=True)
        elif opts["subprocess"]:
            cmdline = [sys.executable, os.path.abspath(__file__), sf_dir,
                       out_dir, "--one", name, "--mem", opts["mem"]]
            try:
                r = subprocess.run(cmdline, capture_output=True, text=True,
                                   timeout=opts["timeout"])
                status = (r.stdout.strip() or
                          f"CHILD DIED rc={r.returncode}: "
                          f"{r.stderr.strip()[-300:]}")
            except subprocess.TimeoutExpired:
                status = f"ORACLE TIMEOUT >{opts['timeout']}s"
            # reclaim the child's spill dir — a killed/OOMed child
            # leaves tens of GB behind and starves the next spiller
            import shutil
            shutil.rmtree(f"/tmp/duckspill-{name}", ignore_errors=True)
        else:
            status = check_one(con, out_dir, name, oracles)
        results[name] = status
        print(f"{name:<{width}}  {status}", flush=True)
        if opts["json"]:
            tmp = opts["json"] + ".tmp"
            with open(tmp, "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)
            os.replace(tmp, opts["json"])

    nok = sum(0 if (v.startswith("OK") or v.startswith("NO ORACLE")) else 1
              for v in results.values())
    print(f"\n{'ALL GREEN' if nok == 0 else f'{nok} FAILING'}", flush=True)
    return nok


if __name__ == "__main__":
    sf, out, o = parse_args(sys.argv[1:])
    sys.exit(1 if main(sf, out, o) else 0)
