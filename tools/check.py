#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify first
(writes <out>/<name>.parquet + oracle_sql.json), then this script runs each
oracle SQL in DuckDB over the same testdata parquet and compares.

Usage: python3 tools/check.py [sfdir] [outdir]
"""
import json, sys, glob, os, signal
import duckdb
import pyarrow.parquet as pq

# `check.py ... | head` must not die in a BrokenPipeError stack trace
signal.signal(signal.SIGPIPE, signal.SIG_DFL)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
dumped = sorted(d.split("/")[-1] for d in glob.glob(f"{OUT}/*") if os.path.isdir(d))
# The query list is NOT just whatever dirs exist: the manifest Verify
# writes (the attempted registry) is authoritative, so a query whose
# output dir — even the __error artifact — never materialized shows up as
# an explicit FAIL instead of silently dropping out of the report.
# oracle_sql.json always carries ALL oracle keys (even on a restricted
# `Verify <sf> <out> <names...>` run), so only union it in when the
# manifest says this was a full-registry run — otherwise a local
# single-query iteration would "fail" every query it didn't run.
try:
    manifest = set(json.load(open(f"{OUT}/manifest.json")))
except FileNotFoundError:
    manifest = None
    print("WARN: no manifest.json in output dir (old Verify?)", file=sys.stderr)
expected = set(dumped) | (manifest or set())
if manifest is None or len(manifest) >= len(oracle):
    expected |= set(oracle)
names = sorted(expected)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails, passes, rows_only = [], [], []
for name in names:
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"));  continue
    got = pq.ParquetDataset(f"{OUT}/{name}").read().to_pandas()
    # An __error artifact is Verify reporting the query THREW — always a
    # FAIL, even for rows-only queries (it would otherwise count as a
    # passing 1-row result).
    if "__error" in got.columns:
        msg = got["__error"].iloc[0] if len(got) else "?"
        fails.append((name, f"query threw: {msg}"));  continue
    if name not in oracle:
        rows_only.append((name, len(got)));  continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"));  continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"columns: spark={list(g.columns)} oracle={list(e.columns)}"));  continue
    if len(g) != len(e):
        fails.append((name, f"rowcount: spark={len(g)} oracle={len(e)}"));  continue
    mismatch = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        try:
            eq = (gv == ev) | (gv.isna() & ev.isna())
        except Exception:
            eq = gv.astype(str) == ev.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = f"col {c} row {i}: spark={gv[i]!r} oracle={ev[i]!r} (dtype {gv.dtype}/{ev.dtype})"
            break
    if mismatch:
        fails.append((name, mismatch))
    else:
        # dtype sanity (hash compare may be strict)
        dt = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
              if str(g[c].dtype) != str(e[c].dtype)]
        passes.append((name, len(g), dt))

print(f"== PASS ({len(passes)}) ==")
for n, r, dt in passes:
    print(f"  {n}: {r} rows" + (f"  DTYPE-DIFF {dt}" if dt else ""))
print(f"== ROWS-ONLY ({len(rows_only)}) ==")
for n, r in rows_only:
    print(f"  {n}: {r} rows")
print(f"== FAIL ({len(fails)}) ==")
for n, m in fails:
    print(f"  {n}: {m}")
sys.exit(1 if fails else 0)
