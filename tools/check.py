#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run after graft.Verify has
written outDir/<name>.parquet + oracle_sql.json; compares each result against
DuckDB running the oracle SQL over the same sf tables.

Usage: python3 tools/check.py <sfDir> <outDir> [onlyQuery,...]

An optional third arg (or GRAFT_CHECK_ONLY env, comma-separated) restricts
the compare to the named queries — the full run re-derives every recursive
CTE oracle (~minutes); iterating on one new query shouldn't pay for all.

Every oracle's DuckDB wall time is printed. GRAFT_ORACLE_BUDGET_SEC (float,
default 60) fails any single oracle that exceeds the budget — a slow oracle
killed the driver's serialized round-3 gate (empty CORRECTNESS file), so
budget breaches are gate failures, not style notes.
"""
import sys, os, json, glob, time
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = (sys.argv[3] if len(sys.argv) > 3 else os.environ.get("GRAFT_CHECK_ONLY", ""))
only = {q for q in only.split(",") if q}
budget = float(os.environ.get("GRAFT_ORACLE_BUDGET_SEC", "60"))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize types: floats rounded repr, ints as int64 where possible
    out = {}
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            out[c] = s.astype(str)
        elif str(s.dtype).startswith("float"):
            out[c] = s.astype("float64").map(lambda v: repr(v))
        else:
            try:
                out[c] = s.astype("int64")
            except Exception:
                out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
# a query that THREW in Verify writes no result dir — that is a failure,
# not a pass (observed: 4 ann queries crashed and the gate stayed green)
present = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
# an `only` name matching neither an oracle nor an output dir would be
# silently skipped by both loops — a vacuously green run; fail it instead
for name in sorted(only - (set(oracles) | present)):
    print(f"{name:28s} UNKNOWN (not an oracle name and no output dir — typo?)")
    fails += 1
for name in sorted(set(oracles) - present):
    if only and name not in only:
        continue
    print(f"{name:28s} MISSING (query failed in Verify?)")
    fails += 1
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d) or (only and name not in only):
        continue
    # an empty result dir (query died mid-write, zero part files) must
    # report as a failure for THIS query, not crash the whole gate
    try:
        got = canon(con.sql(f"SELECT * FROM '{d}/*.parquet'").df())
    except Exception as e:
        print(f"{name:28s} RESULT READ ERROR: {str(e)[:160]}")
        fails += 1
        continue
    if name not in oracles:
        print(f"{name:28s} rows={len(got)} (no oracle; rows-only)")
        continue
    t0 = time.monotonic()
    try:
        exp = canon(con.sql(oracles[name]).df())
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {str(e)[:200]}")
        fails += 1
        continue
    osec = time.monotonic() - t0
    over = "" if osec <= budget else f" OVER-BUDGET({budget:g}s)"
    if over:
        fails += 1
    schema_ok = list(got.columns) == list(exp.columns)
    rows_ok = len(got) == len(exp)
    hash_ok = schema_ok and rows_ok and got.equals(exp)
    status = "OK" if hash_ok else "MISMATCH"
    print(f"{name:28s} rows={len(got)}/{len(exp)} schema={schema_ok} hash={hash_ok}"
          f" oracle_sec={osec:.2f} {status}{over}")
    if not hash_ok:
        fails += 1
        if schema_ok and rows_ok:
            neq = (got != exp).any(axis=1)
            print("  first diffs (got | exp):")
            print(pd.concat([got[neq].head(3), exp[neq].head(3)], axis=1).to_string()[:2000])
        else:
            print("  got cols:", list(got.columns), "exp cols:", list(exp.columns))
            print("  got head:", got.head(3).to_string()[:600])
            print("  exp head:", exp.head(3).to_string()[:600])
sys.exit(1 if fails else 0)
