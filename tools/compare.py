#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables and compare (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, math, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
# optional argv[3]: comma-separated query-name filter — big-SF rehearsals
# run ONE oracle per process so a DuckDB resource failure (temp-disk fill)
# can't poison the allocator for every later query in the same connection
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
con.execute("SET temp_directory='/tmp/duckdb_tmp'")
# rows are sorted before hashing anyway; dropping insertion-order
# preservation lets DuckDB stream blocking operators at far lower memory
con.execute("SET preserve_insertion_order=false")
con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '90GB')}'")
con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '24')}")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver SF dirs hold single-file tables; ScaleUp rehearsal dirs hold
    # Spark-written parquet DIRECTORIES — glob the parts in that case
    path = f"{sf}/{t}.parquet"
    pat = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
if only is not None:
    # an empty or misspelled filter must FAIL, not compare zero queries
    # and exit green having verified nothing
    unknown = only - set(oracle)
    if unknown or not (only & set(oracle)):
        print(f"FATAL: filter names not in oracle set: {sorted(unknown)}")
        sys.exit(2)
fails = 0
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark result dir"); fails += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM '{res_dir}/*.parquet'").fetchdf()
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        # infrastructure failure (temp-disk fill, allocator crash), not a
        # value mismatch — callers distinguish ERR from FAIL
        print(f"ERR {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
        fails += 1; continue
    if got.dtypes.tolist() != exp.dtypes.tolist():
        print(f"WARN {name}: dtypes {got.dtypes.tolist()} != {exp.dtypes.tolist()}")
    def norm(df):
        rows = []
        for r in df.itertuples(index=False):
            rows.append(tuple(
                repr(v) if not isinstance(v, float)
                else ("nan" if math.isnan(v) else repr(v)) for v in r))
        return sorted(rows)
    g, e = norm(got), norm(exp)
    if len(g) != len(e):
        print(f"FAIL {name}: rowcount {len(g)} != {len(e)}"); fails += 1; continue
    if g != e:
        bad = sum(1 for a, b in zip(g, e) if a != b)
        print(f"FAIL {name}: {bad}/{len(g)} rows differ")
        for a, b in list(zip(g, e))[:200]:
            if a != b:
                print(f"  got {a}\n  exp {b}"); break
        fails += 1; continue
    print(f"PASS {name} ({len(g)} rows)")
compared = len(only & set(oracle)) if only is not None else len(oracle)
print(f"\n{compared - fails}/{compared} queries pass")
sys.exit(1 if fails else 0)
