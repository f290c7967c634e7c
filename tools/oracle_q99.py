#!/usr/bin/env python3
"""Staged DuckDB oracle for q99_dedup_components at big SFs — the same
surgery as tools/oracle_q76.py (whose docstring has the full rationale):
the committed oracle text's minhash/candidate/jaccard prefix runs
verbatim in DuckDB; ONLY the recursive `reach` closure is replaced by an
exact Python union-find. q99's tail is the closure aggregation itself,
so the final result is computed directly from the union-find labels.

Usage: python3 tools/oracle_q99.py <sfDir> <verifyOutDir> [workDir]
"""
import sys, os, math, subprocess
import duckdb

SYM_MARK = "sym AS"


def connect(sf):
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '80GB')}'")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '24')}")
    p = f"{sf}/documents.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")
    return con


def prefix_sql(vout):
    import json
    sql = json.load(open(f"{vout}/oracle_sql.json"))["q99_dedup_components"]
    return sql[:sql.index(SYM_MARK)].rstrip().rstrip(",")


def stage_edges(sf, vout, work):
    con = connect(sf)
    pre = prefix_sql(vout)
    con.execute(f"COPY ({pre} SELECT doc_a, doc_b FROM e) "
                f"TO '{work}/edges.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{work}/edges.parquet'").fetchone()
    print(f"[edges] {n[0]} near-dup edges")


def stage_closure_and_compare(sf, vout, work):
    con = connect(sf)
    ids = [r[0] for r in con.execute(
        "SELECT doc_id FROM documents").fetchall()]
    parent = {i: i for i in ids}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    edges = con.execute(
        f"SELECT doc_a, doc_b FROM '{work}/edges.parquet'").fetchall()
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    import pandas as pd
    comp = pd.DataFrame({
        "doc_id": ids,
        "component": [find(i) for i in ids]})
    comp["is_keeper"] = (comp["doc_id"] == comp["component"]).astype("int32")
    got = con.execute(
        f"SELECT * FROM '{vout}/q99_dedup_components/*.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = comp.reindex(sorted(comp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL q99: columns {list(got.columns)} != {list(exp.columns)}")
        return 1

    def norm(df):
        return sorted(
            tuple(repr(int(v)) if not isinstance(v, float)
                  else ("nan" if math.isnan(v) else repr(v)) for v in r)
            for r in df.itertuples(index=False))

    g, e = norm(got), norm(exp)
    if len(g) != len(e):
        print(f"FAIL q99: rowcount {len(g)} != {len(e)}")
        return 1
    if g != e:
        bad = sum(1 for a, b in zip(g, e) if a != b)
        print(f"FAIL q99: {bad}/{len(g)} rows differ")
        return 1
    print(f"PASS q99_dedup_components ({len(g)} rows, staged oracle)")
    return 0


def main():
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        _, sf, vout, work = (sys.argv[i + 1], sys.argv[i + 2],
                             sys.argv[i + 3], sys.argv[i + 4])
        stage_edges(sf, vout, work)
        return 0
    sf, vout = sys.argv[1], sys.argv[2]
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/q99_oracle"
    os.makedirs(work, exist_ok=True)
    r = subprocess.run([sys.executable, __file__, "--stage", "edges",
                        sf, vout, work])
    if r.returncode != 0:
        print(f"ERR q99 oracle edges stage rc={r.returncode}")
        return 2
    return stage_closure_and_compare(sf, vout, work)


if __name__ == "__main__":
    sys.exit(main())
