#!/usr/bin/env python3
"""Staged DuckDB oracle for q76_curation_pipeline at big SFs.

The one-query oracle's recursive closure CTE `reach(id, r)` materializes
every (member, reachable-seed) pair — quadratic in near-dup cluster size.
It passes at sf1 but temp-fills the disk at sf10 (r18: ~70 GB transient,
"No space left on device"), the same failure class oracle_q228.py solved
for q228.

Unlike oracle_q228.py (which transcribes its CTE text), this script does
SQL SURGERY on the COMMITTED oracle string itself (read from the Verify
dump's oracle_sql.json), so there is no second copy of the stopword list,
PII patterns, or shingle SQL to drift:

  1. edges  — the oracle text up through CTE `e`, executed as
              `... SELECT doc_a, doc_b FROM e` (and the docs_f node list);
  2. closure — exact union-find in Python over (nodes, edges), producing
              the `comp` table (id, component) the recursive CTE would;
  3. final  — the oracle text with ONLY the `sym`/`reach`/`comp` segment
              replaced by `comp AS (SELECT ... FROM read_parquet(...))`;
              everything before and after runs verbatim.

Stages run one-per-subprocess (a DuckDB temp-fill must not poison the
next stage's allocator).

Usage: python3 tools/oracle_q76.py <sfDir> <verifyOutDir> [workDir]
"""
import sys, os, math, subprocess
import duckdb

SYM_MARK = "sym AS"
# newline-anchored: a bare "nd AS" also matches inside "cand AS ("
ND_MARK = "\nnd AS"


def connect(sf):
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '90GB')}'")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '24')}")
    p = f"{sf}/documents.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")
    return con


def oracle_sql(vout):
    import json
    sql = json.load(open(f"{vout}/oracle_sql.json"))["q76_curation_pipeline"]
    i_sym, i_nd = sql.index(SYM_MARK), sql.index(ND_MARK)
    assert i_sym < i_nd, "oracle text changed shape; update the markers"
    return sql, i_sym, i_nd


def stage_edges(sf, vout, work):
    sql, i_sym, _ = oracle_sql(vout)
    # the prefix ends "...) >= 0.5),\n" — drop the trailing comma+ws
    prefix = sql[:i_sym].rstrip().rstrip(",")
    con = connect(sf)
    con.execute(f"COPY ({prefix} SELECT doc_a, doc_b FROM e) "
                f"TO '{work}/edges.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY ({prefix} SELECT doc_id FROM docs_f) "
                f"TO '{work}/nodes.parquet' (FORMAT PARQUET)")
    ne = con.execute(f"SELECT count(*) FROM '{work}/edges.parquet'").fetchone()
    nn = con.execute(f"SELECT count(*) FROM '{work}/nodes.parquet'").fetchone()
    print(f"[edges] {nn[0]} docs_f nodes, {ne[0]} near-dup edges")


def stage_closure(sf, work):
    con = connect(sf)
    ids = [r[0] for r in con.execute(
        f"SELECT doc_id FROM '{work}/nodes.parquet'").fetchall()]
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
    comp = pd.DataFrame({"id": ids, "component": [find(i) for i in ids]})
    con.execute(f"COPY (SELECT id, component FROM comp) "
                f"TO '{work}/comp.parquet' (FORMAT PARQUET)")
    nk = (comp["id"] == comp["component"]).sum()
    print(f"[closure] {len(ids)} nodes, {len(edges)} edges, {nk} keepers")


def stage_final(sf, vout, work):
    sql, i_sym, i_nd = oracle_sql(vout)
    surgered = (sql[:i_sym]
                + "comp AS (SELECT id, component FROM "
                + f"read_parquet('{work}/comp.parquet')),\n"
                + sql[i_nd + 1:])  # skip the marker's leading newline
    con = connect(sf)
    con.execute(f"COPY ({surgered}) TO '{work}/oracle_q76.parquet' "
                "(FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{work}/oracle_q76.parquet'").fetchone()
    print(f"[final] {n[0]} sampled fingerprint rows")


def compare(sf, vout, work):
    con = connect(sf)
    got = con.execute(
        f"SELECT * FROM '{vout}/q76_curation_pipeline/*.parquet'").fetchdf()
    exp = con.execute(f"SELECT * FROM '{work}/oracle_q76.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL q76: columns {list(got.columns)} != {list(exp.columns)}")
        return 1

    def norm(df):
        rows = []
        for r in df.itertuples(index=False):
            rows.append(tuple(
                repr(v) if not isinstance(v, float)
                else ("nan" if math.isnan(v) else repr(v)) for v in r))
        return sorted(rows)

    g, e = norm(got), norm(exp)
    if len(g) != len(e):
        print(f"FAIL q76: rowcount {len(g)} != {len(e)}")
        return 1
    if g != e:
        bad = sum(1 for a, b in zip(g, e) if a != b)
        print(f"FAIL q76: {bad}/{len(g)} rows differ")
        return 1
    print(f"PASS q76_curation_pipeline ({len(g)} rows, staged oracle)")
    return 0


def main():
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        stage, sf, vout, work = (sys.argv[i + 1], sys.argv[i + 2],
                                 sys.argv[i + 3], sys.argv[i + 4])
        if stage == "edges":
            stage_edges(sf, vout, work)
        elif stage == "closure":
            stage_closure(sf, work)
        elif stage == "final":
            stage_final(sf, vout, work)
        return 0
    sf, vout = sys.argv[1], sys.argv[2]
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/q76_oracle"
    os.makedirs(work, exist_ok=True)
    for stage in ("edges", "closure", "final"):
        r = subprocess.run([sys.executable, __file__, "--stage", stage,
                            sf, vout, work])
        if r.returncode != 0:
            print(f"ERR q76 oracle stage {stage} rc={r.returncode}")
            return 2
    return compare(sf, vout, work)


if __name__ == "__main__":
    sys.exit(main())
