#!/usr/bin/env python3
"""Chunked DuckDB oracle for q87_jaccard at big SFs.

The one-query oracle's intersection join (33.6 M candidate pairs at sf10
joined twice against ~30 M shingle rows) exceeds the single-box envelope
— OOM-killed at 97 GB RSS under a 90 GB memory_limit (SCALE_NOTES r18).
The join is embarrassingly partitionable on doc_a, so this script runs
the COMMITTED oracle semantics in bounded passes:

  1. materialize the shared prefix ONCE (sh / cand / sz — each fits; the
     cand enumeration is exactly q86's oracle, which PASSes at sf10);
  2. N intersection+jaccard passes, pass k restricted to
     `doc_a % N = k` — peak memory ~1/N of the one-shot join;
  3. compare the union of the chunk outputs against the engine parquet.

Usage: python3 tools/oracle_q87_chunked.py <sfDir> <verifyOutDir>
         [workDir] [chunks]
Each DuckDB stage runs in its own subprocess (temp-fill isolation).
"""
import sys, os, math, subprocess
import duckdb

PREFIX = r"""WITH base AS (SELECT doc_id, trim(text) AS t FROM documents),
wp AS (
  SELECT doc_id,
    UNNEST(string_split_regex(t, '\s+')) AS word,
    UNNEST(range(len(string_split_regex(t, '\s+')))) AS pos
  FROM base),
sh AS (SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
    word || ' ' || LEAD(word,1) OVER w || ' ' || LEAD(word,2) OVER w AS shingle
  FROM wp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY shingle IS NOT NULL)),
m AS (
  SELECT doc_id, s.i,
    MIN(md5(CAST(s.i AS VARCHAR) || '|' || shingle)) AS h
  FROM sh CROSS JOIN (SELECT UNNEST(range(8)) AS i) s
  GROUP BY doc_id, s.i),
bands AS (
  SELECT doc_id, i // 2 AS band, md5(STRING_AGG(h, '' ORDER BY i)) AS bk
  FROM m GROUP BY doc_id, i // 2),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)"""

CHUNK_SQL = """WITH cand AS (
  SELECT doc_a, doc_b FROM read_parquet('{work}/cand.parquet')
  WHERE doc_a % {n} = {k}),
sh AS (SELECT doc_id, shingle FROM read_parquet('{work}/sh.parquet')),
sz AS (SELECT doc_id, sz FROM read_parquet('{work}/sz.parquet')),
i AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT c.doc_a, c.doc_b,
  CAST(COALESCE(i.inter, 0) AS DOUBLE)
    / CAST(sa.sz + sb.sz - COALESCE(i.inter, 0) AS DOUBLE) AS jac
FROM cand c
LEFT JOIN i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sz sa ON sa.doc_id = c.doc_a
JOIN sz sb ON sb.doc_id = c.doc_b"""


def connect(sf):
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '60GB')}'")
    con.execute(f"SET threads={os.environ.get('DUCKDB_THREADS', '24')}")
    p = f"{sf}/documents.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")
    return con


def stage_prefix(sf, work):
    con = connect(sf)
    for name, sel in [("sh", "SELECT doc_id, shingle FROM sh"),
                      ("cand", "SELECT doc_a, doc_b FROM cand"),
                      ("sz", "SELECT doc_id, sz FROM sz")]:
        con.execute(f"COPY ({PREFIX} {sel}) TO '{work}/{name}.parquet' "
                    "(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{work}/{name}.parquet'").fetchone()
        print(f"[prefix] {name}: {n[0]} rows")


def stage_chunk(sf, work, n, k):
    con = connect(sf)
    sql = CHUNK_SQL.format(work=work, n=n, k=k)
    con.execute(f"COPY ({sql}) TO '{work}/chunk_{k}.parquet' "
                "(FORMAT PARQUET)")
    c = con.execute(
        f"SELECT count(*) FROM '{work}/chunk_{k}.parquet'").fetchone()
    print(f"[chunk {k}/{n}] {c[0]} pair rows")


def compare(sf, vout, work, n):
    con = connect(sf)
    got = con.execute(
        f"SELECT * FROM '{vout}/q87_jaccard/*.parquet'").fetchdf()
    exp = con.execute(
        f"SELECT * FROM read_parquet('{work}/chunk_*.parquet')").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL q87: columns {list(got.columns)} != {list(exp.columns)}")
        return 1

    def norm(df):
        return sorted(
            tuple("nan" if isinstance(v, float) and math.isnan(v) else repr(v)
                  for v in r)
            for r in df.itertuples(index=False))

    g, e = norm(got), norm(exp)
    if len(g) != len(e):
        print(f"FAIL q87: rowcount {len(g)} != {len(e)}")
        return 1
    if g != e:
        bad = sum(1 for a, b in zip(g, e) if a != b)
        print(f"FAIL q87: {bad}/{len(g)} rows differ")
        return 1
    print(f"PASS q87_jaccard ({len(g)} rows, chunked oracle, {n} passes)")
    return 0


def main():
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        stage = sys.argv[i + 1]
        if stage == "prefix":
            stage_prefix(sys.argv[i + 2], sys.argv[i + 3])
        else:  # chunk k
            stage_chunk(sys.argv[i + 2], sys.argv[i + 3],
                        int(sys.argv[i + 4]), int(sys.argv[i + 5]))
        return 0
    sf, vout = sys.argv[1], sys.argv[2]
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/q87_oracle"
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    os.makedirs(work, exist_ok=True)
    r = subprocess.run([sys.executable, __file__, "--stage", "prefix",
                        sf, work])
    if r.returncode != 0:
        print(f"ERR q87 oracle prefix stage rc={r.returncode}")
        return 2
    for k in range(n):
        r = subprocess.run([sys.executable, __file__, "--stage", "chunk",
                            sf, work, str(n), str(k)])
        if r.returncode != 0:
            print(f"ERR q87 oracle chunk {k} rc={r.returncode}")
            return 2
    return compare(sf, vout, work, n)


if __name__ == "__main__":
    sys.exit(main())
