#!/usr/bin/env python3
"""Staged DuckDB oracle for q228_curation_dedup_pipeline at big SFs.

The one-query oracle (SparkEntry.oracleSql) is DuckDB-infeasible at sf1:
its recursive closure CTE `reach(id, r)` materializes every (member,
reachable-seed) pair, quadratic in near-dup cluster size — four attempts
filled the VM's 58 GB temp disk (SCALE_NOTES r15). The SPEC, however,
decomposes exactly (r15 verdict Next #4): this script runs the same three
stages with the closure replaced by an exact union-find —

  1. near-dup edges (jaccard >= 0.5)  — the oracle's WordsCte/MinhashCte/
     sz/i/e SQL verbatim, one DuckDB process, result to parquet;
  2. connected components / keepers   — exact union-find in Python over
     the edge list + all doc_ids (keeper = min doc_id per component);
  3. ExactSubstr cut-and-stitch       — q226's oracle SQL verbatim,
     restricted to keepers, a fresh DuckDB process (the established
     one-query-per-process isolation policy).

Then compares against the engine result parquet (graft.Verify output)
with tools/compare.py's normalization (columns sorted by name, rows
sorted, exact repr values).

Usage: python3 tools/oracle_q228.py <sfDir> <verifyOutDir> [workDir]
  e.g. python3 tools/oracle_q228.py /tmp/sf1 /tmp/vout_sf1
Stages run in subprocesses (oracle_q228.py --stage {edges,stitch} ...)
so a DuckDB temp-fill in one stage cannot poison another's allocator.
"""
import sys, os, math, subprocess
import duckdb

WORDS_CTE = r"""base AS (SELECT doc_id, trim(text) AS t FROM documents),
wp AS (
  SELECT doc_id,
    UNNEST(string_split_regex(t, '\s+')) AS word,
    UNNEST(range(len(string_split_regex(t, '\s+')))) AS pos
  FROM base),
sh AS (SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id,
    word || ' ' || LEAD(word,1) OVER w || ' ' || LEAD(word,2) OVER w AS shingle
  FROM wp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY shingle IS NOT NULL))"""

MINHASH_CTE = WORDS_CTE + r""",
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
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)"""

EDGES_SQL = "WITH " + MINHASH_CTE + r""",
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
i AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b),
e AS (
  SELECT i.doc_a, i.doc_b
  FROM i
  JOIN sz sa ON sa.doc_id = i.doc_a
  JOIN sz sb ON sb.doc_id = i.doc_b
  WHERE CAST(i.inter AS DOUBLE)
    / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) >= 0.5)
SELECT doc_a, doc_b FROM e"""

# q226's cut-and-stitch verbatim, with the corpus restricted to keepers
STITCH_SQL = r"""WITH keep AS (SELECT doc_id FROM '{keepers}'),
base AS (SELECT doc_id, trim(text) AS t FROM documents),
kbase AS (SELECT base.* FROM base JOIN keep USING (doc_id)),
tw AS (SELECT doc_id,
  list_filter(string_split_regex(t, '\s+'), x -> length(x) > 0) AS w
  FROM kbase),
gp AS (SELECT doc_id, w,
  UNNEST(range(greatest(len(w) - 7, 0))) AS gpos FROM tw),
gr AS (SELECT doc_id, gpos,
  array_to_string(w[gpos+1:gpos+8], ' ') AS gram FROM gp),
dup AS (SELECT gram, min(doc_id) AS keeper FROM gr
  GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
rem AS (SELECT DISTINCT g.doc_id, g.gpos + j.j AS pos
  FROM gr g JOIN dup d USING (gram), range(8) j(j)
  WHERE g.doc_id <> d.keeper),
tp0 AS (SELECT doc_id, w, UNNEST(range(len(w))) AS pos FROM tw),
tp AS (SELECT doc_id, pos, w[pos+1] AS word FROM tp0),
kept AS (SELECT tp.doc_id, tp.pos, tp.word
  FROM tp ANTI JOIN rem USING (doc_id, pos)),
ck AS (SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text_clean,
  COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
SELECT b.doc_id, COALESCE(ck.text_clean, '') AS text_clean,
  CAST(len(w) - COALESCE(ck.n_kept, 0) AS BIGINT) AS n_removed
FROM kbase b JOIN tw USING (doc_id) LEFT JOIN ck USING (doc_id)
ORDER BY b.doc_id"""


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


def stage_edges(sf, work):
    con = connect(sf)
    con.execute(
        f"COPY ({EDGES_SQL}) TO '{work}/edges.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{work}/edges.parquet'").fetchone()
    print(f"[edges] {n[0]} near-dup edges")


def stage_closure(sf, work):
    """Exact union-find: keeper = min doc_id per connected component."""
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
            # union by min id so the root IS the component's keeper
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    keepers = sorted(i for i in ids if find(i) == i)
    import pandas as pd
    kdf = pd.DataFrame({"doc_id": keepers})
    con.execute(
        f"COPY (SELECT doc_id FROM kdf) TO '{work}/keepers.parquet' "
        "(FORMAT PARQUET)")
    print(f"[closure] {len(ids)} docs, {len(edges)} edges, "
          f"{len(keepers)} keepers")


def stage_stitch(sf, work):
    con = connect(sf)
    sql = STITCH_SQL.format(keepers=f"{work}/keepers.parquet")
    con.execute(
        f"COPY ({sql}) TO '{work}/oracle_q228.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{work}/oracle_q228.parquet'").fetchone()
    print(f"[stitch] {n[0]} cleaned keeper docs")


def compare(sf, vout, work):
    con = connect(sf)
    got = con.execute(
        f"SELECT * FROM '{vout}/q228_curation_dedup_pipeline/*.parquet'"
    ).fetchdf()
    exp = con.execute(
        f"SELECT * FROM '{work}/oracle_q228.parquet'").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL q228: columns {list(got.columns)} != {list(exp.columns)}")
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
        print(f"FAIL q228: rowcount {len(g)} != {len(e)}")
        return 1
    if g != e:
        bad = sum(1 for a, b in zip(g, e) if a != b)
        print(f"FAIL q228: {bad}/{len(g)} rows differ")
        for a, b in zip(g, e):
            if a != b:
                print(f"  got {a[:2]}...\n  exp {b[:2]}...")
                break
        return 1
    print(f"PASS q228_curation_dedup_pipeline ({len(g)} rows, staged oracle)")
    return 0


def main():
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        stage, sf, work = sys.argv[i + 1], sys.argv[i + 2], sys.argv[i + 3]
        {"edges": stage_edges, "closure": stage_closure,
         "stitch": stage_stitch}[stage](sf, work)
        return 0
    sf, vout = sys.argv[1], sys.argv[2]
    work = sys.argv[3] if len(sys.argv) > 3 else "/tmp/q228_oracle"
    os.makedirs(work, exist_ok=True)
    for stage in ("edges", "closure", "stitch"):
        r = subprocess.run([sys.executable, __file__, "--stage", stage,
                            sf, work])
        if r.returncode != 0:
            print(f"FATAL: stage {stage} failed rc={r.returncode}")
            return 2
    return compare(sf, vout, work)


if __name__ == "__main__":
    sys.exit(main())
