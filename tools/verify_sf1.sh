#!/bin/bash
# Standing sf1 oracle sweep of the scale-routing family (r15 verdict #8:
# the r15 sweep caught a real SF-bounded oracle defect — q215's hardcoded
# IVF exemplar count — so the sweep is institutionalized: re-run each
# round on final code, artifact committed as VERIFY_sf1.json).
#
# Usage: tools/verify_sf1.sh [sf1Dir] [outDir]
#   1. regenerates sf1Dir via graft.tools.ScaleUp if missing
#   2. graft.Verify dumps the ~21 scale-sensitive queries at sf1
#   3. tools/compare.py runs each oracle ONE PER PROCESS (a DuckDB
#      temp-fill must not poison the allocator for later queries)
#   4. q228 runs through the staged oracle (tools/oracle_q228.py) — its
#      one-query recursive-CTE oracle is DuckDB-infeasible at sf1
#   5. writes VERIFY_sf1.json {query: "PASS"|"FAIL"|"ERR"}
set -u
SF1="${1:-/tmp/sf1}"
OUT="${2:-/tmp/vout_sf1}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -Xmx${SF1_MEM:-48g} -XX:ReservedCodeCacheSize=1g -XX:CICompilerCount=12 $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.sql.warehouse.dir=target/spark-warehouse -cp $CP"

# the scale-routing family (SCALE_NOTES VERIFY_sf1 section): LSH routing,
# CC closure, ANN adaptive/IVF, SemDeDup, fuzzy join, quantile, terasort
# certificates, ExactSubstr, end-to-end pipelines
QUERIES=(q76_curation_pipeline q86_minhash_lsh q87_jaccard
  q88_simhash q89_simhash_neardup q92_ann_bucketed q92b_ann_adaptive
  q93_ann_multitable q94_cosine_dedup q94b_cosine_dedup_adaptive
  q98_ivf_ann q98b_ivf_trained q99_dedup_components q215_semdedup
  q217_fuzzy_join q218_quantile_grouped q223_terasort
  q224_terasort_scale q226_dedup_spans q227_ivf_two_level
  q228_curation_dedup_pipeline)

cd "$REPO"
if [ ! -e "$SF1/lineitem.parquet" ]; then
  echo "[verify_sf1] generating $SF1 via ScaleUp (10x sf0.1)"
  $JAVA graft.tools.ScaleUp /root/testdata/sf0.1 "$SF1" 10 || exit 2
fi

NAMES=$(IFS=,; echo "${QUERIES[*]}")
rm -rf "$OUT"
echo "[verify_sf1] dumping ${#QUERIES[@]} queries at $SF1"
SPARK_GRAFT_CPUS=${SF1_CPUS:-32} $JAVA graft.Verify "$SF1" "$OUT" "$NAMES" \
  2>&1 | grep -E "\[verify\]" || true

declare -A RESULT
for q in "${QUERIES[@]}"; do
  if [ "$q" = "q228_curation_dedup_pipeline" ]; then
    # staged oracle: the one-query recursive closure fills temp at sf1
    if DUCKDB_THREADS="${DUCKDB_THREADS:-16}" python3 tools/oracle_q228.py \
        "$SF1" "$OUT" /tmp/q228_oracle_sf1; then
      RESULT[$q]=PASS
    else RESULT[$q]=FAIL; fi
  else
    out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" python3 tools/compare.py \
      "$SF1" "$OUT" "$q" 2>&1)
    rc=$?
    echo "$out" | grep -E "^(PASS|FAIL|FATAL)" | head -2
    if [ $rc -eq 0 ]; then RESULT[$q]=PASS
    elif echo "$out" | grep -q "^FAIL"; then RESULT[$q]=FAIL
    else RESULT[$q]=ERR; fi
  fi
done

{
  echo -n '{"sf":"'"$SF1"'","results":{'
  first=1
  for q in "${QUERIES[@]}"; do
    [ $first -eq 0 ] && echo -n ','
    echo -n '"'"$q"'":"'"${RESULT[$q]}"'"'
    first=0
  done
  echo '}}'
} > "$REPO/VERIFY_sf1.json"
echo "[verify_sf1] wrote VERIFY_sf1.json"
grep -o '"q[^"]*":"[A-Z]*"' "$REPO/VERIFY_sf1.json" | grep -cv PASS | \
  xargs -I{} echo "[verify_sf1] non-PASS cells: {}"
