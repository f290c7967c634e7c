#!/bin/bash
# Standing sf10 oracle sweep of the scale-routing family (r17 verdict #3):
# the sf1 sweep caught two latent defects the sf0.01 board could not see,
# and the execution-time LSH hot-bucket routing only ACTIVATES at sf10
# (max bucket 1592 > the 1024 threshold — 4 buckets route through the
# distributed-join branch there, zero at sf1). So the routing family gets
# a standing oracle gate at the SF where those branches actually run.
#
# Usage: tools/verify_sf10.sh [sf10Dir] [outDir]
#   1. regenerates sf10Dir via graft.tools.ScaleUp if missing (100x sf0.1)
#   2. graft.Verify dumps the 21 scale-sensitive queries at sf10
#   3. tools/compare.py runs each oracle ONE PER PROCESS with a per-query
#      timeout (a DuckDB temp-fill or hang must not take down the sweep);
#      rc=0 -> PASS, a printed FAIL -> FAIL (real value mismatch),
#      anything else (timeout 124, allocator crash) -> ERR
#   4. q228 runs through the staged oracle (tools/oracle_q228.py) — its
#      one-query recursive-CTE oracle is DuckDB-infeasible at big SFs
#   5. writes VERIFY_sf10.json {query: "PASS"|"FAIL"|"ERR"}; exits
#      non-zero when any cell is not PASS (gateable)
set -u
SF10="${1:-/tmp/sf10}"
OUT="${2:-/tmp/vout_sf10}"
TIMEOUT_S="${ORACLE_TIMEOUT:-2400}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -Xmx${SF10_MEM:-48g} -XX:ReservedCodeCacheSize=1g -XX:CICompilerCount=12 $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.sql.warehouse.dir=target/spark-warehouse -cp $CP"

# the same scale-routing family as tools/verify_sf1.sh
QUERIES=(q76_curation_pipeline q86_minhash_lsh q87_jaccard
  q88_simhash q89_simhash_neardup q92_ann_bucketed q92b_ann_adaptive
  q93_ann_multitable q94_cosine_dedup q94b_cosine_dedup_adaptive
  q98_ivf_ann q98b_ivf_trained q99_dedup_components q215_semdedup
  q217_fuzzy_join q218_quantile_grouped q223_terasort
  q224_terasort_scale q226_dedup_spans q227_ivf_two_level
  q228_curation_dedup_pipeline)

cd "$REPO"
if [ ! -e "$SF10/lineitem.parquet" ]; then
  echo "[verify_sf10] generating $SF10 via ScaleUp (100x sf0.1)"
  $JAVA graft.tools.ScaleUp /root/testdata/sf0.1 "$SF10" 100 || exit 2
fi

NAMES=$(IFS=,; echo "${QUERIES[*]}")
# VERIFY_SKIP_DUMP=1 reuses an existing engine dump (oracle-side iteration
# must not pay the ~50 min Spark dump again)
if [ "${VERIFY_SKIP_DUMP:-0}" != "1" ] || [ ! -e "$OUT/oracle_sql.json" ]; then
  rm -rf "$OUT"
  echo "[verify_sf10] dumping ${#QUERIES[@]} queries at $SF10"
  SPARK_GRAFT_CPUS=${SF10_CPUS:-32} $JAVA graft.Verify "$SF10" "$OUT" "$NAMES" \
    2>&1 | grep -E "\[verify\]" || true
else
  echo "[verify_sf10] reusing existing dump at $OUT"
fi

declare -A RESULT
PASS_N=0; FAIL_N=0; ERR_N=0; SKIP_N=0
# VERIFY_ONLY=q87_jaccard,q92_... re-oracles a subset against the reused
# dump (resume after an interrupted sweep); cells not in the subset are
# carried from VERIFY_PRIOR (a prior VERIFY_sf10.json) when given
ONLY="${VERIFY_ONLY:-}"
for q in "${QUERIES[@]}"; do
  if [ -n "$ONLY" ] && ! echo ",$ONLY," | grep -q ",$q,"; then
    prior=$(python3 -c "
import json,sys
try: print(json.load(open('${VERIFY_PRIOR:-/dev/null}'))['results']['$q'])
except Exception: print('SKIP')" 2>/dev/null)
    RESULT[$q]="${prior:-SKIP}"
    case "${RESULT[$q]}" in
      PASS) PASS_N=$((PASS_N+1));;
      FAIL) FAIL_N=$((FAIL_N+1));;
      SKIP) SKIP_N=$((SKIP_N+1));;
      *) ERR_N=$((ERR_N+1));;
    esac
    continue
  fi
  if [ "$q" = "q228_curation_dedup_pipeline" ] || \
     [ "$q" = "q76_curation_pipeline" ] || \
     [ "$q" = "q99_dedup_components" ]; then
    # these one-query oracles carry the recursive closure CTE,
    # DuckDB-infeasible at big SFs (q76 temp-filled ~70 GB at sf10) —
    # staged oracles replace only the closure with exact union-find
    case "$q" in
      q228_curation_dedup_pipeline)
        out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" timeout "$TIMEOUT_S" \
          python3 tools/oracle_q228.py "$SF10" "$OUT" /tmp/q228_oracle_sf10 2>&1);;
      q76_curation_pipeline)
        out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" timeout "$TIMEOUT_S" \
          python3 tools/oracle_q76.py "$SF10" "$OUT" /tmp/q76_oracle_sf10 2>&1);;
      q99_dedup_components)
        out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" timeout "$TIMEOUT_S" \
          python3 tools/oracle_q99.py "$SF10" "$OUT" /tmp/q99_oracle_sf10 2>&1);;
    esac
    rc=$?
    echo "$out" | grep -E "^(PASS|FAIL)" | head -2
    if [ $rc -eq 0 ]; then RESULT[$q]=PASS; PASS_N=$((PASS_N+1))
    elif echo "$out" | grep -q "^FAIL"; then RESULT[$q]=FAIL; FAIL_N=$((FAIL_N+1))
    else RESULT[$q]=ERR; ERR_N=$((ERR_N+1)); fi
  else
    out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" timeout "$TIMEOUT_S" \
      python3 tools/compare.py "$SF10" "$OUT" "$q" 2>&1)
    rc=$?
    echo "$out" | grep -E "^(PASS|FAIL|FATAL)" | head -2
    if [ $rc -eq 0 ]; then RESULT[$q]=PASS; PASS_N=$((PASS_N+1))
    elif echo "$out" | grep -q "^FAIL"; then RESULT[$q]=FAIL; FAIL_N=$((FAIL_N+1))
    else RESULT[$q]=ERR; ERR_N=$((ERR_N+1)); fi
  fi
done

{
  echo -n '{"sf":"'"$SF10"'","pass":'"$PASS_N"',"fail":'"$FAIL_N"',"err":'"$ERR_N"',"skip":'"$SKIP_N"',"results":{'
  first=1
  for q in "${QUERIES[@]}"; do
    [ $first -eq 0 ] && echo -n ','
    echo -n '"'"$q"'":"'"${RESULT[$q]}"'"'
    first=0
  done
  echo '}}'
} > "$REPO/VERIFY_sf10.json"
echo "[verify_sf10] wrote VERIFY_sf10.json: $PASS_N pass, $FAIL_N fail, $ERR_N err, $SKIP_N skip"
# SKIP cells (unlisted under VERIFY_ONLY with no/invalid prior) are a
# non-green gate too: a partial sweep must not read as passing.
[ $((FAIL_N + ERR_N + SKIP_N)) -eq 0 ] || exit 1
