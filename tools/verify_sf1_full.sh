#!/bin/bash
# FULL-210 sf1 oracle sweep (r16): the standing 21-query scale-routing
# sweep (tools/verify_sf1.sh) is extended to the entire query surface —
# the r15 sweep caught an SF-bounded oracle defect the sf0.01 board could
# not see, so the whole board gets the same 10×-the-driver's-SF check.
#
# Usage: tools/verify_sf1_full.sh [sf1Dir] [outDir]
#   1. regenerates sf1Dir via graft.tools.ScaleUp if missing
#   2. graft.Verify dumps ALL queries at sf1 (no name filter)
#   3. tools/compare.py runs each oracle ONE PER PROCESS (a DuckDB
#      temp-fill must not poison the allocator for later queries), with a
#      per-query timeout so one pathological oracle can't hang the sweep
#   4. q228 runs through the staged oracle (tools/oracle_q228.py) — its
#      one-query recursive-CTE oracle is DuckDB-infeasible at sf1
#   5. writes VERIFY_sf1_full.json {query: "PASS"|"FAIL"|"ERR"}
set -u
SF1="${1:-/tmp/sf1}"
OUT="${2:-/tmp/vout_sf1_full}"
TIMEOUT_S="${ORACLE_TIMEOUT:-900}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
JAVA="java -Xmx${SF1_MEM:-48g} -XX:ReservedCodeCacheSize=1g -XX:CICompilerCount=12 $ADD_OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Dspark.sql.warehouse.dir=target/spark-warehouse -cp $CP"

cd "$REPO"
if [ ! -e "$SF1/lineitem.parquet" ]; then
  echo "[verify_sf1_full] generating $SF1 via ScaleUp (10x sf0.1)"
  $JAVA graft.tools.ScaleUp /root/testdata/sf0.1 "$SF1" 10 || exit 2
fi

rm -rf "$OUT"
echo "[verify_sf1_full] dumping ALL queries at $SF1"
SPARK_GRAFT_CPUS=${SF1_CPUS:-32} $JAVA graft.Verify "$SF1" "$OUT" \
  2>&1 | grep -E "\[verify\]" || true

# enumerate from the dumped oracle set — the authoritative list
QUERIES=$(python3 -c "
import json
print('\n'.join(sorted(json.load(open('$OUT/oracle_sql.json')))))")

declare -A RESULT
PASS_N=0; FAIL_N=0; ERR_N=0
for q in $QUERIES; do
  if [ "$q" = "q228_curation_dedup_pipeline" ]; then
    # same FAIL/ERR distinction as the compare.py branch: rc=0 → PASS; a
    # printed FAIL marker → FAIL (a real value mismatch); anything else
    # (timeout 124, a crash inside the staged oracle) → ERR, so automation
    # can tell "wrong answer" from "oracle infrastructure problem"
    out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" timeout "$TIMEOUT_S" \
      python3 tools/oracle_q228.py "$SF1" "$OUT" /tmp/q228_oracle_sf1 2>&1)
    rc=$?
    echo "$out" | grep -E "^(PASS|FAIL)" | head -2
    if [ $rc -eq 0 ]; then RESULT[$q]=PASS; PASS_N=$((PASS_N+1))
    elif echo "$out" | grep -q "^FAIL"; then RESULT[$q]=FAIL; FAIL_N=$((FAIL_N+1))
    else RESULT[$q]=ERR; ERR_N=$((ERR_N+1)); fi
  else
    out=$(DUCKDB_THREADS="${DUCKDB_THREADS:-16}" timeout "$TIMEOUT_S" \
      python3 tools/compare.py "$SF1" "$OUT" "$q" 2>&1)
    rc=$?
    echo "$out" | grep -E "^(PASS|FAIL|FATAL)" | head -2
    if [ $rc -eq 0 ]; then RESULT[$q]=PASS; PASS_N=$((PASS_N+1))
    elif echo "$out" | grep -q "^FAIL"; then RESULT[$q]=FAIL; FAIL_N=$((FAIL_N+1))
    else RESULT[$q]=ERR; ERR_N=$((ERR_N+1)); fi
  fi
done

{
  echo -n '{"sf":"'"$SF1"'","pass":'"$PASS_N"',"fail":'"$FAIL_N"',"err":'"$ERR_N"',"results":{'
  first=1
  for q in $QUERIES; do
    [ $first -eq 0 ] && echo -n ','
    echo -n '"'"$q"'":"'"${RESULT[$q]}"'"'
    first=0
  done
  echo '}}'
} > "$REPO/VERIFY_sf1_full.json"
echo "[verify_sf1_full] wrote VERIFY_sf1_full.json: $PASS_N pass, $FAIL_N fail, $ERR_N err"
# gateable exit status: any FAIL or ERR is a red sweep
[ $((FAIL_N + ERR_N)) -eq 0 ] || exit 1
