#!/bin/bash
# x_text_keyphrase_rake retry at a 40GB oracle: the s3 chunk's 16GB
# DuckDB limit hit bad_alloc (an operator in the RAKE oracle cannot
# spill); same pattern as the o1/o2 retries. Waits for sweep3b so
# driver_sim processes never overlap.
set -u
cd /root/repo
LOG=/tmp/r12_sweep3.log
while ! grep -q "SWEEP3B DONE" "$LOG" 2>/dev/null; do sleep 30; done
SF=/root/repo/.cache/sf10
MIN_FREE_KB=15000000
echo "=== chunk rake40 start $(date +%T) free=$(df --output=avail / | tail -1)KB ===" >>"$LOG"
rm -f /tmp/driver_sim_results.json
rm -rf /tmp/duckdb_sim_spill
SPARK_GRAFT_ORACLE_MEM=40GB timeout 2400 \
  python tools/driver_sim.py "$SF" --only "x_text_keyphrase_rake" >>"$LOG" 2>&1 &
pid=$!
while kill -0 "$pid" 2>/dev/null; do
  free=$(df --output=avail / | tail -1)
  if [ "$free" -lt "$MIN_FREE_KB" ]; then
    echo "DISK-KILL chunk rake40 free=${free}KB $(date +%T)" >>"$LOG"
    kill -9 "$pid" 2>/dev/null
    pkill -9 -f "driver_sim.py $SF" 2>/dev/null
    break
  fi
  sleep 15
done
wait "$pid" 2>/dev/null
rc=$?
[ -f /tmp/driver_sim_results.json ] && cp /tmp/driver_sim_results.json /tmp/r12_rake40.json
rm -rf /tmp/duckdb_sim_spill
echo "=== chunk rake40 rc=$rc $(date +%T) ===" >>"$LOG"
echo "SWEEP3C DONE $(date +%T)" >>"$LOG"
