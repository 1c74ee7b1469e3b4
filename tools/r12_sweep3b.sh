#!/bin/bash
# Redo of chunk g3b after the stream_outer_join_watermark oracle rewrite
# (the original chunk was killed mid-sweep: DuckDB planned the old
# mixed-predicate LEFT JOIN as a blockwise NL join and would have burned
# the whole timeout, taking win_gaps_islands down with it). Waits for
# sweep3 to finish so the two driver_sim processes never race on the
# shared /tmp/driver_sim_results.json incremental dump.
set -u
cd /root/repo
LOG=/tmp/r12_sweep3.log
while ! grep -q "SWEEP3 DONE" "$LOG" 2>/dev/null; do sleep 30; done
SF=/root/repo/.cache/sf10
MIN_FREE_KB=15000000
echo "=== chunk g3c start $(date +%T) free=$(df --output=avail / | tail -1)KB ===" >>"$LOG"
rm -f /tmp/driver_sim_results.json
rm -rf /tmp/duckdb_sim_spill
SPARK_GRAFT_ORACLE_MEM=16GB timeout 2400 \
  python tools/driver_sim.py "$SF" --only "win_gaps_islands,stream_outer_join_watermark" >>"$LOG" 2>&1 &
pid=$!
while kill -0 "$pid" 2>/dev/null; do
  free=$(df --output=avail / | tail -1)
  if [ "$free" -lt "$MIN_FREE_KB" ]; then
    echo "DISK-KILL chunk g3c free=${free}KB $(date +%T)" >>"$LOG"
    kill -9 "$pid" 2>/dev/null
    pkill -9 -f "driver_sim.py $SF" 2>/dev/null
    break
  fi
  sleep 15
done
wait "$pid" 2>/dev/null
rc=$?
[ -f /tmp/driver_sim_results.json ] && cp /tmp/driver_sim_results.json /tmp/r12_g3c.json
rm -rf /tmp/duckdb_sim_spill
echo "=== chunk g3c rc=$rc $(date +%T) ===" >>"$LOG"
echo "SWEEP3B DONE $(date +%T)" >>"$LOG"
