#!/bin/bash
# x_dedup_chunk_cdc last-chance retry at an 80GB oracle (the 40GB run
# died 671s in on an unspillable 8KB bad_alloc — the limit acts as a
# hard accounting cap, not a spill trigger, for that operator). The box
# has 128GB; the engine side finishes before DuckDB starts, so the only
# concurrent JVM is idle. A second bad_alloc here is the documented
# oracle-infeasible verdict.
set -u
cd /root/repo
LOG=/tmp/r12_sweep3.log
while ! grep -q "SWEEP3C DONE" "$LOG" 2>/dev/null; do sleep 30; done
SF=/root/repo/.cache/sf10
MIN_FREE_KB=15000000
echo "=== chunk cdc80 start $(date +%T) free=$(df --output=avail / | tail -1)KB ===" >>"$LOG"
rm -f /tmp/driver_sim_results.json
rm -rf /tmp/duckdb_sim_spill
SPARK_GRAFT_ORACLE_MEM=80GB timeout 2400 \
  python tools/driver_sim.py "$SF" --only "x_dedup_chunk_cdc" >>"$LOG" 2>&1 &
pid=$!
while kill -0 "$pid" 2>/dev/null; do
  free=$(df --output=avail / | tail -1)
  if [ "$free" -lt "$MIN_FREE_KB" ]; then
    echo "DISK-KILL chunk cdc80 free=${free}KB $(date +%T)" >>"$LOG"
    kill -9 "$pid" 2>/dev/null
    pkill -9 -f "driver_sim.py $SF" 2>/dev/null
    break
  fi
  sleep 15
done
wait "$pid" 2>/dev/null
rc=$?
[ -f /tmp/driver_sim_results.json ] && cp /tmp/driver_sim_results.json /tmp/r12_cdc80.json
rm -rf /tmp/duckdb_sim_spill
echo "=== chunk cdc80 rc=$rc $(date +%T) ===" >>"$LOG"
echo "SWEEP3D DONE $(date +%T)" >>"$LOG"
