#!/bin/bash
# Round-12 sf10 census sweep v3 — the v2 remainder. v2 lessons applied:
#  * WAIT for disk to recover before starting each chunk. v2's cascade
#    failure: d1's oracle spill dropped free below the kill floor, and
#    every later chunk was insta-killed at start because the check ran
#    before the kernel released the killed process's deleted-open spill
#    files. A start gate (free > START_FREE_KB, 10-min grace) makes each
#    chunk's verdict its own, not the previous chunk's.
#  * One query per chunk in the dedup/graph families, so a DISK-KILL or
#    bad_alloc names exactly one query (the oracle-infeasibility signal
#    feeding tools/sf10_oracle_infeasible.json) and completed evidence
#    is never lost with it.
#  * The two v2 DuckDB bad_alloc rows (x_text_dedup_spans,
#    x_sim_ann_ivf_pq) retry once at a 40GB oracle limit before any
#    infeasible verdict.
set -u
cd /root/repo
SF=/root/repo/.cache/sf10
LOG=/tmp/r12_sweep3.log
MIN_FREE_KB=15000000    # 15 GB kill floor (the r10 bench-killer guard)
START_FREE_KB=40000000  # 40 GB start gate

wait_disk() {
  local deadline=$((SECONDS + 600))
  while [ "$(df --output=avail / | tail -1)" -lt "$START_FREE_KB" ]; do
    if [ "$SECONDS" -ge "$deadline" ]; then
      echo "DISK-WAIT-TIMEOUT free=$(df --output=avail / | tail -1)KB $(date +%T)" >>"$LOG"
      return 1
    fi
    sleep 10
  done
  return 0
}

run_chunk() {
  local name="$1" timeout_s="$2" oracle_mem="$3" queries="$4"
  wait_disk || { echo "=== chunk $name SKIPPED (disk) ===" >>"$LOG"; return; }
  echo "=== chunk $name start $(date +%T) free=$(df --output=avail / | tail -1)KB ===" >>"$LOG"
  rm -f /tmp/driver_sim_results.json
  rm -rf /tmp/duckdb_sim_spill
  SPARK_GRAFT_ORACLE_MEM="$oracle_mem" timeout "$timeout_s" \
    python tools/driver_sim.py "$SF" --only "$queries" >>"$LOG" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    local free
    free=$(df --output=avail / | tail -1)
    if [ "$free" -lt "$MIN_FREE_KB" ]; then
      echo "DISK-KILL chunk $name free=${free}KB $(date +%T)" >>"$LOG"
      kill -9 "$pid" 2>/dev/null
      pkill -9 -f "driver_sim.py $SF" 2>/dev/null
      break
    fi
    sleep 15
  done
  wait "$pid" 2>/dev/null
  local rc=$?
  [ -f /tmp/driver_sim_results.json ] && cp /tmp/driver_sim_results.json "/tmp/r12_${name}.json"
  rm -rf /tmp/duckdb_sim_spill
  echo "=== chunk $name rc=$rc $(date +%T) free=$(df --output=avail / | tail -1)KB ===" >>"$LOG"
}

# v2 timeout/abort remainder: plain shapes, cheap both sides.
run_chunk g3b 3600 16GB "win_gaps_islands,stream_outer_join_watermark"
run_chunk s2 1800 16GB "etl_row_lineage,join_geo_grid_nearest"
run_chunk s3 1800 16GB "x_text_keyphrase_rake,x_text_langid_ngram"
run_chunk s4 1800 16GB "x_text_char_lm_score,x_embedding_pca_covariance"
# v2 bad_alloc retries, one shot each at a generous oracle.
run_chunk o1 1800 40GB "x_text_dedup_spans"
run_chunk o2 1800 40GB "x_sim_ann_ivf_pq"
# Dedup/graph family, one query per chunk (oracle shingles 500k docs).
run_chunk d_components 1800 40GB "x_dedup_components"
run_chunk d_chunk_cdc 1800 40GB "x_dedup_chunk_cdc"
run_chunk d_simhash 1800 40GB "x_dedup_simhash"
run_chunk d_quality 1800 40GB "x_dedup_cluster_quality_report"
run_chunk d_histogram 1800 40GB "x_dedup_threshold_histogram"
run_chunk d_lpa 1800 40GB "x_graph_label_propagation"
# The v2 disk eater, isolated and last of the d-family.
run_chunk d_canonical 1800 40GB "x_dedup_canonical"
# The r11 spill class: a DISK-KILL or timeout here is the documented
# oracle-infeasible verdict, not a retry candidate.
run_chunk r1 1200 40GB "x_dedup_minhash_lsh"
run_chunk r2 1200 40GB "x_dedup_minhash_incremental"
run_chunk r3 1200 40GB "x_dedup_prefix_filter_join"
run_chunk r4 1200 40GB "join_bucketed_dedup_verify"
run_chunk r5 1200 40GB "x_graph_link_prediction"
echo "SWEEP3 DONE $(date +%T)" >>"$LOG"
