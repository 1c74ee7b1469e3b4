#!/bin/bash
# Round-12 sf10 census sweep v2: the 39 not-run carry-over rows + the 4
# banded-giant upgrades, in small sequential driver_sim processes (the
# r11 protocol: per-process chunks keep JVM+Arrow+buffer-pool footprint
# bounded). Each chunk's incremental dump is copied to a /tmp/r12_* file
# even on timeout/kill, so evidence survives. A disk watchdog kills a
# chunk before an oracle spill can ENOSPC the box (the r10 bench-killer
# class) — a DISK-KILL line in the log is the oracle-infeasibility
# signal for that chunk's in-flight query.
set -u
cd /root/repo
SF=/root/repo/.cache/sf10
LOG=/tmp/r12_sweep.log
MIN_FREE_KB=15000000   # 15 GB

run_chunk() {
  local name="$1" timeout_s="$2" oracle_mem="$3" queries="$4"
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
  echo "=== chunk $name rc=$rc $(date +%T) ===" >>"$LOG"
}

# Banded giants first: the 4 rows+schema -> full-hash upgrades.
run_chunk b1 3600 16GB "cast_types,reshape_unpivot,join_bucketed_colocated,join_skew_salted"
# Table-sized outputs (8-20M rows at sf10), plain shapes.
run_chunk g1 3600 16GB "fn_json,fn_math,join_asof,join_inner_hash,join_left"
run_chunk g2 3600 16GB "join_right,join_sortmerge,win_first_last,win_lag_lead,win_range_frame"
run_chunk g3 3600 16GB "win_gaps_islands,win_quantile_normalize,win_sessionize_assign,etl_partition_overwrite_dynamic,stream_outer_join_watermark"
# Small outputs, cheap both sides.
run_chunk s1 2400 16GB "etl_row_lineage,join_geo_grid_nearest,sql_q5_local_supplier_volume,sql_q10_returned_items,sql_q18_large_orders,stream_join_windowed_runtime,x_text_keyphrase_rake,x_text_langid_ngram,x_text_char_lm_score,x_text_dedup_spans,x_sim_ann_ivf_pq,x_embedding_pca_covariance"
# Dedup-family small outputs: the oracle shingles 500k docs — bounded
# risk, pairs each with a generous oracle.
run_chunk d1 2400 40GB "x_dedup_canonical,x_dedup_components"
run_chunk d2 2400 40GB "x_dedup_chunk_cdc,x_dedup_simhash"
run_chunk d3 2400 40GB "x_dedup_cluster_quality_report,x_dedup_threshold_histogram"
run_chunk d4 2400 40GB "x_graph_label_propagation"
# The r11 spill class: one process each; a DISK-KILL or timeout here is
# the documented oracle-infeasible verdict, not a retry candidate.
run_chunk r1 1500 40GB "x_dedup_minhash_lsh"
run_chunk r2 1500 40GB "x_dedup_minhash_incremental"
run_chunk r3 1500 40GB "x_dedup_prefix_filter_join"
run_chunk r4 1500 40GB "join_bucketed_dedup_verify"
run_chunk r5 1500 40GB "x_graph_link_prediction"
echo "SWEEP DONE $(date +%T)" >>"$LOG"
