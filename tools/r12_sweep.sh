#!/bin/bash
# Round-12 sf10 census sweep: the 39 not-run carry-over rows + the 4
# banded-giant upgrades, in small sequential driver_sim processes (the
# r11 protocol: per-process chunks keep JVM+Arrow+buffer-pool footprint
# bounded). Each chunk's incremental dump is copied to a /tmp/r12_* file
# even when the chunk times out, so evidence survives.
set -u
cd /root/repo
SF=/root/repo/.cache/sf10
LOG=/tmp/r12_sweep.log
run_chunk() {
  local name="$1" timeout_s="$2" queries="$3"
  echo "=== chunk $name start $(date +%T) ===" >>"$LOG"
  rm -f /tmp/driver_sim_results.json
  timeout "$timeout_s" python tools/driver_sim.py "$SF" --only "$queries" >>"$LOG" 2>&1
  local rc=$?
  [ -f /tmp/driver_sim_results.json ] && cp /tmp/driver_sim_results.json "/tmp/r12_${name}.json"
  echo "=== chunk $name rc=$rc $(date +%T) ===" >>"$LOG"
}

run_chunk c1 2400 "fn_json,fn_math,join_asof,join_inner_hash,join_left,join_right,join_sortmerge,win_first_last,win_lag_lead,win_range_frame"
run_chunk c2 2400 "sql_q5_local_supplier_volume,sql_q10_returned_items,sql_q18_large_orders,win_gaps_islands,win_quantile_normalize,win_sessionize_assign,etl_partition_overwrite_dynamic,etl_row_lineage"
run_chunk c3 2400 "stream_join_windowed_runtime,stream_outer_join_watermark,join_geo_grid_nearest,x_text_langid_ngram,x_text_char_lm_score,x_text_keyphrase_rake,x_text_dedup_spans"
run_chunk c4 3000 "x_dedup_canonical,x_dedup_chunk_cdc,x_dedup_cluster_quality_report,x_dedup_components,x_dedup_simhash,x_embedding_pca_covariance,x_graph_label_propagation,x_sim_ann_ivf_pq,x_dedup_threshold_histogram"
# banded giants: upgrade rows+schema -> full banded value hash
run_chunk c5 3600 "cast_types,reshape_unpivot,join_bucketed_colocated,join_skew_salted"
# suspected oracle-infeasible twins: one process each so a spill-death
# can't eat neighbors' slots
run_chunk c6a 2400 "x_dedup_minhash_lsh"
run_chunk c6b 2400 "x_dedup_minhash_incremental"
run_chunk c6c 2400 "x_dedup_prefix_filter_join"
run_chunk c6d 2400 "join_bucketed_dedup_verify"
run_chunk c6e 2400 "x_graph_link_prediction"
echo "SWEEP DONE $(date +%T)" >>"$LOG"
