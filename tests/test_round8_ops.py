"""Invariant tests for the round-6 additions (8th wave of operators):
theta sketch accuracy, HLL rollup algebra, export manifest vs written
files, attribution credit conservation, reservoir/bin-packing laws,
BFS layering, link-prediction non-edge property."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from mdb_to_postgres_spark.registry import QUERIES, load_all
from tests.conftest import ORACLE_SF

load_all()


def test_theta_sketch_estimates_within_band(spark):
    row = QUERIES["agg_theta_sketch_setops"](spark, ORACLE_SF).toPandas().iloc[0]
    # k=128 -> rel std ~1/sqrt(126) ~ 9%; 30% is a >3-sigma band
    assert abs(row.est_a / row.exact_a - 1) < 0.30, row
    assert abs(row.est_b / row.exact_b - 1) < 0.30, row
    assert abs(row.est_union / row.exact_union - 1) < 0.30, row
    # inclusion-exclusion intersect: absolute error bounded by the union's
    assert abs(row.est_intersect - row.exact_intersect) < 0.30 * row.exact_union, row


def test_hll_rollup_estimates_and_merge_consistency(spark):
    out = QUERIES["agg_hll_sketch_merge"](spark, ORACLE_SF).toPandas()
    assert len(out) > 0
    for r in out.itertuples():
        assert abs(r.est_docs / r.exact_docs - 1) < 0.05, r
    # merged-leaf estimate == sketching the lang directly (sketch algebra:
    # union of leaf sketches is THE lang sketch, not an approximation of it)
    from mdb_to_postgres_spark.sources.tables import T

    direct = (
        T(spark, ORACLE_SF, "documents")
        .groupBy("lang")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("doc_id")).cast("bigint").alias("direct_est"))
        .toPandas()
    )
    merged = out.merge(direct, on="lang")
    assert (merged.est_docs == merged.direct_est).all(), merged


def test_export_manifest_matches_written_files(spark):
    man = QUERIES["etl_export_jsonl"](spark, ORACLE_SF).toPandas()
    assert man.n_docs.sum() == 500
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        os.path.basename(os.path.normpath(ORACLE_SF)),
        "export_jsonl",
    )
    assert os.path.exists(os.path.join(out_dir, "_SUCCESS"))
    for r in man.itertuples():
        files = glob.glob(os.path.join(out_dir, f"shard={r.shard}", "*.txt"))
        assert files, f"no files for shard {r.shard}"
        lines = sum(1 for f in files for _ in open(f))
        assert lines == r.n_docs, (r.shard, lines, r.n_docs)


def test_attribution_credits_sum_to_one(spark):
    out = QUERIES["win_funnel_attribution_paths"](spark, ORACLE_SF).toPandas()
    assert len(out) > 0
    total = out.first_credit + out.last_credit + out.middle_credit
    assert ((total - 1.0).abs() < 1e-12).all()
    # single-touch purchases put all credit on the first touch
    single = out[out.n_touches == 1]
    if len(single):
        assert (single.first_credit == 1.0).all()
        assert (single.last_credit == 0.0).all()


def test_reservoir_is_exactly_k_per_stratum(spark):
    out = QUERIES["x_sample_reservoir_stratified"](spark, ORACLE_SF).toPandas()
    sizes = out.groupby("source").size()
    assert (sizes == 5).all(), sizes
    # draw keys disjoint from the weighted sampler's (independent slices):
    # within each stratum, ranks must follow draw_key order
    for _, g in out.groupby("source"):
        g = g.sort_values("rn")
        assert g.draw_key.is_monotonic_increasing


def test_compaction_bins_respect_sequential_order(spark):
    out = QUERIES["etl_compact_small_files"](spark, ORACLE_SF).toPandas()
    # within a partition, target files tile the id range without overlap
    for _, g in out.groupby("part"):
        g = g.sort_values("target_file")
        prev_last = None
        for r in g.itertuples():
            assert r.first_file_id <= r.last_file_id
            if prev_last is not None:
                assert r.first_file_id > prev_last
            prev_last = r.last_file_id


def test_bfs_hops_layering(spark):
    out = QUERIES["x_graph_bfs_hops"](spark, ORACLE_SF).toPandas()
    assert len(out) > 0
    seeds = out[out.hops == 0]
    assert len(seeds) > 0
    assert (seeds.doc_id % 7 == 0).all()
    assert out.hops.between(0, 4).all()
    # one row per node (min-hop collapse worked)
    assert out.doc_id.is_unique


def test_link_prediction_returns_only_nonedges(spark):
    pred = QUERIES["x_graph_link_prediction"](spark, ORACLE_SF)
    from mdb_to_postgres_spark.sources.tables import T

    li = T(spark, ORACLE_SF, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    co = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .select("part_a", "part_b")
        .distinct()
    )
    overlap = pred.join(co, ["part_a", "part_b"]).count()
    assert overlap == 0  # every predicted link is genuinely absent
    out = pred.toPandas()
    assert len(out) > 0
    assert (out.common_neighbors >= 2).all()
    assert out.neighborhood_jaccard.between(0, 1).all()
