"""Invariant tests for the round-6 second-session additions (9th wave):
bootstrap CI ordering/coverage, covariance vs numpy + power-iteration
eigenpair, Kaplan-Meier risk-set laws, bitemporal monotonicity, CDC
chunk non-vacuity, LPA label laws, Merkle tree consistency, row-lineage
manifest completeness, XML round-trip fidelity, outer-join conservation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mdb_to_postgres_spark.registry import QUERIES, load_all
from tests.conftest import ORACLE_SF

load_all()


def test_bootstrap_ci_brackets_point_estimate(spark):
    row = QUERIES["x_eval_bootstrap_ci"](spark, ORACLE_SF).toPandas().iloc[0]
    assert row.n_replicates == 100
    assert row.ci_lo < row.ci_hi
    # the point estimate must fall inside its own 95% bootstrap CI —
    # a violation means the replicate weighting is biased, not unlucky
    assert row.ci_lo <= row.point_mean <= row.ci_hi, row
    assert row.ci_width > 0


def test_covariance_matches_numpy_and_power_iteration(spark):
    out = QUERIES["x_embedding_pca_covariance"](spark, ORACLE_SF).toPandas()
    assert len(out) == 64 * 65 // 2
    # reconstruct the symmetric matrix
    d = 64
    C = np.zeros((d, d))
    for r in out.itertuples():
        C[r.i - 1, r.j - 1] = C[r.j - 1, r.i - 1] = r.cov
    # ppm quantization of per-row products bounds each cell's error by
    # ~0.5e-6 on the averaged lattice; allow a loose 1e-4 absolute band
    from mdb_to_postgres_spark.sources.tables import T

    X = np.array(
        T(spark, ORACLE_SF, "embeddings")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    C_np = np.cov(X, rowvar=False, ddof=1)
    assert np.abs(C - C_np).max() < 1e-4
    # the promised epilogue: power iteration on the returned matrix
    # approaches numpy's leading eigenvalue. Convergence is geometric in
    # lambda2/lambda1 and this corpus's spectrum is nearly flat at the
    # top, so assert a 1% Rayleigh-quotient band after 300 rounds rather
    # than tight equality.
    v = np.ones(d) / np.sqrt(d)
    for _ in range(300):
        v = C @ v
        v /= np.linalg.norm(v)
    lam = v @ C @ v
    w = np.linalg.eigvalsh(C_np)
    assert abs(lam - w[-1]) / abs(w[-1]) < 1e-2


def test_kaplan_meier_risk_set_laws(spark):
    out = QUERIES["win_kaplan_meier"](spark, ORACLE_SF).toPandas().sort_values("t")
    # risk set is non-increasing in t and starts at the subject count
    assert (out.n_risk.diff().dropna() <= 0).all()
    from mdb_to_postgres_spark.sources.tables import T

    n_orders = T(spark, ORACLE_SF, "orders").count()
    assert out.n_risk.iloc[0] == n_orders
    # every subject exits exactly once: events + censorings == subjects
    assert (out.n_events + out.n_censored).sum() == n_orders
    # cumulative hazard is non-decreasing
    assert (out.cum_hazard_ppm.diff().dropna() >= 0).all()
    assert (out.n_events <= out.n_risk).all()


def test_bitemporal_settlement_monotonicity(spark):
    out = QUERIES["join_bitemporal"](spark, ORACLE_SF).toPandas()
    # a later knowledge horizon (same valid time) can only ADD customers,
    # never lose one: probe 2 covers every customer probe 1 resolved
    p1 = set(out[out.probe_id == 1].o_custkey)
    p2 = set(out[out.probe_id == 2].o_custkey)
    assert p1 <= p2
    # the version chosen is always valid on or before the probe date, and
    # was known on or before the knowledge date
    for r in out.itertuples():
        assert r.valid_from <= r.v_date
        assert 0 <= r.days_late <= 4


def test_cdc_chunks_are_cross_doc_and_nonvacuous(spark):
    out = QUERIES["x_dedup_chunk_cdc"](spark, ORACLE_SF).toPandas()
    # corpus support verified at build time (~150 dup chunks at sf0.01);
    # an empty result would mean the boundary scheme broke
    assert len(out) > 10
    assert (out.n_docs >= 2).all()
    assert (out.n_occurrences >= out.n_docs).all()
    assert (out.chunk_len >= 1).all()


def test_lpa_labels_are_nodes_and_sizes_consistent(spark):
    out = QUERIES["x_graph_label_propagation"](spark, ORACLE_SF).toPandas()
    nodes = set(out.node)
    # every community label is itself a node (labels are node ids)
    assert set(out.community) <= nodes
    # community_size column is consistent with the label multiset
    sizes = out.groupby("community").size()
    for r in out.itertuples():
        assert sizes[r.community] == r.community_size
    # propagation compressed the label space (communities < nodes)
    assert out.community.nunique() < len(nodes)


def test_merkle_tree_levels_consistent(spark):
    out = QUERIES["etl_merkle_sync_diff"](spark, ORACLE_SF).toPandas()
    # v2 differs from v1, so the root must be in the differing set
    root = out[out.level == 2]
    assert len(root) == 1
    # a differing leaf implies its parent differs (additive checksums
    # compose upward, and collisions on 40-bit sums are negligible)
    parents = set(out[out.level == 1].node_id)
    for leaf in out[out.level == 0].itertuples():
        assert leaf.node_id // 16 in parents, leaf
    assert (out.level.isin([0, 1, 2])).all()


def test_row_lineage_manifest_complete(spark):
    out = QUERIES["etl_row_lineage"](spark, ORACLE_SF).toPandas()
    from mdb_to_postgres_spark.sources.tables import T

    n = T(spark, ORACLE_SF, "orders").count()
    assert out.n_rows.sum() == n
    # buckets tile the file contiguously: positions never overlap
    out = out.sort_values("bucket")
    assert (out.min_ri == out.bucket * 2048).all()
    assert (out.max_ri - out.min_ri + 1 == out.n_rows).all()
    # lineage checksums are deterministic: a second run is identical
    again = QUERIES["etl_row_lineage"](spark, ORACLE_SF).toPandas().sort_values("bucket")
    assert (out.lineage_ck.values == again.lineage_ck.values).all()


def test_row_lineage_oracle_layout_assumption(spark):
    """The DuckDB oracle hard-codes file_name = 'orders.parquet' and
    re-derives row_index as ROW_NUMBER() ORDER BY o_orderkey — valid only
    while orders ships as ONE parquet file physically sorted by
    o_orderkey. Guard that loudly: a corpus regeneration that splits or
    re-sorts the file must fail HERE, not as an opaque oracle hash
    mismatch."""
    from mdb_to_postgres_spark.sources.tables import T

    src = T(spark, ORACLE_SF, "orders").select(
        F.col("_metadata.file_name").alias("fn"),
        F.col("_metadata.row_index").alias("ri"),
        "o_orderkey",
    )
    from pyspark.sql.window import Window

    files = src.select("fn").distinct().collect()
    assert [r.fn for r in files] == ["orders.parquet"], files
    stats = src.agg(
        F.count("*").alias("n"),
        F.max("ri").alias("max_ri"),
        F.min("ri").alias("min_ri"),
    ).collect()[0]
    assert stats.min_ri == 0 and stats.max_ri == stats.n - 1, stats
    # physically sorted by o_orderkey <=> zero inversions in row order
    prev = F.lag("o_orderkey").over(Window.orderBy("ri"))
    inversions = (
        src.select((F.col("o_orderkey") < prev).cast("int").alias("inv"))
        .agg(F.sum("inv").alias("s"))
        .collect()[0]
        .s
    )
    assert (inversions or 0) == 0, inversions


def test_xml_roundtrip_exact(spark):
    out = QUERIES["scan_xml"](spark, ORACLE_SF)
    from mdb_to_postgres_spark.sources.tables import T

    src = T(spark, ORACLE_SF, "nation")
    assert out.schema == src.schema
    assert out.exceptAll(src).count() == 0
    assert src.exceptAll(out).count() == 0


def test_outer_join_conserves_clicks(spark):
    out = QUERIES["stream_outer_join_watermark"](spark, ORACLE_SF)
    from mdb_to_postgres_spark.sources.tables import T, events_ts

    clicks = (
        events_ts(spark, ORACLE_SF).filter(F.col("event_type") == "click").count()
    )
    # every click appears: matched rows may fan out, but the distinct
    # click set is conserved and unmatched clicks carry matched = 0
    pdf = out.toPandas()
    assert pdf.click_id.nunique() == clicks
    unmatched = pdf[pdf.matched == 0]
    assert unmatched.purchase_id.isna().all()
    assert (pdf[pdf.matched == 1].gap_sec.between(0, 600)).all()


def test_t_closeness_emd_laws(spark):
    out = QUERIES["x_privacy_t_closeness"](spark, ORACLE_SF).toPandas()
    from mdb_to_postgres_spark.sources.tables import T

    c = T(spark, ORACLE_SF, "customer")
    # one row per (nation, segment) class; sizes sum to the table
    assert len(out) == c.select("c_nationkey", "c_mktsegment").distinct().count()
    assert out.class_size.sum() == c.count()
    # EMD is a normalized distance: in [0, 1], and not degenerate —
    # classes differ from the global distribution somewhere
    assert (out.emd >= 0).all() and (out.emd <= 1).all()
    assert out.emd.max() > 0
    # the audit verdict matches the reported distance at the threshold
    assert ((out.emd <= 0.2 + 1e-12) == out.t_close_ok).all()


def test_cdc_chunking_is_lossless_partition(spark):
    # the chunker must PARTITION each document: chunks, concatenated in
    # order, reassemble the original text byte-for-byte — no dropped or
    # duplicated characters at any boundary (the law that makes chunk
    # dedup usable for reconstruction/sync, not just detection)
    from mdb_to_postgres_spark.extensions.dedup import cdc_chunk_stream
    from mdb_to_postgres_spark.sources.tables import T

    chunks = cdc_chunk_stream(spark, ORACLE_SF).toPandas()
    docs = T(spark, ORACLE_SF, "documents").select("doc_id", "text").toPandas()
    rebuilt = (
        chunks.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")["chunk_text"]
        .agg("".join)
    )
    orig = docs.set_index("doc_id")["text"]
    assert len(rebuilt) == len(orig)
    merged = orig.to_frame("text").join(rebuilt.to_frame("rebuilt"))
    assert (merged.text == merged.rebuilt).all()
