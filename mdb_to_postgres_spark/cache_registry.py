"""ONE place listing every module-level session cache in the package.

Every entry is an (applicationId, ...)-keyed dict holding per-session
artifacts (localCheckpointed substrates, collected models, staged-table
names). Two hazards apply to all of them — stale-appId entries pinning
dead-session JVM state, and unbounded growth across sessions — and the
house answer is sources.tables.session_cache_get, which sweeps foreign
appIds on every access. This registry exists so the eviction contract is
testable in ONE parametrized test (tests/test_round10_ops.py) instead of
per-cache ad-hoc coverage, and so a new cache that bypasses the pattern
is caught by the source-level audit test.

Exempt from the (app, sf_dir) key shape but still appId-evicting:
- functions.global_order._BUILD_CACHE — keyed (app, semanticHash, spec),
  self-evicting + LRU-bounded (_BUILD_CACHE_MAX); covered by its own
  tests in tests/test_global_order.py.
"""

from __future__ import annotations

from .extensions import dedup, graph, similarity, text_analysis
from .operators import aggregates, joins, physical, scans, windows
from .sources import tables

# (label, cache dict) — every cache here is swept by session_cache_get
# (or an equivalent inline sweep: _COMP_CACHE, _DF_CACHE) on each access.
SESSION_CACHES: list[tuple[str, dict]] = [
    ("tables.df", tables._DF_CACHE),
    ("dedup.jaccard_pairs", dedup._JACCARD_PAIR_CACHE),
    ("dedup.incr_base", dedup._INCR_BASE_CACHE),
    ("dedup.lsh_bands", dedup._LSH_BANDS_CACHE),
    ("dedup.simhash_chunks", dedup._SIMHASH_CHUNK_CACHE),
    ("dedup.components", dedup._COMP_CACHE),
    ("dedup.shingles", dedup._SHINGLE_CACHE),
    ("dedup.pair_stats", dedup._PAIR_STATS_CACHE),
    ("text.trigrams", text_analysis._TRIGRAM_CACHE),
    ("text.ngram_profiles", text_analysis._NGRAM_PROF_CACHE),
    ("text.char_lm_model", text_analysis._CHAR_LM_MODEL_CACHE),
    ("text.bm25_index", text_analysis._BM25_INDEX_CACHE),
    ("text.bigram_lm_model", text_analysis._BIGRAM_LM_CACHE),
    ("graph.pairs", graph._PAIR_CACHE),
    ("sim.flat_corpus", similarity._FLAT_CORPUS_CACHE),
    ("sim.flat_centroids", similarity._FLAT_CENT_CACHE),
    ("sim.strides", similarity._STRIDE_CACHE),
    ("sim.ivf_assign", similarity._IVF_ASSIGN_CACHE),
    ("sim.kmeans_centroids", similarity._KMEANS_CENT_CACHE),
    ("sim.lsh_buckets", similarity._LSH_BUCK_CACHE),
    ("sim.lsh_codes", similarity._LSH_CODES_CACHE),
    ("sim.pq_encode", similarity._PQ_ENC_CACHE),
    ("sim.pq_dtab", similarity._PQ_DTAB_CACHE),
    ("win.concurrency_bounds", windows._CONC_BOUNDS_CACHE),
    ("win.pareto_revenue", windows._PARETO_REV_CACHE),
    ("win.rfm_entity", windows._RFM_ENTITY_CACHE),
    ("agg.skew_counts", aggregates._SKEW_COUNTS_CACHE),
    ("agg.ks_pv", aggregates._KS_PV_CACHE),
    ("phys.morton", physical._MORTON_CACHE),
    ("scans.star_userkeys", scans._STAR_USERKEYS_CACHE),
    ("joins.order_pairs", joins._ORDER_PAIR_CACHE),
]
