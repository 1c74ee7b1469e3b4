"""_ppjoin_pairs (the shared exact pair substrate) must equal the naive
full-inverted-index self-join bit-for-bit: the PPJoin prefix bound makes
its candidates complete, and the hot/cold split verify partitions the
vocabulary, so cold match count + hot array intersect is the exact
intersection. Every downstream consumer (components, canonical, cluster
QA, the whole graph tier, contrastive triplets) rides this equality."""

from __future__ import annotations

from pyspark.sql import functions as F

from mdb_to_postgres_spark.extensions.dedup import (
    _near_jaccard_pairs,
    _ppjoin_pairs,
    doc_shingles,
)
from tests.conftest import ORACLE_SF


def _pairs_key(pdf):
    pdf = pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return list(zip(pdf.doc_a, pdf.doc_b, pdf.jaccard.round(12)))


def test_ppjoin_equals_naive_inverted_index(spark):
    fast = _pairs_key(_ppjoin_pairs(spark, ORACLE_SF).toPandas())
    naive = _pairs_key(_near_jaccard_pairs(spark, ORACLE_SF).toPandas())
    assert len(fast) == len(naive) > 0
    assert fast == naive


def test_ppjoin_hot_arm_exact_at_low_cap(spark):
    # The default _HOT_DF=64 puts this SF's whole vocabulary in the cold
    # arm, so the equality above would be vacuous for the hot path. Force
    # a cap low enough that a real slice of the vocabulary rides the
    # array-intersect arm (asserted non-empty) and the output must STILL
    # be bit-identical — the split is a cost model, never a semantics.
    hot_df = 4
    n_hot = (
        doc_shingles(spark, ORACLE_SF)
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > hot_df)
        .count()
    )
    assert n_hot > 0, f"corpus has no shingle above df={hot_df}; pick lower"
    fast = _pairs_key(_ppjoin_pairs(spark, ORACLE_SF, hot_df=hot_df).toPandas())
    naive = _pairs_key(_near_jaccard_pairs(spark, ORACLE_SF).toPandas())
    assert fast == naive


def test_ppjoin_all_hot_degenerate_cap(spark):
    # hot_df=0 pushes EVERY shingle into the array arm: intersections come
    # only from array_intersect and the cold stream is empty — the
    # all-null/empty-side edge cases (no cold row for a candidate pair)
    # must not drop or distort pairs.
    fast = _pairs_key(_ppjoin_pairs(spark, ORACLE_SF, hot_df=0).toPandas())
    naive = _pairs_key(_near_jaccard_pairs(spark, ORACLE_SF).toPandas())
    assert fast == naive


# ---- property suite: synthetic corpora, adversarial vocabulary shapes ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PROP_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Tiny vocabulary (heavy sharing: most shingles go hot at low caps; lots
# of ties), variable doc sizes including docs smaller than the shingle
# set of others (stresses the length filter), duplicate docs (jaccard
# exactly 1), and empty corpora.
_shingle_id = st.integers(min_value=0, max_value=9)
_doc = st.lists(_shingle_id, min_size=1, max_size=8)
_corpus = st.lists(_doc, min_size=0, max_size=12)


def _sh_df(spark, corpus):
    rows = [
        (doc_id, f"s{sid}")
        for doc_id, doc in enumerate(corpus)
        for sid in set(doc)
    ]
    return spark.createDataFrame(rows or [(0, "s0")], "doc_id int, shingle string").limit(
        len(rows)
    )


@given(corpus=_corpus, hot_df=st.sampled_from([0, 1, 2, 100]))
@settings(**_PROP_SETTINGS)
def test_ppjoin_property_equivalence(spark, corpus, hot_df):
    from mdb_to_postgres_spark.extensions.dedup import _naive_pairs_from, _ppjoin_from

    sh = _sh_df(spark, corpus)
    fast = _pairs_key(_ppjoin_from(sh, hot_df=hot_df).toPandas())
    naive = _pairs_key(_naive_pairs_from(sh).toPandas())
    assert fast == naive


def test_containment_split_equals_naive(spark):
    from mdb_to_postgres_spark.extensions.dedup import (
        _containment_from,
        _naive_containment_from,
        doc_shingles,
    )

    sh = doc_shingles(spark, ORACLE_SF)

    def key(pdf):
        pdf = pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return list(
            zip(pdf.doc_a, pdf.doc_b, pdf.containment.round(12), pdf.jaccard.round(12))
        )

    for cap in (64, 2, 0):
        fast = key(_containment_from(sh, hot_df=cap).toPandas())
        naive = key(_naive_containment_from(sh).toPandas())
        assert fast == naive and len(fast) > 0, f"cap={cap}"


@given(corpus=_corpus, hot_df=st.sampled_from([0, 1, 2, 100]))
@settings(**_PROP_SETTINGS)
def test_containment_property_equivalence(spark, corpus, hot_df):
    from mdb_to_postgres_spark.extensions.dedup import (
        _containment_from,
        _naive_containment_from,
    )

    sh = _sh_df(spark, corpus)

    def key(pdf):
        pdf = pdf.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        return list(
            zip(pdf.doc_a, pdf.doc_b, pdf.containment.round(12), pdf.jaccard.round(12))
        )

    assert key(_containment_from(sh, hot_df=hot_df).toPandas()) == key(
        _naive_containment_from(sh).toPandas()
    )
