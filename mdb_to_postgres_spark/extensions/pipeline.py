"""Training-data pipeline operators beyond the driver's named set: the
dataset-assembly steps (split / pack / decontaminate) that sit between
"corpus" and "training run" in an LLM data pipeline.

All three are deterministic and oracle-checked:
- splits come from md5 of the stable doc id (never from RNG state), so any
  engine reproduces the same membership — the property that matters when a
  100 TB corpus is re-split incrementally;
- packing is a prefix-sum over an explicit total order, a single window
  scan, not a driver-side loop;
- contamination is an inverted-index semi-join, the same
  shared-shingle shape as near-dup detection (extensions/dedup.py) but
  against a (small, broadcastable) eval set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..sources.tables import T
from .dedup import _shingles


@query(
    "x_dataset_split",
    oracle="""
    WITH h AS (
      SELECT doc_id, n_chars,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hb
      FROM documents
    )
    SELECT CASE WHEN hb < '0d' THEN 'test'
                WHEN hb < '1a' THEN 'val'
                ELSE 'train' END AS split,
           COUNT(*) AS docs,
           CAST(SUM(CEIL(n_chars / 4.0)) AS BIGINT) AS est_tokens,
           MIN(doc_id) AS min_doc_id
    FROM h GROUP BY 1
    """,
)
def x_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~90/5/5: hex prefixes below
    0x0d test, below 0x1a val, rest train) by md5 of the document id.
    Hash-based membership is stable under corpus growth and engine
    changes — the reason production pipelines never use RNG splits."""
    d = T(spark, sf_dir, "documents")
    hb = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(hb < "0d", F.lit("test")).when(hb < "1a", F.lit("val")).otherwise(F.lit("train"))
    )
    return (
        d.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("docs"),
            F.sum(F.ceil(F.col("n_chars") / 4.0)).cast("long").alias("est_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


_PACK_BUDGET = 2048  # est. tokens per packed training sequence


@query(
    "x_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(CEIL(n_chars / 4.0) AS BIGINT) AS est_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, est_tokens,
             COALESCE(SUM(est_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior_tokens
      FROM t
    )
    SELECT doc_id, est_tokens,
           CAST(prior_tokens // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(prior_tokens % {_PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM c
    """,
)
def x_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign each document a pack id and
    in-pack offset from the running token count over a stable total order
    — one window prefix-sum, the distributed form of the greedy packer.
    At scale the ORDER BY becomes per-shard (partitionBy a shard key) so
    the window never needs a global sort of 100 TB."""
    d = T(spark, sf_dir, "documents")
    t = d.select("doc_id", F.ceil(F.col("n_chars") / 4.0).cast("long").alias("est_tokens"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    c = t.withColumn("prior_tokens", F.coalesce(F.sum("est_tokens").over(w), F.lit(0)))
    return c.select(
        "doc_id",
        "est_tokens",
        (F.col("prior_tokens") / _PACK_BUDGET).cast("long").alias("pack_id"),
        (F.col("prior_tokens") % _PACK_BUDGET).cast("long").alias("pack_offset"),
    )


_EVAL_MOD = 50  # docs with doc_id % 50 == 0 stand in for the benchmark set


@query(
    "x_contamination_check",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS l FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, UNNEST(list_transform(range(len(l) - 2),
             i -> l[i+1] || ' ' || l[i+2] || ' ' || l[i+3])) AS shingle
      FROM toks WHERE len(l) >= 3
    )
    SELECT t.doc_id AS train_doc, e.doc_id AS eval_doc,
           COUNT(*) AS shared_shingles
    FROM sh t JOIN sh e ON t.shingle = e.shingle
    WHERE e.doc_id % {_EVAL_MOD} = 0 AND t.doc_id % {_EVAL_MOD} <> 0
    GROUP BY t.doc_id, e.doc_id
    HAVING COUNT(*) >= 2
    """,
)
def x_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag training docs sharing >=2 word
    3-gram shingles with any eval-set doc. The eval shingle index is tiny
    relative to the corpus, so it broadcasts — each training shard checks
    locally, no corpus-wide shuffle."""
    sh = _shingles(T(spark, sf_dir, "documents"), 3)
    train = sh.filter(F.col("doc_id") % _EVAL_MOD != 0).select(
        F.col("doc_id").alias("train_doc"), "shingle"
    )
    ev = sh.filter(F.col("doc_id") % _EVAL_MOD == 0).select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    return (
        train.join(F.broadcast(ev), "shingle")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= 2)
    )
