"""Vectorized Python UDF surface (SURVEY.md §2.9 #67 + §2.7 summary).

Every Python<->JVM crossing is Arrow-batched: scalar pandas_udf, grouped-
aggregate pandas_udf, grouped-map applyInPandas, mapInPandas, and a Python
UDTF. The registered gate queries use deterministic integer/exact-double
bodies so the surface itself is oracle-checkable — proving the plumbing
without model dependencies; a real embedding/scoring model slots into the
same signatures.

Row-at-a-time ``F.udf`` is deliberately absent: 10-100x slower than Arrow
batches and never worth it in a hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import T as tbl
from ..sources.tables import events_ts, ev_sec_sql


@F.pandas_udf(T.DoubleType())
def _scaled_value(v: pd.Series) -> pd.Series:
    # Exact double op (x2 is exponent arithmetic): bit-deterministic.
    return v * 2.0


@F.pandas_udf(T.LongType())
def _token_estimate(s: pd.Series) -> pd.Series:
    # Deterministic "model": byte-length // 4 token budget.
    return (s.str.len() // 4).astype("int64")


@query(
    "x_udf_scalar_pandas",
    oracle="""
    SELECT event_id, value * 2.0 AS value_scaled,
           CAST(length(props) // 4 AS BIGINT) AS props_tokens
    FROM events
    """,
)
def x_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (#67): Series->Series over Arrow batches — the
    embed/score/classify slot."""
    e = tbl(spark, sf_dir, "events")
    return e.select(
        "event_id",
        _scaled_value(F.col("value")).alias("value_scaled"),
        _token_estimate(F.col("props")).alias("props_tokens"),
    )


@F.pandas_udf(T.LongType())
def _sum_cents(v: pd.Series) -> int:
    # Grouped-agg pandas_udf: exact integer-cents accumulation.
    return int((v * 100).round().astype("int64").sum())


@F.pandas_udf(T.LongType())
def _count_rows(v: pd.Series) -> int:
    # Pandas grouped-agg UDFs can't mix with builtin aggregates in one
    # agg(); the count is a pandas UDF too.
    return int(len(v))


@query(
    "x_udf_grouped_agg",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           COUNT(*) AS event_cnt
    FROM events
    GROUP BY user_id
    """,
)
def x_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf (#67): a custom UDAF over Arrow batches
    (integer-exact, so it hash-matches plain SQL)."""
    e = tbl(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        _sum_cents(F.col("value")).alias("total_cents"),
        _count_rows(F.col("value")).alias("event_cnt"),
    )


_SESSIONIZED_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("events_so_far", T.LongType()),
    ]
)


@query(
    "x_udf_grouped_map",
    oracle=f"""
    SELECT user_id, event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY {ev_sec_sql()}, event_id) AS seq,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY {ev_sec_sql()}, event_id) AS events_so_far
    FROM events
    """,
)
def x_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (#67): per-user ordered sequencing in
    Python — the custom-sessionization slot. Deterministic sort keys make
    it equivalent to a window row_number.

    Scale shape: the shuffle/group key is a COARSE BUCKET (user_id mod B),
    not the raw entity — applyInPandas pays fixed Arrow + Python overhead
    per group, so 10M users as 10M groups would drown in per-group cost
    while B buckets keep each Arrow batch large and the per-entity work
    vectorized inside pandas (groupby().cumcount(), no Python loop).
    Round 12 (guide §2/§4.5): B derives from the session's parallelism —
    max(64, 2 x defaultParallelism) — instead of a flat 256. The result
    is bucket-count independent (seq is per user_id), so this only tunes
    the per-group overhead / batch-size balance: at local[32] B=64 halves
    the per-group Arrow+Python round-trips (measured 1.01 -> 0.63 s at
    sf0.1, equal rows); on a large cluster B grows with cores so no
    executor holds a corpus-sized pandas frame."""
    e = events_ts(spark, sf_dir).select("user_id", "event_id", "ts_sec")
    n_buckets = max(64, 2 * spark.sparkContext.defaultParallelism)
    e = e.withColumn("bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)))

    def sequence_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts_sec", "event_id"]).reset_index(drop=True)
        seq = (pdf.groupby("user_id", sort=False).cumcount() + 1).astype("int64")
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "seq": seq,
                "events_so_far": seq,
            }
        )

    return e.groupBy("bucket").applyInPandas(sequence_bucket, schema=_SESSIONIZED_SCHEMA)


@query(
    "x_udtf_expand",
    oracle="""
    SELECT doc_id,
           UNNEST(range(3)) AS chunk_idx,
           (n_chars + 2) // 3 AS chunk_size
    FROM documents
    WHERE doc_id < 30
    """,
)
def x_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (#67): table function fanning each doc into fixed
    chunks — the document-chunking slot (one row in, k rows out).
    Arrow-optimized (useArrow) so it plans as ArrowEvalPythonUDTF — the
    engine-wide no-row-at-a-time-Python rule applies to table functions
    too, and the parity suite's BatchEvalPython guard enforces it."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_size: bigint", useArrow=True)
    class ChunkPlanner:
        def eval(self, n_chars: int):
            size = (n_chars + 2) // 3
            for i in range(3):
                yield i, size

    spark.udtf.register("chunk_planner", ChunkPlanner)
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_size
        FROM docs_for_udtf d, LATERAL chunk_planner(d.n_chars) c
        """
    )


@query(
    "x_udf_map_in_pandas",
    # numpy floor_divide == FLOOR(a/b) elementwise, so the Python batch
    # transform is exactly reproducible in SQL — the surface is proven by
    # hash-match, not just by running.
    oracle="""
    SELECT event_id, value,
           CAST(FLOOR(value / 50) AS BIGINT) AS value_bucket
    FROM events
    """,
)
def x_udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas (#67): whole-partition batch transform — the bulk-
    inference slot (see also multimodal.decode_media)."""

    def enrich(batches):
        for pdf in batches:
            out = pdf[["event_id", "value"]].copy()
            out["value_bucket"] = (out["value"] // 50).astype("int64")
            yield out

    e = tbl(spark, sf_dir, "events")
    return e.mapInPandas(enrich, schema="event_id: bigint, value: double, value_bucket: bigint")


_ARROW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("props_bytes", T.LongType()),
    ]
)


@query(
    "x_udf_map_in_arrow",
    oracle="""
    SELECT event_id,
           CAST(round(value * 100) AS BIGINT) AS value_cents,
           CAST(octet_length(CAST(props AS BLOB)) AS BIGINT) AS props_bytes
    FROM events
    """,
)
def x_udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow (#67 cont.): the lowest-overhead Python crossing —
    RecordBatches reach the function as raw pyarrow with NO pandas
    conversion on either side, the right slot for libraries that speak
    Arrow natively (tokenizers, polars, DuckDB-in-worker) or when the
    pandas materialization itself dominates (wide binary/text columns:
    pandas would copy every cell into Python objects; pyarrow.compute
    stays in arrow buffers end to end). Same deterministic integer body
    discipline as the rest of the surface, so the crossing is
    oracle-checked."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batches(it):
        for batch in it:
            ev = batch.column("event_id")
            cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0)), pa.int64())
            nbytes = pc.binary_length(pc.cast(batch.column("props"), pa.binary()))
            yield pa.RecordBatch.from_arrays(
                [ev, cents, pc.cast(nbytes, pa.int64())],
                ["event_id", "value_cents", "props_bytes"],
            )

    e = tbl(spark, sf_dir, "events").select("event_id", "value", "props")
    return e.mapInArrow(batches, schema=_ARROW_SCHEMA)
