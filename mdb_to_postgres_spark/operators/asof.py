"""As-of and range joins as scalable DataFrame compositions (SURVEY.md §4.3).

Spark's batch DataFrame API has no native ASOF or band join; the naive
formulations are O(n*m) BroadcastNestedLoopJoins. These rewrites keep both
operators shuffle-based and linear-ish, which is what survives 100 TB:

- ``asof_join``: union both sides, single shuffle on the join keys, one
  ordered window pass carrying the latest right-side row forward
  (``last(..., ignorenulls)``). Cost = one shuffle + one sort per key
  group; no pairwise comparison ever materializes.
- ``range_join``: bucketize time into fixed-width epoch buckets, replicate
  each left row into the (at most two) buckets its window can overlap, then
  equi-join on (key, bucket) and post-filter the exact band predicate. The
  cross product is confined to bucket-local pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` keys (DuckDB ASOF-join
    semantics).

    Implementation: tag and union both sides, then one window pass per key
    ordered by (ts, side) with the right side sorting before coincident
    left rows, so ties match (>= semantics). The whole right payload is
    packed into ONE struct column and carried with ``last(ignorenulls)`` —
    carrying each payload column independently would fill a legitimately
    NULL field from an OLDER right row while other fields come from the
    newest, stitching values of different rows together. The struct is
    non-null for every right row (even when all its fields are null), so
    it also gives ``how='inner'`` a correct matched/unmatched signal.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    r_struct_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in right_cols])
    l = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in lcols],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = carried.filter(F.col("__side") == 1).drop("__side")
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col("__r").getField(c).alias(f"r_{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    width: Column,
    bucket: Column | None = None,
) -> DataFrame:
    """Band join: pairs where ``left_ts <= right_ts <= left_ts + width``
    within equal ``on`` keys. ``left_ts``/``right_ts`` are numeric (epoch
    seconds) columns; ``width`` a numeric Column (seconds).

    Bucket width defaults to the band width, so each left row lands in at
    most 2 buckets; the equi-join key is (keys..., bucket).
    """
    bw = bucket if bucket is not None else width
    l = left.withColumn("__b0", F.floor(F.col(left_ts) / bw))
    l = l.withColumn("__b", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1))).drop("__b0")
    r = right.withColumn("__b", F.floor(F.col(right_ts) / bw))
    joined = l.join(r, on=[*on, "__b"], how="inner").drop("__b")
    return joined.filter(
        (F.col(right_ts) >= F.col(left_ts)) & (F.col(right_ts) <= F.col(left_ts) + width)
    )
