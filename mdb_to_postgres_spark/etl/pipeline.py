"""Tier R copy pipeline as composable DataFrame transforms (SURVEY.md §3.2).

Each stage is declarative, so at 100 TB Catalyst fuses the whole pipeline
into one scan->project->write stage with no extra shuffle: casts, renames
and null-normalization are narrow per-row expressions inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .typemap import JET_TO_SPARK, sanitize_identifier


def project_rename(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    """Column subset + identifier sanitization (§2.2 #9).

    ``mapping`` maps source column -> target name; None sanitizes all.
    """
    if mapping is None:
        mapping = {c: sanitize_identifier(c) for c in df.columns}
    return df.select([F.col(src).alias(dst) for src, dst in mapping.items()])


def cast_frame(df: DataFrame, jet_types: dict[str, str]) -> DataFrame:
    """Per-column cast per the §1.2 matrix; bad values -> NULL (§2.2 #10).

    Permissive-mode casts (ansi off) reproduce the reference's tolerant
    load: a malformed value becomes NULL rather than failing the copy.
    """
    cols: list[Column] = []
    for c in df.columns:
        if c in jet_types:
            cols.append(F.col(c).cast(JET_TO_SPARK[jet_types[c]]).alias(c))
        else:
            cols.append(F.col(c))
    return df.select(cols)


def null_normalize(
    df: DataFrame,
    empty_string_cols: list[str] | None = None,
    zero_date_cols: list[str] | None = None,
) -> DataFrame:
    """Map sentinel values to NULL during copy (§2.2 #12).

    Access exports commonly carry '' for missing text and the JET zero-date
    (1899-12-30) for missing datetimes.
    """
    out = df
    for c in empty_string_cols or []:
        out = out.withColumn(c, F.nullif(F.col(c), F.lit("")))
    for c in zero_date_cols or []:
        out = out.withColumn(
            c, F.nullif(F.col(c), F.lit("1899-12-30 00:00:00").cast(T.TimestampType()))
        )
    return out


def full_table_copy(
    df: DataFrame,
    dst_path: str,
    jet_types: dict[str, str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> None:
    """Typed 1:1 table copy — the reference's flagship operation (§2.1 #4).

    Source scan -> optional cast/sanitize -> columnar (or JDBC) sink. For a
    JDBC sink at scale, prefer writing parquet and bulk-loading via COPY;
    ``sources.jdbc`` covers the direct ``df.write.jdbc`` path.
    """
    out = df
    if jet_types:
        out = cast_frame(out, jet_types)
    out = project_rename(out)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.save(dst_path)


def merge_upsert(base: DataFrame, changes: DataFrame, key: str, order_col: str) -> DataFrame:
    """Latest-wins merge of a change set into a base table (§2.1 #4 re-run
    semantics): rows sharing ``key`` are replaced by the change-set row,
    chosen by the highest ``order_col`` (change priority). One window over
    the union — shuffles once on the key, no driver-side diffing. At sink
    time this is what ``foreachBatch`` + MERGE INTO would do inside the
    database; doing it relationally keeps the copy idempotent."""
    from pyspark.sql.window import Window

    u = base.unionByName(changes)
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
    return u.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
