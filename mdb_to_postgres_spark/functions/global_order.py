"""Two-phase global-order primitives — global ROW_NUMBER / running sum /
NTILE without a single-partition window.

`Window.orderBy(...)` with no partitionBy collapses the whole input into
ONE task: correct, and fine on aggregate-sized input (a vocabulary, B
bootstrap replicates), but a non-starter on corpus-sized input at 100 TB.
These helpers implement the decomposition `sort_global_rank_twophase`
(operators/sort_setops.py) proved hash-green against the engine's own
ROW_NUMBER, as a reusable substrate:

  phase 1: repartitionByRange on the order key — each of P partitions
           holds a contiguous key range, scanned/ranked locally;
  phase 2: per-partition totals (P rows) become cumulative offsets via a
           window over P rows; global value = my range's offset + local.

The result is invariant to WHERE the sampled range boundaries fall — only
the per-partition offsets change, not the arithmetic — so the
nondeterminism of range sampling never reaches the output.

CONTRACT: the order key list must be a TOTAL order (no duplicate key
tuples). repartitionByRange gives no guarantee that duplicate keys stay in
one partition, so rank-with-ties must be rebuilt on top of unique keys
(e.g. group by the tie key first, then rank the distinct keys — see
x_eval_auc). Every caller in this repo orders by a key list that includes
a unique id tiebreak, or groups first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__go_pid"
_LOCAL = "__go_local"
_PART_SUM = "__go_psum"
_OFFSET = "__go_offset"

# P for the range exchange. At local test scale any small value works; on
# a real cluster this should track default parallelism. 32 matches the
# local[32] harness and keeps each range partition cache-sized.
_DEFAULT_PARTITIONS = 32


def global_cumsum(
    df: DataFrame,
    order_by: list[Column],
    value: Column,
    out: str,
    *,
    inclusive: bool = False,
    total_col: str | None = None,
    num_partitions: int = _DEFAULT_PARTITIONS,
) -> DataFrame:
    """Append `out` = global running sum of `value` over the total order
    `order_by` (exclusive of the current row by default), plus optionally
    `total_col` = the grand total on every row.

    Plan shape: one range Exchange + a local window keyed on the
    materialized partition id + a broadcast join of a P-row offsets table.
    No stage ever holds more than one range of the data; the only
    single-partition window runs over P rows.
    """
    ranged = df.repartitionByRange(num_partitions, *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    upper = 0 if inclusive else -1
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = ranged.withColumn(
        _LOCAL, F.coalesce(F.sum(value).over(w_local), F.lit(0))
    )
    parts = ranged.groupBy(_PID).agg(F.sum(value).alias(_PART_SUM))
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = parts.withColumn(
        _OFFSET, F.coalesce(F.sum(_PART_SUM).over(w_off), F.lit(0))
    )
    if total_col is not None:
        w_all = Window.orderBy(_PID).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        offsets = offsets.withColumn(total_col, F.sum(_PART_SUM).over(w_all))
    keep = [_PID, _OFFSET] + ([total_col] if total_col else [])
    joined = local.join(F.broadcast(offsets.select(*keep)), _PID)
    return joined.withColumn(out, F.col(_OFFSET) + F.col(_LOCAL)).drop(
        _PID, _LOCAL, _OFFSET
    )


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out: str = "rn",
    *,
    total_col: str | None = None,
    num_partitions: int = _DEFAULT_PARTITIONS,
) -> DataFrame:
    """Append `out` = ROW_NUMBER() OVER (ORDER BY order_by) — 1-based —
    computed two-phase. Requires `order_by` to be a total order."""
    return global_cumsum(
        df,
        order_by,
        F.lit(1),
        out,
        inclusive=True,
        total_col=total_col,
        num_partitions=num_partitions,
    )


def ntile_from_rn(rn: str, n: str, k: int) -> Column:
    """SQL-standard NTILE(k) from a 1-based global row number column `rn`
    and a total-count column `n` (both BIGINT column NAMES), as exact
    integer arithmetic (no double division anywhere — front-loaded
    remainder per the standard: the first n%k tiles get one extra row)."""
    base = f"({n} div {k})"
    rem = f"({n} % {k})"
    head = f"(({base} + 1) * {rem})"  # rows covered by the fat tiles
    return F.expr(
        f"CASE WHEN {rn} <= {head} THEN ({rn} + {base}) div ({base} + 1) "
        f"ELSE {rem} + (({rn} - {head} + {base} - 1) div {base}) END"
    ).cast("int")
