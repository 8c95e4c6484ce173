"""As-of join — point-in-time lookup, absent from both the reference
and Spark's built-in operators (SURVEY §2.10 joins row).

``asof_join(left, right)``: for every left row, the single right row
with the greatest ``right_time <= left_time`` within the same key.

Implementation is the scalable union-window ("merge join") technique,
not a per-key loop and not an inequality join:

1. tag both sides and union them into one stream of (key, t, side,
   payload) rows;
2. one window per key ordered by (t, side) — right rows sort before
   left rows at equal timestamps so exact-time matches are inclusive;
3. ``last(right_payload, ignoreNulls=True)`` carries the most recent
   right row forward; left rows read it off.

Cost: one hash exchange per side on the key + a per-key sort — the
same shape as a sort-merge join, independent of time-range skew. A
naive ``t1 <= t2`` range join would explode to O(|left| x |right|)
per key before aggregation.

Right-side duplicates at the same (key, time) are resolved by max
payload order (deterministic; mirrors DuckDB's ASOF JOIN after the
same pre-dedup, which the oracle applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _fresh_names(taken: set[str], *bases: str) -> list[str]:
    """Generated internal column names guaranteed not to collide with
    any caller column (the caller may legitimately own ``_k``/``_t``)."""
    out = []
    for base in bases:
        name = base
        while name in taken:
            name += "_"
        taken.add(name)
        out.append(name)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value: str,
) -> DataFrame:
    """Left as-of join; output = left columns + ``right_value``
    (NULL when no right row precedes the left row).

    The carried payload is a one-field STRUCT, not the bare value: a
    right row whose value IS NULL still produces a non-null struct, so
    ``last(..., ignorenulls=True)`` stops at the matched row and yields
    its NULL instead of skipping back to an older non-null value
    (DuckDB ASOF JOIN semantics).
    """
    taken = set(left.columns) | set(right.columns)
    _k, _t, _side, _rs = _fresh_names(taken, "_k", "_t", "_side", "_rs")
    # dedup right to one row per (key, time): keep max value
    r = (
        right.groupBy(F.col(key).alias(_k), F.col(right_time).alias(_t))
        .agg(F.max(right_value).alias("v"))
        .select(_k, _t, F.lit(0).alias(_side), F.struct("v").alias(_rs))
    )
    lcols = left.columns
    l = left.select(
        F.col(key).alias(_k),
        F.col(left_time).alias(_t),
        F.lit(1).alias(_side),
        F.lit(None).cast(r.schema[_rs].dataType).alias(_rs),
        *lcols,
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(_k)
        .orderBy(F.col(_t).asc(), F.col(_side).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        right_value, F.last(_rs, ignorenulls=True).over(w).getField("v")
    )
    return carried.filter(F.col(_side) == 1).select(*lcols, right_value)
