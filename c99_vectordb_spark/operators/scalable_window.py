"""Scalable replacements for unpartitioned global windows.

A ``Window.orderBy(...)`` with no ``partitionBy`` forces Spark to move
every row into ONE task (``WindowExec`` warns "Moving all data to a
single partition") — correct at sf0.1, fatal at 100 TB.  These helpers
re-express the two global-window shapes we need (dense global rank and
running prefix aggregate) as the classic two-pass range-partition
scheme:

1. ``repartitionByRange`` on the order columns, so partition *i* holds
   a contiguous slice of the total order (RangePartitioner samples the
   key distribution, so slices are balanced even under value skew);
2. one tiny per-partition aggregate (count / max), collected to the
   driver — ONE ROW PER PARTITION, a few KB even at 10k partitions;
3. a broadcast prefix-scan of those aggregates stitched onto a
   per-partition LOCAL window (``partitionBy(_pid)``), which Spark
   executes with full parallelism.

Same algebra as the global window, no single-task stage anywhere.
The pattern generalizes ``mutate.assign_dense_ids(scalable=True)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_PID = "__sw_pid"


def _ranged(df: DataFrame, order_cols: list[Column]) -> DataFrame:
    """Range-partition on the order columns and tag the partition id.

    Eagerly localCheckpointed: the per-partition aggregate (pass 1) and
    the stitched output (pass 2) both consume this shuffle, and the
    checkpoint also pins the partitioning so the sampled range
    boundaries cannot differ between the two passes."""
    return (
        df.repartitionByRange(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
) -> DataFrame:
    """1-based global rank in ``order_cols`` order, no global window.

    ``order_cols`` must be a total order (include a unique tie-break) —
    with ties the rank among equal keys follows the local sort and is
    nondeterministic, exactly like ``row_number`` over a non-total order.
    """
    ranged = _ranged(df, order_cols)
    counts = ranged.groupBy(_PID).count().orderBy(_PID).collect()
    offsets, acc = {}, 0
    for r in counts:
        offsets[r[_PID]] = acc
        acc += r["count"]
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    wlocal = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        ranged.withColumn(
            out_col, offmap[F.col(_PID)] + F.row_number().over(wlocal)
        )
        .drop(_PID)
    )


def running_max(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out_col: str = "runmax",
) -> DataFrame:
    """Running max of ``value`` over the global ``order_cols`` order
    (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), no global window.

    Pass 2 broadcasts each partition's max; partition *i*'s running max
    is ``greatest(local running max, max of all partitions < i)``.
    """
    ranged = _ranged(df, order_cols).withColumn("__sw_val", value)
    pmax = (
        ranged.groupBy(_PID).agg(F.max("__sw_val").alias("m")).orderBy(_PID).collect()
    )
    prefix, best = {}, None
    for r in pmax:  # max over all strictly-earlier partitions
        if best is not None:
            prefix[r[_PID]] = best
        if r["m"] is not None and (best is None or r["m"] > best):
            best = r["m"]
    wlocal = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = F.max("__sw_val").over(wlocal)
    if prefix:  # partitions with no earlier max simply miss the map -> NULL
        prefmap = F.create_map(
            *[x for pid, mx in prefix.items() for x in (F.lit(pid), F.lit(mx))]
        )
        carried = prefmap[F.col(_PID)].cast(
            ranged.schema["__sw_val"].dataType
        )
    else:
        carried = F.lit(None).cast(ranged.schema["__sw_val"].dataType)
    # greatest() ignores NULLs, so a missing carried max falls back to local
    return (
        ranged.withColumn(out_col, F.greatest(local, carried))
        .drop(_PID, "__sw_val")
    )


def running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value: Column,
    out_col: str = "runsum",
) -> DataFrame:
    """Running sum of ``value`` over the global ``order_cols`` order
    (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), no global window.

    Pass 2 broadcasts the prefix total of all strictly-earlier
    partitions; partition *i*'s running sum is local running sum +
    prefix[i]. Exact under integer/decimal values (sum order does not
    matter); for floats the result is deterministic but may differ
    from a sequential sum in the last ulp, like any partial-aggregate
    float sum."""
    ranged = _ranged(df, order_cols).withColumn("__sw_val", value)
    psum = (
        ranged.groupBy(_PID).agg(F.sum("__sw_val").alias("s")).orderBy(_PID).collect()
    )
    prefix, acc = {}, None
    for r in psum:
        if acc is not None:
            prefix[r[_PID]] = acc
        if r["s"] is not None:
            acc = r["s"] if acc is None else acc + r["s"]
    wlocal = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = F.sum("__sw_val").over(wlocal)
    sum_type = ranged.select(F.sum("__sw_val")).schema[0].dataType
    if prefix:
        prefmap = F.create_map(
            *[x for pid, s in prefix.items() for x in (F.lit(pid), F.lit(s))]
        )
        carried = prefmap[F.col(_PID)].cast(sum_type)
    else:
        carried = F.lit(None).cast(sum_type)
    return (
        ranged.withColumn(out_col, local + F.coalesce(carried, F.lit(0)))
        .drop(_PID, "__sw_val")
    )


def ntile_bucket(rank: Column, n_rows: int, n_buckets: int) -> Column:
    """SQL NTILE(k) bucket from a 1-based global rank — pure arithmetic.

    NTILE semantics (ISO SQL / Spark / DuckDB agree): the first
    ``n mod k`` buckets get ``ceil(n/k)`` rows, the rest ``floor(n/k)``.
    Turning the rank into the bucket number makes NTILE a map-side
    expression once :func:`global_rank` is in hand.
    """
    q, rem = divmod(n_rows, n_buckets)
    big = rem * (q + 1)  # rows living in the (q+1)-sized buckets
    if q == 0:
        return rank  # fewer rows than buckets: row r -> bucket r
    return (
        F.when(rank <= F.lit(big), ((rank - 1) / F.lit(q + 1)).cast("int") + 1)
        .otherwise(((rank - 1 - F.lit(big)) / F.lit(q)).cast("int") + F.lit(rem) + 1)
    )
