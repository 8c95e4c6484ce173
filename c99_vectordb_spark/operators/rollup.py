"""Incremental materialized-rollup maintenance (continuous-aggregate
pattern).

A 100 TB event firehose is never re-aggregated from scratch: the
standing hourly rollup TABLE holds mergeable partial aggregates
(count / decimal sum / min / max — all algebraic), and each ingest
batch contributes only ITS partials, merged by re-aggregation on the
bucket key. Ingest cost is O(batch) + a rollup-sized shuffle; the raw
history is never rescanned — the same standing-index contract as
dedup.incremental_dedup.

Exactness: the value column enters as DECIMAL(18,6) and the running sum is pinned at DECIMAL(38,6) — a fixed state schema with 32 integer digits of headroom (exact
merge in any order, no float sum-order effects); presentation rounding
happens once, at the report edge. The registry query's DuckDB oracle
computes the rollup DIRECTLY from the full table, so the hash match
proves incremental merge == full recompute.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

HOUR_US = 3_600_000_000

_KEYS = ["hour_idx", "event_type"]


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Mergeable hourly partials from canonical events (ts_us BIGINT):
    (hour_idx, event_type, cnt, sum_v, min_v, max_v). One
    partial-aggregated shuffle on the bucket key; output is
    rollup-sized (hours x types), not event-sized."""
    from ..functions.text import floor_div_sql

    return (
        events.select(
            F.expr(floor_div_sql("ts_us", HOUR_US)).alias("hour_idx"),
            "event_type",
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
        .groupBy(*_KEYS)
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum("v").cast("decimal(38,6)").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )


def merge_rollups(*states: DataFrame) -> DataFrame:
    """Merge rollup states by re-aggregation — count/sum add, min/max
    fold; associative and commutative, so batches can merge in any
    order or grouping (the property the unit test pins). The shuffle
    carries only rollup rows."""
    u = reduce(DataFrame.unionByName, states)
    return u.groupBy(*_KEYS).agg(
        F.sum("cnt").cast("long").alias("cnt"),
        F.sum("sum_v").cast("decimal(38,6)").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def rollup_report(state: DataFrame) -> DataFrame:
    """Presentation edge: round the exact decimal sum once, surface
    doubles for the consumer. (hour_idx, event_type, cnt, sum_value,
    min_value, max_value)."""
    return state.select(
        "hour_idx",
        "event_type",
        "cnt",
        F.round(F.col("sum_v"), 2).cast("double").alias("sum_value"),
        F.col("min_v").cast("double").alias("min_value"),
        F.col("max_v").cast("double").alias("max_value"),
    )
