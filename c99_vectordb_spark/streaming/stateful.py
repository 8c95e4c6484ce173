"""Custom stateful streaming operators via applyInPandasWithState.

The scale story for continuous ingest: state is partitioned by key
across executors, bounded by timeouts, and survives restarts through
the checkpoint — the streaming twin of the batch dedup operators.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.LongType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("body", T.StringType(), True),
    ]
)

DEDUP_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType(), False)])


def streaming_exact_dedup(
    records: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """Exactly-once streaming dedup on content fingerprint.

    Input stream must carry (fp BIGINT, id BIGINT, body STRING) — fp
    from dedup.fingerprint. Grouped state per fingerprint: the first
    record with a given fp is emitted, every later one (same batch or
    any later batch) is dropped. State per key is one boolean.

    ``state_ttl_ms`` bounds total state at 100 TB scale: with a TTL the
    key expires after that idle time (a re-arrival then passes again).
    Note: processing-time timeouts keep a Trigger.AvailableNow query
    scheduling batches until every pending timeout fires — use TTL only
    with continuous triggers.
    """
    ttl = state_ttl_ms

    def dedup_fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if ttl is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            return
        first = None
        for pdf in pdfs:
            if len(pdf):
                row = pdf.sort_values("id").iloc[0]
                if first is None or row["id"] < first["id"]:
                    first = row
        if first is not None:
            state.update((True,))
            if ttl is not None:
                state.setTimeoutDuration(ttl)
            yield pd.DataFrame(
                [[int(first["fp"]), int(first["id"]), first["body"]]],
                columns=["fp", "id", "body"],
            )

    return records.groupBy("fp").applyInPandasWithState(
        dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
