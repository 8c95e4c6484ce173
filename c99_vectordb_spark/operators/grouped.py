"""Grouped-map operators via applyInPandas (SURVEY §2.10 UDF surface).

applyInPandas is the escape hatch for per-group logic the built-in
window/agg operators can't express (iterative per-group algorithms,
model scoring per key, resampling). The example operator here — dense
ranking within groups — IS expressible with a window function, which is
exactly why it makes a good conformance case: the pandas path must
reproduce the Catalyst path bit-for-bit, and the DuckDB oracle checks
both.

Scale shape: one hash exchange on the group key, then per-group pandas
batches. Groups must fit in executor memory — the operator is for
many-medium-groups workloads, not one-giant-group (that's a salting or
window-function job).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def grouped_dense_rank(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group dense rank of ``order_col`` (ascending), ties share a
    rank. Output: (id, grp, val, drank) — integer-exact."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("grp", T.StringType(), True),
            T.StructField("val", T.LongType(), True),
            T.StructField("drank", T.LongType(), False),
        ]
    )

    def rank_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "id": pdf[id_col].astype("int64"),
                "grp": pdf[group_col],
                "val": pdf[order_col].astype("int64"),
            }
        )
        out["drank"] = (
            out["val"].rank(method="dense", ascending=True).astype("int64")
        )
        return out

    return df.groupBy(group_col).applyInPandas(rank_fn, schema=schema)
