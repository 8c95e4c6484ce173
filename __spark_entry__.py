"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine: ``c99_vectordb_spark`` (see SURVEY.md §2 for the operator
inventory each query demonstrates).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from c99_vectordb_spark import queries_registry as QR  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full recall read path.

    Embed a query string driver-side, embed every document in-flight
    (Arrow-batched pandas UDF, map-only), score by squared L2 over
    L2-normalized signed-BoW vectors (= cosine ranking, SURVEY.md §1.4),
    top-10 via TakeOrderedAndProject.
    """
    from c99_vectordb_spark.operators.recall import recall

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    records = docs.selectExpr("doc_id as id", "text as body")
    return recall(records, "spark join merge fast table scan", k=10, dim=384)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return QR.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each queries() entry (ANSI SQL over the
    pre-registered views)."""
    return QR.oracle_sql()
