"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC MERGE-apply on sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-checkable oracles (see
marc_data_migration_spark/entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marc_data_migration_spark.entry_queries import (  # noqa: E402
    ORDERED_ORACLES,
    ORDERED_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC MERGE apply (dedup → lookup join → field-level
    merge → delete handling) on the sf0.001 change feed."""
    return ORDERED_QUERIES["cdc_apply"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Curated order: the correctness driver proves the first 50 entries;
    # see entry_queries.QUERY_ORDER for the window/rotation policy.
    return dict(ORDERED_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORDERED_ORACLES)
