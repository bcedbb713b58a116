"""Multi-way routed outputs — operators F4/S8/P8 (SURVEY.md §2.1/2.2).

The reference fans every record out to one of 8 files chosen by match
outcome × online status (processor.py:121-155, record_update.py:479-537;
online classifier pnca_policy.py:71-96). Spark-first this is ONE
DataFrame with `route` and `is_online` columns written
``partitionBy("route", "is_online")`` — a single job, no per-sink
passes, and downstream readers get partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Analogue of STREAMING VIDEO / EBOOK / ONLINE PERIODICAL markers in
# 900$a (pnca_policy.py:87-93): tool values that mark an online turn.
ONLINE_TOOLS = ("browser", "search")


def with_is_online(df: DataFrame, tool_col: str = "tool") -> DataFrame:
    """P8: classify each row online/offline from its tool marker."""
    return df.withColumn(
        "is_online",
        F.coalesce(F.lower(F.col(tool_col)).isin(*ONLINE_TOOLS), F.lit(False)),
    )


def write_routed(routed: DataFrame, out_dir: str, mode: str = "overwrite") -> None:
    """S8: one partitioned write replaces the reference's 8 sinks."""
    routed.write.mode(mode).partitionBy("route").parquet(out_dir)


def route_counts(routed: DataFrame) -> DataFrame:
    """A2: run-summary counters (record_update.py:262-286) as one agg."""
    return routed.groupBy("route").agg(F.count("*").alias("n")).orderBy("route")
