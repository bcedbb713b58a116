"""Headline benchmark. Runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ..., "events_per_sec": ...}

Each query is forced through the full plan with a noop-format write
(count() would let Catalyst prune payload columns and understate the
work). Run `python bench.py --scaling` for the two-parallelism
scaling-efficiency measurement (results belong in BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marc_data_migration_spark.entry_queries import QUERIES  # noqa: E402
from marc_data_migration_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "cdc_apply",
    "cdc_dedup_max_lsn",
    "cdc_route_counts",
    "cdc_lookup_join",
    "pricing_summary",
    "topk_orders_per_segment",
    "exact_dedup",
    "fuzzy_ratio_pairs",
]


def _sf(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(parallelism: int, sf_dir: str) -> tuple[dict[str, float], int]:
    spark = get_spark(f"bench-{parallelism}", parallelism=parallelism)
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # Warm one-time session costs (JVM codegen, shuffle machinery, and
    # the Python-worker pool for pandas UDFs — each worker imports
    # pandas once) so timings reflect steady-state throughput, which is
    # what a long-running CDC stream actually sees.
    QUERIES["cdc_apply"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F

    from marc_data_migration_spark.functions.similarity import token_sort_ratio

    (
        spark.range(parallelism * 64)
        .repartition(parallelism)
        .select(token_sort_ratio(F.lit("warm up"), F.lit("up warm")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        best = float("inf")
        for _ in range(2):  # best-of-2: the sandbox VM is jittery
            df = QUERIES[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.stop()
    return timings, n_events


def main() -> None:
    if "--scaling" in sys.argv:
        # sandbox proxy for the N vs 4N executor rule (BASELINE.md): same
        # job, same input, two parallelism levels; efficiency on the
        # CDC-apply throughput.
        lo, hi = max(CPUS // 4, 1), CPUS
        t_lo, n = run_suite(lo, SF_DIR)
        t_hi, _ = run_suite(hi, SF_DIR)
        thr_lo = n / t_lo["cdc_apply"]
        thr_hi = n / t_hi["cdc_apply"]
        eff = (thr_hi / thr_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "cdc_apply scaling efficiency",
                    "value": round(eff, 3),
                    "unit": "ratio",
                    "sf": _sf(SF_DIR),
                    "parallelism": {str(lo): t_lo, str(hi): t_hi},
                    "events_per_sec": {str(lo): round(thr_lo), str(hi): round(thr_hi)},
                }
            )
        )
        return
    timings, n_events = run_suite(CPUS, SF_DIR)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf(SF_DIR),
                "events_per_sec": round(n_events / timings["cdc_apply"])
                if "cdc_apply" in timings
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
