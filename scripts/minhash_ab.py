"""A/B comparison: round-1 seed-explode MinHash vs the current
one-shuffle array-of-mins shape (operators/text_dedup.py).

The two plans produce identical signatures (the oracle gate pins
that); this measures the cost difference. Interleaved best-of-N (the
sandbox VM throttles in phases) plus the shuffle-bytes evidence pulled
from Spark's execution metrics listener — shuffle volume is the
durable, throttle-immune number.

Run: python scripts/minhash_ab.py  [SF_DIR=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from marc_data_migration_spark.functions.text_analysis import md5int  # noqa: E402
from marc_data_migration_spark.operators.text_dedup import (  # noqa: E402
    minhash_signatures,
    shingles,
)
from marc_data_migration_spark.session import get_spark  # noqa: E402

N_HASHES = 8


def minhash_signatures_r1(df: DataFrame) -> DataFrame:
    """The round-1 shape: explode n_hashes seed rows per shingle row —
    the shingle string rides the shuffle n_hashes times."""
    sh = shingles(df, "text", "doc_id", 3)
    seeded = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("seed"),
        F.col("shingle"),
    )
    hashed = seeded.select(
        "doc_id",
        "seed",
        md5int(F.concat_ws("#", F.col("shingle"), F.col("seed").cast("string"))).alias("h"),
    )
    return hashed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def shuffle_bytes(spark, fn) -> tuple[float, int]:
    """Run fn() and return (wall sec, shuffle bytes written) summed over
    the job's new stages, read from the Spark UI REST API (the session
    here enables the UI solely for this)."""
    before_ids = {s["stageId"] for s in _stages(spark)}
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    total = sum(
        s.get("shuffleWriteBytes", 0)
        for s in _stages(spark)
        if s["stageId"] not in before_ids
    )
    return dt, total


def _stages(spark) -> list[dict]:
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages") as r:
        return json.load(r)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    spark = get_spark(
        "minhash-ab", parallelism=cpus, extra_conf={"spark.ui.enabled": "true"}
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    docs = docs.persist()
    docs.count()

    variants = {
        "r1_seed_explode": lambda: minhash_signatures_r1(docs)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        "r2_one_shuffle": lambda: minhash_signatures(docs)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    }
    best_sec: dict[str, float] = {}
    sh_bytes: dict[str, int] = {}
    for v in variants.values():  # warm-up both plans
        v()
    for _ in range(rounds):
        for name, v in variants.items():
            sec, sb = shuffle_bytes(spark, v)
            best_sec[name] = min(best_sec.get(name, float("inf")), sec)
            sh_bytes[name] = sb  # deterministic per plan — last wins
    print(
        json.dumps(
            {
                "metric": "minhash one-shuffle vs seed-explode",
                "speedup_x": round(
                    best_sec["r1_seed_explode"] / best_sec["r2_one_shuffle"], 2
                ),
                "shuffle_bytes": sh_bytes,
                "shuffle_cut_x": round(
                    sh_bytes["r1_seed_explode"] / max(sh_bytes["r2_one_shuffle"], 1), 2
                ),
                "best_sec": {k: round(v, 2) for k, v in best_sec.items()},
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
