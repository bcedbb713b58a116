"""Streaming corpus ingestion — the streaming face of the
`corpus_curation` batch flagship: documents arriving as a stream are
quality-gated, PII-scrubbed, near-dup-filtered against EVERYTHING
already ingested, and appended to a growing corpus table with
per-batch metrics. This is the shape a production training-data
pipeline actually runs at 100 TB: the corpus accretes continuously;
re-running batch curation over the full corpus per arrival is not an
option.

Per micro-batch (foreachBatch):
1. quality gate  — Catalyst-only `quality_features` thresholds
   (min tokens, max top_token_ratio: the Gopher repetition rule);
2. PII scrub     — `redact_pii` projection (kept docs are stored
   scrubbed; the corpus never contains raw PII);
3. near-dup gate — `IncrementalLshDedup.apply_batch`: collision
   against ANY previously kept doc's band index drops the doc
   (conservative min-id-wins within the batch);
4. commit        — kept docs land in `docs/batch_id=N/` (dynamic
   partition overwrite → rewriting the same batch is byte-idempotent)
   and one metrics row (n_in, n_low_quality, n_dups, n_kept) lands in
   `metrics/batch_id=N/`.

Exactly-once: every per-batch artifact is keyed by batch_id —
the dedup band index skips re-publish on replay (strictly-earlier
probe semantics), and the docs/metrics partitions are overwritten
in place — so a replayed batch converges to the identical on-disk
state no matter where the previous attempt died.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text_analysis import quality_features, redact_pii
from .incremental_dedup import IncrementalLshDedup

DOCS_SCHEMA = "doc_id long, text string"
METRICS_SCHEMA = (
    "batch_id long, n_in long, n_low_quality long, n_dups long, n_kept long"
)


class CorpusIngest:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        min_tokens: int = 30,
        max_top_token_ratio: float = 0.5,
    ):
        self.spark = spark
        self.path = path
        self.docs_path = os.path.join(path, "docs")
        self.metrics_path = os.path.join(path, "metrics")
        self.dedup = IncrementalLshDedup(spark, path)
        self.min_tokens = min_tokens
        self.max_top_token_ratio = max_top_token_ratio

    # -- one micro-batch ---------------------------------------------------
    def apply_batch(self, docs: DataFrame, batch_id: int) -> None:
        feats = quality_features("text")
        gate = (feats["n_tokens"] >= self.min_tokens) & (
            feats["top_token_ratio"] <= self.max_top_token_ratio
        )
        # The gate is evaluated ONCE per batch, as a boolean COLUMN in a
        # persisted projection; everything else derives from the cache:
        # - the n_in/n_good stats are one aggregation over the cached
        #   rows (the token-feature HOFs are the dominant per-row cost
        #   — re-running them for a second counting scan doubles the
        #   hot path);
        # - `clean` (gate filter + PII scrub) feeds both the dedup
        #   probe's signature computation and the kept-docs commit.
        # Materializing `_ok` as a column (rather than a filter
        # predicate) also keeps the HOFs in a codegen'd Project — a
        # Filter node carrying them directly is evaluated interpreted,
        # measured 14× slower on this exact path.
        gated = docs.select("doc_id", "text", gate.alias("_ok")).persist()
        stats = gated.agg(
            F.count(F.lit(1)).alias("n_in"),
            F.sum(F.col("_ok").cast("long")).alias("n_good"),
        ).first()
        n_in = int(stats["n_in"])
        n_good = int(stats["n_good"] or 0)
        # scrub BEFORE dedup so the published band index and the stored
        # corpus describe the same text
        clean = gated.filter(F.col("_ok")).select(
            "doc_id", redact_pii("text").alias("text")
        )
        kept = self.dedup.apply_batch(clean, batch_id).persist()
        n_kept = kept.count()
        (
            kept.withColumn("batch_id", F.lit(batch_id).cast("long"))
            .coalesce(4)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.docs_path)
        )
        kept.unpersist()
        gated.unpersist()
        # range + lits, NOT createDataFrame([row]): the latter
        # parallelizes one Python row into defaultParallelism pickled
        # partitions, and the single-file commit then paid one
        # sequential Python-runner evaluation per partition — measured
        # ~4.5 s per 1-row metrics commit (bench.ingest_run profile),
        # ~35% of the whole ingest batch. numPartitions=1 is explicit:
        # a bare range(1) still has defaultParallelism (empty)
        # partitions — ~32 no-op tasks per metrics commit.
        metrics = self.spark.range(0, 1, 1, 1).select(
            F.lit(int(batch_id)).cast("long").alias("batch_id"),
            F.lit(int(n_in)).cast("long").alias("n_in"),
            F.lit(int(n_in - n_good)).cast("long").alias("n_low_quality"),
            F.lit(int(n_good - n_kept)).cast("long").alias("n_dups"),
            F.lit(int(n_kept)).cast("long").alias("n_kept"),
        )
        (
            metrics.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.metrics_path)
        )

    # -- views ----------------------------------------------------------------
    def corpus(self) -> DataFrame:
        if not os.path.isdir(self.docs_path):
            return self.spark.createDataFrame([], DOCS_SCHEMA + ", batch_id long")
        return self.spark.read.parquet(self.docs_path)

    def metrics(self) -> DataFrame:
        # an empty feed produces zero batches and no metrics directory;
        # report that as an empty typed frame, not an AnalysisException
        if not os.path.isdir(self.metrics_path):
            return self.spark.createDataFrame([], METRICS_SCHEMA)
        return self.spark.read.parquet(self.metrics_path)


def run_corpus_stream(
    spark: SparkSession,
    feed_dir: str,
    ingest: CorpusIngest,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
):
    """Tail a staged directory of document parquet chunks through the
    ingestion pipeline. availableNow semantics like run_stream: drains
    what exists, returns; same checkpoint resumes exactly-once."""
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(feed_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: ingest.apply_batch(df, bid)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
