"""Streaming corpus ingestion (quality gate → PII scrub → incremental
near-dup filter → idempotent append + metrics) — the streaming face of
the corpus_curation batch flagship.

Pinned: per-batch conservation (n_in = n_low_quality + n_dups +
n_kept), cross-batch dup drop, quality drops (short AND repetitive),
PII never stored raw, and full replay idempotence (fresh checkpoint
over the same ingest dir converges to the identical corpus + metrics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from marc_data_migration_spark.streaming.corpus_ingest import (
    CorpusIngest,
    run_corpus_stream,
)
from marc_data_migration_spark.streaming.stream import stage_feed_chunks


def _chunks_pd(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    c1 = docs[docs.doc_id < 150]
    # cross-batch dup of doc 30 + a PII-bearing doc (long enough to pass
    # the quality gate)
    import pandas as pd

    dup = docs[docs.doc_id == 30].assign(doc_id=1_000_030)
    # unique text (NOT derived from an existing doc — that would make it
    # a legitimate near-dup and the filter would rightly drop it)
    pii_text = (
        " ".join(f"uniqueword{i} filler{i * 7 % 13}" for i in range(25))
        + " reach me at pii@example.com or +1-555-0042"
    )
    c2 = pd.concat(
        [
            docs[(docs.doc_id >= 150) & (docs.doc_id < 300)],
            dup,
            pd.DataFrame([{"doc_id": 7_000_000, "text": pii_text}]),
        ],
        ignore_index=True,
    )
    junk = pd.DataFrame(
        [
            {"doc_id": 8_000_000, "text": "spam " * 80},  # top_token_ratio 1.0
            {"doc_id": 8_000_001, "text": "too short"},  # n_tokens < 30
        ]
    )
    c3 = pd.concat(
        [docs[(docs.doc_id >= 300) & (docs.doc_id < 450)], junk], ignore_index=True
    )
    return [c1, c2, c3]


def _state(ingest):
    corpus = {
        (r.doc_id, r.text) for r in ingest.corpus().select("doc_id", "text").collect()
    }
    metrics = sorted(
        tuple(r) for r in ingest.metrics().select(
            "batch_id", "n_in", "n_low_quality", "n_dups", "n_kept"
        ).collect()
    )
    return corpus, metrics


def test_corpus_ingest_stream(spark, tmp_path):
    chunks = _chunks_pd(spark)
    stage_feed_chunks(chunks, str(tmp_path / "feed"))
    ingest = CorpusIngest(spark, str(tmp_path / "corpus"))
    run_corpus_stream(spark, str(tmp_path / "feed"), ingest, str(tmp_path / "ckpt"))

    corpus, metrics = _state(ingest)
    ids = {i for i, _ in corpus}

    # conservation per batch + corpus total
    for _, n_in, n_lq, n_dups, n_kept in metrics:
        assert n_in == n_lq + n_dups + n_kept
    assert len(corpus) == sum(m[4] for m in metrics)

    # cross-batch dup dropped, original kept
    assert 30 in ids and 1_000_030 not in ids
    # quality drops
    assert 8_000_000 not in ids and 8_000_001 not in ids
    assert metrics[2][2] >= 2  # both junk docs counted as low-quality

    # PII is never stored raw; the planted doc is kept, scrubbed
    assert 7_000_000 in ids
    pii_rows = [t for i, t in corpus if i == 7_000_000]
    assert "pii@example.com" not in pii_rows[0]
    assert "<EMAIL>" in pii_rows[0] and "<PHONE>" in pii_rows[0]
    assert (
        ingest.corpus().filter(F.col("text").contains("@example.com")).count() == 0
    )

    # replay the WHOLE feed with a fresh checkpoint over the same state:
    # every batch is a replay → identical corpus and metrics
    run_corpus_stream(spark, str(tmp_path / "feed"), ingest, str(tmp_path / "ckpt2"))
    corpus2, metrics2 = _state(ingest)
    assert corpus2 == corpus
    assert metrics2 == metrics


def test_corpus_ingest_zero_batches_metrics_empty(spark, tmp_path):
    """A feed that produced no batches reports empty typed metrics, not
    an AnalysisException (the CLI summary path reads it unconditionally)."""
    ingest = CorpusIngest(spark, str(tmp_path / "corpus"))
    m = ingest.metrics()
    assert m.count() == 0
    assert m.columns == ["batch_id", "n_in", "n_low_quality", "n_dups", "n_kept"]


def test_corpus_ingest_batch_single_pass(spark, tmp_path):
    """The per-batch hot path is single-pass over the batch input: the
    quality gate is evaluated once into a persisted boolean-column
    projection, and the stats aggregation, the dedup probe, and the
    commit all read that cache — 1 scan of the input total. The
    pre-fix shape (separate docs.count()/clean.count() + unpersisted
    chain) scanned the input 4+ times. Pinned with an
    accumulator-instrumented source: every evaluation of an input
    partition bumps it."""
    chunks = _chunks_pd(spark)
    data = [(int(r.doc_id), str(r.text)) for r in chunks[0].itertuples(index=False)]
    sc = spark.sparkContext
    acc = sc.accumulator(0)
    n_parts = 2

    def bump(it):
        acc.add(1)
        yield from it

    rdd = sc.parallelize(data, n_parts).mapPartitions(bump)
    docs = spark.createDataFrame(rdd, "doc_id long, text string")
    ingest = CorpusIngest(spark, str(tmp_path / "corpus"))
    ingest.apply_batch(docs, 0)
    scans = acc.value / n_parts
    assert scans <= 1, f"batch input scanned {scans} times (budget: 1)"
    # metrics semantics unchanged by the single-pass rewrite
    (m,) = ingest.metrics().collect()
    assert m.n_in == len(data)
    assert m.n_in == m.n_low_quality + m.n_dups + m.n_kept
