"""Streaming (batch-incremental) MinHash-LSH near-dup filter.

Invariants pinned here:
1. band-cleanliness — across the WHOLE stream, no two kept
   signature-bearing docs share a band-hash (the pairwise guarantee
   batch LSH + keep-one gives);
2. cross-batch duplicates are dropped, the earlier copy survives;
3. replaying a batch is a no-op: same kept set, index unchanged;
4. short (shingle-free) docs always pass through;
5. the stream's kept set is consistent with the batch operator: every
   batch-LSH candidate pair loses at least one member.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from marc_data_migration_spark.operators.text_dedup import (
    band_hashes,
    lsh_candidate_pairs,
    minhash_signatures,
)
from marc_data_migration_spark.streaming.incremental_dedup import IncrementalLshDedup


def _batches(spark, tmp_path=None):
    """3 micro-batches over the sf0.01 documents with planted dups:
    batch1 = docs 0..149; batch2 = docs 150..299 PLUS copies of every
    30th batch-1 doc (cross-batch dups, ids +1M); batch3 = docs
    300..449 plus a within-batch dup pair (ids +2M, +3M of doc 300)
    and one short shingle-free doc (id 9M)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    b1 = docs.filter(F.col("doc_id") < 150)
    dups12 = (
        docs.filter((F.col("doc_id") < 150) & (F.col("doc_id") % 30 == 0))
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    b2 = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300)).unionByName(dups12)
    twin = docs.filter(F.col("doc_id") == 300).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    twin2 = docs.filter(F.col("doc_id") == 300).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    short = spark.createDataFrame([(9_000_000, "too short")], "doc_id long, text string")
    b3 = (
        docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 450))
        .unionByName(twin)
        .unionByName(twin2)
        .unionByName(short)
    )
    return [b1, b2, b3]


def test_incremental_dedup_invariants(spark, tmp_path):
    batches = _batches(spark)
    filt = IncrementalLshDedup(spark, str(tmp_path / "dedup"))
    kept = []
    for i, b in enumerate(batches):
        kept.append(filt.apply_batch(b, batch_id=i))
    kept_ids = sorted(
        r.doc_id for df in kept for r in df.select("doc_id").collect()
    )
    assert len(kept_ids) == len(set(kept_ids))

    # (2) cross-batch planted dups dropped, originals survive
    planted = {r.doc_id for r in batches[1].filter(F.col("doc_id") >= 1_000_000).collect()}
    assert planted.isdisjoint(kept_ids)
    assert all((p - 1_000_000) in kept_ids for p in planted)

    # within-batch twin pair of doc 300: doc 300 (min id) survives alone
    assert 300 in kept_ids
    assert 2_000_300 not in kept_ids and 3_000_300 not in kept_ids

    # (4) shingle-free doc passes through
    assert 9_000_000 in kept_ids

    # (1) band-cleanliness across the whole stream — checked in the
    # SAME hash family the filter used (the invariant is per-family:
    # a kept set clean under xxhash bands need not be clean under md5
    # bands, since different families select different colliders)
    spark_kept = spark.createDataFrame([(i,) for i in kept_ids], "doc_id long")
    all_docs = batches[0].unionByName(batches[1]).unionByName(batches[2])
    kept_docs = all_docs.join(spark_kept, "doc_id", "left_semi")
    bands = band_hashes(
        minhash_signatures(kept_docs, fast=filt.fast_hash), fast=filt.fast_hash
    )
    dirty = bands.groupBy("band", "bh").count().filter(F.col("count") > 1).count()
    assert dirty == 0

    # (5) consistency with the batch operator: every batch-LSH candidate
    # pair over the full stream has at least one dropped member
    pairs = lsh_candidate_pairs(
        minhash_signatures(all_docs, fast=filt.fast_hash), fast=filt.fast_hash
    )
    ks = set(kept_ids)
    both_kept = [
        (r.a, r.b) for r in pairs.collect() if r.a in ks and r.b in ks
    ]
    assert both_kept == []


def test_incremental_dedup_replay_idempotent(spark, tmp_path):
    batches = _batches(spark)
    filt = IncrementalLshDedup(spark, str(tmp_path / "dedup"))
    kept0 = {r.doc_id for r in filt.apply_batch(batches[0], batch_id=0).collect()}
    kept1 = {r.doc_id for r in filt.apply_batch(batches[1], batch_id=1).collect()}
    rows_before = filt._index().count()

    # replay batch 1 on the same filter: identical kept set, no index growth
    kept1_replay = {r.doc_id for r in filt.apply_batch(batches[1], batch_id=1).collect()}
    assert kept1_replay == kept1
    assert filt._index().count() == rows_before

    # replay batch 0 (an OLD batch) — also identical: the probe slice is
    # strictly-earlier batches, so its own and later bands don't count
    kept0_replay = {r.doc_id for r in filt.apply_batch(batches[0], batch_id=0).collect()}
    assert kept0_replay == kept0
    assert filt._index().count() == rows_before


def test_incremental_dedup_ledger_read_once(spark, tmp_path):
    """The applied-batch ledger is read from the parquet index ONCE per
    object lifetime; per-batch index reads are only the strictly-earlier
    probe slice — NOT a per-batch distinct-collect of the whole index
    (which is O(batches²) read volume over a long stream)."""
    batches = _batches(spark)
    filt = IncrementalLshDedup(spark, str(tmp_path / "dedup"))
    calls = []
    orig = filt._index
    filt._index = lambda: (calls.append(1), orig())[1]
    for i, b in enumerate(batches):
        filt.apply_batch(b, batch_id=i).count()
    # 1 initial ledger read + 1 probe slice per batch
    assert len(calls) == len(batches) + 1
    # the publish reconciled the in-memory cache — answering the ledger
    # question afterwards touches NO storage
    filt._index = lambda: (_ for _ in ()).throw(AssertionError("index re-read"))
    assert filt.applied_batch_ids() == {0, 1, 2}
    # a fresh object resumes the ledger from the parquet index
    filt2 = IncrementalLshDedup(spark, str(tmp_path / "dedup"))
    assert filt2.applied_batch_ids() == {0, 1, 2}

    # publish fan-in is bounded: each batch appends at most
    # PUBLISH_PARTITIONS part-files (no coalesce(1) single-task funnel,
    # no shuffle-partition-count tiny-file spray)
    import os

    parts = [f for f in os.listdir(filt.index_path) if f.startswith("part-")]
    assert len(parts) <= len(batches) * IncrementalLshDedup.PUBLISH_PARTITIONS


def test_incremental_dedup_hash_family_is_index_property(spark, tmp_path):
    """The hash family is persisted at first publish and enforced at
    open: bands from the two families never collide with each other,
    so probing a stored index with the wrong family would silently
    disable dedup — a conflicting open must raise instead."""
    import os

    import pytest

    from marc_data_migration_spark.streaming.incremental_dedup import PROPS_FILE

    batches = _batches(spark)
    path = str(tmp_path / "dedup")
    filt = IncrementalLshDedup(spark, path)  # new index: defaults fast
    assert filt.fast_hash is True
    # construction is side-effect-free: no directory, no props yet (a
    # status path building the object must not commit the choice)
    assert not os.path.exists(os.path.join(path, PROPS_FILE))
    filt.apply_batch(batches[0], batch_id=0).count()
    assert os.path.isfile(os.path.join(path, PROPS_FILE))

    # resume without an explicit choice inherits the stored family
    filt2 = IncrementalLshDedup(spark, path)
    assert filt2.fast_hash is True
    # conflicting explicit choice fails loudly
    with pytest.raises(ValueError, match="hash family"):
        IncrementalLshDedup(spark, path, fast_hash=False)

    # an md5-family index is still constructible (oracle-portable mode)
    slow = IncrementalLshDedup(spark, str(tmp_path / "dedup_md5"), fast_hash=False)
    assert slow.fast_hash is False
    kept = slow.apply_batch(batches[0], batch_id=0)
    assert kept.count() > 0


def test_incremental_dedup_legacy_index_resolves_md5(spark, tmp_path):
    """A band_index that predates the props file was built with the
    portable md5 family: opening it must resolve to fast_hash=False
    (NOT the fast default — xxhash probes would silently never collide
    with the stored md5 bands, re-admitting every historical dup), and
    an explicit fast_hash=True over it must raise."""
    import os

    import pytest

    from marc_data_migration_spark.streaming.incremental_dedup import PROPS_FILE

    batches = _batches(spark)
    path = str(tmp_path / "dedup")
    # build an md5 index, then delete the props file to simulate legacy
    old = IncrementalLshDedup(spark, path, fast_hash=False)
    kept0 = {r.doc_id for r in old.apply_batch(batches[0], batch_id=0).collect()}
    os.remove(os.path.join(path, PROPS_FILE))

    legacy = IncrementalLshDedup(spark, path)
    assert legacy.fast_hash is False
    with pytest.raises(ValueError, match="md5-family"):
        IncrementalLshDedup(spark, path, fast_hash=True)

    # the resolved family actually probes the stored bands: batch-1
    # copies of batch-0 docs are still dropped after the legacy open
    dups = batches[0].limit(0).unionByName(
        batches[0].filter(F.col("doc_id") % 30 == 0).select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
        )
    )
    kept1 = {r.doc_id for r in legacy.apply_batch(dups, batch_id=1).collect()}
    assert kept1 == set()
    assert kept0  # sanity: batch 0 kept something to collide with
