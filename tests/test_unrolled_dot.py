"""r06 optimization guard: the unrolled (codegen) dot/cosine forms must
be BIT-IDENTICAL to the interpreted aggregate(zip_with(...)) fold they
replaced — same left-to-right IEEE addition order, so not just close:
equal as 64-bit doubles. A drift here would silently break every
ANN-family oracle hash."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from marc_data_migration_spark.operators.similarity_search import (
    _as_double,
    _dot,
    _norm,
    _pair_cosine,
)


def _agg_dot(a, b):
    # the pre-r06 interpreted form, kept here as the reference
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


@pytest.fixture(scope="module")
def vec_df(spark):
    # deterministic 'random' doubles incl. negatives and magnitudes
    # spread over several orders — summation order matters for these
    dim = 64
    # id+1: id=0 would make va the zero vector and the cosine test a
    # division by zero (ANSI mode) — the operators assume non-zero
    # vectors, as does the real corpus
    rows = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.sin((F.col("id") + 1) * (i + 1) * 0.7) * (10.0 ** ((i % 7) - 3))
                ).cast("double")
                for i in range(dim)
            ]
        ).alias("va"),
        F.array(
            *[
                (
                    F.cos((F.col("id") + 1) * (i + 2) * 1.3) * (10.0 ** ((i % 5) - 2))
                ).cast("double")
                for i in range(dim)
            ]
        ).alias("vb"),
    )
    return rows


def test_unrolled_dot_bit_identical(spark, vec_df):
    out = vec_df.select(
        _dot(F.col("va"), F.col("vb"), 64).alias("unrolled"),
        _agg_dot(F.col("va"), F.col("vb")).alias("agg"),
    ).collect()
    assert len(out) == 200
    for r in out:
        # exact equality, not approx: the fold order is identical
        assert r.unrolled == r.agg


def test_unrolled_literal_dot_bit_identical(spark, vec_df):
    lits = [round(math.sin(i) * 3.0, 6) for i in range(64)]
    arr = F.array(*[F.lit(x) for x in lits])
    out = vec_df.select(
        _dot(F.col("va"), lits).alias("unrolled"),
        _agg_dot(F.col("va"), arr).alias("agg"),
    ).collect()
    for r in out:
        assert r.unrolled == r.agg


def test_offset_dot_matches_slice(spark, vec_df):
    lits = [round(math.cos(i) * 2.0, 6) for i in range(16)]
    arr = F.array(*[F.lit(x) for x in lits])
    out = vec_df.select(
        _dot(F.col("va"), lits, offset=16).alias("unrolled"),
        _agg_dot(F.slice(F.col("va"), 17, 16), arr).alias("agg"),
        _dot(F.col("va"), F.col("va"), 16, offset=16).alias("unrolled_self"),
        _agg_dot(
            F.slice(F.col("va"), 17, 16), F.slice(F.col("va"), 17, 16)
        ).alias("agg_self"),
    ).collect()
    for r in out:
        assert r.unrolled == r.agg
        assert r.unrolled_self == r.agg_self


def test_pair_cosine_matches_inline_cosine(spark, vec_df):
    """Precomputed-norm scoring == the single-expression _cosine, bit
    for bit (same values through the same multiply/divide/round)."""
    legacy = F.round(
        _agg_dot(F.col("va"), F.col("vb"))
        / (
            F.sqrt(_agg_dot(F.col("va"), F.col("va")))
            * F.sqrt(_agg_dot(F.col("vb"), F.col("vb")))
        ),
        4,
    )
    out = vec_df.select(
        _pair_cosine(
            _dot(F.col("va"), F.col("vb"), 64),
            _norm(F.col("va"), 64),
            _norm(F.col("vb"), 64),
        ).alias("new"),
        legacy.alias("old"),
    ).collect()
    for r in out:
        assert r.new == r.old


def test_as_double_cast_matches_transform(spark):
    df = spark.range(50).select(
        F.array(
            *[(F.col("id") * (i + 1) / 7.0).cast("float") for i in range(8)]
        ).alias("f")
    )
    out = df.select(
        _as_double(F.col("f")).alias("cast_arr"),
        F.transform(F.col("f"), lambda x: x.cast("double")).alias("hof_arr"),
    ).collect()
    for r in out:
        assert r.cast_arr == r.hof_arr
