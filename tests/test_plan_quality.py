"""Physical-plan quality guard: no query may plan a cartesian product
or an unbounded nested-loop join — the two shapes that are quadratic
at 100 TB. Complements the prose audit in PLANS.md with an automated
check over every driver-contract query.
"""

from __future__ import annotations

import os

import pytest

from marc_data_migration_spark.entry_queries import QUERIES

# Brute-force cosine top-k is definitionally queries × corpus; the small
# query side is broadcast and the LSH variant (lsh_ann_topk) is the
# scale path — the one sanctioned nested-loop join in the engine.
NLJ_ALLOWED = {"embedding_cosine_topk"}

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata dir {SF_DIR} not present"
)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_quadratic_joins(spark, name):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    if name not in NLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} plans a nested-loop join — quadratic at scale"
        )


# Queries whose 100-TB shape is "small side broadcast, corpus never
# shuffles for the probe join" (PLANS.md): the benchmark side of the
# decontamination family, the location dim, the BPE word-table lookup,
# and the broadcast ANN query side. A SortMergeJoin appearing in any of
# these means the corpus started shuffling for the probe — the exact
# regression this guard exists to catch.
BROADCAST_PROBES = [
    "decontam_overlap",
    "fuzzy_decontam_pairs",
    "map_lookup_location",
    "bpe_doc_token_counts",
    "lsh_multitable_ann_topk",
]


@pytest.mark.parametrize("name", BROADCAST_PROBES)
def test_probe_joins_stay_broadcast(spark, name):
    plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan, (
        f"{name} lost its broadcast probe side"
    )
    assert "SortMergeJoin" not in plan, (
        f"{name} shuffles the corpus for its probe join"
    )
