"""Registry-wide physical-plan quality gate: build EVERY queries()
entry and assert the two plan smells that silently kill 100 TB scale
never appear —

* ``CartesianProduct``: an unkeyed join that didn't broadcast; at
  corpus scale this is O(n^2) shuffle. (BroadcastNestedLoopJoin with a
  tiny side is the accepted pattern and is NOT flagged.)
* ``BatchEvalPython``: a row-at-a-time Python UDF in the plan; the
  only sanctioned Python boundaries are Arrow-batched
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas[WithState]).

Some gate queries execute work during construction (db mutations,
eager persists, the PCA sketch collect) — that's fine here; the final
DataFrame's executedPlan is still the artifact under audit.
"""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Queries whose construction starts/stops streaming queries or spends
# real wall-clock on staged micro-batches — plan-audited by their own
# dedicated tests (test_streaming_join, test_db stream tests) instead.
SKIP = {
    "streaming_bucket_agg",
    "streaming_score_drift",
    "streaming_watermarked_agg",
    "streaming_sessionize",
    "streaming_dedup",
    "streaming_decontam",
    "streaming_distinct",
    "streaming_join",
    "continuous_rollup",
    "s13_changes_feed",
}


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries()) - SKIP))
def test_no_plan_smells(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in executedPlan — an unkeyed join "
        f"escaped broadcast; O(n^2) at scale"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (BatchEvalPython) — use "
        f"Arrow-batched pandas UDFs"
    )
