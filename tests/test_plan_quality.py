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

import pytest

import __spark_entry__ as entry_mod

from conftest import ENTRY_STREAMING

# Streaming queries (construction starts/stops streaming queries or
# spends real wall-clock on staged micro-batches) are plan-audited by
# their own dedicated tests (test_streaming_join, test_db stream tests).
SKIP = ENTRY_STREAMING


@pytest.mark.parametrize("name", sorted(set(entry_mod.queries()) - SKIP))
def test_no_plan_smells(spark, entry_artifacts, name):
    # The plan string comes from the session-wide one-pass construction
    # cache (conftest.entry_artifacts), captured at construction time
    # before any execution — the identical AQE initial-plan artifact
    # this gate always audited, built once instead of a second time.
    art = entry_artifacts[name]
    if "err" in art:
        raise art["err"]
    plan = art["plan"]
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in executedPlan — an unkeyed join "
        f"escaped broadcast; O(n^2) at scale"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF (BatchEvalPython) — use "
        f"Arrow-batched pandas UDFs"
    )
