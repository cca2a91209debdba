"""Plan-shape law for the exact vector scorers (r10 sweep finding).

The regression this pins: an expression attached AFTER the candidate
side's pre-join exchange lands in the join's OUTPUT stage, where the
broadcast nested-loop join re-evaluates it once per output row (|Q|
times per candidate) — and the widened project fell out of
whole-stage codegen, running the 40M-pair scorer interpreted (17 s
steady vs 3.8 s at the sf1 probe). The fix materializes per-row norms
BEFORE the exchange, so the join's output project computes exactly
one dot over pre-computed norm attributes.

The law: in each scorer's executed plan, the Project immediately
above the BroadcastNestedLoopJoin must not contain a SQRT — norms
must arrive as attributes from below the join, never recompute in the
per-pair stage.
"""

from __future__ import annotations

import pytest

from syllabus_sense_spark.queries import QUERIES, load_all_queries

load_all_queries()

SCORERS = [
    "ml_eval_retrieval_mrr",
    "search_semantic_docs",
]


@pytest.mark.parametrize("name", SCORERS)
def test_no_norm_recompute_in_pair_stage(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    bnlj_rows = [i for i, l in enumerate(lines) if "BroadcastNestedLoopJoin" in l]
    assert bnlj_rows, f"{name}: expected a broadcast nested-loop scorer join"
    for i in bnlj_rows:
        # nearest Project above the join = the per-pair output stage
        above = next(
            (lines[j] for j in range(i - 1, -1, -1) if "Project [" in lines[j]),
            "",
        )
        assert "SQRT" not in above, (
            f"{name}: norm recomputed in the per-pair project above the "
            f"BNLJ — materialize it before the exchange (see SCALE.md "
            f"round-10): {above[:160]}"
        )


@pytest.mark.parametrize(
    "name,topk",
    [("similarity_topk_bruteforce", 5), ("training_hard_negatives", 3)],
)
def test_scorer_is_arrow_kernel_with_local_topk(spark, sf_dir, name, topk):
    """r14 law for the exact matrix scorers: the scorer is a mapInArrow
    matrix kernel emitting per-partition top-k — the plan must carry NO
    BroadcastNestedLoopJoin (the per-pair row path is gone) and exactly
    one MapInArrow node below the rank window, whose output is the
    narrow scalar schema (the window exchange carries ≤ k·|Q| rows per
    partition, never the full pair set)."""
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("MapInArrow") == 1
    rows = df.collect()
    by_q: dict[int, list[int]] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert by_q, "no query rows"
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, topk + 1)), (qid, ranks)
