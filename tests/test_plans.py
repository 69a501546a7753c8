"""Plan-shape regression tests (SURVEY.md §5.2 item 5).

Correctness tests prove the numbers; these prove the PLAN — the thing
that decides whether a query survives a 100x scale-up.  Each assertion
pins a physical-plan property worth defending:

- dimension joins broadcast (no fact-side shuffle),
- global top-k executes as TakeOrderedAndProject (per-partition heap +
  O(k) driver merge, never a total sort),
- filters and column pruning reach the parquet scan,
- aggregates are partial (map-side combine) before the shuffle.
"""

from __future__ import annotations

from osm_changesets_to_parquet_spark import queries as Q

Q.load_all_modules()


def _plan(spark, sf_dir, name: str) -> str:
    df = Q.REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q10_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q10_join4_revenue")
    assert "BroadcastHashJoin" in plan
    # the orders fact table must not be exchanged for the dim joins:
    # every join with region/nation/customer is broadcast, so no
    # SortMergeJoin should appear at this scale shape
    assert "SortMergeJoin" not in plan


def test_q24_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q24_topk")
    assert "TakeOrderedAndProject" in plan


def test_q36_cosine_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q36_cosine_topk")
    assert "TakeOrderedAndProject" in plan
    # brute-force scan must not globally sort 100 TB of similarities
    assert "rangepartitioning" not in plan.lower()


def test_q02_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_filter_project")
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    # column pruning: untouched wide columns never leave the scan
    assert "l_comment" not in plan


def test_q04_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q04_groupby_agg")
    # partial_ aggregate functions before the exchange, final after —
    # the shuffle carries O(keys) rows, not O(input)
    assert "partial_sum" in plan or "partial_count" in plan


def test_q01_count_prunes_all_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_count")
    assert "ReadSchema: struct<>" in plan


def test_q19_single_window_exchange(spark, sf_dir):
    # rank/row_number/dense_rank over the same window spec must share
    # one shuffle + sort, not one per function
    plan = _plan(spark, sf_dir, "q19_rank_topn")
    assert plan.count("Exchange hashpartitioning(o_custkey") <= 1


def test_s1_streaming_uses_stateful_agg(spark, sf_dir):
    # batch spelling of the tumbling window still plans as a hash agg
    # over window structs — no explode of per-row windows
    plan = _plan(spark, sf_dir, "s1_tumbling_window")
    assert "HashAggregate" in plan
