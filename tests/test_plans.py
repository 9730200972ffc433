"""Physical-plan assertions (SURVEY §5.3): pushdown, broadcast, codegen.

These guard the scale posture: a refactor that silently drops a pushed
filter or turns a broadcast join into a shuffle join fails here, not
in a 100 TB run.
"""

from __future__ import annotations

from gentropy_spark.plans.genomics import q_window_clump_leads
from gentropy_spark.plans.relational import q1_pricing_summary, q5_local_supplier


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = _formatted(q1_pricing_summary(spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # Projection pruning: unused columns must not reach the scan.
    assert "l_orderkey" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = _formatted(q5_local_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") >= 3  # supplier, nation, region


def test_window_clump_single_exchange(spark, sf_dir):
    """All clumping windows share the (study, contig) partitioning — the
    plan must contain exactly ONE shuffle exchange (plus AQE wrappers),
    not one per window function."""
    plan = _formatted(q_window_clump_leads(spark, sf_dir))
    n_exchanges = plan.count("+- Exchange") + plan.count("   Exchange")
    assert n_exchanges == 1, f"expected 1 exchange, got {n_exchanges}:\n{plan}"


def test_q1_aggregation_is_partial(spark, sf_dir):
    """Sums must map-side combine (partial_ functions in HashAggregate)."""
    plan = _formatted(q1_pricing_summary(spark, sf_dir))
    assert "partial_sum" in plan or "partial_count" in plan
