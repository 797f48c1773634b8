"""Physical-plan QA utilities: the properties that keep plans fast at
100 TB, exposed as assertions/inspectors so pipelines (and this repo's
own tests, tests/test_plans.py) can gate on them in CI rather than
discover them in production.

The reference engine trusts Catalyst blindly (no hints, no plan checks
anywhere in M/T); at 100 TB the difference between a broadcast and a
shuffled join, or a pruned and an unpruned scan, is the job — these
helpers make the intended physical strategy executable documentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan string (post-AQE if the frame was executed)."""
    return df._jdf.queryExecution().executedPlan().toString()


def final_plan(df: DataFrame) -> str:
    """The final adaptive plan only — AdaptiveSparkPlan.toString prints
    the final AND the initial plan; counting markers across both
    double-counts (e.g. every Exchange)."""
    return executed_plan(df).split("Initial Plan")[0]


def count_exchanges(df: DataFrame) -> int:
    """Shuffle/broadcast boundaries in the final plan. Every exchange
    is a full materialization of its input — the unit of cost that
    matters first at scale."""
    return final_plan(df).count("Exchange")


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains an unkeyed join (CartesianProduct or
    BroadcastNestedLoopJoin). Intentional tiny-side broadcast cross
    joins excepted, this is the canonical scale-killer."""
    plan = executed_plan(df)
    return "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan


def scan_read_schema(df: DataFrame) -> str:
    """The ReadSchema of the first FileScan — what actually gets read
    from parquet after column pruning."""
    plan = executed_plan(df)
    scan = plan[plan.index("FileScan"):]
    return scan[: scan.index("\n")]


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters clause of the plan ('' if none). Filters that
    do not appear here re-read and re-filter every row JVM-side."""
    plan = executed_plan(df)
    if "PushedFilters" not in plan:
        return ""
    return plan.split("PushedFilters")[1].split("]")[0] + "]"


def assert_broadcast_join(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan, f"no broadcast join in:\n{plan}"


def assert_no_cartesian(df: DataFrame) -> None:
    assert not has_cartesian(df), (
        f"cartesian/nested-loop join in:\n{executed_plan(df)}"
    )


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    got = count_exchanges(df)
    assert got <= n, f"{got} exchanges (budget {n}):\n{final_plan(df)}"


def assert_column_pruned(df: DataFrame, column: str) -> None:
    schema = scan_read_schema(df)
    assert column not in schema, f"{column} not pruned from scan: {schema}"
