"""Join guards and helpers.

The one piece of join policy the reference engine implements itself (its
join execution is otherwise delegated wholesale to DuckDB) is the
conditionless-join guard: a cross join is refused when |L|·|R| would reach
10^7 rows (reference: mindsdb/api/executor/sql_query/steps/join_step.py:
76-81, constant at 78). Spark itself would survive a huge cartesian via
spill, but the guard exists to fail fast on accidental blowups, so we keep
it for behavioral parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CROSS_JOIN_GUARD = 10_000_000  # join_step.py:78


def guarded_cross_join(
    left: DataFrame, right: DataFrame, guard: int = CROSS_JOIN_GUARD
) -> DataFrame:
    """Cross join that refuses when the product cardinality reaches `guard`.

    Sizing prefers Catalyst's plan statistics (free — parquet row counts,
    AQE runtime stats) and falls back to counting only when the plan has no
    estimate; the reference always counts because its inputs are already
    materialized pandas frames.
    """
    nl = _estimate_rows(left)
    nr = _estimate_rows(right)
    if nl * nr >= guard:
        raise ValueError(
            f"Unable to join table without condition: {nl} x {nr} rows >= {guard}"
        )
    return left.crossJoin(right)


def _estimate_rows(df: DataFrame) -> int:
    stats = df._jdf.queryExecution().optimizedPlan().stats()
    row_count = stats.rowCount()
    if row_count.isDefined():
        return int(str(row_count.get()))
    return df.count()
