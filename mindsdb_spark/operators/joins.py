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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with key salting for skewed keys.

    The manual form of what AQE's skew-join split does at runtime, for when
    the skew is known up front (e.g. a null-heavy or celebrity key): the
    probe side gets a deterministic per-row salt in [0, salt), the build
    side is replicated salt times, and the join runs on (keys..., salt) —
    one hot key's rows spread across `salt` tasks instead of one straggler.
    Shuffle volume grows by ×salt on the (smaller) replicated side only.

    Deterministic: the salt is a hash of the probe row's key columns plus
    a monotonic disambiguator, not a random number, so results and retries
    are stable. Semantics are identical to ``left.join(right, on, how)``
    for equi-joins on the given keys (inner/left).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left equi-joins")
    from pyspark.sql import functions as F

    lsalted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*keys, F.monotonically_increasing_id()), F.lit(salt))
    )
    rsalted = right.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = lsalted.join(rsalted, [*keys, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    n_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join key.

    The co-located-join layout: two tables bucketed on the same key with
    the same bucket count join WITHOUT a shuffle — each task reads bucket
    i from both sides (Exchange disappears from the plan; with sort_cols
    the per-bucket Sort disappears too). This is the storage-side answer
    to repeated large-to-large joins at 100 TB: pay one write-time
    partitioning, then every downstream join on that key is shuffle-free.
    `tests/test_plans.py::test_bucketed_join_has_no_exchange` pins the
    plan shape.
    """
    from mindsdb_spark import catalog

    # one writer implementation: delegate to catalog.write_bucketed (the
    # scale-hardened pre-repartitioned path). This signature's default is
    # NO sort unless sort_cols is given — sort_by=[] preserves that.
    scols = (
        []
        if sort_cols is None
        else [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    )
    catalog.write_bucketed(df, table, bucket_cols, buckets=n_buckets, sort_by=scols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: salt the (large, skewed) left side into
    `n_salts` shards per key, replicate the right side across every shard,
    join on (key, salt).

    A hot key's rows spread over `n_salts` tasks instead of hammering one
    reducer — the manual form of what AQE's skew-join split does at
    runtime (session.py enables that too; this helper is for when the skew
    is known ahead of time or AQE's thresholds don't trigger, e.g. a
    deliberately salted pre-partitioned layout). Result equals the plain
    equi-join exactly; only the shuffle distribution changes. The
    replicated side multiplies by n_salts — keep it the smaller input.
    """
    from pyspark.sql import functions as F

    salted_l = left.withColumn(
        "__salt", (F.abs(F.hash(F.col(key), F.monotonically_increasing_id())) % n_salts)
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(salted_r, on=[key, "__salt"], how=how)
    return out.drop("__salt")
