"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q5 shape, probe P31) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle; the driver hash-compares them at
sf0.01 → CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mindsdb_spark.queries.probes import p31

    return p31(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from mindsdb_spark.queries.probes import PROBES
    from mindsdb_spark.queries.probes_ext import PROBES_EXT
    from mindsdb_spark.queries.pipeline import PIPELINE
    from mindsdb_spark.queries.kb_queries import KB_QUERIES
    from mindsdb_spark.queries.temporal_queries import TEMPORAL_QUERIES
    from mindsdb_spark.queries.engine_queries import ENGINE_QUERIES
    from mindsdb_spark.queries.streaming_queries import STREAMING_QUERIES

    out = {name: fn for name, (fn, _sql) in PROBES.items()}
    out.update({name: fn for name, (fn, _sql) in PROBES_EXT.items()})
    out.update({name: fn for name, (fn, _sql) in PIPELINE.items()})
    out.update({name: fn for name, (fn, _sql) in KB_QUERIES.items()})
    out.update({name: fn for name, (fn, _sql) in TEMPORAL_QUERIES.items()})
    out.update({name: fn for name, (fn, _sql) in ENGINE_QUERIES.items()})
    out.update({name: fn for name, (fn, _sql) in STREAMING_QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted → rows-only)."""
    from mindsdb_spark.queries.probes import PROBES
    from mindsdb_spark.queries.probes_ext import PROBES_EXT
    from mindsdb_spark.queries.pipeline import PIPELINE
    from mindsdb_spark.queries.kb_queries import KB_QUERIES
    from mindsdb_spark.queries.temporal_queries import TEMPORAL_QUERIES
    from mindsdb_spark.queries.engine_queries import ENGINE_QUERIES
    from mindsdb_spark.queries.streaming_queries import STREAMING_QUERIES

    out = {name: sql for name, (_fn, sql) in PROBES.items() if sql is not None}
    out.update({name: sql for name, (_fn, sql) in PROBES_EXT.items() if sql is not None})
    out.update({name: sql for name, (_fn, sql) in PIPELINE.items() if sql is not None})
    out.update({name: sql for name, (_fn, sql) in KB_QUERIES.items() if sql is not None})
    out.update({name: sql for name, (_fn, sql) in TEMPORAL_QUERIES.items() if sql is not None})
    out.update({name: sql for name, (_fn, sql) in ENGINE_QUERIES.items() if sql is not None})
    out.update({name: sql for name, (_fn, sql) in STREAMING_QUERIES.items() if sql is not None})
    return out
