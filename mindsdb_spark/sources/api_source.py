"""API-table source: a Spark Python Data Source with filter pushdown.

The reference exposes REST endpoints as tables by translating the SELECT
where-tree into ``FilterCondition(column, op, value)`` objects the handler
forwards to the API, evaluating whatever the API can't filter as a residual
predicate (reference: mindsdb/integrations/libs/api_handler.py:205-501;
condition extraction mindsdb/integrations/utilities/sql_utils.py:44-92).

Spark-first equivalent: the DataSource V2 Python API. ``pushFilters``
receives Catalyst's pushable predicates, converts the ones an API endpoint
understands into FilterConditions, and returns the rest for Spark to apply
on top — exactly the reference's pushdown-plus-residual contract, but
driven by the optimizer instead of a hand-written where-tree walk.

Scale posture: ``partitions()`` fans a keyset-partitioned endpoint out to
one API page per Spark task (the reference's FetchDataframeStepPartition
thread pool becomes executor-parallel partition reads); each partition
fetches lazily on the executor, nothing proxies through the driver.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass
from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)
from pyspark.sql.types import StructType

# Operator vocabulary shared with the reference's FilterCondition
# (sql_utils.py:44-66).
OP_EQ = "="
OP_GT = ">"
OP_GE = ">="
OP_LT = "<"
OP_LE = "<="
OP_IN = "in"
OP_IS_NULL = "is null"
OP_IS_NOT_NULL = "is not null"
OP_CONTAINS = "contains"
OP_NE = "!="
OP_NOT_IN = "not in"
OP_STARTS_WITH = "starts with"
OP_ENDS_WITH = "ends with"


@dataclass(frozen=True)
class FilterCondition:
    """One pushable predicate handed to the endpoint."""

    column: str
    op: str
    value: Any = None


_FILTER_MAP = {
    EqualTo: OP_EQ,
    GreaterThan: OP_GT,
    GreaterThanOrEqual: OP_GE,
    LessThan: OP_LT,
    LessThanOrEqual: OP_LE,
}


def _to_condition(f: Filter) -> FilterCondition | None:
    for cls, op in _FILTER_MAP.items():
        if isinstance(f, cls):
            return FilterCondition(".".join(f.attribute), op, f.value)
    if isinstance(f, In):
        return FilterCondition(".".join(f.attribute), OP_IN, tuple(f.value))
    if isinstance(f, IsNull):
        return FilterCondition(".".join(f.attribute), OP_IS_NULL)
    if isinstance(f, IsNotNull):
        return FilterCondition(".".join(f.attribute), OP_IS_NOT_NULL)
    if isinstance(f, StringContains):
        return FilterCondition(".".join(f.attribute), OP_CONTAINS, f.value)
    if isinstance(f, StringStartsWith):
        return FilterCondition(".".join(f.attribute), OP_STARTS_WITH, f.value)
    if isinstance(f, StringEndsWith):
        return FilterCondition(".".join(f.attribute), OP_ENDS_WITH, f.value)
    if isinstance(f, Not):
        # negations of the pushable ops map onto the reference's NOT_*
        # operators (sql_utils.py:50,56) — != and NOT IN
        inner = _to_condition(f.child)
        if inner is not None and inner.op == OP_EQ:
            return FilterCondition(inner.column, OP_NE, inner.value)
        if inner is not None and inner.op == OP_IN:
            return FilterCondition(inner.column, OP_NOT_IN, inner.value)
    return None


def _load_endpoint(path: str):
    """Resolve a ``module:attr`` endpoint factory."""
    mod, _, attr = path.partition(":")
    return getattr(importlib.import_module(mod), attr)


class _ApiPartition(InputPartition):
    def __init__(self, index: int, page: Any):
        self.index = index
        self.page = page


class ApiTableReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.conditions: list[FilterCondition] = []
        self.endpoint = _load_endpoint(options["endpoint"])

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        supported = set(getattr(self.endpoint, "supported_ops", ()))
        for f in filters:
            cond = _to_condition(f)
            if cond is not None and (not supported or cond.op in supported):
                self.conditions.append(cond)
            else:
                yield f  # residual: Spark evaluates it above the scan

    def partitions(self) -> list[InputPartition]:
        pages = getattr(self.endpoint, "pages", None)
        if pages is None:
            return [_ApiPartition(0, None)]
        return [_ApiPartition(i, p) for i, p in enumerate(pages(self.options, self.conditions))]

    def read(self, partition: _ApiPartition) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        for row in self.endpoint(self.options, self.conditions, partition.page):
            yield tuple(row.get(n) for n in names)


class ApiTableDataSource(DataSource):
    """``spark.read.format("api_table").schema(...).option("endpoint",
    "pkg.mod:fn").load()``.

    The endpoint callable receives (options, conditions, page) and yields
    dict rows; an optional ``pages(options, conditions)`` attribute splits
    the fetch into executor-parallel pages, and ``supported_ops`` declares
    which operators the API accepts (everything else stays a Spark-side
    residual filter).
    """

    @classmethod
    def name(cls) -> str:
        return "api_table"

    def schema(self) -> str | StructType:
        ddl = self.options.get("table_schema")
        if not ddl:
            raise ValueError("api_table requires .schema(...) or a table_schema option")
        return ddl

    def reader(self, schema: StructType) -> ApiTableReader:
        return ApiTableReader(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(ApiTableDataSource)
