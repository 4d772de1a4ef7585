"""API-table Python Data Source: filter pushdown + residual semantics."""

import json
import os
import tempfile

import pytest

import mindsdb_spark.sources.api_source as api_src
from mindsdb_spark.sources.api_source import OP_EQ, OP_GT, register

# --- a fake REST endpoint ----------------------------------------------------
# Rows live in a JSON file ("the remote service"); the endpoint applies only
# the operators it declares in supported_ops and RECORDS what was pushed so
# tests can assert on the pushdown itself.

def _log_pushed(options, conditions):
    # The endpoint runs inside a Spark Python worker process, so the test
    # observes the pushdown via a side file, not shared memory.
    log = options.get("pushdown_log")
    if log:
        with open(log, "a") as fh:
            for c in conditions:
                fh.write(json.dumps([c.column, c.op, c.value]) + "\n")


def _pushed(log_path):
    if not os.path.exists(log_path):
        return []
    with open(log_path) as fh:
        return [tuple(json.loads(line)) for line in fh]


def fake_endpoint(options, conditions, page):
    _log_pushed(options, conditions)
    with open(options["path"]) as fh:
        rows = json.load(fh)
    if page is not None:
        rows = [r for r in rows if r["id"] % 2 == page]
    for cond in conditions:
        if cond.op == OP_EQ:
            rows = [r for r in rows if r.get(cond.column) == cond.value]
        elif cond.op == OP_GT:
            rows = [r for r in rows if r.get(cond.column) is not None and r[cond.column] > cond.value]
    return iter(rows)


fake_endpoint.supported_ops = (OP_EQ, OP_GT)


def paged_endpoint(options, conditions, page):
    return fake_endpoint(options, conditions, page)


paged_endpoint.supported_ops = (OP_EQ, OP_GT)
paged_endpoint.pages = lambda options, conditions: [0, 1]


@pytest.fixture(scope="module")
def api_data():
    rows = [
        {"id": 1, "kind": "a", "score": 10},
        {"id": 2, "kind": "b", "score": 20},
        {"id": 3, "kind": "a", "score": 30},
        {"id": 4, "kind": "a", "score": None},
    ]
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump(rows, fh)
    yield fh.name
    os.unlink(fh.name)


@pytest.fixture(scope="module")
def registered(spark):
    register(spark)
    return spark


def _read(spark, path, endpoint="tests.test_api_source:fake_endpoint", log=None):
    r = (
        spark.read.format("api_table")
        .schema("id long, kind string, score long")
        .option("endpoint", endpoint)
        .option("path", path)
    )
    if log:
        r = r.option("pushdown_log", log)
    return r.load()


def test_scan_all(registered, api_data):
    assert _read(registered, api_data).count() == 4


def test_filter_pushed_to_endpoint(registered, api_data, tmp_path):
    log = str(tmp_path / "pushed.jsonl")
    got = _read(registered, api_data, log=log).filter("kind = 'a' AND score > 5").collect()
    assert sorted(r["id"] for r in got) == [1, 3]
    # both predicates reached the endpoint as FilterConditions
    pushed = _pushed(log)
    assert ("kind", "=", "a") in pushed
    assert ("score", ">", 5) in pushed


def test_unsupported_filter_is_residual(registered, api_data, tmp_path):
    log = str(tmp_path / "pushed.jsonl")
    # LIKE 'b%' maps to StringStartsWith — not in supported_ops, so the
    # endpoint must NOT see it, yet the result must still honor it.
    got = _read(registered, api_data, log=log).filter("kind LIKE 'b%'").collect()
    assert [r["id"] for r in got] == [2]
    assert all(c[1] in ("=", ">") for c in _pushed(log))


def test_residual_correctness_on_pushed_subset(registered, api_data):
    # IS NOT NULL is unsupported -> residual; EQ is pushed. Both apply.
    got = _read(registered, api_data).filter("kind = 'a' AND score IS NOT NULL").collect()
    assert sorted(r["id"] for r in got) == [1, 3]


def test_paged_endpoint_parallel_partitions(registered, api_data):
    df = _read(registered, api_data, endpoint="tests.test_api_source:paged_endpoint")
    assert df.rdd.getNumPartitions() == 2
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3, 4]


def negating_endpoint(options, conditions, page):
    from mindsdb_spark.sources.api_source import (
        OP_ENDS_WITH, OP_NE, OP_NOT_IN, OP_STARTS_WITH,
    )

    _log_pushed(options, conditions)
    with open(options["path"]) as fh:
        rows = json.load(fh)
    for cond in conditions:
        if cond.op == OP_EQ:
            rows = [r for r in rows if r.get(cond.column) == cond.value]
        elif cond.op == OP_NE:
            rows = [r for r in rows if r.get(cond.column) != cond.value]
        elif cond.op == OP_NOT_IN:
            rows = [r for r in rows if r.get(cond.column) not in cond.value]
        elif cond.op == OP_STARTS_WITH:
            rows = [r for r in rows if str(r.get(cond.column, "")).startswith(cond.value)]
        elif cond.op == OP_ENDS_WITH:
            rows = [r for r in rows if str(r.get(cond.column, "")).endswith(cond.value)]
    return iter(rows)


negating_endpoint.supported_ops = ("=", "!=", "not in", "starts with", "ends with")


def test_negated_and_string_ops_pushed(registered, api_data, tmp_path):
    # the reference's NOT_EQUAL / NOT_IN / LIKE-prefix operators
    # (sql_utils.py:50,56,59) push through the DSv2 Filter tree
    log = str(tmp_path / "neg.jsonl")
    df = _read(registered, api_data,
               endpoint="tests.test_api_source:negating_endpoint", log=log)
    got = df.filter("kind != 'b'").collect()
    assert sorted(r["id"] for r in got) == [1, 3, 4]
    assert ("kind", "!=", "b") in _pushed(log)
    got = df.filter("id NOT IN (1, 2)").collect()
    assert sorted(r["id"] for r in got) == [3, 4]
    got = df.filter("kind LIKE 'a%'").collect()
    assert sorted(r["id"] for r in got) == [1, 3, 4]
    pushed_ops = {c[1] for c in _pushed(log)}
    assert {"!=", "starts with"} <= pushed_ops
