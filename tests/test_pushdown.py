"""Whole-query pushdown to a native-SQL source (reference:
query_planner.py:787-807 check_single_integration — a query touching
exactly one SQL-capable integration and no project objects is sent to
that integration's engine whole)."""

import pytest

from mindsdb_spark.engine import EngineSession, _table_refs
from mindsdb_spark.sources.duckdb_source import DuckDBSource


@pytest.fixture(scope="module")
def sess(spark, sf_dir):
    s = EngineSession(spark)
    s.register_parquet_source("tpch", sf_dir, tables=["orders", "customer"])
    s._duck = DuckDBSource.from_parquet_dir(spark, sf_dir, tables=["nation", "region"])
    s.register_native_source("duck", s._duck)
    return s


def test_table_refs():
    assert _table_refs("SELECT * FROM a JOIN b ON a.x = b.y") == ["a", "b"]
    assert _table_refs("SELECT * FROM a, b WHERE a.x = b.y") == ["a", "b"]
    assert _table_refs("WITH c AS (SELECT 1 FROM t) SELECT * FROM c") == ["t", "c"]
    assert _table_refs("SELECT (SELECT max(x) FROM u) FROM duck.nation n") == [
        "u", "duck.nation"
    ]
    # alias after the table, clause keywords, strings containing FROM
    assert _table_refs(
        "SELECT 'from fake' FROM a t1, b t2 ORDER BY x"
    ) == ["a", "b"]


def test_pushdown_single_source(sess):
    before = sess._duck.pushdowns
    df = sess.sql(
        "SELECT n_regionkey, COUNT(*) AS cnt FROM duck_nation "
        "GROUP BY n_regionkey ORDER BY n_regionkey"
    )
    rows = [tuple(r) for r in df.collect()]
    assert sess._duck.pushdowns == before + 1
    assert sess.last_execution == ("pushdown", "duck")
    # same result through the federated Spark plan
    sess.pushdown_enabled = False
    try:
        expected = [tuple(r) for r in sess.sql(
            "SELECT n_regionkey, COUNT(*) AS cnt FROM duck_nation "
            "GROUP BY n_regionkey ORDER BY n_regionkey"
        ).collect()]
        assert sess.last_execution == ("spark", None)
    finally:
        sess.pushdown_enabled = True
    assert rows == expected


def test_pushdown_dotted_and_join_within_source(sess):
    before = sess._duck.pushdowns
    df = sess.sql(
        "SELECT r_name, COUNT(*) AS cnt FROM duck.nation n "
        "JOIN duck.region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r_name ORDER BY r_name"
    )
    assert df.count() > 0
    assert sess._duck.pushdowns == before + 1


def test_cross_source_query_stays_federated(sess):
    before = sess._duck.pushdowns
    df = sess.sql(
        "SELECT COUNT(*) AS cnt FROM tpch_customer c "
        "JOIN duck_nation n ON c.c_nationkey = n.n_nationkey"
    )
    assert df.collect()[0][0] > 0
    assert sess._duck.pushdowns == before
    assert sess.last_execution == ("spark", None)


def _both_paths(sess, sql):
    """Run `sql` with pushdown on and off; return (pushed_rows, federated_rows)."""
    pushed = [tuple(r) for r in sess.sql(sql).collect()]
    pushed_exec = sess.last_execution
    sess.pushdown_enabled = False
    try:
        federated = [tuple(r) for r in sess.sql(sql).collect()]
    finally:
        sess.pushdown_enabled = True
    return pushed, pushed_exec, federated


def test_date_format_translates_and_pushes(sess):
    # round-3 VERDICT item 5: DATE_FORMAT is RENDERED to DuckDB strftime
    # (reference renders per-dialect, sqlalchemy_render.py:545-686) instead
    # of blocking pushdown; results match the federated plan bit-for-bit
    before = sess._duck.pushdowns
    sql = (
        "SELECT DATE_FORMAT(DATE '2024-03-01', '%Y-%m') AS ym, COUNT(*) AS c "
        "FROM duck_nation GROUP BY ym"
    )
    pushed, pushed_exec, federated = _both_paths(sess, sql)
    assert pushed_exec == ("pushdown", "duck")
    assert sess._duck.pushdowns == before + 1
    assert pushed == federated
    assert pushed[0][0] == "2024-03"


def test_length_translates_and_pushes(sess):
    # MySQL LENGTH = bytes → DuckDB strlen (bytes); both paths agree
    before = sess._duck.pushdowns
    sql = (
        "SELECT n_nationkey, LENGTH(n_name) AS lb FROM duck_nation "
        "ORDER BY n_nationkey"
    )
    pushed, pushed_exec, federated = _both_paths(sess, sql)
    assert pushed_exec == ("pushdown", "duck")
    assert sess._duck.pushdowns == before + 1
    assert pushed == federated and pushed[0][1] > 0


def test_mixed_dialect_functions_push(sess):
    sql = (
        "SELECT HASH(n_name) AS h, MONTHNAME(DATE '2024-03-01') AS mn, "
        "TRUNCATE(n_nationkey / 7.0, 2) AS t FROM duck_nation "
        "WHERE n_nationkey < 5 ORDER BY h"
    )
    pushed, pushed_exec, federated = _both_paths(sess, sql)
    assert pushed_exec == ("pushdown", "duck")
    assert pushed == federated
    assert pushed[0][1] == "March"


def test_untranslatable_dialect_fn_stays_federated(sess):
    # CONVERT_TZ has no DuckDB entry in the translation table: pushdown must
    # refuse (missing translation ≠ silent divergence) and the federated
    # plan answers
    before = sess._duck.pushdowns
    df = sess.sql(
        "SELECT CONVERT_TZ(TIMESTAMP '2024-03-01 12:00:00', 'UTC', 'UTC') AS t "
        "FROM duck_nation WHERE n_nationkey = 0"
    )
    assert df.count() == 1
    assert sess._duck.pushdowns == before  # never attempted
    assert sess.last_execution == ("spark", None)


def test_cte_over_single_source_pushes(sess):
    before = sess._duck.pushdowns
    df = sess.sql(
        "WITH big AS (SELECT * FROM duck_nation WHERE n_nationkey > 5) "
        "SELECT COUNT(*) AS c FROM big"
    )
    assert df.collect()[0][0] >= 0
    assert sess._duck.pushdowns == before + 1


def test_write_verbs_never_push(sess):
    before = sess._duck.pushdowns
    sess.sql("SHOW DATABASES").collect()
    assert sess._duck.pushdowns == before
