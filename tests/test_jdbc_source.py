"""JDBCSource end-to-end against embedded Derby (bundled with Spark):
lazy partitioned reads, filter pushdown into the database, whole-query
pushdown through the engine, and fallback on bad dialect."""

import shutil

import pytest

from mindsdb_spark.engine import EngineSession
from mindsdb_spark.sources.jdbc_source import JDBCSource

DERBY_DIR = "/root/repo/.derby_test_db"
PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def jdbc(spark, sf_dir):
    shutil.rmtree(DERBY_DIR, ignore_errors=True)
    url = f"jdbc:derby:{DERBY_DIR};create=true"
    from mindsdb_spark.catalog import load_table

    nation = load_table(spark, sf_dir, "nation")
    # Derby folds unquoted identifiers to uppercase; write uppercase names
    # so unquoted SQL pushed to the database resolves (Spark's JDBC writer
    # quotes whatever case it is given)
    nation = nation.toDF(*[c.upper() for c in nation.columns])
    nation.write.jdbc(url, "NATION", mode="overwrite", properties=PROPS)
    src = JDBCSource(
        spark,
        url,
        tables=["nation"],  # engine-side name; Derby sees NATION
        properties=PROPS,
        partition_options={"nation": {"column": "N_NATIONKEY", "lowerBound": 0,
                                      "upperBound": 25, "numPartitions": 4}},
    )
    yield src
    shutil.rmtree(DERBY_DIR, ignore_errors=True)


def test_partitioned_lazy_read(jdbc):
    df = jdbc.read("nation")
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 25


def test_filter_pushed_into_database(jdbc):
    df = jdbc.read("nation").filter("N_REGIONKEY = 2").select("N_NAME")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "N_REGIONKEY" in plan.split("PushedFilters")[1][:200]
    assert df.count() > 0


def test_whole_query_pushdown_via_engine(spark, jdbc):
    sess = EngineSession(spark)
    sess.register_native_source("der", jdbc)
    before = jdbc.pushdowns
    rows = sess.sql(
        "SELECT N_REGIONKEY, COUNT(*) AS CNT FROM der_nation "
        "GROUP BY N_REGIONKEY ORDER BY N_REGIONKEY"
    ).collect()
    assert jdbc.pushdowns == before + 1
    assert sess.last_execution == ("pushdown", "der")
    assert sum(r[1] for r in rows) == 25


def test_bad_dialect_falls_back_to_spark(spark, jdbc):
    sess = EngineSession(spark)
    sess.register_native_source("der", jdbc)
    # DATE_FORMAT is MySQL dialect Derby can't parse: the schema round-trip
    # fails at build time and the federated Spark plan answers instead
    rows = sess.sql(
        "SELECT DATE_FORMAT(DATE '2024-03-01', '%Y-%m') AS ym, COUNT(*) AS c "
        "FROM der_nation GROUP BY ym"
    ).collect()
    assert rows[0][0] == "2024-03" and rows[0][1] == 25
    assert sess.last_execution == ("spark", None)


def test_native_query_passthrough_jdbc(spark, jdbc):
    sess = EngineSession(spark)
    sess.register_native_source("der", jdbc)
    rows = sess.sql(
        "SELECT N_NAME FROM der (SELECT N_NAME, N_REGIONKEY FROM nation "
        "WHERE N_REGIONKEY = 1) t ORDER BY N_NAME"
    ).collect()
    assert len(rows) > 0


def test_jdbc_insert_writeback(spark, jdbc):
    """INSERT INTO <jdbc_source>.<table> routes back to the database
    (reference: insert_step.py:13-124 writes to the integration) —
    distributed df.write.jdbc append, visible on the next lazy read."""
    sess = EngineSession(spark)
    sess.register_native_source("der", jdbc)
    before = jdbc.read("nation").count()
    sess.sql(
        "INSERT INTO der.nation VALUES (97, 'NATION_X', 1), (98, 'NATION_Y', 2)"
    )
    after = jdbc.read("nation")
    assert after.count() == before + 2
    got = {r[0]: r[1] for r in after.filter("N_NATIONKEY >= 97").collect()}
    assert got == {97: "NATION_X", 98: "NATION_Y"}
    # column-list form NULL-fills the rest and casts to target types
    sess.sql("INSERT INTO der.nation (n_nationkey, n_name) VALUES (99, 'NATION_Z')")
    row = jdbc.read("nation").filter("N_NATIONKEY = 99").collect()[0]
    assert row["N_NAME"] == "NATION_Z" and row["N_REGIONKEY"] is None
    # the federated view sees the new rows without re-registration (lazy)
    assert sess.sql("SELECT COUNT(*) AS c FROM der_nation").collect()[0][0] == before + 3


def test_jdbc_update_delete_writeback(spark, jdbc):
    """UPDATE/DELETE against a JDBC source run IN the database (reference:
    update_step.py:16-127, delete_step.py:18-48 render to the source
    dialect and execute there) — one driver-side statement, affected-row
    count returned, next lazy read sees the change."""
    sess = EngineSession(spark)
    sess.register_native_source("der", jdbc)
    sess.sql("INSERT INTO der.nation VALUES (90, 'NATION_UPD', 3)")
    n = sess.sql(
        "UPDATE der.nation SET N_NAME = 'NATION_RENAMED' WHERE N_NATIONKEY = 90"
    ).collect()[0][0]
    assert n == 1
    got = jdbc.read("nation").filter("N_NATIONKEY = 90").collect()[0]
    assert got["N_NAME"] == "NATION_RENAMED"
    n = sess.sql("DELETE FROM der.nation WHERE N_NATIONKEY = 90").collect()[0][0]
    assert n == 1
    assert jdbc.read("nation").filter("N_NATIONKEY = 90").count() == 0
