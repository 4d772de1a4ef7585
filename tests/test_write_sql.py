"""SQL write verbs (CTAS / INSERT / UPDATE / DELETE) through EngineSession."""

import pytest

from mindsdb_spark.engine import EngineSession


@pytest.fixture()
def wsess(spark, sf_dir, tmp_path):
    s = EngineSession(spark)
    s.register_parquet_source("tpch", sf_dir)
    s.register_writable_source("wh", str(tmp_path / "wh"))
    return s


def test_ctas_insert_update_delete_roundtrip(wsess):
    wsess.sql(
        "CREATE TABLE wh.top_orders AS "
        "SELECT o_orderkey, o_custkey, o_totalprice FROM tpch_orders "
        "ORDER BY o_totalprice DESC LIMIT 10"
    )
    assert wsess.sql("SELECT count(*) AS n FROM wh_top_orders").collect()[0]["n"] == 10

    wsess.sql("INSERT INTO wh.top_orders VALUES (999999, 1, 123.45), (999998, 2, 67.89)")
    assert wsess.sql("SELECT count(*) AS n FROM wh_top_orders").collect()[0]["n"] == 12

    n = wsess.sql(
        "UPDATE wh.top_orders SET o_totalprice = o_totalprice + 1 WHERE o_orderkey = 999999"
    ).collect()[0]["updated"]
    assert n == 1
    got = wsess.sql(
        "SELECT o_totalprice FROM wh_top_orders WHERE o_orderkey = 999999"
    ).collect()[0][0]
    assert abs(got - 124.45) < 1e-9

    n = wsess.sql("DELETE FROM wh.top_orders WHERE o_orderkey >= 999998").collect()[0]["deleted"]
    assert n == 2
    assert wsess.sql("SELECT count(*) AS n FROM wh_top_orders").collect()[0]["n"] == 10


def test_insert_from_select(wsess):
    wsess.sql(
        "CREATE OR REPLACE TABLE wh.eu_customers AS "
        "SELECT c_custkey, c_name FROM tpch_customer WHERE c_nationkey = 7"
    )
    before = wsess.sql("SELECT count(*) AS n FROM wh_eu_customers").collect()[0]["n"]
    wsess.sql(
        "INSERT INTO wh.eu_customers "
        "SELECT c_custkey, c_name FROM tpch_customer WHERE c_nationkey = 8"
    )
    after = wsess.sql("SELECT count(*) AS n FROM wh_eu_customers").collect()[0]["n"]
    extra = wsess.sql(
        "SELECT count(*) AS n FROM tpch_customer WHERE c_nationkey = 8"
    ).collect()[0]["n"]
    assert after == before + extra and extra > 0


def test_delete_without_writable_source_falls_through(wsess):
    # DELETE against a non-writable table is not hijacked; Spark rejects it
    with pytest.raises(Exception):
        wsess.sql("DELETE FROM tpch_orders WHERE o_orderkey = 1").collect()
