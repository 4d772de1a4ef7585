"""HTTP SQL door: POST /api/sql/query against a live EngineSession
(reference contract: mindsdb/api/http/namespaces/sql.py:41-190)."""

import json
import urllib.request

import pytest

from mindsdb_spark.engine import EngineSession
from mindsdb_spark.server import SQLServer


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["nation", "orders"])
    srv = SQLServer(sess).start()
    yield srv
    srv.stop()


def _post(server, query):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/api/sql/query",
        data=json.dumps({"query": query}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_query_roundtrip(server):
    out = _post(server, "SELECT n_regionkey, COUNT(*) AS cnt FROM tpch_nation "
                        "GROUP BY n_regionkey ORDER BY n_regionkey")
    assert out["type"] == "table"
    assert out["column_names"] == ["n_regionkey", "cnt"]
    assert sum(row[1] for row in out["data"]) == 25


def test_json_type_coercion(server):
    out = _post(server, "SELECT o_orderkey, o_orderdate FROM tpch_orders "
                        "WHERE o_orderkey <= 2 ORDER BY o_orderkey")
    assert out["type"] == "table"
    assert all(isinstance(row[1], str) for row in out["data"])  # dates → ISO strings


def test_commands_and_errors_in_band(server):
    assert _post(server, "SHOW DATABASES")["type"] == "table"
    err = _post(server, "SELECT FROM nowhere_at_all !!")
    assert err["type"] == "error" and err["error_message"]


def test_nan_normalizes_to_null(server):
    out = _post(server, "SELECT CAST('nan' AS DOUBLE) AS bad, sqrt(-1) AS worse, 1.5 AS ok")
    assert out["type"] == "table"
    assert out["data"][0] == [None, None, 1.5]
