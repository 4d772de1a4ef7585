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


def _req(server, path, method="GET", body=None):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}{path}",
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
        method=method,
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        raw = r.read()
        return r.status, json.loads(raw) if raw else None


def test_rest_catalog_endpoints(server, sf_dir):
    # the REST namespaces reference clients use (namespaces/databases.py,
    # projects.py): list/create/drop databases, tables, projects, models
    code, dbs = _req(server, "/api/databases")
    assert code == 200 and any(d["name"] == "tpch" for d in dbs)
    code, tables = _req(server, "/api/databases/tpch/tables")
    assert code == 200 and {t["name"] for t in tables} >= {"nation", "orders"}
    code, projects = _req(server, "/api/projects")
    assert code == 200 and projects == [{"name": "mindsdb"}]
    code, models = _req(server, "/api/projects/mindsdb/models")
    assert code == 200 and isinstance(models, list)
    code, created = _req(server, "/api/databases", "POST", {
        "database": {"name": "resty", "engine": "parquet",
                     "parameters": {"directory": sf_dir, "tables": ["region"]}}})
    assert code == 201 and created["name"] == "resty"
    code, dbs = _req(server, "/api/databases")
    assert any(d["name"] == "resty" for d in dbs)
    code, _ = _req(server, "/api/databases/resty", "DELETE")
    assert code == 204
    code, dbs = _req(server, "/api/databases")
    assert not any(d["name"] == "resty" for d in dbs)
    # missing fields → 400 in-band error
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        _req(server, "/api/databases", "POST", {"database": {"name": "x"}})


def test_rest_object_namespaces(server):
    # views/jobs/agents/knowledge_bases list endpoints
    # (namespaces/views.py:13-33, jobs.py:13-22)
    _post(server, "CREATE VIEW rest_v AS SELECT n_name FROM tpch_nation")
    _post(server, "CREATE JOB rest_j AS (SELECT 1) EVERY 1 hour")
    code, views = _req(server, "/api/projects/mindsdb/views")
    assert code == 200 and any(v["name"] == "rest_v" for v in views)
    assert all("query" in v for v in views)
    code, jobs = _req(server, "/api/projects/mindsdb/jobs")
    assert code == 200 and any(j["name"] == "rest_j" for j in jobs)
    code, agents = _req(server, "/api/projects/mindsdb/agents")
    assert code == 200 and isinstance(agents, list)
    code, kbs = _req(server, "/api/projects/mindsdb/knowledge_bases")
    assert code == 200 and isinstance(kbs, list)
    _post(server, "DROP VIEW rest_v")
    _post(server, "DROP JOB rest_j")


def test_rest_view_create_and_delete(server):
    code, created = _req(server, "/api/projects/mindsdb/views", "POST",
                         {"view": {"name": "rest_v2",
                                   "query": "SELECT n_name FROM tpch_nation"}})
    assert code == 201 and created["name"] == "rest_v2"
    code, views = _req(server, "/api/projects/mindsdb/views")
    assert any(v["name"] == "rest_v2" for v in views)
    # conflict on duplicate name (views.py:52-54)
    try:
        code, _ = _req(server, "/api/projects/mindsdb/views", "POST",
                       {"view": {"name": "rest_v2", "query": "SELECT 1"}})
    except Exception as e:  # urllib raises on 409
        code = e.code
    assert code == 409
    code, _ = _req(server, "/api/projects/mindsdb/views/rest_v2", "DELETE")
    assert code == 204
    code, views = _req(server, "/api/projects/mindsdb/views")
    assert not any(v["name"] == "rest_v2" for v in views)


def test_rest_model_predict(server):
    # reference: POST /api/projects/{p}/models/{m}/predict {data: [...]}
    # (docs/rest/models/query-model.mdx) — values arrive as strings
    _post(server, "CREATE MODEL rest_m (SELECT o_totalprice AS y, o_custkey "
                  "FROM tpch_orders) PREDICT y USING engine = 'spark_ml_linreg'")
    code, preds = _req(server, "/api/projects/mindsdb/models/rest_m/predict",
                       "POST", {"data": [{"o_custkey": "7"}, {"o_custkey": "11"}]})
    assert code == 200 and len(preds) == 2
    assert all(p["y"] is not None for p in preds)
    assert preds[0]["o_custkey"] == 7
    try:
        code, _ = _req(server, "/api/projects/mindsdb/models/nope/predict",
                       "POST", {"data": [{"x": 1}]})
    except Exception as e:
        code = e.code
    assert code == 404
    _post(server, "DROP MODEL rest_m")


def test_rest_model_lifecycle(server):
    # train via POST {query} (models.py:41-53), describe via GET one,
    # remove via DELETE (models.py:122-178)
    code, created = _req(server, "/api/projects/mindsdb/models", "POST",
                         {"query": "CREATE MODEL rest_m2 (SELECT o_totalprice AS y, "
                                   "o_custkey FROM tpch_orders) PREDICT y "
                                   "USING engine = 'spark_ml_linreg'"})
    assert code == 201 and created["name"] == "rest_m2"
    # re-creating an existing model answers 409 Conflict
    # (reference namespaces/models.py:69-73), not a silent retrain
    try:
        code, _ = _req(server, "/api/projects/mindsdb/models", "POST",
                       {"query": "CREATE MODEL rest_m2 (SELECT o_totalprice AS y, "
                                 "o_custkey FROM tpch_orders) PREDICT y "
                                 "USING engine = 'spark_ml_linreg'"})
    except Exception as e:
        code = e.code
    assert code == 409
    code, one = _req(server, "/api/projects/mindsdb/models/rest_m2")
    assert code == 200 and one["name"] == "rest_m2" and one["active_version"] == 1
    code, _ = _req(server, "/api/projects/mindsdb/models/rest_m2", "DELETE")
    assert code == 204
    try:
        code, _ = _req(server, "/api/projects/mindsdb/models/rest_m2")
    except Exception as e:
        code = e.code
    assert code == 404


def test_rest_files_namespace(server, tmp_path):
    import base64

    # upload by local path (reference file.py:43-90 JSON form)
    p = tmp_path / "pets.csv"
    p.write_text("pet,n\ncat,2\ndog,1\n")
    code, created = _req(server, "/api/files/pets", "PUT",
                         {"source_type": "path", "source": str(p)})
    assert code == 201 and created["name"] == "pets"
    out = _post(server, "SELECT pet, n FROM files_pets ORDER BY pet")
    assert out["data"] == [["cat", 2], ["dog", 1]]
    # upload raw content
    blob = base64.b64encode(b"x,y\n1,2\n").decode()
    code, _ = _req(server, "/api/files/tiny", "PUT",
                   {"source_type": "data", "content": blob, "format": "csv"})
    assert code == 201
    assert _post(server, "SELECT y FROM files_tiny")["data"] == [[2]]
    code, files = _req(server, "/api/files")
    assert {f["name"] for f in files} >= {"pets", "tiny"}
    code, _ = _req(server, "/api/files/pets", "DELETE")
    assert code == 204
    code, files = _req(server, "/api/files")
    assert not any(f["name"] == "pets" for f in files)
    # the data-upload temp file is engine-owned: DELETE unlinks it from disk
    import os

    tiny_path = server.session._files["tiny"]
    assert os.path.exists(tiny_path)
    _req(server, "/api/files/tiny", "DELETE")
    assert not os.path.exists(tiny_path)
    # the path-upload file is user-owned and must survive its DELETE
    assert p.exists()
