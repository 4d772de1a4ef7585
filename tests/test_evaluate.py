"""`EVALUATE <metric> FROM (query)` and the ALTER/UPDATE lifecycle verbs.

Reference surface: command_executor.py:846-880 (answer_evaluate_metric,
sklearn metrics over an (actual, prediction) frame rounded to n_decimals),
AlterView / answer_alter_database (1308-1313) / answer_alter_kb (1458-1470)
/ answer_update_agent (1514-1529).
"""

import math

import pytest

from mindsdb_spark.engine import EngineSession

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark):
    sess = EngineSession(spark)
    sess.register_parquet_source("td", SF_DIR, tables=["orders", "region", "nation"])
    return sess


REG_INNER = (
    "SELECT o_totalprice AS actual, "
    "AVG(o_totalprice) OVER (PARTITION BY o_custkey) AS prediction FROM td_orders"
)
CLS_INNER = (
    "SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS actual, "
    "CASE WHEN o_totalprice > 140000 THEN 1 ELSE 0 END AS prediction FROM td_orders"
)


def _pairs(engine):
    return [
        (r.actual, r.prediction)
        for r in engine.sql(REG_INNER).collect()
    ]


def _round3(x):
    return math.floor(x * 1000 + 0.5) / 1000


def test_regression_metrics_match_manual(engine):
    pairs = _pairs(engine)
    n = len(pairs)
    mae = sum(abs(a - p) for a, p in pairs) / n
    mse = sum((a - p) ** 2 for a, p in pairs) / n
    mean_a = sum(a for a, _ in pairs) / n
    ss_tot = sum((a - mean_a) ** 2 for a, _ in pairs)
    r2 = 1 - sum((a - p) ** 2 for a, p in pairs) / ss_tot
    for metric, expected in [
        ("mean_absolute_error", mae),
        ("mean_squared_error", mse),
        ("root_mean_squared_error", math.sqrt(mse)),
        ("r2_score", r2),
        ("max_error", max(abs(a - p) for a, p in pairs)),
    ]:
        got = engine.sql(f"EVALUATE {metric} FROM ({REG_INNER})").collect()[0]
        assert got.__fields__ == [metric]
        assert got[0] == pytest.approx(_round3(expected), abs=1.5e-3), metric


def test_n_decimals(engine):
    d3 = engine.sql(f"EVALUATE mean_absolute_error FROM ({REG_INNER})").collect()[0][0]
    d6 = engine.sql(
        f"EVALUATE mean_absolute_error FROM ({REG_INNER}) USING n_decimals = 6"
    ).collect()[0][0]
    assert d3 == _round3(d6) or abs(d3 - d6) < 1e-3


def test_classification_metrics_match_manual(engine):
    rows = engine.sql(CLS_INNER).collect()
    tp = sum(1 for r in rows if r.actual == 1 and r.prediction == 1)
    pp = sum(1 for r in rows if r.prediction == 1)
    ap = sum(1 for r in rows if r.actual == 1)
    acc = sum(1 for r in rows if r.actual == r.prediction) / len(rows)
    rec0 = sum(1 for r in rows if r.actual == 0 and r.prediction == 0) / sum(
        1 for r in rows if r.actual == 0
    )
    for metric, expected in [
        ("accuracy_score", acc),
        ("precision_score", tp / pp),
        ("recall_score", tp / ap),
        ("f1_score", 2 * tp / (pp + ap)),
        ("balanced_accuracy_score", (tp / ap + rec0) / 2),
    ]:
        got = engine.sql(f"EVALUATE {metric} FROM ({CLS_INNER})").collect()[0][0]
        assert got == pytest.approx(_round3(expected), abs=1.5e-3), metric


def test_missing_column_and_nulls_raise(engine):
    with pytest.raises(ValueError, match="`prediction` column"):
        engine.sql(
            "EVALUATE r2_score FROM (SELECT o_totalprice AS actual FROM td_orders)"
        )
    with pytest.raises(ValueError, match="missing values"):
        engine.sql(
            "EVALUATE r2_score FROM (SELECT o_totalprice AS actual, "
            "CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice END AS prediction "
            "FROM td_orders)"
        )
    with pytest.raises(ValueError, match="unknown metric"):
        engine.sql(f"EVALUATE not_a_metric FROM ({REG_INNER})")


def test_alter_view(engine):
    engine.sql("CREATE VIEW ev_v1 AS SELECT r_regionkey FROM td_region")
    assert engine.sql("SELECT * FROM ev_v1").columns == ["r_regionkey"]
    engine.sql("ALTER VIEW ev_v1 AS SELECT r_regionkey, r_name FROM td_region")
    assert engine.sql("SELECT * FROM ev_v1").columns == ["r_regionkey", "r_name"]
    with pytest.raises(KeyError):
        engine.sql("ALTER VIEW no_such_view AS SELECT 1")
    engine.sql("DROP VIEW ev_v1")


def test_alter_database(engine):
    engine.sql(
        "CREATE DATABASE ev_db WITH ENGINE = 'parquet', "
        'PARAMETERS = {"directory": "%s", "tables": ["region"]}' % SF_DIR
    )
    assert engine.sql("SELECT count(*) AS c FROM ev_db_region").collect()[0].c == 5
    engine.sql('ALTER DATABASE ev_db PARAMETERS = {"tables": ["region", "nation"]}')
    assert engine.sql("SELECT count(*) AS c FROM ev_db_nation").collect()[0].c == 25
    with pytest.raises(KeyError):
        engine.sql('ALTER DATABASE no_such_db PARAMETERS = {"x": 1}')
    engine.sql("DROP DATABASE ev_db")
    # dropping clears the registration — a later ALTER must fail
    with pytest.raises(KeyError):
        engine.sql('ALTER DATABASE ev_db PARAMETERS = {"x": 1}')


def test_alter_kb_and_update_agent(engine):
    engine.sql("CREATE KNOWLEDGE_BASE ev_kb USING dim = 8")
    engine.sql("ALTER KNOWLEDGE_BASE ev_kb USING reranking_model = false")
    assert engine._kbs["ev_kb"]["params"] == {"reranking_model": "false"}
    # the embedding model itself cannot change post-hoc (alter.mdx)
    with pytest.raises(ValueError, match="embedding model"):
        engine.sql("ALTER KNOWLEDGE_BASE ev_kb USING embedder = 'other'")
    engine.sql("CREATE AGENT ev_ag USING model = 'm1'")
    engine.sql("UPDATE AGENT ev_ag SET model = 'm2', retrieval_k = 5")
    spec = engine._agents["ev_ag"]
    assert spec.model_name == "m2" and spec.retrieval_k == 5
    with pytest.raises(KeyError):
        engine.sql("UPDATE AGENT no_such_agent SET model = 'x'")
    engine.sql("DROP AGENT ev_ag")
    engine.sql("DROP KNOWLEDGE_BASE ev_kb")


def test_evaluate_drift_sql_door(spark, sf_dir):
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["orders"])
    out = sess.sql(
        "EVALUATE DRIFT ON o_totalprice "
        "FROM (SELECT o_totalprice FROM tpch_orders WHERE o_orderdate < '1998-01-01') "
        "AGAINST (SELECT o_totalprice FROM tpch_orders WHERE o_orderdate >= '1998-01-01') "
        "USING bins = 5"
    ).collect()
    assert len(out) == 5 and {r["bin"] for r in out} == {0, 1, 2, 3, 4}
    assert all(abs(r["psi"]) < 1.0 for r in out)  # same distribution: tiny psi
    cat = sess.sql(
        "EVALUATE DRIFT ON o_orderpriority "
        "FROM (SELECT o_orderpriority FROM tpch_orders WHERE o_orderdate < '1998-01-01') "
        "AGAINST (SELECT o_orderpriority FROM tpch_orders WHERE o_orderdate >= '1998-01-01') "
        "USING categorical = true"
    ).collect()
    assert len(cat) >= 2 and "category" in cat[0].asDict()


def test_kb_evaluate_generate_mode(spark, sf_dir, tmp_path):
    # EVALUATE KNOWLEDGE_BASE ... USING generate = true: the test set is
    # generated from stored chunks via the mock LLM, persisted to
    # test_table when given, then scored by doc id (reference
    # evaluate.py:117-186 generate_data + EvaluateDocID)
    s = EngineSession(spark)
    s.register_parquet_source("src", sf_dir)
    s.register_writable_source("wh", str(tmp_path / "wh"))
    s.sql("CREATE KNOWLEDGE_BASE kbgen USING dim = 8, embedder = 'md5'")
    s.sql("INSERT INTO kbgen SELECT doc_id, text FROM src_documents WHERE doc_id < 30")
    row = s.sql(
        "EVALUATE KNOWLEDGE_BASE kbgen USING generate = true, count = 5, k = 20, "
        "test_table = wh.kb_testset"
    ).collect()[0]
    assert row["total_questions"] == 5
    assert 0 <= row["total_found"] <= 5
    assert row["answers_digest"]
    # the generated test set persisted with the reference's column shape
    saved = s.sql("SELECT * FROM wh_kb_testset").collect()
    assert len(saved) == 5
    assert set(saved[0].asDict()) == {"question", "answer", "doc_id"}
    assert all(r["answer"].startswith("llm:") for r in saved)


def test_kb_evaluate_llm_relevancy_version(spark, sf_dir):
    # version = 'llm_relevancy' (reference EvaluateRerank,
    # evaluate.py:271-466): mock-scored relevance metrics per query
    s = EngineSession(spark)
    s.register_parquet_source("src", sf_dir)
    s.sql("CREATE KNOWLEDGE_BASE kbrel USING dim = 8, embedder = 'md5'")
    s.sql("INSERT INTO kbrel SELECT doc_id, text FROM src_documents WHERE doc_id < 20")
    row = s.sql(
        "EVALUATE KNOWLEDGE_BASE kbrel USING generate = true, count = 4, "
        "version = 'llm_relevancy'"
    ).collect()[0]
    assert row["total_questions"] == 4
    assert 0.0 <= row["avg_relevancy"] <= 1.0
    assert 0.0 <= row["avg_ndcg"] <= 1.0
    assert 0.0 <= row["mean_mrr"] <= 1.0
    with pytest.raises(NotImplementedError):
        s.sql(
            "EVALUATE KNOWLEDGE_BASE kbrel USING generate = true, "
            "version = 'bogus'"
        )


def test_kb_evaluate_from_sql_and_save_to(spark, sf_dir, tmp_path):
    # generate_data from_sql source + save_to scores sink (reference
    # evaluate.py:118-137, 222-228)
    s = EngineSession(spark)
    s.register_parquet_source("src", sf_dir)
    s.register_writable_source("wh", str(tmp_path / "wh"))
    s.sql("CREATE KNOWLEDGE_BASE kbfs USING dim = 8, embedder = 'md5'")
    s.sql("INSERT INTO kbfs SELECT doc_id, text FROM src_documents WHERE doc_id < 20")
    row = s.sql(
        "EVALUATE KNOWLEDGE_BASE kbfs USING generate = true, count = 3, "
        "from_sql = 'SELECT doc_id AS id, text AS content FROM src_documents "
        "WHERE doc_id < 20', save_to = wh.kb_scores"
    ).collect()[0]
    assert row["total_questions"] == 3
    saved = s.sql("SELECT * FROM wh_kb_scores").collect()
    assert len(saved) == 1 and saved[0]["total_questions"] == 3
    # a second run appends
    s.sql(
        "EVALUATE KNOWLEDGE_BASE kbfs USING generate = true, count = 3, "
        "save_to = wh.kb_scores"
    ).collect()
    assert len(s.sql("SELECT * FROM wh_kb_scores").collect()) == 2
    # from_sql without a content column is the reference's error
    with pytest.raises(Exception, match="content"):
        s.sql(
            "EVALUATE KNOWLEDGE_BASE kbfs USING generate = true, "
            "from_sql = 'SELECT doc_id FROM src_documents'"
        )


def test_kb_evaluate_unwritable_save_to_raises(spark, sf_dir):
    # round-4 advice: save_to / test_table that don't resolve to a writable
    # source must raise instead of silently skipping the persist
    s = EngineSession(spark)
    s.register_parquet_source("src", sf_dir)
    s.sql("CREATE KNOWLEDGE_BASE kberr USING dim = 8, embedder = 'md5'")
    s.sql("INSERT INTO kberr SELECT doc_id, text FROM src_documents WHERE doc_id < 10")
    with pytest.raises(ValueError, match="save_to"):
        s.sql(
            "EVALUATE KNOWLEDGE_BASE kberr USING generate = true, count = 2, "
            "save_to = nosuchsrc.scores"
        )
    with pytest.raises(ValueError, match="test_table"):
        s.sql(
            "EVALUATE KNOWLEDGE_BASE kberr USING generate = true, count = 2, "
            "test_table = nosuchsrc.testset"
        )
