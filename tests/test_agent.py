"""Agent-as-table: single ask, batch apply, EngineSession SQL path."""

import pytest
from pyspark.sql import functions as F

from mindsdb_spark.engine import EngineSession
from mindsdb_spark.operators.agent import AgentSpec, agent_apply, agent_ask, mock_complete


@pytest.fixture(scope="module")
def agent():
    return AgentSpec(name="helper", complete=mock_complete)


def test_agent_ask_single(spark, agent):
    rows = agent_ask(spark, agent, "what is spark?").collect()
    assert len(rows) == 1
    assert rows[0]["question"] == "what is spark?"
    assert rows[0]["answer"] == mock_complete(["what is spark?"])[0]


def test_agent_apply_batch(spark, agent):
    df = spark.createDataFrame([(i, f"q{i}") for i in range(10)], "id long, q string")
    res = agent_apply(df, agent, question_col="q").orderBy("id").collect()
    assert [r["answer"] for r in res] == mock_complete([f"q{i}" for i in range(10)])
    assert [r["id"] for r in res] == list(range(10))  # passthrough columns kept


def test_agent_sql_path(spark, agent):
    sess = EngineSession(spark)
    sess.register_agent(agent)
    rows = sess.sql("SELECT answer FROM helper WHERE question = 'hello'").collect()
    assert rows[0]["answer"] == mock_complete(["hello"])[0]
    # project-qualified name resolves too
    rows = sess.sql("SELECT answer FROM mindsdb.helper WHERE question = 'hello'").collect()
    assert rows[0]["answer"] == mock_complete(["hello"])[0]


def test_agent_question_literal_decodes(spark, agent):
    # escaped quotes in the question literal decode the way Spark's parser
    # would before the agent sees them (review finding: the door previously
    # passed the raw backslash-quote text through)
    sess = EngineSession(spark)
    sess.register_agent(agent)
    rows = sess.sql("SELECT answer FROM helper WHERE question = 'what''s new'").collect()
    assert rows[0]["answer"] == mock_complete(["what's new"])[0]


def test_non_agent_table_not_hijacked(spark, agent, sf_dir):
    sess = EngineSession(spark)
    sess.register_agent(agent)
    sess.register_parquet_source("tpch", sf_dir)
    # a real table with a `question`-less filter must go through spark.sql
    n = sess.sql("SELECT count(*) AS n FROM customer").collect()[0]["n"]
    assert n > 0


def test_create_agent_documented_json_syntax(spark, sf_dir):
    # the reference's documented form (agent_syntax.mdx): model/data are
    # JSON objects; brace-nested commas must survive the USING split
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["documents"])
    sess.sql("CREATE KNOWLEDGE_BASE kbj USING embedder = 'md5'")
    sess.sql(
        'CREATE AGENT json_agent USING '
        'model = {"provider": "openai", "model_name": "gpt-4o"}, '
        'data = {"knowledge_bases": ["mindsdb.kbj"], "tables": []}, '
        "prompt_template = 'describe data'"
    )
    spec = sess._agents["json_agent"]
    assert spec.model_name == "gpt-4o"
    assert spec.knowledge_bases == ("kbj",)
    sess.sql("DROP AGENT json_agent")
    sess.sql("DROP KNOWLEDGE_BASE kbj")


def test_llm_log_records_completions(spark):
    """log.llm_log fills from real completion traffic (reference:
    interfaces/database/log.py LLMLogTable) — records flow back from the
    pandas-UDF workers via the accumulator, with whitespace token counts
    and the agent's model name."""
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.sql("CREATE AGENT logtest USING model = 'mock-llm'")
    sess.sql(
        "SELECT answer FROM logtest WHERE question = 'alpha beta gamma'"
    ).collect()
    rows = sess.sql(
        "SELECT model_name, input, prompt_tokens, completion_tokens, "
        "total_tokens, success FROM log.llm_log"
    ).collect()
    assert len(rows) >= 1
    rec = next(r for r in rows if r["input"] == "alpha beta gamma")
    assert rec["model_name"] == "mock-llm"
    assert rec["prompt_tokens"] == 3 and rec["completion_tokens"] == 1
    assert rec["total_tokens"] == 4 and rec["success"]

    # reference LLMLogTable schema parity (round-8 ADVICE): start/end are
    # TIMESTAMP columns (sa.DateTime), not epoch doubles — timestamp
    # functions must work on them
    ll = sess.sql("SELECT * FROM log.llm_log")
    dtypes = dict(ll.dtypes)
    assert dtypes["start_time"] == "timestamp"
    assert dtypes["end_time"] == "timestamp"
    span = sess.sql(
        "SELECT count(*) AS n FROM log.llm_log "
        "WHERE year(start_time) >= 2020 AND end_time >= start_time"
    ).collect()[0]["n"]
    assert span == len(rows)

    # replay dedupe (round-8 ADVICE): accumulator updates are at-least-once
    # for transformations — simulate a stage-retry by re-adding the exact
    # records of an executor-side call (same replay-stable id) and assert
    # the materialized view drops the duplicates
    before = sess.sql("SELECT count(*) AS n FROM log.llm_log").collect()[0]["n"]
    # executor-side rids are "<wrap_id>:p<partition>:<seq>:<digest>";
    # driver-side ones are a bare uuid hex with no ':'
    execu = [r for r in (sess._llm_log_accum.value or []) if ":p" in r[0]]
    assert execu, "expected executor-side (TaskContext) llm_log records"
    sess._llm_log_accum.add(list(execu))
    after = sess.sql("SELECT count(*) AS n FROM log.llm_log").collect()[0]["n"]
    assert after == before
    sess.sql("DROP AGENT logtest")
