"""Chatbot CRUD + incremental respond tick (reference:
interfaces/chatbot/chatbot_controller.py, chatbot_task.py, memory.py)."""

import pytest

from mindsdb_spark.engine import EngineSession


@pytest.fixture()
def csess(spark, sf_dir, tmp_path):
    s = EngineSession(spark)
    s.register_parquet_source("tpch", sf_dir)
    s.register_writable_source("wh", str(tmp_path / "wh"))
    s.sql(
        "CREATE TABLE wh.msgs AS SELECT * FROM VALUES "
        "(1, 1, 'hello'), (1, 2, 'how are you'), (2, 1, 'hi there') "
        "AS t(chat_id, ts, text)"
    )
    s.sql("CREATE AGENT helper USING model = 'mock-llm'")
    return s


def test_chatbot_crud_and_catalog(csess):
    csess.sql(
        "CREATE CHATBOT support USING agent = 'helper', "
        "messages_table = 'wh_msgs', memory_k = 2"
    )
    rows = csess.sql("SELECT name, model_name, is_running FROM mindsdb.chatbots").collect()
    assert [(r["name"], r["is_running"]) for r in rows] == [("support", True)]
    csess.sql("UPDATE CHATBOT support SET memory_k = 3, is_running = false")
    assert csess._chatbots["support"].memory_k == 3
    assert not csess._chatbots["support"].is_running
    # paused bot answers nothing
    assert csess.sql("SELECT chatbot_respond('support')").count() == 0
    csess.sql("DROP CHATBOT support")
    assert csess.sql("SELECT * FROM mindsdb.chatbots").count() == 0
    with pytest.raises(KeyError):
        csess.sql("SELECT chatbot_respond('support')")


def test_chatbot_respond_watermark_and_memory(csess):
    # the transport executes inside the pandas-UDF worker, so assertions on
    # prompt construction must travel back through the ANSWER: echo the
    # whole prompt (newline-joined memory + current message)
    csess.set_agent_transport(lambda prompts: [f"re:{p}" for p in prompts])
    csess.sql("CREATE AGENT helper2 USING model = 'mock-llm'")
    csess.sql(
        "CREATE CHATBOT support USING agent = 'helper2', "
        "messages_table = 'wh_msgs', memory_k = 2, reply_table = 'wh.replies'"
    )
    first = csess.sql("SELECT chatbot_respond('support')").orderBy("chat_id", "ts").collect()
    # memory: the second turn of chat 1 carried the first turn as context,
    # and chats do not leak into each other
    assert [(r["chat_id"], r["question"], r["answer"]) for r in first] == [
        (1, "hello", "re:hello"),
        (1, "how are you", "re:hello\nhow are you"),
        (2, "hi there", "re:hi there"),
    ]
    # replies persisted
    assert csess.sql("SELECT count(*) AS n FROM wh_replies").collect()[0]["n"] == 3
    # watermark advanced: nothing new on the second tick
    assert csess.sql("SELECT chatbot_respond('support')").count() == 0
    # a new message is picked up WITH history from already-answered turns
    csess.sql("INSERT INTO wh.msgs VALUES (1, 3, 'thanks')")
    second = csess.sql("SELECT chatbot_respond('support')").collect()
    assert [(r["chat_id"], r["question"]) for r in second] == [(1, "thanks")]
    assert second[0]["answer"] == "re:hello\nhow are you\nthanks"
    assert csess.sql("SELECT count(*) AS n FROM wh_replies").collect()[0]["n"] == 4
