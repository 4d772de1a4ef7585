"""Chatbot operators: bind an agent to a messages table and answer new
messages incrementally with per-chat conversational memory.

Reference semantics: a chatbot is a (model|agent, chat-app database) pair;
a polling task reads new messages from the chat integration, builds the
conversation history for the chat, completes, and posts the answer
(reference: mindsdb/interfaces/chatbot/chatbot_controller.py:17-120 CRUD,
chatbot_task.py polling loop, memory.py per-chat history).

Spark-first re-expression: the polling loop is incremental consumption of
the bound messages table (event-time watermark, the same LAST mechanism as
`WHERE ts > LAST`); per-chat memory is a frame window over the conversation
(``collect_list`` of the preceding ``memory_k`` turns — computed over the
FULL table so history spans already-answered messages, then filtered to the
new slice); the reply pass is one Arrow-batched ``agent_apply`` stage. No
driver loop: any number of chats and new messages process as one plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mindsdb_spark.operators.agent import AgentSpec, agent_apply


@dataclass
class ChatbotSpec:
    """Catalog record for a chatbot (reference: chatbot_controller.py CRUD
    columns — name, project, database, model/agent, is_running, params)."""

    name: str
    agent: str
    messages_table: str
    text_col: str = "text"
    chat_id_col: str = "chat_id"
    ts_col: str = "ts"
    reply_table: str | None = None
    memory_k: int = 5
    is_running: bool = True
    watermark: object = None  # high-water mark of processed message ts
    params: dict = field(default_factory=dict)


def chatbot_respond(
    msgs: DataFrame, agent: AgentSpec, bot: ChatbotSpec
) -> DataFrame:
    """Answer every message newer than the bot's watermark.

    Returns (chat_id, ts, question, answer) for the new slice. Memory: the
    prompt for each message carries the preceding ``memory_k`` turns of the
    SAME chat, joined with newlines — a plain frame window, shuffled once
    on chat_id, bounded state per row.
    """
    text = F.col(bot.text_col)
    w = (
        Window.partitionBy(bot.chat_id_col)
        .orderBy(F.col(bot.ts_col), text)
        .rowsBetween(-bot.memory_k, -1)
    )
    hist = F.collect_list(text).over(w)
    prompt = F.concat_ws("\n", F.concat(hist, F.array(text)))
    out = msgs.withColumn("__prompt", prompt)
    if bot.watermark is not None:
        out = out.filter(F.col(bot.ts_col) > F.lit(bot.watermark))
    out = agent_apply(out, agent, question_col="__prompt")
    return out.select(
        F.col(bot.chat_id_col).alias("chat_id"),
        F.col(bot.ts_col).alias("ts"),
        text.alias("question"),
        F.col(agent.output_col).alias("answer"),
    )
