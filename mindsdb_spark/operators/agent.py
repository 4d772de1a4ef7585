"""Agent-as-table operators.

Reference semantics: an agent is a virtual model table with
``to_predict='answer'`` — ``SELECT answer FROM my_agent WHERE
question = '...'`` routes the question to the agent's LLM completion
(reference: mindsdb/api/executor/sql_query/sql_query.py:148-161;
apply_predictor_step.py:36-53; completion via
agents_controller.get_completion).

Spark-first: a single-question select is a one-row plan; the batch form —
"table JOIN agent", every row asks a question — is an Arrow-batched pandas
UDF stage, so completions batch per Arrow block and fan out across
executors. LLM transport is a pluggable callable; tests and oracles use the
deterministic mock (engine._mock_llm shape).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


@dataclass
class AgentSpec:
    """An agent: batched prompt completion plus an output column name."""

    name: str
    complete: Callable[[list[str]], list[str]]
    output_col: str = "answer"
    model_name: str = "mock-llm"


def agent_ask(spark: SparkSession, agent: AgentSpec, question: str) -> DataFrame:
    """``SELECT answer FROM agent WHERE question = '...'`` — one-row plan."""
    df = spark.createDataFrame([(question,)], "question string")
    return agent_apply(df, agent, question_col="question")


def agent_apply(df: DataFrame, agent: AgentSpec, question_col: str) -> DataFrame:
    """Batch form ("table JOIN agent"): append the agent's answer per row.

    One pandas UDF stage — completions are batched per Arrow block (the
    reference loops rows through the agent; here batching and executor
    parallelism are free) and the row identity re-join the reference does
    via __mindsdb_row_id disappears.
    """

    @F.pandas_udf(StringType())
    def _complete(qs: pd.Series) -> pd.Series:
        out = agent.complete(qs.fillna("").tolist())
        return pd.Series(out, index=qs.index)

    return df.withColumn(agent.output_col, _complete(F.col(question_col)))


def mock_complete(prompts: list[str]) -> list[str]:
    """Deterministic completion stub (mirrors engine._mock_llm)."""
    import hashlib

    return [f"llm:{hashlib.md5(p.encode()).hexdigest()[:12]}" for p in prompts]
