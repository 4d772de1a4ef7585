"""Literal-robustness fuzz for the round-9 llm_log surface: hostile
question literals (quote escapes, unicode, whitespace runs, keyword-laden
strings) must round-trip the agent door INTO log.llm_log with exact input
recording and whitespace token counts — the same discipline
test_literal_fuzz.py applies to every other statement family."""

import pytest

from mindsdb_spark.engine import EngineSession

CASES = [
    # (SQL literal as typed, decoded python string)
    ("what''s new", "what's new"),
    ("select * from t where x = 1", "select * from t where x = 1"),
    ("tabs\tand  double  spaces", "tabs\tand  double  spaces"),
    ("déjà vu — naïve café 日本語", "déjà vu — naïve café 日本語"),
    ("USING model = ''x''", "USING model = 'x'"),
    ("trailing spaces   ", "trailing spaces   "),
]


@pytest.fixture(scope="module")
def log_sess(spark):
    sess = EngineSession(spark)
    sess.sql("CREATE AGENT fuzzlog USING model = 'fuzz-llm'")
    yield sess
    sess.sql("DROP AGENT fuzzlog")


def test_llm_log_records_hostile_literals(log_sess):
    for typed, decoded in CASES:
        out = log_sess.sql(
            f"SELECT answer FROM fuzzlog WHERE question = '{typed}'"
        ).collect()
        assert len(out) == 1 and out[0]["answer"].startswith("llm:")

    rows = log_sess.sql(
        "SELECT input, prompt_tokens, total_tokens, success "
        "FROM log.llm_log WHERE model_name = 'fuzz-llm'"
    ).collect()
    by_input = {r["input"]: r for r in rows}
    for _typed, decoded in CASES:
        rec = by_input.get(decoded)
        assert rec is not None, (decoded, sorted(by_input))
        # whitespace token count matches python's split() on the DECODED text
        assert rec["prompt_tokens"] == len(decoded.split())
        assert rec["total_tokens"] == rec["prompt_tokens"] + 1
        assert rec["success"]


def test_llm_log_truncates_long_input(log_sess):
    long_q = "tok " * 300  # 1200 chars, 300 tokens
    log_sess.sql(
        f"SELECT answer FROM fuzzlog WHERE question = '{long_q}'"
    ).collect()
    rows = log_sess.sql(
        "SELECT input, prompt_tokens FROM log.llm_log "
        "WHERE model_name = 'fuzz-llm' AND prompt_tokens = 300"
    ).collect()
    assert len(rows) == 1
    # input truncates at 200 chars (reference LLMLogTable stores bounded
    # text); token counts are computed on the FULL prompt before truncation
    assert len(rows[0]["input"]) == 200


def test_two_agents_same_question_both_logged(spark):
    """Round-9 review finding: the replay-stable record id must include
    the wrapper identity — two DIFFERENT agents asking the byte-identical
    question from the same partition/seq would otherwise collide in the
    dedupe and one model's call would silently vanish from the audit log."""
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.sql("CREATE AGENT twin_a USING model = 'model-a'")
    sess.sql("CREATE AGENT twin_b USING model = 'model-b'")
    for agent in ("twin_a", "twin_b"):
        sess.sql(
            f"SELECT answer FROM {agent} WHERE question = 'same exact question'"
        ).collect()
    rows = sess.sql(
        "SELECT model_name FROM log.llm_log "
        "WHERE input = 'same exact question' ORDER BY model_name"
    ).collect()
    assert [r["model_name"] for r in rows] == ["model-a", "model-b"]
    sess.sql("DROP AGENT twin_a")
    sess.sql("DROP AGENT twin_b")


def test_reask_logs_twice_retry_logs_once(spark):
    """Round-9 ADVICE: a user legitimately re-running the byte-identical
    agent query must produce TWO llm_log records (the reference
    LLMLogTable records every call), while a stage retry of the SAME
    action must still dedupe to one. The per-statement epoch bound into
    the transport closure at agent_apply time is what separates the two."""
    from mindsdb_spark.engine import EngineSession

    sess = EngineSession(spark)
    sess.sql("CREATE AGENT reask USING model = 'reask-llm'")
    for _ in range(2):
        sess.sql(
            "SELECT answer FROM reask WHERE question = 'identical re-ask'"
        ).collect()
    n = sess.sql(
        "SELECT count(*) AS n FROM log.llm_log "
        "WHERE model_name = 'reask-llm' AND input = 'identical re-ask'"
    ).collect()[0]["n"]
    assert n == 2, f"byte-identical re-ask undercounted: {n} records"

    # the two statements' executor-side record ids differ only in epoch
    rids = sorted(
        r[0] for r in (sess._llm_log_accum.value or [])
        if ":p" in r[0] and r[2] == "identical re-ask"
    )
    assert len(rids) == 2 and rids[0] != rids[1]

    # stage-retry simulation: re-adding the exact records of one action
    # (same replay-stable ids) must NOT add rows
    execu = [
        r for r in (sess._llm_log_accum.value or [])
        if ":p" in r[0] and r[2] == "identical re-ask"
    ]
    sess._llm_log_accum.add(list(execu))
    after = sess.sql(
        "SELECT count(*) AS n FROM log.llm_log "
        "WHERE model_name = 'reask-llm' AND input = 'identical re-ask'"
    ).collect()[0]["n"]
    assert after == 2
    sess.sql("DROP AGENT reask")
