"""As-of and range join operator semantics."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mindsdb_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:00"), 101.0),  # exact-time match
            (3, "B", _ts("2024-01-01 09:59:59"), 102.0),  # before any quote
            (4, "B", _ts("2024-01-01 10:01:00"), 103.0),
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 10:00:00"), 99.5),
            ("A", _ts("2024-01-01 10:00:04"), 99.7),
            ("B", _ts("2024-01-01 10:00:30"), 88.0),
        ],
        "sym string, ts timestamp, bid double",
    )
    return trades, quotes


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    res = asof_join(trades, quotes, on="ts", by="sym")
    got = {r["trade_id"]: r["bid"] for r in res.collect()}
    assert got == {1: 99.7, 2: 99.5, 3: None, 4: 88.0}


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    res = asof_join(trades, quotes, on="ts", by="sym", direction="forward")
    got = {r["trade_id"]: r["bid"] for r in res.collect()}
    assert got == {1: None, 2: 99.5, 3: 88.0, 4: None}


def test_asof_keeps_left_rows_and_columns(trades_quotes):
    trades, quotes = trades_quotes
    res = asof_join(trades, quotes, on="ts", by="sym")
    assert res.count() == trades.count()
    assert set(res.columns) >= {"trade_id", "sym", "ts", "price", "bid"}


def test_asof_plan_has_no_join(trades_quotes):
    # The operator's scale contract: a single shuffle + window, never a
    # nested-loop join.
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, on="ts", by="sym")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_range_join_buckets(spark):
    points = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 3700), (3, 20, 50), (4, 10, 10_000)],
        "pid long, k long, t long",
    )
    iv = spark.createDataFrame(
        [(7, 10, 0, 3600), (8, 10, 3600, 7200), (9, 20, 0, 40)],
        "iid long, k long, s long, e long",
    )
    res = range_join(points, iv, point_col="t", start_col="s", end_col="e", by="k",
                     bucket_width_seconds=1000)
    got = sorted((r["pid"], r["iid"]) for r in res.collect())
    assert got == [(1, 7), (2, 8)]


def test_range_join_boundaries_inclusive(spark):
    points = spark.createDataFrame([(1, 1, 0), (2, 1, 100)], "pid long, k long, t long")
    iv = spark.createDataFrame([(5, 1, 0, 100)], "iid long, k long, s long, e long")
    res = range_join(points, iv, point_col="t", start_col="s", end_col="e", by="k",
                     bucket_width_seconds=30)
    assert sorted(r["pid"] for r in res.collect()) == [1, 2]


def test_asof_join_sql_door(spark, sf_dir):
    """DuckDB's ASOF JOIN syntax through the engine: the inequality
    direction picks backward/forward; equality conditions are the group
    keys. Result must match the operator called directly."""
    from mindsdb_spark.engine import EngineSession
    from mindsdb_spark.operators.temporal import asof_join

    sess = EngineSession(spark)
    sess.register_parquet_source("tpch", sf_dir, tables=["events"])
    quotes = sess.sql(
        "SELECT user_id, ts, value FROM tpch_events WHERE event_type = 'view'"
    )
    trades = sess.sql(
        "SELECT user_id, ts, value AS tv FROM tpch_events WHERE event_type = 'click'"
    )
    quotes.createOrReplaceTempView("asof_quotes")
    trades.createOrReplaceTempView("asof_trades")
    got = sess.sql(
        "SELECT t.user_id, t.ts, t.tv, t.value FROM asof_trades t "
        "ASOF JOIN asof_quotes q ON t.user_id = q.user_id AND t.ts >= q.ts "
        "ORDER BY t.user_id, t.ts LIMIT 50"
    ).collect()
    want = (
        asof_join(trades, quotes, on="ts", by="user_id", direction="backward")
        .select("user_id", "ts", "tv", "value")
        .orderBy("user_id", "ts")
        .limit(50)
        .collect()
    )
    assert got == want and len(got) == 50
    # forward direction via <=
    fwd = sess.sql(
        "SELECT t.user_id, t.value FROM asof_trades t "
        "ASOF JOIN asof_quotes q ON t.user_id = q.user_id AND t.ts <= q.ts "
        "ORDER BY t.user_id, t.ts LIMIT 10"
    ).collect()
    want_f = (
        asof_join(trades, quotes, on="ts", by="user_id", direction="forward")
        .select("user_id", "value").orderBy("user_id", "ts").limit(10).collect()
    )
    assert fwd == want_f


def test_anomaly_zscore_flags_spike_only(spark):
    from mindsdb_spark.operators.temporal import anomaly_zscore

    # steady series with one 100x spike at the end: only the spike flags
    rows = [(i, 1, float(10 + (i % 3))) for i in range(30)] + [(30, 1, 1000.0)]
    df = spark.createDataFrame(
        [(eid, uid, v, eid) for eid, uid, v in rows],
        "event_id long, user_id long, value double, ts long",
    )
    out = anomaly_zscore(df, ts_col="ts", window=20, threshold=2.5)
    flagged = [r["event_id"] for r in out.filter("is_anomaly").collect()]
    assert flagged == [30]
    # baseline excludes the current row: the spike's own z is huge
    spike = out.filter("event_id = 30").collect()[0]
    assert spike["zscore"] > 100
    # unscoreable head rows (no 2-point baseline) are absent
    assert out.filter("event_id < 2").count() == 0


def test_sessionize_gap_semantics(spark):
    from mindsdb_spark.operators.temporal import sessionize

    rows = [
        (1, 1, "2024-01-01 10:00:00"),
        (1, 2, "2024-01-01 10:10:00"),  # same session (10 min gap)
        (1, 3, "2024-01-01 11:00:00"),  # 50 min gap -> new session
        (2, 4, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {(r["user_id"], r["session_id"]): r for r in sessionize(df).collect()}
    assert out[(1, 1)]["n_events"] == 2 and out[(1, 1)]["duration_s"] == 600
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 1)]["duration_s"] == 0


def test_ewma_constant_series_is_identity(spark):
    from mindsdb_spark.operators.temporal import ewma_smooth

    rows = [(1, i, f"2024-01-01 10:{i:02d}:00", 5.0) for i in range(12)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = ewma_smooth(df).collect()
    assert all(r["ewma"] == 5.0 for r in out)  # weights renormalize exactly
