"""Oracle-checked temporal join queries: as-of join and range join.

The reference lacks both operators (nearest analog: the TS-predictor
window fetch, mindsdb/api/executor/planner/plan_join_ts.py:244-335); the
DuckDB oracle uses its native ASOF JOIN / IEJoin, which makes these a
genuinely independent semantic cross-check of our union-window and
interval-bucketing formulations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mindsdb_spark.catalog import load_table as _t
from mindsdb_spark.operators.temporal import asof_join, range_join

col = F.col


def _clicks(e: DataFrame) -> DataFrame:
    # Dedup the right side on (user_id, ts): as-of semantics are only
    # deterministic when the match key is unique per timestamp, and both
    # engines must agree on which row wins.
    return (
        e.filter(col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"), F.max("value").alias("click_value"))
    )


# --- T01 as-of join (backward): last click at-or-before each purchase -------
def t01_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(col("event_type") == "purchase").select("event_id", "ts", "user_id")
    res = asof_join(purchases, _clicks(e), on="ts", by="user_id")
    return res.select("event_id", "user_id", "click_id", "click_value").repartition(1).sortWithinPartitions("event_id")


T01_SQL = """
WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, max(event_id) AS click_id, max(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, c.click_id, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


# --- T02 as-of join (forward): next click at-or-after each purchase ---------
def t02_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(col("event_type") == "purchase").select("event_id", "ts", "user_id")
    res = asof_join(purchases, _clicks(e), on="ts", by="user_id", direction="forward")
    return res.select("event_id", "user_id", "click_id", "click_value").repartition(1).sortWithinPartitions("event_id")


# Forward as-of with an inverted comparison. DuckDB requires the inequality
# ordered (>=), so flip by negating epochs is avoided — it supports <= too.
T02_SQL = """
WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts, max(event_id) AS click_id, max(value) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
SELECT p.event_id, p.user_id, c.click_id, c.click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY p.event_id
"""


# --- T03 range join: purchases inside 30-min windows after errors -----------
def t03_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(col("event_type") == "purchase").select("event_id", "ts", "user_id")
    windows = (
        e.filter(col("event_type") == "error")
        .select(
            col("event_id").alias("err_id"),
            col("user_id"),
            col("ts").alias("w_start"),
            (col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
        )
    )
    res = range_join(
        purchases, windows, point_col="ts", start_col="w_start", end_col="w_end",
        by="user_id", bucket_width_seconds=1800,
    )
    return res.select("event_id", "user_id", "err_id").repartition(1).sortWithinPartitions("event_id", "err_id")


T03_SQL = """
WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
w AS (SELECT event_id AS err_id, user_id, ts AS w_start,
             ts + INTERVAL 30 MINUTE AS w_end
      FROM events WHERE event_type = 'error')
SELECT p.event_id, p.user_id, w.err_id
FROM p JOIN w ON p.user_id = w.user_id AND p.ts >= w.w_start AND p.ts <= w.w_end
ORDER BY p.event_id, w.err_id
"""




# --- T04 resample + gap fill (hypertable rollup shape) -----------------------
def t04_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.operators.temporal import resample_fill

    e = _t(spark, sf_dir, "events")
    return resample_fill(e).repartition(1).sortWithinPartitions("user_id", "bucket")


T04_SQL = """
WITH per AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, round(sum(value), 2) AS sv
  FROM events GROUP BY user_id, date_trunc('hour', ts)
),
b AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM per GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket FROM b)
SELECT g.user_id, g.bucket, coalesce(p.sv, 0.0) AS sv
FROM grid g LEFT JOIN per p ON p.user_id = g.user_id AND p.bucket = g.bucket
ORDER BY g.user_id, g.bucket
"""


def t05_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.operators.temporal import anomaly_zscore

    e = _t(spark, sf_dir, "events").filter("user_id < 30")
    return anomaly_zscore(e).repartition(1).sortWithinPartitions("user_id", "event_id")


T05_SQL = """
WITH w AS (
  SELECT user_id, event_id, ts, value,
         avg(value) OVER fr AS mu,
         stddev_samp(value) OVER fr AS sd
  FROM events WHERE user_id < 30
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, ts, value,
       floor((value - mu) / sd * 10000 + 0.5) / 10000 AS zscore,
       abs(floor((value - mu) / sd * 10000 + 0.5) / 10000) > 2.5 AS is_anomaly
FROM w WHERE sd IS NOT NULL AND sd > 0
ORDER BY user_id, event_id
"""



def t06_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.operators.temporal import seasonal_baseline

    return seasonal_baseline(_t(spark, sf_dir, "events")).repartition(1).sortWithinPartitions("event_id")


T06_SQL = """
SELECT event_id, event_type, CAST(hour(ts) AS INT) AS hod, value,
       floor(avg(value) OVER cell * 1000000 + 0.5) / 1000000 AS baseline,
       floor((value - avg(value) OVER cell) * 1000000 + 0.5) / 1000000 AS residual
FROM events
WINDOW cell AS (PARTITION BY event_type, hour(ts))
ORDER BY event_id
"""



def t07_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.operators.temporal import sessionize

    return sessionize(_t(spark, sf_dir, "events")).repartition(1).sortWithinPartitions("user_id", "session_id")


T07_SQL = """
WITH f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
              ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (SELECT user_id, ts,
             CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM f)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def t08_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.operators.temporal import ewma_smooth

    e = _t(spark, sf_dir, "events").filter("user_id < 50")
    return ewma_smooth(e, alpha=0.3, window=10).repartition(1).sortWithinPartitions("user_id", "event_id")


def _t08_sql(alpha: float = 0.3, window: int = 10) -> str:
    # mirror ewma_smooth term-for-term: same weights, same chain order
    beta = 1.0 - alpha
    num, den = [], []
    for k in range(window):
        wk = repr(beta**k)
        lv = "value" if k == 0 else f"lag(value, {k}) OVER w"
        num.append(f"coalesce(({lv}) * {wk}, 0)")
        den.append(f"CASE WHEN ({lv}) IS NOT NULL THEN {wk} ELSE 0 END")
    return f"""
SELECT user_id, event_id, ts, value,
       floor(({" + ".join(num)}) / ({" + ".join(den)}) * 1000000 + 0.5)
         / 1000000 AS ewma
FROM events WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
"""


T08_SQL = _t08_sql()


TEMPORAL_QUERIES = {
    "t01_asof_join": (t01_asof_join, T01_SQL),
    "t02_asof_forward": (t02_asof_forward, T02_SQL),
    "t03_range_join": (t03_range_join, T03_SQL),
    "t04_resample": (t04_resample, T04_SQL),
    "t05_anomaly_zscore": (t05_anomaly_zscore, T05_SQL),
    "t06_seasonal_baseline": (t06_seasonal_baseline, T06_SQL),
    "t07_sessionize": (t07_sessionize, T07_SQL),
    "t08_ewma": (t08_ewma, T08_SQL),
}
