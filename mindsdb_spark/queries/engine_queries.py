"""End-to-end EngineSession SQL queries.

These run MySQL-dialect SQL strings through the full engine path —
dialect rewrite → federated name resolution → spark.sql — rather than
building DataFrames directly, proving the SQL surface end-to-end the way
the reference's executor tests do (tests/unit/executor/test_base_queires.py
runs SQL strings through ExecuteCommands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_SESSIONS: dict = {}


def _session(spark: SparkSession, sf_dir: str):
    from mindsdb_spark.engine import EngineSession

    key = (id(spark), sf_dir)
    if key not in _SESSIONS:
        sess = EngineSession(spark)
        sess.register_parquet_source("tpch", sf_dir)
        _SESSIONS[key] = sess
    return _SESSIONS[key]


# --- E01: federated join + MySQL dialect functions through the SQL door -----
def e01_engine_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _session(spark, sf_dir)
    return sess.sql(
        """
        SELECT n_name,
               COUNT(*) AS cnt,
               FLOOR(SUM(o_totalprice) * 100 + 0.5) / 100 AS rev,
               DATE_FORMAT(MAX(o_orderdate), '%Y-%m') AS ym
        FROM tpch_orders
        JOIN tpch_customer ON o_custkey = c_custkey
        JOIN tpch_nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
        """
    )


E01_SQL = """
SELECT n_name, COUNT(*) AS cnt,
       floor(SUM(o_totalprice) * 100 + 0.5) / 100 AS rev,
       strftime(MAX(o_orderdate), '%Y-%m') AS ym
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


# --- E02: view + CTE + window through the SQL door ---------------------------
def e02_engine_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _session(spark, sf_dir)
    sess.sql(
        "CREATE OR REPLACE VIEW eng_big_orders AS "
        "SELECT o_custkey, o_orderkey, o_totalprice FROM tpch_orders "
        "WHERE o_totalprice > 100000"
    )
    return sess.sql(
        """
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM eng_big_orders
        )
        SELECT o_custkey, o_orderkey,
               FLOOR(o_totalprice * 100 + 0.5) / 100 AS price
        FROM ranked WHERE rn = 1 ORDER BY o_custkey
        """
    )


E02_SQL = """
WITH big AS (
  SELECT o_custkey, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000
),
ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM big
)
SELECT o_custkey, o_orderkey, floor(o_totalprice * 100 + 0.5) / 100 AS price
FROM ranked WHERE rn = 1 ORDER BY o_custkey
"""


ENGINE_QUERIES = {
    "e01_engine_sql": (e01_engine_sql, E01_SQL),
    "e02_engine_view": (e02_engine_view, E02_SQL),
}
