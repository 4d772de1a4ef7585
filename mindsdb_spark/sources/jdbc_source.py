"""JDBC integration source — the production shape of a SQL-database
handler (reference: every RDBMS handler, e.g.
mindsdb/integrations/handlers/postgres_handler, implements connect /
get_tables / query / native_query; the planner fetches per-table or ships
whole queries, query_planner.py:787-807).

Same protocol as DuckDBSource (tables / read / query), but everything is
LAZY and distributed:

* ``read(table)`` returns ``spark.read.jdbc`` — Catalyst pushes filters,
  column pruning, and LIMIT into the database (DSv2 JDBC pushdown), and
  ``partition_options`` ({table: {column, lowerBound, upperBound,
  numPartitions}}) splits the scan into parallel range queries, which is
  what makes a big-table fetch usable on a cluster.
* ``query(sql)`` runs the statement ON the database engine via the JDBC
  ``query`` option — the whole-query pushdown path. Spark resolves the
  result schema eagerly (a prepared LIMIT-0 round-trip), so a dialect the
  database can't run fails here, at build time, and the engine's fallback
  to the federated plan still works.

Tested end-to-end against embedded Derby (bundled with Spark) in
tests/test_jdbc_source.py — no external server needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class JDBCSource:
    dialect = "jdbc"

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        tables: list[str],
        properties: dict[str, str] | None = None,
        partition_options: dict[str, dict] | None = None,
    ):
        self.spark = spark
        self.url = url
        self._tables = list(tables)
        self.properties = dict(properties or {})
        self.partition_options = dict(partition_options or {})
        self.pushdowns = 0

    def tables(self) -> list[str]:
        return self._tables

    def read(self, table: str) -> DataFrame:
        opts = self.partition_options.get(table.lower(), {})
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .options(**self.properties)
        )
        if opts:
            reader = (
                reader.option("partitionColumn", opts["column"])
                .option("lowerBound", opts["lowerBound"])
                .option("upperBound", opts["upperBound"])
                .option("numPartitions", opts.get("numPartitions", 8))
            )
        return reader.load()

    def query(self, sql: str) -> DataFrame:
        out = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", sql)
            .options(**self.properties)
            .load()
        )
        self.pushdowns += 1  # schema resolution above already hit the DB
        return out

    def execute(self, sql: str) -> int:
        """Run a DML statement on the database and return the affected-row
        count (reference: update_step.py:16-127 / delete_step.py:18-48
        render UPDATE/DELETE into the source dialect and execute them
        there). One driver-side statement through the JVM DriverManager —
        DML is metadata-sized for the engine; the database does the work."""
        jvm = self.spark._jvm
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, str(v))
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            stmt = conn.createStatement()
            try:
                return stmt.executeUpdate(sql)
            finally:
                stmt.close()
        finally:
            conn.close()

    def insert(self, table: str, df: DataFrame) -> None:
        """INSERT writeback: append rows to the database table (reference:
        insert_step.py:13-124 writes to the integration). Executes as a
        distributed ``df.write.jdbc`` append — each Spark partition opens
        its own connection and streams its rows, so a big insert
        parallelizes the same way a partitioned read does."""
        (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
            .options(**self.properties)
            .mode("append")
            .save()
        )
