"""mindsdb_spark — a PySpark-native analytics engine with the query surface
of mindsdb/mindsdb (reference: /root/reference, read-only).

The reference is a single-node federated SQL engine that plans a linear list
of imperative steps and executes cross-source relational work in embedded
DuckDB over pandas frames (reference: mindsdb/api/executor/utilities/sql.py:57-154).
This package re-expresses the same query surface Spark-first: declarative
DataFrame/SQL plans optimized by Catalyst, pandas UDFs only where built-in
operators cannot express the semantics.

Layout:
  session.py   — SparkSession factory tuned for the target scale posture
  catalog.py   — federated source registry (parquet now, JDBC-shaped later)
  dialect/     — MySQL-flavored SQL compatibility rewrites
  operators/   — engine operators beyond stock SQL (vector search, dedup,
                 text analysis, multimodal plumbing)
  queries/     — probe queries (SURVEY.md §2.12) and pipeline queries, each
                 paired with a DuckDB oracle SQL string
"""

from mindsdb_spark.session import get_spark
from mindsdb_spark.catalog import SourceCatalog, load_table

__all__ = ["get_spark", "SourceCatalog", "load_table"]
