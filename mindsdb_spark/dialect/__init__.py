from mindsdb_spark.dialect.rewriter import rewrite_sql

__all__ = ["rewrite_sql"]
