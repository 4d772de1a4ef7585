"""Logical type system: MYSQL_DATA_TYPE ↔ Spark types + dtype inference.

Mirrors the reference's type model (§1.2): the MYSQL_DATA_TYPE enum
(reference: mindsdb/api/mysql/mysql_proxy/libs/constants/mysql.py:159-189,
JSON at 188, VECTOR at 189), pandas-dtype inference for untyped sources
(result_set.py:22-52), and the reverse mapping used when creating tables
(result_set.py:353-398). Spark schemas are enforced StructTypes, so the
mapping runs once at the source boundary instead of per result set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

# MYSQL_DATA_TYPE name → Spark type (mysql.py:159-189)
MYSQL_TO_SPARK: dict[str, T.DataType] = {
    "TINYINT": T.ByteType(),
    "SMALLINT": T.ShortType(),
    "MEDIUMINT": T.IntegerType(),
    "INT": T.IntegerType(),
    "BIGINT": T.LongType(),
    "FLOAT": T.FloatType(),
    "DOUBLE": T.DoubleType(),
    "DECIMAL": T.DecimalType(38, 10),
    "BOOL": T.BooleanType(),
    "BOOLEAN": T.BooleanType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),  # Spark has no TIME; reference emits strings too
    "DATETIME": T.TimestampType(),
    "TIMESTAMP": T.TimestampType(),
    "YEAR": T.IntegerType(),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "TEXT": T.StringType(),
    "TINYTEXT": T.StringType(),
    "MEDIUMTEXT": T.StringType(),
    "LONGTEXT": T.StringType(),
    "BLOB": T.BinaryType(),
    "TINYBLOB": T.BinaryType(),
    "MEDIUMBLOB": T.BinaryType(),
    "LONGBLOB": T.BinaryType(),
    "BINARY": T.BinaryType(),
    "VARBINARY": T.BinaryType(),
    # JSON is carried as text + get_json_object/from_json (sql.py:317-347)
    "JSON": T.StringType(),
    # VECTOR → array<float> (vectordatabase_handler.py embeddings column)
    "VECTOR": T.ArrayType(T.FloatType()),
}


def mysql_to_spark(name: str) -> T.DataType:
    """MYSQL_DATA_TYPE name → Spark type; unknown names degrade to TEXT
    exactly like the reference's fallback (result_set.py:22-52)."""
    return MYSQL_TO_SPARK.get(name.upper(), T.StringType())


def spark_to_mysql(dt: T.DataType) -> str:
    """Spark type → MYSQL_DATA_TYPE name (reverse map, result_set.py:353-398)."""
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        return "DECIMAL"
    if isinstance(dt, T.BooleanType):
        return "BOOL"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "DATETIME"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, (T.FloatType, T.DoubleType)):
        return "VECTOR"
    return "TEXT"


def infer_mysql_type(series: pd.Series) -> str:
    """Pandas dtype → MYSQL_DATA_TYPE, the reference's inference order for
    sources that don't declare types (result_set.py:22-52): object→TEXT,
    datetime64→DATETIME, bool→BOOL, int→INT(/BIGINT), numeric→FLOAT,
    fallback TEXT."""
    dtype = series.dtype
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "DATETIME"
    if pd.api.types.is_bool_dtype(dtype):
        return "BOOL"
    if pd.api.types.is_integer_dtype(dtype):
        lo, hi = (series.min(), series.max()) if len(series) else (0, 0)
        return "INT" if (pd.isna(lo) or (-(2**31) <= lo and hi < 2**31)) else "BIGINT"
    if pd.api.types.is_float_dtype(dtype):
        return "FLOAT"
    return "TEXT"


def infer_spark_schema(pdf: pd.DataFrame) -> T.StructType:
    """Pandas frame → enforced Spark schema via the MYSQL_DATA_TYPE hop —
    the typed boundary the reference applies lazily at each step edge."""
    return T.StructType(
        [
            T.StructField(str(c), mysql_to_spark(infer_mysql_type(pdf[c])), True)
            for c in pdf.columns
        ]
    )
