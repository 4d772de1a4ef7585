"""Type-system mapping (§1.2) + model/table predicate split (§4.1)."""

import pandas as pd
from pyspark.sql import types as T

from mindsdb_spark.operators.model import split_model_conditions
from mindsdb_spark.types import (
    infer_mysql_type,
    infer_spark_schema,
    mysql_to_spark,
    spark_to_mysql,
)


def test_mysql_to_spark_core_types():
    assert mysql_to_spark("BIGINT") == T.LongType()
    assert mysql_to_spark("datetime") == T.TimestampType()
    assert mysql_to_spark("VECTOR") == T.ArrayType(T.FloatType())
    assert mysql_to_spark("JSON") == T.StringType()
    assert mysql_to_spark("no_such_type") == T.StringType()  # fallback TEXT


def test_roundtrip_spark_to_mysql():
    assert spark_to_mysql(T.LongType()) == "BIGINT"
    assert spark_to_mysql(T.TimestampType()) == "DATETIME"
    assert spark_to_mysql(T.ArrayType(T.FloatType())) == "VECTOR"
    assert spark_to_mysql(T.MapType(T.StringType(), T.StringType())) == "TEXT"


def test_infer_from_pandas_reference_order():
    pdf = pd.DataFrame(
        {
            "s": ["a", "b"],
            "t": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "b": [True, False],
            "i": [1, 2],
            "big": [2**40, 2**41],
            "f": [1.5, 2.5],
        }
    )
    assert infer_mysql_type(pdf["s"]) == "TEXT"
    assert infer_mysql_type(pdf["t"]) == "DATETIME"
    assert infer_mysql_type(pdf["b"]) == "BOOL"
    assert infer_mysql_type(pdf["i"]) == "INT"
    assert infer_mysql_type(pdf["big"]) == "BIGINT"
    assert infer_mysql_type(pdf["f"]) == "FLOAT"
    schema = infer_spark_schema(pdf)
    assert schema["big"].dataType == T.LongType()
    assert schema["f"].dataType == T.FloatType()


def test_split_model_conditions():
    conds = [
        ("ts", ">", "2024-01-01"),       # table column → pushed
        ("horizon", "=", 7),              # model column, equality → param
        ("confidence", ">", 0.8),         # model column, non-eq → post-filter
        ("country", "=", "US"),           # table column equality → pushed
    ]
    table, params = split_model_conditions(conds, model_cols={"horizon", "confidence"})
    assert params == {"horizon": 7}
    assert ("ts", ">", "2024-01-01") in table
    assert ("country", "=", "US") in table
    assert ("confidence", ">", 0.8) in table
    assert len(table) == 3
