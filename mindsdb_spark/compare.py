"""Local Spark-vs-DuckDB comparison harness.

Mirrors the driver's correctness gate (FIXTURES.md "harness requirements"):
run the Spark DataFrame and the DuckDB oracle on the same parquet inputs,
normalize both pandas frames the same way, and diff order-insensitively.

Normalization (matches the reference's own edge behavior):
* NaN → None — the reference normalizes at every DuckDB boundary
  (reference: mindsdb/api/executor/utilities/sql.py:350);
* timestamps → "%Y-%m-%d %H:%M:%S[.%f]" strings
  (reference: mindsdb/api/executor/sql_query/result_set.py:413-415);
* integer dtypes widened to int64; Decimal → string at declared scale;
* columns sorted by name, then rows sorted by all columns.
"""

from __future__ import annotations

import datetime
import decimal
import math

import pandas as pd

from mindsdb_spark.catalog import TPCH_TABLES


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run an oracle query on a fresh DuckDB with fixture views registered."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # split multi-file layout (bench._prepare_split)
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.sql(sql).df()


def _norm_value(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp | datetime.datetime):
        if pd.isna(v):
            return None
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}"
        return s
    if isinstance(v, float):
        # collapse -0.0 vs 0.0 and representation noise beyond round(x, n)
        return round(v, 9) + 0.0
    if hasattr(v, "item"):  # numpy scalar
        return _norm_value(v.item())
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_norm_value(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Return (matches, detail)."""
    got = spark_df.toPandas()
    exp = duckdb_oracle(oracle_sql, sf_dir)
    if sorted(c.lower() for c in got.columns) != sorted(c.lower() for c in exp.columns):
        return False, f"columns differ: spark={sorted(got.columns)} duckdb={sorted(exp.columns)}"
    exp.columns = [c.lower() for c in exp.columns]
    got.columns = [c.lower() for c in got.columns]
    # The driver's value hash is exact on representation: an all-non-null
    # int64 column on one side vs float64 on the other (e.g. DuckDB
    # sum(BIGINT) -> HUGEINT -> pandas float64) hashes differently even when
    # every value is numerically identical. Surface that here so rounding in
    # _norm_value can't mask it (round 2: d21/d22/d23).
    for c in sorted(got.columns):
        kinds = {got[c].dtype.kind, exp[c].dtype.kind}
        if kinds in ({"i", "f"}, {"u", "f"}):
            return False, (
                f"dtype kind mismatch on '{c}': spark={got[c].dtype} "
                f"duckdb={exp[c].dtype} (int vs float breaks the driver hash "
                f"even when values match — CAST the oracle aggregate)"
            )
    g, e = normalize(got), normalize(exp)
    if len(g) != len(e):
        return False, f"row count differs: spark={len(g)} duckdb={len(e)}"
    for i, (a, b) in enumerate(zip(g, e)):
        if a != b:
            return False, f"first diff at sorted row {i}: spark={a!r} duckdb={b!r}"
    return True, f"ok ({len(g)} rows)"
