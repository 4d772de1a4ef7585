"""Write path (CTAS/insert/update/delete), file sources, SHOW/DESCRIBE."""

import pytest
from pyspark.sql import functions as F

from mindsdb_spark.catalog import load_table
from mindsdb_spark.engine import EngineSession
from mindsdb_spark.sources.files import read_file, sniff_format
from mindsdb_spark.sources.parquet_source import ParquetSource


@pytest.fixture()
def src(spark, tmp_path):
    return ParquetSource(spark, str(tmp_path / "managed"))


def test_ctas_insert(spark, sf_dir, src):
    n = load_table(spark, sf_dir, "nation")
    src.create_table("nations", n)
    assert src.read("nations").count() == 25
    with pytest.raises(Exception):
        src.create_table("nations", n)  # errorifexists
    src.create_table("nations", n.limit(5), replace=True)
    assert src.read("nations").count() == 5
    src.insert("nations", n.limit(3))
    assert src.read("nations").count() == 8


def test_delete_update(spark, sf_dir, src):
    c = load_table(spark, sf_dir, "customer")
    src.create_table("cust", c)
    total = c.count()
    deleted = src.delete("cust", F.col("c_acctbal") < 0)
    assert deleted == c.filter(F.col("c_acctbal") < 0).count()
    assert src.read("cust").count() == total - deleted

    updated = src.update(
        "cust", {"c_mktsegment": F.lit("VIP")}, F.col("c_acctbal") > 9000
    )
    got = src.read("cust")
    assert got.filter(F.col("c_mktsegment") == "VIP").count() == updated
    assert got.count() == total - deleted  # update preserves cardinality


def test_file_source_sniffing(spark, tmp_path):
    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    jsonl = tmp_path / "t.jsonl"
    jsonl.write_text('{"a": 1}\n{"a": 2}\n')
    mystery_json = tmp_path / "mystery.dat"
    mystery_json.write_text('{"k": 5}')
    assert sniff_format(str(csv)) == "csv"
    assert sniff_format(str(jsonl)) == "json"
    assert sniff_format(str(mystery_json)) == "json"
    assert read_file(spark, str(csv)).count() == 2
    assert read_file(spark, str(jsonl)).agg(F.sum("a")).head()[0] == 3
    assert read_file(spark, str(mystery_json)).head().k == 5


def test_show_and_describe(spark, sf_dir):
    es = EngineSession(spark)
    es.register_parquet_source("tpch", sf_dir)
    dbs = [r[0] for r in es.sql("SHOW DATABASES").collect()]
    assert "tpch" in dbs and "information_schema" in dbs
    tables = [r[0] for r in es.sql("SHOW TABLES FROM tpch").collect()]
    assert "lineitem" in tables and "embeddings" in tables
    fields = {r.Field: r.Type for r in es.sql("DESCRIBE tpch.region").collect()}
    assert fields == {"r_regionkey": "int", "r_name": "string"}


def test_information_schema_sql(spark, sf_dir):
    es = EngineSession(spark)
    es.register_parquet_source("tpch", sf_dir)
    n = es.sql(
        "SELECT count(*) AS n FROM information_schema.columns WHERE table_name = 'lineitem'"
    ).head().n
    assert n == 11
    rows = es.sql(
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_schema = 'tpch' ORDER BY table_name"
    ).collect()
    assert len(rows) == 10


def test_load_table_plan_cache_invalidates_on_rewrite(spark, tmp_path):
    """The lazy-plan cache (catalog._PLAN_CACHE) is keyed on file mtime:
    repeat loads reuse the same DataFrame object, a rewrite is seen."""
    import os
    import time

    d = str(tmp_path / "cachedir")
    os.makedirs(d)
    p = os.path.join(d, "t.parquet")
    spark.range(3).toDF("a").coalesce(1).write.parquet(p)
    df1 = load_table(spark, d, "t")
    assert load_table(spark, d, "t") is df1  # cached plan object reused
    assert df1.count() == 3
    time.sleep(1.05)  # distinct mtime even on 1s-resolution filesystems
    import shutil

    shutil.rmtree(p)
    spark.range(5).toDF("a").coalesce(1).write.parquet(p)
    df2 = load_table(spark, d, "t")
    assert df2 is not df1
    assert df2.count() == 5


def test_invalidate_table_drops_pinned_copy(spark, tmp_path):
    """invalidate_table evicts both the pinned in-memory copy and the lazy
    plan entry deterministically (the fixture rewriters call it after each
    in-place overwrite rather than relying on the content-signature check)."""
    import os

    from mindsdb_spark.catalog import (
        _PLAN_CACHE,
        _TABLE_CACHE,
        cache_table,
        invalidate_table,
        load_table,
    )

    d = str(tmp_path / "invdir")
    os.makedirs(d)
    p = os.path.join(d, "t.parquet")
    spark.range(4).toDF("a").coalesce(1).write.parquet(p)
    pinned = cache_table(spark, d, "t")
    key = (os.path.abspath(d), "t")
    assert key in _TABLE_CACHE
    assert load_table(spark, d, "t") is pinned  # load serves the pinned copy
    invalidate_table(d, "t")
    assert key not in _TABLE_CACHE and key not in _PLAN_CACHE
    fresh = load_table(spark, d, "t")
    assert fresh is not pinned
    assert fresh.count() == 4
