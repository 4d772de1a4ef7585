"""KB semantic search through the SQL door."""

import pytest

from mindsdb_spark.catalog import load_table
from mindsdb_spark.engine import EngineSession


@pytest.fixture(scope="module")
def kbsess(spark, sf_dir):
    s = EngineSession(spark)
    s.register_parquet_source("tpch", sf_dir)
    docs = load_table(spark, sf_dir, "documents").limit(200)
    s.register_knowledge_base("docs_kb", docs)
    return s


def test_kb_select_default_limit(kbsess):
    rows = kbsess.sql("SELECT * FROM docs_kb WHERE content = 'spark joins'").collect()
    assert len(rows) == 10  # reference default limit (controller.py:356-360)
    assert set(rows[0].asDict()) == {"chunk_id", "doc_id", "content", "distance"}
    # ranked ascending by distance
    dists = [r["distance"] for r in rows]
    assert dists == sorted(dists)


def test_kb_select_explicit_limit_and_projection(kbsess):
    rows = kbsess.sql(
        "SELECT doc_id, distance FROM docs_kb WHERE content = 'hello world' LIMIT 3"
    ).collect()
    assert len(rows) == 3
    assert set(rows[0].asDict()) == {"doc_id", "distance"}


def test_kb_select_limit_capped(kbsess):
    rows = kbsess.sql(
        "SELECT * FROM docs_kb WHERE content = 'query' LIMIT 5000"
    ).collect()
    assert len(rows) <= 100  # reference cap


def test_kb_query_deterministic(kbsess):
    a = [tuple(r) for r in kbsess.sql("SELECT * FROM docs_kb WHERE content = 'x y z'").collect()]
    b = [tuple(r) for r in kbsess.sql("SELECT * FROM docs_kb WHERE content = 'x y z'").collect()]
    assert a == b


def test_non_kb_content_filter_untouched(kbsess):
    # a real table filtered on a column named `content` must not be hijacked
    kbsess.spark.sql("SELECT 'a' AS content").createOrReplaceTempView("plain_t")
    rows = kbsess.sql("SELECT * FROM plain_t WHERE content = 'a'").collect()
    assert len(rows) == 1


def test_kb_meta_prefilter_and_order(kbsess):
    """Metadata conditions pre-filter the search space (k results FROM the
    filtered set); residual ORDER BY runs over the search output."""
    hits = kbsess.sql(
        "SELECT doc_id, distance FROM docs_kb "
        "WHERE content = 'spark engine' AND doc_id < 20 "
        "ORDER BY doc_id LIMIT 5"
    ).collect()
    assert 0 < len(hits) <= 5
    assert all(r["doc_id"] < 20 for r in hits)
    assert [r["doc_id"] for r in hits] == sorted(r["doc_id"] for r in hits)
