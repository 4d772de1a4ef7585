"""Pipeline queries (dedup / text / similarity / multimodal) vs DuckDB."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries.pipeline import PIPELINE


@pytest.mark.parametrize("name", sorted(PIPELINE))
def test_pipeline_matches_oracle(spark, sf_dir, name):
    fn, sql = PIPELINE[name]
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, f"{name}: {detail}"


def test_dup_distribution_histogram(spark):
    from pyspark.sql import functions as F

    from mindsdb_spark.operators.dedup import exact_dedup

    # 3 singletons, 2 pairs, 1 triple -> 10 docs
    texts = ["a", "b", "c", "d", "d", "e", "e", "f", "f", "f"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    hist = (
        exact_dedup(df).groupBy("dup_count").agg(F.count("*").alias("n_groups"))
        .orderBy("dup_count").collect()
    )
    assert [(r.dup_count, r.n_groups) for r in hist] == [(1, 3), (2, 2), (3, 1)]
