"""Pipeline queries (dedup / text / similarity / multimodal) vs DuckDB."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries.pipeline import PIPELINE


@pytest.mark.parametrize("name", sorted(PIPELINE))
def test_pipeline_matches_oracle(spark, sf_dir, name):
    fn, sql = PIPELINE[name]
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, f"{name}: {detail}"
