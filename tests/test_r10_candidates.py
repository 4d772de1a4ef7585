"""d59_knn_classify / d60_mojibake — implemented and oracle-compared in
round 9, registered in the PIPELINE dict in round 10."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries import pipeline as P


@pytest.mark.parametrize("name", ["d59_knn_classify", "d60_mojibake"])
def test_r10_candidate_matches_oracle(spark, sf_dir, name):
    fn = getattr(P, name)
    sql = getattr(P, name.split("_")[0].upper() + "_SQL")
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, detail


def test_r10_candidates_registered():
    assert P.PIPELINE["d59_knn_classify"] == (P.d59_knn_classify, P.D59_SQL)
    assert P.PIPELINE["d60_mojibake"] == (P.d60_mojibake, P.D60_SQL)
