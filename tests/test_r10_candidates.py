"""Round-10 registry candidates (d59_knn_classify, d60_mojibake) — fully
implemented and oracle-compared in round 9, but NOT yet in the PIPELINE
dict (each registered key rides the driver's ~50-slot correctness window;
round 9's 2-key budget went to a11/d58). This test keeps them green until
round 10 adds the two dict lines."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries import pipeline as P


@pytest.mark.parametrize("name", ["d59_knn_classify", "d60_mojibake"])
def test_r10_candidate_matches_oracle(spark, sf_dir, name):
    fn = getattr(P, name)
    sql = getattr(P, name.split("_")[0].upper() + "_SQL")
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, detail


def test_r10_candidates_not_yet_registered():
    # intentional: registration is the round-10 window budget's call.
    # When this assert starts failing, delete this test.
    assert "d59_knn_classify" not in P.PIPELINE
    assert "d60_mojibake" not in P.PIPELINE
