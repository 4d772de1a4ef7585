"""Round-11 registry candidates (d61_readability, d62_nfc_scrub) — fully
implemented and oracle-compared in round 10, but NOT yet in the PIPELINE
dict (each registered key rides the driver's ~50-slot correctness window;
round 10's 2-key budget went to d59/d60). This test keeps them green until
round 11 adds the two dict lines."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries import pipeline as P


@pytest.mark.parametrize("name", ["d61_readability", "d62_nfc_scrub"])
def test_r11_candidate_matches_oracle(spark, sf_dir, name):
    fn = getattr(P, name)
    sql = getattr(P, name.split("_")[0].upper() + "_SQL")
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, detail


def test_r11_candidates_not_yet_registered():
    # intentional: registration is the round-11 window budget's call.
    # When this assert starts failing, delete this test.
    assert "d61_readability" not in P.PIPELINE
    assert "d62_nfc_scrub" not in P.PIPELINE
