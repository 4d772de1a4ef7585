"""Every probe query (SURVEY.md §2.12) must hash-match its DuckDB oracle —
the same check the driver runs at sf0.01, here at sf0.001 for speed."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries.probes import PROBES


@pytest.mark.parametrize("name", sorted(PROBES))
def test_probe_matches_oracle(spark, sf_dir, name):
    fn, sql = PROBES[name]
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, f"{name}: {detail}"
