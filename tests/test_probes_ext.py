"""Extended probes (P33+) hash-match their DuckDB oracles; approx distinct is
property-checked against the exact count (SURVEY.md §2.12 exclusions)."""

import pytest

from mindsdb_spark.compare import compare
from mindsdb_spark.queries.probes_ext import PROBES_EXT

ORACLED = sorted(name for name, (_fn, sql) in PROBES_EXT.items() if sql)


@pytest.mark.parametrize("name", ORACLED)
def test_ext_probe_matches_oracle(spark, sf_dir, name):
    fn, sql = PROBES_EXT[name]
    ok, detail = compare(fn(spark, sf_dir), sql, sf_dir)
    assert ok, f"{name}: {detail}"


TPCH_SHAPES = [n for n in ORACLED if n >= "p43"]


@pytest.mark.parametrize("name", TPCH_SHAPES)
def test_tpch_shape_probe_nonempty(spark, sf_dir, name):
    # empty results pass the oracle compare trivially; the TPC-H shape
    # probes must produce rows at the test scale to prove anything
    fn, _sql = PROBES_EXT[name]
    assert fn(spark, sf_dir).count() > 0, f"{name} returned no rows at {sf_dir}"


def test_approx_distinct_within_tolerance(spark, sf_dir):
    fn, _ = PROBES_EXT["p38_approx_distinct"]
    row = fn(spark, sf_dir).head()
    assert row["exact_cust"] > 0
    assert abs(row["approx_cust"] - row["exact_cust"]) <= 0.05 * row["exact_cust"]
