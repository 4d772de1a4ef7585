"""Driver-contract shape checks for __spark_entry__.py."""

import __spark_entry__ as ent


def test_entry_runs(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema.fieldNames() == ["n_name", "revenue"]


def test_registry_consistency():
    qs, osql = ent.queries(), ent.oracle_sql()
    assert len(qs) >= 50 or len(qs) == len(set(qs))  # no dup keys
    # every oracle key must have a query
    assert set(osql) <= set(qs)
    # every callable takes (spark, sf_dir)
    for fn in qs.values():
        assert callable(fn)
