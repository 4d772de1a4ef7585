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


def test_runtime_tuning_appends_and_covers_new_sessions(spark):
    from mindsdb_spark.session import _INFER_GEN_RULE, apply_runtime_tuning

    # excludedRules is a per-SparkSession conf: a newSession() on the same
    # SparkContext (same applicationId) starts from the builder defaults,
    # and a host driver's own exclusions must survive our append
    fresh = spark.newSession()
    sentinel = "org.apache.spark.sql.catalyst.optimizer.CombineFilters"
    fresh.conf.set("spark.sql.optimizer.excludedRules", sentinel)
    apply_runtime_tuning(fresh)
    rules = fresh.conf.get("spark.sql.optimizer.excludedRules").split(",")
    assert sentinel in rules and _INFER_GEN_RULE in rules
    # idempotent: a second call doesn't duplicate the rule
    apply_runtime_tuning(fresh)
    rules2 = fresh.conf.get("spark.sql.optimizer.excludedRules").split(",")
    assert rules2.count(_INFER_GEN_RULE) == 1
