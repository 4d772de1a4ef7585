"""Round-10 p06 study: the last headline query without a named floor.
INTERLEAVED plan A/B (the r09 protocol — ordered sweeps flatter later
variants) of three count-distinct strategies over sf100 orders, all
sharing the one-exchange repartitionByRange(o_custkey) posture:

- collect_set  — the shipped p06: size(collect_set(priority)), one
  shuffle, map-side partial sets (bounded 5-value domain)
- two_level    — manual two-level aggregate: groupBy(custkey, priority)
  count, then re-agg per custkey (the r10 verdict's requested variant;
  the range partitioning on custkey alone already satisfies the finer
  group's clustering, so it adds NO exchange, only a second agg)
- expand_countd — built-in countDistinct: Expand (2x rows) + double
  aggregate, the strategy p06 abandoned at sf0.1

p27_time_bucket rides along as the environmental-drift control; DuckDB
p06 runs in the same window for the ratio. 3 samples per variant,
medians + full samples reported.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import __spark_entry__ as ent
    from pyspark.sql import functions as F
    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r10-p06")
    tune_file_partitioning(spark, SF100)
    registry = ent.queries()
    out = {"mode": "p06_plan_ab", "sf": 100, "load1": os.getloadavg()[0],
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")}

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def pruned():
        return (
            load_table(spark, SF100, "orders")
            .select("o_custkey", "o_orderpriority")
            .repartitionByRange(n_parts, "o_custkey")
        )

    def v_collect_set():
        return registry["p06_having_countd"](spark, SF100)

    def v_two_level():
        per = pruned().groupBy("o_custkey", "o_orderpriority").agg(
            F.count("*").alias("c")
        )
        return (
            per.groupBy("o_custkey")
            .agg(F.sum("c").alias("n"), F.count("*").alias("np"))
            .filter(F.col("n") >= 3)
            .sortWithinPartitions("o_custkey")
        )

    def v_expand_countd():
        return (
            pruned()
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("o_orderpriority").alias("np"),
            )
            .filter(F.col("n") >= 3)
            .sortWithinPartitions("o_custkey")
        )

    variants = {
        "collect_set": v_collect_set,
        "two_level": v_two_level,
        "expand_countd": v_expand_countd,
    }
    control = registry["p27_time_bucket"]

    # result parity before timing anything: all three strategies must agree
    base = v_collect_set().orderBy("o_custkey").limit(100).collect()
    for name, mk in (("two_level", v_two_level), ("expand_countd", v_expand_countd)):
        alt = mk().orderBy("o_custkey").limit(100).collect()
        assert [tuple(r) for r in alt] == [tuple(r) for r in base], name
    out["variants_agree"] = True

    # warm once per variant (codegen + page cache)
    for mk in variants.values():
        force(mk())
    force(control(spark, SF100))

    samples = {v: [] for v in variants}
    ctrl = []
    for _round in range(3):
        for vname, mk in variants.items():
            samples[vname].append(timed(lambda: force(mk())))
        ctrl.append(timed(lambda: force(control(spark, SF100))))

    out["medians"] = {v: round(statistics.median(ts), 3) for v, ts in samples.items()}
    out["samples"] = samples
    out["control_p27"] = ctrl

    # DuckDB p06 in the same window
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{SF100}/orders.parquet/*.parquet')"
    )
    sql = ent.oracle_sql()["p06_having_countd"]
    con.execute(sql).fetchall()  # warm
    out["duckdb_p06"] = min(timed(lambda: con.execute(sql).fetchall()) for _ in range(3))
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
