"""Round-7 sf100 measurements: the p07 pre-aggregation A/B study and the
spark-only window/sessionization decade (round-6 verdict items 6 and 9).

Run after fixtures exist (fixtures.generate_sf(scale=1000, seed=42) →
/tmp/spark_graft_bench/sf100). Emits JSON to stdout; results are folded
into BENCH_sf100_relational.json by hand.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")


def timed(fn, *args):
    t0 = time.perf_counter()
    fn(*args)
    return round(time.perf_counter() - t0, 3)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import mindsdb_spark.queries.probes as probes
    from mindsdb_spark import get_spark
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r07")
    tune_file_partitioning(spark, SF100)
    out = {"sf": 100, "load1": os.getloadavg()[0]}

    # --- p07 A/B: flat chain (shipped) vs pre-agg-before-join (rejected) ----
    # The study's verdict is recorded in probes.py:p07's comment and
    # BENCH_sf100_relational.json: the pre-agg variant LOSES at sf100
    # (combine ratio ~1.2:1 at TPC-H's 10 orders/customer over 32
    # partitions), so p07 ships flat and the variant lives here only to
    # keep the measurement reproducible.
    from mindsdb_spark.catalog import load_table
    from pyspark.sql import functions as F

    def p07_preagg(spark, sf_dir):
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        n = load_table(spark, sf_dir, "nation")
        o_pre = o.groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("__rev"), F.count("*").alias("__cnt")
        )
        return (
            o_pre.join(
                c.select("c_custkey", "c_nationkey"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(
                F.round(F.sum("__rev"), 2).alias("rev"),
                F.sum("__cnt").alias("cnt"),
            )
            .orderBy("n_name")
        )

    res = {}
    for shape, fn in (("flat_chain", probes.p07), ("preagg_before_join", p07_preagg)):
        force(fn(spark, SF100))  # warmup
        res[shape] = min(timed(lambda: force(fn(spark, SF100))) for _ in range(2))
    out["p07_preagg_study"] = res

    # --- p23 A/B: native Expand rollup vs finest-level + re-aggregation -----
    # (the shipped p23 is size-keyed; force each branch via _table_bytes)
    orig = probes._table_bytes
    res23 = {}
    for shape, bytes_fn in (
        ("native_rollup_expand", lambda *a, **k: 0),
        ("finest_plus_reagg", lambda *a, **k: 10**13),
    ):
        probes._table_bytes = bytes_fn
        try:
            force(probes.p23(spark, SF100))
            res23[shape] = min(
                timed(lambda: force(probes.p23(spark, SF100))) for _ in range(2)
            )
        finally:
            probes._table_bytes = orig
    out["p23_rollup_study"] = res23

    # DuckDB side for the ratio
    import duckdb

    con = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF100}/{t}.parquet/*.parquet')"
        )
    con.execute(probes.P07_SQL).fetchall()  # warmup
    out["p07_duckdb"] = min(
        timed(lambda: con.execute(probes.P07_SQL).fetchall()) for _ in range(2)
    )

    # --- spark-only window/session decade (oracle infeasible at sf100:
    # DuckDB extrapolates past 30 min from its sf10 times — p21 155 s,
    # p28 553 s at sf10 on 10x less data; excluding the oracle side is
    # recorded, not hidden) -----------------------------------------------
    win = {}
    for name in ("p21", "p28"):
        fn = getattr(probes, name)
        force(fn(spark, SF100))  # warmup
        win[name] = min(timed(lambda: force(fn(spark, SF100))) for _ in range(2))
    out["window_spark_only"] = win

    print(json.dumps(out))


if __name__ == "__main__":
    main()
