"""Round-9 focused p05/p07 A/B: INTERLEAVED conf alternation so cache/
co-tenant drift can't masquerade as a conf effect (the ordered sweep in
bench_sf100_r09.py measured 'default' first and every later variant looked
faster). Alternates default maxPartitionBytes (tune_file_partitioning's
128 MB cap) with 256 MB, and columnarReaderBatchSize 4096 with 16384,
3 rounds each, reports per-variant medians; p06/p27 ride along to separate
environmental drift from real deltas. DuckDB p05/p07 runs in the same
window for the ratio."""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")
QUERIES = ["p05_groupby_agg", "p07_join_agg", "p06_having_countd", "p27_time_bucket"]


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import __spark_entry__ as ent
    from mindsdb_spark import get_spark
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r09-ab")
    default_mpb = tune_file_partitioning(spark, SF100)
    registry = ent.queries()
    out = {"mode": "ab", "sf": 100, "load1": os.getloadavg()[0],
           "default_mpb": default_mpb,
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")}

    variants = {
        "default": {},
        "mpb_256m": {"spark.sql.files.maxPartitionBytes": str(256 * 1024**2)},
        "batch_16384": {"spark.sql.parquet.columnarReaderBatchSize": "16384"},
        "mpb256_batch16k": {
            "spark.sql.files.maxPartitionBytes": str(256 * 1024**2),
            "spark.sql.parquet.columnarReaderBatchSize": "16384",
        },
    }
    base = {
        "spark.sql.files.maxPartitionBytes": str(default_mpb),
        "spark.sql.parquet.columnarReaderBatchSize": "4096",
    }

    # warm everything once per query under default
    for q in QUERIES:
        force(registry[q](spark, SF100))

    samples: dict = {v: {q: [] for q in QUERIES} for v in variants}
    for _round in range(3):
        for vname, confs in variants.items():
            for k, v in {**base, **confs}.items():
                spark.conf.set(k, v)
            for q in QUERIES:
                samples[vname][q].append(timed(lambda: force(registry[q](spark, SF100))))
    for k, v in base.items():
        spark.conf.set(k, v)

    out["medians"] = {
        v: {q: round(statistics.median(ts), 3) for q, ts in qs.items()}
        for v, qs in samples.items()
    }
    out["samples"] = samples

    # DuckDB same-window leg for the ratio
    import duckdb

    oracles = ent.oracle_sql()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF100}/{t}.parquet/*.parquet')"
        )
    du = {}
    for q in QUERIES:
        sql = oracles[q]
        con.execute(sql).fetchall()
        du[q] = min(timed(lambda: con.execute(sql).fetchall()) for _ in range(2))
    out["duckdb"] = du
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
