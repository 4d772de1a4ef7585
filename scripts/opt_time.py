"""Round-10 optimization harness: time an arbitrary subset of registry
queries with EXACTLY the bench.py methodology (tune_file_partitioning +
cache_table warmup + noop sink, best-of-N after a warmup run), without
paying for the full 73-query sweep per iteration.

Usage: python scripts/opt_time.py [--runs N] [--duck] [--sf DIR] q1 q2 ...
Prints one JSON line {query: best_sec}. --duck adds the same-window DuckDB
baseline per query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--duck", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import TPCH_TABLES, cache_table
    from mindsdb_spark.queries.pipeline import PIPELINE
    from mindsdb_spark.queries.probes import PROBES
    from mindsdb_spark.session import tune_file_partitioning

    registry = {**PROBES, **PIPELINE}
    spark = get_spark(app_name="opt-time")
    tune_file_partitioning(spark, args.sf)
    for t in TPCH_TABLES:
        if os.path.exists(os.path.join(args.sf, f"{t}.parquet")):
            cache_table(spark, args.sf, t)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}
    for name in args.queries:
        fn = registry[name][0]
        spark.sparkContext.setJobDescription(name)
        force(fn(spark, args.sf))  # warmup
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            force(fn(spark, args.sf))
            samples.append(time.perf_counter() - t0)
        out[name] = {"best": round(min(samples), 4), "all": [round(s, 3) for s in samples]}

    if args.duck:
        import duckdb

        con = duckdb.connect()
        for t in TPCH_TABLES:
            path = os.path.join(args.sf, f"{t}.parquet")
            if os.path.isdir(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')")
            elif os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        for name in args.queries:
            sql = registry[name][1]
            if not sql:
                continue
            con.execute(sql).fetchall()
            best = min(
                (lambda t0: (con.execute(sql).fetchall(), time.perf_counter() - t0)[1])(time.perf_counter())
                for _ in range(args.runs)
            )
            out[name]["duck"] = round(best, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
