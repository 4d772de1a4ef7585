"""Round-9 sf100 measurements (verdict items 3 and 7).

Modes (arg 1, default ``main``):

* ``main``  — 9-query relational subset re-measure (same-window baseline)
  + the p05/p07 parquet-reader A/B the round-8 verdict asked for:
  ``spark.sql.parquet.columnarReaderBatchSize`` sweep and
  ``spark.sql.files.maxPartitionBytes`` sweep, each same-window against
  the shipped defaults. Run with SPARK_GRAFT_DRIVER_MEM=32g for
  comparability with the r07/r08 subsets.
* ``offheap`` — p05/p07 under ``spark.memory.offHeap.enabled`` (static
  conf → needs its own JVM, hence its own mode/process; run back-to-back
  with ``main`` so the window is shared).
* ``ann``   — re-measure the partitioned-IVF family under the DEFAULT
  8 GB heap + round-8/9 session (the r07 ANN artifact predates the
  memory-aware SHJ threshold): brute cosine top-k, one-time index build,
  partition-pruned probe; DuckDB brute same-window.

Emits one JSON object to stdout; results are folded into
BENCH_sf100_relational.json / BENCH_sf100_ann.json by hand.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")

SUBSET = [
    "p01_scan_filter", "p05_groupby_agg", "p06_having_countd",
    "p07_join_agg", "p08_left_join", "p20_rank_windows", "p23_rollup",
    "p27_time_bucket", "p31_q5_join",
]


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def _duck_subset(oracles, names):
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF100}/{t}.parquet/*.parquet')"
        )
    du = {}
    for name in names:
        sql = oracles[name]
        con.execute(sql).fetchall()
        du[name] = min(timed(lambda: con.execute(sql).fetchall()) for _ in range(2))
    return du


def _measure(registry, spark, names, runs=2):
    sp = {}
    for name in names:
        fn = registry[name]
        force(fn(spark, SF100))  # warmup
        sp[name] = min(timed(lambda: force(fn(spark, SF100))) for _ in range(runs))
    return sp


def mode_main():
    import __spark_entry__ as ent
    from mindsdb_spark import get_spark
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r09")
    tune_file_partitioning(spark, SF100)
    registry, oracles = ent.queries(), ent.oracle_sql()
    out = {"mode": "main", "sf": 100, "load1": os.getloadavg()[0],
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")}

    out["spark"] = _measure(registry, spark, SUBSET)
    out["duckdb"] = _duck_subset(oracles, SUBSET)
    sp, du = out["spark"], out["duckdb"]
    out["totals"] = {
        "spark": round(sum(sp.values()), 2),
        "duckdb": round(sum(du.values()), 2),
        "ratio": round(sum(sp.values()) / sum(du.values()), 3),
        "ratio_excl_q5": round(
            sum(v for k, v in sp.items() if k != "p31_q5_join")
            / sum(v for k, v in du.items() if k != "p31_q5_join"), 3),
    }

    # --- p05/p07 parquet-reader A/B (round-8 verdict item 3) -------------
    targets = ["p05_groupby_agg", "p07_join_agg"]
    study = {"default": {k: sp[k] for k in targets}}

    batch_conf = "spark.sql.parquet.columnarReaderBatchSize"
    prev_batch = spark.conf.get(batch_conf, "4096")
    for size in ("2048", "8192", "16384"):
        spark.conf.set(batch_conf, size)
        study[f"batch_{size}"] = _measure(registry, spark, targets)
    spark.conf.set(batch_conf, prev_batch)

    mpb_conf = "spark.sql.files.maxPartitionBytes"
    prev_mpb = spark.conf.get(mpb_conf)
    for mpb in (str(64 * 1024**2), str(256 * 1024**2)):
        spark.conf.set(mpb_conf, mpb)
        study[f"mpb_{int(mpb) // 1024**2}m"] = _measure(registry, spark, targets)
    spark.conf.set(mpb_conf, prev_mpb)
    out["p05_p07_reader_study"] = study

    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


def mode_offheap():
    import __spark_entry__ as ent
    from mindsdb_spark import get_spark
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(
        cpus=32, app_name="sf100-r09-offheap",
        extra_confs={
            "spark.memory.offHeap.enabled": "true",
            "spark.memory.offHeap.size": os.environ.get(
                "SPARK_GRAFT_OFFHEAP_SIZE", "8g"
            ),
        },
    )
    tune_file_partitioning(spark, SF100)
    registry = ent.queries()
    out = {"mode": "offheap", "sf": 100, "load1": os.getloadavg()[0],
           "offheap_size": spark.conf.get("spark.memory.offHeap.size"),
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")}
    out["spark"] = _measure(registry, spark, ["p05_groupby_agg", "p07_join_agg"])
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


def mode_ann():
    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.vector import (
        cosine_topk, ivf_read_probe, ivf_write_partitioned, kmeans_centroids,
    )
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r09-ann")
    tune_file_partitioning(spark, SF100)
    out = {"mode": "ann", "sf": 100, "load1": os.getloadavg()[0],
           "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
           "session": "round-9 defaults (memory-aware SHJ threshold)"}

    emb = load_table(spark, SF100, "embeddings")
    qvec = [r[0] for r in
            emb.filter("vec_id = 42").select("embedding").collect()][0]
    qvec = [float(x) for x in qvec]

    def brute():
        cosine_topk(emb, "embedding", qvec, k=10).collect()

    brute()
    out["brute_cosine_topk"] = min(timed(brute) for _ in range(2))

    idx_dir = os.path.join(os.path.dirname(SF100), "ann_idx_r09")
    t0 = time.perf_counter()
    centroids = kmeans_centroids(emb, "embedding", n_centroids=64)
    ivf_write_partitioned(emb, idx_dir, "embedding", centroids, cell_col="__cell")
    out["ivf_index_build_once"] = round(time.perf_counter() - t0, 1)

    def probe():
        ivf_read_probe(spark, idx_dir, qvec, centroids, k=10,
                       cell_col="__cell").collect()

    probe()
    out["ivf_partitioned_probe"] = min(timed(probe) for _ in range(3))

    # DuckDB brute same-window
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF100}/embeddings.parquet/*.parquet')"
    )
    qlit = "[" + ",".join(repr(x) for x in qvec) + "]"
    brute_sql = f"""
        SELECT vec_id,
               list_dot_product(embedding, {qlit}::DOUBLE[]) /
               greatest(sqrt(list_dot_product(embedding, embedding)) *
                        sqrt(list_dot_product({qlit}::DOUBLE[], {qlit}::DOUBLE[])), 1e-12) AS sim
        FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10
    """
    con.execute(brute_sql).fetchall()
    out["duckdb_brute_cosine_topk"] = min(
        timed(lambda: con.execute(brute_sql).fetchall()) for _ in range(2)
    )
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "main"
    {"main": mode_main, "offheap": mode_offheap, "ann": mode_ann}[mode]()
