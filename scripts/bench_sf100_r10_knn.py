"""Round-10 knn_classify scale study at sf100 (2M labeled vectors x 64
dims, 10 labels): the registered d59 shape scaled three decades up, Spark
vs DuckDB in the same window, interleaved, 3 samples each.

The measured task is the operator's designed use: label a small query
batch (100 vectors) against the FULL labeled corpus by exact brute-force
cosine kNN (k=5) — ~190M similarity evaluations per pass. No index on
either side. The FIRST run of this study (HOF-only) measured the
per-element JVM higher-order-function cosine at 249.5 s vs DuckDB's
native kernel at 37.1 s (6.7x, parity true) — which motivated rewriting
_knn_votes as a GEMM kernel (numpy BLAS inside Arrow-batched mapInPandas,
per-batch exact top-k with tie-complete preselection). This script now
A/Bs both Spark paths against DuckDB in the same interleaved window.

DuckDB gets its BEST available path, not the oracle formulation: the
native list_cosine_similarity kernel under the window-rank top-k.
(Probed and rejected alternatives this session: LATERAL per-query top-k
re-scans the corpus per query — 13.8 s at 10 queries vs ~5 s window;
this build's max_by has no top-n overload; struct ordering keys are not
accepted by min_by/max_by.) The oracle's _COS long-form (explicit DOUBLE
casts — the known cross-engine-parity formulation) runs once for the
row-for-row vote-table parity check at 2M corpus scale, and its
single-run time is reported for context.

A Spark-only second leg scales the query batch 100 -> 1000 to show the
labeling pass is linear in batch size (the corpus scan amortizes; the
per-query state stays k-bounded by WindowGroupLimit BEFORE any exchange).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")
N_QUERIES = 100
K = 5


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def main():
    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.vector import _knn_votes, _knn_votes_hof
    from mindsdb_spark.queries.pipeline import _COS
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(cpus=32, app_name="sf100-r10-knn")
    tune_file_partitioning(spark, SF100)
    emb = load_table(spark, SF100, "embeddings")

    def spark_vote_table(n_queries, votes_fn=_knn_votes):
        votes = votes_fn(
            emb.filter(F.col("vec_id") >= n_queries),
            emb.filter(F.col("vec_id") < n_queries),
            k=K, vec_col="embedding", id_col="vec_id", label_col="label",
        )
        pick = Window.partitionBy("__qid").orderBy(
            F.col("__n").desc(), F.col("__lbl").asc()
        )
        return sorted(
            (r["__qid"], r["__lbl"], r["__n"], r["__p"] == 1)
            for r in votes.withColumn(
                "__p", F.row_number().over(pick)
            ).collect()
        )

    def duck_votes_sql(sim_expr):
        return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES}),
l AS (SELECT vec_id, label, embedding FROM embeddings
      WHERE vec_id >= {N_QUERIES}),
sims AS (SELECT q.qid, l.vec_id, l.label, {sim_expr} AS sim FROM l, q),
r AS (SELECT qid, label,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
               AS rnk
      FROM sims),
nn AS (SELECT qid, label FROM r WHERE rnk <= {K}),
v AS (SELECT qid, label, count(*) AS n FROM nn GROUP BY qid, label)
SELECT qid, label, n,
       row_number() OVER (PARTITION BY qid ORDER BY n DESC, label ASC) = 1
         AS is_predicted
FROM v ORDER BY qid, label
"""

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF100}/embeddings.parquet/*.parquet')"
    )
    native = "list_cosine_similarity(l.embedding, q.qe)"
    variants = {"duck_native_window": duck_votes_sql(native)}

    def duck_vote_table(sql):
        return sorted(tuple(r) for r in con.execute(sql).fetchall())

    out = {"mode": "knn_classify_sf100", "sf": 100, "k": K,
           "n_queries": N_QUERIES, "n_labeled": 2_000_000 - N_QUERIES,
           "load1": os.getloadavg()[0]}

    # warm every leg (codegen / page cache / python workers)
    spark_last = spark_vote_table(N_QUERIES)
    hof_last = spark_vote_table(N_QUERIES, _knn_votes_hof)
    duck_last = {n: duck_vote_table(sql) for n, sql in variants.items()}

    samples = {"spark_gemm": [], "spark_hof": []} | {n: [] for n in variants}
    for _round in range(3):  # interleaved (ordered sweeps lie — r09 lesson)
        t, spark_last = timed(lambda: spark_vote_table(N_QUERIES))
        samples["spark_gemm"].append(t)
        t, hof_last = timed(
            lambda: spark_vote_table(N_QUERIES, _knn_votes_hof)
        )
        samples["spark_hof"].append(t)
        for n, sql in variants.items():
            t, duck_last[n] = timed(lambda s=sql: duck_vote_table(s))
            samples[n].append(t)

    out["samples"] = samples
    med = {n: round(statistics.median(v), 3) for n, v in samples.items()}
    out["medians"] = med
    duck_best_name = min(variants, key=lambda n: med[n])
    out["duckdb_best"] = duck_best_name
    out["ratio_vs_duckdb_best"] = round(
        med["spark_gemm"] / med[duck_best_name], 3
    )
    out["gemm_vs_hof_x"] = round(med["spark_hof"] / med["spark_gemm"], 2)
    out["hof_agrees_with_gemm"] = spark_last == hof_last

    # parity leg: the d59 oracle's _COS long-form (known cross-engine
    # float parity via explicit DOUBLE casts), once, row-for-row at 2M
    t_cos, duck_cos = timed(lambda: duck_vote_table(duck_votes_sql(_COS)))
    out["duck_cos_window_single_run_s"] = t_cos
    out["vote_table_parity_2m_corpus"] = spark_last == duck_cos
    out["native_kernel_agrees"] = {
        n: duck_last[n] == duck_cos for n in variants
    }
    out["vote_rows"] = len(spark_last)

    # Spark-only batch-size scaling: 10x the query batch (GEMM path; the
    # HOF path took 2854 s here — 11.4x its 100q time, linear but slow)
    t10, bigger = timed(lambda: spark_vote_table(N_QUERIES * 10))
    out["spark_1000_queries_s"] = t10
    out["spark_batch_scaling_x"] = round(t10 / med["spark_gemm"], 2)
    out["vote_rows_1000"] = len(bigger)

    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
