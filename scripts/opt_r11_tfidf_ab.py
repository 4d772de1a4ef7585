"""Round-11 A/B for the TF-IDF embedder family (VERDICT item 2).

Variants of hash_embed_tfidf's structure (values identical in each —
same TF fold, same idf formula, same normalization; only WHERE the TF is
materialized / how the final d56 reduction aggregates changes):

  ckpt    — round-10 shape: lazy localCheckpoint, 1-row broadcast stats,
            map-stage reweight (3 jobs: ckpt, broadcast build, main)
  nockpt  — no checkpoint: TF recomputed by the stats pass and the main
            pass (2 jobs, 2x the split+md5 fold)
  d56 reduction (applies to the query, not the operator):
  rowagg  — replace posexplode + 16-key groupBy with ONE global aggregate
            of 16 sums + posexplode of the single result row

Every variant built FRESH per timed run (the bench calls the registry fn
per attempt, so a reused lazy checkpoint would fake the steady state).
Prints timings; value parity is checked against the current operator
output (collect-compare, 4-decimal rounded lane sums like d56 declares).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import cache_table, load_table
    from mindsdb_spark.operators.kb import hash_embed
    from mindsdb_spark.session import tune_file_partitioning

    col = F.col
    spark = get_spark(app_name="r11-tfidf-ab")
    dim = 16

    def tfidf(docs, checkpoint: bool):
        tf = hash_embed(docs, text_col="text", dim=dim, out_float=False).withColumnRenamed(
            "embedding", "__tf"
        )
        if checkpoint:
            tf = tf.localCheckpoint(eager=False)
        stats = tf.agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum((F.col("__tf")[i] > 0).cast("long")).alias(f"__df{i}") for i in range(dim)],
        ).select(
            F.array(
                *[F.log(F.col("__n") / (1 + F.col(f"__df{i}"))).cast("double") for i in range(dim)]
            ).alias("__idfw")
        )
        return (
            tf.join(F.broadcast(stats))
            .withColumn("__w", F.expr("zip_with(__tf, __idfw, (t, w) -> t * w)"))
            .withColumn(
                "embedding",
                F.expr(
                    "transform(__w, x -> CAST(x / greatest(sqrt(aggregate(__w, "
                    "CAST(0 AS DOUBLE), (a, y) -> a + y * y)), 1e-12) AS DOUBLE))"
                ),
            )
            .drop("__w", "__tf", "__idfw")
        )

    def d56_explode(emb):
        lanes = emb.select(F.posexplode(col("embedding")).alias("lane", "v"))
        return (
            lanes.groupBy("lane")
            .agg((F.floor(F.sum("v") * 1e4 + F.lit(0.5)) / 1e4).alias("s"))
            .coalesce(1)
            .sortWithinPartitions("lane")
        )

    def d56_rowagg(emb):
        row = emb.agg(
            *[F.sum(col("embedding")[i]).alias(f"__s{i}") for i in range(dim)]
        ).select(
            F.posexplode(F.array(*[col(f"__s{i}") for i in range(dim)])).alias("lane", "sv")
        )
        return row.select(
            "lane", (F.floor(col("sv") * 1e4 + F.lit(0.5)) / 1e4).alias("s")
        ).coalesce(1).sortWithinPartitions("lane")

    builds = {
        "ckpt_explode": lambda docs: d56_explode(tfidf(docs, True)),
        "nockpt_explode": lambda docs: d56_explode(tfidf(docs, False)),
        "ckpt_rowagg": lambda docs: d56_rowagg(tfidf(docs, True)),
        "nockpt_rowagg": lambda docs: d56_rowagg(tfidf(docs, False)),
    }

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}
    # parity at sf0.1: all variants produce the same declared rows
    d = "/root/testdata/sf0.1"
    tune_file_partitioning(spark, d)
    cache_table(spark, d, "documents")
    docs = load_table(spark, d, "documents")
    base = [tuple(r) for r in builds["ckpt_explode"](docs).collect()]
    for k, b in builds.items():
        got = [tuple(r) for r in b(docs).collect()]
        assert got == base, f"parity FAILED for {k}: {got[:3]} vs {base[:3]}"
    out["parity"] = f"{len(base)} lane rows identical across variants @ sf0.1"

    for d in ["/root/testdata/sf0.1", "/tmp/spark_graft_bench/sf1_gen"]:
        tune_file_partitioning(spark, d)
        cache_table(spark, d, "documents")
        docs = load_table(spark, d, "documents")
        res: dict[str, list[float]] = {k: [] for k in builds}
        for k, b in builds.items():
            force(b(docs))  # warmup (fresh plan)
        for r in range(3):
            for k, b in builds.items():
                spark.sparkContext.setJobDescription(f"{k} {r}")
                t0 = time.perf_counter()
                force(b(docs))  # FRESH plan per run, like the bench
                res[k].append(round(time.perf_counter() - t0, 3))
        out[d] = {k: {"best": min(v), "all": v} for k, v in res.items()}
    # d34 shape: tiny 100-doc conformance slice, ckpt vs nockpt
    d = "/root/testdata/sf0.1"
    tune_file_partitioning(spark, d)
    docs100 = load_table(spark, d, "documents").where(col("doc_id") < 100)
    res2: dict[str, list[float]] = {"d34_ckpt": [], "d34_nockpt": []}
    def d34_shape(ck):
        emb = tfidf(docs100, ck)
        return emb.select("doc_id", F.posexplode(col("embedding")).alias("lane", "v")).select(
            "doc_id", "lane", (F.floor(col("v") * 1e6 + F.lit(0.5)) / 1e6).alias("v")
        ).coalesce(1).sortWithinPartitions("doc_id", "lane")
    pa = [tuple(r) for r in d34_shape(True).collect()]
    pb = [tuple(r) for r in d34_shape(False).collect()]
    assert pa == pb, "d34 parity FAILED"
    for k, ck in (("d34_ckpt", True), ("d34_nockpt", False)):
        force(d34_shape(ck))
    for r in range(3):
        for k, ck in (("d34_ckpt", True), ("d34_nockpt", False)):
            t0 = time.perf_counter()
            force(d34_shape(ck))
            res2[k].append(round(time.perf_counter() - t0, 3))
    out["d34_slice"] = {k: {"best": min(v), "all": v} for k, v in res2.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
