"""Round-11 A/B: shingle-stage restructure (VERDICT item 3, refined by the
decomposition: at sf100 the signature pass is ~80% shingle Generate, and
that Generate is interpreted — zip_with HOFs are CodegenFallback — so its
generator expression re-evaluates split(lower(trim(text))) per textual
occurrence).

Variants (bit-identical output — same tokens, same grams, same distinct):
  cur  — explode(array_distinct(grams(words(text)))) inlined into Generate
  proj — project __ws = words(text) once, then __g = array_distinct(grams)
         once, then explode the plain __g column (codegen-able Generate)

Prints timings (interleaved) + the number of `split(` occurrences in each
plan's Generate/Project nodes, + full-row parity at the small scale.
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
    from mindsdb_spark.catalog import load_table, parallelize_input
    from mindsdb_spark.operators.dedup import (
        grams_expr,
        minhash_signatures,
        shingle_hash_expr,
        words_expr,
    )
    from mindsdb_spark.session import tune_file_partitioning

    col = F.col
    spark = get_spark(app_name="r11-shingle-ab")

    def sh_cur(df):
        df = parallelize_input(df)
        w = words_expr(col("text"))
        return (
            df.filter(F.size(w) >= 3)
            .select(col("doc_id"), F.explode(F.array_distinct(grams_expr(w, 3))).alias("shingle"))
            .select(col("doc_id"), shingle_hash_expr(col("shingle")).alias("sh"))
        )

    def sh_proj(df):
        df = parallelize_input(df)
        w = words_expr(col("text"))
        toks = df.select(col("doc_id"), w.alias("__ws")).filter(F.size("__ws") >= 3)
        grams = toks.select(
            col("doc_id"), F.array_distinct(grams_expr(col("__ws"), 3)).alias("__g")
        )
        return grams.select(col("doc_id"), F.explode("__g").alias("shingle")).select(
            col("doc_id"), shingle_hash_expr(col("shingle")).alias("sh")
        )

    variants = {"cur": sh_cur, "proj": sh_proj}

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}
    # parity at sf0.1 (sorted multiset of (doc_id, sh))
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    a = sorted(tuple(r) for r in sh_cur(docs).collect())
    b = sorted(tuple(r) for r in sh_proj(docs).collect())
    assert a == b, "parity FAILED"
    out["parity"] = f"{len(a)} (doc_id, sh) rows identical @ sf0.1"
    # plan shape: count split( occurrences in the formatted plan
    for k, fn in variants.items():
        txt = fn(docs)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        out[f"plan_{k}_split_occurrences"] = txt.count("split(")
    for d in ["/tmp/spark_graft_bench/sf10_docs", "/tmp/spark_graft_bench/sf100_docs"]:
        tune_file_partitioning(spark, d)
        docs = load_table(spark, d, "documents")
        res: dict[str, list[float]] = {k: [] for k in variants}
        for k, fn in variants.items():
            force(minhash_signatures(fn(docs)))  # warmup, full sig pass
        for r in range(3):
            for k, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{k} {r}")
                t0 = time.perf_counter()
                force(minhash_signatures(fn(docs)))
                res[k].append(round(time.perf_counter() - t0, 3))
        out[d] = {k: {"best": min(v), "all": v} for k, v in res.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
