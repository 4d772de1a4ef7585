"""Round-11 A/B: evaluation-level variants of the minhash signature pass
(VERDICT item 3 — the proven sf100 floor of the whole LSH family).

Variants (all must produce BIT-IDENTICAL lane minima):
  cur    — round-10 shape: agg min((a*(sh % 2^32)+b) % P) — the % 2^32 is
           textually repeated in every lane's aggregate expression
  hoist  — project __s32 = sh % 2^32 once, agg min((a*__s32+b) % P)
  lanes  — project all n_hashes lane values, agg plain min(col)

Times the signature stage end-to-end (shingle_hashes -> signatures ->
noop), interleaved old/new in one session; prints one JSON line. Parity:
sorted collect-compare of full signatures on the smallest scale given.

Usage: python scripts/opt_r11_minhash_ab.py [--runs 3] [--dirs d1 d2 ...]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n-hashes", type=int, default=16)
    ap.add_argument(
        "--dirs", nargs="+",
        default=["/tmp/spark_graft_bench/sf10_docs"],
    )
    ap.add_argument("--parity-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_lane_params,
        shingle_hashes,
    )
    from mindsdb_spark.session import tune_file_partitioning

    col = F.col
    spark = get_spark(app_name="r11-minhash-ab")
    params = minhash_lane_params(args.n_hashes)

    def sig_cur(sh):
        s32 = col("sh") % F.lit(4294967296)
        aggs = [
            F.min((F.lit(a) * s32 + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
            for i, (a, b) in enumerate(params)
        ]
        return sh.groupBy("doc_id").agg(*aggs)

    def sig_hoist(sh):
        pre = sh.select("doc_id", (col("sh") % F.lit(4294967296)).alias("__s32"))
        aggs = [
            F.min((F.lit(a) * col("__s32") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"h{i}")
            for i, (a, b) in enumerate(params)
        ]
        return pre.groupBy("doc_id").agg(*aggs)

    def sig_lanes(sh):
        s32 = col("sh") % F.lit(4294967296)
        pre = sh.select(
            "doc_id",
            *[
                ((F.lit(a) * s32 + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"__l{i}")
                for i, (a, b) in enumerate(params)
            ],
        )
        return pre.groupBy("doc_id").agg(
            *[F.min(col(f"__l{i}")).alias(f"h{i}") for i in range(args.n_hashes)]
        )

    variants = {"cur": sig_cur, "hoist": sig_hoist, "lanes": sig_lanes}

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}

    # parity first (small scale, full row compare)
    docs = load_table(spark, args.parity_dir, "documents")
    sh = shingle_hashes(docs)
    base = sorted(tuple(r) for r in sig_cur(sh).collect())
    for name, fn in variants.items():
        got = sorted(tuple(r) for r in fn(sh).collect())
        assert got == base, f"parity FAILED for {name}"
    out["parity"] = f"{len(base)} rows identical across variants @ {args.parity_dir}"

    for d in args.dirs:
        tune_file_partitioning(spark, d)
        docs = load_table(spark, d, "documents")
        sh = shingle_hashes(docs)
        res: dict[str, list[float]] = {k: [] for k in variants}
        for k, fn in variants.items():  # warmup each
            spark.sparkContext.setJobDescription(f"warmup {k}")
            force(fn(sh))
        for r in range(args.runs):  # interleaved
            for k, fn in variants.items():
                spark.sparkContext.setJobDescription(f"{k} run {r}")
                t0 = time.perf_counter()
                force(fn(sh))
                res[k].append(round(time.perf_counter() - t0, 3))
        out[d] = {k: {"best": min(v), "all": v} for k, v in res.items()}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
