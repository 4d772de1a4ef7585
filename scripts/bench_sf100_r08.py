"""Round-8 sf100 measurements (verdict items 2 and 3): the 9-query
relational subset re-measure under the shipped p31 transitive-predicate
reduction, the two A/B studies that round-8 ran (p31 ASIA reduction,
p07 broadcast-build — rejected), and a d34 sf10 datapoint for the
single-pass TF-IDF embedder.

Run after fixtures exist (fixtures.generate_sf → /tmp/spark_graft_bench/
sf100 and sf10). Emits JSON to stdout; results are folded into
BENCH_sf100_relational.json / BENCH_sf10.json by hand.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF100 = os.environ.get("SF100_DIR", "/tmp/spark_graft_bench/sf100")
SF10 = os.environ.get("SF10_DIR", "/tmp/spark_graft_bench/sf10")

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
    # noop sink: executes the full plan without materializing rows on the
    # driver (p01/p08 return tens of millions of rows at sf100)
    df.write.format("noop").mode("overwrite").save()


def main():
    import __spark_entry__ as ent
    from mindsdb_spark import get_spark
    from mindsdb_spark.session import tune_file_partitioning
    from mindsdb_spark.catalog import load_table
    from pyspark.sql import functions as F

    spark = get_spark(cpus=32, app_name="sf100-r08")
    tune_file_partitioning(spark, SF100)
    registry = ent.queries()
    oracles = ent.oracle_sql()
    out = {"sf": 100, "load1": os.getloadavg()[0]}

    # --- 9-query subset, Spark side (warm + best-of-2) ----------------------
    sp = {}
    for name in SUBSET:
        fn = registry[name]
        force(fn(spark, SF100))  # warmup
        sp[name] = min(timed(lambda: force(fn(spark, SF100))) for _ in range(2))
    out["spark"] = sp

    # --- p31 study: round-7 thin-map shape (no transitive reduction) --------
    def p31_r07_shape():
        c = load_table(spark, SF100, "customer")
        o = load_table(spark, SF100, "orders")
        li = load_table(spark, SF100, "lineitem")
        s = load_table(spark, SF100, "supplier")
        n = load_table(spark, SF100, "nation")
        r = load_table(spark, SF100, "region").filter(F.col("r_name") == "ASIA")
        oc = (
            o.select("o_orderkey", "o_custkey")
            .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .select("o_orderkey", "c_nationkey", "n_name")
        )
        fact = li.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount").join(
            s.select("s_suppkey", "s_nationkey"), F.col("l_suppkey") == F.col("s_suppkey")
        )
        return (
            fact.join(oc, (F.col("l_orderkey") == F.col("o_orderkey"))
                      & (F.col("s_nationkey") == F.col("c_nationkey")))
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "n_name")
        )

    force(p31_r07_shape())
    out["p31_asia_reduction_study"] = {
        "r07_thin_map": min(timed(lambda: force(p31_r07_shape())) for _ in range(2)),
        "r08_transitive_asia_reduction": sp["p31_q5_join"],
    }

    # --- p07 study: broadcast build side (rejected) -------------------------
    def p07_broadcast():
        o = load_table(spark, SF100, "orders")
        c = load_table(spark, SF100, "customer")
        n = load_table(spark, SF100, "nation")
        return (
            o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
                   F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"), F.count("*").alias("cnt"))
            .orderBy("n_name")
        )

    force(p07_broadcast())
    out["p07_broadcast_study"] = {
        "flat_shj": sp["p07_join_agg"],
        "broadcast_build": min(timed(lambda: force(p07_broadcast())) for _ in range(2)),
    }

    # --- DuckDB side, same window -------------------------------------------
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF100}/{t}.parquet/*.parquet')"
        )
    du = {}
    for name in SUBSET:
        sql = oracles[name]
        con.execute(sql).fetchall()  # warmup
        du[name] = min(timed(lambda: con.execute(sql).fetchall()) for _ in range(2))
    out["duckdb"] = du
    out["totals"] = {
        "spark": round(sum(sp.values()), 2),
        "duckdb": round(sum(du.values()), 2),
        "ratio": round(sum(sp.values()) / sum(du.values()), 3),
        "ratio_excl_q5": round(
            sum(v for k, v in sp.items() if k != "p31_q5_join")
            / sum(v for k, v in du.items() if k != "p31_q5_join"), 3),
    }

    # --- d34 sf10 datapoint (verdict item 3) --------------------------------
    tune_file_partitioning(spark, SF10)
    d34 = registry["d34_tfidf_embed"]
    force(d34(spark, SF10))
    sp34 = min(timed(lambda: force(d34(spark, SF10))) for _ in range(2))
    con10 = duckdb.connect()
    con10.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF10}/documents.parquet/*.parquet')"
    )
    sql34 = oracles["d34_tfidf_embed"]
    con10.execute(sql34).fetchall()
    du34 = min(timed(lambda: con10.execute(sql34).fetchall()) for _ in range(2))
    out["d34_sf10"] = {"spark": sp34, "duckdb": du34,
                       "ratio": round(sp34 / du34, 3)}
    # d34 proper is a 100-doc conformance slice (fixed overhead at any
    # SF); the at-scale claim is the FULL-corpus embedder (verdict item
    # 3), same formula both engines, 16-row checksum so neither side pays
    # result materialization
    from mindsdb_spark.operators.kb import hash_embed_tfidf

    def d34_full_spark():
        docs = load_table(spark, SF10, "documents")
        emb = hash_embed_tfidf(docs, text_col="text", dim=16, out_float=False)
        lanes = emb.select(F.posexplode("embedding").alias("lane", "v"))
        return lanes.groupBy("lane").agg(F.sum("v").alias("s")).collect()

    d34_full_spark()
    spf = min(timed(d34_full_spark) for _ in range(2))
    full_sql = r"""
WITH t AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
           FROM documents),
tf AS (SELECT doc_id,
              list_transform(generate_series(0, 15),
                i -> CAST(len(list_filter(w,
                       t -> ('0x' || substr(md5(t), 1, 8))::UBIGINT % 16 = i))
                     AS DOUBLE)) AS tfv
       FROM t),
lanes AS (SELECT doc_id, i - 1 AS lane, tfv[i] AS v
          FROM tf, UNNEST(generate_series(1, 16)) AS u(i)),
dfs AS (SELECT lane, sum(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS dfb,
               count(DISTINCT doc_id) AS n
        FROM lanes GROUP BY lane),
tfidf AS (SELECT l.doc_id, l.lane, l.v * ln(d.n / (1.0 + d.dfb)) AS v
          FROM lanes l JOIN dfs d ON l.lane = d.lane),
normed AS (SELECT doc_id, lane,
                  v / greatest(sqrt(sum(v * v) OVER (PARTITION BY doc_id)), 1e-12) AS v
           FROM tfidf)
SELECT lane, sum(v) AS s FROM normed GROUP BY lane ORDER BY lane
"""
    con10.execute(full_sql).fetchall()
    duf = min(timed(lambda: con10.execute(full_sql).fetchall()) for _ in range(2))
    out["d34_full_corpus_sf10"] = {"spark": spf, "duckdb": duf,
                                   "ratio": round(spf / duf, 3)}

    # --- p05 floor study (round-8): bare scan+agg constant ------------------
    def bare_spark():
        li = load_table(spark, SF100, "lineitem")
        force(li.agg(F.sum("l_quantity"), F.sum("l_extendedprice"),
                     F.sum("l_discount"), F.min("l_shipdate"),
                     F.max("l_shipdate"), F.count("*")))

    BARE = ("SELECT sum(l_quantity), sum(l_extendedprice), sum(l_discount), "
            "min(l_shipdate), max(l_shipdate), count(*) FROM lineitem")
    bare_spark()
    sp_bare = min(timed(bare_spark) for _ in range(3))
    con.execute(BARE).fetchall()
    du_bare = min(timed(lambda: con.execute(BARE).fetchall()) for _ in range(2))
    out["p05_floor_study"] = {
        "bare_scan_agg_spark": sp_bare, "bare_scan_agg_duckdb": du_bare,
        "bare_ratio": round(sp_bare / du_bare, 2),
    }

    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
