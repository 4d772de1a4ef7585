"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Protocol (BASELINE.md): the baseline is DuckDB running the identical probe
set on the identical parquet inputs. Each query is forced end-to-end with
the noop sink (full computation, no driver collect overhead); timing is
best-of-N after a warmup run so JVM/codegen warmup isn't billed to the
query (DuckDB gets the same treatment reading from OS page cache).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

# Headline set: one per operator family — scan+filter, Q1 aggregation,
# having+countd, join+agg, outer join, windows (rank + analytic), rollup,
# Q5 multi-join, time bucketing, sessionization, vector top-k, dedup.
HEADLINE = [
    "p01_scan_filter",
    "p04_math_case",
    "p05_groupby_agg",
    "p06_having_countd",
    "p07_join_agg",
    "p08_left_join",
    "p20_rank_windows",
    "p21_analytic_windows",
    "p23_rollup",
    "p27_time_bucket",
    "p28_session_flag",
    "p31_q5_join",
    "p32_vector_topk",
]


def _force(df) -> None:
    """Execute the full plan JVM-side without materializing to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _duckdb_baseline(names: list[str], registry: dict) -> dict[str, float]:
    """Best-of-RUNS timings for the identical oracle SQL in DuckDB, measured
    in the SAME window — this host carries variable co-tenant load (absolute
    totals swing ±30%), so only same-window ratios are meaningful."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    out: dict[str, float] = {}
    for name in names:
        sql = registry[name][1]
        if not sql:
            continue
        con.execute(sql).fetchall()  # warmup: page cache
        best = min(
            (lambda t0: (con.execute(sql).fetchall(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(RUNS)
        )
        out[name] = round(best, 4)
    return out


def main() -> None:
    from mindsdb_spark import get_spark
    from mindsdb_spark.queries.pipeline import PIPELINE
    from mindsdb_spark.queries.probes import PROBES

    registry = {**PROBES, **PIPELINE}
    names = [n for n in HEADLINE if n in registry]
    names += [n for n in registry if n.startswith("d") and n not in names]

    spark = get_spark(app_name="mindsdb-spark-bench")
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    timings: dict[str, float] = {}
    for name in names:
        fn = registry[name][0]
        _force(fn(spark, SF_DIR))  # warmup: codegen + page cache
        best = min(
            (lambda t0: (_force(fn(spark, SF_DIR)), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(RUNS)
        )
        timings[name] = round(best, 4)

    baseline = _duckdb_baseline(names, registry)
    base_total = round(sum(baseline.values()), 4)
    total = round(sum(timings.values()), 4)
    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    print(
        json.dumps(
            {
                "metric": "headline_total_best_of_%d" % RUNS,
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "duckdb_same_window": {"total": base_total, "queries": baseline},
                "ratio_vs_duckdb": round(total / base_total, 3) if base_total else None,
                "load1": load1,
            }
        )
    )


if __name__ == "__main__":
    main()
