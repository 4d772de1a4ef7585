"""Full-registry oracle sweep → machine-readable SWEEP_r{N}.json.

The driver's correctness gate records only a ~50-key window per round
(CORRECTNESS_r{N}.json); the builder has always ALSO run the complete
registry locally but recorded the result only in prose. This script makes
that full sweep a mechanical artifact (round-8 verdict item 2): every
`__spark_entry__.queries()` key is executed and compared against its
DuckDB oracle, in the CORRECTNESS per-key format, on TWO layouts:

* ``sf0.01`` — the driver gate's own fixture scale;
* ``split32`` — a 32-file parquet copy of sf0.1 with small
  maxPartitionBytes, so every scan splits across tasks and any
  float-aggregation-order / partition-count sensitivity surfaces.

Usage::

    python scripts/sweep.py [round_number]     # writes SWEEP_r{N}.json

Environment: SPARK_GRAFT_CPUS (default 16 here — the sweep is many small
queries, not one big one).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def check_one(spark, fn, oracle_sql, sf_dir) -> dict:
    """One key vs its oracle — the CORRECTNESS_r{N}.json record shape."""
    from mindsdb_spark.compare import duckdb_oracle, normalize

    rec = {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "spark_rows": None,
        "oracle_rows": None,
        "err": None,
    }
    try:
        got = fn(spark, sf_dir).toPandas()
        rec["spark_rows"] = int(len(got))
        if oracle_sql is None:  # rows-only key (documented: p38)
            rec["rows_match"] = rec["spark_rows"] > 0
            return rec
        exp = duckdb_oracle(oracle_sql, sf_dir)
        rec["oracle_rows"] = int(len(exp))
        rec["rows_match"] = len(got) == len(exp)
        got.columns = [c.lower() for c in got.columns]
        exp.columns = [c.lower() for c in exp.columns]
        rec["schema_match"] = sorted(got.columns) == sorted(exp.columns)
        if rec["schema_match"]:
            dtype_ok = all(
                {got[c].dtype.kind, exp[c].dtype.kind} not in ({"i", "f"}, {"u", "f"})
                for c in got.columns
            )
            rec["hash_match"] = bool(
                dtype_ok and rec["rows_match"] and normalize(got) == normalize(exp)
            )
        else:
            rec["hash_match"] = False
    except Exception as e:  # noqa: BLE001 — the record carries the error
        rec["err"] = f"{type(e).__name__}: {e}"[:300]
    return rec


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_ROUND", "9")
    )
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as ent
    import bench
    from mindsdb_spark import get_spark
    from mindsdb_spark.session import apply_runtime_tuning

    spark = get_spark(cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    apply_runtime_tuning(spark)
    qs, osql = ent.queries(), ent.oracle_sql()

    out: dict = {
        "meta": {
            "round": rnd,
            "keys": len(qs),
            "oracle_backed": sum(1 for k in qs if k in osql),
            "generated_unix": int(time.time()),
        }
    }

    # --- layout 1: the driver gate scale --------------------------------
    sf001 = "/root/testdata/sf0.01"
    sec: dict = {}
    for i, (name, fn) in enumerate(sorted(qs.items()), 1):
        sec[name] = check_one(spark, fn, osql.get(name), sf001)
        sys.stderr.write(f"[sf0.01 {i}/{len(qs)}] {name}: "
                         f"{'OK' if sec[name]['hash_match'] or (name not in osql and sec[name]['rows_match']) else sec[name]}\n")
    out["sf0.01"] = sec

    # --- layout 2: 32-file split copy of sf0.1 --------------------------
    split_dir = bench._prepare_split(spark)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
    spark.conf.set("spark.sql.files.openCostInBytes", "1m")
    sec2: dict = {}
    for i, (name, fn) in enumerate(sorted(qs.items()), 1):
        sec2[name] = check_one(spark, fn, osql.get(name), split_dir)
        sys.stderr.write(f"[split32 {i}/{len(qs)}] {name}: "
                         f"{'OK' if sec2[name]['hash_match'] or (name not in osql and sec2[name]['rows_match']) else sec2[name]}\n")
    out["split32_sf0.1"] = sec2

    def green(rec, name):
        if name in osql:
            return bool(rec["rows_match"] and rec["schema_match"] and rec["hash_match"])
        return bool(rec["rows_match"])  # rows-only by design

    out["meta"]["sf0.01_green"] = sum(1 for n, r in sec.items() if green(r, n))
    out["meta"]["split32_green"] = sum(1 for n, r in sec2.items() if green(r, n))

    path = os.path.join(REPO, f"SWEEP_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({
        "sweep": path,
        "keys": len(qs),
        "sf0.01_green": out["meta"]["sf0.01_green"],
        "split32_green": out["meta"]["split32_green"],
    }))


if __name__ == "__main__":
    main()
