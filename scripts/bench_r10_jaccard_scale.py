"""Round-10 jaccard_topk_pairs scale study: old (inherited round-10 HEAD)
vs new (grouped index + packed keys + threshold prune) across decades.

Generates documents-only fixtures at the requested scales
(fixtures.generate_sf(tables={"documents"})), then times d06's operator
call with the bench methodology (noop sink, warmup + best-of-2). The OLD
implementation is imported from a pristine checkout passed via
--old-repo (a git worktree of the pre-optimization commit); omit it to
time only the current code.

Usage:
    python scripts/bench_r10_jaccard_scale.py --scales 30 100 \
        [--old-repo /tmp/repo_head] [--old-max-scale 30]

Writes/updates BENCH_r10_jaccard_scale.json in the repo root.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_old_jaccard(old_repo: str):
    """Import the old dedup module in isolation (its own package copy)."""
    sys.path.insert(0, old_repo)
    for m in [m for m in list(sys.modules) if m.startswith("mindsdb_spark")]:
        del sys.modules[m]
    import mindsdb_spark.operators.dedup as old_dedup  # noqa: PLC0415

    fns = (old_dedup.jaccard_topk_pairs, old_dedup.shingle_hashes)
    sys.path.pop(0)
    for m in [m for m in list(sys.modules) if m.startswith("mindsdb_spark")]:
        del sys.modules[m]
    return fns


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", nargs="+", type=float, default=[30.0, 100.0])
    ap.add_argument("--old-repo", default=None)
    ap.add_argument(
        "--old-max-scale", type=float, default=30.0,
        help="skip the old implementation above this scale (its pair flood "
        "grows ~quadratically; see the sf1 profile in OPTIMIZATION_r10.md)",
    )
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    old_fns = _load_old_jaccard(args.old_repo) if args.old_repo else None
    from mindsdb_spark import get_spark
    from mindsdb_spark.catalog import cache_table
    from mindsdb_spark.fixtures import generate_sf
    from mindsdb_spark.operators.dedup import jaccard_topk_pairs, shingle_hashes
    from mindsdb_spark.session import tune_file_partitioning

    spark = get_spark(app_name="r10-jaccard-scale")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def best_of(mk, runs):
        force(mk())
        return round(
            min(
                (lambda t0: (force(mk()), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                )
                for _ in range(runs)
            ),
            3,
        )

    out_path = os.path.join(REPO, "BENCH_r10_jaccard_scale.json")
    record = json.load(open(out_path)) if os.path.exists(out_path) else {}
    for scale in args.scales:
        tag = f"sf{scale / 10:g}"
        d = os.path.join("/tmp/spark_graft_bench", f"{tag}_docs")
        generate_sf(spark, d, scale=scale, seed=42, tables={"documents"})
        tune_file_partitioning(spark, d)
        # the docs-only fixture dir is tiny in BYTES while d06 amplifies
        # ~1000x into shingle pairs, so the size-keyed small-input branch
        # (few shuffle partitions, AQE off) would throttle the pair
        # aggregate of BOTH implementations; restore the cluster posture
        # the full-table bench dirs get at these scales
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark.conf.set("spark.sql.shuffle.partitions", cpus)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        docs = cache_table(spark, d, "documents")
        spark.sparkContext.setJobDescription(f"jaccard new {tag}")
        entry = {"new_s": best_of(lambda: jaccard_topk_pairs(shingle_hashes(docs)), args.runs)}
        if old_fns is not None and scale <= args.old_max_scale:
            old_jac, old_sh = old_fns
            spark.sparkContext.setJobDescription(f"jaccard old {tag}")
            entry["old_s"] = best_of(lambda: old_jac(old_sh(docs)), args.runs)
            entry["speedup"] = round(entry["old_s"] / entry["new_s"], 2)
        try:
            entry["load1"] = round(os.getloadavg()[0], 2)
        except OSError:
            pass
        record[tag] = entry
        print(tag, entry, flush=True)
        json.dump(record, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
