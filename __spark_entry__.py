"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q5 shape, probe P31) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle; the driver hash-compares them at
sf0.01 → CORRECTNESS_r{N}.json.

Key ORDER is a round-robin interleave across the query families (probes,
pipeline, kb, temporal, engine, streaming): round 1 showed the driver's
correctness file records a 50-entry prefix of this dict, and the round-1
insertion order (all probes first) left the d/s/k/t/e/st families outside
the recorded window. Interleaving keeps every family represented in any
prefix. The key SET is stable — only the iteration order changed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mindsdb_spark.queries.probes import p31
    from mindsdb_spark.session import apply_runtime_tuning

    apply_runtime_tuning(spark)
    return p31(spark, "/root/testdata/sf0.001")


def _registries() -> list[dict]:
    from mindsdb_spark.queries.engine_queries import ENGINE_QUERIES
    from mindsdb_spark.queries.kb_queries import KB_QUERIES
    from mindsdb_spark.queries.pipeline import PIPELINE
    from mindsdb_spark.queries.probes import PROBES
    from mindsdb_spark.queries.probes_ext import PROBES_EXT
    from mindsdb_spark.queries.streaming_queries import STREAMING_QUERIES
    from mindsdb_spark.queries.temporal_queries import TEMPORAL_QUERIES

    return [
        PROBES,
        PROBES_EXT,
        PIPELINE,
        KB_QUERIES,
        TEMPORAL_QUERIES,
        ENGINE_QUERIES,
        STREAMING_QUERIES,
    ]


def _recording_priority() -> "Callable[[str], tuple]":
    """The driver records only a ~50-entry prefix of the ~190-query dict, so
    rotate what rides in the window each round: keys never recorded green in
    any CORRECTNESS_r*.json come first, then keys by the round they were
    last recorded (least-recently-verified first). Ties (same tier, same
    last-round) keep registration order — OLDEST first — so new registry
    additions queue BEHIND the never-recorded backlog instead of displacing
    it (round-3 verdict item 1)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    files = glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
    last_green: dict[str, int] = {}
    for p in files:
        m = re.search(r"_r(\d+)\.json$", p)
        try:
            with open(p) as f:
                recs = json.load(f)
        except (OSError, ValueError):
            continue
        # a record that wasn't fully hash-green (no_oracle / hash-red) needs
        # re-recording once fixed — treat it as never recorded
        n = int(m.group(1)) if m else -1
        for k, v in recs.items():
            if v.get("hash_match") is True:
                last_green[k] = max(last_green.get(k, -1), n)

    def prio(key: str, has_oracle: bool = True) -> tuple:
        # (tier, round-last-green): never-green oracle-backed keys lead,
        # then ascending recency; registration order breaks ties (stable
        # sort). Keys with NO oracle SQL (documented rows-only exclusions,
        # e.g. p38 approx_count_distinct) can never hash-green — they are
        # verified-by-property in tests, so they sort LAST instead of
        # riding the front of every window (round-6 verdict item 2).
        if not has_oracle:
            return (2, 0)
        if key not in last_green:
            return (0, 0)
        return (1, last_green[key])

    return prio


def _interleaved() -> list[tuple[str, tuple]]:
    """Round-robin across query FAMILIES (key prefix: p/d/s/k/t/e/m/a/i/st),
    each family ordered by registration order (oldest first), then globally
    stable-sorted by recording priority (never-driver-green first, then
    least-recently-recorded — see _recording_priority). Any recorded prefix
    of the dict covers every family and prefers the queries with the least
    driver-file verification. The key SET is stable across rounds; only
    iteration order changes."""
    import re
    from itertools import zip_longest

    prio = _recording_priority()
    families: dict[str, list[tuple[str, tuple]]] = {}
    for reg in _registries():
        for key, val in reg.items():
            fam = re.match(r"[a-z]+", key).group(0)[: 2 if key.startswith("st") else 1]
            families.setdefault(fam, []).append((key, val))
    ordered = [items for _fam, items in sorted(families.items())]
    merged: list[tuple[str, tuple]] = []
    for tup in zip_longest(*ordered):
        merged.extend(kv for kv in tup if kv is not None)
    # stable global sort: never-green oracle-backed keys first, then
    # ascending last-green round (family interleave preserved within each
    # tier), rows-only exclusions last, so the driver's ~50-entry window
    # drains the verification backlog before re-verifying
    merged.sort(key=lambda kv: prio(kv[0], has_oracle=kv[1][1] is not None))
    return merged


def _tuned(fn: "Callable[[SparkSession, str], DataFrame]"):
    """Apply runtime session tuning before each registry query — the
    driver's session skips get_spark. apply_runtime_tuning reads the
    session's conf and appends only if missing, so repeat calls are
    cheap and newSession() clones are covered too."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from mindsdb_spark.session import apply_runtime_tuning

        apply_runtime_tuning(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _tuned(fn) for name, (fn, _sql) in _interleaved()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted → rows-only)."""
    return {name: sql for name, (_fn, sql) in _interleaved() if sql is not None}
