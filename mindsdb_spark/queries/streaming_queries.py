"""Driver-contract queries that execute through Structured Streaming.

The reference approximates streams with polling jobs + LAST
(jobs/README.md:1-60, last_query.py:21-120); these queries run the SAME
aggregations the batch probes compute, but as incremental streaming plans
(file source → watermarked stateful agg → available-now drain), and are
oracle-checked against the batch SQL — streaming execution, batch truth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Streaming file sources need an explicit schema; events.ts has shipped as
# both TIMESTAMP(NANOS) (reads as long under nanosAsLong) and TIMESTAMP(MICROS)
# across fixture generations, so sniff the parquet footer and adapt — same
# normalization batch reads get in catalog.load_table.
_EVENTS_COLS = (
    "event_id bigint, {ts}, user_id bigint, event_type string, "
    "value double, props string"
)


def _events_ts_is_int64(path: str) -> bool:
    """True when events.ts needs the nanosAsLong compat path: either the
    column is already plain physical int64, or it is TIMESTAMP(NANOS) —
    physical INT64 with a nanos annotation, which pyarrow reports as
    timestamp[ns] and which Spark's streaming parquet reader rejects unless
    nanosAsLong is set. Spark-written INT96 timestamps ALSO surface as
    timestamp[ns] in arrow, but Spark reads INT96 natively — so the
    decision needs the parquet PHYSICAL type, not just the arrow type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.isdir(path):
        import glob

        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            raise FileNotFoundError(
                f"split events dir contains no *.parquet files: {path}"
            )
        path = files[0]
    pf = pq.ParquetFile(path)
    sch = pf.schema  # parquet schema: physical types
    phys = {sch.column(i).name: sch.column(i).physical_type for i in range(len(sch.names))}
    if phys.get("ts") != "INT64":
        return False  # INT96 (or other): Spark's plain timestamp read works
    t = pf.schema_arrow.field("ts").type
    if pa.types.is_timestamp(t) and t.unit == "ns":
        return True  # TIMESTAMP(NANOS): rejected without nanosAsLong
    return str(t) == "int64"


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mindsdb_spark.streaming.windows import stream_from_parquet

    split_dir = os.path.join(sf_dir, "events.parquet")
    is_split = os.path.isdir(split_dir)
    nanos = _events_ts_is_int64(split_dir)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = _EVENTS_COLS.format(ts="ts bigint")
    else:
        schema = _EVENTS_COLS.format(ts="ts timestamp")
    if is_split:
        stream = stream_from_parquet(spark, split_dir, schema)
    else:
        stream = stream_from_parquet(spark, sf_dir, schema, path_glob="events.parquet")
    if nanos:
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream


def st01_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P27's tumbling-hour aggregation, executed as a STREAM: file source →
    watermark → windowed stateful agg → available-now drain to a memory
    sink. window('1 hour').start == date_trunc('hour'), so the batch SQL is
    the exact oracle."""
    from mindsdb_spark.streaming.windows import run_available_now, tumbling_counts

    out = run_available_now(tumbling_counts(_event_stream(spark, sf_dir)), "complete")
    return out.orderBy("h", "event_type")


ST01_SQL = """
SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
       round(sum(value), 2) AS sv
FROM events GROUP BY date_trunc('hour', ts), event_type ORDER BY h, event_type
"""


def st02_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user as a stream (session_window +
    watermarked state). Oracle: the classic lag/cumsum island SQL — a
    session's start/end/count must agree exactly with the batch
    formulation."""
    from mindsdb_spark.streaming.windows import run_available_now, session_counts

    out = run_available_now(
        session_counts(_event_stream(spark, sf_dir), gap="30 minutes"), "complete"
    )
    return out.select("user_id", "session_start", "n_events", "sv").orderBy(
        "user_id", "session_start"
    )


ST02_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       round(sum(value), 2) AS sv
FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start
"""


def st03_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h wide, 30 min slide) as a stream —
    every event lands in width/slide = 2 overlapping windows. Oracle:
    fan each event out to its 2 window starts and aggregate (both engines
    epoch-align 30-minute buckets)."""
    from mindsdb_spark.streaming.windows import run_available_now, sliding_counts

    out = run_available_now(
        sliding_counts(_event_stream(spark, sf_dir), "1 hour", "30 minutes"), "complete"
    )
    return out.orderBy("ws", "event_type")


ST03_SQL = """
WITH x AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k.k * INTERVAL 30 MINUTE AS ws,
         event_type
  FROM events, (SELECT unnest([0, 1]) AS k) k
)
SELECT ws, ws + INTERVAL 60 MINUTE AS we, event_type, count(*) AS n
FROM x GROUP BY ws, event_type ORDER BY ws, event_type
"""


def st04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with bounded watermark state. Only the key
    columns are projected: WHICH row survives per key is arrival-order-
    dependent (nondeterministic across partitions), but the surviving key
    SET equals batch DISTINCT exactly."""
    from mindsdb_spark.streaming.windows import run_available_now, streaming_dedup

    out = run_available_now(
        streaming_dedup(_event_stream(spark, sf_dir), ["user_id", "event_type"]),
        "append",
    )
    return out.select("user_id", "event_type").orderBy("user_id", "event_type")


ST04_SQL = """
SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type
"""


def st05_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: the event stream joins the static
    customer dimension (broadcast by Catalyst — the static side is planned
    like any batch relation), then a watermarked tumbling aggregation per
    market segment. The reference has no streaming joins at all; this is
    the canonical Structured Streaming enrichment shape. Oracle: the same
    join+agg as batch SQL."""
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.streaming.windows import run_available_now

    ev = _event_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    agg = (
        ev.join(cust, "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.col("w.start").alias("h"), F.col("c_mktsegment").alias("seg"), "n", "sv"
        )
    )
    return run_available_now(agg, "complete").orderBy("h", "seg")


ST05_SQL = """
SELECT date_trunc('hour', e.ts) AS h, c.c_mktsegment AS seg,
       count(*) AS n, round(sum(e.value), 2) AS sv
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY date_trunc('hour', e.ts), c.c_mktsegment ORDER BY h, seg
"""


def st06_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join: clicks joined to purchases by the same
    user within the following 30 minutes. Both sides are watermarked so the
    join state is bounded (Spark retains only the watermark horizon per
    side); the time-range conjunct is what makes state eviction possible —
    the canonical funnel-attribution shape. Far beyond the reference's
    polling-job approximation. Oracle: the identical batch interval join —
    inner stream-stream joins emit exactly the pair set batch computes."""
    from mindsdb_spark.streaming.windows import run_available_now

    ev = _event_stream(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    pairs = clicks.join(
        purchases,
        (clicks.user_id == purchases.user_id)
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select(
        clicks.user_id.alias("user_id"), "click_id", "purchase_id"
    )
    return run_available_now(pairs, "append").orderBy("user_id", "click_id", "purchase_id")


ST06_SQL = """
SELECT c.user_id AS user_id, c.event_id AS click_id, p.event_id AS purchase_id
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
ORDER BY user_id, click_id, purchase_id
"""


def st07_stream_model_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING model inference: the event stream runs through the same
    mapInPandas model-apply stage batch queries use (apply_model works
    unchanged on a streaming frame — micro-batches arrive as Arrow
    batches), then a tumbling aggregate over the scored column. The
    reference can only poll a job that re-runs batch predictions; this is
    true continuous scoring. The model is the deterministic risk scorer
    (a01's shape over event values), so DuckDB replays score + window
    exactly."""
    from mindsdb_spark.operators.model import ModelSpec, apply_model
    from mindsdb_spark.streaming.windows import run_available_now

    def predict(pdf):
        import pandas as pd

        risk = (pdf["value"] / 100.0).clip(upper=1.0)
        return pd.DataFrame({"risk": risk})

    spec = ModelSpec(name="stream_risk", predict=predict, output_schema="risk double")
    ev = _event_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    scored = apply_model(ev.select("ts", "event_type", "value"), spec)
    agg = (
        scored.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            (F.floor(F.sum("risk") * 1e6 + F.lit(0.5)) / 1e6).alias("sr"),
        )
        .select(F.col("w.start").alias("h"), "event_type", "n", "sr")
    )
    return run_available_now(agg, "complete").orderBy("h", "event_type")


ST07_SQL = """
SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
       floor(sum(least(value / 100.0, 1.0)) * 1000000 + 0.5) / 1000000 AS sr
FROM events GROUP BY date_trunc('hour', ts), event_type
ORDER BY h, event_type
"""


def st08_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING anomaly detection with engine-managed per-key state: the
    event stream folds through `rolling_zscore_alerts` — trailing-window
    baseline held as O(window) doubles per key in the state store, alerts
    emitted as points arrive. The batch twin (`temporal.anomaly_zscore`,
    t05) recomputes the same flags with a full-table window; the oracle is
    that batch SQL filtered to anomalies, so streaming execution is checked
    against batch truth row-for-row."""
    from mindsdb_spark.streaming.stateful import rolling_zscore_alerts
    from mindsdb_spark.streaming.windows import run_available_now

    out = run_available_now(
        rolling_zscore_alerts(_event_stream(spark, sf_dir)), "append"
    )
    return out.select("user_id", "event_id", "value", "zscore").orderBy(
        "user_id", "event_id"
    )


ST08_SQL = """
WITH w AS (
  SELECT user_id, event_id, value,
         avg(value) OVER fr AS mu,
         stddev_samp(value) OVER fr AS sd
  FROM events
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, value,
       floor((value - mu) / sd * 10000 + 0.5) / 10000 AS zscore
FROM w
WHERE sd IS NOT NULL AND sd > 0
  AND abs(floor((value - mu) / sd * 10000 + 0.5) / 10000) > 2.5
ORDER BY user_id, event_id
"""



def st09_stream_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming seasonal-residual scoring: the (event_type x hour-of-day)
    mean profile is computed in BATCH from history (operators/temporal.py:
    seasonal_baseline's cell mean), broadcast-joined to the live event
    stream, and each event's residual against its seasonal cell feeds a
    watermarked tumbling anomaly count (threshold 150 ~ the residual p99,
    so flags are a real tail signal, not the bulk). The batch-profile + stream-score
    split is the canonical production monitoring deployment (profiles
    refresh on a schedule, scoring is continuous); the reference's polling
    jobs can only re-run the whole batch. Profile means are rounded to
    1e-6 BEFORE the residual so both engines threshold identical values.
    Oracle: the identical profile join + aggregation as batch SQL."""
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.streaming.windows import run_available_now

    hist = load_table(spark, sf_dir, "events")
    profile = hist.groupBy(
        "event_type", F.hour("ts").cast("int").alias("__hod")
    ).agg(
        (F.floor(F.avg("value") * 1e6 + F.lit(0.5)) / 1e6).alias("__mu")
    )
    ev = _event_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    scored = ev.withColumn("__hod", F.hour("ts").cast("int")).join(
        F.broadcast(profile), ["event_type", "__hod"]
    )
    resid = F.floor((F.col("value") - F.col("__mu")) * 1e6 + F.lit(0.5)) / 1e6
    agg = (
        scored.withColumn("__anom", (F.abs(resid) > 150.0).cast("int"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("__anom").cast("long").alias("n_anom"))
        .select(F.col("w.start").alias("h"), "event_type", "n", "n_anom")
    )
    return run_available_now(agg, "complete").orderBy("h", "event_type")


ST09_SQL = """
WITH prof AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod,
         floor(avg(value) * 1000000 + 0.5) / 1000000 AS mu
  FROM events GROUP BY event_type, CAST(hour(ts) AS INT)
)
SELECT date_trunc('hour', e.ts) AS h, e.event_type, count(*) AS n,
       CAST(sum(CASE WHEN abs(floor((e.value - p.mu) * 1000000 + 0.5) / 1000000)
                          > 150.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
FROM events e JOIN prof p
  ON p.event_type = e.event_type AND p.hod = CAST(hour(e.ts) AS INT)
GROUP BY date_trunc('hour', e.ts), e.event_type
ORDER BY h, e.event_type
"""



def st10_stream_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming drift monitor: per-hour-window PSI of the live value
    distribution against the historical baseline — the streaming twin of
    the batch a08 drift report (operators/monitoring.py). The stream does
    the STATEFUL part (watermarked tumbling (window, bin) counts — one
    stateful aggregate, bin edges ride in as a broadcast 1-row join); the
    PSI rollup over the drained counts is a bounded batch stage
    (windows × n_bins rows), the foreachBatch-sink-then-rollup deployment
    shape. Baseline shares clamp at 1e-6 exactly like psi_drift; psi
    rounds to 1e-6 per window."""
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.streaming.windows import run_available_now

    n_bins = 10
    hist = load_table(spark, sf_dir, "events")
    edges = hist.agg(
        F.min("value").cast("double").alias("__lo"),
        F.max("value").cast("double").alias("__hi"),
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    bin_of = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((F.col("value") - F.col("__lo")) / width).cast("int")),
    )
    base = (
        hist.crossJoin(F.broadcast(edges))
        .select(bin_of.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("__nb"))
    )
    ev = _event_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    counts = (
        ev.join(F.broadcast(edges))  # 1-row static side: bin edges
        .withColumn("bin", bin_of)
        .groupBy(F.window("ts", "1 hour").alias("w"), "bin")
        .agg(F.count("*").alias("__nc"))
        .select(F.col("w.start").alias("h"), "bin", "__nc")
    )
    drained = run_available_now(counts, "complete")
    # bounded batch rollup: every window × every baseline bin (missing bins
    # clamp to the 1e-6 share, same as psi_drift)
    wt = drained.groupBy("h").agg(F.sum("__nc").alias("__tc"))
    bt = base.agg(F.sum("__nb").alias("__tb"))
    grid = wt.crossJoin(F.broadcast(base)).crossJoin(F.broadcast(bt))
    # rename the probe side: the memory-sink view appears twice in this
    # plan (totals + per-bin counts) and needs disambiguated attributes
    probe = drained.select(
        F.col("h").alias("__h2"), F.col("bin").alias("__b2"), "__nc"
    )
    j = grid.join(
        probe, (grid["h"] == probe["__h2"]) & (grid["bin"] == probe["__b2"]), "left"
    ).fillna({"__nc": 0})
    p_base = F.greatest(F.col("__nb") / F.col("__tb"), F.lit(1e-6))
    p_cur = F.greatest(F.col("__nc") / F.col("__tc"), F.lit(1e-6))
    psi_term = (p_cur - p_base) * F.log(p_cur / p_base)
    return (
        j.groupBy("h")
        .agg(
            F.sum("__nc").cast("long").alias("n"),
            (F.floor(F.sum(psi_term) * 1e6 + F.lit(0.5)) / 1e6).alias("psi"),
        )
        .orderBy("h")
    )


ST10_SQL = """
WITH ed AS (SELECT CAST(min(value) AS DOUBLE) AS lo, CAST(max(value) AS DOUBLE) AS hi
            FROM events),
binned AS (SELECT date_trunc('hour', ts) AS h,
                  least(9, greatest(0, CAST(floor((value - lo) / ((hi - lo) / 10.0)) AS INT))) AS bin
           FROM events, ed),
base AS (SELECT bin, count(*) AS nb FROM binned GROUP BY bin),
bt AS (SELECT sum(nb) AS tb FROM base),
wb AS (SELECT h, bin, count(*) AS nc FROM binned GROUP BY h, bin),
wt AS (SELECT h, sum(nc) AS tc FROM wb GROUP BY h),
grid AS (SELECT wt.h, base.bin, base.nb, wt.tc, coalesce(wb.nc, 0) AS nc
         FROM wt CROSS JOIN base LEFT JOIN wb ON wb.h = wt.h AND wb.bin = base.bin),
terms AS (SELECT h, nc,
                 (greatest(nc / tc, 0.000001) - greatest(nb / (SELECT tb FROM bt), 0.000001))
                 * ln(greatest(nc / tc, 0.000001) / greatest(nb / (SELECT tb FROM bt), 0.000001)) AS t
          FROM grid)
SELECT h, CAST(sum(nc) AS BIGINT) AS n,
       floor(sum(t) * 1000000 + 0.5) / 1000000 AS psi
FROM terms GROUP BY h ORDER BY h
"""


def st11_stream_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash-LSH dedup: documents arriving as a STREAM are
    sketched per-row (rowwise_lsh_bands — the whole shingle→minhash→band
    fold as higher-order functions, no aggregation, hence streaming-legal)
    and probe a band index built from the static corpus; one streaming
    aggregation dedups band hits into candidate pairs, the available-now
    drain hands them to the batch exact-Jaccard confirm
    (incremental_dedup(candidates=...)). This is d31's semantics with the
    new-batch side executed as a real stream — at scale the band index is
    the persisted state and each micro-batch ships only its own band keys.
    Oracle: the identical batch SQL (D31's)."""
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.dedup import incremental_dedup, lsh_bands
    from mindsdb_spark.operators.dedup import minhash_signatures, rowwise_lsh_bands
    from mindsdb_spark.operators.dedup import shingle_hashes
    from mindsdb_spark.streaming.windows import run_available_now, stream_from_parquet

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") < 400)
    bd_c = lsh_bands(minhash_signatures(shingle_hashes(corpus))).select(
        F.col("doc_id").alias("__cid"), "band_id", "band_sig"
    )

    split_dir = os.path.join(sf_dir, "documents.parquet")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    if os.path.isdir(split_dir):
        stream = stream_from_parquet(spark, split_dir, schema)
    else:
        stream = stream_from_parquet(spark, sf_dir, schema, path_glob="documents.parquet")
    bd_s = rowwise_lsh_bands(stream.where(F.col("doc_id") >= 400)).select(
        F.col("doc_id").alias("__bid"), "band_id", "band_sig"
    )
    cand_stream = (
        bd_s.join(bd_c, ["band_id", "band_sig"])  # stream-static index probe
        .groupBy("__bid", "__cid")
        .count()  # the one streaming aggregation: dedups multi-band hits
    )
    cand = run_available_now(cand_stream, "complete").select("__bid", "__cid")
    return incremental_dedup(
        corpus,
        docs.where(F.col("doc_id") >= 400),
        jaccard_threshold=0.5,
        candidates=cand,
    ).orderBy("doc_id")


def _st11_sql() -> str:
    from mindsdb_spark.queries.pipeline import D31_SQL

    return D31_SQL


ST11_SQL = _st11_sql()


def st12_stream_ppl_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming quality scoring: documents arriving as a stream are scored
    against a STATIC corpus unigram LM — token explode (stateless), a
    stream-static join onto the frequency table, the corpus total on a
    static 1-row cross join, and ONE streaming aggregation per doc. The
    deployment shape of an ingest-time perplexity filter: the LM is the
    persisted state, each micro-batch ships only its own tokens. Oracle:
    d27's batch SQL over the same corpus."""
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.dedup import words_expr
    from mindsdb_spark.streaming.windows import run_available_now, stream_from_parquet

    docs = load_table(spark, sf_dir, "documents")
    tok_b = docs.select(F.explode(words_expr(F.col("text"))).alias("__tok"))
    tf = tok_b.groupBy("__tok").agg(F.count("*").alias("__c")).persist()
    total = tf.agg(F.sum("__c").alias("__t"))

    split_dir = os.path.join(sf_dir, "documents.parquet")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    if os.path.isdir(split_dir):
        stream = stream_from_parquet(spark, split_dir, schema)
    else:
        stream = stream_from_parquet(spark, sf_dir, schema, path_glob="documents.parquet")
    scored = (
        stream.select("doc_id", F.explode(words_expr(F.col("text"))).alias("__tok"))
        .join(tf, "__tok")
        .crossJoin(total)
        .select("doc_id", (-F.log(F.col("__c") / F.col("__t"))).alias("__nll"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.avg("__nll").alias("__a"))
    )
    out = run_available_now(scored, "complete")
    return out.select(
        "doc_id",
        "n_tokens",
        (F.floor(F.col("__a") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("nll"),
    ).orderBy("doc_id")


def _st12_sql() -> str:
    from mindsdb_spark.queries.pipeline import D27_SQL

    return D27_SQL


ST12_SQL = _st12_sql()


def st13_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Gopher quality gate: the per-rule boolean table as a pure
    MAP over the stream — no aggregation, no watermark, zero state. The
    ingest-shape every streaming curation pipeline starts with (filter at
    the door, before anything stateful); append-mode drain, batch oracle
    (d50's SQL). Complements the stateful st-queries: this one proves the
    zero-state path end-to-end."""
    from mindsdb_spark.operators.curation import gopher_rules
    from mindsdb_spark.streaming.windows import run_available_now, stream_from_parquet

    split_dir = os.path.join(sf_dir, "documents.parquet")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    if os.path.isdir(split_dir):
        stream = stream_from_parquet(spark, split_dir, schema)
    else:
        stream = stream_from_parquet(spark, sf_dir, schema, path_glob="documents.parquet")
    out = run_available_now(gopher_rules(stream), "append")
    return out.orderBy("doc_id")


def _st13_sql() -> str:
    from mindsdb_spark.queries.pipeline import D50_SQL

    return D50_SQL


ST13_SQL = _st13_sql()


STREAMING_QUERIES = {
    "st13_stream_quality_gate": (st13_stream_quality_gate, ST13_SQL),
    "st12_stream_ppl_score": (st12_stream_ppl_score, ST12_SQL),
    "st11_stream_lsh_dedup": (st11_stream_lsh_dedup, ST11_SQL),
    "st10_stream_drift": (st10_stream_drift, ST10_SQL),
    "st09_stream_seasonal": (st09_stream_seasonal, ST09_SQL),
    "st08_stream_anomaly": (st08_stream_anomaly, ST08_SQL),
    "st07_stream_model_apply": (st07_stream_model_apply, ST07_SQL),
    "st01_stream_tumbling": (st01_stream_tumbling, ST01_SQL),
    "st02_stream_sessions": (st02_stream_sessions, ST02_SQL),
    "st03_stream_sliding": (st03_stream_sliding, ST03_SQL),
    "st04_stream_dedup": (st04_stream_dedup, ST04_SQL),
    "st05_stream_enrich": (st05_stream_enrich, ST05_SQL),
    "st06_stream_stream_join": (st06_stream_stream_join, ST06_SQL),
}
