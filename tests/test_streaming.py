"""Structured Streaming operators: streaming results must equal their batch
equivalents when the stream is drained with available-now."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mindsdb_spark.catalog import load_table
from mindsdb_spark.streaming.windows import (
    run_available_now,
    session_counts,
    stream_from_parquet,
    streaming_dedup,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """Copy the events table into a stream-source dir as two file 'arrivals'."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    e = load_table(spark, sf_dir, "events")
    mid = e.agg(F.expr("percentile_approx(event_id, 0.5)")).head()[0]
    e.filter(F.col("event_id") <= mid).write.mode("overwrite").parquet(os.path.join(out, "batch=0"))
    e.filter(F.col("event_id") > mid).write.mode("append").parquet(os.path.join(out, "batch=0"))
    return os.path.join(out, "batch=0")


def _batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def test_streaming_tumbling_equals_batch(spark, sf_dir, events_stream_dir):
    batch = tumbling_counts(_batch_events(spark, sf_dir))
    schema = _batch_events(spark, sf_dir).schema
    stream = tumbling_counts(stream_from_parquet(spark, events_stream_dir, schema))
    got = run_available_now(stream)
    exp = {tuple(r) for r in batch.collect()}
    assert {tuple(r) for r in got.collect()} == exp
    assert len(exp) > 0


def test_streaming_sessions_equal_batch(spark, sf_dir, events_stream_dir):
    batch = session_counts(_batch_events(spark, sf_dir))
    schema = _batch_events(spark, sf_dir).schema
    got = run_available_now(session_counts(stream_from_parquet(spark, events_stream_dir, schema)))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}


def test_session_counts_match_lag_flag_semantics(spark, sf_dir):
    """session_window sessions == cumulative-sum-of-gap-flags sessions (P28)."""
    from pyspark.sql.window import Window

    e = _batch_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1)
        .otherwise(0)
        .alias("new_session"),
    ).withColumn("session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    lag_sessions = sorted(
        (r.user_id, r.n)
        for r in flagged.groupBy("user_id", "session_id").agg(F.count("*").alias("n")).collect()
    )
    sw_sessions = sorted((r.user_id, r.n_events) for r in session_counts(e).collect())
    assert lag_sessions == sw_sessions


def test_streaming_dedup(spark, sf_dir, events_stream_dir, tmp_path):
    schema = _batch_events(spark, sf_dir).schema
    # duplicate the source files → stream sees every row twice
    dup_dir = str(tmp_path / "dup")
    shutil.copytree(events_stream_dir, dup_dir)
    for f in os.listdir(events_stream_dir):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(events_stream_dir, f), os.path.join(dup_dir, "copy_" + f))
    stream = streaming_dedup(
        stream_from_parquet(spark, dup_dir, schema), keys=["event_id"]
    ).groupBy().agg(F.count("*").alias("n"))
    got = run_available_now(stream)
    assert got.head().n == _batch_events(spark, sf_dir).count()


def test_stream_lsh_dedup_matches_batch(spark, sf_dir):
    # the streaming door (per-row signatures probing a static band index)
    # must flag exactly the docs the batch incremental_dedup flags
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.dedup import incremental_dedup
    from mindsdb_spark.queries.streaming_queries import st11_stream_lsh_dedup

    got = st11_stream_lsh_dedup(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    want = (
        incremental_dedup(
            docs.where(F.col("doc_id") < 400),
            docs.where(F.col("doc_id") >= 400),
            jaccard_threshold=0.5,
        )
        .orderBy("doc_id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_stream_ppl_score_matches_batch(spark, sf_dir):
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.text import unigram_nll
    from mindsdb_spark.queries.streaming_queries import st12_stream_ppl_score

    got = st12_stream_ppl_score(spark, sf_dir).collect()
    want = (
        unigram_nll(load_table(spark, sf_dir, "documents"))
        .orderBy("doc_id")
        .collect()
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_stream_quality_gate_matches_batch(spark, sf_dir):
    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.curation import gopher_rules
    from mindsdb_spark.queries.streaming_queries import st13_stream_quality_gate

    got = st13_stream_quality_gate(spark, sf_dir).collect()
    want = gopher_rules(load_table(spark, sf_dir, "documents")).orderBy("doc_id").collect()
    assert got == want and len(got) > 0


def test_map_operators_compose_on_streams(spark, sf_dir):
    # parallelize_input passes streams through, so pure-map operators run
    # unchanged on a readStream plan
    import os

    from mindsdb_spark.catalog import load_table
    from mindsdb_spark.operators.text import text_quality
    from mindsdb_spark.streaming.windows import run_available_now, stream_from_parquet

    split_dir = os.path.join(sf_dir, "documents.parquet")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    if os.path.isdir(split_dir):
        stream = stream_from_parquet(spark, split_dir, schema)
    else:
        stream = stream_from_parquet(spark, sf_dir, schema, path_glob="documents.parquet")
    got = run_available_now(text_quality(stream), "append").orderBy("doc_id").collect()
    want = text_quality(load_table(spark, sf_dir, "documents")).orderBy("doc_id").collect()
    assert got == want and len(got) > 0


def test_stream_checkpoint_resume_exactly_once(spark, tmp_path):
    # file-source stream + checkpoint: a restarted query processes only the
    # files that arrived since the last run — no reprocessing, no loss
    import pandas as pd

    from mindsdb_spark.streaming.windows import stream_from_parquet

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "k bigint, v string"

    def run():
        q = (
            stream_from_parquet(spark, str(src), schema)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(src / "b1.parquet")
    run()
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2]
    pd.DataFrame({"k": [3], "v": ["c"]}).to_parquet(src / "b2.parquet")
    run()
    rows = sorted(r.k for r in spark.read.parquet(out).collect())
    assert rows == [1, 2, 3]  # batch1 not duplicated, batch2 not dropped
