"""Streaming tests: every operator's streaming(availableNow) output must
equal its batch twin's (Spark's unified semantics make this exact —
that's the whole design of rust_diskann_spark.streaming)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rust_diskann_spark import streaming as st
from rust_diskann_spark.operators.exact import exact_knn


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir):
    """Events fixture re-staged as a file-source directory so batch and
    stream read identical schemas regardless of whether the fixture ships
    ts as nanos-as-long or as a native TIMESTAMP column (the re-staged
    parquet keeps whatever type the source had)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = tempfile.mkdtemp(prefix="rds_stream_events_")
    (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .repartition(4)
        .write.mode("overwrite")
        .parquet(out)
    )
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _batch(spark, events_dir):
    return spark.read.parquet(events_dir)


def _stream(spark, events_dir):
    schema = spark.read.parquet(events_dir).schema
    return spark.readStream.schema(schema).parquet(events_dir)


def _run_to_memory(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sessionized_counts_stream_equals_batch(spark, events_dir):
    batch = st.sessionized_counts(_batch(spark, events_dir), gap="30 minutes")
    q = _run_to_memory(
        st.sessionized_counts(_stream(spark, events_dir), gap="30 minutes"),
        "sess_counts",
    )
    try:
        got = spark.sql("select * from sess_counts")
        assert _rows(got) == _rows(batch)
        assert batch.count() > 0
    finally:
        q.stop()


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    batch = st.windowed_event_counts(_batch(spark, events_dir), window="1 hour")
    q = _run_to_memory(
        st.windowed_event_counts(_stream(spark, events_dir), window="1 hour"),
        "win_counts",
    )
    try:
        got = spark.sql("select * from win_counts")
        assert _rows(got) == _rows(batch)
    finally:
        q.stop()


def test_streaming_dedup(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    dup = docs.unionAll(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        )
    )
    stage = tempfile.mkdtemp(prefix="rds_stream_docs_")
    try:
        dup.write.mode("overwrite").parquet(stage)
        stream = spark.readStream.schema(dup.schema).parquet(stage)
        out = st.streaming_dedup(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        try:
            got = spark.sql("select * from dedup_out")
            # one survivor per distinct content hash
            assert got.count() == docs.select(F.md5("text")).distinct().count()
            assert got.groupBy("content_hash").count().agg(
                F.max("count")
            ).collect()[0][0] == 1
        finally:
            q.stop()
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def test_ann_search_stream_foreachbatch(spark, sf_dir):
    """foreachBatch serving: stream of queries -> batch search pipeline ->
    parquet sink; results equal the all-at-once batch run."""
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    corpus = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    qdir = tempfile.mkdtemp(prefix="rds_stream_q_")
    sink = tempfile.mkdtemp(prefix="rds_stream_res_")
    ckpt = tempfile.mkdtemp(prefix="rds_stream_ck_")
    try:
        queries.write.mode("overwrite").parquet(qdir)
        qstream = spark.readStream.schema(queries.schema).parquet(qdir)
        sq = st.ann_search_stream(
            qstream,
            lambda q: exact_knn(q, corpus, 5, "l2"),
            sink_path=sink,
            checkpoint_path=ckpt,
        )
        sq.awaitTermination(180)
        got = spark.read.parquet(sink).drop("batch_id")
        want = exact_knn(queries, corpus, 5, "l2")
        assert _rows(got) == _rows(want)
    finally:
        for d in (qdir, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def test_user_running_stats_stateful(spark, events_dir):
    """applyInPandasWithState custom stateful operator: the final per-user
    state after an availableNow run equals the batch aggregate."""
    stream_out = st.user_running_stats(_stream(spark, events_dir))
    q = (
        stream_out.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        # update mode may emit a row per micro-batch; the LAST emission per
        # user is the final state
        got = spark.sql(
            """select user_id, max(n_events) as n_events,
                      max(sum_value) as sum_value, max(max_ts_us) as max_ts_us
               from running_stats group by user_id"""
        )
        want = (
            st.with_event_time(_batch(spark, events_dir))
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
                F.max(F.unix_micros("event_ts")).alias("max_ts_us"),
            )
        )
        assert _rows(got) == _rows(want)
        assert got.count() > 0
    finally:
        q.stop()
