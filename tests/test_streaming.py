"""Streaming behavior tests beyond the oracle-matched catalog queries:
multi-trigger replay, JSON feedback parsing (the reference's app3 path),
trigger-metrics listener, foreachBatch snapshot sink."""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import functions as F

from modelorecomendacion_analisisspark_streaming_mas_spark.sources.generators import (
    write_feedback_jsonl,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.sources.streams import (
    file_stream,
    run_to_memory_sink,
    stage_events_for_replay,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.streaming.metrics import (
    TriggerMetricsListener,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.streaming.pipelines import (
    AGE_BINS,
    feedback_age_bins,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.streaming.sinks import (
    foreach_batch_json_snapshot,
)
from modelorecomendacion_analisisspark_streaming_mas_spark.functions.etl import when_chain


def _bin_of(age: int) -> str:
    for low, high, label in AGE_BINS:
        if (low is None or age >= low) and (high is None or age < high):
            return label
    raise AssertionError(age)


def test_feedback_stream_age_bins(spark):
    d = tempfile.mkdtemp(prefix="mras_fb_")
    events = write_feedback_jsonl(d, n=300, files=3, seed=7)
    stream = spark.readStream.format("text").load(d).withColumnRenamed("value", "value")
    binned = feedback_age_bins(stream, "value").groupBy("gender", "age_bin").count()
    _, out = run_to_memory_sink(binned, "complete")
    got = {(r["gender"], r["age_bin"]): r["count"] for r in out.collect()}

    expected: dict[tuple[str, str], int] = {}
    for e in events:
        k = (e["gender"], _bin_of(e["age"]))
        expected[k] = expected.get(k, 0) + 1
    assert got == expected


def test_trigger_metrics_listener(spark, sf_dir):
    listener = TriggerMetricsListener()
    spark.streams.addListener(listener)
    try:
        d = tempfile.mkdtemp(prefix="mras_replay_")
        schema = stage_events_for_replay(spark, sf_dir, d)
        # re-write as several files so availableNow yields multiple triggers
        multi = tempfile.mkdtemp(prefix="mras_multi_")
        spark.read.parquet(d).repartition(4).write.mode("overwrite").parquet(multi)
        stream = file_stream(spark, multi, schema, max_files_per_trigger=1)
        counts = stream.groupBy("event_type").count()
        _, out = run_to_memory_sink(counts, "complete")
        assert out.count() > 0
        # listener events arrive on the JVM callback thread -- wait briefly
        deadline = time.time() + 10
        while time.time() < deadline and len(listener.rows) < 2:
            time.sleep(0.2)
        s = listener.summary()
        assert s["triggers"] >= 2, listener.rows
        assert s["mean_ms"] > 0 and s["median_ms"] > 0
        csv_path = os.path.join(multi, "metrics.csv")
        listener.to_csv(csv_path)
        header = open(csv_path).readline().strip()
        assert header == "epoch_id,count,duration_ms,timestamp"  # reference CSV contract
    finally:
        spark.streams.removeListener(listener)


def test_foreach_batch_snapshot_sink(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="mras_replay_")
    schema = stage_events_for_replay(spark, sf_dir, d)
    stream = file_stream(spark, d, schema)
    snap_path = os.path.join(tempfile.mkdtemp(prefix="mras_snap_"), "snapshot.json")
    fb = foreach_batch_json_snapshot(snap_path, ["event_id"], "event_id", keep_last=50)
    q = (
        stream.select("event_id", "event_type")
        .writeStream.foreachBatch(fb)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snap = json.load(open(snap_path))
    assert len(snap["rows"]) == 50
    top_ids = [r["event_id"] for r in snap["rows"]]
    expected = [
        r["event_id"]
        for r in spark.read.parquet(d.rstrip("/"))  # noqa: PD011
        .orderBy(F.desc("event_id"))
        .limit(50)
        .collect()
    ]
    assert top_ids == expected


def test_kafka_source_builder_gated(spark):
    """S6/S7: the Kafka reader builds the documented plan when the
    connector jar is present; absent (this container), it must fail with
    the standard DATA_SOURCE_NOT_FOUND guidance, not something cryptic."""
    import pytest
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.streams import kafka_stream

    try:
        df = kafka_stream(spark, "localhost:9092", "feedback", "earliest")
        assert "value" in df.columns  # jar present: schema is the kafka one
    except Exception as ex:
        assert "kafka" in str(ex).lower()
        pytest.skip("kafka connector not available (expected in container)")
