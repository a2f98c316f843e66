"""Broker-optional Kafka integration test (S6/S7 byte-flow).

This container has neither the spark-sql-kafka connector jar nor a broker,
so by default everything here SKIPS (see COVERAGE.md S6 and KAFKA.md). On a
capable host the gate self-lifts: set

    export KAFKA_BOOTSTRAP=broker1:9092[,broker2:9092]

and run ``pytest tests/test_kafka_integration.py``. The test builds its own
SparkSession with ``spark.jars.packages`` pointing at the public connector
coordinates (resolved via ivy from Maven Central on first run), batch-writes
a handful of messages to a unique throwaway topic, then replays them with
``kafka_stream(..., starting_offsets="earliest")`` -- the exact S6+S7 path
of the reference (app/spark_stream.py:20-24,
apps_mediciones/live_counts_update_earliest.py:45-51) -- and asserts the
payloads round-trip byte-identically.

The topic name is unique per run so auto-topic-creation brokers need no
setup; brokers with auto-create disabled need ``kafka-topics --create``
first (see KAFKA.md).
"""

from __future__ import annotations

import os
import uuid

import pytest

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "")

# Public Maven coordinates for the Spark 4 / Scala 2.13 connector. Spark's
# minor version must match the installed pyspark -- derive it.
def _connector_coordinates() -> str:
    import pyspark

    return f"org.apache.spark:spark-sql-kafka-0-10_2.13:{pyspark.__version__}"


pytestmark = pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set (no broker in this environment; "
    "see KAFKA.md for the real-cluster runbook)",
)


@pytest.fixture(scope="module")
def kafka_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.jars.packages", _connector_coordinates())
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


def test_kafka_roundtrip_earliest(kafka_spark, tmp_path):
    """Write 5 messages, replay from earliest, assert byte-identical."""
    from pyspark.sql import functions as F

    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.streams import (
        kafka_stream,
    )

    topic = f"spark_graft_it_{uuid.uuid4().hex[:12]}"
    payloads = [f"msg-{i}|feedback" for i in range(5)]

    # Batch write (same connector, write path) -- proves bytes OUT.
    (
        kafka_spark.createDataFrame([(p,) for p in payloads], "value string")
        .select(F.col("value").cast("binary"))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    # Streaming read from EARLIEST (S7) through the S6 helper -- bytes IN.
    stream = kafka_stream(kafka_spark, KAFKA_BOOTSTRAP, topic, "earliest")
    q = (
        stream.select(F.col("value").cast("string").alias("value"))
        .writeStream.format("memory")
        .queryName("kafka_roundtrip")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(r.value for r in kafka_spark.sql("SELECT value FROM kafka_roundtrip").collect())
    assert got == sorted(payloads)


def test_kafka_wire_schema_matches_pinned_contract(kafka_spark):
    """The live connector's schema must equal the broker-free pinned one
    (KAFKA_WIRE_SCHEMA) that the rest of the suite contract-tests against."""
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.streams import (
        KAFKA_WIRE_SCHEMA,
        kafka_stream,
    )

    df = kafka_stream(kafka_spark, KAFKA_BOOTSTRAP, "spark_graft_schema_probe", "earliest")
    expected = kafka_spark.createDataFrame([], KAFKA_WIRE_SCHEMA).schema
    assert df.schema == expected
