"""Structured Streaming pipelines (SURVEY.md section 2.9, T1-T7, plus the
watermark/event-time-window surface the reference lacks).

The reference's big anti-pattern (SURVEY 3.2): it appends raw rows to a
memory sink and re-aggregates in driver-side pandas per HTTP poll
(app3/live_counts.py:72-80). Every aggregate here is instead maintained
incrementally by Spark streaming state -- the serving layer only reads a
tiny result table.

State-at-scale notes on each operator:
* update-mode groupBy counts: state is one row per group key (bounded by
  key cardinality, not stream length).
* tumbling/sliding windows + watermark: state per (window, key), evicted
  once the watermark passes window end -- bounded by (window span x keys).
* session windows: state per open session, merged on overlap.
* dropDuplicates within watermark: state per key inside the watermark
  horizon only (the 100 TB answer to unbounded dedup state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import cents_sum_spark

from ..functions.etl import when_chain

# Event-time validity window for every WATERMARKED operator (r14 timex
# find): the global watermark is max(event time) - delay, so ONE corrupt
# far-future timestamp (a 2262 event in a 2024 stream) silently declares
# the entire sane corpus late -- windows stop closing, dedup drops first
# occurrences, joins drop matches. Standard production discipline is an
# ingest validity window that quarantines rows whose event time cannot be
# real. The LOWER bound is forced by the engine itself: Structured
# Streaming's global watermark STARTS at epoch 0, so any row with event
# time at/near 1970-01-01 is born late and silently dropped by every
# watermarked operator regardless of arrival order (r14 timex: the
# epoch-0 and pre-epoch slices vanished from the engine only -- a 106-row
# deficit exactly matching those slices). 1970-01-02 clears the floor
# plus any delay the catalog uses (<= 24 h). The upper bound 2200
# excludes the far-future poison. Both are no-ops on sane data. Applied
# INSIDE each watermark-bearing pipeline function so every caller is
# protected, and mirrored verbatim in those entries' oracles
# (EVENT_TIME_BOUND_SQL). Operators WITHOUT watermarks intentionally keep
# extreme timestamps -- they are representable and aggregate fine.
EVENT_TIME_VALID_LO = "1970-01-02"
EVENT_TIME_VALID_HI = "2200-01-01"
EVENT_TIME_BOUND_SQL = (
    f"ts >= TIMESTAMP '{EVENT_TIME_VALID_LO}'"
    f" AND ts < TIMESTAMP '{EVENT_TIME_VALID_HI}'"
)


def bounded_event_time(stream: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Quarantine rows outside the event-time validity window. MUST wrap
    every stream that feeds ``withWatermark`` (see module constant note);
    a production deployment would route the rejects to a quarantine sink
    instead of dropping them."""
    return stream.filter(
        (F.col(ts_col) >= F.lit(EVENT_TIME_VALID_LO).cast("timestamp"))
        & (F.col(ts_col) < F.lit(EVENT_TIME_VALID_HI).cast("timestamp"))
    )


# Reference age bins, app3/live_counts.py:52-61.
AGE_BINS = [
    (None, 18, "<18"),
    (18, 25, "18-24"),
    (25, 35, "25-34"),
    (35, 45, "35-44"),
    (45, 50, "45-49"),
    (50, 56, "50-55"),
    (56, None, "56+"),
]


def feedback_age_bins(stream: DataFrame, json_col: str = "value") -> DataFrame:
    """T1+T2: parse the feedback JSON payload (schema per
    app3/live_counts.py:29-39) and derive the age bin."""
    schema = (
        "gender string, occupation string, age int, "
        "ratings array<struct<filmId: int, rating: int>>"
    )
    parsed = stream.select(
        F.from_json(F.col(json_col).cast("string"), schema).alias("j")
    ).select("j.*")
    return parsed.withColumn("age_bin", when_chain(F.col("age"), AGE_BINS))


def demo_latest_topk(stream: DataFrame, ts_col: str = "ts", k: int = 200) -> DataFrame:
    """T3: latest-k snapshot (app/spark_stream.py:31-36). Sort+limit is only
    legal in complete mode with the memory sink; state is the full input, so
    this stays a bounded-serving surface, never a scale path."""
    return stream.orderBy(F.desc(ts_col), F.desc("event_id")).limit(k)


def streaming_group_counts(stream: DataFrame, *keys: str) -> DataFrame:
    """A8/T7 done right: incrementally-maintained group counts (update or
    complete mode) instead of the reference's per-request pandas
    value_counts (app3/live_counts.py:72-80)."""
    return stream.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        cents_sum_spark("value").alias("sum_value"),
    )


def tumbling_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling window counts with watermark (the section 2.9
    "not present" surface)."""
    return (
        bounded_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), cents_sum_spark("value").alias("sum_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows: each event lands in width/slide windows."""
    return (
        bounded_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, width, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
        )
    )


def sessionized_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user (gap-based), the canonical stateful
    sessionization the reference's driver-side counting can't express."""
    return (
        bounded_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def dynamic_sessionized_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    click_gap: str = "5 minutes",
    default_gap: str = "15 minutes",
    key_col: str = "user_id",
    type_col: str = "event_type",
    fast_type: str = "click",
) -> DataFrame:
    """Session windows with a DYNAMIC gap: the gap duration is an
    expression over the event (``fast_type`` rows close fast, everything
    else lingers) -- Spark merges overlapping [ts, ts+gap) intervals into
    one session. The fixed-gap form (sessionized_counts) can't express
    per-event engagement semantics; state behavior is identical (one open-
    session row per key, watermark-evicted). Every referenced column is a
    parameter, so any keyed/typed stream fits -- not just the events
    schema."""
    gap = F.when(F.col(type_col) == fast_type, F.lit(click_gap)).otherwise(
        F.lit(default_gap)
    )
    return (
        bounded_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def stream_stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join (the section 2.9 'not present' surface):
    purchases joined to same-user clicks within ``within``. Both sides
    watermarked so join state evicts once the constraint window passes --
    the bounded-state contract stream-stream joins require at scale."""
    c = (
        bounded_event_time(clicks).withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    p = (
        bounded_event_time(purchases).withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond).select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id")
    )


def stream_stream_left_outer_join(
    clicks: DataFrame,
    purchases: DataFrame,
    within: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every click emits exactly
    once -- joined to each same-user purchase within ``within``, or with
    null purchase columns if none arrives. Distinct state machine from the
    inner join (stream_stream_click_purchase_join): matches stream out
    eagerly, but an UNMATCHED click can only be declared unmatched once
    the global watermark passes ``c_ts + within`` (no later purchase can
    ever join it), at which point the null-extended row emits and the
    click's state row is evicted. Bounded state either way.

    Callers replaying a FINITE stream must append a sentinel event past
    ``max(ts) + watermark + within`` so the final watermark closes every
    real click's interval -- otherwise trailing unmatched clicks stay in
    state forever (on an unbounded production stream the next real event
    plays that role)."""
    c = (
        bounded_event_time(clicks).withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
            # carried through so callers can drop sentinel-origin rows by
            # the UNAMBIGUOUS type marker instead of an id-domain
            # assumption (the r13 extremes variant put -2^63 into
            # user_id: a `user_id >= 0` sentinel filter silently dropped
            # real clicks)
            F.col("event_type").alias("c_type"),
        )
    )
    p = (
        bounded_event_time(purchases).withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {within}"))
    )
    return c.join(p, cond, "leftOuter").select(
        "click_id", "purchase_id", F.col("c_user").alias("user_id"), "c_type"
    )


def stream_dedup_within_watermark(
    stream: DataFrame, id_col: str = "event_id", watermark: str = "4 hours"
) -> DataFrame:
    """Bounded-state streaming dedup: state only spans the watermark horizon
    (the 100 TB answer to unbounded dropDuplicates state)."""
    return (
        bounded_event_time(stream)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark([id_col])
    )


def stream_dedup_counts(stream: DataFrame, id_col: str = "event_id") -> DataFrame:
    """O9/A7 on a stream: exact dedup by event id, then per-type counts.
    (dropDuplicatesWithinWatermark is the bounded-state variant; plain
    dropDuplicates here because the replay harness is finite.)"""
    return (
        stream.dropDuplicates([id_col])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
