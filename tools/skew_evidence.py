"""Task-time skew evidence (r13 VERDICT tasks 2b/7): run the skew-variant
data through UNSALTED vs SALTED shapes with the Spark event log on, parse
per-task durations per phase, and report the straggler spread
(max task / median task) for the dominant stage of each phase.

The catalog's q22/q23 oracles only prove salting is RESULT-invisible;
this tool proves (or refutes) the scale claim -- that the salted plans
actually flatten task times under a 99%-hot key -- and measures the
s30-style chunk-hash shuffle under a hot chunk class.

    python tools/hostile_variants.py --variant skew --sf-dir /root/testdata/sf0.1 --out-dir /tmp/skew01
    python tools/skew_evidence.py --sf-dir /tmp/skew01 --out SKEW_EVIDENCE.json

Phases (each tagged with sc.setJobGroup, attributed via event-log
JobStart -> stage ids -> TaskEnd durations):

  group_unsalted   plain groupBy(l_returnflag).count/sum -- expected FLAT
                   even under skew: hash-agg partial aggregation collapses
                   the hot key map-side before the shuffle. Recorded to
                   document WHY salting is not needed for count/sum aggs.
  group_salted     q22's two-phase salted agg on the same data.
  join_sortmerge   lineitem join part on the 99%-hot l_partkey with
                   broadcast DISABLED -- the shape a >threshold dim forces
                   at 100 TB; AQE skew-join split is also disabled so the
                   raw straggler is visible. Expected spread >> 10x.
  join_sortmerge_aqe  same join with AQE skew-join ON (the runtime
                   mitigation the session default enables).
  join_salted      q23's salted_broadcast_explode_join -- expected flat.
  window_hot       q16-shape per-partition rank over the hot key --
                   the known skew-vulnerable surface (diagnostic).
  chunk_join_shuffled  s30's dup join (chunk index join batch chunks on
                   chash) FORCED down the non-broadcast fallback path on
                   the hot-chunk-class documents.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def parse_event_log(log_dir: str) -> dict[str, dict]:
    """event log -> per-jobGroup stage task stats. Returns
    {group: {stage_id: {"n": int, "max_ms": int, "p50_ms": float,
                        "sum_ms": int, "spread": float}}}."""
    stage_group: dict[int, str] = {}
    stage_tasks: dict[int, list[int]] = {}
    # Spark 4 defaults to rolling event logs: a DIRECTORY per app
    # (eventlog_v2_<appId>/events_1_...), so walk recursively.
    paths = [
        os.path.join(root, name)
        for root, _dirs, files in os.walk(log_dir)
        for name in files
        if not name.startswith("appstatus_")
    ]
    for path in paths:
        with open(path, encoding="utf-8", errors="replace") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    for si in ev.get("Stage Infos", []):
                        stage_group[si["Stage ID"]] = grp or "ungrouped"
                elif kind == "SparkListenerTaskEnd":
                    ti = ev.get("Task Info") or {}
                    dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                    if dur >= 0:
                        stage_tasks.setdefault(ev.get("Stage ID"), []).append(dur)
    out: dict[str, dict] = {}
    for sid, durs in stage_tasks.items():
        grp = stage_group.get(sid, "ungrouped")
        med = statistics.median(durs)
        out.setdefault(grp, {})[sid] = {
            "n_tasks": len(durs),
            "max_ms": max(durs),
            "p50_ms": round(med, 1),
            "sum_ms": sum(durs),
            "spread": round(max(durs) / med, 2) if med > 0 else float(max(durs)),
        }
    return out


def dominant(stages: dict[int, dict]) -> dict:
    """The stage carrying the most total task time -- the one a straggler
    would stretch."""
    if not stages:
        return {}
    sid = max(stages, key=lambda s: stages[s]["sum_ms"])
    return {"stage_id": sid, **stages[sid]}


def skew_reading(stages: dict[int, dict]) -> dict:
    """The max-spread stage among multi-task stages: where a hot key
    shows up as one straggler task vs a flat median."""
    multi = {s: v for s, v in stages.items() if v["n_tasks"] >= 4}
    if not multi:
        return {}
    sid = max(multi, key=lambda s: multi[s]["spread"])
    return {"stage_id": sid, **multi[sid]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="skew-variant data dir")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    evdir = tempfile.mkdtemp(prefix="mras_skew_evlog_")
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evdir}")
        # plain single-file JSONL: Spark 4 defaults to rolling zstd logs,
        # which the offline parser below would have to decompress
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        # diagnostic session: AQE's small-partition coalescing folds the
        # 32 reduce tasks into a handful at test scale, hiding exactly
        # the per-task spread this tool exists to measure. Production
        # keeps coalescing ON (it is part of the mitigation story); the
        # aqe phase below still exercises the skew-join splitter.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    from modelorecomendacion_analisisspark_streaming_mas_spark.operators.skew import (
        salted_broadcast_explode_join,
        salted_group_count,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.plans.batch8 import (
        cdc_chunk_frame,
    )
    from modelorecomendacion_analisisspark_streaming_mas_spark.sources.readers import (
        load_table,
    )

    li = load_table(spark, args.sf_dir, "lineitem").withColumn(
        "_qty_c", F.round(F.col("l_quantity") * 100).cast("long")
    )
    part = load_table(spark, args.sf_dir, "part")
    docs = load_table(spark, args.sf_dir, "documents")
    walls: dict[str, float] = {}

    def phase(name: str, fn) -> None:
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        fn()
        walls[name] = round(time.perf_counter() - t0, 2)
        sc.setJobGroup("idle", "idle")
        print(f"  {name}: {walls[name]}s", flush=True)

    phase(
        "group_unsalted",
        lambda: li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_qty_c").alias("s"))
        .collect(),
    )
    phase(
        "group_salted",
        lambda: salted_group_count(
            li, "l_returnflag", salt_from=["l_orderkey", "l_linenumber"],
            sum_col="_qty_c",
        ).collect(),
    )

    def sortmerge(aqe_skew: bool) -> None:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", "true" if aqe_skew else "false"
        )
        try:
            (
                li.join(part, li.l_partkey == part.p_partkey)
                .groupBy("p_brand")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    phase("join_sortmerge", lambda: sortmerge(aqe_skew=False))
    phase("join_sortmerge_aqe", lambda: sortmerge(aqe_skew=True))
    phase(
        "join_salted",
        lambda: salted_broadcast_explode_join(
            li.select(F.col("l_partkey").alias("k"), "l_orderkey", "l_linenumber"),
            part.select(F.col("p_partkey").alias("k"), "p_brand"),
            key="k",
            salt_from=["l_orderkey", "l_linenumber"],
            n_salts=8,
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect(),
    )

    w = Window.partitionBy("l_partkey").orderBy(F.desc("l_extendedprice"))
    phase(
        "window_hot",
        lambda: li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .count(),
    )

    def chunk_join() -> None:
        idx = (
            cdc_chunk_frame(docs.filter(F.col("doc_id") % 2 == 0))
            .select("chash")
            .distinct()
            .localCheckpoint(eager=True)
        )
        ch = cdc_chunk_frame(docs.filter(F.col("doc_id") % 2 == 1)).localCheckpoint(
            eager=True
        )
        # the s30 fallback shape: batch side NOT broadcast -> both sides
        # shuffle on chash; the hot chunk class lands on one reducer
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            (
                idx.join(ch.select("doc_id", "chash", "clen"), "chash")
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("n_dup"), F.sum("clen").alias("t"))
                .collect()
            )
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    phase("chunk_join_shuffled", chunk_join)

    spark.stop()
    time.sleep(1.0)
    groups = parse_event_log(evdir)
    report = {
        "sf_dir": args.sf_dir,
        "walls_sec": walls,
        "dominant_stage": {g: dominant(s) for g, s in groups.items() if g != "idle"},
        "max_spread_stage": {
            g: skew_reading(s) for g, s in groups.items() if g != "idle"
        },
    }
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
