"""foreachBatch sinks (T6/S9).

The reference's foreachBatch callbacks snapshot JSON for a web page
(app/spark_stream_web.py:37-57) and append metrics CSVs
(apps_mediciones/live_counts_metrics.py:72-83). Here: a dedup-compacting
JSON snapshot sink with the same observable behavior, built on DataFrame
ops instead of pandas on the driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def foreach_batch_json_snapshot(
    path: str,
    dedup_cols: list[str],
    order_col: str,
    keep_last: int = 200,
):
    """Returns a foreachBatch(fn) callback: per micro-batch, dedup on
    ``dedup_cols``, keep the ``keep_last`` latest by ``order_col``, write an
    atomic JSON snapshot (the app/spark_stream_web.py:48-51 contract --
    pandas drop_duplicates + tail, re-expressed as DataFrame ops)."""
    state: dict[str, list[dict]] = {"rows": []}

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        new = (
            df.dropDuplicates(dedup_cols)
            .orderBy(F.desc(order_col))
            .limit(keep_last)
            .toJSON()
            .collect()
        )
        merged = {tuple(json.loads(r)[c] for c in dedup_cols): json.loads(r) for r in new}
        for r in state["rows"]:
            merged.setdefault(tuple(r[c] for c in dedup_cols), r)
        rows = sorted(merged.values(), key=lambda r: r[order_col], reverse=True)[:keep_last]
        state["rows"] = rows
        tmp = f"{path}.tmp.{epoch_id}"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch_id, "rows": rows}, f)
        os.replace(tmp, path)

    return write_batch


def foreach_batch_incremental_rollup(
    table_dir: str, partition_col: str, key_cols: list[str]
):
    """Incremental materialized-view maintenance: each micro-batch of an
    UPDATE-mode streaming aggregation carries the CURRENT totals for the
    keys that changed; this sink merges them into a partitioned parquet
    table, rewriting only the partitions those keys live in (dynamic
    partition overwrite -- untouched partitions are never rewritten, the
    property that makes the pattern viable on a 100 TB rollup: a trigger
    that updates one hour touches one partition, not the table).

    Merge is latest-wins per key: surviving rows of touched partitions
    are the batch rows plus existing rows whose key is absent from the
    batch (left_anti). localCheckpoint breaks lineage before the write
    so Spark permits overwriting the path the merge just read."""

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        rows_new = df.localCheckpoint(eager=True)
        if rows_new.isEmpty():
            return
        spark = df.sparkSession
        parts = [r[0] for r in rows_new.select(partition_col).distinct().collect()]
        # Existence check, NOT try/except around the read: a read failure
        # on an existing table (corrupt file, transient FS error) must
        # propagate and fail the batch -- swallowing it would silently
        # overwrite the touched partitions with batch-only rows. Local-FS
        # check; on a real cluster resolve through the Hadoop FileSystem.
        first_batch = not any(
            name.endswith(".parquet") or name.startswith(f"{partition_col}=")
            for name in (os.listdir(table_dir) if os.path.isdir(table_dir) else [])
        )
        if first_batch:
            merged = rows_new
        else:
            existing = spark.read.parquet(table_dir).filter(
                F.col(partition_col).isin(parts)
            )
            # NULL-SAFE anti-join on the merge keys: with a plain equi
            # left_anti, an existing row whose key contains NULL (e.g. a
            # NULL event_type group) never matches the batch's updated row
            # for the same key, so the stale total SURVIVES next to the
            # new one and the view accretes one duplicate per trigger
            # (r14 nullkeys find). eqNullSafe makes latest-wins hold for
            # NULL keys too.
            new_keys = rows_new.select(*key_cols)
            cond = None
            for k in key_cols:
                c = existing[k].eqNullSafe(new_keys[k])
                cond = c if cond is None else cond & c
            keep = existing.join(new_keys, cond, "left_anti")
            merged = keep.unionByName(rows_new).localCheckpoint(eager=True)
        (
            merged.repartition(F.col(partition_col))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(table_dir)
        )

    return write_batch
