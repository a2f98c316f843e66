"""Spark 4 Python Data Source API: the reference's raw `::`-delimited
MovieLens `.dat` format (Explorativa/Explorativa1_pyspark.ipynb:59) as a
FIRST-CLASS pluggable source -- `spark.read.format("dat")` -- instead of the
csv-reader workaround in readers.py::read_dat.

Why this exists (beyond parity): the csv reader cannot express true
multi-char delimiters pre-Spark-4 semantics portably, and a registered
Python data source demonstrates the engine's extension path for formats
Spark lacks natively (the same scaffold carries a proprietary log format
or a tokenizer-output shard format at 100 TB).

Scale design: one InputPartition per file (files are the reference's unit
of parallelism for .dat dumps); each partition streams line-by-line
(no whole-file materialization) and yields pyarrow RecordBatches in
bounded chunks -- Spark 4's arrow-batch DS read path -- so the
Python->JVM hop is one Arrow buffer per ~32k rows instead of a pickled
tuple per row (~5-10x on wide scans).
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _DatFilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _opt(options: dict, key: str, default=None):
    """Case-insensitive option lookup. Through the real DataFrame API Spark
    hands readers/writers a CaseInsensitiveDict whose keys arrive
    LOWERCASED (``.option("eventsPerBatch", n)`` surfaces as
    ``eventsperbatch``), while unit tests construct them with plain
    camelCase dicts -- accept both spellings so camelCase option names
    documented in docstrings work through ``.option(...)``."""
    if key in options:
        return options[key]
    lk = key.lower()
    for k, v in options.items():
        if k.lower() == lk:
            return v
    return default


def _permissive(cast):
    """PERMISSIVE-mode numeric conversion: a malformed field becomes null,
    matching what the csv-reader twin (readers.py::read_dat) does, instead
    of killing the task with an uncaught ValueError."""

    def convert(s: str):
        try:
            return cast(s)
        except ValueError:
            return None

    return convert


class DatDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema = schema
        self.sep = options.get("sep", "::")
        self.encoding = options.get("encoding", "ISO-8859-1")
        path = options.get("path")
        if not path:
            raise ValueError("dat source requires a path")
        self.files = sorted(glob.glob(os.path.join(path, "*")) if os.path.isdir(path) else [path])

    # rows per emitted Arrow RecordBatch: large enough to amortize the
    # Python->JVM transfer, small enough to bound per-task memory
    ARROW_CHUNK_ROWS = 32768

    def partitions(self):  # one task per file
        return [_DatFilePartition(p) for p in self.files]

    def read(self, partition: _DatFilePartition):
        import pyarrow as pa

        _ARROW_TYPES = {
            "short": pa.int16(),
            "integer": pa.int32(),
            "long": pa.int64(),
            "float": pa.float32(),
            "double": pa.float64(),
        }
        n = len(self.schema.fields)
        conv = []
        arrow_fields = []
        for f in self.schema.fields:
            t = f.dataType.typeName()
            if t in ("integer", "long", "short"):
                conv.append(_permissive(int))
            elif t in ("double", "float"):
                conv.append(_permissive(float))
            elif t == "string":
                conv.append(None)  # strings pass through
            else:
                # The Arrow fast path only implements the numeric/string
                # subset the ::-dat files actually carry.  Anything else
                # (boolean, date, timestamp, decimal, nested ...) would
                # silently be emitted as a pa.string() array that
                # MISMATCHES the declared Spark schema at runtime -- fail
                # loudly at plan time instead so the narrowed type support
                # is explicit.
                raise ValueError(
                    f"dat source: unsupported field type '{t}' for column "
                    f"'{f.name}' -- the Arrow reader supports "
                    f"short/integer/long/float/double/string only. Declare "
                    f"the column as string and cast after load."
                )
            arrow_fields.append(pa.field(f.name, _ARROW_TYPES.get(t, pa.string())))
        arrow_schema = pa.schema(arrow_fields)
        cols: list[list] = [[] for _ in range(n)]

        def flush():
            batch = pa.RecordBatch.from_arrays(
                [pa.array(c, type=arrow_fields[i].type) for i, c in enumerate(cols)],
                schema=arrow_schema,
            )
            for c in cols:
                c.clear()
            return batch

        with open(partition.path, encoding=self.encoding) as fh:
            for line in fh:
                # CRLF files must not leave \r glued to the last column
                line = line.rstrip("\r\n")
                if not line:
                    continue
                parts = line.split(self.sep, n - 1)
                for i in range(n):
                    v = parts[i] if i < len(parts) and parts[i] != "" else None
                    if v is not None and conv[i] is not None:
                        v = conv[i](v)
                    cols[i].append(v)
                if len(cols[0]) >= self.ARROW_CHUNK_ROWS:
                    yield flush()
        if cols[0]:
            yield flush()


class DatDataSource(DataSource):
    """Usage::

        spark.dataSource.register(DatDataSource)
        spark.read.format("dat").schema("userId int, gender string, ...")
             .option("sep", "::").load(path)
    """

    @classmethod
    def name(cls) -> str:
        return "dat"

    def reader(self, schema: StructType) -> DatDataSourceReader:
        return DatDataSourceReader(schema, dict(self.options))


def register_dat_source(spark) -> None:
    spark.dataSource.register(DatDataSource)


# ---------------------------------------------------------------------------
# Streaming variant: the reference's Kafka load bots (bots/bot_random.py:
# 23-28, rates at bots/bot_*.py) as a FIRST-CLASS streaming source instead
# of external producer processes. Offsets are the event index, and every
# event is regenerated deterministically FROM its index -- so recovery /
# readBetweenOffsets replays byte-identical data, giving the source the
# exactly-once replay contract Kafka gives via (partition, offset).
# ---------------------------------------------------------------------------

import json
import random

from pyspark.sql.datasource import SimpleDataSourceStreamReader

from .generators import GENDERS, OCCUPATIONS


class FeedbackBotStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.batch = int(_opt(options, "eventsPerBatch", 100))
        self.seed = int(_opt(options, "seed", 42))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def _event(self, i: int) -> tuple:
        rng = random.Random((self.seed << 32) ^ i)
        payload = {
            "gender": rng.choice(GENDERS),
            "occupation": rng.choice(OCCUPATIONS),
            "age": rng.randint(18, 70),
            "ratings": [
                {"filmId": rng.randint(1, 5), "rating": rng.randint(1, 5)}
                for _ in range(5)
            ],
        }
        return (i, json.dumps(payload, sort_keys=True))

    def read(self, start: dict):
        s = start["index"]
        e = s + self.batch
        return iter([self._event(i) for i in range(s, e)]), {"index": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([self._event(i) for i in range(start["index"], end["index"])])


class FeedbackBotDataSource(DataSource):
    """`spark.readStream.format("feedback_bot").option("eventsPerBatch", n)`
    -> `(offset bigint, value string)` rows, value being the exact feedback
    JSON contract of the reference's topic (app3/live_counts.py:29-39)."""

    @classmethod
    def name(cls) -> str:
        return "feedback_bot"

    def schema(self) -> str:
        return "offset bigint, value string"

    def simpleStreamReader(self, schema) -> FeedbackBotStreamReader:
        return FeedbackBotStreamReader(dict(self.options))


def register_feedback_bot_source(spark) -> None:
    spark.dataSource.register(FeedbackBotDataSource)


# ---------------------------------------------------------------------------
# Python Data Source STREAM WRITER (Spark 4): a JSONL-directory sink with
# manifest-committed exactly-once semantics -- the write-side twin of the
# readers above, completing the Python DS API surface (read batch, read
# stream, write stream). Executors write micro-batch partitions to temp
# files and return them as commit messages; the driver's commit() renames
# them to deterministic batch-{id}-{i}.jsonl names and records a per-batch
# manifest. A replayed batch (restart mid-commit) overwrites the SAME
# names and manifest, so readers that trust only manifested files never
# see duplicates -- the _spark_metadata idea of the built-in file sink,
# re-implemented in ~60 lines of Python. At cluster scale `path` must be
# shared storage, exactly like any file sink.
# ---------------------------------------------------------------------------

import glob as _glob
import os as _os
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceStreamWriter, WriterCommitMessage


@dataclass
class _JsonlFileMessage(WriterCommitMessage):
    tmp_path: str
    n_rows: int


class JsonlDirStreamWriter(DataSourceStreamWriter):
    # Foreign-token tmp files older than this are treated as orphans of a
    # crashed/restarted query (which gets a fresh token) and swept at
    # commit time, bounding _tmp/ across restarts.  ASSUMPTION: no live
    # concurrent query sharing this output path keeps a single micro-batch
    # in flight longer than this age -- if one does, its in-flight _tmp
    # file can be unlinked here, that task's commit-time rename fails, and
    # the batch retries (safe but wasteful).  Queries with hour-plus
    # micro-batches must raise the threshold via
    # ``.option("foreignTmpMaxAgeS", seconds)``.
    FOREIGN_TMP_MAX_AGE_S = 3600.0

    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.foreign_tmp_max_age_s = float(
            _opt(options, "foreignTmpMaxAgeS") or self.FOREIGN_TMP_MAX_AGE_S
        )
        # Per-query namespace token: the writer instance is created once per
        # streaming query and shipped to executors, so every tmp file this
        # query writes carries the token.  The commit-time orphan sweep
        # matches ONLY this prefix -- two queries sharing an output path can
        # no longer delete each other's not-yet-renamed tmp files.
        self.query_token = _opt(options, "queryToken") or _uuid.uuid4().hex[:12]

    def write(self, iterator) -> _JsonlFileMessage:
        tmp_dir = _os.path.join(self.path, "_tmp")
        _os.makedirs(tmp_dir, exist_ok=True)
        tmp = _os.path.join(tmp_dir, f"{self.query_token}-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True, default=str) + "\n")
                n += 1
        return _JsonlFileMessage(tmp_path=tmp, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        # Deterministic final names + manifest overwrite = idempotent replay.
        for stale in _glob.glob(_os.path.join(self.path, f"batch-{batchId}-*.jsonl")):
            _os.remove(stale)
        files = []
        for i, m in enumerate(m for m in messages if m is not None):
            final = _os.path.join(self.path, f"batch-{batchId}-{i}.jsonl")
            _os.replace(m.tmp_path, final)
            files.append({"file": _os.path.basename(final), "rows": m.n_rows})
        commits = _os.path.join(self.path, "_commits")
        _os.makedirs(commits, exist_ok=True)
        manifest_tmp = _os.path.join(commits, f".{batchId}.json.tmp")
        with open(manifest_tmp, "w") as f:
            json.dump({"batchId": batchId, "files": files}, f)
        _os.replace(manifest_tmp, _os.path.join(commits, f"{batchId}.json"))
        # Any file with THIS query's token still under _tmp/ after the batch
        # committed is by construction uncommitted garbage (a retried/
        # speculative task's orphan that never made it into a commit
        # message) -- sweep only our own prefix so a second query writing to
        # the same path keeps its in-flight tmp files.  Foreign-token files
        # are swept only once they are OLD: a crashed/restarted query gets a
        # fresh token, so without an age-based sweep its orphans would
        # accumulate in _tmp/ forever; a generous threshold keeps the
        # cross-query race fix (a live concurrent query's in-flight tmp
        # files are seconds old, never hours).
        import time as _time

        now = _time.time()
        for orphan in _glob.glob(_os.path.join(self.path, "_tmp", "*.jsonl")):
            ours = _os.path.basename(orphan).startswith(f"{self.query_token}-")
            try:
                stale = now - _os.path.getmtime(orphan) > self.foreign_tmp_max_age_s
            except OSError:
                continue  # already renamed/removed by its owner
            if not (ours or stale):
                continue
            try:
                _os.remove(orphan)
            except OSError:
                pass  # concurrent cleanup or in-flight rename; harmless

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.tmp_path):
                _os.remove(m.tmp_path)


class JsonlDirSinkDataSource(DataSource):
    """`df.writeStream.format("jsonl_dir").option("path", d)`: manifest-
    committed JSONL directory sink via the Python Data Source API."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def streamWriter(self, schema, overwrite: bool) -> JsonlDirStreamWriter:
        return JsonlDirStreamWriter(dict(self.options))


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDirSinkDataSource)


def read_jsonl_sink(spark, path: str, schema: str | None = None):
    """Read back ONLY manifest-committed files (uncommitted temp or
    orphaned batch files are invisible, preserving exactly-once).
    Pass ``schema`` (DDL) when the stream may legitimately commit ZERO
    rows -- inference over empty JSONL yields a column-less frame (r12
    empty-tables hostile variant)."""
    committed: list[str] = []
    for mf in sorted(_glob.glob(_os.path.join(path, "_commits", "*.json"))):
        with open(mf) as f:
            committed += [
                _os.path.join(path, e["file"]) for e in json.load(f)["files"]
            ]
    if not committed:
        raise ValueError(f"no committed batches under {path}")
    reader = spark.read.schema(schema) if schema else spark.read
    return reader.json(committed)
