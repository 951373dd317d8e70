"""JSON-lines DataSource (batch + streaming) — the Spark-native stand-in
for the reference's Unix-socket ingest (O1).

Reference behavior (/root/reference/evtstrd/socket_server.py:82-92 +
util.py:11-21): newline-delimited JSON, one message per line, invalid
lines skipped with a warning, EOF ends the stream.

Transport mapping: producers append lines to immutable spool files in a
directory (sources/socket_spool.py provides the actual Unix-socket
front-end that does this); Spark tails the directory.  This is the
standard durable-ingest pattern — the socket itself can't be a Spark
source because a socket read is not replayable, and Structured
Streaming's exactly-once story depends on replayable offsets.  Files
give us offsets (file index) for free, which is *stronger* delivery
than the reference's at-most-once.

Two readers:
- ``reader`` (batch): one InputPartition per file -> executors read
  files in parallel; scales with file count.
- ``simpleStreamReader``: offset = number of fully-processed files (a
  file is immutable once it appears; the spool writer guarantees this
  by staging + rename).  The simple API reads on the driver — fine for
  the daemon-replacement use case (a socket's throughput), while the
  partition-parallel batch reader covers bulk replay.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StringType, StructField, StructType

SCHEMA = StructType([StructField("value", StringType(), True)])


def _list_spool_files(path: str) -> list[str]:
    try:
        names = [
            n
            for n in os.listdir(path)
            if n.endswith(".jsonl") and not n.startswith(".")
        ]
    except FileNotFoundError:
        return []
    return sorted(names)


def _read_lines(path: str) -> Iterator[tuple[str]]:
    with open(path, "rb") as f:
        for raw in f:
            line = raw.decode("utf-8", errors="replace").rstrip("\n")
            if line:
                yield (line,)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonLinesBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlines source requires a 'path' option")

    def partitions(self):
        return [
            _FilePartition(os.path.join(self.path, n))
            for n in _list_spool_files(self.path)
        ] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        return _read_lines(partition.path)


class JsonLinesStreamReader(SimpleDataSourceStreamReader):
    """Offset = {"n": <number of fully consumed files>}.

    ``maxFilesPerBatch`` (option, default unlimited) caps how many new
    spool files one micro-batch admits — real backpressure, the
    ``maxOffsetsPerTrigger`` idiom.  The reference has none: a slow
    consumer buffers unboundedly in daemon memory
    (/root/reference/evtstrd/http.py:114-118, writes never drain()'d).
    Bounded admission keeps micro-batch memory flat no matter how far
    the spool runs ahead; unconsumed files simply wait, durable on
    disk, for the next trigger.
    """

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlines source requires a 'path' option")
        # option keys may arrive lower-cased (CaseInsensitiveStringMap)
        self.max_files = int(
            options.get("maxFilesPerBatch")
            or options.get("maxfilesperbatch")
            or 0
        )

    def initialOffset(self):
        return {"n": 0}

    def read(self, start: dict):
        files = _list_spool_files(self.path)
        n0 = start.get("n", 0)
        new = files[n0:]
        if self.max_files > 0:
            new = new[: self.max_files]
        end = {"n": n0 + len(new)}
        # materialized up-front (the file set must be frozen at offset
        # time), returned as an iterator — the simple-reader runner
        # drains it with next() while caching rows for offset replay
        rows = [
            row
            for name in new
            for row in _read_lines(os.path.join(self.path, name))
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        files = _list_spool_files(self.path)
        for name in files[start.get("n", 0) : end.get("n", 0)]:
            yield from _read_lines(os.path.join(self.path, name))


class JsonLinesDataSource(DataSource):
    """spark.read/readStream.format("jsonlines").option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return "jsonlines"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return JsonLinesBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return JsonLinesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonLinesDataSource)


def read_spool(spark, spool_dir: str):
    """Bulk/batch spool read via the native text scan (column ``value``).

    ``spark.read.text`` is the JVM path — splittable files, no Python in
    the row loop — so bulk replay of a spool runs ~an order of magnitude
    faster than the Python ``DataSourceReader`` above.  The custom
    DataSource stays for the *streaming* reader (offset tracking) and as
    the pyspark-4 DataSource API demonstration; Hadoop's default path
    filter already hides the ``.``-prefixed staging files, matching
    ``_list_spool_files``.
    """
    return spark.read.text(os.path.join(spool_dir, "*.jsonl"))


def write_spool_file(spool_dir: str, messages: list[dict | str], seq: int) -> str:
    """Producer-side helper: atomically publish one spool file (stage +
    rename so the stream reader never sees a partial file)."""
    os.makedirs(spool_dir, exist_ok=True)
    name = f"{seq:012d}.jsonl"
    staged = os.path.join(spool_dir, f".{name}.tmp")
    final = os.path.join(spool_dir, name)
    with open(staged, "w", encoding="utf-8") as f:
        for m in messages:
            f.write(m if isinstance(m, str) else json.dumps(m))
            f.write("\n")
    os.replace(staged, final)
    return final
