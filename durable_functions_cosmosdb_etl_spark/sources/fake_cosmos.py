"""In-process fake of the Cosmos Spark connector formats.

The reference's storage layer is Cosmos containers accessed through the
public `azure-cosmos-spark` connector (`cosmos.oltp` for batch,
`cosmos.oltp.changeFeed` for incremental reads — the option seam
mirrored from /root/reference/EtlProcess.cs:183-189). This sandbox has
no Cosmos account and no JVM connector jar, so this module registers
**Python DataSources under the connector's own format names** (Spark 4
`pyspark.sql.datasource`): once registered, `Container.cosmos(...)`
.read()/.write()/.read_stream() run their UNMODIFIED production code
paths — `spark.read.format("cosmos.oltp").options(...).load()` — end to
end against a local document store.

Fake semantics (documented, deliberately simple):

- `spark.cosmos.accountEndpoint` starting with ``file://`` maps the
  account to a local directory; `database`/`container` become
  subdirectories. Anything else raises — the fake never touches the
  network.
- Documents are JSON-lines files, one file per Spark write task
  (task-id named → idempotent under task retry, like the connector's
  per-partition bulk import), with the schema DDL persisted alongside
  so reads are self-describing.
- The change-feed source replays files in name order as a
  `SimpleDataSourceStreamReader`: the offset is the sorted list of
  consumed file names — the "continuation token" analog. New files =
  new feed entries. (Cosmos's real feed is per-logical-partition with
  continuation tokens per range; file granularity plays that role
  here.)

Nothing in this module is imported by production code — tests register
it explicitly, mirroring how a real cluster would ship the connector
jar separately from application code.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_SCHEMA_FILE = "_schema.ddl"


def container_dir(options) -> str:
    endpoint = options.get("spark.cosmos.accountendpoint") or options.get(
        "spark.cosmos.accountEndpoint", ""
    )
    if not endpoint.startswith("file://"):
        raise ValueError(
            "fake cosmos connector only serves file:// endpoints, got "
            f"{endpoint!r}"
        )
    database = options.get("spark.cosmos.database")
    container = options.get("spark.cosmos.container")
    if not database or not container:
        raise ValueError("spark.cosmos.database/container options required")
    return os.path.join(endpoint[len("file://") :], database, container)


def _doc_files(path: str) -> list[str]:
    if not os.path.isdir(path):
        return []
    return sorted(f for f in os.listdir(path) if f.endswith(".jsonl"))


def _read_rows(path: str, fname: str, schema: T.StructType):
    fields = [f.name for f in schema.fields]
    with open(os.path.join(path, fname), encoding="utf-8") as fh:
        for line in fh:
            if line.strip():
                doc = json.loads(line)
                yield tuple(doc.get(name) for name in fields)


@dataclass
class _FilePartition(InputPartition):
    fname: str


class _FakeCosmosReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options):
        self.schema = schema
        self.path = container_dir(options)

    def partitions(self):
        # One partition per document file — the per-physical-partition
        # parallel read shape of the real connector.
        return [_FilePartition(f) for f in _doc_files(self.path)] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition):
        if partition.fname:
            yield from _read_rows(self.path, partition.fname, self.schema)


@dataclass
class _TaskCommit(WriterCommitMessage):
    tmp: str
    final: str


class _FakeCosmosWriter(DataSourceWriter):
    """Two-phase commit: tasks write job-token+attempt-id tmp files, the
    driver-side ``commit`` renames exactly the committed attempts into
    place. A retried/speculative task leaves an orphan tmp that no
    commit message references (ignored by readers, which only see
    ``*.jsonl``) — so appends are exactly-once per job, and files from
    different jobs never collide (fresh token per writer)."""

    def __init__(self, schema: T.StructType, options, overwrite: bool):
        import uuid

        self.schema = schema
        self.path = container_dir(options)
        self.overwrite = overwrite
        self.token = uuid.uuid4().hex[:12]
        os.makedirs(self.path, exist_ok=True)
        with open(
            os.path.join(self.path, _SCHEMA_FILE), "w", encoding="utf-8"
        ) as fh:
            fh.write(schema.simpleString())

    def write(self, iterator) -> _TaskCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        final = f"part-{self.token}-{ctx.partitionId():05d}.jsonl"
        tmp = f".{final}.tmp-{ctx.taskAttemptId()}"
        fields = [f.name for f in self.schema.fields]
        with open(os.path.join(self.path, tmp), "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(dict(zip(fields, row))) + "\n")
        return _TaskCommit(tmp=tmp, final=final)

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in _doc_files(self.path):
                os.unlink(os.path.join(self.path, f))
        for m in messages:
            os.replace(
                os.path.join(self.path, m.tmp),
                os.path.join(self.path, m.final),
            )

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.unlink(os.path.join(self.path, m.tmp))
            except FileNotFoundError:
                pass


class FakeCosmosDataSource(DataSource):
    """Batch `cosmos.oltp` stand-in (register via ``register_fakes``)."""

    @classmethod
    def name(cls) -> str:
        return "cosmos.oltp"

    def schema(self):
        path = container_dir(self.options)
        sf = os.path.join(path, _SCHEMA_FILE)
        if not os.path.exists(sf):
            raise ValueError(f"container at {path} has no schema (empty?)")
        with open(sf, encoding="utf-8") as fh:
            return fh.read()

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _FakeCosmosReader(schema, self.options)

    def writer(self, schema: T.StructType, overwrite: bool):
        return _FakeCosmosWriter(schema, self.options, overwrite)


class _FakeChangeFeedReader(SimpleDataSourceStreamReader):
    """File-name-set offsets: each micro-batch serves the files that
    appeared since the last offset — the continuation-token analog."""

    def __init__(self, schema: T.StructType, options):
        self.schema = schema
        self.path = container_dir(options)
        # Real connector option: soft cap on items per micro-batch.
        # Offset granularity here is a file, so the cap is honored at
        # file boundaries: serve whole files until the hint is reached
        # (≥1 file per batch so progress is always made).
        self.hint = int(
            options.get("spark.cosmos.changefeed.itemcountpertriggerhint", 0)
            or 0
        )

    def initialOffset(self):
        return {"seen": []}

    def read(self, start: dict):
        seen = set(start.get("seen", []))
        files = _doc_files(self.path)
        new = [f for f in files if f not in seen]
        rows = []
        served = []
        for f in new:
            rows.extend(_read_rows(self.path, f, self.schema))
            served.append(f)
            if self.hint and len(rows) >= self.hint:
                break
        return iter(rows), {"seen": sorted(seen | set(served))}

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("seen", []))
        replay = [f for f in end.get("seen", []) if f not in seen]
        rows = []
        for f in replay:
            rows.extend(_read_rows(self.path, f, self.schema))
        return iter(rows)


class FakeCosmosChangeFeedDataSource(DataSource):
    """Streaming `cosmos.oltp.changeFeed` stand-in."""

    @classmethod
    def name(cls) -> str:
        return "cosmos.oltp.changeFeed"

    def schema(self):
        path = container_dir(self.options)
        sf = os.path.join(path, _SCHEMA_FILE)
        if not os.path.exists(sf):
            raise ValueError(f"container at {path} has no schema (empty?)")
        with open(sf, encoding="utf-8") as fh:
            return fh.read()

    def simpleStreamReader(self, schema: T.StructType):
        return _FakeChangeFeedReader(schema, self.options)


def register_fakes(spark) -> None:
    """Install both fakes on a session (idempotent)."""
    spark.dataSource.register(FakeCosmosDataSource)
    spark.dataSource.register(FakeCosmosChangeFeedDataSource)
