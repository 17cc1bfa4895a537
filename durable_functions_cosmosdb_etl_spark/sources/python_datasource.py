"""Custom Python DataSource (Spark 4 DataSource API) for SampleItems.

The reference's extract stage is a single-endpoint HTTP scan
(/root/reference/EtlProcess.cs:133-161) and its generator a single
in-process loop (:211-243). SURVEY.md §2.1/O5 names "custom DataSource
V2" as the scale path for pluggable extract: this module implements it
with Spark 4's Python DataSource API — `spark.read.format(...)` over a
source whose *partitions* are the unit of parallel extraction, so N
shards fetch/generate on N executors with no driver materialization.

Usage:
    spark.dataSource.register(SampleItemDataSource)
    df = (spark.read.format("sample_items")
          .option("count", 1000).option("shards", 8)
          .option("clock", "2026-01-15T10:00:00").load())

The rows reproduce the reference generator's shape deterministically
(EtlProcess.cs:227-239): sequential desc, name stamped with the clock,
round-robin Partition_A/B/C, done="true", constant pr — with
md5-derived uuid-shaped ids per row index (deterministic analog of
Guid.NewGuid, :230) so tests can hash-match.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence
from datetime import datetime

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..schemas import SAMPLE_ITEM_SCHEMA

FORMAT_NAME = "sample_items"


def _det_uuid(seed: str) -> str:
    h = hashlib.md5(seed.encode()).hexdigest()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"


class _Shard(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SampleItemReader(DataSourceReader):
    def __init__(self, options: dict):
        self.count = int(options.get("count", 100))
        self.shards = max(1, int(options.get("shards", 8)))
        clock = options.get("clock", "2026-01-15T10:00:00")
        self.clock = datetime.fromisoformat(clock)

    def partitions(self) -> Sequence[InputPartition]:
        # Contiguous row-range shards — each executor task generates (or
        # in a real extract, fetches) only its slice.
        per = -(-self.count // self.shards)
        return [
            _Shard(lo + 1, min(lo + per, self.count) + 1)
            for lo in range(0, self.count, per)
        ]

    def read(self, partition: _Shard) -> Iterator[tuple]:
        date_str = self.clock.strftime("%m/%d/%Y %H:%M:%S")  # :231
        name_stamp = self.clock.strftime("%Y%m%H%M")  # "yyyyMMhhmm", :234
        for i in range(partition.start, partition.end):
            yield (
                _det_uuid(f"sample-{i}"),  # Guid.NewGuid analog, :230
                date_str,
                f"Sample item #{i} of {self.count} generated",  # :233
                "true",  # :232
                f"Item_{name_stamp}_{i}",  # :234
                "Additional field info",  # :235
                f"Partition_{chr(65 + i % 3)}",  # :236
            )


class SampleItemDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        return SAMPLE_ITEM_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SampleItemReader(self.options)
