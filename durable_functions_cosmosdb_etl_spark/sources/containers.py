"""Container abstraction: the Cosmos-connector seam (SURVEY.md §4.3).

The reference reads/writes Cosmos *containers* (EtlProcess.cs:27,
90-111,165). In production Spark that's the public `azure-cosmos-spark`
connector (`cosmos.oltp` / `cosmos.oltp.changeFeed` formats); in this
environment (and in tests) containers are parquet directories. This
module is the seam: callers speak Container, the backend is config.

    staging = Container.parquet("/data/extracted",
                                partition_key="logical_partition")
    staging = Container.cosmos(endpoint, key, "documents", "extracted",
                               partition_key="logical_partition")
    df = staging.read(spark)
    staging.write(df)          # append, partitioned on the key
    staging.read_stream(spark) # change-feed analog

No Cosmos credentials or SDK are touched here — `Container.cosmos`
only records the format string and options a cluster with the connector
installed would pass to the same read/write calls.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


@dataclass(frozen=True)
class Container:
    """One logical document container with a designated partition key."""

    fmt: str
    path: str | None
    options: dict = field(default_factory=dict)
    partition_key: str | None = None
    schema: T.StructType | None = None

    @classmethod
    def parquet(
        cls,
        path: str,
        partition_key: str | None = None,
        schema: T.StructType | None = None,
    ) -> "Container":
        return cls("parquet", path, {}, partition_key, schema)

    @classmethod
    def cosmos(
        cls,
        endpoint: str,
        account_key: str,
        database: str,
        container: str,
        partition_key: str | None = None,
    ) -> "Container":
        # Public connector options (azure-cosmos-spark docs); unused in
        # tests — the seam records them for a connector-equipped cluster.
        opts = {
            "spark.cosmos.accountEndpoint": endpoint,
            "spark.cosmos.accountKey": account_key,
            "spark.cosmos.database": database,
            "spark.cosmos.container": container,
        }
        return cls("cosmos.oltp", None, opts, partition_key)

    # -- batch ---------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        r = spark.read.format(self.fmt).options(**self.options)
        if self.schema is not None:
            r = r.schema(self.schema)
        if self.fmt == "parquet":
            r = r.option("basePath", self.path)
            return r.load(self.path)
        return r.load()

    def write(self, df: DataFrame, mode: str = "append") -> None:
        w = df.write.format(self.fmt).options(**self.options).mode(mode)
        if self.partition_key and self.fmt == "parquet":
            w = w.partitionBy(self.partition_key)
        if self.fmt == "parquet":
            w.save(self.path)
        else:
            w.save()

    # -- incremental (change-feed analog) ------------------------------
    def read_stream(
        self, spark: SparkSession, max_files_per_trigger: int | None = 1
    ) -> DataFrame:
        """``max_files_per_trigger`` caps each micro-batch (None =
        uncapped). On the cosmos backend it maps to the connector's
        ``itemCountPerTriggerHint`` — the reference's
        MaxItemsPerInvocation=10 (EtlProcess.cs:186). Note the cadence
        difference: the parquet file source drains a backlog as several
        capped batches within one availableNow run, while a capped
        change feed processes ONE batch per run — each run is one
        "invocation" in the reference's cron model; drain by re-running
        on the same checkpoint (tests/test_fake_cosmos.py)."""
        if self.fmt == "parquet":
            if self.schema is None:
                raise ValueError("streaming a parquet container needs a schema")
            reader = spark.readStream.schema(self.schema)
            if max_files_per_trigger is not None:
                reader = reader.option(
                    "maxFilesPerTrigger", max_files_per_trigger
                )
            return reader.parquet(self.path)
        reader = spark.readStream.format("cosmos.oltp.changeFeed").options(
            **self.options
        )
        if max_files_per_trigger is not None:
            reader = reader.option(
                "spark.cosmos.changeFeed.itemCountPerTriggerHint",
                str(max_files_per_trigger),
            )
        return reader.load()
