"""Explicit StructType schemas.

Mirrors the reference's data model (schema-on-read POCOs,
/root/reference/SampleItem.cs:7-17, TransformedItem.cs:7-20,
OrchestrationLease.cs:7-20, OrchestrationRun.cs:7-18) as Spark
StructTypes, plus the driver test tables (FIXTURES.md §B).

Schema-on-read: the reference stores arbitrary JSON and binds to POCOs at
read time (EtlProcess.cs:199). The Spark analog is an explicit StructType
passed to ``spark.read.schema(...)`` / ``F.from_json`` — never schema
inference, which at 100 TB means a full pre-scan.
"""

from __future__ import annotations

from pyspark.sql import types as T

# SampleItem (staging/source record) — SampleItem.cs:7-17. `date` and
# `done` are deliberately strings (raw date kept as string, boolean-as-
# string per the reference's generator, EtlProcess.cs:231-232).
SAMPLE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("desc", T.StringType(), True),
        T.StructField("done", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("pr", T.StringType(), True),
        T.StructField("logical_partition", T.StringType(), False),
    ]
)

# TransformedItem (output record) — TransformedItem.cs:7-20.
TRANSFORMED_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("source_date", T.StringType(), True),
        T.StructField("transform_timestamp", T.TimestampType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("done", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("pr", T.StringType(), True),
        T.StructField("additional_data", T.StringType(), True),
        T.StructField("transform_batch", T.StringType(), True),
        T.StructField("update_location", T.StringType(), True),
    ]
)

# OrchestrationRun (audit row) — OrchestrationRun.cs:7-18, written at
# EtlProcess.cs:120-130. `duration` = (end-start).TotalSeconds (:125).
ORCHESTRATION_RUN_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("duration", T.DoubleType(), True),
        T.StructField("forced_lease", T.BooleanType(), True),
        T.StructField("succeeded", T.BooleanType(), True),
        T.StructField("orchestration_worker", T.StringType(), True),
        T.StructField("additional_info", T.StringType(), True),
    ]
)

# OrchestrationLease (lock row) — OrchestrationLease.cs:7-20. Kept for
# audit parity; Spark's single driver + streaming checkpoints subsume the
# distributed-lease protocol (SURVEY.md §2.1 O3).
ORCHESTRATION_LEASE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("start_time", T.TimestampType(), True),
        T.StructField("end_time", T.TimestampType(), True),
        T.StructField("lease_timeout", T.TimestampType(), True),
        T.StructField("last_lease_timed_out", T.BooleanType(), True),
        T.StructField("locked", T.BooleanType(), True),
        T.StructField("worker", T.StringType(), True),
        T.StructField("etag", T.StringType(), True),
    ]
)

# events.props JSON payload (TESTDATA events table; plays the change-feed
# document body — re-parsed with from_json like EtlProcess.cs:199).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

# Driver test tables (FIXTURES.md §B) — explicit schemas so streaming
# file sources need no inference pass.
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
