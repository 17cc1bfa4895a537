"""Per-row transform (reference operator O9) as a pure select pipeline.

Re-expresses the reference's ``Transform`` row UDF
(/root/reference/EtlProcess.cs:245-260) as built-in column expressions —
no Python UDF anywhere, so the whole map stays inside whole-stage
codegen:

- rename ``date → source_date`` (:250)
- ``desc`` blank/null → "Empty Description in source for item {id}" (:251)
- ``name`` blank/null → "Empty Name in source for item {id}" (:252)
- enrichment ``additional_data`` with a running row counter (:253)
- passthrough ``done``, ``pr`` (:254-255)
- micro-batch lineage ``transform_batch`` (:194,:256)
- writer-region provenance ``update_location`` =
  ``split(PreferredLocations, ",")[0]`` (:257)
- processing-time stamp ``transform_timestamp`` (:258)

Determinism: batch id, clock, and the counter column are injectable
(SURVEY.md §4.2) so oracle/golden tests hash-match; defaults preserve the
reference's nondeterministic behavior.

Scale note: the reference's counter is a process-global int (:197). A
global ``row_number()`` over all data is a single-partition sort — fine
for the reference's ≤10-doc batches, pathological at 100 TB. Callers at
scale pass ``counter_col`` (any stable per-row value, e.g. the source's
own sequence id); the global-window fallback exists only for strict
small-batch parity.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_PREFERRED_LOCATIONS = "West Europe,North Europe"


def _blank(col: Column) -> Column:
    """string.IsNullOrWhiteSpace analog (EtlProcess.cs:251-252)."""
    return col.isNull() | (F.trim(col) == F.lit(""))


def transform_items(
    df: DataFrame,
    batch_id: str,
    clock: datetime | None = None,
    preferred_locations: str = DEFAULT_PREFERRED_LOCATIONS,
    counter_col: str | None = None,
    counter_start: int = 1,
) -> DataFrame:
    """SampleItem DF → TransformedItem DF (EtlProcess.cs:245-260)."""
    if counter_col is not None:
        counter = F.col(counter_col).cast("long")
    else:
        # Small-batch parity path only (see module docstring).
        counter = (
            F.row_number().over(Window.orderBy("id")) + F.lit(counter_start - 1)
        ).cast("long")
    ts = F.lit(clock) if clock is not None else F.current_timestamp()
    update_location = preferred_locations.split(",")[0]  # :257, driver-side const

    return df.select(
        F.col("id"),  # :249
        F.col("date").alias("source_date"),  # :250
        ts.alias("transform_timestamp"),  # :258
        F.when(
            _blank(F.col("desc")),
            F.format_string("Empty Description in source for item %s", F.col("id")),
        )
        .otherwise(F.col("desc"))
        .alias("description"),  # :251
        F.col("done"),  # :254
        F.when(
            _blank(F.col("name")),
            F.format_string("Empty Name in source for item %s", F.col("id")),
        )
        .otherwise(F.col("name"))
        .alias("name"),  # :252
        F.col("pr"),  # :255
        F.format_string("Data added from transform function [%d]", counter).alias(
            "additional_data"
        ),  # :253
        F.lit(batch_id).alias("transform_batch"),  # :194,:256
        F.lit(update_location).alias("update_location"),  # :257
    )
