"""Incremental near-dup dedup for continuous ingestion.

Batch LSH dedup (operators/dedup.py) assumes the whole corpus is
present. A training-data pipeline ingests continuously: each arriving
micro-batch must be checked against *everything already accepted*
without rescanning it. This module keeps a persistent accepted-band
index (parquet; Delta in production) and, per micro-batch:

1. shingle + MinHash-sign the batch (same operators as the batch path);
2. drop in-batch near-dups (batch-local LSH pairs → keep min doc id);
3. equi-join the batch's bands against the accepted-band index —
   band-hash collision ⇒ candidate; exact-Jaccard verify against the
   colliding docs' stored shingles;
4. append the survivors' docs to the accepted table and their bands +
   shingles to the index.

Scale shape: the per-batch cost is O(batch × bands) for the probe join
(hash-partitioned on band_hash) — the accepted index is never scanned
whole, only its matching band-hash partitions; at 100 TB the index is a
bucketed/Z-ordered table on band_hash. Exactly the change-feed
incremental contract of the reference (EtlProcess.cs:183-209), applied
to dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd

_BANDS_SUBDIR = "bands"
_DOCS_SUBDIR = "accepted"


def _bands_of(sigs: DataFrame) -> DataFrame:
    return sigs.select(
        "doc",
        "sh",
        "n_sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(dd.LSH_BANDS - 1)),
                lambda j: F.hash(F.slice("sig", j * dd.LSH_ROWS + 1, dd.LSH_ROWS)),
            )
        ).alias("band_idx", "band_hash"),
    )


def dedup_batch_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Process one micro-batch; returns the accepted (unique) rows.

    Appends accepted docs to ``{index_dir}/accepted`` and their band
    index to ``{index_dir}/bands``; both grow monotonically — rerunning
    a batch of already-accepted docs yields zero new acceptances (the
    docs now collide with their own index entries), which is the
    idempotency the at-least-once source needs.
    """
    bands_dir = os.path.join(index_dir, _BANDS_SUBDIR)
    docs_dir = os.path.join(index_dir, _DOCS_SUBDIR)

    sigs = dd.minhash_signatures(batch, id_col, text_col, n).cache()
    bands = _bands_of(sigs).cache()

    # (2) in-batch dedup: batch-local LSH pairs, drop the larger id.
    a, b = bands.alias("a"), bands.alias("b")
    local_pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("a.n_sh").alias("na"),
            F.col("b.sh").alias("sh_b"),
            F.col("b.n_sh").alias("nb"),
        )
        .distinct()
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    local_dupes = local_pairs.select(F.col("doc_b").alias("doc")).distinct()
    survivors = bands.join(local_dupes, "doc", "left_anti")

    # (3) probe the accepted index (if it exists yet).
    try:
        idx = spark.read.parquet(bands_dir)
        have_index = True
    except Exception:
        have_index = False
    if have_index:
        cand = (
            survivors.alias("s")
            .join(
                idx.alias("i"),
                (F.col("s.band_idx") == F.col("i.band_idx"))
                & (F.col("s.band_hash") == F.col("i.band_hash")),
            )
            .select(
                F.col("s.doc").alias("doc"),
                F.col("s.sh").alias("sh_new"),
                F.col("i.sh").alias("sh_old"),
            )
            .distinct()
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("sh_new", "sh_old")).cast("double")
                / F.size(F.array_union("sh_new", "sh_old")).cast("double"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        index_dupes = cand.select("doc").distinct()
        survivors = survivors.join(index_dupes, "doc", "left_anti")

    accepted_ids = survivors.select("doc").distinct()
    accepted_rows = batch.join(
        accepted_ids.withColumnRenamed("doc", id_col), id_col
    )

    # (4) persist: docs + band index entries of the accepted set. The
    # docs write carries an ingest-batch lineage id (the reference's
    # TransformBatch pattern, EtlProcess.cs:194,256) — and the RETURN
    # value is a read-back filtered on it: the lazy plan above references
    # the band index we are about to append to, so re-evaluating it
    # after the append would see the batch's own entries and reject
    # everything. Reading back the written files is the stable snapshot.
    import uuid as _uuid

    tag = str(_uuid.uuid4())
    accepted_rows.withColumn("ingest_batch", F.lit(tag)).write.mode(
        "append"
    ).parquet(docs_dir)
    survivors.select("doc", "sh", "n_sh", "band_idx", "band_hash").write.mode(
        "append"
    ).parquet(bands_dir)
    return (
        spark.read.parquet(docs_dir)
        .filter(F.col("ingest_batch") == tag)
        .drop("ingest_batch")
    )


def streaming_dedup_ingest(
    spark: SparkSession,
    incoming_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema,
    threshold: float = 0.5,
):
    """Continuous form: each file micro-batch is deduped against the
    accumulated index inside foreachBatch."""

    def process(batch_df, batch_id: int) -> None:
        dedup_batch_against_index(
            spark, batch_df, index_dir, threshold=threshold
        )

    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(incoming_dir)
    )
    q = (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
