"""Incremental near-dup dedup for continuous ingestion.

Batch LSH dedup (operators/dedup.py) assumes the whole corpus is
present. A training-data pipeline ingests continuously: each arriving
micro-batch must be checked against *everything already accepted*
without rescanning it. This module keeps a persistent accepted index
(parquet; Delta in production) and, per micro-batch:

1. shingle + MinHash-sign the batch (same operators as the batch path);
2. drop in-batch near-dups (batch-local LSH pairs → keep min doc id);
3. equi-join the batch's bands against the accepted-band index —
   band-hash collision ⇒ candidate; exact-Jaccard verify against the
   colliding docs' stored shingles;
4. persist the survivors: band index + shingle store + accepted docs,
   all partitioned by the ingest-batch tag.

Index layout (normalized — shingles are stored ONCE per doc, not once
per band row):

    {index_dir}/bands/     (doc, band_idx, band_hash)      × LSH_BANDS
    {index_dir}/shingles/  (doc, sh, n_sh)                 × 1
    {index_dir}/accepted/  (original batch columns)        × 1

every table partitioned by ``ingest_batch``.

Exactly-once under replay: writes use dynamic partition overwrite keyed
on a deterministic batch tag (the foreachBatch ``batch_id`` in the
streaming path), so a crashed-and-replayed batch REWRITES its own
partitions instead of appending duplicates, and the index probe
excludes the batch's own partitions — no write-ordering window exists
in which a crash can either lose docs or leak duplicates.

Scale shape: the per-batch cost is O(batch × bands) for the probe join
(hash-partitioned on band_hash) — the accepted index is never scanned
whole, only its matching band-hash partitions; at 100 TB the index is a
bucketed/Z-ordered table on band_hash. Exactly the change-feed
incremental contract of the reference (EtlProcess.cs:183-209), applied
to dedup.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dd

_BANDS_SUBDIR = "bands"
_SHINGLES_SUBDIR = "shingles"
_DOCS_SUBDIR = "accepted"
_TAG_COL = "ingest_batch"


def _bands_of(sigs: DataFrame) -> DataFrame:
    return sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(dd.LSH_BANDS - 1)),
                lambda j: F.hash(F.slice("sig", j * dd.LSH_ROWS + 1, dd.LSH_ROWS)),
            )
        ).alias("band_idx", "band_hash"),
    )


def _read_index_part(
    spark: SparkSession, path: str, exclude_tag: str
) -> DataFrame | None:
    """Read one index table, excluding the current batch's partitions.

    Only a missing path reads as "no index yet" — any other failure
    (corrupt file, transient FS error) propagates so the batch retries
    instead of silently skipping the dedup probe and corrupting the
    corpus.
    """
    if "://" not in path and not os.path.isdir(path):
        return None  # local path, nothing written yet
    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise
    return df.filter(F.col(_TAG_COL) != exclude_tag).drop(_TAG_COL)


def _write_partition(df: DataFrame, path: str) -> None:
    """Dynamic-partition-overwrite write of one batch's partition.

    The mode is set as a per-write OPTION (not session conf) because
    inside foreachBatch the writes execute on the streaming-clone
    session, whose conf a setting on the outer session doesn't reach.
    """
    df.write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy(_TAG_COL).parquet(path)


def _jaccard(sh_a, sh_b):  # noqa: ANN001 - Column exprs
    # try_divide: two shingle-less docs have a 0-size union, and the
    # plain division is a job-killing DIVIDE_BY_ZERO under ANSI mode
    # (Spark 4 default) — same class as the batch minhash verify. A
    # null jaccard fails the >= threshold filter, so such pairs drop
    # (the doc carries no near-dup evidence). New batches also exclude
    # shingle-less docs from banding below, but a pre-existing index
    # may still hold their all-zero-signature band rows.
    return F.try_divide(
        F.size(F.array_intersect(sh_a, sh_b)).cast("double"),
        F.size(F.array_union(sh_a, sh_b)).cast("double"),
    )


def dedup_batch_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    batch_tag: str | None = None,
) -> DataFrame:
    """Process one micro-batch; returns the accepted (unique) rows.

    ``batch_tag`` keys this batch's partitions in every index table.
    Pass a deterministic tag (e.g. the streaming batch_id) to make
    replays exactly-once: the same partitions are overwritten and the
    probe ignores them. The default (fresh uuid) gives at-least-once
    append semantics in which a replayed batch accepts nothing new (its
    docs collide with their own earlier index entries).
    """
    bands_dir = os.path.join(index_dir, _BANDS_SUBDIR)
    shingles_dir = os.path.join(index_dir, _SHINGLES_SUBDIR)
    docs_dir = os.path.join(index_dir, _DOCS_SUBDIR)
    if batch_tag is None:
        import uuid as _uuid

        batch_tag = str(_uuid.uuid4())

    sigs = dd.minhash_signatures(batch, id_col, text_col, n).cache()
    shingles = sigs.select("doc", "sh", "n_sh")
    # Shingle-less docs (empty/short text) never band: their all-zero
    # signatures would collide with EACH OTHER (c² candidates whose
    # exact verify is 0/0 — see _jaccard) while carrying no near-dup
    # evidence. They are accepted unconditionally below, exactly the
    # verdict the (null-jaccard) verify would reach, without the
    # candidate blowup or index pollution.
    bands = _bands_of(sigs.filter(F.col("n_sh") >= 1)).cache()
    # coalesce: null-text docs have null n_sh and must land here, not
    # vanish from both branches
    shingleless_ids = sigs.filter(
        F.coalesce(F.col("n_sh"), F.lit(0)) < 1
    ).select("doc")

    # (2) in-batch dedup: batch-local LSH candidates (bands carry only
    # ids — shingles join in once, not 16× per band row), exact verify,
    # drop the larger id.
    a, b = bands.alias("a"), bands.alias("b")
    cand_local = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    local_dupes = (
        cand_local.join(
            shingles.select(
                F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            shingles.select(
                F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b")
            ),
            "doc_b",
        )
        .filter(_jaccard(F.col("sh_a"), F.col("sh_b")) >= threshold)
        .select(F.col("doc_b").alias("doc"))
        .distinct()
    )
    survivor_bands = bands.join(local_dupes, "doc", "left_anti")

    # (3) probe the accepted index (excluding this batch's partitions).
    idx_bands = _read_index_part(spark, bands_dir, batch_tag)
    if idx_bands is not None:
        idx_shingles = _read_index_part(spark, shingles_dir, batch_tag)
        if idx_shingles is None:
            # bands/ exists but shingles/ is missing: a crash landed
            # between the two index writes, or the index predates the
            # bands+shingles split layout. Probing bands without shingle
            # verification would silently drop non-duplicates, and the
            # pre-split layout also lacks the ingest_batch partition
            # column — fail loudly rather than corrupt the stream.
            raise ValueError(
                f"dedup index at {shingles_dir} is missing while "
                f"{bands_dir} exists — incomplete or pre-split index "
                "layout; rebuild the index (rerun past batches) or "
                "remove the bands table to start fresh"
            )
        cand_idx = (
            survivor_bands.alias("s")
            .join(
                idx_bands.alias("i"),
                (F.col("s.band_idx") == F.col("i.band_idx"))
                & (F.col("s.band_hash") == F.col("i.band_hash")),
            )
            .select(
                F.col("s.doc").alias("doc"), F.col("i.doc").alias("old_doc")
            )
            .distinct()
        )
        index_dupes = (
            cand_idx.join(shingles.select("doc", "sh"), "doc")
            .join(
                idx_shingles.select(
                    F.col("doc").alias("old_doc"), F.col("sh").alias("sh_old")
                ),
                "old_doc",
            )
            .filter(_jaccard(F.col("sh"), F.col("sh_old")) >= threshold)
            .select("doc")
            .distinct()
        )
        survivor_bands = survivor_bands.join(index_dupes, "doc", "left_anti")

    accepted_ids = (
        survivor_bands.select("doc").distinct().unionByName(shingleless_ids)
    )
    accepted_rows = batch.join(
        accepted_ids.withColumnRenamed("doc", id_col), id_col
    )

    # (4) persist under this batch's partition in every table. Dynamic
    # partition overwrite makes the whole step idempotent per tag: a
    # replay rewrites partitions {tag} and touches nothing else, so
    # there is no ordering window between the three writes in which a
    # crash loses docs (bands-without-docs) or leaks duplicates
    # (docs-without-bands). The RETURN value is a read-back of the docs
    # table pruned to this partition — the lazy plan above references
    # the index tables we just wrote, so re-evaluating it later would
    # see the batch's own entries and reject everything; the written
    # files are the stable snapshot (and the partition filter prunes the
    # read to this batch's files only).
    tagged = F.lit(batch_tag).alias(_TAG_COL)
    _write_partition(
        survivor_bands.select("doc", "band_idx", "band_hash", tagged), bands_dir
    )
    _write_partition(
        shingles.join(accepted_ids, "doc").select("doc", "sh", "n_sh", tagged),
        shingles_dir,
    )
    _write_partition(accepted_rows.select("*", tagged), docs_dir)
    sigs.unpersist()
    bands.unpersist()
    return (
        spark.read.parquet(docs_dir)
        .filter(F.col(_TAG_COL) == batch_tag)
        .drop(_TAG_COL)
    )


def streaming_dedup_ingest(
    spark: SparkSession,
    incoming_dir,
    index_dir: str,
    checkpoint_dir: str,
    schema=None,
    threshold: float = 0.5,
):
    """Continuous form: each file micro-batch is deduped against the
    accumulated index inside foreachBatch. The streaming ``batch_id`` is
    the partition tag, so a batch replayed after a crash overwrites its
    own partitions — exactly-once output from an at-least-once source.

    ``incoming_dir`` is a parquet directory (requires ``schema``) or a
    :class:`~..sources.containers.Container` — e.g. a cosmos change-feed
    container, giving continuous near-dup dedup of a document feed
    through the connector seam unchanged.
    """

    def process(batch_df, batch_id: int) -> None:
        dedup_batch_against_index(
            spark,
            batch_df,
            index_dir,
            threshold=threshold,
            batch_tag=f"b{batch_id}",
        )

    from ..sources.containers import Container

    if isinstance(incoming_dir, Container):
        src = incoming_dir.read_stream(spark, max_files_per_trigger=None)
    else:
        if schema is None:
            raise ValueError("parquet ingest requires a schema")
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
