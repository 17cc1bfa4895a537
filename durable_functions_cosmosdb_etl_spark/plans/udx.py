"""User-defined function surface: pandas UDF (scalar), applyInPandas
UDAF (grouped custom aggregate), Python UDTF (table function).

The reference's whole transform stage is a host-language row UDF
(`Transform`, /root/reference/EtlProcess.cs:245-260) — re-expressed
natively in operators/transform.py. This module is the engine's surface
for logic that genuinely can't be a built-in expression, in the
preferred order of escalation (SURVEY.md §2.2 "UDF/UDAF/UDTF"):

1. pandas UDF — Arrow-batched, vectorized numpy inside; ~10-100× faster
   than row-at-a-time Python UDFs, still JVM↔Python transfer per batch.
2. applyInPandas — grouped map for custom aggregates; one shuffle on the
   group key, each group materialized as a pandas frame (groups must fit
   in executor memory — bounded-cardinality keys only at 100 TB).
3. Python UDTF — row → many rows; lateral-joined in SQL.

Every entry still gets a DuckDB oracle: custom execution, checkable
semantics.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .registry import query

CHUNK_WORDS = 20


# --------------------------------------------------------------------------
# 1. Scalar pandas UDF: embedding L2 norm
# --------------------------------------------------------------------------


def _l2_norm_udf():
    import numpy as np

    @F.pandas_udf("double")
    def l2_norm(emb: pd.Series) -> pd.Series:
        # Fixed-width rows → one (batch × dim) float64 matrix, one
        # vectorized reduction per Arrow batch.
        if len(emb) == 0:
            return pd.Series([], dtype="float64")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        return pd.Series(np.sqrt((mat * mat).sum(axis=1)))

    return l2_norm


@query(
    "udf_pandas_norm",
    oracle="""
    SELECT vec_id,
           CAST(round(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 1000000)
                AS BIGINT) / 1000000.0 AS l2
    FROM embeddings
    """,
)
def udf_pandas_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched pandas UDF computing embedding L2 norms.

    (The same norm is expressible natively with F.aggregate — see
    operators/similarity.py, which is the hot-path choice; this entry
    exists to exercise and test the pandas-UDF machinery itself.)
    Rounded to 1e-6 both sides: numpy's pairwise summation and DuckDB's
    sequential fold differ in the last ulps.
    """
    em = load_table(spark, sf_dir, "embeddings")
    l2 = _l2_norm_udf()(F.col("embedding"))
    return em.select(
        "vec_id",
        (F.round(l2 * 1000000, 0).cast("long") / F.lit(1000000.0)).alias("l2"),
    )


# --------------------------------------------------------------------------
# 2. Grouped UDAF via applyInPandas: per-user modal value
# --------------------------------------------------------------------------


def _mode_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    # Deterministic mode: highest count, smallest value on ties.
    counts = pdf.groupby("cents").size().reset_index(name="n")
    counts = counts.sort_values(["n", "cents"], ascending=[False, True])
    top = counts.iloc[0]
    return pd.DataFrame(
        {
            "user_id": [pdf["user_id"].iloc[0]],
            "mode_cents": [int(top["cents"])],
            "mode_n": [int(top["n"])],
        }
    )


@query(
    "udaf_mode",
    oracle="""
    WITH v AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
               FROM events),
    c AS (SELECT user_id, cents, count(*) AS n FROM v GROUP BY user_id, cents)
    SELECT user_id, cents AS mode_cents, n AS mode_n FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY n DESC, cents) AS rn
        FROM c) WHERE rn = 1
    """,
)
def udaf_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate (modal event value per user) via
    applyInPandas — the UDAF escape hatch when no built-in aggregate
    fits. One shuffle on user_id; each group is a small pandas frame.

    Values are fixed-point cents (portable integers); ties break to the
    smallest value so the result is deterministic (DuckDB's built-in
    mode() leaves ties unspecified — the oracle replays the same rule
    with a window instead).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    return ev.groupBy("user_id").applyInPandas(
        _mode_fn, "user_id bigint, mode_cents bigint, mode_n bigint"
    )


# --------------------------------------------------------------------------
# 2b. Co-grouped map via cogroup().applyInPandas: per-user as-of align
# --------------------------------------------------------------------------


def _asof_fn(cl: pd.DataFrame, vw: pd.DataFrame) -> pd.DataFrame:
    # Sort both sides (ts, event_id): with duplicate timestamps,
    # merge_asof(backward) takes the LAST right row ≤ target — i.e. the
    # max event_id at the max qualifying ts, the same rule the oracle's
    # ORDER BY ts DESC, event_id DESC LIMIT 1 spells.
    cl = cl.sort_values(["ts", "event_id"]).rename(
        columns={"event_id": "click_id", "ts": "click_ts"}
    )
    if len(vw) == 0:
        out = cl.copy()
        out["view_id"] = pd.Series([None] * len(cl), dtype="Int64")
        out["view_ts"] = pd.NaT
    else:
        vw = vw.sort_values(["ts", "event_id"]).rename(
            columns={"event_id": "view_id", "ts": "view_ts"}
        )[["view_id", "view_ts"]]
        out = pd.merge_asof(
            cl,
            vw,
            left_on="click_ts",
            right_on="view_ts",
            direction="backward",
        )
        out["view_id"] = out["view_id"].astype("Int64")
    return out[["user_id", "click_id", "click_ts", "view_id", "view_ts"]]


@query(
    "udaf_cogroup_asof",
    extra=True,
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM events c
    LEFT JOIN LATERAL (SELECT event_id, ts FROM events v
                       WHERE v.user_id = c.user_id
                         AND v.event_type = 'view'
                         AND v.ts <= c.ts
                       ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) v
        ON true
    WHERE c.event_type = 'click'
    """,
)
def udaf_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-grouped map (``cogroup().applyInPandas``): align each user's
    clicks to their most recent preceding view with pandas
    ``merge_asof`` — the two-sided grouped-UDF surface (both streams
    shuffle once on user_id, then meet as a pair of in-memory frames
    per key). The engine's native as-of join (operators/asof.py) covers
    the same semantics declaratively; this entry exercises the
    cogrouped Python path the way a feature-engineering notebook would.
    Ties at equal timestamps break to the highest view event_id on both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    ts_type = ev.schema["ts"].dataType.simpleString()
    out_schema = (
        f"user_id bigint, click_id bigint, click_ts {ts_type}, "
        f"view_id bigint, view_ts {ts_type}"
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(lambda cl, vw: _asof_fn(cl, vw), out_schema)
    )


# --------------------------------------------------------------------------
# 3. Python UDTF: document chunking (LLM context-window prep)
# --------------------------------------------------------------------------


def _chunk_udtf():
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, chunk_idx: bigint, chunk: string")
    class ChunkWords:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            w = text.strip().split()
            for i in range(0, (len(w) + CHUNK_WORDS - 1) // CHUNK_WORDS):
                yield (
                    doc_id,
                    i,
                    " ".join(w[i * CHUNK_WORDS : (i + 1) * CHUNK_WORDS]),
                )

    return ChunkWords


@query(
    "udtf_chunk",
    oracle=rf"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents)
    SELECT doc_id, r['idx'] AS chunk_idx, r['chunk'] AS chunk
    FROM (SELECT doc_id,
                 unnest(list_transform(
                     range(CAST(ceil(len(w) / {CHUNK_WORDS}.0) AS BIGINT)),
                     i -> {{'idx': i,
                            'chunk': array_to_string(
                                w[i*{CHUNK_WORDS}+1 : (i+1)*{CHUNK_WORDS}],
                                ' ')}})) AS r
          FROM d)
    """,
)
def udtf_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF splitting documents into fixed-size word chunks
    (the context-window chunking step of a training-data pipeline),
    lateral-joined per document.

    A UDTF is the right shape when one row expands to a variable number
    of rows AND the expansion needs imperative logic; for this simple
    case a native posexplode of slices would also work (see the oracle) —
    the entry exercises the UDTF execution path end to end.
    """
    register_views(spark, sf_dir, ("documents",))
    spark.udtf.register("chunk_words", _chunk_udtf())
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk
        FROM documents d, LATERAL chunk_words(d.doc_id, d.text) c
        """
    )
