"""Composite pipeline queries: multi-stage dataflows as single plans.

The point of an engine is composition: quality-gate → language filter →
exact dedup → context-window chunking → per-chunk stats, fused into ONE
Catalyst plan (no materialization between stages — filters reach the
scan, the dedup aggregate is the only wide stage before chunk
explosion). The chunking here is the *native* formulation (slice over a
materialized word array); plans/udx.py's UDTF is the imperative
equivalent for logic that outgrows expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as tx
from ..sources.tables import load_table, register_views
from .registry import query

CHUNK = 20


@query(
    "pipeline_llm_prep",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, text, lang,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_words,
               CAST(len(regexp_extract_all(lower(text),
                    '\b(the|and|of|to|is|in)\b')) AS BIGINT) AS stop_hits
        FROM documents),
    gated AS (
        SELECT * FROM scored
        WHERE lang = 'en' AND n_words >= 30
          AND CAST(stop_hits AS DOUBLE) / n_words >= 0.02),
    deduped AS (
        SELECT min(doc_id) AS doc_id, text,
               string_split_regex(trim(text), '\s+') AS w
        FROM gated GROUP BY text),
    chunks AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(CAST(ceil(len(w) / {CHUNK}.0) AS BIGINT)),
                   i -> {{'idx': i,
                          'chunk': array_to_string(
                              w[i*{CHUNK}+1 : (i+1)*{CHUNK}], ' ')}})) AS r
        FROM deduped)
    SELECT doc_id, r['idx'] AS chunk_idx, r['chunk'] AS chunk,
           CAST(len(string_split_regex(r['chunk'], '\s+')) AS BIGINT)
               AS chunk_words
    FROM chunks
    """,
)
def pipeline_llm_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM training-data prep as one fused plan:

    quality gate (≥30 words, stopword ratio ≥ 0.02, lang = 'en') →
    exact dedup (min-id keeper per text) → 20-word context chunks →
    per-chunk word counts.

    Plan shape: scan-side filters (pushable predicates + cheap scalar
    gates) → ONE hash aggregate on text (the dedup) → narrow explode.
    At 100 TB the dedup aggregate keys on the full text; production
    would key on md5(text) to shrink shuffle keys (identical semantics,
    see operators/dedup.exact_dedup_groups).
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    gated = docs.filter(
        (F.col("lang") == "en")
        & (tx.word_count(t) >= 30)
        & (
            tx.marker_score(t, "en").cast("double") / tx.word_count(t)
            >= 0.02
        )
    )
    deduped = (
        gated.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", tx.words(F.col("text")).alias("w"))
    )
    n_chunks = F.ceil(F.size("w") / float(CHUNK)).cast("int")
    chunks = deduped.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice("w", i * CHUNK + 1, CHUNK), " "
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "chunk",
        F.size(F.split("chunk", r"\s+")).cast("long").alias("chunk_words"),
    )


@query(
    "sample_systematic",
    oracle="""
    WITH r AS (SELECT doc_id, source, lang, n_chars,
                      row_number() OVER (PARTITION BY source
                                         ORDER BY doc_id) AS rn
               FROM documents)
    SELECT doc_id, source, lang, n_chars FROM r WHERE rn % 10 = 1
    """,
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic systematic sampling: every 10th document per source
    stratum in doc_id order — the reproducible downsampling you want
    when a training-data mix must be auditable (vs df.sample's
    seed-and-partition-dependent Bernoulli draw, exposed as
    sample_stratified). One window per stratum, no shuffle beyond its
    partitioning.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("doc_id")
    )
    return (
        d.withColumn("rn", rn)
        .filter(F.pmod(F.col("rn"), F.lit(10)) == 1)
        .select("doc_id", "source", "lang", "n_chars")
    )


@query(
    "pipeline_pack",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens
        FROM documents),
    c AS (SELECT doc_id, source, n_tokens,
                 sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
    SELECT doc_id, source, n_tokens,
           CAST((cum - 1) // 2048 AS BIGINT) AS pack_id
    FROM c
    """,
)
def pipeline_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to ~2048-token training packs
    by running token total per source stream (the distributed analog of
    greedy concat-and-split packing; deterministic given the doc order).
    One window per source — shuffle keyed on source only.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.select("doc_id", "source", toks.alias("n_tokens"))
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            ((F.col("cum") - 1) / 2048).cast("long").alias("pack_id"),
        )
    )


@query(
    "text_scrub",
    extra=True,
    oracle=r"""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(text,
                 '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
               'https?://[^ ]+', '<URL>', 'g'),
             '[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]', '<PHONE>', 'g')
               AS scrubbed,
           CAST(len(regexp_extract_all(text,
                '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails
    FROM documents
    """,
)
def text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: chained regexp_replace redaction (emails → URLs →
    phone-shaped digits) + a redaction count. Pure scan-side expressions
    (no shuffle); patterns restricted to syntax Java regex and RE2 parse
    identically.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, r"[a-z0-9.]+@[a-z0-9.]+", "<EMAIL>"),
            r"https?://[^ ]+",
            "<URL>",
        ),
        r"[0-9][0-9][0-9]-[0-9][0-9][0-9][0-9]",
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(t, F.lit(r"[a-z0-9.]+@[a-z0-9.]+"), 0))
        .cast("long")
        .alias("n_emails"),
    )


@query(
    "pipeline_shard",
    extra=True,
    oracle="""
    WITH s AS (
        SELECT doc_id, lang, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 16 AS shard_id
        FROM documents)
    SELECT shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS shard_chars,
           min(doc_id) AS min_doc,
           max(doc_id) AS max_doc
    FROM s GROUP BY shard_id
    """,
)
def pipeline_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment: deterministic, engine-independent
    16-way sharding by a content-independent hash (first 8 hex chars of
    md5 of the id), with per-shard size accounting — the output side of
    a data pipeline, where the final corpus is written as N balanced
    shards and the assignment must be reproducible across engines and
    reruns (unlike ``hash()``/``xxhash64`` whose values are
    engine-specific, or round-robin which depends on partition layout).
    One narrow projection + one aggregate; the production writer is
    ``df.withColumn("shard_id", ...).write.partitionBy("shard_id")`` —
    same expression, file layout instead of counts.
    """
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long")
        % 16
    ).alias("shard_id")
    return (
        d.select(shard, "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("shard_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "profile_table",
    extra=True,
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT lang) AS ndv_lang,
           count(DISTINCT source) AS ndv_source,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS null_text,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling (the ANALYZE/stats-collection analog): row count,
    per-column distinct counts, null counts, numeric min/max/sum in ONE
    aggregate pass. At 100 TB the exact ``count(DISTINCT ...)`` columns
    become ``approx_count_distinct`` (HLL, mergeable, map-side partial)
    with the same plan shape — exact here so the DuckDB oracle can
    hash-match.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("lang").alias("ndv_lang"),
        F.countDistinct("source").alias("ndv_source"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias(
            "null_text"
        ),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"),
    )


@query(
    "sample_quota",
    extra=True,
    oracle="""
    WITH h AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
               count(*) OVER (PARTITION BY lang) AS n_s
        FROM documents)
    SELECT doc_id, lang FROM h
    WHERE rn <= CAST(ceil(0.2 * n_s) AS BIGINT)
    """,
)
def sample_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: exactly ⌈20%⌉ of every lang
    stratum, chosen by ranking on a content-independent cross-engine
    hash (md5 of the id) — a deterministic, auditable mixture draw,
    unlike Bernoulli sampling which only hits the quota in expectation
    (and depends on partition layout — see sample_stratified). One
    window per stratum; the hash order is uniform, so the quota cut is
    an unbiased sample. At 100 TB the per-stratum count comes from the
    same window pass — no extra scan.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    hid = F.md5(F.col("doc_id").cast("string").cast("binary"))
    w = Window.partitionBy("lang").orderBy(hid, "doc_id")
    cw = Window.partitionBy("lang")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("n_s", F.count(F.lit(1)).over(cw))
        .filter(
            F.col("rn") <= F.ceil(F.lit(0.2) * F.col("n_s")).cast("long")
        )
        .select("doc_id", "lang")
    )


@query("sample_stratified", extra=True)  # seeded RNG → rows-only
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Bernoulli sampling with per-language fractions
    (df.sampleBy) — the mixture-weighting step of a training-data
    pipeline. Spark's seeded draw is partition-layout-specific, so the
    driver records rows-only; tests assert per-stratum proportions.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.sampleBy(
        "lang", {"en": 0.5, "es": 0.25, "de": 0.25, "zh": 0.1}, seed=42
    ).select("doc_id", "lang")


@query(
    "pipeline_chunk_overlap",
    extra=True,
    oracle=r"""
    WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
               FROM documents)
    SELECT doc_id,
           CAST(r['i'] AS BIGINT)                   AS chunk_idx,
           CAST(r['start'] AS BIGINT)               AS start_word,
           array_to_string(w[r['start']+1 : r['start']+64], ' ') AS chunk
    FROM (SELECT doc_id, w,
                 unnest(list_transform(range(0, greatest(len(w), 1), 48),
                        (s, i) -> {'i': i - 1, 'start': s})) AS r
          FROM d)
    """,
)
def pipeline_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunking: 64-word chunks on a 48-word
    stride (16-word overlap) — the RAG / long-context splitting variant
    of ``udtf_chunk`` (which is non-overlapping and exercises the UDTF
    path). Pure array expressions: one sequence of starts per doc, one
    slice per chunk, posexplode — an Expand-shaped per-row fan-out of
    ~len/stride rows with NO shuffle and no Python.

    Note the materialized word array: the slice lambda reads an
    attribute, not an inline split (HOF lambdas get no CSE —
    text.shingles_from_words, 17× measured).
    """
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("w") - 1, F.lit(0)),
        F.lit(48),
    )
    chunks = F.transform(
        starts, lambda s: F.struct(
            s.alias("start"),
            F.array_join(F.slice("w", s + 1, 64), " ").alias("chunk"),
        )
    )
    return w.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long"),
        F.col("c.start").cast("long").alias("start_word"),
        F.col("c.chunk").alias("chunk"),
    )


@query(
    "pipeline_curriculum",
    extra=True,
    oracle=r"""
    WITH f AS (
        SELECT doc_id,
            CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
            CAST(length(text) AS BIGINT)                               AS n_chars,
            CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
                                                                       AS alpha,
            CAST(len(regexp_extract_all(lower(text),
                 '\b(the|and|of|to|is|in)\b')) AS BIGINT)              AS s_en
        FROM documents),
    q AS (
        SELECT doc_id,
               CAST(round(((CAST(s_en AS DOUBLE) / NULLIF(n_words, 0)) * 0.5
                 + (CAST(alpha AS DOUBLE) / NULLIF(n_chars, 0)) * 0.5
                 + least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.5)
                 * 1000000) AS BIGINT) / 1000000.0 AS quality
        FROM f)
    SELECT doc_id, quality,
           CAST(row_number() OVER w AS BIGINT) AS curriculum_pos,
           ntile(10) OVER w AS decile,
           CASE WHEN ntile(10) OVER w <= 2 THEN 'warmup'
                WHEN ntile(10) OVER w >= 9 THEN 'anneal'
                ELSE 'main' END AS phase
    FROM q
    WINDOW w AS (ORDER BY quality DESC, doc_id)
    """,
)
def pipeline_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: rank the corpus by quality score (highest
    first, deterministic doc_id tiebreak) and assign training phases —
    top deciles feed the warmup epoch, the low-quality tail is held for
    the anneal phase (convention documented here; flip the CASE to
    taste). The quality expression is text_analysis's, rounded 1e-6
    BEFORE ranking so both engines rank identical keys.

    The global ORDER BY window is the honest cost: a total order needs
    a range-partitioned sort (Spark plans exactly that), and Spark
    warns "Moving all data to a single partition" on every run. This
    EXACT form is kept as the oracle point (ntile is directly
    SQL-comparable); the 100 TB path is
    :func:`pipeline_curriculum_scalable` below — quantile-cut deciles
    from a mergeable sketch, no global window, no curriculum_pos
    (which no trainer needs globally). Equivalence between the two
    forms' decile/phase labels is pytest-gated on the fixtures
    (tests/test_registry.py).
    """
    from pyspark.sql import Window

    from ..operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    quality6 = (
        F.round(tx.quality_score(F.col("text")) * 1000000, 0).cast("long")
        / F.lit(1000000.0)
    )
    q = d.select("doc_id", quality6.alias("quality"))
    w = Window.orderBy(F.col("quality").desc(), "doc_id")
    decile = F.ntile(10).over(w)
    return q.select(
        "doc_id",
        "quality",
        F.row_number().over(w).cast("long").alias("curriculum_pos"),
        decile.alias("decile"),
        F.when(decile <= 2, "warmup")
        .when(decile >= 9, "anneal")
        .otherwise("main")
        .alias("phase"),
    )


@query("pipeline_curriculum_scalable", extra=True)
def pipeline_curriculum_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phases at 100 TB: quantile-CUT deciles, no global
    window.

    The exact form above needs a total order (single-partition window —
    the one unpartitioned window in the repo NOT over a bounded input,
    SCALE.md §1). This is the documented scale alternative, now
    implemented: the 9 decile boundaries come from ONE
    ``approx_percentile`` aggregate — a Greenwald-Khanna mergeable
    sketch, so the pass is map-side combinable with bounded memory per
    task and a 9-value result, in place of a corpus-wide
    range-partitioned sort. The 1-row boundary array is broadcast and
    each doc's decile is a 9-comparison scan of it: decile(x) = 10 −
    #{boundaries STRICTLY < x} (boundaries ascend, decile 1 = top
    quality; the strict comparison puts each boundary element itself in
    the same bucket ntile gives it — with ``<=`` every boundary doc
    shifts one decile up, measured as exactly 9 label mismatches per
    fixture).
    ``curriculum_pos`` is deliberately absent — a global training
    position is the one column that inherently costs a total order,
    and shard-local order suffices for real loaders.

    Semantics vs the exact form: a VALUE cut, not a row-count split —
    docs tying a boundary value land in one decile together instead of
    being split by doc_id to even out counts. At accuracy=10000 the
    sketch is exact for the fixture sizes, so labels match the ntile
    form except on boundary ties; the equivalence is pytest-gated
    (tests/test_registry.py). Registered rows-only by construction:
    DuckDB's approx quantile is a different sketch (t-digest), so no
    cross-engine hash oracle can exist for an approximate cut.
    """
    from ..operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    quality6 = (
        F.round(tx.quality_score(F.col("text")) * 1000000, 0).cast("long")
        / F.lit(1000000.0)
    )
    q = d.select("doc_id", quality6.alias("quality"))
    cuts = q.agg(
        F.percentile_approx(
            "quality", [i / 10.0 for i in range(1, 10)], 10000
        ).alias("bs")
    )
    decile = (
        F.lit(10)
        - F.size(F.filter("bs", lambda b: b < F.col("quality")))
    ).cast("int")
    return (
        q.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "quality",
            decile.alias("decile"),
        )
        .withColumn(
            "phase",
            F.when(F.col("decile") <= 2, "warmup")
            .when(F.col("decile") >= 9, "anneal")
            .otherwise("main"),
        )
    )


@query(
    "mix_rebalance",
    extra=True,
    oracle="""
    WITH c AS (SELECT source, lang, count(*) AS n
               FROM documents GROUP BY source, lang),
    w AS (SELECT source, lang, n,
                 CAST(round(sqrt(n) * 1000000) AS BIGINT) AS w6
          FROM c),
    t AS (SELECT CAST(sum(w6) AS BIGINT) AS tot FROM w)
    SELECT source, lang, n,
           CAST(w6 AS DOUBLE) / 1000000.0 AS weight,
           CAST(CAST((1000000 * w6) // tot AS BIGINT) AS DOUBLE)
               / 1000000.0 AS share,
           CAST((100000 * w6) // tot AS BIGINT) AS target_rows,
           CAST(least(1000000,
                      (1000000 * CAST((100000 * w6) // tot AS BIGINT)) // n)
                AS DOUBLE) / 1000000.0 AS sample_rate
    FROM w CROSS JOIN t
    """,
)
def mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted data-mixture plan: given per-(source, lang)
    stratum counts, compute sampling weights ∝ n^τ with τ = 0.5, each
    stratum's share of a 100k-row target mix, and the per-stratum
    sampling rate that realizes it.

    This is the standard multilingual rebalancing step (τ < 1 upweights
    tail strata relative to their natural frequency); the output feeds
    ``sample_quota``-style exact draws per stratum. τ = 0.5 is sqrt —
    IEEE-correctly-rounded in every engine, so after ONE fixed-point
    rounding of sqrt(n) all downstream arithmetic (sum, shares, targets,
    rates) is pure BIGINT division: bit-identical cross-engine with no
    float-summation order sensitivity. For other τ, pow(n, τ) differs by
    ulps across libms — round it to 1e-6 first, as here.

    Scale shape: one hash agg over the corpus (the only full-data pass),
    then all planning math runs on the |strata| rows with the scalar
    total broadcast in — no shuffle wider than the stratum count.
    """
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n"))
    w = c.withColumn(
        "w6", F.round(F.sqrt("n") * 1000000, 0).cast("long")
    )
    tot = w.agg(F.sum("w6").alias("tot"))
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn("target_rows", F.expr("(100000 * w6) div tot"))
        .select(
            "source",
            "lang",
            "n",
            (F.col("w6").cast("double") / F.lit(1000000.0)).alias("weight"),
            (
                F.expr("(1000000 * w6) div tot").cast("double")
                / F.lit(1000000.0)
            ).alias("share"),
            "target_rows",
            (
                F.least(
                    F.lit(1000000).cast("long"),
                    F.expr("(1000000 * target_rows) div n"),
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("sample_rate"),
        )
    )


@query(
    "scalar_regex",
    extra=True,
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                  AS first_word,
           CAST(len(regexp_extract_all(text, 'ta[a-z]+')) AS BIGINT)
                                                                AS n_ta,
           regexp_matches(text, 'join.*join')                   AS double_join,
           length(regexp_replace(text, '[aeiou]', '', 'g'))     AS novowel_len
    FROM documents
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar functions: extract / extract-all count / rlike /
    global replace. Simple character-class + literal patterns only, so
    Java regex (Spark) and RE2 (DuckDB) agree by construction.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, r"([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(t, F.lit(r"ta[a-z]+"), 0))
        .cast("long")
        .alias("n_ta"),
        t.rlike("join.*join").alias("double_join"),
        F.length(F.regexp_replace(t, "[aeiou]", "")).alias("novowel_len"),
    )


@query(
    "sql_cte_window",
    extra=True,
    oracle="""
    WITH monthly AS (
        SELECT o_custkey,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
                   / 100.0 AS spend
        FROM orders GROUP BY o_custkey, date_trunc('month', o_orderdate)),
    ranked AS (
        SELECT o_custkey, month, spend,
               row_number() OVER (PARTITION BY month
                                  ORDER BY spend DESC, o_custkey) AS rnk
        FROM monthly)
    SELECT o_custkey, month, spend, rnk FROM ranked WHERE rnk <= 5
    """,
)
def sql_cte_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full SQL front door: chained CTEs + aggregate + ranking window
    (top-5 spenders per month), exactly as a SQL user would write it.
    """
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH monthly AS (
            SELECT o_custkey,
                   date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
                       AS month,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS spend
            FROM orders
            GROUP BY o_custkey, date_trunc('month',
                                           CAST(o_orderdate AS TIMESTAMP))),
        ranked AS (
            SELECT o_custkey, month, spend,
                   row_number() OVER (PARTITION BY month
                                      ORDER BY spend DESC, o_custkey) AS rnk
            FROM monthly)
        SELECT o_custkey, month, spend, rnk FROM ranked WHERE rnk <= 5
        """
    )
