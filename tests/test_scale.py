"""Scale-posture tests: the properties SCALE.md claims, asserted on
real plans — salting preserves join semantics, bucketed joins avoid
shuffles, partition pruning reaches the scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from durable_functions_cosmosdb_etl_spark.operators.skew import salted_join


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    # 90% of big rows share one hot key — the salting target.
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 50)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("dim")
    )
    plain = {(r.k, r.payload, r.dim) for r in big.join(small, ["k"]).collect()}
    salted = {
        (r.k, r.payload, r.dim)
        for r in salted_join(big, small, ["k"], n_salts=8).collect()
    }
    assert salted == plain and len(plain) == 2000


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.range(0, 100).select((F.col("id") % 60).alias("k"), "id")
    small = spark.range(0, 30).select(F.col("id").alias("k"), F.lit(1).alias("d"))
    plain = {(r.k, r.id, r.d) for r in big.join(small, ["k"], "left").collect()}
    salted = {
        (r.k, r.id, r.d)
        for r in salted_join(big, small, ["k"], n_salts=4, how="left").collect()
    }
    assert salted == plain


def test_salted_join_rejects_full_outer(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], how="full")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key removes the Exchange —
    the co-located-join strategy for repeated fact-fact joins at scale."""
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    for name, df in [("bkt_left", left), ("bkt_right", right)]:
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name)
    # hint forces SMJ (these tiny tables would broadcast otherwise);
    # the property under test is bucket co-location removing the Exchange
    joined = spark.table("bkt_left").hint("merge").join(
        spark.table("bkt_right"), "k"
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert joined.count() == 1000


def test_bucketed_inverted_index_join_exchange_free_and_equivalent(
    spark, sf_dir
):
    """persist_inverted_index writes the shingle index bucketed on g;
    jaccard_pairs_from_index's self-join then runs with NO exchange
    (bucket co-location) and produces byte-identical pairs to the
    inline path — the claim SCALE.md §2 makes for the 100 TB form."""
    from durable_functions_cosmosdb_etl_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_from_index,
        persist_inverted_index,
    )
    from durable_functions_cosmosdb_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    persist_inverted_index(docs, "inv_idx_test", n_buckets=8)
    from_idx = jaccard_pairs_from_index(spark, "inv_idx_test", threshold=0.5)

    # force the join path (tiny test tables would broadcast otherwise);
    # the property under test is bucket co-location removing the Exchange
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(
            jaccard_pairs_from_index(spark, "inv_idx_test", threshold=0.5)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    join_part = plan.split("HashAggregate")[-1]  # below the final aggs
    assert "SortMergeJoin" in join_part
    assert "Exchange hashpartitioning" not in join_part

    inline = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    bucketed = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in from_idx.collect()
    }
    assert inline == bucketed and len(inline) > 0


def test_centroid_assignment_has_no_exchange(spark):
    """assign_to_centroids is map-side: the codebook broadcasts as one
    array row and the argmax is a per-row reduction — the corpus is
    never shuffled (SCALE.md §2). Regression guard against reintroducing
    the window-argmax, whose exchange carried corpus × centroids rows."""
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        assign_to_centroids,
    )

    corpus = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            (F.col("id") % 11).cast("float"),
            (F.col("id") % 13).cast("float"),
        ).alias("embedding"),
    )
    # pre-built codebook isolates the ASSIGNMENT plan (fitting has its
    # own — tiny, centroid-sized — aggregation exchanges)
    cen = spark.createDataFrame(
        [(i + 1, [float(i), 1.0, 2.0]) for i in range(4)],
        "centroid_id int, centroid array<float>",
    )
    assigned = assign_to_centroids(corpus, cen)
    plan = _plan(assigned)
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    # every vector gets exactly one centroid
    assert assigned.count() == 200
    assert assigned.select("vec_id").distinct().count() == 200


def test_fused_topk_scorer_plan_shape(spark):
    """The fused Arrow scorer (brute_force_topk / ivf_topk default)
    must keep the scale-critical plan properties: the corpus is scored
    and batch-reduced in ONE Python stage with NO exchange before the
    final (tiny) rank window, and no join/cartesian enumerates
    query×corpus pair rows on the JVM side."""
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    em = spark.range(0, 500).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            (F.col("id") % 11).cast("float"),
            (F.col("id") % 13).cast("float"),
        ).alias("embedding"),
    )
    corpus, queries = em.filter("vec_id >= 5"), em.filter("vec_id < 5")
    for df in (
        brute_force_topk(corpus, queries, k=5),
        ivf_topk(corpus, queries, k=5, n_centroids=4, nprobe=2),
    ):
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "NestedLoopJoin" not in plan
        assert "SortMergeJoin" not in plan
        # exactly one Arrow pass does score+reduce; the only exchange
        # after it feeds the final rank window over ≤ |Q|·k rows/batch
        assert plan.count("MapInPandas") == 1


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """write.partitionBy + filter on the partition column → the scan
    lists only matching directories (PartitionFilters, not a full scan)."""
    path = str(tmp_path / "events_parted")
    df = spark.range(0, 300).select(
        F.col("id"),
        F.concat(F.lit("p"), (F.col("id") % 3).cast("string")).alias("part"),
    )
    df.write.partitionBy("part").mode("overwrite").parquet(path)
    rd = spark.read.parquet(path).filter(F.col("part") == "p1")
    plan = _plan(rd)
    assert "PartitionFilters" in plan and "p1" in plan
    assert rd.count() == 100
    # Input partitions actually pruned: only one of three dirs read.
    scanned = rd.select("id").rdd.getNumPartitions()
    full = spark.read.parquet(path).select("id").rdd.getNumPartitions()
    assert scanned <= full


def test_fan_out_repartitions_only_when_under(spark):
    from durable_functions_cosmosdb_etl_spark.operators.dedup import fan_out

    one = spark.range(0, 100).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    target = spark.sparkContext.defaultParallelism
    assert fan_out(one).rdd.getNumPartitions() == target
    assert fan_out(one, 4).rdd.getNumPartitions() == 4
    many = spark.range(0, 100, 1, target + 4)
    # already ≥ target: untouched (no shuffle added)
    assert fan_out(many).rdd.getNumPartitions() == target + 4


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join handling, demonstrated live: with skew thresholds
    lowered, a join against one hot key gets its oversized shuffle
    partition split (final adaptive plan marks the join skew=true)."""
    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        # the downstream count() agg means splitting adds a shuffle; force
        # tells AQE the split is worth it anyway (same call a production
        # job with known pathological keys would make)
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        # right is uniform (200 rows/key) — skew lives on the left only,
        # so the hot partition is big without a quadratic join blowup
        right = spark.range(0, 200_000).select(
            (F.col("id") % 1000).alias("k"),
            F.sha2((F.col("id") + 1).cast("string"), 256).alias("pad2"),
        )
        joined = left.join(right, "k").select(F.count(F.lit(1)).alias("n"))
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_approx_aggregates_within_error_bounds(spark, sf_dir):
    """Sketch-based aggregates stay within their documented error vs the
    exact answers: approx_count_distinct (HLL++, rsd=0.05 default) and
    approx_percentile (KLL-ish, accuracy=10000)."""
    from durable_functions_cosmosdb_etl_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    exact_n = o.select(F.countDistinct("o_custkey")).first()[0]
    approx_n = o.select(F.approx_count_distinct("o_custkey")).first()[0]
    assert abs(approx_n - exact_n) <= 0.15 * exact_n  # 3×rsd margin

    exact_p50 = o.select(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p")
    ).first()[0]
    approx_p50 = o.select(
        F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000)).alias("p")
    ).first()[0]
    # rank error ≤ n/accuracy ⇒ value within a few percent on this data
    assert abs(approx_p50 - exact_p50) <= 0.05 * exact_p50


def test_cluster_conf_shape():
    """cluster_conf is pure data a submit wrapper applies: every value a
    string (spark-submit form), partition math tracks its inputs."""
    from durable_functions_cosmosdb_etl_spark.session import cluster_conf

    c = cluster_conf(total_cores=1000, target_partition_mb=256)
    assert all(isinstance(v, str) for v in c.values())
    assert c["spark.sql.shuffle.partitions"] == "3000"
    assert c["spark.sql.files.maxPartitionBytes"] == str(256 * 1024 * 1024)
    assert c["spark.sql.adaptive.enabled"] == "true"


def test_composed_dedup_pipeline_on_bucketed_index(spark, sf_dir):
    """VERDICT r3 item: the composed pipeline (dedup_components /
    pipeline_dedup_full) can run off the pre-bucketed inverted index —
    pair generation is then shingle-free and exchange-free on the index
    self-join, and NO .cache() (no InMemoryTableScan) appears anywhere
    in the composition. Output identical to the inline path."""
    from durable_functions_cosmosdb_etl_spark.operators.dedup import (
        persist_inverted_index,
    )
    from durable_functions_cosmosdb_etl_spark.plans.llm_ops import (
        dedup_components,
        pipeline_dedup_full,
    )
    from durable_functions_cosmosdb_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    persist_inverted_index(docs, "inv_idx_composed", n_buckets=8)

    # --- equivalence: indexed path == inline path, both compositions
    base_cc = {
        (r["doc"], r["component"])
        for r in dedup_components(spark, sf_dir).collect()
    }
    idx_cc = {
        (r["doc"], r["component"])
        for r in dedup_components(
            spark, sf_dir, index_table="inv_idx_composed"
        ).collect()
    }
    assert idx_cc == base_cc and len(idx_cc) > 0

    base_full = {
        (r["doc_id"], r["final_keeper"], r["is_kept"])
        for r in pipeline_dedup_full(spark, sf_dir).collect()
    }
    idx_full = {
        (r["doc_id"], r["final_keeper"], r["is_kept"])
        for r in pipeline_dedup_full(
            spark, sf_dir, index_table="inv_idx_composed"
        ).collect()
    }
    assert idx_full == base_full and len(idx_full) > 0

    # --- plan shape: the indexed pair generator (exactly what the
    # composition materializes into its checkpoint) has no cache scan
    # and no exchange on the index self-join
    from durable_functions_cosmosdb_etl_spark.operators.dedup import (
        jaccard_pairs_from_index,
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        keepers = docs.select(F.col("doc_id").alias("doc"))
        plan = _plan(
            jaccard_pairs_from_index(
                spark, "inv_idx_composed", threshold=0.5, docs_filter=keepers
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "InMemoryTableScan" not in plan
    join_part = plan.split("HashAggregate")[-1]
    assert "SortMergeJoin" in join_part
    assert "Exchange hashpartitioning" not in join_part


def test_stop_shingle_skew_candidates_stay_linear(spark):
    """Adversarial skew probe (VERDICT r3 item 6): one stop-phrase in
    50% of docs makes the raw inverted-index self-join quadratic in the
    sharing set (4 stop shingles × C(200,2) pairs here); max_shingle_df
    drops those index rows BEFORE the join, and the surviving verified
    pairs remain the documented superset-filter semantics."""
    from durable_functions_cosmosdb_etl_spark.operators.dedup import (
        _shingled,
        jaccard_pairs,
    )

    rows = []
    for i in range(400):
        base = f"unique tokens d{i} x{i} y{i} z{i} w{i} v{i} u{i} t{i}"
        if i % 2 == 0:
            base = "the quick brown fox jumps over " + base
        rows.append((i, base))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    ex = _shingled(docs, "doc_id", "text", 3).select(
        "doc", "n_sh", F.explode("sh").alias("g")
    )

    def n_candidates(e):
        a, b = e.alias("a"), e.alias("b")
        return a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc") < F.col("b.doc")),
        ).count()

    raw = n_candidates(ex)
    keep = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("dfg"))
        .filter("dfg <= 20")
        .select("g")
    )
    capped = n_candidates(ex.join(F.broadcast(keep), "g"))
    # quadratic blowup uncapped (~119k), linear bound capped: each
    # surviving shingle contributes at most C(20,2) pairs
    assert raw > 100_000
    assert capped <= 20 * 400  # << raw; here exactly 0
    # semantics: capped pairs are a subset of exact pairs
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, threshold=0.5).collect()
    }
    sub = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(
            docs, threshold=0.5, max_shingle_df=20
        ).collect()
    }
    assert sub <= exact


def test_aqe_skew_split_fires_on_skewed_band_join(spark):
    """AQE's runtime skew-join split is the engine-level backstop when a
    hot band/bucket key slips past the static caps: with skew
    thresholds scaled down to test size, the skewed self-join's final
    adaptive plan carries the skew=true marker (partition split), with
    no hand-salting."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "8KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        # one band hash carries 2000 docs, the rest are singletons
        rows = [(i, 0 if i < 2000 else i) for i in range(4000)]
        df = spark.createDataFrame(rows, "doc long, band long")
        a, b = df.alias("a"), df.alias("b")
        j = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select((F.col("a.doc") % 997).alias("m"))
            .filter("m = 0")
        )
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_collapse_paths_no_cartesian(spark):
    """Every identical-content collapse path (forced on) keeps the
    linear equi-join shape: no CartesianProduct / BroadcastNestedLoopJoin
    anywhere in the physical plan — the membership-expansion joins are
    all keyed on the representative."""
    from durable_functions_cosmosdb_etl_spark.operators import dedup as dd
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        cosine_pairs_lsh,
    )

    docs = spark.createDataFrame(
        [(i, f"some words repeated here {i % 5} tail tokens") for i in range(40)],
        "doc_id long, text string",
    )
    vecs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 2.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    frames = [
        dd.jaccard_pairs(docs, n=2, threshold=0.4, collapse_identical=True),
        dd.minhash_lsh_pairs(
            docs, n=2, threshold=0.4, collapse_identical=True
        ),
        dd.simhash_pairs(docs, n=2, collapse_identical=True),
        dd.substring_pairs(docs, k=8, collapse_identical=True),
        cosine_pairs_lsh(vecs, threshold=0.9, collapse_identical=True),
    ]
    for df in frames:
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
