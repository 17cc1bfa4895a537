"""Registry stability: the driver checks (empirically) the first ~50
registered queries, and registration order follows import order — so an
accidental import reshuffle or tier leak would silently change what the
driver verifies. Freeze the driver-facing surface explicitly."""

from __future__ import annotations

PRIMARY_50 = {
    "agg_grouping", "agg_pivot", "agg_stats", "array_agg_fns",
    "dedup_components", "dedup_contamination", "dedup_embedding",
    "dedup_exact", "dedup_jaccard", "dedup_jaccard_capped",
    "dedup_minhash", "dedup_simhash", "dedup_substring", "etl_transform",
    "filter_project", "join_asof", "join_broadcast_dims",
    "join_inner_revenue", "join_left_counts", "join_outer_cross",
    "join_range_bands", "join_semi_anti", "join_sixway_revenue",
    "json_extract", "map_fns", "multimodal_decode", "multimodal_frames",
    "multimodal_meta", "pipeline_llm_prep", "pipeline_pack",
    "pricing_summary", "sample_systematic", "scalar_date", "scalar_math",
    "scalar_string", "set_ops", "similarity_ivf", "similarity_topk",
    "sql_front_door", "text_analysis",
    "text_tfidf", "text_token_stats", "topk_per_group", "udaf_mode",
    "udf_pandas_norm", "udtf_chunk", "window_fns", "window_running",
    "window_session", "window_tumbling_sliding",
}


def test_primary_registry_is_frozen():
    import __spark_entry__ as m

    got = set(m.queries())
    assert got == PRIMARY_50, (
        f"driver-facing registry drifted: +{sorted(got - PRIMARY_50)} "
        f"-{sorted(PRIMARY_50 - got)}"
    )
    assert len(m.queries()) <= 50, "primary tier exceeds the driver window"


def test_every_primary_query_has_an_oracle():
    import __spark_entry__ as m

    assert set(m.oracle_sql()) == set(m.queries())


def test_extras_all_mapped_to_primary_coverage():
    import __spark_entry__  # noqa: F401 — populate the registries

    from durable_functions_cosmosdb_etl_spark.plans import registry as R
    from tools.gen_queries_md import COVERED_BY

    assert set(COVERED_BY) == set(R.EXTRA_QUERIES)
    assert set(COVERED_BY.values()) <= set(R.QUERIES)


def test_curriculum_scalable_matches_exact_form(spark, sf_dir):
    """The quantile-cut curriculum (no global window) must label every
    fixture doc identically to the exact ntile form — the strict-<
    boundary comparison puts each boundary element in its ntile bucket
    (with <= all 9 boundary docs shift one decile up). Divergence is
    only possible on boundary-VALUE ties, absent from the fixtures."""
    import __spark_entry__  # noqa: F401 — populate the registries

    from durable_functions_cosmosdb_etl_spark.plans import registry as R

    exact = {
        r["doc_id"]: (r["decile"], r["phase"])
        for r in R.EXTRA_QUERIES["pipeline_curriculum"](spark, sf_dir).collect()
    }
    scalable_df = R.EXTRA_QUERIES["pipeline_curriculum_scalable"](spark, sf_dir)
    scal = {
        r["doc_id"]: (r["decile"], r["phase"]) for r in scalable_df.collect()
    }
    assert scal == exact
    # scale-path plan shape: NO window operator anywhere (the exact
    # form's single-partition sort is the thing this variant removes)
    plan = scalable_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
