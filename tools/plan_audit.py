"""Physical-plan audit: assert the plan properties that matter at
100 TB and write the evidence to PLANS.md.

Checks per headline query:
- filter/projection pushdown reaches the Parquet scan (PushedFilters /
  ReadSchema narrower than the table);
- small dims are broadcast (BroadcastHashJoin), fact-fact joins shuffle
  (SortMergeJoin/ShuffledHashJoin) — and no accidental CartesianProduct;
- whole-stage codegen covers the hot expressions;
- AQE is enabled (AdaptiveSparkPlan root).

Run: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

# queries where a nested-loop join is the intended plan (tiny broadcast side)
NESTED_LOOP_OK = {
    "cosine_topk",
    "hard_negatives_topk",  # same 3-row broadcast query-side cross-join
    "retrieval_eval_report",  # id. (score_query_pairs under the eval)
    "funnel_conversion_report",  # 1-row first-stage count cross-joined in
    "range_join_buckets",
    "ann_ivf_topk",  # centroid table (n_centroids rows) cross-joined by design
    "semantic_dedup",  # same centroid cross-join inside ivf_assign
    "knn_graph",  # same tiny centroid cross-join; the corpus-x-corpus
    # candidate join itself is a shuffle equi-join on centroid_id
    "mmr_diverse_topk",  # broadcast query table (3 rows) cross-joined by design
    "tfidf_top_terms",  # corpus size N: a 1-row aggregate cross-joined in
    "unigram_logprob",  # corpus token total: same 1-row aggregate cross-join
    "mixing_temperature",  # 1-row normalizer aggregate cross-joined in
    "dsir_logratio",  # 1-row vocab-totals aggregate cross-joined in
    "lsh_recall_audit",  # two 1-row counts cross-joined into the audit row
    "approx_distinct",  # two 1-row aggregates cross-joined (the split
    # that avoids the Expand-into-single-split plan; see analytics.py)
    "quantized_rerank_topk",  # 64-row per-dim stats table cross-joined
    # into the quantizer (same pattern as embedding_quantize_audit)
    "validate_block_report",  # the 1-row per-check aggregates cross-
    # joined into the single report row
    "mixing_apply",  # the 1-row normalizer cross-join inside
    # mixing_temperature (the quota join itself is a BroadcastHashJoin)
    "vocab_coverage",  # 1-row totals cross-joined into the k rows
    "trained_quality_gate",  # 1-row calibrated-threshold aggregate
    # cross-joined into the verdict rows (broadcast by construction)
    "domain_pagerank",  # per-iteration 1-row dangling-mass broadcast cross-join
    "weighted_sample_exact",  # the 1-row total-weight aggregate broadcast
    # cross-joined into every row (ext/sampling.py:weighted_systematic_sample)
    "cms_heavy_hitters",  # 1-row stream-total aggregate cross-joined
    # into the threshold scan (the sketch/count tables join by key)
    "bm25_topk",  # 1-row corpus-stats aggregate (N, total_len)
    # broadcast cross-joined into the contribution expression
    "hybrid_rrf_topk",  # inherits bm25's 1-row stats cross-join plus
    # the dense retriever's broadcast 3-row query-vector cross-join
    "mg_heavy_verdict",  # 1-row stream-total + 1-row merge-threshold
    # aggregates broadcast cross-joined into the verdict row
    "collocation_pmi_topn",  # 1-row unigram/bigram totals broadcast
    # cross-joined into the scalar PMI expression
}

AUDIT = [
    "project_select",
    "filter_range",
    "filter_in_set",
    "semi_join_related",
    "join_inner_eq",
    "join_left_dim",
    "flagship_revenue_by_nation",
    "groupby_sum",
    "topk_orderby_limit",
    "window_rownum_dedup",
    "decode_fixedwidth",
    "decode_dynamic_abi",
    "borsh_decode_fixed",
    "glaciers_decode",
    "trace_query_model",
    "ngram_jaccard_pairs",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "embed_neardup_pairs",
    "repetition_stats",
    "chunk_dedup",
    "stratified_sample_lang",
    "pii_scrub_docs",
    "ann_lsh_topk",
    "deterministic_split",
    "decontaminate_overlap",
    "token_freq_topn",
    "cosine_topk",
    "ann_ivf_topk",
    "range_join_buckets",
    "session_window_agg",
    "session_window_native",
    "asof_join_latest_order",
    "sequence_pack",
    "media_decode_features",
    "media_frame_sample",
    "mixing_order",
    "doc_length_percentiles",
    "cluster_keep_best",
    "embedding_quantize_audit",
    "tfidf_top_terms",
    "delta_dedup_verdicts",
    "posting_skew_stats",
    "band_bucket_stats",
    "corpus_report",
    "label_centroid_profile",
    "semantic_lexical_agreement",
    "unigram_logprob",
    "bigram_logprob",
    "gopher_filter",
    "semantic_dedup",
    "mmr_diverse_topk",
    "cdc_chunk_dedup",
    "jaccard_topk",
    "mixing_temperature",
    "media_phash_dedup",
    # round-6 additions
    "delta_dedup_minhash_verdicts",
    "semdedup_cluster_stats",
    "dsir_logratio",
    "chunk_dedup_rewrite",
    "lsh_recall_audit",
    "doc_novelty",
    # round-7 additions
    "cdc_chunk_rewrite",
    "quantized_rerank_topk",
    "approx_distinct",
    "budget_select_topq",
    "budget_select_by_lang",
    "approx_percentile_verdict",
    "svm_decode_logs",
    "include_all_blocks_scan",
    "join_block_data_step",
    "validate_block_report",
    "training_shards",
    "classifier_quality_gate",
    "knn_graph",
    "pack_chunk_spans",
    "mixing_apply",
    "split_to_chunks",
    "vocab_coverage",
    # round-8 additions
    "dataset_erc20_transfers",
    "dataset_address_appearances",
    "url_dedup_canonical",
    "domain_stats_report",
    "html_extract_text",
    "bloom_membership_gate",
    "bloom_fp_report",
    "zorder_curve_key",
    "domain_pagerank",
    # round-8 continuation additions
    "cms_freq_report",
    "cms_heavy_hitters",
    "domain_cap_sample",
    "bm25_topk",
    "fuzzy_record_linkage",
    "hybrid_rrf_topk",
    "mg_heavy_verdict",
    "collocation_pmi_topn",
    # round-8 second continuation additions
    "resample_gapfill",
    "rolling_resampled_stats",
    "corpus_diff_report",
    "corpus_reprocess_manifest",
    "phrase_search_topk",
    "hard_negatives_topk",
    "profile_table_report",
    "retrieval_eval_report",
    "funnel_conversion_report",
    "cohort_retention_matrix",
    "domain_blocklist_filter",
    "event_spike_report",
    "weighted_sample_exact",
    # round-9 additions
    "trained_quality_gate",
    "repeated_substring_spans",
]


def audit_one(spark, name: str, sf_dir: str) -> tuple[list[str], list[str]]:
    """Returns (facts, problems)."""
    from cherry_spark.catalog import REGISTRY

    df = REGISTRY[name].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # codegen spans are only visible on a non-adaptive plan (AQE defers
    # stage compilation to runtime). Build the DF first — query fns call
    # ensure_runtime_confs which re-enables AQE — THEN flip the conf so
    # the physical plan materializes without AQE.
    noaqe_df = REGISTRY[name].fn(spark, sf_dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        noaqe_plan = noaqe_df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    has_codegen = "*(" in noaqe_plan
    facts, problems = [], []

    if "AdaptiveSparkPlan" in plan:
        facts.append("AQE root")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nonempty = [p for p in pushed if p.strip()]
    if nonempty:
        facts.append(f"pushed filters: {len(nonempty)} scan(s)")
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if read_schemas:
        widths = [len(s.split(",")) for s in read_schemas]
        facts.append(f"scan column widths: {widths}")
    n_bhj = plan.count("BroadcastHashJoin")
    n_smj = plan.count("SortMergeJoin")
    n_shj = plan.count("ShuffledHashJoin")
    if n_bhj or n_smj or n_shj:
        facts.append(f"joins: broadcast={n_bhj} sortmerge={n_smj} shuffledhash={n_shj}")
    if "TakeOrderedAndProject" in plan:
        facts.append("top-k as TakeOrderedAndProject (no global sort)")
    n_exch = plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")
    facts.append(f"exchanges: {n_exch}")
    if "CartesianProduct" in plan:
        problems.append("CartesianProduct in plan")
    if "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
        problems.append("unexpected BroadcastNestedLoopJoin")
    if has_codegen:
        stage_ids = set(re.findall(r"[*]\((\d+)\)", noaqe_plan))
        facts.append(f"codegen stages: {len(stage_ids)}")
    else:
        problems.append("no WholeStageCodegen span")
    return facts, problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import cherry_spark.queries  # noqa: F401
    from cherry_spark.session import get_spark

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — physical-plan audit",
        "",
        f"Generated by tools/plan_audit.py at {sf_dir}. Checks: pushdown",
        "reaches scans, dims broadcast, no accidental cartesian/nested-loop",
        "joins, whole-stage codegen, AQE.",
        "",
    ]
    any_problem = False
    for name in AUDIT:
        facts, problems = audit_one(spark, name, sf_dir)
        status = "OK" if not problems else "PROBLEM"
        any_problem |= bool(problems)
        print(f"[{status}] {name}: {'; '.join(facts)}")
        for p in problems:
            print(f"    !! {p}")
        lines.append(f"## {name} — {status}")
        lines.extend(f"- {f}" for f in facts)
        lines.extend(f"- **PROBLEM: {p}**" for p in problems)
        lines.append("")

    with open(os.path.join(_REPO_DIR, "PLANS.md"), "w") as fh:
        fh.write("\n".join(lines))
    print(f"\nwrote PLANS.md ({'problems found' if any_problem else 'all OK'})")
    return 1 if any_problem else 0


if __name__ == "__main__":
    raise SystemExit(main())
