"""Import all query modules so their ``@query`` registrations run.

Registration order IS the driver's certification order: the correctness
gate writes at most 50 rows taken in registry order.  After the module
imports below, ``_reorder_for_certification`` rebuilds the registry dict
for the ROUND-16 window (_R13_REMAINING_R16 + _R14_FIRST1_R16).

Standing rotation policy (round-7 verdict item #2): the registry holds
115 queries and the driver window holds 50, so a strict "no query more
than one round stale" cadence is arithmetically impossible (2 x 50 <
115).  The guarantee is now **every registered query gets a driver row
at least once every THREE rounds**, enforced mechanically:

  round N   : [queries never driver-certified] + [oldest-stale rows]
  round N+1 : [new since N's freeze] + [remaining oldest-stale rows] +
              [rows certified in N-1]
  round N+2 : sweeps whatever is left of the N-1/N sets

``verify_local`` still hash-checks ALL registered queries against their
DuckDB oracles every round regardless of the window, so "past the
window" never means "unverified" — only "not yet in a driver artifact".
``decode_dynamic_abi_arrow`` stays verify_local-only by policy: it
shares its oracle and result-hash with in-window ``decode_dynamic_abi``
and differs only in the Arrow execution lane (a driver row for it would
duplicate an existing hash check while displacing a unique one).

ROUND-16 window (live): ``_R13_REMAINING_R16`` (49, the r13-window
rows not swept in r15, in archived-artifact order) +
``_R14_FIRST1_R16`` (1, the oldest row of the archived r14 artifact)
= 50 exactly, asserted at import (rounds 6 AND 7 each shipped a silent
hand-recount bug — every group here is pinned or DERIVED data, and the
window tests re-derive them from the archived driver artifacts).  This
sweep re-certifies the r13 cohort — the decode/dataset lanes, the
dedup-cluster family and the curation rows — whose last driver rows
predate the r14 bus/IVF changes and the r15 store work.  Every
r16-window row has a DuckDB oracle — no rows-only query sits inside
the window.

ROUND-17 window (pre-staged below as ``_R14_REMAINING_R17`` +
``_R15_FIRST1_R17`` = 49 + 1 = 50): at round-17 start, swap the group
tuple — nothing to recount.

At 150 registered the 3-round guarantee is EXACTLY saturated
(3 x 50 = 150): any further registration must displace a named twin
to verify_local-only — see the pruning policy below.  The permanent
rows-only queries sit last where they don't burn hash-check slots.
"""

from cherry_spark.catalog import REGISTRY

import cherry_spark.queries.relational  # noqa: F401,E402
import cherry_spark.queries.steps  # noqa: F401,E402
import cherry_spark.queries.analytics  # noqa: F401,E402
import cherry_spark.queries.curation  # noqa: F401,E402
import cherry_spark.queries.multimodal  # noqa: F401,E402
import cherry_spark.queries.extensions  # noqa: F401,E402
import cherry_spark.queries.web  # noqa: F401,E402
import cherry_spark.queries.membership  # noqa: F401,E402
import cherry_spark.queries.vocab  # noqa: F401,E402
import cherry_spark.queries.sketch  # noqa: F401,E402
import cherry_spark.queries.linkage  # noqa: F401,E402
import cherry_spark.queries.timeseries  # noqa: F401,E402
import cherry_spark.queries.versioning  # noqa: F401,E402
import cherry_spark.queries.profile  # noqa: F401,E402
import cherry_spark.queries.ireval  # noqa: F401,E402

# The 14 queries registered after the round-7 window froze — every one
# is verify_local-green but has never had a driver-certified row.
_NEVER_CERTIFIED = [
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
]

# 36 of the 50 r06-certified rows.  Dedup/store/ANN family first: their
# serving paths changed in round 7 (signature + pair-graph stores) and
# lsh_recall_audit's default profile changes THIS round, so their
# driver signal is the most valuable to refresh.
_R06_STALE_R08 = [
    "exact_dedup_docs", "minhash_lsh_dedup", "simhash_dedup",
    "ngram_jaccard_pairs", "dedup_clusters", "dedup_clusters_star",
    "cluster_keep_best", "delta_dedup_verdicts",
    "delta_dedup_minhash_verdicts", "band_bucket_stats",
    "posting_skew_stats", "lsh_recall_audit", "doc_novelty",
    "jaccard_topk", "decontaminate_overlap", "chunk_dedup",
    "chunk_dedup_rewrite", "cdc_chunk_dedup",
    # embedding/ANN family (IVF store + semdedup checkpoint discipline)
    "ann_ivf_topk", "semantic_dedup", "semdedup_cluster_stats",
    "embed_neardup_pairs", "mmr_diverse_topk",
    "semantic_lexical_agreement", "label_centroid_profile",
    # text family (doc_fingerprint rewritten r7; siblings share tokenizer)
    "doc_fingerprint", "text_stats", "token_count", "lang_id",
    "quality_score", "token_freq_topn", "tfidf_top_terms",
    "corpus_report", "deterministic_split",
    # multimodal certified (fake-codec) lane
    "media_decode_features", "media_phash_dedup",
]

# The remaining 14 r06 rows — front of the ROUND-9 window (stable
# quality/mixing/sampling families, code untouched since their r06
# certification).  Kept here so the r09 reorder is mechanical.
_R06_STALE_R09 = [
    "gopher_filter", "unigram_logprob", "bigram_logprob",
    "dsir_logratio", "repetition_stats", "mixing_temperature",
    "mixing_order", "stratified_sample_lang", "pii_scrub_docs",
    "sequence_pack", "doc_length_percentiles", "null_group_agg",
    "asof_join_latest_order", "media_frame_sample",
]

# The 33 queries registered DURING round 8 (after the r08 window above
# froze) — none can have a driver row before round 9.  This is the
# round-9 window's leading group, pinned as data so the r09 reorder is
# a mechanical swap (lead with _ADDED_R08, then _R06_STALE_R09, then
# the first 3 r07-window rows: 33 + 14 + 3 = 50) instead of a
# hand-recount (the error class that slipped in rounds 6 AND 7).
_ADDED_R08 = [
    "dataset_erc20_transfers",
    "dataset_address_appearances",
    "zorder_curve_key",
    "weighted_sample_exact",
    "bm25_topk",
    "hybrid_rrf_topk",
    "leakage_safe_split",
    "collocation_pmi_topn",
    "phrase_search_topk",
    "hard_negatives_topk",
    "url_dedup_canonical",
    "domain_stats_report",
    "html_extract_text",
    "domain_pagerank",
    "domain_cap_sample",
    "domain_blocklist_filter",
    "bloom_membership_gate",
    "bloom_fp_report",
    "bpe_learn_merges",
    "bpe_tokenize_stats",
    "cms_freq_report",
    "cms_heavy_hitters",
    "mg_heavy_verdict",
    "fuzzy_record_linkage",
    "resample_gapfill",
    "rolling_resampled_stats",
    "funnel_conversion_report",
    "cohort_retention_matrix",
    "event_spike_report",
    "corpus_diff_report",
    "corpus_reprocess_manifest",
    "profile_table_report",
    "retrieval_eval_report",
]

_PAST_WINDOW_FIRST = [
    # oracle twin of in-window decode_dynamic_abi (Arrow lane only);
    # verify_local-only by policy — see module docstring
    "decode_dynamic_abi_arrow",
]

# Queries registered DURING round 9 (after the r09 window froze) —
# pinned as data the moment they are registered (the _ADDED_R08
# discipline).  They certify in ROUND 11 (within the 3-round window).
_ADDED_R09 = [
    "trained_quality_gate",
    "repeated_substring_spans",
]

# ---------------------------------------------------------------------
# ROUND-10 window, ARCHIVED (was live in r10; kept as pinned data the
# r12 plan and the window tests derive from):
# 47 r07 rows (CORRECTNESS_r07.json order minus _R07_FIRST3) + the
# first 3 rows of the archived r08 artifact = 50.
# ---------------------------------------------------------------------
_R07_REMAINING_R10 = [
    "ann_lsh_topk", "flagship_revenue_by_nation", "u256_sum",
    "funnel_conversion", "embedding_quantize_audit", "decode_fixedwidth",
    "decode_dynamic_abi", "borsh_decode_fixed", "glaciers_decode",
    "u256_binary_roundtrip", "hex_encode", "base58_encode",
    "cast_by_name", "cast_by_type", "set_constant_col", "project_select",
    "filter_range", "filter_in_set", "filter_prefix", "semi_join_related",
    "trace_query_model", "join_inner_eq", "join_composite_key",
    "join_left_dim", "json_extract", "agg_min_max", "agg_resume_cursor",
    "agg_count_distinct", "groupby_sum", "groupby_multi", "distinct_rows",
    "rollup_agg", "cube_agg", "pivot_status_counts", "topk_orderby_limit",
    "union_all_batches", "intersect_keys", "except_keys",
    "window_rownum_dedup", "window_tumbling_agg", "session_window_agg",
    "session_window_native", "sql_step", "udf_transform_step",
    "range_join_buckets", "retention_cohorts", "cosine_topk",
]
_R08_FIRST3_R10 = [
    "budget_select_topq",
    "budget_select_by_lang",
    "approx_percentile_verdict",
]

# ---------------------------------------------------------------------
# ROUND-11 window, LIVE: `_reorder_for_certification` leads with
# `(_R08_REMAINING_R11, _ADDED_R09, _R09_FIRST1_R11)`.
# 47 r08 rows (CORRECTNESS_r08.json order minus _R08_FIRST3_R10) +
# _ADDED_R09 (2) + the first row of the archived r09 artifact = 50.
# tests/test_registry_window.py re-derives the groups from the
# artifacts.
# ---------------------------------------------------------------------
_R08_REMAINING_R11 = [
    "svm_decode_logs", "include_all_blocks_scan", "join_block_data_step",
    "validate_block_report", "training_shards", "classifier_quality_gate",
    "knn_graph", "pack_chunk_spans", "mixing_apply", "split_to_chunks",
    "vocab_coverage", "exact_dedup_docs", "minhash_lsh_dedup",
    "simhash_dedup", "ngram_jaccard_pairs", "dedup_clusters",
    "dedup_clusters_star", "cluster_keep_best", "delta_dedup_verdicts",
    "delta_dedup_minhash_verdicts", "band_bucket_stats",
    "posting_skew_stats", "lsh_recall_audit", "doc_novelty",
    "jaccard_topk", "decontaminate_overlap", "chunk_dedup",
    "chunk_dedup_rewrite", "cdc_chunk_dedup", "ann_ivf_topk",
    "semantic_dedup", "semdedup_cluster_stats", "embed_neardup_pairs",
    "mmr_diverse_topk", "semantic_lexical_agreement",
    "label_centroid_profile", "doc_fingerprint", "text_stats",
    "token_count", "lang_id", "quality_score", "token_freq_topn",
    "tfidf_top_terms", "corpus_report", "deterministic_split",
    "media_decode_features", "media_phash_dedup",
]
_R09_FIRST1_R11 = [
    "dataset_erc20_transfers",
]


# The first 3 rows of the archived ROUND-7 driver window
# (CORRECTNESS_r07.json key order) — they close the r09 window to
# exactly 50.  Pinned as data (tests/test_registry_window.py re-derives
# them from the artifact) so the r10 plan "remaining 47 r07 rows" has
# an unambiguous complement.
_R07_FIRST3 = [
    "cdc_chunk_rewrite",
    "quantized_rerank_topk",
    "approx_distinct",
]

# ---------------------------------------------------------------------
# ROUND-12 window, LIVE: `_reorder_for_certification` leads with
# `(_R09_REMAINING_R12, _R10_FIRST1_R12)`.
# The 49 r09-window rows not swept in r11 + the oldest r10-window row
# (49 + 1 = 50).  Both groups are DERIVED from already-pinned data
# (the archived r09 window is _ADDED_R08 + _R06_STALE_R09 + _R07_FIRST3
# in artifact order, pinned and test-verified), so there is no
# hand-recount surface.  This sweep gives the BPE rows (oracle-backed
# since r10) their first hash-green driver rows.
# ---------------------------------------------------------------------
_R09_REMAINING_R12 = [
    n
    for n in (_ADDED_R08 + _R06_STALE_R09 + _R07_FIRST3)
    if n not in set(_R09_FIRST1_R11)
]
_R10_FIRST1_R12 = [
    "ann_lsh_topk",
]

# ---------------------------------------------------------------------
# ROUND-13 window, LIVE: `_reorder_for_certification` leads with
# `(_R10_REMAINING_R13, _R11_FIRST1_R13)`.
# The 49 r10-window rows not swept in r12 + the oldest r11-window row
# (49 + 1 = 50).  Both groups are DERIVED from already-pinned data
# (the archived r10 window is _R07_REMAINING_R10 + _R08_FIRST3_R10 in
# artifact order, pinned and test-verified against the artifact), so
# there is no hand-recount surface.
# ---------------------------------------------------------------------
_R10_REMAINING_R13 = [
    n
    for n in (_R07_REMAINING_R10 + _R08_FIRST3_R10)
    if n not in set(_R10_FIRST1_R12)
]
_R11_FIRST1_R13 = [
    "svm_decode_logs",
]

# ---------------------------------------------------------------------
# ROUND-14 window, ARCHIVED (was live in r14; pinned by
# tests/test_registry_window.py against CORRECTNESS_r14.json).
# The 49 r11-window rows not swept in r13 + the oldest r12-window row
# (49 + 1 = 50).  Both groups are DERIVED from already-pinned data
# (the archived r11 window is _R08_REMAINING_R11 + _ADDED_R09 +
# _R09_FIRST1_R11 in artifact order, pinned and test-verified), so
# there is no hand-recount surface.
# ---------------------------------------------------------------------
_R11_REMAINING_R14 = [
    n
    for n in (_R08_REMAINING_R11 + _ADDED_R09 + _R09_FIRST1_R11)
    if n not in set(_R11_FIRST1_R13)
]
_R12_FIRST1_R14 = [
    "dataset_address_appearances",
]

# ---------------------------------------------------------------------
# ROUND-15 window, ARCHIVED (the r17 pre-stage derives from it).  The
# 49 r12-window rows not swept in r14 + the oldest r13-window row
# (49 + 1 = 50).  Both groups are DERIVED from already-pinned data
# (the archived r12 window is _R09_REMAINING_R12 + _R10_FIRST1_R12 in
# artifact order, pinned and test-verified), so there is no
# hand-recount surface.
# ---------------------------------------------------------------------
_R12_REMAINING_R15 = [
    n
    for n in (_R09_REMAINING_R12 + _R10_FIRST1_R12)
    if n not in set(_R12_FIRST1_R14)
]
_R13_FIRST1_R15 = [
    "flagship_revenue_by_nation",
]

# ---------------------------------------------------------------------
# ROUND-16 window, LIVE: `_reorder_for_certification` leads with these
# two groups.  The 49 r13-window rows not swept in r15 + the oldest
# r14-window row (49 + 1 = 50).  Both groups are DERIVED from
# already-pinned data (the archived r13 window is _R10_REMAINING_R13 +
# _R11_FIRST1_R13 in artifact order, pinned and test-verified), so
# there is no hand-recount surface.
# ---------------------------------------------------------------------
_R13_REMAINING_R16 = [
    n
    for n in (_R10_REMAINING_R13 + _R11_FIRST1_R13)
    if n not in set(_R13_FIRST1_R15)
]
_R14_FIRST1_R16 = [
    "include_all_blocks_scan",
]

# ---------------------------------------------------------------------
# ROUND-17 window, PRE-STAGED (swap `_reorder_for_certification`'s
# group tuple to `(_R14_REMAINING_R17, _R15_FIRST1_R17,
# _PAST_WINDOW_FIRST)` at the start of round 17 — nothing to recount).
# The 49 r14-window rows not swept in r16 + the oldest r15-window row
# (49 + 1 = 50).  Both groups are DERIVED from already-pinned data
# (the archived r14 window is _R11_REMAINING_R14 + _R12_FIRST1_R14 in
# artifact order, pinned and test-verified), so there is no
# hand-recount surface.
# ---------------------------------------------------------------------
_R14_REMAINING_R17 = [
    n
    for n in (_R11_REMAINING_R14 + _R12_FIRST1_R14)
    if n not in set(_R14_FIRST1_R16)
]
_R15_FIRST1_R17 = [
    "zorder_curve_key",
]

# ---------------------------------------------------------------------
# Registry-pruning policy (round-8 verdict item #2, adopted round 9):
# the 3-round certification guarantee requires registered <= 3 x 50 =
# 150.  The registry sits AT the ceiling (the import-time assert below
# is the source of truth — never write the count into prose): any
# further registration requires a displacement.  RULE: a change
# that would push the registry past 150 must, in the SAME commit, move
# a named twin to verify_local-only (append it to _PAST_WINDOW_FIRST
# and record the displacement here).  Twin = a query whose oracle
# family and serving path are already certified by a sibling row.
# Ranked displacement candidates, in order (each is a twin whose
# oracle family and serving path stay certified through the named
# sibling; unit/differential tests cover the delta):
#   1. dedup_clusters_star   (same CC pipeline as dedup_clusters; only
#      the star-edge generation differs, covered by unit tests)
#   2. bloom_fp_report       (same bitmap build as bloom_membership_gate;
#      the FP-rate arithmetic is covered by tests/test_membership.py)
#   3. cms_freq_report       (same CMS state as cms_heavy_hitters)
#   4. session_window_native (same sessionization result as
#      session_window_agg — identical rows/hash; the native
#      session_window lane keeps its plan-audit + unit tests)
#   5. funnel_conversion_report (report form over the same staged
#      funnel as funnel_conversion)
#   6. cohort_retention_matrix  (pivot of the retention_cohorts agg)
#   7. bigram_logprob        (same LM-proxy build as unigram_logprob,
#      one extra lag column; differential-tested)
#   8. cdc_chunk_dedup       (verdict form of cdc_chunk_rewrite, which
#      exercises the same CDC boundary + interval-union machinery)
# The import-time assert below makes exceeding the ceiling loud.
# ---------------------------------------------------------------------


def _reorder_for_certification() -> None:
    """Rebuild the registry in ROUND-16 certification order:
    the 49 r13-window rows not swept in r15, then the oldest
    r14-window row = 50 exactly; past-window rows follow."""
    ordered: list[str] = []
    for group in (
        _R13_REMAINING_R16,
        _R14_FIRST1_R16,
        _PAST_WINDOW_FIRST,
    ):
        ordered += [n for n in group if n in REGISTRY and n not in ordered]
    ordered += [n for n in REGISTRY if n not in ordered]
    snapshot = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder_for_certification()

# Window-arithmetic invariant: the driver certifies exactly the first
# 50 registered queries.  Fail LOUDLY at import time if the hand-listed
# groups drift (rounds 6 AND 7 each shipped a silent miscount — make it
# impossible).
assert len(_NEVER_CERTIFIED) + len(_R06_STALE_R08) == 50, (
    f"round-8 window was {len(_NEVER_CERTIFIED)} + {len(_R06_STALE_R08)}"
    " rows, expected exactly 50"
)
assert len(_R06_STALE_R08) + len(_R06_STALE_R09) == 50, (
    "the two r06-stale groups must partition the 50 r06-certified rows"
)
assert len(_ADDED_R08) == 33 and not (
    set(_ADDED_R08)
    & (set(_NEVER_CERTIFIED) | set(_R06_STALE_R08) | set(_R06_STALE_R09))
), "round-8 additions must be exactly the 33 rows outside every r07-era group"
assert set(_ADDED_R08) <= set(REGISTRY), (
    "every pinned round-8 addition must be registered"
)
assert len(_ADDED_R08) + len(_R06_STALE_R09) + len(_R07_FIRST3) == 50, (
    "round-9 window arithmetic: 33 added + 14 r06-stale + 3 r07 rows"
)
assert (
    list(REGISTRY)[:50]
    == _R13_REMAINING_R16 + _R14_FIRST1_R16
), "round-16 window order must be exactly the two derived groups"
assert set(_ADDED_R09) <= set(REGISTRY) and not (
    set(_ADDED_R09)
    & (
        set(_ADDED_R08)
        | set(_NEVER_CERTIFIED)
        | set(_R06_STALE_R08)
        | set(_R06_STALE_R09)
        | set(_R07_FIRST3)
    )
), "round-9 additions must be registered and outside every earlier group"
assert len(_R07_REMAINING_R10) + len(_R07_FIRST3) == 50 and not (
    set(_R07_REMAINING_R10) & set(_R07_FIRST3)
), "r10 pre-stage: the two r07 groups must partition the 50 r07 rows"
assert len(_R07_REMAINING_R10) + len(_R08_FIRST3_R10) == 50, (
    "round-10 window arithmetic: 47 r07 rows + 3 r08 rows"
)
assert set(_R07_REMAINING_R10) | set(_R08_FIRST3_R10) <= set(REGISTRY), (
    "every pre-staged round-10 row must be registered"
)
assert len(_R08_REMAINING_R11) + len(_R08_FIRST3_R10) == 50 and not (
    set(_R08_REMAINING_R11) & set(_R08_FIRST3_R10)
), "r11 pre-stage: the two r08 groups must partition the 50 r08 rows"
assert (
    len(_R08_REMAINING_R11) + len(_ADDED_R09) + len(_R09_FIRST1_R11) == 50
), "round-11 window arithmetic: 47 r08 rows + 2 r09 additions + 1 r09 row"
assert set(_R08_REMAINING_R11) | set(_R09_FIRST1_R11) <= set(REGISTRY), (
    "every pre-staged round-11 row must be registered"
)
assert _R09_FIRST1_R11[0] == _ADDED_R08[0], (
    "the r11 sweep head must be the oldest row of the r09 window"
)
assert (
    len(_R09_REMAINING_R12) + len(_R10_FIRST1_R12) == 50
), "round-12 window arithmetic: 49 remaining r09 rows + 1 r10 row"
assert _R10_FIRST1_R12[0] == _R07_REMAINING_R10[0], (
    "the r12 sweep head must be the oldest row of the r10 window"
)
assert set(_R09_REMAINING_R12) | set(_R10_FIRST1_R12) <= set(REGISTRY), (
    "every round-12 window row must be registered"
)
assert (
    len(_R10_REMAINING_R13) + len(_R11_FIRST1_R13) == 50
), "round-13 window arithmetic: 49 remaining r10 rows + 1 r11 row"
assert _R11_FIRST1_R13[0] == _R08_REMAINING_R11[0], (
    "the r13 sweep head must be the oldest row of the r11 window"
)
assert set(_R10_REMAINING_R13) | set(_R11_FIRST1_R13) <= set(REGISTRY), (
    "every round-13 window row must be registered"
)
assert (
    len(_R11_REMAINING_R14) + len(_R12_FIRST1_R14) == 50
), "round-14 window arithmetic: 49 remaining r11 rows + 1 r12 row"
assert _R12_FIRST1_R14 == _R09_REMAINING_R12[:1], (
    "the r14 sweep head must be the oldest row of the r12 window"
)
assert set(_R11_REMAINING_R14) | set(_R12_FIRST1_R14) <= set(REGISTRY), (
    "every pre-staged round-14 row must be registered"
)
assert (
    len(_R12_REMAINING_R15) + len(_R13_FIRST1_R15) == 50
), "round-15 window arithmetic: 49 remaining r12 rows + 1 r13 row"
assert _R13_FIRST1_R15 == _R10_REMAINING_R13[:1], (
    "the r15 sweep head must be the oldest row of the r13 window"
)
assert set(_R12_REMAINING_R15) | set(_R13_FIRST1_R15) <= set(REGISTRY), (
    "every round-15 window row must be registered"
)
assert (
    len(_R13_REMAINING_R16) + len(_R14_FIRST1_R16) == 50
), "round-16 window arithmetic: 49 remaining r13 rows + 1 r14 row"
assert _R14_FIRST1_R16 == _R11_REMAINING_R14[:1], (
    "the r16 sweep head must be the oldest row of the r14 window"
)
assert set(_R13_REMAINING_R16) | set(_R14_FIRST1_R16) <= set(REGISTRY), (
    "every round-16 window row must be registered"
)
assert (
    len(_R14_REMAINING_R17) + len(_R15_FIRST1_R17) == 50
), "round-17 window arithmetic: 49 remaining r14 rows + 1 r15 row"
assert _R15_FIRST1_R17 == _R12_REMAINING_R15[:1], (
    "the r17 sweep head must be the oldest row of the r15 window"
)
assert set(_R14_REMAINING_R17) | set(_R15_FIRST1_R17) <= set(REGISTRY), (
    "every pre-staged round-17 row must be registered"
)
assert len(REGISTRY) <= 150, (
    f"registry holds {len(REGISTRY)} queries — the 3-round certification"
    " guarantee caps it at 150; displace a twin to _PAST_WINDOW_FIRST"
    " (see the pruning policy above) before registering more"
)
