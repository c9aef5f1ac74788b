"""Import all query modules so their ``@query`` registrations run.

Registration order IS the driver's certification order: the correctness
gate writes at most 50 rows taken in registry order.  After the module
imports below, ``_reorder_for_certification`` rebuilds the registry dict
so the round-5 window is exactly:

1. relational (20) + steps/decode (13) — the 33 queries whose latest
   driver row is r03; shared infrastructure moved under them in round 4
   (sources/tables.py parallelize flags, catalog, session conf), so they
   rotate back in per the round-4 verdict item #1;
2. ``_ROUND5_CHANGED`` — queries whose implementation or oracle changes
   in round 5 (ngram shared materialization, JVM two-phase top-k, IVF
   generated oracle, delta-dedup gate remodel, quantize-audit count fix,
   funnel oracle precision fix, new u256 two-limb sum);
3. everything else in prior-round order (all green in r04 on unchanged
   code).
"""

from cherry_spark.catalog import REGISTRY

import cherry_spark.queries.relational  # noqa: F401,E402
import cherry_spark.queries.steps  # noqa: F401,E402
import cherry_spark.queries.analytics  # noqa: F401,E402
import cherry_spark.queries.curation  # noqa: F401,E402
import cherry_spark.queries.multimodal  # noqa: F401,E402
import cherry_spark.queries.extensions  # noqa: F401,E402

# Queries touched in round 5 — certify right after the 33 rotated-in rows.
_ROUND5_CHANGED = [
    "u256_sum",
    "ann_ivf_topk",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "delta_dedup_verdicts",
    "embedding_quantize_audit",
    "funnel_conversion",
]

_RELATIONAL_STEPS = [
    # relational.py registration order
    "project_select", "filter_range", "filter_in_set", "filter_prefix",
    "semi_join_related", "trace_query_model", "join_inner_eq",
    "join_composite_key", "join_left_dim", "agg_min_max",
    "agg_resume_cursor", "groupby_sum", "groupby_multi",
    "agg_count_distinct", "topk_orderby_limit", "union_all_batches",
    "window_rownum_dedup", "window_tumbling_agg", "json_extract",
    "flagship_revenue_by_nation",
    # steps.py registration order
    "cast_by_name", "cast_by_type", "hex_encode", "set_constant_col",
    "sql_step", "udf_transform_step", "decode_fixedwidth",
    "decode_dynamic_abi", "decode_dynamic_abi_arrow", "borsh_decode_fixed",
    "glaciers_decode", "base58_encode", "u256_binary_roundtrip",
]


def _reorder_for_certification() -> None:
    ordered = [n for n in _RELATIONAL_STEPS if n in REGISTRY]
    ordered += [n for n in _ROUND5_CHANGED if n in REGISTRY and n not in ordered]
    ordered += [n for n in REGISTRY if n not in ordered]
    snapshot = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(snapshot)


_reorder_for_certification()
