"""Declarative query registry.

Every operator from SURVEY.md §2 registers itself here with an optional
DuckDB oracle SQL string. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Contract (driver t2): the Spark callable and the oracle SQL must produce the
same row multiset with the same column names — every computed column is
aliased identically on both sides, and floating aggregates are rounded the
same way on both sides to absorb summation-order differences.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import graph_vulcan_assets_spark.operators  # noqa: F401
    import graph_vulcan_assets_spark.functions  # noqa: F401
    import graph_vulcan_assets_spark.plans  # noqa: F401
    import graph_vulcan_assets_spark.llm  # noqa: F401
    import graph_vulcan_assets_spark.sources.readers  # noqa: F401
    import graph_vulcan_assets_spark.streaming.stateful  # noqa: F401
    import graph_vulcan_assets_spark.streaming.stateful_tws  # noqa: F401


# Exposure order for ``queries()`` / ``oracle_sql()``. The driver runs its
# 50-entry correctness budget over queries in iteration order, so each round
# rotates never-driver-checked oracle queries to the front (round-2 verdict
# item #1: budget rotation, not code). Round-4 order (VERDICT r3 items #1/#2):
# the 66 oracle-bearing keys with no green driver row in r1∪r2∪r3, led by
# q_embed_centroid (the round-3 red row, output reshaped to a driver-hashable
# string — see llm/embeddings.py). Positions 1-50 fit the budget; positions
# 51-66 are the RECORDED SPILL for the round-5 rotation: q_corpus_shuffle,
# q_mix_temperature, q_length_buckets, q_quantile_filter, q_mix_materialize,
# q_cap_per_source, q_multimodal_framesample, q_embed_matryoshka, q_pq_codes,
# q_pq_adc_topk, q_quality_classifier, q_classifier_route, q_text_normalize,
# q_dedup_semantic, q_feature_hashing, q_topic_assign — chosen as the spill
# because each carries redundant local evidence beyond the DuckDB parity
# suite (recall/determinism gates, bit-exact Python-reference pins).
# Everything with a green driver row in any round sits behind the rotation —
# it loses nothing if the fixed-size budget cuts off.
PRIORITY: tuple[str, ...] = (
    # 1 -- the round-3 red row, fixed: must re-check first
    "q_embed_centroid",
    # 2-10 -- round-2-era debt (oldest never-checked keys)
    "q_agg_grouping_sets",
    "q_agg_filtered",
    "q_win_distribution",
    "q_win_ratio_to_report",
    "q_except_all",
    "q_intersect_all",
    "q_agg_salted",
    "q_join_salted",
    "q_join_part_supplier",
    # 11-18 -- text-analysis family
    "q_text_quality",
    "q_text_lang_dist",
    "q_lang_id",
    "q_token_count",
    "q_text_fingerprint",
    "q_text_tfidf",
    "q_text_repetition",
    "q_text_lm_score",
    # 19-23 -- dedup-oracle family
    "q_dedup_ngram",
    "q_dedup_embed",
    "q_dedup_boilerplate",
    "q_dedup_incremental",
    "q_dedup_clusters",
    # 24-28 -- embeddings + file sources + streaming sessionize
    "q_embed_quantize",
    "q_source_csv",
    "q_source_jsonl",
    "q_source_orc",
    "q_stream_sessionize",
    # 29-34 -- round-3 wave: API / windows / search / recursion / intervals
    "q_keyset_page",
    "q_session_window",
    "q_dedup_containment",
    "q_text_search_indexed",
    "q_recursive_cte",
    "q_join_interval",
    # 35-40 -- hypertable + data-quality monitors
    "q_timeseries_gapfill",
    "q_timeseries_interpolate",
    "q_anomaly_zscore",
    "q_cms_heavy_hitters",
    "q_dq_checks",
    "q_drift_psi",
    # 41-50 -- graph pairs, SCD2, ANN rerank, text ranking, span dedup, BPE
    "q_entity_pairs",
    "q_scd2_build",
    "q_sim_mrl_rerank",
    "q_vocab_topn",
    "q_text_bm25",
    "q_lang_confusion",
    "q_text_search_phrase",
    "q_dedup_spans",
    "q_dedup_span_clean",
    "q_bpe_pairs",
    # ---- 50-entry budget line ----
    # 51-66 -- recorded spill for the round-5 rotation (see module comment)
    "q_corpus_shuffle",
    "q_mix_temperature",
    "q_length_buckets",
    "q_quantile_filter",
    "q_mix_materialize",
    "q_cap_per_source",
    "q_multimodal_framesample",
    "q_embed_matryoshka",
    "q_pq_codes",
    "q_pq_adc_topk",
    "q_quality_classifier",
    "q_classifier_route",
    "q_text_normalize",
    "q_dedup_semantic",
    "q_feature_hashing",
    "q_topic_assign",
    # -- driver-green inventory (r1∪r2∪r3), r3 rotation order then r2 order
    "q_win_first_seen",
    "q_win_rank",
    "q_win_lag_lead",
    "q_win_running_sum",
    "q_win_range_frame",
    "q_win_topk_group",
    "q_sort_multi",
    "q_topk",
    "q_shape_q2",
    "q_shape_q3",
    "q_shape_q4",
    "q_shape_q5",
    "q_shape_q6",
    "q_shape_q7",
    "q_shape_q8",
    "q_shape_q10",
    "q_shape_q13",
    "q_shape_q14",
    "q_shape_q15",
    "q_shape_q17",
    "q_shape_q18",
    "q_shape_q19",
    "q_shape_q20",
    "q_shape_q21",
    "q_shape_q22",
    "q_subquery_not_in",
    "q_join_lateral",
    "q_split_train_test",
    "q_sample_stratified",
    "q_corpus_mix",
    "q_decontaminate",
    "q_pack_sequences",
    "q_pii_redact",
    "q_chunk_documents",
    "q_split_leakage_safe",
    "q_funnel",
    "q_retention_cohorts",
    "q_time_weighted_avg",
    "q_profile_columns",
    "q_hist_equiwidth",
    "q_hist_equidepth",
    "q_rollup_cascade",
    "q_graph_ancestors",
    "q_graph_subtree_size",
    "q_graph_pagerank",
    "q_join_asof_tolerance",
    "q_time_sliding",
    "q_kmeans_assign",
    "q_udtf_sentences",
    # -- round-2 green inventory
    "q_union_all",
    "q_union_distinct",
    "q_intersect",
    "q_except",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_case_when",
    "q_json_extract",
    "q_array_funcs",
    "q_map_funcs",
    "q_tombstone_expire",
    "q_time_tumbling",
    "q_cascade_expire",
    "q_dedup_exact",
    "q_sim_topk",
    "q_text_stats",
    "q_text_search",
    "q_sessionize",
    "q_explode_filter",
    "q_join_anti",
    "q_agg_groupby",
    "q_scan_events",
    "q_scan_pruned",
    "q_limit_offset",
    "q_filter_notnull",
    "q_semver_gate",
    "q_split_key",
    "q_regex_normalize",
    "q_filter_eq",
    "q_valid_at",
    "q_filter_range",
    "q_filter_in_like",
    "q_join_inner",
    "q_join_multiway",
    "q_join_broadcast",
    "q_join_left",
    "q_join_semi",
    "q_join_range",
    "q_join_asof",
    "q_upsert_merge",
    "q_dup_detect",
    "q_agg_any_active",
    "q_agg_minmax",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_having",
    "q_agg_stats",
    "q_win_last_event",
)


def _ordered(mapping: dict[str, Any]) -> dict[str, Any]:
    """Priority keys first (in PRIORITY order), then the rest as registered."""
    out = {k: mapping[k] for k in PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return _ordered(QUERIES)


def all_oracle_sql() -> dict[str, str]:
    load_all()
    return _ordered(ORACLE)


def describe() -> list[dict[str, Any]]:
    load_all()
    return [
        {"name": n, "oracle": n in ORACLE, "doc": (f.__doc__ or "").strip().splitlines()[0] if f.__doc__ else ""}
        for n, f in sorted(QUERIES.items())
    ]
