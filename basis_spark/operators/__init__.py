"""Operator library. Importing this package registers every operator.

Modules map to SURVEY.md §2 groups:
  scans       — §2.A sources/sinks
  rowops      — §2.B projection/filter/row ops
  joins       — §2.C joins (equi/theta/semi/anti/as-of/interval)
  aggregates  — §2.D aggregation
  analytics   — §2.M funnel/cohort/histogram/pivot reshaping
  windows     — §2.E window functions
  sets_sort   — §2.F sort/limit + §2.G set ops
  scalars     — §2.H scalar functions + §2.I sampling/approx
  incremental — §2.J streaming semantics (batch-equivalent forms)
  udfs        — §2.K UDF/UDAF/UDTF surface
  llm         — §2.L LLM-data-pipeline operators (+ extensions)
  corpus      — training-corpus assembly (chunk/pack/vocab/mixture/eval)
  stats       — two-sample distribution tests (KS, Mann-Whitney U)
  multimodal  — binary-column plumbing (decode stubbed; SURVEY §1.3)
  pipelines   — end-to-end node-graph compositions (training-data flow)
  table_log   — transaction-log table format (snapshot / time travel)
"""

# Registration order is the driver's verification order: the per-round
# correctness gate checks the FIRST 50 keys of queries(). Rounds 1-4
# externally verified 150 distinct keys (union reconstructed from the
# four VERDICT.md tables + CORRECTNESS_r04.json). Instead of juggling
# module import order, _ROTATION_FRONT below pins the exact 50-key
# window per round at key granularity; module import order no longer
# matters for the gate.
from basis_spark.operators import (  # noqa: F401
    tpch,
    udfs,
    multimodal,
    sets_sort,
    pipelines,
    rowops,
    llm,
    scalars,
    windows,
    scans,
    aggregates,
    analytics,
    incremental,
    joins,
    corpus,
    stats,
    table_log,
)
from basis_spark.registry import ORACLES, register  # noqa: E402

# Alias keys, registered LAST so they never occupy the driver's 50-key
# verification window (their targets are verified under their own names):
#   tpch_q1       ≡ agg_groupby_multi (the flagship pricing summary)
#   topk_per_group ≡ win_row_number_topk (SURVEY §2.F names both)
register("tpch_q1", oracle=ORACLES["agg_groupby_multi"])(
    aggregates.agg_groupby_multi
)
register("topk_per_group", oracle=ORACLES["win_row_number_topk"])(
    windows.win_row_number_topk
)

# Late §2.K addition (r4): registered after every module for window
# stability — see the note at operators/udfs.py::map_in_arrow.
register(
    "map_in_arrow",
    oracle="SELECT event_id, user_id, round(value * 2, 2) AS value2 FROM events",
)(udfs.map_in_arrow)
register("multimodal_phash_dedup", oracle=multimodal.PHASH_DEDUP_ORACLE)(
    multimodal.multimodal_phash_dedup
)
register("set_intersect_all", oracle=sets_sort.INTERSECT_ALL_ORACLE)(
    sets_sort.set_intersect_all
)
register("set_except_all", oracle=sets_sort.EXCEPT_ALL_ORACLE)(
    sets_sort.set_except_all
)

# ---------------------------------------------------------------------
# ROUND-6 DRIVER WINDOW (the first 50 keys the driver verifies).
# All 50 are strict-oracle keys that tools/driver_verified_keys.json
# records as never driver-verified under any round's accounting
# (rounds r1-r4 reconstruction + CORRECTNESS_r05.json fold-in = 249
# verified; this window fronts 50 of the 106 never-verified strict
# keys, prioritized per the r5 verdict: table_log_* lakehouse life
# cycle, privacy ladder, classical stats, Holt/Holt-Winters + ts tail,
# SQL analyzer surfaces, k-core/graph, the real JPEG/PNG codecs, the
# UDTF/Arrow-UDF surfaces, corpus evals, the retail trio, and the
# three percentile-combine keys whose approx swap-ins land this round.
# 56 strict + 12 rows-only never-verified keys remain for r7/r8 -
# recompute from driver_verified_keys.json ∪ CORRECTNESS_r06.
# tests/test_survey_contract.py ratchets this window: len==50, every
# key registered, every key strict-oracle, none already verified.
_ROTATION_FRONT = [
    "table_log_snapshot",
    "table_log_time_travel",
    "table_log_history",
    "table_log_merge_cow",
    "table_log_checkpoint",
    "table_log_schema_evolution",
    "table_log_vacuum",
    "privacy_k_anonymity",
    "privacy_l_diversity",
    "privacy_t_closeness",
    "stat_chi_square",
    "stat_ks_two_sample",
    "stat_mann_whitney_u",
    "stat_anova_oneway",
    "stat_ttest_welch",
    "ts_holt_linear",
    "ts_holt_winters",
    "ts_decompose_trend_seasonal",
    "ts_max_drawdown",
    "ts_autocorrelation",
    "ts_forecast_snaive",
    "ts_hampel_outliers",
    "ts_var_cvar",
    "ts_seasonality_strength",
    "sql_lateral_column_alias",
    "sql_group_by_all",
    "sql_identifier_binding",
    "graph_kcore",
    "graph_degree_distribution",
    "graph_jaccard_neighbors",
    "multimodal_jpeg_decode",
    "multimodal_png_decode",
    "text_dedup_paragraph",
    "embeddings_binary_hamming_topk",
    "udtf_table_arg_partitioned",
    "udf_python_arrow",
    "source_text_lines",
    "source_csv_multiline",
    "eval_retrieval_precision_at_k",
    "eval_retrieval_ndcg_at_k",
    "corpus_mixture_balance",
    "corpus_temperature_mixture",
    "tokenizer_vocab_coverage",
    "event_ab_test_lift",
    "retail_rollup_margin_rank",
    "retail_multi_timeband_counts",
    "retail_channel_cumulative_compare",
    "funnel_time_to_convert",
    "latency_ship_percentiles",
    "event_interarrival_stats",
]
assert len(_ROTATION_FRONT) == 50, len(_ROTATION_FRONT)

from basis_spark.registry import QUERIES  # noqa: E402

_missing = [k for k in _ROTATION_FRONT if k not in QUERIES]
assert not _missing, f"rotation names unknown keys: {_missing}"
_reordered = {k: QUERIES[k] for k in _ROTATION_FRONT}
_reordered.update({k: v for k, v in QUERIES.items() if k not in _reordered})
QUERIES.clear()
QUERIES.update(_reordered)
