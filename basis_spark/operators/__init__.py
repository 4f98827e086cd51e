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
# ROUND-11 DRIVER WINDOW (the first 50 keys the driver verifies).
# tools/driver_verified_keys.json now folds CORRECTNESS_r10.json
# (50/50 green, all first-time) = 449 cumulative verified of 577,
# leaving 121 strict + 7 rows-only keys never driver-checked. This
# window fronts 43 strict keys from the r10-verdict priority families
# (corpus_* training-data tail, the full eval_* metric family, the
# full event_* attribution/analytics tail, ts_* anomaly/causality,
# text_* quality scores, and the io/source tail) PLUS the 7
# never-checked rows-only-tier keys the r10 verdict item #5 orders
# drained (the driver's weaker rows+schema gate is still external
# evidence those keys have never received). After this window 78
# strict keys remain for r12+.
# tests/test_survey_contract.py ratchets this window: len==50, every
# key registered, rows-only keys allowed ONLY from the declared
# tolerance tier and only while never driver-checked, none already
# verified, and it must equal driver_verified_keys.json's "front".
_ROTATION_FRONT = [
    "corpus_filter_ablation",
    "corpus_interleave_roundrobin",
    "corpus_length_batching_waste",
    "corpus_quality_stump",
    "corpus_shuffle_epochs",
    "eval_auc_rank",
    "eval_bleu_pairs",
    "eval_brier_decomposition",
    "eval_calibration_bins",
    "eval_pass_at_k",
    "eval_pr_curve_points",
    "eval_retrieval_mrr",
    "eval_retrieval_recall_at_k",
    "eval_rouge1_pairs",
    "event_attribution_last_touch",
    "event_attribution_linear",
    "event_attribution_markov_removal",
    "event_attribution_position",
    "event_audience_overlap",
    "event_bot_rules",
    "event_cohort_ltv",
    "event_conversion_paths_topn",
    "event_dau_mau_stickiness",
    "event_decay_engagement",
    "event_funnel_unordered",
    "event_funnel_window",
    "event_growth_accounting",
    "event_hourly_profile",
    "event_markov_transitions",
    "event_new_vs_returning",
    "ts_granger_lite",
    "ts_downsample_m4",
    "ts_control_chart",
    "ts_lag1_autoregression",
    "text_bm25_score",
    "text_gopher_quality_rules",
    "text_readability_flesch",
    "text_pii_scrub",
    "scan_gzip_text",
    "scan_parquet_encoding_stats",
    "scan_parquet_rowgroup_stats",
    "source_fixed_width",
    "sink_python_datasource",
    "agg_approx_distinct",
    "agg_histogram_numeric",
    "sketch_hll_distinct",
    "sketch_hll_rollup",
    "sketch_kll_quantiles",
    "sketch_theta_set_ops",
    "text_compression_ratio",
]
assert len(_ROTATION_FRONT) == 50, len(_ROTATION_FRONT)

from basis_spark.registry import QUERIES  # noqa: E402

_missing = [k for k in _ROTATION_FRONT if k not in QUERIES]
assert not _missing, f"rotation names unknown keys: {_missing}"
_reordered = {k: QUERIES[k] for k in _ROTATION_FRONT}
_reordered.update({k: v for k, v in QUERIES.items() if k not in _reordered})
QUERIES.clear()
QUERIES.update(_reordered)
