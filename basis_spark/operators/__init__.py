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
# ROUND-9 DRIVER WINDOW (the first 50 keys the driver verifies).
# All 50 are strict-oracle keys that tools/driver_verified_keys.json
# records as never driver-verified under any round's accounting
# (rounds r1-r4 reconstruction + CORRECTNESS_r05.json,
# CORRECTNESS_r07.json, and CORRECTNESS_r08.json fold-ins = 349
# cumulative verified out of 577; this window fronts 50 of the 220
# never-verified strict keys, prioritized per the r8 verdict: the
# table_log tail, the r8 classical-stats waves (G-test, SPRT, CUPED,
# Qini, TOST) plus the stats tail, corpus/tokenizer/packing keys, the
# privacy-DP family, the minhash calibration pair, and the
# window/time-series tails). After this window 170 strict + 8
# rows-only never-verified keys remain for r10+ — recompute from
# driver_verified_keys.json ∪ CORRECTNESS_r09.
# tests/test_survey_contract.py ratchets this window:
# len==50, every key registered, every key strict-oracle, none already
# verified, and it must equal driver_verified_keys.json's "front".
_ROTATION_FRONT = [
    "table_log_clone_shallow",
    "table_log_file_skipping",
    "table_log_orphan_files",
    "table_log_restore",
    "table_log_schema_enforcement",
    "stat_g_test_loglik",
    "stat_sprt_sequential",
    "stat_cuped_adjustment",
    "stat_qini_uplift_deciles",
    "stat_tost_equivalence",
    "stat_benjamini_hochberg",
    "stat_cohens_kappa",
    "stat_cramers_v",
    "stat_jarque_bera",
    "stat_kruskal_wallis",
    "stat_mcnemar_paired",
    "stat_permutation_shift",
    "stat_posthoc_pairwise_bonferroni",
    "stat_power_sample_size",
    "stat_proportions_ztest",
    "stat_ratio_metric_delta",
    "stat_theil_sen_slope",
    "stat_wilson_interval",
    "pipeline_tokenizer_release",
    "pack_tokens_nextfit",
    "corpus_dsir_weights",
    "chunk_fixed_tokens",
    "chunk_docs_overlap",
    "corpus_doc_length_deciles",
    "corpus_quality_logreg",
    "corpus_span_corruption",
    "privacy_dp_clipped_mean",
    "privacy_dp_noisy_topk",
    "privacy_dp_quantile",
    "privacy_dp_laplace_counts",
    "privacy_pseudonymize_consistent",
    "dedup_minhash_band_tuning",
    "dedup_minhash_estimator_calibration",
    "win_bollinger_bands",
    "win_moving_distinct",
    "win_rsi_sma",
    "win_running_distinct",
    "win_top_percent_per_group",
    "ts_changepoint_binseg",
    "ts_seasonal_esd_anomalies",
    "ts_theta_forecast",
    "ts_ljung_box",
    "ts_periodogram",
    "ts_pacf_durbin",
    "ts_rolling_corr",
]
assert len(_ROTATION_FRONT) == 50, len(_ROTATION_FRONT)

from basis_spark.registry import QUERIES  # noqa: E402

_missing = [k for k in _ROTATION_FRONT if k not in QUERIES]
assert not _missing, f"rotation names unknown keys: {_missing}"
_reordered = {k: QUERIES[k] for k in _ROTATION_FRONT}
_reordered.update({k: v for k, v in QUERIES.items() if k not in _reordered})
QUERIES.clear()
QUERIES.update(_reordered)
