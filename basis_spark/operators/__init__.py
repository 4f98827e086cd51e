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
# ROUND-5 DRIVER WINDOW (the first 50 keys the driver verifies).
# tpch_q12 stays in per the r4 verdict (oracle re-cast to BIGINT —
# confirm the fix externally); multimodal_shard_pack carries the same
# latent HUGEINT cast fix; the other 48 are strict-oracle keys that
# have NEVER been in a driver window (union of r1-r4 windows = 150
# keys; 123 strict + 13 tolerance keys remain unverified after this).
# Rounds 6-7 should front the next 50 from the never-verified list —
# tools/driver_verified_keys.json stores the per-round driver-pass
# claims reconstructed from VERDICT.md git history plus
# `never_claimed_strict` (91 keys as of r5, none ever in a driver
# window under ANY round's accounting): front 50 of those in r6, the
# rest + CORRECTNESS_r05 re-checks in r7.
_ROTATION_FRONT = [
    "tpch_q12",
    "multimodal_shard_pack",
    # llm tail (text/dedup/similarity/embeddings), never driver-checked
    "text_tfidf_topterms",
    "text_lang_partition",
    "text_quality_score",
    "text_langid_ngram",
    "doc_fingerprint",
    "doc_fingerprint_rolling",
    "doc_fingerprint_winnow",
    "multimodal_join",
    "dedup_simhash_pairs",
    "dedup_cluster_cc",
    "dedup_keep_best",
    "dedup_source_crossdup",
    "dedup_exact_normalized",
    "split_train_test",
    "agg_duplicate_stats",
    "similarity_range_search",
    "similarity_centroid_classify",
    "embeddings_quantize_int8",
    "embeddings_outlier_centroid",
    "embeddings_truncate_mrl",
    "text_ngram_profile",
    "text_normalize_clean",
    "text_unigram_logprob",
    "text_mask_redact",
    "text_contamination_check",
    "text_containment_pairs",
    "text_span_dup_mass",
    "text_perplexity_bucket",
    "text_repetition_ratio",
    "text_bigram_pmi",
    "text_url_canonical_dedup",
    "text_extract_typed_spans",
    "eval_langid_confusion",
    # joins/graph additions, never driver-checked
    "join_asof_tolerance",
    "join_asof_forward_nearest",
    "join_null_safe",
    "join_existence_flag",
    "join_runtime_prefilter",
    "join_band_bucketed",
    "join_point_in_time_state",
    "join_spatial_grid",
    "graph_triangle_count",
    "graph_pagerank",
    # analytics additions, never driver-checked
    "sql_recursive_closure",
    "survival_kaplan_meier",
    "ts_cusum_changepoint",
    "stat_benford_digits",
    "dq_key_skew_report",
]
assert len(_ROTATION_FRONT) == 50, len(_ROTATION_FRONT)

from basis_spark.registry import QUERIES  # noqa: E402

_missing = [k for k in _ROTATION_FRONT if k not in QUERIES]
assert not _missing, f"rotation names unknown keys: {_missing}"
_reordered = {k: QUERIES[k] for k in _ROTATION_FRONT}
_reordered.update({k: v for k, v in QUERIES.items() if k not in _reordered})
QUERIES.clear()
QUERIES.update(_reordered)
