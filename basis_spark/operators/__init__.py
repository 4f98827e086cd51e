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
# ROUND-10 DRIVER WINDOW (the first 50 keys the driver verifies).
# All 50 are strict-oracle keys that tools/driver_verified_keys.json
# records as never driver-verified under any round's accounting
# (rounds r1-r4 reconstruction + CORRECTNESS_r05.json,
# CORRECTNESS_r07.json, CORRECTNESS_r08.json, and CORRECTNESS_r09.json
# fold-ins = 399 cumulative verified out of 577; this window fronts 50
# of the 171 never-verified strict keys, prioritized per the r9
# verdict: the geo/graph family, the multimodal decode/shard tail, the
# pipeline flagships (pipeline_embedding_index,
# pipeline_lakehouse_curation), the sql_* surface tail, and the
# similarity/embeddings promotions (ann_ivf, ann_ivf_kmeans, mips,
# maxsim)). After this window 121 strict + 7 rows-only never-verified
# keys remain for r11+ — recompute from driver_verified_keys.json
# ∪ CORRECTNESS_r10.
# tests/test_survey_contract.py ratchets this window:
# len==50, every key registered, every key strict-oracle, none already
# verified, and it must equal driver_verified_keys.json's "front".
_ROTATION_FRONT = [
    "geo_dbscan_clusters",
    "geo_grid_density",
    "graph_2hop_reach",
    "graph_adamic_adar",
    "graph_community_modularity",
    "graph_connected_components",
    "graph_harmonic_centrality",
    "multimodal_audio_silence_trim",
    "multimodal_image_tile_stats",
    "multimodal_phash_dedup",
    "multimodal_shard_index",
    "multimodal_shard_pack_balanced",
    "multimodal_tar_shard_write",
    "multimodal_wav_downsample",
    "pipeline_data_contract",
    "pipeline_embedding_index",
    "pipeline_feature_snapshot",
    "pipeline_lakehouse_curation",
    "pipeline_lineage_report",
    "pipeline_multimodal_curation",
    "pipeline_node_cache",
    "sql_distinct_on",
    "sql_order_by_all",
    "sql_pipe_syntax",
    "sql_qualify_clause",
    "sql_scripting_block",
    "sql_star_except",
    "sql_udf_scalar",
    "sql_udf_table_valued",
    "dedup_cosine_neardup_lsh",
    "dedup_doc_prefix",
    "dedup_incremental_minhash",
    "embeddings_centroid_drift",
    "embeddings_centroid_shift",
    "embeddings_dim_stats",
    "embeddings_isotropy_score",
    "embeddings_mrl_recall",
    "embeddings_pca_power",
    "embeddings_signbit_sketch",
    "embeddings_standardize",
    "similarity_ann_ivf",
    "similarity_ann_ivf_kmeans",
    "similarity_hard_negatives",
    "similarity_hybrid_bm25_cosine",
    "similarity_maxsim_multivector",
    "similarity_mips_topk",
    "similarity_rank_fusion_rrf",
    "abc_pareto_class",
    "agg_bitmap_exact_distinct",
    "agg_count_distinct_multi",
]
assert len(_ROTATION_FRONT) == 50, len(_ROTATION_FRONT)

from basis_spark.registry import QUERIES  # noqa: E402

_missing = [k for k in _ROTATION_FRONT if k not in QUERIES]
assert not _missing, f"rotation names unknown keys: {_missing}"
_reordered = {k: QUERIES[k] for k in _ROTATION_FRONT}
_reordered.update({k: v for k, v in QUERIES.items() if k not in _reordered})
QUERIES.clear()
QUERIES.update(_reordered)
