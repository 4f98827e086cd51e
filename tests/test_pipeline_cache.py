"""Contract tests for the content-addressed node cache
(pipeline_node_cache): hit path reuses the materialized files, key
changes with logic and inputs."""

from __future__ import annotations

import os

from basis_spark.io import scratch_dir
from basis_spark.operators import pipelines
from tests.conftest import SF_ORACLE, SF_SMALL


def _cache_entries() -> set[str]:
    base = scratch_dir("node_cache")
    return set(os.listdir(base)) if os.path.isdir(base) else set()


def test_second_call_hits_cache(spark):
    first = sorted(
        tuple(r) for r in pipelines.pipeline_node_cache(spark, SF_ORACLE).collect()
    )
    entries_after_first = _cache_entries()
    second = sorted(
        tuple(r) for r in pipelines.pipeline_node_cache(spark, SF_ORACLE).collect()
    )
    assert second == first
    # no NEW cache directory was created by the second call
    assert _cache_entries() == entries_after_first


def test_cache_key_depends_on_inputs(spark):
    pipelines.pipeline_node_cache(spark, SF_ORACLE).collect()
    before = _cache_entries()
    pipelines.pipeline_node_cache(spark, SF_SMALL).collect()
    after = _cache_entries()
    # a different input fingerprint MUST materialize a different entry
    assert before < after
