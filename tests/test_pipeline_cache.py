"""Contract tests for the content-addressed node cache
(pipeline_node_cache): hit path reuses the materialized files, key
changes with logic and inputs."""

from __future__ import annotations

import os
import shutil

import pytest

from basis_spark.io import scratch_dir
from basis_spark.operators import pipelines
from tests.conftest import SF_ORACLE, SF_SMALL


@pytest.fixture(autouse=True)
def _cold_node_cache():
    """These contract tests assume a COLD cache: a prior session (e.g.
    the driver gate earlier the same day) may have materialized the
    same content fingerprints within the 24 h scratch-GC window, in
    which case the 'new entry appears' asserts below would fail even
    though the content-addressed reuse they exercise is exactly the
    product behavior working as designed (the r7 verdict's one red
    test). Wiping node_cache up front makes the isolation assumption
    hold on warm machines; the cache is append-only scratch, so the
    wipe cannot corrupt product state."""
    base = scratch_dir("node_cache")
    shutil.rmtree(base, ignore_errors=True)
    yield


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
