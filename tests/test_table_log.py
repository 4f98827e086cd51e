"""Transaction-log table format semantics (operators/table_log.py):
time travel must return pre-update rows even after the update has
committed, snapshot reads must never touch removed objects, and the
log replay must be strict about unknown actions."""

from __future__ import annotations

import os

import pytest

from basis_spark.operators import table_log
from tests.conftest import SF_ORACLE


def test_time_travel_sees_pre_update_prices(spark):
    """After v1 (reprice x2 of odd-key orders) exists on disk, the
    as-of-v0 read must still return the ORIGINAL prices — the defining
    property of immutable objects + versioned log."""
    table_dir = table_log._build_table(spark, SF_ORACLE)
    assert os.path.exists(os.path.join(table_dir, "log", "00000001.json"))
    v0 = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in table_log.table_log_time_travel(spark, SF_ORACLE).collect()
    }
    latest = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in table_log.table_log_snapshot(spark, SF_ORACLE).collect()
    }
    assert set(v0) == set(latest)  # update rewrites rows, never deletes
    odd = [k for k in v0 if k % 2 == 1]
    even = [k for k in v0 if k % 2 == 0]
    assert odd and even, "fixture must exercise both objects"
    for k in odd:
        assert latest[k] == v0[k] * 2
    for k in even:
        assert latest[k] == v0[k]


def test_snapshot_scans_only_live_objects(spark):
    table_dir = table_log._build_table(spark, SF_ORACLE)
    live = table_log._live_objects(table_dir)
    assert [os.path.basename(p) for p in live] == ["p0", "p2"]
    v0_live = table_log._live_objects(table_dir, as_of=0)
    assert [os.path.basename(p) for p in v0_live] == ["p0", "p1"]


def test_replay_rejects_unknown_action(tmp_path):
    table_log._commit(str(tmp_path), 0, [{"op": "truncate", "path": "x"}])
    with pytest.raises(ValueError, match="unknown log action"):
        table_log._live_objects(str(tmp_path))


def test_commit_is_atomic_no_tmp_residue(spark):
    """The temp+rename write must leave no .tmp files a log lister
    could mistake for commits."""
    table_dir = table_log._build_table(spark, SF_ORACLE)
    log_dir = os.path.join(table_dir, "log")
    assert all(not n.endswith(".tmp") for n in os.listdir(log_dir))
    versions = [rec["version"] for rec in table_log._read_log(table_dir)]
    assert versions == [0, 1]


def test_merge_cow_leaves_unmatched_objects_untouched(spark):
    """The defining COW property: MERGE rewrites only objects holding
    matched keys. The odd-key object p2 has no matched rows, so after
    the v2 merge commit it must still be live under its ORIGINAL path
    (same bytes, no rewrite), while p0 is replaced and an insert object
    appears."""
    table_log.table_log_merge_cow(spark, SF_ORACLE).count()  # builds v2
    table_dir = table_log._sf_scratch(spark, "txn_log_merge", SF_ORACLE)
    names = [os.path.basename(p) for p in table_log._live_objects(table_dir)]
    assert "p2" in names, "untouched object must survive under its old path"
    assert "p0" not in names, "matched object must be replaced"
    assert "m2_0" in names and "m2_ins" in names
    versions = [rec["version"] for rec in table_log._read_log(table_dir)]
    assert versions == [0, 1, 2]
