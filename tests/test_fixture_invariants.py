"""Fixture invariants that strict-hash operators silently rely on.

Several oracle-checked operators are only deterministic because the
driver fixtures happen to be tie-free in specific ways. Those claims
live in docstrings ("verified at every SF") — these tests pin them, so
a fixture regeneration that introduces ties fails HERE with a clear
message instead of as a nondeterministic hash flake in the gate.

DuckDB-only (no Spark session): the invariants are properties of the
parquet bytes, not of any engine.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_user_ts_pairs_are_tie_free(sf_dir):
    """agg_first_last_by (max_by/arg_max on ts per user) is only
    hash-stable if no user has two events on the same microsecond —
    ns→µs truncation in io.load makes this a real risk on regenerated
    fixtures."""
    n_dup = duckdb.sql(
        f"""
        SELECT count(*) FROM (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS us_ts, count(*) AS c
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY 1, 2 HAVING count(*) > 1)
        """
    ).fetchone()[0]
    assert n_dup == 0, (
        f"{n_dup} (user_id, µs-ts) ties in {sf_dir}/events.parquet — "
        "agg_first_last_by's max_by/arg_max comparison is no longer "
        "deterministic; add a tie-break column to the operator AND oracle"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_event_type_counts_are_tie_free(sf_dir):
    """sketch_topk_frequent's exact k-cut re-rank assumes distinct
    event_type frequencies (its docstring: 'tie-free at every SF')."""
    n_dup = duckdb.sql(
        f"""
        SELECT count(*) FROM (
            SELECT c, count(*) AS reps FROM (
                SELECT event_type, count(*) AS c
                FROM read_parquet('{sf_dir}/events.parquet')
                GROUP BY 1)
            GROUP BY c HAVING count(*) > 1)
        """
    ).fetchone()[0]
    assert n_dup == 0, (
        f"event_type frequency ties in {sf_dir}/events.parquet — "
        "sketch_topk_frequent's top-k cut is no longer deterministic"
    )
