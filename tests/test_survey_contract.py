"""SURVEY.md §2 <-> registry sync guard (round-3 verdict: 5 passing
analytics keys silently fell out of a regenerated §2.M table). The §2
inventory is the normative contract the driver's gate enforces, so the
document and queries() must enumerate exactly the same keys, both
directions, forever."""

from __future__ import annotations

import os
import re

import basis_spark.operators  # noqa: F401  (registers everything)
from basis_spark.registry import ORACLES, QUERIES

_SURVEY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md")


def _survey_keys() -> set[str]:
    text = open(_SURVEY).read()
    sec2 = text.split("## §2", 1)[1].split("\n## §3")[0]
    keys = set()
    for line in sec2.splitlines():
        if line.startswith("| `"):
            # first cell may enumerate several backticked keys (tpch row)
            cell = line.split("|")[1]
            keys.update(re.findall(r"`([a-z0-9_]+)`", cell))
    return keys


def test_survey_matches_registry_both_directions():
    survey, reg = _survey_keys(), set(QUERIES)
    assert survey - reg == set(), f"in SURVEY §2 but not registered: {sorted(survey - reg)}"
    assert reg - survey == set(), f"registered but missing from SURVEY §2: {sorted(reg - survey)}"


def test_every_oracle_key_is_registered():
    assert set(ORACLES) <= set(QUERIES)


def test_no_vacuous_oracles(duck):
    """Every oracle must return at least one row at sf0.01: a 0-row
    oracle hash-matches ANY implementation that also returns nothing
    (tpch_q22 sat vacuously green for three rounds this way — every
    fixture customer has orders, so its NOT EXISTS never fired until
    the predicate was recency-scoped in r4)."""
    from basis_spark.registry import ORACLES

    empty = [k for k, sql in ORACLES.items() if not duck.execute(sql).fetchall()]
    assert empty == [], f"vacuous (0-row) oracles: {empty}"


def test_rotation_front_budget():
    """The driver externally verifies only the FIRST 50 keys of
    queries() per round - the scarcest resource this build has. A
    mis-pinned window silently wastes slots on already-verified keys
    (an early r5 pin spent 22 slots that way, caught by hand; this
    ratchet makes that a test failure). Asserts: exactly 50 keys, all
    registered, rows-only keys permitted ONLY from the declared
    tolerance tier and only while never driver-checked even at the
    rows tier (r10 verdict item #5 orders that debt drained — the
    driver's rows+schema gate is still external evidence; strict keys
    otherwise take priority), none already recorded verified in
    tools/driver_verified_keys.json, and the pinned window actually
    leads queries() iteration order."""
    import json

    from basis_spark.operators import _ROTATION_FRONT

    assert len(_ROTATION_FRONT) == 50
    assert len(set(_ROTATION_FRONT)) == 50, "duplicate keys in window"
    assert set(_ROTATION_FRONT) <= set(QUERIES)

    dv_path = os.path.join(os.path.dirname(_SURVEY), "tools", "driver_verified_keys.json")
    dv = json.load(open(dv_path))
    non_strict = [k for k in _ROTATION_FRONT if k not in ORACLES]
    # Rows-only window keys must be exactly the declared-tier keys the
    # driver has never seen; a strict key may never be displaced by a
    # rows-only key that was already rows-checked in a prior round.
    bad = [k for k in non_strict if k in dv["rounds"]]
    assert bad == [], f"rows-only keys already driver-checked: {bad}"
    already = set(_ROTATION_FRONT) & set(dv["rounds"])
    assert already == set(), f"window wastes slots on verified keys: {sorted(already)}"
    assert dv.get("front") == _ROTATION_FRONT, "driver_verified_keys.json front out of sync"
    assert list(QUERIES)[:50] == _ROTATION_FRONT, "window does not lead queries() order"


def test_bench_profile_leg_keys_registered():
    """The sweep_all_sf --bench-profile invariance leg names its 20-key
    subset statically; a renamed or dropped key would make oracle_sweep
    record an EXC fail only at close-out. Pin the subset to the live
    registry (and to strict oracles — a rows-only key can't prove
    invariance) so drift fails fast in CI instead."""
    import importlib.util

    path = os.path.join(os.path.dirname(_SURVEY), "tools", "sweep_all_sf.py")
    spec = importlib.util.spec_from_file_location("sweep_all_sf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    keys = mod.BENCH_PROFILE_KEYS
    assert len(keys) == len(set(keys)) == 20
    missing = [k for k in keys if k not in QUERIES]
    assert missing == [], f"bench-profile leg names unknown keys: {missing}"
    non_strict = [k for k in keys if k not in ORACLES]
    assert non_strict == [], f"bench-profile leg has rows-only keys: {non_strict}"
