"""Reactor (basis_spark/reactive.py): the reference's change-propagation
contract — new upstream blocks trigger downstream recomputation of ONLY
the new blocks, each consumed at most once, state surviving restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.reactive import Reactor
from tests.conftest import SF_SMALL


def _events_slice(spark, lo, hi):
    ev = load(spark, SF_SMALL, "events")
    return ev.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)).select(
        "event_id", "user_id", "event_type", "value"
    )


def test_incremental_propagation_at_most_once(spark, tmp_path):
    r = Reactor(spark, str(tmp_path))
    r.source("raw")

    def clicks_only(inc):
        return inc.filter(F.col("event_type") == "click").withColumn(
            "v2", F.round(F.col("value") * 2, 2)
        )

    r.node("clicks", clicks_only, inputs=["raw"])

    r.feed("raw", _events_slice(spark, 0, 300))
    assert set(r.poll()) == {"clicks"}
    first = r.read("clicks").count()
    exp_first = _events_slice(spark, 0, 300).filter(F.col("event_type") == "click").count()
    assert first == exp_first

    # no new input -> nothing moves, output unchanged (at most once)
    assert r.poll() == {}
    assert r.read("clicks").count() == first

    # second increment processed alone, accumulated output = full recompute
    r.feed("raw", _events_slice(spark, 300, 1000))
    assert set(r.poll()) == {"clicks"}
    total = r.read("clicks").count()
    exp_total = _events_slice(spark, 0, 1000).filter(F.col("event_type") == "click").count()
    assert total == exp_total
    assert r.n_blocks("clicks") == 2


def test_diamond_single_pass_and_block_counts(spark, tmp_path):
    """A diamond (raw -> a, b -> joined) must propagate a fresh source
    block to the sink in ONE poll, with each node appending exactly one
    block per pass."""
    r = Reactor(spark, str(tmp_path))
    r.source("raw")
    r.node("clicks", lambda inc: inc.filter(F.col("event_type") == "click"), ["raw"])
    r.node("purchases", lambda inc: inc.filter(F.col("event_type") == "purchase"), ["raw"])

    def per_user(c, p):
        cu = c.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_clicks"))
        pu = p.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_purch"))
        return cu.join(pu, "user_id", "full").na.fill(0)

    r.node("joined", per_user, ["clicks", "purchases"])

    r.feed("raw", _events_slice(spark, 0, 500))
    moved = r.poll()
    assert set(moved) == {"clicks", "purchases", "joined"}
    assert r.n_blocks("joined") == 1
    assert r.poll() == {}


def test_restart_resumes_from_persisted_state(spark, tmp_path):
    """A new Reactor over the same base_dir must NOT reprocess blocks a
    previous instance already consumed (metadata-DB parity)."""
    base = str(tmp_path)
    r1 = Reactor(spark, base)
    r1.source("raw")
    r1.node("out", lambda inc: inc.select("event_id"), ["raw"])
    r1.feed("raw", _events_slice(spark, 0, 100))
    r1.poll()
    assert r1.read("out").count() == 100

    r2 = Reactor(spark, base)  # fresh process, same wiring
    r2.source("raw")
    r2.node("out", lambda inc: inc.select("event_id"), ["raw"])
    assert r2.poll() == {}, "restart must not re-consume committed blocks"
    r2.feed("raw", _events_slice(spark, 100, 150))
    assert set(r2.poll()) == {"out"}
    assert r2.read("out").count() == 150  # 100 + 50, nothing duplicated


def test_partial_input_freshness(spark, tmp_path):
    """A node whose inputs advance unevenly receives None for the stale
    input and the increment for the fresh one."""
    r = Reactor(spark, str(tmp_path))
    r.source("a")
    r.source("b")
    seen = []

    def probe(ia, ib):
        seen.append((ia is not None, ib is not None))
        parts = [x.select("event_id") for x in (ia, ib) if x is not None]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    r.node("merged", probe, ["a", "b"])
    r.feed("a", _events_slice(spark, 0, 10))
    r.poll()
    r.feed("b", _events_slice(spark, 10, 30))
    r.poll()
    assert seen == [(True, False), (False, True)]
    assert r.read("merged").count() == 30


def test_crash_between_block_and_commit_replays_not_skips(spark, tmp_path):
    """Recovery contract: consumption state commits AFTER the output
    block lands, so a crash between the two re-processes the increment
    (at-least-once — a duplicate block readers dedupe) but never skips
    one. Simulated by deleting the consumption state a completed poll
    wrote."""
    import os

    r = Reactor(spark, str(tmp_path))
    r.source("raw")
    r.node("out", lambda inc: inc.select("event_id"), ["raw"])
    r.feed("raw", _events_slice(spark, 0, 100))
    r.poll()
    assert r.n_blocks("out") == 1

    os.remove(str(tmp_path / "out" / "_consumed.json"))  # crash before commit
    assert set(r.poll()) == {"out"}, "lost state must trigger replay"
    assert r.n_blocks("out") == 2  # duplicate block, nothing silently merged
    assert r.read("out").count() == 200
    assert r.read("out").dropDuplicates(["event_id"]).count() == 100
    assert r.poll() == {}  # recommitted; no further replay


def test_serve_daemon_propagates_fed_blocks(spark, tmp_path):
    """The persistent runtime shape: a daemon thread running serve()
    must pick up blocks fed by ANOTHER thread (no explicit poll calls)
    and drain them downstream, then exit cleanly when told to stop."""
    import threading

    r = Reactor(spark, str(tmp_path))
    r.source("raw")
    r.node("clicks", lambda inc: inc.filter(F.col("event_type") == "click")
           if inc is not None else None, ["raw"])

    done = threading.Event()
    result: dict = {}

    def daemon():
        result["ret"] = r.serve(stop=done.is_set, poll_interval_s=0.01)

    t = threading.Thread(target=daemon)
    t.start()
    try:
        r.feed("raw", _events_slice(spark, 0, 40))
        deadline = 100
        while r.n_blocks("clicks") < 1 and deadline:
            import time

            time.sleep(0.05)
            deadline -= 1
        assert r.n_blocks("clicks") >= 1, "daemon never propagated the block"
        r.feed("raw", _events_slice(spark, 40, 80))
        deadline = 100
        while r.n_blocks("clicks") < 2 and deadline:
            import time

            time.sleep(0.05)
            deadline -= 1
        assert r.n_blocks("clicks") >= 2
    finally:
        done.set()
        t.join(timeout=30)
    assert not t.is_alive()
    passes, moved = result["ret"]
    assert moved >= 2
    expect = (
        _events_slice(spark, 0, 80).filter(F.col("event_type") == "click").count()
    )
    assert r.read("clicks").count() == expect


def test_serve_lease_excludes_second_daemon(spark, tmp_path):
    """Single-writer contract: while one daemon holds the lease, a
    second serve() on the same reactor dir must refuse to start; an
    ABANDONED lease (stale mtime, holder died without release) is
    stolen after the ttl."""
    import os
    import threading

    import pytest

    r = Reactor(spark, str(tmp_path))
    r.source("raw")
    done = threading.Event()
    t = threading.Thread(target=lambda: r.serve(stop=done.is_set, poll_interval_s=0.01))
    t.start()
    try:
        deadline = 100
        while not os.path.exists(r._lease_path()) and deadline:
            import time

            time.sleep(0.02)
            deadline -= 1
        r2 = Reactor(spark, str(tmp_path))
        with pytest.raises(RuntimeError, match="holds the lease"):
            r2._acquire_lease(lease_ttl_s=600.0)
    finally:
        done.set()
        t.join(timeout=30)
    assert not os.path.exists(r._lease_path()), "lease must be released on exit"
    # abandoned lease: fake a dead holder with an old mtime, then steal
    with open(r._lease_path(), "w") as f:
        f.write("99999")
    os.utime(r._lease_path(), (1, 1))
    r3 = Reactor(spark, str(tmp_path))
    r3._acquire_lease(lease_ttl_s=600.0)  # stale -> stolen, no raise
    r3._release_lease()
