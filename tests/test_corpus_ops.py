"""Invariants of the round-5 corpus/stats/scan additions that the SQL
oracles cannot express: binary payload equality, packing feasibility,
chunk coverage, and hash-split stability."""

from __future__ import annotations

import glob
import hashlib
import os

from pyspark.sql import functions as F

import basis_spark.operators  # noqa: F401  (registers all operators)
from basis_spark.io import load
from basis_spark.registry import QUERIES
from tests.conftest import SF_ORACLE


def test_binaryfile_content_matches_filesystem(spark):
    """scan_binaryfile's oracle pins (name, size); here the CONTENT is
    pinned byte-for-byte: Spark-side md5(content) must equal hashlib
    over the same files read straight from disk."""
    df = (
        spark.read.format("binaryFile")
        .load(os.path.join(SF_ORACLE, "*.parquet"))
        .select(
            F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("name"),
            F.md5(F.col("content")).alias("h"),
        )
    )
    got = {r["name"]: r["h"] for r in df.collect()}
    want = {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(SF_ORACLE, "*.parquet"))
    }
    assert got == want


def test_pack_nextfit_budget_and_contiguity(spark):
    """Every pack respects the 1024-token budget unless it holds a
    single oversized doc, and packs partition each source's doc_id
    range into contiguous, non-overlapping runs."""
    rows = QUERIES["pack_tokens_nextfit"](spark, SF_ORACLE).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        assert r["total_tokens"] <= 1024 or r["n_docs"] == 1, r
        by_source.setdefault(r["source"], []).append(r)
    for src, packs in by_source.items():
        packs.sort(key=lambda r: r["pack_id"])
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        for a, b in zip(packs, packs[1:]):
            assert a["max_doc"] < b["min_doc"], (src, a, b)


def test_chunk_overlap_covers_document(spark):
    """Chunks tile every document: chunk k starts at k*stride, strides
    cover the full text, and consecutive chunks share win-stride chars."""
    docs = {r["doc_id"]: r["text"] for r in
            load(spark, SF_ORACLE, "documents").select("doc_id", "text").collect()}
    out = QUERIES["chunk_docs_overlap"](spark, SF_ORACLE).collect()
    seen: dict[int, list] = {}
    for r in out:
        text = docs[r["doc_id"]]
        assert r["chunk_text"] == text[r["chunk_start"]: r["chunk_start"] + 120]
        seen.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in seen.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        # strides cover the text: last chunk starts within the tail
        last = chunks[-1]
        assert last["chunk_start"] < len(docs[doc_id])
        assert last["chunk_start"] + 90 >= len(docs[doc_id]) - 1 or \
            last["chunk_start"] + 120 >= len(docs[doc_id])
        for a, b in zip(chunks, chunks[1:]):
            assert b["chunk_start"] - a["chunk_start"] == 90
            overlap = a["chunk_start"] + len(a["chunk_text"]) - b["chunk_start"]
            if len(a["chunk_text"]) == 120:
                assert overlap == 30


def test_mixture_balance_is_a_subset_and_stable(spark):
    """Balanced corpus keeps a subset per lang (never more than the
    original), keeps the smallest lang in full, and is rerun-stable."""
    base = dict(
        load(spark, SF_ORACLE, "documents").groupBy("lang").count().collect()
    )
    out1 = {r["lang"]: r["n_kept"] for r in
            QUERIES["corpus_mixture_balance"](spark, SF_ORACLE).collect()}
    out2 = {r["lang"]: r["n_kept"] for r in
            QUERIES["corpus_mixture_balance"](spark, SF_ORACLE).collect()}
    assert out1 == out2  # hash membership, not RNG
    cap = min(base.values())
    smallest = min(base, key=lambda k: base[k])
    assert out1[smallest] == base[smallest] == cap
    for lang, kept in out1.items():
        assert kept <= base[lang]


def test_ks_self_comparison_is_zero(spark, duck):
    """KS of a sample against itself must be exactly 0 — pins the
    cumulative-share arithmetic of the two-pass scaffold."""
    import basis_spark.operators.stats as stats

    orig_b = stats.GROUP_B
    stats.GROUP_B = stats.GROUP_A
    try:
        row = QUERIES["stat_ks_two_sample"](spark, SF_ORACLE).collect()[0]
    finally:
        stats.GROUP_B = orig_b
    # A vs A: both indicator columns count the same rows
    assert row["ks_stat"] == 0.0
    assert row["n_a"] == row["n_b"]


def test_histogram_numeric_invariants(spark):
    """agg_histogram_numeric is approximate (bin placement is
    data-order dependent) but two invariants are exact: heights sum to
    the row count, and every bin center lies inside [min, max]."""
    li = load(spark, SF_ORACLE, "lineitem")
    n = li.count()
    lo, hi = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice")
    ).collect()[0]
    bins = QUERIES["agg_histogram_numeric"](spark, SF_ORACLE).collect()
    assert len(bins) == 10
    from tests.conftest import record_tolerance

    record_tolerance("agg_histogram_numeric", "abs(sum of bin heights - row count); all bin centers asserted within [min,max]", 1e-6, abs(sum(r["height"] for r in bins) - n))
    assert abs(sum(r["height"] for r in bins) - n) < 1e-6
    for r in bins:
        assert lo <= r["bin_center"] <= hi


def test_random_projection_norm_unbiased(spark):
    """JL unbiasedness: for a ±1 sign matrix, E[|Px|²/k] = |x|², so the
    MEAN norm ratio across the corpus must sit near 1 (per-vector the
    k=8 sketch has ~50% stdev — fine for a pre-filter ensemble, and
    why top-k RANKS are not asserted: the fixture embeddings are
    near-uniform random, so true distances concentrate within ~12% and
    no 8-d sketch can order them; measured corr ≈ 0.08)."""
    emb = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in
           load(spark, SF_ORACLE, "embeddings").collect()}
    proj = {r["vec_id"]: [r[f"p{j}"] for j in range(8)] for r in
            QUERIES["embeddings_random_projection"](spark, SF_ORACLE).collect()}
    assert set(proj) == set(emb)
    ratios = []
    for i, v in emb.items():
        true_sq = sum(x * x for x in v)
        proj_sq = sum(p * p for p in proj[i]) / 8.0
        ratios.append(proj_sq / true_sq)
    mean = sum(ratios) / len(ratios)
    # sigma/sqrt(500) ~= 0.023; 4-sigma band around 1
    assert 0.9 <= mean <= 1.13, mean


def test_scratch_gc_age_gated(tmp_path):
    """gc_stale_siblings deletes only prefix-matching entries older than
    the TTL and never the kept name — the contract that makes appId
    scoping self-cleaning without racing live sessions."""
    import time

    from basis_spark.io import gc_stale_siblings

    old_dir = tmp_path / "orders_bkt_old"
    old_dir.mkdir()
    (old_dir / "f").write_text("x")
    fresh_dir = tmp_path / "orders_bkt_fresh"
    fresh_dir.mkdir()
    keep_dir = tmp_path / "orders_bkt_keep"
    keep_dir.mkdir()
    other = tmp_path / "customer_bkt_old"
    other.mkdir()
    past = time.time() - 100000
    for p in (old_dir, keep_dir, other):
        os.utime(p, (past, past))

    gc_stale_siblings(str(tmp_path), prefix="orders_bkt_", keep="orders_bkt_keep")
    assert not old_dir.exists()          # aged + prefix match -> collected
    assert fresh_dir.exists()            # young -> kept
    assert keep_dir.exists()             # current session's name -> kept
    assert other.exists()                # different prefix -> kept
