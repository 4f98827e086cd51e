"""exact_jaccard_rerank's small-universe bitset path (r11): the W-long
bitset intersection must equal the array_intersect path bit-for-bit —
the two physical forms of the same exact re-rank. Covers:
- lane math across 64-bit word boundaries (toy universe > 64 tokens),
- the adaptive branch on the real fixture (ngram shingles, U = 377),
- the fallback guard (_BITSET_MAX_WORDS = 0 forces the array path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import basis_spark.operators.llm as llm
from tests.conftest import SF_ORACLE


def _toy_tables(spark):
    # universe 0..149 spans three 64-bit words; doc pairs with known
    # exact Jaccard: (1,2) inter=50 union=150 -> 0.3333; (1,3) disjoint.
    rows = [
        (1, list(range(0, 100))),
        (2, list(range(50, 150))),
        (3, list(range(200, 210))),
    ]
    t = (
        spark.createDataFrame(rows, "doc_id long, toks array<long>")
        .withColumn("n", F.size("toks"))
    )
    cand = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "i long, j long")
    return cand, t


def test_bitset_rerank_toy_universe_crosses_word_boundaries(spark):
    cand, t = _toy_tables(spark)
    got = {
        (r["i"], r["j"]): r["jac"]
        for r in llm.exact_jaccard_rerank(cand, t, threshold=0.1).collect()
    }
    assert got == {(1, 2): 0.3333}


def test_bitset_path_equals_array_path_on_fixture(spark, monkeypatch):
    sh = llm._ngram_shingles(spark, SF_ORACLE)
    bands = llm._band_keys(sh, llm._NGRAM_K, llm._NGRAM_B)
    cand = llm.banded_candidates(
        bands, ratio_num=62, ratio_den=100, min_bands=llm._NGRAM_MIN_BANDS
    ).localCheckpoint()
    new = sorted(
        map(tuple, llm.exact_jaccard_rerank(cand, sh, threshold=0.62).collect())
    )
    monkeypatch.setattr(llm, "_BITSET_MAX_WORDS", 0)  # force array path
    old = sorted(
        map(tuple, llm.exact_jaccard_rerank(cand, sh, threshold=0.62).collect())
    )
    assert new == old
    assert len(new) > 0  # the comparison must not be vacuous


def test_bitset_branch_actually_taken_on_fixture(spark):
    # the fixture's 3-gram universe is 377 (< 4096): the plan must carry
    # bit_count terms, not array_intersect
    sh = llm._ngram_shingles(spark, SF_ORACLE)
    cand = spark.createDataFrame([(1, 2)], "i long, j long")
    plan = (
        llm.exact_jaccard_rerank(cand, sh, threshold=0.62)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "bit_count" in plan and "array_intersect" not in plan
