"""LLM-data-pipeline operators (SURVEY.md §2.L + task extensions):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + IVF/LSH scale paths), text analysis
(tokenize stats, tf-idf, language-ID, quality score, fingerprint).

Scale design (100 TB):
- Quadratic candidate generation is never global: near-dup ops either
  block on a key (lang) or use LSH banding; the brute-force forms exist
  as sf0.01 oracles only (BASELINE.md shows brute force times out at
  sf0.1 even in DuckDB).
- The MinHash path is hand-rolled banded LSH (xxhash64 minhashes, 32x8
  bands) with exact Jaccard re-rank of candidates, so output equals the
  exact answer while LSH only prunes — see dedup_near_minhash for why
  ml.feature.MinHashLSH was rejected.
- All array math is JVM-side higher-order functions (zip_with/aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.session import pinned_shuffle_partitions, spread_width
from basis_spark.registry import register


def _hashed_token_sets(docs: DataFrame, n_parts: int | None = None) -> DataFrame:
    """(doc_id, lang, toks: sorted array<long>, n) with tokens xxhash64-encoded.

    Two deliberate scale choices:
    - repartition: the fixture parquet is one tiny split; without this every
      pairwise op downstream runs on one core. At real scale the input
      already has many splits and this re-keys cheaply on doc_id.
    - int-encoding: token strings never leave the scan; all set algebra
      (intersect/union) runs on longs. 64-bit collisions (~V^2/2^64) are
      negligible and the encoding needs no vocabulary fit pass, unlike
      CountVectorizer — nothing to broadcast, works at any vocabulary size.
    """
    return (
        docs.repartition(n_parts or spread_width(64), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.array_sort(
                F.array_distinct(F.expr("transform(split(text, ' '), t -> xxhash64(t))"))
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
    )



def banded_candidates(
    bands: DataFrame, ratio_num: int, ratio_den: int, min_bands: int
) -> DataFrame:
    """Shared banded-LSH candidate generation (used by the token-minhash
    and char-shingle paths, which differ only in geometry constants):
    self-join on (lang, band key), size-ratio prefilter
    (min(n_a,n_b)/max >= ratio_num/ratio_den — a Jaccard >= num/den pair
    cannot have a worse size ratio), band-collision count, and the
    >= min_bands cut. One shuffle on the band key; output is bare
    (i, j) id pairs — the wide token payload never enters this join."""
    a, b = bands.alias("a"), bands.alias("b")
    size_ok = (F.col("b.n") * ratio_den >= F.col("a.n") * ratio_num) & (
        F.col("a.n") * ratio_den >= F.col("b.n") * ratio_num
    )
    return (
        a.join(b, ["lang", "key"])
        .filter((F.col("a.doc_id") < F.col("b.doc_id")) & size_ok)
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= min_bands)
        .select("i", "j")
    )


_BITSET_MAX_WORDS = 64  # bitset re-rank only below 4096 distinct tokens


def exact_jaccard_rerank(
    cand: DataFrame, t: DataFrame, threshold: float, bitset: bool = True
) -> DataFrame:
    """Shared exact re-rank: keep candidate pairs above the exact-Jaccard
    threshold. Two physical forms, chosen from the measured token
    universe (an AQE-style driver-side decision, guide §1.1):

    - Small universe (U <= 4096 distinct tokens — char-shingle alphabets,
      closed vocabularies): encode each doc's set as a W = ceil(U/64)-long
      bitset via a dense dictionary, so |A∩B| is W AND+popcount terms in
      codegen and the pair join carries 8W bytes instead of the full
      token array (guide §2.3 shuffle keys/metadata, §8 decide with
      small rows). Measured at sf0.1 (U = 377/31): the 2M-pair ngram
      re-rank drops from per-pair hash-set intersects over 143-long
      arrays to 6 bit_count terms. The dictionary id pass is a
      row_number over the <= 4096-row universe (bounded by the branch
      condition itself, never data-sized). Exact by construction:
      distinct tokens get distinct bits, so popcount(A&B) = |A∩B|.
    - Large universe: the original per-pair array_intersect, with AQE
      broadcasting the set table while small and shuffle-joining at
      scale (a mandatory broadcast of a corpus-sized table would be an
      OOM order at 100 TB).

    Both callers produce same-lang pairs; the dictionary is global, so
    correctness does not depend on that.

    `bitset=False` forces the array form without the universe probe. The
    encoding has a fixed cost of three extra jobs per build (universe
    count, dictionary window, bitset aggregation) that only amortizes
    over a dense candidate set: the 0.62 char-shingle caller re-ranks
    ~2M pairs at sf0.1 and wins big, but the 0.9 word-token callers see
    few near-threshold candidates and measured 30-60% SLOWER with the
    probe + encode in the path (r11 A/B, idle-adjacent pairs). Those
    callers' vocabularies are also open-ended — above the 4096 cap at
    any real scale — so skipping the probe is the same decision the
    auto branch would reach on production data, minus the probe job.
    """
    if bitset:
        # r12 (guide §1.2/§2.1): the universe subtree (explode+distinct)
        # used to be recomputed three times — once for the U probe, once
        # inside the dictionary window, once more under the broadcast —
        # and the probe's distinct ran at session shuffle width although
        # its output is capped at 4096 rows by this very branch.
        # Checkpoint the universe lazily (one materialization, reused by
        # the dictionary) and pin the probe's width to the map-side
        # bound: each map task's partial-distinct output is <= the 4096
        # universe cap when the bitset branch applies, so n_map x 4096
        # is the exchange ceiling. At scale the map-partition count
        # pushes the estimate back to the session width, so this is
        # data-proportional, not a local[32] constant. Measured at
        # sf0.1: probe 0.88 s -> 0.2 s, whole build 2.6 s -> ~1.4 s.
        tok_u = (
            t.select(F.explode("toks").alias("tok"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        spark = t.sparkSession
        n_map = t.rdd.getNumPartitions()
        with pinned_shuffle_partitions(spark, n_map * (_BITSET_MAX_WORDS * 64)):
            U = tok_u.count()
    else:
        U = 0
    W = max(1, (U + 63) // 64)
    if 0 < U and W <= _BITSET_MAX_WORDS:
        dic = tok_u.select(
            "tok", (F.row_number().over(Window.orderBy("tok")) - 1).alias("bid")
        )
        bs = (
            t.select("doc_id", "n", F.explode("toks").alias("tok"))
            .join(F.broadcast(dic), "tok")
            .groupBy("doc_id")
            .agg(
                F.first("n").alias("n"),
                *[
                    F.sum(
                        F.expr(
                            f"CASE WHEN bid DIV 64 = {w}"
                            " THEN shiftleft(1L, CAST(bid % 64 AS INT))"
                            " ELSE 0L END"
                        )
                    ).alias(f"w{w}")
                    for w in range(W)
                ],
            )
        )
        # Both pair sides broadcast bs; without this the whole
        # explode+join+agg subplan runs twice (no ReusedExchange across
        # differently-aliased broadcasts). Lazy local checkpoint =
        # materialize once on first use, ~48B+8W per doc.
        bs = bs.localCheckpoint(eager=False)
        sa = bs.select(
            F.col("doc_id").alias("i"),
            F.col("n").alias("na"),
            *[F.col(f"w{w}").alias(f"xa{w}") for w in range(W)],
        )
        sb = bs.select(
            F.col("doc_id").alias("j"),
            F.col("n").alias("nb"),
            *[F.col(f"w{w}").alias(f"xb{w}") for w in range(W)],
        )
        inter = F.lit(0)
        for w in range(W):
            inter = inter + F.expr(f"bit_count(xa{w} & xb{w})")
    else:
        sa = t.select(
            F.col("doc_id").alias("i"), F.col("toks").alias("ta"), F.col("n").alias("na")
        )
        sb = t.select(
            F.col("doc_id").alias("j"), F.col("toks").alias("tb"), F.col("n").alias("nb")
        )
        inter = F.size(F.array_intersect("ta", "tb"))
    return (
        cand.join(sa, "i")
        .join(sb, "j")
        .select(
            "i",
            "j",
            F.round(inter.cast("double") / (F.col("na") + F.col("nb") - inter), 4).alias("jac"),
        )
        .filter(F.col("jac") > threshold)
    )


# ---------------------------------------------------------------- dedup ----


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, lang
    FROM (
        SELECT doc_id, text, lang,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents) t
    WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact dedup: hash-group on content, keep smallest doc_id per group.
    # At scale this is one shuffle on md5(text) (64 hex chars, uniform).
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.md5("text").alias("text_md5"), "lang")
    )


_B11_ORACLE = """
    SELECT i, j, jac FROM (
        SELECT a.doc_id AS i, b.doc_id AS j,
               round(CAST(len(list_intersect(string_split(a.text, ' '),
                                             string_split(b.text, ' '))) AS DOUBLE)
                     / len(list_distinct(string_split(a.text, ' ')
                                         || string_split(b.text, ' '))), 4) AS jac
        FROM documents a JOIN documents b
          ON a.doc_id < b.doc_id AND a.lang = b.lang) t
    WHERE jac > 0.9
    ORDER BY i, j
    LIMIT 100
"""


def _exact_jaccard_pairs(docs: DataFrame) -> DataFrame:
    """Exact token-set Jaccard for same-lang doc pairs (i < j)."""
    toks = docs.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    return pairs.select(
        F.col("a.doc_id").alias("i"),
        F.col("b.doc_id").alias("j"),
        F.round(inter.cast("double") / union, 4).alias("jac"),
    )


# Memoized persisted (token-sets, band-keys) per (session, sf_dir).
# Persisting per CALL would stack InMemoryRelations (Spark's CacheManager
# matches the new identical plan against the previous call's cache, then
# caches that again): measured 8.7s -> 18.2s -> 54.4s across three
# invocations. Fixtures are immutable, so one persisted copy per sf_dir
# is sound and bounded (~2 MB per 1000 docs). Keys include the Spark
# applicationId so a session restart in the same process rebuilds rather
# than handing back DataFrames bound to a stopped session.
_MINHASH_K, _MINHASH_B = 256, 32
_minhash_cache: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def clear_minhash_caches() -> None:
    """Unpersist and drop all memoized minhash indexes (bench cold runs)."""
    for t, bands in _minhash_cache.values():
        for df in (t, bands):
            try:
                df.unpersist()
            except Exception:
                pass
    _minhash_cache.clear()
    for cand in _minhash_cand_cache.values():
        try:
            cand.unpersist()
        except Exception:
            pass
    _minhash_cand_cache.clear()
    for sh in _ngram_cache.values():
        try:
            sh.unpersist()
        except Exception:
            pass
    _ngram_cache.clear()


def _band_keys(t: DataFrame, K: int, B: int) -> DataFrame:
    """Explode a (doc_id, lang, toks: array<long>, n) frame into one row
    per (doc, band): K minhashes split into B bands of r = K/B, each band
    hashed to a single long key. All JVM expressions — the geometry
    (K, B) sets the similarity threshold the banding is sensitive to:
    collision prob per band is jac^(K/B).

    The K hash functions are the 2-universal linear family over the
    already-xxhash64-encoded tokens: h_k(t) = (a_t + k * b_t) mod p with
    p = 2^31 - 1 (Mersenne), a_t = t & 2^60-1, b_t = xxhash64(t, 1) &
    2^31-1. One extra xxhash per token instead of K per token — measured
    1.57 s -> 0.3 s for the K=256 signature+band stage at sf0.1
    (higher-order lambdas are interpreted, so each avoided xxhash64 eval
    counts). The masks keep the multiply-add inside int64 under ANSI mode
    (max 2^60 + 256 * 2^31 < 2^63). The mod is load-bearing, not hygiene:
    without it the argmin over tokens is monotone in a single term (a for
    small k, b for large k), collapsing all K orderings to ~one and
    gutting recall (observed: oracle fails at sf0.01). With it each k
    induces a pseudo-independent ordering — the standard (a + k*b) mod p
    minhash family — and the downstream exact re-rank means the family
    only affects the prefilter's recall, which
    test_minhash_candidates_have_full_recall pins on every fixture."""
    R = K // B
    M60, M31 = (1 << 60) - 1, (1 << 31) - 1
    P = (1 << 31) - 1

    # r11 (guide §4.2): the signature used to be a JVM higher-order
    # expression — transform(sequence(0,K-1), k -> array_min(zip_with(
    # toks, h2, (a,b) -> pmod((a & M60) + k*b, P)))). HOF lambdas are
    # INTERPRETED, so that is K x |toks| lambda evaluations per doc
    # (char-shingle geometry: 256 x ~700 x 5000 docs ≈ 900M evals,
    # 5.7 s of the dedup_ngram_jaccard stage budget at sf0.1). The same
    # arithmetic in one numpy broadcast per row is exact int64 (max
    # (2^60-1) + 255*(2^31-1) < 2^63; % == pmod on non-negatives) and
    # Arrow-batched, so signatures are BIT-IDENTICAL and the stage is
    # ~5x cheaper. Token hashing (xxhash64) stays in the JVM — only the
    # (a + k*b) mod P minhash fold crosses, as two long arrays per doc.
    import numpy as np
    import pandas as pd

    ks = np.arange(K, dtype=np.int64)

    # No type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf's hint-based dispatch then rejects the
    # signature; the explicit returnType is authoritative anyway.
    @F.pandas_udf("array<long>")
    def _minhash_sig(toks_s, h2_s):
        out = []
        for toks, h2 in zip(toks_s, h2_s):
            if toks is None or h2 is None or len(toks) == 0:
                # mirror the old expression: zip_with(NULL,...) / empty
                # input yielded an all-NULL / NULL-min signature
                out.append([None] * K)
                continue
            a = np.asarray(toks, dtype=np.int64) & M60
            b = np.asarray(h2, dtype=np.int64)
            m = (a[:, None] + b[:, None] * ks[None, :]) % P
            out.append(m.min(axis=0))
        return pd.Series(out)

    return (
        t.withColumn("h2", F.expr(f"transform(toks, t -> xxhash64(t, 1) & {M31})"))
        .withColumn("sig", _minhash_sig("toks", "h2"))
        .select(
            "doc_id",
            "lang",
            "n",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {B - 1}), b -> xxhash64(b, slice(sig, b*{R} + 1, {R})))"
                )
            ).alias("key"),
        )
    )


def _minhash_bands(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    mk = (spark.sparkContext.applicationId, sf_dir)
    if mk in _minhash_cache:
        return _minhash_cache[mk]
    t = _hashed_token_sets(load(spark, sf_dir, "documents")).persist()
    bands = _band_keys(t, _MINHASH_K, _MINHASH_B).persist()
    _minhash_cache[mk] = (t, bands)
    return t, bands


_minhash_cand_cache: dict[tuple[str, str, int], DataFrame] = {}


def _minhash_candidates(
    spark: SparkSession, sf_dir: str, min_bands: int = 2
) -> DataFrame:
    """Candidate (i, j) pairs surviving the band-count prefilter.

    Counting colliding bands per pair is free relative to the previous
    dropDuplicates (same shuffle, count instead of distinct) and is
    itself a Jaccard estimator: a band collides w.p. jac^r. Requiring
    >= 2 of 32 bands keeps a true 0.9-pair w.p. 1 - 4e-7 (per-band
    p = 0.9^8 = 0.43) while a median fixture pair (jac 0.63, per-band
    p = 0.025) rarely reaches 2 — measured 1.24M -> 730K candidates at
    sf0.1 for zero extra data movement.

    Why no K=256 signature-agreement second stage (tried, reverted):
    fixture token sets average n = 23 xxhash64-encoded longs, so the
    exact array_intersect re-rank costs LESS per pair than comparing
    two 256-long signatures — the sharper filter took q11 from ~1 s to
    ~12 s per call at sf0.1 (wide-sig join + 256-element zip_with per
    pair). A signature stage only pays when exact re-rank units are
    large (e.g. shingle sets of long documents), not here.

    Band self-join, not bucket explosion: a groupBy-collect_list +
    in-bucket nested-transform pair explosion was tried and measured
    4-5x SLOWER fused-cold at sf0.1 (8.4 s vs 1.8 s) — the per-element
    slice() inside the lambda re-copies the bucket tail for every
    anchor (O(b^2) array allocs; max fixture bucket b=832), and a hot
    bucket's whole pair set materializes in one row on one core. The
    sort-merge/shuffle self-join spreads the same 10.7M raw pairs
    across all cores with no intermediate arrays.

    The candidate set is memoized/persisted per (session, sf_dir,
    min_bands) like the banding index itself: fixtures are immutable,
    candidates are a derived index (~12 MB of bare (i, j) at sf0.1).
    Bench cold runs call clear_minhash_caches() first, so reported cold
    numbers include this whole build. Persists are lazy, so a cold
    operator call runs ONE fused job end-to-end — measured 1.2-1.8 s
    cold / 0.6 s warm at sf0.1.
    """
    ck = (spark.sparkContext.applicationId, sf_dir, min_bands)
    if ck in _minhash_cand_cache:
        return _minhash_cand_cache[ck]
    _, bands = _minhash_bands(spark, sf_dir)
    cand = banded_candidates(bands, ratio_num=9, ratio_den=10, min_bands=min_bands).persist()
    _minhash_cand_cache[ck] = cand
    return cand


@register("dedup_near_minhash", oracle=_B11_ORACLE)
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup with exact re-rank (B11 semantics).

    Hand-rolled LSH, all JVM expressions (no Spark ML): K=256 minhashes
    per doc (min over xxhash64(token, seed k)), banded into B=32 bands of
    r=8; docs sharing any band key (within a lang block) become candidate
    pairs; exact token-set Jaccard re-ranks candidates, so the output
    equals brute force. Recall: with the >=2-of-32 colliding-band rule
    _minhash_candidates applies (r2), P[miss a 0.9-pair] ~= 4e-7 — the
    any-band figure (1 - 0.9^8)^32 ~= 1.6e-8 holds only for min_bands=1.

    Why not ml.feature.MinHashLSH: approxSimilarityJoin bands with r=1,
    so on near-dup-dense corpora (fixture median pair Jaccard = 0.63)
    nearly every pair collides in some table and the join degenerates to
    an exploded quadratic with per-row ML distance UDFs — measured 296 s
    at sf0.1 vs ~9 s for this plan.

    Scale path: candidates shuffle as bare (i, j) ids — token arrays are
    joined back afterwards (AQE/broadcast locally; shuffle join at real
    scale), keeping the wide payload out of the band shuffle and the
    pair dedup. A size-ratio prefilter (jac > t needs |A|/|B| >= t)
    drops impossible pairs before any set algebra, and the band-count
    prefilter (_minhash_candidates) cuts the exact re-rank set ~40%
    with zero extra shuffle — on the near-dup-dense fixture corpus
    ~half of all same-lang pairs collide in SOME band, so pruning
    before set algebra is what keeps re-rank work near-threshold.
    """
    return _exact_neardup_pairs(spark, sf_dir).orderBy("i", "j").limit(100)


def _exact_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full (i, j, jac) set with exact token Jaccard > 0.9, i < j —
    minhash-banded candidates re-ranked exactly (see dedup_near_minhash
    for the recall analysis). Shared by the pair view (B11) and the
    connected-components clustering pass."""
    t, _ = _minhash_bands(spark, sf_dir)
    cand = _minhash_candidates(spark, sf_dir)
    # bitset=False: near-threshold 0.9 candidates are sparse and the
    # word vocabulary is open-ended (see exact_jaccard_rerank).
    return exact_jaccard_rerank(cand, t, threshold=0.9, bitset=False)


# Char-shingle banding geometry for the 0.62 oracle threshold,
# re-derived in r12 (guide §3 candidate pruning; the exact re-rank
# defines the output, so banding only sets recall and raw-collision
# mass). r = 3, B = 85 (255 of the 256 minhashes banded), >= 4
# colliding bands:
# - recall: a pair at exactly jac 0.62 collides per band w.p.
#   0.62^3 = 0.238 (expected 20.3 of 85); P[< 4 bands] = 3.0e-7,
#   falling to 8.3e-9 at 0.65 and 4.7e-12 at 0.70.
# - selectivity at the web-scale bulk: P[candidate | jac 0.3] = 0.20
#   (the previous r = 2, B = 128, >= 16 geometry: 0.11 — comparable).
# - collision MASS (what the r2 geometry got wrong): this corpus is
#   near-dup dense (same-lang pairs mostly at jac 0.45-0.65), and at
#   r = 2 such a pair collides in an expected 26-49 of 128 bands —
#   measured 85.8M raw (band, i, j) collision rows at sf0.1 feeding
#   the per-pair count aggregation, ~2.3 s of the key. At r = 3 the
#   same pairs collide in 7.8-18 of 85 bands: 32M raw rows (-2.7x)
#   for a near-identical candidate set (1.972M vs 1.982M pairs).
# - r = 4, B = 64, >= 2 was MEASURED AND REJECTED: its 4.4e-4 miss
#   probability at the exact threshold is not hypothetical — it
#   dropped 2 of the 97,153 qualifying sf0.1 pairs. Do not re-try.
# Empirical gate: full re-ranked output old-vs-new geometry diffed
# IDENTICAL (0 missing, 0 extra) at sf0.001/0.01/0.1.
_NGRAM_K, _NGRAM_B, _NGRAM_MIN_BANDS = 256, 85, 4
_ngram_cache: dict[tuple[str, str], DataFrame] = {}


def _ngram_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct xxhash64-encoded char-3-gram shingle sets per doc,
    memoized/persisted per (session, sf_dir) like the minhash index
    (per-call persist stacks InMemoryRelations; see _minhash_cache)."""
    mk = (spark.sparkContext.applicationId, sf_dir)
    if mk in _ngram_cache:
        return _ngram_cache[mk]
    # length >= 3 guard: Spark's sequence(1, len-2) DESCENDS for len < 3
    # ([1, 0, -1]-style), fabricating junk shingles a shorter-than-gram
    # doc must not have (the oracle's range() is empty there). A doc
    # with no shingles can never pair, so filtering it equals emitting
    # an empty set.
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 3)
    sh = (
        docs.repartition(spread_width(64), "doc_id")
        .select(
            "doc_id",
            "lang",
            F.array_sort(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, length(text) - 2),"
                        " i -> xxhash64(substring(text, i, 3)))"
                    )
                )
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
        .persist()
    )
    _ngram_cache[mk] = sh
    return sh


@register(
    "dedup_ngram_jaccard",
    oracle="""
    SELECT i, j, jac FROM (
        SELECT a.doc_id AS i, b.doc_id AS j,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(a.sh || b.sh)), 4) AS jac
        FROM (SELECT doc_id, lang,
                     list_distinct([substring(text, i, 3)
                                    for i in range(1, length(text) - 1)]) AS sh
              FROM documents) a
        JOIN (SELECT doc_id, lang,
                     list_distinct([substring(text, i, 3)
                                    for i in range(1, length(text) - 1)]) AS sh
              FROM documents) b
          ON a.doc_id < b.doc_id AND a.lang = b.lang) t
    WHERE jac > 0.62
    ORDER BY i, j
    LIMIT 100
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram Jaccard near-dup via banded MinHash-LSH + exact re-rank.

    Same architecture as dedup_near_minhash but over character shingles
    and with band geometry tuned for the 0.62 threshold (see the
    _NGRAM_* derivation above): shingle sets -> 256 minhashes -> 85
    bands of r=3 -> band-bucket self-join within lang -> band-count
    (>=4) + size ratio (jac > 0.62 needs |A|/|B| >= 0.62) prefilters ->
    exact shingle Jaccard re-rank, so output equals the brute-force
    oracle up to a 3.0e-7 per-pair miss probability at the exact
    threshold (steeply less above it). No full-corpus broadcast and no
    quadratic pair join: candidates come from band buckets (shuffle on
    (lang, band-key)), and the re-rank joins the per-doc shingle table
    back by id (AQE picks broadcast locally; shuffle join at scale).
    Replaces the previous explicit F.broadcast(corpus) quadratic form,
    which was OOM-by-design at 100 TB.
    """
    sh = _ngram_shingles(spark, sf_dir)
    # r12: the band self-join broadcasts one side, and a broadcast of a
    # differently-aliased subtree is never a ReusedExchange — the
    # committed before-plan shows the minhash-signature ArrowEvalPython
    # TWICE (once per join side). Lazy local checkpoint = signatures
    # computed once, both sides read the materialized rows (same move
    # as the re-rank's bitset table).
    bands = _band_keys(sh, _NGRAM_K, _NGRAM_B).localCheckpoint(eager=False)
    cand = banded_candidates(
        bands, ratio_num=62, ratio_den=100, min_bands=_NGRAM_MIN_BANDS
    )
    return (
        exact_jaccard_rerank(cand, sh, threshold=0.62)
        .orderBy("i", "j")
        .limit(100)
    )


@register(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ),
    bits AS (
        SELECT doc_id, g.j,
               CASE WHEN sum(2 * (CAST(floor(
                        (strpos('0123456789abcdef',
                                substring(md5(token), CAST(g.j // 4 AS INTEGER) + 1, 1))
                         - 1) / power(2, g.j % 4)) AS BIGINT) % 2) - 1) > 0
                    THEN '1' ELSE '0' END AS b
        FROM tok, generate_series(0, 63) g(j)
        GROUP BY doc_id, g.j
    )
    SELECT doc_id, string_agg(b, '' ORDER BY j) AS simhash
    FROM bits GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint from the md5 of each distinct token.

    Bit j comes from nibble j//4 (hex char of md5), shift j%4; the doc's
    bit is the sign of the token vote sum. All built-in expressions —
    explode(token) x explode(bit position) then two groupBys.
    """
    return _simhash_bits(load(spark, sf_dir, "documents"))


def _simhash_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n, c): n = distinct tokens per doc, c = 64 bit-counts —
    c[j] = how many of those tokens have fingerprint bit j set, where
    bit j comes from nibble j//4 of the token's md5 hex shifted j%4
    (the dedup_simhash oracle's exact bit convention). The j-th sign
    vote is then s_j = 2*c[j] - n, so bit_j of the doc = (2*c[j] > n).

    r11 (guide §2.3, aggregate before you shuffle): the previous shape
    exploded every (doc, token) row 64x into (doc, j, vote) rows and
    hash-aggregated 64x|tokens| rows across two shuffles. The 64
    counters now accumulate in ONE groupBy as 16 packed longs — each
    packed column covers one md5 nibble's 4 bits in four 16-bit lanes
    (bit j rides lane j%4 of column j//4) — so the aggregation input
    is |tokens| rows, every add is codegen'd integer math, and the
    shuffle is 17 longs per doc. Lane width 16 bounds distinct tokens
    per doc at 65535 (fixture max is ~300; for bigger docs widen to
    32-bit lanes / 32 columns). Measured at sf0.1: the two simhash
    keys' fused stage drops ~3x (see OPTIMIZATION_r11.md)."""
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    # r12 negative result, recorded so it is not re-tried: staging this
    # projection (md5 halves -> nibble columns -> lane columns across
    # three selects, to shrink the analyzed tree) measured STRICTLY
    # WORSE — analysis cost unchanged (~0.9 s either way; the md5
    # duplication below is CSE'd and is not where analysis time goes)
    # and pure execution of the staged form 0.51 s -> 1.30 s at sf0.1.
    # The win for the pairs consumer is materializing the RESULT once
    # (see dedup_simhash_pairs), not reshaping this expression.
    h = F.md5("token")
    # hex chars 1-8 / 9-16 as two 32-bit ints: nibble m of the hex
    # string is then (h1 >> 4*(7-m)) & 15 (m < 8) / same on h2 (m >= 8)
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")
    packed = []
    for m in range(16):
        nib = F.shiftright(h1 if m < 8 else h2, 4 * (7 - m % 8)).bitwiseAND(F.lit(15))
        lanes = None
        for lane in range(4):
            b = F.shiftright(nib, lane).bitwiseAND(F.lit(1)).cast("long")
            term = F.shiftleft(b, 16 * lane)
            lanes = term if lanes is None else lanes + term
        packed.append(lanes.alias(f"p{m}"))
    agg = (
        tok.select("doc_id", *packed)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"p{m}").alias(f"s{m}") for m in range(16)],
        )
    )
    c = F.array(
        *[
            F.shiftright(F.col(f"s{j // 4}"), 16 * (j % 4))
            .bitwiseAND(F.lit(65535))
            .cast("long")
            for j in range(64)
        ]
    )
    return agg.select("doc_id", "n", c.alias("c"))


def _simhash_bits(docs: DataFrame) -> DataFrame:
    return _simhash_counts(docs).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.col("c"),
                lambda x: F.when(2 * x > F.col("n"), F.lit("1")).otherwise(F.lit("0")),
            ),
            "",
        ).alias("simhash"),
    )


@register(
    "dedup_cosine_neardup",
    oracle="""
    SELECT i, j, cos FROM (
        SELECT a.vec_id AS i, b.vec_id AS j,
               round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) t
    WHERE cos > 0.4
    ORDER BY i, j
    LIMIT 200
    """,
)
def dedup_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Embedding-cosine near-dup, brute force (correctness form; the LSH
    # scale path is similarity_topk_lsh / the IVF operator). Repartition:
    # the fixture parquet is one split; without it the O(n^2) join runs
    # on a single core. Threshold 0.4 is calibrated to the fixture
    # embeddings (random near-orthogonal 64-d: max pair cos ~0.5, 59
    # pairs > 0.4 at sf0.01) — the previous 0.95 returned 0 rows, and
    # 0 == 0 passes the gate even with a broken dot product (VERDICT r1).
    emb = load(spark, sf_dir, "embeddings").repartition(spread_width(32), "vec_id")
    a = emb.alias("a")
    b = emb.alias("b")
    dot = F.expr(
        "aggregate(zip_with(a.embedding, b.embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("i"),
            F.col("b.vec_id").alias("j"),
            F.round(dot, 6).alias("cos"),
        )
        .filter(F.col("cos") > 0.4)
        .orderBy("i", "j")
        .limit(200)
    )


# ------------------------------------------------------- similarity search ----


# B10 — brute-force cosine top-k against a query vector.
@register(
    "similarity_topk",
    oracle="""
    WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_sum(list_transform(list_zip(embedding, (SELECT e FROM q)),
                 x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
    FROM embeddings WHERE vec_id <> 0
    ORDER BY cos DESC, vec_id
    LIMIT 10
    """,
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))  # 1-row broadcast — no shuffle, no collect
        .select("vec_id", "label", F.round(dot, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "similarity_ann_ivf",
    oracle="""
    WITH ev AS (
        SELECT vec_id, label, g.i, embedding[g.i]::DOUBLE AS x
        FROM embeddings, generate_series(1, 64) g(i)
    ),
    q AS (SELECT i, x AS qx FROM ev WHERE vec_id = 0),
    cent AS (SELECT label, i, avg(x) AS v FROM ev GROUP BY 1, 2),
    cscore AS (
        SELECT label, round(sum(v * qx), 6) AS cs
        FROM cent JOIN q USING (i) GROUP BY 1
    ),
    probe AS (SELECT label FROM cscore ORDER BY cs DESC, label LIMIT 2),
    dots AS (
        SELECT ev.vec_id, ev.label, round(sum(ev.x * q.qx), 6) AS cos
        FROM ev JOIN q USING (i)
        WHERE ev.label IN (SELECT label FROM probe) AND ev.vec_id != 0
        GROUP BY 1, 2
    )
    SELECT vec_id, label, cos FROM dots ORDER BY cos DESC, vec_id LIMIT 10
    """,
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: label-partitioned inverted file, probe top-2 centroids.

    Coarse quantizer = per-label centroid; the query scans only probed
    partitions (2/10 of the data at scale). Although the ANN FAMILY is
    approximate, this member is a deterministic function of the data
    (centroid average -> argmax-2 probe -> exact re-rank within probed
    cells), so it carries a strict oracle (promoted r8 from the
    rows-only tier): both engines round the probe score AND the final
    cosine at 6dp BEFORE ordering so float summation order can't flip
    a near-tie differently per engine — the same guard
    similarity_centroid_classify (strict, driver-verified r5) uses.
    tests/test_tolerance.py additionally asserts the result equals the
    exact brute-force top-10 within the probed cells.
    """
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    # centroids: elementwise mean via posexplode + re-assemble
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("v"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
            ).alias("centroid")
        )
    )
    cdot = F.expr(
        "aggregate(zip_with(centroid, qe, (x, y) -> x * CAST(y AS DOUBLE)),"
        " 0D, (s, v) -> s + v)"
    )
    probe = (
        cent.join(F.broadcast(q))
        .select("label", F.round(cdot, 6).alias("cscore"))
        .orderBy(F.desc("cscore"), F.asc("label"))
        .limit(2)
        .select("label")
    )
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        emb.join(F.broadcast(probe), "label")  # partition pruning analogue
        .filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", "label", F.round(dot, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "similarity_knn_join",
    oracle="""
    WITH ev AS (
        SELECT vec_id, g.i, embedding[g.i]::DOUBLE AS x
        FROM embeddings, generate_series(1, 64) g(i)
    ),
    c AS (
        SELECT e.label AS clabel, ev.i, avg(ev.x) AS v
        FROM ev JOIN embeddings e ON ev.vec_id = e.vec_id
        GROUP BY 1, 2
    ),
    d AS (
        SELECT ev.vec_id, c.clabel, round(sum(ev.x * c.v), 6) AS dot
        FROM ev JOIN c ON ev.i = c.i
        GROUP BY 1, 2
    )
    SELECT vec_id, clabel AS pred_label, dot AS score FROM (
        SELECT vec_id, clabel, dot,
               row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, clabel) AS rn
        FROM d) t
    WHERE rn = 1
    """,
)
def similarity_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-label centroids, then nearest-centroid assignment for every vector.
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "xf")
    ).select("vec_id", "label", (F.col("pos") + 1).alias("i"), F.col("xf").cast("double").alias("x"))
    cent = ev.groupBy(F.col("label").alias("clabel"), "i").agg(F.avg("x").alias("v"))
    d = (
        ev.select("vec_id", "i", "x")
        .join(cent, "i")
        .groupBy("vec_id", "clabel")
        .agg(F.round(F.sum(F.col("x") * F.col("v")), 6).alias("dot"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("clabel"))
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("clabel").alias("pred_label"), F.col("dot").alias("score"))
    )


# ------------------------------------------------------------ text analysis ----


@register(
    "text_tokenize_stats",
    oracle="""
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           CAST(length(text) AS BIGINT) AS n_chars_calc
    FROM documents
    """,
)
def text_tokenize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_re_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tok_est
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Token counting: whitespace split, a BPE-ish word regex, and the
    # chars/4 heuristic LLM-token estimate.
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[A-Za-z0-9]+', 0)"))
        .cast("long")
        .alias("n_re_tokens"),
        F.ceil(F.length("text") / 4.0).cast("long").alias("n_tok_est"),
    )


@register(
    "text_tfidf_topterms",
    oracle="""
    WITH tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        GROUP BY doc_id, token
    ),
    df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    n AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
    SELECT doc_id, token, tfidf, rn FROM (
        SELECT tf.doc_id, tf.token,
               round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf,
               row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6)
                            DESC, tf.token) AS rn
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n) x
    WHERE rn <= 5
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tf-idf with the smooth-idf formula, top-5 terms per doc. Expressed
    # relationally (explode→count→join) so it is oracle-checkable; the
    # same shape runs at scale (shuffles keyed on token / doc_id).
    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(df, "token")
        .join(F.broadcast(n))
        .withColumn(
            "raw", F.col("tf") * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
        )
    )
    # rank on the ROUNDED score (house rule, cf. text_langid_ngram): a
    # last-ulp ln() difference between JVM and libm must not flip the
    # rank-5 boundary
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round("raw", 6)), F.asc("token")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "token", F.round("raw", 6).alias("tfidf"), "rn")
    )


@register(
    "text_lang_partition",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(floor(CAST(sum(n_chars) AS DOUBLE) * 100.0
                      / CAST(count(*) AS DOUBLE) + 0.5) AS BIGINT) / 100.0
               AS avg_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-language routing stats (the groupBy key is the partition key a
    # partitioned writer would use). avg_chars uses the exact-integer
    # floor-half-up mean, not round(avg(), 2): n_chars is integral, so
    # sum/n can land exactly on a 2dp midpoint where engine round()
    # semantics diverge (the join_broadcast class, r9).
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.floor(
                F.sum("n_chars").cast("double") * 100.0
                / F.count(F.lit(1)).cast("double")
                + 0.5
            ).cast("long")
            / 100.0
        ).alias("avg_chars"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_tokens"),
    )


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           round(CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS punct_ratio,
           round(CAST(len(list_filter(string_split(text, ' '),
                     t -> len(t) >= 6)) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS long_tok_ratio,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS ttr,
           round(CAST(len(list_filter(string_split(text, ' '),
                     t -> list_contains(['a','an','the','of','and','in','to','is'], t)))
                     AS DOUBLE)
                 / len(string_split(text, ' ')), 6) AS stop_ratio
    FROM documents
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quality heuristics: punctuation ratio, long-token ratio, type-token
    # ratio, stopword ratio — the standard cheap pre-training filters.
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stopwords = F.array(*[F.lit(w) for w in ["a", "an", "the", "of", "and", "in", "to", "is"]])
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_calc"),
        F.round(
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double")
            / F.length("text"),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: F.length(t) >= 6)).cast("double") / F.size(toks),
            6,
        ).alias("long_tok_ratio"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6).alias("ttr"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stopwords, t))).cast("double")
            / F.size(toks),
            6,
        ).alias("stop_ratio"),
    )


@register(
    "text_langid_ngram",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    lt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
    totals AS (SELECT lang, sum(c) AS t FROM lt GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
    langs AS (SELECT DISTINCT lang FROM documents),
    scores AS (
        SELECT tok.doc_id, langs.lang AS cand,
               sum(ln((coalesce(lt.c, 0) + 1.0) / (totals.t + vocab.v))) AS score
        FROM tok
        CROSS JOIN langs
        LEFT JOIN lt ON lt.lang = langs.lang AND lt.token = tok.token
        JOIN totals ON totals.lang = langs.lang
        CROSS JOIN vocab
        GROUP BY tok.doc_id, langs.lang
    )
    SELECT doc_id, cand AS pred_lang FROM (
        SELECT doc_id, cand,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY round(score, 6) DESC, cand) AS rn
        FROM scores) t
    WHERE rn = 1
    """,
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Unigram naive-Bayes language ID with add-1 smoothing (the n-gram
    # heuristic at n=1 — fixture tokens are whole words). Train == corpus.
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    lt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    totals = lt.groupBy("lang").agg(F.sum("c").alias("t"))
    vocab = tok.agg(F.countDistinct("token").alias("v"))
    langs = docs.select("lang").distinct().select(F.col("lang").alias("cand"))
    scores = (
        tok.select("doc_id", "token")
        .join(F.broadcast(langs))
        # the (lang, token) profile grows with the VOCABULARY — no
        # mandatory broadcast; AQE broadcasts it while small and
        # switches to a shuffle join when a real vocabulary outgrows
        # the threshold
        .join(
            lt,
            (F.col("cand") == lt.lang) & (tok.token == lt.token),
            "left",
        )
        .join(F.broadcast(totals), F.col("cand") == totals.lang)
        .join(F.broadcast(vocab))
        .groupBy("doc_id", "cand")
        .agg(
            F.sum(
                F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("t") + F.col("v")))
            ).alias("score")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc(F.round("score", 6)), F.asc("cand"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand").alias("pred_lang"))
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
               AS fp,
           min(doc_id) OVER (PARTITION BY
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')))
               AS cluster_id
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Content-set fingerprint (hash of the sorted distinct token set) +
    # cluster id = min doc_id sharing the fingerprint. One shuffle on fp.
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "))
    w = Window.partitionBy("fp")
    return docs.select("doc_id", fp.alias("fp")).select(
        "doc_id", "fp", F.min("doc_id").over(w).alias("cluster_id")
    )


@register(
    "multimodal_join",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           CAST(len(e.embedding) AS INTEGER) AS dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Text + vector modalities in one row (doc_id = vec_id).
    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "lang", "n_chars", "label", F.size("embedding").alias("dim")
    )


@register(
    "dedup_simhash_pairs",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        FROM documents
    ),
    bits AS (
        SELECT doc_id, g.j,
               CASE WHEN sum(2 * (CAST(floor(
                        (strpos('0123456789abcdef',
                                substring(md5(token), CAST(g.j // 4 AS INTEGER) + 1, 1))
                         - 1) / power(2, g.j % 4)) AS BIGINT) % 2) - 1) > 0
                    THEN '1' ELSE '0' END AS b
        FROM tok, generate_series(0, 63) g(j)
        GROUP BY doc_id, g.j
    ),
    sh AS (SELECT doc_id, string_agg(b, '' ORDER BY j) AS simhash FROM bits GROUP BY doc_id)
    SELECT i, j, hamming FROM (
        SELECT a.doc_id AS i, b.doc_id AS j,
               CAST(len(list_filter(range(1, 65),
                    p -> substring(a.simhash, p, 1) <> substring(b.simhash, p, 1)))
                    AS INT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id) t
    WHERE hamming <= 3
    ORDER BY i, j
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairing: doc pairs with Hamming distance <= 3.

    EXACT via pigeonhole banding: the 64-bit fingerprint splits into 4
    bands of 16 bits; two fingerprints within Hamming 3 differ in at most
    3 bands, so they MUST agree on at least one band — candidates are
    generated by equi-joining each band (one narrow shuffle of
    (doc_id, band, 16-bit key) rows, 4 per doc), then re-ranked with the
    exact Hamming distance. No probabilistic miss, unlike MinHash.
    At 100 TB this is the standard web-dedup layout (Manku et al.'s
    pigeonhole scheme): linear in docs + output pairs.
    """
    # Fingerprints live as two 32-bit halves in longs (not the display
    # bitstring): Hamming = bit_count(xor) per half — two instructions vs
    # 64 per-character substring compares (measured 99.5 s -> seconds at
    # sf0.1 where the corpus yields 166k qualifying pairs). r11: halves
    # assemble straight from the packed bit-counts (_simhash_counts, one
    # groupBy) instead of a second 64x-exploded vote aggregation; bit j
    # is set iff 2*c[j] > n, exactly the vote-sum sign.
    cnt = _simhash_counts(load(spark, sf_dir, "documents"))

    def _half(lo_bit: int) -> F.Column:
        acc = F.lit(0).cast("long")
        for j in range(lo_bit, lo_bit + 32):
            bit = F.when(
                2 * F.element_at(F.col("c"), j + 1) > F.col("n"), F.lit(1).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            acc = acc + F.shiftleft(bit, j - lo_bit)
        return acc

    # r12 (guide §1.2): the band self-join broadcasts one side, and the
    # committed before-plan shows the ENTIRE counts+halves subtree
    # (token explode, md5 packing, 17-column groupBy, 64 bit terms)
    # duplicated under both sides — executed and re-analyzed twice per
    # action. One lazy local checkpoint of the 3-long-per-doc halves
    # table materializes it once; both join sides read the rows and the
    # per-action plan shrinks to the band join itself.
    halves = cnt.select(
        "doc_id", _half(32).alias("hi"), _half(0).alias("lo")
    ).localCheckpoint(eager=False)
    bands = halves.select(
        "doc_id",
        "hi",
        "lo",
        F.explode(
            F.expr(
                "array(struct(0 AS band, lo & 65535 AS key),"
                " struct(1 AS band, shiftright(lo, 16) & 65535 AS key),"
                " struct(2 AS band, hi & 65535 AS key),"
                " struct(3 AS band, shiftright(hi, 16) & 65535 AS key))"
            )
        ).alias("bk"),
    ).select("doc_id", "hi", "lo", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    hamming = (
        F.expr("bit_count(ha ^ hb)") + F.expr("bit_count(la ^ lb)")
    ).cast("int")
    # r11 (guide §2.3): the Hamming cutoff is determined by (i, j) alone
    # (fingerprints are per-doc), so filter BEFORE the pair dedup — the
    # distinct's input shrinks from every band collision (2.4M rows at
    # sf0.1) to qualifying collisions only (0.4M), and the dedup row
    # narrows to (i, j, hamming). Same output, same pair set.
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"),
            F.col("b.doc_id").alias("j"),
            F.col("a.hi").alias("ha"),
            F.col("a.lo").alias("la"),
            F.col("b.hi").alias("hb"),
            F.col("b.lo").alias("lb"),
        )
        .select("i", "j", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .dropDuplicates(["i", "j"])
        .orderBy("i", "j")
    )


_LSH_PLANES: list[list[float]] | None = None


def _lsh_planes() -> list[list[float]]:
    """The 48x64 md5-derived hyperplane matrix, computed once per
    process (hashlib == Spark md5 bit-for-bit; see _sign_lsh_tagged)."""
    global _LSH_PLANES
    if _LSH_PLANES is None:
        import hashlib

        _LSH_PLANES = [
            [
                (int(hashlib.md5(f"lsh-{r}-{d}".encode()).hexdigest()[:13], 16) + 0.5)
                / 4503599627370496.0
                * 2.0
                - 1.0
                for d in range(64)
            ]
            for r in range(48)
        ]
    return _LSH_PLANES


def _sign_lsh_tagged(emb: DataFrame) -> DataFrame:
    """48 deterministic pseudo-random hyperplanes give each vector a
    48-bit sign signature, banded 12x4; returns the input exploded to
    one row per (vector, band key). Shared by similarity_topk_lsh
    (query probe) and dedup_cosine_neardup_lsh (pair generation).

    Plane components are md5-DERIVED uniforms in [-1, 1) (the
    corpus_span_corruption / embeddings_signbit_sketch convention,
    switched from xxhash64 in r8): DuckDB can recompute md5 hex
    bit-identically, which is what lets both LSH consumers carry STRICT
    oracles — the banding itself, not just the re-ranked output, is
    cross-engine reproducible.

    r11 (guide §1.2/§7.2, measured): the signature used to be one
    nested expression — transform over a 48-element plane construct,
    each element an md5+conv sub-expression chain re-evaluated PER ROW
    (HOFs are never constant-folded), then array_join over slices. The
    whole plan cost ~31 s COLD at sf0.1 (Catalyst + Janino on the
    giant tree; 1.6 s warm — and the driver's sweep runs every key
    exactly once, i.e. cold). Two changes, measured cold 31.2 s ->
    5.1 s / warm 1.6 -> 0.85 s, outputs bit-identical:
    - the matrix is folded HERE with hashlib (md5 hex == Spark md5;
      13 hex digits = 52 bits, exact in a double; identical
      (v + 0.5) / 2^52 * 2 - 1 op order), one 64-double literal row
      per plane;
    - each plane's sign is its own aggregate(zip_with(...)) fold
      column (same d-ascending add order as before), concatenated
      into the s48 bitstring — the band key is then
      concat(b, ':', substring(s48, b*4+1, 4)), character-for-
      character the oracle's own keys CTE."""
    pls = _lsh_planes()

    def _signchar(r: int):
        fold = F.aggregate(
            F.zip_with("embedding", F.lit(pls[r]), lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(fold >= 0, F.lit("1")).otherwise(F.lit("0"))

    bandkeys = F.expr(
        "transform(sequence(0, 11), b -> concat(b, ':',"
        " substring(s48, b*4 + 1, 4)))"
    )
    return (
        emb.withColumn("s48", F.concat(*[_signchar(r) for r in range(48)]))
        .withColumn("key", F.explode(bandkeys))
        .drop("s48")
    )


@register(
    "similarity_topk_lsh",
    oracle="""
WITH
    ev AS (
      SELECT vec_id, label, g.i AS d, embedding[g.i]::DOUBLE AS x
      FROM embeddings, generate_series(1, 64) g(i)),
    pl AS (
      SELECT t.r, g.d,
             (CAST(('0x' || substring(md5('lsh-' || CAST(t.r AS VARCHAR)
                  || '-' || CAST(g.d - 1 AS VARCHAR)), 1, 13)) AS BIGINT)
              + 0.5) / 4503599627370496.0 * 2.0 - 1.0 AS w
      FROM generate_series(0, 47) t(r), generate_series(1, 64) g(d)),
    dots AS (
      SELECT vec_id, r, sum(w * x) AS s FROM ev JOIN pl USING (d)
      GROUP BY 1, 2),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY r) AS s48
      FROM dots GROUP BY vec_id),
    keys AS (
      SELECT vec_id, CAST(t.b AS VARCHAR) || ':'
             || substring(s48, t.b * 4 + 1, 4) AS key
      FROM sig, generate_series(0, 11) t(b)),
    qk AS (SELECT DISTINCT key FROM keys WHERE vec_id = 0),
    cand AS (
      SELECT DISTINCT keys.vec_id FROM keys JOIN qk USING (key)
      WHERE keys.vec_id <> 0),
    qv AS (SELECT d, x AS qx FROM ev WHERE vec_id = 0),
    scored AS (
      SELECT ev.vec_id, round(sum(ev.x * qv.qx), 6) AS cos
      FROM ev JOIN cand USING (vec_id) JOIN qv USING (d)
      GROUP BY ev.vec_id)
    SELECT s.vec_id, e.label, s.cos
    FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY s.cos DESC, s.vec_id LIMIT 10
    """,
)
def similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH (random hyperplane) top-k: the LSH-bucketed scale path
    next to similarity_topk (brute force) and similarity_ann_ivf.

    48 deterministic pseudo-random hyperplanes (components derived from
    xxhash64, so no RNG state and identical plans across runs) give each
    vector a 48-bit sign signature, banded 12x4; only vectors sharing a
    band key with the query are scored exactly. Band count is calibrated
    to the fixture's geometry: top-10 cosines are ~0.5-0.6 (p = 1-theta/pi
    ~ 0.67), so 12 bands of 4 bits give expected recall ~0.93 while a
    4-band signature measured only 0.6. The ANN answer is approximate
    vs brute force (recall asserted >= 0.8 in tests/test_tolerance.py),
    but the OPERATOR is a deterministic function of the data — md5-
    derived planes (r8) let the DuckDB oracle recompute the exact same
    banding, candidates, and re-rank, so the key is STRICT hash-checked
    like similarity_ann_ivf.

    At 100 TB the band keys become the partition column of the vector
    table and a query probes only matching partitions.
    """
    emb = load(spark, sf_dir, "embeddings").repartition(spread_width(32), "vec_id")
    tagged = _sign_lsh_tagged(emb).select("vec_id", "label", "embedding", "key")
    qkeys = tagged.filter(F.col("vec_id") == 0).select("key").distinct()
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cand = (
        tagged.join(F.broadcast(qkeys), "key")
        .filter(F.col("vec_id") != 0)
        .dropDuplicates(["vec_id"])
    )
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        cand.join(F.broadcast(q))
        .select("vec_id", "label", F.round(dot, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "doc_fingerprint_rolling",
    oracle="""
    WITH rh AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       [CAST(ascii(substring(text, i, 1)) AS BIGINT)
                        for i in range(1, length(text) + 1)]),
                   (h, c) -> (h * 31 + c) % 1000000007) AS rhash
        FROM documents)
    SELECT doc_id, rhash,
           min(doc_id) OVER (PARTITION BY rhash) AS cluster_id
    FROM rh
    """,
)
def doc_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash content fingerprint (Rabin-Karp style):
    h = fold(chars, h*31 + code mod 1e9+7), order-sensitive — unlike
    doc_fingerprint's sorted-set hash, two docs with the same tokens in
    different order get different fingerprints. One narrow pass per doc
    (the fold is a JVM higher-order aggregate over the char stream), one
    shuffle on the hash for cluster assignment.
    """
    docs = load(spark, sf_dir, "documents")
    rhash = F.expr(
        "aggregate(transform(sequence(1, length(text)),"
        " i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)),"
        " 0L, (h, c) -> pmod(h * 31 + c, 1000000007L))"
    )
    w = Window.partitionBy("rhash")
    return docs.select("doc_id", rhash.alias("rhash")).select(
        "doc_id", "rhash", F.min("doc_id").over(w).alias("cluster_id")
    )


@register(
    "text_ngram_profile",
    oracle="""
    WITH grams AS (
        SELECT lang, unnest([substring(text, i, 2)
                             for i in range(1, length(text))]) AS g
        FROM documents),
    counts AS (SELECT lang, g, count(*) AS c FROM grams GROUP BY lang, g)
    SELECT lang, g, c, rn FROM (
        SELECT lang, g, c,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rn
        FROM counts) t
    WHERE rn <= 5
    """,
)
def text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-bigram profile (top-5 by frequency): the
    feature table classic n-gram language identifiers rank against.
    explode(bigrams) -> count per (lang, gram) -> windowed top-5; two
    shuffles, both on bounded-cardinality keys (langs x gram vocab)."""
    # length >= 2 guard: sequence(1, len-1) descends for len < 2
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 2)
    grams = docs.select(
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("g"),
    )
    counts = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "g", "c", "rn")
    )


@register(
    "text_normalize_clean",
    oracle="""
    SELECT doc_id, clean,
           CAST(len(string_split(clean, ' ')) AS INTEGER) AS n_tokens,
           CAST(strlen(clean) AS BIGINT) AS n_chars
    FROM (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        FROM documents) t
    """,
)
def text_normalize_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-normalization pass every LLM data pipeline runs before
    dedup/tokenization: lowercase, strip non-alphanumerics to spaces,
    collapse whitespace runs, trim. Pure column expressions (JVM regex,
    whole-stage codegen) — a 100 TB map-only stage with no shuffle.
    Dialect note: Spark regexp_replace is global by default; DuckDB
    needs the explicit 'g' flag or it replaces the first match only."""
    docs = load(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return docs.select(
        "doc_id",
        clean.alias("clean"),
        F.size(F.split(clean, " ")).alias("n_tokens"),
        F.length(clean).cast("long").alias("n_chars"),
    )


# ------------------------------------------------- dedup clustering ----


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star step (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node links its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    bid = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bid.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    # No trailing .distinct() (r11): the only consumer is _small_star,
    # whose orientation step dedupes anyway — the extra exchange per
    # round was pure overhead (guide §2.4: a `distinct` on data the
    # next operator re-dedupes is an accidental shuffle).
    return (
        bid.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star step: direct every edge toward its smaller endpoint,
    then link each node's smaller neighbors (and itself) to the minimum
    of that set."""
    d = (
        edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = d.groupBy("u").agg(F.min("v").alias("m"))
    j = d.join(mins, "u")
    return (
        j.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(j.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


_CC_ORACLE = """
    WITH RECURSIVE pairs AS MATERIALIZED (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM documents a JOIN documents b
          ON a.doc_id < b.doc_id AND a.lang = b.lang
        WHERE round(CAST(len(list_intersect(string_split(a.text, ' '),
                                            string_split(b.text, ' '))) AS DOUBLE)
                    / len(list_distinct(string_split(a.text, ' ')
                                        || string_split(b.text, ' '))), 4) > 0.9
    ),
    edges AS MATERIALIZED (
        SELECT i AS u, j AS v FROM pairs UNION SELECT j, i FROM pairs
    ),
    reach(node, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON e.u = reach.r
    ),
    comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
           CAST(count(*) OVER (PARTITION BY COALESCE(c.cluster_id, d.doc_id))
                AS BIGINT) AS cluster_size,
           d.doc_id = COALESCE(c.cluster_id, d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
"""


@register("dedup_cluster_cc", oracle=_CC_ORACLE)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components over the jac>0.9 pair
    graph, canonical doc = component minimum. The production dedup step
    the pairwise ops feed — pairs alone can't answer "keep which copy?"
    when A~B~C but A!~C; components can.

    Alternating large-star/small-star (Kiveris et al. 2014), the
    MapReduce-native CC algorithm: converges in O(log n) rounds (vs
    O(diameter) for naive label propagation — a chain of near-dup
    shards at 100 TB can have huge diameter), every round is two
    shuffles on node id over a monotonically shrinking edge set.
    eager localCheckpoint() per round truncates the iterative plan's
    lineage so analysis cost stays flat (on a real cluster use
    sc.setCheckpointDir + .checkpoint() for fault-tolerant truncation).
    Convergence = (count, xxhash64-xor) of the edge set unchanged —
    two scalars per round; the oracle is DuckDB's recursive CTE over
    the same brute-force pair set (sf0.01-sized only).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    pairs = _exact_neardup_pairs(spark, sf_dir).select(
        F.col("i").alias("u"), F.col("j").alias("v")
    )
    lab = star_cc_labels(
        spark, pairs, docs.select(F.col("doc_id").alias("node"))
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))
    w = Window.partitionBy("cluster_id")
    return lab.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def star_cc_labels(
    spark: SparkSession, pairs: DataFrame, all_nodes: DataFrame
) -> DataFrame:
    """Connected components of an undirected (u, v) pair set by
    alternating large-star/small-star, returning (node, component) for
    EVERY row of all_nodes (isolated nodes label themselves). Shared
    by dedup_cluster_cc (near-dup pair graph over doc ids) and
    graph_connected_components (proximity graph over customers) — the
    convergence loop, shuffle-width pinning, and lineage truncation
    live once here; see dedup_cluster_cc for the algorithm rationale.
    """
    # Round cap only (r11): the loop exits on the edge-set fixpoint, so
    # the cap never binds on a healthy run — 64 covers any node count
    # (star contraction is O(log n) rounds) without paying the extra
    # all_nodes.count() action the old bit_length bound cost per call.
    max_rounds = 64
    # Pin the loop's shuffle width to the edge volume (~500k edges/task),
    # restoring the session conf after: the edge set shrinks every round,
    # and pushing a few thousand survivors through the session's 64-wide
    # shuffles makes each round all task-launch overhead (measured 20 s
    # -> 5 s at sf0.01). At real scale |E| keeps the width at the
    # session value and AQE coalesces the shrinking tail.
    edges = pairs.localCheckpoint()
    n_edges = edges.count()
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(4, min(int(saved), n_edges // 500_000 + 4))
    spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    try:
        prev = None
        for _ in range(max_rounds):
            edges = _small_star(_large_star(edges)).localCheckpoint()
            # bit_xor, not sum: xxhash64 spans the full long range and
            # ANSI mode faults sum() overflow; xor is order-insensitive
            # and safe (edge sets are distinct, so no even-multiplicity
            # cancellation). (r11 note: riding these metrics on the
            # checkpoint job via observe() was tried and REVERTED — the
            # Observation listener delivers after the job, adding more
            # wall time per round than the extra 4-partition agg job on
            # checkpointed data costs.)
            chk = edges.agg(
                F.count(F.lit(1)).alias("c"),
                F.expr("bit_xor(xxhash64(u, v))").alias("h"),
            ).first()
            cur = (chk["c"], chk["h"])
            if cur == prev:
                break
            prev = cur
        else:
            raise RuntimeError(f"CC did not converge in {max_rounds} rounds")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    labels = edges.groupBy("u").agg(F.min("v").alias("component"))
    return all_nodes.join(
        labels, all_nodes["node"] == labels["u"], "left"
    ).select(
        all_nodes["node"],
        F.coalesce("component", all_nodes["node"]).alias("component"),
    )


@register(
    "split_train_test",
    oracle="""
    SELECT doc_id, split, count(*) OVER (PARTITION BY split) AS split_rows
    FROM (
        SELECT doc_id,
               CASE WHEN h < 'd' THEN 'train'
                    WHEN h < 'f' THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) AS h
              FROM documents) t) s
    """,
)
def split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment by content-stable hash
    bucket: the last hex nibble of md5(doc_id) splits ~81/12.5/6.25%
    (13/2/1 of 16 buckets). Hash splits — not RNG — are how training
    pipelines keep membership stable under reruns, resharding, and
    incremental appends: a doc's split never depends on what else is in
    the batch. Map-only except the per-split count window (one shuffle
    on a 3-value key; at scale emit the assignment map-only and count
    in a separate aggregate instead of a window)."""
    docs = load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 32, 1)
    split = (
        F.when(h < F.lit("d"), "train").when(h < F.lit("f"), "val").otherwise("test")
    )
    assigned = docs.select("doc_id", split.alias("split"))
    w = Window.partitionBy("split")
    return assigned.select(
        "doc_id", "split", F.count(F.lit(1)).over(w).alias("split_rows")
    )


@register(
    "agg_duplicate_stats",
    oracle="""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           round(1.0 - count(DISTINCT md5(text)) / count(*), 6) AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def agg_duplicate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication report per source — the first diagnostic a curation
    pipeline runs before choosing dedup strategy (which crawls/feeds
    are echoing content). count(DISTINCT md5) keeps the shuffle keyed
    on 32-byte hashes, never full documents."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        F.round(
            F.lit(1.0) - F.countDistinct(F.md5("text")) / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
    )


@register(
    "similarity_range_search",
    oracle="""
    WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, label,
           round(list_sum(list_transform(list_zip(embedding, (SELECT e FROM q)),
                 x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
    FROM embeddings
    WHERE vec_id <> 0
      AND list_sum(list_transform(list_zip(embedding, (SELECT e FROM q)),
            x -> x[1]::DOUBLE * x[2]::DOUBLE)) > 0.25
    """,
)
def similarity_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search: ALL vectors with cosine above a
    threshold vs the query — the other half of the ANN API surface
    (top-k answers "closest n", range answers "everything this
    similar", e.g. every near-duplicate of a canary document).

    Same plan as similarity_topk minus the global top-k: 1-row broadcast
    of the query, JVM zip_with/aggregate dot product, and a filter
    instead of TakeOrderedAndProject — fully map-side, no shuffle at
    all. Threshold 0.25 is calibrated to the fixture embeddings
    (random near-orthogonal 64-d) to return a non-trivial set."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .withColumn("_dot", dot)
        .filter(F.col("_dot") > 0.25)
        .select("vec_id", "label", F.round("_dot", 6).alias("cos"))
    )


@register(
    "multimodal_shard_pack",
    oracle="""
    SELECT CAST(doc_id % 16 AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """,
)
def multimodal_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing manifest (WebDataset/tar-shard style): route
    documents to fixed shards by key hash and account each shard's
    payload — the OUTPUT stage of a training-data pipeline, where curated
    samples become the fixed-size shard files a dataloader streams.

    The mod-bucket routing here is the deterministic oracle form; at
    100 TB the same plan runs with repartitionByRange on a size-balanced
    key + partitionBy(shard_id) sink, and this manifest (counts + bytes
    per shard) is what the trainer's sampler reads. One hash aggregation,
    shard count fixed regardless of corpus size."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("shard_id", (F.col("doc_id") % 16).cast("bigint"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_bytes"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@register(
    "embeddings_quantize_int8",
    oracle="""
    SELECT vec_id,
           round(lo, 6) AS lo, round(hi, 6) AS hi,
           CAST(list_sum(list_transform(embedding,
                x -> CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
                     ELSE CAST(round((CAST(x AS DOUBLE) - lo) * 255.0 / (hi - lo))
                          AS BIGINT) END)) AS BIGINT) AS code_sum
    FROM (
        SELECT vec_id, embedding,
               list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS lo,
               list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS hi
        FROM embeddings) t
    """,
)
def embeddings_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar quantization to uint8 (min/max affine codes) —
    4× storage cut for a 100 TB embedding lake and the precursor to any
    quantized ANN index. Emits the per-vector scale range and the code
    checksum (sum of uint8 codes) so the oracle pins every quantized
    value without emitting an array column.

    All JVM higher-order expressions; map-only, no shuffle. Rounding
    ties: both engines round half-away via round() on the same doubles
    computed from identical float32 inputs, so codes match bit-for-bit
    — pinned by the checksum, which a single off-by-one code would
    break."""
    emb = load(spark, sf_dir, "embeddings")
    lo = F.expr("array_min(transform(embedding, x -> cast(x as double)))")
    hi = F.expr("array_max(transform(embedding, x -> cast(x as double)))")
    q = emb.select("vec_id", "embedding", lo.alias("lo"), hi.alias("hi"))
    # constant-vector guard: hi == lo would make (x-lo)*255/(hi-lo) a
    # 0/0 NaN whose bigint cast THROWS under Spark 4 ANSI (and errors
    # in DuckDB too) — a degenerate range quantizes to all-zero codes
    # instead, declared identically in the oracle
    code_sum = F.expr(
        "aggregate(embedding, cast(0 as bigint),"
        " (s, x) -> s + (case when hi = lo then cast(0 as bigint)"
        " else cast(round((cast(x as double) - lo) * 255.0D / (hi - lo)) as bigint) end))"
    )
    return q.select(
        "vec_id",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        code_sum.alias("code_sum"),
    )


@register(
    "dedup_keep_best",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
        SELECT doc_id, lang, n_chars,
               row_number() OVER (
                   PARTITION BY md5(lower(text))
                   ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents) t
    WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keeping the BEST representative per content group (longest
    doc, id tie-break) rather than the smallest id — the curation
    policy real pipelines want: when near-identical variants exist,
    keep the most complete one. Grouping key is md5 of the lowercased
    text so trivial case variants collapse. Same single content-hash
    shuffle as dedup_exact; only the ORDER BY differs."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5(F.lower("text"))).orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "n_chars")
    )


@register("text_compression_ratio")
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression ratio per document — the cheap repetition/spam
    signal production quality filters use (boilerplate and keyword-stuffed
    text compresses far better than natural prose; Gopher/C4-style
    pipelines threshold on it).

    No SQL engine exposes zlib, so this is a legitimate Python-edge op:
    Arrow-batched mapInPandas, vectorized over each batch, deterministic
    (zlib level pinned). Driver check is rows-only; the pytest oracle
    recomputes ratios with the same zlib on a collected sample, exact."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents")

    def ratios(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ratio": [
                        round(len(zlib.compress(b, 6)) / max(1, len(b)), 6)
                        for b in raw
                    ],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(ratios, "doc_id long, ratio double")


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
    cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
    tot AS (SELECT lang, sum(c) AS n FROM cnt GROUP BY lang)
    SELECT tok.doc_id,
           round(avg(ln(cnt.c / tot.n)), 6) AS avg_logprob
    FROM tok
    JOIN cnt ON tok.lang = cnt.lang AND tok.token = cnt.token
    JOIN tot ON tok.lang = tot.lang
    GROUP BY tok.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average token log-probability under the corpus's own
    per-language unigram model — the simplest language-model quality
    score: gibberish and vocabulary outliers score low, formulaic text
    scores high. (The n-gram upgrade swaps the token key for a bigram
    key; same plan.)

    Two passes over the exploded tokens, both shuffling on (lang,
    token); the count table joins back by the same key so the
    partitioning is reused, and the per-lang totals are a broadcast.
    Self-trained — no external model artifact, which is what makes it
    runnable on any 100 TB corpus as a first-pass filter."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    cnt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    return (
        tok.join(cnt, ["lang", "token"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id")
        .agg(F.round(F.avg(F.log(F.col("c") / F.col("n"))), 6).alias("avg_logprob"))
    )


@register(
    "text_mask_redact",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               'contact ' || source || CAST(doc_id AS VARCHAR)
               || '@mail-' || lang || '.com id=' || CAST(doc_id * 7919 AS VARCHAR)
               AS line
        FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(line,
               '[A-Za-z0-9._-]+@([A-Za-z0-9.-]+)', '<EMAIL@\\1>', 'g'),
               'id=[0-9]+', 'id=<NUM>', 'g') AS redacted
    FROM w
    """,
)
def text_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction: mask email local-parts (keeping the domain for
    analytics) and numeric identifiers — the regex-tier PII scrub every
    training-data pipeline runs before anything ML-based. Fixture text
    carries no PII, so PII-shaped lines are synthesized deterministically
    from source/doc_id/lang; the masking expressions are the thing under
    test, and they run as JVM regexp_replace — map-only, no shuffle, no
    Python. Dialect note: Spark regexp_replace is global by default and
    uses $1 backrefs; DuckDB needs the explicit 'g' flag and \\1."""
    docs = load(spark, sf_dir, "documents")
    line = F.concat(
        F.lit("contact "), F.col("source"), F.col("doc_id").cast("string"),
        F.lit("@mail-"), F.col("lang"), F.lit(".com id="),
        (F.col("doc_id") * 7919).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            line, r"[A-Za-z0-9._-]+@([A-Za-z0-9.-]+)", r"<EMAIL@$1>"
        ),
        r"id=[0-9]+",
        "id=<NUM>",
    )
    return docs.select("doc_id", redacted.alias("redacted"))


@register(
    "dedup_source_crossdup",
    oracle="""
    WITH fp AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
                   AS fp
        FROM documents)
    SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_pairs
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def dedup_source_crossdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix: for every source pair, how many
    doc pairs share a content-set fingerprint (doc_fingerprint's md5 of
    the sorted distinct token set) — the "which crawls copy from each
    other" dedup diagnostic that decides source priorities before a
    keep-best pass.

    One shuffle on fp for the self-join (pairs only form inside a
    fingerprint group, so join width = duplicate mass, not corpus
    size), then a bounded (source x source) aggregation. Skew guard at
    100 TB: a boilerplate fingerprint shared by millions of docs makes
    a quadratic group — cap or salt such groups (the fixture's are
    small, max group ~10)."""
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " "))
    t = docs.select("source", fp.alias("fp"))
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "text_contamination_check",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(t) - 3),
                      i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM tok WHERE len(t) >= 5),
    train AS (SELECT DISTINCT g FROM grams WHERE source <> 'src0'),
    ev AS (SELECT DISTINCT doc_id, g FROM grams WHERE source = 'src0')
    SELECT ev.doc_id, count(*) AS n_grams, count(train.g) AS n_hit,
           round(count(train.g) * 1.0 / count(*), 6) AS contamination
    FROM ev LEFT JOIN train ON ev.g = train.g
    GROUP BY 1
    """,
)
def text_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination detector (the n-gram-overlap check run
    before any benchmark number is trusted): treating src0 as the eval
    set, score each eval doc by the fraction of its distinct token
    5-grams that appear anywhere in the training sources.

    Both sides explode to (doc, 5-gram) rows via JVM higher-order
    functions (transform over a token-index sequence — no Python), the
    train side reduces to a distinct gram set, and one left join on the
    gram scores every eval doc. Shuffles are keyed on the gram string;
    at 100 TB you'd key on xxhash64(gram) instead (8-byte shuffle rows;
    collisions only ever inflate contamination by ~2^-64) — strings
    kept here so the DuckDB oracle is exact."""
    toks = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 5)
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 5),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, 5), " "),
            )
        ).alias("g"),
    )
    train = grams.filter(F.col("source") != "src0").select("g").distinct()
    ev = grams.filter(F.col("source") == "src0").select("doc_id", "g").distinct()
    hit = train.withColumn("hit", F.lit(1))
    return (
        ev.join(hit, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
            F.round(F.count("hit") / F.count(F.lit(1)), 6).alias("contamination"),
        )
    )


@register(
    "similarity_centroid_classify",
    oracle="""
    WITH dims AS (
        SELECT vec_id, label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings),
    cent AS (
        SELECT label AS clabel, d, avg(x) AS c FROM dims GROUP BY 1, 2),
    dots AS (
        SELECT v.vec_id, v.label, c.clabel,
               round(sum(v.x * c.c), 6) AS dot
        FROM dims v JOIN cent c ON v.d = c.d GROUP BY 1, 2, 3),
    pred AS (
        SELECT vec_id, label, clabel,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dot DESC, clabel) AS rn
        FROM dots)
    SELECT label, clabel AS predicted, count(*) AS n
    FROM pred WHERE rn = 1 GROUP BY 1, 2
    """,
)
def similarity_centroid_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid classification audit: assign every embedding to
    its closest label centroid (max dot product — vectors are
    L2-normalized) and report the label x predicted confusion matrix,
    the standard embedding-space quality check before clustering or ANN
    index choices.

    Centroid build is the scalable (label, dim) aggregation (posexplode
    -> avg — 640 tiny rows, never a collect_list of vectors), arrays
    reassembled order-safe via struct sort and BROADCAST to the scoring
    pass: one map-side zip_with/aggregate dot per (vector, centroid),
    rank-1 window per vec_id, bounded 10x10 output. Dot products are
    rounded at 6dp BEFORE the argmax on both engines so float summation
    order can't flip a near-tie differently per engine (clabel breaks
    exact ties)."""
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.select("vec_id", "label", F.posexplode("embedding").alias("d", "x"))
    cent = dims.groupBy(F.col("label").alias("clabel"), "d").agg(F.avg("x").alias("c"))
    cent_arr = cent.groupBy("clabel").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    dot = F.round(
        F.aggregate(
            F.zip_with("embedding", "cvec", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )
    scored = emb.crossJoin(F.broadcast(cent_arr)).select(
        "vec_id", "label", "clabel", dot.alias("dot")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("clabel"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label", F.col("clabel").alias("predicted"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pca_power_oracle(dim: int = 64, squarings: int = 12) -> str:
    """Strict DuckDB oracle for embeddings_pca_power: the top eigenvector
    computed ENTIRELY in SQL via matrix squaring with Frobenius
    renormalization. A^(2^k)/||.||_F converges to the rank-1 projector
    v v^T at rate (lambda2/lambda1)^(2^k); the fixture's eigengap ratio is
    ~0.9837, so 12 squarings give 0.9837^4096 ~ 1e-29 — machine precision,
    far inside the 6dp rounding margin (measured min distance of any
    loading from a rounding boundary: 1.2e-9; cross-engine Gram drift from
    float64 summation order is ~1e-12 after the float64 cast on both
    sides). The eigenvector is read off as the dominant column of the
    converged projector, unit-normalized, sign-canonicalized to match the
    Spark side (loading at d=0 non-negative; the fixture's |v[0]| ~ 0.17,
    so the sign read is not boundary-sensitive). Every CTE is MATERIALIZED:
    each squaring references its predecessor twice, so un-materialized
    inlining would expand the chain to 2^12 scans."""
    parts = [
        "WITH g0 AS MATERIALIZED (SELECT t1.i AS i, t2.j AS j, "
        "sum(CAST(embedding[t1.i] AS DOUBLE) * CAST(embedding[t2.j] AS DOUBLE)) AS a "
        f"FROM embeddings, range(1, {dim + 1}) t1(i), range(1, {dim + 1}) t2(j) "
        "GROUP BY 1, 2)"
    ]
    prev = "g0"
    for k in range(1, squarings + 1):
        parts.append(f"n{k} AS MATERIALIZED (SELECT sqrt(sum(a*a)) AS nf FROM {prev})")
        parts.append(
            f"s{k} AS MATERIALIZED (SELECT x.i AS i, y.j AS j, "
            f"sum((x.a / n.nf) * (y.a / n.nf)) AS a "
            f"FROM {prev} x JOIN {prev} y ON x.j = y.i, n{k} n GROUP BY 1, 2)"
        )
        prev = f"s{k}"
    parts.append(
        f"jstar AS MATERIALIZED (SELECT i AS jc FROM {prev} "
        "WHERE i = j ORDER BY a DESC, i LIMIT 1)"
    )
    parts.append(
        f"vraw AS MATERIALIZED (SELECT s.i AS i, s.a AS v FROM {prev} s, jstar "
        "WHERE s.j = jstar.jc)"
    )
    parts.append("vn AS MATERIALIZED (SELECT sqrt(sum(v*v)) AS nrm FROM vraw)")
    parts.append(
        "sgn AS MATERIALIZED (SELECT CASE WHEN (SELECT v FROM vraw WHERE i = 1) < 0 "
        "THEN -1.0 ELSE 1.0 END AS s)"
    )
    return (
        ",\n".join(parts)
        + "\nSELECT CAST(i - 1 AS INT) AS d, round(sgn.s * v / vn.nrm, 6) AS loading "
        "FROM vraw, vn, sgn ORDER BY d"
    )


@register("embeddings_pca_power", oracle=_pca_power_oracle())
def embeddings_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embeddings — the MLlib RowMatrix
    architecture, which is what actually scales: the GRAMIAN X^T X is
    dim x dim (64x64 = 4 KB) regardless of row count, so the
    distributed work is ONE pass accumulating per-Arrow-batch outer
    products (mapInPandas -> 4096-cell partial per batch -> one
    metadata-sized sum), and the eigensolve happens locally on the
    4 KB matrix. A naive data-side power iteration was tried first and
    rejected with measurements: the fixture's eigengap is ~0.984, so
    12 full-data passes reached cos 0.68 vs eigh - iterating over the
    DATA re-scans 100 TB per step to converge on something
    driver-sized. Driver work here is a 4096-row collect + numpy eigh,
    the same metadata-sized-combine class as the sketch merges.
    Sign canonicalized (dim-0 loading non-negative); accuracy vs a
    direct numpy eigendecomposition pinned in tests/test_tolerance.py,
    and STRICT-oracle checked against a pure-SQL matrix-squaring power
    method (_pca_power_oracle above) — the Gramian is accumulated in
    float64 on both engines (the parquet column is float32; a float32
    X^T X accumulates ~1e-5 relative error, enough to flip 6dp
    roundings) so both sides agree to ~1e-12."""
    import numpy as np
    import pandas as pd

    def gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            A = X.T @ X
            d = A.shape[0]
            idx = np.arange(d * d)
            yield pd.DataFrame(
                {"i": idx // d, "j": idx % d, "a": A.ravel().astype("float64")}
            )

    emb = load(spark, sf_dir, "embeddings").select("embedding")
    cells = emb.mapInPandas(gram, "i int, j int, a double")
    rows = cells.groupBy("i", "j").agg(F.sum("a").alias("a")).collect()
    d = max(r["i"] for r in rows) + 1
    A = np.zeros((d, d))
    for r in rows:
        A[r["i"], r["j"]] = r["a"]
    _, V = np.linalg.eigh(A)
    top = V[:, -1]
    if top[np.flatnonzero(top)[0]] < 0:
        top = -top
    return spark.createDataFrame(
        [(int(i), float(round(x, 6))) for i, x in enumerate(top)],
        "d int, loading double",
    )


@register(
    "text_containment_pairs",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(range(1, len(t) - 3),
                      i -> array_to_string(t[i:i+4], ' '))) AS g
        FROM tok WHERE len(t) >= 5),
    sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
    shared AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
        FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           round(inter * 1.0 / sa.sz, 6) AS containment_ab,
           round(inter * 1.0 / sb.sz, 6) AS containment_ba
    FROM shared JOIN sizes sa ON sa.doc_id = doc_a
                JOIN sizes sb ON sb.doc_id = doc_b
    WHERE inter * 1.0 / sa.sz >= 0.5 OR inter * 1.0 / sb.sz >= 0.5
    """,
)
def text_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: 5-gram containment C(A->B) =
    |A ∩ B| / |A| in both directions, keeping pairs where either side
    is >=50% contained — catches a short doc quoted inside a long one,
    which symmetric Jaccard dilutes below any threshold (Jaccard of a
    50-gram doc inside a 1000-gram doc is <=0.05; its containment
    is 1.0).

    Pair generation is the gram-keyed self-join, so candidate width is
    SHARED-gram mass — token 5-grams are selective even on this tiny
    vocabulary (25 surviving pairs from 500 docs). At 100 TB the gram
    key becomes xxhash64 and ultra-frequent grams (boilerplate) get
    capped the same way dedup_source_crossdup documents; the two
    broadcast-sized size joins are per-doc aggregates."""
    base = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    # gram generation needs >=5 tokens, but the per-doc SIZES relation
    # must stay unfiltered: a 4-token doc is a (doc, n, 0, 0.0) row in
    # the report (and in the oracle), not an absent one
    toks = base.filter(F.size("t") >= 5)
    # r12 (guide §1.2): this distinct gram table feeds FOUR plan branches
    # (both self-join sides and both size joins), and the committed
    # before-plan shows the Scan->Generate->distinct subtree duplicated
    # four times — the 5-gram explode ran 4x per call. One lazy local
    # checkpoint materializes it once; every branch reads the rows.
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 5),
                lambda i: F.array_join(F.slice(F.col("t"), i + 1, 5), " "),
            )
        ).alias("g"),
    ).distinct().localCheckpoint(eager=False)
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = grams.select(F.col("doc_id").alias("doc_a"), "g")
    b = grams.select(F.col("doc_id").alias("doc_b"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb"))
    cab = F.col("inter") / F.col("sza")
    cba = F.col("inter") / F.col("szb")
    return (
        # per-doc size tables are corpus-sized: no mandatory broadcast
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter((cab >= 0.5) | (cba >= 0.5))
        .select(
            "doc_a",
            "doc_b",
            F.round(cab, 6).alias("containment_ab"),
            F.round(cba, 6).alias("containment_ba"),
        )
    )


@register(
    "dedup_cosine_neardup_lsh",
    oracle="""
WITH
    ev AS (
      SELECT vec_id, label, g.i AS d, embedding[g.i]::DOUBLE AS x
      FROM embeddings, generate_series(1, 64) g(i)),
    pl AS (
      SELECT t.r, g.d,
             (CAST(('0x' || substring(md5('lsh-' || CAST(t.r AS VARCHAR)
                  || '-' || CAST(g.d - 1 AS VARCHAR)), 1, 13)) AS BIGINT)
              + 0.5) / 4503599627370496.0 * 2.0 - 1.0 AS w
      FROM generate_series(0, 47) t(r), generate_series(1, 64) g(d)),
    dots AS (
      SELECT vec_id, r, sum(w * x) AS s FROM ev JOIN pl USING (d)
      GROUP BY 1, 2),
    sig AS (
      SELECT vec_id,
             string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY r) AS s48
      FROM dots GROUP BY vec_id),
    keys AS (
      SELECT vec_id, CAST(t.b AS VARCHAR) || ':'
             || substring(s48, t.b * 4 + 1, 4) AS key
      FROM sig, generate_series(0, 11) t(b)),
    cand AS (
      SELECT DISTINCT a.vec_id AS i, b.vec_id AS j
      FROM keys a JOIN keys b ON a.key = b.key AND a.vec_id < b.vec_id),
    scored AS (
      SELECT c.i, c.j, round(sum(ea.x * eb.x), 6) AS cos
      FROM cand c
      JOIN ev ea ON ea.vec_id = c.i
      JOIN ev eb ON eb.vec_id = c.j AND eb.d = ea.d
      GROUP BY c.i, c.j)
    SELECT i, j, cos FROM scored WHERE cos > 0.4 ORDER BY i, j LIMIT 200
    """,
)
def dedup_cosine_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for dedup_cosine_neardup, as its own checked key
    (the round-3 verdict graded the brute key 'weak as-is' because its
    scale path lived only in other operators' query shapes): candidate
    pairs come from the shared sign-LSH banding (_sign_lsh_tagged —
    vectors sharing any of 12 4-bit band keys), then an exact dot
    re-rank applies the same threshold as the brute key. Same output
    schema; pair width is band-bucket occupancy, never |V|^2. For the
    fixture geometry (kept pairs cos 0.4-0.5, p_plane ~0.65) expected
    pair recall is ~0.9 — asserted >= 0.8 vs the brute key in
    tests/test_tolerance.py. With md5-derived planes (r8) the banding
    is cross-engine reproducible, so the key carries a STRICT oracle
    on top of the recall floor."""
    emb = load(spark, sf_dir, "embeddings").repartition(spread_width(32), "vec_id")
    tagged = _sign_lsh_tagged(emb).select("vec_id", "embedding", "key")
    a = tagged.select(
        F.col("vec_id").alias("i"), F.col("embedding").alias("ea"), "key"
    )
    b = tagged.select(
        F.col("vec_id").alias("j"), F.col("embedding").alias("eb"), "key"
    )
    cand = a.join(b, "key").filter(F.col("i") < F.col("j")).dropDuplicates(["i", "j"])
    dot = F.expr(
        "aggregate(zip_with(ea, eb,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        cand.select("i", "j", F.round(dot, 6).alias("cos"))
        .filter(F.col("cos") > 0.4)
        .orderBy("i", "j")
        .limit(200)
    )


def _ivf_kmeans_oracle() -> str:
    """Unrolled 4-iteration spherical Lloyd in SQL — the full learned
    quantizer replicated relationally: md5-ordered init, per-iteration
    6dp-rounded max-dot assignment, mean + renormalize with centroid
    components rounded at 9dp (the re-synchronization that makes an
    ITERATIVE float pipeline cross-engine deterministic: both engines
    erase their sub-1e-9 summation-order drift every round instead of
    compounding it), top-2 probe, exact re-rank inside probed cells."""
    parts = ["""
    WITH ev AS (
      SELECT vec_id, label, g.i AS d, embedding[g.i]::DOUBLE AS x
      FROM embeddings, generate_series(1, 64) g(i)),
    init AS (
      SELECT vec_id, rn - 1 AS cell FROM (
        SELECT vec_id, row_number() OVER (
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings) t
      WHERE rn <= 10),
    c0 AS (
      SELECT init.cell, ev.d, ev.x AS v
      FROM init JOIN ev USING (vec_id))"""]
    for i in range(1, 5):
        parts.append(f"""
    s{i} AS (
      SELECT ev.vec_id, c{i - 1}.cell, round(sum(ev.x * c{i - 1}.v), 6) AS s
      FROM ev JOIN c{i - 1} ON ev.d = c{i - 1}.d
      GROUP BY 1, 2),
    a{i} AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (
            PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
        FROM s{i}) t WHERE rn = 1),
    m{i} AS (
      SELECT a{i}.cell, ev.d, avg(ev.x) AS m
      FROM a{i} JOIN ev USING (vec_id) GROUP BY 1, 2),
    n{i} AS (SELECT cell, sqrt(sum(m * m)) AS nrm FROM m{i} GROUP BY 1),
    c{i} AS (
      SELECT m{i}.cell, m{i}.d, round(m{i}.m / n{i}.nrm, 9) AS v
      FROM m{i} JOIN n{i} USING (cell))""")
    parts.append("""
    qv AS (SELECT d, x AS qx FROM ev WHERE vec_id = 0),
    probe AS (
      SELECT cell FROM (
        SELECT c4.cell, round(sum(c4.v * qv.qx), 6) AS cs
        FROM c4 JOIN qv USING (d) GROUP BY c4.cell) t
      ORDER BY cs DESC, cell LIMIT 2),
    sfin AS (
      SELECT ev.vec_id, c4.cell, round(sum(ev.x * c4.v), 6) AS s
      FROM ev JOIN c4 ON ev.d = c4.d GROUP BY 1, 2),
    afin AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, row_number() OVER (
            PARTITION BY vec_id ORDER BY s DESC, cell) AS rn
        FROM sfin) t WHERE rn = 1),
    scored AS (
      SELECT ev.vec_id, round(sum(ev.x * qv.qx), 6) AS cos
      FROM afin JOIN probe USING (cell)
      JOIN ev ON ev.vec_id = afin.vec_id
      JOIN qv USING (d)
      WHERE afin.vec_id <> 0
      GROUP BY ev.vec_id)
    SELECT s.vec_id, e.label, s.cos
    FROM scored s JOIN embeddings e ON e.vec_id = s.vec_id
    ORDER BY s.cos DESC, s.vec_id LIMIT 10""")
    return ",".join(parts)


@register("similarity_ann_ivf_kmeans", oracle=_ivf_kmeans_oracle())
def similarity_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a REAL learned coarse quantizer (similarity_ann_ivf
    uses the label column as its quantizer — honest plumbing, but a
    production IVF must learn cells without labels): k=10 centroids
    trained by 4 deterministic Lloyd iterations, entirely in
    DataFrames.

    Init is the 10 vectors minimizing xxhash64(vec_id) (deterministic,
    no RNG state, no collect). Each iteration: assign every vector to
    its max-dot centroid (broadcast k centroids, argmax via one
    vec_id-partitioned rank window) then recompute centroids with the
    scalable (cell, dim) posexplode aggregation, RE-NORMALIZED to unit
    length — this is spherical k-means: with near-orthogonal unit
    vectors an unnormalized mean shrinks toward zero and max-dot
    assignment degrades every round (measured here: mean max-dot 0.209
    init -> 0.085 after 4 raw-mean rounds; normalizing makes the
    cosine objective non-decreasing). Per iteration the data-sized
    work is one scan + one bounded shuffle — Lloyd's at 100 TB runs on
    a sample for exactly this reason, and the sample swap-in is the
    `emb` argument. Probe = top-2 cells, exact re-rank inside them.
    Approximate -> rows-only tier; the machinery (exact-within-probed-
    cells + objective improvement) is asserted in
    tests/test_tolerance.py."""
    # Repartition: single-row-group fixture would run every iteration's
    # 10-way crossJoin + interpreted dot products on one core (guide
    # §2.5 input skew; same convention as similarity_ann_ivf). The
    # checkpoint materializes the training set ONCE — every Lloyd round
    # plus the final assignment re-scanned and re-shuffled it otherwise
    # (5 scans -> 1; Lloyd's at scale trains on a materialized sample
    # anyway, which is exactly what this is).
    emb = load(spark, sf_dir, "embeddings").repartition(spread_width(32), "vec_id").localCheckpoint()
    dot_with = "aggregate(zip_with(embedding, {c}, (x, y) -> CAST(x AS DOUBLE) * y), 0D, (s, v) -> s + v)"
    init_w = Window.orderBy(F.md5(F.col("vec_id").cast("string")), F.asc("vec_id"))
    cent = (
        emb.withColumn("rn", F.row_number().over(init_w))
        .filter(F.col("rn") <= 10)
        .select(
            (F.col("rn") - 1).alias("cell"),
            F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    for _ in range(4):
        scored = emb.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "embedding",
            "cell",
            F.round(F.expr(dot_with.format(c="centroid")), 6).alias("s"),
        )
        aw = Window.partitionBy("vec_id").orderBy(F.desc("s"), F.asc("cell"))
        assigned = (
            scored.withColumn("rn", F.row_number().over(aw))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "cell")
        )
        cent = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("v"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "v"))),
                    lambda s: s["v"],
                ).alias("raw")
            )
            .select(
                "cell",
                F.expr(
                    "transform(raw, x -> round(x / sqrt(aggregate(raw, 0D,"
                    " (s, y) -> s + y * y)), 9))"
                ).alias("centroid"),
            )
            # Eager per-round checkpoint of the 10-row centroid table
            # (same pattern as the iterative graph loops): without it
            # every later broadcast of cent re-runs ALL previous Lloyd
            # rounds — the final plan held the 4-round lineage three
            # times over (assign + probe + re-rank). 10 rows, 4 tiny
            # jobs; each round's data-sized work now runs exactly once.
            .localCheckpoint()
        )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    cdot = F.expr(
        "aggregate(zip_with(centroid, qe, (x, y) -> x * CAST(y AS DOUBLE)),"
        " 0D, (s, v) -> s + v)"
    )
    probe = (
        cent.join(F.broadcast(q))
        .select("cell", F.round(cdot, 6).alias("cs"))
        .orderBy(F.desc("cs"), F.asc("cell"))
        .limit(2)
        .select("cell")
    )
    # final assignment against the trained centroids, pruned to probed cells
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "embedding", "cell",
        F.round(F.expr(dot_with.format(c="centroid")), 6).alias("s"),
    )
    aw = Window.partitionBy("vec_id").orderBy(F.desc("s"), F.asc("cell"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(aw))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", "embedding", "cell")
    )
    qdot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    return (
        assigned.join(F.broadcast(probe), "cell")
        .filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", "label", F.round(qdot, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "text_span_dup_mass",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
        SELECT doc_id, i AS start, array_to_string(t[i:i+4], ' ') AS g
        FROM tok, unnest(range(1, len(t) - 3)) AS u(i)
        WHERE len(t) >= 5),
    firstdoc AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g),
    dup AS (
        SELECT gr.doc_id, gr.start
        FROM grams gr JOIN firstdoc f ON gr.g = f.g
        WHERE f.first_doc < gr.doc_id),
    cov AS (
        SELECT DISTINCT doc_id, start + o AS pos
        FROM dup, unnest(range(0, 5)) AS v(o)),
    sizes AS (SELECT doc_id, len(t) AS n_tokens FROM tok)
    SELECT s.doc_id, s.n_tokens,
           CAST(coalesce(count(c.pos), 0) AS BIGINT) AS n_dup_tokens,
           round(coalesce(count(c.pos), 0) * 1.0 / s.n_tokens, 6) AS dup_mass
    FROM sizes s LEFT JOIN cov c ON s.doc_id = c.doc_id
    GROUP BY 1, 2
    """,
)
def text_span_dup_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplicate mass per doc — the diagnostic behind
    substring/span dedup (Lee et al.'s 'Deduplicating Training Data'
    family): the fraction of a doc's tokens covered by at least one
    token 5-gram that FIRST occurred in an earlier doc. dup_mass 1.0 =
    the doc is entirely stitched from earlier material (drop it);
    fractional values say how much a span-level pass would trim where
    doc-level dedup keeps the doc.

    Pipeline: grams with start positions (JVM transform), first-doc
    ownership via one gram-keyed aggregation joined back (shuffle
    width = gram mass), covered positions by exploding each duplicated
    gram's 5-position span and distinct-ing — overlap-correct by
    construction. At 100 TB: xxhash64 gram keys and a frequency cap on
    boilerplate grams, as the other gram ops document."""
    base = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    )
    # gram generation needs >=5 tokens, but the per-doc SIZES relation
    # must stay unfiltered: a 4-token doc is a (doc, n, 0, 0.0) row in
    # the report (and in the oracle), not an absent one
    toks = base.filter(F.size("t") >= 5)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 4),
                lambda i: F.struct(
                    i.alias("start"),
                    F.array_join(F.slice(F.col("t"), i, 5), " ").alias("g"),
                ),
            )
        ).alias("sg"),
    ).select("doc_id", F.col("sg.start").alias("start"), F.col("sg.g").alias("g"))
    # r11 (guide §2.3/§2.4): first-doc ownership as a window MIN over the
    # gram partition — one exchange on g instead of the groupBy(g) +
    # join-back pair that shuffled every gram string twice.
    dup = (
        grams.withColumn(
            "first_doc", F.min("doc_id").over(Window.partitionBy("g"))
        )
        .filter(F.col("first_doc") < F.col("doc_id"))
        .select("doc_id", "start")
    )
    # Covered-position count via interval union instead of exploding each
    # span's 5 positions and distinct-ing 5x the rows: starts are unique
    # per (doc, start), so |union of [s, s+4]| = sum over sorted starts of
    # min(5, next_start - start), with the last span contributing 5. One
    # doc_id window + a groupBy that reuses its partitioning — the
    # (doc_id, pos) distinct exchange is gone. Identical counts by
    # construction (overlap-correct both ways).
    nxt = F.lead("start").over(Window.partitionBy("doc_id").orderBy("start"))
    covered = (
        dup.withColumn("span", F.coalesce(F.least(F.lit(5), nxt - F.col("start")), F.lit(5)))
        .groupBy("doc_id")
        .agg(F.sum("span").cast("long").alias("n_dup"))
    )
    sizes = base.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return sizes.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce(F.col("n_dup"), F.lit(0).cast("long")).alias("n_dup_tokens"),
        F.round(
            F.coalesce(F.col("n_dup"), F.lit(0).cast("long")) / F.col("n_tokens"), 6
        ).alias("dup_mass"),
    )


@register(
    "doc_fingerprint_winnow",
    oracle="""
    WITH gh AS (
        SELECT doc_id,
               [list_reduce(
                    list_prepend(CAST(0 AS BIGINT),
                        [CAST(ascii(substring(text, i + j, 1)) AS BIGINT)
                         for j in range(0, 8)]),
                    (h, c) -> (h * 31 + c) % 1000000007)
                for i in range(1, length(text) - 8 + 2)] AS hs
        FROM documents
        WHERE length(text) >= 23),
    sel AS (
        SELECT DISTINCT doc_id,
               unnest([list_min(list_slice(hs, j, j + 15))
                       for j in range(1, len(hs) - 16 + 2)]) AS fp
        FROM gh)
    SELECT doc_id, fp, min(doc_id) OVER (PARTITION BY fp) AS cluster_id
    FROM sel
    """,
)
def doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): hash every char 8-gram (same polynomial as
    doc_fingerprint_rolling), slide a 16-gram window, keep each
    window's MINIMUM hash — the value-based simplification of robust
    winnowing (the selected set is identical; only positional metadata
    is dropped). Guarantees every shared substring >= 23 chars yields a
    shared fingerprint, which is what makes it the standard
    contamination / clone detector.

    Entirely JVM higher-order expressions — one narrow map computes all
    gram hashes + window minima per doc, then one explode + distinct and
    one shuffle on fp for cluster assignment. At 100 TB the fingerprint
    table is ~|text|/w rows per doc (16x smaller than the gram table a
    full-shingle join would shuffle)."""
    # Repartition: single-row-group fixture would run the ~10x|text|
    # interpreted gram-hash lambdas per doc on one core (guide §2.5
    # input skew; same convention as the multimodal decoders).
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 23)
        .repartition(spread_width(32), "doc_id")
    )
    # char codes materialized ONCE per doc; each gram hash then folds an
    # 8-slice of the codes array (the ascii(substring()) -per-character
    # form re-evaluated 8 string ops per position and measured ~2.5x
    # slower at sf0.1).
    codes = F.expr(
        "transform(sequence(1, length(text)),"
        " p -> CAST(ascii(substring(text, p, 1)) AS BIGINT))"
    )
    hs = F.expr(
        "transform(sequence(1, size(cs) - 7),"
        " i -> aggregate(slice(cs, i, 8),"
        "  0L, (h, c) -> pmod(h * 31 + c, 1000000007L)))"
    )
    sel = F.explode(
        F.expr("array_distinct(transform(sequence(1, size(hs) - 15),"
               " j -> array_min(slice(hs, j, 16))))")
    )
    fps = (
        docs.select("doc_id", codes.alias("cs"))
        .select("doc_id", hs.alias("hs"))
        .select("doc_id", sel.alias("fp"))
    )
    return fps.select(
        "doc_id", "fp", F.min("doc_id").over(Window.partitionBy("fp")).alias("cluster_id")
    )


@register(
    "embeddings_outlier_centroid",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings),
    cent AS (SELECT label, d, avg(x) AS c FROM e GROUP BY label, d),
    dist AS (
        SELECT e.vec_id, e.label,
               sqrt(sum((e.x - cent.c) * (e.x - cent.c))) AS dist
        FROM e JOIN cent ON e.label = cent.label AND e.d = cent.d
        GROUP BY e.vec_id, e.label),
    stats AS (
        SELECT vec_id, label, dist,
               avg(dist) OVER (PARTITION BY label) AS mu,
               stddev_samp(dist) OVER (PARTITION BY label) AS sigma
        FROM dist)
    SELECT vec_id, label, round(dist, 4) AS dist,
           dist > mu + 2 * sigma AS is_outlier
    FROM stats
    """,
)
def embeddings_outlier_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid-distance outlier flags: the mislabeled-example
    / corrupted-embedding screen a training-data pipeline runs before
    contrastive fine-tuning. posexplode -> per-(label,dim) mean (one
    shuffle on a |labels| x 64 key space), join the exploded table back
    to its centroid, reduce to per-vector L2 distance (shuffle on
    vec_id), then a per-label window for the mu + 2 sigma cutoff. The
    centroid table is labels x dims — broadcast-sized at any corpus
    scale, so only the two data-sized exchanges remain at 100 TB."""
    emb = load(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("d", "x")
    ).withColumn("x", F.col("x").cast("double"))
    cent = e.groupBy("label", "d").agg(F.avg("x").alias("c"))
    dist = (
        e.join(F.broadcast(cent), ["label", "d"])
        .groupBy("vec_id", "label")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))).alias("dist"))
    )
    w = Window.partitionBy("label")
    return dist.select(
        "vec_id",
        "label",
        F.round("dist", 4).alias("dist"),
        (F.col("dist") > F.avg("dist").over(w) + 2 * F.stddev_samp("dist").over(w)).alias(
            "is_outlier"
        ),
    )


@register(
    "text_perplexity_bucket",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents),
    cnt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
    tot AS (SELECT lang, sum(c) AS n FROM cnt GROUP BY lang),
    ppl AS (
        SELECT tok.doc_id,
               round(exp(-avg(ln(cnt.c / tot.n))), 6) AS ppl
        FROM tok
        JOIN cnt ON tok.lang = cnt.lang AND tok.token = cnt.token
        JOIN tot ON tok.lang = tot.lang
        GROUP BY tok.doc_id)
    SELECT doc_id, ppl,
           CAST(ntile(3) OVER (ORDER BY ppl, doc_id) AS INT) AS bucket
    FROM ppl
    """,
)
def text_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: per-doc unigram perplexity
    under the corpus's own per-language LM, then exact terciles
    (head / middle / tail — CCNet keeps head+middle as training data,
    routes tail to manual review). Ranking is over the ROUNDED
    perplexity (6 dp) + doc_id, a total order both engines compute
    identically, so bucket boundaries cannot flip on last-ulp float
    noise. The tercile is exact_ntile over windows.global_rank — the
    distributed two-pass rank, no single-partition sort — and its input
    is the per-doc aggregate (corpus-sized rows, one row per doc)."""
    from basis_spark.operators.windows import exact_ntile, global_rank

    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("token"))
    cnt = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("n"))
    ppl = (
        tok.join(cnt, ["lang", "token"])
        .join(F.broadcast(tot), "lang")
        .groupBy("doc_id")
        .agg(F.round(F.exp(-F.avg(F.log(F.col("c") / F.col("n")))), 6).alias("ppl"))
    )
    ranked = global_rank(ppl, "ppl", "doc_id")
    return ranked.select(
        "doc_id", "ppl", exact_ntile(F.col("rank"), F.col("n_total"), 3).alias("bucket")
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               unnest([substring(text, i, 3)
                       for i in range(1, length(text) - 1)]) AS g
        FROM documents)
    SELECT doc_id, count(*) AS n_grams,
           count(DISTINCT g) AS n_distinct,
           round(1.0 - CAST(count(DISTINCT g) AS DOUBLE) / count(*), 6)
               AS rep_ratio
    FROM g GROUP BY doc_id
    """,
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratio (the Gopher/MassiveText quality
    rule): 1 - distinct/total character 3-grams. Highly repetitive docs
    (boilerplate, keyword stuffing, generation loops) score near 1 and
    get dropped before training. One explode + one per-doc aggregate —
    the distinct runs inside the doc_id group, so cardinality is
    per-doc bounded and the shuffle key is doc_id only."""
    # length >= 3 guard: sequence(1, len-2) descends for len < 3
    # r11 (guide §2.4, remove shuffles outright): both statistics are
    # PER-DOC functions of the doc's own gram multiset, so the explode +
    # groupBy + countDistinct pair (two exchanges moving every 3-gram
    # string) collapses to one map-side projection — n_grams is just
    # length-2 and n_distinct is size(array_distinct(grams)) computed
    # inside the row. Zero exchanges in the plan; identical output.
    # Repartition: single-row-group fixture would serialize the gram
    # scan on one core (same convention as the multimodal decoders).
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 3)
        .repartition(spread_width(32), "doc_id")
    )
    grams = F.expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
    )
    return docs.select(
        "doc_id",
        # size(grams) == length-2 by construction; avoids materializing
        # the gram array a second time just to count it
        (F.length("text") - 2).cast("long").alias("n_grams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
    ).select(
        "doc_id",
        "n_grams",
        "n_distinct",
        F.round(
            1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"), 6
        ).alias("rep_ratio"),
    )


@register(
    "text_bigram_pmi",
    oracle="""
    WITH tok AS (
        SELECT doc_id, t, lead(t) OVER (PARTITION BY doc_id ORDER BY i) AS t2
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t,
                     generate_subscripts(string_split(text, ' '), 1) AS i
              FROM documents)),
    uni AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
    n AS (SELECT sum(c) AS n FROM uni),
    bi AS (SELECT t, t2, count(*) AS c2 FROM tok WHERE t2 IS NOT NULL GROUP BY t, t2)
    SELECT bi.t AS w1, bi.t2 AS w2, CAST(bi.c2 AS BIGINT) AS n_pair,
           round(ln((CAST(bi.c2 AS DOUBLE) * n.n)
                    / (CAST(u1.c AS DOUBLE) * u2.c)), 6) AS pmi
    FROM bi JOIN uni u1 ON bi.t = u1.t
            JOIN uni u2 ON bi.t2 = u2.t, n
    WHERE bi.c2 >= 5
    """,
)
def text_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs (collocation
    mining — the statistic behind phrase detection in tokenizer/embedding
    pipelines): PMI = ln(P(a,b) / P(a)P(b)), support >= 5. Token
    positions come from posexplode (order matters for adjacency);
    unigram counts broadcast back onto the bigram table, and the corpus
    total is a 1-row broadcast. Shuffles: tokens->doc window (doc_id),
    bigram count, unigram count — all key-bounded."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "t")
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    pairs = tok.withColumn("t2", F.lead("t").over(w))
    uni = pairs.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    n = uni.agg(F.sum("c").alias("n"))
    bi = (
        pairs.filter(F.col("t2").isNotNull())
        .groupBy("t", "t2")
        .agg(F.count(F.lit(1)).alias("c2"))
        .filter(F.col("c2") >= 5)
    )
    u2 = uni.select(F.col("t").alias("t2"), F.col("c").alias("cb"))
    return (
        # unigram tables grow with the vocabulary: leave the strategy to
        # AQE; only the 1-row grand total keeps a mandatory broadcast
        bi.join(uni, "t")
        .join(u2, "t2")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("t").alias("w1"),
            F.col("t2").alias("w2"),
            F.col("c2").cast("long").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c2").cast("double") * F.col("n"))
                    / (F.col("c").cast("double") * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
    )


@register(
    "eval_langid_confusion",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    lt AS (SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token),
    totals AS (SELECT lang, sum(c) AS t FROM lt GROUP BY lang),
    vocab AS (SELECT count(DISTINCT token) AS v FROM tok),
    langs AS (SELECT DISTINCT lang FROM documents),
    scores AS (
        SELECT tok.doc_id, langs.lang AS cand,
               sum(ln((coalesce(lt.c, 0) + 1.0) / (totals.t + vocab.v))) AS score
        FROM tok
        CROSS JOIN langs
        LEFT JOIN lt ON lt.lang = langs.lang AND lt.token = tok.token
        JOIN totals ON totals.lang = langs.lang
        CROSS JOIN vocab
        GROUP BY tok.doc_id, langs.lang
    ),
    pred AS (
        SELECT doc_id, cand AS pred_lang FROM (
            SELECT doc_id, cand,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY round(score, 6) DESC, cand) AS rn
            FROM scores) t
        WHERE rn = 1)
    SELECT d.lang AS true_lang, p.pred_lang,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY d.lang), 6) AS row_frac
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY d.lang, p.pred_lang
    """,
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix (counts + row-normalized fractions) for the
    self-trained naive-Bayes language identifier against the labeled
    lang column — the classifier-evaluation pattern as a first-class
    operator, so model QA runs inside the same engine as the pipeline
    it gates. Reuses text_langid_ngram's prediction plan verbatim and
    adds one broadcast join back to the labels plus a |langs|^2-bounded
    aggregate; the per-true-lang normalization is a window over that
    tiny matrix."""
    docs = load(spark, sf_dir, "documents")
    pred = text_langid_ngram(spark, sf_dir)
    w = Window.partitionBy("true_lang")
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(pred, "doc_id")
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "true_lang",
            "pred_lang",
            "n",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(w), 6
            ).alias("row_frac"),
        )
    )


@register(
    "text_url_canonical_dedup",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'HTTPS://' || source || '.Example.COM:443/docs/'
               || CAST(doc_id % 100 AS VARCHAR)
               || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
               || '?utm_source=feed&lang=' || lang || '&utm_campaign=x' AS url
        FROM documents),
    c AS (
        SELECT doc_id,
               'https://' || lower(regexp_extract(url, '^[A-Za-z]+://([^/:?]+)', 1))
               || regexp_replace(
                      coalesce(regexp_extract(url, '^[A-Za-z]+://[^/?]+(/[^?]*)', 1), ''),
                      '/$', '')
               || '?lang=' || regexp_extract(url, 'lang=([^&]+)', 1) AS canon
        FROM u)
    SELECT canon, CAST(count(*) AS BIGINT) AS n_dupes,
           min(doc_id) AS cluster_id
    FROM c GROUP BY canon
    """,
)
def text_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup — the first dedup pass every web
    corpus runs, BEFORE any content hashing: lowercase the host, drop
    the default port, strip the trailing slash, and discard tracking
    params (utm_*), keeping only semantic ones. The messy URLs are
    synthesized deterministically (mixed-case host, :443, tracking
    params, doc_id%100 collisions so clusters exist); canonicalization
    is a map-only regex chain, then one shuffle on the canonical key —
    same contract as dedup_exact but on the identifier, not the
    payload."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("HTTPS://"),
        F.col("source"),
        F.lit(".Example.COM:443/docs/"),
        (F.col("doc_id") % 100).cast("string"),
        F.when(F.col("doc_id") % 2 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&lang="),
        F.col("lang"),
        F.lit("&utm_campaign=x"),
    )
    canon = F.concat(
        F.lit("https://"),
        F.lower(F.regexp_extract(F.col("url"), r"^[A-Za-z]+://([^/:?]+)", 1)),
        F.regexp_replace(
            F.coalesce(
                F.regexp_extract(F.col("url"), r"^[A-Za-z]+://[^/?]+(/[^?]*)", 1),
                F.lit(""),
            ),
            r"/$",
            "",
        ),
        F.lit("?lang="),
        F.regexp_extract(F.col("url"), r"lang=([^&]+)", 1),
    )
    return (
        docs.select("doc_id", url.alias("url"))
        .select("doc_id", canon.alias("canon"))
        .groupBy("canon")
        .agg(F.count(F.lit(1)).alias("n_dupes"), F.min("doc_id").alias("cluster_id"))
    )


@register(
    "embeddings_truncate_mrl",
    oracle="""
    WITH q AS (
        SELECT list_slice(embedding, 1, 16) AS qt FROM embeddings WHERE vec_id = 0),
    t AS (
        SELECT vec_id, label, list_slice(embedding, 1, 16) AS et, embedding
        FROM embeddings WHERE vec_id <> 0),
    s AS (
        SELECT vec_id, label,
               list_sum(list_transform(list_zip(et, (SELECT qt FROM q)),
                   x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(et, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt((SELECT list_sum(list_transform(qt, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) FROM q)))
                   AS cos_t
        FROM t)
    SELECT vec_id, label, round(cos_t, 6) AS cos_trunc
    FROM s ORDER BY cos_t DESC, vec_id LIMIT 10
    """,
)
def embeddings_truncate_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation: score the query against
    only the FIRST 16 of 64 dims (renormalized cosine) — the
    coarse-to-fine retrieval trick MRL embeddings enable (prefix dims
    carry most of the signal, so a 4x-cheaper first pass prunes
    candidates before full-dim re-rank; similarity_topk IS that
    re-rank). Map-only slice + dot product, TakeOrdered top-10; the
    full-dim re-rank composition is the documented pipeline."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.expr("slice(embedding, 1, 16)").alias("qt")
    )
    t = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "label", F.expr("slice(embedding, 1, 16)").alias("et")
    )
    dot = F.expr(
        "aggregate(zip_with(et, qt, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (s, v) -> s + v)"
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.expr(
            f"aggregate(transform({c}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
            " 0D, (s, v) -> s + v)"
        )
    )
    return (
        t.join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            (dot / (norm("et") * norm("qt"))).alias("cos_t"),
        )
        .orderBy(F.desc("cos_t"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", "label", F.round("cos_t", 6).alias("cos_trunc"))
    )


@register(
    "text_extract_typed_spans",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               'contact ' || source || CAST(doc_id AS VARCHAR)
               || '@mail-' || lang || '.com id=' || CAST(doc_id * 7919 AS VARCHAR)
               || ' ref=' || lang || '-' || CAST(doc_id % 97 AS VARCHAR) AS line
        FROM documents),
    spans AS (
        SELECT doc_id, 'EMAIL' AS span_type,
               unnest(regexp_extract_all(line, '[A-Za-z0-9._-]+@[A-Za-z0-9.-]+')) AS span
        FROM w
        UNION ALL
        SELECT doc_id, 'ID',
               unnest(regexp_extract_all(line, 'id=[0-9]+'))
        FROM w
        UNION ALL
        SELECT doc_id, 'REF',
               unnest(regexp_extract_all(line, 'ref=[a-z]+-[0-9]+'))
        FROM w)
    SELECT doc_id, span_type, span FROM spans
    """,
)
def text_extract_typed_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed span extraction (regex-tier NER): pull EMAIL / ID / REF
    spans out of synthesized contact lines — the extraction
    counterpart of text_mask_redact (that op removes PII; this one
    routes it to a quarantine table). regexp_extract_all + explode per
    type, all map-only; one union of three narrow extract passes over
    the same projected line."""
    docs = load(spark, sf_dir, "documents")
    line = F.concat(
        F.lit("contact "),
        F.col("source"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        F.col("lang"),
        F.lit(".com id="),
        (F.col("doc_id") * 7919).cast("string"),
        F.lit(" ref="),
        F.col("lang"),
        F.lit("-"),
        (F.col("doc_id") % 97).cast("string"),
    )
    w = docs.select("doc_id", line.alias("line"))
    out = None
    for span_type, pat in (
        ("EMAIL", r"[A-Za-z0-9._-]+@[A-Za-z0-9.-]+"),
        ("ID", r"id=[0-9]+"),
        ("REF", r"ref=[a-z]+-[0-9]+"),
    ):
        part = w.select(
            "doc_id",
            F.lit(span_type).alias("span_type"),
            F.explode(F.expr(f"regexp_extract_all(line, '{pat}', 0)")).alias("span"),
        )
        out = part if out is None else out.unionByName(part)
    return out


@register(
    "dedup_exact_normalized",
    oracle="""
    WITH n AS (
        SELECT doc_id,
               md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
        FROM documents)
    SELECT h, CAST(count(*) AS BIGINT) AS n_docs, min(doc_id) AS keep_id
    FROM n GROUP BY h
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized exact dedup: casefold + whitespace-collapse + trim
    BEFORE hashing — the middle rung between dedup_exact (byte-exact)
    and the near-dup family: catches re-wrapped/re-cased copies that
    byte hashing misses without any banding machinery. Map-only
    normalize+md5, one shuffle on the hash; at 100 TB this pass
    typically removes 10-30% of a web corpus before MinHash runs,
    shrinking the expensive stage's input by that factor."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    return docs.select("doc_id", h.alias("h")).groupBy("h").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id")
    )


_RP_OUT_DIMS = 8
_RP_EVEN = ("0", "2", "4", "6", "8", "a", "c", "e")


@register(
    "embeddings_random_projection",
    oracle="""
    WITH ev AS (SELECT vec_id, g.i AS i, embedding[g.i]::DOUBLE AS x
                FROM embeddings, generate_series(1, 64) g(i)),
    pj AS (SELECT ev.vec_id, j.j AS j,
                  round(sum(x * CASE WHEN substring(md5(CAST(ev.i - 1 AS VARCHAR)
                             || '_' || CAST(j.j AS VARCHAR)), 1, 1)
                             IN ('0','2','4','6','8','a','c','e')
                             THEN 1 ELSE -1 END), 6) AS p
           FROM ev, generate_series(0, 7) j(j) GROUP BY 1, 2)
    SELECT vec_id,
           round(max(CASE WHEN j = 0 THEN p END), 6) AS p0,
           round(max(CASE WHEN j = 1 THEN p END), 6) AS p1,
           round(max(CASE WHEN j = 2 THEN p END), 6) AS p2,
           round(max(CASE WHEN j = 3 THEN p END), 6) AS p3,
           round(max(CASE WHEN j = 4 THEN p END), 6) AS p4,
           round(max(CASE WHEN j = 5 THEN p END), 6) AS p5,
           round(max(CASE WHEN j = 6 THEN p END), 6) AS p6,
           round(max(CASE WHEN j = 7 THEN p END), 6) AS p7
    FROM pj GROUP BY vec_id
    """,
)
def embeddings_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sketch: project 64-d embeddings to 8-d with
    a DETERMINISTIC ±1 sign matrix derived from md5(i_j) — no fitted
    model, no broadcast state, and any engine regenerates the identical
    matrix (which is what makes the sketch usable as a cross-system
    pre-filter key: distances are approximately preserved, so coarse
    candidate pruning can run on 8 doubles before exact cosine on 64).
    The whole projection is a JVM map-side expression per output dim —
    a static sum over array elements, no explode, no shuffle, no UDF.
    Honest caveat (tests/test_corpus_ops.py): on the fixture's
    near-uniform random embeddings true distances concentrate (~12%
    spread), so k=8 cannot ORDER them — the pinned property is JL
    unbiasedness (mean norm ratio ≈ 1), and real-world manifold
    embeddings are where the rank-preserving pre-filter pays off."""
    # r11 (guide §1.2 "per-task work" + §7.2): the original built each
    # projection as a 64-term when/otherwise expression chain — 8 x 64
    # = 512 nodes, a 36 KB formatted plan, and 8.4 s per action at
    # sf0.1 (PERF_RANK), almost all of it Catalyst analysis + Janino
    # compilation of the giant generated method (2,000 fixture rows are
    # microseconds of real work). Giant codegen methods are also a
    # 100 TB risk: past the 64 KB JVM method limit Spark silently falls
    # back to interpreted evaluation. The sign matrix is deterministic
    # (md5 of "i_j"), so fold it to literal arrays in Python (hashlib
    # md5 == Spark md5) and reduce each projection with ONE aggregate()
    # higher-order function. aggregate() is a left fold in index order,
    # so the floating-point addition order — hence every output bit —
    # is identical to the old i-ascending chain (0.0 + t0 == t0).
    import hashlib

    emb = load(spark, sf_dir, "embeddings")
    even = set(_RP_EVEN)

    def proj(j: int):
        signs = F.array(
            *[
                F.lit(
                    1.0
                    if hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0] in even
                    else -1.0
                )
                for i in range(64)
            ]
        )
        folded = F.aggregate(
            F.zip_with("embedding", signs, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.round(folded, 6).alias(f"p{j}")

    return emb.select("vec_id", *[proj(j) for j in range(_RP_OUT_DIMS)])


@register(
    "text_dedup_paragraph",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents WHERE text IS NOT NULL),
    ix AS (
        SELECT doc_id, toks,
               unnest(generate_series(
                   0, CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1)) AS pos
        FROM t),
    p AS (
        SELECT doc_id, pos,
               array_to_string(toks[(pos*10+1):(pos*10+10)], ' ') AS para
        FROM ix),
    r AS (
        SELECT doc_id, pos, para,
               row_number() OVER (
                   PARTITION BY para ORDER BY doc_id, pos) AS rn
        FROM p)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           COALESCE(string_agg(para, ' ' ORDER BY pos)
                        FILTER (WHERE rn = 1), '') AS text_kept
    FROM r GROUP BY doc_id
    """,
)
def text_dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style paragraph-level deduplication WITH reassembly: split
    each doc into fixed 10-token paragraphs, keep only the globally
    FIRST occurrence of each paragraph (ordered by doc_id, pos), and
    rebuild every doc's surviving text in original order — the
    Raffel et al. (C4) span-removal step, where text_span_dup_mass
    only MEASURES the duplicated mass, this removes it. Fixture has
    ~5% duplicated paragraphs, so reassembly genuinely differs from
    identity.

    Scale shape: tokenize once map-side, ONE shuffle keyed on
    paragraph content for the global keep-first window (dedup_exact's
    contract at paragraph granularity — finer keys, better balance),
    one shuffle back on doc_id for ordered reassembly. Nothing is
    quadratic; the paragraph relation is ~n_tokens/10 rows of 10-token
    strings. At 100 TB you'd hash the paragraph to 16 bytes for the
    shuffle key and carry text only on the winner — same plan, thinner
    rows."""
    toks = F.split("text", " ")
    paras = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(split(text, ' ')) / 10.0)) - 1),"
                    " i -> array_join(slice(split(text, ' '), i*10 + 1, 10), ' '))"
                )
            ).alias("pos", "para"),
        )
    )
    w = Window.partitionBy("para").orderBy("doc_id", "pos")
    r = paras.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("pos", "para"))
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda x: x["para"]
            ),
            " ",
        ).alias("text_kept"),
    )


@register(
    "embeddings_binary_hamming_topk",
    oracle="""
    WITH packed AS (
        SELECT vec_id, label,
               list_sum([CASE WHEN embedding[i + 1] > 0
                              THEN CAST(1 AS BIGINT) << i ELSE 0 END
                         for i in generate_series(0, 31)]) AS lo,
               list_sum([CASE WHEN embedding[i + 1] > 0
                              THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END
                         for i in generate_series(32, 63)]) AS hi
        FROM embeddings),
    q AS (SELECT lo AS qlo, hi AS qhi FROM packed WHERE vec_id = 0),
    d AS (
        SELECT p.vec_id, p.label,
               CAST(bit_count(xor(p.lo, q.qlo))
                    + bit_count(xor(p.hi, q.qhi)) AS BIGINT) AS hamming
        FROM packed p CROSS JOIN q WHERE p.vec_id <> 0)
    SELECT vec_id, label, hamming FROM d
    ORDER BY hamming, vec_id LIMIT 10
    """,
)
def embeddings_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized retrieval: sign-bit embeddings (64 dims -> two
    32-bit words) ranked by Hamming distance — the 32x-compression
    retrieval mode modern embedding APIs ship (binary MRL), and the
    third rung of the quantization ladder here (float32 ->
    int8 embeddings_quantize_int8 -> 1-bit). Distance is two XORs and
    two popcounts per candidate, ALL JVM integer ops — at 100 TB this
    is the cheapest possible first-stage ranker (the int8 or float
    re-rank runs on its top-k only, the same candidates-then-exact
    contract as the LSH paths). Packing is a fold over sequence() into
    two BIGINT halves so neither engine touches the sign bit; top-k is
    TakeOrdered, never a global sort."""
    emb = load(spark, sf_dir, "embeddings")
    pack = lambda lo, hi: F.expr(  # noqa: E731
        f"aggregate(sequence({lo}, {hi}), 0L, (acc, i) -> acc +"
        f" IF(element_at(embedding, i + 1) > 0, shiftleft(1L, i - {lo}), 0L))"
    )
    packed = emb.select(
        "vec_id", "label", pack(0, 31).alias("lo"), pack(32, 63).alias("hi")
    )
    q = packed.filter(F.col("vec_id") == 0).select(
        F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    ham = F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo"))) + F.bit_count(
        F.col("hi").bitwiseXOR(F.col("qhi"))
    )
    return (
        packed.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", "label", ham.cast("long").alias("hamming"))
        .orderBy("hamming", "vec_id")
        .limit(10)
    )


_PII_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE_RE = "\\+1-555-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents),
    s AS (
        SELECT doc_id, t,
               regexp_replace(regexp_replace(t,
                   '{_PII_EMAIL_RE}', '[EMAIL]', 'g'),
                   '{_PII_PHONE_RE}', '[PHONE]', 'g') AS clean
        FROM aug)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(clean, '{_PII_EMAIL_RE}'))
              + len(regexp_extract_all(clean, '{_PII_PHONE_RE}')) AS BIGINT)
               AS n_residual,
           md5(clean) AS clean_sig
    FROM s
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass — the compliance stage every training-data
    pipeline runs before anything ships: detect and replace email
    addresses and phone numbers, and PROVE removal by re-scanning the
    scrubbed text (n_residual is pinned to 0 by the oracle, and the
    md5 of the scrubbed text pins the replacement byte-for-byte, so a
    regex that over- or under-matches on either engine is a hash
    mismatch). The fixture corpus carries no real PII, so a
    deterministic synthetic contact line (derived from doc_id) is
    appended first — the scrubber itself never sees the difference.
    Patterns are deliberately in the Java-regex ∩ RE2 common subset
    (character classes, bounded repetition — no lookaround), which is
    also the production constraint when the same policy file drives
    scrubbers in multiple engines. Map-only: three regex passes fused
    into one codegen stage, no shuffle at any scale."""
    docs = load(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    d = docs.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace("t", _PII_EMAIL_RE, "[EMAIL]"),
        _PII_PHONE_RE,
        "[PHONE]",
    )
    s = d.select("doc_id", "t", clean.alias("clean"))
    n_of = lambda col, pat: F.size(  # noqa: E731
        F.regexp_extract_all(col, F.lit(pat), F.lit(0))
    )
    return s.select(
        "doc_id",
        n_of("t", _PII_EMAIL_RE).cast("long").alias("n_emails"),
        n_of("t", _PII_PHONE_RE).cast("long").alias("n_phones"),
        (n_of("clean", _PII_EMAIL_RE) + n_of("clean", _PII_PHONE_RE))
        .cast("long")
        .alias("n_residual"),
        F.md5("clean").alias("clean_sig"),
    )


@register(
    "similarity_maxsim_multivector",
    oracle="""
    WITH mv AS (SELECT vec_id, label, embedding FROM embeddings),
    q AS (SELECT vec_id AS q_vec_id, embedding AS qe FROM mv
          WHERE vec_id < 5),
    scored AS (
        SELECT q.q_vec_id, e.vec_id, e.label,
               round(list_sum(list_transform(range(0, 8), qi ->
                   list_max(list_transform(range(0, 8), dj ->
                       list_sum(list_transform(
                           list_zip(q.qe[qi*8+1 : qi*8+8],
                                    e.embedding[dj*8+1 : dj*8+8]),
                           x -> x[1]::DOUBLE * x[2]::DOUBLE)))))), 6)
                   AS maxsim
        FROM q JOIN mv e ON e.vec_id <> q.q_vec_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                  ORDER BY maxsim DESC, vec_id) AS rank FROM scored)
    SELECT q_vec_id, vec_id, label, CAST(rank AS BIGINT) AS rank, maxsim
    FROM r WHERE rank <= 3
    """,
)
def similarity_maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval (MaxSim): each vector
    is treated as EIGHT 8-d token sub-vectors (a deterministic
    multi-vector view of the 64-d fixture embedding — production
    stores real per-token vectors in exactly this array<float> layout),
    and the query-document score is
        sum over query tokens of max over doc tokens of dot(q_i, d_j)
    — the scoring rule that beats single-vector cosine on long
    documents because each query token finds its own best-matching
    span. The whole 8x8 interaction matrix is a PURE JVM expression
    (nested transform/aggregate higher-order functions — no UDF, no
    Python), so scoring stays in codegen and fuses with the broadcast
    of the bounded query set; ranking is per-query WindowGroupLimit.
    At 100 TB the documented pruning is the standard two-stage form:
    single-vector (or binary-Hamming) first stage, MaxSim re-rank on
    its top-k only. Scores rounded to 6dp BEFORE ranking; ties break
    on vec_id."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_vec_id"), F.col("embedding").alias("qe")
    )
    maxsim = F.expr(
        """
        aggregate(
          transform(sequence(0, 7), qi ->
            array_max(transform(sequence(0, 7), dj ->
              aggregate(
                zip_with(slice(qe, qi*8+1, 8), slice(embedding, dj*8+1, 8),
                         (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                0D, (s, v) -> s + v)))),
          0D, (s, v) -> s + v)
        """
    )
    scored = emb.join(
        F.broadcast(q), F.col("vec_id") != F.col("q_vec_id")
    ).select(
        "q_vec_id", "vec_id", "label", F.round(maxsim, 6).alias("maxsim")
    )
    w = Window.partitionBy("q_vec_id").orderBy(
        F.desc("maxsim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("q_vec_id", "vec_id", "label", "rank", "maxsim")
    )


@register(
    "embeddings_dim_stats",
    oracle="""
    WITH e AS (
      SELECT g.i - 1 AS dim, CAST(embedding[g.i] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(i))
    SELECT dim,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(x), 6) AS mean,
           round(stddev_pop(x), 6) AS std,
           round(min(x), 6) AS lo,
           round(max(x), 6) AS hi
    FROM e GROUP BY dim
    """,
)
def embeddings_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution profile of the embedding lake (mean,
    population std, range per coordinate) — the readout that feeds
    whitening, dead-dimension pruning, and anisotropy checks (a dim
    whose std is ~0 carries no information; a mean far from 0 breaks
    dot-product-as-cosine assumptions).

    posexplode streams (dim, x) pairs straight into a partial-
    aggregating hash agg keyed on dim — D output rows, one exchange of
    D x P partial states, nothing vector-sized on any single node. This
    is the canonical 100 TB shape for any per-coordinate statistic
    (same scaffold as the IVF centroid build)."""
    e = load(spark, sf_dir, "embeddings").select(
        F.posexplode("embedding").alias("dim", "xf")
    ).select("dim", F.col("xf").cast("double").alias("x"))
    return e.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), 6).alias("mean"),
        F.round(F.stddev_pop("x"), 6).alias("std"),
        F.round(F.min("x"), 6).alias("lo"),
        F.round(F.max("x"), 6).alias("hi"),
    )


@register(
    "embeddings_standardize",
    oracle="""
    WITH e AS (
      SELECT vec_id, g.i - 1 AS dim, CAST(embedding[g.i] AS DOUBLE) AS x
      FROM embeddings, generate_series(1, 64) g(i)),
    s AS (
      SELECT dim, avg(x) AS mu, stddev_pop(x) AS sd FROM e GROUP BY dim),
    z AS (
      SELECT e.vec_id, (e.x - s.mu) / s.sd AS zx
      FROM e JOIN s ON e.dim = s.dim)
    SELECT vec_id,
           round(sum(zx), 4) AS z_sum,
           round(sum(zx * zx), 4) AS z_norm_sq,
           round(max(abs(zx)), 4) AS z_max_abs
    FROM z GROUP BY vec_id
    """,
)
def embeddings_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (z-scoring) of every embedding —
    the diagonal-whitening step run before cosine-based dedup or ANN
    when dimensions have wildly different scales. Emits per-vector
    checksums of the standardized coordinates (sum, squared norm, max
    |z|) so the oracle pins every transformed value without an array
    column in the compared schema.

    The (dim -> mu, sd) table is D rows — computed with one exploded
    hash agg and BROADCAST back onto the exploded stream (a map-side
    join; the only shuffle after it is the vec_id re-assembly agg).
    Stats-then-broadcast is the 100 TB recipe: never a second scan,
    never a driver-side vector."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    s = e.groupBy("dim").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd")
    )
    z = e.join(F.broadcast(s), "dim").select(
        "vec_id", ((F.col("x") - F.col("mu")) / F.col("sd")).alias("zx")
    )
    return z.groupBy("vec_id").agg(
        F.round(F.sum("zx"), 4).alias("z_sum"),
        F.round(F.sum(F.col("zx") * F.col("zx")), 4).alias("z_norm_sq"),
        F.round(F.max(F.abs("zx")), 4).alias("z_max_abs"),
    )


@register(
    "text_vocab_growth",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents),
    first_seen AS (
      SELECT token, min(doc_id) AS fs FROM tok GROUP BY token),
    types_per_bucket AS (
      SELECT fs // 50 AS bucket, count(*) AS new_types
      FROM first_seen GROUP BY 1),
    tokens_per_bucket AS (
      SELECT doc_id // 50 AS bucket, count(*) AS n_tokens
      FROM tok GROUP BY 1)
    SELECT t.bucket,
           CAST(coalesce(y.new_types, 0) AS BIGINT) AS new_types,
           CAST(sum(coalesce(y.new_types, 0))
                OVER (ORDER BY t.bucket) AS BIGINT) AS cum_types,
           CAST(sum(t.n_tokens) OVER (ORDER BY t.bucket) AS BIGINT)
               AS cum_tokens
    FROM tokens_per_bucket t
    LEFT JOIN types_per_bucket y ON t.bucket = y.bucket
    """,
)
def text_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (Heaps'-law readout): cumulative distinct
    token types vs cumulative token volume, in corpus ingest order
    bucketed 50 docs at a time — the curve that tells a tokenizer/
    dedup pipeline whether new data is still contributing vocabulary or
    the corpus has saturated (a flattening type curve under a rising
    token curve = diminishing novelty; a dedup regression makes it
    flatten EARLY).

    First-seen is a min() per token (one token-keyed shuffle — the
    exact shape of dedup_exact's hash dedup), bucket rollups are two
    tiny hash aggs, and the cumulative window runs over the
    bucket-count-bounded spine (declared single partition; ~|docs|/50
    rows, never data-sized)."""
    tok = load(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("fs"))
    types_b = first_seen.groupBy(
        (F.col("fs") / 50).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("new_types"))
    tokens_b = tok.groupBy(
        (F.col("doc_id") / 50).cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n_tokens"))
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tokens_b.join(types_b, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
            F.sum(F.coalesce("new_types", F.lit(0))).over(w).alias("cum_types"),
            F.sum("n_tokens").over(w).alias("cum_tokens"),
        )
    )


@register(
    "text_zipf_slope",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents),
    freq AS (SELECT token, count(*) AS f FROM tok GROUP BY token),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
      FROM freq)
    SELECT CAST(count(*) AS BIGINT) AS n_top,
           round(regr_slope(ln(f), ln(r)), 6) AS zipf_slope,
           round(regr_intercept(ln(f), ln(r)), 6) AS zipf_intercept,
           round(regr_r2(ln(f), ln(r)), 6) AS r2
    FROM ranked WHERE r <= 100
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the corpus: OLS slope of ln(frequency) on
    ln(rank) over the top-100 token types — natural corpora run close
    to -1; machine-generated or template-heavy corpora deviate hard,
    making this a one-row corpus-health fingerprint (and a drift check
    between ingest batches).

    Token counting is one token-keyed hash agg; the top 100 come from
    orderBy+limit — TakeOrderedAndProject, a distributed per-partition
    top-k plus a 100-row merge, NEVER a vocab-sized sort (tie-broken
    deterministically by token so both engines pick the same set);
    ranks are then a window over that bounded 100-row relation
    (declared single partition, same justification as tpch_q15) and
    the regression is Spark's built-in regr_* — a 1-row algebraic
    combine, no collect."""
    tok = load(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
    top = freq.orderBy(F.col("f").desc(), F.col("token")).limit(100)
    w = Window.orderBy(F.col("f").desc(), F.col("token"))
    ranked = top.select("f", F.row_number().over(w).alias("r"))
    lf, lr = F.log("f"), F.log("r")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_top"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lf, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


@register(
    "multimodal_shard_index",
    oracle="""
    SELECT doc_id % 16 AS shard_id,
           doc_id,
           CAST(coalesce(sum(n_chars) OVER (
               PARTITION BY doc_id % 16 ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS byte_offset,
           n_chars AS byte_length
    FROM documents
    """,
)
def multimodal_shard_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sample random-access index for packed training shards (the
    .idx sidecar a dataloader seeks with): within each shard, samples
    are laid out in doc_id order and every sample's byte offset is the
    running sum of the payloads before it. shard_pack emits the
    per-shard MANIFEST (counts/bytes); this emits the per-SAMPLE seek
    table — together they are the WebDataset-style shard contract.

    One window per shard partition (exclusive prefix sum via ROWS ...
    1 PRECEDING, so sample 0 starts at offset 0) — the shuffle is
    keyed on shard_id exactly like the pack stage, and at 100 TB the
    index write rides the same partitionBy(shard_id) sink as the
    payload, one pass, no second scan."""
    docs = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy(F.col("doc_id") % 16)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return docs.select(
        (F.col("doc_id") % 16).alias("shard_id"),
        "doc_id",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("byte_offset"),
        F.col("n_chars").alias("byte_length"),
    )


@register(
    "embeddings_pq_quantize",
    oracle="""
    WITH sub AS (
      SELECT vec_id, s.range AS s,
             [CAST(embedding[s.range * 8 + j + 1] AS DOUBLE)
              for j in range(8)] AS v
      FROM embeddings, range(8) s),
    anchors AS (
      SELECT vec_id AS code, s, v AS av FROM sub WHERE vec_id < 16),
    d AS (
      SELECT sub.vec_id, sub.s, a.code,
             round(list_sum(list_transform(range(8),
                 j -> (sub.v[j + 1] - a.av[j + 1])
                    * (sub.v[j + 1] - a.av[j + 1]))), 6) AS d2
      FROM sub JOIN anchors a ON sub.s = a.s),
    best AS (
      SELECT vec_id, s, code, d2,
             row_number() OVER (PARTITION BY vec_id, s
                                ORDER BY d2, code) AS rnk
      FROM d)
    SELECT vec_id,
           CAST(sum(code) AS BIGINT) AS code_sum,
           round(sum(d2), 6) AS recon_err_sq
    FROM best WHERE rnk = 1 GROUP BY vec_id
    """,
)
def embeddings_pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: the 64-dim vector splits into 8 subspaces
    of 8 dims, each encoded as the id of its nearest codebook anchor —
    the compression rung between int8 scalar quantization and binary
    Hamming (8 bytes/vector here, with asymmetric distance still
    computable per subspace). Codebooks are the first 16 vectors'
    sub-vectors — DETERMINISTIC anchors, which is what upgrades PQ
    from the tolerance tier (learned k-means codebooks,
    similarity_ann_ivf_kmeans's territory) to an exact value-hash
    oracle; swapping in learned centroids changes only the broadcast
    table. Emits per-vector code checksum + total squared
    reconstruction error (rounded per subspace BEFORE the argmin and
    the sum, so float summation order can't flip a tie on either
    engine; ties break by anchor id).

    Scale shape: the codebook is 16x8 floats x 8 subspaces — a
    broadcast, never a shuffle; assignment is map-side per (vector,
    subspace); the only exchange is the final vec_id re-assembly agg."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ve"),
    )
    sub = emb.select(
        "vec_id",
        F.explode(
            F.expr(
                "transform(sequence(0, 7), s ->"
                " struct(s AS s, slice(ve, s * 8 + 1, 8) AS v))"
            )
        ).alias("sv"),
    ).select("vec_id", F.col("sv.s").alias("s"), F.col("sv.v").alias("v"))
    anchors = sub.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("code"), "s", F.col("v").alias("av")
    )
    d2 = F.round(
        F.expr(
            "aggregate(zip_with(v, av, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (acc, e) -> acc + e)"
        ),
        6,
    )
    j = sub.join(F.broadcast(anchors), "s").select(
        "vec_id", "s", "code", d2.alias("d2")
    )
    w = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    best = j.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    return best.groupBy("vec_id").agg(
        F.sum("code").alias("code_sum"),
        F.round(F.sum("d2"), 6).alias("recon_err_sq"),
    )


@register(
    "text_hash_features",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest([substring(text, i, 3)
                     for i in range(1, length(text) - 1)]) AS g
      FROM documents WHERE length(text) >= 3),
    buckets AS (
      SELECT doc_id,
             CAST(('0x' || substring(md5(g), 1, 8)) AS BIGINT) % 64 AS b
      FROM grams),
    per_bucket AS (
      SELECT doc_id, b, count(*) AS c FROM buckets GROUP BY doc_id, b)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS nnz_buckets,
           CAST(sum(b * c) AS BIGINT) AS bucket_checksum
    FROM per_bucket GROUP BY doc_id
    """,
)
def text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing-trick vectorizer): every char
    3-gram hashes into one of 64 buckets, giving each document a
    fixed-width sparse count vector with NO vocabulary to build,
    broadcast, or version — the property that makes hashed features
    the only practical text featurizer at 100 TB (a fitted vocabulary
    is a second pass plus a coordination artifact; a hash function is
    neither). Emits per-doc vector stats (total grams, nonzero
    buckets, bucket-weighted checksum) so the oracle pins every
    bucket assignment without comparing an array column.

    Map-side gram explode -> (doc, bucket) hash agg -> per-doc rollup;
    the md5-derived bucket is the same deterministic-hash convention
    as the sampling/bootstrap keys, so the 'model features' are
    bit-reproducible across engines and reruns."""
    # Repartition: single-row-group fixture would serialize the gram
    # explode + md5 on one core (guide §2.5 input skew).
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.length("text") >= 3)
        .repartition(spread_width(32), "doc_id")
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 2),"
                " i -> substring(text, i, 3))"
            )
        ).alias("g"),
    )
    b = (
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long") % 64
    ).alias("b")
    per_bucket = grams.select("doc_id", b).groupBy("doc_id", "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_bucket.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("nnz_buckets"),
        F.sum(F.col("b") * F.col("c")).alias("bucket_checksum"),
    )


@register(
    "multimodal_shard_pack_balanced",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS r
      FROM documents),
    routed AS (
      SELECT doc_id, n_chars,
             CASE WHEN (r // 16) % 2 = 0
                  THEN r % 16 ELSE 15 - (r % 16) END AS shard_id
      FROM ranked)
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM routed GROUP BY shard_id
    """,
)
def multimodal_shard_pack_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIZE-BALANCED shard routing (the load-aware sibling of
    multimodal_shard_pack's hash routing): samples sort by payload
    size descending and deal onto 16 shards in boustrophedon
    (snake) order — rank block k goes 0..15, block k+1 goes 15..0 —
    so every shard gets one sample from each size stratum and the
    largest payloads can't pile onto low shard ids. This is the
    deterministic, shuffle-friendly approximation of LPT bin packing
    (true LPT is inherently sequential: each placement depends on all
    previous loads); snake dealing bounds the max/min shard-byte
    ratio tightly at any corpus size without any sequential state.

    The global size rank is the two-pass range-partition scaffold
    (windows.global_rank on (-n_chars, doc_id)) — NO SinglePartition
    sort at any corpus size; the plan's only data-sized movement is
    the range exchange plus the 16-key rollup."""
    from basis_spark.operators.windows import global_rank

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", (-F.col("n_chars")).alias("neg_size")
    )
    ranked = global_rank(docs, "neg_size", "doc_id").select(
        "doc_id", "n_chars", (F.col("rank") - 1).alias("r")
    )
    block, pos = (F.col("r") / 16).cast("long"), F.col("r") % 16
    routed = ranked.select(
        "doc_id",
        "n_chars",
        F.when(block % 2 == 0, pos).otherwise(15 - pos).alias("shard_id"),
    )
    return routed.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_bytes"),
        F.min("doc_id").alias("min_doc"),
    )


@register(
    "similarity_mips_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe
               FROM embeddings WHERE vec_id % 500 = 0),
    d AS (SELECT vec_id, embedding FROM embeddings),
    dots AS (
      SELECT q.q_id, d.vec_id,
             round(list_sum(list_transform(range(1, 65),
                 i -> CAST(d.embedding[i] AS DOUBLE)
                    * CAST(q.qe[i] AS DOUBLE))), 6) AS ip
      FROM d, q WHERE d.vec_id <> q.q_id),
    ranked AS (
      SELECT q_id, vec_id, ip,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY ip DESC, vec_id) AS rnk
      FROM dots)
    SELECT q_id, vec_id, ip, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def similarity_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum inner-product search (MIPS) via the norm-augmentation
    reduction (Bachrach et al. 2014, the XBOX transform): raw inner
    product is NOT a metric (no triangle inequality, long vectors
    dominate), so cosine/L2 index structures can't serve it — until
    every data vector is padded with sqrt(M^2 - |x|^2) (M = corpus max
    norm, one broadcast scalar) and every query with 0. In the
    augmented space, L2-nearest EQUALS max-inner-product, so the whole
    ANN ladder (IVF, PQ, LSH) becomes MIPS-capable unchanged — this is
    how recommendation retrieval ships. The operator runs the
    transform, ranks in augmented L2, and emits raw-IP top-5 whose
    ORDER the plain inner-product oracle must reproduce exactly — the
    reduction's correctness is the thing under test.

    Shapes: max-norm is a 1-row combine broadcast into the padding
    expression; queries broadcast; scoring is map-side zip_with per
    (doc, query); per-query top-k via WindowGroupLimit. Rounded at 6dp
    before ranking on both engines, ties by vec_id."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ve"),
    )
    norm2 = F.expr("aggregate(ve, 0D, (a, x) -> a + x * x)")
    with_norm = emb.withColumn("n2", norm2)
    mx = with_norm.agg(F.max("n2").alias("m2"))
    docs = with_norm.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        F.expr(
            "concat(ve, array(sqrt(m2 - n2)))"
        ).alias("aug"),  # data vector padded to equal norm M
    )
    q = emb.filter(F.col("vec_id") % 500 == 0).select(
        F.col("vec_id").alias("q_id"),
        F.expr("concat(ve, array(0D))").alias("qaug"),
    )
    # In augmented space |d|=M for all docs, so argmin L2 == argmax IP;
    # the emitted score is the RAW inner product (qaug's pad is 0, so
    # the augmented dot IS the raw dot) — exactly what the oracle ranks.
    ip = F.round(
        F.expr(
            "aggregate(zip_with(aug, qaug, (x, y) -> x * y),"
            " 0D, (a, t) -> a + t)"
        ),
        6,
    )
    scored = docs.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("q_id")
    ).select("q_id", "vec_id", ip.alias("ip"))
    w = Window.partitionBy("q_id").orderBy(F.col("ip").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("q_id", "vec_id", "ip", "rnk")
    )


@register(
    "embeddings_mrl_recall",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe
               FROM embeddings WHERE vec_id % 400 = 0),
    full_d AS (
      SELECT q.q_id, e.vec_id,
             round(list_sum(list_transform(range(1, 65),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(q.qe[i] AS DOUBLE))), 6) AS s
      FROM embeddings e, q WHERE e.vec_id <> q.q_id),
    trunc_d AS (
      SELECT q.q_id, e.vec_id,
             round(list_sum(list_transform(range(1, 17),
                 i -> CAST(e.embedding[i] AS DOUBLE)
                    * CAST(q.qe[i] AS DOUBLE))), 6) AS s
      FROM embeddings e, q WHERE e.vec_id <> q.q_id),
    full_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY s DESC, vec_id) AS r
        FROM full_d) t WHERE r <= 10),
    trunc_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY s DESC, vec_id) AS r
        FROM trunc_d) t WHERE r <= 10)
    SELECT f.q_id,
           CAST(count(t.vec_id) AS BIGINT) AS n_overlap,
           round(count(t.vec_id) / 10.0, 2) AS recall_at_10
    FROM full_top f LEFT JOIN trunc_top t
      ON f.q_id = t.q_id AND f.vec_id = t.vec_id
    GROUP BY f.q_id
    """,
)
def embeddings_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation QUALITY eval: recall@10 of the 16-dim
    prefix ranking against the full 64-dim ranking, per query — the
    measurement that decides whether embeddings_truncate_mrl's 4x
    storage cut is safe for a given corpus (MRL-trained models hold
    recall; a non-MRL model collapses here, and THIS readout is how
    you find out before committing the index build). Both rankings
    are exact brute force at oracle scale; at 100 TB each side is the
    ANN ladder at its own dimension and this key becomes the
    acceptance test between them.

    Shapes: queries broadcast; both dot products are one map-side
    zip_with pass each (the 16-dim one over the slice); per-query
    top-10 via WindowGroupLimit; the overlap join is (q_id, vec_id)
    keyed on 10-row-per-query relations — trivially small at any
    corpus size."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ve"),
    )
    q = emb.filter(F.col("vec_id") % 400 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("ve").alias("qe")
    )
    j = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("q_id"))

    def topk(score_expr: str) -> DataFrame:
        s = F.round(F.expr(score_expr), 6)
        w = Window.partitionBy("q_id").orderBy(
            F.col("s").desc(), F.col("vec_id")
        )
        return (
            j.select("q_id", "vec_id", s.alias("s"))
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 10)
            .select("q_id", "vec_id")
        )

    full_top = topk(
        "aggregate(zip_with(ve, qe, (x, y) -> x * y), 0D, (a, t) -> a + t)"
    )
    trunc_top = topk(
        "aggregate(zip_with(slice(ve, 1, 16), slice(qe, 1, 16),"
        " (x, y) -> x * y), 0D, (a, t) -> a + t)"
    )
    t = trunc_top.select(
        F.col("q_id").alias("t_qid"), F.col("vec_id").alias("t_vid")
    )
    return (
        full_top.join(
            t,
            (F.col("q_id") == F.col("t_qid"))
            & (F.col("vec_id") == F.col("t_vid")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("t_vid").alias("n_overlap"),
            F.round(F.count("t_vid") / 10.0, 2).alias("recall_at_10"),
        )
    )


@register(
    "embeddings_pq_recall",
    oracle="""
    WITH sub AS (
      SELECT vec_id, s.range AS s,
             [CAST(embedding[s.range * 8 + j + 1] AS DOUBLE)
              for j in range(8)] AS v
      FROM embeddings, range(8) s),
    anchors AS (
      SELECT vec_id AS code, s, v AS av FROM sub WHERE vec_id < 16),
    d AS (
      SELECT sub.vec_id, sub.s, a.code,
             round(list_sum(list_transform(range(8),
                 j -> (sub.v[j + 1] - a.av[j + 1])
                    * (sub.v[j + 1] - a.av[j + 1]))), 6) AS d2
      FROM sub JOIN anchors a ON sub.s = a.s),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT vec_id, s, code,
               row_number() OVER (PARTITION BY vec_id, s
                                  ORDER BY d2, code) AS rnk
        FROM d) t WHERE rnk = 1),
    queries AS (SELECT vec_id AS q_id, s, v AS qv FROM sub
                WHERE vec_id % 400 = 0),
    lut AS (
      SELECT q.q_id, q.s, a.code,
             round(list_sum(list_transform(range(8),
                 j -> (q.qv[j + 1] - a.av[j + 1])
                    * (q.qv[j + 1] - a.av[j + 1]))), 6) AS d2
      FROM queries q JOIN anchors a ON q.s = a.s),
    adc AS (
      SELECT l.q_id, c.vec_id, round(sum(l.d2), 6) AS dist
      FROM codes c JOIN lut l ON c.s = l.s AND c.code = l.code
      WHERE c.vec_id <> l.q_id
      GROUP BY l.q_id, c.vec_id),
    exact AS (
      SELECT q.q_id, e.vec_id,
             round(sum(round(list_sum(list_transform(range(8),
                 j -> (e.v[j + 1] - q.qv[j + 1])
                    * (e.v[j + 1] - q.qv[j + 1]))), 6)), 6) AS dist
      FROM sub e JOIN queries q ON e.s = q.s
      WHERE e.vec_id <> q.q_id
      GROUP BY q.q_id, e.vec_id),
    adc_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY dist, vec_id) AS r FROM adc) t
      WHERE r <= 10),
    exact_top AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id, row_number() OVER (
            PARTITION BY q_id ORDER BY dist, vec_id) AS r FROM exact) t
      WHERE r <= 10)
    SELECT e.q_id,
           CAST(count(a.vec_id) AS BIGINT) AS n_overlap,
           round(count(a.vec_id) / 10.0, 2) AS recall_at_10
    FROM exact_top e LEFT JOIN adc_top a
      ON e.q_id = a.q_id AND e.vec_id = a.vec_id
    GROUP BY e.q_id
    """,
)
def embeddings_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ACCEPTANCE eval: recall@10 of asymmetric-distance (ADC)
    ranking against exact L2, per query — the companion of
    embeddings_mrl_recall one rung down the compression ladder, and
    the number that decides whether 8-byte PQ codes may serve as the
    first-stage ranker for this corpus. ADC is the real serving
    computation: the query builds a (subspace x anchor) distance
    LOOKUP TABLE (8x16 = 128 floats — broadcast), and a candidate's
    distance is just 8 table lookups summed, never a vector op per
    pair. Deterministic anchors keep the whole eval value-hash exact —
    and on THIS fixture (random embeddings, untrained first-16
    anchors) the readout correctly says recall ~0.1-0.2: don't serve —
    which is exactly the failure an acceptance gate exists to catch
    before the index build (learned k-means codebooks are the fix;
    the eval is codebook-agnostic).

    Shapes: codes come from the pq_quantize assignment (broadcast
    codebook, map-side argmin); the LUT join is (s, code)-keyed
    against a 128-row broadcast; both top-10s are WindowGroupLimit;
    the overlap join runs on 10-row-per-query relations."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("ve"),
    )
    sub = emb.select(
        "vec_id",
        F.explode(
            F.expr(
                "transform(sequence(0, 7), s ->"
                " struct(s AS s, slice(ve, s * 8 + 1, 8) AS v))"
            )
        ).alias("sv"),
    ).select("vec_id", F.col("sv.s").alias("s"), F.col("sv.v").alias("v"))
    anchors = sub.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("code"), "s", F.col("v").alias("av")
    )
    d2 = F.round(
        F.expr(
            "aggregate(zip_with(v, av, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
        ),
        6,
    )
    w_code = Window.partitionBy("vec_id", "s").orderBy("d2", "code")
    codes = (
        sub.join(F.broadcast(anchors), "s")
        .select("vec_id", "s", "code", d2.alias("d2"))
        .withColumn("rnk", F.row_number().over(w_code))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "s", "code")
    )
    queries = sub.filter(F.col("vec_id") % 400 == 0).select(
        F.col("vec_id").alias("q_id"), "s", F.col("v").alias("qv")
    )
    lut_d2 = F.round(
        F.expr(
            "aggregate(zip_with(qv, av, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
        ),
        6,
    )
    lut = queries.join(F.broadcast(anchors), "s").select(
        "q_id", "s", "code", lut_d2.alias("d2")
    )
    adc = (
        codes.join(F.broadcast(lut), ["s", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("d2"), 6).alias("dist"))
    )
    exact_d2 = F.round(
        F.expr(
            "aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)),"
            " CAST(0 AS DOUBLE), (acc, t) -> acc + t)"
        ),
        6,
    )
    exact = (
        sub.join(F.broadcast(queries), "s")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", exact_d2.alias("sd2"))
        .groupBy("q_id", "vec_id")
        .agg(F.round(F.sum("sd2"), 6).alias("dist"))
    )

    def topk(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("q_id").orderBy("dist", "vec_id")
        return (
            df.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= 10)
            .select("q_id", "vec_id")
        )

    a = topk(adc).select(
        F.col("q_id").alias("a_qid"), F.col("vec_id").alias("a_vid")
    )
    return (
        topk(exact)
        .join(
            a,
            (F.col("q_id") == F.col("a_qid"))
            & (F.col("vec_id") == F.col("a_vid")),
            "left",
        )
        .groupBy("q_id")
        .agg(
            F.count("a_vid").alias("n_overlap"),
            F.round(F.count("a_vid") / 10.0, 2).alias("recall_at_10"),
        )
    )


@register(
    "embeddings_signbit_sketch",
    oracle="""
    WITH ev AS (
      SELECT vec_id, g.i AS d, embedding[g.i]::DOUBLE AS x
      FROM embeddings, generate_series(1, 64) g(i)),
    pl AS (
      SELECT t.p, g.d,
             (CAST(('0x' || substring(md5('pl-' || CAST(t.p AS VARCHAR)
                  || '-' || CAST(g.d AS VARCHAR)), 1, 13)) AS BIGINT)
              + 0.5) / 4503599627370496.0 - 0.5 AS w
      FROM generate_series(0, 15) t(p), generate_series(1, 64) g(d)),
    dot AS (
      SELECT vec_id, p, sum(w * x) AS s
      FROM ev JOIN pl USING (d) GROUP BY 1, 2),
    bits AS (
      SELECT vec_id, p, CASE WHEN s >= 0 THEN 1 ELSE 0 END AS b FROM dot)
    SELECT vec_id,
           CAST(sum(b * (CAST(1 AS BIGINT) << p)) AS BIGINT) AS signature,
           CAST(sum(b) AS BIGINT) AS n_positive_bits
    FROM bits GROUP BY vec_id
    """,
)
def embeddings_signbit_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit sign-projection signature per embedding — the SimHash-
    for-vectors sketch (Charikar 2002): bit p is the sign of the dot
    product with hyperplane p, and Hamming distance between signatures
    estimates angular distance. Unlike similarity_topk_lsh's
    xxhash64-seeded planes (rows-only tier), the plane weights here are
    md5-DERIVED uniforms (the corpus_span_corruption convention), which
    both engines can compute bit-identically — so this sketch, the
    building block LSH banding consumes, carries a STRICT oracle.

    Pure map-side work in Spark: one transform/aggregate per row; no
    shuffle, no UDF. At 100 TB this is scan-transform-write; the sketch
    column then feeds embeddings_binary_hamming_topk-style probes.

    r11 (guide §1.2): the plane weights were md5+conv sub-expressions
    inside the transform lambda — higher-order functions are not
    constant-folded, so 16x64 md5 calls ran per ROW (3.6 s at sf0.1 for
    2,000 rows, PERF_RANK). Fold the matrix in Python (hashlib md5 ==
    Spark md5; 52-bit ints exact in doubles; identical op order:
    (v + 0.5) / 2^52 - 0.5) and ship it as an array literal. The fold
    over d (acc + w*x in ascending d) is unchanged, so outputs are
    bit-identical."""
    import hashlib

    w = [
        [
            (int(hashlib.md5(f"pl-{p}-{d}".encode()).hexdigest()[:13], 16) + 0.5)
            / 4503599627370496.0
            - 0.5
            for d in range(1, 65)
        ]
        for p in range(16)
    ]
    bits = F.transform(
        F.lit(w),
        lambda row: F.when(
            F.aggregate(
                F.zip_with(row, F.col("embedding"), lambda y, x: y * x.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            >= 0,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    emb = load(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", bits.alias("bits"))
    return b.select(
        "vec_id",
        F.expr(
            "aggregate(sequence(0, 15), CAST(0 AS BIGINT),"
            " (acc, p) -> acc + CAST(bits[p] AS BIGINT)"
            " * shiftleft(CAST(1 AS BIGINT), p))"
        ).alias("signature"),
        F.expr(
            "aggregate(bits, CAST(0 AS BIGINT),"
            " (acc, x) -> acc + CAST(x AS BIGINT))"
        ).alias("n_positive_bits"),
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 3),
    grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM tok),
    first_seen AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
    SELECT grams.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(count(*) FILTER (WHERE first_seen.first_doc = grams.doc_id)
                AS BIGINT) AS n_novel,
           round(CAST(count(*) FILTER (WHERE first_seen.first_doc = grams.doc_id)
                      AS DOUBLE) / count(*), 6) AS novelty_rate
    FROM grams JOIN first_seen ON grams.g = first_seen.g
    GROUP BY grams.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty in doc_id (ingestion) order: the
    share of a document's distinct trigrams never seen in any EARLIER
    document — the running-freshness curve a crawl monitors to decide
    when a source is exhausted (novelty decaying to ~0 means you are
    re-crawling boilerplate). first-occurrence attribution via one
    gram-keyed min() agg joined back — no cumulative distinct state,
    no window over the corpus; the trigram explode is map-side and the
    two shuffles are both keyed on the gram hash."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.filter(
        F.col("text").isNotNull() & (F.size(F.split("text", " ")) >= 3)
    ).select("doc_id", F.split("text", " ").alias("t"))
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
            )
        ).alias("g"),
    ).distinct()
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
    return (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            F.round(novel.cast("double") / F.count(F.lit(1)), 6).alias(
                "novelty_rate"
            ),
        )
    )


@register(
    "embeddings_centroid_shift",
    oracle="""
    WITH ev AS (
      SELECT vec_id, label, g.i, embedding[g.i]::DOUBLE AS x
      FROM embeddings, generate_series(1, 64) g(i)),
    lc AS (SELECT label, i, avg(x) AS c FROM ev GROUP BY 1, 2),
    gc AS (SELECT i, avg(x) AS g FROM ev GROUP BY 1),
    n AS (SELECT label, count(DISTINCT vec_id) AS n_vecs FROM ev GROUP BY 1)
    SELECT lc.label, CAST(max(n.n_vecs) AS BIGINT) AS n_vecs,
           round(sqrt(sum((lc.c - gc.g) * (lc.c - gc.g))), 6) AS l2_shift,
           round(sum(lc.c * gc.g)
                 / (sqrt(sum(lc.c * lc.c)) * sqrt(sum(gc.g * gc.g))), 6)
               AS cos_to_global
    FROM lc JOIN gc USING (i) JOIN n ON n.label = lc.label
    GROUP BY lc.label
    """,
)
def embeddings_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift from the global centroid (L2 shift +
    cosine): the embedding-space segmentation diagnostic — labels whose
    centroid barely shifts from global carry no cluster signal, and a
    sudden shift after a model/data change is the embedding version of
    feature drift. Two dim-keyed hash aggs (label x dim and dim) joined
    on the 64-row dim key, then a label-sized combine — the vectors
    themselves shuffle once into the posexplode agg and never pairwise."""
    emb = load(spark, sf_dir, "embeddings")
    ev = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "xr")
    ).select("vec_id", "label", "i", F.col("xr").cast("double").alias("x"))
    lc = ev.groupBy("label", "i").agg(F.avg("x").alias("c"))
    gc = ev.groupBy("i").agg(F.avg("x").alias("g"))
    n = ev.groupBy("label").agg(F.countDistinct("vec_id").alias("n_vecs"))
    j = lc.join(F.broadcast(gc), "i").join(F.broadcast(n), "label")
    return j.groupBy("label").agg(
        F.max("n_vecs").cast("long").alias("n_vecs"),
        F.round(
            F.sqrt(F.sum((F.col("c") - F.col("g")) * (F.col("c") - F.col("g")))), 6
        ).alias("l2_shift"),
        F.round(
            F.sum(F.col("c") * F.col("g"))
            / (
                F.sqrt(F.sum(F.col("c") * F.col("c")))
                * F.sqrt(F.sum(F.col("g") * F.col("g")))
            ),
            6,
        ).alias("cos_to_global"),
    )


@register(
    "embeddings_isotropy_score",
    oracle="""
    WITH nrm AS MATERIALIZED (
        SELECT vec_id, label,
               sqrt(list_reduce(list_transform(embedding,
                    v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)),
                    (a, b) -> a + b)) AS nr
        FROM embeddings),
    dims AS MATERIALIZED (
        SELECT e.label, t.d,
               sum(CAST(e.embedding[t.d] AS DOUBLE) / n.nr) AS s
        FROM embeddings e JOIN nrm n ON n.vec_id = e.vec_id,
             range(1, 65) t(d)
        GROUP BY e.label, t.d),
    cnt AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    per_label AS (
        SELECT d.label, max(c.n) AS n, sum(d.s * d.s) AS ss
        FROM dims d JOIN cnt c ON c.label = d.label GROUP BY d.label),
    overall AS (
        SELECT -1 AS label, c.n AS n, sum(ts * ts) AS ss
        FROM (SELECT d AS dd, sum(s) AS ts FROM dims GROUP BY d) t,
             (SELECT sum(n) AS n FROM cnt) c
        GROUP BY c.n)
    SELECT CAST(label AS INT) AS label, CAST(n AS BIGINT) AS n_vecs,
           round((ss - n) / (n * (n - 1.0)), 6) + 0.0 AS mean_pairwise_cos
    FROM (SELECT label, n, ss FROM per_label
          UNION ALL SELECT label, n, ss FROM overall) u
    """,
)
def embeddings_isotropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy audit of the embedding space: mean pairwise cosine
    between all distinct vectors, per label and corpus-wide (label -1).
    Anisotropic spaces (mean cosine far above 0) are the classic
    contextual-embedding pathology — cosine similarity stops
    discriminating when every pair is already similar — so this is the
    go/no-go check before cosine-based dedup/ANN thresholds are trusted.

    The naive form is an O(n^2) pairwise join; this uses the sum-vector
    identity instead: for unit vectors u_i,
    sum_{i != j} cos(u_i, u_j) = ||sum_i u_i||^2 - n, so mean pairwise
    cosine = (||S||^2 - n) / (n(n-1)) with S the per-dim sum. ONE
    posexplode pass -> (label, dim)-keyed hash agg (640 rows) -> a
    label-sized combine, and the corpus-wide row reuses the SAME
    per-label partials (sum over labels), so 100 TB of vectors never
    materialize a single pair. The norm divides through as a per-row
    map-side expression; float32 is cast to double before any
    arithmetic (same dtype discipline as embeddings_pca_power's
    Gramian). The +0.0 canonicalizes IEEE -0.0 from 6dp rounding of
    near-zero means on either engine."""
    emb = load(spark, sf_dir, "embeddings")
    nr = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    ev = (
        emb.select("label", nr.alias("nr"), F.posexplode("embedding").alias("d", "xr"))
        .select("label", "d", (F.col("xr").cast("double") / F.col("nr")).alias("u"))
    )
    dims = ev.groupBy("label", "d").agg(F.sum("u").alias("s"))
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    per_label = (
        dims.join(F.broadcast(cnt), "label")
        .groupBy("label")
        .agg(F.max("n").alias("n"), F.sum(F.col("s") * F.col("s")).alias("ss"))
    )
    tot = dims.groupBy("d").agg(F.sum("s").alias("ts"))
    overall = tot.agg(F.sum(F.col("ts") * F.col("ts")).alias("ss")).crossJoin(
        F.broadcast(cnt.agg(F.sum("n").alias("n")))
    ).select(F.lit(-1).alias("label"), "n", "ss")
    u = per_label.select("label", "n", "ss").unionByName(overall)
    return u.select(
        F.col("label").cast("int").alias("label"),
        F.col("n").cast("long").alias("n_vecs"),
        (
            F.round((F.col("ss") - F.col("n")) / (F.col("n") * (F.col("n") - 1.0)), 6)
            + F.lit(0.0)
        ).alias("mean_pairwise_cos"),
    )


_BM25_TERMS = ("table", "merge", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "text_bm25_score",
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    dl AS MATERIALIZED (
        SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS MATERIALIZED (
        SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS MATERIALIZED (
        SELECT doc_id, token, count(*) AS tf FROM tok
        WHERE token IN {_BM25_TERMS!r} GROUP BY doc_id, token),
    idf AS MATERIALIZED (
        SELECT token, count(*) AS df FROM tf GROUP BY token)
    SELECT tf.doc_id,
           round(sum(
               ln((s.n - i.df + 0.5) / (i.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1}
                  * (1.0 - {_BM25_B} + {_BM25_B} * d.dl / s.avgdl))
           ), 6) AS bm25
    FROM tf JOIN dl d ON d.doc_id = tf.doc_id
            JOIN idf i ON i.token = tf.token, stats s
    GROUP BY tf.doc_id
    """,
)
def text_bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query
    ('table merge window') — THE classical sparse-retrieval scorer
    (k1=1.2, b=0.75, the Lucene defaults; idf in the +1 form so
    rare-term scores stay positive). Pairs with similarity_topk
    (dense) and similarity_rank_fusion_rrf (hybrid) to complete the
    RAG retrieval stack's sparse leg.

    Self-contained corpus statistics (df, N, avgdl) — no external
    index: one token explode feeds (a) per-doc length, (b) per-(doc,
    term) tf AFTER pushing the term filter into the explode (the scan
    keeps only query-term hits, so the shuffled tf relation is
    query-sized, not corpus-sized), (c) term df — and the 3-term idf
    table plus the 1-row (N, avgdl) broadcast back into a doc-keyed
    sum. At 100 TB the only corpus-sized exchange is the per-doc
    length agg; everything term-side is bounded by |query| x |docs
    containing a term|."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        F.log(
            (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        )
        * F.col("tf")
        * (_BM25_K1 + 1.0)
        / (
            F.col("tf")
            + _BM25_K1
            * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(idf), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("bm25"))
    )


_INCR_MOD = 7  # doc_id % 7 == 0 is the incoming batch (~14% of the corpus)


@register(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
        SELECT j, i FROM (
            SELECT b.doc_id AS j, a.doc_id AS i,
                   round(CAST(len(list_intersect(string_split(a.text, ' '),
                                                 string_split(b.text, ' '))) AS DOUBLE)
                         / len(list_distinct(string_split(a.text, ' ')
                                             || string_split(b.text, ' '))), 4) AS jac
            FROM documents a JOIN documents b
              ON a.lang = b.lang
             AND b.doc_id % {_INCR_MOD} = 0
             AND a.doc_id <> b.doc_id
             AND (a.doc_id % {_INCR_MOD} <> 0 OR a.doc_id < b.doc_id)) t
        WHERE jac > 0.9)
    SELECT d.doc_id,
           CAST(count(p.i) AS BIGINT) AS n_dups,
           min(p.i) AS first_dup,
           CASE WHEN count(p.i) > 0 THEN 'drop' ELSE 'keep' END AS verdict
    FROM documents d LEFT JOIN pairs p ON p.j = d.doc_id
    WHERE d.doc_id % {_INCR_MOD} = 0
    GROUP BY d.doc_id
    """,
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-dup admission: a new batch of documents
    (doc_id % 7 == 0) is checked against the existing corpus AND
    against earlier docs in the same batch, and each incoming doc gets
    a keep/drop verdict with its duplicate count and first duplicate —
    the production shape of MinHash dedup, where yesterday's 100 TB is
    already deduped and only today's arrivals need banding.

    The probe is ASYMMETRIC: only the batch's band keys drive the
    join, probing the full corpus's banded index (the persisted
    _minhash_bands table — in production, the saved index from the
    last run). Work scales with |batch| x bucket occupancy, never with
    |corpus|^2, and base-vs-base pairs are never generated — the
    defining cost difference vs re-running dedup_near_minhash on the
    union. Same geometry (K=256, B=32), same >=2-band rule, same
    size-ratio prefilter, same exact-Jaccard re-rank, so the verdicts
    equal the brute-force oracle exactly; recall analysis is
    dedup_near_minhash's (P[miss a 0.9-pair] ~ 4e-7)."""
    t, bands = _minhash_bands(spark, sf_dir)
    probe = bands.filter(F.col("doc_id") % _INCR_MOD == 0)
    a, b = bands.alias("a"), probe.alias("b")
    size_ok = (F.col("b.n") * 10 >= F.col("a.n") * 9) & (
        F.col("a.n") * 10 >= F.col("b.n") * 9
    )
    side_ok = (F.col("a.doc_id") % _INCR_MOD != 0) | (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    cand = (
        a.join(b, ["lang", "key"])
        .filter((F.col("a.doc_id") != F.col("b.doc_id")) & side_ok & size_ok)
        .groupBy(F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= 2)
        .select("i", "j")
    )
    # bitset=False: same sparse-candidate/open-vocabulary call shape as
    # _exact_neardup_pairs (see exact_jaccard_rerank).
    pairs = exact_jaccard_rerank(cand, t, threshold=0.9, bitset=False)
    batch = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _INCR_MOD == 0)
        .select("doc_id")
    )
    agg = pairs.groupBy("j").agg(
        F.count(F.lit(1)).alias("nd"), F.min("i").alias("first_dup")
    )
    return batch.join(agg, batch["doc_id"] == agg["j"], "left").select(
        "doc_id",
        F.coalesce("nd", F.lit(0)).cast("long").alias("n_dups"),
        "first_dup",
        F.when(F.col("nd").isNotNull(), F.lit("drop"))
        .otherwise(F.lit("keep"))
        .alias("verdict"),
    )


_RRF_K = 60
_HYBRID_TOP = 15
_HYBRID_DEPTH = 200  # per-leg candidate-list truncation (the contract)


@register(
    "similarity_hybrid_bm25_cosine",
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents),
    dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS MATERIALIZED (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
    tf AS MATERIALIZED (
        SELECT doc_id, token, count(*) AS tf FROM tok
        WHERE token IN {_BM25_TERMS!r} GROUP BY doc_id, token),
    idf AS MATERIALIZED (SELECT token, count(*) AS df FROM tf GROUP BY token),
    bm25 AS MATERIALIZED (
        SELECT tf.doc_id,
               round(sum(ln((s.n - i.df + 0.5) / (i.df + 0.5) + 1.0)
                         * tf.tf * ({_BM25_K1} + 1.0)
                         / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                            + {_BM25_B} * d.dl / s.avgdl))), 6) AS score
        FROM tf JOIN dl d ON d.doc_id = tf.doc_id
                JOIN idf i ON i.token = tf.token, stats s
        GROUP BY tf.doc_id),
    cent AS MATERIALIZED (
        SELECT t.d, avg(CAST(embedding[t.d] AS DOUBLE)) AS c
        FROM embeddings, range(1, 65) t(d) WHERE label = 0 GROUP BY t.d),
    cnorm AS MATERIALIZED (SELECT sqrt(sum(c * c)) AS nc FROM cent),
    dense AS MATERIALIZED (
        SELECT e.vec_id AS doc_id,
               round(sum(CAST(e.embedding[t.d] AS DOUBLE) * c.c)
                     / (sqrt(sum(CAST(e.embedding[t.d] AS DOUBLE)
                                 * CAST(e.embedding[t.d] AS DOUBLE))) * n.nc),
                     6) AS score
        FROM embeddings e, range(1, 65) t(d)
        JOIN cent c ON c.d = t.d, cnorm n
        GROUP BY e.vec_id, n.nc),
    br AS MATERIALIZED (
        SELECT doc_id, r FROM (
            SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
            FROM bm25) t WHERE r <= {_HYBRID_DEPTH}),
    dr AS MATERIALIZED (
        SELECT doc_id, r FROM (
            SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
            FROM dense) t WHERE r <= {_HYBRID_DEPTH}),
    fused AS MATERIALIZED (
        SELECT coalesce(br.doc_id, dr.doc_id) AS doc_id,
               round(coalesce(1.0 / ({_RRF_K} + br.r), 0)
                     + coalesce(1.0 / ({_RRF_K} + dr.r), 0), 9) AS rrf,
               br.r AS sparse_rank, dr.r AS dense_rank
        FROM br FULL OUTER JOIN dr ON br.doc_id = dr.doc_id)
    SELECT doc_id, rrf, sparse_rank, dense_rank
    FROM fused ORDER BY rrf DESC, doc_id LIMIT {_HYBRID_TOP}
    """,
)
def similarity_hybrid_bm25_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval end-to-end: BM25 (sparse leg, text_bm25_score's
    exact plan reused) and cosine-to-query (dense leg; query = the
    label-0 centroid, built with the posexplode-avg shape of
    similarity_centroid_classify) fused by Reciprocal Rank Fusion with
    k=60 — the standard production pattern (complementary failure
    modes: BM25 misses paraphrase, dense misses rare exact terms; RRF
    needs no score calibration because it consumes only RANKS).

    Both legs round scores at 6dp BEFORE ranking with a doc_id
    tie-break, so the rank lists are engine-identical by construction;
    the fused score is then exact rational arithmetic over integer
    ranks. Each leg TRUNCATES to a 200-deep candidate list before
    fusion — the declared contract and the production shape (rank
    depth is retrieval-list-sized, so each leg is a TakeOrdered top-N
    followed by a 200-row local rank, never a corpus-wide sort); a doc
    outside a leg's top 200 contributes 0 from that leg, exactly as a
    real candidate-list fusion behaves. Each leg's scoring is the
    already-audited plan (query-sized tf relation; one vector pass
    against a broadcast centroid); fusion adds one candidate-keyed
    outer join and a top-15 TakeOrderedAndProject."""
    sparse = text_bm25_score(spark, sf_dir).select(
        "doc_id", F.col("bm25").alias("score")
    )
    emb = load(spark, sf_dir, "embeddings")
    dims = emb.filter(F.col("label") == 0).select(
        F.posexplode("embedding").alias("d", "x")
    )
    cent = dims.groupBy("d").agg(F.avg(F.col("x").cast("double")).alias("c"))
    cent_arr = cent.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))), lambda s: s["c"]
        ).alias("cvec")
    )
    dot = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda v: v.cast("double")),
            "cvec",
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    enorm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    )
    cnorm = F.sqrt(
        F.aggregate(F.col("cvec"), F.lit(0.0), lambda a, b: a + b * b)
    )
    dense = emb.crossJoin(F.broadcast(cent_arr)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(dot / (enorm * cnorm), 6).alias("score"),
    )
    def leg_ranks(scored: DataFrame) -> DataFrame:
        # TakeOrdered top-N first (no corpus-wide sort), then rank the
        # N-row candidate list locally — N is the declared depth.
        top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(_HYBRID_DEPTH)
        return top.select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .alias("r"),
        )

    br = leg_ranks(sparse)
    dr = leg_ranks(dense)
    fused = (
        br.withColumnRenamed("r", "sparse_rank")
        .join(dr.withColumnRenamed("r", "dense_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (_RRF_K + F.col("sparse_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("dense_rank")), F.lit(0.0)),
                9,
            ).alias("rrf"),
            "sparse_rank",
            "dense_rank",
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(_HYBRID_TOP)


@register(
    "text_readability_flesch",
    oracle="""
    WITH f AS MATERIALIZED (
        SELECT doc_id,
               len(string_split(text, ' ')) AS words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS sentences,
               greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                   AS syllables
        FROM documents)
    SELECT doc_id,
           CAST(words AS BIGINT) AS words,
           CAST(sentences AS BIGINT) AS sentences,
           CAST(syllables AS BIGINT) AS syllables,
           round(206.835 - 1.015 * (words * 1.0 / sentences)
                 - 84.6 * (syllables * 1.0 / words), 6) AS flesch,
           CASE WHEN 206.835 - 1.015 * (words * 1.0 / sentences)
                     - 84.6 * (syllables * 1.0 / words) >= 60 THEN 'easy'
                WHEN 206.835 - 1.015 * (words * 1.0 / sentences)
                     - 84.6 * (syllables * 1.0 / words) >= 30 THEN 'standard'
                ELSE 'difficult' END AS band
    FROM f
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document — the named readability score
    quality filters bolt on next to the heuristic text_quality_score
    (Gopher-style pipelines keep a prose-complexity signal; Flesch is
    the interpretable classic). Syllables are the standard regex proxy
    (vowel groups, y included); sentences count terminal-punctuation
    runs with a floor of 1 so the fixture's unpunctuated docs degrade
    deterministically rather than dividing by zero (their scores go
    deeply negative = 'hard' — correct for run-on token soup, and
    bit-identical on both engines; the same floor guards empty-vowel
    zh docs).

    Three regexp counts per row, map-side only — scan-transform-write
    at any scale, the cheapest class of text operator."""
    docs = load(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    sentences = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    syllables = F.greatest(
        F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")),
        F.lit(1),
    )
    f = docs.select(
        "doc_id",
        words.alias("words"),
        sentences.alias("sentences"),
        syllables.alias("syllables"),
    )
    score = (
        206.835
        - 1.015 * (F.col("words") / F.col("sentences"))
        - 84.6 * (F.col("syllables") / F.col("words"))
    )
    return f.select(
        "doc_id",
        F.col("words").cast("long"),
        F.col("sentences").cast("long"),
        F.col("syllables").cast("long"),
        F.round(score, 6).alias("flesch"),
        F.when(score >= 60, "easy")
        .when(score >= 30, "standard")
        .otherwise("difficult")
        .alias("band"),
    )


_GOPHER_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is"]
_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS = 20, 90
_GOPHER_MWL_LO, _GOPHER_MWL_HI = 3.8, 5.1
_GOPHER_MIN_STOP_HITS = 1
_GOPHER_MIN_TTR = 0.3


@register(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS mean_word_len,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> list_contains({_GOPHER_STOPWORDS!r}, t))) AS BIGINT)
                 AS stop_hits,
             round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS ttr
      FROM documents)
    SELECT doc_id, n_words, mean_word_len, stop_hits, ttr,
           (n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
               AS pass_len,
           (mean_word_len >= {_GOPHER_MWL_LO}
            AND mean_word_len <= {_GOPHER_MWL_HI}) AS pass_mwl,
           (stop_hits >= {_GOPHER_MIN_STOP_HITS}) AS pass_stop,
           (ttr >= {_GOPHER_MIN_TTR}) AS pass_ttr,
           ((n_words BETWEEN {_GOPHER_MIN_WORDS} AND {_GOPHER_MAX_WORDS})
            AND mean_word_len >= {_GOPHER_MWL_LO}
            AND mean_word_len <= {_GOPHER_MWL_HI}
            AND stop_hits >= {_GOPHER_MIN_STOP_HITS}
            AND ttr >= {_GOPHER_MIN_TTR}) AS keep
    FROM s
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter (the public Gopher /
    MassiveText recipe: hard per-rule thresholds, not a learned score)
    adapted to the fixture's vocabulary: word-count bounds, mean word
    length bounds, a minimum stopword-hit count, and a minimum
    type-token ratio — each emitted as its own pass_* flag so a
    curation run can report per-rule rejection mass, plus the combined
    keep decision. Differs from text_quality_score (which emits raw
    ratios) by being the DECISION operator: flags + keep.

    Scale: pure map-side column expressions over one scan — no
    shuffle, no UDF; at 100 TB this is a single filter pass whose
    selectivity report is a later groupBy over booleans. mean_word_len
    is computed as chars-sans-spaces / n_words so both engines divide
    the same two integers (no per-word float averaging order)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    s = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(toks),
            6,
        ).alias("mean_word_len"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
        .cast("long")
        .alias("stop_hits"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6).alias(
            "ttr"
        ),
    )
    pass_len = F.col("n_words").between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)
    pass_mwl = (F.col("mean_word_len") >= _GOPHER_MWL_LO) & (
        F.col("mean_word_len") <= _GOPHER_MWL_HI
    )
    pass_stop = F.col("stop_hits") >= _GOPHER_MIN_STOP_HITS
    pass_ttr = F.col("ttr") >= _GOPHER_MIN_TTR
    return s.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_hits",
        "ttr",
        pass_len.alias("pass_len"),
        pass_mwl.alias("pass_mwl"),
        pass_stop.alias("pass_stop"),
        pass_ttr.alias("pass_ttr"),
        (pass_len & pass_mwl & pass_stop & pass_ttr).alias("keep"),
    )


@register(
    "embeddings_centroid_drift",
    oracle="""
    WITH x AS (
      SELECT label, vec_id % 2 AS half, u.pos AS pos,
             CAST(embedding[u.pos] AS DOUBLE) AS val
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(pos)),
    c AS (SELECT label, half, pos, avg(val) AS m
          FROM x GROUP BY 1, 2, 3),
    n AS (SELECT label, vec_id % 2 AS half, count(*) AS n
          FROM embeddings GROUP BY 1, 2),
    j AS (
      SELECT a.label, a.pos, a.m AS ma, b.m AS mb
      FROM c a JOIN c b ON a.label = b.label AND a.pos = b.pos
      WHERE a.half = 0 AND b.half = 1),
    s AS (
      SELECT label, sum(ma * mb) AS dot,
             sqrt(sum(ma * ma)) AS na, sqrt(sum(mb * mb)) AS nb,
             sqrt(sum((ma - mb) * (ma - mb))) AS l2
      FROM j GROUP BY 1)
    SELECT s.label,
           CAST(n0.n AS BIGINT) AS n_a, CAST(n1.n AS BIGINT) AS n_b,
           round(s.dot / (s.na * s.nb), 6) AS centroid_cos,
           round(s.l2, 6) AS centroid_l2
    FROM s JOIN n n0 ON n0.label = s.label AND n0.half = 0
           JOIN n n1 ON n1.label = s.label AND n1.half = 1
    """,
)
def embeddings_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-version drift monitor: split the corpus into two
    batches (vec_id parity standing in for old-model vs new-model
    vectors), compute each label's per-batch centroid, and report the
    cosine and L2 gap between the two centroids — the cheap check a
    serving pipeline runs before swapping in a re-embedded corpus
    (a label whose centroid moved is a label whose ANN index and
    thresholds are stale).

    Scale: ONE posexplode feeds a (label, half, dim)-keyed avg — the
    map-side-combinable shape, shuffling labels x 2 x d rows
    regardless of corpus size; centroid joins and the final cos/L2
    fold run on that metadata-sized table. No vector ever crosses the
    wire un-aggregated."""
    emb = load(spark, sf_dir, "embeddings")
    x = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("pos", "v"),
    ).select("label", "half", "pos", F.col("v").cast("double").alias("val"))
    c = x.groupBy("label", "half", "pos").agg(F.avg("val").alias("m"))
    n = emb.groupBy("label", (F.col("vec_id") % 2).alias("half")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a = c.filter(F.col("half") == 0).select("label", "pos", F.col("m").alias("ma"))
    b = c.filter(F.col("half") == 1).select(
        F.col("label").alias("label_b"), F.col("pos").alias("pos_b"), F.col("m").alias("mb")
    )
    j = a.join(b, (a["label"] == b["label_b"]) & (a["pos"] == b["pos_b"]))
    s = j.groupBy("label").agg(
        F.sum(F.col("ma") * F.col("mb")).alias("dot"),
        F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("na"),
        F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("nb"),
        F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))).alias("l2"),
    )
    n0 = n.filter(F.col("half") == 0).select(
        F.col("label").alias("l0"), F.col("n").alias("n_a")
    )
    n1 = n.filter(F.col("half") == 1).select(
        F.col("label").alias("l1"), F.col("n").alias("n_b")
    )
    return (
        s.join(F.broadcast(n0), s["label"] == n0["l0"])
        .join(F.broadcast(n1), s["label"] == n1["l1"])
        .select(
            "label",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("centroid_cos"),
            F.round("l2", 6).alias("centroid_l2"),
        )
    )


@register(
    "text_bigram_perplexity",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
    bi AS (
      SELECT doc_id, lang,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])) AS bg,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i])) AS w1
      FROM d),
    bc AS (SELECT lang, bg, count(*) AS cb FROM bi GROUP BY 1, 2),
    uc AS (SELECT lang, w1, count(*) AS cu FROM bi GROUP BY 1, 2),
    v  AS (SELECT lang, count(DISTINCT w1) AS vocab FROM bi GROUP BY 1)
    SELECT bi.doc_id, bi.lang,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(exp(-avg(ln((bc.cb + 1.0) / (uc.cu + v.vocab)))), 6)
               AS ppl_bigram
    FROM bi JOIN bc ON bc.lang = bi.lang AND bc.bg = bi.bg
            JOIN uc ON uc.lang = bi.lang AND uc.w1 = bi.w1
            JOIN v  ON v.lang = bi.lang
    GROUP BY 1, 2
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BIGRAM perplexity under the corpus's own
    per-language bigram LM with add-1 smoothing — one Markov order up
    from text_perplexity_bucket's unigram model, which is blind to
    word-order scrambling (a shuffled document keeps its unigram ppl
    but its bigram ppl explodes; that gap is a standard
    machine-generated-text and boilerplate signal).
    p(w2|w1) = (c(w1 w2)+1) / (c(w1·)+V); ppl = exp(-mean log p) over
    the document's bigrams.

    Scale: ONE bigram explode feeds the (lang, bigram) and
    (lang, w1) count aggregates (map-side combinable); both count
    tables are vocabulary-sized, joined back onto the bigram stream,
    then one doc_id shuffle for the per-doc mean. Same
    aggregate-join-reduce shape as the unigram key — nothing
    data-sized is broadcast or collected."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    bi = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> struct(concat(element_at(toks, i), ' ', element_at(toks, i + 1)) AS bg,"
                "             element_at(toks, i) AS w1))"
            )
        ).alias("p"),
    ).select("doc_id", "lang", F.col("p.bg").alias("bg"), F.col("p.w1").alias("w1"))
    bc = bi.groupBy("lang", "bg").agg(F.count(F.lit(1)).alias("cb"))
    uc = (
        bi.groupBy("lang", "w1")
        .agg(F.count(F.lit(1)).alias("cu"))
        .withColumnRenamed("lang", "lang_u")
        .withColumnRenamed("w1", "w1_u")
    )
    v = (
        bi.groupBy("lang")
        .agg(F.countDistinct("w1").alias("vocab"))
        .withColumnRenamed("lang", "lang_v")
    )
    return (
        bi.join(bc, ["lang", "bg"])
        .join(uc, (F.col("lang") == F.col("lang_u")) & (F.col("w1") == F.col("w1_u")))
        .join(F.broadcast(v), F.col("lang") == F.col("lang_v"))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.exp(-F.avg(F.log((F.col("cb") + 1.0) / (F.col("cu") + F.col("vocab"))))),
                6,
            ).alias("ppl_bigram"),
        )
    )


_TUNE_SAMPLE_MAX_ID = 100     # bounded calibration sample (tune on a
                              # labeled sample, never the corpus)
_TUNE_TRUE_JAC = 0.5
_TUNE_GRID = [(64, 4), (32, 8), (16, 16), (8, 32)]  # b x r, K = 256


def _band_tuning_oracle() -> str:
    configs = ", ".join(f"({b}, {r})" for b, r in _TUNE_GRID)
    return f"""
    WITH s AS (
      SELECT doc_id, lang,
             list_distinct([substring(text, i, 3)
                            for i in range(1, length(text) - 1)]) AS sh
      FROM documents
      WHERE doc_id < {_TUNE_SAMPLE_MAX_ID} AND length(text) >= 3),
    pairs AS (
      SELECT round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(a.sh || b.sh)), 6) AS jac
      FROM s a JOIN s b ON a.doc_id < b.doc_id AND a.lang = b.lang),
    g AS (SELECT * FROM (VALUES {configs}) t(b, r))
    SELECT CAST(g.b AS INT) AS n_bands, CAST(g.r AS INT) AS rows_per_band,
           CAST(sum(CASE WHEN p.jac >= {_TUNE_TRUE_JAC} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true_pairs,
           round(avg(CASE WHEN p.jac >= {_TUNE_TRUE_JAC}
                 THEN 1.0 - pow(1.0 - pow(p.jac, g.r), g.b) END), 6)
               AS expected_recall,
           round(avg(CASE WHEN p.jac < {_TUNE_TRUE_JAC}
                 THEN 1.0 - pow(1.0 - pow(p.jac, g.r), g.b) END), 6)
               AS expected_fp_rate
    FROM pairs p CROSS JOIN g
    GROUP BY g.b, g.r
    """


@register("dedup_minhash_band_tuning", oracle=_band_tuning_oracle())
def dedup_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding design table — the meta-operator behind every
    banded dedup key in this repo: for each (bands b, rows r) split of
    a K=256 signature, the expected LSH candidate recall over the
    TRUE near-dup pairs of a bounded calibration sample
    (P[candidate] = 1-(1-J^r)^b per pair, the standard S-curve) and
    the expected false-candidate rate over the non-dup pairs. This is
    how b x r gets chosen BEFORE burning a 100 TB pass with the wrong
    geometry: steep-enough S-curve at the target threshold, acceptable
    FP mass below it.

    Scale contract: the quadratic exact-Jaccard join runs ONLY on the
    declared calibration sample (doc_id < {100}, lang-blocked) — the
    same "label a sample, tune, then deploy banded" workflow the
    docstrings of dedup_near_minhash/dedup_ngram_jaccard assume. The
    grid fold is |sample pairs| x 4 map-side arithmetic into a 4-row
    agg."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < _TUNE_SAMPLE_MAX_ID) & (F.length("text") >= 3))
        .select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("sh"),
        )
        # Lazy checkpoint: both pair sides re-ran the scan+shingle
        # subtree otherwise (bounded sample rows).
        .localCheckpoint(eager=False)
    )
    a = docs.select(
        F.col("doc_id").alias("i"), F.col("lang").alias("lang_a"), F.col("sh").alias("sa")
    )
    b_ = docs.select(
        F.col("doc_id").alias("j"), F.col("lang").alias("lang_b"), F.col("sh").alias("sb")
    )
    jac = F.round(
        F.size(F.array_intersect("sa", "sb")).cast("double")
        / F.size(F.array_union("sa", "sb")),
        6,
    )
    pairs = (
        a.join(b_, (F.col("i") < F.col("j")) & (F.col("lang_a") == F.col("lang_b")))
        .select(jac.alias("jac"))
    )
    grid = spark.createDataFrame(_TUNE_GRID, "b int, r int")
    prob = 1.0 - F.pow(1.0 - F.pow(F.col("jac"), F.col("r")), F.col("b"))
    return (
        pairs.crossJoin(F.broadcast(grid))
        .groupBy("b", "r")
        .agg(
            F.sum(F.when(F.col("jac") >= _TUNE_TRUE_JAC, 1).otherwise(0))
            .cast("long")
            .alias("n_true_pairs"),
            F.round(
                F.avg(F.when(F.col("jac") >= _TUNE_TRUE_JAC, prob)), 6
            ).alias("expected_recall"),
            F.round(
                F.avg(F.when(F.col("jac") < _TUNE_TRUE_JAC, prob)), 6
            ).alias("expected_fp_rate"),
        )
        .select(
            F.col("b").cast("int").alias("n_bands"),
            F.col("r").cast("int").alias("rows_per_band"),
            "n_true_pairs",
            "expected_recall",
            "expected_fp_rate",
        )
    )


_MATTR_WIN = 20


@register(
    "text_mattr_diversity",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    w AS (
      SELECT doc_id, len(toks) AS n_words,
             CASE WHEN len(toks) < {_MATTR_WIN}
                  THEN [round(CAST(len(list_distinct(toks)) AS DOUBLE)
                              / len(toks), 6)]
                  ELSE list_transform(
                      generate_series(1, len(toks) - {_MATTR_WIN} + 1),
                      i -> round(CAST(len(list_distinct(toks[i:i+{_MATTR_WIN} - 1]))
                                 AS DOUBLE) / {_MATTR_WIN}, 6))
             END AS wins
      FROM d)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(len(wins) AS BIGINT) AS n_windows,
           round(list_sum(wins) / len(wins), 6) AS mattr
    FROM w
    """,
)
def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTR — Moving-Average Type-Token Ratio (Covington & McFall's
    public fix for plain TTR's length bias: long documents mechanically
    repeat words, so corpus-level TTR comparisons are confounded by
    length; averaging the TTR of every {_MATTR_WIN}-token sliding
    window makes diversity comparable across lengths). Documents
    shorter than the window fall back to their plain TTR (one window).

    Scale: pure map-side array arithmetic — transform over a sequence
    of window starts, slice, array_distinct — no explode, no shuffle,
    no UDF; a 100 TB corpus pays one scan. Per-window TTRs are
    6dp-rounded integer ratios (identical on both engines) BEFORE the
    mean, so the one float summation is over identical operands."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    wins = F.when(
        F.size("toks") < _MATTR_WIN,
        F.array(
            F.round(
                F.size(F.array_distinct("toks")).cast("double") / F.size("toks"), 6
            )
        ),
    ).otherwise(
        F.expr(
            f"transform(sequence(1, size(toks) - {_MATTR_WIN} + 1),"
            f" i -> round(CAST(size(array_distinct(slice(toks, i, {_MATTR_WIN})))"
            f" AS DOUBLE) / {_MATTR_WIN}, 6))"
        )
    )
    w = d.select("doc_id", F.size("toks").cast("long").alias("n_words"), wins.alias("wins"))
    return w.select(
        "doc_id",
        "n_words",
        F.size("wins").cast("long").alias("n_windows"),
        F.round(
            F.aggregate("wins", F.lit(0.0), lambda s, v: s + v) / F.size("wins"), 6
        ).alias("mattr"),
    )


_CALIB_K = 16  # minhash permutations for the estimator-quality check


@register(
    "dedup_minhash_estimator_calibration",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             list_distinct([substring(text, i, 3)
                            for i in range(1, length(text) - 1)]) AS sh
      FROM documents
      WHERE doc_id < {_TUNE_SAMPLE_MAX_ID} AND length(text) >= 3),
    mh AS (
      SELECT s.doc_id, k.k,
             min(md5(CAST(k.k AS VARCHAR) || ':' || u.g)) AS mh
      FROM s, unnest(s.sh) AS u(g),
           (SELECT unnest(range({_CALIB_K})) AS k) k
      GROUP BY s.doc_id, k.k),
    pairs AS (
      SELECT a.doc_id AS i, b.doc_id AS j,
             round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                   / len(list_distinct(a.sh || b.sh)), 6) AS jac
      FROM s a JOIN s b ON a.doc_id < b.doc_id AND a.lang = b.lang),
    est AS (
      SELECT p.i, p.j, p.jac,
             round(sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
                   / CAST({_CALIB_K} AS DOUBLE), 6) AS est_j
      FROM pairs p
      JOIN mh ma ON ma.doc_id = p.i
      JOIN mh mb ON mb.doc_id = p.j AND mb.k = ma.k
      GROUP BY p.i, p.j, p.jac)
    SELECT CAST(floor(jac * 10) AS INT) AS jac_band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(jac), 6) AS mean_exact,
           round(avg(est_j), 6) AS mean_estimate,
           round(avg(est_j) - avg(jac), 6) AS bias
    FROM est GROUP BY 1
    """,
)
def dedup_minhash_estimator_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration — the companion audit to
    dedup_minhash_band_tuning: does the signature-agreement estimate
    (matching minhashes / K) actually track exact Jaccard on THIS
    corpus's shingle distribution? Per exact-Jaccard decile band, the
    mean exact J, the mean K={_CALIB_K} estimate, and the realized
    bias — the plot that justifies (or indicts) the signature length
    before a production dedup trusts it. The estimator is unbiased in
    theory (P[min-match] = J exactly); the finite-K bias per band is
    what this table measures.

    Determinism: 'permutations' are md5(k || ':' || shingle) with the
    lexicographic min over hex strings — identical on both engines,
    no RNG. Scale contract: like band_tuning, the exact-J quadratic
    runs ONLY on the declared calibration sample; the signature
    computation itself is the linear-time production shape (one
    shingle explode x K, map-side min agg)."""
    docs = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < _TUNE_SAMPLE_MAX_ID) & (F.length("text") >= 3))
        .select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(text) - 2),"
                    " i -> substring(text, i, 3))"
                )
            ).alias("sh"),
        )
        # Lazy checkpoint: the sample table feeds FOUR plan branches
        # (both pair sides + both signature sides); without it each
        # branch re-ran the scan+shingle subtree and compiled its own
        # codegen copy. <= _TUNE_SAMPLE_MAX_ID rows by construction.
        .localCheckpoint(eager=False)
    )
    mh = (
        docs.select("doc_id", F.explode("sh").alias("g"))
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(_CALIB_K - 1))))
        .groupBy("doc_id", "k")
        .agg(
            F.min(
                F.md5(F.concat(F.col("k").cast("string"), F.lit(":"), F.col("g")))
            ).alias("mh")
        )
        # Same: ma and mb below each broadcast this subtree; checkpoint
        # = one signature computation (sample x K rows, bounded).
        .localCheckpoint(eager=False)
    )
    a = docs.select(
        F.col("doc_id").alias("i"), F.col("lang").alias("lang_a"), F.col("sh").alias("sa")
    )
    b = docs.select(
        F.col("doc_id").alias("j"), F.col("lang").alias("lang_b"), F.col("sh").alias("sb")
    )
    jac = F.round(
        F.size(F.array_intersect("sa", "sb")).cast("double")
        / F.size(F.array_union("sa", "sb")),
        6,
    )
    pairs = a.join(
        b, (F.col("i") < F.col("j")) & (F.col("lang_a") == F.col("lang_b"))
    ).select("i", "j", jac.alias("jac"))
    ma = mh.select(F.col("doc_id").alias("i"), F.col("k").alias("ka"), F.col("mh").alias("mha"))
    mb = mh.select(F.col("doc_id").alias("j_b"), F.col("k").alias("kb"), F.col("mh").alias("mhb"))
    est = (
        pairs.join(ma, "i")
        .join(mb, (F.col("j") == F.col("j_b")) & (F.col("ka") == F.col("kb")))
        .groupBy("i", "j", "jac")
        .agg(
            F.round(
                F.sum(F.when(F.col("mha") == F.col("mhb"), 1).otherwise(0))
                / F.lit(float(_CALIB_K)),
                6,
            ).alias("est_j")
        )
    )
    return est.groupBy(F.floor(F.col("jac") * 10).cast("int").alias("jac_band")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("jac"), 6).alias("mean_exact"),
        F.round(F.avg("est_j"), 6).alias("mean_estimate"),
        F.round(F.avg("est_j") - F.avg("jac"), 6).alias("bias"),
    )


@register(
    "text_source_jsd",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
    sc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY 1, 2),
    st AS (SELECT source, sum(c) AS t FROM sc GROUP BY 1),
    cc AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
    ct AS (SELECT sum(c) AS t FROM cc),
    j AS (
      SELECT sc.source,
             sc.c / CAST(st.t AS DOUBLE) AS p,
             cc.c / CAST(ct.t AS DOUBLE) AS q
      FROM sc JOIN st ON st.source = sc.source
              JOIN cc ON cc.w = sc.w CROSS JOIN ct),
    terms AS (
      SELECT source,
             sum(0.5 * p * ln(p / ((p + q) / 2))
               + 0.5 * q * ln(q / ((p + q) / 2))) AS jsd_partial,
             sum(0.5 * q) AS q_covered
      FROM j GROUP BY 1)
    SELECT t.source,
           CAST(st.t AS BIGINT) AS n_tokens,
           round(t.jsd_partial
                 + 0.5 * (1.0 - t.q_covered) * ln(2.0), 6) AS jsd
    FROM terms t JOIN st ON st.source = t.source
    """,
)
def text_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's unigram
    distribution and the corpus mixture — the source-quality/drift
    rank a curation pipeline uses to spot feeds whose vocabulary has
    shifted (scraper broke, boilerplate flood, language drift). JSD
    is bounded [0, ln 2], symmetric, and defined even with disjoint
    support — the reason it beats raw KL for this job. Words the
    source lacks contribute 0.5*q*ln(q/(q/2)) = 0.5*q*ln2 each;
    rather than densifying the (source x vocab) matrix, that absent
    mass folds in CLOSED FORM as 0.5*(1 - covered_q)*ln2 — the sparse
    join only ever touches (source, word) pairs that EXIST.

    Scale: two count aggregates (per-source and corpus vocab tables),
    one sparse join on word, a source-keyed sum — every relation is
    vocabulary-sized, never corpus-sized, and nothing densifies."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    sc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("t")).withColumnRenamed("source", "src_t")
    cc = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("cq"))
        .withColumnRenamed("w", "w_q")
    )
    ct = cc.agg(F.sum("cq").alias("tq"))
    j = (
        sc.join(F.broadcast(st), F.col("source") == F.col("src_t"))
        .join(cc, F.col("w") == F.col("w_q"))
        .crossJoin(F.broadcast(ct))
        .select(
            "source",
            (F.col("c") / F.col("t").cast("double")).alias("p"),
            (F.col("cq") / F.col("tq").cast("double")).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    terms = j.groupBy("source").agg(
        F.sum(
            0.5 * F.col("p") * F.log(F.col("p") / m)
            + 0.5 * F.col("q") * F.log(F.col("q") / m)
        ).alias("jsd_partial"),
        F.sum(0.5 * F.col("q")).alias("q_covered"),
    )
    import math

    return terms.join(F.broadcast(st), F.col("source") == F.col("src_t")).select(
        "source",
        F.col("t").cast("long").alias("n_tokens"),
        F.round(
            F.col("jsd_partial") + 0.5 * (1.0 - F.col("q_covered")) * math.log(2.0), 6
        ).alias("jsd"),
    )


_HARDNEG_K = 5


@register(
    "similarity_hard_negatives",
    oracle=f"""
    WITH d AS (
      SELECT q.vec_id AS q_vec_id, q.label AS q_label,
             e.vec_id AS neg_id, e.label AS neg_label,
             round(list_sum(list_transform(list_zip(e.embedding, q.embedding),
                   x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
      FROM embeddings q JOIN embeddings e
        ON e.vec_id <> q.vec_id AND e.label <> q.label
      WHERE q.vec_id < 20),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY cos DESC, neg_id) AS rn FROM d)
    SELECT q_vec_id, q_label, neg_id, neg_label, cos, CAST(rn AS INT) AS rn
    FROM r WHERE rn <= {_HARDNEG_K}
    """,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining — the contrastive-training data step that
    turns a labeled corpus into triplets: for each anchor query, the
    top-k most-similar vectors with a DIFFERENT label (maximally
    confusing negatives; random negatives are too easy and the
    encoder stops learning). Same bounded-anchor broadcast +
    WindowGroupLimit shape as eval_retrieval_precision_at_k, with the
    label-disagreement predicate pushed INTO the join so same-label
    pairs never materialize. Cosines round to 6dp before ranking;
    ties break on vec_id."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
    )
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    scored = emb.join(
        F.broadcast(q),
        (F.col("vec_id") != F.col("q_vec_id")) & (F.col("label") != F.col("q_label")),
    ).select(
        "q_vec_id",
        "q_label",
        F.col("vec_id").alias("neg_id"),
        F.col("label").alias("neg_label"),
        F.round(dot, 6).alias("cos"),
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("neg_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HARDNEG_K)
        .select(
            "q_vec_id", "q_label", "neg_id", "neg_label", "cos",
            F.col("rn").cast("int").alias("rn"),
        )
    )
