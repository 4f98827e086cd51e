"""Training-corpus assembly operators — the steps between a curated
document table and the shards a trainer actually reads: RAG-style
chunking, sequence packing, vocabulary/OOV profiling, retrieval quality
evaluation, mixture re-balancing, and boilerplate-prefix clustering.

Scale design (100 TB):
- Chunking/packing are map-side per document group — no global state.
  Packing is next-fit per source group (applyInPandas); at 100 TB the
  same code runs per (source, hash-bucket) so no group exceeds executor
  memory, and pack ids are (bucket, local_id) pairs.
- The vocabulary table is aggregate-then-broadcast: the corpus-sized
  token stream never joins against anything bigger than the top-V list.
- Retrieval eval broadcasts the (bounded) query set and evaluates
  map-side against the full corpus — a BroadcastNestedLoopJoin by
  design, never a shuffle-cartesian (the query set is fixed-size).
- Mixture resampling is a metadata-sized rate table broadcast into a
  map-only filter; membership is content-hash-stable (reruns, reshards
  and incremental appends cannot change a document's fate).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register

CHUNK_WIN = 120       # chars per chunk
CHUNK_STRIDE = 90     # chunk start spacing (overlap = WIN - STRIDE = 30)
PACK_BUDGET = 1024    # tokens per packed training sequence
VOCAB_TOP = 12        # top-V vocabulary (fixture corpus has 31 distinct words)
EVAL_K = 10           # precision@k cutoff


@register(
    "chunk_docs_overlap",
    oracle=f"""
    WITH ks AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
                 CAST(floor((length(text)-1)/{CHUNK_STRIDE}.0) AS BIGINT))) AS k
      FROM documents)
    SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
           CAST(k * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           substring(text, CAST(k*{CHUNK_STRIDE} + 1 AS INT), {CHUNK_WIN}) AS chunk_text,
           CAST(length(substring(text, CAST(k*{CHUNK_STRIDE} + 1 AS INT), {CHUNK_WIN}))
                AS INTEGER) AS chunk_len
    FROM ks
    """,
)
def chunk_docs_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (RAG / context-window prep):
    every document becomes ceil(len/stride) chunks of WIN chars whose
    starts are STRIDE apart, so consecutive chunks share WIN-STRIDE
    chars of context. Pure map-side explode — sequence+substring are
    JVM expressions, chunk count per doc is len/stride (bounded), and
    no shuffle exists anywhere in the plan: at 100 TB this is a
    straight scan-transform-write pipeline."""
    docs = load(spark, sf_dir, "documents")
    # length > 0 guard: Spark's sequence(0, -1) auto-reverses to
    # [0, -1] instead of being empty, so an empty document would emit
    # two phantom chunks while the oracle's generate_series(0, -1)
    # emits none. Empty/NULL text -> zero chunks on both engines.
    ks = docs.filter(F.length("text") > 0).select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.floor((F.length("text") - 1) / CHUNK_STRIDE).cast("long"),
            )
        ).alias("k"),
    )
    chunk = F.expr(
        f"substring(text, CAST(k*{CHUNK_STRIDE} + 1 AS INT), {CHUNK_WIN})"
    )
    return ks.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        (F.col("k") * CHUNK_STRIDE).alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("int").alias("chunk_len"),
    )


_PACK_SCHEMA = (
    "source string, pack_id long, n_docs long, total_tokens long, "
    "min_doc long, max_doc long"
)


def _pack_one_source(pdf: pd.DataFrame) -> pd.DataFrame:
    """Next-fit packing of one source's docs, ordered by doc_id: a doc
    joins the open pack unless that would exceed the budget, else it
    opens a new pack (an oversized doc gets a pack to itself)."""
    pdf = pdf.sort_values("doc_id")
    packs, acc, pid = [], 0, 0
    for t in pdf["tok"]:
        if acc > 0 and acc + t > PACK_BUDGET:
            pid += 1
            acc = int(t)
        else:
            acc += int(t)
        packs.append(pid)
    pdf = pdf.assign(pack_id=packs)
    out = (
        pdf.groupby("pack_id", as_index=False)
        .agg(
            source=("source", "first"),
            n_docs=("doc_id", "size"),
            total_tokens=("tok", "sum"),
            min_doc=("doc_id", "min"),
            max_doc=("doc_id", "max"),
        )
    )
    return out[["source", "pack_id", "n_docs", "total_tokens", "min_doc", "max_doc"]]


@register(
    "pack_tokens_nextfit",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT source, doc_id,
             CASE WHEN text IS NULL OR text = '' THEN 0
                  ELSE len(string_split(text,' ')) END AS tok,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    packed AS (
      SELECT source, doc_id, tok, rn, CAST(0 AS BIGINT) AS pack_id, tok AS acc
      FROM t WHERE rn = 1
      UNION ALL
      SELECT t.source, t.doc_id, t.tok, t.rn,
             CASE WHEN p.acc + t.tok > {PACK_BUDGET} THEN p.pack_id + 1 ELSE p.pack_id END,
             CASE WHEN p.acc + t.tok > {PACK_BUDGET} THEN t.tok ELSE p.acc + t.tok END
      FROM packed p JOIN t ON t.source = p.source AND t.rn = p.rn + 1)
    SELECT source, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS total_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM packed GROUP BY 1, 2
    """,
)
def pack_tokens_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (next-fit): concatenate consecutive docs into
    packs of ≤ BUDGET tokens so short documents don't waste training
    context — the standard LLM pretraining packing step. Next-fit is
    inherently sequential per group, so it runs as applyInPandas per
    source (one shuffle on source); the oracle reproduces the exact
    same scan as a recursive CTE. At 100 TB the group key becomes
    (source, hash_bucket) so every group is executor-sized; next-fit
    (unlike first-fit-decreasing) needs only one pass and O(1) state,
    which is why trainers use it for streaming packing."""
    docs = load(spark, sf_dir, "documents")
    # NULL/empty text -> 0 tokens (pinned in BOTH engines): split('')
    # yields [''] (1 phantom token) and split(NULL) yields NULL, which
    # crashed the pandas packer as NaN. Same empty-doc contract as
    # chunk_docs_overlap's zero chunks.
    tok = (
        F.when(F.col("text").isNull() | (F.col("text") == ""), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
        .cast("long")
    )
    toks = docs.select("source", "doc_id", tok.alias("tok"))
    return toks.groupBy("source").applyInPandas(_pack_one_source, _PACK_SCHEMA)


@register(
    "tokenizer_vocab_coverage",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS word
               FROM documents WHERE text IS NOT NULL AND text <> ''),
    v AS (SELECT word FROM (SELECT word, count(*) AS c FROM w GROUP BY word) cw
          ORDER BY c DESC, word LIMIT {VOCAB_TOP})
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
           round(CAST(count(*) FILTER (WHERE v.word IS NULL) AS DOUBLE) / count(*), 6)
               AS oov_rate
    FROM w LEFT JOIN v ON w.word = v.word GROUP BY doc_id
    """,
)
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage / OOV-rate profiling: fit a top-V unigram
    vocabulary on the corpus, then score every document's fraction of
    out-of-vocabulary tokens — the cheap proxy for "will my tokenizer
    fragment this document" used to route documents to byte-fallback
    handling. Two aggregates: the vocab fit is corpus-wide but its
    RESULT is V rows, which broadcasts into a map-side membership probe
    (the token stream never shuffles against anything data-sized).
    Ties at the V-boundary break on (count desc, word asc) so the
    fitted vocab is deterministic on any engine."""
    docs = load(spark, sf_dir, "documents")
    # NULL/empty docs contribute no tokens (and no output row) — the
    # phantom '' token a bare split('') emits is not a word.
    w = docs.filter(F.col("text").isNotNull() & (F.col("text") != "")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    vocab = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(VOCAB_TOP)
        .select("word", F.lit(1).alias("in_v"))
    )
    oov = F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0))
    return (
        w.join(F.broadcast(vocab), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            oov.alias("n_oov"),
            F.round(oov.cast("double") / F.count(F.lit(1)), 6).alias("oov_rate"),
        )
    )


@register(
    "eval_retrieval_precision_at_k",
    oracle=f"""
    WITH d AS (
      SELECT q.vec_id AS q_vec_id, q.label AS q_label,
             e.vec_id AS vec_id, e.label AS label,
             round(list_sum(list_transform(list_zip(e.embedding, q.embedding),
                   x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 20),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY cos DESC, vec_id) AS rn FROM d)
    SELECT q_vec_id, q_label,
           round(CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS p_at_{EVAL_K}
    FROM r WHERE rn <= {EVAL_K} GROUP BY 1, 2
    """,
)
def eval_retrieval_precision_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality evaluation: for each held-out query vector,
    retrieve the top-k cosine neighbors and score the fraction sharing
    the query's label (precision@k) — the standard label-as-relevance
    check run after every embedding-model or index change. The query
    set (vec_id < 20) is bounded and broadcast, so the scoring pass is
    map-side over the corpus (BroadcastNestedLoopJoin on the != guard,
    never a shuffle cartesian); ranking is per-query WindowGroupLimit.
    Cosines are rounded to 6dp BEFORE ranking so the rank order is
    identical on any engine's float path; ties break on vec_id."""
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
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "q_label", "vec_id", "label", F.round(dot, 6).alias("cos"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    hit = F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVAL_K)
        .groupBy("q_vec_id", "q_label")
        .agg(
            F.round(hit.cast("double") / F.count(F.lit(1)), 6).alias(f"p_at_{EVAL_K}")
        )
    )


@register(
    "corpus_mixture_balance",
    oracle="""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
    m AS (SELECT min(n) AS cap FROM c),
    keep AS (
      SELECT d.doc_id, d.lang
      FROM documents d JOIN c ON d.lang = c.lang CROSS JOIN m
      WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            / 4294967296.0 < CAST(m.cap AS DOUBLE) / c.n)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept, min(doc_id) AS min_doc
    FROM keep GROUP BY lang
    """,
)
def corpus_mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture re-balancing: downsample every language to
    (approximately) the smallest language's share using a content-hash
    keep rule — how multilingual pretraining mixes are rebalanced
    without an RNG, so a document's membership survives reruns,
    resharding and incremental appends. The per-lang rate table is
    metadata-sized and broadcast; the keep test itself is a map-only
    filter (uniform hash in [0,1) < cap/n_lang). The 1-row min-count
    combine is the only global step."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # Pre-join the two tiny tables into ONE |langs|-row rate table so
    # the corpus-sized stream passes through a single broadcast join
    # (separately joining counts then the 1-row cap cost a second
    # BroadcastNestedLoopJoin pass over every document).
    rate = c.crossJoin(c.agg(F.min("n").alias("cap"))).select(
        "lang", (F.col("cap").cast("double") / F.col("n")).alias("keep_rate")
    )
    frac = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(rate), "lang")
        .filter(frac < F.col("keep_rate"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.min("doc_id").alias("min_doc"))
    )


@register(
    "dedup_doc_prefix",
    oracle="""
    SELECT md5(substring(text, 1, 64)) AS prefix_hash,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keep_id,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM documents GROUP BY 1
    """,
)
def dedup_doc_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate-prefix clustering: hash the first 64 chars only —
    catches template/boilerplate families (same header, differing
    tails) that full-content hashing misses and near-dup banding pays
    LSH machinery to find. A web-scale staple (cookie banners, SEO
    headers). Map-only md5 of a fixed-size prefix — the full text
    never enters the shuffle; one hash aggregation; n_sources shows
    whether a prefix family is one crawler artifact or cross-site
    boilerplate."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "source",
            F.md5(F.substring("text", 1, 64)).alias("prefix_hash"),
        )
        .groupBy("prefix_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@register(
    "corpus_temperature_mixture",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT sum(n) AS total,
                 sum(sqrt(CAST(n AS DOUBLE))) AS sq FROM c),
    r AS (SELECT source, n,
                 CAST(n AS DOUBLE) / total AS share,
                 sqrt(CAST(n AS DOUBLE)) / sq AS temp_share,
                 sqrt(CAST(n AS DOUBLE)) / sq * total / n AS rep
          FROM c CROSS JOIN t),
    k AS (SELECT d.source, count(*) AS n_kept
          FROM documents d JOIN r ON d.source = r.source
          WHERE CAST(('0x' || substring(
                    md5(CAST(d.doc_id AS VARCHAR) || 'temp'), 1, 8))
                    AS BIGINT) / 4294967296.0 < LEAST(r.rep, 1.0)
          GROUP BY d.source)
    SELECT r.source, CAST(r.n AS BIGINT) AS n_docs,
           round(r.share, 6) AS share,
           round(r.temp_share, 6) AS temp_share,
           round(r.rep, 6) AS rep_factor,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM r LEFT JOIN k USING (source)
    """,
)
def corpus_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (the mT5/UniMax recipe,
    T = 2): target share q_s ∝ p_s^(1/T), flattening the source
    distribution PARTIALLY — head sources downsample, tail sources
    upsample — where corpus_mixture_balance's hard cap flattens it
    completely. Emits the resampling plan per source (natural share,
    temperature share, repetition factor = q_s·N/n_s) plus the
    REALIZED keep count for the downsampled sources via the same
    salted-content-hash rule mixture_balance uses (rep >= 1 keeps all
    rows and records the >1 factor as training epochs — upsampling is
    repetition at read time, never materialized). Scale: one
    source-level aggregation; the rate table is |sources|-row,
    broadcast into a map-only filter; membership is hash-stable under
    reruns/resharding/appends."""
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("total"),
        F.sum(F.sqrt(F.col("n").cast("double"))).alias("sq"),
    )
    nd = F.col("n").cast("double")
    rate = c.crossJoin(F.broadcast(t)).select(
        "source",
        "n",
        (nd / F.col("total")).alias("share"),
        (F.sqrt(nd) / F.col("sq")).alias("temp_share"),
        (F.sqrt(nd) / F.col("sq") * F.col("total") / F.col("n")).alias("rep"),
    )
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("temp"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
    )
    kept = (
        docs.join(F.broadcast(rate.select("source", "rep")), "source")
        .filter(frac < F.least(F.col("rep"), F.lit(1.0)))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rate.join(F.broadcast(kept), "source", "left")
        .select(
            "source",
            F.col("n").cast("long").alias("n_docs"),
            F.round("share", 6).alias("share"),
            F.round("temp_share", 6).alias("temp_share"),
            F.round("rep", 6).alias("rep_factor"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


@register(
    "eval_retrieval_ndcg_at_k",
    oracle=f"""
    WITH d AS (
      SELECT q.vec_id AS q_vec_id, q.label AS q_label,
             e.vec_id AS vec_id,
             CASE WHEN e.label = q.label THEN 1 ELSE 0 END AS rel,
             round(list_sum(list_transform(list_zip(e.embedding, q.embedding),
                   x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 20),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY cos DESC, vec_id) AS rn,
                 row_number() OVER (PARTITION BY q_vec_id
                                    ORDER BY rel DESC, cos DESC, vec_id)
                     AS ideal_rn
          FROM d),
    dcg AS (SELECT q_vec_id, q_label,
                   sum(CASE WHEN rn <= {EVAL_K}
                            THEN rel / (ln(rn + 1) / ln(2)) ELSE 0 END)
                       AS dcg,
                   sum(CASE WHEN ideal_rn <= {EVAL_K}
                            THEN rel / (ln(ideal_rn + 1) / ln(2)) ELSE 0 END)
                       AS idcg
            FROM r GROUP BY 1, 2)
    SELECT q_vec_id, q_label,
           round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0 END, 6)
               AS ndcg_at_{EVAL_K}
    FROM dcg
    """,
)
def eval_retrieval_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@k over the same bounded query set as precision@k — the
    rank-POSITION-aware retrieval metric (a relevant hit at rank 1 is
    worth more than at rank 10), which is what actually moves when a
    re-ranker or embedding change shuffles the top of the list without
    changing set membership. Ideal ranking (IDCG) is computed from the
    same scored relation with a relevance-first window, so the metric
    is self-normalizing per query; IDCG = 0 (no relevant docs at all)
    defines NDCG = 0. Same scale contract as precision@k: broadcast
    query set, map-side scoring, two per-query windows over k-bounded
    rows — log2 discounts are ln(x)/ln(2) on BOTH engines so the
    doubles agree bit-for-bit."""
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
    scored = emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_vec_id")).select(
        "q_vec_id",
        "q_label",
        "vec_id",
        F.when(F.col("label") == F.col("q_label"), 1).otherwise(0).alias("rel"),
        F.round(dot, 6).alias("cos"),
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    wi = Window.partitionBy("q_vec_id").orderBy(
        F.desc("rel"), F.desc("cos"), F.asc("vec_id")
    )
    log2 = lambda c: F.log(c.cast("double")) / F.log(F.lit(2.0))  # noqa: E731
    r = scored.withColumn("rn", F.row_number().over(w)).withColumn(
        "ideal_rn", F.row_number().over(wi)
    )
    dcg = F.sum(
        F.when(F.col("rn") <= EVAL_K, F.col("rel") / log2(F.col("rn") + 1)).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(
            F.col("ideal_rn") <= EVAL_K,
            F.col("rel") / log2(F.col("ideal_rn") + 1),
        ).otherwise(0.0)
    )
    return r.groupBy("q_vec_id", "q_label").agg(
        F.round(
            F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)), 6
        ).alias(f"ndcg_at_{EVAL_K}")
    )


@register(
    "similarity_rank_fusion_rrf",
    oracle="""
    WITH d AS (
      SELECT e.vec_id, e.label,
             round(list_sum(list_transform(list_zip(e.embedding, q.embedding),
                   x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
      FROM embeddings e JOIN embeddings q ON q.vec_id = 0
      WHERE e.vec_id <> 0),
    ca AS (SELECT vec_id, label,
                  row_number() OVER (ORDER BY cos DESC, vec_id) AS rank_cos
           FROM d ORDER BY cos DESC, vec_id LIMIT 60),
    rb AS (SELECT vec_id, label,
                  row_number() OVER (ORDER BY vec_id DESC) AS rank_recency
           FROM d ORDER BY vec_id DESC LIMIT 60),
    f AS (SELECT COALESCE(ca.vec_id, rb.vec_id) AS vec_id,
                 COALESCE(ca.label, rb.label) AS label,
                 ca.rank_cos, rb.rank_recency,
                 round(COALESCE(1.0 / (60 + ca.rank_cos), 0)
                       + COALESCE(1.0 / (60 + rb.rank_recency), 0), 6) AS rrf
          FROM ca FULL JOIN rb ON ca.vec_id = rb.vec_id)
    SELECT vec_id, label,
           CAST(rank_cos AS BIGINT) AS rank_cos,
           CAST(rank_recency AS BIGINT) AS rank_recency, rrf
    FROM f
    ORDER BY rrf DESC, vec_id LIMIT 10
    """,
)
def similarity_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (k=60) of two retrieval signals for one
    query — cosine similarity and recency (vec_id as ingest order) —
    the standard way hybrid search merges rankers WITHOUT score
    calibration: only ranks enter, so a cosine in [0,1] and a BM25 in
    [0,40] fuse with no normalization, and items missing from a
    ranker's TRUNCATED list contribute nothing (production RRF fuses
    top-k lists, not full rankings). Scale shape: each ranker is a
    TakeOrderedAndProject top-60 over the candidate relation (never a
    data-sized global sort); the rank window then runs on the 60-row
    truncated list (a bounded single-partition exchange, declared in
    the ratchet), and fusion is a 60x60 full outer join + top-10
    TakeOrdered. Ranks on 6dp-rounded scores, ties on vec_id —
    engine-stable ordering throughout."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    d = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", "label", F.round(dot, 6).alias("cos"))
    )
    ca = (
        d.orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(60)
        .withColumn(
            "rank_cos",
            F.row_number().over(Window.orderBy(F.desc("cos"), F.asc("vec_id"))),
        )
        .select("vec_id", "label", "rank_cos")
    )
    rb = (
        d.orderBy(F.desc("vec_id"))
        .limit(60)
        .withColumn(
            "rank_recency", F.row_number().over(Window.orderBy(F.desc("vec_id")))
        )
        .select(
            F.col("vec_id").alias("r_vec_id"),
            F.col("label").alias("r_label"),
            "rank_recency",
        )
    )
    f = ca.join(rb, ca.vec_id == rb.r_vec_id, "full_outer").select(
        F.coalesce("vec_id", "r_vec_id").alias("vec_id"),
        F.coalesce("label", "r_label").alias("label"),
        "rank_cos",
        "rank_recency",
        F.round(
            F.coalesce(1.0 / (60 + F.col("rank_cos")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rank_recency")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    return (
        f.select(
            "vec_id",
            "label",
            F.col("rank_cos").cast("long").alias("rank_cos"),
            F.col("rank_recency").cast("long").alias("rank_recency"),
            "rrf",
        )
        .orderBy(F.desc("rrf"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "eval_retrieval_mrr",
    oracle=f"""
    WITH d AS (
      SELECT q.vec_id AS q_vec_id, q.label AS q_label,
             e.vec_id AS vec_id, e.label AS label,
             round(list_sum(list_transform(list_zip(e.embedding, q.embedding),
                   x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 20),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY cos DESC, vec_id) AS rn FROM d),
    f AS (SELECT q_vec_id, q_label, min(rn) AS first_rel
          FROM r WHERE rn <= {EVAL_K} AND label = q_label GROUP BY 1, 2),
    qs AS (SELECT DISTINCT q_vec_id, q_label FROM d)
    SELECT qs.q_vec_id, qs.q_label,
           CAST(coalesce(f.first_rel, 0) AS BIGINT) AS first_rel_rank,
           round(CASE WHEN f.first_rel IS NULL THEN 0.0
                      ELSE 1.0 / f.first_rel END, 6) AS rr_at_{EVAL_K}
    FROM qs LEFT JOIN f USING (q_vec_id, q_label)
    """,
)
def eval_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank evaluation (the per-query reciprocal-rank
    table; the corpus MRR is its 1-row avg): rank of the FIRST
    same-label neighbor within the top-k, 0 when none lands there —
    the metric that grades retrieval for single-answer lookups, where
    precision@k (how MANY of the top k are relevant) over-rewards
    redundancy and ndcg needs graded labels. Identical plan scaffold
    to the precision/ndcg siblings: bounded broadcast query set,
    map-side scoring, per-query WindowGroupLimit rank, cosines rounded
    to 6dp BEFORE ranking so order is engine-identical."""
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
        F.broadcast(q), F.col("vec_id") != F.col("q_vec_id")
    ).select(
        "q_vec_id", "q_label", "vec_id", "label", F.round(dot, 6).alias("cos")
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    first_rel = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= EVAL_K) & (F.col("label") == F.col("q_label")))
        .groupBy("q_vec_id", "q_label")
        .agg(F.min("rn").alias("first_rel"))
    )
    qs = q.select("q_vec_id", "q_label")
    return qs.join(first_rel, ["q_vec_id", "q_label"], "left").select(
        "q_vec_id",
        "q_label",
        F.coalesce("first_rel", F.lit(0)).cast("long").alias("first_rel_rank"),
        F.round(
            F.when(F.col("first_rel").isNull(), 0.0).otherwise(
                1.0 / F.col("first_rel")
            ),
            6,
        ).alias(f"rr_at_{EVAL_K}"),
    )


@register(
    "corpus_span_corruption",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             [CASE WHEN (list_reduce(list_prepend(CAST(0 AS BIGINT),
                     [CAST(strpos('0123456789abcdef', ch) - 1 AS BIGINT)
                      for ch in string_split_regex(
                          substring(md5(CAST(doc_id AS VARCHAR) || '-' ||
                                        CAST(i AS VARCHAR)), 1, 13), '')]),
                     (a, d) -> a * 16 + d) + 0.5) / 4503599627370496.0 < 0.15
                   THEN 1 ELSE 0 END
              for i in range(1, len(string_split(text, ' ')) + 1)] AS m
      FROM documents)
    SELECT doc_id,
           CAST(len(m) AS BIGINT) AS n_tokens,
           CAST(list_sum(m) AS BIGINT) AS n_masked,
           CAST(list_sum([CASE WHEN m[i] = 1
                                AND (i = 1 OR m[i - 1] = 0)
                               THEN 1 ELSE 0 END
                          for i in range(1, len(m) + 1)]) AS BIGINT)
               AS n_spans,
           round(CAST(list_sum(m) AS DOUBLE) / len(m), 6) AS mask_rate
    FROM base
    """,
)
def corpus_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption planning (the T5/UL2 denoising objective's data
    prep): every token position draws a DETERMINISTIC uniform from
    md5(doc_id, position) and positions under the 15% rate are masked;
    runs of consecutive masked positions form the spans that become
    sentinel tokens. Emits per-doc mask counts, span counts (a span
    starts where a masked position follows an unmasked one), and the
    realized mask rate — the stats a pretraining pipeline audits before
    committing a corruption config to a 100 TB run. Hash-derived
    randomness (the sample_weighted_priority convention) is what makes
    a masking PLAN value-hash reproducible across engines and reruns —
    a seeded RNG plan is neither.

    Pure map-side JVM: transform/filter/aggregate higher-order
    expressions over the token-position sequence; no shuffle at all
    (the per-doc row is the output grain)."""
    docs = load(spark, sf_dir, "documents")
    u = (
        "(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '-',"
        " CAST(i AS STRING))), 1, 13), 16, 10) AS DOUBLE) + 0.5)"
        " / 4503599627370496.0"
    )
    m = docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(split(text, ' '))),"
            f" i -> CASE WHEN {u} < 0.15 THEN 1 ELSE 0 END)"
        ).alias("m"),
    )
    n_masked = F.expr(
        "aggregate(m, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    n_spans = F.expr(
        "aggregate(transform(sequence(1, size(m)),"
        " i -> CASE WHEN m[i - 1] = 1 AND (i = 1 OR m[i - 2] = 0)"
        " THEN 1 ELSE 0 END), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    return m.select(
        "doc_id",
        F.size("m").cast("long").alias("n_tokens"),
        n_masked.alias("n_masked"),
        n_spans.alias("n_spans"),
        F.round(n_masked.cast("double") / F.size("m"), 6).alias("mask_rate"),
    )


_BPE_SEP = "\x1f"  # unit separator: never appears in fixture tokens
_BPE_ROUNDS = 2


def _bpe_oracle() -> str:
    """Unrolled BPE merge rounds in SQL. Symbol strings use a DOUBLE
    unit-separator between symbols (and at both ends): a merge is then
    a plain replace() of SEP+a+SEP+SEP+b+SEP with SEP+ab+SEP, and
    because every boundary carries TWO separators, consecutive
    occurrences keep a separator each — leftmost non-overlapping
    replace() implements exactly BPE's greedy left-to-right merge
    (verified against a scan in tests/test_r7_ops.py)."""
    s2 = "chr(31) || chr(31)"
    parts = [f"""
    WITH words AS (
      SELECT w, count(*) AS wc FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < 50) t
      WHERE length(w) >= 2 GROUP BY w),
    rep0 AS (
      SELECT w, wc,
             {s2} || list_aggregate(
                 [substring(w, i, 1) for i in range(1, length(w) + 1)],
                 'string_agg', {s2}) || {s2} AS r
      FROM words)"""]
    for i in range(1, _BPE_ROUNDS + 1):
        parts.append(f"""
    p{i} AS (
      SELECT syms[j] AS a, syms[j + 1] AS b, sum(wc) AS c
      FROM (SELECT wc, list_filter(string_split(r, {s2}), x -> x <> '')
                       AS syms
            FROM rep{i - 1}),
           range(1, 64) t(j)
      WHERE j < len(syms)
      GROUP BY 1, 2),
    b{i} AS (SELECT a, b, c FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
    rep{i} AS (
      SELECT w, wc,
             replace(r, chr(31) || b{i}.a || {s2} || b{i}.b || chr(31),
                     chr(31) || b{i}.a || b{i}.b || chr(31)) AS r
      FROM rep{i - 1}, b{i})""")
    selects = [
        f"""SELECT CAST({i} AS BIGINT) AS round, a AS left_sym,
               b AS right_sym, CAST(c AS BIGINT) AS pair_count,
               a || b AS merged FROM b{i}"""
        for i in range(1, _BPE_ROUNDS + 1)
    ]
    return ",".join(parts) + "\n    " + "\n    UNION ALL\n    ".join(selects)


@register("tokenizer_bpe_train", oracle=_bpe_oracle())
def tokenizer_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge TRAINING, bounded rounds (Sennrich et
    al. 2016 — the algorithm under BPE/WordPiece-family tokenizers):
    per round, count every adjacent symbol pair across the word-
    frequency table, merge the most frequent pair everywhere
    (lexicographic tie-break), repeat. Emits each round's learned merge
    rule and its count — rounds 1..N ARE the tokenizer's merges.txt.

    The distributed trick is the merge itself: symbol sequences live as
    double-separator strings, so the greedy non-overlapping merge is
    ONE replace() expression per word (no per-row Python, no iteration
    over positions) — property-tested against a reference scan. Per
    round: one pair-explode hash agg, a 1-row argmax broadcast, one
    map-side replace. Round count is the declared budget (real BPE
    runs ~30k rounds; each is this same cheap plan, and the word table
    — not the corpus — is the working set, exactly how production BPE
    trainers scale)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    return bpe_train_on_words(words)


def bpe_train_on_words(words: DataFrame) -> DataFrame:
    """The BPE merge-training loop over a word-frequency table
    (columns w, wc) — shared by tokenizer_bpe_train and
    pipeline_tokenizer_release so the two keys train literally the
    same way. Returns one row per learned rule:
    (round, left_sym, right_sym, pair_count, merged)."""
    s2 = _BPE_SEP * 2
    rep = words.select(
        "w",
        "wc",
        F.concat(
            F.lit(s2),
            F.concat_ws(s2, F.split(F.col("w"), "(?!^)(?=.)")),
            F.lit(s2),
        ).alias("r"),
    )
    syms = (
        f"filter(split(r, '{_BPE_SEP}{_BPE_SEP}'), x -> x <> '')"
    )
    reports = None
    for rnd in range(1, _BPE_ROUNDS + 1):
        pairs = rep.select(
            "wc",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size({syms}) - 1),"
                    f" j -> struct({syms}[j-1] AS a, {syms}[j] AS b))"
                )
            ).alias("p"),
        ).select("wc", "p.a", "p.b")
        best = (
            pairs.groupBy("a", "b")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
        ).localCheckpoint()
        row = best.select(
            F.lit(rnd).cast("long").alias("round"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.col("c").alias("pair_count"),
            F.concat("a", "b").alias("merged"),
        )
        reports = row if reports is None else reports.unionAll(row)
        rep = rep.crossJoin(F.broadcast(best)).select(
            "w",
            "wc",
            F.expr(
                f"replace(r, '{_BPE_SEP}' || a || '{_BPE_SEP}{_BPE_SEP}'"
                f" || b || '{_BPE_SEP}',"
                f" '{_BPE_SEP}' || a || b || '{_BPE_SEP}')"
            ).alias("r"),
        ).localCheckpoint()
    return reports


@register(
    "tokenizer_bpe_apply",
    # reuse the training CTE chain verbatim, swap the final SELECTs for
    # the encode readout (string surgery keeps the two keys' training
    # definitions literally identical)
    oracle=_bpe_oracle().rsplit("SELECT CAST(1", 1)[0].rstrip()
    + """,
    enc AS (
      SELECT w, wc,
             len(list_filter(string_split(r, chr(31) || chr(31)),
                             x -> x <> '')) AS n_syms,
             length(w) AS n_chars
      FROM rep2)
    SELECT CAST(sum(wc) AS BIGINT) AS n_words,
           CAST(sum(wc * n_chars) AS BIGINT) AS total_chars,
           CAST(sum(wc * n_syms) AS BIGINT) AS total_tokens,
           round(sum(wc * n_chars) / CAST(sum(wc * n_syms) AS DOUBLE), 6)
               AS chars_per_token
    FROM enc
    """,
)
def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE with the learned BPE merges (the tokenize step that runs
    per-document forever after training runs once): apply the trained
    merge rules in order to every word and report the corpus
    compression — chars per token is the fertility number that decides
    context-window budgeting and is THE acceptance metric for a
    tokenizer on a new corpus. Deliberately re-runs the training chain
    and encodes the same word table, so the oracle pins that encode is
    exactly train's final state (held-out encode swaps the words CTE;
    the merge-application expression is byte-identical).

    Per merge rule: one broadcast + one map-side replace — encoding N
    rules deep is N cheap narrow transformations, no shuffle after the
    word table."""
    reports = tokenizer_bpe_train(spark, sf_dir)  # ensures same rules
    merges = [
        (r.left_sym, r.right_sym)
        for r in reports.orderBy("round").collect()
    ]
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    s2 = _BPE_SEP * 2
    rep = words.select(
        "w",
        "wc",
        F.concat(
            F.lit(s2),
            F.concat_ws(s2, F.split(F.col("w"), "(?!^)(?=.)")),
            F.lit(s2),
        ).alias("r"),
    )
    for a, b in merges:
        rep = rep.withColumn(
            "r",
            F.expr(
                f"replace(r, '{_BPE_SEP}' || '{a}' || '{_BPE_SEP}{_BPE_SEP}'"
                f" || '{b}' || '{_BPE_SEP}',"
                f" '{_BPE_SEP}' || '{a}{b}' || '{_BPE_SEP}')"
            ),
        )
    n_syms = F.expr(
        f"size(filter(split(r, '{_BPE_SEP}{_BPE_SEP}'), x -> x <> ''))"
    )
    enc = rep.select(
        "wc", n_syms.alias("n_syms"), F.length("w").alias("n_chars")
    )
    return enc.agg(
        F.sum("wc").alias("n_words"),
        F.sum(F.col("wc") * F.col("n_chars")).alias("total_chars"),
        F.sum(F.col("wc") * F.col("n_syms")).alias("total_tokens"),
        F.round(
            F.sum(F.col("wc") * F.col("n_chars"))
            / F.sum(F.col("wc") * F.col("n_syms")).cast("double"),
            6,
        ).alias("chars_per_token"),
    )


STOPWORD_TOP = 5  # corpus-fit stopword list size (fixture vocab: 31 words)


@register(
    "text_stopword_ratio",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents WHERE text IS NOT NULL AND text <> ''),
    sw AS (SELECT word FROM (SELECT word, count(*) AS c FROM w GROUP BY word) t
           ORDER BY c DESC, word LIMIT {STOPWORD_TOP})
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE sw.word IS NOT NULL) AS BIGINT)
               AS n_stop,
           round(CAST(count(*) FILTER (WHERE sw.word IS NOT NULL) AS DOUBLE)
                 / count(*), 6) AS stop_ratio
    FROM w LEFT JOIN sw ON w.word = sw.word GROUP BY doc_id
    """,
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stopword ratio against a CORPUS-FIT stopword list
    (the top-{N} most frequent words, ties broken lexicographically —
    the Zipf head IS the stopword list when no language resource is
    available): the single strongest cheap feature in boilerplate /
    gibberish quality filters (too low = keyword stuffing or tables,
    too high = empty filler). Same broadcast-membership shape as
    tokenizer_vocab_coverage: the fitted list is {N} rows, so the
    token stream never shuffles against anything data-sized."""
    docs = load(spark, sf_dir, "documents")
    w = docs.filter(F.col("text").isNotNull() & (F.col("text") != "")).select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    sw = (
        w.groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("word"))
        .limit(STOPWORD_TOP)
        .select("word", F.lit(1).alias("is_stop"))
    )
    n_stop = F.sum(F.when(F.col("is_stop").isNotNull(), 1).otherwise(0))
    return (
        w.join(F.broadcast(sw), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            n_stop.alias("n_stop"),
            F.round(n_stop.cast("double") / F.count(F.lit(1)), 6).alias(
                "stop_ratio"
            ),
        )
    )


CHUNK_TOKENS = 32  # fixed-size token chunking width


@register(
    "chunk_fixed_tokens",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR text = '' THEN 0
                  ELSE len(string_split(text, ' ')) END AS n_tokens
      FROM documents),
    ks AS (
      SELECT doc_id, n_tokens,
             unnest(generate_series(0,
                 CAST(ceil(n_tokens / {CHUNK_TOKENS}.0) AS BIGINT) - 1)) AS k
      FROM d WHERE n_tokens > 0)
    SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
           CAST(least({CHUNK_TOKENS}, n_tokens - k * {CHUNK_TOKENS}) AS BIGINT)
               AS chunk_tokens,
           CAST(k * {CHUNK_TOKENS} AS BIGINT) AS token_start
    FROM ks
    """,
)
def chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width TOKEN chunking manifest (the complement of
    chunk_docs_overlap's character/stride chunks): every doc splits
    into ceil(n/{W}) chunks of {W} whitespace tokens with a short tail
    — the planning table a context-window loader materializes before
    gathering chunk text. Pure map-side sequence explode; empty/null
    docs emit zero chunks (the pack_tokens_nextfit empty-doc
    contract)."""
    docs = load(spark, sf_dir, "documents")
    n_tok = (
        F.when(F.col("text").isNull() | (F.col("text") == ""), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
        .alias("n_tokens")
    )
    d = docs.select("doc_id", n_tok).filter(F.col("n_tokens") > 0)
    ks = d.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.col("n_tokens") / float(CHUNK_TOKENS)).cast("long") - 1,
            )
        ).alias("k"),
    )
    return ks.select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        F.least(
            F.lit(CHUNK_TOKENS).cast("long"),
            F.col("n_tokens") - F.col("k") * CHUNK_TOKENS,
        ).cast("long").alias("chunk_tokens"),
        (F.col("k") * CHUNK_TOKENS).cast("long").alias("token_start"),
    )


@register(
    "corpus_interleave_roundrobin",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn,
           CAST(row_number() OVER (ORDER BY rn, source, doc_id) AS BIGINT)
               AS global_idx
    FROM r
    """,
)
def corpus_interleave_roundrobin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-robin interleave schedule across sources: position k of
    the training stream takes the rn-th unread doc of each source in
    source order before any source's rn+1-th — the deterministic
    mixture schedule that keeps a multi-source corpus from feeding the
    trainer long single-source runs (which bias early training and
    wreck loss curves). Emits each doc's within-source rank and its
    global stream index.

    One per-source rank window (source-partitioned, parallel) and one
    global rank over (rn, source) — the global window is docs-sized
    here; windows.global_rank's range-partition + P-row-offset
    scaffold is the documented swap-in at corpus scale, keyed on the
    same (rn, source) tuple."""
    docs = load(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source").orderBy("doc_id")
    r = docs.select(
        "doc_id", "source", F.row_number().over(wsrc).cast("long").alias("rn")
    )
    wglob = Window.orderBy("rn", "source", "doc_id")
    return r.withColumn(
        "global_idx", F.row_number().over(wglob).cast("long")
    )


@register(
    "corpus_doc_length_deciles",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR text = '' THEN 0
                  ELSE len(string_split(text, ' ')) END AS n_tokens
      FROM documents),
    t AS (
      SELECT n_tokens, ntile(10) OVER (ORDER BY n_tokens, doc_id) AS decile
      FROM d)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens,
           round(avg(CAST(n_tokens AS DOUBLE)), 6) AS avg_tokens
    FROM t GROUP BY decile
    """,
)
def corpus_doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length decile profile (token counts cut into 10
    equal-population bands with per-band min/max/mean) — the length
    distribution summary that calibrates chunk sizes, packing budgets,
    and the truncation tail a context window will actually cut.
    Deterministic ntile (ties broken by doc_id). The rank is one
    global window here; windows.global_rank's range-partition scaffold
    is the documented swap-in at corpus scale."""
    docs = load(spark, sf_dir, "documents")
    n_tok = (
        F.when(F.col("text").isNull() | (F.col("text") == ""), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
        .alias("n_tokens")
    )
    d = docs.select("doc_id", n_tok)
    w = Window.orderBy("n_tokens", "doc_id")
    t = d.withColumn("decile", F.ntile(10).over(w))
    return t.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 6).alias("avg_tokens"),
    )


_LOGREG_STEPS = 5
_LOGREG_LR = 1.0
_LOGREG_FEATS = ("bias", "w_chars", "w_tokens", "w_wordlen")


def _logreg_oracle() -> str:
    """Unrolled batch gradient descent in SQL. Each step is one
    aggregation over the feature CTE computing the 4 gradient means
    against the previous weights, then a 1-row weight update ROUNDED
    AT 9dp — the per-step rounding re-synchronizes both engines before
    the next sigmoid pass, so libm-ulp differences in exp() can never
    compound across steps."""
    head = """
    WITH feats AS MATERIALIZED (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0,
               n_chars / 1000.0 AS x1,
               len(string_split(text, ' ')) / 100.0 AS x2,
               (n_chars * 1.0 / len(string_split(text, ' '))) / 10.0 AS x3
        FROM documents),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""
    parts = [head.strip()]
    prev = "w0"
    for k in range(1, _LOGREG_STEPS + 1):
        parts.append(
            f"""g{k} AS MATERIALIZED (
        SELECT avg((p - y) * x0) AS g0, avg((p - y) * x1) AS g1,
               avg((p - y) * x2) AS g2, avg((p - y) * x3) AS g3
        FROM (SELECT y, x0, x1, x2, x3,
                     1.0 / (1.0 + exp(-(w.b * x0 + w.w1 * x1
                                        + w.w2 * x2 + w.w3 * x3))) AS p
              FROM feats, {prev} w) s)"""
        )
        parts.append(
            f"""w{k} AS MATERIALIZED (
        SELECT round(w.b - {_LOGREG_LR} * g.g0, 9) AS b,
               round(w.w1 - {_LOGREG_LR} * g.g1, 9) AS w1,
               round(w.w2 - {_LOGREG_LR} * g.g2, 9) AS w2,
               round(w.w3 - {_LOGREG_LR} * g.g3, 9) AS w3
        FROM {prev} w, g{k} g)"""
        )
        prev = f"w{k}"
    parts.append(
        f"""scored AS MATERIALIZED (
        SELECT y, 1.0 / (1.0 + exp(-(w.b * x0 + w.w1 * x1
                                     + w.w2 * x2 + w.w3 * x3))) AS p
        FROM feats, {prev} w),
    metrics AS MATERIALIZED (
        SELECT round(avg(CASE WHEN (p > 0.5) = (y = 1.0)
                              THEN 1.0 ELSE 0.0 END), 6) AS acc,
               round(-avg(y * ln(p) + (1.0 - y) * ln(1.0 - p)), 6) AS ll
        FROM scored)"""
    )
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT 'bias' AS term, round(b, 6) AS value FROM {prev}
    UNION ALL SELECT 'w_chars', round(w1, 6) FROM {prev}
    UNION ALL SELECT 'w_tokens', round(w2, 6) FROM {prev}
    UNION ALL SELECT 'w_wordlen', round(w3, 6) FROM {prev}
    UNION ALL SELECT 'train_accuracy', acc FROM metrics
    UNION ALL SELECT 'log_loss', ll FROM metrics"""
    )


@register("corpus_quality_logreg", oracle=_logreg_oracle())
def corpus_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed logistic-regression training — a quality/domain
    classifier of the kind corpus pipelines fit for filtering (here:
    predict lang='en' from length statistics; the point is the
    TRAINING harness, not the toy target). Batch gradient descent,
    5 steps, lr=1.0, on three scaled features + bias.

    This is textbook data-parallel GD, the shape MLlib's optimizers
    use: per step, ONE aggregation computes the 4 gradient means with
    the current weights folded in as literals (map-side partials, no
    per-row state), the 4-double gradient is collected, and the driver
    updates the weight vector — 5 full-data passes total, each pass
    embarrassingly parallel, nothing driver-side ever scales with
    data. Weights are rounded at 9dp after every step so the SQL
    oracle's sigmoid passes stay bit-synchronized with Spark's (libm
    exp() can differ in the last ulp per row; the per-step rounding
    stops any compounding). Final report: 6dp weights, train
    accuracy, log loss."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    feats = docs.select(
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("n_chars") / 1000.0).alias("x1"),
        (ntok / 100.0).alias("x2"),
        ((F.col("n_chars") / ntok) / 10.0).alias("x3"),
    ).localCheckpoint()
    w = [0.0, 0.0, 0.0, 0.0]
    for _ in range(_LOGREG_STEPS):
        z = (
            F.lit(w[0]) * F.col("x0")
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
        )
        p = 1.0 / (1.0 + F.exp(-z))
        g = feats.agg(
            *[
                F.avg((p - F.col("y")) * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(4)
            ]
        ).first()
        w = [round(w[j] - _LOGREG_LR * g[f"g{j}"], 9) for j in range(4)]
    z = (
        F.lit(w[0]) * F.col("x0")
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )
    p = 1.0 / (1.0 + F.exp(-z))
    m = feats.agg(
        F.round(
            F.avg(
                F.when((p > 0.5) == (F.col("y") == 1.0), 1.0).otherwise(0.0)
            ),
            6,
        ).alias("acc"),
        F.round(
            -F.avg(F.col("y") * F.log(p) + (1.0 - F.col("y")) * F.log(1.0 - p)), 6
        ).alias("ll"),
    ).first()
    rows = [
        ("bias", round(w[0], 6)),
        ("w_chars", round(w[1], 6)),
        ("w_tokens", round(w[2], 6)),
        ("w_wordlen", round(w[3], 6)),
        ("train_accuracy", m["acc"]),
        ("log_loss", m["ll"]),
    ]
    return spark.createDataFrame(rows, "term string, value double")


@register(
    "corpus_quality_stump",
    oracle="""
    WITH spine AS MATERIALIZED (
        SELECT n_chars AS v, count(*) AS cnt,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS pos
        FROM documents GROUP BY n_chars),
    cum AS MATERIALIZED (
        SELECT v,
               sum(cnt) OVER (ORDER BY v) AS nl,
               sum(pos) OVER (ORDER BY v) AS posl,
               (SELECT sum(cnt) FROM spine) AS n,
               (SELECT sum(pos) FROM spine) AS npos
        FROM spine),
    cand AS MATERIALIZED (
        SELECT v, nl, posl, n - nl AS nr, npos - posl AS posr, n, npos,
               round((nl * (1.0 - pow(posl * 1.0 / nl, 2)
                                - pow((nl - posl) * 1.0 / nl, 2))
                      + (n - nl) * (1.0 - pow((npos - posl) * 1.0 / (n - nl), 2)
                                        - pow(((n - nl) - (npos - posl)) * 1.0
                                              / (n - nl), 2)))
                     / n, 9) AS gini
        FROM cum WHERE nl < n),
    best AS MATERIALIZED (
        SELECT * FROM cand ORDER BY gini, v LIMIT 1)
    SELECT 'n_chars' AS feature,
           CAST(v AS BIGINT) AS threshold,
           round(gini, 6) AS gini,
           CASE WHEN posl * 2 >= nl THEN 'en' ELSE 'other' END AS left_majority,
           CASE WHEN posr * 2 >= nr THEN 'en' ELSE 'other' END AS right_majority,
           round((greatest(posl, nl - posl) + greatest(posr, nr - posr))
                 * 1.0 / n, 6) AS accuracy
    FROM best
    """,
)
def corpus_quality_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump training — the exact single-split CART step
    (and the weak learner boosting stacks on): find the n_chars
    threshold minimizing weighted Gini impurity for the lang='en'
    target, report the split, per-side majority labels, and
    majority-vote accuracy. Completes the tiny trained-model family
    next to corpus_quality_logreg (linear) — between them the corpus
    gets both classifier shapes pipelines actually fit for filtering.

    Exact threshold enumeration the distributed way: ONE value-grain
    aggregation (distinct n_chars values with class counts), a
    prefix-sum window over that value spine (bounded by the feature's
    DOMAIN, ~hundreds of values, never by row count — the same
    distinct-grain argument as stat_kruskal_wallis' midranks), then an
    argmin with 9dp-rounded impurity and smallest-value tie-break so
    both engines pick the same split deterministically. At 100 TB the
    heavy stage is the first aggregation; everything after runs on the
    domain-sized spine."""
    docs = load(spark, sf_dir, "documents")
    spine = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pos"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = spine.agg(
        F.sum("cnt").alias("n"), F.sum("pos").alias("npos")
    )
    cum = (
        spine.select(
            "v",
            F.sum("cnt").over(w).alias("nl"),
            F.sum("pos").over(w).alias("posl"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.col("nl") < F.col("n"))
    )
    nr = F.col("n") - F.col("nl")
    posr = F.col("npos") - F.col("posl")
    gl = (
        1.0
        - F.pow(F.col("posl") / F.col("nl"), 2)
        - F.pow((F.col("nl") - F.col("posl")) / F.col("nl"), 2)
    )
    gr = 1.0 - F.pow(posr / nr, 2) - F.pow((nr - posr) / nr, 2)
    cand = cum.select(
        "v",
        "nl",
        "posl",
        nr.alias("nr"),
        posr.alias("posr"),
        "n",
        F.round((F.col("nl") * gl + nr * gr) / F.col("n"), 9).alias("gini"),
    )
    best = cand.orderBy("gini", "v").limit(1)
    return best.select(
        F.lit("n_chars").alias("feature"),
        F.col("v").cast("long").alias("threshold"),
        F.round("gini", 6).alias("gini"),
        F.when(F.col("posl") * 2 >= F.col("nl"), "en")
        .otherwise("other")
        .alias("left_majority"),
        F.when(F.col("posr") * 2 >= F.col("nr"), "en")
        .otherwise("other")
        .alias("right_majority"),
        F.round(
            (
                F.greatest("posl", F.col("nl") - F.col("posl"))
                + F.greatest("posr", F.col("nr") - F.col("posr"))
            )
            / F.col("n"),
            6,
        ).alias("accuracy"),
    )


_SHUFFLE_EPOCHS = 2


@register(
    "corpus_shuffle_epochs",
    oracle=f"""
    WITH e AS MATERIALIZED (SELECT unnest(range({_SHUFFLE_EPOCHS})) AS epoch),
    keyed AS MATERIALIZED (
        SELECT e.epoch, d.doc_id,
               md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR))
                   AS k
        FROM documents d, e)
    SELECT CAST(epoch AS INT) AS epoch, doc_id,
           CAST(row_number() OVER (PARTITION BY epoch
                                   ORDER BY k, doc_id) AS BIGINT) AS position
    FROM keyed
    """,
)
def corpus_shuffle_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffling — the reproducibility primitive
    training pipelines need: each epoch's document order is the rank of
    md5(epoch || ':' || doc_id), so the permutation is (a) different
    per epoch, (b) identical across reruns, resharding, and engines
    (content-addressed, no RNG state), and (c) resumable from any
    position because position is a pure function of (epoch, doc_id).

    Per epoch the order materializes through the global_rank scaffold:
    ONE range-partition shuffle on the md5 key + a P-row offset table —
    never an Exchange SinglePartition over data (the plan-ratchet
    class every other global ordering in this repo uses). Epochs
    concatenate by union, so the whole schedule is E embarrassingly
    independent passes."""
    from basis_spark.operators.windows import global_rank

    docs = load(spark, sf_dir, "documents").select("doc_id")
    outs = []
    for e in range(_SHUFFLE_EPOCHS):
        keyed = docs.select(
            F.lit(e).cast("int").alias("epoch"),
            "doc_id",
            F.md5(F.concat(F.lit(f"{e}:"), F.col("doc_id").cast("string"))).alias(
                "k"
            ),
        )
        outs.append(
            global_rank(keyed, "k", "doc_id").select(
                "epoch", "doc_id", F.col("rank").cast("long").alias("position")
            )
        )
    out = outs[0]
    for nxt in outs[1:]:
        out = out.unionByName(nxt)
    return out


@register(
    "eval_retrieval_recall_at_k",
    oracle=f"""
    WITH cls AS (SELECT label, count(*) AS n_label FROM embeddings GROUP BY 1),
    d AS (
      SELECT q.vec_id AS q_vec_id, q.label AS q_label,
             e.vec_id AS vec_id, e.label AS label,
             round(list_sum(list_transform(list_zip(e.embedding, q.embedding),
                   x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS cos
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 20),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
                                       ORDER BY cos DESC, vec_id) AS rn FROM d)
    SELECT r.q_vec_id, r.q_label,
           CAST(cls.n_label - 1 AS BIGINT) AS n_relevant,
           round(CAST(sum(CASE WHEN r.label = r.q_label THEN 1 ELSE 0 END)
                      AS DOUBLE) / (cls.n_label - 1), 6) AS r_at_{EVAL_K}
    FROM r JOIN cls ON cls.label = r.q_label
    WHERE r.rn <= {EVAL_K} GROUP BY r.q_vec_id, r.q_label, cls.n_label
    """,
)
def eval_retrieval_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k — the retrieval metric precision@k cannot substitute
    for when classes are larger than k: hits in the top-k divided by
    the TOTAL number of relevant items (same-label vectors excluding
    the query), so a perfect top-k against a 50-vector class still
    reads ~0.2 and index-quality regressions show up as recall drops
    even while precision stays saturated.

    Same scale shape as precision@k: the bounded query set broadcasts
    (BroadcastNestedLoopJoin on the != guard — never a shuffle
    cartesian), ranking is per-query WindowGroupLimit, and the class
    sizes are a |labels|-row broadcast. Cosines round to 6dp BEFORE
    ranking so rank order is engine-stable; ties break on vec_id."""
    emb = load(spark, sf_dir, "embeddings")
    cls = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_label"))
        .withColumnRenamed("label", "label_cls")
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qe"),
    )
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("q_vec_id"))
        .select("q_vec_id", "q_label", "vec_id", "label", F.round(dot, 6).alias("cos"))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    hit = F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= EVAL_K)
        .join(F.broadcast(cls), F.col("label_cls") == F.col("q_label"))
        .groupBy("q_vec_id", "q_label", "n_label")
        .agg(hit.alias("hits"))
        .select(
            "q_vec_id",
            "q_label",
            (F.col("n_label") - 1).cast("long").alias("n_relevant"),
            F.round(
                F.col("hits").cast("double") / (F.col("n_label") - 1), 6
            ).alias(f"r_at_{EVAL_K}"),
        )
    )


_DSIR_BUCKETS = 64
_DSIR_TARGET_LANG = "en"


@register(
    "corpus_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(('0x' || substring(md5(unnest(string_split(text, ' '))), 1, 8))
                  AS BIGINT) % {_DSIR_BUCKETS} AS bucket
      FROM documents),
    tgt AS (SELECT bucket, count(*) AS ct FROM tok
            WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY 1),
    raw AS (SELECT bucket, count(*) AS cr FROM tok GROUP BY 1),
    tot AS (SELECT (SELECT sum(ct) FROM tgt) AS t_t,
                   (SELECT sum(cr) FROM raw) AS t_r),
    rate AS (
      SELECT raw.bucket,
             ln((coalesce(tgt.ct, 0) + 1.0) / (tot.t_t + {_DSIR_BUCKETS}))
             - ln((raw.cr + 1.0) / (tot.t_r + {_DSIR_BUCKETS})) AS logratio
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot)
    SELECT tok.doc_id, tok.lang,
           round(sum(rate.logratio), 6) AS dsir_logweight,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM tok JOIN rate ON tok.bucket = rate.bucket
    GROUP BY 1, 2
    """,
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (the public
    "Data Selection via Importance Resampling" recipe): score every
    document by how much more likely its hashed-unigram features are
    under the target distribution (here: the '{en}' slice) than under
    the raw corpus — sum over token occurrences of
    log(p_target(bucket)/p_raw(bucket)) with add-1 smoothing over
    {64} md5 hash buckets. High-weight documents are the ones
    importance resampling would keep to steer a 100 TB crawl toward
    the target domain.

    Scale: one token explode feeds two bucket-count aggregates whose
    results are BUCKETS-row tables; totals are a 1-row cross into
    that metadata-sized rate table, which then BROADCASTS back onto
    the token stream (map-side lookup), leaving one doc_id shuffle
    for the per-doc sum. Nothing data-sized is ever collected,
    sorted globally, or joined unbroadcast. Hashing is md5-prefix
    (engine-portable, no RNG), so weights are rerun/reshard-stable."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")
        % _DSIR_BUCKETS
    )
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("word")
    ).select("doc_id", "lang", bucket.alias("bucket"))
    # Both bucket histograms in ONE aggregate over the token stream
    # (guide §1.2/§2.3: the raw and target counts rode separate scans —
    # with the totals, FOUR passes over the exploded tokens; a
    # conditional count folds them into one). Identical arithmetic:
    # target buckets are a subset of raw buckets, and a bucket with no
    # target tokens counts ct = 0 exactly where the old left join
    # coalesced NULL to 0. The BUCKETS-row result is checkpointed so
    # the totals cross and the rate table read it instead of re-running
    # the pass.
    br = (
        tok.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(
                F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("ct"),
        )
        .localCheckpoint(eager=False)
    )
    tot = br.agg(F.sum("cr").alias("t_r"), F.sum("ct").alias("t_t"))
    rate = (
        br.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            (
                F.log((F.col("ct") + 1.0) / (F.col("t_t") + _DSIR_BUCKETS))
                - F.log((F.col("cr") + 1.0) / (F.col("t_r") + _DSIR_BUCKETS))
            ).alias("logratio"),
        )
    )
    return (
        tok.join(F.broadcast(rate), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(F.sum("logratio"), 6).alias("dsir_logweight"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )


@register(
    "eval_bleu_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM documents),
    ref AS (
      SELECT lang, source, min(doc_id) AS ref_id FROM d GROUP BY 1, 2),
    uni AS (
      SELECT doc_id, unnest(toks) AS g FROM d),
    bi AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1])) AS g
      FROM d),
    uc AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
    bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
    cand AS (
      SELECT d.doc_id, d.lang, d.source, r.ref_id,
             len(d.toks) AS c1, len(d.toks) - 1 AS c2
      FROM d JOIN ref r ON d.lang = r.lang AND d.source = r.source
      WHERE d.doc_id <> r.ref_id),
    clip1 AS (
      SELECT cand.doc_id, sum(least(a.c, b.c)) AS clip
      FROM cand JOIN uc a ON a.doc_id = cand.doc_id
                JOIN uc b ON b.doc_id = cand.ref_id AND b.g = a.g
      GROUP BY 1),
    clip2 AS (
      SELECT cand.doc_id, sum(least(a.c, b.c)) AS clip
      FROM cand JOIN bc a ON a.doc_id = cand.doc_id
                JOIN bc b ON b.doc_id = cand.ref_id AND b.g = a.g
      GROUP BY 1),
    rlen AS (SELECT doc_id AS ref_id, len(toks) AS r_len FROM d),
    m AS (
      SELECT cand.doc_id, cand.lang, cand.source, cand.c1, cand.c2,
             rlen.r_len,
             coalesce(clip1.clip, 0) AS k1, coalesce(clip2.clip, 0) AS k2
      FROM cand JOIN rlen ON rlen.ref_id = cand.ref_id
      LEFT JOIN clip1 ON clip1.doc_id = cand.doc_id
      LEFT JOIN clip2 ON clip2.doc_id = cand.doc_id)
    SELECT doc_id, lang, source,
           round(CAST(k1 AS DOUBLE) / c1, 6) AS p1,
           round((k2 + 1.0) / (c2 + 1.0), 6) AS p2_smooth,
           round(least(1.0, exp(1.0 - CAST(r_len AS DOUBLE) / c1)), 6) AS bp,
           CASE WHEN k1 = 0 THEN 0.0
                ELSE round(least(1.0, exp(1.0 - CAST(r_len AS DOUBLE) / c1))
                           * exp(0.5 * (ln(CAST(k1 AS DOUBLE) / c1)
                                        + ln((k2 + 1.0) / (c2 + 1.0)))), 6)
           END AS bleu2
    FROM m
    """,
)
def eval_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-internal BLEU-2 (the public Papineni et al. metric with
    Lin-Och add-one smoothing on the bigram precision): every document
    scores against its (lang, source) group's reference — the min
    doc_id member, the shape of a generation-eval table where each
    task has one reference and many candidates. Emits clipped unigram
    precision p1, smoothed bigram precision p2, brevity penalty, and
    the combined bleu2 = bp * sqrt(p1 * p2) (zero when no unigram
    overlaps, where the log-space mean is undefined).

    Scale: n-gram counts are one explode + (doc, gram) agg; clipping
    joins candidate counts against ONLY the reference rows (a
    groups-sized slice, broadcastable at any corpus size since
    references are one doc per group); everything downstream is
    per-doc map-side arithmetic. All precisions derive from integer
    ratios, so both engines see bit-identical doubles before the one
    6dp output rounding."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.split("text", " ").alias("toks")
    )
    ref = d.groupBy("lang", "source").agg(F.min("doc_id").alias("ref_id"))
    uni = d.select("doc_id", F.explode("toks").alias("g"))
    bi = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 1),"
                " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
            )
        ).alias("g"),
    )
    uc = uni.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    bc = bi.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    cand = (
        d.join(F.broadcast(ref), ["lang", "source"])
        .filter(F.col("doc_id") != F.col("ref_id"))
        .select(
            "doc_id",
            "lang",
            "source",
            "ref_id",
            F.size("toks").alias("c1"),
            (F.size("toks") - 1).alias("c2"),
        )
    )

    def clipped(counts: DataFrame) -> DataFrame:
        a = counts.select(
            F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("ca")
        )
        b = counts.select(
            F.col("doc_id").alias("rid"), "g", F.col("c").alias("cb")
        )
        return (
            cand.select("doc_id", "ref_id")
            .join(a, F.col("doc_id") == F.col("cand_id"))
            .join(
                F.broadcast(b),
                (F.col("rid") == F.col("ref_id")) & (a["g"] == b["g"]),
            )
            .groupBy("doc_id")
            .agg(F.sum(F.least("ca", "cb")).alias("clip"))
        )
    k1 = clipped(uc).withColumnRenamed("clip", "k1")
    k2 = clipped(bc).withColumnRenamed("clip", "k2")
    rlen = d.select(F.col("doc_id").alias("ref_id"), F.size("toks").alias("r_len"))
    m = (
        cand.join(F.broadcast(rlen), "ref_id")
        .join(k1, "doc_id", "left")
        .join(k2, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            "c1",
            "c2",
            "r_len",
            F.coalesce("k1", F.lit(0)).alias("k1"),
            F.coalesce("k2", F.lit(0)).alias("k2"),
        )
    )
    p1 = F.col("k1").cast("double") / F.col("c1")
    p2 = (F.col("k2") + 1.0) / (F.col("c2") + 1.0)
    bp = F.least(F.lit(1.0), F.exp(1.0 - F.col("r_len").cast("double") / F.col("c1")))
    return m.select(
        "doc_id",
        "lang",
        "source",
        F.round(p1, 6).alias("p1"),
        F.round(p2, 6).alias("p2_smooth"),
        F.round(bp, 6).alias("bp"),
        F.when(F.col("k1") == 0, F.lit(0.0))
        .otherwise(F.round(bp * F.exp(0.5 * (F.log(p1) + F.log(p2))), 6))
        .alias("bleu2"),
    )


@register(
    "eval_rouge1_pairs",
    oracle="""
    WITH d AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS toks FROM documents),
    ref AS (
      SELECT lang, source, min(doc_id) AS ref_id FROM d GROUP BY 1, 2),
    uni AS (SELECT doc_id, unnest(toks) AS g FROM d),
    uc AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
    cand AS (
      SELECT d.doc_id, d.lang, d.source, r.ref_id, len(d.toks) AS c_len
      FROM d JOIN ref r ON d.lang = r.lang AND d.source = r.source
      WHERE d.doc_id <> r.ref_id),
    rlen AS (SELECT doc_id AS ref_id, len(toks) AS r_len FROM d),
    overlap AS (
      SELECT cand.doc_id, sum(least(a.c, b.c)) AS ov
      FROM cand JOIN uc a ON a.doc_id = cand.doc_id
                JOIN uc b ON b.doc_id = cand.ref_id AND b.g = a.g
      GROUP BY 1)
    SELECT cand.doc_id, cand.lang, cand.source,
           round(coalesce(overlap.ov, 0) / CAST(rlen.r_len AS DOUBLE), 6)
               AS rouge1_recall,
           round(coalesce(overlap.ov, 0) / CAST(cand.c_len AS DOUBLE), 6)
               AS rouge1_precision,
           CASE WHEN coalesce(overlap.ov, 0) = 0 THEN 0.0
                ELSE round(2.0 * coalesce(overlap.ov, 0)
                           / (rlen.r_len + cand.c_len), 6) END AS rouge1_f1
    FROM cand JOIN rlen ON rlen.ref_id = cand.ref_id
    LEFT JOIN overlap ON overlap.doc_id = cand.doc_id
    """,
)
def eval_rouge1_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 (the public Lin 2004 recall-oriented summary metric)
    over the same candidate/reference pairing as eval_bleu_pairs:
    clipped unigram overlap divided by the REFERENCE length (recall —
    what ROUGE exists for, where BLEU divides by the candidate),
    plus precision and the F1 that the 2*ov/(|r|+|c|) identity gives
    for clipped-count overlap. Reporting BLEU and ROUGE side by side
    on the same pairs is the standard generation-eval table.

    Scale: identical posture to eval_bleu_pairs — one unigram explode
    and (doc, gram) agg; the clipping join touches only the
    one-doc-per-group reference slice (broadcastable at any corpus
    size); everything downstream is per-doc arithmetic on integer
    ratios (bit-identical doubles before the 6dp output rounding)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.split("text", " ").alias("toks")
    )
    ref = d.groupBy("lang", "source").agg(F.min("doc_id").alias("ref_id"))
    uni = d.select("doc_id", F.explode("toks").alias("g"))
    uc = uni.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    cand = (
        d.join(F.broadcast(ref), ["lang", "source"])
        .filter(F.col("doc_id") != F.col("ref_id"))
        .select("doc_id", "lang", "source", "ref_id", F.size("toks").alias("c_len"))
    )
    a = uc.select(F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("ca"))
    b = uc.select(F.col("doc_id").alias("rid"), "g", F.col("c").alias("cb"))
    overlap = (
        cand.select("doc_id", "ref_id")
        .join(a, F.col("doc_id") == F.col("cand_id"))
        .join(F.broadcast(b), (F.col("rid") == F.col("ref_id")) & (a["g"] == b["g"]))
        .groupBy("doc_id")
        .agg(F.sum(F.least("ca", "cb")).alias("ov"))
    )
    rlen = d.select(F.col("doc_id").alias("ref_id"), F.size("toks").alias("r_len"))
    m = (
        cand.join(F.broadcast(rlen), "ref_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id", "lang", "source", "c_len", "r_len",
            F.coalesce("ov", F.lit(0)).alias("ov"),
        )
    )
    return m.select(
        "doc_id",
        "lang",
        "source",
        F.round(F.col("ov") / F.col("r_len").cast("double"), 6).alias("rouge1_recall"),
        F.round(F.col("ov") / F.col("c_len").cast("double"), 6).alias("rouge1_precision"),
        F.when(F.col("ov") == 0, F.lit(0.0))
        .otherwise(F.round(2.0 * F.col("ov") / (F.col("r_len") + F.col("c_len")), 6))
        .alias("rouge1_f1"),
    )


@register(
    "corpus_filter_ablation",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS nw,
             round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS mwl,
             len(list_filter(string_split(text, ' '),
                  t -> list_contains(['the','a','of','to','and','in','is'], t)))
                 AS stop_hits,
             round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS ttr
      FROM documents),
    f AS (
      SELECT doc_id,
             NOT (nw BETWEEN 20 AND 90) AS f_len,
             NOT (mwl >= 3.8 AND mwl <= 5.1) AS f_mwl,
             (stop_hits < 1) AS f_stop,
             (ttr < 0.3) AS f_ttr,
             NOT (n_chars BETWEEN 100 AND 450) AS f_band
      FROM s),
    u AS (
      SELECT 'len' AS filter_name, f_len AS fires,
             (f_len AND NOT f_mwl AND NOT f_stop AND NOT f_ttr AND NOT f_band) AS unique_fire FROM f
      UNION ALL
      SELECT 'mwl', f_mwl,
             (f_mwl AND NOT f_len AND NOT f_stop AND NOT f_ttr AND NOT f_band) FROM f
      UNION ALL
      SELECT 'stop', f_stop,
             (f_stop AND NOT f_len AND NOT f_mwl AND NOT f_ttr AND NOT f_band) FROM f
      UNION ALL
      SELECT 'ttr', f_ttr,
             (f_ttr AND NOT f_len AND NOT f_mwl AND NOT f_stop AND NOT f_band) FROM f
      UNION ALL
      SELECT 'band', f_band,
             (f_band AND NOT f_len AND NOT f_mwl AND NOT f_stop AND NOT f_ttr) FROM f)
    SELECT filter_name,
           CAST(sum(CASE WHEN fires THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
           CAST(sum(CASE WHEN unique_fire THEN 1 ELSE 0 END) AS BIGINT)
               AS n_uniquely_rejected,
           round(sum(CASE WHEN fires THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS rejection_share
    FROM u GROUP BY 1
    """,
)
def corpus_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-ablation report — the table a curation review reads
    before changing a quality stack: for each of the five document
    filters (the four Gopher rules plus the length-band filter), how
    many documents it rejects TOTAL and how many it is the ONLY
    filter to reject (its unique marginal value). A filter whose
    unique-rejection count is ~0 is redundant and can be dropped
    without changing the surviving corpus; one with a large unique
    mass deserves its own precision audit before shipping.

    Scale: one scan computes every per-doc signal map-side; the
    5-way unpivot is a row expansion by a CONSTANT factor feeding one
    filter-keyed agg (map-side combinable, 5-row result). Same
    6dp-rounded-signal discipline as text_gopher_quality_rules so
    fire/not-fire can't flip between engines."""
    from basis_spark.operators.llm import (
        _GOPHER_MAX_WORDS,
        _GOPHER_MIN_STOP_HITS,
        _GOPHER_MIN_TTR,
        _GOPHER_MIN_WORDS,
        _GOPHER_MWL_HI,
        _GOPHER_MWL_LO,
        _GOPHER_STOPWORDS,
    )

    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in _GOPHER_STOPWORDS])
    mwl = F.round(
        F.length(F.regexp_replace("text", " ", "")).cast("double") / F.size(toks), 6
    )
    ttr = F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 6)
    f = docs.select(
        (~F.size(toks).between(_GOPHER_MIN_WORDS, _GOPHER_MAX_WORDS)).alias("f_len"),
        (~((mwl >= _GOPHER_MWL_LO) & (mwl <= _GOPHER_MWL_HI))).alias("f_mwl"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
            < _GOPHER_MIN_STOP_HITS
        ).alias("f_stop"),
        (ttr < _GOPHER_MIN_TTR).alias("f_ttr"),
        (~F.col("n_chars").between(100, 450)).alias("f_band"),
    )
    names = ["len", "mwl", "stop", "ttr", "band"]
    cols = ["f_len", "f_mwl", "f_stop", "f_ttr", "f_band"]
    u = None
    for name, col in zip(names, cols):
        others = [c for c in cols if c != col]
        uniq = F.col(col)
        for c in others:
            uniq = uniq & ~F.col(c)
        part = f.select(
            F.lit(name).alias("filter_name"),
            F.col(col).alias("fires"),
            uniq.alias("unique_fire"),
        )
        u = part if u is None else u.unionAll(part)
    return u.groupBy("filter_name").agg(
        F.sum(F.when(F.col("fires"), 1).otherwise(0)).cast("long").alias("n_rejected"),
        F.sum(F.when(F.col("unique_fire"), 1).otherwise(0))
        .cast("long")
        .alias("n_uniquely_rejected"),
        F.round(
            F.sum(F.when(F.col("fires"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("rejection_share"),
    )


_BATCH_B = 16


@register(
    "corpus_length_batching_waste",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
    ranked AS (
      SELECT doc_id, n_tok,
             (row_number() OVER (ORDER BY n_tok, doc_id) - 1) // {_BATCH_B}
                 AS batch_sorted,
             (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 32) AS batch_random
      FROM d),
    s AS (
      SELECT 'length_sorted' AS strategy, batch_sorted AS batch_id,
             count(*) AS n_docs, max(n_tok) AS max_tok, sum(n_tok) AS sum_tok
      FROM ranked GROUP BY 2
      UNION ALL
      SELECT 'hash_random', batch_random,
             count(*), max(n_tok), sum(n_tok)
      FROM ranked GROUP BY 2)
    SELECT strategy,
           CAST(count(*) AS BIGINT) AS n_batches,
           CAST(sum(n_docs * max_tok) AS BIGINT) AS padded_tokens,
           CAST(sum(sum_tok) AS BIGINT) AS real_tokens,
           round(1.0 - sum(sum_tok) / CAST(sum(n_docs * max_tok) AS DOUBLE), 6)
               AS padding_waste
    FROM s GROUP BY 1
    """,
)
def corpus_length_batching_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-sorted batching vs random batching — the padding-waste
    accounting behind every inference/training server's bucketing
    decision: a batch pads every sequence to its longest member, so
    sorting by length before batching (batch = rank // B) collapses
    the waste that content-hash 'random' batches pay. Emits, per
    strategy, the padded vs real token mass and the waste fraction —
    the number that justifies adding a sort stage to a serving
    pipeline (the pytest pins sorted-waste < random-waste).

    Scale: the length-sorted rank at 100 TB rides the global_rank
    scaffold (this form's window over the doc-grain table is the
    sf-bounded stand-in, declared single-partition); the random
    strategy is a pure map-side hash. Both fold to |batches|-row
    aggregates then a 2-row summary."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = Window.orderBy("n_tok", "doc_id")
    ranked = d.select(
        "doc_id",
        "n_tok",
        ((F.row_number().over(w) - 1) / _BATCH_B).cast("long").alias("batch_sorted"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long")
            % 32
        ).alias("batch_random"),
    )

    def fold(batch_col: str, name: str) -> DataFrame:
        return (
            ranked.groupBy(batch_col)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.max("n_tok").alias("max_tok"),
                F.sum("n_tok").alias("sum_tok"),
            )
            .agg(
                F.lit(name).alias("strategy"),
                F.count(F.lit(1)).cast("long").alias("n_batches"),
                F.sum(F.col("n_docs") * F.col("max_tok")).cast("long").alias("padded_tokens"),
                F.sum("sum_tok").cast("long").alias("real_tokens"),
                F.round(
                    1.0
                    - F.sum("sum_tok")
                    / F.sum(F.col("n_docs") * F.col("max_tok")).cast("double"),
                    6,
                ).alias("padding_waste"),
            )
            .select("strategy", "n_batches", "padded_tokens", "real_tokens", "padding_waste")
        )

    return fold("batch_sorted", "length_sorted").unionAll(
        fold("batch_random", "hash_random")
    )
