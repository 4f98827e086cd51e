"""Tolerance tier (SURVEY.md §5.6): approximate/sampled operators are
never hash-matched — bounded-error asserts only."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.operators import llm, multimodal, scalars
from basis_spark.operators.aggregates import agg_approx_distinct
from basis_spark.operators.llm import similarity_ann_ivf, similarity_topk
from tests.conftest import SF_ORACLE, record_tolerance


def test_approx_distinct_within_5pct(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in agg_approx_distinct(spark, SF_ORACLE).collect()
    }
    exact = {
        r["event_type"]: r["u"]
        for r in load(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    worst = max(abs(approx[et] - ex) / ex for et, ex in exact.items())
    record_tolerance("agg_approx_distinct", "max relative error vs exact countDistinct", 0.05, round(worst, 6))
    for et, ex in exact.items():
        assert abs(approx[et] - ex) / ex <= 0.05, (et, approx[et], ex)


def test_sample_fraction_binomial_bounds(spark):
    n_total = load(spark, SF_ORACLE, "lineitem").count()
    n_sample = scalars.sample_fraction(spark, SF_ORACLE).count()
    p = 0.1
    mean = n_total * p
    sd = math.sqrt(n_total * p * (1 - p))
    record_tolerance("sample_fraction", "sample-size deviation in binomial sigmas", 6.0, round(abs(n_sample - mean) / sd, 4))
    assert abs(n_sample - mean) <= 6 * sd, (n_sample, mean, sd)


def test_approx_quantile_tolerance(spark):
    row = scalars.approx_quantile(spark, SF_ORACLE).collect()[0]
    exact = (
        load(spark, SF_ORACLE, "orders")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        )
        .collect()[0]
    )
    worst = max(
        abs(row["ap50"] - exact["p50"]) / exact["p50"],
        abs(row["ap90"] - exact["p90"]) / exact["p90"],
    )
    record_tolerance("approx_quantile", "max relative error vs exact percentile (p50,p90)", 0.02, round(worst, 6))
    assert abs(row["ap50"] - exact["p50"]) / exact["p50"] <= 0.02
    assert abs(row["ap90"] - exact["p90"]) / exact["p90"] <= 0.02


def test_ann_ivf_exact_within_probed_partitions(spark):
    """The sf0.01 embeddings are barely clustered (max cosine ≈ 0.37, true
    neighbors span ~8 labels), so a recall-vs-brute bound would test the
    fixture, not the operator. Instead verify the IVF machinery: the
    result must equal exact brute-force top-10 restricted to the probed
    partitions, and overall recall is still sane (>0)."""
    ivf_rows = similarity_ann_ivf(spark, SF_ORACLE).collect()
    probed_labels = {r["label"] for r in ivf_rows}
    assert len(probed_labels) <= 2  # nprobe = 2 coarse cells

    emb = load(spark, SF_ORACLE, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qe"))
    dot = F.expr(
        "aggregate(zip_with(embedding, qe,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (s, v) -> s + v)"
    )
    exact_in_probed = (
        emb.filter(F.col("label").isin(list(probed_labels)) & (F.col("vec_id") != 0))
        .join(F.broadcast(q))
        .select("vec_id", F.round(dot, 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    n_agree = sum(
        a == b
        for a, b in zip(
            [r["vec_id"] for r in ivf_rows], [r["vec_id"] for r in exact_in_probed]
        )
    )
    record_tolerance("similarity_ann_ivf", "top-10 positions agreeing with exact-within-probed-cells", 10, n_agree, direction="ge")
    assert [r["vec_id"] for r in ivf_rows] == [r["vec_id"] for r in exact_in_probed]

    brute = {r["vec_id"] for r in similarity_topk(spark, SF_ORACLE).collect()}
    assert len(brute & {r["vec_id"] for r in ivf_rows}) > 0


def test_minhash_candidates_have_full_recall(spark):
    # LSH only prunes; with 16 hash tables every >0.9 pair must survive.
    exact = llm._exact_jaccard_pairs(
        load(spark, SF_ORACLE, "documents")
    ).filter(F.col("jac") > 0.9)
    exact_pairs = {(r["i"], r["j"]) for r in exact.orderBy("i", "j").limit(100).collect()}
    lsh_pairs = {
        (r["i"], r["j"]) for r in llm.dedup_near_minhash(spark, SF_ORACLE).collect()
    }
    assert exact_pairs == lsh_pairs


def test_minhash_prefilter_selectivity(spark):
    """The exact re-rank must run on a near-threshold candidate set, not
    the raw band-collision blowup (VERDICT r1: on this near-dup-dense
    corpus ~half of all same-lang pairs collide in some band). Candidates
    after the band-count prefilter must stay well
    below the quadratic pair count, and every one must be >= jac ~0.75 —
    a regression here shows up as bench wall-time, so pin it in a test."""
    n_docs = load(spark, SF_ORACLE, "documents").count()
    n_cand = llm._minhash_candidates(spark, SF_ORACLE).count()
    quadratic = n_docs * (n_docs - 1) // 2
    # Measured at sf0.01: 8055 candidates of 124750 possible pairs (6.5%),
    # vs ~50% band-collision rate with no count filter. The corpus has
    # 12708 exact pairs > 0.7, so the >= 2-band cut tracks jac ~0.7+.
    assert n_cand < quadratic * 0.1, (n_cand, quadratic)
    n_above_07 = (
        llm._exact_jaccard_pairs(load(spark, SF_ORACLE, "documents"))
        .filter(F.col("jac") > 0.7)
        .count()
    )
    assert n_cand <= n_above_07 * 1.2, (n_cand, n_above_07)


def test_multimodal_fake_features_deterministic(spark):
    feats = (
        multimodal.attach_binary(load(spark, SF_ORACLE, "documents"))
        .select("doc_id", "payload", F.col("meta.mime").alias("mime"))
        .mapInPandas(multimodal._extract_batches, schema=multimodal.FEATURE_SCHEMA)
    )
    rows = {r["doc_id"]: r for r in feats.collect()}
    docs = {r["doc_id"]: r["text"] for r in load(spark, SF_ORACLE, "documents").collect()}
    # spot-check 5 docs: feature[0] = byte length, feature[1] = mean byte
    for doc_id in list(docs)[:5]:
        payload = docs[doc_id].encode("utf-8")
        expect = multimodal.fake_features(payload)
        assert rows[doc_id]["feat"] == expect
        assert rows[doc_id]["n_bytes"] == len(payload)


def test_ppm_codec_roundtrip():
    px = bytes(range(256))[:192]  # 8x8x3
    payload = multimodal.make_ppm(8, 8, px)
    assert multimodal.decode_ppm(payload) == (8, 8, px)
    # hostile header: tabs, comments, multiple spaces
    hostile = b"P6\n# comment line\n  8\t8\n# another\n255\n" + px
    assert multimodal.decode_ppm(hostile) == (8, 8, px)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="magic"):
        multimodal.decode_ppm(b"P5\n8 8\n255\n" + px)
    with _pytest.raises(ValueError, match="truncated"):
        multimodal.decode_ppm(multimodal.make_ppm(8, 8, px)[:-10])


def test_png_codec_roundtrip():
    """Real PNG codec: every filter type must reconstruct exactly. The
    encoder cycles filters per row (y % 5), so any h>=5 image covers
    None/Sub/Up/Average/Paeth; widths 1..3 exercise the bpp boundary
    (left-pixel references fall off the row start)."""
    import random

    rng = random.Random(42)
    for w, h in [(1, 1), (1, 6), (3, 5), (8, 8), (5, 7), (12, 2)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * 3))
        payload = multimodal.make_png(w, h, px)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        assert multimodal.decode_png(payload) == (w, h, px), (w, h)
    import pytest as _pytest

    good = multimodal.make_png(4, 4, bytes(48))
    with _pytest.raises(ValueError, match="signature"):
        multimodal.decode_png(b"JFIF" + good)
    corrupt = bytearray(good)
    corrupt[30] ^= 0xFF  # inside IHDR data -> CRC must catch it
    with _pytest.raises(ValueError, match="CRC"):
        multimodal.decode_png(bytes(corrupt))
    with _pytest.raises(ValueError, match="truncated"):
        multimodal.decode_png(good[:-14])


def test_decode_image_dispatch():
    """decode_image routes PPM, PNG, and JPEG to the real codecs; a
    malformed payload under a known magic fails INSIDE the codec
    (ValueError), and unknown magic raises NotImplementedError."""
    px = bytes(range(192))
    assert multimodal.decode_image(multimodal.make_ppm(8, 8, px)) == (8, 8, px)
    assert multimodal.decode_image(multimodal.make_png(8, 8, px)) == (8, 8, px)
    from basis_spark.operators.jpeg import make_jpeg

    flat = bytes([200]) * 192
    w, h, rgb = multimodal.decode_image(make_jpeg(8, 8, flat))
    assert (w, h, len(rgb)) == (8, 8, 192)
    import pytest as _pytest

    with _pytest.raises(ValueError):  # JPEG magic, garbage body
        multimodal.decode_image(b"\xff\xd8\xff\xe0fakejpeg")
    with _pytest.raises(NotImplementedError, match="magic"):
        multimodal.decode_image(b"GIF89a not supported")


def test_multimodal_real_decode_branch():
    """extract_features takes the REAL decode branch for PPM payloads:
    channel means must equal the synthesized pixel arithmetic."""
    payload = multimodal.synth_ppm(7)
    f = multimodal.extract_features(payload, "image/x-portable-pixmap")
    assert f[:2] == [8.0, 8.0]
    expect = [
        round(sum((7 * 31 + i + c * 85) % 256 for i in range(64)) / 64, 6)
        for c in range(3)
    ]
    assert f[2:] == expect


def test_wav_codec_roundtrip():
    samples = multimodal.synth_wav_samples(42)
    payload = multimodal.make_wav(samples, rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    rate, n, got = multimodal.decode_wav(payload)
    assert (rate, n, got) == (8000, 64, samples)
    # mime dispatch takes the real audio branch
    f = multimodal.extract_features(payload, "audio/wav")
    assert f[:2] == [8000.0, 64.0]
    assert f[2] == round(sum(samples) / 64, 6)
    assert f[3] == float(sum(abs(s) for s in samples))


def test_sign_lsh_recall(spark):
    """similarity_topk_lsh must recover >= 80% of the brute-force top-10
    (measured 1.0 at sf0.01 / 0.9 at sf0.1 with the 12x4 banding)."""
    from basis_spark.operators.llm import similarity_topk_lsh

    bf = {r["vec_id"] for r in similarity_topk(spark, SF_ORACLE).collect()}
    ls = {r["vec_id"] for r in similarity_topk_lsh(spark, SF_ORACLE).collect()}
    assert len(ls) == 10
    record_tolerance("similarity_topk_lsh", "recall of brute-force top-10", 0.8, len(bf & ls) / len(bf), direction="ge")
    assert len(bf & ls) / len(bf) >= 0.8


def test_hll_sketch_estimates_within_5pct(spark):
    from basis_spark.operators.aggregates import sketch_hll_distinct
    from basis_spark.io import load
    from pyspark.sql import functions as F

    est = {r["event_type"]: r["est_users"] for r in sketch_hll_distinct(spark, SF_ORACLE).collect()}
    ev = load(spark, SF_ORACLE, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact[None] = ev.select("user_id").distinct().count()
    assert set(est) == set(exact)
    record_tolerance("sketch_hll_distinct", "max relative error vs exact countDistinct", 0.05, round(max(abs(e - exact[k]) / exact[k] for k, e in est.items()), 6))
    for k, e in est.items():
        assert abs(e - exact[k]) / exact[k] < 0.05, (k, e, exact[k])


def test_stratified_sample_per_stratum_bounds(spark):
    """Each stratum's sample size must sit within 5-sigma binomial bounds
    of its target fraction, and rare classes must be kept whole."""
    from basis_spark.operators.scans import sample_stratified
    from basis_spark.io import load
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: r["n"]
        for r in sample_stratified(spark, SF_ORACLE)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    totals = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    fractions = {"click": 0.5, "view": 0.5, "purchase": 1.0, "signup": 1.0, "error": 1.0}
    worst_sigmas = 0.0
    for et, frac in fractions.items():
        n, mean = totals[et], totals[et] * frac
        if frac == 1.0:
            assert got[et] == n, (et, got[et], n)
        else:
            sigma = (n * frac * (1 - frac)) ** 0.5
            worst_sigmas = max(worst_sigmas, abs(got[et] - mean) / sigma)
            assert abs(got[et] - mean) <= 5 * sigma, (et, got[et], mean, sigma)
    record_tolerance("sample_stratified", "max per-stratum deviation in binomial sigmas (rare strata kept whole, asserted exact)", 5.0, round(worst_sigmas, 4))


def test_kll_quantiles_within_rank_error(spark):
    """Every KLL quantile estimate must sit within 2.5% RANK error of
    exact (k=200 guarantees ~1.7%): compare the estimated quantile's
    true rank against the requested rank."""
    from basis_spark.operators.aggregates import sketch_kll_quantiles

    got = {r.event_type: r for r in sketch_kll_quantiles(spark, SF_ORACLE).collect()}
    ev = load(spark, SF_ORACLE, "events").select("event_type", "value").toPandas()
    worst_rank_err = []
    for etype, row in got.items():
        vals = ev.value if etype is None else ev[ev.event_type == etype].value
        n = len(vals)
        for q, est in [(0.5, row.p50), (0.95, row.p95), (0.99, row.p99)]:
            true_rank = (vals <= est).sum() / n
            worst_rank_err.append(abs(true_rank - q))
            assert abs(true_rank - q) <= 0.025, (etype, q, est, true_rank)
    record_tolerance("sketch_kll_quantiles", "max rank error across groups x {p50,p95,p99}", 0.025, round(max(worst_rank_err), 6))


def test_theta_set_ops_within_5pct(spark):
    """Theta estimates (incl. intersection/difference, which have wider
    error than union) within 5% of exact distinct counts."""
    from basis_spark.operators.aggregates import sketch_theta_set_ops

    r = sketch_theta_set_ops(spark, SF_ORACLE).collect()[0]
    ev = load(spark, SF_ORACLE, "events")
    click = {x.user_id for x in ev.filter(F.col("event_type") == "click").select("user_id").distinct().collect()}
    buy = {x.user_id for x in ev.filter(F.col("event_type") == "purchase").select("user_id").distinct().collect()}
    exact = {
        "n_click": len(click), "n_purchase": len(buy),
        "n_union": len(click | buy), "n_intersect": len(click & buy),
        "n_click_only": len(click - buy),
    }
    worst = max(abs(getattr(r, k) - e) / max(e, 1) for k, e in exact.items())
    record_tolerance("sketch_theta_set_ops", "max relative error across union/intersect/difference estimates", 0.05, round(worst, 6))
    for k, e in exact.items():
        got = getattr(r, k)
        assert abs(got - e) <= max(2, 0.05 * e), (k, got, e)


def test_compression_ratio_matches_local_zlib(spark):
    """text_compression_ratio is deterministic: the Spark-side Arrow
    batches must produce exactly the ratio local zlib computes."""
    import zlib

    from basis_spark.operators.llm import text_compression_ratio

    got = {r.doc_id: r.ratio for r in text_compression_ratio(spark, SF_ORACLE).collect()}
    docs = load(spark, SF_ORACLE, "documents").select("doc_id", "text").limit(50).collect()
    worst = 0.0
    for row in docs:
        b = row.text.encode("utf-8")
        want = round(len(zlib.compress(b, 6)) / max(1, len(b)), 6)
        worst = max(worst, abs(got[row.doc_id] - want))
        assert got[row.doc_id] == want, (row.doc_id, got[row.doc_id], want)
    record_tolerance("text_compression_ratio", "max abs diff vs local zlib level-6 recompute (deterministic -> 0)", 0.0, worst)


def test_pca_gramian_matches_numpy(spark):
    """embeddings_pca_power (strict tier since r8, via the SQL
    matrix-squaring oracle): this independent algebraic check remains —
    the distributed-Gramian + local-eigh principal direction must align
    with a direct numpy eigendecomposition of X^T X to |cos| >= 0.9999."""
    import numpy as np
    import pyarrow.parquet as pq

    from basis_spark.registry import QUERIES
    from tests.conftest import SF_ORACLE

    out = QUERIES["embeddings_pca_power"](spark, SF_ORACLE).orderBy("d").collect()
    v = np.array([r["loading"] for r in out])
    X = np.array(
        pq.read_table(f"{SF_ORACLE}/embeddings.parquet").column("embedding").to_pylist()
    )
    _, V = np.linalg.eigh(X.T @ X)
    top = V[:, -1]
    assert len(out) == X.shape[1]
    cos = float(abs(v @ top) / np.linalg.norm(v))
    record_tolerance("embeddings_pca_power", "|cos| alignment of principal direction vs numpy eigh", 0.9999, round(cos, 8), direction="ge")
    assert abs(v @ top) / np.linalg.norm(v) >= 0.9999


def test_cosine_neardup_lsh_recall(spark):
    """dedup_cosine_neardup_lsh (rows-only tier): the banded-LSH pair
    set must recover >= 0.8 of the brute-force pairs at the same
    threshold, with no false positives (exact re-rank)."""
    from basis_spark.registry import QUERIES
    from tests.conftest import SF_ORACLE

    brute = {
        (r["i"], r["j"]) for r in QUERIES["dedup_cosine_neardup"](spark, SF_ORACLE).collect()
    }
    lsh = {
        (r["i"], r["j"])
        for r in QUERIES["dedup_cosine_neardup_lsh"](spark, SF_ORACLE).collect()
    }
    assert brute, "brute pair set is empty; recall vacuous"
    assert lsh <= brute, "exact re-rank must not admit false positives"
    record_tolerance("dedup_cosine_neardup_lsh", "recall of brute-force near-dup pairs (0 false positives asserted)", 0.8, round(len(lsh & brute) / len(brute), 6), direction="ge")
    assert len(lsh & brute) / len(brute) >= 0.8


def test_ann_ivf_kmeans_exact_within_probed_cells(spark):
    """similarity_ann_ivf_kmeans (strict since r8): same contract as the
    label-IVF test — the sf0.01 embeddings are barely clustered, so the
    machinery is verified instead of fixture geometry: the result must
    equal the exact brute-force top-10 restricted to the probed LEARNED
    cells, and Lloyd training must actually improve the quantizer (mean
    max-dot assignment score strictly above the hash-init centroids')."""
    import numpy as np
    import pyarrow.parquet as pq

    from basis_spark.registry import QUERIES
    from tests.conftest import SF_ORACLE

    rows = QUERIES["similarity_ann_ivf_kmeans"](spark, SF_ORACLE).collect()
    assert len(rows) == 10
    got = [(r["vec_id"], r["cos"]) for r in rows]

    # Recompute the same deterministic pipeline in numpy: md5-ordered
    # init (r8: switched from xxhash64 so the SQL oracle can replicate
    # it), 4 Lloyd iterations with 6dp-rounded max-dot assignment and
    # 9dp-rounded renormalized centroids (the operator's cross-engine
    # stabilizers), top-2 probe.
    import hashlib

    t = pq.read_table(f"{SF_ORACLE}/embeddings.parquet")
    X = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.array(t.column("vec_id").to_pylist())
    order = sorted(ids, key=lambda v: (hashlib.md5(str(int(v)).encode()).hexdigest(), int(v)))
    C0 = np.stack([X[ids == v][0] for v in order[:10]])
    C = C0.copy()
    for _ in range(4):
        a = np.round(X @ C.T, 6).argmax(1)
        C = np.stack([X[a == k].mean(0) if (a == k).any() else C[k] for k in range(10)])
        C = np.round(C / np.linalg.norm(C, axis=1, keepdims=True), 9)
    a = np.round(X @ C.T, 6).argmax(1)
    assert (X @ C.T).max(1).mean() > (X @ C0.T).max(1).mean(), "Lloyd did not improve"
    q = X[ids == 0][0]
    probe = np.argsort(-np.round(C @ q, 6), kind="stable")[:2]
    cand = np.isin(a, probe) & (ids != 0)
    dots = X[cand] @ q
    cids = ids[cand]
    orderidx = sorted(range(len(cids)), key=lambda i: (-round(dots[i], 6), cids[i]))[:10]
    expect = [(int(cids[i]), float(round(dots[i], 6))) for i in orderidx]
    record_tolerance("similarity_ann_ivf_kmeans", "top-10 (id,cos) positions agreeing with exact-within-probed learned cells", 10, sum(a == b for a, b in zip(got, expect)), direction="ge")
    assert got == expect, (got, expect)


def test_count_min_sketch_bounds(spark):
    """CMS guarantees est >= true; excess <= t*N/w holds per key with
    P >= 1 - (1/t)^d (Markov + d independent rows). With deterministic
    seeded hashes the realized error is fixed; t=4 leaves 4x margin
    over the measured fixture maximum while staying a real CMS bound
    (expected violations at t=4: 150 keys * (1/4)^4 ~ 0.6 -- observed 0)."""
    from basis_spark.operators.aggregates import sketch_count_min

    est = {r["user_id"]: r["est"] for r in sketch_count_min(spark, SF_ORACLE).collect()}
    ev = load(spark, SF_ORACLE, "events")
    n_total = ev.count()
    exact = {
        r["user_id"]: r["c"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert set(est) == set(exact)
    bound = 4 * n_total / 256
    record_tolerance("sketch_count_min", "max overcount (CMS never undercounts, asserted) vs t*N/w bound", bound, max(est[k] - ex for k, ex in exact.items()))
    for k, ex in exact.items():
        assert est[k] >= ex, (k, est[k], ex)
        assert est[k] - ex <= bound, (k, est[k], ex, bound)


def test_hll_rollup_merge_equals_direct(spark):
    """Sketch algebra: HLL union is register-wise max, so merging the
    per-day sketches must give EXACTLY the estimate of sketching the
    whole range directly (same lgConfigK) — the property that makes
    hierarchical rollups answerable without rescanning raw data. Also
    bound the estimate against exact distinct counts (+-5%)."""
    from basis_spark.operators.aggregates import sketch_hll_rollup

    rolled = {r["event_type"]: r["est_users"] for r in sketch_hll_rollup(spark, SF_ORACLE).collect()}
    direct = {
        r["event_type"]: r["est"]
        for r in load(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").cast("long").alias("est"))
        .collect()
    }
    exact = {
        r["event_type"]: r["u"]
        for r in load(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    record_tolerance("sketch_hll_rollup", "max abs diff: merged per-day sketches vs direct whole-range sketch (register-max algebra -> 0)", 0, max(abs(rolled[et] - direct[et]) for et in rolled))
    record_tolerance("sketch_hll_rollup", "max relative error vs exact countDistinct", 0.05, round(max(abs(rolled[et] - ex) / ex for et, ex in exact.items()), 6))
    assert rolled == direct, (rolled, direct)
    for et, ex in exact.items():
        assert abs(rolled[et] - ex) / ex <= 0.05, (et, rolled[et], ex)
