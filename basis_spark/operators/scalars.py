"""Scalar functions (SURVEY.md §2.H) + sampling/approximation (§2.I).

All JVM-side built-ins (whole-stage codegen; no Python in the hot path).
Dialect deltas vs the DuckDB oracle are handled per SURVEY §2.H notes:
- day-of-week: declared ISO encoding (Mon=1..Sun=7): Spark weekday()+1 ≡
  DuckDB isodow.
- date_diff arg order differs (Spark datediff(end,start) ≡ DuckDB
  date_diff('day',start,end)).
- months_between is Spark-native; the oracle reproduces Spark's 31-day
  fraction rule (exact here because the anchor date is never month-end).
- regexp_replace: Spark replaces all matches; DuckDB needs the 'g' flag.
- format/parse patterns differ (JVM vs C) — the declared contract is the
  output *value*, not the pattern string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from basis_spark.io import load
from basis_spark.registry import register


@register(
    "str_basics",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lo, upper(c_mktsegment) AS up,
           trim(c_name) AS tr, CAST(length(c_name) AS BIGINT) AS len,
           substr(c_name, 1, 8) AS pfx,
           concat_ws('|', c_mktsegment, c_name) AS joined,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
    FROM customer
    """,
)
def str_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lo"),
        F.upper("c_mktsegment").alias("up"),
        F.trim("c_name").alias("tr"),
        F.length("c_name").cast("long").alias("len"),
        F.substring("c_name", 1, 8).alias("pfx"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
    )


@register(
    "str_split_explode",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    GROUP BY token
    """,
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "str_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, 'a', '@', 'g') AS replaced
    FROM part
    """,
)
def str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", "a", "@").alias("replaced"),
    )


@register(
    "date_parts",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS mi,
           CAST(isodow(ts) AS BIGINT) AS iso_dow
    FROM events
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        (F.weekday("ts") + 1).cast("long").alias("iso_dow"),
    )


@register(
    "date_trunc_add",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS wk,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           round((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
                 + (day(o_orderdate) - 1) / 31.0, 6) AS mb,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER)
               AS dd
    FROM orders
    """,
)
def date_trunc_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").cast("date").alias("wk"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.round(F.months_between("o_orderdate", F.lit("1995-01-01").cast("date")), 6).alias(
            "mb"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "dd"
        ),
    )


@register(
    "date_format_parse",
    oracle="""
    SELECT event_id,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M') AS formatted,
           CAST(timezone('UTC',
               strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M'),
                        '%Y-%m-%d %H:%M')) AS TIMESTAMP) AS reparsed
    FROM events
    """,
)
def date_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Oracle routes reparsed through timezone('UTC', ...) -> TIMESTAMPTZ
    # -> session-local TIMESTAMP so a non-UTC gate host localizes BOTH
    # engines identically (bare strptime stays naive while PySpark
    # collect() localizes — red on any non-UTC host; same pattern as
    # date_epoch_roundtrip's to_timestamp).
    ev = load(spark, sf_dir, "events")
    fmt = F.date_format("ts", "yyyy-MM-dd HH:mm")
    return ev.select(
        "event_id",
        fmt.alias("formatted"),
        F.to_timestamp(fmt, "yyyy-MM-dd HH:mm").alias("reparsed"),
    )


@register(
    "math_basics",
    oracle="""
    SELECT event_id,
           round(abs(value - 100), 6) AS a,
           round(value, 2) AS r2,
           CAST(floor(value) AS BIGINT) AS fl,
           CAST(ceil(value) AS BIGINT) AS ce,
           round(sqrt(value), 6) AS sq,
           round(power(value, 2), 4) AS p2,
           round(ln(value + 1), 6) AS lg,
           round(exp(-value / 100), 6) AS ex,
           CAST(sign(value - 100) AS BIGINT) AS sg,
           round(value % 7, 6) AS md
    FROM events
    """,
)
def math_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.abs(v - 100), 6).alias("a"),
        F.round(v, 2).alias("r2"),
        F.floor(v).cast("long").alias("fl"),
        F.ceil(v).cast("long").alias("ce"),
        F.round(F.sqrt(v), 6).alias("sq"),
        F.round(F.pow(v, 2), 4).alias("p2"),
        F.round(F.log(v + 1), 6).alias("lg"),
        F.round(F.exp(-v / 100), 6).alias("ex"),
        F.signum(v - 100).cast("long").alias("sg"),
        F.round(v % 7, 6).alias("md"),
    )


@register(
    "cond_null_fns",
    oracle="""
    SELECT c_custkey,
           round(coalesce(spend, 0), 2) AS spend0,
           nullif(c_mktsegment, 'BUILDING') AS seg_nb,
           round(greatest(c_acctbal, coalesce(spend, 0)), 2) AS hi,
           round(least(c_acctbal, coalesce(spend, 0)), 2) AS lo
    FROM customer
    LEFT JOIN (SELECT o_custkey, sum(o_totalprice) AS spend FROM orders
               GROUP BY o_custkey) o ON c_custkey = o_custkey
    """,
)
def cond_null_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    j = c.join(spend, c.c_custkey == spend.o_custkey, "left")
    spend0 = F.coalesce(F.col("spend"), F.lit(0.0))
    return j.select(
        "c_custkey",
        F.round(spend0, 2).alias("spend0"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_nb"),
        F.round(F.greatest(F.col("c_acctbal"), spend0), 2).alias("hi"),
        F.round(F.least(F.col("c_acctbal"), spend0), 2).alias("lo"),
    )


@register(
    "arr_basics",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct,
           list_sort(string_split(text, ' '))[1] AS first_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ' ')
               AS first5_distinct
    FROM documents
    """,
)
def arr_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # first5_distinct is serialized to a space-joined string: the driver's
    # pandas canonicalizer cannot hash array-typed cells.
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    dtoks = F.array_distinct(toks)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(dtoks).alias("n_distinct"),
        F.array_sort(toks).getItem(0).alias("first_token"),
        F.array_join(F.slice(F.array_sort(dtoks), 1, 5), " ").alias("first5_distinct"),
    )


@register(
    "arr_higher_order",
    oracle="""
    SELECT vec_id,
           round(list_sum(list_transform(list_zip(embedding, embedding),
                 x -> x[1]::DOUBLE * x[2]::DOUBLE)), 6) AS sumsq,
           round(list_sum(list_transform(embedding[1:8], x -> x::DOUBLE)), 6)
               AS first8_sum
    FROM embeddings
    """,
)
def arr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The cosine/dot-product core: zip_with + aggregate, all JVM-side.
    # first8 was array<float>, which both crashes the driver's pandas
    # canonicalizer and has engine-dependent float->string formatting;
    # a rounded scalar fold over the slice pins the same semantics.
    emb = load(spark, sf_dir, "embeddings")
    dot_self = F.expr(
        "aggregate(zip_with(embedding, embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " 0D, (s, v) -> s + v)"
    )
    first8_sum = F.expr(
        "aggregate(slice(embedding, 1, 8), 0D, (s, v) -> s + CAST(v AS DOUBLE))"
    )
    return emb.select(
        "vec_id",
        F.round(dot_self, 6).alias("sumsq"),
        F.round(first8_sum, 6).alias("first8_sum"),
    )


def _token_count_map(docs: DataFrame, out_name: str) -> DataFrame:
    """(doc_id, token->count map) — the explode/groupBy/map_from_entries
    block shared by map_from_entries and map_higher_order so the
    tokenizer can never silently diverge between them."""
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("token", "cnt"))).alias(
                out_name
            )
        )
    )


@register(
    "map_from_entries",
    oracle="""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')
               AS keys_sorted,
           CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_keys
    FROM documents
    """,
)
def map_from_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Build a token->count map Spark-side, then emit sorted keys joined to a
    # string (map iteration order is engine-dependent, and array cells crash
    # the driver's pandas canonicalizer).
    docs = load(spark, sf_dir, "documents")
    counted = _token_count_map(docs, "tok_map")
    return counted.select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys("tok_map")), " ").alias("keys_sorted"),
        F.size("tok_map").alias("n_keys"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@register(
    "json_parse_struct",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed
    FROM events
    """,
)
def json_parse_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").cast("long").alias("k_parsed"),
    )


@register(
    "hash_md5",
    oracle="SELECT doc_id, md5(text) AS text_md5 FROM documents",
)
def hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("text_md5"))


# ---- §2.I sampling & approximation (tolerance tier — never hash-matched) ----


@register("sample_fraction")
def sample_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Seeded Bernoulli sample. RNG streams differ across engines → rows-only;
    # tests/test_tolerance.py asserts the count is within binomial bounds.
    return load(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)


@register("approx_quantile")
def approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # approx_percentile with modest accuracy; tolerance-checked in pytest.
    return load(spark, sf_dir, "orders").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("ap50"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("ap90"),
    )


@register(
    "str_levenshtein",
    oracle="""
    SELECT CAST(levenshtein(p_name, p_type) AS INTEGER) AS dist, count(*) AS n
    FROM part
    GROUP BY 1
    """,
)
def str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Edit distance, the fuzzy-matching primitive (same DP algorithm both
    # engines). Row-wise (no pairwise blowup); pair generation for fuzzy
    # dedup belongs to the LSH/banding operators.
    p = load(spark, sf_dir, "part")
    return (
        p.select(F.levenshtein("p_name", "p_type").cast("int").alias("dist"))
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "map_higher_order",
    oracle="""
    WITH counts AS (
        SELECT doc_id, token, count(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents) t
        GROUP BY doc_id, token)
    SELECT doc_id,
           array_to_string(list_sort(list(token || '=' || CAST(cnt * 2 AS VARCHAR))), ',')
               AS doubled_entries,
           CAST(sum(CASE WHEN cnt >= 3 THEN 1 ELSE 0 END) AS INTEGER) AS n_frequent
    FROM counts
    GROUP BY doc_id
    """,
)
def map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values doubles each token
    count, map_filter keeps counts >= 3; output serialized as sorted
    'key=value' entry strings (map iteration order is engine-dependent,
    R-appendix rule 5)."""
    docs = load(spark, sf_dir, "documents")
    m = _token_count_map(docs, "m")
    doubled = F.transform_values("m", lambda _, v: v * 2)
    frequent = F.map_filter("m", lambda _, v: v >= 3)
    return m.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(doubled),
                    lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")),
                )
            ),
            ",",
        ).alias("doubled_entries"),
        F.size(frequent).alias("n_frequent"),
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           CAST(bit_and(user_id) AS BIGINT) AS band,
           CAST(bit_or(user_id) AS BIGINT) AS bor,
           CAST(bit_xor(user_id) AS BIGINT) AS bxor
    FROM events
    GROUP BY event_type
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bitwise aggregates (bitmap/bloom-style accumulators in miniature).
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("bit_and(user_id)").cast("long").alias("band"),
            F.expr("bit_or(user_id)").cast("long").alias("bor"),
            F.expr("bit_xor(user_id)").cast("long").alias("bxor"),
        )
    )


@register(
    "str_split_part",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS grade,
           split_part(p_type, ' ', -1) AS finish
    FROM part
    """,
)
def str_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    # split_part with positive and negative (from-the-end) indices —
    # same 1-based semantics in both engines.
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part("p_type", F.lit(" "), F.lit(1)).alias("grade"),
        F.split_part("p_type", F.lit(" "), F.lit(-1)).alias("finish"),
    )


@register(
    "date_epoch_roundtrip",
    oracle="""
    SELECT event_id,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
           CAST(to_timestamp(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT))
                AS TIMESTAMP) AS ts_back
    FROM events
    """,
)
def date_epoch_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    # timestamp -> epoch seconds -> timestamp. Declared semantics: FLOOR
    # to whole seconds on both sides — Spark's unix_timestamp floors while
    # DuckDB's CAST(epoch(...) AS BIGINT) would ROUND (found by oracle
    # diff on sub-second fixture timestamps), so the oracle floors
    # explicitly.
    ev = load(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    return ev.select(
        "event_id",
        epoch_s.cast("long").alias("epoch_s"),
        F.to_timestamp(F.from_unixtime(epoch_s)).alias("ts_back"),
    )


@register(
    "sample_hash_pergroup",
    oracle="""
    SELECT event_type, event_id, rn FROM (
        SELECT event_type, event_id,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        FROM events) t
    WHERE rn <= 20
    """,
)
def sample_hash_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group sample: top-20 rows per event_type ordered
    by md5(event_id). Unlike seeded RNG sampling (sample_fraction /
    sample_stratified, rows-only checked), a hash order is engine- and
    partitioning-independent, so the 'random' sample is exactly
    reproducible anywhere — the property training-data splits need —
    and gets a full value-hash oracle, not a tolerance check.
    Spark >=3.5 pushes the rn<=k filter into WindowGroupLimit, so each
    group keeps only 20 rows per map task before the shuffle."""
    ev = load(spark, sf_dir, "events")
    key = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(key, "event_id")
    return (
        ev.select("event_type", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@register(
    "arr_vector_normalize",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)
                      / sqrt(list_sum(list_transform(embedding,
                            y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))), 6)
               AS unit_sum
    FROM embeddings
    """,
)
def arr_vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalization of the embedding column — the preprocessing step
    before any cosine-based dedup/ANN (cosine over unit vectors is a
    plain dot product, which is what the similarity operators assume).

    Pure JVM higher-order expressions (aggregate for the norm, transform
    for the scale) — no Python, map-only, no shuffle. Output is the norm
    plus the component-sum of the unit vector (a scalar checksum of the
    whole normalized array; the array itself stays array-typed for
    downstream ops and is checked via the scalar on both engines)."""
    emb = load(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.expr(
            "aggregate(embedding, cast(0.0 as double),"
            " (s, x) -> s + cast(x as double) * cast(x as double))"
        )
    )
    unit_sum = F.expr(
        "aggregate(embedding, cast(0.0 as double), (s, x) -> s + cast(x as double))"
    ) / norm
    return emb.select(
        "vec_id",
        F.round(norm, 6).alias("norm"),
        F.round(unit_sum, 6).alias("unit_sum"),
    )


@register(
    "str_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
               || '?lang=' || lang AS url
        FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param
    FROM u
    """,
)
def str_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition (host/path/query-param) — the first transform
    over any web crawl. Spark's dedicated parse_url runs JVM-side; the
    oracle reproduces it with portable regexps over the same
    deterministically synthesized URLs (fixture docs carry no real
    URLs, so the op synthesizes them from source/doc_id/lang — the
    parser is the thing under test). Map-only, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "str_pad_format",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
           rpad(c_mktsegment, 12, '.') AS seg_cell,
           printf('%s#%06d=%.2f', c_mktsegment, c_custkey, c_acctbal)
               AS display,
           repeat('*', CAST(c_nationkey % 5 AS INT)) AS stars
    FROM customer
    """,
)
def str_pad_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding / printf-style formatting parity (report and fixed-width
    export surfaces): lpad/rpad/format_string/repeat — all JVM, map
    only. Dialect note pinned by the oracle: Spark's format_string is
    java.util.Formatter, DuckDB's printf is C printf; the common subset
    (%s, zero-padded %d, %.2f) renders identically and is what the op
    declares."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_cell"),
        F.format_string(
            "%s#%06d=%.2f", F.col("c_mktsegment"), F.col("c_custkey"), F.col("c_acctbal")
        ).alias("display"),
        F.repeat(F.lit("*"), F.pmod(F.col("c_nationkey"), 5).cast("int")).alias("stars"),
    )


@register(
    "sample_weighted_priority",
    oracle="""
    WITH pr AS (
        SELECT o_orderkey, o_totalprice,
               -ln((list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           [CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)
                            for c in string_split_regex(
                                substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 13), '')]),
                       (a, d) -> a * 16 + d) + 0.5) / 4503599627370496.0)
               / o_totalprice AS ekey
        FROM orders)
    SELECT o_orderkey, o_totalprice FROM pr
    ORDER BY ekey, o_orderkey LIMIT 100
    """,
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via priority/exponential
    race (Efraimidis-Spirakis A-ES): key = -ln(u)/w with u a
    DETERMINISTIC uniform derived from md5(orderkey) (13 hex chars ->
    52-bit integer -> (v+0.5)/2^52), keep the 100 smallest keys. Every
    executor computes keys map-side; the only movement is the top-k
    TakeOrdered combine — the same distributed-top-k contract as
    similarity_topk, no data-sized sort. Hash-derived u (like
    sample_hash_pergroup) instead of seeded RNG is what upgrades this
    from the rows-only tier to a full value-hash oracle: the sample is
    bit-reproducible on any engine, which is the property training-data
    draws actually need. The output keeps the weight column so the
    inclusion-probability ∝ weight contract is visible to the check."""
    o = load(spark, sf_dir, "orders")
    v = F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 13), 16, 10)
    u = (v.cast("double") + 0.5) / F.lit(float(1 << 52))
    ekey = -F.log(u) / F.col("o_totalprice")
    return (
        o.select("o_orderkey", "o_totalprice", ekey.alias("ekey"))
        .orderBy("ekey", "o_orderkey")
        .limit(100)
        .drop("ekey")
    )


@register(
    "json_variant_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(json_extract(props, '$.missing') AS INTEGER) AS k_missing
    FROM events
    """,
)
def json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    parse_json once into a variant, then typed variant_get paths — the
    open-schema path that replaces per-field get_json_object re-parses
    (one parse per row instead of one per extracted field; variant's
    binary encoding also pushes through shuffles ~2x smaller than the
    JSON text). Missing paths yield typed NULL, pinned by the second
    column. json_extract (string-path) remains the legacy-shaped
    sibling operator."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k_int"),
        F.expr("variant_get(parse_json(props), '$.missing', 'int')").alias("k_missing"),
    )


@register(
    "arr_explode_outer",
    oracle="""
    WITH m AS (SELECT doc_id, list_filter(string_split(text,' '), t -> t = 'spark') AS toks
               FROM documents)
    SELECT doc_id, CAST(NULL AS BIGINT) AS pos, CAST(NULL AS VARCHAR) AS tok
    FROM m WHERE coalesce(len(toks), 0) = 0
    UNION ALL
    SELECT doc_id, CAST(unnest(range(0, len(toks))) AS BIGINT) AS pos,
           unnest(toks) AS tok
    FROM m WHERE len(toks) > 0
    """,
)
def arr_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode_OUTER: rows whose array is empty survive as a single
    (NULL, NULL) row instead of vanishing — the semantics that keep a
    left-side entity present through a fan-out (a doc with zero matches
    still appears in the joined feature table; plain explode would
    silently drop it and every downstream LEFT JOIN would lie). The
    oracle builds the same outer semantics from a guarded UNION, since
    DuckDB's unnest is inner-only; coalesce(len, 0) makes the guard
    cover a NULL array too (posexplode_outer also keeps those rows).
    Map-side generator, no shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t == F.lit("spark"))
    return docs.select(
        "doc_id", F.posexplode_outer(toks).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "tok")


@register(
    "str_collation_ci",
    oracle="""
    WITH m AS (SELECT p_type,
                      CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                           ELSE lower(p_brand) END AS brand_mixed
               FROM part)
    SELECT p_type,
           CAST(count(DISTINCT brand_mixed) AS BIGINT) AS n_binary,
           CAST(count(DISTINCT lower(brand_mixed)) AS BIGINT) AS n_ci
    FROM m GROUP BY 1
    """,
)
def str_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 collations): the same
    distinct-count run under binary collation vs UTF8_LCASE — the
    engine-level answer to case-divergent keys (brand codes, emails,
    country codes) that otherwise need lower() wrapped around every
    comparison, defeating dictionary pushdown. The case-mixed column is
    synthesized deterministically (upper on even keys); the oracle pins
    the collated count with lower(), proving the collation groups
    exactly the case-insensitive classes. Both counts ride one hash
    aggregation."""
    p = load(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_brand")
    ).otherwise(F.lower("p_brand"))
    return (
        p.select("p_type", mixed.alias("brand_mixed"))
        .groupBy("p_type")
        .agg(
            F.countDistinct("brand_mixed").cast("long").alias("n_binary"),
            F.countDistinct(F.collate(F.col("brand_mixed"), "UTF8_LCASE"))
            .cast("long")
            .alias("n_ci"),
        )
    )


@register(
    "math_try_ops",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 3 = 0 THEN NULL
                ELSE l_quantity / (l_linenumber - 3) END AS safe_div,
           CASE WHEN l_linenumber - 3 = 0 THEN NULL
                ELSE CAST(CAST(l_quantity AS BIGINT) % (l_linenumber - 3) AS BIGINT)
           END AS safe_mod
    FROM lineitem
    """,
)
def math_try_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic via the try_* family: Spark 4 runs in ANSI
    mode by default, so a divide/mod by zero THROWS mid-job — on a
    100 TB run that's a task retry storm ending in job failure because
    one row of 10^11 had a zero denominator. try_divide/try_mod return
    NULL for exactly those rows and let the rest of the partition
    proceed; the oracle encodes the same semantics as a guarded CASE.
    This is the row-level complement to parse_try_cast_quarantine's
    ingest-side try_cast."""
    li = load(spark, sf_dir, "lineitem")
    denom = F.col("l_linenumber") - 3
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_quantity"), denom).alias("safe_div"),
        F.try_mod(F.col("l_quantity").cast("long"), denom).cast("long").alias("safe_mod"),
    )


@register(
    "ts_timezone_convert",
    oracle="""
    SELECT CAST(timezone('America/New_York', timezone('UTC', ts)) AS DATE)
               AS ny_day,
           CAST(extract(hour FROM timezone('America/New_York', timezone('UTC', ts)))
                AS INT) AS ny_hour,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def ts_timezone_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IANA timezone conversion: UTC event times rebucketed to
    America/New_York wall-clock (day, hour) — the "daily report in the
    customer's timezone" requirement where naive offset arithmetic
    breaks on every DST transition. Spark's from_utc_timestamp and
    DuckDB's two-step timezone() both resolve the SAME IANA rules, so
    the grouped counts must agree bucket for bucket. Map-side
    expression + one aggregation; the session stays pinned UTC (the
    conversion is explicit, never ambient)."""
    ev = load(spark, sf_dir, "events")
    ny = F.from_utc_timestamp("ts", "America/New_York")
    return (
        ev.select(
            ny.cast("date").alias("ny_day"),
            F.hour(ny).cast("int").alias("ny_hour"),
        )
        .groupBy("ny_day", "ny_hour")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "date_business_days",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_linenumber,
             CAST(o.o_orderdate AS DATE) AS s, CAST(l.l_shipdate AS DATE) AS r
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_orderkey <= 2000),
    calc AS (
      SELECT l_orderkey, l_linenumber, s, r,
             r - s AS cal_days,
             ((r - s) // 7) * 5
             + ((r - s) % 7)
             - CASE WHEN (r - s) % 7 > 0
                     AND isodow(s) + ((r - s) % 7) - 1 >= 6
                    THEN least(CAST(2 AS BIGINT),
                               isodow(s) + ((r - s) % 7) - 6) ELSE 0 END
             - CASE WHEN isodow(s) = 7 AND (r - s) % 7 > 0
                    THEN -1 ELSE 0 END AS biz_raw
      FROM li)
    SELECT l_orderkey, l_linenumber,
           CAST(cal_days AS BIGINT) AS cal_days,
           CAST(biz_raw AS BIGINT) AS business_days
    FROM calc
    """,
)
def date_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business days between order and ship dates (weekends excluded,
    half-open [s, r)) — SLA math, closed form rather than a calendar
    join: full weeks contribute 5 each; the remainder days are walked
    from the start weekday, subtracting those that land on Sat/Sun.
    Identical integer expression on both engines (Spark
    weekday()+1 == DuckDB isodow, the equivalence date_parts pinned),
    so the oracle is exact arithmetic. A holiday calendar upgrades
    this to the spine-join form (ts_calendar_dim's machinery) — the
    closed form is the zero-join fast path that covers the 'net of
    weekends' contract.

    Map-side expressions only; no shuffle beyond the final projection
    (bounded to 2000 orders so the oracle output stays small)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") <= 2000)
        .join(
            load(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    s, r = F.to_date("o_orderdate"), F.to_date("l_shipdate")
    cal = F.datediff(r, s)
    isodow_s = F.weekday(s) + 1
    rem = cal % 7
    over = isodow_s + rem - 1
    weekend_hits = (
        F.when(
            (rem > 0) & (over >= 6),
            F.least(F.lit(2).cast("long"), over - 5),
        ).otherwise(0)
        + F.when((isodow_s == 7) & (rem > 0), -1).otherwise(0)
    )
    biz = (cal / 7).cast("long") * 5 + rem - weekend_hits
    return li.select(
        "l_orderkey",
        "l_linenumber",
        cal.cast("long").alias("cal_days"),
        biz.cast("long").alias("business_days"),
    )


@register(
    "sample_systematic_everyk",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             row_number() OVER (ORDER BY c_custkey) AS rn
      FROM customer) t
    WHERE rn % 10 = 5
    """,
)
def sample_systematic_everyk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every-k-th) sampling with a FIXED start offset —
    the survey-sampling design that guarantees even coverage of the
    frame order (here: key order, i.e. ingestion order), used where a
    hash sample's clumping is unacceptable (audit pulls, QC lots).
    Deterministic start (5 of 10) keeps the key strict — a random
    start would be the textbook form but an RNG-bound check.

    The frame rank is one global row_number here; windows.global_rank's
    range-partition + P-row-offset scaffold is the documented swap-in
    at frame sizes where a single-partition sort is real money."""
    c = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_custkey")
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") % 10 == 5)
    )
