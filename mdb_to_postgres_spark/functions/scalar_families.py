"""Scalar function families (SURVEY.md §2.7 #43-51) — one query per family.

Dialect discipline (SURVEY.md §4.3): POSIX-simple regexes only, explicit
arg-order adjustments encoded in the oracle SQL (datediff, dayofweek),
sqrt/ln over libm-sensitive pow, rounding applied where the two engines'
last-ulp behavior could diverge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import T


@query(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           TRIM(CONCAT('  ', c_name, ' ')) AS name_trim,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           CONCAT_WS('|', c_name, c_mktsegment) AS name_seg,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           REPLACE(c_name, 'Customer#', 'C-') AS name_replaced,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS key_digits,
           REGEXP_REPLACE(c_name, '[0]+', '', 'g') AS name_nozeros,
           CASE WHEN c_name LIKE 'Customer#%' THEN 1 ELSE 0 END AS is_customer,
           SPLIT_PART(c_name, '#', 2) AS name_num_part
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family (#43): case, trim, substring, concat, pad, regex."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("name_seg"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.regexp_replace(F.col("c_name"), "Customer#", "C-").alias("name_replaced"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("key_digits"),
        F.regexp_replace(F.col("c_name"), "[0]+", "").alias("name_nozeros"),
        F.when(F.col("c_name").like("Customer#%"), 1).otherwise(0).alias("is_customer"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num_part"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_day,
           EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           EXTRACT(DAY FROM o_orderdate) AS order_dom,
           strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS order_month_start,
           strftime(DATE_TRUNC('quarter', o_orderdate), '%Y-%m-%d') AS order_quarter_start,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3_months,
           DAYOFWEEK(o_orderdate) + 1 AS dow_sun1,
           CAST(FLOOR(EXTRACT(epoch FROM o_orderdate)) AS BIGINT) AS epoch_sec
    FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family (#44). Dialect notes: Spark datediff(end, start) ==
    DuckDB date_diff('day', start, end); Spark dayofweek is 1=Sunday while
    DuckDB's is 0=Sunday (oracle adds 1)."""
    o = T(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(d, "yyyy-MM-dd").alias("order_day"),
        F.year(d).cast("long").alias("order_year"),
        F.month(d).cast("long").alias("order_month"),
        F.dayofmonth(d).cast("long").alias("order_dom"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("order_month_start"),
        F.date_format(F.date_trunc("quarter", d), "yyyy-MM-dd").alias("order_quarter_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).cast("long").alias("days_to_2002"),
        F.date_format(F.add_months(d.cast("date"), 3), "yyyy-MM-dd").alias("plus_3_months"),
        F.dayofweek(d).cast("long").alias("dow_sun1"),
        F.unix_timestamp(d).alias("epoch_sec"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 1) AS price_round1,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           ABS(o_totalprice - 100000) AS price_dev,
           SQRT(o_totalprice) AS price_sqrt,
           ROUND(LN(o_totalprice), 6) AS price_ln6,
           CAST(SIGN(o_totalprice - 100000) AS DOUBLE) AS price_side,
           o_orderkey % 7 AS key_mod7,
           GREATEST(o_totalprice, 50000.0) AS price_hi,
           LEAST(o_totalprice, 50000.0) AS price_lo
    FROM orders
    WHERE o_totalprice > 0
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family (#45). sqrt is IEEE-correctly-rounded on both engines;
    ln differs by <=1 ulp between libm and StrictMath, so it's rounded to 6
    decimals on both sides. round(x,1) on 2-decimal money has no tie risk."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 1).alias("price_round1"),
        F.floor(p).alias("price_floor"),
        F.ceil(p).alias("price_ceil"),
        F.abs(p - 100000).alias("price_dev"),
        F.sqrt(p).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln6"),
        F.signum(p - 100000).alias("price_side"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.greatest(p, F.lit(50000.0)).alias("price_hi"),
        F.least(p, F.lit(50000.0)).alias("price_lo"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_nationkey % 2 = 0 THEN c_acctbal ELSE -c_acctbal END AS signed_bal,
           IF(c_acctbal > 0, 1, 0) AS is_positive
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family (#46): CASE, coalesce, nullif, if."""
    c = T(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.col("c_acctbal"))
        .otherwise(-F.col("c_acctbal"))
        .alias("signed_bal"),
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("is_positive"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           list_reduce(list_transform(list_slice(embedding, 1, 4), x -> CAST(x AS DOUBLE)),
                       (acc, x) -> acc + x) AS head4_sum,
           list_reduce(list_transform(list_slice(embedding, 1, 4), x -> CAST(x AS DOUBLE) * 2.0),
                       (acc, x) -> acc + x) AS head4_doubled_sum,
           len(list_filter(list_slice(embedding, 1, 8), x -> x > 0)) AS head8_positive_cnt,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)), (acc, x) -> acc + x) AS elem_sum
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family (#47): size/index/slice/transform/filter/aggregate over
    the embedding column. The fold runs left-to-right on both engines, so
    double accumulation is bit-identical. Every array intermediate is reduced
    to a scalar before output: the comparison harness canonicalizes rows with
    a pandas sort, which cannot order raw list values (round-1 agg_collect
    failure), so list columns must never appear in a checked result."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    emb = F.col("embedding")

    def fold_sum(arr):
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)

    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        emb.getItem(0).alias("first_elem"),
        fold_sum(F.transform(F.slice(emb, 1, 4), lambda x: x.cast("double"))).alias("head4_sum"),
        fold_sum(
            F.transform(F.slice(emb, 1, 4), lambda x: x.cast("double") * 2.0)
        ).alias("head4_doubled_sum"),
        F.size(F.filter(F.slice(emb, 1, 8), lambda x: x > 0)).alias("head8_positive_cnt"),
        fold_sum(F.transform(emb, lambda x: x.cast("double"))).alias("elem_sum"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT doc_id,
           UNNEST(range(len(string_split(text, ' ')))) AS pos,
           UNNEST(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 50
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator family (#48): posexplode of tokenized text. DuckDB's
    parallel UNNESTs zip element-wise, matching posexplode's 0-based pos."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "token"
    )


@query(
    "fn_struct_map",
    oracle="""
    WITH s AS (
      SELECT struct_pack(orderkey := o_orderkey, price := o_totalprice, status := o_orderstatus) AS o_struct,
             MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS o_map
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_struct.orderkey AS orderkey,
           o_struct.price AS price,
           o_map['status'][1] AS status_from_map,
           o_map['priority'][1] AS priority_from_map
    FROM s
    """,
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map family (#49): build nested values, then extract scalars
    (scalar output keeps the cross-engine hash comparable)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    s = o.select(
        F.struct(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("price"),
            F.col("o_orderstatus").alias("status"),
        ).alias("o_struct"),
        F.create_map(
            F.lit("status"), F.col("o_orderstatus"),
            F.lit("priority"), F.col("o_orderpriority"),
        ).alias("o_map"),
    )
    return s.select(
        F.col("o_struct.orderkey").alias("orderkey"),
        F.col("o_struct.price").alias("price"),
        F.col("o_map").getItem("status").alias("status_from_map"),
        F.col("o_map").getItem("priority").alias("priority_from_map"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (#50): path extraction from the events props column."""
    e = T(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").cast("long").alias("missing_val"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(CONCAT(lang, '|', source)) AS meta_md5
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (#51): md5/sha256 hex digests agree across engines.
    xxhash64 and monotonically_increasing_id are impl-specific -> covered
    by the rows-only fn_hash_impl_specific below."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit("|"), F.col("source"))).alias("meta_md5"),
    )


@query("fn_hash_impl_specific")  # rows-only: values are engine-specific
def fn_hash_impl_specific(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64 / crc32 / monotonically_increasing_id (#51 cont.): useful
    for salting, bucketing and synthetic keys; values differ per engine so
    the gate only checks shape."""
    d = T(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.crc32(F.col("text").cast("binary")).alias("text_crc32"),
        F.monotonically_increasing_id().alias("synthetic_id"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, o_custkey) AS key_xor,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           ~o_orderkey AS flipped
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (#45 cont.): AND/OR/XOR/shifts/NOT on BIGINT keys —
    the flag-mask and hash-mixing primitives (salting, band assembly).
    Dialect traps encoded in the oracle, not the engine: Spark SQL ``^`` is
    bitwise XOR but DuckDB ``^`` is exponentiation (its XOR is ``xor()``);
    and ``<<`` diverges off the happy path — Spark wraps like Java
    (``shiftleft(-7, 2) = -28``, silent overflow wrap) while DuckDB RAISES
    on negative or overflowing left shifts. This query stays on
    non-negative bounded keys where both agree; AND/OR/XOR/``~``/``>>``
    agree on negatives (two's complement, arithmetic right shift)."""
    o = T(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.expr("~o_orderkey").alias("flipped"),
    )


@query(
    "fn_variant_semistructured",
    oracle="""
    SELECT e.event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(CAST(e.props->>'$.k' AS BIGINT) AS DECIMAL(18,2))) AS DOUBLE)
             AS k_sum,
           MIN(CAST(e.props->>'$.k' AS BIGINT)) AS k_min,
           MAX(CAST(e.props->>'$.k' AS BIGINT)) AS k_max
    FROM events e
    GROUP BY e.event_type
    """,
)
def fn_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics via VARIANT (#50 cont., Spark 4): the
    events.props JSON string parses ONCE into the binary VARIANT encoding
    (parse_json) and typed paths come out with variant_get — the Spark 4
    answer to schemaless columns that avoids both per-access re-parsing
    (get_json_object) and rigid upfront schemas (from_json). At 100 TB
    the parse cost is paid at ingest and every later read is a binary
    path lookup; here the whole parse->extract->aggregate pipeline
    hash-checks against DuckDB's JSON operators."""
    e = T(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("k").cast("decimal(18,2)")).cast("double").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


_SOUNDEX_CASES = [
    ("ACME Corp", "A252"), ("Acme Corporation", "A252"),
    ("Smith", "S530"), ("Smyth", "S530"),
    ("Johnson", "J525"), ("Jonson", "J525"),
    ("Mueller", "M460"), ("Miller", "M460"),
    ("Robert", "R163"), ("Rupert", "R163"),
]


@query(
    "fn_phonetic_soundex",
    # DuckDB has no soundex; the expected codes are pinned literals (the
    # etl_sanitize_identifiers treatment) — an algorithm change in
    # Spark's soundex would hash-fail against the published code table.
    oracle="SELECT * FROM (VALUES "
    + ", ".join(f"('{n}', '{c}')" for n, c in _SOUNDEX_CASES)
    + ") t(name, sx)",
)
def fn_phonetic_soundex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic encoding (#43 cont.): soundex codes for a pinned fixture
    of name variants — Smith/Smyth, Johnson/Jonson, Mueller/Miller land
    on shared codes, which is exactly why soundex is the classic
    BLOCKING key for entity resolution: candidate pairs come from a
    groupBy on the code (the x_dedup_fuzzy_names pattern with a phonetic
    block instead of a head-noun block), and expensive edit-distance
    runs only within blocks."""
    rows = [(n,) for n, _ in _SOUNDEX_CASES]
    df = spark.createDataFrame(rows, "name: string")
    return df.select("name", F.soundex("name").alias("sx"))


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
             || CASE WHEN doc_id % 5 = 0 THEN ''
                     ELSE '?ref=' || lang || '&page=' || CAST(doc_id % 7 AS VARCHAR) END AS url
      FROM documents
    )
    SELECT doc_id, url,
           NULLIF(regexp_extract(url, '^([a-z]+)://', 1), '') AS protocol,
           NULLIF(regexp_extract(url, '://([^/?#]+)', 1), '') AS host,
           NULLIF(regexp_extract(url, '://[^/?#]+(/[^?#]*)', 1), '') AS path,
           NULLIF(regexp_extract(url, '[?&]ref=([^&#]*)', 1), '') AS ref_param,
           NULLIF(regexp_extract(regexp_extract(url, '://([^/?#]+)', 1),
                                 '([^.]+)[.][^.]+[.][^.]+$', 1), '') AS subdomain
    FROM u
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing family (#43 cont.): protocol/host/path/query-param
    extraction — the first step of every web-corpus pipeline (domain
    filtering, per-site rate caps, URL-canonicalized dedup).

    Spark side uses the native parse_url expression (JVM codegen, no
    regex compilation per row for the structural parts); the oracle
    spells the same extraction as POSIX regexes, with NULLIF('')
    reconciling DuckDB's empty-string-on-no-match to parse_url's NULL.
    One in five synthesized URLs carries no query string, exercising the
    NULL path. Pure map-side projection: no shuffle at any scale."""
    d = T(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("")).otherwise(
            F.concat(
                F.lit("?ref="),
                F.col("lang"),
                F.lit("&page="),
                (F.col("doc_id") % 7).cast("string"),
            )
        ),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.regexp_extract(
            F.parse_url("url", F.lit("HOST")), r"([^.]+)[.][^.]+[.][^.]+$", 1
        ).alias("subdomain"),
    ).withColumn("subdomain", F.nullif(F.col("subdomain"), F.lit("")))


@query(
    "fn_try_safe",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL
                ELSE CAST(o_totalprice AS DOUBLE) / (o_orderkey % 3) END AS safe_div,
           TRY_CAST(CASE WHEN o_orderkey % 2 = 0
                         THEN CAST(o_orderkey AS VARCHAR)
                         ELSE 'n/a' END AS BIGINT) AS safe_int,
           strftime(TRY_CAST(o_orderdate_s AS DATE), '%Y-%m-%d') AS safe_date
    FROM (SELECT o_orderkey, o_totalprice,
                 CASE WHEN o_orderkey % 5 = 0 THEN 'not-a-date'
                      ELSE strftime(o_orderdate, '%Y-%m-%d') END AS o_orderdate_s
          FROM orders)
    WHERE o_orderkey < 500
    """,
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function family (#46 cont.): try_divide / try_cast —
    NULL-on-failure arithmetic and parsing, the ANSI-mode-compatible
    spelling every migrated permissive pipeline needs once strict mode
    is on (divide-by-zero, bad numerics and bad dates become NULLs to
    quarantine, not job failures — row-level fault tolerance at 100 TB
    where one poison row must not kill a 6-hour job).

    Every failure case is deterministic, synthesized from key
    arithmetic (each kind exercised on a known row subset); DuckDB
    spells try_divide as the guarded CASE (its / raises on zero like
    ANSI Spark), TRY_CAST is common. Pure map-side projection."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    date_s = F.when(F.col("o_orderkey") % 5 == 0, F.lit("not-a-date")).otherwise(
        F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    int_s = F.when(
        F.col("o_orderkey") % 2 == 0, F.col("o_orderkey").cast("string")
    ).otherwise(F.lit("n/a"))
    return o.select(
        "o_orderkey",
        F.expr("try_divide(CAST(o_totalprice AS DOUBLE), o_orderkey % 3)").alias(
            "safe_div"
        ),
        int_s.try_cast("bigint").alias("safe_int"),
        # re-serialized to ISO text: a DATE output column trips strict
        # dtype comparators (date objects vs datetime64 — the spine
        # lesson); the parse-succeeded/NULL signal is fully preserved
        F.date_format(date_s.try_cast("date"), "yyyy-MM-dd").alias("safe_date"),
    )
