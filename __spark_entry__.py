"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001
queries()    — one entry per implemented operator (SURVEY.md §2); each
               callable (spark, sf_dir) -> DataFrame
oracle_sql() — DuckDB twin for every SQL-expressible query (same column
               names; value-hash compared order-insensitively at sf0.01)

Numeric determinism rules used throughout:
- money sums go through decimal(38,4) so Spark's partial-agg order and
  DuckDB's serial sum agree bit-for-bit;
- ratios of small ints (jaccard) round at 6dp — identical in both engines;
- floating dot products are sequential folds in both engines; columns where
  cross-engine float identity is not guaranteed are excluded from output
  (ids only) rather than risking hash mismatches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from review_crawler_spark.operators import dedup as D
from review_crawler_spark.operators import similarity as S
from review_crawler_spark.functions import text as X

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# deterministic ANN query vector (shared by Spark + SQL literals)
ANN_QUERY = [((i * 37 + 11) % 19 - 9) / 10.0 for i in range(64)]


# --------------------------------------------------------------------------
# flagship: the crawl-scheduler core (canonical frontier → per-host
# politeness top-k), expressed over the star schema so it is oracle-checkable
# --------------------------------------------------------------------------

def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier scheduling: treat orders as discovered URLs — host from
    customer shard, priority = recency (epoch day), politeness budget 8 per
    host — and emit the scheduled wave in crawl order (W2/O3, SURVEY §2.9)."""
    orders = load(spark, sf_dir, "orders")
    frontier = orders.select(
        F.format_string(
            "https://h%d.example.org/order/%d",
            (F.col("o_custkey") % 50).cast("int"),
            F.col("o_orderkey"),
        ).alias("url"),
        F.format_string("h%d.example.org", (F.col("o_custkey") % 50).cast("int")).alias(
            "host"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("priority"),
        F.col("o_orderkey").alias("seq"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    return (
        frontier.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 8)
        .select("host", "url", "priority", F.col("rk").cast("int").alias("rk"))
    )


_FLAGSHIP_SQL = """
WITH frontier AS (
  SELECT
    printf('https://h%d.example.org/order/%d',
           CAST(o_custkey % 50 AS INT), o_orderkey) AS url,
    printf('h%d.example.org', CAST(o_custkey % 50 AS INT)) AS host,
    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
      AS priority,
    o_orderkey AS seq
  FROM orders
), ranked AS (
  SELECT host, url, priority,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY priority DESC, seq ASC) AS INT) AS rk
  FROM frontier
)
SELECT host, url, priority, rk FROM ranked WHERE rk <= 8
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _flagship(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# operator queries
# --------------------------------------------------------------------------

def _q_w1_latest_version(spark, sf_dir):
    """W1 latest-version-per-key (elife_crawler.py:219-234 arg-max) over
    events: newest event per user."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


_SQL_W1 = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def _q_j1_semi(spark, sf_dir):
    """J1 semi join: customers having orders, counted per segment."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


_SQL_J1 = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
"""


def _q_j2_anti(spark, sf_dir):
    """J2 anti join (resume-skip semantics, plos_crawler.py:293-297)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    f_orders = o.filter(F.col("o_orderstatus") == "F")
    return c.join(
        f_orders.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    ).select("c_custkey", "c_name")


_SQL_J2 = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
"""


def _q_j6_broadcast_dim(spark, sf_dir):
    """J6 dim lookup: journals.json analog — broadcast region/nation dims."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(38,4)"))
            .cast("decimal(38,4)")
            .cast("string")
            .alias("total_bal"),
        )
    )


_SQL_J6 = """
SELECT r_name, count(*) AS n_customers,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR)
         AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def _q_a1_conditional_counts(spark, sf_dir):
    """A1 count-with-predicate (crawl-loop counters, plos_crawler.py:286-312)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_f"),
        F.sum(F.col("o_totalprice").cast("decimal(38,4)"))
        .cast("decimal(38,4)")
        .cast("string")
        .alias("total_price"),
    )


_SQL_A1 = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR)
         AS total_price
FROM orders GROUP BY o_orderpriority
"""


def _q_a4_group_max(spark, sf_dir):
    """A4 group-max (max review round per article analog)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max(F.col("value").cast("decimal(38,6)")).cast("string").alias("max_value"),
        F.count("*").alias("n_events"),
    )


_SQL_A4 = """
SELECT user_id,
       CAST(max(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS max_value,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


def _q_w2_topk_per_group(spark, sf_dir):
    """W2/O3 per-host top-k — top-3 orders per customer."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rnk").cast("int").alias("rnk"))
    )


_SQL_W2 = """
SELECT o_custkey, o_orderkey, CAST(rnk AS INT) AS rnk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def _q_w3_ordinals(spark, sf_dir):
    """W3 sub-article id generation: '<key>.s<n>' (plos_crawler.py:84-90)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.format_string(
            "%d.s%d", F.col("l_orderkey"), F.row_number().over(w)
        ).alias("item_id"),
    )


_SQL_W3 = """
SELECT l_orderkey, l_linenumber,
       printf('%d.s%d', l_orderkey,
              row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber))
         AS item_id
FROM lineitem
"""


def _q_o1_sequence_explode(spark, sf_dir):
    """O1 page-range frontier generation: sequence + explode (article_spider.py:42-68)."""
    hosts = (
        load(spark, sf_dir, "nation")
        .select(F.col("n_name").alias("host"), F.col("n_nationkey"))
        .filter(F.col("n_nationkey") < 5)
    )
    return hosts.select(
        "host",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("page_no"),
    ).select(
        "host",
        "page_no",
        F.format_string("https://%s/search?page_no=%d", F.lower("host"), F.col("page_no")).alias(
            "page_url"
        ),
    )


_SQL_O1 = """
SELECT n_name AS host, CAST(r AS INT) AS page_no,
       printf('https://%s/search?page_no=%d', lower(n_name), r) AS page_url
FROM nation, range(0, 5) t(r)
WHERE n_nationkey < 5
"""


def _q_u1_union_distinct(spark, sf_dir):
    """U1/U3 union + distinct across two discovery channels."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("okey")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("okey")
    )
    return a.unionByName(b).distinct().agg(F.count("*").alias("n_keys"))


_SQL_U1 = """
SELECT count(*) AS n_keys FROM (
  SELECT o_orderkey AS okey FROM orders WHERE o_orderstatus = 'F'
  UNION
  SELECT l_orderkey AS okey FROM lineitem WHERE l_returnflag = 'R'
)
"""


def _q_x_doi_strings(spark, sf_dir):
    """X1-X5 DOI/string algebra on synthetic DOIs."""
    d = load(spark, sf_dir, "documents")
    doi = F.concat(F.lit("https://doi.org/10.3390/j"), F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        doi.alias("doi"),
        F.regexp_extract(doi, r"([^/]+)$", 1).alias("short_doi"),
        F.concat(F.lit("https://www.mdpi.com/"), F.regexp_extract(doi, r"([^/]+)$", 1)).alias(
            "article_url"
        ),
        F.regexp_extract(F.col("source"), r"(\d+)$", 1).cast("int").alias("source_num"),
    )


_SQL_XSTR = """
SELECT doc_id,
       'https://doi.org/10.3390/j' || CAST(doc_id AS VARCHAR) AS doi,
       regexp_extract('https://doi.org/10.3390/j' || CAST(doc_id AS VARCHAR),
                      '([^/]+)$', 1) AS short_doi,
       'https://www.mdpi.com/' ||
         regexp_extract('https://doi.org/10.3390/j' || CAST(doc_id AS VARCHAR),
                        '([^/]+)$', 1) AS article_url,
       CAST(regexp_extract(source, '(\\d+)$', 1) AS INT) AS source_num
FROM documents
"""


def _q_x13_dates(spark, sf_dir):
    """X13-X16 date decomposition/formatting (rarticle.py:233-301)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("day"),
        F.date_format(d, "yyyy-MM-dd").alias("ymd"),
        F.datediff(d, F.lit("1970-01-01").cast("date")).cast("long").alias("epoch_day"),
    )


_SQL_X13 = """
SELECT o_orderkey,
       CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS y,
       CAST(month(CAST(o_orderdate AS DATE)) AS INT) AS m,
       CAST(day(CAST(o_orderdate AS DATE)) AS INT) AS day,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ymd,
       CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
         AS epoch_day
FROM orders
"""


def _q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (decimal sums for determinism)."""
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("decimal(38,4)").cast("string").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("decimal(38,4)").cast("string").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(38,4)") - dec("l_discount")))
                .cast("decimal(38,8)")
            )
            .cast("decimal(38,8)")
            .cast("string")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


_SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_qty,
  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DECIMAL(38,4)) AS VARCHAR) AS sum_base_price,
  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,4)) *
       (CAST(1 AS DECIMAL(38,4)) - CAST(l_discount AS DECIMAL(38,4))) AS DECIMAL(38,8)))
       AS DECIMAL(38,8)) AS VARCHAR) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def _q_dedup_exact(spark, sf_dir):
    """Exact dedup groups over documents (md5 of normalized text)."""
    d = load(spark, sf_dir, "documents")
    return D.exact_dedup_groups(d)


_SQL_DEDUP_EXACT = """
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),
                               '\\s+', ' ', 'g'))) AS fingerprint,
       count(*) AS group_size, min(doc_id) AS canonical_id
FROM documents GROUP BY 1
"""


def _q_text_stats(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex + stopword counts."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        X.stopword_count(F.col("text")).alias("n_stopwords"),
        F.length("text").alias("n_chars_actual"),
    )


_SQL_TEXT_STATS = (
    """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
       len(regexp_extract_all(text, '(?i)\\b("""
    + "|".join(X.EN_STOPWORDS)
    + """)\\b')) AS n_stopwords,
       len(text) AS n_chars_actual
FROM documents
"""
)


def _q_text_langid(spark, sf_dir):
    """Language-ID heuristic vs the labeled lang column."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("lang", X.lang_guess(F.col("text")).alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n_docs"))
    )


_SQL_LANGID = (
    """
WITH scored AS (
  SELECT lang,
         len(regexp_extract_all(text, '(?i)\\b("""
    + "|".join(X.EN_STOPWORDS)
    + """)\\b')) AS n_stop,
         greatest(CASE WHEN trim(text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1)
           AS n_tok
  FROM documents
)
SELECT lang,
       CASE WHEN CAST(n_stop AS DOUBLE) / n_tok > 0.12 THEN 'en'
            ELSE 'other' END AS lang_guess,
       count(*) AS n_docs
FROM scored GROUP BY 1, 2
"""
)


def _q_sessionize(spark, sf_dir):
    """Sessionization: 30-min-gap sessions per user (lag + cumsum)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_timestamp("ts")
        - F.unix_timestamp(F.lag("ts").over(w))
    )
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("session_no", sess.cast("int"))
        .groupBy("user_id")
        .agg(
            F.max("session_no").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


_SQL_SESSIONIZE = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS INT) AS session_no
  FROM gaps
)
SELECT user_id, max(session_no) AS n_sessions, count(*) AS n_events
FROM sessions GROUP BY user_id
"""


def _q_window_tumbling(spark, sf_dir):
    """Tumbling 5-min windows per event_type (streaming agg shape)."""
    ev = load(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / 300).cast("long") * 300
    return ev.groupBy(bucket.alias("win_start"), F.col("event_type")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .cast("string")
        .alias("sum_value"),
    )


_SQL_TUMBLING = """
SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start, event_type,
       count(*) AS n,
       CAST(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS VARCHAR)
         AS sum_value
FROM events GROUP BY 1, 2
"""


def _q_events_json(spark, sf_dir):
    """X22 JSON extraction: props->'k' avg per event type."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"), F.count(k).alias("n_k")
    )


_SQL_EVENTS_JSON = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(json_extract_string(props, '$.k')) AS n_k
FROM events GROUP BY event_type
"""


def _q_version_dedup(spark, sf_dir):
    """S2/W1 filename version dedup (elife-NNNNN-vK.xml arg-max) mapped onto
    documents: article_id = doc_id % 97, version = doc_id."""
    d = load(spark, sf_dir, "documents")
    tagged = d.select(
        (F.col("doc_id") % 97).alias("article_id"),
        F.col("doc_id").alias("version"),
    )
    w = Window.partitionBy("article_id").orderBy(F.desc("version"))
    return (
        tagged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("article_id", "version")
    )


_SQL_VERSION_DEDUP = """
SELECT article_id, version FROM (
  SELECT doc_id % 97 AS article_id, doc_id AS version,
         row_number() OVER (PARTITION BY doc_id % 97 ORDER BY doc_id DESC) AS rn
  FROM documents
) WHERE rn = 1
"""


def _q_dedup_ngram_jaccard(spark, sf_dir):
    """Exact 2-gram Jaccard pairs within source buckets (ids only — the
    jaccard double is verified in tests; cross-engine float identity of the
    division is checked there too)."""
    d = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, bucket_col="lang", threshold=0.3, shingle_k=2).select(
        "id_a", "id_b"
    )


_SQL_NGRAM_JACCARD = """
WITH shingled AS (
  SELECT doc_id, lang,
         list_distinct(
           list_transform(range(1, len(words)),
                          i -> words[i] || ' ' || words[i + 1])) AS sh
  FROM (
    SELECT doc_id, lang,
           regexp_split_to_array(
             trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '', 'g'),
                                 '\\s+', ' ', 'g')), ' ') AS words
    FROM documents
  )
  WHERE len(words) >= 2
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM shingled a JOIN shingled b
  ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(a.sh || b.sh)) >= 0.3
"""


def _q_ann_topk(spark, sf_dir):
    """Brute-force cosine top-k vs a constant query vector (ids + rank)."""
    e = load(spark, sf_dir, "embeddings")
    top = S.cosine_topk(e, ANN_QUERY, k=10)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.select("vec_id", F.row_number().over(w).cast("int").alias("rank"))


def _sql_ann_topk() -> str:
    vec = "[" + ", ".join(f"{x!r}" for x in ANN_QUERY) + "]"
    return f"""
WITH scored AS (
  SELECT vec_id,
         list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                CAST({vec} AS DOUBLE[])) AS cosine
  FROM embeddings
)
SELECT vec_id, CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS INT)
       AS rank
FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
"""


def _q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs within label buckets (ids only)."""
    e = load(spark, sf_dir, "embeddings")
    return D.embedding_near_dup_pairs(e, threshold=0.4).select("id_a", "id_b")


_SQL_DEDUP_EMBEDDING = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


def _q_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (xxhash64 lanes — no SQL oracle; recall/
    precision properties tested in tests/test_dedup.py)."""
    d = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(d, jaccard_threshold=0.5, shingle_k=3)


def _q_dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS: minhash verified pairs → distributed
    connected components (iterative min-label propagation) → every
    clustered doc labeled with its canonical min-id group. The piece a
    training-data dedup actually keys its keep-one-per-group filter on;
    oracle = independent pure-Python union-find (tools/gen_expected.py)."""
    from review_crawler_spark.operators.components import dedup_clusters

    d = load(spark, sf_dir, "documents")
    return dedup_clusters(d, jaccard_threshold=0.5, shingle_k=3)


def _ensure_minhash_index(spark, sf_dir) -> str:
    """Build-once persisted MinHash band index over the CORPUS partition
    of documents (doc_id % 20 != 0); cache key = content fingerprint of
    the source parquet (same invalidation rule as the IVF index). A fresh
    session re-registers the existing bucketed files from the on-disk
    spec instead of rebuilding."""
    import hashlib as _h
    import os as _os

    from review_crawler_spark.operators.dedup import (
        ensure_minhash_index_registered,
        write_minhash_band_index,
    )

    src = _os.path.join(sf_dir, "documents.parquet")
    st = _os.stat(src)
    key = _h.md5(
        f"{sf_dir.rstrip('/')}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    table = f"mh_band_index_{key}"
    path = f"/tmp/mh_index_{key}"
    if not ensure_minhash_index_registered(spark, table, path):
        corpus = load(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 20 != 0
        )
        write_minhash_band_index(corpus, table, path)
    return table


def _q_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer training (Sennrich et al., ACL 2016):
    ONE corpus scan builds the (word, freq) dim; each of the 24 merge
    rounds is a pair-explode + partial-agg over the word dim only (the
    shuffle carries (pair, int64), never text), a 1-row argmax collect,
    and a JVM ``aggregate``-fold rewrite of only the words containing the
    winning pair. Oracle = independent pure-Python replica
    (tools/gen_expected.bpe_expected). left/right aliased *_sym because
    LEFT/RIGHT are SQL keywords."""
    from review_crawler_spark.operators.bpe import bpe_train

    merges, _ = bpe_train(load(spark, sf_dir, "documents"), num_merges=24)
    return merges.select(
        "rank",
        F.col("left").alias("left_sym"),
        F.col("right").alias("right_sym"),
        "token",
    )


def _q_bpe_token_counts(spark, sf_dir):
    """Per-document token counts under the learned BPE vocabulary: the
    trained dim's final symbol arrays ARE each word's encoding, so the
    corpus pass is explode → per-doc word multiplicities → hash join
    against the (word, n_subwords) dim — (word, int) keys shuffle, text
    does not. Oracle = the same pure-Python replica's greedy encode."""
    from review_crawler_spark.operators.bpe import bpe_train, token_counts

    docs = load(spark, sf_dir, "documents")
    _, words = bpe_train(docs, num_merges=24)
    return token_counts(docs, words)


def _q_dedup_slice_probe(spark, sf_dir):
    """INCREMENTAL dedup — the per-wave production shape: a new crawl
    slice (doc_id % 20 == 0, ~5% of documents) probed against the
    persisted corpus band index (the other 95%, a bucketed catalog table
    CLUSTERED BY exactly the join key). The corpus never shuffles and is
    never re-shingled: the probe joins the slice's band keys against
    co-located index buckets and estimates Jaccard from the two carried
    signatures in one JVM fold. Oracle = lock-step pure-Python lane/band
    replica (tools/gen_expected.slice_probe_expected)."""
    from review_crawler_spark.operators.dedup import minhash_probe_index

    table = _ensure_minhash_index(spark, sf_dir)
    sl = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    return minhash_probe_index(sl, table).select(
        "slice_id", "corpus_id", "est_jaccard"
    )


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup clusters over the embeddings table:
    spherical k-means cells (learned buckets) → within-cell cosine pairs →
    connected components → keep-one labels. Oracle = lock-step pure-Python
    replica (tools/gen_expected.semantic_dedup_expected: same quantizer
    float recipe, same sequential-fold cosine, independent union-find)."""
    from review_crawler_spark.operators.dedup import semantic_dedup_clusters

    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup_clusters(e)


def _q_dedup_spans(spark, sf_dir):
    """Span-level exact-substring dedup (Lee et al. 2022 ExactSubstr,
    k-gram anchoring): every maximal token span whose 8-grams all occur
    >= 2x corpus-wide. One shuffle of (xxhash64, doc_id, pos) — document
    text never shuffles (`operators/spandedup.py`). Oracle groups on the
    gram STRING, so it is independent of the hash function."""
    from review_crawler_spark.operators.spandedup import duplicated_spans

    d = load(spark, sf_dir, "documents")
    return duplicated_spans(d, k=8).orderBy("doc_id", "span_start")


_SQL_GRAMS_CTE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g0 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6),
         i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
                          gram := array_to_string(toks[i:i+7], ' ')))) AS s
  FROM t WHERE len(toks) >= 8
),
g AS (SELECT doc_id, s.pos AS pos, s.gram AS gram FROM g0)
"""

_SQL_DEDUP_SPANS = _SQL_GRAMS_CTE + """,
m AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c FROM g),
d AS (SELECT doc_id, pos FROM m WHERE c >= 2),
s AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
             THEN 0 ELSE 1 END AS brk FROM d),
seg AS (SELECT doc_id, pos,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM s)
SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end,
       CAST(count(*) AS BIGINT) AS n_dup_grams
FROM seg GROUP BY doc_id, sid
"""


def _q_dedup_span_strip(spark, sf_dir):
    """ExactSubstr removal: rewrite each document with redundant
    duplicated spans stripped, keeping the corpus-first occurrence of
    every duplicated passage (row_number over the same gram-hash window).
    Reconstruction is a broadcast span-dim + JVM higher-order filter —
    the corpus never shuffles (`operators/spandedup.py`)."""
    from review_crawler_spark.operators.spandedup import strip_duplicated_spans

    d = load(spark, sf_dir, "documents")
    return strip_duplicated_spans(d, k=8).orderBy("doc_id")


_SQL_DEDUP_SPAN_STRIP = _SQL_GRAMS_CTE + """,
m AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c,
        row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn FROM g),
d AS (SELECT doc_id, pos FROM m WHERE c >= 2 AND rn >= 2),
s AS (SELECT doc_id, pos,
        CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
             THEN 0 ELSE 1 END AS brk FROM d),
seg AS (SELECT doc_id, pos,
        sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS sid FROM s),
sp AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end
       FROM seg GROUP BY doc_id, sid),
per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        CAST(sum(span_end - span_start) AS BIGINT) AS tokens_removed
        FROM sp GROUP BY doc_id),
tok0 AS (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
         i -> struct_pack(p := CAST(i - 1 AS BIGINT), tk := toks[i]))) AS s FROM t),
tok AS (SELECT doc_id, s.p AS p, s.tk AS tk FROM tok0),
keep AS (SELECT tok.doc_id, p, tk FROM tok
         WHERE NOT EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = tok.doc_id
                           AND tok.p >= sp.span_start AND tok.p < sp.span_end)),
agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS text_clean FROM keep GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(agg.text_clean, '') AS text_clean,
       CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(per.tokens_removed, 0) AS BIGINT) AS tokens_removed
FROM t LEFT JOIN agg USING (doc_id) LEFT JOIN per USING (doc_id)
"""


def _q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (pandas-UDF hash — no SQL oracle)."""
    d = load(spark, sf_dir, "documents")
    return D.simhash_near_pairs(d, max_hamming=3)


def _q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (scale path; recall vs brute force tested)."""
    e = load(spark, sf_dir, "embeddings")
    return S.ann_topk_lsh(e, ANN_QUERY, k=10).select("vec_id", "cosine")


def _q_ann_ivf(spark, sf_dir):
    """IVF ANN: deterministic k-means coarse quantizer + nprobe inverted
    lists + exact rescore (the partition-pruned scale path)."""
    e = load(spark, sf_dir, "embeddings")
    return S.ann_topk_ivf(e, ANN_QUERY, k=10).select("vec_id", "cosine")


def _q_ann_pq(spark, sf_dir):
    """Product-quantization ANN (Jégou TPAMI'11): per-subspace codebooks →
    ADC lookup-table scan over m-byte codes (the 32× I/O-reduced exhaustive
    pass a 100 TB embedding table needs) → top-rerank candidates → exact
    cosine rescore. Oracle = pure-Python lock-step replica
    (tools/gen_expected.ann_pq_expected)."""
    e = load(spark, sf_dir, "embeddings")
    return S.ann_topk_pq(e, ANN_QUERY, k=10).select("vec_id", "cosine")


def _ensure_ivf_index(spark, sf_dir) -> str:
    """Build-once persisted IVF index for sf_dir; cache key = CONTENT
    fingerprint (path + size + mtime of the source parquet), not the path
    alone — a regenerated dataset at the same path must invalidate the
    persisted index (round-3 ADVICE)."""
    import hashlib as _h
    import os as _os

    from review_crawler_spark.operators.similarity import write_ivf_index

    src = _os.path.join(sf_dir, "embeddings.parquet")
    st = _os.stat(src)
    key = _h.md5(
        f"{sf_dir.rstrip('/')}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    path = f"/tmp/ivf_index_{key}"
    if not _os.path.exists(_os.path.join(path, "_centroids.json")):
        write_ivf_index(load(spark, sf_dir, "embeddings"), path)
    return path


def _q_ann_ivf_indexed(spark, sf_dir):
    """PERSISTED IVF index: inverted lists materialized as bucket-partitioned
    parquet + centroid sidecar; the probe is a partition filter, so the
    query scan reads nprobe/n_centroids of the files — no assignment pass.
    Identical training recipe and output to ann_topk_ivf (shares its
    oracle rows); partition pruning pinned by tests/test_similarity_index.py."""
    from review_crawler_spark.operators.similarity import ann_topk_ivf_indexed

    path = _ensure_ivf_index(spark, sf_dir)
    return ann_topk_ivf_indexed(spark, path, ANN_QUERY, k=10).select(
        "vec_id", "cosine"
    )


def _q_ann_ivf_indexed_batch(spark, sf_dir):
    """BATCH multi-query probe over the persisted IVF index — the shape a
    training pipeline runs (near-dup a crawl slice against the corpus):
    one Arrow pass assigns every query its nprobe lists, the index scan is
    partition-pruned to the union of probed buckets, candidates join on
    bucket, per-query windowed top-k. Queries = the 3 smallest vec_ids'
    own embeddings; oracle = pure-Python lock-step IVF replica
    (tools/gen_expected.ann_ivf_batch_expected)."""
    from review_crawler_spark.operators.similarity import (
        ann_topk_ivf_indexed_batch,
    )

    path = _ensure_ivf_index(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings")
    queries = e.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ann_topk_ivf_indexed_batch(
        spark, path, queries, k=10, nprobe=4
    ).select("query_id", "vec_id", "cosine")


def _ensure_ivfpq_index(spark, sf_dir) -> str:
    """Build-once persisted IVF-PQ index for sf_dir; cache key = CONTENT
    fingerprint (path + size + mtime of the source parquet), same
    invalidation rule as the IVF and MinHash indexes."""
    import hashlib as _h
    import os as _os

    from review_crawler_spark.operators.similarity import write_ivfpq_index

    src = _os.path.join(sf_dir, "embeddings.parquet")
    st = _os.stat(src)
    key = _h.md5(
        f"{sf_dir.rstrip('/')}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    path = f"/tmp/ivfpq_index_{key}"
    if not _os.path.exists(_os.path.join(path, "_ivfpq.json")):
        write_ivfpq_index(load(spark, sf_dir, "embeddings"), path)
    return path


def _q_ann_ivfpq_batch(spark, sf_dir):
    """IVF-PQ batch probe — the full billion-scale ANN read path (Jégou
    TPAMI'11 §IV): coarse quantizer routes to parquet-partitioned inverted
    lists; within each list vectors are m-byte PQ codes of their RESIDUAL
    (smaller variance → better quantization at equal bytes). The batch
    query assigns probes in one Arrow pass, scans ONLY (id, codes) of the
    probed partitions (partition + column pruning), ADC-scores, reranks
    top candidates with the exact cosine on just the winners' raw
    vectors. Queries = the 3 smallest vec_ids' own embeddings; oracle =
    pure-Python lock-step replica
    (tools/gen_expected.ann_ivfpq_batch_expected)."""
    from review_crawler_spark.operators.similarity import (
        ann_topk_ivfpq_indexed_batch,
    )

    path = _ensure_ivfpq_index(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings")
    queries = e.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return ann_topk_ivfpq_indexed_batch(
        spark, path, queries, k=10, nprobe=4, rerank=50
    ).select("query_id", "vec_id", "cosine")


def _q_dedup_clusters_star(spark, sf_dir):
    """dedup_clusters with the large-star/small-star components engine —
    the O(log² n)-round path for adversarial cluster topologies; identical
    partition to the propagation engine (shares its oracle rows)."""
    from review_crawler_spark.operators.components import dedup_clusters

    d = load(spark, sf_dir, "documents")
    return dedup_clusters(
        d, jaccard_threshold=0.5, shingle_k=3, algorithm="star"
    )


def _q_pipeline_dedup_canonical(spark, sf_dir):
    """END-TO-END composition of the two operator families (round-3 VERDICT
    #7): corpus (the fetched-text table — the engine's fetched_log→parse
    output shape, whose engine-side production is golden-tested in
    tests/test_crawl_golden.py) → minhash near-dup CLUSTERS → keep one
    canonical doc per cluster (min-id survivor policy) → per-host
    politeness-budgeted re-crawl schedule of the survivors using the
    engine's exact scheduling contract (priority DESC, seq ASC, top-8 per
    host — scheduler._schedule's W2/O3 window). Oracle = DuckDB twin with
    the cluster set injected as the independently-computed union-find
    expectation (tools/gen_expected.py)."""
    from review_crawler_spark.operators.components import dedup_clusters

    d = load(spark, sf_dir, "documents")
    clusters = dedup_clusters(d, jaccard_threshold=0.5, shingle_k=3)
    losers = clusters.filter(
        F.col("doc_id") != F.col("cluster_id")
    ).select("doc_id")
    survivors = d.join(losers, "doc_id", "left_anti")
    frontier = survivors.select(
        F.format_string(
            "h%d.example.org", (F.col("doc_id") % 20).cast("int")
        ).alias("host"),
        F.format_string(
            "https://h%d.example.org/doc/%d",
            (F.col("doc_id") % 20).cast("int"), F.col("doc_id"),
        ).alias("url"),
        F.col("n_chars").cast("long").alias("priority"),
        F.col("doc_id").alias("seq"),
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), F.asc("seq"))
    return (
        frontier.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 8)
        .select(
            "host", F.col("seq").alias("doc_id"), "url", "priority",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def _q_jats_parse(spark, sf_dir):
    """U1 JATS parse round-trip: generate a deterministic JATS corpus from
    doc_ids, parse with the batch UDF, emit scalar fields. The oracle
    reconstructs every field arithmetically (the generator is closed-form),
    so this verifies the full generate→serialize→parse path."""
    from review_crawler_spark.functions.parse import parse_jats_udf
    from review_crawler_spark.sources.corpus import jats_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    parsed = parse_jats_udf(jats_corpus(ids))
    return parsed.select(
        "doc_id", "doi", "short_doi", "title",
        F.size("authors").alias("n_authors"),
        "journal_abbrev", "volume", "issue",
        "pub_year", "pub_month", "pub_day",
        F.size("keywords").alias("n_keywords"),
        "retracted", "has_reviews", "n_sub_articles",
    )


_SQL_JATS_PARSE = """
SELECT doc_id,
  'https://doi.org/10.9999/synth.' || CAST(doc_id AS VARCHAR) AS doi,
  'synth.' || CAST(doc_id AS VARCHAR) AS short_doi,
  'Synthetic study ' || CAST(doc_id AS VARCHAR) || ' on parameter '
    || CAST(doc_id % 7 AS VARCHAR) AS title,
  CAST(1 + doc_id % 4 AS INT) AS n_authors,
  'synthj' || CAST(doc_id % 10 AS VARCHAR) AS journal_abbrev,
  CAST(1 + doc_id % 20 AS INT) AS volume,
  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(1 + doc_id % 4 AS INT) END AS issue,
  CAST(2015 + doc_id % 10 AS INT) AS pub_year,
  CAST(1 + doc_id % 12 AS INT) AS pub_month,
  CASE WHEN doc_id % 3 = 0 THEN NULL ELSE CAST(1 + doc_id % 28 AS INT) END AS pub_day,
  CAST(doc_id % 5 AS INT) AS n_keywords,
  doc_id % 41 = 0 AS retracted,
  doc_id % 3 = 0 AS has_reviews,
  CAST(CASE WHEN doc_id % 3 = 0
       THEN 2 * (1 + doc_id % 3) + CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END
       ELSE 0 END AS INT) AS n_sub_articles
FROM documents
"""


def _q_winnow_fingerprints(spark, sf_dir):
    """Winnowing document fingerprints (MOSS rolling-window min over shingle
    hashes) — position-robust dedup/retrieval fingerprints; the whole
    pipeline is relational, so the oracle replays it exactly in SQL."""
    from review_crawler_spark.operators.dedup import winnowing_fingerprints

    d = load(spark, sf_dir, "documents")
    return winnowing_fingerprints(d, shingle_k=3, window=4)


_SQL_WINNOW = r"""
WITH words AS (
  SELECT doc_id,
         regexp_split_to_array(
           trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                               '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s,
         unnest(range(1, len(w) - 1)) AS pos
  FROM words WHERE len(w) >= 3
), hashed AS (
  SELECT doc_id, pos,
         ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM sh
), winned AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM hashed
)
SELECT DISTINCT doc_id, fp FROM winned
"""


def _q_html_clean(spark, sf_dir):
    """S9 HTML cleaning round-trip: inject script/style/noscript/link/rect/
    comment junk into every page, strip it with the vectorized cleaner
    (article_spider.py:168-180 semantics), and emit the WHOLE cleaned page —
    the oracle reconstructs the clean page character-for-character."""
    from review_crawler_spark.functions.html import banned_tag_count, clean_html
    from review_crawler_spark.sources.corpus import dirty_html_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    pages = dirty_html_corpus(ids)
    return pages.select(
        "doc_id",
        clean_html(F.col("html")).alias("cleaned"),
        banned_tag_count(F.col("html")).alias("n_banned_before"),
        banned_tag_count(clean_html(F.col("html"))).alias("n_banned_after"),
    )


_SQL_HTML_CLEAN = """
WITH au AS (
  SELECT doc_id,
         string_agg('<meta name="citation_author" content="'
                    || chr(65 + CAST((doc_id + i) % 26 AS INT)) || 'iven'
                    || CAST(doc_id AS VARCHAR) || ' Family'
                    || CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR)
                    || '">', '' ORDER BY i) AS authors_meta
  FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 4)) AS i
        FROM documents)
  GROUP BY doc_id
), kw AS (
  SELECT doc_id,
         '<meta name="citation_keywords" content="'
         || string_agg('kw' || CAST((doc_id * 3 + k) % 50 AS VARCHAR),
                       '; ' ORDER BY k)
         || '">' AS kw_meta
  FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 5 - 1)) AS k
        FROM documents WHERE doc_id % 5 <> 0)
  GROUP BY doc_id
)
SELECT d.doc_id,
  '<html><head>'
  || '<meta name="citation_title" content="Synthetic study '
  || CAST(d.doc_id AS VARCHAR) || ' on parameter '
  || CAST(d.doc_id % 7 AS VARCHAR) || '">'
  || '<meta name="citation_doi" content="10.9999/synth.'
  || CAST(d.doc_id AS VARCHAR) || '">'
  || '<meta name="citation_volume" content="'
  || CAST(1 + d.doc_id % 20 AS VARCHAR) || '">'
  || '<meta name="citation_publication_date" content="'
  || CAST(2015 + d.doc_id % 10 AS VARCHAR) || '/'
  || CAST(1 + d.doc_id % 12 AS VARCHAR) || '">'
  || '<meta name="citation_journal_title" content="Synthetic Journal '
  || CAST(d.doc_id % 10 AS VARCHAR) || '">'
  || a.authors_meta
  || coalesce(k.kw_meta, '')
  || '</head><body>'
  || '<div class="bib-identity">https://doi.org/10.9999/synth.'
  || CAST(d.doc_id AS VARCHAR)
  || CASE WHEN d.doc_id % 7 = 3 THEN ' (registering DOI)' ELSE '' END
  || '</div>'
  || CASE WHEN d.doc_id % 41 = 0
       THEN '<div>Retraction published on '
            || CAST(CASE WHEN d.doc_id % 3 = 0 THEN 1
                         ELSE 1 + d.doc_id % 28 END AS VARCHAR)
            || ' January 2024</div>'
       ELSE '' END
  || CASE WHEN d.doc_id % 3 = 0
       THEN '<a href="https://www.mdpi.com/synth/' || CAST(d.doc_id AS VARCHAR)
            || '/review_report">Peer Review Report</a>'
       ELSE '' END
  || '</body></html>' AS cleaned,
  CAST(7 AS INT) AS n_banned_before,
  CAST(0 AS INT) AS n_banned_after
FROM documents d
JOIN au a ON a.doc_id = d.doc_id
LEFT JOIN kw k ON k.doc_id = d.doc_id
"""


def _q_main_content(spark, sf_dir):
    """Main-content extraction (boilerplate removal): wrap every document's
    text in a full page (title/h1, link-dense nav bar, three paragraphs —
    the middle opening with an inline citation link — and a footer), then
    run the Kohlschuetter WSDM'10-style shallow block classifier
    (functions/content.py) over the HTML. The oracle reconstructs the
    expected extraction straight from documents.text — it never parses
    HTML, so Spark's split/feature/verdict path is independently checked.
    The reference sinks whole cleaned pages (article_spider.py:168-180);
    this is the crawl-to-training-corpus step past that."""
    from review_crawler_spark.functions.content import extract_main_content
    from review_crawler_spark.sources.corpus import boilerpipe_html_corpus

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pages = boilerpipe_html_corpus(docs)
    return extract_main_content(pages).select(
        "doc_id", "n_blocks", "n_content", "main_text", "main_len"
    )


# Twin computed from generator intent (make_boilerpipe_html): fixed blocks
# title/h1/nav/footer are always boilerplate (2-word headings, 8/8 anchor
# words, 4-word footer); paragraph j of the three text thirds is content
# iff wordcount >= 5 and anchor_len*3 <= text_len (only p1 has an anchor:
# its first word).
_SQL_MAIN_CONTENT = """
WITH s AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         len(string_split(text, ' ')) AS n,
         len(string_split(text, ' ')) // 3 AS n3
  FROM documents
), paras AS (
  SELECT doc_id, n, n3,
         array_to_string(ws[1:n3], ' ') AS p0,
         array_to_string(ws[n3+1:2*n3], ' ') AS p1,
         CASE WHEN n3 > 0 THEN length(ws[n3+1]) ELSE 0 END AS a1,
         array_to_string(ws[2*n3+1:n], ' ') AS p2
  FROM s
), verdicts AS (
  SELECT doc_id, p0, p1, p2,
         4 + (CASE WHEN length(p0) > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN length(p1) > 0 THEN 1 ELSE 0 END)
           + (CASE WHEN length(p2) > 0 THEN 1 ELSE 0 END) AS n_blocks,
         (n3 >= 5) AS k0,
         (n3 >= 5 AND a1 * 3 <= length(p1)) AS k1,
         (n - 2 * n3 >= 5) AS k2
  FROM paras
), main AS (
  SELECT doc_id, n_blocks,
         (CASE WHEN k0 THEN 1 ELSE 0 END) + (CASE WHEN k1 THEN 1 ELSE 0 END)
           + (CASE WHEN k2 THEN 1 ELSE 0 END) AS n_content,
         COALESCE(array_to_string(list_filter([
             CASE WHEN k0 THEN p0 END,
             CASE WHEN k1 THEN p1 END,
             CASE WHEN k2 THEN p2 END], x -> x IS NOT NULL), chr(10)),
           '') AS main_text
  FROM verdicts
)
SELECT doc_id, CAST(n_blocks AS INT) AS n_blocks,
       CAST(n_content AS INT) AS n_content,
       main_text, CAST(length(main_text) AS INT) AS main_len
FROM main
"""


def _q_warc_wet(spark, sf_dir):
    """WET extraction (the Common Crawl WARC→WET step): archive the
    boilerpipe HTML pages as gzip-member WARC segments, read them back
    through the distributed segment parser, and run main-content
    extraction over the recovered payloads — crawl archive in, clean
    text records out, one composed DataFrame program. The oracle is the
    HTML-free main-content twin straight off documents.text: it passes
    only if the WARC path is byte-faithful AND the extractor matches the
    generator intent, so both legs are checked through the composition."""
    import tempfile

    from review_crawler_spark.functions.content import extract_main_content
    from review_crawler_spark.sources.corpus import boilerpipe_html_corpus
    from review_crawler_spark.sources.warc import read_warc, write_warc

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pages = boilerpipe_html_corpus(docs)
    archive = pages.repartition(8, "doc_id").select(
        F.concat(F.lit("https://corpus.example/page/"), "doc_id").alias(
            "url"
        ),
        F.lit("2026-01-01T00:00:00Z").alias("date"),
        F.lit("text/html; charset=utf-8").alias("content_type"),
        F.encode("html", "UTF-8").alias("payload"),
    )
    out = tempfile.mkdtemp(prefix="wet_q_")
    write_warc(archive, out, compress=True)
    recovered = read_warc(spark, out).select(
        F.regexp_extract("url", r"/page/(.+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.decode("payload", "UTF-8").alias("html"),
    )
    return (
        extract_main_content(recovered)
        .select("doc_id", "main_text", "main_len")
        .orderBy("doc_id")
    )


def _q_resolve_redirects(spark, sf_dir):
    """Redirect-chain resolution (rarticle.py:784-800 follows dx.doi.org
    hops one blocking request at a time; at crawl scale the 3xx edges are
    a table and the frontier wants each chain's canonical terminal).
    Synthetic edge table off documents: u{id} -> u{id//2} halving chains
    with %5 terminals, plus c-node 2-cycles at %100 in {7,8} so the
    unresolved branch is exercised. Spark resolves by pointer doubling
    (O(log chain) join rounds); the oracle walks the same chains with a
    recursive CTE."""
    from review_crawler_spark.operators.redirects import resolve_redirects

    d = load(spark, sf_dir, "documents").select("doc_id")
    chain = d.filter((F.col("doc_id") > 0) & (F.col("doc_id") % 5 != 0)).select(
        F.concat(F.lit("u"), F.col("doc_id")).alias("src"),
        F.concat(F.lit("u"), (F.col("doc_id") / 2).cast("long")).alias("dst"),
    )
    cyc1 = d.filter(F.col("doc_id") % 100 == 7).select(
        F.concat(F.lit("c"), F.col("doc_id")).alias("src"),
        F.concat(F.lit("c"), F.col("doc_id") + 1).alias("dst"),
    )
    cyc2 = d.filter(F.col("doc_id") % 100 == 8).select(
        F.concat(F.lit("c"), F.col("doc_id")).alias("src"),
        F.concat(F.lit("c"), F.col("doc_id") - 1).alias("dst"),
    )
    edges = chain.unionByName(cyc1).unionByName(cyc2)
    return resolve_redirects(edges, max_hops=32)


_SQL_RESOLVE_REDIRECTS = """
WITH RECURSIVE e AS (
  SELECT 'u' || CAST(doc_id AS VARCHAR) AS src,
         'u' || CAST(doc_id // 2 AS VARCHAR) AS dst
  FROM documents WHERE doc_id > 0 AND doc_id % 5 <> 0
  UNION ALL
  SELECT 'c' || CAST(doc_id AS VARCHAR), 'c' || CAST(doc_id + 1 AS VARCHAR)
  FROM documents WHERE doc_id % 100 = 7
  UNION ALL
  SELECT 'c' || CAST(doc_id AS VARCHAR), 'c' || CAST(doc_id - 1 AS VARCHAR)
  FROM documents WHERE doc_id % 100 = 8
), f AS (
  SELECT src, min(dst) AS dst FROM e GROUP BY src
), chain AS (
  SELECT src AS url, dst AS cur, 1 AS hops FROM f
  UNION ALL
  SELECT c.url, f.dst, c.hops + 1
  FROM chain c JOIN f ON f.src = c.cur
  WHERE c.hops < 32
), reached AS (
  SELECT c.url, c.cur AS final_url, c.hops
  FROM chain c LEFT JOIN f t ON t.src = c.cur
  WHERE t.src IS NULL
)
SELECT f.src AS url,
       COALESCE(r.final_url, '') AS final_url,
       CAST(COALESCE(r.hops, -1) AS INT) AS hops,
       (r.url IS NOT NULL) AS resolved
FROM f LEFT JOIN reached r ON r.url = f.src
"""


def _q_rel_canonical(spark, sf_dir):
    """rel=canonical consolidation (RFC 6596): pages DECLARE their
    canonical URL in markup; declarations chain (A→B, B→C) and want the
    same pointer-doubling closure as 3xx redirects. Synthetic pages off
    documents mirror the resolve_redirects topology — p{id}→p{id//2}
    halving chains (every third page emits the href-first attribute
    order), %5==0 pages declare nothing (dropped by the null filter),
    and c-page 2-cycles exercise the unresolved branch. The oracle walks
    the INTENT edges with a recursive CTE and never parses HTML, so the
    markup extraction is independently checked through the composition."""
    from review_crawler_spark.functions.html import rel_canonical
    from review_crawler_spark.operators.redirects import resolve_redirects

    d = load(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id")

    def pg(url_col, dst_col, reversed_order):
        link = F.when(
            dst_col.isNull(), F.lit("")
        ).when(
            reversed_order,
            F.concat(
                F.lit('<link href="'), dst_col, F.lit('" rel="canonical"/>')
            ),
        ).otherwise(
            F.concat(
                F.lit('<link rel="canonical" href="'), dst_col, F.lit('"/>')
            ),
        )
        return F.struct(
            url_col.alias("url"),
            F.concat(
                F.lit("<html><head><title>t</title>"),
                link,
                F.lit("</head><body>x</body></html>"),
            ).alias("html"),
        )

    chain = d.filter(k > 0).select(
        pg(
            F.concat(F.lit("p"), k),
            F.when(
                k % 5 != 0,
                F.concat(F.lit("p"), (k / 2).cast("long")),
            ),
            k % 3 == 1,
        ).alias("s")
    )
    cyc1 = d.filter(k % 100 == 7).select(
        pg(
            F.concat(F.lit("c"), k), F.concat(F.lit("c"), k + 1), F.lit(False)
        ).alias("s")
    )
    cyc2 = d.filter(k % 100 == 8).select(
        pg(
            F.concat(F.lit("c"), k), F.concat(F.lit("c"), k - 1), F.lit(True)
        ).alias("s")
    )
    pages = chain.unionByName(cyc1).unionByName(cyc2).select("s.*")
    edges = pages.select(
        F.col("url").alias("src"), rel_canonical(F.col("html")).alias("dst")
    ).filter(F.col("dst").isNotNull())
    return resolve_redirects(edges).orderBy("url")


_SQL_REL_CANONICAL = """
WITH RECURSIVE e AS (
  SELECT 'p' || CAST(doc_id AS VARCHAR) AS src,
         'p' || CAST(doc_id // 2 AS VARCHAR) AS dst
  FROM documents WHERE doc_id > 0 AND doc_id % 5 <> 0
  UNION ALL
  SELECT 'c' || CAST(doc_id AS VARCHAR), 'c' || CAST(doc_id + 1 AS VARCHAR)
  FROM documents WHERE doc_id % 100 = 7
  UNION ALL
  SELECT 'c' || CAST(doc_id AS VARCHAR), 'c' || CAST(doc_id - 1 AS VARCHAR)
  FROM documents WHERE doc_id % 100 = 8
), f AS (
  SELECT src, min(dst) AS dst FROM e GROUP BY src
), chain AS (
  SELECT src AS url, dst AS cur, 1 AS hops FROM f
  UNION ALL
  SELECT c.url, f.dst, c.hops + 1
  FROM chain c JOIN f ON f.src = c.cur
  WHERE c.hops < 32
), reached AS (
  SELECT c.url, c.cur AS final_url, c.hops
  FROM chain c LEFT JOIN f t ON t.src = c.cur
  WHERE t.src IS NULL
)
SELECT f.src AS url,
       COALESCE(r.final_url, '') AS final_url,
       CAST(COALESCE(r.hops, -1) AS INT) AS hops,
       (r.url IS NOT NULL) AS resolved
FROM f LEFT JOIN reached r ON r.url = f.src
ORDER BY url
"""


def _q_jats_parse_extended(spark, sf_dir):
    """U1 extended-field round-trip: affiliations/rid resolution (J3/X20),
    corresponding-author emails + author match (J4), history dates + sanity
    (X13), related-article dict (X17), taxonomy, fig/table/page/word counts
    (A8), abstract and license — the full rarticle.py field surface
    (/root/reference/rarticle.py:233-330,351-382,417-512,596-721,738-767,
    875-900,1062-1066,1180-1239,1311-1355). Arrays are emitted joined so the
    driver's value-hash is representation-stable."""
    from review_crawler_spark.functions.parse import parse_jats_udf
    from review_crawler_spark.sources.corpus import jats_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    parsed = parse_jats_udf(jats_corpus(ids))
    return parsed.select(
        "doc_id",
        F.array_join("affiliations", "; ").alias("affs_joined"),
        F.array_join("author_affiliations", " || ").alias("author_affs_joined"),
        F.array_join("corr_email_keys", ",").alias("corr_key"),
        F.array_join("corr_emails", ",").alias("corr_emails_joined"),
        "corr_author_surname",
        "received_date", "accepted_date", "dates_in_order",
        F.array_join("related_dois", ",").alias("related_joined"),
        F.array_join("taxonomy", ",").alias("taxonomy_joined"),
        "fig_count", "table_count", "page_count", "word_count",
        "abstract", "license_type", "license_href",
    )


_SQL_JATS_EXT = """
WITH affs AS (
  SELECT doc_id,
         string_agg('Institute ' || CAST((doc_id * 7 + j) % 25 AS VARCHAR)
                    || ', City ' || CAST((doc_id + j) % 9 AS VARCHAR),
                    '; ' ORDER BY j) AS affs_joined
  FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 3)) AS j
        FROM documents)
  GROUP BY doc_id
), author_affs AS (
  SELECT doc_id,
         string_agg('Institute '
                    || CAST((doc_id * 7 + (doc_id + i) % (1 + doc_id % 3)) % 25 AS VARCHAR)
                    || ', City '
                    || CAST((doc_id + (doc_id + i) % (1 + doc_id % 3)) % 9 AS VARCHAR)
                    -- fn_note shape: the corr author's current-address
                    -- footnote resolves into their affiliation entry
                    || CASE WHEN doc_id % 8 = 3
                                 AND i = doc_id % (1 + doc_id % 4)
                            THEN '; Current address: Institute '
                                 || CAST((doc_id * 11) % 25 AS VARCHAR)
                            ELSE '' END,
                    ' || ' ORDER BY i) AS author_affs_joined
  FROM (SELECT doc_id, unnest(generate_series(0, doc_id % 4)) AS i
        FROM documents)
  GROUP BY doc_id
), base AS (
  SELECT doc_id,
         doc_id % (1 + doc_id % 4) AS corr_i,
         make_date(CAST(2015 + doc_id % 10 AS INT),
                   CAST(1 + doc_id % 12 AS INT),
                   CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                             ELSE 1 + doc_id % 28 END AS INT)) AS epub
  FROM documents
)
SELECT b.doc_id,
  a.affs_joined,
  aa.author_affs_joined,
  CASE WHEN b.doc_id % 4 = 0 OR b.doc_id % 8 IN (1, 5)
       THEN chr(65 + CAST((b.doc_id + b.corr_i) % 26 AS INT)) || 'F'
       WHEN b.doc_id % 8 = 7 THEN 'cor001'
       ELSE 'cor1' END AS corr_key,
  -- parser output is sorted; '.alt' sorts before '@' so the alt address
  -- leads the multi-email join
  CASE WHEN b.doc_id % 8 = 1
       THEN 'corr' || CAST(b.doc_id AS VARCHAR) || '.alt@example'
            || CAST(b.doc_id % 5 AS VARCHAR) || '.org,'
       ELSE '' END
    || 'corr' || CAST(b.doc_id AS VARCHAR) || '@example'
    || CAST(b.doc_id % 5 AS VARCHAR) || '.org' AS corr_emails_joined,
  'Family' || CAST(b.doc_id AS VARCHAR) || '_'
    || CAST(b.corr_i AS VARCHAR) AS corr_author_surname,
  CAST(b.epub - CAST(30 + b.doc_id % 60 AS INT) AS VARCHAR) AS received_date,
  CAST(CASE WHEN b.doc_id % 37 = 0 THEN b.epub + 3
            ELSE b.epub - CAST(b.doc_id % 30 AS INT) END AS VARCHAR)
    AS accepted_date,
  b.doc_id % 37 <> 0 AS dates_in_order,
  concat_ws(',',
    CASE WHEN b.doc_id % 41 = 0
         THEN 'retracted-article|10.9999/synth.' || CAST(b.doc_id AS VARCHAR)
         END,
    CASE WHEN b.doc_id % 6 = 0
         THEN 'companion|10.9999/synth.' || CAST(b.doc_id + 1 AS VARCHAR)
         END) AS related_joined,
  'heading:Research Article,Discipline-v3:Discipline'
    || CAST(b.doc_id % 8 AS VARCHAR) || '/Sub'
    || CAST(b.doc_id % 20 AS VARCHAR) AS taxonomy_joined,
  CAST(b.doc_id % 4 AS INT) AS fig_count,
  CAST(b.doc_id % 3 AS INT) AS table_count,
  CAST(5 + b.doc_id % 20 AS INT) AS page_count,
  CAST(6 + b.doc_id % 5 AS INT) AS word_count,
  'Abstract of study ' || CAST(b.doc_id AS VARCHAR) || ': '
    || CAST(b.doc_id % 7 AS VARCHAR) || ' parameters considered.' AS abstract,
  'open-access' AS license_type,
  'https://creativecommons.org/licenses/by/'
    || CASE WHEN b.doc_id % 2 = 0 THEN '3' ELSE '4' END || '.0/' AS license_href
FROM base b JOIN affs a ON a.doc_id = b.doc_id
JOIN author_affs aa ON aa.doc_id = b.doc_id
"""


def _q_sub_articles_explode(spark, sf_dir):
    """U6/X19 sub-article explode + F8 acceptance-letter filter + X9/W3 id
    generation + J5 parent linkage, end to end."""
    from review_crawler_spark.functions.parse import parse_jats_udf
    from review_crawler_spark.sources.corpus import jats_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    parsed = parse_jats_udf(jats_corpus(ids))
    exploded = parsed.select(
        "doc_id", F.explode("sub_articles").alias("sub")
    )
    return exploded.filter(
        F.col("sub.specific_use").isNull()
        | (F.col("sub.specific_use") != "acceptance-letter")
    ).select(
        "doc_id",
        F.col("sub.id").alias("sub_id"),
        F.col("sub.original_article_doi").alias("original_article_doi"),
        F.col("sub.type").alias("sub_type"),
        F.col("sub.round").alias("round"),
    )


_SQL_SUB_ARTICLES = """
WITH reviewed AS (
  SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS n_rounds
  FROM documents WHERE doc_id % 3 = 0
), rounds AS (
  -- sub-article ids derive from the sub-article DOI suffix: every 27th
  -- article numbers sparsely (r2, r4, ...) per sub_doi_num in jats.py
  SELECT doc_id, CAST(unnest(generate_series(1, n_rounds)) AS INT) AS rnd,
         CAST(CASE WHEN doc_id % 27 = 0
              THEN 2 * unnest(generate_series(1, n_rounds))
              ELSE unnest(generate_series(1, n_rounds)) END AS INT) AS num
  FROM reviewed
)
SELECT doc_id,
       'synth.' || CAST(doc_id AS VARCHAR) || '.r' || CAST(num AS VARCHAR) AS sub_id,
       'https://doi.org/10.9999/synth.' || CAST(doc_id AS VARCHAR)
         AS original_article_doi,
       'aggregated-review-documents' AS sub_type, rnd AS round
FROM rounds
UNION ALL
SELECT doc_id,
       'synth.' || CAST(doc_id AS VARCHAR) || '.a' || CAST(num AS VARCHAR),
       'https://doi.org/10.9999/synth.' || CAST(doc_id AS VARCHAR),
       'author-comment', rnd
FROM rounds
"""


def _q_html_meta(spark, sf_dir):
    """U4 HTML meta-tag extraction round-trip (mdpi_spider.py:49-106)."""
    from review_crawler_spark.functions.parse import parse_html_udf
    from review_crawler_spark.sources.corpus import html_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    parsed = parse_html_udf(html_corpus(ids))
    return parsed.select(
        "doc_id", "title", "doi", "volume", "pub_year", "pub_month",
        F.size("authors").alias("n_authors"),
        F.size("keywords").alias("n_keywords"),
        "retracted", "doi_registered", "has_reviews", "reviews_url",
    )


_SQL_HTML_META = """
SELECT doc_id,
  'Synthetic study ' || CAST(doc_id AS VARCHAR) || ' on parameter '
    || CAST(doc_id % 7 AS VARCHAR) AS title,
  'https://doi.org/10.9999/synth.' || CAST(doc_id AS VARCHAR) AS doi,
  CAST(1 + doc_id % 20 AS INT) AS volume,
  CAST(2015 + doc_id % 10 AS INT) AS pub_year,
  CAST(1 + doc_id % 12 AS INT) AS pub_month,
  CAST(1 + doc_id % 4 AS INT) AS n_authors,
  CAST(doc_id % 5 AS INT) AS n_keywords,
  doc_id % 41 = 0 AS retracted,
  doc_id % 7 <> 3 AS doi_registered,
  doc_id % 3 = 0 AS has_reviews,
  CASE WHEN doc_id % 3 = 0
       THEN 'https://www.mdpi.com/synth/' || CAST(doc_id AS VARCHAR) || '/review_report'
       ELSE NULL END AS reviews_url
FROM documents
"""



def _q_article_metadata(spark, sf_dir):
    """The reference's end product assembled end-to-end: one metadata
    record per article from BOTH acquisition paths joined on doc_id — the
    JATS XML parse (authoritative bibliographic fields + sub-article
    counts, rarticle.py) and the crawled HTML page parse (early-access
    `doi_registered` from the bib-identity div, review-report link —
    mdpi_spider.py:49-106). The schema mirrors the fixture-fidelity
    ARTICLES_SCHEMA scalars (schemas.py), so the declared doi_registered
    column is populated sink-to-sink. Join shape: two Arrow parse passes
    over the same id scan, equi-joined on the 8-byte key — at 100 TB both
    sides partition on doc_id and the join co-locates; no corpus bytes
    move, only parsed scalars."""
    from review_crawler_spark.functions.parse import (
        parse_html_udf,
        parse_jats_udf,
    )
    from review_crawler_spark.sources.corpus import html_corpus, jats_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    jats = parse_jats_udf(jats_corpus(ids)).select(
        "doc_id", "doi", "title", "volume", "issue",
        "pub_year", "pub_month", "pub_day",
        F.size("authors").alias("n_authors"),
        "retracted", "n_sub_articles",
    )
    html = parse_html_udf(html_corpus(ids)).select(
        "doc_id", "doi_registered", "has_reviews", "reviews_url",
    )
    return jats.join(html, "doc_id")


_SQL_ARTICLE_METADATA = """
SELECT doc_id,
  'https://doi.org/10.9999/synth.' || CAST(doc_id AS VARCHAR) AS doi,
  'Synthetic study ' || CAST(doc_id AS VARCHAR) || ' on parameter '
    || CAST(doc_id % 7 AS VARCHAR) AS title,
  CAST(1 + doc_id % 20 AS INT) AS volume,
  CASE WHEN doc_id % 5 = 0 THEN NULL ELSE CAST(1 + doc_id % 4 AS INT) END AS issue,
  CAST(2015 + doc_id % 10 AS INT) AS pub_year,
  CAST(1 + doc_id % 12 AS INT) AS pub_month,
  CASE WHEN doc_id % 3 = 0 THEN NULL ELSE CAST(1 + doc_id % 28 AS INT) END AS pub_day,
  CAST(1 + doc_id % 4 AS INT) AS n_authors,
  doc_id % 41 = 0 AS retracted,
  CAST(CASE WHEN doc_id % 3 = 0
       THEN 2 * (1 + doc_id % 3) + CASE WHEN doc_id % 9 = 0 THEN 1 ELSE 0 END
       ELSE 0 END AS INT) AS n_sub_articles,
  doc_id % 7 <> 3 AS doi_registered,
  doc_id % 3 = 0 AS has_reviews,
  CASE WHEN doc_id % 3 = 0
       THEN 'https://www.mdpi.com/synth/' || CAST(doc_id AS VARCHAR) || '/review_report'
       ELSE NULL END AS reviews_url
FROM documents
"""


def _q_f_filters(spark, sf_dir):
    """F1/F3/F6/F7 filter battery: boolean key, extension, skip-list, domain
    scope — composed as one predicate chain over documents."""
    d = load(spark, sf_dir, "documents")
    path = F.concat(F.col("source"), F.lit("/"), F.col("doc_id").cast("string"), F.lit(".xml"))
    return (
        d.withColumn("path", path)
        .filter(F.col("lang") == "en")                                  # F1
        .filter(F.lower(F.regexp_extract("path", r"\.([^.]+)$", 1)) == "xml")  # F3
        .filter(~F.col("text").contains("correction:"))                 # F4
        .filter(F.col("source").isin("src1", "src3", "src5", "src7"))   # F7
        .filter(F.col("n_chars") > 100)                                 # F6
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )


_SQL_F_FILTERS = """
SELECT source, count(*) AS n_docs
FROM documents
WHERE lang = 'en'
  AND lower(regexp_extract(source || '/' || CAST(doc_id AS VARCHAR) || '.xml',
                           '\.([^.]+)$', 1)) = 'xml'
  AND NOT contains(text, 'correction:')
  AND source IN ('src1', 'src3', 'src5', 'src7')
  AND n_chars > 100
GROUP BY source
"""


def _q_a6_learn_pages(spark, sf_dir):
    """A6 learn_search_pages (mdpi_spider.py:40-47): regex the page count off
    a synthetic results page, then O1-generate the page-URL frontier."""
    r = load(spark, sf_dir, "region")
    page0 = r.select(
        F.lower(F.col("r_name")).alias("host"),
        F.format_string(
            "<div>Displaying page 1 of %d results.</div>",
            (F.col("r_regionkey") + 3).cast("int"),
        ).alias("html"),
    )
    total = F.regexp_extract("html", r"page 1 of (\d+)", 1).cast("int")
    return (
        page0.withColumn("total_pages", total)
        .select(
            "host",
            F.explode(F.sequence(F.lit(1), F.col("total_pages") - 1)).alias("page_no"),
        )
        .select(
            "host",
            "page_no",
            F.format_string("https://%s.example.org/search?page_no=%d", F.col("host"), F.col("page_no")).alias("url"),
        )
    )


_SQL_A6_PAGES = """
WITH page0 AS (
  SELECT lower(r_name) AS host,
         CAST(regexp_extract('<div>Displaying page 1 of '
              || CAST(r_regionkey + 3 AS VARCHAR) || ' results.</div>',
              'page 1 of (\d+)', 1) AS INT) AS total_pages
  FROM region
)
SELECT host, CAST(unnest(generate_series(1, total_pages - 1)) AS INT) AS page_no,
       'https://' || host || '.example.org/search?page_no='
         || CAST(unnest(generate_series(1, total_pages - 1)) AS VARCHAR) AS url
FROM page0
"""


def _q_x21_flatten_dedup(spark, sf_dir):
    """X21/U3: flatten + dedup collected id lists (fix_suppms semantics) —
    sorted for determinism."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.array_distinct(F.collect_list("l_suppkey"))),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("supp_ids"),
        F.size(F.array_distinct(F.collect_list("l_suppkey"))).alias("n_supp"),
    )


_SQL_X21_FLATTEN = """
SELECT l_orderkey,
       array_to_string(list_sort(list_distinct(list(l_suppkey))), ',') AS supp_ids,
       CAST(len(list_distinct(list(l_suppkey))) AS INT) AS n_supp
FROM lineitem GROUP BY l_orderkey
"""


def _q_x8_scrub(spark, sf_dir):
    """X8 hard-space scrub + whitespace collapse (rarticle.py:996-999)."""
    d = load(spark, sf_dir, "documents")
    dirty = F.concat(F.lit("\u00a0 "), F.col("text"), F.lit("  tail\u00a0end  "))
    scrubbed = F.trim(
        F.regexp_replace(F.regexp_replace(dirty, "\u00a0", " "), r"\s+", " ")
    )
    return d.select(
        "doc_id",
        F.length(scrubbed).alias("scrubbed_len"),
        F.substring(scrubbed, 1, 30).alias("scrubbed_head"),
    )


_SQL_X8_SCRUB = """
SELECT doc_id,
       len(trim(regexp_replace(regexp_replace(
           chr(160) || ' ' || text || '  tail' || chr(160) || 'end  ',
           chr(160), ' ', 'g'), '\s+', ' ', 'g'))) AS scrubbed_len,
       substring(trim(regexp_replace(regexp_replace(
           chr(160) || ' ' || text || '  tail' || chr(160) || 'end  ',
           chr(160), ' ', 'g'), '\s+', ' ', 'g')), 1, 30) AS scrubbed_head
FROM documents
"""


def _q_j7_stage2_frontier(spark, sf_dir):
    """J7 stage-2 frontier (mdpi_review_spider.py:57-81): reviewed articles
    whose review pages were not yet fetched → new frontier rows."""
    from review_crawler_spark.functions.parse import parse_jats_udf
    from review_crawler_spark.sources.corpus import jats_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id")
    parsed = parse_jats_udf(jats_corpus(ids))
    fetched_reviews = ids.filter(F.col("doc_id") % 6 == 0)  # already-crawled set
    return (
        parsed.filter(F.col("has_reviews"))
        .join(fetched_reviews, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.format_string(
                "https://www.mdpi.com/synth/%d/review_report", F.col("doc_id")
            ).alias("reviews_url"),
        )
    )


_SQL_J7_STAGE2 = """
SELECT doc_id,
       'https://www.mdpi.com/synth/' || CAST(doc_id AS VARCHAR)
         || '/review_report' AS reviews_url
FROM documents
WHERE doc_id % 3 = 0 AND doc_id % 6 != 0
"""


def _q_cuckoo_expire_readmit(spark, sf_dir):
    """C3 via the cuckoo half of the north rule's "bloom/cuckoo" URL-seen
    filter: TTL-expire stale seen entries (delete_keys — the capability a
    bloom lacks) and re-admit their URLs, with the usual exact-confirm join
    behind the prefilter so the output is exact regardless of filter FPP.

    Scenario on the orders table: seen = finished orders; entries older
    than 1994-01-01 have expired their freshness window; admitted = every
    order not in the LIVE seen set (fresh orders ∪ expired re-admissions).
    """
    from review_crawler_spark.crawler import cuckoo

    o = load(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey", "o_orderstatus", "o_orderdate",
        F.xxhash64(F.col("o_orderkey").cast("string")).alias("url_hash"),
    )
    seen = keyed.filter(F.col("o_orderstatus") == "F")
    expired = seen.filter(F.col("o_orderdate") < F.lit("1994-01-01").cast("date"))
    live = seen.join(expired.select("o_orderkey"), "o_orderkey", "left_anti")

    shards = cuckoo.build_shards(seen.select("url_hash"), num_shards=8)
    after = cuckoo.delete_keys(shards, expired.select("url_hash"), num_shards=8)
    probed = cuckoo.probe(keyed.select("o_orderkey", "url_hash"), after, num_shards=8)
    fresh = probed.filter(~F.col("maybe_seen"))
    confirmed = probed.filter(F.col("maybe_seen")).join(
        live.select("o_orderkey"), "o_orderkey", "left_anti"
    )
    return fresh.unionByName(confirmed).select("o_orderkey")


_SQL_CUCKOO_EXPIRE = """
SELECT o_orderkey FROM orders
WHERE o_orderkey NOT IN (
    SELECT o_orderkey FROM orders
    WHERE o_orderstatus = 'F' AND o_orderdate >= DATE '1994-01-01')
"""


def _q_f2_exists(spark, sf_dir):
    """F2 reviewed-detection: exists(links, endswith review_report)
    (mdpi_spider.py:91-101)."""
    d = load(spark, sf_dir, "documents")
    links = F.array(
        F.format_string("https://h.org/a/%d", F.col("doc_id")),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.format_string("https://h.org/a/%d/review_report", F.col("doc_id")),
        ).otherwise(F.format_string("https://h.org/a/%d/pdf", F.col("doc_id"))),
    )
    return d.select(
        "doc_id",
        F.exists(links, lambda x: x.endswith("/review_report")).alias("has_reviews"),
    )


_SQL_F2_EXISTS = """
SELECT doc_id,
       len(list_filter(
           [ 'https://h.org/a/' || CAST(doc_id AS VARCHAR),
             CASE WHEN doc_id % 3 = 0
                  THEN 'https://h.org/a/' || CAST(doc_id AS VARCHAR) || '/review_report'
                  ELSE 'https://h.org/a/' || CAST(doc_id AS VARCHAR) || '/pdf' END ],
           x -> x LIKE '%/review_report')) > 0 AS has_reviews
FROM documents
"""



def _q_a2_a3_stats(spark, sf_dir):
    """A2 sum-of-booleans + A3 mean (file_management cells 7,10)."""
    d = load(spark, sf_dir, "documents")
    long_doc = (F.col("n_chars") > 200).cast("int")
    return d.groupBy("lang").agg(
        F.sum(long_doc).alias("n_long"),
        F.floor(
            F.sum(F.col("n_chars").cast("decimal(38,6)")) * 10000 / F.count("*")
        ).cast("long").alias("mean_chars_e4"),
        F.count("*").alias("n_docs"),
    )


_SQL_A2_A3 = """
SELECT lang,
       CAST(sum(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
       CAST(floor(sum(CAST(n_chars AS DECIMAL(38,6))) * 10000 / count(*)) AS BIGINT)
         AS mean_chars_e4,
       count(*) AS n_docs
FROM documents GROUP BY lang
"""


def _q_x10_x11_arrays(spark, sf_dir):
    """X10 '; '.join + X11 split + X18 collect/transform over keyword-ish
    arrays (rarticle.py:1120-1126, mdpi_spider.py:71-75)."""
    d = load(spark, sf_dir, "documents")
    words5 = F.slice(F.split(F.col("text"), " "), 1, 5)
    joined = F.array_join(words5, "; ")
    return d.select(
        "doc_id",
        joined.alias("kw_joined"),
        F.size(F.split(joined, "; ")).alias("n_kw"),
        F.array_join(F.transform(words5, lambda w: F.upper(w)), ",").alias("kw_upper"),
    )


_SQL_X10_X11 = """
SELECT doc_id,
       array_to_string(words5, '; ') AS kw_joined,
       CAST(len(string_split(array_to_string(words5, '; '), '; ')) AS INT) AS n_kw,
       array_to_string(list_transform(words5, w -> upper(w)), ',') AS kw_upper
FROM (
  SELECT doc_id, list_slice(string_split(text, ' '), 1, 5) AS words5
  FROM documents
)
"""


def _q_x14_date_sanity(spark, sf_dir):
    """X14 date-order sanity (received ≤ accepted ≤ epub analog:
    rarticle.py:303-330): every lineitem ships on/after its order date."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderkey").agg(
        F.min(
            (F.col("l_shipdate").cast("date") >= F.col("o_orderdate").cast("date"))
            .cast("int")
        ).alias("dates_sane"),
        F.count("*").alias("n_items"),
    )


_SQL_X14_SANITY = """
SELECT o_orderkey,
       min(CASE WHEN CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)
                THEN 1 ELSE 0 END) AS dates_sane,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderkey
"""


def _q_x22_tojson(spark, sf_dir):
    """X22 JSON round trip: to_json(struct) then re-extract
    (utils.py:130-132 dump/load cycle)."""
    ev = load(spark, sf_dir, "events")
    js = F.to_json(F.struct(F.col("event_type"), F.col("user_id")))
    return ev.select(
        "event_id",
        js.alias("json"),
        F.get_json_object(js, "$.user_id").cast("long").alias("user_back"),
    )


_SQL_X22_TOJSON = """
SELECT event_id,
       to_json(struct_pack(event_type := event_type, user_id := user_id)) AS json,
       CAST(json_extract_string(
         to_json(struct_pack(event_type := event_type, user_id := user_id)),
         '$.user_id') AS BIGINT) AS user_back
FROM events
"""



def _q_review_rounds(spark, sf_dir):
    """U4b review-report page parse (mdpi_review_spider.py:101-197): rounds,
    reviewer names, author responses, supplementary links — exploded."""
    from review_crawler_spark.functions.parse import parse_review_html_udf
    from review_crawler_spark.sources.corpus import review_html_corpus

    ids = load(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 3 == 0
    )
    parsed = parse_review_html_udf(review_html_corpus(ids))
    ex = parsed.select("doc_id", F.explode("rounds").alias("r"))
    return ex.select(
        "doc_id",
        F.col("r.round").alias("round"),
        F.size("r.reviewers").alias("n_reviewers"),
        F.array_join(F.col("r.reviewers.name"), "|").alias("reviewer_names"),
        # reviewer numbers travel as their own field, as the reference's
        # {'number','name'} dicts (mdpi_review_spider.py:112-116)
        F.array_join(
            F.transform("r.reviewers", lambda x: x["number"].cast("string")),
            "|",
        ).alias("reviewer_numbers"),
        F.col("r.has_author_response").alias("has_author_response"),
        F.size("r.supp_urls").alias("n_supp"),
    )


_SQL_REVIEW_ROUNDS = """
WITH reviewed AS (
  SELECT doc_id, CAST(1 + doc_id % 3 AS INT) AS n_rounds
  FROM documents WHERE doc_id % 3 = 0
), rounds AS (
  SELECT doc_id, CAST(unnest(generate_series(1, n_rounds)) AS INT) AS round
  FROM reviewed
)
SELECT doc_id, round,
  CAST(1 + (doc_id + round) % 2 AS INT) AS n_reviewers,
  array_to_string(
    list_transform(generate_series(1, CAST(1 + (doc_id + round) % 2 AS INT)),
      n -> CASE WHEN (doc_id + n) % 2 = 1 THEN 'Anonymous'
                ELSE 'Reviewer' || CAST(doc_id AS VARCHAR) || '_'
                     || CAST(round AS VARCHAR) || '_' || CAST(n AS VARCHAR) END),
    '|') AS reviewer_names,
  array_to_string(
    list_transform(generate_series(1, CAST(1 + (doc_id + round) % 2 AS INT)),
      n -> CAST(n AS VARCHAR)),
    '|') AS reviewer_numbers,
  TRUE AS has_author_response,
  CAST(CASE WHEN (doc_id + round) % 2 = 0 THEN 1 ELSE 0 END AS INT) AS n_supp
FROM rounds
"""



def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (operators/decontam.py): every 17th doc
    plays the evaluation benchmark; report each remaining training doc that
    shares a word 5-gram with it. Broadcast bench-gram join, JVM-only."""
    from review_crawler_spark.operators.decontam import ngram_contamination

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return ngram_contamination(train, bench, n=5).orderBy("doc_id")


def _q_image_decode_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 driver-visible audit: decode a deterministic image+caption slice
    (real PNG / baseline-JPEG / GIF87a bitstreams from the pure-Python
    codecs) through decode_real and report per-format decode health.

    Rows-only entry (binary codecs are not SQL-expressible) — correctness
    is carried by the columns themselves: n_errors must be 0 and
    n_phash_exact / n_caption_exact must equal n for every format, which
    tests/test_images.py asserts; the driver check pins rows + schema."""
    from review_crawler_spark.functions.images import decode_images, decode_real
    from review_crawler_spark.sources.images_table import images_df

    ids = [
        f"www.mdpi.com/article/{n}/fig{f}.png"
        for n in range(120)
        for f in (1, 2)
    ]
    table = images_df(spark, ids).localCheckpoint(eager=True)
    dec = decode_images(table, decoder=decode_real)
    ref = table.select(
        "image_id",
        F.col("phash").alias("ref_phash"),
        F.col("caption").alias("ref_caption"),
    )
    return (
        dec.join(ref, "image_id")
        .groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("decode_error").isNotNull(), 1).otherwise(0)
            ).alias("n_errors"),
            F.sum(
                F.when(F.col("phash") == F.col("ref_phash"), 1).otherwise(0)
            ).alias("n_phash_exact"),
            F.sum(
                F.when(F.col("caption") == F.col("ref_caption"), 1)
                .otherwise(0)
            ).alias("n_caption_exact"),
        )
        .orderBy("fmt")
    )


def _phash_corpus_ids() -> list[str]:
    """Deterministic image-payload corpus with planted perceptual dups.

    150 distinct figures; the first 40 get one ``~dup1`` near-copy and the
    first 10 additionally a ``~dup2`` (three-image chains exercise
    transitivity: dup1↔dup2 may or may not clear the Hamming budget, and
    the oracle brute-forces the same rule, so either outcome matches).
    """
    bases = [f"www.mdpi.com/article/{n}/fig1" for n in range(150)]
    return (
        bases
        + [f"{b}~dup1" for b in bases[:40]]
        + [f"{b}~dup2" for b in bases[:10]]
    )


def _q_dedup_phash_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate image detection over the input_hint
    payload table: encode→decode through the real pure-Python codecs,
    average-hash the decoded pixels (the table's stored ``phash``), then
    exact-recall Hamming≤4 pairing via pigeonhole banding
    (`operators/dedup.py:phash_near_pairs`).

    Only (image_id, phash) ever shuffles — the banding exchange is ~16
    bytes/row however large the figure bytes are, which is what makes
    this the 100 TB-safe image analog of simhash text dedup. The oracle
    is an independent DuckDB brute-force: bit_count(xor(a,b)) over the
    same generator-produced phash values (generator shared as fixture;
    the pair LOGIC — banding vs O(n²) scan — is fully independent).
    """
    from review_crawler_spark.operators.dedup import phash_near_pairs
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _phash_corpus_ids()).select("image_id", "phash")
    return (
        phash_near_pairs(imgs, max_hamming=4)
        .select(
            F.col("id_a").alias("image_a"),
            F.col("id_b").alias("image_b"),
            "hamming",
        )
        .orderBy("image_a", "image_b")
    )


def _q_dedup_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-duplicate-group over images: phash banded pairs →
    connected components (min-label propagation,
    `operators/components.py:connected_components`) → every figure labeled
    with its cluster, its cluster's size, and whether it is the canonical
    survivor (the min image_id). This is the query an ingest pipeline runs
    to drop re-hosted/mirrored figures before training: filter
    ``is_canonical`` and 1/cluster survives.

    Scale shape: the component engine shuffles only the PAIR list (edges
    from shared Hamming-band buckets, never the corpus), singletons join
    back via one broadcast (components ≤ pairs ≪ corpus), and cluster_size
    is a count over the same broadcast — the figure ``bytes`` column is
    never read. Oracle: independent pure-Python union-find over an
    independent brute-force O(n²) pair scan of the same generator phashes.
    """
    from review_crawler_spark.operators.components import connected_components
    from review_crawler_spark.operators.dedup import phash_near_pairs
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _phash_corpus_ids()).select("image_id", "phash")
    pairs = phash_near_pairs(imgs, max_hamming=4)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    # components table is bounded by the pair list — broadcast both hops
    sizes = comp.groupBy(F.col("component").alias("comp")).agg(
        F.count("*").alias("sz")
    )
    labeled = (
        imgs.join(F.broadcast(comp), imgs.image_id == comp.id, "left")
        .select(
            "image_id",
            F.coalesce("component", "image_id").alias("cluster_id"),
        )
        .join(
            F.broadcast(sizes),
            F.col("cluster_id") == F.col("comp"),
            "left",
        )
        .select(
            "image_id",
            "cluster_id",
            F.coalesce("sz", F.lit(1)).cast("int").alias("cluster_size"),
            (F.col("image_id") == F.col("cluster_id")).alias("is_canonical"),
        )
    )
    return labeled.orderBy("image_id")


_IMAGE_META_CACHE: dict[str, dict] = {}


def _image_meta() -> dict[str, dict]:
    """image_id → stored (w, h, fmt, phash) for the fixed corpus, via the
    same pure generator the Spark table uses (computed once per process —
    the codec round-trip for 200 figures costs ~1 s)."""
    if not _IMAGE_META_CACHE:
        from review_crawler_spark.sources.images_table import make_image

        for i in _phash_corpus_ids():
            r = make_image(i)
            _IMAGE_META_CACHE[i] = {
                k: r[k] for k in ("w", "h", "fmt", "phash")
            }
    return _IMAGE_META_CACHE


def _phash_values() -> dict[str, int]:
    return {i: m["phash"] for i, m in _image_meta().items()}


def _sql_dedup_phash() -> str:
    """DuckDB oracle: brute-force all-pairs Hamming over the same phash
    values (inline VALUES) — independent pair logic vs Spark's banding."""
    vals = ",\n".join(f"('{i}', {p})" for i, p in _phash_values().items())
    return f"""
WITH imgs(image_id, phash) AS (VALUES {vals})
SELECT a.image_id AS image_a, b.image_id AS image_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
FROM imgs a JOIN imgs b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 4
ORDER BY image_a, image_b
"""


def _sql_dedup_phash_clusters() -> str:
    """Oracle for `dedup_phash_clusters`: union-find in pure Python over
    a brute-force pair scan (both independent of the Spark path's banding
    + label propagation), emitted as inline VALUES."""
    ph = _phash_values()
    ids = list(ph.keys())
    parent = {i: i for i in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            # phashes are signed int64; mask to 64 bits so a mixed-sign
            # XOR doesn't count Python's infinite two's-complement tail
            if bin((ph[a] ^ ph[b]) & 0xFFFFFFFFFFFFFFFF).count("1") <= 4:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    roots: dict[str, list[str]] = {}
    for i in ids:
        roots.setdefault(find(i), []).append(i)
    rows = []
    for members in roots.values():
        canon = min(members)
        for m in members:
            rows.append(
                f"('{m}', '{canon}', {len(members)}, "
                f"{'TRUE' if m == canon else 'FALSE'})"
            )
    return (
        "SELECT image_id, cluster_id, CAST(cluster_size AS INTEGER) AS "
        "cluster_size, is_canonical FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(image_id, cluster_id, cluster_size, is_canonical) "
        "ORDER BY image_id"
    )


def _q_image_meta_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-walk metadata scan over the figure payload corpus: format,
    dimensions, and the embedded ancillary comment (PNG tEXt / JPEG COM /
    GIF comment extension), extracted WITHOUT decoding any pixel data
    (`functions/imgmeta.py`) — the ~1%-of-a-decode audit pass a 100 TB
    multimodal table needs. One mapInPandas, no shuffle until the sort."""
    from review_crawler_spark.functions.imgmeta import sniff_images
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _phash_corpus_ids())
    return (
        sniff_images(imgs)
        .select("image_id", "fmt", "w", "h", "comment")
        .orderBy("image_id")
    )


def _sql_image_meta_sniff() -> str:
    """Oracle: the generator's PRE-ENCODE intent (format/dims from the
    seeded `_base_pixels`, comment from the id) as inline VALUES — fully
    independent of both the encoders and the header-walk parser, so the
    query verifies the real bitstreams round-trip their metadata."""
    from review_crawler_spark.sources.images_table import _base_pixels

    rows = []
    for i in _phash_corpus_ids():
        base_id, _, _ = i.partition("~dup")
        _px, w, h, fmt = _base_pixels(base_id or i)
        rows.append(f"('{i}', '{fmt}', {w}, {h}, 'figure {i}')")
    return (
        "SELECT image_id, fmt, CAST(w AS INTEGER) AS w, "
        "CAST(h AS INTEGER) AS h, comment FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(image_id, fmt, w, h, comment) ORDER BY image_id"
    )


_IMG_PREP_MIN_PIXELS = 1024
_IMG_PREP_FMTS = ("png", "jpeg")


def _img_prep_caption(fmt, caption, image_id, w):
    """The deterministic caption augmentation both sides build: PNG rows
    gain a contact email (credit lines real figure exports carry), JPEG
    rows a render-host IPv4 — so the PII scrub stage has real work whose
    outcome differs per row. Shared rule = shared columns only."""
    return F.when(
        fmt == "png",
        F.concat(
            caption, F.lit(" contact f"),
            F.substring(F.md5(image_id), 1, 6),
            F.lit("@lab.example.org"),
        ),
    ).otherwise(
        F.concat(
            caption, F.lit(" rendered at 10."),
            (w % 256).cast("string"), F.lit(".0.2"),
        )
    )


def _q_image_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END image+caption corpus prep over the input_hint payload
    table — the north rule's training-data composition, run as ONE
    DataFrame program:

      1. metadata gates — format whitelist + minimum pixel count, pure
         narrow filters on the table's typed columns (at 100 TB these
         prune the parquet scan before any byte of ``bytes`` is read);
      2. perceptual keep-one-per-cluster — phash banded pairs
         (`operators/dedup.py:phash_near_pairs`, only (image_id, phash)
         shuffles) → connected components → the min-id survivor per
         duplicate group;
      3. caption scrub — deterministic PII augmentation (see
         `_img_prep_caption`) then `functions/pii.py` chained redaction +
         counters, plus a whitespace token count — all JVM regex, zero
         Python, zero shuffle.

    Scale shape: stage-1 filters push to the scan; stage-2 shuffles the
    16-byte hash projection and broadcasts the component/size maps
    (bounded by the pair list); stage-3 is a narrow projection. The
    figure ``bytes`` column is never read. Oracle: pure-Python union-find
    over an independent brute-force pair scan of the GATED generator
    corpus, composed with a DuckDB twin of the gates + caption algebra."""
    from review_crawler_spark.functions.pii import pii_scrub
    from review_crawler_spark.operators.components import connected_components
    from review_crawler_spark.operators.dedup import phash_near_pairs
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _phash_corpus_ids())
    gated = imgs.filter(
        F.col("fmt").isin(*_IMG_PREP_FMTS)
        & (F.col("w") * F.col("h") >= _IMG_PREP_MIN_PIXELS)
    )
    pairs = phash_near_pairs(
        gated.select("image_id", "phash"), max_hamming=4
    )
    comp = connected_components(pairs, src="id_a", dst="id_b")
    sizes = comp.groupBy(F.col("component").alias("comp")).agg(
        F.count("*").alias("sz")
    )
    canon = (
        gated.join(F.broadcast(comp), gated.image_id == comp.id, "left")
        .select(
            "image_id", "fmt", "w", "h", "caption",
            F.coalesce("component", "image_id").alias("cluster_id"),
        )
        # keep-one: the min-label survivor (cluster_id IS the min id)
        .filter(F.col("image_id") == F.col("cluster_id"))
        .join(F.broadcast(sizes), F.col("cluster_id") == F.col("comp"), "left")
        .select(
            "image_id", "fmt", "w", "h", "caption",
            F.coalesce("sz", F.lit(1)).cast("int").alias("cluster_size"),
        )
    )
    aug = canon.withColumn(
        "caption",
        _img_prep_caption(
            F.col("fmt"), F.col("caption"), F.col("image_id"), F.col("w")
        ),
    )
    return (
        pii_scrub(aug, text_col="caption")
        .select(
            "image_id", "fmt",
            F.col("w").cast("int").alias("w"),
            F.col("h").cast("int").alias("h"),
            "cluster_size",
            F.col("n_email").cast("long").alias("n_email"),
            F.col("n_ipv4").cast("long").alias("n_ipv4"),
            F.col("redacted").alias("caption_clean"),
            F.size(F.split(F.col("redacted"), " ")).cast("long").alias(
                "n_caption_tokens"
            ),
        )
        .orderBy("image_id")
    )


def _sql_image_corpus_prep() -> str:
    """Composed oracle for `image_corpus_prep`: Python replays the gates
    and brute-force union-find over the generator metadata (independent
    of banding + label propagation), emits canonical rows as VALUES; the
    caption augmentation, RE2 scrub (identical regex subset, see
    `functions/pii.py`), counters, and token count run in DuckDB SQL."""
    from review_crawler_spark.functions.pii import REDACT_ORDER

    meta = _image_meta()
    ids = [
        i for i, m in meta.items()
        if m["fmt"] in _IMG_PREP_FMTS
        and m["w"] * m["h"] >= _IMG_PREP_MIN_PIXELS
    ]
    parent = {i: i for i in ids}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            xor = (meta[a]["phash"] ^ meta[b]["phash"]) & 0xFFFFFFFFFFFFFFFF
            if bin(xor).count("1") <= 4:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    roots: dict[str, list[str]] = {}
    for i in ids:
        roots.setdefault(find(i), []).append(i)
    rows = []
    for members in roots.values():
        canon = min(members)
        m = meta[canon]
        rows.append(
            f"('{canon}', '{m['fmt']}', {m['w']}, {m['h']}, "
            f"{len(members)})"
        )
    aug = (
        "CASE WHEN fmt = 'png' THEN "
        "'Caption for ' || image_id || ' contact f' || "
        "substr(md5(image_id), 1, 6) || '@lab.example.org' "
        "ELSE 'Caption for ' || image_id || ' rendered at 10.' || "
        "CAST(w % 256 AS VARCHAR) || '.0.2' END"
    )
    n_email = (
        f"CAST(len(regexp_extract_all(caption, '{REDACT_ORDER[0][1]}')) "
        "AS BIGINT)"
    )
    n_ipv4 = (
        f"CAST(len(regexp_extract_all(caption, '{REDACT_ORDER[1][1]}')) "
        "AS BIGINT)"
    )
    red = "caption"
    for _, pat, token in REDACT_ORDER:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH canon(image_id, fmt, w, h, cluster_size) AS (VALUES {", ".join(rows)}),
aug AS (
  SELECT image_id, fmt, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
         CAST(cluster_size AS INTEGER) AS cluster_size, {aug} AS caption
  FROM canon
)
SELECT image_id, fmt, w, h, cluster_size,
       {n_email} AS n_email, {n_ipv4} AS n_ipv4,
       {red} AS caption_clean,
       CAST(len(string_split({red}, ' ')) AS BIGINT) AS n_caption_tokens
FROM aug ORDER BY image_id
"""


def _video_corpus_ids() -> list[str]:
    """Deterministic video-payload corpus (animated GIF clips)."""
    return [f"www.mdpi.com/article/{n}/video1" for n in range(40)]


def _q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over real animated-GIF payloads: decode every video
    (`functions/gif.py` multi-frame walker), keep frames 0, 2, 4, …, emit
    exact per-frame features (dims, integer pixel sum, average-phash) —
    the video-modality pre-processing op (`functions/video.py`). One
    mapInPandas pass; rows never shuffle until the output sort."""
    from review_crawler_spark.functions.video import sample_frames
    from review_crawler_spark.sources.videos_table import videos_df

    vids = videos_df(spark, _video_corpus_ids())
    return (
        sample_frames(vids, every_k=2)
        .select("video_id", "frame_idx", "w", "h", "px_sum", "phash")
        .orderBy("video_id", "frame_idx")
    )


def _sql_video_frame_sample() -> str:
    """Oracle: expected per-frame stats from the pure frame generator
    (`videos_table.video_frames`) — never touches the GIF codec (the
    quantize-then-encode round trip is lossless by construction, so the
    generator IS the decoded ground truth). Verifies the animation
    encoder, the multi-frame decoder, and the sampling op end-to-end."""
    from review_crawler_spark.functions.images import average_phash
    from review_crawler_spark.sources.videos_table import video_frames

    rows = []
    for vid in _video_corpus_ids():
        frames = video_frames(vid)
        for idx in range(0, len(frames), 2):
            fr = frames[idx]
            rows.append(
                f"('{vid}', {idx}, {fr.shape[1]}, {fr.shape[0]}, "
                f"{int(fr.sum(dtype='int64'))}, {average_phash(fr)})"
            )
    return (
        "SELECT video_id, CAST(frame_idx AS INTEGER) AS frame_idx, "
        "CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h, "
        "CAST(px_sum AS BIGINT) AS px_sum, CAST(phash AS BIGINT) AS phash "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(video_id, frame_idx, "
        "w, h, px_sum, phash) ORDER BY video_id, frame_idx"
    )


def _audio_corpus_ids() -> list[str]:
    """Deterministic audio-payload corpus (real RIFF/WAVE PCM clips)."""
    return [f"www.mdpi.com/article/{n}/audio1" for n in range(48)]


def _q_audio_clip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip audio features over real WAV payloads: pure-Python RIFF
    walk + PCM decode (`functions/audio.py::decode_wav` — an end-to-end
    REAL codec path, WAV is lossless), then integer-exact energy /
    mean-abs / peak / zero-crossing features. One mapInPandas pass,
    zero shuffle before the output sort — the audio-modality analog of
    `video_frame_sample`."""
    from review_crawler_spark.functions.audio import audio_features
    from review_crawler_spark.sources.audio_table import audios_df

    auds = audios_df(spark, _audio_corpus_ids())
    return (
        audio_features(auds)
        .select(
            "audio_id", "sr", "channels", "n_samples", "sq_sum",
            "abs_sum", "peak", "zero_crossings",
        )
        .orderBy("audio_id")
    )


def _sql_audio_clip_features() -> str:
    """Oracle: expected per-clip stats from the pure sample generator
    (`audio_table.audio_samples`) — never touches the WAV container
    (encode→decode is bit-lossless, so the generator IS the decoded
    ground truth). Verifies encoder, chunk walker, and the feature op
    end-to-end."""
    from review_crawler_spark.functions.audio import clip_features
    from review_crawler_spark.sources.audio_table import audio_samples

    rows = []
    for aid in _audio_corpus_ids():
        samples = audio_samples(aid)
        sq, ab, pk, zc = clip_features(samples)
        rows.append(
            f"('{aid}', 8000, {samples.shape[1]}, {samples.shape[0]}, "
            f"{sq}, {ab}, {pk}, {zc})"
        )
    return (
        "SELECT audio_id, CAST(sr AS INTEGER) AS sr, "
        "CAST(channels AS INTEGER) AS channels, "
        "CAST(n_samples AS INTEGER) AS n_samples, "
        "CAST(sq_sum AS BIGINT) AS sq_sum, "
        "CAST(abs_sum AS BIGINT) AS abs_sum, CAST(peak AS INTEGER) AS peak, "
        "CAST(zero_crossings AS INTEGER) AS zero_crossings "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(audio_id, sr, channels, "
        "n_samples, sq_sum, abs_sum, peak, zero_crossings) ORDER BY audio_id"
    )


def _q_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio analysis: every full 256-sample window at a
    512-sample hop, integer energy/peak/zero-crossings per window
    (`functions/audio.py::sample_audio_windows`) — the frame-sampling op
    on the sample axis; hop controls the row explosion the way every_k
    does for video frames. One mapInPandas, zero shuffle."""
    from review_crawler_spark.functions.audio import sample_audio_windows
    from review_crawler_spark.sources.audio_table import audios_df

    auds = audios_df(spark, _audio_corpus_ids())
    return (
        sample_audio_windows(auds, win=256, hop=512)
        .select(
            "audio_id", "win_idx", "start", "sq_sum", "peak",
            "zero_crossings",
        )
        .orderBy("audio_id", "win_idx")
    )


def _sql_audio_window_energy() -> str:
    """Oracle: the same windows sliced from the pure generator's
    channel-0 samples (codec-independent, like the video frame oracle)."""
    import numpy as np

    from review_crawler_spark.functions.audio import _zero_crossings
    from review_crawler_spark.sources.audio_table import audio_samples

    win, hop = 256, 512
    rows = []
    for aid in _audio_corpus_ids():
        mono = audio_samples(aid)[:, 0]
        for w in range((len(mono) - win) // hop + 1):
            seg = mono[w * hop:w * hop + win]
            wide = seg.astype(np.int64)
            rows.append(
                f"('{aid}', {w}, {w * hop}, {int((wide * wide).sum())}, "
                f"{int(np.abs(wide).max())}, {_zero_crossings(seg)})"
            )
    return (
        "SELECT audio_id, CAST(win_idx AS INTEGER) AS win_idx, "
        "CAST(start AS INTEGER) AS start, CAST(sq_sum AS BIGINT) AS sq_sum, "
        "CAST(peak AS INTEGER) AS peak, "
        "CAST(zero_crossings AS INTEGER) AS zero_crossings "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(audio_id, win_idx, "
        "start, sq_sum, peak, zero_crossings) ORDER BY audio_id, win_idx"
    )


def _q_image_resize_thumbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail normalization over the figure corpus: decode → 12×12
    nearest-neighbor resample → exact per-thumbnail features
    (`functions/resize.py`). Restricted to the LOSSLESS formats (png/gif)
    so the oracle can derive expectations from generator pixels without
    replaying the codec; jpeg rows go through the same op in units where
    the PSNR gate (not bit-equality) is the contract. One mapInPandas,
    zero shuffle before the sort."""
    from review_crawler_spark.functions.resize import resize_images
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _phash_corpus_ids()).filter(F.col("fmt") != "jpeg")
    return (
        resize_images(imgs, 12, 12, method="nearest")
        .select("image_id", "px_sum", "phash")
        .orderBy("image_id")
    )


def _q_image_pixel_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-statistic quality gating (the LAION/DataComp-style decode-pass
    filter, `functions/imgquality.py`): ONE Arrow decode extracts exact
    integer counters (BT.601 luma moments, saturation, edge count, luma
    histogram bins), then the verdict is a narrow JVM projection of integer
    cross-multiplications — zero shuffle end-to-end. Restricted to the
    LOSSLESS formats so the oracle derives counters from generator pixels;
    jpeg goes through the same op in units (PSNR-gated codec)."""
    from review_crawler_spark.functions.imgquality import (
        image_quality_stats,
        with_quality_verdict,
    )
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _phash_corpus_ids()).filter(F.col("fmt") != "jpeg")
    return (
        with_quality_verdict(image_quality_stats(imgs))
        .select(
            "image_id", "n_px", "luma_sum", "luma_sumsq", "sat_sum",
            "edge_count", "luma_bins", "passes",
        )
        .orderBy("image_id")
    )


def _sql_image_pixel_gate() -> str:
    """Oracle: independent scalar-loop counters over the generator's
    pre-encode pixels (lossless round trip makes those the decoded ground
    truth) as inline VALUES, with the gate arithmetic re-expressed in SQL
    integer cross-multiplications — the verdict logic is checked in a
    second, independent language."""
    from review_crawler_spark.sources.images_table import make_image

    rows = []
    for i in _phash_corpus_ids():
        rec = make_image(i)
        if rec["fmt"] == "jpeg":
            continue
        px = rec["_pixels"]
        h, w = px.shape[:2]
        s = sq = sat = edges = 0
        bins = set()
        luma = [[0] * w for _ in range(h)]
        for y in range(h):
            for x in range(w):
                r, g, b = int(px[y, x, 0]), int(px[y, x, 1]), int(px[y, x, 2])
                lv = (77 * r + 150 * g + 29 * b) // 256
                luma[y][x] = lv
                s += lv
                sq += lv * lv
                sat += max(r, g, b) - min(r, g, b)
                bins.add(lv // 16)
        for y in range(h):
            for x in range(1, w):
                if abs(luma[y][x] - luma[y][x - 1]) > 16:
                    edges += 1
        rows.append(
            f"('{i}', {h * w}, {s}, {sq}, {sat}, {edges}, {len(bins)})"
        )
    return (
        "SELECT image_id, n_px, luma_sum, luma_sumsq, sat_sum, edge_count, "
        "luma_bins, "
        "(luma_sum * 1000 >= 20000 * n_px AND luma_sum * 1000 <= 235000 * n_px"
        " AND (n_px * luma_sumsq - luma_sum * luma_sum) * 1000 >= 25000 * n_px * n_px"
        " AND sat_sum * 1000 >= 5000 * n_px"
        " AND edge_count * 1000 >= 20 * n_px"
        " AND luma_bins >= 3 AND n_px > 0) AS passes "
        "FROM (SELECT image_id, CAST(n_px AS BIGINT) AS n_px, "
        "CAST(luma_sum AS BIGINT) AS luma_sum, "
        "CAST(luma_sumsq AS BIGINT) AS luma_sumsq, "
        "CAST(sat_sum AS BIGINT) AS sat_sum, "
        "CAST(edge_count AS BIGINT) AS edge_count, "
        "CAST(luma_bins AS INT) AS luma_bins FROM (VALUES " + ", ".join(rows)
        + ") AS t(image_id, n_px, luma_sum, luma_sumsq, sat_sum, edge_count, "
        "luma_bins)) ORDER BY image_id"
    )


def _sql_image_resize_thumbs() -> str:
    """Oracle: scalar-loop nearest resize (independently implemented from
    the same public index convention) over the generator's pre-encode
    pixels — the lossless-codec round trip makes those the decoded ground
    truth, so this checks decode + the vectorized gather end-to-end."""
    from review_crawler_spark.functions.images import average_phash
    from review_crawler_spark.sources.images_table import make_image

    rows = []
    for i in _phash_corpus_ids():
        r = make_image(i)
        if r["fmt"] == "jpeg":
            continue
        px = r["_pixels"]
        sh, sw = px.shape[:2]
        import numpy as np

        thumb = np.zeros((12, 12, 3), dtype=np.uint8)
        for y in range(12):
            for x in range(12):
                thumb[y, x] = px[(y * sh) // 12, (x * sw) // 12]
        rows.append(
            f"('{i}', {int(thumb.sum(dtype='int64'))}, "
            f"{average_phash(thumb)})"
        )
    return (
        "SELECT image_id, CAST(px_sum AS BIGINT) AS px_sum, "
        "CAST(phash AS BIGINT) AS phash FROM (VALUES "
        + ", ".join(rows)
        + ") AS t(image_id, px_sum, phash) ORDER BY image_id"
    )


_SAMPLE_RATES = {"en": 0.5, "de": 0.25}
_SAMPLE_DEFAULT = 0.1
_SAMPLE_SALT = "split1"


def _q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible stratified Bernoulli sample of the documents corpus
    (`operators/sampling.py`): per-language keep rates keyed off
    md5(doc_id || salt), so membership is a pure row function — re-runs,
    retries, and repartitions select the SAME corpus (df.sample() does
    not survive a partitioning change). Pure narrow filter: no shuffle."""
    from review_crawler_spark.operators.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    return (
        stratified_sample(
            docs, "lang", _SAMPLE_RATES, "doc_id",
            default_rate=_SAMPLE_DEFAULT, salt=_SAMPLE_SALT,
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _sql_sample_stratified() -> str:
    """DuckDB twin: the identical md5-prefix string comparison (md5 is
    md5 — both engines hash the same UTF-8 bytes to the same lowercase
    hex), thresholds computed inline from the rates."""
    def hx(rate: float) -> str:
        return format(int(rate * 16 ** 15), "x").zfill(15)

    whens = " ".join(
        f"WHEN '{v}' THEN '{hx(r)}'" for v, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE substring(md5(doc_id || '{_SAMPLE_SALT}'), 1, 15) <
      CASE lang {whens} ELSE '{hx(_SAMPLE_DEFAULT)}' END
ORDER BY doc_id
"""


def _q_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k=7 documents per language, chosen by hash rank — the
    deterministic per-stratum quota draw (eval-set construction, per-
    domain caps). One shuffle on the stratum key; rank order is
    (md5 prefix, doc_id) so even hash-prefix ties are deterministic."""
    from review_crawler_spark.operators.sampling import sample_exact_k

    docs = load(spark, sf_dir, "documents")
    return (
        sample_exact_k(docs, "lang", 7, "doc_id", salt=_SAMPLE_SALT)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_SQL_SAMPLE_EXACT_K = f"""
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY substring(md5(doc_id || '{_SAMPLE_SALT}'), 1, 15), doc_id
         ) AS rk
  FROM documents
) WHERE rk <= 7
ORDER BY doc_id
"""


def _q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible global corpus shuffle: every document gets a dense
    0-based position in md5(doc_id || salt) order plus a round-robin
    shard id — the training-order assignment. Distributed two-pass
    ranking (bucket-prefix counts + offsets), bit-identical to the
    naive single-task global row_number the oracle runs."""
    from review_crawler_spark.operators.ordering import global_shuffle

    docs = load(spark, sf_dir, "documents")
    return (
        global_shuffle(docs, "doc_id", salt=_SAMPLE_SALT, num_shards=8)
        .select("doc_id", "lang", "position", "shard")
        .orderBy("position")
    )


_SQL_GLOBAL_SHUFFLE = f"""
SELECT doc_id, lang,
       rn - 1 AS position,
       CAST((rn - 1) % 8 AS INTEGER) AS shard
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           ORDER BY substring(md5(doc_id || '{_SAMPLE_SALT}'), 1, 15), doc_id
         ) AS rn
  FROM documents
)
ORDER BY position
"""


def _q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC 1.1 archive round trip (sources/warc.py): the documents table
    is archived as gzip-member WARC segments (one per partition — the
    Common Crawl segment layout a crawl tier persists payloads in at
    10^10-URL scale), read back through the distributed segment parser,
    and audited per record: payload byte count + md5 prove the
    sink→source path is byte-faithful. The oracle computes the same
    audit directly from the source table, so any framing, truncation, or
    encoding defect in either direction hash-mismatches."""
    import tempfile

    from review_crawler_spark.sources.warc import read_warc, write_warc

    docs = load(spark, sf_dir, "documents")
    archive = docs.repartition(8, "doc_id").select(
        F.concat(F.lit("https://corpus.example/doc/"), "doc_id").alias("url"),
        F.lit("2026-01-01T00:00:00Z").alias("date"),
        F.lit("text/plain; charset=utf-8").alias("content_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    out = tempfile.mkdtemp(prefix="warc_q_")
    write_warc(archive, out, compress=True)
    return (
        read_warc(spark, out)
        .select(
            F.regexp_extract("url", r"/doc/(.+)$", 1).alias("doc_id"),
            F.length("payload").alias("n_bytes"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


_SQL_WARC_ROUNDTRIP = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
ORDER BY doc_id
"""


def _q_warc_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX random-access read path (sources/warc.py): archive the corpus
    as WARC segments + a distributed CDX sidecar (offset/length of each
    record's own gzip member), then POINT-FETCH a url-filtered slice —
    seek+read+inflate per record, no segment ever scanned. This is how a
    100 TB archive serves record lookups (Common Crawl's cdx-index);
    the audit columns prove fetched bytes match the source exactly."""
    import tempfile

    from review_crawler_spark.sources.warc import (
        fetch_warc_records,
        write_warc_with_cdx,
    )

    docs = load(spark, sf_dir, "documents")
    archive = docs.repartition(8, "doc_id").select(
        F.concat(F.lit("https://corpus.example/doc/"), "doc_id").alias("url"),
        F.lit("2026-01-01T00:00:00Z").alias("date"),
        F.lit("text/plain; charset=utf-8").alias("content_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    base = tempfile.mkdtemp(prefix="warc_cdx_q_")
    cdx = write_warc_with_cdx(
        archive, f"{base}/segments", f"{base}/cdx", compress=True
    )
    hits = cdx.filter(F.col("url").endswith("7"))
    return (
        fetch_warc_records(spark, hits)
        .select(
            F.regexp_extract("url", r"/doc/(.+)$", 1).alias("doc_id"),
            F.length("payload").alias("n_bytes"),
            F.md5("payload").alias("payload_md5"),
        )
        .orderBy("doc_id")
    )


_SQL_WARC_CDX_LOOKUP = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
WHERE CAST(doc_id AS VARCHAR) LIKE '%7'
ORDER BY doc_id
"""


def _q_sitemap_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery feed (sources/sitemaps.py): the corpus published
    as a sitemaps.org directory (one <urlset> per partition + an index,
    the 50k-cap layout), scanned back distributed (one task per file)
    and scored into engine seed rows — priority = days(lastmod)*10 +
    publisher hint in tenths, the north star's recency-dominant ordering,
    all integer math. The oracle recomputes url/priority/lastmod straight
    from the source table."""
    import tempfile

    from review_crawler_spark.sources.sitemaps import (
        scan_sitemaps,
        sitemap_seed_frontier,
        write_sitemaps,
    )

    docs = load(spark, sf_dir, "documents")
    pub = docs.repartition(8, "doc_id").select(
        F.concat(F.lit("https://corpus.example/doc/"), "doc_id").alias("loc"),
        F.date_format(
            F.date_add(
                F.lit("2020-01-01").cast("date"),
                (F.col("doc_id") % 1500).cast("int"),
            ),
            "yyyy-MM-dd",
        ).alias("lastmod"),
        ((F.col("doc_id") % 10) / 10.0).alias("priority_hint"),
    )
    out = tempfile.mkdtemp(prefix="sitemaps_q_")
    write_sitemaps(pub, out)
    return (
        sitemap_seed_frontier(scan_sitemaps(spark, out))
        .select(
            "url",
            "priority",
            F.date_format("lastmod_date", "yyyy-MM-dd").alias("lastmod"),
        )
        .orderBy("url")
    )


_SQL_SITEMAP_SEED = """
SELECT 'https://corpus.example/doc/' || doc_id AS url,
       date_diff('day', DATE '1970-01-01',
                 DATE '2020-01-01' + CAST(doc_id % 1500 AS INTEGER)) * 10
         + CAST(round((doc_id % 10) / 10.0 * 9) AS BIGINT) AS priority,
       strftime(DATE '2020-01-01' + CAST(doc_id % 1500 AS INTEGER),
                '%Y-%m-%d') AS lastmod
FROM documents
ORDER BY url
"""


_ALIGN_VOCAB = (
    "spectra sample measurement dose response control cohort gradient "
    "histogram baseline variance protein neuron lattice plasma seismic "
    "alloy catalyst polymer orbit"
).split()


def _align_corpus_rows() -> list[tuple[str, str]]:
    """(image_id, caption) pairs over the phash corpus: captions carry the
    figure's article number plus four vocab words seeded off the SOURCE
    id; every third pair gets the caption of another figure (the planted
    LAION-style misalignment the gate should catch)."""
    import zlib as _zl

    ids = sorted(_phash_corpus_ids())

    def cap_for(i: str) -> str:
        n = _zl.crc32(i.encode())
        words = [
            _ALIGN_VOCAB[(n >> k) % len(_ALIGN_VOCAB)] for k in (2, 5, 8, 11)
        ]
        num = i.split("/article/")[1].split("/")[0]
        return f"Figure {num}: " + " ".join(words)

    return [
        (i, cap_for(ids[(j + 7) % len(ids)] if j % 3 == 2 else i))
        for j, i in enumerate(ids)
    ]


def _q_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption–image alignment gate (operators/alignment.py — the LAION /
    DataComp URL+metadata token-overlap pair filter): image-side evidence
    is the REAL header-walk comment extraction from the encoded bitstream
    (no pixel decode) plus URL tokens; caption/evidence token sets,
    overlap/union counts, and the keep-iff-≥2-overlapping-tokens verdict
    are all JVM array expressions. The oracle re-derives the evidence
    from the generator's intent and recomputes the token logic in SQL."""
    from review_crawler_spark.functions.imgmeta import sniff_images
    from review_crawler_spark.operators.alignment import (
        caption_alignment_scores,
    )
    from review_crawler_spark.sources.images_table import images_df

    rows = _align_corpus_rows()
    caps = spark.createDataFrame(rows, "image_id string, caption string")
    imgs = images_df(spark, [r[0] for r in rows]).drop("caption")
    pairs = (
        sniff_images(imgs)
        .withColumn("url", F.concat(F.lit("https://"), "image_id"))
        .join(F.broadcast(caps), "image_id")
    )
    return (
        caption_alignment_scores(pairs)
        .select(
            "image_id",
            "n_caption",
            "n_evidence",
            "n_overlap",
            "n_union",
            F.col("aligned").cast("int").alias("aligned"),
        )
        .orderBy("image_id")
    )


def _sql_caption_align() -> str:
    """Oracle: inline VALUES of (image_id, caption, comment, url) — the
    comment from the generator's intent (``figure {id}``), NOT the sniffer
    — with tokenize/intersect/union/verdict re-expressed in DuckDB list
    functions."""
    vals = ", ".join(
        f"('{i}', '{c}', 'figure {i}', 'https://{i}')"
        for i, c in _align_corpus_rows()
    )
    return f"""
WITH pairs(image_id, caption, comment, url) AS (VALUES {vals}),
tok AS (
  SELECT image_id,
         list_distinct(list_filter(
           string_split_regex(lower(caption), '[^a-z0-9]+'), t -> t <> ''
         )) AS cap,
         list_distinct(list_filter(
           string_split_regex(lower(comment || ' ' || url), '[^a-z0-9]+'),
           t -> t <> ''
         )) AS ev
  FROM pairs
)
SELECT image_id,
       len(cap) AS n_caption,
       len(ev) AS n_evidence,
       len(list_intersect(cap, ev)) AS n_overlap,
       len(list_distinct(list_concat(cap, ev))) AS n_union,
       CAST(len(ev) = 0 OR len(list_intersect(cap, ev)) >= 2 AS INTEGER)
         AS aligned
FROM tok
ORDER BY image_id
"""


def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by tf · N/df (linear idf —
    integer-exact IEEE scoring, so Spark and the oracle rank
    identically; see operators/tfidf.py). Integer outputs only."""
    from review_crawler_spark.operators.tfidf import tfidf_topk_terms

    docs = load(spark, sf_dir, "documents")
    return tfidf_topk_terms(docs, "doc_id", "text", k=3).orderBy(
        "doc_id", "rk"
    )


_SQL_TFIDF_TOPK = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
    FROM documents
  )
  WHERE term <> ''
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
SELECT doc_id, term, tf, df, CAST(rk AS INTEGER) AS rk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY (CAST(tf.tf AS DOUBLE) * n.n / CAST(dfreq.df AS DOUBLE))
                    DESC, tf.term
         ) AS rk
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
WHERE rk <= 3
ORDER BY doc_id, rk
"""


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of backward join: each click event picks up the latest prior
    error event of the same user (null when none) — the SCD-style
    "state in force at event time" lookup. Union/carry-forward plan:
    one shuffle on the key, no inequality join (operators/temporal.py)."""
    from review_crawler_spark.operators.temporal import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("err_event_id"))
        .withColumnRenamed("ts", "err_ts")
    )
    return (
        asof_join(
            clicks, errors, ["user_id"], "ts", "err_ts",
            ["err_event_id", "err_ts"],
        )
        .select(
            "event_id", "user_id", "err_event_id",
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.col("err_ts").cast("timestamp"))).alias("lag_us"),
        )
        .orderBy("event_id")
    )


_SQL_ASOF_JOIN = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
errors AS (
  SELECT user_id, ts AS err_ts, max(event_id) AS err_event_id
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, e.err_event_id,
       epoch_us(c.ts) - epoch_us(e.err_ts) AS lag_us
FROM clicks c ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND c.ts >= e.err_ts
ORDER BY event_id
"""


def _q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join: clicks landing inside the 10-minute
    window opened by each view of the same user. Equi-binned strategy —
    intervals explode to their covered time buckets, points key to one
    bucket, plain (user, bucket) hash join + exact containment filter;
    no BroadcastNestedLoopJoin, no cartesian (operators/temporal.py)."""
    from review_crawler_spark.operators.temporal import range_join

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id",
        F.col("ts").alias("v_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("v_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    return (
        range_join(
            clicks, views, ["user_id"], "ts", "v_start", "v_end",
            bucket_seconds=600,
        )
        .select(
            "view_id", "click_id",
            (F.unix_micros(F.col("ts").cast("timestamp"))
             - F.unix_micros(F.col("v_start").cast("timestamp"))).alias(
                "offset_us"
            ),
        )
        .orderBy("view_id", "click_id")
    )


_SQL_RANGE_JOIN = """
WITH views AS (
  SELECT event_id AS view_id, user_id, ts AS v_start,
         ts + INTERVAL 10 MINUTE AS v_end
  FROM events WHERE event_type = 'view'
),
clicks AS (
  SELECT event_id AS click_id, user_id, ts
  FROM events WHERE event_type = 'click'
)
SELECT view_id, click_id, epoch_us(ts) - epoch_us(v_start) AS offset_us
FROM views JOIN clicks USING (user_id)
WHERE ts >= v_start AND ts < v_end
ORDER BY view_id, click_id
"""


def _q_recrawl_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cho/Garcia-Molina recrawl policy: rank pages (users stand in for
    URLs, `value` is the content-change signal) by expected staleness —
    observed change rate × time since last fetch — and keep the top 20
    to feed expire_seen/enqueue. Integer outputs; the IEEE-stable score
    never leaves the plan (operators/freshness.py)."""
    from review_crawler_spark.operators.freshness import (
        change_rate_priorities,
    )

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    return change_rate_priorities(
        ev, "user_id", "ts", "value", top_k=20
    ).orderBy("rk")


_SQL_RECRAWL = """
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN lag(value) OVER w IS NOT NULL
                   AND value <> lag(value) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)
),
rates AS (
  SELECT user_id, count(*) AS n_obs, CAST(sum(chg) AS BIGINT) AS n_changes,
         min(us) AS f, max(us) AS l
  FROM marked GROUP BY user_id
),
nowt AS (SELECT max(us) AS now FROM marked)
SELECT user_id, n_obs, n_changes, rk FROM (
  SELECT user_id, n_obs, n_changes,
         CAST(row_number() OVER (
           ORDER BY score DESC NULLS LAST, user_id
         ) AS INTEGER) AS rk
  FROM (
    SELECT r.*,
           CASE WHEN l > f
                THEN CAST(n_changes AS DOUBLE) * CAST(now - l AS DOUBLE)
                     / CAST(l - f AS DOUBLE)
           END AS score
    FROM rates r CROSS JOIN nowt
  )
)
WHERE rk <= 20
ORDER BY rk
"""


def _q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition counters over the documents table
    (`functions/text.py:repetition_stats`): per-doc token totals, top
    unigram/bigram occurrence counts, duplicated-trigram positions — the
    boilerplate/spam filters a training-data pipeline thresholds on.
    Exact integers only (no float hashing). Shuffles carry (doc_id, gram,
    count) rows, never document text."""
    docs = load(spark, sf_dir, "documents")
    return X.repetition_stats(docs).orderBy("doc_id")


_SQL_QUALITY_REPETITION = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
uni AS (
  SELECT doc_id, unnest(toks) AS g FROM t
),
ucnt AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
uagg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(max(c) AS BIGINT) AS top_unigram
  FROM ucnt GROUP BY 1
),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
                               i -> toks[i] || ' ' || toks[i + 1])) AS g
  FROM t
),
bcnt AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
bagg AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram FROM bcnt GROUP BY 1
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1] || ' '
                                    || toks[i + 2])) AS g
  FROM t
),
tcnt AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
tagg AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
           AS dup_trigram_pos,
         CAST(sum(c) AS BIGINT) AS n_trigrams
  FROM tcnt GROUP BY 1
)
SELECT u.doc_id, u.n_tokens, u.top_unigram,
       COALESCE(b.top_bigram, 0) AS top_bigram,
       COALESCE(g.dup_trigram_pos, 0) AS dup_trigram_pos,
       COALESCE(g.n_trigrams, 0) AS n_trigrams
FROM uagg u
LEFT JOIN bagg b USING (doc_id)
LEFT JOIN tagg g USING (doc_id)
ORDER BY doc_id
"""


def _q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity quality bucketing (CCNet's third pillar after
    dedup + langid — `operators/lm_quality.py`): add-1-smoothed token
    bigram model trained on the corpus itself, every document scored by
    its average negative log-likelihood and bucketed by integer nats.
    Per-bigram NLL is quantized to integer tenth-milli-nats inside the LM
    dim, so per-doc sums are order-independent long arithmetic — the
    DuckDB twin reproduces them bit-for-bit."""
    from review_crawler_spark.operators.lm_quality import lm_quality_score

    docs = load(spark, sf_dir, "documents")
    return lm_quality_score(docs).orderBy("doc_id")


_SQL_LM_QUALITY = r"""
WITH words AS (
  SELECT doc_id,
         regexp_split_to_array(
           trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                               '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
         unnest(list_transform(range(1, len(w)), i -> w[i+1])) AS w2
  FROM words WHERE len(w) >= 2
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2
), c1 AS (
  SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY w1
), v AS (
  SELECT count(DISTINCT w) AS v
  FROM (SELECT w1 AS w FROM bg UNION ALL SELECT w2 AS w FROM bg)
), lm AS (
  SELECT w1, w2,
         CAST(round((ln(c1 + v) - ln(c12 + 1)) * 10000, 0) AS BIGINT) AS nll_e4
  FROM c12 JOIN c1 USING (w1) CROSS JOIN v
), sc AS (
  SELECT doc_id, count(*) AS n, sum(nll_e4) AS s
  FROM bg JOIN lm USING (w1, w2) GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS INT) AS n_bigrams,
       CAST(s AS BIGINT) AS nll_e4,
       round(s / 10000.0 / n, 6) AS avg_nll,
       CAST(floor(s / 10000.0 / n) AS INT) AS quality_bucket
FROM sc
ORDER BY doc_id
"""


def _q_host_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level quality gate (`operators/host_quality.py` —
    RefinedWeb-style URL filtering): aggregate integer quality signals per
    source host, keep documents whose host passes the short-doc-share and
    mean-length gates. The verdict dim is broadcast back; all verdicts are
    integer cross-multiplications so the DuckDB twin is bit-exact."""
    from review_crawler_spark.operators.host_quality import host_quality_filter

    docs = load(spark, sf_dir, "documents")
    return (
        host_quality_filter(docs)
        .select("doc_id", "source", "n_docs", "n_tokens", "n_short")
        .orderBy("doc_id")
    )


_SQL_HOST_QUALITY = r"""
WITH sig AS (
  SELECT doc_id, source,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS tok
  FROM documents
), agg AS (
  SELECT source AS host, count(*) AS n_docs, sum(tok) AS n_tokens,
         sum(CASE WHEN tok < 20 THEN 1 ELSE 0 END) AS n_short
  FROM sig GROUP BY source
), kept AS (
  SELECT * FROM agg
  WHERE n_short * 100 <= n_docs * 8 AND n_tokens >= n_docs * 48
)
SELECT s.doc_id, s.source,
       CAST(k.n_docs AS BIGINT) AS n_docs,
       CAST(k.n_tokens AS BIGINT) AS n_tokens,
       CAST(k.n_short AS BIGINT) AS n_short
FROM sig s JOIN kept k ON s.source = k.host
ORDER BY s.doc_id
"""


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (`functions/pii.py`): the documents text
    is deterministically augmented with one synthetic email / IPv4 / phone
    per row (pure arithmetic on doc_id, built identically by the SQL twin),
    then scrubbed. Counts scan the original text; redaction chains in
    REDACT_ORDER. Pure narrow projection — JVM regex, zero shuffle."""
    from review_crawler_spark.functions.pii import pii_scrub

    docs = load(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org via 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1 call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return (
        pii_scrub(aug)
        .select(
            "doc_id",
            F.col("n_email").cast("long").alias("n_email"),
            F.col("n_ipv4").cast("long").alias("n_ipv4"),
            F.col("n_phone").cast("long").alias("n_phone"),
            "redacted",
        )
        .orderBy("doc_id")
    )


def _sql_pii_scrub() -> str:
    """DuckDB twin: RE2 and Java regex agree on the shared pattern subset
    (classes, bounded repeats, \\b); redaction order mirrored from
    REDACT_ORDER so the chained regexp_replace is byte-identical."""
    from review_crawler_spark.functions.pii import REDACT_ORDER

    aug = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.org via 10.' || CAST(doc_id % 256 AS VARCHAR) || "
        "'.0.1 call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat, _ in REDACT_ORDER
    )
    red = "text"
    for _, pat, token in REDACT_ORDER:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS text FROM documents)
SELECT doc_id, {counts}, {red} AS redacted
FROM aug ORDER BY doc_id
"""


_LINE_DEDUP_MAX = 50


def _line_corpus(docs: DataFrame) -> DataFrame:
    """Synthetic multi-line corpus over doc_id (built identically in SQL):
    a universal cookie-banner line, a ~71×-repeated footer, a unique body
    line, and a sparse promo line on every third doc — so the threshold
    genuinely splits keep/drop and order preservation is visible."""
    return docs.select(
        "doc_id",
        F.expr(
            "concat_ws(char(10), 'cookie banner', "
            "concat('footer ', CAST(doc_id % 7 AS STRING)), "
            "concat('body ', CAST(doc_id AS STRING)), "
            "IF(doc_id % 3 = 0, "
            "concat('promo ', CAST(doc_id % 11 AS STRING)), NULL))"
        ).alias("text"),
    )


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-corpus line dedup (`operators/linededup.py`):
    drop every line occurring more than 50× corpus-wide, reassemble docs
    from surviving lines in original order. Count shuffle carries 64-bit
    line hashes only; the decision join keys on the hash."""
    from review_crawler_spark.operators.linededup import line_dedup

    docs = load(spark, sf_dir, "documents")
    out = line_dedup(_line_corpus(docs), max_occurrences=_LINE_DEDUP_MAX)
    return (
        out.select(
            "doc_id",
            F.col("n_lines").cast("long").alias("n_lines"),
            "n_kept",
            "clean_text",
        ).orderBy("doc_id")
    )


def _sql_line_dedup() -> str:
    return f"""
WITH corpus AS (
  SELECT doc_id, concat_ws(chr(10), 'cookie banner',
    'footer ' || CAST(doc_id % 7 AS VARCHAR),
    'body ' || CAST(doc_id AS VARCHAR),
    CASE WHEN doc_id % 3 = 0
         THEN 'promo ' || CAST(doc_id % 11 AS VARCHAR) END) AS text
  FROM documents),
t AS (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus),
ln AS (SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
                             i -> {{'pos': i, 'line': l[i]}})) AS s FROM t),
l2 AS (SELECT doc_id, s.pos AS pos, s.line AS line FROM ln),
cnt AS (SELECT line, count(*) AS n FROM l2 GROUP BY 1),
keep AS (SELECT doc_id, pos, line FROM l2 JOIN cnt USING (line)
         WHERE n <= {_LINE_DEDUP_MAX}),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS clean_text
        FROM keep GROUP BY 1),
tot AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS n_lines FROM t)
SELECT t.doc_id, t.n_lines,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.clean_text, '') AS clean_text
FROM tot t LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


_PREP_RATES = {"en": 0.8, "de": 0.6}
_PREP_DEFAULT = 0.4
_PREP_SALT = "prep1"


def _q_corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus preparation COMPOSITE — the whole training-data
    prep path as one DataFrame program: Gopher-style repetition/length
    gates (integer-exact thresholds over `repetition_stats`) -> per-
    language reproducible hash sampling (`stratified_sample`) -> concat-
    and-chunk packing (`pack_chunks`). Proves the operator families
    compose; every stage keeps its scale shape (gram shuffles carry
    counts, the sample is a narrow filter, the prefix sum is the two-pass
    scan)."""
    from review_crawler_spark.functions.text import repetition_stats
    from review_crawler_spark.operators.packing import pack_chunks
    from review_crawler_spark.operators.sampling import stratified_sample

    docs = load(spark, sf_dir, "documents")
    rep = repetition_stats(docs)
    survivors = (
        docs.join(rep, "doc_id")
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("top_unigram") * 5 <= F.col("n_tokens"))
            & (F.col("dup_trigram_pos") * 10 <= F.col("n_trigrams") * 3)
        )
    )
    sampled = stratified_sample(
        survivors, "lang", _PREP_RATES, "doc_id",
        default_rate=_PREP_DEFAULT, salt=_PREP_SALT,
    ).select("doc_id", "n_tokens")
    return pack_chunks(sampled, _PACK_CAPACITY).orderBy("chunk_id", "doc_id")


def _sql_corpus_prep_pipeline() -> str:
    """DuckDB twin: the composed SQL of the three stages (gram-count
    CTEs, the identical md5-prefix comparison, window cumsum + span
    explode)."""
    from review_crawler_spark.operators.sampling import rate_threshold

    whens = " ".join(
        f"WHEN '{v}' THEN '{rate_threshold(r)}'"
        for v, r in sorted(_PREP_RATES.items())
    )
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
uni AS (SELECT doc_id, unnest(toks) AS g FROM t),
ucnt AS (SELECT doc_id, g, count(*) AS c FROM uni GROUP BY 1, 2),
uagg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                CAST(max(c) AS BIGINT) AS top_unigram
         FROM ucnt GROUP BY 1),
tri AS (SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i + 1] || ' '
                           || toks[i + 2])) AS g
        FROM t),
tcnt AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
tagg AS (SELECT doc_id,
                CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                  AS dup_pos,
                CAST(sum(c) AS BIGINT) AS n_tri
         FROM tcnt GROUP BY 1),
surv AS (
  SELECT d.doc_id, u.n_tokens AS n
  FROM documents d JOIN uagg u USING (doc_id)
       LEFT JOIN tagg g USING (doc_id)
  WHERE u.n_tokens >= 20 AND u.top_unigram * 5 <= u.n_tokens
    AND COALESCE(g.dup_pos, 0) * 10 <= COALESCE(g.n_tri, 0) * 3
    AND substring(md5(CAST(d.doc_id AS VARCHAR) || '{_PREP_SALT}'), 1, 15) <
        CASE d.lang {whens} ELSE '{rate_threshold(_PREP_DEFAULT)}' END
),
c AS (SELECT doc_id, n,
             COALESCE(CAST(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS cb
      FROM surv WHERE n > 0),
x AS (SELECT doc_id, n, cb,
             unnest(range(cb // {_PACK_CAPACITY},
                          (cb + n - 1) // {_PACK_CAPACITY} + 1)) AS chunk_id
      FROM c)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
       CAST(greatest(0, chunk_id * {_PACK_CAPACITY} - cb) AS BIGINT)
         AS tok_start,
       CAST(least(n, (chunk_id + 1) * {_PACK_CAPACITY} - cb) AS BIGINT)
         AS tok_end
FROM x ORDER BY chunk_id, doc_id
"""


_PACK_CAPACITY = 64


def _q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (`operators/packing.py`): the
    chunk manifest for 64-token training windows over the documents
    corpus in doc_id order. The global exclusive prefix sum runs as a
    two-pass distributed scan (per-partition totals -> P-row collect ->
    zero-shuffle mapInPandas cumsum), never a single-task global window."""
    from review_crawler_spark.operators.packing import pack_chunks

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    return pack_chunks(docs, _PACK_CAPACITY).orderBy("chunk_id", "doc_id")


_SQL_PACK_CHUNKS = f"""
WITH d AS (SELECT doc_id,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
c AS (SELECT doc_id, n,
             COALESCE(CAST(sum(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS cb
      FROM d WHERE n > 0),
x AS (SELECT doc_id, n, cb,
             unnest(range(cb // {_PACK_CAPACITY},
                          (cb + n - 1) // {_PACK_CAPACITY} + 1)) AS chunk_id
      FROM c)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id,
       CAST(greatest(0, chunk_id * {_PACK_CAPACITY} - cb) AS BIGINT)
         AS tok_start,
       CAST(least(n, (chunk_id + 1) * {_PACK_CAPACITY} - cb) AS BIGINT)
         AS tok_end
FROM x ORDER BY chunk_id, doc_id
"""


_MIX_FACTORS = {"en": 0.6, "de": 2.5, "fr": 3.0, "zh": 0.0}
_MIX_SALT = "mix-r4"


def _q_mix_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing by repeat-and-sample (`operators/mixing.py`): apply
    a target mix — de ×2.5, fr ×3, en ×0.6, zh dropped, default ×1 — as
    deterministic repetition plus an md5-gated fractional copy. The plan
    is scan → codegen CASE + explode(sequence) — no shuffle, no state;
    membership of every copy is a pure function of (doc_id, salt), so
    re-runs and cluster resizes reproduce the identical mixed corpus."""
    from review_crawler_spark.operators.mixing import upsample_mix

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        upsample_mix(docs, "lang", _MIX_FACTORS, "doc_id", salt=_MIX_SALT)
        .orderBy("doc_id", "copy_id")
    )


def _sql_mix_upsample() -> str:
    from review_crawler_spark.operators.sampling import rate_threshold

    whens_whole = " ".join(
        f"WHEN '{lang}' THEN {int(f)}" for lang, f in sorted(_MIX_FACTORS.items())
    )
    whens_frac = " ".join(
        f"WHEN '{lang}' THEN '{rate_threshold(f - int(f))}'"
        for lang, f in sorted(_MIX_FACTORS.items())
    )
    return f"""
WITH d AS (SELECT doc_id, lang,
                  substring(md5(CAST(doc_id AS VARCHAR) || '{_MIX_SALT}'),
                            1, 15) AS hk
           FROM documents),
p AS (SELECT doc_id, lang,
             CASE lang {whens_whole} ELSE 1 END
             + CASE WHEN hk < (CASE lang {whens_frac}
                               ELSE '{rate_threshold(0.0)}' END)
                    THEN 1 ELSE 0 END AS n
      FROM d)
SELECT doc_id, lang, CAST(unnest(range(n)) AS INTEGER) AS copy_id
FROM p WHERE n > 0 ORDER BY doc_id, copy_id
"""


_PR_DAMP = 0.85
_PR_ITERS = 5


def _q_frontier_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-structure frontier re-prioritization (`operators/graphrank.py`):
    PageRank over a deterministic pseudo-web derived from the documents
    table — each non-dangling doc links to 2-3 modular-arithmetic targets,
    docs with doc_id % 7 == 0 emit nothing (dangling, exercising the mass
    redistribution). Fixed 5 power-iteration rounds so the DuckDB twin can
    unroll the identical recurrence. The reference crawls in sitemap order
    only; this is the Cho/Garcia-Molina/Page (WWW'98) importance-ordered
    crawling signal a web-scale frontier re-scores with between waves."""
    from review_crawler_spark.operators.graphrank import pagerank

    docs = load(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.count()
    base = docs.where(F.col("doc_id") % 7 != 0)
    src = F.col("doc_id").alias("src")
    edges = (
        base.select(src, ((F.col("doc_id") * 131 + 7) % n_docs).alias("dst"))
        .unionByName(
            base.select(src, ((F.col("doc_id") * 31 + 3) % n_docs).alias("dst"))
        )
        .unionByName(
            base.where(F.col("doc_id") % 3 == 0).select(
                src, ((F.col("doc_id") * 17 + 11) % n_docs).alias("dst")
            )
        )
    )
    return pagerank(edges, damping=_PR_DAMP, iters=_PR_ITERS).orderBy("node")


def _sql_frontier_pagerank() -> str:
    """DuckDB twin: the same edge derivation, then the pagerank recurrence
    unrolled _PR_ITERS times as chained CTEs (fixed iteration count is what
    makes the operator SQL-expressible)."""
    d = _PR_DAMP
    parts = [
        """
WITH edges AS (
  SELECT doc_id AS src,
         (doc_id*131+7) % (SELECT count(*) FROM documents) AS dst
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id, (doc_id*31+3) % (SELECT count(*) FROM documents)
  FROM documents WHERE doc_id % 7 <> 0
  UNION ALL
  SELECT doc_id, (doc_id*17+11) % (SELECT count(*) FROM documents)
  FROM documents WHERE doc_id % 7 <> 0 AND doc_id % 3 = 0
),
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN outdeg d USING (src)),
nodes AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM edges
                UNION ALL SELECT dst FROM edges)),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, 1.0/nn.n AS pr FROM nodes CROSS JOIN nn)"""
    ]
    for k in range(1, _PR_ITERS + 1):
        parts.append(
            f""",
c{k} AS (SELECT e.dst AS node, sum(r.pr / e.deg) AS contrib
         FROM ed e JOIN r{k - 1} r ON e.src = r.node GROUP BY e.dst),
m{k} AS (SELECT coalesce(sum(pr), 0) AS mass FROM r{k - 1}
         WHERE node NOT IN (SELECT src FROM outdeg)),
r{k} AS (SELECT n.node,
                (1-{d})/nn.n + {d}*(coalesce(c.contrib, 0) + m.mass/nn.n)
                  AS pr
         FROM nodes n CROSS JOIN nn CROSS JOIN m{k} m
         LEFT JOIN c{k} c ON n.node = c.node)"""
        )
    parts.append(f"\nSELECT node, pr FROM r{_PR_ITERS} ORDER BY node")
    return "".join(parts)


_SHARD_TARGET = 8192


def _q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced output-shard assignment (`operators/sharding.py`):
    the WebDataset/MDS-style write manifest — every curated document goes
    to the shard its byte position (in a deterministic md5 train order)
    lands in, so shards hold ~_SHARD_TARGET chars each regardless of the
    heavy-tailed size distribution. The prefix sum runs as the two-pass
    distributed scan (range shuffle + Arrow cumsum), not a single-task
    global window — the oracle's naive window form is the semantics, the
    Spark plan is the one that survives 100 TB."""
    from review_crawler_spark.operators.sharding import shard_assign

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").cast("long").alias("sz")
    )
    return (
        shard_assign(docs, "doc_id", "sz", _SHARD_TARGET)
        .select("doc_id", "sz", "shard_id")
        .orderBy("shard_id", "doc_id")
    )


_SQL_SHARD_PACK = f"""
WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS sz,
                  substring(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS ok
           FROM documents),
c AS (SELECT doc_id, sz,
             COALESCE(CAST(sum(sz) OVER (ORDER BY ok, CAST(doc_id AS VARCHAR)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
               0) AS cb
      FROM d)
SELECT doc_id, sz, cb // {_SHARD_TARGET} AS shard_id
FROM c ORDER BY shard_id, doc_id
"""


_ASPECT_BATCH = 8
_ASPECT_IDS = [f"www.plos.org/figure/{n}" for n in range(240)]


def _q_image_aspect_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio batch bucketing over the input_hint image table
    (NaViT / SDXL-bucketing shape): images whose w/h falls in the same
    ladder class are packed into fixed-size training batches in a
    deterministic hash order, so batch membership survives re-runs and
    cluster resizes. The within-bucket ordinal is a global distributed
    scan over (bucket, hash) — no per-bucket single-task window, which is
    what kills the naive form at 100 TB where half the corpus is one
    'square' bucket. Oracle: generator geometry (seed math only) as
    inline VALUES + DuckDB's windowed row_number — independent logic."""
    from review_crawler_spark.operators.sharding import image_aspect_batches
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _ASPECT_IDS).select("image_id", "w", "h")
    return (
        image_aspect_batches(imgs, _ASPECT_BATCH)
        .select("bucket", "image_id", "w", "h", "batch_id", "slot")
        .orderBy("bucket", "batch_id", "slot")
    )


def _sql_image_aspect_batches() -> str:
    from review_crawler_spark.sources.images_table import image_dims

    vals = ",\n".join(
        f"('{i}', {w}, {h})"
        for i, (w, h) in ((i, image_dims(i)) for i in _ASPECT_IDS)
    )
    return f"""
WITH imgs(image_id, w, h) AS (VALUES {vals}),
b AS (SELECT image_id, w, h,
        CASE WHEN w*1.0/h < 0.6 THEN 'tall'
             WHEN w*1.0/h < 0.9 THEN 'portrait'
             WHEN w*1.0/h < 1.15 THEN 'square'
             WHEN w*1.0/h < 1.6 THEN 'landscape'
             ELSE 'wide' END AS bucket,
        substring(md5(image_id), 1, 15) AS ok
      FROM imgs),
r AS (SELECT *, row_number() OVER
        (PARTITION BY bucket ORDER BY ok, image_id) - 1 AS bord
      FROM b)
SELECT bucket, image_id, w, h,
       CAST(bord // {_ASPECT_BATCH} AS BIGINT) AS batch_id,
       CAST(bord % {_ASPECT_BATCH} AS INTEGER) AS slot
FROM r ORDER BY bucket, batch_id, slot
"""


def _q_url_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap mining (`operators/traps.py` — IRLbot WWW'08 budget
    enforcement / Heritrix pathological-URI defense, the at-scale
    complement of the reference's three-publisher allow-list): URLs are
    templated by masking variable axes (digit runs → {N}, long hex runs →
    {H}, query values → =*), counted per (host, template) with map-side
    partial agg, and flagged as traps by exact integer gates (a
    TRAP-ELIGIBLE axis shape — {H}, =*, or adjacent /{N}/{N} path
    segments; literal-separated numeric axes are the legitimate
    article/figure template shapes and exempt — plus >= MIN_URLS and
    >= MIN_HOST_PCT percent of the host's frontier). Input: a
    deterministic frontier built from `orders` with five shapes per
    host — a dominant /cal?y=*&m=* calendar (trap, query axes), a
    dominant /archive/{N}/{N}/post date path (trap, adjacent axes), a
    dominant /article/{N} (eligibility-exempt: the protected article
    template), a hex session path (eligible but rare), and a /tag/{N}
    below both gates."""
    from review_crawler_spark.operators.traps import trap_stats

    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    host = F.concat(
        F.lit("h"), (k % 4).cast("string"), F.lit(".example.org")
    )
    path = (
        F.when(
            k % 10 < 3,
            F.concat(
                F.lit("/cal?y="), (k % 5).cast("string"),
                F.lit("&m="), (k % 12).cast("string"),
            ),
        )
        .when(
            k % 10 < 6,
            F.concat(
                F.lit("/archive/"), (k % 5).cast("string"),
                F.lit("/"), (k % 12).cast("string"), F.lit("/post"),
            ),
        )
        .when(k % 10 < 9, F.concat(F.lit("/article/"), k.cast("string")))
        .when(
            k % 20 < 19,
            F.concat(
                F.lit("/session/"), F.md5(k.cast("string")), F.lit("/view")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("/tag/"), (F.col("o_custkey") % 50).cast("string")
            )
        )
    )
    frontier = orders.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("canonical_url"),
    )
    return trap_stats(frontier).orderBy("host", "template")


_SQL_URL_TRAP_DETECT = r"""
WITH f AS (
  SELECT 'h' || CAST(o_orderkey % 4 AS VARCHAR) || '.example.org' AS host,
         'https://h' || CAST(o_orderkey % 4 AS VARCHAR) || '.example.org' ||
         CASE WHEN o_orderkey % 10 < 3
                THEN '/cal?y=' || CAST(o_orderkey % 5 AS VARCHAR)
                     || '&m=' || CAST(o_orderkey % 12 AS VARCHAR)
              WHEN o_orderkey % 10 < 6
                THEN '/archive/' || CAST(o_orderkey % 5 AS VARCHAR)
                     || '/' || CAST(o_orderkey % 12 AS VARCHAR) || '/post'
              WHEN o_orderkey % 10 < 9
                THEN '/article/' || CAST(o_orderkey AS VARCHAR)
              WHEN o_orderkey % 20 < 19
                THEN '/session/' || md5(CAST(o_orderkey AS VARCHAR)) || '/view'
              ELSE '/tag/' || CAST(o_custkey % 50 AS VARCHAR)
         END AS url
  FROM orders
), t AS (
  SELECT host,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/]*', ''),
               '=[^&#]*', '=*', 'g'),
             '[0-9a-fA-F]{8,}', '{H}', 'g'),
           '[0-9]+', '{N}', 'g') AS template
  FROM f
), pt AS (
  SELECT host, template, count(*) AS n_urls FROM t GROUP BY host, template
), ph AS (
  SELECT host, sum(n_urls) AS host_n FROM pt GROUP BY host
)
SELECT pt.host AS host, template,
       CAST(n_urls AS BIGINT) AS n_urls,
       CAST(host_n AS BIGINT) AS host_n,
       CAST(CASE WHEN (template LIKE '%{H}%' OR template LIKE '%=*%'
                       OR template LIKE '%/{N}/{N}%')
                  AND n_urls >= 50
                  AND n_urls * 100 >= host_n * 25
             THEN 1 ELSE 0 END AS INTEGER) AS is_trap
FROM pt JOIN ph USING (host)
ORDER BY host, template
"""


_EXIF_IDS = [f"www.mdpi.com/photo/{n}" for n in range(180)]


def _q_image_exif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF audit pass over the input_hint payload table
    (`functions/exif.py`): one Arrow-batched header walk recovers APP1
    TIFF tags (Make/Model/DateTime/Orientation) from every JPEG without
    touching entropy-coded data; PNG/GIF rows (no EXIF container) report
    null tags. Zero shuffle. Oracle: generator-intent VALUES from
    `image_exif_intent` seed math — independent of both the encoder that
    embedded the tags and the parser that read them back."""
    from review_crawler_spark.functions.exif import extract_exif
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _EXIF_IDS)
    return (
        extract_exif(imgs)
        .select(
            "image_id", "fmt", "make", "model",
            F.col("datetime").alias("exif_datetime"), "orientation",
        )
        .orderBy("image_id")
    )


def _sql_image_exif() -> str:
    import zlib as _zlib

    from review_crawler_spark.sources.images_table import image_exif_intent

    def row(iid: str) -> str:
        seed = _zlib.crc32(iid.encode()) & 0xFFFFFFFF
        fmt = ("png", "jpeg", "gif")[seed % 3]
        t = image_exif_intent(iid)
        if t is None:
            return f"('{iid}', '{fmt}', NULL, NULL, NULL, NULL)"
        return (
            f"('{iid}', '{fmt}', '{t['make']}', '{t['model']}', "
            f"'{t['datetime']}', {t['orientation']})"
        )

    vals = ",\n".join(row(i) for i in _EXIF_IDS)
    return f"""
WITH exif(image_id, fmt, make, model, exif_datetime, orientation)
  AS (VALUES {vals})
SELECT image_id, fmt, CAST(make AS VARCHAR) AS make,
       CAST(model AS VARCHAR) AS model,
       CAST(exif_datetime AS VARCHAR) AS exif_datetime,
       CAST(orientation AS INTEGER) AS orientation
FROM exif ORDER BY image_id
"""


def _q_frontier_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed crawl-side hygiene pipeline: the url_trap_detect frontier
    → `trap_filter` (mined (host, template) traps pruned via broadcast
    anti-join — the frontier never shuffles) → per-host top-k politeness
    schedule (rank by recency priority with a deterministic URL
    tiebreak). Proves the trap operator composes with the engine's
    scheduling contract on one DataFrame program; the DuckDB twin chains
    the same regex mining, gates, and window."""
    from review_crawler_spark.operators.traps import trap_filter

    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    host = F.concat(
        F.lit("h"), (k % 4).cast("string"), F.lit(".example.org")
    )
    path = (
        F.when(
            k % 10 < 4,
            F.concat(
                F.lit("/cal?y="), (k % 5).cast("string"),
                F.lit("&m="), (k % 12).cast("string"),
            ),
        )
        .when(k % 10 < 7, F.concat(F.lit("/article/"), k.cast("string")))
        .when(
            k % 10 < 8,
            F.concat(
                F.lit("/session/"), F.md5(k.cast("string")), F.lit("/view")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("/tag/"), (F.col("o_custkey") % 50).cast("string")
            )
        )
    )
    frontier = orders.select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("canonical_url"),
        F.year("o_orderdate").alias("priority"),
    ).distinct()
    # pin the constructed frontier: trap_filter consumes it in two plan
    # branches (the mined-trap dim and the probe side) and the md5 +
    # distinct construction would otherwise execute twice
    frontier = frontier.localCheckpoint(eager=True)
    kept = trap_filter(frontier)
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("canonical_url")
    )
    return (
        kept.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("host", "canonical_url", "priority", "rnk")
        .orderBy("host", "rnk")
    )


_SQL_FRONTIER_PREP = r"""
WITH f0 AS (
  SELECT 'h' || CAST(o_orderkey % 4 AS VARCHAR) || '.example.org' AS host,
         'https://h' || CAST(o_orderkey % 4 AS VARCHAR) || '.example.org' ||
         CASE WHEN o_orderkey % 10 < 4
                THEN '/cal?y=' || CAST(o_orderkey % 5 AS VARCHAR)
                     || '&m=' || CAST(o_orderkey % 12 AS VARCHAR)
              WHEN o_orderkey % 10 < 7
                THEN '/article/' || CAST(o_orderkey AS VARCHAR)
              WHEN o_orderkey % 10 < 8
                THEN '/session/' || md5(CAST(o_orderkey AS VARCHAR)) || '/view'
              ELSE '/tag/' || CAST(o_custkey % 50 AS VARCHAR)
         END AS url,
         CAST(year(o_orderdate) AS INTEGER) AS priority
  FROM orders
), f AS (
  SELECT DISTINCT host, url AS canonical_url, priority FROM f0
), t AS (
  SELECT host, canonical_url, priority,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(canonical_url,
                              '^[a-z][a-z0-9+.-]*://[^/]*', ''),
               '=[^&#]*', '=*', 'g'),
             '[0-9a-fA-F]{8,}', '{H}', 'g'),
           '[0-9]+', '{N}', 'g') AS template
  FROM f
), pt AS (
  SELECT host, template, count(*) AS n_urls FROM t GROUP BY host, template
), ph AS (
  SELECT host, sum(n_urls) AS host_n FROM pt GROUP BY host
), traps AS (
  SELECT pt.host, template
  FROM pt JOIN ph USING (host)
  WHERE (template LIKE '%{H}%' OR template LIKE '%=*%'
         OR template LIKE '%/{N}/{N}%')
    AND n_urls >= 50 AND n_urls * 100 >= host_n * 25
), kept AS (
  SELECT t.host, t.canonical_url, t.priority
  FROM t ANTI JOIN traps ON t.host = traps.host
                        AND t.template = traps.template
), ranked AS (
  SELECT host, canonical_url, priority,
         row_number() OVER (PARTITION BY host
                            ORDER BY priority DESC, canonical_url) AS rnk
  FROM kept
)
SELECT host, canonical_url, priority, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 20 ORDER BY host, rnk
"""


def _q_image_auto_orient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF auto-orientation (`functions/exif.py::auto_orient_images`):
    decode + orientation-tag transform to upright pixels in one Arrow
    pass, reporting oriented geometry. Oracle: generator-intent VALUES —
    orientation from `image_exif_intent` seed math, oriented dims =
    stored dims swapped iff orientation 5..8 (the transpose family).
    Pixel-level rotation correctness is pinned by the all-8-orientations
    scalar-reference units in test_exif.py (codec-lossiness keeps exact
    pixels out of the cross-engine oracle)."""
    from review_crawler_spark.functions.exif import auto_orient_images
    from review_crawler_spark.sources.images_table import images_df

    imgs = images_df(spark, _EXIF_IDS)
    return (
        auto_orient_images(imgs)
        .select(
            "image_id", "fmt", "orientation", "w", "h", "out_w", "out_h"
        )
        .orderBy("image_id")
    )


def _sql_image_auto_orient() -> str:
    import zlib as _zlib

    from review_crawler_spark.sources.images_table import (
        image_dims,
        image_exif_intent,
    )

    def row(iid: str) -> str:
        seed = _zlib.crc32(iid.encode()) & 0xFFFFFFFF
        fmt = ("png", "jpeg", "gif")[seed % 3]
        w, h = image_dims(iid)
        t = image_exif_intent(iid)
        o = t["orientation"] if t else 1
        ow, oh = (h, w) if o >= 5 else (w, h)
        return f"('{iid}', '{fmt}', {o}, {w}, {h}, {ow}, {oh})"

    vals = ",\n".join(row(i) for i in _EXIF_IDS)
    return f"""
WITH o(image_id, fmt, orientation, w, h, out_w, out_h) AS (VALUES {vals})
SELECT image_id, fmt, CAST(orientation AS INTEGER) AS orientation,
       CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
       CAST(out_w AS INTEGER) AS out_w, CAST(out_h AS INTEGER) AS out_h
FROM o ORDER BY image_id
"""


_DSIR_K = 100


def _q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (`operators/dsir.py`, Xie et al.
    NeurIPS'23): hashed-bigram bag-of-ngrams multinomials for a target
    corpus (the `en` documents) and the raw corpus (all documents), per-
    bucket log-likelihood-ratio scores quantized to integer tenth-milli-
    nats, per-document integer weight sums, deterministic top-k. The
    B-row score dim broadcasts into the occurrence stream — the corpus
    never shuffles to be scored. Bit-exact DuckDB twin: same md5 bucket
    hash, same quantization. The target corpus is a filter of the raw
    corpus, so the shared-pass variant tokenizes/hashes the corpus ONCE
    for both histograms (round-6; identical counts by construction)."""
    from review_crawler_spark.operators.dsir import dsir_select_topk_within

    docs = load(spark, sf_dir, "documents")
    return dsir_select_topk_within(docs, F.col("lang") == "en", _DSIR_K)


_SQL_DSIR_SELECT = rf"""
WITH words AS (
  SELECT doc_id, lang,
         regexp_split_to_array(
           trim(regexp_replace(regexp_replace(lower(text), '[^\w\s]', '', 'g'),
                               '\s+', ' ', 'g')), ' ') AS w
  FROM documents
), occ AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(
            unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]))
          ), 1, 8))::BIGINT % 4096 AS bucket
  FROM words WHERE len(w) >= 2
), tc AS (
  SELECT bucket, count(*) AS tc FROM occ WHERE lang = 'en' GROUP BY bucket
), rc AS (
  SELECT bucket, count(*) AS rc FROM occ GROUP BY bucket
), tt AS (SELECT sum(tc) AS tt FROM tc),
   rt AS (SELECT sum(rc) AS rt FROM rc),
   sc AS (
  SELECT bucket,
         CAST(round((ln((COALESCE(tc, 0) + 1) / (tt + 4096))
                     - ln((COALESCE(rc, 0) + 1) / (rt + 4096))) * 10000.0, 0)
              AS BIGINT) AS score_e4
  FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tt CROSS JOIN rt
), w AS (
  SELECT occ.doc_id, count(*) AS n_grams, sum(score_e4) AS weight_e4
  FROM occ JOIN sc USING (bucket) GROUP BY occ.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(weight_e4 AS BIGINT) AS weight_e4
FROM w ORDER BY weight_e4 DESC, doc_id LIMIT {_DSIR_K}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship_frontier_schedule": _flagship,
        "w1_latest_version": _q_w1_latest_version,
        "j1_semi_customers_with_orders": _q_j1_semi,
        "j2_anti_customers_without_orders": _q_j2_anti,
        "j6_broadcast_dims": _q_j6_broadcast_dim,
        "a1_conditional_counts": _q_a1_conditional_counts,
        "a4_group_max": _q_a4_group_max,
        "w2_topk_per_group": _q_w2_topk_per_group,
        "w3_ordinals": _q_w3_ordinals,
        "o1_sequence_explode": _q_o1_sequence_explode,
        "u1_union_distinct": _q_u1_union_distinct,
        "x_doi_strings": _q_x_doi_strings,
        "x13_dates": _q_x13_dates,
        "tpch_q1": _q_tpch_q1,
        "dedup_exact": _q_dedup_exact,
        "dedup_spans": _q_dedup_spans,
        "dedup_span_strip": _q_dedup_span_strip,
        "text_stats": _q_text_stats,
        "text_langid": _q_text_langid,
        "sessionize": _q_sessionize,
        "window_tumbling": _q_window_tumbling,
        "events_json": _q_events_json,
        "version_dedup": _q_version_dedup,
        "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
        "ann_topk": _q_ann_topk,
        "dedup_embedding_cosine": _q_dedup_embedding,
        "minhash_lsh_pairs": _q_minhash_lsh,
        "simhash_pairs": _q_simhash_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "semantic_dedup_clusters": _q_semantic_dedup,
        "dedup_slice_probe": _q_dedup_slice_probe,
        "ann_topk_lsh": _q_ann_lsh,
        "ann_topk_ivf": _q_ann_ivf,
        "ann_topk_ivf_indexed": _q_ann_ivf_indexed,
        "ann_topk_ivf_batch": _q_ann_ivf_indexed_batch,
        "ann_topk_ivfpq_batch": _q_ann_ivfpq_batch,
        "ann_topk_pq": _q_ann_pq,
        "dedup_clusters_star": _q_dedup_clusters_star,
        "bpe_merges": _q_bpe_merges,
        "bpe_token_counts": _q_bpe_token_counts,
        "pipeline_dedup_canonical_schedule": _q_pipeline_dedup_canonical,
        "jats_parse_roundtrip": _q_jats_parse,
        "jats_parse_extended": _q_jats_parse_extended,
        "html_clean": _q_html_clean,
        "main_content_extract": _q_main_content,
        "warc_wet_extract": _q_warc_wet,
        "resolve_redirects": _q_resolve_redirects,
        "rel_canonical_resolve": _q_rel_canonical,
        "url_trap_detect": _q_url_trap_detect,
        "frontier_prep_schedule": _q_frontier_prep,
        "dsir_select": _q_dsir_select,
        "image_exif_extract": _q_image_exif,
        "image_auto_orient": _q_image_auto_orient,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "sub_articles_explode": _q_sub_articles_explode,
        "html_meta_extract": _q_html_meta,
        "article_metadata_assemble": _q_article_metadata,
        "f_filters_battery": _q_f_filters,
        "a6_learn_search_pages": _q_a6_learn_pages,
        "x21_flatten_dedup": _q_x21_flatten_dedup,
        "x8_scrub_whitespace": _q_x8_scrub,
        "j7_stage2_frontier": _q_j7_stage2_frontier,
        "cuckoo_expire_readmit": _q_cuckoo_expire_readmit,
        "f2_exists_reviews": _q_f2_exists,
        "a2_a3_stats": _q_a2_a3_stats,
        "x10_x11_arrays": _q_x10_x11_arrays,
        "x14_date_sanity": _q_x14_date_sanity,
        "x22_tojson_roundtrip": _q_x22_tojson,
        "review_rounds_extract": _q_review_rounds,
        "decontaminate_ngram_overlap": _q_decontaminate,
        "image_decode_audit": _q_image_decode_audit,
        "dedup_phash_images": _q_dedup_phash_images,
        "dedup_phash_clusters": _q_dedup_phash_clusters,
        "image_corpus_prep": _q_image_corpus_prep,
        "image_meta_sniff": _q_image_meta_sniff,
        "caption_align_gate": _q_caption_align,
        "image_resize_thumbs": _q_image_resize_thumbs,
        "image_pixel_gate": _q_image_pixel_gate,
        "sample_stratified": _q_sample_stratified,
        "sample_exact_k": _q_sample_exact_k,
        "global_shuffle": _q_global_shuffle,
        "tfidf_topk": _q_tfidf_topk,
        "warc_roundtrip": _q_warc_roundtrip,
        "warc_cdx_lookup": _q_warc_cdx_lookup,
        "sitemap_seed": _q_sitemap_seed,
        "asof_join_events": _q_asof_join,
        "range_join_events": _q_range_join,
        "recrawl_priorities": _q_recrawl_priorities,
        "video_frame_sample": _q_video_frame_sample,
        "audio_clip_features": _q_audio_clip_features,
        "audio_window_energy": _q_audio_window_energy,
        "quality_repetition": _q_quality_repetition,
        "lm_quality": _q_lm_quality,
        "host_quality_gate": _q_host_quality,
        "pii_scrub": _q_pii_scrub,
        "line_dedup": _q_line_dedup,
        "pack_chunks": _q_pack_chunks,
        "shard_pack": _q_shard_pack,
        "image_aspect_batches": _q_image_aspect_batches,
        "mix_upsample": _q_mix_upsample,
        "frontier_pagerank": _q_frontier_pagerank,
        "corpus_prep_pipeline": _q_corpus_prep_pipeline,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship_frontier_schedule": _FLAGSHIP_SQL,
        "w1_latest_version": _SQL_W1,
        "j1_semi_customers_with_orders": _SQL_J1,
        "j2_anti_customers_without_orders": _SQL_J2,
        "j6_broadcast_dims": _SQL_J6,
        "a1_conditional_counts": _SQL_A1,
        "a4_group_max": _SQL_A4,
        "w2_topk_per_group": _SQL_W2,
        "w3_ordinals": _SQL_W3,
        "o1_sequence_explode": _SQL_O1,
        "u1_union_distinct": _SQL_U1,
        "x_doi_strings": _SQL_XSTR,
        "x13_dates": _SQL_X13,
        "tpch_q1": _SQL_Q1,
        "dedup_exact": _SQL_DEDUP_EXACT,
        "dedup_spans": _SQL_DEDUP_SPANS,
        "dedup_span_strip": _SQL_DEDUP_SPAN_STRIP,
        "text_stats": _SQL_TEXT_STATS,
        "text_langid": _SQL_LANGID,
        "sessionize": _SQL_SESSIONIZE,
        "window_tumbling": _SQL_TUMBLING,
        "events_json": _SQL_EVENTS_JSON,
        "version_dedup": _SQL_VERSION_DEDUP,
        "dedup_ngram_jaccard": _SQL_NGRAM_JACCARD,
        "ann_topk": _sql_ann_topk(),
        "dedup_embedding_cosine": _SQL_DEDUP_EMBEDDING,
        "jats_parse_roundtrip": _SQL_JATS_PARSE,
        "jats_parse_extended": _SQL_JATS_EXT,
        "html_clean": _SQL_HTML_CLEAN,
        "main_content_extract": _SQL_MAIN_CONTENT,
        "warc_wet_extract": (
            f"SELECT doc_id, main_text, main_len FROM ({_SQL_MAIN_CONTENT})"
            " ORDER BY doc_id"
        ),
        "resolve_redirects": _SQL_RESOLVE_REDIRECTS,
        "rel_canonical_resolve": _SQL_REL_CANONICAL,
        "url_trap_detect": _SQL_URL_TRAP_DETECT,
        "frontier_prep_schedule": _SQL_FRONTIER_PREP,
        "dsir_select": _SQL_DSIR_SELECT,
        "image_exif_extract": _sql_image_exif(),
        "image_auto_orient": _sql_image_auto_orient(),
        "winnow_fingerprints": _SQL_WINNOW,
        "sub_articles_explode": _SQL_SUB_ARTICLES,
        "html_meta_extract": _SQL_HTML_META,
        "article_metadata_assemble": _SQL_ARTICLE_METADATA,
        "f_filters_battery": _SQL_F_FILTERS,
        "a6_learn_search_pages": _SQL_A6_PAGES,
        "x21_flatten_dedup": _SQL_X21_FLATTEN,
        "x8_scrub_whitespace": _SQL_X8_SCRUB,
        "j7_stage2_frontier": _SQL_J7_STAGE2,
        "cuckoo_expire_readmit": _SQL_CUCKOO_EXPIRE,
        "f2_exists_reviews": _SQL_F2_EXISTS,
        "a2_a3_stats": _SQL_A2_A3,
        "x10_x11_arrays": _SQL_X10_X11,
        "x14_date_sanity": _SQL_X14_SANITY,
        "x22_tojson_roundtrip": _SQL_X22_TOJSON,
        "review_rounds_extract": _SQL_REVIEW_ROUNDS,
        "dedup_phash_images": _sql_dedup_phash(),
        "dedup_phash_clusters": _sql_dedup_phash_clusters(),
        "image_corpus_prep": _sql_image_corpus_prep(),
        "image_meta_sniff": _sql_image_meta_sniff(),
        "caption_align_gate": _sql_caption_align(),
        "image_resize_thumbs": _sql_image_resize_thumbs(),
        "image_pixel_gate": _sql_image_pixel_gate(),
        "sample_stratified": _sql_sample_stratified(),
        "sample_exact_k": _SQL_SAMPLE_EXACT_K,
        "global_shuffle": _SQL_GLOBAL_SHUFFLE,
        "warc_roundtrip": _SQL_WARC_ROUNDTRIP,
        "warc_cdx_lookup": _SQL_WARC_CDX_LOOKUP,
        "sitemap_seed": _SQL_SITEMAP_SEED,
        "tfidf_topk": _SQL_TFIDF_TOPK,
        "asof_join_events": _SQL_ASOF_JOIN,
        "range_join_events": _SQL_RANGE_JOIN,
        "recrawl_priorities": _SQL_RECRAWL,
        "video_frame_sample": _sql_video_frame_sample(),
        "audio_clip_features": _sql_audio_clip_features(),
        "audio_window_energy": _sql_audio_window_energy(),
        "quality_repetition": _SQL_QUALITY_REPETITION,
        "lm_quality": _SQL_LM_QUALITY,
        "host_quality_gate": _SQL_HOST_QUALITY,
        "pii_scrub": _sql_pii_scrub(),
        "line_dedup": _sql_line_dedup(),
        "pack_chunks": _SQL_PACK_CHUNKS,
        "shard_pack": _SQL_SHARD_PACK,
        "image_aspect_batches": _sql_image_aspect_batches(),
        "mix_upsample": _sql_mix_upsample(),
        "frontier_pagerank": _sql_frontier_pagerank(),
        "corpus_prep_pipeline": _sql_corpus_prep_pipeline(),
        # minhash_lsh_pairs / simhash_pairs / ann_topk_lsh depend on hashes
        # DuckDB can't compute (Spark xxhash64 chain, FNV-1a, seeded numpy
        # hyperplanes). Their oracles are inline VALUES tables produced by an
        # independent pure-Python reimplementation (tools/gen_expected.py),
        # gated on the input row count so the right expectation is selected
        # at any scale factor the driver runs.
        **_expected_values_oracles(),
    }


def _expected_values_oracles() -> dict[str, str]:
    import json as _json
    import os as _os

    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "expected", "expected_pairs.json")
    try:
        with open(path) as fh:
            exp = _json.load(fh)
    except OSError:
        return {}

    # gate = "<count>:<sum(n_chars)>" recomputed by DuckDB from the views at
    # driver time; count alone is ambiguous (sf0.001 and sf0.01 both have
    # 500 docs), the n_chars checksum pins the scale factor exactly.
    doc_gate = (
        "(SELECT count(*) || ':' || CAST(sum(n_chars) AS BIGINT) FROM documents)"
    )
    ann_gate = (
        "((SELECT CAST(count(*) AS VARCHAR) FROM embeddings) || ':' || "
        "(SELECT CAST(CAST(sum(n_chars) AS BIGINT) AS VARCHAR) FROM documents))"
    )
    specs = {
        "minhash_lsh_pairs": (
            doc_gate,
            ["CAST(? AS BIGINT) AS id_a", "CAST(? AS BIGINT) AS id_b",
             "CAST(? AS DOUBLE) AS jaccard"],
        ),
        "simhash_pairs": (
            doc_gate,
            ["CAST(? AS BIGINT) AS id_a", "CAST(? AS BIGINT) AS id_b",
             "CAST(? AS INT) AS hamming"],
        ),
        "dedup_clusters": (
            doc_gate,
            ["CAST(? AS BIGINT) AS doc_id", "CAST(? AS BIGINT) AS cluster_id",
             "CAST(? AS INT) AS cluster_size"],
        ),
        "ann_topk_lsh": (
            ann_gate,
            ["CAST(? AS BIGINT) AS vec_id", "CAST(? AS DOUBLE) AS cosine"],
        ),
        "ann_topk_ivf": (
            ann_gate,
            ["CAST(? AS BIGINT) AS vec_id", "CAST(? AS DOUBLE) AS cosine"],
        ),
        "ann_topk_ivf_batch": (
            ann_gate,
            ["CAST(? AS BIGINT) AS query_id", "CAST(? AS BIGINT) AS vec_id",
             "CAST(? AS DOUBLE) AS cosine"],
        ),
        "ann_topk_pq": (
            ann_gate,
            ["CAST(? AS BIGINT) AS vec_id", "CAST(? AS DOUBLE) AS cosine"],
        ),
        "ann_topk_ivfpq_batch": (
            ann_gate,
            ["CAST(? AS BIGINT) AS query_id", "CAST(? AS BIGINT) AS vec_id",
             "CAST(? AS DOUBLE) AS cosine"],
        ),
        "semantic_dedup_clusters": (
            ann_gate,
            ["CAST(? AS BIGINT) AS vec_id", "CAST(? AS BIGINT) AS cluster_id",
             "CAST(? AS INT) AS cluster_size"],
        ),
        "dedup_slice_probe": (
            doc_gate,
            ["CAST(? AS BIGINT) AS slice_id", "CAST(? AS BIGINT) AS corpus_id",
             "CAST(? AS DOUBLE) AS est_jaccard"],
        ),
        "bpe_merges": (
            doc_gate,
            ["CAST(? AS INT) AS rank", "CAST(? AS VARCHAR) AS left_sym",
             "CAST(? AS VARCHAR) AS right_sym", "CAST(? AS VARCHAR) AS token"],
        ),
        "bpe_token_counts": (
            doc_gate,
            ["CAST(? AS BIGINT) AS doc_id", "CAST(? AS BIGINT) AS n_words",
             "CAST(? AS BIGINT) AS n_tokens"],
        ),
    }
    out: dict[str, str] = {}
    for name, (gate_expr, col_casts) in specs.items():
        blocks = exp.get(name)
        if not blocks:
            continue
        value_rows = []
        for block in blocks:
            g = block["gate"]
            for row in block["rows"]:
                value_rows.append(
                    "(" + ", ".join([f"'{g}'"] + [repr(v) for v in row]) + ")"
                )
        col_names = [c.rsplit(" AS ", 1)[1] for c in col_casts]
        sel = ", ".join(
            c.replace("?", col_names[i]) for i, c in enumerate(col_casts)
        )
        out[name] = (
            f"SELECT {sel} FROM (VALUES " + ", ".join(value_rows) + ") AS "
            f"t(gate, " + ", ".join(col_names) + ") "
            f"WHERE gate = {gate_expr}"
        )
    # variant queries that must produce IDENTICAL output to their base
    # operator share its expectation rows — a divergence is a failure
    for alias, base in (
        ("ann_topk_ivf_indexed", "ann_topk_ivf"),
        ("dedup_clusters_star", "dedup_clusters"),
    ):
        if base in out:
            out[alias] = out[base]
    # END-TO-END pipeline twin: the dedup-cluster expectation (independent
    # union-find) composes with plain SQL over documents — survivors =
    # docs minus non-canonical cluster members, then the engine's exact
    # politeness-schedule window over the survivors
    if exp.get("dedup_clusters"):
        cl_rows = []
        for block in exp["dedup_clusters"]:
            g = block["gate"]
            for row in block["rows"]:
                cl_rows.append(f"('{g}', {row[0]}, {row[1]})")
        out["pipeline_dedup_canonical_schedule"] = f"""
WITH clusters AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(cluster_id AS BIGINT) AS cluster_id
  FROM (VALUES {', '.join(cl_rows)}) AS t(gate, doc_id, cluster_id)
  WHERE gate = {doc_gate}
), survivors AS (
  SELECT d.doc_id, d.n_chars
  FROM documents d
  LEFT JOIN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id) l
    USING (doc_id)
  WHERE l.doc_id IS NULL
), frontier AS (
  SELECT printf('h%d.example.org', CAST(doc_id % 20 AS INT)) AS host,
         printf('https://h%d.example.org/doc/%d',
                CAST(doc_id % 20 AS INT), doc_id) AS url,
         CAST(n_chars AS BIGINT) AS priority, doc_id AS seq
  FROM survivors
), ranked AS (
  SELECT host, url, priority, seq,
         CAST(row_number() OVER (PARTITION BY host
                                 ORDER BY priority DESC, seq ASC) AS INT)
           AS rk
  FROM frontier
)
SELECT host, CAST(seq AS BIGINT) AS doc_id, url, priority, rk
FROM ranked WHERE rk <= 8
"""
    out["decontaminate_ngram_overlap"] = """
WITH tw AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 17 <> 0
), bw AS (
  SELECT doc_id AS bench_doc_id, string_split(text, ' ') AS w
  FROM documents WHERE doc_id % 17 = 0
), tg AS (
  SELECT DISTINCT doc_id, g FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 4),
                  i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS g
    FROM tw WHERE len(w) >= 5)
), bg AS (
  SELECT DISTINCT bench_doc_id, g FROM (
    SELECT bench_doc_id,
           unnest(list_transform(generate_series(1, len(w) - 4),
                  i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS g
    FROM bw WHERE len(w) >= 5)
)
SELECT doc_id,
       count(DISTINCT g) AS n_overlapping_grams,
       count(DISTINCT bench_doc_id) AS n_bench_docs
FROM tg JOIN bg USING (g)
GROUP BY doc_id
ORDER BY doc_id
"""
    return out
