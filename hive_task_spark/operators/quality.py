"""Training-corpus quality filters over `documents` — the doc-level
heuristic filter stage of an LLM data pipeline (Gopher/C4-style rules,
repetition detection, TF-IDF salience, edit-distance near-neighbors).

All but the pairwise query are pure JVM expressions (split + higher-
order functions + window aggregates) — map stages plus one keyed
shuffle, so at 100 TB they run at scan speed. The pairwise edit-
distance query bounds its quadratic core by sampling + blocking
(the same blocked-join discipline as the LSH dedup family in
operators/dedup.py).

Reference parity note: the reference (/root/reference, an STM task
library in Lisp) has no text layer; these operators are target-layer
mandates (SURVEY.md §2B "LLM-data-pipeline ops", north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.functions.exact import cents as _cents
from hive_task_spark.tables import load

_STOP = ["the", "a", "of", "and", "to", "in", "is"]
_STOP_SPARK = "array(" + ",".join(f"'{w}'" for w in _STOP) + ")"
_STOP_DUCK = "[" + ",".join(f"'{w}'" for w in _STOP) + "]"


@register(
    "text_gopher_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w,
               length(replace(text, ' ', '')) AS alpha_chars
        FROM documents
    ),
    m AS (
        SELECT doc_id, lang,
               CAST(len(w) AS BIGINT) AS n_words,
               CAST(alpha_chars AS DOUBLE) / greatest(len(w), 1) AS mean_word_len,
               CAST(len(list_filter(w, x -> len(x) = 1)) AS DOUBLE)
                 / greatest(len(w), 1) AS short_word_frac,
               CAST(len(list_filter({_STOP_DUCK},
                        s -> list_contains(w, s))) AS BIGINT) AS stop_kinds
        FROM t
    )
    SELECT doc_id, lang, n_words, mean_word_len, short_word_frac, stop_kinds,
           (n_words BETWEEN 10 AND 100000) AS pass_length,
           (mean_word_len BETWEEN 2.0 AND 12.0) AS pass_word_len,
           (short_word_frac < 0.2) AS pass_short_frac,
           (stop_kinds >= 1) AS pass_stopwords,
           ((n_words BETWEEN 10 AND 100000)
            AND (mean_word_len BETWEEN 2.0 AND 12.0)
            AND short_word_frac < 0.2
            AND stop_kinds >= 1) AS keep
    FROM m
    """,
)
def text_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document filter (Rae et al. 2021's rule shapes):
    word-count bounds, mean-word-length window, single-character-word
    fraction, distinct-stopword floor — each exposed as a pass flag
    plus the conjunctive keep decision. Pure map stage."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.split("text", " ").alias("w"),
        F.length(F.regexp_replace("text", " ", "")).alias("alpha_chars"),
    )
    n_words = F.size("w").cast("long")
    denom = F.greatest(F.size("w"), F.lit(1))
    mean_len = F.col("alpha_chars").cast("double") / denom
    short_frac = (
        F.expr("size(filter(w, x -> length(x) = 1))").cast("double") / denom
    )
    stop_kinds = F.expr(
        f"size(filter({_STOP_SPARK}, s -> array_contains(w, s)))"
    ).cast("long")
    m = t.select(
        "doc_id",
        "lang",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        short_frac.alias("short_word_frac"),
        stop_kinds.alias("stop_kinds"),
    )
    pass_length = F.col("n_words").between(10, 100000)
    pass_word_len = F.col("mean_word_len").between(2.0, 12.0)
    pass_short = F.col("short_word_frac") < 0.2
    pass_stop = F.col("stop_kinds") >= 1
    return m.select(
        "*",
        pass_length.alias("pass_length"),
        pass_word_len.alias("pass_word_len"),
        pass_short.alias("pass_short_frac"),
        pass_stop.alias("pass_stopwords"),
        (pass_length & pass_word_len & pass_short & pass_stop).alias("keep"),
    )


@register(
    "text_repetition_entropy",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    wc AS (
        SELECT doc_id, u.word, count(*) AS c
        FROM t, unnest(w) AS u(word)
        GROUP BY doc_id, u.word
    ),
    wp AS (
        SELECT doc_id, c,
               CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY doc_id) AS p
        FROM wc
    ),
    uni AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               CAST(max(c) AS DOUBLE) / sum(c) AS top_word_frac,
               round(-sum(p * ln(p)), 6) AS word_entropy_r
        FROM wp
        GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id, w[i] || ' ' || w[i+1] AS b
        FROM t, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
    bi AS (
        SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_frac
        FROM bc GROUP BY doc_id
    )
    SELECT uni.doc_id, uni.n_words, uni.top_word_frac, uni.word_entropy_r,
           bi.top_bigram_frac,
           (uni.top_word_frac < 0.20 AND bi.top_bigram_frac < 0.12) AS pass_repetition
    FROM uni JOIN bi ON uni.doc_id = bi.doc_id
    """,
)
def text_repetition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/diversity signals (the Gopher repetition-filter
    shape): most-frequent-word share, most-frequent-bigram share, and
    word-distribution Shannon entropy per document. Two keyed shuffles
    ((doc,word) and (doc,bigram) counts, both with map-side partial
    aggregation); no Python."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("w"))
    wc = (
        t.select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(tot)
    uni = (
        wc.select("doc_id", "c", (p * F.log(p)).alias("plogp"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_words"),
            (F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"),
            F.round(-F.sum("plogp"), 6).alias("word_entropy_r"),
        )
    )
    words = t.select("doc_id", F.posexplode("w").alias("pos", "word"))
    lead_w = Window.partitionBy("doc_id").orderBy("pos")
    bg = words.select(
        "doc_id",
        F.concat_ws(" ", "word", F.lead("word", 1).over(lead_w)).alias("b"),
        F.lead("word", 1).over(lead_w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    bi = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac"))
    )
    return uni.join(bi, "doc_id").select(
        "doc_id",
        "n_words",
        "top_word_frac",
        "word_entropy_r",
        "top_bigram_frac",
        ((F.col("top_word_frac") < 0.20) & (F.col("top_bigram_frac") < 0.12)).alias(
            "pass_repetition"
        ),
    )


@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tf AS (
        SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
        FROM t, unnest(w) AS u(term)
        GROUP BY doc_id, u.term
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0), 6)
                 AS tfidf_r,
               row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0)
                            DESC, tf.term) AS rnk
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, tfidf_r, CAST(rnk AS BIGINT) AS rnk
    FROM scored WHERE rnk <= 3
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF salience: smooth-idf weighting (sklearn's formula,
    ln((N+1)/(df+1))+1), top-3 terms per document with deterministic
    term tie-break. The document-frequency table is vocabulary-sized
    and broadcast back — at 100 TB the fact side never reshuffles for
    the idf join, only for the (doc,term) count."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # scalar subquery; a literal beats a cross join here
    tfidf = F.col("tf") * (
        F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    win = Window.partitionBy("doc_id").orderBy(tfidf.desc(), F.col("term"))
    return (
        tf.join(F.broadcast(df), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(tfidf, 6).alias("tfidf_r"),
            F.row_number().over(win).cast("long").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "text_levenshtein_neighbors",
    oracle="""
    WITH s AS (
        SELECT doc_id, lang, substr(text, 1, 24) AS prefix
        FROM documents WHERE doc_id % 10 = 0
    ),
    pairs AS (
        SELECT a.doc_id, b.doc_id AS other_id,
               CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS dist,
               row_number() OVER (
                   PARTITION BY a.doc_id
                   ORDER BY levenshtein(a.prefix, b.prefix), b.doc_id) AS rnk
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id <> b.doc_id
    )
    SELECT doc_id, other_id, dist FROM pairs WHERE rnk = 1
    """,
)
def text_levenshtein_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance nearest neighbor per sampled document, blocked by
    language: the fuzzy-dedup shape for short strings (titles, URLs).
    The quadratic core is bounded twice — a deterministic 1-in-10
    sample and per-language blocking — mirroring how a 100 TB run
    would block on a cheap key (lang, length bucket, LSH band) before
    any pairwise metric. Levenshtein runs JVM-side on both engines."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    s = d.select("doc_id", "lang", F.substring("text", 1, 24).alias("prefix"))
    a = s.select(
        F.col("doc_id"), F.col("lang"), F.col("prefix").alias("pa")
    )
    b = s.select(
        F.col("doc_id").alias("other_id"),
        F.col("lang").alias("lang_b"),
        F.col("prefix").alias("pb"),
    )
    pairs = a.join(
        b, (a["lang"] == b["lang_b"]) & (a["doc_id"] != b["other_id"])
    ).select(
        "doc_id",
        "other_id",
        F.levenshtein("pa", "pb").cast("long").alias("dist"),
    )
    win = Window.partitionBy("doc_id").orderBy("dist", "other_id")
    return (
        pairs.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


@register(
    "quality_percentile_filter",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               len(list_distinct(string_split(text, ' '))) * 1.0 /
                   greatest(len(string_split(text, ' ')), 1) AS ttr
        FROM documents
    ),
    r AS (
        SELECT doc_id, lang, ttr,
               percent_rank() OVER (
                   PARTITION BY lang ORDER BY ttr, doc_id) AS pr
        FROM t
    )
    SELECT doc_id, lang, round(ttr, 6) AS ttr_r, round(pr, 6) AS pr_r
    FROM r WHERE pr >= 0.10
    """,
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELATIVE quality filtering: drop each language's bottom decile
    by type-token ratio instead of a global absolute threshold — the
    per-stratum percentile cut real curation uses, because an
    absolute bar calibrated on English guts low-resource languages.
    percent_rank over (lang) with a doc_id tiebreak is exact and
    rerun-stable (integers in, same double out on every engine —
    unlike approximate quantiles). One shuffle on lang; at 100 TB a
    skewed mega-language partition splits under AQE, or swap the
    window for a two-pass groupBy-quantile + broadcast threshold with
    identical semantics."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    ttr = F.size(F.array_distinct(w)).cast("double") / F.greatest(
        F.size(w), F.lit(1)
    )
    t = d.select("doc_id", "lang", ttr.alias("ttr"))
    win = Window.partitionBy("lang").orderBy("ttr", "doc_id")
    r = t.withColumn("pr", F.percent_rank().over(win))
    return r.filter(F.col("pr") >= 0.10).select(
        "doc_id",
        "lang",
        F.round("ttr", 6).alias("ttr_r"),
        F.round("pr", 6).alias("pr_r"),
    )


@register(
    "quality_expectations_audit",
    oracle="""
    SELECT 'orders_fk_customer' AS check_name,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS checked_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
               AS violations
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
    UNION ALL
    SELECT 'documents_pk_unique',
           CAST((SELECT count(*) FROM documents) AS BIGINT),
           CAST((SELECT count(*) - count(DISTINCT doc_id) FROM documents) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_qty_range',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_quantity IS NULL
                    OR l_quantity NOT BETWEEN 1 AND 50) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_policy',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST((SELECT count(*) FROM lineitem
                 WHERE l_discount IS NULL
                    OR l_discount NOT BETWEEN 0 AND 0.08) AS BIGINT)
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST((SELECT count(*) FROM orders
                 WHERE o_totalprice IS NULL OR o_totalprice <= 0) AS BIGINT)
    UNION ALL
    SELECT 'events_ts_plausible',
           CAST((SELECT count(*) FROM events) AS BIGINT),
           CAST((SELECT count(*) FROM events
                 WHERE ts IS NULL
                    OR ts < TIMESTAMP '2020-01-01'
                    OR ts >= TIMESTAMP '2030-01-01') AS BIGINT)
    """,
)
def quality_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset expectation audit (the dbt-test / Deequ shape): a suite
    of declarative checks — referential integrity (anti-join orphan
    counts), primary-key uniqueness, range/policy predicates, and
    event-time plausibility — each reduced to one (check, checked,
    violations) row and unioned into a single audit report. Every
    check is a scan-plus-aggregate (FK checks are broadcast anti-
    joins against dimension keys); no check is ever quadratic, so the
    audit costs a bounded number of passes at any corpus size. The
    discount-policy check intentionally fires on the fixture (its
    discounts run to 0.10 against the 0.08 policy bound) so the
    failing-check path is exercised, not just all-green."""

    def _check(name: str, base: DataFrame, bad: DataFrame) -> DataFrame:
        total = base.agg(F.count(F.lit(1)).cast("long").alias("checked_rows"))
        viol = bad.agg(F.count(F.lit(1)).cast("long").alias("violations"))
        return (
            total.crossJoin(F.broadcast(viol))
            .select(
                F.lit(name).alias("check_name"), "checked_rows", "violations"
            )
        )

    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    documents = load(spark, sf_dir, "documents")
    customer = load(spark, sf_dir, "customer")
    events = load(spark, sf_dir, "events")

    checks = [
        _check(
            "orders_fk_customer",
            orders,
            orders.join(
                F.broadcast(customer.select("c_custkey")),
                orders.o_custkey == F.col("c_custkey"),
                "left_anti",
            ),
        ),
        _check(
            "lineitem_fk_orders",
            lineitem,
            lineitem.join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == F.col("o_orderkey"),
                "left_anti",
            ),
        ),
        _check(
            "documents_pk_unique",
            documents,
            documents.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(F.explode(F.sequence(F.lit(2), F.col("n"))).alias("_d")),
        ),
        _check(
            "lineitem_qty_range",
            lineitem,
            lineitem.filter(
                F.col("l_quantity").isNull()
                | ~F.col("l_quantity").between(1, 50)
            ),
        ),
        _check(
            "lineitem_discount_policy",
            lineitem,
            lineitem.filter(
                F.col("l_discount").isNull()
                | ~F.col("l_discount").between(0, 0.08)
            ),
        ),
        _check(
            "orders_totalprice_positive",
            orders,
            orders.filter(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
            ),
        ),
        _check(
            "events_ts_plausible",
            events,
            events.filter(
                F.col("ts").isNull()
                | (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
                | (F.col("ts") >= F.lit("2030-01-01").cast("timestamp"))
            ),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


@register(
    "quality_winsorize",
    oracle="""
    WITH r AS (
        SELECT lang, n_chars, doc_id,
               percent_rank() OVER (PARTITION BY lang
                                    ORDER BY n_chars, doc_id) AS pr
        FROM documents
    ),
    b AS (
        SELECT lang,
               max(CASE WHEN pr <= 0.05 THEN n_chars END) AS lo,
               min(CASE WHEN pr >= 0.95 THEN n_chars END) AS hi
        FROM r GROUP BY lang
    )
    SELECT r.lang,
           CAST(b.lo AS BIGINT)                                   AS clip_lo,
           CAST(b.hi AS BIGINT)                                   AS clip_hi,
           CAST(sum(CASE WHEN r.n_chars < b.lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
           CAST(sum(CASE WHEN r.n_chars > b.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
           CAST(sum(least(greatest(r.n_chars, b.lo), b.hi)) AS BIGINT)
               AS sum_winsorized
    FROM r JOIN b ON r.lang = b.lang
    GROUP BY r.lang, b.lo, b.hi
    """,
)
def quality_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based winsorization (outlier clipping at the empirical
    5th/95th percentile) of document lengths per language — the
    robust-stats preprocessing step before corpus-level means/
    z-scores. Clip bounds are chosen by PERCENT_RANK over actual
    data values, NOT interpolated quantiles: bounds stay integers,
    every clipped sum stays exact BIGINT arithmetic, and the
    percent_rank threshold compare is a single double division of
    identical integers on both engines — no float-summation or
    interpolation hazard anywhere. One window pass + a broadcast-
    size per-group bounds join: two scans of the column, no
    quadratic work at any corpus size."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = load(spark, sf_dir, "documents").select(
        "lang", "n_chars", "doc_id", F.percent_rank().over(w).alias("pr")
    )
    b = r.groupBy("lang").agg(
        F.max(F.when(F.col("pr") <= 0.05, F.col("n_chars"))).alias("lo"),
        F.min(F.when(F.col("pr") >= 0.95, F.col("n_chars"))).alias("hi"),
    )
    j = r.join(F.broadcast(b), "lang")
    clipped = F.least(F.greatest(F.col("n_chars"), F.col("lo")), F.col("hi"))
    return j.groupBy("lang", "lo", "hi").agg(
        F.sum((F.col("n_chars") < F.col("lo")).cast("long"))
        .cast("long")
        .alias("n_clipped_low"),
        F.sum((F.col("n_chars") > F.col("hi")).cast("long"))
        .cast("long")
        .alias("n_clipped_high"),
        F.sum(clipped).cast("long").alias("sum_winsorized"),
    ).select(
        "lang",
        F.col("lo").cast("long").alias("clip_lo"),
        F.col("hi").cast("long").alias("clip_hi"),
        "n_clipped_low",
        "n_clipped_high",
        "sum_winsorized",
    )


@register(
    "quality_drift_report",
    oracle="""
    WITH seg AS (
        SELECT CASE WHEN year(o_orderdate) < 1997 THEN 'pre' ELSE 'post' END AS seg,
               CAST(count(*) AS BIGINT)                              AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                                                                     AS cents,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
                             THEN 1 ELSE 0 END) AS BIGINT)           AS n_urgent,
               CAST(count(DISTINCT o_orderstatus) AS BIGINT)         AS n_status
        FROM orders GROUP BY 1
    ),
    wide AS (
        SELECT
          max(CASE WHEN seg = 'pre'  THEN n END)        AS pre_n,
          max(CASE WHEN seg = 'post' THEN n END)        AS post_n,
          max(CASE WHEN seg = 'pre'  THEN cents END)    AS pre_c,
          max(CASE WHEN seg = 'post' THEN cents END)    AS post_c,
          max(CASE WHEN seg = 'pre'  THEN n_urgent END) AS pre_u,
          max(CASE WHEN seg = 'post' THEN n_urgent END) AS post_u,
          max(CASE WHEN seg = 'pre'  THEN n_status END) AS pre_s,
          max(CASE WHEN seg = 'post' THEN n_status END) AS post_s
        FROM seg
    )
    SELECT 'row_count' AS metric,
           CAST(pre_n AS DOUBLE)  AS pre_value,
           CAST(post_n AS DOUBLE) AS post_value,
           CAST(post_n AS DOUBLE) - CAST(pre_n AS DOUBLE) AS drift
    FROM wide
    UNION ALL
    SELECT 'avg_price_cents',
           CAST(pre_c AS DOUBLE) / pre_n,
           CAST(post_c AS DOUBLE) / post_n,
           CAST(post_c AS DOUBLE) / post_n - CAST(pre_c AS DOUBLE) / pre_n
    FROM wide
    UNION ALL
    SELECT 'urgent_share',
           CAST(pre_u AS DOUBLE) / pre_n,
           CAST(post_u AS DOUBLE) / post_n,
           CAST(post_u AS DOUBLE) / post_n - CAST(pre_u AS DOUBLE) / pre_n
    FROM wide
    UNION ALL
    SELECT 'distinct_statuses',
           CAST(pre_s AS DOUBLE),
           CAST(post_s AS DOUBLE),
           CAST(post_s AS DOUBLE) - CAST(pre_s AS DOUBLE)
    FROM wide
    """,
)
def quality_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift report between two data segments (pre-/
    post-1997 orders standing in for yesterday-vs-today loads) — the
    monitor that catches silent upstream changes before a model
    does: per-segment row counts, mean price, urgent-priority share,
    and categorical cardinality, emitted as (metric, pre, post,
    drift) rows. Every ratio is a double division of EXACT integer
    sufficient statistics (cents, counts), so both engines derive
    bit-identical values — the same discipline as
    `window_rolling_regression`. One scan, one tiny pivot; at 100 TB
    this runs as a daily scan-speed audit beside the load job."""
    seg = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.when(F.year("o_orderdate") < 1997, "pre")
            .otherwise("post")
            .alias("seg")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
            F.sum((F.col("o_orderpriority") == "1-URGENT").cast("long"))
            .cast("long")
            .alias("n_urgent"),
            F.countDistinct("o_orderstatus").cast("long").alias("n_status"),
        )
    )
    wide = seg.agg(
        *[
            F.max(F.when(F.col("seg") == s, F.col(c))).alias(f"{p}_{c}")
            for s, p in (("pre", "pre"), ("post", "post"))
            for c in ("n", "cents", "n_urgent", "n_status")
        ]
    )
    pre_n, post_n = F.col("pre_n").cast("double"), F.col("post_n").cast("double")
    rows = [
        ("row_count", pre_n, post_n),
        (
            "avg_price_cents",
            F.col("pre_cents").cast("double") / F.col("pre_n"),
            F.col("post_cents").cast("double") / F.col("post_n"),
        ),
        (
            "urgent_share",
            F.col("pre_n_urgent").cast("double") / F.col("pre_n"),
            F.col("post_n_urgent").cast("double") / F.col("post_n"),
        ),
        (
            "distinct_statuses",
            F.col("pre_n_status").cast("double"),
            F.col("post_n_status").cast("double"),
        ),
    ]
    out = None
    for metric, pre, post in rows:
        r = wide.select(
            F.lit(metric).alias("metric"),
            pre.alias("pre_value"),
            post.alias("post_value"),
            (post - pre).alias("drift"),
        )
        out = r if out is None else out.unionAll(r)
    return out


@register(
    "quality_referential_integrity",
    oracle="""
    SELECT 'orders.custkey->customer' AS check_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
             AS BIGINT) AS n_orphans,
           count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) = 0
             AS ok
    FROM orders o
    UNION ALL
    SELECT 'lineitem.partkey->part',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
             AS BIGINT),
           count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) = 0
    FROM lineitem l
    UNION ALL
    SELECT 'lineitem.suppkey->supplier',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
             AS BIGINT),
           count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)) = 0
    FROM lineitem l
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS BIGINT),
           count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
    FROM lineitem l
    UNION ALL
    SELECT 'customer.nationkey->nation',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
             AS BIGINT),
           count(*) FILTER (NOT EXISTS (
               SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) = 0
    FROM customer c
    """,
)
def quality_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan audit across the star schema: for each FK
    edge (orders→customer, lineitem→part/supplier/orders,
    customer→nation), count referencing rows and rows whose key has
    no match — the referential-integrity leg of the expectations
    audit (`quality_expectations_audit` covers per-column checks).
    Each check is one broadcast left-anti join against the DISTINCT
    key projection of the referenced table (dims broadcast; for a
    fact-to-fact edge like lineitem→orders at 100 TB the anti-join
    shuffles on the key like any equi-join, and AQE picks the
    strategy). The five one-row summaries union at the driver-plan
    level — zero extra fact passes beyond one scan per check."""
    tables = {
        "orders": load(spark, sf_dir, "orders"),
        "lineitem": load(spark, sf_dir, "lineitem"),
        "customer": load(spark, sf_dir, "customer"),
        "part": load(spark, sf_dir, "part"),
        "supplier": load(spark, sf_dir, "supplier"),
        "nation": load(spark, sf_dir, "nation"),
    }
    checks = [
        ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    outs = []
    for name, fact, fk, dim, pk in checks:
        f_df = tables[fact]
        keys = tables[dim].select(F.col(pk).alias("__pk")).distinct()
        orphans = f_df.join(
            F.broadcast(keys), f_df[fk] == F.col("__pk"), "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = f_df.agg(F.count(F.lit(1)).alias("n_rows"))
        outs.append(
            total.crossJoin(F.broadcast(orphans)).select(
                F.lit(name).alias("check_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


@register(
    "quality_snapshot_diff",
    oracle="""
    WITH b AS (  -- simulated next-day snapshot, derived deterministically
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '1'
                    THEN round(o_totalprice * 1.1, 3)
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <> '0'
        UNION ALL
        SELECT o_orderkey + 100000000, o_orderstatus, o_totalprice
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '2'
    ),
    d AS (
        SELECT CASE
                 WHEN a.o_orderkey IS NULL THEN 'added'
                 WHEN b.o_orderkey IS NULL THEN 'removed'
                 WHEN a.o_totalprice <> b.o_totalprice
                      OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
                 ELSE 'unchanged' END AS change_type
        FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows
    FROM d GROUP BY change_type
    """,
)
def quality_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot table diff — the CDC-reconciliation audit: full
    outer join of two snapshot versions on the primary key, classing
    every key as added / removed / changed / unchanged by comparing
    the non-key columns. Snapshot B is derived deterministically from
    A (md5-keyed: ~1/16 deleted, ~1/16 price-bumped, ~1/16 new keys)
    so the oracle reproduces it exactly. One key-partitioned shuffle
    joins the snapshots; change classing is a row-local CASE — at
    100 TB, bucket both snapshots on the key and the diff is
    shuffle-free, which is how nightly reconciliation actually
    ships."""
    a = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    nib = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    b = (
        a.filter(nib != "0")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                nib == "1", F.round(F.col("o_totalprice") * 1.1, 3)
            ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        )
        .unionByName(
            a.filter(nib == "2").select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                "o_orderstatus",
                "o_totalprice",
            )
        )
    )
    aj = a.alias("a")
    bj = b.alias("b")
    j = aj.join(bj, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    change = (
        F.when(F.col("a.o_orderkey").isNull(), "added")
        .when(F.col("b.o_orderkey").isNull(), "removed")
        .when(
            (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return j.select(change.alias("change_type")).groupBy("change_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )


@register(
    "quality_entity_resolution",
    oracle="""
    WITH canon AS (
        SELECT c_custkey AS key, c_name AS name FROM customer
    ),
    pos AS (
        SELECT key,
               CAST(16 + 2 * (CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 2)
                                   AS BIGINT) % 2) AS INTEGER) AS p
        FROM canon WHERE key <= 300
    ),
    dirty AS (  -- deterministic damage: one digit blanked at pos 16 or 18
        SELECT c.key AS dirty_key,
               substr(c.name, 1, pos.p - 1) || 'X'
                   || substr(c.name, pos.p + 1) AS dname
        FROM canon c JOIN pos ON c.key = pos.key
    ),
    cand AS (  -- multi-key blocking: two digit-bigram blocks; a single
               -- damaged position can break at most one of them
        SELECT DISTINCT d.dirty_key, d.dname, c.key, c.name
        FROM dirty d JOIN canon c
          ON substr(d.dname, 16, 2) = substr(c.name, 16, 2)
        UNION
        SELECT DISTINCT d.dirty_key, d.dname, c.key, c.name
        FROM dirty d JOIN canon c
          ON substr(d.dname, 18, 2) = substr(c.name, 18, 2)
    ),
    scored AS (
        SELECT dirty_key, key AS matched_key,
               CAST(levenshtein(dname, name) AS BIGINT) AS lev
        FROM cand WHERE levenshtein(dname, name) <= 1
    )
    SELECT dirty_key, matched_key, lev,
           (dirty_key = matched_key) AS correct
    FROM (
        SELECT *, row_number() OVER (PARTITION BY dirty_key
                                     ORDER BY lev, matched_key) AS rk
        FROM scored
    )
    WHERE rk = 1
    """,
)
def quality_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution with MULTI-KEY BLOCKING — the scale pattern
    for fuzzy matching: dirty records (one deterministically blanked
    digit per name) join canonical records on TWO independent block
    keys (digit bigrams at positions 16-17 and 18-19); a single-char
    edit can break at most one block, so recall is guaranteed by
    construction while candidate volume stays |block|-bounded — never
    the O(n^2) all-pairs edit-distance join. Exact Levenshtein <= 1
    verifies candidates; argmin with key tie-break picks the match
    deterministically. NOTE the `correct` flag is intentionally
    honest about intrinsic ambiguity: a blanked DIGIT has up to 10
    equally-distant canonicals (lev=1 each), so the smallest-key rule
    resolves ~1/collision-cardinality of them to the true entity —
    the operator's contract is deterministic candidate generation +
    exact verification, not magic disambiguation.
    At 100 TB: blocks are the shuffle key, verification touches only
    candidates — identical shape to the MinHash-LSH dedup path,
    applied to entities."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    pos = (
        16
        + 2
        * (
            F.expr(
                "CAST(conv(substr(md5(CAST(key AS STRING)), 1, 2), 16, 10) AS BIGINT)"
            )
            % 2
        )
    ).cast("int")
    dirty = c.filter(F.col("key") <= 300).select(
        F.col("key").alias("dirty_key"),
        F.expr(
            "overlay(name, 'X', CAST(16 + 2 * (CAST(conv(substr(md5("
            "CAST(key AS STRING)), 1, 2), 16, 10) AS BIGINT) % 2) AS INT), 1)"
        ).alias("dname"),
    )
    cand1 = dirty.join(
        c, F.substring(dirty.dname, 16, 2) == F.substring(c.name, 16, 2)
    )
    cand2 = dirty.join(
        c, F.substring(dirty.dname, 18, 2) == F.substring(c.name, 18, 2)
    )
    cand = cand1.unionByName(cand2).distinct()
    scored = cand.select(
        "dirty_key",
        F.col("key").alias("matched_key"),
        F.levenshtein("dname", "name").cast("long").alias("lev"),
    ).filter(F.col("lev") <= 1)
    w = Window.partitionBy("dirty_key").orderBy("lev", "matched_key")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "dirty_key",
            "matched_key",
            "lev",
            (F.col("dirty_key") == F.col("matched_key")).alias("correct"),
        )
    )


@register(
    "quality_column_profiler",
    oracle="""
    WITH a AS (
        SELECT count(*) AS n,
               count(o_orderkey)   AS nn_key,
               count(o_custkey)    AS nn_cust,
               count(o_totalprice) AS nn_price,
               count(o_orderstatus) AS nn_status,
               count(DISTINCT o_orderkey)    AS nd_key,
               count(DISTINCT o_custkey)     AS nd_cust,
               count(DISTINCT o_totalprice)  AS nd_price,
               count(DISTINCT o_orderstatus) AS nd_status,
               CAST(min(o_orderkey) AS VARCHAR) AS mn_key,
               CAST(max(o_orderkey) AS VARCHAR) AS mx_key,
               CAST(min(o_custkey) AS VARCHAR)  AS mn_cust,
               CAST(max(o_custkey) AS VARCHAR)  AS mx_cust,
               CAST(CAST(round(min(o_totalprice), 2) AS DECIMAL(18,2))
                    AS VARCHAR) AS mn_price,
               CAST(CAST(round(max(o_totalprice), 2) AS DECIMAL(18,2))
                    AS VARCHAR) AS mx_price,
               min(o_orderstatus) AS mn_status,
               max(o_orderstatus) AS mx_status
        FROM orders
    )
    SELECT 'o_orderkey' AS col_name, CAST(n AS BIGINT) AS n,
           CAST(n - nn_key AS BIGINT) AS n_null,
           CAST(nd_key AS BIGINT) AS n_distinct,
           mn_key AS min_s, mx_key AS max_s FROM a
    UNION ALL
    SELECT 'o_custkey', CAST(n AS BIGINT), CAST(n - nn_cust AS BIGINT),
           CAST(nd_cust AS BIGINT), mn_cust, mx_cust FROM a
    UNION ALL
    SELECT 'o_totalprice', CAST(n AS BIGINT), CAST(n - nn_price AS BIGINT),
           CAST(nd_price AS BIGINT), mn_price, mx_price FROM a
    UNION ALL
    SELECT 'o_orderstatus', CAST(n AS BIGINT), CAST(n - nn_status AS BIGINT),
           CAST(nd_status AS BIGINT), mn_status, mx_status FROM a
    """,
)
def quality_column_profiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler — the data-catalog summary every
    ingestion job publishes: per column, row count, null count, exact
    distinct count, and min/max (numerics serialized at a stable
    decimal grain). ALL columns' statistics come from ONE aggregate
    over ONE scan (count/count-distinct/min/max fused into a single
    partial+final HashAggregate), then the 1-row wide result unpivots
    to the long (col_name, stats) catalog shape — at 100 TB the
    profile costs exactly one table pass regardless of how many
    columns are profiled, vs the naive per-column loop's N passes.
    Exact distincts here; swap approx_count_distinct per column when
    2% error is acceptable (the HLL row shows that path)."""
    o = load(spark, sf_dir, "orders")
    a = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_key"),
        F.count("o_custkey").alias("nn_cust"),
        F.count("o_totalprice").alias("nn_price"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderkey").alias("nd_key"),
        F.countDistinct("o_custkey").alias("nd_cust"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        F.round(F.min("o_totalprice"), 2)
        .cast("decimal(18,2)")
        .cast("string")
        .alias("mn_price"),
        F.round(F.max("o_totalprice"), 2)
        .cast("decimal(18,2)")
        .cast("string")
        .alias("mx_price"),
        F.min("o_orderstatus").alias("mn_status"),
        F.max("o_orderstatus").alias("mx_status"),
    )
    return a.selectExpr(
        """stack(4,
            'o_orderkey',   n, n - nn_key,    nd_key,    mn_key,    mx_key,
            'o_custkey',    n, n - nn_cust,   nd_cust,   mn_cust,   mx_cust,
            'o_totalprice', n, n - nn_price,  nd_price,  mn_price,  mx_price,
            'o_orderstatus',n, n - nn_status, nd_status, mn_status, mx_status
        ) AS (col_name, n, n_null, n_distinct, min_s, max_s)"""
    ).selectExpr(
        "col_name",
        "CAST(n AS BIGINT) AS n",
        "CAST(n_null AS BIGINT) AS n_null",
        "CAST(n_distinct AS BIGINT) AS n_distinct",
        "min_s",
        "max_s",
    )


@register(
    "quality_sorted_neighborhood_er",
    oracle="""
    WITH canon AS (
        SELECT c_custkey AS key, c_name AS name FROM customer
    ),
    dirty AS (
        SELECT c.key AS key,
               substr(c.name, 1,
                      16 + 2 * (CAST('0x' || substr(md5(CAST(c.key AS VARCHAR)),
                                                    1, 2) AS BIGINT) % 2) - 1)
               || 'X'
               || substr(c.name,
                         16 + 2 * (CAST('0x' || substr(md5(CAST(c.key AS VARCHAR)),
                                                       1, 2) AS BIGINT) % 2) + 1)
                   AS name
        FROM canon c WHERE c.key <= 300
    ),
    recs AS (
        SELECT 'c' AS side, key, name, name AS k1,
               substr(name, 1, 15) || substr(name, 17) AS k2
        FROM canon
        UNION ALL
        SELECT 'd' AS side, key, name, name AS k1,
               substr(name, 1, 15) || substr(name, 17) AS k2
        FROM dirty
    ),
    p1 AS (
        SELECT side, key, name,
               row_number() OVER (ORDER BY k1, side, key) AS rnk
        FROM recs
    ),
    p2 AS (
        SELECT side, key, name,
               row_number() OVER (ORDER BY k2, side, key) AS rnk
        FROM recs
    ),
    cand AS (
        SELECT d.key AS dirty_key, c.key AS matched_key,
               d.name AS dname, c.name AS cname
        FROM p1 d JOIN p1 c
          ON c.rnk BETWEEN d.rnk - 25 AND d.rnk + 25
         AND d.side = 'd' AND c.side = 'c'
        UNION
        SELECT d.key, c.key, d.name, c.name
        FROM p2 d JOIN p2 c
          ON c.rnk BETWEEN d.rnk - 25 AND d.rnk + 25
         AND d.side = 'd' AND c.side = 'c'
    ),
    scored AS (
        SELECT dirty_key, matched_key,
               CAST(levenshtein(dname, cname) AS BIGINT) AS lev
        FROM cand WHERE levenshtein(dname, cname) <= 1
    )
    SELECT dirty_key, matched_key, lev,
           (dirty_key = matched_key) AS correct
    FROM (SELECT *, row_number() OVER (PARTITION BY dirty_key
                                       ORDER BY lev, matched_key) AS rk
          FROM scored)
    WHERE rk = 1
    """,
)
def quality_sorted_neighborhood_er(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sorted-neighborhood entity resolution — the OTHER classic
    candidate-generation strategy (vs `quality_entity_resolution`'s
    multi-key blocking): union dirty+canonical records, sort by a
    key, and compare only records within ±25 ranks (the window must cover the sort key's tie-group size — here up to ~20 records share a key prefix). One pass misses
    matches whose damage perturbs the sort key early (the method's
    known weakness), so this is MULTI-PASS SNM: pass 1 sorts by the
    raw name, pass 2 by the name with the damage-prone position 16
    excised — unioned candidates recover what either pass finds,
    then exact Levenshtein <= 1 verifies and argmin picks. Same
    damage model as the blocking ER so the two strategies are
    directly comparable. At 100 TB each pass is one range-partitioned
    global sort and a rank-band self-join (banded equi-join on
    rank div 25 in the scaled variant) — candidates are O(n * w),
    never all-pairs, and sort keys trade recall for sort locality
    explicitly."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"), F.col("c_name").alias("name")
    )
    dirty = c.filter(F.col("key") <= 300).select(
        "key",
        F.expr(
            "overlay(name, 'X', CAST(16 + 2 * (CAST(conv(substr(md5("
            "CAST(key AS STRING)), 1, 2), 16, 10) AS BIGINT) % 2) AS INT), 1)"
        ).alias("name"),
    )
    recs = (
        c.select(F.lit("c").alias("side"), "key", "name")
        .unionByName(dirty.select(F.lit("d").alias("side"), "key", "name"))
        .withColumn("k1", F.col("name"))
        .withColumn(
            "k2", F.concat(F.substring("name", 1, 15), F.expr("substr(name, 17)"))
        )
    )

    def snm_pass(keycol: str) -> DataFrame:
        ranked = recs.withColumn(
            "rnk", F.row_number().over(Window.orderBy(keycol, "side", "key"))
        )
        d = ranked.filter(F.col("side") == "d").select(
            F.col("key").alias("dirty_key"),
            F.col("name").alias("dname"),
            F.col("rnk").alias("dr"),
        )
        cc = ranked.filter(F.col("side") == "c").select(
            F.col("key").alias("matched_key"),
            F.col("name").alias("cname"),
            F.col("rnk").alias("cr"),
        )
        # banded equi-join on rank buckets, then the exact rank-band filter
        db = d.withColumn(
            "b", F.explode(F.expr("array(dr div 25 - 1, dr div 25, dr div 25 + 1)"))
        )
        cb = cc.withColumn("b", F.expr("cr div 25"))
        return (
            db.join(cb, "b")
            .filter(
                (F.col("cr") >= F.col("dr") - 25) & (F.col("cr") <= F.col("dr") + 25)
            )
            .select("dirty_key", "matched_key", "dname", "cname")
        )

    cand = snm_pass("k1").unionByName(snm_pass("k2")).distinct()
    scored = cand.select(
        "dirty_key",
        "matched_key",
        F.levenshtein("dname", "cname").cast("long").alias("lev"),
    ).filter(F.col("lev") <= 1)
    w = Window.partitionBy("dirty_key").orderBy("lev", "matched_key")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "dirty_key",
            "matched_key",
            "lev",
            (F.col("dirty_key") == F.col("matched_key")).alias("correct"),
        )
    )


@register(
    "quality_k_anonymity_audit",
    oracle="""
    WITH q AS (
        SELECT c_nationkey AS nat, c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
               count(*) AS n
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT CAST(nat AS BIGINT) AS nat, seg, bal_bucket,
           CAST(n AS BIGINT) AS n
    FROM q WHERE n < 5
    """,
)
def quality_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — privacy governance's release gate: group
    the table by its quasi-identifiers (nation, segment, coarse
    balance bucket) and surface every equivalence class smaller than
    k=5. A record in such a class is re-identifiable by joining the
    quasi-identifiers against any public roster; the fix is further
    generalization (wider buckets), suppression of the listed rows,
    or noise (the DP row). One map-side-combined groupBy at the
    quasi-identifier grain — the audit costs a single pass no matter
    how wide the table is, because only the quasi columns are
    scanned (column pruning does the rest). Pairs with the masking
    view and DP-counts rows as the release-pipeline trio."""
    c = load(spark, sf_dir, "customer")
    q = c.groupBy(
        F.col("c_nationkey").cast("long").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return q.filter(F.col("n") < 5)


@register(
    "quality_retry_storm_census",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT)
               - lag(CAST(epoch_us(ts) AS BIGINT)) OVER (
                     PARTITION BY user_id, event_type
                     ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN gap_us <= 5000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_retries,
           round(sum(CASE WHEN gap_us <= 5000000 THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS retry_rate_r
    FROM seq
    GROUP BY event_type
    """,
)
def quality_retry_storm_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-storm census — SRE telemetry hygiene: an event is a
    "retry" when the same user emitted the same event type within
    the last 5 seconds (client retry loops, double-clicks, webhook
    redelivery). The per-type retry rate tells you how much of the
    stream is amplification rather than signal, and which types need
    idempotency keys upstream. One lag() per (user, type)
    partitioning and a 5-row census — the same single-exchange
    profile as sessionization; at 100 TB this runs as a daily
    data-quality monitor on the same shuffle the sessionizer already
    pays."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    )
    is_retry = F.when(F.col("gap_us") <= 5000000, 1).otherwise(0)
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(is_retry).cast("long").alias("n_retries"),
        F.round(F.sum(is_retry) / F.count(F.lit(1)), 6).alias("retry_rate_r"),
    )



@register(
    "quality_column_size_profile",
    oracle="""
    WITH m AS (
        SELECT count(*) AS n,
               sum(len(c_name))    AS b_name,
               sum(len(c_mktsegment)) AS b_seg
        FROM customer
    )
    SELECT 'c_custkey' AS col_name, CAST(n * 8 AS BIGINT) AS est_bytes,
           CAST(800 AS BIGINT) AS avg_width_x100 FROM m
    UNION ALL
    SELECT 'c_acctbal', CAST(n * 8 AS BIGINT), CAST(800 AS BIGINT) FROM m
    UNION ALL
    SELECT 'c_name', CAST(b_name AS BIGINT),
           CAST(b_name * 100 // n AS BIGINT) FROM m
    UNION ALL
    SELECT 'c_mktsegment', CAST(b_seg AS BIGINT),
           CAST(b_seg * 100 // n AS BIGINT) FROM m
    UNION ALL
    SELECT 'c_nationkey', CAST(n * 8 AS BIGINT), CAST(800 AS BIGINT) FROM m
    """,
)
def quality_column_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column storage-size profile — the layout-planning report that
    tells you what column pruning is worth: per column, estimated
    uncompressed bytes (8 per numeric, string lengths summed) and
    average width. When c_comment is 70% of the row, a projection
    that skips it reads 3x less — this table is the quantitative
    case for ReadSchema pruning, column-family splits, and
    dictionary candidates (narrow low-cardinality strings). One
    fused aggregate (counts + length sums in a single pass), then a
    constant-width unpivot; integer x100 fixed-point keeps the
    width column float-free."""
    c = load(spark, sf_dir, "customer")
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("c_name")).alias("b_name"),
        F.sum(F.length("c_mktsegment")).alias("b_seg"),
    )
    return m.selectExpr(
        """stack(5,
            'c_custkey',    n * 8,     CAST(800 AS BIGINT),
            'c_acctbal',    n * 8,     CAST(800 AS BIGINT),
            'c_name',       b_name,    b_name * 100 div n,
            'c_mktsegment', b_seg,     b_seg * 100 div n,
            'c_nationkey',  n * 8,     CAST(800 AS BIGINT)
        ) AS (col_name, est_bytes, avg_width_x100)"""
    ).selectExpr(
        "col_name",
        "CAST(est_bytes AS BIGINT) AS est_bytes",
        "CAST(avg_width_x100 AS BIGINT) AS avg_width_x100",
    )


@register(
    "quality_partition_fingerprint",
    oracle="""
    WITH h AS (
        SELECT c_nationkey,
               CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || '|' ||
                                       c_name || '|' || c_mktsegment),
                                   1, 12) AS BIGINT) AS h48
        FROM customer
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nat,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h48) AS BIGINT) AS sum48,
           CAST(bit_xor(h48) AS BIGINT) AS xor48
    FROM h GROUP BY c_nationkey
    """,
)
def quality_partition_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-level content fingerprints — the cheap cross-cluster
    replication audit: per partition (nation), row count plus TWO
    order-insensitive content digests (sum and xor of a 48-bit
    md5-derived key over the business columns). Two replicas compare
    |partitions| fingerprint rows instead of re-shipping data; a
    mismatch pinpoints WHICH partition diverged, and the sum/xor
    pair catches the swaps a count alone misses (sum catches value
    edits, xor catches duplicated-row-pair cancellation in the sum).
    48-bit chunks keep the int64 sum overflow-free to ~30k rows per
    partition — at bigger partitions sum modulo a prime. One
    map-side-combined groupBy; both aggregates are commutative, so
    the digest is partitioning- and order-independent by
    construction."""
    c = load(spark, sf_dir, "customer")
    h48 = F.expr(
        "CAST(conv(substr(md5(concat(CAST(c_custkey AS STRING), '|',"
        " c_name, '|', c_mktsegment)), 1, 12), 16, 10) AS BIGINT)"
    )
    return (
        c.select(F.col("c_nationkey").cast("long").alias("nat"), h48.alias("h48"))
        .groupBy("nat")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h48").cast("long").alias("sum48"),
            F.expr("bit_xor(h48)").cast("long").alias("xor48"),
        )
    )


@register(
    "quality_fellegi_sunter_scoring",
    oracle="""
    WITH canon AS (
        SELECT c_custkey AS key, c_name AS name, c_mktsegment AS seg,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS balb,
               c_nationkey AS nat
        FROM customer
    ),
    dirty AS (
        SELECT c.key, c.seg, c.balb, c.nat,
               substr(c.name, 1,
                      16 + 2 * (CAST('0x' || substr(md5(CAST(c.key AS VARCHAR)),
                                                    1, 2) AS BIGINT) % 2) - 1)
               || 'X'
               || substr(c.name,
                         16 + 2 * (CAST('0x' || substr(md5(CAST(c.key AS VARCHAR)),
                                                       1, 2) AS BIGINT) % 2) + 1)
                   AS name
        FROM canon c WHERE c.key <= 300
    ),
    cand AS (
        SELECT d.key AS dirty_key, c.key AS cand_key,
               CAST(levenshtein(d.name, c.name) <= 1 AS INTEGER) AS a_name,
               CAST(d.seg = c.seg AS INTEGER)  AS a_seg,
               CAST(d.balb = c.balb AS INTEGER) AS a_bal,
               CAST(d.nat = c.nat AS INTEGER)   AS a_nat
        FROM dirty d
        JOIN canon c ON substr(d.name, 1, 15) = substr(c.name, 1, 15)
                    AND abs(d.key - c.key) <= 50
    ),
    scored AS (
        SELECT dirty_key, cand_key,
               round(  (CASE WHEN a_name = 1 THEN ln(0.95 / 0.001)
                             ELSE ln(0.05 / 0.999) END)
                     + (CASE WHEN a_seg = 1 THEN ln(0.98 / 0.20)
                             ELSE ln(0.02 / 0.80) END)
                     + (CASE WHEN a_bal = 1 THEN ln(0.90 / 0.10)
                             ELSE ln(0.10 / 0.90) END)
                     + (CASE WHEN a_nat = 1 THEN ln(0.97 / 0.04)
                             ELSE ln(0.03 / 0.96) END), 4) AS weight_r
        FROM cand
    )
    SELECT dirty_key, cand_key, weight_r,
           CASE WHEN weight_r >= 8.0  THEN 'match'
                WHEN weight_r >= 0.0  THEN 'review'
                ELSE 'non-match' END AS decision
    FROM scored
    """,
)
def quality_fellegi_sunter_scoring(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage — the statistical
    framework behind Splink and census matching: each candidate pair
    scores the SUM of per-field log-likelihood ratios ln(m/u) for
    agreements and ln((1−m)/(1−u)) for disagreements, where m =
    P(agree | same entity) and u = P(agree | different entities)
    (fixed, documented parameters here; EM-estimating them is the
    classic extension). Thresholds split match / clerical-review /
    non-match — the three-way decision the deterministic ER rows
    collapse to argmin. Candidates come from a cheap block (shared
    name prefix + key band) so scoring is never all-pairs; the four
    field comparisons are row-local codegen, and the same weights
    would broadcast to 100 TB of pairs unchanged."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("balb"),
        F.col("c_nationkey").alias("nat"),
    )
    dirty = c.filter(F.col("key") <= 300).select(
        "key",
        "seg",
        "balb",
        "nat",
        F.expr(
            "overlay(name, 'X', CAST(16 + 2 * (CAST(conv(substr(md5("
            "CAST(key AS STRING)), 1, 2), 16, 10) AS BIGINT) % 2) AS INT), 1)"
        ).alias("name"),
    )
    d = dirty.alias("d")
    cc = c.alias("c")
    cand = d.join(
        cc,
        (
            F.substring(F.col("d.name"), 1, 15)
            == F.substring(F.col("c.name"), 1, 15)
        )
        & (F.abs(F.col("d.key") - F.col("c.key")) <= 50),
    ).select(
        F.col("d.key").alias("dirty_key"),
        F.col("c.key").alias("cand_key"),
        (F.levenshtein(F.col("d.name"), F.col("c.name")) <= 1)
        .cast("int")
        .alias("a_name"),
        (F.col("d.seg") == F.col("c.seg")).cast("int").alias("a_seg"),
        (F.col("d.balb") == F.col("c.balb")).cast("int").alias("a_bal"),
        (F.col("d.nat") == F.col("c.nat")).cast("int").alias("a_nat"),
    )
    import math

    def llr(flag, m, u):
        return F.when(
            F.col(flag) == 1, F.lit(math.log(m / u))
        ).otherwise(F.lit(math.log((1 - m) / (1 - u))))

    weight = (
        llr("a_name", 0.95, 0.001)
        + llr("a_seg", 0.98, 0.20)
        + llr("a_bal", 0.90, 0.10)
        + llr("a_nat", 0.97, 0.04)
    )
    scored = cand.select(
        "dirty_key", "cand_key", F.round(weight, 4).alias("weight_r")
    )
    return scored.withColumn(
        "decision",
        F.when(F.col("weight_r") >= 8.0, "match")
        .when(F.col("weight_r") >= 0.0, "review")
        .otherwise("non-match"),
    )


@register(
    "quality_encoding_advisor",
    oracle="""
    WITH m AS (
        SELECT count(*) AS n,
               count(DISTINCT o_orderstatus)    AS d_status,
               count(DISTINCT o_orderpriority)  AS d_prio,
               count(DISTINCT o_custkey)        AS d_cust,
               count(DISTINCT o_orderkey)       AS d_key,
               sum(len(o_orderstatus))   AS b_status,
               sum(len(o_orderpriority)) AS b_prio
        FROM orders
    ),
    prof AS (
        SELECT 'o_orderstatus' AS col_name, d_status AS n_distinct,
               b_status * 100 // n AS width_x100, n FROM m
        UNION ALL
        SELECT 'o_orderpriority', d_prio, b_prio * 100 // n, n FROM m
        UNION ALL
        SELECT 'o_custkey', d_cust, 800, n FROM m
        UNION ALL
        SELECT 'o_orderkey', d_key, 800, n FROM m
    )
    SELECT col_name,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(width_x100 AS BIGINT) AS width_x100,
           CASE WHEN n_distinct * 100 <= n
                THEN 'dictionary'
                WHEN n_distinct = n THEN 'plain-unique'
                ELSE 'plain' END AS recommended
    FROM prof
    """,
)
def quality_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding advisor — the layout tuning report downstream
    of the size profile: per column, exact cardinality and width
    drive a rule-based recommendation (distinct/rows <= 1% =>
    dictionary-encode — repeated values compress to indexes;
    fully-unique keys => plain with delta left to the writer;
    everything else plain). This is the decision parquet writers and
    warehouse ANALYZE jobs make from exactly these two statistics;
    at 100 TB choosing dictionary for a 5-value status column is
    routinely a 10x scan-size difference on that column. One fused
    aggregate, stack unpivot, pure-rule classification."""
    o = load(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.countDistinct("o_orderpriority").alias("d_prio"),
        F.countDistinct("o_custkey").alias("d_cust"),
        F.countDistinct("o_orderkey").alias("d_key"),
        F.sum(F.length("o_orderstatus")).alias("b_status"),
        F.sum(F.length("o_orderpriority")).alias("b_prio"),
    )
    prof = m.selectExpr(
        """stack(4,
            'o_orderstatus',   d_status, b_status * 100 div n, n,
            'o_orderpriority', d_prio,   b_prio * 100 div n,   n,
            'o_custkey',       d_cust,   CAST(800 AS BIGINT),  n,
            'o_orderkey',      d_key,    CAST(800 AS BIGINT),  n
        ) AS (col_name, n_distinct, width_x100, n)"""
    )
    return prof.select(
        "col_name",
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("width_x100").cast("long").alias("width_x100"),
        F.when(F.col("n_distinct") * 100 <= F.col("n"), "dictionary")
        .when(F.col("n_distinct") == F.col("n"), "plain-unique")
        .otherwise("plain")
        .alias("recommended"),
    )


@register(
    "quality_cdc_column_attribution",
    oracle="""
    WITH mutated AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0
                    THEN round(o_totalprice * 1.05, 3)
                    ELSE round(o_totalprice, 3) END AS o_totalprice,
               CASE WHEN o_orderkey % 13 = 0 THEN 'X-SHIFTED'
                    ELSE o_orderpriority END AS o_orderpriority,
               o_orderstatus
        FROM orders
    ),
    joined AS (
        SELECT o.o_orderkey,
               CASE WHEN round(o.o_totalprice, 3) <> m.o_totalprice
                    THEN 1 ELSE 0 END AS c_price,
               CASE WHEN o.o_orderpriority <> m.o_orderpriority
                    THEN 1 ELSE 0 END AS c_prio,
               CASE WHEN o.o_orderstatus <> m.o_orderstatus
                    THEN 1 ELSE 0 END AS c_status
        FROM orders o JOIN mutated m ON m.o_orderkey = o.o_orderkey
    )
    SELECT o_orderkey,
           concat_ws('|',
               CASE WHEN c_price = 1 THEN 'o_totalprice' END,
               CASE WHEN c_prio = 1 THEN 'o_orderpriority' END,
               CASE WHEN c_status = 1 THEN 'o_orderstatus' END)
               AS changed_cols,
           CAST(c_price + c_prio + c_status AS BIGINT) AS n_changed
    FROM joined
    WHERE c_price + c_prio + c_status > 0
    """,
)
def quality_cdc_column_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Column-level CDC diff attribution — not just WHICH keys
    changed between snapshots (the snapshot-diff row) but WHICH
    COLUMNS changed per key, serialized as a stable '|'-joined list:
    the audit trail reviewers need to distinguish a price-repricing
    batch from a schema-mapping bug upstream (all-rows-one-column
    vs scattered). The mutated snapshot is synthesized
    deterministically by key class (5% price bump on keys %11,
    priority overwrite on keys %13 — keys divisible by both show
    two-column attribution). Per-column inequality flags compile to
    one comparison per column inside a single keyed join — adding
    columns widens the projection, never adds passes. Prices compare
    at their exact 3dp grain on both sides."""
    o = load(spark, sf_dir, "orders")
    mutated = o.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 11 == 0,
            F.round(F.col("o_totalprice") * 1.05, 3),
        )
        .otherwise(F.round("o_totalprice", 3))
        .alias("m_totalprice"),
        F.when(F.col("o_orderkey") % 13 == 0, "X-SHIFTED")
        .otherwise(F.col("o_orderpriority"))
        .alias("m_orderpriority"),
        F.col("o_orderstatus").alias("m_orderstatus"),
    )
    j = o.join(mutated, "o_orderkey")
    c_price = (F.round("o_totalprice", 3) != F.col("m_totalprice")).cast("int")
    c_prio = (F.col("o_orderpriority") != F.col("m_orderpriority")).cast("int")
    c_status = (F.col("o_orderstatus") != F.col("m_orderstatus")).cast("int")
    flagged = j.select(
        "o_orderkey",
        c_price.alias("c_price"),
        c_prio.alias("c_prio"),
        c_status.alias("c_status"),
    )
    return (
        flagged.filter(
            F.col("c_price") + F.col("c_prio") + F.col("c_status") > 0
        )
        .select(
            "o_orderkey",
            F.concat_ws(
                "|",
                F.when(F.col("c_price") == 1, "o_totalprice"),
                F.when(F.col("c_prio") == 1, "o_orderpriority"),
                F.when(F.col("c_status") == 1, "o_orderstatus"),
            ).alias("changed_cols"),
            (F.col("c_price") + F.col("c_prio") + F.col("c_status"))
            .cast("long")
            .alias("n_changed"),
        )
    )


@register(
    "quality_join_cardinality_audit",
    oracle="""
    WITH s AS (
        SELECT (SELECT count(*) FROM orders)   AS n_o,
               (SELECT count(*) FROM lineitem) AS n_l,
               (SELECT count(*) FROM customer) AS n_c,
               (SELECT count(DISTINCT o_orderkey) FROM orders) AS d_ok,
               (SELECT count(DISTINCT l_orderkey) FROM lineitem) AS d_lk,
               (SELECT count(DISTINCT c_custkey) FROM customer) AS d_ck,
               (SELECT count(DISTINCT o_custkey) FROM orders)   AS d_oc
    )
    SELECT 'orders_lineitem' AS join_name,
           CAST(n_o * n_l / greatest(d_ok, d_lk) AS BIGINT) AS est_rows,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey) AS actual_rows,
           round(CAST(n_o * n_l / greatest(d_ok, d_lk) AS BIGINT) * 1.0 /
                 (SELECT count(*) FROM orders o
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey), 4)
               AS est_over_actual_r
    FROM s
    UNION ALL
    SELECT 'customer_orders',
           CAST(n_c * n_o / greatest(d_ck, d_oc) AS BIGINT),
           (SELECT CAST(count(*) AS BIGINT) FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey),
           round(CAST(n_c * n_o / greatest(d_ck, d_oc) AS BIGINT) * 1.0 /
                 (SELECT count(*) FROM customer c
                  JOIN orders o ON o.o_custkey = c.c_custkey), 4)
    FROM s
    """,
)
def quality_join_cardinality_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-cardinality estimation audit — the optimizer's classic
    formula |R ⋈ S| ≈ |R|·|S| / max(ndv(R.k), ndv(S.k)) computed AS
    DATA next to the true join count, for the two FK joins every
    TPC-H plan hinges on. est/actual near 1.0 validates that
    ANALYZE-style NDV statistics would steer this schema correctly
    (uniform FK fan-out); a big ratio flags the skew/correlation
    cases where a CBO mis-plans and hints (the SHUFFLE_HASH row) or
    AQE must step in. NDVs and counts fuse into one stats pass per
    table; the actual counts are plain keyed joins. This is the
    engine-introspection habit — checking the estimate against
    reality — expressed as a query."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")
    stats = (
        o.agg(
            F.count(F.lit(1)).alias("n_o"),
            F.countDistinct("o_orderkey").alias("d_ok"),
            F.countDistinct("o_custkey").alias("d_oc"),
        )
        .crossJoin(
            F.broadcast(
                li.agg(
                    F.count(F.lit(1)).alias("n_l"),
                    F.countDistinct("l_orderkey").alias("d_lk"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                c.agg(
                    F.count(F.lit(1)).alias("n_c"),
                    F.countDistinct("c_custkey").alias("d_ck"),
                )
            )
        )
    )
    a_ol = o.join(li, o["o_orderkey"] == li["l_orderkey"]).agg(
        F.count(F.lit(1)).alias("actual")
    )
    a_co = c.join(o, o["o_custkey"] == c["c_custkey"]).agg(
        F.count(F.lit(1)).alias("actual")
    )
    row1 = (
        stats.crossJoin(F.broadcast(a_ol))
        .select(
            F.lit("orders_lineitem").alias("join_name"),
            F.expr("CAST(n_o * n_l / greatest(d_ok, d_lk) AS BIGINT)").alias(
                "est_rows"
            ),
            F.col("actual").cast("long").alias("actual_rows"),
            F.round(
                F.expr("CAST(n_o * n_l / greatest(d_ok, d_lk) AS BIGINT)")
                / F.col("actual"),
                4,
            ).alias("est_over_actual_r"),
        )
    )
    row2 = (
        stats.crossJoin(F.broadcast(a_co))
        .select(
            F.lit("customer_orders").alias("join_name"),
            F.expr("CAST(n_c * n_o / greatest(d_ck, d_oc) AS BIGINT)").alias(
                "est_rows"
            ),
            F.col("actual").cast("long").alias("actual_rows"),
            F.round(
                F.expr("CAST(n_c * n_o / greatest(d_ck, d_oc) AS BIGINT)")
                / F.col("actual"),
                4,
            ).alias("est_over_actual_r"),
        )
    )
    return row1.unionByName(row2)


@register(
    "quality_l_diversity_audit",
    oracle="""
    WITH q AS (
        SELECT c_nationkey AS nat,
               CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
               count(*) AS n,
               count(DISTINCT c_mktsegment) AS l_div
        FROM customer
        GROUP BY 1, 2
    )
    SELECT CAST(nat AS BIGINT) AS nat, bal_bucket,
           CAST(n AS BIGINT) AS n,
           CAST(l_div AS BIGINT) AS l_div
    FROM q WHERE l_div < 3
    """,
)
def quality_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a
    quasi-identifier class can be large (k-safe) yet still leak if
    everyone in it shares the SAME sensitive value (homogeneity
    attack: "I don't know which row is yours, but you're all
    BUILDING segment"). This surfaces (nation, coarse-balance)
    classes whose sensitive attribute (market segment) takes fewer
    than l=3 distinct values. Same one-pass quasi-grain census as
    the k-anonymity row with a count(distinct sensitive) fused in —
    the two audits share a scan in a real release pipeline. Fix:
    generalize further or suppress, then re-run until both gates
    pass."""
    c = load(spark, sf_dir, "customer")
    q = c.groupBy(
        F.col("c_nationkey").cast("long").alias("nat"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("c_mktsegment").cast("long").alias("l_div"),
    )
    return q.filter(F.col("l_div") < 3)


# ---------------------------------------------------------------------------
# Round-4 additions: freshness, key-multiplicity, and cross-field
# consistency audits.
# ---------------------------------------------------------------------------


@register(
    "quality_freshness_lag",
    oracle="""
    WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events),
    s AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               max(epoch_us(ts)) AS tmax,
               CAST(sum(CASE WHEN epoch_us(ts)
                             < g.gmax - CAST(604800000000 AS BIGINT)
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_stale_7d
        FROM events CROSS JOIN g
        GROUP BY event_type, g.gmax
    ),
    gg AS (SELECT gmax FROM g)
    SELECT event_type, n_events,
           CAST((gg.gmax - s.tmax) // 1000000 AS BIGINT) AS lag_behind_head_s,
           n_stale_7d,
           round(n_stale_7d / (1.0 * n_events), 6) AS stale_ratio_r
    FROM s CROSS JOIN gg
    """,
)
def quality_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness audit per event type: how far each type's newest
    event lags the global high-water mark, and what fraction of its
    rows are older than a 7-day staleness window — the first page of
    any ingestion-health dashboard (a type whose lag grows round over
    round is a dead producer). Timestamps compare as exact integer
    microseconds (unix_micros, never fractional epoch); the global
    max is a broadcast one-row aggregate, so the whole audit is one
    corpus pass + an O(|types|) join."""
    e = load(spark, sf_dir, "events")
    g = e.agg(F.max(F.unix_micros("ts")).alias("gmax"))
    s = (
        e.crossJoin(F.broadcast(g))
        .groupBy("event_type", "gmax")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max(F.unix_micros("ts")).alias("tmax"),
            F.sum(
                F.when(
                    F.unix_micros("ts")
                    < F.col("gmax") - F.lit(604800000000),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_stale_7d"),
        )
    )
    return s.select(
        "event_type",
        "n_events",
        F.floor((F.col("gmax") - F.col("tmax")) / 1000000).cast("long").alias(
            "lag_behind_head_s"
        ),
        "n_stale_7d",
        F.round(F.col("n_stale_7d") / (F.lit(1.0) * F.col("n_events")), 6).alias(
            "stale_ratio_r"
        ),
    )


@register(
    "quality_key_multiplicity",
    oracle="""
    WITH k AS (
        SELECT user_id, ts, count(*) AS k_events
        FROM events GROUP BY user_id, ts
    )
    SELECT CAST(k_events AS BIGINT) AS k_events,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(k_events) AS BIGINT) AS n_rows
    FROM k GROUP BY k_events
    """,
)
def quality_key_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-multiplicity histogram for the natural key (user_id, ts):
    how many candidate keys occur once, twice, k times — the
    uniqueness audit run before declaring a primary key or choosing a
    dedup strategy (a fat k tail says the key is NOT a key, and dedup
    must pick a winner deterministically). Two stacked map-side-
    combinable aggregates: key-grain count, then count-of-counts —
    the classic two-level shuffle that stays tiny because level 2's
    cardinality is |distinct multiplicities|."""
    e = load(spark, sf_dir, "events")
    k = e.groupBy("user_id", "ts").agg(F.count(F.lit(1)).alias("k_events"))
    return k.groupBy("k_events").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("k_events").cast("long").alias("n_rows"),
    ).select(
        F.col("k_events").cast("long").alias("k_events"), "n_keys", "n_rows"
    )


@register(
    "quality_nchars_consistency",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatch,
           CAST(max(abs(n_chars - length(text))) AS BIGINT) AS max_abs_diff,
           round(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                 / (1.0 * count(*)), 6) AS mismatch_ratio_r
    FROM documents GROUP BY source
    """,
)
def quality_nchars_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field consistency audit: does the materialized n_chars
    column agree with length(text)? Denormalized/derived columns
    drift when upstream writers change (truncation, encoding, late
    cleaning) — this is the check that catches it, per source, with
    the max absolute divergence as the triage signal. Pure map
    predicate + one aggregate; at 100 TB this runs at scan speed and
    the length() never leaves the executor."""
    d = load(spark, sf_dir, "documents")
    mism = F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(mism).cast("long").alias("n_mismatch"),
        F.max(F.abs(F.col("n_chars") - F.length("text")))
        .cast("long")
        .alias("max_abs_diff"),
        F.round(F.sum(mism) / (F.lit(1.0) * F.count(F.lit(1))), 6).alias(
            "mismatch_ratio_r"
        ),
    )


@register(
    "quality_rare_levels",
    oracle="""
    WITH lv AS (
        SELECT p_type AS level_value, count(*) AS n
        FROM part GROUP BY p_type
    ),
    tot AS (SELECT sum(n) AS total, count(*) AS n_levels FROM lv)
    SELECT l.level_value,
           CAST(l.n AS BIGINT) AS n_rows,
           round(l.n / (1.0 * t.total), 6) AS share_r,
           (l.n < 0.01 * t.total) AS is_rare,
           CASE WHEN l.n < 0.01 * t.total THEN 'OTHER'
                ELSE l.level_value END AS consolidated_level
    FROM lv l CROSS JOIN tot t
    """,
)
def quality_rare_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-level census for a categorical column (p_type): every
    level's support, a 1%-of-rows rarity flag, and the consolidated
    mapping that folds rare levels into 'OTHER' — the feature-
    engineering prep that stops one-hot/target encoders from
    exploding on long-tail categories (and the audit that catches
    typo-levels entering a dimension). One aggregate + a broadcast
    total; emitting the MAPPING as data is what makes it replayable
    on the next snapshot."""
    p = load(spark, sf_dir, "part")
    lv = p.groupBy(F.col("p_type").alias("level_value")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = lv.agg(F.sum("n").alias("total"))
    rare = F.col("n") < 0.01 * F.col("total")
    return lv.crossJoin(F.broadcast(tot)).select(
        "level_value",
        F.col("n").cast("long").alias("n_rows"),
        F.round(F.col("n") / (F.lit(1.0) * F.col("total")), 6).alias("share_r"),
        rare.alias("is_rare"),
        F.when(rare, "OTHER").otherwise(F.col("level_value")).alias(
            "consolidated_level"
        ),
    )


@register(
    "quality_rowcount_reconciliation",
    oracle="""
    WITH om AS (
        SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS month_idx,
               o_orderkey
        FROM orders
    ),
    lo AS (SELECT DISTINCT l_orderkey FROM lineitem),
    j AS (
        SELECT om.month_idx,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN lo.l_orderkey IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_lineless
        FROM om LEFT JOIN lo ON om.o_orderkey = lo.l_orderkey
        GROUP BY om.month_idx
    )
    SELECT month_idx, n_orders, n_lineless,
           round(n_lineless / (1.0 * n_orders), 6) AS lineless_rate_r
    FROM j
    """,
)
def quality_rowcount_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation by period: orders per month and how
    many have NO lineitem rows — the month-over-month 'did the child
    feed drop data' control that referential-integrity totals hide (a
    0.1% global orphan rate can be one month 100% broken). Left join
    against the DISTINCT child keys (the child fact is reduced to its
    key set before joining — at 100 TB that semi-join shape is the
    whole trick), then one month rollup."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    om = o.select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("month_idx"),
        "o_orderkey",
    )
    lo = li.select("l_orderkey").distinct()
    j = om.join(lo, om["o_orderkey"] == lo["l_orderkey"], "left")
    return j.groupBy("month_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_lineless"),
        F.round(
            F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
            / (F.lit(1.0) * F.count(F.lit(1))),
            6,
        ).alias("lineless_rate_r"),
    )


# Candidate functional dependencies for the discovery profiler: a
# deliberate mix of true FDs (keys) and violated ones, so the report
# exercises both verdicts at every SF.
_FD_CANDIDATES = [
    ("customer", "c_custkey", "c_nationkey"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_orderkey", "o_orderdate"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("supplier", "s_suppkey", "s_nationkey"),
]


def _fd_oracle() -> str:
    parts = []
    for tbl, lhs, rhs in _FD_CANDIDATES:
        parts.append(f"""
    SELECT '{tbl}' AS tbl, '{lhs}' AS lhs, '{rhs}' AS rhs,
           CAST(count(*) AS BIGINT)                          AS n_groups,
           CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                             AS n_violating,
           CAST(max(d) AS BIGINT)                            AS max_rhs_distinct,
           CAST(CASE WHEN max(d) = 1 THEN 1 ELSE 0 END AS BIGINT) AS holds
    FROM (SELECT {lhs}, count(DISTINCT {rhs}) AS d FROM {tbl} GROUP BY {lhs})""")
    return " UNION ALL ".join(parts)


@register("quality_functional_dependency_discovery", oracle=_fd_oracle())
def quality_functional_dependency_discovery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Functional-dependency discovery over a curated candidate set
    (the TANE/metanome-style profiling primitive, restricted to the
    candidates a schema reviewer actually asks about): for each
    X -> Y candidate, the number of X groups, how many X groups see
    more than one distinct Y (violations), the worst multiplicity,
    and the verdict.  True FDs here are the declared keys; the
    violated candidates (nationkey -> mktsegment etc.) show real
    violation counts — the report that catches a silently-broken
    "unique" column after a bad backfill.

    Scale shape: each candidate is ONE two-column pruned scan +
    partial/final hash aggregate on the LHS, then a 1-row reduction —
    candidates are independent (no shared shuffle), so the whole
    report parallelizes trivially and the union is k one-row frames.
    count(DISTINCT) per group is exact (the contract is an audit,
    not an estimate)."""
    out = None
    for tbl, lhs, rhs in _FD_CANDIDATES:
        t = load(spark, sf_dir, tbl)
        per_group = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("d"))
        row = per_group.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_violating"),
            F.max("d").cast("long").alias("max_rhs_distinct"),
            F.when(F.max("d") == 1, 1).otherwise(0).cast("long").alias("holds"),
        ).select(
            F.lit(tbl).alias("tbl"),
            F.lit(lhs).alias("lhs"),
            F.lit(rhs).alias("rhs"),
            "n_groups",
            "n_violating",
            "max_rhs_distinct",
            "holds",
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "quality_observe_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT)                       AS n_orders,
           round(sum(o_totalprice), 2)                    AS revenue_r,
           CAST(min(year(o_orderdate)) AS BIGINT)         AS min_year,
           CAST(max(year(o_orderdate)) AS BIGINT)         AS max_year,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT)                                AS n_finished
    FROM orders
    """,
)
def quality_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline health metrics via the ``Observation`` API (Spark's
    accumulator-backed `df.observe`): the counters piggyback on the
    SAME job that materializes the observed frame — row count,
    revenue total, date range, status split are collected as the rows
    stream through the noop sink, with NO second scan.  This is the
    per-batch data-quality hook production pipelines attach to every
    write (the batch-side analog of streaming's
    StreamingQueryListener observed metrics).

    Scale shape: observe compiles to accumulators inside the existing
    plan — zero extra shuffle, zero extra pass; the returned frame is
    the 1-row metrics literal.  Cross-engine check: the oracle
    recomputes the same aggregates declaratively, so a metric that
    drifted from its SQL definition (the classic silent-accumulator
    bug) fails the hash."""
    from pyspark.sql import Observation

    o = load(spark, sf_dir, "orders")
    obs = Observation("health")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue_r"),
        F.min(F.year("o_orderdate")).alias("min_year"),
        F.max(F.year("o_orderdate")).alias("max_year"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
            "n_finished"
        ),
    )
    observed.write.mode("overwrite").format("noop").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_orders"]),
                float(m["revenue_r"]),
                int(m["min_year"]),
                int(m["max_year"]),
                int(m["n_finished"]),
            )
        ],
        "n_orders long, revenue_r double, min_year long, max_year long, n_finished long",
    )


@register(
    "quality_t_closeness_audit",
    oracle="""
    WITH b AS (
        SELECT c_nationkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN 'DEBT'
                    WHEN c_acctbal < 5000 THEN 'LOW'
                    ELSE 'HIGH' END AS band
        FROM customer
    ),
    g AS (
        SELECT CAST(sum(CASE WHEN band = 'DEBT' THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS q_debt,
               CAST(sum(CASE WHEN band = 'LOW'  THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS q_low,
               CAST(sum(CASE WHEN band = 'HIGH' THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS q_high
        FROM b
    ),
    cl AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_c,
               CAST(sum(CASE WHEN band = 'DEBT' THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS p_debt,
               CAST(sum(CASE WHEN band = 'LOW'  THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS p_low,
               CAST(sum(CASE WHEN band = 'HIGH' THEN 1 ELSE 0 END) AS DOUBLE)
                   / count(*) AS p_high
        FROM b GROUP BY c_nationkey, c_mktsegment
    )
    SELECT cl.c_nationkey, cl.c_mktsegment, cl.n_c,
           floor(0.5 * (abs(cl.p_debt - g.q_debt)
                        + abs(cl.p_low - g.q_low)
                        + abs(cl.p_high - g.q_high)) * 1e6 + 0.5) / 1e6
               AS t_dist_r,
           floor(0.5 * (abs(cl.p_debt - g.q_debt)
                        + abs(cl.p_low - g.q_low)
                        + abs(cl.p_high - g.q_high)) * 1e6 + 0.5) / 1e6
               > 0.15 AS violates
    FROM cl, g
    ORDER BY cl.c_nationkey, cl.c_mktsegment
    """,
)
def quality_t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007),
    completing the k-anonymity / l-diversity anonymization trio: per
    quasi-identifier class (nation x market segment), the variational
    distance (equal-ground-distance EMD = 0.5 * L1) between the
    class's sensitive-attribute distribution (account-balance band
    DEBT/LOW/HIGH) and the global distribution; classes with
    t > 0.15 leak the sensitive attribute through the QI.

    Determinism: all probabilities are exact integer ratios; the L1
    sum is a FIXED three-term expression (not an aggregate over
    categories), so both engines evaluate identical IEEE ops in
    identical order — bit-equal before the canon; violates compares
    the canonical value on both sides.

    Scale shape: one conditional-aggregate pass at QI grain (classes
    bounded by |QI domain|, never data-sized) plus a broadcast 1-row
    global distribution — the same single-shuffle island as the
    sibling k-anonymity / l-diversity audits."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, "DEBT")
        .when(F.col("c_acctbal") < 5000, "LOW")
        .otherwise("HIGH")
        .alias("band"),
    )

    def _dist(df, keys, pfx):
        aggs = [
            (
                F.sum(F.when(F.col("band") == bnd, 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1))
            ).alias(f"{pfx}_{bnd.lower()}")
            for bnd in ("DEBT", "LOW", "HIGH")
        ]
        if keys:
            return df.groupBy(*keys).agg(
                F.count(F.lit(1)).cast("long").alias("n_c"), *aggs
            )
        return df.agg(*aggs)

    cl = _dist(c, ["c_nationkey", "c_mktsegment"], "p")
    g = _dist(c, [], "q")
    t_raw = F.lit(0.5) * (
        F.abs(F.col("p_debt") - F.col("q_debt"))
        + F.abs(F.col("p_low") - F.col("q_low"))
        + F.abs(F.col("p_high") - F.col("q_high"))
    )
    t_c = F.floor(t_raw * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        cl.crossJoin(F.broadcast(g))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_c",
            t_c.alias("t_dist_r"),
            (t_c > F.lit(0.15)).alias("violates"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


@register(
    "quality_ece_calibration",
    oracle="""
    WITH m AS (
        SELECT floor(sum(o_totalprice) / count(*) * 1e2 + 0.5) / 1e2 AS mu,
               floor(sqrt((sum(o_totalprice * o_totalprice)
                           - sum(o_totalprice) * 1.0 * sum(o_totalprice)
                             / count(*)) / (count(*) - 1)) * 1e2 + 0.5)
                   / 1e2 AS sd
        FROM orders
    ),
    p AS (
        SELECT floor(1.0 / (1.0 + exp(-((o.o_totalprice - m.mu) / m.sd)))
                     * 1e6 + 0.5) / 1e6 AS score,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1.0 ELSE 0.0 END AS label
        FROM orders o, m
    ),
    b AS (
        SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
               CAST(count(*) AS BIGINT)                    AS n_b,
               floor(CAST(sum(CAST(floor(score * 1e6 + 0.5) AS BIGINT))
                          AS DOUBLE) / count(*) + 0.5) / 1e6 AS conf_r,
               floor(CAST(sum(CAST(label AS BIGINT)) AS DOUBLE) * 1e6
                     / count(*) + 0.5) / 1e6                 AS acc_r
        FROM p GROUP BY 1
    )
    SELECT bin, n_b, conf_r, acc_r,
           abs(acc_r - conf_r) AS gap_r,
           floor(sum(n_b * abs(acc_r - conf_r)) OVER ()
                 / sum(n_b) OVER () * 1e6 + 0.5) / 1e6 AS ece_r
    FROM b
    ORDER BY bin
    """,
)
def quality_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-calibration-error report (Naeini et al. 2015 /
    Guo et al. 2017): reliability diagram over 10 equal-width score
    bins plus the weighted ECE — the standard audit applied to any
    quality-classifier scores before they gate corpus admission.
    Score here is a logistic of the z-scored order total (the
    stand-in for any model probability); label = order is urgent/high
    priority.

    Determinism: mu/sd are canonicalized at 1e-2 (coarse on purpose —
    they only DEFINE the score; 1e-6 would sit inside the big sums'
    order noise), making z identical doubles on both engines; the
    logistic is canonicalized at 1e-6 before the 0.1-grid binning;
    per-bin conf/acc canon at 1e-6; ECE recombines FROM the canonical
    per-bin values.

    Scale shape: score is a broadcast-stats projection — NO global
    sort/window anywhere (the repo's bounded-window plan guard
    enforces it); binning + reliability is one 10-group aggregate."""
    o = load(spark, sf_dir, "orders")
    c2 = lambda col: F.floor(col * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)
    m = o.agg(
        c2(F.sum("o_totalprice") / F.count(F.lit(1))).alias("mu"),
        c2(
            F.sqrt(
                (
                    F.sum(F.col("o_totalprice") * F.col("o_totalprice"))
                    - F.sum("o_totalprice")
                    * F.lit(1.0)
                    * F.sum("o_totalprice")
                    / F.count(F.lit(1))
                )
                / (F.count(F.lit(1)) - 1)
            )
        ).alias("sd"),
    )
    z = (F.col("o_totalprice") - F.col("mu")) / F.col("sd")
    p = o.crossJoin(F.broadcast(m)).select(
        (
            F.floor(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) * F.lit(1e6) + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("score"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0
        )
        .otherwise(0.0)
        .alias("label"),
    )
    b = p.groupBy(
        F.least(F.floor(F.col("score") * 10).cast("long"), F.lit(9)).alias(
            "bin"
        )
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        # integer score-units / label sums + one identical division
        # (r16 grid-avg rule: both are grid-cell averages)
        (
            F.floor(
                F.sum(
                    F.floor(
                        F.col("score") * F.lit(1e6) + F.lit(0.5)
                    ).cast("long")
                ).cast("double")
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("conf_r"),
        (
            F.floor(
                F.sum(F.col("label").cast("long")).cast("double")
                * F.lit(1e6)
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("acc_r"),
    )
    wall = Window.partitionBy()
    gap = F.abs(F.col("acc_r") - F.col("conf_r"))
    return b.select(
        "bin",
        "n_b",
        "conf_r",
        "acc_r",
        gap.alias("gap_r"),
        (
            F.floor(
                F.sum(F.col("n_b") * gap).over(wall)
                / F.sum("n_b").over(wall)
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("ece_r"),
    ).orderBy("bin")


@register(
    "quality_order_total_reconciliation",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey,
               CAST(floor(sum(l_extendedprice * (1 - l_discount)
                              * (1 + l_tax)) * 1e6 + 0.5) AS BIGINT)
                   AS line_micro,
               CAST(count(*) AS BIGINT) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    ),
    j AS (
        SELECT o.o_orderkey, l.line_micro, l.n_lines,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                   AS book_cents,
               CASE WHEN l.l_orderkey IS NULL THEN 'NO_LINES'
                    WHEN abs(l.line_micro
                             - CAST(floor(o.o_totalprice * 100 + 0.5)
                                    AS BIGINT) * 10000)
                         <= CAST(floor(o.o_totalprice * 100 + 0.5)
                                 AS BIGINT) * 100 THEN 'OK'
                    ELSE 'MISMATCH' END AS status
        FROM orders o LEFT JOIN lines l ON l.l_orderkey = o.o_orderkey
    )
    SELECT status,
           CAST(count(*) AS BIGINT)                       AS n_orders,
           CAST(sum(book_cents) AS DOUBLE) / 100.0        AS book_total,
           floor(CAST(sum(COALESCE(line_micro, 0)) AS DOUBLE) / 1e4
                 + 0.5) / 100.0                           AS line_total,
           floor(CAST(sum(COALESCE(line_micro, 0) - book_cents * 10000)
                      AS DOUBLE) / 1e4 + 0.5) / 100.0     AS drift_total
    FROM j
    GROUP BY status
    ORDER BY status
    """,
)
def quality_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: does each order's booked
    total agree (within 1%) with the sum of its line-item net
    amounts?  The classic ledger-vs-detail audit — the first report a
    finance data team builds, and the canary for partial loads
    (orders without lines) and double-applied discounts.

    Determinism (reworked r16 after an sf0.1 boundary loss): all money
    moves through exact INTEGER units — the per-order line sum decodes
    to BIGINT micro-dollars (its true grain: 2dp price × 2dp discount
    × 2dp tax = 1e-6; the old round(...,2) sat BELOW grain, the
    CLAUDE.md forbidden case), the book total to BIGINT cents, the
    OK/MISMATCH tolerance compare is pure BIGINT
    (|line_micro − book_cents·1e4| ≤ book_cents·100 ⇔ within 1%), and
    every status rollup is an order-independent integer SUM with one
    identical FP division at the 2dp edge. The previous double-sum +
    round(2) edge lost drift_total at sf0.1 to ~1e-2 summation-order
    noise on a ±5e9 cancellation — no rounding grain survives noise
    bigger than the grain; integer sums have no order. (Exactness
    bound: |Σ micro-units| < 2^53 per status group holds through
    sf≈30; beyond that the edge stays cross-engine-equal — same
    BIGINT → same double — just not decimal-exact.)

    Scale shape: one orderkey-grain aggregate of lineitem (map-side
    combinable), one co-keyed LEFT join (both sides shuffle on the
    same key — bucketable), a status-grain rollup. No broadcast
    needed and none hinted: both sides are data-sized."""
    li = load(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.floor(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("line_micro"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    o = load(spark, sf_dir, "orders")
    book_cents = _cents(F.col("o_totalprice"))
    j = o.join(lines, o["o_orderkey"] == lines["l_orderkey"], "left").select(
        "o_orderkey",
        "line_micro",
        book_cents.alias("book_cents"),
        F.when(F.col("l_orderkey").isNull(), "NO_LINES")
        .when(
            F.abs(F.col("line_micro") - book_cents * 10000)
            <= book_cents * 100,
            "OK",
        )
        .otherwise("MISMATCH")
        .alias("status"),
    )
    return (
        j.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (F.sum("book_cents").cast("double") / F.lit(100.0)).alias(
                "book_total"
            ),
            (
                F.floor(
                    F.sum(F.coalesce(F.col("line_micro"), F.lit(0))).cast(
                        "double"
                    )
                    / F.lit(1e4)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("line_total"),
            (
                F.floor(
                    F.sum(
                        F.coalesce(F.col("line_micro"), F.lit(0))
                        - F.col("book_cents") * 10000
                    ).cast("double")
                    / F.lit(1e4)
                    + F.lit(0.5)
                )
                / F.lit(100.0)
            ).alias("drift_total"),
        )
        .orderBy("status")
    )
