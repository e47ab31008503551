"""Text analysis operators over `documents` — SURVEY.md §2B LLM ops.

Four families: quality scoring (length/stopword/type-token ratios),
language-ID (marker-word n-gram heuristic with deterministic argmax),
token counting (whitespace + BPE-ish regex), document fingerprinting
(polynomial rolling hash over md5-derived word hashes).

Everything is a pure JVM expression (split / filter / aggregate higher-
order functions + regexp) — no Python UDFs, so at 100 TB every query
here is a single map stage over the documents scan (plus one shuffle
for the grouped stats). Cross-engine: word hashes derive from md5 hex
(identical in Spark and DuckDB); ratios guard /0 with greatest(n,1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load

# Tiny public stopword/marker lists (heuristic language ID).
_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "es": ["el", "la", "los", "de", "que", "es", "y"],
    "fr": ["le", "la", "les", "et", "est", "que", "des"],
}
_LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic argmax tie-break

_STOPWORDS = _MARKERS["en"]

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_ROLL_P = 2147483647  # acc < 2^31, acc*131 + h < 2^39 — no int64 overflow


def _spark_list(words: list[str]) -> str:
    return "array(" + ",".join(f"'{w}'" for w in words) + ")"


def _duck_list(words: list[str]) -> str:
    return "[" + ",".join(f"'{w}'" for w in words) + "]"


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w FROM documents
    )
    SELECT
        doc_id,
        lang,
        CAST(len(w) AS BIGINT)                                    AS n_words,
        CAST(len(list_distinct(w)) AS BIGINT)                     AS n_distinct_words,
        n_chars / greatest(len(w), 1)                             AS avg_word_len,
        CAST(len(list_filter(w, x -> list_contains({_duck_list(_STOPWORDS)}, x)))
             AS DOUBLE) / greatest(len(w), 1)                     AS stopword_ratio,
        CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1) AS type_token_ratio,
        floor((
          0.4 * least(len(w) / 100.0, 1.0)
        + 0.3 * (CAST(len(list_filter(w, x -> list_contains({_duck_list(_STOPWORDS)}, x)))
                 AS DOUBLE) / greatest(len(w), 1))
        + 0.3 * (CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1))
        ) * 1e6 + 0.5) / 1e6                                      AS quality_score
    FROM t
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality metrics + composite score.

    Score = 0.4*length_saturation + 0.3*stopword_ratio + 0.3*TTR —
    the classic cheap pre-filter shape for training-data curation.
    """
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", "n_chars", F.split("text", " ").alias("w"))
    n_words = F.greatest(F.size("w"), F.lit(1))
    stop_hits = F.expr(
        f"size(filter(w, x -> array_contains({_spark_list(_STOPWORDS)}, x)))"
    )
    ttr = F.size(F.array_distinct("w")).cast("double") / n_words
    stop_ratio = stop_hits.cast("double") / n_words
    return t.select(
        "doc_id",
        "lang",
        F.size("w").cast("long").alias("n_words"),
        F.size(F.array_distinct("w")).cast("long").alias("n_distinct_words"),
        (F.col("n_chars") / n_words).alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("type_token_ratio"),
        # floor(x*1e6+0.5), not round(x,6): the score is a rational of
        # small integers that can sit EXACTLY on a .5e-6 boundary,
        # where Spark's and DuckDB's round algorithms disagree (seen
        # at sf0.1, r16); floor is the same IEEE computation in both
        # engines on bit-identical inputs.
        (
            F.floor(
                (
                    F.lit(0.4)
                    * F.least(F.size("w") / F.lit(100.0), F.lit(1.0))
                    + F.lit(0.3) * stop_ratio
                    + F.lit(0.3) * ttr
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("quality_score"),
    )


def _lang_scores_spark():
    """Marker-hit count per candidate language (Spark columns)."""
    return {
        lang: F.expr(
            f"size(filter(w, x -> array_contains({_spark_list(words)}, x)))"
        )
        for lang, words in _MARKERS.items()
    }


@register(
    "text_language_id",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ),
    s AS (
        SELECT doc_id, lang,
          {", ".join(
            f"len(list_filter(w, x -> list_contains({_duck_list(ws)}, x))) AS s_{lg}"
            for lg, ws in _MARKERS.items())}
        FROM t
    )
    SELECT
        doc_id,
        lang                                     AS labeled_lang,
        CASE
          {" ".join(
            f"WHEN s_{lg} >= greatest(s_en, s_de, s_es, s_fr) AND s_{lg} > 0 THEN '{lg}'"
            for lg in _LANG_ORDER)}
          ELSE 'unknown'
        END                                      AS predicted_lang,
        CAST(greatest(s_en, s_de, s_es, s_fr) AS BIGINT) AS marker_hits
    FROM s
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: per-language marker-word hit counts,
    deterministic argmax (fixed language order breaks ties), 'unknown'
    when no marker hits. The mechanism, not the synthetic labels, is
    what the oracle verifies."""
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.split("text", " ").alias("w"))
    scores = _lang_scores_spark()
    best = F.greatest(*[scores[lg] for lg in _LANG_ORDER])
    pred = F.lit("unknown")
    for lg in reversed(_LANG_ORDER):
        pred = F.when((scores[lg] >= best) & (scores[lg] > 0), F.lit(lg)).otherwise(
            pred
        )
    return t.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("long").alias("marker_hits"),
    )


@register(
    "text_token_counts",
    oracle=f"""
    SELECT
        doc_id,
        CAST(len(string_split(text, ' ')) AS BIGINT)                 AS ws_tokens,
        CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT) AS bpe_tokens,
        CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)  AS distinct_ws_tokens,
        CAST(n_chars AS DOUBLE)
          / greatest(len(regexp_extract_all(text, '{_TOKEN_RE}')), 1) AS chars_per_token
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace split vs BPE-ish regex pre-tokenizer
    (letter runs | digit runs | punctuation singletons)."""
    d = load(spark, sf_dir, "documents")
    bpe = F.regexp_count("text", F.lit(_TOKEN_RE))
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("distinct_ws_tokens"),
        (
            F.col("n_chars").cast("double") / F.greatest(bpe, F.lit(1))
        ).alias("chars_per_token"),
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                              x -> CAST('0x' || substr(md5(x), 1, 7) AS BIGINT)) AS hs
        FROM documents
    )
    SELECT
        doc_id,
        list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
                    (acc, h) -> (acc * 131 + h) % {_ROLL_P})  AS rolling_hash,
        CAST(list_min(hs) AS BIGINT)                          AS min_word_hash,
        CAST(list_max(hs) AS BIGINT)                          AS max_word_hash
    FROM t
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: order-sensitive polynomial rolling hash
    (base 131 mod 2^31-1) over md5-derived word hashes, plus min/max
    word hash (the 1-permutation MinHash degenerate case). Pure map
    stage — no shuffle."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(
            f"""
            aggregate(
              transform(split(text, ' '),
                        x -> CAST(conv(substr(md5(x), 1, 7), 16, 10) AS BIGINT)),
              0L, (acc, h) -> pmod(acc * 131 + h, {_ROLL_P}))
            """
        ).alias("rolling_hash"),
        F.expr(
            "CAST(array_min(transform(split(text, ' '), "
            "x -> CAST(conv(substr(md5(x), 1, 7), 16, 10) AS BIGINT))) AS BIGINT)"
        ).alias("min_word_hash"),
        F.expr(
            "CAST(array_max(transform(split(text, ' '), "
            "x -> CAST(conv(substr(md5(x), 1, 7), 16, 10) AS BIGINT))) AS BIGINT)"
        ).alias("max_word_hash"),
    )


@register(
    "text_stats_by_lang_source",
    oracle="""
    SELECT
        lang,
        source,
        CAST(count(*) AS BIGINT)                              AS n_docs,
        avg(n_chars)                                          AS avg_chars,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT)     AS total_words,
        CAST(sum(CASE WHEN n_chars < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        CAST(sum(CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END) AS BIGINT)
                                                              AS n_chars_consistent
    FROM documents
    GROUP BY lang, source
    """,
)
def text_stats_by_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, source): counts, sizes, short-doc count,
    and an n_chars==length(text) consistency check — partial aggregation
    makes the shuffle carry one row per group."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("total_words"),
        F.sum(F.when(F.col("n_chars") < 100, 1).otherwise(0))
        .cast("long")
        .alias("n_short"),
        F.sum(F.when(F.length("text") == F.col("n_chars"), 1).otherwise(0))
        .cast("long")
        .alias("n_chars_consistent"),
    )


@register(
    "text_redact_patterns",
    oracle="""
    SELECT
        doc_id,
        CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)     AS n_digit_runs,
        CAST(len(regexp_extract_all(text, '[a-z]{8,}')) AS BIGINT)  AS n_long_tokens,
        md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                           '[a-z]{8,}', '<TOK>', 'g'))              AS redacted_md5
    FROM documents
    """,
)
def text_redact_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction (the PII-scrub shape for training corpora):
    count and mask digit runs and long tokens; the md5 of the redacted
    text proves byte-identical scrubbing across engines. Pure map
    stage — at 100 TB this runs at scan speed."""
    d = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[0-9]+", "<NUM>"), "[a-z]{8,}", "<TOK>"
    )
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[0-9]+")).cast("long").alias("n_digit_runs"),
        F.regexp_count("text", F.lit("[a-z]{8,}")).cast("long").alias("n_long_tokens"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "text_bigram_lm_score",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM t, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1)
    SELECT
        bg.doc_id,
        CAST(count(*) AS BIGINT)              AS n_bigrams,
        floor(CAST(sum(CAST(floor(ln(c2.n2 / c1.n1) * 1e9 + 0.5)
                            AS BIGINT)) AS DOUBLE)
              / (count(*) * 1000.0) + 0.5) / 1e6 AS avg_logprob_r
    FROM bg
    JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
    JOIN c1 ON bg.w1 = c1.w1
    GROUP BY bg.doc_id
    """,
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model scoring: per-doc average bigram
    log-probability ln(C(w1,w2)/C(w1)) under the corpus MLE — the
    cheap fluency/quality signal used in data curation (low score ⇒
    unnatural token sequences).

    One pass builds bigrams (window lead over exploded words), the
    count tables are small (vocab²-bounded) and broadcast back — at
    100 TB the model fits in a broadcast while the fact side streams."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = words.select(
        "doc_id",
        F.col("w").alias("w1"),
        F.lead("w", 1).over(win).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    return (
        bg.join(F.broadcast(c2), ["w1", "w2"])
        .join(F.broadcast(c1), ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            # integer nano-unit ln cells + exact sum + one identical
            # division — same shape as text_stupid_backoff, whose
            # avg-of-cells form lost a doc at sf0.1 (r16)
            (
                F.floor(
                    F.sum(
                        F.floor(
                            F.log(F.col("n2") / F.col("n1")) * F.lit(1e9)
                            + F.lit(0.5)
                        ).cast("long")
                    ).cast("double")
                    / (F.count(F.lit(1)) * F.lit(1000.0))
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("avg_logprob_r"),
        )
    )


@register(
    "text_boilerplate_ngrams",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                 CASE WHEN len(w) >= 3
                      THEN [array_to_string(w[i:i+2], ' ')
                            FOR i IN range(1, len(w) - 1)]
                      ELSE [array_to_string(w, ' ')]
                 END)) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    n AS (SELECT count(*) AS total FROM documents)
    SELECT shingle,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) * 1.0 / any_value(n.total), 6) AS df_frac
    FROM sh, n
    GROUP BY shingle
    HAVING count(*) * 1.0 / any_value(n.total) >= 0.10
    """,
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: 3-gram shingles occurring in ≥10% of all
    documents (navigation chrome, license headers, cookie banners in a
    real crawl). Reuses the corpus shingling kernel (dedup._shingle_rows,
    whole-stage-codegen lead-window formulation), dedupes to document
    frequency, and emits shingles above the df threshold with their
    corpus share. The df table this produces is exactly the stop-
    shingle list the MinHash/decontamination stages cap with (DF_CAP) —
    at 100 TB it is the skew-control artifact, computed by one
    map-side-combined groupBy(shingle)."""
    from hive_task_spark.operators.dedup import _shingle_rows

    d = load(spark, sf_dir, "documents")
    total = d.agg(F.count(F.lit(1)).alias("total"))
    df_counts = (
        _shingle_rows(d)
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    return (
        df_counts.crossJoin(F.broadcast(total))
        .withColumn("df_frac", F.round(F.col("n_docs") / F.col("total"), 6))
        .filter(F.col("n_docs") / F.col("total") >= 0.10)
        .select("shingle", "n_docs", "df_frac")
    )


@register(
    "text_zipf_slope",
    oracle="""
    WITH freq AS (
        SELECT w, count(*) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    ranked AS (
        SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rk
        FROM freq
    )
    SELECT CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(f) AS BIGINT)   AS n_tokens,
           round(regr_slope(ln(f), ln(rk)), 4)     AS zipf_slope_r,
           round(regr_r2(ln(f), ln(rk)), 4)        AS zipf_r2_r
    FROM ranked
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus unigram distribution: explode →
    count → frequency rank → least-squares slope of log-frequency on
    log-rank (a healthy natural-language corpus sits near -1; template
    spam and boilerplate flatten it — a cheap corpus-health monitor).
    The explode+count is the one fact-scale stage (map-side combined);
    ranking and the regr_* aggregate run on the vocabulary table,
    orders of magnitude smaller. The global rank window is safe at
    vocab cardinality; for web-scale vocabularies the same rank comes
    from a two-pass split-point computation (SCALE.md token-budget
    note). Slope/R² rounded to 4 (transcendental edge discipline)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    ranked = freq.withColumn(
        "rk", F.row_number().over(Window.orderBy(F.col("f").desc(), "w"))
    )
    lf, lr = F.log(F.col("f")), F.log(F.col("rk"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope_r"),
        F.round(F.regr_r2(lf, lr), 4).alias("zipf_r2_r"),
    )


# Frozen ordered BPE merge table (textbook toy vocabulary): each merge
# fuses an adjacent symbol pair; later merges may consume earlier
# outputs ('th'+'e'). The '·' marker separates not-yet-merged symbols.
_BPE_MERGES = [
    ("t", "h"),
    ("h", "e"),
    ("i", "n"),
    ("e", "r"),
    ("a", "n"),
    ("r", "e"),
    ("o", "n"),
    ("th", "e"),
]


def _bpe_chain(expr: str, quote: str) -> str:
    """Nested replace() chain applying the merges in order; `expr` is a
    SQL expression yielding the '·'-separated symbol string."""
    out = expr
    for a, b in _BPE_MERGES:
        out = f"replace({out}, {quote}{a}·{b}{quote}, {quote}{a}{b}{quote})"
    return out


_BPE_DUCK_SYM = "trim(TRAILING '·' FROM regexp_replace(word, '(.)', '\\1·', 'g'))"


@register(
    "text_bpe_apply",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        FROM documents WHERE doc_id <= 200
    ),
    m AS (
        SELECT doc_id, word,
               {_bpe_chain(_BPE_DUCK_SYM, chr(39))}
                   AS merged
        FROM w WHERE word <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(merged) - length(replace(merged, '·', '')) + 1)
                AS BIGINT)          AS n_bpe_tokens,
           CAST(sum(length(word)) AS BIGINT) AS n_chars
    FROM m GROUP BY doc_id
    """,
)
def text_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION (the mechanism, not a trained vocab):
    each word explodes into '·'-separated symbols and a frozen ordered
    merge table fuses adjacent pairs — exactly how byte-pair encoding
    tokenizes at inference, expressed as a chain of 8 constant
    replace() calls that whole-stage codegen fuses into one scan-speed
    map (no UDF, no Python). Emits per-doc word/BPE-token/char counts
    — the token-budget accounting a real pipeline does with the real
    tokenizer; swapping in a production vocab means swapping the merge
    literal. Merge semantics are pure string rewriting, so the DuckDB
    twin is the identical replace chain."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") <= 200)
        .select("doc_id", F.split(F.lower("text"), " ").alias("ws"))
    )
    sym = "trim(TRAILING '·' FROM regexp_replace(w, '(.)', '$1·'))"
    merged_counts = (
        "aggregate(filter(ws, w -> w <> ''), "
        "named_struct('words', CAST(0 AS BIGINT), 'toks', CAST(0 AS BIGINT), "
        "'chars', CAST(0 AS BIGINT)), "
        "(acc, w) -> named_struct("
        "'words', acc.words + 1, "
        f"'toks', acc.toks + length({_bpe_chain(sym, chr(39))}) "
        f"- length(replace({_bpe_chain(sym, chr(39))}, '·', '')) + 1, "
        "'chars', acc.chars + length(w)))"
    )
    return d.select(
        "doc_id", F.expr(merged_counts).alias("s")
    ).select(
        "doc_id",
        F.col("s.words").alias("n_words"),
        F.col("s.toks").alias("n_bpe_tokens"),
        F.col("s.chars").alias("n_chars"),
    )


_BM25_TERMS = ["spark", "data", "query"]
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "text_bm25_scoring",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents
    ),
    tf AS (
        SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
               {", ".join(
                   f"CAST(len(list_filter(ws, w -> w = '{t}')) AS BIGINT) AS tf_{i}"
                   for i, t in enumerate(_BM25_TERMS))}
        FROM d
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dl) AS BIGINT)  AS total_dl,
               {", ".join(
                   f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT)"
                   f" AS df_{i}" for i in range(len(_BM25_TERMS)))}
        FROM tf
    )
    SELECT tf.doc_id,
           CAST({" + ".join(f"CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END"
                            for i in range(len(_BM25_TERMS)))} AS BIGINT)
               AS n_terms_matched,
           round({" + ".join(
               f"ln((CAST(n AS DOUBLE) - df_{i} + 0.5) / (df_{i} + 0.5) + 1)"
               f" * (tf_{i} * ({_BM25_K1} + 1))"
               f" / (tf_{i} + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl"
               f" * CAST(n AS DOUBLE) / total_dl))"
               for i in range(len(_BM25_TERMS)))}, 6) AS score_r
    FROM tf CROSS JOIN stats
    WHERE {" + ".join(f"tf_{i}" for i in range(len(_BM25_TERMS)))} > 0
    """,
)
def text_bm25_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance scoring (k1=1.2, b=0.75) for a fixed query
    over the corpus — the standard lexical retrieval scorer (what
    `text_tfidf_top_terms` is to salience, this is to ranked search):
    saturating term frequency, document-length normalization against
    the corpus mean, and the +1-smoothed idf. Per-doc term counts are
    one in-row filter per query term (scan-speed, no explode, no
    join); the corpus statistics (N, Σdl, per-term df) are ONE
    aggregate broadcast back — so the whole scorer is two passes at
    any corpus size. dl/avgdl is computed as dl·N/Σdl (exact-int
    products before the one division) and the final score rounds at
    6dp to absorb the JVM-vs-libm last-bit of ln()."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("ws")
    )
    tf = d.select(
        "doc_id",
        F.size("ws").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter(ws, w -> w = '{t}'))")
            .cast("long")
            .alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = tf.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("total_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long"))
            .cast("long")
            .alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    j = tf.crossJoin(F.broadcast(stats)).filter(
        sum((F.col(f"tf_{i}") for i in range(len(_BM25_TERMS))), start=F.lit(0))
        > 0
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        tf_i, df_i = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(
            (F.col("n").cast("double") - df_i + 0.5) / (df_i + 0.5) + 1
        )
        part = (
            idf
            * (tf_i * (_BM25_K1 + 1))
            / (
                tf_i
                + _BM25_K1
                * (
                    1
                    - _BM25_B
                    + _BM25_B
                    * F.col("dl")
                    * F.col("n").cast("double")
                    / F.col("total_dl")
                )
            )
        )
        score = part if score is None else score + part
    matched = sum(
        ((F.col(f"tf_{i}") > 0).cast("long") for i in range(len(_BM25_TERMS))),
        start=F.lit(0).cast("long"),
    )
    return j.select(
        "doc_id",
        matched.cast("long").alias("n_terms_matched"),
        F.round(score, 6).alias("score_r"),
    )


@register(
    "text_ndcg_eval",
    oracle="""
    WITH rated AS (
        SELECT source, doc_id, n_chars,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                         AS BIGINT) % 4 AS BIGINT) AS rel
        FROM documents
    ),
    by_score AS (
        SELECT source, rel,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS pos
        FROM rated
    ),
    by_ideal AS (
        SELECT source, rel,
               row_number() OVER (PARTITION BY source
                                  ORDER BY rel DESC, doc_id) AS pos
        FROM rated
    ),
    dcg AS (
        SELECT source,
               sum((pow(2, rel) - 1) / log2(pos + 1)) AS dcg
        FROM by_score WHERE pos <= 10 GROUP BY source
    ),
    idcg AS (
        SELECT source,
               sum((pow(2, rel) - 1) / log2(pos + 1)) AS idcg,
               CAST(count(*) AS BIGINT) AS n_rated
        FROM by_ideal WHERE pos <= 10 GROUP BY source
    )
    SELECT d.source, i.n_rated,
           round(d.dcg, 6) AS dcg_r,
           round(i.idcg, 6) AS idcg_r,
           round(d.dcg / i.idcg, 6) AS ndcg_r
    FROM dcg d JOIN idcg i ON d.source = i.source
    """,
)
def text_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality evaluation: NDCG@10 per source group, scoring the
    length-prior ranking (n_chars DESC, the same quality proxy the
    corpus filters use) against a deterministic graded relevance
    label (md5(doc_id)-derived, 0-3). DCG and the ideal DCG come
    from two ranking windows over the SAME rated relation — one pass
    of documents, one shuffle on the query-group key, top-10 frames
    only; exactly how retrieval eval runs at corpus scale (per-query
    partitions are small; the fan-in is the per-source join of two
    10-row aggregates). Gain terms are exact powers of two over
    log2; the 6dp edge round covers the transcendental."""
    from pyspark.sql import Window

    rated = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        "n_chars",
        (
            F.expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS BIGINT)")
            % 4
        ).cast("long").alias("rel"),
    )
    gain = (F.pow(F.lit(2), F.col("rel")) - 1) / F.log2(F.col("pos") + 1)
    by_score = rated.select(
        "source",
        "rel",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("pos"),
    ).filter(F.col("pos") <= 10)
    by_ideal = rated.select(
        "source",
        "rel",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.col("rel").desc(), "doc_id"))
        .alias("pos"),
    ).filter(F.col("pos") <= 10)
    dcg = by_score.groupBy("source").agg(F.sum(gain).alias("dcg"))
    idcg = by_ideal.groupBy("source").agg(
        F.sum(gain).alias("idcg"), F.count(F.lit(1)).cast("long").alias("n_rated")
    )
    return dcg.join(idcg, "source").select(
        "source",
        "n_rated",
        F.round("dcg", 6).alias("dcg_r"),
        F.round("idcg", 6).alias("idcg_r"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_r"),
    )


def _confusion_oracle() -> str:
    from hive_task_spark.registry import ORACLES

    return f"""
    WITH pred AS ({ORACLES["text_language_id"]})
    SELECT labeled_lang, predicted_lang,
           CAST(count(*) AS BIGINT) AS n,
           (labeled_lang = predicted_lang) AS is_correct
    FROM pred GROUP BY labeled_lang, predicted_lang
    """


@register("text_langid_confusion", oracle=_confusion_oracle())
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation confusion matrix for the heuristic
    language identifier: labeled vs predicted language cell counts
    (the operator every model-eval pipeline runs after inference).
    Reuses `text_language_id`'s per-doc predictions — one extra
    tiny aggregate on top of that scan-speed map stage; the oracle
    composes the langid oracle as a CTE so both layers stay
    verified together."""
    pred = text_language_id(spark, sf_dir)
    return pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max(F.col("labeled_lang") == F.col("predicted_lang")).alias(
            "is_correct"
        ),
    )


@register(
    "text_bpe_train_step",
    oracle="""
    WITH words AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(w)),
                                     i -> substr(w, CAST(i AS INTEGER), 2)))
                   AS pair
        FROM words WHERE len(w) >= 2
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM pairs
    WHERE pair ~ '^[a-z]{2}$'
    GROUP BY pair
    ORDER BY n DESC, pair LIMIT 20
    """,
)
def text_bpe_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training induction step: count adjacent character-pair
    frequencies across the corpus and rank the top-20 merge
    candidates — the statistic that drives every merge round of
    byte-pair-encoding tokenizer training (`text_bpe_apply` is the
    inference side). Pure codegen: split to chars, self-align
    adjacent positions, one hash aggregate; the pair space is
    bounded (alphabet^2) so the final aggregate is tiny and
    map-side combinable. Training at 100 TB iterates this exact
    query with the winning merge folded in — each round is one scan,
    which is why corpus-scale BPE training is feasible at all."""
    d = load(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.filter(F.col("pair").rlike("^[a-z]{2}$"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@register(
    "text_pmi_collocations",
    oracle="""
    WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    bg AS (
        SELECT w[i] AS w1, w[i + 1] AS w2
        FROM (SELECT string_split(text, ' ') AS w FROM documents),
             LATERAL (SELECT unnest(range(1, len(w))) AS i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w, count(*) AS n_w FROM words GROUP BY w),
    tot AS (
        SELECT (SELECT count(*) FROM bg) AS n_b,
               (SELECT count(*) FROM words) AS n_u
    )
    SELECT c2.w1, c2.w2, CAST(c2.n_ab AS BIGINT) AS n_ab,
           round(ln(CAST(c2.n_ab * tot.n_u * tot.n_u AS DOUBLE)
                    / CAST(tot.n_b * a.n_w * b.n_w AS DOUBLE)), 6)
               AS pmi_r
    FROM c2
    JOIN c1 a ON c2.w1 = a.w
    JOIN c1 b ON c2.w2 = b.w
    CROSS JOIN tot
    WHERE c2.n_ab >= 5
    ORDER BY pmi_r DESC, c2.w1, c2.w2
    LIMIT 20
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by pointwise mutual information: bigrams
    whose corpus probability exceeds what independent unigram draws
    predict — PMI = ln(p(ab) / (p(a) p(b))) with p(ab) from the
    bigram census and p(a) from the unigram census. The standard
    phrase-detection signal ("New York"-style units) used when
    building tokenizer vocabularies and phrase tables from a crawl.
    Computed as one log of an exact-int64 ratio (n_ab * N_u^2) /
    (N_b * c_a * c_b) so both engines see bit-identical operands;
    min-count 5 suppresses noise PMI inflation on rare pairs. The
    count tables are vocab-bounded and broadcast back onto the
    bigram census — at 100 TB the fact pass is one map-side-combined
    groupBy, never a shuffle of the corpus text itself."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = words.select(
        "doc_id",
        F.col("w").alias("w1"),
        F.lead("w", 1).over(win).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    c1 = words.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    tot = bg.agg(F.count(F.lit(1)).alias("n_b")).crossJoin(
        F.broadcast(words.agg(F.count(F.lit(1)).alias("n_u")))
    )
    return (
        c2.filter(F.col("n_ab") >= 5)
        .join(
            F.broadcast(c1.select(F.col("w").alias("w1"), F.col("n_w").alias("na"))),
            "w1",
        )
        .join(
            F.broadcast(c1.select(F.col("w").alias("w2"), F.col("n_w").alias("nb"))),
            "w2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_u") * F.col("n_u")).cast("double")
                    / (F.col("n_b") * F.col("na") * F.col("nb")).cast("double")
                ),
                6,
            ).alias("pmi_r"),
        )
        .orderBy(F.col("pmi_r").desc(), "w1", "w2")
        .limit(20)
    )


@register(
    "text_inverted_index",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE len(w) >= 3
    ),
    tot AS (SELECT count(*) AS n_docs FROM documents)
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(count(*) > 0.8 * any_value(tot.n_docs) AS BIGINT)
               AS is_stop,
           CASE WHEN count(*) <= 0.8 * any_value(tot.n_docs)
                THEN string_agg(CAST(doc_id AS VARCHAR), '|'
                                ORDER BY doc_id)
           END AS postings
    FROM pairs, tot
    GROUP BY term
    """,
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build — the IR backbone: term -> (document
    frequency, sorted posting list). Distinct (doc, term) pairs feed
    one map-side-combined groupBy(term) that emits df and the
    numerically-sorted doc_id posting list ('|'-serialized at the
    edge per the complex-type rule). Terms present in more than 80%
    of the corpus are flagged as stopwords and their postings are
    ELIDED (NULL) — exactly how production indexes control the
    posting-list skew that kills the build at 100 TB: a stopword's
    list is O(corpus) on one reducer key, and eliding (or
    impact-ordering/truncating) it bounds every reducer. The corpus
    scan is shuffle-once on term; df and postings come from the same
    aggregate."""
    d = load(spark, sf_dir, "documents")
    tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.length("term") >= 3)
        .distinct()
    )
    agg = pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.expr(
            "array_join(transform(sort_array(collect_list(doc_id)),"
            " x -> cast(x as string)), '|')"
        ).alias("all_postings"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "term",
        "df",
        (F.col("df") > 0.8 * F.col("n_docs")).cast("long").alias("is_stop"),
        F.when(
            F.col("df") <= 0.8 * F.col("n_docs"), F.col("all_postings")
        ).alias("postings"),
    )


@register(
    "text_kwic_concordance",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT doc_id, w AS term
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        WHERE len(w) >= 3
    ),
    kw AS (
        SELECT term FROM pairs GROUP BY term
        ORDER BY count(*), term LIMIT 1
    ),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    hits AS (
        SELECT t.doc_id, i.i AS p, t.ws
        FROM toks t
        JOIN kw ON true
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(t.ws) + 1)) AS i) i
        WHERE t.ws[i.i] = kw.term
    )
    SELECT doc_id, CAST(p AS BIGINT) AS p,
           array_to_string(ws[greatest(1, p - 2):least(len(ws), p + 2)],
                           ' ') AS context
    FROM hits
    """,
)
def text_kwic_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context (KWIC) concordance — the corpus-linguistics
    / search-snippet kernel: every occurrence of the target term is
    reported with its ±2-token window. The target is chosen
    deterministically as the rarest indexable term (min document
    frequency, alphabetical tie-break — the same census the inverted
    index builds), so the query composes two self-describing passes:
    a vocab-bounded df aggregate broadcast as a one-row dim, then a
    positional scan that slices the token array around each hit.
    The token arrays are materialized once per doc in a separate
    projection (HOF-reevaluation trap) and the slice is pure
    codegen; snippet extraction at 100 TB is this exact shape with
    the keyword side being a query, not a census."""
    d = load(spark, sf_dir, "documents")
    pairs = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.length("term") >= 3)
        .distinct()
    )
    kw = (
        pairs.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy("df", "term")
        .limit(1)
        .select("term")
    )
    toks = d.select("doc_id", F.split("text", " ").alias("ws"))
    hits = (
        toks.select(
            "doc_id", "ws", F.posexplode("ws").alias("pos0", "w")
        )
        .join(F.broadcast(kw), F.col("w") == F.col("term"))
        .select("doc_id", "ws", (F.col("pos0") + 1).alias("p"))
    )
    return hits.select(
        "doc_id",
        F.col("p").cast("long").alias("p"),
        F.array_join(
            F.expr(
                "slice(ws, greatest(1, p - 2),"
                " least(size(ws), p + 2) - greatest(1, p - 2) + 1)"
            ),
            " ",
        ).alias("context"),
    )


@register(
    "text_blocklist_leet_filter",
    oracle="""
    WITH kw AS (
        SELECT term FROM (
            SELECT w AS term, count(*) AS c
            FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
                         AS w FROM documents)
            WHERE len(w) >= 3
            GROUP BY w
        ) t ORDER BY c, term LIMIT 2
    ),
    obf AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0
                    THEN translate(text, 'aeost', '43057')
                    ELSE text END AS text,
               CAST(doc_id % 7 = 0 AS BIGINT) AS is_obfuscated
        FROM documents
    ),
    normed AS (
        SELECT doc_id, text, is_obfuscated,
               translate(text, '43057', 'aeost') AS norm
        FROM obf
    )
    SELECT n.doc_id, n.is_obfuscated, k.term AS matched_term,
           CAST(contains(' ' || n.text || ' ', ' ' || k.term || ' ')
                AS BIGINT) AS raw_hit,
           CAST(contains(' ' || n.norm || ' ', ' ' || k.term || ' ')
                AS BIGINT) AS norm_hit
    FROM normed n JOIN kw k
      ON contains(' ' || n.norm || ' ', ' ' || k.term || ' ')
    """,
)
def text_blocklist_leet_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Obfuscation-resistant blocklist matching — content moderation's
    cat-and-mouse baseline: a deterministic subset of documents is
    leet-encoded (a→4, e→3, o→0, s→5, t→7 — the classic evasion),
    and the filter matches the blocklist (the two rarest corpus
    terms) against the TRANSLATE-normalized text instead of the raw
    text. raw_hit vs norm_hit makes the evasion visible: obfuscated
    docs match only after normalization — exactly the rows a naive
    filter ships to training. translate() is row-local codegen, so
    the normalization layer costs nothing at 100 TB; real systems
    stack more folds (confusables, width, diacritics) on the same
    shape."""
    d = load(spark, sf_dir, "documents")
    kw = (
        d.select(
            "doc_id",
            F.explode(F.array_distinct(F.split("text", " "))).alias("term"),
        )
        .filter(F.length("term") >= 3)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("c", "term")
        .limit(2)
        .select("term")
    )
    obf = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.translate("text", "aeost", "43057"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        (F.col("doc_id") % 7 == 0).cast("long").alias("is_obfuscated"),
    )
    normed = obf.withColumn("norm", F.translate("text", "43057", "aeost"))
    pad = lambda c: F.concat(F.lit(" "), F.col(c), F.lit(" "))
    padded_term = F.concat(F.lit(" "), F.col("term"), F.lit(" "))
    return (
        normed.crossJoin(F.broadcast(kw))
        .filter(F.contains(pad("norm"), padded_term))
        .select(
            "doc_id",
            "is_obfuscated",
            F.col("term").alias("matched_term"),
            F.contains(pad("text"), padded_term).cast("long").alias("raw_hit"),
            F.contains(pad("norm"), padded_term).cast("long").alias("norm_hit"),
        )
    )


@register(
    "text_log_template_mining",
    oracle="""
    WITH lines AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN 'ingest doc ' || doc_id || ' from ' || source
                         || ' took ' || (n_chars % 97) || 'ms'
                    WHEN doc_id % 3 = 1
                    THEN 'dedup pass kept doc ' || doc_id || ' ('
                         || n_chars || ' chars)'
                    ELSE 'worker ' || (doc_id % 8) || ' flushed '
                         || n_chars || ' bytes for ' || source
               END AS line
        FROM documents
    ),
    templ AS (
        SELECT doc_id, line,
               regexp_replace(line, '[0-9]+', '#', 'g') AS template
        FROM lines
    )
    SELECT template,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(doc_id) AS BIGINT) AS example_doc
    FROM templ
    GROUP BY template
    HAVING count(*) >= 2
    """,
)
def text_log_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-template mining (Drain-lite) — collapse log lines that
    differ only in their variable parts: digits mask to '#' and the
    masked line becomes the template key, so "worker 7 flushed 312
    bytes" and "worker 3 flushed 88 bytes" group together. The log
    fixture is synthesized deterministically from document metadata
    (three message shapes with embedded ids/sizes — the
    corpus-derived stand-in for an app log, since the documents
    table itself is digit-free). The (template, frequency, example)
    census is how log analytics turns billions of lines into
    hundreds of event types — the prerequisite for per-template rate
    anomaly detection and for dropping noise templates before
    indexing. One regexp_replace (row-local codegen) + one groupBy
    on the masked key; real systems add masks for hex ids, IPs and
    paths on the same shape."""
    d = load(spark, sf_dir, "documents")
    lines = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("ingest doc "), F.col("doc_id").cast("string"),
                F.lit(" from "), F.col("source"),
                F.lit(" took "), (F.col("n_chars") % 97).cast("string"),
                F.lit("ms"),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(
                F.lit("dedup pass kept doc "), F.col("doc_id").cast("string"),
                F.lit(" ("), F.col("n_chars").cast("string"),
                F.lit(" chars)"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("worker "), (F.col("doc_id") % 8).cast("string"),
                F.lit(" flushed "), F.col("n_chars").cast("string"),
                F.lit(" bytes for "), F.col("source"),
            )
        )
        .alias("line"),
    )
    templ = lines.select(
        "doc_id",
        F.regexp_replace("line", "[0-9]+", "#").alias("template"),
    )
    return (
        templ.groupBy("template")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.min("doc_id").cast("long").alias("example_doc"),
        )
        .filter(F.col("n_lines") >= 2)
    )


@register(
    "text_tokenizer_fertility",
    oracle="""
    WITH m AS (
        SELECT lang,
               count(*) AS n_docs,
               sum(len(string_split(text, ' '))) AS n_words,
               sum(len(replace(text, ' ', ''))) AS n_chars_nospace,
               sum(CAST(ceil(len(replace(text, ' ', '')) / 4.0) AS BIGINT)
                   + len(string_split(text, ' ')) - 1) AS n_subtokens
        FROM documents GROUP BY lang
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_words AS BIGINT) AS n_words,
           round(n_subtokens * 1.0 / n_words, 6) AS fertility_r,
           round(n_chars_nospace * 1.0 / n_subtokens, 6)
               AS chars_per_token_r
    FROM m
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — subword tokens per word, the
    metric that decides whether a tokenizer taxes a language (high
    fertility = more tokens per content unit = higher cost and
    shorter effective context for that language; the mT5/NLLB audit
    everyone runs). The subword count uses the standard
    closed-form proxy ceil(chars/4) per word aggregated as
    ceil(total_chars/4)+words-1-ish (a fixed bytes-per-token model —
    swap in the BPE-apply row's real token counts to harden it);
    both fertility and chars/token reduce from ONE language census
    pass. Feeds the temperature-mixture row: tempered shares
    measured in TOKENS, not docs, need exactly this table."""
    d = load(spark, sf_dir, "documents")
    words = F.size(F.split("text", " "))
    chars_ns = F.length(F.regexp_replace("text", " ", ""))
    m = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(words).alias("n_words"),
        F.sum(chars_ns).alias("n_chars_nospace"),
        F.sum(
            F.ceil(chars_ns / 4.0).cast("long") + words - 1
        ).alias("n_subtokens"),
    )
    return m.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_words").cast("long").alias("n_words"),
        F.round(F.col("n_subtokens") / F.col("n_words"), 6).alias(
            "fertility_r"
        ),
        F.round(
            F.col("n_chars_nospace") / F.col("n_subtokens"), 6
        ).alias("chars_per_token_r"),
    )


@register(
    "text_vocab_coverage_curve",
    oracle="""
    WITH freq AS (
        SELECT w, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY w
    ),
    ranked AS (
        SELECT w, n,
               row_number() OVER (ORDER BY n DESC, w) AS rk,
               sum(n) OVER (ORDER BY n DESC, w
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n) OVER () AS tot
        FROM freq
    ),
    marks AS (SELECT unnest([50, 90, 95, 99]) AS pct)
    SELECT CAST(marks.pct AS BIGINT) AS pct,
           CAST(min(rk) AS BIGINT) AS types_needed,
           CAST(max(tot) AS BIGINT) AS total_tokens
    FROM ranked JOIN marks ON ranked.cum * 100 >= marks.pct * ranked.tot
    GROUP BY marks.pct
    """,
)
def text_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — how many vocabulary types cover
    50/90/95/99% of all token occurrences: THE sizing tool for
    tokenizer vocabularies and stopword lists (a steep curve means a
    tiny core vocab carries the corpus; the 99% tail is where OOV
    and fertility costs live). Frequencies sort once (|vocab| rows),
    the cumulative share is an integer comparison cum*100 >= pct*tot
    (no float at the threshold), and each mark reports the minimal
    rank reaching it. The corpus pass is the token census every
    other text row shares; everything after is vocab-sized."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    word = Window.orderBy(F.col("n").desc(), "w")
    ranked = freq.select(
        "w",
        "n",
        F.row_number().over(word).alias("rk"),
        F.sum("n").over(word.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "cum"
        ),
        F.sum("n").over(Window.partitionBy()).alias("tot"),
    )
    marks = spark.createDataFrame(
        [(50,), (90,), (95,), (99,)], "pct INT"
    )
    return (
        ranked.crossJoin(F.broadcast(marks))
        .filter(F.col("cum") * 100 >= F.col("pct") * F.col("tot"))
        .groupBy(F.col("pct").cast("long").alias("pct"))
        .agg(
            F.min("rk").cast("long").alias("types_needed"),
            F.max("tot").cast("long").alias("total_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: lexical-statistics family (hapax/TTR, Heaps' law,
# n-gram novelty). All are token/shingle-grain shuffles — the same
# scale class as the TF-IDF and decontamination rows.
# ---------------------------------------------------------------------------


@register(
    "text_hapax_legomena",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY source, w)
    SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_cnt,
           round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) / (1.0 * count(*)), 6)
               AS hapax_ratio_r,
           round(count(*) / (1.0 * sum(c)), 6) AS ttr_r
    FROM tc GROUP BY source
    """,
)
def text_hapax_legomena(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena audit per source: token count, vocabulary size,
    singleton-type count, hapax ratio, and type-token ratio. A high
    hapax ratio flags OCR noise / mojibake / ID-like junk vocabulary;
    a collapsing TTR flags templated spam — both standard pre-train
    corpus screens. One explode + (source, token) count + per-source
    rollup: two map-side-combinable aggregates on the token grain,
    the same shuffle class as TF-IDF. Ratios round at 6dp."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    tc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    return tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax_cnt"),
        F.round(
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            / (F.lit(1.0) * F.count(F.lit(1))),
            6,
        ).alias("hapax_ratio_r"),
        F.round(F.count(F.lit(1)) / (F.lit(1.0) * F.sum("c")), 6).alias("ttr_r"),
    )


@register(
    "text_heaps_law",
    oracle="""
    WITH tok AS (
        SELECT CAST(doc_id // 100 AS BIGINT) AS bucket,
               unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    firstb AS (SELECT w, min(bucket) AS fb FROM tok GROUP BY w),
    newv AS (
        SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_types
        FROM firstb GROUP BY fb
    ),
    btok AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY bucket
    ),
    cum AS (
        SELECT b.bucket, b.n_tok, coalesce(n.new_types, 0) AS new_types,
               CAST(sum(coalesce(n.new_types, 0))
                    OVER (ORDER BY b.bucket) AS BIGINT) AS cum_vocab,
               CAST(sum(b.n_tok) OVER (ORDER BY b.bucket) AS BIGINT)
                   AS cum_tokens
        FROM btok b LEFT JOIN newv n USING (bucket)
    ),
    beta AS (
        SELECT regr_slope(ln(1.0 * cum_vocab), ln(1.0 * cum_tokens)) AS beta
        FROM cum
    )
    SELECT bucket, n_tok, new_types, cum_vocab, cum_tokens,
           round(beta.beta, 6) AS heaps_beta_r
    FROM cum CROSS JOIN beta
    """,
)
def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: bucket the corpus into 100-doc
    chunks (by doc_id), chart cumulative vocabulary vs cumulative
    tokens, and fit the log-log slope β (V ≈ k·Tᵝ; natural text sits
    near β≈0.5 — a β drifting toward 0 flags a saturating/templated
    corpus, toward 1 flags ID-like unbounded vocab). 'New types per
    bucket' comes from min(bucket) per token — one token-grain
    aggregate, no cumulative distinct state; the cumulative windows
    run over the |buckets|-row aggregate. β broadcasts back as a
    constant column (regr_slope exact in both engines, 6dp)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        F.floor(F.col("doc_id") / 100).cast("long").alias("bucket"),
        F.explode(F.split("text", " ")).alias("w"),
    )
    firstb = tok.groupBy("w").agg(F.min("bucket").alias("fb"))
    newv = firstb.groupBy(F.col("fb").alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    btok = tok.groupBy("bucket").agg(F.count(F.lit(1)).cast("long").alias("n_tok"))
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        btok.join(newv, "bucket", "left")
        .select(
            "bucket",
            "n_tok",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .select(
            "bucket",
            "n_tok",
            "new_types",
            F.sum("new_types").over(w_cum).cast("long").alias("cum_vocab"),
            F.sum("n_tok").over(w_cum).cast("long").alias("cum_tokens"),
        )
    )
    beta = cum.agg(
        F.expr(
            "regr_slope(ln(1.0 * cum_vocab), ln(1.0 * cum_tokens))"
        ).alias("beta")
    )
    return cum.crossJoin(F.broadcast(beta)).select(
        "bucket",
        "n_tok",
        "new_types",
        "cum_vocab",
        "cum_tokens",
        F.round(F.col("beta"), 6).alias("heaps_beta_r"),
    )


@register(
    "text_ngram_novelty",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(CASE WHEN len(w) >= 3
                      THEN [array_to_string(w[i:i+2], ' ')
                            FOR i IN range(1, len(w) - 1)]
                      ELSE [array_to_string(w, ' ')] END) AS shingle
        FROM w
    ),
    fd AS (SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY shingle)
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 / (1.0 * count(*)), 6) AS novelty_r
    FROM sh s JOIN fd f USING (shingle)
    GROUP BY s.doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    word-trigrams never seen in any earlier doc (doc_id order) — the
    incremental-crawl screen that separates fresh content from echo
    (near-1 = novel, near-0 = recombination of known text). Reuses the
    codegen shingler from the dedup family (dedup._shingle_rows: lead-
    window trigrams, short docs emit their raw text); 'seen earlier'
    is min(doc_id) per shingle — a single shingle-grain aggregate +
    equi-join, the decontaminate shuffle class, never a scan of past
    corpus per doc. Ratio rounds at 6dp."""
    from hive_task_spark.operators.dedup import _shingle_rows

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    sh = _shingle_rows(d).distinct()
    fd = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        sh.join(fd, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(novel).cast("long").alias("n_novel"),
            F.round(F.sum(novel) / (F.lit(1.0) * F.count(F.lit(1))), 6).alias(
                "novelty_r"
            ),
        )
    )


@register(
    "text_token_entropy",
    oracle="""
    WITH tc AS (
        SELECT doc_id, source, w, count(*) AS c FROM (
            SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
            FROM documents
        ) GROUP BY doc_id, source, w
    ),
    pr AS (
        SELECT doc_id, source,
               c / (1.0 * sum(c) OVER (PARTITION BY doc_id)) AS p
        FROM tc
    ),
    dt AS (
        SELECT doc_id, source, sum(-1.0 * p * ln(p) / ln(2)) AS h
        FROM pr GROUP BY doc_id, source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(h), 6) AS mean_entropy_r,
           round(min(h), 6) AS min_entropy_r,
           round(max(h), 6) AS max_entropy_r
    FROM dt GROUP BY source
    """,
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy rolled up per source — the
    compression-ratio proxy that flags templated/repetitive documents
    (low entropy = the doc is a few tokens looping; high = diverse
    vocabulary), a standard pretrain quality gate next to the gopher
    and repetition rows. The (doc, token) count and the per-doc
    probability both come from one token-grain aggregate + one doc-
    partitioned window SUM (no second corpus pass); entropy is a
    transcendental edge → 6dp round after the final per-source
    reduction."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") / (F.lit(1.0) * tot)
    dt = (
        tc.select("doc_id", "source", (-1.0 * p * F.log(p) / F.log(F.lit(2.0))).alias("term"))
        .groupBy("doc_id", "source")
        .agg(F.sum("term").alias("h"))
    )
    return dt.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("h"), 6).alias("mean_entropy_r"),
        F.round(F.min("h"), 6).alias("min_entropy_r"),
        F.round(F.max("h"), 6).alias("max_entropy_r"),
    )


@register(
    "text_source_vocab_overlap",
    oracle="""
    WITH sv AS (
        SELECT DISTINCT source, w FROM (
            SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
        )
    ),
    vs AS (SELECT source, count(*) AS v FROM sv GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           round(i.n_common / (1.0 * (va.v + vb.v - i.n_common)), 6)
               AS jaccard_r
    FROM inter i
    JOIN vs va ON va.source = i.src_a
    JOIN vs vb ON vb.source = i.src_b
    """,
)
def text_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-by-source vocabulary Jaccard matrix — the corpus-mix
    diagnostic that says which sources are lexical near-clones (merge
    or deduplicate them) and which add genuinely new vocabulary to the
    mix. Intersections come from the (source, token) DISTINCT relation
    self-joined on token — posting-list style, O(Σ df²) not
    |sources|²·|vocab| — and vocabulary sizes broadcast back onto the
    |sources|² result. The same shape scales to domain × shard overlap
    at 100 TB because the join key is the token, never the vocab set."""
    d = load(spark, sf_dir, "documents")
    sv = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .distinct()
    )
    vs = sv.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = sv.select(F.col("source").alias("src_a"), "w")
    b = sv.select(F.col("source").alias("src_b"), "w")
    inter = (
        a.join(b, "w")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    va = vs.select(F.col("source").alias("src_a"), F.col("v").alias("va"))
    vb = vs.select(F.col("source").alias("src_b"), F.col("v").alias("vb"))
    return (
        inter.join(F.broadcast(va), "src_a")
        .join(F.broadcast(vb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common")
                / (F.lit(1.0) * (F.col("va") + F.col("vb") - F.col("n_common"))),
                6,
            ).alias("jaccard_r"),
        )
    )


@register(
    "text_source_drift_js",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sc AS (SELECT source, w, count(*) AS c FROM tok GROUP BY source, w),
    st AS (SELECT source, sum(c) AS t FROM sc GROUP BY source),
    gc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    gt AS (SELECT sum(c) AS t FROM gc),
    terms AS (
        SELECT sc.source,
               sc.c / (1.0 * st.t) AS p,
               gc.c / (1.0 * gt.t) AS q
        FROM sc
        JOIN st ON sc.source = st.source
        JOIN gc ON sc.w = gc.w
        CROSS JOIN gt
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_shared_types,
           round(sum(0.5 * p * ln(p / ((p + q) / 2)) / ln(2))
                 + sum(0.5 * q * ln(q / ((p + q) / 2)) / ln(2)), 9)
               AS js_vs_corpus_r
    FROM terms GROUP BY source
    """,
)
def text_source_drift_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution drift of each source against the corpus mix:
    Jensen–Shannon divergence between the source's unigram
    distribution and the global one — the LLM-data-mix monitor that
    flags a source whose language shifted (scraper broke, domain
    pivoted) before it pollutes the next training mix. Every source
    token appears in the corpus distribution, so the support-of-P ⊆
    support-of-Q term structure is exact with no smoothing; one
    token-grain census feeds both distributions (two aggregates, one
    explode). Transcendental edge → 9dp. Note q is the FULL-corpus
    probability of tokens shared with the source — sums over the
    source's support, the standard estimator when P's support is a
    subset."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("w"))
    sc = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("t"))
    gc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cg"))
    gt = gc.agg(F.sum("cg").alias("tg"))
    terms = (
        sc.join(st, "source")
        .join(F.broadcast(gc), "w")
        .crossJoin(F.broadcast(gt))
        .select(
            "source",
            (F.col("c") / (F.lit(1.0) * F.col("t"))).alias("p"),
            (F.col("cg") / (F.lit(1.0) * F.col("tg"))).alias("q"),
        )
    )
    m = (F.col("p") + F.col("q")) / 2
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared_types"),
        F.round(
            F.sum(0.5 * F.col("p") * F.log(F.col("p") / m) / F.log(F.lit(2.0)))
            + F.sum(0.5 * F.col("q") * F.log(F.col("q") / m) / F.log(F.lit(2.0))),
            9,
        ).alias("js_vs_corpus_r"),
    )


@register(
    "text_conditional_entropy",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bi AS (
        SELECT unnest(CASE WHEN len(w) >= 2
                      THEN [struct_pack(w1 := w[i], w2 := w[i+1])
                            FOR i IN range(1, len(w))]
                      ELSE [] END) AS b
        FROM w
    ),
    bc AS (
        SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c FROM bi GROUP BY 1, 2
    ),
    uc AS (SELECT w1, sum(c) AS cu FROM bc GROUP BY w1),
    tot AS (SELECT sum(c) AS t FROM bc),
    terms AS (
        SELECT bc.c / (1.0 * tot.t) AS pxy,
               bc.c / (1.0 * uc.cu) AS pcond
        FROM bc JOIN uc ON bc.w1 = uc.w1 CROSS JOIN tot
    )
    SELECT (SELECT CAST(sum(c) AS BIGINT) FROM bc) AS n_bigrams,
           (SELECT CAST(count(*) AS BIGINT) FROM bc) AS n_distinct_bigrams,
           round(-sum(pxy * ln(pcond) / ln(2)), 9) AS cond_entropy_bits_r
    FROM terms
    """,
)
def text_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional entropy H(w₂|w₁) of the corpus in bits —
    the information-theoretic predictability ceiling a bigram LM can
    reach (the text_bigram_lm_score row scores docs against such a
    model; THIS says how predictable the corpus is at all — near 0 =
    deterministic/templated text, near log₂|V| = no sequential
    structure). One bigram census (lead window per doc) feeds joint
    and conditional probabilities; H = −Σ p(w₁,w₂)·log₂ p(w₂|w₁)
    reduces over |distinct bigrams| cells. Transcendental edge →
    9dp."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w1")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bi = words.select(
        "w1", F.lead("w1", 1).over(win).alias("w2")
    ).filter(F.col("w2").isNotNull())
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    uc = bc.groupBy("w1").agg(F.sum("c").alias("cu"))
    tot = bc.agg(F.sum("c").alias("t"))
    terms = (
        bc.join(F.broadcast(uc), "w1")
        .crossJoin(F.broadcast(tot))
        .select(
            (F.col("c") / (F.lit(1.0) * F.col("t"))).alias("pxy"),
            (F.col("c") / (F.lit(1.0) * F.col("cu"))).alias("pcond"),
        )
    )
    stats = bc.agg(
        F.sum("c").cast("long").alias("n_bigrams"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_bigrams"),
    )
    h = terms.agg(
        F.round(
            -F.sum(F.col("pxy") * F.log(F.col("pcond")) / F.log(F.lit(2.0))), 9
        ).alias("cond_entropy_bits_r")
    )
    return stats.crossJoin(F.broadcast(h))


_WINNOW_ORACLE = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    h AS (
        SELECT doc_id,
               CASE WHEN len(ws) >= 3
                    THEN [CAST('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' '
                                || ws[i+2]), 1, 7) AS BIGINT)
                          FOR i IN range(1, len(ws) - 1)]
                    ELSE [] END AS hs
        FROM t
    ),
    w AS (
        SELECT doc_id, hs,
               CASE WHEN len(hs) >= 4
                    THEN [list_min(hs[j:j+3]) FOR j IN range(1, len(hs) - 2)]
                    ELSE [] END AS wins
        FROM h
    ),
    f AS (
        SELECT doc_id, len(hs) AS n_kgrams, len(wins) AS n_windows,
               list_distinct(wins) AS fps
        FROM w
    )
    SELECT doc_id,
           CAST(n_kgrams AS BIGINT)                                AS n_kgrams,
           CAST(n_windows AS BIGINT)                               AS n_windows,
           CAST(len(fps) AS BIGINT)                                AS n_fingerprints,
           round(len(fps) / (1.0 * greatest(n_windows, 1)), 6)     AS density_r,
           CAST(coalesce(list_min(fps), 0) AS BIGINT)              AS fp_min,
           CAST(coalesce(list_max(fps), 0) AS BIGINT)              AS fp_max,
           CAST(coalesce(list_sum(fps), 0) AS BIGINT)              AS fp_sum
    FROM f
    """


def _winnow_rows(d: DataFrame):
    """(doc_id, pos, h, wmin, valid) rows: md5-derived k=3-word shingle
    hashes via posexplode + lead (the codegen shingle formulation —
    see _shingle_rows in dedup.py), then the winnowing minimum as a
    4-row sliding-frame window min. `valid` marks positions where a
    full w=4 window exists. Everything runs in whole-stage codegen on
    ONE doc_id exchange (the in-row HOF formulation — transform over
    sequence with array_min(slice(hs, j, 4)) — interpreted the lambda
    per element and re-inlined the hs-building expression inside it:
    measured 106 s vs ~2 s at sf0.001 for the downstream pair join)."""
    from pyspark.sql import Window

    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    sh = F.when(
        F.lead("w", 2).over(win).isNotNull(),
        F.concat_ws(
            " ", F.col("w"), F.lead("w", 1).over(win), F.lead("w", 2).over(win)
        ),
    )
    k = words.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5(sh), 1, 7), 16, 10).cast("long").alias("h"),
    ).filter(F.col("h").isNotNull())
    win4 = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    return k.select(
        "doc_id",
        "pos",
        "h",
        F.min("h").over(win4).alias("wmin"),
        F.lead("h", 3)
        .over(Window.partitionBy("doc_id").orderBy("pos"))
        .isNotNull()
        .alias("valid"),
    )


def text_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k=3-word shingle, slide a w=4 window over
    the hash sequence, keep each window's minimum — the selected set
    is guaranteed to share fingerprints with any document that shares
    a long-enough substring, at an expected density of 2/(w+1) of the
    shingle count (vs MinHash, which has no positional guarantee).

    Shape: posexplode + lead/sliding-min windows + one grouped
    aggregate, all sharing a single doc_id exchange (sessionize
    pattern) and all whole-stage codegen — see _winnow_rows for why
    the in-row HOF formulation was rejected. The edge is scalar-only
    (fp_sum bounded: 7 hex digits < 2^28, x500 fps < 2^37 — no
    overflow); docs too short for any shingle still emit a zero row
    via the left join."""
    d = load(spark, sf_dir, "documents")
    rows = _winnow_rows(d)
    vmin = F.when(F.col("valid"), F.col("wmin"))
    stats = rows.groupBy("doc_id").agg(
        F.count("h").cast("long").alias("n_kgrams"),
        F.sum(F.when(F.col("valid"), 1).otherwise(0))
        .cast("long")
        .alias("n_windows"),
        F.countDistinct(vmin).cast("long").alias("n_fingerprints"),
        F.min(vmin).alias("fp_min_raw"),
        F.max(vmin).alias("fp_max_raw"),
        F.sum_distinct(vmin).alias("fp_sum_raw"),
    )
    return (
        d.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_kgrams", F.lit(0)).cast("long").alias("n_kgrams"),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_fingerprints", F.lit(0))
            .cast("long")
            .alias("n_fingerprints"),
            F.round(
                F.coalesce("n_fingerprints", F.lit(0))
                / (
                    F.lit(1.0)
                    * F.greatest(F.coalesce("n_windows", F.lit(0)), F.lit(1))
                ),
                6,
            ).alias("density_r"),
            F.coalesce("fp_min_raw", F.lit(0)).cast("long").alias("fp_min"),
            F.coalesce("fp_max_raw", F.lit(0)).cast("long").alias("fp_max"),
            F.coalesce("fp_sum_raw", F.lit(0)).cast("long").alias("fp_sum"),
        )
    )


text_winnowing_fingerprint = register(
    "text_winnowing_fingerprint",
    oracle=_WINNOW_ORACLE,
)(text_winnowing_fingerprint)


@register(
    "text_kneser_ney_bigram",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT w[i] AS w1, w[i+1] AS w2
        FROM t, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
    fert AS (SELECT w1, count(*) AS n_types FROM c2 GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n_cont FROM c2 GROUP BY w2),
    btypes AS (SELECT count(*) AS b FROM c2),
    scored AS (
        SELECT c2.w1, c2.w2, c2.n2,
               c2.n2 / (1.0 * c1.n1)                            AS p_mle,
               greatest(c2.n2 - 0.75, 0) / (1.0 * c1.n1)
               + (0.75 * fert.n_types / (1.0 * c1.n1))
                 * (cont.n_cont / (1.0 * btypes.b))             AS p_kn
        FROM c2
        JOIN c1 ON c1.w1 = c2.w1
        JOIN fert ON fert.w1 = c2.w1
        JOIN cont ON cont.w2 = c2.w2
        CROSS JOIN btypes
    )
    SELECT w1, w2,
           CAST(n2 AS BIGINT)                       AS n_bigram,
           floor(p_mle * 1e6 + 0.5) / 1e6           AS p_mle_r,
           floor(p_kn * 1e6 + 0.5) / 1e6            AS p_kn_r
    FROM (
        SELECT *, row_number() OVER (ORDER BY n2 DESC, w1, w2) AS rk
        FROM scored
    ) WHERE rk <= 20
    """,
)
def text_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (fixed discount
    D = 0.75, Chen & Goodman 1999 eq. 4.25): P_KN(w2|w1) =
    max(c(w1,w2)-D, 0)/c(w1) + lambda(w1) * P_cont(w2), with
    lambda(w1) = D * |{w2: c(w1,w2)>0}| / c(w1) and the continuation
    probability P_cont(w2) = |{w1: c(w1,w2)>0}| / |bigram types| —
    the smoothing that fixes MLE's zero-probability problem by
    backing off to how many CONTEXTS a word completes, not how often
    it occurs.  Report: top-20 bigrams with MLE vs KN side by side
    (KN < MLE for every seen bigram; the shaved mass funds unseen
    ones).

    Scale shape: everything derives from the bigram-count table c2 —
    one corpus tokenize pass + one (w1,w2) aggregate; fertility,
    continuation, and type-total are three SMALL re-aggregations of
    c2 (vocabulary-sized, not corpus-sized), joined back broadcast.
    All probabilities are ratios of exact integer counts (identical
    IEEE division on both engines), floor-canonicalized at 1e-6."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        words.select(
            F.col("w").alias("w1"), F.lead("w", 1).over(win).alias("w2")
        )
        .filter(F.col("w2").isNotNull())
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2")).localCheckpoint()
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    fert = c2.groupBy("w1").agg(F.count(F.lit(1)).alias("n_types"))
    cont = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("n_cont"))
    btypes = c2.agg(F.count(F.lit(1)).alias("b"))
    p_mle = F.col("n2") / (F.lit(1.0) * F.col("n1"))
    p_kn = (
        F.greatest(F.col("n2") - F.lit(0.75), F.lit(0.0))
        / (F.lit(1.0) * F.col("n1"))
        + (F.lit(0.75) * F.col("n_types") / (F.lit(1.0) * F.col("n1")))
        * (F.col("n_cont") / (F.lit(1.0) * F.col("b")))
    )
    scored = (
        c2.join(F.broadcast(c1), "w1")
        .join(F.broadcast(fert), "w1")
        .join(F.broadcast(cont), "w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            "w1", "w2", "n2", p_mle.alias("p_mle"), p_kn.alias("p_kn")
        )
    )
    w = Window.orderBy(F.col("n2").desc(), "w1", "w2")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select(
            "w1",
            "w2",
            F.col("n2").cast("long").alias("n_bigram"),
            (F.floor(F.col("p_mle") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "p_mle_r"
            ),
            (F.floor(F.col("p_kn") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "p_kn_r"
            ),
        )
    )


@register(
    "text_textrank_keywords",
    oracle="""
    WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT w[i] AS a, w[i+1] AS b
        FROM t, unnest(range(1, len(w))) AS r(i)
        UNION ALL
        SELECT w[i] AS a, w[i+2] AS b
        FROM t, unnest(range(1, len(w) - 1)) AS r(i)
    ),
    edges AS (
        SELECT least(a, b) AS u, greatest(a, b) AS v, count(*) AS wt
        FROM bg WHERE a <> b GROUP BY 1, 2
    ),
    und AS (
        SELECT u AS src, v AS dst, wt FROM edges
        UNION ALL SELECT v AS src, u AS dst, wt FROM edges
    ),
    deg AS (SELECT src, sum(wt) AS wdeg FROM und GROUP BY src)
    SELECT und.dst AS word,
           CAST(any_value(dd.wdeg) AS BIGINT)    AS wdeg,
           floor((0.15 + 0.85 * sum(und.wt * 1.0 / ds.wdeg))
                 * 1e6 + 0.5) / 1e6              AS score_r
    FROM und
    JOIN deg ds ON ds.src = und.src
    JOIN deg dd ON dd.src = und.dst
    GROUP BY und.dst
    ORDER BY score_r DESC, word
    LIMIT 20
    """,
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004), one damped
    PageRank iteration from uniform init over the corpus word
    co-occurrence graph (window = 2 tokens, undirected, edge weight =
    corpus co-occurrence count): score(w) = 0.15 + 0.85 * sum over
    neighbors u of wt(u,w)/wdeg(u).  The unsupervised keyword signal
    used to tag corpora before mixture construction.

    Determinism: edge weights and weighted degrees are exact integer
    counts; the per-word sum of exact rationals carries ~1e-15 order
    noise, canonicalized at 1e-6; top-20 ties break on the word.

    Scale shape: co-occurrence pairs come from two lead() windows per
    doc (no self-join), the edge/degree model is vocab^2-bounded and
    tiny next to the corpus, and the scoring join is model-sized —
    at 100 TB the only data-sized pass is the pair emission."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    prs = []
    for dist in (1, 2):
        prs.append(
            words.select(
                F.col("w").alias("a"),
                F.lead("w", dist).over(win).alias("b"),
            ).filter(F.col("b").isNotNull())
        )
    bg = prs[0].unionAll(prs[1]).filter(F.col("a") != F.col("b"))
    # The edge model is vocab^2-bounded (tiny next to the corpus) but
    # feeds FOUR downstream references (und x2, deg via und, scoring
    # join): materialize it once so the corpus-sized pair emission
    # runs a single time instead of per-reference (same discipline as
    # the kcore / link-prediction edge lists).
    edges = (
        bg.groupBy(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("wt"))
        .localCheckpoint()
    )
    und = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "wt"
    ).unionAll(edges.select(F.col("v").alias("src"), F.col("u").alias("dst"), "wt"))
    deg = und.groupBy("src").agg(F.sum("wt").alias("wdeg"))
    ds = deg.select(F.col("src"), F.col("wdeg").alias("src_deg"))
    dd = deg.select(F.col("src").alias("dst"), F.col("wdeg").alias("dst_deg"))
    return (
        und.join(F.broadcast(ds), "src")
        .join(F.broadcast(dd), "dst")
        .groupBy(F.col("dst").alias("word"))
        .agg(
            F.first("dst_deg").cast("long").alias("wdeg"),
            (
                F.floor(
                    (
                        F.lit(0.15)
                        + F.lit(0.85)
                        * F.sum(F.col("wt") * F.lit(1.0) / F.col("src_deg"))
                    )
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("score_r"),
        )
        .orderBy(F.col("score_r").desc(), "word")
        .limit(20)
    )


@register(
    "text_rouge_n_pairs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    uni AS (
        SELECT doc_id, w[i] AS g, count(*) AS c
        FROM t, unnest(range(1, len(w) + 1)) AS r(i)
        GROUP BY doc_id, w[i]
    ),
    bi AS (
        SELECT doc_id, w[i] || ' ' || w[i+1] AS g, count(*) AS c
        FROM t, unnest(range(1, len(w))) AS r(i)
        GROUP BY doc_id, w[i] || ' ' || w[i+1]
    ),
    pairs AS (
        SELECT a.doc_id AS ref_id, b.doc_id AS cand_id
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ),
    r1 AS (
        SELECT p.ref_id,
               sum(r.c)                          AS n_ref,
               sum(least(r.c, COALESCE(c.c, 0))) AS n_match
        FROM pairs p
        JOIN uni r ON r.doc_id = p.ref_id
        LEFT JOIN uni c ON c.doc_id = p.cand_id AND c.g = r.g
        GROUP BY p.ref_id
    ),
    r2 AS (
        SELECT p.ref_id,
               sum(r.c)                          AS n_ref,
               sum(least(r.c, COALESCE(c.c, 0))) AS n_match
        FROM pairs p
        JOIN bi r ON r.doc_id = p.ref_id
        LEFT JOIN bi c ON c.doc_id = p.cand_id AND c.g = r.g
        GROUP BY p.ref_id
    )
    SELECT r1.ref_id, CAST(r1.ref_id + 1 AS BIGINT) AS cand_id,
           CAST(r1.n_ref AS BIGINT)   AS n_ref_uni,
           floor(r1.n_match * 1.0 / r1.n_ref * 1e6 + 0.5) / 1e6 AS rouge1_r,
           CAST(r2.n_ref AS BIGINT)   AS n_ref_bi,
           floor(r2.n_match * 1.0 / r2.n_ref * 1e6 + 0.5) / 1e6 AS rouge2_r
    FROM r1 JOIN r2 ON r2.ref_id = r1.ref_id
    ORDER BY r1.ref_id
    """,
)
def text_rouge_n_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 recall (Lin 2004) with clipped n-gram counts
    for consecutive-doc_id (reference, candidate) pairs — the
    n-gram-overlap eval every summarization / generation pipeline
    reports, expressed as pure relational algebra: per-doc n-gram
    count tables, a pair-keyed left join, and
    sum(min(c_ref, c_cand)) / sum(c_ref).

    Determinism: counts and clipped matches are exact integers; the
    recall ratio is a single rational, canonicalized at 1e-6.

    Scale shape: n-gram tables are (doc, gram)-grain aggregates
    (map-side combinable); the scoring join keys on (doc_id, gram) —
    at 100 TB candidate/reference pairing is an equi-join, never a
    cross product, and the gram join co-partitions both sides."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    uni = words.groupBy("doc_id", F.col("w").alias("g")).agg(
        F.count(F.lit(1)).alias("c")
    )
    bi = (
        words.select(
            "doc_id",
            F.concat_ws(" ", "w", F.lead("w", 1).over(win)).alias("g"),
            F.lead("w", 1).over(win).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ids = d.select("doc_id")
    pairs = ids.alias("a").join(
        ids.alias("b"),
        F.col("b.doc_id") == F.col("a.doc_id") + 1,
    ).select(
        F.col("a.doc_id").alias("ref_id"), F.col("b.doc_id").alias("cand_id")
    )

    def _recall(grams, n_ref_name, score_name):
        r = grams.select(
            F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("rc")
        )
        cnd = grams.select(
            F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("cc")
        )
        return (
            pairs.join(r, "ref_id")
            .join(cnd, ["cand_id", "g"], "left")
            .groupBy("ref_id")
            .agg(
                F.sum("rc").cast("long").alias(n_ref_name),
                (
                    F.floor(
                        F.sum(F.least(F.col("rc"), F.coalesce(F.col("cc"), F.lit(0))))
                        * F.lit(1.0)
                        / F.sum("rc")
                        * F.lit(1e6)
                        + F.lit(0.5)
                    )
                    / F.lit(1e6)
                ).alias(score_name),
            )
        )

    r1 = _recall(uni, "n_ref_uni", "rouge1_r")
    r2 = _recall(bi, "n_ref_bi", "rouge2_r")
    return (
        r1.join(r2, "ref_id")
        .select(
            "ref_id",
            (F.col("ref_id") + 1).cast("long").alias("cand_id"),
            "n_ref_uni",
            "rouge1_r",
            "n_ref_bi",
            "rouge2_r",
        )
        .orderBy("ref_id")
    )


@register(
    "text_burrows_delta",
    oracle="""
    WITH tok AS (
        SELECT d.source, t.w
        FROM documents d, unnest(string_split(d.text, ' ')) AS t(w)
        WHERE t.w <> ''
    ),
    totals AS (SELECT source, count(*) AS tot FROM tok GROUP BY source),
    top_w AS (
        SELECT w FROM tok GROUP BY w
        ORDER BY count(*) DESC, w LIMIT 15
    ),
    grid AS (
        SELECT totals.source, totals.tot, top_w.w FROM totals, top_w
    ),
    f AS (
        SELECT g.source, g.w,
               COALESCE(c.c, 0) * 1.0 / g.tot AS f
        FROM grid g
        LEFT JOIN (SELECT source, w, count(*) AS c
                   FROM tok GROUP BY source, w) c
          ON c.source = g.source AND c.w = g.w
    ),
    stats AS (
        SELECT w,
               floor(avg(f) * 1e9 + 0.5) / 1e9 AS mu,
               floor(stddev_samp(f) * 1e9 + 0.5) / 1e9 AS sd
        FROM f GROUP BY w
    ),
    z AS (
        SELECT f.source, f.w, (f.f - s.mu) / s.sd AS z
        FROM f JOIN stats s ON s.w = f.w
        WHERE s.sd > 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           floor(avg(abs(a.z - b.z)) * 1e6 + 0.5) / 1e6 AS delta_r
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY delta_r, source_a, source_b
    LIMIT 10
    """,
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometry (Burrows 2002): z-normalize the
    relative frequencies of the 15 most common words across sources,
    then Delta(a,b) = mean |z_a - z_b| — the attribution distance
    used to detect same-author / same-generator text; the 10 closest
    source pairs are the 'stylistically indistinguishable' ones a
    contamination review flags.

    Determinism: frequencies are exact rationals on a DENSE
    (source x top-word) grid (missing counts coalesce to 0 — without
    it the per-word mean/std silently drop sources); mu/sd are
    canonicalized at 1e-9 BEFORE z so both engines divide identical
    doubles; the final mean-of-15 carries only ulp order noise under
    the 1e-6 canon.

    Scale shape: the corpus pass is one (source, word) count; the
    model (sources x 15) is tiny; the pair join is |sources|^2 over a
    15-row-per-pair grid — bounded by the catalog, never the corpus."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    totals = tok.groupBy("source").agg(F.count(F.lit(1)).alias("tot"))
    top_w = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(15)
        .select("w")
    )
    grid = totals.crossJoin(F.broadcast(top_w))
    counts = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    f = grid.join(counts, ["source", "w"], "left").select(
        "source",
        "w",
        (F.coalesce(F.col("c"), F.lit(0)) * F.lit(1.0) / F.col("tot")).alias(
            "f"
        ),
    )
    c9 = lambda col: F.floor(col * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    stats = f.groupBy("w").agg(
        c9(F.avg("f")).alias("mu"), c9(F.stddev_samp("f")).alias("sd")
    )
    z = (
        f.join(F.broadcast(stats), "w")
        .filter(F.col("sd") > 0)
        .select(
            "source", "w", ((F.col("f") - F.col("mu")) / F.col("sd")).alias("z")
        )
    )
    a = z.select(F.col("source").alias("source_a"), "w", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"), "w", F.col("z").alias("zb"))
    return (
        a.join(
            b,
            (a["w"] == b["w"]) & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            (
                F.floor(
                    F.avg(F.abs(F.col("za") - F.col("zb"))) * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("delta_r")
        )
        .orderBy("delta_r", "source_a", "source_b")
        .limit(10)
    )


@register(
    "text_stupid_backoff",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
        SELECT doc_id, w[i] AS w1, w[i+1] AS w2
        FROM t, unnest(range(1, len(w))) AS r(i)
        WHERE len(w) >= 2
    ),
    c2 AS (SELECT w1, w2, count(*) AS n2 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, count(*) AS n1 FROM bg GROUP BY w1),
    uni AS (
        SELECT w2 AS w, count(*) AS nu FROM bg GROUP BY w2
    ),
    tot AS (SELECT sum(nu) AS total FROM uni),
    heldout AS (
        SELECT bg.doc_id, bg.w1, bg.w2,
               CASE WHEN c2.n2 IS NOT NULL AND c2.n2 > 1
                    THEN (c2.n2 - 1.0) / (c1.n1 - 1.0)
                    ELSE 0.4 * uni.nu / tot.total END AS p,
               CASE WHEN c2.n2 IS NOT NULL AND c2.n2 > 1
                    THEN 0 ELSE 1 END AS backed_off
        FROM bg
        LEFT JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
        JOIN c1 ON c1.w1 = bg.w1
        JOIN uni ON uni.w = bg.w2
        CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)        AS n_bigrams,
           CAST(sum(backed_off) AS BIGINT) AS n_backoff,
           floor(CAST(sum(CAST(floor(ln(p) * 1e9 + 0.5) AS BIGINT))
                      AS DOUBLE)
                 / (count(*) * 1000.0) + 0.5) / 1e6
               AS avg_logprob_r
    FROM heldout
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid Backoff bigram scoring (Brants et al. 2007, 'Large
    Language Models in Machine Translation'): score each bigram with
    its leave-one-out MLE when the discounted count survives
    (n2-1)/(n1-1), else back off to 0.4 * unigram relative frequency
    — the web-scale smoothing that skips normalization entirely
    because at corpus scale a cheap score beats an exact probability.
    The leave-one-out discount makes the score honest for bigrams
    seen exactly once (they back off instead of scoring 1.0).

    Determinism: counts exact; each bigram's ln(p) is canonicalized to
    an INTEGER nano-unit cell (floor(ln(p)*1e9+0.5) AS BIGINT), the
    per-doc aggregate is the exact integer SUM of cells (order-
    independent in both engines, unlike a double avg), and the 1e-6
    edge is one identical FP division of identical integers:
    floor(sum/(n*1000)+0.5)/1e6. The earlier avg-of-cells form lost a
    doc at sf0.1 (r16) whose cell average sat EXACTLY on a .5e-6
    boundary — summation order alone picked the side; an integer sum
    has no order to disagree on.

    Scale shape: identical geometry to `text_bigram_lm_score` /
    `text_kneser_ney_bigram` — vocab^2-bounded count models broadcast
    against one corpus bigram pass. (The 0.4 literal is Brants'
    recommended backoff weight.)"""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = words.select(
        "doc_id",
        F.col("w").alias("w1"),
        F.lead("w", 1).over(win).alias("w2"),
    ).filter(F.col("w2").isNotNull())
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n2"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("n1"))
    uni = bg.groupBy(F.col("w2").alias("w")).agg(
        F.count(F.lit(1)).alias("nu")
    )
    tot = uni.agg(F.sum("nu").alias("total"))
    p = F.when(
        F.col("n2").isNotNull() & (F.col("n2") > 1),
        (F.col("n2") - 1.0) / (F.col("n1") - 1.0),
    ).otherwise(F.lit(0.4) * F.col("nu") / F.col("total"))
    backed = F.when(
        F.col("n2").isNotNull() & (F.col("n2") > 1), 0
    ).otherwise(1)
    scored = (
        bg.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", p.alias("p"), backed.alias("backed_off"))
    )
    lp_cell = F.floor(F.log("p") * F.lit(1e9) + F.lit(0.5)).cast("long")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("backed_off").cast("long").alias("n_backoff"),
            (
                F.floor(
                    F.sum(lp_cell).cast("double")
                    / (F.count(F.lit(1)) * F.lit(1000.0))
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("avg_logprob_r"),
        )
        .orderBy("doc_id")
    )
