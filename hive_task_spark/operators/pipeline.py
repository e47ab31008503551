"""Corpus-assembly pipeline operators — the selection/mixing stages
that sit between raw filtered documents and a training run: batch
sessionization of event streams, deterministic content-addressed
sampling, token-budget selection, and per-source mixture rebalancing.

Each is pure DataFrame algebra (windows + aggregates), fully oracle-
checked. Determinism is the design constraint: sampling and mixing
decide by md5 of a stable key, never by rand(), so a 100 TB rerun
selects the identical corpus — the property that makes a data recipe
reproducible and its ablations comparable.

Reference parity note: the reference (/root/reference, a Lisp STM
task-scheduling library) has no data-pipeline layer; these are
target-layer mandates (SURVEY.md §2B "LLM-data-pipeline ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.functions.exact import cents as _cents
from hive_task_spark.tables import load


@register(
    "pipeline_sessionize_events",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM e
    )
    SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sess_value
    FROM s GROUP BY user_id, sess_no
    """,
)
def pipeline_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions at >30-minute gaps (lag + gap flag + running sum — the
    classic island-numbering rewrite), then aggregate per session.
    One shuffle on user_id serves both windows and the final groupBy
    (same partitioning, Exchange reuse); at 100 TB this is the batch
    twin of the streaming session_window query and costs one pass."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long"), 1).over(w)
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        flagged.select(
            "user_id",
            "value",
            F.sum("new_sess").over(run).cast("long").alias("sess_no"),
        )
        .groupBy("user_id", "sess_no")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value").alias("sess_value"),
        )
    )


@register(
    "pipeline_hash_sample",
    oracle="""
    SELECT doc_id, lang, source,
           CAST(length(text) AS BIGINT) AS n_chars_seen
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
    """,
)
def pipeline_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~3/16 corpus sample keyed on md5(doc_id): no
    rand(), so the sample is identical across reruns, engines, and
    partitionings — the reproducible-subset primitive for ablations
    and dev splits. Pure map stage: no shuffle, the predicate runs at
    scan speed, and any downstream operator composes with it."""
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return d.filter(bucket.isin("0", "1", "2")).select(
        "doc_id",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars_seen"),
    )


@register(
    "pipeline_token_budget",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               n_chars
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM t
    )
    SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= 20000
    """,
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: rank documents by a priority key
    (n_chars desc, doc_id tiebreak) and keep the prefix whose
    cumulative token count fits a 20k budget — the "fill the training
    mix up to N tokens" operator. The unpartitioned running sum is a
    single-partition window, fine at document-metadata cardinality;
    at 100 TB the same cutoff is found with a two-pass plan (grouped
    partial sums → threshold key → broadcast filter) documented in
    SCALE.md, with identical selection semantics."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    w = (
        Window.orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.select(
            "doc_id",
            "n_tokens",
            F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= 20000)
    )


@register(
    "pipeline_mixture_rebalance",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    m AS (SELECT min(n) AS min_n FROM c),
    r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS pick_order
    FROM r CROSS JOIN m
    WHERE r.rn <= m.min_n
    """,
)
def pipeline_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: downsample every source to the size of the
    smallest source (uniform source mixing), choosing survivors by
    md5 order so the draw is reproducible. One shuffle on source for
    the ranking window; the per-source quota is a one-row broadcast.
    Generalizes to arbitrary target weights by replacing min(n) with
    a weights dimension joined on source — same plan shape."""
    d = load(spark, sf_dir, "documents")
    quota = (
        d.groupBy("source")
        .agg(F.count("*").alias("n"))
        .agg(F.min("n").alias("min_n"))
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .crossJoin(F.broadcast(quota))
        .filter(F.col("rn") <= F.col("min_n"))
        .select("doc_id", "source", F.col("rn").cast("long").alias("pick_order"))
    )


@register(
    "pipeline_decontaminate",
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
    eval_sh AS (
        SELECT DISTINCT s.shingle
        FROM sh s JOIN documents d ON s.doc_id = d.doc_id
        WHERE d.source = 'src0'
    ),
    hits AS (
        SELECT s.doc_id, count(*) AS n_shared
        FROM sh s
        JOIN documents d ON s.doc_id = d.doc_id
        JOIN eval_sh e ON s.shingle = e.shingle
        WHERE d.source <> 'src0'
        GROUP BY s.doc_id
    )
    SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared,
           (n_shared >= 3) AS contaminated
    FROM hits
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥3
    distinct 3-gram shingles with the held-out set (source = src0
    plays the benchmark corpus).

    Single-pass shape: the corpus is shingled ONCE, then one
    groupBy(shingle) computes both signals — did the shingle occur in
    the eval set (max flag) and which train docs contain it
    (collect_set, which also dedupes per-doc repeats). An eval-vs-
    train branch pair over a shared shingle relation would re-execute
    the whole shingling subtree per branch (filter pushdown defeats
    exchange reuse — see the MinHash note in dedup.py); this form
    shuffles the corpus by shingle exactly once. At 100 TB, stop-
    shingle skew (one shingle in millions of docs) is the known
    hazard — cap set size with slice() or pre-filter by document
    frequency, same as the LSH band-bucket discipline."""
    from hive_task_spark.operators.dedup import _shingle_rows

    d = load(spark, sf_dir, "documents")
    src = d.select(F.col("doc_id").alias("src_doc"), "source")
    rows = _shingle_rows(d).join(
        F.broadcast(src), F.col("doc_id") == F.col("src_doc")
    )
    per_shingle = rows.groupBy("shingle").agg(
        F.max(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("in_eval"),
        F.collect_set(
            F.when(F.col("source") != "src0", F.col("doc_id"))
        ).alias("train_docs"),
    )
    return (
        per_shingle.filter(F.col("in_eval") == 1)
        .select(F.explode("train_docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .select(
            "doc_id", "n_shared", (F.col("n_shared") >= 3).alias("contaminated")
        )
    )


@register(
    "pipeline_mixture_weighted",
    oracle="""
    WITH w AS (
        SELECT source,
               CASE WHEN source = 'src0' THEN 3.0
                    WHEN source = 'src1' THEN 2.0
                    ELSE 1.0 END AS weight
        FROM (SELECT DISTINCT source FROM documents)
    ),
    c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    quota AS (
        SELECT c.source,
               CAST(least(c.n, ceil(100.0 * w.weight)) AS BIGINT) AS q
        FROM c JOIN w ON c.source = w.source
    ),
    r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    )
    SELECT r.doc_id, r.source, CAST(r.rn AS BIGINT) AS pick_order
    FROM r JOIN quota ON r.source = quota.source
    WHERE r.rn <= quota.q
    """,
)
def pipeline_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling: per-source quotas proportional to an
    explicit weights table (src0 3×, src1 2×, rest 1× of a 100-doc
    base unit), drawn in deterministic md5 order and capped at source
    size. The weights side is a true dimension (broadcast join) —
    swap the inline CASE for a real weights table and the plan is
    unchanged. This is the generalized form of
    pipeline_mixture_rebalance's uniform quota."""
    d = load(spark, sf_dir, "documents")
    w = (
        d.select("source")
        .distinct()
        .select(
            "source",
            F.when(F.col("source") == "src0", 3.0)
            .when(F.col("source") == "src1", 2.0)
            .otherwise(1.0)
            .alias("weight"),
        )
    )
    c = d.groupBy("source").agg(F.count("*").alias("n"))
    quota = c.join(w, "source").select(
        "source",
        F.least(F.col("n"), F.ceil(100.0 * F.col("weight"))).cast("long").alias("q"),
    )
    rw = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", F.row_number().over(rw).alias("rn"))
        .join(F.broadcast(quota), "source")
        .filter(F.col("rn") <= F.col("q"))
        .select("doc_id", "source", F.col("rn").cast("long").alias("pick_order"))
    )


@register(
    "pipeline_chunk_sliding",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               string_split(text, ' ') AS words,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
        WHERE doc_id < 500
    ),
    c AS (
        SELECT doc_id, words, n,
               unnest(range(0, CAST(1 + greatest(ceil((n - 50) / 40.0), 0) AS BIGINT)))
                   AS chunk_idx
        FROM w
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT)                                    AS chunk_idx,
           array_to_string(words[chunk_idx * 40 + 1 : chunk_idx * 40 + 50], ' ')
                                                                        AS chunk_text,
           CAST(len(words[chunk_idx * 40 + 1 : chunk_idx * 40 + 50]) AS BIGINT)
                                                                        AS n_tokens
    FROM c
    """,
)
def pipeline_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token windows, stride 40 —
    10-token overlap), the context-length prep stage of every training
    pipeline. Pure row-local explode over an in-row sequence: chunk
    count and slices are computed from the split array with zero
    shuffles — scan-speed at any corpus size, and chunk rows stream
    straight to the sink without materializing per-doc state."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    w = d.select(
        "doc_id",
        F.split("text", " ").alias("words"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    n_chunks = (
        F.lit(1)
        + F.greatest(
            F.ceil((F.col("n") - 50) / F.lit(40.0)), F.lit(0).cast("long")
        )
    ).cast("long")
    c = w.select(
        "doc_id",
        "words",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    sl = F.slice(
        F.col("words"), (F.col("chunk_idx") * 40 + 1).cast("int"), 50
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(sl, " ").alias("chunk_text"),
        F.size(sl).cast("long").alias("n_tokens"),
    )


@register(
    "pipeline_pack_sequences",
    oracle="""
    WITH t AS (
        SELECT source, doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM t
    )
    SELECT source, doc_id, n_tokens,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
    FROM c
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: deterministic single-pass contiguous fill of
    512-token packs per source (pack_id = exclusive-cumsum div budget)
    — the streaming analog of first-fit packing that needs no per-bin
    state. One windowed cumsum partitioned by source: at 100 TB the
    window parallelizes across sources (and within a giant source the
    same recipe applies per date-shard); no global window, no driver
    state. Docs stay in stable doc_id order so a rerun packs
    identically."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    win = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(win))
    return c.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(512.0))
        .cast("long")
        .alias("pack_id"),
    )


@register(
    "pipeline_length_buckets",
    oracle="""
    SELECT
        CAST(floor(len(string_split(text, ' ')) / 32) * 32 AS BIGINT) AS bucket_lo,
        CAST(count(*) AS BIGINT)                                      AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT)             AS sum_tokens,
        CAST(max(len(string_split(text, ' '))) AS BIGINT)             AS max_tokens
    FROM documents
    GROUP BY 1
    """,
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching prep: histogram of documents by
    32-token length buckets with per-bucket token mass — the stats a
    dynamic-batching loader needs to size batches without padding
    waste. Map-side bucket assignment + partial+final aggregate; the
    shuffle carries one row per bucket per partition."""
    d = load(spark, sf_dir, "documents")
    n = F.size(F.split("text", " "))
    return (
        d.select((F.floor(n / 32) * 32).cast("long").alias("bucket_lo"), n.alias("nt"))
        .groupBy("bucket_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("sum_tokens"),
            F.max("nt").cast("long").alias("max_tokens"),
        )
    )


@register(
    "pipeline_dedup_keep_best",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS norm_hash,
               CAST(length(text) AS BIGINT) AS len,
               row_number() OVER (
                   PARTITION BY md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
                   ORDER BY length(text) DESC, doc_id
               ) AS rk,
               count(*) OVER (
                   PARTITION BY md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g'))
               ) AS n_copies
        FROM documents
    )
    SELECT norm_hash,
           doc_id              AS keeper_doc_id,
           len                 AS keeper_len,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM g WHERE rk = 1
    """,
)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keep-best: within each normalized-content duplicate
    group, keep the highest-quality copy (longest raw text, doc_id
    tiebreak) — the standard "keep the least-mangled variant" rule.
    One window over the normalized hash: ranking and group size come
    from the same single shuffle, and the hash is computed once
    map-side (32-byte shuffle key, never the document body twice)."""
    d = load(spark, sf_dir, "documents")
    norm_hash = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " "))
    g = d.select(
        "doc_id", norm_hash.alias("norm_hash"), F.length("text").cast("long").alias("len")
    )
    win = Window.partitionBy("norm_hash")
    rk = F.row_number().over(win.orderBy(F.col("len").desc(), "doc_id"))
    return (
        g.withColumn("rk", rk)
        .withColumn("n_copies", F.count(F.lit(1)).over(win))
        .filter(F.col("rk") == 1)
        .select(
            "norm_hash",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("len").alias("keeper_len"),
            F.col("n_copies").cast("long").alias("n_copies"),
        )
    )


@register(
    "pipeline_stratified_split",
    oracle="""
    WITH t AS (
        SELECT lang,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7','8','9','a','b')
                    THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
                    THEN 'val'
                    ELSE 'test' END AS split,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT lang, split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(count(*) * 1.0 /
                 sum(count(*)) OVER (PARTITION BY lang), 6) AS frac_of_lang
    FROM t
    GROUP BY lang, split
    """,
)
def pipeline_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (12:2:2 by the first hex
    nibble of md5(doc_id)) reported per language stratum: doc and
    token counts plus each split's share of its language. No rand()
    anywhere — membership is content-addressed, so reruns, engines,
    and repartitionings all cut the identical corpus, and adding new
    docs never reassigns existing ones (the stability property
    cross-validation pipelines need). Scan-speed map + one small
    groupBy; the share normalizer windows over the tiny
    (lang × split) table, not the corpus."""
    d = load(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib.isin(*"0123456789ab"), "train")
        .when(nib.isin("c", "d"), "val")
        .otherwise("test")
    )
    t = d.select(
        "lang",
        split.alias("split"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    g = t.groupBy("lang", "split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("lang")
    return g.select(
        "lang",
        "split",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "frac_of_lang"
        ),
    )


@register(
    "pipeline_domain_cap",
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 30
    """,
)
def pipeline_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota enforcement: keep at most 30 documents per
    source, chosen by md5(doc_id) order — the anti-domination stage
    that stops one crawl domain from flooding the mixture. Hash-order
    selection (not "first N seen") is rerun-stable and unbiased by
    ingest order. One shuffle on source + a rank window; at 100 TB
    the same plan holds because quota state is per-partition (no
    global coordination), and a skewed mega-domain is exactly the
    partition AQE splits."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 30)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "pipeline_interleave_mixture",
    oracle="""
    WITH s AS (
        SELECT source, row_number() OVER (ORDER BY source) - 1 AS src_idx,
               count(*) OVER () AS n_sources
        FROM (SELECT DISTINCT source FROM documents)
    ),
    r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS rk
        FROM documents
    )
    SELECT r.doc_id, r.source,
           CAST(r.rk * s.n_sources + s.src_idx AS BIGINT) AS global_pos
    FROM r JOIN s USING (source)
    """,
)
def pipeline_interleave_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave across sources: the global
    training order visits sources in rotation (position = per-source
    hash rank × n_sources + source index), so every window of the
    stream carries the mixture ratio — no source-runs, no epoch-level
    shuffling service needed, and the order is a pure function of doc
    ids. The global position is ARITHMETIC (rank × stride + offset),
    not a global sort or zipWithIndex: each row's position is computed
    inside its source partition, which is what makes the plan hold at
    100 TB (contrast: a global row_number would single-partition the
    corpus). Source index and count come from a broadcast-size
    distinct-source table."""
    d = load(spark, sf_dir, "documents")
    srcs = d.select("source").distinct()
    s = srcs.select(
        "source",
        (F.row_number().over(Window.orderBy("source")) - 1).alias("src_idx"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    r = d.select(
        "doc_id", "source", (F.row_number().over(w) - 1).alias("rk")
    )
    return r.join(F.broadcast(s), "source").select(
        "doc_id",
        "source",
        (F.col("rk") * F.col("n_sources") + F.col("src_idx"))
        .cast("long")
        .alias("global_pos"),
    )


@register(
    "pipeline_incremental_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT)      AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0       AS total_r,
           floor(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                           AS BIGINT)) AS DOUBLE) * 1e4 / count(*)
                 + 0.5) / 1e6            AS avg_r,
           CAST(count(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                                    THEN 0 ELSE 1 END) AS BIGINT) AS n_partials
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def pipeline_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a materialized per-status
    summary (rows before 1996) is merged with a new-data delta (rows
    from 1996 on) WITHOUT touching the old fact rows — count and sum
    are algebraic, so partial states merge by addition and avg
    derives at the end. This is the micro-batch/MV-refresh contract:
    at 100 TB the state side is a tiny summary table and each refresh
    scans only the delta partition. The oracle is the full recompute
    — the merged result must be indistinguishable. The partial states
    carry exact BIGINT cents (2dp money decodes loss-free), so the
    merge and BOTH float edges are order-independent integer sums
    with one identical FP division each — the r16 grid-avg rule;
    round(sum(double)) at this ~2e10 magnitude is summation-order
    noise territory. n_partials proves both branches contributed."""
    o = load(spark, sf_dir, "orders")
    cutoff = F.to_timestamp(F.lit("1996-01-01"))
    cents = _cents(F.col("o_totalprice"))

    def partial(df: DataFrame, tag: int) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(cents).alias("pcents"),
            F.lit(tag).alias("ptag"),
        )

    state = partial(o.filter(F.col("o_orderdate") < cutoff), 0)
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff), 1)
    return (
        state.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            (F.sum("pcents").cast("double") / F.lit(100.0)).alias(
                "total_r"
            ),
            (
                F.floor(
                    F.sum("pcents").cast("double")
                    * F.lit(1e4)
                    / F.sum("pn")
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("avg_r"),
            F.count_distinct(F.col("ptag")).cast("long").alias("n_partials"),
        )
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(text) AS h,
               len(list_distinct(string_split(text, ' '))) * 1.0 /
                   greatest(len(string_split(text, ' ')), 1) AS ttr
        FROM documents
    ),
    dup AS (
        SELECT h, count(*) AS cnt FROM t GROUP BY h
    ),
    src AS (
        SELECT lang, source, count(*) AS ns FROM t GROUP BY lang, source
    ),
    top_src AS (
        SELECT lang, source AS top_source FROM (
            SELECT *, row_number() OVER (
                PARTITION BY lang ORDER BY ns DESC, source) AS rn
            FROM src
        ) WHERE rn = 1
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT)                     AS n_docs,
           CAST(sum(t.n_tokens) AS BIGINT)              AS n_tokens,
           floor(CAST(sum(CAST(floor(t.ttr * 1e6 + 0.5) AS BIGINT))
                      AS DOUBLE) / count(*) + 0.5) / 1e6 AS avg_ttr_r,
           CAST(count(*) FILTER (WHERE d.cnt > 1) AS BIGINT) AS n_exact_dup,
           any_value(ts.top_source)                     AS top_source
    FROM t
    JOIN dup d ON t.h = d.h
    JOIN top_src ts ON t.lang = ts.lang
    GROUP BY t.lang
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card generator: the per-language governance summary a
    training-data release ships with — corpus size (docs, tokens),
    lexical quality (mean TTR), exact-duplicate exposure (docs whose
    content hash repeats), and the dominant source. One fact scan
    feeds three small aggregates (hash groups, source counts, the
    final language rollup); everything rejoins on broadcast-size
    summaries. The operator exists because data cards are a release
    REQUIREMENT for serious corpora — the engine should produce them
    as one query, not a notebook."""
    d = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    t = d.select(
        "doc_id",
        "lang",
        "source",
        F.size(w).cast("long").alias("n_tokens"),
        F.md5("text").alias("h"),
        (
            F.size(F.array_distinct(w)).cast("double")
            / F.greatest(F.size(w), F.lit(1))
        ).alias("ttr"),
    ).localCheckpoint()  # one scan feeds dup-, source- and lang-aggs
    dup = t.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    src = t.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("ns"))
    top_src = (
        src.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("lang").orderBy(F.col("ns").desc(), "source")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("lang", F.col("source").alias("top_source"))
    )
    return (
        t.join(dup, "h")
        .join(F.broadcast(top_src), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            # per-doc ttr → integer micro cell (bit-identical scalar
            # in both engines), exact cell sum + one identical
            # division (r16 grid-avg rule: avg of small-denominator
            # rationals is boundary-prone)
            (
                F.floor(
                    F.sum(
                        F.floor(
                            F.col("ttr") * F.lit(1e6) + F.lit(0.5)
                        ).cast("long")
                    ).cast("double")
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("avg_ttr_r"),
            F.count_if(F.col("cnt") > 1).cast("long").alias("n_exact_dup"),
            F.any_value(F.col("top_source")).alias("top_source"),
        )
    )


@register(
    "pipeline_clean_corpus_funnel",
    oracle="""
    WITH s0 AS (SELECT doc_id, text, lang, source FROM documents),
    s1 AS (  -- exact dedup: keep min doc_id per content hash
        SELECT * FROM s0 WHERE doc_id IN (
            SELECT min(doc_id) FROM s0 GROUP BY md5(text))
    ),
    s2 AS (  -- prefix dedup among survivors
        SELECT * FROM s1 WHERE doc_id IN (
            SELECT min(doc_id) FROM s1
            GROUP BY md5(array_to_string(string_split(text, ' ')[1:20], ' ')))
    ),
    s3 AS (  -- absolute quality bar
        SELECT * FROM s2
        WHERE len(list_distinct(string_split(text, ' '))) * 1.0 /
              greatest(len(string_split(text, ' ')), 1) >= 0.55
    ),
    s4 AS (  -- per-domain cap, hash order
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
            FROM s3
        ) WHERE rk <= 40
    )
    SELECT * FROM (
        SELECT 0 AS stage_id, 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM s0
        UNION ALL SELECT 1, 'exact_dedup', count(*) FROM s1
        UNION ALL SELECT 2, 'prefix_dedup', count(*) FROM s2
        UNION ALL SELECT 3, 'quality_bar', count(*) FROM s3
        UNION ALL SELECT 4, 'domain_cap', count(*) FROM s4
    )
    """,
)
def pipeline_clean_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled cleaning pipeline as ONE query: raw corpus →
    exact dedup (content-hash argmin) → prefix dedup → absolute
    quality bar (TTR ≥ 0.55) → per-domain cap, reporting survivors at
    every stage — the funnel chart every data-curation run reports.
    Stages compose as DataFrames (each stage's survivor set feeds the
    next), which is the point: the engine's dedup/quality/mixing
    operators are closed under composition, no materialization
    between stages except the tiny survivor checkpoints. At 100 TB
    each stage is the same bucketable shuffle it is standalone; the
    stage counts come from one-row aggregates unioned at the end."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    s0 = d.localCheckpoint()
    keep1 = s0.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    s1 = s0.join(keep1.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
    pfx = F.md5(F.array_join(F.slice(F.split("text", " "), 1, 20), " "))
    keep2 = s1.groupBy(pfx).agg(F.min("doc_id").alias("doc_id"))
    s2 = s1.join(keep2.select("doc_id"), "doc_id", "left_semi").localCheckpoint()
    w = F.split("text", " ")
    ttr = F.size(F.array_distinct(w)).cast("double") / F.greatest(
        F.size(w), F.lit(1)
    )
    s3 = s2.filter(ttr >= 0.55).localCheckpoint()
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    s4 = s3.withColumn("rk", rk).filter(F.col("rk") <= 40)

    def stage(i: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(i).alias("stage_id"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )

    return (
        stage(0, "raw", s0)
        .unionByName(stage(1, "exact_dedup", s1))
        .unionByName(stage(2, "prefix_dedup", s2))
        .unionByName(stage(3, "quality_bar", s3))
        .unionByName(stage(4, "domain_cap", s4))
    )


@register(
    "pipeline_snapshot_dedup",
    oracle="""
    WITH snap AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE source = 'src0'
    ),
    incoming AS (
        SELECT doc_id, source, md5(text) AS h FROM documents
        WHERE source <> 'src0'
    )
    SELECT i.source,
           CAST(count(*) AS BIGINT) AS n_incoming,
           CAST(count(*) FILTER (WHERE s.h IS NOT NULL) AS BIGINT)
               AS n_already_seen,
           CAST(count(*) FILTER (WHERE s.h IS NULL) AS BIGINT) AS n_new
    FROM incoming i LEFT JOIN snap s ON i.h = s.h
    GROUP BY i.source
    """,
)
def pipeline_snapshot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot incremental dedup: a new crawl increment is
    deduped AGAINST THE EXISTING CORPUS's content-hash index (src0
    plays the snapshot), not just within itself — the ingestion-time
    shape: the snapshot side is hashes only (32 bytes/doc, millions
    of times smaller than the corpus), the increment streams through
    one hash join, and per-source admit/reject counts fall out. At
    100 TB the snapshot index is a bucketed hash table on disk; the
    increment join stays shuffle-free on the bucket key (see
    source_bucketed_join for the mechanism)."""
    d = load(spark, sf_dir, "documents")
    snap = (
        d.filter(F.col("source") == "src0")
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    inc = d.filter(F.col("source") != "src0").select(
        "doc_id", "source", F.md5("text").alias("h")
    )
    return (
        inc.join(F.broadcast(snap), "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_incoming"),
            F.count_if(F.col("seen").isNotNull())
            .cast("long")
            .alias("n_already_seen"),
            F.count_if(F.col("seen").isNull()).cast("long").alias("n_new"),
        )
    )


@register(
    "pipeline_scd2_dimension",
    oracle="""
    WITH src AS (
        SELECT o_custkey, o_orderpriority,
               CAST(o_orderdate AS DATE) AS odate, o_orderkey,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey)
                   AS prev_p
        FROM orders
    ),
    chg AS (
        SELECT o_custkey, o_orderpriority, odate, o_orderkey
        FROM src WHERE prev_p IS NULL OR prev_p <> o_orderpriority
    )
    SELECT o_custkey                                   AS c_custkey,
           o_orderpriority                             AS priority,
           odate                                       AS valid_from,
           coalesce(lead(odate) OVER w, DATE '2199-12-31') AS valid_to,
           CAST(row_number() OVER w AS BIGINT)         AS version,
           (lead(odate) OVER w IS NULL)                AS is_current
    FROM chg
    WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)
    """,
)
def pipeline_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each customer's order-
    priority history collapses into versioned validity intervals
    [valid_from, valid_to) — change detection via lag, interval close
    via lead, open current version capped at a 2199-12-31 sentinel (9999-12-31 overflows the driver canonicalizer's datetime64[ns]).
    This is the warehouse-standard dimension-maintenance pattern (a
    MERGE-free full rebuild; `merge_upsert_apply` covers the
    incremental CDC path). Both windows and the change filter share
    ONE hash partitioning on the customer key — a single shuffle no
    matter the corpus size, and at 100 TB the rebuild is
    embarrassingly parallel per key."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    src = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderpriority",
        F.to_date("o_orderdate").alias("odate"),
        "o_orderkey",
        F.lag("o_orderpriority").over(w).alias("prev_p"),
    )
    chg = src.filter(
        F.col("prev_p").isNull() | (F.col("prev_p") != F.col("o_orderpriority"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("odate", "o_orderkey")
    return chg.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("odate").alias("valid_from"),
        F.coalesce(
            F.lead("odate").over(w2), F.lit("2199-12-31").cast("date")
        ).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.lead("odate").over(w2).isNull().alias("is_current"),
    )


def _spread16(x: str, shl: str) -> str:
    """Bit-spread of a 16-bit value into even bit positions (classic
    Morton magic-number sequence), written with dialect-parameterized
    shift syntax: ``shl`` is a format string for a left shift."""
    e = x
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        e = f"(({e} | {shl.format(x=e, n=shift)}) & {mask})"
    return e


def _zorder_sql(shl: str) -> str:
    """Morton key over (l_partkey, l_suppkey) 16-bit truncations."""
    p = _spread16("(l_partkey & 65535)", shl)
    s = _spread16("(l_suppkey & 65535)", shl)
    return f"({p} | {shl.format(x=s, n=1)})"


_Z_SPARK = _zorder_sql("shiftleft({x}, {n})")
_Z_DUCK = _zorder_sql("({x} << {n})")


@register(
    "pipeline_zorder_layout",
    oracle=f"""
    WITH z AS (
        SELECT l_partkey, l_suppkey,
               {_Z_DUCK} // 16777216 AS zbucket
        FROM lineitem
    )
    SELECT CAST(zbucket AS BIGINT)          AS zbucket,
           CAST(count(*) AS BIGINT)         AS n_rows,
           CAST(min(l_partkey) AS BIGINT)   AS min_part,
           CAST(max(l_partkey) AS BIGINT)   AS max_part,
           CAST(min(l_suppkey) AS BIGINT)   AS min_supp,
           CAST(max(l_suppkey) AS BIGINT)   AS max_supp
    FROM z
    GROUP BY zbucket
    """,
)
def pipeline_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout keys: interleave the bits of two join/
    filter dimensions into one sort key, so RANGE-partitioning files
    by zkey gives every file a tight bounding box in BOTH dimensions
    — the multi-dimensional clustering trick behind Delta/Iceberg
    OPTIMIZE ZORDER, reproduced as pure JVM bit algebra (magic-number
    bit spreading, no UDF). The query emits per-z-bucket bounding
    boxes: the artifact a file-skipping planner would consult, and
    the direct measure of pruning power (each bucket covers ~1/2^k of
    each dim's range rather than all of it). At 100 TB: add
    `.repartitionByRange("zkey").sortWithinPartitions("zkey")` before
    the parquet write and min/max footer stats do the skipping."""
    z = load(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "l_suppkey",
        f"CAST({_Z_SPARK} div 16777216 AS BIGINT) AS zbucket",
    )
    return z.groupBy("zbucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_partkey").cast("long").alias("min_part"),
        F.max("l_partkey").cast("long").alias("max_part"),
        F.min("l_suppkey").cast("long").alias("min_supp"),
        F.max("l_suppkey").cast("long").alias("max_supp"),
    )


@register(
    "pipeline_skew_diagnose",
    oracle="""
    WITH c AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
    ),
    t AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS total,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM c
    ),
    r AS (
        SELECT l_partkey, cnt,
               row_number() OVER (ORDER BY cnt DESC, l_partkey) AS rnk
        FROM c
    )
    SELECT CAST(r.rnk AS BIGINT)                              AS rnk,
           r.l_partkey,
           r.cnt,
           CAST(round(1000000.0 * r.cnt / t.total) AS BIGINT) AS share_ppm,
           CAST(r.cnt * t.n_keys AS DOUBLE) / t.total         AS skew_factor
    FROM r, t
    WHERE r.rnk <= 5
    """,
)
def pipeline_skew_diagnose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis — the report you run BEFORE choosing
    a join/agg strategy at scale: per-key counts, the top-5 heavy
    keys, their parts-per-million share, and the skew factor
    (key count ÷ mean key count; a factor ≫ 1 says salt this key or
    rely on AQE skew-join). One aggregate + a count-ordered top-k;
    the totals side is a single row cross-joined back (broadcast).
    Integer micro-shares and an int÷int double division keep the
    edge engine-stable."""
    c = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    t = c.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    # TakeOrderedAndProject keeps only 5 rows per partition before the
    # single-task merge — the global row_number then runs on a 5-row
    # relation, never on the full key census.
    top5 = c.orderBy(F.col("cnt").desc(), "l_partkey").limit(5)
    r = top5.withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.col("cnt").desc(), "l_partkey")
        ),
    )
    return r.crossJoin(F.broadcast(t)).select(
        F.col("rnk").cast("long").alias("rnk"),
        "l_partkey",
        "cnt",
        F.round(F.lit(1000000.0) * F.col("cnt") / F.col("total"), 0)
        .cast("long")
        .alias("share_ppm"),
        (
            (F.col("cnt") * F.col("n_keys")).cast("double") / F.col("total")
        ).alias("skew_factor"),
    )


@register(
    "pipeline_bloom_prefilter",
    oracle="""
    WITH sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_distinct(
                 CASE WHEN len(w) >= 3
                      THEN [array_to_string(w[i:i+2], ' ')
                            FOR i IN range(1, len(w) - 1)]
                      ELSE [array_to_string(w, ' ')]
                 END)) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    tagged AS (
        SELECT s.shingle, d.source FROM sh s
        JOIN documents d ON s.doc_id = d.doc_id
    ),
    eval_sh AS (SELECT DISTINCT shingle FROM tagged WHERE source = 'src0'),
    train_sh AS (SELECT DISTINCT shingle FROM tagged WHERE source <> 'src0'),
    pos AS (
        SELECT shingle,
               ('0x' || substr(md5(shingle), 1, 8))::UBIGINT % 1024 AS p1,
               ('0x' || substr(md5(shingle), 9, 8))::UBIGINT % 1024 AS p2
        FROM eval_sh
    ),
    bits AS (
        SELECT p1 AS p FROM pos UNION ALL SELECT p2 FROM pos
    ),
    lanes AS (
        SELECT CAST(p // 32 AS BIGINT) AS lane,
               bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS mask
        FROM bits GROUP BY p // 32
    ),
    probe AS (
        SELECT t.shingle,
               ('0x' || substr(md5(t.shingle), 1, 8))::UBIGINT % 1024 AS p1,
               ('0x' || substr(md5(t.shingle), 9, 8))::UBIGINT % 1024 AS p2,
               (t.shingle IN (SELECT shingle FROM eval_sh)) AS true_hit
        FROM train_sh t
    ),
    checked AS (
        SELECT pr.shingle, pr.true_hit,
               (coalesce(l1.mask, 0) & (CAST(1 AS BIGINT) << CAST(pr.p1 % 32 AS INT))) <> 0
               AND
               (coalesce(l2.mask, 0) & (CAST(1 AS BIGINT) << CAST(pr.p2 % 32 AS INT))) <> 0
                   AS bloom_pass
        FROM probe pr
        LEFT JOIN lanes l1 ON l1.lane = CAST(pr.p1 // 32 AS BIGINT)
        LEFT JOIN lanes l2 ON l2.lane = CAST(pr.p2 // 32 AS BIGINT)
    )
    SELECT CAST(count(*) AS BIGINT)                            AS n_train_shingles,
           CAST(sum(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_pass,
           CAST(sum(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_hits,
           CAST(sum(CASE WHEN bloom_pass AND NOT true_hit THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_false_pos,
           CAST(sum(CASE WHEN true_hit AND NOT bloom_pass THEN 1 ELSE 0 END)
                AS BIGINT)                                     AS n_false_neg
    FROM checked
    """,
)
def pipeline_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership prefilter for decontamination — the
    broadcast-able alternative to shuffling the training corpus
    against the benchmark shingle set: the eval shingles fold into a
    1024-bit filter (32 x 32-bit lanes, k=2 md5-derived probe
    positions — the SAME md5 hex arithmetic on both engines, so the
    filter is BIT-IDENTICAL cross-engine), each train shingle tests
    two bits, and only bloom-passing candidates would proceed to
    exact verification. The report quantifies the contract: zero
    false negatives (a Bloom filter never misses — asserted by
    n_false_neg), a measured false-positive count, and the survivor
    fraction that the exact stage still has to verify. At 100 TB the
    lanes relation is bytes — it broadcasts to every executor and the
    corpus-side test is a pure map stage; Spark's own runtime bloom
    join applies the same idea automatically, this operator is the
    explicit, cross-engine-checkable form."""
    from hive_task_spark.operators.dedup import _shingle_rows

    d = load(spark, sf_dir, "documents")
    src = d.select(F.col("doc_id").alias("src_doc"), "source")
    # r18 (guide §2.4): sh fed eval_sh AND train_sh, and eval_sh itself
    # feeds both the lane build and the truth join — the shingle
    # window + distinct + source join re-executed up to 3x. Two plain
    # checkpoints (eval_sh is benchmark-scale by design — broadcasting
    # it IS the operator's 100 TB posture, so honest-small stats are
    # correct here).
    sh = (
        _shingle_rows(d)
        .distinct()
        .join(F.broadcast(src), F.col("doc_id") == F.col("src_doc"))
        .localCheckpoint()
    )
    eval_sh = (
        sh.filter(F.col("source") == "src0")
        .select("shingle")
        .distinct()
        .localCheckpoint()
    )
    train_sh = (
        sh.filter(F.col("source") != "src0").select("shingle").distinct()
    )

    def _pos(col, start: int):
        return (
            F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("long")
            % 1024
        )

    pos = eval_sh.select(
        _pos(F.col("shingle"), 1).alias("p1"),
        _pos(F.col("shingle"), 9).alias("p2"),
    )
    bits = pos.select(F.col("p1").alias("p")).unionAll(
        pos.select(F.col("p2").alias("p"))
    )
    lanes = bits.groupBy((F.col("p") / 32).cast("long").alias("lane")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
        ).alias("mask")
    )
    probe = train_sh.select(
        "shingle",
        _pos(F.col("shingle"), 1).alias("p1"),
        _pos(F.col("shingle"), 9).alias("p2"),
    ).join(
        eval_sh.withColumn("true_hit", F.lit(True)), "shingle", "left"
    ).fillna({"true_hit": False})
    l1 = lanes.select(F.col("lane").alias("lane1"), F.col("mask").alias("mask1"))
    l2 = lanes.select(F.col("lane").alias("lane2"), F.col("mask").alias("mask2"))
    checked = (
        probe.join(
            F.broadcast(l1),
            (F.col("p1") / 32).cast("long") == F.col("lane1"),
            "left",
        )
        .join(
            F.broadcast(l2),
            (F.col("p2") / 32).cast("long") == F.col("lane2"),
            "left",
        )
        .select(
            "true_hit",
            (
                (
                    F.coalesce(F.col("mask1"), F.lit(0)).bitwiseAND(
                        F.expr(
                            "shiftleft(CAST(1 AS BIGINT), CAST(p1 % 32 AS INT))"
                        )
                    )
                    != 0
                )
                & (
                    F.coalesce(F.col("mask2"), F.lit(0)).bitwiseAND(
                        F.expr(
                            "shiftleft(CAST(1 AS BIGINT), CAST(p2 % 32 AS INT))"
                        )
                    )
                    != 0
                )
            ).alias("bloom_pass"),
        )
    )
    return checked.agg(
        F.count(F.lit(1)).cast("long").alias("n_train_shingles"),
        F.sum(F.col("bloom_pass").cast("long")).cast("long").alias("n_bloom_pass"),
        F.sum(F.col("true_hit").cast("long")).cast("long").alias("n_true_hits"),
        F.sum((F.col("bloom_pass") & ~F.col("true_hit")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((F.col("true_hit") & ~F.col("bloom_pass")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    )


@register(
    "pipeline_feature_hashing",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(w), 1, 4) AS BIGINT) % 32
                    AS BIGINT) AS dim,
               CASE WHEN CAST('0x' || substr(md5(w), 5, 1) AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM tok WHERE w <> ''
    )
    SELECT doc_id, dim,
           CAST(sum(sgn) AS BIGINT)      AS feat,
           CAST(count(*) AS BIGINT)      AS n_tokens
    FROM hashed GROUP BY doc_id, dim
    """,
)
def pipeline_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurizer (signed feature hashing a la
    Weinberger et al.): every token maps to one of 32 dimensions via
    md5, with a second md5 nibble choosing the sign, and the doc's
    sparse feature vector is the signed count per (doc, dim). The
    fixed dimensionality is what makes bag-of-words features
    shippable at 100 TB — no vocabulary broadcast, no dictionary
    fitting pass, memory O(dims) per doc regardless of corpus
    vocabulary; the whole operator is explode + one hash-keyed
    aggregate (map-side combinable). Output stays sparse (only
    touched dims appear) — the dense assembly is a downstream
    array_agg."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).filter(F.col("w") != "")
    h = F.md5(F.col("w"))
    dim = (
        F.expr("CAST(conv(substr(md5(w), 1, 4), 16, 10) AS BIGINT)") % 32
    ).cast("long")
    sgn = F.when(
        F.expr("CAST(conv(substr(md5(w), 5, 1), 16, 10) AS BIGINT)") % 2 == 0,
        1,
    ).otherwise(-1)
    return (
        tok.select("doc_id", dim.alias("dim"), sgn.alias("sgn"))
        .groupBy("doc_id", "dim")
        .agg(
            F.sum("sgn").cast("long").alias("feat"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
        )
    )


@register(
    "pipeline_dp_counts",
    oracle="""
    WITH g AS (
        SELECT source, count(*) AS n FROM documents GROUP BY source
    ),
    u AS (
        SELECT source, n,
               CAST('0x' || substr(md5(source), 1, 12) AS BIGINT)
                   / CAST(281474976710656 AS DOUBLE) AS unif
        FROM g
    )
    SELECT source,
           CAST(n AS BIGINT) AS true_n,
           round(n + (CASE WHEN unif < 0.5 THEN 1.0 ELSE -1.0 END)
                   * ln(1.0 - 2.0 * abs(unif - 0.5)), 4) AS noisy_n_r
    FROM u
    """,
)
def pipeline_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release (Laplace mechanism,
    epsilon=1, sensitivity 1): per-source document counts plus
    Laplace(1) noise drawn by inverse-CDF from an md5-keyed uniform —
    SEEDED noise, so a re-run (and the oracle twin) reproduces the
    release bit-for-bit, which is how DP releases are audited in
    practice (the seed is the secret; determinism here demonstrates
    the mechanism, true_n is exposed only for the test harness). One
    aggregate + row-local noise arithmetic: the mechanism adds zero
    distributed cost at any scale. ln() edge rounds at 4dp."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    unif = F.expr(
        "CAST(conv(substr(md5(source), 1, 12), 16, 10) AS BIGINT)"
    ) / F.lit(281474976710656.0)
    noise = (
        F.when(unif < 0.5, 1.0).otherwise(-1.0)
        * F.log(1.0 - 2.0 * F.abs(unif - 0.5))
    )
    return g.select(
        "source",
        F.col("n").cast("long").alias("true_n"),
        F.round(F.col("n") + noise, 4).alias("noisy_n_r"),
    )


@register(
    "pipeline_weighted_sample",
    oracle="""
    WITH w AS (
        SELECT doc_id, lang, n_chars,
               CAST(n_chars AS DOUBLE) AS wt,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                    AS BIGINT) / CAST(281474976710656 AS DOUBLE) AS u
        FROM documents WHERE n_chars > 0
    ),
    keyed AS (
        SELECT doc_id, lang, n_chars,
               -ln(1.0 - u) / wt AS es_key
        FROM w
    )
    SELECT doc_id, lang, n_chars,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT *, row_number() OVER (ORDER BY es_key, doc_id) AS rk
        FROM keyed
    )
    WHERE rk <= 50
    """,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis-
    Spirakis exponential-key trick: each doc draws key
    Exp(weight) = -ln(1-u)/w from an md5-seeded uniform, and the
    k smallest keys ARE a weight-proportional sample — the only
    known one-pass, collect-free, merge-friendly way to draw
    weighted samples at corpus scale (per-partition top-k heaps
    merge at the driver as TakeOrderedAndProject; rerun-stable
    because the uniforms are content-keyed, the same determinism
    discipline as pipeline_hash_sample). Weight = n_chars (longer
    docs proportionally likelier). The rank edge is exact; the key
    itself never leaves the plan."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
    ) / F.lit(281474976710656.0)
    es_key = -F.log(1.0 - u) / F.col("n_chars").cast("double")
    keyed = d.select("doc_id", "lang", "n_chars", es_key.alias("es_key"))
    w = Window.orderBy("es_key", "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select("doc_id", "lang", "n_chars", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "pipeline_shard_plan",
    oracle="""
    WITH ordered AS (
        SELECT doc_id, n_chars,
               coalesce(sum(n_chars) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM documents
    ),
    sharded AS (
        SELECT CAST(floor(cum_before / 50000.0) AS BIGINT) AS shard_id,
               n_chars
        FROM ordered
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT)  AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(n_chars) / 50000.0, 4) AS fill_ratio_r
    FROM sharded GROUP BY shard_id
    """,
)
def pipeline_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-shard planning by cumulative payload size: docs in a
    stable key order accumulate bytes, and shard_id =
    floor(cum_before / target) — the next-fit bin packing every
    large-scale writer uses to hit its target file size (the
    execution analog is `df.repartitionByRange`/`maxRecordsPerFile`;
    this operator PLANS the layout and audits fill ratios so skewed
    docs surface before the write). One ordered cumulative window;
    at 100 TB the running sum range-partitions like any global
    cumsum, or degrades to per-partition planning with a final
    merge pass."""
    d = load(spark, sf_dir, "documents")
    wb = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ordered = d.select(
        "n_chars",
        F.coalesce(F.sum("n_chars").over(wb), F.lit(0)).alias("cum_before"),
    )
    sharded = ordered.select(
        F.floor(F.col("cum_before") / 50000.0).cast("long").alias("shard_id"),
        "n_chars",
    )
    return sharded.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.sum("n_chars") / 50000.0, 4).alias("fill_ratio_r"),
    )


@register(
    "pipeline_cdc_net_effect",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_id % 7 = 0 THEN 'd' ELSE 'u' END AS op,
               value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_changes
        FROM events
    ),
    last AS (SELECT * FROM log WHERE rn = 1),
    base AS (SELECT DISTINCT c_custkey FROM customer)
    SELECT l.user_id,
           CAST(l.n_changes AS BIGINT) AS n_changes,
           l.op AS last_op,
           CASE WHEN l.op = 'u' AND b.c_custkey IS NOT NULL THEN 'update'
                WHEN l.op = 'u'                             THEN 'insert'
                WHEN b.c_custkey IS NOT NULL                THEN 'delete'
                ELSE 'noop' END AS net_op,
           CASE WHEN l.op = 'u' THEN round(l.value, 6) END AS last_value_r
    FROM last l LEFT JOIN base b ON l.user_id = b.c_custkey
    """,
)
def pipeline_cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction to net effects — the Debezium/Kafka-compact
    pattern: a batch of ordered change records (upserts and deletes,
    op derived deterministically from the event id; (ts, event_id) is
    the change sequence) collapses to AT MOST ONE net operation per
    key, classified against the existing base table: last op 'u' on a
    known key = update, on an unknown key = insert; last 'd' on a
    known key = delete, on an unknown key = no-op (insert+delete
    inside one batch cancels). Downstream MERGE then applies
    |keys| changes instead of |log| — at 100 TB of change volume this
    single window-collapse is what makes hourly merges feasible. One
    hash partition by key for the window, base side is a broadcast
    anti/semi probe."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 7 == 0, "d").otherwise("u").alias("op"),
        "value",
    )
    w = Window.partitionBy("user_id")
    wseq = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    last = (
        e.withColumn("rn", F.row_number().over(wseq))
        .withColumn("n_changes", F.count(F.lit(1)).over(w))
        .filter(F.col("rn") == 1)
    )
    base = (
        load(spark, sf_dir, "customer").select("c_custkey").distinct()
    )
    j = last.join(
        F.broadcast(base), last["user_id"] == base["c_custkey"], "left"
    )
    return j.select(
        "user_id",
        F.col("n_changes").cast("long").alias("n_changes"),
        F.col("op").alias("last_op"),
        F.when(
            (F.col("op") == "u") & F.col("c_custkey").isNotNull(), "update"
        )
        .when(F.col("op") == "u", "insert")
        .when(F.col("c_custkey").isNotNull(), "delete")
        .otherwise("noop")
        .alias("net_op"),
        F.when(F.col("op") == "u", F.round("value", 6)).alias("last_value_r"),
    )


@register(
    "pipeline_nucleus_topp",
    oracle="""
    WITH w AS (
        SELECT source, doc_id, n_chars,
               sum(n_chars) OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum,
               sum(n_chars) OVER (PARTITION BY source) AS total,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    SELECT source, doc_id,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS BIGINT)      AS rk,
           CAST(cum AS BIGINT)     AS cum_mass
    FROM w
    WHERE 10 * (cum - n_chars) < 9 * total
    """,
)
def pipeline_nucleus_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) selection per source — the sampling-theory
    cousin of per-domain quotas: within each source, documents are
    ranked by mass (n_chars here; any quality-weighted mass works)
    and the selection keeps exactly the smallest prefix covering 90%
    of the source's total mass — heavy docs enter first, the long
    tail is cut adaptively per source instead of by a fixed count.
    The inclusion test is pure int64 (10*cum_before < 9*total), so
    the p=0.9 boundary can never float-flip between engines. One
    window partitioning per source (two frames share it); at 100 TB
    this is a single hash exchange, and the same shape implements
    "keep tokens until X% of corpus mass" budget curricula."""
    d = load(spark, sf_dir, "documents")
    wsrc = Window.partitionBy("source")
    word = wsrc.orderBy(F.col("n_chars").desc(), "doc_id")
    w = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars")
        .over(word.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("n_chars").over(wsrc).alias("total"),
        F.row_number().over(word).alias("rk"),
    )
    return w.filter(
        10 * (F.col("cum") - F.col("n_chars")) < 9 * F.col("total")
    ).select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("rk").cast("long").alias("rk"),
        F.col("cum").cast("long").alias("cum_mass"),
    )


@register(
    "pipeline_waterfill_allocation",
    oracle="""
    WITH dem AS (
        SELECT source, CAST(sum(n_chars) AS BIGINT) AS d
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               (9 * sum(d)) // 10 AS c
        FROM dem
    ),
    ranked AS (
        SELECT dem.source, dem.d, tot.n, tot.c,
               row_number() OVER (ORDER BY dem.d, dem.source) AS i,
               coalesce(sum(dem.d) OVER (ORDER BY dem.d, dem.source
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS p_prev
        FROM dem, tot
    ),
    flagged AS (
        SELECT *,
               CASE WHEN d * (n - i + 1) + p_prev <= c
                    THEN 1 ELSE 0 END AS satisfied
        FROM ranked
    ),
    kstar AS (
        SELECT coalesce(max(i), 0) AS k,
               coalesce(max(p_prev + d), 0) AS p_k
        FROM flagged WHERE satisfied = 1
    )
    SELECT f.source, f.d AS demand,
           CAST(CASE WHEN f.satisfied = 1 THEN f.d
                ELSE (f.c - k.p_k) // (f.n - k.k)
                     + CASE WHEN f.i - k.k
                                 <= (f.c - k.p_k) % (f.n - k.k)
                            THEN 1 ELSE 0 END
           END AS BIGINT) AS alloc,
           CAST(f.satisfied AS BIGINT) AS fully_satisfied
    FROM flagged f, kstar k
    """,
)
def pipeline_waterfill_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) allocation — divide a global
    token/compute budget (90% of total demand here) across sources so
    that small demands are fully satisfied and the rest share the
    remaining budget equally: the fairness mechanic behind multi-
    tenant quota systems and data-mixture budgeting when a flat
    proportional split would starve small domains. The sequential
    "fill the lowest first" algorithm collapses to a closed form
    under an ascending-demand sort: source i is fully satisfied iff
    d_i * (remaining sources) + prefix <= budget, and the capped
    tail splits the leftover evenly with a largest-remainder-style
    +1 top-up to the first r capped sources — every quantity int64,
    so the fairness boundary can never float-flip. One sort over
    |sources| rows (the demand census is the only corpus pass)."""
    d = load(spark, sf_dir, "documents")
    dem = d.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("d")
    )
    tot = dem.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("(9 * sum(d)) div 10").cast("long").alias("c"),
    )
    word = Window.orderBy("d", "source")
    ranked = dem.crossJoin(F.broadcast(tot)).select(
        "source",
        "d",
        "n",
        "c",
        F.row_number().over(word).alias("i"),
        F.coalesce(
            F.sum("d").over(word.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("p_prev"),
    )
    flagged = ranked.withColumn(
        "satisfied",
        (
            F.col("d") * (F.col("n") - F.col("i") + 1) + F.col("p_prev")
            <= F.col("c")
        ).cast("int"),
    )
    kstar = flagged.filter(F.col("satisfied") == 1).agg(
        F.coalesce(F.max("i"), F.lit(0)).alias("k"),
        F.coalesce(F.max(F.col("p_prev") + F.col("d")), F.lit(0)).alias("p_k"),
    )
    f = flagged.crossJoin(F.broadcast(kstar))
    level = F.expr("(c - p_k) div (n - k)")
    topup = F.when(
        (F.col("i") - F.col("k")) <= F.expr("(c - p_k) % (n - k)"), 1
    ).otherwise(0)
    return f.select(
        "source",
        F.col("d").alias("demand"),
        F.when(F.col("satisfied") == 1, F.col("d"))
        .otherwise(level + topup)
        .cast("long")
        .alias("alloc"),
        F.col("satisfied").cast("long").alias("fully_satisfied"),
    )


@register(
    "pipeline_incremental_sessionize",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM e
    )
    SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 6) AS sess_value_r
    FROM s GROUP BY user_id, sess_no
    """,
)
def pipeline_incremental_sessionize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental (partition-parallel) sessionization with boundary
    stitching — the 100 TB version of the sessionizer: each calendar
    day sessionizes INDEPENDENTLY (so daily partitions process in
    isolation — the only way to sessionize a petabyte backfill or
    run days on different clusters), then a second, session-grain
    pass re-applies the exact same island numbering to merge
    sessions whose gap across midnight is <= 30 min (a chain can
    span many days; island numbering handles transitive merges for
    free). The oracle is the ONE-SHOT global sessionizer — the
    stitched two-phase result must be indistinguishable from it,
    which is the correctness contract of every incremental pipeline:
    day-parallel + boundary reconciliation == global recompute.
    Phase 2 touches only |sessions| rows, ~100x smaller than the
    event grain."""
    e = load(spark, sf_dir, "events").withColumn(
        "day_idx",
        F.floor(F.col("ts").cast("double") / 86400).cast("long"),
    )
    # Phase 1: per-(user, day) independent sessionization.
    wday = Window.partitionBy("user_id", "day_idx").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(wday)
    flagged = e.withColumn(
        "new_sess",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0),
    ).withColumn(
        "day_sess",
        F.sum("new_sess").over(
            wday.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    day_sessions = flagged.groupBy("user_id", "day_idx", "day_sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("v"),
        F.unix_micros(F.min("ts")).alias("first_us"),
        F.unix_micros(F.max("ts")).alias("last_us"),
    )
    # Phase 2: island numbering at the session grain stitches across
    # day boundaries (within-day gaps are > 30 min by construction).
    wchain = Window.partitionBy("user_id").orderBy("first_us", "day_idx")
    cgap = F.col("first_us") - F.lag("last_us").over(wchain)
    chained = day_sessions.withColumn(
        "new_chain",
        F.when(cgap.isNull() | (cgap > 30 * 60 * 1000000), 1).otherwise(0),
    ).withColumn(
        "sess_no",
        F.sum("new_chain").over(
            wchain.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return chained.groupBy(
        "user_id", F.col("sess_no").cast("long").alias("sess_no")
    ).agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.sum("v"), 6).alias("sess_value_r"),
    )


@register(
    "pipeline_subsample_ladder",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                    AS BIGINT) AS h32
        FROM documents
    ),
    rungs AS (SELECT unnest([1, 2, 4, 8, 16]) AS denom)
    SELECT CAST(rungs.denom AS BIGINT) AS denom,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(k.n_chars) AS BIGINT) AS n_chars
    FROM keyed k JOIN rungs
      ON k.h32 * rungs.denom < 4294967296
    GROUP BY rungs.denom
    """,
)
def pipeline_subsample_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested subsample ladder — the scaling-law experiment harness:
    1/1, 1/2, 1/4, 1/8, 1/16 corpus fractions selected by ONE
    hash threshold per rung (keep doc iff h32 < 2^32/denom), so the
    samples NEST by construction (every 1/16 doc is in the 1/8, is
    in the 1/4, ...) — the property that makes loss-vs-data curves
    comparable across rungs, and that rand()-per-rung sampling
    destroys. Content-addressed (md5 of doc_id), so the ladder is
    identical across reruns, engines, and cluster sizes; adding a
    rung never perturbs existing ones. One scan, the rung "join" is
    a 5-row broadcast; each rung's census is a map-side aggregate."""
    d = load(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.expr(
            "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10)"
            " AS BIGINT)"
        ).alias("h32"),
    )
    rungs = spark.range(0, 5).select(
        F.expr("shiftleft(1, CAST(id AS INT))").cast("long").alias("denom")
    )
    return (
        keyed.crossJoin(F.broadcast(rungs))
        .filter(F.col("h32") * F.col("denom") < F.lit(4294967296))
        .groupBy(F.col("denom").cast("long").alias("denom"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )


@register(
    "pipeline_temperature_mixture",
    oracle="""
    WITH cnt AS (
        SELECT lang, count(*) AS n, sum(n_chars) AS chars
        FROM documents GROUP BY lang
    ),
    tot AS (
        SELECT sum(n) AS tn, sum(pow(n, 0.7)) AS tp FROM cnt
    )
    SELECT cnt.lang,
           CAST(cnt.n AS BIGINT) AS n_docs,
           round(cnt.n * 1.0 / tot.tn, 6) AS natural_share_r,
           round(pow(cnt.n, 0.7) / tot.tp, 6) AS temp_share_r,
           CAST(floor(pow(cnt.n, 0.7) / tot.tp * 10000) AS BIGINT)
               AS quota_per_10k
    FROM cnt, tot
    """,
)
def pipeline_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture sampling (alpha = 0.7) — the
    multilingual-LM curriculum standard (mBERT/XLM-R/mT5): sampling
    shares proportional to n^alpha instead of n up-weight low-
    resource languages without flattening the mix entirely
    (alpha = 1 reproduces natural shares; alpha = 0 is uniform —
    both existing mixture rows). The report gives natural vs
    tempered share and an integer per-10k quota (floored — the
    largest-remainder row shows how to hand out the slack exactly).
    One language census from one scan; pow/ratios on |languages|
    rows round at 6dp. Feed quota_per_10k into the deterministic
    hash sampler and the curriculum is fully content-addressed."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars")
    )
    tot = cnt.agg(
        F.sum("n").alias("tn"), F.sum(F.pow("n", F.lit(0.7))).alias("tp")
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        F.round(F.col("n") / F.col("tn"), 6).alias("natural_share_r"),
        F.round(F.pow("n", F.lit(0.7)) / F.col("tp"), 6).alias("temp_share_r"),
        F.floor(F.pow("n", F.lit(0.7)) / F.col("tp") * 10000)
        .cast("long")
        .alias("quota_per_10k"),
    )


@register(
    "pipeline_truncation_loss_report",
    oracle="""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    lims AS (SELECT unnest([64, 128, 256]) AS lim)
    SELECT CAST(lims.lim AS BIGINT) AS context_limit,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_tok > lims.lim THEN 1 ELSE 0 END)
                AS BIGINT) AS n_truncated,
           CAST(sum(greatest(n_tok - lims.lim, 0)) AS BIGINT)
               AS tokens_lost,
           round(sum(greatest(n_tok - lims.lim, 0)) * 1.0 / sum(n_tok), 6)
               AS loss_frac_r
    FROM toks, lims
    GROUP BY lims.lim
    """,
)
def pipeline_truncation_loss_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Context-window truncation loss — what choosing a sequence
    length actually costs: for candidate limits (64/128/256 tokens
    here; 2k/8k/32k in production), how many documents overflow and
    what fraction of corpus tokens a hard truncation would discard.
    This report is how the chunking stride and packing length rows'
    parameters get CHOSEN — pick the limit where loss_frac crosses
    your budget, then chunk only the overflow tail instead of
    truncating it. One token census (whitespace grain, matching the
    token-budget row) crossed with a 3-row broadcast of limits;
    all integer."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.size(F.split("text", " ")).alias("n_tok"))
    lims = spark.range(6, 9).select(
        F.expr("shiftleft(1, CAST(id AS INT))").cast("long").alias("lim")
    )
    j = toks.crossJoin(F.broadcast(lims))
    lost = F.greatest(F.col("n_tok") - F.col("lim"), F.lit(0))
    return j.groupBy(F.col("lim").alias("context_limit")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("n_tok") > F.col("lim")).cast("int"))
        .cast("long")
        .alias("n_truncated"),
        F.sum(lost).cast("long").alias("tokens_lost"),
        F.round(F.sum(lost) / F.sum("n_tok"), 6).alias("loss_frac_r"),
    )


@register(
    "pipeline_content_defined_chunking",
    oracle="""
    WITH toks AS (
        SELECT doc_id, i AS pos, w[i] AS tok,
               CASE WHEN i >= 3 THEN
                 CAST('0x' || substr(md5(w[i-2] || ' ' || w[i-1] || ' '
                                         || w[i]), 1, 8) AS BIGINT)
               END AS rh
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i)
        WHERE doc_id < 120
    ),
    flagged AS (
        SELECT doc_id, pos, tok,
               CASE WHEN pos = 1 OR rh % 8 = 0 THEN 1 ELSE 0 END AS cut
        FROM toks
    ),
    chunks AS (
        SELECT doc_id, pos, tok,
               sum(cut) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS UNBOUNDED PRECEDING) AS chunk_no
        FROM flagged
    )
    SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(min(pos) AS BIGINT) AS start_pos,
           md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
    FROM chunks
    GROUP BY doc_id, chunk_no
    """,
)
def pipeline_content_defined_chunking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Content-defined chunking (FastCDC/rsync-style) — boundaries
    where a rolling hash of the trailing 3-gram hits a mask
    (h % 8 == 0, expected chunk ~8 tokens), NOT at fixed offsets:
    inserting one token near a document's head shifts every
    fixed-window chunk (and defeats chunk-level dedup) but moves
    only the ONE content-defined chunk containing the edit — the
    property backup systems and chunk-dedup'd training corpora rely
    on. Trailing-window hashing is row-local (posexplode + two
    lags), chunk ids are the usual cut-flag cumsum, and each chunk
    emits its content digest — feed those straight into the exact-
    dedup row for shift-resistant chunk dedup. One doc_id exchange
    end-to-end."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    withrh = toks.select(
        "doc_id",
        "pos",
        "tok",
        F.when(
            F.col("pos") >= 3,
            F.expr(
                "CAST(conv(substr(md5(concat(lag(tok, 2) OVER ("
                "PARTITION BY doc_id ORDER BY pos), ' ', lag(tok, 1) OVER ("
                "PARTITION BY doc_id ORDER BY pos), ' ', tok)), 1, 8),"
                " 16, 10) AS BIGINT)"
            ),
        ).alias("rh"),
    )
    flagged = withrh.select(
        "doc_id",
        "pos",
        "tok",
        F.when((F.col("pos") == 1) | (F.col("rh") % 8 == 0), 1)
        .otherwise(0)
        .alias("cut"),
    )
    chunks = flagged.withColumn(
        "chunk_no",
        F.sum("cut").over(wseq.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return chunks.groupBy(
        "doc_id", F.col("chunk_no").cast("long").alias("chunk_no")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.min("pos").cast("long").alias("start_pos"),
        F.md5(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(pos, tok))), x -> x.tok), ' ')"
            ).cast("binary")
        ).alias("chunk_md5"),
    )


@register(
    "pipeline_preference_pairs",
    oracle="""
    WITH scored AS (
        SELECT doc_id, source,
               len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS ttr,
               row_number() OVER (PARTITION BY source
                   ORDER BY len(list_distinct(string_split(text, ' '))) * 1.0
                            / len(string_split(text, ' ')) DESC, doc_id)
                   AS r_best,
               row_number() OVER (PARTITION BY source
                   ORDER BY len(list_distinct(string_split(text, ' '))) * 1.0
                            / len(string_split(text, ' ')) ASC, doc_id)
                   AS r_worst
        FROM documents
    )
    SELECT b.source AS prompt_group,
           b.doc_id AS chosen_doc,
           w.doc_id AS rejected_doc,
           round(b.ttr, 6) AS chosen_score_r,
           round(w.ttr, 6) AS rejected_score_r,
           round(b.ttr - w.ttr, 6) AS margin_r
    FROM scored b
    JOIN scored w ON w.source = b.source
    WHERE b.r_best <= 3 AND w.r_worst <= 3 AND b.r_best = w.r_worst
    """,
)
def pipeline_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction — the RLHF/DPO data shape: within
    each prompt group (source as the stand-in prompt key), the
    top-3 responses by a quality score (type-token ratio here; any
    reward proxy plugs in) pair positionally with the bottom-3 as
    (chosen, rejected, margin). Margin-aware pairing matters:
    best-vs-worst gives the cleanest signal, and the score margin
    column lets training weight or filter low-margin (ambiguous)
    pairs — the knob DPO ablations tune. Two ranking windows over
    one source partitioning, positional self-join on rank; at 100 TB
    the quality scoring is the only corpus pass and the pairing
    touches 6 rows per group."""
    d = load(spark, sf_dir, "documents")
    ttr = F.size(F.array_distinct(F.split("text", " "))) / F.size(
        F.split("text", " ")
    )
    scored = d.select("doc_id", "source", ttr.alias("ttr"))
    wsrc = Window.partitionBy("source")
    ranked = scored.select(
        "doc_id",
        "source",
        "ttr",
        F.row_number().over(wsrc.orderBy(F.col("ttr").desc(), "doc_id")).alias(
            "r_best"
        ),
        F.row_number().over(wsrc.orderBy(F.col("ttr").asc(), "doc_id")).alias(
            "r_worst"
        ),
    )
    b = ranked.filter(F.col("r_best") <= 3).select(
        F.col("source").alias("prompt_group"),
        F.col("doc_id").alias("chosen_doc"),
        F.col("ttr").alias("b_ttr"),
        F.col("r_best").alias("pos"),
    )
    w = ranked.filter(F.col("r_worst") <= 3).select(
        F.col("source").alias("prompt_group"),
        F.col("doc_id").alias("rejected_doc"),
        F.col("ttr").alias("w_ttr"),
        F.col("r_worst").alias("pos"),
    )
    return b.join(w, ["prompt_group", "pos"]).select(
        "prompt_group",
        "chosen_doc",
        "rejected_doc",
        F.round("b_ttr", 6).alias("chosen_score_r"),
        F.round("w_ttr", 6).alias("rejected_score_r"),
        F.round(F.col("b_ttr") - F.col("w_ttr"), 6).alias("margin_r"),
    )


@register(
    "pipeline_churn_label_generation",
    oracle="""
    WITH cut AS (
        SELECT min(CAST(floor(epoch(ts) / 86400) AS BIGINT)) + 20 AS c
        FROM events
    ),
    feat AS (
        SELECT user_id,
               count(*) AS f_events,
               count(DISTINCT event_type) AS f_types,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS f_purchases,
               max(CAST(floor(epoch(ts) / 86400) AS BIGINT)) AS f_last_day
        FROM events, cut
        WHERE CAST(floor(epoch(ts) / 86400) AS BIGINT) < cut.c
        GROUP BY user_id
    ),
    outcome AS (
        SELECT DISTINCT user_id
        FROM events, cut
        WHERE CAST(floor(epoch(ts) / 86400) AS BIGINT) >= cut.c
    )
    SELECT f.user_id,
           CAST(f.f_events AS BIGINT)    AS f_events,
           CAST(f.f_types AS BIGINT)     AS f_types,
           CAST(f.f_purchases AS BIGINT) AS f_purchases,
           f.f_last_day,
           CAST(o.user_id IS NULL AS BIGINT) AS label_churned
    FROM feat f LEFT JOIN outcome o ON o.user_id = f.user_id
    """,
)
def pipeline_churn_label_generation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leakage-safe churn label generation — the supervised-dataset
    shape every retention model trains on: features aggregate ONLY
    the observation window (days before the cutoff), the label comes
    ONLY from the outcome window (no activity after the cutoff =
    churned), and the cutoff literal is the single source of truth
    for both — the discipline that prevents the classic
    target-leakage bug (a "last_seen" feature computed over ALL
    time predicts churn perfectly and ships a useless model). Users
    born in the outcome window are correctly absent (no observation
    features exist for them). Two filtered aggregates over one
    user_id partitioning; the anti-join shape of the label is a
    broadcast probe."""
    e = load(spark, sf_dir, "events").withColumn(
        "day_idx",
        F.floor(F.col("ts").cast("double") / 86400).cast("long"),
    )
    cut = e.agg((F.min("day_idx") + 20).alias("c"))
    ec = e.crossJoin(F.broadcast(cut))
    feat = (
        ec.filter(F.col("day_idx") < F.col("c"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("f_events"),
            F.countDistinct("event_type").cast("long").alias("f_types"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("long")
            .alias("f_purchases"),
            F.max("day_idx").alias("f_last_day"),
        )
    )
    outcome = (
        ec.filter(F.col("day_idx") >= F.col("c"))
        .select("user_id")
        .distinct()
        .withColumn("active", F.lit(1))
    )
    return feat.join(F.broadcast(outcome), "user_id", "left").select(
        "user_id",
        "f_events",
        "f_types",
        "f_purchases",
        "f_last_day",
        F.col("active").isNull().cast("long").alias("label_churned"),
    )


@register(
    "pipeline_group_fold_assignment",
    oracle="""
    WITH users AS (
        SELECT DISTINCT user_id FROM events
    ),
    folded AS (
        SELECT user_id,
               CAST('0x' || substr(md5('fold:' || CAST(user_id AS VARCHAR)),
                                   1, 8) AS BIGINT) % 5 AS fold
        FROM users
    )
    SELECT CAST(f.fold AS BIGINT) AS fold,
           CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM folded f JOIN events e ON e.user_id = f.user_id
    GROUP BY f.fold
    """,
)
def pipeline_group_fold_assignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Group-aware k-fold assignment — cross-validation that splits by
    ENTITY, not by row: every event of a user lands in the same fold
    (hash of the user key mod k), so no user straddles train and
    validation — the grouped-leakage guard without which per-row CV
    wildly overestimates models that memorize entities. Folds are
    content-addressed (salted md5), so the split is identical across
    reruns and engines and survives repartitioning — the same
    discipline as the train/val/test row, at the group grain. The
    census reports fold balance in both users and events (hash
    balance is near-uniform in users; event skew follows user
    activity). One distinct + one broadcast-joined census pass."""
    e = load(spark, sf_dir, "events")
    users = e.select("user_id").distinct()
    folded = users.withColumn(
        "fold",
        F.expr(
            "CAST(conv(substr(md5(concat('fold:', CAST(user_id AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT) % 5"
        ),
    )
    return (
        e.join(F.broadcast(folded), "user_id")
        .groupBy(F.col("fold").cast("long").alias("fold"))
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Round-4 additions: sampling/curriculum operators (rejection sampling,
# minority oversampling, epoch shuffling, ablation matrix, span-
# corruption planning). Same determinism discipline as the rest of the
# module: every draw keys on md5 of stable ids, never rand().
# ---------------------------------------------------------------------------


@register(
    "pipeline_rejection_sampling",
    oracle="""
    WITH mx AS (SELECT max(n_chars) AS max_chars FROM documents),
    w AS (
        SELECT doc_id, lang, n_chars,
               n_chars / (1.0 * mx.max_chars) AS accept_prob,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                    AS BIGINT) / CAST(281474976710656 AS DOUBLE) AS u
        FROM documents CROSS JOIN mx
    )
    SELECT doc_id, lang, n_chars,
           round(accept_prob, 6) AS accept_prob_r
    FROM w WHERE u < accept_prob
    """,
)
def pipeline_rejection_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional rejection sampling: keep each document
    with probability n_chars/max(n_chars) — the one-pass way to turn
    per-doc quality weights into a subsample WITHOUT computing a
    global weighted order (contrast pipeline_weighted_sample, which
    needs a top-k). The uniform is md5-keyed (same draw on every
    rerun, engine, and partitioning); max(n_chars) is a broadcast
    one-row aggregate, so the filter runs at scan speed. This is how
    a 100 TB mix applies importance weights: no shuffle, no state,
    deterministic audit trail."""
    d = load(spark, sf_dir, "documents")
    mx = d.agg(F.max("n_chars").alias("max_chars"))
    u = F.expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
    ) / F.lit(281474976710656.0)
    return (
        d.crossJoin(F.broadcast(mx))
        .withColumn("accept_prob", F.col("n_chars") / (F.lit(1.0) * F.col("max_chars")))
        .filter(u < F.col("accept_prob"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round("accept_prob", 6).alias("accept_prob_r"),
        )
    )


@register(
    "pipeline_oversample_minority",
    oracle="""
    WITH lc AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    mx AS (SELECT max(n) AS target FROM lc),
    plan AS (
        SELECT lang, n,
               least(CAST(ceil(mx.target / (1.0 * n)) AS BIGINT), 3) AS n_copies
        FROM lc CROSS JOIN mx
    )
    SELECT d.doc_id, d.lang, CAST(c.copy_idx AS BIGINT) AS copy_idx
    FROM documents d
    JOIN plan p ON d.lang = p.lang
    CROSS JOIN LATERAL unnest(range(1, p.n_copies + 1)) AS c(copy_idx)
    """,
)
def pipeline_oversample_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minority-class oversampling plan: replicate each document of an
    under-represented language ceil(target/n) times (capped at 3x to
    bound epoch inflation), where target is the majority-language
    count. The per-lang replication factors are a broadcast dimension
    (|langs| rows from one corpus pass); the replication itself is a
    generated explode(sequence(1, n_copies)) — rows materialize at
    the executor, nothing upstream shuffles wider. The class-balance
    epoch-construction primitive, as declarative algebra."""
    d = load(spark, sf_dir, "documents")
    lc = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    mx = lc.agg(F.max("n").alias("target"))
    plan = lc.crossJoin(F.broadcast(mx)).select(
        "lang",
        F.least(
            F.ceil(F.col("target") / (F.lit(1.0) * F.col("n"))).cast("long"),
            F.lit(3).cast("long"),
        ).alias("n_copies"),
    )
    return (
        d.join(F.broadcast(plan), "lang")
        .select(
            "doc_id",
            "lang",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy_idx"
            ),
        )
        .select("doc_id", "lang", F.col("copy_idx").cast("long").alias("copy_idx"))
    )


@register(
    "pipeline_epoch_shuffle",
    oracle="""
    WITH epochs AS (SELECT * FROM (VALUES (0), (1), (2)) AS t(epoch)),
    ranked AS (
        SELECT e.epoch, d.doc_id,
               row_number() OVER (
                   PARTITION BY e.epoch
                   ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                               || CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS rk
        FROM documents d CROSS JOIN epochs e
    )
    SELECT epoch,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS docid_sum,
           CAST(sum(doc_id * rk) AS BIGINT) AS perm_checksum
    FROM ranked GROUP BY epoch
    """,
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffling: epoch e orders docs
    by md5(e:doc_id) — a different but REPRODUCIBLE permutation every
    epoch, the property data-loader shuffles need for resumable
    training. The integrity report proves it: each epoch has the same
    n_docs and docid_sum (same multiset) but a different
    perm_checksum Σ(doc_id·rank) (different order). Per-epoch ranks
    partition on epoch (3 partitions here; at scale the rank is
    per-shard within epoch — same algebra one level down). Exact
    integer edges throughout."""
    d = load(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.createDataFrame([(0,), (1,), (2,)], "epoch int")
    ranked = d.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.row_number()
        .over(
            Window.partitionBy("epoch").orderBy(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("epoch").cast("string"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                "doc_id",
            )
        )
        .alias("rk"),
    )
    return ranked.groupBy("epoch").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("docid_sum"),
        F.sum(F.col("doc_id") * F.col("rk")).cast("long").alias("perm_checksum"),
    )


@register(
    "pipeline_quality_ablation",
    oracle="""
    WITH flags AS (
        SELECT CAST(n_chars >= 200 AS BOOLEAN) AS f_len,
               CAST(len(list_distinct(string_split(text, ' ')))
                    / (1.0 * len(string_split(text, ' '))) >= 0.5
                    AS BOOLEAN) AS f_ttr,
               CAST(lang = 'en' AS BOOLEAN) AS f_en,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT f_len, f_ttr, f_en,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM flags
    GROUP BY CUBE (f_len, f_ttr, f_en)
    """,
)
def pipeline_quality_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-ablation matrix: document and token counts under every
    combination of three quality gates (length ≥ 200 chars, type-
    token ratio ≥ 0.5, English) via CUBE — the 'how much data does
    each filter stack cost me' table a pretraining-mix owner reads
    before committing a cleaning recipe. All flags are in-row
    expressions; the cube is one partial+final aggregate pass (8
    grouping sets over 3 booleans, grouping-set expansion happens
    map-side). NULL rows are the margins (filter off)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    flags = d.select(
        (F.col("n_chars") >= 200).alias("f_len"),
        (
            F.size(F.array_distinct(toks)) / (F.lit(1.0) * F.size(toks)) >= 0.5
        ).alias("f_ttr"),
        (F.col("lang") == "en").alias("f_en"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    return flags.cube("f_len", "f_ttr", "f_en").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@register(
    "pipeline_span_corruption",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    plan AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens >= 3
                    THEN CAST(floor((n_tokens - 3) / 10.0) AS BIGINT) + 1
                    ELSE 0 END AS n_spans
        FROM t
    )
    SELECT doc_id, n_tokens, n_spans,
           round(3.0 * n_spans / n_tokens, 6) AS mask_ratio_r,
           CASE WHEN n_spans > 0
                THEN array_to_string(range(0, n_spans * 10, 10), '|')
                ELSE '' END AS span_starts
    FROM plan
    """,
)
def pipeline_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption plan: for each document, the list of
    mask-span start offsets (3-token spans every 10 tokens) plus the
    resulting mask ratio — the denoising-objective prep step, emitted
    as a PLAN (offsets, not rewritten text) so the expensive token
    rewrite happens once at materialization, not per experiment. Pure
    map stage: offsets are a generated sequence serialized '|'-joined
    at the edge (driver canonicalizer takes no arrays), zero
    exchanges, scan-speed at any corpus size."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    plan = t.withColumn(
        "n_spans",
        F.when(
            F.col("n_tokens") >= 3,
            (F.floor((F.col("n_tokens") - 3) / 10.0)).cast("long") + 1,
        ).otherwise(F.lit(0).cast("long")),
    )
    return plan.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        F.round(3.0 * F.col("n_spans") / F.col("n_tokens"), 6).alias("mask_ratio_r"),
        F.when(
            F.col("n_spans") > 0,
            F.expr(
                "array_join(transform(sequence(0, (n_spans - 1) * 10, 10), "
                "x -> CAST(x AS STRING)), '|')"
            ),
        )
        .otherwise("")
        .alias("span_starts"),
    )


@register(
    "pipeline_minhash_scurve",
    oracle="""
    WITH cfg AS (
        SELECT * FROM (VALUES (32, 2), (16, 4), (8, 8), (4, 16))
            AS t(n_bands, rows_per_band)
    ),
    s AS (
        SELECT * FROM (VALUES (0.3), (0.5), (0.7), (0.8), (0.9), (0.95))
            AS t(jaccard_s)
    )
    SELECT n_bands, rows_per_band, jaccard_s,
           round(1 - pow(1 - pow(jaccard_s, rows_per_band), n_bands), 9)
               AS p_candidate_r,
           round(pow(1.0 / n_bands, 1.0 / rows_per_band), 6) AS s_star_r
    FROM cfg CROSS JOIN s
    """,
)
def pipeline_minhash_scurve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding design table: for each (bands b, rows r)
    split of a 64-hash signature, the S-curve candidate probability
    1−(1−sʳ)ᵇ at representative Jaccard levels, plus the curve's
    threshold s* = (1/b)^(1/r) where detection crosses ~50%. This is
    the tuning artifact behind dedup_minhash_lsh's 16×4 choice
    (s*≈0.5 — the module's JACCARD_THRESHOLD): before re-banding a
    100 TB dedup run, you read THIS table, not rerun the corpus. Two
    literal dimensions cross-joined — zero corpus I/O, exercised as
    declarative algebra so the planner sees it like any query.
    Transcendental edge → 9dp."""
    cfg = spark.createDataFrame(
        [(32, 2), (16, 4), (8, 8), (4, 16)], "n_bands int, rows_per_band int"
    )
    s = spark.createDataFrame(
        [(0.3,), (0.5,), (0.7,), (0.8,), (0.9,), (0.95,)], "jaccard_s double"
    )
    return cfg.crossJoin(F.broadcast(s)).select(
        "n_bands",
        "rows_per_band",
        "jaccard_s",
        F.round(
            1
            - F.pow(
                1 - F.pow(F.col("jaccard_s"), F.col("rows_per_band")),
                F.col("n_bands"),
            ),
            9,
        ).alias("p_candidate_r"),
        F.round(
            F.pow(1.0 / F.col("n_bands"), 1.0 / F.col("rows_per_band")), 6
        ).alias("s_star_r"),
    )


@register(
    "pipeline_bounce_rate",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, us,
               CASE WHEN prev_us IS NULL
                         OR us - prev_us > CAST(1800000000 AS BIGINT)
                    THEN 1 ELSE 0 END AS new_session
        FROM o
    ),
    islands AS (
        SELECT user_id, us,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM flagged
    ),
    sessions AS (
        SELECT user_id, session_no,
               CAST(floor(min(us) / 86400000000.0) AS BIGINT) AS day_idx,
               count(*) AS n_events
        FROM islands GROUP BY user_id, session_no
    )
    SELECT day_idx,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bounce,
           round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 / (1.0 * count(*)), 6) AS bounce_rate_r
    FROM sessions GROUP BY day_idx
    """,
)
def pipeline_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate — share of sessions containing exactly one
    event, sessions built with the same 30-minute-gap island
    numbering as pipeline_sessionize_events (docstring there) keyed
    by the session's START day. The product-analytics consumer of the
    sessionizer: one user_id shuffle serves the gap window, the
    island sum, and the per-session rollup; the daily report is a
    second tiny aggregate. Exact integer microsecond time math
    end-to-end."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
    )
    flagged = o.select(
        "user_id",
        "event_id",
        "us",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > F.lit(1800000000)),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    # (us, event_id) tiebreak matches the gap window above and the
    # sessionize pattern — without it, duplicate (user_id, ts) rows at
    # a session boundary could split nondeterministically (ADVICE r4).
    wi = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = flagged.select(
        "user_id", "us", F.sum("new_session").over(wi).alias("session_no")
    )
    sessions = islands.groupBy("user_id", "session_no").agg(
        F.floor(F.min("us") / 86400000000.0).cast("long").alias("day_idx"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.when(F.col("n_events") == 1, 1).otherwise(0)
    return sessions.groupBy("day_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum(bounce).cast("long").alias("n_bounce"),
        F.round(F.sum(bounce) / (F.lit(1.0) * F.count(F.lit(1))), 6).alias(
            "bounce_rate_r"
        ),
    )


@register(
    "pipeline_label_balance",
    oracle="""
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
    t AS (SELECT sum(n) AS total, count(*) AS k, max(n) AS mx FROM c)
    SELECT c.label,
           CAST(c.n AS BIGINT) AS n_examples,
           round(c.n / (1.0 * t.total), 6) AS share_r,
           round(t.total / (1.0 * t.k * c.n), 6) AS class_weight_r,
           round(t.mx / (1.0 * c.n), 6) AS imbalance_vs_max_r
    FROM c CROSS JOIN t
    """,
)
def pipeline_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-balance report with ready-to-use class weights
    n/(k·n_c) (sklearn's 'balanced' formula) and the per-class
    imbalance ratio vs the majority class — the table a training run
    reads to configure its loss reweighting or the oversampler
    (pipeline_oversample_minority is the row-level actuator of this
    report). One |labels|-row aggregate + broadcast totals."""
    e = load(spark, sf_dir, "embeddings")
    c = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("k"),
        F.max("n").alias("mx"),
    )
    return c.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n").cast("long").alias("n_examples"),
        F.round(F.col("n") / (F.lit(1.0) * F.col("total")), 6).alias("share_r"),
        F.round(
            F.col("total") / (F.lit(1.0) * F.col("k") * F.col("n")), 6
        ).alias("class_weight_r"),
        F.round(F.col("mx") / (F.lit(1.0) * F.col("n")), 6).alias(
            "imbalance_vs_max_r"
        ),
    )


@register(
    "pipeline_token_budget_twopass",
    oracle="""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               n_chars
        FROM documents
    ),
    r AS (
        SELECT doc_id, n_tokens,
               sum(n_tokens) OVER (
                   ORDER BY n_chars DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM t
    )
    SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM r WHERE cum_tokens <= 20000
    """,
)
def pipeline_token_budget_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED form of pipeline_token_budget — same 20k-token
    prefix selection, zero global single-partition window. Pass 1
    aggregates token sums per priority BUCKET (n_chars decile-ish
    key); a |buckets|-row running sum (broadcast) finds each bucket's
    global token offset; pass 2 windows WITHIN buckets only (the
    partition key bounds every window input) and adds the broadcast
    offset. Selection is provably identical to the global-window
    form — the oracle is the SAME SQL as pipeline_token_budget's —
    and this is the plan SCALE.md promises at 100 TB: the only
    unpartitioned work is over |buckets| rows."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    # Priority buckets: high n_chars first. Bucket key = -floor(n_chars/64)
    # so bucket order matches the global (n_chars DESC) priority order;
    # ties inside a bucket resolve by the same (n_chars DESC, doc_id).
    t = t.withColumn("bucket", (-F.floor(F.col("n_chars") / 64)).cast("long"))
    per_bucket = t.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    w_off = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_off), F.lit(0)).alias("offset"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        t.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            (F.sum("n_tokens").over(w_in) + F.col("offset"))
            .cast("long")
            .alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= 20000)
    )


@register(
    "pipeline_range_partition_plan",
    oracle="""
    WITH sample AS (
        SELECT n_chars FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')
    ),
    splits AS (
        SELECT quantile_cont(n_chars, 0.25) AS s1,
               quantile_cont(n_chars, 0.50) AS s2,
               quantile_cont(n_chars, 0.75) AS s3
        FROM sample
    ),
    assigned AS (
        SELECT d.n_chars,
               CASE WHEN d.n_chars <= s.s1 THEN 0
                    WHEN d.n_chars <= s.s2 THEN 1
                    WHEN d.n_chars <= s.s3 THEN 2
                    ELSE 3 END AS part_id
        FROM documents d CROSS JOIN splits s
    )
    SELECT part_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(n_chars) AS BIGINT) AS min_key,
           CAST(max(n_chars) AS BIGINT) AS max_key
    FROM assigned GROUP BY part_id
    """,
)
def pipeline_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled range-partitioning plan — what repartitionByRange /
    TeraSort do internally, surfaced as data: draw a deterministic
    md5 sample, take its quartiles as split points, assign every row
    a range partition, report per-partition counts and key bounds.
    The balance check (n_docs roughly equal) is the audit that says
    a global sort of this key would not skew. Split points broadcast
    (3 doubles); assignment is a map expression; the report is one
    aggregate. Identical interpolated quantiles both engines, and the
    md5 sample makes the whole plan rerun-stable."""
    d = load(spark, sf_dir, "documents")
    sample = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    )
    splits = sample.agg(
        F.expr("percentile(n_chars, 0.25)").alias("s1"),
        F.expr("percentile(n_chars, 0.50)").alias("s2"),
        F.expr("percentile(n_chars, 0.75)").alias("s3"),
    )
    assigned = d.crossJoin(F.broadcast(splits)).select(
        "n_chars",
        F.when(F.col("n_chars") <= F.col("s1"), 0)
        .when(F.col("n_chars") <= F.col("s2"), 1)
        .when(F.col("n_chars") <= F.col("s3"), 2)
        .otherwise(3)
        .alias("part_id"),
    )
    return assigned.groupBy("part_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("n_chars").cast("long").alias("min_key"),
        F.max("n_chars").cast("long").alias("max_key"),
    )


@register(
    "pipeline_training_manifest",
    oracle="""
    WITH gated AS (
        SELECT doc_id, n_chars,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         BETWEEN '0' AND 'b' THEN 'train'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                         IN ('c', 'd') THEN 'val'
                    ELSE 'test' END AS split
        FROM documents WHERE n_chars >= 100
    ),
    placed AS (
        SELECT doc_id, split, n_chars,
               coalesce(sum(n_chars) OVER (
                   PARTITION BY split ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
        FROM gated
    )
    SELECT doc_id, split,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(cum_before // 50000 AS BIGINT) AS shard_id,
           CAST(cum_before % 50000 AS BIGINT) AS offset_in_shard
    FROM placed
    """,
)
def pipeline_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone assembly: a training-data MANIFEST — every
    quality-gated document with its md5-keyed split (75/12.5/12.5)
    and its exact (shard_id, byte_offset) placement under 50 KB
    shards. Writers consume this to lay out tfrecord/arrow shards;
    determinism means a re-run resumes instead of re-sharding.
    Placement = running size before each doc, computed with the
    TWO-PASS discipline (pipeline_token_budget_twopass): per-bucket
    size sums → broadcast per-bucket offsets → windows partitioned by
    (split, bucket) only — no split-wide single-task window even
    though the ORACLE is the straightforward per-split window (the
    rewrite is again provably identical)."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") >= 100)
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    gated = d.select(
        "doc_id",
        "n_chars",
        F.when(hx.between("0", "b"), "train")
        .when(hx.isin("c", "d"), "val")
        .otherwise("test")
        .alias("split"),
    )
    # two-pass placement: bucket by doc_id blocks within each split
    t = gated.withColumn("bucket", F.floor(F.col("doc_id") / 64).cast("long"))
    per_bucket = t.groupBy("split", "bucket").agg(
        F.sum("n_chars").alias("bucket_chars")
    )
    w_off = (
        Window.partitionBy("split")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_bucket.select(
        "split",
        "bucket",
        F.coalesce(F.sum("bucket_chars").over(w_off), F.lit(0)).alias("base"),
    )
    w_in = (
        Window.partitionBy("split", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        t.join(F.broadcast(offsets), ["split", "bucket"])
        .select(
            "doc_id",
            "split",
            "n_chars",
            (
                F.coalesce(F.sum("n_chars").over(w_in), F.lit(0)) + F.col("base")
            ).alias("cum_before"),
        )
    )
    return placed.select(
        "doc_id",
        "split",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.floor(F.col("cum_before") / 50000).cast("long").alias("shard_id"),
        (F.col("cum_before") % 50000).cast("long").alias("offset_in_shard"),
    )


@register(
    "pipeline_mix_rebalance_plan",
    oracle="""
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
    SELECT c.source,
           CAST(c.n AS BIGINT) AS current_docs,
           CAST(t.total // t.k AS BIGINT) AS target_docs,
           CAST(t.total // t.k - c.n AS BIGINT) AS delta_docs,
           CASE WHEN c.n > t.total // t.k THEN 'sample_down'
                WHEN c.n < t.total // t.k THEN 'replicate_up'
                ELSE 'keep' END AS action
    FROM c CROSS JOIN t
    """,
)
def pipeline_mix_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalance plan: per source, the document delta to reach
    a uniform target mix and the action to take — the PLAN emitted as
    data before any rows move (the actuators are
    pipeline_oversample_minority / rejection sampling / hash_sample;
    planning-then-acting keeps a 100 TB rebalance auditable and
    resumable). One |sources|-row aggregate + broadcast totals;
    integer-floor targets so the plan is exact."""
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("k"))
    target = F.floor(F.col("total") / F.col("k")).cast("long")
    return c.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("n").cast("long").alias("current_docs"),
        target.alias("target_docs"),
        (target - F.col("n")).cast("long").alias("delta_docs"),
        F.when(F.col("n") > target, "sample_down")
        .when(F.col("n") < target, "replicate_up")
        .otherwise("keep")
        .alias("action"),
    )


@register(
    "pipeline_dsir_importance",
    oracle="""
    WITH tok AS (
        SELECT d.doc_id, d.lang,
               CAST(CAST('0x' || substr(md5(t.w), 1, 4) AS BIGINT) % 64
                    AS BIGINT) AS f
        FROM documents d,
             unnest(string_split(lower(d.text), ' ')) AS t(w)
        WHERE t.w <> ''
    ),
    model AS (
        SELECT f,
               count(*)                                        AS n_r,
               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)    AS n_t
        FROM tok GROUP BY f
    ),
    tot AS (
        SELECT sum(n_r) AS big_r, sum(n_t) AS big_t FROM model
    ),
    lr AS (
        SELECT m.f,
               floor((ln((m.n_t + 1) / (t.big_t + 64.0))
                      - ln((m.n_r + 1) / (t.big_r + 64.0)))
                     * 1e6 + 0.5) / 1e6 AS lr_c
        FROM model m, tot t
    ),
    per_doc AS (
        SELECT tok.doc_id,
               CAST(count(*) AS BIGINT)    AS n_tokens,
               sum(lr.lr_c)                AS logw
        FROM tok JOIN lr ON lr.f = tok.f
        GROUP BY tok.doc_id
    )
    SELECT CAST(row_number() OVER (
               ORDER BY floor(logw * 1e6 + 0.5) / 1e6 DESC, doc_id)
           AS BIGINT)                                   AS rnk,
           doc_id, n_tokens,
           floor(logw * 1e6 + 0.5) / 1e6                AS logw_r
    FROM per_doc
    ORDER BY rnk
    LIMIT 100
    """,
)
def pipeline_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): score every raw document by its hashed-n-gram importance
    log-weight log w(d) = sum over features of c_f(d) *
    (ln p_target(f) - ln p_raw(f)), with unigram features hashed to
    64 buckets (the hashing trick keeps the model fixed-size at any
    corpus scale) and Laplace-smoothed bag-of-words probabilities;
    target = the English slice, raw = the full corpus. The top-100
    shortlist is what importance RESAMPLING would draw first — the
    standard 'make the pretraining mix look like the target domain'
    selector.

    Determinism: feature ids are md5-derived integers; the 64-row
    model's log-ratios are canonicalized at 1e-6 BEFORE the per-doc
    weighted sum (killing libm-vs-StrictMath ulp divergence at the
    model, where it's cheap), so the doc sum operates on identical
    doubles; the final edge re-canonicalizes.

    Scale shape: one explode+hash pass (map-side combinable at
    (doc,f) implicitly via the model agg), a 64-row broadcast model,
    and one per-doc aggregate — importance scoring at 100 TB costs
    one corpus scan, exactly the DSIR paper's design point."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).filter(F.col("w") != "")
    f = (
        F.expr("CAST(conv(substr(md5(w), 1, 4), 16, 10) AS BIGINT)") % 64
    ).cast("long")
    tok = tok.select("doc_id", "lang", f.alias("f"))
    model = tok.groupBy("f").agg(
        F.count(F.lit(1)).alias("n_r"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_t"),
    )
    tot = model.agg(
        F.sum("n_r").alias("big_r"), F.sum("n_t").alias("big_t")
    )
    lr = model.crossJoin(F.broadcast(tot)).select(
        "f",
        (
            F.floor(
                (
                    F.log((F.col("n_t") + 1) / (F.col("big_t") + F.lit(64.0)))
                    - F.log(
                        (F.col("n_r") + 1) / (F.col("big_r") + F.lit(64.0))
                    )
                )
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("lr_c"),
    )
    per_doc = (
        tok.join(F.broadcast(lr), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lr_c").alias("logw"),
        )
    )
    logw_c = F.floor(F.col("logw") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    from pyspark.sql import Window

    win = Window.orderBy(logw_c.desc(), "doc_id")
    return (
        per_doc.select(
            F.row_number().over(win).cast("long").alias("rnk"),
            "doc_id",
            "n_tokens",
            logw_c.alias("logw_r"),
        )
        .orderBy("rnk")
        .limit(100)
    )


@register(
    "pipeline_ab_srm_check",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                             1, 1) AS BIGINT) % 2 = 0
                    THEN 'A' ELSE 'B' END AS arm,
               count(*)   AS n_events,
               sum(value) AS user_value
        FROM events GROUP BY user_id
    ),
    arms AS (
        SELECT arm,
               CAST(count(*) AS BIGINT)      AS n_users,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               round(sum(user_value), 2)     AS total_value_r
        FROM assign GROUP BY arm
    ),
    srm AS (
        SELECT floor((pow(max(CASE WHEN arm = 'A' THEN n_users END)
                          - sum(n_users) / 2.0, 2)
                      + pow(max(CASE WHEN arm = 'B' THEN n_users END)
                            - sum(n_users) / 2.0, 2))
                     / (sum(n_users) / 2.0) * 1e6 + 0.5) / 1e6 AS chi2_r
        FROM arms
    )
    SELECT arms.arm, arms.n_users, arms.n_events, arms.total_value_r,
           srm.chi2_r, srm.chi2_r > 3.841459 AS srm_violation
    FROM arms, srm
    ORDER BY arms.arm
    """,
)
def pipeline_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B bucket assignment + sample-ratio-mismatch
    guardrail: users hash to arms by an md5 nibble (the reproducible
    50/50 splitter — never rand(), per the module's determinism
    rule), and the 1-df chi-square against the designed split is the
    SRM check every experimentation platform runs BEFORE reading any
    metric (a biased assignment invalidates the whole experiment).

    Determinism: assignment is md5-exact; counts are integers; chi2
    is a fixed-order rational over them, canonicalized at 1e-6; the
    violation flag compares the canonical value to the chi-square
    95% critical literal on both engines.

    Scale shape: one user-grain aggregate (the assignment is a
    projection, no shuffle of its own), a 2-row arm rollup, and a
    1-row chi-square — the data-sized pass happens exactly once."""
    ev = load(spark, sf_dir, "events")
    arm = F.when(
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 1), 16, 10)"
            " AS BIGINT)"
        )
        % 2
        == 0,
        "A",
    ).otherwise("B")
    assign = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("user_value"),
        )
        .select(arm.alias("arm"), "n_events", "user_value")
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.round(F.sum("user_value"), 2).alias("total_value_r"),
    )
    half = F.sum("n_users") / F.lit(2.0)
    srm = arms.agg(
        (
            F.floor(
                (
                    F.pow(
                        F.max(F.when(F.col("arm") == "A", F.col("n_users")))
                        - half,
                        2,
                    )
                    + F.pow(
                        F.max(F.when(F.col("arm") == "B", F.col("n_users")))
                        - half,
                        2,
                    )
                )
                / half
                * F.lit(1e6)
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("chi2_r")
    )
    return (
        arms.crossJoin(F.broadcast(srm))
        .select(
            "arm",
            "n_users",
            "n_events",
            "total_value_r",
            "chi2_r",
            (F.col("chi2_r") > F.lit(3.841459)).alias("srm_violation"),
        )
        .orderBy("arm")
    )


@register(
    "pipeline_em_length_mixture_step",
    oracle="""
    WITH x AS (SELECT ln(n_chars * 1.0) AS x FROM documents WHERE n_chars > 0),
    e AS (
        SELECT x,
               floor(1.0 / (1.0 + exp(((x - 6.0) * (x - 6.0)
                                       - (x - 4.0) * (x - 4.0)) / 2.0))
                     * 1e9 + 0.5) / 1e9 AS r2
        FROM x
    )
    SELECT CAST(count(*) AS BIGINT)                          AS n_docs,
           floor(avg(r2) * 1e6 + 0.5) / 1e6                  AS pi2_r,
           floor(sum((1 - r2) * x) / sum(1 - r2) * 1e6 + 0.5) / 1e6
                                                             AS mu1_new_r,
           floor(sum(r2 * x) / sum(r2) * 1e6 + 0.5) / 1e6    AS mu2_new_r
    FROM e
    """,
)
def pipeline_em_length_mixture_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact EM step for a two-component equal-variance Gaussian
    mixture on log document length (init mu = (4, 6), sigma = 1,
    pi = 0.5) — the model behind 'is this corpus two populations
    glued together' (e.g. snippets vs full documents), whose fitted
    split threshold feeds the length-bucket samplers. One step is the
    distributed primitive: production EM is this map-reduce iterated
    under a driver loop with broadcast params, each step exactly this
    shape.

    Determinism: the E-step responsibility (the only transcendental)
    is canonicalized per row at 1e-9, so both engines aggregate
    identical doubles; the M-step ratios carry only summation-order
    noise under the 1e-6 edge canon.

    Scale shape: one projection + one 1-row aggregate per step —
    no shuffle at all beyond the final reduce (map-side combinable);
    params stay scalar/broadcast regardless of corpus size."""
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    x = F.log(F.col("n_chars") * F.lit(1.0))
    r2_raw = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(((x - 6.0) * (x - 6.0) - (x - 4.0) * (x - 4.0)) / F.lit(2.0))
    )
    e = d.select(
        x.alias("x"),
        (F.floor(r2_raw * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias("r2"),
    )
    c6 = lambda col: F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return e.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        c6(F.avg("r2")).alias("pi2_r"),
        c6(
            F.sum((F.lit(1) - F.col("r2")) * F.col("x"))
            / F.sum(F.lit(1) - F.col("r2"))
        ).alias("mu1_new_r"),
        c6(F.sum(F.col("r2") * F.col("x")) / F.sum("r2")).alias("mu2_new_r"),
    )
