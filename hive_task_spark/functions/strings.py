"""String function family — SURVEY.md §2B "Scalar functions / String".

All JVM-side built-ins (whole-stage codegen) — no Python in the path.
Oracle notes: DuckDB `length`/`strpos` return BIGINT (cast Spark side);
DuckDB lacks `initcap`, emulated per-word in the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_task_spark.registry import register
from hive_task_spark.tables import load


@register(
    "str_basic_suite",
    oracle="""
    SELECT
        p_partkey,
        upper(p_brand)                                   AS brand_uc,
        lower(p_type)                                    AS type_lc,
        concat(p_brand, ':', p_type)                     AS brand_type,
        concat_ws('|', p_brand, p_type, p_name)          AS joined,
        substring(p_name, 1, 10)                         AS name_prefix,
        CAST(length(p_name) AS BIGINT)                   AS name_len,
        trim(concat(' ', p_name, ' '))                   AS trimmed,
        lpad(CAST(p_size AS VARCHAR), 5, '0')            AS size_padded,
        translate(p_brand, '#', '_')                     AS brand_subst,
        reverse(p_brand)                                 AS brand_rev
    FROM part
    """,
)
def str_basic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """concat/concat_ws/substring/upper/lower/trim/lpad/length/translate."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.concat_ws("|", "p_brand", "p_type", "p_name").alias("joined"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 5, "0").alias("size_padded"),
        F.translate("p_brand", "#", "_").alias("brand_subst"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "str_regex_suite",
    oracle="""
    SELECT
        p_partkey,
        regexp_extract(p_type, '^([A-Z]+)', 1)                  AS type_head,
        regexp_replace(p_name, '[aeiou]', '*', 'g')             AS devoweled,
        CAST(strpos(p_name, 'a') AS BIGINT)                     AS first_a,
        CAST(regexp_matches(p_type, 'BRASS|COPPER') AS BOOLEAN) AS is_metal,
        split_part(p_type, ' ', 1)                              AS type_word1
    FROM part
    """,
)
def str_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract/replace, instr, rlike, split_part.

    Note Spark regexp_replace is global by default; DuckDB needs the
    'g' flag — a classic cross-engine semantics trap, pinned here.
    """
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.instr("p_name", "a").cast("long").alias("first_a"),
        F.col("p_type").rlike("BRASS|COPPER").alias("is_metal"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_word1"),
    )


@register(
    "str_initcap_casefold",
    oracle="""
    SELECT
        doc_id,
        array_to_string(
            list_transform(
                string_split(substring(text, 1, 40), ' '),
                w -> CASE WHEN length(w) = 0 THEN w
                          ELSE upper(substring(w, 1, 1)) || lower(substring(w, 2)) END
            ), ' ')                                             AS title_case,
        CAST(length(replace(text, ' ', '')) AS BIGINT)          AS n_nonspace
    FROM documents
    """,
)
def str_initcap_casefold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """initcap (DuckDB lacks it — oracle emulates per-word) + replace."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.initcap(F.substring("text", 1, 40)).alias("title_case"),
        F.length(F.regexp_replace("text", " ", "")).cast("long").alias("n_nonspace"),
    )


@register(
    "str_extract_all_map",
    oracle="""
    SELECT event_id,
           array_to_string(regexp_extract_all(props, '[0-9]+'), '|') AS digit_runs,
           CAST(len(regexp_extract_all(props, '[a-z]+')) AS BIGINT) AS n_word_runs,
           map_extract(map {'type': event_type, 'uid': CAST(user_id AS VARCHAR)},
                       'type')[1]                                   AS type_back
    FROM events
    WHERE event_id < 1000
    """,
)
def str_extract_all_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all (all matches, not just the first) plus a
    build-then-probe map round-trip (str_to_map's shape with typed
    construction). Pure row-local expressions — scan-speed at any
    scale."""
    from hive_task_spark.tables import load as _load

    e = _load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return e.select(
        "event_id",
        F.expr("array_join(regexp_extract_all(props, '([0-9]+)', 1), '|')").alias(
            "digit_runs"
        ),
        F.expr("size(regexp_extract_all(props, '([a-z]+)', 1))")
        .cast("long")
        .alias("n_word_runs"),
        F.element_at(
            F.create_map(
                F.lit("type"), F.col("event_type"),
                F.lit("uid"), F.col("user_id").cast("string"),
            ),
            "type",
        ).alias("type_back"),
    )


@register(
    "str_collation_suite",
    oracle="""
    SELECT lower(p_brand) AS brand_ci,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT lower(p_type)) AS BIGINT) AS n_types_ci,
           min(lower(p_name)) AS first_name_ci
    FROM part
    GROUP BY lower(p_brand)
    """,
)
def str_collation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4): grouping, DISTINCT
    and MIN under the UTF8_LCASE collation — the engine-level answer
    to case-insensitive analytics that otherwise force lower() wrapped
    around every reference (and defeat statistics/pruning on the raw
    column). The oracle states the same semantics via explicit
    lower() — for ASCII data the two are identical by definition; the
    point of the operator is that on the Spark side NO expression
    wrapping happens: the comparison semantic is a property of the
    type. Edge values are lowercased on both sides so the hash
    compares the semantic, not the case of representatives."""
    p = load(spark, sf_dir, "part")
    ci = lambda c: F.collate(F.col(c), "UTF8_LCASE")
    return (
        p.groupBy(F.lower(ci("p_brand")).alias("brand_ci"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.count_distinct(ci("p_type")).cast("long").alias("n_types_ci"),
            F.lower(F.min(ci("p_name"))).alias("first_name_ci"),
        )
        .select(
            F.col("brand_ci").cast("string"),
            "n_parts",
            "n_types_ci",
            F.col("first_name_ci").cast("string"),
        )
    )


@register(
    "str_split_part_suite",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS first_word,
           split_part(p_type, ' ', -1) AS last_word,
           array_to_string(string_split(p_type, ' ')[1:2], ' ')
               AS first_two_words,
           CAST(len(string_split(p_type, ' ')) AS BIGINT) AS n_words
    FROM part
    """,
)
def str_split_part_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delimited-field extraction: split_part with positive and
    NEGATIVE indices (both engines count -1 as the last field) and
    substring_index for the leading-k-fields prefix — the idioms for
    picking apart type codes, paths, and dotted identifiers without
    regex. DuckDB lacks substring_index, so its twin is the
    list-slice equivalent — same strings out. Pure map stage."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("split_part(p_type, ' ', 1)").alias("first_word"),
        F.expr("split_part(p_type, ' ', -1)").alias("last_word"),
        F.expr("substring_index(p_type, ' ', 2)").alias("first_two_words"),
        F.size(F.split("p_type", " ")).cast("long").alias("n_words"),
    )


@register(
    "str_printf_suite",
    oracle="""
    SELECT n_nationkey,
           printf('%05d', n_nationkey)                  AS pad5,
           printf('%x', n_nationkey + 250)              AS hex_lower,
           printf('%o', n_nationkey + 64)               AS octal,
           printf('N=%s R=%d', n_name, n_regionkey)     AS composed,
           printf('%10s', n_name)                       AS right_align
    FROM nation
    ORDER BY n_nationkey
    """,
)
def str_printf_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style format-string suite (`format_string` / printf): zero-pad,
    lowercase hex, octal, mixed composition, and width right-align —
    the report/ID-formatting surface. Only INTEGER and STRING
    conversions on purpose: %f rounding differs between Java's
    Formatter (HALF_UP) and C printf (round-half-even) on exact .5
    boundaries, the same class of trap as CLAUDE.md's round() rule —
    documented here as the reason floats stay out of format strings
    at query edges."""
    n = load(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.format_string("%05d", F.col("n_nationkey")).alias("pad5"),
        F.format_string("%x", F.col("n_nationkey") + 250).alias("hex_lower"),
        F.format_string("%o", F.col("n_nationkey") + 64).alias("octal"),
        F.format_string(
            "N=%s R=%d", F.col("n_name"), F.col("n_regionkey")
        ).alias("composed"),
        F.format_string("%10s", F.col("n_name")).alias("right_align"),
    ).orderBy("n_nationkey")
