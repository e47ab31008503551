"""Property-based spot checks — SURVEY.md §5.2.4: algebraic identities
that must hold for ANY correct engine, independent of the oracle.

hypothesis drives predicate/parameter choice (few examples — each
example is a Spark job); deterministic identities run plain."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from hive_task_spark import registry
from hive_task_spark.tables import load

registry.load_all()

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.mark.parametrize("col", ["l_returnflag", "l_linestatus", "l_suppkey"])
def test_group_counts_partition_total(spark, sf_dir, col):
    """sum of per-group counts == table count, for any grouping key."""
    li = load(spark, sf_dir, "lineitem")
    total = li.count()
    by_group = li.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    assert by_group.agg(F.sum("n")).collect()[0][0] == total


def test_union_all_and_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    assert o.unionByName(o).count() == 2 * o.count()
    assert o.unionByName(o).distinct().count() == o.distinct().count()


def test_except_self_is_empty(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    assert c.exceptAll(c).count() == 0


def test_dedup_idempotent(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    once = d.dropDuplicates(["text"])
    assert once.dropDuplicates(["text"]).count() == once.count()


def test_semi_plus_anti_partition(spark, sf_dir):
    """left-semi ∪ left-anti partitions the left side exactly."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    on = c["c_custkey"] == o["o_custkey"]
    semi = c.join(o, on, "left_semi").count()
    anti = c.join(o, on, "left_anti").count()
    assert semi + anti == c.count()


@_SETTINGS
@given(
    lo=st.floats(min_value=0.0, max_value=0.05),
    hi=st.floats(min_value=0.05, max_value=0.11),
    flag=st.sampled_from(["A", "N", "R"]),
)
def test_filter_conjunction_and_partition(spark, sf_dir, lo, hi, flag):
    """filter(a AND b) == filter(a).filter(b); predicate + negation
    partition the table (discount has no NULLs)."""
    li = load(spark, sf_dir, "lineitem")
    a = F.col("l_discount").between(lo, hi)
    b = F.col("l_returnflag") == flag
    both = li.filter(a & b).count()
    chained = li.filter(a).filter(b).count()
    assert both == chained
    assert li.filter(a).count() + li.filter(~a).count() == li.count()


@_SETTINGS
@given(k=st.integers(min_value=1, max_value=10))
def test_topk_per_group_size_bound(spark, sf_dir, k):
    """top-k per group yields <= k rows per group and is a subset of
    the group's rows."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    topk = o.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    worst = (
        topk.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert worst <= k


def test_minhash_lsh_matches_exact_jaccard(spark, sf_dir):
    """LSH candidate pipeline output == exact all-pairs Jaccard at the
    same threshold on this corpus (banding parameters make a miss at
    j>=0.85 a <1e-5 event)."""
    from hive_task_spark.operators.dedup import JACCARD_THRESHOLD, _jaccard_pairs

    lsh = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    exact = {
        (r.doc_a, r.doc_b)
        for r in _jaccard_pairs(spark, sf_dir, JACCARD_THRESHOLD).collect()
    }
    assert lsh == exact


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Multi-table sign-LSH ANN must recover >= 80% of the exact top-k
    (measured 100% on this corpus; bound left slack for seed drift)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["similarity_ann_lsh"](spark, sf_dir).collect()
    }
    assert len(bf & ann) / len(bf) >= 0.8


def test_ann_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF (nprobe=6/16) must recover >= 70% of the exact top-k
    (measured 0.88 on this corpus; random embeddings are IVF's worst
    case — real clustered embeddings do far better)."""
    bf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["similarity_topk_bruteforce"](spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in registry.QUERIES["similarity_ann_ivf"](spark, sf_dir).collect()
    }
    assert len(bf & ivf) / len(bf) >= 0.7
