"""Identity pins for the r15 outer-explode rewrites: explode_outer +
isnotnull over a staged array attribute must stay row-for-row equal to
the plain explode it replaced (the swap exists to dodge
InferFiltersFromGenerate's duplicated scan filter) on exactly the
degenerate inputs where outer and inner generates differ: NULL text,
empty text, whitespace-only, docs shorter than the gram size (empty
shingle arrays), and empty-string tokens (tokens('') is ['']).
"""

from pyspark.sql import functions as F

from spear_spark.operators.dedup import _shingle_pair_intersections, shingles
from spear_spark.operators.relevance import term_doc_frequencies
from spear_spark.operators.text import tokens

ROWS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta epsilon zeta"),  # exact dup: pairs exist
    (3, None),
    (4, ""),
    (5, "   "),
    (6, "single"),
    (7, "two tokens"),
    (8, "alpha beta gamma"),  # shares shingle with 1/2
]


def _docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text"])


def _assert_same(a, b):
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == b.count()


def test_shingle_pair_intersections_outer_matches_inner(spark):
    docs = _docs(spark)
    new = _shingle_pair_intersections(docs, "text", "doc_id", 3, None)
    base = docs.select(
        F.col("doc_id").alias("id"), shingles("text", 3).alias("shs")
    )
    ref_sh = base.select(
        F.struct(F.col("id"), F.size("shs").alias("n")).alias("d"),
        F.explode("shs").alias("s"),
    )
    ref = (
        ref_sh.groupBy("s")
        .agg(F.array_sort(F.collect_list("d")).alias("ds"))
        .filter(F.size("ds") > 1)
        .select(F.posexplode("ds").alias("i", "a"), F.col("ds"))
        .select(
            F.col("a"),
            F.explode(
                F.slice(
                    F.col("ds"),
                    F.col("i") + F.lit(2),
                    F.greatest(F.size("ds") - F.col("i") - 1, F.lit(0)),
                )
            ).alias("b"),
        )
        .groupBy(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    _assert_same(ref, new)
    # the dup pair must actually be present (non-vacuous corpus)
    assert new.filter("doc_a = 1 and doc_b = 2").count() == 1


def test_term_doc_frequencies_outer_matches_inner(spark):
    docs = _docs(spark)
    new = term_doc_frequencies(docs, "text", "doc_id")
    ref = (
        docs.select(F.col("doc_id"), tokens("text").alias("_toks"))
        .select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    _assert_same(ref, new)
    # empty-string tokens from tokens('') survive (doc 4/5 after trim)
    assert new.filter("term = ''").count() == 2
